"""Dedup + similarity + textstats stages over the driver testdata."""

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def embeddings(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/embeddings.parquet")


def test_exact_dedup_matches_duckdb(docs):
    import duckdb

    from reden_ray.stages.dedup import exact_dedup

    got = sorted(r["doc_id"] for r in exact_dedup(docs).take_all())
    want = sorted(
        r[0]
        for r in duckdb.sql(
            f"SELECT min(doc_id) FROM '{SF}/documents.parquet' GROUP BY text"
        ).fetchall()
    )
    assert got == want


def test_minhash_parquet_checkpoint_equals_default(docs, tmp_path):
    """The beyond-object-store staging path (checkpoint_dir) must yield
    exactly the same pairs as the in-memory materialize."""
    from reden_ray.stages.dedup import minhash_lsh_pairs

    default = {
        (r["doc_a"], r["doc_b"], round(r["est_jaccard"], 9))
        for r in minhash_lsh_pairs(docs, threshold=0.9).take_all()
    }
    staged = {
        (r["doc_a"], r["doc_b"], round(r["est_jaccard"], 9))
        for r in minhash_lsh_pairs(
            docs, threshold=0.9, checkpoint_dir=str(tmp_path / "bands")
        ).take_all()
    }
    assert staged == default and default
    # the checkpoint actually landed on disk as parquet
    assert any(p.suffix == ".parquet" for p in (tmp_path / "bands").iterdir())


def test_minhash_finds_exact_duplicates(docs):
    import duckdb

    from reden_ray.stages.dedup import minhash_lsh_pairs

    rows = minhash_lsh_pairs(docs, threshold=0.9).take_all()
    got = {(r["doc_a"], r["doc_b"]) for r in rows}
    # every EXACT duplicate pair must be found (jaccard 1.0)
    dup_groups = duckdb.sql(
        f"SELECT list(doc_id ORDER BY doc_id) FROM '{SF}/documents.parquet' "
        "GROUP BY text HAVING count(*) > 1"
    ).fetchall()
    for (ids,) in dup_groups:
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                assert (ids[i], ids[j]) in got
    # and every reported pair must genuinely be similar (verify exact)
    if got:
        import pyarrow.parquet as pq

        from reden_ray.stages.dedup import ngram_jaccard

        texts = dict(
            zip(
                pq.read_table(f"{SF}/documents.parquet").column("doc_id").to_pylist(),
                pq.read_table(f"{SF}/documents.parquet").column("text").to_pylist(),
            )
        )
        ta = [texts[a] for a, _ in got]
        tb = [texts[b] for _, b in got]
        js = ngram_jaccard(ta, tb)
        assert min(js) >= 0.5  # LSH-estimated >=0.9 pairs are truly similar


def test_minhash_deterministic(docs):
    from reden_ray.stages.dedup import MinHasher

    m1, m2 = MinHasher(), MinHasher()
    s1 = m1.signature("Bonjour le monde, ceci est un document.")
    s2 = m2.signature("Bonjour le monde, ceci est un document.")
    assert (s1 == s2).all()


def test_simhash_pairs_on_duplicates(docs):
    import duckdb

    from reden_ray.stages.dedup import simhash_pairs

    rows = simhash_pairs(docs, max_hamming=3).take_all()
    got = {(r["doc_a"], r["doc_b"]) for r in rows}
    dup_groups = duckdb.sql(
        f"SELECT list(doc_id ORDER BY doc_id) FROM '{SF}/documents.parquet' "
        "GROUP BY text HAVING count(*) > 1"
    ).fetchall()
    for (ids,) in dup_groups:
        assert (ids[0], ids[1]) in got


def test_knn_brute_force_matches_numpy(embeddings):
    import pyarrow.parquet as pq

    from reden_ray.stages.similarity import knn_brute_force

    t = pq.read_table(f"{SF}/embeddings.parquet")
    vecs = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    ids = np.asarray(t.column("vec_id").to_pylist())
    q = vecs[:3]
    got = knn_brute_force(embeddings, q, k=5)
    # numpy reference
    nv = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    nq = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = nq @ nv.T
    for qi in range(3):
        order = sorted(zip(-sims[qi], ids))[:5]
        want = [int(v) for _, v in order]
        rows = [
            r["vec_id"]
            for r in got.to_pylist()
            if r["query_id"] == qi
        ]
        assert rows == want


def test_knn_lsh_recall(embeddings):
    import pyarrow.parquet as pq

    from reden_ray.stages.similarity import knn_brute_force, knn_lsh

    t = pq.read_table(f"{SF}/embeddings.parquet")
    vecs = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    q = vecs[:3]
    exact = knn_brute_force(embeddings, q, k=5).to_pylist()
    approx = knn_lsh(embeddings, q, k=5).to_pylist()
    for qi in range(3):
        want = {r["vec_id"] for r in exact if r["query_id"] == qi}
        got = {r["vec_id"] for r in approx if r["query_id"] == qi}
        # each query's own vector is its nearest neighbor; LSH must find it
        assert exact[0]["rank"] == 0
        assert len(want & got) >= 1


def test_textstats_columns(docs):
    from reden_ray.stages.textstats import LangId, QualityScore, TokenStats

    out = (
        docs.limit(50)
        .map_batches(TokenStats, batch_format="pyarrow", concurrency=1)
        .map_batches(QualityScore, batch_format="pyarrow", concurrency=1)
        .map_batches(LangId, batch_format="pyarrow", concurrency=1)
        .take_all()
    )
    for r in out:
        assert r["n_tokens_ws"] > 0
        assert 0.0 <= r["quality"] <= 1.0
        assert r["lang_pred"] in ("fr", "en", "de", "other")


def test_embedding_dup_pairs_finds_self_dups(ray_session):
    import ray.data as rd

    from reden_ray.stages.dedup import embedding_dup_pairs

    rng = np.random.RandomState(3)
    base = rng.randn(40, 16).astype(np.float32)
    # rows 40..44 duplicate rows 0..4 with tiny noise
    dups = base[:5] + rng.randn(5, 16).astype(np.float32) * 0.001
    all_vecs = np.vstack([base, dups])
    t = pa.table(
        {
            "vec_id": pa.array(range(len(all_vecs)), pa.int64()),
            "embedding": pa.array([v.tolist() for v in all_vecs], pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(t)
    rows = embedding_dup_pairs(ds, threshold=0.99).take_all()
    got = {(r["vec_a"], r["vec_b"]) for r in rows}
    for i in range(5):
        assert (i, 40 + i) in got


def test_embedding_dup_hot_bucket_capped(ray_session):
    """A degenerate bucket (many identical vectors) must not emit O(n^2)
    pairs: the cap bounds the group and surfaces in ``truncated``."""
    import ray.data as rd

    from reden_ray.stages.dedup import embedding_dup_pairs

    n = 30
    vec = [1.0] * 8
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([vec] * n, pa.list_(pa.float32())),
        }
    )
    rows = embedding_dup_pairs(
        rd.from_arrow(t), threshold=0.99, max_bucket=10
    ).take_all()
    # pairs only among the 10 capped survivors (smallest ids), all flagged
    assert rows
    assert all(r["truncated"] for r in rows)
    assert len(rows) == 10 * 9 // 2
    assert max(max(r["vec_a"], r["vec_b"]) for r in rows) <= 9


def test_minhash_no_corpus_driver_collect():
    """Regression guard for the round-1 scale-killer: the dedup module
    must not take_all() a corpus-sized dataset (pairs land on the
    driver only in fixture-sized query wrappers)."""
    import inspect

    import reden_ray.stages.dedup as D

    src = inspect.getsource(D)
    assert ".take_all(" not in src


def test_multimodal_stub_plumbing(ray_session):
    import ray.data as rd

    from reden_ray.stages.multimodal import FrameSampler, ImageFeatures, synth_media_table

    ds = rd.from_arrow(synth_media_table(16))
    feats = ds.map_batches(
        ImageFeatures, fn_constructor_kwargs={"strict": False},
        batch_format="pyarrow", batch_size=8, concurrency=1,
    ).take_all()
    assert len(feats) == 16
    assert len(feats[0]["feature"]) == 4 * 4 * 3
    frames = ds.map_batches(
        FrameSampler, fn_constructor_kwargs={"strict": False},
        batch_format="pyarrow", batch_size=8, concurrency=1,
    ).take_all()
    assert len(frames) == 16 * 4
    # strict mode raises (documented stub boundary)
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        ImageFeatures(strict=True)(synth_media_table(2))


def test_knn_ivf_recall_and_full_probe_exact(embeddings):
    import pyarrow.parquet as pq

    from reden_ray.stages.similarity import knn_brute_force, knn_ivf

    t = pq.read_table(f"{SF}/embeddings.parquet")
    vecs = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    q = vecs[:3]
    exact = knn_brute_force(embeddings, q, k=5).to_pylist()
    # nprobe == n_centroids probes every list => exact results
    full = knn_ivf(embeddings, q, k=5, n_centroids=8, nprobe=8).to_pylist()
    for qi in range(3):
        want = [r["vec_id"] for r in exact if r["query_id"] == qi]
        got = [r["vec_id"] for r in full if r["query_id"] == qi]
        assert got == want
    # narrow probe still finds each query's own vector (its top-1)
    narrow = knn_ivf(embeddings, q, k=5, n_centroids=8, nprobe=2).to_pylist()
    for qi in range(3):
        top = [r for r in narrow if r["query_id"] == qi and r["rank"] == 0]
        assert top and top[0]["vec_id"] == [r["vec_id"] for r in exact if r["query_id"] == qi][0]


def test_ivf_indexed_search_matches_in_memory(embeddings, tmp_path):
    """build_ivf_index + knn_ivf_indexed == knn_ivf (same seed =>
    same centroids); full-probe == exact brute force."""
    import numpy as np
    import pyarrow.parquet as pq

    from reden_ray.stages.similarity import (
        build_ivf_index,
        knn_brute_force,
        knn_ivf,
        knn_ivf_indexed,
    )

    t = pq.read_table(f"{SF}/embeddings.parquet")
    vecs = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    q = vecs[:3]
    idx_dir = str(tmp_path / "ivf")
    build_ivf_index(embeddings, idx_dir, n_centroids=8, seed=13)

    got = knn_ivf_indexed(idx_dir, q, k=5, nprobe=2).to_pylist()
    want = knn_ivf(embeddings, q, k=5, n_centroids=8, nprobe=2, seed=13).to_pylist()
    # ids/ranks exact; cosines only to 1e-5 — BLAS sgemm accumulation
    # order differs with the batch matrix shape (parquet round trip
    # re-blocks), shifting the last float32 ulp
    assert [(r["query_id"], r["rank"], r["vec_id"]) for r in got] == [
        (r["query_id"], r["rank"], r["vec_id"]) for r in want
    ]
    for g, w in zip(got, want):
        assert abs(g["cosine"] - w["cosine"]) < 1e-5

    full = knn_ivf_indexed(idx_dir, q, k=5, nprobe=8).to_pylist()
    exact = knn_brute_force(embeddings, q, k=5).to_pylist()
    assert [r["vec_id"] for r in full] == [r["vec_id"] for r in exact]


def test_multimodal_resize_and_audio(ray_session):
    import ray.data as rd

    from reden_ray.stages.multimodal import (
        AudioChunker,
        ImageResizer,
        synth_audio_table,
        synth_media_table,
    )

    ds = rd.from_arrow(synth_media_table(8))
    out = ds.map_batches(
        ImageResizer, fn_constructor_kwargs={"out_w": 16, "out_h": 16, "strict": False},
        batch_format="pyarrow", batch_size=4, concurrency=1,
    ).take_all()
    assert len(out) == 8
    for r in out:
        assert r["width"] == 16 and r["height"] == 16
        assert len(r["payload"]) == 16 * 16 * 3
        assert r["mime"] == "image/raw-rgb"

    audio = rd.from_arrow(synth_audio_table(6))
    chunks = audio.map_batches(
        AudioChunker,
        fn_constructor_kwargs={"sample_rate": 8000, "chunk_s": 0.5, "strict": False},
        batch_format="pyarrow", batch_size=4, concurrency=1,
    ).take_all()
    assert chunks
    for r in chunks:
        assert 0.0 <= r["rms"] <= 1.0
        assert 0.0 <= r["zcr"] <= 1.0
    # strict mode raises at the decode boundary (documented stub)
    import pytest as _p

    with _p.raises(NotImplementedError):
        ImageResizer(strict=True)(synth_media_table(2))
    with _p.raises(NotImplementedError):
        AudioChunker(strict=True)(synth_audio_table(2))


def _naive_ngram_pairs(rows, n=3, threshold=0.8):
    """All-pairs set-based reference (test-only; quadratic)."""
    import itertools
    import re

    split = re.compile(r"[^a-z0-9]+")
    grams = {}
    for r in rows:
        w = [x for x in split.split((r["text"] or "").lower()) if x]
        grams[r["doc_id"]] = (
            {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}
            if len(w) >= n
            else set()
        )
    out = set()
    for a, b in itertools.combinations(sorted(grams), 2):
        sa, sb = grams[a], grams[b]
        s = len(sa & sb)
        if s and s / (len(sa) + len(sb) - s) >= threshold:
            out.add((a, b, s))
    return out


def test_ngram_jaccard_pairs_matches_naive(docs):
    from reden_ray.stages.dedup import ngram_jaccard_pairs

    got = {
        (r["doc_a"], r["doc_b"], r["shared"])
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.8).take_all()
    }
    want = _naive_ngram_pairs(docs.take_all(), n=3, threshold=0.8)
    assert got == want and got  # non-empty: the fixture plants near-dups


def test_ngram_jaccard_pairs_max_df_drops_hot_grams(ray_session):
    import ray.data as rd

    from reden_ray.stages.dedup import ngram_jaccard_pairs

    # every doc shares the hot trigram "the hot gram"; pairs exist only
    # through it, so capping df below the corpus size drops them all
    rows = [
        {"doc_id": i, "text": f"the hot gram unique{i} word{i} tail{i}"}
        for i in range(20)
    ]
    ds = rd.from_items(rows)
    exact = ngram_jaccard_pairs(ds, n=3, threshold=0.05).take_all()
    assert exact  # the hot gram links pairs at a low threshold
    capped = ngram_jaccard_pairs(ds, n=3, threshold=0.05, max_df=5).take_all()
    assert capped == []


def test_ngram_jaccard_pairs_short_and_empty_docs(ray_session):
    import ray.data as rd

    from reden_ray.stages.dedup import ngram_jaccard_pairs

    rows = [
        {"doc_id": 1, "text": "only two"},
        {"doc_id": 2, "text": ""},
        {"doc_id": 3, "text": "a b c d"},
        {"doc_id": 4, "text": "a b c d"},
    ]
    got = ngram_jaccard_pairs(rd.from_items(rows), n=3, threshold=0.5).take_all()
    assert [(r["doc_a"], r["doc_b"], r["shared"]) for r in got] == [(3, 4, 2)]
    assert got[0]["jaccard"] == 1.0
