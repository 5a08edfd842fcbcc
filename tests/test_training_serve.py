"""Training-data serving batch (round 5): line-level boilerplate
removal (stages/lines.py), epoch shuffle ranks (stages/ordering.py),
hashed linear quality scoring (stages/scoring.py), token shard sink
(stages/shards.py).  SQL parity is covered by the oracle harness
(line_dedup_pages / train_order_epoch1 / quality_linear_score /
token_shards_manifest); here: naive goldens, partition invariance,
and the sink's resume/roundtrip contract.
"""

import hashlib
import os
import re
import tempfile

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from reden_ray.stages.lines import line_dedup
from reden_ray.stages.ordering import train_order
from reden_ray.stages.scoring import (
    dedup_keep_best,
    hash_weights,
    quality_linear_score,
    quality_threshold_per_source,
)
from reden_ray.stages.shards import (
    _token_ids,
    read_token_shards,
    write_token_shards,
)


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    return ray_session


def _md5le(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


# ---------------------------------------------------------------- lines


def _pages():
    boiler = "accept our cookies"
    nav = "home | about | contact"
    texts = [
        f"{nav}\nunique alpha text\n{boiler}\n",
        f"{nav}\nanother body line\n\n{boiler}",
        "standalone page\nno shared lines here",
        f"short\n{boiler}\nx",
    ]
    return pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts),
        }
    )


def _naive_line_dedup(t, min_docs, min_chars):
    texts = t.column("text").to_pylist()
    df: dict[str, set] = {}
    for i, x in enumerate(texts):
        for ln in set(x.split("\n")):
            if len(ln) >= min_chars:
                df.setdefault(ln, set()).add(i)
    hot = {ln for ln, s in df.items() if len(s) >= min_docs}
    out = {}
    for i, x in enumerate(texts):
        lines = x.split("\n")
        kept = [ln for ln in lines if ln not in hot or len(ln) < min_chars]
        out[i] = ("\n".join(kept), len(lines), len(lines) - len(kept))
    return out


def test_line_dedup_matches_naive_and_partition_invariant():
    t = _pages()
    want = _naive_line_dedup(t, 2, 1)
    for parts in (1, 3):
        rows = line_dedup(rd.from_arrow(t).repartition(parts), min_docs=2).take_all()
        got = {r["doc_id"]: (r["text"], r["n_lines"], r["n_removed"]) for r in rows}
        assert got == want, parts
    # the shared nav + cookie banner really went hot
    assert sum(v[2] for v in want.values()) >= 5


def test_line_dedup_min_chars_excludes_short_lines():
    t = _pages()
    # min_chars above every line length -> nothing eligible, no rewrites
    rows = line_dedup(rd.from_arrow(t), min_docs=2, min_chars=1000).take_all()
    assert all(r["n_removed"] == 0 for r in rows)
    texts = {r["doc_id"]: r["text"] for r in rows}
    orig = t.column("text").to_pylist()
    assert all(texts[i] == orig[i] for i in range(len(orig)))


# ------------------------------------------------------------- ordering


def test_train_order_is_md5_permutation():
    ids = np.arange(0, 101, dtype=np.int64) * 7  # non-contiguous ids
    t = pa.table({"doc_id": pa.array(ids)})
    want_order = sorted(ids.tolist(), key=lambda i: (_md5le(f"e3:{i}"), i))
    want = {d: r + 1 for r, d in enumerate(want_order)}
    for parts in (1, 5):
        rows = train_order(
            rd.from_arrow(t).repartition(parts), epoch=3, n_buckets=8
        ).take_all()
        got = {r["doc_id"]: r["train_rank"] for r in rows}
        assert got == want, parts
        assert sorted(got.values()) == list(range(1, len(ids) + 1))


def test_train_order_epochs_differ():
    t = pa.table({"doc_id": pa.array(np.arange(50, dtype=np.int64))})
    r1 = {r["doc_id"]: r["train_rank"] for r in train_order(rd.from_arrow(t), epoch=1).take_all()}
    r2 = {r["doc_id"]: r["train_rank"] for r in train_order(rd.from_arrow(t), epoch=2).take_all()}
    assert r1 != r2


# -------------------------------------------------------------- scoring


def _naive_score(text: str, dim: int) -> int:
    w = hash_weights(dim)
    toks = [x for x in re.split(r"[^a-z0-9]+", text.lower()) if x]
    return int(sum(int(w[_md5le(tok) % dim]) for tok in toks))


def test_quality_linear_score_matches_naive():
    texts = ["Hello, WORLD 42!", "the quick brown fox", "", "  ,,  ", "zz zz zz"]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts),
        }
    )
    rows = quality_linear_score(rd.from_arrow(t), dim=64).take_all()
    got = {r["doc_id"]: (r["score"], r["keep"]) for r in rows}
    for i, x in enumerate(texts):
        s = _naive_score(x, 64)
        assert got[i] == (s, 1 if s > 0 else 0), x
    assert got[2] == (0, 0)  # empty text scores 0, dropped


def test_quality_threshold_per_source_matches_naive():
    rng = np.random.RandomState(7)
    words = ["alpha", "beta", "gamma", "delta", "easy", "zork", "mumble"]
    texts = [" ".join(rng.choice(words, size=rng.randint(1, 9))) for _ in range(60)]
    srcs = [f"s{i % 3}" for i in range(60)]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(60, dtype=np.int64)),
            "text": pa.array(texts),
            "source": pa.array(srcs),
        }
    )
    dim = 64
    scores = {i: _naive_score(x, dim) for i, x in enumerate(texts)}
    want = {}
    for s in set(srcs):
        members = [i for i in range(60) if srcs[i] == s]
        k = int(np.ceil(0.25 * len(members)))
        thr = sorted((scores[i] for i in members), reverse=True)[k - 1]
        for i in members:
            if scores[i] >= thr:
                want[i] = (scores[i], s, thr)
    for parts in (1, 4):
        rows = quality_threshold_per_source(
            rd.from_arrow(t).repartition(parts), top_frac=0.25, dim=dim
        ).take_all()
        got = {r["doc_id"]: (r["score"], r["source"], r["threshold"]) for r in rows}
        assert got == want, parts


def test_dedup_keep_best_keeps_highest_score():
    texts = ["good text wins", "good text wins", "bad", "bad", "bad", "solo"]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts),
        }
    )
    for parts in (1, 3):
        rows = dedup_keep_best(rd.from_arrow(t).repartition(parts), dim=64).take_all()
        got = {r["doc_id"]: r["score"] for r in rows}
        # identical texts score identically -> min doc_id wins each group
        assert sorted(got) == [0, 2, 5], parts
        assert got[0] == _naive_score(texts[0], 64)


# --------------------------------------------------------------- shards


def _docs_for_shards(n=37):
    texts = [f"doc {i} body word{i % 5} tail" if i % 9 else "" for i in range(n)]
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
        }
    )


def test_token_shards_roundtrip_and_manifest():
    t = _docs_for_shards()
    out = tempfile.mkdtemp(prefix="tshards_")
    man = write_token_shards(
        rd.from_arrow(t).repartition(4), out, n_shards=4, vocab_size=97
    ).take_all()
    assert sorted(r["shard"] for r in man) == [0, 1, 2, 3]
    assert sum(r["n_docs"] for r in man) == t.num_rows
    # roundtrip: every doc's ids come back exactly, empty docs included
    back = {
        r["doc_id"]: list(r["token_ids"]) for r in read_token_shards(out).take_all()
    }
    texts = t.column("text").to_pylist()
    assert len(back) == t.num_rows
    for i, x in enumerate(texts):
        assert back[i] == _token_ids(x, 97).tolist(), i
    # manifest sums match the naive census
    want_tokens = sum(len(_token_ids(x, 97)) for x in texts)
    want_sum = sum(int(_token_ids(x, 97).astype(np.int64).sum()) for x in texts)
    assert sum(r["n_tokens"] for r in man) == want_tokens
    assert sum(r["id_sum"] for r in man) == want_sum


def test_token_shards_resume_skips_finished():
    t = _docs_for_shards(20)
    out = tempfile.mkdtemp(prefix="tshards_resume_")
    m1 = write_token_shards(rd.from_arrow(t), out, n_shards=3, vocab_size=97).take_all()
    mtimes = {
        f: os.path.getmtime(os.path.join(out, f))
        for f in os.listdir(out)
        if f.endswith(".bin")
    }
    m2 = write_token_shards(
        rd.from_arrow(t), out, n_shards=3, vocab_size=97, resume=True
    ).take_all()
    # resume did not rewrite any shard, and the manifest (re-read from
    # the untouched bytes) is identical
    for f, ts in mtimes.items():
        assert os.path.getmtime(os.path.join(out, f)) == ts, f
    key = lambda r: r["shard"]
    assert sorted(m1, key=key) == sorted(m2, key=key)
