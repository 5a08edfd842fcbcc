"""Text-prep kernels (stages/textprep.py): char-exact truncation and
hash split.  SQL parity is covered by the oracle harness
(truncate_tokens_32 / hash_split_corpus)."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from reden_ray.stages.textprep import hash_split, truncate_tokens


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    return ray_session


def test_truncate_is_char_exact_prefix():
    texts = [
        "  lead  ws one two three\t four five ",  # interior runs preserved
        "a b c",  # under the cap
        "",  # empty
        "x" * 50,  # one huge token
        " ".join(f"t{i}" for i in range(10)),
    ]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts),
        }
    )
    rows = truncate_tokens(rd.from_arrow(t), max_tokens=4).take_all()
    got = {r["doc_id"]: (r["text"], r["n_tokens"], r["truncated"]) for r in rows}
    assert got[0] == ("  lead  ws one two", 7, 1)
    assert got[1] == ("a b c", 3, 0)
    assert got[2] == ("", 0, 0)
    assert got[3] == ("x" * 50, 1, 0)
    assert got[4][2] == 1 and got[4][0] == "t0 t1 t2 t3"
    # truncated text is a verbatim prefix of the original
    orig = t.column("text").to_pylist()
    for i, (txt, _, _) in got.items():
        assert orig[i].startswith(txt)


def test_hash_split_is_deterministic_and_stable():
    t = pa.table({"doc_id": pa.array(np.arange(3000, dtype=np.int64))})
    rows = hash_split(rd.from_arrow(t), valid_ticks=100, test_ticks=100).take_all()
    got = {r["doc_id"]: r["split"] for r in rows}
    for i in (0, 1, 2):
        draw = (
            int.from_bytes(hashlib.md5(f"sp:{i}".encode()).digest()[:8], "little")
            % 1000
        )
        want = "valid" if draw < 100 else ("test" if draw < 200 else "train")
        assert got[i] == want
    # roughly proportional (10%/10%/80% at 3000 docs)
    counts = {s: sum(1 for v in got.values() if v == s) for s in set(got.values())}
    assert 200 < counts["valid"] < 400 and 200 < counts["test"] < 400
    # stability: a subset corpus assigns the same splits
    sub = hash_split(
        rd.from_arrow(t.slice(0, 100)), valid_ticks=100, test_ticks=100
    ).take_all()
    assert all(got[r["doc_id"]] == r["split"] for r in sub)


def test_stratified_split_exact_counts_and_partition_invariance():
    from reden_ray.stages.textprep import stratified_split

    n = 437  # not a multiple of anything convenient
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "source": pa.array([f"s{i % 3}" for i in range(n)]),
        }
    )
    out = stratified_split(rd.from_arrow(t), val_pct=10, test_pct=5).take_all()
    assert len(out) == n
    per = {}
    for r in out:
        per.setdefault(r["source"], []).append(r["split"])
    for src, splits in per.items():
        m = len(splits)
        want_val = (m * 10 + 99) // 100
        want_test = (m * 5 + 99) // 100
        assert splits.count("val") == want_val, src
        assert splits.count("test") == want_test, src
        assert splits.count("train") == m - want_val - want_test, src
    # partition invariance: a 7-block input assigns identically
    out2 = stratified_split(
        rd.from_arrow(t).repartition(7), val_pct=10, test_pct=5
    ).take_all()
    assert {r["doc_id"]: r["split"] for r in out2} == {
        r["doc_id"]: r["split"] for r in out
    }


def test_sentence_stats_edges(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from reden_ray.stages.textprep import sentence_stats

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "text": pa.array(
                    [
                        "One two. Three!  ?? Four five six.",
                        "no terminator here",
                        "",
                        "...",
                        "A.b? c!!",  # a.b splits into two sentences
                    ],
                    pa.string(),
                ),
            }
        )
    ).repartition(2)
    got = {
        r["doc_id"]: (r["n_sentences"], r["max_words"], r["first_words"])
        for r in sentence_stats(docs).take_all()
    }
    assert got == {
        1: (3, 3, 2),
        2: (1, 3, 3),
        3: (0, 0, 0),
        4: (0, 0, 0),
        5: (3, 1, 1),
    }
