"""Golden tests: distributed BPE merge training (stages/bpe.py) must
reproduce a naive in-memory Sennrich BPE exactly — merge sequence, tie
breaks, pair counts, and the greedy-left overlap rule ("aaa" -> aa,a)."""

import numpy as np
import pyarrow as pa
import pytest


def _naive_bpe(word_counts: dict[str, int], n_merges: int):
    segs = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, c in word_counts.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] = pairs.get((s[i], s[i + 1]), 0) + c
        if not pairs:
            break
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((left, right, cnt))
        for w, s in segs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return merges


def _docs_ds(texts):
    import ray.data as rd

    return rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))


def _counts(texts):
    wc: dict[str, int] = {}
    for t in texts:
        for w in t.lower().split():
            wc[w] = wc.get(w, 0) + 1
    return wc


CORPORA = {
    "banana": ["banana bandana banana", "ananas banana band", "aaa aaaa banana"],
    "english": [
        "the lower the newer the newest",
        "lower newer wider the widest lowest",
        "new news newest lowest low low low",
    ],
}


@pytest.mark.parametrize("name", sorted(CORPORA))
def test_bpe_matches_naive(ray_session, name):
    from reden_ray.stages.bpe import bpe_train_merges

    texts = CORPORA[name]
    got = bpe_train_merges(_docs_ds(texts), n_merges=8)
    ref = _naive_bpe(_counts(texts), 8)
    got_rows = list(
        zip(
            got.column("left").to_pylist(),
            got.column("right").to_pylist(),
            got.column("pair_count").to_pylist(),
        )
    )
    assert got_rows == ref
    assert got.column("rank").to_pylist() == list(range(1, len(ref) + 1))


def test_apply_merge_greedy_left(ray_session):
    """Overlap rule: run-parity keeps alternating candidates."""
    from reden_ray.stages.bpe import _apply_merge

    t = pa.table(
        {
            "toks": pa.array(
                [list("aaa"), list("aaaa"), list("ab"), list("a")],
                pa.list_(pa.string()),
            ),
            "wcount": pa.array([1, 1, 1, 1], pa.int64()),
        }
    )
    out = _apply_merge("a", "a")(t)
    assert out.column("toks").to_pylist() == [
        ["aa", "a"],
        ["aa", "aa"],
        ["a", "b"],
        ["a"],
    ]


def test_min_count_prunes_types(ray_session):
    from reden_ray.stages.bpe import word_type_table

    ds = _docs_ds(["x x x y", "x z"])
    rows = {
        r["word"]: r["wcount"]
        for r in word_type_table(ds, min_count=2).take_all()
    }
    assert rows == {"x": 4}


def _naive_encode_len(w, merges):
    rank = {p: i for i, p in enumerate(merges)}
    s = list(w)
    while len(s) > 1:
        best_i, best_r = -1, len(rank)
        for i in range(len(s) - 1):
            r = rank.get((s[i], s[i + 1]), len(rank))
            if r < best_r:
                best_i, best_r = i, r
        if best_i < 0 or best_r >= len(rank):
            break
        s[best_i : best_i + 2] = [s[best_i] + s[best_i + 1]]
    return len(s)


def test_bpe_encode_matches_naive(ray_session):
    from reden_ray.stages.bpe import bpe_encode_docs, bpe_train_merges

    texts = CORPORA["english"]
    ds = _docs_ds(texts)
    merges_tbl = bpe_train_merges(ds, n_merges=6)
    merges = list(
        zip(merges_tbl.column("left").to_pylist(), merges_tbl.column("right").to_pylist())
    )
    out = bpe_encode_docs(ds, merges_tbl).take_all()
    got = {r["text"]: r["n_bpe_tokens"] for r in out}
    for t in texts:
        ref = sum(_naive_encode_len(w, merges) for w in t.lower().split())
        assert got[t] == ref, (t, got[t], ref)
