"""Tests for stages/fuzzy.py (vectorized Levenshtein top-1)."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from reden_ray.stages.fuzzy import (
    _pad_codes,
    levenshtein_probe_block,
    levenshtein_top1,
)


def _lev(a: str, b: str) -> int:
    # textbook scalar DP
    m, n = len(a), len(b)
    prev = list(range(m + 1))
    for j in range(1, n + 1):
        cur = [j] + [0] * m
        for i in range(1, m + 1):
            cur[i] = min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[m]


@pytest.mark.parametrize("seed", [0, 3])
def test_vectorized_matches_scalar_dp(seed):
    rng = np.random.RandomState(seed)
    alpha = "abcdé"
    names = [
        "".join(rng.choice(list(alpha), size=rng.randint(0, 12)))
        for _ in range(60)
    ]
    probe = "".join(rng.choice(list(alpha), size=7))
    chars, lens = _pad_codes(names)
    got = levenshtein_probe_block(probe, chars, lens)
    want = [_lev(probe, n) for n in names]
    assert got.tolist() == want


def test_known_distances():
    chars, lens = _pad_codes(["sitting", "", "kitten", "kittens"])
    got = levenshtein_probe_block("kitten", chars, lens)
    assert got.tolist() == [3, 6, 0, 1]


def test_top1_end_to_end():
    names = ["alpha", "alpine", "beta", "betta", "gamma", "gamut", "alphax"]
    ds = rd.from_arrow(pa.table({"name": pa.array(names, pa.string())})).repartition(3)
    probes = [(0, "alpha"), (1, "betta"), (2, "gamma")]
    out = (
        levenshtein_top1(ds, "name", probes)
        .to_pandas()
        .sort_values("probe_id")
        .reset_index(drop=True)
    )
    # best non-self match; ties lexicographic
    def naive(p):
        best = min(
            (( _lev(p, n), n) for n in names if n != p),
        )
        return best

    for i, (pid, p) in enumerate(probes):
        d, m = naive(p)
        assert out.loc[i, "best_match"] == m
        assert out.loc[i, "distance"] == d


# --- ed<=1 deletion-neighborhood pairs ------------------------------------

def _naive_ed1_pairs(rows):
    out = set()
    for i, (ia, na) in enumerate(rows):
        for ib, nb in rows[i + 1 :]:
            if _lev(na, nb) <= 1:
                a, b = (ia, ib) if ia < ib else (ib, ia)
                out.add((a, b, 0 if na == nb else 1))
    return out


@pytest.mark.parametrize("seed,n", [(0, 120), (9, 200)])
def test_ed1_pairs_matches_naive(seed, n):
    from reden_ray.stages.fuzzy import ed1_pairs

    rng = np.random.RandomState(seed)
    alpha = list("abc")
    rows = [
        (i, "".join(rng.choice(alpha, size=rng.randint(0, 6))))
        for i in range(n)
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "id": pa.array([r[0] for r in rows], pa.int64()),
                "name": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    ).repartition(5)
    got = ed1_pairs(ds, "id", "name", n_partitions=4).to_pandas()
    got_set = {(r.id_a, r.id_b, r.distance) for r in got.itertuples()}
    assert got_set == _naive_ed1_pairs(rows)


def test_ed1_verify_cases():
    from reden_ray.stages.fuzzy import _ed_le1_verify

    a = ["kitten", "kitten", "kitten", "abc", "", "a", "abc", "abcd"]
    b = ["kitten", "mitten", "sitting", "ab", "a", "", "axc", "abc"]
    want = [_lev(x, y) <= 1 for x, y in zip(a, b)]
    assert _ed_le1_verify(a, b).tolist() == want


def test_jaro_winkler_matches_duckdb():
    """Kernel semantics pinned to DuckDB's jaro_winkler_similarity
    (boost threshold 0.7, prefix cap 4, empty -> 0.0) by fuzz."""
    import random

    import duckdb

    from reden_ray.stages.fuzzy import _pad_codes, jaro_winkler_probe_block

    random.seed(42)
    con = duckdb.connect()
    for _ in range(12):
        probe = "".join(random.choices("abcdef ", k=random.randint(0, 12)))
        names = [
            "".join(random.choices("abcdef ", k=random.randint(0, 14)))
            for _ in range(40)
        ]
        chars, lens = _pad_codes(names)
        got = jaro_winkler_probe_block(probe, chars, lens)
        for nm, g in zip(names, got):
            ref = con.sql(
                "select jaro_winkler_similarity(?, ?)", params=[probe, nm]
            ).fetchone()[0]
            assert abs(ref - g) < 1e-12, (probe, nm, ref, g)


def test_jaro_winkler_known_values():
    from reden_ray.stages.fuzzy import _pad_codes, jaro_winkler_probe_block

    chars, lens = _pad_codes(["marhta", "martha", "", "dwayne"])
    got = jaro_winkler_probe_block("martha", chars, lens)
    assert abs(got[0] - 0.9611111111111111) < 1e-12
    assert got[1] == 1.0
    assert got[2] == 0.0
