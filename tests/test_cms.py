"""Tests for stages/cms.py (Count-Min sketch)."""
import numpy as np
import pyarrow as pa
import ray.data as rd

from reden_ray.stages.cms import (
    DEPTH,
    WIDTH,
    cms_estimate,
    cms_matrix,
    count_min_sketch,
)


def _zipf_table(seed: int, n: int, n_keys: int) -> pa.Table:
    rng = np.random.RandomState(seed)
    keys = rng.zipf(1.5, size=n) % n_keys
    return pa.table({"k": pa.array(keys.astype(np.int64), pa.int64())})


def test_cms_one_sided_and_bound():
    t = _zipf_table(0, 50_000, 3000)
    ds = rd.from_arrow(t).repartition(8)
    m = cms_matrix(count_min_sketch(ds, "k"))
    uniq, exact = np.unique(
        t.column("k").to_numpy(zero_copy_only=False), return_counts=True
    )
    est = cms_estimate(m, pa.array(uniq, pa.int64()))
    # deterministic guarantee: never undercounts
    assert np.all(est >= exact)
    # probabilistic bound, pinned on the fixed seed/fixture: the classic
    # e*N/width Markov bound holds for EVERY key here (min over 4 rows)
    bound = np.e * len(t) / WIDTH
    assert np.max(est - exact) <= bound
    # total mass conservation per hash row
    assert np.all(m.sum(axis=1) == len(t))


def test_cms_merge_invariance():
    """The sketch is the same regardless of partitioning (associative
    elementwise merge)."""
    t = _zipf_table(3, 20_000, 500)
    m1 = cms_matrix(count_min_sketch(rd.from_arrow(t).repartition(2), "k"))
    m2 = cms_matrix(count_min_sketch(rd.from_arrow(t).repartition(13), "k"))
    assert np.array_equal(m1, m2)
    assert m1.shape == (DEPTH, WIDTH)


def test_cms_string_keys():
    vals = [f"url-{i % 97}" for i in range(5000)]
    t = pa.table({"k": pa.array(vals, pa.string())})
    m = cms_matrix(count_min_sketch(rd.from_arrow(t).repartition(4), "k"))
    uniq = sorted(set(vals))
    est = cms_estimate(m, pa.array(uniq, pa.string()))
    exact = np.array([vals.count(u) for u in uniq])
    assert np.all(est >= exact)
    # 97 keys in 4096 cells: collision-free w.h.p. on the fixed hash
    assert np.array_equal(est, exact)
