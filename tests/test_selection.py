"""Distributed exact order-statistic selection vs numpy ground truth.
Small collect_limit / n_buckets force multiple refinement passes so the
descent logic (edge-consistent bucketing, rank offsets, duplicate
collapse) is actually exercised, not just the final collect."""

from __future__ import annotations

import numpy as np
import pytest

from reden_ray.stages.selection import percentile_cont, select_order_stats


def _ds(values: np.ndarray, blocks: int = 7):
    import pyarrow as pa
    import ray.data as rd

    parts = np.array_split(values, blocks)
    return rd.from_arrow([pa.table({"v": pa.array(p, pa.float64())}) for p in parts])


def test_select_matches_numpy(ray_session):
    rng = np.random.default_rng(7)
    vals = rng.normal(100.0, 25.0, size=5000)
    ds = _ds(vals)
    ranks = [0, 1, 2499, 2500, 4998, 4999]
    got = select_order_stats(ds, "v", ranks, n_buckets=16, collect_limit=64)
    want = np.sort(vals)
    for k in ranks:
        assert got[k] == want[k], k


def test_heavy_duplicates(ray_session):
    # three distinct values: the candidate range collapses onto single
    # floats; counts never shrink below the duplicate cluster size
    vals = np.array([1.5] * 4000 + [2.5] * 999 + [9.0])
    rng = np.random.default_rng(1)
    rng.shuffle(vals)
    ds = _ds(vals)
    got = select_order_stats(ds, "v", [0, 3999, 4000, 4998, 4999],
                             n_buckets=8, collect_limit=10)
    assert got[0] == 1.5 and got[3999] == 1.5
    assert got[4000] == 2.5 and got[4998] == 2.5
    assert got[4999] == 9.0


def test_all_equal(ray_session):
    ds = _ds(np.full(1000, 42.25))
    got = select_order_stats(ds, "v", [0, 500, 999], n_buckets=8, collect_limit=10)
    assert set(got.values()) == {42.25}


def test_percentile_cont_matches_numpy(ray_session):
    rng = np.random.default_rng(11)
    vals = rng.exponential(10.0, size=3001)
    ds = _ds(vals)
    qs = [0.0, 0.25, 0.5, 0.9, 1.0]
    got = percentile_cont(ds, "v", qs, n_buckets=16, collect_limit=64)
    for q in qs:
        assert got[q] == pytest.approx(np.quantile(vals, q), abs=1e-9), q


def test_errors(ray_session):
    ds = _ds(np.array([1.0, 2.0]), blocks=1)
    with pytest.raises(ValueError, match="out of range"):
        select_order_stats(ds, "v", [2])
    with pytest.raises(ValueError, match="outside"):
        percentile_cont(ds, "v", [1.5])
