"""Misra-Gries heavy hitters: bound contract vs exact counts, and exact
equality when capacity covers the vocabulary (delta 0 everywhere)."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from reden_ray.stages.aggregates import misra_gries_topk


def _zipf_ds(n_rows: int = 20_000, vocab: int = 2_000, blocks: int = 8, seed: int = 5):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    vals = [f"w{int(v)}" for v in rng.zipf(1.3, size=n_rows) % vocab]
    tables = [
        pa.table({"term": pa.array(list(chunk), pa.string())})
        for chunk in np.array_split(np.array(vals), blocks)
    ]
    import ray.data as rd

    return rd.from_arrow(tables), Counter(vals)


def test_mg_bound_contract(ray_session):
    ds, truth = _zipf_ds()
    capacity = 64
    out = misra_gries_topk(ds, "term", top_n=15, capacity=capacity)
    est = dict(zip(out.column("value").to_pylist(), out.column("est_count").to_pylist()))
    bound = out.column("max_undercount")[0].as_py() if out.num_rows else 0
    total = sum(truth.values())
    assert bound <= total // capacity + len(truth)  # sum of block deltas is small
    for v, e in est.items():
        assert e <= truth[v] <= e + bound, v
    # top-n guarantee: if true[v] > est[last output] + bound then
    # est[v] >= true[v] - bound > est[last] would out-rank it, so v
    # must be in the output (the summary-survival guarantee composed
    # with the top-n cut)
    min_est = min(est.values())
    for v, c in truth.items():
        if c > min_est + bound:
            assert v in est, (v, c, min_est, bound)


def test_mg_exact_when_capacity_covers_vocab(ray_session):
    ds, truth = _zipf_ds(n_rows=5_000, vocab=300)
    out = misra_gries_topk(ds, "term", top_n=10, capacity=10_000)
    assert out.column("max_undercount").to_pylist() == [0] * out.num_rows
    want = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = list(
        zip(out.column("value").to_pylist(), out.column("est_count").to_pylist())
    )
    assert got == want


def test_mg_empty(ray_session):
    import ray.data as rd

    empty = rd.from_arrow(pa.table({"term": pa.array([], pa.string())}))
    out = misra_gries_topk(empty, "term", top_n=5, capacity=16)
    assert out.num_rows == 0
