"""Skyline mask unit tests: duplicate handling, strict-dominance edges,
and the union-idempotence property the distributed merge relies on."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from reden_ray.pipelines.relational import pareto_keep


def _naive(price, size):
    n = len(price)
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        for j in range(n):
            if (
                price[j] <= price[i]
                and size[j] >= size[i]
                and (price[j] < price[i] or size[j] > size[i])
            ):
                keep[i] = False
                break
    return keep


def test_duplicates_both_kept():
    price = np.array([1.0, 1.0, 2.0])
    size = np.array([5, 5, 10], dtype=np.int64)
    assert pareto_keep(price, size).tolist() == [True, True, True]


def test_equal_size_smaller_price_dominates():
    price = np.array([1.0, 2.0])
    size = np.array([5, 5], dtype=np.int64)
    assert pareto_keep(price, size).tolist() == [True, False]


def test_equal_price_smaller_size_dominated():
    price = np.array([1.0, 1.0])
    size = np.array([5, 4], dtype=np.int64)
    assert pareto_keep(price, size).tolist() == [True, False]


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)), min_size=1, max_size=40
    ),
    st.integers(1, 5),
)
def test_matches_naive_and_merge_idempotent(pts, n_blocks):
    price = np.array([p for p, _ in pts], dtype=np.float64)
    size = np.array([s for _, s in pts], dtype=np.int64)
    keep = pareto_keep(price, size)
    assert keep.tolist() == _naive(price, size).tolist()

    # union-of-block-frontiers then global frontier == global frontier
    # (the distributed merge contract)
    surv_idx = []
    for b in range(n_blocks):
        idx = np.arange(b, len(price), n_blocks)
        if len(idx) == 0:
            continue
        k = pareto_keep(price[idx], size[idx])
        surv_idx.extend(idx[k].tolist())
    surv_idx = np.array(sorted(surv_idx), dtype=np.int64)
    k2 = pareto_keep(price[surv_idx], size[surv_idx])
    merged = set(surv_idx[k2].tolist())
    # compare as multisets of (price, size) values — identical duplicate
    # points may be kept from different blocks interchangeably
    a = sorted((price[i], size[i]) for i in merged)
    b = sorted((price[i], size[i]) for i in np.flatnonzero(keep))
    assert a == b
