"""Property tests (hypothesis) for the pure math under the round-3
algorithmic modules: Misra-Gries compress conservation and the
edge-consistent bucketing invariant the selection module's rank
arithmetic rests on."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from reden_ray.stages.aggregates import _mg_compress
from reden_ray.stages.selection import _edges


@given(
    counts=st.lists(st.integers(min_value=1, max_value=10_000), min_size=1, max_size=300),
    capacity=st.integers(min_value=1, max_value=64),
)
@settings(max_examples=200, deadline=None)
def test_mg_compress_conserves_guarantees(counts, capacity):
    values = [f"v{i}" for i in range(len(counts))]
    arr = np.array(counts, dtype=np.int64)
    kept_v, kept_c, delta = _mg_compress(list(values), arr, capacity)
    # size bound
    assert len(kept_v) <= capacity
    truth = dict(zip(values, counts))
    kept = dict(zip(kept_v, kept_c))
    for v, c in kept.items():
        # kept counts are positive lower bounds with undercount <= delta
        assert 0 < c <= truth[v]
        assert truth[v] - c <= delta
    # dropped values had true count <= delta (else they'd have survived)
    for v, c in truth.items():
        if v not in kept:
            assert c <= delta or len(values) <= capacity


@given(
    lo=st.floats(min_value=-1e12, max_value=1e12, allow_nan=False),
    width=st.floats(min_value=1e-9, max_value=1e12, allow_nan=False),
    n_buckets=st.integers(min_value=2, max_value=64),
    raw=st.lists(st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
                 min_size=1, max_size=200),
)
@settings(max_examples=200, deadline=None)
def test_bucket_assignment_consistent_with_membership(lo, width, n_buckets, raw):
    """The invariant selection's multi-pass rank arithmetic requires:
    a value assigned to bucket b by searchsorted must satisfy the SAME
    comparisons the child pass will filter with ([edges[b], edges[b+1])
    / last-bucket-inclusive) — in exact float comparisons, not just
    mathematically."""
    hi = lo + width
    if not np.isfinite(hi) or hi <= lo:
        return
    edges = _edges(lo, hi, n_buckets)
    v = lo + np.array(raw) * (hi - lo)
    v = v[(v >= lo) & (v <= hi)]
    if len(v) == 0:
        return
    idx = np.searchsorted(edges, v, side="right") - 1
    np.clip(idx, 0, n_buckets - 1, out=idx)
    for val, b in zip(v, idx):
        assert edges[b] <= val, (val, b, edges[b])
        if b < n_buckets - 1:
            assert val < edges[b + 1], (val, b, edges[b + 1])
        else:
            assert val <= edges[-1]
