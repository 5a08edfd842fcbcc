"""Distributed exact order-statistic selection (percentile_cont support).

``a11_median_price`` computes exact DISCRETE quantiles with counting
histograms because order prices live on a small value domain.  A
continuous float column (no bounded domain) needs true selection: find
the k-th smallest of 10^12 floats without ever collecting the column.

The classic shape, expressed over a Dataset:

1. one aggregate pass -> (min, max, count);
2. histogram-refinement passes: each pass slices the CURRENT candidate
   range into ``n_buckets`` explicit edge floats and bin-counts each
   block with ``np.searchsorted`` (a vectorized partial) + a tiny
   ``groupby(bucket).sum`` — the driver only ever sees <= n_buckets
   rows — then descends into the bucket containing the target rank.
   Bucket assignment and range membership BOTH compare against the same
   edge floats, so counts stay exact across passes (a floor-division
   bucketer can disagree with a later ``v < hi`` filter in the last
   ulp and silently corrupt ranks).  The range shrinks n_buckets-fold
   per pass; heavy duplicates stall the shrink only once the range has
   collapsed onto a single float value, which IS the answer;
3. a final filter pass collects just the values inside the residual
   range (bounded by ``collect_limit``) and picks exact order statistics.

Multiple target ranks share passes: targets whose candidate ranges
coincide (adjacent ranks k / k+1 of an interpolated percentile always
start coincident) are answered by one histogram, so ``percentile_cont``
for several q values costs a small fixed number of full scans.  Each
pass re-executes the input Dataset's lazy plan — at scale, pass the
column-pruned parquet read (re-reading one column beats materializing
it).  Rows are assumed non-null in ``column`` (filter first otherwise).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


def _edges(lo: float, hi: float, n_buckets: int) -> np.ndarray:
    e = np.linspace(lo, hi, n_buckets + 1)
    e[0], e[-1] = lo, hi  # exact endpoints regardless of fp in linspace
    return e


def _range_histogram(
    ds: rd.Dataset, column: str, edges: np.ndarray, hi_inc: bool
) -> np.ndarray:
    """Counts per bucket b = [edges[b], edges[b+1]); the last bucket also
    absorbs v == edges[-1] when ``hi_inc``.  Values outside are ignored."""
    n_buckets = len(edges) - 1
    lo, hi = edges[0], edges[-1]

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(column).to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]
        v = v[(v >= lo) & ((v <= hi) if hi_inc else (v < hi))]
        if len(v) == 0:
            return pa.table(
                {"bucket": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        idx = np.searchsorted(edges, v, side="right") - 1
        np.clip(idx, 0, n_buckets - 1, out=idx)  # v == hi -> last bucket
        counts = np.bincount(idx, minlength=n_buckets)
        nz = np.flatnonzero(counts)
        return pa.table(
            {"bucket": pa.array(nz, pa.int64()), "n": pa.array(counts[nz], pa.int64())}
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("bucket")
        .sum("n")
        .take_all()
    )  # <= n_buckets rows: driver-safe by construction
    out = np.zeros(n_buckets, dtype=np.int64)
    for r in rows:
        out[r["bucket"]] = r["sum(n)"]
    return out


def select_order_stats(
    ds: rd.Dataset,
    column: str,
    ranks: list[int],
    *,
    n_buckets: int = 4096,
    collect_limit: int = 200_000,
    max_passes: int = 6,
) -> dict[int, float]:
    """Exact values at the given 0-based global ranks (ascending order)
    of ``column``.  Never collects more than ``collect_limit`` values or
    ``n_buckets`` histogram rows onto the driver (barring pathological
    max_passes exhaustion, which falls back to collecting the residual
    range and is only reachable with adversarial duplicate clusters
    wider than one float ulp)."""
    from ray.data.aggregate import Count, Max, Min

    agg = ds.aggregate(Min(column), Max(column), Count())
    gmin, gmax, n = agg[f"min({column})"], agg[f"max({column})"], agg["count()"]
    if n == 0:
        raise ValueError("empty input")
    for k in ranks:
        if not 0 <= k < n:
            raise ValueError(f"rank {k} out of range for {n} rows")

    # per-rank candidate state: (lo, hi, hi_inclusive, count inside,
    # number of values sorting strictly below lo)
    state: dict[int, tuple[float, float, bool, int, int]] = {
        k: (float(gmin), float(gmax), True, int(n), 0) for k in ranks
    }
    results: dict[int, float] = {}

    for _ in range(max_passes):
        pending = {
            k: s
            for k, s in state.items()
            if k not in results and s[3] > collect_limit
        }
        if not pending:
            break
        # one histogram per DISTINCT candidate range, shared across ranks
        by_range: dict[tuple[float, float, bool], list[int]] = {}
        for k, (lo, hi, hi_inc, _cnt, _base) in pending.items():
            by_range.setdefault((lo, hi, hi_inc), []).append(k)
        for (lo, hi, hi_inc), ks in by_range.items():
            if lo == hi:  # all remaining values identical: answered
                for k in ks:
                    results[k] = lo
                continue
            edges = _edges(lo, hi, n_buckets)
            counts = _range_histogram(ds, column, edges, hi_inc)
            cum = np.cumsum(counts)
            for k in ks:
                base = state[k][4]
                local = k - base  # rank within the candidate range
                b = int(np.searchsorted(cum, local + 1))
                new_lo, new_hi = float(edges[b]), float(edges[b + 1])
                new_inc = hi_inc and b == n_buckets - 1
                new_base = base + (int(cum[b - 1]) if b else 0)
                state[k] = (new_lo, new_hi, new_inc, int(counts[b]), new_base)
                if new_lo == new_hi or (not new_inc and np.nextafter(
                        new_lo, new_hi) >= new_hi):
                    # range holds a single representable float
                    results[k] = new_lo

    # final: collect ALL residual ranges in ONE scan (values tagged by
    # range id), then pick exactly — one pass no matter how many target
    # ranks survive to this phase
    by_range = {}
    for k in state:
        if k in results:
            continue
        lo, hi, hi_inc, _cnt, _base = state[k]
        by_range.setdefault((lo, hi, hi_inc), []).append(k)
    if not by_range:
        return results
    ranges = list(by_range)

    def in_ranges(t: pa.Table) -> pa.Table:
        v = t.column(column).to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]
        rids, vals = [], []
        for rid, (lo, hi, hi_inc) in enumerate(ranges):
            keep = (v >= lo) & ((v <= hi) if hi_inc else (v < hi))
            hit = v[keep]
            rids.append(np.full(len(hit), rid, dtype=np.int64))
            vals.append(hit)
        return pa.table(
            {
                "rid": pa.array(np.concatenate(rids), pa.int64()),
                column: pa.array(np.concatenate(vals), pa.float64()),
            }
        )

    rows = ds.map_batches(
        in_ranges, batch_format="pyarrow", batch_size=None
    ).take_all()  # bounded: <= collect_limit values per residual range
    per_range: dict[int, list[float]] = {rid: [] for rid in range(len(ranges))}
    for r in rows:
        per_range[r["rid"]].append(r[column])
    for rid, key in enumerate(ranges):
        vals = np.sort(np.array(per_range[rid], dtype=np.float64))
        for k in by_range[key]:
            base = state[k][4]
            results[k] = float(vals[k - base])
    return results


def percentile_cont(
    ds: rd.Dataset, column: str, qs: list[float], **kwargs
) -> dict[float, float]:
    """SQL ``percentile_cont``: linear interpolation between the two
    order statistics straddling ``q * (n - 1)``.  All straddling ranks
    for all q values are selected in one shared set of passes."""
    # NOT aggregate(Count()): a bare Count() (no Min/Max alongside)
    # returns 0 on arrow blocks in Ray 2.49 (reproduced); ds.count()
    # uses block metadata and is also cheaper.
    n = int(ds.count())
    if n == 0:
        raise ValueError("empty input")
    needed: set[int] = set()
    pos = {}
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"q={q} outside [0, 1]")
        p = q * (n - 1)
        k = int(np.floor(p))
        needed.update([k, min(k + 1, n - 1)])
        pos[q] = (p, k)
    stats = select_order_stats(ds, column, sorted(needed), **kwargs)
    out = {}
    for q, (p, k) in pos.items():
        frac = p - k
        lo_v = stats[k]
        hi_v = stats[min(k + 1, n - 1)]
        out[q] = lo_v + frac * (hi_v - lo_v)
    return out
