"""Skew-proof aggregation helpers.

A bare ``groupby(key).count()`` ships EVERY row through the exchange,
and a hot key (one predicate dominating billions of triples) lands on a
single reducer.  The fixes, per the north-rule's explicit-skew-handling
requirement:

- ``partial_groupby_count``: count inside each batch first (one output
  row per distinct key per batch), then a tiny global sum — the hot
  key's traffic shrinks from row-count to batch-count before the
  shuffle ever happens.  This is the mergeable-sketch shape with exact
  counters.
- ``salted_groupby_count``: for adversarial cases where even per-batch
  partials overload one reducer (astronomically many batches), salt the
  key with ``hash(row) % S`` sub-keys, aggregate, then unsalt in a
  second, tiny pass.  Included mostly as the documented pattern — the
  partial variant already bounds reducer load for counting.
- ``hll_distinct_per_group``: approximate count(distinct value) per
  key with BOUNDED per-key state (a 2^p-register HyperLogLog sketch,
  ~(2^p) bytes regardless of cardinality) — the honest shape when a
  hot key's exact distinct-set would be unbounded through the shuffle.
  Registers merge by elementwise max, so per-batch partial sketches
  pre-combine exactly like exact counters do.
- ``misra_gries_topk``: heavy hitters with BOUNDED per-block state —
  each block compresses its exact counts to a ``capacity``-entry
  Misra-Gries summary (classic decrement semantics), so the shuffle
  moves at most capacity rows per block no matter how wide the value
  domain is; summed summaries keep the MG guarantee (per-value
  undercount <= total_items / capacity), so every value with true
  frequency above that bound survives to the candidate set.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum


def partial_groupby_count(ds: rd.Dataset, keys: list[str], alias: str = "n") -> rd.Dataset:
    """Exact groupby-count with per-batch pre-aggregation."""

    def partial(batch: pa.Table) -> pa.Table:
        agg = batch.group_by(keys).aggregate([(keys[0], "count")])
        return agg.rename_columns(keys + [alias])  # keys first, then count

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(keys).aggregate(Sum(alias, alias_name=alias))


def salted_groupby_count(
    ds: rd.Dataset, keys: list[str], n_salts: int = 16, alias: str = "n"
) -> rd.Dataset:
    """Two-phase salted count: key+salt aggregate, then unsalt."""
    import numpy as np

    def add_salt(batch: pa.Table) -> pa.Table:
        salts = np.arange(batch.num_rows, dtype=np.int64) % n_salts
        return batch.append_column("__salt", pa.array(salts))

    def partial(batch: pa.Table) -> pa.Table:
        agg = batch.group_by(keys + ["__salt"]).aggregate([(keys[0], "count")])
        return agg.rename_columns(keys + ["__salt", alias])  # keys, salt, count

    salted = (
        ds.map_batches(add_salt, batch_format="pyarrow")
        .map_batches(partial, batch_format="pyarrow")
        .groupby(keys + ["__salt"])
        .aggregate(Sum(alias, alias_name=alias))
    )
    return salted.groupby(keys).aggregate(Sum(alias, alias_name=alias))


def _hll_registers(values, p: int) -> "np.ndarray":
    """HLL register array (uint8, length 2^p) for an int64 value array."""
    import numpy as np

    from .dedup import _fmix64

    assert p >= 11  # keeps the 64-p-bit suffix exactly representable in f64
    h = _fmix64(np.asarray(values, dtype=np.int64).view(np.uint64))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    # rho = position of the leftmost 1-bit in the (64-p)-bit suffix
    # (1-based from the top); all-zero suffix -> 64-p+1
    w = (h & np.uint64((1 << (64 - p)) - 1)).astype(np.float64)
    rho = np.where(
        w > 0, (64 - p) - np.floor(np.log2(np.maximum(w, 1.0))), 64 - p + 1
    ).astype(np.uint8)
    regs = np.zeros(1 << p, dtype=np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def _hll_estimate(regs: "np.ndarray", p: int) -> float:
    import numpy as np

    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:  # small-range linear counting
        est = m * np.log(m / zeros)
    return float(est)


def hll_distinct_per_group(
    ds: rd.Dataset, key: str, value: str, p: int = 12, alias: str = "approx_distinct"
) -> rd.Dataset:
    """Approximate count(distinct ``value``) per ``key`` (int64 cols).

    Per-batch: one 2^p-register sketch per key present in the batch
    (vectorized hash + scatter-max); the shuffle then moves <= one
    (key, 2^p-byte blob) row per key per batch, and the per-key merge
    is an elementwise max — state is BOUNDED no matter how hot the key
    (standard error ~1.04/sqrt(2^p): ~1.6% at p=12).  Use the exact
    ``distinct_count_per_group`` when per-key cardinality is known to
    be small."""
    import numpy as np

    def partial(batch: pa.Table) -> pa.Table:
        # ONE vectorized scatter-max over (key-index, register-index)
        # pairs — no per-key Python loop, no per-key O(N) mask scan
        from .dedup import _fmix64

        keys_np = batch.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        vals_np = batch.column(value).to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(keys_np, return_inverse=True)
        h = _fmix64(vals_np.view(np.uint64))
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        w = (h & np.uint64((1 << (64 - p)) - 1)).astype(np.float64)
        rho = np.where(
            w > 0, (64 - p) - np.floor(np.log2(np.maximum(w, 1.0))), 64 - p + 1
        ).astype(np.uint8)
        regs = np.zeros((len(uniq), 1 << p), dtype=np.uint8)
        np.maximum.at(regs, (inv, idx), rho)
        return pa.table(
            {
                key: pa.array(uniq, pa.int64()),
                "__hll": pa.array([regs[i].tobytes() for i in range(len(uniq))], pa.binary()),
            }
        )

    from .joins import default_join_partitions
    from .partition import part_column, sorted_segments

    n_parts = default_join_partitions()

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, [key], n_parts))

    def merge_part(group: pa.Table) -> pa.Table:
        # ONE call per coarse key-hash partition; register merge is a
        # segmented elementwise max (np.maximum.reduceat over the
        # stacked sketch matrix), estimates vectorized across keys
        t, starts, ends = sorted_segments(group, [key])
        regs = np.frombuffer(
            b"".join(t.column("__hll").to_pylist()), dtype=np.uint8
        ).reshape(t.num_rows, 1 << p)
        merged = np.maximum.reduceat(regs, starts, axis=0)
        m = 1 << p
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(np.power(2.0, -merged.astype(np.float64)), axis=1)
        zeros = np.count_nonzero(merged == 0, axis=1)
        small = (est <= 2.5 * m) & (zeros > 0)
        with np.errstate(divide="ignore"):
            lin = m * np.log(np.where(zeros > 0, m / np.maximum(zeros, 1), 1.0))
        est = np.where(small, lin, est)
        return pa.table(
            {
                key: t.column(key).take(pa.array(starts)),
                alias: pa.array(np.rint(est).astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(merge_part, batch_format="pyarrow")
    )


def approx_quantiles(
    ds: rd.Dataset, col: str, qs: list[float], n_bins: int = 4096
) -> dict[float, float]:
    """Approximate quantiles with BOUNDED state: a fixed-width
    histogram sketch (the mergeable-sketch family member for
    continuous columns, next to the HLL distinct sketch).

    Two cheap passes: (1) global min/max aggregate; (2) per-block
    ``np.histogram`` partials merged by elementwise sum through a
    global Ray aggregate — the driver only ever sees ``n_bins`` int64
    counters regardless of row count.  The returned value for each q
    is the upper edge of the bin where the cumulative count crosses
    q*N, so the error is bounded by one bin width
    ``(max-min)/n_bins`` in VALUE terms (not rank terms) — unlike the
    exact-but-domain-bounded counting-histogram median in
    ``pipelines/relational.a11_median_price``, this works for any
    continuous column at ~32 KiB of state.
    """
    import numpy as np
    from ray.data.aggregate import AggregateFn, Max, Min

    stats = ds.aggregate(Min(col), Max(col))
    lo, hi = float(stats[f"min({col})"]), float(stats[f"max({col})"])
    if hi <= lo:  # constant column
        return {q: lo for q in qs}
    edges = np.linspace(lo, hi, n_bins + 1)

    def acc(counts: np.ndarray, block: pa.Table) -> np.ndarray:
        vals = block.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        h, _ = np.histogram(vals, bins=edges)
        return counts + h

    fn = AggregateFn(
        init=lambda _k: np.zeros(n_bins, dtype=np.int64),
        merge=lambda a, b: a + b,
        accumulate_block=acc,
        name="hist",
    )
    res = ds.aggregate(fn)
    counts = np.asarray(res["hist"] if isinstance(res, dict) else res)
    cum = np.cumsum(counts)
    n = int(cum[-1])
    out = {}
    for q in qs:
        target = max(1, int(np.ceil(q * n)))
        i = int(np.searchsorted(cum, target))
        out[q] = float(edges[min(i + 1, n_bins)])
    return out




_MG_LOSS_SENTINEL = "\x00__mg_block_loss__"


def _mg_compress(values: list, counts: "np.ndarray", capacity: int):
    """Classic Misra-Gries compress: if more than ``capacity`` entries,
    subtract the (capacity+1)-th largest count from all and drop the
    non-positive remainder.  Every value's undercount from this block
    is <= the returned delta."""
    import numpy as np

    if len(values) <= capacity:
        return values, counts, 0
    order = np.argsort(counts)[::-1]
    delta = int(counts[order[capacity]])
    keep = order[:capacity]
    kept_counts = counts[keep] - delta
    pos = np.flatnonzero(kept_counts > 0)
    return [values[i] for i in keep[pos]], kept_counts[pos], delta


def misra_gries_topk(
    ds: rd.Dataset,
    column: str,
    top_n: int = 20,
    capacity: int = 1024,
) -> pa.Table:
    """Approximate top-n string values by frequency with bounded
    everything: <= capacity+1 summary rows per block through the one
    shuffle, <= a few top_n-sized blocks on the driver.  Returns
    (value, est_count, max_undercount): est_count is a LOWER bound on
    the true count, est_count + max_undercount an upper bound
    (max_undercount = the summed per-block compress deltas, which is
    <= total_items / capacity) — so any value whose true frequency
    exceeds that bound is guaranteed present."""
    import numpy as np
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        vc = t.column(column).value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        vals = vc.field("values").to_pylist()
        counts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        vals, counts, delta = _mg_compress(list(vals), counts, capacity)
        # the block's compress loss rides as ONE sentinel row so the
        # GLOBAL undercount bound (sum over all blocks' deltas) is
        # computable downstream even for values this block dropped
        vals = list(vals) + [_MG_LOSS_SENTINEL]
        counts = np.concatenate([counts, [0]])
        loss = np.zeros(len(vals), dtype=np.int64)
        loss[-1] = delta
        return pa.table(
            {
                "value": pa.array(vals, pa.string()),
                "n": pa.array(counts, pa.int64()),
                "loss": pa.array(loss, pa.int64()),
            }
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("value")
        .sum(["n", "loss"])
    )

    def block_top(t: pa.Table) -> pa.Table:
        # keep the sentinel (its summed loss IS the global bound) plus
        # this block's top_n candidates
        idx = pc.sort_indices(
            t, sort_keys=[("sum(n)", "descending"), ("value", "ascending")]
        )
        t = t.take(idx)
        keep = np.zeros(t.num_rows, dtype=bool)
        keep[: min(top_n, t.num_rows)] = True
        sent = pc.equal(t.column("value"), _MG_LOSS_SENTINEL).to_numpy(
            zero_copy_only=False
        )
        return t.filter(pa.array(keep | sent))

    rows = merged.map_batches(
        block_top, batch_format="pyarrow", batch_size=None
    ).take_all()  # <= top_n+1 rows per merged block; merged blocks are few
    global_loss = sum(r["sum(loss)"] for r in rows if r["value"] == _MG_LOSS_SENTINEL)
    cands = [r for r in rows if r["value"] != _MG_LOSS_SENTINEL]
    cands.sort(key=lambda r: (-r["sum(n)"], r["value"]))
    cands = cands[:top_n]
    return pa.table(
        {
            "value": pa.array([r["value"] for r in cands], pa.string()),
            "est_count": pa.array([r["sum(n)"] for r in cands], pa.int64()),
            "max_undercount": pa.array(
                [global_loss] * len(cands), pa.int64()
            ),
        }
    )
