"""Distributed ordered prefix-sum (the SQL ``SUM() OVER (ORDER BY ...)``
running total) WITHOUT a global sort.

Shape (the classic two-phase scan):

1. bucket each row by an order-contiguous coarse range of the (unique)
   order column (equal-width over [min, max] — doc ids are dense, and
   bucket skew only affects the tiny per-bucket cumsum work);
2. per-block partial sums per bucket -> one SMALL groupby(bucket) ->
   the <= ``n_buckets``-row bucket-total table collects on the driver,
   turns into EXCLUSIVE bucket offsets, and broadcasts via ``ray.put``;
3. one bucket-hash shuffle: each group sorts by the order column,
   cumsums, and adds its bucket's offset.

Total movement: one pass of partials (<= buckets x blocks rows) plus
one row-shuffle — no range repartition, no global sort.  At 10^12 rows
the bucket table stays driver-sized by construction (n_buckets is a
parameter, not data-dependent).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Max, Min, Sum


def ordered_prefix_sum(
    ds: rd.Dataset,
    order_col: str,
    value_col: str,
    alias: str = "cumsum",
    n_buckets: int = 256,
) -> rd.Dataset:
    """Append ``alias`` = inclusive running sum of ``value_col`` in
    ``order_col`` order.  ``order_col`` must be unique per row (the
    scan's order is otherwise ill-defined)."""
    from .joins import default_join_partitions
    from .partition import part_column  # noqa: F401  (kept for symmetry with peers)

    stats = ds.aggregate(Min(order_col), Max(order_col))
    lo = int(stats[f"min({order_col})"])
    hi = int(stats[f"max({order_col})"])
    width = max(1, -(-(hi - lo + 1) // n_buckets))

    def tag(t: pa.Table) -> pa.Table:
        v = t.column(order_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = (v - lo) // width
        return t.append_column("__bucket", pa.array(b, pa.int64()))

    tagged = ds.map_batches(tag, batch_format="pyarrow", batch_size=None)

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                "__bucket": t.column("__bucket").to_numpy(zero_copy_only=False),
                "s": t.column(value_col).to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("__bucket", as_index=False).sum()
        return pa.table(
            {
                "__bucket": pa.array(g["__bucket"], pa.int64()),
                "s": pa.array(g["s"].astype(np.float64), pa.float64()),
            }
        )

    totals = (
        tagged.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("__bucket")
        .aggregate(Sum("s", alias_name="s"))
        .take_all()
    )  # <= n_buckets rows by construction
    totals.sort(key=lambda r: r["__bucket"])
    offsets: dict[int, float] = {}
    run = 0.0
    for r in totals:
        offsets[int(r["__bucket"])] = run
        run += float(r["s"])
    off_ref = ray.put(offsets)

    def scan(g: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        b = int(g.column("__bucket")[0].as_py())
        idx = np.argsort(
            g.column(order_col).to_numpy(zero_copy_only=False), kind="stable"
        )
        g = g.take(pa.array(idx, pa.int64()))
        # float64 accumulation is EXACT for integer inputs up to 2^53 —
        # ~9e15, comfortably above e.g. total tokens at 100 TB (~2.5e13)
        v = g.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        c = np.cumsum(v) + off.get(b, 0.0)
        return g.drop_columns("__bucket").append_column(
            alias, pa.array(c, pa.float64())
        )

    return (
        tagged.groupby("__bucket").map_groups(scan, batch_format="pyarrow")
    )
