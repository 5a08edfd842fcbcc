"""Temporal joins Ray Data lacks natively: as-of (backward) join and
interval/range join.

These are the training-pipeline temporal lookups — "latest state as of
time t" attribution and point-in-window counting — implemented as the
SURVEY.md custom-operator recipe: a composition of ``map_batches`` +
``union`` + one ``groupby(partition).map_groups`` whose body is pure
vectorized numpy, never a per-key Python call.

- ``asof_join``: hash-partition BOTH sides by the equality key (a
  matching pair must co-locate), then per partition sort the right
  side by (key, ts, tie) and answer every left row with ONE
  ``np.searchsorted`` over a rank-compressed ``(key, ts)`` composite.
  Hot keys stay inside the vectorized segment math; no global sort.
- ``interval_count``: no equality key, so co-location comes from TIME
  BUCKETS of the interval width: each interval overlaps at most two
  buckets (``start // W`` and ``(end - 1) // W``), each point exactly
  one; partition by bucket, count per interval row with two
  searchsorteds, then a tiny (<= 2 rows per interval) sum-groupby
  re-keys by the interval id.

Partitioning assumptions (the custom-operator contract requires they
be documented):

* keys and tie-breakers are non-null int64 (dictionary-encode string
  keys upstream); timestamps are Arrow timestamps of any unit or raw
  int64 microseconds.
* one partition's rows must stay below ~3e9 so the rank composite
  ``code * (n_ts + 1) + rank`` fits int64 — size ``n_parts`` so a
  partition holds well under that (the default is CPU-sized; corpus-
  scale callers pass an explicit count).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Sum

from .joins import default_join_partitions
from .partition import part_column


def _np(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)


def _arrow_schema(ds: rd.Dataset) -> pa.Schema:
    s = ds.schema()
    return s.base_schema if hasattr(s, "base_schema") else s


def _ts_us(col):
    """Normalize any timestamp unit to int64 microseconds BEFORE the
    integer math (pandas-written parquet is ns, the sf tables are us —
    mixing units silently corrupts bucket/rank arithmetic)."""
    if pa.types.is_timestamp(col.type):
        col = pc.cast(col, pa.timestamp("us"))
    return pc.cast(col, pa.int64())


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    left_cols: list[str],
    right_cols: list[str],
    right_tie: str,
    n_parts: int | None = None,
) -> rd.Dataset:
    """Backward as-of LEFT join: every left row gets the right row with
    the greatest ``right_ts <= left_ts`` for the same key (ties on the
    timestamp broken by max ``right_tie``), or nulls if none exists.

    Output columns: ``left_cols`` then ``right_cols`` (must be
    disjoint; ``right_tie`` must be one of ``right_cols`` or at least a
    non-null int64 column of ``right``).  Exactly one output row per
    left row — the left-join identity holds for empty right sides.
    """
    if set(left_cols) & set(right_cols):
        raise ValueError("left_cols and right_cols must be disjoint")
    n_parts = n_parts or default_join_partitions()
    lschema, rschema = _arrow_schema(left), _arrow_schema(right)
    # a fully-empty side can have NO inferrable schema (Ray returns
    # None after e.g. repartition of zero rows); its payload columns
    # degrade to null type — every value they'd carry is null anyway
    ltypes = {c: (lschema.field(c).type if lschema else pa.null()) for c in left_cols}
    rtypes = {c: (rschema.field(c).type if rschema else pa.null()) for c in right_cols}

    def proj(t: pa.Table, side: int) -> pa.Table:
        n = t.num_rows
        key, ts = (left_key, left_ts) if side == 0 else (right_key, right_ts)
        cols: dict[str, object] = {
            "__k": pc.cast(t.column(key), pa.int64()),
            "__t": _ts_us(t.column(ts)),
            "__tie": (
                pa.nulls(n, pa.int64())
                if side == 0
                else pc.cast(t.column(right_tie), pa.int64())
            ),
        }
        for c in left_cols:
            cols[c] = t.column(c) if side == 0 else pa.nulls(n, ltypes[c])
        for c in right_cols:
            cols[c] = pa.nulls(n, rtypes[c]) if side == 0 else t.column(c)
        cols["__side"] = pa.array(np.full(n, side, np.int8), pa.int8())
        out = pa.table(cols)
        return out.append_column("__part", part_column(out, ["__k"], n_parts))

    def merge(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__part"])
        side = g.column("__side")
        lt = g.filter(pc.equal(side, 0))
        rt = g.filter(pc.equal(side, 1))
        nl, nr = lt.num_rows, rt.num_rows
        out_cols: dict[str, object] = {c: lt.column(c) for c in left_cols}
        if nl == 0 or nr == 0:
            # left-join identity: no rows / all-null payload
            for c in right_cols:
                out_cols[c] = pa.nulls(nl, rtypes[c])
            return pa.table(out_cols)
        lk = _np(lt.column("__k"))
        ltv = _np(lt.column("__t"))
        rk = _np(rt.column("__k"))
        rtv = _np(rt.column("__t"))
        tie = _np(rt.column("__tie"))
        all_k = np.unique(np.concatenate([lk, rk]))
        all_t = np.unique(np.concatenate([ltv, rtv]))
        big = np.int64(len(all_t) + 1)
        lcode = np.searchsorted(all_k, lk).astype(np.int64)
        rcode = np.searchsorted(all_k, rk).astype(np.int64)
        lrank = np.searchsorted(all_t, ltv).astype(np.int64)
        rrank = np.searchsorted(all_t, rtv).astype(np.int64)
        # right sorted by (key, ts, tie): the searchsorted landing spot
        # is then exactly "greatest ts <= query, max tie among equals"
        order = np.lexsort((tie, rrank, rcode))
        comp_r = rcode[order] * big + rrank[order]
        pos = np.searchsorted(comp_r, lcode * big + lrank, side="right") - 1
        has = pos >= 0
        safe = np.where(has, pos, 0)
        match = has & (comp_r[safe] // big == lcode)
        match_pa = pa.array(match)
        take_idx = pa.array(order[safe], pa.int64())
        for c in right_cols:
            col = rt.column(c)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            out_cols[c] = pc.if_else(match_pa, col.take(take_idx), pa.nulls(nl, rtypes[c]))
        return pa.table(out_cols)

    lproj = left.map_batches(lambda t: proj(t, 0), batch_format="pyarrow")
    rproj = right.map_batches(lambda t: proj(t, 1), batch_format="pyarrow")
    return lproj.union(rproj).groupby("__part").map_groups(merge, batch_format="pyarrow")


def interval_count(
    points: rd.Dataset,
    intervals: rd.Dataset,
    *,
    point_ts: str,
    interval_start: str,
    width_us: int,
    interval_key: str,
    out_count: str = "n_points",
    n_parts: int | None = None,
) -> rd.Dataset:
    """Range join + count, no equality key: for every interval row
    ``[start, start + width_us)`` count the points whose timestamp
    falls inside.  Returns ``(interval_key, out_count)`` with one row
    per distinct key — zero-count intervals included (every interval
    row emits a partial, so no unmatched-side join is needed)."""
    n_parts = n_parts or default_join_partitions()
    width = np.int64(width_us)

    def proj_points(t: pa.Table) -> pa.Table:
        tsv = _np(_ts_us(t.column(point_ts)))
        out = pa.table(
            {
                "__b": pa.array(tsv // width, pa.int64()),
                "__k": pa.array(np.zeros(len(tsv), np.int64), pa.int64()),
                "__t": pa.array(tsv, pa.int64()),
                "__side": pa.array(np.zeros(len(tsv), np.int8), pa.int8()),
            }
        )
        return out.append_column("__part", part_column(out, ["__b"], n_parts))

    def proj_intervals(t: pa.Table) -> pa.Table:
        sv = _np(_ts_us(t.column(interval_start)))
        kv = _np(pc.cast(t.column(interval_key), pa.int64()))
        b0 = sv // width
        b1 = (sv + width - 1) // width  # bucket of the last contained instant
        extra = b1 != b0
        bb = np.concatenate([b0, b1[extra]])
        out = pa.table(
            {
                "__b": pa.array(bb, pa.int64()),
                "__k": pa.array(np.concatenate([kv, kv[extra]]), pa.int64()),
                "__t": pa.array(np.concatenate([sv, sv[extra]]), pa.int64()),
                "__side": pa.array(np.ones(len(bb), np.int8), pa.int8()),
            }
        )
        return out.append_column("__part", part_column(out, ["__b"], n_parts))

    def count_part(g: pa.Table) -> pa.Table:
        side = _np(g.column("__side"))
        bv = _np(g.column("__b"))
        kv = _np(g.column("__k"))
        tv = _np(g.column("__t"))
        im = side == 1
        ik = kv[im]
        if len(ik) == 0:
            return pa.table(
                {interval_key: pa.array([], pa.int64()), "__n": pa.array([], pa.int64())}
            )
        ib, istart = bv[im], tv[im]
        iend = istart + width
        pb, pt = bv[~im], tv[~im]
        all_b = np.unique(np.concatenate([pb, ib]))
        all_t = np.unique(np.concatenate([pt, istart, iend]))
        big = np.int64(len(all_t) + 1)
        pcode = np.searchsorted(all_b, pb).astype(np.int64)
        icode = np.searchsorted(all_b, ib).astype(np.int64)
        comp_p = np.sort(pcode * big + np.searchsorted(all_t, pt))
        lo = np.searchsorted(comp_p, icode * big + np.searchsorted(all_t, istart), "left")
        hi = np.searchsorted(comp_p, icode * big + np.searchsorted(all_t, iend), "left")
        # a bucket-b interval row only ever sees bucket-b points (the
        # composite band), so a window spanning two buckets counts each
        # point exactly once across its two rows
        return pa.table(
            {
                interval_key: pa.array(ik, pa.int64()),
                "__n": pa.array((hi - lo).astype(np.int64), pa.int64()),
            }
        )

    pts = points.map_batches(proj_points, batch_format="pyarrow")
    ivs = intervals.map_batches(proj_intervals, batch_format="pyarrow")
    partials = pts.union(ivs).groupby("__part").map_groups(count_part, batch_format="pyarrow")
    agg = partials.groupby(interval_key).aggregate(Sum("__n", alias_name=out_count))

    def fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                interval_key: pc.cast(t.column(interval_key), pa.int64()),
                out_count: pc.cast(t.column(out_count), pa.int64()),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow")
