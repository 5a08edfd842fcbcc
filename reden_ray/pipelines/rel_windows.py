"""Window / session / event-sequence queries (split from relational.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from ..stages.joins import broadcast_anti_join, broadcast_join, broadcast_semi_join, hash_join
from .rel_base import _read, _round_col

def window_tumbling(sf_dir: str) -> rd.Dataset:
    """per user per 1-hour tumbling window: event count + value sum.
    Windows are assigned per batch (vectorized epoch math); the groupby
    is the only shuffle.  Oracle: GROUP BY user, floor(epoch/3600)."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def assign_and_combine(t: pa.Table) -> pa.Table:
        # per-batch COMBINER before the exchange: one output row per
        # (user, window) per block, so the shuffle moves partials (a
        # window's hot traffic shrinks from events to blocks).  On a
        # real event log blocks are time-contiguous, so the reduction is
        # large; the synthetic table scatters (user, window) uniformly
        # (~1 group per row) and the combiner is ~cost-neutral there —
        # measured, kept because production windows cluster.
        epoch = pc.divide(pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()), 1_000_000)
        win = pc.cast(pc.floor(pc.divide(pc.cast(epoch, pa.float64()), 3600.0)), pa.int64())
        t = t.append_column("window_id", win)
        agg = t.group_by(["user_id", "window_id"]).aggregate(
            [("value", "count"), ("value", "sum")]
        )
        return agg.rename_columns(["user_id", "window_id", "pn", "psum"])

    out = (
        ev.map_batches(assign_and_combine, batch_format="pyarrow")
        .groupby(["user_id", "window_id"])
        .aggregate(Sum("pn", alias_name="n_events"), Sum("psum", alias_name="sum_value"))
    )
    return out.map_batches(lambda t: _round_col(t, "sum_value", 4), batch_format="pyarrow")


# --- streaming-shaped: hopping window ------------------------------------

def window_hopping(sf_dir: str, size_s: int = 3600, hop_s: int = 900) -> rd.Dataset:
    """per user per HOPPING window (1 h size, 15 min hop => every event
    lands in size/hop = 4 overlapping windows): count + value sum.

    The expansion is a vectorized per-batch repeat (np.repeat + tiled
    hop offsets) — the streaming-window analogue of a flat_map; the
    groupby stays the only shuffle and moves size/hop x the rows, which
    is the intrinsic cost of overlapping windows."""
    import numpy as np

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])
    n_hops = size_s // hop_s

    def assign_and_combine(t: pa.Table) -> pa.Table:
        epoch = pc.divide(
            pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()), 1_000_000
        ).to_numpy(zero_copy_only=False)
        base = np.floor(epoch / hop_s).astype(np.int64)
        n = len(base)
        wid = np.repeat(base, n_hops) - np.tile(np.arange(n_hops, dtype=np.int64), n)
        expanded = pa.table(
            {
                "user_id": pa.array(
                    np.repeat(t.column("user_id").to_numpy(zero_copy_only=False), n_hops)
                ),
                "window_id": pa.array(wid),
                "value": pa.array(
                    np.repeat(t.column("value").to_numpy(zero_copy_only=False), n_hops)
                ),
            }
        )
        # combiner: collapse the size/hop expansion back to one partial
        # row per (user, window) per block before the exchange
        agg = expanded.group_by(["user_id", "window_id"]).aggregate(
            [("value", "count"), ("value", "sum")]
        )
        return agg.rename_columns(["user_id", "window_id", "pn", "psum"])

    out = (
        ev.map_batches(assign_and_combine, batch_format="pyarrow")
        .groupby(["user_id", "window_id"])
        .aggregate(Sum("pn", alias_name="n_events"), Sum("psum", alias_name="sum_value"))
    )
    return out.map_batches(lambda t: _round_col(t, "sum_value", 4), batch_format="pyarrow")


# --- rollup (grouping sets as a union of aggregates) ----------------------

def o5_rank_per_group(sf_dir: str, k: int = 3) -> rd.Dataset:
    """ROW_NUMBER window per customer, top-k kept: per-block partial
    top-k per key (vectorized segment ranks — argmax's generalization),
    one key-hash shuffle of <= k rows per key per block, identical
    sweep at the partition level with the final rank emitted.  The
    all-to-all a SQL window function implies never moves more than k
    rows per key per block."""
    from ..stages.joins import default_join_partitions
    from ..stages.partition import part_column

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    n_parts = default_join_partitions()

    def topk_ranks(t: pa.Table, emit_rank: bool) -> pa.Table:
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("o_custkey", "ascending"),
                ("o_totalprice", "descending"),
                ("o_orderkey", "descending"),
            ],
        )
        t = t.take(idx)
        keys = t.column("o_custkey").to_numpy(zero_copy_only=False)
        n = len(keys)
        new = np.empty(n, dtype=bool)
        if n:
            new[0] = True
            new[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(new)
        seg_id = np.cumsum(new) - 1
        rank = np.arange(n, dtype=np.int64) - starts[seg_id]
        t = t.filter(pa.array(rank < k))
        if emit_rank:
            t = t.append_column("rank", pa.array(rank[rank < k] + 1, pa.int64()))
        return t

    def partial(t: pa.Table) -> pa.Table:
        t = topk_ranks(t, emit_rank=False)
        return t.append_column("__part", part_column(t, ["o_custkey"], n_parts))

    def final(g: pa.Table) -> pa.Table:
        return topk_ranks(g.drop_columns("__part"), emit_rank=True)

    out = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(final, batch_format="pyarrow")
    )
    return out.map_batches(lambda t: _round_col(t, "o_totalprice", 2), batch_format="pyarrow")


def o7_running_total(sf_dir: str) -> rd.Dataset:
    """Cumulative SUM window per user (ts, event_id order): one
    user-hash shuffle, vectorized per-partition segmented cumsum (the
    global cumsum minus each segment's starting offset — no per-user
    Python call)."""
    from ..stages.joins import default_join_partitions
    from ..stages.partition import part_column, sorted_segments

    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])
    n_parts = default_join_partitions()

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, ["user_id"], n_parts))

    def cumsum_part(g: pa.Table) -> pa.Table:
        t, starts, _ends = sorted_segments(
            g.drop_columns("__part"),
            ["user_id"],
            extra_sort=[("ts", "ascending"), ("event_id", "ascending")],
        )
        vals = t.column("value").to_numpy(zero_copy_only=False)
        cum = np.cumsum(vals)
        # reset per segment: subtract the cumsum just before each start
        seg_id = np.zeros(len(vals), dtype=np.int64)
        seg_id[starts] = 1
        seg_id = np.cumsum(seg_id) - 1
        offsets = np.concatenate([[0.0], cum[:-1]])[starts]
        running = cum - offsets[seg_id]
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "running_total": pa.array(np.round(running, 4), pa.float64()),
            }
        )

    return (
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(cumsum_part, batch_format="pyarrow")
    )


def o6_lag_delta(sf_dir: str) -> rd.Dataset:
    """LAG window: per user, each event's value delta vs the previous
    event (ts, event_id order); first event per user -> NULL.  Lag has
    no combiner (every row depends on its neighbor), so the plan is the
    minimal one: ONE user-hash shuffle, then a vectorized sort + segment
    diff per partition — no per-user Python call, no global sort."""
    from ..stages.joins import default_join_partitions
    from ..stages.partition import part_column, sorted_segments

    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])
    n_parts = default_join_partitions()

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, ["user_id"], n_parts))

    def lag_part(g: pa.Table) -> pa.Table:
        t, starts, _ends = sorted_segments(
            g.drop_columns("__part"),
            ["user_id"],
            extra_sort=[("ts", "ascending"), ("event_id", "ascending")],
        )
        vals = t.column("value").to_numpy(zero_copy_only=False)
        delta = np.empty(len(vals), dtype=np.float64)
        delta[1:] = vals[1:] - vals[:-1]
        mask = np.zeros(len(vals), dtype=bool)
        mask[starts] = True  # segment firsts -> NULL
        delta[starts] = 0.0  # masked; keep the buffer finite for round
        out = pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "delta": pa.array(
                    np.round(delta, 4), pa.float64(), mask=mask
                ),
            }
        )
        return out

    return (
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(lag_part, batch_format="pyarrow")
    )


def o13_moving_avg(sf_dir: str, window: int = 4) -> rd.Dataset:
    """Sliding mean over the last ``window`` rows per user (SQL ``ROWS
    BETWEEN window-1 PRECEDING AND CURRENT ROW``).  Frame windows have
    no combiner (each row needs its exact predecessors), so the minimal
    plan is the o6/o7 one: ONE user-hash shuffle, then a vectorized
    prefix-sum sliding window per partition — window start clamps to
    each user segment's start, so no per-user Python call ever runs."""
    from ..stages.joins import default_join_partitions
    from ..stages.partition import part_column, sorted_segments

    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])
    n_parts = default_join_partitions()

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, ["user_id"], n_parts))

    def ma_part(g: pa.Table) -> pa.Table:
        t, starts, _ends = sorted_segments(
            g.drop_columns("__part"),
            ["user_id"],
            extra_sort=[("ts", "ascending"), ("event_id", "ascending")],
        )
        vals = t.column("value").to_numpy(zero_copy_only=False)
        n = len(vals)
        cum = np.concatenate([[0.0], np.cumsum(vals)])
        seg_flag = np.zeros(n, dtype=np.int64)
        seg_flag[starts] = 1
        seg_id = np.cumsum(seg_flag) - 1
        pos = np.arange(n, dtype=np.int64)
        w0 = np.maximum(starts[seg_id], pos - (window - 1))
        cnt = pos - w0 + 1
        ma = (cum[pos + 1] - cum[w0]) / cnt
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "moving_avg": pa.array(np.round(ma, 4), pa.float64()),
            }
        )

    return (
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(ma_part, batch_format="pyarrow")
    )


def o14_ntile(sf_dir: str, tiles: int = 4) -> rd.Dataset:
    """NTILE(tiles) per user in (ts, event_id) order — SQL semantics:
    the first ``n % tiles`` tiles get ``ceil(n/tiles)`` rows.  NTILE
    needs each partition's total row count, so rows can't pre-reduce;
    the plan is the single user-hash shuffle + vectorized segment
    arithmetic (rank and segment length give the tile in closed form)."""
    from ..stages.joins import default_join_partitions
    from ..stages.partition import part_column, sorted_segments

    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts"])
    n_parts = default_join_partitions()

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, ["user_id"], n_parts))

    def ntile_part(g: pa.Table) -> pa.Table:
        t, starts, ends = sorted_segments(
            g.drop_columns("__part"),
            ["user_id"],
            extra_sort=[("ts", "ascending"), ("event_id", "ascending")],
        )
        n = t.num_rows
        seg_flag = np.zeros(n, dtype=np.int64)
        seg_flag[starts] = 1
        seg_id = np.cumsum(seg_flag) - 1
        pos = np.arange(n, dtype=np.int64)
        r0 = pos - starts[seg_id]
        seg_len = (ends - starts)[seg_id]
        q, rem = np.divmod(seg_len, tiles)
        boundary = (q + 1) * rem  # rows covered by the big (ceil) tiles
        big = r0 < boundary
        tile = np.where(
            big,
            r0 // np.maximum(q + 1, 1) + 1,
            rem + (r0 - boundary) // np.maximum(q, 1) + 1,
        )
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "tile": pa.array(tile, pa.int64()),
            }
        )

    return (
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(ntile_part, batch_format="pyarrow")
    )


def o15_first_last(sf_dir: str) -> rd.Dataset:
    """FIRST_VALUE / LAST_VALUE per user in (ts, event_id) order.
    Unlike LAG, the endpoints ARE associative: each block keeps only its
    per-user first and last rows (2 rows per key per block through the
    shuffle), and the final sweep re-applies the same endpoint pick."""
    from ..stages.joins import default_join_partitions
    from ..stages.partition import part_column, sorted_segments

    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])
    n_parts = default_join_partitions()

    def endpoints(t: pa.Table) -> pa.Table:
        t, starts, ends = sorted_segments(
            t, ["user_id"], extra_sort=[("ts", "ascending"), ("event_id", "ascending")]
        )
        keep = np.zeros(t.num_rows, dtype=bool)
        keep[starts] = True
        keep[ends - 1] = True
        return t.filter(pa.array(keep))

    def partial(t: pa.Table) -> pa.Table:
        t = endpoints(t)
        return t.append_column("__part", part_column(t, ["user_id"], n_parts))

    def final(g: pa.Table) -> pa.Table:
        t, starts, ends = sorted_segments(
            g.drop_columns("__part"),
            ["user_id"],
            extra_sort=[("ts", "ascending"), ("event_id", "ascending")],
        )
        vals = t.column("value").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": t.column("user_id").take(pa.array(starts)),
                "first_value": pa.array(np.round(vals[starts], 4), pa.float64()),
                "last_value": pa.array(np.round(vals[ends - 1], 4), pa.float64()),
            }
        )

    return (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(final, batch_format="pyarrow")
    )


def sessionize(sf_dir: str, gap_seconds: int = 1800) -> rd.Dataset:
    """Session windows per user (gap > 30 min splits): per-session row
    count + first event id.

    TWO-LEVEL, hot-user-safe shape (no per-user pandas group over raw
    events): (1) each BLOCK locally sorts by (user, ts, event_id) and
    collapses its events into per-user PARTIAL SESSIONS — vectorized
    numpy segment math, one output row per partial; (2) the only
    shuffle moves those partials (bounded by sessions + block
    boundaries, NOT events) into a per-user interval merge: sorted by
    start, a partial starts a new session iff its start is more than
    ``gap_seconds`` past the running max end.  Gap-closure is
    partition-invariant (interval endpoints are real events), so the
    result is exactly the global single-pass sessionization — a hot
    user with 10^8 events reduces to ~sessions+blocks rows before any
    grouping.  Property-tested equal to the naive per-user pass."""
    import numpy as np

    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts"])
    gap_us = gap_seconds * 1_000_000

    def block_partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "start_ts": pa.array([], pa.int64()),
                    "end_ts": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "first_event": pa.array([], pa.int64()),
                }
            )
        user = t.column("user_id").to_numpy(zero_copy_only=False)
        # normalize to µs first: a raw int64 cast inherits the column's
        # stored unit (ns for pandas-written parquet, us for the sf data)
        ts = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, user))
        user, ts, eid = user[order], ts[order], eid[order]
        new_seg = np.empty(len(ts), dtype=bool)
        new_seg[0] = True
        new_seg[1:] = (user[1:] != user[:-1]) | (ts[1:] - ts[:-1] > gap_us)
        starts = np.flatnonzero(new_seg)
        ends = np.concatenate([starts[1:], [len(ts)]]) - 1
        return pa.table(
            {
                "user_id": pa.array(user[starts], pa.int64()),
                "start_ts": pa.array(ts[starts], pa.int64()),
                "end_ts": pa.array(ts[ends], pa.int64()),
                "n_events": pa.array(ends - starts + 1, pa.int64()),
                "first_event": pa.array(np.minimum.reduceat(eid, starts), pa.int64()),
            }
        )

    from ..stages.joins import default_join_partitions
    from ..stages.partition import part_column

    n_parts = default_join_partitions()

    def merge_part(g: pa.Table) -> pa.Table:
        # ONE call per coarse user-hash partition; the per-user work
        # operates on PARTIALS (~sessions + touched blocks per user),
        # so the inner loop is tiny even for a 10^8-event hot user
        user = g.column("user_id").to_numpy(zero_copy_only=False)
        start = g.column("start_ts").to_numpy(zero_copy_only=False)
        end = g.column("end_ts").to_numpy(zero_copy_only=False)
        n_ev = g.column("n_events").to_numpy(zero_copy_only=False)
        first = g.column("first_event").to_numpy(zero_copy_only=False)
        order = np.lexsort((first, end, start, user))
        user, start, end = user[order], start[order], end[order]
        n_ev, first = n_ev[order], first[order]
        u_new = np.empty(len(user), dtype=bool)
        u_new[0] = True
        u_new[1:] = user[1:] != user[:-1]
        u_starts = np.flatnonzero(u_new)
        u_ends = np.concatenate([u_starts[1:], [len(user)]])
        out_user, out_sid, out_n, out_first = [], [], [], []
        for us, ue in zip(u_starts, u_ends):
            s, e2, nv, fv = start[us:ue], end[us:ue], n_ev[us:ue], first[us:ue]
            sid = np.zeros(len(s), dtype=np.int64)
            if len(s) > 1:
                run_end = np.maximum.accumulate(e2)[:-1]
                sid[1:] = np.cumsum(s[1:] - run_end > gap_us)
            seg = np.flatnonzero(np.concatenate([[True], sid[1:] != sid[:-1]]))
            out_user.append(np.full(len(seg), user[us], dtype=np.int64))
            out_sid.append(sid[seg])
            out_n.append(np.add.reduceat(nv, seg))
            out_first.append(np.minimum.reduceat(fv, seg))
        return pa.table(
            {
                "user_id": pa.array(np.concatenate(out_user), pa.int64()),
                "session_id": pa.array(np.concatenate(out_sid), pa.int64()),
                "n_events": pa.array(np.concatenate(out_n), pa.int64()),
                "first_event": pa.array(np.concatenate(out_first), pa.int64()),
            }
        )

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, ["user_id"], n_parts))

    return (
        ev.map_batches(block_partials, batch_format="pyarrow", batch_size=None)
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(merge_part, batch_format="pyarrow")
    )


# --- documents: content fingerprints --------------------------------------

def o19_funnel(sf_dir: str) -> pa.Table:
    """Ordered funnel (view -> click -> purchase): users whose first
    view precedes a later click precedes a later purchase.  The SQL
    plan is three correlated min-joins; the Ray plan is ONE user-hash
    shuffle and a vectorized per-partition cascade — three masked
    ``np.minimum.reduceat`` sweeps per user segment (no per-user
    Python), then a 3-number partial per partition summed by a single
    tiny aggregate.  Counts only: no float-rounding surface."""
    from ray.data.aggregate import Sum

    from ..stages.joins import default_join_partitions
    from ..stages.partition import part_column, sorted_segments

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    n_parts = default_join_partitions()

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, ["user_id"], n_parts))

    INF = np.iinfo(np.int64).max

    def funnel_part(g: pa.Table) -> pa.Table:
        t, starts, _ends = sorted_segments(
            g.drop_columns("__part"), ["user_id"], extra_sort=[("ts", "ascending")]
        )
        n = t.num_rows
        if n == 0:
            return pa.table(
                {
                    "n_view": pa.array([0], pa.int64()),
                    "n_view_click": pa.array([0], pa.int64()),
                    "n_full_funnel": pa.array([0], pa.int64()),
                }
            )
        ts = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        typ = np.asarray(t.column("event_type").to_pylist())
        seg_flag = np.zeros(n, dtype=np.int64)
        seg_flag[starts] = 1
        seg_id = np.cumsum(seg_flag) - 1

        def stage_min(mask: np.ndarray) -> np.ndarray:
            vals = np.where(mask, ts, INF)
            return np.minimum.reduceat(vals, starts)

        t1 = stage_min(typ == "view")
        t2 = stage_min((typ == "click") & (ts > t1[seg_id]))
        t3 = stage_min((typ == "purchase") & (ts > t2[seg_id]))
        return pa.table(
            {
                "n_view": pa.array([int((t1 < INF).sum())], pa.int64()),
                "n_view_click": pa.array([int((t2 < INF).sum())], pa.int64()),
                "n_full_funnel": pa.array([int((t3 < INF).sum())], pa.int64()),
            }
        )

    partials = (
        ev.map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(funnel_part, batch_format="pyarrow")
    )
    agg = partials.aggregate(
        Sum("n_view"), Sum("n_view_click"), Sum("n_full_funnel")
    )
    return pa.table(
        {
            "n_view": pa.array([agg["sum(n_view)"]], pa.int64()),
            "n_view_click": pa.array([agg["sum(n_view_click)"]], pa.int64()),
            "n_full_funnel": pa.array([agg["sum(n_full_funnel)"]], pa.int64()),
        }
    )


def o18_retention(sf_dir: str) -> rd.Dataset:
    """Weekly cohort retention: per epoch-anchored 7-day bucket, how
    many users are active in it AND the next bucket.  The self-join a
    SQL plan would run collapses to ONE user-hash shuffle: per
    partition, distinct (user, week) pairs sort into user segments and
    consecutive-week detection is a vectorized diff; the per-week
    counts then pre-combine per partition before a tiny groupby(week)
    sum.  Week ids are integer epoch//604800 on BOTH sides (no
    engine-specific week-start semantics to diverge on)."""
    from ..stages.joins import default_join_partitions
    from ..stages.partition import part_column

    ev = _read(sf_dir, "events", ["user_id", "ts"])
    n_parts = default_join_partitions()
    week_us = 604_800 * 1_000_000

    def to_weeks(t: pa.Table) -> pa.Table:
        ts = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64())
        wk = pc.divide(ts, week_us)  # int64 floor for positive epochs
        out = pa.table({"user_id": t.column("user_id"), "wk": wk})
        # per-block dedup so the shuffle moves distinct pairs per block
        out = out.group_by(["user_id", "wk"]).aggregate([])
        return out.append_column(
            "__part", part_column(out, ["user_id"], n_parts)
        )

    def consec(g: pa.Table) -> pa.Table:
        from ..stages.partition import sorted_segments

        t, starts, _ends = sorted_segments(
            g.drop_columns("__part"), ["user_id"], extra_sort=[("wk", "ascending")]
        )
        users = t.column("user_id").to_numpy(zero_copy_only=False)
        wk = t.column("wk").to_numpy(zero_copy_only=False)
        n = len(wk)
        if n == 0:
            return pa.table(
                {"wk": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        # distinct within partition too (cross-block duplicates)
        keep = np.ones(n, dtype=bool)
        keep[1:] = (users[1:] != users[:-1]) | (wk[1:] != wk[:-1])
        users, wk = users[keep], wk[keep]
        same_user = users[1:] == users[:-1]
        consecutive = same_user & (wk[1:] - wk[:-1] == 1)
        weeks, counts = np.unique(wk[:-1][consecutive], return_counts=True)
        return pa.table(
            {
                "wk": pa.array(weeks, pa.int64()),
                "n": pa.array(counts, pa.int64()),
            }
        )

    partials = (
        ev.map_batches(to_weeks, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(consec, batch_format="pyarrow")
    )
    return (
        partials.groupby("wk")
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns(["wk", "retained"]), batch_format="pyarrow"
        )
    )


def o21_dense_percent_rank(sf_dir: str) -> rd.Dataset:
    """DENSE_RANK + PERCENT_RANK per customer over order totals — the
    tie-aware window pair (row_number is o5).  Single custkey-hash
    shuffle; within each partition one vectorized sort, then dense rank
    = cumulative new-value flags per segment and percent_rank =
    (tie-aware rank - 1) / (n - 1), all segment arithmetic."""
    from ..stages.joins import default_join_partitions
    from ..stages.partition import part_column, sorted_segments

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    n_parts = default_join_partitions()

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, ["o_custkey"], n_parts))

    def ranks(g: pa.Table) -> pa.Table:
        t, starts, ends = sorted_segments(
            g.drop_columns("__part"),
            ["o_custkey"],
            extra_sort=[("o_totalprice", "ascending"), ("o_orderkey", "ascending")],
        )
        n = t.num_rows
        price = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        seg_first = np.zeros(n, dtype=bool)
        seg_first[starts] = True
        # new value within segment (price change OR segment start)
        new_val = np.empty(n, dtype=bool)
        if n:
            new_val[0] = True
            new_val[1:] = price[1:] != price[:-1]
        new_val |= seg_first
        seg_id = np.cumsum(seg_first) - 1
        seg_start = starts[seg_id]
        seg_len = (ends - starts)[seg_id]
        row_in_seg = np.arange(n, dtype=np.int64) - seg_start
        dense = np.cumsum(new_val)
        dense = dense - dense[seg_start] + 1
        # tie-aware rank: index of the first row of this value run
        run_start = np.maximum.accumulate(np.where(new_val, np.arange(n), 0))
        rank = run_start - seg_start + 1
        pct = np.where(seg_len > 1, (rank - 1) / np.maximum(seg_len - 1, 1), 0.0)
        return pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "o_orderkey": t.column("o_orderkey"),
                "dense_rank": pa.array(dense.astype(np.int64), pa.int64()),
                "pct_rank": pa.array(np.round(pct, 6), pa.float64()),
            }
        )

    return (
        orders.map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(ranks, batch_format="pyarrow")
    )


def o22_event_transitions(sf_dir: str) -> rd.Dataset:
    """Event-type transition counts (the LEAD window collapsed to a
    Markov edge list): per user in (ts, event_id) order, count each
    (event_type -> next_event_type) pair corpus-wide.  One user-hash
    shuffle; per partition a vectorized sort + shift within user
    segments, then per-partition pair partials into a 25-key groupby."""
    from ..stages.joins import default_join_partitions
    from ..stages.partition import part_column, sorted_segments

    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])
    n_parts = default_join_partitions()

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, ["user_id"], n_parts))

    def pairs(g: pa.Table) -> pa.Table:
        import pandas as pd

        t, starts, _ends = sorted_segments(
            g.drop_columns("__part"),
            ["user_id"],
            extra_sort=[("ts", "ascending"), ("event_id", "ascending")],
        )
        n = t.num_rows
        if n == 0:
            return pa.table(
                {
                    "from_type": pa.array([], pa.string()),
                    "to_type": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        is_start = np.zeros(n, dtype=bool)
        is_start[starts] = True
        # row i pairs with i+1 unless i+1 starts a new user
        keep = np.ones(n - 1, dtype=bool) & ~is_start[1:]
        df = pd.DataFrame(
            {"from_type": et[:-1][keep], "to_type": et[1:][keep], "n": 1}
        )
        gdf = df.groupby(["from_type", "to_type"], as_index=False).sum()
        return pa.table(
            {
                "from_type": pa.array(gdf.from_type, pa.string()),
                "to_type": pa.array(gdf.to_type, pa.string()),
                "n": pa.array(gdf.n, pa.int64()),
            }
        )

    return (
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(pairs, batch_format="pyarrow")
        .groupby(["from_type", "to_type"])
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns(["from_type", "to_type", "n"]),
            batch_format="pyarrow",
        )
    )


def session_intervals(sf_dir: str, gap_seconds: int = 1800) -> rd.Dataset:
    """Per-user session INTERVALS (user_id, session_id, start_ts,
    end_ts as int64 µs) — the sessionize two-level shape (block
    partials -> per-user interval merge, relational.sessionize) but
    emitting endpoints instead of counts.  Feeds the generic interval
    join; gap closure is partition-invariant for the same reason
    sessionize's is (endpoints are real events)."""
    ev = _read(sf_dir, "events", ["user_id", "ts"])
    gap_us = gap_seconds * 1_000_000

    def block_partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "start_ts": pa.array([], pa.int64()),
                    "end_ts": pa.array([], pa.int64()),
                }
            )
        user = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        order = np.lexsort((ts, user))
        user, ts = user[order], ts[order]
        new_seg = np.empty(len(ts), dtype=bool)
        new_seg[0] = True
        new_seg[1:] = (user[1:] != user[:-1]) | (ts[1:] - ts[:-1] > gap_us)
        starts = np.flatnonzero(new_seg)
        ends = np.concatenate([starts[1:], [len(ts)]]) - 1
        return pa.table(
            {
                "user_id": pa.array(user[starts], pa.int64()),
                "start_ts": pa.array(ts[starts], pa.int64()),
                "end_ts": pa.array(ts[ends], pa.int64()),
            }
        )

    from ..stages.joins import default_join_partitions
    from ..stages.partition import part_column

    n_parts = default_join_partitions()

    def merge_part(g: pa.Table) -> pa.Table:
        user = g.column("user_id").to_numpy(zero_copy_only=False)
        start = g.column("start_ts").to_numpy(zero_copy_only=False)
        end = g.column("end_ts").to_numpy(zero_copy_only=False)
        order = np.lexsort((end, start, user))
        user, start, end = user[order], start[order], end[order]
        u_new = np.empty(len(user), dtype=bool)
        u_new[0] = True
        u_new[1:] = user[1:] != user[:-1]
        u_starts = np.flatnonzero(u_new)
        u_ends = np.concatenate([u_starts[1:], [len(user)]])
        out = {"user_id": [], "session_id": [], "start_ts": [], "end_ts": []}
        for us, ue in zip(u_starts, u_ends):  # per USER over PARTIALS, not events
            s, e2 = start[us:ue], end[us:ue]
            ses = np.zeros(len(s), dtype=np.int64)
            if len(s) > 1:
                rmax = np.maximum.accumulate(e2)[:-1]
                ses[1:] = np.cumsum(s[1:] - rmax > gap_us)
            seg = np.flatnonzero(np.concatenate([[True], ses[1:] != ses[:-1]]))
            seg_end = np.concatenate([seg[1:], [len(s)]])
            out["user_id"].append(np.full(len(seg), user[us], dtype=np.int64))
            out["session_id"].append(ses[seg])
            out["start_ts"].append(s[seg])
            mx = np.maximum.accumulate(e2)
            out["end_ts"].append(mx[seg_end - 1])
        if not out["user_id"]:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "session_id": pa.array([], pa.int64()),
                    "start_ts": pa.array([], pa.int64()),
                    "end_ts": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "user_id": pa.array(np.concatenate(out["user_id"]), pa.int64()),
                "session_id": pa.array(np.concatenate(out["session_id"]), pa.int64()),
                "start_ts": pa.array(np.concatenate(out["start_ts"]), pa.int64()),
                "end_ts": pa.array(np.concatenate(out["end_ts"]), pa.int64()),
            }
        )

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, ["user_id"], n_parts))

    return (
        ev.map_batches(block_partials, batch_format="pyarrow", batch_size=None)
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(
            lambda g: merge_part(g.drop_columns("__part")), batch_format="pyarrow"
        )
    )


def o23_ntile_cume(sf_dir: str, k: int = 4) -> rd.Dataset:
    """NTILE(k) + CUME_DIST per customer over order totals — the
    remaining tie-aware window pair (o21 covers dense/percent rank).
    NTILE follows SQL's first-(n%k)-tiles-get-the-extra-row rule over
    the (o_totalprice, o_orderkey) order; CUME_DIST is tie-aware
    ((# rows <= current value) / n) via value-run ends.  One
    custkey-hash shuffle, all segment arithmetic."""
    from ..stages.joins import default_join_partitions
    from ..stages.partition import part_column, sorted_segments

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    n_parts = default_join_partitions()

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, ["o_custkey"], n_parts))

    def win(g: pa.Table) -> pa.Table:
        t, starts, ends = sorted_segments(
            g.drop_columns("__part"),
            ["o_custkey"],
            extra_sort=[("o_totalprice", "ascending"), ("o_orderkey", "ascending")],
        )
        n = t.num_rows
        price = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        seg_first = np.zeros(n, dtype=bool)
        seg_first[starts] = True
        seg_id = np.cumsum(seg_first) - 1
        seg_start = starts[seg_id]
        seg_len = (ends - starts)[seg_id]
        r = np.arange(n, dtype=np.int64) - seg_start  # 0-based row in segment
        # NTILE: first (n % k) tiles get n//k + 1 rows
        base = seg_len // k
        extra = seg_len % k
        cut = extra * (base + 1)
        tile = np.where(
            r < cut,
            r // np.maximum(base + 1, 1),
            extra + (r - cut) // np.maximum(base, 1),
        ) + 1
        # CUME_DIST: tie-aware value-run END within segment
        new_val = np.empty(n, dtype=bool)
        if n:
            new_val[0] = True
            new_val[1:] = price[1:] != price[:-1]
        new_val |= seg_first
        run_starts_idx = np.flatnonzero(new_val)
        run_bounds = np.concatenate([run_starts_idx[1:], [n]])
        run_id = np.cumsum(new_val) - 1
        run_end = np.minimum(run_bounds[run_id], seg_start + seg_len)
        cume = (run_end - seg_start) / seg_len
        return pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "o_orderkey": t.column("o_orderkey"),
                "tile": pa.array(tile.astype(np.int64), pa.int64()),
                "cume": pa.array(np.round(cume, 6), pa.float64()),
            }
        )

    return (
        orders.map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(win, batch_format="pyarrow")
    )


def o26_throttle_dedup(sf_dir: str, window_s: int = 48 * 3600) -> rd.Dataset:
    """Streaming throttle / rate-limit dedup: keep an event iff the
    PREVIOUS raw event of the same (user, event_type) is more than
    ``window_s`` older (or absent) — the alerting/notification
    suppression primitive.  LAG semantics against the raw stream, so
    it is one user-hash shuffle + per-partition lexsort + vectorized
    timestamp diff (the o6 shape; gap closure is per-key, no stitch
    needed because the key partitioning is total).  Oracle: LAG OVER
    (PARTITION BY user, type ORDER BY ts, event_id)."""
    from ..stages.joins import default_join_partitions
    from ..stages.partition import part_column

    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])
    n_parts = default_join_partitions()

    def norm(t: pa.Table) -> pa.Table:
        t = t.set_column(
            t.schema.get_field_index("ts"),
            "ts",
            t.column("ts").cast(pa.timestamp("us")),
        )
        return t.append_column(
            "__part", part_column(t, ["user_id", "event_type"], n_parts)
        )

    def keep_first_outside_window(g: pa.Table) -> pa.Table:
        g = g.drop_columns("__part")
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        et = np.asarray(g.column("event_type").to_pylist(), dtype=object)
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        # deterministic LAG order: (user, type, ts, event_id)
        order = np.lexsort((eid, ts, et, uid))
        uid_s, et_s, ts_s, eid_s = uid[order], et[order], ts[order], eid[order]
        n = len(uid_s)
        new_key = np.concatenate(
            [[True], (uid_s[1:] != uid_s[:-1]) | (et_s[1:] != et_s[:-1])]
        )
        gap = np.empty(n, dtype=np.int64)
        gap[0] = 0
        gap[1:] = ts_s[1:] - ts_s[:-1]
        keep_sorted = new_key | (gap > window_s * 1_000_000)
        keep = np.zeros(n, dtype=bool)
        keep[order] = keep_sorted
        kept = g.filter(pa.array(keep))
        return pa.table(
            {
                "event_id": kept.column("event_id").cast(pa.int64()),
                "user_id": kept.column("user_id").cast(pa.int64()),
                "event_type": kept.column("event_type"),
            }
        )

    return (
        ev.map_batches(norm, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(keep_first_outside_window, batch_format="pyarrow")
    )


def o28_keep_latest_n(sf_dir: str, n: int = 3) -> rd.Dataset:
    """Retention trim: keep only the latest ``n`` events per
    (user, event_type) — the bounded-history dedup every event store
    applies.  One key-hash shuffle, per-partition lexsort, vectorized
    within-segment rank (no per-group Python): rows ranked newest-first
    by (ts, event_id) survive while rank < n.  Oracle: row_number()
    OVER (PARTITION ... ORDER BY ts DESC, event_id DESC) <= n."""
    from ..stages.joins import default_join_partitions
    from ..stages.partition import part_column

    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])
    n_parts = default_join_partitions()

    def norm(t: pa.Table) -> pa.Table:
        t = t.set_column(
            t.schema.get_field_index("ts"),
            "ts",
            t.column("ts").cast(pa.timestamp("us")),
        )
        return t.append_column(
            "__part", part_column(t, ["user_id", "event_type"], n_parts)
        )

    def latest_n(g: pa.Table) -> pa.Table:
        g = g.drop_columns("__part")
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        et = np.asarray(g.column("event_type").to_pylist(), dtype=object)
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((-eid, -ts, et, uid))  # newest first per key
        uid_s, et_s = uid[order], et[order]
        m = len(uid_s)
        new_key = np.concatenate(
            [[True], (uid_s[1:] != uid_s[:-1]) | (et_s[1:] != et_s[:-1])]
        )
        seg = np.cumsum(new_key) - 1
        starts = np.flatnonzero(new_key)
        rank = np.arange(m, dtype=np.int64) - starts[seg]
        keep = np.zeros(m, dtype=bool)
        keep[order] = rank < n
        kept = g.filter(pa.array(keep))
        return pa.table(
            {
                "event_id": kept.column("event_id").cast(pa.int64()),
                "user_id": kept.column("user_id").cast(pa.int64()),
                "event_type": kept.column("event_type"),
            }
        )

    return (
        ev.map_batches(norm, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(latest_n, batch_format="pyarrow")
    )


def o29_gapfill_daily(sf_dir: str) -> rd.Dataset:
    """Per-user daily resample with zero-fill — the gap-fill /
    ``resample`` primitive time-series feature pipelines need (missing
    days must materialize as 0, not be absent).  ONE user-hash shuffle:
    the per-block (user, day) count partials ride a coarse
    ``__part`` column into ``map_groups``, where each partition
    finishes the (user, day) reduce AND expands every user's
    [min_day, max_day] span vectorized (np.repeat spans, cumulative
    offsets — no per-user Python loop).  Expansion-sized output ->
    ``expansion_partitions`` coarse parts, per CLAUDE.md."""
    from ..stages.partition import expansion_partitions, part_column

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def day_partial(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        day = pc.floor(pc.divide(us.cast(pa.float64()), 86400e6)).cast(pa.int64())
        tt = pa.table({"user_id": t.column("user_id"), "day": day})
        g = tt.group_by(["user_id", "day"]).aggregate([([], "count_all")])
        return g.rename_columns(["user_id", "day", "n"])

    n_parts = expansion_partitions()

    def tag_part(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, ["user_id"], n_parts))

    partials = ev.map_batches(
        day_partial, batch_format="pyarrow", batch_size=None
    ).map_batches(tag_part, batch_format="pyarrow", batch_size=None)

    def expand(g: pa.Table) -> pa.Table:
        g = g.group_by(["user_id", "day"]).aggregate([("n", "sum")])
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        day = g.column("day").to_numpy(zero_copy_only=False)
        n = g.column("n_sum").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((day, uid))
        uid, day, n = uid[order], day[order], n[order]
        # per-user span bounds via boundary indices
        new = np.empty(len(uid), dtype=bool)
        if len(uid):
            new[0] = True
            new[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(uid)]
        lo = day[starts]
        hi = day[ends - 1]
        spans = (hi - lo + 1).astype(np.int64)
        out_uid = np.repeat(uid[starts], spans)
        # each user's days: lo .. hi
        offs = np.concatenate([[0], np.cumsum(spans)])
        idx = np.arange(offs[-1], dtype=np.int64) - np.repeat(offs[:-1], spans)
        out_day = np.repeat(lo, spans) + idx
        # scatter observed counts into the dense grid
        out_n = np.zeros(offs[-1], dtype=np.int64)
        dense_pos = np.repeat(offs[:-1], np.diff(np.r_[starts, len(uid)])) + (
            day - np.repeat(lo, np.diff(np.r_[starts, len(uid)]))
        )
        out_n[dense_pos] = n
        day_str = (
            out_day.astype("datetime64[D]").astype("datetime64[s]")
            .astype("datetime64[D]").astype(str)
        )
        return pa.table(
            {
                "user_id": pa.array(out_uid, pa.int64()),
                "day": pa.array(day_str, pa.string()),
                "n_events": pa.array(out_n, pa.int64()),
            }
        )

    return partials.groupby("__part").map_groups(
        expand, batch_format="pyarrow", num_cpus=1
    )


def cohort_matrix(sf_dir: str) -> rd.Dataset:
    """Cohort retention matrix — (signup-week cohort x week offset ->
    distinct active users), the table behind every retention heat map.
    ONE user-hash coarse shuffle: inside each partition every user's
    rows are complete, so first-week (cohort) assignment, the
    (user, cohort, offset) dedupe, and the per-(cohort, offset)
    distinct-user partial all happen locally; the global combine is a
    tiny groupby sum over <= parts x weeks^2 rows.  Week = epoch
    seconds floored // 604800 (the o18 convention)."""
    from ..stages.partition import expansion_partitions, part_column

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def wk_partial(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        wk = pc.divide(pc.divide(us, 1_000_000), 604_800)
        tt = pa.table({"user_id": t.column("user_id"), "wk": wk})
        # per-block (user, wk) dedupe shrinks the shuffle
        return tt.group_by(["user_id", "wk"]).aggregate([])

    n_parts = expansion_partitions()

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, ["user_id"], n_parts))

    partials = ev.map_batches(
        wk_partial, batch_format="pyarrow", batch_size=None
    ).map_batches(tag, batch_format="pyarrow", batch_size=None)

    def per_part(g: pa.Table) -> pa.Table:
        g = g.group_by(["user_id", "wk"]).aggregate([])
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        wk = g.column("wk").to_numpy(zero_copy_only=False)
        order = np.lexsort((wk, uid))
        uid, wk = uid[order], wk[order]
        new = np.empty(len(uid), dtype=bool)
        if len(uid):
            new[0] = True
            new[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(new)
        runs = np.diff(np.r_[starts, len(uid)])
        cohort = np.repeat(wk[starts], runs)  # sorted -> first wk = min
        off = wk - cohort
        tt = pa.table(
            {
                "cohort_wk": pa.array(cohort, pa.int64()),
                "wk_offset": pa.array(off, pa.int64()),
            }
        )
        cg = tt.group_by(["cohort_wk", "wk_offset"]).aggregate([([], "count_all")])
        return cg.rename_columns(["cohort_wk", "wk_offset", "n"])

    return (
        partials.groupby("__part")
        .map_groups(per_part, batch_format="pyarrow", num_cpus=1)
        .groupby(["cohort_wk", "wk_offset"])
        .aggregate(Sum("n", alias_name="n_users"))
    )


def o30_rolling_anomaly(sf_dir: str) -> rd.Dataset:
    """Rolling z-score anomaly detection — the streaming-ops primitive
    that flags a value far outside its trailing BASELINE (|z| > 2
    against the mean/sample-stddev of the 5 PRECEDING events per user,
    current row excluded — including it bounds |z| at (n-1)/sqrt(n) and
    nothing can ever fire).  ONE user-hash coarse shuffle; inside each
    partition the per-user segments are lexsorted once and the rolling
    mean/variance come from cumulative-sum differences (allocation-free,
    no per-row Python).  Rows with fewer than 5 preceding events are
    skipped (their stddev is noise)."""
    from ..stages.partition import expansion_partitions, part_column

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    win = 5

    n_parts = expansion_partitions()

    def tag(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        t = t.set_column(t.schema.get_field_index("ts"), "ts", us)
        return t.append_column("__part", part_column(t, ["user_id"], n_parts))

    def detect(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        tsv = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        val = g.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.lexsort((eid, tsv, uid))
        uid, eid, val = uid[order], eid[order], val[order]
        n = len(uid)
        if n == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()),
                 "event_id": pa.array([], pa.int64()),
                 "z": pa.array([], pa.float64())}
            )
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(new)
        runs = np.diff(np.r_[starts, n])
        rn = np.arange(n, dtype=np.int64) - np.repeat(starts, runs) + 1
        c = np.concatenate([[0.0], np.cumsum(val)])
        c2 = np.concatenate([[0.0], np.cumsum(val * val)])
        # trailing window of `win` rows ending at i-1, only valid where
        # rn >= win+1 (so the window never crosses a user boundary)
        idx = np.arange(1, n + 1)
        hi = idx - 1  # window is the `win` rows strictly BEFORE i
        lo = hi - win
        ok = rn >= win + 1
        lo_ok = np.where(ok, lo, 0)
        hi_ok = np.where(ok, hi, 0)
        s1 = c[hi_ok] - c[lo_ok]
        s2 = c2[hi_ok] - c2[lo_ok]
        m = s1 / win
        var = (s2 - win * m * m) / (win - 1)
        var = np.maximum(var, 0.0)
        s = np.sqrt(var)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = (val - m) / s
        keep = ok & (s > 0) & (np.abs(z) > 2)
        return pa.table(
            {
                "user_id": pa.array(uid[keep], pa.int64()),
                "event_id": pa.array(eid[keep], pa.int64()),
                "z": pa.array(np.round(z[keep], 4), pa.float64()),
            }
        )

    return (
        ev.map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(detect, batch_format="pyarrow", num_cpus=1)
    )



def event_transitions(sf_dir: str) -> rd.Dataset:
    """Markov transition counts over per-user event sequences: order
    each user's events by (ts, event_id), count adjacent
    (from_type, to_type) pairs — the sequence-mining primitive behind
    next-action models and behavioral QA.  One user-hash shuffle
    (whole users co-locate in their partition group; adjacency decided
    by one vectorized lexsort per group), then a tiny native groupby —
    transition keys are |event_type|^2, never pair-shaped."""
    from ..stages.partition import part_column
    from ..stages.webtext import _default_span_parts

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    n_parts = _default_span_parts()

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, ["user_id"], n_parts))

    def transitions(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = pc.cast(pc.cast(g.column("ts"), pa.timestamp("us")), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        et = g.column("event_type").take(pa.array(order)).combine_chunks()
        uid = uid[order]
        adj = pa.array(uid[:-1] == uid[1:])
        n = len(et)
        pairs = pa.table(
            {
                "from_type": et.slice(0, n - 1),
                "to_type": et.slice(1, n - 1),
            }
        ).filter(adj)
        c = pairs.group_by(["from_type", "to_type"]).aggregate([("to_type", "count")])
        return pa.table(
            {
                "from_type": c.column("from_type"),
                "to_type": c.column("to_type"),
                "n": c.column("to_type_count").cast(pa.int64()),
            }
        )

    partials = (
        ev.map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(transitions, batch_format="pyarrow")
    )
    return (
        partials.groupby(["from_type", "to_type"])
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns(["from_type", "to_type", "n"]),
            batch_format="pyarrow",
        )
    )


def event_bursts(sf_dir: str, window_hours: int = 1, trail: int = 3) -> rd.Dataset:
    """Rate-burst detection per event type: hourly counts, and an hour
    is a BURST when its count more than doubles the mean of the
    previous ``trail`` observed hours (cross-multiplied integer
    comparison — ``trail * n > 2 * sum_trail`` — so the gate has no
    float edge).  Monitoring-shape op: the hourly rollup is a tiny
    (type x hour) aggregate; the trailing window runs per type inside
    one co-located group (event types are domain-sized)."""
    ev = _read(sf_dir, "events", ["ts", "event_type"])
    span = 3_600_000_000 * window_hours

    def hourly(t: pa.Table) -> pa.Table:
        h = pc.divide(
            pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()), span
        )
        g = (
            pa.table({"event_type": t.column("event_type"), "hour": h})
            .append_column("n", pa.array(np.ones(t.num_rows, np.int64)))
            .group_by(["event_type", "hour"])
            .aggregate([("n", "sum")])
        )
        return g.rename_columns(["event_type", "hour", "n"])

    counts = (
        ev.map_batches(hourly, batch_format="pyarrow", batch_size=None)
        .groupby(["event_type", "hour"])
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns(["event_type", "hour", "n"]),
            batch_format="pyarrow",
        )
    )

    def flag(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[("hour", "ascending")])
        g = g.take(idx)
        n = g.column("n").to_numpy(zero_copy_only=False)
        burst = np.zeros(len(n), dtype=np.int64)
        for i in range(len(n)):
            lo = max(0, i - trail)
            if i - lo == trail:  # full trailing window observed
                s = int(n[lo:i].sum())
                burst[i] = int(trail * int(n[i]) > 2 * s)
        return g.append_column("burst", pa.array(burst, pa.int64()))

    return counts.groupby("event_type").map_groups(flag, batch_format="pyarrow")

# --- per-window exact distinct users --------------------------------------

def window_distinct_users(sf_dir: str) -> rd.Dataset:
    """Exact distinct users + event totals per 1-hour tumbling window —
    the streaming cardinality companion of window_tumbling (the KMV/HLL
    sketches are the approximate path; this is the exact two-level
    reduce).  Level 1: block-local distinct (window, user) partials
    with per-pair event counts; level 2: one (window, user) groupby
    collapses cross-block repeats; level 3: a window-keyed groupby
    counts survivors — the distinct count never materializes a user
    set, windows×users rows are the ceiling through both exchanges."""
    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        epoch = pc.divide(
            pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()), 1_000_000
        )
        win = pc.cast(
            pc.floor(pc.divide(pc.cast(epoch, pa.float64()), 3600.0)), pa.int64()
        )
        t2 = pa.table({"window_id": win, "user_id": t.column("user_id")})
        agg = t2.group_by(["window_id", "user_id"]).aggregate([([], "count_all")])
        return agg.rename_columns(["window_id", "user_id", "pn"])

    pairs = (
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["window_id", "user_id"])
        .aggregate(Sum("pn", alias_name="n"))
    )

    def per_user_row(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_id": t.column("window_id").cast(pa.int64()),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "n": t.column("n").cast(pa.int64()),
            }
        )

    import numpy as np

    out = (
        pairs.map_batches(per_user_row, batch_format="pyarrow", batch_size=None)
        .groupby("window_id")
        .aggregate(
            Sum("one", alias_name="n_users"), Sum("n", alias_name="n_events")
        )
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "window_id": t.column("window_id").cast(pa.int64()),
                "n_users": t.column("n_users").cast(pa.int64()),
                "n_events": t.column("n_events").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
