"""Range and interval joins.

Two join shapes Ray Data has no native operator for, both expressed
without an all-to-all theta join:

- ``broadcast_range_join``: fact value -> containing band of a SMALL
  sorted band table (price tiers, size buckets, date ranges).  The
  band edges are broadcast once (``ray.put``) and each batch assigns
  bands with one ``np.searchsorted`` — zero shuffle, the canonical
  scale shape for dimension-band lookups (the alternative, a theta
  join, ships the fact table).

- ``interval_join``: event timestamp -> containing interval of a
  per-key interval table (sessions, maintenance windows, validity
  ranges).  One key-hash shuffle co-locates each key's events and
  intervals; per partition both sides sort once and every event binds
  to the interval whose start is the rightmost start <= ts (vectorized
  searchsorted), kept only when ts <= that interval's end.  Assumes
  intervals are NON-OVERLAPPING per key (true for sessions by
  construction) — documented, and overlapping inputs are detectable
  cheaply (start[i+1] < end[i]) with ``validate=True``.

No reference counterpart (REDEN has no temporal joins); this is the
training-data-pipeline extension surface (event attribution, session
stitching, validity-window joins).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


def broadcast_range_join(
    ds: rd.Dataset,
    value_col: str,
    edges: np.ndarray,
    labels: list,
    label_col: str = "band",
    right: bool = False,
) -> rd.Dataset:
    """Assign each row the band whose half-open range contains
    ``value_col``.  ``edges`` are the ``len(labels)+1`` sorted band
    boundaries; values outside ``[edges[0], edges[-1])`` get null.

    The band table is driver-side small BY CONTRACT (it is a literal
    dimension); it rides to every task via ``ray.put`` once.
    """
    edges = np.asarray(edges, dtype=np.float64)
    if len(labels) != len(edges) - 1:
        raise ValueError("need len(labels) == len(edges) - 1")
    bands_ref = ray.put((edges, list(labels)))

    def assign(t: pa.Table) -> pa.Table:
        ed, lb = ray.get(bands_ref)
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        idx = np.searchsorted(ed, v, side="right" if not right else "left") - 1
        ok = (idx >= 0) & (idx < len(lb)) & (v >= ed[0]) & (v < ed[-1])
        vals = [lb[i] if o else None for i, o in zip(idx, ok)]
        return t.append_column(label_col, pa.array(vals))

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=None)


def interval_join(
    events: rd.Dataset,
    intervals: rd.Dataset,
    key: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    interval_cols: list[str],
    n_partitions: int | None = None,
    validate: bool = False,
) -> rd.Dataset:
    """Inner-join each event to the interval (same ``key``) containing
    its timestamp: ``start <= ts <= end``.  Intervals must be
    non-overlapping per key.

    Shape: tag BOTH sides with ``blake2(key) % P``, union them with a
    side marker, ONE hash shuffle, then per partition a single sort +
    searchsorted binds events to intervals.  Events outside every
    interval are dropped (inner semantics).
    """
    from .joins import default_join_partitions
    from .partition import part_column

    n_parts = n_partitions or default_join_partitions()
    ev_cols = [c for c in events.schema().names]

    def tag(side_is_event: bool):
        def f(t: pa.Table) -> pa.Table:
            out = t.append_column("__part", part_column(t, [key], n_parts))
            return out.append_column(
                "__is_event", pa.array(np.full(t.num_rows, side_is_event), pa.bool_())
            )

        return f

    # union with aligned schemas: each side carries its own columns,
    # nulls for the other side's
    def widen(cols_here: list[str], all_cols: list[str], schema_map: dict):
        def f(t: pa.Table) -> pa.Table:
            arrays, names = [], []
            for c in all_cols:
                names.append(c)
                if c in cols_here:
                    arrays.append(t.column(c))
                else:
                    arrays.append(pa.nulls(t.num_rows, schema_map[c]))
            return pa.table(dict(zip(names, arrays)))

        return f

    iv_cols = [key, start_col, end_col] + [
        c for c in interval_cols if c not in (key, start_col, end_col)
    ]
    ev_schema = events.schema()
    iv_schema = intervals.schema()
    schema_map = {}
    for c in ev_cols:
        schema_map[c] = ev_schema.base_schema.field(c).type
    for c in iv_cols:
        if c not in schema_map:
            schema_map[c] = iv_schema.base_schema.field(c).type
    all_cols = list(dict.fromkeys(ev_cols + iv_cols))

    ev_w = events.map_batches(
        widen(ev_cols, all_cols, schema_map), batch_format="pyarrow", batch_size=None
    ).map_batches(tag(True), batch_format="pyarrow", batch_size=None)
    iv_w = intervals.map_batches(
        widen(iv_cols, all_cols, schema_map), batch_format="pyarrow", batch_size=None
    ).map_batches(tag(False), batch_format="pyarrow", batch_size=None)

    out_cols = ev_cols + [c for c in iv_cols if c != key]

    def bind(g: pa.Table) -> pa.Table:
        g = g.drop_columns("__part")
        is_ev = g.column("__is_event").to_numpy(zero_copy_only=False)
        ev = g.filter(pa.array(is_ev)).select(ev_cols)
        iv = g.filter(pa.array(~is_ev)).select(iv_cols)
        if ev.num_rows == 0 or iv.num_rows == 0:
            return pa.table({c: pa.nulls(0, schema_map[c]) for c in out_cols})
        iv = iv.sort_by([(key, "ascending"), (start_col, "ascending")])
        ev = ev.sort_by([(key, "ascending"), (ts_col, "ascending")])
        # numeric views (timestamps cast to int64 us upstream by caller)
        ik = iv.column(key).to_numpy(zero_copy_only=False)
        st = iv.column(start_col).to_numpy(zero_copy_only=False)
        en = iv.column(end_col).to_numpy(zero_copy_only=False)
        if validate and len(st) > 1:
            same = ik[1:] == ik[:-1]
            bad = np.nonzero(same & (st[1:] <= en[:-1]))[0]
            if len(bad):
                raise ValueError(
                    f"interval_join: overlapping intervals for key {ik[bad[0]]}"
                )
        ek = ev.column(key).to_numpy(zero_copy_only=False)
        ts = ev.column(ts_col).to_numpy(zero_copy_only=False)
        # Fully vectorized "rightmost interval start <= ts within key":
        # merge both sides into one (key, time) order (intervals win
        # time ties so an event AT a start sees it), forward-fill the
        # interval index with maximum.accumulate — interval indices are
        # globally ascending in (key, start) order, so the filled value
        # is the latest start seen; a fill that leaked across a key
        # boundary fails the key-equality check below.
        n_iv = len(st)
        m_time = np.concatenate([st, ts])
        m_key = np.concatenate([ik, ek])
        m_isev = np.concatenate(
            [np.zeros(n_iv, np.int8), np.ones(len(ts), np.int8)]
        )
        m_idx = np.concatenate(
            [np.arange(n_iv, dtype=np.int64), np.full(len(ts), -1, np.int64)]
        )
        order = np.lexsort((m_isev, m_time, m_key))
        filled = np.maximum.accumulate(m_idx[order])
        pos = np.empty(len(ts), dtype=np.int64)
        ev_mask = order >= n_iv
        pos[order[ev_mask] - n_iv] = filled[ev_mask]
        valid = pos >= 0
        safe = np.where(valid, pos, 0)
        valid &= (ik[safe] == ek) & (ts <= en[safe])
        keep = np.nonzero(valid)[0]
        ev_kept = ev.take(pa.array(keep, pa.int64()))
        iv_rows = iv.take(pa.array(pos[keep], pa.int64()))
        cols = {c: ev_kept.column(c) for c in ev_cols}
        for c in iv_cols:
            if c != key:
                cols[c] = iv_rows.column(c)
        return pa.table(cols)

    return (
        ev_w.union(iv_w)
        .groupby("__part")
        .map_groups(bind, batch_format="pyarrow")
    )


def overlap_join(
    left: rd.Dataset,
    right: rd.Dataset,
    band_width: int,
    left_bounds: tuple[str, str] = ("start", "end"),
    right_bounds: tuple[str, str] = ("start", "end"),
    num_partitions: int | None = None,
) -> rd.Dataset:
    """General interval-OVERLAP join (a.start <= b.end AND b.start <=
    a.end, closed bounds, int64 coordinates) — the third interval
    shape next to band containment and point-in-interval: both sides
    are interval SETS and any overlapping pair matches.

    Banding turns the theta join into ONE equi-join: each interval is
    replicated to every ``band_width``-sized bucket it touches
    (vectorized np.repeat — replication factor = interval span /
    band_width, so pick the band near the typical span), buckets
    equi-join, and the overlap predicate filters.  A pair overlapping
    several shared bands would duplicate, so each pair is claimed ONLY
    by the band containing max(a.start, b.start) — no distinct pass
    needed.  Column names must be disjoint across sides (rename first).
    """
    from .joins import default_join_partitions, staged_nonempty

    ls, le = left_bounds
    rs, re_ = right_bounds

    def explode(bounds: tuple[str, str]):
        s_col, e_col = bounds

        def fn(t: pa.Table) -> pa.Table:
            s = t.column(s_col).to_numpy(zero_copy_only=False).astype(np.int64)
            e = t.column(e_col).to_numpy(zero_copy_only=False).astype(np.int64)
            b0 = s // band_width
            b1 = e // band_width
            reps = (b1 - b0 + 1).astype(np.int64)
            idx = np.repeat(np.arange(len(s), dtype=np.int64), reps)
            # band id per replica: cumulative offset within each run
            off = np.arange(len(idx), dtype=np.int64) - np.repeat(
                np.concatenate([[0], np.cumsum(reps)[:-1]]), reps
            )
            band = np.repeat(b0, reps) + off
            out = t.take(pa.array(idx, pa.int64()))
            return out.append_column("__band", pa.array(band, pa.int64()))

        return fn

    lw = staged_nonempty(
        left.map_batches(
            explode((ls, le)), batch_format="pyarrow", batch_size=None
        ).materialize()
    )
    rw = staged_nonempty(
        right.map_batches(
            explode((rs, re_)), batch_format="pyarrow", batch_size=None
        ).materialize()
    )
    if lw is None or rw is None:
        # empty side -> empty overlap result with the joined schema
        lt = left.schema().base_schema.empty_table()
        rt = right.schema().base_schema.empty_table()
        both = lt
        for f in rt.schema:
            both = both.append_column(f.name, pa.nulls(0, f.type))
        return rd.from_arrow(both)
    joined = lw.join(
        rw,
        join_type="inner",
        on=("__band",),
        num_partitions=num_partitions or default_join_partitions(),
    )

    def keep_overlaps(t: pa.Table) -> pa.Table:
        a0 = t.column(ls).to_numpy(zero_copy_only=False).astype(np.int64)
        a1 = t.column(le).to_numpy(zero_copy_only=False).astype(np.int64)
        b0 = t.column(rs).to_numpy(zero_copy_only=False).astype(np.int64)
        b1 = t.column(re_).to_numpy(zero_copy_only=False).astype(np.int64)
        band = t.column("__band").to_numpy(zero_copy_only=False).astype(np.int64)
        overlap = (a0 <= b1) & (b0 <= a1)
        claimed = np.maximum(a0, b0) // band_width == band
        return t.filter(pa.array(overlap & claimed)).drop_columns("__band")

    return joined.map_batches(keep_overlaps, batch_format="pyarrow", batch_size=None)
