"""Driver-gated query families, continuation module 3 (round 4).

Same contract as ``relational.py`` / ``relational2.py`` (each function
takes ``sf_dir``, returns a Dataset whose columns match its
``oracle_sql()`` entry verbatim)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Sum

from . import relational as R

_read = R._read


# -------------------------------------------------------- percent of total


def a27_percent_of_total(sf_dir: str) -> rd.Dataset:
    """Share-of-total report (the ratio_to_report window): per-flag
    revenue and its share of the grand total — two-level aggregation in
    one scan, the grand total crossing to the driver as ONE scalar off
    the group-sized intermediate (never a second corpus pass)."""
    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_returnflag"]).aggregate([("l_extendedprice", "sum")])
        return g.rename_columns(["l_returnflag", "rev"])

    groups = (
        li.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("l_returnflag")
        .sum("rev")
        .map_batches(
            lambda t: t.rename_columns(["l_returnflag", "rev"]),
            batch_format="pyarrow",
            batch_size=None,
        )
        .materialize()  # group-sized; consumed twice (total + shares)
    )
    total = float(groups.sum("rev") or 0.0)

    def finish(t: pa.Table) -> pa.Table:
        rev = t.column("rev").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "revenue": pa.array(np.round(rev, 2), pa.float64()),
                "share": pa.array(np.round(rev / total, 6), pa.float64()),
            }
        )

    return groups.map_batches(finish, batch_format="pyarrow", batch_size=None)


# ------------------------------------------------- correlated-subquery


def a28_above_nation_avg(sf_dir: str) -> rd.Dataset:
    """Decorrelated 'above my group's average' query (the classic
    correlated-subquery pattern): customers whose average order value
    beats their NATION's average.  One fact scan: per-(cust, nation)
    sum/count partials; the nation averages derive from the SAME
    customer-level sums (sum-of-sums / sum-of-counts — identical
    rational to a direct per-nation avg) and broadcast back as a
    25-row map.

    ROUNDING LANDMINE, learned twice here: an average of cents-quantized
    prices lands EXACTLY on decimal halves (s/n with n = 2^a·5^b), so
    any rounded-average output or comparison diverges from DuckDB in
    both directions (reproduced at 2 dp: 364660.805 and 258168.425 —
    half-away on one side does NOT fix it because the two engines' sums
    straddle the half).  The avg comparison is therefore
    cross-multiplied — s*N > S*n, whose minimum TRUE gap (0.01 in cents
    space) exceeds float-summation noise by ~6 orders — and the output
    reports the cents-quantized SUM (2-dp rounding of a near-multiple
    of 0.01 has no half hazard), never the average."""
    from ..stages.joins import smart_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: t.rename_columns(["c_custkey", "o_totalprice"]),
        batch_format="pyarrow",
        batch_size=None,
    )
    joined = smart_join(orders, cust, on=["c_custkey"])
    per_cust = (
        joined.groupby(["c_custkey", "c_nationkey"])
        .aggregate(
            Sum("o_totalprice", alias_name="s"), Count(alias_name="n")
        )
        .materialize()  # customer-sized; feeds both nation rollup + filter
    )

    def nation_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["c_nationkey"]).aggregate([("s", "sum"), ("n", "sum")])
        return g.rename_columns(["c_nationkey", "S", "N"])

    nation = (
        per_cust.map_batches(nation_partial, batch_format="pyarrow", batch_size=None)
        .groupby("c_nationkey")
        .aggregate(Sum("S", alias_name="S"), Sum("N", alias_name="N"))
        .take_all()  # nation-domain-sized (25 rows) broadcast
    )
    nSN = {int(r["c_nationkey"]): (float(r["S"]), float(r["N"])) for r in nation}

    def finish(t: pa.Table) -> pa.Table:
        nk = t.column("c_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        s = t.column("s").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        S = np.array([nSN[k][0] for k in nk.tolist()])
        N = np.array([nSN[k][1] for k in nk.tolist()])
        keep = s * N > S * n
        return pa.table(
            {
                "custkey": pa.array(
                    t.column("c_custkey").to_numpy(zero_copy_only=False)[keep],
                    pa.int64(),
                ),
                "nationkey": pa.array(nk[keep], pa.int64()),
                "n_orders": pa.array(
                    n[keep].astype(np.int64), pa.int64()
                ),
                "sum_price": pa.array(np.round(s[keep], 2), pa.float64()),
            }
        )

    return per_cust.map_batches(finish, batch_format="pyarrow", batch_size=None)


# ------------------------------------------------------- association rules


def assoc_rules(sf_dir: str, min_support: int = 3) -> rd.Dataset:
    """Market-basket association rules over co-order parts: every
    directed rule ante -> cons with basket support >= ``min_support``,
    scored by confidence (c12 / c_ante) and lift (c12 * N / (c_ante *
    c_cons)).  Same scale shape as pmi_part_pairs: per-order pair
    expansion in a coarse key-hash map_groups, ONE pair-hash coarse
    reduce, item counts attached via cost-based smart_join; the row set
    is fixed by the INTEGER support filter."""
    from ..stages.joins import smart_join
    from ..stages.partition import expansion_partitions, part_column

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def distinct_op(t: pa.Table) -> pa.Table:
        return t.group_by(["l_orderkey", "l_partkey"]).aggregate([])

    op = (
        li.map_batches(distinct_op, batch_format="pyarrow", batch_size=None)
        .groupby(["l_orderkey", "l_partkey"])
        .count()
        .select_columns(["l_orderkey", "l_partkey"])
        .materialize()  # three consumers: N, item counts, pair expansion
    )
    n_orders = int(op.groupby("l_orderkey").count().count())
    items = op.groupby("l_partkey").count()  # part-sized (part, count())

    n_parts = expansion_partitions()

    def tag_order(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, ["l_orderkey"], n_parts))

    def expand(g: pa.Table) -> pa.Table:
        g = g.drop_columns("__part").sort_by(
            [("l_orderkey", "ascending"), ("l_partkey", "ascending")]
        )
        o = g.column("l_orderkey").to_numpy(zero_copy_only=False)
        p = g.column("l_partkey").to_numpy(zero_copy_only=False)
        n = len(o)
        empty = pa.table(
            {"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64()),
             "c12": pa.array([], pa.int64())}
        )
        if n == 0:
            return empty
        starts = np.flatnonzero(np.concatenate([[True], o[1:] != o[:-1]]))
        ends = np.concatenate([starts[1:], [n]])
        us, vs = [], []
        for st, en in zip(starts, ends):  # per ORDER (basket-size bounded)
            nb = p[st:en]
            if len(nb) > 1:
                iu, iv = np.triu_indices(len(nb), k=1)
                us.append(nb[iu])
                vs.append(nb[iv])
        if not us:
            return empty
        tt = pa.table(
            {"u": pa.array(np.concatenate(us), pa.int64()),
             "v": pa.array(np.concatenate(vs), pa.int64())}
        )
        cg = tt.group_by(["u", "v"]).aggregate([([], "count_all")])
        return cg.rename_columns(["u", "v", "c12"])

    def tag_pair(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, ["u", "v"], n_parts))

    def reduce_sym(g: pa.Table) -> pa.Table:
        g = g.drop_columns("__part")
        agg = g.group_by(["u", "v"]).aggregate([("c12", "sum")])
        agg = agg.rename_columns(["u", "v", "c12"])
        t = agg.filter(pc.greater_equal(agg.column("c12"), min_support))
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        c = t.column("c12").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "ante": pa.array(np.concatenate([u, v]), pa.int64()),
                "cons": pa.array(np.concatenate([v, u]), pa.int64()),
                "c12": pa.array(np.concatenate([c, c]), pa.int64()),
            }
        )

    rules = (
        op.map_batches(tag_order, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(expand, batch_format="pyarrow", num_cpus=1)
        .map_batches(tag_pair, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(reduce_sym, batch_format="pyarrow", num_cpus=1)
    )

    def items_as(col: str):
        def rn(t: pa.Table) -> pa.Table:
            return t.rename_columns([col, f"c_{col}"])

        return rn

    j1 = smart_join(
        rules,
        items.map_batches(items_as("ante"), batch_format="pyarrow", batch_size=None),
        on=["ante"],
    )
    j2 = smart_join(
        j1,
        items.map_batches(items_as("cons"), batch_format="pyarrow", batch_size=None),
        on=["cons"],
    )

    def score(t: pa.Table) -> pa.Table:
        c12 = t.column("c12").to_numpy(zero_copy_only=False).astype(np.float64)
        ca = t.column("c_ante").to_numpy(zero_copy_only=False).astype(np.float64)
        cb = t.column("c_cons").to_numpy(zero_copy_only=False).astype(np.float64)
        conf = c12 / ca
        lift = (c12 * float(n_orders)) / (ca * cb)
        return pa.table(
            {
                "ante": t.column("ante").cast(pa.int64()),
                "cons": t.column("cons").cast(pa.int64()),
                "support": t.column("c12").cast(pa.int64()),
                # half-away (x >= 0): integer count ratios can be exactly
                # dyadic and land ON a 6-dp half; np.round is half-even
                # while the DuckDB oracle's ROUND is half-away.
                "confidence": pa.array(np.floor(conf * 1e6 + 0.5) / 1e6, pa.float64()),
                "lift": pa.array(np.floor(lift * 1e6 + 0.5) / 1e6, pa.float64()),
            }
        )

    return j2.map_batches(score, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------- rolling active users


def wau_rolling(sf_dir: str, window_days: int = 7) -> rd.Dataset:
    """Trailing-7-day active users per ACTIVE day (the WAU/DAU family):
    for each calendar day that has any activity, the count of distinct
    users active within the trailing window.  Sliding COUNT(DISTINCT)
    does not decompose as a window aggregate, so the scalable plan is
    contribution expansion: ONE user-hash shuffle co-locates each
    user's rows, the group body dedups (user, day), expands each day to
    the <= 7 window days it contributes to, re-dedups per user (all in
    vectorized segment math), and emits per-group (day, partial) counts
    whose sum over groups is exact because a user lives in exactly one
    group.  Output days are restricted to the ACTIVE-day set (broadcast,
    date-domain-sized) so the row set matches the self-join oracle.
    Day boundary uses floor-before-cast int arithmetic (us // 86.4e9) —
    the sessionize-oracle-safe pattern."""
    from ..stages.joins import default_join_partitions
    from ..stages.partition import part_column

    ev = _read(sf_dir, "events", ["user_id", "ts"])
    n_parts = default_join_partitions()
    DAY_US = 86_400_000_000

    def tag(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        day = pc.divide(us, DAY_US)  # int64 floor division (us >= 0)
        tt = pa.table({"user_id": t.column("user_id"), "day": day})
        return tt.append_column("__part", part_column(tt, ["user_id"], n_parts))

    tagged = ev.map_batches(tag, batch_format="pyarrow", batch_size=None)

    # active-day set: date-domain-sized, broadcast for the output filter
    active_days = set(
        r["day"]
        for r in tagged.groupby("day").count().select_columns(["day"]).take_all()
    )

    def expand(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        day = g.column("day").to_numpy(zero_copy_only=False).astype(np.int64)
        empty = pa.table(
            {"day": pa.array([], pa.int64()), "partial": pa.array([], pa.int64())}
        )
        if len(uid) == 0:
            return empty
        # dedup (user, day), expand each to its window days, re-dedup
        pairs = np.unique(np.stack([uid, day], axis=1), axis=0)
        u = np.repeat(pairs[:, 0], window_days)
        w = np.repeat(pairs[:, 1], window_days) + np.tile(
            np.arange(window_days, dtype=np.int64), len(pairs)
        )
        uw = np.unique(np.stack([u, w], axis=1), axis=0)
        days_arr, counts = np.unique(uw[:, 1], return_counts=True)
        return pa.table(
            {
                "day": pa.array(days_arr, pa.int64()),
                "partial": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    merged = (
        tagged.groupby("__part")
        .map_groups(expand, batch_format="pyarrow", num_cpus=1)
        .groupby("day")
        .sum("partial")
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["day", "wau"])
        day = t.column("day").to_numpy(zero_copy_only=False)
        keep = np.isin(day, np.fromiter(active_days, dtype=np.int64))
        t = t.filter(pa.array(keep))
        return pa.table(
            {
                "day": t.column("day").cast(pa.int64()),
                "wau": t.column("wau").cast(pa.int64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow", batch_size=None)


# -------------------------------------------------------------- SCD type-2


def scd2_intervals(sf_dir: str) -> rd.Dataset:
    """Slowly-changing-dimension type-2 build: each per-user event
    becomes a validity interval [its ts, next event's ts) with an open
    (null) end for the current row — the warehouse dimension-history
    primitive.  ONE user-hash coarse shuffle, loop-free segment lead:
    lexsort by (user, ts, event_id), valid_to = next row's ts within
    the segment, null at segment ends."""
    from ..stages.joins import default_join_partitions
    from ..stages.partition import part_column

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    n_parts = default_join_partitions()

    def tag(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        t = t.set_column(t.schema.get_field_index("ts"), "ts", us)
        return t.append_column("__part", part_column(t, ["user_id"], n_parts))

    def lead(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        tsv = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        et = np.asarray(g.column("event_type").to_pylist(), dtype=object)
        n = len(uid)
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "event_id": pa.array([], pa.int64()),
                    "event_type": pa.array([], pa.string()),
                    "valid_from_us": pa.array([], pa.int64()),
                    "valid_to_us": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((eid, tsv, uid))
        uid_s, ts_s, eid_s, et_s = uid[order], tsv[order], eid[order], et[order]
        nxt = np.empty(n, dtype=np.float64)
        nxt[:-1] = ts_s[1:]
        nxt[-1] = np.nan
        seg_end = np.empty(n, dtype=bool)
        seg_end[:-1] = uid_s[1:] != uid_s[:-1]
        seg_end[-1] = True
        nxt[seg_end] = np.nan
        valid_to = pa.array(
            [None if np.isnan(x) else int(x) for x in nxt], pa.int64()
        )
        return pa.table(
            {
                "user_id": pa.array(uid_s, pa.int64()),
                "event_id": pa.array(eid_s, pa.int64()),
                "event_type": pa.array(et_s, pa.string()),
                "valid_from_us": pa.array(ts_s, pa.int64()),
                "valid_to_us": valid_to,
            }
        )

    return (
        ev.map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(lead, batch_format="pyarrow", num_cpus=1)
    )


# ------------------------------------------------------- oracled PageRank


def pr2_cooccur(sf_dir: str, min_support: int = 2, damping: float = 0.85) -> rd.Dataset:
    """TWO unrolled PageRank iterations over the support-thresholded
    co-order part graph — the first PageRank in the repo whose VALUES
    are DuckDB-hash-verified (the KG PageRank is numpy-golden only;
    a fixed iteration count makes the recurrence SQL-expressible as
    unrolled CTEs).  Symmetric graph -> no dangling mass.  Per
    iteration: ONE cost-based join attaching current ranks to edges +
    one destination groupby; rank tables stay node-sized."""
    from ..stages.joins import smart_join
    from ..stages.partition import expansion_partitions, part_column

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def distinct_op(t: pa.Table) -> pa.Table:
        return t.group_by(["l_orderkey", "l_partkey"]).aggregate([])

    op = (
        li.map_batches(distinct_op, batch_format="pyarrow", batch_size=None)
        .groupby(["l_orderkey", "l_partkey"])
        .count()
        .select_columns(["l_orderkey", "l_partkey"])
    )

    n_parts = expansion_partitions()

    def tag_order(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, ["l_orderkey"], n_parts))

    def expand(g: pa.Table) -> pa.Table:
        g = g.drop_columns("__part").sort_by(
            [("l_orderkey", "ascending"), ("l_partkey", "ascending")]
        )
        o = g.column("l_orderkey").to_numpy(zero_copy_only=False)
        p = g.column("l_partkey").to_numpy(zero_copy_only=False)
        n = len(o)
        empty = pa.table(
            {"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64()),
             "cuv": pa.array([], pa.int64())}
        )
        if n == 0:
            return empty
        starts = np.flatnonzero(np.concatenate([[True], o[1:] != o[:-1]]))
        ends = np.concatenate([starts[1:], [n]])
        us, vs = [], []
        for st, en in zip(starts, ends):
            nb = p[st:en]
            if len(nb) > 1:
                iu, iv = np.triu_indices(len(nb), k=1)
                us.append(nb[iu])
                vs.append(nb[iv])
        if not us:
            return empty
        tt = pa.table(
            {"u": pa.array(np.concatenate(us), pa.int64()),
             "v": pa.array(np.concatenate(vs), pa.int64())}
        )
        cg = tt.group_by(["u", "v"]).aggregate([([], "count_all")])
        return cg.rename_columns(["u", "v", "cuv"])

    def tag_pair(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, ["u", "v"], n_parts))

    def reduce_sym(g: pa.Table) -> pa.Table:
        g = g.drop_columns("__part")
        agg = g.group_by(["u", "v"]).aggregate([("cuv", "sum")])
        agg = agg.rename_columns(["u", "v", "cuv"])
        t = agg.filter(pc.greater_equal(agg.column("cuv"), min_support))
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": pa.array(np.concatenate([u, v]), pa.int64()),
                "v": pa.array(np.concatenate([v, u]), pa.int64()),
            }
        )

    sym = (
        op.map_batches(tag_order, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(expand, batch_format="pyarrow", num_cpus=1)
        .map_batches(tag_pair, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(reduce_sym, batch_format="pyarrow", num_cpus=1)
        .materialize()  # edge table reused across both iterations
    )

    deg = sym.groupby("u").count().map_batches(
        lambda t: t.rename_columns(["u", "dg"]), batch_format="pyarrow",
        batch_size=None,
    ).materialize()
    n_nodes = int(deg.count())
    teleport = 0.15 / n_nodes

    # edges carry (u, v, dg(u)) once; each iteration joins current ranks
    edges = smart_join(sym, deg, on=["u"]).materialize()

    def iterate(pr: rd.Dataset) -> rd.Dataset:
        pru = pr.map_batches(
            lambda t: t.rename_columns(["u", "r"]), batch_format="pyarrow",
            batch_size=None,
        )
        contrib = smart_join(edges, pru, on=["u"])

        def part_sum(t: pa.Table) -> pa.Table:
            r = t.column("r").to_numpy(zero_copy_only=False)
            dg = t.column("dg").to_numpy(zero_copy_only=False).astype(np.float64)
            tt = pa.table(
                {"node": t.column("v"), "c": pa.array(r / dg, pa.float64())}
            )
            g = tt.group_by(["node"]).aggregate([("c", "sum")])
            return g.rename_columns(["node", "c"])

        summed = (
            contrib.map_batches(part_sum, batch_format="pyarrow", batch_size=None)
            .groupby("node")
            .sum("c")
        )

        def finishr(t: pa.Table) -> pa.Table:
            c = t.column(1).to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "node": t.column(0).cast(pa.int64()),
                    "r": pa.array(teleport + damping * c, pa.float64()),
                }
            )

        return summed.map_batches(finishr, batch_format="pyarrow", batch_size=None)

    pr = deg.map_batches(
        lambda t: pa.table(
            {
                "node": t.column("u").cast(pa.int64()),
                "r": pa.array(
                    np.full(t.num_rows, 1.0 / n_nodes), pa.float64()
                ),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    for _ in range(2):
        pr = iterate(pr).materialize()

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t.column("node").cast(pa.int64()),
                "pr": pc.round(t.column("r"), 6),
            }
        )

    return pr.map_batches(finish, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------------- gaps & islands


def o36_gaps_islands(sf_dir: str) -> rd.Dataset:
    """The gaps-and-islands problem: maximal runs of CONSECUTIVE active
    days per user (distinct from sessionize's time-gap splitting — the
    island key is integer-day continuity).  ONE user-hash coarse
    shuffle; inside a partition: (user, day) dedup, island boundary =
    user change or day step != 1, island aggregates via boundary-index
    arithmetic — no per-user loop.  Oracle: the day - row_number()
    grouping trick."""
    from ..stages.joins import default_join_partitions
    from ..stages.partition import part_column

    ev = _read(sf_dir, "events", ["user_id", "ts"])
    n_parts = default_join_partitions()
    DAY_US = 86_400_000_000

    def tag(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        day = pc.divide(us, DAY_US)
        tt = pa.table({"user_id": t.column("user_id"), "day": day})
        return tt.append_column("__part", part_column(tt, ["user_id"], n_parts))

    def islands(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        day = g.column("day").to_numpy(zero_copy_only=False).astype(np.int64)
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "start_day": pa.array([], pa.int64()),
                "end_day": pa.array([], pa.int64()),
                "n_days": pa.array([], pa.int64()),
            }
        )
        if len(uid) == 0:
            return empty
        pairs = np.unique(np.stack([uid, day], axis=1), axis=0)  # sorted
        u, d = pairs[:, 0], pairs[:, 1]
        new = np.empty(len(u), dtype=bool)
        new[0] = True
        new[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1] + 1)
        starts = np.flatnonzero(new)
        ends = np.concatenate([starts[1:], [len(u)]]) - 1
        return pa.table(
            {
                "user_id": pa.array(u[starts], pa.int64()),
                "start_day": pa.array(d[starts], pa.int64()),
                "end_day": pa.array(d[ends], pa.int64()),
                "n_days": pa.array(ends - starts + 1, pa.int64()),
            }
        )

    return (
        ev.map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(islands, batch_format="pyarrow", num_cpus=1)
    )


# -------------------------------------------------------- median event gap


def o35_median_gap(sf_dir: str) -> rd.Dataset:
    """Median inter-event gap (µs) per user — lag-diff plus per-user
    interpolated median in one user-hash coarse shuffle.  Gaps are
    exact int64 µs and a two-value median adds at most 0.5, so both
    engines produce bit-identical doubles (no rounding needed).
    Single-event users emit no row (no gaps), matching the oracle's
    WHERE gap IS NOT NULL."""
    from ..stages.joins import default_join_partitions
    from ..stages.partition import part_column

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    n_parts = default_join_partitions()

    def tag(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        t = t.set_column(t.schema.get_field_index("ts"), "ts", us)
        return t.append_column("__part", part_column(t, ["user_id"], n_parts))

    def med(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        tsv = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "median_gap_us": pa.array([], pa.float64()),
            }
        )
        n = len(uid)
        if n == 0:
            return empty
        order = np.lexsort((eid, tsv, uid))
        uid_s, ts_s = uid[order], tsv[order]
        same = uid_s[1:] == uid_s[:-1]
        gaps = (ts_s[1:] - ts_s[:-1])[same]
        gu = uid_s[1:][same]
        if len(gaps) == 0:
            return empty
        # per-user sorted segments -> vectorized interpolated median
        o2 = np.lexsort((gaps, gu))
        gu, gaps = gu[o2], gaps[o2].astype(np.float64)
        new = np.empty(len(gu), dtype=bool)
        new[0] = True
        new[1:] = gu[1:] != gu[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(gu)))
        lo = starts + (lens - 1) // 2
        hi = starts + lens // 2
        medians = (gaps[lo] + gaps[hi]) / 2.0
        return pa.table(
            {
                "user_id": pa.array(gu[starts], pa.int64()),
                "median_gap_us": pa.array(medians, pa.float64()),
            }
        )

    return (
        ev.map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(med, batch_format="pyarrow", num_cpus=1)
    )


# ------------------------------------------------------- interval coverage


def o37_interval_coverage(sf_dir: str, width_s: int = 300) -> rd.Dataset:
    """Interval-UNION coverage per user: treat each event as a
    [ts, ts + width) activity interval, merge overlaps, report total
    covered time and merged-interval count — the utilization/uptime
    primitive (distinct from sessionize: fixed-width intervals, union
    length, not gap splitting).  ONE user-hash coarse shuffle; inside a
    partition the merge is a loop-free segmented sweep (sort by start,
    segmented cumulative max of ends via the disjoint-offset cummax
    trick, island boundaries where start > previous running max).
    All-integer µs arithmetic — no float hazard anywhere."""
    from ..stages.joins import default_join_partitions
    from ..stages.partition import part_column

    ev = _read(sf_dir, "events", ["user_id", "ts"])
    n_parts = default_join_partitions()
    width_us = width_s * 1_000_000

    def tag(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        tt = pa.table({"user_id": t.column("user_id"), "s": us})
        return tt.append_column("__part", part_column(tt, ["user_id"], n_parts))

    def cover(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        s = g.column("s").to_numpy(zero_copy_only=False).astype(np.int64)
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "covered_us": pa.array([], pa.int64()),
                "n_intervals": pa.array([], pa.int64()),
            }
        )
        n = len(uid)
        if n == 0:
            return empty
        order = np.lexsort((s, uid))
        uid_s, st = uid[order], s[order]
        en = st + width_us
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = uid_s[1:] != uid_s[:-1]
        seg = np.cumsum(new_user) - 1
        # segmented running max of ends: shift each user's ends onto a
        # disjoint ascending range, ONE global cummax, shift back
        span = int(en.max() - st.min()) + 1
        n_segs = int(seg[-1]) + 1
        if n_segs * span < 2**62:
            shifted = (en - st.min()) + seg * span
            run_max = np.maximum.accumulate(shifted) - seg * span + st.min()
        else:
            # wide timestamp range x many segments would overflow int64 in
            # the disjoint-offset trick; do the cummax per segment instead
            # (rare path: only for pathologically wide ranges)
            run_max = np.empty(n, dtype=np.int64)
            bounds = np.append(np.flatnonzero(new_user), n)
            for a, b in zip(bounds[:-1], bounds[1:]):
                run_max[a:b] = np.maximum.accumulate(en[a:b])
        prev_max = np.empty(n, dtype=np.int64)
        prev_max[1:] = run_max[:-1]
        new_island = new_user.copy()
        new_island[1:] |= st[1:] > prev_max[1:]
        isl = np.cumsum(new_island) - 1
        isl_starts = np.flatnonzero(new_island)
        # island end = running max at the island's LAST row
        isl_last = np.concatenate([isl_starts[1:], [n]]) - 1
        lengths = run_max[isl_last] - st[isl_starts]
        isl_user = uid_s[isl_starts]
        # per-user rollup of island lengths/counts (vectorized)
        u_new = np.empty(len(isl_user), dtype=bool)
        u_new[0] = True
        u_new[1:] = isl_user[1:] != isl_user[:-1]
        u_id = np.cumsum(u_new) - 1
        covered = np.bincount(u_id, weights=lengths.astype(np.float64))
        counts = np.bincount(u_id)
        return pa.table(
            {
                "user_id": pa.array(isl_user[np.flatnonzero(u_new)], pa.int64()),
                "covered_us": pa.array(covered.astype(np.int64), pa.int64()),
                "n_intervals": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    return (
        ev.map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(cover, batch_format="pyarrow", num_cpus=1)
    )


# -------------------------------------------------------- weighted median


def a30_weighted_median(sf_dir: str) -> rd.Dataset:
    """Weighted (lower) median: the smallest quantity whose cumulative
    extended-price weight reaches half the group's total — the robust
    aggregation the plain median family (a11/a22/a23) doesn't cover.
    Same domain-bounded histogram shape as a23: per-block (flag, qty)
    weight partials, one tiny groupby, cumulative scan inside a single
    groups x domain block."""
    li = _read(
        sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"]
    )

    def hist(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_returnflag", "l_quantity"]).aggregate(
            [("l_extendedprice", "sum")]
        )
        return g.rename_columns(["l_returnflag", "l_quantity", "w"])

    h = (
        li.map_batches(hist, batch_format="pyarrow", batch_size=None)
        .groupby(["l_returnflag", "l_quantity"])
        .sum("w")
        .map_batches(
            lambda t: t.rename_columns(["l_returnflag", "l_quantity", "w"]),
            batch_format="pyarrow",
            batch_size=None,
        )
        .repartition(1)  # <= groups x domain rows by construction
    )

    def wmed(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "l_returnflag": pa.array([], pa.string()),
                    "wmedian": pa.array([], pa.int64()),
                }
            )
        t = t.sort_by(
            [("l_returnflag", "ascending"), ("l_quantity", "ascending")]
        )
        k = np.asarray(t.column("l_returnflag").to_pylist(), dtype=object)
        q = t.column("l_quantity").to_numpy(zero_copy_only=False)
        w = t.column("w").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.concatenate([[True], k[1:] != k[:-1]]))
        ends = np.concatenate([starts[1:], [len(k)]])
        names, meds = [], []
        for st, en in zip(starts, ends):
            cum = np.cumsum(w[st:en])
            half = cum[-1] / 2
            names.append(k[st])
            meds.append(int(q[st + int(np.searchsorted(cum, half))]))
        return pa.table(
            {
                "l_returnflag": pa.array(names, pa.string()),
                "wmedian": pa.array(meds, pa.int64()),
            }
        )

    return h.map_batches(wmed, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------- sequence pattern mining


def seq_trigrams(sf_dir: str) -> rd.Dataset:
    """Sequential-pattern mining: corpus-wide counts of every length-3
    event-type sequence (consecutive per user by time) — the Markovian
    path-mining primitive.  ONE user-hash coarse shuffle; trigrams are
    vectorized segment slices (no per-user loop); per-partition Arrow
    pre-combine before the tiny (type^3-bounded) final groupby."""
    from ..stages.joins import default_join_partitions
    from ..stages.partition import part_column

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    n_parts = default_join_partitions()

    def tag(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        t = t.set_column(t.schema.get_field_index("ts"), "ts", us)
        return t.append_column("__part", part_column(t, ["user_id"], n_parts))

    def tri(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        tsv = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        et = np.asarray(g.column("event_type").to_pylist(), dtype=object)
        empty = pa.table(
            {
                "e1": pa.array([], pa.string()),
                "e2": pa.array([], pa.string()),
                "e3": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        n = len(uid)
        if n < 3:
            return empty
        order = np.lexsort((eid, tsv, uid))
        u_s, et_s = uid[order], et[order]
        same2 = u_s[2:] == u_s[:-2]  # rows i, i+1, i+2 share the user
        if not same2.any():
            return empty
        t3 = pa.table(
            {
                "e1": pa.array(et_s[:-2][same2], pa.string()),
                "e2": pa.array(et_s[1:-1][same2], pa.string()),
                "e3": pa.array(et_s[2:][same2], pa.string()),
            }
        )
        g3 = t3.group_by(["e1", "e2", "e3"]).aggregate([([], "count_all")])
        return g3.rename_columns(["e1", "e2", "e3", "n"])

    return (
        ev.map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(tri, batch_format="pyarrow", num_cpus=1)
        .groupby(["e1", "e2", "e3"])
        .sum("n")
        .map_batches(
            lambda t: pa.table(
                {
                    "e1": t.column(0),
                    "e2": t.column(1),
                    "e3": t.column(2),
                    "n": t.column(3).cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
    )


# --------------------------------------------------- entity resolution


def er_clusters(sf_dir: str) -> rd.Dataset:
    """Entity-resolution clusters end to end: SymSpell deletion-
    neighborhood blocking finds all part-name pairs within edit
    distance 1 (stages/fuzzy.ed1_pairs — one variant-hash shuffle, no
    all-pairs), then the log-round star-contraction CC
    (stages/cc.cc_min_labels) collapses the match graph into clusters
    labelled by their minimum part key.  The standard dedupe/ER
    composition (blocking -> match -> cluster), with BOTH stages
    individually oracled elsewhere and the composition hash-verified
    here via a levenshtein self-join + recursive-CTE oracle."""
    from ..stages.cc import cc_min_labels
    from ..stages.fuzzy import ed1_pairs

    parts = _read(sf_dir, "part", ["p_partkey", "p_name"])
    pairs = ed1_pairs(parts, "p_partkey", "p_name").map_batches(
        lambda t: pa.table(
            {
                "u": t.column("id_a").cast(pa.int64()),
                "v": t.column("id_b").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    labels, converged = cc_min_labels(pairs)
    if not converged:
        raise RuntimeError(
            "cc_min_labels exhausted max_rounds without converging; "
            "labels would be wrong (output is hash-compared vs exact CC)"
        )
    return labels


# ---------------------------------------------------- audience similarity


def type_user_jaccard(sf_dir: str) -> rd.Dataset:
    """Audience-overlap analysis: Jaccard similarity between the USER
    SETS of every pair of event types (the segment-similarity primitive
    behind campaign/feature overlap dashboards).  Distinct (type, user)
    pairs -> per-USER pair expansion in one user-hash coarse shuffle
    (fan-out bounded by types-per-user^2) -> type-pair-domain-bounded
    groupby; per-type set sizes ride in as a broadcast dict.  The
    count-ratio Jaccard rounds HALF-AWAY at 6 dp (integer ratios land
    on exact halves — the CLAUDE.md knife edge)."""
    from ..stages.joins import default_join_partitions
    from ..stages.partition import part_column

    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    n_parts = default_join_partitions()

    def dedup_partial(t: pa.Table) -> pa.Table:
        return t.group_by(["event_type", "user_id"]).aggregate([])

    du = (
        ev.map_batches(dedup_partial, batch_format="pyarrow", batch_size=None)
        .groupby(["event_type", "user_id"])
        .count()
        .select_columns(["event_type", "user_id"])
        .materialize()  # two consumers: per-type sizes + pair expansion
    )
    sizes = {
        r["event_type"]: int(r["count()"])
        for r in du.groupby("event_type").count().take_all()
    }  # type-domain-sized broadcast

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, ["user_id"], n_parts))

    def pairs(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        et = np.asarray(g.column("event_type").to_pylist(), dtype=object)
        empty = pa.table(
            {
                "type_a": pa.array([], pa.string()),
                "type_b": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if len(uid) == 0:
            return empty
        order = np.lexsort((et, uid))
        u_s, e_s = uid[order], et[order]
        starts = np.flatnonzero(np.concatenate([[True], u_s[1:] != u_s[:-1]]))
        ends = np.concatenate([starts[1:], [len(u_s)]])
        a_parts, b_parts = [], []
        for st, en in zip(starts, ends):  # per USER (types-per-user bounded)
            ts = e_s[st:en]
            if len(ts) > 1:
                ia, ib = np.triu_indices(len(ts), k=1)
                a_parts.append(ts[ia])
                b_parts.append(ts[ib])
        if not a_parts:
            return empty
        tt = pa.table(
            {
                "type_a": pa.array(np.concatenate(a_parts), pa.string()),
                "type_b": pa.array(np.concatenate(b_parts), pa.string()),
            }
        )
        g2 = tt.group_by(["type_a", "type_b"]).aggregate([([], "count_all")])
        return g2.rename_columns(["type_a", "type_b", "n"])

    inter = (
        du.map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(pairs, batch_format="pyarrow", num_cpus=1)
        .groupby(["type_a", "type_b"])
        .sum("n")
    )

    def finish(t: pa.Table) -> pa.Table:
        ta = np.asarray(t.column(0).to_pylist(), dtype=object)
        tb = np.asarray(t.column(1).to_pylist(), dtype=object)
        n = t.column(2).to_numpy(zero_copy_only=False).astype(np.float64)
        ca = np.array([sizes[x] for x in ta], dtype=np.float64)
        cb = np.array([sizes[x] for x in tb], dtype=np.float64)
        jac = n * 1.0 / (ca + cb - n)
        jac = np.floor(jac * 1e6 + 0.5) / 1e6  # half-away, x >= 0
        return pa.table(
            {
                "type_a": pa.array(ta, pa.string()),
                "type_b": pa.array(tb, pa.string()),
                "n_common": pa.array(n.astype(np.int64), pa.int64()),
                "jaccard": pa.array(jac, pa.float64()),
            }
        )

    return inter.map_batches(finish, batch_format="pyarrow", batch_size=None)

# ------------------------------------------------- sorted-neighborhood ER


def er_snm_pairs(sf_dir: str) -> rd.Dataset:
    """Sorted-neighborhood entity-resolution candidates over part
    names (stages/snm.py): global rank by (p_name, p_partkey) via the
    monotone-prefix two-pass scan (no global sort), sliding window 4,
    then the DuckDB-exact Jaro-Winkler kernel keeps pairs >= 0.9 —
    the windowed-blocking complement of the SymSpell/LSH blockers.
    Output jw rounded 4dp HALF-AWAY (DuckDB ROUND semantics)."""
    from ..stages.snm import elementwise_jw, sorted_neighborhood_pairs

    parts = _read(sf_dir, "part", ["p_partkey", "p_name"])
    cands = sorted_neighborhood_pairs(
        parts, key_column="p_name", id_column="p_partkey", window=4
    )

    def score(t: pa.Table) -> pa.Table:
        jw = elementwise_jw(
            t.column("key_a").to_pylist(), t.column("key_b").to_pylist()
        )
        keep = jw >= 0.9
        return pa.table(
            {
                "id_a": t.column("id_a").cast(pa.int64()).filter(pa.array(keep)),
                "id_b": t.column("id_b").cast(pa.int64()).filter(pa.array(keep)),
                "rank_a": t.column("rank_a").cast(pa.int64()).filter(pa.array(keep)),
                "rank_b": t.column("rank_b").cast(pa.int64()).filter(pa.array(keep)),
                "jw": pa.array(np.floor(jw[keep] * 1e4 + 0.5) / 1e4, pa.float64()),
            }
        )

    return cands.map_batches(score, batch_format="pyarrow", batch_size=None)

def er_fs_scores(sf_dir: str) -> rd.Dataset:
    """Fellegi-Sunter-style match scoring over the sorted-neighborhood
    candidates (the classify step of the ER stack: SNM blocking ->
    field-weighted agreement score -> match/possible/non_match):
    integer agreement/disagreement weights per field (name-JW >= 0.95
    +6/-2, brand +3/-1, type +2/-1, size +2/-1), thresholds 8/4 —
    all-integer scores over the exact JW kernel, so the whole decision
    table hash-gates.  Field attributes attach to the pair stream via
    two node-sized smart_joins (broadcast here, shuffle at scale)."""
    from ..stages.joins import smart_join
    from ..stages.snm import elementwise_jw, sorted_neighborhood_pairs

    parts = _read(sf_dir, "part", ["p_partkey", "p_name", "p_brand", "p_type", "p_size"])
    cands = sorted_neighborhood_pairs(
        parts.select_columns(["p_partkey", "p_name"]),
        key_column="p_name",
        id_column="p_partkey",
        window=4,
    ).map_batches(
        lambda t: t.select(["id_a", "id_b", "key_a", "key_b"]),
        batch_format="pyarrow",
        batch_size=None,
    )
    attrs = parts.map_batches(
        lambda t: pa.table(
            {
                "pid": t.column("p_partkey").cast(pa.int64()),
                "brand": t.column("p_brand"),
                "ptype": t.column("p_type"),
                "psize": t.column("p_size").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    ).materialize()
    aa = attrs.map_batches(
        lambda t: t.rename_columns(["id_a", "brand_a", "type_a", "size_a"]),
        batch_format="pyarrow",
        batch_size=None,
    )
    ab = attrs.map_batches(
        lambda t: t.rename_columns(["id_b", "brand_b", "type_b", "size_b"]),
        batch_format="pyarrow",
        batch_size=None,
    )
    joined = smart_join(smart_join(cands, aa, on=["id_a"]), ab, on=["id_b"])

    def score(t: pa.Table) -> pa.Table:
        jw = elementwise_jw(
            t.column("key_a").to_pylist(), t.column("key_b").to_pylist()
        )
        s = np.where(jw >= 0.95, 6, -2)
        for fa, fb, wp, wm in (
            ("brand_a", "brand_b", 3, -1),
            ("type_a", "type_b", 2, -1),
            ("size_a", "size_b", 2, -1),
        ):
            eq = pc.equal(t.column(fa), t.column(fb)).to_numpy(
                zero_copy_only=False
            )
            s = s + np.where(eq, wp, wm)
        decision = np.where(
            s >= 8, "match", np.where(s >= 4, "possible", "non_match")
        )
        return pa.table(
            {
                "id_a": t.column("id_a").cast(pa.int64()),
                "id_b": t.column("id_b").cast(pa.int64()),
                "score": pa.array(s.astype(np.int64), pa.int64()),
                "decision": pa.array(decision.tolist(), pa.string()),
            }
        )

    return joined.map_batches(score, batch_format="pyarrow", batch_size=None)

def text_sentence_stats(sf_dir: str) -> rd.Dataset:
    """Per-document sentence splitter stats (stages/textprep.py:
    sentence_stats) — the sentence-level text-prep primitive, oracled
    via list_transform/list_filter replay of the same two regexes."""
    from ..stages.textprep import sentence_stats

    return sentence_stats(_read(sf_dir, "documents", ["doc_id", "text"]))

# ------------------------------------------------------ KMV set Jaccard


def approx_jaccard_users(sf_dir: str) -> rd.Dataset:
    """Bottom-k (KMV) Jaccard estimate between two user COHORTS (heavy
    clickers vs heavy error-ers, >= 14 events of the type): the k
    smallest md5 hashes of the union are a uniform sample of it, and
    the fraction present in both sets estimates J (Beyer et al. 2007
    §5; stages/kmv.kmv_jaccard_estimate).  The estimate rides as the
    exact integer pair (matches, k_used); the EXACT intersection and
    union sizes come along as the certificate — every column integer,
    the whole sketch under the hash gate."""
    from ray.data.aggregate import Count as _Count

    from ..stages.joins import broadcast_semi_join
    from ..stages.kmv import kmv_jaccard_estimate

    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def cohort(etype: str) -> rd.Dataset:
        return (
            ev.map_batches(
                lambda t, e=etype: t.filter(
                    pc.equal(t.column("event_type"), pa.scalar(e))
                ).select(["user_id"]),
                batch_format="pyarrow",
                batch_size=None,
            )
            .groupby("user_id")
            .aggregate(_Count(alias_name="n"))
            .map_batches(
                lambda t: t.filter(
                    pc.greater_equal(t.column("n"), pa.scalar(14))
                ).select(["user_id"]),
                batch_format="pyarrow",
                batch_size=None,
            )
            .materialize()
        )

    a = cohort("click")
    b = cohort("error")
    inter = broadcast_semi_join(a, b, on=["user_id"]).count()
    union = a.count() + b.count() - inter
    row = kmv_jaccard_estimate(a, b, "user_id", k=32)

    def attach(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k_used": t.column("k_used").cast(pa.int64()),
                "matches": t.column("matches").cast(pa.int64()),
                "inter_exact": pa.array([inter] * t.num_rows, pa.int64()),
                "union_exact": pa.array([union] * t.num_rows, pa.int64()),
            }
        )

    return row.map_batches(attach, batch_format="pyarrow", batch_size=None)

# --------------------------------------------------- referential audit


def dq_fk_orphans(sf_dir: str) -> rd.Dataset:
    """Referential-integrity audit across the star schema: for every
    FK edge, total child rows and orphan rows (child key absent from
    the parent) — the dq_checks companion for cross-TABLE contracts.
    Parent key sets are dimension-sized, so each edge is one
    broadcast anti-join + two scalar counts; the fact table streams."""
    from ..stages.joins import broadcast_anti_join

    edges = [
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ]
    names: list[str] = []
    totals: list[int] = []
    orphans: list[int] = []
    for name, child_t, child_k, parent_t, parent_k in edges:
        child = _read(sf_dir, child_t, [child_k])
        parent = _read(sf_dir, parent_t, [parent_k]).map_batches(
            lambda t, ck=child_k, pk=parent_k: pa.table({ck: t.column(pk)}),
            batch_format="pyarrow",
            batch_size=None,
        )
        names.append(name)
        totals.append(child.count())
        orphans.append(broadcast_anti_join(child, parent, on=[child_k]).count())
    return rd.from_arrow(
        pa.table(
            {
                "fk": pa.array(names, pa.string()),
                "n_rows": pa.array(totals, pa.int64()),
                "n_orphans": pa.array(orphans, pa.int64()),
            }
        )
    )


# ------------------------------------------------- time-weighted value


def o39_twap(sf_dir: str) -> rd.Dataset:
    """Time-weighted value exposure per user (the TWAP building block):
    each event's value is held until the user's next event; report the
    exact integer-microsecond weight total and the weighted value sum
    (4dp) — sums, never the ratio (the integer-mean knife edge).  One
    user-hash shuffle; the hold intervals are a per-group lexsort +
    shifted diff, no window loop."""
    from ..stages.partition import expansion_partitions, part_column

    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])
    n_parts = expansion_partitions()

    def tag(t: pa.Table) -> pa.Table:
        # value is 2-dp money: integer CENTS x integer microsecond gaps
        # keeps the whole query exact int64 (a float weighted sum at
        # ~1e12 magnitude has ulp ~1e-4 — exactly the 4dp knife edge)
        v = t.column("value").to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "user_id": t.column("user_id").cast(pa.int64()),
                "event_id": t.column("event_id").cast(pa.int64()),
                "ts_us": t.column("ts").cast(pa.timestamp("us")).cast(pa.int64()),
                "cents": pa.array(
                    np.floor(v * 100 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )
        return t.append_column("__part", part_column(t, ["user_id"], n_parts))

    def per_user(g: pa.Table) -> pa.Table:
        g = g.drop_columns("__part")
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        c = g.column("cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))  # event_id breaks ts ties
        u, ts, c = u[order], ts[order], c[order]
        n = len(u)
        starts = np.flatnonzero(np.concatenate([[True], u[1:] != u[:-1]]))
        ends = np.concatenate([starts[1:], [n]])
        uu: list[int] = []
        wt: list[int] = []
        ws: list[int] = []
        for s0, e0 in zip(starts, ends):
            if e0 - s0 < 2:
                continue  # a single event holds no interval
            gaps = ts[s0 + 1 : e0] - ts[s0 : e0 - 1]
            uu.append(int(u[s0]))
            wt.append(int(gaps.sum()))
            ws.append(int((c[s0 : e0 - 1] * gaps).sum()))
        return pa.table(
            {
                "user_id": pa.array(uu, pa.int64()),
                "held_us": pa.array(wt, pa.int64()),
                "weighted_cents_us": pa.array(ws, pa.int64()),
            }
        )

    return (
        ev.map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(per_user, batch_format="pyarrow")
    )

def o40_acf_lag1(sf_dir: str) -> rd.Dataset:
    """Per-user lag-1 autocorrelation of event values under (ts,
    event_id) order (stages/tseries.py) — the seasonality/anomaly
    primitive.  One user-hash coarse shuffle; users with < 3 events or
    a zero-variance side emit no row (SQL corr is NULL there)."""
    from ..stages.tseries import lag1_autocorr

    return lag1_autocorr(
        _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])
    )

def o41_mann_kendall(sf_dir: str) -> rd.Dataset:
    """Mann-Kendall monotone-trend statistic per user
    (stages/tseries.mann_kendall_s): S = sum of pairwise value signs
    under time order — nonparametric, ALL-INTEGER (no float edge
    anywhere).  Users with one event emit no row."""
    from ..stages.tseries import mann_kendall_s

    return mann_kendall_s(
        _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])
    )


def o42_cusum_max(sf_dir: str) -> rd.Dataset:
    """Max one-sided upward CUSUM per user against a 120.00 target
    (stages/tseries.cusum_max): the drift/changepoint alarm statistic
    in exact integer cents, loop-free via prefix sums resetting at
    their running minimum."""
    from ..stages.tseries import cusum_max

    return cusum_max(
        _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"]),
        target_cents=12000,
    )
