"""Join / set-op / lookup queries (split from relational.py; j*, d*, m*, as-of)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from ..stages.joins import broadcast_anti_join, broadcast_join, broadcast_semi_join, hash_join
from .rel_base import _parquet_cols_bytes, _read, _round_col
from .rel_windows import session_intervals

def j2_broadcast_join(sf_dir: str) -> rd.Dataset:
    """orders x customer on custkey — the dictionary-lookup pattern."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    customer = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_mktsegment"]
    ).rename_columns(["o_custkey", "c_name", "c_mktsegment"])
    return broadcast_join(orders, customer, on=["o_custkey"]).map_batches(
        lambda t: _round_col(t, "o_totalprice", 2), batch_format="pyarrow"
    )


# --- J1 analogue: both-sides-large hash join -----------------------------

def j1_hash_join(sf_dir: str) -> rd.Dataset:
    """lineitem x orders on orderkey (Ray native hash-shuffle join).
    Partitions sized to the SHUFFLED byte volume read straight from
    parquet footers (the j8 rule: aggregator-actor spawn cost scales
    with partition count, so small inputs want few partitions; at real
    scale the byte rule keeps partitions ~128 MB)."""
    from ..stages.joins import default_join_partitions

    li_cols = ["l_orderkey", "l_quantity", "l_extendedprice"]
    li = _read(sf_dir, "lineitem", li_cols)
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"]).rename_columns(
        ["l_orderkey", "o_orderstatus"]
    )
    shuffled = _parquet_cols_bytes(sf_dir, "lineitem", li_cols) + _parquet_cols_bytes(
        sf_dir, "orders", ["o_orderkey", "o_orderstatus"]
    )
    joined = hash_join(
        li, orders, on=["l_orderkey"],
        num_partitions=default_join_partitions(shuffled),
    )
    return joined.map_batches(
        lambda t: _round_col(t, "l_extendedprice", 2), batch_format="pyarrow"
    )


# --- J8: multiway join (TPC-H Q5 shape) ----------------------------------

def j8_multiway_revenue(sf_dir: str) -> rd.Dataset:
    """Regional supplier volume — the classic 6-table chain
    (region x nation x customer x orders x lineitem x supplier) that
    exercises every physical join strategy in one plan:

    - region/nation: driver-side tiny dims -> broadcast ``is_in``
      filter + dict lookup (never shuffled);
    - customer, supplier: column-pruned reads, region-filtered early,
      staged (``staged_nonempty``) because they come off filter chains;
    - orders: date-filtered + projected BEFORE its shuffle;
    - lineitem: revenue computed per-row at the read so only
      (orderkey, suppkey, revenue) ride through the two hash joins;
    - final aggregate: per-block Arrow partial sums, then a 25-key
      groupby — the all-to-all moves one row per (block, nation).
    """
    import datetime as _dt

    import ray

    from ..stages.joins import staged_nonempty

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    region = pq.read_table(f"{sf_dir}/region.parquet")
    asia = region.filter(pc.equal(region["r_name"], "ASIA"))["r_regionkey"]
    nation = nation.filter(pc.is_in(nation["n_regionkey"], value_set=asia))
    nation_keys = nation["n_nationkey"]
    name_by_key = dict(
        zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist())
    )
    nk_ref = ray.put(nation_keys)

    def in_region(key_col: str):
        def filt(t: pa.Table) -> pa.Table:
            return t.filter(
                pc.fill_null(pc.is_in(t[key_col], value_set=ray.get(nk_ref)), False)
            )

        return filt

    cust = staged_nonempty(
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
            in_region("c_nationkey"), batch_format="pyarrow"
        )
    )
    supp = staged_nonempty(
        _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
        .map_batches(in_region("s_nationkey"), batch_format="pyarrow")
        .map_batches(
            lambda t: t.rename_columns(["l_suppkey", "s_nationkey"]),
            batch_format="pyarrow",
        )
    )
    if cust is None or supp is None:
        return rd.from_arrow(
            pa.schema([("n_name", pa.string()), ("revenue", pa.float64())]).empty_table()
        )

    lo = pa.scalar(_dt.datetime(1996, 1, 1))
    hi = pa.scalar(_dt.datetime(1998, 1, 1))

    def date_window(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t["o_orderdate"], lo), pc.less(t["o_orderdate"], hi)
        )
        return t.filter(pc.fill_null(keep, False)).select(["o_orderkey", "o_custkey"])

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(date_window, batch_format="pyarrow")
    # orders x customer: attach the buyer's nation, keep only region rows
    # Partition count for this plan's joins: sized to the POST-FILTER
    # data volume, not the CPU count — each hash-shuffle join spawns
    # num_partitions aggregator actors, and with three chained joins the
    # spawn cost dominates small inputs (measured at sf0.1/32cpu: 8
    # parts 7.0s, 16 parts 10.8s, 32 parts 19.8s for identical output).
    # At real scale raise this to keep partitions at ~100-500 MB each.
    _JP = 8

    oc = staged_nonempty(
        hash_join(
            orders.map_batches(
                lambda t: t.rename_columns(["l_orderkey", "c_custkey"]),
                batch_format="pyarrow",
            ),
            cust,
            on=["c_custkey"],
            num_partitions=_JP,
        ).map_batches(
            lambda t: t.select(["l_orderkey", "c_nationkey"]), batch_format="pyarrow"
        )
    )
    if oc is None:
        return rd.from_arrow(
            pa.schema([("n_name", pa.string()), ("revenue", pa.float64())]).empty_table()
        )

    def li_project(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_suppkey": t["l_suppkey"],
                "revenue": rev,
            }
        )

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(li_project, batch_format="pyarrow")

    # Bloom-prefilter the fact table against BOTH small join sides
    # before any shuffle: the date+region filters make oc ~15% of
    # orders and supp ~20% of suppliers, so most lineitem rows can be
    # dropped at the read instead of riding two all-to-all exchanges.
    # False positives are removed by the exact hash joins downstream.
    from ..stages.bloom import bloom_prefilter, build_bloom

    ok_bits = ray.put(build_bloom(oc, "l_orderkey"))
    sk_bits = ray.put(build_bloom(supp, "l_suppkey"))
    li = bloom_prefilter(bloom_prefilter(li, ok_bits, "l_orderkey"), sk_bits, "l_suppkey")

    joined = hash_join(
        hash_join(li, oc, on=["l_orderkey"], num_partitions=_JP),
        supp,
        on=["l_suppkey"],
        num_partitions=_JP,
    )

    def partial(t: pa.Table) -> pa.Table:
        # local-supplier constraint + nation-name lookup + block partial sum
        t = t.filter(pc.equal(t["c_nationkey"], t["s_nationkey"]))
        if t.num_rows == 0:
            return pa.table(
                {"n_name": pa.array([], pa.string()), "revenue": pa.array([], pa.float64())}
            )
        names = pa.array(
            [name_by_key[k] for k in t["c_nationkey"].to_pylist()], pa.string()
        )
        t = pa.table({"n_name": names, "revenue": t["revenue"]})
        agg = t.group_by(["n_name"]).aggregate([("revenue", "sum")])
        return agg.rename_columns(["n_name", "revenue"])

    out = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("revenue", alias_name="revenue"))
    )
    return out.map_batches(lambda t: _round_col(t, "revenue", 2), batch_format="pyarrow")


# --- J5/J6/J7: semi / anti joins -----------------------------------------

def j5_semi_join(sf_dir: str) -> rd.Dataset:
    """customers that have at least one order (key-set broadcast)."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    orders = _read(sf_dir, "orders", ["o_custkey"])
    keys = orders.unique("o_custkey")
    key_table = pa.table({"c_custkey": pa.array(keys, pa.int64())})
    return broadcast_semi_join(cust, key_table, on=["c_custkey"])


def j6_anti_join(sf_dir: str) -> rd.Dataset:
    """customers with NO order above 300k (anti join, non-empty result)."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], 300_000.0)),
        batch_format="pyarrow",
    )
    keys = orders.unique("o_custkey")
    key_table = pa.table({"c_custkey": pa.array(keys, pa.int64())})
    return broadcast_anti_join(cust, key_table, on=["c_custkey"])


# --- A1: per-group list collection ---------------------------------------

def d2_distinct(sf_dir: str) -> rd.Dataset:
    """DISTINCT (user_id, event_type): per-block Arrow distinct, then a
    coarse hash-partition groupby with ONE vectorized distinct per
    partition — no per-group Python call (10^8 distinct pairs would pay
    10^8 map_groups invocations in the naive shape)."""
    from ..stages.joins import default_join_partitions

    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    n_parts = default_join_partitions()

    def local_distinct(t: pa.Table) -> pa.Table:
        t = t.group_by(["user_id", "event_type"]).aggregate([])
        uid = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        part = (uid.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(n_parts)
        return t.append_column("__part", pa.array(part.astype(np.int64), pa.int64()))

    def part_distinct(g: pa.Table) -> pa.Table:
        return g.drop_columns("__part").group_by(["user_id", "event_type"]).aggregate([])

    return (
        ev.map_batches(local_distinct, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(part_distinct, batch_format="pyarrow")
    )


# --- M1: normalization projection ----------------------------------------

def m1_normalize(sf_dir: str) -> rd.Dataset:
    """the mention normalizer applied as a vectorized projection."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    def norm(t: pa.Table) -> pa.Table:
        normed = pc.utf8_lower(
            pc.replace_substring_regex(t["c_name"], pattern=r"\s|'|-", replacement="")
        )
        return t.append_column("c_name_norm", normed)

    return cust.map_batches(norm, batch_format="pyarrow")


# --- M8: date scalar + filter --------------------------------------------

def m8_date_filter(sf_dir: str) -> rd.Dataset:
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_shipdate"])

    def f(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.less(t["l_shipdate"], pa.scalar(pd.Timestamp("1995-06-01"))))
        return keep.append_column("ship_year", pc.cast(pc.year(keep["l_shipdate"]), pa.int64()))

    return li.map_batches(f, batch_format="pyarrow")


# --- streaming-shaped: tumbling window -----------------------------------

def o8_asof_join(sf_dir: str) -> rd.Dataset:
    """Backward as-of join (event attribution): every event gets its
    user's most recent click — greatest click ts <= event ts, ties on
    the timestamp broken by max click event_id; events with no prior
    click keep null payload.  ONE key-hash shuffle; the per-partition
    merge is a single vectorized searchsorted (stages/temporal.py) —
    the Ray-native shape of the operator Ray Data has no primitive for."""
    from ..stages.temporal import asof_join

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def only_clicks(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "click"))
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "click_ts": t.column("ts"),
                "click_id": t.column("event_id"),
            }
        )

    clicks = ev.map_batches(only_clicks, batch_format="pyarrow")
    left = ev.select_columns(["event_id", "user_id", "ts"])
    return asof_join(
        left,
        clicks,
        left_key="user_id",
        right_key="user_id",
        left_ts="ts",
        right_ts="click_ts",
        left_cols=["event_id", "user_id"],
        right_cols=["click_id", "click_ts"],
        right_tie="click_id",
    )


def o9_range_count(sf_dir: str) -> rd.Dataset:
    """Pure range join (NO equality key): per order, how many lineitem
    ship-dates fall inside [o_orderdate, o_orderdate + 7 days).
    Co-location comes from 7-day time buckets (each window covers <= 2,
    each point exactly 1), so the all-to-all is one bucket-hash
    shuffle plus a <=2-rows-per-key sum — never the O(n*m) inequality
    join a naive plan would run."""
    from ..stages.temporal import interval_count

    li = _read(sf_dir, "lineitem", ["l_shipdate"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    return interval_count(
        li,
        orders,
        point_ts="l_shipdate",
        interval_start="o_orderdate",
        width_us=7 * 86_400_000_000,
        interval_key="o_orderkey",
        out_count="n_shipped",
    )


# --- streaming-shaped: sessionization ------------------------------------

def o3_regex_scan(sf_dir: str) -> rd.Dataset:
    """O3: regex scan over a name column (the Lucene regex-query
    completeness probe, DicoProcessingNEL.java:349-378)."""
    part = _read(sf_dir, "part", ["p_partkey", "p_name"])
    return part.map_batches(
        lambda t: t.filter(pc.match_substring_regex(t["p_name"], r"(red|blue)")),
        batch_format="pyarrow",
    )


def j9_bloom_semi_join(sf_dir: str) -> rd.Dataset:
    """Semi join with a Bloom prefilter ahead of the shuffle (the
    shuffle-volume cut for selective build sides): lineitem rows whose
    order is finished ('F'), aggregated per returnflag."""
    from ..stages.bloom import bloom_semi_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag", "l_extendedprice"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"]).filter(
        expr="o_orderstatus == 'F'"
    ).map_batches(
        lambda t: t.select(["o_orderkey"]).rename_columns(["l_orderkey"]),
        batch_format="pyarrow",
        batch_size=None,
    )
    matched = bloom_semi_join(li, orders, "l_orderkey")

    def partial(t: pa.Table) -> pa.Table:
        agg = (
            t.select(["l_returnflag", "l_extendedprice"])
            .group_by(["l_returnflag"])
            .aggregate([("l_extendedprice", "sum"), ("l_extendedprice", "count")])
        )
        return agg.rename_columns(["l_returnflag", "sum_price", "n_rows"])

    out = (
        matched.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("l_returnflag")
        .aggregate(Sum("sum_price", alias_name="sum_price"),
                   Sum("n_rows", alias_name="n_rows"))
    )
    return out.map_batches(lambda t: _round_col(t, "sum_price", 2),
                           batch_format="pyarrow")


def j10_full_outer(sf_dir: str) -> rd.Dataset:
    """FULL OUTER join: positive-balance customers vs per-customer
    big-order counts.  Both sides filtered so BOTH null directions
    occur (customers with no big orders; big orders whose customer has
    a non-positive balance).  Ray 2.49 coalesces the key columns under
    the LEFT names when ``on=`` matches (CLAUDE.md rule) — exactly the
    COALESCE/USING the SQL oracle spells out.  Both inputs come off
    filter chains, so both are staged (empty-first-block rule)."""
    from ..stages.joins import default_join_partitions, staged_nonempty

    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])

    def pos_bal(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["c_acctbal"], 0.0))
        return pa.table(
            {
                "custkey": t.column("c_custkey").cast(pa.int64()),
                "c_acctbal": pc.round(t.column("c_acctbal"), 2),
            }
        )

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def big(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["o_totalprice"], 150_000.0))
        return pa.table({"custkey": t.column("o_custkey").cast(pa.int64())})

    left = staged_nonempty(cust.map_batches(pos_bal, batch_format="pyarrow"))
    counts = (
        orders.map_batches(big, batch_format="pyarrow")
        .groupby("custkey")
        .count()
        .map_batches(
            lambda t: t.rename_columns(["custkey", "n_big"]), batch_format="pyarrow"
        )
    )
    right = staged_nonempty(counts)
    if left is None or right is None:
        raise ValueError("fixture tables unexpectedly empty")
    return left.join(
        right,
        join_type="full_outer",
        num_partitions=default_join_partitions(),
        on=("custkey",),
    )


def j11_smart_join(sf_dir: str) -> rd.Dataset:
    """Cost-based join choice (joins.smart_join): the nation build side
    is metadata-sized under the broadcast threshold, so the plan runs
    the zero-shuffle broadcast path — verified here against the same
    SQL the hash path would satisfy (strategy equality is pinned by
    tests/test_smart_join.py)."""
    from ..stages.joins import smart_join

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
        lambda t: pa.table(
            {
                "s_suppkey": t.column("s_suppkey").cast(pa.int64()),
                "nationkey": t.column("s_nationkey").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).map_batches(
        lambda t: pa.table(
            {
                "nationkey": t.column("n_nationkey").cast(pa.int64()),
                "n_name": t.column("n_name"),
            }
        ),
        batch_format="pyarrow",
    )
    return smart_join(sup, nat, on=["nationkey"])


def j12_range_join(sf_dir: str) -> rd.Dataset:
    """Band (range) join: every order -> its price tier from a SMALL
    sorted band dimension.  Broadcast edges + one np.searchsorted per
    batch (stages/intervals.broadcast_range_join) — zero shuffle; the
    theta-join alternative ships the fact table.  Oracle replays the
    bands as a CASE."""
    from ..stages.intervals import broadcast_range_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return broadcast_range_join(
        orders,
        "o_totalprice",
        edges=[0.0, 50_000.0, 100_000.0, 200_000.0, 300_000.0, 500_000.0],
        labels=["T0", "T1", "T2", "T3", "T4"],
        label_col="tier",
    ).map_batches(
        lambda t: _round_col(t, "o_totalprice", 2), batch_format="pyarrow"
    )


def j13_interval_join(sf_dir: str) -> rd.Dataset:
    """Generic interval join, end to end: assign every raw event to the
    session interval containing its timestamp (stages/intervals
    .interval_join — two-side union + ONE user-hash shuffle +
    vectorized merge/forward-fill binding; no per-row Python).  Output
    is per-event (user_id, event_id, session_id), hash-gated against
    the sessionize window SQL (sum-of-breaks session index)."""
    from ..stages.intervals import interval_join

    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts"])

    def to_us(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("ts"),
            "ts",
            pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()),
        )

    ev = ev.map_batches(to_us, batch_format="pyarrow", batch_size=None)
    iv = session_intervals(sf_dir)
    joined = interval_join(
        ev, iv, key="user_id", ts_col="ts", start_col="start_ts",
        end_col="end_ts", interval_cols=["session_id"],
    )
    return joined.select_columns(["user_id", "event_id", "session_id"])


def j14_cross_join(sf_dir: str) -> rd.Dataset:
    """Cartesian product (the last join species): region x nation with
    a derived filter so the output is not a pure blowup.  The small
    side broadcasts as ONE Arrow table (ray.put, fetched per task);
    each batch of the streaming side index-repeats itself against it —
    no shuffle, output |L| x |R| rows produced block-parallel.  At
    scale the small side must be the broadcast one by contract (a
    cross join with two big sides is always a modeling error)."""
    import ray

    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).materialize()
    reg_tbl = pa.concat_tables(
        [t for t in (ray.get(r) for r in reg.to_arrow_refs()) if t.num_rows]
    )
    reg_ref = ray.put(reg_tbl)
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])

    def cross(t: pa.Table) -> pa.Table:
        r = ray.get(reg_ref)
        nl, nr = t.num_rows, r.num_rows
        left = t.take(np.repeat(np.arange(nl, dtype=np.int64), nr))
        right = r.take(np.tile(np.arange(nr, dtype=np.int64), nl))
        out = pa.table(
            {
                "n_nationkey": left.column("n_nationkey").cast(pa.int64()),
                "n_name": left.column("n_name"),
                "r_regionkey": right.column("r_regionkey").cast(pa.int64()),
                "r_name": right.column("r_name"),
                "same_region": pa.compute.equal(
                    left.column("n_regionkey"), right.column("r_regionkey")
                ),
            }
        )
        return out

    return nat.map_batches(cross, batch_format="pyarrow", batch_size=None)


def d3_except_intersect(sf_dir: str) -> rd.Dataset:
    """Distinct set operations (EXCEPT / INTERSECT) over customer keys:
    customers INTERSECT order-placers and customers EXCEPT
    order-placers, emitted as one tagged table.  Composition of the
    existing primitives — distinct build (block partials), then
    broadcast semi/anti membership (`stages/joins`), which scale to
    shuffle variants via the same call sites."""
    from ..stages.joins import broadcast_anti_join, broadcast_semi_join

    cust = _read(sf_dir, "customer", ["c_custkey"])
    ords = _read(sf_dir, "orders", ["o_custkey"])

    def distinct_c(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t.group_by("c_custkey")
                .aggregate([])
                .column("c_custkey")
                .cast(pa.int64())
            }
        )

    cd = cust.map_batches(distinct_c, batch_format="pyarrow", batch_size=None)

    inter = broadcast_semi_join(cd, ords.map_batches(
        lambda t: pa.table({"c_custkey": t.column("o_custkey").cast(pa.int64())}),
        batch_format="pyarrow", batch_size=None,
    ), on=["c_custkey"]).map_batches(
        lambda t: t.append_column(
            "op", pa.array(["intersect"] * t.num_rows, pa.string())
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    exc = broadcast_anti_join(cd, ords.map_batches(
        lambda t: pa.table({"c_custkey": t.column("o_custkey").cast(pa.int64())}),
        batch_format="pyarrow", batch_size=None,
    ), on=["c_custkey"]).map_batches(
        lambda t: t.append_column(
            "op", pa.array(["except"] * t.num_rows, pa.string())
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    return inter.union(exc)


def o27_asof_tolerance(sf_dir: str, max_gap_s: int = 24 * 3600) -> rd.Dataset:
    """As-of join WITH TOLERANCE (the kdb/pandas `merge_asof
    tolerance=` semantics): a backward match only counts when the
    matched right row is within ``max_gap_s``; staler matches become
    nulls.  One vectorized post-map over the existing as-of output —
    the tolerance never changes the shuffle plan.  Oracle: the o8
    window SQL with a CASE gap filter."""
    from ..stages.temporal import asof_join

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def only_clicks(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "click"))
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "click_ts": t.column("ts"),
                "click_id": t.column("event_id"),
            }
        )

    clicks = ev.map_batches(only_clicks, batch_format="pyarrow")
    base = asof_join(
        ev.select_columns(["event_id", "user_id", "ts"]),
        clicks,
        left_key="user_id",
        right_key="user_id",
        left_ts="ts",
        right_ts="click_ts",
        left_cols=["event_id", "user_id", "ts"],
        right_cols=["click_id", "click_ts"],
        right_tie="click_id",
    )

    def tol(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        cts = t.column("click_ts").cast(pa.timestamp("us")).cast(pa.int64())
        gap_ok = pc.and_kleene(
            pc.is_valid(cts),
            pc.less_equal(
                pc.subtract(ts, cts), pa.scalar(max_gap_s * 1_000_000, pa.int64())
            ),
        )
        keep = pc.fill_null(gap_ok, False)
        return pa.table(
            {
                "event_id": t.column("event_id").cast(pa.int64()),
                "user_id": t.column("user_id").cast(pa.int64()),
                "click_id": pc.if_else(
                    keep, t.column("click_id").cast(pa.int64()), pa.scalar(None, pa.int64())
                ),
                "click_ts": pc.if_else(
                    keep,
                    t.column("click_ts").cast(pa.timestamp("us")),
                    pa.scalar(None, pa.timestamp("us")),
                ),
            }
        )

    return base.map_batches(tol, batch_format="pyarrow", batch_size=None)


def merge_cdc_latest(sf_dir: str) -> rd.Dataset:
    """CDC-apply with tombstones — the upsert/delete merge every
    incremental ingest needs: the event stream is a change log keyed
    by user; the LATEST change wins (ts desc, event_id desc, the o28
    tie-break) and a latest ``error`` event is a tombstone that deletes
    the key.  Per-block keep-latest partial (<=1 row per user per
    block) collapses the stream BEFORE the single user-hash shuffle;
    the coarse-partition map_groups finishes the argmax and drops
    tombstones.  Value rounded 2 dp on both sides."""
    from ..stages.partition import expansion_partitions, part_column

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "value"])

    def keep_latest(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        t = t.set_column(t.schema.get_field_index("ts"), "ts", us)
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        tsv = t.column("ts").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((-eid, -tsv, uid))
        first = np.empty(len(order), dtype=bool)
        if len(order):
            su = uid[order]
            first[0] = True
            first[1:] = su[1:] != su[:-1]
        return t.take(pa.array(order[first]))

    n_parts = expansion_partitions()

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, ["user_id"], n_parts))

    partials = ev.map_batches(
        keep_latest, batch_format="pyarrow", batch_size=None
    ).map_batches(tag, batch_format="pyarrow", batch_size=None)

    def finish(g: pa.Table) -> pa.Table:
        g = keep_latest(g)
        live = pc.invert(pc.equal(g.column("event_type"), "error"))
        g = g.filter(live)
        val = g.column("value").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": g.column("user_id").cast(pa.int64()),
                "last_type": g.column("event_type"),
                "last_value": pa.array(
                    np.floor(val * 100 + 0.5) / 100, pa.float64()
                ),
            }
        )

    return partials.groupby("__part").map_groups(
        finish, batch_format="pyarrow", num_cpus=1
    )


