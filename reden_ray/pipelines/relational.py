"""Relational operator demonstrations over the driver's TPC-H-ish tables.

One function per operator family from SURVEY.md §2, each with a DuckDB
oracle in ``__ray_entry__.oracle_sql()``.  These aren't toys: each is
the same physical pattern the KG pipeline uses (broadcast join = the
dictionary lookup; hash join = the adjacency attach variant; groupby
argmax = the per-mention top-1; window = streaming-shaped events), so
the driver's oracle check gates the engine's building blocks.

All numeric aggregate outputs are ROUNDED (2-6 dp) on BOTH sides:
distributed float summation differs from DuckDB's sequential sum in the
last ulp, and the driver compares value hashes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from ..stages.joins import broadcast_anti_join, broadcast_join, broadcast_semi_join, hash_join


_BIG_TABLES = {"lineitem", "orders", "events", "documents", "embeddings"}


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> rd.Dataset:
    """Column-pruned read; big fact tables get an explicit block count
    sized to the cluster (the auto-split default over-fragments small
    files, and a 64-block Mean aggregate measured 4x slower than a
    CPU-count-block one)."""
    blocks = None
    if table in _BIG_TABLES:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        blocks = max(4, cpus)
    return rd.read_parquet(
        f"{sf_dir}/{table}.parquet", columns=columns, override_num_blocks=blocks
    )


def _parquet_cols_bytes(sf_dir: str, table: str, columns: list[str] | None = None) -> int:
    """Uncompressed byte size of the PRUNED columns straight from
    parquet footer metadata — no scan; feeds data-sized join
    partitioning (joins.default_join_partitions)."""
    md = pq.ParquetFile(f"{sf_dir}/{table}.parquet").metadata
    total = 0
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            c = g.column(ci)
            if columns is None or c.path_in_schema in columns:
                total += c.total_uncompressed_size
    return total


def _round_col(t: pa.Table, col: str, digits: int) -> pa.Table:
    """Round via numpy, NOT pyarrow.compute.round: pc.round leaves
    1-ulp-off values unchanged (pc.round(122.94999999999999, 4) ==
    122.94999999999999), so a distributed float sum whose order lands
    one ulp below the decimal boundary hash-mismatches the DuckDB
    oracle's ROUND — a latent flake measured live on window_tumbling.
    np.round normalizes to the same nearest-double as Python/DuckDB."""
    import numpy as np

    i = t.schema.get_field_index(col)
    rounded = np.round(
        np.asarray(t.column(col).to_pylist(), dtype=np.float64), digits
    )
    return t.set_column(i, col, pa.array(rounded, pa.float64()))


# --- J2 analogue: broadcast join (small build side) ----------------------

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

def a1_collect_groups(sf_dir: str) -> rd.Dataset:
    """per order: sorted distinct part keys (candidate-set collection).

    Two-level: per-block Arrow distinct + orderkey-hash partition tag,
    then ONE vectorized call per coarse partition (lexsort + segment
    boundaries) instead of one Python map_groups call per order — same
    rows, 10^9 orders cost num_partitions calls, not 10^9.  partkeys is
    a CSV string, not list<int64>: engine-portable value hashing (list
    columns convert differently across pandas/duckdb/numpy)."""
    from ..stages.joins import default_join_partitions

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    n_parts = default_join_partitions()

    def local(t: pa.Table) -> pa.Table:
        t = t.group_by(["l_orderkey", "l_partkey"]).aggregate([])
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        part = (ok.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(n_parts)
        return t.append_column("__part", pa.array(part.astype(np.int64), pa.int64()))

    def collect_part(g: pa.Table) -> pa.Table:
        ok = g.column("l_orderkey").to_numpy(zero_copy_only=False)
        pk = g.column("l_partkey").to_numpy(zero_copy_only=False)
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        keep = np.empty(len(ok), dtype=bool)
        keep[0] = True
        keep[1:] = (ok[1:] != ok[:-1]) | (pk[1:] != pk[:-1])  # cross-block dups
        ok, pk = ok[keep], pk[keep]
        new = np.empty(len(ok), dtype=bool)
        new[0] = True
        new[1:] = ok[1:] != ok[:-1]
        starts = np.flatnonzero(new)
        ends = np.concatenate([starts[1:], [len(ok)]])
        pk_str = pk.astype(str)
        return pa.table(
            {
                "l_orderkey": pa.array(ok[starts], pa.int64()),
                "partkeys": pa.array(
                    [",".join(pk_str[s:e]) for s, e in zip(starts, ends)], pa.string()
                ),
                "n_parts": pa.array(ends - starts, pa.int64()),
            }
        )

    return (
        li.map_batches(local, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(collect_part, batch_format="pyarrow")
    )


# --- A3: frequency count --------------------------------------------------

def a3_pred_frequency(sf_dir: str) -> rd.Dataset:
    """events by type — the triple predicate-frequency pattern (S10).
    Per-block combiner first: the exchange moves one row per type per
    block, so a hot predicate never floods its reducer."""
    ev = _read(sf_dir, "events", ["event_type"])

    def partial(t: pa.Table) -> pa.Table:
        agg = t.group_by(["event_type"]).aggregate([("event_type", "count")])
        return agg.rename_columns(["event_type", "pn"])

    return (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("pn", alias_name="n"))
    )


# --- A5: multi-aggregate (TPC-H Q1 shape) ---------------------------------

def a5_aggregate_metrics(sf_dir: str) -> rd.Dataset:
    li = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        # per-block combiner: revenue column + one partial row per
        # (flag, status) per block before the exchange (TPC-H Q1 has 6
        # groups — without the combiner every lineitem row shuffles)
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        t = t.append_column("revenue", rev)
        agg = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [
                ("l_quantity", "sum"),
                ("revenue", "sum"),
                ("l_extendedprice", "sum"),
                ("l_quantity", "count"),
            ]
        )
        return agg.rename_columns(
            ["l_returnflag", "l_linestatus", "pqty", "prev", "pprice", "pn"]
        )

    def finish(t: pa.Table) -> pa.Table:
        t = t.append_column(
            "avg_price", pc.divide(t["sum_price"], pc.cast(t["n_rows"], pa.float64()))
        )
        return t.select(
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_revenue", "avg_price", "n_rows"]
        )

    out = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("pqty", alias_name="sum_qty"),
            Sum("prev", alias_name="sum_revenue"),
            Sum("pprice", alias_name="sum_price"),
            Sum("pn", alias_name="n_rows"),
        )
        .map_batches(finish, batch_format="pyarrow")
    )
    return out.map_batches(
        lambda t: _round_col(_round_col(_round_col(t, "sum_qty", 2), "sum_revenue", 2), "avg_price", 2),
        batch_format="pyarrow",
    )


# --- A7/O1: per-group argmax with deterministic tie-break ----------------

_A7_SORT = [
    ("o_totalprice", "descending"),
    ("o_orderkey", "descending"),
]


def a7_argmax_per_group(sf_dir: str) -> rd.Dataset:
    """per customer: their single highest-value order (tie -> highest
    orderkey) — the per-mention top-1 candidate pattern.

    Combiner shape: each batch first reduces to ONE candidate row per
    customer (vectorized Arrow sort + boundary mask), so the groupby
    shuffles at most uniq-keys-per-batch rows instead of every order;
    the per-group finalize is an Arrow sort-take (argmax is
    associative, so partial-then-final is exact)."""
    import numpy as np

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def partial_best(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("o_custkey", "ascending"), *_A7_SORT]
        )
        t = t.take(idx)
        keys = np.asarray(t.column("o_custkey").to_pylist())
        first = np.concatenate(([True], keys[1:] != keys[:-1]))
        return t.filter(pa.array(first))

    from ..stages.joins import default_join_partitions
    from ..stages.partition import part_column

    n_parts = default_join_partitions()

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, ["o_custkey"], n_parts))

    def best_part(group: pa.Table) -> pa.Table:
        # same boundary-mask argmax as partial_best, once per coarse
        # partition — no per-customer Python call
        group = group.drop_columns("__part")
        return partial_best(group)

    out = (
        orders.map_batches(partial_best, batch_format="pyarrow")
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(best_part, batch_format="pyarrow")
    )
    return out.map_batches(lambda t: _round_col(t, "o_totalprice", 2), batch_format="pyarrow")


# --- O1: global top-k -----------------------------------------------------

def o1_topk(sf_dir: str, k: int = 10) -> rd.Dataset:
    """Global top-k WITHOUT a global sort: per-block vectorized
    sort-take(k) partials (each block contributes <= k tiny rows), then
    one single-task merge over the n_blocks x k partial rows — the
    ``global_topk`` shape (stages/similarity.py) for the ungrouped case.
    A ``sort().limit(k)`` here would range-shuffle the whole orders
    table to keep 10 rows; this plan moves <= k rows per block.  (At
    10^6+ blocks, add one intermediate repartition level — same
    combinator, two tiers.)"""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def block_topk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t,
            sort_keys=[("o_totalprice", "descending"), ("o_orderkey", "descending")],
        )
        return t.take(idx[:k])

    top = (
        orders.map_batches(block_topk, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(block_topk, batch_format="pyarrow", batch_size=None)
    )
    return top.map_batches(lambda t: _round_col(t, "o_totalprice", 2), batch_format="pyarrow")


# --- D2: distinct ---------------------------------------------------------

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

def a9_rollup(sf_dir: str) -> rd.Dataset:
    """GROUP BY ROLLUP(l_returnflag, l_linestatus) — three grouping
    sets as three independent aggregates union-ed with 'ALL'
    placeholders; each aggregate pre-combines per block, so the three
    shuffles move a handful of rows each."""
    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])

    def finish(t: pa.Table, flag_all: bool, status_all: bool) -> pa.Table:
        n = t.num_rows
        cols = {
            "l_returnflag": (
                pa.array(["ALL"] * n, pa.string()) if flag_all else t["l_returnflag"]
            ),
            "l_linestatus": (
                pa.array(["ALL"] * n, pa.string()) if status_all else t["l_linestatus"]
            ),
            "n_rows": t["n_rows"],
            "sum_qty": t["sum_qty"],
        }
        return pa.table(cols)

    aggs = (Count(alias_name="n_rows"), Sum("l_quantity", alias_name="sum_qty"))
    both = li.groupby(["l_returnflag", "l_linestatus"]).aggregate(*aggs).map_batches(
        lambda t: finish(t, False, False), batch_format="pyarrow"
    )
    flag = li.groupby("l_returnflag").aggregate(*aggs).map_batches(
        lambda t: finish(t, False, True), batch_format="pyarrow"
    )
    total_row = li.aggregate(*aggs)  # dict: grand total
    grand = rd.from_arrow(
        pa.table(
            {
                "l_returnflag": pa.array(["ALL"], pa.string()),
                "l_linestatus": pa.array(["ALL"], pa.string()),
                "n_rows": pa.array([total_row["n_rows"]], pa.int64()),
                "sum_qty": pa.array([float(total_row["sum_qty"])], pa.float64()),
            }
        )
    )
    out = both.union(flag).union(grand)
    return out.map_batches(lambda t: _round_col(t, "sum_qty", 2), batch_format="pyarrow")


def a10_cube(sf_dir: str) -> rd.Dataset:
    """GROUP BY CUBE(l_returnflag, l_linestatus) — all four grouping
    sets as independent pre-combined aggregates union-ed with 'ALL'
    placeholders (the a9_rollup shape plus the status-only set); each
    aggregate's shuffle moves a handful of partial rows."""
    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])

    def finish(t: pa.Table, flag_all: bool, status_all: bool) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "l_returnflag": (
                    pa.array(["ALL"] * n, pa.string()) if flag_all else t["l_returnflag"]
                ),
                "l_linestatus": (
                    pa.array(["ALL"] * n, pa.string()) if status_all else t["l_linestatus"]
                ),
                "n_rows": t["n_rows"],
                "sum_qty": t["sum_qty"],
            }
        )

    aggs = (Count(alias_name="n_rows"), Sum("l_quantity", alias_name="sum_qty"))
    both = li.groupby(["l_returnflag", "l_linestatus"]).aggregate(*aggs).map_batches(
        lambda t: finish(t, False, False), batch_format="pyarrow"
    )
    flag = li.groupby("l_returnflag").aggregate(*aggs).map_batches(
        lambda t: finish(t, False, True), batch_format="pyarrow"
    )
    status = li.groupby("l_linestatus").aggregate(*aggs).map_batches(
        lambda t: finish(t, True, False), batch_format="pyarrow"
    )
    total_row = li.aggregate(*aggs)
    grand = rd.from_arrow(
        pa.table(
            {
                "l_returnflag": pa.array(["ALL"], pa.string()),
                "l_linestatus": pa.array(["ALL"], pa.string()),
                "n_rows": pa.array([total_row["n_rows"]], pa.int64()),
                "sum_qty": pa.array([float(total_row["sum_qty"])], pa.float64()),
            }
        )
    )
    out = both.union(flag).union(status).union(grand)
    return out.map_batches(lambda t: _round_col(t, "sum_qty", 2), batch_format="pyarrow")


def a11_median_price(sf_dir: str, q: float = 0.5) -> rd.Dataset:
    """EXACT per-group discrete quantile at scale: per-block value
    HISTOGRAMS (group_by (key, value) count — the combiner), one
    shuffle of (key, value, count) partials, then a vectorized
    cumulative-count scan per key segment.  Never collects a group's
    raw values anywhere — state is bounded by the value domain (prices
    have cent resolution), the honest exact-quantile shape when the
    domain is discrete.  Matches DuckDB ``quantile_disc`` (lower
    discrete quantile: element at 0-based rank floor((n-1)*q))."""
    from ..stages.joins import default_join_partitions
    from ..stages.partition import part_column, sorted_segments

    orders = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    n_parts = default_join_partitions()

    def local_hist(t: pa.Table) -> pa.Table:
        agg = t.group_by(["o_orderpriority", "o_totalprice"]).aggregate(
            [("o_totalprice", "count")]
        )
        agg = agg.rename_columns(["o_orderpriority", "o_totalprice", "pn"])
        return agg.append_column(
            "__part", part_column(agg, ["o_orderpriority"], n_parts)
        )

    def quantile_part(g: pa.Table) -> pa.Table:
        g = (
            g.drop_columns("__part")
            .group_by(["o_orderpriority", "o_totalprice"])
            .aggregate([("pn", "sum")])
            .rename_columns(["o_orderpriority", "o_totalprice", "n"])
        )
        t, starts, ends = sorted_segments(
            g, ["o_orderpriority"], extra_sort=[("o_totalprice", "ascending")]
        )
        counts = t.column("n").to_numpy(zero_copy_only=False)
        prices = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        keys, medians = [], []
        for s, e in zip(starts, ends):
            cum = np.cumsum(counts[s:e])
            target = int(np.floor((cum[-1] - 1) * q))  # 0-based rank
            keys.append(s)
            medians.append(prices[s + int(np.searchsorted(cum, target + 1))])
        return pa.table(
            {
                "o_orderpriority": t.column("o_orderpriority").take(pa.array(keys)),
                "median_price": pa.array(np.round(np.asarray(medians), 2), pa.float64()),
            }
        )

    return (
        orders.map_batches(local_hist, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(quantile_part, batch_format="pyarrow")
    )


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


def a14_string_agg(sf_dir: str) -> rd.Dataset:
    """Ordered STRING_AGG: per nation, the comma-joined alphabetically-
    sorted supplier names.  Keys are dimension-sized but the shape is
    the corpus-safe one anyway (CLAUDE.md rule): coarse partitions, ONE
    map_groups call per partition, sorted segments inside — the only
    Python loop is over distinct keys in the partition.  Keys emitted
    int64 (groupby upcast rule)."""
    from ..stages.joins import default_join_partitions
    from ..stages.partition import part_column, sorted_segments

    sup = _read(sf_dir, "supplier", ["s_nationkey", "s_name"])
    n_parts = default_join_partitions()

    def tag(t: pa.Table) -> pa.Table:
        t = t.set_column(
            t.schema.get_field_index("s_nationkey"),
            "s_nationkey",
            t.column("s_nationkey").cast(pa.int64()),
        )
        return t.append_column("__part", part_column(t, ["s_nationkey"], n_parts))

    def join_part(g: pa.Table) -> pa.Table:
        t, starts, ends = sorted_segments(
            g.drop_columns("__part"),
            ["s_nationkey"],
            extra_sort=[("s_name", "ascending")],
        )
        names = t.column("s_name").to_pylist()
        keys = t.column("s_nationkey").take(pa.array(starts))
        joined = [",".join(names[s:e]) for s, e in zip(starts, ends)]
        return pa.table(
            {"s_nationkey": keys, "names": pa.array(joined, pa.string())}
        )

    return (
        sup.map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(join_part, batch_format="pyarrow")
    )


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

def doc_fingerprints(sf_dir: str) -> rd.Dataset:
    """Per-document content fingerprint (md5 hex — DuckDB-oracle-able;
    the engine's internal 64-bit fp lives in stages.textstats).  A
    stateless map: the canonical first step of exact dedup / change
    detection at corpus scale."""
    import hashlib

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "fp_md5": pa.array(
                    [
                        hashlib.md5(x.encode("utf-8")).hexdigest()
                        for x in t.column("text").to_pylist()
                    ],
                    pa.string(),
                ),
            }
        )

    return docs.map_batches(fp, batch_format="pyarrow")


# --- documents: exact dedup + token stats --------------------------------

def dedup_exact_docs(sf_dir: str) -> rd.Dataset:
    from ..stages.dedup import exact_dedup

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return exact_dedup(docs).select_columns(["doc_id", "text"])


def dedup_ngram_pairs(sf_dir: str) -> rd.Dataset:
    """Exact word-trigram Jaccard near-dup pairs over documents —
    the DuckDB-oracled exact sibling of the MinHash path (inverted
    index, two coarse shuffles, no all-pairs)."""
    from ..stages.dedup import ngram_jaccard_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return ngram_jaccard_pairs(docs, n=3, threshold=0.8)


def text_token_stats(sf_dir: str) -> rd.Dataset:
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens_ws": pa.array([len(x.split()) for x in texts], pa.int64()),
                "n_chars_seen": pa.array([len(x) for x in texts], pa.int64()),
            }
        )

    return docs.map_batches(stats, batch_format="pyarrow")


# --- scalar functions: JSON, regex, distinct-count -----------------------

def json_extract_props(sf_dir: str) -> rd.Dataset:
    """JSON scalar extraction (SURVEY §2.8): events.props -> int field k."""
    import json

    ev = _read(sf_dir, "events", ["event_id", "props"])

    def extract(t: pa.Table) -> pa.Table:
        ks = [json.loads(p)["k"] for p in t.column("props").to_pylist()]
        return pa.table(
            {"event_id": t.column("event_id"), "k": pa.array(ks, pa.int64())}
        )

    return ev.map_batches(extract, batch_format="pyarrow")


def o3_regex_scan(sf_dir: str) -> rd.Dataset:
    """O3: regex scan over a name column (the Lucene regex-query
    completeness probe, DicoProcessingNEL.java:349-378)."""
    part = _read(sf_dir, "part", ["p_partkey", "p_name"])
    return part.map_batches(
        lambda t: t.filter(pc.match_substring_regex(t["p_name"], r"(red|blue)")),
        batch_format="pyarrow",
    )


def distinct_count_per_group(sf_dir: str) -> rd.Dataset:
    """count(distinct l_partkey) per supplier — EXACT, two-level: each
    block emits its distinct (key, value) pairs (Arrow group_by, the
    combiner), the shuffle moves pairs not rows, and each coarse
    key-hash partition counts per-key uniques with one vectorized
    segment sweep.  For hot keys with unbounded cardinality use the
    HLL variant (``approx_distinct_count_per_group``)."""
    from ..stages.joins import default_join_partitions
    from ..stages.partition import part_column, sorted_segments

    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])
    n_parts = default_join_partitions()

    def local(t: pa.Table) -> pa.Table:
        t = t.group_by(["l_suppkey", "l_partkey"]).aggregate([])
        return t.append_column("__part", part_column(t, ["l_suppkey"], n_parts))

    def count_part(g: pa.Table) -> pa.Table:
        g = g.drop_columns("__part").group_by(["l_suppkey", "l_partkey"]).aggregate([])
        t, starts, ends = sorted_segments(g, ["l_suppkey"])
        return pa.table(
            {
                "l_suppkey": t.column("l_suppkey").take(pa.array(starts)),
                "n_parts": pa.array(ends - starts, pa.int64()),
            }
        )

    return (
        li.map_batches(local, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(count_part, batch_format="pyarrow")
    )


def approx_distinct_count_per_group(sf_dir: str, tolerance: float = 0.10) -> rd.Dataset:
    """Sketch variant of ``distinct_count_per_group``, DRIVER-ORACLED
    via the approx_top_terms pattern: run the HyperLogLog per key
    (bounded 4 KiB state through the shuffle regardless of key heat,
    ~1.6% standard error at p=12) AND the exact distinct count, join
    them, and emit the EXACT counts plus an ``hll_ok`` flag asserting
    every key's sketch lands within ``tolerance`` of exact (measured
    max 2.4% on this fixture; the sketch is fully deterministic —
    blake2b hashing — so this cannot flake).  The oracle computes the
    same exact counts with TRUE.  Merge-invariance and the error
    envelope are additionally pinned by tests/test_hll.py."""
    from ..stages.aggregates import hll_distinct_per_group
    from ..stages.joins import hash_join, staged_nonempty

    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])
    approx = hll_distinct_per_group(li, "l_suppkey", "l_partkey", alias="n_approx")

    def exact_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_suppkey", "l_partkey"]).aggregate([])
        return g

    exact = (
        li.map_batches(exact_partial, batch_format="pyarrow", batch_size=None)
        .groupby(["l_suppkey", "l_partkey"])
        .count()
        .groupby("l_suppkey")
        .count()
        .map_batches(
            lambda t: pa.table(
                {
                    "l_suppkey": t.column("l_suppkey"),
                    "n_parts": t.column("count()").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )
    joined = hash_join(staged_nonempty(exact), staged_nonempty(approx), on=["l_suppkey"])

    def check(t: pa.Table) -> pa.Table:
        ex = t.column("n_parts").to_numpy(zero_copy_only=False).astype(np.float64)
        ap = t.column("n_approx").to_numpy(zero_copy_only=False).astype(np.float64)
        ok = bool(np.all(np.abs(ap - ex) <= tolerance * np.maximum(ex, 1.0)))
        return pa.table(
            {
                "l_suppkey": t.column("l_suppkey"),
                "n_parts": t.column("n_parts"),
                # per-block flag; the final AND happens below
                "hll_ok": pa.array([ok] * t.num_rows, pa.bool_()),
            }
        )

    checked = joined.map_batches(check, batch_format="pyarrow", batch_size=None).materialize()
    from ray.data.aggregate import Min

    all_ok = bool(checked.aggregate(Min("hll_ok"))["min(hll_ok)"])
    return checked.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("hll_ok"),
            "hll_ok",
            pa.array([all_ok] * t.num_rows, pa.bool_()),
        ),
        batch_format="pyarrow",
    )


# --- embeddings: exact knn ------------------------------------------------

def knn_dot_topk(sf_dir: str, n_queries: int = 3, k: int = 5) -> pa.Table:
    """top-k by DOT PRODUCT for the first ``n_queries`` vectors; returns
    (query_id, rank, vec_id).  Dot product (not cosine) keeps the oracle
    comparison integer-rank-only and float-rounding-proof; ties broken
    by vec_id."""
    # query vectors only (row-group-pruned read; n_queries rows reach
    # the driver, never the corpus — query_id == vec_id < n_queries)
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", n_queries)],
    )
    all_ids = np.asarray(t.column("vec_id").to_pylist())
    vecs = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    order = np.argsort(all_ids)
    queries = vecs[order]
    query_ids = all_ids[order].tolist()

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    # brute-force DOT top-k (no normalization): reuse local-topk pattern
    import ray

    q_ref = ray.put(queries.astype(np.float64))

    def local(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        m = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
        sims = qm @ m.T
        kk = min(k, sims.shape[1])
        qs, vs, ss = [], [], []
        for qi in range(sims.shape[0]):
            idx = np.argpartition(-sims[qi], kk - 1)[:kk]
            qs.extend([qi] * kk)
            vs.extend(ids[idx].tolist())
            ss.extend(sims[qi, idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(qs, pa.int64()),
                "vec_id": pa.array(vs, pa.int64()),
                "dot": pa.array(ss, pa.float64()),
            }
        )

    from ..stages.similarity import global_topk

    partials = emb.map_batches(local, batch_format="pyarrow")
    merged = global_topk(partials, k, score_col="dot", rank_base=1)
    # map positional qi back to the real query vec_id (identity here,
    # since query_id == vec_id for vec_id < n_queries, but keep it
    # explicit for non-prefix query selections)
    qids = pa.array(
        [int(query_ids[qi]) for qi in merged.column("query_id").to_pylist()],
        pa.int64(),
    )
    return merged.set_column(0, "query_id", qids).drop_columns("dot")


# --- webtext curation queries (stages/webtext.py) -------------------------

def wq_repetition_stats(sf_dir: str) -> rd.Dataset:
    """Per-doc word-repetition metrics (the SQL-checkable subset of the
    Gopher rules: distinct-word ratio + mean word length)."""
    from ..stages.webtext import RepetitionStats

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = docs.map_batches(
        RepetitionStats, batch_format="pyarrow", batch_size=None,
        concurrency=(1, 8),
    ).select_columns(["doc_id", "n_words", "distinct_word_ratio", "mean_word_len"])

    def rnd(t: pa.Table) -> pa.Table:
        t = _round_col(t, "distinct_word_ratio", 6)
        return _round_col(t, "mean_word_len", 6)

    return out.map_batches(rnd, batch_format="pyarrow")


def decontaminate_docs(sf_dir: str) -> rd.Dataset:
    """GPT-3-style n-gram decontamination flags: docs with
    ``doc_id % 50 == 0`` play the benchmark; every other doc is flagged
    iff it shares a word 4-gram with any benchmark doc.  Eval grams are
    broadcast once (``ray.put``); the corpus side streams."""
    from ..stages.webtext import decontaminate

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def split(keep_eval: bool):
        def f(t: pa.Table) -> pa.Table:
            is_eval = t.column("doc_id").to_numpy() % 50 == 0
            return t.filter(pa.array(is_eval if keep_eval else ~is_eval))

        return f

    eval_ds = docs.map_batches(split(True), batch_format="pyarrow")
    corpus = docs.map_batches(split(False), batch_format="pyarrow")
    return decontaminate(corpus, eval_ds, n=4).select_columns(
        ["doc_id", "contaminated"]
    )


def pii_redact_docs(sf_dir: str) -> rd.Dataset:
    """PII scrub over documents, DRIVER-ORACLED: the synthetic corpus
    carries no PII (verified at every sf), so the query first INJECTS a
    deterministic email + IPv4 per doc (derived from doc_id — the SQL
    oracle derives the identical string), then runs the real
    ``PIIRedactor`` actor stage.  The oracle replays the injection and
    the email/IP redaction with RE2 ``regexp_replace`` — so redaction
    semantics, counts, and the phone pattern's zero false positives on
    the full corpus are all hash-gated.  (The phone regex itself uses
    lookarounds RE2 lacks; its adversarial cases are pinned in
    tests/test_webtext.py.)"""
    from ..stages.webtext import PIIRedactor

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def inject(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        texts = t.column("text").to_pylist()
        out = [
            f"{txt} contact user{d}@example.com from 10.0.{d % 200}.7 ok"
            for txt, d in zip(texts, did)
        ]
        return pa.table({"doc_id": t.column("doc_id"), "text": pa.array(out, pa.string())})

    return docs.map_batches(inject, batch_format="pyarrow", batch_size=None).map_batches(
        PIIRedactor, batch_format="pyarrow", batch_size=None, concurrency=(1, 8)
    )


def gopher_filter_docs(sf_dir: str) -> rd.Dataset:
    """Docs surviving the full Gopher repetition ruleset (rows-only;
    per-metric math is pinned by the naive reference in tests)."""
    from ..stages.webtext import gopher_filter

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return gopher_filter(docs)


def wq_source_quality(sf_dir: str) -> rd.Dataset:
    """Per-source (domain-level) quality rollup: doc count + mean
    distinct-word ratio — block-partial sums, then a 20-key groupby."""
    from ..stages.webtext import _words

    docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def partial(t: pa.Table) -> pa.Table:
        ratios = []
        for x in t.column("text").to_pylist():
            ws = _words(x or "")
            ratios.append(len(set(ws)) / len(ws) if ws else 0.0)
        part = pa.table(
            {
                "source": t.column("source"),
                "sum_ratio": pa.array(ratios, pa.float64()),
                "n_docs": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )
        agg = part.group_by(["source"]).aggregate(
            [("sum_ratio", "sum"), ("n_docs", "sum")]
        )
        return agg.rename_columns(["source", "sum_ratio", "n_docs"])

    agg = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("sum_ratio", alias_name="sum_ratio"), Sum("n_docs", alias_name="n_docs"))
    )

    def finish(t: pa.Table) -> pa.Table:
        avg = np.round(
            np.asarray(t.column("sum_ratio").to_pylist())
            / np.asarray(t.column("n_docs").to_pylist()),
            6,
        )
        return pa.table(
            {
                "source": t.column("source"),
                "n_docs": t.column("n_docs"),
                "avg_distinct_ratio": pa.array(avg, pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def c4_span_dedup(sf_dir: str, n: int = 5) -> rd.Dataset:
    """C4-style repeated-span removal over the document corpus: every
    occurrence of a non-overlapping ``n``-word span shared by >= 2
    distinct docs is deleted; spans re-joined in order (lowercase
    token-normalized text, matching the oracle's reconstruction)."""
    from ..stages.webtext import span_dedup

    # the two passes (hot-span bank, rewrite) each consume the corpus;
    # stage it once so the second pass reads object-store blocks, not
    # parquet again (swap for a checkpoint_dir parquet stage at scale)
    docs = _read(sf_dir, "documents", ["doc_id", "text"]).materialize()
    return span_dedup(docs, n=n, min_docs=2)


def a12_corr(sf_dir: str) -> rd.Dataset:
    """Per-group Pearson correlation (price vs quantity) from six-sum
    block partials — the no-second-pass combinable moment plan."""
    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                "k": t.column("l_returnflag").to_pylist(),
                "x": t.column("l_extendedprice").to_numpy(zero_copy_only=False),
                "y": t.column("l_quantity").to_numpy(zero_copy_only=False),
            }
        )
        df["xx"] = df.x * df.x
        df["yy"] = df.y * df.y
        df["xy"] = df.x * df.y
        df["n"] = 1
        g = df.groupby("k", as_index=False).sum()
        return pa.table(
            {
                "l_returnflag": pa.array(g.k, pa.string()),
                "sx": pa.array(g.x, pa.float64()),
                "sy": pa.array(g.y, pa.float64()),
                "sxx": pa.array(g.xx, pa.float64()),
                "syy": pa.array(g.yy, pa.float64()),
                "sxy": pa.array(g.xy, pa.float64()),
                "n": pa.array(g.n, pa.int64()),
            }
        )

    agg = (
        li.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("l_returnflag")
        .aggregate(
            Sum("sx", alias_name="sx"), Sum("sy", alias_name="sy"),
            Sum("sxx", alias_name="sxx"), Sum("syy", alias_name="syy"),
            Sum("sxy", alias_name="sxy"), Sum("n", alias_name="n"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy().astype(np.float64)
        sx, sy = t.column("sx").to_numpy(), t.column("sy").to_numpy()
        sxx, syy = t.column("sxx").to_numpy(), t.column("syy").to_numpy()
        sxy = t.column("sxy").to_numpy()
        num = n * sxy - sx * sy
        den = np.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        corr = np.round(np.where(den > 0, num / np.maximum(den, 1e-300), 0.0), 6)
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "corr_price_qty": pa.array(corr, pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


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


def a13_pivot(sf_dir: str) -> rd.Dataset:
    """Pivot via conditional aggregation (status domain is fixed):
    per-returnflag quantity split across linestatus columns — block
    partials of the conditional sums, then a 3-key groupby."""
    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        qty = t.column("l_quantity")
        cols = {"l_returnflag": t.column("l_returnflag")}
        for st in ("O", "F"):
            mask = pc.equal(t.column("l_linestatus"), st)
            cols[f"qty_{st}"] = pc.if_else(mask, qty, pa.scalar(0.0))
        part = pa.table(cols)
        agg = part.group_by(["l_returnflag"]).aggregate(
            [("qty_O", "sum"), ("qty_F", "sum")]
        )
        return agg.rename_columns(["l_returnflag", "qty_O", "qty_F"])

    out = (
        li.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("l_returnflag")
        .aggregate(Sum("qty_O", alias_name="qty_O"), Sum("qty_F", alias_name="qty_F"))
    )

    def rnd(t: pa.Table) -> pa.Table:
        t = _round_col(t, "qty_O", 2)
        return _round_col(t, "qty_F", 2)

    return out.map_batches(rnd, batch_format="pyarrow")


def o10_sample_hash(sf_dir: str, rate: float = 0.1) -> rd.Dataset:
    """Deterministic hash sampling — the distributed-safe sampling
    shape (no RNG state, partition-invariant, reproducible across
    cluster sizes): keep doc iff Knuth-hash(doc_id) < rate * 2^32."""
    docs = _read(sf_dir, "documents", ["doc_id", "source"])
    thresh = np.uint64(int(rate * (1 << 32)))

    def samp(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(2654435761)) % np.uint64(1 << 32)
        return t.filter(pa.array(h < thresh))

    return docs.map_batches(samp, batch_format="pyarrow", batch_size=None)


def approx_quantile_price(sf_dir: str) -> pa.Table:
    """Histogram-sketch quantiles of l_extendedprice, DRIVER-ORACLED
    via the sketch's own hard bound: the sketch answer (upper edge of
    the bin where cumulative count crosses ceil(q*N)) is within ONE BIN
    WIDTH of the exact order statistic at rank ceil(q*N)-1.  The query
    runs the sketch AND exact distributed selection
    (stages/selection.select_order_stats), asserts the bound, and emits
    the EXACT discrete quantiles plus ``bound_ok`` — the DuckDB oracle
    is ``quantile_disc`` (same ceil(q*N)-1 rank convention, probed)
    with TRUE."""
    import math

    from ray.data.aggregate import Count, Max, Min

    from ..stages.aggregates import approx_quantiles
    from ..stages.selection import select_order_stats

    li = _read(sf_dir, "lineitem", ["l_extendedprice"])
    qs = [0.5, 0.9, 0.99]
    n_bins = 4096
    got = approx_quantiles(li, "l_extendedprice", qs, n_bins=n_bins)
    stats = li.aggregate(Min("l_extendedprice"), Max("l_extendedprice"), Count())
    lo, hi = stats["min(l_extendedprice)"], stats["max(l_extendedprice)"]
    n = stats["count()"]
    bin_w = (float(hi) - float(lo)) / n_bins
    ranks = {q: max(0, math.ceil(q * n) - 1) for q in qs}
    exact = select_order_stats(li, "l_extendedprice", sorted(set(ranks.values())))
    ok = all(
        abs(got[q] - exact[ranks[q]]) <= bin_w + 1e-9 for q in qs
    )
    return pa.table(
        {
            "quantile": pa.array(qs, pa.float64()),
            "price": pa.array(
                [round(exact[ranks[q]], 4) for q in qs], pa.float64()
            ),
            "bound_ok": pa.array([ok] * len(qs), pa.bool_()),
        }
    )


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


def f1_vector_norm(sf_dir: str) -> rd.Dataset:
    """L2 norm of the embedding list column — zero-copy Arrow list
    handling: flatten once, cast float32->float64 (the same cast the
    oracle applies BEFORE squaring), square, segment-sum via a prefix
    sum differenced at the list offsets (exact for empty segments
    anywhere — reduceat's clamped-index variant corrupted the segment
    PRECEDING a trailing empty list).  No per-row Python."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def norm(t: pa.Table) -> pa.Table:
        col = t.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = col.values.to_numpy(zero_copy_only=False)
        # offsets index the FULL child buffer; slice to this array's
        # window so sliced ListArrays stay correct (and cheap).
        base = int(offsets[0]) if len(offsets) else 0
        vals = flat[base : int(offsets[-1]) if len(offsets) else 0].astype(np.float64)
        sq = vals * vals
        cum = np.concatenate([[0.0], np.cumsum(sq)])
        sums = cum[offsets[1:] - base] - cum[offsets[:-1] - base]
        return pa.table(
            {
                "vec_id": t.column("vec_id"),
                "norm": pa.array(np.round(np.sqrt(sums), 4), pa.float64()),
            }
        )

    return emb.map_batches(norm, batch_format="pyarrow", batch_size=None)


def _stratum_topk(
    ds: rd.Dataset,
    stratum: str,
    order_col: str,
    k: int,
    out_cols: list[str],
) -> rd.Dataset:
    """Shared per-stratum top-k shuffle shape (o5): per-block partial
    top-k by (stratum, order_col asc, doc_id asc), <= k rows per stratum
    per block through ONE stratum-hash shuffle, identical final sweep."""
    from ..stages.joins import default_join_partitions
    from ..stages.partition import part_column

    n_parts = default_join_partitions()

    def topk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t,
            sort_keys=[
                (stratum, "ascending"),
                (order_col, "ascending"),
                ("doc_id", "ascending"),
            ],
        )
        t = t.take(idx)
        src = np.asarray(t.column(stratum).to_pylist())
        n = len(src)
        new = np.empty(n, dtype=bool)
        if n:
            new[0] = True
            new[1:] = src[1:] != src[:-1]
        starts = np.flatnonzero(new)
        seg_id = np.cumsum(new) - 1
        rank = np.arange(n, dtype=np.int64) - starts[seg_id]
        return t.filter(pa.array(rank < k))

    def partial(t: pa.Table) -> pa.Table:
        t = topk(t)
        return t.append_column("__part", part_column(t, [stratum], n_parts))

    def final(g: pa.Table) -> pa.Table:
        return topk(g.drop_columns("__part")).select(out_cols)

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(final, batch_format="pyarrow")
    )


def o16_stratified_sample(sf_dir: str, k: int = 20) -> rd.Dataset:
    """Deterministic stratified sampling: per source, the k docs with
    the smallest Knuth multiplicative hash — partition-invariant,
    RNG-free, reproducible across cluster sizes, and SQL-expressible
    (so it is oracled, unlike seeded-RNG sampling)."""
    docs = _read(sf_dir, "documents", ["doc_id", "source"])

    def with_hash(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(2654435761)) % np.uint64(1 << 32)
        return t.append_column("h", pa.array(h.astype(np.int64), pa.int64()))

    hashed = docs.map_batches(with_hash, batch_format="pyarrow", batch_size=None)
    return _stratum_topk(hashed, "source", "h", k, ["doc_id", "source"])


def o17_weighted_sample(sf_dir: str, k: int = 10) -> rd.Dataset:
    """Weight-proportional k-sample per source WITHOUT RNG state
    (Efraimidis-Spirakis A-ES with a hash in place of the uniform
    draw): key = -ln(u)/w, keep the k smallest keys per stratum.
    Deterministic, partition-invariant, mergeable (it IS a top-k), and
    SQL-expressible — the distributed-safe analogue of weighted
    reservoir sampling (cf. 'Streaming Weighted Sampling over Join
    Queries', EDBT 2023).  Docs weighted by length (n_chars)."""
    docs = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def with_key(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["n_chars"], 0))
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(2654435761)) % np.uint64(1 << 32)
        u = (h.astype(np.float64) + 0.5) / float(1 << 32)
        w = t.column("n_chars").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "source": t.column("source"),
                "key": pa.array(-np.log(u) / w, pa.float64()),
            }
        )

    keyed = docs.map_batches(with_key, batch_format="pyarrow", batch_size=None)
    return _stratum_topk(keyed, "source", "key", k, ["doc_id", "source"])


def text_unigram_logprob(sf_dir: str) -> rd.Dataset:
    """Per-doc mean unigram log-probability under the corpus's own
    unigram LM — the distributed analogue of CCNet-style LM quality
    filtering (docs far below the corpus's typical score are
    boilerplate/noise candidates).  Plan: shared tokenizer
    (`_doc_term_rows`), vocabulary counts via per-block partials + one
    term groupby, ONE term-hash shuffle join back to the term rows,
    per-row normalized contributions, one doc groupby sum.  Vocabulary
    is corpus-sized throughout — never a broadcast."""
    from ray.data.aggregate import Sum

    from ..stages.joins import hash_join, staged_nonempty

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    term_rows = docs.map_batches(
        _doc_term_rows, batch_format="pyarrow", batch_size=None
    ).materialize()  # three consumers (total, vocab counts, join probe)

    total = int(term_rows.aggregate(Sum("tfc"))["sum(tfc)"])
    if total == 0:
        return term_rows.select_columns(["doc_id"])

    def vc_partial(t: pa.Table) -> pa.Table:
        c = t.group_by("term").aggregate([("tfc", "sum")])
        return pa.table(
            {"term": c.column("term"), "cnt": c.column("tfc_sum").cast(pa.int64())}
        )

    vocab = (
        term_rows.map_batches(vc_partial, batch_format="pyarrow", batch_size=None)
        .groupby("term")
        .sum("cnt")
        .map_batches(
            lambda t: t.rename_columns(["term", "cnt"]), batch_format="pyarrow"
        )
    )
    joined = hash_join(term_rows, staged_nonempty(vocab), on=["term"])

    def contrib(t: pa.Table) -> pa.Table:
        tfc = t.column("tfc").to_numpy(zero_copy_only=False).astype(np.float64)
        dlen = t.column("dlen").to_numpy(zero_copy_only=False).astype(np.float64)
        cnt = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.float64)
        c = (tfc * np.log(cnt / total)) / dlen
        return pa.table(
            {"doc_id": t.column("doc_id"), "c": pa.array(c, pa.float64())}
        )

    return (
        joined.map_batches(contrib, batch_format="pyarrow", batch_size=None)
        .groupby("doc_id")
        .sum("c")
        .map_batches(
            lambda t: pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "logprob": pc.round(t.column("sum(c)"), 4),
                }
            ),
            batch_format="pyarrow",
        )
    )


def text_ppl_buckets(sf_dir: str) -> rd.Dataset:
    """CCNet-style perplexity bucketing (Wenzek et al. 2019): split the
    corpus into head / middle / tail by terciles of the per-doc LM
    score (here the oracled `text_unigram_logprob`; higher logprob =
    lower perplexity = head).  Cuts are DISCRETE order statistics of
    the 4dp-rounded score found by the distributed selection machinery
    (`stages/selection.select_order_stats` — never collects the
    column), so both sides bucket by comparing against an actual data
    value and ties land in the same bucket deterministically.  Head
    target size = ceil(n/3); value ties at a cut can only GROW a
    bucket, identically on both sides."""
    from ..stages.selection import select_order_stats

    lp = text_unigram_logprob(sf_dir).materialize()
    n = int(lp.count())
    if n == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "logprob": pa.array([], pa.float64()),
                    "bucket": pa.array([], pa.string()),
                }
            )
        )
    h = -(-n // 3)  # ceil(n/3)
    r_head = max(n - h, 0)  # 0-based ascending rank of the head cut
    r_mid = max(n - 2 * h, 0)
    stats = select_order_stats(lp, "logprob", sorted({r_head, r_mid}))
    c_head, c_mid = stats[r_head], stats[r_mid]

    def bucket(t: pa.Table) -> pa.Table:
        v = t.column("logprob").to_numpy(zero_copy_only=False)
        b = np.where(v >= c_head, "head", np.where(v >= c_mid, "middle", "tail"))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "logprob": t.column("logprob"),
                "bucket": pa.array(b.tolist(), pa.string()),
            }
        )

    return lp.map_batches(bucket, batch_format="pyarrow", batch_size=None)


def text_bm25_topk(sf_dir: str, k: int = 3, k1: float = 1.2, b: float = 0.75) -> rd.Dataset:
    """BM25 (Robertson; Lucene-style non-negative idf) with per-doc
    top-k terms — TF-IDF's production sibling.  Same plan shape as
    ``text_tfidf_topk`` (shared ``_doc_term_rows`` tokenizer, one
    term-hash shuffle for df, o5 partial top-k), plus one scalar:
    avgdl.  The per-doc (dlen, is-first-row) attributes are stamped as
    ROW columns inside the tokenizer map — where each doc is provably
    whole — so avgdl is a plain row-level Sum that stays exact even if
    Ray's dynamic block splitting later cuts a doc's term rows across
    blocks (a per-block np.unique would double-count straddlers).
    Arithmetic is ordered exactly as the SQL oracle writes it so both
    engines produce bit-identical doubles from identical inputs."""
    from ray.data.aggregate import Sum

    from ..stages.joins import default_join_partitions, hash_join, staged_nonempty
    from ..stages.partition import part_column

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = docs.count()

    def term_rows_fn(t: pa.Table) -> pa.Table:
        out = _doc_term_rows(t)
        d = out.column("doc_id").to_numpy(zero_copy_only=False)
        fst = np.zeros(len(d), dtype=bool)
        fst[np.unique(d, return_index=True)[1]] = True
        dlen = out.column("dlen").to_numpy(zero_copy_only=False)
        return out.append_column(
            "dlen_fst", pa.array(np.where(fst, dlen, 0), pa.int64())
        ).append_column("fst", pa.array(fst.astype(np.int64), pa.int64()))

    term_rows = docs.map_batches(
        term_rows_fn, batch_format="pyarrow", batch_size=None
    ).materialize()  # three consumers (avgdl, df, join probe)

    agg = term_rows.aggregate(Sum("dlen_fst"), Sum("fst"))
    avgdl = agg["sum(dlen_fst)"] / agg["sum(fst)"]
    # lazy projection off the materialized parent — re-runs per
    # consumer but never re-tokenizes
    term_rows = term_rows.drop_columns(["dlen_fst", "fst"])

    def df_partial(t: pa.Table) -> pa.Table:
        c = t.group_by("term").aggregate([("term", "count")])
        return pa.table(
            {"term": c.column("term"), "n": c.column("term_count").cast(pa.int64())}
        )

    df_tbl = (
        term_rows.map_batches(df_partial, batch_format="pyarrow", batch_size=None)
        .groupby("term")
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns(["term", "dfc"]), batch_format="pyarrow"
        )
    )
    staged_df = staged_nonempty(df_tbl)
    if staged_df is None:
        return term_rows
    joined = hash_join(term_rows, staged_df, on=["term"])

    def score(t: pa.Table) -> pa.Table:
        tfc = t.column("tfc").to_numpy(zero_copy_only=False).astype(np.float64)
        dlen = t.column("dlen").to_numpy(zero_copy_only=False).astype(np.float64)
        dfc = t.column("dfc").to_numpy(zero_copy_only=False).astype(np.float64)
        idf = np.log((n_docs - dfc + 0.5) / (dfc + 0.5) + 1)
        bm25 = (idf * (tfc * (k1 + 1))) / (
            tfc + k1 * ((1 - b) + b * dlen / avgdl)
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "term": t.column("term"),
                "bm25": pa.array(bm25, pa.float64()),
            }
        )

    scored = joined.map_batches(score, batch_format="pyarrow", batch_size=None)
    n_parts = default_join_partitions()

    def topk(t: pa.Table, emit_rank: bool) -> pa.Table:
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("doc_id", "ascending"),
                ("bm25", "descending"),
                ("term", "ascending"),
            ],
        )
        t = t.take(idx)
        keys = t.column("doc_id").to_numpy(zero_copy_only=False)
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
        t = topk(t, emit_rank=False)
        return t.append_column("__part", part_column(t, ["doc_id"], n_parts))

    def final(g: pa.Table) -> pa.Table:
        t = topk(g.drop_columns("__part"), emit_rank=True)
        return _round_col(t, "bm25", 4)

    return (
        scored.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(final, batch_format="pyarrow")
    )


def text_tfidf_topk(
    sf_dir: str, k: int = 3, checkpoint_dir: str | None = None
) -> rd.Dataset:
    """Distributed TF-IDF with per-doc top-k terms — the IR scoring
    pass a corpus pipeline runs before indexing/filtering:

    - tokenize+count per block (compiled ASCII-whitespace split — the
      SAME explicit class as the SQL oracle's regex, so neither side
      inherits its engine's \\s semantics), emitting distinct
      (doc_id, term, tf_count, doc_len) rows;
    - document frequency = ``groupby(term).count()`` over those rows
      (already distinct per doc-term);
    - one term-hash shuffle joins df back to the term rows (vocabulary
      is corpus-sized: a real join, never a broadcast);
    - per-doc top-k by (tfidf desc, term asc) with the o5 partial
      top-k shape — <= k rows per doc per block through the shuffle.

    The token table feeds two consumers (df aggregate + join probe), so
    it stages once — in the object store by default, or as partitioned
    parquet under ``checkpoint_dir`` (the curation option) beyond
    object-store capacity.  The corpus doc count rides WITH the token
    pass as one sentinel row per block (doc_id -1), so no separate
    counting scan of the input ever runs."""
    from ..stages.joins import default_join_partitions, hash_join, staged_nonempty
    from ..stages.partition import part_column

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def rows_plus_count(t: pa.Table) -> pa.Table:
        out = _doc_term_rows(t)
        sentinel = pa.table(
            {
                "doc_id": pa.array([-1], pa.int64()),
                "term": pa.array([""], pa.string()),
                "tfc": pa.array([t.num_rows], pa.int64()),
                "dlen": pa.array([0], pa.int64()),
            }
        ).cast(out.schema)
        return pa.concat_tables([sentinel, out])

    staged = docs.map_batches(
        rows_plus_count, batch_format="pyarrow", batch_size=None
    )
    if checkpoint_dir is not None:
        staged.write_parquet(checkpoint_dir)
        staged = rd.read_parquet(checkpoint_dir)
    else:
        staged = staged.materialize()  # two consumers (df + join probe)
    # doc count from the staged sentinels: a cheap pass over in-memory
    # (or checkpointed) blocks, never a second scan of the raw corpus
    n_docs = staged.filter(expr="doc_id < 0").sum("tfc") or 0
    term_rows = staged.filter(expr="doc_id >= 0")

    def df_partial(t: pa.Table) -> pa.Table:
        # rows are distinct (doc, term): per-block pre-combine so the df
        # shuffle moves one row per (block, term), not per (doc, term)
        c = t.group_by("term").aggregate([("term", "count")])
        return pa.table(
            {"term": c.column("term"), "n": c.column("term_count").cast(pa.int64())}
        )

    df_tbl = (
        term_rows.map_batches(df_partial, batch_format="pyarrow", batch_size=None)
        .groupby("term")
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns(["term", "dfc"]), batch_format="pyarrow"
        )
    )
    staged_df = staged_nonempty(df_tbl)
    if staged_df is None:  # empty corpus
        return term_rows  # zero rows, stable schema
    joined = hash_join(term_rows, staged_df, on=["term"])

    def score(t: pa.Table) -> pa.Table:
        tf = t.column("tfc").to_numpy(zero_copy_only=False) / t.column(
            "dlen"
        ).to_numpy(zero_copy_only=False)
        idf = np.log(n_docs / t.column("dfc").to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "term": t.column("term"),
                "tfidf": pa.array(tf * idf, pa.float64()),
            }
        )

    scored = joined.map_batches(score, batch_format="pyarrow", batch_size=None)
    n_parts = default_join_partitions()

    def topk(t: pa.Table, emit_rank: bool) -> pa.Table:
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("doc_id", "ascending"),
                ("tfidf", "descending"),
                ("term", "ascending"),
            ],
        )
        t = t.take(idx)
        keys = t.column("doc_id").to_numpy(zero_copy_only=False)
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
        t = topk(t, emit_rank=False)
        return t.append_column("__part", part_column(t, ["doc_id"], n_parts))

    def final(g: pa.Table) -> pa.Table:
        t = topk(g.drop_columns("__part"), emit_rank=True)
        return _round_col(t, "tfidf", 4)

    return (
        scored.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(final, batch_format="pyarrow")
    )


def f2_string_funcs(sf_dir: str) -> rd.Dataset:
    """§2.8 scalar string kernels over customer names — all
    pyarrow.compute, no Python rows: upper, substring, length,
    reversed, concat-with-literal."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    def funcs(t: pa.Table) -> pa.Table:
        name = t.column("c_name")
        return pa.table(
            {
                "c_custkey": t.column("c_custkey").cast(pa.int64()),
                "upper_name": pc.utf8_upper(name),
                "prefix5": pc.utf8_slice_codeunits(name, 0, 5),
                "name_len": pc.utf8_length(name).cast(pa.int64()),
                "reversed": pc.utf8_reverse(name),
                "tagged": pc.binary_join_element_wise(
                    pa.array(["cust"] * t.num_rows), name, ":"
                ),
            }
        )

    return cust.map_batches(funcs, batch_format="pyarrow", batch_size=None)


def f3_date_parts(sf_dir: str) -> rd.Dataset:
    """§2.8 scalar date kernels over order dates: year / month / day /
    quarter extraction (engine-agnostic parts — day-of-week start
    conventions deliberately avoided)."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def parts(t: pa.Table) -> pa.Table:
        d = pc.cast(t.column("o_orderdate"), pa.timestamp("us"))
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey").cast(pa.int64()),
                "y": pc.year(d).cast(pa.int64()),
                "m": pc.month(d).cast(pa.int64()),
                "d": pc.day(d).cast(pa.int64()),
                "q": pc.quarter(d).cast(pa.int64()),
            }
        )

    return orders.map_batches(parts, batch_format="pyarrow", batch_size=None)


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


def _doc_term_rows(t: pa.Table) -> pa.Table:
    """documents batch -> distinct (doc_id, term, tfc, dlen) rows —
    fully vectorized (Arrow regex split + C++ group_by count; utf8_lower
    matches str.lower / DuckDB lower on this corpus: all utf8proc).
    Shared by the TF-IDF and BM25 scorers."""
    toks = pc.split_pattern_regex(
        pc.utf8_lower(t.column("text")), pattern=r"[ \t\n\r\f\v]+"
    )
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    parent = np.repeat(t.column("doc_id").to_numpy(zero_copy_only=False), lens)
    flat = toks.flatten()
    keep = pc.not_equal(flat, "")
    pairs = pa.table(
        {"doc_id": pa.array(parent, pa.int64()), "term": flat}
    ).filter(keep)
    counted = pairs.group_by(["doc_id", "term"]).aggregate([("term", "count")])
    # doc length (post-empty-filter tokens) via sorted-unique lookup
    uniq, dcounts = np.unique(
        pairs.column("doc_id").to_numpy(zero_copy_only=False), return_counts=True
    )
    cdoc = counted.column("doc_id").to_numpy(zero_copy_only=False)
    dlen = dcounts[np.searchsorted(uniq, cdoc)]
    return pa.table(
        {
            "doc_id": counted.column("doc_id"),
            "term": counted.column("term"),
            "tfc": counted.column("term_count").cast(pa.int64()),
            "dlen": pa.array(dlen, pa.int64()),
        }
    )


def _token_rows(docs: rd.Dataset) -> rd.Dataset:
    """documents -> one (term) row per token (vectorized Arrow split;
    the regex class matches the SQL oracles verbatim)."""

    def tok(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t.column("text")), pattern=r"[ \t\n\r\f\v]+"
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        return pa.table({"term": flat}).filter(pc.not_equal(flat, ""))

    return docs.map_batches(tok, batch_format="pyarrow", batch_size=None)


def text_top_terms(sf_dir: str, top_n: int = 20) -> rd.Dataset:
    """EXACT corpus-wide top-n terms by frequency: per-block partial
    counts (one row per (block, term) through the shuffle — the a3
    skew-proof shape), tiny groupby(term).sum, then the o1 partial
    top-k merge.  The exact companion of ``approx_top_terms``."""

    docs = _read(sf_dir, "documents", ["text"])

    def partial_counts(t: pa.Table) -> pa.Table:
        c = t.group_by("term").aggregate([("term", "count")])
        return pa.table(
            {"term": c.column("term"), "n": c.column("term_count").cast(pa.int64())}
        )

    counts = (
        _token_rows(docs)
        .map_batches(partial_counts, batch_format="pyarrow", batch_size=None)
        .groupby("term")
        .sum("n")
        .map_batches(lambda t: t.rename_columns(["term", "n"]), batch_format="pyarrow")
    )

    def block_top(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("n", "descending"), ("term", "ascending")]
        )
        return t.take(idx[: min(top_n, t.num_rows)])

    # per-block partial top-n, then ONE single-task merge (o1 shape)
    partials = counts.map_batches(block_top, batch_format="pyarrow", batch_size=None)
    return partials.repartition(1).map_batches(
        block_top, batch_format="pyarrow", batch_size=None
    )


def approx_top_terms(sf_dir: str, top_n: int = 20) -> pa.Table:
    """Heavy hitters with bounded state (Misra-Gries summaries —
    stages/aggregates.misra_gries_topk), DRIVER-ORACLED via the MG
    guarantee: the query runs the sketch AND the exact top-n, checks
    every exact top term against the sketch's bound (est_count <= true
    <= est_count + max_undercount; any term heavier than the global
    undercount bound must be present in the summary), and emits the
    exact counts plus a ``bound_ok`` flag.  The DuckDB oracle computes
    the same exact top-n with TRUE — a violated MG bound flips
    ``bound_ok`` and hash-fails the gate.  The bound contract is
    additionally pinned against adversarial streams in
    tests/test_heavy_hitters.py."""
    from ..stages.aggregates import misra_gries_topk

    docs = _read(sf_dir, "documents", ["text"])
    tokens = _token_rows(docs).materialize()  # two consumers (MG + exact)
    mg = misra_gries_topk(tokens, "term", top_n=top_n, capacity=4096)
    est = dict(zip(mg.column("value").to_pylist(), mg.column("est_count").to_pylist()))
    bound = int(mg.column("max_undercount")[0].as_py()) if mg.num_rows else 0

    def partial_counts(t: pa.Table) -> pa.Table:
        c = t.group_by("term").aggregate([("term", "count")])
        return pa.table(
            {"term": c.column("term"), "n": c.column("term_count").cast(pa.int64())}
        )

    def block_top(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("n", "descending"), ("term", "ascending")])
        return t.take(idx[: min(top_n, t.num_rows)])

    exact = (
        tokens.map_batches(partial_counts, batch_format="pyarrow", batch_size=None)
        .groupby("term")
        .sum("n")
        .map_batches(lambda t: t.rename_columns(["term", "n"]), batch_format="pyarrow")
        .map_batches(block_top, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(block_top, batch_format="pyarrow", batch_size=None)
        .take_all()
    )  # <= top_n rows
    ok = True
    for r in exact:
        true_n = r["n"]
        if r["term"] in est:
            lo = est[r["term"]]
            if not (lo <= true_n <= lo + bound):
                ok = False
        elif true_n > bound:
            # MG guarantee: anything heavier than the global compress
            # loss must survive in the summary
            ok = False
    return pa.table(
        {
            "term": pa.array([r["term"] for r in exact], pa.string()),
            "n": pa.array([r["n"] for r in exact], pa.int64()),
            "bound_ok": pa.array([ok] * len(exact), pa.bool_()),
        }
    )


def a15_percentile_cont(sf_dir: str) -> pa.Table:
    """EXACT continuous percentiles of l_extendedprice via distributed
    order-statistic selection (stages/selection.py): histogram-
    refinement passes narrow each target rank to a single-float or
    collect-limit-bounded range — the column itself is never collected.
    The approx sketch variant is approx_quantile_price; this is the
    exact companion, DuckDB-oracled."""
    from ..stages.selection import percentile_cont

    li = _read(sf_dir, "lineitem", ["l_extendedprice"])
    qs = [0.25, 0.5, 0.75]
    got = percentile_cont(li, "l_extendedprice", qs)
    return pa.table(
        {
            "quantile": pa.array(qs, pa.float64()),
            "price": pa.array([round(got[q], 4) for q in qs], pa.float64()),
        }
    )


def webtext_curation(sf_dir: str) -> rd.Dataset:
    """Full webtext curation chain (gopher -> PII -> span dedup ->
    decontaminate -> exact dedup) over the documents table; rows-only
    (each stage's math is individually oracled/tested)."""
    from ..stages.webtext import run_webtext_curation

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def split(keep_eval: bool):
        def f(t: pa.Table) -> pa.Table:
            is_eval = t.column("doc_id").to_numpy() % 50 == 0
            return t.filter(pa.array(is_eval if keep_eval else ~is_eval))

        return f

    eval_ds = docs.map_batches(split(True), batch_format="pyarrow")
    corpus = docs.map_batches(split(False), batch_format="pyarrow")
    return run_webtext_curation(corpus, eval_ds, decon_n=4).select_columns(["doc_id"])


# --- round-4 additions: new oracled operator families ---------------------

def text_quality_scores(sf_dir: str) -> rd.Dataset:
    """QualityScore heuristics surfaced with full per-signal outputs
    (mean word length, punctuation ratio, stopword ratio, blended
    score), DuckDB-oracled: every signal is re-derived in SQL from the
    same regex classes and stopword list (__ray_entry__ builds the SQL
    from textstats._STOP so the two can never drift)."""
    from ..stages.textstats import QualityScore

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def away6(x: np.ndarray) -> np.ndarray:
        # HALF-AWAY rounding to match DuckDB's ROUND: the signals are
        # count ratios with small power-of-two denominators, so exact
        # 5-at-7th-digit ties occur (0.7490625) and np.round's
        # half-EVEN tie rule diverges by 1e-6 (measured: 3 docs at
        # sf0.01).  All signals are non-negative.
        return np.floor(x * 1e6 + 0.5) / 1e6

    def out(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "mean_word_len": pa.array(
                    away6(t.column("mean_word_len").to_numpy()), pa.float64()
                ),
                "punct_ratio": pa.array(
                    away6(t.column("punct_ratio").to_numpy()), pa.float64()
                ),
                "stop_ratio": pa.array(
                    away6(t.column("stop_ratio").to_numpy()), pa.float64()
                ),
                "quality": pa.array(
                    away6(t.column("quality").to_numpy()), pa.float64()
                ),
            }
        )

    return docs.map_batches(
        QualityScore, batch_format="pyarrow", concurrency=(1, 8)
    ).map_batches(out, batch_format="pyarrow", batch_size=None)


# Fixed centroids for the ORACLED k-means assignment check: generated
# once from a pinned seed; __ray_entry__ renders the SAME literals into
# the SQL oracle, so the nearest-centroid argmin is verified end to end
# (the iterative fit itself is numpy-golden in tests/test_kmeans.py).
def kmeans_fixed_centroids(k: int = 4, dim: int = 64) -> np.ndarray:
    rng = np.random.RandomState(123)
    c = rng.standard_normal((k, dim))
    # embeddings are unit vectors; unit centroids give a balanced
    # 4-way split (138/129/117/116 on the sf0.01 fixture)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    return np.round(c, 4)


def kmeans_fixed_assign(sf_dir: str) -> rd.Dataset:
    """Nearest-centroid assignment against FIXED centroids -> cluster
    sizes.  This is exactly one Lloyd E-step (stages/kmeans.kmeans_assign)
    made SQL-checkable: argmin over squared L2 distance with first-index
    tie-break, which the oracle replays as an argmax over
    (e.c - |c|^2/2) scores with the same CASE order."""
    from ..stages.kmeans import kmeans_assign

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    cents = kmeans_fixed_centroids()
    return (
        kmeans_assign(emb, cents, id_column="vec_id", column="embedding")
        .groupby("cluster")
        .count()
        .map_batches(
            lambda t: pa.table(
                {
                    "cluster": t.column("cluster").cast(pa.int64()),
                    "n": t.column("count()").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def _centered_sums(
    ds: rd.Dataset, key: str, xcol: str, ycol: str
) -> tuple[rd.Dataset, dict]:
    """Per-group centered second-moment sums, two passes: tiny per-group
    means broadcast, then centered block partials, one small groupby.
    Returns (Dataset with columns ``key, sxy, sxx, syy, n``; means dict
    ``key -> (mx, my)``).  Two passes because the one-pass six-sum
    formula loses ~10 digits to cancellation at lineitem magnitudes —
    shared by a16_covar_stddev and a21_regr_by_group."""
    means = (
        ds.groupby(key)
        .aggregate(
            Mean(xcol, alias_name="mx"),
            Mean(ycol, alias_name="my"),
        )
        .take_all()
    )  # group-count rows (tiny by contract)
    m = {r[key]: (r["mx"], r["my"]) for r in means}
    import ray

    m_ref = ray.put(m)

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        mm = ray.get(m_ref)
        k = t.column(key).to_pylist()
        x = t.column(xcol).to_numpy(zero_copy_only=False)
        y = t.column(ycol).to_numpy(zero_copy_only=False)
        mx = np.array([mm[v][0] for v in k])
        my = np.array([mm[v][1] for v in k])
        dx, dy = x - mx, y - my
        df = pd.DataFrame(
            {"k": k, "sxy": dx * dy, "sxx": dx * dx, "syy": dy * dy, "n": 1}
        )
        g = df.groupby("k", as_index=False).sum()
        return pa.table(
            {
                key: pa.array(g.k, pa.string()),
                "sxy": pa.array(g.sxy, pa.float64()),
                "sxx": pa.array(g.sxx, pa.float64()),
                "syy": pa.array(g.syy, pa.float64()),
                "n": pa.array(g.n, pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(key)
        .aggregate(
            Sum("sxy", alias_name="sxy"), Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"), Sum("n", alias_name="n"),
        )
    )
    return agg, m


def a16_covar_stddev(sf_dir: str) -> rd.Dataset:
    """Per-group sample covariance + stddevs (price vs quantity) —
    centered two-pass sums (`_centered_sums`) so the result is
    numerically stable enough to hash-match DuckDB's streaming
    covar_samp at 6 dp."""
    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice", "l_quantity"])
    agg, _ = _centered_sums(li, "l_returnflag", "l_extendedprice", "l_quantity")

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy().astype(np.float64)
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "covar_pq": pa.array(
                    np.round(t.column("sxy").to_numpy() / (n - 1), 6), pa.float64()
                ),
                "std_price": pa.array(
                    np.round(np.sqrt(t.column("sxx").to_numpy() / (n - 1)), 6),
                    pa.float64(),
                ),
                "std_qty": pa.array(
                    np.round(np.sqrt(t.column("syy").to_numpy() / (n - 1)), 6),
                    pa.float64(),
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def a21_regr_by_group(sf_dir: str) -> rd.Dataset:
    """Per-group ordinary-least-squares fit of price on quantity —
    the SQL regr_* aggregate family (slope = Sxy/Sxx, intercept =
    my - slope*mx, r2 = Sxy^2/(Sxx*Syy)) computed from the same
    centered two-pass sums as a16 (`_centered_sums`); the group means
    needed for the intercept ride in the (tiny) broadcast dict.
    Oracle: DuckDB regr_slope / regr_intercept / regr_r2."""
    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice", "l_quantity"])
    agg, means = _centered_sums(
        li, "l_returnflag", "l_extendedprice", "l_quantity"
    )

    def finish(t: pa.Table) -> pa.Table:
        k = t.column("l_returnflag").to_pylist()
        sxy = t.column("sxy").to_numpy(zero_copy_only=False)
        sxx = t.column("sxx").to_numpy(zero_copy_only=False)
        syy = t.column("syy").to_numpy(zero_copy_only=False)
        mx = np.array([means[v][0] for v in k])
        my = np.array([means[v][1] for v in k])
        # regression of price (y here = x of _centered_sums) ON quantity:
        # _centered_sums' xcol is price, ycol is quantity, so slope of
        # price-on-quantity = Sxy / Syy with these sums.
        slope = sxy / syy
        intercept = mx - slope * my
        r2 = (sxy * sxy) / (sxx * syy)
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "slope": pa.array(np.round(slope, 6), pa.float64()),
                "intercept": pa.array(np.round(intercept, 6), pa.float64()),
                "r2": pa.array(np.round(r2, 6), pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def f5_standardize(sf_dir: str) -> rd.Dataset:
    """Per-group z-score standardization of the event value — the
    feature-scaling staple of every training-data pipeline: ONE small
    groupby for (mean, sample std) per event_type, stats broadcast via
    ray.put, then a stateless vectorized map over the stream (no
    window shuffle — the SQL windowed form is the oracle, not the
    plan).  Std uses the centered two-pass sums for 6-dp parity with
    DuckDB's stddev_samp."""
    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    agg, means = _centered_sums(ev, "event_type", "value", "value")
    bundle = {
        r["event_type"]: (
            means[r["event_type"]][0],
            float(np.sqrt(r["sxx"] / (r["n"] - 1))),
        )
        for r in agg.take_all()
    }  # <= distinct-event-type rows
    import ray

    b_ref = ray.put(bundle)

    def z(t: pa.Table) -> pa.Table:
        bb = ray.get(b_ref)
        k = t.column("event_type").to_pylist()
        v = t.column("value").to_numpy(zero_copy_only=False)
        m = np.array([bb[x][0] for x in k])
        s = np.array([bb[x][1] for x in k])
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "zvalue": pa.array(np.round((v - m) / s, 6), pa.float64()),
            }
        )

    return ev.map_batches(z, batch_format="pyarrow", batch_size=None)


def f4_math_funcs(sf_dir: str) -> rd.Dataset:
    """Scalar math kernel family (sqrt/ln/exp/abs) over lineitem —
    vectorized numpy per batch, 4 dp rounding on both sides (libm ulp
    differences between numpy and DuckDB disappear at 4 dp on these
    magnitudes)."""
    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    )

    def f(t: pa.Table) -> pa.Table:
        qty = t.column("l_quantity").to_numpy(zero_copy_only=False).astype(np.float64)
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False).astype(np.float64)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False).astype(np.float64)
        tax = t.column("l_tax").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_linenumber": t.column("l_linenumber"),
                "sqrt_qty": pa.array(np.round(np.sqrt(qty), 4), pa.float64()),
                "ln_price": pa.array(np.round(np.log(price), 4), pa.float64()),
                "abs_disc": pa.array(np.round(np.abs(disc - 0.05), 4), pa.float64()),
                "exp_tax": pa.array(np.round(np.exp(tax), 4), pa.float64()),
            }
        )

    return li.map_batches(f, batch_format="pyarrow", batch_size=None)


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


def a17_mode_event(sf_dir: str) -> rd.Dataset:
    """MODE per group (most frequent event_type per user, ties to the
    lexicographically smallest type — explicit, unlike SQL ``mode()``):
    per-block (user, type) count partials, one user-hash groupby, then
    the a7 argmax sweep."""
    from ..stages.joins import default_join_partitions
    from ..stages.partition import part_column

    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    n_parts = default_join_partitions()

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "event_type"]).aggregate([("event_type", "count")])
        return pa.table(
            {
                "user_id": g.column("user_id"),
                "event_type": g.column("event_type"),
                "n": g.column("event_type_count").cast(pa.int64()),
            }
        )

    counts = (
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["user_id", "event_type"])
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns(["user_id", "event_type", "n"]),
            batch_format="pyarrow",
        )
    )

    def argmax(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("user_id", "ascending"),
                ("n", "descending"),
                ("event_type", "ascending"),
            ],
        )
        t = t.take(idx)
        users = t.column("user_id").to_numpy(zero_copy_only=False)
        n = len(users)
        first = np.empty(n, dtype=bool)
        if n:
            first[0] = True
            first[1:] = users[1:] != users[:-1]
        return t.filter(pa.array(first)).rename_columns(
            ["user_id", "mode_type", "n"]
        )

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, ["user_id"], n_parts))

    return (
        counts.map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(
            lambda g: argmax(g.drop_columns("__part")), batch_format="pyarrow"
        )
    )


def a18_price_histogram(sf_dir: str, bucket_width: float = 25000.0) -> rd.Dataset:
    """Fixed-width histogram of order totals (count + sum per bucket):
    per-block bucket partials (one row per (block, bucket) through the
    shuffle), tiny groupby(bucket) merge."""
    orders = _read(sf_dir, "orders", ["o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        p = t.column("o_totalprice").to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.floor(p / bucket_width).astype(np.int64)
        df = pd.DataFrame({"bucket": b, "n": 1, "s": p})
        g = df.groupby("bucket", as_index=False).sum()
        return pa.table(
            {
                "bucket": pa.array(g.bucket, pa.int64()),
                "n": pa.array(g.n, pa.int64()),
                "s": pa.array(g.s, pa.float64()),
            }
        )

    return (
        orders.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n_orders"), Sum("s", alias_name="sum_price"))
        .map_batches(
            lambda t: pa.table(
                {
                    "bucket": t.column("bucket"),
                    "n_orders": t.column("n_orders").cast(pa.int64()),
                    "sum_price": pa.array(
                        np.round(t.column("sum_price").to_numpy(), 2), pa.float64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )


# --- round-4 batch 2: range/interval joins, tie-aware windows, graph,
# --- fuzzy matching -------------------------------------------------------

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


def _cooccur_edges(sf_dir: str, key: str, val: str) -> rd.Dataset:
    """Co-occurrence edge list over lineitem: ``val`` nodes adjacent
    iff they share a ``key`` (e.g. suppliers sharing a part, parts
    sharing an order): distinct (key, val) pairs -> per-key node pair
    expansion (bounded by per-key fan-in) -> block-local dedup.
    Shared by graph_triangles (co-supply) and graph_adamic_adar
    (co-order)."""
    from ..stages.partition import expansion_partitions, part_column

    # internal names stay l_partkey (the key) / l_suppkey (the node) —
    # the expansion body below predates the generalization
    li = _read(sf_dir, "lineitem", [key, val]).map_batches(
        lambda t: pa.table(
            {"l_partkey": t.column(key), "l_suppkey": t.column(val)}
        ),
        batch_format="pyarrow",
        batch_size=None,
    )

    def distinct_ps(t: pa.Table) -> pa.Table:
        return t.group_by(["l_partkey", "l_suppkey"]).aggregate([])

    ps = (
        li.map_batches(distinct_ps, batch_format="pyarrow", batch_size=None)
        .groupby(["l_partkey", "l_suppkey"])
        .count()
        .select_columns(["l_partkey", "l_suppkey"])
    )

    n_parts = expansion_partitions()

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, ["l_partkey"], n_parts))

    def pairs(g: pa.Table) -> pa.Table:
        g = g.drop_columns("__part").sort_by(
            [("l_partkey", "ascending"), ("l_suppkey", "ascending")]
        )
        p = g.column("l_partkey").to_numpy(zero_copy_only=False)
        s = g.column("l_suppkey").to_numpy(zero_copy_only=False)
        n = len(p)
        starts = np.flatnonzero(np.concatenate([[True], p[1:] != p[:-1]]))
        ends = np.concatenate([starts[1:], [n]])
        us, vs = [], []
        for st, en in zip(starts, ends):  # per PART (supplier fan-in bounded)
            nb = s[st:en]
            if len(nb) < 2:
                continue
            iu = np.triu_indices(len(nb), 1)
            us.append(nb[iu[0]])
            vs.append(nb[iu[1]])
        if not us:
            return pa.table(
                {"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())}
            )
        t2 = pa.table(
            {
                "u": pa.array(np.concatenate(us), pa.int64()),
                "v": pa.array(np.concatenate(vs), pa.int64()),
            }
        )
        return t2.group_by(["u", "v"]).aggregate([])  # block-local dedup

    return (
        ps.map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(pairs, batch_format="pyarrow")
    )


def graph_triangles(sf_dir: str) -> rd.Dataset:
    """Triangle count of the supplier co-supply graph, via the
    degree-oriented wedge join (stages/triangles.triangle_count).
    Oracle: the textbook 3-way SQL self-join over the same edge CTE."""
    from ..stages.triangles import triangle_count

    return triangle_count(_cooccur_edges(sf_dir, "l_partkey", "l_suppkey"))


def graph_adamic_adar(sf_dir: str, k: int = 50) -> rd.Dataset:
    """Adamic-Adar link prediction over the part CO-ORDER graph (parts
    adjacent iff they appear in the same order — the co-SUPPLY graph
    is complete at every sf, so it has no non-edges to predict):
    top-k NON-edge part pairs by summed 1/ln(deg) over shared
    neighbors (stages/linkpred.adamic_adar_topk — center-grouped wedge
    expansion, one node-hash shuffle, pair groupby, anti-join against
    the edge set, partial top-k merge).  Ranking uses the 4dp-ROUNDED
    score so Ray/DuckDB summation ulp noise cannot reorder the cut.
    Oracle: adjacency self-join + degree CTE in SQL."""
    from ..stages.linkpred import adamic_adar_topk

    return adamic_adar_topk(_cooccur_edges(sf_dir, "l_orderkey", "l_partkey"), k=k)


def graph_adamic_adar_capped(
    sf_dir: str, k: int = 50, max_degree: int = 1024
) -> rd.Dataset:
    """graph_adamic_adar through the hub-cap path: centers above
    ``max_degree`` expand only a deterministic fmix64-ranked sample of
    neighbors and the output carries a ``truncated`` flag (the
    web-scale Adamic-Adar mitigation — a hub of degree d otherwise
    emits O(d^2) wedge pairs).  The default cap (1024) exceeds the
    co-order graph's max degree at every test sf (138/206/222 at
    sf0.001/0.01/0.1), so no sampling fires, truncated is all-False,
    and the scores hash-match the exact SQL oracle — the gate proves
    the capped path's plumbing is exact when it doesn't bite.  The
    sampling behavior itself (cap < max degree) is pinned by pytest
    subset/flag tests and measured in SCALE.md."""
    from ..stages.linkpred import adamic_adar_topk

    return adamic_adar_topk(
        _cooccur_edges(sf_dir, "l_orderkey", "l_partkey"),
        k=k,
        max_degree=max_degree,
    )


def graph_common_neighbors(sf_dir: str, k: int = 50) -> rd.Dataset:
    """Common-neighbors link prediction over the part co-order graph —
    same wedge plan as graph_adamic_adar with unit center weights, so
    the score is the integer shared-neighbor count (no float ties at
    the cut; ties broken by (u, v) on both sides)."""
    from ..stages.linkpred import linkpred_topk

    return linkpred_topk(
        _cooccur_edges(sf_dir, "l_orderkey", "l_partkey"),
        k=k,
        method="common_neighbors",
    )


def graph_jaccard(sf_dir: str, k: int = 50) -> rd.Dataset:
    """Jaccard link prediction over the part co-order graph: common /
    (deg u + deg v - common).  Endpoint degrees join in AFTER the
    anti-join via the cost-based smart_join (node-sized table —
    broadcast at this scale, hash-shuffle beyond the threshold);
    ranking uses the 4dp-rounded score, ties by (u, v)."""
    from ..stages.linkpred import linkpred_topk

    return linkpred_topk(
        _cooccur_edges(sf_dir, "l_orderkey", "l_partkey"), k=k, method="jaccard"
    )


def fuzzy_match_parts(sf_dir: str) -> rd.Dataset:
    """Blocked fuzzy (Levenshtein) top-1 match: for each of the 20
    lowest-partkey part names, the closest OTHER part name corpus-wide
    (min edit distance, ties lexicographic).  Probes are read
    driver-side straight from the parquet file (k-sized, no Ray
    collect); the scan is the row-vectorized DP of stages/fuzzy."""
    import pyarrow.parquet as pq

    from ..stages.fuzzy import levenshtein_top1

    pt = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    ).sort_by("p_partkey")
    probes = [
        (int(k), str(n))
        for k, n in zip(
            pt.column("p_partkey").to_pylist()[:20],
            pt.column("p_name").to_pylist()[:20],
        )
    ]
    parts = _read(sf_dir, "part", ["p_name"])
    return levenshtein_top1(parts, "p_name", probes)


def chunk_documents(sf_dir: str, width: int = 200, stride: int = 150) -> rd.Dataset:
    """Overlapping fixed-width character chunking (the LLM context-window
    prep step): doc -> chunks [k*stride, k*stride+width) for k while
    k*stride < len.  Vectorized as a loop over CHUNK INDEX (bounded by
    max_len/stride), not rows: chunk k slices the whole column once via
    utf8_slice_codeunits (codepoint semantics — matches SQL substring)
    and filters rows still long enough.  Purely map-side: no shuffle,
    output streams."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def chunks(t: pa.Table) -> pa.Table:
        lens = pc.utf8_length(t.column("text")).to_numpy(zero_copy_only=False)
        if t.num_rows == 0 or lens.max() == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "chunk_id": pa.array([], pa.int64()),
                    "chunk": pa.array([], pa.string()),
                    "n_chunk_chars": pa.array([], pa.int64()),
                }
            )
        max_k = int((lens.max() - 1) // stride)
        outs = []
        for k in range(max_k + 1):
            start = k * stride
            mask = lens > start
            if not mask.any():
                break
            sub = t.filter(pa.array(mask))
            piece = pc.utf8_slice_codeunits(sub.column("text"), start, start + width)
            outs.append(
                pa.table(
                    {
                        "doc_id": sub.column("doc_id"),
                        "chunk_id": pa.array(
                            np.full(sub.num_rows, k, dtype=np.int64), pa.int64()
                        ),
                        "chunk": piece,
                        "n_chunk_chars": pc.utf8_length(piece).cast(pa.int64()),
                    }
                )
            )
        return pa.concat_tables(outs)

    return docs.map_batches(chunks, batch_format="pyarrow", batch_size=None)


def pack_token_budget(sf_dir: str, capacity: int = 256) -> rd.Dataset:
    """Token-budget sequence packing (deterministic shard assignment for
    training-data writers): docs in doc_id order fill bins of
    ``capacity`` tokens; a doc's bin = floor(exclusive-prefix-tokens /
    capacity).  The prefix sum is the distributed two-phase scan
    (stages/scan.ordered_prefix_sum) — no global sort; token counts are
    the same '\\S+' runs the SQL oracle counts."""
    from ..stages.scan import ordered_prefix_sum

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def toks(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t.column("text"), r"\S+").cast(pa.int64())
        return pa.table({"doc_id": t.column("doc_id"), "n_tokens": n})

    counted = docs.map_batches(toks, batch_format="pyarrow", batch_size=None)
    scanned = ordered_prefix_sum(counted, "doc_id", "n_tokens", alias="cum")

    def binize(t: pa.Table) -> pa.Table:
        cum = t.column("cum").to_numpy(zero_copy_only=False)
        ntok = t.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.floor((cum - ntok) / capacity).astype(np.int64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": t.column("n_tokens"),
                "bin": pa.array(b, pa.int64()),
            }
        )

    return scanned.map_batches(binize, batch_format="pyarrow", batch_size=None)


def dedup_ed1_pairs(sf_dir: str) -> rd.Dataset:
    """All part-name pairs within edit distance 1 via SymSpell-style
    deletion-neighborhood blocking (stages/fuzzy.ed1_pairs): lossless
    variant blocking -> ONE variant-hash shuffle -> bounded per-group
    pair expansion -> vectorized <=1 verification.  The all-pairs
    DP the oracle runs is O(n^2); this plan is O(n * len) rows through
    one shuffle."""
    from ..stages.fuzzy import ed1_pairs

    parts = _read(sf_dir, "part", ["p_partkey", "p_name"])
    return ed1_pairs(parts, "p_partkey", "p_name")


def a19_salted_counts(sf_dir: str) -> rd.Dataset:
    """Hot-key-safe counting exposed to the driver gate: event_type has
    only 5 values (every key is a celebrity), so this runs the salted
    two-phase aggregate (stages/aggregates.salted_groupby_count — 16
    sub-keys per key through the first shuffle, unsalt in a 5x16-row
    second pass) and must agree exactly with the plain GROUP BY."""
    from ..stages.aggregates import salted_groupby_count

    ev = _read(sf_dir, "events", ["event_type"])
    out = salted_groupby_count(ev, ["event_type"], n_salts=16, alias="n")
    return out.map_batches(
        lambda t: pa.table(
            {
                "event_type": t.column("event_type"),
                "n": t.column("n").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def a20_event_entropy(sf_dir: str) -> rd.Dataset:
    """Shannon entropy of each user's event-type mix — computed with
    AGGREGATES ONLY via H = ln(N) - sum(n*ln(n))/N: per-block
    (user,type) count partials, one groupby merge, then per-user Sum of
    n*ln(n) and Sum of n — no per-user group calls anywhere.  6 dp
    rounding on both sides (values are irrational; no tie hazard)."""
    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "event_type"]).aggregate([("event_type", "count")])
        return pa.table(
            {
                "user_id": g.column("user_id"),
                "event_type": g.column("event_type"),
                "n": g.column("event_type_count").cast(pa.int64()),
            }
        )

    counts = (
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["user_id", "event_type"])
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns(["user_id", "event_type", "n"]),
            batch_format="pyarrow",
        )
    )

    def nlogn(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "n": t.column("n"),
                "nln": pa.array(n * np.log(n), pa.float64()),
            }
        )

    agg = (
        counts.map_batches(nlogn, batch_format="pyarrow", batch_size=None)
        .groupby("user_id")
        .aggregate(Sum("n", alias_name="tot"), Sum("nln", alias_name="nln"))
    )

    def finish(t: pa.Table) -> pa.Table:
        tot = t.column("tot").to_numpy(zero_copy_only=False).astype(np.float64)
        nln = t.column("nln").to_numpy(zero_copy_only=False)
        h = np.log(tot) - nln / tot
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "n_events": pa.array(tot.astype(np.int64), pa.int64()),
                "entropy": pa.array(np.round(np.maximum(h, 0.0), 6), pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def text_bigram_topk(sf_dir: str, k: int = 3) -> rd.Dataset:
    """Bigram language-model head: corpus-wide bigram counts and, per
    leading word, the top-k continuations with conditional
    probabilities (count-based Markov LM training at corpus scale).
    Per-block bigram partials (consecutive filtered tokens within a
    doc, all vectorized), ONE bigram groupby merge, then a w1-hash
    partition computes per-word totals + rank-k in segment arithmetic.
    Tokenizer shared verbatim with TF-IDF/BM25 (whitespace split +
    lower + empty filter); probabilities rounded HALF-AWAY at 6 dp to
    match DuckDB ROUND on power-of-two total ties."""
    from ..stages.joins import default_join_partitions
    from ..stages.partition import part_column

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t.column("text")), pattern=r"[ \t\n\r\f\v]+"
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        parent = np.repeat(t.column("doc_id").to_numpy(zero_copy_only=False), lens)
        flat = toks.flatten()
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        parent = parent[keep]
        words = np.asarray(flat.filter(pa.array(keep)).to_pylist(), dtype=object)
        if len(words) < 2:
            return pa.table(
                {
                    "w1": pa.array([], pa.string()),
                    "w2": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        same = parent[1:] == parent[:-1]
        bt = pa.table(
            {
                "w1": pa.array(words[:-1][same], pa.string()),
                "w2": pa.array(words[1:][same], pa.string()),
            }
        )
        g = bt.group_by(["w1", "w2"]).aggregate([("w2", "count")])
        return pa.table(
            {
                "w1": g.column("w1"),
                "w2": g.column("w2"),
                "n": g.column("w2_count").cast(pa.int64()),
            }
        )

    counts = (
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["w1", "w2"])
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns(["w1", "w2", "n"]), batch_format="pyarrow"
        )
    )

    n_parts = default_join_partitions()

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, ["w1"], n_parts))

    def topk(g: pa.Table) -> pa.Table:
        g = g.drop_columns("__part")
        idx = pc.sort_indices(
            g,
            sort_keys=[("w1", "ascending"), ("n", "descending"), ("w2", "ascending")],
        )
        g = g.take(idx)
        w1 = np.asarray(g.column("w1").to_pylist(), dtype=object)
        n = g.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        m = len(w1)
        first = np.ones(m, dtype=bool)
        if m:
            first[1:] = w1[1:] != w1[:-1]
        seg_id = np.cumsum(first) - 1
        # per-segment totals and ranks, all segment arithmetic
        tot = np.zeros(seg_id[-1] + 1 if m else 0)
        np.add.at(tot, seg_id, n)
        starts = np.flatnonzero(first)
        rank = np.arange(m, dtype=np.int64) - starts[seg_id]
        p = n / tot[seg_id]
        keep = rank < k
        kept = g.filter(pa.array(keep))
        pk = p[keep]
        return pa.table(
            {
                "w1": kept.column("w1"),
                "w2": kept.column("w2"),
                "n": kept.column("n"),
                "p": pa.array(np.floor(pk * 1e6 + 0.5) / 1e6, pa.float64()),
            }
        )

    return (
        counts.map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(topk, batch_format="pyarrow")
    )


def pareto_keep(price: np.ndarray, size: np.ndarray) -> np.ndarray:
    """Vectorized 2-D skyline mask (minimize ``price``, maximize
    ``size``): sort by (price asc, size desc); within an equal-price
    group only the group-max size rows survive (including exact
    duplicates, which dominate neither way), and a group survives only
    when its max size is STRICTLY above the best size seen at any
    smaller price (an equal size at a smaller price dominates via the
    strict price edge)."""
    order = np.lexsort((-size, price))
    p_s, s_s = price[order], size[order]
    n = len(p_s)
    new_price = np.concatenate([[True], p_s[1:] != p_s[:-1]])
    group_id = np.cumsum(new_price) - 1
    group_max = s_s[new_price]  # first row of each price group
    prev_best = np.concatenate(
        [[np.iinfo(np.int64).min], np.maximum.accumulate(group_max)[:-1]]
    )
    keep_sorted = (s_s == group_max[group_id]) & (
        group_max[group_id] > prev_best[group_id]
    )
    keep = np.zeros(n, dtype=bool)
    keep[order] = keep_sorted
    return keep


def o24_pareto_front(sf_dir: str) -> rd.Dataset:
    """2-D skyline (Pareto frontier) of parts: minimize retail price,
    maximize size.  A part survives iff no other part is <= on price
    AND >= on size with at least one strict inequality; equal (price,
    size) pairs dominate neither way, so whole duplicate groups ride
    the frontier together.

    Distributed shape: the skyline operator is idempotent under union
    (a globally non-dominated point is non-dominated in its own block),
    so block-local vectorized frontiers -> one-task merge frontier.
    Random 2-D frontiers are O(log n)-sized, so the merge input stays
    tiny at any corpus scale.  Oracle: the textbook NOT EXISTS
    dominance anti-join."""
    pt = _read(sf_dir, "part", ["p_partkey", "p_retailprice", "p_size"])

    def block_front(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "p_partkey": pa.array([], pa.int64()),
                    "p_retailprice": pa.array([], pa.float64()),
                    "p_size": pa.array([], pa.int64()),
                }
            )
        price = t.column("p_retailprice").to_numpy(zero_copy_only=False)
        size = t.column("p_size").to_numpy(zero_copy_only=False).astype(np.int64)
        kept = t.filter(pa.array(pareto_keep(price, size)))
        return pa.table(
            {
                "p_partkey": kept.column("p_partkey").cast(pa.int64()),
                "p_retailprice": pa.array(
                    np.round(
                        kept.column("p_retailprice").to_numpy(zero_copy_only=False), 2
                    ),
                    pa.float64(),
                ),
                "p_size": kept.column("p_size").cast(pa.int64()),
            }
        )

    return (
        pt.map_batches(block_front, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(block_front, batch_format="pyarrow", batch_size=None)
    )


def io_jsonl_roundtrip(sf_dir: str) -> rd.Dataset:
    """JSONL sink + source bridge: stream documents out as sharded
    line-delimited JSON (`Dataset.write_json` — the interchange format
    every webtext corpus ships in), read the shards back with
    `read_json`, and aggregate per language.  The oracle aggregates the
    parquet directly, so a hash match proves the round trip is
    lossless for (int64, string) payloads.  Scratch shards go under
    /tmp in a fresh directory per call (write_json into a reused dir
    would double-read stale shards)."""
    import shutil
    import tempfile

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    tmp = tempfile.mkdtemp(prefix="reden_io_jsonl_")
    try:
        docs.write_json(tmp)
        back = rd.read_json(tmp)
        out = (
            back.groupby("lang")
            .aggregate(
                Count(alias_name="n_docs"),
                Sum("n_chars", alias_name="total_chars"),
            )
            .materialize()  # consume the shards before they are removed
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out.map_batches(
        lambda t: pa.table(
            {
                "lang": t.column("lang"),
                "n_docs": t.column("n_docs").cast(pa.int64()),
                "total_chars": t.column("total_chars").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )


def io_csv_roundtrip(sf_dir: str) -> rd.Dataset:
    """CSV sink + source bridge (`Dataset.write_csv` / `read_csv`),
    same contract as io_jsonl_roundtrip: orders stream out as sharded
    CSV, back in, aggregated per status; hash match vs the parquet
    oracle proves losslessness for the int/string payload (floats are
    deliberately excluded — CSV float text round-trips are not
    bit-exact by construction)."""
    import shutil
    import tempfile

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
    tmp = tempfile.mkdtemp(prefix="reden_io_csv_")
    try:
        orders.write_csv(tmp)
        back = rd.read_csv(tmp)
        out = (
            back.groupby("o_orderstatus")
            .aggregate(
                Count(alias_name="n_orders"),
                Sum("o_orderkey", alias_name="keysum"),
            )
            .materialize()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out.map_batches(
        lambda t: pa.table(
            {
                "o_orderstatus": t.column("o_orderstatus"),
                "n_orders": t.column("n_orders").cast(pa.int64()),
                "keysum": t.column("keysum").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )


def profile_lineitem(sf_dir: str) -> rd.Dataset:
    """One-pass column profiler — the data-quality probe every corpus
    intake runs first: per numeric column (count, nulls, min, max,
    mean) computed as per-block vectorized partials (8 columns -> 8
    tiny rows per block) and ONE group-count-sized groupby.  No
    per-column scans, no distinct shuffle.  Oracle: a UNION ALL of
    per-column SQL aggregates."""
    cols = [
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    ]
    li = _read(sf_dir, "lineitem", cols)

    def partial(t: pa.Table) -> pa.Table:
        names, ns, nulls, mins, maxs, sums = [], [], [], [], [], []
        for c in cols:
            col = t.column(c)
            v = col.to_numpy(zero_copy_only=False).astype(np.float64)
            null_n = col.null_count
            ok = v[~np.isnan(v)] if null_n else v
            names.append(c)
            ns.append(len(v))
            nulls.append(null_n)
            mins.append(ok.min() if len(ok) else np.inf)
            maxs.append(ok.max() if len(ok) else -np.inf)
            sums.append(ok.sum())
        return pa.table(
            {
                "column_name": pa.array(names, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "n_null": pa.array(nulls, pa.int64()),
                "min_v": pa.array(mins, pa.float64()),
                "max_v": pa.array(maxs, pa.float64()),
                "s": pa.array(sums, pa.float64()),
            }
        )

    agg = (
        li.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("column_name")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("n_null", alias_name="n_null"),
            Min("min_v", alias_name="min_v"),
            Max("max_v", alias_name="max_v"),
            Sum("s", alias_name="s"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        nn = t.column("n_null").to_numpy(zero_copy_only=False).astype(np.float64)
        s = t.column("s").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "column_name": t.column("column_name"),
                "n": t.column("n").cast(pa.int64()),
                "n_null": t.column("n_null").cast(pa.int64()),
                "min_v": pa.array(
                    np.round(t.column("min_v").to_numpy(zero_copy_only=False), 6),
                    pa.float64(),
                ),
                "max_v": pa.array(
                    np.round(t.column("max_v").to_numpy(zero_copy_only=False), 6),
                    pa.float64(),
                ),
                # 4 dp half-AWAY: integer-column means are exact rationals
                # that land on .5 halves (sum(l_linenumber)/60000 =
                # 4.00525) where np.round's half-even and DuckDB ROUND's
                # half-away disagree; float-column means at 6 dp instead
                # hit summation-order knife-edges (l_tax mean
                # 0.03993149..), so 4 dp + half-away is the stable pair
                "mean_v": pa.array(
                    np.floor((s / (n - nn)) * 1e4 + 0.5) / 1e4, pa.float64()
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


def f6_dim_means(sf_dir: str) -> rd.Dataset:
    """Dimension-wise mean of the embedding column (the centroid
    statistic of embedding-space monitoring): zero-copy ListArray
    flatten -> (rows, dim) reshape -> per-block dim sums (dim rows per
    block, regardless of block size) -> one dim-sized groupby.  Sums
    run in float64 (the column is float32; DuckDB's avg also
    accumulates in double).  Oracle: constant generate_series(1, 64)
    cross join + list indexing."""
    emb = _read(sf_dir, "embeddings", ["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        col = t.column("embedding").combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        dim = len(flat) // max(t.num_rows, 1) if t.num_rows else 0
        if t.num_rows == 0 or dim == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "s": pa.array([], pa.float64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        m = flat.reshape(t.num_rows, dim)
        return pa.table(
            {
                "dim": pa.array(np.arange(dim, dtype=np.int64), pa.int64()),
                "s": pa.array(m.sum(axis=0), pa.float64()),
                "cnt": pa.array(np.full(dim, t.num_rows, dtype=np.int64), pa.int64()),
            }
        )

    agg = (
        emb.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("dim")
        .aggregate(Sum("s", alias_name="s"), Sum("cnt", alias_name="cnt"))
    )

    def finish(t: pa.Table) -> pa.Table:
        s = t.column("s").to_numpy(zero_copy_only=False)
        c = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "dim": t.column("dim"),
                "mean_v": pa.array(np.round(s / c, 6), pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


def graph_kcore(sf_dir: str) -> rd.Dataset:
    """Core number per part of the co-order graph via the iterated
    h-index fixpoint (stages/kcore.py — per-iteration cost is one
    value join + one coarse reduce, the PageRank shape).  Rows-only
    for the driver (iterative, not SQL-expressible); the recurrence is
    golden-locked against sequential peeling in tests/test_kcore.py."""
    from ..stages.kcore import core_numbers

    return core_numbers(_cooccur_edges(sf_dir, "l_orderkey", "l_partkey"))


def a22_mad_quantity(sf_dir: str) -> rd.Dataset:
    """Median absolute deviation — the robust-statistics pair
    (median, MAD = median(|x - median|)) computed as TWO chained
    distributed selections (`stages/selection.select_order_stats`,
    never collects the column): continuous median = mean of the two
    middle order statistics for even n, then the same over the
    absolute-deviation stream.  Matches DuckDB median()/mad()."""
    from ..stages.selection import select_order_stats

    li = _read(sf_dir, "lineitem", ["l_quantity"])

    def _median(ds: rd.Dataset, col: str) -> float:
        n = int(ds.count())
        if n == 0:
            return float("nan")
        if n % 2:
            ranks = [n // 2]
        else:
            ranks = [n // 2 - 1, n // 2]
        stats = select_order_stats(ds, col, sorted(set(ranks)))
        return float(np.mean([stats[r] for r in ranks]))

    med = _median(li, "l_quantity")

    dev = li.map_batches(
        lambda t: pa.table(
            {
                "adev": pa.array(
                    np.abs(
                        t.column("l_quantity").to_numpy(zero_copy_only=False)
                        - med
                    ),
                    pa.float64(),
                )
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    mad = _median(dev, "adev")
    return rd.from_arrow(
        pa.table(
            {
                "med": pa.array([round(med, 6)], pa.float64()),
                "mad": pa.array([round(mad, 6)], pa.float64()),
            }
        )
    )


def _coorder_degrees(e: rd.Dataset) -> rd.Dataset:
    """(node, d) undirected degree table from a canonical edge list —
    per-block np.unique partials, one node groupby."""

    def deg_partial(t: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [
                t.column("u").to_numpy(zero_copy_only=False),
                t.column("v").to_numpy(zero_copy_only=False),
            ]
        )
        uniq, cnt = np.unique(nodes, return_counts=True)
        return pa.table(
            {"node": pa.array(uniq, pa.int64()), "d": pa.array(cnt, pa.int64())}
        )

    return (
        e.map_batches(deg_partial, batch_format="pyarrow", batch_size=None)
        .groupby("node")
        .aggregate(Sum("d", alias_name="d"))
    )


def graph_assortativity(sf_dir: str) -> rd.Dataset:
    """Degree assortativity of the part co-order graph: Pearson
    correlation of endpoint degrees over the SYMMETRIZED edge list
    (Newman 2002).  Degrees join onto edges via cost-based smart_join
    (node-sized table — broadcast here, hash shuffle at scale); the
    correlation itself is the a16 centered two-pass shape: tiny means
    collect, centered block partials, one scalar combine.  Oracle:
    SQL corr() over the same symmetrized CTE."""
    from ..stages.joins import smart_join
    from ..stages.triangles import _distinct_edges

    e = _distinct_edges(
        _cooccur_edges(sf_dir, "l_orderkey", "l_partkey"), "u", "v"
    ).materialize()
    deg = _coorder_degrees(e).materialize()
    du = deg.map_batches(
        lambda t: pa.table({"u": t.column("node"), "du": t.column("d")}),
        batch_format="pyarrow",
        batch_size=None,
    )
    dv = deg.map_batches(
        lambda t: pa.table({"v": t.column("node"), "dv": t.column("d")}),
        batch_format="pyarrow",
        batch_size=None,
    )
    de = smart_join(smart_join(e, du, on=["u"]), dv, on=["v"])

    sym = de.map_batches(
        lambda t: pa.table(
            {
                "x": pa.array(
                    np.concatenate(
                        [
                            t.column("du").to_numpy(zero_copy_only=False),
                            t.column("dv").to_numpy(zero_copy_only=False),
                        ]
                    ).astype(np.float64),
                    pa.float64(),
                ),
                "y": pa.array(
                    np.concatenate(
                        [
                            t.column("dv").to_numpy(zero_copy_only=False),
                            t.column("du").to_numpy(zero_copy_only=False),
                        ]
                    ).astype(np.float64),
                    pa.float64(),
                ),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    ).materialize()

    # centered two-pass correlation (single pseudo-group "k")
    means = sym.aggregate(Mean("x"), Mean("y"))
    mx, my = means["mean(x)"], means["mean(y)"]

    def partial(t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy(zero_copy_only=False) - mx
        y = t.column("y").to_numpy(zero_copy_only=False) - my
        return pa.table(
            {
                "sxy": pa.array([float((x * y).sum())], pa.float64()),
                "sxx": pa.array([float((x * x).sum())], pa.float64()),
                "syy": pa.array([float((y * y).sum())], pa.float64()),
            }
        )

    sums = sym.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).aggregate(Sum("sxy"), Sum("sxx"), Sum("syy"))
    r = sums["sum(sxy)"] / np.sqrt(sums["sum(sxx)"] * sums["sum(syy)"])
    return rd.from_arrow(
        pa.table({"assortativity": pa.array([round(float(r), 6)], pa.float64())})
    )


def graph_clustering_coeff(sf_dir: str) -> rd.Dataset:
    """Per-node local clustering coefficient of the part co-order
    graph: cc(n) = closed wedges at n / C(d, 2).  Wedge expansion per
    CENTER (the linkpred shape, center carried through), closure
    tested against a BROADCAST sorted composite-key edge array
    (np.searchsorted per batch — the edge set is |E|-sized and fits
    here; at corpus scale swap in shuffle_semi_join), per-center
    closed-wedge counts via the coarse pair reduce, degrees joined
    back via smart_join.  Output (node, d, cc) for every node with
    d >= 2, cc rounded 6 dp half-away (count-ratio halves).  Oracle:
    adjacency self-join + edge join + LEFT JOIN onto degrees."""
    import ray

    from ..stages.joins import smart_join
    from ..stages.partition import expansion_partitions, part_column
    from ..stages.triangles import _distinct_edges

    e = _distinct_edges(
        _cooccur_edges(sf_dir, "l_orderkey", "l_partkey"), "u", "v"
    ).materialize()
    deg = _coorder_degrees(e).materialize()

    # broadcast the canonical edge set as one sorted composite array
    def comp(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False).astype(np.uint64)
        v = t.column("v").to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table({"c": pa.array((u << np.uint64(32)) | v, pa.uint64())})

    keys = np.sort(
        np.concatenate(
            [
                t.column("c").to_numpy(zero_copy_only=False)
                for t in (ray.get(r) for r in e.map_batches(
                    comp, batch_format="pyarrow", batch_size=None
                ).to_arrow_refs())
                if t.num_rows
            ]
        )
    )
    keys_ref = ray.put(keys)

    def both_dirs(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(np.concatenate([u, v]), pa.int64()),
                "nbr": pa.array(np.concatenate([v, u]), pa.int64()),
            }
        )

    n_parts = expansion_partitions()

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, ["node"], n_parts))

    def closed_wedges(g: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        g = g.drop_columns("__part").sort_by(
            [("node", "ascending"), ("nbr", "ascending")]
        )
        c = g.column("node").to_numpy(zero_copy_only=False)
        nb = g.column("nbr").to_numpy(zero_copy_only=False)
        n = len(c)
        starts = np.flatnonzero(np.concatenate([[True], c[1:] != c[:-1]]))
        ends = np.concatenate([starts[1:], [n]])
        nodes, ts = [], []
        for st, en in zip(starts, ends):
            d = en - st
            if d < 2:
                continue
            nbrs = nb[st:en]
            iu = np.triu_indices(d, 1)
            a = nbrs[iu[0]].astype(np.uint64)
            b = nbrs[iu[1]].astype(np.uint64)
            kk = (a << np.uint64(32)) | b
            pos = np.searchsorted(ks, kk)
            pos = np.minimum(pos, len(ks) - 1)
            t_n = int((ks[pos] == kk).sum())
            nodes.append(int(c[st]))
            ts.append(t_n)
        return pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "t": pa.array(ts, pa.int64()),
            }
        )

    tri = (
        e.map_batches(both_dirs, batch_format="pyarrow", batch_size=None)
        .map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(closed_wedges, batch_format="pyarrow")
    )
    from ..stages.joins import staged_nonempty

    tri_staged = staged_nonempty(tri)
    dd = deg.map_batches(
        lambda t: t.filter(
            pa.compute.greater_equal(t.column("d"), pa.scalar(2))
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    if tri_staged is None:
        joined = dd.map_batches(
            lambda t: t.append_column(
                "t", pa.array(np.zeros(t.num_rows, dtype=np.int64), pa.int64())
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
    else:
        joined = smart_join(dd, tri_staged, on=["node"], how="left_outer")

    def finish(t: pa.Table) -> pa.Table:
        d = t.column("d").to_numpy(zero_copy_only=False).astype(np.float64)
        tt = t.column("t").to_numpy(zero_copy_only=False).astype(np.float64)
        tt = np.nan_to_num(tt)  # left-outer nulls -> 0 closed wedges
        cc = 2.0 * tt / (d * (d - 1.0))
        return pa.table(
            {
                "node": t.column("node").cast(pa.int64()),
                "d": t.column("d").cast(pa.int64()),
                "cc": pa.array(np.floor(cc * 1e6 + 0.5) / 1e6, pa.float64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow", batch_size=None)


def f7_label_centroids(sf_dir: str) -> rd.Dataset:
    """Per-label embedding centroids (the grouped tensor aggregate of
    embedding-space monitoring): each block scatter-adds its vectors
    into a (labels x dims) partial via np.add.at — label-count x dim
    rows per block regardless of block size — then one small groupby.
    Oracle: constant generate_series + list index, GROUP BY label."""
    emb = _read(sf_dir, "embeddings", ["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "s": pa.array([], pa.float64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        lab = t.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        col = t.column("embedding").combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        dim = len(flat) // t.num_rows
        m = flat.reshape(t.num_rows, dim)
        uniq, inv, cnt = np.unique(lab, return_inverse=True, return_counts=True)
        sums = np.zeros((len(uniq), dim))
        np.add.at(sums, inv, m)
        nl = len(uniq)
        return pa.table(
            {
                "label": pa.array(np.repeat(uniq, dim), pa.int64()),
                "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), nl), pa.int64()),
                "s": pa.array(sums.ravel(), pa.float64()),
                "cnt": pa.array(np.repeat(cnt, dim), pa.int64()),
            }
        )

    agg = (
        emb.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["label", "dim"])
        .aggregate(Sum("s", alias_name="s"), Sum("cnt", alias_name="cnt"))
    )

    def finish(t: pa.Table) -> pa.Table:
        s = t.column("s").to_numpy(zero_copy_only=False)
        c = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "label": t.column("label").cast(pa.int64()),
                "dim": t.column("dim").cast(pa.int64()),
                "mean_v": pa.array(np.round(s / c, 6), pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


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


def graph_degree_hist(sf_dir: str) -> rd.Dataset:
    """Degree distribution of the part co-order graph — the first
    sanity plot of any graph pipeline: degrees via the per-block
    np.unique partial reduce, then one tiny groupby over the degree
    value."""
    from ..stages.triangles import _distinct_edges

    e = _distinct_edges(
        _cooccur_edges(sf_dir, "l_orderkey", "l_partkey"), "u", "v"
    )
    deg = _coorder_degrees(e)
    return (
        deg.groupby("d")
        .count()
        .map_batches(
            lambda t: pa.table(
                {
                    "d": t.column("d").cast(pa.int64()),
                    "n_nodes": t.column("count()").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
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


def a23_group_percentile_cont(sf_dir: str, q: float = 0.5) -> rd.Dataset:
    """Per-group CONTINUOUS (interpolated) percentile over a discrete
    value domain — the companion to a11's discrete quantile: per-block
    (group, value, count) histogram partials, one tiny shuffle, then a
    vectorized per-group cumulative scan that interpolates between the
    values at ranks floor/ceil((n-1)q).  State is bounded by the value
    DOMAIN (quantity has 50 levels), never by rows.  Matches DuckDB
    percentile_cont WITHIN GROUP."""
    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def hist(t: pa.Table) -> pa.Table:
        agg = t.group_by(["l_returnflag", "l_quantity"]).aggregate(
            [("l_quantity", "count")]
        )
        return agg.rename_columns(["l_returnflag", "l_quantity", "cnt"])

    h = (
        li.map_batches(hist, batch_format="pyarrow", batch_size=None)
        .groupby(["l_returnflag", "l_quantity"])
        .sum("cnt")
        .map_batches(
            lambda t: t.rename_columns(["l_returnflag", "l_quantity", "cnt"]),
            batch_format="pyarrow",
            batch_size=None,
        )
        .repartition(1)  # <= groups x domain rows by construction
    )

    def interp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "l_returnflag": pa.array([], pa.string()),
                    "p_cont": pa.array([], pa.float64()),
                }
            )
        t = t.sort_by(
            [("l_returnflag", "ascending"), ("l_quantity", "ascending")]
        )
        k = np.asarray(t.column("l_returnflag").to_pylist(), dtype=object)
        v = t.column("l_quantity").to_numpy(zero_copy_only=False).astype(np.float64)
        c = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.flatnonzero(np.concatenate([[True], k[1:] != k[:-1]]))
        ends = np.concatenate([starts[1:], [len(k)]])
        names, ps = [], []
        for st, en in zip(starts, ends):
            cc = np.cumsum(c[st:en])
            n = cc[-1]
            r = (n - 1) * q
            lo, hi = int(np.floor(r)), int(np.ceil(r))
            vlo = v[st + np.searchsorted(cc, lo + 1)]
            vhi = v[st + np.searchsorted(cc, hi + 1)]
            names.append(k[st])
            ps.append(vlo + (r - lo) * (vhi - vlo))
        return pa.table(
            {
                "l_returnflag": pa.array(names, pa.string()),
                "p_cont": pa.array(np.round(ps, 6), pa.float64()),
            }
        )

    return h.map_batches(interp, batch_format="pyarrow", batch_size=None)


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


def text_top_terms_by_lang(sf_dir: str, top_n: int = 5) -> rd.Dataset:
    """Per-GROUP exact top-n terms (top vocabulary per language): the
    text_top_terms plan with the language key carried through — per
    block (lang, term) partial counts, one combine, then the o5
    rank-per-group partial top-k under a coarse lang-hash partition
    (per-group state bounded by top_n through the merge)."""
    from ..stages.joins import default_join_partitions
    from ..stages.partition import part_column

    docs = _read(sf_dir, "documents", ["lang", "text"])

    def tok(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t.column("text")), pattern=r"[ \t\n\r\f\v]+"
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        n_per = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        lang = np.repeat(
            np.asarray(t.column("lang").to_pylist(), dtype=object), n_per
        )
        flat = toks.flatten()
        tt = pa.table(
            {"lang": pa.array(lang, pa.string()), "term": flat}
        ).filter(pc.not_equal(flat, ""))
        c = tt.group_by(["lang", "term"]).aggregate([("term", "count")])
        return c.rename_columns(["lang", "term", "n"])

    n_parts = default_join_partitions()
    counts = (
        docs.map_batches(tok, batch_format="pyarrow", batch_size=None)
        .groupby(["lang", "term"])
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns(["lang", "term", "n"]),
            batch_format="pyarrow",
            batch_size=None,
        )
    )

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, ["lang"], n_parts))

    def group_top(g: pa.Table) -> pa.Table:
        g = g.drop_columns("__part").sort_by(
            [("lang", "ascending"), ("n", "descending"), ("term", "ascending")]
        )
        lang = np.asarray(g.column("lang").to_pylist(), dtype=object)
        n = len(lang)
        starts = np.flatnonzero(np.concatenate([[True], lang[1:] != lang[:-1]]))
        seg = np.zeros(n, dtype=np.int64)
        seg[starts[1:]] = 1
        seg = np.cumsum(seg)
        rank = np.arange(n, dtype=np.int64) - starts[seg]
        kept = g.filter(pa.array(rank < top_n))
        return pa.table(
            {
                "lang": kept.column("lang"),
                "term": kept.column("term"),
                "n": kept.column("n").cast(pa.int64()),
            }
        )

    return (
        counts.map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(group_top, batch_format="pyarrow")
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


def f8_conditional_agg(sf_dir: str) -> rd.Dataset:
    """FILTER-clause conditional aggregates per group (the CASE/FILTER
    SQL idiom): revenue only from discounted rows, counts above a
    quantity threshold, discounted-row share — all computed in one
    vectorized block partial + one tiny groupby (no second scan per
    condition).  Half-away 6 dp on the share (count ratio)."""
    li = _read(
        sf_dir, "lineitem",
        ["l_returnflag", "l_extendedprice", "l_discount", "l_quantity"],
    )

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        k = t.column("l_returnflag").to_pylist()
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        qty = t.column("l_quantity").to_numpy(zero_copy_only=False)
        discounted = disc > 0.05
        df = pd.DataFrame(
            {
                "k": k,
                "disc_rev": np.where(discounted, price * (1 - disc), 0.0),
                "n_bigqty": (qty >= 30).astype(np.int64),
                "n_disc": discounted.astype(np.int64),
                "n": 1,
            }
        )
        g = df.groupby("k", as_index=False).sum()
        return pa.table(
            {
                "l_returnflag": pa.array(g.k, pa.string()),
                "disc_rev": pa.array(g.disc_rev, pa.float64()),
                "n_bigqty": pa.array(g.n_bigqty, pa.int64()),
                "n_disc": pa.array(g.n_disc, pa.int64()),
                "n": pa.array(g.n, pa.int64()),
            }
        )

    agg = (
        li.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("l_returnflag")
        .aggregate(
            Sum("disc_rev", alias_name="disc_rev"),
            Sum("n_bigqty", alias_name="n_bigqty"),
            Sum("n_disc", alias_name="n_disc"),
            Sum("n", alias_name="n"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        share = (
            t.column("n_disc").to_numpy(zero_copy_only=False)
            / t.column("n").to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "disc_rev": pa.array(
                    np.round(t.column("disc_rev").to_numpy(zero_copy_only=False), 2),
                    pa.float64(),
                ),
                "n_bigqty": t.column("n_bigqty").cast(pa.int64()),
                "disc_share": pa.array(
                    np.floor(share * 1e6 + 0.5) / 1e6, pa.float64()
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


def dq_checks(sf_dir: str) -> pa.Table:
    """Data-quality validation suite — the expectations pass every
    training-data ingest runs before spending compute downstream
    (null keys, duplicate primary keys, referential-integrity orphans,
    range violations).  Each check is scale-safe on its own terms:

    - null / range checks: per-block Sum partials -> one tiny aggregate
      (never a second scan per condition);
    - duplicate keys: count minus exact distinct via per-block unique
      partials + one key-hash groupby;
    - orphans: both-sides-large ``shuffle_anti_join`` on the key (no
      driver collect, no broadcast of a corpus-sized key set).

    Output is a tiny (check_name, violations) table; the checks
    themselves stream."""
    from ..stages.joins import shuffle_anti_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    cust = _read(sf_dir, "customer", ["c_name"])
    ev = _read(sf_dir, "events", ["value"])

    def ord_partial(t: pa.Table) -> pa.Table:
        price = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "nonpos_price": pa.array(
                    [int((price <= 0).sum())], pa.int64()
                ),
                "null_cust": pa.array(
                    [t.column("o_custkey").null_count], pa.int64()
                ),
            }
        )

    def li_partial(t: pa.Table) -> pa.Table:
        q = t.column("l_quantity").to_numpy(zero_copy_only=False)
        return pa.table(
            {"qty_oob": pa.array([int(((q < 1) | (q > 50)).sum())], pa.int64())}
        )

    def null_partial(col: str):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({"n_null": pa.array([t.column(col).null_count], pa.int64())})

        return f

    ord_sums = (
        orders.map_batches(ord_partial, batch_format="pyarrow", batch_size=None)
        .aggregate(Sum("nonpos_price"), Sum("null_cust"))
    )
    li_oob = (
        li.map_batches(li_partial, batch_format="pyarrow", batch_size=None)
        .aggregate(Sum("qty_oob"))["sum(qty_oob)"]
    )
    cust_null = (
        cust.map_batches(null_partial("c_name"), batch_format="pyarrow", batch_size=None)
        .aggregate(Sum("n_null"))["sum(n_null)"]
    )
    ev_null = (
        ev.map_batches(null_partial("value"), batch_format="pyarrow", batch_size=None)
        .aggregate(Sum("n_null"))["sum(n_null)"]
    )

    # exact distinct o_orderkey: per-block unique partial, one groupby
    def key_unique(t: pa.Table) -> pa.Table:
        k = np.unique(t.column("o_orderkey").to_numpy(zero_copy_only=False))
        return pa.table({"o_orderkey": pa.array(k, pa.int64())})

    n_orders = orders.count()
    n_distinct = (
        orders.select_columns(["o_orderkey"])
        .map_batches(key_unique, batch_format="pyarrow", batch_size=None)
        .groupby("o_orderkey")
        .count()
        .count()
    )

    orphans = shuffle_anti_join(
        li.select_columns(["l_orderkey"]).rename_columns({"l_orderkey": "o_orderkey"}),
        orders.select_columns(["o_orderkey"]),
        on=["o_orderkey"],
    ).count()

    checks = {
        "customer_null_name": int(cust_null),
        "events_null_value": int(ev_null),
        "lineitem_orphans": int(orphans),
        "lineitem_qty_out_of_range": int(li_oob),
        "orders_dup_keys": int(n_orders - n_distinct),
        "orders_nonpositive_price": int(ord_sums["sum(nonpos_price)"]),
        "orders_null_custkey": int(ord_sums["sum(null_cust)"]),
    }
    names = sorted(checks)
    return pa.table(
        {
            "check_name": pa.array(names, pa.string()),
            "violations": pa.array([checks[n] for n in names], pa.int64()),
        }
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


def f9_quantile_bucket(sf_dir: str) -> rd.Dataset:
    """Quantile binning — the feature-engineering primitive that tags
    each row with its global quartile.  Exact quartile breakpoints come
    from the distributed-selection ``percentile_cont`` (no sort, no
    collect); they broadcast as three floats into a vectorized
    ``np.searchsorted`` bucket map, then ONE tiny 4-row groupby.
    Half-away 2 dp on min/max (DuckDB ROUND is half-away)."""
    from ..stages.selection import percentile_cont

    orders = _read(sf_dir, "orders", ["o_totalprice"])
    qs = percentile_cont(orders, "o_totalprice", [0.25, 0.5, 0.75])
    breaks = np.array([qs[0.25], qs[0.5], qs[0.75]], dtype=np.float64)

    def bucket_partial(t: pa.Table) -> pa.Table:
        price = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        b = np.searchsorted(breaks, price, side="left") + 1
        tt = pa.table(
            {
                "bucket": pa.array(b.astype(np.int64)),
                "price": pa.array(price, pa.float64()),
            }
        )
        g = tt.group_by("bucket").aggregate(
            [("price", "count"), ("price", "min"), ("price", "max")]
        )
        return g.rename_columns(["bucket", "n", "mn", "mx"])

    agg = (
        orders.map_batches(bucket_partial, batch_format="pyarrow", batch_size=None)
        .groupby("bucket")
        .aggregate(
            Sum("n", alias_name="n_orders"),
            Min("mn", alias_name="mn"),
            Max("mx", alias_name="mx"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        def r2(col):
            v = t.column(col).to_numpy(zero_copy_only=False)
            return pa.array(np.floor(v * 100 + 0.5) / 100, pa.float64())

        return pa.table(
            {
                "bucket": t.column("bucket").cast(pa.int64()),
                "n_orders": t.column("n_orders").cast(pa.int64()),
                "min_price": r2("mn"),
                "max_price": r2("mx"),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


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


_COV_DIMS = 8


def emb_covariance(sf_dir: str) -> rd.Dataset:
    """Distributed covariance matrix over the first 8 embedding dims —
    the X^T X partial-sums pattern that PCA / whitening / Mahalanobis
    pipelines run at corpus scale: each block contributes ONE numpy
    matmul (d x d sums, d sums, n) re-shaped to d^2 partial rows; a
    64-row groupby combines; cov = E[xy] - E[x]E[y] (population).
    Nothing corpus-sized ever leaves the blocks."""
    emb = _read(sf_dir, "embeddings", ["embedding"])
    d = _COV_DIMS
    ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")

    def partial(t: pa.Table) -> pa.Table:
        col = t.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = col.values.to_numpy(zero_copy_only=False)
        dim = int(offsets[1] - offsets[0]) if len(offsets) > 1 else 0
        if not np.all(np.diff(offsets) == dim):  # fail loudly on ragged rows
            raise ValueError("emb_covariance requires fixed-dim embeddings")
        mat = (
            flat[offsets[0]: offsets[-1]]
            .astype(np.float64)
            .reshape(-1, dim)[:, :d]
        )
        n = mat.shape[0]
        xtx = mat.T @ mat
        sx = mat.sum(axis=0)
        return pa.table(
            {
                "i": pa.array(ii.ravel(), pa.int64()),
                "j": pa.array(jj.ravel(), pa.int64()),
                "sxy": pa.array(xtx.ravel(), pa.float64()),
                "sxi": pa.array(np.repeat(sx, d), pa.float64()),
                "sxj": pa.array(np.tile(sx, d), pa.float64()),
                "n": pa.array(np.full(d * d, n, dtype=np.int64)),
            }
        )

    agg = (
        emb.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["i", "j"])
        .aggregate(
            Sum("sxy", alias_name="sxy"),
            Sum("sxi", alias_name="sxi"),
            Sum("sxj", alias_name="sxj"),
            Sum("n", alias_name="n"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        sxy = t.column("sxy").to_numpy(zero_copy_only=False)
        sxi = t.column("sxi").to_numpy(zero_copy_only=False)
        sxj = t.column("sxj").to_numpy(zero_copy_only=False)
        cov = sxy / n - (sxi / n) * (sxj / n)
        return pa.table(
            {
                "i": t.column("i").cast(pa.int64()),
                "j": t.column("j").cast(pa.int64()),
                "cov": pa.array(np.round(cov, 6), pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


def f10_explode_tokens(sf_dir: str) -> rd.Dataset:
    """Positional explode (UNNEST WITH ORDINALITY): the first 32
    whitespace tokens of every document with their position — fully
    vectorized Arrow regex split + numpy offset arithmetic (repeat doc
    ids by list length, position = arange minus each list's start);
    empty tokens from leading/repeated separators are masked BEFORE
    positions are assigned, matching the oracle's list_filter."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    cap = 32

    def explode(t: pa.Table) -> pa.Table:
        col = t.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern_regex(col, pattern=r"\s+")
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        base = int(offsets[0]) if len(offsets) else 0
        vals = toks.values
        vnp = vals.to_numpy(zero_copy_only=False)[base:]
        counts = np.diff(offsets - base)
        did = np.repeat(
            t.column("doc_id").to_numpy(zero_copy_only=False), counts
        )
        keep = vnp != ""
        did, vnp = did[keep], vnp[keep]
        # positions within each doc's surviving token run (runs stay
        # contiguous after the mask)
        if len(did):
            new = np.empty(len(did), dtype=bool)
            new[0] = True
            new[1:] = did[1:] != did[:-1]
            starts = np.flatnonzero(new)
            runs = np.diff(np.r_[starts, len(did)])
            pos = np.arange(len(did), dtype=np.int64) - np.repeat(starts, runs)
        else:
            pos = np.empty(0, dtype=np.int64)
        inside = pos < cap
        return pa.table(
            {
                "doc_id": pa.array(did[inside], pa.int64()),
                "pos": pa.array(pos[inside], pa.int64()),
                "token": pa.array(vnp[inside], pa.string()),
            }
        )

    return docs.map_batches(explode, batch_format="pyarrow", batch_size=None)


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


def zorder_layout(sf_dir: str) -> rd.Dataset:
    """Z-order (Morton) layout key — the space-filling-curve sort that
    co-locates rows close in BOTH join keys so min/max row-group stats
    prune 2-D range scans (the Delta/Iceberg OPTIMIZE ZORDER idea).
    16-bit lanes here (fixture keys < 2^16; production uses 32-bit
    lanes, same shift arithmetic).  The interleave is pure vectorized
    int64 bit math; the global top-20 never sorts the corpus — per-block
    partial top-k, then one small merge sort (the o1 shape)."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"])
    k = 20

    def zkey_topk(t: pa.Table) -> pa.Table:
        p = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        s = t.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        z = np.zeros(len(p), dtype=np.int64)
        for b in range(16):
            z |= ((p >> b) & 1) << (2 * b)
            z |= ((s >> b) & 1) << (2 * b + 1)
        tt = pa.table(
            {
                "l_orderkey": t.column("l_orderkey").cast(pa.int64()),
                "l_linenumber": t.column("l_linenumber").cast(pa.int64()),
                "zkey": pa.array(z, pa.int64()),
            }
        )
        idx = pc.sort_indices(
            tt,
            sort_keys=[
                ("zkey", "ascending"),
                ("l_orderkey", "ascending"),
                ("l_linenumber", "ascending"),
            ],
        )
        return tt.take(idx[:k])

    partials = li.map_batches(zkey_topk, batch_format="pyarrow", batch_size=None)
    return partials.sort(["zkey", "l_orderkey", "l_linenumber"]).limit(k)


def pmi_part_pairs(sf_dir: str) -> rd.Dataset:
    """Pointwise-mutual-information association mining over parts that
    co-occur in an order — the market-basket / collocation primitive
    (PMI = ln(c_uv * N / (c_u * c_v)), support >= 3, top-20).

    Scale shape: distinct (order, part) dedupe -> per-ORDER pair
    expansion inside a coarse key-hash map_groups (fan-in bounded) with
    block-local (u, v) pre-combine -> ONE pair-hash coarse-partition
    reduce (never a native pair-keyed groupby, per CLAUDE.md) ->
    node-sized count table attached via cost-based smart_join
    (broadcasts while small, hash-shuffles past the threshold) ->
    per-block partial top-20 + one small merge (the o1 shape; the
    pair-sized stream is never globally sorted).  Ordering ties break
    on the ROUNDED pmi then (u, v) on both sides."""
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
        .materialize()  # three consumers: N, part counts, pair expansion
    )

    n_orders = int(
        op.groupby("l_orderkey").count().count()
    )

    part_counts = op.groupby("l_partkey").count()  # node-sized: (part, count())

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
        if n == 0:
            return pa.table(
                {"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64()),
                 "cuv": pa.array([], pa.int64())}
            )
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
            return pa.table(
                {"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64()),
                 "cuv": pa.array([], pa.int64())}
            )
        tt = pa.table(
            {"u": pa.array(np.concatenate(us), pa.int64()),
             "v": pa.array(np.concatenate(vs), pa.int64())}
        )
        # block-local pre-combine before the pair shuffle
        cg = tt.group_by(["u", "v"]).aggregate([([], "count_all")])
        return cg.rename_columns(["u", "v", "cuv"])

    def tag_pair(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, ["u", "v"], n_parts))

    def reduce_pairs(g: pa.Table) -> pa.Table:
        g = g.drop_columns("__part")
        return g.group_by(["u", "v"]).aggregate([("cuv", "sum")]).rename_columns(
            ["u", "v", "cuv"]
        )

    pairs = (
        op.map_batches(tag_order, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(expand, batch_format="pyarrow", num_cpus=1)
        .map_batches(tag_pair, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(reduce_pairs, batch_format="pyarrow", num_cpus=1)
        .map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("cuv"), 3)),
            batch_format="pyarrow",
            batch_size=None,
        )
    )

    cu = part_counts.rename_columns({"l_partkey": "u", "count()": "cu"})
    cv = part_counts.rename_columns({"l_partkey": "v", "count()": "cv"})
    joined = smart_join(smart_join(pairs, cu, on=["u"]), cv, on=["v"])

    k = 20

    def score_topk(t: pa.Table) -> pa.Table:
        cuv = t.column("cuv").to_numpy(zero_copy_only=False).astype(np.float64)
        cun = t.column("cu").to_numpy(zero_copy_only=False).astype(np.float64)
        cvn = t.column("cv").to_numpy(zero_copy_only=False).astype(np.float64)
        pmi = np.round(np.log(cuv * n_orders / (cun * cvn)), 6)
        tt = pa.table(
            {
                "u": t.column("u").cast(pa.int64()),
                "v": t.column("v").cast(pa.int64()),
                "cuv": t.column("cuv").cast(pa.int64()),
                "pmi": pa.array(pmi, pa.float64()),
            }
        )
        idx = pc.sort_indices(
            tt,
            sort_keys=[("pmi", "descending"), ("u", "ascending"), ("v", "ascending")],
        )
        return tt.take(idx[:k])

    partials = joined.map_batches(score_topk, batch_format="pyarrow", batch_size=None)
    return partials.sort(["pmi", "u", "v"], descending=[True, False, False]).limit(k)


_KNUTH = 2654435761
_MOD32 = 4294967296


def mix_sources_balanced(sf_dir: str) -> rd.Dataset:
    """Domain mixing / source rebalancing — the Pile/Dolma-style
    \"sample each domain toward target proportions\" step of a training
    mix.  Equal target weights here: every source is deterministically
    downsampled toward the SMALLEST source's size (rate_s = min_n /
    n_s) with the o10 Knuth multiplicative hash, so the selection is
    reproducible row-by-row on both sides and needs no shuffle at all:
    per-source counts are one tiny groupby; the selection itself is a
    stateless vectorized filter over the stream."""
    docs = _read(sf_dir, "documents", ["doc_id", "source"])
    cnt = docs.groupby("source").count().take_all()  # dimension-sized rows
    min_n = min(r["count()"] for r in cnt)
    # threshold_s = round_half_away(rate_s * 2^32), matching DuckDB's
    # double->BIGINT cast
    thr = {
        r["source"]: int(np.floor(min_n / r["count()"] * _MOD32 + 0.5))
        for r in cnt
    }

    def pick(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        src = t.column("source").to_numpy(zero_copy_only=False)
        h = (did * _KNUTH) % _MOD32
        lim = np.array([thr[s] for s in src], dtype=np.int64)
        return t.filter(pa.array(h < lim))

    return docs.map_batches(pick, batch_format="pyarrow", batch_size=None)


def split_train_val_test(sf_dir: str) -> rd.Dataset:
    """Deterministic 80/10/10 train/val/test split by key hash — the
    canonical leakage-safe split (same doc always lands in the same
    split, regardless of partitioning or cluster size).  Output is the
    (source, split, n_docs) audit table; the assignment itself is a
    stateless vectorized map."""
    docs = _read(sf_dir, "documents", ["doc_id", "source"])
    t80 = int(np.floor(0.8 * _MOD32 + 0.5))
    t90 = int(np.floor(0.9 * _MOD32 + 0.5))

    def assign(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        h = (did * _KNUTH) % _MOD32
        split = np.where(h < t80, "train", np.where(h < t90, "val", "test"))
        tt = pa.table(
            {"source": t.column("source"), "split": pa.array(split, pa.string())}
        )
        g = tt.group_by(["source", "split"]).aggregate([([], "count_all")])
        return g.rename_columns(["source", "split", "n"])

    return (
        docs.map_batches(assign, batch_format="pyarrow", batch_size=None)
        .groupby(["source", "split"])
        .aggregate(Sum("n", alias_name="n_docs"))
    )


def io_partitioned_write(sf_dir: str) -> rd.Dataset:
    """Hive-partitioned parquet sink + partition-pruned re-read — the
    resumable-output layout this engine writes at scale (one directory
    per key so a failed run skips finished partitions, and a reader
    interested in one key touches one directory).  Documents are
    written partitioned by ``lang``, a SINGLE partition directory is
    then re-read (path-level pruning: the other partitions' bytes are
    never opened), and per-source stats over that slice are oracled
    against the parquet directly — a hash match proves the partitioned
    round trip is lossless AND the pruning reads exactly the one
    partition."""
    import shutil
    import tempfile

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "source", "n_chars"])
    tmp = tempfile.mkdtemp(prefix="reden_io_part_")
    try:
        docs.write_parquet(tmp, partition_cols=["lang"])
        # partition-pruned read: ONLY the lang=en directory
        back = rd.read_parquet(f"{tmp}/lang=en")
        out = (
            back.groupby("source")
            .aggregate(
                Count(alias_name="n_docs"),
                Sum("n_chars", alias_name="total_chars"),
            )
            .materialize()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out.map_batches(
        lambda t: pa.table(
            {
                "source": t.column("source"),
                "n_docs": t.column("n_docs").cast(pa.int64()),
                "total_chars": t.column("total_chars").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )


def emb_quantize_error(sf_dir: str) -> rd.Dataset:
    """Int8 vector quantization + reconstruction-error audit — the
    compression step vector stores apply before ANN serving (scale =
    per-DIMENSION max |x| over the corpus; q = round(x * 127 / scale);
    err = max_dim |x - q * scale / 127|).  Two streaming passes: per-
    block |x| max partials -> one 64-row dim groupby (broadcast back as
    a numpy row); then a stateless vectorized quantize/dequantize map.
    Rounding is half-AWAY on both sides (np.round is half-even and
    DuckDB ROUND is not; sign-split floor(|x|+0.5) matches)."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def _mat(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        col = t.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = col.values.to_numpy(zero_copy_only=False)
        dim = int(offsets[1] - offsets[0]) if len(offsets) > 1 else 0
        if not np.all(np.diff(offsets) == dim):  # fail loudly on ragged rows
            raise ValueError("emb_quantize_error requires fixed-dim embeddings")
        mat = flat[offsets[0]: offsets[-1]].astype(np.float64).reshape(-1, dim)
        return mat, offsets

    def absmax_partial(t: pa.Table) -> pa.Table:
        mat, _ = _mat(t)
        am = np.abs(mat).max(axis=0)
        return pa.table(
            {
                "dim": pa.array(np.arange(len(am)), pa.int64()),
                "am": pa.array(am, pa.float64()),
            }
        )

    scale_rows = (
        emb.map_batches(absmax_partial, batch_format="pyarrow", batch_size=None)
        .groupby("dim")
        .aggregate(Max("am", alias_name="am"))
        .take_all()  # <= dim rows
    )
    scale = np.empty(len(scale_rows), dtype=np.float64)
    for r in scale_rows:
        scale[r["dim"]] = r["am"] if r["am"] > 0 else 1.0

    def quant_err(t: pa.Table) -> pa.Table:
        mat, _ = _mat(t)
        if mat.shape[1] != len(scale):  # cross-BLOCK raggedness
            raise ValueError(
                "emb_quantize_error requires fixed-dim embeddings "
                f"(block dim {mat.shape[1]} != corpus dim {len(scale)})"
            )
        x = mat * (127.0 / scale)
        q = np.sign(x) * np.floor(np.abs(x) + 0.5)  # half-away, like DuckDB
        q = np.clip(q, -127, 127)
        err = np.abs(mat - q * (scale / 127.0)).max(axis=1)
        return pa.table(
            {
                "vec_id": t.column("vec_id").cast(pa.int64()),
                "max_err": pa.array(np.floor(err * 1e6 + 0.5) / 1e6, pa.float64()),
            }
        )

    return emb.map_batches(quant_err, batch_format="pyarrow", batch_size=None)


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
