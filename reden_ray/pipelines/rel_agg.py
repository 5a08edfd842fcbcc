"""Aggregate / statistics / sampling queries (split from relational.py)."""

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
from .rel_vec import _centered_sums

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


def rank_sketch_quantile_price(sf_dir: str) -> pa.Table:
    """Merge-reduce RANK-error quantile sketch (stages/qsketch.py) over
    l_extendedprice, DRIVER-ORACLED via the sketch's self-carried
    certificate: the sketch accumulates a hard rank-error bound from
    its own halvings, and the query verifies |true_rank(answer) -
    ceil(q*N)| <= err with one distributed counting pass (count_lt /
    count_le per answer — ties certified by the two-sided window).
    The rank-guarantee member of the sketch family, complementing the
    VALUE-bound histogram sketch (``approx_quantile_price``) on
    heavy-tailed domains where a bin width is meaningless.  Emits the
    EXACT discrete quantiles (distributed selection) plus ``bound_ok``;
    oracle = probed ``quantile_disc`` with TRUE."""
    import math

    from ray.data.aggregate import AggregateFn

    from ..stages.qsketch import quantile_sketch, sketch_quantile
    from ..stages.selection import select_order_stats

    li = _read(sf_dir, "lineitem", ["l_extendedprice"])
    qs = [0.25, 0.5, 0.75, 0.99]
    vals, wts, err = quantile_sketch(li, "l_extendedprice", k=256)
    n = int(li.count())  # NOT aggregate(Count()): 0 on arrow blocks (Ray 2.49)
    answers = {q: sketch_quantile(vals, wts, q)[0] for q in qs}
    ans_arr = np.array([answers[q] for q in qs])

    def acc(counts: np.ndarray, block: pa.Table) -> np.ndarray:
        v = block.column("l_extendedprice").to_numpy(zero_copy_only=False)
        lt = np.array([(v < a).sum() for a in ans_arr], dtype=np.int64)
        le = np.array([(v <= a).sum() for a in ans_arr], dtype=np.int64)
        return counts + np.concatenate([lt, le])

    fn = AggregateFn(
        init=lambda _k: np.zeros(2 * len(qs), dtype=np.int64),
        merge=lambda a, b: a + b,
        accumulate_block=acc,
        name="rankcnt",
    )
    res = li.aggregate(fn)
    cnt = np.asarray(res["rankcnt"] if isinstance(res, dict) else res)
    lt, le = cnt[: len(qs)], cnt[len(qs):]
    ok = True
    for i, q in enumerate(qs):
        target = max(1, math.ceil(q * n))
        # answer occupies ranks (lt, le]; certificate: the window
        # intersects [target - err, target + err]
        if not (int(lt[i]) < target + err and int(le[i]) >= target - err):
            ok = False
    ranks = {q: max(0, math.ceil(q * n) - 1) for q in qs}
    exact = select_order_stats(li, "l_extendedprice", sorted(set(ranks.values())))
    return pa.table(
        {
            "quantile": pa.array(qs, pa.float64()),
            "price": pa.array(
                [round(exact[ranks[q]], 4) for q in qs], pa.float64()
            ),
            "bound_ok": pa.array([ok] * len(qs), pa.bool_()),
        }
    )


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



def approx_distinct_kmv(sf_dir: str) -> rd.Dataset:
    """KMV (bottom-k) distinct-count sketch over lineitem part keys
    (stages/kmv.py, k=64): one row carrying the k-th smallest md5
    hash, the EXACT-integer estimate (k-1)*2^64 // h_k, the exact
    distinct count, and the integer-cross-multiplied 3-sigma
    certificate — the whole sketch sits under a DuckDB hash gate
    (md5_number_upper twin), unlike HLL whose kernel is rows-only."""
    from ..stages.kmv import kmv_distinct_estimate

    return kmv_distinct_estimate(
        _read(sf_dir, "lineitem", ["l_partkey"]), "l_partkey", k=64
    )
