"""Driver-gated query families, continuation module 2 (round 4).

Same contract as ``relational.py`` (each function takes ``sf_dir`` and
returns a Dataset whose columns match its ``oracle_sql()`` entry
verbatim); split into a second module purely to keep file size sane.
Reuses relational.py's pruned readers and partitioning rules.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from . import relational as R

_read = R._read


# --------------------------------------------------------------- skew join


def j15_skew_join(sf_dir: str) -> rd.Dataset:
    """Per-supplier line count + quantity through the SALTED hot-key
    split join (stages/skewjoin.skew_join): suppliers above the hot
    threshold take the broadcast path (their fact rows never pile into
    one hash partition), the cold tail takes the regular shuffle join.
    Row-identical to a plain join — the oracle is the plain SQL join.
    threshold=600 splits sf0.01's ~Poisson(600) per-supplier counts
    roughly in half, so BOTH paths are exercised under the gate."""
    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_quantity"])
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_name"]).map_batches(
        lambda t: pa.table(
            {"l_suppkey": t.column("s_suppkey").cast(pa.int64()),
             "s_name": t.column("s_name")}
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    from ..stages.skewjoin import skew_join

    joined = skew_join(li, sup, on="l_suppkey", how="inner", hot_threshold=600)
    agg = joined.groupby(["l_suppkey", "s_name"]).aggregate(
        Count(alias_name="n_lines"), Sum("l_quantity", alias_name="sq")
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "suppkey": t.column("l_suppkey").cast(pa.int64()),
                "s_name": t.column("s_name"),
                "n_lines": t.column("n_lines").cast(pa.int64()),
                "sum_qty": pc.round(t.column("sq"), 2),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------------------- BFS hops


def graph_bfs_hops(sf_dir: str) -> rd.Dataset:
    """Minimum hop distance (≤ 3) from seed parts {p_partkey ≤ 5} over
    the part co-order graph — frontier-join BFS (stages/bfs.bfs_hops),
    one value join + one coarse dedup reduce per superstep.  Oracle:
    recursive CTE with the same depth cap."""
    from ..stages.bfs import bfs_hops

    half = R._cooccur_edges(sf_dir, "l_orderkey", "l_partkey")

    def both(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
        v = t.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "u": pa.array(np.concatenate([u, v]), pa.int64()),
                "v": pa.array(np.concatenate([v, u]), pa.int64()),
            }
        )

    edges = half.map_batches(both, batch_format="pyarrow", batch_size=None)
    seeds = _read(sf_dir, "part", ["p_partkey"]).map_batches(
        lambda t: t.filter(pc.less_equal(t.column("p_partkey"), 5)).select(
            ["p_partkey"]
        ).rename_columns(["node"]),
        batch_format="pyarrow",
        batch_size=None,
    )
    return bfs_hops(edges, seeds, max_hops=3)


# --------------------------------------------------------------- SemDedup


def semdedup_embeddings(sf_dir: str) -> rd.Dataset:
    """SemDedup (cluster-then-cosine) over the embeddings table with
    deterministic planted near-duplicates: every vec_id % 5 == 0 row
    gets a clone (id + 1_000_000, vector × 1.001 — cosine exactly 1.0
    with its source), since the synthetic table has no natural pair
    above cosine 0.61 (measured; τ=0.95 sits in a ≥0.34 gap on every
    sf, and cluster-argmax margins are ≥ 5e-6 — no knife edges).  The
    oracle re-derives assignment from the same rendered centroids and
    the drop rule as a correlated EXISTS."""
    from ..stages.semdedup import assign_and_dedup

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def with_clones(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").cast(pa.int64())
        vecs = t.column("embedding").combine_chunks()
        offs = vecs.offsets.to_numpy()
        dim = int(offs[1] - offs[0]) if len(offs) > 1 else 0
        flat = (
            vecs.values.to_numpy(zero_copy_only=False)[offs[0] : offs[-1]]
            .astype(np.float64)
            .reshape(-1, dim)
        )
        idv = ids.to_numpy(zero_copy_only=False)
        mask = idv % 5 == 0
        clones = flat[mask] * 1.001
        out_ids = np.concatenate([idv, idv[mask] + 1_000_000])
        out_vec = np.vstack([flat, clones])
        return pa.table(
            {
                "vec_id": pa.array(out_ids, pa.int64()),
                "embedding": pa.array(list(out_vec), pa.list_(pa.float64())),
            }
        )

    ds = emb.map_batches(with_clones, batch_format="pyarrow", batch_size=None)
    return assign_and_dedup(ds, R.kmeans_fixed_centroids(), tau=0.95)


# --------------------------------------------------------------- PCA


def emb_pca_project(sf_dir: str) -> rd.Dataset:
    """Top-2 principal-component projection of the embeddings —
    streaming moments pass + driver-side d×d eigh + broadcast
    projection (stages/pca).  Not SQL-expressible (eigendecomposition);
    rows-only under the driver, numpy-golden in pytest."""
    from ..stages.pca import pca_project

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return pca_project(emb, q=2)


# --------------------------------------------------------------- windows


def o31_range_frame(sf_dir: str) -> rd.Dataset:
    """Per-user RANGE frame (INTERVAL 1 HOUR PRECEDING .. CURRENT ROW)
    count + sum — the TIME-based window the ROWS-frame family (o13/o30)
    can't express.  ONE user-hash coarse shuffle; inside a partition
    the per-user segments share one global searchsorted after each
    user's timestamps are shifted onto a disjoint range (offset >
    global ts span + frame width), so no per-user Python loop.
    RANGE-frame tie semantics (all equal-ts peers included) fall out
    of the side='right' bound."""
    from ..stages.partition import expansion_partitions, part_column

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    n_parts = expansion_partitions()
    frame_us = 3_600_000_000  # 1 hour

    def tag(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        t = t.set_column(t.schema.get_field_index("ts"), "ts", us)
        return t.append_column("__part", part_column(t, ["user_id"], n_parts))

    def win(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        tsv = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        val = g.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(uid)
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "event_id": pa.array([], pa.int64()),
                    "n_win": pa.array([], pa.int64()),
                    "sum_win": pa.array([], pa.float64()),
                }
            )
        order = np.lexsort((eid, tsv, uid))
        uid, tsv, eid, val = uid[order], tsv[order], eid[order], val[order]
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = uid[1:] != uid[:-1]
        seg = np.cumsum(new) - 1
        span = int(tsv.max() - tsv.min()) + 2 * frame_us + 1
        shifted = tsv + seg.astype(np.int64) * span
        lo = np.searchsorted(shifted, shifted - frame_us, side="left")
        hi = np.searchsorted(shifted, shifted, side="right")
        c = np.concatenate([[0.0], np.cumsum(val)])
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "event_id": pa.array(eid, pa.int64()),
                "n_win": pa.array(hi - lo, pa.int64()),
                "sum_win": pa.array(np.round(c[hi] - c[lo], 4), pa.float64()),
            }
        )

    return (
        ev.map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(win, batch_format="pyarrow", num_cpus=1)
    )


# --------------------------------------------------------------- unpivot


def a24_unpivot(sf_dir: str) -> rd.Dataset:
    """UNPIVOT/melt: the wide per-returnflag aggregate turned into
    (flag, measure, value) rows — numpy repeat/tile over the aggregate
    block, no per-row Python.  Oracle: UNION ALL."""
    li = _read(
        sf_dir, "lineitem",
        ["l_returnflag", "l_quantity", "l_extendedprice", "l_discount"],
    )
    agg = li.groupby("l_returnflag").aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Sum("l_extendedprice", alias_name="sum_price"),
        Sum("l_discount", alias_name="sum_disc"),
    )
    measures = ["sum_qty", "sum_price", "sum_disc"]

    def melt(t: pa.Table) -> pa.Table:
        flags = t.column("l_returnflag").to_pylist()
        n = len(flags)
        vals = np.concatenate(
            [t.column(m).to_numpy(zero_copy_only=False) for m in measures]
        )
        return pa.table(
            {
                "l_returnflag": pa.array(flags * 3),
                "measure": pa.array(
                    [m for m in measures for _ in range(n)]
                ),
                "value": pa.array(np.round(vals, 2), pa.float64()),
            }
        )

    return agg.map_batches(melt, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------------------- compaction


def io_compact_small_files(sf_dir: str) -> rd.Dataset:
    """Small-file compaction (the 100-TB housekeeping op): write the
    English documents as 48 tiny parquet shards, compact them into
    data-sized blocks (≥ 8× fewer files, asserted), re-read the
    compacted layout and aggregate — the oracle checks the round-trip
    content, the file-count assertion checks the compaction itself.
    Fresh tempdirs per call (a REUSED write dir double-reads stale
    shards)."""
    import os
    import tempfile

    docs = _read(sf_dir, "documents", ["doc_id", "source", "lang", "n_chars"])
    en = docs.map_batches(
        lambda t: t.filter(pc.equal(t.column("lang"), "en")),
        batch_format="pyarrow",
        batch_size=None,
    )
    small_dir = tempfile.mkdtemp(prefix="compact_in_")
    en.repartition(48).write_parquet(small_dir)
    n_small = len([f for f in os.listdir(small_dir) if f.endswith(".parquet")])

    compacted_dir = tempfile.mkdtemp(prefix="compact_out_")
    small = rd.read_parquet(small_dir).materialize()
    # size to ~128 MB blocks, floor 1 — at fixture scale this is 1 file
    total = sum(b.size_bytes() or 0 for b in small.iter_internal_ref_bundles())
    n_out = max(1, int(np.ceil(total / (128 << 20))))
    small.repartition(n_out).write_parquet(compacted_dir)
    n_big = len([f for f in os.listdir(compacted_dir) if f.endswith(".parquet")])
    if n_big * 8 > n_small:
        raise AssertionError(
            f"compaction failed: {n_small} files -> {n_big} (expected >= 8x fewer)"
        )

    out = rd.read_parquet(compacted_dir)
    agg = out.groupby("source").aggregate(
        Count(alias_name="n_docs"), Sum("n_chars", alias_name="total_chars")
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": t.column("source"),
                "n_docs": t.column("n_docs").cast(pa.int64()),
                "total_chars": t.column("total_chars").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------------- overlap join


_WEEK_US = 7 * 86_400 * 1_000_000
_EPOCH_1992_US = 694_224_000_000_000  # TIMESTAMP '1992-01-01' in µs


def j16_overlap_join(sf_dir: str) -> rd.Dataset:
    """Interval-OVERLAP join (stages/intervals.overlap_join): per-order
    shipping-activity intervals [min,max l_shipdate] × a weekly
    calendar grid — any overlapping (order, week) pair matches; the
    banded plan turns the theta join into one equi-join with each pair
    claimed by a single band (no dedup pass).  Output: orders active
    per week."""
    from ..stages.intervals import overlap_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def iv_partial(t: pa.Table) -> pa.Table:
        us = t.column("l_shipdate").cast(pa.timestamp("us")).cast(pa.int64())
        g = pa.table(
            {"l_orderkey": t.column("l_orderkey"), "us": us}
        ).group_by(["l_orderkey"]).aggregate([("us", "min"), ("us", "max")])
        return g.rename_columns(["l_orderkey", "a_start", "a_end"])

    iv = (
        li.map_batches(iv_partial, batch_format="pyarrow", batch_size=None)
        .groupby("l_orderkey")
        .aggregate(
            Min("a_start", alias_name="a_start"),
            Max("a_end", alias_name="a_end"),
        )
    )
    ks = np.arange(400, dtype=np.int64)
    grid = rd.from_arrow(
        pa.table(
            {
                "wk": ks,
                "w_start": _EPOCH_1992_US + ks * _WEEK_US,
                "w_end": _EPOCH_1992_US + (ks + 1) * _WEEK_US - 1,
            }
        )
    )
    pairs = overlap_join(
        iv,
        grid,
        band_width=_WEEK_US,
        left_bounds=("a_start", "a_end"),
        right_bounds=("w_start", "w_end"),
    )
    agg = pairs.groupby("wk").aggregate(Count(alias_name="n_orders"))
    return agg.map_batches(
        lambda t: pa.table(
            {
                "wk": t.column("wk").cast(pa.int64()),
                "n_orders": t.column("n_orders").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )


# --------------------------------------------------------- containment


def text_containment_pairs(sf_dir: str) -> rd.Dataset:
    """Asymmetric n-gram CONTAINMENT near-dup pairs — shared /
    min(|A|,|B|) ≥ 0.9 (catches short-doc-inside-long-doc that
    symmetric Jaccard dilutes); same inverted-index single-shuffle
    plan as dedup_ngram_pairs, different final score."""
    from ..stages.dedup import ngram_jaccard_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return ngram_jaccard_pairs(docs, n=3, threshold=0.9, metric="containment")


# --------------------------------------------------------- watermark


def o20_watermark_late(sf_dir: str) -> rd.Dataset:
    """Streaming watermark late-event detection: an event is LATE iff
    its ts falls more than 10 minutes behind the per-user high-water
    mark of previously ARRIVED events.  The fixture's event_id order
    is perfectly ts-sorted (zero natural disorder — measured), so
    arrival order is a deterministic Knuth-hash shuffle of event_id
    ((id*2654435761) mod 2^32, the house injection pattern) applied
    identically in the oracle.  ONE user-hash coarse shuffle; the
    high-water mark is a loop-free segmented cumulative max, the
    lateness an exact int64 µs subtraction."""
    from ..stages.partition import expansion_partitions, part_column

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    n_parts = expansion_partitions()
    late_us = 600_000_000  # 10 minutes

    def tag(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        t = t.set_column(t.schema.get_field_index("ts"), "ts", us)
        return t.append_column("__part", part_column(t, ["user_id"], n_parts))

    def detect(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        tsv = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        n = len(uid)
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "event_id": pa.array([], pa.int64()),
                    "late_s": pa.array([], pa.int64()),
                }
            )
        arrival = (eid.astype(np.int64) * 2654435761) % 4294967296
        order = np.lexsort((eid, arrival, uid))
        uid, tsv, eid = uid[order], tsv[order], eid[order]
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = uid[1:] != uid[:-1]
        seg = np.cumsum(new) - 1
        # segmented cumulative max with NO per-user loop: shift each
        # user's timestamps onto a disjoint ascending range (span >
        # global ts range), run ONE global cummax, shift back — earlier
        # segments are strictly below later ones so the max never
        # leaks across a user boundary
        span = int(tsv.max() - tsv.min()) + 1
        shifted = (tsv - tsv.min()) + seg.astype(np.int64) * span
        run_cummax = np.maximum.accumulate(shifted) - seg * span + tsv.min()
        hw = np.empty(n, dtype=np.int64)
        hw[0] = np.iinfo(np.int64).min
        hw[1:] = run_cummax[:-1]
        hw[new] = np.iinfo(np.int64).min  # first arrival has no watermark
        keep = hw != np.iinfo(np.int64).min
        keep &= tsv < hw - late_us
        late = (hw[keep] - tsv[keep] - late_us) // 1_000_000
        return pa.table(
            {
                "user_id": pa.array(uid[keep], pa.int64()),
                "event_id": pa.array(eid[keep], pa.int64()),
                "late_s": pa.array(late, pa.int64()),
            }
        )

    return (
        ev.map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(detect, batch_format="pyarrow", num_cpus=1)
    )


# --------------------------------------------------------------- division


def a25_division(sf_dir: str) -> rd.Dataset:
    """Relational DIVISION (Codd's ÷): customers whose orders cover
    EVERY distinct order priority.  The classic "suppliers of all
    parts" operator, expressed shuffle-minimally: per-block
    (custkey, priority) count partials collapse the fact table to at
    most |cust| x |priority-domain| rows BEFORE the only key shuffle,
    then one per-customer aggregate compares distinct-priority counts
    against the (domain-sized, metadata-only) global distinct count.
    The divisor cardinality reaches the driver as a single int via
    ``ds.count()`` — no row ever does."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    def pair_partial(t: pa.Table) -> pa.Table:
        agg = t.group_by(["o_custkey", "o_orderpriority"]).aggregate(
            [("o_orderpriority", "count")]
        )
        return agg.rename_columns(["o_custkey", "o_orderpriority", "n"])

    pairs = (
        orders.map_batches(pair_partial, batch_format="pyarrow", batch_size=None)
        .groupby(["o_custkey", "o_orderpriority"])
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns(["o_custkey", "o_orderpriority", "n"]),
            batch_format="pyarrow",
            batch_size=None,
        )
        .materialize()  # used twice below; |cust| x |domain| rows, spillable
    )
    n_pri = int(pairs.groupby("o_orderpriority").count().count())

    per_cust = pairs.groupby("o_custkey").aggregate(
        Count(alias_name="np"), Sum("n", alias_name="n_orders")
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("np"), n_pri))
        return pa.table(
            {
                "custkey": t.column("o_custkey").cast(pa.int64()),
                "n_orders": t.column("n_orders").cast(pa.int64()),
            }
        )

    return per_cust.map_batches(finish, batch_format="pyarrow", batch_size=None)


# ------------------------------------------------------------ IQR outliers


def dq_iqr_outliers(sf_dir: str, k: float = 0.25) -> rd.Dataset:
    """Tukey-fence outlier audit per return flag: exact interpolated
    Q1/Q3 over the (domain-bounded) quantity histogram, fences at
    q1 - k*IQR / q3 + k*IQR, and the outlier count read straight off
    the SAME histogram — quantiles, fences and counts all come from
    one tiny (groups x 50-level domain) aggregate, ZERO extra scans.
    k=0.25 (tighter than Tukey's 1.5) so both tails are non-empty
    under the sf gate; fences land on exact binary quarters of an
    integer domain, so the <, > comparisons are knife-edge-free vs
    DuckDB.  Same histogram+interp shape as a23_group_percentile_cont
    (relational.py:4690)."""
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

    def fences(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "l_returnflag": pa.array([], pa.string()),
                    "q1": pa.array([], pa.float64()),
                    "q3": pa.array([], pa.float64()),
                    "n_out": pa.array([], pa.int64()),
                    "n_total": pa.array([], pa.int64()),
                }
            )
        t = t.sort_by(
            [("l_returnflag", "ascending"), ("l_quantity", "ascending")]
        )
        key = np.asarray(t.column("l_returnflag").to_pylist(), dtype=object)
        v = t.column("l_quantity").to_numpy(zero_copy_only=False).astype(np.float64)
        c = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.flatnonzero(np.concatenate([[True], key[1:] != key[:-1]]))
        ends = np.concatenate([starts[1:], [len(key)]])
        names, q1s, q3s, outs, totals = [], [], [], [], []
        for st, en in zip(starts, ends):
            cc = np.cumsum(c[st:en])
            n = int(cc[-1])
            qv = []
            for q in (0.25, 0.75):
                r = (n - 1) * q
                lo, hi = int(np.floor(r)), int(np.ceil(r))
                vlo = v[st + np.searchsorted(cc, lo + 1)]
                vhi = v[st + np.searchsorted(cc, hi + 1)]
                qv.append(vlo + (r - lo) * (vhi - vlo))
            q1, q3 = qv
            lo_f = q1 - k * (q3 - q1)
            hi_f = q3 + k * (q3 - q1)
            out_mask = (v[st:en] < lo_f) | (v[st:en] > hi_f)
            names.append(key[st])
            q1s.append(q1)
            q3s.append(q3)
            outs.append(int(c[st:en][out_mask].sum()))
            totals.append(n)
        return pa.table(
            {
                "l_returnflag": pa.array(names, pa.string()),
                "q1": pa.array(np.round(q1s, 2), pa.float64()),
                "q3": pa.array(np.round(q3s, 2), pa.float64()),
                "n_out": pa.array(outs, pa.int64()),
                "n_total": pa.array(totals, pa.int64()),
            }
        )

    return h.map_batches(fences, batch_format="pyarrow", batch_size=None)


# ------------------------------------------------------------ trailing EWMA


def o32_ewma(sf_dir: str, alpha: float = 0.3, window: int = 20) -> rd.Dataset:
    """Trailing-window EWMA per user: the exponentially-weighted moving
    average y_i = a*x_i + (1-a)*y_{i-1} (seeded y_1 = x_1) over each
    user's LAST ``window`` events by (ts, event_id) — the bounded-tail
    closed form every metrics store uses, so the weight exponents never
    overflow regardless of per-user history length.  ONE user-hash
    coarse shuffle, then loop-free segment math: lexsort, rank-from-end
    per segment, closed-form weights a*(1-a)^d (seed row (1-a)^(k-1)),
    and a bincount-segmented dot product.  a and 1-a are both taken
    from literals (0.3 / 0.7) so the doubles match the SQL oracle
    exactly — 1-0.3 in float64 is NOT the 0.7 literal."""
    from ..stages.joins import default_join_partitions
    from ..stages.partition import part_column

    beta = 0.7 if alpha == 0.3 else 1.0 - alpha
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    n_parts = default_join_partitions()

    def norm(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        t = t.set_column(t.schema.get_field_index("ts"), "ts", us)
        return t.append_column("__part", part_column(t, ["user_id"], n_parts))

    def ewma_part(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        tsv = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        val = g.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(uid)
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "ewma": pa.array([], pa.float64()),
                }
            )
        order = np.lexsort((eid, tsv, uid))  # oldest first per user
        uid_s, val_s = uid[order], val[order]
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = uid_s[1:] != uid_s[:-1]
        seg = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        seg_len = np.diff(np.append(starts, n))
        # distance from each row to its segment END (0 = newest)
        d = (starts[seg] + seg_len[seg] - 1) - np.arange(n, dtype=np.int64)
        keep = d < window
        k_seg = np.minimum(seg_len, window)  # effective tail length
        w = alpha * np.power(beta, d.astype(np.float64))
        is_seed = d == (k_seg[seg] - 1)
        w[is_seed] = np.power(beta, (k_seg[seg][is_seed] - 1).astype(np.float64))
        sums = np.bincount(
            seg[keep], weights=w[keep] * val_s[keep], minlength=len(starts)
        )
        return pa.table(
            {
                "user_id": pa.array(uid_s[starts], pa.int64()),
                "ewma": pa.array(np.round(sums, 4), pa.float64()),
            }
        )

    return (
        ev.map_batches(norm, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(ewma_part, batch_format="pyarrow", num_cpus=1)
    )


# --------------------------------------------------- connected components


def graph_cc_labels(sf_dir: str, min_support: int = 2) -> rd.Dataset:
    """Connected-component labels over the SUPPORT-THRESHOLDED co-order
    part graph (parts adjacent iff they share >= ``min_support``
    distinct orders), each node labelled with its component's minimum
    part id — the first DuckDB-oracled connected-components query,
    driven by the O(log n)-round large-star/small-star contraction
    primitive (``stages/cc.cc_min_labels``; the KG path's join-CC is
    linear in diameter — 12 propagation rounds on this graph vs 4
    star rounds, measured 105 s -> far less at 4 CPUs).

    Scale shape: distinct (order, part) -> per-order pair expansion in
    a coarse key-hash map_groups with block-local (u, v) pre-combine ->
    ONE pair-hash coarse reduce (never a native pair-keyed groupby, per
    CLAUDE.md) -> support filter -> log-round star contraction.
    Oracle: recursive-CTE min-reachable-id."""
    from ..stages.cc import cc_min_labels
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
        return cg.rename_columns(["u", "v", "cuv"])

    def tag_pair(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, ["u", "v"], n_parts))

    def reduce_pairs(g: pa.Table) -> pa.Table:
        g = g.drop_columns("__part")
        agg = g.group_by(["u", "v"]).aggregate([("cuv", "sum")])
        agg = agg.rename_columns(["u", "v", "cuv"])
        t = agg.filter(pc.greater_equal(agg.column("cuv"), min_support))
        return t.select(["u", "v"])

    pairs = (
        op.map_batches(tag_order, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(expand, batch_format="pyarrow", num_cpus=1)
        .map_batches(tag_pair, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(reduce_pairs, batch_format="pyarrow", num_cpus=1)
    )

    labels, converged = cc_min_labels(pairs)
    if not converged:
        raise RuntimeError(
            "cc_min_labels exhausted max_rounds without converging; "
            "labels would be wrong (output is hash-compared vs exact CC)"
        )
    return labels


# --------------------------------------------------------- grouping sets


def a26_grouping_sets(sf_dir: str) -> rd.Dataset:
    """GROUPING SETS ((o_orderpriority), (o_orderstatus), ()) in ONE
    scan: each block emits partials for ALL THREE sets tagged by a
    set-name column, one combined (grp, key) groupby merges them — no
    per-set rescan (the naive UNION-of-GROUP-BYs plan reads the fact
    table three times; this reads it once).  The grand-total row rides
    with a sentinel key swapped back to NULL after the merge."""
    orders = _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus", "o_totalprice"])
    SENT = "\x00ALL"

    def partial(t: pa.Table) -> pa.Table:
        outs = []
        for grp, col in (("priority", "o_orderpriority"), ("status", "o_orderstatus")):
            g = t.group_by([col]).aggregate(
                [([], "count_all"), ("o_totalprice", "sum")]
            )
            g = g.rename_columns([col, "n", "sp"])
            outs.append(
                pa.table(
                    {
                        "grp": pa.array([grp] * g.num_rows, pa.string()),
                        "k": g.column(col),
                        "n": g.column("n").cast(pa.int64()),
                        "sp": g.column("sp"),
                    }
                )
            )
        outs.append(
            pa.table(
                {
                    "grp": pa.array(["all"], pa.string()),
                    "k": pa.array([SENT], pa.string()),
                    "n": pa.array([t.num_rows], pa.int64()),
                    "sp": pa.array(
                        [pc.sum(t.column("o_totalprice")).as_py() or 0.0],
                        pa.float64(),
                    ),
                }
            )
        )
        return pa.concat_tables(outs)

    merged = (
        orders.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["grp", "k"])
        .aggregate(Sum("n", alias_name="n"), Sum("sp", alias_name="sp"))
    )

    def finish(t: pa.Table) -> pa.Table:
        k = pc.if_else(pc.equal(t.column("k"), SENT), pa.scalar(None, pa.string()), t.column("k"))
        return pa.table(
            {
                "grp": t.column("grp"),
                "k": k,
                "n": t.column("n").cast(pa.int64()),
                "sum_price": pc.round(t.column("sp"), 2),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow", batch_size=None)


# ------------------------------------------------------- PMI collocations


def text_collocations_pmi(sf_dir: str, min_count: int = 5) -> rd.Dataset:
    """Collocation mining over the corpus: every bigram with support >=
    ``min_count`` scored by pointwise mutual information against the
    unigram token distribution, PMI = ln(c12 * N_tok^2 / (N_big * c1
    * c2)) — the classic association measure (Church & Hanks '90).

    ONE pass over documents emits BOTH unigram and bigram count
    partials as kind-tagged rows (no token stream is ever
    materialized; intra-doc adjacency is only valid pre-shuffle, so
    bigrams are formed inside the read-adjacent block map exactly like
    text_bigram_topk), ONE (kind, w1, w2) groupby merges them, the
    unigram side rides back onto bigrams through two cost-based
    ``smart_join``s (broadcast while the vocab is small, hash-shuffle
    past the threshold).  N_tok / N_big reach the driver as two scalar
    sums.  No top-k cut: the row set is fixed by the INTEGER support
    filter, so the oracle cannot diverge on float ordering ties.
    Tokenizer shared verbatim with TF-IDF/BM25/bigram oracles."""
    from ..stages.joins import smart_join

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t.column("text")), pattern=r"[ \t\n\r\f\v]+"
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        parent = np.repeat(
            t.column("doc_id").to_numpy(zero_copy_only=False), lens
        )
        flat = toks.flatten()
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        parent = parent[keep]
        words = np.asarray(flat.filter(pa.array(keep)).to_pylist(), dtype=object)
        empty = pa.table(
            {
                "kind": pa.array([], pa.string()),
                "w1": pa.array([], pa.string()),
                "w2": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if len(words) == 0:
            return empty
        ut = pa.table({"w1": pa.array(words, pa.string())})
        ug = ut.group_by(["w1"]).aggregate([([], "count_all")])
        uni = pa.table(
            {
                "kind": pa.array(["u"] * ug.num_rows, pa.string()),
                "w1": ug.column("w1"),
                "w2": pa.array([""] * ug.num_rows, pa.string()),
                "n": ug.column("count_all").cast(pa.int64()),
            }
        )
        if len(words) < 2:
            return uni
        same = parent[1:] == parent[:-1]
        bt = pa.table(
            {
                "w1": pa.array(words[:-1][same], pa.string()),
                "w2": pa.array(words[1:][same], pa.string()),
            }
        )
        bg = bt.group_by(["w1", "w2"]).aggregate([([], "count_all")])
        big = pa.table(
            {
                "kind": pa.array(["b"] * bg.num_rows, pa.string()),
                "w1": bg.column("w1"),
                "w2": bg.column("w2"),
                "n": bg.column("count_all").cast(pa.int64()),
            }
        )
        return pa.concat_tables([uni, big])

    counts = (
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["kind", "w1", "w2"])
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns(["kind", "w1", "w2", "n"]),
            batch_format="pyarrow",
            batch_size=None,
        )
        .materialize()  # consumed four times (split x2, two scalar sums)
    )

    uni = counts.filter(expr="kind == 'u'").select_columns(["w1", "n"])
    big = counts.filter(expr="kind == 'b'").select_columns(["w1", "w2", "n"])
    n_tok = float(uni.sum("n") or 0)
    n_big = float(big.sum("n") or 0)

    def as_c12(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("n"), min_count))
        return t.rename_columns(["w1", "w2", "c12"])

    def as_c1(t: pa.Table) -> pa.Table:
        return t.rename_columns(["w1", "c1"])

    def as_c2(t: pa.Table) -> pa.Table:
        return t.rename_columns(["w2", "c2"])

    big_f = big.map_batches(as_c12, batch_format="pyarrow", batch_size=None)
    j1 = smart_join(
        big_f, uni.map_batches(as_c1, batch_format="pyarrow", batch_size=None),
        on=["w1"],
    )
    j2 = smart_join(
        j1, uni.map_batches(as_c2, batch_format="pyarrow", batch_size=None),
        on=["w2"],
    )

    def score(t: pa.Table) -> pa.Table:
        c12 = t.column("c12").to_numpy(zero_copy_only=False).astype(np.float64)
        c1 = t.column("c1").to_numpy(zero_copy_only=False).astype(np.float64)
        c2 = t.column("c2").to_numpy(zero_copy_only=False).astype(np.float64)
        pmi = np.log((c12 * n_tok * n_tok) / (n_big * c1 * c2))
        return pa.table(
            {
                "w1": t.column("w1"),
                "w2": t.column("w2"),
                "c12": t.column("c12").cast(pa.int64()),
                "pmi": pa.array(np.round(pmi, 4), pa.float64()),
            }
        )

    return j2.map_batches(score, batch_format="pyarrow", batch_size=None)


# -------------------------------------------------------- Jaro-Winkler


def fuzzy_jw_parts(sf_dir: str) -> rd.Dataset:
    """Blocked fuzzy top-1 by JARO-WINKLER similarity (the record-
    linkage companion to fuzzy_match_parts' Levenshtein): for each of
    the 20 lowest-partkey part names, the corpus-wide best OTHER part
    name by max similarity (ties lexicographic).  The vectorized kernel
    (stages/fuzzy.jaro_winkler_probe_block) is pinned DuckDB-exact —
    boost threshold 0.7, prefix cap 4, scale 0.1, empty -> 0 — by a
    2000-pair fuzz in tests; per-block partial argmax, one probe-keyed
    merge."""
    import pyarrow.parquet as pq

    from ..stages.fuzzy import jaro_winkler_top1

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
    return jaro_winkler_top1(parts, "p_name", probes)


# ------------------------------------------------------------- vocabulary


def text_vocab_ids(sf_dir: str, min_count: int = 10) -> rd.Dataset:
    """Word2vec-style vocabulary construction: corpus token counts,
    ``min_count`` pruning, and DENSE vocab ids by (count DESC, term
    ASC) — the id-assignment step every embedding/tokenizer trainer
    runs.  Counting is fully distributed (per-block partials, one term
    groupby); the id assignment happens on the PRUNED table only, which
    is bounded by contract (min_count caps vocab size — real trainers
    hold exactly this table in memory), so the single sort+arange task
    at the tail is vocab-sized, never corpus-sized.  Tokenizer shared
    verbatim with TF-IDF/BM25/PMI."""
    docs = _read(sf_dir, "documents", ["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t.column("text")), pattern=r"[ \t\n\r\f\v]+"
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        flat = flat.filter(pc.not_equal(flat, ""))
        if len(flat) == 0:
            return pa.table(
                {"term": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        g = pa.table({"term": flat}).group_by(["term"]).aggregate([([], "count_all")])
        return pa.table(
            {"term": g.column("term"), "n": g.column("count_all").cast(pa.int64())}
        )

    counts = (
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("term")
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns(["term", "n"]).filter(
                pc.greater_equal(t.column(1), min_count)
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
    )

    def assign(t: pa.Table) -> pa.Table:
        t = t.sort_by([("n", "descending"), ("term", "ascending")])
        return pa.table(
            {
                "term": t.column("term"),
                "n": t.column("n").cast(pa.int64()),
                "vocab_id": pa.array(
                    np.arange(1, t.num_rows + 1, dtype=np.int64), pa.int64()
                ),
            }
        )

    # vocab-sized by the min_count contract: one id-assignment task
    return counts.repartition(1).map_batches(
        assign, batch_format="pyarrow", batch_size=None
    )

# --------------------------------------------------------- tf cosine


def text_cosine_pairs(sf_dir: str) -> rd.Dataset:
    """Sparse bag-of-words cosine similarity join (stages/tfcos.py):
    document pairs with cos^2 >= 4/5 over terms with df <= 100 —
    inverted-index join with the Bayardo frequency prune, integer
    cross-multiplied gate, all-int64 output (no float knife edges
    anywhere).  The tf-weighted companion to dedup_ngram_pairs
    (set semantics) and semdedup_embeddings (dense vectors)."""
    from ..stages.tfcos import tf_cosine_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return tf_cosine_pairs(docs, threshold_num=4, threshold_den=5, max_df=100)
