"""Co-occurrence-graph queries (split from relational.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from ..stages.joins import broadcast_anti_join, broadcast_join, broadcast_semi_join, hash_join
from .rel_base import _read

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


def graph_kcore(sf_dir: str) -> rd.Dataset:
    """Core number per part of the co-order graph via the iterated
    h-index fixpoint (stages/kcore.py — per-iteration cost is one
    value join + one coarse reduce, the PageRank shape).  Rows-only
    for the driver (iterative, not SQL-expressible); the recurrence is
    golden-locked against sequential peeling in tests/test_kcore.py."""
    from ..stages.kcore import core_numbers

    return core_numbers(_cooccur_edges(sf_dir, "l_orderkey", "l_partkey"))


def graph_lpa_2it(sf_dir: str) -> rd.Dataset:
    """Two synchronous label-propagation rounds over the part co-order
    graph (stages/lpa.py): deterministic most-frequent-neighbor-label
    update with the smallest-label tie-break, all-integer output — the
    fixed-iteration twin the SQL oracle unrolls round by round (the
    pagerank_2it / kmeans_2it convention)."""
    from ..stages.lpa import lpa_labels

    return lpa_labels(_cooccur_edges(sf_dir, "l_orderkey", "l_partkey"), rounds=2)


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



def graph_hits_2it(sf_dir: str) -> rd.Dataset:
    """Two unnormalized HITS rounds (stages/hits.py) over the DIRECTED
    supplier -> part supply graph (lineitem rows as weighted
    multi-edges; part node ids offset by 10^7 to keep the two key
    spaces disjoint): hubs = suppliers whose parts are heavily
    supplied, authorities = parts endorsed by strong hubs.  With unit
    init the 2-round scores are ALL-INTEGER, so the twin hash-gates
    the production join+gather machinery against a DuckDB CTE unroll
    with zero float edges (the pagerank_2it convention)."""
    from ..stages.hits import hits_scores

    edges = _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey"]).map_batches(
        lambda t: pa.table(
            {
                "src": t.column("l_suppkey").cast(pa.int64()),
                "dst": pc.add(
                    t.column("l_partkey").cast(pa.int64()),
                    pa.scalar(10_000_000, pa.int64()),
                ),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    return hits_scores(edges, rounds=2, normalize=False)


def graph_walks_2step(sf_dir: str) -> rd.Dataset:
    """Two deterministic hash-argmin walk steps (stages/walks.py, md5
    kernel) from every node of the symmetrized part co-order graph —
    the DeepWalk/node2vec walk sampler with replayable randomness.
    Duplicate adjacency rows cannot change an argmin, so the
    block-locally-deduped co-order expansion feeds it directly."""
    from ..stages.walks import md5_walks

    e = _cooccur_edges(sf_dir, "l_orderkey", "l_partkey")
    sym = e.map_batches(
        lambda t: pa.table(
            {
                "u": pa.concat_arrays(
                    [
                        t.column("u").combine_chunks(),
                        t.column("v").combine_chunks(),
                    ]
                ),
                "v": pa.concat_arrays(
                    [
                        t.column("v").combine_chunks(),
                        t.column("u").combine_chunks(),
                    ]
                ),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    return md5_walks(sym, steps=2, kernel="md5")


def graph_sssp_2it(sf_dir: str) -> rd.Dataset:
    """Two Bellman-Ford relaxation rounds (stages/sssp.py) from the
    smallest part of the symmetrized co-order graph, edge weight =
    1 + (u + v) % 9 (a deterministic integer toll — symmetric, so the
    undirected semantics hold).  All-integer output; duplicate edges
    cannot change a min-relaxation.  The fixpoint/golden behavior is
    pinned in tests/test_sssp.py; this twin hash-gates the production
    join+min machinery round by round."""
    from ray.data.aggregate import Min as _Min

    from ..stages.sssp import sssp_distances

    e = _cooccur_edges(sf_dir, "l_orderkey", "l_partkey").materialize()

    def sym_w(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        uu = np.concatenate([u, v])
        vv = np.concatenate([v, u])
        w = 1 + (uu + vv) % 9
        return pa.table(
            {
                "u": pa.array(uu, pa.int64()),
                "v": pa.array(vv, pa.int64()),
                "w": pa.array(w, pa.int64()),
            }
        )

    sym = e.map_batches(sym_w, batch_format="pyarrow", batch_size=None)
    src = e.aggregate(_Min("u", alias_name="s"))["s"]
    return sssp_distances(sym, source=int(src), rounds=2)

def graph_matching_2it(sf_dir: str) -> rd.Dataset:
    """Two handshake rounds of the deterministic greedy maximal
    matching (stages/matching.py) over the part co-order graph —
    (u, v, round) for every mutual-min edge selected in rounds 1-2.
    The md5 edge priority makes the twin SQL-replayable; the
    to-maximality behavior is golden-locked in tests/test_matching.py."""
    from ..stages.matching import maximal_matching

    return maximal_matching(
        _cooccur_edges(sf_dir, "l_orderkey", "l_partkey"), max_rounds=2
    )

def graph_coloring_2it(sf_dir: str) -> rd.Dataset:
    """Two Jones-Plassmann rounds (stages/coloring.py) over the part
    co-order graph: hash-priority local maxima color first (palette 0),
    round-2 winners take the smallest color absent among colored
    neighbors — with one prior round that mex is the plain 0/1 CASE
    the oracle unrolls.  Properness at the fixpoint is golden-locked
    in tests/test_coloring.py."""
    from ..stages.coloring import greedy_coloring

    return greedy_coloring(
        _cooccur_edges(sf_dir, "l_orderkey", "l_partkey"), rounds=2
    )

def graph_edge_support(sf_dir: str) -> rd.Dataset:
    """Per-edge triangle support of the supplier co-supply graph (the
    k-truss building block; stages/triangles.edge_support) — the wedge
    plan with the center carried through and each closed triangle
    exploded into its three canonical edges via one coarse pair
    reduce.  Oracle: the textbook 3-way self-join triangle CTE
    exploded the same way."""
    from ..stages.triangles import edge_support

    return edge_support(_cooccur_edges(sf_dir, "l_partkey", "l_suppkey"))

def graph_ppr_2it(sf_dir: str, damping: float = 0.85) -> rd.Dataset:
    """TWO unrolled PERSONALIZED PageRank iterations over the part
    co-order graph: teleport mass restarts at the SEED set (parts
    divisible by 50) instead of uniformly — the entity-relatedness /
    neighborhood-sampling primitive (GraphSAGE/PPRGo shape).  Update:
    r' = d * gather + (1-d)/|S| on seeds ONLY; nodes never reached and
    not seeded carry no row.  Same per-iteration cost as pr2_cooccur
    (one rank join + one destination groupby); symmetric graph -> no
    dangling mass.  Values rounded 6dp (distributed float sums differ
    from DuckDB in the last ulp; literals mirrored exactly: 0.15/m)."""
    from ..stages.joins import hash_join, smart_join, staged_nonempty
    from ..stages.triangles import _distinct_edges

    e = _distinct_edges(
        _cooccur_edges(sf_dir, "l_orderkey", "l_partkey"), "u", "v"
    ).materialize()

    def sym(t: pa.Table) -> pa.Table:
        uu = t.column("u").combine_chunks()
        vv = t.column("v").combine_chunks()
        return pa.table(
            {
                "u": pa.concat_arrays([uu, vv]),
                "v": pa.concat_arrays([vv, uu]),
            }
        )

    se = staged_nonempty(e.map_batches(sym, batch_format="pyarrow", batch_size=None))
    assert se is not None
    deg = se.groupby("u").count().map_batches(
        lambda t: t.rename_columns(["u", "dg"]),
        batch_format="pyarrow",
        batch_size=None,
    ).materialize()
    edges = smart_join(se, deg, on=["u"]).materialize()

    def seed_rows(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": pa.array(u[u % 50 == 0], pa.int64())})

    seeds = staged_nonempty(
        deg.map_batches(seed_rows, batch_format="pyarrow", batch_size=None)
    )
    assert seeds is not None
    m = seeds.count()
    base = (1.0 - damping) / m

    pr = seeds.map_batches(
        lambda t: pa.table(
            {
                "node": t.column("node"),
                "r": pa.array(np.full(t.num_rows, 1.0 / m), pa.float64()),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )

    for _ in range(2):
        pru = staged_nonempty(
            pr.map_batches(
                lambda t: t.rename_columns(["u", "r"]),
                batch_format="pyarrow",
                batch_size=None,
            )
        )
        assert pru is not None
        contrib = hash_join(edges, pru, on=["u"])

        def part_sum(t: pa.Table) -> pa.Table:
            r = t.column("r").to_numpy(zero_copy_only=False)
            dg = t.column("dg").to_numpy(zero_copy_only=False).astype(np.float64)
            tt = pa.table(
                {"node": t.column("v"), "c": pa.array(r / dg, pa.float64())}
            )
            g = tt.group_by(["node"]).aggregate([("c", "sum")])
            return g.rename_columns(["node", "c"])

        summed = staged_nonempty(
            contrib.map_batches(part_sum, batch_format="pyarrow", batch_size=None)
            .groupby("node")
            .sum("c")
            .map_batches(
                lambda t: pa.table(
                    {"node": t.column(0).cast(pa.int64()), "c": t.column(1)}
                ),
                batch_format="pyarrow",
                batch_size=None,
            )
        )
        assert summed is not None
        merged = hash_join(summed, seeds.map_batches(
            lambda t: pa.table(
                {"node": t.column("node"), "is_seed": pa.array([1] * t.num_rows, pa.int64())}
            ),
            batch_format="pyarrow",
            batch_size=None,
        ), on=["node"], how="full_outer")

        def update(t: pa.Table) -> pa.Table:
            c = pc.fill_null(t.column("c"), pa.scalar(0.0, pa.float64()))
            c = c.to_numpy(zero_copy_only=False)
            s = pc.fill_null(
                t.column("is_seed"), pa.scalar(0, pa.int64())
            ).to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "node": t.column("node").cast(pa.int64()),
                    "r": pa.array(damping * c + s * base, pa.float64()),
                }
            )

        pr = merged.map_batches(update, batch_format="pyarrow", batch_size=None)

    return pr.map_batches(
        lambda t: pa.table(
            {
                "node": t.column("node"),
                "ppr": pa.array(
                    np.round(t.column("r").to_numpy(zero_copy_only=False), 6),
                    pa.float64(),
                ),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
