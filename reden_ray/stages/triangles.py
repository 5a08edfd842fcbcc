"""Distributed triangle counting (degree-oriented wedge join).

Graph analytics extension over the KG/canonicalization edge surface.
Algorithm (the standard shuffle-friendly one — cf. Suri & Vassilvitskii
"Counting Triangles and the Curse of the Last Reducer", WWW'11):

1. distinct undirected edges (u < v), built with per-block distinct
   partials before the one groupby (d2 pattern);
2. ORIENT each edge from its lower-rank endpoint to its higher-rank
   endpoint under the total order (degree, node) — every node's
   out-degree is then O(sqrt(m)), so the wedge fan-out below is bounded
   even for celebrity hubs (the whole point of the orientation);
3. wedges: per source node, all out-neighbor pairs (b, c) with
   b ≺ c — a groupby(src).map_groups pair expansion;
4. close: hash-semi-join wedges against the oriented edge set; every
   hit is exactly one triangle (each triangle has exactly one vertex
   that points to the other two under a total order).

All joins/groupbys are key-hash shuffles; nothing materializes on the
driver.  Returns the scalar count as a 1-row Dataset so it composes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum


def _distinct_edges(edges: rd.Dataset, src: str, dst: str) -> rd.Dataset:
    """Canonicalize to (u < v) and dedup: block-local distinct partial,
    then ONE coarse-partition map_groups distinct (NOT a native
    groupby(["u","v"]) — Ray 2.49's multi-key sort aggregate is the
    slow path on pair-shaped streams; see linkpred.py pair reduce)."""
    from .partition import expansion_partitions, part_column

    n_parts = expansion_partitions()

    def canon(t: pa.Table) -> pa.Table:
        a = t.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != b  # drop self-loops
        a, b = a[keep], b[keep]
        u = np.minimum(a, b)
        v = np.maximum(a, b)
        tt = pa.table({"u": pa.array(u, pa.int64()), "v": pa.array(v, pa.int64())})
        tt = tt.group_by(["u", "v"]).aggregate([])
        return tt.append_column("__part", part_column(tt, ["u", "v"], n_parts))

    def distinct(g: pa.Table) -> pa.Table:
        return g.drop_columns("__part").group_by(["u", "v"]).aggregate([])

    return (
        edges.map_batches(canon, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(distinct, batch_format="pyarrow")
    )


def triangle_count(edges: rd.Dataset, src: str = "u", dst: str = "v") -> rd.Dataset:
    """Count triangles in the undirected graph given by an edge list
    (duplicates/self-loops/direction ignored).  One row out:
    ``n_triangles``."""
    from .joins import staged_nonempty
    from .partition import expansion_partitions, part_column

    e = _distinct_edges(edges, src, dst).materialize()
    if e.count() == 0:
        return rd.from_arrow(pa.table({"n_triangles": pa.array([0], pa.int64())}))

    # degree = in+out occurrences over canonical edges
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

    deg = (
        e.map_batches(deg_partial, batch_format="pyarrow", batch_size=None)
        .groupby("node")
        .aggregate(Sum("d", alias_name="deg"))
    )

    # orient: join degrees onto both endpoints, direct low -> high.
    # smart_join broadcasts the node-sized degree table when it fits
    # (the common case — |V| << |E|) and falls back to a staged,
    # data-sized hash join when it doesn't.
    from .joins import smart_join

    n_parts = expansion_partitions()
    du = deg.rename_columns(["u", "deg_u"])
    dv = deg.rename_columns(["v", "deg_v"])
    ed = smart_join(e, du, on=["u"])
    ed = smart_join(ed, dv, on=["v"])

    def orient(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        a = t.column("deg_u").to_numpy(zero_copy_only=False)
        b = t.column("deg_v").to_numpy(zero_copy_only=False)
        # total order: (degree, node id)
        u_first = (a < b) | ((a == b) & (u < v))
        s = np.where(u_first, u, v)
        d = np.where(u_first, v, u)
        return pa.table({"s": pa.array(s, pa.int64()), "d": pa.array(d, pa.int64())})

    oriented = ed.map_batches(orient, batch_format="pyarrow", batch_size=None).materialize()

    # wedges per source: all out-neighbor pairs, each coarse partition
    # handles many sources (out-degree bounded by orientation)
    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, ["s"], n_parts))

    def wedges(g: pa.Table) -> pa.Table:
        g = g.drop_columns("__part").sort_by([("s", "ascending"), ("d", "ascending")])
        s = g.column("s").to_numpy(zero_copy_only=False)
        d = g.column("d").to_numpy(zero_copy_only=False)
        n = len(s)
        starts = np.nonzero(np.concatenate([[True], s[1:] != s[:-1]]))[0]
        ends = np.concatenate([starts[1:], [n]])
        outs_b, outs_c = [], []
        for st, en in zip(starts, ends):  # per SOURCE; fan-out O(sqrt(m)) by orientation
            nb = d[st:en]
            k = len(nb)
            if k < 2:
                continue
            iu = np.triu_indices(k, 1)
            outs_b.append(nb[iu[0]])
            outs_c.append(nb[iu[1]])
        if not outs_b:
            return pa.table(
                {"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())}
            )
        # canonicalize: the closing edge lives in the UNDIRECTED edge
        # set keyed (min, max) by id — wedge endpoints are ordered by
        # rank, not id, so re-canonicalize before the closure join
        b = np.concatenate(outs_b)
        c = np.concatenate(outs_c)
        return pa.table(
            {
                "u": pa.array(np.minimum(b, c), pa.int64()),
                "v": pa.array(np.maximum(b, c), pa.int64()),
            }
        )

    wedge_ds = (
        oriented.map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(wedges, batch_format="pyarrow")
    )

    # close wedges against oriented edges (wedge (b,c) has b ≺ c, and a
    # closing edge is oriented b->c by transitivity of the total order).
    # BOTH join inputs must be staged non-empty (Ray 2.49 first-block
    # schema-broadcast trap — map_groups commonly emits a leading
    # zero-row block); shuffle_semi_join stages only its right side.
    from .joins import shuffle_semi_join

    wedges_staged = staged_nonempty(wedge_ds)
    if wedges_staged is None:
        return rd.from_arrow(pa.table({"n_triangles": pa.array([0], pa.int64())}))
    closed = shuffle_semi_join(wedges_staged, e, on=["u", "v"])

    n = closed.count()
    return rd.from_arrow(pa.table({"n_triangles": pa.array([n], pa.int64())}))


def edge_support(edges: rd.Dataset, src: str = "u", dst: str = "v") -> rd.Dataset:
    """Per-edge triangle SUPPORT — the k-truss building block (an edge
    is in the k-truss iff its support >= k-2): same degree-oriented
    wedge plan as :func:`triangle_count`, but the wedge CENTER rides
    along, the closure SEMI-join keeps the triangle rows, and each
    triangle explodes into its three canonical edges through one
    coarse pair reduce.  Output (u, v, support) for edges in >= 1
    triangle, all int64."""
    from .joins import shuffle_semi_join, smart_join, staged_nonempty
    from .partition import expansion_partitions, part_column

    e = _distinct_edges(edges, src, dst).materialize()
    empty = pa.table(
        {
            "u": pa.array([], pa.int64()),
            "v": pa.array([], pa.int64()),
            "support": pa.array([], pa.int64()),
        }
    )
    if e.count() == 0:
        return rd.from_arrow(empty)

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

    deg = (
        e.map_batches(deg_partial, batch_format="pyarrow", batch_size=None)
        .groupby("node")
        .aggregate(Sum("d", alias_name="deg"))
    )
    n_parts = expansion_partitions()
    du = deg.rename_columns(["u", "deg_u"])
    dv = deg.rename_columns(["v", "deg_v"])
    ed = smart_join(smart_join(e, du, on=["u"]), dv, on=["v"])

    def orient(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        a = t.column("deg_u").to_numpy(zero_copy_only=False)
        b = t.column("deg_v").to_numpy(zero_copy_only=False)
        u_first = (a < b) | ((a == b) & (u < v))
        s = np.where(u_first, u, v)
        d = np.where(u_first, v, u)
        return pa.table({"s": pa.array(s, pa.int64()), "d": pa.array(d, pa.int64())})

    oriented = ed.map_batches(
        orient, batch_format="pyarrow", batch_size=None
    ).materialize()

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, ["s"], n_parts))

    def wedges_with_center(g: pa.Table) -> pa.Table:
        g = g.drop_columns("__part").sort_by(
            [("s", "ascending"), ("d", "ascending")]
        )
        s = g.column("s").to_numpy(zero_copy_only=False)
        d = g.column("d").to_numpy(zero_copy_only=False)
        n = len(s)
        starts = np.nonzero(np.concatenate([[True], s[1:] != s[:-1]]))[0]
        ends = np.concatenate([starts[1:], [n]])
        cs, bs, ccs = [], [], []
        for st, en in zip(starts, ends):
            nb = d[st:en]
            k = len(nb)
            if k < 2:
                continue
            iu = np.triu_indices(k, 1)
            cs.append(np.full(len(iu[0]), s[st], dtype=np.int64))
            bs.append(nb[iu[0]])
            ccs.append(nb[iu[1]])
        if not bs:
            return pa.table(
                {
                    "center": pa.array([], pa.int64()),
                    "u": pa.array([], pa.int64()),
                    "v": pa.array([], pa.int64()),
                }
            )
        b = np.concatenate(bs)
        c = np.concatenate(ccs)
        return pa.table(
            {
                "center": pa.array(np.concatenate(cs), pa.int64()),
                "u": pa.array(np.minimum(b, c), pa.int64()),
                "v": pa.array(np.maximum(b, c), pa.int64()),
            }
        )

    wedge_ds = (
        oriented.map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(wedges_with_center, batch_format="pyarrow")
    )
    wedges_staged = staged_nonempty(wedge_ds)
    if wedges_staged is None:
        return rd.from_arrow(empty)
    tri = staged_nonempty(shuffle_semi_join(wedges_staged, e, on=["u", "v"]))
    if tri is None:
        return rd.from_arrow(empty)

    def explode(t: pa.Table) -> pa.Table:
        ce = t.column("center").to_numpy(zero_copy_only=False)
        uu = t.column("u").to_numpy(zero_copy_only=False)
        vv = t.column("v").to_numpy(zero_copy_only=False)
        eu = np.concatenate([uu, np.minimum(ce, uu), np.minimum(ce, vv)])
        ev = np.concatenate([vv, np.maximum(ce, uu), np.maximum(ce, vv)])
        tt = pa.table(
            {
                "u": pa.array(eu, pa.int64()),
                "v": pa.array(ev, pa.int64()),
                "ps": pa.array(np.ones(len(eu), np.int64)),
            }
        )
        agg = tt.group_by(["u", "v"]).aggregate([("ps", "sum")])
        return agg.rename_columns(["u", "v", "ps"])

    def tag_pair(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, ["u", "v"], n_parts))

    def reduce_pairs(g: pa.Table) -> pa.Table:
        agg = (
            g.drop_columns("__part")
            .group_by(["u", "v"])
            .aggregate([("ps", "sum")])
        )
        return agg.rename_columns(["u", "v", "support"])

    return (
        tri.map_batches(explode, batch_format="pyarrow", batch_size=None)
        .map_batches(tag_pair, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(reduce_pairs, batch_format="pyarrow")
    )
