"""k-core decomposition (core number per node) via iterated h-index.

Peeling (the textbook sequential algorithm: repeatedly delete the
minimum-degree node) is inherently serial, so the distributed form uses
the Lü-Chen-Ren-Zhang-Zhang-Zhou result (Nature Physics 2016): start
every node at its degree and repeatedly replace each node's value with
the H-INDEX of its neighbors' values (the largest h such that >= h
neighbors have value >= h).  The sequence is monotonically
non-increasing and converges to exactly the core number — a pure
neighborhood aggregate, so each round is ONE value join onto the
adjacency plus ONE per-node reduce, the same per-iteration shape as
PageRank (pipelines/graphrank.py).

Ray shape per iteration:

1. ``smart_join`` the (node, val) table onto adjacency rows keyed by
   neighbor — cost-based: node-sized tables broadcast, bigger ones
   hash-shuffle;
2. coarse node-hash partitions -> per-partition lexsort -> vectorized
   segment h-index (no Python loop over nodes: rank-within-segment via
   cumcount, h = count of neighbors with val >= rank+1);
3. the changed-node count rides out of the same reduce (join new vs
   old would be a third exchange; instead the old value rides INTO the
   join), so convergence costs no extra pass.

Iterations are bounded by ``max_iters``; the fixture graphs converge in
<= ~5 rounds (dense co-occurrence graphs have shallow core hierarchies).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


def _segment_h_index(vals: np.ndarray, seg_starts: np.ndarray, n: int) -> np.ndarray:
    """H-index per segment of a (segment-sorted, val-DESC-within-segment)
    value array; returns one h per segment, all vectorized."""
    seg_id = np.zeros(n, dtype=np.int64)
    seg_id[seg_starts[1:]] = 1
    seg_id = np.cumsum(seg_id)
    rank = np.arange(n, dtype=np.int64) - seg_starts[seg_id]
    hit = (vals >= rank + 1).astype(np.int64)
    h = np.zeros(len(seg_starts), dtype=np.int64)
    np.add.at(h, seg_id, hit)
    return h


def core_numbers(
    edges: rd.Dataset, src: str = "u", dst: str = "v", max_iters: int = 60
) -> rd.Dataset:
    """Core number per node of the undirected simple graph given by an
    edge list (direction/duplicates/self-loops ignored).  Output
    columns ``(node: int64, core: int64)``."""
    from .joins import smart_join
    from .partition import expansion_partitions, part_column
    from .triangles import _distinct_edges

    e = _distinct_edges(edges, src, dst).materialize()
    if e.count() == 0:
        return rd.from_arrow(
            pa.table(
                {"node": pa.array([], pa.int64()), "core": pa.array([], pa.int64())}
            )
        )

    def both_dirs(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(np.concatenate([u, v]), pa.int64()),
                "nbr": pa.array(np.concatenate([v, u]), pa.int64()),
            }
        )

    adj = e.map_batches(
        both_dirs, batch_format="pyarrow", batch_size=None
    ).materialize()

    # start at degree — ONE reduce over the adjacency
    n_parts = expansion_partitions()

    def deg_partial(t: pa.Table) -> pa.Table:
        uniq, cnt = np.unique(
            t.column("node").to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {"node": pa.array(uniq, pa.int64()), "val": pa.array(cnt, pa.int64())}
        )

    from ray.data.aggregate import Sum

    vals = (
        adj.map_batches(deg_partial, batch_format="pyarrow", batch_size=None)
        .groupby("node")
        .aggregate(Sum("val", alias_name="val"))
        .materialize()
    )

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, ["node"], n_parts))

    def h_reduce(g: pa.Table) -> pa.Table:
        g = g.drop_columns("__part")
        node = g.column("node").to_numpy(zero_copy_only=False)
        nv = g.column("val").to_numpy(zero_copy_only=False)
        old = g.column("old").to_numpy(zero_copy_only=False)
        order = np.lexsort((-nv, node))
        node, nv, old = node[order], nv[order], old[order]
        n = len(node)
        starts = np.flatnonzero(np.concatenate([[True], node[1:] != node[:-1]]))
        h = _segment_h_index(nv, starts, n)
        # the h-index iteration is non-increasing from degree, but cap
        # anyway so a malformed input cannot oscillate
        h = np.minimum(h, old[starts])
        return pa.table(
            {
                "node": pa.array(node[starts], pa.int64()),
                "val": pa.array(h, pa.int64()),
                # per-NODE 0/1 indicator; the global Sum is the changed count
                "changed": pa.array(
                    (h != old[starts]).astype(np.int64), pa.int64()
                ),
            }
        )

    for _ in range(max_iters):
        nbr_vals = vals.map_batches(
            lambda t: pa.table(
                {"nbr": t.column("node"), "val": t.column("val")}
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
        own = vals.map_batches(
            lambda t: pa.table(
                {"node": t.column("node"), "old": t.column("val")}
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
        joined = smart_join(adj, nbr_vals, on=["nbr"])
        joined = smart_join(joined, own, on=["node"])
        new_vals = (
            joined.map_batches(tag, batch_format="pyarrow", batch_size=None)
            .groupby("__part")
            .map_groups(h_reduce, batch_format="pyarrow")
            .materialize()
        )
        changed = int(
            new_vals.aggregate(Sum("changed", alias_name="c"))["c"] or 0
        )
        vals = new_vals.drop_columns(["changed"]).materialize()
        if changed == 0:
            break

    return vals.map_batches(
        lambda t: pa.table(
            {
                "node": t.column("node").cast(pa.int64()),
                "core": t.column("val").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
