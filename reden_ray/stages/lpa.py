"""Synchronous label propagation (community detection): every round,
each node adopts the MOST FREQUENT label among its neighbors (ties ->
smallest label) — deterministic LPA (Raghavan et al. 2007, synchronous
variant with a total tie order, so runs are reproducible and
SQL-replayable round by round).

Per-round cost is the PageRank shape: ONE label join onto the
symmetrized adjacency + ONE coarse-partition reduce of the
(node, label) count pairs — the pair-shaped stream never touches a
native multi-key groupby (the CLAUDE.md lesson), and the per-node
argmax is decided inside the partition group where a node's rows are
co-located.  Synchronous LPA can oscillate on bipartite structure, so
the API is fixed-round (the caller picks the budget; the 2-round twin
is what the SQL oracle unrolls), mirroring the pagerank_2it /
kmeans_2it convention.

Label domain: nodes that appear in at least one edge (isolated nodes
have no neighbor vote by definition and would only echo their own id).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


def _sym_adj(edges: rd.Dataset, u: str = "u", v: str = "v") -> rd.Dataset:
    """Canonical (u < v) edge list -> symmetric (node, nbr) adjacency."""

    def sym(t: pa.Table) -> pa.Table:
        uu = t.column(u)
        vv = t.column(v)
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [uu.combine_chunks(), vv.combine_chunks()]
                ),
                "nbr": pa.concat_arrays(
                    [vv.combine_chunks(), uu.combine_chunks()]
                ),
            }
        )

    return edges.map_batches(sym, batch_format="pyarrow", batch_size=None)


def lpa_labels(
    edges: rd.Dataset, rounds: int = 2, u: str = "u", v: str = "v"
) -> rd.Dataset:
    """(node, label) after ``rounds`` synchronous LPA rounds; labels
    initialize to the node id."""
    from .joins import hash_join, staged_nonempty
    from .partition import part_column, sorted_segments
    from .triangles import _distinct_edges
    from .webtext import _default_span_parts

    # a repeated (u, v) row would WEIGHT that neighbor's vote — edge
    # streams off co-occurrence expansions are only block-locally
    # deduped, so distinct globally first (one coarse pair reduce)
    adj = _sym_adj(_distinct_edges(edges, u, v)).materialize()

    def init_labels(t: pa.Table) -> pa.Table:
        nodes = np.unique(t.column("node").to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "label": pa.array(nodes, pa.int64()),
            }
        )

    labels = (
        adj.map_batches(init_labels, batch_format="pyarrow", batch_size=None)
        .groupby("node")
        .min("label")
        .map_batches(
            lambda t: t.rename_columns(["node", "label"]), batch_format="pyarrow"
        )
    )

    n_parts = _default_span_parts()

    def count_partial(t: pa.Table) -> pa.Table:
        c = t.group_by(["node", "label"]).aggregate([("label", "count")])
        c = pa.table(
            {
                "node": c.column("node"),
                "label": c.column("label"),
                "c": c.column("label_count").cast(pa.int64()),
            }
        )
        return c.append_column("__part", part_column(c, ["node"], n_parts))

    def argmax_group(g: pa.Table) -> pa.Table:
        g = g.drop_columns("__part")
        m = g.group_by(["node", "label"]).aggregate([("c", "sum")])
        m = m.rename_columns(["node", "label", "c"])
        s, starts, _ = sorted_segments(
            m, ["node"], extra_sort=[("c", "descending"), ("label", "ascending")]
        )
        return s.take(pa.array(starts)).select(["node", "label"])

    for _ in range(rounds):
        staged = staged_nonempty(
            labels.map_batches(
                lambda t: t.rename_columns(["nbr", "label"]),
                batch_format="pyarrow",
            )
        )
        if staged is None:  # empty edge list -> empty label table
            return labels
        nbr_labels = hash_join(adj, staged, on=["nbr"])
        labels = (
            nbr_labels.map_batches(
                count_partial, batch_format="pyarrow", batch_size=None
            )
            .groupby("__part")
            .map_groups(argmax_group, batch_format="pyarrow")
        )
    return labels
