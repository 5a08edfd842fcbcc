"""Multi-source BFS hop distance over a distributed edge list.

Graph-traversal primitive the KG path needs for neighborhood radius
queries ("entities within k hops of a seed set") — the distributed
replacement for the reference's in-memory Jena neighborhood walk
(`nelinker/GraphHandlerNEL.java:78-103` unions per-URI neighborhoods
hop by hop).  Same shape as the engine's PageRank / k-core loops: a
bounded number of supersteps, each ONE value join + ONE coarse
reduce; no driver-side node state ever.

Frontier-join BFS:

    dist_0 = seeds at distance 0
    frontier_i ⋈ edges (hash join on u)  ->  candidate (v, i+1)
    new_i = candidates ∖ visited (shuffle anti-join on node)
    visited ∪= new_i ; frontier_{i+1} = new_i

Every structure is a Dataset: ``visited`` grows to node volume but
stays block-distributed (materialized per superstep so each iteration
reads a compacted copy instead of re-running the whole lineage).  The
frontier shrinks monotonically after the expansion peak, so the join
traffic per superstep is bounded by edge volume.  max_hops bounds the
superstep count (diameter cap), matching the recursive-CTE oracle.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from .joins import default_join_partitions, staged_nonempty
from .partition import expansion_partitions, part_column


def bfs_hops(
    edges: rd.Dataset,
    seeds: rd.Dataset,
    max_hops: int,
    src: str = "u",
    dst: str = "v",
    node: str = "node",
) -> rd.Dataset:
    """Minimum hop count from any seed to every reachable node within
    ``max_hops``.  ``edges`` must be DIRECTED rows (pass both
    orientations for an undirected graph); ``seeds`` is a dataset with
    one ``node`` column.  Returns (node, hops) with hops = min
    distance, seeds at 0."""
    n_parts = expansion_partitions()

    def stamp(t: pa.Table, d: int) -> pa.Table:
        return pa.table(
            {
                node: t.column(node).cast(pa.int64()),
                "hops": pa.array([d] * t.num_rows, pa.int64()),
            }
        )

    visited = seeds.map_batches(
        stamp, batch_format="pyarrow", batch_size=None, fn_args=(0,)
    ).materialize()
    frontier = visited
    edges_staged = staged_nonempty(
        edges.select_columns([src, dst]).materialize()
    )
    if edges_staged is None:
        return visited
    for depth in range(1, max_hops + 1):
        fr = staged_nonempty(frontier)
        if fr is None:
            break
        reached = fr.join(
            edges_staged.rename_columns({src: node}),
            join_type="inner",
            on=(node,),
            num_partitions=default_join_partitions(),
        ).select_columns([dst])

        # dedup candidates BEFORE the anti-join (expansion-sized input,
        # node-sized output) — coarse-partition map_groups per the
        # engine's pair-reduce rule, not a native multi-key groupby.
        def tag(t: pa.Table) -> pa.Table:
            return t.append_column("__part", part_column(t, [dst], n_parts))

        def uniq(g: pa.Table) -> pa.Table:
            u = g.column(dst).cast(pa.int64()).unique()
            return pa.table({node: u})

        cand = (
            reached.map_batches(tag, batch_format="pyarrow", batch_size=None)
            .groupby("__part")
            .map_groups(uniq, batch_format="pyarrow", num_cpus=1)
        )
        # new = cand ∖ visited, both node-sized: shuffle anti-join.
        # cand can be EMPTY (frontier with no outgoing edges) — stage it
        # against the Ray 2.49 empty-first-block schema-broadcast trap.
        cand = staged_nonempty(cand)
        if cand is None:
            break
        new = cand.join(
            visited.select_columns([node]),
            join_type="left_anti",
            on=(node,),
            num_partitions=default_join_partitions(),
        )
        new_staged = staged_nonempty(new)
        if new_staged is None:
            break
        stamped = new_staged.map_batches(
            stamp, batch_format="pyarrow", batch_size=None, fn_args=(depth,)
        )
        visited = visited.union(stamped).materialize()
        frontier = stamped.materialize()
    return visited
