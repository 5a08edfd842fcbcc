"""Single-source shortest paths over a weighted directed edge Dataset —
distributed Bellman-Ford (round-synchronous relaxation), the weighted
companion to the unweighted frontier-join BFS (``graph_bfs_hops``).

    dist_0(source) = 0
    dist_{k+1}(v)  = min(dist_k(v), min over edges (u,v,w): dist_k(u)+w)

Per-round cost is the PageRank shape: ONE hash join of the (finite)
distance table onto the edge list + ONE single-node-key groupby min +
one full-outer merge with the previous round (coalesced min) — the
relaxation stream is edge-sized and node-keyed, never pair-keyed.
Unreached nodes simply have no row (the SQL-friendly encoding: no
infinity sentinel to knife-edge on).

Integer weights keep a fixed-round unroll ALL-INTEGER, so the 2-round
twin (``graph_sssp_2it``) hash-gates against a DuckDB CTE chain with
zero float edges — the pagerank_2it / lpa_2it convention.  After
|V| - 1 rounds the fixpoint is exact SSSP (golden-locked against a
dense numpy Bellman-Ford in ``tests/test_sssp.py``); negative weights
are accepted (textbook Bellman-Ford) but negative CYCLES are the
caller's contract to exclude.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Min

from .joins import hash_join, staged_nonempty


def sssp_distances(
    edges: rd.Dataset,
    source: int,
    rounds: int,
    u: str = "u",
    v: str = "v",
    w: str = "w",
) -> rd.Dataset:
    """(node, dist) int64 after ``rounds`` Bellman-Ford relaxation
    rounds from ``source``; rows exist only for reached nodes."""
    e = staged_nonempty(
        edges.map_batches(
            lambda t: pa.table(
                {
                    "u": t.column(u).cast(pa.int64()),
                    "v": t.column(v).cast(pa.int64()),
                    "w": t.column(w).cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
    )
    dist = rd.from_arrow(
        pa.table(
            {
                "node": pa.array([source], pa.int64()),
                "dist": pa.array([0], pa.int64()),
            }
        )
    )
    if e is None:
        return dist

    for _ in range(rounds):
        frontier = staged_nonempty(
            dist.map_batches(
                lambda t: pa.table(
                    {"u": t.column("node"), "du": t.column("dist")}
                ),
                batch_format="pyarrow",
                batch_size=None,
            )
        )
        assert frontier is not None
        relaxed = staged_nonempty(
            hash_join(e, frontier, on=["u"])
            .map_batches(
                lambda t: pa.table(
                    {
                        "node": t.column("v"),
                        "cand": pc.add(t.column("du"), t.column("w")),
                    }
                ),
                batch_format="pyarrow",
                batch_size=None,
            )
            .groupby("node")
            .aggregate(Min("cand", alias_name="cand"))
        )
        if relaxed is None:  # source has no out-edges
            return dist

        merged = hash_join(
            staged_nonempty(dist), relaxed, on=["node"], how="full_outer"
        )

        def take_min(t: pa.Table) -> pa.Table:
            d = t.column("dist") if "dist" in t.column_names else None
            c = t.column("cand")
            best = pc.min_element_wise(d, c) if d is not None else c
            return pa.table(
                {"node": t.column("node").cast(pa.int64()),
                 "dist": best.cast(pa.int64())}
            )

        dist = merged.map_batches(
            take_min, batch_format="pyarrow", batch_size=None
        )

    return dist
