"""Distributed greedy graph coloring — Jones-Plassmann (1993) with a
deterministic hash priority: every round, an UNCOLORED node whose
md5 priority beats every uncolored neighbor's picks the smallest
color absent among its already-colored neighbors.  Independent-set
rounds make the choices conflict-free; the hash order makes runs (and
a DuckDB replay) reproducible.  Coloring is the scheduling primitive
behind conflict-free parallel updates (two adjacent nodes never share
a color).

Priority: ``LE64(md5(str(node)))`` == DuckDB
``md5_number_upper(node::VARCHAR)``, carried as offset-binary int64
(the stages/kmv.py uint64-through-groupby lesson).  Ties are
impossible in practice; the node id breaks them deterministically
anyway ((h, node) lexicographic).

Per-round cost: one hash join of the uncolored-neighbor state onto
the symmetric adjacency + one node-keyed max reduce (locally-maximal
test), one join of colored-neighbor colors + a coarse map_groups
smallest-absent-color pick — edge-sized streams, node-keyed
reductions, the LPA/PageRank discipline.

Fixed-round twin: ``graph_coloring_2it`` unrolls two rounds in SQL;
properness at the fixpoint is golden-locked in
``tests/test_coloring.py``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Max

from .joins import hash_join, shuffle_anti_join, staged_nonempty

_SIGN = np.uint64(1 << 63)


def _node_prio(nodes: np.ndarray) -> np.ndarray:
    h = np.fromiter(
        (
            int.from_bytes(
                hashlib.md5(str(int(n)).encode()).digest()[:8], "little"
            )
            for n in nodes
        ),
        dtype=np.uint64,
        count=len(nodes),
    )
    return (h ^ _SIGN).view(np.int64)


def greedy_coloring(
    edges: rd.Dataset,
    rounds: int = 30,
    u: str = "u",
    v: str = "v",
) -> rd.Dataset:
    """(node, color, round) — color is 0-based; ``round`` is when the
    node was decided.  After enough rounds every node with an edge is
    colored; isolated nodes are out of scope (no conflicts to avoid)."""
    from .partition import part_column
    from .triangles import _distinct_edges
    from .webtext import _default_span_parts

    e = staged_nonempty(_distinct_edges(edges, u, v))
    empty = pa.table(
        {
            "node": pa.array([], pa.int64()),
            "color": pa.array([], pa.int64()),
            "round": pa.array([], pa.int64()),
        }
    )
    if e is None:
        return rd.from_arrow(empty)

    def sym(t: pa.Table) -> pa.Table:
        uu = t.column("u").combine_chunks()
        vv = t.column("v").combine_chunks()
        return pa.table(
            {
                "node": pa.concat_arrays([uu, vv]),
                "nbr": pa.concat_arrays([vv, uu]),
            }
        )

    adj = staged_nonempty(
        e.map_batches(sym, batch_format="pyarrow", batch_size=None)
    )
    assert adj is not None

    def init_nodes(t: pa.Table) -> pa.Table:
        nodes = np.unique(t.column("node").to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "h": pa.array(_node_prio(nodes), pa.int64()),
            }
        )

    uncolored = staged_nonempty(
        adj.map_batches(init_nodes, batch_format="pyarrow", batch_size=None)
        .groupby("node")
        .min("h")
        .map_batches(
            lambda t: t.rename_columns(["node", "h"]),
            batch_format="pyarrow",
            batch_size=None,
        )
    )
    assert uncolored is not None
    colored: rd.Dataset | None = None  # (node, color, round)
    out: list[rd.Dataset] = []
    n_parts = _default_span_parts()

    for rnd in range(1, rounds + 1):
        if uncolored is None:
            break
        # max uncolored-neighbor priority per node (nodes with no
        # uncolored neighbor left get none -> they win by default)
        nbr_h = staged_nonempty(
            hash_join(
                adj,
                uncolored.map_batches(
                    lambda t: pa.table(
                        {"nbr": t.column("node"), "nh": t.column("h")}
                    ),
                    batch_format="pyarrow",
                    batch_size=None,
                ),
                on=["nbr"],
            )
            .groupby("node")
            .aggregate(Max("nh", alias_name="nhmax"))
        )
        if nbr_h is None:
            merged = uncolored.map_batches(
                lambda t: t.append_column(
                    "nhmax",
                    pa.array(
                        np.full(t.num_rows, np.iinfo(np.int64).min, np.int64)
                    ),
                ),
                batch_format="pyarrow",
                batch_size=None,
            )
        else:
            merged = hash_join(uncolored, nbr_h, on=["node"], how="left_outer")

        def winners_safe(t: pa.Table) -> pa.Table:
            # left-outer nulls (no uncolored neighbor) -> win
            nh = pc.fill_null(
                t.column("nhmax").cast(pa.int64()),
                pa.scalar(np.iinfo(np.int64).min, pa.int64()),
            )
            win = pc.greater(t.column("h"), nh)
            return pa.table(
                {"node": t.column("node").cast(pa.int64()).filter(win)}
            )

        winners = staged_nonempty(
            merged.map_batches(winners_safe, batch_format="pyarrow", batch_size=None)
        )
        assert winners is not None  # the global max always wins

        # smallest color absent among COLORED neighbors of each winner
        if colored is None:
            picked = winners.map_batches(
                lambda t, rnd=rnd: pa.table(
                    {
                        "node": t.column("node"),
                        "color": pa.array(
                            np.zeros(t.num_rows, np.int64)
                        ),
                        "round": pa.array(
                            np.full(t.num_rows, rnd, np.int64)
                        ),
                    }
                ),
                batch_format="pyarrow",
                batch_size=None,
            )
        else:
            wnbrs = hash_join(
                staged_nonempty(
                    hash_join(adj, winners, on=["node"])
                ),
                colored.map_batches(
                    lambda t: pa.table(
                        {"nbr": t.column("node"), "ncol": t.column("color")}
                    ),
                    batch_format="pyarrow",
                    batch_size=None,
                ),
                on=["nbr"],
            )

            def tag(t: pa.Table) -> pa.Table:
                return t.append_column(
                    "__part", part_column(t, ["node"], n_parts)
                )

            def pick_group(g: pa.Table) -> pa.Table:
                g = g.drop_columns("__part")
                nd = g.column("node").to_numpy(zero_copy_only=False)
                cl = g.column("ncol").to_numpy(zero_copy_only=False)
                order = np.lexsort((cl, nd))
                nd, cl = nd[order], cl[order]
                starts = np.flatnonzero(
                    np.concatenate([[True], nd[1:] != nd[:-1]])
                )
                ends = np.concatenate([starts[1:], [len(nd)]])
                outs, outc = [], []
                for s0, e0 in zip(starts, ends):
                    used = np.unique(cl[s0:e0])
                    c = 0
                    for uc in used:
                        if uc == c:
                            c += 1
                        elif uc > c:
                            break
                    outs.append(int(nd[s0]))
                    outc.append(c)
                return pa.table(
                    {
                        "node": pa.array(outs, pa.int64()),
                        "pcolor": pa.array(outc, pa.int64()),
                    }
                )

            with_cols = staged_nonempty(
                wnbrs.map_batches(tag, batch_format="pyarrow", batch_size=None)
                .groupby("__part")
                .map_groups(pick_group, batch_format="pyarrow")
            )
            if with_cols is None:
                joined = winners.map_batches(
                    lambda t: t.append_column(
                        "pcolor",
                        pa.array([None] * t.num_rows, pa.int64()),
                    ),
                    batch_format="pyarrow",
                    batch_size=None,
                )
            else:
                joined = hash_join(
                    winners, with_cols, on=["node"], how="left_outer"
                )
            picked = joined.map_batches(
                lambda t, rnd=rnd: pa.table(
                    {
                        "node": t.column("node").cast(pa.int64()),
                        "color": pc.fill_null(
                            t.column("pcolor").cast(pa.int64()),
                            pa.scalar(0, pa.int64()),
                        ),
                        "round": pa.array(
                            np.full(t.num_rows, rnd, np.int64)
                        ),
                    }
                ),
                batch_format="pyarrow",
                batch_size=None,
            )

        picked = staged_nonempty(picked)
        assert picked is not None
        out.append(picked)
        colored = picked if colored is None else staged_nonempty(
            colored.union(picked)
        )
        uncolored = staged_nonempty(
            shuffle_anti_join(
                uncolored,
                picked.map_batches(
                    lambda t: t.select(["node"]),
                    batch_format="pyarrow",
                    batch_size=None,
                ),
                on=["node"],
            )
        )

    res = out[0]
    for d in out[1:]:
        res = res.union(d)
    return res.map_batches(
        lambda t: t.select(["node", "color", "round"]),
        batch_format="pyarrow",
        batch_size=None,
    )
