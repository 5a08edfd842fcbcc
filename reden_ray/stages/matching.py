"""Distributed maximal matching over an undirected edge Dataset — the
locally-greedy "handshake" algorithm (Israeli & Itai 1986 shape, made
deterministic): every round, edge (u, v) joins the matching iff its
keyed hash is the MINIMUM among the live edges incident to BOTH u and
v (a mutual-min can never conflict with another mutual-min), then all
edges touching matched nodes drop out.  Expected O(log n) rounds; the
result is a maximal (not maximum) matching — the primitive behind
coarsening steps in multilevel graph partitioners and one-to-one ER
assignment.

Determinism: priority = ``LE64(md5(f"{u},{v}"))`` over canonical
u < v edges (DuckDB ``md5_number_upper(u || ',' || v)``), the repo's
SQL-twin kernel — so a fixed-round unroll (``graph_matching_2it``)
hash-gates the production machinery round by round, and re-runs are
replayable.  Hashes ride shuffles as offset-binary int64 (uint64 keys
overflow Ray's groupby re-emit — the stages/kmv.py lesson).

Per-round cost: one node-keyed min reduce over the 2|E| incidence
rows + two hash joins of the node-min table back onto the edges +
one broadcast/shuffle anti-join against the (tiny) matched-node set —
every stream edge-sized or node-sized, nothing pair-keyed.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Min

from .joins import hash_join, shuffle_anti_join, staged_nonempty

_SIGN = np.uint64(1 << 63)


def _edge_prio(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """md5 edge priority in offset-binary int64 (order == unsigned)."""
    h = np.fromiter(
        (
            int.from_bytes(
                hashlib.md5(f"{int(a)},{int(b)}".encode()).digest()[:8], "little"
            )
            for a, b in zip(u, v)
        ),
        dtype=np.uint64,
        count=len(u),
    )
    return (h ^ _SIGN).view(np.int64)


def maximal_matching(
    edges: rd.Dataset,
    max_rounds: int = 30,
    u: str = "u",
    v: str = "v",
) -> rd.Dataset:
    """(u, v, round) rows of the greedy maximal matching; ``round`` is
    the 1-based handshake round that selected the edge."""

    from .triangles import _distinct_edges

    def add_prio(t: pa.Table) -> pa.Table:
        uu = t.column("u").to_numpy(zero_copy_only=False)
        vv = t.column("v").to_numpy(zero_copy_only=False)
        return t.append_column("h", pa.array(_edge_prio(uu, vv), pa.int64()))

    # a duplicated (u, v) row would be selected twice, so dedup GLOBALLY
    # (canonicalize + drop self-loops ride along)
    live = staged_nonempty(
        _distinct_edges(edges, u, v).map_batches(
            add_prio, batch_format="pyarrow", batch_size=None
        )
    )
    out: list[rd.Dataset] = []
    empty = pa.table(
        {
            "u": pa.array([], pa.int64()),
            "v": pa.array([], pa.int64()),
            "round": pa.array([], pa.int64()),
        }
    )

    for rnd in range(1, max_rounds + 1):
        if live is None:
            break

        # per-node min incident priority (2|E| incidence rows, one key)
        def incid(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": pa.concat_arrays(
                        [
                            t.column("u").combine_chunks(),
                            t.column("v").combine_chunks(),
                        ]
                    ),
                    "h": pa.concat_arrays(
                        [
                            t.column("h").combine_chunks(),
                            t.column("h").combine_chunks(),
                        ]
                    ),
                }
            )

        node_min = staged_nonempty(
            live.map_batches(incid, batch_format="pyarrow", batch_size=None)
            .groupby("node")
            .aggregate(Min("h", alias_name="hmin"))
        )
        assert node_min is not None
        nm_u = node_min.map_batches(
            lambda t: pa.table(
                {"u": t.column("node"), "humin": t.column("hmin")}
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
        nm_v = node_min.map_batches(
            lambda t: pa.table(
                {"v": t.column("node"), "hvmin": t.column("hmin")}
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
        # stage the intermediate: its first block can be empty and eat
        # the Ray 2.49 hash-join schema broadcast (CLAUDE.md)
        inner = staged_nonempty(
            hash_join(live, staged_nonempty(nm_u), on=["u"])
        )
        assert inner is not None  # every live u has a node-min row
        attached = hash_join(inner, staged_nonempty(nm_v), on=["v"])

        def select(t: pa.Table, rnd=rnd) -> pa.Table:
            h = t.column("h")
            keep = pc.and_(
                pc.equal(h, t.column("humin")), pc.equal(h, t.column("hvmin"))
            )
            t = t.filter(keep)
            return pa.table(
                {
                    "u": t.column("u").cast(pa.int64()),
                    "v": t.column("v").cast(pa.int64()),
                    "round": pa.array(
                        np.full(t.num_rows, rnd, dtype=np.int64)
                    ),
                }
            )

        matched = staged_nonempty(
            attached.map_batches(select, batch_format="pyarrow", batch_size=None)
        )
        if matched is None:  # no mutual minimum => no live edges had both
            break
        out.append(matched)

        # drop every edge touching a matched node
        mnodes = matched.map_batches(
            lambda t: pa.table(
                {
                    "node": pa.concat_arrays(
                        [
                            t.column("u").combine_chunks(),
                            t.column("v").combine_chunks(),
                        ]
                    )
                }
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
        lu = staged_nonempty(
            shuffle_anti_join(
                live.map_batches(
                    lambda t: t.rename_columns(["node", "v", "h"]),
                    batch_format="pyarrow",
                    batch_size=None,
                ),
                mnodes,
                on=["node"],
            ).map_batches(
                lambda t: t.rename_columns(["u", "node", "h"]),
                batch_format="pyarrow",
                batch_size=None,
            )
        )
        if lu is None:
            live = None
            continue
        live = staged_nonempty(
            shuffle_anti_join(lu, mnodes, on=["node"]).map_batches(
                lambda t: t.rename_columns(["u", "v", "h"]),
                batch_format="pyarrow",
                batch_size=None,
            )
        )

    if not out:
        return rd.from_arrow(empty)
    res = out[0]
    for d in out[1:]:
        res = res.union(d)
    return res.map_batches(
        lambda t: t.select(["u", "v", "round"]),
        batch_format="pyarrow",
        batch_size=None,
    )
