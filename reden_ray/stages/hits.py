"""HITS hubs-and-authorities (Kleinberg 1999) over a directed edge
Dataset — the directed-graph companion to ``pipelines/graphrank.
pagerank_ds`` (reference scope: jgrapht-sna centralities on per-context
graphs; a corpus-level hub/authority rank is the same KG follow-on
PageRank is).

Recurrence (synchronous, mutual reinforcement):

    h_0(u) = 1                      for every node
    a_k(v) = sum_{(u,v) in E} h_{k-1}(u)
    h_k(u) = sum_{(u,v) in E} a_k(v)

Per-round cost is the PageRank shape exactly: one hash join of the
score table onto the edge list + one single-node-key groupby sum per
direction (edge-sized streams grouped by ONE node key — never the
pair-keyed groupby CLAUDE.md bans), then one left-outer join back onto
the node set so sink/source nodes keep explicit zero scores.  Only
scalars (the per-round norms, when normalizing) ever reach the driver;
every join input is compacted via ``staged_nonempty`` (Ray 2.49
empty-first-block schema broadcast).

Two modes, mirroring the pagerank_2it / kmeans_2it convention:

- ``normalize=False`` (the SQL-twin mode): raw integer recurrence —
  with unit init every score is a sum of products of integers, so a
  fixed-round unroll is ALL-INTEGER and hash-gates against a DuckDB
  CTE chain with zero float knife edges (``graph_hits_2it``).
- ``normalize=True`` (the production mode): scores are L1-normalized
  each round (a/sum(a), h/sum(h)) — the textbook fixpoint that
  converges to the principal singular pair of the adjacency matrix;
  golden-locked against a dense numpy reference in
  ``tests/test_hits.py``.

Multi-edges intentionally WEIGHT the sums (a repeated (u, v) row is a
stronger endorsement), matching pagerank_ds; pass a distinct edge list
for the unweighted semantics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Sum

from .joins import hash_join, staged_nonempty


def _score_sum(ds: rd.Dataset, col: str) -> float:
    out = ds.aggregate(Sum(col, alias_name="s"))
    return float(out["s"] or 0.0)


def hits_scores(
    edges: rd.Dataset,
    rounds: int = 2,
    normalize: bool = True,
    src: str = "src",
    dst: str = "dst",
) -> rd.Dataset:
    """(node, hub, auth) after ``rounds`` synchronous HITS rounds.

    int64 scores when ``normalize=False`` (exact, SQL-replayable),
    float64 when ``normalize=True`` (per-round L1 normalization)."""
    e = staged_nonempty(
        edges.map_batches(
            lambda t: pa.table({"src": t.column(src), "dst": t.column(dst)}),
            batch_format="pyarrow",
            batch_size=None,
        )
    )
    typ = pa.float64() if normalize else pa.int64()
    if e is None:
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "hub": pa.array([], typ),
                    "auth": pa.array([], typ),
                }
            )
        )

    def col_as(t: pa.Table, c: str, name: str) -> pa.Table:
        return pa.table({name: t.column(c).cast(pa.int64())})

    nodes = staged_nonempty(
        e.map_batches(lambda t: col_as(t, "src", "node"), batch_format="pyarrow")
        .union(
            e.map_batches(lambda t: col_as(t, "dst", "node"), batch_format="pyarrow")
        )
        .groupby("node")
        .count()
        .select_columns(["node"])
    )
    assert nodes is not None

    one = 1.0 if normalize else 1
    h = nodes.map_batches(
        lambda t: pa.table(
            {"node": t.column("node"), "h": pa.array([one] * t.num_rows, typ)}
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    a = None

    def gather(scores: rd.Dataset, val: str, key: str, out_key: str, out_val: str):
        """sum ``val`` of ``scores`` over edges grouped by the other
        endpoint, left-outer onto the node set (missing -> 0)."""
        s = staged_nonempty(
            scores.map_batches(
                lambda t: pa.table({key: t.column("node"), val: t.column(val)}),
                batch_format="pyarrow",
                batch_size=None,
            )
        )
        assert s is not None
        summed = staged_nonempty(
            hash_join(e, s, on=[key])
            .groupby(out_key)
            .aggregate(Sum(val, alias_name=out_val))
            .map_batches(
                lambda t: pa.table(
                    {"node": t.column(out_key).cast(pa.int64()),
                     out_val: t.column(out_val)}
                ),
                batch_format="pyarrow",
                batch_size=None,
            )
        )

        def fill(t: pa.Table) -> pa.Table:
            v = t.column(out_val).cast(typ)
            return pa.table(
                {"node": t.column("node"), out_val: pc.fill_null(v, pa.scalar(0, typ))}
            )

        if summed is None:
            return nodes.map_batches(
                lambda t: pa.table(
                    {"node": t.column("node"),
                     out_val: pa.array([0 if not normalize else 0.0] * t.num_rows, typ)}
                ),
                batch_format="pyarrow",
                batch_size=None,
            )
        return hash_join(nodes, summed, on=["node"], how="left_outer").map_batches(
            fill, batch_format="pyarrow", batch_size=None
        )

    for _ in range(rounds):
        # a_k(v) = sum over in-edges of h_{k-1}
        a = gather(h.map_batches(
            lambda t: pa.table({"node": t.column("node"), "hv": t.column("h")}),
            batch_format="pyarrow", batch_size=None,
        ), "hv", "src", "dst", "a")
        if normalize:
            na = _score_sum(a, "a")
            if na > 0:
                a = a.map_batches(
                    lambda t, na=na: pa.table(
                        {"node": t.column("node"),
                         "a": pc.divide(t.column("a"), pa.scalar(na, pa.float64()))}
                    ),
                    batch_format="pyarrow",
                    batch_size=None,
                )
        a = staged_nonempty(a)
        assert a is not None
        # h_k(u) = sum over out-edges of a_k
        h = gather(a.map_batches(
            lambda t: pa.table({"node": t.column("node"), "av": t.column("a")}),
            batch_format="pyarrow", batch_size=None,
        ), "av", "dst", "src", "h")
        if normalize:
            nh = _score_sum(h, "h")
            if nh > 0:
                h = h.map_batches(
                    lambda t, nh=nh: pa.table(
                        {"node": t.column("node"),
                         "h": pc.divide(t.column("h"), pa.scalar(nh, pa.float64()))}
                    ),
                    batch_format="pyarrow",
                    batch_size=None,
                )
        h = staged_nonempty(h)
        assert h is not None

    assert a is not None
    joined = hash_join(h, a, on=["node"])

    def finish(t: pa.Table) -> pa.Table:
        hub = t.column("h").cast(typ)
        auth = t.column("a").cast(typ)
        if normalize:
            # half-away 6dp (count-ratio values can land on dyadic halves)
            hv = hub.to_numpy(zero_copy_only=False)
            av = auth.to_numpy(zero_copy_only=False)
            hub = pa.array(np.floor(hv * 1e6 + 0.5) / 1e6, pa.float64())
            auth = pa.array(np.floor(av * 1e6 + 0.5) / 1e6, pa.float64())
        return pa.table(
            {"node": t.column("node").cast(pa.int64()), "hub": hub, "auth": auth}
        )

    return joined.map_batches(finish, batch_format="pyarrow", batch_size=None)
