"""Corpus-level PageRank over an edge Dataset — the global companion to
the per-context centrality scoring in ``core/centrality.py`` (reference
scope: jgrapht-sna centralities on per-context fusion graphs; a
corpus-wide entity rank is the KG-construction follow-on the reference
never had machinery for).

Ray shape (same driver-free discipline as
``canonicalize.connected_components_join_ds``):

- edge⨝out-degree precomputed ONCE (static across iterations);
- the rank table is a Dataset carrying (u, rank, dang) — the dangling
  flag rides WITH the ranks so dangling mass is a plain filtered sum,
  not a per-iteration semi join, and the L1 convergence delta is
  computed inside the rank-update map (old rank is the join's left
  side), not by an extra join;
- each power iteration is therefore exactly: one hash join (ranks onto
  edge sources), one ``groupby(dst).sum`` (gather), one left-outer
  join (update every node, including in-degree-0 ones), plus two
  scalar aggregates (dangling mass, delta);
- only SCALARS (N, dangling mass, delta) ever reach the driver; every
  join input is compacted via ``staged_nonempty`` (the Ray 2.49
  empty-first-block schema-broadcast trap, CLAUDE.md), which also
  bounds per-iteration lineage.

Conventions (matched exactly by ``tests/test_graphrank.py``'s numpy
reference): damping ``d``, uniform ``(1-d)/N`` base, dangling mass
redistributed uniformly, multi-edges add weight, self-loops allowed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..stages.joins import default_join_partitions, staged_nonempty


def pagerank_ds(
    edges: rd.Dataset,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iters: int = 20,
    tol: float | None = 1e-6,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """PageRank over directed edges; returns a Dataset (u, rank).

    ``tol``: stop early when the distributed L1 delta drops below it
    (pass ``None`` to run exactly ``max_iters`` iterations — the mode
    the golden test uses to compare against the numpy reference
    step-for-step)."""
    n_parts = num_partitions or default_join_partitions()

    def col_as(t: pa.Table, c: str, name: str) -> pa.Table:
        return pa.table({name: t.column(c)})

    e = staged_nonempty(
        edges.map_batches(
            lambda t: pa.table({"src": t.column(src), "dst": t.column(dst)}),
            batch_format="pyarrow",
            batch_size=None,
        )
    )
    if e is None:
        return rd.from_arrow(
            pa.table({"u": pa.array([], pa.string()), "rank": pa.array([], pa.float64())})
        )

    # node list = distinct(src) ∪ distinct(dst)
    nodes = staged_nonempty(
        e.map_batches(lambda t: col_as(t, "src", "u"), batch_format="pyarrow")
        .union(e.map_batches(lambda t: col_as(t, "dst", "u"), batch_format="pyarrow"))
        .groupby("u")
        .count()
        .select_columns(["u"])
    )
    assert nodes is not None
    n = nodes.count()

    outdeg = staged_nonempty(
        e.groupby("src").aggregate(Count(alias_name="outdeg"))
    )
    assert outdeg is not None

    # static per-edge out-degree attach (reused every iteration)
    e2 = staged_nonempty(
        e.join(outdeg, join_type="inner", num_partitions=n_parts, on=("src",))
    )
    assert e2 is not None

    # initial ranks WITH the static dangling flag (no out-edges):
    # nodes left-anti-joined once, flag carried through every update
    r0 = 1.0 / n
    deg_u = outdeg.map_batches(
        lambda t: pa.table({"u": t.column("src"), "outdeg": t.column("outdeg")}),
        batch_format="pyarrow",
    )
    ranks = staged_nonempty(
        nodes.join(
            staged_nonempty(deg_u), join_type="left_outer", num_partitions=n_parts, on=("u",)
        ).map_batches(
            lambda t: pa.table(
                {
                    "u": t.column("u"),
                    "rank": pa.array(np.full(t.num_rows, r0), pa.float64()),
                    "dang": pc.is_null(t.column("outdeg")),
                }
            ),
            batch_format="pyarrow",
        )
    )
    assert ranks is not None

    base = (1.0 - damping) / n
    delta = None
    for _ in range(max_iters):
        # dangling mass (scalar): per-block filtered partial sums
        def dang_partial(t: pa.Table) -> pa.Table:
            s = pc.sum(pc.if_else(t["dang"], t["rank"], pa.scalar(0.0))).as_py() or 0.0
            return pa.table({"s": pa.array([s], pa.float64())})

        d_mass = float(
            ranks.map_batches(dang_partial, batch_format="pyarrow").sum("s") or 0.0
        )

        # contributions: rank/outdeg shipped along every edge
        contrib = staged_nonempty(
            e2.join(
                ranks.map_batches(
                    lambda t: pa.table(
                        {"src": t.column("u"), "r": t.column("rank")}
                    ),
                    batch_format="pyarrow",
                ),
                join_type="inner",
                num_partitions=n_parts,
                on=("src",),
            )
            .map_batches(
                lambda t: pa.table(
                    {
                        "u": t.column("dst"),
                        "w": pc.divide(
                            t.column("r"), pc.cast(t.column("outdeg"), pa.float64())
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .groupby("u")
            .aggregate(Sum("w", alias_name="w"))
        )

        add = base + damping * d_mass / n

        def finish(t: pa.Table, add=add) -> pa.Table:
            w = (
                pc.fill_null(t.column("w"), 0.0)
                if "w" in t.schema.names
                else pa.array(np.zeros(t.num_rows), pa.float64())
            )
            new = pc.add(pc.multiply(w, pa.scalar(damping)), pa.scalar(add))
            return pa.table(
                {
                    "u": t.column("u"),
                    "rank": new,
                    "dang": t.column("dang"),
                    "adiff": pc.abs(pc.subtract(new, t.column("rank"))),
                }
            )

        if contrib is None:  # no edge carried mass (all-dangling graph)
            updated = ranks.map_batches(finish, batch_format="pyarrow")
        else:
            updated = ranks.join(
                contrib, join_type="left_outer", num_partitions=n_parts, on=("u",)
            ).map_batches(finish, batch_format="pyarrow")
        new_ranks = staged_nonempty(updated)
        assert new_ranks is not None

        ranks = new_ranks  # adiff rides along; projected away at use sites
        if tol is not None:
            delta = float(new_ranks.sum("adiff") or 0.0)
            if delta < tol:
                break

    return ranks.select_columns(["u", "rank"])


def entity_pagerank(triples: rd.Dataset, **kw) -> rd.Dataset:
    """PageRank over the subject→object entity graph of a triples
    Dataset (columns subj/obj as URIs)."""
    edges = triples.map_batches(
        lambda t: pa.table({"src": t.column("subj"), "dst": t.column("obj")}),
        batch_format="pyarrow",
        batch_size=None,
    )
    return pagerank_ds(edges, **kw)
