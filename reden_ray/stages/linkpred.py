"""Graph link prediction: Adamic-Adar scores over an edge list.

The classic common-neighbor family (common-neighbors, Jaccard,
Adamic-Adar) is a *wedge* computation: a candidate pair (a, b) is any
two neighbors of a shared center node, and Adamic-Adar weights each
shared center by 1 / ln(deg(center)).  The distributed shape reuses
the triangle-count machinery (stages/triangles.py) but groups by the
*center* instead of the oriented source:

1. distinct canonical edges (duplicates / self-loops / direction
   dropped — `_distinct_edges`);
2. adjacency rows BOTH directions (node, nbr) — one map, no join: the
   center's degree is its own segment length inside the group, so no
   degree table is ever built or joined;
3. ONE coarse node-hash shuffle (`part_column`), per-partition lexsort
   + per-center neighbor-pair expansion with weight 1/ln(d), then a
   block-local (u, v) pre-combine so repeated pairs collapse before
   the pair shuffle;
4. global `groupby(u, v).sum` — the only pair-sized exchange;
5. anti-join against the edge set (link prediction scores NON-edges);
6. global top-k without a sort (per-block partial take + one-task
   merge, the o1 shape).

Scale note: per-center fan-out is O(d^2) — a true hub blows up step 3.
``max_degree`` caps it: a center above the cap expands only a
DETERMINISTIC hash-ranked sample of ``max_degree`` of its neighbors
(process-stable fmix64 of (center, nbr) — never Python ``hash``), the
center weight still uses the TRUE degree, and every surviving pair
that touched a sampled center carries ``truncated=True`` (OR-ed
through both pair reduces), mirroring ``stages/dedup.py``'s
``max_bucket`` convention.  With ``max_degree`` >= the graph's max
degree no sampling fires and scores equal the exact (None) path;
``max_degree=None`` keeps the exact (u, v, score) schema with no
``truncated`` column.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .triangles import _distinct_edges


def adamic_adar_topk(
    edges: rd.Dataset,
    src: str = "u",
    dst: str = "v",
    k: int = 50,
    max_degree: int | None = None,
) -> rd.Dataset:
    """Top-k non-edge pairs by Adamic-Adar score (see linkpred_topk)."""
    return linkpred_topk(
        edges, src=src, dst=dst, k=k, method="adamic_adar", max_degree=max_degree
    )


def linkpred_topk(
    edges: rd.Dataset,
    src: str = "u",
    dst: str = "v",
    k: int = 50,
    method: str = "adamic_adar",
    max_degree: int | None = None,
) -> rd.Dataset:
    """Top-k non-edge pairs by a common-neighbor link-prediction score:

    - ``adamic_adar``: sum over shared centers of 1/ln(deg(center));
    - ``common_neighbors``: count of shared centers (int score);
    - ``jaccard``: common / (deg(u) + deg(v) - common) — the endpoint
      degrees join in AFTER the anti-join (non-edge pairs only), via
      the cost-based ``smart_join`` so a node-sized degree table
      broadcasts when small and hash-shuffles when not.

    Output columns ``(u, v, score)`` with u < v, float scores rounded
    to 4 dp (ranking uses the ROUNDED score so Ray/SQL float ulp noise
    cannot reorder the cut), ties broken by (u, v).

    ``max_degree`` (the web-scale hub lever): centers above the cap
    expand only a deterministic fmix64-ranked sample of ``max_degree``
    neighbors (true degree still weights the center), and the output
    gains a ``truncated`` bool column — True on any pair whose score
    took at least one sampled center.  Cap >= max degree == exact."""
    from .joins import shuffle_anti_join, smart_join, staged_nonempty
    from .partition import expansion_partitions, part_column

    if method not in ("adamic_adar", "common_neighbors", "jaccard"):
        raise ValueError(f"unknown link-prediction method: {method}")

    capped = max_degree is not None
    empty_cols = {
        "u": pa.array([], pa.int64()),
        "v": pa.array([], pa.int64()),
        "score": pa.array([], pa.float64()),
    }
    if capped:
        empty_cols["truncated"] = pa.array([], pa.bool_())
    empty = pa.table(empty_cols)
    e = _distinct_edges(edges, src, dst).materialize()
    if e.count() == 0:
        return rd.from_arrow(empty)

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

    def wedge_weights(g: pa.Table) -> pa.Table:
        from .dedup import _fmix64

        g = g.drop_columns("__part").sort_by(
            [("node", "ascending"), ("nbr", "ascending")]
        )
        c = g.column("node").to_numpy(zero_copy_only=False)
        nb = g.column("nbr").to_numpy(zero_copy_only=False)
        n = len(c)
        starts = np.flatnonzero(np.concatenate([[True], c[1:] != c[:-1]]))
        ends = np.concatenate([starts[1:], [n]])
        us, vs, ws, trs = [], [], [], []
        for st, en in zip(starts, ends):  # per CENTER node
            d = en - st
            if d < 2:
                continue
            nbrs = nb[st:en]
            trunc = capped and d > max_degree
            if trunc:
                # deterministic hash-ranked neighbor sample: fmix64 of
                # (center ^ nbr-mix) — process-stable, no Python hash();
                # ties (improbable) break by nbr id.  Weight keeps the
                # TRUE degree so cap >= max degree reproduces exact.
                h = _fmix64(
                    nbrs.astype(np.int64).view(np.uint64)
                    ^ _fmix64(np.array([c[st]], dtype=np.int64).view(np.uint64))
                )
                keep = np.lexsort((nbrs, h))[:max_degree]
                nbrs = np.sort(nbrs[keep])
            m = len(nbrs)
            iu = np.triu_indices(m, 1)
            a, b = nbrs[iu[0]], nbrs[iu[1]]
            us.append(a)
            vs.append(b)
            w = 1.0 / np.log(d) if method == "adamic_adar" else 1.0
            ws.append(np.full(len(a), w))
            trs.append(np.full(len(a), trunc))
        if not us:
            return pa.table(
                {
                    "u": pa.array([], pa.int64()),
                    "v": pa.array([], pa.int64()),
                    "w": pa.array([], pa.float64()),
                    "trunc": pa.array([], pa.bool_()),
                    "__part": pa.array([], pa.int64()),
                }
            )
        t2 = pa.table(
            {
                "u": pa.array(np.concatenate(us), pa.int64()),
                "v": pa.array(np.concatenate(vs), pa.int64()),
                "w": pa.array(np.concatenate(ws), pa.float64()),
                "trunc": pa.array(np.concatenate(trs), pa.bool_()),
            }
        )
        # block-local pre-combine before the pair shuffle; the pair
        # partition id is tagged HERE so the 100M-row wedge stream is
        # touched once, not re-mapped by a separate tagging pass
        t2 = t2.group_by(["u", "v"]).aggregate([("w", "sum"), ("trunc", "any")])
        t2 = t2.rename_columns(["u", "v", "w", "trunc"])
        return t2.append_column("__part", part_column(t2, ["u", "v"], n_parts))

    def pair_sum(g: pa.Table) -> pa.Table:
        t2 = (
            g.drop_columns("__part")
            .group_by(["u", "v"])
            .aggregate([("w", "sum"), ("trunc", "any")])
        )
        return t2.rename_columns(["u", "v", "w", "trunc"])

    # pair reduce = a SECOND coarse-partition map_groups, NOT a native
    # groupby(["u","v"]).sum: Ray 2.49's multi-key sort aggregate
    # measured 210 s on the 6.4M-row wedge stream at sf0.01 where the
    # coarse reduce takes ~4 s (single small-int sort key, Arrow hash
    # group_by inside each partition).
    scores = (
        e.map_batches(both_dirs, batch_format="pyarrow", batch_size=None)
        .map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(wedge_weights, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(pair_sum, batch_format="pyarrow")
    )

    def finish(t: pa.Table) -> pa.Table:
        w = t.column("w").to_numpy(zero_copy_only=False)
        if method == "common_neighbors":
            s = pa.array(np.rint(w).astype(np.int64), pa.int64())
        else:
            s = pa.array(np.round(w, 4), pa.float64())
        cols = {"u": t.column("u"), "v": t.column("v"), "score": s}
        if capped:
            cols["truncated"] = t.column("trunc")
        return pa.table(cols)

    scored = scores.map_batches(finish, batch_format="pyarrow", batch_size=None)
    # map_groups output commonly leads with a zero-row block (Ray 2.49
    # first-block schema-broadcast trap) — stage the LEFT side too;
    # shuffle_anti_join stages only its right.
    staged = staged_nonempty(scored)
    if staged is None:
        return rd.from_arrow(empty)
    non_edges = shuffle_anti_join(staged, e, on=["u", "v"])

    if method == "jaccard":
        # undirected degrees: one small groupby over the adjacency rows
        deg = (
            e.map_batches(both_dirs, batch_format="pyarrow", batch_size=None)
            .groupby("node")
            .count()
        )

        def _as(t: pa.Table, key: str, dname: str) -> pa.Table:
            return pa.table(
                {
                    key: t.column("node").cast(pa.int64()),
                    dname: t.column("count()").cast(pa.int64()),
                }
            )

        deg = deg.materialize()
        deg_u = deg.map_batches(
            lambda t: _as(t, "u", "du"), batch_format="pyarrow", batch_size=None
        )
        deg_v = deg.map_batches(
            lambda t: _as(t, "v", "dv"), batch_format="pyarrow", batch_size=None
        )
        joined = smart_join(
            smart_join(non_edges, deg_u, on=["u"]), deg_v, on=["v"]
        )

        def jac(t: pa.Table) -> pa.Table:
            c = t.column("score").to_numpy(zero_copy_only=False)
            du = t.column("du").to_numpy(zero_copy_only=False).astype(np.float64)
            dv = t.column("dv").to_numpy(zero_copy_only=False).astype(np.float64)
            cols = {
                "u": t.column("u"),
                "v": t.column("v"),
                "score": pa.array(np.round(c / (du + dv - c), 4), pa.float64()),
            }
            if capped:
                cols["truncated"] = t.column("truncated")
            return pa.table(cols)

        non_edges = joined.map_batches(jac, batch_format="pyarrow", batch_size=None)

    def block_topk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("score", "descending"),
                ("u", "ascending"),
                ("v", "ascending"),
            ],
        )
        return t.take(idx[:k])

    return (
        non_edges.map_batches(block_topk, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(block_topk, batch_format="pyarrow", batch_size=None)
    )
