"""Logarithmic-round connected components over an edge Dataset.

``canonicalize.connected_components_join_ds`` propagates min labels one
hop per iteration — linear in graph DIAMETER, the right trade for the
KG alias clusters it serves (tiny, star-shaped), but wrong for general
graphs: a 10^4-diameter path needs 10^4 shuffles.  This module is the
O(log n)-round alternative: alternating LARGE-STAR / SMALL-STAR edge
contractions (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14 — public algorithm, re-derived here over Ray Data):

- large-star: per node u, with m = min(N(u) ∪ {u}), rewrite every
  neighbor v > u to the edge (v, m) — strictly-larger neighbors hook
  onto u's best-known minimum;
- small-star: per node u over its ≤-u neighbors Nl(u) (group canonical
  (min, max) edges by the LARGER endpoint), with m = min(Nl(u)),
  rewrite u and each v in Nl(u) to (v, m).

Both steps preserve connectivity and monotonically lower the edge set
(lexicographic potential); alternation converges to per-component
stars around the minimum node in O(log^2 n) rounds (O(log n) observed).

Execution shape per round: ONE coarse node-hash shuffle
(``part_column`` + ``groupby("__part").map_groups``) whose group body
is pure vectorized segment math (lexsort, boundary mins, expansion),
with block-local dedup inside the SAME body — never a native
pair-keyed groupby (CLAUDE.md) and never a hash-join actor pool.
Convergence is detected from a per-round (edge count, mixed-hash sum)
fingerprint of the DEDUPED edge set — two tiny scalar aggregates, no
driver-side edge materialization anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .partition import part_column

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _mix64(x: np.ndarray) -> np.ndarray:
    v = x.astype(np.int64).view(np.uint64) * _MIX
    v ^= v >> np.uint64(29)
    return v * _MIX


def _fingerprint(edges: rd.Dataset) -> tuple[int, int]:
    """(count, wrapping hash-sum) of the canonical edge set — order- and
    partition-invariant, so equal fingerprints across rounds mean the
    (deduped) edge set is stable."""

    def partial(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        h = _mix64(u) ^ np.uint64(0x94D049BB133111EB) * _mix64(v)
        s = int(np.bitwise_xor.reduce(h).view(np.int64)) if len(h) else 0
        return pa.table(
            {"n": pa.array([len(u)], pa.int64()), "h": pa.array([s], pa.int64())}
        )

    agg = edges.map_batches(partial, batch_format="pyarrow", batch_size=None)
    n = agg.sum("n") or 0
    # xor-fold the per-block hashes (xor is associative/commutative)
    hs = agg.select_columns(["h"]).take_all()
    h = 0
    for row in hs:
        h ^= int(row["h"])
    return int(n), h


def _star_round(edges: rd.Dataset, large: bool, n_parts: int) -> rd.Dataset:
    """One large- or small-star contraction over canonical (u < v)
    edges; output is again canonical, deduped block-locally."""

    def orient(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        if large:
            # symmetric: every node sees its full neighborhood
            center = np.concatenate([u, v])
            nbr = np.concatenate([v, u])
        else:
            # canonical u < v: group by the LARGER endpoint
            center = v
            nbr = u
        tt = pa.table(
            {"c": pa.array(center, pa.int64()), "nb": pa.array(nbr, pa.int64())}
        )
        return tt.append_column("__part", part_column(tt, ["c"], n_parts))

    def contract(g: pa.Table) -> pa.Table:
        c = g.column("c").to_numpy(zero_copy_only=False)
        nb = g.column("nb").to_numpy(zero_copy_only=False)
        n = len(c)
        empty = pa.table(
            {"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())}
        )
        if n == 0:
            return empty
        order = np.lexsort((nb, c))
        c_s, nb_s = c[order], nb[order]
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = c_s[1:] != c_s[:-1]
        seg = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        # per-center min neighbor (first in sorted segment), then vs self
        m = np.minimum(nb_s[starts], c_s[starts])[seg]
        if large:
            keep = nb_s > c_s  # rewrite strictly-larger neighbors
            a, b = m[keep], nb_s[keep]  # m < c < nb: canonical already
        else:
            # rewrite all smaller neighbors AND the center itself
            a = np.concatenate([m[starts], m])
            b = np.concatenate([c_s[starts], nb_s])
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        sel = lo != hi
        lo, hi = lo[sel], hi[sel]
        if len(lo) == 0:
            return empty
        t = pa.table({"u": pa.array(lo, pa.int64()), "v": pa.array(hi, pa.int64())})
        return t.group_by(["u", "v"]).aggregate([]).rename_columns(["u", "v"])

    return (
        edges.map_batches(orient, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(contract, batch_format="pyarrow", num_cpus=1)
    )


def cc_min_labels(
    edges: rd.Dataset,
    max_rounds: int = 30,
    num_partitions: int | None = None,
) -> tuple[rd.Dataset, bool]:
    """Component labels (node, label = component min node id) for an
    int64 edge Dataset with columns (u, v).  Self-loops are dropped,
    orientation is normalized — callers can hand any raw pair list.
    Returns (labels Dataset, converged flag)."""
    from .joins import default_join_partitions

    n_parts = num_partitions or default_join_partitions()

    def canon(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
        v = t.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        lo = np.minimum(u, v)
        hi = np.maximum(u, v)
        sel = lo != hi
        tt = pa.table(
            {"u": pa.array(lo[sel], pa.int64()), "v": pa.array(hi[sel], pa.int64())}
        )
        return tt.group_by(["u", "v"]).aggregate([]).rename_columns(["u", "v"])

    cur = edges.map_batches(canon, batch_format="pyarrow", batch_size=None).materialize()
    prev_fp = _fingerprint(cur)
    converged = False
    for _ in range(max_rounds):
        cur = _star_round(cur, large=True, n_parts=n_parts)
        cur = _star_round(cur, large=False, n_parts=n_parts).materialize()
        fp = _fingerprint(cur)
        if fp == prev_fp:
            converged = True
            break
        prev_fp = fp

    # final stars: every non-root node carries exactly one edge to its
    # component root; per-node min over (symmetric neighbors ∪ self)
    def sym(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        tt = pa.table(
            {
                "node": pa.array(np.concatenate([u, v]), pa.int64()),
                "nb": pa.array(np.concatenate([v, u]), pa.int64()),
            }
        )
        return tt.append_column("__part", part_column(tt, ["node"], n_parts))

    def label(g: pa.Table) -> pa.Table:
        node = g.column("node").to_numpy(zero_copy_only=False)
        nb = g.column("nb").to_numpy(zero_copy_only=False)
        if len(node) == 0:
            return pa.table(
                {"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
            )
        order = np.lexsort((nb, node))
        n_s, nb_s = node[order], nb[order]
        new = np.empty(len(n_s), dtype=bool)
        new[0] = True
        new[1:] = n_s[1:] != n_s[:-1]
        starts = np.flatnonzero(new)
        return pa.table(
            {
                "node": pa.array(n_s[starts], pa.int64()),
                "label": pa.array(
                    np.minimum(nb_s[starts], n_s[starts]), pa.int64()
                ),
            }
        )

    labels = (
        cur.map_batches(sym, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(label, batch_format="pyarrow", num_cpus=1)
    )
    return labels, converged
