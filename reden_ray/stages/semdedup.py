"""SemDedup — semantic deduplication via cluster-then-pairwise-cosine
(Abbas et al. 2023, "SemDedup: Data-efficient learning at web-scale
through semantic deduplication").

The embedding-space counterpart of the engine's MinHash/SimHash text
dedup: k-means clusters bound the candidate space, so the quadratic
cosine check runs only WITHIN a cluster.  At corpus scale k grows
proportionally (cluster size stays ~constant), making total work
O(n²/k) with an n/k-bounded per-task memory footprint — the published
recipe for 100-TB embedding dedup.  No all-pairs anywhere: the only
shuffle is the cluster groupby.

Drop rule (deterministic): within a cluster, a vector is ``dropped``
iff an earlier vector (smaller id) in the SAME cluster has cosine
similarity > tau with it.  First-id-wins matches the engine's other
dedup tie-breaks and is oracle-expressible as a correlated EXISTS.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


def assign_and_dedup(
    vecs: rd.Dataset,
    centroids: np.ndarray,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_rows: int = 200_000,
) -> rd.Dataset:
    """(id, cluster, dropped) for every vector.

    ``centroids`` broadcast once via ``ray.put``; assignment is the
    argmax of (e·c − |c|²/2) — numpy argmin-||e−c|| with first-index
    tie-break.  The per-cluster gram matrix is one numpy matmul; a
    cluster larger than ``max_cluster_rows`` raises (k is too small
    for the corpus — the SemDedup contract is bounded cluster size).
    """
    cent_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        col = t.column(vec_col)
        flat = col.combine_chunks()
        offs = flat.offsets.to_numpy()
        dim = c.shape[1]
        if not np.all(np.diff(offs) == dim):
            raise ValueError("semdedup: ragged embedding column")
        x = (
            flat.values.to_numpy(zero_copy_only=False)[offs[0] : offs[-1]]
            .astype(np.float64)
            .reshape(-1, dim)
        )
        scores = x @ c.T - (c * c).sum(axis=1) / 2.0
        return pa.table(
            {
                id_col: t.column(id_col).cast(pa.int64()),
                vec_col: col,
                "cluster": pa.array(
                    scores.argmax(axis=1).astype(np.int64), pa.int64()
                ),
            }
        )

    def dedup(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n > max_cluster_rows:
            raise ValueError(
                f"semdedup: cluster of {n} rows exceeds "
                f"max_cluster_rows={max_cluster_rows}; raise k"
            )
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        flat = g.column(vec_col).combine_chunks()
        offs = flat.offsets.to_numpy()
        dim = (offs[1] - offs[0]) if n > 0 else 0
        x = (
            flat.values.to_numpy(zero_copy_only=False)[offs[0] : offs[-1]]
            .astype(np.float64)
            .reshape(-1, dim)
            if n
            else np.zeros((0, 0))
        )
        order = np.argsort(ids, kind="stable")
        ids, x = ids[order], x[order]
        norms = np.linalg.norm(x, axis=1, keepdims=True)
        xn = x / np.maximum(norms, 1e-300)
        sim = xn @ xn.T
        earlier = np.tril(np.ones((n, n), dtype=bool), k=-1)
        dropped = ((sim > tau) & earlier).any(axis=1)
        cl = g.column("cluster").to_numpy(zero_copy_only=False)[order]
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "cluster": pa.array(cl, pa.int64()),
                "dropped": pa.array(dropped),
            }
        )

    return (
        vecs.map_batches(assign, batch_format="pyarrow", batch_size=None)
        .groupby("cluster")
        .map_groups(dedup, batch_format="pyarrow", num_cpus=1)
    )
