"""Distributed Lloyd k-means over an embedding list column.

The iterative-algorithm companion to PageRank (`pipelines/graphrank`)
and connected components (`pipelines/canonicalize`), and the full-data
counterpart of the IVF index's sample-trained spherical k-means
(`stages/similarity.py`) — Lloyd iterations stream the WHOLE dataset
each round:

- centroids are k x dim (tiny by contract) and live in the object store
  (`ray.put`), read once per task — never re-shipped per batch;
- assignment is one matmul per batch: argmin ||x - c||^2 via the
  expanded form (-2 x . c + ||c||^2), ties to the lowest cluster index
  (numpy argmin semantics — the naive reference shares them);
- each block emits k PARTIAL rows (cluster, vector sum, count); the
  only shuffle is a k-key groupby of those partials, and the driver
  only ever sees k rows per iteration (collect-guard bound);
- empty clusters keep their previous centroid;
- deterministic init (no RNG): centroid j is the vector of the
  smallest vec_id in hash bucket ``vec_id % k`` — one pass, same
  partial/merge shape.

At 10^12 rows the per-iteration cost is one streamed scan + a k-row
shuffle; convergence state (k x dim floats) never grows with data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


def _vecs(t: pa.Table, id_column: str, column: str) -> tuple[np.ndarray, np.ndarray]:
    col = t.column(column)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = col.values.to_numpy(zero_copy_only=False)
    dim = int(offsets[1] - offsets[0]) if len(offsets) > 1 else 0
    if dim:
        # Fail loudly on ragged rows; slice by offsets so a SLICED
        # ListArray (nonzero array offset into the child buffer) can't
        # silently misalign every id<->vector pairing.
        if not np.all(np.diff(offsets) == dim):
            raise ValueError(
                "kmeans: embedding column is ragged — all vectors must "
                "share one dimension"
            )
        mat = flat[offsets[0] : offsets[-1]].astype(np.float64).reshape(-1, dim)
    else:
        mat = flat[:0].astype(np.float64).reshape(0, 0)
    ids = t.column(id_column).to_numpy(zero_copy_only=False)
    return ids, mat


def _init_centroids(
    ds: rd.Dataset, id_column: str, column: str, k: int
) -> np.ndarray:
    """Deterministic: per bucket j = vec_id % k, the vector of the
    smallest vec_id.  Partial per block -> k-key merge -> k rows."""

    def partial(t: pa.Table) -> pa.Table:
        ids, mat = _vecs(t, id_column, column)
        if len(ids) == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "vid": pa.array([], pa.int64()),
                    "vec": pa.array([], pa.list_(pa.float64())),
                }
            )
        buckets = ids % k
        keep_b, keep_i, keep_v = [], [], []
        for j in np.unique(buckets):
            rows = np.flatnonzero(buckets == j)
            best = rows[np.argmin(ids[rows])]
            keep_b.append(int(j))
            keep_i.append(int(ids[best]))
            keep_v.append(mat[best].tolist())
        return pa.table(
            {
                "bucket": pa.array(keep_b, pa.int64()),
                "vid": pa.array(keep_i, pa.int64()),
                "vec": pa.array(keep_v, pa.list_(pa.float64())),
            }
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("bucket")
        .map_groups(
            lambda g: g.take(
                pa.array([int(np.argmin(g.column("vid").to_numpy(zero_copy_only=False)))])
            ),
            batch_format="pyarrow",
        )
        .take_all()
    )  # <= k rows by construction
    if not rows:
        raise ValueError("empty input")
    dim = len(rows[0]["vec"])
    cents = np.zeros((k, dim))
    seen = np.zeros(k, dtype=bool)
    for r in rows:
        cents[r["bucket"]] = np.asarray(r["vec"], dtype=np.float64)
        seen[r["bucket"]] = True
    # buckets with no members (k > distinct residues): copy the first
    # seen centroid so distances stay finite; Lloyd will never move it
    first = int(np.flatnonzero(seen)[0])
    cents[~seen] = cents[first]
    return cents


def _assign(mat: np.ndarray, cents: np.ndarray) -> np.ndarray:
    # argmin ||x-c||^2 = argmin(-2 x.c + ||c||^2); ties -> lowest index
    scores = -2.0 * (mat @ cents.T) + (cents * cents).sum(axis=1)
    return np.argmin(scores, axis=1)


def kmeans_fit(
    ds: rd.Dataset,
    k: int = 8,
    column: str = "embedding",
    id_column: str = "vec_id",
    max_iters: int = 10,
    tol: float = 1e-9,
) -> tuple[np.ndarray, int]:
    """Returns (centroids k x dim, iterations run)."""
    cents = _init_centroids(ds, id_column, column, k)

    for it in range(max_iters):
        cref = ray.put(cents)

        def partial(t: pa.Table) -> pa.Table:
            c = ray.get(cref)
            ids, mat = _vecs(t, id_column, column)
            if len(ids) == 0:
                return pa.table(
                    {
                        "cluster": pa.array([], pa.int64()),
                        "vsum": pa.array([], pa.list_(pa.float64())),
                        "n": pa.array([], pa.int64()),
                    }
                )
            a = _assign(mat, c)
            cl, sums, ns = [], [], []
            for j in np.unique(a):
                rows = a == j
                cl.append(int(j))
                sums.append(mat[rows].sum(axis=0).tolist())
                ns.append(int(rows.sum()))
            return pa.table(
                {
                    "cluster": pa.array(cl, pa.int64()),
                    "vsum": pa.array(sums, pa.list_(pa.float64())),
                    "n": pa.array(ns, pa.int64()),
                }
            )

        def merge(g: pa.Table) -> pa.Table:
            vs = g.column("vsum")
            if isinstance(vs, pa.ChunkedArray):
                vs = vs.combine_chunks()
            mat = vs.values.to_numpy(zero_copy_only=False).reshape(g.num_rows, -1)
            n = int(g.column("n").to_numpy(zero_copy_only=False).sum())
            return pa.table(
                {
                    "cluster": g.column("cluster").slice(0, 1),
                    "vsum": pa.array([mat.sum(axis=0).tolist()], pa.list_(pa.float64())),
                    "n": pa.array([n], pa.int64()),
                }
            )

        rows = (
            ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby("cluster")
            .map_groups(merge, batch_format="pyarrow")
            .take_all()
        )  # <= k rows by construction
        new = cents.copy()  # empty clusters keep their centroid
        for r in rows:
            new[r["cluster"]] = np.asarray(r["vsum"], dtype=np.float64) / r["n"]
        shift = float(np.max(np.abs(new - cents))) if len(rows) else 0.0
        cents = new
        if shift < tol:
            return cents, it + 1
    return cents, max_iters


def kmeans_assign(
    ds: rd.Dataset,
    centroids: np.ndarray,
    column: str = "embedding",
    id_column: str = "vec_id",
) -> rd.Dataset:
    """(id, cluster) assignment dataset for fitted centroids."""
    cref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        ids, mat = _vecs(t, id_column, column)
        a = (
            _assign(mat, c)
            if len(ids)
            else np.zeros(0, dtype=np.int64)
        )
        return pa.table(
            {
                id_column: pa.array(ids, pa.int64()),
                "cluster": pa.array(a.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=None)
