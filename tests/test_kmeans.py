"""Distributed Lloyd k-means vs an independent numpy reference (same
deterministic init and tie rules, separated blobs so ulp-level float
differences cannot flip assignments)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from reden_ray.stages.kmeans import kmeans_assign, kmeans_fit


def _blobs(k: int, per: int, dim: int = 6, seed: int = 3):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0.0, 50.0, size=(k, dim))  # far apart
    vecs = np.concatenate(
        [centers[j] + rng.normal(0.0, 0.5, size=(per, dim)) for j in range(k)]
    )
    ids = np.arange(len(vecs), dtype=np.int64)
    perm = rng.permutation(len(vecs))
    return ids, vecs[perm]  # ids stay 0..n-1; vectors shuffled


def _ds(ids: np.ndarray, vecs: np.ndarray, blocks: int = 5):
    import ray.data as rd

    tables = []
    for idx in np.array_split(np.arange(len(ids)), blocks):
        tables.append(
            pa.table(
                {
                    "vec_id": pa.array(ids[idx], pa.int64()),
                    "embedding": pa.array(
                        [v.tolist() for v in vecs[idx]], pa.list_(pa.float64())
                    ),
                }
            )
        )
    import ray.data as rd

    return rd.from_arrow(tables)


def _numpy_lloyd(ids, vecs, k, max_iters=10, tol=1e-9):
    # same init: per bucket id % k, vector of the smallest id
    cents = np.zeros((k, vecs.shape[1]))
    seen = np.zeros(k, dtype=bool)
    buckets = ids % k
    for j in range(k):
        rows = np.flatnonzero(buckets == j)
        if len(rows):
            cents[j] = vecs[rows[np.argmin(ids[rows])]]
            seen[j] = True
    cents[~seen] = cents[int(np.flatnonzero(seen)[0])]
    for it in range(max_iters):
        d = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d, axis=1)
        new = cents.copy()
        for j in range(k):
            rows = a == j
            if rows.any():
                new[j] = vecs[rows].mean(axis=0)
        shift = float(np.max(np.abs(new - cents)))
        cents = new
        if shift < tol:
            return cents, a, it + 1
    return cents, a, max_iters


def test_kmeans_matches_numpy(ray_session):
    k = 4
    ids, vecs = _blobs(k, per=60)
    ds = _ds(ids, vecs)
    cents, iters = kmeans_fit(ds, k=k, max_iters=10)
    ref_cents, ref_assign, _ = _numpy_lloyd(ids, vecs, k)
    assert cents == pytest.approx(ref_cents, abs=1e-8)
    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(ds, cents).take_all()
    }
    ref_final = {
        int(i): int(c)
        for i, c in zip(ids, np.argmin(
            ((vecs[:, None, :] - ref_cents[None, :, :]) ** 2).sum(axis=2), axis=1))
    }
    assert got == ref_final
    # every point assigned; no empty output
    assert len(got) == len(ids)


def test_kmeans_missing_init_bucket(ray_session):
    # all-even ids with k=4 leave buckets 1 and 3 empty at init; the
    # run must still produce finite centroids and full coverage
    k = 4
    ids, vecs = _blobs(2, per=40)
    ids = ids * 2  # residues {0, 2} only
    ds = _ds(ids, vecs)
    cents, _ = kmeans_fit(ds, k=k, max_iters=5)
    assert np.isfinite(cents).all()
    got = kmeans_assign(ds, cents).take_all()
    assert len(got) == len(ids)


def test_kmeans_empty_raises(ray_session):
    import ray.data as rd

    empty = rd.from_arrow(
        pa.table({"vec_id": pa.array([], pa.int64()),
                  "embedding": pa.array([], pa.list_(pa.float64()))})
    )
    with pytest.raises(ValueError, match="empty"):
        kmeans_fit(empty, k=2)
