"""Distributed PCA projection over an embedding column.

The dimensionality-reduction precursor every embedding pipeline runs
before clustering / visualization / whitening.  Two passes, both
streaming:

1. **Moments pass** — per-block X^T X / Σx / n partials (ONE numpy
   matmul per block, d² partial rows ride the shuffle), combined by a
   d²-row groupby; identical shape to ``emb_covariance``.  The d×d
   covariance is driver-sized BY DEFINITION (d ≤ a few thousand — it
   never scales with corpus size), so the eigendecomposition runs on
   the driver: ``np.linalg.eigh`` on the symmetric covariance, top-q
   eigenvectors taken in descending-eigenvalue order.
2. **Projection pass** — components broadcast once via ``ray.put``;
   each block projects with one matmul.

Sign convention: eigenvectors are sign-ambiguous, so each component is
flipped to make its largest-|coefficient| entry positive (ties: first
index), making outputs reproducible across BLAS builds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


def _mat(t: pa.Table, vec_col: str) -> np.ndarray:
    col = t.column(vec_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    if len(offs) <= 1:
        return np.zeros((0, 0))
    dim = int(offs[1] - offs[0])
    if not np.all(np.diff(offs) == dim):
        raise ValueError("pca requires fixed-dim embeddings")
    flat = col.values.to_numpy(zero_copy_only=False)
    return flat[offs[0] : offs[-1]].astype(np.float64).reshape(-1, dim)


def covariance_and_mean(
    vecs: rd.Dataset, vec_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray, int]:
    """(population covariance d×d, mean d, n) from streaming partials."""

    def partial(t: pa.Table) -> pa.Table:
        x = _mat(t, vec_col)
        n, d = x.shape
        xtx = x.T @ x if n else np.zeros((0, 0))
        return pa.table(
            {
                "xtx": pa.array([xtx.ravel()], pa.list_(pa.float64())),
                "sx": pa.array([x.sum(axis=0) if n else []], pa.list_(pa.float64())),
                "n": pa.array([n], pa.int64()),
            }
        )

    rows = vecs.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).take_all()  # bounded: ONE row per input block (d² floats each)
    rows = [r for r in rows if r["n"] > 0]
    if not rows:
        raise ValueError("pca: empty input")
    n = sum(int(r["n"]) for r in rows)
    sx = np.sum([np.asarray(r["sx"]) for r in rows], axis=0)
    xtx = np.sum([np.asarray(r["xtx"]) for r in rows], axis=0)
    d = len(sx)
    mean = sx / n
    cov = xtx.reshape(d, d) / n - np.outer(mean, mean)
    return cov, mean, n


def principal_components(cov: np.ndarray, q: int) -> np.ndarray:
    """Top-q eigenvectors (rows), descending eigenvalue, sign-fixed."""
    w, v = np.linalg.eigh((cov + cov.T) / 2.0)
    order = np.argsort(w)[::-1][:q]
    comps = v[:, order].T.copy()
    for r in comps:
        j = int(np.argmax(np.abs(r)))
        if r[j] < 0:
            r *= -1.0
    return comps


def project(
    vecs: rd.Dataset,
    components: np.ndarray,
    mean: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> rd.Dataset:
    """(id, pc0..pc{q-1}) — centered projection, one matmul per block."""
    comp_ref = ray.put(np.asarray(components, dtype=np.float64))
    mean_ref = ray.put(np.asarray(mean, dtype=np.float64))

    def proj(t: pa.Table) -> pa.Table:
        c = ray.get(comp_ref)
        m = ray.get(mean_ref)
        x = _mat(t, vec_col)
        y = (x - m) @ c.T
        if round_digits is not None:
            y = np.round(y, round_digits)
        cols = {id_col: t.column(id_col).cast(pa.int64())}
        for k in range(c.shape[0]):
            cols[f"pc{k}"] = pa.array(y[:, k], pa.float64())
        return pa.table(cols)

    return vecs.map_batches(proj, batch_format="pyarrow", batch_size=None)


def pca_project(
    vecs: rd.Dataset,
    q: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    cov, mean, _ = covariance_and_mean(vecs, vec_col)
    comps = principal_components(cov, q)
    return project(vecs, comps, mean, id_col=id_col, vec_col=vec_col)


def power_component(cov: np.ndarray, n_iters: int = 2) -> np.ndarray:
    """Top-component estimate by ``n_iters`` power iterations from the
    all-ones start vector, unit-normalized at the end only.

    This is the SQL-unrollable twin of :func:`principal_components`
    (``eigh`` has no DuckDB form; a fixed-iteration matvec recurrence
    does) — it exists so the WHOLE pca machinery (moments pass +
    projection pass) can sit under a DuckDB hash gate with only the
    driver-side eigensolve swapped.  Deterministic: no RNG, and the
    all-ones start avoids the sign ambiguity eigh needs fixing for."""
    v = np.ones(cov.shape[0], dtype=np.float64)
    for _ in range(n_iters):
        v = cov @ v
    nrm = float(np.sqrt((v * v).sum()))
    if nrm > 0:
        v = v / nrm
    return v


def pca_power_project(
    vecs: rd.Dataset,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 4,
) -> rd.Dataset:
    """(id, pc0): projection onto the power-iteration component —
    the production moments + projection passes end to end; 4-dp
    rounding absorbs the last-ulp partial-sum order difference vs a
    sequential-sum oracle (the repo's distributed-float convention)."""
    cov, mean, _ = covariance_and_mean(vecs, vec_col)
    comp = power_component(cov, n_iters=n_iters)
    return project(
        vecs,
        comp[None, :],
        mean,
        id_col=id_col,
        vec_col=vec_col,
        round_digits=round_digits,
    )
