"""Count-Min sketch: mergeable approximate per-key frequency counts.

The third sketch family alongside HLL (approx distinct) and
Misra-Gries (approx top-k) in `stages/aggregates.py`: bounded
``depth x width`` state answering point frequency queries with a
one-sided guarantee — the estimate NEVER undercounts, and overcounts
by at most ``e * N / width`` per hash row with probability
``1 - e^-depth`` (Cormode & Muthukrishnan 2005).

Distributed shape (same as the HLL plan):

1. per-block partial: vectorized key hash (`partition._col_hash`, the
   repo's process-stable blake2/fmix hash — Python ``hash()`` is
   process-salted and must never cross workers), ``depth`` cell
   indices per row via fmix64(h ^ seed_r) % width, sparse
   (cell, cnt) rows via one ``np.unique`` — a block contributes at
   most depth*width rows regardless of its size;
2. ONE ``groupby(cell).sum`` — Count-Min merges by elementwise
   addition, so partial sketches combine associatively;
3. the final sketch is <= depth*width rows (16 KiB-class), safe to
   collect/broadcast for point queries.

The driver-gateable contract is the deterministic one-sided bound
(est >= exact for every key, always); the tightness of the
overestimate is probabilistic and pytest-pinned, mirroring the
Misra-Gries bound-contract precedent.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

DEPTH = 4
WIDTH = 4096
# deterministic odd seeds (splitmix64 increments of golden gamma)
_SEEDS = (np.uint64(0x9E3779B97F4A7C15) * np.arange(1, 64, dtype=np.uint64))


def _cells(keys_hash: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(depth, n) int64 cell ids (row-major: r*width + col)."""
    from .dedup import _fmix64

    rows = []
    for r in range(depth):
        h = _fmix64(keys_hash ^ _SEEDS[r])
        rows.append((h % np.uint64(width)).astype(np.int64) + r * width)
    return np.stack(rows)


def count_min_sketch(
    ds: rd.Dataset, column: str, depth: int = DEPTH, width: int = WIDTH
) -> rd.Dataset:
    """Sketch Dataset with columns (cell: int64, cnt: int64); at most
    depth*width rows.  Merge two sketches by unioning and re-summing."""
    from .partition import _col_hash

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"cell": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
            )
        h = _col_hash(t.column(column))
        flat = _cells(h, depth, width).ravel()
        uniq, cnt = np.unique(flat, return_counts=True)
        return pa.table(
            {
                "cell": pa.array(uniq, pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("cell")
        .sum("cnt")
        .map_batches(
            lambda t: t.rename_columns(["cell", "cnt"]), batch_format="pyarrow"
        )
    )


def cms_matrix(
    sketch: rd.Dataset, depth: int = DEPTH, width: int = WIDTH
) -> np.ndarray:
    """Dense (depth, width) matrix from the sketch Dataset — bounded
    collect (<= depth*width rows by construction)."""
    tables = [ray.get(r) for r in sketch.to_arrow_refs()]
    tables = [t for t in tables if t.num_rows > 0]
    m = np.zeros(depth * width, dtype=np.int64)
    if not tables:
        return m.reshape(depth, width)
    t = pa.concat_tables([t.select(["cell", "cnt"]) for t in tables])
    cells = t.column("cell").to_numpy(zero_copy_only=False)
    cnts = t.column("cnt").to_numpy(zero_copy_only=False)
    m[cells] = cnts
    return m.reshape(depth, width)


def cms_estimate(
    matrix: np.ndarray, col: pa.ChunkedArray | pa.Array
) -> np.ndarray:
    """Vectorized point-frequency estimates (min over depth rows) for
    every value in an Arrow column."""
    from .partition import _col_hash

    depth, width = matrix.shape
    h = _col_hash(col)
    cells = _cells(h, depth, width)  # (depth, n), row-major ids
    flat = matrix.ravel()
    return np.min(flat[cells], axis=0)


def approx_count_min(sf_dir: str) -> rd.Dataset:
    """Driver-gateable Count-Min query over lineitem part keys: exact
    per-part counts (one groupby) joined with the sketch estimate; the
    emitted ``cms_never_under`` flag is the sketch's DETERMINISTIC
    one-sided guarantee (est >= exact, always — Count-Min never
    undercounts), so the oracle is plain SQL with TRUE.  The
    probabilistic overestimate bound is pytest-pinned
    (tests/test_cms.py)."""
    import os

    import pyarrow.compute as pc  # noqa: F401

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_partkey"]
    )
    sketch = count_min_sketch(li, "l_partkey")
    m = cms_matrix(sketch)
    m_ref = ray.put(m)

    exact = li.groupby("l_partkey").count()

    def check(t: pa.Table) -> pa.Table:
        mat = ray.get(m_ref)
        est = cms_estimate(mat, t.column("l_partkey"))
        cnt = t.column("count()").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "l_partkey": t.column("l_partkey").cast(pa.int64()),
                "cnt": pa.array(cnt, pa.int64()),
                "cms_never_under": pa.array(est >= cnt, pa.bool_()),
            }
        )

    return exact.map_batches(check, batch_format="pyarrow", batch_size=None)
