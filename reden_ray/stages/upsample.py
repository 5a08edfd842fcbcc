"""Deterministic source upsampling (LLaMA-recipe data repetition):
replicate each document ``reps`` times according to its source's
mixture weight, with the fractional part resolved per document by an
md5 draw — no RNG, fully SQL-replayable, stable across runs and
partitionings.

Repetition rule (DuckDB twin in ``upsample_sources``):

- ``w`` = the source's weight (e.g. 2.5 -> every doc twice, half the
  docs a third time);
- ``reps = floor(w) + (LE64(md5('u:' || doc_id)[0:8]) % 1024 <
  round(frac(w) * 1024))`` — weights on 1/1024 steps are exact;
- output one row per copy: ``(doc_id, source, rep_idx)`` with
  ``rep_idx`` in ``0..reps-1``; ``reps = 0`` docs are dropped
  (downsampling via w < 1 falls out of the same rule).

Scale shape: a single embarrassingly parallel ``map_batches`` pass —
the weight table is tiny (source-domain-sized) and ships inside the
closure; row expansion is vectorized ``np.repeat``.  Bounded output
inflation: ``sum(w_s * n_s)`` rows, chosen by the mixture designer.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd


def upsample_sources(
    docs: rd.Dataset,
    weights: dict[str, float],
    default_weight: float = 1.0,
    id_column: str = "doc_id",
    source_column: str = "source",
) -> rd.Dataset:
    """One row per replica: ``(doc_id, source, rep_idx)`` (module doc)."""
    md5 = hashlib.md5

    def expand(t: pa.Table) -> pa.Table:
        ids = t.column(id_column).to_numpy(zero_copy_only=False).astype(np.int64)
        srcs = t.column(source_column).to_pylist()
        w = np.fromiter(
            (float(weights.get(s, default_weight)) for s in srcs),
            dtype=np.float64,
            count=len(srcs),
        )
        base = np.floor(w).astype(np.int64)
        frac_ticks = np.rint((w - np.floor(w)) * 1024).astype(np.int64)
        draw = np.fromiter(
            (
                int.from_bytes(md5(f"u:{i}".encode()).digest()[:8], "little") % 1024
                for i in ids
            ),
            dtype=np.int64,
            count=len(ids),
        )
        reps = base + (draw < frac_ticks)
        total = int(reps.sum())
        rep_ids = np.repeat(ids, reps)
        rep_src = np.repeat(np.asarray(srcs, dtype=object), reps)
        # per-row 0..reps-1 counter without a Python loop
        starts = np.repeat(np.cumsum(reps) - reps, reps)
        rep_idx = np.arange(total, dtype=np.int64) - starts
        return pa.table(
            {
                id_column: pa.array(rep_ids),
                source_column: pa.array(rep_src.tolist(), pa.string()),
                "rep_idx": pa.array(rep_idx),
            }
        )

    return docs.map_batches(expand, batch_format="pyarrow", batch_size=None)
