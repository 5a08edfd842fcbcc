"""Frequent Directions (Liberty 2013; Ghashami et al. 2016): a
mergeable MATRIX sketch for embedding streams — the vector-side member
of the bounded-state sketch family (HLL distinct, Misra-Gries heavy
hitters, Count-Min, rank-error quantiles).

A sketch B of at most ``2*ell`` rows satisfies the deterministic
two-sided guarantee ``0 <= x'(A'A - B'B)x <= sum(shrink deltas)`` for
every unit vector x (each shrink subtracts between 0 and delta*I from
the Gram matrix), and the classical analysis bounds the delta sum by
``||A||_F^2 / ell`` — the guarantee SURVIVES merging (sketch the
sketches) because deltas simply add.  That makes the Ray shape
trivial: per-block partials (each a 2*ell-row sketch + its delta-sum
scalar riding as a sentinel column), ONE coarse-partition reduce (any
grouping works — FD merge is concatenate-and-shrink, order-irrelevant
for the bound), and a final bounded merge of <= n_parts sketches.
Nothing corpus-sized ever collects: at 10^12 embeddings the driver
sees n_parts * 2*ell rows.

The shrink: SVD the buffer, subtract the (ell+1)-th squared singular
value from every sigma^2, keep the top rows.  Per-shrink cost is an
SVD of a (<=3*ell) x d matrix — O(ell^2 d) — once per ell buffered
rows, so the stream cost is O(d) amortized per row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


def _shrink(rows: np.ndarray, ell: int) -> tuple[np.ndarray, float]:
    """One FD shrink: rows (m x d) -> (< ell x d), plus this shrink's
    ``delta`` (the ell-th largest squared singular value).  The shrink
    subtracts between 0 and delta*I from the Gram matrix, so summed
    deltas certify ``0 <= x'(A'A - B'B)x <= sum(delta)`` for unit x."""
    if rows.shape[0] <= ell:
        return rows, 0.0
    _, s, vt = np.linalg.svd(rows, full_matrices=False)
    delta = float(s[ell - 1] ** 2) if s.size >= ell else 0.0
    s2 = np.maximum(s**2 - delta, 0.0)
    keep = s2 > 0
    return np.sqrt(s2[keep])[:, None] * vt[keep], delta


def _sketch_rows(rows: np.ndarray, ell: int) -> tuple[np.ndarray, float]:
    """Sketch an arbitrary row block to <= 2*ell rows by repeated
    shrinks of 2*ell-row buffers; returns (B, summed deltas)."""
    d = rows.shape[1]
    buf = np.empty((0, d))
    delta_sum = 0.0
    for start in range(0, rows.shape[0], 2 * ell):
        buf = np.vstack([buf, rows[start : start + 2 * ell]])
        if buf.shape[0] > 2 * ell:
            buf, r = _shrink(buf, 2 * ell)
            delta_sum += r
    return buf, delta_sum


def _fd_table(b: np.ndarray, delta_sum: float) -> pa.Table:
    rem = np.zeros(b.shape[0])
    if b.shape[0]:
        rem[0] = delta_sum
    return pa.table(
        {
            "row": pa.array(list(b.astype(np.float64)), pa.list_(pa.float64())),
            "delta": pa.array(rem, pa.float64()),
        }
    )


def frequent_directions(
    ds: rd.Dataset, column: str = "embedding", ell: int = 16
) -> tuple[np.ndarray, float]:
    """(B, delta_sum): sketch matrix of <= 2*ell rows over the
    ``list<float>`` column, plus the summed shrink deltas — the
    self-carried certificate ``0 <= x'(A'A - B'B)x <= delta_sum`` for
    every unit x (checked in-query against the exact Gram matrix)."""
    import hashlib

    from .webtext import _default_span_parts

    n_parts = _default_span_parts()

    def partial(t: pa.Table) -> pa.Table:
        col = t.column(column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        d = len(flat) // max(1, t.num_rows)
        rows = flat.reshape(t.num_rows, d) if t.num_rows else flat.reshape(0, 0)
        b, delta_sum = _sketch_rows(rows, ell)
        out = _fd_table(b, delta_sum)
        tag = (
            int.from_bytes(
                hashlib.blake2b(
                    np.ascontiguousarray(b).tobytes(), digest_size=8
                ).digest(),
                "little",
            )
            % n_parts
        )
        return out.append_column(
            "__part", pa.array(np.full(out.num_rows, tag, dtype=np.int64))
        )

    def reduce_part(g: pa.Table) -> pa.Table:
        rows = np.array(g.column("row").to_pylist(), dtype=np.float64)
        delta_sum = float(
            np.sum(g.column("delta").to_numpy(zero_copy_only=False))
        )
        b, r = _sketch_rows(rows, ell)
        return _fd_table(b, delta_sum + r)

    merged = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(
            lambda t: reduce_part(t.drop_columns("__part")),
            batch_format="pyarrow",
        )
        .take_all()
    )  # bounded: <= n_parts * 2*ell rows
    if not merged:
        return np.empty((0, 0)), 0.0
    rows = np.array([r["row"] for r in merged], dtype=np.float64)
    delta_sum = float(sum(r["delta"] for r in merged))
    b, r = _sketch_rows(rows, ell)
    return b, delta_sum + r
