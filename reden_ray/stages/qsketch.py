"""Mergeable quantile sketch (deterministic Munro-Paterson-style
merge-reduce), completing the bounded-state sketch family (HLL
distinct, Misra-Gries heavy hitters, Count-Min frequencies).

State is a weighted value multiset: classes of equal weight ``w``
(powers of two).  The only operation is *halving* a sorted weight-w
class — keep every second element (fixed offset 1), double the weight —
which adds AT MOST ``w`` to the worst-case rank error of any quantile
answer, independent of class size; dropping a single leftover odd
element likewise costs ≤ ``w``.  The sketch CARRIES its accumulated
error bound, so every answer is self-certifying: |true_rank(answer) -
target_rank| <= err, checkable in-query against the exact data (the
``approx_top_terms`` convention).

Scale shape: one partial sketch per block (≤ 2k rows of 17 bytes; the
err rides on the first row as a sentinel — the Misra-Gries pattern),
ONE coarse-partition reduce (a block's rows all carry the same part
tag, since samples merge whole), then a final ≤ n_parts * 2k-row
single-group reduce.  Nothing corpus-sized is collected: the driver
only ever sees the final ≤ 2k-row summary.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd


def _halve_until(vals: np.ndarray, wts: np.ndarray, err: int, cap: int):
    """Repeatedly halve the smallest weight class until total rows <=
    cap.  Returns (values, weights, err) with weights ascending by
    class processing order."""
    classes: dict[int, list[np.ndarray]] = {}
    for w in np.unique(wts):
        classes[int(w)] = [vals[wts == w]]
    total = len(vals)
    while total > cap:
        halvable = [
            k for k, v in classes.items() if sum(a.size for a in v) >= 2
        ]
        if not halvable:  # only held-back singles remain (<= #classes)
            break
        w = min(halvable)
        arr = np.sort(np.concatenate(classes[w]))
        classes[w] = []
        if arr.size % 2 == 1:
            # hold the max element back at weight w: mass conserved,
            # no rank error introduced
            classes[w] = [arr[-1:]]
            arr = arr[:-1]
        promoted = arr[1::2]  # fixed-offset halving: rank error <= w
        err += w
        classes.setdefault(2 * w, []).append(promoted)
        classes = {
            k: v for k, v in classes.items() if sum(a.size for a in v) > 0
        }
        total = sum(a.size for v in classes.values() for a in v)
    out_v, out_w = [], []
    for w, arrs in sorted(classes.items()):
        for a in arrs:
            out_v.append(a)
            out_w.append(np.full(a.size, w, dtype=np.int64))
    if not out_v:
        return np.empty(0, np.float64), np.empty(0, np.int64), err
    return (
        np.concatenate(out_v).astype(np.float64),
        np.concatenate(out_w),
        err,
    )


def _sketch_table(vals, wts, err: int, n_parts: int | None) -> pa.Table:
    e = np.zeros(len(vals), dtype=np.int64)
    if len(vals):
        e[0] = err
    cols = {
        "v": pa.array(vals, pa.float64()),
        "w": pa.array(wts, pa.int64()),
        "err": pa.array(e, pa.int64()),
    }
    if n_parts is not None:
        # whole-sample tag: every row of this partial shares it
        tag = (
            int.from_bytes(
                hashlib.blake2b(np.ascontiguousarray(vals).tobytes(),
                                digest_size=8).digest(),
                "little",
            )
            % n_parts
        )
        cols["__part"] = pa.array(np.full(len(vals), tag, dtype=np.int64))
    return pa.table(cols)


def quantile_sketch(
    ds: rd.Dataset, column: str, k: int = 256
) -> tuple[np.ndarray, np.ndarray, int]:
    """Build the sketch over a numeric column; returns (values sorted,
    weights, rank-error bound).  ``k`` trades summary size (<= 2k rows)
    for error (~halvings * small-class weights)."""
    from .webtext import _default_span_parts

    cap = 2 * k
    n_parts = _default_span_parts()

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(column).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        vals, wts, err = _halve_until(
            np.sort(v), np.ones(len(v), dtype=np.int64), 0, cap
        )
        return _sketch_table(vals, wts, err, n_parts)

    def reduce_part(g: pa.Table) -> pa.Table:
        vals = g.column("v").to_numpy(zero_copy_only=False)
        wts = g.column("w").to_numpy(zero_copy_only=False)
        err = int(np.sum(g.column("err").to_numpy(zero_copy_only=False)))
        vals, wts, err = _halve_until(vals, wts, err, cap)
        return _sketch_table(vals, wts, err, None)

    merged = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(
            lambda t: reduce_part(t.drop_columns("__part")),
            batch_format="pyarrow",
        )
        .take_all()
    )  # bounded: <= n_parts * 2k rows
    vals = np.array([r["v"] for r in merged], dtype=np.float64)
    wts = np.array([r["w"] for r in merged], dtype=np.int64)
    err = int(sum(r["err"] for r in merged))
    vals, wts, err = _halve_until(vals, wts, err, cap)
    order = np.argsort(vals, kind="mergesort")
    return vals[order], wts[order], err


def sketch_quantile(
    vals: np.ndarray, wts: np.ndarray, q: float
) -> tuple[float, int]:
    """(answer, target_rank): smallest sketch value whose cumulative
    weight reaches ceil(q * N); N = total weight."""
    n = int(wts.sum())
    target = max(1, int(np.ceil(q * n)))
    cum = np.cumsum(wts)
    i = int(np.searchsorted(cum, target))
    i = min(i, len(vals) - 1)
    return float(vals[i]), target
