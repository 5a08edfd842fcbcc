"""Blocked fuzzy (edit-distance) matching.

Record-linkage primitive the reference's dictionary lookup does
exactly (REDEN matches normalized surface forms only,
``nelinker/DictionaryHandler`` exact-key lookups); fuzzy top-1 is the
standard extension for noisy web-text mentions.

``levenshtein_topk`` broadcasts a SMALL probe list (``ray.put`` once)
and scans the corpus with a map_batches stage computing true
Levenshtein distance VECTORIZED ACROSS ROWS: the DP recurrence runs as
numpy ops over the whole batch per (probe char x name char) cell, so
per-batch cost is O(m * L) vector ops of width N instead of N * m * L
scalar Python — no per-row loop.  Each block emits only its local
best row per probe (a partial argmin); one tiny groupby merges the
per-block partials (<= n_probes x n_blocks rows through the shuffle).

Blocking for scale: ``max_len_delta`` prunes rows whose length makes
the distance bound unreachable before any DP (|len(a)-len(b)| is a
Levenshtein lower bound).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


def _pad_codes(names: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(N, L) int32 codepoint matrix (0-padded) + (N,) lengths."""
    lens = np.fromiter((len(s) for s in names), dtype=np.int64, count=len(names))
    L = int(lens.max()) if len(lens) else 0
    chars = np.zeros((len(names), L), dtype=np.int32)
    for i, s in enumerate(names):  # one pass to build the matrix; DP below is vectorized
        if s:
            chars[i, : len(s)] = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int32)
    return chars, lens


def levenshtein_probe_block(
    probe: str, chars: np.ndarray, lens: np.ndarray
) -> np.ndarray:
    """Exact Levenshtein distance from ``probe`` to every padded row.

    Rolls the DP over name positions j (outer) and probe positions i
    (inner); every cell update is a vector op across all N rows.
    Distances are captured for each row at j == its length.
    """
    N, L = chars.shape
    m = len(probe)
    p = (
        np.frombuffer(probe.encode("utf-32-le"), dtype=np.uint32).astype(np.int32)
        if m
        else np.empty(0, np.int32)
    )
    res = np.full(N, m, dtype=np.int64)  # rows with len 0 -> m
    prev = np.tile(np.arange(m + 1, dtype=np.int64), (N, 1))
    cur = np.empty_like(prev)
    for j in range(1, L + 1):
        cur[:, 0] = j
        cj = chars[:, j - 1]
        for i in range(1, m + 1):
            sub = prev[:, i - 1] + (cj != p[i - 1])
            np.minimum(prev[:, i] + 1, cur[:, i - 1] + 1, out=cur[:, i])
            np.minimum(cur[:, i], sub, out=cur[:, i])
        done = lens == j
        if np.any(done):
            res[done] = cur[done, m]
        prev, cur = cur, prev
    return res


class FuzzyTop1:
    """Actor-pool stage: per batch, emit each probe's best local match
    (min distance, ties to the lexicographically smallest name)."""

    def __init__(self, probes_ref, name_col: str, max_len_delta: int | None):
        self.probes: list[tuple[int, str]] = ray.get(probes_ref)
        self.name_col = name_col
        self.max_len_delta = max_len_delta

    def __call__(self, t: pa.Table) -> pa.Table:
        names = t.column(self.name_col).to_pylist()
        chars, lens = _pad_codes(names)
        out_pid, out_name, out_dist = [], [], []
        arr = np.asarray(names, dtype=object)
        for pid, probe in self.probes:
            keep = np.ones(len(names), dtype=bool)
            if self.max_len_delta is not None:
                keep = np.abs(lens - len(probe)) <= self.max_len_delta
            keep &= arr != probe  # exclude self-match
            if not np.any(keep):
                continue
            idx = np.nonzero(keep)[0]
            d = levenshtein_probe_block(probe, chars[idx], lens[idx])
            best = d.min()
            cand = idx[d == best]
            # lexicographic tie-break inside the block
            name = min(arr[cand])
            out_pid.append(pid)
            out_name.append(name)
            out_dist.append(int(best))
        return pa.table(
            {
                "probe_id": pa.array(out_pid, pa.int64()),
                "best_match": pa.array(out_name, pa.string()),
                "distance": pa.array(out_dist, pa.int64()),
            }
        )


def levenshtein_top1(
    ds: rd.Dataset,
    name_col: str,
    probes: list[tuple[int, str]],
    max_len_delta: int | None = None,
    concurrency=(1, 8),
) -> rd.Dataset:
    """Global best fuzzy match per probe over ``ds[name_col]``.

    Probe list is small by contract (broadcast).  Returns one row per
    probe: (probe_id, probe, match, distance).
    """
    probes = sorted(probes)
    probes_ref = ray.put(list(probes))
    partials = ds.map_batches(
        FuzzyTop1,
        fn_constructor_args=(probes_ref, name_col, max_len_delta),
        batch_format="pyarrow",
        batch_size=None,
        concurrency=concurrency,
    )

    probe_text = {pid: s for pid, s in probes}

    def reduce_best(g: pa.Table) -> pa.Table:
        idx = g.sort_by(
            [("probe_id", "ascending"), ("distance", "ascending"), ("best_match", "ascending")]
        )
        row = idx.slice(0, 1)
        pid = row.column("probe_id")[0].as_py()
        return pa.table(
            {
                "probe_id": row.column("probe_id"),
                "probe": pa.array([probe_text[pid]], pa.string()),
                "best_match": row.column("best_match"),
                "distance": row.column("distance"),
            }
        )

    return partials.groupby("probe_id").map_groups(reduce_best, batch_format="pyarrow")
