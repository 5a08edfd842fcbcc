"""Sorted-neighborhood blocking for entity resolution (Hernández &
Stolfo 1995): sort records by a blocking key, compare only records
within ``window`` positions — the classic sliding-window alternative
to the repo's SymSpell/LSH blocking (``stages/fuzzy.py``,
``stages/dedup.py``) that catches near-matches equality-style blocks
split apart (typo in the first char of a blocking key, etc.).

Distributed WITHOUT a global sort, via two grouped scans:

1. global rank = row_number() ORDER BY (key, id) — the
   ``stages/ordering.py`` two-pass discipline, with the bucket
   function swapped for a MONOTONE one (big-endian first-8-bytes of
   the key): bucket counts collect (<= n_buckets rows), exclusive
   offsets broadcast, each bucket group sorts locally and emits
   ``offset + arange``.  Monotonicity (k1 <= k2 => bucket(k1) <=
   bucket(k2)) is what makes per-bucket local ranks globally correct;
   key skew shows up as bucket skew and is the documented trade
   (raise ``n_buckets`` / refine the prefix for hot prefixes).
2. window join: each ranked record lands in its home window-bucket
   ``rank // window`` and as a guest in the NEXT one, so every pair
   with ``rank_b - rank_a < window`` co-locates in the larger
   member's home bucket (diff < window means the smaller sits in the
   same or previous bucket) and is emitted exactly once.

Output: candidate pairs (id_a, id_b, rank_a, rank_b, key_a, key_b) —
a comparer (Jaro-Winkler etc.) runs vectorized on the pair stream.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


def _key_bucket(keys: list[str], n_buckets: int) -> np.ndarray:
    """Monotone bucket: big-endian uint64 of the first 8 key bytes,
    top bits."""
    shift = np.uint64(64 - max(1, (n_buckets - 1).bit_length()))
    out = np.empty(len(keys), dtype=np.uint64)
    for i, k in enumerate(keys):
        b = (k or "").encode()[:8]
        out[i] = int.from_bytes(b.ljust(8, b"\x00"), "big")
    return (out >> shift).astype(np.int64)


def global_rank_by_key(
    ds: rd.Dataset,
    key_column: str,
    id_column: str,
    n_buckets: int = 256,
) -> rd.Dataset:
    """(id, key, rank) with rank = 0-based row_number() ORDER BY
    (key, id), computed per monotone key-prefix bucket + broadcast
    offsets (no global sort)."""

    def keyed(t: pa.Table) -> pa.Table:
        keys = t.column(key_column).to_pylist()
        return pa.table(
            {
                "id": t.column(id_column).cast(pa.int64()),
                "k": pa.array([k or "" for k in keys], pa.string()),
                "__bucket": pa.array(_key_bucket(keys, n_buckets), pa.int64()),
            }
        )

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow", batch_size=None)

    def partial(t: pa.Table) -> pa.Table:
        ones = pa.table(
            {
                "__bucket": t.column("__bucket"),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        return (
            ones.group_by("__bucket")
            .aggregate([("n", "sum")])
            .rename_columns(["__bucket", "n"])
        )

    cells = (
        keyed_ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("__bucket")
        .sum("n")
        .take_all()
    )  # bounded: <= n_buckets rows
    cells.sort(key=lambda r: int(r["__bucket"]))
    offsets: dict[int, int] = {}
    run = 0
    for r in cells:
        offsets[int(r["__bucket"])] = run
        run += int(r["sum(n)"])
    off_ref = ray.put(offsets)

    def rank_group(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        off = ray.get(off_ref)[int(g.column("__bucket")[0].as_py())]
        order = pc.sort_indices(
            g, sort_keys=[("k", "ascending"), ("id", "ascending")]
        )
        g = g.take(order)
        return pa.table(
            {
                "id": g.column("id"),
                "k": g.column("k"),
                "rank": pa.array(off + np.arange(g.num_rows, dtype=np.int64)),
            }
        )

    return keyed_ds.groupby("__bucket").map_groups(
        rank_group, batch_format="pyarrow"
    )


def sorted_neighborhood_pairs(
    ds: rd.Dataset,
    key_column: str,
    id_column: str,
    window: int = 4,
    n_buckets: int = 256,
) -> rd.Dataset:
    """Candidate pairs with ``0 < rank_b - rank_a < window`` under the
    (key, id) sort order."""
    ranked = global_rank_by_key(ds, key_column, id_column, n_buckets)

    def to_wbuckets(t: pa.Table) -> pa.Table:
        r = t.column("rank").to_numpy(zero_copy_only=False)
        home = r // window
        return pa.table(
            {
                "wb": pa.array(np.concatenate([home, home + 1]), pa.int64()),
                "id": pa.concat_arrays(
                    [t.column("id").combine_chunks()] * 2
                ),
                "k": pa.concat_arrays([t.column("k").combine_chunks()] * 2),
                "rank": pa.concat_arrays(
                    [t.column("rank").combine_chunks()] * 2
                ),
            }
        )

    def emit_pairs(g: pa.Table) -> pa.Table:
        wb = int(g.column("wb")[0].as_py())
        import pyarrow.compute as pc

        g = g.take(pc.sort_indices(g, sort_keys=[("rank", "ascending")]))
        r = g.column("rank").to_numpy(zero_copy_only=False)
        ids = g.column("id").to_numpy(zero_copy_only=False)
        ks = g.column("k").to_pylist()
        ia: list[int] = []
        ib: list[int] = []
        n = len(r)
        for j in range(n):
            if r[j] // window != wb:
                continue  # guests never anchor a pair
            i = j - 1
            while i >= 0 and r[j] - r[i] < window:
                ia.append(i)
                ib.append(j)
                i -= 1
        return pa.table(
            {
                "id_a": pa.array(ids[ia] if ia else [], pa.int64()),
                "id_b": pa.array(ids[ib] if ib else [], pa.int64()),
                "rank_a": pa.array(r[ia] if ia else [], pa.int64()),
                "rank_b": pa.array(r[ib] if ib else [], pa.int64()),
                "key_a": pa.array([ks[i] for i in ia], pa.string()),
                "key_b": pa.array([ks[j] for j in ib], pa.string()),
            }
        )

    return (
        ranked.map_batches(to_wbuckets, batch_format="pyarrow", batch_size=None)
        .groupby("wb")
        .map_groups(emit_pairs, batch_format="pyarrow")
    )


def elementwise_jw(a: list[str], b: list[str]) -> np.ndarray:
    """DuckDB-exact Jaro-Winkler for aligned string pairs, vectorized
    by grouping on the left string (probe-vs-block kernel reuse)."""
    from .fuzzy import _pad_codes, jaro_winkler_probe_block

    out = np.zeros(len(a), dtype=np.float64)
    if not a:
        return out
    groups: dict[str, list[int]] = {}
    for i, s in enumerate(a):
        groups.setdefault(s, []).append(i)
    for probe, idxs in groups.items():
        chars, lens = _pad_codes([b[i] for i in idxs])
        out[np.asarray(idxs)] = jaro_winkler_probe_block(probe, chars, lens)
    return out
