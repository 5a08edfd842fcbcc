"""Coarse-partition group-reduce plumbing.

``groupby(key).map_groups(fn)`` pays one Python invocation per DISTINCT
KEY — fatal when keys are corpus-sized (users, urls, documents, pairs).
The scalable shape used across this repo: hash the key into
``num_partitions`` coarse partitions, ONE ``map_groups`` call per
partition, and vectorized segment math (lexsort + boundary detection)
inside.  These helpers keep the per-site code small:

- ``part_column(t, cols, n)``  -> int64 partition ids for the key cols
- ``sorted_segments(t, keys)`` -> (sorted table, seg starts, seg ends)

Both int64 and string keys are supported; string keys hash with
``pyarrow.compute`` kernels (vectorized, process-stable — NEVER Python
``hash()``, which is salted per process).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _col_hash(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Process-stable uint64 hash of an int-like or string column.
    Null keys hash like a sentinel value (all nulls co-partition; a
    harmless collision with that value's partition)."""
    typ = col.type if hasattr(col, "type") else col.chunk(0).type
    if pa.types.is_integer(typ):
        # fill nulls FIRST: to_numpy on a nullable int column yields
        # float NaNs whose int64 cast is undefined
        v = (
            pc.fill_null(col, 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
            .view(np.uint64)
        )
        # fmix-style avalanche so consecutive ids spread across parts
        v = v * _MIX
        v ^= v >> np.uint64(29)
        return v * _MIX
    # strings: reuse arrow's vectorized utf8 length + a stable python
    # fallback per unique value would be slow; blake2-per-row is fine
    # for key columns that are urls/uris (I/O-bound stages), but a
    # dictionary-encode + per-unique hash touches each DISTINCT value
    # once, not each row
    import hashlib

    enc = pc.dictionary_encode(col)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    dict_vals = enc.dictionary.to_pylist()
    uniq = np.array(
        [
            int.from_bytes(
                hashlib.blake2b(
                    s.encode() if s is not None else b"\x00<null>", digest_size=8
                ).digest(),
                "big",
            )
            for s in dict_vals
        ],
        dtype=np.uint64,
    )
    # null VALUES arrive as null indices (not dictionary entries): route
    # them to a sentinel slot appended after the real hashes
    uniq = np.concatenate([uniq, [np.uint64(0x9E3779B97F4A7C15)]])
    idx = (
        pc.fill_null(enc.indices, len(uniq) - 1)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    return uniq[idx]


def expansion_partitions() -> int:
    """Coarse-partition count for EXPANSION-shaped map_groups stages
    (per-group output >> input: wedge/pair enumeration).  Unlike hash
    joins (see joins.default_join_partitions), these groups run as
    plain TASKS, so oversubscription is safe and more partitions =
    more parallel expansion + smaller output blocks.  Measured on the
    sf0.1 co-order wedge stage at 32 CPUs: 16 parts 142 s, 64 parts
    39 s (the sort shuffle coalesces a small input to few blocks, so
    the partition count is what restores task parallelism)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(8, 2 * cpus)


def part_column(t: pa.Table, cols: list[str], n_parts: int) -> pa.Array:
    """int64 partition id per row from the given key columns."""
    h = np.zeros(t.num_rows, dtype=np.uint64)
    for c in cols:
        h = h * _MIX ^ _col_hash(t.column(c))
    return pa.array((h % np.uint64(n_parts)).astype(np.int64), pa.int64())


def sorted_segments(
    t: pa.Table, keys: list[str], extra_sort: list[tuple[str, str]] | None = None
) -> tuple[pa.Table, np.ndarray, np.ndarray]:
    """Sort ``t`` by ``keys`` (+ optional extra sort keys) and return
    (sorted table, start indices, end indices) of the per-key segments —
    all vectorized; the caller loops only over segments it cares about."""
    sort_keys = [(k, "ascending") for k in keys] + list(extra_sort or [])
    idx = pc.sort_indices(t, sort_keys=sort_keys)
    t = t.take(idx)
    n = t.num_rows
    if n == 0:
        return t, np.empty(0, np.int64), np.empty(0, np.int64)
    new = np.zeros(n, dtype=bool)
    new[0] = True
    for k in keys:
        col = t.column(k)
        ne = pc.not_equal(col.slice(1), col.slice(0, n - 1))
        if isinstance(ne, pa.ChunkedArray):
            ne = ne.combine_chunks()
        new[1:] |= ne.fill_null(True).to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(new)
    ends = np.concatenate([starts[1:], [n]])
    return t, starts, ends
