"""Bloom-filter join prefilter — the standard shuffle-volume cut for
large joins with a selective build side.

At 100-TB scale the expensive part of ``probe JOIN build`` is shipping
every probe block through the all-to-all exchange.  When the build side
is selective (a filtered dimension table, a gold subset), a Bloom filter
of its keys — built with a distributed OR-aggregate, broadcast once via
``ray.put`` (the filter is megabytes regardless of probe size) — lets
every probe task drop non-matching rows BEFORE the shuffle.  False
positives only cost wasted shuffle rows; the exact join downstream
(`joins.shuffle_semi_join` or `hash_join`) keeps results exact, so the
composition is safe by construction.

Keys must be integer-typed (the repo's join keys are int64 throughout —
see CLAUDE.md on groupby upcasting); hashing is vectorized splitmix64
double-hashing, never Python ``hash()`` (process-salted).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized over uint64."""
    x = (x + _GOLDEN).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x = (x * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
    x ^= x >> np.uint64(27)
    x = (x * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
    return x ^ (x >> np.uint64(31))


def _positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(k, n) bit positions via double hashing: h1 + i*h2 mod m."""
    u = keys.astype(np.int64).view(np.uint64)
    h1 = _mix64(u)
    h2 = _mix64(u ^ _GOLDEN) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % np.uint64(m_bits)).astype(np.uint64)


def _int_keys(batch: pa.Table, key: str) -> np.ndarray:
    col = batch.column(key)
    if not pa.types.is_integer(col.type):
        raise TypeError(
            f"bloom prefilter requires an integer key, got {col.type} for {key!r}"
        )
    return col.to_numpy(zero_copy_only=False).astype(np.int64)


def build_bloom(
    build: rd.Dataset, key: str, m_bits: int = 1 << 23, k: int = 4
) -> np.ndarray:
    """Distributed Bloom build: per-block partial bitmaps OR-merged by a
    global Ray aggregate — the driver only ever sees ``m_bits/8`` bytes
    (1 MiB at the default), never the keys."""
    from ray.data.aggregate import AggregateFn

    n_words = m_bits // 64

    def acc(bits: np.ndarray, block: pa.Table) -> np.ndarray:
        if block.num_rows == 0:
            return bits
        pos = _positions(_int_keys(block, key), m_bits, k).ravel()
        out = bits.copy()  # accumulators must not alias across retries
        np.bitwise_or.at(
            out, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )
        return out

    fn = AggregateFn(
        init=lambda _k: np.zeros(n_words, dtype=np.uint64),
        merge=np.bitwise_or,
        accumulate_block=acc,
        name="bloom",
    )
    res = build.aggregate(fn)
    bits = res["bloom"] if isinstance(res, dict) else res
    return np.asarray(bits, dtype=np.uint64)


def bloom_contains(bits: np.ndarray, keys: np.ndarray, k: int = 4) -> np.ndarray:
    """Vectorized membership mask (true = possibly present)."""
    m_bits = bits.size * 64
    pos = _positions(keys, m_bits, k)
    words = bits[(pos >> np.uint64(6)).astype(np.int64)]
    hit = (words >> (pos & np.uint64(63))) & np.uint64(1)
    return hit.all(axis=0)


def bloom_prefilter(
    probe: rd.Dataset, bits_ref, key: str, k: int = 4
) -> rd.Dataset:
    """Drop probe rows that cannot match the build side; ``bits_ref`` is
    the ``ray.put`` handle of a :func:`build_bloom` bitmap (read once per
    task from the object store, zero-copy)."""
    import ray

    def filt(batch: pa.Table) -> pa.Table:
        bits = ray.get(bits_ref)
        mask = bloom_contains(bits, _int_keys(batch, key), k)
        return batch.filter(pa.array(mask))

    return probe.map_batches(filt, batch_format="pyarrow", batch_size=None)


def bloom_semi_join(
    probe: rd.Dataset,
    build: rd.Dataset,
    key: str,
    m_bits: int = 1 << 23,
    k: int = 4,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Exact semi join with a Bloom prefilter in front of the shuffle:
    Bloom pass drops the bulk of non-matching probe rows cheaply, the
    native ``left_semi`` hash join removes the false positives."""
    import ray

    from .joins import shuffle_semi_join, staged_nonempty

    keys_only = build.map_batches(
        lambda t: t.select([key]), batch_format="pyarrow", batch_size=None
    )
    staged = staged_nonempty(keys_only)
    if staged is None:  # empty build side: semi join is empty
        return probe.limit(0)
    bits_ref = ray.put(build_bloom(staged, key, m_bits=m_bits, k=k))
    pre = bloom_prefilter(probe, bits_ref, key, k=k)
    return shuffle_semi_join(pre, staged, on=[key], num_partitions=num_partitions)
