"""KMV (k-minimum-values / bottom-k) distinct-count sketch — Bar-Yossef
et al. 2002; Beyer et al. 2007 ("On synopses for distinct-value
estimation").  Keep the k smallest distinct 64-bit hashes of a column;
the unbiased estimator is ``(k-1) * 2^64 / h_(k)`` where ``h_(k)`` is
the k-th smallest hash.  Complements the repo's HLL
(``stages/aggregates.py``): KMV additionally supports set
INTERSECTION/Jaccard estimates (the bottom-k union is a uniform sample
of the union), and — with the md5 kernel — is EXACTLY SQL-replayable,
so the whole sketch sits under a DuckDB hash gate rather than a
rows-only check.

Scale shape: each block contributes at most k rows (block-local
np.unique -> md5 -> bottom-k partial), the k-per-block stream is
deduped by hash value and bottom-k'd once — constant output per block,
one tiny exchange, no whole-column shuffle.  Mergeability is the
textbook property: bottom-k(union of bottom-k partials) ==
bottom-k(all distinct hashes).

Hash kernel: ``LE64(md5(str(v))[0:8])`` == DuckDB
``md5_number_upper(v::VARCHAR)`` — the same twin convention as
``Md5MinHasher`` (stages/dedup.py:362).  The estimate is computed in
EXACT integer arithmetic (``(k-1) << 64 // h_k``) so there is no float
knife edge, and the output carries an in-query certificate: the
squared relative error cross-multiplied against the 3-sigma KMV bound
``(est-exact)^2 * (k-2) <= 9 * exact^2`` (sigma ~ 1/sqrt(k-2)), all
integers.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd


def _md5_u64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


_SIGN = np.uint64(1 << 63)


def _off(h: np.ndarray) -> np.ndarray:
    """uint64 -> offset-binary int64 (order-preserving).  Ray's groupby
    re-emits uint64 keys above 2^63 as Python ints and the Arrow
    conversion overflows into a pickled-object column — hashes must
    ride shuffles as int64."""
    return (h ^ _SIGN).view(np.int64)


def _unoff(h: np.ndarray) -> np.ndarray:
    return h.view(np.uint64) ^ _SIGN


def kmv_bottom_hashes(ds: rd.Dataset, column: str, k: int = 64) -> rd.Dataset:
    """The k smallest distinct md5 hashes of ``column`` as a one-column
    (h) Dataset in offset-binary int64 (``_unoff`` recovers the uint64
    value; int64 ascending == uint64 ascending)."""

    def partial(t: pa.Table) -> pa.Table:
        vals = t.column(column).to_numpy(zero_copy_only=False)
        uniq = np.unique(vals)
        hs = np.fromiter(
            (
                _md5_u64(v if isinstance(v, str) else str(int(v)))
                for v in uniq
            ),
            dtype=np.uint64,
            count=len(uniq),
        )
        hs = np.sort(hs)[:k]
        return pa.table({"h": pa.array(_off(hs), pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    # dedup hashes seen in several blocks (same value, same hash), then
    # keep the global bottom-k — both over a <= k-rows-per-block stream
    return (
        partials.groupby("h")
        .count()
        .select_columns(["h"])
        .sort("h")
        .limit(k)
    )


def kmv_distinct_estimate(
    ds: rd.Dataset, column: str, k: int = 64
) -> rd.Dataset:
    """One-row (k, kth_hash, est_distinct, exact_distinct, within_3sigma)
    KMV estimate of ``count(distinct column)`` with the exact count and
    the integer-arithmetic 3-sigma certificate alongside."""
    staged = ds.materialize()
    exact = staged.groupby(column).count().count()
    bottom = kmv_bottom_hashes(staged, column, k=k).repartition(1)

    def finish(t: pa.Table) -> pa.Table:
        hs = np.sort(
            _unoff(t.column("h").to_numpy(zero_copy_only=False))
        )
        kk = len(hs)
        hk = int(hs[-1]) if kk else 0
        est = ((kk - 1) << 64) // hk if hk else 0
        ok = (est - exact) ** 2 * (kk - 2) <= 9 * exact * exact if kk > 2 else False
        return pa.table(
            {
                "k": pa.array([kk], pa.int64()),
                "kth_hash": pa.array([hk], pa.uint64()),
                "est_distinct": pa.array([est], pa.int64()),
                "exact_distinct": pa.array([exact], pa.int64()),
                "within_3sigma": pa.array([ok], pa.bool_()),
            }
        )

    return bottom.map_batches(finish, batch_format="pyarrow", batch_size=None)


def kmv_jaccard_estimate(
    a: rd.Dataset, b: rd.Dataset, column: str, k: int = 64
) -> rd.Dataset:
    """One-row bottom-k Jaccard estimate between two columns' value
    sets: the k smallest hashes of the UNION are a uniform sample of
    it; the fraction also present in both sets estimates J(A, B)
    (Beyer et al. 2007 §5).  Reported as an exact integer pair
    (matches, k_used) plus the exact Jaccard counts for the
    certificate — no float in the output."""
    ha = kmv_bottom_hashes(a, column, k=k)
    hb = kmv_bottom_hashes(b, column, k=k)

    def tag(which: int):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "h": t.column("h"),
                    "src": pa.array([which] * t.num_rows, pa.int64()),
                }
            )

        return f

    both = ha.map_batches(tag(0), batch_format="pyarrow").union(
        hb.map_batches(tag(1), batch_format="pyarrow")
    ).repartition(1)

    def finish(t: pa.Table) -> pa.Table:
        h = t.column("h").to_numpy(zero_copy_only=False)
        s = t.column("src").to_numpy(zero_copy_only=False)
        in_a = set(h[s == 0].tolist())
        in_b = set(h[s == 1].tolist())
        union_bottom = sorted(in_a | in_b)[:k]
        matches = sum(1 for x in union_bottom if x in in_a and x in in_b)
        return pa.table(
            {
                "k_used": pa.array([len(union_bottom)], pa.int64()),
                "matches": pa.array([matches], pa.int64()),
            }
        )

    return both.map_batches(finish, batch_format="pyarrow", batch_size=None)
