"""Deduplication operators for training-data pipelines.

All variants follow the same scalable shape: vectorized per-batch
signature computation (map_batches, state in ``__init__``), a
hash-partitioned groupby on the signature/bucket key, and a small
verification pass — never an O(n^2) driver loop.

- ``exact_dedup``         — content-hash partition + per-group min-id
- ``minhash_lsh_pairs``   — shingle -> 64-perm MinHash -> banded LSH
                            buckets -> candidate pairs -> signature-
                            estimated Jaccard filter
- ``simhash_pairs``       — 64-bit SimHash, 4x16-bit band blocking,
                            Hamming-distance verify
- ``ngram_jaccard``       — exact n-gram Jaccard for a given pair list
                            (the verification primitive)
- ``embedding_dup_pairs`` — random-hyperplane LSH buckets over an
                            embedding column, exact cosine verify

Scale notes: bucket keys are uniform hashes => the groupbys are
skew-free by construction except for degenerate buckets (e.g. empty
text); those are capped per bucket (``max_bucket``) and the cap is
logged in the result, not silently dropped.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

# --- exact ---------------------------------------------------------------


def exact_dedup(docs: rd.Dataset, column: str = "text", id_column: str = "doc_id") -> rd.Dataset:
    """First (min id) document per distinct ``column`` value.

    hash-partition + per-group first — D2 of SURVEY.md §2.7 generalized.
    """

    def add_hash(batch: pa.Table) -> pa.Table:
        fps = pa.array(
            [
                int.from_bytes(
                    hashlib.blake2b(t.encode(), digest_size=8).digest(), "big"
                ) >> 1
                for t in batch.column(column).to_pylist()
            ],
            pa.int64(),
        )
        return batch.append_column("__fp", fps)

    def keep_first(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group.column(id_column))
        return group.take(idx[:1]).drop_columns("__fp")

    return (
        docs.map_batches(add_hash, batch_format="pyarrow")
        .groupby("__fp")
        .map_groups(keep_first, batch_format="pyarrow")
    )


# --- minhash -------------------------------------------------------------

_MERSENNE = (1 << 61) - 1
_HASHER_CACHE: dict = {}  # per-worker MinHasher reuse for stateless tasks


def _shingles(text: str, k: int = 5) -> np.ndarray:
    """Hashed character k-shingles (lowercased), as 32-bit uints.

    blake2b, NOT Python ``hash()`` — builtin string hashing is salted per
    process and would make signatures differ across Ray workers.
    """
    t = text.lower()
    if len(t) < k:
        grams = {t}
    else:
        grams = {t[i : i + k] for i in range(len(t) - k + 1)}
    out = {
        int.from_bytes(hashlib.blake2b(g.encode(), digest_size=4).digest(), "big")
        for g in grams
    }
    return np.fromiter(out, dtype=np.uint64, count=len(out))


class MinHasher:
    """(doc_id, text) -> (doc_id, sig: list<uint64>[n_perm]); permutations
    are seeded a*x+b mod Mersenne-61 — deterministic across runs.
    Shingle hashes are 32-bit and a < 2^31, so a*x + b < 2^64: the uint64
    vectorized arithmetic never overflows."""

    def __init__(self, n_perm: int = 64, shingle_k: int = 5, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, 1 << 31, size=n_perm, dtype=np.uint64)
        self.b = rng.randint(0, 1 << 31, size=n_perm, dtype=np.uint64)
        self.n_perm = n_perm
        self.k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.k)
        vals = (self.a[None, :] * sh[:, None] + self.b[None, :]) % _MERSENNE
        return vals.min(axis=0).astype(np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t) for t in batch.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "sig": pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64())),
            }
        )


_BAND_MIX = np.uint64(0x9E3779B97F4A7C15)


def _band_rows(batch: pa.Table, n_bands: int, rows_per_band: int) -> pa.Table:
    """Banded bucket rows, fully vectorized: the band key is a
    multiply-xor mix of the band's signature rows (deterministic across
    workers; collisions beyond real signature equality are ~2^-62)."""
    doc_ids = np.asarray(batch.column("doc_id").to_pylist(), dtype=np.int64)
    sigs = np.asarray(batch.column("sig").to_pylist(), dtype=np.uint64)
    n = len(doc_ids)
    sigs = sigs.reshape(n, n_bands, rows_per_band)
    keys = np.full((n, n_bands), np.uint64(1469598103934665603))  # FNV offset
    for r in range(rows_per_band):
        keys = (keys ^ sigs[:, :, r]) * _BAND_MIX
    band_idx = np.broadcast_to(np.arange(n_bands, dtype=np.uint64), (n, n_bands))
    keys = (keys ^ band_idx) * _BAND_MIX
    return pa.table(
        {
            "doc_id": pa.array(np.repeat(doc_ids, n_bands)),
            "band": pa.array(
                np.tile(np.arange(n_bands, dtype=np.int32), n), pa.int32()
            ),
            "band_key": pa.array((keys >> np.uint64(1)).astype(np.int64).reshape(-1)),
        }
    )


def minhash_lsh_pairs(
    docs: rd.Dataset,
    threshold: float = 0.7,
    n_perm: int = 64,
    n_bands: int = 8,
    shingle_k: int = 5,
    max_bucket: int = 200,
) -> pa.Table:
    """Near-duplicate pairs (doc_a < doc_b, est_jaccard >= threshold).

    Pipeline: signatures (actor pool) -> banded bucket rows -> groupby
    bucket -> within-bucket pairs (capped at ``max_bucket`` docs; cap
    events surface in the ``truncated`` column) -> signature-estimate
    verify.  Returns a small driver-side table of pairs.
    """
    rows_per_band = n_perm // n_bands

    def sig_batch(batch: pa.Table, n_perm=n_perm, shingle_k=shingle_k) -> pa.Table:
        # stateless task + worker-global hasher cache: elastic scheduling
        # with the setup still amortized (cf. stages.candidates)
        key = (n_perm, shingle_k)
        hasher = _HASHER_CACHE.get(key)
        if hasher is None:
            hasher = _HASHER_CACHE[key] = MinHasher(n_perm=n_perm, shingle_k=shingle_k)
        return hasher(batch)

    sigs = docs.map_batches(
        sig_batch, batch_format="pyarrow"
    ).materialize()  # reused twice (buckets + verify); signatures are small

    buckets = sigs.map_batches(
        lambda t: _band_rows(t, n_bands, rows_per_band), batch_format="pyarrow"
    ).materialize()
    buckets = _collision_buckets_only(buckets)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(group.column("doc_id").to_pylist())
        truncated = len(ids) > max_bucket
        ids = ids[:max_bucket]
        a_col, b_col = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_col.append(ids[i])
                b_col.append(ids[j])
        return pa.table(
            {
                "doc_a": pa.array(a_col, pa.int64()),
                "doc_b": pa.array(b_col, pa.int64()),
                "truncated": pa.array([truncated] * len(a_col), pa.bool_()),
            }
        )

    cand = (
        buckets.groupby(["band", "band_key"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .take_all()
    )
    pairs = sorted({(r["doc_a"], r["doc_b"]) for r in cand})
    any_trunc = any(r["truncated"] for r in cand)

    # verify with signature-estimated Jaccard (exact verify: ngram_jaccard)
    need = {d for p in pairs for d in p}
    sig_map = {
        r["doc_id"]: np.asarray(r["sig"], dtype=np.uint64)
        for r in sigs.take_all()
        if r["doc_id"] in need
    }
    out_a, out_b, est = [], [], []
    for a, b in pairs:
        j = float(np.mean(sig_map[a] == sig_map[b]))
        if j >= threshold:
            out_a.append(a)
            out_b.append(b)
            est.append(j)
    return pa.table(
        {
            "doc_a": pa.array(out_a, pa.int64()),
            "doc_b": pa.array(out_b, pa.int64()),
            "est_jaccard": pa.array(est, pa.float64()),
            "bucket_truncated": pa.array([any_trunc] * len(out_a), pa.bool_()),
        }
    )


def _collision_buckets_only(buckets: rd.Dataset) -> rd.Dataset:
    """Keep only (band, band_key) buckets holding >=2 docs.

    Almost every bucket is a singleton; running map_groups over all of
    them costs one Python call per DOC x BAND (measured: the dominant
    cost).  A vectorized count-aggregate first, then a broadcast filter,
    leaves map_groups only the actual collision buckets.
    """
    from ray.data.aggregate import Count

    counts = buckets.groupby(["band", "band_key"]).aggregate(Count(alias_name="n"))
    hot = {
        (r["band"], r["band_key"])
        for r in counts.take_all()
        if r["n"] >= 2
    }
    hot_ref = ray.put(hot)

    def keep_hot(batch: pa.Table) -> pa.Table:
        hs = ray.get(hot_ref)
        bands = batch.column("band").to_pylist()
        keys = batch.column("band_key").to_pylist()
        mask = pa.array([(b, k) in hs for b, k in zip(bands, keys)], pa.bool_())
        return batch.filter(mask)

    return buckets.map_batches(keep_hot, batch_format="pyarrow")


# --- simhash -------------------------------------------------------------


class SimHasher:
    """64-bit SimHash over hashed word tokens."""

    def __init__(self) -> None:
        import re

        self.word = re.compile(r"\w+", re.U)

    def simhash(self, text: str) -> int:
        acc = np.zeros(64, dtype=np.int64)
        for w in self.word.findall(text.lower()):
            h = int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
            bits = np.unpackbits(np.frombuffer(h.to_bytes(8, "big"), dtype=np.uint8))
            acc += bits.astype(np.int64) * 2 - 1
        out = 0
        for i, v in enumerate(acc):
            if v > 0:
                out |= 1 << (63 - i)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs = [self.simhash(t) for t in batch.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "simhash": pa.array([h - (1 << 63) for h in hs], pa.int64()),  # shift to int64
            }
        )


def simhash_pairs(docs: rd.Dataset, max_hamming: int = 6) -> pa.Table:
    """Near-dup pairs by SimHash: 4x16-bit band blocking guarantees any
    pair within Hamming distance 3 shares a band; wider distances are
    best-effort (documented LSH recall trade-off)."""
    sigs = docs.map_batches(SimHasher, batch_format="pyarrow", concurrency=(1, 8)).materialize()

    def band_rows(batch: pa.Table) -> pa.Table:
        ids, bands, keys = [], [], []
        for doc_id, h in zip(
            batch.column("doc_id").to_pylist(), batch.column("simhash").to_pylist()
        ):
            u = (h + (1 << 63)) & 0xFFFFFFFFFFFFFFFF
            for b in range(4):
                ids.append(doc_id)
                bands.append(b)
                keys.append((u >> (16 * b)) & 0xFFFF)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "band": pa.array(bands, pa.int32()),
                "band_key": pa.array(keys, pa.int64()),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(group.column("doc_id").to_pylist())[:200]
        a_col = [ids[i] for i in range(len(ids)) for _ in range(i + 1, len(ids))]
        b_col = [ids[j] for i in range(len(ids)) for j in range(i + 1, len(ids))]
        return pa.table(
            {"doc_a": pa.array(a_col, pa.int64()), "doc_b": pa.array(b_col, pa.int64())}
        )

    cand = (
        _collision_buckets_only(
            sigs.map_batches(band_rows, batch_format="pyarrow").materialize()
        )
        .groupby(["band", "band_key"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .take_all()
    )
    pairs = sorted({(r["doc_a"], r["doc_b"]) for r in cand})
    sig_map = {r["doc_id"]: r["simhash"] for r in sigs.take_all()}
    out_a, out_b, dist = [], [], []
    for a, b in pairs:
        d = bin((sig_map[a] ^ sig_map[b]) & 0xFFFFFFFFFFFFFFFF).count("1")
        if d <= max_hamming:
            out_a.append(a)
            out_b.append(b)
            dist.append(d)
    return pa.table(
        {
            "doc_a": pa.array(out_a, pa.int64()),
            "doc_b": pa.array(out_b, pa.int64()),
            "hamming": pa.array(dist, pa.int64()),
        }
    )


# --- exact n-gram Jaccard (verification primitive) -----------------------


def ngram_jaccard(texts_a: list[str], texts_b: list[str], k: int = 5) -> list[float]:
    out = []
    for ta, tb in zip(texts_a, texts_b):
        sa, sb = set(), set()
        ta, tb = ta.lower(), tb.lower()
        for i in range(max(0, len(ta) - k + 1)):
            sa.add(ta[i : i + k])
        for i in range(max(0, len(tb) - k + 1)):
            sb.add(tb[i : i + k])
        out.append(len(sa & sb) / max(1, len(sa | sb)))
    return out


# --- embedding near-dup --------------------------------------------------


def embedding_dup_pairs(
    embeddings: rd.Dataset,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 11,
    id_column: str = "vec_id",
) -> pa.Table:
    """Cosine near-duplicate pairs via random-hyperplane LSH buckets +
    exact verify.  The brute-force all-pairs baseline lives in
    stages.similarity; this is the scale path (bucket then verify)."""
    first = embeddings.take(1)[0]
    dim = len(first["embedding"])
    rng = np.random.RandomState(seed)
    planes = rng.randn(dim, n_planes).astype(np.float32)
    planes_ref = ray.put(planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        vecs = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float32)
        bits = (vecs @ pl) > 0
        keys = bits.dot(1 << np.arange(n_planes)).astype(np.int64)
        return pa.table(
            {
                "vec_id": batch.column(id_column),
                "bucket": pa.array(keys, pa.int64()),
                "embedding": batch.column("embedding"),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group.column("vec_id").to_pylist()
        vecs = np.asarray(group.column("embedding").to_pylist(), dtype=np.float32)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1
        sims = (vecs / norms) @ (vecs / norms).T
        a_col, b_col, s_col = [], [], []
        order = np.argsort(ids)
        for i_pos in range(len(order)):
            for j_pos in range(i_pos + 1, len(order)):
                i, j = order[i_pos], order[j_pos]
                if sims[i, j] >= threshold:
                    a_col.append(ids[i])
                    b_col.append(ids[j])
                    s_col.append(float(sims[i, j]))
        return pa.table(
            {
                "vec_a": pa.array(a_col, pa.int64()),
                "vec_b": pa.array(b_col, pa.int64()),
                "cosine": pa.array(s_col, pa.float64()),
            }
        )

    pairs = (
        embeddings.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .take_all()
    )
    uniq = {}
    for r in pairs:
        uniq[(r["vec_a"], r["vec_b"])] = r["cosine"]
    keys = sorted(uniq)
    return pa.table(
        {
            "vec_a": pa.array([k[0] for k in keys], pa.int64()),
            "vec_b": pa.array([k[1] for k in keys], pa.int64()),
            "cosine": pa.array([uniq[k] for k in keys], pa.float64()),
        }
    )
