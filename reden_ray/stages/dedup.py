"""Deduplication operators for training-data pipelines.

All variants follow the same scalable shape: vectorized per-batch
signature computation (map_batches, state in ``__init__``), a
hash-partitioned groupby on the signature/bucket key, and an
IN-BUCKET verification pass — never an O(n^2) driver loop and never
a corpus-sized ``take_all()``.  Signatures ride along into the band
rows (a few hundred bytes per doc), so candidate pairs are verified
inside the bucket ``map_groups`` where both signatures are already
co-located; the pair tables that leave each bucket hold only
verified pairs.  Every pair finder returns a **streaming Dataset**
(doc_a < doc_b), distinct across bands via a distributed groupby —
the driver never holds a corpus-sized structure.

- ``exact_dedup``         — content-hash partition + per-group min-id
- ``minhash_lsh_pairs``   — shingle -> 64-perm MinHash -> banded LSH
                            buckets -> in-bucket signature-estimated
                            Jaccard verify -> distinct pairs Dataset
- ``simhash_pairs``       — 64-bit SimHash, 4x16-bit band blocking,
                            in-bucket Hamming verify -> pairs Dataset
- ``ngram_jaccard``       — exact n-gram Jaccard for a given pair list
                            (the verification primitive)
- ``ngram_jaccard_pairs`` — EXACT corpus-wide word-n-gram Jaccard via
                            an inverted-index join (gram groupby ->
                            candidate pairs -> shared-count groupby);
                            DuckDB-oracled, ``max_df`` scale cap
- ``embedding_dup_pairs`` — random-hyperplane LSH buckets over an
                            embedding column, in-bucket exact cosine
                            verify -> pairs Dataset

Scale notes: bucket keys are uniform hashes => the groupbys are
skew-free by construction except for degenerate buckets (e.g. empty
text, zero vectors); ALL bucket processors cap group size
(``max_bucket``) and surface the cap in a ``truncated`` column, never
silently.  Bucket sweeps use ONE coarse-partition shuffle with
vectorized segment detection (``partitioned_bucket_pairs``); the
count+join prefilter (``collision_buckets_only``) remains as the
alternative shape.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# --- exact ---------------------------------------------------------------


def exact_dedup(docs: rd.Dataset, column: str = "text", id_column: str = "doc_id") -> rd.Dataset:
    """First (min id) document per distinct ``column`` value.

    D2 of SURVEY.md §2.7 generalized, two-level vectorized: each block
    keeps its local min-id row per content hash (one lexsort, no
    per-group calls), then a coarse hash-partition groupby repeats the
    same segment sweep once per PARTITION — 10^10 docs cost
    num_partitions Python calls, not one per distinct document.  Min-id
    is associative, so local-then-global first is exact.
    """
    from .joins import default_join_partitions

    n_parts = default_join_partitions()

    def _first_per_fp(t: pa.Table) -> pa.Table:
        fp = t.column("__fp").to_numpy(zero_copy_only=False)
        ids = t.column(id_column).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, fp))
        fp_s = fp[order]
        new = np.empty(len(fp_s), dtype=bool)
        if len(fp_s):
            new[0] = True
            new[1:] = fp_s[1:] != fp_s[:-1]
        return t.take(pa.array(order[new]))

    def local_first(batch: pa.Table) -> pa.Table:
        fps = pa.array(
            [
                int.from_bytes(
                    hashlib.blake2b(t.encode(), digest_size=8).digest(), "big"
                ) >> 1
                for t in batch.column(column).to_pylist()
            ],
            pa.int64(),
        )
        batch = batch.append_column("__fp", fps)
        batch = _first_per_fp(batch)
        part = (
            batch.column("__fp").to_numpy(zero_copy_only=False).view(np.uint64)
            % np.uint64(n_parts)
        ).astype(np.int64)
        return batch.append_column("__part", pa.array(part, pa.int64()))

    def part_first(g: pa.Table) -> pa.Table:
        return _first_per_fp(g).drop_columns(["__fp", "__part"])

    return (
        docs.map_batches(local_first, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(part_first, batch_format="pyarrow")
    )


# --- shared LSH plumbing -------------------------------------------------


def _empty_pairs(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()


def distinct_pairs(
    pairs: rd.Dataset, a: str = "doc_a", b: str = "doc_b", num_partitions: int | None = None
) -> rd.Dataset:
    """One row per (a, b) pair — a pair found in several LSH bands keeps
    one row, with ``truncated`` OR-ed across bands (a cap in ANY
    contributing bucket marks the pair; the score columns are identical
    across bands — both sigs are, so ``min`` is a no-op tiebreak).

    Vectorized: pairs hash into coarse partitions, each partition
    dedupes with ONE Arrow ``group_by`` call — one Python call per
    partition instead of one per pair (a corpus with 10^8 near-dup
    pairs would otherwise pay 10^8 map_groups invocations)."""
    from .joins import default_join_partitions
    from .partition import part_column

    n_parts = num_partitions or default_join_partitions()

    def add_part(t: pa.Table) -> pa.Table:
        # shared helper: process-stable for int AND string pair ids
        return t.append_column("__part", part_column(t, [a, b], n_parts))

    def dedupe(group: pa.Table) -> pa.Table:
        cols = [c for c in group.column_names if c != "__part"]
        aggs = [
            (c, "any" if c == "truncated" else "min") for c in cols if c not in (a, b)
        ]
        out = group.group_by([a, b]).aggregate(aggs)
        # arrow names aggregates "<col>_<agg>" and puts keys first;
        # restore the original names and column order
        out = out.rename_columns(
            [a, b] + [c for c in cols if c not in (a, b)]
        )
        return out.select(cols)

    return (
        pairs.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(dedupe, batch_format="pyarrow")
    )


def collision_buckets_only(
    buckets: rd.Dataset,
    on: tuple[str, str] = ("band", "band_key"),
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Keep only buckets holding >=2 docs — fully distributed.

    Almost every bucket is a singleton; running map_groups over all of
    them costs one Python call per DOC x BAND (measured: the dominant
    cost).  A vectorized count-aggregate over the PROJECTED key columns
    (signatures don't ride through this shuffle), then an inner join of
    the band rows against the ``n >= 2`` keys — no driver-side key set.
    """
    from ray.data.aggregate import Sum

    cols = list(on)

    def partial_counts(t: pa.Table) -> pa.Table:
        # per-block Arrow pre-aggregation before the shuffle (the
        # partial-combiner pattern; measured 2.2x over a direct
        # groupby-count — the sort shuffle pays per input row)
        agg = t.select(cols).group_by(cols).aggregate([(cols[0], "count")])
        return agg.rename_columns(cols + ["__pn"])

    counts = (
        buckets.map_batches(partial_counts, batch_format="pyarrow")
        .groupby(cols)
        .aggregate(Sum("__pn", alias_name="__n"))
    )
    # staged_nonempty compacts away empty blocks (the hash-join schema
    # broadcast rides ONLY on an input's first block — see joins.py)
    # and makes the zero-collision empty check metadata-only.
    from .joins import default_join_partitions, staged_nonempty

    hot = staged_nonempty(
        counts.map_batches(
            lambda t: t.filter(pc.greater_equal(t["__n"], 2)).drop_columns("__n"),
            batch_format="pyarrow",
        )
    )
    if hot is None:
        return buckets.limit(0)
    return buckets.join(
        hot,
        join_type="inner",
        num_partitions=num_partitions or default_join_partitions(),
        on=on,
    )


def partitioned_bucket_pairs(
    buckets: rd.Dataset,
    bucket_fn,
    empty_schema: pa.Schema,
    on: tuple[str, ...] = ("band", "band_key"),
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Run ``bucket_fn`` over every >=2-doc bucket with ONE shuffle.

    The band rows are hashed into ``num_partitions`` COARSE partitions
    (band_key is already a uniform hash, so a modulus suffices); each
    partition is then processed as a single vectorized call: lexsort by
    (band, band_key), find bucket segments with numpy boundary math, and
    invoke ``bucket_fn`` only on collision segments (singletons — the
    overwhelming majority — cost one vectorized comparison, zero Python
    calls).  Replaces the count-aggregate + hash-join prefilter
    (``collision_buckets_only``, kept as the alternative): same output,
    one exchange instead of three, no join-actor spawn (measured ~2.5x
    end-to-end on the 5k-doc bench corpus).  Skew note: a degenerate
    bucket still lands in one partition, but ``bucket_fn`` caps work at
    ``max_bucket`` docs, so partition cost is bounded."""
    from .joins import default_join_partitions
    from .partition import part_column

    n_parts = num_partitions or default_join_partitions()
    cols = list(on)

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, cols, n_parts))

    def process(group: pa.Table) -> pa.Table:
        keys = [group.column(c).to_numpy(zero_copy_only=False) for c in cols]
        order = np.lexsort(tuple(reversed(keys)))
        t = group.take(pa.array(order))
        keys = [k[order] for k in keys]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = False
        for k in keys:
            new[1:] |= k[1:] != k[:-1]
        starts = np.flatnonzero(new)
        ends = np.concatenate([starts[1:], [len(order)]])
        outs = [
            bucket_fn(t.slice(s, e - s))
            for s, e in zip(starts, ends)
            if e - s >= 2
        ]
        outs = [o for o in outs if o.num_rows]
        if not outs:
            return _empty_pairs(empty_schema)
        return pa.concat_tables(outs)

    return (
        buckets.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(process, batch_format="pyarrow")
    )


# --- minhash -------------------------------------------------------------

_HASHER_CACHE: dict = {}  # per-worker MinHasher reuse for stateless tasks


_FNV_OFFSET = np.uint64(1469598103934665603)
_FNV_PRIME = np.uint64(1099511628211)


def _fmix64(h: np.ndarray) -> np.ndarray:
    """murmur3 64-bit finalizer — full avalanche, vectorized, a
    BIJECTION on uint64 (so it never loses set cardinality)."""
    h = h.copy()
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xC4CEB9FE1A85EC53)
    h ^= h >> np.uint64(33)
    return h


def _shingles(text: str, k: int = 5) -> np.ndarray:
    """Hashed character k-shingles (lowercased), as 64-bit uints.

    Fully vectorized: codepoints -> sliding windows -> FNV-1a fold
    across the k columns (k vector ops per document instead of one
    Python hash call per shingle — measured ~20x) -> fmix64 avalanche.
    numpy uint64 arithmetic wraps mod 2^64 identically on every
    platform and is NOT process-salted (Python ``hash()`` is — never
    use it distributed).  Returns full 64-bit values (as "shingles",
    collisions ~2^-64).
    """
    t = text.lower()
    cps = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    if len(cps) == 0:
        cps = np.zeros(1, dtype=np.uint64)
    if len(cps) < k:
        win = cps[None, :]
        width = len(cps)
    else:
        win = np.lib.stride_tricks.sliding_window_view(cps, k)
        width = k
    h = np.full(win.shape[0], _FNV_OFFSET, dtype=np.uint64)
    for i in range(width):
        h = (h ^ win[:, i]) * _FNV_PRIME
    return np.unique(_fmix64(h))


class MinHasher:
    """(doc_id, text) -> (doc_id, sig: binary[n_perm*8]); each
    "permutation" is ``min over shingles of fmix64(x XOR seed_i)`` — a
    seeded 64-bit BIJECTION, deterministic across runs and workers.

    NOT the textbook ``a*x + b mod p`` family: with 32-bit shingle
    hashes and a < 2^31 the product never wraps mod 2^61-1, so the map
    is monotone in x and the SMALLEST shingles win nearly every
    permutation — correlated minima that inflate est_jaccard on
    templated corpora (measured est 0.56 for a pair with true Jaccard
    0.23; the xor-mix family estimates 0.20-0.27, within binomial
    noise).  The signature is packed as little-endian uint64 bytes so
    it can ride through band rows, joins and shuffles as a plain
    binary column (Arrow joins reject list payloads; binary is
    join-safe)."""

    def __init__(self, n_perm: int = 64, shingle_k: int = 5, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.seeds = rng.randint(0, 1 << 62, size=n_perm).astype(np.uint64)
        self.n_perm = n_perm
        self.k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.k)
        vals = _fmix64(sh[:, None] ^ self.seeds[None, :])
        return vals.min(axis=0)

    def signatures(self, texts: list[str]) -> np.ndarray:
        """(n_docs, n_perm) signature matrix for a batch.

        Deliberately a per-doc loop: one document's (shingles x
        n_perm) permutation matrix fits L2, while concatenating a
        batch into one big matrix + ``minimum.reduceat`` is
        memory-bandwidth-bound (measured 0.54s vs 0.71-8s per 5k docs
        depending on chunk size).  The vectorization that matters is
        inside ``_shingles``."""
        if not texts:
            return np.empty((0, self.n_perm), dtype=np.uint64)
        return np.stack([self.signature(t) for t in texts])

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = self.signatures(batch.column("text").to_pylist())
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "sig": pa.array([s.tobytes() for s in sigs], pa.binary()),
            }
        )


class Md5MinHasher(MinHasher):
    """SQL-replayable MinHash kernel: shingles are the DISTINCT
    lowercased character k-gram STRINGS (not integer hashes), and
    permutation ``i`` is ``min over shingles s of
    LE64(md5(f"{i}\\x01{s}")[0:8])`` — exactly DuckDB's
    ``md5_number_upper(i::VARCHAR || chr(1) || s)``.  Slots into the
    SAME band/bucket/distinct machinery as :class:`MinHasher` (same
    packed-binary signature contract), so a DuckDB oracle can hash-gate
    the full LSH pipeline end to end.  The blake2b/fmix production
    kernel stays the default — this kernel pays one hashlib call per
    (shingle, perm) and exists for verification, not throughput."""

    def __init__(self, n_perm: int = 16, shingle_k: int = 5, seed: int = 0):
        self.n_perm = n_perm
        self.k = shingle_k
        # md5 prefixes are fixed per permutation — precompute them
        self._prefixes = [f"{i}\x01".encode() for i in range(n_perm)]

    def signature(self, text: str) -> np.ndarray:
        t = text.lower()
        if len(t) < self.k:
            # mirror _shingles: a short text is ONE window (maybe empty)
            grams = [t.encode()]
        else:
            grams = [g.encode() for g in {t[j : j + self.k] for j in range(len(t) - self.k + 1)}]
        md5 = hashlib.md5
        sig = np.empty(self.n_perm, dtype=np.uint64)
        for i, pre in enumerate(self._prefixes):
            sig[i] = min(
                int.from_bytes(md5(pre + g).digest()[:8], "little") for g in grams
            )
        return sig


_MINHASH_KERNELS = {"fmix": MinHasher, "md5": Md5MinHasher}


_BAND_MIX = np.uint64(0x9E3779B97F4A7C15)


def _unpack_sigs(sig_col: pa.ChunkedArray | pa.Array, n_perm: int) -> np.ndarray:
    """binary sig column -> (n, n_perm) uint64 matrix, zero-copy-ish."""
    blobs = sig_col.to_pylist()
    if not blobs:
        return np.empty((0, n_perm), dtype=np.uint64)
    return np.frombuffer(b"".join(blobs), dtype=np.uint64).reshape(len(blobs), n_perm)


def _band_rows(batch: pa.Table, n_bands: int, rows_per_band: int) -> pa.Table:
    """Banded bucket rows, fully vectorized: the band key is a
    multiply-xor mix of the band's signature rows (deterministic across
    workers; collisions beyond real signature equality are ~2^-62).
    Each row carries the doc's full signature so the bucket stage can
    verify candidate pairs in place (no second pass over the corpus)."""
    n_perm = n_bands * rows_per_band
    doc_ids = np.asarray(batch.column("doc_id").to_pylist(), dtype=np.int64)
    sig_blobs = batch.column("sig").to_pylist()
    sigs = _unpack_sigs(batch.column("sig"), n_perm)
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
                np.tile(np.arange(n_bands, dtype=np.int64), n), pa.int64()
            ),
            "band_key": pa.array((keys >> np.uint64(1)).astype(np.int64).reshape(-1)),
            "sig": pa.array(
                [b for b in sig_blobs for _ in range(n_bands)], pa.binary()
            ),
        }
    )


_MINHASH_PAIR_SCHEMA = pa.schema(
    [
        ("doc_a", pa.int64()),
        ("doc_b", pa.int64()),
        ("est_jaccard", pa.float64()),
        ("truncated", pa.bool_()),
    ]
)


def minhash_lsh_pairs(
    docs: rd.Dataset,
    threshold: float = 0.7,
    n_perm: int = 64,
    n_bands: int = 8,
    shingle_k: int = 5,
    max_bucket: int = 200,
    checkpoint_dir: str | None = None,
    kernel: str = "fmix",
) -> rd.Dataset:
    """Near-duplicate pairs (doc_a < doc_b, est_jaccard >= threshold),
    as a streaming Dataset.

    Pipeline: signatures (stateless tasks + worker-global hasher cache)
    -> banded bucket rows carrying the signature -> ONE coarse-partition
    shuffle + vectorized in-partition segment sweep
    (``partitioned_bucket_pairs``; singleton buckets cost zero Python
    calls) -> within-bucket VERIFIED pairs (capped at ``max_bucket``
    docs; cap events surface in ``truncated``) -> distributed distinct
    across bands.  The whole pipeline STREAMS — no materialize, nothing
    corpus-sized ever reaches the driver; write the result with
    ``write_parquet`` or feed it to an anti-join.

    ``checkpoint_dir``: optionally stage the band rows as partitioned
    parquet (durability / resume; same contract as
    ``curation.curate_documents``).
    """
    rows_per_band = n_perm // n_bands
    hasher_cls = _MINHASH_KERNELS[kernel]

    def sig_batch(
        batch: pa.Table, n_perm=n_perm, shingle_k=shingle_k, kernel=kernel
    ) -> pa.Table:
        key = (kernel, n_perm, shingle_k)
        hasher = _HASHER_CACHE.get(key)
        if hasher is None:
            hasher = _HASHER_CACHE[key] = hasher_cls(
                n_perm=n_perm, shingle_k=shingle_k
            )
        return hasher(batch)

    buckets = docs.map_batches(sig_batch, batch_format="pyarrow").map_batches(
        lambda t: _band_rows(t, n_bands, rows_per_band), batch_format="pyarrow"
    )
    if checkpoint_dir is not None:
        # optional durability point for beyond-object-store corpora /
        # resumable runs (band rows are the expensive artifact)
        buckets.write_parquet(checkpoint_dir)
        buckets = rd.read_parquet(checkpoint_dir)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n < 2:
            return _empty_pairs(_MINHASH_PAIR_SCHEMA)
        order = pc.sort_indices(group.column("doc_id"))
        group = group.take(order)
        truncated = n > max_bucket
        group = group.slice(0, max_bucket)
        ids = np.asarray(group.column("doc_id").to_pylist(), dtype=np.int64)
        sigs = _unpack_sigs(group.column("sig"), n_perm)
        # pairwise estimated Jaccard = fraction of equal signature rows,
        # vectorized over the (<= max_bucket)^2 bucket
        eq = (sigs[:, None, :] == sigs[None, :, :]).mean(axis=2)
        ia, ib = np.triu_indices(len(ids), k=1)
        est = eq[ia, ib]
        keep = est >= threshold
        ia, ib, est = ia[keep], ib[keep], est[keep]
        return pa.table(
            {
                "doc_a": pa.array(ids[ia]),
                "doc_b": pa.array(ids[ib]),
                "est_jaccard": pa.array(est.astype(np.float64)),
                "truncated": pa.array(np.full(len(ia), truncated), pa.bool_()),
            }
        )

    pairs = partitioned_bucket_pairs(buckets, bucket_pairs, _MINHASH_PAIR_SCHEMA)
    return distinct_pairs(pairs)


# --- simhash -------------------------------------------------------------


class SimHasher:
    """64-bit SimHash over hashed word tokens.

    Per-actor word-hash cache: natural text is Zipf-distributed, so the
    blake2b + bit-unpack for a word runs once per actor lifetime, not
    once per occurrence; repeated words accumulate via a count vector
    matmul.  Outputs are BIT-IDENTICAL to the uncached per-occurrence
    loop (sum of ±1 contributions is order-free).  Cached vectors are
    packed int8 (64 B each — 1M entries == 64 MiB/actor); the matmul
    promotes int64 @ int8 -> int64, so no overflow."""

    _CACHE_CAP = 1 << 20  # 64 B/entry packed int8 -> 64 MiB/actor cap

    def __init__(self) -> None:
        import re

        self.word = re.compile(r"\w+", re.U)
        self._bits: dict[str, np.ndarray] = {}

    def _word_bits(self, w: str) -> np.ndarray:
        bits = self._bits.get(w)
        if bits is None:
            h = hashlib.blake2b(w.encode(), digest_size=8).digest()
            bits = (
                np.unpackbits(np.frombuffer(h, dtype=np.uint8)).astype(np.int8) * 2 - 1
            ).astype(np.int8)
            if len(self._bits) < self._CACHE_CAP:
                self._bits[w] = bits
        return bits

    def simhash(self, text: str) -> int:
        from collections import Counter

        counts = Counter(self.word.findall(text.lower()))
        if not counts:
            return 0
        mat = np.stack([self._word_bits(w) for w in counts])  # (n_uniq, 64) int8
        acc = np.asarray(list(counts.values()), dtype=np.int64) @ mat
        out = 0
        for i in np.nonzero(acc > 0)[0]:
            out |= 1 << (63 - int(i))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs = [self.simhash(t) for t in batch.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "simhash": pa.array([h - (1 << 63) for h in hs], pa.int64()),  # shift to int64
            }
        )


class Md5SimHasher(SimHasher):
    """SQL-replayable SimHash kernel: token hash is
    ``u = LE64(md5(word)[0:8])`` (DuckDB ``md5_number_upper(word)``)
    and output bit ``j`` of the fingerprint is set iff the count-weighted
    vote ``sum(cnt * (2*((u >> j) & 1) - 1)) > 0``.  Tokens come from the
    explicit ASCII class ``[0-9a-z_]+`` (RE2/DuckDB ``\\w`` is ASCII-only
    while Python's is Unicode — the twin pins the portable class).  The
    band/bucket/Hamming machinery downstream is identical, so a DuckDB
    oracle gates the full SimHash LSH pipeline; blake2b stays the
    production default."""

    def __init__(self) -> None:
        import re

        self.word = re.compile(r"[0-9a-z_]+")
        self._bits: dict[str, np.ndarray] = {}

    def _word_bits(self, w: str) -> np.ndarray:
        bits = self._bits.get(w)
        if bits is None:
            u = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little")
            # big-endian unpack: index i <-> bit (63 - i), matching
            # SimHasher.simhash's ``out |= 1 << (63 - i)`` convention
            bits = (
                np.unpackbits(np.frombuffer(u.to_bytes(8, "big"), dtype=np.uint8))
                .astype(np.int8)
                * 2
                - 1
            ).astype(np.int8)
            if len(self._bits) < self._CACHE_CAP:
                self._bits[w] = bits
        return bits


_SIMHASH_PAIR_SCHEMA = pa.schema(
    [
        ("doc_a", pa.int64()),
        ("doc_b", pa.int64()),
        ("hamming", pa.int64()),
        ("truncated", pa.bool_()),
    ]
)


def simhash_pairs(
    docs: rd.Dataset,
    max_hamming: int = 6,
    max_bucket: int = 200,
    kernel: str = "blake2b",
) -> rd.Dataset:
    """Near-dup pairs by SimHash, as a streaming Dataset: 4x16-bit band
    blocking guarantees any pair within Hamming distance 3 shares a
    band; wider distances are best-effort (documented LSH recall
    trade-off).  The 64-bit hash rides into the band rows, so the
    Hamming verify happens inside the bucket groupby — no driver-side
    signature map.  ``kernel="md5"`` swaps in the SQL-replayable
    :class:`Md5SimHasher` (verification twin); the banding/verify path
    is byte-identical either way."""
    hasher_cls = {"blake2b": SimHasher, "md5": Md5SimHasher}[kernel]
    sigs = docs.map_batches(hasher_cls, batch_format="pyarrow", concurrency=(1, 8))

    def band_rows(batch: pa.Table) -> pa.Table:
        doc_ids = np.asarray(batch.column("doc_id").to_pylist(), dtype=np.int64)
        h = np.asarray(batch.column("simhash").to_pylist(), dtype=np.int64)
        u = h.view(np.uint64) + np.uint64(1 << 63)
        n = len(doc_ids)
        bands = np.tile(np.arange(4, dtype=np.int64), n)
        shifts = np.uint64(16) * bands.astype(np.uint64)
        keys = (np.repeat(u, 4) >> shifts) & np.uint64(0xFFFF)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(doc_ids, 4)),
                "band": pa.array(bands, pa.int64()),
                "band_key": pa.array(keys.astype(np.int64)),
                "simhash": pa.array(np.repeat(h, 4)),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n < 2:
            return _empty_pairs(_SIMHASH_PAIR_SCHEMA)
        order = pc.sort_indices(group.column("doc_id"))
        group = group.take(order)
        truncated = n > max_bucket
        group = group.slice(0, max_bucket)
        ids = np.asarray(group.column("doc_id").to_pylist(), dtype=np.int64)
        h = np.asarray(group.column("simhash").to_pylist(), dtype=np.int64).view(np.uint64)
        # pairwise Hamming distance: xor then popcount via byte unpack
        x = h[:, None] ^ h[None, :]
        bits = np.unpackbits(x.view(np.uint8).reshape(len(ids), len(ids), 8), axis=2)
        dist = bits.sum(axis=2).astype(np.int64)
        ia, ib = np.triu_indices(len(ids), k=1)
        d = dist[ia, ib]
        keep = d <= max_hamming
        ia, ib, d = ia[keep], ib[keep], d[keep]
        return pa.table(
            {
                "doc_a": pa.array(ids[ia]),
                "doc_b": pa.array(ids[ib]),
                "hamming": pa.array(d),
                "truncated": pa.array(np.full(len(ia), truncated), pa.bool_()),
            }
        )

    buckets = sigs.map_batches(band_rows, batch_format="pyarrow")
    pairs = partitioned_bucket_pairs(buckets, bucket_pairs, _SIMHASH_PAIR_SCHEMA)
    return distinct_pairs(pairs)


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


# --- exact word-n-gram Jaccard over the whole corpus ---------------------

_TOKEN_SPLIT_RE = re.compile(r"[^a-z0-9]+")

_NGRAM_PAIR_SCHEMA = pa.schema(
    [
        ("doc_a", pa.int64()),
        ("doc_b", pa.int64()),
        ("shared", pa.int64()),
        ("jaccard", pa.float64()),
    ]
)

_NGRAM_CAND_SCHEMA = pa.schema(
    [
        ("doc_a", pa.int64()),
        ("doc_b", pa.int64()),
        ("n_a", pa.int64()),
        ("n_b", pa.int64()),
        ("ps", pa.int64()),
    ]
)


def _doc_word_ngrams(text: str, n: int) -> set[str]:
    """Distinct word n-grams: lowercase, split on non-alphanumeric runs,
    join n consecutive tokens with a single space (mirrors the DuckDB
    oracle: string_split_regex(lower(text), '[^a-z0-9]+'))."""
    words = [w for w in _TOKEN_SPLIT_RE.split(text.lower()) if w]
    if len(words) < n:
        return set()
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def ngram_jaccard_pairs(
    docs: rd.Dataset,
    n: int = 3,
    threshold: float = 0.8,
    id_column: str = "doc_id",
    text_column: str = "text",
    max_df: int | None = None,
    num_partitions: int | None = None,
    metric: str = "jaccard",
) -> rd.Dataset:
    """EXACT n-gram Jaccard near-dup pairs as a streaming Dataset —
    the non-approximate sibling of ``minhash_lsh_pairs``, built as an
    inverted-index join so no pair of documents is ever compared
    directly and nothing is O(corpus^2):

      1. ``map_batches``: each doc -> distinct word-n-gram rows
         ``(gram, doc_id, n_grams)``; the doc's distinct-gram count
         rides on every row, so no per-doc side table or join is needed.
      2. ONE coarse-partition gram shuffle (``partitioned_bucket_pairs``
         keyed on the gram): each >=2-doc gram segment emits its
         candidate pairs ``(doc_a < doc_b, n_a, n_b)``, then a per-block
         Arrow pre-count collapses repeats BEFORE the pair shuffle
         (partial-combiner pattern).
      3. ONE coarse-partition pair shuffle summing shared-gram counts;
         jaccard = shared / (n_a + n_b - shared), filtered at
         ``threshold`` — the only rows that survive are true near-dups.

    ``metric="containment"`` switches the score to asymmetric n-gram
    CONTAINMENT, shared / min(|A|, |B|) — the RefinedWeb/Lee-style
    signal that catches a short document embedded inside a longer one,
    which symmetric Jaccard dilutes below threshold.  Same plan, only
    the final vectorized score changes.

    Exactness caveat at scale: a gram with document frequency D emits
    D*(D-1)/2 candidate rows.  ``max_df`` (default None = exact) skips
    grams hotter than the cap — for near-dup detection a gram shared by
    thousands of docs carries ~no signal, and the MinHash path is the
    intended recall-oriented filter; this operator is the exact verify.
    """
    from .joins import default_join_partitions
    from .partition import part_column

    if metric not in ("jaccard", "containment"):
        raise ValueError(f"unknown metric {metric!r}")
    n_parts = num_partitions or default_join_partitions()

    def gram_rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_column).to_pylist()
        texts = t.column(text_column).to_pylist()
        out_g: list[str] = []
        out_id: list[int] = []
        out_n: list[int] = []
        for d, tx in zip(ids, texts):
            gs = _doc_word_ngrams(tx or "", n)
            out_g.extend(gs)
            out_id.extend([d] * len(gs))
            out_n.extend([len(gs)] * len(gs))
        return pa.table(
            {
                "gram": pa.array(out_g, pa.string()),
                "doc_id": pa.array(out_id, pa.int64()),
                "n_grams": pa.array(out_n, pa.int64()),
            }
        )

    def bucket_fn(group: pa.Table) -> pa.Table:
        d = group.num_rows
        if max_df is not None and d > max_df:
            return _NGRAM_CAND_SCHEMA.empty_table()
        order = pc.sort_indices(group.column("doc_id"))
        group = group.take(order)
        ids = group.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ns = group.column("n_grams").to_numpy(zero_copy_only=False).astype(np.int64)
        ia, ib = np.triu_indices(d, k=1)
        return pa.table(
            {
                "doc_a": pa.array(ids[ia]),
                "doc_b": pa.array(ids[ib]),
                "n_a": pa.array(ns[ia]),
                "n_b": pa.array(ns[ib]),
                "ps": pa.array(np.ones(len(ia), dtype=np.int64)),
            }
        )

    cands = partitioned_bucket_pairs(
        docs.map_batches(gram_rows, batch_format="pyarrow"),
        bucket_fn,
        _NGRAM_CAND_SCHEMA,
        on=("gram",),
        num_partitions=n_parts,
    )

    def partial_count(t: pa.Table) -> pa.Table:
        # collapse same-pair rows within the block before the shuffle
        # (the repo's standard pre-shuffle combiner)
        if t.num_rows == 0:
            return _NGRAM_CAND_SCHEMA.empty_table()
        agg = t.group_by(["doc_a", "doc_b", "n_a", "n_b"]).aggregate([("ps", "sum")])
        return agg.rename_columns(["doc_a", "doc_b", "n_a", "n_b", "ps"])

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, ["doc_a", "doc_b"], n_parts))

    def reduce(group: pa.Table) -> pa.Table:
        agg = group.group_by(["doc_a", "doc_b", "n_a", "n_b"]).aggregate([("ps", "sum")])
        s = agg.column("ps_sum").to_numpy(zero_copy_only=False).astype(np.int64)
        na = agg.column("n_a").to_numpy(zero_copy_only=False).astype(np.int64)
        nb = agg.column("n_b").to_numpy(zero_copy_only=False).astype(np.int64)
        if metric == "containment":
            score = s / np.minimum(na, nb)
        else:
            score = s / (na + nb - s)
        keep = score >= threshold
        return pa.table(
            {
                "doc_a": pa.array(
                    agg.column("doc_a").to_numpy(zero_copy_only=False).astype(np.int64)[keep]
                ),
                "doc_b": pa.array(
                    agg.column("doc_b").to_numpy(zero_copy_only=False).astype(np.int64)[keep]
                ),
                "shared": pa.array(s[keep]),
                metric: pa.array(np.round(score[keep], 6)),
            }
        )

    return (
        cands.map_batches(partial_count, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(reduce, batch_format="pyarrow")
    )


# --- embedding near-dup --------------------------------------------------

_EMB_PAIR_SCHEMA = pa.schema(
    [
        ("vec_a", pa.int64()),
        ("vec_b", pa.int64()),
        ("cosine", pa.float64()),
        ("truncated", pa.bool_()),
    ]
)


def embedding_dup_pairs(
    embeddings: rd.Dataset,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 11,
    id_column: str = "vec_id",
    max_bucket: int = 200,
) -> rd.Dataset:
    """Cosine near-duplicate pairs via random-hyperplane LSH buckets +
    in-bucket exact verify, as a streaming Dataset.  The brute-force
    all-pairs baseline lives in stages.similarity; this is the scale
    path (bucket then verify).  Degenerate buckets (e.g. zero vectors
    all landing in one key) are capped at ``max_bucket`` docs with the
    cap surfaced in ``truncated`` — pair emission is never O(n^2) in
    the corpus."""
    import ray

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
        n = group.num_rows
        if n < 2:
            return _empty_pairs(_EMB_PAIR_SCHEMA)
        order = pc.sort_indices(group.column("vec_id"))
        group = group.take(order)
        truncated = n > max_bucket
        group = group.slice(0, max_bucket)
        ids = np.asarray(group.column("vec_id").to_pylist(), dtype=np.int64)
        vecs = np.asarray(group.column("embedding").to_pylist(), dtype=np.float32)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1
        nv = vecs / norms
        sims = nv @ nv.T
        ia, ib = np.triu_indices(len(ids), k=1)
        s = sims[ia, ib]
        keep = s >= threshold
        ia, ib, s = ia[keep], ib[keep], s[keep]
        return pa.table(
            {
                "vec_a": pa.array(ids[ia]),
                "vec_b": pa.array(ids[ib]),
                "cosine": pa.array(s.astype(np.float64)),
                "truncated": pa.array(np.full(len(ia), truncated), pa.bool_()),
            }
        )

    buckets = embeddings.map_batches(bucketize, batch_format="pyarrow")
    pairs = partitioned_bucket_pairs(
        buckets, bucket_pairs, _EMB_PAIR_SCHEMA, on=("bucket",)
    )
    return distinct_pairs(pairs, a="vec_a", b="vec_b")


_EMB_INT_PAIR_SCHEMA = pa.schema(
    [
        ("vec_a", pa.int64()),
        ("vec_b", pa.int64()),
        ("qdot", pa.int64()),
        ("truncated", pa.bool_()),
    ]
)


def _int_planes(dim: int, n_planes: int) -> np.ndarray:
    """Deterministic small-integer hyperplanes, SQL-replayable:
    ``c[d, p] = (LE64(md5(f"{p},{d}")[0:8]) % 7) - 3`` with ``d``
    1-based — DuckDB ``md5_number_upper(p::VARCHAR || ',' || d::VARCHAR)
    % 7 - 3``.  Coefficients in [-3, 3]; md5 gives the plane family
    full determinism across workers with no RNG state to broadcast."""
    c = np.empty((dim, n_planes), dtype=np.int64)
    for p in range(n_planes):
        for d in range(1, dim + 1):
            u = int.from_bytes(hashlib.md5(f"{p},{d}".encode()).digest()[:8], "little")
            c[d - 1, p] = (u % 7) - 3
    return c


def embedding_dup_pairs_int(
    embeddings: rd.Dataset,
    threshold_num: int = 16,
    threshold_den: int = 25,
    n_planes: int = 12,
    quant: int = 1000,
    id_column: str = "vec_id",
    max_bucket: int = 200,
) -> rd.Dataset:
    """INTEGER-EXACT twin of :func:`embedding_dup_pairs` — same LSH
    bucket-then-verify machinery (``partitioned_bucket_pairs`` +
    ``distinct_pairs``), but every arithmetic step is integer so a
    DuckDB oracle matches bit for bit with no float knife edges:

    - vectors quantize to ``q = floor(x*quant + 0.5)`` int64 (IEEE
      float64 multiply + floor are identical in numpy and DuckDB);
    - hyperplanes are the md5-derived integer family (:func:`_int_planes`);
    - a pair is a near-dup iff ``dot > 0`` and
      ``threshold_den * dot^2 >= threshold_num * |a|^2 * |b|^2`` —
      i.e. cosine >= sqrt(num/den) (default 4/5 = 0.8) squared away in
      exact int64 (bounds: |q| <= ~quant, dim 64 -> dot^2*den < 2^63).

    The quantized vectors ride the shuffle packed as little-endian
    int64 binary (same trick as the MinHash signatures — Arrow joins
    reject list payloads; binary is join/shuffle-safe)."""
    import ray

    first = embeddings.take(1)[0]
    dim = len(first["embedding"])
    planes_ref = ray.put(_int_planes(dim, n_planes))
    plane_weights = 1 << np.arange(n_planes, dtype=np.int64)

    def bucketize(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        vecs = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
        q = np.floor(vecs * quant + 0.5).astype(np.int64)
        bits = (q @ pl) > 0
        keys = bits.dot(plane_weights)
        return pa.table(
            {
                "vec_id": batch.column(id_column),
                "bucket": pa.array(keys, pa.int64()),
                "qvec": pa.array([r.tobytes() for r in q], pa.binary()),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n < 2:
            return _empty_pairs(_EMB_INT_PAIR_SCHEMA)
        order = pc.sort_indices(group.column("vec_id"))
        group = group.take(order)
        truncated = n > max_bucket
        group = group.slice(0, max_bucket)
        ids = np.asarray(group.column("vec_id").to_pylist(), dtype=np.int64)
        blobs = group.column("qvec").to_pylist()
        q = np.frombuffer(b"".join(blobs), dtype=np.int64).reshape(len(ids), dim)
        gram = q @ q.T
        nn = np.diag(gram)
        ia, ib = np.triu_indices(len(ids), k=1)
        dot = gram[ia, ib]
        keep = (dot > 0) & (
            threshold_den * dot * dot >= threshold_num * nn[ia] * nn[ib]
        )
        ia, ib, dot = ia[keep], ib[keep], dot[keep]
        return pa.table(
            {
                "vec_a": pa.array(ids[ia]),
                "vec_b": pa.array(ids[ib]),
                "qdot": pa.array(dot.astype(np.int64)),
                "truncated": pa.array(np.full(len(ia), truncated), pa.bool_()),
            }
        )

    buckets = embeddings.map_batches(bucketize, batch_format="pyarrow")
    pairs = partitioned_bucket_pairs(
        buckets, bucket_pairs, _EMB_INT_PAIR_SCHEMA, on=("bucket",)
    )
    return distinct_pairs(pairs, a="vec_a", b="vec_b")
