"""Hashed-bag-of-words linear quality scoring — the fasttext-shaped
classifier pass every web-corpus curation stack runs (CCNet's LM
filter, GPT-3's WebText-similarity logistic regression), expressed as
the broadcast-model plumbing it needs at 100 TB: weights ship ONCE via
``ray.put``, scoring is one embarrassingly parallel actor-pool
``map_batches`` pass, nothing shuffles.

The model here is a deterministic integer stand-in (md5-derived
weights), which makes the whole path SQL-replayable — zero float knife
edges — while keeping the plumbing identical to a real model: swap
``hash_weights`` for trained float weights and the stage is a fasttext
scorer.

Scoring rule (DuckDB twin in ``quality_linear_score``):

- tokens: corpus-standard lowercased ``[^a-z0-9]+`` split, with
  multiplicity;
- feature bucket ``j = LE64(md5(token)[0:8]) % dim``
  (``md5_number_upper(token) % dim``);
- weight ``w[j] = LE64(md5('w:' || j)[0:8]) % 21 - 10`` (integers in
  [-10, 10]);
- ``score = sum(w[j(token)])`` (int64), ``keep = 1 if score > 0 else 0``
  (integer, keeping the whole output in the all-integer SQL domain).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

_TOKEN_RE = re.compile(r"[^a-z0-9]+")


def hash_weights(dim: int = 1024, mod: int = 21, offset: int = 10) -> np.ndarray:
    """Deterministic integer weight vector w[j] in [-offset, mod-1-offset]."""
    md5 = hashlib.md5
    return np.fromiter(
        (
            int.from_bytes(md5(f"w:{j}".encode()).digest()[:8], "little") % mod
            - offset
            for j in range(dim)
        ),
        dtype=np.int64,
        count=dim,
    )


class HashedLinearScorer:
    """Actor-pool scorer: weights fetched once per actor in ``__init__``
    (a real model would load its checkpoint here), token->bucket hashes
    memoized per actor across batches (vocab-bounded)."""

    def __init__(
        self,
        weights_ref,
        dim: int = 1024,
        id_column: str = "doc_id",
        text_column: str = "text",
    ) -> None:
        self.w = ray.get(weights_ref)
        self.dim = dim
        self.id_column = id_column
        self.text_column = text_column
        self._memo: dict[str, int] = {}

    def _bucket(self, tok: str) -> int:
        j = self._memo.get(tok)
        if j is None:
            j = (
                int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")
                % self.dim
            )
            self._memo[tok] = j
        return j

    def __call__(self, t: pa.Table) -> pa.Table:
        scores = np.zeros(t.num_rows, dtype=np.int64)
        for i, x in enumerate(t.column(self.text_column).to_pylist()):
            toks = [w for w in _TOKEN_RE.split((x or "").lower()) if w]
            if toks:
                idx = np.fromiter(
                    (self._bucket(w) for w in toks), dtype=np.int64, count=len(toks)
                )
                scores[i] = int(self.w[idx].sum())
        return pa.table(
            {
                self.id_column: t.column(self.id_column),
                "score": pa.array(scores),
                "keep": pa.array((scores > 0).astype(np.int64)),
            }
        )


def quality_linear_score(
    docs: rd.Dataset,
    dim: int = 1024,
    id_column: str = "doc_id",
    text_column: str = "text",
) -> rd.Dataset:
    """Score every document with the broadcast hashed linear model."""
    wref = ray.put(hash_weights(dim))
    return docs.map_batches(
        HashedLinearScorer,
        fn_constructor_kwargs={
            "weights_ref": wref,
            "dim": dim,
            "id_column": id_column,
            "text_column": text_column,
        },
        batch_format="pyarrow",
        batch_size=None,
        concurrency=(1, 4),
    )


def _scored(docs: rd.Dataset, dim: int, id_column: str, text_column: str):
    """(doc_id, source?, score) rows — the scorer pass plus carried keys."""
    wref = ray.put(hash_weights(dim))
    carry = [c for c in docs.schema().names if c not in (id_column, text_column)]

    def score(t: pa.Table) -> pa.Table:
        scorer = HashedLinearScorer(
            wref, dim=dim, id_column=id_column, text_column=text_column
        )
        s = scorer(t)
        for c in carry:
            s = s.append_column(c, t.column(c))
        return s

    return docs.map_batches(score, batch_format="pyarrow", batch_size=None)


def quality_threshold_per_source(
    docs: rd.Dataset,
    top_frac: float = 0.25,
    dim: int = 1024,
    id_column: str = "doc_id",
    text_column: str = "text",
    source_column: str = "source",
) -> rd.Dataset:
    """Keep each source's best-scoring slice: the per-source threshold
    is the k-th largest score with ``k = ceil(top_frac * n_source)``,
    and every document with ``score >= threshold`` survives (ties keep
    extra docs rather than breaking them arbitrarily — deterministic
    and SQL-replayable since scores are integers).

    Scale shape: scores are bounded integers, so the driver never sees
    documents — per-block ``(source, score) -> count`` partials reduce
    through one small groupby into a score HISTOGRAM per source
    (score-domain-sized, not corpus-sized); the k-th largest falls out
    of the histogram's descending cumulative sum; thresholds broadcast
    via ``ray.put`` and the filter is an embarrassingly parallel
    second pass.  This is the integer-exact version of the CCNet
    per-language perplexity-quantile cut."""
    scored = _scored(docs, dim, id_column, text_column)

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table({source_column: t.column(source_column), "score": t.column("score")})
            .append_column("n", pa.array(np.ones(t.num_rows, np.int64)))
            .group_by([source_column, "score"])
            .aggregate([("n", "sum")])
        )
        return g.rename_columns([source_column, "score", "n"])

    hist = (
        scored.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby([source_column, "score"])
        .sum("n")
        .take_all()
    )  # bounded: n_sources x distinct integer scores
    by_src: dict[str, list[tuple[int, int]]] = {}
    totals: dict[str, int] = {}
    for r in hist:
        s = r[source_column]
        by_src.setdefault(s, []).append((int(r["score"]), int(r["sum(n)"])))
        totals[s] = totals.get(s, 0) + int(r["sum(n)"])
    thresholds: dict[str, int] = {}
    for s, cells in by_src.items():
        need = int(np.ceil(top_frac * totals[s]))
        run = 0
        for sc, n in sorted(cells, reverse=True):
            run += n
            if run >= need:
                thresholds[s] = sc
                break
    thr_ref = ray.put(thresholds)

    def keep(t: pa.Table) -> pa.Table:
        thr = ray.get(thr_ref)
        srcs = t.column(source_column).to_pylist()
        sc = t.column("score").to_numpy(zero_copy_only=False)
        lim = np.fromiter(
            (thr.get(s, np.iinfo(np.int64).max) for s in srcs),
            dtype=np.int64,
            count=len(srcs),
        )
        out = t.filter(pa.array(sc >= lim))
        return out.append_column(
            "threshold",
            pa.array(
                [thr[s] for s in out.column(source_column).to_pylist()], pa.int64()
            ),
        )

    return scored.map_batches(keep, batch_format="pyarrow", batch_size=None).drop_columns(
        ["keep"]
    )


def dedup_keep_best(
    docs: rd.Dataset,
    dim: int = 1024,
    id_column: str = "doc_id",
    text_column: str = "text",
) -> rd.Dataset:
    """Quality-aware exact dedup: among documents with IDENTICAL text,
    keep the one with the highest model score (ties -> smallest id).
    Plain exact dedup keeps an arbitrary-but-deterministic member;
    curation stacks prefer the best-provenance/best-quality copy.

    Scale shape mirrors ``stages/dedup.dedup_exact``: per-block
    argmax partials per text hash (one row per distinct text per
    block), then one coarse-partition final argmax — document bodies
    never shuffle, only (hash, id, score) triples."""
    b2 = hashlib.blake2b

    def hash_partial(t: pa.Table) -> pa.Table:
        h = np.fromiter(
            (
                int.from_bytes(b2((x or "").encode(), digest_size=8).digest(), "little")
                for x in t.column(text_column).to_pylist()
            ),
            dtype=np.uint64,
            count=t.num_rows,
        ).view(np.int64)
        # bodies stay block-local: only (hash, id, score) shuffles
        t = t.drop_columns(text_column).append_column("__h", pa.array(h))
        # block-local best per hash: sort by (h, -score, id), first wins
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("__h", "ascending"),
                ("score", "descending"),
                (id_column, "ascending"),
            ],
        )
        t = t.take(idx)
        hh = t.column("__h").to_numpy(zero_copy_only=False)
        first = np.ones(len(hh), bool)
        first[1:] = hh[1:] != hh[:-1]
        return t.filter(pa.array(first))

    from .partition import part_column
    from .webtext import _default_span_parts

    n_parts = _default_span_parts()

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, ["__h"], n_parts))

    def reduce_part(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.drop_columns("__part")
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("__h", "ascending"),
                ("score", "descending"),
                (id_column, "ascending"),
            ],
        )
        t = t.take(idx)
        hh = t.column("__h").to_numpy(zero_copy_only=False)
        first = np.ones(len(hh), bool)
        first[1:] = hh[1:] != hh[:-1]
        return t.filter(pa.array(first)).drop_columns("__h")

    wref = ray.put(hash_weights(dim))

    def score_keep_text(t: pa.Table) -> pa.Table:
        scorer = HashedLinearScorer(
            wref, dim=dim, id_column=id_column, text_column=text_column
        )
        s = scorer(t)
        return s.append_column(text_column, t.column(text_column))

    return (
        docs.map_batches(score_keep_text, batch_format="pyarrow", batch_size=None)
        .drop_columns(["keep"])
        .map_batches(hash_partial, batch_format="pyarrow", batch_size=None)
        .map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(reduce_part, batch_format="pyarrow")
    )


def score_rank_per_source(
    scored: rd.Dataset,
    id_column: str = "doc_id",
    source_column: str = "source",
    score_column: str = "score",
) -> rd.Dataset:
    """Exact per-source rank normalization WITHOUT a global sort:
    every row gets ``rk`` (1-based, best score first, ties -> smallest
    id) and ``n_src`` (source size) — the all-integer form of
    percent_rank, ready for cross-source mixing or curriculum cuts
    (the float percentile is ``(rk-1)/(n_src-1)`` if a caller wants
    it; emitting integers keeps the oracle knife-edge-free).

    Scale shape: scores are bounded integers, so the (source, score)
    cell census is score-domain-sized — it collects once, turns into
    exclusive better-score offsets + per-source totals (broadcast via
    ``ray.put``), and ONE cell-hash shuffle ranks each cell's rows by
    id locally.  The grouped two-pass scan, with cells keyed by VALUE
    instead of key-hash bits (``stages/ordering.py``'s trick only
    works for uniform keys)."""
    from .partition import part_column, sorted_segments
    from .webtext import _default_span_parts

    n_parts = _default_span_parts()

    def census(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "src": t.column(source_column),
                    "score": t.column(score_column),
                }
            )
            .append_column("n", pa.array(np.ones(t.num_rows, np.int64)))
            .group_by(["src", "score"])
            .aggregate([("n", "sum")])
        )
        return g.rename_columns(["src", "score", "n"])

    cells = (
        scored.map_batches(census, batch_format="pyarrow", batch_size=None)
        .groupby(["src", "score"])
        .sum("n")
        .take_all()
    )  # bounded: sources x integer-score domain
    per_src: dict[str, list[tuple[int, int]]] = {}
    for r in cells:
        per_src.setdefault(r["src"], []).append((int(r["score"]), int(r["sum(n)"])))
    offsets: dict[tuple[str, int], int] = {}
    totals: dict[str, int] = {}
    for src, rows in per_src.items():
        run = 0
        for score, n in sorted(rows, key=lambda x: -x[0]):  # best first
            offsets[(src, score)] = run
            run += n
        totals[src] = run
    state_ref = ray.put((offsets, totals))

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__part", part_column(t, [source_column, score_column], n_parts)
        )

    def rank_group(g: pa.Table) -> pa.Table:
        offs, tots = ray.get(state_ref)
        g = g.drop_columns("__part")
        s, starts, ends = sorted_segments(
            g,
            [source_column, score_column],
            extra_sort=[(id_column, "ascending")],
        )
        srcs = s.column(source_column).to_pylist()
        scores = s.column(score_column).to_numpy(zero_copy_only=False)
        rk = np.empty(s.num_rows, dtype=np.int64)
        nsrc = np.empty(s.num_rows, dtype=np.int64)
        for a, b in zip(starts, ends):
            key = (srcs[a], int(scores[a]))
            rk[a:b] = offs[key] + 1 + np.arange(b - a, dtype=np.int64)
            nsrc[a:b] = tots[srcs[a]]
        s = s.append_column("rk", pa.array(rk, pa.int64()))
        return s.append_column("n_src", pa.array(nsrc, pa.int64()))

    return (
        scored.map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(rank_group, batch_format="pyarrow")
    )
