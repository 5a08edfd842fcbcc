"""Text, webtext-curation and dedup queries (split from relational.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from ..stages.joins import broadcast_anti_join, broadcast_join, broadcast_semi_join, hash_join
from .rel_base import _read, _round_col

def doc_fingerprints(sf_dir: str) -> rd.Dataset:
    """Per-document content fingerprint (md5 hex — DuckDB-oracle-able;
    the engine's internal 64-bit fp lives in stages.textstats).  A
    stateless map: the canonical first step of exact dedup / change
    detection at corpus scale."""
    import hashlib

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "fp_md5": pa.array(
                    [
                        hashlib.md5(x.encode("utf-8")).hexdigest()
                        for x in t.column("text").to_pylist()
                    ],
                    pa.string(),
                ),
            }
        )

    return docs.map_batches(fp, batch_format="pyarrow")


# --- documents: exact dedup + token stats --------------------------------

def dedup_exact_docs(sf_dir: str) -> rd.Dataset:
    from ..stages.dedup import exact_dedup

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return exact_dedup(docs).select_columns(["doc_id", "text"])


def dedup_ngram_pairs(sf_dir: str) -> rd.Dataset:
    """Exact word-trigram Jaccard near-dup pairs over documents —
    the DuckDB-oracled exact sibling of the MinHash path (inverted
    index, two coarse shuffles, no all-pairs)."""
    from ..stages.dedup import ngram_jaccard_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return ngram_jaccard_pairs(docs, n=3, threshold=0.8)


def text_token_stats(sf_dir: str) -> rd.Dataset:
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens_ws": pa.array([len(x.split()) for x in texts], pa.int64()),
                "n_chars_seen": pa.array([len(x) for x in texts], pa.int64()),
            }
        )

    return docs.map_batches(stats, batch_format="pyarrow")


# --- scalar functions: JSON, regex, distinct-count -----------------------

def json_extract_props(sf_dir: str) -> rd.Dataset:
    """JSON scalar extraction (SURVEY §2.8): events.props -> int field k."""
    import json

    ev = _read(sf_dir, "events", ["event_id", "props"])

    def extract(t: pa.Table) -> pa.Table:
        ks = [json.loads(p)["k"] for p in t.column("props").to_pylist()]
        return pa.table(
            {"event_id": t.column("event_id"), "k": pa.array(ks, pa.int64())}
        )

    return ev.map_batches(extract, batch_format="pyarrow")


def wq_repetition_stats(sf_dir: str) -> rd.Dataset:
    """Per-doc word-repetition metrics (the SQL-checkable subset of the
    Gopher rules: distinct-word ratio + mean word length)."""
    from ..stages.webtext import RepetitionStats

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = docs.map_batches(
        RepetitionStats, batch_format="pyarrow", batch_size=None,
        concurrency=(1, 8),
    ).select_columns(["doc_id", "n_words", "distinct_word_ratio", "mean_word_len"])

    def rnd(t: pa.Table) -> pa.Table:
        t = _round_col(t, "distinct_word_ratio", 6)
        return _round_col(t, "mean_word_len", 6)

    return out.map_batches(rnd, batch_format="pyarrow")


def decontaminate_docs(sf_dir: str) -> rd.Dataset:
    """GPT-3-style n-gram decontamination flags: docs with
    ``doc_id % 50 == 0`` play the benchmark; every other doc is flagged
    iff it shares a word 4-gram with any benchmark doc.  Eval grams are
    broadcast once (``ray.put``); the corpus side streams."""
    from ..stages.webtext import decontaminate

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def split(keep_eval: bool):
        def f(t: pa.Table) -> pa.Table:
            is_eval = t.column("doc_id").to_numpy() % 50 == 0
            return t.filter(pa.array(is_eval if keep_eval else ~is_eval))

        return f

    eval_ds = docs.map_batches(split(True), batch_format="pyarrow")
    corpus = docs.map_batches(split(False), batch_format="pyarrow")
    return decontaminate(corpus, eval_ds, n=4).select_columns(
        ["doc_id", "contaminated"]
    )


def split_leakage_report(sf_dir: str) -> rd.Dataset:
    """Split-leakage audit: after the exact-count stratified split, how
    many VAL documents share a word 4-gram with any TRAIN document, per
    source — the post-split decontamination check a training pipeline
    runs before shipping a corpus (train->val n-gram leakage inflates
    eval scores).  Composes the oracled ``stratified_split`` with the
    inverted gram-hash join decontamination (both sides corpus-sized,
    nothing broadcast); the per-source report is all-integer."""
    from ..stages.joins import hash_join, staged_nonempty
    from ..stages.textprep import stratified_split
    from ..stages.webtext import decontaminate_join

    docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    split = stratified_split(
        docs.map_batches(
            lambda t: t.select(["doc_id", "source"]), batch_format="pyarrow"
        ),
        val_pct=10,
        test_pct=10,
    ).materialize()  # three consumers: val filter, train filter, report join

    def keep(which: str):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t.column("split"), which)).select(["doc_id"])

        return f

    docs_s = docs.materialize()  # two semi-join probes
    val_ids = split.map_batches(keep("val"), batch_format="pyarrow")
    train_ids = split.map_batches(keep("train"), batch_format="pyarrow")
    val_docs = hash_join(docs_s, staged_nonempty(val_ids), on=["doc_id"])
    train_docs = hash_join(docs_s, staged_nonempty(train_ids), on=["doc_id"])
    flags = decontaminate_join(val_docs, train_docs, n=4)

    val_src = split.map_batches(
        lambda t: t.filter(pc.equal(t.column("split"), "val")).select(
            ["doc_id", "source"]
        ),
        batch_format="pyarrow",
    )
    report = hash_join(val_src, staged_nonempty(flags), on=["doc_id"])

    def partials(t: pa.Table) -> pa.Table:
        g = t.group_by("source").aggregate(
            [("contaminated", "sum"), ("doc_id", "count")]
        )
        return g.rename_columns(["source", "n_leaky", "n_val"])

    return (
        report.map_batches(partials, batch_format="pyarrow", batch_size=None)
        .groupby("source")
        .sum(["n_leaky", "n_val"])
        .map_batches(
            lambda t: t.rename_columns(["source", "n_leaky", "n_val"]),
            batch_format="pyarrow",
        )
    )


def pii_redact_docs(sf_dir: str) -> rd.Dataset:
    """PII scrub over documents, DRIVER-ORACLED: the synthetic corpus
    carries no PII (verified at every sf), so the query first INJECTS a
    deterministic email + IPv4 per doc (derived from doc_id — the SQL
    oracle derives the identical string), then runs the real
    ``PIIRedactor`` actor stage.  The oracle replays the injection and
    the email/IP redaction with RE2 ``regexp_replace`` — so redaction
    semantics, counts, and the phone pattern's zero false positives on
    the full corpus are all hash-gated.  (The phone regex itself uses
    lookarounds RE2 lacks; its adversarial cases are pinned in
    tests/test_webtext.py.)"""
    from ..stages.webtext import PIIRedactor

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def inject(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        texts = t.column("text").to_pylist()
        out = [
            f"{txt} contact user{d}@example.com from 10.0.{d % 200}.7 ok"
            for txt, d in zip(texts, did)
        ]
        return pa.table({"doc_id": t.column("doc_id"), "text": pa.array(out, pa.string())})

    return docs.map_batches(inject, batch_format="pyarrow", batch_size=None).map_batches(
        PIIRedactor, batch_format="pyarrow", batch_size=None, concurrency=(1, 8)
    )


def gopher_filter_docs(sf_dir: str) -> rd.Dataset:
    """Docs surviving the full Gopher repetition ruleset (rows-only;
    per-metric math is pinned by the naive reference in tests)."""
    from ..stages.webtext import gopher_filter

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return gopher_filter(docs)


def wq_source_quality(sf_dir: str) -> rd.Dataset:
    """Per-source (domain-level) quality rollup: doc count + mean
    distinct-word ratio — block-partial sums, then a 20-key groupby."""
    from ..stages.webtext import _words

    docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def partial(t: pa.Table) -> pa.Table:
        ratios = []
        for x in t.column("text").to_pylist():
            ws = _words(x or "")
            ratios.append(len(set(ws)) / len(ws) if ws else 0.0)
        part = pa.table(
            {
                "source": t.column("source"),
                "sum_ratio": pa.array(ratios, pa.float64()),
                "n_docs": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )
        agg = part.group_by(["source"]).aggregate(
            [("sum_ratio", "sum"), ("n_docs", "sum")]
        )
        return agg.rename_columns(["source", "sum_ratio", "n_docs"])

    agg = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("sum_ratio", alias_name="sum_ratio"), Sum("n_docs", alias_name="n_docs"))
    )

    def finish(t: pa.Table) -> pa.Table:
        avg = np.round(
            np.asarray(t.column("sum_ratio").to_pylist())
            / np.asarray(t.column("n_docs").to_pylist()),
            6,
        )
        return pa.table(
            {
                "source": t.column("source"),
                "n_docs": t.column("n_docs"),
                "avg_distinct_ratio": pa.array(avg, pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def c4_span_dedup(sf_dir: str, n: int = 5) -> rd.Dataset:
    """C4-style repeated-span removal over the document corpus: every
    occurrence of a non-overlapping ``n``-word span shared by >= 2
    distinct docs is deleted; spans re-joined in order (lowercase
    token-normalized text, matching the oracle's reconstruction)."""
    from ..stages.webtext import span_dedup

    # the two passes (hot-span bank, rewrite) each consume the corpus;
    # stage it once so the second pass reads object-store blocks, not
    # parquet again (swap for a checkpoint_dir parquet stage at scale)
    docs = _read(sf_dir, "documents", ["doc_id", "text"]).materialize()
    return span_dedup(docs, n=n, min_docs=2)


def text_unigram_logprob(sf_dir: str) -> rd.Dataset:
    """Per-doc mean unigram log-probability under the corpus's own
    unigram LM — the distributed analogue of CCNet-style LM quality
    filtering (docs far below the corpus's typical score are
    boilerplate/noise candidates).  Plan: shared tokenizer
    (`_doc_term_rows`), vocabulary counts via per-block partials + one
    term groupby, ONE term-hash shuffle join back to the term rows,
    per-row normalized contributions, one doc groupby sum.  Vocabulary
    is corpus-sized throughout — never a broadcast."""
    from ray.data.aggregate import Sum

    from ..stages.joins import hash_join, staged_nonempty

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    term_rows = docs.map_batches(
        _doc_term_rows, batch_format="pyarrow", batch_size=None
    ).materialize()  # three consumers (total, vocab counts, join probe)

    total = int(term_rows.aggregate(Sum("tfc"))["sum(tfc)"])
    if total == 0:
        return term_rows.select_columns(["doc_id"])

    def vc_partial(t: pa.Table) -> pa.Table:
        c = t.group_by("term").aggregate([("tfc", "sum")])
        return pa.table(
            {"term": c.column("term"), "cnt": c.column("tfc_sum").cast(pa.int64())}
        )

    vocab = (
        term_rows.map_batches(vc_partial, batch_format="pyarrow", batch_size=None)
        .groupby("term")
        .sum("cnt")
        .map_batches(
            lambda t: t.rename_columns(["term", "cnt"]), batch_format="pyarrow"
        )
    )
    joined = hash_join(term_rows, staged_nonempty(vocab), on=["term"])

    def contrib(t: pa.Table) -> pa.Table:
        tfc = t.column("tfc").to_numpy(zero_copy_only=False).astype(np.float64)
        dlen = t.column("dlen").to_numpy(zero_copy_only=False).astype(np.float64)
        cnt = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.float64)
        c = (tfc * np.log(cnt / total)) / dlen
        return pa.table(
            {"doc_id": t.column("doc_id"), "c": pa.array(c, pa.float64())}
        )

    return (
        joined.map_batches(contrib, batch_format="pyarrow", batch_size=None)
        .groupby("doc_id")
        .sum("c")
        .map_batches(
            lambda t: pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "logprob": pc.round(t.column("sum(c)"), 4),
                }
            ),
            batch_format="pyarrow",
        )
    )


def text_ppl_buckets(sf_dir: str) -> rd.Dataset:
    """CCNet-style perplexity bucketing (Wenzek et al. 2019): split the
    corpus into head / middle / tail by terciles of the per-doc LM
    score (here the oracled `text_unigram_logprob`; higher logprob =
    lower perplexity = head).  Cuts are DISCRETE order statistics of
    the 4dp-rounded score found by the distributed selection machinery
    (`stages/selection.select_order_stats` — never collects the
    column), so both sides bucket by comparing against an actual data
    value and ties land in the same bucket deterministically.  Head
    target size = ceil(n/3); value ties at a cut can only GROW a
    bucket, identically on both sides."""
    from ..stages.selection import select_order_stats

    lp = text_unigram_logprob(sf_dir).materialize()
    n = int(lp.count())
    if n == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "logprob": pa.array([], pa.float64()),
                    "bucket": pa.array([], pa.string()),
                }
            )
        )
    h = -(-n // 3)  # ceil(n/3)
    r_head = max(n - h, 0)  # 0-based ascending rank of the head cut
    r_mid = max(n - 2 * h, 0)
    stats = select_order_stats(lp, "logprob", sorted({r_head, r_mid}))
    c_head, c_mid = stats[r_head], stats[r_mid]

    def bucket(t: pa.Table) -> pa.Table:
        v = t.column("logprob").to_numpy(zero_copy_only=False)
        b = np.where(v >= c_head, "head", np.where(v >= c_mid, "middle", "tail"))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "logprob": t.column("logprob"),
                "bucket": pa.array(b.tolist(), pa.string()),
            }
        )

    return lp.map_batches(bucket, batch_format="pyarrow", batch_size=None)


def _doc_bigram_rows(t: pa.Table) -> pa.Table:
    """documents batch -> distinct (doc_id, w1, w2, tfc, nbg) rows —
    adjacent token pairs after empty-token filtering (matching the
    oracle's ``list_filter`` -> ``list_zip`` reconstruction exactly).
    Vectorized: one Arrow regex split, numpy adjacency mask, one C++
    group_by.  Docs are whole rows here, so nbg (bigrams per doc) is a
    safe per-doc stamp (the bm25 dlen lesson)."""
    toks = pc.split_pattern_regex(
        pc.utf8_lower(t.column("text")), pattern=r"[ \t\n\r\f\v]+"
    )
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    parent = np.repeat(t.column("doc_id").to_numpy(zero_copy_only=False), lens)
    flat = toks.flatten()
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    words = flat.filter(pa.array(keep))
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    parent = parent[keep]
    if len(words) < 2:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "w1": pa.array([], pa.string()),
                "w2": pa.array([], pa.string()),
                "tfc": pa.array([], pa.int64()),
                "nbg": pa.array([], pa.int64()),
            }
        )
    adj = pa.array(parent[:-1] == parent[1:])
    n = len(words)
    pairs = pa.table(
        {
            "doc_id": pa.array(parent[:-1], pa.int64()),
            "w1": words.slice(0, n - 1),
            "w2": words.slice(1, n - 1),
        }
    ).filter(adj)
    counted = pairs.group_by(["doc_id", "w1", "w2"]).aggregate([("w2", "count")])
    uniq, bcounts = np.unique(
        pairs.column("doc_id").to_numpy(zero_copy_only=False), return_counts=True
    )
    cdoc = counted.column("doc_id").to_numpy(zero_copy_only=False)
    nbg = bcounts[np.searchsorted(uniq, cdoc)]
    return pa.table(
        {
            "doc_id": counted.column("doc_id"),
            "w1": counted.column("w1"),
            "w2": counted.column("w2"),
            "tfc": counted.column("w2_count").cast(pa.int64()),
            "nbg": pa.array(nbg, pa.int64()),
        }
    )


def text_bigram_logprob(sf_dir: str) -> rd.Dataset:
    """Per-doc mean bigram log-probability under the corpus's own
    bigram LM (P(w2|w1) = c(w1,w2) / c(w1·)) — the order-2 upgrade of
    the oracled ``text_unigram_logprob`` and the closest SQL-gateable
    shape to CCNet's KenLM perplexity filter (Wenzek et al. 2019).
    Plan: bigram rows via the vectorized adjacency tokenizer; the
    bigram-count MODEL is pair-shaped (corpus-bigrams-sized), so its
    reduce is the coarse-partition ``__part`` map_groups (never a
    native multi-key groupby — the pair-stream lesson) and it reaches
    the scorer through a HASH JOIN on (w1, w2), never a broadcast;
    context counts c(w1·) reduce from the model (vocab-sized) and join
    on w1 model-side, so the doc rows are joined exactly once."""
    from ray.data.aggregate import Sum

    from ..stages.joins import hash_join, staged_nonempty
    from ..stages.partition import part_column
    from ..stages.webtext import _default_span_parts

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    rows = docs.map_batches(
        _doc_bigram_rows, batch_format="pyarrow", batch_size=None
    ).materialize()  # two consumers: model partials + join probe

    n_parts = _default_span_parts()

    def model_partial(t: pa.Table) -> pa.Table:
        c = t.group_by(["w1", "w2"]).aggregate([("tfc", "sum")])
        c = c.rename_columns(["w1", "w2", "cnt"])
        return c.append_column("__part", part_column(c, ["w1", "w2"], n_parts))

    def model_reduce(g: pa.Table) -> pa.Table:
        r = (
            g.drop_columns("__part")
            .group_by(["w1", "w2"])
            .aggregate([("cnt", "sum")])
        )
        return r.rename_columns(["w1", "w2", "cnt"])

    model = (
        rows.map_batches(model_partial, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(model_reduce, batch_format="pyarrow")
        .materialize()  # two consumers: ctx partials + the pair join
    )

    def ctx_partial(t: pa.Table) -> pa.Table:
        c = t.group_by("w1").aggregate([("cnt", "sum")])
        return c.rename_columns(["w1", "ctx"])

    ctx = (
        model.map_batches(ctx_partial, batch_format="pyarrow", batch_size=None)
        .groupby("w1")
        .sum("ctx")
        .map_batches(lambda t: t.rename_columns(["w1", "ctx"]), batch_format="pyarrow")
    )
    staged_ctx = staged_nonempty(ctx)
    if staged_ctx is None:
        return rows.select_columns(["doc_id"])
    model_ctx = hash_join(model, staged_ctx, on=["w1"])
    scored = hash_join(rows, staged_nonempty(model_ctx), on=["w1", "w2"])

    def contrib(t: pa.Table) -> pa.Table:
        tfc = t.column("tfc").to_numpy(zero_copy_only=False).astype(np.float64)
        nbg = t.column("nbg").to_numpy(zero_copy_only=False).astype(np.float64)
        cnt = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.float64)
        ctxv = t.column("ctx").to_numpy(zero_copy_only=False).astype(np.float64)
        c = (tfc * np.log(cnt / ctxv)) / nbg
        return pa.table(
            {"doc_id": t.column("doc_id"), "c": pa.array(c, pa.float64())}
        )

    return (
        scored.map_batches(contrib, batch_format="pyarrow", batch_size=None)
        .groupby("doc_id")
        .sum("c")
        .map_batches(
            lambda t: pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "logprob": pc.round(t.column("sum(c)"), 4),
                }
            ),
            batch_format="pyarrow",
        )
    )


def text_bm25_topk(sf_dir: str, k: int = 3, k1: float = 1.2, b: float = 0.75) -> rd.Dataset:
    """BM25 (Robertson; Lucene-style non-negative idf) with per-doc
    top-k terms — TF-IDF's production sibling.  Same plan shape as
    ``text_tfidf_topk`` (shared ``_doc_term_rows`` tokenizer, one
    term-hash shuffle for df, o5 partial top-k), plus one scalar:
    avgdl.  The per-doc (dlen, is-first-row) attributes are stamped as
    ROW columns inside the tokenizer map — where each doc is provably
    whole — so avgdl is a plain row-level Sum that stays exact even if
    Ray's dynamic block splitting later cuts a doc's term rows across
    blocks (a per-block np.unique would double-count straddlers).
    Arithmetic is ordered exactly as the SQL oracle writes it so both
    engines produce bit-identical doubles from identical inputs."""
    from ray.data.aggregate import Sum

    from ..stages.joins import default_join_partitions, hash_join, staged_nonempty
    from ..stages.partition import part_column

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = docs.count()

    def term_rows_fn(t: pa.Table) -> pa.Table:
        out = _doc_term_rows(t)
        d = out.column("doc_id").to_numpy(zero_copy_only=False)
        fst = np.zeros(len(d), dtype=bool)
        fst[np.unique(d, return_index=True)[1]] = True
        dlen = out.column("dlen").to_numpy(zero_copy_only=False)
        return out.append_column(
            "dlen_fst", pa.array(np.where(fst, dlen, 0), pa.int64())
        ).append_column("fst", pa.array(fst.astype(np.int64), pa.int64()))

    term_rows = docs.map_batches(
        term_rows_fn, batch_format="pyarrow", batch_size=None
    ).materialize()  # three consumers (avgdl, df, join probe)

    agg = term_rows.aggregate(Sum("dlen_fst"), Sum("fst"))
    avgdl = agg["sum(dlen_fst)"] / agg["sum(fst)"]
    # lazy projection off the materialized parent — re-runs per
    # consumer but never re-tokenizes
    term_rows = term_rows.drop_columns(["dlen_fst", "fst"])

    def df_partial(t: pa.Table) -> pa.Table:
        c = t.group_by("term").aggregate([("term", "count")])
        return pa.table(
            {"term": c.column("term"), "n": c.column("term_count").cast(pa.int64())}
        )

    df_tbl = (
        term_rows.map_batches(df_partial, batch_format="pyarrow", batch_size=None)
        .groupby("term")
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns(["term", "dfc"]), batch_format="pyarrow"
        )
    )
    staged_df = staged_nonempty(df_tbl)
    if staged_df is None:
        return term_rows
    joined = hash_join(term_rows, staged_df, on=["term"])

    def score(t: pa.Table) -> pa.Table:
        tfc = t.column("tfc").to_numpy(zero_copy_only=False).astype(np.float64)
        dlen = t.column("dlen").to_numpy(zero_copy_only=False).astype(np.float64)
        dfc = t.column("dfc").to_numpy(zero_copy_only=False).astype(np.float64)
        idf = np.log((n_docs - dfc + 0.5) / (dfc + 0.5) + 1)
        bm25 = (idf * (tfc * (k1 + 1))) / (
            tfc + k1 * ((1 - b) + b * dlen / avgdl)
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "term": t.column("term"),
                "bm25": pa.array(bm25, pa.float64()),
            }
        )

    scored = joined.map_batches(score, batch_format="pyarrow", batch_size=None)
    n_parts = default_join_partitions()

    def topk(t: pa.Table, emit_rank: bool) -> pa.Table:
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("doc_id", "ascending"),
                ("bm25", "descending"),
                ("term", "ascending"),
            ],
        )
        t = t.take(idx)
        keys = t.column("doc_id").to_numpy(zero_copy_only=False)
        n = len(keys)
        new = np.empty(n, dtype=bool)
        if n:
            new[0] = True
            new[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(new)
        seg_id = np.cumsum(new) - 1
        rank = np.arange(n, dtype=np.int64) - starts[seg_id]
        t = t.filter(pa.array(rank < k))
        if emit_rank:
            t = t.append_column("rank", pa.array(rank[rank < k] + 1, pa.int64()))
        return t

    def partial(t: pa.Table) -> pa.Table:
        t = topk(t, emit_rank=False)
        return t.append_column("__part", part_column(t, ["doc_id"], n_parts))

    def final(g: pa.Table) -> pa.Table:
        t = topk(g.drop_columns("__part"), emit_rank=True)
        return _round_col(t, "bm25", 4)

    return (
        scored.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(final, batch_format="pyarrow")
    )


def text_tfidf_topk(
    sf_dir: str, k: int = 3, checkpoint_dir: str | None = None
) -> rd.Dataset:
    """Distributed TF-IDF with per-doc top-k terms — the IR scoring
    pass a corpus pipeline runs before indexing/filtering:

    - tokenize+count per block (compiled ASCII-whitespace split — the
      SAME explicit class as the SQL oracle's regex, so neither side
      inherits its engine's \\s semantics), emitting distinct
      (doc_id, term, tf_count, doc_len) rows;
    - document frequency = ``groupby(term).count()`` over those rows
      (already distinct per doc-term);
    - one term-hash shuffle joins df back to the term rows (vocabulary
      is corpus-sized: a real join, never a broadcast);
    - per-doc top-k by (tfidf desc, term asc) with the o5 partial
      top-k shape — <= k rows per doc per block through the shuffle.

    The token table feeds two consumers (df aggregate + join probe), so
    it stages once — in the object store by default, or as partitioned
    parquet under ``checkpoint_dir`` (the curation option) beyond
    object-store capacity.  The corpus doc count rides WITH the token
    pass as one sentinel row per block (doc_id -1), so no separate
    counting scan of the input ever runs."""
    from ..stages.joins import default_join_partitions, hash_join, staged_nonempty
    from ..stages.partition import part_column

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def rows_plus_count(t: pa.Table) -> pa.Table:
        out = _doc_term_rows(t)
        sentinel = pa.table(
            {
                "doc_id": pa.array([-1], pa.int64()),
                "term": pa.array([""], pa.string()),
                "tfc": pa.array([t.num_rows], pa.int64()),
                "dlen": pa.array([0], pa.int64()),
            }
        ).cast(out.schema)
        return pa.concat_tables([sentinel, out])

    staged = docs.map_batches(
        rows_plus_count, batch_format="pyarrow", batch_size=None
    )
    if checkpoint_dir is not None:
        staged.write_parquet(checkpoint_dir)
        staged = rd.read_parquet(checkpoint_dir)
    else:
        staged = staged.materialize()  # two consumers (df + join probe)
    # doc count from the staged sentinels: a cheap pass over in-memory
    # (or checkpointed) blocks, never a second scan of the raw corpus
    n_docs = staged.filter(expr="doc_id < 0").sum("tfc") or 0
    term_rows = staged.filter(expr="doc_id >= 0")

    def df_partial(t: pa.Table) -> pa.Table:
        # rows are distinct (doc, term): per-block pre-combine so the df
        # shuffle moves one row per (block, term), not per (doc, term)
        c = t.group_by("term").aggregate([("term", "count")])
        return pa.table(
            {"term": c.column("term"), "n": c.column("term_count").cast(pa.int64())}
        )

    df_tbl = (
        term_rows.map_batches(df_partial, batch_format="pyarrow", batch_size=None)
        .groupby("term")
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns(["term", "dfc"]), batch_format="pyarrow"
        )
    )
    staged_df = staged_nonempty(df_tbl)
    if staged_df is None:  # empty corpus
        return term_rows  # zero rows, stable schema
    joined = hash_join(term_rows, staged_df, on=["term"])

    def score(t: pa.Table) -> pa.Table:
        tf = t.column("tfc").to_numpy(zero_copy_only=False) / t.column(
            "dlen"
        ).to_numpy(zero_copy_only=False)
        idf = np.log(n_docs / t.column("dfc").to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "term": t.column("term"),
                "tfidf": pa.array(tf * idf, pa.float64()),
            }
        )

    scored = joined.map_batches(score, batch_format="pyarrow", batch_size=None)
    n_parts = default_join_partitions()

    def topk(t: pa.Table, emit_rank: bool) -> pa.Table:
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("doc_id", "ascending"),
                ("tfidf", "descending"),
                ("term", "ascending"),
            ],
        )
        t = t.take(idx)
        keys = t.column("doc_id").to_numpy(zero_copy_only=False)
        n = len(keys)
        new = np.empty(n, dtype=bool)
        if n:
            new[0] = True
            new[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(new)
        seg_id = np.cumsum(new) - 1
        rank = np.arange(n, dtype=np.int64) - starts[seg_id]
        t = t.filter(pa.array(rank < k))
        if emit_rank:
            t = t.append_column("rank", pa.array(rank[rank < k] + 1, pa.int64()))
        return t

    def partial(t: pa.Table) -> pa.Table:
        t = topk(t, emit_rank=False)
        return t.append_column("__part", part_column(t, ["doc_id"], n_parts))

    def final(g: pa.Table) -> pa.Table:
        t = topk(g.drop_columns("__part"), emit_rank=True)
        return _round_col(t, "tfidf", 4)

    return (
        scored.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(final, batch_format="pyarrow")
    )


def _doc_term_rows(t: pa.Table) -> pa.Table:
    """documents batch -> distinct (doc_id, term, tfc, dlen) rows —
    fully vectorized (Arrow regex split + C++ group_by count; utf8_lower
    matches str.lower / DuckDB lower on this corpus: all utf8proc).
    Shared by the TF-IDF and BM25 scorers."""
    toks = pc.split_pattern_regex(
        pc.utf8_lower(t.column("text")), pattern=r"[ \t\n\r\f\v]+"
    )
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    parent = np.repeat(t.column("doc_id").to_numpy(zero_copy_only=False), lens)
    flat = toks.flatten()
    keep = pc.not_equal(flat, "")
    pairs = pa.table(
        {"doc_id": pa.array(parent, pa.int64()), "term": flat}
    ).filter(keep)
    counted = pairs.group_by(["doc_id", "term"]).aggregate([("term", "count")])
    # doc length (post-empty-filter tokens) via sorted-unique lookup
    uniq, dcounts = np.unique(
        pairs.column("doc_id").to_numpy(zero_copy_only=False), return_counts=True
    )
    cdoc = counted.column("doc_id").to_numpy(zero_copy_only=False)
    dlen = dcounts[np.searchsorted(uniq, cdoc)]
    return pa.table(
        {
            "doc_id": counted.column("doc_id"),
            "term": counted.column("term"),
            "tfc": counted.column("term_count").cast(pa.int64()),
            "dlen": pa.array(dlen, pa.int64()),
        }
    )


def _token_rows(docs: rd.Dataset) -> rd.Dataset:
    """documents -> one (term) row per token (vectorized Arrow split;
    the regex class matches the SQL oracles verbatim)."""

    def tok(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t.column("text")), pattern=r"[ \t\n\r\f\v]+"
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        return pa.table({"term": flat}).filter(pc.not_equal(flat, ""))

    return docs.map_batches(tok, batch_format="pyarrow", batch_size=None)


def text_top_terms(sf_dir: str, top_n: int = 20) -> rd.Dataset:
    """EXACT corpus-wide top-n terms by frequency: per-block partial
    counts (one row per (block, term) through the shuffle — the a3
    skew-proof shape), tiny groupby(term).sum, then the o1 partial
    top-k merge.  The exact companion of ``approx_top_terms``."""

    docs = _read(sf_dir, "documents", ["text"])

    def partial_counts(t: pa.Table) -> pa.Table:
        c = t.group_by("term").aggregate([("term", "count")])
        return pa.table(
            {"term": c.column("term"), "n": c.column("term_count").cast(pa.int64())}
        )

    counts = (
        _token_rows(docs)
        .map_batches(partial_counts, batch_format="pyarrow", batch_size=None)
        .groupby("term")
        .sum("n")
        .map_batches(lambda t: t.rename_columns(["term", "n"]), batch_format="pyarrow")
    )

    def block_top(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("n", "descending"), ("term", "ascending")]
        )
        return t.take(idx[: min(top_n, t.num_rows)])

    # per-block partial top-n, then ONE single-task merge (o1 shape)
    partials = counts.map_batches(block_top, batch_format="pyarrow", batch_size=None)
    return partials.repartition(1).map_batches(
        block_top, batch_format="pyarrow", batch_size=None
    )


def approx_top_terms(sf_dir: str, top_n: int = 20) -> pa.Table:
    """Heavy hitters with bounded state (Misra-Gries summaries —
    stages/aggregates.misra_gries_topk), DRIVER-ORACLED via the MG
    guarantee: the query runs the sketch AND the exact top-n, checks
    every exact top term against the sketch's bound (est_count <= true
    <= est_count + max_undercount; any term heavier than the global
    undercount bound must be present in the summary), and emits the
    exact counts plus a ``bound_ok`` flag.  The DuckDB oracle computes
    the same exact top-n with TRUE — a violated MG bound flips
    ``bound_ok`` and hash-fails the gate.  The bound contract is
    additionally pinned against adversarial streams in
    tests/test_heavy_hitters.py."""
    from ..stages.aggregates import misra_gries_topk

    docs = _read(sf_dir, "documents", ["text"])
    tokens = _token_rows(docs).materialize()  # two consumers (MG + exact)
    mg = misra_gries_topk(tokens, "term", top_n=top_n, capacity=4096)
    est = dict(zip(mg.column("value").to_pylist(), mg.column("est_count").to_pylist()))
    bound = int(mg.column("max_undercount")[0].as_py()) if mg.num_rows else 0

    def partial_counts(t: pa.Table) -> pa.Table:
        c = t.group_by("term").aggregate([("term", "count")])
        return pa.table(
            {"term": c.column("term"), "n": c.column("term_count").cast(pa.int64())}
        )

    def block_top(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("n", "descending"), ("term", "ascending")])
        return t.take(idx[: min(top_n, t.num_rows)])

    exact = (
        tokens.map_batches(partial_counts, batch_format="pyarrow", batch_size=None)
        .groupby("term")
        .sum("n")
        .map_batches(lambda t: t.rename_columns(["term", "n"]), batch_format="pyarrow")
        .map_batches(block_top, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(block_top, batch_format="pyarrow", batch_size=None)
        .take_all()
    )  # <= top_n rows
    ok = True
    for r in exact:
        true_n = r["n"]
        if r["term"] in est:
            lo = est[r["term"]]
            if not (lo <= true_n <= lo + bound):
                ok = False
        elif true_n > bound:
            # MG guarantee: anything heavier than the global compress
            # loss must survive in the summary
            ok = False
    return pa.table(
        {
            "term": pa.array([r["term"] for r in exact], pa.string()),
            "n": pa.array([r["n"] for r in exact], pa.int64()),
            "bound_ok": pa.array([ok] * len(exact), pa.bool_()),
        }
    )


def webtext_curation(sf_dir: str) -> rd.Dataset:
    """Full webtext curation chain (gopher -> PII -> span dedup ->
    decontaminate -> exact dedup) over the documents table; rows-only
    (each stage's math is individually oracled/tested)."""
    from ..stages.webtext import run_webtext_curation

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def split(keep_eval: bool):
        def f(t: pa.Table) -> pa.Table:
            is_eval = t.column("doc_id").to_numpy() % 50 == 0
            return t.filter(pa.array(is_eval if keep_eval else ~is_eval))

        return f

    eval_ds = docs.map_batches(split(True), batch_format="pyarrow")
    corpus = docs.map_batches(split(False), batch_format="pyarrow")
    return run_webtext_curation(corpus, eval_ds, decon_n=4).select_columns(["doc_id"])


# --- round-4 additions: new oracled operator families ---------------------

def text_quality_scores(sf_dir: str) -> rd.Dataset:
    """QualityScore heuristics surfaced with full per-signal outputs
    (mean word length, punctuation ratio, stopword ratio, blended
    score), DuckDB-oracled: every signal is re-derived in SQL from the
    same regex classes and stopword list (__ray_entry__ builds the SQL
    from textstats._STOP so the two can never drift)."""
    from ..stages.textstats import QualityScore

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def away6(x: np.ndarray) -> np.ndarray:
        # HALF-AWAY rounding to match DuckDB's ROUND: the signals are
        # count ratios with small power-of-two denominators, so exact
        # 5-at-7th-digit ties occur (0.7490625) and np.round's
        # half-EVEN tie rule diverges by 1e-6 (measured: 3 docs at
        # sf0.01).  All signals are non-negative.
        return np.floor(x * 1e6 + 0.5) / 1e6

    def out(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "mean_word_len": pa.array(
                    away6(t.column("mean_word_len").to_numpy()), pa.float64()
                ),
                "punct_ratio": pa.array(
                    away6(t.column("punct_ratio").to_numpy()), pa.float64()
                ),
                "stop_ratio": pa.array(
                    away6(t.column("stop_ratio").to_numpy()), pa.float64()
                ),
                "quality": pa.array(
                    away6(t.column("quality").to_numpy()), pa.float64()
                ),
            }
        )

    return docs.map_batches(
        QualityScore, batch_format="pyarrow", concurrency=(1, 8)
    ).map_batches(out, batch_format="pyarrow", batch_size=None)


# Fixed centroids for the ORACLED k-means assignment check: generated
# once from a pinned seed; __ray_entry__ renders the SAME literals into
# the SQL oracle, so the nearest-centroid argmin is verified end to end
# (the iterative fit itself is numpy-golden in tests/test_kmeans.py).

def fuzzy_match_parts(sf_dir: str) -> rd.Dataset:
    """Blocked fuzzy (Levenshtein) top-1 match: for each of the 20
    lowest-partkey part names, the closest OTHER part name corpus-wide
    (min edit distance, ties lexicographic).  Probes are read
    driver-side straight from the parquet file (k-sized, no Ray
    collect); the scan is the row-vectorized DP of stages/fuzzy."""
    import pyarrow.parquet as pq

    from ..stages.fuzzy import levenshtein_top1

    pt = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    ).sort_by("p_partkey")
    probes = [
        (int(k), str(n))
        for k, n in zip(
            pt.column("p_partkey").to_pylist()[:20],
            pt.column("p_name").to_pylist()[:20],
        )
    ]
    parts = _read(sf_dir, "part", ["p_name"])
    return levenshtein_top1(parts, "p_name", probes)


def chunk_documents(sf_dir: str, width: int = 200, stride: int = 150) -> rd.Dataset:
    """Overlapping fixed-width character chunking (the LLM context-window
    prep step): doc -> chunks [k*stride, k*stride+width) for k while
    k*stride < len.  Vectorized as a loop over CHUNK INDEX (bounded by
    max_len/stride), not rows: chunk k slices the whole column once via
    utf8_slice_codeunits (codepoint semantics — matches SQL substring)
    and filters rows still long enough.  Purely map-side: no shuffle,
    output streams."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def chunks(t: pa.Table) -> pa.Table:
        lens = pc.utf8_length(t.column("text")).to_numpy(zero_copy_only=False)
        if t.num_rows == 0 or lens.max() == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "chunk_id": pa.array([], pa.int64()),
                    "chunk": pa.array([], pa.string()),
                    "n_chunk_chars": pa.array([], pa.int64()),
                }
            )
        max_k = int((lens.max() - 1) // stride)
        outs = []
        for k in range(max_k + 1):
            start = k * stride
            mask = lens > start
            if not mask.any():
                break
            sub = t.filter(pa.array(mask))
            piece = pc.utf8_slice_codeunits(sub.column("text"), start, start + width)
            outs.append(
                pa.table(
                    {
                        "doc_id": sub.column("doc_id"),
                        "chunk_id": pa.array(
                            np.full(sub.num_rows, k, dtype=np.int64), pa.int64()
                        ),
                        "chunk": piece,
                        "n_chunk_chars": pc.utf8_length(piece).cast(pa.int64()),
                    }
                )
            )
        return pa.concat_tables(outs)

    return docs.map_batches(chunks, batch_format="pyarrow", batch_size=None)


def pack_token_budget(sf_dir: str, capacity: int = 256) -> rd.Dataset:
    """Token-budget sequence packing (deterministic shard assignment for
    training-data writers): docs in doc_id order fill bins of
    ``capacity`` tokens; a doc's bin = floor(exclusive-prefix-tokens /
    capacity).  The prefix sum is the distributed two-phase scan
    (stages/scan.ordered_prefix_sum) — no global sort; token counts are
    the same '\\S+' runs the SQL oracle counts."""
    from ..stages.scan import ordered_prefix_sum

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def toks(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t.column("text"), r"\S+").cast(pa.int64())
        return pa.table({"doc_id": t.column("doc_id"), "n_tokens": n})

    counted = docs.map_batches(toks, batch_format="pyarrow", batch_size=None)
    scanned = ordered_prefix_sum(counted, "doc_id", "n_tokens", alias="cum")

    def binize(t: pa.Table) -> pa.Table:
        cum = t.column("cum").to_numpy(zero_copy_only=False)
        ntok = t.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.floor((cum - ntok) / capacity).astype(np.int64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": t.column("n_tokens"),
                "bin": pa.array(b, pa.int64()),
            }
        )

    return scanned.map_batches(binize, batch_format="pyarrow", batch_size=None)


def dedup_ed1_pairs(sf_dir: str) -> rd.Dataset:
    """All part-name pairs within edit distance 1 via SymSpell-style
    deletion-neighborhood blocking (stages/fuzzy.ed1_pairs): lossless
    variant blocking -> ONE variant-hash shuffle -> bounded per-group
    pair expansion -> vectorized <=1 verification.  The all-pairs
    DP the oracle runs is O(n^2); this plan is O(n * len) rows through
    one shuffle."""
    from ..stages.fuzzy import ed1_pairs

    parts = _read(sf_dir, "part", ["p_partkey", "p_name"])
    return ed1_pairs(parts, "p_partkey", "p_name")


def text_bigram_topk(sf_dir: str, k: int = 3) -> rd.Dataset:
    """Bigram language-model head: corpus-wide bigram counts and, per
    leading word, the top-k continuations with conditional
    probabilities (count-based Markov LM training at corpus scale).
    Per-block bigram partials (consecutive filtered tokens within a
    doc, all vectorized), ONE bigram groupby merge, then a w1-hash
    partition computes per-word totals + rank-k in segment arithmetic.
    Tokenizer shared verbatim with TF-IDF/BM25 (whitespace split +
    lower + empty filter); probabilities rounded HALF-AWAY at 6 dp to
    match DuckDB ROUND on power-of-two total ties."""
    from ..stages.joins import default_join_partitions
    from ..stages.partition import part_column

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t.column("text")), pattern=r"[ \t\n\r\f\v]+"
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        parent = np.repeat(t.column("doc_id").to_numpy(zero_copy_only=False), lens)
        flat = toks.flatten()
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        parent = parent[keep]
        words = np.asarray(flat.filter(pa.array(keep)).to_pylist(), dtype=object)
        if len(words) < 2:
            return pa.table(
                {
                    "w1": pa.array([], pa.string()),
                    "w2": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        same = parent[1:] == parent[:-1]
        bt = pa.table(
            {
                "w1": pa.array(words[:-1][same], pa.string()),
                "w2": pa.array(words[1:][same], pa.string()),
            }
        )
        g = bt.group_by(["w1", "w2"]).aggregate([("w2", "count")])
        return pa.table(
            {
                "w1": g.column("w1"),
                "w2": g.column("w2"),
                "n": g.column("w2_count").cast(pa.int64()),
            }
        )

    counts = (
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["w1", "w2"])
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns(["w1", "w2", "n"]), batch_format="pyarrow"
        )
    )

    n_parts = default_join_partitions()

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, ["w1"], n_parts))

    def topk(g: pa.Table) -> pa.Table:
        g = g.drop_columns("__part")
        idx = pc.sort_indices(
            g,
            sort_keys=[("w1", "ascending"), ("n", "descending"), ("w2", "ascending")],
        )
        g = g.take(idx)
        w1 = np.asarray(g.column("w1").to_pylist(), dtype=object)
        n = g.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        m = len(w1)
        first = np.ones(m, dtype=bool)
        if m:
            first[1:] = w1[1:] != w1[:-1]
        seg_id = np.cumsum(first) - 1
        # per-segment totals and ranks, all segment arithmetic
        tot = np.zeros(seg_id[-1] + 1 if m else 0)
        np.add.at(tot, seg_id, n)
        starts = np.flatnonzero(first)
        rank = np.arange(m, dtype=np.int64) - starts[seg_id]
        p = n / tot[seg_id]
        keep = rank < k
        kept = g.filter(pa.array(keep))
        pk = p[keep]
        return pa.table(
            {
                "w1": kept.column("w1"),
                "w2": kept.column("w2"),
                "n": kept.column("n"),
                "p": pa.array(np.floor(pk * 1e6 + 0.5) / 1e6, pa.float64()),
            }
        )

    return (
        counts.map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(topk, batch_format="pyarrow")
    )


def text_top_terms_by_lang(sf_dir: str, top_n: int = 5) -> rd.Dataset:
    """Per-GROUP exact top-n terms (top vocabulary per language): the
    text_top_terms plan with the language key carried through — per
    block (lang, term) partial counts, one combine, then the o5
    rank-per-group partial top-k under a coarse lang-hash partition
    (per-group state bounded by top_n through the merge)."""
    from ..stages.joins import default_join_partitions
    from ..stages.partition import part_column

    docs = _read(sf_dir, "documents", ["lang", "text"])

    def tok(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t.column("text")), pattern=r"[ \t\n\r\f\v]+"
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        n_per = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        lang = np.repeat(
            np.asarray(t.column("lang").to_pylist(), dtype=object), n_per
        )
        flat = toks.flatten()
        tt = pa.table(
            {"lang": pa.array(lang, pa.string()), "term": flat}
        ).filter(pc.not_equal(flat, ""))
        c = tt.group_by(["lang", "term"]).aggregate([("term", "count")])
        return c.rename_columns(["lang", "term", "n"])

    n_parts = default_join_partitions()
    counts = (
        docs.map_batches(tok, batch_format="pyarrow", batch_size=None)
        .groupby(["lang", "term"])
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns(["lang", "term", "n"]),
            batch_format="pyarrow",
            batch_size=None,
        )
    )

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, ["lang"], n_parts))

    def group_top(g: pa.Table) -> pa.Table:
        g = g.drop_columns("__part").sort_by(
            [("lang", "ascending"), ("n", "descending"), ("term", "ascending")]
        )
        lang = np.asarray(g.column("lang").to_pylist(), dtype=object)
        n = len(lang)
        starts = np.flatnonzero(np.concatenate([[True], lang[1:] != lang[:-1]]))
        seg = np.zeros(n, dtype=np.int64)
        seg[starts[1:]] = 1
        seg = np.cumsum(seg)
        rank = np.arange(n, dtype=np.int64) - starts[seg]
        kept = g.filter(pa.array(rank < top_n))
        return pa.table(
            {
                "lang": kept.column("lang"),
                "term": kept.column("term"),
                "n": kept.column("n").cast(pa.int64()),
            }
        )

    return (
        counts.map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(group_top, batch_format="pyarrow")
    )


def f10_explode_tokens(sf_dir: str) -> rd.Dataset:
    """Positional explode (UNNEST WITH ORDINALITY): the first 32
    whitespace tokens of every document with their position — fully
    vectorized Arrow regex split + numpy offset arithmetic (repeat doc
    ids by list length, position = arange minus each list's start);
    empty tokens from leading/repeated separators are masked BEFORE
    positions are assigned, matching the oracle's list_filter."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    cap = 32

    def explode(t: pa.Table) -> pa.Table:
        col = t.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern_regex(col, pattern=r"\s+")
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        base = int(offsets[0]) if len(offsets) else 0
        vals = toks.values
        vnp = vals.to_numpy(zero_copy_only=False)[base:]
        counts = np.diff(offsets - base)
        did = np.repeat(
            t.column("doc_id").to_numpy(zero_copy_only=False), counts
        )
        keep = vnp != ""
        did, vnp = did[keep], vnp[keep]
        # positions within each doc's surviving token run (runs stay
        # contiguous after the mask)
        if len(did):
            new = np.empty(len(did), dtype=bool)
            new[0] = True
            new[1:] = did[1:] != did[:-1]
            starts = np.flatnonzero(new)
            runs = np.diff(np.r_[starts, len(did)])
            pos = np.arange(len(did), dtype=np.int64) - np.repeat(starts, runs)
        else:
            pos = np.empty(0, dtype=np.int64)
        inside = pos < cap
        return pa.table(
            {
                "doc_id": pa.array(did[inside], pa.int64()),
                "pos": pa.array(pos[inside], pa.int64()),
                "token": pa.array(vnp[inside], pa.string()),
            }
        )

    return docs.map_batches(explode, batch_format="pyarrow", batch_size=None)


