"""Webtext curation stages: repetition/quality filters, PII redaction,
and benchmark decontamination.

All three are standard published webtext-pipeline components
(repetition fractions follow the Gopher rules, Rae et al. 2021,
arXiv:2112.11446 Table A1; the stopword/length heuristics echo C4,
Raffel et al. 2020; decontamination is the GPT-3-style n-gram overlap
check, Brown et al. 2020 Appendix C).  The reference engine has no
equivalent — these extend its curation surface for training-data work.

Ray shape:
- ``RepetitionStats`` / ``PIIRedactor`` are callable classes for
  ``map_batches(..., concurrency=(1, N))`` — compiled regexes live in
  ``__init__`` (once per actor), per-batch work is Counter/regex over
  each doc's text (text is opaque; the per-doc loop IS the kernel, and
  it runs distributed inside the batch).
- ``decontaminate`` broadcasts the eval-side n-gram hash set via
  ``ray.put`` (eval benchmarks are small by definition — MBs, not TBs)
  and flags the corpus in one embarrassingly parallel ``map_batches``
  pass; ``decontaminate_join`` is the no-small-side variant (inverted
  gram-hash inner join, same machinery as ``dedup.ngram_jaccard_pairs``)
  for eval sets too big to broadcast.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# Same tokenization as dedup._doc_word_ngrams and its DuckDB oracle:
# lowercase, split on non-alphanumeric runs, drop empties.
_TOKEN_RE = re.compile(r"[^a-z0-9]+")


def _words(text: str) -> list[str]:
    return [w for w in _TOKEN_RE.split(text.lower()) if w]


def _gram_hashes(words: list[str], n: int) -> np.ndarray:
    """Distinct word-n-gram blake2b-64 hashes (process-stable; Python
    ``hash()`` is salted and must never cross workers)."""
    if len(words) < n:
        return np.empty(0, dtype=np.uint64)
    grams = {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}
    return np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "big")
            for g in grams
        ),
        dtype=np.uint64,
        count=len(grams),
    )


# --- Gopher-style repetition / quality metrics ----------------------------

#: default keep-thresholds (Gopher Table A1, word-fraction variants)
GOPHER_DEFAULTS = {
    "max_top_2gram_frac": 0.20,
    "max_top_3gram_frac": 0.18,
    "max_top_4gram_frac": 0.16,
    "max_dup_5gram_frac": 0.30,
    "min_distinct_word_ratio": 0.20,
    "min_words": 5,
    "max_words": 1_000_000,
    "min_mean_word_len": 2.0,
    "max_mean_word_len": 12.0,
    "max_symbol_word_ratio": 0.5,
}


class RepetitionStats:
    """Per-document repetition/quality metrics + a ``keep`` verdict.

    Emits (id, n_words, distinct_word_ratio, top_{2,3,4}gram_frac,
    dup_5gram_frac, mean_word_len, symbol_word_ratio, keep):

    - ``top_Ngram_frac``: fraction of the doc's words covered by the
      single most frequent word N-gram (count * N / n_words);
    - ``dup_5gram_frac``: fraction of words covered by 5-grams that
      occur more than once;
    - ``symbol_word_ratio``: '#'/'...'/symbol characters per word.

    Thresholds are constructor kwargs (defaults = ``GOPHER_DEFAULTS``).
    """

    def __init__(
        self,
        id_column: str = "doc_id",
        text_column: str = "text",
        **thresholds,
    ) -> None:
        unknown = set(thresholds) - set(GOPHER_DEFAULTS)
        if unknown:
            raise ValueError(f"unknown thresholds: {sorted(unknown)}")
        self.th = {**GOPHER_DEFAULTS, **thresholds}
        self.id_column = id_column
        self.text_column = text_column
        self._symbol_re = re.compile(r"[#@\\{}<>^~|]|\.\.\.")

    @staticmethod
    def _top_frac(words: list[str], n: int) -> float:
        """Fraction of words covered by the most frequent n-gram —
        0.0 when the top gram occurs only once (no repetition to
        penalize; the raw Gopher char-fraction is calibrated for long
        web documents where a singleton gram is negligible, but the
        word-fraction floor n/len(words) would wrongly trip short
        docs)."""
        if len(words) < n:
            return 0.0
        counts = Counter(tuple(words[i : i + n]) for i in range(len(words) - n + 1))
        c = counts.most_common(1)[0][1]
        if c == 1:
            return 0.0
        return min(1.0, c * n / len(words))

    @staticmethod
    def _dup_frac(words: list[str], n: int) -> float:
        if len(words) < n:
            return 0.0
        counts = Counter(tuple(words[i : i + n]) for i in range(len(words) - n + 1))
        dup = sum(c * n for c in counts.values() if c > 1)
        return min(1.0, dup / len(words))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_column)
        texts = batch.column(self.text_column).to_pylist()
        cols: dict[str, list] = {
            "n_words": [], "distinct_word_ratio": [], "top_2gram_frac": [],
            "top_3gram_frac": [], "top_4gram_frac": [], "dup_5gram_frac": [],
            "mean_word_len": [], "symbol_word_ratio": [], "keep": [],
        }
        th = self.th
        for text in texts:
            ws = _words(text or "")
            nw = len(ws)
            if nw == 0:
                row = dict.fromkeys(cols, 0.0)
                row["n_words"] = 0
                row["keep"] = False
            else:
                row = {
                    "n_words": nw,
                    "distinct_word_ratio": len(set(ws)) / nw,
                    "top_2gram_frac": self._top_frac(ws, 2),
                    "top_3gram_frac": self._top_frac(ws, 3),
                    "top_4gram_frac": self._top_frac(ws, 4),
                    "dup_5gram_frac": self._dup_frac(ws, 5),
                    "mean_word_len": sum(map(len, ws)) / nw,
                    "symbol_word_ratio": len(self._symbol_re.findall(text)) / nw,
                }
                row["keep"] = (
                    th["min_words"] <= nw <= th["max_words"]
                    and row["distinct_word_ratio"] >= th["min_distinct_word_ratio"]
                    and row["top_2gram_frac"] <= th["max_top_2gram_frac"]
                    and row["top_3gram_frac"] <= th["max_top_3gram_frac"]
                    and row["top_4gram_frac"] <= th["max_top_4gram_frac"]
                    and row["dup_5gram_frac"] <= th["max_dup_5gram_frac"]
                    and th["min_mean_word_len"] <= row["mean_word_len"] <= th["max_mean_word_len"]
                    and row["symbol_word_ratio"] <= th["max_symbol_word_ratio"]
                )
            for k, v in row.items():
                cols[k].append(v)
        out = {self.id_column: ids, "n_words": pa.array(cols["n_words"], pa.int64())}
        for k in ("distinct_word_ratio", "top_2gram_frac", "top_3gram_frac",
                  "top_4gram_frac", "dup_5gram_frac", "mean_word_len",
                  "symbol_word_ratio"):
            out[k] = pa.array(cols[k], pa.float64())
        out["keep"] = pa.array(cols["keep"], pa.bool_())
        return pa.table(out)


def gopher_filter(docs: rd.Dataset, text_column: str = "text",
                  id_column: str = "doc_id", **thresholds) -> rd.Dataset:
    """Keep only docs passing the repetition rules — original columns
    preserved (metrics computed inline, rows filtered, stats dropped)."""
    stats = RepetitionStats(id_column=id_column, text_column=text_column, **thresholds)

    def flt(batch: pa.Table) -> pa.Table:
        keep = stats(batch).column("keep")
        return batch.filter(keep)

    return docs.map_batches(flt, batch_format="pyarrow", batch_size=None)


# --- PII redaction ---------------------------------------------------------

class PIIRedactor:
    """Redacts emails / phone-like digit runs / IPv4 addresses, emitting
    the scrubbed text plus per-kind match counts.  Patterns are the
    standard conservative published shapes; compiled once per actor."""

    EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    IPV4 = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
    PHONE = r"(?<!\d)(?:\+?\d[\s().-]?){7,14}\d(?!\d)"

    def __init__(self, id_column: str = "doc_id", text_column: str = "text") -> None:
        self.id_column = id_column
        self.text_column = text_column
        # order matters: emails contain dots/digits; scrub them first,
        # then IPs (dotted digits), then bare phone runs.
        self._subs = [
            ("n_emails", re.compile(self.EMAIL), "<EMAIL>"),
            ("n_ips", re.compile(self.IPV4), "<IP>"),
            ("n_phones", re.compile(self.PHONE), "<PHONE>"),
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        counts = {k: [] for k, _, _ in self._subs}
        redacted = []
        for text in texts:
            t = text or ""
            for key, rx, token in self._subs:
                t, n = rx.subn(token, t)
                counts[key].append(n)
            redacted.append(t)
        out = {
            self.id_column: batch.column(self.id_column),
            "text": pa.array(redacted, pa.string()),
        }
        for k in counts:
            out[k] = pa.array(counts[k], pa.int64())
        return pa.table(out)


# --- decontamination -------------------------------------------------------

def decontaminate(
    corpus: rd.Dataset,
    eval_ds: rd.Dataset,
    n: int = 13,
    id_column: str = "doc_id",
    text_column: str = "text",
    drop: bool = False,
) -> rd.Dataset:
    """Flag (or drop) corpus docs sharing any word ``n``-gram with the
    eval set — the GPT-3 decontamination rule (13-gram overlap).

    Eval benchmarks are small (≤ millions of grams): the distinct gram
    hashes are reduced on the driver and broadcast ONCE via ``ray.put``;
    every corpus task then runs a vectorized ``np.isin`` per doc.  The
    corpus side streams — no shuffle, no materialization.  For an eval
    side too large to broadcast use :func:`decontaminate_join`.

    Returns corpus rows + int64 ``contaminated`` (0/1), or the clean
    subset when ``drop=True``.
    """
    import ray

    def eval_grams(t: pa.Table) -> pa.Table:
        hs: list[np.ndarray] = [
            _gram_hashes(_words(x or ""), n) for x in t.column(text_column).to_pylist()
        ]
        merged = np.unique(np.concatenate(hs)) if hs else np.empty(0, np.uint64)
        return pa.table({"g": pa.array(merged, pa.uint64())})

    # per-block distinct gram hashes -> one small driver reduce (the
    # eval set is the SMALL side by contract; corpus never collects).
    # take_all yields ROWS (one uint64 per row), not blocks.
    rows = eval_ds.map_batches(eval_grams, batch_format="pyarrow",
                               batch_size=None).take_all()
    all_h = np.unique(
        np.fromiter((r["g"] for r in rows), dtype=np.uint64, count=len(rows))
    )
    href = ray.put(all_h)

    def flag(batch: pa.Table) -> pa.Table:
        bank = ray.get(href)
        flags = []
        for x in batch.column(text_column).to_pylist():
            hs = _gram_hashes(_words(x or ""), n)
            # bank is sorted -> searchsorted membership, no set build
            if hs.size and bank.size:
                idx = np.searchsorted(bank, hs)
                idx[idx == bank.size] = 0
                hit = bool(np.any(bank[idx] == hs))
            else:
                hit = False
            flags.append(1 if hit else 0)
        col = pa.array(flags, pa.int64())
        if drop:
            return batch.filter(pc.equal(col, 0))
        return batch.append_column("contaminated", col)

    return corpus.map_batches(flag, batch_format="pyarrow", batch_size=None)


def decontaminate_join(
    corpus: rd.Dataset,
    eval_ds: rd.Dataset,
    n: int = 13,
    id_column: str = "doc_id",
    text_column: str = "text",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """No-broadcast decontamination: inverted gram-hash inner join.

    Both sides emit distinct ``(g, id)`` rows; one hash join on ``g``
    + a distinct on the corpus id yields the contaminated-id Dataset;
    the flag rides back onto the corpus via a left join.  This is the
    eval-side-also-huge path (e.g. decontaminating against another
    corpus); at normal benchmark sizes prefer :func:`decontaminate`.
    """
    from .joins import default_join_partitions, hash_join, staged_nonempty
    from .partition import part_column

    n_parts = num_partitions or default_join_partitions()

    def gram_rows(col_id: str):
        def f(t: pa.Table) -> pa.Table:
            ids, gs = [], []
            id_vals = t.column(id_column).to_pylist()
            for i, x in enumerate(t.column(text_column).to_pylist()):
                hs = _gram_hashes(_words(x or ""), n)
                gs.append(hs)
                ids.extend([id_vals[i]] * hs.size)
            merged = np.concatenate(gs) if gs else np.empty(0, np.uint64)
            return pa.table(
                {
                    # uint64 -> int64 bitcast: Ray joins want signed keys
                    "g": pa.array(merged.view(np.int64), pa.int64()),
                    col_id: pa.array(ids, pa.int64()),
                }
            )

        return f

    cg = staged_nonempty(
        corpus.map_batches(gram_rows("corpus_id"), batch_format="pyarrow",
                           batch_size=None)
    )
    eg = staged_nonempty(
        eval_ds.map_batches(gram_rows("eval_id"), batch_format="pyarrow",
                            batch_size=None).map_batches(
            lambda t: t.select(["g"]), batch_format="pyarrow"
        )
    )
    ids_only = corpus.map_batches(
        lambda t: t.select([id_column]), batch_format="pyarrow"
    )
    if cg is None or eg is None:
        return ids_only.map_batches(
            lambda t: t.append_column(
                "contaminated", pa.array([0] * t.num_rows, pa.int64())
            ),
            batch_format="pyarrow",
        )
    hits = (
        hash_join(cg, eg, on=["g"], num_partitions=n_parts)
        .map_batches(
            lambda t: t.select(["corpus_id"]).rename_columns([id_column]),
            batch_format="pyarrow",
        )
        .groupby(id_column)
        .count()
        .map_batches(lambda t: t.select([id_column]), batch_format="pyarrow")
    )
    hits = staged_nonempty(hits)
    if hits is None:
        return ids_only.map_batches(
            lambda t: t.append_column(
                "contaminated", pa.array([0] * t.num_rows, pa.int64())
            ),
            batch_format="pyarrow",
        )
    joined = hash_join(
        ids_only,
        hits.map_batches(
            lambda t: t.append_column(
                "contaminated", pa.array([1] * t.num_rows, pa.int64())
            ),
            batch_format="pyarrow",
        ),
        on=[id_column],
        how="left_outer",
        num_partitions=n_parts,
    )
    return joined.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("contaminated"),
            "contaminated",
            pc.fill_null(t.column("contaminated"), 0),
        ),
        batch_format="pyarrow",
    )


# --- repeated-span removal (C4/CCNet-style) --------------------------------

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)


def _default_span_parts() -> int:
    """Coarse-partition count for the span-count reduce: a task-pool
    map_groups over pre-combined partials — CPU-sized, never the
    join-aggregator shape (joins.default_join_partitions rationale)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(4, cpus // 2)


def _span_hash_blocks(ws_list: list[list[str]], n: int) -> list[np.ndarray]:
    """uint64 span hashes per doc, vectorized across the whole block.

    Per-token blake2b runs once per UNIQUE token in the block (vocab-
    bounded Python work); each non-overlapping n-token span then combines
    its token hashes with an order-sensitive fmix64 chain finalized with
    the span length — all spans of the block in n vectorized passes
    instead of a per-span hashlib call (the r4 VERDICT hot spot).
    Process-stable (blake2b + fmix64, never Python hash), so bank and
    lookup agree across workers."""
    from .dedup import _fmix64

    D = len(ws_list)
    doc_lens = np.fromiter((len(w) for w in ws_list), dtype=np.int64, count=D)
    total = int(doc_lens.sum())
    spans_per_doc = (doc_lens + n - 1) // n
    span_starts = np.concatenate([[0], np.cumsum(spans_per_doc)[:-1]]).astype(np.int64)
    if total == 0:
        return [np.empty(0, np.uint64) for _ in ws_list]
    flat = np.empty(total, dtype=object)
    pos = 0
    for ws in ws_list:
        flat[pos : pos + len(ws)] = ws
        pos += len(ws)
    uniq, inv = np.unique(flat, return_inverse=True)
    uh = np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(u.encode(), digest_size=8).digest(), "big")
            for u in uniq
        ),
        dtype=np.uint64,
        count=len(uniq),
    )
    tok_h = uh[inv]
    doc_starts = np.concatenate([[0], np.cumsum(doc_lens)[:-1]]).astype(np.int64)
    tok_doc = np.repeat(np.arange(D), doc_lens)
    pos_in_doc = np.arange(total) - doc_starts[tok_doc]
    span_gid = span_starts[tok_doc] + pos_in_doc // n
    pos_in_span = pos_in_doc % n
    total_spans = int(spans_per_doc.sum())
    h = np.full(total_spans, _FNV_OFFSET, dtype=np.uint64)
    for j in range(n):
        sel = pos_in_span == j
        if not sel.any():
            break
        g = span_gid[sel]
        h[g] = _fmix64(h[g] ^ tok_h[sel])
    span_len = np.bincount(span_gid, minlength=total_spans).astype(np.uint64)
    h = _fmix64(h ^ span_len)
    return [
        h[span_starts[d] : span_starts[d] + spans_per_doc[d]] for d in range(D)
    ]


def hot_span_hashes(
    docs: rd.Dataset,
    n: int = 5,
    min_docs: int = 2,
    id_column: str = "doc_id",
    text_column: str = "text",
) -> np.ndarray:
    """Corpus-wide repeated-span discovery: chunk every doc into
    consecutive non-overlapping ``n``-word spans (tail kept as a short
    final span) and return the blake2b-64 hashes of spans appearing in
    ``>= min_docs`` DISTINCT documents.

    Plan: per-block doc-distinct (hash, 1) partials -> one corpus-wide
    ``groupby(g).sum`` (docs are single rows, so per-block distinct is
    per-doc distinct) -> filter ``>= min_docs``.  The survivor set is
    boilerplate by definition (repeated across documents) — orders of
    magnitude smaller than the corpus — and is the only thing reduced
    to the driver.
    """

    def partials(t: pa.Table) -> pa.Table:
        ws_list = [_words(x or "") for x in t.column(text_column).to_pylist()]
        # per-doc distinct spans (docs are single rows) via np.unique
        hs = [np.unique(a) for a in _span_hash_blocks(ws_list, n) if a.size]
        merged = np.concatenate(hs) if hs else np.empty(0, np.uint64)
        # block-local combine: same span in many docs of this block
        # collapses to one row carrying its doc count
        u, c = np.unique(merged, return_counts=True)
        return pa.table(
            {
                "g": pa.array(u.view(np.int64), pa.int64()),
                "nd": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    # coarse-partition reduce instead of the native sort-based groupby:
    # the partial stream is corpus-unique-span-sized, and the measured
    # fixed cost of groupby(int_key).sum at this shape is ~2 s at sf0.1
    # where the part_column + arrow group_by reduce is sub-second
    # (CLAUDE.md round-4 note; same swap as the linkpred pair reduce)
    from .partition import part_column

    n_parts = _default_span_parts()

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, ["g"], n_parts))

    def reduce_part(t: pa.Table) -> pa.Table:
        r = (
            t.drop_columns("__part")
            .group_by("g")
            .aggregate([("nd", "sum")])
            .rename_columns(["g", "nd"])
        )
        return r.filter(pc.greater_equal(r.column("nd"), int(min_docs)))

    hot = (
        docs.map_batches(partials, batch_format="pyarrow", batch_size=None)
        .map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(reduce_part, batch_format="pyarrow")
    )
    # boilerplate-sized by contract; collected once for the broadcast
    rows = hot.take_all()
    return np.sort(
        np.fromiter((r["g"] for r in rows), dtype=np.int64, count=len(rows)).view(
            np.uint64
        )
    )


#: token matcher over ORIGINAL text for preserve_text mode — ASCII
#: alnum runs, case-insensitive, so token POSITIONS line up with the
#: ``_words(text.lower())`` tokens used for span discovery (exotic
#: Unicode whose case-fold changes character class may diverge; the
#: hash bank is keyed on the lowered token text either way)
_TOKEN_POS_RE = re.compile(r"[A-Za-z0-9]+")


def span_dedup(
    docs: rd.Dataset,
    n: int = 5,
    min_docs: int = 2,
    id_column: str = "doc_id",
    text_column: str = "text",
    preserve_text: bool = False,
) -> rd.Dataset:
    """C4/CCNet-style repeated-content removal: every occurrence of a
    span repeated across ``>= min_docs`` documents is deleted from every
    document (C4 §2.2 removes repeated three-sentence spans; CCNet drops
    duplicated paragraphs — same shape, word-window units here since the
    corpus carries no sentence/line structure).

    Output text: by default surviving spans are re-joined in order as
    lowercase token-normalized text (exactly reconstructible in SQL —
    the ``c4_span_dedup`` oracle's form).  With ``preserve_text=True``
    the flagged spans are excised from the ORIGINAL string by character
    range instead (whitespace collapsed), keeping case, punctuation and
    redaction tokens intact — the mode the composite curation chain
    uses so a later/earlier PII pass survives.

    The hot-span hash bank is broadcast once via ``ray.put`` and the
    rewrite is one embarrassingly parallel ``map_batches`` pass — no
    shuffle touches document bodies.  For a corpus where boilerplate
    volume itself exceeds broadcast capacity, the flag-and-join shape of
    :func:`decontaminate_join` applies verbatim (hot spans stay a
    Dataset, chunk rows join on ``g``, drop-lists ride back by doc id).
    """
    import ray

    bank = hot_span_hashes(
        docs, n=n, min_docs=min_docs, id_column=id_column, text_column=text_column
    )
    bref = ray.put(bank)

    def _keep_mask(hot: np.ndarray, hs: np.ndarray) -> np.ndarray:
        if not hot.size:
            return np.ones(len(hs), dtype=bool)
        idx = np.searchsorted(hot, hs)
        idx[idx == hot.size] = 0
        return hot[idx] != hs

    ws_collapse = re.compile(r"\s+")

    def rewrite(t: pa.Table) -> pa.Table:
        hot = ray.get(bref)
        texts = t.column(text_column).to_pylist()
        if preserve_text:
            toks_list = [list(_TOKEN_POS_RE.finditer(x or "")) for x in texts]
            ws_list = [[m.group().lower() for m in ms] for ms in toks_list]
        else:
            ws_list = [_words(x or "") for x in texts]
        per_doc = _span_hash_blocks(ws_list, n)
        out = []
        for di, x in enumerate(texts):
            x = x or ""
            ws = ws_list[di]
            if not ws:
                out.append("")
                continue
            keep = _keep_mask(hot, per_doc[di])
            if preserve_text:
                toks = toks_list[di]
                res, pos = [], 0
                for si in np.flatnonzero(~keep):
                    c0 = toks[si * n]
                    c1 = toks[min((si + 1) * n, len(toks)) - 1]
                    res.append(x[pos : c0.start()])
                    pos = c1.end()
                res.append(x[pos:])
                out.append(ws_collapse.sub(" ", "".join(res)).strip())
            else:
                tk = np.repeat(keep, n)[: len(ws)]
                out.append(" ".join(w for w, k in zip(ws, tk) if k))
        i = t.schema.get_field_index(text_column)
        return t.set_column(i, text_column, pa.array(out, pa.string()))

    return docs.map_batches(rewrite, batch_format="pyarrow", batch_size=None)


# --- composite curation pipeline ------------------------------------------

def run_webtext_curation(
    docs: rd.Dataset,
    eval_ds: rd.Dataset | None = None,
    *,
    span_n: int = 5,
    decon_n: int = 13,
    id_column: str = "doc_id",
    text_column: str = "text",
    collect_stats: bool = False,
    **gopher_thresholds,
):
    """The full webtext curation chain in one call, ordered the way the
    published pipelines order it (C4/Gopher/GPT-3):

    1. Gopher repetition/quality filter (drop boilerplate-heavy docs);
    2. PII redaction (rewrite text, keep rows);
    3. repeated-span removal (strip cross-doc boilerplate spans);
    4. benchmark decontamination (drop eval-overlapping docs) when an
       ``eval_ds`` is supplied;
    5. exact dedup on the post-rewrite text (catches docs that became
       identical after span removal).

    Everything streams: steps 1/2 are embarrassingly parallel map
    stages, steps 3/5 shuffle only hashes/ids, step 4 broadcasts the
    eval-gram bank.  With ``collect_stats=True`` the return value is
    ``(clean_docs, stats)`` where stats is a small pa.Table of per-stage
    surviving-row counts — each count() is a barrier, so leave it off
    for production runs and read lineage from the checkpoint manifest
    instead.
    """
    from .dedup import exact_dedup

    stages: list[tuple[str, rd.Dataset]] = [("input", docs)]

    cur = gopher_filter(
        docs, text_column=text_column, id_column=id_column, **gopher_thresholds
    )
    stages.append(("gopher_filter", cur))

    redactor = PIIRedactor(id_column=id_column, text_column=text_column)

    def redact(batch: pa.Table) -> pa.Table:
        out = redactor(batch)
        # keep original non-text columns, swap in the scrubbed text
        i = batch.schema.get_field_index(text_column)
        return batch.set_column(i, text_column, out.column("text"))

    cur = cur.map_batches(redact, batch_format="pyarrow", batch_size=None)
    stages.append(("pii_redact", cur))

    # span_dedup reads its input twice (hot-span discovery + rewrite):
    # stage the filtered+redacted corpus once so the map stages above
    # don't re-execute — the same justified two-consumer staging point
    # as curation.checkpoint_dir (swap for a parquet checkpoint when
    # the staged corpus exceeds object-store capacity).
    cur = cur.materialize()
    cur = span_dedup(
        cur, n=span_n, id_column=id_column, text_column=text_column,
        preserve_text=True,  # keep case/punct/<EMAIL> tokens intact
    )
    stages.append(("span_dedup", cur))

    if eval_ds is not None:
        cur = decontaminate(
            cur, eval_ds, n=decon_n, id_column=id_column,
            text_column=text_column, drop=True,
        )
        stages.append(("decontaminate", cur))

    cur = exact_dedup(cur, column=text_column, id_column=id_column)
    stages.append(("exact_dedup", cur))

    if not collect_stats:
        return cur
    stats = pa.table(
        {
            "stage": pa.array([n for n, _ in stages], pa.string()),
            "rows": pa.array([d.count() for _, d in stages], pa.int64()),
        }
    )
    return cur, stats
