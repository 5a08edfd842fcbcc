"""Distributed BPE merge training (Sennrich et al. 2016 semantics).

Tokenizer trainers (HF/sentencepiece) run BPE on an IN-MEMORY word-type
histogram; at web scale the type table itself is distributed.  This
module keeps the type table as a Dataset end to end:

1. word-type histogram: one corpus pass -> (word, wcount) groupby
   (types, not occurrences, flow through every later step);
2. per merge iteration:
   - adjacent-pair statistics: per-block vectorized pair extraction
     over the CURRENT segmentations weighted by wcount, block-local
     combine, one (left, right) groupby, per-block partial top-1 and a
     single-row final reduce (the argmax row is the only thing the
     driver ever sees);
   - merge application: broadcast the winning (left, right) into a
     map_batches that rewrites every type's token list with numpy
     run-parity overlap resolution (greedy left-to-right, matching the
     reference semantics: "aaa" + (a,a) -> ["aa", "a"]) — no per-row
     Python in the merge apply.

Pair-count semantics are Sennrich's: every adjacent POSITION counts
(overlapping pairs included in statistics), merges apply non-overlapping
greedy-left.  Ties break (count DESC, left ASC, right ASC).

K merges cost K tiny pair shuffles + K maps over the type table — the
corpus is read ONCE.  Iteration state (current segmentation) lives in
the Dataset, re-materialized per round (spillable, block-distributed).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def word_type_table(
    docs: rd.Dataset, text_col: str = "text", min_count: int = 1
) -> rd.Dataset:
    """(word, wcount) histogram over the whitespace-lower tokenizer
    (shared verbatim with TF-IDF/BM25/PMI/vocab)."""

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t.column(text_col)), pattern=r"[ \t\n\r\f\v]+"
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        flat = flat.filter(pc.not_equal(flat, ""))
        if len(flat) == 0:
            return pa.table(
                {"word": pa.array([], pa.string()), "wcount": pa.array([], pa.int64())}
            )
        g = pa.table({"word": flat}).group_by(["word"]).aggregate([([], "count_all")])
        return pa.table(
            {"word": g.column("word"), "wcount": g.column("count_all").cast(pa.int64())}
        )

    out = (
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("word")
        .sum("wcount")
        .map_batches(
            lambda t: t.rename_columns(["word", "wcount"]),
            batch_format="pyarrow",
            batch_size=None,
        )
    )
    if min_count > 1:
        out = out.map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("wcount"), min_count)),
            batch_format="pyarrow",
            batch_size=None,
        )
    return out


def _segment_chars(t: pa.Table) -> pa.Table:
    """Initial segmentation: one single-character token per codepoint."""
    words = t.column("word").to_pylist()
    toks = pa.array([list(w) for w in words], pa.list_(pa.string()))
    return pa.table(
        {"toks": toks, "wcount": t.column("wcount").cast(pa.int64())}
    )


def _flat(t: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(flat tokens object array, row id per token, wcount per row)."""
    toks = t.column("toks").combine_chunks()
    offs = toks.offsets.to_numpy()
    lens = np.diff(offs)
    flat_arr = toks.values.to_numpy(zero_copy_only=False)
    # honor a possibly-sliced ListArray (nonzero array offset)
    flat_arr = flat_arr[offs[0] : offs[-1]]
    rows = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    return np.asarray(flat_arr, dtype=object), rows, lens


def _pair_partial(t: pa.Table) -> pa.Table:
    flat, rows, _lens = _flat(t)
    wc = t.column("wcount").to_numpy(zero_copy_only=False)
    empty = pa.table(
        {
            "left": pa.array([], pa.string()),
            "right": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )
    if len(flat) < 2:
        return empty
    same = rows[1:] == rows[:-1]
    if not same.any():
        return empty
    pt = pa.table(
        {
            "left": pa.array(flat[:-1][same], pa.string()),
            "right": pa.array(flat[1:][same], pa.string()),
            "n": pa.array(wc[rows[:-1][same]], pa.int64()),
        }
    )
    g = pt.group_by(["left", "right"]).aggregate([("n", "sum")])
    return g.rename_columns(["left", "right", "n"])


def _block_top1(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return t
    return t.sort_by(
        [("n", "descending"), ("left", "ascending"), ("right", "ascending")]
    ).slice(0, 1)


def _best_pair(seg: rd.Dataset) -> tuple[str, str, int] | None:
    """Global argmax pair: per-block partials, one pair groupby, then a
    block-local top-1 + single-row final reduce."""
    merged = (
        seg.map_batches(_pair_partial, batch_format="pyarrow", batch_size=None)
        .groupby(["left", "right"])
        .sum("n")
        .map_batches(
            lambda t: _block_top1(t.rename_columns(["left", "right", "n"])),
            batch_format="pyarrow",
            batch_size=None,
        )
        .repartition(1)
        .map_batches(_block_top1, batch_format="pyarrow", batch_size=None)
    )
    rows = merged.take_all()  # exactly one row by construction
    if not rows:
        return None
    r = rows[0]
    return str(r["left"]), str(r["right"]), int(r["n"])


def _apply_merge(left: str, right: str):
    """Vectorized greedy-left merge rewrite for one (left, right)."""

    def apply(t: pa.Table) -> pa.Table:
        flat, rows, lens = _flat(t)
        wc = t.column("wcount").to_numpy(zero_copy_only=False)
        n = len(flat)
        if n < 2:
            return t
        cand = np.flatnonzero(
            (flat[:-1] == left) & (flat[1:] == right) & (rows[:-1] == rows[1:])
        )
        if len(cand) == 0:
            return t
        # greedy left-to-right: inside each run of consecutive candidate
        # positions, keep alternating ones (parity within the run)
        run_start = np.flatnonzero(
            np.concatenate([[True], cand[1:] != cand[:-1] + 1])
        )
        run_id = np.cumsum(
            np.concatenate([[True], cand[1:] != cand[:-1] + 1])
        ) - 1
        pos_in_run = np.arange(len(cand)) - run_start[run_id]
        kept = cand[pos_in_run % 2 == 0]
        new_flat = flat.copy()
        new_flat[kept] = left + right
        drop = np.zeros(n, dtype=bool)
        drop[kept + 1] = True
        keep_mask = ~drop
        merged_per_row = np.bincount(rows[kept], minlength=len(lens))
        new_lens = lens - merged_per_row
        offsets = np.concatenate([[0], np.cumsum(new_lens)]).astype(np.int32)
        values = pa.array(new_flat[keep_mask].tolist(), pa.string())
        toks = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), values)
        return pa.table({"toks": toks, "wcount": pa.array(wc, pa.int64())})

    return apply


def bpe_train_merges(
    docs: rd.Dataset,
    n_merges: int = 10,
    text_col: str = "text",
    min_count: int = 1,
) -> pa.Table:
    """Learn ``n_merges`` BPE merges over the corpus; returns a small
    Arrow table (rank, left, right, pair_count) — the merge table a
    tokenizer ships."""
    types = word_type_table(docs, text_col=text_col, min_count=min_count)
    seg = types.map_batches(
        _segment_chars, batch_format="pyarrow", batch_size=None
    ).materialize()
    ranks, lefts, rights, counts = [], [], [], []
    for rank in range(1, n_merges + 1):
        best = _best_pair(seg)
        if best is None or best[2] <= 0:
            break
        left, right, cnt = best
        ranks.append(rank)
        lefts.append(left)
        rights.append(right)
        counts.append(cnt)
        seg = seg.map_batches(
            _apply_merge(left, right), batch_format="pyarrow", batch_size=None
        ).materialize()
    return pa.table(
        {
            "rank": pa.array(ranks, pa.int64()),
            "left": pa.array(lefts, pa.string()),
            "right": pa.array(rights, pa.string()),
            "pair_count": pa.array(counts, pa.int64()),
        }
    )


class BpeEncode:
    """Actor-pool stage: tokenize each document with a LEARNED merge
    table (lowest-rank pair first, the standard BPE apply loop) and
    append ``n_bpe_tokens``.  The merge table is tiny by construction
    (n_merges rows) and rides in ``__init__`` once per actor; encoding
    is memoized PER WORD TYPE, so the apply loop runs once per distinct
    word an actor ever sees, not once per occurrence — the hot path per
    batch is the vectorized tokenizer + a dict lookup."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.rank = {pair: i for i, pair in enumerate(merges)}
        self.cache: dict[str, int] = {}

    def _encode_len(self, w: str) -> int:
        n = self.cache.get(w)
        if n is not None:
            return n
        s = list(w)
        while len(s) > 1:
            best_i, best_r = -1, len(self.rank)
            for i in range(len(s) - 1):
                r = self.rank.get((s[i], s[i + 1]), len(self.rank))
                if r < best_r:
                    best_i, best_r = i, r
            if best_i < 0 or best_r >= len(self.rank):
                break
            s[best_i : best_i + 2] = [s[best_i] + s[best_i + 1]]
        n = len(s)
        self.cache[w] = n
        return n

    def __call__(self, t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t.column("text")), pattern=r"[ \t\n\r\f\v]+"
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = toks.offsets.to_numpy()
        lens = np.diff(offs)
        flat = toks.values.to_numpy(zero_copy_only=False)[offs[0] : offs[-1]]
        rows = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        keep = flat != ""
        flat, rows = flat[keep], rows[keep]
        # one encode per distinct type in the batch; inverse-map back
        uniq, inv = np.unique(flat.astype(str), return_inverse=True)
        per_type = np.fromiter(
            (self._encode_len(w) for w in uniq), dtype=np.int64, count=len(uniq)
        )
        n_bpe = np.bincount(rows, weights=per_type[inv], minlength=t.num_rows)
        return t.append_column(
            "n_bpe_tokens", pa.array(n_bpe.astype(np.int64), pa.int64())
        )


def bpe_encode_docs(
    docs: rd.Dataset, merges: pa.Table, concurrency=(1, 8)
) -> rd.Dataset:
    """Append ``n_bpe_tokens`` to a documents Dataset using a trained
    merge table (output of ``bpe_train_merges``)."""
    pairs = list(
        zip(merges.column("left").to_pylist(), merges.column("right").to_pylist())
    )
    return docs.map_batches(
        BpeEncode,
        fn_constructor_args=(pairs,),
        batch_format="pyarrow",
        batch_size=None,
        concurrency=concurrency,
    )
