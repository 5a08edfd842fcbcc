"""Serving-side text preparation kernels: context-length truncation
and deterministic corpus splitting.

``truncate_tokens`` caps every document at ``max_tokens`` whitespace
tokens, CHAR-EXACTLY: the output text is the verbatim prefix of the
input ending at the Nth token's last character (interior whitespace
runs preserved, trailing run dropped).  SQL-replayable via the
token/separator factoring pattern (CLAUDE.md round-5): text =
sep[1]·tok[1]·…·tok[n]·sep[n+1] with ``regexp_extract_all`` and
``string_split_regex`` on the SAME explicit class — the prefix length
is ``sum(len(sep_i) + len(tok_i), i <= N)``.  The whitespace class is
written out (``[ \\t\\n\\r\\f]``) because Python ``\\s`` is
unicode-wide while RE2's is ASCII.

``hash_split`` assigns every document a deterministic train/valid/test
split by an md5 draw on 1/1000 ticks — the standard hash-split (stable
under corpus growth: a doc's split never changes when other docs are
added, unlike rank-based splits).

Both are single embarrassingly parallel ``map_batches`` passes.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import ray.data as rd

_TOK_RE = re.compile(r"[^ \t\n\r\f]+")


def truncate_tokens(
    docs: rd.Dataset,
    max_tokens: int = 32,
    id_column: str = "doc_id",
    text_column: str = "text",
) -> rd.Dataset:
    """(doc_id, text, n_tokens, truncated) — text cut after the
    ``max_tokens``-th whitespace token (module doc)."""

    def cut(t: pa.Table) -> pa.Table:
        out, n_tokens, truncated = [], [], []
        for x in t.column(text_column).to_pylist():
            x = x or ""
            ends = [m.end() for m in _TOK_RE.finditer(x)]
            n_tokens.append(len(ends))
            if len(ends) > max_tokens:
                out.append(x[: ends[max_tokens - 1]])
                truncated.append(1)
            else:
                out.append(x)
                truncated.append(0)
        i = t.schema.get_field_index(text_column)
        t = t.set_column(i, text_column, pa.array(out, pa.string()))
        t = t.append_column("n_tokens", pa.array(n_tokens, pa.int64()))
        return t.append_column("truncated", pa.array(truncated, pa.int64()))

    return docs.map_batches(cut, batch_format="pyarrow", batch_size=None)


def hash_split(
    docs: rd.Dataset,
    valid_ticks: int = 10,
    test_ticks: int = 20,
    id_column: str = "doc_id",
) -> rd.Dataset:
    """Append a ``split`` column: draw = ``LE64(md5('sp:' || id)[0:8])
    % 1000``; ``valid`` below ``valid_ticks``, ``test`` below
    ``valid_ticks + test_ticks``, else ``train``."""
    md5 = hashlib.md5

    def assign(t: pa.Table) -> pa.Table:
        ids = t.column(id_column).to_numpy(zero_copy_only=False).astype(np.int64)
        draw = np.fromiter(
            (
                int.from_bytes(md5(f"sp:{i}".encode()).digest()[:8], "little") % 1000
                for i in ids
            ),
            dtype=np.int64,
            count=len(ids),
        )
        split = np.where(
            draw < valid_ticks,
            "valid",
            np.where(draw < valid_ticks + test_ticks, "test", "train"),
        )
        return t.append_column("split", pa.array(split.tolist(), pa.string()))

    return docs.map_batches(assign, batch_format="pyarrow", batch_size=None)


def stratified_split(
    docs: rd.Dataset,
    val_pct: int = 10,
    test_pct: int = 10,
    source_column: str = "source",
    id_column: str = "doc_id",
    n_buckets: int = 256,
) -> rd.Dataset:
    """Exact-count per-source train/val/test split: within each source,
    documents rank by ``LE64(md5('strat:' || source || ':' || id))``
    and the first ``ceil(pct% * n_source)`` ranks go to val, the next
    block to test, the rest to train — EXACT per-source counts, unlike
    ``hash_split``'s proportional-in-expectation draw (the trade-off:
    rank splits reshuffle when the corpus grows; hash splits don't).
    Counts use integer arithmetic only (``(n*pct + 99) // 100``) — no
    float ceil knife edges against the SQL oracle.

    Scale shape: the grouped two-pass scan (``stages/ordering.py``):
    per-(source, key-top-bits) cell counts collect once (bounded:
    sources x ``n_buckets`` rows), become per-cell rank offsets +
    per-source totals, and ONE cell-hash shuffle ranks each cell
    locally.  Nothing corpus-sized reaches the driver."""
    md5 = hashlib.md5
    shift = np.uint64(64 - max(1, (n_buckets - 1).bit_length()))
    sep = "\x1f"

    def keyed(t: pa.Table) -> pa.Table:
        ids = t.column(id_column).to_numpy(zero_copy_only=False).astype(np.int64)
        srcs = t.column(source_column).to_pylist()
        keys = np.fromiter(
            (
                int.from_bytes(
                    md5(f"strat:{s}:{i}".encode()).digest()[:8], "little"
                )
                for s, i in zip(srcs, ids)
            ),
            dtype=np.uint64,
            count=len(ids),
        )
        cells = [f"{s}{sep}{int(b)}" for s, b in zip(srcs, keys >> shift)]
        return pa.table(
            {
                id_column: pa.array(ids),
                source_column: t.column(source_column),
                "__key": pa.array(keys.view(np.int64)),
                "__cell": pa.array(cells, pa.string()),
            }
        )

    keyed_ds = docs.map_batches(keyed, batch_format="pyarrow", batch_size=None)

    def partial(t: pa.Table) -> pa.Table:
        ones = pa.table(
            {
                "__cell": t.column("__cell"),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        return (
            ones.group_by("__cell").aggregate([("n", "sum")])
            .rename_columns(["__cell", "n"])
        )

    cells = (
        keyed_ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("__cell")
        .sum("n")
        .take_all()
    )  # bounded: <= n_sources * n_buckets rows
    parsed = []
    for r in cells:
        s, b = r["__cell"].rsplit(sep, 1)
        parsed.append((s, int(b), int(r["sum(n)"])))
    parsed.sort(key=lambda x: (x[0], x[1]))
    offsets: dict[str, int] = {}
    totals: dict[str, int] = {}
    for s, b, n in parsed:
        offsets[f"{s}{sep}{b}"] = totals.get(s, 0)
        totals[s] = totals.get(s, 0) + n
    import ray

    state_ref = ray.put((offsets, totals))

    def rank_group(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        offs, tots = ray.get(state_ref)
        cell = g.column("__cell")[0].as_py()
        src = cell.rsplit(sep, 1)[0]
        off, n = offs[cell], tots[src]
        n_val = (n * val_pct + 99) // 100
        n_test = (n * test_pct + 99) // 100
        order = pc.sort_indices(
            g, sort_keys=[("__key", "ascending"), (id_column, "ascending")]
        )
        g = g.take(order)
        rk = off + 1 + np.arange(g.num_rows, dtype=np.int64)
        split = np.where(
            rk <= n_val, "val", np.where(rk <= n_val + n_test, "test", "train")
        )
        return pa.table(
            {
                id_column: g.column(id_column),
                source_column: g.column(source_column),
                "split": pa.array(split.tolist(), pa.string()),
            }
        )

    return keyed_ds.groupby("__cell").map_groups(rank_group, batch_format="pyarrow")


_SENT_RE = re.compile(r"[.!?]+")
_WORD_RE = re.compile(r"[^a-z0-9]+")


def sentence_stats(
    docs: rd.Dataset, id_column: str = "doc_id", text_column: str = "text"
) -> rd.Dataset:
    """Per-document sentence statistics from the deterministic
    sentence splitter (segments between ``[.!?]+`` runs; a segment is
    a sentence iff it contains at least one ``[a-z0-9]`` word token,
    so whitespace-only fragments never count): (doc_id, n_sentences,
    max_words, first_words) — all integers (no average, per the
    integer-mean knife-edge lesson; consumers divide).  The sentence
    splitter is the text-prep stage per-sentence dedup/packing builds
    on; the oracle replays it with list_transform/list_filter."""

    def f(t: pa.Table) -> pa.Table:
        ids = t.column(id_column).to_pylist()
        texts = t.column(text_column).to_pylist()
        n_s: list[int] = []
        mx: list[int] = []
        fw: list[int] = []
        for tx in texts:
            ws = [
                sum(1 for w in _WORD_RE.split(seg.lower()) if w)
                for seg in _SENT_RE.split(tx or "")
            ]
            ws = [w for w in ws if w > 0]
            n_s.append(len(ws))
            mx.append(max(ws) if ws else 0)
            fw.append(ws[0] if ws else 0)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_sentences": pa.array(n_s, pa.int64()),
                "max_words": pa.array(mx, pa.int64()),
                "first_words": pa.array(fw, pa.int64()),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow", batch_size=None)
