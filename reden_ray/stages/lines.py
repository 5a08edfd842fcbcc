"""Corpus-wide line-level boilerplate removal (CCNet / RefinedWeb-style
line dedup): a line that appears in ``>= min_docs`` DISTINCT documents
is boilerplate (nav bars, cookie banners, footers) and every occurrence
is deleted from every document.

Semantics (SQL-replayable, zero float edges):

- lines = ``text.split('\\n')`` — empty lines are preserved positions;
- a line is *eligible* when ``len(line) >= min_chars`` (raw characters,
  no trimming — DuckDB ``trim`` and Python ``strip`` disagree on
  whitespace classes, so the key is the verbatim line);
- document frequency counts DISTINCT documents (multiple occurrences
  inside one doc count once);
- output text re-joins the surviving lines with ``'\\n'`` in original
  order, plus integer ``n_lines`` / ``n_removed`` columns.

Scale shape: identical to :func:`reden_ray.stages.webtext.hot_span_hashes`
— per-block per-doc-distinct (hash, 1) partials, a coarse-partition
``groupby(__part).map_groups`` reduce (the pair-shaped-stream lesson
from CLAUDE.md), and ONE driver collect of the hot-line bank, which is
boilerplate-sized by definition (repeated across documents).  The bank
broadcasts via ``ray.put`` and the rewrite is an embarrassingly
parallel ``map_batches`` pass — no shuffle ever touches document
bodies.  If boilerplate volume itself outgrew broadcast capacity, the
flag-and-join shape of ``webtext.decontaminate_join`` applies verbatim
(hot lines stay a Dataset, line rows join on the hash, drop-lists ride
back by doc id).

Reference analogue: the reference engine has no corpus-frequency text
scrubber (its cleaning is per-page HTML extraction,
``TEICorpusReader``); this is one of the training-data operators the
engine adds beyond parity.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


def _line_hashes(lines: list[str], min_chars: int) -> np.ndarray:
    """blake2b-64 hashes of the eligible lines (len >= min_chars)."""
    b2 = hashlib.blake2b
    return np.fromiter(
        (
            int.from_bytes(b2(ln.encode(), digest_size=8).digest(), "little")
            for ln in lines
            if len(ln) >= min_chars
        ),
        dtype=np.uint64,
    )


def hot_line_hashes(
    docs: rd.Dataset,
    min_docs: int = 2,
    min_chars: int = 1,
    text_column: str = "text",
) -> np.ndarray:
    """Sorted uint64 hash bank of lines in >= ``min_docs`` distinct docs."""

    def partials(t: pa.Table) -> pa.Table:
        per_doc = [
            np.unique(_line_hashes((x or "").split("\n"), min_chars))
            for x in t.column(text_column).to_pylist()
        ]
        per_doc = [a for a in per_doc if a.size]
        merged = np.concatenate(per_doc) if per_doc else np.empty(0, np.uint64)
        u, c = np.unique(merged, return_counts=True)
        return pa.table(
            {
                "g": pa.array(u.view(np.int64), pa.int64()),
                "nd": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    from .partition import part_column
    from .webtext import _default_span_parts

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


def line_dedup(
    docs: rd.Dataset,
    min_docs: int = 2,
    min_chars: int = 1,
    text_column: str = "text",
) -> rd.Dataset:
    """Remove corpus-frequent lines from every document (see module doc)."""
    bank = hot_line_hashes(
        docs, min_docs=min_docs, min_chars=min_chars, text_column=text_column
    )
    bref = ray.put(bank)
    b2 = hashlib.blake2b

    def rewrite(t: pa.Table) -> pa.Table:
        hot: np.ndarray = ray.get(bref)
        texts = t.column(text_column).to_pylist()
        out, n_lines, n_removed = [], [], []
        for x in texts:
            lines = (x or "").split("\n")
            if hot.size:
                kept = []
                for ln in lines:
                    if len(ln) >= min_chars:
                        h = np.uint64(
                            int.from_bytes(
                                b2(ln.encode(), digest_size=8).digest(), "little"
                            )
                        )
                        i = int(np.searchsorted(hot, h))
                        if i < hot.size and hot[i] == h:
                            continue
                    kept.append(ln)
            else:
                kept = lines
            out.append("\n".join(kept))
            n_lines.append(len(lines))
            n_removed.append(len(lines) - len(kept))
        i = t.schema.get_field_index(text_column)
        t = t.set_column(i, text_column, pa.array(out, pa.string()))
        t = t.append_column("n_lines", pa.array(n_lines, pa.int64()))
        return t.append_column("n_removed", pa.array(n_removed, pa.int64()))

    return docs.map_batches(rewrite, batch_format="pyarrow", batch_size=None)
