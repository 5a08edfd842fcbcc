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
