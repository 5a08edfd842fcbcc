"""Sequence packing — the step between curation and pretraining that
turns variable-length documents into fixed-capacity context windows.

Two standard disciplines, both over the shared whitespace token count
(``stages.textstats.TokenStats``'s ``n_tokens_ws`` kernel, so the
token semantics match every other oracled text query):

1. :func:`pack_concat_chunks` — GPT-style concat-then-chunk: documents
   are concatenated in id order into one token stream and cut into
   ``capacity``-token windows; a document may span windows.  The whole
   assignment is a function of the exclusive running token sum, so it
   distributes as ONE ordered-prefix-sum pass
   (``stages.scan.ordered_prefix_sum`` — no global sort, no driver
   loop) and is exactly SQL-replayable (window cumsum).

2. :func:`pack_next_fit` — document-boundary (no-split) packing via
   the next-fit rule: within a shard, walk documents in id order and
   open a new pack whenever the current one would overflow.  Next-fit
   state is inherently sequential, so the corpus is hash-sharded by
   ``doc_id % n_shards`` and each shard packs independently — at scale
   ``n_shards`` is sized so a shard's doc list is node-bounded (this is
   how production packers shard too; packs never cross shards by
   construction).  Oversized documents (> capacity) sit alone in their
   own pack.

Both emit integer-only columns — no float knife edges anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def _with_token_counts(docs: rd.Dataset, text_col: str, id_col: str) -> rd.Dataset:
    """(id, n_tokens) with the shared ws-token kernel, zero-token docs
    dropped (they occupy no window space by definition)."""
    from .textstats import TokenStats

    counted = docs.map_batches(TokenStats, batch_format="pyarrow", concurrency=(1, 4))

    def slim(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("n_tokens_ws"), 0))
        return pa.table(
            {
                id_col: t.column(id_col).cast(pa.int64()),
                "n_tokens": t.column("n_tokens_ws").cast(pa.int64()),
            }
        )

    return counted.map_batches(slim, batch_format="pyarrow", batch_size=None)


def pack_concat_chunks(
    docs: rd.Dataset,
    capacity: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Concat-then-chunk packing map: for each document (in ``id_col``
    order) the window range it lands in after the corpus is
    concatenated and cut every ``capacity`` tokens.

    Columns: id, ``n_tokens``, ``start_offset`` (exclusive running
    sum), ``first_chunk`` / ``last_chunk`` (window ids the doc touches),
    ``n_chunks`` (windows spanned).  One prefix-sum pass; the window
    math is a per-row map."""
    from .scan import ordered_prefix_sum

    counted = _with_token_counts(docs, text_col, id_col)
    summed = ordered_prefix_sum(counted, order_col=id_col, value_col="n_tokens")

    def windows(t: pa.Table) -> pa.Table:
        n = t.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.int64)
        # inclusive float cumsum of int64 token counts is exact (< 2^53)
        cs = t.column("cumsum").to_numpy(zero_copy_only=False).astype(np.int64)
        start = cs - n
        first = start // capacity
        last = (cs - 1) // capacity
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_tokens": pa.array(n),
                "start_offset": pa.array(start),
                "first_chunk": pa.array(first),
                "last_chunk": pa.array(last),
                "n_chunks": pa.array(last - first + 1),
            }
        )

    return summed.map_batches(windows, batch_format="pyarrow", batch_size=None)


def pack_next_fit(
    docs: rd.Dataset,
    capacity: int = 256,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Document-boundary next-fit packing: within each shard
    (``id % n_shards``), documents in id order fill packs of
    ``capacity`` tokens; a pack closes when the next document would
    overflow it.  Columns: id, ``shard``, ``pack_seq`` (pack index
    within the shard), ``pack_offset`` (token offset inside the pack).

    The per-shard walk is the one inherently sequential step, so it is
    the map_groups body (one Python pass over a shard's counts — size
    ``n_shards`` so shards stay node-bounded at scale; everything
    before the groupby is vectorized and streaming)."""
    counted = _with_token_counts(docs, text_col, id_col)

    def tag(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return t.append_column("shard", pa.array(ids % n_shards, pa.int64()))

    def walk(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g.column(id_col))
        g = g.take(order)
        n = g.column("n_tokens").to_numpy(zero_copy_only=False)
        seqs = np.empty(len(n), dtype=np.int64)
        offs = np.empty(len(n), dtype=np.int64)
        seq = 0
        total = 0
        for i, tok in enumerate(n):
            if total + tok > capacity and total > 0:
                seq += 1
                total = 0
            seqs[i] = seq
            offs[i] = total
            total += int(tok)
        return pa.table(
            {
                id_col: g.column(id_col),
                "shard": g.column("shard"),
                "pack_seq": pa.array(seqs),
                "pack_offset": pa.array(offs),
            }
        )

    return (
        counted.map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("shard")
        .map_groups(walk, batch_format="pyarrow")
    )
