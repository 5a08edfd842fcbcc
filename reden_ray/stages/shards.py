"""Tokenized training-shard sink (Megatron-style ``.bin``/``.idx``):
turn a document corpus into fixed-format binary token shards a trainer
can mmap, plus a manifest the pipeline can verify and resume from.

Format (little-endian throughout):

- ``shard-NNNN.bin`` — the token ids of every document in the shard,
  concatenated in ``doc_id`` order, as ``uint32``;
- ``shard-NNNN.idx`` — ``uint64 n_docs``, then ``int64 doc_id[n_docs]``
  (ascending), then ``uint64 offsets[n_docs + 1]`` (token offsets into
  the ``.bin``; doc *i* owns ``[offsets[i], offsets[i+1])``).  Docs
  with zero tokens are recorded with an empty range so the shard is a
  complete census of its documents.

Token ids are a deterministic hash vocabulary (the plumbing under any
real tokenizer): tokens are the corpus-standard lowercased
``[^a-z0-9]+`` split and ``id = LE64(md5(token)[0:8]) % vocab_size``
(DuckDB ``md5_number_upper(token) % vocab_size``), so the written
bytes are SQL-replayable.  Swap ``_token_ids`` for a trained BPE
(``stages/bpe.py`` produces one) without touching the shard format.

Scale shape: shard assignment is ``doc_id % n_shards`` — a plain hash
shuffle — and each shard is written by ONE ``map_groups`` task
(sequential file I/O is the per-shard unit of work; pick ``n_shards``
>= cluster cores).  The manifest rows returned are computed by
RE-READING the bytes just written, so a manifest hash-match gates the
sink output itself, not the in-flight values (the annotated-page-sink
pattern).  A resumable run lists existing ``.idx`` files and skips
finished shards.
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np
import pyarrow as pa
import ray.data as rd

_TOKEN_RE = re.compile(r"[^a-z0-9]+")


def _token_ids(text: str, vocab_size: int) -> np.ndarray:
    md5 = hashlib.md5
    toks = [w for w in _TOKEN_RE.split((text or "").lower()) if w]
    return np.fromiter(
        (
            int.from_bytes(md5(w.encode()).digest()[:8], "little") % vocab_size
            for w in toks
        ),
        dtype=np.uint32,
        count=len(toks),
    )


def _read_shard(bin_path: str, idx_path: str):
    """Parse one written shard back: (doc_ids, offsets, ids)."""
    with open(idx_path, "rb") as f:
        n_docs = int(np.fromfile(f, dtype=np.uint64, count=1)[0])
        doc_ids = np.fromfile(f, dtype=np.int64, count=n_docs)
        offsets = np.fromfile(f, dtype=np.uint64, count=n_docs + 1)
    ids = np.fromfile(bin_path, dtype=np.uint32)
    return doc_ids, offsets, ids


def write_token_shards(
    docs: rd.Dataset,
    out_dir: str,
    n_shards: int = 8,
    vocab_size: int = 32000,
    id_column: str = "doc_id",
    text_column: str = "text",
    resume: bool = False,
) -> rd.Dataset:
    """Write the corpus as ``n_shards`` ``.bin``/``.idx`` pairs under
    ``out_dir``; return the manifest Dataset (one row per shard:
    ``shard, n_docs, n_tokens, id_sum``) parsed back from the files.

    ``id_sum`` (int64 sum of all token ids in the shard) is the cheap
    content checksum the oracle gate compares."""
    os.makedirs(out_dir, exist_ok=True)
    done = (
        {
            int(f[len("shard-") : -len(".idx")])
            for f in os.listdir(out_dir)
            if f.startswith("shard-") and f.endswith(".idx")
        }
        if resume
        else set()
    )

    def keyed(t: pa.Table) -> pa.Table:
        ids = t.column(id_column).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_column: pa.array(ids),
                text_column: t.column(text_column),
                "__shard": pa.array(ids % n_shards),
            }
        )

    def write_shard(g: pa.Table) -> pa.Table:
        shard = int(g.column("__shard")[0].as_py())
        bin_path = os.path.join(out_dir, f"shard-{shard:04d}.bin")
        idx_path = os.path.join(out_dir, f"shard-{shard:04d}.idx")
        if shard not in done:
            order = np.argsort(
                g.column(id_column).to_numpy(zero_copy_only=False), kind="stable"
            )
            g = g.take(order)
            doc_ids = g.column(id_column).to_numpy(zero_copy_only=False)
            per_doc = [
                _token_ids(x, vocab_size) for x in g.column(text_column).to_pylist()
            ]
            offsets = np.zeros(len(per_doc) + 1, dtype=np.uint64)
            offsets[1:] = np.cumsum(
                np.array([a.size for a in per_doc], dtype=np.uint64)
            )
            flat = (
                np.concatenate(per_doc)
                if per_doc
                else np.empty(0, np.uint32)
            ).astype(np.uint32)
            tmp_bin, tmp_idx = bin_path + ".tmp", idx_path + ".tmp"
            with open(tmp_bin, "wb") as f:
                flat.tofile(f)
            with open(tmp_idx, "wb") as f:
                np.array([len(per_doc)], dtype=np.uint64).tofile(f)
                doc_ids.astype(np.int64).tofile(f)
                offsets.tofile(f)
            os.replace(tmp_bin, bin_path)  # idx last: its presence marks done
            os.replace(tmp_idx, idx_path)
        doc_ids, offsets, ids = _read_shard(bin_path, idx_path)
        return pa.table(
            {
                "shard": pa.array([shard], pa.int64()),
                "n_docs": pa.array([len(doc_ids)], pa.int64()),
                "n_tokens": pa.array([int(ids.size)], pa.int64()),
                "id_sum": pa.array([int(ids.astype(np.int64).sum())], pa.int64()),
            }
        )

    return (
        docs.map_batches(keyed, batch_format="pyarrow", batch_size=None)
        .groupby("__shard")
        .map_groups(write_shard, batch_format="pyarrow")
    )


def read_token_shards(out_dir: str) -> rd.Dataset:
    """Read shards back as a Dataset of ``(doc_id, token_ids)`` rows —
    one read task per shard file pair."""
    shard_ids = sorted(
        int(f[len("shard-") : -len(".idx")])
        for f in os.listdir(out_dir)
        if f.startswith("shard-") and f.endswith(".idx")
    )

    def load(t: pa.Table) -> pa.Table:
        out_id, out_ids = [], []
        for s in t.column("shard").to_pylist():
            doc_ids, offsets, ids = _read_shard(
                os.path.join(out_dir, f"shard-{s:04d}.bin"),
                os.path.join(out_dir, f"shard-{s:04d}.idx"),
            )
            for i, d in enumerate(doc_ids):
                out_id.append(int(d))
                out_ids.append(ids[int(offsets[i]) : int(offsets[i + 1])].tolist())
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "token_ids": pa.array(out_ids, pa.list_(pa.uint32())),
            }
        )

    return rd.from_items([{"shard": s} for s in shard_ids]).map_batches(
        load, batch_format="pyarrow", batch_size=1
    )
