"""Corpus-scale inverted text index as a partitioned parquet artifact —
the engine-level generalization of the reference's per-actor Lucene
index analogue (``state/dictionary.py``; reference scope: Lucene
KB-label index, `reference` Java indexer classes): term -> sorted
postings (doc_id, tf), document frequency and collection frequency,
SHARDED by term hash so a query for one term opens one shard
directory (path-level pruning, the io_partitioned_write discipline).

Build plan: block-local (term, doc_id, tf) counting (shared tokenizer
with the oracles: ``[^a-z0-9]+`` on lowercase) -> ONE coarse
term-partition reduce (``part_column`` groupby — term keys are
corpus-sized, so never a native string groupby) where each term's
postings are assembled sorted-by-doc_id and serialized as
``"doc:tf,..."`` (the list-typed payload would not survive an Arrow
join anyway — CLAUDE.md) -> hive-partitioned ``write_parquet`` on the
shard key.  Deterministic shard = blake2b(term) % num_shards (Python
``hash()`` is process-salted).

Search: a conjunctive (AND) query reads ONLY the shards its terms
hash to, filters to the query terms, explodes their postings back to
(doc_id, tf) rows, and keeps documents matched by ALL terms with
score = sum of tfs (tf-conjunction ranking), top-k by
(score desc, doc_id) — the classic document-at-a-time intersection,
here as a tiny post-index Dataset chain.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Sum

from .partition import part_column


def _term_shard(term: str, num_shards: int) -> int:
    return (
        int.from_bytes(
            hashlib.blake2b(term.encode(), digest_size=8).digest(), "big"
        )
        % num_shards
    )


def build_inverted_index(
    docs: rd.Dataset,
    out_dir: str,
    id_column: str = "doc_id",
    text_column: str = "text",
    num_shards: int = 8,
    num_partitions: int | None = None,
) -> None:
    """Write the sharded index under ``out_dir`` (hive dirs
    ``shard=K``); rows: (term, df, total_tf, postings)."""
    from .joins import default_join_partitions
    from .tfcos import _tf_rows

    n_parts = num_partitions or default_join_partitions()
    tf = _tf_rows(docs, id_column, text_column)

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, ["term"], n_parts))

    def assemble(g: pa.Table) -> pa.Table:
        g = g.drop_columns("__part").sort_by(
            [("term", "ascending"), ("doc_id", "ascending")]
        )
        terms = g.column("term").to_pylist()
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        tfs = g.column("tf").to_numpy(zero_copy_only=False)
        n = len(terms)
        out_t: list[str] = []
        out_df: list[int] = []
        out_tt: list[int] = []
        out_p: list[str] = []
        out_s: list[int] = []
        i = 0
        while i < n:
            j = i
            while j < n and terms[j] == terms[i]:
                j += 1
            out_t.append(terms[i])
            out_df.append(j - i)
            out_tt.append(int(tfs[i:j].sum()))
            out_p.append(
                ",".join(f"{int(d)}:{int(f)}" for d, f in zip(ids[i:j], tfs[i:j]))
            )
            out_s.append(_term_shard(terms[i], num_shards))
            i = j
        return pa.table(
            {
                "term": pa.array(out_t, pa.string()),
                "df": pa.array(out_df, pa.int64()),
                "total_tf": pa.array(out_tt, pa.int64()),
                "postings": pa.array(out_p, pa.string()),
                "shard": pa.array(out_s, pa.int64()),
            }
        )

    (
        tf.map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(assemble, batch_format="pyarrow")
        .write_parquet(out_dir, partition_cols=["shard"])
    )


def read_index(index_dir: str) -> rd.Dataset:
    """Re-read the WRITTEN index bytes (all shards)."""
    ds = rd.read_parquet(index_dir)
    return ds.map_batches(
        lambda t: pa.table(
            {
                "term": t.column("term"),
                "df": t.column("df").cast(pa.int64()),
                "total_tf": t.column("total_tf").cast(pa.int64()),
                "postings": t.column("postings"),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )


def search_and(
    index_dir: str,
    terms: list[str],
    k: int = 10,
    num_shards: int = 8,
) -> rd.Dataset:
    """Conjunctive search: (doc_id, score) for the top-k documents
    containing EVERY query term, score = summed tf, ties by doc_id.
    Reads only the shards the query terms hash to."""
    import glob as _glob

    shards = sorted({_term_shard(t, num_shards) for t in terms})
    # read_parquet takes a LIST of FILES (a list of directories is
    # rejected) — expand each selected shard dir; untouched shards'
    # bytes are never opened
    files = [
        f
        for s in shards
        for f in sorted(_glob.glob(f"{index_dir}/shard={s}/*.parquet"))
    ]
    ds = rd.read_parquet(files)
    tset = set(terms)
    n_terms = len(tset)

    def explode(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t.column("term"), pa.array(sorted(tset), pa.string()))
        t = t.filter(keep)
        out_doc: list[int] = []
        out_tf: list[int] = []
        for p in t.column("postings").to_pylist():
            for entry in p.split(","):
                d, f = entry.split(":")
                out_doc.append(int(d))
                out_tf.append(int(f))
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "tf": pa.array(out_tf, pa.int64()),
            }
        )

    hits = (
        ds.map_batches(explode, batch_format="pyarrow", batch_size=None)
        .groupby("doc_id")
        .aggregate(
            Count(alias_name="n_terms"),
            Sum("tf", alias_name="score"),
        )
    )

    def gate(t: pa.Table) -> pa.Table:
        keep = pc.equal(t.column("n_terms"), pa.scalar(n_terms))
        t = t.filter(keep)
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "score": t.column("score").cast(pa.int64()),
            }
        )

    return (
        hits.map_batches(gate, batch_format="pyarrow", batch_size=None)
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(k)
    )
