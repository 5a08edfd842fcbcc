"""Sparse term-frequency cosine similarity join — document pairs whose
bag-of-words cosine clears a threshold, computed EXACTLY over integer
term counts (the classic sparse-vector all-pairs similarity problem,
Bayardo et al. 2007 "Scaling Up All Pairs Similarity Search").

The score is gated in pure integer arithmetic: with integer tf counts,
``cos(a, b) >= sqrt(num/den)``  <=>  ``den * dot^2 >= num * n2a * n2b``
(dot > 0), so there is no float knife edge anywhere — the pair set,
the dot products and the squared norms all hash-gate against a DuckDB
self-join oracle (``text_cosine_pairs``).

Plan (never O(corpus^2), nothing driver-sized):

1. ``map_batches``: docs -> (term, doc_id, tf) rows, block-local
   counting (same tokenizer as the n-gram oracles:
   ``[^a-z0-9]+`` on lowercase).
2. document frequency per term (term-keyed groupby over the tf-row
   stream) -> terms hotter than ``max_df`` are DROPPED — the Bayardo
   frequency-pruning lever: a term shared by thousands of documents
   contributes O(df^2) candidate pairs and ~no discrimination.  The
   cap is part of the operator's semantics ("cosine over
   non-ubiquitous terms") and the oracle mirrors it, so the gate is
   exact.
3. kept tf rows re-join their term (ONE term-hash shuffle), squared
   norms re-aggregate per doc over the SAME kept rows (cosine stays
   internally consistent).
4. per-term posting groups emit candidate ``(doc_a < doc_b,
   tf_a * tf_b)`` rows inside a coarse term-partition
   (``partitioned_bucket_pairs``), pre-combined per block, then ONE
   coarse pair-partition reduce sums them into dots (the repo's
   standard pair discipline — native pair-keyed groupbys are banned).
5. doc-sized norm table attaches via cost-based ``smart_join``
   (broadcast while small, hash shuffle at scale); the integer gate
   filters inside the map.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .dedup import _TOKEN_SPLIT_RE, partitioned_bucket_pairs
from .joins import default_join_partitions, hash_join, smart_join, staged_nonempty
from .partition import part_column

_TF_SCHEMA = pa.schema(
    [("term", pa.string()), ("doc_id", pa.int64()), ("tf", pa.int64())]
)

_CAND_SCHEMA = pa.schema(
    [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("ps", pa.int64())]
)


def _tf_rows(docs: rd.Dataset, id_column: str, text_column: str) -> rd.Dataset:
    def f(t: pa.Table) -> pa.Table:
        ids = t.column(id_column).to_pylist()
        texts = t.column(text_column).to_pylist()
        out_t: list[str] = []
        out_id: list[int] = []
        out_tf: list[int] = []
        for d, tx in zip(ids, texts):
            counts: dict[str, int] = {}
            for w in _TOKEN_SPLIT_RE.split((tx or "").lower()):
                if w:
                    counts[w] = counts.get(w, 0) + 1
            out_t.extend(counts.keys())
            out_id.extend([d] * len(counts))
            out_tf.extend(counts.values())
        return pa.table(
            {
                "term": pa.array(out_t, pa.string()),
                "doc_id": pa.array(out_id, pa.int64()),
                "tf": pa.array(out_tf, pa.int64()),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow", batch_size=None)


def tf_cosine_pairs(
    docs: rd.Dataset,
    threshold_num: int = 4,
    threshold_den: int = 5,
    max_df: int = 100,
    id_column: str = "doc_id",
    text_column: str = "text",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """(doc_a, doc_b, dot, norm_a, norm_b) for every pair with
    ``cos^2 >= threshold_num / threshold_den`` over terms with
    document frequency <= ``max_df`` — all columns exact int64."""
    n_parts = num_partitions or default_join_partitions()

    tf = staged_nonempty(_tf_rows(docs, id_column, text_column))
    empty = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "dot": pa.array([], pa.int64()),
            "norm_a": pa.array([], pa.int64()),
            "norm_b": pa.array([], pa.int64()),
        }
    )
    if tf is None:
        return rd.from_arrow(empty)

    # document frequency per term; drop ubiquitous terms (Bayardo prune)
    kept_terms = staged_nonempty(
        tf.groupby("term")
        .count()
        .map_batches(
            lambda t: t.filter(
                pc.less_equal(t.column("count()"), pa.scalar(max_df))
            ).select(["term"]),
            batch_format="pyarrow",
            batch_size=None,
        )
    )
    if kept_terms is None:
        return rd.from_arrow(empty)
    tfk = staged_nonempty(hash_join(tf, kept_terms, on=["term"]))
    if tfk is None:
        return rd.from_arrow(empty)

    # squared norms over the KEPT term space (doc-keyed aggregate)
    def sq(t: pa.Table) -> pa.Table:
        v = t.column("tf").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "sq": pa.array(v * v, pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    norms = (
        tfk.map_batches(sq, batch_format="pyarrow", batch_size=None)
        .groupby("doc_id")
        .aggregate(Sum("sq", alias_name="n2"))
    )

    # per-term posting groups -> candidate tf-product rows
    def bucket_fn(group: pa.Table) -> pa.Table:
        d = group.num_rows
        if d < 2:
            return _CAND_SCHEMA.empty_table()
        order = pc.sort_indices(group.column("doc_id"))
        group = group.take(order)
        ids = group.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        tfs = group.column("tf").to_numpy(zero_copy_only=False).astype(np.int64)
        ia, ib = np.triu_indices(d, k=1)
        return pa.table(
            {
                "doc_a": pa.array(ids[ia]),
                "doc_b": pa.array(ids[ib]),
                "ps": pa.array(tfs[ia] * tfs[ib]),
            }
        )

    cands = partitioned_bucket_pairs(
        tfk.select_columns(["term", "doc_id", "tf"]),
        bucket_fn,
        _CAND_SCHEMA,
        on=("term",),
        num_partitions=n_parts,
    )

    def partial_sum(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _CAND_SCHEMA.empty_table()
        agg = t.group_by(["doc_a", "doc_b"]).aggregate([("ps", "sum")])
        return agg.rename_columns(["doc_a", "doc_b", "ps"])

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__part", part_column(t, ["doc_a", "doc_b"], n_parts)
        )

    def reduce(group: pa.Table) -> pa.Table:
        agg = group.group_by(["doc_a", "doc_b"]).aggregate([("ps", "sum")])
        return agg.rename_columns(["doc_a", "doc_b", "dot"])

    dots = staged_nonempty(
        cands.map_batches(partial_sum, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(reduce, batch_format="pyarrow")
    )
    if dots is None:
        return rd.from_arrow(empty)

    na = norms.map_batches(
        lambda t: pa.table({"doc_a": t.column("doc_id"), "norm_a": t.column("n2")}),
        batch_format="pyarrow",
        batch_size=None,
    )
    nb = norms.map_batches(
        lambda t: pa.table({"doc_b": t.column("doc_id"), "norm_b": t.column("n2")}),
        batch_format="pyarrow",
        batch_size=None,
    )
    joined = smart_join(smart_join(dots, na, on=["doc_a"]), nb, on=["doc_b"])

    def gate(t: pa.Table) -> pa.Table:
        dot = t.column("dot").to_numpy(zero_copy_only=False).astype(np.int64)
        n2a = t.column("norm_a").to_numpy(zero_copy_only=False).astype(np.int64)
        n2b = t.column("norm_b").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (dot > 0) & (
            threshold_den * dot * dot >= threshold_num * n2a * n2b
        )
        return pa.table(
            {
                "doc_a": t.column("doc_a").cast(pa.int64()).filter(pa.array(keep)),
                "doc_b": t.column("doc_b").cast(pa.int64()).filter(pa.array(keep)),
                "dot": pa.array(dot[keep], pa.int64()),
                "norm_a": pa.array(n2a[keep], pa.int64()),
                "norm_b": pa.array(n2b[keep], pa.int64()),
            }
        )

    return joined.map_batches(gate, batch_format="pyarrow", batch_size=None)
