"""Training-data curation: the composed cleaning pipeline.

Chains the data-quality operators into the shape a 100 TB pretraining
corpus actually runs:

    read_parquet(documents, columns pruned, optional lang pushdown)
      -> TokenStats + QualityScore + LangId     (fused stateless maps)
      -> quality / length filter                 (vectorized)
      -> exact dedup                             (hash partition + first)
      -> MinHash-LSH near-dup drop               (distributed anti-join
                                                  against the pair
                                                  losers — keep the
                                                  smallest id of each
                                                  near-dup pair)
      -> curated table

Every stage streams; the exchanges are the dedup groupby, the LSH
bucket groupby and the loser anti-join, all on uniform hash keys.
Near-dup losers are never collected to the driver: the pairs Dataset
maps to loser ids, distincts distributedly, and drops via a native
hash-partitioned ``left_anti`` join — the same plan at 500 docs and
at 10^12.

The deduped survivors feed two consumers (the LSH pass and the final
anti-join).  By default they are pinned once in the object store
(``materialize`` — block-distributed, spillable); pass
``checkpoint_dir`` to stage them as partitioned parquet instead, which
is both the resume point and the cheaper choice when the corpus
exceeds aggregate object-store memory.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..stages.dedup import exact_dedup, minhash_lsh_pairs
from ..stages.joins import shuffle_anti_join
from ..stages.textstats import LangId, QualityScore, TokenStats


def near_dup_losers(pairs: rd.Dataset) -> rd.Dataset:
    """Pair table -> distinct loser doc_ids (the larger id of each
    near-dup pair; the smaller survives).  Stays a Dataset end to end;
    two-level distinct (block-local, then one vectorized call per
    coarse partition — never one Python call per loser)."""
    from ..stages.joins import default_join_partitions
    from ..stages.partition import part_column

    n_parts = default_join_partitions()

    def losers(batch: pa.Table) -> pa.Table:
        keep = pc.max_element_wise(batch["doc_a"], batch["doc_b"])
        t = pa.table({"doc_id": keep}).group_by(["doc_id"]).aggregate([])
        return t.append_column("__part", part_column(t, ["doc_id"], n_parts))

    def dedupe(g: pa.Table) -> pa.Table:
        return g.drop_columns("__part").group_by(["doc_id"]).aggregate([])

    return (
        pairs.map_batches(losers, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(dedupe, batch_format="pyarrow")
    )


def near_dup_clusters(
    pairs: rd.Dataset, a: str = "doc_a", b: str = "doc_b", max_iters: int = 8
) -> rd.Dataset:
    """Near-dup PAIR table -> (doc_id, cluster) rows: connected
    components over the similarity graph, each component labeled by its
    MINIMUM member id (the doc that survives a keep-one policy).

    Reuses the all-shuffle min-label propagation
    (``canonicalize.connected_components_join_ds``): ids are
    zero-padded to strings so lexicographic min == numeric min, and
    unpadded on the way out.  Components of near-dups are tiny (chains
    of transitive similarity), so the default iteration bound converges
    on any real corpus; non-convergence is reported by the underlying
    primitive and simply leaves distinct labels.  Only docs appearing
    in >=1 pair are emitted — singletons are their own cluster by
    definition and would double corpus traffic for no information."""
    from .canonicalize import connected_components_join_ds

    def to_edges(t: pa.Table) -> pa.Table:
        av = t.column(a).to_numpy(zero_copy_only=False)
        bv = t.column(b).to_numpy(zero_copy_only=False)
        au = [f"{x:020d}" for x in av]
        bu = [f"{x:020d}" for x in bv]
        return pa.table(
            {
                "u": pa.array(au + bu, pa.string()),
                "v": pa.array(bu + au, pa.string()),
            }
        )

    mapping, _ = connected_components_join_ds(
        pairs.map_batches(to_edges, batch_format="pyarrow"), max_iters=max_iters
    )

    def unpad(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(t["uri"], pa.int64()),
                "cluster": pc.cast(t["canonical"], pa.int64()),
            }
        )

    return mapping.map_batches(unpad, batch_format="pyarrow")


def keep_best_per_cluster(
    labeled: rd.Dataset,
    score_column: str = "score",
    id_column: str = "doc_id",
    cluster_column: str = "cluster",
) -> rd.Dataset:
    """Near-dup clusters keep their BEST-scoring member (ties -> min
    id): input (id, cluster, score) rows come back with a ``kept``
    0/1 column.  ONE cluster-hash shuffle of 24-byte rows; the argmax
    AND the flag are decided inside the partition group where each
    cluster's rows are co-located, so no winner table rides back on a
    second join.  Bodies never move — callers semi-join survivors by
    id afterwards."""
    from ..stages.partition import part_column, sorted_segments
    from ..stages.webtext import _default_span_parts

    n_parts = _default_span_parts()

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, [cluster_column], n_parts))

    def flag_group(g: pa.Table) -> pa.Table:
        g = g.drop_columns("__part")
        s, starts, _ = sorted_segments(
            g,
            [cluster_column],
            extra_sort=[(score_column, "descending"), (id_column, "ascending")],
        )
        kept = np.zeros(s.num_rows, dtype=np.int64)
        kept[starts] = 1
        return s.append_column("kept", pa.array(kept, pa.int64()))

    return (
        labeled.map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(flag_group, batch_format="pyarrow")
    )


def curate_documents(
    sf_dir: str,
    min_quality: float = 0.3,
    min_tokens: int = 10,
    near_dup_threshold: float = 0.9,
    lang: str | None = None,
    checkpoint_dir: str | None = None,
    near_dup_method: str = "minhash",
) -> rd.Dataset:
    """``near_dup_method``: 'minhash' (Jaccard-style, default),
    'simhash' (Hamming; threshold interpreted as max Hamming distance
    when >= 1, else the default distance 3), 'ngram' (EXACT word-trigram
    Jaccard — the non-approximate sibling, fully SQL-expressible so the
    whole composite sits under a DuckDB hash gate), 'minhash_md5' (the
    LSH chain with the SQL-replayable md5 kernel — hash-gates the
    composite WITH an approximate near-dup stage), or 'none'."""
    cols = ["doc_id", "text", "lang", "source"]
    if lang is not None:
        docs = rd.read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=cols,
            filter=(pc.field("lang") == lang),  # row-group pushdown
        )
    else:
        docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=cols)

    scored = (
        docs.map_batches(TokenStats, batch_format="pyarrow", concurrency=(1, 4))
        .map_batches(QualityScore, batch_format="pyarrow", concurrency=(1, 4))
        .map_batches(LangId, batch_format="pyarrow", concurrency=(1, 4))
    )

    def keep(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater_equal(batch["quality"], min_quality),
            pc.greater_equal(batch["n_tokens_ws"], min_tokens),
        )
        return batch.filter(mask)

    filtered = scored.map_batches(keep, batch_format="pyarrow")
    # exact dedup on the filtered survivors; staged once for the two
    # downstream consumers (LSH pass + anti-join)
    deduped = exact_dedup(filtered, column="text", id_column="doc_id")
    if checkpoint_dir is not None:
        deduped.write_parquet(checkpoint_dir)
        deduped = rd.read_parquet(checkpoint_dir)
    else:
        deduped = deduped.materialize()

    if near_dup_method == "none":
        return deduped
    if near_dup_method == "simhash":
        from ..stages.dedup import simhash_pairs

        max_h = int(near_dup_threshold) if near_dup_threshold >= 1 else 3
        pairs = simhash_pairs(
            deduped.select_columns(["doc_id", "text"]), max_hamming=max_h
        )
    elif near_dup_method == "ngram":
        from ..stages.dedup import ngram_jaccard_pairs

        pairs = ngram_jaccard_pairs(
            deduped.select_columns(["doc_id", "text"]),
            n=3,
            threshold=near_dup_threshold,
        )
    elif near_dup_method == "minhash":
        pairs = minhash_lsh_pairs(
            deduped.select_columns(["doc_id", "text"]), threshold=near_dup_threshold
        )
    elif near_dup_method == "minhash_md5":
        # SQL-replayable kernel twin (stages.dedup.Md5MinHasher): the
        # same LSH chain with fixed 16x4 banding so the WHOLE composite
        # sits under a DuckDB hash gate (see __ray_entry__
        # curation_md5_minhash); 'minhash' stays the production default.
        pairs = minhash_lsh_pairs(
            deduped.select_columns(["doc_id", "text"]),
            threshold=near_dup_threshold,
            n_perm=16,
            n_bands=4,
            shingle_k=5,
            max_bucket=1_000_000,
            kernel="md5",
        )
    else:
        raise ValueError(f"unknown near_dup_method: {near_dup_method!r}")
    return shuffle_anti_join(deduped, near_dup_losers(pairs), on=["doc_id"])
