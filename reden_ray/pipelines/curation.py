"""Training-data curation: the composed cleaning pipeline.

Chains the data-quality operators into the shape a 100 TB pretraining
corpus actually runs:

    read_parquet(documents, columns pruned, optional lang pushdown)
      -> TokenStats + QualityScore + LangId     (fused stateless maps)
      -> quality / length filter                 (vectorized)
      -> exact dedup                             (hash partition + first)
      -> MinHash-LSH near-dup drop               (keep the smallest id
                                                  of each near-dup pair)
      -> curated table

Every stage streams; the only exchanges are the dedup groupby and the
LSH bucket groupby, both on uniform hash keys.  The near-dup pair set is
collected (pairs are rare by construction); at 10^12 docs the drop-set
becomes a broadcast Bloom filter instead of an exact set — noted inline.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..stages.dedup import exact_dedup, minhash_lsh_pairs
from ..stages.textstats import LangId, QualityScore, TokenStats


def curate_documents(
    sf_dir: str,
    min_quality: float = 0.3,
    min_tokens: int = 10,
    near_dup_threshold: float = 0.9,
    lang: str | None = None,
) -> rd.Dataset:
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

    filtered = scored.map_batches(keep, batch_format="pyarrow").materialize()
    # exact dedup on the filtered survivors
    deduped = exact_dedup(filtered, column="text", id_column="doc_id").materialize()

    # near-dup drop: for each pair keep the smaller doc_id.  Pairs are
    # collected exactly here; at web scale replace the drop set with a
    # broadcast Bloom filter over pair losers.
    pairs = minhash_lsh_pairs(
        deduped.select_columns(["doc_id", "text"]), threshold=near_dup_threshold
    )
    drop = {
        max(a, b)
        for a, b in zip(pairs["doc_a"].to_pylist(), pairs["doc_b"].to_pylist())
    }
    drop_ref = ray.put(drop)

    def drop_near_dups(batch: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        mask = pa.array(
            [i not in d for i in batch.column("doc_id").to_pylist()], pa.bool_()
        )
        return batch.filter(mask)

    return deduped.map_batches(drop_near_dups, batch_format="pyarrow")
