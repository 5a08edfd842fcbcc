"""Curriculum ordering: serve higher-quality documents first, shuffled
within quality tiers — the tiered variant of
:func:`reden_ray.stages.ordering.train_order`.

Rank rule (DuckDB twin in ``curriculum_order_epoch1``): ``tier =
clip(score, -clip, clip)`` (the hashed linear model's integer score,
:mod:`reden_ray.stages.scoring`), then ``rank = row_number() ORDER BY
tier DESC, LE64(md5('c{epoch}:' || doc_id)[0:8]), doc_id``.  All
integers, no float edges.

Scale shape: the same grouped two-pass scan as ``train_order``, with
the cell key widened to ``(tier, key-bucket)`` — the driver sees one
count per cell (``(2*clip+1) * n_buckets`` rows, bounded by
construction), sorts cells in serving order (tier DESC, bucket ASC),
and broadcasts exclusive offsets; one bucket-hash shuffle ranks each
cell independently.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from .scoring import HashedLinearScorer, hash_weights


def _cur_keys(epoch: int, ids: np.ndarray) -> np.ndarray:
    md5 = hashlib.md5
    pre = f"c{epoch}:".encode()
    return np.fromiter(
        (
            int.from_bytes(md5(pre + str(i).encode()).digest()[:8], "little")
            for i in ids
        ),
        dtype=np.uint64,
        count=len(ids),
    )


def curriculum_order(
    docs: rd.Dataset,
    epoch: int = 1,
    clip: int = 8,
    dim: int = 1024,
    n_buckets: int = 64,
    id_column: str = "doc_id",
    text_column: str = "text",
) -> rd.Dataset:
    """Dataset of ``(doc_id, tier, train_rank)`` — best tiers first,
    md5-shuffled inside each tier (module doc)."""
    wref = ray.put(hash_weights(dim))
    shift = np.uint64(64 - max(1, (n_buckets - 1).bit_length()))

    def keyed(t: pa.Table) -> pa.Table:
        scorer = HashedLinearScorer(
            wref, dim=dim, id_column=id_column, text_column=text_column
        )
        s = scorer(t)
        ids = s.column(id_column).to_numpy(zero_copy_only=False).astype(np.int64)
        tier = np.clip(
            s.column("score").to_numpy(zero_copy_only=False), -clip, clip
        ).astype(np.int64)
        keys = _cur_keys(epoch, ids)
        return pa.table(
            {
                id_column: pa.array(ids),
                "tier": pa.array(tier),
                "__key": pa.array(keys.view(np.int64)),
                "__cell": pa.array(
                    tier * n_buckets + (keys >> shift).astype(np.int64)
                ),
            }
        )

    keyed_ds = docs.map_batches(keyed, batch_format="pyarrow", batch_size=None)

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"__cell": t.column("__cell")})
            .append_column("n", pa.array(np.ones(t.num_rows, np.int64)))
            .group_by("__cell")
            .aggregate([("n", "sum")])
        )
        return g.rename_columns(["__cell", "n"])

    cells = (
        keyed_ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("__cell")
        .sum("n")
        .take_all()
    )  # bounded: <= (2*clip+1) * n_buckets rows
    # serving order: tier DESC, key-bucket ASC.  Python // floors toward
    # -inf, so cell // n_buckets recovers the tier for negative cells
    # too (cell = tier * n_buckets + bucket, bucket in [0, n_buckets))
    order = sorted(
        ((int(r["__cell"]), int(r["sum(n)"])) for r in cells),
        key=lambda c: (-(c[0] // n_buckets), c[0] % n_buckets),
    )
    offsets: dict[int, int] = {}
    run = 0
    for cell, n in order:
        offsets[cell] = run
        run += n
    off_ref = ray.put(offsets)

    def rank_group(g: pa.Table) -> pa.Table:
        off = ray.get(off_ref)[int(g.column("__cell")[0].as_py())]
        idx = pc.sort_indices(
            g, sort_keys=[("__key", "ascending"), (id_column, "ascending")]
        )
        g = g.take(idx)
        return pa.table(
            {
                id_column: g.column(id_column),
                "tier": g.column("tier"),
                "train_rank": pa.array(
                    off + 1 + np.arange(g.num_rows, dtype=np.int64)
                ),
            }
        )

    return keyed_ds.groupby("__cell").map_groups(rank_group, batch_format="pyarrow")
