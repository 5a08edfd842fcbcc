"""Deterministic epoch shuffle order for training-data serving: assign
every document a global rank under an epoch-seeded uniform permutation,
WITHOUT a global sort.

Rank rule: ``rank = row_number() ORDER BY LE64(md5('e{epoch}:' ||
doc_id)), doc_id`` — the same SQL-replayable md5 permutation the
mixture sampler uses (DuckDB ``md5_number_upper``), re-seeded per epoch
so successive epochs see independent orders.  All-integer output.

Scale shape (the grouped two-pass scan, same as ``stages/scan.py`` and
``stages/mixture.py``): the md5 key is uniform, so its top bits are an
order-contiguous bucketing for free —

1. per-block partial COUNTS per bucket -> one small groupby -> the
   ``n_buckets``-row total table collects on the driver and turns into
   exclusive rank offsets (broadcast via ``ray.put``);
2. one bucket-hash shuffle; each bucket group sorts by (key, doc_id)
   and emits ``offset + arange + 1``.

Nothing corpus-sized reaches the driver; per-group work is 1/256th of
the corpus (raise ``n_buckets`` for bigger clusters).  A trainer then
range-reads rank intervals, or the packing stages consume the ranked
stream directly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


def _epoch_keys(epoch: int, ids: np.ndarray) -> np.ndarray:
    md5 = hashlib.md5
    pre = f"e{epoch}:".encode()
    return np.fromiter(
        (
            int.from_bytes(md5(pre + str(i).encode()).digest()[:8], "little")
            for i in ids
        ),
        dtype=np.uint64,
        count=len(ids),
    )


def train_order(
    docs: rd.Dataset,
    epoch: int = 1,
    id_column: str = "doc_id",
    n_buckets: int = 256,
) -> rd.Dataset:
    """Dataset of ``(doc_id, train_rank)`` — a 1-based permutation."""
    shift = np.uint64(64 - max(1, (n_buckets - 1).bit_length()))

    def keyed(t: pa.Table) -> pa.Table:
        ids = t.column(id_column).to_numpy(zero_copy_only=False).astype(np.int64)
        keys = _epoch_keys(epoch, ids)
        return pa.table(
            {
                id_column: pa.array(ids),
                # int64 reinterpret: all keys in a bucket share their top
                # bits, so within-bucket int64 order == unsigned order
                "__key": pa.array(keys.view(np.int64)),
                "__bucket": pa.array((keys >> shift).astype(np.int64)),
            }
        )

    keyed_ds = docs.map_batches(keyed, batch_format="pyarrow", batch_size=None)

    def partial(t: pa.Table) -> pa.Table:
        ones = pa.table(
            {
                "__bucket": t.column("__bucket"),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        g = ones.group_by("__bucket").aggregate([("n", "sum")])
        return g.rename_columns(["__bucket", "n"])

    cells = (
        keyed_ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("__bucket")
        .sum("n")
        .take_all()
    )  # bounded: <= n_buckets rows
    cells.sort(key=lambda r: int(r["__bucket"]))
    offsets: dict[int, int] = {}
    run = 0
    for r in cells:
        offsets[int(r["__bucket"])] = run
        run += int(r["sum(n)"])
    off_ref = ray.put(offsets)

    def rank_group(g: pa.Table) -> pa.Table:
        off = ray.get(off_ref)[int(g.column("__bucket")[0].as_py())]
        import pyarrow.compute as pc

        order = pc.sort_indices(
            g, sort_keys=[("__key", "ascending"), (id_column, "ascending")]
        )
        g = g.take(order)
        return pa.table(
            {
                id_column: g.column(id_column),
                "train_rank": pa.array(
                    off + 1 + np.arange(g.num_rows, dtype=np.int64)
                ),
            }
        )

    return keyed_ds.groupby("__bucket").map_groups(rank_group, batch_format="pyarrow")
