"""Incremental corpus ingestion: dedup a new crawl snapshot (delta)
against a PERSISTED fingerprint store, then grow the store — the
operator that turns one-shot exact dedup into a continuously-fed
training corpus (CommonCrawl-style monthly snapshots).

Store layout: partitioned parquet of ``(fp int64, doc_id int64)`` —
16 bytes per distinct document, so a 100-billion-doc corpus carries a
~1.6 TB store that is READ AS A DATASET and anti-joined by hash
partition; it never touches the driver and is never broadcast.
Appends are new parquet files in the same directory (Ray's write
naming is collision-free), so ingestion is resumable and each
snapshot's contribution is a distinct file set.

Semantics (SQL-replayable — the oracle compares on raw text equality,
the engine on blake2b-64; identical verdicts absent an engineered
collision):

- within-delta winners: min ``id_column`` per distinct ``column``;
- survivors: winners whose fingerprint is NOT in the store;
- store after ingest: old store rows + survivors' ``(fp, id)`` rows.

Reference analogue: the reference's ``alreadyProcessed`` URI set
(``core/linker.py`` ST5) is a per-run in-memory dedup; this is its
cross-run, disk-backed, corpus-scale generalization.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd


def _fp_batch(
    t: pa.Table, column: str, id_column: str
) -> pa.Table:
    """(fp, id) rows for a documents batch — same blake2b-64 >> 1
    int64 fingerprint as :func:`reden_ray.stages.dedup.exact_dedup`."""
    fps = pa.array(
        [
            int.from_bytes(
                hashlib.blake2b((x or "").encode(), digest_size=8).digest(), "big"
            )
            >> 1
            for x in t.column(column).to_pylist()
        ],
        pa.int64(),
    )
    return pa.table({"fp": fps, "doc_id": t.column(id_column).cast(pa.int64())})


def _min_per_fp(t: pa.Table) -> pa.Table:
    """min doc_id per fp — one lexsort segment sweep (exact_dedup's)."""
    fp = t.column("fp").to_numpy(zero_copy_only=False)
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, fp))
    fp_s = fp[order]
    new = np.empty(len(fp_s), dtype=bool)
    if len(fp_s):
        new[0] = True
        new[1:] = fp_s[1:] != fp_s[:-1]
    return t.take(pa.array(order[new]))


def fingerprint_winners(
    docs: rd.Dataset, column: str = "text", id_column: str = "doc_id"
) -> rd.Dataset:
    """(fp, doc_id) of the min-id document per distinct content value —
    block-local min then ONE coarse-partition reduce (min is
    associative); bodies are dropped before anything shuffles."""
    from .joins import default_join_partitions
    from .partition import part_column

    n_parts = default_join_partitions()

    def local(t: pa.Table) -> pa.Table:
        w = _min_per_fp(_fp_batch(t, column, id_column))
        return w.append_column("__part", part_column(w, ["fp"], n_parts))

    def reduce_part(g: pa.Table) -> pa.Table:
        return _min_per_fp(g.drop_columns("__part"))

    return (
        docs.map_batches(local, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(reduce_part, batch_format="pyarrow")
    )


def build_fingerprint_store(
    docs: rd.Dataset,
    store_dir: str,
    column: str = "text",
    id_column: str = "doc_id",
) -> None:
    """Initialize a store directory from a base corpus (one snapshot)."""
    fingerprint_winners(docs, column, id_column).write_parquet(store_dir)


def _empty_store() -> rd.Dataset:
    return rd.from_arrow(
        pa.table(
            {"fp": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64())}
        )
    )


def read_store(store_dir: str) -> rd.Dataset:
    """The store as a Dataset; a store initialized from an empty base
    (zero files, or files with no rows) reads as an empty (fp, doc_id)
    dataset rather than erroring."""
    import glob
    import os

    if not glob.glob(os.path.join(store_dir, "*.parquet")):
        return _empty_store()
    try:
        return rd.read_parquet(store_dir, columns=["fp", "doc_id"])
    except Exception:
        return _empty_store()


def delta_dedup(
    delta: rd.Dataset,
    store_dir: str,
    column: str = "text",
    id_column: str = "doc_id",
) -> rd.Dataset:
    """(fp, doc_id) of delta documents that survive BOTH within-delta
    exact dedup and the anti-join against the persisted store.  Both
    sides are fingerprint streams — the anti join is the native
    hash-partitioned left_anti; nothing is broadcast or collected."""
    from .joins import shuffle_anti_join

    winners = fingerprint_winners(delta, column, id_column)
    return shuffle_anti_join(winners, read_store(store_dir), on=["fp"])


def corpus_diff(
    v1: rd.Dataset,
    v2: rd.Dataset,
    column: str = "text",
    id_column: str = "doc_id",
    include_unchanged: bool = False,
) -> rd.Dataset:
    """Classify every document id across two corpus versions as
    ``added`` / ``removed`` / ``changed`` (content fingerprint differs)
    — the audit step between crawl snapshots.  Each side reduces to a
    16-byte (id, fp) stream BEFORE the full-outer hash join, so bodies
    never shuffle; ``unchanged`` rows (the overwhelming majority
    between adjacent snapshots) are filtered out unless asked for.
    Both sides are staged (the empty-first-block join rule)."""
    from .joins import default_join_partitions, staged_nonempty

    def fps(name: str):
        def f(t: pa.Table) -> pa.Table:
            w = _fp_batch(t, column, id_column)
            return pa.table({"doc_id": w.column("doc_id"), name: w.column("fp")})

        return f

    left = staged_nonempty(
        v1.map_batches(fps("fp1"), batch_format="pyarrow", batch_size=None)
    )
    right = staged_nonempty(
        v2.map_batches(fps("fp2"), batch_format="pyarrow", batch_size=None)
    )

    def classify(t: pa.Table) -> pa.Table:
        f1, f2 = t.column("fp1"), t.column("fp2")
        n1 = pa.compute.is_null(f1).to_numpy(zero_copy_only=False)
        n2 = pa.compute.is_null(f2).to_numpy(zero_copy_only=False)
        # fill nulls BEFORE to_numpy: a nullable int64 otherwise converts
        # to float64 and 63-bit fingerprints collide past 2**53
        a1 = pa.compute.fill_null(f1, 0).to_numpy(zero_copy_only=False)
        a2 = pa.compute.fill_null(f2, 0).to_numpy(zero_copy_only=False)
        status = np.where(
            n1, "added", np.where(n2, "removed", np.where(a1 != a2, "changed", "unchanged"))
        )
        out = pa.table(
            {
                "doc_id": t.column("doc_id"),
                "status": pa.array(status.tolist(), pa.string()),
            }
        )
        if include_unchanged:
            return out
        return out.filter(pa.compute.not_equal(out.column("status"), "unchanged"))

    if left is None and right is None:
        return _empty_store().map_batches(
            lambda t: pa.table(
                {"doc_id": pa.array([], pa.int64()), "status": pa.array([], pa.string())}
            ),
            batch_format="pyarrow",
        )
    if left is None:
        return right.map_batches(
            lambda t: pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "status": pa.array(["added"] * t.num_rows, pa.string()),
                }
            ),
            batch_format="pyarrow",
        )
    if right is None:
        return left.map_batches(
            lambda t: pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "status": pa.array(["removed"] * t.num_rows, pa.string()),
                }
            ),
            batch_format="pyarrow",
        )
    joined = left.join(
        right,
        join_type="full_outer",
        num_partitions=default_join_partitions(),
        on=("doc_id",),
    )
    return joined.map_batches(classify, batch_format="pyarrow", batch_size=None)


def ingest_snapshot(
    delta: rd.Dataset,
    store_dir: str,
    column: str = "text",
    id_column: str = "doc_id",
) -> rd.Dataset:
    """Dedup ``delta`` against the store, APPEND the survivors'
    fingerprints to it (new parquet files — resumable, per-snapshot
    file sets), and return the surviving (fp, doc_id) rows.  The
    survivor stream is staged (block-distributed materialize) because
    it has two consumers: the store append and the caller."""
    surv = delta_dedup(delta, store_dir, column, id_column).materialize()
    if surv.count() > 0:
        surv.write_parquet(store_dir)
    return surv
