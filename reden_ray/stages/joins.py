"""Joins for Ray Data datasets (J1/J2/J5-J7 of SURVEY.md §2.4).

Three physical strategies, chosen by side sizes:

- ``broadcast_join``: small right side — ``ray.put`` the build table
  once, map_batches a vectorized per-batch Arrow join against it.  No
  shuffle; the idiomatic replacement for the reference's
  dictionary/Lucene lookup when the side table fits a node.
- ``hash_join``: both sides large — Ray 2.49's native
  ``Dataset.join`` (hash-partitioned shuffle on the key).
- ``broadcast_semi_join`` / ``broadcast_anti_join``: key-set broadcast +
  vectorized ``is_in`` filter (J6/J7 run-diff and completeness probes).

All helpers keep ``batch_format="pyarrow"`` end to end.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


def broadcast_join(
    left: rd.Dataset,
    right: pa.Table,
    on: list[str],
    how: str = "inner",
    batch_size: int | None = 8192,
) -> rd.Dataset:
    """Hash-join each left batch against a broadcast Arrow table.

    The build side ships through the object store ONCE (``ray.put``);
    every map task reads the same shared copy (zero-copy on a node).
    Uses ``pyarrow.Table.join`` per batch — vectorized, no Python rows.
    """
    right_ref = ray.put(right)

    def join_batch(batch: pa.Table) -> pa.Table:
        build = ray.get(right_ref)
        return batch.join(build, keys=on, join_type=how)

    return left.map_batches(join_batch, batch_format="pyarrow", batch_size=batch_size)


def default_join_partitions(size_bytes: int | None = None) -> int:
    """Partition count for native hash joins.

    Two rules, both measured on this engine:

    - CPU cap: the hash-shuffle aggregators are ACTORS that reserve
      scheduler slots; oversubscribing them starves the map tasks and
      deadlocks small clusters (measured: num_partitions=32 hangs a
      4-CPU session, 16 runs).  cpus//2 keeps aggregators and
      producers co-scheduled at any cluster size.
    - Data sizing: aggregator-actor SPAWN cost scales with partition
      count, so small inputs want few partitions (measured at
      sf0.1/32cpu on the j8 plan: 8 parts 7.0s, 16 parts 10.8s,
      32 parts 19.8s for identical output).  When the caller knows the
      shuffled byte volume (e.g. a staged build side's metadata), pass
      it: partitions = ceil(size / 128 MB), clamped to [4, cpu cap].
      At real scale the byte rule dominates and keeps partitions at
      the ~100-500 MB sweet spot."""
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    cap = max(4, cpus // 2)
    if size_bytes is None:
        return cap
    target = 128 << 20
    return max(4, min(cap, -(-int(size_bytes) // target)))


def staged_size_bytes(staged: rd.Dataset) -> int:
    """Total byte size of a MATERIALIZED dataset from block metadata —
    no scan, no collect."""
    return sum(b.size_bytes() or 0 for b in staged.iter_internal_ref_bundles())


def hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: list[str],
    how: str = "inner",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Both-sides-large shuffle join (Ray native hash join)."""
    return left.join(
        right,
        join_type=how,
        num_partitions=num_partitions or default_join_partitions(),
        on=tuple(on),
    )


def staged_nonempty(right: rd.Dataset, max_blocks: int = 64) -> rd.Dataset | None:
    """Stage + compact a join build side; None if it has no rows.

    Ray 2.49's hash-shuffle join broadcasts an input's schema exactly
    once — on that input's FIRST block.  If that block is empty (a
    filter-heavy chain commonly yields leading zero-row blocks), the
    broadcast is consumed without delivering anything, and aggregators
    whose partitions receive no rows finalize against a schema-less
    empty table (ArrowInvalid: no match for FieldRef).  Staging
    (block-distributed ``materialize`` — spillable, never
    driver-sized) then repartitioning to ``min(max_blocks, rows)``
    guarantees every block is non-empty, so the first block always
    carries the schema.  ``count()`` on the staged copy is
    metadata-only."""
    staged = right.materialize()
    n = staged.count()
    if n == 0:
        return None
    return staged.repartition(min(max_blocks, n)).materialize()


def shuffle_semi_join(
    left: rd.Dataset, right: rd.Dataset, on: list[str], num_partitions: int | None = None
) -> rd.Dataset:
    """Both-sides-large semi join (native hash-partitioned left_semi).
    Use when the right side is too big to broadcast — e.g. dropping
    near-dup losers at web scale."""
    staged = staged_nonempty(right)
    if staged is None:
        return left.limit(0)
    return left.join(
        staged,
        join_type="left_semi",
        num_partitions=num_partitions or default_join_partitions(),
        on=tuple(on),
    )


def shuffle_anti_join(
    left: rd.Dataset, right: rd.Dataset, on: list[str], num_partitions: int | None = None
) -> rd.Dataset:
    """Both-sides-large anti join (native hash-partitioned left_anti).
    An empty right side short-circuits to ``left`` unchanged."""
    staged = staged_nonempty(right)
    if staged is None:
        return left
    return left.join(
        staged,
        join_type="left_anti",
        num_partitions=num_partitions or default_join_partitions(),
        on=tuple(on),
    )


# Broadcast membership filters collect the right side's KEYS to the
# driver; above this byte budget (key columns only, from staged block
# metadata) they reroute to the shuffle variants instead of
# materializing a corpus on the driver.
BROADCAST_KEYS_MAX_BYTES = 256 << 20


def _key_table(table_or_ds, on: list[str]) -> pa.Table | None:
    """DISTINCT key columns of the right side as one Arrow table, or
    None if it is too big to collect (Dataset whose key columns exceed
    BROADCAST_KEYS_MAX_BYTES by staged metadata) — callers must then
    fall back to a shuffle."""
    if isinstance(table_or_ds, rd.Dataset):
        staged = table_or_ds.select_columns(list(on)).materialize()
        if staged_size_bytes(staged) > BROADCAST_KEYS_MAX_BYTES:
            return None
        blocks = [
            b
            for b in ray.get(
                [
                    ref
                    for bundle in staged.iter_internal_ref_bundles()
                    for ref in bundle.block_refs
                ]
            )
            if b.num_rows > 0
        ]
        if not blocks:
            return table_or_ds.schema().base_schema.empty_table().select(list(on))
        t = pa.concat_tables(blocks)
    else:
        t = table_or_ds.select(list(on))
    return t.group_by(list(on)).aggregate([])


def broadcast_semi_join(left: rd.Dataset, right, on: list[str]) -> rd.Dataset:
    """Keep left rows whose key appears in right (small right side;
    a right side over the broadcast key budget reroutes to
    ``shuffle_semi_join``)."""
    return _membership_filter(left, right, on, keep=True)


def broadcast_anti_join(left: rd.Dataset, right, on: list[str]) -> rd.Dataset:
    """Keep left rows whose key does NOT appear in right (oversized
    right side reroutes to ``shuffle_anti_join``)."""
    return _membership_filter(left, right, on, keep=False)


def _membership_filter(left: rd.Dataset, right, on: list[str], keep: bool) -> rd.Dataset:
    keys = _key_table(right, on)
    if keys is None:
        return (shuffle_semi_join if keep else shuffle_anti_join)(left, right, on)
    if len(on) == 1:
        value_set = keys.column(on[0]).combine_chunks()
        col = on[0]
        keys_ref = ray.put(value_set)

        def filt(batch: pa.Table) -> pa.Table:
            vs = ray.get(keys_ref)
            mask = pc.is_in(batch[col], value_set=vs)
            if not keep:
                mask = pc.invert(pc.fill_null(mask, False))
            return batch.filter(pc.fill_null(mask, False if keep else True))

        return left.map_batches(filt, batch_format="pyarrow")

    keys_ref = ray.put(keys)

    def filt_multi(batch: pa.Table) -> pa.Table:
        # Vectorized multi-key membership: per-batch Arrow semi/anti
        # hash join against the broadcast distinct-key table, with a
        # row index to restore the input order the join discards.
        ks = ray.get(keys_ref)
        import numpy as np

        b = batch.append_column(
            "__row", pa.array(np.arange(batch.num_rows, dtype=np.int64))
        )
        out = b.join(ks, keys=on, join_type="left semi" if keep else "left anti")
        return out.sort_by("__row").drop_columns("__row")

    return left.map_batches(filt_multi, batch_format="pyarrow")


def smart_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: list[str],
    how: str = "inner",
    broadcast_threshold_bytes: int = 64 << 20,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Cost-based physical join choice — the optimizer decision every
    SQL engine makes, spelled out over Dataset metadata:

    - build side (right) under ``broadcast_threshold_bytes`` (from block
      METADATA after staging — no extra scan): collect it to a single
      Arrow table and ``broadcast_join`` (zero shuffle; the probe side
      streams);
    - otherwise: native hash-shuffle ``hash_join``, BOTH sides staged
      against the Ray 2.49 empty-first-block schema-broadcast trap
      (the trap bites on either input's first block), partitions sized
      to the staged build's byte volume.

    The right side is staged either way (``materialize`` — spillable,
    block-distributed, never driver-sized), so sizing it is free.
    Empty build side short-circuits through the broadcast path with an
    empty Arrow table: 0 rows for inner / all-null right columns for
    left_outer, with the CORRECT joined schema (a bare ``left.limit(0)``
    would drop the right-side columns)."""
    staged = right.materialize()
    total = staged_size_bytes(staged)
    if staged.count() == 0:
        if how not in ("inner", "left_outer"):
            raise ValueError(
                "smart_join: empty build side is only short-circuitable "
                "for inner/left_outer — use hash_join for other types"
            )
        empty = staged.schema().base_schema.empty_table()
        arrow_how = {"inner": "inner", "left_outer": "left outer"}[how]
        return broadcast_join(left, empty, on=on, how=arrow_how)
    if total <= broadcast_threshold_bytes and how in ("inner", "left_outer"):
        # Zero-row blocks can be SCHEMA-LESS zero-column tables (Ray
        # 2.49 empty map outputs) — concat_tables rejects them
        # (ArrowInvalid "Schema at index N was different"), so drop
        # them before the concat; n > 0 guarantees at least one
        # non-empty block survives.
        blocks = ray.get(
            [
                ref
                for bundle in staged.iter_internal_ref_bundles()
                for ref in bundle.block_refs
            ]
        )
        build = pa.concat_tables(b for b in blocks if b.num_rows > 0)
        arrow_how = {"inner": "inner", "left_outer": "left outer"}[how]
        return broadcast_join(left, build, on=on, how=arrow_how)
    compacted = staged_nonempty(staged)
    lstaged = left.materialize()
    if lstaged.count() == 0:
        # Empty probe side: Ray 2.49's native join crashes on it
        # (ArrowInvalid in the aggregators — the schema broadcast rides
        # on the first block and there is none), so construct the
        # result directly.  Row-lambda filter chains can leave an empty
        # probe with NO recoverable schema; the empty staged copy is
        # returned then (0 rows either way).
        ls = lstaged.schema()
        left_schema = ls.base_schema if ls is not None else None
        if how in ("left_semi", "left_anti") or left_schema is None:
            return lstaged
        if how in ("inner", "left_outer"):
            joined_schema = left_schema.empty_table().join(
                staged.schema().base_schema.empty_table(),
                keys=on,
                join_type="inner",
            ).schema
            return rd.from_arrow(joined_schema.empty_table())
        if how == "full_outer":
            null_cols = [f for f in left_schema if f.name not in on]

            def add_left_nulls(t: pa.Table) -> pa.Table:
                for f in null_cols:
                    t = t.append_column(f.name, pa.nulls(t.num_rows, f.type))
                return t

            return compacted.map_batches(add_left_nulls, batch_format="pyarrow")
        raise ValueError(f"smart_join: empty probe side unsupported for {how}")
    # Stage the probe against the same empty-first-block trap — but
    # only pay a compaction when an empty block actually exists (the
    # probe can be the big fact side; blindly repartitioning it to a
    # fixed small block count would destroy parallelism at scale).
    block_rows = [
        m.num_rows
        for bundle in lstaged.iter_internal_ref_bundles()
        for m in bundle.metadata
    ]
    if any(r == 0 for r in block_rows):
        nonempty = sum(1 for r in block_rows if r and r > 0)
        lstaged = lstaged.repartition(max(1, nonempty)).materialize()
    return hash_join(
        lstaged, compacted, on=on, how=how,
        num_partitions=num_partitions or default_join_partitions(total),
    )
