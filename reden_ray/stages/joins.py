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


def default_join_partitions() -> int:
    """CPU-sized partition count for native hash joins.

    The hash-shuffle aggregators are ACTORS that reserve scheduler
    slots; oversubscribing them starves the map tasks and deadlocks
    small clusters (measured: num_partitions=32 hangs a 4-CPU session,
    16 runs).  cpus//2 keeps aggregators and producers co-scheduled at
    any cluster size; multi-node callers with big keyspaces should pass
    an explicit count."""
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(4, cpus // 2)


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


def _key_set(table_or_ds, on: list[str]) -> set[tuple]:
    if isinstance(table_or_ds, rd.Dataset):
        cols = [on_col for on_col in on]
        rows = table_or_ds.select_columns(cols).take_all()
        return {tuple(r[c] for c in on) for r in rows}
    t = table_or_ds
    return set(zip(*[t.column(c).to_pylist() for c in on]))


def broadcast_semi_join(left: rd.Dataset, right, on: list[str]) -> rd.Dataset:
    """Keep left rows whose key appears in right (small right side)."""
    return _membership_filter(left, right, on, keep=True)


def broadcast_anti_join(left: rd.Dataset, right, on: list[str]) -> rd.Dataset:
    """Keep left rows whose key does NOT appear in right."""
    return _membership_filter(left, right, on, keep=False)


def _membership_filter(left: rd.Dataset, right, on: list[str], keep: bool) -> rd.Dataset:
    keys = _key_set(right, on)
    if len(on) == 1:
        value_set = pa.array([k[0] for k in keys])
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
        ks = ray.get(keys_ref)
        cols = [batch.column(c).to_pylist() for c in on]
        mask = pa.array([(tuple(vals) in ks) == keep for vals in zip(*cols)], pa.bool_())
        return batch.filter(mask)

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
    - otherwise: native hash-shuffle ``hash_join``, both sides staged
      against the Ray 2.49 empty-first-block schema-broadcast trap.

    The right side is staged either way (``materialize`` — spillable,
    block-distributed, never driver-sized), so sizing it is free.
    Empty build side short-circuits through the broadcast path with an
    empty Arrow table: 0 rows for inner / all-null right columns for
    left_outer, with the CORRECT joined schema (a bare ``left.limit(0)``
    would drop the right-side columns)."""
    staged = right.materialize()
    total = sum(
        b.size_bytes() or 0 for b in staged.iter_internal_ref_bundles()
    )
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
        import pyarrow as _pa

        build = _pa.concat_tables(
            ray.get([ref for bundle in staged.iter_internal_ref_bundles()
                     for ref in bundle.block_refs])
        )
        arrow_how = {"inner": "inner", "left_outer": "left outer"}[how]
        return broadcast_join(left, build, on=on, how=arrow_how)
    compacted = staged_nonempty(staged)
    return hash_join(left, compacted, on=on, how=how,
                     num_partitions=num_partitions)
