"""Skew-aware (salted / hot-key split) join.

The north rule calls out explicit skew handling: at web scale a join
key's frequency is Zipfian (famous entities, boilerplate URLs), and a
plain hash join sends EVERY row of a hot key to one aggregator
partition — one straggler task holds the whole stage.  Reference
analogue: REDEN's per-context loop never joins, but its hot-URI
problem (high-degree DBpedia entities) is the same skew in graph form
(`nelinker/GraphHandlerNEL.java:211-343` fuses neighborhoods of
famous authors serially); the salted split is the distributed answer.

Strategy (the classic two-path skew join, spelled out over Dataset
metadata — no config knobs a user must guess):

1. **Detect** hot probe keys with an exact distributed count:
   per-block partial counts pre-combined inside ``map_batches`` (one
   row per (block, key)), then ONE small groupby — the shuffle moves
   at most ``n_blocks × n_distinct_keys_per_block`` rows, never the
   fact table.  Keys with ``count >= hot_threshold`` are collected to
   the driver; a ``max_hot_keys`` guard caps that collect (hot keys
   are FEW by definition — if the guard trips, the threshold is
   wrong, and we raise rather than silently materialize a key table).
2. **Split** both sides with a vectorized ``is_in`` mask.
3. **Hot path**: the build-side rows for hot keys (small — a handful
   of keys) broadcast via ``ray.put``; the hot probe rows stream
   through ``broadcast_join`` with NO shuffle, so a hot key's rows
   stay spread across all their input blocks instead of piling into
   one hash partition.
4. **Cold path**: regular ``hash_join`` — skew-free by construction.
5. Union.  Row-identical to a plain join (oracled: ``j15_skew_join``).

At 100 TB the hot-key count table is the only all-to-all traffic
before the cold join, and it is pre-combined to ~unique-keys volume.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from .joins import (
    broadcast_join,
    default_join_partitions,
    hash_join,
    staged_nonempty,
    staged_size_bytes,
)


def hot_keys(
    probe: rd.Dataset,
    key: str,
    hot_threshold: int,
    max_hot_keys: int = 10_000,
) -> pa.Array:
    """Exact probe-side keys with frequency >= hot_threshold.

    Per-block partial counts (arrow ``group_by`` inside the map — the
    combiner) keep the groupby input at unique-keys-per-block volume.
    """

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([key]).group_by([key]).aggregate([([], "count_all")])
        return g.rename_columns([key, "n"])

    counts = (
        probe.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(key)
        .sum("n")
    )
    thr = int(hot_threshold)

    def over(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column("sum(n)"), thr)).select([key])

    hot = counts.map_batches(over, batch_format="pyarrow", batch_size=None)
    got = hot.take_all()  # bounded: hot keys only, guarded below
    if len(got) > max_hot_keys:
        raise ValueError(
            f"skew_join: {len(got)} keys exceed hot_threshold="
            f"{hot_threshold} (cap {max_hot_keys}) — threshold too low "
            "for this key distribution; raise it or use a plain hash_join"
        )
    return pa.array([r[key] for r in got])


def skew_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    how: str = "inner",
    hot_threshold: int = 100_000,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Inner/left-outer join of a skewed probe (left) against a build
    side (right), splitting hot keys onto a broadcast path.

    ``right`` must be key-unique-ish on the hot keys (the broadcast
    slice ships whole); the cold path is a regular shuffle join.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"skew_join supports inner/left_outer, got {how}")
    hot = hot_keys(left, on, hot_threshold)
    rstaged = staged_nonempty(right.materialize())
    if rstaged is None:  # empty build side
        if how == "inner":
            return left.limit(0)
        return hash_join(left, right, on=[on], how=how)
    if len(hot) == 0:
        return hash_join(
            left,
            rstaged,
            on=[on],
            how=how,
            num_partitions=num_partitions
            or default_join_partitions(staged_size_bytes(rstaged)),
        )
    hot_ref = ray.put(hot)

    def split(t: pa.Table, keep_hot: bool) -> pa.Table:
        mask = pc.is_in(t.column(on), value_set=ray.get(hot_ref))
        return t.filter(mask if keep_hot else pc.invert(mask))

    left_hot = left.map_batches(
        split, batch_format="pyarrow", batch_size=None, fn_args=(True,)
    )
    left_cold = left.map_batches(
        split, batch_format="pyarrow", batch_size=None, fn_args=(False,)
    )
    # Build-side hot slice: few keys -> small table; collect via the
    # staged blocks (never the probe side).
    right_hot_ds = rstaged.map_batches(
        split, batch_format="pyarrow", batch_size=None, fn_args=(True,)
    ).materialize()
    blocks = ray.get(
        [
            ref
            for bundle in right_hot_ds.iter_internal_ref_bundles()
            for ref in bundle.block_refs
        ]
    )
    nonempty = [b for b in blocks if b.num_rows > 0]
    right_hot = (
        pa.concat_tables(nonempty)
        if nonempty
        else rstaged.schema().base_schema.empty_table()
    )
    arrow_how = {"inner": "inner", "left_outer": "left outer"}[how]
    joined_hot = broadcast_join(left_hot, right_hot, on=[on], how=arrow_how)
    right_cold = staged_nonempty(
        rstaged.map_batches(
            split, batch_format="pyarrow", batch_size=None, fn_args=(False,)
        ).materialize()
    )
    if right_cold is None:
        if how == "inner":
            return joined_hot
        empty_cold = rstaged.schema().base_schema.empty_table()
        return joined_hot.union(
            broadcast_join(left_cold, empty_cold, on=[on], how="left outer")
        )
    joined_cold = hash_join(
        left_cold,
        right_cold,
        on=[on],
        how=how,
        num_partitions=num_partitions
        or default_join_partitions(staged_size_bytes(right_cold)),
    )
    return joined_hot.union(joined_cold)
