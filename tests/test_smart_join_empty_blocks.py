"""Regression: smart_join's broadcast collect vs zero-column empty blocks.

The round-3 driver crashed j11_smart_join with
``ArrowInvalid: Schema at index 25 was different: ... vs <empty>`` —
Ray 2.49 map tasks that yield no rows can emit SCHEMA-LESS zero-column
blocks, and ``pa.concat_tables`` over the raw materialized block refs
rejects them.  The sf0.01 driver-sim never reproduced it because its
file layout yields no empty map outputs — this test builds the hostile
layout directly: a build side whose materialized form contains several
zero-row blocks (including schema-less zero-column ones) interleaved
with real rows.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from reden_ray.stages.joins import hash_join, smart_join


def _hostile_build_side() -> rd.Dataset:
    """8 input blocks; a map turns most of them into EMPTY outputs —
    the first block is empty by construction (the Ray 2.49 trap), and
    empty outputs are emitted as zero-column tables like the driver's
    failing layout."""
    blocks = [
        pa.table(
            {
                "k": pa.array([i], pa.int64()),
                "rv": pa.array([f"r{i}"], pa.string()),
            }
        )
        for i in range(8)
    ]
    ds = rd.from_arrow(blocks)

    def drop_most(t: pa.Table) -> pa.Table:
        if t.num_rows and t.column("k")[0].as_py() in (3, 5):
            return t
        return pa.table({})  # schema-less empty block

    return ds.map_batches(drop_most, batch_format="pyarrow", batch_size=None)


def test_smart_join_broadcast_survives_zero_column_blocks(ray_session):
    left = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(list(range(8)), pa.int64()),
                "lv": pa.array([f"l{i}" for i in range(8)], pa.string()),
            }
        )
    )
    out = smart_join(left, _hostile_build_side(), on=["k"])
    rows = {r["k"]: r["rv"] for r in out.take_all()}
    assert rows == {3: "r3", 5: "r5"}


def test_smart_join_hash_path_survives_empty_probe_blocks(ray_session):
    """ADVICE r3: the hash path must stage the PROBE side too — a
    filter-heavy left chain with a leading zero-row block hits the
    same schema-broadcast trap inside the aggregators."""
    right = rd.from_arrow(
        [
            pa.table(
                {
                    "k": pa.array(list(range(i * 4, i * 4 + 4)), pa.int64()),
                    "rv": pa.array([f"r{j}" for j in range(i * 4, i * 4 + 4)]),
                }
            )
            for i in range(4)
        ]
    )
    left_blocks = [
        pa.table(
            {
                "k": pa.array([i], pa.int64()),
                "lv": pa.array([f"l{i}"], pa.string()),
            }
        )
        for i in range(8)
    ]

    def drop_first_blocks(t: pa.Table) -> pa.Table:
        if t.num_rows and t.column("k")[0].as_py() < 6:
            return pa.table({})
        return t

    left = rd.from_arrow(left_blocks).map_batches(
        drop_first_blocks, batch_format="pyarrow", batch_size=None
    )
    out = smart_join(left, right, on=["k"], broadcast_threshold_bytes=0)
    rows = {r["k"]: r["rv"] for r in out.take_all()}
    assert rows == {6: "r6", 7: "r7"}


def test_smart_join_hash_path_empty_probe_short_circuits(ray_session):
    right = rd.from_arrow(
        pa.table({"k": pa.array([1, 2], pa.int64()), "rv": pa.array(["a", "b"])})
    )
    # Arrow-level (batch) filter preserves schema through emptiness, so
    # the short-circuit can build the full joined schema.
    left = rd.from_arrow(
        pa.table({"k": pa.array([1], pa.int64()), "lv": pa.array(["x"])})
    ).map_batches(lambda t: t.slice(0, 0), batch_format="pyarrow")
    out = smart_join(left, right, on=["k"], broadcast_threshold_bytes=0)
    assert out.count() == 0
    assert set(out.schema().names) == {"k", "lv", "rv"}

    # Row-lambda filter chains lose the schema entirely (Ray returns
    # schema None) — documented behavior: still 0 rows, no crash.
    left2 = rd.from_arrow(
        pa.table({"k": pa.array([1], pa.int64()), "lv": pa.array(["x"])})
    ).filter(lambda r: False)
    out2 = smart_join(left2, right, on=["k"], broadcast_threshold_bytes=0)
    assert out2.count() == 0
