"""smart_join picks broadcast under the size threshold and hash-shuffle
above it, with identical results either way."""

from __future__ import annotations

import pyarrow as pa
import pytest

from reden_ray.stages.joins import hash_join, smart_join


def _ds(tbl: pa.Table, blocks: int = 3):
    import numpy as np
    import ray.data as rd

    idx = np.array_split(np.arange(tbl.num_rows), blocks)
    return rd.from_arrow([tbl.take(pa.array(i)) for i in idx])


def _sorted_rows(ds):
    return sorted(
        (tuple(sorted(r.items())) for r in ds.take_all()), key=repr
    )


def test_smart_join_both_paths_equal(ray_session):
    left = pa.table({"k": pa.array(range(100), pa.int64()),
                     "lv": pa.array([f"l{i}" for i in range(100)])})
    right = pa.table({"k": pa.array(range(0, 100, 2), pa.int64()),
                      "rv": pa.array([f"r{i}" for i in range(50)])})
    lds, rds = _ds(left), _ds(right)

    small = smart_join(lds, rds, on=["k"], broadcast_threshold_bytes=64 << 20)
    big = smart_join(_ds(left), _ds(right), on=["k"], broadcast_threshold_bytes=1)
    ref = hash_join(_ds(left), _ds(right), on=["k"])
    assert _sorted_rows(small) == _sorted_rows(big) == _sorted_rows(ref)
    assert small.count() == 50


def test_smart_join_left_outer_broadcast(ray_session):
    left = pa.table({"k": pa.array([1, 2, 3], pa.int64())})
    right = pa.table({"k": pa.array([2], pa.int64()),
                      "rv": pa.array(["x"])})
    out = smart_join(_ds(left, 2), _ds(right, 1), on=["k"], how="left_outer")
    rows = {r["k"]: r["rv"] for r in out.take_all()}
    assert rows == {1: None, 2: "x", 3: None}


def test_smart_join_empty_build(ray_session):
    left = pa.table({"k": pa.array([1, 2], pa.int64())})
    empty = pa.table({"k": pa.array([], pa.int64()), "rv": pa.array([], pa.string())})
    out = smart_join(_ds(left, 1), _ds(empty, 1), on=["k"])
    assert out.count() == 0
    # the joined schema survives the short-circuit (not just left's)
    assert set(out.schema().names) == {"k", "rv"}
    outer = smart_join(_ds(left, 1), _ds(empty, 1), on=["k"], how="left_outer")
    rows = {r["k"]: r["rv"] for r in outer.take_all()}
    assert rows == {1: None, 2: None}
    with pytest.raises(ValueError, match="short-circuitable"):
        smart_join(_ds(left, 1), _ds(empty, 1), on=["k"], how="full_outer")
