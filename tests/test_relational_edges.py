"""Edge cases flagged by the round-3 advisor: empty embedding lists in
f1_vector_norm (the clamped reduceat corrupted the PRECEDING segment of
a trailing empty list) and ragged/sliced inputs to kmeans._vecs."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_f1_vector_norm_empty_segments(ray_session, tmp_path):
    from reden_ray.pipelines.relational import f1_vector_norm

    # [] at the tail is the advisor's reproduced corruption; [] in the
    # middle and a leading [] cover the other placements.
    vecs = [[], [1.0, 2.0, 3.0], [2.0, 2.0], [], [5.0], []]
    t = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
        }
    )
    pq.write_table(t, tmp_path / "embeddings.parquet")
    out = {r["vec_id"]: r["norm"] for r in f1_vector_norm(str(tmp_path)).take_all()}
    expect = {
        0: 0.0,
        1: round(float(np.sqrt(14.0)), 4),
        2: round(float(np.sqrt(8.0)), 4),
        3: 0.0,
        4: 5.0,
        5: 0.0,
    }
    assert out == expect


def test_kmeans_vecs_rejects_ragged(ray_session):
    from reden_ray.stages.kmeans import _vecs

    t = pa.table(
        {
            "vec_id": pa.array([0, 1], pa.int64()),
            "embedding": pa.array([[1.0, 2.0], [3.0]], pa.list_(pa.float64())),
        }
    )
    with pytest.raises(ValueError, match="ragged"):
        _vecs(t, "vec_id", "embedding")


def test_kmeans_vecs_sliced_list_array(ray_session):
    from reden_ray.stages.kmeans import _vecs

    full = pa.table(
        {
            "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
            "embedding": pa.array(
                [[0.0, 0.0], [1.0, 2.0], [3.0, 4.0], [5.0, 6.0]],
                pa.list_(pa.float64()),
            ),
        }
    )
    sliced = full.slice(1, 2)  # nonzero child-buffer offset
    ids, mat = _vecs(sliced, "vec_id", "embedding")
    assert list(ids) == [1, 2]
    assert mat.tolist() == [[1.0, 2.0], [3.0, 4.0]]
