"""Sorted-neighborhood blocking: global rank without a sort, window
pair completeness/uniqueness vs a pure-python reference."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from reden_ray.stages.snm import (
    elementwise_jw,
    global_rank_by_key,
    sorted_neighborhood_pairs,
)

ROWS = [
    (1, "smith john"), (2, "smith jon"), (3, "smyth john"), (4, "adams a"),
    (5, "adams b"), (6, "zzz tail"), (7, ""), (8, "smith john"),
    (9, "miller x"), (10, "millar x"),
]


def _ds(rows, blocks=3):
    return rd.from_arrow(
        pa.table(
            {
                "id": pa.array([r[0] for r in rows], pa.int64()),
                "name": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    ).repartition(blocks)


def _ref_rank(rows):
    return {
        rid: i
        for i, (rid, _) in enumerate(
            sorted(rows, key=lambda r: (r[1], r[0]))
        )
    }


def _ref_pairs(rows, w):
    rk = _ref_rank(rows)
    by_rank = sorted(rows, key=lambda r: rk[r[0]])
    out = set()
    for i in range(len(by_rank)):
        for j in range(i + 1, min(i + w, len(by_rank))):
            out.add((by_rank[i][0], by_rank[j][0]))
    return out


@pytest.mark.parametrize("n_buckets", [4, 256])
def test_global_rank(ray_session, n_buckets):
    got = {
        r["id"]: r["rank"]
        for r in global_rank_by_key(_ds(ROWS), "name", "id", n_buckets).take_all()
    }
    assert got == _ref_rank(ROWS)


@pytest.mark.parametrize("window", [2, 4, 7])
def test_window_pairs(ray_session, window):
    got = [
        r
        for r in sorted_neighborhood_pairs(
            _ds(ROWS), "name", "id", window=window, n_buckets=8
        ).take_all()
    ]
    pairs = {(r["id_a"], r["id_b"]) for r in got}
    assert len(pairs) == len(got)  # emitted exactly once
    assert pairs == _ref_pairs(ROWS, window)
    rk = _ref_rank(ROWS)
    for r in got:  # ranks ride correctly
        assert r["rank_a"] == rk[r["id_a"]] and r["rank_b"] == rk[r["id_b"]]
        assert 0 < r["rank_b"] - r["rank_a"] < window


def test_elementwise_jw_matches_duckdb(ray_session):
    import duckdb

    a = ["smith john", "smith john", "adams a", "", "millar x"]
    b = ["smith jon", "smyth john", "adams b", "x", "miller x"]
    got = elementwise_jw(a, b)
    for x, y, g in zip(a, b, got):
        want = duckdb.sql(
            "SELECT jaro_winkler_similarity(?, ?)", params=[x, y]
        ).fetchone()[0]
        assert g == pytest.approx(want, abs=0), (x, y)
