"""asof_join / interval_count (stages/temporal.py) vs naive references.

The naive sides are O(n*m) Python loops — the semantics spec; the
distributed side must match them exactly on randomized inputs that
exercise key collisions, timestamp ties, bucket-boundary windows and
empty sides."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from reden_ray.stages.temporal import asof_join, interval_count


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    return ray_session


def _asof_naive(lid, lk, lt, rk, rt, rtie):
    out = []
    for i in range(len(lid)):
        best = None
        for j in range(len(rk)):
            if rk[j] == lk[i] and rt[j] <= lt[i]:
                cand = (rt[j], rtie[j])
                if best is None or cand > best:
                    best = cand
        out.append(best[1] if best else None)
    return out


def _mk_asof(lid, lk, lt, rk, rt, rtie, parts=5):
    left = rd.from_arrow(
        pa.table(
            {
                "lid": pa.array(lid, pa.int64()),
                "k": pa.array(lk, pa.int64()),
                "t": pa.array(lt, pa.int64()),
            }
        )
    ).repartition(parts)
    right = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(rk, pa.int64()),
                "rt": pa.array(rt, pa.int64()),
                "rid": pa.array(rtie, pa.int64()),
            }
        )
    ).repartition(parts)
    got = asof_join(
        left,
        right,
        left_key="k",
        right_key="k",
        left_ts="t",
        right_ts="rt",
        left_cols=["lid"],
        right_cols=["rid"],
        right_tie="rid",
        n_parts=4,
    ).take_all()
    return {r["lid"]: r["rid"] for r in got}, len(got)


def test_asof_randomized_matches_naive():
    rng = np.random.default_rng(7)
    nl, nr = 300, 120
    lid = np.arange(nl)
    lk = rng.integers(0, 8, nl)  # hot keys, several per partition
    lt = rng.integers(0, 25, nl)  # many timestamp ties
    rk = rng.integers(0, 10, nr)  # some right keys never queried
    rt = rng.integers(0, 25, nr)
    rtie = rng.permutation(nr) + 1000
    want = _asof_naive(lid, lk, lt, rk, rt, rtie)
    got, n = _mk_asof(lid, lk, lt, rk, rt, rtie)
    assert n == nl  # exactly one output row per left row
    assert [got[i] for i in range(nl)] == want


def test_asof_empty_right_is_left_identity():
    got, n = _mk_asof([1, 2], [5, 6], [10, 10], [], [], [])
    assert n == 2 and got == {1: None, 2: None}


def test_asof_unmatched_keys_and_future_only_rows():
    # key 9 absent on the right; key 1's only click is in the future
    got, _ = _mk_asof([0, 1], [9, 1], [10, 10], [1], [11], [42])
    assert got == {0: None, 1: None}


def _interval_naive(pt, ik, istart, width):
    return {
        k: sum(1 for t in pt if s <= t < s + width)
        for k, s in zip(ik, istart)
    }


def test_interval_count_randomized_matches_naive():
    rng = np.random.default_rng(11)
    width = 10
    pt = rng.integers(0, 200, 500)  # duplicates guaranteed
    ik = np.arange(60)
    istart = rng.integers(-15, 210, 60)  # windows straddling buckets + empty
    points = rd.from_arrow(pa.table({"t": pa.array(pt, pa.int64())})).repartition(5)
    intervals = rd.from_arrow(
        pa.table(
            {
                "key": pa.array(ik, pa.int64()),
                "start": pa.array(istart, pa.int64()),
            }
        )
    ).repartition(5)
    got = interval_count(
        points,
        intervals,
        point_ts="t",
        interval_start="start",
        width_us=width,
        interval_key="key",
        out_count="n",
        n_parts=4,
    ).take_all()
    want = _interval_naive(pt, ik, istart, width)
    assert len(got) == len(ik)  # zero-count intervals present
    assert {r["key"]: r["n"] for r in got} == want


def test_interval_count_no_points_all_zero():
    points = rd.from_arrow(pa.table({"t": pa.array([], pa.int64())}))
    intervals = rd.from_arrow(
        pa.table(
            {
                "key": pa.array([1, 2], pa.int64()),
                "start": pa.array([0, 100], pa.int64()),
            }
        )
    )
    got = interval_count(
        points,
        intervals,
        point_ts="t",
        interval_start="start",
        width_us=10,
        interval_key="key",
        out_count="n",
        n_parts=4,
    ).take_all()
    assert {r["key"]: r["n"] for r in got} == {1: 0, 2: 0}
