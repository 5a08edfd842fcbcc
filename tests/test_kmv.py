"""KMV bottom-k sketch: block-split invariance (mergeability), exact
agreement with a pure-python reference, and the integer certificate."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from reden_ray.stages.kmv import (
    kmv_bottom_hashes,
    kmv_distinct_estimate,
    kmv_jaccard_estimate,
)


def _h(v) -> int:
    s = v if isinstance(v, str) else str(int(v))
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


def _ds(vals, blocks=1):
    t = pa.table({"v": pa.array(vals, pa.int64())})
    return rd.from_arrow(t).repartition(blocks)


VALS = [i * 7 % 500 for i in range(2000)]  # 500 distinct, heavy repeats


def _ref_bottom(vals, k):
    return sorted({_h(v) for v in vals})[:k]


@pytest.mark.parametrize("blocks", [1, 7])
def test_bottom_hashes_match_reference(ray_session, blocks):
    from reden_ray.stages.kmv import _unoff

    got = _unoff(
        np.array(
            [r["h"] for r in kmv_bottom_hashes(_ds(VALS, blocks), "v", k=32).take_all()],
            dtype=np.int64,
        )
    ).tolist()
    assert sorted(got) == _ref_bottom(VALS, 32)


def test_estimate_row(ray_session):
    row = kmv_distinct_estimate(_ds(VALS, 5), "v", k=64).take_all()[0]
    ref = _ref_bottom(VALS, 64)
    hk = ref[-1]
    est = (63 << 64) // hk
    assert row["k"] == 64
    assert row["kth_hash"] == hk
    assert row["est_distinct"] == est
    assert row["exact_distinct"] == 500
    assert row["within_3sigma"] == ((est - 500) ** 2 * 62 <= 9 * 500 * 500)
    # sanity: the estimator is actually in the right ballpark
    assert 250 < est < 1000


def test_estimate_fewer_than_k_distinct(ray_session):
    row = kmv_distinct_estimate(_ds([1, 2, 3, 2, 1], 2), "v", k=64).take_all()[0]
    assert row["k"] == 3
    assert row["exact_distinct"] == 3


def test_jaccard_estimate(ray_session):
    a = _ds(list(range(300)), 3)
    b = _ds(list(range(150, 450)), 3)
    row = kmv_jaccard_estimate(a, b, "v", k=64).take_all()[0]
    # exact reference: bottom-64 of the union, count in both
    union = sorted({_h(v) for v in range(450)})[:64]
    in_a = {_h(v) for v in range(300)}
    in_b = {_h(v) for v in range(150, 450)}
    want = sum(1 for h in union if h in in_a and h in in_b)
    assert row["k_used"] == 64
    assert row["matches"] == want
    # true J = 150/450 = 1/3; the estimate should be loosely near it
    assert 0.1 < want / 64 < 0.6
