"""Bloom-filter join prefilter: no false negatives ever, bounded false
positives, and the prefiltered semi join stays EXACTLY equal to the
plain semi join (false positives removed by the exact join)."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data as rd

from reden_ray.stages.bloom import (
    bloom_contains,
    bloom_prefilter,
    bloom_semi_join,
    build_bloom,
)


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    return ray_session


def _ds(keys, col="k", extra=None):
    cols = {col: pa.array(keys, pa.int64())}
    if extra:
        cols.update(extra)
    return rd.from_arrow(pa.table(cols)).repartition(3)


def test_no_false_negatives_and_bounded_fp():
    rng = np.random.default_rng(7)
    members = rng.choice(10**9, size=5000, replace=False).astype(np.int64)
    bits = build_bloom(_ds(members), "k", m_bits=1 << 16, k=4)
    assert bloom_contains(bits, members).all()  # zero false negatives
    probe = rng.choice(10**9, size=20000, replace=False).astype(np.int64)
    non_members = np.setdiff1d(probe, members)
    fp = bloom_contains(bits, non_members).mean()
    # 5k keys in 64k bits, k=4 -> theoretical fpr ~ (1-e^-0.3)^4 ~ 0.5%
    assert fp < 0.05


def test_prefilter_keeps_all_matches():
    members = np.arange(100, 200, dtype=np.int64)
    bits_ref = ray.put(build_bloom(_ds(members), "k", m_bits=1 << 12))
    probe = _ds(list(range(0, 400, 3)))
    kept = {r["k"] for r in bloom_prefilter(probe, bits_ref, "k").take_all()}
    want = {x for x in range(0, 400, 3) if 100 <= x < 200}
    assert want <= kept  # every true match survives


def test_bloom_semi_join_exact():
    rng = np.random.default_rng(3)
    probe_keys = rng.integers(0, 500, size=2000).astype(np.int64)
    build_keys = rng.choice(500, size=60, replace=False).astype(np.int64)
    probe = _ds(
        probe_keys,
        extra={"v": pa.array(np.arange(2000), pa.int64())},
    )
    out = sorted(
        (r["k"], r["v"])
        for r in bloom_semi_join(probe, _ds(build_keys), "k").take_all()
    )
    bset = set(build_keys.tolist())
    want = sorted(
        (int(k), int(v)) for k, v in zip(probe_keys, np.arange(2000)) if int(k) in bset
    )
    assert out == want


def test_bloom_semi_join_empty_build():
    probe = _ds([1, 2, 3])
    empty = _ds([]).filter(lambda r: False)
    assert bloom_semi_join(probe, empty, "k").count() == 0


def test_non_integer_key_rejected():
    ds = rd.from_arrow(pa.table({"k": pa.array(["a", "b"], pa.string())}))
    with pytest.raises((TypeError, Exception)):
        build_bloom(ds, "k")
