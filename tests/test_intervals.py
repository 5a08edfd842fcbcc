"""Tests for stages/intervals.py (range + interval joins)."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from reden_ray.stages.intervals import broadcast_range_join, interval_join


def test_range_join_bands():
    vals = [0.0, 10.0, 49.9, 50.0, 99.0, 150.0, -5.0, 200.0]
    ds = rd.from_arrow(
        pa.table({"id": list(range(len(vals))), "v": pa.array(vals, pa.float64())})
    )
    out = broadcast_range_join(
        ds, "v", edges=[0, 50, 100, 200], labels=["a", "b", "c"]
    ).to_pandas().sort_values("id")
    assert list(out["band"]) == ["a", "a", "a", "b", "b", "c", None, None]


def _naive_interval_join(ev, iv):
    out = []
    for e in ev:
        for s in iv:
            if e["k"] == s["k"] and s["lo"] <= e["t"] <= s["hi"]:
                out.append((e["k"], e["t"], s["lo"], s["hi"], s["tag"]))
    return sorted(out)


@pytest.mark.parametrize("seed", [0, 7])
def test_interval_join_matches_naive(seed):
    rng = np.random.RandomState(seed)
    ivs = []
    for k in range(6):
        t = 0
        for i in range(rng.randint(1, 5)):
            lo = t + rng.randint(1, 10)
            hi = lo + rng.randint(0, 15)
            t = hi + 1  # non-overlapping by construction
            ivs.append({"k": k, "lo": lo, "hi": hi, "tag": f"{k}-{i}"})
    evs = [
        {"k": int(rng.randint(0, 7)), "t": int(rng.randint(0, 80)), "eid": j}
        for j in range(300)
    ]
    ev_ds = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([e["k"] for e in evs], pa.int64()),
                "t": pa.array([e["t"] for e in evs], pa.int64()),
                "eid": pa.array([e["eid"] for e in evs], pa.int64()),
            }
        )
    ).repartition(5)
    iv_ds = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([s["k"] for s in ivs], pa.int64()),
                "lo": pa.array([s["lo"] for s in ivs], pa.int64()),
                "hi": pa.array([s["hi"] for s in ivs], pa.int64()),
                "tag": pa.array([s["tag"] for s in ivs], pa.string()),
            }
        )
    ).repartition(3)
    got = interval_join(
        ev_ds, iv_ds, key="k", ts_col="t", start_col="lo", end_col="hi",
        interval_cols=["tag"], n_partitions=4,
    ).to_pandas()
    got_set = sorted(
        (r.k, r.t, r.lo, r.hi, r.tag) for r in got.itertuples()
    )
    assert got_set == _naive_interval_join(evs, ivs)


def test_interval_join_overlap_detected():
    iv = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1], pa.int64()),
                "lo": pa.array([0, 5], pa.int64()),
                "hi": pa.array([10, 20], pa.int64()),
                "tag": pa.array(["a", "b"], pa.string()),
            }
        )
    )
    ev = rd.from_arrow(
        pa.table({"k": pa.array([1], pa.int64()), "t": pa.array([7], pa.int64())})
    )
    with pytest.raises(Exception, match="overlap"):
        interval_join(
            ev, iv, key="k", ts_col="t", start_col="lo", end_col="hi",
            interval_cols=["tag"], n_partitions=2, validate=True,
        ).materialize()
