"""lag-1 autocorrelation: agreement with numpy corrcoef and with
DuckDB corr(v, lead(v)) on a synthetic stream."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from reden_ray.stages.tseries import lag1_autocorr


def _events():
    rng = np.random.RandomState(3)
    rows = []
    eid = 0
    for user in range(1, 8):
        n = [1, 2, 3, 5, 30, 40, 25][user - 1]
        base = rng.randn()
        for i in range(n):
            val = 5.0 if user == 4 else float(np.round(base + rng.randn(), 2))
            rows.append((user, eid, np.datetime64("2020-01-01") + np.timedelta64(eid, "m"), val))
            eid += 1
    return rows


def _ds(rows, blocks=3):
    return rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array([pd.Timestamp(r[2]) for r in rows], pa.timestamp("us")),
                "value": pa.array([r[3] for r in rows], pa.float64()),
            }
        )
    ).repartition(blocks)


def test_matches_numpy(ray_session):
    rows = _events()
    got = {
        r["user_id"]: (r["n_pairs"], r["acf1"])
        for r in lag1_autocorr(_ds(rows)).take_all()
    }
    # users 1 (n=1), 2 (n=2) too short; user 4 constant -> no row
    assert set(got) == {3, 5, 6, 7}
    for user in got:
        vals = [r[3] for r in rows if r[0] == user]
        x, y = np.array(vals[:-1]), np.array(vals[1:])
        want = np.corrcoef(x, y)[0, 1]
        assert got[user][0] == len(x)
        assert got[user][1] == pytest.approx(round(want, 6), abs=1e-6)


def test_matches_duckdb(ray_session):
    import duckdb

    rows = _events()
    got = {
        r["user_id"]: r["acf1"] for r in lag1_autocorr(_ds(rows)).take_all()
    }
    df = pd.DataFrame(rows, columns=["user_id", "event_id", "ts", "value"])
    want = duckdb.sql(
        """
        WITH w AS (SELECT user_id, value,
          lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
          FROM df)
        SELECT user_id, ROUND(corr(value, nxt), 6) AS acf1 FROM w
        WHERE nxt IS NOT NULL GROUP BY 1 HAVING corr(value, nxt) IS NOT NULL
        """
    ).df()
    want_map = dict(zip(want["user_id"], want["acf1"]))
    assert got == pytest.approx(want_map, abs=1e-6)


def test_mann_kendall_small(ray_session):
    from reden_ray.stages.tseries import mann_kendall_s

    rows = [
        # user 1: strictly increasing (S = C(4,2) = 6)
        (1, 0, np.datetime64("2020-01-01T00:00"), 1.0),
        (1, 1, np.datetime64("2020-01-01T00:01"), 2.0),
        (1, 2, np.datetime64("2020-01-01T00:02"), 3.0),
        (1, 3, np.datetime64("2020-01-01T00:03"), 4.0),
        # user 2: decreasing with a tie (pairs: 3 down, tie 0 -> S=-2... )
        (2, 4, np.datetime64("2020-01-01T00:00"), 5.0),
        (2, 5, np.datetime64("2020-01-01T00:01"), 5.0),
        (2, 6, np.datetime64("2020-01-01T00:02"), 1.0),
        # user 3: single event -> no row
        (3, 7, np.datetime64("2020-01-01T00:00"), 9.0),
    ]
    got = {
        r["user_id"]: (r["n_events"], r["s_stat"])
        for r in mann_kendall_s(_ds(rows)).take_all()
    }
    assert got == {1: (4, 6), 2: (3, -2)}


def test_cusum_max_small(ray_session):
    from reden_ray.stages.tseries import cusum_max

    rows = [
        # user 1 cents: 150, 50, 150, 150 vs target 100 ->
        # d = 50, -50, 50, 50; S = 50, 0, 50, 100 -> max 100
        (1, 0, np.datetime64("2020-01-01T00:00"), 1.50),
        (1, 1, np.datetime64("2020-01-01T00:01"), 0.50),
        (1, 2, np.datetime64("2020-01-01T00:02"), 1.50),
        (1, 3, np.datetime64("2020-01-01T00:03"), 1.50),
        # user 2: always below target -> max 0
        (2, 4, np.datetime64("2020-01-01T00:00"), 0.10),
        (2, 5, np.datetime64("2020-01-01T00:01"), 0.20),
    ]
    got = {
        r["user_id"]: (r["n_events"], r["max_cusum"])
        for r in cusum_max(_ds(rows), target_cents=100).take_all()
    }
    assert got == {1: (4, 100), 2: (2, 0)}
