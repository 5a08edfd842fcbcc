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
