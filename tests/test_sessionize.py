import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def naive_sessions(df: pd.DataFrame, gap_seconds: int = 1800) -> pd.DataFrame:
    """The single-pass per-user reference (round-2 implementation)."""
    out = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        gap = g["ts"].diff().dt.total_seconds().fillna(0.0)
        sid = (gap > gap_seconds).cumsum()
        agg = (
            g.assign(session_id=sid)
            .groupby("session_id", as_index=False)
            .agg(n_events=("event_id", "count"), first_event=("event_id", "min"))
        )
        agg["user_id"] = uid
        out.append(agg[["user_id", "session_id", "n_events", "first_event"]])
    return pd.concat(out, ignore_index=True)


def _run_sessionize(tmpdir: str):
    from reden_ray.pipelines.relational import sessionize

    got = sessionize(tmpdir).to_pandas()
    return got.sort_values(["user_id", "session_id"]).reset_index(drop=True)


_check_seq = [0]


def _check(events: pd.DataFrame, tmp_path, n_files: int = 4):
    """Write events SHARDED (so partial sessions really span blocks),
    run the distributed sessionize, compare to the naive pass."""
    _check_seq[0] += 1
    d = tmp_path / f"sf{_check_seq[0]}"
    d.mkdir()
    # shard round-robin: consecutive events of one user land in
    # DIFFERENT files, the adversarial layout for boundary stitching
    for i in range(n_files):
        pq.write_table(
            pa.Table.from_pandas(events.iloc[i::n_files], preserve_index=False),
            f"{d}/events_{i}.parquet",
        )
    import os
    os.rename(f"{d}/events_0.parquet", f"{d}/tmp.parquet")
    os.mkdir(f"{d}/events.parquet")
    os.rename(f"{d}/tmp.parquet", f"{d}/events.parquet/part0.parquet")
    for i in range(1, n_files):
        os.rename(f"{d}/events_{i}.parquet", f"{d}/events.parquet/part{i}.parquet")

    got = _run_sessionize(str(d))
    want = (
        naive_sessions(events)
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
        .astype({"user_id": "int64", "session_id": "int64", "n_events": "int64", "first_event": "int64"})
    )
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_hot_user_sessions_across_blocks(ray_session, tmp_path):
    """One user owns 90% of the events (the skew case the round-2
    per-user pandas group serialized); sessions must still come out
    exactly right when that user's events are scattered across files."""
    rng = np.random.default_rng(7)
    n_hot, n_cold = 5000, 500
    base = pd.Timestamp("2024-01-01")
    # hot user: bursts of ~50 events 10s apart, bursts 1h apart
    burst = np.repeat(np.arange(n_hot // 50), 50)
    within = np.arange(n_hot) % 50
    hot_ts = base + pd.to_timedelta(burst * 3600 + within * 10, unit="s")
    hot = pd.DataFrame(
        {"user_id": 1, "event_id": np.arange(n_hot), "ts": hot_ts}
    )
    cold = pd.DataFrame(
        {
            "user_id": rng.integers(2, 20, n_cold),
            "event_id": np.arange(n_hot, n_hot + n_cold),
            "ts": base + pd.to_timedelta(rng.integers(0, 3_600_000, n_cold), unit="s"),
        }
    )
    events = pd.concat([hot, cold], ignore_index=True).sample(frac=1, random_state=3)
    _check(events, tmp_path, n_files=6)


def test_session_spans_many_blocks(ray_session, tmp_path):
    """A single session whose events round-robin across every file: the
    boundary stitch must chain-merge partials from all blocks."""
    n = 400
    events = pd.DataFrame(
        {
            "user_id": 1,
            "event_id": np.arange(n),
            "ts": pd.Timestamp("2024-01-01") + pd.to_timedelta(np.arange(n) * 60, unit="s"),
        }
    )
    _check(events, tmp_path, n_files=8)
    # and with equal timestamps (tie-broken by event_id)
    events["ts"] = pd.Timestamp("2024-01-01")
    _check(events, tmp_path, n_files=8)


def test_sessionize_matches_naive_on_fixture(ray_session):
    sf = "/root/testdata/sf0.001"
    got = _run_sessionize(sf)
    ev = pq.read_table(f"{sf}/events.parquet").to_pandas()
    want = (
        naive_sessions(ev)
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
        .astype({"user_id": "int64", "session_id": "int64", "n_events": "int64", "first_event": "int64"})
    )
    pd.testing.assert_frame_equal(got[want.columns], want)
