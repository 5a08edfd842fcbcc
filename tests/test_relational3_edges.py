"""Edge-case units for the batch-6/7 operators in
pipelines/relational3.py, on crafted micro-fixtures (the sf-level
oracle equivalence can't isolate these shapes)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def micro_sf(tmp_path_factory):
    """A tiny events table with known interval/island structure:
    user 1: three events at t=0s, 100s, 1000s (first two intervals of
    width 300s overlap; the third is separate);
    user 2: one event (single island, single interval);
    user 3: two events on consecutive days + one three days later."""
    d = tmp_path_factory.mktemp("relational3_micro")
    base = pd.Timestamp("2024-01-01")
    day = pd.Timedelta(days=1)
    rows = [
        (1, 1, base),
        (2, 1, base + pd.Timedelta(seconds=100)),
        (3, 1, base + pd.Timedelta(seconds=1000)),
        (4, 2, base + pd.Timedelta(seconds=5)),
        (5, 3, base),
        (6, 3, base + day),
        (7, 3, base + 4 * day),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts"])
    df["event_type"] = ["click", "view", "click", "view", "click", "view", "click"]
    df["value"] = np.arange(1.0, 8.0)
    df["props"] = "{}"
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.to_parquet(d / "events.parquet")
    return str(d)


def test_interval_coverage_overlap_merge(ray_session, micro_sf):
    from reden_ray.pipelines.relational3 import o37_interval_coverage

    got = {
        r["user_id"]: (r["covered_us"], r["n_intervals"])
        for r in o37_interval_coverage(micro_sf).take_all()
    }
    # user 1: [0, 400s) merged from two overlapping + [1000s, 1300s)
    assert got[1] == (400_000_000 + 300_000_000, 2)
    # user 2: exactly one width
    assert got[2] == (300_000_000, 1)
    # user 3: all three disjoint
    assert got[3] == (3 * 300_000_000, 3)


def test_gaps_islands_micro(ray_session, micro_sf):
    from reden_ray.pipelines.relational3 import o36_gaps_islands

    rows = sorted(
        (r["user_id"], r["start_day"], r["end_day"], r["n_days"])
        for r in o36_gaps_islands(micro_sf).take_all()
    )
    base_day = pd.Timestamp("2024-01-01").value // (86_400 * 10**9)
    # user 1/2: single-day islands; user 3: a 2-day island + a 1-day one
    assert rows == sorted(
        [
            (1, base_day, base_day, 1),
            (2, base_day, base_day, 1),
            (3, base_day, base_day + 1, 2),
            (3, base_day + 4, base_day + 4, 1),
        ]
    )


def test_median_gap_single_event_user_emits_nothing(ray_session, micro_sf):
    from reden_ray.pipelines.relational3 import o35_median_gap

    got = {r["user_id"]: r["median_gap_us"] for r in o35_median_gap(micro_sf).take_all()}
    assert 2 not in got  # single event: no gaps
    assert got[1] == pytest.approx((100e6 + 900e6) / 2)  # median of 2 gaps
    assert got[3] == pytest.approx(86_400e6 * 2)  # gaps 1d, 3d -> median 2d


def test_scd2_open_end_per_user(ray_session, micro_sf):
    from reden_ray.pipelines.relational3 import scd2_intervals

    rows = scd2_intervals(micro_sf).take_all()
    by_eid = {r["event_id"]: r for r in rows}
    assert len(rows) == 7
    # last event of each user carries a NULL valid_to
    for last in (3, 4, 7):
        assert by_eid[last]["valid_to_us"] is None
    # chain property: valid_to of event 1 == valid_from of event 2
    assert by_eid[1]["valid_to_us"] == by_eid[2]["valid_from_us"]


def test_seq_trigrams_micro(ray_session, micro_sf):
    from reden_ray.pipelines.relational3 import seq_trigrams

    rows = {
        (r["e1"], r["e2"], r["e3"]): r["n"] for r in seq_trigrams(micro_sf).take_all()
    }
    # user 1: click,view,click ; user 3: click,view,click ; others too short
    assert rows == {("click", "view", "click"): 2}
