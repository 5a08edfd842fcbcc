"""Edge cases for the round-4 continuation operators (gap-fill, CDC
merge, anomaly windows, quantization guards, deterministic mixing) on
tiny synthetic fixtures — the sf0.01 oracle harness covers the bulk
semantics; these pin the boundary behavior it can't reach."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def tiny_sf(tmp_path):
    """Minimal sf-dir with the column schemas the new ops read."""
    us = lambda d, h=0: dt.datetime(2024, 1, d, h, 0, 0)
    events = pa.table(
        {
            "event_id": pa.array(range(1, 9), pa.int64()),
            "ts": pa.array(
                [us(1), us(1, 6), us(4), us(2), us(2, 3), us(2, 6), us(2, 9), us(2, 12)],
                pa.timestamp("us"),
            ),
            # user 7: events on day 1 and day 4 (gap on days 2-3)
            # user 8: five events on day 2, latest is an error
            "user_id": pa.array([7, 7, 7, 8, 8, 8, 8, 8], pa.int64()),
            "event_type": pa.array(
                ["view", "click", "view", "view", "view", "view", "view", "error"],
                pa.string(),
            ),
            "value": pa.array([1.0, 2.0, 3.0, 1.0, 1.0, 1.0, 1.0, 9.0], pa.float64()),
        }
    )
    pq.write_table(events, tmp_path / "events.parquet")
    docs = pa.table(
        {
            "doc_id": pa.array(range(10), pa.int64()),
            "source": pa.array(["a"] * 8 + ["b"] * 2, pa.string()),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    emb = pa.table(
        {
            "vec_id": pa.array([0, 1], pa.int64()),
            "embedding": pa.array([[1.0, -2.0], [0.5, 4.0]], pa.list_(pa.float32())),
            "label": pa.array([0, 1], pa.int64()),
        }
    )
    pq.write_table(emb, tmp_path / "embeddings.parquet")
    return str(tmp_path)


def test_gapfill_zero_fills_interior_days(ray_session, tiny_sf):
    from reden_ray.pipelines.relational import o29_gapfill_daily

    df = o29_gapfill_daily(tiny_sf).to_pandas()
    u7 = df[df.user_id == 7].sort_values("day")
    assert list(u7.day) == ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"]
    assert list(u7.n_events) == [2, 0, 0, 1]
    u8 = df[df.user_id == 8]
    assert list(u8.day) == ["2024-01-02"] and list(u8.n_events) == [5]


def test_merge_cdc_tombstone_deletes_user(ray_session, tiny_sf):
    from reden_ray.pipelines.relational import merge_cdc_latest

    df = merge_cdc_latest(tiny_sf).to_pandas()
    # user 8's latest change is an error -> tombstoned away
    assert set(df.user_id) == {7}
    row = df.iloc[0]
    assert row.last_type == "view" and row.last_value == 3.0


def test_rolling_anomaly_skips_constant_baseline(ray_session, tiny_sf):
    from reden_ray.pipelines.relational import o30_rolling_anomaly

    df = o30_rolling_anomaly(tiny_sf).to_pandas()
    # user 8 has exactly 5 preceding events for event 8, but their
    # stddev is 0 (all 1.0) -> skipped; user 7 never reaches 6 events
    assert len(df) == 0


def test_quantize_rejects_ragged_embeddings(ray_session, tmp_path, tiny_sf):
    from reden_ray.pipelines.relational import emb_quantize_error

    ragged = pa.table(
        {
            "vec_id": pa.array([0, 1], pa.int64()),
            "embedding": pa.array([[1.0, 2.0], [3.0]], pa.list_(pa.float32())),
            "label": pa.array([0, 1], pa.int64()),
        }
    )
    pq.write_table(ragged, tmp_path / "embeddings.parquet")
    with pytest.raises(Exception, match="fixed-dim"):
        emb_quantize_error(str(tmp_path)).materialize()


def test_mix_sources_deterministic_and_balanced(ray_session, tiny_sf):
    from reden_ray.pipelines.relational import mix_sources_balanced

    a = mix_sources_balanced(tiny_sf).to_pandas().sort_values("doc_id")
    b = mix_sources_balanced(tiny_sf).to_pandas().sort_values("doc_id")
    assert list(a.doc_id) == list(b.doc_id)  # reproducible row-for-row
    # source b is the smallest (2 docs): its rate is 1.0 -> kept whole
    kept_b = a[a.source == "b"]
    assert len(kept_b) == 2
