"""WARC ingestion: synthetic archive -> pages table."""

import gzip

import pytest


def _record(url: str, date: str, body: bytes, wtype: str = "response") -> bytes:
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    head = (
        f"WARC/1.0\r\nWARC-Type: {wtype}\r\nWARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\nContent-Length: {len(http)}\r\n\r\n"
    ).encode()
    return head + http + b"\r\n\r\n"


HTML1 = b"<html><body><p>Bonjour <span class=\"ne\" data-type=\"LOC\">Paris</span></p></body></html>"
HTML2 = b"<html><body><p>rien</p></body></html>"


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    raw = (
        _record("http://a.test/1", "2024-05-01T10:00:00Z", HTML1)
        + _record("http://a.test/req", "2024-05-01T10:00:00Z", b"GET / HTTP/1.1", wtype="request")
        + _record("http://a.test/2", "2024-05-02T11:30:00Z", HTML2)
    )
    (d / "seg0.warc").write_bytes(raw)
    (d / "seg1.warc.gz").write_bytes(
        gzip.compress(_record("http://b.test/1", "2024-06-01T00:00:00Z", HTML2))
    )
    return str(d)


def test_warc_pages(ray_session, warc_dir):
    from reden_ray.sources.warc import read_warc_pages

    rows = {r["url"]: r for r in read_warc_pages(warc_dir).take_all()}
    # request records skipped; both files parsed
    assert set(rows) == {"http://a.test/1", "http://a.test/2", "http://b.test/1"}
    assert rows["http://a.test/1"]["html"] == HTML1
    assert str(rows["http://a.test/1"]["warc_ts"]).startswith("2024-05-01 10:00:00")
    assert rows["http://a.test/1"]["text"] == "Bonjour Paris"


def test_warc_feeds_pipeline(ray_session, warc_dir, small_fixture_dir):
    import pyarrow.parquet as pq
    import ray

    from reden_ray.pipelines.kg import (
        candidates_dataset,
        fixture_config,
        linked_dataset,
        links_view,
        mentions_dataset,
    )
    from reden_ray.sources.warc import read_warc_pages

    pages = read_warc_pages(warc_dir).drop_columns(["text", "warc_ts"])
    cfg = fixture_config(small_fixture_dir)
    dict_ref = ray.put(pq.read_table(f"{small_fixture_dir}/dictionary.parquet"))
    adj_ref = ray.put(pq.read_table(f"{small_fixture_dir}/adjacency.parquet"))
    links = links_view(
        linked_dataset(candidates_dataset(mentions_dataset(pages), dict_ref, cfg), adj_ref, cfg)
    ).take_all()
    assert any(r["surface"] == "Paris" for r in links)


def test_warc_fractional_seconds_and_bad_dates(ray_session, tmp_path):
    """WARC 1.1 fractional-second dates parse (truncated to seconds);
    an unparseable date yields a NULL warc_ts, not a dead task."""
    from reden_ray.sources.warc import read_warc_pages

    raw = (
        _record("http://c.test/1", "2024-07-01T10:00:00.123456Z", HTML2)
        + _record("http://c.test/2", "not-a-date", HTML2)
    )
    d = tmp_path / "w"
    d.mkdir()
    (d / "f.warc").write_bytes(raw)
    rows = {r["url"]: r for r in read_warc_pages(str(d)).take_all()}
    assert str(rows["http://c.test/1"]["warc_ts"]).startswith("2024-07-01 10:00:00")
    assert rows["http://c.test/2"]["warc_ts"] is None
