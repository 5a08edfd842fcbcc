"""URL canonicalization / domain split / recrawl dedup."""

import datetime as dt

import pyarrow as pa
import pytest
import ray.data as rd

from reden_ray.stages.urls import (
    UrlNormalizer,
    canonicalize_url,
    dedup_recrawls,
    filter_blocked_domains,
    registered_domain,
)


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    return ray_session


def test_canonicalize_url_rules():
    assert (
        canonicalize_url("HTTPS://Example.ORG:443/Path?b=2&a=1&utm_source=x#frag")
        == "https://example.org/Path?a=1&b=2"
    )
    # non-default port kept; empty path -> /
    assert canonicalize_url("http://example.org:8080") == "http://example.org:8080/"
    assert canonicalize_url("http://example.org:80/x") == "http://example.org/x"
    # tracking params dropped case-insensitively; blank values kept
    assert canonicalize_url("http://a.b/p?FBCLID=z&q=") == "http://a.b/p?q="
    # identical resources collide after normalization
    assert canonicalize_url("http://A.B/p?x=1&y=2") == canonicalize_url(
        "http://a.b/p?y=2&x=1&gclid=abc#top"
    )
    # malformed input: returned stripped-lowercase, never raises
    assert canonicalize_url("  not a url ") == "not a url"


def test_registered_domain():
    assert registered_domain("www.sub.example.org") == "example.org"
    assert registered_domain("news.bbc.co.uk") == "bbc.co.uk"
    assert registered_domain("example.org") == "example.org"
    assert registered_domain("localhost") == "localhost"


def _pages(rows):
    return rd.from_arrow(
        pa.table(
            {
                "url": pa.array([u for u, _ in rows], pa.string()),
                "warc_ts": pa.array(
                    [t for _, t in rows], pa.timestamp("us")
                ),
            }
        )
    ).repartition(3)


TS = [dt.datetime(2024, 1, d + 1) for d in range(6)]
ROWS = [
    ("http://A.example.org/p?x=1&utm_source=a", TS[0]),
    ("http://a.example.org/p?x=1", TS[2]),          # same canonical, newer
    ("http://a.example.org/p?x=1&gclid=zz", TS[1]), # same canonical, middle
    ("http://b.example.org/q", TS[3]),
    ("http://blocked.bad/r", TS[4]),
    ("http://sub.blocked.bad/s", TS[5]),
]


def test_normalizer_and_blocklist():
    norm = _pages(ROWS).map_batches(UrlNormalizer(), batch_format="pyarrow")
    out = norm.take_all()
    by_url = {r["url"]: r for r in out}
    assert by_url[ROWS[0][0]]["canonical_url"] == "http://a.example.org/p?x=1"
    assert by_url[ROWS[0][0]]["domain"] == "example.org"
    assert by_url[ROWS[4][0]]["domain"] == "blocked.bad"
    assert by_url[ROWS[3][0]]["path_depth"] == 1
    kept = {
        r["url"]
        for r in filter_blocked_domains(norm, ["blocked.bad"]).take_all()
    }
    assert kept == {u for u, _ in ROWS[:4]}  # both blocked.bad hosts gone


def test_dedup_recrawls_latest_wins_partition_invariant():
    norm = _pages(ROWS).map_batches(UrlNormalizer(), batch_format="pyarrow")
    for parts in (1, 4):
        out = dedup_recrawls(norm.repartition(parts)).take_all()
        got = {r["canonical_url"]: r["warc_ts"] for r in out}
        # three distinct canonical urls among the first four rows
        assert got["http://a.example.org/p?x=1"] == TS[2]  # newest capture
        assert got["http://b.example.org/q"] == TS[3]
        # 6 captures -> 4 resources (rows 0-2 are one canonical url)
        assert len(out) == 4
