"""Golden tests for the annotated-page sink (S7 produceResults parity).

The independent oracle decodes the annotated html with stdlib
HTMLParser (a different parser than the engine's regex scanner) and
checks every linked mention carries exactly its chosen URIs, NIL
mentions carry nothing, and the tag-stripped text is byte-identical.
"""

from html.parser import HTMLParser

import pyarrow.parquet as pq
import pytest


class _SpanCollector(HTMLParser):
    """(context_id, mention_id) -> ref_auto value, via stdlib parsing."""

    def __init__(self):
        super().__init__(convert_charrefs=False)
        self.cid = -1
        self.mid = 0
        self.refs = {}

    def handle_starttag(self, tag, attrs):
        d = dict(attrs)
        if tag == "p":
            self.cid += 1
            self.mid = 0
        elif tag == "span" and d.get("class") == "ne":
            if "ref_auto" in d:
                self.refs[(self.cid, self.mid)] = d["ref_auto"]
            self.mid += 1


@pytest.fixture(scope="module")
def annotated(ray_session):
    import ray.data as rd

    import __ray_entry__ as E
    from reden_ray.pipelines.kg import links_view, run_fixture_pipeline
    from reden_ray.stages.annotate import annotated_pages

    fd = E._fixture_for("/root/testdata/sf0.001")
    pages = rd.read_parquet(f"{fd}/pages.parquet", columns=["url", "html"])
    links = links_view(run_fixture_pipeline(fd)).materialize()
    out = {r["url"]: r["html"] for r in annotated_pages(pages, links).take_all()}
    orig = {
        r["url"]: r["html"]
        for r in pq.read_table(f"{fd}/pages.parquet").select(["url", "html"]).to_pylist()
    }
    link_rows = links.take_all()
    return out, orig, link_rows


def test_annotated_pages_cover_all_pages(annotated):
    out, orig, _ = annotated
    assert set(out) == set(orig)


def test_text_invariant_preserved(annotated):
    from reden_ray.core.textextract import extract_text

    out, orig, _ = annotated
    for url, html in out.items():
        assert extract_text(html) == extract_text(orig[url]), url


def test_ref_auto_matches_links_exactly(annotated):
    out, orig, link_rows = annotated
    want: dict[str, dict] = {}
    for r in link_rows:
        if r["chosen_uris"]:
            want.setdefault(r["url"], {})[(r["context_id"], r["mention_id"])] = " ".join(
                r["chosen_uris"]
            )
    for url, html in out.items():
        p = _SpanCollector()
        p.feed(html.decode("utf-8"))
        assert p.refs == want.get(url, {}), url


def test_unlinked_pages_pass_through_unchanged(annotated):
    out, orig, link_rows = annotated
    linked_urls = {r["url"] for r in link_rows if r["chosen_uris"]}
    untouched = set(orig) - linked_urls
    for url in untouched:
        assert out[url] == orig[url]


def test_add_scores_format(ray_session):
    """uri(score) attribute format — the addScores=true branch
    (ResultsAndEvaluationNEL.java:86-89)."""
    import ray.data as rd

    import __ray_entry__ as E
    from reden_ray.pipelines.kg import links_view, run_fixture_pipeline
    from reden_ray.stages.annotate import annotated_pages

    fd = E._fixture_for("/root/testdata/sf0.001")
    pages = rd.read_parquet(f"{fd}/pages.parquet", columns=["url", "html"])
    links = links_view(run_fixture_pipeline(fd))
    html_all = b"".join(
        r["html"] for r in annotated_pages(pages, links, add_scores=True).take_all()
    )
    assert b"ref_auto=" in html_all
    import re

    assert re.search(rb'ref_auto="[^"]+\([0-9.]+\)"', html_all)
