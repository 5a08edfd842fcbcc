"""TEI ingestion bridge: reference-format corpora -> pages/gold tables."""

import pyarrow as pa
import pytest

TEI_NS = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<TEI xmlns="http://www.tei-c.org/ns/1.0">\n'
    "<teiHeader><fileDesc><titleStmt><title>t</title></titleStmt></fileDesc></teiHeader>\n"
    "<text><body>\n"
    "<head>Sur <persName ref=\"http://kb.test/ent/1\">Victor Hugo</persName></head>\n"
    "<p>On lit <persName ref=\"http://kb.test/ent/1\"><forename>Victor</forename> "
    "<surname>Hugo</surname></persName> &amp; un ami à "
    "<placeName ref=\"http://kb.test/ent/9\">Paris</placeName>.</p>\n"
    "<div><l>Vers sur <placeName>Rouen</placeName></l></div>\n"
    "</body></text></TEI>\n"
)

TEI_BAD = "<TEI><body><p>unclosed"


@pytest.fixture(scope="module")
def tei_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tei")
    (d / "doc1.xml").write_text(TEI_NS, encoding="utf-8")
    (d / "bad.xml").write_text(TEI_BAD, encoding="utf-8")
    return str(d)


def test_tei_pages_parse_and_mentions(ray_session, tei_dir):
    from reden_ray.pipelines.kg import mentions_dataset
    from reden_ray.sources.tei import read_tei_pages

    pages = read_tei_pages(tei_dir)
    rows = {r["url"].rsplit("/", 1)[-1]: r for r in pages.take_all()}
    assert rows["doc1.xml"]["parse_ok"] and not rows["bad.xml"]["parse_ok"]

    ments = mentions_dataset(
        pages.drop_columns(["text", "parse_ok"])
    ).take_all()
    doc1 = [m for m in ments if m["url"].endswith("doc1.xml")]
    got = [(m["context_id"], m["surface"], m["ne_type"]) for m in doc1]
    # contexts in document order: head=0, p=1, l=2 (div is transparent);
    # nested forename/surname flatten into one PER surface
    assert got == [
        (0, "Victor Hugo", "PER"),
        (1, "Victor Hugo", "PER"),
        (1, "Paris", "LOC"),
        (2, "Rouen", "LOC"),
    ]


def test_tei_text_invariant(ray_session, tei_dir):
    """The emitted text column must equal extract_text(html) — the
    BASELINE input_hint contract, preserved through entity escaping."""
    from reden_ray.core.textextract import extract_text
    from reden_ray.sources.tei import read_tei_pages

    for r in read_tei_pages(tei_dir).take_all():
        assert extract_text(r["html"]) == r["text"]
        if r["url"].endswith("doc1.xml"):
            assert "& un ami à" in r["text"]  # escaped ampersand round-trips


def test_tei_gold_refs(ray_session, tei_dir):
    from reden_ray.sources.tei import read_tei_gold

    gold = [g for g in read_tei_gold(tei_dir).take_all() if g["url"].endswith("doc1.xml")]
    by_key = {(g["context_id"], g["mention_id"]): g for g in gold}
    assert by_key[(0, 0)]["gold_uri"] == "http://kb.test/ent/1"
    assert by_key[(1, 0)]["gold_uri"] == "http://kb.test/ent/1"
    assert by_key[(1, 1)]["gold_uri"] == "http://kb.test/ent/9"
    assert by_key[(2, 0)]["gold_uri"] is None  # untagged ref -> null


def test_tei_pipeline_end_to_end(ray_session, tei_dir, small_fixture_dir):
    """TEI pages feed the flagship pipeline unchanged (dictionary from
    the fixture KB; the TEI mentions simply look up as NILs or hits)."""
    import pyarrow.parquet as pq
    import ray

    from reden_ray.pipelines.kg import (
        candidates_dataset,
        fixture_config,
        linked_dataset,
        links_view,
        mentions_dataset,
    )
    from reden_ray.sources.tei import read_tei_pages

    pages = read_tei_pages(tei_dir).drop_columns(["text", "parse_ok"])
    dict_ref = ray.put(pq.read_table(f"{small_fixture_dir}/dictionary.parquet"))
    adj_ref = ray.put(pq.read_table(f"{small_fixture_dir}/adjacency.parquet"))
    cfg = fixture_config(small_fixture_dir)
    links = links_view(
        linked_dataset(candidates_dataset(mentions_dataset(pages), dict_ref, cfg), adj_ref, cfg)
    ).take_all()
    assert {(r["url"].rsplit("/", 1)[-1], r["surface"]) for r in links} >= {
        ("doc1.xml", "Victor Hugo"),
        ("doc1.xml", "Paris"),
    }
