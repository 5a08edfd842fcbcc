import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def pipeline(ray_session, small_fixture_dir):
    import ray
    import ray.data as rd

    from reden_ray.config import ExecConfig
    from reden_ray.pipelines.kg import (
        candidates_dataset,
        fixture_config,
        linked_dataset,
        links_view,
        mentions_dataset,
        triples_view,
    )

    fd = small_fixture_dir
    cfg = fixture_config(fd)
    pages = rd.read_parquet(f"{fd}/pages.parquet", columns=["url", "html"])
    dict_ref = ray.put(pq.read_table(f"{fd}/dictionary.parquet"))
    adj_ref = ray.put(pq.read_table(f"{fd}/adjacency.parquet"))
    cands = candidates_dataset(mentions_dataset(pages), dict_ref, cfg).materialize()
    combined = linked_dataset(cands, adj_ref, cfg).materialize()
    return fd, cands, links_view(combined).materialize(), triples_view(combined).materialize()


def test_ambiguity_report(pipeline):
    from reden_ray.pipelines.metrics import ambiguity_report

    fd, cands, links, triples = pipeline
    rep = {r["surface"]: r for r in ambiguity_report(cands).take_all()}
    assert rep  # non-empty
    # homonym clusters exist: some surface has >1 referent
    assert any(r["max_referents"] > 1 for r in rep.values())
    # NIL surfaces have 0 referents
    assert any(r["max_referents"] == 0 for r in rep.values())


def test_pred_frequency_matches_manual_count(pipeline):
    from collections import Counter

    from reden_ray.pipelines.metrics import pred_frequency

    fd, cands, links, triples = pipeline
    got = {r["pred"]: r["n"] for r in pred_frequency(triples).take_all()}
    want = Counter(r["pred"] for r in triples.take_all())
    assert got == dict(want)
    assert "http://kb.test/sameAs" not in got  # sameAs never becomes an edge


def test_enrichment_props(pipeline):
    from reden_ray.pipelines.metrics import enrichment

    fd, cands, links, triples = pipeline
    adjacency = pq.read_table(f"{fd}/adjacency.parquet")
    out = enrichment(links, adjacency, ["http://kb.test/p/label"]).take_all()
    by_uri = {r["uri"]: r for r in out}
    assert by_uri
    labeled = [r for r in out if r["label"] is not None]
    assert labeled  # base URIs carry label statements in the fixture
    assert all(r["occurrences"] > 0 for r in out)


def test_salted_count_equals_plain(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from reden_ray.stages.aggregates import partial_groupby_count, salted_groupby_count

    # skewed: one hot key with 5000 rows, 10 cold keys with 10 each
    keys = ["hot"] * 5000 + [f"cold{i}" for i in range(10) for _ in range(10)]
    ds = rd.from_arrow(pa.table({"k": keys})).repartition(8)
    want = {"hot": 5000, **{f"cold{i}": 10 for i in range(10)}}
    got_partial = {r["k"]: r["n"] for r in partial_groupby_count(ds, ["k"]).take_all()}
    got_salted = {r["k"]: r["n"] for r in salted_groupby_count(ds, ["k"], n_salts=4).take_all()}
    assert got_partial == want
    assert got_salted == want
