"""Golden end-to-end test: Ray pipeline vs the independent naive oracle."""

import pyarrow.parquet as pq
import pytest

from tests.naive_reference import run_oracle


@pytest.fixture(scope="module")
def pipeline_outputs(ray_session, small_fixture_dir):
    import ray.data as rd

    from reden_ray.pipelines.kg import (
        links_view,
        run_fixture_pipeline,
        triples_view,
        verify_text_invariant,
    )

    combined = run_fixture_pipeline(small_fixture_dir).materialize()
    links = links_view(combined).take_all()
    triples = triples_view(combined).take_all()
    pages = rd.read_parquet(f"{small_fixture_dir}/pages.parquet")
    bad = verify_text_invariant(pages)
    return links, triples, bad


def test_text_invariant(pipeline_outputs):
    _, _, bad = pipeline_outputs
    assert bad == 0


def test_triples_match_oracle(pipeline_outputs, small_fixture_dir):
    _, triples, _ = pipeline_outputs
    _, gold_triples = run_oracle(small_fixture_dir)
    got = {
        (r["url"], r["context_id"], r["subj"], r["pred"], r["obj"], r["weight"])
        for r in triples
    }
    assert len(got) > 100  # non-trivial corpus
    tp = len(got & gold_triples)
    precision = tp / max(1, len(got))
    recall = tp / max(1, len(gold_triples))
    assert precision >= 0.95, (precision, len(got), len(gold_triples))
    assert recall >= 0.95, (recall, len(got), len(gold_triples))
    # on synthetic data with canonical ordering both sides, expect exact
    assert got == gold_triples


def test_links_match_oracle(pipeline_outputs, small_fixture_dir):
    links, _, _ = pipeline_outputs
    gold_links, _ = run_oracle(small_fixture_dir)
    got = {
        (r["url"], r["context_id"], r["mention_id"]): (tuple(r["chosen_uris"] or []), r["method"])
        for r in links
    }
    assert set(got) == set(gold_links)
    mismatches = [
        k for k in got if got[k] != (tuple(gold_links[k][1]), gold_links[k][2])
    ]
    assert len(mismatches) <= 0.05 * len(got), mismatches[:10]
    assert not mismatches  # expect exact on synthetic data


def test_linking_accuracy_vs_gold(pipeline_outputs, small_fixture_dir):
    """Degree centrality on the topic-clustered fixture must beat chance:
    the correct homonym shares its neighborhood with co-mentions."""
    links, _, _ = pipeline_outputs
    gold = pq.read_table(f"{small_fixture_dir}/gold.parquet").to_pylist()
    gold_by_key = {(g["url"], g["context_id"], g["mention_id"]): g["gold_uri"] for g in gold}
    total = correct = 0
    for r in links:
        key = (r["url"], r["context_id"], r["mention_id"])
        gold_uri = gold_by_key.get(key)
        if gold_uri is None:
            continue
        total += 1
        if r["chosen_uris"] and gold_uri in r["chosen_uris"]:
            correct += 1
    assert total > 100
    assert correct / total >= 0.6, (correct, total)


@pytest.mark.parametrize(
    "measure",
    [
        "BrandesBetweennessCentrality",
        "FreemanClosenessCentrality",
        "EigenvectorCentrality",
    ],
)
def test_centrality_config_golden_exact(ray_session, small_fixture_dir, measure):
    """End-to-end golden for the non-degree centralities (VERDICT r2
    item 5): a config flip to betweenness/closeness must produce EXACTLY
    the naive oracle's links+triples, oracle computed with an
    independently-structured algorithm (pair-counting betweenness,
    Floyd-Warshall closeness)."""
    import dataclasses

    from reden_ray.pipelines.kg import (
        fixture_config,
        links_view,
        run_fixture_pipeline,
        triples_view,
    )

    fd = small_fixture_dir
    cfg = dataclasses.replace(fixture_config(fd), measure=measure)
    combined = run_fixture_pipeline(fd, cfg=cfg).materialize()
    gold_links, gold_triples = run_oracle(fd, measure=measure)
    got_triples = {
        (r["url"], r["context_id"], r["subj"], r["pred"], r["obj"], r["weight"])
        for r in triples_view(combined).take_all()
    }
    assert got_triples == gold_triples
    got_links = {
        (r["url"], r["context_id"], r["mention_id"]): (tuple(r["chosen_uris"] or []), r["method"])
        for r in links_view(combined).take_all()
    }
    assert got_links == {k: (tuple(v[1]), v[2]) for k, v in gold_links.items()}
    # the measure flip must actually CHANGE something vs degree on this
    # fixture (guards against a dispatch that silently ignores config)
    deg_links, _ = run_oracle(fd, measure="DegreeCentrality")
    assert {k: (tuple(v[1]), v[2]) for k, v in gold_links.items()} != {
        k: (tuple(v[1]), v[2]) for k, v in deg_links.items()
    }


def test_bigger_kb_golden_exact(ray_session):
    """Second golden config: larger KB (600 entities, 40 topics) — the
    pipeline must stay exactly equal to the oracle as candidate density
    and graph sizes grow."""
    from reden_ray.pipelines.kg import run_fixture_pipeline, triples_view, links_view
    from reden_ray.sources.fixtures import fixture_dir

    fd = fixture_dir(n_docs=120, n_entities=600, n_topics=40, seed=7)
    combined = run_fixture_pipeline(fd).materialize()
    got_triples = {
        (r["url"], r["context_id"], r["subj"], r["pred"], r["obj"], r["weight"])
        for r in triples_view(combined).take_all()
    }
    gold_links, gold_triples = run_oracle(fd)
    assert got_triples == gold_triples
    got_links = {
        (r["url"], r["context_id"], r["mention_id"]): (tuple(r["chosen_uris"] or []), r["method"])
        for r in links_view(combined).take_all()
    }
    assert got_links == {k: (tuple(v[1]), v[2]) for k, v in gold_links.items()}
