"""Eval metrics (A5) on the fixture corpus."""

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def metrics(ray_session, small_fixture_dir):
    import ray
    import ray.data as rd

    from reden_ray.config import ExecConfig
    from reden_ray.pipelines.evaluate import compute_metrics, eval_records
    from reden_ray.pipelines.kg import (
        candidates_dataset,
        fixture_config,
        linked_dataset,
        links_view,
        mentions_dataset,
    )

    fd = small_fixture_dir
    cfg = fixture_config(fd)
    pages = rd.read_parquet(f"{fd}/pages.parquet", columns=["url", "html"])
    dict_ref = ray.put(pq.read_table(f"{fd}/dictionary.parquet"))
    adj_ref = ray.put(pq.read_table(f"{fd}/adjacency.parquet"))
    cands = candidates_dataset(mentions_dataset(pages), dict_ref, cfg).materialize()
    links = links_view(linked_dataset(cands, adj_ref, cfg)).materialize()
    gold = pq.read_table(f"{fd}/gold.parquet")
    recs = eval_records(cands, links, gold)
    return compute_metrics(recs)


def test_counts(metrics, small_fixture_dir):
    gold = pq.read_table(f"{small_fixture_dir}/gold.parquet")
    assert metrics["n_mentions"] == gold.num_rows
    nils = sum(1 for v in gold.column("gold_uri").to_pylist() if v is None)
    assert metrics["n_manual_nil"] == nils
    assert metrics["n_manual"] == gold.num_rows - nils


def test_candidate_metrics_sane(metrics):
    # dictionary lookup is exact-alias: every in-dictionary mention's
    # candidate set contains its entity => recall ~1; NIL surfaces are
    # not in the dictionary => nil precision 1.0
    assert metrics["candidate_recall"] >= 0.99
    assert metrics["nil_precision"] >= 0.99
    assert metrics["nil_recall"] >= 0.99
    assert metrics["candidate_cardinality_mean"] > 1.0


def test_accuracy_band(metrics):
    # reference's own corpora span 0.45-0.73 overall accuracy
    assert 0.5 <= metrics["overall_linking_accuracy"] <= 1.0
    assert metrics["disambiguation_accuracy"] >= 0.5


def test_compare_runs_and_score_pairs(ray_session, small_fixture_dir):
    """Run diff (J6/D4 analogue) between degree and betweenness runs."""
    import dataclasses

    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from reden_ray.pipelines.evaluate import compare_runs, eval_records, score_pairs_export
    from reden_ray.pipelines.kg import (
        candidates_dataset,
        fixture_config,
        linked_dataset,
        links_view,
        mentions_dataset,
    )

    fd = small_fixture_dir
    gold = pq.read_table(f"{fd}/gold.parquet")
    pages = rd.read_parquet(f"{fd}/pages.parquet", columns=["url", "html"])
    dict_ref = ray.put(pq.read_table(f"{fd}/dictionary.parquet"))
    adj_ref = ray.put(pq.read_table(f"{fd}/adjacency.parquet"))
    base = fixture_config(fd)
    cands = candidates_dataset(mentions_dataset(pages), dict_ref, base).materialize()

    recs = {}
    for measure in ("DegreeCentrality", "FreemanClosenessCentrality"):
        cfg = dataclasses.replace(base, measure=measure)
        links = links_view(linked_dataset(cands, adj_ref, cfg)).materialize()
        recs[measure] = eval_records(cands, links, gold).materialize()

    diff = compare_runs(recs["DegreeCentrality"], recs["FreemanClosenessCentrality"])
    n = sum(diff.values())
    assert n == gold.num_rows == cands.count()
    assert diff["both"] > 0  # the runs agree somewhere
    pairs = score_pairs_export(
        recs["DegreeCentrality"], recs["FreemanClosenessCentrality"]
    ).take_all()
    assert len(pairs) == n
    assert {p["correct_a"] for p in pairs} <= {0, 1}


def test_kb_completeness(ray_session, small_fixture_dir):
    import pyarrow.parquet as pq
    import ray.data as rd

    from reden_ray.pipelines.evaluate import kb_completeness

    gold = pq.read_table(f"{small_fixture_dir}/gold.parquet")
    dictionary = rd.read_parquet(f"{small_fixture_dir}/dictionary.parquet")
    out = kb_completeness(gold, dictionary)
    # fixture gold URIs are all dictionary entities (NILs are null)
    assert out["missing"] == 0
    assert out["in_kb"] == out["gold_uris"] > 0
