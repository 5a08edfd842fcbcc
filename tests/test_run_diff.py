"""diff_runs — the wired run-diff tool (CompareResults.java analogue)."""

import pytest


@pytest.fixture(scope="module")
def runs(ray_session):
    import __ray_entry__ as E
    from reden_ray.pipelines.kg import (
        links_view,
        run_fixture_pipeline,
        run_untagged_pipeline,
    )

    fd = E._fixture_for("/root/testdata/sf0.001")
    tagged = links_view(run_fixture_pipeline(fd)).materialize()
    untagged = links_view(run_untagged_pipeline(fd)).materialize()
    return tagged, untagged


def test_diff_identical_runs_is_empty(runs):
    from reden_ray.pipelines.evaluate import diff_runs

    tagged, _ = runs
    assert diff_runs(tagged, tagged).count() == 0


def test_diff_tagged_vs_untagged(runs):
    from reden_ray.pipelines.evaluate import diff_runs

    tagged, untagged = runs
    rows = diff_runs(tagged, untagged).take_all()
    assert rows  # the NER heuristic diverges from gold tags somewhere
    statuses = {r["status"] for r in rows}
    assert statuses <= {"changed", "only_a", "only_b"}
    for r in rows:
        if r["status"] == "changed":
            assert r["chosen_a"] != r["chosen_b"]
        elif r["status"] == "only_a":
            assert r["chosen_b"] is None
        else:
            assert r["chosen_a"] is None
    # diff is symmetric up to a/b swap
    swapped = diff_runs(untagged, tagged).take_all()
    assert len(swapped) == len(rows)
    a_only = sum(1 for r in rows if r["status"] == "only_a")
    b_only_sw = sum(1 for r in swapped if r["status"] == "only_b")
    assert a_only == b_only_sw


def test_significance_pairs_and_t(runs):
    from reden_ray.pipelines.evaluate import paired_t_stats, significance_pairs

    tagged, untagged = runs
    pairs = significance_pairs(tagged, untagged).materialize()
    rows = pairs.take_all()
    assert rows
    assert all(r["score_a"] >= 0.0 and r["score_b"] >= 0.0 for r in rows)
    # self-comparison: zero diff everywhere, t == 0
    self_stats = paired_t_stats(significance_pairs(tagged, tagged))
    assert self_stats["mean_diff"] == 0.0
    assert self_stats["t"] == 0.0
    # cross-run stats are finite and n equals the union of mention keys
    stats = paired_t_stats(pairs)
    assert stats["n"] == len(rows)
    assert stats["sd_diff"] >= 0.0
