"""Empty-side hardening for the annotate / run-diff join paths.

The Ray 2.49 hash join broadcasts an input's schema only on its FIRST
block; an all-empty build side crashes aggregators (ArrowInvalid: no
match for FieldRef).  These tests pin the staged_nonempty short-circuits
added for: annotated_pages (no linked mentions at all), diff_runs and
significance_pairs (one or both runs empty).
"""

import pyarrow as pa
import pytest


_LINKS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("context_id", pa.int32()),
        ("mention_id", pa.int32()),
        ("chosen_uris", pa.list_(pa.string())),
        ("score", pa.float64()),
    ]
)


def _links_ds(rows):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pylist(rows, schema=_LINKS_SCHEMA))


def _pages_ds():
    import ray.data as rd

    t = pa.table(
        {
            "url": pa.array(["http://a", "http://b"], pa.string()),
            "html": pa.array(
                [b"<p><span class='ne'>X</span></p>", b"<p>plain</p>"], pa.binary()
            ),
        }
    )
    return rd.from_arrow(t), t


def test_annotated_pages_empty_links_passthrough(ray_session):
    from reden_ray.stages.annotate import annotated_pages

    pages, orig = _pages_ds()
    out = annotated_pages(pages, _links_ds([])).take_all()
    assert {r["url"]: r["html"] for r in out} == {
        u: h for u, h in zip(orig["url"].to_pylist(), orig["html"].to_pylist())
    }


def test_annotated_pages_all_nil_links_passthrough(ray_session):
    """Links exist but every mention is NIL (chosen_uris empty) — the
    blob build side is all-empty rows after the flatten; must behave as
    the left_outer identity, not crash."""
    from reden_ray.stages.annotate import annotated_pages

    pages, orig = _pages_ds()
    links = _links_ds(
        [
            {
                "url": "http://a",
                "context_id": 0,
                "mention_id": 0,
                "chosen_uris": [],
                "score": 0.0,
            }
        ]
    )
    out = {r["url"]: r["html"] for r in annotated_pages(pages, links).take_all()}
    assert out == {
        u: h for u, h in zip(orig["url"].to_pylist(), orig["html"].to_pylist())
    }


@pytest.fixture()
def one_link():
    return [
        {
            "url": "http://a",
            "context_id": 0,
            "mention_id": 0,
            "chosen_uris": ["http://kb/X"],
            "score": 0.5,
        }
    ]


def test_diff_runs_one_empty_side(ray_session, one_link):
    from reden_ray.pipelines.evaluate import diff_runs

    rows = diff_runs(_links_ds(one_link), _links_ds([])).take_all()
    assert len(rows) == 1 and rows[0]["status"] == "only_a"
    assert rows[0]["chosen_a"] == "http://kb/X" and rows[0]["chosen_b"] is None

    rows = diff_runs(_links_ds([]), _links_ds(one_link)).take_all()
    assert len(rows) == 1 and rows[0]["status"] == "only_b"
    assert rows[0]["chosen_b"] == "http://kb/X" and rows[0]["chosen_a"] is None


def test_diff_runs_both_empty(ray_session):
    from reden_ray.pipelines.evaluate import diff_runs

    out = diff_runs(_links_ds([]), _links_ds([]))
    assert out.count() == 0
    assert set(out.schema().names) == {
        "url",
        "context_id",
        "mention_id",
        "chosen_a",
        "chosen_b",
        "status",
    }


def test_significance_pairs_one_empty_side(ray_session, one_link):
    from reden_ray.pipelines.evaluate import significance_pairs

    rows = significance_pairs(_links_ds(one_link), _links_ds([])).take_all()
    assert len(rows) == 1
    assert rows[0]["score_a"] == 0.5 and rows[0]["score_b"] == 0.0

    rows = significance_pairs(_links_ds([]), _links_ds(one_link)).take_all()
    assert len(rows) == 1
    assert rows[0]["score_a"] == 0.0 and rows[0]["score_b"] == 0.5


def test_significance_pairs_both_empty(ray_session):
    from reden_ray.pipelines.evaluate import paired_t_stats, significance_pairs

    pairs = significance_pairs(_links_ds([]), _links_ds([]))
    assert pairs.count() == 0
    stats = paired_t_stats(pairs)
    assert stats["n"] == 0 and stats["t"] == 0.0


def test_near_dup_clusters_empty_pairs(ray_session):
    """Zero near-dup pairs (clean corpus) -> empty mapping, no crash
    (reproduced ArrowInvalid before the round-3 short-circuit)."""
    import pyarrow as pa
    import ray.data as rd

    from reden_ray.pipelines.curation import near_dup_clusters

    empty = rd.from_arrow(
        pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
        )
    )
    assert near_dup_clusters(empty).take_all() == []


def test_annotated_pages_filter_emptied_left_block(ray_session):
    """A leading EMPTY pages block (e.g. a lang/parse_ok filter) must
    not lose the join schema broadcast (reproduced before the fix)."""
    import pyarrow as pa
    import ray.data as rd

    from reden_ray.stages.annotate import annotated_pages

    html = b'<html><body><p><span class="ne" data-type="PER">X</span></p></body></html>'
    block1 = pa.table({"url": pa.array([], pa.string()), "html": pa.array([], pa.binary())})
    block2 = pa.table({"url": ["u1"], "html": [html]})
    pages = rd.from_arrow(block1).union(rd.from_arrow(block2))
    links = rd.from_arrow(
        pa.table(
            {
                "url": ["u1"],
                "context_id": pa.array([0], pa.int32()),
                "mention_id": pa.array([0], pa.int32()),
                "chosen_uris": pa.array([["http://kb.test/e"]], pa.list_(pa.string())),
                "score": pa.array([1.0], pa.float64()),
            }
        )
    )
    rows = annotated_pages(pages, links).take_all()
    assert len(rows) == 1 and b'ref_auto="http://kb.test/e"' in rows[0]["html"]
