"""Positional output/gold alignment shim (VERDICT r4 item 9).

The reference scores the k-th annotated element of context i in its
output against the k-th of the same context in the gold TEI
(ResultsAndEvaluationNEL.java:240-257) — no mention identity.  The
engine keys by (url, context_id, mention_id); ``align_gold_positional``
re-keys a gold table whose mention enumeration differs so the keyed
``eval_records`` path reproduces the positional semantics.
"""

import pyarrow as pa
import pyarrow.parquet as pq

from reden_ray.pipelines.evaluate import (
    align_gold_positional,
    compute_metrics,
    eval_records,
)


def _pipeline(sf_dir="/root/testdata/sf0.001"):
    import ray
    import ray.data as rd

    import __ray_entry__ as E
    from reden_ray.pipelines.kg import (
        candidates_dataset,
        fixture_config,
        linked_dataset,
        links_view,
        mentions_dataset,
    )

    fd = E._fixture_for(sf_dir)
    cfg = fixture_config(fd)
    dict_ref = ray.put(pq.read_table(f"{fd}/dictionary.parquet"))
    adj_ref = ray.put(pq.read_table(f"{fd}/adjacency.parquet"))
    pages = rd.read_parquet(f"{fd}/pages.parquet", columns=["url", "html"])
    cands = candidates_dataset(mentions_dataset(pages), dict_ref, cfg).materialize()
    links = links_view(linked_dataset(cands, adj_ref, cfg)).materialize()
    gold = pq.read_table(f"{fd}/gold.parquet")
    return cands, links, gold


def _remap_gold_ids(gold: pa.Table) -> pa.Table:
    """Order-preserving but DIFFERENT mention ids (mid -> mid + 10**6,
    disjoint from every engine-enumerated id): the keyed join can no
    longer match a single mention, while document order inside each
    context is intact — exactly the reference-produced-gold situation
    the shim exists for."""
    mids = [m + 1_000_000 for m in gold.column("mention_id").to_pylist()]
    return gold.set_column(
        gold.schema.get_field_index("mention_id"),
        "mention_id",
        pa.array(mids, pa.int32()),
    )


def test_positional_alignment_equals_keyed_path(ray_session):
    cands, links, gold = _pipeline()
    baseline = compute_metrics(eval_records(cands, links, gold))

    scrambled = _remap_gold_ids(gold)
    # sanity: the keyed path is broken by the remap (no manual matches)
    broken = compute_metrics(eval_records(cands, links, scrambled))
    assert broken["n_manual"] == 0

    realigned = align_gold_positional(cands, scrambled)
    recovered = compute_metrics(eval_records(cands, links, realigned))
    assert recovered == baseline
    assert baseline["n_manual"] > 0  # the fixture has real annotations


def test_positional_per_tag_lockstep(ray_session):
    """Per-annotation-tag k-indexing: gold PER/LOC streams align
    independently, as the reference's per-annoTag loop does."""
    import ray.data as rd

    mentions = rd.from_arrow(
        pa.table(
            {
                "url": pa.array(["u"] * 4),
                "context_id": pa.array([0] * 4, pa.int32()),
                "mention_id": pa.array([0, 1, 2, 3], pa.int32()),
                "ne_type": pa.array(["PER", "LOC", "PER", "LOC"]),
            }
        )
    )
    gold = pa.table(
        {
            "url": pa.array(["u"] * 3),
            "context_id": pa.array([0] * 3, pa.int32()),
            # gold enumerates ITS OWN way: PER mentions 7 & 9, LOC 8
            "mention_id": pa.array([7, 9, 8], pa.int32()),
            "surface": pa.array(["A", "B", "C"]),
            "ne_type": pa.array(["PER", "PER", "LOC"]),
            "gold_uri": pa.array(["http://kb/a", "http://kb/b", "http://kb/c"]),
        }
    )
    out = align_gold_positional(mentions, gold)
    m = {r["mention_id"]: r["gold_uri"] for r in out.to_pylist()}
    # k-th PER in engine order (mention_id 0, 2) <- k-th PER in gold
    # order (mention_id 7, 9); k-th LOC (1, 3) <- gold LOC (8, —)
    assert m == {0: "http://kb/a", 2: "http://kb/b", 1: "http://kb/c"}
    # engine's second LOC (mention_id 3) has no gold counterpart -> dropped


def test_positional_without_type_column(ray_session):
    """Gold tables lacking ne_type align as one stream per context."""
    import ray.data as rd

    mentions = rd.from_arrow(
        pa.table(
            {
                "url": pa.array(["u", "u", "v"]),
                "context_id": pa.array([0, 0, 0], pa.int32()),
                "mention_id": pa.array([5, 9, 1], pa.int32()),
                "ne_type": pa.array(["PER", "LOC", "PER"]),
            }
        )
    )
    gold = pa.table(
        {
            "url": pa.array(["u", "u"]),
            "context_id": pa.array([0, 0], pa.int32()),
            "mention_id": pa.array([100, 200], pa.int32()),
            "surface": pa.array(["x", "y"]),
            "gold_uri": pa.array(["http://kb/x", None]),
        }
    )
    out = align_gold_positional(mentions, gold)
    m = {r["mention_id"]: r["gold_uri"] for r in out.to_pylist()}
    assert m == {5: "http://kb/x", 9: None}
