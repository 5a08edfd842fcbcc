"""The shuffle-join candidate path must equal the broadcast-lookup path."""

import pyarrow.parquet as pq
import pytest


def test_join_candidates_equal_broadcast(ray_session, small_fixture_dir):
    import ray
    import ray.data as rd

    from reden_ray.config import ExecConfig
    from reden_ray.pipelines.kg import (
        candidates_dataset,
        candidates_dataset_join,
        fixture_config,
        linked_dataset,
        links_view,
        mentions_dataset,
        use_hash_shuffle,
    )

    # scope the global strategy flip to this test: later tests in the
    # shared Ray session would otherwise inherit hash shuffle with its
    # 200-partition default and stall on 4 CPUs
    prev = rd.DataContext.get_current().shuffle_strategy
    use_hash_shuffle()  # before dataset creation
    try:
        _run(ray, rd, ExecConfig, candidates_dataset, candidates_dataset_join,
             fixture_config, linked_dataset, links_view, mentions_dataset,
             small_fixture_dir)
    finally:
        rd.DataContext.get_current().shuffle_strategy = prev


def _run(ray, rd, ExecConfig, candidates_dataset, candidates_dataset_join,
         fixture_config, linked_dataset, links_view, mentions_dataset,
         small_fixture_dir):
    fd = small_fixture_dir
    cfg = fixture_config(fd)
    ec = ExecConfig(
        lookup_concurrency=(1, 2), fuse_concurrency=(1, 2), fuse_buckets=4, join_buckets=4
    )
    pages = rd.read_parquet(f"{fd}/pages.parquet", columns=["url", "html"])
    dictionary = pq.read_table(f"{fd}/dictionary.parquet")
    dict_ref = ray.put(dictionary)
    ments = mentions_dataset(pages).materialize()

    via_broadcast = candidates_dataset(ments, dict_ref, cfg, ec).take_all()
    via_join = candidates_dataset_join(ments, dictionary, cfg, ec).take_all()

    def canon(rows):
        return {
            (r["url"], r["context_id"], r["mention_id"]): (
                r["surface"],
                r["ne_type"],
                tuple(tuple(g) for g in r["uri_groups"]),
            )
            for r in rows
        }

    assert canon(via_broadcast) == canon(via_join)

    # end to end: links through the join path (fusion local mode works on
    # the bucket-grouped output: contexts are re-co-located per bucket)
    adj_ref = ray.put(pq.read_table(f"{fd}/adjacency.parquet"))
    links_a = links_view(
        linked_dataset(candidates_dataset(ments, dict_ref, cfg, ec), adj_ref, cfg, ec)
    ).take_all()
    links_b = links_view(
        linked_dataset(candidates_dataset_join(ments, dictionary, cfg, ec), adj_ref, cfg, ec)
    ).take_all()

    def lcanon(rows):
        return {
            (r["url"], r["context_id"], r["mention_id"]): (
                tuple(r["chosen_uris"] or []),
                r["method"],
            )
            for r in rows
        }

    assert lcanon(links_a) == lcanon(links_b)


def test_hash_mode_fusion_equals_local(ray_session, small_fixture_dir):
    """linked_dataset(mode='hash') must produce the same links/triples."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from reden_ray.config import ExecConfig
    from reden_ray.pipelines.kg import (
        candidates_dataset,
        fixture_config,
        linked_dataset,
        mentions_dataset,
        use_hash_shuffle,
    )

    prev = rd.DataContext.get_current().shuffle_strategy
    use_hash_shuffle()
    try:
        fd = small_fixture_dir
        cfg = fixture_config(fd)
        ec = ExecConfig(fuse_concurrency=(1, 2), fuse_buckets=4)
        pages = rd.read_parquet(f"{fd}/pages.parquet", columns=["url", "html"])
        dict_ref = ray.put(pq.read_table(f"{fd}/dictionary.parquet"))
        adj_ref = ray.put(pq.read_table(f"{fd}/adjacency.parquet"))
        cands = candidates_dataset(mentions_dataset(pages), dict_ref, cfg, ec).materialize()
        local = linked_dataset(cands, adj_ref, cfg, ec, mode="local").take_all()
        hashed = linked_dataset(cands, adj_ref, cfg, ec, mode="hash").take_all()

        def canon(rows):
            return sorted(
                (
                    r["record_type"], r["url"], r["context_id"], r["mention_id"],
                    tuple(r["chosen_uris"] or []), r["method"],
                    r["subj"], r["pred"], r["obj"], r["weight"],
                )
                for r in rows
            )

        assert canon(local) == canon(hashed)
    finally:
        rd.DataContext.get_current().shuffle_strategy = prev
