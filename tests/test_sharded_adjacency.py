"""Sharded-adjacency fusion must equal the broadcast path exactly."""

import pyarrow.parquet as pq


def test_sharded_equals_broadcast(ray_session, small_fixture_dir):
    import ray
    import ray.data as rd

    from reden_ray.config import ExecConfig
    from reden_ray.pipelines.kg import (
        candidates_dataset,
        fixture_config,
        linked_dataset,
        mentions_dataset,
    )
    from reden_ray.stages.graphstage import make_sharded_context_linker_fn
    from reden_ray.state.adjacency import make_shard_actors

    fd = small_fixture_dir
    cfg = fixture_config(fd)
    ec = ExecConfig(lookup_concurrency=(1, 2))
    pages = rd.read_parquet(f"{fd}/pages.parquet", columns=["url", "html"])
    adjacency = pq.read_table(f"{fd}/adjacency.parquet")
    dict_ref = ray.put(pq.read_table(f"{fd}/dictionary.parquet"))
    adj_ref = ray.put(adjacency)
    cands = candidates_dataset(mentions_dataset(pages), dict_ref, cfg, ec).materialize()

    broadcast = linked_dataset(cands, adj_ref, cfg, ec).take_all()

    actors = make_shard_actors(adjacency, n_shards=3)
    assert sum(ray.get([a.size.remote() for a in actors])) > 0
    sharded = cands.map_batches(
        make_sharded_context_linker_fn(actors, cfg),
        batch_format="pyarrow",
        batch_size=None,
    ).take_all()

    def canon(rows):
        return sorted(
            (
                r["record_type"], r["url"], r["context_id"], r["mention_id"],
                tuple(r["chosen_uris"] or []), r["method"],
                r["subj"], r["pred"], r["obj"], r["weight"],
            )
            for r in rows
        )

    assert canon(broadcast) == canon(sharded)
    for a in actors:
        ray.kill(a)


def test_sharded_dictionary_equals_broadcast(ray_session, small_fixture_dir):
    import ray
    import ray.data as rd

    from reden_ray.config import ExecConfig
    from reden_ray.pipelines.kg import candidates_dataset, fixture_config, mentions_dataset
    from reden_ray.stages.candidates import make_sharded_candidate_lookup_fn
    from reden_ray.state.dictionary import make_dictionary_shard_actors

    fd = small_fixture_dir
    cfg = fixture_config(fd)
    dictionary = pq.read_table(f"{fd}/dictionary.parquet")
    pages = rd.read_parquet(f"{fd}/pages.parquet", columns=["url", "html"])
    ments = mentions_dataset(pages).materialize()

    dict_ref = ray.put(dictionary)
    via_broadcast = candidates_dataset(
        ments, dict_ref, cfg, ExecConfig(lookup_concurrency=(1, 2))
    ).take_all()

    actors = make_dictionary_shard_actors(dictionary, n_shards=3)
    via_sharded = ments.map_batches(
        make_sharded_candidate_lookup_fn(actors, cfg),
        batch_format="pyarrow",
        batch_size=None,
    ).take_all()

    def canon(rows):
        return {
            (r["url"], r["context_id"], r["mention_id"]): tuple(
                tuple(g) for g in r["uri_groups"]
            )
            for r in rows
        }

    assert canon(via_broadcast) == canon(via_sharded)
    for a in actors:
        ray.kill(a)
