from reden_ray.stages.ner import detect_mentions_untagged


def spans(text):
    return [s for s, _, _ in detect_mentions_untagged(text)]


def test_basic_capitalized_runs():
    assert spans("On lit Victor Hugo à Paris.") == ["Victor Hugo", "Paris"]


def test_particles_joined():
    assert spans("le salon de Madame de Staël était couru") == ["Madame de Staël"]
    assert spans("un texte sur Jeanne d'Arc ici") == ["Jeanne d'Arc"]


def test_sentence_initial_single_token_dropped():
    assert spans("Hier il a plu. Ensuite rien.") == []
    # but a multi-token sentence-initial name survives
    assert spans("Victor Hugo écrit.") == ["Victor Hugo"]


def test_offsets_align():
    text = "une lettre à Ernest Renan puis à Rouen"
    for s, a, b in detect_mentions_untagged(text):
        assert text[a:b] == s


def test_untagged_stage_schema(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from reden_ray.stages.ner import contexts_to_untagged_mentions

    ctx = pa.table(
        {
            "url": ["u1"],
            "context_id": pa.array([0], pa.int32()),
            "context_html": ["x"],
            "text": ["On lit Victor Hugo à Paris."],
        }
    )
    rows = (
        rd.from_arrow(ctx)
        .map_batches(contexts_to_untagged_mentions, batch_format="pyarrow")
        .take_all()
    )
    assert [r["surface"] for r in rows] == ["Victor Hugo", "Paris"]
    assert all(r["ne_type"] == "ANY" for r in rows)
    assert rows[0]["norm"] == "victorhugo"


def test_untagged_pipeline_links_against_gold(ray_session, small_fixture_dir):
    """Heuristic NER + cross-kind lookup must still recover a decent
    share of the gold links (mentions are detectable capitalized runs)."""
    import pyarrow.parquet as pq

    from reden_ray.pipelines.kg import links_view, run_untagged_pipeline

    links = links_view(run_untagged_pipeline(small_fixture_dir)).take_all()
    assert links
    gold = pq.read_table(f"{small_fixture_dir}/gold.parquet").to_pylist()
    gold_by_ctx = {}
    for g in gold:
        if g["gold_uri"]:
            gold_by_ctx.setdefault((g["url"], g["context_id"]), set()).add(g["gold_uri"])
    hit = total = 0
    for (url, cid), uris in gold_by_ctx.items():
        got = {
            u
            for r in links
            if r["url"] == url and r["context_id"] == cid
            for u in (r["chosen_uris"] or [])
        }
        total += len(uris)
        hit += len(uris & got)
    assert total > 100
    assert hit / total >= 0.4, (hit, total)
