import pyarrow as pa

from reden_ray.stages.dicttag import build_alias_trie, tag_text


def _trie(aliases):
    return build_alias_trie(
        pa.table(
            {
                "alias_raw": [a for a, _ in aliases],
                "kind": [k for _, k in aliases],
            }
        )
    )


def test_longest_match_wins():
    trie = _trie([("Victor Hugo", "PER"), ("Hugo", "PER"), ("Victor", "PER")])
    got = tag_text("On lit Victor Hugo ici, puis Hugo seul.", trie)
    assert [(s, t) for s, _, _, t in got] == [("Victor Hugo", "PER"), ("Hugo", "PER")]


def test_punctuated_and_elided_aliases():
    trie = _trie([("M. Bonaparte", "PER"), ("Jeanne d'Arc", "PER")])
    text = "Vu M. Bonaparte et Jeanne d'Arc hier."
    got = tag_text(text, trie)
    assert [s for s, _, _, _ in got] == ["M. Bonaparte", "Jeanne d'Arc"]
    for s, a, b, _ in got:
        assert text[a:b] == s


def test_cross_kind_alias_becomes_any():
    trie = _trie([("Orléans", "PER"), ("Orléans", "LOC")])
    got = tag_text("La maison d'Orléans est à Orléans.", trie)
    assert got and all(t == "ANY" for _, _, _, t in got)


def test_no_overlap_left_to_right():
    trie = _trie([("Anne Marie", "PER"), ("Marie Claire", "PER")])
    got = tag_text("Anne Marie Claire", trie)
    # the sweep takes "Anne Marie" first; "Claire" alone is no alias
    assert [s for s, _, _, _ in got] == ["Anne Marie"]


def test_dict_tagged_pipeline_beats_heuristic_ner(ray_session, small_fixture_dir):
    """VERDICT r2 item 2 'done' bar: the dictionary-alias sweep must
    recover at least the heuristic-NER path's share of gold URIs (it is
    the higher-precision untagged path)."""
    import pyarrow.parquet as pq

    from reden_ray.pipelines.kg import (
        links_view,
        run_dict_tagged_pipeline,
        run_untagged_pipeline,
    )

    gold = pq.read_table(f"{small_fixture_dir}/gold.parquet").to_pylist()
    gold_by_ctx = {}
    for g in gold:
        if g["gold_uri"]:
            gold_by_ctx.setdefault((g["url"], g["context_id"]), set()).add(g["gold_uri"])

    def recall(links):
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
        return hit / total

    dict_links = links_view(run_dict_tagged_pipeline(small_fixture_dir)).take_all()
    ner_links = links_view(run_untagged_pipeline(small_fixture_dir)).take_all()
    r_dict = recall(dict_links)
    r_ner = recall(ner_links)
    assert r_dict >= r_ner, (r_dict, r_ner)
    assert r_dict >= 0.7, r_dict
