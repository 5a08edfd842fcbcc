"""Dictionary-build pipeline + checkpoint/resume tests."""

import shutil

import pyarrow.parquet as pq
import pytest


def test_build_dictionary_reproduces_fixture(ray_session, small_fixture_dir):
    import ray.data as rd

    from reden_ray.pipelines.dictbuild import build_dictionary

    dump = rd.read_parquet(f"{small_fixture_dir}/entity_dump.parquet")
    built = build_dictionary(dump).take_all()
    want = pq.read_table(f"{small_fixture_dir}/dictionary.parquet").to_pylist()

    def key(rows):
        return sorted(
            (r["alias_norm"], r["alias_raw"], r["name_std"], r["kind"], tuple(r["uri_group"]))
            for r in rows
        )

    assert key(built) == key(want)


def test_merge_solutions_unions_equivalents(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from reden_ray.pipelines.dictbuild import merge_solutions

    t = pa.table(
        {
            "uri": ["u1", "u1", "u2"],
            "kind": ["PER", "PER", "PER"],
            "firstname": ["A", "A", "B"],
            "lastname": ["X", "X", "Y"],
            "gender": ["male", "male", "male"],
            "birth": ["1800", "1800", "1810"],
            "death": ["1870", "1870", "1880"],
            "equivalents": [["e1"], ["e2", "e1"], []],
        }
    )
    merged = {r["uri"]: r for r in merge_solutions(rd.from_arrow(t)).take_all()}
    assert list(merged["u1"]["equivalents"]) == ["e1", "e2"]
    assert list(merged["u2"]["equivalents"]) == []


def test_checkpoint_resume_produces_complete_output(ray_session, small_fixture_dir, tmp_path):
    from reden_ray.state.checkpoint import (
        Manifest,
        read_checkpointed_output,
        run_checkpointed,
    )

    out_dir = str(tmp_path / "ckpt")
    # phase 1: simulate a run that dies after finishing parts {0, 1}
    m1 = run_checkpointed(small_fixture_dir, out_dir, n_parts=4, only_parts={0, 1})
    assert m1.done_parts == {0, 1}
    # phase 2: resume (processes only the remaining parts)
    m2 = run_checkpointed(small_fixture_dir, out_dir, n_parts=4)
    assert m2.done_parts == {0, 1, 2, 3}
    # per-partition lineage metrics recorded
    for p in range(4):
        rec = m2.data["partitions"][str(p)]
        assert rec["links"] > 0 and rec["triples"] > 0

    # the resumed output equals a single-shot run
    resumed = read_checkpointed_output(out_dir)
    single_dir = str(tmp_path / "single")
    run_checkpointed(small_fixture_dir, single_dir, n_parts=4)
    single = read_checkpointed_output(single_dir)

    def canon(rows):
        return sorted(
            (
                r["url"], r["context_id"], r["record_type"], r["mention_id"],
                tuple(r["chosen_uris"] or []), r["subj"], r["pred"], r["obj"],
            )
            for r in rows
        )

    assert canon(resumed.take_all()) == canon(single.take_all())
    # a third run is a no-op (everything already complete)
    m3 = run_checkpointed(small_fixture_dir, out_dir, n_parts=4)
    assert m3.done_parts == {0, 1, 2, 3}


def test_rerun_wipes_orphans(ray_session, small_fixture_dir, tmp_path):
    import os

    from reden_ray.state.checkpoint import run_checkpointed

    out_dir = str(tmp_path / "orphan")
    run_checkpointed(small_fixture_dir, out_dir, n_parts=2, only_parts={0})
    # drop part 1's manifest entry but leave fake orphan files on disk
    orphan = os.path.join(out_dir, "data", "part=1")
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "garbage.parquet"), "w") as f:
        f.write("not parquet")
    run_checkpointed(small_fixture_dir, out_dir, n_parts=2)
    files = os.listdir(orphan)
    assert "garbage.parquet" not in files and files


def test_temporal_domain_filter(ray_session, small_fixture_dir):
    import ray.data as rd

    from reden_ray.pipelines.dictbuild import filter_entities_by_period

    dump = rd.read_parquet(f"{small_fixture_dir}/entity_dump.parquet")
    total = dump.count()
    # PER entities are 1800-1870; LOC have null dates (kept)
    overlap = filter_entities_by_period(dump, 1850, 1900).take_all()
    assert len(overlap) == total  # every PER overlaps, LOC kept
    disjoint = filter_entities_by_period(dump, 1900, 1950).take_all()
    assert all(r["kind"] == "LOC" for r in disjoint)  # only undated rows survive
    assert 0 < len(disjoint) < total
