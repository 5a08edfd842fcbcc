"""The ray-job-submit CLI entrypoint (reden_ray.cli) drives the real
pipeline: run -> parquet artifacts, checkpointed run -> manifest,
manifest subcommand summarizes it."""

from __future__ import annotations

import json

import pytest

from reden_ray.cli import main


def _run(capsys, argv) -> dict:
    assert main(argv) == 0
    # Ray progress output can interleave on stdout; take the last line
    # that is a JSON object
    lines = [
        line for line in capsys.readouterr().out.strip().splitlines()
        if line.startswith("{")
    ]
    return json.loads(lines[-1])


def test_cli_run_tagged(ray_session, small_fixture_dir, tmp_path, capsys):
    out = str(tmp_path / "out")
    summary = _run(capsys, ["run", "--input", small_fixture_dir, "--output", out])
    assert summary["links"] > 0 and summary["triples"] > 0

    # artifacts are real datasets with the expected columns
    import ray.data as rd

    links = rd.read_parquet(f"{out}/links")
    triples = rd.read_parquet(f"{out}/triples")
    assert {"url", "surface", "chosen_uris"} <= set(links.schema().names)
    assert {"subj", "pred", "obj"} <= set(triples.schema().names)
    assert links.count() == summary["links"]
    assert triples.count() == summary["triples"]

    # and match the library path exactly (same fixture, same config)
    from reden_ray.pipelines.kg import run_fixture_pipeline, triples_view

    direct = triples_view(run_fixture_pipeline(small_fixture_dir))
    assert direct.count() == summary["triples"]


def test_cli_run_variants(ray_session, small_fixture_dir, tmp_path, capsys):
    for variant in ["untagged", "dict-tagged"]:
        out = str(tmp_path / variant)
        summary = _run(
            capsys,
            ["run", "--input", small_fixture_dir, "--output", out,
             "--variant", variant, "--stateless"],
        )
        assert summary["triples"] > 0, variant


def test_cli_checkpoint_and_manifest(ray_session, small_fixture_dir, tmp_path, capsys):
    out = str(tmp_path / "ckpt")
    summary = _run(
        capsys,
        ["run", "--input", small_fixture_dir, "--output", out,
         "--checkpoint", "--n-parts", "4"],
    )
    assert summary["partitions"] == 4 and summary["triples"] > 0

    m = _run(capsys, ["manifest", "--output", out])
    assert m["partitions_done"] == [0, 1, 2, 3]
    assert m["triples"] == summary["triples"]
    assert m["lineage"]["n_parts"] == 4

    # idempotent re-run: nothing to do, counts unchanged
    again = _run(
        capsys,
        ["run", "--input", small_fixture_dir, "--output", out,
         "--checkpoint", "--n-parts", "4"],
    )
    assert again["triples"] == summary["triples"]


def test_cli_checkpoint_rejects_variants(ray_session, small_fixture_dir, tmp_path):
    rc = main(["run", "--input", small_fixture_dir,
               "--output", str(tmp_path / "x"),
               "--variant", "untagged", "--checkpoint"])
    assert rc == 2


def test_cli_centrality_override(ray_session, small_fixture_dir, tmp_path, capsys):
    out = str(tmp_path / "cent")
    summary = _run(
        capsys,
        ["run", "--input", small_fixture_dir, "--output", out,
         "--centrality", "FreemanClosenessCentrality"],
    )
    assert summary["triples"] > 0


def test_cli_curate_steps_chain(ray_session, tmp_path, capsys):
    spec = [
        {"step": "keep_lang", "langs": ["en", "fr"]},
        {"step": "quality_score"},
        {"step": "min_quality", "threshold": 0.3},
        {"step": "exact_dedup"},
    ]
    spec_file = tmp_path / "chain.json"
    spec_file.write_text(json.dumps(spec))
    out = str(tmp_path / "curated")
    summary = _run(
        capsys,
        ["curate", "--input", "/root/testdata/sf0.001/documents.parquet",
         "--output", out, "--steps", str(spec_file)],
    )
    assert summary["rows_out"] > 0

    # equals the library chain directly
    import ray.data as rd

    from reden_ray.pipelines.steps import run_chain

    direct = run_chain(
        rd.read_parquet("/root/testdata/sf0.001/documents.parquet"), spec
    )
    assert direct.count() == summary["rows_out"]


def test_cli_parser_rejects_unknown():
    with pytest.raises(SystemExit):
        main(["run", "--input", "x"])  # missing --output
