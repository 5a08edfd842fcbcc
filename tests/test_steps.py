"""PipelineStep protocol + registry: declared chains are built from data
and produce exactly what calling the underlying stages directly produces."""

from __future__ import annotations

import json

import pyarrow.compute as pc
import pytest

from reden_ray.pipelines.steps import (
    STEP_BUILDERS,
    FnStep,
    PipelineStep,
    apply_steps,
    build_chain,
    build_step,
    run_chain,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs():
    import ray.data as rd

    return rd.read_parquet(f"{SF_DIR}/documents.parquet")


def test_protocol_and_registry():
    step = build_step({"step": "token_stats"})
    assert isinstance(step, PipelineStep)
    assert isinstance(FnStep("x", lambda ds: ds), PipelineStep)
    with pytest.raises(ValueError, match="unknown step"):
        build_step({"step": "nope"})
    with pytest.raises(ValueError, match="missing 'step'"):
        build_step({"threshold": 1})
    # every registered factory builds with defaults that require no args
    # (except the ones with required params)
    required = {"keep_lang", "block_domains", "select_columns"}
    for name in STEP_BUILDERS:
        if name in required:
            continue
        assert isinstance(build_step({"step": name}), PipelineStep), name


def test_chain_from_json_equals_direct(ray_session):
    specs = [
        {"step": "keep_lang", "langs": ["en", "fr"]},
        {"step": "quality_score"},
        {"step": "min_quality", "threshold": 0.3},
        {"step": "exact_dedup"},
    ]
    chained = run_chain(_docs(), json.dumps(specs)).to_pandas()

    # direct: same stages called by hand
    from reden_ray.stages.dedup import exact_dedup
    from reden_ray.stages.textstats import QualityScore

    import pyarrow as pa

    lang_set = pa.array(["en", "fr"])
    langs_ok = _docs().map_batches(
        lambda b: b.filter(pc.is_in(b["lang"], value_set=lang_set)),
        batch_format="pyarrow",
    )
    scored = langs_ok.map_batches(QualityScore(), batch_format="pyarrow")
    kept = scored.map_batches(
        lambda b: b.filter(pc.greater_equal(b["quality"], 0.3)), batch_format="pyarrow"
    )
    direct = exact_dedup(kept).to_pandas()

    assert sorted(chained["doc_id"]) == sorted(direct["doc_id"])
    assert set(chained.columns) == set(direct.columns)


def test_steps_stay_lazy(ray_session):
    # building + applying a chain wires the DAG without executing it
    chain = build_chain([
        {"step": "lang_id"},
        {"step": "token_stats"},
        {"step": "fingerprint"},
    ])
    ds = apply_steps(_docs(), chain)
    # schema() may plan but take(1) is the first real execution; row count
    # of the input is never needed
    row = ds.take(1)[0]
    for col in ["lang_pred", "n_tokens_ws", "n_tokens_bpe"]:
        assert col in row


def test_pii_step_preserves_columns(ray_session):
    import pyarrow as pa
    import ray.data as rd

    t = pa.table({
        "doc_id": [1, 2],
        "text": ["mail me: bob@example.com now", "clean"],
        "source": ["a", "b"],
    })
    out = run_chain(rd.from_arrow(t), [{"step": "pii_redact"}]).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert "<EMAIL>" in out["text"][0]
    assert list(out["source"]) == ["a", "b"]  # non-text columns survive


def test_url_steps_compose(ray_session):
    import pyarrow as pa
    import ray.data as rd

    t = pa.table({
        "url": [
            "HTTP://Spam.example.com:80/a?utm_source=x",
            "https://ok.example.org/b",
        ],
        "warc_ts": pa.array([1, 2], pa.timestamp("us")),
    })
    out = run_chain(
        rd.from_arrow(t),
        [
            {"step": "url_normalize"},
            {"step": "block_domains", "blocklist": ["example.com"]},
        ],
    ).to_pandas()
    assert list(out["url"]) == ["https://ok.example.org/b"]
