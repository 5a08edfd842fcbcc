"""Endpoint→dump ingestion adapter (VERDICT r3 item 7): the dictionary
built from an adapter-ingested dump must EQUAL the direct dictbuild
path, and reruns must skip committed shards (letter-granular resume,
QuerySource.java parity)."""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data as rd

from reden_ray.sources.endpoint import (
    EndpointSpec,
    ingest_endpoint,
    local_table_pager,
    read_dump,
)
from reden_ray.sources.registry import extract_source


def _dump_table() -> pa.Table:
    names = [
        ("Ada", "Lovelace"), ("Alan", "Turing"), ("Grace", "Hopper"),
        ("Kurt", "Godel"), ("Emmy", "Noether"), ("Zoe", "42"),
        ("Tim", "Taylor"), ("Tom", "Thumb"), ("Ann", "Archer"),
    ]
    return pa.table(
        {
            "uri": pa.array([f"http://kb.test/p/{i}" for i in range(len(names))]),
            "kind": pa.array(["PER"] * len(names)),
            "firstname": pa.array([f for f, _ in names]),
            "lastname": pa.array([l for _, l in names]),
            "gender": pa.array(["x"] * len(names)),
            "birth": pa.array(["1900"] * len(names)),
            "death": pa.array(["1980"] * len(names)),
            "equivalents": pa.array([[] for _ in names], pa.list_(pa.string())),
        }
    )


def _dictionary_rows(ds):
    from reden_ray.pipelines.dictbuild import build_dictionary, merge_solutions

    rows = build_dictionary(merge_solutions(extract_source(ds, "author_bnf"))).take_all()
    return sorted(
        (r["alias_norm"], r["alias_raw"], r["name_std"], tuple(r["uri_group"]))
        for r in rows
    )


def test_adapter_dictionary_equals_direct_path(ray_session, tmp_path):
    dump = _dump_table()
    spec = EndpointSpec(
        name="author_bnf_endpoint",
        fetch=local_table_pager(dump),
        page_size=2,  # force multi-page shards
    )
    out = str(tmp_path / "dump")
    manifest = ingest_endpoint(spec, out)
    m = {r["shard"]: r for r in manifest.to_pylist()}
    assert len(m) == 27 and not any(r["skipped"] for r in m.values())
    assert m["t"]["rows"] == 3 and m["t"]["pages"] == 2  # Turing/Taylor/Thumb
    assert m["other"]["rows"] == 1  # '42'
    assert sum(r["rows"] for r in m.values()) == dump.num_rows

    via_adapter = _dictionary_rows(read_dump(out))
    direct = _dictionary_rows(rd.from_arrow(dump))
    assert via_adapter == direct


def test_adapter_resume_skips_committed_shards(ray_session, tmp_path):
    dump = _dump_table()
    spec = EndpointSpec(name="e", fetch=local_table_pager(dump), page_size=2)
    out = str(tmp_path / "dump")
    ingest_endpoint(spec, out)

    # sabotage one shard: drop its marker (simulates a crash mid-shard)
    os.remove(os.path.join(out, "shard=t", "_SUCCESS"))
    manifest2 = ingest_endpoint(spec, out).to_pylist()
    redone = [r for r in manifest2 if not r["skipped"]]
    assert [r["shard"] for r in redone] == ["t"]
    assert redone[0]["rows"] == 3
    assert all(r["skipped"] for r in manifest2 if r["shard"] != "t")
    # dump still reads back complete
    assert read_dump(out).count() == dump.num_rows


def test_adapter_retries_then_fails_cleanly(ray_session, tmp_path):
    calls = {"n": 0}
    dump = _dump_table()
    base = local_table_pager(dump)

    def flaky(shard: str, offset: int, limit: int):
        if shard == "a":
            raise ConnectionError("endpoint down")
        return base(shard, offset, limit)

    spec = EndpointSpec(name="e", fetch=flaky, page_size=2, shards=("a",), max_retries=2)
    import pytest

    with pytest.raises(Exception, match="after 2 retries"):
        ingest_endpoint(spec, str(tmp_path / "dump2"))
