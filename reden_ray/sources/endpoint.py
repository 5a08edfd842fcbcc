"""Endpoint→dump ingestion adapter — QuerySource.java parity offline.

The reference pages a live SPARQL endpoint per first-letter shard
(ldextractor/QuerySource.java:44-79: formulateSPARQLQuery with a..z +
'other' filterRegex, OFFSET/LIMIT pagination, retry-on-failure) and
writes per-letter TSVs it can re-run letter by letter.  A user
migrating from REDEN hits this first when their dictionary does not
yet exist as a dump — this module closes that gap WITHOUT a network:

- ``fetch(shard, offset, limit) -> list[dict]`` is a PLUGGABLE
  callable: in production an HTTP/SPARQL client (requests +
  SPARQL-results-JSON parsing goes here), in this sandbox/tests a
  local-table pager.  The adapter never imports a network library.
- Each shard ingests independently inside a Ray map task (one shard
  per block): sequential OFFSET/LIMIT pages stream to one parquet
  file per page (a page is the memory high-water mark, never the
  shard), then a ``_SUCCESS`` marker commits the shard.
- RESUME = rerun: shards whose marker exists are skipped, matching
  the reference's per-letter re-crawl convention and this repo's
  checkpointed-write pattern (pipelines/kg.run_checkpointed).

The resulting dump directory reads back with ``read_dump`` and feeds
``sources.registry.extract_source`` / ``build_dictionary_from_sources``
unchanged — tested equal to the direct dictbuild path in
tests/test_endpoint_adapter.py.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

LETTER_SHARDS: tuple[str, ...] = tuple("abcdefghijklmnopqrstuvwxyz") + ("other",)


@dataclass(frozen=True)
class EndpointSpec:
    """One paginated extraction endpoint (a QuerySource analogue).

    ``fetch`` must be deterministic per (shard, offset, limit) for
    resume correctness and is called from Ray worker processes — keep
    it picklable (top-level function or functools.partial)."""

    name: str
    fetch: Callable[[str, int, int], list[dict]]
    page_size: int = 10_000
    shards: tuple[str, ...] = field(default_factory=lambda: LETTER_SHARDS)
    max_retries: int = 3


def _ingest_shard(spec: EndpointSpec, out_dir: str, shard: str) -> dict:
    """Pull every page of one shard into parquet; commit with _SUCCESS."""
    part_dir = os.path.join(out_dir, f"shard={shard}")
    marker = os.path.join(part_dir, "_SUCCESS")
    if os.path.exists(marker):
        with open(marker) as f:
            prior = f.read().strip()
        return {
            "shard": shard,
            "rows": int(prior) if prior.isdigit() else -1,
            "pages": -1,
            "skipped": True,
        }
    os.makedirs(part_dir, exist_ok=True)
    # a failed previous attempt leaves orphan page files — restart the
    # shard cleanly (letter-granularity resume, like the reference)
    for f in os.listdir(part_dir):
        if f.startswith("page-"):
            os.remove(os.path.join(part_dir, f))
    offset = 0
    page_no = 0
    total = 0
    while True:
        rows = None
        err: Exception | None = None
        for _ in range(spec.max_retries):
            try:
                rows = spec.fetch(shard, offset, spec.page_size)
                break
            except Exception as e:  # endpoint hiccup: retry, then fail shard
                err = e
        if rows is None:
            raise RuntimeError(
                f"endpoint fetch failed for shard={shard} offset={offset} "
                f"after {spec.max_retries} retries"
            ) from err
        if rows:
            table = pa.Table.from_pylist(rows)
            tmp = os.path.join(part_dir, f".page-{page_no:05d}.parquet.tmp")
            pq.write_table(table, tmp)
            os.replace(tmp, os.path.join(part_dir, f"page-{page_no:05d}.parquet"))
            total += len(rows)
            page_no += 1
        if len(rows) < spec.page_size:
            break
        offset += spec.page_size
    with open(marker + ".tmp", "w") as f:
        f.write(str(total))
    os.replace(marker + ".tmp", marker)
    return {"shard": shard, "rows": total, "pages": page_no, "skipped": False}


def ingest_endpoint(spec: EndpointSpec, out_dir: str) -> pa.Table:
    """Ingest every shard (parallel across shards, one Ray map task
    each; pages stream within a shard).  Returns the manifest — one
    row per shard with rows/pages/skipped lineage."""
    os.makedirs(out_dir, exist_ok=True)
    shards = rd.from_items(
        [{"shard": s} for s in spec.shards]
    ).repartition(len(spec.shards))

    def run(batch: pa.Table) -> pa.Table:
        out = [
            _ingest_shard(spec, out_dir, s)
            for s in batch.column("shard").to_pylist()
        ]
        return pa.Table.from_pylist(
            out,
            schema=pa.schema(
                [
                    ("shard", pa.string()),
                    ("rows", pa.int64()),
                    ("pages", pa.int64()),
                    ("skipped", pa.bool_()),
                ]
            ),
        )

    manifest = shards.map_batches(run, batch_format="pyarrow", batch_size=None)
    t = pa.Table.from_pylist(
        sorted(manifest.take_all(), key=lambda r: r["shard"])
    )  # 27 rows — driver-sized by construction
    return t


def read_dump(out_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    """Read an ingested dump back as a Dataset (only committed shards;
    shard key rides as a partition directory, page files keep block
    parallelism)."""
    files: list[str] = []
    for shard_dir in sorted(os.listdir(out_dir)):
        full = os.path.join(out_dir, shard_dir)
        if not shard_dir.startswith("shard=") or not os.path.isdir(full):
            continue
        if not os.path.exists(os.path.join(full, "_SUCCESS")):
            continue
        files.extend(
            os.path.join(full, f)
            for f in sorted(os.listdir(full))
            if f.startswith("page-") and f.endswith(".parquet")
        )
    if not files:
        raise FileNotFoundError(f"no committed shards under {out_dir}")
    return rd.read_parquet(files, columns=columns)


def local_table_pager(table: pa.Table, shard_column: str = "lastname"):
    """The sandbox/test ``fetch``: pages a local Arrow table exactly
    like the endpoint would (shard filter + OFFSET/LIMIT).  Also the
    reference shape for writing a real SPARQL pager: replace the body
    with an HTTP round-trip that appends OFFSET/LIMIT to the query."""

    def fetch(shard: str, offset: int, limit: int) -> list[dict]:
        vals = [v.as_py() for v in table.column(shard_column)]
        if shard == "other":
            mask = [not (v and v[:1].isascii() and v[:1].isalpha()) for v in vals]
        else:
            mask = [bool(v) and v[:1].lower() == shard.lower() for v in vals]
        sub = table.filter(pa.array(mask, pa.bool_()))
        return sub.slice(offset, limit).to_pylist()

    return fetch
