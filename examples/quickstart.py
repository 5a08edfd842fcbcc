#!/usr/bin/env python
"""Quickstart: run the KG-construction pipeline on your own tables.

Inputs (parquet):
  pages:       url: string, html: binary           (warc_ts/text/lang optional)
  dictionary:  alias_norm, alias_raw, name_std, kind, uri_group: list<string>
  adjacency:   subj, pred, obj, weight
  rels:        pred, weight                         (optional)

Usage:
  python examples/quickstart.py               # runs on the bundled synthetic corpus
  python examples/quickstart.py <data_dir>    # your own tables, same filenames
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")

import pyarrow.parquet as pq  # noqa: E402
import ray.data as rd  # noqa: E402

from reden_ray import ExecConfig, links_view, run_pipeline, triples_view  # noqa: E402
from reden_ray.pipelines.kg import fixture_config  # noqa: E402
from reden_ray.sources.fixtures import fixture_dir  # noqa: E402
from reden_ray.state.checkpoint import run_checkpointed  # noqa: E402

data_dir = sys.argv[1] if len(sys.argv) > 1 else fixture_dir(n_docs=200, n_entities=60, n_topics=10)

cfg = fixture_config(data_dir)  # reads rels.parquet if present
pages = rd.read_parquet(f"{data_dir}/pages.parquet", columns=["url", "html"])
dictionary = pq.read_table(f"{data_dir}/dictionary.parquet")
adjacency = pq.read_table(f"{data_dir}/adjacency.parquet")

combined = run_pipeline(
    pages, dictionary, adjacency, cfg, ExecConfig(stateless=True)
).materialize()

links = links_view(combined)
triples = triples_view(combined)
print("links:", links.count(), "| triples:", triples.count())
print("sample link:", links.take(1)[0])
print("sample triple:", triples.take(1)[0])

# resumable, partitioned output with per-partition lineage metrics:
manifest = run_checkpointed(data_dir, "/tmp/reden_quickstart_out", n_parts=4)
print("written partitions:", sorted(manifest.done_parts))

ray.shutdown()
