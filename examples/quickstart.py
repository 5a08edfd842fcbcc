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

# the reference's primary artifact: pages with ref_auto written back
from reden_ray.stages.annotate import annotated_pages  # noqa: E402

annotated = annotated_pages(pages, links)
sample = next(r for r in annotated.take(20) if b"ref_auto=" in r["html"])
i = sample["html"].find(b"ref_auto=")
print("annotated page snippet:", sample["html"][max(0, i - 60) : i + 70].decode("utf-8", "replace"))

# run-vs-run diff (e.g. after a config change): here, self-diff == empty
from reden_ray.pipelines.evaluate import diff_runs  # noqa: E402

print("self run-diff rows (expect 0):", diff_runs(links, links).count())

# untagged corpus? pre-tag it from the dictionary (semi-automatic
# annotation) instead of heuristic NER:
from reden_ray.pipelines.kg import run_dict_tagged_pipeline  # noqa: E402

dt_links = links_view(run_dict_tagged_pipeline(data_dir, ExecConfig(stateless=True)))
print("dict-tagged links:", dt_links.count())

ray.shutdown()
