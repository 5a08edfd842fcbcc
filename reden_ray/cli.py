"""Job-submit entrypoint for the KG-construction pipeline.

The north rule runs the engine "via ``ray job submit`` on a fixed-size
multi-node Ray cluster"; this module is that submit target — the
Ray-native analogue of the reference's ``MainNELApp`` CLI
(/root/reference/src/fr/lip6/reden/MainNELApp.java:62-180, which parses
``-annotateTexts``/``-createDico``/config properties and runs the matching
mode).  Usage on a cluster:

    ray job submit --working-dir . -- \\
        python -m reden_ray.cli run --input /data/corpus --output /data/out \\
            --checkpoint --n-parts 256

and locally (Ray auto-inits through the same guard)::

    python -m reden_ray.cli run --input testdata/fixtures --output /tmp/out

Subcommands
-----------
``run``      read a fixture/corpus directory (pages / dictionary /
             adjacency / rels parquet), run one of the three pipeline
             variants, write links+triples parquet.  ``--checkpoint``
             switches to the partitioned, manifest-tracked resumable
             writer (state/checkpoint.py) — re-running the identical
             command after a crash completes only the missing partitions.
``manifest`` summarize a checkpointed output's manifest (per-partition
             lineage + metrics, the north-rule resumability artifact).

Never calls ``ray.init`` when a session already exists (driver contract);
standalone invocations init from RAY_ADDRESS / local.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _ensure_ray() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(include_dashboard=False)


def _build_config(args) -> "LinkerConfig":
    import dataclasses

    from .pipelines.kg import fixture_config

    cfg = fixture_config(args.input)
    overrides = {}
    if args.centrality:
        overrides["measure"] = args.centrality
    if args.max_context_mentions is not None:
        overrides["max_context_mentions"] = args.max_context_mentions
    if args.variant == "untagged":
        overrides["ne_types"] = ("ANY",)
    elif args.variant == "dict-tagged":
        overrides["ne_types"] = tuple(cfg.ne_types) + ("ANY",)
    return dataclasses.replace(cfg, **overrides) if overrides else cfg


def _run_variant(args, cfg):
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from .config import ExecConfig
    from .pipelines.kg import (
        candidates_dataset,
        dict_tagged_mentions_dataset,
        linked_dataset,
        mentions_dataset,
        untagged_mentions_dataset,
    )

    exec_cfg = ExecConfig(stateless=args.stateless)
    pages = rd.read_parquet(
        os.path.join(args.input, "pages.parquet"), columns=["url", "html"]
    )
    dict_ref = ray.put(pq.read_table(os.path.join(args.input, "dictionary.parquet")))
    adj_ref = ray.put(pq.read_table(os.path.join(args.input, "adjacency.parquet")))
    if args.variant == "untagged":
        ments = untagged_mentions_dataset(pages)
    elif args.variant == "dict-tagged":
        ments = dict_tagged_mentions_dataset(pages, dict_ref, exec_cfg)
    else:
        ments = mentions_dataset(pages, exec_cfg)
    cands = candidates_dataset(ments, dict_ref, cfg, exec_cfg)
    return linked_dataset(cands, adj_ref, cfg, exec_cfg)


def cmd_run(args) -> int:
    _ensure_ray()
    t0 = time.time()
    if args.checkpoint:
        if args.variant != "tagged":
            print("--checkpoint currently supports the tagged variant only",
                  file=sys.stderr)
            return 2
        from .state.checkpoint import run_checkpointed

        manifest = run_checkpointed(args.input, args.output, n_parts=args.n_parts)
        parts = manifest.data["partitions"]
        summary = {
            "mode": "checkpointed",
            "partitions": len(parts),
            "links": sum(p["links"] for p in parts.values()),
            "triples": sum(p["triples"] for p in parts.values()),
            "sec": round(time.time() - t0, 2),
            "output": args.output,
        }
    else:
        import pyarrow.compute as pc

        from .pipelines.kg import links_view, triples_view

        cfg = _build_config(args)
        combined = _run_variant(args, cfg)
        links_dir = os.path.join(args.output, "links")
        triples_dir = os.path.join(args.output, "triples")
        links = links_view(combined)
        links.write_parquet(links_dir)
        triples_view(combined).write_parquet(triples_dir)
        import ray.data as rd

        n_links = rd.read_parquet(links_dir, columns=["url"]).count()
        n_triples = rd.read_parquet(triples_dir, columns=["subj"]).count()
        summary = {
            "mode": args.variant,
            "links": n_links,
            "triples": n_triples,
            "sec": round(time.time() - t0, 2),
            "output": args.output,
        }
    print(json.dumps(summary))
    return 0


def cmd_curate(args) -> int:
    """Run a declarative PipelineStep chain (pipelines/steps.py) over a
    documents parquet — the curation counterpart of ``run``."""
    _ensure_ray()
    import ray.data as rd

    from .pipelines.steps import run_chain

    t0 = time.time()
    ds = rd.read_parquet(args.input)
    out = run_chain(ds, args.steps)
    out.write_parquet(args.output)
    n = rd.read_parquet(args.output).count()
    print(json.dumps({
        "mode": "curate",
        "rows_out": n,
        "sec": round(time.time() - t0, 2),
        "output": args.output,
    }))
    return 0


def cmd_manifest(args) -> int:
    from .state.checkpoint import Manifest

    manifest = Manifest(args.output)
    parts = manifest.data["partitions"]
    print(json.dumps({
        "lineage": manifest.data["lineage"],
        "partitions_done": sorted(int(k) for k in parts),
        "links": sum(p["links"] for p in parts.values()),
        "triples": sum(p["triples"] for p in parts.values()),
    }, sort_keys=True))
    return 0


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="reden_ray", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("run", help="run the KG pipeline over a corpus directory")
    r.add_argument("--input", required=True,
                   help="directory holding pages/dictionary/adjacency/rels parquet")
    r.add_argument("--output", required=True, help="output directory")
    r.add_argument("--variant", choices=["tagged", "untagged", "dict-tagged"],
                   default="tagged")
    r.add_argument("--centrality", default=None,
                   help="centrality measure name (reference config line 24)")
    r.add_argument("--max-context-mentions", type=int, default=None,
                   help="skew guard: truncate mega-contexts to N mentions")
    r.add_argument("--stateless", action="store_true",
                   help="task pools + worker caches instead of actor pools")
    r.add_argument("--checkpoint", action="store_true",
                   help="partitioned manifest-tracked resumable output")
    r.add_argument("--n-parts", type=int, default=8,
                   help="checkpoint partition count (size to retryable units)")
    r.set_defaults(fn=cmd_run)

    c = sub.add_parser("curate", help="run a declarative step chain over parquet docs")
    c.add_argument("--input", required=True, help="documents parquet path/directory")
    c.add_argument("--output", required=True)
    c.add_argument("--steps", required=True,
                   help="JSON list of {'step': name, **params}, inline or a file path")
    c.set_defaults(fn=cmd_curate)

    m = sub.add_parser("manifest", help="summarize a checkpointed output manifest")
    m.add_argument("--output", required=True)
    m.set_defaults(fn=cmd_manifest)
    return p


def main(argv=None) -> int:
    args = make_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
