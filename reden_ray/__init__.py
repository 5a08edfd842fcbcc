"""reden_ray — a Ray-Data-native knowledge-graph-construction engine.

Re-expresses the semantics of cvbrandoe/REDEN (graph-based named-entity
disambiguation and Linked-Data linking over annotated text corpora;
reference at /root/reference) as a streaming DAG of ``ray.data.Dataset``
transforms over zero-copy Arrow batches:

    pages (url, warc_ts, html, text, lang)
      -> extract_text          (map_batches, byte-identical per url)
      -> split_contexts        (flat map: page -> context rows)
      -> detect_mentions       (flat map: context -> mention rows)
      -> candidates            (normalized-alias dictionary lookup; broadcast
                                or bucketed hash join)
      -> adjacency attach      (RDF neighborhoods; broadcast index or
                                sharded actor pool)
      -> per-context fuse/prune/centrality/choose   (groupby.map_groups)
      -> links + (subj, pred, obj) triples, written as partitioned Parquet

The package never calls ``ray.init``; callers own the Ray session.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy convenience exports (keep ``import reden_ray`` Ray-free)."""
    if name in ("LinkerConfig", "ExecConfig"):
        from . import config

        return getattr(config, name)
    if name in (
        "run_pipeline",
        "run_fixture_pipeline",
        "run_untagged_pipeline",
        "run_dict_tagged_pipeline",
        "links_view",
        "triples_view",
        "use_hash_shuffle",
    ):
        from .pipelines import kg

        return getattr(kg, name)
    if name in ("read_tei_pages", "read_tei_gold"):
        from .sources import tei

        return getattr(tei, name)
    if name == "read_warc_pages":
        from .sources import warc

        return getattr(warc, name)
    raise AttributeError(name)
