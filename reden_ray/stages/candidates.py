"""Candidate generation stage (J2 + A1): mentions -> candidate URI groups.

An actor-pool ``map_batches`` class: each actor materializes the
``DictionaryIndex`` ONCE in ``__init__`` from a ``ray.put`` broadcast of
the dictionary's Arrow table (zero additional copies per node thanks to
the shared object store), then serves exact-match lookups per batch.
Per-batch work is deduped by (ne_type, norm) before hitting the index.

The output keeps one row PER MENTION with a nested
``uri_groups: list<list<string>>`` column — mentions without candidates
carry an empty list (the fusion stage still needs them for routing and
NIL links), so no left-join is needed downstream.

Reference parity: DicoProcessingNEL.retrieveMentionsURIsFromDicoWithIndex
(/root/reference/src/fr/lip6/reden/nelinker/DicoProcessingNEL.java:144-183)
including the top-100 cap and identical-group dedup; see
``reden_ray.core.candidates``.

Scale path (10^12 docs): swap this stage for a shuffle hash-join
``mentions ⨝ dictionary on (kind, norm)`` (stages.joins) when the
dictionary exceeds per-node memory; both variants emit the same schema.
"""

from __future__ import annotations

import pyarrow as pa

from ..config import LinkerConfig
from ..core.candidates import candidate_groups_for_surface
from ..state.dictionary import DictionaryIndex

CANDIDATE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("context_id", pa.int32()),
        ("mention_id", pa.int32()),
        ("surface", pa.string()),
        ("norm", pa.string()),
        ("ne_type", pa.string()),
        ("uri_groups", pa.list_(pa.list_(pa.string()))),
        ("n_groups", pa.int32()),
    ]
)


class CandidateLookup:
    """map_batches(CandidateLookup, fn_constructor_args=(dict_ref, cfg),
    concurrency=N) — dictionary loaded once per actor."""

    def __init__(self, dict_ref, cfg: LinkerConfig):
        import ray

        table = ray.get(dict_ref) if not isinstance(dict_ref, pa.Table) else dict_ref
        self.index = DictionaryIndex(table, max_rows=cfg.max_candidate_rows)

    def __call__(self, batch: pa.Table) -> pa.Table:
        norms = batch.column("norm").to_pylist()
        ne_types = batch.column("ne_type").to_pylist()
        surfaces = batch.column("surface").to_pylist()
        cache: dict[tuple[str, str], list[list[str]]] = {}
        groups_col: list[list[list[str]]] = []
        for surface, norm, kind in zip(surfaces, norms, ne_types):
            key = (kind, norm)
            hit = cache.get(key)
            if hit is None:
                hit = candidate_groups_for_surface(surface, self.index, kind)
                cache[key] = hit
            groups_col.append(hit)
        out = pa.Table.from_arrays(
            [
                batch.column("url"),
                batch.column("context_id"),
                batch.column("mention_id"),
                batch.column("surface"),
                batch.column("norm"),
                batch.column("ne_type"),
                pa.array(groups_col, pa.list_(pa.list_(pa.string()))),
                pa.array([len(g) for g in groups_col], pa.int32()),
            ],
            schema=CANDIDATE_SCHEMA,
        )
        return out


def explode_candidates(batch: pa.Table) -> pa.Table:
    """Per-mention rows -> per-candidate rows with ``cand_rank`` (the
    ``candidates`` logical table of SURVEY.md §1.2)."""
    cols = {
        "url": [], "context_id": [], "mention_id": [], "cand_rank": [], "uri_group": []
    }
    urls = batch.column("url").to_pylist()
    cids = batch.column("context_id").to_pylist()
    mids = batch.column("mention_id").to_pylist()
    groups = batch.column("uri_groups").to_pylist()
    for url, cid, mid, gs in zip(urls, cids, mids, groups):
        for rank, g in enumerate(gs):
            cols["url"].append(url)
            cols["context_id"].append(cid)
            cols["mention_id"].append(mid)
            cols["cand_rank"].append(rank)
            cols["uri_group"].append(g)
    return pa.Table.from_arrays(
        [
            pa.array(cols["url"], pa.string()),
            pa.array(cols["context_id"], pa.int32()),
            pa.array(cols["mention_id"], pa.int32()),
            pa.array(cols["cand_rank"], pa.int32()),
            pa.array(cols["uri_group"], pa.list_(pa.string())),
        ],
        names=["url", "context_id", "mention_id", "cand_rank", "uri_group"],
    )
