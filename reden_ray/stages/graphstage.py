"""Per-context fusion stage: groupby((url, context_id)).map_groups(ContextLinker).

The distributed re-expression of the reference's context loop
(MainNELApp.java:227-335): each group = one context's mention rows (with
their candidate URI groups); the UDF rebuilds the candidate map with the
reference's last-NE-type-wins merge, runs
``reden_ray.core.linker.link_context`` (fuse -> prune -> degree
centrality -> argmax choose) against an adjacency index held by the
actor, and emits a COMBINED table of link rows and triple rows
(``record_type`` column discriminates; one execution feeds both sinks).

State: the RDF adjacency table is broadcast once via ``ray.put``; each
actor builds its ``AdjacencyIndex`` in ``__init__`` (once per actor, not
per batch — ST2 in SURVEY.md §2.3).  Context graphs are small (10^2-10^3
edges) so the per-group Python work is bounded; pathological hot
contexts are capped upstream (see pipelines.kg SKEW notes).
"""

from __future__ import annotations

import pyarrow as pa

from ..config import LinkerConfig
from ..core.linker import CandidateMap, MentionRow, link_context
from ..state.adjacency import AdjacencyIndex

COMBINED_SCHEMA = pa.schema(
    [
        ("record_type", pa.string()),  # 'link' | 'triple'
        ("url", pa.string()),
        ("context_id", pa.int32()),
        ("route", pa.string()),
        ("mention_id", pa.int32()),
        ("surface", pa.string()),
        ("ne_type", pa.string()),
        ("chosen_uris", pa.list_(pa.string())),
        ("score", pa.float64()),
        ("method", pa.string()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("weight", pa.float64()),
    ]
)


def rebuild_candidate_map(
    mentions: list[MentionRow], groups_by_rowpos: list[list[list[str]]], cfg: LinkerConfig
) -> CandidateMap:
    """Reference merge semantics (MainNELApp.java:233-256): per NE type in
    configured order, first occurrence of a surface defines its groups;
    across types, ``Map.putAll`` => LAST type wins for shared surfaces."""
    merged: CandidateMap = {}
    for ne_type in cfg.ne_types:
        per_type: CandidateMap = {}
        for m, groups in zip(mentions, groups_by_rowpos):
            if m.ne_type != ne_type or m.surface in per_type:
                continue
            if groups:
                per_type[m.surface] = groups
        merged.update(per_type)
    return merged


# worker-global adjacency cache for the stateless-task fusion variant
# (see stages.candidates._WORKER_INDEX_CACHE for the rationale)
_ADJ_CACHE: dict = {}


def _cached_adjacency(adj_ref) -> AdjacencyIndex:
    key = getattr(adj_ref, "hex", lambda: id(adj_ref))()
    idx = _ADJ_CACHE.get(key)
    if idx is None:
        import ray

        table = ray.get(adj_ref) if not isinstance(adj_ref, pa.Table) else adj_ref
        idx = AdjacencyIndex(table)
        _ADJ_CACHE.clear()
        _ADJ_CACHE[key] = idx
    return idx


def make_context_linker_fn(adj_ref, cfg: LinkerConfig):
    """Stateless-task variant of BucketedContextLinker."""

    def link(batch: pa.Table) -> pa.Table:
        return _link_sorted_batch(batch, _cached_adjacency(adj_ref), cfg)

    return link


def make_sharded_context_linker_fn(shard_actors: list, cfg: LinkerConfig):
    """Fusion against a SHARDED adjacency actor pool (the KB-exceeds-
    node-memory path): each batch prefetches its URIs' neighborhoods in
    two batched RPC rounds (state.adjacency.ShardedAdjacency), then
    links fully locally — identical output to the broadcast path."""
    from ..state.adjacency import ShardedAdjacency

    client = ShardedAdjacency(shard_actors, cfg.same_as_property)

    def link(batch: pa.Table) -> pa.Table:
        local = client.prefetch_for_groups(batch.column("uri_groups").to_pylist())
        return _link_sorted_batch(batch, local, cfg)

    return link


class BucketedContextLinker:
    """Bucketed fusion: one call per HASH BUCKET of contexts, not per
    context.  The pipeline adds ``bucket = blake2(url, context_id) % P``
    and hash-shuffles on it; each group call receives a whole bucket,
    sorts it once by (url, context_id, mention_id), walks the context
    boundaries, and emits ONE combined table — per-group Python overhead
    (schema building, column conversion) is amortized across hundreds of
    contexts.  This is also where hot-context skew would be salted: a
    pathological context stays bounded by its own size, never by the
    bucket's, because buckets parallelize freely via P.
    """

    def __init__(self, adj_ref, cfg: LinkerConfig):
        import ray

        table = ray.get(adj_ref) if not isinstance(adj_ref, pa.Table) else adj_ref
        self.adjacency = AdjacencyIndex(table)
        self.cfg = cfg

    def __call__(self, group: pa.Table) -> pa.Table:
        return _link_sorted_batch(group, self.adjacency, self.cfg)


def _link_sorted_batch(group: pa.Table, adjacency: AdjacencyIndex, cfg: LinkerConfig) -> pa.Table:
    import pyarrow.compute as pc

    order = pc.sort_indices(
        group,
        sort_keys=[("url", "ascending"), ("context_id", "ascending"), ("mention_id", "ascending")],
    )
    group = group.take(order)
    urls = group.column("url").to_pylist()
    cids = group.column("context_id").to_pylist()
    mids = group.column("mention_id").to_pylist()
    surfaces = group.column("surface").to_pylist()
    ne_types = group.column("ne_type").to_pylist()
    uri_groups = group.column("uri_groups").to_pylist()

    cols: dict[str, list] = {name: [] for name in COMBINED_SCHEMA.names}
    n = len(urls)
    start = 0
    star_cache: dict = {}  # per-batch: popular entities' fan-outs reused
    while start < n:
        end = start
        while end < n and urls[end] == urls[start] and cids[end] == cids[start]:
            end += 1
        mentions = [
            MentionRow(mids[i], surfaces[i], ne_types[i]) for i in range(start, end)
        ]
        candidate_map = rebuild_candidate_map(mentions, uri_groups[start:end], cfg)
        res = link_context(mentions, candidate_map, adjacency, cfg, star_cache)
        _emit(cols, urls[start], cids[start], res)
        start = end
    return pa.Table.from_arrays(
        [pa.array(cols[f.name], f.type) for f in COMBINED_SCHEMA],
        schema=COMBINED_SCHEMA,
    )


def _emit(cols: dict[str, list], url: str, context_id: int, res) -> None:
    """Append one context's links + triples to the output columns.

    Triples dominate the output ~30:1, so they bulk-extend via
    ``zip(*triples)`` (C-speed column transpose) instead of per-row
    appends — measured ~2x on the emit share of the fused stage.
    Row order is unchanged: links first, then triples, per context."""
    nl, nt = len(res.links), len(res.triples)
    k = nl + nt
    for l in res.links:  # links are few (<= one per mention)
        cols["record_type"].append("link")
        cols["mention_id"].append(l.mention_id)
        cols["surface"].append(l.surface)
        cols["ne_type"].append(l.ne_type)
        cols["chosen_uris"].append(l.chosen_uris)
        cols["score"].append(l.score)
        cols["method"].append(l.method)
        cols["subj"].append(None)
        cols["pred"].append(None)
        cols["obj"].append(None)
        cols["weight"].append(None)
    if nt:
        subj, pred, obj, weight = zip(*res.triples)
        nones = [None] * nt
        cols["record_type"].extend(["triple"] * nt)
        cols["mention_id"].extend(nones)
        cols["surface"].extend(nones)
        cols["ne_type"].extend(nones)
        cols["chosen_uris"].extend(nones)
        cols["score"].extend(nones)
        cols["method"].extend(nones)
        cols["subj"].extend(subj)
        cols["pred"].extend(pred)
        cols["obj"].extend(obj)
        cols["weight"].extend(weight)
    cols["url"].extend([url] * k)
    cols["context_id"].extend([context_id] * k)
    cols["route"].extend([res.route] * k)


class ContextLinker:
    """map_groups callable class; adjacency index built once per actor."""

    def __init__(self, adj_ref, cfg: LinkerConfig):
        import ray

        table = ray.get(adj_ref) if not isinstance(adj_ref, pa.Table) else adj_ref
        self.adjacency = AdjacencyIndex(table)
        self.cfg = cfg

    def __call__(self, group: pa.Table) -> pa.Table:
        cfg = self.cfg
        url = group.column("url")[0].as_py()
        context_id = group.column("context_id")[0].as_py()
        order = pa.compute.sort_indices(group.column("mention_id"))
        group = group.take(order)
        mentions = [
            MentionRow(mid, surface, ne_type)
            for mid, surface, ne_type in zip(
                group.column("mention_id").to_pylist(),
                group.column("surface").to_pylist(),
                group.column("ne_type").to_pylist(),
            )
        ]
        groups_by_rowpos = group.column("uri_groups").to_pylist()
        candidate_map = rebuild_candidate_map(mentions, groups_by_rowpos, cfg)
        res = link_context(mentions, candidate_map, self.adjacency, cfg)

        n_links, n_triples = len(res.links), len(res.triples)
        n = n_links + n_triples
        cols: dict[str, list] = {name: [] for name in COMBINED_SCHEMA.names}
        for l in res.links:
            cols["record_type"].append("link")
            cols["mention_id"].append(l.mention_id)
            cols["surface"].append(l.surface)
            cols["ne_type"].append(l.ne_type)
            cols["chosen_uris"].append(l.chosen_uris)
            cols["score"].append(l.score)
            cols["method"].append(l.method)
            cols["subj"].append(None)
            cols["pred"].append(None)
            cols["obj"].append(None)
            cols["weight"].append(None)
        for subj, pred, obj, weight in res.triples:
            cols["record_type"].append("triple")
            cols["mention_id"].append(None)
            cols["surface"].append(None)
            cols["ne_type"].append(None)
            cols["chosen_uris"].append(None)
            cols["score"].append(None)
            cols["method"].append(None)
            cols["subj"].append(subj)
            cols["pred"].append(pred)
            cols["obj"].append(obj)
            cols["weight"].append(weight)
        cols["url"] = [url] * n
        cols["context_id"] = [context_id] * n
        cols["route"] = [res.route] * n
        return pa.Table.from_arrays(
            [pa.array(cols[f.name], f.type) for f in COMBINED_SCHEMA],
            schema=COMBINED_SCHEMA,
        )
