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


# Worker-global index cache for the STATELESS task variants: a task pool
# is more elastic than an actor pool (no actor-spawn latency, any idle
# worker serves), and Ray worker processes persist across tasks, so the
# index build is still amortized — keyed by the broadcast ref so repeat
# runs in one session reuse it.  One entry per (ref, type); bounded.
_WORKER_INDEX_CACHE: dict = {}


def _cached_index(dict_ref, max_rows: int) -> "DictionaryIndex":
    key = ("dict", getattr(dict_ref, "hex", lambda: id(dict_ref))(), max_rows)
    idx = _WORKER_INDEX_CACHE.get(key)
    if idx is None:
        import ray

        table = ray.get(dict_ref) if not isinstance(dict_ref, pa.Table) else dict_ref
        idx = DictionaryIndex(table, max_rows=max_rows)
        _WORKER_INDEX_CACHE.clear()  # hold at most one dictionary per worker
        _WORKER_INDEX_CACHE[key] = idx
    return idx


def make_candidate_lookup_fn(dict_ref, cfg: LinkerConfig):
    """Stateless-task variant of CandidateLookup (worker-global cache)."""

    def lookup(batch: pa.Table) -> pa.Table:
        index = _cached_index(dict_ref, cfg.max_candidate_rows)
        return _lookup_batch(batch, index, cfg)

    return lookup


def _lookup_batch(batch: pa.Table, index: DictionaryIndex, cfg: LinkerConfig) -> pa.Table:
    norms = batch.column("norm").to_pylist()
    ne_types = batch.column("ne_type").to_pylist()
    surfaces = batch.column("surface").to_pylist()
    cache: dict[tuple[str, str], list[list[str]]] = {}
    groups_col: list[list[list[str]]] = []
    for surface, norm, kind in zip(surfaces, norms, ne_types):
        key = (kind, norm)
        hit = cache.get(key)
        if hit is None:
            hit = candidate_groups_for_surface(surface, index, kind)
            cache[key] = hit
        groups_col.append(hit)
    return pa.Table.from_arrays(
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


def make_sharded_candidate_lookup_fn(shard_actors: list, cfg: LinkerConfig):
    """Candidate lookup against a SHARDED dictionary actor pool: the
    batch's (ne_type, norm) keys are deduped and fetched in one batched
    RPC per touched shard (state.dictionary.ShardedDictionary); output
    identical to the broadcast path."""
    from ..state.dictionary import ShardedDictionary

    client = ShardedDictionary(shard_actors)

    def lookup(batch: pa.Table) -> pa.Table:
        norms = batch.column("norm").to_pylist()
        ne_types = batch.column("ne_type").to_pylist()
        keys = list(zip(ne_types, norms))
        hits = client.groups_many(keys)
        groups_col = [hits.get(k, []) for k in keys]
        return pa.Table.from_arrays(
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

    return lookup


class CandidateLookup:
    """map_batches(CandidateLookup, fn_constructor_args=(dict_ref, cfg),
    concurrency=N) — dictionary loaded once per actor."""

    def __init__(self, dict_ref, cfg: LinkerConfig):
        import ray

        table = ray.get(dict_ref) if not isinstance(dict_ref, pa.Table) else dict_ref
        self.index = DictionaryIndex(table, max_rows=cfg.max_candidate_rows)
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _lookup_batch(batch, self.index, self.cfg)


class JoinedCandidateAssembler:
    """Rebuilds per-mention candidate groups from the SHUFFLE-JOIN path.

    Input: one hash bucket of ``mentions LEFT OUTER JOIN dictionary`` rows
    (one row per mention x matching dictionary row, ``uri_group_str``
    (tab-joined; Arrow joins reject list payloads) null for no-match
    mentions, ``dict_row`` = the dictionary row index).
    Emits CANDIDATE_SCHEMA rows: per mention, groups ordered by
    dictionary-row order, capped at ``max_rows`` then string-deduped —
    exactly the DictionaryIndex semantics, reproduced after a shuffle.
    """

    def __init__(self, cfg: LinkerConfig):
        self.cfg = cfg

    def __call__(self, group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group,
            sort_keys=[
                ("url", "ascending"),
                ("context_id", "ascending"),
                ("mention_id", "ascending"),
                ("dict_row", "ascending"),
            ],
        )
        group = group.take(order)
        urls = group.column("url").to_pylist()
        cids = group.column("context_id").to_pylist()
        mids = group.column("mention_id").to_pylist()
        surfaces = group.column("surface").to_pylist()
        norms = group.column("norm").to_pylist()
        ne_types = group.column("ne_type").to_pylist()
        uri_groups = group.column("uri_group_str").to_pylist()

        cols: dict[str, list] = {k: [] for k in CANDIDATE_SCHEMA.names}
        n = len(urls)
        start = 0
        max_rows = self.cfg.max_candidate_rows
        while start < n:
            end = start
            while (
                end < n
                and urls[end] == urls[start]
                and cids[end] == cids[start]
                and mids[end] == mids[start]
            ):
                end += 1
            seen: dict[str, None] = {}
            for i in range(start, min(end, start + max_rows)):
                g = uri_groups[i]
                if g is not None:
                    seen.setdefault(g, None)
            groups = [j.split("\t") for j in seen]
            cols["url"].append(urls[start])
            cols["context_id"].append(cids[start])
            cols["mention_id"].append(mids[start])
            cols["surface"].append(surfaces[start])
            cols["norm"].append(norms[start])
            cols["ne_type"].append(ne_types[start])
            cols["uri_groups"].append(groups)
            cols["n_groups"].append(len(groups))
            start = end
        return pa.Table.from_arrays(
            [pa.array(cols[f.name], f.type) for f in CANDIDATE_SCHEMA],
            schema=CANDIDATE_SCHEMA,
        )


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
