"""RDF-adjacency store (the ``.n3`` neighborhood cache as a table, ST2).

The reference caches one ``.n3`` file per URI on local disk and unions
candidate files into a per-context Jena model
(/root/reference/src/fr/lip6/reden/nelinker/GraphHandlerNEL.java:78-103,
351-384).  Here the whole neighborhood store is one Arrow table
``(subj, pred, obj, weight)`` indexed into ``subj -> [(pred, obj)]``
ONCE per actor; ``has(uri)`` is the "``.n3`` file exists" analogue.

Scale path: a KB is O(10^8-10^9) triples — far smaller than the corpus.
Broadcast the packed index via ``ray.put`` when it fits a node (the
object store shares it across that node's workers), else hash-shard
``subj`` across an actor pool; never shuffle the corpus against it twice
(the 2-hop access pattern — group URIs, then sameAs targets — would
need two corpus-wide joins, vs two small lookups per context batch).
"""

from __future__ import annotations

import pyarrow as pa


class AdjacencyIndex:
    """subj -> list[(pred, obj)] with O(1) ``has``; row order preserved."""

    def __init__(self, table: pa.Table):
        self._by_subj: dict[str, list[tuple[str, str]]] = {}
        subjs = table.column("subj").to_pylist()
        preds = table.column("pred").to_pylist()
        objs = table.column("obj").to_pylist()
        by_subj = self._by_subj
        for s, p, o in zip(subjs, preds, objs):
            by_subj.setdefault(s, []).append((p, o))

    def get(self, uri: str) -> list[tuple[str, str]]:
        return self._by_subj.get(uri, [])

    def has(self, uri: str) -> bool:
        return uri in self._by_subj

    def __len__(self) -> int:
        return len(self._by_subj)


# --- sharded scale path ---------------------------------------------------

def shard_of(uri: str, n_shards: int) -> int:
    """Stable subj-hash shard id (blake2b — NOT Python hash)."""
    import hashlib

    return int.from_bytes(hashlib.blake2b(uri.encode(), digest_size=4).digest(), "big") % n_shards


class LocalAdjacency:
    """AdjacencyLookup over a prefetched subset (see ShardedAdjacency)."""

    def __init__(self, fetched: dict[str, list[tuple[str, str]]]):
        self._by_subj = fetched

    def get(self, uri: str):
        return self._by_subj.get(uri, [])

    def has(self, uri: str) -> bool:
        return uri in self._by_subj


class ShardedAdjacency:
    """Client for a pool of adjacency shard actors (ST2's true scale
    form: the KB exceeds node memory, so ``subj`` hash-shards live in N
    actors; batches PREFETCH every URI they might touch in two batched
    RPC rounds and then link fully locally — never one RPC per URI).

    Round 1 fetches all candidate-group URIs (+ their decomposed forms);
    round 2 fetches the sameAs targets discovered in round 1.  That
    covers exactly what the per-context algorithm can read
    (compute_equivalences / fuse_graph access patterns).
    """

    def __init__(self, actors: list, same_as_property: str):
        self.actors = actors
        self.n_shards = len(actors)
        self.same_as = same_as_property

    def fetch_many(self, uris: set[str]) -> dict[str, list[tuple[str, str]]]:
        import ray

        by_shard: dict[int, list[str]] = {}
        for u in uris:
            by_shard.setdefault(shard_of(u, self.n_shards), []).append(u)
        futures = [
            self.actors[s].get_many.remote(us) for s, us in by_shard.items()
        ]
        out: dict[str, list[tuple[str, str]]] = {}
        for part in ray.get(futures):
            out.update(part)
        return out

    def prefetch_for_groups(self, uri_groups_column) -> LocalAdjacency:
        """2-round prefetch for a batch: ``uri_groups_column`` is the
        per-mention list-of-groups column (one entry per mention row)."""
        from ..core.normalize import decompose, reencode_legacy_ascii

        def with_variants(target: set[str], uri: str) -> None:
            # each lookup key also prefetches its legacy-ASCII retry
            # form (GraphHandlerNEL.java:293-299) so the sharded path
            # answers the fuse stage's retry without an extra RPC and
            # stays output-identical to the broadcast path
            target.add(uri)
            enc = reencode_legacy_ascii(uri)
            if enc != uri:
                target.add(enc)

        round1: set[str] = set()
        for mention_groups in uri_groups_column:
            for group in mention_groups or []:
                for uri in group:
                    with_variants(round1, uri)
                    with_variants(round1, decompose(uri))
        fetched = self.fetch_many(round1)
        round2: set[str] = set()
        for uri, stmts in fetched.items():
            for pred, obj in stmts:
                if pred == self.same_as:
                    dec = decompose(obj)
                    if dec not in fetched:
                        with_variants(round2, dec)
                    if obj not in fetched:
                        with_variants(round2, obj)
        if round2:
            fetched.update(self.fetch_many(round2))
        return LocalAdjacency(fetched)


def make_shard_actors(table: pa.Table, n_shards: int) -> list:
    """Split the adjacency table into subj-hash shard actors."""
    import ray

    @ray.remote(num_cpus=0.5)
    class AdjacencyShard:
        def __init__(self, tbl: pa.Table):
            self.index = AdjacencyIndex(tbl)

        def get_many(self, uris: list[str]) -> dict[str, list[tuple[str, str]]]:
            g = self.index.get
            out = {}
            for u in uris:
                stmts = g(u)
                if stmts:
                    out[u] = stmts
            return out

        def size(self) -> int:
            return len(self.index)

    subjs = table.column("subj").to_pylist()
    shard_ids = [shard_of(s, n_shards) for s in subjs]
    actors = []
    import numpy as np

    ids = np.asarray(shard_ids)
    for s in range(n_shards):
        mask = pa.array(ids == s)
        actors.append(AdjacencyShard.remote(table.filter(mask)))
    return actors
