"""Alias-dictionary index (the Lucene index re-expressed, ST1/S4).

The reference indexes TSV dictionary rows into ONE Lucene FS index PER
NE TYPE (``indexDir.split(",")[ind]``, MainNELApp.java:249-250) with an
exact-match ``KeywordAnalyzer`` query on the normalized alias and a
top-100 hit cap, reopening the index on every query
(/root/reference/src/fr/lip6/reden/nelinker/DicoProcessingNEL.java:
192-296 build, :305-339 search).  Here the dictionary is a hash map
``(kind, alias_norm) -> [tab-joined uri-group strings]`` built ONCE per
actor from an Arrow table:

- build cost is amortized across all batches of an actor-pool stage
  (``__init__``-time — the Ray-idiomatic fix for the reopen-per-query
  waste);
- hit order is dictionary-row order (the reference iterates a Java
  ``HashSet`` — order unspecified; row order is our canonical choice);
- the 100-row cap applies before string-dedup, like Lucene's
  ``search(query, 100)`` over per-row docs;
- a dictionary without a ``kind`` column serves every NE type (the
  single-tag configuration).

Scale path: at web scale ship the dictionary as Parquet and either
(a) broadcast it once via ``ray.put`` when it fits a node (few GB; the
object store shares one copy across that node's workers), or
(b) hash-shard ``alias_norm`` across an actor pool and route batches by
shard, or
(c) skip lookup state entirely and shuffle-join mentions x dictionary on
``norm`` (stages.joins.hash_join) — preferred at 10^12 docs.
"""

from __future__ import annotations

import pyarrow as pa


class DictionaryIndex:
    """Exact-match alias lookup with reference cap + dedup semantics."""

    def __init__(self, table: pa.Table, max_rows: int = 100):
        self.max_rows = max_rows
        self.typed = "kind" in table.column_names
        self._by_key: dict[tuple[str, str], list[str]] = {}
        self._by_norm: dict[str, list[str]] = {}  # cross-kind, row order
        norms = table.column("alias_norm").to_pylist()
        kinds = (
            table.column("kind").to_pylist() if self.typed else [""] * len(norms)
        )
        groups = table.column("uri_group").to_pylist()
        by_key = self._by_key
        by_norm = self._by_norm
        for kind, norm, group in zip(kinds, norms, groups):
            joined = "\t".join(group)
            by_key.setdefault((kind, norm), []).append(joined)
            by_norm.setdefault(norm, []).append(joined)

    def groups(self, norm: str, kind: str = "") -> list[list[str]]:
        """Candidate URI groups, capped then string-deduped, row order.

        ``kind="ANY"`` searches across every per-type dictionary (the
        untagged-NER path — no reference analogue; rows stay in global
        dictionary-row order)."""
        if kind == "ANY" or not self.typed:
            rows = self._by_norm.get(norm)
        else:
            rows = self._by_key.get((kind, norm))
        if not rows:
            return []
        seen: dict[str, None] = {}
        for joined in rows[: self.max_rows]:
            seen.setdefault(joined, None)
        return [j.split("\t") for j in seen]

    def __len__(self) -> int:
        return len(self._by_key)


# --- sharded scale path ---------------------------------------------------

def make_dictionary_shard_actors(table: pa.Table, n_shards: int) -> list:
    """alias_norm-hash shard actors for dictionaries beyond node memory
    (option (b) in the module docstring; option (c), the shuffle join,
    lives in pipelines.kg.candidates_dataset_join)."""
    import hashlib

    import ray

    @ray.remote(num_cpus=0.5)
    class DictionaryShard:
        def __init__(self, tbl: pa.Table, max_rows: int):
            self.index = DictionaryIndex(tbl, max_rows=max_rows)

        def groups_many(
            self, keys: list[tuple[str, str]]
        ) -> dict[tuple[str, str], list[list[str]]]:
            out = {}
            for kind, norm in keys:
                g = self.index.groups(norm, kind)
                if g:
                    out[(kind, norm)] = g
            return out

    def shard_of(norm: str) -> int:
        return (
            int.from_bytes(hashlib.blake2b(norm.encode(), digest_size=4).digest(), "big")
            % n_shards
        )

    norms = table.column("alias_norm").to_pylist()
    ids = [shard_of(n) for n in norms]
    actors = []
    for s in range(n_shards):
        mask = pa.array([i == s for i in ids])
        actors.append(DictionaryShard.remote(table.filter(mask), 100))
    return actors


class ShardedDictionary:
    """Batched lookup client over the shard pool; per-batch keys are
    deduped and routed by alias_norm hash (one RPC per touched shard)."""

    def __init__(self, actors: list):
        import hashlib

        self.actors = actors
        self.n_shards = len(actors)
        self._h = hashlib.blake2b

    def _shard(self, norm: str) -> int:
        return int.from_bytes(self._h(norm.encode(), digest_size=4).digest(), "big") % self.n_shards

    def groups_many(self, keys: list[tuple[str, str]]) -> dict:
        import ray

        by_shard: dict[int, list[tuple[str, str]]] = {}
        for kind, norm in set(keys):
            by_shard.setdefault(self._shard(norm), []).append((kind, norm))
        futures = [self.actors[s].groups_many.remote(ks) for s, ks in by_shard.items()]
        out: dict = {}
        for part in ray.get(futures):
            out.update(part)
        return out
