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
