"""A tiny simple-directed-weighted-labeled graph for per-context fusion.

Mirrors the semantics the reference gets from JGraphT's
``SimpleDirectedWeightedGraph<String, LabeledEdge>``
(/root/reference/src/fr/lip6/reden/nelinker/GraphHandlerNEL.java:211-343,
LabeledEdge.java:11-33):

- vertex identity = exact string; insertion-ordered;
- at most ONE edge per ordered (src, dst) pair — the FIRST inserted wins
  (``addEdge`` on an existing pair is a no-op in a simple graph);
- self-loops are never inserted (callers guard case-insensitively);
- an edge carries a label (predicate URI) and a weight.

Contexts are small (10^2-10^3 edges), so plain dicts suffice; this never
holds more than one context's graph.
"""

from __future__ import annotations


class ContextGraph:
    __slots__ = ("vertices", "edges", "out_adj", "in_adj", "wdeg")

    def __init__(self) -> None:
        self.vertices: dict[str, None] = {}
        # (src, dst) -> (label, weight); insertion-ordered, first-wins
        self.edges: dict[tuple[str, str], tuple[str, float]] = {}
        self.out_adj: dict[str, dict[str, None]] = {}
        self.in_adj: dict[str, dict[str, None]] = {}
        # incident edge-WEIGHT sums: jgrapht-sna's DegreeCentrality sums
        # getEdgeWeight over edgesOf(v) (verified via javap on
        # jgrapht-sna-1.2.jar DegreeCentrality.calculate: dload weight,
        # dadd per incident edge, ddiv by n-1)
        self.wdeg: dict[str, float] = {}

    def add_vertex(self, v: str) -> None:
        if v not in self.vertices:
            self.vertices[v] = None
            self.out_adj[v] = {}
            self.in_adj[v] = {}
            self.wdeg[v] = 0.0

    def add_edge(self, src: str, dst: str, label: str, weight: float) -> None:
        """First edge per (src, dst) wins; both endpoints must exist."""
        val = (label, weight)
        # setdefault = one hash probe for the contains-check AND the
        # insert (add_edge runs ~10^6 times per block — measured hot)
        if self.edges.setdefault((src, dst), val) is not val:
            return
        self.out_adj[src][dst] = None
        self.in_adj[dst][src] = None
        self.wdeg[src] += weight
        self.wdeg[dst] += weight

    def incident(self, v: str):
        """Endpoints of all edges touching ``v`` (both directions), as
        (src, dst) pairs in edge-insertion order."""
        return [
            (s, d)
            for (s, d) in self.edges
            if s == v or d == v
        ]

    def neighbors_of(self, v: str) -> list[tuple[str, str]]:
        """(src, dst) per incident edge — cheap form used by pruning."""
        out = [(v, d) for d in self.out_adj.get(v, ())]
        out += [(s, v) for s in self.in_adj.get(v, ())]
        return out

    def remove_vertices(self, to_delete: list[str]) -> None:
        dead = set(to_delete)
        if not dead:
            return
        for v in to_delete:
            self.vertices.pop(v, None)
            self.out_adj.pop(v, None)
            self.in_adj.pop(v, None)
        self.edges = {
            (s, d): lv for (s, d), lv in self.edges.items() if s not in dead and d not in dead
        }
        for v, adj in self.out_adj.items():
            for d in list(adj):
                if d in dead:
                    del adj[d]
        for v, adj in self.in_adj.items():
            for s in list(adj):
                if s in dead:
                    del adj[s]
        # rebuild weighted-degree sums from the surviving edges
        self.wdeg = dict.fromkeys(self.vertices, 0.0)
        for (s, d), (_, w) in self.edges.items():
            self.wdeg[s] += w
            self.wdeg[d] += w

    def degree(self, v: str) -> int:
        return len(self.out_adj.get(v, ())) + len(self.in_adj.get(v, ()))

    def weighted_degree(self, v: str) -> float:
        return self.wdeg.get(v, 0.0)

    def n_vertices(self) -> int:
        return len(self.vertices)

    def edge_rows(self):
        """(subj, pred, obj, weight) per surviving edge, insertion order."""
        return [(s, lbl, d, w) for (s, d), (lbl, w) in self.edges.items()]
