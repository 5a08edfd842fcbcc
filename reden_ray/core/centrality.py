"""Centrality measures for per-context fusion graphs (A6).

The reference dispatches on a config string to jgrapht-sna implementations
(CentralityHandler.java:137-152): DegreeCentrality,
BrandesBetweennessCentrality, FreemanClosenessCentrality,
EigenvectorCentrality.  Context graphs are small (10^2-10^3 vertices), so
plain-Python implementations suffice; the registry lets configs and
user extensions select by name (the §2.10 hook, Ray-native form).

Definitions (standard; within one context only the RANKING between a
mention's candidates matters, and all share the graph):
- degree:       sum of incident edge weights / (n - 1)  [bytecode-verified]
- betweenness:  Brandes' algorithm, directed, unweighted (matches the
                jar: BFS, no getEdgeWeight use)
- closeness:    1 / Σ weighted directed distances; unreachable -> 0
                [bytecode-verified]
- eigenvector:  power iteration x' = (A_sym + I) x — the jar's exact
                update rule (bytecode: next.putAll(prev) then accumulate
                Graphs.neighborListOf, i.e. symmetrized neighbors plus
                the self term).  NOTE the jar seeds from `new Random()`
                — NON-deterministic in the reference; this engine's
                deterministic uniform start is the documented canonical
                choice (jar tolerance: 1e-4)
"""

from __future__ import annotations

from collections import deque
from typing import Callable

from .graph import ContextGraph

Measure = Callable[[ContextGraph], dict[str, float]]


def degree_centrality(graph: ContextGraph) -> dict[str, float]:
    """Sum of incident edge WEIGHTS / (n-1) — exactly jgrapht-sna's
    DegreeCentrality (verified from jgrapht-sna-1.2.jar bytecode: it
    accumulates getEdgeWeight over edgesOf(v), not the edge count), so
    rels.txt weights influence the choice like in the reference."""
    n = graph.n_vertices()
    if n <= 1:
        return {v: 0.0 for v in graph.vertices}
    denom = float(n - 1)
    return {v: graph.weighted_degree(v) / denom for v in graph.vertices}


def brandes_betweenness(graph: ContextGraph) -> dict[str, float]:
    """Brandes (2001), directed, unweighted."""
    bc = dict.fromkeys(graph.vertices, 0.0)
    out_adj = graph.out_adj
    for s in graph.vertices:
        stack: list[str] = []
        pred: dict[str, list[str]] = {v: [] for v in graph.vertices}
        sigma = dict.fromkeys(graph.vertices, 0.0)
        sigma[s] = 1.0
        dist = dict.fromkeys(graph.vertices, -1)
        dist[s] = 0
        queue = deque([s])
        while queue:
            v = queue.popleft()
            stack.append(v)
            for w in out_adj.get(v, ()):
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    queue.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    pred[w].append(v)
        delta = dict.fromkeys(graph.vertices, 0.0)
        while stack:
            w = stack.pop()
            for v in pred[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc


def freeman_closeness(graph: ContextGraph) -> dict[str, float]:
    """closeness(v) = 1 / Σ_u d(v, u) over WEIGHTED directed shortest
    paths; any unreachable u makes the sum infinite -> 0.0 (bytecode of
    jgrapht-sna FreemanClosenessCentrality: Floyd-Warshall distances,
    early-out on isInfinite, dconst_1/sum).  Java's 1.0/0.0 == +inf is
    mirrored for the degenerate zero-sum (single-vertex) case."""
    import heapq

    out_adj = graph.out_adj
    edges = graph.edges
    n = graph.n_vertices()
    out: dict[str, float] = {}
    for s in graph.vertices:
        dist: dict[str, float] = {s: 0.0}
        heap = [(0.0, s)]
        while heap:
            d, v = heapq.heappop(heap)
            if d > dist.get(v, float("inf")):
                continue
            for w in out_adj.get(v, ()):
                nd = d + edges[(v, w)][1]
                if nd < dist.get(w, float("inf")):
                    dist[w] = nd
                    heapq.heappush(heap, (nd, w))
        if len(dist) < n:
            out[s] = 0.0  # some target unreachable -> sum = inf -> 1/inf
        else:
            total = sum(dist.values())
            out[s] = (1.0 / total) if total > 0 else float("inf")
    return out


def eigenvector_centrality(graph: ContextGraph) -> dict[str, float]:
    verts = list(graph.vertices)
    n = len(verts)
    if n == 0:
        return {}
    idx = {v: i for i, v in enumerate(verts)}
    x = [1.0 / n] * n
    neighbors: list[list[int]] = [[] for _ in range(n)]
    for (a, b) in graph.edges:
        neighbors[idx[a]].append(idx[b])
        neighbors[idx[b]].append(idx[a])  # symmetrized
    for _ in range(100):
        # power-iterate on A + I: the identity shift keeps the dominant
        # eigenvector but breaks period-2 oscillation on bipartite
        # graphs (a star graph otherwise never converges)
        nxt = list(x)
        for i in range(n):
            for j in neighbors[i]:
                nxt[j] += x[i]
        norm = sum(v * v for v in nxt) ** 0.5
        if norm == 0:
            return {v: 0.0 for v in verts}
        nxt = [v / norm for v in nxt]
        if max(abs(a - b) for a, b in zip(nxt, x)) < 1e-10:
            x = nxt
            break
        x = nxt
    # quantize to 1e-8 (two decades above the convergence bound): the
    # raw floats differ in the last ulp across summation orders (scatter
    # loop vs matmul vs per-partition order), and symmetric graphs
    # produce MANY mathematically-tied vertices — measured 1229 ulp-level
    # sign flips across the 60-doc fixture's 271 contexts.  Quantizing
    # makes ties exact so the canonical tie-break (score_and_choose)
    # decides them identically on every backend; without it the choice
    # depends on float noise, not semantics.
    return {v: round(s, 8) for v, s in zip(verts, x)}


CENTRALITY_MEASURES: dict[str, Measure] = {
    "DegreeCentrality": degree_centrality,
    "BrandesBetweennessCentrality": brandes_betweenness,
    "FreemanClosenessCentrality": freeman_closeness,
    "EigenvectorCentrality": eigenvector_centrality,
}


def register_measure(name: str, fn: Measure) -> None:
    """User-extension hook (the reference's config-string dispatch,
    CentralityHandler.java:139-152, as a registry)."""
    CENTRALITY_MEASURES[name] = fn


def get_measure(name: str) -> Measure:
    try:
        return CENTRALITY_MEASURES[name]
    except KeyError:
        raise ValueError(
            f"unknown centrality measure {name!r}; known: {sorted(CENTRALITY_MEASURES)}"
        ) from None
