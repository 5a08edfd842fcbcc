"""Per-context entity linking: fuse -> prune -> centrality -> choose.

This is the pure-Python core the distributed fusion stage
(``reden_ray.stages.graphstage``) calls once per (url, context_id)
group.  Behavioral parity with the reference (no code copied; semantics
verified line-by-line against /root/reference):

- routing             MainNELApp.checkConditionsToNEL (MainNELApp.java:418-442)
- sameAs expansion    GraphHandlerNEL.retrieveAndLoadSameAsRDFData (:114-197)
- graph fusion        GraphHandlerNEL.fuseRDFGraphsIntoJGTGraph (:211-343)
- pruning + scoring   CentralityHandler.simplifyGraphsAndCalculateCentrality (:64-229)
- unambiguous route   ResultsAndEvaluationNEL.produceResultsSimple (:138-190)

Determinism: the reference iterates Java ``HashMap``/``HashSet``s, whose
order is unspecified.  This engine imposes a CANONICAL order everywhere
that order is observable (SURVEY.md §7.5): mentions in first-appearance
document order, candidate groups in dictionary-row order, URIs in
group-position order.  Documented deviations from reference accidents:

- ``invertedIndex.get(decomposedUri)`` returning null for percent-encoded
  URIs would NPE in the reference (CentralityHandler.java:188-193); here a
  missing inverted-index entry falls back to choosing the winner URI itself.
- the legacy ASCII-re-encoding retry for old DBpedia URIs
  (GraphHandlerNEL.java:293-330) IS replicated: an alias whose adjacency
  lookup returns no statements is retried once with its last path
  segment form-encoded (Java URLEncoder semantics — space becomes '+',
  '*-._' kept).  The reference's ``uriAlias.replace(lastSegment, ...)``
  replaces every occurrence of the segment string; this engine rewrites
  only the final path segment (equivalent for real URIs, and immune to
  a segment that happens to recur earlier in the path).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Protocol

from ..config import LinkerConfig
from .graph import ContextGraph
from .normalize import decompose, reencode_legacy_ascii


class AdjacencyLookup(Protocol):
    """Neighborhood store interface (the ``.n3`` cache as a table).

    ``get(uri)`` -> list of (pred, obj) statements with subject ``uri``;
    ``has(uri)`` -> the "``.n3`` file exists" analogue: the URI has at
    least one statement in the store (GraphHandlerNEL.java:93-95,147-150).
    """

    def get(self, uri: str) -> list[tuple[str, str]]: ...
    def has(self, uri: str) -> bool: ...


@dataclass(frozen=True)
class MentionRow:
    mention_id: int
    surface: str
    ne_type: str


@dataclass(frozen=True)
class LinkRow:
    mention_id: int
    surface: str
    ne_type: str
    chosen_uris: list[str]
    score: float | None
    method: str  # 'centrality' | 'unambiguous' | 'nil'


@dataclass(frozen=True)
class ContextResult:
    route: str  # 'NoMentionsAnnotated' | 'NoAmbiguity' | 'Ok'
    links: list[LinkRow]
    triples: list[tuple[str, str, str, float]]  # (subj, pred, obj, weight)


CandidateMap = dict[str, list[list[str]]]  # surface -> ordered unique URI groups


def route_context(candidate_map: CandidateMap, surfaces: list[str]) -> str:
    """'NoMentionsAnnotated' | 'NoAmbiguity' | 'Ok' (MainNELApp.java:418-442)."""
    if not surfaces:
        return "NoMentionsAnnotated"
    for s in surfaces:
        groups = candidate_map.get(s)
        if groups is not None and len(groups) > 1:
            return "Ok"
    return "NoAmbiguity"


def _ordered_surfaces(mentions: list[MentionRow], candidate_map: CandidateMap) -> list[str]:
    """Surfaces with candidates, in first-appearance order (the canonical
    stand-in for the reference's HashMap iteration order)."""
    seen: dict[str, None] = {}
    for m in mentions:
        if m.surface in candidate_map and m.surface not in seen:
            seen[m.surface] = None
    return list(seen)


def compute_equivalences(
    surfaces: list[str],
    candidate_map: CandidateMap,
    adjacency: AdjacencyLookup,
    cfg: LinkerConfig,
) -> dict[str, dict[str, None]]:
    """base URI -> insertion-ordered set of equivalent URIs.

    Replicates GraphHandlerNEL.retrieveAndLoadSameAsRDFData:114-197:
    case 1 — a group URI matching ``base_uri_filter`` contributes its
    sameAs-statement objects (filtered by ``crawl_same_as`` prefix unless
    "ALL", and only if the target has data); case 2 — a non-base group URI
    with data is itself an equivalent.  The context-global
    ``alreadyProcessedURI`` list means an equivalent URI is credited only
    to the FIRST group (in canonical order) that references it.
    """
    def has_with_retry(uri: str) -> bool:
        # data-presence gate with the legacy-ASCII retry: a URI whose
        # statements are stored under the form-encoded key (old DBpedia
        # dumps) still counts as "has data" — the fuse stage's retry
        # (GraphHandlerNEL.java:293-330) will find the statements
        if adjacency.has(uri):
            return True
        enc = reencode_legacy_ascii(uri)
        return enc != uri and adjacency.has(enc)

    already: set[str] = set()
    equivalences: dict[str, dict[str, None]] = {}
    for surface in surfaces:
        for group in candidate_map[surface]:
            same_as: dict[str, None] = {}
            base_uri = ""
            for uri in group:
                if cfg.base_uri_filter.strip() in uri:
                    base_uri = uri
                    for pred, obj in adjacency.get(uri):
                        if pred != cfg.same_as_property:
                            continue
                        if cfg.crawl_same_as != "ALL" and not obj.startswith(cfg.crawl_same_as):
                            continue
                        if has_with_retry(decompose(obj)) and obj not in already:
                            same_as[decompose(obj)] = None
                            already.add(obj)
                else:
                    if has_with_retry(decompose(uri)) and uri not in already:
                        same_as[decompose(uri)] = None
                        already.add(uri)
            equivalences.setdefault(base_uri, {}).update(same_as)
    return equivalences


def fuse_graph(
    surfaces: list[str],
    candidate_map: CandidateMap,
    equivalences: dict[str, dict[str, None]],
    adjacency: AdjacencyLookup,
    cfg: LinkerConfig,
    star_cache: dict | None = None,
) -> ContextGraph:
    """GraphHandlerNEL.fuseRDFGraphsIntoJGTGraph:211-343.

    Every base-KB candidate URI becomes a (decoded) hub vertex; for each
    of its equivalent URIs, every non-sameAs statement about the
    equivalent becomes an edge hub -> decoded(object) labeled with the
    predicate, weighted from ``rel_weights`` (default 1.0).  Simple
    graph: first edge per (src, dst) wins; self-loops skipped
    case-insensitively.
    """
    base = cfg.base_uri_filter.strip()
    graph = ContextGraph()
    base_uris: list[str] = []
    for surface in surfaces:
        for group in candidate_map[surface]:
            for uri in group:
                if base in uri:
                    base_uris.append(uri)

    weight_cache: dict[str, float] = {}
    same_as = cfg.same_as_property
    for uri in base_uris:
        # a base URI's "star" — its (v1, [(v2, pred, weight)]) fan-out —
        # depends only on (uri, its equivalent set); popular entities
        # recur across thousands of contexts, so an optional cross-
        # context cache (per batch/worker) skips the adjacency rescan.
        # First-edge-wins stays correct: the star preserves statement
        # order, and the graph dedups on insert exactly as before.
        equivs = equivalences.get(uri, {})
        ckey = (uri, tuple(equivs)) if star_cache is not None else None
        star = star_cache.get(ckey) if ckey is not None else None
        if star is None:
            v1 = decompose(uri)
            v1_low = v1.lower()
            uri_low = uri.lower()
            edges: list[tuple[str, str, float]] = []
            for alias in equivs:
                if uri_low == alias.lower():  # avoiding loops
                    continue
                stmts = adjacency.get(alias)
                if not stmts:
                    # legacy-ASCII retry (GraphHandlerNEL.java:293-299):
                    # old DBpedia URIs stored form-encoded miss the exact
                    # lookup; re-encode the last path segment and retry
                    retry = reencode_legacy_ascii(alias)
                    if retry != alias:
                        stmts = adjacency.get(retry)
                for pred, obj in stmts:
                    if pred == same_as:
                        continue
                    v2 = decompose(obj)
                    if v1_low == v2.lower():
                        continue
                    w = weight_cache.get(pred)
                    if w is None:
                        w = weight_cache[pred] = cfg.weight_for(pred)
                    edges.append((v2, pred, w))
            star = (v1, edges)
            if ckey is not None:
                star_cache[ckey] = star
        v1, edges = star
        graph.add_vertex(v1)
        for v2, pred, w in edges:
            graph.add_vertex(v2)
            graph.add_edge(v1, v2, pred, w)
    return graph


def build_inverted_index(surfaces: list[str], candidate_map: CandidateMap) -> dict[str, str]:
    """raw URI -> mention surface, LAST writer wins
    (DicoProcessingNEL.buildInvertedIndex:387-401)."""
    index: dict[str, str] = {}
    for surface in surfaces:
        for group in candidate_map[surface]:
            for uri in group:
                index[uri] = surface
    return index


def colored_nodes(surfaces: list[str], candidate_map: CandidateMap, cfg: LinkerConfig) -> set[str]:
    """Candidate ("colored") vertex id set: raw + decoded forms of every
    base-KB candidate URI (CentralityHandler.java:78-97)."""
    base = cfg.base_uri_filter.strip()
    colored: set[str] = set()
    for surface in surfaces:
        for group in candidate_map[surface]:
            for uri in group:
                if base in uri:
                    colored.add(uri)
                    colored.add(decompose(uri))
    return colored


def prune_graph(graph: ContextGraph, colored: set[str], inverted_index: dict[str, str]) -> None:
    """Delete every non-candidate vertex whose colored neighbors span
    fewer than 2 distinct mentions (CentralityHandler.java:100-122).
    Two-phase: flag on the original graph, then remove all."""
    to_delete: list[str] = []
    out_adj, in_adj = graph.out_adj, graph.in_adj
    for vertex in graph.vertices:
        if vertex in colored:
            continue
        mention_check: set[str | None] = set()
        # incident edges without materializing (src, dst) tuples: for an
        # out-edge the OTHER endpoint is dst; for an in-edge it's src
        for dst in out_adj.get(vertex, ()):
            if dst != vertex and dst in colored:
                mention_check.add(inverted_index.get(dst))
        for src in in_adj.get(vertex, ()):
            if src != vertex and src in colored:
                mention_check.add(inverted_index.get(src))
        if len(mention_check) < 2:
            to_delete.append(vertex)
    graph.remove_vertices(to_delete)


# re-exported for compatibility; the full measure registry (degree,
# Brandes betweenness, Freeman closeness, eigenvector — the reference's
# config dispatch, CentralityHandler.java:137-152) lives in
# core.centrality
from .centrality import degree_centrality  # noqa: E402


def _select_preferred(
    winner: str,
    candidate_map: CandidateMap,
    inverted_index: dict[str, str],
    cfg: LinkerConfig,
) -> str:
    """Preferred-URI expansion (CentralityHandler.java:186-215): find the
    winner's owning mention via the inverted index, then within each of
    that mention's groups containing the winner: 'ALL' -> append the whole
    group; else the last group URI containing the preference substring;
    else the winner itself."""
    owner = inverted_index.get(winner)
    if owner is None or owner not in candidate_map:
        return winner  # documented deviation: reference would NPE here
    selected = ""
    for group in candidate_map[owner]:
        if winner in group:
            found = False
            for uri in group:
                if cfg.preferred_uri == "ALL":
                    selected += uri + " "
                    found = True
                elif cfg.preferred_uri in uri:
                    selected = uri
                    found = True
            if not found:
                selected = winner
    return selected.strip()


def score_and_choose(
    surfaces: list[str],
    candidate_map: CandidateMap,
    colored: set[str],
    centrality: dict[str, float],
    inverted_index: dict[str, str],
    cfg: LinkerConfig,
) -> tuple[dict[str, str], dict[str, float]]:
    """Per mention: score decoded base-KB candidates by centrality, pick
    the argmax with the reference tie-break (stable ascending sort, take
    last => among ties the LAST in canonical candidate order wins;
    CentralityHandler.java:154-215 + Util.sortByValue:53-68)."""
    chosen: dict[str, str] = {}
    scores: dict[str, float] = {}
    for surface in surfaces:
        results: dict[str, float] = {}
        for group in candidate_map[surface]:
            for uri in group:
                dec = decompose(uri)
                if dec in colored:
                    results[dec] = centrality.get(dec, 0.0)
        if not results:
            continue
        ordered = sorted(results.items(), key=lambda kv: kv[1])  # stable asc
        winner, winner_score = ordered[-1]
        chosen[surface] = _select_preferred(winner, candidate_map, inverted_index, cfg)
        scores[surface] = winner_score
    return chosen, scores


def link_context(
    mentions: list[MentionRow],
    candidate_map: CandidateMap,
    adjacency: AdjacencyLookup,
    cfg: LinkerConfig,
    star_cache: dict | None = None,
) -> ContextResult:
    """Run the full per-context algorithm; emits one LinkRow per mention
    (method 'centrality' / 'unambiguous' / 'nil') and the pruned fusion
    graph's edges as (subj, pred, obj, weight) triples."""
    truncated = False
    if cfg.max_context_mentions is not None and len(mentions) > cfg.max_context_mentions:
        # skew guard: deterministic first-N truncation of mega-contexts;
        # dropped mentions get explicit nil rows so output stays 1:1
        kept = mentions[: cfg.max_context_mentions]
        dropped = mentions[cfg.max_context_mentions :]
        res = link_context(kept, candidate_map, adjacency, cfg, star_cache)
        links = list(res.links) + [
            LinkRow(m.mention_id, m.surface, m.ne_type, [], None, "nil") for m in dropped
        ]
        return ContextResult(
            res.route + "Truncated" if res.route == "Ok" else res.route,
            links,
            res.triples,
        )
    all_surfaces = [m.surface for m in mentions]
    route = route_context(candidate_map, all_surfaces)
    links: list[LinkRow] = []
    triples: list[tuple[str, str, str, float]] = []

    if route == "NoMentionsAnnotated":
        return ContextResult(route, links, triples)

    if route == "NoAmbiguity":
        # group 0's URIs, space-joined (ResultsAndEvaluationNEL.java:149-158)
        for m in mentions:
            groups = candidate_map.get(m.surface)
            if groups:
                links.append(
                    LinkRow(m.mention_id, m.surface, m.ne_type, list(groups[0]), None, "unambiguous")
                )
            else:
                links.append(LinkRow(m.mention_id, m.surface, m.ne_type, [], None, "nil"))
        return ContextResult(route, links, triples)

    surfaces = _ordered_surfaces(mentions, candidate_map)
    equivalences = compute_equivalences(surfaces, candidate_map, adjacency, cfg)
    graph = fuse_graph(surfaces, candidate_map, equivalences, adjacency, cfg, star_cache)
    inverted_index = build_inverted_index(surfaces, candidate_map)
    colored = colored_nodes(surfaces, candidate_map, cfg)
    prune_graph(graph, colored, inverted_index)
    from .centrality import get_measure

    centrality = get_measure(cfg.measure)(graph)
    chosen, scores = score_and_choose(
        surfaces, candidate_map, colored, centrality, inverted_index, cfg
    )

    for m in mentions:
        sel = chosen.get(m.surface)
        if sel:
            links.append(
                LinkRow(
                    m.mention_id,
                    m.surface,
                    m.ne_type,
                    sel.split(" "),
                    scores.get(m.surface),
                    "centrality",
                )
            )
        else:
            links.append(LinkRow(m.mention_id, m.surface, m.ne_type, [], None, "nil"))
    triples = graph.edge_rows()
    return ContextResult(route, links, triples)
