"""Centrality measure registry + hand-checked values."""

import pytest

from reden_ray.core.centrality import (
    brandes_betweenness,
    degree_centrality,
    eigenvector_centrality,
    freeman_closeness,
    get_measure,
    register_measure,
)
from reden_ray.core.graph import ContextGraph


def path_graph():
    """a -> b -> c -> d (directed path)."""
    g = ContextGraph()
    for v in "abcd":
        g.add_vertex(v)
    for s, d in [("a", "b"), ("b", "c"), ("c", "d")]:
        g.add_edge(s, d, "p", 1.0)
    return g


def star_graph():
    g = ContextGraph()
    g.add_vertex("hub")
    for i in range(4):
        g.add_vertex(f"leaf{i}")
        g.add_edge("hub", f"leaf{i}", "p", 1.0)
    return g


def test_degree():
    c = degree_centrality(star_graph())
    assert c["hub"] == 4 / 4
    assert c["leaf0"] == 1 / 4


def test_betweenness_path():
    # on a -> b -> c -> d: b and c each lie on shortest paths
    # (a,c),(a,d) resp. (a,d),(b,d) => betweenness 2 each, ends 0
    c = brandes_betweenness(path_graph())
    assert c["a"] == 0.0 and c["d"] == 0.0
    assert c["b"] == 2.0 and c["c"] == 2.0


def test_closeness_path():
    c = freeman_closeness(path_graph())
    # a reaches b,c,d at distances 1,2,3 -> 1/6 (jgrapht-sna: 1/sum)
    assert c["a"] == pytest.approx(1 / 6)
    assert c["b"] == 0.0  # cannot reach a -> infinite sum
    assert c["d"] == 0.0  # sink reaches nothing


def test_closeness_respects_weights():
    g = ContextGraph()
    for v in "abc":
        g.add_vertex(v)
    g.add_edge("a", "b", "p", 2.0)
    g.add_edge("a", "c", "p", 0.4)
    g.add_edge("b", "a", "p", 2.0)
    g.add_edge("b", "c", "p", 1.0)
    g.add_edge("c", "a", "p", 0.4)
    g.add_edge("c", "b", "p", 1.0)
    c = freeman_closeness(g)
    # a: d(c)=0.4 direct; d(b)=min(2.0, 0.4+1.0)=1.4 -> 1/1.8
    # (unweighted BFS would give 1/2 — the weights matter)
    assert c["a"] == pytest.approx(1 / 1.8)


def test_eigenvector_star():
    c = eigenvector_centrality(star_graph())
    assert c["hub"] > c["leaf0"] > 0
    leaves = [c[f"leaf{i}"] for i in range(4)]
    assert max(leaves) - min(leaves) < 1e-9


def test_registry_dispatch_and_errors():
    assert get_measure("DegreeCentrality") is degree_centrality
    with pytest.raises(ValueError):
        get_measure("NopeCentrality")
    register_measure("ConstCentrality", lambda g: {v: 1.0 for v in g.vertices})
    assert get_measure("ConstCentrality")(star_graph())["hub"] == 1.0


def test_linker_accepts_other_measures(small_fixture_dir):
    """The per-context algorithm runs under every registered measure."""
    import re

    import pyarrow.parquet as pq

    from reden_ray.config import LinkerConfig
    from reden_ray.core.candidates import build_candidate_map
    from reden_ray.core.linker import MentionRow, link_context
    from reden_ray.core.textextract import detect_mentions, split_context_html
    from reden_ray.pipelines.kg import fixture_config
    from reden_ray.state.adjacency import AdjacencyIndex
    from reden_ray.state.dictionary import DictionaryIndex

    fd = small_fixture_dir
    di = DictionaryIndex(pq.read_table(f"{fd}/dictionary.parquet"))
    ai = AdjacencyIndex(pq.read_table(f"{fd}/adjacency.parquet"))
    page = pq.read_table(f"{fd}/pages.parquet").to_pylist()[3]
    paras = split_context_html(page["html"])
    base = fixture_config(fd)
    import dataclasses

    results = {}
    for measure in (
        "DegreeCentrality",
        "BrandesBetweennessCentrality",
        "FreemanClosenessCentrality",
        "EigenvectorCentrality",
    ):
        cfg = dataclasses.replace(base, measure=measure)
        n_linked = 0
        for para in paras:
            mentions = [
                MentionRow(i, m.surface, m.ne_type)
                for i, m in enumerate(detect_mentions(para))
            ]
            if not mentions:
                continue
            cand = build_candidate_map(mentions, di, cfg)
            res = link_context(mentions, cand, ai, cfg)
            n_linked += sum(1 for l in res.links if l.chosen_uris)
        results[measure] = n_linked
    assert all(v > 0 for v in results.values()), results
