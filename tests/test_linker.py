"""Hand-built per-context scenarios pinning the reference quirks."""

from reden_ray.config import LinkerConfig
from reden_ray.core.linker import (
    MentionRow,
    build_inverted_index,
    colored_nodes,
    compute_equivalences,
    fuse_graph,
    link_context,
    prune_graph,
    route_context,
)

CFG = LinkerConfig(
    base_uri_filter="http://kb.test/",
    same_as_property="http://kb.test/sameAs",
)


class FakeAdj:
    def __init__(self, rows):
        self.by_subj = {}
        for s, p, o in rows:
            self.by_subj.setdefault(s, []).append((p, o))

    def get(self, uri):
        return self.by_subj.get(uri, [])

    def has(self, uri):
        return uri in self.by_subj


B1 = "http://kb.test/ent/1"
B2 = "http://kb.test/ent/2"
A1 = "http://alt.test/ent/1"
A2 = "http://alt.test/ent/2"
SAME = "http://kb.test/sameAs"
REL = "http://kb.test/p/rel"


def adj_two_entities():
    return FakeAdj(
        [
            (B1, SAME, A1),
            (B1, "http://kb.test/p/label", "decoy literal"),  # must NOT become an edge
            (A1, REL, "http://obj.test/shared"),
            (A1, "http://kb.test/p/x", "http://obj.test/x1"),
            (B2, SAME, A2),
            (A2, REL, "http://obj.test/shared"),
            (A2, "http://kb.test/p/y", "http://obj.test/y1"),
        ]
    )


def test_routing():
    assert route_context({}, []) == "NoMentionsAnnotated"
    assert route_context({"Hugo": [[B1]]}, ["Hugo"]) == "NoAmbiguity"
    assert route_context({"Hugo": [[B1], [B2]]}, ["Hugo", "Paris"]) == "Ok"


def test_equivalences_from_sameas_and_dictionary():
    adj = adj_two_entities()
    cand = {"Hugo": [[B1, A1]], "Paris": [[B2]]}
    eq = compute_equivalences(["Hugo", "Paris"], cand, adj, CFG)
    # A1 via dictionary (case 2) — sameAs target A1 already processed, so
    # whichever path hits first wins; both resolve to the same set here.
    assert list(eq[B1]) == [A1]
    assert list(eq[B2]) == [A2]


def test_equivalence_already_processed_credited_to_first_group_only():
    adj = adj_two_entities()
    # two groups (homonyms) both sameAs-ing A1: only the first gets it
    cand = {"Hugo": [[B1], [B2]]}
    adj2 = FakeAdj(
        [
            (B1, SAME, A1),
            (B2, SAME, A1),
            (A1, REL, "http://obj.test/shared"),
        ]
    )
    eq = compute_equivalences(["Hugo"], cand, adj2, CFG)
    assert list(eq[B1]) == [A1]
    assert list(eq[B2]) == []


def test_fusion_edges_only_from_equivalents_and_no_decoy():
    adj = adj_two_entities()
    cand = {"Hugo": [[B1, A1]], "Paris": [[B2]]}
    eq = compute_equivalences(["Hugo", "Paris"], cand, adj, CFG)
    g = fuse_graph(["Hugo", "Paris"], cand, eq, adj, CFG)
    edges = set(g.edges)
    assert (B1, "http://obj.test/shared") in edges
    assert (B1, "http://obj.test/x1") in edges
    assert (B2, "http://obj.test/shared") in edges
    # decoy literal statement about the base itself is not an edge
    assert not any(dst == "decoy literal" for _, dst in edges)
    # sameAs statements are never edges
    assert not any(g.edges[e][0] == SAME for e in g.edges)


def test_first_edge_wins_label_weight():
    adj = FakeAdj(
        [
            (B1, SAME, A1),
            (A1, "http://kb.test/p/first", "http://obj.test/o"),
            (A1, "http://kb.test/p/second", "http://obj.test/o"),
        ]
    )
    cand = {"Hugo": [[B1]], "X": [[B2]]}
    eq = compute_equivalences(["Hugo", "X"], cand, adj, CFG)
    g = fuse_graph(["Hugo", "X"], cand, eq, adj, CFG)
    assert g.edges[(B1, "http://obj.test/o")][0] == "http://kb.test/p/first"


def test_prune_removes_single_mention_neighbors():
    adj = adj_two_entities()
    cand = {"Hugo": [[B1, A1]], "Paris": [[B2]]}
    eq = compute_equivalences(["Hugo", "Paris"], cand, adj, CFG)
    g = fuse_graph(["Hugo", "Paris"], cand, eq, adj, CFG)
    inv = build_inverted_index(["Hugo", "Paris"], cand)
    colored = colored_nodes(["Hugo", "Paris"], cand, CFG)
    prune_graph(g, colored, inv)
    # 'shared' touches candidates of BOTH mentions -> kept;
    # x1 / y1 touch only one mention's candidate -> deleted
    assert "http://obj.test/shared" in g.vertices
    assert "http://obj.test/x1" not in g.vertices
    assert "http://obj.test/y1" not in g.vertices


def test_link_context_centrality_chooses_shared_neighborhood():
    # mention "Hugo" ambiguous between B1 (shares neighborhood with B2's
    # context) and B3 (disjoint); co-mention "Paris" -> B2.
    B3 = "http://kb.test/ent/3"
    A3 = "http://alt.test/ent/3"
    adj = FakeAdj(
        [
            (B1, SAME, A1),
            (A1, REL, "http://obj.test/shared"),
            (A1, REL, "http://obj.test/shared2"),
            (B2, SAME, A2),
            (A2, REL, "http://obj.test/shared"),
            (A2, REL, "http://obj.test/shared2"),
            (B3, SAME, A3),
            (A3, REL, "http://obj.test/elsewhere"),
        ]
    )
    mentions = [MentionRow(0, "Hugo", "PER"), MentionRow(1, "Paris", "LOC")]
    cand = {"Hugo": [[B3], [B1]], "Paris": [[B2]]}
    res = link_context(mentions, cand, adj, CFG)
    assert res.route == "Ok"
    by_id = {l.mention_id: l for l in res.links}
    assert by_id[0].chosen_uris == [B1]
    assert by_id[0].method == "centrality"
    assert by_id[1].chosen_uris == [B2]
    subjs = {t[0] for t in res.triples}
    assert subjs <= {B1, B2, B3}
    # pruned triples only keep multi-mention-supported neighbors
    objs = {t[2] for t in res.triples}
    assert "http://obj.test/elsewhere" not in objs


def test_tiebreak_last_candidate_wins():
    # two candidates with identical scores: the LAST in canonical
    # candidate order wins (stable ascending sort, take last).
    adj = FakeAdj(
        [
            (B1, SAME, A1),
            (A1, REL, "http://obj.test/s"),
            (B2, SAME, A2),
            (A2, REL, "http://obj.test/s"),
            ("http://kb.test/ent/9", SAME, "http://alt.test/ent/9"),
            ("http://alt.test/ent/9", REL, "http://obj.test/s"),
        ]
    )
    mentions = [MentionRow(0, "Hugo", "PER"), MentionRow(1, "Other", "PER")]
    cand = {"Hugo": [[B1], [B2]], "Other": [["http://kb.test/ent/9"]]}
    res = link_context(mentions, cand, adj, CFG)
    assert {l.mention_id: l.chosen_uris for l in res.links}[0] == [B2]


def test_no_ambiguity_route_takes_group_zero():
    adj = adj_two_entities()
    mentions = [MentionRow(0, "Hugo", "PER"), MentionRow(1, "Atlantide", "LOC")]
    cand = {"Hugo": [[B1, A1]]}
    res = link_context(mentions, cand, adj, CFG)
    assert res.route == "NoAmbiguity"
    by_id = {l.mention_id: l for l in res.links}
    assert by_id[0].chosen_uris == [B1, A1]
    assert by_id[0].method == "unambiguous"
    assert by_id[1].method == "nil"
    assert res.triples == []


def test_preferred_uri_substring_selection():
    cfg = LinkerConfig(
        base_uri_filter="http://kb.test/",
        same_as_property=SAME,
        preferred_uri="http://alt.test/",
    )
    B4, A4 = "http://kb.test/ent/4", "http://alt.test/ent/4"
    adj = FakeAdj(
        [
            (B1, SAME, A1),
            (A1, REL, "http://obj.test/s1"),
            (A1, REL, "http://obj.test/s2"),
            (B2, SAME, A2),
            (A2, REL, "http://obj.test/s1"),
            (B4, SAME, A4),
            (A4, REL, "http://obj.test/s1"),
            (A4, REL, "http://obj.test/s2"),
        ]
    )
    mentions = [
        MentionRow(0, "Hugo", "PER"),
        MentionRow(1, "Paris", "LOC"),
        MentionRow(2, "Rouen", "LOC"),
    ]
    # B1 (degree 2 after pruning) beats B2 (degree 1); preferred-URI
    # substring then swaps the winner for its alt.test group member.
    cand = {"Hugo": [[B1, A1], [B2]], "Paris": [[B2]], "Rouen": [[B4]]}
    res = link_context(mentions, cand, adj, cfg)
    assert {l.mention_id: l.chosen_uris for l in res.links}[0] == [A1]


def test_legacy_ascii_reencode_retry():
    """GraphHandlerNEL.java:293-330: an alias whose exact lookup is
    empty retries with its last path segment form-encoded (old DBpedia
    URIs stored ASCII-encoded)."""
    from reden_ray.core.normalize import reencode_legacy_ascii

    alias = "http://alt.test/ent/Émile Zola"
    encoded = reencode_legacy_ascii(alias)
    assert encoded == "http://alt.test/ent/%C3%89mile+Zola"

    base = "http://kb.test/ent/9"
    adj = FakeAdj(
        [
            (base, SAME, alias),
            # statements stored ONLY under the encoded form
            (encoded, REL, "http://obj.test/novel"),
        ]
    )
    equivs = compute_equivalences(["zola"], {"zola": [[base]]}, adj, CFG)
    g = fuse_graph(["zola"], {"zola": [[base]]}, equivs, adj, CFG)
    assert any("novel" in dst for (_, dst) in g.edges), g.edges


def test_reencode_noops_on_plain_ascii():
    from reden_ray.core.normalize import reencode_legacy_ascii

    assert reencode_legacy_ascii("http://kb.test/ent/Plain_Name") == (
        "http://kb.test/ent/Plain_Name"
    )
