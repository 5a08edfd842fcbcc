"""Hot-context skew guard: mega-contexts stay bounded, output stays 1:1."""

from reden_ray.config import LinkerConfig
from reden_ray.core.linker import MentionRow, link_context

SAME = "http://kb.test/sameAs"
REL = "http://kb.test/p/rel"


class FakeAdj:
    def __init__(self, rows):
        self.by_subj = {}
        for s, p, o in rows:
            self.by_subj.setdefault(s, []).append((p, o))

    def get(self, uri):
        return self.by_subj.get(uri, [])

    def has(self, uri):
        return uri in self.by_subj


def hot_world(n_neighbors=500):
    rows = [("http://kb.test/ent/hot", SAME, "http://alt.test/hot")]
    rows += [
        ("http://alt.test/hot", REL, f"http://obj.test/hot/{i}") for i in range(n_neighbors)
    ]
    rows += [
        ("http://kb.test/ent/b", SAME, "http://alt.test/b"),
        ("http://alt.test/b", REL, "http://obj.test/hot/0"),
        ("http://kb.test/ent/c", SAME, "http://alt.test/c"),
        ("http://alt.test/c", REL, "http://obj.test/hot/0"),
    ]
    return FakeAdj(rows)


def mega_context(n_mentions):
    mentions = [MentionRow(0, "Beta", "PER"), MentionRow(1, "Gamma", "PER")]
    mentions += [MentionRow(2 + i, "Hot", "PER") for i in range(n_mentions)]
    cand = {
        "Hot": [["http://kb.test/ent/hot"], ["http://kb.test/ent/b"]],
        "Beta": [["http://kb.test/ent/b"]],
        "Gamma": [["http://kb.test/ent/c"]],
    }
    return mentions, cand


def test_truncation_bounds_work_and_marks_route():
    adj = hot_world()
    mentions, cand = mega_context(500)
    cfg = LinkerConfig(max_context_mentions=50)
    res = link_context(mentions, cand, adj, cfg)
    assert res.route == "OkTruncated"
    assert len(res.links) == len(mentions)  # 1:1 output preserved
    dropped = [l for l in res.links if l.mention_id >= 52]
    assert all(l.method == "nil" for l in dropped)
    kept_hot = [l for l in res.links if l.surface == "Hot" and l.method != "nil"]
    assert kept_hot  # surviving hot mentions still linked


def test_no_cap_matches_capped_choices_for_kept_mentions():
    adj = hot_world(60)
    mentions, cand = mega_context(10)
    uncapped = link_context(mentions, cand, adj, LinkerConfig())
    capped = link_context(mentions, cand, adj, LinkerConfig(max_context_mentions=12))
    u = {l.mention_id: (tuple(l.chosen_uris), l.method) for l in uncapped.links}
    c = {l.mention_id: (tuple(l.chosen_uris), l.method) for l in capped.links}
    assert u == c  # cap above the context size is a no-op


def test_default_is_uncapped():
    adj = hot_world(50)
    mentions, cand = mega_context(100)
    res = link_context(mentions, cand, adj, LinkerConfig())
    assert res.route == "Ok"
    assert len(res.links) == len(mentions)
