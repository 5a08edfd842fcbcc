"""Property-based tests (hypothesis) for the pure core."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from reden_ray.core.aliases import make_aliases
from reden_ray.core.normalize import decompose, normalize_mention, uri_file_key
from reden_ray.core.textextract import detect_mentions, extract_text, strip_tags

text_st = st.text(
    alphabet=string.ascii_letters + string.digits + " '-éàçÉ\t\n", max_size=80
)


@given(text_st)
def test_normalize_idempotent_and_clean(s):
    once = normalize_mention(s)
    assert normalize_mention(once) == once
    assert once == once.lower()
    assert not any(c in once for c in " \t\n'-")


@given(text_st)
def test_uri_file_key_has_no_separators(s):
    k = uri_file_key(s)
    assert ":" not in k and " " not in k


@given(st.text(alphabet=string.ascii_letters + string.digits + ":/%.", max_size=60))
def test_decompose_non_http_is_identity(s):
    if not s.startswith("http:"):
        assert decompose(s) == s


@given(
    st.text(alphabet=string.ascii_letters, min_size=1, max_size=12),
    st.text(alphabet=string.ascii_letters + "-", min_size=1, max_size=12),
    st.sampled_from(["male", "female"]),
)
@settings(max_examples=50)
def test_alias_invariants(first, last, gender):
    aliases = make_aliases(first, last, gender)
    assert aliases == sorted(aliases)  # canonical order
    assert len(aliases) == len(set(aliases))  # no duplicates
    assert last in aliases  # family name always present
    title = "Mme" if gender == "female" else "M"
    assert f"{title} {last}" in aliases
    assert 3 <= len(aliases) <= 20


@given(st.lists(st.tuples(st.sampled_from(["PER", "LOC"]), text_st), max_size=6))
@settings(max_examples=50)
def test_mention_roundtrip_through_html(mentions):
    # build a context embedding each surface; offsets must align
    inner = ""
    for ne_type, surface in mentions:
        safe = (
            surface.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        )
        inner += f'x <span class="ne" data-type="{ne_type}">{safe}</span> y'
    text = strip_tags(inner)
    found = detect_mentions(inner)
    assert len(found) == len(mentions)
    for m, (ne_type, surface) in zip(found, mentions):
        assert m.ne_type == ne_type
        assert m.surface == surface
        assert text[m.start : m.end] == m.surface


def test_malformed_html_does_not_crash():
    assert detect_mentions('<span class="ne" data-type="PER">unclosed') == []
    assert extract_text(b"<html><body></body></html>") == ""
    assert extract_text(b"no paragraphs at all") == ""
    assert strip_tags("<b>bold</b> &amp; <i>x") == "bold & x"


def test_minhash_estimates_jaccard():
    from reden_ray.stages.dedup import MinHasher, ngram_jaccard

    m = MinHasher(n_perm=128)
    a = "le chat dort sur le tapis rouge dans le salon de la maison"
    b = "le chat dort sur le tapis bleu dans le salon de la maison"
    est = float((m.signature(a) == m.signature(b)).mean())
    true = ngram_jaccard([a], [b])[0]
    assert abs(est - true) < 0.15


def test_dictionary_cap_applies_before_dedup():
    """O2: the 100-row Lucene cap counts raw rows, not unique groups."""
    import pyarrow as pa

    from reden_ray.state.dictionary import DictionaryIndex

    # 150 rows for one alias: 120 identical groups then 30 distinct ones
    groups = [["http://kb.test/ent/same"]] * 120 + [
        [f"http://kb.test/ent/{i}"] for i in range(30)
    ]
    t = pa.table(
        {
            "alias_norm": pa.array(["x"] * 150),
            "kind": pa.array(["PER"] * 150),
            "uri_group": pa.array(groups, pa.list_(pa.string())),
        }
    )
    idx = DictionaryIndex(t, max_rows=100)
    got = idx.groups("x", "PER")
    # first 100 raw rows = 120-dup block truncated: only the 'same' group
    assert got == [["http://kb.test/ent/same"]]


# --- linker invariants under random contexts ------------------------------

from hypothesis import strategies as _st


def _mk_world(n_ents, n_objs, edges_seed):
    import random

    rng = random.Random(edges_seed)
    rows = []
    for k in range(n_ents):
        base = f"http://kb.test/ent/{k}"
        alt = f"http://alt.test/ent/{k}"
        rows.append((base, "http://kb.test/sameAs", alt))
        for i in range(rng.randint(0, 4)):
            rows.append((alt, f"http://kb.test/p/r{i%2}", f"http://obj.test/{rng.randrange(n_objs)}"))
    return rows


@given(
    st.integers(min_value=2, max_value=6),   # entities
    st.integers(min_value=1, max_value=5),   # mentions
    st.integers(min_value=0, max_value=10_000),  # seed
)
@settings(max_examples=40, deadline=None)
def test_link_context_invariants(n_ents, n_mentions, seed):
    import random

    from reden_ray.config import LinkerConfig
    from reden_ray.core.linker import MentionRow, link_context

    class Adj:
        def __init__(self, rows):
            self.m = {}
            for s, p, o in rows:
                self.m.setdefault(s, []).append((p, o))

        def get(self, u):
            return self.m.get(u, [])

        def has(self, u):
            return u in self.m

    rng = random.Random(seed)
    adj = Adj(_mk_world(n_ents, 5, seed))
    mentions = []
    cand = {}
    for mid in range(n_mentions):
        surface = f"M{rng.randrange(3)}"
        mentions.append(MentionRow(mid, surface, "PER"))
        if surface not in cand and rng.random() < 0.85:
            n_groups = rng.randint(1, 3)
            cand[surface] = [
                [f"http://kb.test/ent/{rng.randrange(n_ents)}"] for _ in range(n_groups)
            ]
    cfg = LinkerConfig()
    res = link_context(mentions, cand, adj, cfg)

    # 1:1 links, ids preserved
    assert [l.mention_id for l in res.links] == [m.mention_id for m in mentions]
    # every chosen URI comes from the mention's candidate groups (ALL mode
    # can only emit group members; winner fallback is also a group member)
    for l in res.links:
        if l.chosen_uris:
            allowed = {u for g in cand.get(l.surface, []) for u in g}
            # inverted-index quirk: the winner may belong to ANOTHER
            # mention sharing the URI — union all context candidates
            allowed |= {u for gs in cand.values() for g in gs for u in g}
            assert set(l.chosen_uris) <= allowed
    # triples only have base-KB subjects and never sameAs predicates
    for s, p, o, w in res.triples:
        assert "http://kb.test/" in s
        assert p != "http://kb.test/sameAs"
        assert w == 1.0  # no rels weights configured
    # route consistency
    if res.route == "NoAmbiguity":
        assert res.triples == []


@given(st.text(alphabet=string.ascii_letters + "àéüß 你好'-_.*", max_size=40))
@settings(max_examples=200)
def test_reencode_legacy_ascii_properties(seg):
    """The legacy-ASCII retry key: decoding the re-encoded last segment
    recovers the original (Java URLEncoder/URLDecoder round trip), and
    pure-ASCII-safe segments are fixed points."""
    from urllib.parse import unquote_plus

    from reden_ray.core.normalize import reencode_legacy_ascii

    uri = "http://kb.test/ent/" + seg
    enc = reencode_legacy_ascii(uri)
    head, _, last = enc.rpartition("/")
    assert head == "http://kb.test/ent"
    if seg:
        assert unquote_plus(last) == seg
        # idempotent for segments already in the encoder's safe set
        if all(c.isascii() and (c.isalnum() or c in "*-._") for c in seg):
            assert enc == uri


@given(
    st.lists(
        st.tuples(st.sampled_from(["PER", "LOC"]), text_st.filter(lambda s: s.strip())),
        min_size=1,
        max_size=5,
    ),
    st.data(),
)
@settings(max_examples=100, deadline=None)
def test_annotate_preserves_text_invariant(mentions, data):
    """annotate_html only touches bytes inside tags: the tag-stripped
    text is byte-identical for ANY subset of annotated mentions."""
    from reden_ray.core.textextract import extract_text
    from reden_ray.stages.annotate import annotate_html

    inner = " ".join(
        f'<span class="ne" data-type="{t}">{s}</span>' for t, s in mentions
    )
    html = f"<html><body><p>{inner}</p></body></html>".encode()
    refs = {}
    for mid in range(len(mentions)):
        if data.draw(st.booleans()):
            refs[(0, mid)] = data.draw(
                st.text(alphabet=string.ascii_letters + ':/."&', min_size=1, max_size=20)
            )
    out = annotate_html(html, refs)
    assert extract_text(out) == extract_text(html)


@given(st.lists(st.text(alphabet=string.printable, max_size=30), min_size=0, max_size=8))
@settings(max_examples=100)
def test_minhash_exactness_properties(texts):
    """Identical texts always get identical signatures; signatures are
    deterministic across hasher instances (distributed-safe)."""
    from reden_ray.stages.dedup import MinHasher

    m1, m2 = MinHasher(), MinHasher()
    for t in texts:
        s1, s2 = m1.signature(t), m2.signature(t)
        assert (s1 == s2).all()
        assert s1.shape == (64,)
