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
