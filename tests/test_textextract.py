from reden_ray.core.textextract import (
    detect_mentions,
    extract_text,
    split_context_html,
    split_contexts,
)

HTML = (
    b"<html><body>"
    b'<p>Un texte sur <span class="ne" data-type="PER">Victor Hugo</span> &amp; '
    b'<span class="ne" data-type="LOC">Paris</span>.</p>'
    b"<p>Sans mention.</p>"
    b'<p class="x">Encore <span class="ne" data-type="PER">Hugo</span>!</p>'
    b"</body></html>"
)


def test_split_contexts():
    ctxs = split_contexts(HTML)
    assert len(ctxs) == 3
    assert ctxs[0] == "Un texte sur Victor Hugo & Paris."
    assert ctxs[1] == "Sans mention."
    assert ctxs[2] == "Encore Hugo!"


def test_extract_text_is_newline_join():
    assert extract_text(HTML) == "Un texte sur Victor Hugo & Paris.\nSans mention.\nEncore Hugo!"


def test_detect_mentions_offsets_align_with_text():
    ctx_htmls = split_context_html(HTML)
    ctxs = split_contexts(HTML)
    ms = detect_mentions(ctx_htmls[0])
    assert [(m.surface, m.ne_type) for m in ms] == [("Victor Hugo", "PER"), ("Paris", "LOC")]
    for m in ms:
        assert ctxs[0][m.start : m.end] == m.surface
    assert detect_mentions(ctx_htmls[1]) == []
    m3 = detect_mentions(ctx_htmls[2])
    assert [(m.surface, m.start) for m in m3] == [("Hugo", len("Encore "))]


def test_entity_unescaping_before_mention():
    inner = 'a &amp; b <span class="ne" data-type="LOC">Nîmes</span>'
    ms = detect_mentions(inner)
    assert ms[0].start == len("a & b ")


def test_unicode_heavy_contexts():
    html = (
        "<html><body><p>中文文本 🎉 <span class=\"ne\" data-type=\"LOC\">Paris</span>"
        " et ænd Ωmega</p></body></html>"
    ).encode("utf-8")
    ctxs = split_contexts(html)
    assert ctxs == ["中文文本 🎉 Paris et ænd Ωmega"]
    ms = detect_mentions(split_context_html(html)[0])
    assert ms[0].surface == "Paris"
    # offsets are CODEPOINT-based: alignment must survive emoji/CJK
    assert ctxs[0][ms[0].start : ms[0].end] == "Paris"
