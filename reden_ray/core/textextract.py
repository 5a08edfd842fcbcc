"""Deterministic HTML -> text extraction, context splitting, mention scan.

Re-expresses the reference's DOM pipeline for web pages instead of TEI:

- TEI file -> DOM parse            (MainNELApp.java:220-221)  -> ``extract_text``
- XPath ``//body//p`` context split (MainNELApp.java:222-227) -> ``split_contexts``
- ``.//persName`` etc. mention scan (MainNELApp.java:233-244) -> ``detect_mentions``
  (pre-tagged inline annotations: ``<span class="ne" data-type="T">surface</span>``
  is the web analogue of TEI ``<persName>``/``<placeName>``)

The extractor is vendored (regex scanner, stdlib-only) so the per-url
``extract_text(html) == text`` invariant required by BASELINE.json
``input_hint`` is byte-reproducible across environments.  Contract:

- contexts are the ``<p>...</p>`` elements of the document in order;
- a context's text is its inner HTML with all tags stripped and HTML
  entities unescaped — byte-for-byte, no whitespace normalization;
- ``extract_text`` is the "\\n"-join of the context texts.
"""

from __future__ import annotations

import html as _html
import re
from dataclasses import dataclass

_P_RE = re.compile(rb"<p(?:\s[^>]*)?>(.*?)</p>", re.S)
_TAG_RE = re.compile(r"<[^>]*>")
_NE_OPEN_RE = re.compile(
    r"<span\s+class=\"ne\"\s+data-type=\"([^\"]+)\"\s*>", re.S
)


@dataclass(frozen=True)
class Mention:
    surface: str
    ne_type: str
    start: int  # codepoint offset into the context text
    end: int


def split_context_html(html: bytes) -> list[str]:
    """Inner HTML (decoded utf-8) of each ``<p>`` element, in order."""
    return [m.group(1).decode("utf-8") for m in _P_RE.finditer(html)]


def strip_tags(inner_html: str) -> str:
    """Tags stripped, entities unescaped; whitespace preserved verbatim."""
    return _html.unescape(_TAG_RE.sub("", inner_html))


def split_contexts(html: bytes) -> list[str]:
    """Context texts of a page (the XPath node-set analogue)."""
    return [strip_tags(h) for h in split_context_html(html)]


def extract_text(html: bytes) -> str:
    """The page's text — the byte-identical per-url invariant column."""
    return "\n".join(split_contexts(html))


def detect_mentions(inner_html: str) -> list[Mention]:
    """Pre-tagged NE annotations of one context, in document order.

    Scans the inner HTML left to right; for each ``<span class="ne"
    data-type="T">`` element records (surface, T, start, end) where the
    offsets index the tag-stripped, entity-unescaped context text
    (so ``context_text[start:end] == surface``).
    """
    out: list[Mention] = []
    pos = 0  # cursor in inner_html
    text_len = 0  # codepoints of stripped text emitted so far
    while True:
        m = _NE_OPEN_RE.search(inner_html, pos)
        if m is None:
            break
        text_len += len(strip_tags(inner_html[pos : m.start()]))
        close = inner_html.find("</span>", m.end())
        if close < 0:  # malformed: ignore the rest
            break
        surface = strip_tags(inner_html[m.end() : close])
        out.append(
            Mention(surface=surface, ne_type=m.group(1), start=text_len, end=text_len + len(surface))
        )
        text_len += len(surface)
        pos = close + len("</span>")
    return out
