"""String normalizers — the join keys of the whole pipeline.

Semantics match the reference (no code copied; behavior verified against
/root/reference sources):

- ``normalize_mention``: DicoProcessingNEL.replaceNonAlphabeticCharacters
  (DicoProcessingNEL.java:410-415) — delete whitespace, apostrophes and
  hyphens, then lowercase.  THE equality key between mention surfaces and
  dictionary aliases (J2 in SURVEY.md §2.4).
- ``uri_file_key``: Util.replaceNonAlphabeticCharacters (Util.java:75-80)
  — same deletions, plus ``/`` -> ``-`` and ``:`` removed, lowercased;
  the reference uses it for ``.n3`` cache filenames.
- ``decompose``: Util.decompose (Util.java:88-99) — percent-decode URIs
  that start with ``http:``; anything else passes through unchanged.
  This defines VERTEX IDENTITY in the fusion graph, so it must be exact.
"""

from __future__ import annotations

import re
from functools import lru_cache
from urllib.parse import unquote

_MENTION_STRIP = re.compile(r"\s|'|-")


def normalize_mention(s: str) -> str:
    """Delete ``\\s``, ``'``, ``-`` and lowercase (Java ``\\s|'|-`` regex)."""
    return _MENTION_STRIP.sub("", s).lower()


def uri_file_key(s: str) -> str:
    """Mention normalization plus ``/``->``-`` and ``:`` removal."""
    return _MENTION_STRIP.sub("", s).replace("/", "-").replace(":", "").lower()


@lru_cache(maxsize=1 << 20)
def decompose(s: str) -> str:
    """Percent-decode ``http:``-prefixed URIs (UTF-8); else identity.

    Java's ``URLDecoder.decode`` also turns ``+`` into a space; ``unquote``
    does not, so handle it explicitly to keep vertex identity aligned.

    Memoized: the fusion stage decodes the same KB URIs millions of
    times across contexts (measured ~18% of linker time unmemoized).
    """
    if s.startswith("http:"):
        return unquote(s.replace("+", " "), encoding="utf-8")
    return s


@lru_cache(maxsize=1 << 18)
def reencode_legacy_ascii(uri: str) -> str:
    """Form-encode a URI's last path segment — the legacy-ASCII retry
    key (GraphHandlerNEL.java:294-296 ``URLEncoder.encode(part[last],
    "UTF-8")``).  Java's URLEncoder implements
    application/x-www-form-urlencoded: space to '+'; '*', '-', '.', '_'
    kept; everything else percent-encoded.  Python's quoter treats '~'
    as RFC-3986 unreserved and never encodes it, but Java's URLEncoder
    does (%7E) — post-replace so retry keys match Java semantics."""
    from urllib.parse import quote_plus

    head, sep, last = uri.rpartition("/")
    if not sep or not last:
        return uri
    return head + "/" + quote_plus(last, safe="*-._").replace("~", "%7E")


def normalize_mention_batch(values: list[str]) -> list[str]:
    """Vectorized-enough helper for Arrow string columns (see stages)."""
    sub = _MENTION_STRIP.sub
    return [sub("", v).lower() for v in values]
