"""Date scalar functions (M8/M9).

Parity with DateSpecificProcessingNEL (/root/reference/src/fr/lip6/reden/
nelinker/DateSpecificProcessingNEL.java:15-63) and the dictionary-build
date scrubber (QueryAuthorBNF.java:201-221).
"""

from __future__ import annotations

import re

_FULL_DATE = re.compile(r"\d{4}-\d{2}-\d{2}$")
_YEAR = re.compile(r"\d{4}$")
_SCRUB_OK = re.compile(r"(\d{4}|\d{2}\.\.|\d{1}\.\.)$")
_XSD_INT = "^^http://www.w3.org/2001/XMLSchema#integer"


def process_date(date_s: str) -> int | None:
    """'yyyy-MM-dd' or 'yyyy' -> int year; else None (strings containing
    '.' are rejected outright)."""
    if "." in date_s:
        return None
    if _FULL_DATE.match(date_s) or _YEAR.match(date_s):
        return int(date_s[:4])
    return None


def compare_date(b1: int, d1: int, b2: int, d2: int) -> float:
    """Life-span overlap in years: max(0, min(d1,d2) - max(b1,b2))."""
    return max(0.0, float(min(d1, d2) - max(b1, b2)))


def scrub_kb_date(raw: str | None) -> str:
    """Strip the xsd:integer suffix; keep 'yyyy', 'dd..', 'd..' verbatim,
    reduce a full date to its year, else '-'."""
    if raw is None:
        return "-"
    s = raw.replace(_XSD_INT, "")
    if _SCRUB_OK.match(s):
        return s
    if _FULL_DATE.match(s):
        return s[:4]
    return "-"
