"""Heuristic NER for UNTAGGED web text (the no-annotations path).

The reference consumes pre-annotated TEI (``persName``/``placeName``
tags); web corpora are mostly untagged, so the engine also ships a
dictionary-free mention detector: capitalized-token sequences (with
French particles de/du/des/d'/le/la/les/van/von/da allowed mid-name),
sentence-initial tokens included only when the sequence extends beyond
them.  Precision comes later from the dictionary join — a detected
span with no alias match costs one hash lookup and becomes a NIL row.

A stateless ``map_batches`` stage emitting the same MENTION_SCHEMA as
the tagged path (``ne_type`` = "ANY": candidate lookup must then run
with an untyped dictionary or per-type union).
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..core.normalize import normalize_mention
from .extract import MENTION_SCHEMA

_PARTICLES = {"de", "du", "des", "d'", "l'", "le", "la", "les", "van", "von", "da"}
# elisions that ABUT the following capital and belong to the tagged
# surface in French conventions ("d'Arc", "l'Empereur")
_ELISIONS = {"d'", "l'"}
# abbreviations whose trailing period joins the run ("M. Hugo",
# "E. Éluard"); any SINGLE capital letter (an initial) also qualifies
_HONORIFICS = {"M", "Mme", "Mlle", "Dr", "Pr", "St", "Ste"}
# lowercase tokens stop at an apostrophe (keeping it) so elisions like
# "d'Arc" split into particle "d'" + capitalized "Arc"
_TOKEN = re.compile(r"[A-ZÀ-Þ][\wÀ-ÿ'-]*|[a-zà-ÿ][a-zà-ÿA-ZÀ-ÿ-]*'?|[^\s\w]")
_CAP = re.compile(r"^[A-ZÀ-Þ]")


def _joins_period(prev_tok: str) -> bool:
    """Does ``prev_tok + '.'`` read as an initial/honorific (so a
    following capital continues the name) rather than a sentence end?"""
    return prev_tok in _HONORIFICS or (len(prev_tok) == 1 and _CAP.match(prev_tok))


def detect_mentions_untagged(text: str) -> list[tuple[str, int, int]]:
    """(surface, start, end) spans of capitalized runs.

    A run = >=1 capitalized token, joined across mid-name particles
    (de/du/van/...), abbreviation periods ("M. Hugo", "J. Zola" — only
    after an honorific or single-letter initial, so real sentence ends
    never join), and leading elisions ("d'Arc" keeps the particle, as
    French tagging conventions do).  Runs starting a sentence count
    only if >=2 tokens long (drops ordinary sentence-initial words;
    measured: lifting that rule doubles the span count for zero
    surface-recall gain on the fixture corpus).
    """
    out = []
    tokens = [(m.group(0), m.start(), m.end()) for m in _TOKEN.finditer(text)]
    i = 0
    n = len(tokens)
    while i < n:
        tok, start, end = tokens[i]
        if not _CAP.match(tok):
            i += 1
            continue
        sentence_initial = i == 0 or tokens[i - 1][0] in {".", "!", "?"}
        # leading elision abutting the capital: "d'" + "Arc" -> "d'Arc"
        if (
            i > 0
            and tokens[i - 1][0].lower() in _ELISIONS
            and tokens[i - 1][2] == start
        ):
            start = tokens[i - 1][1]
            sentence_initial = False  # an elided name is never a plain
            # sentence-initial word
        j = i + 1
        last_cap_end = end
        last_cap_tok = tok
        n_caps = 1
        while j < n:
            nxt = tokens[j][0]
            if _CAP.match(nxt):
                last_cap_end = tokens[j][2]
                last_cap_tok = nxt
                n_caps += 1
                j += 1
            elif nxt.lower() in _PARTICLES and j + 1 < n and _CAP.match(tokens[j + 1][0]):
                j += 1
            elif (
                nxt == "."
                and _joins_period(last_cap_tok)
                and j + 1 < n
                and (
                    _CAP.match(tokens[j + 1][0])
                    # "Mme. d'Arc": a particle right after the period
                    # still continues the name if a capital follows it
                    or (
                        tokens[j + 1][0].lower() in _PARTICLES
                        and j + 2 < n
                        and _CAP.match(tokens[j + 2][0])
                    )
                )
            ):
                last_cap_end = tokens[j][2]  # the period joins the surface
                j += 1
            else:
                break
        if not sentence_initial or n_caps >= 2:
            out.append((text[start:last_cap_end], start, last_cap_end))
        i = j
    return out


def contexts_to_untagged_mentions(batch: pa.Table) -> pa.Table:
    """context rows -> heuristic mention rows (ne_type='ANY')."""
    cols: dict[str, list] = {k: [] for k in MENTION_SCHEMA.names}
    for url, cid, text in zip(
        batch.column("url").to_pylist(),
        batch.column("context_id").to_pylist(),
        batch.column("text").to_pylist(),
    ):
        for mid, (surface, start, end) in enumerate(detect_mentions_untagged(text)):
            cols["url"].append(url)
            cols["context_id"].append(cid)
            cols["mention_id"].append(mid)
            cols["surface"].append(surface)
            cols["norm"].append(normalize_mention(surface))
            cols["span_start"].append(start)
            cols["span_end"].append(end)
            cols["ne_type"].append("ANY")
    return pa.Table.from_arrays(
        [pa.array(cols[f.name], f.type) for f in MENTION_SCHEMA], schema=MENTION_SCHEMA
    )
