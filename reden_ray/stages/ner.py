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
# lowercase tokens stop at an apostrophe (keeping it) so elisions like
# "d'Arc" split into particle "d'" + capitalized "Arc"
_TOKEN = re.compile(r"[A-ZÀ-Þ][\wÀ-ÿ'-]*|[a-zà-ÿ][a-zà-ÿA-ZÀ-ÿ-]*'?|[^\s\w]")
_CAP = re.compile(r"^[A-ZÀ-Þ]")


def detect_mentions_untagged(text: str) -> list[tuple[str, int, int]]:
    """(surface, start, end) spans of capitalized runs.

    A run = >=1 capitalized token, possibly joined by particles; runs
    starting a sentence count only if >=2 tokens long (drops ordinary
    sentence-initial words).
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
        j = i + 1
        last_cap_end = end
        n_caps = 1
        while j < n:
            nxt = tokens[j][0]
            if _CAP.match(nxt):
                last_cap_end = tokens[j][2]
                n_caps += 1
                j += 1
            elif nxt.lower() in _PARTICLES and j + 1 < n and _CAP.match(tokens[j + 1][0]):
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
