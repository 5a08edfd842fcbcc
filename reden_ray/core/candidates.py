"""Candidate-map construction from dictionary lookups (pure core).

Parity with DicoProcessingNEL.retrieveMentionsURIsFromDicoWithIndex
(/root/reference/src/fr/lip6/reden/nelinker/DicoProcessingNEL.java:144-183)
and the per-NE-type merge in MainNELApp.java:233-256:

- a mention surface is normalized (core.normalize.normalize_mention) and
  matched EXACTLY against normalized dictionary aliases;
- the dictionary returns at most ``max_candidate_rows`` (100, the Lucene
  ``search(query, 100)`` cap) matching rows; rows whose tab-joined URI
  group is string-identical collapse (the reference stores hits in a
  ``Set<String>``); identical groups are deduped again list-wise per
  mention, preserving first-seen order;
- NE types are processed in configured order and merged with
  ``Map.putAll`` semantics: for a surface annotated under several types,
  the LAST type's candidate list wins (MainNELApp.java:255-256 TODO).
"""

from __future__ import annotations

from typing import Protocol

from ..config import LinkerConfig
from .linker import CandidateMap, MentionRow
from .normalize import normalize_mention


class DictionaryLookup(Protocol):
    """``groups(norm, kind)`` -> candidate URI groups for a normalized
    alias in the NE-type ``kind``'s dictionary, in dictionary-row order,
    already capped + string-deduped."""

    def groups(self, norm: str, kind: str = "") -> list[list[str]]: ...


def candidate_groups_for_surface(
    surface: str, dictionary: DictionaryLookup, kind: str = ""
) -> list[list[str]]:
    """Unique URI groups for one mention surface, first-seen order."""
    out: list[list[str]] = []
    for group in dictionary.groups(normalize_mention(surface), kind):
        if group not in out:
            out.append(group)
    return out


def build_candidate_map(
    mentions: list[MentionRow], dictionary: DictionaryLookup, cfg: LinkerConfig
) -> CandidateMap:
    """surface -> URI groups with last-NE-type-wins merge."""
    merged: CandidateMap = {}
    for ne_type in cfg.ne_types:
        per_type: CandidateMap = {}
        for m in mentions:
            if m.ne_type != ne_type or m.surface in per_type:
                continue
            groups = candidate_groups_for_surface(m.surface, dictionary, ne_type)
            if groups:
                per_type[m.surface] = groups
        merged.update(per_type)
    return merged
