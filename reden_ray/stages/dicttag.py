"""Dictionary-alias auto-tagger: pre-tag RAW text by exact alias scan.

Reference parity: the "semi-automatic annotation" workflow
(/root/reference/src/fr/lip6/reden/extra/SemiAutomaticTEIAnnotation.java:
1-142) pre-annotates an untagged corpus from a trusted source before the
NEL run.  Re-expressed for web text as a longest-match-first sweep of
each context's plain text against the full alias dictionary: every
maximal token subsequence that exactly equals a dictionary ``alias_raw``
becomes a tagged mention (MENTION_SCHEMA), typed with the alias's
``kind``.  This is the highest-precision untagged path — precision comes
from the dictionary itself rather than capitalization heuristics
(stages/ner.py), and every emitted span is guaranteed a candidate hit.

Engine shape: an actor-pool ``map_batches`` class.  ``__init__`` builds
the token-trie ONCE per actor from the ``ray.put`` broadcast of the
dictionary (first-token -> alias token-tuples, longest first);
``__call__`` scans each batch.  Tokenization is shared with the alias
side so "M. Bonaparte" / "Jeanne d'Arc" style aliases match their text
occurrences exactly.

Scale notes (100 TB corpus, 10^6+ alias dictionaries): the trie costs
O(total alias tokens) per node — same residency class as the candidate
DictionaryIndex the pipeline already broadcasts, so no new memory
regime.  The scan is O(text tokens x aliases-sharing-first-token),
first-token fan-out is tiny for name dictionaries.  For KB-scale
dictionaries that outgrow a node, pre-tag with the shuffle-join path
instead (emit every capitalized n-gram <= max alias length, join on
norm — stages/joins); this stage is the broadcast fast path.
"""

from __future__ import annotations

import re

import pyarrow as pa
import ray

from ..core.normalize import normalize_mention
from .extract import MENTION_SCHEMA

# identical token shapes on the alias side and the text side: capitalized
# word / lowercase word (keeping a trailing elision apostrophe: "d'") /
# single punctuation mark — the ner.py conventions, so "M. Bonaparte"
# tokenizes ["M", ".", "Bonaparte"] and "d'Arc" tokenizes ["d'", "Arc"]
_TOKEN = re.compile(r"[A-ZÀ-Þ][\wÀ-ÿ'-]*|[a-zà-ÿ][a-zà-ÿA-ZÀ-ÿ-]*'?|[^\s\w]")


def _tokenize(text: str) -> list[tuple[str, int, int]]:
    return [(m.group(0), m.start(), m.end()) for m in _TOKEN.finditer(text)]


def build_alias_trie(dictionary: pa.Table) -> dict[str, list[tuple[tuple[str, ...], str]]]:
    """first token -> [(alias token tuple, ne_type)], longest first.

    An alias surface shared by several kinds collapses to ne_type='ANY'
    (candidate lookup then unions the per-kind dictionaries, the same
    route the heuristic-NER path uses)."""
    kinds_by_tokens: dict[tuple[str, ...], set[str]] = {}
    for alias, kind in zip(
        dictionary.column("alias_raw").to_pylist(), dictionary.column("kind").to_pylist()
    ):
        toks = tuple(t for t, _, _ in _tokenize(alias))
        if toks:
            kinds_by_tokens.setdefault(toks, set()).add(kind)
    trie: dict[str, list[tuple[tuple[str, ...], str]]] = {}
    for toks, kinds in kinds_by_tokens.items():
        ne_type = next(iter(kinds)) if len(kinds) == 1 else "ANY"
        trie.setdefault(toks[0], []).append((toks, ne_type))
    for lst in trie.values():
        lst.sort(key=lambda e: (-len(e[0]), e[0]))
    return trie


def tag_text(
    text: str, trie: dict[str, list[tuple[tuple[str, ...], str]]]
) -> list[tuple[str, int, int, str]]:
    """(surface, start, end, ne_type) for every longest non-overlapping
    alias match, left to right (the reference tagger's sweep order)."""
    tokens = _tokenize(text)
    out = []
    i, n = 0, len(tokens)
    while i < n:
        candidates = trie.get(tokens[i][0])
        if candidates:
            for toks, ne_type in candidates:  # longest first
                j = i + len(toks)
                if j <= n and all(tokens[i + k][0] == toks[k] for k in range(1, len(toks))):
                    start, end = tokens[i][1], tokens[j - 1][2]
                    out.append((text[start:end], start, end, ne_type))
                    i = j
                    break
            else:
                i += 1
        else:
            i += 1
    return out


# worker-global trie cache for the stateless-task variant (see
# stages.candidates._WORKER_INDEX_CACHE for the rationale: task pools
# are fully elastic, worker processes persist, at most one dictionary
# per worker)
_TRIE_CACHE: dict = {}


def _cached_trie(dict_ref):
    key = getattr(dict_ref, "hex", lambda: id(dict_ref))()
    trie = _TRIE_CACHE.get(key)
    if trie is None:
        table = ray.get(dict_ref) if not isinstance(dict_ref, pa.Table) else dict_ref
        trie = build_alias_trie(table)
        _TRIE_CACHE.clear()
        _TRIE_CACHE[key] = trie
    return trie


def make_dict_tagger_fn(dict_ref):
    """Stateless-task variant of DictionaryTagger (worker-global cache)."""

    def tag(batch: pa.Table) -> pa.Table:
        return _tag_batch(batch, _cached_trie(dict_ref))

    return tag


class DictionaryTagger:
    """map_batches(DictionaryTagger, fn_constructor_args=(dict_ref,),
    concurrency=N) over context rows — trie built once per actor."""

    def __init__(self, dict_ref):
        table = ray.get(dict_ref) if not isinstance(dict_ref, pa.Table) else dict_ref
        self.trie = build_alias_trie(table)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _tag_batch(batch, self.trie)


def _tag_batch(batch: pa.Table, trie) -> pa.Table:
        cols: dict[str, list] = {k: [] for k in MENTION_SCHEMA.names}
        for url, cid, text in zip(
            batch.column("url").to_pylist(),
            batch.column("context_id").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            for mid, (surface, start, end, ne_type) in enumerate(tag_text(text, trie)):
                cols["url"].append(url)
                cols["context_id"].append(cid)
                cols["mention_id"].append(mid)
                cols["surface"].append(surface)
                cols["norm"].append(normalize_mention(surface))
                cols["span_start"].append(start)
                cols["span_end"].append(end)
                cols["ne_type"].append(ne_type)
        return pa.Table.from_arrays(
            [pa.array(cols[f.name], f.type) for f in MENTION_SCHEMA], schema=MENTION_SCHEMA
        )
