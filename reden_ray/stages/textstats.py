"""Text analysis stages for large-scale training-data pipelines.

Operates on the driver-provided ``documents`` table
(doc_id, text, lang, source, n_chars) — all vectorized or
compiled-regex-per-actor work inside ``map_batches``:

- ``TokenStats``     — token counting (whitespace + BPE-ish regex)
- ``QualityScore``   — length / punctuation / stopword-ratio heuristics
- ``LangId``         — n-gram + stopword language heuristic (fr/en/de/other)
- ``fingerprint``    — 64-bit rolling/document hash for exact dedup keys

Stateful pieces (compiled regexes, stopword tables, n-gram profiles)
live in ``__init__`` — once per actor, never per batch.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# GPT-2-style pretokenizer shape: contractions, letter runs, digit runs,
# punctuation runs (pure-Python ``re`` version, no external tokenizer).
_BPE_ISH = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-zÀ-ÿ]+| ?[0-9]+| ?[^\sA-Za-zÀ-ÿ0-9]+|\s+(?!\S)|\s+"

_STOP = {
    "fr": {"le", "la", "les", "de", "des", "du", "un", "une", "et", "est", "en",
           "que", "qui", "dans", "pour", "sur", "pas", "par", "au", "ce"},
    "en": {"the", "of", "and", "to", "a", "in", "is", "it", "that", "for",
           "on", "was", "with", "as", "at", "by", "be", "this"},
    "de": {"der", "die", "das", "und", "ist", "in", "den", "von", "zu", "mit",
           "sich", "auf", "für", "nicht", "ein", "eine"},
}


class TokenStats:
    """Adds ``n_tokens_ws`` (whitespace) and ``n_tokens_bpe`` (regex
    pretokenizer) counts."""

    def __init__(self) -> None:
        self.bpe = re.compile(_BPE_ISH)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ws = pa.array([len(t.split()) for t in texts], pa.int64())
        bpe = pa.array([len(self.bpe.findall(t)) for t in texts], pa.int64())
        return batch.append_column("n_tokens_ws", ws).append_column("n_tokens_bpe", bpe)


class QualityScore:
    """Heuristic quality signals + a blended [0, 1] score."""

    def __init__(self) -> None:
        self.word = re.compile(r"[A-Za-zÀ-ÿ]+")
        self.punct = re.compile(r"[^\w\s]")
        self.allstop = set().union(*_STOP.values())

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n = len(texts)
        mean_word_len = np.zeros(n)
        punct_ratio = np.zeros(n)
        stop_ratio = np.zeros(n)
        for i, t in enumerate(texts):
            words = self.word.findall(t.lower())
            if words:
                mean_word_len[i] = sum(map(len, words)) / len(words)
                stop_ratio[i] = sum(w in self.allstop for w in words) / len(words)
            punct_ratio[i] = len(self.punct.findall(t)) / max(1, len(t))
        length_ok = np.clip(np.array([len(t) for t in texts]) / 200.0, 0, 1)
        word_ok = np.clip(1 - np.abs(mean_word_len - 5.0) / 5.0, 0, 1)
        punct_ok = np.clip(1 - punct_ratio * 4.0, 0, 1)
        stop_ok = np.clip(stop_ratio * 3.0, 0, 1)
        score = 0.25 * (length_ok + word_ok + punct_ok + stop_ok)
        out = batch.append_column("mean_word_len", pa.array(mean_word_len))
        out = out.append_column("punct_ratio", pa.array(punct_ratio))
        out = out.append_column("stop_ratio", pa.array(stop_ratio))
        return out.append_column("quality", pa.array(score))


class LangId:
    """Stopword-vote language heuristic; adds ``lang_pred`` + ``lang_conf``."""

    def __init__(self) -> None:
        self.word = re.compile(r"[a-zà-ÿ]+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        preds, confs = [], []
        for t in texts:
            words = self.word.findall(t.lower())[:400]
            votes = {lang: 0 for lang in _STOP}
            for w in words:
                for lang, stops in _STOP.items():
                    if w in stops:
                        votes[lang] += 1
            best = max(votes, key=votes.get)
            total = sum(votes.values())
            if total == 0 or votes[best] == 0:
                preds.append("other")
                confs.append(0.0)
            else:
                preds.append(best)
                confs.append(votes[best] / total)
        return batch.append_column("lang_pred", pa.array(preds, pa.string())).append_column(
            "lang_conf", pa.array(confs, pa.float64())
        )


_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def fnv1a_64(data: bytes) -> int:
    """Deterministic 64-bit FNV-1a (stable across runs/processes)."""
    h = _FNV_OFFSET
    for b in data:
        h = np.uint64((int(h) ^ b) * int(_FNV_PRIME) & 0xFFFFFFFFFFFFFFFF)
    return int(h)


def fingerprint_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Adds ``fp64`` — a stable 64-bit content hash of ``column`` (the
    exact-dedup / document-fingerprint key).  Uses Arrow's utf8 bytes."""
    import hashlib

    fps = pa.array(
        [
            int.from_bytes(
                hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest(), "big", signed=False
            ) >> 1  # keep in int64 range
            for t in batch.column(column).to_pylist()
        ],
        pa.int64(),
    )
    return batch.append_column("fp64", fps)
