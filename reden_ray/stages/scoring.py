"""Hashed-bag-of-words linear quality scoring — the fasttext-shaped
classifier pass every web-corpus curation stack runs (CCNet's LM
filter, GPT-3's WebText-similarity logistic regression), expressed as
the broadcast-model plumbing it needs at 100 TB: weights ship ONCE via
``ray.put``, scoring is one embarrassingly parallel actor-pool
``map_batches`` pass, nothing shuffles.

The model here is a deterministic integer stand-in (md5-derived
weights), which makes the whole path SQL-replayable — zero float knife
edges — while keeping the plumbing identical to a real model: swap
``hash_weights`` for trained float weights and the stage is a fasttext
scorer.

Scoring rule (DuckDB twin in ``quality_linear_score``):

- tokens: corpus-standard lowercased ``[^a-z0-9]+`` split, with
  multiplicity;
- feature bucket ``j = LE64(md5(token)[0:8]) % dim``
  (``md5_number_upper(token) % dim``);
- weight ``w[j] = LE64(md5('w:' || j)[0:8]) % 21 - 10`` (integers in
  [-10, 10]);
- ``score = sum(w[j(token)])`` (int64), ``keep = 1 if score > 0 else 0``
  (integer, keeping the whole output in the all-integer SQL domain).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

_TOKEN_RE = re.compile(r"[^a-z0-9]+")


def hash_weights(dim: int = 1024, mod: int = 21, offset: int = 10) -> np.ndarray:
    """Deterministic integer weight vector w[j] in [-offset, mod-1-offset]."""
    md5 = hashlib.md5
    return np.fromiter(
        (
            int.from_bytes(md5(f"w:{j}".encode()).digest()[:8], "little") % mod
            - offset
            for j in range(dim)
        ),
        dtype=np.int64,
        count=dim,
    )


class HashedLinearScorer:
    """Actor-pool scorer: weights fetched once per actor in ``__init__``
    (a real model would load its checkpoint here), token->bucket hashes
    memoized per actor across batches (vocab-bounded)."""

    def __init__(
        self,
        weights_ref,
        dim: int = 1024,
        id_column: str = "doc_id",
        text_column: str = "text",
    ) -> None:
        self.w = ray.get(weights_ref)
        self.dim = dim
        self.id_column = id_column
        self.text_column = text_column
        self._memo: dict[str, int] = {}

    def _bucket(self, tok: str) -> int:
        j = self._memo.get(tok)
        if j is None:
            j = (
                int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")
                % self.dim
            )
            self._memo[tok] = j
        return j

    def __call__(self, t: pa.Table) -> pa.Table:
        scores = np.zeros(t.num_rows, dtype=np.int64)
        for i, x in enumerate(t.column(self.text_column).to_pylist()):
            toks = [w for w in _TOKEN_RE.split((x or "").lower()) if w]
            if toks:
                idx = np.fromiter(
                    (self._bucket(w) for w in toks), dtype=np.int64, count=len(toks)
                )
                scores[i] = int(self.w[idx].sum())
        return pa.table(
            {
                self.id_column: t.column(self.id_column),
                "score": pa.array(scores),
                "keep": pa.array((scores > 0).astype(np.int64)),
            }
        )


def quality_linear_score(
    docs: rd.Dataset,
    dim: int = 1024,
    id_column: str = "doc_id",
    text_column: str = "text",
) -> rd.Dataset:
    """Score every document with the broadcast hashed linear model."""
    wref = ray.put(hash_weights(dim))
    return docs.map_batches(
        HashedLinearScorer,
        fn_constructor_kwargs={
            "weights_ref": wref,
            "dim": dim,
            "id_column": id_column,
            "text_column": text_column,
        },
        batch_format="pyarrow",
        batch_size=None,
        concurrency=(1, 4),
    )
