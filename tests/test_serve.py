"""Serve-ready composite (pipelines/serve.py): naive golden over a
corpus with duplicates + per-source skew, partition invariance, and
the permutation contract.  SQL parity is covered by the oracle harness
(serve_ready_corpus)."""

import hashlib
import re

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from reden_ray.pipelines.serve import serve_ready_corpus
from reden_ray.stages.scoring import hash_weights


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    return ray_session


def _md5le(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


def _score(text: str, dim: int) -> int:
    w = hash_weights(dim)
    toks = [x for x in re.split(r"[^a-z0-9]+", text.lower()) if x]
    return int(sum(int(w[_md5le(t) % dim]) for t in toks))


def _corpus(n=80, seed=11):
    rng = np.random.RandomState(seed)
    words = ["lorem", "ipsum", "dolor", "sit", "amet", "vox", "quux", "zz"]
    texts = [" ".join(rng.choice(words, size=rng.randint(1, 10))) for _ in range(n)]
    # inject exact duplicates across sources
    for i in range(0, n, 7):
        texts[i] = "duplicated boilerplate body"
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
            "source": pa.array([f"s{i % 3}" for i in range(n)]),
        }
    )


def _naive(t, top_frac, epoch, dim):
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    srcs = t.column("source").to_pylist()
    scores = {i: _score(x, dim) for i, x in zip(ids, texts)}
    # stage 2: keep best per identical text (tie -> min id)
    best = {}
    for i, x in zip(ids, texts):
        cur = best.get(x)
        if cur is None or (-scores[i], i) < (-scores[cur], cur):
            best[x] = i
    surv = sorted(best.values())
    # stage 3: per-source threshold over survivors
    kept = []
    for s in set(srcs):
        members = [i for i in surv if srcs[ids.index(i)] == s]
        if not members:
            continue
        k = int(np.ceil(top_frac * len(members)))
        thr = sorted((scores[i] for i in members), reverse=True)[k - 1]
        kept += [(i, s, scores[i], thr) for i in members if scores[i] >= thr]
    # stage 4: epoch rank
    kept.sort(key=lambda r: (_md5le(f"e{epoch}:{r[0]}"), r[0]))
    return {
        i: (s, sc, thr, rank + 1) for rank, (i, s, sc, thr) in enumerate(kept)
    }


def test_serve_ready_matches_naive_and_partition_invariant():
    t = _corpus()
    want = _naive(t, 0.25, 1, 64)
    for parts in (1, 5):
        rows = serve_ready_corpus(
            rd.from_arrow(t).repartition(parts),
            top_frac=0.25,
            epoch=1,
            dim=64,
            n_buckets=16,
        ).take_all()
        got = {
            r["doc_id"]: (r["source"], r["score"], r["threshold"], r["train_rank"])
            for r in rows
        }
        assert got == want, parts
        assert sorted(r["train_rank"] for r in rows) == list(range(1, len(rows) + 1))
    # composite really exercised both cuts: dups dropped, scores gated
    assert 0 < len(want) < t.num_rows
