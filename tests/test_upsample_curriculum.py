"""Upsampling (stages/upsample.py) and curriculum ordering
(stages/curriculum.py): naive goldens + partition invariance.  SQL
parity is covered by the oracle harness (upsample_sources /
curriculum_order_epoch1)."""

import hashlib
import re

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from reden_ray.stages.curriculum import curriculum_order
from reden_ray.stages.scoring import hash_weights
from reden_ray.stages.upsample import upsample_sources


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    return ray_session


def _md5le(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


def test_upsample_matches_naive_rule():
    n = 200
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "source": pa.array([f"s{i % 5}" for i in range(n)]),
        }
    )
    weights = {"s0": 0.0, "s1": 0.5, "s2": 1.0, "s3": 1.75, "s4": 2.5}
    want = []
    for i in range(n):
        w = weights[f"s{i % 5}"]
        reps = int(np.floor(w)) + (
            1 if _md5le(f"u:{i}") % 1024 < round((w - np.floor(w)) * 1024) else 0
        )
        want += [(i, f"s{i % 5}", k) for k in range(reps)]
    for parts in (1, 4):
        rows = upsample_sources(
            rd.from_arrow(t).repartition(parts), weights
        ).take_all()
        got = sorted((r["doc_id"], r["source"], r["rep_idx"]) for r in rows)
        assert got == sorted(want), parts
    # w=0 really drops, w=2.5 really triples some docs
    srcs = [s for _, s, _ in want]
    assert "s0" not in srcs
    assert max(k for _, s, k in want if s == "s4") == 2


def test_upsample_default_weight():
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "source": pa.array(["known", "unknown"]),
        }
    )
    rows = upsample_sources(rd.from_arrow(t), {"known": 2.0}, default_weight=1.0).take_all()
    got = sorted((r["doc_id"], r["rep_idx"]) for r in rows)
    assert got == [(1, 0), (1, 1), (2, 0)]


def _score(text: str, dim: int) -> int:
    w = hash_weights(dim)
    toks = [x for x in re.split(r"[^a-z0-9]+", text.lower()) if x]
    return int(sum(int(w[_md5le(tok) % dim]) for tok in toks))


def test_curriculum_order_matches_naive():
    rng = np.random.RandomState(3)
    words = ["aa", "bb", "cc", "dd", "ee", "ff"]
    texts = [" ".join(rng.choice(words, size=rng.randint(0, 12))) for _ in range(70)]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(70, dtype=np.int64)),
            "text": pa.array(texts),
        }
    )
    dim, clip = 64, 3
    tiers = {i: int(np.clip(_score(x, dim), -clip, clip)) for i, x in enumerate(texts)}
    order = sorted(range(70), key=lambda i: (-tiers[i], _md5le(f"c5:{i}"), i))
    want = {i: (tiers[i], r + 1) for r, i in enumerate(order)}
    for parts in (1, 4):
        rows = curriculum_order(
            rd.from_arrow(t).repartition(parts),
            epoch=5,
            clip=clip,
            dim=dim,
            n_buckets=8,
        ).take_all()
        got = {r["doc_id"]: (r["tier"], r["train_rank"]) for r in rows}
        assert got == want, parts
        # tiers are served best-first
        by_rank = sorted(rows, key=lambda r: r["train_rank"])
        tier_seq = [r["tier"] for r in by_rank]
        assert tier_seq == sorted(tier_seq, reverse=True)
