"""Mixture sampling (stages/mixture.py): budget semantics, per-source
dict budgets, and partition invariance — SQL parity is covered by the
oracle harness (mixture_sample_600)."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from reden_ray.stages.mixture import mixture_sample


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    return ray_session


def _docs(n=90, n_src=3, seed=2):
    rng = np.random.RandomState(seed)
    texts = [" ".join(["w"] * int(k)) for k in rng.randint(1, 30, size=n)]
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
            "source": pa.array([f"s{i % n_src}" for i in range(n)]),
        }
    )


def _naive(t, budgets):
    texts = t.column("text").to_pylist()
    srcs = t.column("source").to_pylist()
    by_src = {}
    for i, (s, txt) in enumerate(zip(srcs, texts)):
        key = int.from_bytes(hashlib.md5(f"{s}:{i}".encode()).digest()[:8], "little")
        by_src.setdefault(s, []).append((key, i, len(txt.split())))
    out = {}
    for s, rows in by_src.items():
        budget = budgets[s] if isinstance(budgets, dict) else budgets
        run = 0
        for key, i, n in sorted(rows):
            if run < budget:
                out[i] = (s, n, run)
            run += n
    return out


def test_mixture_matches_naive_and_is_partition_invariant():
    t = _docs()
    want = _naive(t, 100)
    for parts in (2, 7):
        rows = mixture_sample(
            rd.from_arrow(t).repartition(parts), budgets=100, n_buckets=16
        ).take_all()
        got = {r["doc_id"]: (r["source"], r["n_tokens"], r["tokens_before"]) for r in rows}
        assert got == want, parts


def test_mixture_per_source_dict_budgets():
    t = _docs()
    budgets = {"s0": 40, "s1": 0, "s2": 10_000}
    want = _naive(t, budgets)
    rows = mixture_sample(
        rd.from_arrow(t).repartition(3), budgets=budgets, n_buckets=8
    ).take_all()
    got = {r["doc_id"]: (r["source"], r["n_tokens"], r["tokens_before"]) for r in rows}
    assert got == want
    assert not any(s == "s1" for s, _, _ in got.values())
    # unlimited-ish budget keeps every s2 doc
    assert sum(1 for s, _, _ in got.values() if s == "s2") == 30
