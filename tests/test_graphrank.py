"""Distributed PageRank vs an independent numpy power-iteration
reference (same conventions: (1-d)/N base, uniform dangling
redistribution, multi-edge weights, self-loops).

Iteration counts are kept small: the golden comparison is EXACT at any
fixed iteration count (same recurrence both sides), and each distributed
iteration costs fixed shuffle setup on the 4-CPU test session."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from reden_ray.pipelines.graphrank import pagerank_ds


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    return ray_session


def _naive_pagerank(edges, d=0.85, iters=20):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for u, _ in edges:
        out[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for u, v in edges:
            contrib[idx[v]] += r[idx[u]] / out[idx[u]]
        d_mass = r[out == 0].sum()
        r = (1 - d) / n + d * (contrib + d_mass / n)
    return dict(zip(nodes, r))


def _edges_ds(edges):
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([u for u, _ in edges], pa.string()),
                "dst": pa.array([v for _, v in edges], pa.string()),
            }
        )
    ).repartition(3)


def _rand_edges(seed, n_nodes=40, n_edges=150):
    rng = np.random.default_rng(seed)
    # leave some nodes dangling (appear only as dst) and allow
    # self-loops + duplicate (multi-)edges
    src = rng.integers(0, n_nodes - 8, size=n_edges)
    dst = rng.integers(0, n_nodes, size=n_edges)
    return [(f"n{u}", f"n{v}") for u, v in zip(src, dst)]


@pytest.mark.parametrize("seed", [1, 2])
def test_pagerank_matches_naive(seed):
    edges = _rand_edges(seed)
    want = _naive_pagerank(edges, iters=6)
    got = {
        r["u"]: r["rank"]
        for r in pagerank_ds(_edges_ds(edges), max_iters=6, tol=None).take_all()
    }
    assert set(got) == set(want)
    for u in want:
        assert got[u] == pytest.approx(want[u], rel=1e-9, abs=1e-12), u
    # ranks form a distribution
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_converges_with_tol():
    # damping 0.3 contracts the L1 delta by ~0.3x per iteration, so
    # tol=1e-6 early-stops after ~12 iterations (bounded runtime)
    edges = _rand_edges(5)
    got = {
        r["u"]: r["rank"]
        for r in pagerank_ds(
            _edges_ds(edges), damping=0.3, max_iters=30, tol=1e-6
        ).take_all()
    }
    ref = _naive_pagerank(edges, d=0.3, iters=100)
    for u in ref:
        assert got[u] == pytest.approx(ref[u], abs=1e-5), u


def test_pagerank_tiny_and_empty():
    # two-node cycle: exactly symmetric at every iteration
    got = {
        r["u"]: r["rank"]
        for r in pagerank_ds(
            _edges_ds([("a", "b"), ("b", "a")]), max_iters=4, tol=None
        ).take_all()
    }
    assert got["a"] == pytest.approx(0.5) and got["b"] == pytest.approx(0.5)
    empty = _edges_ds([("a", "b")]).filter(lambda r: False)
    assert pagerank_ds(empty).count() == 0
