"""HITS golden tests: the normalized production mode must match a
dense numpy reference step-for-step; the integer mode (the SQL twin
graph_hits_2it uses) must match the exact recurrence."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from reden_ray.stages.hits import hits_scores

EDGES = [  # directed, with one multi-edge (1->4 twice) and a sink (5)
    (1, 4), (1, 4), (1, 5), (2, 4), (2, 6), (3, 5), (4, 6), (6, 1),
]


def _ds(edges):
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )


def _numpy_hits(edges, rounds, normalize):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n), dtype=np.float64)
    for u, v in edges:
        A[idx[u], idx[v]] += 1.0  # multi-edges weight
    h = np.ones(n)
    a = np.zeros(n)
    for _ in range(rounds):
        a = A.T @ h
        if normalize and a.sum() > 0:
            a = a / a.sum()
        h = A @ a
        if normalize and h.sum() > 0:
            h = h / h.sum()
    return {nodes[i]: (h[i], a[i]) for i in range(n)}


@pytest.mark.parametrize("rounds", [1, 2, 3])
def test_integer_mode_exact(ray_session, rounds):
    got = {
        r["node"]: (r["hub"], r["auth"])
        for r in hits_scores(_ds(EDGES), rounds=rounds, normalize=False).take_all()
    }
    want = _numpy_hits(EDGES, rounds, normalize=False)
    assert set(got) == set(want)
    for node, (h, a) in want.items():
        assert got[node] == (int(h), int(a)), node


def test_normalized_matches_numpy(ray_session):
    got = {
        r["node"]: (r["hub"], r["auth"])
        for r in hits_scores(_ds(EDGES), rounds=4, normalize=True).take_all()
    }
    want = _numpy_hits(EDGES, 4, normalize=True)
    for node, (h, a) in want.items():
        assert got[node] == pytest.approx(
            (np.floor(h * 1e6 + 0.5) / 1e6, np.floor(a * 1e6 + 0.5) / 1e6),
            abs=2e-6,
        ), node


def test_normalized_converges_to_singular_pair(ray_session):
    # many rounds -> principal left/right singular vectors (L1-scaled)
    got = {
        r["node"]: (r["hub"], r["auth"])
        for r in hits_scores(_ds(EDGES), rounds=40, normalize=True).take_all()
    }
    nodes = sorted({u for u, _ in EDGES} | {v for _, v in EDGES})
    idx = {n: i for i, n in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for u, v in EDGES:
        A[idx[u], idx[v]] += 1.0
    # power-iterate the numpy way to the same fixpoint
    h = np.ones(len(nodes))
    for _ in range(200):
        a = A.T @ h
        a /= a.sum()
        h = A @ a
        h /= h.sum()
    for node in nodes:
        assert got[node][0] == pytest.approx(h[idx[node]], abs=1e-5)
        assert got[node][1] == pytest.approx(a[idx[node]], abs=1e-5)


def test_empty_edges(ray_session):
    out = hits_scores(_ds([]), rounds=2, normalize=False).take_all()
    assert out == []
