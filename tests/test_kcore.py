"""k-core via iterated h-index must equal textbook peeling exactly."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from reden_ray.stages.kcore import core_numbers


def _naive_core(pairs):
    """Sequential peeling: core(v) = degree at the moment v is removed
    processing nodes in non-decreasing current-degree order."""
    adj: dict[int, set[int]] = {}
    for u, v in pairs:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    deg = {n: len(s) for n, s in adj.items()}
    core: dict[int, int] = {}
    k = 0
    alive = set(adj)
    while alive:
        n = min(alive, key=lambda x: deg[x])
        k = max(k, deg[n])
        core[n] = k
        alive.remove(n)
        for m in adj[n]:
            if m in alive:
                deg[m] -= 1
    return core


@pytest.mark.parametrize("seed,n,m", [(1, 15, 40), (5, 30, 140), (9, 12, 60)])
def test_core_matches_peeling(ray_session, seed, n, m):
    rng = np.random.RandomState(seed)
    pairs = [(int(rng.randint(0, n)), int(rng.randint(0, n))) for _ in range(m)]
    ds = rd.from_arrow(
        pa.table(
            {
                "u": pa.array([p[0] for p in pairs], pa.int64()),
                "v": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )
    ).repartition(3)
    got = core_numbers(ds).to_pandas().set_index("node")["core"].to_dict()
    want = _naive_core(pairs)
    assert got == want


def test_core_clique_plus_tail(ray_session):
    # K4 (core 3) with a pendant path 4-5-6 (core 1)
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (5, 6)]
    ds = rd.from_arrow(
        pa.table(
            {
                "u": pa.array([e[0] for e in edges], pa.int64()),
                "v": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )
    got = core_numbers(ds).to_pandas().set_index("node")["core"].to_dict()
    assert got == {0: 3, 1: 3, 2: 3, 3: 3, 4: 1, 5: 1, 6: 1}


def test_core_empty(ray_session):
    empty = rd.from_arrow(
        pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    )
    assert core_numbers(empty).count() == 0
