"""Bellman-Ford SSSP goldens: exact agreement with a dense numpy
reference per round and at the fixpoint."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from reden_ray.stages.sssp import sssp_distances

EDGES = [  # (u, v, w) — directed, weighted, includes a shortcut race
    (1, 2, 4), (1, 3, 1), (3, 2, 1), (2, 4, 1), (3, 4, 7),
    (4, 5, 2), (5, 6, 2), (1, 6, 20), (7, 1, 3),  # 7 unreachable from 1
]


def _ds(edges, blocks=3):
    return rd.from_arrow(
        pa.table(
            {
                "u": pa.array([e[0] for e in edges], pa.int64()),
                "v": pa.array([e[1] for e in edges], pa.int64()),
                "w": pa.array([e[2] for e in edges], pa.int64()),
            }
        )
    ).repartition(blocks)


def _ref(edges, source, rounds):
    INF = float("inf")
    nodes = {u for u, _, _ in edges} | {v for _, v, _ in edges}
    dist = {n: INF for n in nodes}
    dist[source] = 0
    for _ in range(rounds):
        new = dict(dist)
        for u, v, w in edges:
            if dist[u] < INF:
                new[v] = min(new[v], dist[u] + w)
        dist = new
    return {n: d for n, d in dist.items() if d < INF}


@pytest.mark.parametrize("rounds", [1, 2, 3, 6])
def test_rounds_match_reference(ray_session, rounds):
    got = {
        r["node"]: r["dist"]
        for r in sssp_distances(_ds(EDGES), source=1, rounds=rounds).take_all()
    }
    assert got == _ref(EDGES, 1, rounds)


def test_fixpoint_is_sssp(ray_session):
    got = {
        r["node"]: r["dist"]
        for r in sssp_distances(_ds(EDGES), source=1, rounds=7).take_all()
    }
    assert got == {1: 0, 2: 2, 3: 1, 4: 3, 5: 5, 6: 7}
    assert 7 not in got  # unreachable: no row, no sentinel


def test_source_without_out_edges(ray_session):
    got = sssp_distances(_ds(EDGES), source=6, rounds=3).take_all()
    assert got == [{"node": 6, "dist": 0}]
