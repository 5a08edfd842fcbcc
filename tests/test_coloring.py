"""Jones-Plassmann greedy coloring: exact agreement with a pure-python
simulator, properness and greedy-palette invariants."""

import hashlib
from collections import defaultdict

import pyarrow as pa
import pytest
import ray.data as rd

from reden_ray.stages.coloring import greedy_coloring

EDGES = [
    (1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (5, 6), (6, 4), (2, 5),
    (7, 8), (8, 8),  # separate component + a self-loop (dropped)
]


def _ds(edges, blocks=3):
    return rd.from_arrow(
        pa.table(
            {
                "u": pa.array([e[0] for e in edges], pa.int64()),
                "v": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    ).repartition(blocks)


def _h(n):
    return int.from_bytes(hashlib.md5(str(n).encode()).digest()[:8], "little")


def _ref(edges, rounds=30):
    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    uncolored = set(adj)
    color: dict[int, tuple[int, int]] = {}
    rnd = 0
    while uncolored and rnd < rounds:
        rnd += 1
        winners = {
            n
            for n in uncolored
            if all(_h(n) > _h(m) for m in adj[n] if m in uncolored)
        }
        for n in winners:
            used = {color[m][0] for m in adj[n] if m in color}
            c = 0
            while c in used:
                c += 1
            color[n] = (c, rnd)
        uncolored -= winners
    return color


@pytest.mark.parametrize("rounds", [1, 2, 30])
def test_matches_reference(ray_session, rounds):
    got = {
        r["node"]: (r["color"], r["round"])
        for r in greedy_coloring(_ds(EDGES), rounds=rounds).take_all()
    }
    want = _ref(EDGES, rounds)
    assert got == want


def test_proper_coloring_at_fixpoint(ray_session):
    got = {
        r["node"]: r["color"]
        for r in greedy_coloring(_ds(EDGES), rounds=30).take_all()
    }
    nodes = {n for e in EDGES for n in e if e[0] != e[1]}
    assert set(got) == nodes
    for a, b in EDGES:
        if a != b:
            assert got[a] != got[b], (a, b)


def test_empty(ray_session):
    assert greedy_coloring(_ds([(1, 1)], blocks=1)).take_all() == []
