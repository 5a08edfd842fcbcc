"""Greedy maximal matching: exact agreement with a pure-python
handshake simulator, matching + maximality invariants."""

import hashlib
from collections import defaultdict

import pyarrow as pa
import pytest
import ray.data as rd

from reden_ray.stages.matching import maximal_matching

EDGES = [
    (1, 2), (2, 3), (3, 4), (4, 5), (5, 1), (2, 5), (6, 7), (7, 8),
    (9, 10), (10, 9), (3, 3),  # dup (reversed) + self-loop
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


def _h(u, v):
    return int.from_bytes(hashlib.md5(f"{u},{v}".encode()).digest()[:8], "little")


def _ref(edges, max_rounds=30):
    live = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    out = {}
    rnd = 0
    while live and rnd < max_rounds:
        rnd += 1
        node_min = defaultdict(lambda: 1 << 70)
        for (a, b) in live:
            h = _h(a, b)
            node_min[a] = min(node_min[a], h)
            node_min[b] = min(node_min[b], h)
        sel = {
            (a, b)
            for (a, b) in live
            if _h(a, b) == node_min[a] == node_min[b]
        }
        if not sel:
            break
        for e in sel:
            out[e] = rnd
        matched = {n for e in sel for n in e}
        live = {e for e in live if e[0] not in matched and e[1] not in matched}
    return out


def test_matches_reference(ray_session):
    got = {
        (r["u"], r["v"]): r["round"]
        for r in maximal_matching(_ds(EDGES)).take_all()
    }
    assert got == _ref(EDGES)


def test_is_matching_and_maximal(ray_session):
    got = [(r["u"], r["v"]) for r in maximal_matching(_ds(EDGES)).take_all()]
    nodes = [n for e in got for n in e]
    assert len(nodes) == len(set(nodes))  # node-disjoint
    matched = set(nodes)
    for a, b in EDGES:  # maximal: every edge touches a matched node
        if a != b:
            assert a in matched or b in matched, (a, b)


def test_single_edge(ray_session):
    got = maximal_matching(_ds([(5, 9)], blocks=1)).take_all()
    assert [(r["u"], r["v"], r["round"]) for r in got] == [(5, 9, 1)]


def test_empty(ray_session):
    assert maximal_matching(_ds([(3, 3)], blocks=1)).take_all() == []
