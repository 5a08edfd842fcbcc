"""Deterministic hash-argmin walks: exact agreement with a pure-python
simulator, kernel equivalence of the plumbing, dead-end absorption."""

import hashlib
from collections import defaultdict

import pyarrow as pa
import pytest
import ray.data as rd

from reden_ray.stages.walks import md5_walks

EDGES = [
    (1, 2), (1, 3), (2, 3), (2, 4), (3, 1), (3, 4), (4, 5), (5, 1),
    (6, 7),  # 7 is a dead end
]


def _ds(edges):
    return rd.from_arrow(
        pa.table(
            {
                "u": pa.array([e[0] for e in edges], pa.int64()),
                "v": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    ).repartition(3)


def _h(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


def _ref_walks(edges, steps):
    adj = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
    out = {}
    for start in sorted(adj):
        cur, path = start, []
        for t in range(1, steps + 1):
            nbrs = adj.get(cur, [])
            if nbrs:
                cur = min(nbrs, key=lambda n: (_h(f"{start},{t},{n}"), n))
            path.append(cur)
        out[start] = tuple(path)
    return out


@pytest.mark.parametrize("steps", [1, 2, 3])
def test_walks_match_reference(ray_session, steps):
    got = {
        r["start"]: tuple(r[f"s{i}"] for i in range(1, steps + 1))
        for r in md5_walks(_ds(EDGES), steps=steps).take_all()
    }
    assert got == _ref_walks(EDGES, steps)


def test_dead_end_absorbs(ray_session):
    got = {
        r["start"]: (r["s1"], r["s2"], r["s3"])
        for r in md5_walks(_ds(EDGES), steps=3).take_all()
    }
    assert got[6] == (7, 7, 7)  # 6 -> 7 then absorbed


def test_fmix_kernel_same_plumbing(ray_session):
    # different hash family, same walk-table shape and node domain
    got = md5_walks(_ds(EDGES), steps=2, kernel="fmix").take_all()
    nodes = {u for u, _ in EDGES} | {v for _, v in EDGES}
    assert {r["start"] for r in got} == {u for u, _ in EDGES}
    assert all(r["s1"] in nodes and r["s2"] in nodes for r in got)


def test_empty_edges(ray_session):
    assert md5_walks(_ds([]), steps=2).take_all() == []
