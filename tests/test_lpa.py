"""Synchronous LPA (stages/lpa.py): hand-checked rounds on a path
graph, duplicate-edge immunity, two-community structure.  SQL parity
is covered by the oracle harness (graph_lpa_2it)."""

import pyarrow as pa
import pytest
import ray.data as rd

from reden_ray.stages.lpa import lpa_labels


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    return ray_session


def _edges(pairs):
    return rd.from_arrow(
        pa.table(
            {
                "u": pa.array([p[0] for p in pairs], pa.int64()),
                "v": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )
    )


PATH = [(0, 1), (1, 2), (2, 3), (3, 4)]


def test_path_graph_two_rounds_hand_checked():
    got = {r["node"]: r["label"] for r in lpa_labels(_edges(PATH), rounds=2).take_all()}
    # r1 = min neighbor (all votes tie at 1); r2 hand-derived
    assert got == {0: 0, 1: 1, 2: 0, 3: 1, 4: 2}


def test_duplicate_edges_do_not_weight_votes():
    # node 2's neighbors are 0 and 1; a repeated (1, 2) edge must NOT
    # make label 1 outvote label 0
    dup = [(0, 2), (1, 2), (1, 2), (2, 1)]  # includes a reversed dup
    got = {r["node"]: r["label"] for r in lpa_labels(_edges(dup), rounds=1).take_all()}
    assert got[2] == 0  # tie at 1 vote each -> smallest label wins


def test_two_cliques_converge_to_two_communities():
    a = [(i, j) for i in range(0, 5) for j in range(i + 1, 5)]
    b = [(i, j) for i in range(10, 15) for j in range(i + 1, 15)]
    bridge = [(4, 10)]
    got = lpa_labels(_edges(a + b + bridge), rounds=3).take_all()
    labels = {r["node"]: r["label"] for r in got}
    assert set(labels[i] for i in range(0, 5)) == {0}
    assert set(labels[i] for i in range(10, 15)) == {10}
