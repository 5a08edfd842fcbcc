"""Golden tests for the log-round large-star/small-star CC primitive
(stages/cc.py) against a naive union-find — including the worst case
for the OLD join-CC (a long path, linear diameter) and degenerate
inputs (self-loops, duplicate/reversed edges)."""

import numpy as np
import pyarrow as pa
import pytest


def _naive_cc(edges):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in nodes}


CASES = {
    "path_200": [(i, i + 1) for i in range(200)],
    "two_cliques": [(i, j) for i in range(10) for j in range(i + 1, 10)]
    + [(100 + i, 100 + j) for i in range(8) for j in range(i + 1, 8)],
    "stars_and_selfloops": [(0, i) for i in range(1, 40)]
    + [(1000, 1000 + i) for i in range(1, 20)]
    + [(5, 5), (7, 6), (6, 7)],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_cc_min_labels_matches_union_find(ray_session, name):
    import ray.data as rd

    from reden_ray.stages.cc import cc_min_labels

    edges = CASES[name]
    rng = np.random.default_rng(11)
    perm = rng.permutation(len(edges))
    ds = rd.from_arrow(
        pa.table(
            {
                "u": pa.array([edges[i][0] for i in perm], pa.int64()),
                "v": pa.array([edges[i][1] for i in perm], pa.int64()),
            }
        )
    )
    labels, converged = cc_min_labels(ds)
    got = {r["node"]: r["label"] for r in labels.take_all()}
    assert converged
    assert got == _naive_cc([e for e in edges if e[0] != e[1]])


def test_cc_random_graph_matches_union_find(ray_session):
    import ray.data as rd

    from reden_ray.stages.cc import cc_min_labels

    rng = np.random.default_rng(7)
    u = rng.integers(0, 400, 700)
    v = rng.integers(0, 400, 700)
    ds = rd.from_arrow(
        pa.table({"u": pa.array(u, pa.int64()), "v": pa.array(v, pa.int64())})
    )
    labels, converged = cc_min_labels(ds)
    got = {r["node"]: r["label"] for r in labels.take_all()}
    ref = _naive_cc([(int(a), int(b)) for a, b in zip(u, v) if a != b])
    assert converged
    assert got == ref


def test_cc_degenerate_inputs(ray_session):
    """Self-loop-only and fully-empty edge inputs: empty labels,
    converged, no crash (the canon stage can yield zero edges)."""
    import pyarrow as pa
    import ray.data as rd

    from reden_ray.stages.cc import cc_min_labels

    loops = rd.from_arrow(
        pa.table({"u": pa.array([5, 6], pa.int64()), "v": pa.array([5, 6], pa.int64())})
    )
    labels, conv = cc_min_labels(loops)
    assert labels.take_all() == [] and conv

    empty = rd.from_arrow(
        pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    )
    labels, conv = cc_min_labels(empty)
    assert labels.take_all() == [] and conv
