"""Tests for stages/linkpred.py (Adamic-Adar link prediction)."""
import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from reden_ray.stages.linkpred import adamic_adar_topk


def _naive_adamic_adar(pairs, k):
    """All non-edge pairs scored by sum over common neighbors of
    1/ln(deg(center)), rounded 4dp, top-k by (score desc, u, v)."""
    adj: dict[int, set[int]] = {}
    edges = set()
    for u, v in pairs:
        if u == v:
            continue
        a, b = min(u, v), max(u, v)
        edges.add((a, b))
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    scores: dict[tuple[int, int], float] = {}
    for center, nbrs in adj.items():
        d = len(nbrs)
        if d < 2:
            continue
        w = 1.0 / math.log(d)
        ns = sorted(nbrs)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                key = (ns[i], ns[j])
                scores[key] = scores.get(key, 0.0) + w
    rows = [
        (u, v, round(s, 4))
        for (u, v), s in scores.items()
        if (u, v) not in edges
    ]
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    return rows[:k]


@pytest.mark.parametrize("seed,n,m,k", [(0, 12, 40, 10), (7, 25, 120, 15)])
def test_adamic_adar_matches_naive(seed, n, m, k):
    rng = np.random.RandomState(seed)
    pairs = [(int(rng.randint(0, n)), int(rng.randint(0, n))) for _ in range(m)]
    pairs += [(v, u) for u, v in pairs[:8]]  # duplicates + reversals
    ds = rd.from_arrow(
        pa.table(
            {
                "u": pa.array([p[0] for p in pairs], pa.int64()),
                "v": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )
    ).repartition(4)
    got = adamic_adar_topk(ds, k=k).to_pandas()
    got_rows = list(zip(got["u"], got["v"], got["score"]))
    want = _naive_adamic_adar(pairs, k)
    assert len(got_rows) == len(want)
    for (gu, gv, gs), (wu, wv, ws) in zip(got_rows, want):
        assert (gu, gv) == (wu, wv)
        assert gs == pytest.approx(ws, abs=1e-9)


def test_adamic_adar_empty_and_star():
    empty = rd.from_arrow(
        pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    )
    assert adamic_adar_topk(empty).count() == 0
    # star graph: center 0 with leaves 1..4 — every leaf pair is a
    # non-edge wedge through the center, weight 1/ln(4)
    star = rd.from_arrow(
        pa.table(
            {
                "u": pa.array([0, 0, 0, 0], pa.int64()),
                "v": pa.array([1, 2, 3, 4], pa.int64()),
            }
        )
    )
    out = adamic_adar_topk(star, k=100).to_pandas()
    assert len(out) == 6  # C(4,2)
    w = round(1.0 / math.log(4), 4)
    assert all(abs(s - w) < 1e-9 for s in out["score"])
    # max_degree below the hub's degree: deterministic hash-ranked
    # SAMPLE of 3 of the 4 leaves -> C(3,2)=3 pairs, all flagged
    # truncated, weight still from the TRUE degree (1/ln 4)
    capped = adamic_adar_topk(star, k=10, max_degree=3).to_pandas()
    assert len(capped) == 3
    assert capped["truncated"].all()
    assert all(abs(s - w) < 1e-9 for s in capped["score"])


def test_max_degree_cap_exact_when_loose_and_subset_when_tight():
    rng = np.random.RandomState(11)
    pairs = [(int(rng.randint(0, 20)), int(rng.randint(0, 20))) for _ in range(90)]
    ds = rd.from_arrow(
        pa.table(
            {
                "u": pa.array([p[0] for p in pairs], pa.int64()),
                "v": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )
    ).repartition(3)
    exact = adamic_adar_topk(ds, k=200).to_pandas()
    # cap >= max degree: scores identical to exact, truncated all False
    loose = adamic_adar_topk(ds, k=200, max_degree=1000).to_pandas()
    assert list(loose.columns) == ["u", "v", "score", "truncated"]
    assert not loose["truncated"].any()
    assert list(zip(loose["u"], loose["v"], loose["score"])) == list(
        zip(exact["u"], exact["v"], exact["score"])
    )
    # tight cap: every emitted pair is a wedge of the real graph (subset
    # of the exact PAIR set), something is flagged truncated on this
    # hubby graph, and the sample is deterministic across runs
    tight = adamic_adar_topk(ds, k=200, max_degree=3).to_pandas()
    exact_pairs = set(zip(exact["u"], exact["v"]))
    assert set(zip(tight["u"], tight["v"])) <= exact_pairs
    assert tight["truncated"].any()
    tight2 = adamic_adar_topk(ds, k=200, max_degree=3).to_pandas()
    assert tight.equals(tight2)


def _naive_method(pairs, k, method):
    adj: dict[int, set[int]] = {}
    edges = set()
    for u, v in pairs:
        if u == v:
            continue
        a, b = min(u, v), max(u, v)
        edges.add((a, b))
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    common: dict[tuple[int, int], int] = {}
    for center, nbrs in adj.items():
        ns = sorted(nbrs)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                key = (ns[i], ns[j])
                common[key] = common.get(key, 0) + 1
    rows = []
    for (u, v), c in common.items():
        if (u, v) in edges:
            continue
        if method == "common_neighbors":
            rows.append((u, v, c))
        else:  # jaccard
            du, dv = len(adj[u]), len(adj[v])
            rows.append((u, v, round(c / (du + dv - c), 4)))
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    return rows[:k]


@pytest.mark.parametrize("method", ["common_neighbors", "jaccard"])
def test_methods_match_naive(method):
    from reden_ray.stages.linkpred import linkpred_topk

    rng = np.random.RandomState(3)
    pairs = [(int(rng.randint(0, 18)), int(rng.randint(0, 18))) for _ in range(70)]
    ds = rd.from_arrow(
        pa.table(
            {
                "u": pa.array([p[0] for p in pairs], pa.int64()),
                "v": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )
    ).repartition(3)
    got = linkpred_topk(ds, k=12, method=method).to_pandas()
    got_rows = list(zip(got["u"], got["v"], got["score"]))
    want = _naive_method(pairs, 12, method)
    assert len(got_rows) == len(want)
    for (gu, gv, gs), (wu, wv, ws) in zip(got_rows, want):
        assert (gu, gv) == (wu, wv)
        assert gs == pytest.approx(ws, abs=1e-9)


def test_unknown_method_raises():
    from reden_ray.stages.linkpred import linkpred_topk

    empty = rd.from_arrow(
        pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    )
    with pytest.raises(ValueError):
        linkpred_topk(empty, method="katz")
