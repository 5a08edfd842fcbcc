"""Unit tests for the round-4 continuation-2 stages: skew join, BFS
hop distance, SemDedup, distributed PCA — each against a naive
driver-side golden."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    return ray_session


def _rng(seed=7):
    return np.random.default_rng(seed)


# ---------------------------------------------------------------- skew join


def _skew_tables():
    rng = _rng()
    # Zipf-ish probe: key 1 is white-hot, a few warm, long cold tail
    keys = np.concatenate(
        [
            np.full(5000, 1),
            np.full(800, 2),
            rng.integers(3, 400, size=3000),
        ]
    ).astype(np.int64)
    probe = pa.table(
        {"k": keys, "x": np.arange(len(keys), dtype=np.int64)}
    )
    build = pa.table(
        {
            "k": np.arange(1, 400, dtype=np.int64),
            "name": [f"n{i}" for i in range(1, 400)],
        }
    )
    return probe, build


def _golden_join(probe: pa.Table, build: pa.Table, how: str) -> set:
    jt = {"inner": "inner", "left_outer": "left outer"}[how]
    j = probe.join(build, keys=["k"], join_type=jt)
    return {
        (r["k"], r["x"], r["name"]) for r in j.to_pylist()
    }


@pytest.mark.parametrize("how", ["inner", "left_outer"])
def test_skew_join_matches_plain_join(how):
    import ray.data as rd

    from reden_ray.stages.skewjoin import skew_join

    probe, build = _skew_tables()
    left = rd.from_arrow(probe).repartition(8)
    right = rd.from_arrow(build).repartition(3)
    out = skew_join(left, right, on="k", how=how, hot_threshold=500)
    got = {
        (r["k"], r["x"], r["name"]) for r in out.take_all()
    }
    assert got == _golden_join(probe, build, how)


def test_skew_join_no_hot_keys_falls_back():
    import ray.data as rd

    from reden_ray.stages.skewjoin import skew_join

    probe, build = _skew_tables()
    left = rd.from_arrow(probe).repartition(4)
    right = rd.from_arrow(build)
    out = skew_join(left, right, on="k", how="inner", hot_threshold=10**9)
    assert out.count() == len(_golden_join(probe, build, "inner"))


def test_hot_keys_guard_trips():
    import ray.data as rd

    from reden_ray.stages.skewjoin import hot_keys

    t = pa.table({"k": np.arange(1000, dtype=np.int64)})
    with pytest.raises(ValueError, match="threshold too low"):
        hot_keys(rd.from_arrow(t), "k", hot_threshold=1, max_hot_keys=10)


# ---------------------------------------------------------------- BFS


def _naive_bfs(edges: list[tuple[int, int]], seeds: list[int], max_hops: int):
    from collections import defaultdict, deque

    adj = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if dist[u] >= max_hops:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def test_bfs_hops_matches_naive():
    import ray.data as rd

    from reden_ray.stages.bfs import bfs_hops

    rng = _rng(3)
    n = 300
    m = 1200
    eu = rng.integers(0, n, size=m).astype(np.int64)
    ev = rng.integers(0, n, size=m).astype(np.int64)
    keep = eu != ev
    eu, ev = eu[keep], ev[keep]
    # undirected: both orientations
    u = np.concatenate([eu, ev])
    v = np.concatenate([ev, eu])
    edges = rd.from_arrow(pa.table({"u": u, "v": v})).repartition(6)
    seeds = rd.from_arrow(pa.table({"node": pa.array([0, 1, 2], pa.int64())}))
    out = bfs_hops(edges, seeds, max_hops=4)
    got = {r["node"]: r["hops"] for r in out.take_all()}
    want = _naive_bfs(list(zip(u.tolist(), v.tolist())), [0, 1, 2], 4)
    assert got == want


def test_bfs_empty_frontier_stops_early():
    import ray.data as rd

    from reden_ray.stages.bfs import bfs_hops

    edges = rd.from_arrow(
        pa.table({"u": pa.array([1], pa.int64()), "v": pa.array([2], pa.int64())})
    )
    seeds = rd.from_arrow(pa.table({"node": pa.array([1], pa.int64())}))
    out = bfs_hops(edges, seeds, max_hops=10)
    got = {r["node"]: r["hops"] for r in out.take_all()}
    assert got == {1: 0, 2: 1}


# ---------------------------------------------------------------- SemDedup


def test_semdedup_matches_naive():
    import ray.data as rd

    from reden_ray.stages.semdedup import assign_and_dedup

    rng = _rng(11)
    n, d, k = 240, 16, 4
    base = rng.normal(size=(n, d))
    # plant exact near-dups: rows 10/11 clones of 0/1 (scaled)
    base[10] = base[0] * 1.5
    base[11] = base[1] * 0.5
    cents = rng.normal(size=(k, d))
    ids = np.arange(n, dtype=np.int64)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": ids,
                "embedding": pa.array(list(base), pa.list_(pa.float64())),
            }
        )
    ).repartition(5)
    tau = 0.95
    out = assign_and_dedup(ds, cents, tau)
    got = {r["vec_id"]: (r["cluster"], r["dropped"]) for r in out.take_all()}

    scores = base @ cents.T - (cents * cents).sum(1) / 2
    assign = scores.argmax(1)
    xn = base / np.linalg.norm(base, axis=1, keepdims=True)
    want = {}
    for i in range(n):
        dropped = any(
            assign[j] == assign[i] and xn[j] @ xn[i] > tau
            for j in range(i)
        )
        want[i] = (assign[i], dropped)
    assert got == want
    assert got[10][1] or assign[10] != assign[0]  # clone dropped if co-clustered


def test_semdedup_cluster_cap_raises():
    import ray.data as rd

    from reden_ray.stages.semdedup import assign_and_dedup

    rng = _rng(2)
    base = rng.normal(size=(50, 4))
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": np.arange(50, dtype=np.int64),
                "embedding": pa.array(list(base), pa.list_(pa.float64())),
            }
        )
    )
    with pytest.raises(Exception, match="max_cluster_rows"):
        assign_and_dedup(
            ds, np.zeros((1, 4)), 0.9, max_cluster_rows=10
        ).materialize()


# ---------------------------------------------------------------- PCA


def test_pca_project_matches_numpy():
    import ray.data as rd

    from reden_ray.stages.pca import (
        covariance_and_mean,
        pca_project,
        principal_components,
    )

    rng = _rng(5)
    n, d, q = 400, 12, 3
    x = rng.normal(size=(n, d)) @ rng.normal(size=(d, d))
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": np.arange(n, dtype=np.int64),
                "embedding": pa.array(list(x), pa.list_(pa.float64())),
            }
        )
    ).repartition(7)

    cov, mean, cnt = covariance_and_mean(ds)
    assert cnt == n
    np.testing.assert_allclose(mean, x.mean(0), atol=1e-9)
    np.testing.assert_allclose(cov, np.cov(x.T, bias=True), atol=1e-8)

    out = pca_project(ds, q).take_all()
    got = np.array(
        [[r[f"pc{k}"] for k in range(q)] for r in sorted(out, key=lambda r: r["vec_id"])]
    )
    comps = principal_components(np.cov(x.T, bias=True), q)
    want = np.round((x - x.mean(0)) @ comps.T, 6)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pca_sign_fix_deterministic():
    from reden_ray.stages.pca import principal_components

    cov = np.diag([3.0, 2.0, 1.0])
    comps = principal_components(cov, 2)
    assert comps.shape == (2, 3)
    # largest-|coef| entry of each component is positive
    for r in comps:
        assert r[np.argmax(np.abs(r))] > 0
    np.testing.assert_allclose(np.abs(comps[0]), [1, 0, 0], atol=1e-12)


def test_emb_pca_project_query_golden():
    """The driver's rows-only PCA query, golden-checked against a full
    in-memory numpy PCA over the same sf0.01 table."""
    import pyarrow.parquet as pq

    from reden_ray.pipelines.relational2 import emb_pca_project
    from reden_ray.stages.pca import principal_components

    sf = "/root/testdata/sf0.01"
    out = emb_pca_project(sf).take_all()
    got = {r["vec_id"]: (r["pc0"], r["pc1"]) for r in out}

    t = pq.read_table(f"{sf}/embeddings.parquet")
    x = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    ids = t.column("vec_id").to_numpy()
    comps = principal_components(np.cov(x.T, bias=True), 2)
    want = np.round((x - x.mean(0)) @ comps.T, 6)
    assert set(got) == set(ids.tolist())
    w = {int(i): (want[k, 0], want[k, 1]) for k, i in enumerate(ids)}
    for i in got:
        np.testing.assert_allclose(got[i], w[i], atol=1e-4)


# ------------------------------------------------------------ overlap join


def test_overlap_join_matches_naive():
    import ray.data as rd

    from reden_ray.stages.intervals import overlap_join

    rng = _rng(13)
    na, nb = 120, 80
    a0 = rng.integers(0, 10_000, size=na).astype(np.int64)
    a1 = a0 + rng.integers(0, 900, size=na)
    b0 = rng.integers(0, 10_000, size=nb).astype(np.int64)
    b1 = b0 + rng.integers(0, 400, size=nb)
    left = rd.from_arrow(
        pa.table({"aid": np.arange(na, dtype=np.int64), "a_start": a0, "a_end": a1})
    ).repartition(4)
    right = rd.from_arrow(
        pa.table({"bid": np.arange(nb, dtype=np.int64), "b_start": b0, "b_end": b1})
    ).repartition(3)
    out = overlap_join(
        left, right, band_width=500,
        left_bounds=("a_start", "a_end"), right_bounds=("b_start", "b_end"),
    )
    got = {(r["aid"], r["bid"]) for r in out.take_all()}
    want = {
        (i, j)
        for i in range(na)
        for j in range(nb)
        if a0[i] <= b1[j] and b0[j] <= a1[i]
    }
    assert got == want


def test_overlap_join_empty_side():
    import ray.data as rd

    from reden_ray.stages.intervals import overlap_join

    left = rd.from_arrow(
        pa.table({"aid": pa.array([], pa.int64()),
                  "a_start": pa.array([], pa.int64()),
                  "a_end": pa.array([], pa.int64())})
    )
    right = rd.from_arrow(
        pa.table({"bid": pa.array([1], pa.int64()),
                  "b_start": pa.array([0], pa.int64()),
                  "b_end": pa.array([10], pa.int64())})
    )
    out = overlap_join(
        left, right, band_width=100,
        left_bounds=("a_start", "a_end"), right_bounds=("b_start", "b_end"),
    )
    assert out.count() == 0


# ------------------------------------------------------------ containment


def test_ngram_containment_vs_naive():
    import ray.data as rd

    from reden_ray.stages.dedup import _doc_word_ngrams, ngram_jaccard_pairs

    docs = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy dog"),  # contained in 0
        (2, "completely different text about ray data pipelines at scale"),
        (3, "the quick brown fox jumps over the lazy dog again and again"),  # dup of 0
    ]
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array([d for d, _ in docs], pa.int64()),
             "text": pa.array([t for _, t in docs])}
        )
    ).repartition(2)
    out = ngram_jaccard_pairs(ds, n=3, threshold=0.9, metric="containment")
    got = {(r["doc_a"], r["doc_b"]): r["containment"] for r in out.take_all()}

    want = {}
    gs = {d: _doc_word_ngrams(t, 3) for d, t in docs}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            shared = len(gs[i] & gs[j])
            if min(len(gs[i]), len(gs[j])) == 0:
                continue
            c = shared / min(len(gs[i]), len(gs[j]))
            if c >= 0.9:
                want[(i, j)] = round(c, 6)
    assert got == want
    assert (0, 1) in got and got[(0, 1)] == 1.0  # containment catches the subset
    assert (0, 3) in got


def test_ngram_metric_guard():
    import ray.data as rd

    from reden_ray.stages.dedup import ngram_jaccard_pairs

    ds = rd.from_arrow(pa.table({"doc_id": pa.array([0], pa.int64()), "text": ["x"]}))
    with pytest.raises(ValueError, match="unknown metric"):
        ngram_jaccard_pairs(ds, metric="dice")


def test_pca_power_component_matches_naive():
    from reden_ray.stages.pca import power_component

    rng = _rng(9)
    a = rng.normal(size=(6, 6))
    cov = a @ a.T
    v = np.ones(6)
    for _ in range(2):
        v = cov @ v
    v = v / np.sqrt((v * v).sum())
    np.testing.assert_allclose(power_component(cov, n_iters=2), v, rtol=1e-12)


def test_pca_power_project_recurrence(ray_session):
    import ray.data as rd

    from reden_ray.stages.pca import (
        covariance_and_mean,
        pca_power_project,
        power_component,
    )

    rng = _rng(11)
    n, d = 120, 5
    x = rng.normal(size=(n, d))
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": np.arange(n, dtype=np.int64),
                "embedding": pa.array(list(x), pa.list_(pa.float64())),
            }
        )
    ).repartition(4)
    out = {r["vec_id"]: r["pc0"] for r in pca_power_project(ds, n_iters=2).take_all()}
    cov, mean, _ = covariance_and_mean(ds)
    u = power_component(cov, 2)
    want = np.round((x - mean) @ u, 4)
    got = np.array([out[i] for i in range(n)])
    np.testing.assert_allclose(got, want, atol=1e-9)
