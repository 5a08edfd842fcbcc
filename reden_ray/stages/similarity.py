"""Similarity search over an embedding column (``list<float>``).

- ``knn_brute_force`` — the exactness baseline: per-batch numpy matmul
  of the block's vectors against a BROADCAST query matrix (``ray.put``
  once, read per actor), emitting each block's local top-k, then a tiny
  global top-k reduce per query.  This is a scan, not a shuffle: cost is
  one pass over the corpus regardless of the number of queries.
- ``knn_lsh`` — the scale path: random-hyperplane buckets (shared with
  stages.dedup.embedding_dup_pairs); only blocks whose bucket matches a
  query's bucket (within ``probe`` Hamming probes) are scanned.

All math is float32 numpy; cosine = dot of L2-normalized vectors.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n



def global_topk(
    partials: rd.Dataset,
    k: int,
    score_col: str = "cosine",
    rank_base: int = 0,
) -> pa.Table:
    """Distributed top-k merge of per-block partial results.

    groupby(query_id) -> per-group vectorized sort-take(k) + rank —
    the shuffle moves only n_blocks x n_q x k tiny rows and the driver
    receives exactly n_q x k (never the per-block partials; at 10^6
    blocks the old driver-side merge was unbounded).  Ties break by
    vec_id ascending (deterministic)."""
    import pyarrow.compute as pc

    def topk(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[(score_col, "descending"), ("vec_id", "ascending")],
        )
        g = group.take(idx[:k])
        return g.append_column(
            "rank", pa.array(np.arange(rank_base, rank_base + g.num_rows), pa.int64())
        )

    reduced = partials.groupby("query_id").map_groups(topk, batch_format="pyarrow")
    rows = reduced.take_all()  # n_q x k rows only
    t = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("query_id", pa.int64()),
                ("vec_id", pa.int64()),
                (score_col, pa.float64()),
                ("rank", pa.int64()),
            ]
        ),
    ).select(["query_id", "rank", "vec_id", score_col])
    return t.take(
        pc.sort_indices(
            t, sort_keys=[("query_id", "ascending"), ("rank", "ascending")]
        )
    )


def knn_brute_force(
    embeddings: rd.Dataset,
    queries: np.ndarray,
    k: int = 10,
    id_column: str = "vec_id",
) -> pa.Table:
    """Exact top-k cosine neighbors per query row.

    Returns (query_id, rank, vec_id, cosine) sorted by (query_id, rank);
    ties broken by vec_id (deterministic).
    """
    q = _normalize(np.asarray(queries, dtype=np.float32))
    q_ref = ray.put(q)

    def local_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        ids = np.asarray(batch.column(id_column).to_pylist(), dtype=np.int64)
        vecs = _normalize(np.asarray(batch.column("embedding").to_pylist(), dtype=np.float32))
        sims = qm @ vecs.T  # (n_q, n_block)
        kk = min(k, sims.shape[1])
        qs, vs, ss = [], [], []
        # per query: top-k of this block only (tiny rows leave the task)
        for qi in range(sims.shape[0]):
            idx = np.argpartition(-sims[qi], kk - 1)[:kk]
            qs.extend([qi] * kk)
            vs.extend(ids[idx].tolist())
            ss.extend(sims[qi, idx].astype(np.float64).tolist())
        return pa.table(
            {
                "query_id": pa.array(qs, pa.int64()),
                "vec_id": pa.array(vs, pa.int64()),
                "cosine": pa.array(ss, pa.float64()),
            }
        )

    partials = embeddings.map_batches(local_topk, batch_format="pyarrow")
    return global_topk(partials, k)


def train_ivf_centroids(
    embeddings: rd.Dataset,
    n_centroids: int = 16,
    sample_size: int = 2048,
    n_iters: int = 10,
    seed: int = 13,
    id_column: str = "vec_id",
) -> np.ndarray:
    """Coarse quantizer for IVF: k-means on a deterministic sample.

    The sample (first ``sample_size`` rows by id — seeded/deterministic,
    no global shuffle) trains centroids DRIVER-SIDE in numpy; at corpus
    scale this is the standard pattern (train on a sample, assign
    distributed).  Returns L2-normalized centroids (spherical k-means —
    cosine geometry)."""
    rows = embeddings.limit(sample_size).take_all()
    x = _normalize(np.asarray([r["embedding"] for r in rows], dtype=np.float32))
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(n_iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def knn_ivf(
    embeddings: rd.Dataset,
    queries: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 13,
    id_column: str = "vec_id",
) -> pa.Table:
    """IVF approximate top-k: assign every vector to its nearest
    centroid per batch; score a query only against vectors whose
    centroid is among the query's ``nprobe`` nearest lists.  Same output
    schema as ``knn_brute_force``; recall grows with nprobe (== exact at
    nprobe == n_centroids)."""
    cent = train_ivf_centroids(embeddings, n_centroids=n_centroids, seed=seed, id_column=id_column)
    q = _normalize(np.asarray(queries, dtype=np.float32))
    q_lists = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]  # (n_q, nprobe)
    cent_ref, q_ref, lists_ref = ray.put(cent), ray.put(q), ray.put(q_lists)

    def local(batch: pa.Table) -> pa.Table:
        c, qm, ql = ray.get(cent_ref), ray.get(q_ref), ray.get(lists_ref)
        ids = np.asarray(batch.column(id_column).to_pylist(), dtype=np.int64)
        vecs = _normalize(np.asarray(batch.column("embedding").to_pylist(), dtype=np.float32))
        assign = np.argmax(vecs @ c.T, axis=1)
        sims = qm @ vecs.T
        qs, vs, ss = [], [], []
        for qi in range(qm.shape[0]):
            mask = np.isin(assign, ql[qi])
            if not mask.any():
                continue
            cand = np.where(mask)[0]
            kk = min(k, len(cand))
            idx = cand[np.argpartition(-sims[qi, cand], kk - 1)[:kk]]
            qs.extend([qi] * kk)
            vs.extend(ids[idx].tolist())
            ss.extend(sims[qi, idx].astype(np.float64).tolist())
        return pa.table(
            {
                "query_id": pa.array(qs, pa.int64()),
                "vec_id": pa.array(vs, pa.int64()),
                "cosine": pa.array(ss, pa.float64()),
            }
        )

    partials = embeddings.map_batches(local, batch_format="pyarrow")
    return global_topk(partials, k)


def build_ivf_index(
    embeddings: rd.Dataset,
    out_dir: str,
    n_centroids: int = 16,
    sample_size: int = 2048,
    seed: int = 13,
    id_column: str = "vec_id",
) -> np.ndarray:
    """Persist an IVF index as CENTROID-PARTITIONED parquet.

    The 100-TB ANN shape: assign every vector to its nearest centroid
    (one streaming map over the corpus), write with
    ``partition_cols=["centroid"]`` so each inverted list is its own
    parquet directory, and store the centroid matrix beside it.  A
    search then reads ONLY the ``nprobe`` probed partitions — partition
    pruning at the read, the dominant saving at corpus scale (a scan
    touches nprobe/n_centroids of the bytes).  Returns the centroids.
    """
    import os

    import pyarrow.parquet as pq

    cent = train_ivf_centroids(
        embeddings, n_centroids=n_centroids, sample_size=sample_size, seed=seed,
        id_column=id_column,
    )
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        vecs = _normalize(np.asarray(batch.column("embedding").to_pylist(), dtype=np.float32))
        a = np.argmax(vecs @ c.T, axis=1).astype(np.int64)
        return batch.append_column("centroid", pa.array(a))

    embeddings.map_batches(assign, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["centroid"]
    )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "centroid": pa.array(range(len(cent)), pa.int64()),
                "vector": pa.array([row.tolist() for row in cent], pa.list_(pa.float32())),
            }
        ),
        os.path.join(out_dir, "_centroids.parquet"),
    )
    return cent


def knn_ivf_indexed(
    index_dir: str,
    queries: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_column: str = "vec_id",
) -> pa.Table:
    """Search a ``build_ivf_index`` directory: only the probed
    centroids' partitions are READ (row-group/partition pruning via a
    partition-column filter), then the usual per-block top-k + grouped
    global merge.  Output schema matches ``knn_brute_force``; equals
    ``knn_ivf`` on the same centroids (tested)."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    cent_t = pq.read_table(os.path.join(index_dir, "_centroids.parquet"))
    cent = np.asarray(cent_t.column("vector").to_pylist(), dtype=np.float32)
    q = _normalize(np.asarray(queries, dtype=np.float32))
    q_lists = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]  # (n_q, nprobe)
    wanted = sorted({int(c) for row in q_lists for c in row})

    # hive-partitioned layout (centroid=<v>/...): prune by reading ONLY
    # the probed partitions' directories — the bytes of unprobed
    # inverted lists never leave storage.  Pruning is explicit paths,
    # not a read filter: Ray 2.49 binds ``filter=`` against the
    # fragment's PHYSICAL schema, which lacks the hive partition field
    # (ArrowInvalid: no match for FieldRef), so partition-column
    # filters cannot push down; per-directory reads + a constant
    # column are equivalent and portable.
    import glob

    parts = []
    for v in wanted:
        sub = os.path.join(index_dir, f"centroid={v}")
        if glob.glob(os.path.join(sub, "*.parquet")):
            def attach(t: pa.Table, v=v) -> pa.Table:
                # Ray may or may not resolve the hive field from the
                # subdir path; normalize to one int64 centroid column
                if "centroid" in t.column_names:
                    i = t.schema.get_field_index("centroid")
                    return t.set_column(
                        i, "centroid", pa.array([v] * t.num_rows, pa.int64())
                    )
                return t.append_column(
                    "centroid", pa.array([v] * t.num_rows, pa.int64())
                )

            part = rd.read_parquet(sub).map_batches(attach, batch_format="pyarrow")
            parts.append(part)
    if not parts:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    q_ref, lists_ref = ray.put(q), ray.put(q_lists)

    def local(batch: pa.Table) -> pa.Table:
        qm, ql = ray.get(q_ref), ray.get(lists_ref)
        ids = np.asarray(batch.column(id_column).to_pylist(), dtype=np.int64)
        vecs = _normalize(np.asarray(batch.column("embedding").to_pylist(), dtype=np.float32))
        assign = np.asarray(batch.column("centroid").to_pylist(), dtype=np.int64)
        sims = qm @ vecs.T
        qs, vs, ss = [], [], []
        for qi in range(qm.shape[0]):
            mask = np.isin(assign, ql[qi])
            if not mask.any():
                continue
            cand = np.where(mask)[0]
            kk = min(k, len(cand))
            idx = cand[np.argpartition(-sims[qi, cand], kk - 1)[:kk]]
            qs.extend([qi] * kk)
            vs.extend(ids[idx].tolist())
            ss.extend(sims[qi, idx].astype(np.float64).tolist())
        return pa.table(
            {
                "query_id": pa.array(qs, pa.int64()),
                "vec_id": pa.array(vs, pa.int64()),
                "cosine": pa.array(ss, pa.float64()),
            }
        )

    partials = ds.map_batches(local, batch_format="pyarrow")
    return global_topk(partials, k)


def knn_lsh(
    embeddings: rd.Dataset,
    queries: np.ndarray,
    k: int = 10,
    n_planes: int = 10,
    seed: int = 11,
    id_column: str = "vec_id",
) -> pa.Table:
    """Approximate top-k: scan only vectors whose hyperplane bucket is
    within Hamming distance 1 of the query's bucket.  Same output schema
    as ``knn_brute_force``; recall < 1 by design (documented)."""
    q = _normalize(np.asarray(queries, dtype=np.float32))
    dim = q.shape[1]
    rng = np.random.RandomState(seed)
    planes = rng.randn(dim, n_planes).astype(np.float32)
    q_buckets = ((q @ planes) > 0).dot(1 << np.arange(n_planes)).astype(np.int64)
    probe_sets = []
    for b in q_buckets:
        probes = {int(b)}
        for i in range(n_planes):
            probes.add(int(b) ^ (1 << i))
        probe_sets.append(probes)
    wanted = set().union(*probe_sets)
    planes_ref, q_ref = ray.put(planes), ray.put(q)
    wanted_ref = ray.put(wanted)
    probes_ref = ray.put(probe_sets)

    def local(batch: pa.Table) -> pa.Table:
        pl, qm = ray.get(planes_ref), ray.get(q_ref)
        want, probes = ray.get(wanted_ref), ray.get(probes_ref)
        ids = np.asarray(batch.column(id_column).to_pylist(), dtype=np.int64)
        vecs = _normalize(np.asarray(batch.column("embedding").to_pylist(), dtype=np.float32))
        buckets = ((vecs @ pl) > 0).dot(1 << np.arange(pl.shape[1])).astype(np.int64)
        keep = np.isin(buckets, np.fromiter(want, dtype=np.int64))
        if not keep.any():
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        ids, vecs, buckets = ids[keep], vecs[keep], buckets[keep]
        sims = qm @ vecs.T
        qs, vs, ss = [], [], []
        for qi in range(qm.shape[0]):
            mask = np.isin(buckets, np.fromiter(probes[qi], dtype=np.int64))
            if not mask.any():
                continue
            cand = np.where(mask)[0]
            kk = min(k, len(cand))
            idx = cand[np.argpartition(-sims[qi, cand], kk - 1)[:kk]]
            qs.extend([qi] * kk)
            vs.extend(ids[idx].tolist())
            ss.extend(sims[qi, idx].astype(np.float64).tolist())
        return pa.table(
            {
                "query_id": pa.array(qs, pa.int64()),
                "vec_id": pa.array(vs, pa.int64()),
                "cosine": pa.array(ss, pa.float64()),
            }
        )

    partials = embeddings.map_batches(local, batch_format="pyarrow")
    return global_topk(partials, k)
