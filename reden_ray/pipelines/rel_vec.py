"""Embedding / vector / scalar-kernel queries (split from relational.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from ..stages.joins import broadcast_anti_join, broadcast_join, broadcast_semi_join, hash_join
from .rel_base import _read

def knn_dot_topk(sf_dir: str, n_queries: int = 3, k: int = 5) -> pa.Table:
    """top-k by DOT PRODUCT for the first ``n_queries`` vectors; returns
    (query_id, rank, vec_id).  Dot product (not cosine) keeps the oracle
    comparison integer-rank-only and float-rounding-proof; ties broken
    by vec_id."""
    # query vectors only (row-group-pruned read; n_queries rows reach
    # the driver, never the corpus — query_id == vec_id < n_queries)
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", n_queries)],
    )
    all_ids = np.asarray(t.column("vec_id").to_pylist())
    vecs = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    order = np.argsort(all_ids)
    queries = vecs[order]
    query_ids = all_ids[order].tolist()

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    # brute-force DOT top-k (no normalization): reuse local-topk pattern
    import ray

    q_ref = ray.put(queries.astype(np.float64))

    def local(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        m = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
        sims = qm @ m.T
        kk = min(k, sims.shape[1])
        qs, vs, ss = [], [], []
        for qi in range(sims.shape[0]):
            idx = np.argpartition(-sims[qi], kk - 1)[:kk]
            qs.extend([qi] * kk)
            vs.extend(ids[idx].tolist())
            ss.extend(sims[qi, idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(qs, pa.int64()),
                "vec_id": pa.array(vs, pa.int64()),
                "dot": pa.array(ss, pa.float64()),
            }
        )

    from ..stages.similarity import global_topk

    partials = emb.map_batches(local, batch_format="pyarrow")
    merged = global_topk(partials, k, score_col="dot", rank_base=1)
    # map positional qi back to the real query vec_id (identity here,
    # since query_id == vec_id for vec_id < n_queries, but keep it
    # explicit for non-prefix query selections)
    qids = pa.array(
        [int(query_ids[qi]) for qi in merged.column("query_id").to_pylist()],
        pa.int64(),
    )
    return merged.set_column(0, "query_id", qids).drop_columns("dot")


# --- webtext curation queries (stages/webtext.py) -------------------------

def f1_vector_norm(sf_dir: str) -> rd.Dataset:
    """L2 norm of the embedding list column — zero-copy Arrow list
    handling: flatten once, cast float32->float64 (the same cast the
    oracle applies BEFORE squaring), square, segment-sum via a prefix
    sum differenced at the list offsets (exact for empty segments
    anywhere — reduceat's clamped-index variant corrupted the segment
    PRECEDING a trailing empty list).  No per-row Python."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def norm(t: pa.Table) -> pa.Table:
        col = t.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = col.values.to_numpy(zero_copy_only=False)
        # offsets index the FULL child buffer; slice to this array's
        # window so sliced ListArrays stay correct (and cheap).
        base = int(offsets[0]) if len(offsets) else 0
        vals = flat[base : int(offsets[-1]) if len(offsets) else 0].astype(np.float64)
        sq = vals * vals
        cum = np.concatenate([[0.0], np.cumsum(sq)])
        sums = cum[offsets[1:] - base] - cum[offsets[:-1] - base]
        return pa.table(
            {
                "vec_id": t.column("vec_id"),
                "norm": pa.array(np.round(np.sqrt(sums), 4), pa.float64()),
            }
        )

    return emb.map_batches(norm, batch_format="pyarrow", batch_size=None)


def f2_string_funcs(sf_dir: str) -> rd.Dataset:
    """§2.8 scalar string kernels over customer names — all
    pyarrow.compute, no Python rows: upper, substring, length,
    reversed, concat-with-literal."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    def funcs(t: pa.Table) -> pa.Table:
        name = t.column("c_name")
        return pa.table(
            {
                "c_custkey": t.column("c_custkey").cast(pa.int64()),
                "upper_name": pc.utf8_upper(name),
                "prefix5": pc.utf8_slice_codeunits(name, 0, 5),
                "name_len": pc.utf8_length(name).cast(pa.int64()),
                "reversed": pc.utf8_reverse(name),
                "tagged": pc.binary_join_element_wise(
                    pa.array(["cust"] * t.num_rows), name, ":"
                ),
            }
        )

    return cust.map_batches(funcs, batch_format="pyarrow", batch_size=None)


def f3_date_parts(sf_dir: str) -> rd.Dataset:
    """§2.8 scalar date kernels over order dates: year / month / day /
    quarter extraction (engine-agnostic parts — day-of-week start
    conventions deliberately avoided)."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def parts(t: pa.Table) -> pa.Table:
        d = pc.cast(t.column("o_orderdate"), pa.timestamp("us"))
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey").cast(pa.int64()),
                "y": pc.year(d).cast(pa.int64()),
                "m": pc.month(d).cast(pa.int64()),
                "d": pc.day(d).cast(pa.int64()),
                "q": pc.quarter(d).cast(pa.int64()),
            }
        )

    return orders.map_batches(parts, batch_format="pyarrow", batch_size=None)


def kmeans_fixed_centroids(k: int = 4, dim: int = 64) -> np.ndarray:
    rng = np.random.RandomState(123)
    c = rng.standard_normal((k, dim))
    # embeddings are unit vectors; unit centroids give a balanced
    # 4-way split (138/129/117/116 on the sf0.01 fixture)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    return np.round(c, 4)


def kmeans_fixed_assign(sf_dir: str) -> rd.Dataset:
    """Nearest-centroid assignment against FIXED centroids -> cluster
    sizes.  This is exactly one Lloyd E-step (stages/kmeans.kmeans_assign)
    made SQL-checkable: argmin over squared L2 distance with first-index
    tie-break, which the oracle replays as an argmax over
    (e.c - |c|^2/2) scores with the same CASE order."""
    from ..stages.kmeans import kmeans_assign

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    cents = kmeans_fixed_centroids()
    return (
        kmeans_assign(emb, cents, id_column="vec_id", column="embedding")
        .groupby("cluster")
        .count()
        .map_batches(
            lambda t: pa.table(
                {
                    "cluster": t.column("cluster").cast(pa.int64()),
                    "n": t.column("count()").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def _centered_sums(
    ds: rd.Dataset, key: str, xcol: str, ycol: str
) -> tuple[rd.Dataset, dict]:
    """Per-group centered second-moment sums, two passes: tiny per-group
    means broadcast, then centered block partials, one small groupby.
    Returns (Dataset with columns ``key, sxy, sxx, syy, n``; means dict
    ``key -> (mx, my)``).  Two passes because the one-pass six-sum
    formula loses ~10 digits to cancellation at lineitem magnitudes —
    shared by a16_covar_stddev and a21_regr_by_group."""
    means = (
        ds.groupby(key)
        .aggregate(
            Mean(xcol, alias_name="mx"),
            Mean(ycol, alias_name="my"),
        )
        .take_all()
    )  # group-count rows (tiny by contract)
    m = {r[key]: (r["mx"], r["my"]) for r in means}
    import ray

    m_ref = ray.put(m)

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        mm = ray.get(m_ref)
        k = t.column(key).to_pylist()
        x = t.column(xcol).to_numpy(zero_copy_only=False)
        y = t.column(ycol).to_numpy(zero_copy_only=False)
        mx = np.array([mm[v][0] for v in k])
        my = np.array([mm[v][1] for v in k])
        dx, dy = x - mx, y - my
        df = pd.DataFrame(
            {"k": k, "sxy": dx * dy, "sxx": dx * dx, "syy": dy * dy, "n": 1}
        )
        g = df.groupby("k", as_index=False).sum()
        return pa.table(
            {
                key: pa.array(g.k, pa.string()),
                "sxy": pa.array(g.sxy, pa.float64()),
                "sxx": pa.array(g.sxx, pa.float64()),
                "syy": pa.array(g.syy, pa.float64()),
                "n": pa.array(g.n, pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(key)
        .aggregate(
            Sum("sxy", alias_name="sxy"), Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"), Sum("n", alias_name="n"),
        )
    )
    return agg, m


def f5_standardize(sf_dir: str) -> rd.Dataset:
    """Per-group z-score standardization of the event value — the
    feature-scaling staple of every training-data pipeline: ONE small
    groupby for (mean, sample std) per event_type, stats broadcast via
    ray.put, then a stateless vectorized map over the stream (no
    window shuffle — the SQL windowed form is the oracle, not the
    plan).  Std uses the centered two-pass sums for 6-dp parity with
    DuckDB's stddev_samp."""
    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    agg, means = _centered_sums(ev, "event_type", "value", "value")
    bundle = {
        r["event_type"]: (
            means[r["event_type"]][0],
            float(np.sqrt(r["sxx"] / (r["n"] - 1))),
        )
        for r in agg.take_all()
    }  # <= distinct-event-type rows
    import ray

    b_ref = ray.put(bundle)

    def z(t: pa.Table) -> pa.Table:
        bb = ray.get(b_ref)
        k = t.column("event_type").to_pylist()
        v = t.column("value").to_numpy(zero_copy_only=False)
        m = np.array([bb[x][0] for x in k])
        s = np.array([bb[x][1] for x in k])
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "zvalue": pa.array(np.round((v - m) / s, 6), pa.float64()),
            }
        )

    return ev.map_batches(z, batch_format="pyarrow", batch_size=None)


def f4_math_funcs(sf_dir: str) -> rd.Dataset:
    """Scalar math kernel family (sqrt/ln/exp/abs) over lineitem —
    vectorized numpy per batch, 4 dp rounding on both sides (libm ulp
    differences between numpy and DuckDB disappear at 4 dp on these
    magnitudes)."""
    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    )

    def f(t: pa.Table) -> pa.Table:
        qty = t.column("l_quantity").to_numpy(zero_copy_only=False).astype(np.float64)
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False).astype(np.float64)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False).astype(np.float64)
        tax = t.column("l_tax").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_linenumber": t.column("l_linenumber"),
                "sqrt_qty": pa.array(np.round(np.sqrt(qty), 4), pa.float64()),
                "ln_price": pa.array(np.round(np.log(price), 4), pa.float64()),
                "abs_disc": pa.array(np.round(np.abs(disc - 0.05), 4), pa.float64()),
                "exp_tax": pa.array(np.round(np.exp(tax), 4), pa.float64()),
            }
        )

    return li.map_batches(f, batch_format="pyarrow", batch_size=None)


def f6_dim_means(sf_dir: str) -> rd.Dataset:
    """Dimension-wise mean of the embedding column (the centroid
    statistic of embedding-space monitoring): zero-copy ListArray
    flatten -> (rows, dim) reshape -> per-block dim sums (dim rows per
    block, regardless of block size) -> one dim-sized groupby.  Sums
    run in float64 (the column is float32; DuckDB's avg also
    accumulates in double).  Oracle: constant generate_series(1, 64)
    cross join + list indexing."""
    emb = _read(sf_dir, "embeddings", ["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        col = t.column("embedding").combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        dim = len(flat) // max(t.num_rows, 1) if t.num_rows else 0
        if t.num_rows == 0 or dim == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "s": pa.array([], pa.float64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        m = flat.reshape(t.num_rows, dim)
        return pa.table(
            {
                "dim": pa.array(np.arange(dim, dtype=np.int64), pa.int64()),
                "s": pa.array(m.sum(axis=0), pa.float64()),
                "cnt": pa.array(np.full(dim, t.num_rows, dtype=np.int64), pa.int64()),
            }
        )

    agg = (
        emb.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("dim")
        .aggregate(Sum("s", alias_name="s"), Sum("cnt", alias_name="cnt"))
    )

    def finish(t: pa.Table) -> pa.Table:
        s = t.column("s").to_numpy(zero_copy_only=False)
        c = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "dim": t.column("dim"),
                "mean_v": pa.array(np.round(s / c, 6), pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


def f7_label_centroids(sf_dir: str) -> rd.Dataset:
    """Per-label embedding centroids (the grouped tensor aggregate of
    embedding-space monitoring): each block scatter-adds its vectors
    into a (labels x dims) partial via np.add.at — label-count x dim
    rows per block regardless of block size — then one small groupby.
    Oracle: constant generate_series + list index, GROUP BY label."""
    emb = _read(sf_dir, "embeddings", ["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "s": pa.array([], pa.float64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        lab = t.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        col = t.column("embedding").combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        dim = len(flat) // t.num_rows
        m = flat.reshape(t.num_rows, dim)
        uniq, inv, cnt = np.unique(lab, return_inverse=True, return_counts=True)
        sums = np.zeros((len(uniq), dim))
        np.add.at(sums, inv, m)
        nl = len(uniq)
        return pa.table(
            {
                "label": pa.array(np.repeat(uniq, dim), pa.int64()),
                "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), nl), pa.int64()),
                "s": pa.array(sums.ravel(), pa.float64()),
                "cnt": pa.array(np.repeat(cnt, dim), pa.int64()),
            }
        )

    agg = (
        emb.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["label", "dim"])
        .aggregate(Sum("s", alias_name="s"), Sum("cnt", alias_name="cnt"))
    )

    def finish(t: pa.Table) -> pa.Table:
        s = t.column("s").to_numpy(zero_copy_only=False)
        c = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "label": t.column("label").cast(pa.int64()),
                "dim": t.column("dim").cast(pa.int64()),
                "mean_v": pa.array(np.round(s / c, 6), pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


_COV_DIMS = 8


def emb_covariance(sf_dir: str) -> rd.Dataset:
    """Distributed covariance matrix over the first 8 embedding dims —
    the X^T X partial-sums pattern that PCA / whitening / Mahalanobis
    pipelines run at corpus scale: each block contributes ONE numpy
    matmul (d x d sums, d sums, n) re-shaped to d^2 partial rows; a
    64-row groupby combines; cov = E[xy] - E[x]E[y] (population).
    Nothing corpus-sized ever leaves the blocks."""
    emb = _read(sf_dir, "embeddings", ["embedding"])
    d = _COV_DIMS
    ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")

    def partial(t: pa.Table) -> pa.Table:
        col = t.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = col.values.to_numpy(zero_copy_only=False)
        dim = int(offsets[1] - offsets[0]) if len(offsets) > 1 else 0
        if not np.all(np.diff(offsets) == dim):  # fail loudly on ragged rows
            raise ValueError("emb_covariance requires fixed-dim embeddings")
        mat = (
            flat[offsets[0]: offsets[-1]]
            .astype(np.float64)
            .reshape(-1, dim)[:, :d]
        )
        n = mat.shape[0]
        xtx = mat.T @ mat
        sx = mat.sum(axis=0)
        return pa.table(
            {
                "i": pa.array(ii.ravel(), pa.int64()),
                "j": pa.array(jj.ravel(), pa.int64()),
                "sxy": pa.array(xtx.ravel(), pa.float64()),
                "sxi": pa.array(np.repeat(sx, d), pa.float64()),
                "sxj": pa.array(np.tile(sx, d), pa.float64()),
                "n": pa.array(np.full(d * d, n, dtype=np.int64)),
            }
        )

    agg = (
        emb.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["i", "j"])
        .aggregate(
            Sum("sxy", alias_name="sxy"),
            Sum("sxi", alias_name="sxi"),
            Sum("sxj", alias_name="sxj"),
            Sum("n", alias_name="n"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        sxy = t.column("sxy").to_numpy(zero_copy_only=False)
        sxi = t.column("sxi").to_numpy(zero_copy_only=False)
        sxj = t.column("sxj").to_numpy(zero_copy_only=False)
        cov = sxy / n - (sxi / n) * (sxj / n)
        return pa.table(
            {
                "i": t.column("i").cast(pa.int64()),
                "j": t.column("j").cast(pa.int64()),
                "cov": pa.array(np.round(cov, 6), pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


def emb_quantize_error(sf_dir: str) -> rd.Dataset:
    """Int8 vector quantization + reconstruction-error audit — the
    compression step vector stores apply before ANN serving (scale =
    per-DIMENSION max |x| over the corpus; q = round(x * 127 / scale);
    err = max_dim |x - q * scale / 127|).  Two streaming passes: per-
    block |x| max partials -> one 64-row dim groupby (broadcast back as
    a numpy row); then a stateless vectorized quantize/dequantize map.
    Rounding is half-AWAY on both sides (np.round is half-even and
    DuckDB ROUND is not; sign-split floor(|x|+0.5) matches)."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def _mat(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        col = t.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = col.values.to_numpy(zero_copy_only=False)
        dim = int(offsets[1] - offsets[0]) if len(offsets) > 1 else 0
        if not np.all(np.diff(offsets) == dim):  # fail loudly on ragged rows
            raise ValueError("emb_quantize_error requires fixed-dim embeddings")
        mat = flat[offsets[0]: offsets[-1]].astype(np.float64).reshape(-1, dim)
        return mat, offsets

    def absmax_partial(t: pa.Table) -> pa.Table:
        mat, _ = _mat(t)
        am = np.abs(mat).max(axis=0)
        return pa.table(
            {
                "dim": pa.array(np.arange(len(am)), pa.int64()),
                "am": pa.array(am, pa.float64()),
            }
        )

    scale_rows = (
        emb.map_batches(absmax_partial, batch_format="pyarrow", batch_size=None)
        .groupby("dim")
        .aggregate(Max("am", alias_name="am"))
        .take_all()  # <= dim rows
    )
    scale = np.empty(len(scale_rows), dtype=np.float64)
    for r in scale_rows:
        scale[r["dim"]] = r["am"] if r["am"] > 0 else 1.0

    def quant_err(t: pa.Table) -> pa.Table:
        mat, _ = _mat(t)
        if mat.shape[1] != len(scale):  # cross-BLOCK raggedness
            raise ValueError(
                "emb_quantize_error requires fixed-dim embeddings "
                f"(block dim {mat.shape[1]} != corpus dim {len(scale)})"
            )
        x = mat * (127.0 / scale)
        q = np.sign(x) * np.floor(np.abs(x) + 0.5)  # half-away, like DuckDB
        q = np.clip(q, -127, 127)
        err = np.abs(mat - q * (scale / 127.0)).max(axis=1)
        return pa.table(
            {
                "vec_id": t.column("vec_id").cast(pa.int64()),
                "max_err": pa.array(np.floor(err * 1e6 + 0.5) / 1e6, pa.float64()),
            }
        )

    return emb.map_batches(quant_err, batch_format="pyarrow", batch_size=None)




def emb_fd_sketch(sf_dir: str) -> pa.Table:
    """Frequent-Directions matrix sketch over the embedding column
    (stages/fd.py), DRIVER-ORACLED via the sketch's self-carried
    certificate: FD guarantees 0 <= x'(A'A - B'B)x <= sum(shrink
    deltas) for every unit x, and the query CHECKS both sides against
    the exact Gram matrix (reconstructed from the streaming d^2
    covariance partials — one bounded pass) by eigendecomposition.
    Emits the exact per-dimension sum of squares (diag of the Gram)
    plus ``bound_ok``; the DuckDB oracle recomputes the diagonal and
    TRUE — a violated FD bound hash-fails the gate."""
    from ..stages.fd import frequent_directions
    from ..stages.pca import covariance_and_mean

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    b, delta_sum = frequent_directions(emb, "embedding", ell=16)
    cov, mean, n = covariance_and_mean(emb, "embedding")
    gram = (cov + np.outer(mean, mean)) * n
    g = gram - (b.T @ b if b.size else np.zeros_like(gram))
    ev = np.linalg.eigvalsh(g)
    tol = 1e-8 * float(np.trace(gram)) + 1e-9
    ok = bool(ev[0] >= -tol and ev[-1] <= delta_sum + tol)
    ss = np.diag(gram)
    return pa.table(
        {
            "dim": pa.array(np.arange(1, len(ss) + 1, dtype=np.int64)),
            "ss": pa.array(np.floor(ss * 1e4 + 0.5) / 1e4, pa.float64()),
            "bound_ok": pa.array([ok] * len(ss), pa.bool_()),
        }
    )
