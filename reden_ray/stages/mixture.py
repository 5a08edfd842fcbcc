"""Deterministic data-mixture sampling — drawing a per-source token
budget out of a curated corpus, the step that turns source weights into
an actual pretraining mixture.

Selection rule (fully deterministic, no RNG state to ship): within each
source, documents are ranked by ``LE64(md5(source:doc_id)[0:8])`` — a
uniform, SQL-replayable permutation (DuckDB ``md5_number_upper``) — and
taken in rank order while the tokens consumed so far are under the
source's budget (the boundary-crossing doc is included: selection is
``tokens_before < budget``).  Token counts come from the shared
ws-token kernel (``TokenStats``), so the budget unit matches every
other oracled text query.

Scale shape: the rank hash is uniform, so the grouped running sum uses
the same two-pass trick as ``stages.scan.ordered_prefix_sum`` — a
vectorized per-block partial pass over (source, rank-bucket) cells
(bounded: n_sources x 256 rows reach the driver), broadcast offsets,
then ONE groupby over (source, bucket) whose in-group scan is
numpy-vectorized.  Nothing corpus-sized ever reaches the driver, and
the per-group unit is 1/256th of a source — re-bucket with
``n_buckets`` if a single source is node-sized."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


def _rank_keys(sources: np.ndarray, ids: np.ndarray) -> np.ndarray:
    md5 = hashlib.md5
    return np.fromiter(
        (
            int.from_bytes(md5(f"{s}:{i}".encode()).digest()[:8], "little")
            for s, i in zip(sources, ids)
        ),
        dtype=np.uint64,
        count=len(ids),
    )


def mixture_sample(
    docs: rd.Dataset,
    budgets: dict[str, int] | int,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    n_buckets: int = 256,
) -> rd.Dataset:
    """Select documents per source under a token budget.

    ``budgets``: either one budget for every source or a per-source
    dict (missing sources get budget 0 — dropped).  Output columns:
    id, source, ``n_tokens``, ``tokens_before`` (tokens taken from the
    source before this doc in rank order) — integer-only."""
    from .textstats import TokenStats

    uniform = budgets if isinstance(budgets, int) else None
    bmap = None if uniform is not None else dict(budgets)
    shift = np.uint64(64 - max(1, (n_buckets - 1).bit_length()))
    counted = docs.map_batches(TokenStats, batch_format="pyarrow", concurrency=(1, 4))

    def keyed(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("n_tokens_ws"), 0))
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        srcs = np.asarray(t.column(source_col).to_pylist(), dtype=object)
        keys = _rank_keys(srcs, ids)
        return pa.table(
            {
                id_col: pa.array(ids),
                source_col: t.column(source_col),
                "n_tokens": t.column("n_tokens_ws").cast(pa.int64()),
                # int64 REINTERPRET of the uint64 key: buckets never
                # straddle 2^63 (the 128*2^56 boundary), so within a
                # bucket int64 order == unsigned order == SQL UBIGINT
                "rank_key": pa.array(keys.view(np.int64)),
                "bucket": pa.array((keys >> shift).astype(np.int64)),
            }
        )

    keyed_ds = counted.map_batches(keyed, batch_format="pyarrow", batch_size=None)

    def partial(t: pa.Table) -> pa.Table:
        g = (
            t.select([source_col, "bucket", "n_tokens"])
            .group_by([source_col, "bucket"])
            .aggregate([("n_tokens", "sum")])
        )
        return g.rename_columns([source_col, "bucket", "s"])

    cells = (
        keyed_ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby([source_col, "bucket"])
        .sum("s")
        .take_all()
    )  # bounded: n_sources x n_buckets
    cells.sort(key=lambda r: (r[source_col], r["bucket"]))
    offsets: dict[tuple, int] = {}
    run: dict[str, int] = {}
    for r in cells:
        s = r[source_col]
        offsets[(s, int(r["bucket"]))] = run.get(s, 0)
        run[s] = run.get(s, 0) + int(r["sum(s)"])
    off_ref = ray.put(offsets)

    def scan(g: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        s = g.column(source_col)[0].as_py()
        b = int(g.column("bucket")[0].as_py())
        budget = uniform if uniform is not None else bmap.get(s, 0)
        order = pc.sort_indices(
            g, sort_keys=[("rank_key", "ascending"), (id_col, "ascending")]
        )
        g = g.take(order)
        n = g.column("n_tokens").to_numpy(zero_copy_only=False)
        before = off[(s, b)] + np.concatenate([[0], np.cumsum(n)[:-1]]).astype(np.int64)
        keep = before < budget
        g = g.append_column("tokens_before", pa.array(before, pa.int64()))
        return g.filter(pa.array(keep)).select(
            [id_col, source_col, "n_tokens", "tokens_before"]
        )

    return keyed_ds.groupby([source_col, "bucket"]).map_groups(
        scan, batch_format="pyarrow"
    )
