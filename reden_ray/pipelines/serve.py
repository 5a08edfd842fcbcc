"""Serve-ready corpus composite: the last mile of a curation stack
before a trainer reads it — exact dedup keeping the best-quality copy,
a per-source quality-quantile cut, and a deterministic epoch shuffle
rank, fused into one streaming chain.

Stage order matters and is part of the contract (mirrored verbatim by
the ``serve_ready_corpus`` DuckDB oracle):

1. score every doc with the broadcast hashed linear model
   (:mod:`reden_ray.stages.scoring`), hash the body, and drop it —
   bodies never shuffle;
2. exact dedup per text hash, keep (score DESC, doc_id ASC) first;
3. per-source threshold = k-th largest score among the SURVIVORS
   (k = ceil(top_frac * n_source)), from a score-domain-sized
   histogram; keep ``score >= threshold``;
4. epoch-seeded md5 rank over the kept docs (the
   :mod:`reden_ray.stages.ordering` grouped two-pass scan, with the
   quality columns carried through).

Everything the driver ever holds is bounded: one histogram
(n_sources x distinct integer scores) and one bucket-count table
(<= n_buckets rows).  Output: (doc_id, source, score, threshold,
train_rank) — a 1-based permutation of the kept set.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..stages.ordering import _epoch_keys
from ..stages.partition import part_column
from ..stages.scoring import HashedLinearScorer, hash_weights
from ..stages.webtext import _default_span_parts


def _first_per_hash(t: pa.Table, id_column: str) -> pa.Table:
    idx = pc.sort_indices(
        t,
        sort_keys=[
            ("__h", "ascending"),
            ("score", "descending"),
            (id_column, "ascending"),
        ],
    )
    t = t.take(idx)
    hh = t.column("__h").to_numpy(zero_copy_only=False)
    first = np.ones(len(hh), bool)
    first[1:] = hh[1:] != hh[:-1]
    return t.filter(pa.array(first))


def serve_ready_corpus(
    docs: rd.Dataset,
    top_frac: float = 0.25,
    epoch: int = 1,
    dim: int = 1024,
    n_buckets: int = 256,
    id_column: str = "doc_id",
    text_column: str = "text",
    source_column: str = "source",
) -> rd.Dataset:
    """Dedup -> quality cut -> epoch rank (see module doc)."""
    wref = ray.put(hash_weights(dim))
    b2 = hashlib.blake2b
    n_parts = _default_span_parts()

    # -- stage 1+2a: score, hash body, drop body, block-local first
    def score_hash(t: pa.Table) -> pa.Table:
        scorer = HashedLinearScorer(
            wref, dim=dim, id_column=id_column, text_column=text_column
        )
        s = scorer(t).drop_columns("keep")
        s = s.append_column(source_column, t.column(source_column))
        h = np.fromiter(
            (
                int.from_bytes(b2((x or "").encode(), digest_size=8).digest(), "little")
                for x in t.column(text_column).to_pylist()
            ),
            dtype=np.uint64,
            count=t.num_rows,
        ).view(np.int64)
        s = s.append_column("__h", pa.array(h))
        s = _first_per_hash(s, id_column)
        return s.append_column("__part", part_column(s, ["__h"], n_parts))

    def reduce_dedup(g: pa.Table) -> pa.Table:
        return _first_per_hash(g.drop_columns("__part"), id_column).drop_columns("__h")

    survivors = (
        docs.map_batches(score_hash, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(reduce_dedup, batch_format="pyarrow")
    )

    # -- stage 3: per-source k-th-largest threshold from the histogram
    def hist_partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {source_column: t.column(source_column), "score": t.column("score")}
            )
            .append_column("n", pa.array(np.ones(t.num_rows, np.int64)))
            .group_by([source_column, "score"])
            .aggregate([("n", "sum")])
        )
        return g.rename_columns([source_column, "score", "n"])

    hist = (
        survivors.map_batches(hist_partial, batch_format="pyarrow", batch_size=None)
        .groupby([source_column, "score"])
        .sum("n")
        .take_all()
    )  # bounded: n_sources x distinct integer scores
    by_src: dict[str, list[tuple[int, int]]] = {}
    totals: dict[str, int] = {}
    for r in hist:
        s = r[source_column]
        by_src.setdefault(s, []).append((int(r["score"]), int(r["sum(n)"])))
        totals[s] = totals.get(s, 0) + int(r["sum(n)"])
    thresholds: dict[str, int] = {}
    for s, cells in by_src.items():
        need = int(np.ceil(top_frac * totals[s]))
        run = 0
        for sc, n in sorted(cells, reverse=True):
            run += n
            if run >= need:
                thresholds[s] = sc
                break
    thr_ref = ray.put(thresholds)

    shift = np.uint64(64 - max(1, (n_buckets - 1).bit_length()))

    def cut_and_key(t: pa.Table) -> pa.Table:
        thr = ray.get(thr_ref)
        srcs = t.column(source_column).to_pylist()
        sc = t.column("score").to_numpy(zero_copy_only=False)
        lim = np.fromiter(
            (thr.get(s, np.iinfo(np.int64).max) for s in srcs),
            dtype=np.int64,
            count=len(srcs),
        )
        t = t.filter(pa.array(sc >= lim))
        t = t.append_column(
            "threshold",
            pa.array(
                [thr[s] for s in t.column(source_column).to_pylist()], pa.int64()
            ),
        )
        ids = t.column(id_column).to_numpy(zero_copy_only=False).astype(np.int64)
        keys = _epoch_keys(epoch, ids)
        t = t.append_column("__key", pa.array(keys.view(np.int64)))
        return t.append_column("__bucket", pa.array((keys >> shift).astype(np.int64)))

    keyed = survivors.map_batches(cut_and_key, batch_format="pyarrow", batch_size=None)

    # -- stage 4: grouped two-pass rank scan (stages/ordering.py shape)
    def count_partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"__bucket": t.column("__bucket")})
            .append_column("n", pa.array(np.ones(t.num_rows, np.int64)))
            .group_by("__bucket")
            .aggregate([("n", "sum")])
        )
        return g.rename_columns(["__bucket", "n"])

    cells = (
        keyed.map_batches(count_partial, batch_format="pyarrow", batch_size=None)
        .groupby("__bucket")
        .sum("n")
        .take_all()
    )  # bounded: <= n_buckets rows
    cells.sort(key=lambda r: int(r["__bucket"]))
    offsets: dict[int, int] = {}
    run = 0
    for r in cells:
        offsets[int(r["__bucket"])] = run
        run += int(r["sum(n)"])
    off_ref = ray.put(offsets)

    def rank_group(g: pa.Table) -> pa.Table:
        off = ray.get(off_ref)[int(g.column("__bucket")[0].as_py())]
        order = pc.sort_indices(
            g, sort_keys=[("__key", "ascending"), (id_column, "ascending")]
        )
        g = g.take(order).drop_columns(["__key", "__bucket"])
        return g.append_column(
            "train_rank", pa.array(off + 1 + np.arange(g.num_rows, dtype=np.int64))
        )

    return keyed.groupby("__bucket").map_groups(rank_group, batch_format="pyarrow")
