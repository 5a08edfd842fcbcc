"""IO round-trip and layout queries (split from relational.py)."""

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

def io_jsonl_roundtrip(sf_dir: str) -> rd.Dataset:
    """JSONL sink + source bridge: stream documents out as sharded
    line-delimited JSON (`Dataset.write_json` — the interchange format
    every webtext corpus ships in), read the shards back with
    `read_json`, and aggregate per language.  The oracle aggregates the
    parquet directly, so a hash match proves the round trip is
    lossless for (int64, string) payloads.  Scratch shards go under
    /tmp in a fresh directory per call (write_json into a reused dir
    would double-read stale shards)."""
    import shutil
    import tempfile

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    tmp = tempfile.mkdtemp(prefix="reden_io_jsonl_")
    try:
        docs.write_json(tmp)
        back = rd.read_json(tmp)
        out = (
            back.groupby("lang")
            .aggregate(
                Count(alias_name="n_docs"),
                Sum("n_chars", alias_name="total_chars"),
            )
            .materialize()  # consume the shards before they are removed
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out.map_batches(
        lambda t: pa.table(
            {
                "lang": t.column("lang"),
                "n_docs": t.column("n_docs").cast(pa.int64()),
                "total_chars": t.column("total_chars").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )


def io_csv_roundtrip(sf_dir: str) -> rd.Dataset:
    """CSV sink + source bridge (`Dataset.write_csv` / `read_csv`),
    same contract as io_jsonl_roundtrip: orders stream out as sharded
    CSV, back in, aggregated per status; hash match vs the parquet
    oracle proves losslessness for the int/string payload (floats are
    deliberately excluded — CSV float text round-trips are not
    bit-exact by construction)."""
    import shutil
    import tempfile

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
    tmp = tempfile.mkdtemp(prefix="reden_io_csv_")
    try:
        orders.write_csv(tmp)
        back = rd.read_csv(tmp)
        out = (
            back.groupby("o_orderstatus")
            .aggregate(
                Count(alias_name="n_orders"),
                Sum("o_orderkey", alias_name="keysum"),
            )
            .materialize()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out.map_batches(
        lambda t: pa.table(
            {
                "o_orderstatus": t.column("o_orderstatus"),
                "n_orders": t.column("n_orders").cast(pa.int64()),
                "keysum": t.column("keysum").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )


def zorder_layout(sf_dir: str) -> rd.Dataset:
    """Z-order (Morton) layout key — the space-filling-curve sort that
    co-locates rows close in BOTH join keys so min/max row-group stats
    prune 2-D range scans (the Delta/Iceberg OPTIMIZE ZORDER idea).
    16-bit lanes here (fixture keys < 2^16; production uses 32-bit
    lanes, same shift arithmetic).  The interleave is pure vectorized
    int64 bit math; the global top-20 never sorts the corpus — per-block
    partial top-k, then one small merge sort (the o1 shape)."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"])
    k = 20

    def zkey_topk(t: pa.Table) -> pa.Table:
        p = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        s = t.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        z = np.zeros(len(p), dtype=np.int64)
        for b in range(16):
            z |= ((p >> b) & 1) << (2 * b)
            z |= ((s >> b) & 1) << (2 * b + 1)
        tt = pa.table(
            {
                "l_orderkey": t.column("l_orderkey").cast(pa.int64()),
                "l_linenumber": t.column("l_linenumber").cast(pa.int64()),
                "zkey": pa.array(z, pa.int64()),
            }
        )
        idx = pc.sort_indices(
            tt,
            sort_keys=[
                ("zkey", "ascending"),
                ("l_orderkey", "ascending"),
                ("l_linenumber", "ascending"),
            ],
        )
        return tt.take(idx[:k])

    partials = li.map_batches(zkey_topk, batch_format="pyarrow", batch_size=None)
    return partials.sort(["zkey", "l_orderkey", "l_linenumber"]).limit(k)


_KNUTH = 2654435761

_MOD32 = 4294967296


def mix_sources_balanced(sf_dir: str) -> rd.Dataset:
    """Domain mixing / source rebalancing — the Pile/Dolma-style
    \"sample each domain toward target proportions\" step of a training
    mix.  Equal target weights here: every source is deterministically
    downsampled toward the SMALLEST source's size (rate_s = min_n /
    n_s) with the o10 Knuth multiplicative hash, so the selection is
    reproducible row-by-row on both sides and needs no shuffle at all:
    per-source counts are one tiny groupby; the selection itself is a
    stateless vectorized filter over the stream."""
    docs = _read(sf_dir, "documents", ["doc_id", "source"])
    cnt = docs.groupby("source").count().take_all()  # dimension-sized rows
    min_n = min(r["count()"] for r in cnt)
    # threshold_s = round_half_away(rate_s * 2^32), matching DuckDB's
    # double->BIGINT cast
    thr = {
        r["source"]: int(np.floor(min_n / r["count()"] * _MOD32 + 0.5))
        for r in cnt
    }

    def pick(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        src = t.column("source").to_numpy(zero_copy_only=False)
        h = (did * _KNUTH) % _MOD32
        lim = np.array([thr[s] for s in src], dtype=np.int64)
        return t.filter(pa.array(h < lim))

    return docs.map_batches(pick, batch_format="pyarrow", batch_size=None)


def split_train_val_test(sf_dir: str) -> rd.Dataset:
    """Deterministic 80/10/10 train/val/test split by key hash — the
    canonical leakage-safe split (same doc always lands in the same
    split, regardless of partitioning or cluster size).  Output is the
    (source, split, n_docs) audit table; the assignment itself is a
    stateless vectorized map."""
    docs = _read(sf_dir, "documents", ["doc_id", "source"])
    t80 = int(np.floor(0.8 * _MOD32 + 0.5))
    t90 = int(np.floor(0.9 * _MOD32 + 0.5))

    def assign(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        h = (did * _KNUTH) % _MOD32
        split = np.where(h < t80, "train", np.where(h < t90, "val", "test"))
        tt = pa.table(
            {"source": t.column("source"), "split": pa.array(split, pa.string())}
        )
        g = tt.group_by(["source", "split"]).aggregate([([], "count_all")])
        return g.rename_columns(["source", "split", "n"])

    return (
        docs.map_batches(assign, batch_format="pyarrow", batch_size=None)
        .groupby(["source", "split"])
        .aggregate(Sum("n", alias_name="n_docs"))
    )


def io_partitioned_write(sf_dir: str) -> rd.Dataset:
    """Hive-partitioned parquet sink + partition-pruned re-read — the
    resumable-output layout this engine writes at scale (one directory
    per key so a failed run skips finished partitions, and a reader
    interested in one key touches one directory).  Documents are
    written partitioned by ``lang``, a SINGLE partition directory is
    then re-read (path-level pruning: the other partitions' bytes are
    never opened), and per-source stats over that slice are oracled
    against the parquet directly — a hash match proves the partitioned
    round trip is lossless AND the pruning reads exactly the one
    partition."""
    import shutil
    import tempfile

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "source", "n_chars"])
    tmp = tempfile.mkdtemp(prefix="reden_io_part_")
    try:
        docs.write_parquet(tmp, partition_cols=["lang"])
        # partition-pruned read: ONLY the lang=en directory
        back = rd.read_parquet(f"{tmp}/lang=en")
        out = (
            back.groupby("source")
            .aggregate(
                Count(alias_name="n_docs"),
                Sum("n_chars", alias_name="total_chars"),
            )
            .materialize()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out.map_batches(
        lambda t: pa.table(
            {
                "source": t.column("source"),
                "n_docs": t.column("n_docs").cast(pa.int64()),
                "total_chars": t.column("total_chars").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )



def inverted_index_postings(sf_dir: str) -> rd.Dataset:
    """Build the sharded inverted text index (stages/invindex.py) over
    documents into a scratch dir, then RE-READ THE WRITTEN BYTES and
    return (term, df, total_tf, postings) — the hash gate verifies the
    index artifact itself (the token_shards_manifest discipline), with
    postings serialized "doc:tf,..." sorted by doc_id so DuckDB's
    ordered string_agg replays them exactly."""
    import shutil
    import tempfile

    from ..stages.invindex import build_inverted_index, read_index

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    tmp = tempfile.mkdtemp(prefix="reden_invidx_")
    try:
        build_inverted_index(docs, tmp, num_shards=8)
        out = read_index(tmp).materialize()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def index_search_and(sf_dir: str) -> rd.Dataset:
    """Conjunctive (AND) search through the written index: top-10
    documents containing BOTH 'dup' and 'data', score = summed tf,
    ties by doc_id — reads only the shards the two terms hash to
    (path-level pruning), postings intersected document-at-a-time."""
    import shutil
    import tempfile

    from ..stages.invindex import build_inverted_index, search_and

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    tmp = tempfile.mkdtemp(prefix="reden_invidx_")
    try:
        build_inverted_index(docs, tmp, num_shards=8)
        out = search_and(tmp, ["dup", "data"], k=10, num_shards=8).materialize()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out

def io_zonemap_prune(sf_dir: str) -> rd.Dataset:
    """Zone-map data skipping (stages/zonemap.py): lineitem is written
    range-clustered on l_shipdate into 16 files, the min/max manifest
    is built FROM THE WRITTEN FOOTERS (metadata-only), and a one-year
    scan reads only the overlapping files + an exact residual filter.
    The gate hash-compares the pruned scan's aggregate against plain
    filtered SQL over the source table — a zone map may change which
    bytes are read, never the answer; the files-actually-skipped
    behavior is pinned in tests/test_zonemap.py and measured in
    SCALE.md."""
    import datetime
    import shutil
    import tempfile

    from ..stages.zonemap import pruned_read, write_clustered

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate", "l_quantity"])
    tmp = tempfile.mkdtemp(prefix="reden_zonemap_")
    try:
        write_clustered(li, tmp, "l_shipdate", num_files=16)
        lo = datetime.datetime(1997, 1, 1)
        hi = datetime.datetime(1997, 12, 31, 23, 59, 59, 999999)
        ds, n_read, n_total = pruned_read(tmp, "l_shipdate", lo, hi)
        if ds is None:
            out = rd.from_arrow(
                pa.table(
                    {
                        "n_rows": pa.array([0], pa.int64()),
                        "n_orders": pa.array([0], pa.int64()),
                        "sum_qty": pa.array([0.0], pa.float64()),
                    }
                )
            ).materialize()
        else:
            def partial(t: pa.Table) -> pa.Table:
                q = t.column("l_quantity").to_numpy(zero_copy_only=False)
                o = t.column("l_orderkey").to_numpy(zero_copy_only=False)
                return pa.table(
                    {
                        "n_rows": pa.array([t.num_rows], pa.int64()),
                        "o": pa.array([int(np.unique(o).size)], pa.int64()),
                        "sum_qty": pa.array([float(q.sum())], pa.float64()),
                    }
                )

            # n_orders needs a true distinct (orders straddle files):
            # one tiny groupby over the pruned slice
            n_orders = (
                ds.groupby("l_orderkey").count().count()
            )
            agg = ds.map_batches(
                partial, batch_format="pyarrow", batch_size=None
            ).aggregate(Sum("n_rows", alias_name="n_rows"), Sum("sum_qty", alias_name="sum_qty"))
            out = rd.from_arrow(
                pa.table(
                    {
                        "n_rows": pa.array([int(agg["n_rows"])], pa.int64()),
                        "n_orders": pa.array([int(n_orders)], pa.int64()),
                        "sum_qty": pa.array(
                            [round(float(agg["sum_qty"]), 2)], pa.float64()
                        ),
                    }
                )
            ).materialize()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out

def search_curated_corpus(sf_dir: str) -> rd.Dataset:
    """END-TO-END serving composite: quality-aware exact dedup
    (identical texts keep the best-scoring copy; bodies never
    shuffle) -> quality cut (linear hashed-BoW score > 0) -> sharded
    inverted-index build over the survivors (artifact written to
    scratch) -> conjunctive search ('dup' AND 'data', tf-sum top-10)
    against the WRITTEN index bytes.  Every stage is an
    already-oracled primitive; the composite chains their CTEs into
    one DuckDB statement, the two-run-composite discipline the linker
    family uses."""
    import shutil
    import tempfile

    from ..stages.invindex import build_inverted_index, search_and
    from ..stages.joins import shuffle_semi_join
    from ..stages.scoring import dedup_keep_best

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    winners = dedup_keep_best(docs)
    kept = winners.map_batches(
        lambda t: t.filter(
            pc.greater(t.column("score"), pa.scalar(0))
        ).select(["doc_id"]),
        batch_format="pyarrow",
        batch_size=None,
    )
    survivors = shuffle_semi_join(docs, kept, on=["doc_id"])
    tmp = tempfile.mkdtemp(prefix="reden_search_corpus_")
    try:
        build_inverted_index(survivors, tmp, num_shards=8)
        out = search_and(tmp, ["dup", "data"], k=10, num_shards=8).materialize()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out
