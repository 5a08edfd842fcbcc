"""Corpus audit reports — the "datasheet" numbers a curation run ships
with: per-source attrition through the dedup + quality gates, and the
token-length distribution.

``curation_report``: for every source, ``n_docs`` (raw), ``n_unique``
(after keep-best exact dedup — a cross-source duplicate is credited to
the surviving copy's source, same convention as
:func:`reden_ray.pipelines.serve.serve_ready_corpus`), and ``n_kept``
(above the per-source score-quantile threshold computed over the
survivors).  Only bounded aggregates move: per-source counts and the
score histogram.

``length_histogram``: power-of-two token-length buckets
(``bucket = floor(log2(n))``, ``-1`` for empty docs) with doc counts —
log2 is exact at powers of two in both numpy and DuckDB, and never
lands on a rounding half elsewhere, so the float is safe.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


def curation_report(
    docs: rd.Dataset,
    top_frac: float = 0.25,
    dim: int = 1024,
    id_column: str = "doc_id",
    text_column: str = "text",
    source_column: str = "source",
) -> rd.Dataset:
    """(source, n_docs, n_unique, n_kept) — attrition per source."""
    from ..pipelines.serve import serve_ready_corpus

    def count_by_source(ds: rd.Dataset, name: str) -> dict[str, int]:
        """Bounded driver collect: one row per source (domain-sized,
        the rel_io.mix_sources convention)."""

        def partial(t: pa.Table) -> pa.Table:
            g = (
                pa.table({source_column: t.column(source_column)})
                .append_column("n", pa.array(np.ones(t.num_rows, np.int64)))
                .group_by(source_column)
                .aggregate([("n", "sum")])
            )
            return g.rename_columns([source_column, name])

        rows = (
            ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby(source_column)
            .sum(name)
            .take_all()
        )  # bounded: source-domain-sized
        return {r[source_column]: int(r[f"sum({name})"]) for r in rows}

    # serve_ready_corpus already fuses score -> dedup -> threshold; its
    # output is the kept set.  Recompute the survivors census with the
    # same components.
    import hashlib
    import ray
    from ..stages.partition import part_column
    from ..stages.webtext import _default_span_parts
    from ..stages.scoring import HashedLinearScorer, hash_weights
    import pyarrow.compute as pc

    wref = ray.put(hash_weights(dim))
    b2 = hashlib.blake2b
    n_parts = _default_span_parts()

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
        idx = pc.sort_indices(
            s,
            sort_keys=[
                ("__h", "ascending"),
                ("score", "descending"),
                (id_column, "ascending"),
            ],
        )
        s = s.take(idx)
        hh = s.column("__h").to_numpy(zero_copy_only=False)
        first = np.ones(len(hh), bool)
        first[1:] = hh[1:] != hh[:-1]
        s = s.filter(pa.array(first))
        return s.append_column("__part", part_column(s, ["__h"], n_parts))

    def reduce_dedup(g: pa.Table) -> pa.Table:
        g = g.drop_columns("__part")
        idx = pc.sort_indices(
            g,
            sort_keys=[
                ("__h", "ascending"),
                ("score", "descending"),
                (id_column, "ascending"),
            ],
        )
        g = g.take(idx)
        hh = g.column("__h").to_numpy(zero_copy_only=False)
        first = np.ones(len(hh), bool)
        first[1:] = hh[1:] != hh[:-1]
        return g.filter(pa.array(first)).drop_columns("__h")

    survivors = (
        docs.map_batches(score_hash, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(reduce_dedup, batch_format="pyarrow")
    )
    kept = serve_ready_corpus(
        docs,
        top_frac=top_frac,
        dim=dim,
        id_column=id_column,
        text_column=text_column,
        source_column=source_column,
    )

    raw_c = count_by_source(docs.select_columns([source_column]), "n_docs")
    uniq_c = count_by_source(survivors, "n_unique")
    kept_c = count_by_source(kept, "n_kept")

    srcs = sorted(raw_c)
    return rd.from_arrow(
        pa.table(
            {
                source_column: pa.array(srcs, pa.string()),
                "n_docs": pa.array([raw_c[s] for s in srcs], pa.int64()),
                "n_unique": pa.array([uniq_c.get(s, 0) for s in srcs], pa.int64()),
                "n_kept": pa.array([kept_c.get(s, 0) for s in srcs], pa.int64()),
            }
        )
    )


def length_histogram(
    docs: rd.Dataset,
    text_column: str = "text",
) -> rd.Dataset:
    """(bucket, n_docs): bucket = floor(log2(n_tokens)), -1 for 0."""

    def partial(t: pa.Table) -> pa.Table:
        buckets = []
        for x in t.column(text_column).to_pylist():
            n = len((x or "").split())
            buckets.append(int(np.floor(np.log2(n))) if n > 0 else -1)
        g = (
            pa.table({"bucket": pa.array(buckets, pa.int64())})
            .append_column("n", pa.array(np.ones(len(buckets), np.int64)))
            .group_by("bucket")
            .aggregate([("n", "sum")])
        )
        return g.rename_columns(["bucket", "n_docs"])

    return (
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("bucket")
        .sum("n_docs")
        .map_batches(
            lambda t: t.rename_columns(["bucket", "n_docs"]),
            batch_format="pyarrow",
            batch_size=None,
        )
    )
