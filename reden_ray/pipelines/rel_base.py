"""Shared readers/helpers for the relational query families (split from relational.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from ..stages.joins import broadcast_anti_join, broadcast_join, broadcast_semi_join, hash_join

_BIG_TABLES = {"lineitem", "orders", "events", "documents", "embeddings"}


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> rd.Dataset:
    """Column-pruned read; big fact tables get an explicit block count
    sized to the cluster (the auto-split default over-fragments small
    files, and a 64-block Mean aggregate measured 4x slower than a
    CPU-count-block one)."""
    blocks = None
    if table in _BIG_TABLES:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        blocks = max(4, cpus)
    return rd.read_parquet(
        f"{sf_dir}/{table}.parquet", columns=columns, override_num_blocks=blocks
    )


def _parquet_cols_bytes(sf_dir: str, table: str, columns: list[str] | None = None) -> int:
    """Uncompressed byte size of the PRUNED columns straight from
    parquet footer metadata — no scan; feeds data-sized join
    partitioning (joins.default_join_partitions)."""
    md = pq.ParquetFile(f"{sf_dir}/{table}.parquet").metadata
    total = 0
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            c = g.column(ci)
            if columns is None or c.path_in_schema in columns:
                total += c.total_uncompressed_size
    return total


def _round_col(t: pa.Table, col: str, digits: int) -> pa.Table:
    """Round via numpy, NOT pyarrow.compute.round: pc.round leaves
    1-ulp-off values unchanged (pc.round(122.94999999999999, 4) ==
    122.94999999999999), so a distributed float sum whose order lands
    one ulp below the decimal boundary hash-mismatches the DuckDB
    oracle's ROUND — a latent flake measured live on window_tumbling.
    np.round normalizes to the same nearest-double as Python/DuckDB."""
    import numpy as np

    i = t.schema.get_field_index(col)
    rounded = np.round(
        np.asarray(t.column(col).to_pylist(), dtype=np.float64), digits
    )
    return t.set_column(i, col, pa.array(rounded, pa.float64()))


# --- J2 analogue: broadcast join (small build side) ----------------------

