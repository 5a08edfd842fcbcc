"""Zone-map data skipping over a partitioned parquet layout — the
min/max-pruning discipline every lakehouse engine applies before a
scan (ORC/Iceberg/Delta "data skipping"; parquet already carries the
stats in its footers, so the zone map is BUILT FROM THE WRITTEN BYTES,
not tracked on the side where it could drift).

- ``write_clustered``: cluster the rows on the zone column (a range
  repartition via the existing Dataset sort — the one-off layout cost
  that makes zones tight; an unsorted write still works, its zones
  are just wide) and write N parquet files.
- ``build_zonemap``: one footer read per file (metadata only — no row
  bytes) -> (path, n_rows, zmin, zmax) manifest.
- ``pruned_read``: keep files whose [zmin, zmax] overlaps the
  predicate range, ``read_parquet`` ONLY those, apply the exact
  residual filter.  Driver-side state is the manifest (one row per
  file), never data.

The pruning-actually-prunes behavior is pinned by unit test (file
counts); the VALUE correctness of a pruned scan hash-gates against
plain filtered SQL (``io_zonemap_prune``) — a zone map may only ever
change which bytes are read, never the answer.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd


def write_clustered(
    ds: rd.Dataset, out_dir: str, zone_column: str, num_files: int = 16
) -> None:
    ds.sort(zone_column).repartition(num_files).write_parquet(out_dir)


def build_zonemap(out_dir: str, zone_column: str) -> list[dict]:
    """(path, n_rows, zmin, zmax) per written file, from parquet
    FOOTERS only."""
    zones = []
    for path in sorted(glob.glob(os.path.join(out_dir, "*.parquet"))):
        md = pq.read_metadata(path)
        zmin = zmax = None
        for rg in range(md.num_row_groups):
            grp = md.row_group(rg)
            for ci in range(grp.num_columns):
                col = grp.column(ci)
                if col.path_in_schema == zone_column and col.statistics:
                    st = col.statistics
                    if st.has_min_max:
                        zmin = st.min if zmin is None else min(zmin, st.min)
                        zmax = st.max if zmax is None else max(zmax, st.max)
        zones.append(
            {"path": path, "n_rows": md.num_rows, "zmin": zmin, "zmax": zmax}
        )
    return zones


def pruned_read(
    out_dir: str, zone_column: str, lo, hi
) -> tuple[rd.Dataset | None, int, int]:
    """(dataset | None, files_read, files_total) for rows with
    ``lo <= zone_column <= hi`` — overlap-pruned at the manifest, exact
    residual filter applied per batch."""
    zones = build_zonemap(out_dir, zone_column)
    keep = [
        z["path"]
        for z in zones
        if z["zmin"] is not None and not (z["zmax"] < lo or z["zmin"] > hi)
    ]
    if not keep:
        return None, 0, len(zones)
    ds = rd.read_parquet(keep)

    def residual(t: pa.Table) -> pa.Table:
        c = t.column(zone_column)
        return t.filter(
            pc.and_(
                pc.greater_equal(c, pa.scalar(lo, c.type)),
                pc.less_equal(c, pa.scalar(hi, c.type)),
            )
        )

    return (
        ds.map_batches(residual, batch_format="pyarrow", batch_size=None),
        len(keep),
        len(zones),
    )
