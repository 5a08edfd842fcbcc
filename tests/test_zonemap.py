"""Zone-map pruning: the manifest comes from written footers, pruning
actually skips files, and a pruned scan returns exactly the filtered
rows."""

import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from reden_ray.stages.zonemap import build_zonemap, pruned_read, write_clustered


@pytest.fixture()
def layout(ray_session):
    tmp = tempfile.mkdtemp(prefix="test_zonemap_")
    vals = np.arange(1000, dtype=np.int64)
    rng = np.random.RandomState(7)
    rng.shuffle(vals)
    ds = rd.from_arrow(
        pa.table({"k": pa.array(vals), "payload": pa.array(vals * 3)})
    ).repartition(5)
    write_clustered(ds, tmp, "k", num_files=10)
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def test_zonemap_covers_all_rows(layout):
    zones = build_zonemap(layout, "k")
    assert sum(z["n_rows"] for z in zones) == 1000
    # clustered layout -> zones are tight, non-degenerate
    assert all(z["zmin"] is not None for z in zones if z["n_rows"])


def test_pruned_read_skips_files_and_is_exact(layout):
    ds, n_read, n_total = pruned_read(layout, "k", 100, 199)
    assert n_total == 10
    assert 0 < n_read < n_total  # pruning actually bit
    got = sorted(r["k"] for r in ds.take_all())
    assert got == list(range(100, 200))


def test_pruned_read_empty_range(layout):
    ds, n_read, n_total = pruned_read(layout, "k", 5000, 6000)
    assert ds is None and n_read == 0 and n_total == 10
