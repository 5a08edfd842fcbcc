"""Tests for stages/scan.py (distributed ordered prefix-sum)."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from reden_ray.stages.scan import ordered_prefix_sum


@pytest.mark.parametrize("seed,n,buckets", [(0, 500, 8), (3, 73, 257)])
def test_prefix_sum_matches_numpy(seed, n, buckets):
    rng = np.random.RandomState(seed)
    ids = rng.permutation(n).astype(np.int64) * 3 + 11  # sparse, shuffled
    vals = rng.randint(0, 50, size=n).astype(np.int64)
    ds = rd.from_arrow(
        pa.table({"id": pa.array(ids, pa.int64()), "v": pa.array(vals, pa.int64())})
    ).repartition(7)
    out = (
        ordered_prefix_sum(ds, "id", "v", alias="c", n_buckets=buckets)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    order = np.argsort(ids, kind="stable")
    want = np.cumsum(vals[order])
    assert np.allclose(out["c"].to_numpy(), want)
    assert list(out["id"]) == sorted(ids)
