"""HLL approximate distinct-count: accuracy + merge-invariance."""

import numpy as np
import pyarrow as pa


def test_hll_register_merge_equals_whole_set():
    """Sketching two halves and max-merging must equal sketching the
    union (the mergeability the shuffle relies on)."""
    from reden_ray.stages.aggregates import _hll_registers

    rng = np.random.default_rng(0)
    vals = rng.integers(0, 2**62, 50_000, dtype=np.int64)
    whole = _hll_registers(vals, 12)
    merged = np.maximum(_hll_registers(vals[:20_000], 12), _hll_registers(vals[20_000:], 12))
    assert np.array_equal(whole, merged)


def test_hll_estimate_accuracy():
    from reden_ray.stages.aggregates import _hll_estimate, _hll_registers

    rng = np.random.default_rng(1)
    for true_n in (100, 5_000, 200_000):
        vals = rng.choice(2**62, size=true_n, replace=False).astype(np.int64)
        est = _hll_estimate(_hll_registers(vals, 12), 12)
        assert abs(est - true_n) / true_n < 0.05, (true_n, est)


def test_hll_distinct_per_group_skewed_key(ray_session):
    """One key owns ~95% of rows with high cardinality; per-key state
    must stay 4 KiB (2^12 regs) and the estimate within 5%."""
    import ray.data as rd

    from reden_ray.stages.aggregates import hll_distinct_per_group

    rng = np.random.default_rng(2)
    hot_vals = rng.integers(0, 40_000, 190_000, dtype=np.int64)  # ~39k distinct
    cold_keys = rng.integers(1, 20, 10_000, dtype=np.int64)
    cold_vals = rng.integers(0, 50, 10_000, dtype=np.int64)
    t = pa.table(
        {
            "k": pa.array(np.concatenate([np.zeros(190_000, np.int64), cold_keys])),
            "v": pa.array(np.concatenate([hot_vals, cold_vals])),
        }
    )
    ds = rd.from_arrow(t).repartition(8)
    got = {r["k"]: r["approx_distinct"] for r in hll_distinct_per_group(ds, "k", "v").take_all()}
    true = {}
    ks = t.column("k").to_numpy()
    vs = t.column("v").to_numpy()
    for k in np.unique(ks):
        true[int(k)] = len(np.unique(vs[ks == k]))
    assert set(got) == set(true)
    for k, n in true.items():
        assert abs(got[k] - n) / max(n, 1) < 0.05, (k, n, got[k])


# --- fixed-width histogram quantile sketch --------------------------------

def test_approx_quantiles_error_bound(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from reden_ray.stages.aggregates import approx_quantiles

    rng = np.random.default_rng(11)
    vals = rng.lognormal(mean=3.0, sigma=1.0, size=20000)
    ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.float64())})).repartition(6)
    n_bins = 2048
    got = approx_quantiles(ds, "x", [0.1, 0.5, 0.9, 0.99], n_bins=n_bins)
    bin_w = (vals.max() - vals.min()) / n_bins
    for q, v in got.items():
        exact = np.quantile(vals, q, method="inverted_cdf")
        assert abs(v - exact) <= bin_w + 1e-9, (q, v, exact, bin_w)


def test_approx_quantiles_constant_column(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from reden_ray.stages.aggregates import approx_quantiles

    ds = rd.from_arrow(pa.table({"x": pa.array([7.5] * 100)}))
    got = approx_quantiles(ds, "x", [0.5, 0.99])
    assert got == {0.5: 7.5, 0.99: 7.5}
