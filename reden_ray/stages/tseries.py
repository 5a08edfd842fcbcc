"""Per-key time-series analytics over an event stream — the
autocorrelation primitive behind seasonality/anomaly detectors.

``lag1_autocorr``: for every key, the sample correlation between the
value series and its lag-1 shift under (ts, id) order — one key-hash
coarse shuffle, then a vectorized per-group lexsort + shifted views
(no window loop, no per-row Python).  Keys with fewer than 3 events
or a zero-variance side emit no row (DuckDB ``corr`` returns NULL
there; absence is the NULL-free encoding the SSSP/PPR families use).
The correlation ratio is invariant to the sample/population variance
convention, so the numpy two-pass formula matches SQL ``corr`` up to
summation order; output rounds 6dp (the a12_corr precedent).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


def lag1_autocorr(
    events: rd.Dataset,
    key_column: str = "user_id",
    ts_column: str = "ts",
    id_column: str = "event_id",
    value_column: str = "value",
) -> rd.Dataset:
    """(key, n_pairs, acf1) per key — acf1 rounded 6dp."""
    from .partition import expansion_partitions, part_column

    n_parts = expansion_partitions()

    def tag(t: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "k": t.column(key_column).cast(pa.int64()),
                "ts_us": t.column(ts_column)
                .cast(pa.timestamp("us"))
                .cast(pa.int64()),
                "eid": t.column(id_column).cast(pa.int64()),
                "v": t.column(value_column).cast(pa.float64()),
            }
        )
        return t.append_column("__part", part_column(t, ["k"], n_parts))

    def per_key(g: pa.Table) -> pa.Table:
        g = g.drop_columns("__part")
        k = g.column("k").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        eid = g.column("eid").to_numpy(zero_copy_only=False)
        v = g.column("v").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, k))
        k, v = k[order], v[order]
        n = len(k)
        starts = np.flatnonzero(np.concatenate([[True], k[1:] != k[:-1]]))
        ends = np.concatenate([starts[1:], [n]])
        ks: list[int] = []
        ns: list[int] = []
        cs: list[float] = []
        for s0, e0 in zip(starts, ends):
            if e0 - s0 < 3:
                continue
            x = v[s0 : e0 - 1]
            y = v[s0 + 1 : e0]
            xm = x - x.mean()
            ym = y - y.mean()
            sxx = float((xm * xm).sum())
            syy = float((ym * ym).sum())
            if sxx == 0.0 or syy == 0.0:
                continue
            r = float((xm * ym).sum()) / np.sqrt(sxx * syy)
            ks.append(int(k[s0]))
            ns.append(len(x))
            cs.append(round(r, 6))
        return pa.table(
            {
                key_column: pa.array(ks, pa.int64()),
                "n_pairs": pa.array(ns, pa.int64()),
                "acf1": pa.array(cs, pa.float64()),
            }
        )

    return (
        events.map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(per_key, batch_format="pyarrow")
    )


def mann_kendall_s(
    events: rd.Dataset,
    key_column: str = "user_id",
    ts_column: str = "ts",
    id_column: str = "event_id",
    value_column: str = "value",
) -> rd.Dataset:
    """Mann-Kendall trend statistic per key: S = sum over ordered pairs
    i < j of sign(v_j - v_i) — the nonparametric monotone-trend test,
    ALL-INTEGER (no distribution assumptions, no float edge).  Series
    are short per key (co-located by the coarse shuffle), so the
    per-group pairwise sign sum is one numpy outer op."""
    from .partition import expansion_partitions, part_column

    n_parts = expansion_partitions()

    def tag(t: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "k": t.column(key_column).cast(pa.int64()),
                "ts_us": t.column(ts_column)
                .cast(pa.timestamp("us"))
                .cast(pa.int64()),
                "eid": t.column(id_column).cast(pa.int64()),
                "v": t.column(value_column).cast(pa.float64()),
            }
        )
        return t.append_column("__part", part_column(t, ["k"], n_parts))

    def per_key(g: pa.Table) -> pa.Table:
        g = g.drop_columns("__part")
        k = g.column("k").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        eid = g.column("eid").to_numpy(zero_copy_only=False)
        v = g.column("v").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, k))
        k, v = k[order], v[order]
        n = len(k)
        starts = np.flatnonzero(np.concatenate([[True], k[1:] != k[:-1]]))
        ends = np.concatenate([starts[1:], [n]])
        ks: list[int] = []
        ns: list[int] = []
        ss: list[int] = []
        for s0, e0 in zip(starts, ends):
            x = v[s0:e0]
            if len(x) < 2:
                continue
            d = np.sign(x[None, :] - x[:, None])  # d[i, j] = sign(vj - vi)
            ks.append(int(k[s0]))
            ns.append(len(x))
            ss.append(int(np.triu(d, 1).sum()))
        return pa.table(
            {
                key_column: pa.array(ks, pa.int64()),
                "n_events": pa.array(ns, pa.int64()),
                "s_stat": pa.array(ss, pa.int64()),
            }
        )

    return (
        events.map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(per_key, batch_format="pyarrow")
    )


def cusum_max(
    events: rd.Dataset,
    target_cents: int,
    key_column: str = "user_id",
    ts_column: str = "ts",
    id_column: str = "event_id",
    value_column: str = "value",
) -> rd.Dataset:
    """Max one-sided upward CUSUM per key over integer CENTS:
    S_t = max(0, S_{t-1} + (cents_t - target)) — the drift/changepoint
    alarm statistic, computed loop-free via its closed form
    S_t = P_t - min(0, running-min P) (prefix sums reset at their
    minimum).  All-int64; value is 2-dp money so cents are exact."""
    from .partition import expansion_partitions, part_column

    n_parts = expansion_partitions()

    def tag(t: pa.Table) -> pa.Table:
        v = t.column(value_column).to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "k": t.column(key_column).cast(pa.int64()),
                "ts_us": t.column(ts_column)
                .cast(pa.timestamp("us"))
                .cast(pa.int64()),
                "eid": t.column(id_column).cast(pa.int64()),
                "d": pa.array(
                    np.floor(v * 100 + 0.5).astype(np.int64) - target_cents,
                    pa.int64(),
                ),
            }
        )
        return t.append_column("__part", part_column(t, ["k"], n_parts))

    def per_key(g: pa.Table) -> pa.Table:
        g = g.drop_columns("__part")
        k = g.column("k").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        eid = g.column("eid").to_numpy(zero_copy_only=False)
        d = g.column("d").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, k))
        k, d = k[order], d[order]
        n = len(k)
        starts = np.flatnonzero(np.concatenate([[True], k[1:] != k[:-1]]))
        ends = np.concatenate([starts[1:], [n]])
        ks: list[int] = []
        ns: list[int] = []
        ms: list[int] = []
        for s0, e0 in zip(starts, ends):
            p = np.cumsum(d[s0:e0])
            runmin = np.minimum(np.minimum.accumulate(p), 0)
            ks.append(int(k[s0]))
            ns.append(e0 - s0)
            ms.append(int((p - runmin).max()))
        return pa.table(
            {
                key_column: pa.array(ks, pa.int64()),
                "n_events": pa.array(ns, pa.int64()),
                "max_cusum": pa.array(ms, pa.int64()),
            }
        )

    return (
        events.map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(per_key, batch_format="pyarrow")
    )
