"""Blocked fuzzy (edit-distance) matching.

Record-linkage primitive the reference's dictionary lookup does
exactly (REDEN matches normalized surface forms only,
``nelinker/DictionaryHandler`` exact-key lookups); fuzzy top-1 is the
standard extension for noisy web-text mentions.

``levenshtein_topk`` broadcasts a SMALL probe list (``ray.put`` once)
and scans the corpus with a map_batches stage computing true
Levenshtein distance VECTORIZED ACROSS ROWS: the DP recurrence runs as
numpy ops over the whole batch per (probe char x name char) cell, so
per-batch cost is O(m * L) vector ops of width N instead of N * m * L
scalar Python — no per-row loop.  Each block emits only its local
best row per probe (a partial argmin); one tiny groupby merges the
per-block partials (<= n_probes x n_blocks rows through the shuffle).

Blocking for scale: ``max_len_delta`` prunes rows whose length makes
the distance bound unreachable before any DP (|len(a)-len(b)| is a
Levenshtein lower bound).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


def _pad_codes(names: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(N, L) int32 codepoint matrix (0-padded) + (N,) lengths."""
    lens = np.fromiter((len(s) for s in names), dtype=np.int64, count=len(names))
    L = int(lens.max()) if len(lens) else 0
    chars = np.zeros((len(names), L), dtype=np.int32)
    for i, s in enumerate(names):  # one pass to build the matrix; DP below is vectorized
        if s:
            chars[i, : len(s)] = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int32)
    return chars, lens


def levenshtein_probe_block(
    probe: str, chars: np.ndarray, lens: np.ndarray
) -> np.ndarray:
    """Exact Levenshtein distance from ``probe`` to every padded row.

    Rolls the DP over name positions j (outer) and probe positions i
    (inner); every cell update is a vector op across all N rows.
    Distances are captured for each row at j == its length.
    """
    N, L = chars.shape
    m = len(probe)
    p = (
        np.frombuffer(probe.encode("utf-32-le"), dtype=np.uint32).astype(np.int32)
        if m
        else np.empty(0, np.int32)
    )
    res = np.full(N, m, dtype=np.int64)  # rows with len 0 -> m
    prev = np.tile(np.arange(m + 1, dtype=np.int64), (N, 1))
    cur = np.empty_like(prev)
    for j in range(1, L + 1):
        cur[:, 0] = j
        cj = chars[:, j - 1]
        for i in range(1, m + 1):
            sub = prev[:, i - 1] + (cj != p[i - 1])
            np.minimum(prev[:, i] + 1, cur[:, i - 1] + 1, out=cur[:, i])
            np.minimum(cur[:, i], sub, out=cur[:, i])
        done = lens == j
        if np.any(done):
            res[done] = cur[done, m]
        prev, cur = cur, prev
    return res


class FuzzyTop1:
    """Actor-pool stage: per batch, emit each probe's best local match
    (min distance, ties to the lexicographically smallest name)."""

    def __init__(self, probes_ref, name_col: str, max_len_delta: int | None):
        self.probes: list[tuple[int, str]] = ray.get(probes_ref)
        self.name_col = name_col
        self.max_len_delta = max_len_delta

    def __call__(self, t: pa.Table) -> pa.Table:
        names = t.column(self.name_col).to_pylist()
        chars, lens = _pad_codes(names)
        out_pid, out_name, out_dist = [], [], []
        arr = np.asarray(names, dtype=object)
        for pid, probe in self.probes:
            keep = np.ones(len(names), dtype=bool)
            if self.max_len_delta is not None:
                keep = np.abs(lens - len(probe)) <= self.max_len_delta
            keep &= arr != probe  # exclude self-match
            if not np.any(keep):
                continue
            idx = np.nonzero(keep)[0]
            d = levenshtein_probe_block(probe, chars[idx], lens[idx])
            best = d.min()
            cand = idx[d == best]
            # lexicographic tie-break inside the block
            name = min(arr[cand])
            out_pid.append(pid)
            out_name.append(name)
            out_dist.append(int(best))
        return pa.table(
            {
                "probe_id": pa.array(out_pid, pa.int64()),
                "best_match": pa.array(out_name, pa.string()),
                "distance": pa.array(out_dist, pa.int64()),
            }
        )


def levenshtein_top1(
    ds: rd.Dataset,
    name_col: str,
    probes: list[tuple[int, str]],
    max_len_delta: int | None = None,
    concurrency=(1, 8),
) -> rd.Dataset:
    """Global best fuzzy match per probe over ``ds[name_col]``.

    Probe list is small by contract (broadcast).  Returns one row per
    probe: (probe_id, probe, match, distance).
    """
    probes = sorted(probes)
    probes_ref = ray.put(list(probes))
    partials = ds.map_batches(
        FuzzyTop1,
        fn_constructor_args=(probes_ref, name_col, max_len_delta),
        batch_format="pyarrow",
        batch_size=None,
        concurrency=concurrency,
    )

    probe_text = {pid: s for pid, s in probes}

    def reduce_best(g: pa.Table) -> pa.Table:
        idx = g.sort_by(
            [("probe_id", "ascending"), ("distance", "ascending"), ("best_match", "ascending")]
        )
        row = idx.slice(0, 1)
        pid = row.column("probe_id")[0].as_py()
        return pa.table(
            {
                "probe_id": row.column("probe_id"),
                "probe": pa.array([probe_text[pid]], pa.string()),
                "best_match": row.column("best_match"),
                "distance": row.column("distance"),
            }
        )

    return partials.groupby("probe_id").map_groups(reduce_best, batch_format="pyarrow")


# --- deletion-neighborhood (SymSpell-style) edit-distance<=1 pairs --------

def _deletion_variants(t: pa.Table, id_col: str, name_col: str) -> pa.Table:
    """(variant, id, name) rows: the name itself plus every single-char
    deletion.  Loop is over DELETION POSITION (bounded by the longest
    name in the batch — alias/name keys are short by nature), each pass
    slicing the whole column; no per-row Python."""
    import pyarrow.compute as pc

    lens = pc.utf8_length(t.column(name_col)).to_numpy(zero_copy_only=False)
    max_len = int(lens.max()) if len(lens) else 0
    if max_len > 512:
        # fail LOUDLY: deletion blocking emits len+1 rows per name, so a
        # document-sized string silently multiplies the shuffle volume
        # 500x+ — this operator is for NAME/ALIAS keys; chunk or hash
        # long fields first
        raise ValueError(
            f"ed1_pairs: name of length {max_len} exceeds the 512-char "
            "key bound (deletion blocking is O(len) rows per name)"
        )
    outs = [
        pa.table(
            {
                "variant": t.column(name_col),
                "vid": t.column(id_col),
                "vname": t.column(name_col),
            }
        )
    ]
    for k in range(max_len):
        mask = lens > k
        if not mask.any():
            break
        sub = t.filter(pa.array(mask))
        pre = pc.utf8_slice_codeunits(sub.column(name_col), 0, k)
        post = pc.utf8_slice_codeunits(sub.column(name_col), k + 1, 1 << 30)
        var = pc.binary_join_element_wise(pre, post, "")
        outs.append(
            pa.table(
                {
                    "variant": var,
                    "vid": sub.column(id_col),
                    "vname": sub.column(name_col),
                }
            )
        )
    out = pa.concat_tables(outs)
    # block-local (variant, id) dedup ("aab" yields "ab" twice)
    return out.group_by(["variant", "vid", "vname"]).aggregate([])


def _ed_le1_verify(a: list[str], b: list[str]) -> np.ndarray:
    """Vectorized check levenshtein(a_i, b_i) <= 1 per pair.

    Equal-length pairs: <=1 mismatching position.  Length-diff-1 pairs:
    prefix-match up to the first mismatch, then the longer shifted by
    one must match the shorter to the end (prefix/suffix cumulative
    ANDs — no per-pair scan).  Larger length gaps are distance >= 2.
    """
    ca, la = _pad_codes(a)
    cb, lb = _pad_codes(b)
    n = len(a)
    L = max(ca.shape[1], cb.shape[1], 1)
    if ca.shape[1] < L:
        ca = np.pad(ca, ((0, 0), (0, L - ca.shape[1])))
    if cb.shape[1] < L:
        cb = np.pad(cb, ((0, 0), (0, L - cb.shape[1])))
    ok = np.zeros(n, dtype=bool)
    same = la == lb
    if same.any():
        mism = (ca[same] != cb[same]).sum(axis=1)
        ok[same] = mism <= 1
    # orient: x = longer, y = shorter, len diff exactly 1
    d1 = np.abs(la - lb) == 1
    if d1.any():
        idx = np.nonzero(d1)[0]
        a_long = la[idx] > lb[idx]
        x = np.where(a_long[:, None], ca[idx], cb[idx])
        y = np.where(a_long[:, None], cb[idx], ca[idx])
        ly = np.where(a_long, lb[idx], la[idx])
        eq = x[:, : L - 1] == y[:, : L - 1] if L > 1 else np.ones((len(idx), 0), bool)
        eq_shift = x[:, 1:] == y[:, : L - 1]
        # position mask within the shorter string
        pos = np.arange(L - 1)[None, :]
        valid = pos < ly[:, None]
        pre_ok = np.cumprod(np.where(valid, eq, True), axis=1).astype(bool)
        # suffix: all eq_shift from position j..ly-1
        suf = np.where(valid, eq_shift, True)
        suf_ok = np.flip(np.cumprod(np.flip(suf, axis=1), axis=1), axis=1).astype(bool)
        # deletion at shorter-position j works iff prefix[0..j-1] and
        # shifted suffix [j..]; j ranges 0..ly (j==ly -> delete last of x)
        any_j = suf_ok[:, 0] if L > 1 else np.ones(len(idx), bool)  # j == 0
        if L > 1:
            mid = pre_ok[:, :-1] & suf_ok[:, 1:]
            any_j = any_j | mid.any(axis=1)
            # j == ly (delete x's last char): whole prefix must match
            last_pre = np.where(
                ly > 0,
                pre_ok[np.arange(len(idx)), np.maximum(ly - 1, 0)],
                True,
            )
            any_j = any_j | last_pre
        ok[idx] = any_j
    return ok


def ed1_pairs(
    ds: rd.Dataset,
    id_col: str,
    name_col: str,
    max_group: int | None = None,
    n_partitions: int | None = None,
) -> rd.Dataset:
    """All id pairs (a < b) whose names are within edit distance 1 —
    SymSpell-style deletion-neighborhood blocking, the exact scale path
    for alias/near-key dedup:

    1. each row emits its name + every single-deletion variant;
    2. ONE variant-hash shuffle groups colliding rows — a pair within
       edit distance 1 ALWAYS shares a variant (equal -> identity,
       substitution -> same-position deletions, indel -> longer's
       deletion == shorter), so blocking is lossless;
    3. per-group pair expansion (``max_group`` caps pathological hot
       variants at scale — ungrounded by default for exactness);
    4. global pair distinct, then the vectorized <=1 verifier drops
       hash-collision false candidates.

    Output: (id_a, id_b, distance) with distance in {0, 1}.
    """
    from .joins import default_join_partitions
    from .partition import part_column

    n_parts = n_partitions or default_join_partitions()
    variants = ds.map_batches(
        lambda t: _deletion_variants(t, id_col, name_col),
        batch_format="pyarrow",
        batch_size=None,
    )

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("__part", part_column(t, ["variant"], n_parts))

    def pairs(g: pa.Table) -> pa.Table:
        g = g.drop_columns("__part").sort_by(
            [("variant", "ascending"), ("vid", "ascending")]
        )
        v = np.asarray(g.column("variant").to_pylist(), dtype=object)
        ids = g.column("vid").to_numpy(zero_copy_only=False)
        names = np.asarray(g.column("vname").to_pylist(), dtype=object)
        n = len(v)
        starts = np.flatnonzero(np.concatenate([[True], v[1:] != v[:-1]]))
        ends = np.concatenate([starts[1:], [n]])
        ia, ib, na, nb = [], [], [], []
        for st, en in zip(starts, ends):  # per VARIANT group
            k = en - st
            if k < 2:
                continue
            if max_group is not None and k > max_group:
                continue  # documented hot-variant cap (off by default)
            iu = np.triu_indices(k, 1)
            gi = ids[st:en]
            gn = names[st:en]
            ia.append(gi[iu[0]])
            ib.append(gi[iu[1]])
            na.append(gn[iu[0]])
            nb.append(gn[iu[1]])
        if not ia:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "name_a": pa.array([], pa.string()),
                    "name_b": pa.array([], pa.string()),
                }
            )
        t2 = pa.table(
            {
                "id_a": pa.array(np.concatenate(ia), pa.int64()),
                "id_b": pa.array(np.concatenate(ib), pa.int64()),
                "name_a": pa.array(np.concatenate(na), pa.string()),
                "name_b": pa.array(np.concatenate(nb), pa.string()),
            }
        )
        # ids equal -> same row seen through two variants; drop
        t2 = t2.filter(
            pa.array(
                t2.column("id_a").to_numpy(zero_copy_only=False)
                != t2.column("id_b").to_numpy(zero_copy_only=False)
            )
        )
        return t2.group_by(["id_a", "id_b", "name_a", "name_b"]).aggregate([])

    # global pair distinct: names are functions of the ids, so distinct
    # on all four columns == distinct pairs — an AGGREGATE groupby (one
    # shuffle, no per-pair group calls)
    cand = (
        variants.map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(pairs, batch_format="pyarrow")
        .groupby(["id_a", "id_b", "name_a", "name_b"])
        .count()
        .select_columns(["id_a", "id_b", "name_a", "name_b"])
    )

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "distance": pa.array([], pa.int64()),
                }
            )
        a = t.column("name_a").to_pylist()
        b = t.column("name_b").to_pylist()
        ok = _ed_le1_verify(a, b)
        kept = t.filter(pa.array(ok))
        dist = (
            np.asarray(kept.column("name_a").to_pylist(), dtype=object)
            != np.asarray(kept.column("name_b").to_pylist(), dtype=object)
        ).astype(np.int64)
        return pa.table(
            {
                "id_a": kept.column("id_a"),
                "id_b": kept.column("id_b"),
                "distance": pa.array(dist, pa.int64()),
            }
        )

    return cand.map_batches(verify, batch_format="pyarrow", batch_size=None)


# --- Jaro-Winkler top-1 (DuckDB-exact semantics) ---------------------------


def jaro_winkler_probe_block(
    probe: str, chars: np.ndarray, lens: np.ndarray
) -> np.ndarray:
    """DuckDB-exact Jaro-Winkler similarity from ``probe`` to every
    padded row (boost threshold 0.7, prefix cap 4, scale 0.1; empty
    strings -> 0.0 even vs empty — semantics pinned by a 300-pair fuzz
    against ``jaro_winkler_similarity``).

    Match phase runs as a loop over (probe position, window offset) —
    every inner update is a vector op across all N rows; per-row window
    bounds, the used-flag bookkeeping and the transposition count are
    all mask arithmetic.  Formula evaluated in DuckDB's operation order
    so equal rationals land on identical doubles."""
    N, L = chars.shape
    m = len(probe)
    out = np.zeros(N, dtype=np.float64)
    if m == 0 or N == 0 or L == 0:
        return out
    p = np.frombuffer(probe.encode("utf-32-le"), dtype=np.uint32).astype(np.int32)
    w = np.maximum(np.maximum(lens, m) // 2 - 1, 0)  # per-row window
    used2 = np.zeros((N, L), dtype=bool)
    match1 = np.zeros((N, m), dtype=bool)
    jj = np.arange(L, dtype=np.int64)
    for i in range(m):
        got = np.zeros(N, dtype=bool)
        lo = max(0, i - int(w.max()))
        hi = min(L, i + int(w.max()) + 1)
        for j in range(lo, hi):
            ok = (
                ~got
                & ~used2[:, j]
                & (chars[:, j] == p[i])
                & (np.abs(j - i) <= w)
                & (j < lens)
            )
            if ok.any():
                used2[ok, j] = True
                got |= ok
        match1[:, i] = got
    mc = match1.sum(axis=1).astype(np.float64)
    any_m = mc > 0
    if not any_m.any():
        return out
    # k-th matched char of probe vs k-th matched char of each name
    mmax = int(mc.max())
    c1 = np.zeros((N, mmax), dtype=np.int32)
    c2 = np.zeros((N, mmax), dtype=np.int32)
    r1 = np.cumsum(match1, axis=1) - 1  # rank of each matched probe pos
    rows = np.nonzero(match1)[0]
    c1[rows, r1[match1]] = np.broadcast_to(p, (N, m))[match1]
    r2 = np.cumsum(used2, axis=1) - 1
    rows2 = np.nonzero(used2)[0]
    c2[rows2, r2[used2]] = chars[used2]
    ks = np.arange(mmax, dtype=np.int64)
    valid = ks[None, :] < mc[:, None]
    t_full = ((c1 != c2) & valid).sum(axis=1) // 2
    lf = lens.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        sim = (mc / m + mc / lf + (mc - t_full) / mc) / 3.0
    sim = np.where(any_m & (lens > 0), sim, 0.0)
    # Winkler boost above 0.7: common prefix capped at 4
    pref_n = min(4, m, L)
    if pref_n > 0:
        eq = chars[:, :pref_n] == p[:pref_n]
        eq &= jj[:pref_n][None, :] < lens[:, None]
        pref = np.cumprod(eq, axis=1).sum(axis=1).astype(np.float64)
    else:
        pref = np.zeros(N, dtype=np.float64)
    boost = sim + pref * 0.1 * (1.0 - sim)
    return np.where(sim > 0.7, boost, sim)


class JwTop1:
    """Actor-pool stage: per batch, each probe's best local match by
    MAX Jaro-Winkler similarity (ties to the lexicographically smallest
    name)."""

    def __init__(self, probes_ref, name_col: str):
        self.probes: list[tuple[int, str]] = ray.get(probes_ref)
        self.name_col = name_col

    def __call__(self, t: pa.Table) -> pa.Table:
        names = t.column(self.name_col).to_pylist()
        chars, lens = _pad_codes(names)
        arr = np.asarray(names, dtype=object)
        out_pid, out_name, out_sim = [], [], []
        for pid, probe in self.probes:
            keep = arr != probe  # exclude self-match
            if not np.any(keep):
                continue
            idx = np.nonzero(keep)[0]
            s = jaro_winkler_probe_block(probe, chars[idx], lens[idx])
            best = s.max()
            cand = idx[s == best]
            out_pid.append(pid)
            out_name.append(min(arr[cand]))
            out_sim.append(float(best))
        return pa.table(
            {
                "probe_id": pa.array(out_pid, pa.int64()),
                "best_match": pa.array(out_name, pa.string()),
                "similarity": pa.array(out_sim, pa.float64()),
            }
        )


def jaro_winkler_top1(
    ds: rd.Dataset,
    name_col: str,
    probes: list[tuple[int, str]],
    concurrency=(1, 8),
) -> rd.Dataset:
    """Global best Jaro-Winkler match per probe over ``ds[name_col]``
    (probe list small by contract — broadcast once; per-block partial
    argmax, one tiny probe-keyed merge)."""
    probes = sorted(probes)
    probes_ref = ray.put(list(probes))
    partials = ds.map_batches(
        JwTop1,
        fn_constructor_args=(probes_ref, name_col),
        batch_format="pyarrow",
        batch_size=None,
        concurrency=concurrency,
    )
    probe_text = {pid: s for pid, s in probes}

    def reduce_best(g: pa.Table) -> pa.Table:
        idx = g.sort_by(
            [
                ("probe_id", "ascending"),
                ("similarity", "descending"),
                ("best_match", "ascending"),
            ]
        )
        row = idx.slice(0, 1)
        pid = row.column("probe_id")[0].as_py()
        import pyarrow.compute as pc

        return pa.table(
            {
                "probe_id": row.column("probe_id"),
                "probe": pa.array([probe_text[pid]], pa.string()),
                "best_match": row.column("best_match"),
                # half-away: non-boosted JW values can be exactly dyadic
                # (21/32 = 0.65625 is a 4-dp half); pc.round defaults to
                # half-even while the DuckDB oracle ROUND is half-away.
                "similarity": pa.array(
                    np.floor(
                        row.column("similarity")
                        .to_numpy(zero_copy_only=False)
                        .astype(np.float64)
                        * 1e4
                        + 0.5
                    )
                    / 1e4,
                    pa.float64(),
                ),
            }
        )

    return partials.groupby("probe_id").map_groups(reduce_best, batch_format="pyarrow")
