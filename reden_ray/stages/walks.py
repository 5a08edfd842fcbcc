"""Deterministic pseudo-random walks over a directed edge Dataset —
the corpus-scale walk sampler that feeds DeepWalk/node2vec-style
embedding pipelines (Perozzi et al. 2014).  Randomness is replaced by
a keyed hash (the repo-wide determinism rule: Python ``hash()`` is
process-salted, and resumable pipelines need replayable choices): at
step ``t`` a walk started at ``s`` sitting on node ``u`` moves to

    argmin over out-neighbors nbr of  H(f"{s},{t},{nbr}")

so every (start, step) has its own hash family, walks from the same
node diverge, and a re-run (or a DuckDB replay) reproduces the walk
exactly.  Dead ends absorb (the walk stays put) — the DeepWalk
convention of truncating is a post-filter on repeated tail nodes.

Kernels (the Md5MinHasher convention, stages/dedup.py:362):

- ``md5``: ``LE64(md5(key)[0:8])`` == DuckDB
  ``md5_number_upper(s || ',' || t || ',' || nbr)`` — the SQL-twin
  kernel; ``graph_walks_2step`` unrolls two steps as CTEs under a
  hash gate.
- ``fmix``: vectorized fmix64 mix of the three int64 keys — the
  production kernel (no per-row digest in the hot loop).

Scale shape per step: ONE hash join of the walk heads onto the
adjacency + ONE coarse-partition argmin reduce keyed on the walk id
(the expansion stream is sum-of-out-degrees-sized and pair-shaped, so
it never touches a native multi-key groupby — CLAUDE.md), then a
left-outer join back so dead-end walks survive with their old head.
The path history rides as columns on the walk table (walk count ×
steps cells — walk-table-sized, never corpus-sized).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .joins import hash_join, staged_nonempty


def _md5_u64_str(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


def _step_hash_md5(start: np.ndarray, t: int, nbr: np.ndarray) -> np.ndarray:
    return np.fromiter(
        (_md5_u64_str(f"{int(a)},{t},{int(b)}") for a, b in zip(start, nbr)),
        dtype=np.uint64,
        count=len(start),
    )


def _step_hash_fmix(start: np.ndarray, t: int, nbr: np.ndarray) -> np.ndarray:
    from .dedup import _fmix64

    sa = _fmix64(start.astype(np.int64).view(np.uint64))
    tb = _fmix64(np.full(len(start), t, dtype=np.int64).view(np.uint64))
    nb = nbr.astype(np.int64).view(np.uint64)
    return _fmix64(sa ^ tb ^ nb)


_KERNELS = {"md5": _step_hash_md5, "fmix": _step_hash_fmix}


def md5_walks(
    edges: rd.Dataset,
    steps: int = 2,
    u: str = "u",
    v: str = "v",
    kernel: str = "md5",
) -> rd.Dataset:
    """One walk per distinct source node, ``steps`` hash-argmin steps
    over the directed (u -> v) adjacency; returns
    (start, s1, ..., s{steps}) int64."""
    from .partition import part_column
    from .webtext import _default_span_parts

    step_hash = _KERNELS[kernel]

    adj = staged_nonempty(
        edges.map_batches(
            lambda t: pa.table(
                {"cur": t.column(u).cast(pa.int64()),
                 "nbr": t.column(v).cast(pa.int64())}
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
    )
    empty_cols = {"start": pa.array([], pa.int64())}
    for i in range(1, steps + 1):
        empty_cols[f"s{i}"] = pa.array([], pa.int64())
    if adj is None:
        return rd.from_arrow(pa.table(empty_cols))

    # one walk per distinct SOURCE node (nodes with out-edges)
    walks = staged_nonempty(
        adj.groupby("cur")
        .count()
        .map_batches(
            lambda t: pa.table(
                {"start": t.column("cur").cast(pa.int64()),
                 "cur": t.column("cur").cast(pa.int64())}
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
    )
    assert walks is not None

    n_parts = _default_span_parts()

    for t_step in range(1, steps + 1):

        def tag(tb: pa.Table) -> pa.Table:
            return tb.append_column(
                "__part", part_column(tb, ["start"], n_parts)
            )

        def argmin_group(g: pa.Table, t_step=t_step) -> pa.Table:
            g = g.drop_columns("__part")
            st = g.column("start").to_numpy(zero_copy_only=False)
            nb = g.column("nbr").to_numpy(zero_copy_only=False)
            h = step_hash(st, t_step, nb)
            order = np.lexsort((nb, h, st))  # per start: min hash, tie by nbr
            st_s, nb_s = st[order], nb[order]
            firsts = np.flatnonzero(
                np.concatenate([[True], st_s[1:] != st_s[:-1]])
            )
            return pa.table(
                {
                    "start": pa.array(st_s[firsts], pa.int64()),
                    "nxt": pa.array(nb_s[firsts], pa.int64()),
                }
            )

        heads = walks.map_batches(
            lambda tb: pa.table(
                {"start": tb.column("start"), "cur": tb.column("cur")}
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
        expanded = (
            hash_join(staged_nonempty(heads), adj, on=["cur"])
            .map_batches(tag, batch_format="pyarrow", batch_size=None)
            .groupby("__part")
            .map_groups(argmin_group, batch_format="pyarrow")
        )
        nxt = staged_nonempty(expanded)

        def advance(tb: pa.Table, t_step=t_step) -> pa.Table:
            # dead end (no out-neighbor row) -> absorb at the old head
            new_cur = pc.coalesce(tb.column("nxt"), tb.column("cur"))
            cols = {
                c: tb.column(c)
                for c in tb.column_names
                if c not in ("cur", "nxt")
            }
            out = {"start": cols.pop("start")}
            out.update(cols)
            out[f"s{t_step}"] = new_cur.cast(pa.int64())
            out["cur"] = new_cur.cast(pa.int64())
            return pa.table(out)

        if nxt is None:  # every walk is at a dead end already
            walks = walks.map_batches(
                lambda tb, t_step=t_step: tb.append_column(
                    f"s{t_step}", tb.column("cur")
                ),
                batch_format="pyarrow",
                batch_size=None,
            )
        else:
            walks = staged_nonempty(
                hash_join(walks, nxt, on=["start"], how="left_outer").map_batches(
                    advance, batch_format="pyarrow", batch_size=None
                )
            )
            assert walks is not None

    def finish(tb: pa.Table) -> pa.Table:
        cols = {"start": tb.column("start")}
        for i in range(1, steps + 1):
            cols[f"s{i}"] = tb.column(f"s{i}")
        return pa.table(cols)

    return walks.map_batches(finish, batch_format="pyarrow", batch_size=None)
