"""Sequence packing (stages/packing.py): capacity invariants and
partition invariance — the SQL parity itself is covered by the oracle
harness (pack_concat_chunks / pack_next_fit_bins)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from reden_ray.stages.packing import pack_concat_chunks, pack_next_fit

CAP = 50


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    return ray_session


def _docs(seed=3, n=120):
    rng = np.random.RandomState(seed)
    texts = [
        " ".join(["tok"] * int(k)) if k else ""
        for k in rng.randint(0, 80, size=n)
    ]
    return pa.table(
        {"doc_id": pa.array(np.arange(n, dtype=np.int64)), "text": pa.array(texts)}
    )


def test_concat_chunks_offsets_are_a_prefix_sum():
    t = _docs()
    out = pack_concat_chunks(rd.from_arrow(t).repartition(5), capacity=CAP).take_all()
    out.sort(key=lambda r: r["doc_id"])
    run = 0
    for r in out:
        assert r["start_offset"] == run
        assert r["first_chunk"] == r["start_offset"] // CAP
        assert r["last_chunk"] == (r["start_offset"] + r["n_tokens"] - 1) // CAP
        assert r["n_chunks"] == r["last_chunk"] - r["first_chunk"] + 1
        run += r["n_tokens"]


def test_concat_chunks_partition_invariant():
    t = _docs(seed=7)
    a = sorted(
        (r["doc_id"], r["start_offset"], r["first_chunk"], r["last_chunk"])
        for r in pack_concat_chunks(rd.from_arrow(t).repartition(2), capacity=CAP).take_all()
    )
    b = sorted(
        (r["doc_id"], r["start_offset"], r["first_chunk"], r["last_chunk"])
        for r in pack_concat_chunks(rd.from_arrow(t).repartition(9), capacity=CAP).take_all()
    )
    assert a == b


def test_next_fit_never_overflows_capacity():
    t = _docs(seed=5)
    rows = pack_next_fit(
        rd.from_arrow(t).repartition(4), capacity=CAP, n_shards=4
    ).take_all()
    toks = {r["doc_id"]: len(t.column("text")[r["doc_id"]].as_py().split()) for r in rows}
    from collections import defaultdict

    packs = defaultdict(int)
    for r in rows:
        packs[(r["shard"], r["pack_seq"])] += toks[r["doc_id"]]
        assert r["shard"] == r["doc_id"] % 4
    for (shard, seq), total in packs.items():
        members = [r for r in rows if r["shard"] == shard and r["pack_seq"] == seq]
        # a pack only exceeds capacity when a single oversized doc owns it
        assert total <= CAP or len(members) == 1


def test_next_fit_matches_naive_walk():
    t = _docs(seed=11)
    rows = pack_next_fit(
        rd.from_arrow(t).repartition(6), capacity=CAP, n_shards=3
    ).take_all()
    got = {r["doc_id"]: (r["shard"], r["pack_seq"], r["pack_offset"]) for r in rows}
    texts = t.column("text").to_pylist()
    for shard in range(3):
        seq = total = 0
        for i in range(len(texts)):
            if i % 3 != shard:
                continue
            n = len(texts[i].split())
            if n == 0:
                assert i not in got
                continue
            if total + n > CAP and total > 0:
                seq += 1
                total = 0
            assert got[i] == (shard, seq, total), i
            total += n
