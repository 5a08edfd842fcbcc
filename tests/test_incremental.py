"""Incremental ingestion (stages/incremental.py): store lifecycle,
within-delta dedup, anti-join vs store, append/re-read, idempotent
re-ingest — SQL parity is covered by the oracle harness
(delta_dedup_docs / delta_store_docs)."""

import tempfile

import pyarrow as pa
import pytest
import ray.data as rd

from reden_ray.stages.incremental import (
    build_fingerprint_store,
    delta_dedup,
    fingerprint_winners,
    ingest_snapshot,
    read_store,
)


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    return ray_session


def _ds(rows):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


BASE = [(1, "alpha"), (2, "beta"), (3, "alpha"), (4, "gamma")]
DELTA = [(10, "beta"), (11, "delta"), (12, "delta"), (13, "epsilon")]


def test_fingerprint_winners_min_id():
    w = fingerprint_winners(_ds(BASE)).to_pandas()
    assert sorted(w["doc_id"]) == [1, 2, 4]  # alpha keeps id 1


def test_delta_dedup_drops_store_and_within():
    store = tempfile.mkdtemp(prefix="fpstore_t_")
    build_fingerprint_store(_ds(BASE), store)
    surv = delta_dedup(_ds(DELTA), store).to_pandas()
    # beta is in the store; delta keeps one of the two 'delta' copies
    assert sorted(surv["doc_id"]) == [11, 13]


def test_ingest_appends_and_rereads():
    store = tempfile.mkdtemp(prefix="fpstore_t_")
    build_fingerprint_store(_ds(BASE), store)
    surv = ingest_snapshot(_ds(DELTA), store)
    assert sorted(surv.to_pandas()["doc_id"]) == [11, 13]
    after = read_store(store).to_pandas()
    assert sorted(after["doc_id"]) == [1, 2, 4, 11, 13]
    # re-ingesting the same snapshot is a no-op (idempotent resume)
    again = ingest_snapshot(_ds(DELTA), store)
    assert again.count() == 0
    assert sorted(read_store(store).to_pandas()["doc_id"]) == [1, 2, 4, 11, 13]


def test_corpus_diff_classifies():
    from reden_ray.stages.incremental import corpus_diff

    v1 = _ds([(1, "a"), (2, "b"), (3, "c")])
    v2 = _ds([(2, "b"), (3, "cc"), (4, "d")])
    d = corpus_diff(v1, v2).to_pandas().set_index("doc_id")["status"].to_dict()
    assert d == {1: "removed", 3: "changed", 4: "added"}
    full = corpus_diff(v1, v2, include_unchanged=True).to_pandas()
    assert len(full) == 4
    assert full.set_index("doc_id")["status"][2] == "unchanged"


def test_corpus_diff_empty_sides():
    from reden_ray.stages.incremental import corpus_diff

    v = _ds([(1, "a"), (2, "b")])
    d1 = corpus_diff(_ds([]), v).to_pandas()
    assert sorted(d1["status"].unique()) == ["added"] and len(d1) == 2
    d2 = corpus_diff(v, _ds([])).to_pandas()
    assert sorted(d2["status"].unique()) == ["removed"] and len(d2) == 2
    assert corpus_diff(_ds([]), _ds([])).count() == 0


def test_empty_store_short_circuits():
    store = tempfile.mkdtemp(prefix="fpstore_t_")
    build_fingerprint_store(_ds([]), store)
    surv = delta_dedup(_ds(DELTA), store).to_pandas()
    assert sorted(surv["doc_id"]) == [10, 11, 13]
