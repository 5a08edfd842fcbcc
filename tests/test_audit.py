"""Audit reports (pipelines/audit.py): naive goldens.  SQL parity is
covered by the oracle harness (curation_report / length_histogram)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from reden_ray.pipelines.audit import curation_report, length_histogram


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    return ray_session


def test_curation_report_counts_are_consistent():
    rng = np.random.RandomState(5)
    words = ["aa", "bb", "cc", "dd"]
    texts = [" ".join(rng.choice(words, size=rng.randint(1, 8))) for _ in range(60)]
    for i in range(0, 60, 6):
        texts[i] = "shared duplicate body"
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(60, dtype=np.int64)),
            "text": pa.array(texts),
            "source": pa.array([f"s{i % 2}" for i in range(60)]),
        }
    )
    rows = curation_report(rd.from_arrow(t), top_frac=0.5, dim=64).take_all()
    got = {r["source"]: (r["n_docs"], r["n_unique"], r["n_kept"]) for r in rows}
    assert set(got) == {"s0", "s1"}
    assert got["s0"][0] == 30 and got["s1"][0] == 30
    # one survivor per distinct text (keep-best exact dedup)
    assert got["s0"][1] + got["s1"][1] == len(set(texts))
    for s in got:
        assert 0 < got[s][2] <= got[s][1] <= got[s][0]


def test_length_histogram_buckets():
    texts = ["", "one", "a b", "w x y z", " ".join(["t"] * 9)]
    t = pa.table({"text": pa.array(texts)})
    rows = length_histogram(rd.from_arrow(t)).take_all()
    got = {r["bucket"]: r["n_docs"] for r in rows}
    # lengths 0,1,2,4,9 -> buckets -1,0,1,2,3
    assert got == {-1: 1, 0: 1, 1: 1, 2: 1, 3: 1}
