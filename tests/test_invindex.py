"""Inverted index: written-artifact round trip vs a pure-python
reference, shard pruning, and conjunctive search semantics."""

import re
import shutil
import tempfile
from collections import Counter

import pyarrow as pa
import pytest
import ray.data as rd

from reden_ray.stages.invindex import (
    _term_shard,
    build_inverted_index,
    read_index,
    search_and,
)

DOCS = [
    (1, "alpha beta beta gamma"),
    (2, "beta gamma gamma delta"),
    (3, "alpha alpha delta"),
    (4, "Beta! GAMMA? alpha."),
    (5, ""),
]

_SPLIT = re.compile(r"[^a-z0-9]+")


def _ds(docs, blocks=2):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d[0] for d in docs], pa.int64()),
                "text": pa.array([d[1] for d in docs], pa.string()),
            }
        )
    ).repartition(blocks)


def _ref_index(docs):
    idx = {}
    for d, t in docs:
        for w, c in Counter(x for x in _SPLIT.split(t.lower()) if x).items():
            idx.setdefault(w, []).append((d, c))
    return {
        w: (
            len(ps),
            sum(c for _, c in ps),
            ",".join(f"{d}:{c}" for d, c in sorted(ps)),
        )
        for w, ps in idx.items()
    }


@pytest.fixture()
def index_dir(ray_session):
    tmp = tempfile.mkdtemp(prefix="test_invidx_")
    build_inverted_index(_ds(DOCS), tmp, num_shards=4)
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def test_roundtrip_matches_reference(index_dir):
    got = {
        r["term"]: (r["df"], r["total_tf"], r["postings"])
        for r in read_index(index_dir).take_all()
    }
    assert got == _ref_index(DOCS)


def test_shard_layout(index_dir):
    import glob
    import os

    shards = {int(p.rsplit("=", 1)[1]) for p in glob.glob(f"{index_dir}/shard=*")}
    assert shards <= set(range(4)) and shards
    # every term sits in ITS shard (deterministic placement)
    for r in read_index(index_dir).take_all():
        s = _term_shard(r["term"], 4)
        assert os.path.isdir(f"{index_dir}/shard={s}")


def test_search_and(index_dir):
    got = [(r["doc_id"], r["score"]) for r in
           search_and(index_dir, ["alpha", "beta"], k=10, num_shards=4).take_all()]
    # docs with BOTH alpha and beta: 1 (1+2=3), 4 (1+1=2)
    assert got == [(1, 3), (4, 2)]


def test_search_single_term_rank(index_dir):
    got = [(r["doc_id"], r["score"]) for r in
           search_and(index_dir, ["alpha"], k=2, num_shards=4).take_all()]
    # alpha tfs: doc3=2, doc1=1, doc4=1 -> top2 = (3,2),(1,1)
    assert got == [(3, 2), (1, 1)]
