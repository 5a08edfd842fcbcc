"""TF-cosine similarity join: exact agreement with a pure-python
reference, df-cap semantics, and the integer threshold gate."""

import re
from collections import Counter

import pyarrow as pa
import pytest
import ray.data as rd

from reden_ray.stages.tfcos import tf_cosine_pairs

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox leaps over the lazy dog"),
    (3, "entirely different content about ray data pipelines"),
    (4, "The quick brown fox jumps over the lazy dog!"),  # = 1 after norm
    (5, "ray data pipelines process content in batches"),
    (6, ""),
]

_SPLIT = re.compile(r"[^a-z0-9]+")


def _ds(docs, blocks=3):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d[0] for d in docs], pa.int64()),
                "text": pa.array([d[1] for d in docs], pa.string()),
            }
        )
    ).repartition(blocks)


def _ref(docs, num, den, max_df):
    tfs = {
        d: Counter(w for w in _SPLIT.split(t.lower()) if w) for d, t in docs
    }
    df = Counter()
    for c in tfs.values():
        df.update(c.keys())
    kept = {t for t, n in df.items() if n <= max_df}
    tfs = {d: {t: v for t, v in c.items() if t in kept} for d, c in tfs.items()}
    n2 = {d: sum(v * v for v in c.values()) for d, c in tfs.items()}
    out = {}
    ids = sorted(tfs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            dot = sum(tfs[a][t] * tfs[b].get(t, 0) for t in tfs[a])
            if dot > 0 and den * dot * dot >= num * n2[a] * n2[b]:
                out[(a, b)] = (dot, n2[a], n2[b])
    return out


@pytest.mark.parametrize("max_df", [100, 2])
def test_pairs_match_reference(ray_session, max_df):
    got = {
        (r["doc_a"], r["doc_b"]): (r["dot"], r["norm_a"], r["norm_b"])
        for r in tf_cosine_pairs(_ds(DOCS), 4, 5, max_df=max_df).take_all()
    }
    assert got == _ref(DOCS, 4, 5, max_df)


def test_exact_duplicate_found(ray_session):
    got = {
        (r["doc_a"], r["doc_b"])
        for r in tf_cosine_pairs(_ds(DOCS), 99, 100, max_df=100).take_all()
    }
    assert (1, 4) in got  # identical after normalization: cosine 1.0
    assert (1, 2) not in got  # one word differs: below 0.995


def test_empty_corpus(ray_session):
    assert tf_cosine_pairs(_ds([(9, "")], 1), 4, 5).take_all() == []
