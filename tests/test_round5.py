"""Round-5 additions: tfidf checkpoint staging, span-hash helper."""
import numpy as np
import pytest


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    return ray_session


SF = "/root/testdata/sf0.001"


def test_tfidf_checkpoint_dir_equals_default(tmp_path):
    from reden_ray.pipelines.relational import text_tfidf_topk

    base = text_tfidf_topk(SF).to_pandas()
    ckpt = text_tfidf_topk(SF, checkpoint_dir=str(tmp_path / "tok")).to_pandas()
    cols = ["doc_id", "term", "tfidf", "rank"]
    a = base[cols].sort_values(cols).reset_index(drop=True)
    b = ckpt[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)
    assert (tmp_path / "tok").exists()  # parquet staging actually used


def test_span_hash_blocks_matches_per_doc():
    """Batched span hashing must equal hashing each doc alone (the
    block vectorization must not leak state across docs), spans of
    different lengths must hash differently, and order must matter."""
    from reden_ray.stages.webtext import _span_hash_blocks

    docs = [
        "a b c d e f g".split(),
        [],
        "a b c".split(),
        "c b a".split(),
        "a b c d e".split(),
    ]
    batched = _span_hash_blocks(docs, 5)
    for ws, got in zip(docs, batched):
        alone = _span_hash_blocks([ws], 5)[0]
        assert np.array_equal(got, alone)
    # doc0 spans: [a b c d e], [f g]; doc4 span: [a b c d e] — shared
    assert batched[0][0] == batched[4][0]
    # order-sensitive: 'a b c' != 'c b a'
    assert batched[2][0] != batched[3][0]
    # length-sensitive tail: 'f g' != hash of 'a b c'
    assert batched[0][1] != batched[2][0]
    assert batched[1].size == 0
