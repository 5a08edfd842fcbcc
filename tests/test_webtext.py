"""Webtext curation stages: naive-reference checks for the Gopher
repetition metrics, PII redaction on injected fixtures, and
decontamination (broadcast == join variant == naive set math)."""

from collections import Counter

import pyarrow as pa
import pytest
import ray.data as rd

from reden_ray.stages.webtext import (
    GOPHER_DEFAULTS,
    PIIRedactor,
    RepetitionStats,
    _words,
    decontaminate,
    decontaminate_join,
    gopher_filter,
)


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    return ray_session


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "spam spam spam spam spam spam spam spam spam spam"),  # top-1gram heavy
    (2, "a b a b a b a b a b a b"),  # top-2gram = whole doc
    (3, "one two three four five one two three four five six seven"),  # dup 5gram
    (4, ""),  # empty
    (5, "short doc"),  # < min_words
    (6, "Perfectly ordinary sentence with enough distinct words to pass the filter easily"),
]


def _naive_metrics(text: str) -> dict:
    ws = _words(text)
    nw = len(ws)
    if nw == 0:
        return {"n_words": 0, "distinct_word_ratio": 0.0, "mean_word_len": 0.0,
                "top_2gram_frac": 0.0, "dup_5gram_frac": 0.0}
    def top(n):
        if nw < n:
            return 0.0
        c = Counter(tuple(ws[i:i+n]) for i in range(nw - n + 1))
        m = c.most_common(1)[0][1]
        return 0.0 if m == 1 else min(1.0, m * n / nw)
    def dup(n):
        if nw < n:
            return 0.0
        c = Counter(tuple(ws[i:i+n]) for i in range(nw - n + 1))
        return min(1.0, sum(v * n for v in c.values() if v > 1) / nw)
    return {
        "n_words": nw,
        "distinct_word_ratio": len(set(ws)) / nw,
        "mean_word_len": sum(map(len, ws)) / nw,
        "top_2gram_frac": top(2),
        "dup_5gram_frac": dup(5),
    }


def _docs_ds() -> rd.Dataset:
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
                "text": pa.array([t for _, t in DOCS], pa.string()),
            }
        )
    ).repartition(3)


def test_repetition_stats_match_naive():
    out = {
        r["doc_id"]: r
        for r in _docs_ds()
        .map_batches(RepetitionStats(), batch_format="pyarrow")
        .take_all()
    }
    assert set(out) == {d for d, _ in DOCS}
    for doc_id, text in DOCS:
        want = _naive_metrics(text)
        got = out[doc_id]
        for k, v in want.items():
            assert got[k] == pytest.approx(v), (doc_id, k)


def test_gopher_filter_verdicts():
    kept = {r["doc_id"] for r in gopher_filter(_docs_ds()).take_all()}
    # 0 and 6 are ordinary prose; 1 (one word repeated), 2 (one bigram),
    # 3 (duplicated 5-gram covers >30%), 4 (empty), 5 (too short) drop.
    assert kept == {0, 6}
    # sanity: thresholds drive the verdict (loosen -> doc 3 survives)
    loose = gopher_filter(_docs_ds(), max_dup_5gram_frac=1.0,
                          max_top_2gram_frac=1.0, max_top_3gram_frac=1.0,
                          max_top_4gram_frac=1.0)
    assert 3 in {r["doc_id"] for r in loose.take_all()}


def test_repetition_stats_rejects_unknown_threshold():
    with pytest.raises(ValueError):
        RepetitionStats(max_banana_frac=0.5)
    assert "max_top_2gram_frac" in GOPHER_DEFAULTS


PII_DOCS = [
    (0, "contact me at alice.smith+work@example.co.uk or bob@test.org today"),
    (1, "server at 192.168.1.17 responded; call +33 (0)1 42 96 12 34 now"),
    (2, "no pii here at all"),
    (3, "edge: not-an-ip 999.999.999.999.999 but 10.0.0.1 is one"),
]


def test_pii_redactor_counts_and_tokens():
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in PII_DOCS], pa.int64()),
                "text": pa.array([t for _, t in PII_DOCS], pa.string()),
            }
        )
    )
    out = {r["doc_id"]: r for r in ds.map_batches(
        PIIRedactor(), batch_format="pyarrow").take_all()}
    assert out[0]["n_emails"] == 2 and "<EMAIL>" in out[0]["text"]
    assert "alice" not in out[0]["text"] and "bob@" not in out[0]["text"]
    assert out[1]["n_ips"] == 1 and out[1]["n_phones"] == 1
    assert "<IP>" in out[1]["text"] and "<PHONE>" in out[1]["text"]
    assert out[2]["n_emails"] == out[2]["n_ips"] == out[2]["n_phones"] == 0
    assert out[2]["text"] == PII_DOCS[2][1]  # untouched
    assert "<IP>" in out[3]["text"]


def _naive_contaminated(corpus, eval_docs, n):
    def grams(t):
        ws = _words(t)
        return {" ".join(ws[i:i+n]) for i in range(len(ws) - n + 1)}
    bank = set().union(*(grams(t) for _, t in eval_docs)) if eval_docs else set()
    return {d for d, t in corpus if grams(t) & bank}


CORPUS = [
    (10, "alpha beta gamma delta epsilon zeta"),
    (11, "one two three four five six seven"),
    (12, "totally unrelated words nothing shared here"),
    (13, "x y one two three four tail words"),
]
EVAL = [
    (90, "prefix one two three four suffix"),
    (91, "alpha beta gamma delta trailing"),
]


def _mk(rows):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in rows], pa.int64()),
                "text": pa.array([t for _, t in rows], pa.string()),
            }
        )
    ).repartition(2)


def test_decontaminate_broadcast_matches_naive():
    want = _naive_contaminated(CORPUS, EVAL, 4)
    assert want == {10, 11, 13}  # fixture is non-degenerate by design
    out = decontaminate(_mk(CORPUS), _mk(EVAL), n=4).take_all()
    got = {r["doc_id"] for r in out if r["contaminated"] == 1}
    assert got == want
    assert {r["doc_id"] for r in out} == {d for d, _ in CORPUS}  # flag, not drop


def test_decontaminate_drop_and_empty_eval():
    kept = {r["doc_id"] for r in
            decontaminate(_mk(CORPUS), _mk(EVAL), n=4, drop=True).take_all()}
    assert kept == {12}
    # empty eval side -> nothing contaminated
    empty = _mk(CORPUS).filter(lambda r: False)
    out = decontaminate(_mk(CORPUS), empty, n=4).take_all()
    assert all(r["contaminated"] == 0 for r in out)


def test_decontaminate_join_variant_equal():
    a = sorted(
        (r["doc_id"], r["contaminated"])
        for r in decontaminate(_mk(CORPUS), _mk(EVAL), n=4).take_all()
    )
    b = sorted(
        (r["doc_id"], r["contaminated"])
        for r in decontaminate_join(_mk(CORPUS), _mk(EVAL), n=4).take_all()
    )
    assert a == b
    # empty eval side short-circuits to all-zero flags
    empty = _mk(CORPUS).filter(lambda r: False)
    out = decontaminate_join(_mk(CORPUS), empty, n=4).take_all()
    assert sorted(r["doc_id"] for r in out) == [10, 11, 12, 13]
    assert all(r["contaminated"] == 0 for r in out)


# --- repeated-span removal -------------------------------------------------

SPAN_DOCS = [
    # docs 20/21 share the 3-word span "call us now"; doc 22 repeats a
    # span internally only (kept); 23 is clean; 24 empty.
    (20, "call us now unique tail for twenty"),
    (21, "other words here call us now and more padding words"),
    (22, "rep rep rep rep rep rep self only words here"),
    (23, "completely clean document with distinct content words"),
    (24, ""),
]


def _naive_span_dedup(rows, n, min_docs=2):
    from collections import defaultdict

    def spans(t):
        ws = _words(t)
        return [" ".join(ws[i * n:(i + 1) * n])
                for i in range((len(ws) + n - 1) // n)]

    docs_per = defaultdict(set)
    for d, t in rows:
        for s in spans(t):
            docs_per[s].add(d)
    hot = {s for s, ds in docs_per.items() if len(ds) >= min_docs}
    return {d: " ".join(s for s in spans(t) if s not in hot) for d, t in rows}


def test_span_dedup_matches_naive():
    from reden_ray.stages.webtext import span_dedup

    want = _naive_span_dedup(SPAN_DOCS, 3)
    # fixture sanity: the shared chunk really lands on both docs'
    # 3-word boundaries and gets removed from both
    assert "call us now" not in want[20] and "call us now" not in want[21]
    assert "unique tail for" in want[20]
    out = {r["doc_id"]: r["text"]
           for r in span_dedup(_mk(SPAN_DOCS), n=3).take_all()}
    assert out == want
    # internal-only repetition survives (doc-distinct count, not raw)
    assert out[22] == " ".join(_words(SPAN_DOCS[2][1]))
    assert out[24] == ""


def test_span_dedup_partition_invariant():
    from reden_ray.stages.webtext import span_dedup

    want = _naive_span_dedup(SPAN_DOCS, 3)
    for parts in (1, 5):
        ds = _mk(SPAN_DOCS).repartition(parts)
        got = {r["doc_id"]: r["text"] for r in span_dedup(ds, n=3).take_all()}
        assert got == want, parts


def test_a12_corr_matches_numpy():
    import numpy as np

    from reden_ray.pipelines.relational import a12_corr

    out = {r["l_returnflag"]: r["corr_price_qty"]
           for r in a12_corr("/root/testdata/sf0.001").take_all()}
    import duckdb
    con = duckdb.connect()
    df = con.execute(
        "SELECT l_returnflag, corr(l_extendedprice, l_quantity) c "
        "FROM read_parquet('/root/testdata/sf0.001/lineitem.parquet') "
        "GROUP BY l_returnflag").df()
    for _, row in df.iterrows():
        assert out[row.l_returnflag] == pytest.approx(row.c, abs=1e-6)


def test_run_webtext_curation_chain():
    from reden_ray.stages.webtext import run_webtext_curation

    corpus = [
        # survives everything
        (0, "perfectly ordinary sentence with enough distinct words to pass the filter easily"),
        # killed by gopher (one word repeated)
        (1, "spam spam spam spam spam spam spam spam spam spam"),
        # PII scrubbed but kept; distinct enough to pass gopher
        (2, "write to alice@example.org about the quarterly town hall meeting schedule today"),
        # 3 and 4 share a 3-word span (removed from both) but stay distinct docs
        (3, "shared boiler plate unique three suffix words alpha beta gamma"),
        (4, "shared boiler plate other distinct ending tokens delta epsilon zeta"),
        # contaminated: contains eval doc's 4-gram
        (5, "prefix benchmark question answer pair suffix padding words distinct enough here"),
        # exact-dup pair after curation (identical text)
        (6, "duplicate content row for exact dedup check one two three four"),
        (7, "duplicate content row for exact dedup check one two three four"),
    ]
    eval_rows = [(90, "the benchmark question answer pair held out")]
    out, stats = run_webtext_curation(
        _mk(corpus), _mk(eval_rows), span_n=3, decon_n=4, collect_stats=True
    )
    rows = {r["doc_id"]: r["text"] for r in out.take_all()}
    assert 1 not in rows          # gopher
    assert 5 not in rows          # decontaminated
    assert "<EMAIL>" in rows[2] and "alice@" not in rows[2]
    assert "shared boiler plate" not in rows[3]
    assert "shared boiler plate" not in rows[4]
    assert 3 in rows and 4 in rows
    assert (6 in rows) != (7 in rows)  # exactly one of the dup pair
    s = {r["stage"]: r["rows"] for r in stats.to_pylist()}
    assert s["input"] == 8 and s["gopher_filter"] == 7
    assert s["decontaminate"] == 6 and s["exact_dedup"] == 5
