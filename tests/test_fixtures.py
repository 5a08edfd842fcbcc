import pyarrow.parquet as pq

from reden_ray.core.textextract import detect_mentions, extract_text, split_context_html
from reden_ray.sources.fixtures import generate_fixtures


def test_generation_is_deterministic():
    a = generate_fixtures(n_docs=10, n_entities=20, seed=7)
    b = generate_fixtures(n_docs=10, n_entities=20, seed=7)
    for name in a:
        assert a[name].equals(b[name]), name


def test_text_invariant_holds_by_construction():
    t = generate_fixtures(n_docs=15, n_entities=20, seed=42)["pages"]
    for html, text in zip(t.column("html").to_pylist(), t.column("text").to_pylist()):
        assert extract_text(html) == text


def test_gold_aligns_with_detected_mentions():
    fx = generate_fixtures(n_docs=15, n_entities=20, seed=42)
    gold = fx["gold"].to_pylist()
    by_page = {}
    for r in fx["pages"].to_pylist():
        by_page[r["url"]] = split_context_html(r["html"])
    for g in gold[:200]:
        ms = detect_mentions(by_page[g["url"]][g["context_id"]])
        assert ms[g["mention_id"]].surface == g["surface"]


def test_ambiguity_present():
    fx = generate_fixtures(n_docs=10, n_entities=40, seed=42)
    d = fx["dictionary"].to_pylist()
    per_norm = {}
    for r in d:
        per_norm.setdefault(r["alias_norm"], set()).add(tuple(r["uri_group"]))
    ambiguous = [n for n, gs in per_norm.items() if len(gs) > 1]
    assert len(ambiguous) >= 0.15 * len(per_norm)


def test_fixture_dir_caches(small_fixture_dir):
    t = pq.read_table(f"{small_fixture_dir}/pages.parquet")
    assert t.num_rows == 60
    from reden_ray.sources.fixtures import fixture_dir

    assert fixture_dir(n_docs=60, n_entities=60, n_topics=10, seed=42) == small_fixture_dir
