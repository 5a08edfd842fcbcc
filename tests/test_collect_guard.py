"""Static guard: driver-side Dataset collects are a reviewed whitelist.

Every ``.take_all(`` in the package must be one of the known BOUNDED
collects below (per-block scalars, n_q x k top-k rows, documented
small/test paths).  A new occurrence fails this test until it is
reviewed for corpus-sized-ness and added here — the round-1 lesson
(driver-side dedup/kNN collects) encoded as a permanent check.
"""

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / "reden_ray"

# file (relative to reden_ray/) -> max allowed occurrences, reason
WHITELIST = {
    "stages/joins.py": (1, "broadcast key-set helper for SMALL sides (doc'd)"),
    "stages/similarity.py": (2, "n_q x k top-k rows; bounded IVF training sample"),
    "pipelines/kg.py": (1, "per-block invariant scalars"),
    "pipelines/canonicalize.py": (3, "broadcast CC variant (small/test path) + test wrapper"),
    "pipelines/evaluate.py": (3, "per-block partial metric scalars + positional-align output (<= |gold| rows by construction)"),
    "state/checkpoint.py": (1, "per-partition manifest counts"),
    "stages/webtext.py": (2, "eval-side gram hashes + hot-span bank (both small by contract; join variant exists)"),
    "stages/selection.py": (2, "<= n_buckets histogram rows; <= collect_limit residual values"),
    "stages/kmeans.py": (2, "<= k rows per iteration (init buckets; merged partials)"),
    "stages/aggregates.py": (1, "<= top_n+1 rows per merged MG block"),
    "pipelines/rel_text.py": (1, "approx_top_terms exact side (<= top_n rows)"),
    "pipelines/rel_vec.py": (3, "_centered_sums per-group means (<= group-count rows, broadcast); f5 per-group stats bundle (same bound); emb_quantize per-dim scales (dimension-sized)"),
    "pipelines/rel_io.py": (1, "mix_sources per-source counts (source-domain-sized)"),
    "sources/endpoint.py": (1, "per-shard ingest manifest (27 letter shards)"),
    "stages/scan.py": (1, "<= n_buckets bucket totals (scan phase 2)"),
    "stages/pca.py": (1, "ONE d^2-float partial row per input block (moments pass)"),
    "stages/skewjoin.py": (1, "hot keys only (>= threshold), max_hot_keys-guarded"),
    "stages/cc.py": (1, "per-block fingerprint scalars (one int row per block)"),
    "stages/bpe.py": (1, "exactly ONE argmax row per merge iteration"),
    "stages/mixture.py": (1, "<= n_sources x n_buckets cell totals (grouped scan phase 2)"),
    "stages/lines.py": (1, "hot-line bank (boilerplate-sized by contract; join variant documented)"),
    "stages/ordering.py": (1, "<= n_buckets bucket totals (grouped scan phase 2)"),
    "stages/textprep.py": (1, "<= n_sources * n_buckets cell totals (grouped scan phase 2)"),
    "stages/qsketch.py": (1, "<= n_parts * 2k sketch summary rows (bounded by construction)"),
    "stages/fd.py": (1, "<= n_parts * 2*ell sketch rows (bounded by construction)"),
    "stages/scoring.py": (2, "n_sources x distinct-integer-score histogram cells (threshold + rank census)"),
    "pipelines/serve.py": (2, "score histogram + <= n_buckets bucket totals (both bounded)"),
    "stages/curriculum.py": (1, "<= (2*clip+1) x n_buckets cell totals (grouped scan phase 2)"),
    "pipelines/audit.py": (1, "per-source counts (source-domain-sized, rel_io convention)"),
    "pipelines/relational3.py": (3, "nation rollup (25) + active-day set (date-domain) + event-type sizes (type-domain) broadcasts"),
    "stages/snm.py": (1, "<= n_buckets bucket totals (grouped rank scan phase 2, ordering.py convention)"),
}


def test_take_all_whitelist():
    found: dict[str, int] = {}
    for py in PKG.rglob("*.py"):
        rel = str(py.relative_to(PKG))
        n = 0
        for line in py.read_text().splitlines():
            code = line.split("#", 1)[0]
            if ".take_all(" in code:
                n += 1
        if n:
            found[rel] = n
    for rel, n in found.items():
        assert rel in WHITELIST, f"new driver collect in {rel}: review for scale"
        cap, _ = WHITELIST[rel]
        assert n <= cap, f"{rel} has {n} take_all calls (whitelisted {cap})"


def test_no_per_row_iteration():
    """No ``iter_rows()`` / ``.to_pandas()`` on package Datasets — the
    hot paths stay Arrow-batch."""
    pat = re.compile(r"\.iter_rows\(|\.to_pandas\(\)")
    for py in PKG.rglob("*.py"):
        for i, line in enumerate(py.read_text().splitlines(), 1):
            code = line.split("#", 1)[0]
            assert not pat.search(code), f"{py.relative_to(PKG)}:{i}: {line.strip()}"
