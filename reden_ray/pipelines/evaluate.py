"""NEL evaluation vs gold (J5 + A5): the Hachey-et-al. metric suite.

Re-expresses ResultsAndEvaluationNEL (/root/reference/src/fr/lip6/reden/
nelinker/ResultsAndEvaluationNEL.java: compareResultsWithGold:201-363,
computeFinalResults:393-557) as Ray aggregates:

- per-mention eval records via a broadcast join links x candidates x gold
  keyed on (url, context_id, mention_id) — the reference aligns output
  and gold POSITIONALLY (:240-257); explicit keys are the shuffle-safe
  equivalent;
- correctness tests are SUBSTRING containment like the reference
  (``chosen.contains(goldURI)``, :289-304);
- the seven headline numbers are single-pass sums over 0/1 indicator
  columns (associative partial aggregation -> tiny final combine).

Metrics (names follow the reference output):
  candidate cardinality mean, candidate precision, candidate recall,
  NIL precision, NIL recall, disambiguation accuracy,
  overall linking accuracy.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

EVAL_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("context_id", pa.int32()),
        ("mention_id", pa.int32()),
        ("surface", pa.string()),
        ("n_cand_groups", pa.int32()),
        ("has_gold", pa.bool_()),
        ("gold_in_cand", pa.bool_()),
        ("has_choice", pa.bool_()),
        ("choice_correct", pa.bool_()),
    ]
)


def eval_records(
    candidates: rd.Dataset, links: rd.Dataset, gold: pa.Table, num_partitions: int = 16
) -> rd.Dataset:
    """Per-mention EvalInfo analogue.

    ``candidates`` (per-mention uri_groups) and ``links`` are both
    CORPUS-SIZED, so they meet in a keyed hash JOIN on
    (url, context_id, mention_id) — never a driver collect.  Only
    ``gold`` (human annotations, inherently small) is broadcast.
    """
    gold_ref = ray.put(
        {
            (u, c, m): g
            for u, c, m, g in zip(
                gold.column("url").to_pylist(),
                gold.column("context_id").to_pylist(),
                gold.column("mention_id").to_pylist(),
                gold.column("gold_uri").to_pylist(),
            )
        }
    )

    # Arrow joins reject list payloads: carry chosen URIs space-joined
    # (also exactly the string the reference substring-compares against)
    def flatten_links(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": batch.column("url"),
                "context_id": batch.column("context_id"),
                "mention_id": batch.column("mention_id"),
                "chosen_str": pa.array(
                    [" ".join(c or []) for c in batch.column("chosen_uris").to_pylist()],
                    pa.string(),
                ),
            }
        )

    links_small = links.map_batches(flatten_links, batch_format="pyarrow")

    # the nested uri_groups column is also a list type: serialize it
    # (groups tab-joined, record-separator-joined) across the join
    def flatten_candidates(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": batch.column("url"),
                "context_id": batch.column("context_id"),
                "mention_id": batch.column("mention_id"),
                "surface": batch.column("surface"),
                "groups_str": pa.array(
                    [
                        "\x1e".join("\t".join(g) for g in gs or [])
                        for gs in batch.column("uri_groups").to_pylist()
                    ],
                    pa.string(),
                ),
            }
        )

    joined = candidates.map_batches(flatten_candidates, batch_format="pyarrow").join(
        links_small,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("url", "context_id", "mention_id"),
    )

    def build(batch: pa.Table) -> pa.Table:
        gold_map = ray.get(gold_ref)
        cols: dict[str, list] = {n: [] for n in EVAL_SCHEMA.names}
        for r in batch.select(
            ["url", "context_id", "mention_id", "surface", "groups_str", "chosen_str"]
        ).to_pylist():
            key = (r["url"], r["context_id"], r["mention_id"])
            gs = r["groups_str"] or ""
            groups = [g.split("\t") for g in gs.split("\x1e")] if gs else []
            gold_uri = gold_map.get(key)
            chosen_str = r["chosen_str"] or ""
            cols["url"].append(r["url"])
            cols["context_id"].append(r["context_id"])
            cols["mention_id"].append(r["mention_id"])
            cols["surface"].append(r["surface"])
            cols["n_cand_groups"].append(len(groups))
            cols["has_gold"].append(gold_uri is not None)
            cols["gold_in_cand"].append(
                gold_uri is not None
                and any(gold_uri in uri for g in groups for uri in g)
            )
            cols["has_choice"].append(bool(chosen_str))
            cols["choice_correct"].append(
                gold_uri is not None and bool(chosen_str) and gold_uri in chosen_str
            )
        return pa.Table.from_arrays(
            [pa.array(cols[f.name], f.type) for f in EVAL_SCHEMA], schema=EVAL_SCHEMA
        )

    return joined.map_batches(build, batch_format="pyarrow")


def align_gold_positional(
    mentions: rd.Dataset, gold: pa.Table, per_type: bool = True
) -> pa.Table:
    """Positional output/gold alignment shim (ResultsAndEvaluationNEL.
    java:240-257): the reference walks the output and gold TEI in
    lockstep — the k-th annotated element (per annotation tag) of
    context i in the output is scored against the k-th of the SAME
    context in the gold, with no mention identity at all.  For gold
    files whose mention enumeration differs from the engine's (e.g. a
    reference-produced gold TEI), this re-keys each gold row to the
    engine mention_id at the same document-order position, after which
    the ordinary keyed ``eval_records`` join applies.

    Scale shape: gold is human-annotated and inherently tiny, so the
    (url, context_id) universe it touches is broadcast; the
    corpus-sized ``mentions`` stream is FILTERED to those contexts
    before the per-context groupby, so the shuffle moves O(|gold|)
    rows, never the corpus.  Positions beyond the shorter side are
    dropped (the reference would walk off the gold NodeList there).
    """
    want: dict[tuple, list] = {}
    has_type = per_type and "ne_type" in gold.schema.names
    for r in gold.to_pylist():
        key = (r["url"], r["context_id"], (r.get("ne_type") or "") if has_type else "")
        want.setdefault(key, []).append(r)
    for rows in want.values():
        rows.sort(key=lambda r: r["mention_id"])
    gold_ref = ray.put(want)
    ctx_keys = {(u, c) for (u, c, _t) in want}

    def in_gold(batch: pa.Table) -> pa.Table:
        mask = [
            (u, c) in ctx_keys
            for u, c in zip(
                batch.column("url").to_pylist(), batch.column("context_id").to_pylist()
            )
        ]
        return batch.select(["url", "context_id", "mention_id", "ne_type"]).filter(
            pa.array(mask, pa.bool_())
        )

    out_schema = pa.schema(
        [
            ("url", pa.string()),
            ("context_id", pa.int32()),
            ("mention_id", pa.int32()),
            ("surface", pa.string()),
            ("ne_type", pa.string()),
            ("gold_uri", pa.string()),
        ]
    )

    def align(group: pa.Table) -> pa.Table:
        gold_map = ray.get(gold_ref)
        rows = sorted(group.to_pylist(), key=lambda r: r["mention_id"])
        url, cid = rows[0]["url"], rows[0]["context_id"]
        cols: dict[str, list] = {n: [] for n in out_schema.names}
        pos: dict[str, int] = {}
        for r in rows:
            t = (r.get("ne_type") or "") if has_type else ""
            g_rows = gold_map.get((url, cid, t))
            k = pos.get(t, 0)
            pos[t] = k + 1
            if not g_rows or k >= len(g_rows):
                continue  # output has more elements than gold at this tag
            g = g_rows[k]
            cols["url"].append(url)
            cols["context_id"].append(cid)
            cols["mention_id"].append(r["mention_id"])  # engine's key
            cols["surface"].append(g.get("surface"))
            cols["ne_type"].append(g.get("ne_type") or r.get("ne_type") or "")
            cols["gold_uri"].append(g["gold_uri"])
        return pa.Table.from_arrays(
            [pa.array(cols[f.name], f.type) for f in out_schema], schema=out_schema
        )

    filtered = mentions.map_batches(in_gold, batch_format="pyarrow", batch_size=None)
    aligned = filtered.groupby(["url", "context_id"]).map_groups(
        align, batch_format="pyarrow"
    )
    # gold-sized by construction (<= |gold| rows): a driver collect is fine
    return pa.Table.from_pylist(aligned.take_all(), schema=out_schema)


def kb_completeness(gold: pa.Table, dictionary: rd.Dataset) -> dict[str, int]:
    """Domain-completeness probe (extra/CalculatePopulationCompleteness
    LD.java:48-113): how many gold URIs exist in the KB dictionary at
    all — an upper bound on achievable recall.  Semi/anti-join shape
    with the small gold side broadcast."""
    gold_uris = {u for u in gold.column("gold_uri").to_pylist() if u}

    def batch_hits(batch: pa.Table) -> pa.Table:
        found = set()
        for group in batch.column("uri_group").to_pylist():
            for u in group:
                if u in gold_uris:
                    found.add(u)
        return pa.table({"uri": pa.array(sorted(found), pa.string())})

    covered = set()
    for r in dictionary.map_batches(batch_hits, batch_format="pyarrow").take_all():
        covered.add(r["uri"])
    return {
        "gold_uris": len(gold_uris),
        "in_kb": len(covered),
        "missing": len(gold_uris - covered),
    }


def compare_runs(
    records_a: rd.Dataset, records_b: rd.Dataset, num_partitions: int = 8
) -> dict[str, int]:
    """Run-vs-run diff (extra/CompareResults.java:43-96): per-mention
    correct sets intersected/differenced via a keyed join."""
    def proj(tag):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "url": batch.column("url"),
                    "context_id": batch.column("context_id"),
                    "mention_id": batch.column("mention_id"),
                    f"correct_{tag}": pc.cast(batch.column("choice_correct"), pa.int64()),
                }
            )

        return f

    a = records_a.map_batches(proj("a"), batch_format="pyarrow")
    b = records_b.map_batches(proj("b"), batch_format="pyarrow")
    joined = a.join(b, join_type="inner", num_partitions=num_partitions,
                    on=("url", "context_id", "mention_id"))

    def counts(batch: pa.Table) -> pa.Table:
        # Vectorized 2x2 contingency: bucket = 2*a + b, bincount.
        import numpy as np

        ca = np.asarray(
            pc.fill_null(pc.cast(batch.column("correct_a"), pa.bool_()), False)
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        cb = np.asarray(
            pc.fill_null(pc.cast(batch.column("correct_b"), pa.bool_()), False)
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        bins = np.bincount(2 * ca.astype(np.int64) + cb.astype(np.int64), minlength=4)
        return pa.table(
            {
                "both": pa.array([int(bins[3])], pa.int64()),
                "only_a": pa.array([int(bins[2])], pa.int64()),
                "only_b": pa.array([int(bins[1])], pa.int64()),
                "neither": pa.array([int(bins[0])], pa.int64()),
            }
        )

    out = {"both": 0, "only_a": 0, "only_b": 0, "neither": 0}
    for r in joined.map_batches(counts, batch_format="pyarrow").take_all():
        for k in out:
            out[k] += r[k]
    return out


_DIFF_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("context_id", pa.int64()),
        ("mention_id", pa.int64()),
        ("chosen_a", pa.string()),
        ("chosen_b", pa.string()),
        ("status", pa.string()),
    ]
)


def diff_runs(
    links_a: rd.Dataset, links_b: rd.Dataset, num_partitions: int | None = None
) -> rd.Dataset:
    """Per-mention diff of two NEL runs' LINKS tables — the wired
    run-diff tool (extra/CompareResults.java:43-96; the reference
    intersects two runs' output files mention by mention).

    Full-outer keyed join on (url, context_id, mention_id); emits one
    row per differing mention with ``status`` in {changed, only_a,
    only_b} and both chosen strings.  Identical mentions are filtered
    OUT distributedly — the common case (two near-identical runs at
    corpus scale) returns a small Dataset.
    """
    from ..stages.joins import default_join_partitions

    def proj(tag):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "url": batch.column("url"),
                    "context_id": pc.cast(batch.column("context_id"), pa.int64()),
                    "mention_id": pc.cast(batch.column("mention_id"), pa.int64()),
                    f"chosen_{tag}": pa.array(
                        [" ".join(c or []) for c in batch.column("chosen_uris").to_pylist()],
                        pa.string(),
                    ),
                }
            )

        return f

    from ..stages.joins import staged_nonempty

    # Full-outer joins hit the same Ray 2.49 first-block schema-broadcast
    # trap as build sides: an entirely-empty run (or leading empty blocks
    # off a filter-heavy read) must be staged+compacted, and an empty
    # side short-circuits to all-only_a / all-only_b rows.
    a = staged_nonempty(links_a.map_batches(proj("a"), batch_format="pyarrow"))
    b = staged_nonempty(links_b.map_batches(proj("b"), batch_format="pyarrow"))
    if a is None and b is None:
        return rd.from_arrow(_DIFF_SCHEMA.empty_table())
    if a is None or b is None:
        side, tag = (b, "b") if a is None else (a, "a")

        def lift(batch: pa.Table, tag=tag) -> pa.Table:
            n = batch.num_rows
            return pa.table(
                {
                    "url": batch.column("url"),
                    "context_id": batch.column("context_id"),
                    "mention_id": batch.column("mention_id"),
                    "chosen_a": batch.column("chosen_a")
                    if tag == "a"
                    else pa.nulls(n, pa.string()),
                    "chosen_b": batch.column("chosen_b")
                    if tag == "b"
                    else pa.nulls(n, pa.string()),
                    "status": pa.array([f"only_{tag}"] * n, pa.string()),
                }
            )

        return side.map_batches(lift, batch_format="pyarrow")
    joined = a.join(
        b,
        join_type="full_outer",
        num_partitions=num_partitions or default_join_partitions(),
        on=("url", "context_id", "mention_id"),
    )

    def classify(batch: pa.Table) -> pa.Table:
        cols = {k: [] for k in ("url", "context_id", "mention_id", "chosen_a", "chosen_b", "status")}
        for r in batch.to_pylist():
            in_a = r.get("chosen_a") is not None
            in_b = r.get("chosen_b") is not None
            if in_a and in_b and r["chosen_a"] == r["chosen_b"]:
                continue  # identical: drop distributedly
            cols["url"].append(r["url"])
            cols["context_id"].append(r["context_id"])
            cols["mention_id"].append(r["mention_id"])
            cols["chosen_a"].append(r.get("chosen_a"))
            cols["chosen_b"].append(r.get("chosen_b"))
            cols["status"].append(
                "changed" if in_a and in_b else ("only_a" if in_a else "only_b")
            )
        return pa.table(
            {
                "url": pa.array(cols["url"], pa.string()),
                "context_id": pa.array(cols["context_id"], pa.int64()),
                "mention_id": pa.array(cols["mention_id"], pa.int64()),
                "chosen_a": pa.array(cols["chosen_a"], pa.string()),
                "chosen_b": pa.array(cols["chosen_b"], pa.string()),
                "status": pa.array(cols["status"], pa.string()),
            }
        )

    return joined.map_batches(classify, batch_format="pyarrow")


def score_pairs_export(records_a: rd.Dataset, records_b: rd.Dataset) -> rd.Dataset:
    """Per-mention 0/1 correctness pairs — the significance-test data
    prep (extra/SignificanceTesting.java:23-53 exports these for R)."""

    def proj(tag):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "url": batch.column("url"),
                    "context_id": batch.column("context_id"),
                    "mention_id": batch.column("mention_id"),
                    f"correct_{tag}": pc.cast(batch.column("choice_correct"), pa.int64()),
                }
            )

        return f

    a = records_a.map_batches(proj("a"), batch_format="pyarrow")
    b = records_b.map_batches(proj("b"), batch_format="pyarrow")
    return a.join(b, join_type="inner", num_partitions=8,
                  on=("url", "context_id", "mention_id"))


def significance_pairs(
    links_a: rd.Dataset, links_b: rd.Dataset, num_partitions: int | None = None
) -> rd.Dataset:
    """Paired per-mention SCORES of two runs — the significance-test
    data prep (extra/SignificanceTesting.java:55-113: parses
    ``ref_auto="uri(score)"`` out of two annotated outputs into a
    paired ``degree\\teigenvector`` TSV for R's paired t-test).

    Here the scores come straight from the links tables (no XML round
    trip): rows (url, context_id, mention_id, score_a, score_b), with
    0.0 for a mention the run left unlinked — exactly the reference's
    null -> 0.0 rule (:81-93)."""
    from ..stages.joins import default_join_partitions

    def proj(tag):
        def f(batch: pa.Table) -> pa.Table:
            scores = [
                float(s) if (c and s is not None) else 0.0
                for s, c in zip(
                    batch.column("score").to_pylist(),
                    batch.column("chosen_uris").to_pylist(),
                )
            ]
            return pa.table(
                {
                    "url": batch.column("url"),
                    "context_id": pc.cast(batch.column("context_id"), pa.int64()),
                    "mention_id": pc.cast(batch.column("mention_id"), pa.int64()),
                    f"score_{tag}": pa.array(scores, pa.float64()),
                }
            )

        return f

    from ..stages.joins import staged_nonempty

    # Same staging discipline as diff_runs: an empty run short-circuits
    # to the other side with its score column zero-filled (the null ->
    # 0.0 rule applied wholesale).
    a = staged_nonempty(links_a.map_batches(proj("a"), batch_format="pyarrow"))
    b = staged_nonempty(links_b.map_batches(proj("b"), batch_format="pyarrow"))
    if a is None and b is None:
        return rd.from_arrow(
            pa.schema(
                [
                    ("url", pa.string()),
                    ("context_id", pa.int64()),
                    ("mention_id", pa.int64()),
                    ("score_a", pa.float64()),
                    ("score_b", pa.float64()),
                ]
            ).empty_table()
        )
    if a is None or b is None:
        side, have = (b, "b") if a is None else (a, "a")
        missing = "a" if have == "b" else "b"

        def zero_fill(batch: pa.Table, have=have, missing=missing) -> pa.Table:
            return pa.table(
                {
                    "url": batch.column("url"),
                    "context_id": batch.column("context_id"),
                    "mention_id": batch.column("mention_id"),
                    "score_a": batch.column("score_a")
                    if have == "a"
                    else pa.array([0.0] * batch.num_rows, pa.float64()),
                    "score_b": batch.column("score_b")
                    if have == "b"
                    else pa.array([0.0] * batch.num_rows, pa.float64()),
                }
            )

        return side.map_batches(zero_fill, batch_format="pyarrow")
    joined = a.join(
        b,
        join_type="full_outer",
        num_partitions=num_partitions or default_join_partitions(),
        on=("url", "context_id", "mention_id"),
    )

    def fill(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": batch.column("url"),
                "context_id": batch.column("context_id"),
                "mention_id": batch.column("mention_id"),
                "score_a": pc.fill_null(batch.column("score_a"), 0.0),
                "score_b": pc.fill_null(batch.column("score_b"), 0.0),
            }
        )

    return joined.map_batches(fill, batch_format="pyarrow")


def paired_t_stats(pairs: rd.Dataset) -> dict[str, float]:
    """Paired-t summary over the significance pairs, computed as
    associative aggregates (sum / sum-of-squares of the per-mention
    score difference) — the distributed stand-in for the reference's
    R snippet (SignificanceTesting.java:42-52)."""
    import math

    def diffs(batch: pa.Table) -> pa.Table:
        d = pc.subtract(batch.column("score_a"), batch.column("score_b"))
        return pa.table({"d": d, "d2": pc.multiply(d, d)})

    agg = pairs.map_batches(diffs, batch_format="pyarrow").aggregate(
        Sum("d", alias_name="sum_d"), Sum("d2", alias_name="sum_d2"), Count(alias_name="n")
    )
    n = int(agg["n"])
    if n < 2:
        return {"n": n, "mean_diff": 0.0, "sd_diff": 0.0, "t": 0.0}
    mean = agg["sum_d"] / n
    var = max(0.0, (agg["sum_d2"] - n * mean * mean) / (n - 1))
    sd = math.sqrt(var)
    t = mean / (sd / math.sqrt(n)) if sd > 0 else 0.0
    return {"n": n, "mean_diff": mean, "sd_diff": sd, "t": t}


def _indicators(batch: pa.Table) -> pa.Table:
    """0/1 indicator columns for the associative metric sums."""
    rows = batch.to_pylist()
    out = {
        "n_cand_groups": [], "manual": [], "manual_nil": [], "nonempty": [],
        "nonempty_correct_in": [], "manual_correct_in": [], "empty": [],
        "empty_and_nil": [], "ambig_correct_in": [], "ambig_correct_choice": [],
        "good_choice": [], "good_nil": [],
    }
    for r in rows:
        n, has_gold = r["n_cand_groups"], r["has_gold"]
        gin, has_choice, correct = r["gold_in_cand"], r["has_choice"], r["choice_correct"]
        out["n_cand_groups"].append(n)
        out["manual"].append(int(has_gold))
        out["manual_nil"].append(int(not has_gold))
        out["nonempty"].append(int(n > 0))
        out["nonempty_correct_in"].append(int(n > 0 and gin))
        out["manual_correct_in"].append(int(has_gold and gin))
        out["empty"].append(int(n == 0))
        out["empty_and_nil"].append(int(n == 0 and not has_gold))
        out["ambig_correct_in"].append(int(n > 1 and gin))
        out["ambig_correct_choice"].append(int(n > 1 and gin and correct))
        out["good_choice"].append(int(has_gold and correct))
        out["good_nil"].append(int(n == 0 and not has_gold and not has_choice))
    return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})


def compute_metrics(records: rd.Dataset) -> dict[str, float]:
    """The seven headline metrics (ResultsAndEvaluationNEL.java:393-557)."""
    ind = records.map_batches(_indicators, batch_format="pyarrow")
    aggs = [Sum(c, alias_name=c) for c in [
        "n_cand_groups", "manual", "manual_nil", "nonempty", "nonempty_correct_in",
        "manual_correct_in", "empty", "empty_and_nil", "ambig_correct_in",
        "ambig_correct_choice", "good_choice", "good_nil",
    ]] + [Count(alias_name="n_mentions")]
    s = ind.aggregate(*aggs)

    def div(a, b):
        return float(a) / b if b else 0.0

    return {
        "n_mentions": int(s["n_mentions"]),
        "n_manual": int(s["manual"]),
        "n_manual_nil": int(s["manual_nil"]),
        "candidate_cardinality_mean": div(s["n_cand_groups"], s["n_mentions"]),
        "candidate_precision": div(s["nonempty_correct_in"], s["nonempty"]),
        "candidate_recall": div(s["manual_correct_in"], s["manual"]),
        "nil_precision": div(s["empty_and_nil"], s["empty"]),
        "nil_recall": div(s["empty_and_nil"], s["manual_nil"]),
        "disambiguation_accuracy": div(s["ambig_correct_choice"], s["ambig_correct_in"]),
        "overall_linking_accuracy": div(s["good_choice"] + s["good_nil"], s["n_mentions"]),
    }
