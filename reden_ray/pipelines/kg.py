"""The flagship KG-construction pipeline: pages -> links + triples.

Ray-Data re-expression of the reference's NEL entry point
(MainNELApp mode 1, /root/reference/src/fr/lip6/reden/MainNELApp.java:
184-361) per SURVEY.md §3.1:

    read_parquet(pages)                       # S1, column-pruned
      -> map_batches(pages_to_contexts)       # S2 (html dropped here)
      -> map_batches(contexts_to_mentions)    # M4 + M1
      -> map_batches(CandidateLookup, ...)    # J2/A1, actor pool
      -> groupby(url, context_id)
           .map_groups(ContextLinker, ...)    # J1/J3 + fuse/prune/score/choose
      -> combined links+triples Dataset       # S7/S8 sinks

SCALE NOTES (10^12 docs, 100 TB):
- the read prunes to (url, html): ``text``/``lang``/``warc_ts`` never
  leave storage unless a stage needs them;
- dictionary + adjacency are BROADCAST side tables (``ray.put`` once;
  each node's object store holds one copy; actors build their index in
  ``__init__``).  When a KB outgrows node memory, swap in the
  shuffle-join variant (stages.joins) for candidates and a hash-sharded
  actor pool for adjacency — same schemas either side;
- the only all-to-all exchange is the groupby on (url, context_id) —
  the minimum possible: the per-context algorithm is a whole-graph
  computation over exactly that key.  Context groups are intrinsically
  small (a paragraph's mentions), so no skew salt is needed on the
  GROUP key; hot-entity skew lives INSIDE the adjacency index (lookup,
  not shuffle — a famous URI's large neighbor list is read locally,
  never re-shipped per batch) and in downstream aggregates
  (pre-aggregated per batch before the small groupby);
- one execution feeds both outputs: links and triples travel in one
  combined dataset discriminated by ``record_type`` and are split at
  write time with ``partition_cols`` (no double execution, no
  mid-pipeline materialize).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..config import ExecConfig, LinkerConfig
from ..stages.candidates import CandidateLookup, make_candidate_lookup_fn
from ..stages.extract import contexts_to_mentions, extract_text_batch, pages_to_contexts
from ..stages.graphstage import BucketedContextLinker, make_context_linker_fn


def use_hash_shuffle() -> None:
    """Switch Ray Data's groupby implementation to hash shuffle.

    The default sort-based shuffle coalesces output to ~128 MiB blocks;
    for this pipeline that collapses the fusion stage to a HANDFUL of
    map_groups tasks (measured: 1 task for a 45k-row candidate set) and
    serializes the per-context work.  Hash shuffle honors
    ``num_partitions`` so bucket parallelism is explicit.  Global
    (DataContext) and idempotent.
    """
    from ray.data.context import ShuffleStrategy

    ctx = rd.DataContext.get_current()
    if ctx.shuffle_strategy != ShuffleStrategy.HASH_SHUFFLE:
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE


def load_rel_weights(rels_table: pa.Table) -> dict[str, float]:
    """rels.txt analogue: predicate (lowercased) -> weight
    (GraphHandlerNEL.java:236-249)."""
    return {
        p.lower(): w
        for p, w in zip(
            rels_table.column("pred").to_pylist(), rels_table.column("weight").to_pylist()
        )
    }


def mentions_dataset(pages: rd.Dataset, exec_cfg: ExecConfig | None = None) -> rd.Dataset:
    """pages -> mention rows (stateless, fused by the streaming executor).

    ``batch_size=None`` everywhere: one batch == one upstream BLOCK, so
    task parallelism equals block count end to end.  A row-count
    batch_size here would re-bundle blocks (fused operators count INPUT
    page rows, and a whole small corpus can fit one 4096-row batch,
    serializing the pipeline — measured).  Memory is bounded by block
    size, which the read controls."""
    return pages.map_batches(
        pages_to_contexts, batch_format="pyarrow", batch_size=None
    ).map_batches(contexts_to_mentions, batch_format="pyarrow", batch_size=None)


def candidates_dataset(
    mentions: rd.Dataset,
    dict_ref,
    cfg: LinkerConfig,
    exec_cfg: ExecConfig | None = None,
) -> rd.Dataset:
    exec_cfg = exec_cfg or ExecConfig()
    if exec_cfg.stateless:
        return mentions.map_batches(
            make_candidate_lookup_fn(dict_ref, cfg), batch_format="pyarrow", batch_size=None
        )
    return mentions.map_batches(
        CandidateLookup,
        fn_constructor_args=(dict_ref, cfg),
        batch_format="pyarrow",
        batch_size=None,
        concurrency=exec_cfg.lookup_concurrency,
        num_cpus=1,
    )


def untagged_mentions_dataset(pages: rd.Dataset) -> rd.Dataset:
    """pages -> heuristic-NER mention rows (untagged web text; ne_type
    'ANY' routes candidate lookup across every per-type dictionary)."""
    from ..stages.ner import contexts_to_untagged_mentions

    return pages.map_batches(
        pages_to_contexts, batch_format="pyarrow", batch_size=None
    ).map_batches(contexts_to_untagged_mentions, batch_format="pyarrow", batch_size=None)


def run_untagged_pipeline(
    fixture_dir: str,
    exec_cfg: ExecConfig | None = None,
) -> rd.Dataset:
    """The no-annotations variant of the flagship pipeline: heuristic
    NER instead of pre-tagged spans; everything downstream identical."""
    import dataclasses

    cfg = dataclasses.replace(fixture_config(fixture_dir), ne_types=("ANY",))
    pages = rd.read_parquet(f"{fixture_dir}/pages.parquet", columns=["url", "html"])
    dictionary = pq.read_table(f"{fixture_dir}/dictionary.parquet")
    adjacency = pq.read_table(f"{fixture_dir}/adjacency.parquet")
    dict_ref = ray.put(dictionary)
    adj_ref = ray.put(adjacency)
    ments = untagged_mentions_dataset(pages)
    cands = candidates_dataset(ments, dict_ref, cfg, exec_cfg)
    return linked_dataset(cands, adj_ref, cfg, exec_cfg)


def dict_tagged_mentions_dataset(
    pages: rd.Dataset, dict_ref, exec_cfg: ExecConfig | None = None
) -> rd.Dataset:
    """pages -> dictionary-alias-tagged mention rows (the semi-automatic
    annotation path, stages.dicttag): exact longest-match alias sweep,
    typed from the dictionary — actor pool so the alias trie is built
    once per actor."""
    from ..stages.dicttag import DictionaryTagger, make_dict_tagger_fn

    exec_cfg = exec_cfg or ExecConfig()
    contexts = pages.map_batches(pages_to_contexts, batch_format="pyarrow", batch_size=None)
    if exec_cfg.stateless:
        return contexts.map_batches(
            make_dict_tagger_fn(dict_ref), batch_format="pyarrow", batch_size=None
        )
    return contexts.map_batches(
        DictionaryTagger,
        fn_constructor_args=(dict_ref,),
        batch_format="pyarrow",
        batch_size=None,
        concurrency=exec_cfg.lookup_concurrency,
        num_cpus=1,
    )


def run_dict_tagged_pipeline(
    fixture_dir: str,
    exec_cfg: ExecConfig | None = None,
) -> rd.Dataset:
    """Third pipeline variant (SemiAutomaticTEIAnnotation.java parity):
    untagged corpus pre-tagged by the dictionary-alias sweep instead of
    heuristic NER; everything downstream identical.

    The tagger types mentions from the dictionary, so the configured
    type order keeps its usual entries PLUS 'ANY' last — cross-kind
    homonym aliases are tagged 'ANY' (candidate lookup unions kinds)
    and must survive rebuild_candidate_map's per-type merge."""
    import dataclasses

    cfg = fixture_config(fixture_dir)
    cfg = dataclasses.replace(cfg, ne_types=tuple(cfg.ne_types) + ("ANY",))
    pages = rd.read_parquet(f"{fixture_dir}/pages.parquet", columns=["url", "html"])
    dictionary = pq.read_table(f"{fixture_dir}/dictionary.parquet")
    adjacency = pq.read_table(f"{fixture_dir}/adjacency.parquet")
    dict_ref = ray.put(dictionary)
    adj_ref = ray.put(adjacency)
    ments = dict_tagged_mentions_dataset(pages, dict_ref, exec_cfg)
    cands = candidates_dataset(ments, dict_ref, cfg, exec_cfg)
    return linked_dataset(cands, adj_ref, cfg, exec_cfg)


def candidates_dataset_join(
    mentions: rd.Dataset,
    dictionary: pa.Table,
    cfg: LinkerConfig,
    exec_cfg: ExecConfig | None = None,
) -> rd.Dataset:
    """SHUFFLE-JOIN candidate generation — the 10^12-doc scale path for
    dictionaries too large to broadcast (J2 as a real exchange).

    mentions LEFT OUTER JOIN dictionary on (norm, ne_type) ==
    (alias_norm, kind) via Ray's hash join, then per-context bucket
    groupby reassembles the per-mention group lists with the exact
    DictionaryIndex cap/dedup/row-order semantics
    (stages.candidates.JoinedCandidateAssembler).  Output schema equals
    the broadcast path's, so the fusion stage is oblivious — but note
    the join SCATTERS context rows, so downstream fusion must use
    ``mode="hash"`` (or consume this stage's bucket-grouped output,
    which re-co-locates contexts; run_pipeline handles it).

    Call ``use_hash_shuffle()`` before creating ``mentions`` when using
    this path.  Limitation: ne_type='ANY' (untagged NER) mentions need
    the broadcast/sharded lookup or a dictionary pre-exploded across
    kinds — the equi-join matches kinds exactly.
    """
    from ..stages.candidates import JoinedCandidateAssembler

    exec_cfg = exec_cfg or ExecConfig()
    if "dict_row" not in dictionary.column_names:
        dictionary = dictionary.append_column(
            "dict_row", pa.array(range(dictionary.num_rows), pa.int64())
        )
    # Arrow's hash join rejects list-typed payload columns: ship the URI
    # group tab-joined as a plain string, split downstream
    dict_ds = rd.from_arrow(
        pa.table(
            {
                "alias_norm": dictionary.column("alias_norm"),
                "kind": dictionary.column("kind"),
                "uri_group_str": pa.array(
                    ["\t".join(g) for g in dictionary.column("uri_group").to_pylist()],
                    pa.string(),
                ),
                "dict_row": dictionary.column("dict_row"),
            }
        )
    )
    joined = mentions.join(
        dict_ds,
        join_type="left_outer",
        num_partitions=exec_cfg.join_buckets,
        on=("norm", "ne_type"),
        right_on=("alias_norm", "kind"),
    )

    n_buckets = exec_cfg.fuse_buckets

    def add_bucket(batch: pa.Table) -> pa.Table:
        import hashlib

        keys = [
            int.from_bytes(
                hashlib.blake2b(f"{u}\x00{c}".encode(), digest_size=4).digest(), "big"
            )
            % n_buckets
            for u, c in zip(
                batch.column("url").to_pylist(), batch.column("context_id").to_pylist()
            )
        ]
        return batch.append_column("bucket", pa.array(keys, pa.int32()))

    return (
        joined.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket", num_partitions=n_buckets)
        .map_groups(
            JoinedCandidateAssembler,
            fn_constructor_args=(cfg,),
            batch_format="pyarrow",
            concurrency=exec_cfg.lookup_concurrency,
            num_cpus=1,
        )
    )


def linked_dataset(
    candidates: rd.Dataset,
    adj_ref,
    cfg: LinkerConfig,
    exec_cfg: ExecConfig | None = None,
    mode: str = "local",
) -> rd.Dataset:
    """Per-context fusion: the combined links+triples dataset.

    ``mode="local"`` (default, ZERO-SHUFFLE): a context's mention rows
    are born co-located — they all come from one page row and every
    upstream stage is a block-local map — so the fusion is a plain
    ``map_batches(batch_size=None)`` that groups by (url, context_id)
    INSIDE each block.  The whole flagship pipeline is then a pure
    streaming map with no all-to-all exchange at any scale.  Invariant
    required: blocks must contain whole contexts, which holds as long as
    upstream blocks stay under ``target_max_block_size`` (Ray only
    splits oversized blocks; size the read blocks accordingly).

    ``mode="hash"``: contexts hash-bucketed (stable blake2 of
    (url, context_id)) + groupby(bucket, num_partitions) — for inputs
    where context rows ARE scattered (e.g. a re-read candidates table
    partitioned arbitrarily).  Requires hash shuffle (use_hash_shuffle).
    """
    exec_cfg = exec_cfg or ExecConfig()
    if mode == "local":
        if exec_cfg.stateless:
            return candidates.map_batches(
                make_context_linker_fn(adj_ref, cfg),
                batch_format="pyarrow",
                batch_size=None,
            )
        return candidates.map_batches(
            BucketedContextLinker,
            fn_constructor_args=(adj_ref, cfg),
            batch_format="pyarrow",
            batch_size=None,  # whole blocks: contexts never split
            concurrency=exec_cfg.fuse_concurrency,
            num_cpus=1,
        )

    n_buckets = exec_cfg.fuse_buckets

    from ray.data.context import ShuffleStrategy

    if rd.DataContext.get_current().shuffle_strategy != ShuffleStrategy.HASH_SHUFFLE:
        import warnings

        warnings.warn(
            "linked_dataset(mode='hash') without use_hash_shuffle(): the "
            "sort-based shuffle ignores num_partitions and can collapse "
            "the fusion stage to one task (correct but serial)",
            stacklevel=2,
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        import hashlib

        keys = [
            int.from_bytes(
                hashlib.blake2b(f"{u}\x00{c}".encode(), digest_size=4).digest(), "big"
            )
            % n_buckets
            for u, c in zip(
                batch.column("url").to_pylist(), batch.column("context_id").to_pylist()
            )
        ]
        return batch.append_column("bucket", pa.array(keys, pa.int32()))

    return (
        candidates.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket", num_partitions=n_buckets)
        .map_groups(
            BucketedContextLinker,
            fn_constructor_args=(adj_ref, cfg),
            batch_format="pyarrow",
            concurrency=exec_cfg.fuse_concurrency,
            num_cpus=1,
        )
    )


def run_pipeline(
    pages: rd.Dataset,
    dictionary: pa.Table,
    adjacency: pa.Table,
    cfg: LinkerConfig,
    exec_cfg: ExecConfig | None = None,
) -> rd.Dataset:
    """Wire the full DAG; returns the lazy combined dataset.

    The default fusion mode is ZERO-SHUFFLE (see linked_dataset); no
    shuffle-strategy change is needed or made here.  Callers using
    ``mode="hash"`` must call ``use_hash_shuffle()`` BEFORE creating the
    ``pages`` dataset (Ray snapshots the DataContext at creation), and
    should leave it unset otherwise — the hash strategy's default
    partition count (200 aggregator actors) slows unrelated small
    groupbys by an order of magnitude (measured)."""
    dict_ref = ray.put(dictionary)
    adj_ref = ray.put(adjacency)
    ments = mentions_dataset(pages, exec_cfg)
    cands = candidates_dataset(ments, dict_ref, cfg, exec_cfg)
    return linked_dataset(cands, adj_ref, cfg, exec_cfg)


def links_view(combined: rd.Dataset) -> rd.Dataset:
    """links logical table (filter is a cheap vectorized map)."""
    return combined.map_batches(
        lambda t: t.filter(pc.equal(t["record_type"], "link")).select(
            ["url", "context_id", "route", "mention_id", "surface", "ne_type",
             "chosen_uris", "score", "method"]
        ),
        batch_format="pyarrow",
    )


def triples_view(combined: rd.Dataset) -> rd.Dataset:
    """(subj, pred, obj) triples — the reference artifact to P/R-match
    (the graph dump S8, nelinker/Util.java:32-44)."""
    return combined.map_batches(
        lambda t: t.filter(pc.equal(t["record_type"], "triple")).select(
            ["url", "context_id", "subj", "pred", "obj", "weight"]
        ),
        batch_format="pyarrow",
    )


def verify_text_invariant(pages: rd.Dataset) -> int:
    """Number of pages whose stored ``text`` differs from
    ``extract_text(html)`` — must be 0 (BASELINE.json input_hint)."""

    def check(batch: pa.Table) -> pa.Table:
        batch = extract_text_batch(batch)
        bad = pc.sum(
            pc.cast(pc.invert(pc.equal(batch["text"], batch["text_extracted"])), pa.int64())
        ).as_py() or 0
        return pa.table({"bad": pa.array([bad], pa.int64())})

    out = pages.map_batches(check, batch_format="pyarrow")
    return sum(r["bad"] for r in out.take_all())


# ---------------------------------------------------------------------------
# fixture-backed convenience entry points (tests, __ray_entry__, bench)
# ---------------------------------------------------------------------------

def fixture_config(fixture_dir: str) -> LinkerConfig:
    rels = pq.read_table(f"{fixture_dir}/rels.parquet")
    return LinkerConfig(rel_weights=load_rel_weights(rels))


def run_fixture_pipeline(
    fixture_dir: str,
    exec_cfg: ExecConfig | None = None,
    cfg: LinkerConfig | None = None,
    override_num_blocks: int | None = None,
) -> rd.Dataset:
    """Read the synthetic corpus + KB from ``fixture_dir`` and run the
    flagship pipeline; returns the combined links+triples dataset.

    ``override_num_blocks`` splits the read into enough blocks to feed
    every actor when the input is a single small parquet file (a bench
    concern only; real corpora arrive as many files)."""
    cfg = cfg or fixture_config(fixture_dir)
    pages = rd.read_parquet(
        f"{fixture_dir}/pages.parquet",
        columns=["url", "html"],
        override_num_blocks=override_num_blocks,
    )
    dictionary = pq.read_table(f"{fixture_dir}/dictionary.parquet")
    adjacency = pq.read_table(f"{fixture_dir}/adjacency.parquet")
    return run_pipeline(pages, dictionary, adjacency, cfg, exec_cfg)
