"""URI canonicalization: groupby-aggregate equivalence merge (J3 + the
north-rule canonicalization stage).

The reference expands sameAs links one hop from each base URI
(GraphHandlerNEL.retrieveAndLoadSameAsRDFData:114-197) and keeps the
base as the hub.  At corpus scale the same information — sameAs
statements in the adjacency table plus the dictionary's uri_groups —
defines an equivalence RELATION whose connected components are the
canonical entities.  This stage computes components with bounded
iterative MIN-LABEL PROPAGATION expressed as Ray groupbys (no driver
union-find):

    pairs(u, v)  ->  labels(u) = min over neighbors' labels  ->  repeat

Each iteration is one groupby; the iteration count is bounded by the
longest chain in the equivalence graph (sameAs chains in practice are
1-3 hops; ``max_iters`` documents and enforces the bound — components
wider than that keep distinct labels and the loop reports convergence
state rather than silently merging).

``canonicalize_triples`` then rewrites subj/obj through the resulting
map (broadcast — the map is entity-count-sized, tiny next to triples).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


def equivalence_pairs(adjacency: rd.Dataset, same_as: str, dictionary: rd.Dataset | None = None) -> rd.Dataset:
    """Symmetric (u, v) pairs from sameAs statements and dictionary
    uri_groups (each group links consecutive members to its base)."""

    def from_adj(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.equal(batch["pred"], same_as))
        subj = keep.column("subj").to_pylist()
        obj = keep.column("obj").to_pylist()
        return pa.table(
            {
                "u": pa.array(subj + obj, pa.string()),
                "v": pa.array(obj + subj, pa.string()),
            }
        )

    pairs = adjacency.map_batches(from_adj, batch_format="pyarrow")
    if dictionary is not None:

        def from_dict(batch: pa.Table) -> pa.Table:
            us, vs = [], []
            for group in batch.column("uri_group").to_pylist():
                base = group[0]
                for other in group[1:]:
                    us += [base, other]
                    vs += [other, base]
            return pa.table({"u": pa.array(us, pa.string()), "v": pa.array(vs, pa.string())})

        pairs = pairs.union(dictionary.map_batches(from_dict, batch_format="pyarrow"))
    return pairs


# connected_components broadcasts the per-iteration label map via
# ray.put — fine for KG-output-sized graphs, entity-count-bounded.
# Above this many edge rows it raises and points at the join variant
# so a misrouted KB-scale input can't materialize on the driver.
BROADCAST_CC_MAX_PAIRS = 2_000_000


def connected_components(
    pairs: rd.Dataset, max_iters: int = 5, prefer_prefix: str | None = None
) -> tuple[pa.Table, bool]:
    """(uri -> canonical label) via iterative min-label propagation.

    Returns (mapping table, converged).  Each iteration: label(u) =
    min(label(u), min(label(v) for neighbors v)), expressed as a
    self-union + groupby-min — pure dataset ops, shuffle-partitioned by
    ``u``, no driver-side graph.

    ``prefer_prefix``: canonical representatives matching this prefix
    (e.g. the base KB) win over lexicographically-smaller equivalents —
    implemented by rank-prefixing the propagated labels, mirroring the
    reference's base-URI-as-hub convention (GraphHandlerNEL.java:251+).

    SCALE GUARD: the label map is driver-broadcast, so inputs over
    ``BROADCAST_CC_MAX_PAIRS`` edges raise — use
    ``connected_components_join_ds`` (same algebra, all-shuffle) there.
    """
    pairs = pairs.materialize()
    n_pairs = pairs.count()
    if n_pairs > BROADCAST_CC_MAX_PAIRS:
        raise ValueError(
            f"connected_components: {n_pairs} edge rows exceeds the "
            f"driver-broadcast budget ({BROADCAST_CC_MAX_PAIRS}); use "
            "connected_components_join_ds for KB-scale graphs"
        )

    def rank(uri: str) -> str:
        if prefer_prefix is not None and prefer_prefix in uri:
            return "0|" + uri
        return "1|" + uri

    def unrank(label: str) -> str:
        return label.split("|", 1)[1]

    # initial label: the node itself (rank-prefixed)
    labels = pairs.groupby("u").map_groups(
        lambda g: pa.table(
            {"u": [g.column("u")[0].as_py()], "label": [rank(g.column("u")[0].as_py())]}
        ),
        batch_format="pyarrow",
    ).materialize()

    from ray.data.aggregate import Min

    converged = False
    label_map = {r["u"]: r["label"] for r in labels.take_all()}
    for _ in range(max_iters):
        ref = ray.put(label_map)

        def propagate(batch: pa.Table) -> pa.Table:
            lm = ray.get(ref)
            us = batch.column("u").to_pylist()
            vs = batch.column("v").to_pylist()
            return pa.table(
                {
                    "u": pa.array(us, pa.string()),
                    "label": pa.array([lm.get(v, rank(v)) for v in vs], pa.string()),
                }
            )

        # candidate labels: own label + neighbors' labels, keep min.
        # NOTE the per-iteration label map travels via ray.put broadcast;
        # at KB scale (10^9 entities) swap the broadcast for a hash join
        # pairs x labels on v — same algebra, all-shuffle.
        neigh = pairs.map_batches(propagate, batch_format="pyarrow")
        new_labels = (
            labels.union(neigh).groupby("u").aggregate(Min("label", alias_name="label")).materialize()
        )
        new_map = {r["u"]: r["label"] for r in new_labels.take_all()}
        labels = new_labels
        if new_map == label_map:
            converged = True
            label_map = new_map
            break
        label_map = new_map

    items = sorted(label_map.items())
    t = pa.table(
        {
            "uri": pa.array([k for k, _ in items], pa.string()),
            "canonical": pa.array([unrank(v) for _, v in items], pa.string()),
        }
    )
    return t, converged


def connected_components_join_ds(
    pairs: rd.Dataset,
    max_iters: int = 5,
    prefer_prefix: str | None = None,
    num_partitions: int | None = None,
) -> tuple[rd.Dataset, bool]:
    """All-shuffle variant of ``connected_components``: the per-iteration
    label lookup is a hash JOIN ``pairs ⨝ labels ON v`` instead of a
    driver-broadcast map — nothing entity-count-sized ever sits on the
    driver, so it holds at 10^9-entity KBs.  Same algebra, same result
    (tested equal); convergence detected via a count of changed labels.

    Returns the (uri, canonical) mapping as a DATASET (rank prefix
    stripped in a map stage) — feed it straight to
    ``canonicalize_triples_join`` so the whole canonicalization path is
    driver-free end to end.  ``connected_components_join`` below wraps
    this with a driver-side collect for tests / small KBs.
    """
    from ray.data.aggregate import Min

    from ..stages.joins import default_join_partitions

    # CPU-sized partitions (a fixed count larger than the session's
    # CPUs deadlocks/loses the first-block schema broadcast — CLAUDE.md)
    num_partitions = num_partitions or default_join_partitions()

    def init_labels(batch: pa.Table) -> pa.Table:
        us = batch.column("u")
        if prefer_prefix is not None:
            prefix = pc.if_else(
                pc.match_substring(us, prefer_prefix),
                pa.scalar("0|"),
                pa.scalar("1|"),
            )
        else:
            prefix = pa.array(["1|"] * len(us), pa.string())
        return pa.table(
            {"u": us, "label": pc.binary_join_element_wise(prefix, us, "")}
        )

    from ..stages.joins import staged_nonempty

    # EVERY join input is compacted first: an empty first block on
    # either side loses the hash-join schema broadcast (CLAUDE.md;
    # reproduced here with tiny label tables whose groupby emits
    # leading empty partitions).  An ENTIRELY empty pairs input cannot
    # be staged at all — short-circuit to the identity mapping (zero
    # pairs = zero components), the case the joins below would crash on.
    staged_pairs = staged_nonempty(pairs)
    if staged_pairs is None:
        empty = rd.from_arrow(
            pa.table({"uri": pa.array([], pa.string()), "canonical": pa.array([], pa.string())})
        )
        return empty, True
    pairs = staged_pairs
    labels = staged_nonempty(
        pairs.map_batches(init_labels, batch_format="pyarrow")
        .groupby("u")
        .aggregate(Min("label", alias_name="label"))
    )
    assert labels is not None  # nonempty pairs always yield labels
    converged = False
    for _ in range(max_iters):
        # neighbor labels: join pair (u, v) with v's current label
        v_labels = labels.map_batches(
            lambda t: t.rename_columns(["v", "label"]), batch_format="pyarrow"
        )
        neigh = pairs.join(
            v_labels, join_type="inner", num_partitions=num_partitions, on=("v",)
        ).select_columns(["u", "label"])
        new_labels = staged_nonempty(
            labels.union(neigh)
            .groupby("u")
            .aggregate(Min("label", alias_name="label"))
        )
        assert new_labels is not None  # labels is nonempty, union only grows
        # changed-label count via join of old/new (small aggregate)
        old_r = labels.map_batches(
            lambda t: t.rename_columns(["u", "old_label"]), batch_format="pyarrow"
        )
        def count_changed(t: pa.Table) -> pa.Table:
            n = pc.sum(
                pc.cast(pc.invert(pc.equal(t["label"], t["old_label"])), pa.int64())
            ).as_py() or 0
            return pa.table({"changed": pa.array([n], pa.int64())})

        diff = new_labels.join(
            old_r, join_type="inner", num_partitions=num_partitions, on=("u",)
        ).map_batches(count_changed, batch_format="pyarrow")
        n_changed = diff.sum("changed") or 0  # distributed aggregate, scalar to driver
        labels = new_labels
        if n_changed == 0:
            converged = True
            break

    def strip_rank(t: pa.Table) -> pa.Table:
        # "0|uri" / "1|uri" -> uri; vectorized (rank prefix is always 2 chars)
        canon = pc.utf8_slice_codeunits(t.column("label"), 2)
        return pa.table({"uri": t.column("u"), "canonical": canon})

    mapping = labels.map_batches(strip_rank, batch_format="pyarrow")
    return mapping, converged


def connected_components_join(
    pairs: rd.Dataset,
    max_iters: int = 5,
    prefer_prefix: str | None = None,
    num_partitions: int | None = None,
) -> tuple[pa.Table, bool]:
    """Driver-side collect of ``connected_components_join_ds`` for tests
    and small KBs; the query path uses the Dataset variant directly."""
    mapping, converged = connected_components_join_ds(
        pairs, max_iters=max_iters, prefer_prefix=prefer_prefix, num_partitions=num_partitions
    )
    rows = sorted((r["uri"], r["canonical"]) for r in mapping.take_all())
    return (
        pa.table(
            {
                "uri": pa.array([u for u, _ in rows], pa.string()),
                "canonical": pa.array([c for _, c in rows], pa.string()),
            }
        ),
        converged,
    )


def canonicalize_triples(triples: rd.Dataset, mapping: pa.Table) -> rd.Dataset:
    """Rewrite subj/obj through the canonical map (broadcast lookup).

    Right-sized for maps that fit a node (typical: entity count <<
    triple count).  For KB-scale maps use ``canonicalize_triples_join``.
    """
    ref = ray.put(
        dict(zip(mapping.column("uri").to_pylist(), mapping.column("canonical").to_pylist()))
    )

    def rewrite(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        subj = [m.get(s, s) for s in batch.column("subj").to_pylist()]
        obj = [m.get(o, o) for o in batch.column("obj").to_pylist()]
        out = batch.set_column(batch.schema.get_field_index("subj"), "subj", pa.array(subj, pa.string()))
        out = out.set_column(out.schema.get_field_index("obj"), "obj", pa.array(obj, pa.string()))
        return out

    return triples.map_batches(rewrite, batch_format="pyarrow")


def canonicalize_triples_join(
    triples: rd.Dataset, mapping: rd.Dataset, num_partitions: int | None = None
) -> rd.Dataset:
    """All-shuffle triple rewrite for ENTITY-SCALE canonical maps (a
    10^9-entity map doesn't broadcast): two left-outer hash joins —
    subj then obj — against the (uri, canonical) Dataset, coalescing
    unmapped URIs to themselves.  Same output as the broadcast variant
    (tested equal); column order preserved."""
    from ..stages.joins import default_join_partitions, staged_nonempty

    np_ = num_partitions or default_join_partitions()
    staged = staged_nonempty(mapping)
    if staged is None:
        return triples

    def rekey(cols):
        def f(t: pa.Table) -> pa.Table:
            return t.rename_columns(cols)

        return f

    subj_map = staged.map_batches(rekey(["subj", "__subj_canon"]), batch_format="pyarrow")
    obj_map = staged.map_batches(rekey(["obj", "__obj_canon"]), batch_format="pyarrow")

    # compact between the two joins: a hash-join output keeps one block
    # per partition and empty partitions yield empty blocks — if one of
    # those lands FIRST, the next join's left-side schema broadcast is
    # lost (see joins.staged_nonempty).  Applies to LEFT sides too.
    out = staged_nonempty(
        triples.join(
            subj_map, join_type="left_outer", num_partitions=np_, on=("subj",)
        )
    )
    if out is None:  # no triples at all
        return triples
    out = out.join(obj_map, join_type="left_outer", num_partitions=np_, on=("obj",))

    def finalize(t: pa.Table) -> pa.Table:
        subj = pc.coalesce(t.column("__subj_canon"), t.column("subj"))
        obj = pc.coalesce(t.column("__obj_canon"), t.column("obj"))
        t = t.drop_columns(["__subj_canon", "__obj_canon"])
        t = t.set_column(t.schema.get_field_index("subj"), "subj", subj)
        return t.set_column(t.schema.get_field_index("obj"), "obj", obj)

    return out.map_batches(finalize, batch_format="pyarrow")
