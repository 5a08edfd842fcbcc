"""Side outputs of the NEL run: ambiguity report, predicate frequency,
enrichment (S9/S10/S11 of SURVEY.md §2.1).

Each is a small aggregate over an already-computed dataset — no extra
pass over the corpus:

- ``ambiguity_report``  — per mention surface: referent-count stats
  (the ``*-ambigousMentions.txt`` analogue, MainNELApp.java:266-275)
- ``pred_frequency``    — global predicate counts over emitted triples
  (the ``*-relFrequency.txt`` analogue, ResultsAndEvaluationNEL.java:
  371-387; associative, so a plain groupby-count replaces the
  reference's mutable static accumulator MainNELApp.java:56)
- ``enrichment``        — per chosen URI: occurrence counts + property
  probe from the adjacency table -> records ready for GeoJSON-style
  export (EnrichmentHandler.java:51-153)
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Sum


def ambiguity_report(candidates: rd.Dataset) -> rd.Dataset:
    """surface -> occurrences + referent-count aggregate."""
    return candidates.groupby("surface").aggregate(
        Count(alias_name="n_mentions"),
        Mean("n_groups", alias_name="mean_referents"),
        Max("n_groups", alias_name="max_referents"),
    )


def pred_frequency(triples: rd.Dataset) -> rd.Dataset:
    """predicate -> count over the pruned-graph triples.

    Predicates are the canonical HOT KEY (a handful of values over
    billions of triples): counts pre-aggregate per batch so the shuffle
    moves one row per (pred, batch), not per triple."""
    from ..stages.aggregates import partial_groupby_count

    return partial_groupby_count(triples, ["pred"], alias="n")


class _PropAttacher:
    """Actor-pool stage: builds the subj -> {prop: value} index ONCE per
    actor in ``__init__`` from a broadcast PRE-FILTERED adjacency slice
    (only rows whose predicate is probed ever ship), then serves every
    batch from the in-memory index — the model-setup-in-__init__
    pattern, not the per-batch rebuild it replaces."""

    def __init__(self, adj_ref, props: list[str]):
        import ray

        self.props = props
        table = ray.get(adj_ref)
        by_subj: dict[str, dict[str, str]] = {}
        for s, p, o in zip(
            table.column("subj").to_pylist(),
            table.column("pred").to_pylist(),
            table.column("obj").to_pylist(),
        ):
            by_subj.setdefault(s, {}).setdefault(p, o)
        self.by_subj = by_subj

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {p: [] for p in self.props}
        for uri in batch.column("uri").to_pylist():
            found = self.by_subj.get(uri, {})
            for p in self.props:
                cols[p].append(found.get(p))
        out = batch
        for p in self.props:
            out = out.append_column(p.rsplit("/", 1)[-1], pa.array(cols[p], pa.string()))
        return out


def enrichment(links: rd.Dataset, adjacency: pa.Table, props: list[str]) -> rd.Dataset:
    """chosen URI -> occurrence count + requested property values.

    The property probe list mirrors ``config/latlong.properties``; only
    the prop-matching adjacency rows are broadcast (filtered before
    ``ray.put``), and the per-subject index is built once per actor."""
    import pyarrow.compute as pc
    import ray

    pruned = adjacency.filter(
        pc.is_in(adjacency["pred"], value_set=pa.array(props, pa.string()))
    )
    adj_ref = ray.put(pruned)

    def explode_chosen(batch: pa.Table) -> pa.Table:
        uris = []
        for chosen in batch.column("chosen_uris").to_pylist():
            for u in chosen or []:
                uris.append(u)
        return pa.table({"uri": pa.array(uris, pa.string())})

    counts = links.map_batches(explode_chosen, batch_format="pyarrow").groupby(
        "uri"
    ).aggregate(Count(alias_name="occurrences"))

    return counts.map_batches(
        _PropAttacher,
        fn_constructor_kwargs={"adj_ref": adj_ref, "props": props},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


def to_geojson_features(enriched: rd.Dataset, lat_prop: str, lon_prop: str) -> rd.Dataset:
    """Enriched URI records -> GeoJSON Feature rows ready for
    ``write_json`` (the ``EnrichmentHandler.toJson`` analogue,
    EnrichmentHandler.java:122-153).  Rows lacking coordinates drop."""
    import json

    lat_col = lat_prop.rsplit("/", 1)[-1]
    lon_col = lon_prop.rsplit("/", 1)[-1]

    def features(batch: pa.Table) -> pa.Table:
        out = []
        for r in batch.to_pylist():
            if r.get(lat_col) is None or r.get(lon_col) is None:
                continue
            out.append(
                json.dumps(
                    {
                        "type": "Feature",
                        "geometry": {
                            "type": "Point",
                            "coordinates": [float(r[lon_col]), float(r[lat_col])],
                        },
                        "properties": {
                            "uri": r["uri"],
                            "occurrences": r["occurrences"],
                        },
                    },
                    sort_keys=True,
                )
            )
        return pa.table({"feature": pa.array(out, pa.string())})

    return enriched.map_batches(features, batch_format="pyarrow")
