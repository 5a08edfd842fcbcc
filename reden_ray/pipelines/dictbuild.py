"""Dictionary-build pipeline (S12/S13 + M9-M12 of SURVEY.md §2).

Re-expresses the reference's Linked-Data crawl (AppAdhoc.crawlsLinkedData,
/root/reference/src/fr/lip6/reden/ldextractor/AppAdhoc.java:49-292 and
the per-source processors, e.g. QueryAuthorBNF.java:139-266) as an
offline batch pipeline over a local entity dump table:

    read(entity_dump)                      # the SPARQL-result analogue
      -> groupby(uri) merge                # A2: distinct refs per entity
      -> flat_map(alias expansion)         # M10/M11: makeAliases rules
      -> dictionary (alias_norm, alias_raw, name_std, kind, uri_group)

The reference's per-first-letter SPARQL sharding (a..z+other, its only
parallelism/restartability unit) becomes ordinary block parallelism +
idempotent partitioned writes; no letter hack needed.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from ..core.aliases import make_aliases, normalized_name
from ..core.normalize import normalize_mention

DICTIONARY_SCHEMA = pa.schema(
    [
        ("alias_norm", pa.string()),
        ("alias_raw", pa.string()),
        ("name_std", pa.string()),
        ("kind", pa.string()),
        ("uri_group", pa.list_(pa.string())),
    ]
)


def expand_aliases(batch: pa.Table, alias_fn=None) -> pa.Table:
    """entity rows -> dictionary rows (vectorized over the batch).

    ``alias_fn`` (``sources.registry.SourceSpec.alias_fn``) overrides the
    generic expansion with a per-source rule set — row -> (aliases,
    display); an empty alias list drops the entity (the BNE write loop,
    QueryAuthorBNE.java:239-243, emits nothing without rejected forms)."""
    cols: dict[str, list] = {n: [] for n in DICTIONARY_SCHEMA.names}
    for r in batch.to_pylist():
        kind = r["kind"]
        if alias_fn is not None:
            aliases, display = alias_fn(r)
        elif kind == "PER":
            aliases = make_aliases(r["firstname"], r["lastname"], r["gender"])
            display = normalized_name(r["firstname"], r["lastname"], r["birth"], r["death"])
        else:
            nm = r["lastname"]
            aliases = sorted({nm, nm.replace("-", " ")})
            display = nm
        group = [r["uri"], *(r["equivalents"] or [])]
        for alias in aliases:
            cols["alias_norm"].append(normalize_mention(alias))
            cols["alias_raw"].append(alias)
            cols["name_std"].append(display)
            cols["kind"].append(kind)
            cols["uri_group"].append(group)
    return pa.Table.from_arrays(
        [pa.array(cols[f.name], f.type) for f in DICTIONARY_SCHEMA], schema=DICTIONARY_SCHEMA
    )


def build_dictionary(entity_dump: rd.Dataset, alias_fn=None) -> rd.Dataset:
    """The full build: one stateless map stage (entities are already one
    row per URI in the dump; the A2 merge happens upstream if the dump
    has one row per SPARQL solution — see ``merge_solutions``)."""
    if alias_fn is None:
        return entity_dump.map_batches(
            expand_aliases, batch_format="pyarrow", batch_size=None
        )

    def expand(batch: pa.Table) -> pa.Table:
        return expand_aliases(batch, alias_fn)

    return entity_dump.map_batches(expand, batch_format="pyarrow", batch_size=None)


def merge_solutions(solutions: rd.Dataset) -> rd.Dataset:
    """A2: merge one-row-per-SPARQL-solution input into one row per
    entity URI, unioning equivalents (QueryAuthorBNF.java:161-240)."""

    def merge(group: pa.Table) -> pa.Table:
        rows = group.to_pylist()
        first = rows[0]
        equivs: dict[str, None] = {}
        for r in rows:
            for e in r["equivalents"] or []:
                equivs[e] = None
        first["equivalents"] = list(equivs)
        if "rejected_forms" in first:
            # rejected forms accumulate across solutions too
            # (QueryAuthorBNE.java:184-211 dedups per author)
            forms: dict[str, None] = {}
            for r in rows:
                for f in r.get("rejected_forms") or []:
                    forms[f] = None
            first["rejected_forms"] = list(forms)
        return pa.Table.from_pylist([first], schema=group.schema)

    return solutions.groupby("uri").map_groups(merge, batch_format="pyarrow")


def filter_entities_by_period(
    entity_dump: rd.Dataset, start_year: int, end_year: int
) -> rd.Dataset:
    """Temporal domain filter for the dictionary build: keep entities
    whose life span overlaps [start_year, end_year] (the
    ``loadDomainParams`` temporal filter, AppAdhoc.java:301-324, using
    the M8 overlap math).  Entities without parseable dates are KEPT
    (the reference only filters when both dates exist)."""
    import pyarrow.compute as pc  # noqa: F401

    from ..core.dates import compare_date, process_date

    def keep(batch: pa.Table) -> pa.Table:
        births = batch.column("birth").to_pylist()
        deaths = batch.column("death").to_pylist()
        mask = []
        for b, d in zip(births, deaths):
            by = process_date(b) if b else None
            dy = process_date(d) if d else None
            if by is None or dy is None:
                mask.append(True)
            else:
                mask.append(compare_date(by, dy, start_year, end_year) > 0)
        return batch.filter(pa.array(mask, pa.bool_()))

    return entity_dump.map_batches(keep, batch_format="pyarrow", batch_size=None)


def geonames_to_dictionary(geonames: rd.Dataset) -> rd.Dataset:
    """Geonames-dump conversion (scripts/genGeonamesDico.py:22-37): each
    place row (geonameid, name, altnames comma-separated) becomes one
    dictionary row per name/altname with URI
    ``http://sws.geonames.org/<id>`` — a flat map, LOC kind."""

    def expand(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {n: [] for n in DICTIONARY_SCHEMA.names}
        for r in batch.to_pylist():
            uri = f"http://sws.geonames.org/{r['geonameid']}"
            names = [r["name"]] + [
                a for a in (r.get("altnames") or "").split(",") if a.strip()
            ]
            for name in names:
                cols["alias_norm"].append(normalize_mention(name))
                cols["alias_raw"].append(name)
                cols["name_std"].append(r["name"])
                cols["kind"].append("LOC")
                cols["uri_group"].append([uri])
        return pa.Table.from_arrays(
            [pa.array(cols[f.name], f.type) for f in DICTIONARY_SCHEMA],
            schema=DICTIONARY_SCHEMA,
        )

    return geonames.map_batches(expand, batch_format="pyarrow", batch_size=None)


def write_dictionary(dictionary: rd.Dataset, out_dir: str) -> None:
    """Idempotent partitioned write (the TSV-per-letter files become
    parquet partitions; rerun overwrites completed partitions)."""
    dictionary.write_parquet(out_dir)
