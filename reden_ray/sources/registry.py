"""Per-source extraction registry — the QuerySource plug-in surface.

The reference defines a pluggable source interface
(ldextractor/QuerySourceInterface.java:12-40: formulateSPARQLQuery /
executeQuery / processResults) with nine concrete sources
(per/QueryAuthorBNF.java, per/QueryAuthorBNFAll.java,
per/QueryAuthorBNE.java, per/QueryAuthorBNEAll.java,
per/QueryPersonDBpediafr.java, per/QueryArtPersonalityGetty.java,
loc/QueryPlaceBNF.java, loc/QueryPlaceDBpedia.java,
loc/QueryPlaceLinkedGeoData.java, loc/QueryPlaceWikiData.java:50-146).
There is no SPARQL endpoint in an offline batch engine, so each source
becomes a declarative SPEC over a local dump table:

- ``columns``     — the SPARQL SELECT projection analogue, pruned AT
                    THE READ (only these leave storage);
- ``row_mapper``  — the processResults analogue: one dump row -> one
                    canonical entity row (or None to drop);
- ``first_letter_column`` — the reference's a..z+'other' SPARQL
                    filterRegex (e.g. QueryPlaceDBpedia.java:70-75),
                    kept for API parity; sharding itself is ordinary
                    block parallelism (SURVEY.md M13);
- domain extents  — ``TemporalExtent`` (AppAdhoc.loadDomainParams,
                    AppAdhoc.java:301-324) and ``SpatialExtent``
                    (SpatialExtent.java bounding box).  NOTE the
                    reference declares the spatial hook in every source
                    (``if (d instanceof SpatialExtent)``,
                    QueryPlaceDBpedia.java:65-69) but leaves the body
                    as a TODO; this implementation completes the
                    documented intent (bounding-box lat/lon filter) and
                    cites the divergence here.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

import pyarrow as pa
import ray.data as rd


@dataclass(frozen=True)
class TemporalExtent:
    """Life-span overlap window (TemporalExtent.java)."""

    start_year: int
    end_year: int


@dataclass(frozen=True)
class SpatialExtent:
    """Bounding box (SpatialExtent.java models 4 corner points; a
    rectangle reduces to min/max lat/lon)."""

    lat_min: float
    lat_max: float
    lon_min: float
    lon_max: float


@dataclass(frozen=True)
class SourceSpec:
    """One pluggable extraction source (a QuerySource subclass analogue).

    ``alias_fn`` is the per-source alias-generation hook: given one
    canonical entity row it returns ``(aliases, display_name)``.  The
    reference's source classes differ here in small but real ways —
    QueryAuthorBNE.java:231-244 writes ONLY the explicit rejected forms
    (``makeAliases`` is commented out, line 213) with a lastname-only
    display, while QueryArtPersonalityGetty.java:218 runs
    ``Personality.makeAliases`` with Getty AAT gender codes and does NOT
    truncate altLabels at "(".  ``None`` selects the generic BNF-style
    expansion in ``pipelines.dictbuild.expand_aliases``.

    ``sameas_property`` documents which predicate the equivalence crawl
    follows (Getty uses ``skos:exactMatch``,
    QueryArtPersonalityGetty.java:106); ``ref_filter`` drops equivalence
    targets the reference filters in SPARQL (Getty excludes refs inside
    its own namespace, same line).
    """

    name: str
    kind: str  # PER | LOC
    columns: tuple[str, ...]  # projection pushed to the read
    row_mapper: Callable[[dict], dict | None]
    first_letter_column: str = "lastname"
    supports_spatial: bool = False
    alias_fn: Callable[[dict], tuple[list[str], str]] | None = None
    sameas_property: str = "owl:sameAs"
    ref_filter: Callable[[str], bool] | None = None


_ENTITY_FIELDS = (
    "uri", "kind", "firstname", "lastname", "gender", "birth", "death",
    "equivalents", "rejected_forms",
)


def _person_mapper(kind_label: str):
    def mapper(r: dict) -> dict | None:
        if not r.get("lastname"):
            return None
        return {
            "uri": r["uri"],
            "kind": "PER",
            "firstname": r.get("firstname") or "",
            "lastname": r["lastname"],
            "gender": r.get("gender") or "",
            "birth": r.get("birth"),
            "death": r.get("death"),
            "equivalents": r.get("equivalents") or [],
            "rejected_forms": r.get("rejected_forms") or [],
        }

    return mapper


def _getty_person_mapper(r: dict) -> dict | None:
    """Getty prefLabel parse (QueryArtPersonalityGetty.java:184-198):
    ``nom`` splits on the first comma into (lastname, firstname); no
    comma means firstname "-"."""
    name = r.get("name") or r.get("lastname")
    if not name:
        return None
    if r.get("firstname"):
        last, first = name, r["firstname"]
    elif "," in name:
        last, _, first = name.partition(",")
    else:
        last, first = name, "-"
    return {
        "uri": r["uri"],
        "kind": "PER",
        "firstname": first.strip() or "-",
        "lastname": last.strip(),
        "gender": r.get("gender") or "",
        "birth": r.get("birth"),
        "death": r.get("death"),
        "equivalents": r.get("equivalents") or [],
        "rejected_forms": r.get("rejected_forms") or [],
    }


def _java_clean(name: str) -> str:
    """set{Last,First}name semantics shared by every author class:
    ``replaceAll("-", " ").trim()`` (e.g. AuthorBNE.java:39)."""
    return name.replace("-", " ").strip()


# Getty AAT gender concept codes (QueryArtPersonalityGetty.java:262-263).
GETTY_FEMALE = "http://vocab.getty.edu/aat/300189557"
GETTY_MALE = "http://vocab.getty.edu/aat/300189559"


def bnf_alias_fn(r: dict) -> tuple[list[str], str]:
    """QueryAuthorBNF.java:175-181,237: explicit FR altLabels truncated
    at "(" PLUS the full makeAliases set; display carries (birth-death)."""
    from ..core.aliases import make_aliases, normalized_name, truncate_rejected_form

    first, last = _java_clean(r["firstname"]), _java_clean(r["lastname"])
    explicit: dict[str, None] = {}
    for f in r.get("rejected_forms") or []:
        explicit[truncate_rejected_form(f)] = None
    for a in make_aliases(first, last, r.get("gender") or "male"):
        explicit[a] = None
    return list(explicit), normalized_name(first, last, r.get("birth"), r.get("death"))


def bne_alias_fn(r: dict) -> tuple[list[str], str]:
    """QueryAuthorBNE.java:231-244: ONLY the explicit rejected forms
    (truncated at "(", deduped in arrival order) — ``makeAliases`` is
    commented out at line 213, so an author with no rejected forms emits
    NO dictionary rows.  Display is the lastname alone with the
    apostrophe-space fix (AuthorBNE.getNormalisedName, no firstname, no
    dates)."""
    from ..core.aliases import truncate_rejected_form

    last = _java_clean(r["lastname"])
    explicit: dict[str, None] = {}
    for f in r.get("rejected_forms") or []:
        explicit[truncate_rejected_form(f)] = None
    display = last.replace("'", "' ").replace("  ", " ")
    return list(explicit), display


def getty_alias_fn(r: dict) -> tuple[list[str], str]:
    """QueryArtPersonalityGetty.java:204-218 + Personality: altLabels
    are NOT truncated at "(", makeAliases runs with the title derived
    from the Getty AAT gender code, and the display name has no
    (birth-death) suffix."""
    from ..core.aliases import make_aliases, normalized_name

    first, last = _java_clean(r["firstname"]), _java_clean(r["lastname"])
    gender = "female" if (r.get("gender") or "") == GETTY_FEMALE else "male"
    explicit: dict[str, None] = {}
    for f in r.get("rejected_forms") or []:
        explicit[f] = None
    for a in make_aliases(first, last, gender):
        explicit[a] = None
    return list(explicit), normalized_name(first, last, None, None)


def _not_getty_ref(ref: str) -> bool:
    """FILTER (!regex(STR(?ref), '^http://vocab.getty.edu', 'i'))
    (QueryArtPersonalityGetty.java:106)."""
    return not ref.lower().startswith("http://vocab.getty.edu")


def _place_mapper(r: dict) -> dict | None:
    name = r.get("lastname") or r.get("name")
    if not name:
        return None
    return {
        "uri": r["uri"],
        "kind": "LOC",
        "firstname": "",
        "lastname": name,
        "gender": "",
        "birth": None,
        "death": None,
        "equivalents": r.get("equivalents") or [],
    }


_PER_COLS = (
    "uri", "kind", "firstname", "lastname", "gender", "birth", "death",
    "equivalents", "rejected_forms",
)
_GETTY_COLS = _PER_COLS + ("name",)
_LOC_COLS = ("uri", "kind", "lastname", "equivalents", "lat", "lon")

SOURCE_REGISTRY: dict[str, SourceSpec] = {
    # person catalogs (per/*.java)
    "author_bnf": SourceSpec(
        "author_bnf", "PER", _PER_COLS, _person_mapper("bnf"), alias_fn=bnf_alias_fn
    ),
    "author_bnf_all": SourceSpec(
        "author_bnf_all", "PER", _PER_COLS, _person_mapper("bnf"), alias_fn=bnf_alias_fn
    ),
    "author_bne": SourceSpec(
        "author_bne", "PER", _PER_COLS, _person_mapper("bne"), alias_fn=bne_alias_fn
    ),
    "author_bne_all": SourceSpec(
        "author_bne_all", "PER", _PER_COLS, _person_mapper("bne"), alias_fn=bne_alias_fn
    ),
    "person_dbpedia_fr": SourceSpec(
        "person_dbpedia_fr", "PER", _PER_COLS, _person_mapper("dbpedia")
    ),
    "art_personality_getty": SourceSpec(
        "art_personality_getty",
        "PER",
        _GETTY_COLS,
        _getty_person_mapper,
        alias_fn=getty_alias_fn,
        sameas_property="skos:exactMatch",
        ref_filter=_not_getty_ref,
    ),
    # place catalogs (loc/*.java) — spatial-capable
    "place_bnf": SourceSpec(
        "place_bnf", "LOC", _LOC_COLS, _place_mapper, supports_spatial=True
    ),
    "place_dbpedia": SourceSpec(
        "place_dbpedia", "LOC", _LOC_COLS, _place_mapper, supports_spatial=True
    ),
    "place_linkedgeodata": SourceSpec(
        "place_linkedgeodata", "LOC", _LOC_COLS, _place_mapper, supports_spatial=True
    ),
    "place_wikidata": SourceSpec(
        "place_wikidata", "LOC", _LOC_COLS, _place_mapper, supports_spatial=True
    ),
}


def _letter_mask(values: list[str | None], letter: str) -> list[bool]:
    """The reference's per-letter filterRegex semantics: ``other`` means
    NOT starting with a-z (case-insensitive)."""
    if letter == "other":
        return [not (v and v[:1].isascii() and v[:1].isalpha()) for v in values]
    low = letter.lower()
    return [bool(v) and v[:1].lower() == low for v in values]


def extract_source(
    dump: rd.Dataset,
    source: str | SourceSpec,
    domain_params: tuple = (),
    first_letter: str | None = None,
) -> rd.Dataset:
    """dump table -> canonical entity rows for ONE registered source.

    Applies (in order): column projection, first-letter filter,
    spatial bounding box (LOC sources with lat/lon), temporal life-span
    overlap, then the source's row mapper.  Everything is a streaming
    map; the caller chains ``merge_solutions`` + ``build_dictionary``
    (pipelines.dictbuild) exactly as the reference chains
    processResults into the TSV writers.
    """
    spec = SOURCE_REGISTRY[source] if isinstance(source, str) else source
    names = dump.schema().names
    cols = [c for c in spec.columns if c in names]
    dump = dump.select_columns(cols)

    spatial = [d for d in domain_params if isinstance(d, SpatialExtent)]
    temporal = [d for d in domain_params if isinstance(d, TemporalExtent)]

    def transform(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        if first_letter is not None:
            mask = _letter_mask(
                [r.get(spec.first_letter_column) for r in rows], first_letter
            )
            rows = [r for r, m in zip(rows, mask) if m]
        if spatial and spec.supports_spatial:
            box = spatial[0]
            rows = [
                r
                for r in rows
                if r.get("lat") is not None
                and r.get("lon") is not None
                and box.lat_min <= r["lat"] <= box.lat_max
                and box.lon_min <= r["lon"] <= box.lon_max
            ]
        out = [m for m in (spec.row_mapper(r) for r in rows) if m is not None]
        if spec.ref_filter is not None:
            for m in out:
                m["equivalents"] = [e for e in m["equivalents"] if spec.ref_filter(e)]
        return pa.Table.from_pylist(
            out,
            schema=pa.schema(
                [
                    ("uri", pa.string()),
                    ("kind", pa.string()),
                    ("firstname", pa.string()),
                    ("lastname", pa.string()),
                    ("gender", pa.string()),
                    ("birth", pa.string()),
                    ("death", pa.string()),
                    ("equivalents", pa.list_(pa.string())),
                    ("rejected_forms", pa.list_(pa.string())),
                ]
            ),
        )

    entities = dump.map_batches(transform, batch_format="pyarrow", batch_size=None)
    if temporal:
        from ..pipelines.dictbuild import filter_entities_by_period

        t = temporal[0]
        entities = filter_entities_by_period(entities, t.start_year, t.end_year)
    return entities


def build_dictionary_from_sources(
    dumps: dict[str, rd.Dataset],
    domain_params: tuple = (),
) -> rd.Dataset:
    """Union the registered sources' extractions into one dictionary —
    the crawlsLinkedData loop (AppAdhoc.java:49-292) over the offline
    dumps: extract per source, merge per URI, expand aliases with the
    source's own alias rules (each reference source writes its own TSV
    with its own write loop), then union the dictionary rows."""
    from ..pipelines.dictbuild import build_dictionary, merge_solutions

    parts = []
    for name, dump in dumps.items():
        spec = SOURCE_REGISTRY[name] if isinstance(name, str) else name
        entities = merge_solutions(extract_source(dump, spec, domain_params))
        parts.append(build_dictionary(entities, alias_fn=spec.alias_fn))
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.union(p)
    return merged
