"""Per-source extraction registry (QuerySourceInterface analogue)."""

import pyarrow as pa
import pytest

from reden_ray.sources.registry import (
    SOURCE_REGISTRY,
    SpatialExtent,
    TemporalExtent,
    extract_source,
)


def _person_dump(ray_session):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "uri": pa.array([f"http://kb.test/p/{i}" for i in range(6)], pa.string()),
                "kind": pa.array(["PER"] * 6, pa.string()),
                "firstname": pa.array(["Ada", "Alan", "Grace", "Kurt", "Emmy", "Zoe"], pa.string()),
                "lastname": pa.array(
                    ["Lovelace", "Turing", "Hopper", "Godel", "Noether", "42"], pa.string()
                ),
                "gender": pa.array(["f", "m", "f", "m", "f", "f"], pa.string()),
                "birth": pa.array(["1815", "1912", "1906", "1906", "1882", None], pa.string()),
                "death": pa.array(["1852", "1954", "1992", "1978", "1935", None], pa.string()),
                "equivalents": pa.array([[] for _ in range(6)], pa.list_(pa.string())),
            }
        )
    )


def _place_dump(ray_session):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "uri": pa.array([f"http://kb.test/l/{i}" for i in range(4)], pa.string()),
                "kind": pa.array(["LOC"] * 4, pa.string()),
                "lastname": pa.array(["Paris", "Lyon", "Berlin", "Osaka"], pa.string()),
                "equivalents": pa.array([[] for _ in range(4)], pa.list_(pa.string())),
                "lat": pa.array([48.85, 45.76, 52.52, 34.69], pa.float64()),
                "lon": pa.array([2.35, 4.84, 13.40, 135.50], pa.float64()),
            }
        )
    )


def test_registry_covers_reference_sources():
    # the reference ships 6 person + 4 place QuerySource subclasses
    kinds = [s.kind for s in SOURCE_REGISTRY.values()]
    assert kinds.count("PER") == 6
    assert kinds.count("LOC") == 4


def test_person_extraction_and_letter_filter(ray_session):
    dump = _person_dump(ray_session)
    all_rows = extract_source(dump, "author_bnf").take_all()
    assert {r["lastname"] for r in all_rows} == {
        "Lovelace", "Turing", "Hopper", "Godel", "Noether", "42",
    }
    # first-letter sharding semantics incl. the reference's 'other'
    t_rows = extract_source(dump, "author_bnf", first_letter="t").take_all()
    assert [r["lastname"] for r in t_rows] == ["Turing"]
    other = extract_source(dump, "author_bnf", first_letter="other").take_all()
    assert [r["lastname"] for r in other] == ["42"]


def test_temporal_extent(ray_session):
    dump = _person_dump(ray_session)
    rows = extract_source(
        dump, "author_bnf", domain_params=(TemporalExtent(1900, 1950),)
    ).take_all()
    names = {r["lastname"] for r in rows}
    assert "Lovelace" not in names  # died 1852, outside [1900, 1950]
    assert "Turing" in names
    assert "42" in names  # unparseable dates are KEPT (reference rule)


def test_spatial_extent_bounding_box(ray_session):
    dump = _place_dump(ray_session)
    # France-ish box: keeps Paris + Lyon, drops Berlin + Osaka
    rows = extract_source(
        dump,
        "place_dbpedia",
        domain_params=(SpatialExtent(41.0, 51.0, -5.0, 9.0),),
    ).take_all()
    assert {r["lastname"] for r in rows} == {"Paris", "Lyon"}
    assert all(r["kind"] == "LOC" for r in rows)
    # person sources ignore the spatial extent (no lat/lon semantics)
    p_rows = extract_source(
        _person_dump(ray_session),
        "author_bnf",
        domain_params=(SpatialExtent(41.0, 51.0, -5.0, 9.0),),
    ).take_all()
    assert len(p_rows) == 6


def test_build_dictionary_from_sources_matches_single_path(ray_session):
    """Routing the fixture entity dump through the registry must
    reproduce the direct dictbuild output exactly — for sources WITHOUT
    a per-source alias_fn (generic path).  Sources with one (BNF/BNE/
    Getty quirks) intentionally diverge; see test_alias_variants.py."""
    import ray.data as rd

    import __ray_entry__ as E
    from reden_ray.pipelines.dictbuild import build_dictionary
    from reden_ray.sources.registry import build_dictionary_from_sources

    fd = E._fixture_for("/root/testdata/sf0.001")
    dump = rd.read_parquet(f"{fd}/entity_dump.parquet")
    per = dump.filter(lambda r: r["kind"] == "PER")
    loc = dump.filter(lambda r: r["kind"] == "LOC")
    via_registry = build_dictionary_from_sources(
        {"person_dbpedia_fr": per, "place_bnf": loc}
    ).take_all()
    direct = build_dictionary(dump).take_all()

    def key(rows):
        return sorted(
            (r["alias_norm"], r["alias_raw"], r["kind"], tuple(r["uri_group"]))
            for r in rows
        )

    assert key(via_registry) == key(direct)
