"""Per-source alias-generation variants (VERDICT r4 item 7).

The reference's source classes differ in how they turn SPARQL solutions
into dictionary rows: QueryAuthorBNE.java writes ONLY explicit rejected
forms (makeAliases commented out, line 213) with a lastname-only
display, while QueryArtPersonalityGetty.java follows skos:exactMatch
for equivalence (excluding its own namespace, line 106), parses
"Last, First" prefLabels, keeps altLabels untruncated, and titles from
Getty AAT gender codes.  These tests pin each quirk and show the Getty
spec builds a dictionary the generic mapper would not.
"""

import pyarrow as pa
import ray.data as rd

from reden_ray.pipelines.dictbuild import build_dictionary, merge_solutions
from reden_ray.sources.registry import (
    GETTY_FEMALE,
    SOURCE_REGISTRY,
    extract_source,
)


def _getty_dump() -> pa.Table:
    return pa.table(
        {
            "uri": pa.array(
                ["http://vocab.getty.edu/ulan/1", "http://vocab.getty.edu/ulan/2"]
            ),
            "kind": pa.array(["PER", "PER"]),
            "name": pa.array(["Gogh, Vincent van", "Bonheur, Rosa"]),
            "gender": pa.array(["", GETTY_FEMALE]),
            "equivalents": pa.array(
                [
                    # internal exactMatch must be FILTERed out, external kept
                    ["http://vocab.getty.edu/ulan/500115588", "http://kb.test/ext/gogh"],
                    ["http://kb.test/ext/bonheur"],
                ],
                pa.list_(pa.string()),
            ),
            "rejected_forms": pa.array(
                [["Van Gogh (painter)"], []], pa.list_(pa.string())
            ),
        }
    )


def _rows(dump, source):
    spec = SOURCE_REGISTRY[source]
    entities = merge_solutions(extract_source(rd.from_arrow(dump), spec))
    return build_dictionary(entities, alias_fn=spec.alias_fn).take_all()


def test_getty_exactmatch_filter_and_untruncated_altlabel(ray_session):
    rows = _rows(_getty_dump(), "art_personality_getty")
    gogh = [r for r in rows if r["uri_group"][0].endswith("/1")]
    assert gogh, "comma prefLabel must parse into a person"
    # skos:exactMatch crawl: own-namespace ref dropped, external kept
    assert gogh[0]["uri_group"] == [
        "http://vocab.getty.edu/ulan/1",
        "http://kb.test/ext/gogh",
    ]
    aliases = {r["alias_raw"] for r in gogh}
    # altLabel NOT truncated at "(" (unlike BNF/BNE rejected forms)
    assert "Van Gogh (painter)" in aliases
    # comma parse: lastname Gogh, firstname "Vincent van"
    assert "Vincent van Gogh" in aliases
    assert "Gogh" in aliases
    # display has no (birth-death) suffix
    assert gogh[0]["name_std"] == "Gogh, Vincent van"


def test_getty_gender_code_title(ray_session):
    rows = _rows(_getty_dump(), "art_personality_getty")
    bonheur = {r["alias_raw"] for r in rows if r["uri_group"][0].endswith("/2")}
    assert "Mme Bonheur" in bonheur  # AAT 300189557 -> female -> Mme
    gogh = {r["alias_raw"] for r in rows if r["uri_group"][0].endswith("/1")}
    assert "M Gogh" in gogh  # unknown/empty code -> male title


def test_getty_differs_from_generic_mapper(ray_session):
    """The per-source spec builds rows the generic PER path would not."""
    spec = SOURCE_REGISTRY["art_personality_getty"]
    entities = merge_solutions(extract_source(rd.from_arrow(_getty_dump()), spec))
    generic = build_dictionary(entities).take_all()  # alias_fn=None
    specific = _rows(_getty_dump(), "art_personality_getty")
    g_aliases = {r["alias_raw"] for r in generic}
    s_aliases = {r["alias_raw"] for r in specific}
    assert "Van Gogh (painter)" in s_aliases - g_aliases  # altLabels only via hook
    assert "Mme Bonheur" in s_aliases  # gender-code title only via hook
    # generic path also misses the (birth-death)-free display contract:
    assert all("(" not in r["name_std"] for r in specific)


def _bne_dump() -> pa.Table:
    return pa.table(
        {
            "uri": pa.array(["http://datos.bne.es/a/1", "http://datos.bne.es/a/2"]),
            "kind": pa.array(["PER", "PER"]),
            "firstname": pa.array(["", ""]),
            "lastname": pa.array(["Cervantes-Saavedra, Miguel d'Autre", "Vega, Lope de"]),
            "gender": pa.array(["", ""]),
            "birth": pa.array([None, None], pa.string()),
            "death": pa.array([None, None], pa.string()),
            "equivalents": pa.array([[], []], pa.list_(pa.string())),
            "rejected_forms": pa.array(
                [["Saavedra, Miguel de Cervantes (escritor)", "Cervantes"], []],
                pa.list_(pa.string()),
            ),
        }
    )


def test_bne_rejected_forms_only(ray_session):
    rows = _rows(_bne_dump(), "author_bne")
    # author 2 has NO rejected forms -> NO dictionary rows (write loop
    # iterates rejectedForms only, QueryAuthorBNE.java:239-243)
    assert all(r["uri_group"] == ["http://datos.bne.es/a/1"] for r in rows)
    aliases = [r["alias_raw"] for r in rows]
    # truncation at "(" + arrival-order dedup; makeAliases NOT applied
    assert aliases == ["Saavedra, Miguel de Cervantes", "Cervantes"]
    # display: lastname only, hyphens -> spaces, "'" -> "' "
    assert rows[0]["name_std"] == "Cervantes Saavedra, Miguel d' Autre"


def test_bne_merge_accumulates_rejected_forms(ray_session):
    # two SPARQL solutions for the same author carry different forms
    dump = pa.table(
        {
            "uri": pa.array(["http://datos.bne.es/a/1"] * 2),
            "kind": pa.array(["PER"] * 2),
            "firstname": pa.array(["", ""]),
            "lastname": pa.array(["Goya", "Goya"]),
            "gender": pa.array(["", ""]),
            "birth": pa.array([None, None], pa.string()),
            "death": pa.array([None, None], pa.string()),
            "equivalents": pa.array([["http://x/1"], ["http://x/2"]], pa.list_(pa.string())),
            "rejected_forms": pa.array([["Goya y Lucientes"], ["Goya (pintor)"]], pa.list_(pa.string())),
        }
    )
    rows = _rows(dump, "author_bne")
    assert sorted(r["alias_raw"] for r in rows) == ["Goya", "Goya y Lucientes"]
    assert all(set(r["uri_group"]) == {"http://datos.bne.es/a/1", "http://x/1", "http://x/2"} for r in rows)
