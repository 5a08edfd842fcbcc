import json

import pyarrow as pa


def test_geonames_to_dictionary(ray_session):
    import ray.data as rd

    from reden_ray.pipelines.dictbuild import geonames_to_dictionary

    src = pa.table(
        {
            "geonameid": [42, 43],
            "name": ["Paris", "Saint-Malo"],
            "altnames": ["Lutèce,Paname", ""],
        }
    )
    rows = geonames_to_dictionary(rd.from_arrow(src)).take_all()
    by_alias = {r["alias_raw"]: r for r in rows}
    assert by_alias["Paris"]["uri_group"] == ["http://sws.geonames.org/42"]
    assert by_alias["Lutèce"]["alias_norm"] == "lutèce"
    assert by_alias["Paname"]["name_std"] == "Paris"
    assert by_alias["Saint-Malo"]["alias_norm"] == "saintmalo"
    assert len(rows) == 4


def test_geojson_features(ray_session):
    import ray.data as rd

    from reden_ray.pipelines.metrics import to_geojson_features

    enriched = pa.table(
        {
            "uri": ["http://kb.test/ent/1", "http://kb.test/ent/2"],
            "occurrences": [3, 1],
            "lat": ["48.85", None],
            "lon": ["2.35", "1.0"],
        }
    )
    out = to_geojson_features(
        rd.from_arrow(enriched), "http://kb.test/p/lat", "http://kb.test/p/lon"
    ).take_all()
    assert len(out) == 1  # the row missing lat drops
    f = json.loads(out[0]["feature"])
    assert f["geometry"]["coordinates"] == [2.35, 48.85]
    assert f["properties"]["occurrences"] == 3


def test_geojson_write_roundtrip(ray_session, tmp_path):
    import json
    import pyarrow as pa
    import ray.data as rd

    from reden_ray.pipelines.metrics import to_geojson_features

    enriched = pa.table(
        {
            "uri": [f"http://kb.test/ent/{i}" for i in range(5)],
            "occurrences": [1, 2, 3, 4, 5],
            "lat": ["48.0"] * 5,
            "lon": ["2.0"] * 5,
        }
    )
    feats = to_geojson_features(
        rd.from_arrow(enriched), "http://kb.test/p/lat", "http://kb.test/p/lon"
    )
    out = str(tmp_path / "geo")
    feats.write_json(out)
    back = rd.read_json(out).take_all()
    assert len(back) == 5
    f = json.loads(back[0]["feature"])
    assert f["type"] == "Feature"
