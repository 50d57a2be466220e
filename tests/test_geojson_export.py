"""GeoJSON export (entity->feature, entity-to-feature.ts) + round-trip
through the NDJSON reader (sources/geojson.py)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from osmix_spark.operators import geojson_export as gj


def _layers(spark):
    nodes = spark.createDataFrame(
        [(1, 0.0, 0.0, {"name": "a"}), (2, 1.0, 0.0, None), (3, 1.0, 1.0, None),
         (4, 0.0, 1.0, None), (5, 0.25, 0.25, None), (6, 0.75, 0.25, None),
         (7, 0.75, 0.75, None), (8, 0.25, 0.75, None)],
        "id long, lon double, lat double, tags map<string,string>",
    )
    ways = spark.createDataFrame(
        [(10, [1, 2, 3], {"highway": "residential"}),
         (11, [1, 2, 3, 4, 1], {"building": "yes"}),
         (12, [5, 6, 7, 8, 5], None)],
        "id long, refs array<long>, tags map<string,string>",
    )
    relations = spark.createDataFrame(
        [(20, {"type": "multipolygon", "name": "mp"}),
         (21, {"type": "multipoint"}),
         (22, {"type": "route"}),
         (23, {"type": "restriction"})],
        "id long, tags map<string,string>",
    )
    members = spark.createDataFrame(
        [(20, "way", 11, "outer", 0), (20, "way", 12, "inner", 1),
         (21, "node", 1, "", 0), (21, "node", 2, "", 1),
         (22, "way", 10, "", 0),
         (23, "way", 10, "from", 0)],
        "relation_id long, member_type string, member_ref long, role string, seq int",
    )
    return nodes, ways, relations, members


def test_feature_shapes(spark):
    nodes, ways, relations, members = _layers(spark)
    out = gj.to_geojson_features(nodes, ways, relations, members)
    feats = {r["id"]: json.loads(r["feature"]) for r in out.collect()}
    assert feats[1]["geometry"] == {"type": "Point", "coordinates": [0.0, 0.0]}
    assert feats[1]["properties"] == {"id": 1, "type": "node", "name": "a"}
    assert feats[10]["geometry"]["type"] == "LineString"
    assert feats[11]["geometry"]["type"] == "Polygon"  # wayIsArea: building + closed
    assert len(feats[11]["geometry"]["coordinates"]) == 1
    # multipolygon with hole: outer + inner rings in one polygon
    assert feats[20]["geometry"]["type"] == "Polygon"
    assert len(feats[20]["geometry"]["coordinates"]) == 2
    # tags spread overrides the type property (JS {...base, ...tags})
    assert feats[20]["properties"]["type"] == "multipolygon"
    assert feats[20]["properties"]["name"] == "mp"
    assert feats[21]["geometry"]["type"] == "MultiPoint"
    assert feats[22]["geometry"]["type"] == "LineString"
    # logical relation -> empty GeometryCollection
    assert feats[23]["geometry"] == {"type": "GeometryCollection", "geometries": []}


def test_roundtrip_through_reader(spark, tmp_path):
    from osmix_spark.sources import geojson as gj_src

    nodes, ways, relations, members = _layers(spark)
    out = gj.to_geojson_features(nodes, ways)
    path = str(tmp_path / "export")
    gj.write_geojson_seq(out, path)
    feats = gj_src.read_geojson_features(spark, path)
    got = {r["feature_id"]: r["geom_type"] for r in feats.collect()}
    assert got == {1: "Point", 2: "Point", 3: "Point", 4: "Point",
                   5: "Point", 6: "Point", 7: "Point", 8: "Point",
                   10: "LineString", 11: "Polygon", 12: "LineString"}
    tags = {r["feature_id"]: r["tags"] for r in feats.collect()}
    assert tags[10]["highway"] == "residential"


def test_feature_collection_wrapper(spark):
    nodes, _w, _r, _m = _layers(spark)
    fc = json.loads(gj.feature_collection(gj.nodes_to_features(nodes), limit=3))
    assert fc["type"] == "FeatureCollection"
    assert len(fc["features"]) == 3


def test_line_relation_chains_in_member_order(spark):
    """connectWaysToLineStrings consumes members in relation order — a
    higher-id way listed first must seed the chain (greedy chaining is
    order-sensitive)."""
    nodes = spark.createDataFrame(
        [(1, 0.0, 0.0, None), (2, 1.0, 0.0, None), (3, 2.0, 0.0, None)],
        "id long, lon double, lat double, tags map<string,string>",
    )
    ways = spark.createDataFrame(
        [(10, [1, 2], None), (20, [2, 3], None)],
        "id long, refs array<long>, tags map<string,string>",
    )
    relations = spark.createDataFrame(
        [(30, {"type": "route"})], "id long, tags map<string,string>"
    )
    members = spark.createDataFrame(
        [(30, "way", 20, "", 0), (30, "way", 10, "", 1)],  # way 20 FIRST
        "relation_id long, member_type string, member_ref long, role string, seq int",
    )
    import json

    out = gj.relations_to_features(relations, members, ways, nodes).collect()
    geom = json.loads(out[0]["feature"])["geometry"]
    # the two ways chain into ONE LineString with all 3 vertices even
    # though the higher-id way is listed first (member-seq iteration)
    assert geom["type"] == "LineString"
    assert len(geom["coordinates"]) == 3
    assert {tuple(c) for c in geom["coordinates"]} == {(0.0, 0.0), (1.0, 0.0), (2.0, 0.0)}


def test_id_tag_overrides_properties_id(spark):
    """JS spread {id, type, ...tags}: an `id` TAG overrides the numeric id
    in properties (with JSON escaping)."""
    import json

    nodes = spark.createDataFrame(
        [(5, 1.0, 2.0, {"id": 'cu"stom'})],
        "id long, lon double, lat double, tags map<string,string>",
    )
    f = json.loads(gj.nodes_to_features(nodes).collect()[0]["feature"])
    assert f["properties"]["id"] == 'cu"stom'
    assert f["id"] == 5  # the FEATURE id stays the entity id
