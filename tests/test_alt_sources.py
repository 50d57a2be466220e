"""GeoJSON (S5), WKB/GeoParquet (S6), GTFS (S7) sources."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from osmix_spark.sources import geojson, gtfs, wkb


def test_wkb_parse_roundtrip():
    t, lons, lats = wkb.parse_wkb(wkb.write_wkb_point(1.5, -2.5))
    assert (t, lons, lats) == ("point", [1.5], [-2.5])
    coords = [(0.0, 0.0), (1.0, 2.0), (3.0, 1.0)]
    t, lons, lats = wkb.parse_wkb(wkb.write_wkb_linestring(coords))
    assert t == "linestring" and list(zip(lons, lats)) == coords
    ring = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 0.0)]
    t, lons, lats = wkb.parse_wkb(wkb.write_wkb_polygon(ring))
    assert t == "polygon" and list(zip(lons, lats)) == ring
    # big-endian point
    import struct

    be = struct.pack(">BI2d", 0, 1, 7.0, 8.0)
    assert wkb.parse_wkb(be) == ("point", [7.0], [8.0])


def test_wkb_column_parse(spark):
    rows = [
        (1, wkb.write_wkb_point(10.0, 20.0)),
        (2, wkb.write_wkb_linestring([(0.0, 0.0), (1.0, 1.0)])),
        (3, wkb.write_wkb_polygon([(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 0.0)])),
    ]
    df = spark.createDataFrame(rows, "geom_id long, wkb binary")
    out = {r["geom_id"]: r for r in wkb.parse_wkb_column(df).collect()}
    assert out[1]["geom_type"] == "point" and out[1]["lons"] == [10.0]
    assert out[2]["geom_type"] == "linestring" and out[2]["lats"] == [0.0, 1.0]
    assert out[3]["geom_type"] == "polygon" and len(out[3]["lons"]) == 4


def test_geojson_source(spark, tmp_path):
    feats = [
        {"type": "Feature", "id": 1,
         "geometry": {"type": "Point", "coordinates": [7.42, 43.73]},
         "properties": {"amenity": "cafe"}},
        {"type": "Feature", "id": 2,
         "geometry": {"type": "LineString",
                      "coordinates": [[0.0, 0.0], [1.0, 1.0], [2.0, 0.5]]},
         "properties": {"highway": "path"}},
        {"type": "Feature", "id": 3,
         "geometry": {"type": "Polygon",
                      "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 0]]]},
         "properties": {"building": "yes"}},
    ]
    p = tmp_path / "f.geojson"
    p.write_text("\n".join(json.dumps(f) for f in feats))
    nodes, ways = geojson.osm_from_geojson(spark, str(p))

    n = {r["id"]: r for r in nodes.collect()}
    assert n[1]["lon"] == 7.42 and n[1]["tags"] == {"amenity": "cafe"}
    w = {r["id"]: r for r in ways.collect()}
    assert w[2]["tags"] == {"highway": "path"}
    assert len(w[2]["refs"]) == 3
    assert len(w[3]["refs"]) == 4  # closed ring kept
    # way refs resolve to nodes with the right coords
    refs2 = list(w[2]["refs"])
    assert n[refs2[0]]["lon"] == 0.0 and n[refs2[2]]["lon"] == 2.0


def test_gtfs_source(spark, tmp_path):
    stops = tmp_path / "stops.txt"
    stops.write_text(
        "stop_id,stop_name,stop_lat,stop_lon\n"
        "1,Main St,46.6,-120.5\n2,Oak Ave,46.7,-120.4\n"
    )
    shapes = tmp_path / "shapes.txt"
    shapes.write_text(
        "shape_id,shape_pt_lat,shape_pt_lon,shape_pt_sequence\n"
        "7,46.6,-120.5,1\n7,46.65,-120.45,2\n7,46.7,-120.4,3\n"
    )
    nodes = gtfs.stops_to_nodes(spark, str(stops))
    got = {r["id"]: r for r in nodes.collect()}
    assert got[1]["tags"]["name"] == "Main St"
    assert got[2]["lon"] == -120.4

    vnodes, ways = gtfs.shapes_to_ways(spark, str(shapes))
    w = ways.collect()[0]
    assert w["id"] == gtfs.SHAPE_ID_OFFSET + 7
    assert len(w["refs"]) == 3
    vn = {r["id"]: r for r in vnodes.collect()}
    assert vn[list(w["refs"])[0]]["lat"] == 46.6
