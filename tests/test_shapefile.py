"""Shapefile source (S8): .shp record round-trip + .dbf attributes."""

from __future__ import annotations

from osmix_spark.sources import shapefile


def test_shp_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t.shp")
    shapes = [
        ("point", [(-120.5, 46.6)]),
        ("polyline", [(0.0, 0.0), (1.0, 1.0), (2.0, 0.5)]),
        ("polygon", [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 0.0)]),
    ]
    shapefile.write_shp(path, shapes)
    out = {r["record_no"]: r for r in shapefile.read_shp(spark, path).collect()}
    assert out[1]["geom_type"] == "point" and out[1]["lons"] == [-120.5]
    assert out[2]["geom_type"] == "polyline" and out[2]["lats"] == [0.0, 1.0, 0.5]
    assert out[3]["geom_type"] == "polygon" and len(out[3]["lons"]) == 4


def test_dbf_attributes(tmp_path):
    path = str(tmp_path / "t.dbf")
    fields = [("NAME", "C", 10), ("POP", "N", 8)]
    rows = [{"NAME": "alpha", "POP": 120}, {"NAME": "beta", "POP": 4500}]
    shapefile.write_dbf(path, rows, fields)
    df = shapefile.read_dbf(path)
    assert list(df.columns) == ["NAME", "POP"]
    assert df.iloc[0]["NAME"] == "alpha" and df.iloc[1]["POP"] == 4500
