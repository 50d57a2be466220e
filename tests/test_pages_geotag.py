"""Pages generator + geotagging: byte-identical text per url at any
parallelism (the north-rule invariant), signal-mix counters, coordinate
round-trip accuracy."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from osmix_spark.sources import geotag, pages, synth


def _text_digest(df) -> str:
    rows = sorted(
        (r["url"], r["text"]) for r in df.select("url", "text").collect()
    )
    return hashlib.sha256(repr(rows).encode()).hexdigest()


def test_byte_identical_text_across_parallelism(spark):
    a = pages.generate_pages(spark, 400, parts=1)
    b = pages.generate_pages(spark, 400, parts=17)
    assert _text_digest(a) == _text_digest(b)
    # html is the text wrapped, byte-identical too
    ra = {r["url"]: bytes(r["html"]) for r in a.collect()}
    rb = {r["url"]: bytes(r["html"]) for r in b.collect()}
    assert ra == rb


def test_geotag_signal_mix_and_invariant(spark):
    p = pages.generate_pages(spark, 500)
    g = geotag.geotag_pages(p, pages.GAZETTEER)
    stats = geotag.geotag_stats(p, g)
    assert stats["pages_in"] == 500
    assert stats["geocoded_coord"] == 350   # buckets 0-6
    assert stats["geocoded_place"] == 100   # buckets 7-8
    assert stats["dropped_no_signal"] == 50  # bucket 9
    # text byte-identity through the pipeline
    orig = {r["url"]: r["text"] for r in p.collect()}
    for r in g.select("url", "text").collect():
        assert r["text"] == orig[r["url"]]


def test_geotag_coord_roundtrip_accuracy(spark):
    p = pages.generate_pages(spark, 200)
    g = geotag.geotag_pages(p, pages.GAZETTEER).filter(F.col("geo_source") == "coord")
    rows = g.select("url", "lon", "lat").collect()
    assert rows
    for r in rows:
        i = int(r["url"].rsplit("/", 1)[1])
        exp_lon = synth.clustered_lon(F.lit(i))
        # recompute expected via a 1-row query (same engine arithmetic)
        exp = (
            spark.range(1)
            .select(
                synth.clustered_lon(F.lit(i)).alias("lon"),
                synth.clustered_lat(F.lit(i)).alias("lat"),
            )
            .collect()[0]
        )
        # parsed back from %.5f text: within half of 1e-5
        assert abs(r["lon"] - exp["lon"]) <= 5.1e-6
        assert abs(r["lat"] - exp["lat"]) <= 5.1e-6


def test_place_pages_geocode_to_cluster_centers(spark):
    p = pages.generate_pages(spark, 300)
    g = geotag.geotag_pages(p, pages.GAZETTEER).filter(F.col("geo_source") == "place")
    centers = {name: (lon, lat) for name, lon, lat in pages.GAZETTEER}
    for r in g.collect():
        i = int(r["url"].rsplit("/", 1)[1])
        name = f"placeville{i % synth.NUM_CLUSTERS}"
        assert (r["lon"], r["lat"]) == centers[name]
