"""Deterministic Common-Crawl-style pages table (BASELINE.json input_hint).

Schema: pages(url string, warc_ts timestamp, html binary, text string,
lang string). Pure function of (seed-fixed arithmetic, n) — no RNG objects,
so the SAME rows are produced at any scale/parallelism and the per-url
`text` bytes are a deterministic function of the url (the north-rule
byte-identity invariant).

Geo signal mix (FIXTURES.md §2): ~70% of pages embed exactly one
"%.5f, %.5f" coordinate pair in text; ~20% a gazetteer place name; ~10%
no geo signal (geocoding must drop them, counted in lineage).
Coordinates cluster around the merge-fixture centroid (Yakima) with
hot-spot skew, via sources/synth.clustered_*.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import synth

GAZETTEER: list[tuple[str, float, float]] = [
    # (name, lon, lat) — cluster centers named like the reference fixture area
    (f"placeville{cid}", *synth.cluster_center(cid)) for cid in range(synth.NUM_CLUSTERS)
]

_FILLER = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua"
).split()


def generate_pages(spark: SparkSession, n: int, parts: int | None = None) -> DataFrame:
    """n deterministic pages. Columns exactly per input_hint."""
    if parts is None:
        parts = max(spark.sparkContext.defaultParallelism, 4)
    ids = spark.range(n).repartition(parts)
    i = F.col("id")
    lon = synth.clustered_lon("id")
    lat = synth.clustered_lat("id")
    # "%.5f, %.5f" with lat first (the common web convention): format_number
    # is locale-risky; format_string('%.5f') matches python's f"{v:.5f}"
    coord_str = F.format_string("%.5f, %.5f", lat, lon)
    place = F.concat(F.lit("placeville"), (i % synth.NUM_CLUSTERS).cast("string"))
    filler = F.concat_ws(
        " ",
        *[F.element_at(F.lit(_FILLER), ((i * (k + 3) + k) % len(_FILLER) + 1).cast("int"))
          for k in range(8)],
    )
    bucket = i % 10  # 0-6 coord, 7-8 place, 9 none
    text = (
        F.when(bucket <= 6, F.concat(filler, F.lit(" located at "), coord_str, F.lit(" "), filler))
        .when(bucket <= 8, F.concat(filler, F.lit(" near "), place, F.lit(" "), filler))
        .otherwise(filler)
    )
    return ids.select(
        F.format_string("https://example.org/page/%d", i).alias("url"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp") + F.make_interval(secs=(i % 86400).cast("double"))).alias("warc_ts"),
        F.encode(F.concat(F.lit("<html><body>"), text, F.lit("</body></html>")), "utf-8").alias("html"),
        text.alias("text"),
        F.element_at(F.lit(["en", "fr", "de", "es"]), (i % 4 + 1).cast("int")).alias("lang"),
    )
