"""Incremental page ingest as Structured Streaming.

The reference is stream-ingest / batch-query (SURVEY §2.10) — WHATWG
TransformStreams feeding a batch index. The Spark analog: a file-source
stream of page parquet drops -> the SAME geotag + cell-assignment
transformations used in batch (DataFrame code is shared verbatim) ->
windowed per-cell rollups with a watermark for late arrivals -> an
append/complete sink. Tested with trigger(availableNow=True) so runs are
deterministic and finite.

Scale notes: the stateful agg keys on (window, cell) — the same partition
key as the batch engine, so state stays balanced under the same skew
handling; checkpointLocation gives exactly-once resume, the streaming twin
of plans/lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import geo
from ..sources import geotag, pages


def stream_pages(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream with the pages schema."""
    schema = (
        "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    return spark.readStream.schema(schema).parquet(input_dir)


def geotagged_cell_counts(stream: DataFrame, z: int = 12,
                          window: str = "10 minutes",
                          watermark: str = "30 minutes") -> DataFrame:
    """Geotag (same code as batch) -> per-(event-time window, cell) counts
    with late-data watermark."""
    g = geotag.geotag_pages(stream, pages.GAZETTEER)
    cells = g.withColumn("cell", geo.cell_key(F.col("lon"), F.col("lat"), F.lit(z)))
    return (
        cells.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), F.col("cell"))
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.when(F.col("geo_source") == "coord", 1).otherwise(0)).alias("n_coord"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "cell", "n_pages", "n_coord",
        )
    )


def run_available_now(stream_df: DataFrame, checkpoint_dir: str, out_dir: str) -> None:
    """Drain everything currently available, exactly-once, then stop —
    deterministic streaming execution for tests and backfills."""
    q = (
        stream_df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
