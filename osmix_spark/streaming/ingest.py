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


def dedupe_urls_stateful(stream: DataFrame, state_timeout: str = "1 hour") -> DataFrame:
    """Custom stateful streaming operator (the applyInPandasWithState path
    the reference's generation-gate/resume concept maps to): first-seen-wins
    URL dedupe across micro-batches. State per url = the content fingerprint
    already emitted; later arrivals with the same url are dropped (or
    emitted as 'changed' when the text hash differs — the streaming analog
    of the OSC modify record).

    Emits (url, fingerprint, change_type) where change_type in
    ('create', 'modify'); unchanged re-crawls are suppressed.
    """
    import pandas as pd  # noqa: PLC0415

    from pyspark.sql import types as T  # noqa: PLC0415
    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    out_schema = T.StructType([
        T.StructField("url", T.StringType(), False),
        T.StructField("fingerprint", T.LongType(), False),
        T.StructField("change_type", T.StringType(), False),
    ])
    state_schema = T.StructType([T.StructField("fingerprint", T.LongType(), False)])

    def fn(key, pdf_iter, state: GroupState):
        url = key[0]
        seen = state.get[0] if state.exists else None
        rows = []
        # a micro-batch may contain several crawls of one url in arbitrary
        # arrival order — fold them in event-time order
        frames = [p for p in pdf_iter if len(p)]
        if not frames:
            if seen is not None:
                state.update((seen,))
            return
        batch = pd.concat(frames, ignore_index=True).sort_values(
            ["warc_ts", "fingerprint"]
        )
        for fp in batch["fingerprint"].astype("int64"):
            fp = int(fp)
            if seen is None:
                rows.append({"url": url, "fingerprint": fp, "change_type": "create"})
                seen = fp
            elif fp != seen:
                rows.append({"url": url, "fingerprint": fp, "change_type": "modify"})
                seen = fp
        state.update((seen,))
        if rows:
            yield pd.DataFrame(rows)

    from pyspark.sql import functions as F  # noqa: PLC0415

    from ..functions.hashing import portable_hash64  # noqa: PLC0415

    fingerprinted = stream.select(
        "url", "warc_ts", portable_hash64(F.col("text")).alias("fingerprint")
    )
    return fingerprinted.groupBy("url").applyInPandasWithState(
        fn, outputStructType=out_schema, stateStructType=state_schema,
        outputMode="append", timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_stream(stream: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts", gap: str = "30 minutes",
                      watermark: str = "2 hours") -> DataFrame:
    """Streaming session windows: per-(user, session) event counts via the
    built-in session_window with a late-data watermark — the streaming twin
    of the batch events_sessionize query (gap-merged sessions close once
    the watermark passes, so append mode emits each session exactly once).

    Scale: state keys on (user, open session) — bounded by active users in
    the gap horizon; the watermark evicts closed sessions."""
    # event-time columns must be TIMESTAMP (watermarks reject TIMESTAMP_NTZ)
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            user_col, "n_events",
        )
    )
