"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side plumbing is REAL and tested — schemas, Arrow batch shapes,
partition-preserving mapInPandas transforms, typed metadata extraction —
while the codec step is a clearly-marked stub (no image/audio libraries in
this environment): `decode_image` raises NotImplementedError unless
`fake=True`, in which case a deterministic fake decoder (bytes -> shape +
checksum "features") exercises the full pipeline.

At 100 TB: binary payloads dominate bytes; the rules encoded here —
project metadata columns WITHOUT touching the binary (column pruning keeps
payload I/O out of metadata queries), batch decode in mapInPandas with
small maxRecordsPerBatch, and key outputs by content hash — are the parts
that must be right regardless of codec.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content_hash", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def synth_media(spark, n: int, parts: int = 4) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from the id."""
    return (
        spark.range(n)
        .repartition(parts)
        .select(
            F.col("id").alias("media_id"),
            F.element_at(F.lit(["image", "audio", "video"]), (F.col("id") % 3 + 1).cast("int")).alias("kind"),
            F.lit("application/octet-stream").alias("mime"),
            F.encode(
                F.concat(F.lit("payload-"), F.col("id").cast("string"),
                         F.lit("-"), F.md5(F.col("id").cast("string"))),
                "utf-8",
            ).alias("payload"),
            F.create_map(F.lit("source"), F.lit("synthetic")).alias("meta"),
        )
    )


def decode_media(media: DataFrame, fake: bool = False, feature_dim: int = 8) -> DataFrame:
    """Decode + feature-extract in Arrow batches.

    fake=False raises NotImplementedError at task time (codec libraries are
    not available in this environment — STUB, clearly marked). fake=True
    runs a deterministic stand-in: width/height from payload length, a
    feature vector from the payload's rolling checksum — same schema,
    partitioning, and batch shape as a real decoder.
    """

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media codecs not available in this environment; "
                    "pass fake=True for the deterministic stand-in"
                )
            rows = []
            for r in pdf.itertuples(index=False):
                buf = bytes(r.payload)
                h = int.from_bytes(hashlib.md5(buf).digest()[:8], "big") >> 1
                arr = np.frombuffer(buf, dtype=np.uint8).astype(np.float32)
                pad = (-len(arr)) % feature_dim
                if pad:
                    arr = np.concatenate([arr, np.zeros(pad, dtype=np.float32)])
                feats = arr.reshape(-1, feature_dim).mean(axis=0) / 255.0
                rows.append(
                    {
                        "media_id": int(r.media_id),
                        "content_hash": h,
                        "n_bytes": len(buf),
                        "width": len(buf) % 640 if r.kind == "image" else None,
                        "height": len(buf) % 480 if r.kind == "image" else None,
                        "features": feats.tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.mapInPandas(go, schema=FEATURE_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregation: MUST NOT read the payload column — the
    projection keeps binary bytes out of the scan (check ReadSchema in
    .explain)."""
    return (
        media.select("kind", F.length("payload").alias("n_bytes"))
        .groupBy("kind")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_bytes").alias("total_bytes"))
    )
