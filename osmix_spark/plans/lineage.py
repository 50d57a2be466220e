"""Per-stage lineage checkpoints for resumable, byte-reproducible pipelines.

North-rule requirement: "every stage checkpoints per-partition lineage
(cell range, row counts, content hashes) to enable resumable re-runs that
reproduce byte-identical extracted text per url".

The reference's analog is the generation gate + content hash
(packages/shared/src/generation-gate.ts, content-hasher.ts:9-54,
osm.ts:286-295): a version-stamped FNV-1a over all columns to detect
identical datasets cheaply. Distributed, the invariant must hold at ANY
parallelism / partition order, so lineage is keyed by a LOGICAL bucket
(the spatial cell / key range), not by physical partition id:

  lineage row = (bucket, row_count, content_hash, min_key, max_key)
  content_hash = sum of per-row portable 60-bit hashes mod 2^63
                 (commutative -> order/partitioning independent)

A stage re-run at different parallelism produces the same lineage table
bit-for-bit; the stage manifest (sorted lineage digest) is one line of
JSON that certifies equality without reading the data back.

Scale notes: the lineage aggregation is one groupBy(bucket) over columns
already being written — map-side combine makes it a cheap piggyback; the
manifest digest is a tiny second-level aggregate.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64

MANIFEST_NAME = "_lineage_manifest.json"
LINEAGE_DIR = "_lineage"


def lineage_of(df: DataFrame, key: str, bucket_expr=None, n_buckets: int = 64) -> DataFrame:
    """Lineage table for a DataFrame: per logical bucket of `key`, the row
    count, commutative content hash over ALL columns, and key range."""
    bucket = bucket_expr if bucket_expr is not None else F.pmod(F.col(key).cast("long"), F.lit(n_buckets))
    row_hash = portable_hash64(
        F.concat_ws("\x1f", *[F.col(c).cast("string") for c in sorted(df.columns)]), "lineage"
    )
    return (
        df.withColumn("__bucket", bucket)
        .withColumn("__h", row_hash.cast("decimal(38,0)"))
        .groupBy("__bucket")
        .agg(
            F.count(F.lit(1)).alias("row_count"),
            F.pmod(
                F.sum("__h"), F.lit("9223372036854775807").cast("decimal(38,0)")
            ).cast("long").alias("content_hash"),
            F.min(key).alias("min_key"),
            F.max(key).alias("max_key"),
        )
        .withColumnRenamed("__bucket", "bucket")
        .orderBy("bucket")
    )


def manifest_digest(lineage: DataFrame) -> str:
    """One deterministic string over the sorted lineage rows."""
    rows = [tuple(r) for r in lineage.orderBy("bucket").collect()]
    import hashlib

    return hashlib.sha256(repr(rows).encode()).hexdigest()


def checkpoint(df: DataFrame, path: str, key: str, stage: str,
               n_buckets: int = 64, partition_by: str | None = None) -> dict:
    """Write a stage output + its lineage; returns the manifest dict.

    Layout: <path>/data.parquet, <path>/_lineage (parquet),
    <path>/_lineage_manifest.json.
    """
    data_path = os.path.join(path, "data.parquet")
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.parquet(data_path)

    # recompute lineage from what was actually written (certifies the files)
    written = df.sparkSession.read.parquet(data_path)
    lin = lineage_of(written, key=key, n_buckets=n_buckets)
    lin.write.mode("overwrite").parquet(os.path.join(path, LINEAGE_DIR))
    manifest = {
        "stage": stage,
        "key": key,
        "n_buckets": n_buckets,
        "row_count": int(written.count()),
        "digest": manifest_digest(lin),
        "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "columns": sorted(written.columns),
    }
    with open(os.path.join(path, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest


def read_manifest(path: str) -> dict | None:
    p = os.path.join(path, MANIFEST_NAME)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def verify(spark: SparkSession, path: str) -> bool:
    """Re-derive lineage from the checkpointed data and compare digests."""
    manifest = read_manifest(path)
    if manifest is None:
        return False
    df = spark.read.parquet(os.path.join(path, "data.parquet"))
    lin = lineage_of(df, key=manifest["key"], n_buckets=manifest["n_buckets"])
    return manifest_digest(lin) == manifest["digest"]


def resume_or_run(spark: SparkSession, path: str, stage: str, key: str,
                  build, n_buckets: int = 64) -> DataFrame:
    """Resumability primitive: if a verified checkpoint exists, read it;
    otherwise run `build()` and checkpoint it. Re-running a pipeline after
    a crash replays only missing/corrupt stages."""
    if verify(spark, path):
        return spark.read.parquet(os.path.join(path, "data.parquet"))
    df = build()
    checkpoint(df, path, key=key, stage=stage, n_buckets=n_buckets)
    return spark.read.parquet(os.path.join(path, "data.parquet"))
