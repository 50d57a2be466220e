"""Spatial table layout: cell-partitioned parquet for partition pruning.

The reference keeps per-load-profile in-memory indexes (SURVEY §1.3); the
warehouse-scale analog is a disk LAYOUT: big spatial tables written
hive-partitioned by a coarse cell prefix, so a bbox query prunes entire
directories at PLANNING time (PartitionFilters in the scan) and sorted
within files by the fine cell key so row-group min/max statistics prune
within partitions.

At 100 TB this is the difference between scanning the planet and scanning
a city: a z6 prefix partitions the world into ~4k directories, and every
spatial query in this engine filters on cell-derived predicates that reach
the partition column. tests/test_plans.py asserts the pruning actually
happens (file-count drop + PartitionFilters), so the layout contract is
CI-checked, not aspirational.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import geo

PARTITION_ZOOM = 6  # ~4k world partitions; tune per-table at real scale


def cell_prefix(lon, lat, z: int = PARTITION_ZOOM):
    """The coarse partition key: the packed cell at the partition zoom."""
    return geo.cell_key(lon, lat, F.lit(z))


def write_cell_partitioned(df: DataFrame, path: str,
                           lon: str = "lon", lat: str = "lat",
                           z: int = PARTITION_ZOOM,
                           fine_z: int = 14) -> None:
    """Write a point table hive-partitioned by the z-level cell prefix and
    sorted within files by the fine cell key (row-group statistics line up
    with spatial locality)."""
    out = (
        df.withColumn("cell_p", cell_prefix(F.col(lon), F.col(lat), z))
        .withColumn("cell", geo.cell_key(F.col(lon), F.col(lat), F.lit(fine_z)))
        .repartition("cell_p")
        .sortWithinPartitions("cell_p", "cell")
    )
    out.write.mode("overwrite").partitionBy("cell_p").parquet(path)


def read_bbox(spark: SparkSession, path: str, west: float, south: float,
              east: float, north: float, z: int = PARTITION_ZOOM,
              lon: str = "lon", lat: str = "lat") -> DataFrame:
    """Bbox read that PRUNES partitions: the query bbox is covered with
    partition-zoom cells driver-side (a handful of longs) and pushed as an
    IN filter on the partition column, then refined with the exact bbox
    predicate. The scan plans only the matching directories."""
    import math

    n = 1 << z

    def tx(lo: float) -> int:
        return min(max(int(math.floor((lo / 360.0 + 0.5) * n)), 0), n - 1)

    def ty(la: float) -> int:
        s = math.sin(math.radians(la))
        yf = (0.5 - 0.25 * math.log((1 + s) / (1 - s)) / math.pi) * n
        return min(max(int(math.floor(yf)), 0), n - 1)

    cells = [
        (z << 58) + (x << 29) + y
        for x in range(tx(west), tx(east) + 1)
        for y in range(ty(north), ty(south) + 1)
    ]
    df = spark.read.parquet(path)
    return df.filter(F.col("cell_p").isin(cells)).filter(
        geo.in_bbox(F.col(lon), F.col(lat), west, south, east, north, epsilon=0.0)
    )


def write_bucketed(df: DataFrame, name: str, path: str, key: str = "id",
                   n_buckets: int = 16) -> None:
    """Bucketed table write: hash-bucket by `key` and sort within buckets.

    The co-located-join layout (the reference pre-resolves way->node refs
    at ingest, ways.ts:169-194 — its substitute for a runtime join; on
    Spark the equivalent is bucketing both tables on the join key so the
    sort-merge join reads matching buckets WITHOUT a shuffle exchange).
    External table at `path`; requires saveAsTable (bucket metadata lives
    in the session catalog)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .format("parquet")
        .saveAsTable(name)
    )


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table by catalog name (bucket info is catalog
    metadata — reading the bare parquet path loses it)."""
    return spark.table(name)
