"""GTFS source (S7): stops -> nodes, shapes -> ways.

Reference: packages/gtfs/src/from-gtfs.ts:71-130 (stops become nodes with
name tags; one way per shape, vertices ordered by shape_pt_sequence).
spark.read.csv + groupBy + sorted collect_list — no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SHAPE_ID_OFFSET = 1_000_000_000  # shape ways above the stop-node id space
SHAPE_VERTEX_STRIDE = 100_000


def stops_to_nodes(spark: SparkSession, stops_csv: str) -> DataFrame:
    stops = spark.read.csv(stops_csv, header=True, inferSchema=True)
    return stops.select(
        F.col("stop_id").cast("long").alias("id"),
        F.col("stop_lon").cast("double").alias("lon"),
        F.col("stop_lat").cast("double").alias("lat"),
        F.map_from_arrays(
            F.array(F.lit("name"), F.lit("public_transport")),
            F.array(F.col("stop_name").cast("string"), F.lit("platform")),
        ).alias("tags"),
    )


def shapes_to_ways(spark: SparkSession, shapes_csv: str):
    """-> (vertex_nodes, ways): one way per shape_id with synthetic vertex
    node ids (deterministic in (shape_id, sequence))."""
    shapes = spark.read.csv(shapes_csv, header=True, inferSchema=True)
    v = shapes.select(
        F.col("shape_id").cast("long").alias("shape_id"),
        F.col("shape_pt_sequence").cast("int").alias("seq"),
        F.col("shape_pt_lon").cast("double").alias("lon"),
        F.col("shape_pt_lat").cast("double").alias("lat"),
    ).withColumn(
        "node_id",
        F.lit(SHAPE_ID_OFFSET) + F.col("shape_id") * SHAPE_VERTEX_STRIDE + F.col("seq"),
    )
    nodes = v.select(
        F.col("node_id").alias("id"), "lon", "lat",
        F.lit(None).cast("map<string,string>").alias("tags"),
    )
    ways = (
        v.groupBy("shape_id")
        .agg(F.array_sort(F.collect_list(F.struct("seq", "node_id"))).alias("s"))
        .select(
            (F.lit(SHAPE_ID_OFFSET) + F.col("shape_id")).alias("id"),
            F.col("s.node_id").alias("refs"),
            F.create_map(F.lit("route"), F.lit("gtfs_shape")).alias("tags"),
        )
    )
    return nodes, ways
