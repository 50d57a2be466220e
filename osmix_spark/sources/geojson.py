"""GeoJSON source (S5): features -> OSM-shaped entity DataFrames.

Reference: packages/geojson/src/osm-from-geojson.ts:81 — Points become
nodes; LineStrings/Polygons become ways whose vertex nodes get synthetic
ids (the reference allocates synthetic negative-ish ids; here ids are
deterministic functions of (feature id, vertex index) so the result is
identical at any parallelism).

Spark-native: spark.read.json / from_json + explode; coordinates stay in
arrays until the final explode (no Python in the parse path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("id", T.LongType()),
        T.StructField(
            "geometry",
            T.StructType(
                [
                    T.StructField("type", T.StringType()),
                    # encoded as string; re-parsed per geometry type below
                    T.StructField("coordinates", T.StringType()),
                ]
            ),
        ),
        T.StructField("properties", T.MapType(T.StringType(), T.StringType())),
    ]
)

# synthetic vertex ids: feature_id * STRIDE + seq + 1 (deterministic,
# collision-free for ways up to STRIDE vertices — the reference caps ways
# at 2,000 refs, core/src/ways.ts:39)
ID_STRIDE = 4096


def read_geojson_features(spark: SparkSession, path: str) -> DataFrame:
    """NDJSON (one Feature per line) -> typed feature rows."""
    raw = spark.read.text(path)
    parsed = raw.select(
        F.from_json(
            "value",
            T.StructType(
                [
                    T.StructField("type", T.StringType()),
                    T.StructField("id", T.LongType()),
                    T.StructField(
                        "geometry",
                        T.StructType(
                            [
                                T.StructField("type", T.StringType()),
                            ]
                        ),
                    ),
                    T.StructField("properties", T.MapType(T.StringType(), T.StringType())),
                ]
            ),
        ).alias("f"),
        F.get_json_object("value", "$.geometry.coordinates").alias("coords_json"),
    )
    return parsed.select(
        F.col("f.id").alias("feature_id"),
        F.col("f.geometry.type").alias("geom_type"),
        F.col("coords_json"),
        F.col("f.properties").alias("tags"),
    )


def osm_from_geojson(spark: SparkSession, path: str):
    """-> (nodes, ways): Points as tagged nodes keyed by feature id;
    LineStrings/Polygons as ways over synthetic vertex nodes."""
    feats = read_geojson_features(spark, path)

    pts = feats.filter(F.col("geom_type") == "Point").select(
        F.col("feature_id").alias("id"),
        F.from_json("coords_json", "array<double>").alias("c"),
        "tags",
    )
    point_nodes = pts.select(
        "id", F.col("c")[0].alias("lon"), F.col("c")[1].alias("lat"), "tags"
    )

    lines = feats.filter(F.col("geom_type") == "LineString").select(
        "feature_id",
        F.from_json("coords_json", "array<array<double>>").alias("cs"),
        "tags",
    )
    polys = feats.filter(F.col("geom_type") == "Polygon").select(
        "feature_id",
        # outer ring
        F.from_json("coords_json", "array<array<array<double>>>")[0].alias("cs"),
        "tags",
    )
    linear = lines.unionByName(polys)

    vertex = linear.select(
        "feature_id", "tags", F.posexplode("cs").alias("seq", "c")
    ).select(
        "feature_id", "tags", "seq",
        (F.col("feature_id") * ID_STRIDE + F.col("seq") + 1).alias("node_id"),
        F.col("c")[0].alias("lon"),
        F.col("c")[1].alias("lat"),
    )
    way_nodes = vertex.select(
        F.col("node_id").alias("id"), "lon", "lat",
        F.lit(None).cast("map<string,string>").alias("tags"),
    )
    ways = (
        vertex.groupBy("feature_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("seq", "node_id"))).alias("s"),
            F.first("tags").alias("tags"),
        )
        .select(F.col("feature_id").alias("id"), F.col("s.node_id").alias("refs"), "tags")
    )
    nodes = point_nodes.unionByName(way_nodes)
    return nodes, ways
