"""Golden micro-fixtures replicating the reference's merge mocks exactly.

Source of truth: reference packages/core/src/mocks.ts:5-141 and expected
outcomes in packages/change/test/merge.test.ts:33-120. Coordinates, ids,
tags, and way refs are copied value-for-value so our merge/dedupe operators
can be asserted against the reference's golden outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

YAKIMA_LAT = 46.60207
YAKIMA_LON = -120.505898
ONE_KM_LON = 0.0131
ONE_KM_LAT = 0.009

NODE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("lon", T.DoubleType(), False),
        T.StructField("lat", T.DoubleType(), False),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

WAY_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("refs", T.ArrayType(T.LongType()), False),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType(), False),
        T.StructField("ref", T.LongType(), False),
        T.StructField("role", T.StringType(), True),
    ]
)

RELATION_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("members", T.ArrayType(MEMBER_SCHEMA), False),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def base_nodes(spark: SparkSession) -> DataFrame:
    """mocks.ts:11-26 — node 0 at the centroid, node 1 one km west."""
    rows = [
        (0, YAKIMA_LON, YAKIMA_LAT, None),
        (1, YAKIMA_LON - ONE_KM_LON, YAKIMA_LAT, None),
    ]
    return spark.createDataFrame(rows, NODE_SCHEMA)


def base_ways(spark: SparkSession) -> DataFrame:
    """mocks.ts:28-36 — way 1 = [0,1] highway=primary."""
    return spark.createDataFrame([(1, [0, 1], {"highway": "primary"})], WAY_SCHEMA)


def patch_nodes(spark: SparkSession) -> DataFrame:
    """mocks.ts:56-100."""
    rows = [
        (0, YAKIMA_LON, YAKIMA_LAT, None),
        (1, YAKIMA_LON - ONE_KM_LON, YAKIMA_LAT, None),
        (2, YAKIMA_LON, YAKIMA_LAT, {"crossing": "yes"}),  # node 0's position
        (3, YAKIMA_LON + ONE_KM_LON, YAKIMA_LAT, None),
        (4, YAKIMA_LON + ONE_KM_LON / 4, YAKIMA_LAT - ONE_KM_LAT, None),
        (5, YAKIMA_LON + ONE_KM_LON / 4, YAKIMA_LAT + ONE_KM_LAT, None),
        (6, YAKIMA_LON + ONE_KM_LON / 2, YAKIMA_LAT - ONE_KM_LAT, None),
        (7, YAKIMA_LON + ONE_KM_LON / 2, YAKIMA_LAT + ONE_KM_LAT, None),
    ]
    return spark.createDataFrame(rows, NODE_SCHEMA)


def patch_ways(spark: SparkSession) -> DataFrame:
    """mocks.ts:104-138 — way 1 re-tagged, way 2 overlapping, way 3 crossing,
    way 4 crossing-but-tunnel (excluded from intersection creation)."""
    rows = [
        (1, [0, 1], {"highway": "primary", "version": "2"}),
        (2, [2, 3], {"highway": "secondary"}),
        (3, [4, 5], {"highway": "primary"}),
        (4, [6, 7], {"highway": "underpass", "tunnel": "yes"}),
    ]
    return spark.createDataFrame(rows, WAY_SCHEMA)
