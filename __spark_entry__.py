"""Driver contract for the osmix_spark engine.

entry(spark)   — flagship pipeline at sf0.001: geocode document points,
                 assign Web-Mercator cells, spatial-join against the
                 OSM-shaped node layer, aggregate pairs per tile.
queries()      — one callable per implemented operator (SURVEY.md §2).
oracle_sql()   — DuckDB twins (see osmix_spark/queries.py for the lockstep
                 implementations).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from osmix_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pages->cells->spatial join->per-tile counts at sf0.001."""
    from pyspark.sql import functions as F

    from osmix_spark.functions import geo
    from osmix_spark.sources import synth

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = docs.select(
        F.col("doc_id"),
        synth.clustered_lon("doc_id").alias("lon"),
        synth.clustered_lat("doc_id").alias("lat"),
    )
    nodes = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.col("p_partkey").alias("node_id"),
        synth.clustered_lon("p_partkey").alias("lon"),
        synth.clustered_lat("p_partkey").alias("lat"),
    )
    z = F.lit(14)
    p = pages.withColumn("cell", geo.cell_key(F.col("lon"), F.col("lat"), z))
    n = nodes.withColumn("cell", geo.cell_key(F.col("lon"), F.col("lat"), z))
    return (
        p.join(F.broadcast(n.select("cell", "node_id")), "cell")
        .groupBy("cell")
        .agg(
            F.countDistinct("doc_id").alias("n_pages"),
            F.countDistinct("node_id").alias("n_nodes"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
        .orderBy("cell")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_q.ORACLES)
