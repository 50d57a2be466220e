"""Skew handling for dense spatial cells (north-rule requirement).

Dense urban cells (or hot-spot page clusters) make a uniform cell-zoom
partitioning skewed: one reducer gets the city, the rest idle. Three
layered mitigations, all deterministic:

1. AQE skew-join splitting — enabled session-wide (session.py); handles
   join-side skew at runtime with no code changes.
2. Adaptive cell splitting (the reference-free analog of H3 resolution
   escalation): cells whose row count exceeds a threshold are re-keyed at
   a finer zoom. The packed cell key embeds its zoom (functions/geo),
   so a mixed-resolution cell column stays a single join/partition key.
3. Salting: a deterministic hash-mod salt sub-key for operations that
   must keep the original cell (e.g. per-cell aggregation pipelines) —
   partial aggregate by (cell, salt), final combine by cell.

Scale notes: hot-cell detection is one count per key (map-side combined);
the escalation map is tiny (only hot cells) and broadcast into the re-key
join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import geo


def cell_histogram(df: DataFrame, cell: str = "cell") -> DataFrame:
    return df.groupBy(cell).agg(F.count(F.lit(1)).alias("n"))


def detect_hot_cells(df: DataFrame, cell: str = "cell", threshold: int = 100_000) -> DataFrame:
    """Cells with more rows than threshold — the escalation candidates."""
    return cell_histogram(df, cell).filter(F.col("n") > threshold)


def with_adaptive_cell(df: DataFrame, lon: str = "lon", lat: str = "lat",
                       base_z: int = 12, fine_z: int = 15,
                       threshold: int = 100_000, out: str = "cell") -> DataFrame:
    """Mixed-resolution cell assignment: every row gets its base_z cell;
    rows inside hot cells are re-keyed at fine_z instead. The packed key
    embeds z, so downstream equi-joins/groupBys remain single-column.

    Both sides of a spatial join must use the SAME hot-cell set — pass the
    big side's histogram-derived hot set to the small side via
    `apply_cell_escalation`.
    """
    base = df.withColumn("__base", geo.cell_key(F.col(lon), F.col(lat), F.lit(base_z)))
    hot = detect_hot_cells(base, "__base", threshold).select(
        F.col("__base"), F.lit(True).alias("__hot")
    )
    return (
        base.join(F.broadcast(hot), "__base", "left")
        .withColumn(
            out,
            F.when(
                F.col("__hot").isNotNull(),
                geo.cell_key(F.col(lon), F.col(lat), F.lit(fine_z)),
            ).otherwise(F.col("__base")),
        )
        .drop("__base", "__hot")
    )


def apply_cell_escalation(df: DataFrame, hot_cells: DataFrame,
                          lon: str = "lon", lat: str = "lat",
                          base_z: int = 12, fine_z: int = 15,
                          out: str = "cell") -> DataFrame:
    """Re-key df with a PRE-COMPUTED hot-cell set (so join partners agree
    on the mixed resolution). hot_cells: one column of base_z cell keys."""
    hot = hot_cells.select(
        F.col(hot_cells.columns[0]).alias("__base"), F.lit(True).alias("__hot")
    )
    base = df.withColumn("__base", geo.cell_key(F.col(lon), F.col(lat), F.lit(base_z)))
    return (
        base.join(F.broadcast(hot), "__base", "left")
        .withColumn(
            out,
            F.when(
                F.col("__hot").isNotNull(),
                geo.cell_key(F.col(lon), F.col(lat), F.lit(fine_z)),
            ).otherwise(F.col("__base")),
        )
        .drop("__base", "__hot")
    )


def with_salt(df: DataFrame, key: str, n_salts: int = 16, out: str = "salt") -> DataFrame:
    """Deterministic salt sub-key: pmod(xxhash64(row identity), n).
    Aggregations run partial by (key, salt) then final by key."""
    return df.withColumn(out, F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)))


def salted_agg(df: DataFrame, key: str, aggs: list, n_salts: int = 16) -> DataFrame:
    """Two-stage aggregation: (key, salt) partials -> key finals. aggs are
    (col_name, 'sum'|'count'|'min'|'max') pairs; the partial/final algebra
    is handled here."""
    salted = with_salt(df, key, n_salts)
    partial_exprs = []
    final_exprs = []
    for name, kind in aggs:
        pcol = f"__p_{name}_{kind}"
        if kind == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(pcol))
            final_exprs.append(F.sum(pcol).alias(f"{name}_{kind}" if name != "*" else "count"))
        elif kind == "sum":
            partial_exprs.append(F.sum(name).alias(pcol))
            final_exprs.append(F.sum(pcol).alias(f"{name}_sum"))
        elif kind == "min":
            partial_exprs.append(F.min(name).alias(pcol))
            final_exprs.append(F.min(pcol).alias(f"{name}_min"))
        elif kind == "max":
            partial_exprs.append(F.max(name).alias(pcol))
            final_exprs.append(F.max(pcol).alias(f"{name}_max"))
        else:
            raise ValueError(kind)
    return (
        salted.groupBy(key, "salt").agg(*partial_exprs).groupBy(key).agg(*final_exprs)
    )
