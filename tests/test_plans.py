"""Physical-plan shape regressions: the properties that matter at 100 TB —
filter pushdown reaching the scan, column pruning, broadcast joins for
small dims, whole-stage codegen coverage."""

from __future__ import annotations

from pyspark.sql import functions as F


def _final_plan(df) -> str:
    df.collect()  # AQE finalizes the plan only on THIS DataFrame's execution
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    df = li.filter(F.col("l_shipdate") <= F.lit("1995-01-01").cast("timestamp")).select(
        "l_orderkey", "l_quantity"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "LessThanOrEqual(l_shipdate" in plan


def test_column_pruning(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    df = li.select("l_orderkey")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # only the projected column is read
    assert "ReadSchema: struct<l_orderkey:bigint>" in plan


def test_small_dim_broadcasts(spark, sf_dir):
    import __spark_entry__ as em

    df = em.queries()["osm_way_refs_join"](spark, sf_dir)
    plan = _final_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_codegen_active_on_agg(spark, sf_dir):
    import __spark_entry__ as em

    df = em.queries()["q1_pricing_summary"](spark, sf_dir)
    plan = _final_plan(df)
    # '*' prefixes mark whole-stage-codegen'd operators
    assert "*(1)" in plan and "*(2)" in plan
    assert "partial_sum" in plan  # map-side combine before the shuffle


def test_geo_kernel_stays_jvm_side(spark, sf_dir):
    import __spark_entry__ as em

    df = em.queries()["geo_cell_assign"](spark, sf_dir)
    plan = _final_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "mapInPandas" not in plan.lower()
