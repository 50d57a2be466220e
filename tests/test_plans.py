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
    from osmix_spark import queries as em_queries

    df = em_queries.all_queries()["geo_cell_assign"](spark, sf_dir)
    plan = _final_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "mapInPandas" not in plan.lower()


def test_shortbread_layers_stays_jvm_side(spark, sf_dir):
    import __spark_entry__ as em

    df = em.queries()["shortbread_layers"](spark, sf_dir)
    plan = _final_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "mapInPandas" not in plan.lower()


def test_geojson_node_way_paths_stay_jvm_side(spark, sf_dir):
    """Node and way feature serialization is pure Catalyst (JSON via
    concat/format_string/to_json) — no Python in the two big paths."""
    from pyspark.sql import functions as F

    from osmix_spark.operators import geojson_export as gj

    nodes = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.col("p_partkey").alias("id"),
        (F.col("p_partkey") * 0.001).alias("lon"),
        (F.col("p_partkey") * 0.0005).alias("lat"),
        F.create_map(F.lit("name"), F.col("p_name")).alias("tags"),
    )
    plan = _final_plan(gj.nodes_to_features(nodes))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bbox_overlap_join_no_cartesian(spark, sf_dir):
    """The adaptive-cover overlap join must stay an equi-join union — a
    cartesian/broadcast-nested-loop here would melt at scale."""
    import __spark_entry__ as em

    df = em.queries()["geo_bbox_overlap_join"](spark, sf_dir)
    plan = _final_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cell_partitioned_layout_prunes(spark, sf_dir, tmp_path):
    """The cell-partitioned layout must prune at PLANNING time: a city-bbox
    read over a world-spread table plans only the matching partition
    directories (PartitionFilters + file-count drop)."""
    from pyspark.sql import functions as F

    from osmix_spark.sources import layout, synth

    pts = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").alias("id"),
        # spread points across the globe so partitions are real
        ((F.col("doc_id") * 37 % 340) - 170.0 + 0.5).alias("lon"),
        ((F.col("doc_id") * 91 % 140) - 70.0 + 0.5).alias("lat"),
    )
    path = str(tmp_path / "cells")
    layout.write_cell_partitioned(pts, path)

    full = spark.read.parquet(path)
    pruned = layout.read_bbox(spark, path, -1.0, -1.0, 6.0, 6.0)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell_p" in plan

    def n_files(df):
        return df.select(F.input_file_name()).distinct().count()

    assert n_files(pruned) < n_files(full) / 4
    # and the result is exactly the brute-force filter
    expect = pts.filter(
        (F.col("lon") >= -1.0) & (F.col("lon") <= 6.0)
        & (F.col("lat") >= -1.0) & (F.col("lat") <= 6.0)
    ).count()
    assert pruned.count() == expect


def test_bucketed_join_needs_no_exchange(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key sort-merge join WITHOUT a
    shuffle: the co-located-join layout for the workhorse way->node
    resolution at 100 TB (pre-bucketed node and way_refs tables join
    exchange-free; the reference's ingest-time ref resolution plays the
    same role single-node)."""
    from osmix_spark.sources import layout

    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.col("p_partkey").alias("id"), F.col("p_name").alias("name")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_partkey").alias("id"), F.col("l_quantity").alias("qty")
    )
    layout.write_bucketed(part, "bk_nodes", str(tmp_path / "bk_nodes"), "id", 8)
    layout.write_bucketed(li, "bk_refs", str(tmp_path / "bk_refs"), "id", 8)
    try:
        a = layout.read_bucketed(spark, "bk_nodes")
        b = layout.read_bucketed(spark, "bk_refs")
        # forbid broadcast so the join-strategy choice is real
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = a.join(b, "id").groupBy("name").agg(F.sum("qty").alias("q"))
            joined.collect()
            plan = joined._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
        assert "SortMergeJoin" in plan
        # the JOIN inputs come straight from bucketed scans: no exchange
        # may hash-partition on the join key anywhere in the plan (the
        # aggregation's exchange on `name` is expected and allowed)
        assert "Exchange hashpartitioning(id" not in plan, "bucketed join still shuffled"
        assert "SelectedBucketsCount" in plan  # bucketed scan engaged
        # correctness unchanged vs the plain join
        expect = part.join(li, "id").groupBy("name").agg(F.sum("qty").alias("q"))
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, expect.collect()))
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_nodes")
        spark.sql("DROP TABLE IF EXISTS bk_refs")
