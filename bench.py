"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

The flagship measures the north-rule metric — pages geocoded + spatially
joined + tile-assigned per second — on a lineitem-scale point layer
(~600k rows at sf0.1), not the 5k-row documents table.

Usage: python bench.py            # one JSON line on stdout
       SPARK_GRAFT_CPUS=8 python bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def flagship_pages_pipeline(spark: SparkSession, sf_dir: str) -> tuple[int, DataFrame]:
    """Geocode 'pages' (lineitem-scale synthetic points) -> cell assign ->
    spatial join vs the part-derived node layer -> per-tile aggregation.

    Returns (n_pages, result_df). The big side is scanned once, keyed by
    cell, and joined against a broadcast node layer — at cluster scale the
    node layer is the smaller OSM dim and this stays a broadcast join;
    the groupBy(cell) shuffle is the single exchange.
    """
    from osmix_spark.functions import geo
    from osmix_spark.sources import synth

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    page_id = (F.col("l_orderkey") * 16 + F.col("l_linenumber")).alias("page_id")
    pages = li.select(
        page_id,
        synth.clustered_lon(F.col("l_orderkey") * 16 + F.col("l_linenumber")).alias("lon"),
        synth.clustered_lat(F.col("l_orderkey") * 16 + F.col("l_linenumber")).alias("lat"),
    )
    nodes = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.col("p_partkey").alias("node_id"),
        synth.clustered_lon("p_partkey").alias("lon"),
        synth.clustered_lat("p_partkey").alias("lat"),
    )
    z = F.lit(14)
    p = pages.withColumn("cell", geo.cell_key(F.col("lon"), F.col("lat"), z))
    n = nodes.select(geo.cell_key(F.col("lon"), F.col("lat"), z).alias("cell"), "node_id")
    joined = (
        p.join(F.broadcast(n.groupBy("cell").agg(F.count(F.lit(1)).alias("n_nodes"))), "cell")
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum("n_nodes").alias("node_hits"),
        )
    )
    n_pages = li.count()
    return n_pages, joined


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from osmix_spark.session import get_spark

    spark = get_spark("osmix-bench", cores=cpus, shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod  # noqa: F401 — driver-contract import check

    from osmix_spark import queries as _queries

    qs = _queries.all_queries()
    headline = [
        "q1_pricing_summary",
        "q3_order_revenue",
        "q_window_top_orders",
        "geo_cell_assign",
        "geo_knn",
        "geo_point_in_polygon",
        "geo_bbox_overlap_join",
        "osm_dedupe_nodes",
        "osm_way_refs_join",
        "osm_merge_lww",
        "text_minhash",
        "text_lsh_pairs",
        "text_simhash",
        "embed_cosine_topk",
        "tile_mvt_stats",
        "osm_extract_simple",
        "shortbread_classify",
        "osm_ring_assembly",
        "osm_relation_kind",
        "embed_ann_ivf",
        # round-2 additions
        "osm_dedupe_ways",
        "shortbread_layers",
        "osm_to_geojson",
        "multimodal_decode",
        "embed_ann_lsh",
        "tile_raster_stats",
        "tile_way_mvt_stats",
        # round-3 additions
        "osm_merge_relations",
        "osm_content_hash",
        "text_dedupe_clusters",
        "multimodal_audio",
        "multimodal_video_frames",
        # routing queries (shortest_path/p2p/astar) stay out of the headline:
        # they are round-latency-bound iterative loops, not throughput work
    ]
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}

    def run(df: DataFrame) -> None:
        df.write.format("noop").mode("overwrite").save()

    def timed_median(mk) -> tuple[float, float]:
        """One warmup + 3-5 timed runs; returns (median, max-min spread).
        Medians make a single host-noise blip (hypervisor neighbor, GC
        pause) distinguishable from a real regression — VERDICT r3 flagged
        single-shot timing as the round's main measurement defect. Queries
        whose warmup exceeds 2s get 5 samples: the sandbox shows
        multi-second interference windows that a median-of-3 can still
        straddle on long queries."""
        t0 = time.time()
        run(mk())  # warmup: codegen/JIT/shuffle-file caches
        warm = time.time() - t0
        reps = 5 if warm > 2.0 else 3
        samples = []
        for _ in range(reps):
            t0 = time.time()
            run(mk())
            samples.append(time.time() - t0)
        samples.sort()
        return samples[len(samples) // 2], samples[-1] - samples[0]

    # flagship: pages geocoded+joined+tile-assigned per second
    # (steady-state: warm up codegen/JIT once, then time — the per-round
    # comparable number is throughput, not single-JVM warmup)
    n_pages, result = flagship_pages_pipeline(spark, sf_dir)
    flagship_sec, flagship_spread = timed_median(lambda: result)
    timings["flagship_spatial_join"] = round(flagship_sec, 3)
    spreads["flagship_spatial_join"] = round(flagship_spread, 3)

    for name in headline:
        fn = qs[name]
        med, spread = timed_median(lambda: fn(spark, sf_dir))
        timings[name] = round(med, 3)
        spreads[name] = round(spread, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline suite wall-clock (flagship = pages geocoded+spatial-joined+tile-assigned)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spreads,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
        "flagship_pages": n_pages,
        "flagship_pages_per_sec": round(n_pages / flagship_sec, 1),
    }
    deltas = _deltas_vs_prev_round(timings)
    if deltas:
        out["deltas_vs_prev"] = deltas
    print(json.dumps(out))
    spark.stop()


def _deltas_vs_prev_round(timings: dict[str, float]) -> dict[str, float]:
    """Per-query delta (sec, this - prev) against the latest BENCH_r*.json
    in the repo root, so regressions are visible round over round."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))

    def round_no(p: str) -> int:
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1

    prev_files = sorted(
        (p for p in glob.glob(os.path.join(here, "BENCH_r*.json")) if round_no(p) >= 0),
        key=round_no,
    )
    if not prev_files:
        return {}
    try:
        with open(prev_files[-1]) as f:
            prev = json.load(f)
        prev_q = prev.get("parsed", prev).get("queries", {})
    except Exception:
        return {}
    return {
        k: round(v - prev_q[k], 3) for k, v in timings.items() if k in prev_q
    }


if __name__ == "__main__":
    main()
