"""Scale-up spot-check (the 100x question at a testable size): run the
top-3 headline queries at sf0.1 and at a deterministic 10x replica of the
same tables, and report wall-time growth.

The 10x input is built by unioning 10 id-shifted copies of the sf0.1
tables (ids are shifted by replica * range so the synthetic geo derive
produces NEW positions with the same distribution — rows are distinct,
joins still resolve, skew profile is preserved). No external data.

Usage: python tools/scale_spotcheck.py [sf_dir] [out_dir]
Prints one JSON line per query: {query, t_1x, t_10x, growth}.
Record the results in SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

REPLICAS = 10
# id shift per replica: above every id in the sf0.1 tables
SHIFTS = {
    "lineitem": ("l_orderkey", 10_000_000),
    "part": ("p_partkey", 10_000_000),
    "documents": ("doc_id", 10_000_000),
    "embeddings": ("vec_id", 10_000_000),
}
QUERIES = ["tile_way_mvt_stats", "text_dedupe_clusters", "geo_bbox_overlap_join"]


def build_10x(spark, sf_dir: str, out_dir: str) -> None:
    from pyspark.sql import functions as F

    tables = list(SHIFTS) + ["nation", "region"]
    if all(
        os.path.exists(f"{out_dir}/{t}.parquet/_SUCCESS") for t in tables
    ):
        print(f"reusing existing 10x build at {out_dir}", flush=True)
        return
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    for table, (key, step) in SHIFTS.items():
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        # one narrow union plan: cross join vs a 10-row replica index, every
        # id column shifted together so foreign keys keep resolving
        reps = spark.range(REPLICAS).withColumnRenamed("id", "__rep")
        shifted = df.crossJoin(F.broadcast(reps))
        for c in df.columns:
            if c.endswith("key") or c in ("doc_id", "vec_id"):
                shifted = shifted.withColumn(
                    c, F.col(c) + F.col("__rep") * step
                )
        if table == "embeddings":
            # keep the candidate buckets replica-local: the vectors are
            # byte-copies, so without this every vector would be a 10-way
            # cross-replica near-dup and pair count would grow ~100x by
            # CONSTRUCTION (a data artifact, not an engine property).
            # Shifting the bucket label per replica gives 10x more data
            # with the same per-bucket shape.
            shifted = shifted.withColumn(
                "label",
                (F.col("label") + F.col("__rep").cast("int") * 100000).cast("int"),
            )
        shifted.drop("__rep").write.mode("overwrite").parquet(
            f"{out_dir}/{table}.parquet"
        )
    for table in ("nation", "region"):  # small dims: copy as-is
        spark.read.parquet(f"{sf_dir}/{table}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{table}.parquet")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/osmix_scale10"

    from osmix_spark.session import get_spark

    spark = get_spark("scale-spotcheck", cores=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    build_10x(spark, sf_dir, out_dir)

    from osmix_spark import queries as _q

    qs = _q.all_queries()
    results = []
    for name in QUERIES:
        times = {}
        for label, d in (("1x", sf_dir), ("10x", out_dir)):
            fn = lambda: qs[name](spark, d).write.format("noop").mode(
                "overwrite"
            ).save()
            fn()  # warmup: codegen + worker page-touch
            samples = []
            for _ in range(2):
                t0 = time.perf_counter()
                fn()
                samples.append(time.perf_counter() - t0)
            times[label] = round(min(samples), 2)
        growth = round(times["10x"] / times["1x"], 2)
        rec = {"query": name, "t_1x": times["1x"], "t_10x": times["10x"],
               "growth_at_10x_rows": growth}
        results.append(rec)
        print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
