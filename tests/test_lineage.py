"""Lineage checkpoints: identical manifests at any parallelism (the
byte-reproducibility invariant), resume-from-checkpoint, corruption
detection."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from osmix_spark.plans import lineage
from osmix_spark.sources import synth


def _points(spark, n=2000, parts=4):
    return (
        spark.range(n)
        .repartition(parts)
        .select(
            F.col("id"),
            synth.clustered_lon("id").alias("lon"),
            synth.clustered_lat("id").alias("lat"),
        )
    )


def test_lineage_parallelism_invariant(spark):
    a = lineage.manifest_digest(lineage.lineage_of(_points(spark, parts=1), key="id"))
    b = lineage.manifest_digest(lineage.lineage_of(_points(spark, parts=13), key="id"))
    assert a == b


def test_checkpoint_verify_resume(spark, tmp_path):
    path = str(tmp_path / "stage1")
    df = _points(spark)
    m = lineage.checkpoint(df, path, key="id", stage="points")
    assert m["row_count"] == 2000
    assert lineage.verify(spark, path)

    calls = []

    def build():
        calls.append(1)
        return _points(spark)

    out = lineage.resume_or_run(spark, path, stage="points", key="id", build=build)
    assert out.count() == 2000
    assert calls == []  # resumed, not rebuilt

    # corrupt the manifest -> rebuild happens
    mp = os.path.join(path, lineage.MANIFEST_NAME)
    bad = json.load(open(mp))
    bad["digest"] = "0" * 64
    json.dump(bad, open(mp, "w"))
    out = lineage.resume_or_run(spark, path, stage="points", key="id", build=build)
    assert out.count() == 2000
    assert calls == [1]
    assert lineage.verify(spark, path)


def test_rerun_reproduces_identical_manifest(spark, tmp_path):
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = lineage.checkpoint(_points(spark, parts=2), p1, key="id", stage="s")
    m2 = lineage.checkpoint(_points(spark, parts=11), p2, key="id", stage="s")
    assert m1["digest"] == m2["digest"]
    assert m1["row_count"] == m2["row_count"]
