"""OSM PBF round-trip (the reference's write->read->compare regression,
packages/load/test/pbf-regression.test.ts): write the mock fixture + a
synthetic layer to PBF, read it back distributed, compare exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from osmix_spark.sources import fixtures, pbf, synth


def _norm_nodes(df):
    return {
        (r["id"], round(r["lon"], 7), round(r["lat"], 7), tuple(sorted((r["tags"] or {}).items())))
        for r in df.collect()
    }


def test_roundtrip_mock_fixture(spark, tmp_path):
    path = str(tmp_path / "mock.pbf")
    nodes = fixtures.patch_nodes(spark)
    ways = fixtures.patch_ways(spark)
    rels = spark.createDataFrame(
        [(50, ["way", "node"], [1, 2], ["outer", ""], {"type": "multipolygon"})],
        pbf.REL_SCHEMA,
    )
    pbf.write_pbf(path, nodes, ways, rels, bbox=(-121.0, 46.0, -120.0, 47.0))

    out = pbf.read_pbf(spark, path)
    assert _norm_nodes(out["nodes"]) == _norm_nodes(nodes)
    got_w = {r["id"]: (list(r["refs"]), r["tags"]) for r in out["ways"].collect()}
    exp_w = {r["id"]: (list(r["refs"]), r["tags"]) for r in ways.collect()}
    assert got_w == exp_w
    got_r = out["relations"].collect()[0]
    assert got_r["id"] == 50
    assert list(got_r["member_types"]) == ["way", "node"]
    assert list(got_r["member_refs"]) == [1, 2]
    assert list(got_r["member_roles"]) == ["outer", ""]
    assert got_r["tags"] == {"type": "multipolygon"}


def test_header_peek(spark, tmp_path):
    path = str(tmp_path / "h.pbf")
    pbf.write_pbf(path, fixtures.base_nodes(spark), bbox=(-121.0, 46.0, -120.0, 47.0))
    h = pbf.read_header(path)
    assert "OsmSchema-V0.6" in h["required_features"]
    assert "DenseNodes" in h["required_features"]
    assert h["writing_program"] == "osmix-spark"
    assert h["bbox"] == [-121.0, 46.0, -120.0, 47.0]


def test_roundtrip_multiblock_sorted(spark, tmp_path):
    """> 8,000 nodes forces multiple blocks; export is globally id-sorted."""
    path = str(tmp_path / "big.pbf")
    n = 20_000
    nodes = (
        spark.range(n)
        .repartition(8)
        .select(
            F.col("id"),
            synth.clustered_lon("id").alias("lon"),
            synth.clustered_lat("id").alias("lat"),
            F.when(F.col("id") % 100 == 0, F.create_map(F.lit("k"), F.lit("v"))).alias("tags"),
        )
    )
    pbf.write_pbf(path, nodes)
    blobs = pbf.index_blobs(path)
    assert sum(1 for _o, _l, t in blobs if t == "OSMData") >= 3

    out = pbf.read_pbf(spark, path)["nodes"]
    assert out.count() == n
    assert _norm_nodes(out) == _norm_nodes(nodes)
    # block-level id ordering: first ids of consecutive data blobs ascend
    firsts = []
    with open(path, "rb") as f:
        data = f.read()
    for o, ln, t in blobs:
        if t == "OSMData":
            firsts.append(pbf._first_id_of_blob(data[o : o + ln], "node"))
    assert firsts == sorted(firsts)


def test_write_is_deterministic(spark, tmp_path):
    p1, p2 = str(tmp_path / "a.pbf"), str(tmp_path / "b.pbf")
    nodes = fixtures.patch_nodes(spark)
    pbf.write_pbf(p1, nodes.repartition(1))
    pbf.write_pbf(p2, nodes.repartition(5))
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_write_pbf_parallelism_invariant_bytes(spark, tmp_path):
    """Block boundaries are fixed id ranges, so output bytes must be
    identical regardless of input partitioning (cluster-size invariance)."""
    from osmix_spark.sources import pbf

    nodes = spark.createDataFrame(
        [(i, i * 0.001, -i * 0.001, None) for i in range(0, 20000, 3)],
        "id long, lon double, lat double, tags map<string,string>",
    )
    p1, p2 = str(tmp_path / "a.pbf"), str(tmp_path / "b.pbf")
    pbf.write_pbf(p1, nodes.repartition(1))
    pbf.write_pbf(p2, nodes.repartition(13))
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_varint_negative_terminates():
    from osmix_spark.functions import protowire as pw

    b = pw.varint(-1)
    assert len(b) == 10  # 64-bit two's complement, protobuf int64
    assert pw.read_varint(b, 0)[0] == (1 << 64) - 1


def test_missing_node_refs_preserved_losslessly(spark, tmp_path):
    """Reference packages/load/test/missing-node-refs.test.ts: a way whose
    refs point at absent nodes at the FIRST, MIDDLE, and LAST positions
    keeps those ids losslessly through a write->read round trip (the
    reference stores them in missingRefPositions/missingRefIds; our
    relational model keeps refs as OSM ids, so the invariant is that none
    are dropped or reordered)."""
    nodes = spark.createDataFrame(
        [(1, 0.0, 0.0, None), (2, 1e-7, 1e-7, None)], fixtures.NODE_SCHEMA
    )
    # decoded refs of the reference's delta block [99,-98,97,-96,95]
    ways = spark.createDataFrame(
        [(300, [99, 1, 98, 2, 97], None), (301, [500, 501], None)],
        fixtures.WAY_SCHEMA,
    )
    path = str(tmp_path / "missing.pbf")
    pbf.write_pbf(path, nodes, ways)
    out = pbf.read_pbf(spark, path)
    got = {r["id"]: list(r["refs"]) for r in out["ways"].collect()}
    assert got == {300: [99, 1, 98, 2, 97], 301: [500, 501]}


def test_missing_node_refs_resolution_semantics(spark):
    """missing-node-refs.test.ts dangling-ref expectations re-expressed for
    the join model: the per-way bbox aggregates over RESOLVABLE refs only
    (way 300 -> bbox of nodes 1 and 2; way 301 with no resolvable refs has
    no bbox row at all — the 'inverted bbox' that can never match,
    ways.ts:350-359), tolerant resolution (getResolvedCoordinates) yields
    the resolvable coordinate subsequence, and strict resolution
    (getCoordinates) surfaces the gap."""
    nodes = spark.createDataFrame(
        [(1, 0.0, 0.0, None), (2, 1e-7, 1e-7, None)], fixtures.NODE_SCHEMA
    )
    ways = spark.createDataFrame(
        [(300, [99, 1, 98, 2, 97], None), (301, [500, 501], None)],
        fixtures.WAY_SCHEMA,
    )
    refs = ways.select("id", F.posexplode("refs").alias("seq", "ref"))
    resolved = refs.join(
        nodes.select(F.col("id").alias("ref"), "lon", "lat"), "ref", "left"
    )
    # tolerant: drop unresolvable refs, keep order (ways.ts:304-345)
    tolerant = (
        resolved.filter(F.col("lon").isNotNull())
        .groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("seq", "lon", "lat"))).alias("s"))
        .select("id", F.col("s.lon").alias("lons"), F.col("s.lat").alias("lats"))
    )
    t = {r["id"]: list(zip(r["lons"], r["lats"])) for r in tolerant.collect()}
    assert t == {300: [(0.0, 0.0), (1e-7, 1e-7)]}  # way 301 fully dangling

    # bbox over resolvable refs only; no row for way 301
    bbox = (
        resolved.filter(F.col("lon").isNotNull())
        .groupBy("id")
        .agg(F.min("lon").alias("minx"), F.min("lat").alias("miny"),
             F.max("lon").alias("maxx"), F.max("lat").alias("maxy"))
    )
    b = {r["id"]: (r["minx"], r["miny"], r["maxx"], r["maxy"]) for r in bbox.collect()}
    assert set(b) == {300}
    assert b[300] == (0.0, 0.0, 1e-7, 1e-7)

    # strict: a way with ANY unresolvable ref is flagged (getCoordinates throw)
    strict_bad = (
        resolved.groupBy("id")
        .agg(F.sum(F.when(F.col("lon").isNull(), 1).otherwise(0)).alias("n_missing"))
        .filter(F.col("n_missing") > 0)
    )
    assert {r["id"] for r in strict_bad.collect()} == {300, 301}
