"""Intersection creation (J10) — golden outcome from the reference's
merge.test.ts:95-118: on the merged+deduped mock fixture, exactly 1
intersection point is found, 1 node created (crossing=yes), and the two
crossing ways get the new node spliced in."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osmix_spark.operators import intersect, merge
from osmix_spark.sources import fixtures


@pytest.fixture()
def merged(spark):
    """The post-merge post-dedupe state from test_merge_golden: nodes
    1..7 (0 deleted), ways 1=[2,1], 2=[2,3], 3=[4,5], 4=[6,7]."""
    base_n, base_w = fixtures.base_nodes(spark), fixtures.base_ways(spark)
    patch_n, patch_w = fixtures.patch_nodes(spark), fixtures.patch_ways(spark)
    nodes = merge.direct_merge(base_n, patch_n)
    ways = merge.direct_merge(base_w, patch_w)
    repl = merge.dedupe_nodes(nodes)
    ways = merge.rewrite_way_refs(ways, repl)
    nodes = nodes.join(repl.select(F.col("from_id").alias("id")), "id", "left_anti")
    return nodes, ways


def test_golden_intersection(spark, merged):
    nodes, ways = merged
    new_nodes, updated_ways, tagged, stats = intersect.create_intersections(ways, nodes)

    assert stats["intersection_points_found"] == 1
    assert stats["intersection_nodes_created"] == 1

    nn = new_nodes.collect()
    assert len(nn) == 1
    n = nn[0]
    assert n["id"] == 8  # max node id 7 + 1
    assert n["tags"] == {"crossing": "yes"}
    # intersection of way2 (horizontal through centroid->1km east) with
    # way3 (vertical at 250 m east)
    assert n["lon"] == pytest.approx(fixtures.YAKIMA_LON + fixtures.ONE_KM_LON / 4, abs=1e-9)
    assert n["lat"] == pytest.approx(fixtures.YAKIMA_LAT, abs=1e-9)

    w = {r["id"]: r["refs"] for r in updated_ways.collect()}
    assert 8 in w[2] and 8 in w[3]
    assert w[1] == [2, 1]      # untouched
    assert w[4] == [6, 7]      # tunnel way untouched
    # splice inserts before the nearest ref (reference nearestNodeOnWay)
    assert w[2] == [8, 2, 3]
    assert w[3] == [8, 4, 5]


def test_tunnel_never_connects(spark, merged):
    nodes, ways = merged
    # only ways 3 (plain highway) and 4 (tunnel) cross each other? they are
    # parallel verticals — instead check way2 x way4: way4 crosses way2's
    # span at 500 m east but has tunnel=yes
    pts = intersect.find_intersection_points(
        ways.filter(F.col("id").isin(2, 4)), nodes
    )
    assert pts.count() == 0


def test_shared_node_crossing_is_not_counted(spark):
    # two ways crossing AT a node they both reference: the reference tags
    # the shared node crossing=yes but counts no intersection
    # (changeset.ts:612-626)
    nodes = spark.createDataFrame(
        [
            (1, 0.0, 0.0, None), (2, 0.001, 0.0, None), (3, 0.002, 0.0, None),
            (4, 0.001, -0.001, None), (5, 0.001, 0.001, None),
        ],
        fixtures.NODE_SCHEMA,
    )
    ways = spark.createDataFrame(
        [
            (10, [1, 2, 3], {"highway": "primary"}),
            (11, [4, 2, 5], {"highway": "secondary"}),
        ],
        fixtures.WAY_SCHEMA,
    )
    new_nodes, updated_ways, tagged, stats = intersect.create_intersections(ways, nodes)
    assert stats["intersection_points_found"] == 0
    assert stats["intersection_nodes_created"] == 0
    assert stats["shared_node_points"] == 1
    assert {r["id"] for r in tagged.collect()} == {2}
    w = {r["id"]: r["refs"] for r in updated_ways.collect()}
    assert w[10] == [1, 2, 3] and w[11] == [4, 2, 5]


# ---------------------------------------------------------------------------
# Patch-scoped stage-7 candidates (merge.ts:102-107): the final-merge
# intersection pass only considers pairs touching a PATCH way — a
# pre-existing base-base crossing must NOT gain a node.
# ---------------------------------------------------------------------------

def _crossing_fixture(spark):
    """Base: two crossing highways (no shared node) near Yakima. Patch:
    one highway 2 km north that crosses base way 100 vertically."""
    lon, lat = fixtures.YAKIMA_LON, fixtures.YAKIMA_LAT
    dlon, dlat = fixtures.ONE_KM_LON, fixtures.ONE_KM_LAT
    base_nodes = spark.createDataFrame(
        [
            (10, lon - dlon, lat, None), (11, lon + dlon, lat, None),
            (12, lon, lat - dlat, None), (13, lon, lat + dlat, None),
        ],
        fixtures.NODE_SCHEMA,
    )
    base_ways = spark.createDataFrame(
        [(100, [10, 11], {"highway": "primary"}),
         (101, [12, 13], {"highway": "secondary"})],
        fixtures.WAY_SCHEMA,
    )
    # patch way 200 crosses base way 100 at (lon + dlon/2, lat)
    patch_nodes = spark.createDataFrame(
        [(20, lon + dlon / 2, lat - dlat, None),
         (21, lon + dlon / 2, lat + dlat, None)],
        fixtures.NODE_SCHEMA,
    )
    patch_ways = spark.createDataFrame(
        [(200, [20, 21], {"highway": "residential"})], fixtures.WAY_SCHEMA
    )
    return base_nodes, base_ways, patch_nodes, patch_ways


def test_patch_scoped_intersections_skip_base_base_crossing(spark):
    from osmix_spark.operators import pipeline

    bn, bw, pn, pw = _crossing_fixture(spark)
    nodes, ways, stats = pipeline.merge_datasets(bn, bw, pn, pw)
    # exactly ONE intersection: patch way 200 x base way 100. The
    # pre-existing base 100 x 101 crossing is NOT intersected (the
    # reference's createIntersectionsForWays only iterates patch ways).
    assert stats["intersection_points_found"] == 1
    assert stats["intersection_nodes_created"] == 1
    new_id = 22  # max node id 21 + 1
    w = {r["id"]: r["refs"] for r in ways.collect()}
    assert new_id in w[100] and new_id in w[200]
    assert w[101] == [12, 13]  # base-base crossing untouched
    crossing = [r for r in nodes.collect() if (r["tags"] or {}).get("crossing") == "yes"]
    assert {r["id"] for r in crossing} == {new_id}


def test_unscoped_final_pass_still_finds_base_base_crossing(spark):
    """Control: patch_scope_final=False restores the whole-dataset sweep,
    proving the fixture's base-base crossing is real."""
    from osmix_spark.operators import pipeline

    bn, bw, pn, pw = _crossing_fixture(spark)
    nodes, ways, stats = pipeline.merge_datasets(
        bn, bw, pn, pw, patch_scope_final=False
    )
    assert stats["intersection_points_found"] == 2
    assert stats["intersection_nodes_created"] == 2


def test_candidate_scoped_dedupe_maps_match_unscoped_on_merge(spark):
    """Stage-6 equivalence: after per-dataset dedupe, every surviving
    coincident pair touches a patch entity, so the candidate-scoped maps
    equal the whole-dataset maps on the merge fixture."""
    from osmix_spark.sources import fixtures as fx

    nodes = merge.direct_merge(fx.base_nodes(spark), fx.patch_nodes(spark))
    ways = merge.direct_merge(fx.base_ways(spark), fx.patch_ways(spark))
    patch_ids = fx.patch_nodes(spark).select("id")
    scoped = merge.dedupe_nodes(nodes, candidates=patch_ids)
    unscoped = merge.dedupe_nodes(nodes)
    assert sorted(map(tuple, scoped.collect())) == sorted(map(tuple, unscoped.collect()))
    way_ids = fx.patch_ways(spark).select("id")
    w_scoped = merge.dedupe_ways(ways, nodes, candidates=way_ids)
    w_unscoped = merge.dedupe_ways(ways, nodes)
    assert sorted(map(tuple, w_scoped.collect())) == sorted(map(tuple, w_unscoped.collect()))
