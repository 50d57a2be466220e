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
