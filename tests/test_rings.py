"""Multipolygon ring assembly (relation-multipolygon.ts semantics)."""

from __future__ import annotations

from osmix_spark.operators import rings
from osmix_spark.sources import fixtures


def test_connect_ways_to_rings_pure():
    # square split into two ways, second reversed
    w1 = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0)]
    w2 = [(0.0, 0.0), (0.0, 1.0), (1.0, 1.0)]  # needs reversal to chain
    out = rings.connect_ways_to_rings([w1, w2])
    assert len(out) == 1
    ring = out[0]
    assert ring[0] == ring[-1]
    assert len(ring) == 5
    # an unclosable fragment is dropped
    out = rings.connect_ways_to_rings([w1])
    assert out == []


def test_winding():
    ccw = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 0.0)]
    assert rings.ring_area_signed(ccw) > 0
    assert rings.ensure_winding(ccw, clockwise=False) == ccw
    assert rings.ensure_winding(ccw, clockwise=True) == list(reversed(ccw))


def test_assemble_relation_rings(spark):
    nodes = spark.createDataFrame(
        [
            (1, 0.0, 0.0, None), (2, 1.0, 0.0, None), (3, 1.0, 1.0, None),
            (4, 0.0, 1.0, None),
            # inner square
            (5, 0.25, 0.25, None), (6, 0.75, 0.25, None),
            (7, 0.75, 0.75, None), (8, 0.25, 0.75, None),
        ],
        fixtures.NODE_SCHEMA,
    )
    ways = spark.createDataFrame(
        [
            (10, [1, 2, 3], None),       # outer half
            (11, [3, 4, 1], None),       # outer half (closes)
            (12, [5, 6, 7, 8, 5], None),  # inner ring, already closed, CCW
        ],
        fixtures.WAY_SCHEMA,
    )
    members = spark.createDataFrame(
        [(100, 10, "outer"), (100, 11, "outer"), (100, 12, "inner")],
        "relation_id long, member_ref long, role string",
    )
    out = rings.assemble_relation_rings(members, ways, nodes).collect()
    by_role = {}
    for r in out:
        by_role.setdefault(r["role"], []).append(r)
    assert len(by_role["outer"]) == 1 and len(by_role["inner"]) == 1
    outer = list(zip(by_role["outer"][0]["lons"], by_role["outer"][0]["lats"]))
    inner = list(zip(by_role["inner"][0]["lons"], by_role["inner"][0]["lats"]))
    assert outer[0] == outer[-1] and len(outer) == 5
    assert rings.ring_area_signed(outer) > 0   # outer CCW
    assert rings.ring_area_signed(inner) < 0   # inner CW
