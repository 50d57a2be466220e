"""Extract strategies (J12) + relation resolution (J11)."""

from __future__ import annotations

from pyspark.sql import functions as F

from osmix_spark.operators import extract
from osmix_spark.sources import fixtures

BBOX = (-0.0005, -0.0005, 0.0025, 0.0015)  # covers nodes at x in [0, 0.002]


def _layer(spark):
    nodes = spark.createDataFrame(
        [
            (1, 0.0, 0.0, None),
            (2, 0.001, 0.001, None),
            (3, 0.002, 0.0, None),
            (4, 0.010, 0.0, None),   # outside
            (5, 0.011, 0.001, None),  # outside
        ],
        fixtures.NODE_SCHEMA,
    )
    ways = spark.createDataFrame(
        [
            (10, [1, 2, 3], {"highway": "a"}),   # fully inside
            (11, [3, 4], {"highway": "b"}),      # straddles
            (12, [4, 5], {"highway": "c"}),      # fully outside
        ],
        fixtures.WAY_SCHEMA,
    )
    return nodes, ways


def test_simple_extract(spark):
    nodes, ways = _layer(spark)
    n, w = extract.extract(nodes, ways, *BBOX, strategy="simple")
    assert {r["id"] for r in n.collect()} == {1, 2, 3}
    got = {r["id"]: r["refs"] for r in w.collect()}
    assert got == {10: [1, 2, 3], 11: [3]}  # way 11 cut to inside refs; 12 dropped


def test_complete_ways_extract(spark):
    nodes, ways = _layer(spark)
    n, w = extract.extract(nodes, ways, *BBOX, strategy="complete_ways")
    # way 11 pulled whole -> node 4 added back
    assert {r["id"] for r in n.collect()} == {1, 2, 3, 4}
    got = {r["id"]: r["refs"] for r in w.collect()}
    assert got == {10: [1, 2, 3], 11: [3, 4]}


def test_smart_extract_multipolygon(spark):
    nodes, ways = _layer(spark)
    relations = spark.createDataFrame(
        [(100, {"type": "multipolygon"})], "id long, tags map<string,string>"
    )
    members = spark.createDataFrame(
        [(100, "way", 11, "outer"), (100, "way", 12, "inner")],
        "relation_id long, member_type string, member_ref long, role string",
    )
    n, w, r = extract.extract(
        nodes, ways, *BBOX, strategy="smart",
        relations=relations, relation_members=members,
    )
    # way 12 pulled in via the multipolygon; its nodes 4,5 added
    assert {x["id"] for x in w.collect()} == {10, 11, 12}
    assert {x["id"] for x in n.collect()} == {1, 2, 3, 4, 5}
    assert {x["id"] for x in r.collect()} == {100}


def test_resolve_relation_members_bounded(spark):
    members = spark.createDataFrame(
        [
            (1, "relation", 2, ""),
            (1, "node", 100, ""),
            (2, "relation", 3, ""),
            (2, "way", 200, ""),
            (3, "node", 300, ""),
            # cycle: 3 -> 1 must not loop forever
            (3, "relation", 1, ""),
        ],
        "relation_id long, member_type string, member_ref long, role string",
    )
    out = extract.resolve_relation_members(members)
    got = {(r["relation_id"], r["member_type"], r["member_ref"]) for r in out.collect()}
    assert (1, "node", 100) in got
    assert (1, "way", 200) in got     # via relation 2
    assert (1, "node", 300) in got    # via 2 -> 3
    assert (2, "node", 300) in got
    # cycle resolved without hanging; relation-typed rows never emitted
    assert all(t != "relation" for _, t, _ in got)


def _members_of(members_df, rid):
    return {
        (r["member_type"], r["member_ref"])
        for r in members_df.filter(F.col("relation_id") == rid).collect()
    }


def test_smart_nested_relation_members(spark):
    """Port of extract.test.ts 'smart strategy resolves multipolygon nested
    relation members': bbox [-0.1,-0.1,1,1]; relation 200 (multipolygon:
    way 10 + outside label node 3), relation 300 (site: relation 200 +
    outside label node 4). Smart extends 200 (keeps node 3) but never 300
    (site is not multipolygon, node 4 stays out); the 'relation' member
    survives in EVERY strategy because its child relation survives."""
    nodes = spark.createDataFrame(
        [(1, 0.0, 0.0, None), (2, 2.0, 0.0, None),
         (3, 2.2, 0.2, None), (4, 2.3, 0.3, None)],
        fixtures.NODE_SCHEMA,
    )
    ways = spark.createDataFrame([(10, [1, 2], None)], fixtures.WAY_SCHEMA)
    relations = spark.createDataFrame(
        [(200, {"type": "multipolygon"}), (300, {"type": "site"})],
        "id long, tags map<string,string>",
    )
    members = spark.createDataFrame(
        [(200, "way", 10, "outer"), (200, "node", 3, "label"),
         (300, "relation", 200, "part"), (300, "node", 4, "label")],
        "relation_id long, member_type string, member_ref long, role string",
    )
    bbox = (-0.1, -0.1, 1.0, 1.0)
    out = {}
    for strat in ("simple", "complete_ways", "smart"):
        n, w, r, m = extract.extract(
            nodes, ways, *bbox, strategy=strat,
            relations=relations, relation_members=members, return_members=True,
        )
        out[strat] = (
            {x["id"] for x in n.collect()},
            {x["id"] for x in r.collect()},
            m,
        )
    for strat in ("simple", "complete_ways", "smart"):
        n_ids, r_ids, m = out[strat]
        # both relations survive in every strategy; the nested 'relation'
        # member of 300 is kept everywhere
        assert r_ids == {200, 300}, strat
        assert ("relation", 200) in _members_of(m, 300), strat
        # node 4 (site label) is never retained
        assert 4 not in n_ids and ("node", 4) not in _members_of(m, 300), strat
    # only smart keeps node 3 (multipolygon reference-completion)
    assert 3 in out["smart"][0]
    assert ("node", 3) in _members_of(out["smart"][2], 200)
    assert 3 not in out["simple"][0] and 3 not in out["complete_ways"][0]
    assert ("node", 3) not in _members_of(out["simple"][2], 200)
    assert ("node", 3) not in _members_of(out["complete_ways"][2], 200)


def test_smart_does_not_extend_non_multipolygon(spark):
    """Port of extract.test.ts 'smart strategy does not extend
    non-multipolygon relations': a route relation's outside stop node is
    not pulled in by any strategy, but the relation itself survives."""
    nodes = spark.createDataFrame(
        [(1, 0.0, 0.0, None), (2, 2.0, 0.0, None)], fixtures.NODE_SCHEMA
    )
    ways = spark.createDataFrame([], fixtures.WAY_SCHEMA)
    relations = spark.createDataFrame(
        [(400, {"type": "route"})], "id long, tags map<string,string>"
    )
    members = spark.createDataFrame(
        [(400, "node", 1, "stop"), (400, "node", 2, "stop")],
        "relation_id long, member_type string, member_ref long, role string",
    )
    for strat in ("simple", "complete_ways", "smart"):
        n, w, r, m = extract.extract(
            nodes, ways, *(-0.1, -0.1, 1.0, 1.0), strategy=strat,
            relations=relations, relation_members=members, return_members=True,
        )
        assert {x["id"] for x in n.collect()} == {1}, strat
        assert {x["id"] for x in r.collect()} == {400}, strat
        assert _members_of(m, 400) == {("node", 1)}, strat


def test_duplicate_relation_members_preserved(spark):
    """Round-4 ADVICE: OSM allows the same (type, ref, role) member twice
    in one relation and the reference's members.filter preserves the
    duplicates — return_members must not collapse them."""
    nodes = spark.createDataFrame(
        [(1, 0.0, 0.0, None), (2, 0.5, 0.5, None)], fixtures.NODE_SCHEMA
    )
    ways = spark.createDataFrame([(10, [1, 2], None)], fixtures.WAY_SCHEMA)
    relations = spark.createDataFrame(
        [(200, {"type": "route"})], "id long, tags map<string,string>"
    )
    # way 10 appears TWICE with identical role (legal: e.g. an out-and-back
    # route leg), plus a repeated node member
    members = spark.createDataFrame(
        [(200, "way", 10, "forward"), (200, "way", 10, "forward"),
         (200, "node", 1, "stop"), (200, "node", 1, "stop")],
        "relation_id long, member_type string, member_ref long, role string",
    )
    bbox = (-0.1, -0.1, 1.0, 1.0)
    for strat in ("simple", "complete_ways", "smart"):
        _n, _w, _r, m = extract.extract(
            nodes, ways, *bbox, strategy=strat,
            relations=relations, relation_members=members, return_members=True,
        )
        rows = [(r["member_type"], r["member_ref"], r["role"]) for r in m.collect()]
        assert sorted(rows) == [
            ("node", 1, "stop"), ("node", 1, "stop"),
            ("way", 10, "forward"), ("way", 10, "forward"),
        ], strat
