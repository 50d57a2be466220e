"""Routing operators (reference packages/router): edge build from ways +
frontier-based SSSP (fixpoint == Dijkstra) + path reconstruction."""

from __future__ import annotations

import heapq

from pyspark.sql import functions as F

from osmix_spark.operators import router
from osmix_spark.sources import fixtures


def _reference_dijkstra(edges: list[tuple[int, int, float]], source: int) -> dict[int, float]:
    adj: dict[int, list[tuple[int, float]]] = {}
    for s, d, w in edges:
        adj.setdefault(s, []).append((d, w))
    dist = {source: 0.0}
    pq = [(0.0, source)]
    while pq:
        du, u = heapq.heappop(pq)
        if du > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, []):
            nd = du + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def test_shortest_path_matches_dijkstra(spark):
    # weighted graph with an equal-cost tie and an unreachable node
    e = [
        (0, 1, 1.0), (1, 2, 1.0), (0, 2, 2.0),   # tie: 0->1->2 == 0->2
        (2, 3, 0.5), (0, 3, 5.0),
        (4, 5, 1.0),                              # disconnected component
    ]
    edges = spark.createDataFrame(e, "src long, dst long, w double")
    out = {r["node"]: r["dist"] for r in router.shortest_path(edges, 0).collect()}
    assert out == _reference_dijkstra(e, 0)
    assert 4 not in out and 5 not in out


def test_shortest_path_via_deterministic(spark):
    # two equal-cost shortest paths into node 3: via 1 and via 2 -> the
    # struct-min tiebreak must pick the smaller predecessor id
    e = [(0, 1, 1.0), (0, 2, 1.0), (1, 3, 1.0), (2, 3, 1.0)]
    edges = spark.createDataFrame(e, "src long, dst long, w double")
    dist = router.shortest_path(edges, 0)
    via3 = dist.filter(F.col("node") == 3).collect()[0]["via"]
    assert via3 == 1
    assert router.reconstruct_path(dist, 3) == [0, 1, 3]


def test_build_edges_haversine_and_oneway(spark):
    nodes = spark.createDataFrame(
        [(1, 0.0, 0.0, None), (2, 0.001, 0.0, None), (3, 0.002, 0.0, None)],
        fixtures.NODE_SCHEMA,
    )
    ways = spark.createDataFrame(
        [(10, [1, 2], {"highway": "residential"}),
         (11, [2, 3], {"oneway": "yes"})],
        fixtures.WAY_SCHEMA,
    )
    edges = router.build_edges(ways, nodes).collect()
    by_pair = {(r["src"], r["dst"]): r["w"] for r in edges}
    # bidirectional way contributes both directions; oneway only forward
    assert (1, 2) in by_pair and (2, 1) in by_pair
    assert (2, 3) in by_pair and (3, 2) not in by_pair
    # 0.001 deg of longitude at the equator ~= 111.3 m
    assert abs(by_pair[(1, 2)] - 111.3) < 1.0


def test_reconstruct_path_exact_max_hops(spark):
    """A path of exactly max_hops hops must fully resolve (regression:
    2^k - 1 subset-sum shortfall when max_hops is a power of two)."""
    from osmix_spark.operators import router

    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0)], "src long, dst long, w double"
    )
    dist = router.shortest_path(edges, source=0)
    assert router.reconstruct_path(dist, target=2, max_hops=2) == [0, 1, 2]


def test_route_p2p_small(spark):
    from osmix_spark.operators import router

    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 2.0), (0, 2, 5.0)], "src long, dst long, w double"
    )
    rows = sorted(router.route(edges, 0, 2).collect(), key=lambda r: -r["pos"])
    assert [r["node"] for r in rows] == [0, 1, 2]
    assert rows[-1]["dist"] == 3.0
