"""Routing graph + shortest path (reference packages/router — CSR graph
build at packages/router/src/graph.ts:48-80,364; Dijkstra at
algorithms/shortest-path.ts:115; marked WIP there, README.md:113).

Spark-first shape: the CSR adjacency becomes an `edges(src, dst, w)`
DataFrame; Dijkstra's priority queue has no distributed counterpart, so
single-source shortest path is computed as frontier-based label-correcting
relaxation (the Pregel/Bellman-Ford pattern): each round joins the frontier
against the edge list, keeps per-node min(dist, via) with a deterministic
struct-min tiebreak, and re-checkpoints (`localCheckpoint`) to cut lineage.
The fixpoint equals Dijkstra's output exactly (same shortest-path metric);
rounds are bounded by the hop count of the longest shortest path.

Scale notes: per round there is ONE shuffle (groupBy node); the edge list
can be broadcast when it is the small side (road networks are ~edges≈2.3x
nodes, so at continental scale keep it partitioned and co-partition dist
and edges on the join key instead — pass broadcast_edges=False).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import geo


def build_edges(ways: DataFrame, nodes: DataFrame,
                bidirectional: bool = True) -> DataFrame:
    """ways(id, refs array<long>, tags) -> edges(src, dst, w) with haversine
    meter weights (graph.ts:48-80 builds the same adjacency from way refs;
    oneway tagging flips `bidirectional` per way when tags['oneway']='yes').
    """
    pairs = (
        ways.select(
            F.col("id").alias("way_id"),
            F.coalesce(F.try_element_at("tags", F.lit("oneway")), F.lit("no")).alias("oneway")
            if "tags" in ways.columns else F.lit("no").alias("oneway"),
            F.posexplode("refs").alias("seq", "src"),
            F.col("refs").alias("__refs"),
        )
        .withColumn("dst", F.try_element_at("__refs", F.col("seq") + 2))
        .filter(F.col("dst").isNotNull())
        .drop("__refs")
    )
    n = nodes.select(F.col("id").alias("nid"), "lon", "lat")
    geom = (
        pairs.join(n.withColumnRenamed("nid", "src").withColumnsRenamed(
            {"lon": "lon1", "lat": "lat1"}), "src")
        .join(n.withColumnRenamed("nid", "dst").withColumnsRenamed(
            {"lon": "lon2", "lat": "lat2"}), "dst")
        .select(
            "src", "dst", "oneway",
            geo.haversine_m(
                F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2")
            ).alias("w"),
        )
    )
    fwd = geom.select("src", "dst", "w")
    if not bidirectional:
        return fwd
    rev = geom.filter(F.col("oneway") != "yes").select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
    )
    return fwd.unionByName(rev)


def shortest_path(edges: DataFrame, source: int, max_rounds: int = 200,
                  broadcast_edges: bool = True) -> DataFrame:
    """Single-source shortest path to every reachable node. Returns
    (node, dist, via) where via is the predecessor on a shortest path
    (deterministic: min (dist, via) struct — equal-cost ties pick the
    smallest predecessor id, mirroring the reference's stable pop order).

    Label-correcting fixpoint == Dijkstra's result (shortest-path.ts:115);
    each round relaxes only the frontier (nodes improved last round), so
    total work is O(sum of frontier degrees), not O(V*E).
    """
    spark = edges.sparkSession
    # materialize the edge list ONCE — every round's job would otherwise
    # recompute (and re-read) the whole upstream edge plan
    e = edges.select("src", "dst", "w").localCheckpoint()
    if broadcast_edges:
        e = F.broadcast(e)
    dist = spark.createDataFrame(
        [(source, 0.0, source)], "node long, dist double, via long"
    ).localCheckpoint()
    frontier = dist
    for _ in range(max_rounds):
        cand = frontier.join(e, frontier["node"] == e["src"]).select(
            e["dst"].alias("node"),
            (frontier["dist"] + e["w"]).alias("dist"),
            e["src"].alias("via"),
        )
        best = cand.groupBy("node").agg(F.min(F.struct("dist", "via")).alias("b"))
        improved = (
            best.join(dist.select("node", F.col("dist").alias("old")), "node", "left")
            .filter(F.col("old").isNull() | (F.col("b.dist") < F.col("old")))
            .select("node", F.col("b.dist").alias("dist"), F.col("b.via").alias("via"))
            .localCheckpoint()
        )
        if improved.isEmpty():
            break
        # merge = per-node min over (old, improved): one shuffle, no join
        dist = (
            dist.unionByName(improved)
            .groupBy("node")
            .agg(F.min(F.struct("dist", "via")).alias("b"))
            .select("node", F.col("b.dist").alias("dist"), F.col("b.via").alias("via"))
            .localCheckpoint()
        )
        frontier = improved
    return dist


def reconstruct_path_df(dist: DataFrame, target: int,
                        max_hops: int = 10_000) -> DataFrame:
    """Distributed predecessor-chain extraction by pointer doubling
    (parallel list ranking): never collects the distance table.

    Build jump tables J_k(node) = (ancestor after 2^k via-hops, exact steps
    advanced) by K = ceil(log2(max_hops)) self-joins, then expand the
    target's chain top-down — each expansion round doubles the number of
    resolved path positions and joins the (path-sized, broadcast) frontier
    against one jump table. Returns DataFrame(pos, node) where pos counts
    hops from the TARGET (pos 0 = target, max pos = source).

    Scale: K full-table shuffles to build jumps + K broadcast probes to
    expand; driver memory O(1). The reference materializes the path as an
    in-memory array (shortest-path.ts) — fine single-node, not at 1e9
    nodes.
    """
    import math

    spark = dist.sparkSession
    source_like = F.col("via") == F.col("node")
    j = dist.select(
        "node", F.col("via").alias("anc"),
        F.when(source_like, F.lit(0)).otherwise(F.lit(1)).cast("long").alias("steps"),
    ).localCheckpoint()
    jumps = [j]
    # subset sums of {2^0..2^(k-1)}-step tables reach 2^k - 1 hops, so a
    # path of exactly max_hops needs ceil(log2(max_hops + 1)) tables
    k = max(1, math.ceil(math.log2(max(2, max_hops + 1))))
    for _ in range(k - 1):
        if j.filter(F.col("steps") > 0).join(
            j.select(F.col("node").alias("anc"), F.col("steps").alias("s2")).filter(F.col("s2") > 0),
            "anc", "left_semi",
        ).isEmpty():
            break  # every chain already resolves to the source
        a = j.alias("a")
        b = j.select(
            F.col("node").alias("anc"), F.col("anc").alias("anc2"),
            F.col("steps").alias("steps2"),
        ).alias("b")
        j = (
            a.join(b, "anc")
            .select(
                F.col("a.node").alias("node"), F.col("anc2").alias("anc"),
                (F.col("a.steps") + F.col("steps2")).alias("steps"),
            )
            .localCheckpoint()
        )
        jumps.append(j)

    rows = spark.createDataFrame([(0, target)], "pos long, node long")
    for jk in reversed(jumps):
        ext = (
            F.broadcast(rows).join(jk, "node")
            .select((F.col("pos") + F.col("steps")).alias("pos"), F.col("anc").alias("node"))
        )
        rows = rows.unionByName(ext).distinct().localCheckpoint()
    return rows


def reconstruct_path(dist: DataFrame, target: int, max_hops: int = 10_000) -> list[int]:
    """Path node ids source..target — the list convenience over
    reconstruct_path_df. Collects O(path) rows, never the distance table."""
    if dist.filter(F.col("node") == target).isEmpty():
        return []
    rows = reconstruct_path_df(dist, target, max_hops).collect()
    ordered = [r["node"] for r in sorted(rows, key=lambda r: -r["pos"])]
    return ordered


def route(edges: DataFrame, source: int, target: int,
          max_rounds: int = 200, max_hops: int = 10_000,
          broadcast_edges: bool = True) -> DataFrame:
    """Point-to-point route (the reference router's user-facing API,
    packages/router/src/router.ts): SSSP from `source`, then the exact
    predecessor chain to `target` via distributed pointer doubling.
    Returns DataFrame(pos, node, dist) where pos counts hops from the
    TARGET (pos 0 = target, max pos = source); empty if unreachable."""
    dist = shortest_path(edges, source, max_rounds, broadcast_edges)
    if dist.filter(F.col("node") == target).isEmpty():
        return dist.sparkSession.createDataFrame([], "pos long, node long, dist double")
    path = reconstruct_path_df(dist, target, max_hops)
    return path.join(dist.select("node", "dist"), "node").select("pos", "node", "dist")
