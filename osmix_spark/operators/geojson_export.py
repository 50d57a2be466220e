"""GeoJSON export: OSM entities -> GeoJSON Features (the direction the
round-1 repo lacked; sources/geojson.py is the reader).

Reference: packages/geojson/src/entity-to-feature.ts —
- nodeToFeature (Point, properties {id, type, ...tags})
- wayToFeature (LineString, or Polygon when wayIsArea)
- relationToFeature: area -> (Multi)Polygon via ring assembly; line ->
  (Multi)LineString via way chaining grouped by role
  (types/src/relation-kind.ts:160-215); point -> (Multi)Point from node
  members; logic/super -> empty GeometryCollection.

Spark shape: nodes and ways are pure Catalyst expressions (coordinate
resolution = the J1 join; JSON assembly = concat/format_string — no Python
in the two big paths). Relations group per relation via applyInPandas on
top of rings.assemble_relation_rings (groups bounded by the <= 65,535
member cap).

Divergences (documented):
- coordinates are serialized at a fixed decimal precision (default 6,
  ~0.11 m — the common GeoJSON export convention) instead of raw
  shortest-repr doubles, so exported bytes are engine-independent;
- ways with unresolvable refs are DROPPED (flagged in n_missing) rather
  than throwing per-way like wayToFeature;
- multipolygon hole attribution assigns each inner ring to the first outer
  ring containing its first vertex (the reference delegates to
  buildRelationRings' grouping).

Scale: output is one JSON string per feature — write with
`write_geojson_seq` (newline-delimited GeoJSON, RFC 8142 GeoJSONSeq),
which is partition-parallel; a FeatureCollection file is a driver-side
convenience for small extracts only.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import geo


def _fmt(c: Column, precision: int) -> Column:
    return F.format_string(f"%.{precision}f", c)


def _props_json(id_col: Column, etype: str, tags: Column) -> Column:
    """{"id":<id>,"type":<t>,...sorted tags} — JS-spread semantics
    ({id, type, ...tags}, entity-to-feature.ts:54-58): a `type` tag
    OVERRIDES the entity-type value, and `id`/`type` tag entries don't
    repeat in the body. Tag entries serialize via to_json (JVM-side
    escaping), keys sorted for determinism."""
    # escape the type-tag value like the id-tag override below (the
    # reference JSON.stringify's it): a quote/backslash in a `type` tag must
    # not produce invalid JSON
    type_tag = F.element_at(tags, F.lit("type"))
    type_tag_json = F.to_json(F.array(type_tag))
    type_val = F.when(
        type_tag.isNotNull(),
        # strip the surrounding [" and "] — caller wraps in quotes
        type_tag_json.substr(F.lit(3), F.length(type_tag_json) - 4),
    ).otherwise(F.lit(etype))
    filtered = F.map_filter(tags, lambda k, _v: (k != "id") & (k != "type"))
    sorted_tags = F.map_from_entries(F.array_sort(F.map_entries(filtered)))
    tj = F.to_json(sorted_tags)
    rest = F.when(
        filtered.isNotNull() & (F.size(filtered) > 0),
        F.concat(F.lit(","), tj.substr(F.lit(2), F.length(tj) - 2)),
    ).otherwise(F.lit(""))
    # an `id` TAG overrides the numeric id value too (JS spread); escape it
    # via to_json on a singleton array and strip the brackets
    id_tag = F.element_at(tags, F.lit("id"))
    id_tag_json = F.to_json(F.array(id_tag))
    id_val = F.when(
        id_tag.isNotNull(), id_tag_json.substr(F.lit(2), F.length(id_tag_json) - 2)
    ).otherwise(id_col.cast("string"))
    return F.concat(
        F.lit('{"id":'), id_val,
        F.lit(',"type":"'), type_val, F.lit('"'), rest, F.lit("}"),
    )


def _feature_json(id_col: Column, geometry: Column, props: Column) -> Column:
    return F.concat(
        F.lit('{"type":"Feature","id":'), id_col.cast("string"),
        F.lit(',"geometry":'), geometry,
        F.lit(',"properties":'), props, F.lit("}"),
    )


def way_coord_arrays(ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """(way_id, nrefs, lons, lats) — refs resolved against the node layer
    in ref order; unresolvable refs are dropped (len(lons) < nrefs flags a
    partially-resolved way). ONE shared frame for the way/ring/line paths:
    passing the same DataFrame object to all three makes their subplans
    identical, so Spark's ReuseExchange runs the resolve shuffle once per
    query instead of three times."""
    refs = ways.select(F.col("id").alias("way_id"), F.size("refs").alias("nrefs"),
                       F.posexplode("refs").alias("seq", "ref"))
    return (
        refs.join(nodes.select(F.col("id").alias("ref"), "lon", "lat"), "ref")
        .groupBy("way_id", "nrefs")
        .agg(F.array_sort(F.collect_list(F.struct("seq", "lon", "lat"))).alias("s"))
        .select("way_id", "nrefs", F.col("s.lon").alias("lons"), F.col("s.lat").alias("lats"))
    )


def nodes_to_features(nodes: DataFrame, precision: int = 6) -> DataFrame:
    """nodeToFeature (entity-to-feature.ts:45-60): (id, lon, lat, tags) ->
    (id, entity_type, feature json). Pure Catalyst."""
    geometry = F.concat(
        F.lit('{"type":"Point","coordinates":['),
        _fmt(F.col("lon"), precision), F.lit(","), _fmt(F.col("lat"), precision),
        F.lit("]}"),
    )
    return nodes.select(
        F.col("id"),
        F.lit("node").alias("entity_type"),
        _feature_json(F.col("id"), geometry, _props_json(F.col("id"), "node", F.col("tags"))).alias("feature"),
    )


def ways_to_features(ways: DataFrame, nodes: DataFrame, precision: int = 6,
                     coords: DataFrame | None = None) -> DataFrame:
    """wayToFeature (entity-to-feature.ts:77-107): LineString, or Polygon
    when wayIsArea. Coordinate resolution is the J1 join; ways whose refs
    don't fully resolve are dropped. coords: optional pre-built
    way_coord_arrays frame (share it across paths for exchange reuse)."""
    if coords is None:
        coords = way_coord_arrays(ways, nodes)
    resolved = coords.filter(F.size("lons") == F.col("nrefs")).select(
        F.col("way_id").alias("id"), "lons", "lats"
    )
    w = ways.join(resolved, "id")
    coords_json = F.concat(
        F.lit("["),
        F.array_join(
            F.zip_with(
                F.col("lons"), F.col("lats"),
                lambda x, y: F.concat(F.lit("["), _fmt(x, precision), F.lit(","),
                                      _fmt(y, precision), F.lit("]")),
            ),
            ",",
        ),
        F.lit("]"),
    )
    is_closed = (F.size("refs") >= 4) & (
        F.element_at("refs", 1) == F.element_at("refs", -1)
    )
    geometry = F.when(
        geo.way_is_area(F.col("tags"), is_closed),
        F.concat(F.lit('{"type":"Polygon","coordinates":['), coords_json, F.lit("]}")),
    ).otherwise(
        F.concat(F.lit('{"type":"LineString","coordinates":'), coords_json, F.lit("}"))
    )
    return w.select(
        "id",
        F.lit("way").alias("entity_type"),
        _feature_json(F.col("id"), geometry, _props_json(F.col("id"), "way", F.col("tags"))).alias("feature"),
    )


def _chain_open(ways_c: list[list[tuple[float, float]]]) -> list[list]:
    """connectWaysToLineStrings (relation-kind.ts:188-215): greedy end-to-
    end chaining, keeping OPEN chains (unlike ring assembly)."""
    pending = [list(w) for w in ways_c if len(w) >= 2]
    chains: list[list] = []
    while pending:
        chain = pending.pop(0)
        progress = True
        while progress:
            progress = False
            for i, cand in enumerate(pending):
                if cand[0] == chain[-1]:
                    chain = chain + cand[1:]
                elif cand[-1] == chain[-1]:
                    chain = chain + list(reversed(cand))[1:]
                elif cand[-1] == chain[0]:
                    chain = cand + chain[1:]
                elif cand[0] == chain[0]:
                    chain = list(reversed(cand)) + chain[1:]
                else:
                    continue
                pending.pop(i)
                progress = True
                break
        chains.append(chain)
    return chains


def _pip(px: float, py: float, ring: list[tuple[float, float]]) -> bool:
    inside = False
    j = len(ring) - 2
    for i in range(len(ring) - 1):
        xi, yi = ring[i]
        xj, yj = ring[j]
        if (yi > py) != (yj > py) and px < (xj - xi) * (py - yi) / (yj - yi + 1e-300) + xi:
            inside = not inside
        j = i
    return inside


_REL_GEOM_SCHEMA = T.StructType(
    [
        T.StructField("relation_id", T.LongType(), False),
        T.StructField("geometry", T.StringType(), False),
    ]
)


def _build_area_geom(pdf: pd.DataFrame, precision: int) -> str:
    """Ring assembly (identical to rings.assemble_relation_rings —
    chaining, winding, canonical (role, first-coord) order) fused with the
    JSON build. Polygon for a single outer, else MultiPolygon; each inner
    attached to the first containing outer."""
    from .rings import canonical_ring, connect_ways_to_rings, ensure_winding

    def ring_json(ring):
        pts = ",".join(f"[{x:.{precision}f},{y:.{precision}f}]" for x, y in ring)
        return f"[{pts}]"

    assembled: list[tuple[str, list]] = []
    for role in ("outer", "inner"):
        group = pdf[pdf["role"] == role].sort_values("way_id")
        ways_c = [list(zip(r.lons, r.lats)) for r in group.itertuples(index=False)]
        for ring in connect_ways_to_rings(ways_c):
            ring = canonical_ring(ensure_winding(ring, clockwise=(role == "inner")))
            assembled.append((role, ring))
    assembled.sort(key=lambda r: (r[0], r[1][0][0], r[1][0][1]))
    outers = [ring for role, ring in assembled if role != "inner"]
    inners = [ring for role, ring in assembled if role == "inner"]
    if not outers:
        return '{"type":"MultiPolygon","coordinates":[]}'
    polys: list[list[str]] = [[ring_json(o)] for o in outers]
    for ring in inners:
        target = 0
        for i, outer in enumerate(outers):
            if _pip(ring[0][0], ring[0][1], outer):
                target = i
                break
        polys[target].append(ring_json(ring))
    if len(polys) == 1:
        return '{"type":"Polygon","coordinates":[' + ",".join(polys[0]) + "]}"
    body = ",".join("[" + ",".join(p) + "]" for p in polys)
    return '{"type":"MultiPolygon","coordinates":[' + body + "]}"


def _build_line_geom(pdf: pd.DataFrame, precision: int) -> str:
    """Member ways chained per role group (buildRelationLineStrings,
    relation-kind.ts:160-215)."""
    roles = sorted(pdf["role"].unique())
    groups = [pdf] if len(roles) <= 1 else [pdf[pdf["role"] == r] for r in roles]
    lines: list[list] = []
    for grp in groups:
        # MEMBER order, not way-id order: greedy chaining is
        # order-sensitive and the reference consumes relation.members
        # in sequence (relation-kind.ts:160-215)
        ways_c = [
            list(zip(r.lons, r.lats))
            for r in grp.sort_values("seq").itertuples(index=False)
        ]
        lines.extend(_chain_open(ways_c))

    def line_json(line):
        return "[" + ",".join(
            f"[{x:.{precision}f},{y:.{precision}f}]" for x, y in line
        ) + "]"

    if not lines:
        return '{"type":"MultiLineString","coordinates":[]}'
    if len(lines) == 1:
        return '{"type":"LineString","coordinates":' + line_json(lines[0]) + "}"
    return ('{"type":"MultiLineString","coordinates":['
            + ",".join(line_json(li) for li in lines) + "]}")


def _relation_geometry_json(area_members: DataFrame, line_members: DataFrame,
                            coords: DataFrame, precision: int = 6) -> DataFrame:
    """Area AND line relation geometries in ONE applyInPandas pass: both
    group by relation_id (a relation has exactly one kind), so running
    them as separate stages costs an extra shuffle + Python stage for
    nothing. Assembly semantics per kind are byte-identical to the split
    paths (see _build_area_geom/_build_line_geom)."""
    from .tiles import _spread

    am = area_members.select(
        "relation_id", F.col("member_ref").alias("way_id"),
        F.coalesce("role", F.lit("outer")).alias("role"),
        F.lit(0).alias("seq"), F.lit("area").alias("kind"),
    )
    lm = line_members.filter(F.col("member_type") == "way").select(
        "relation_id", F.col("member_ref").alias("way_id"),
        F.lower(F.coalesce("role", F.lit(""))).alias("role"),
        "seq", F.lit("line").alias("kind"),
    )
    m = am.unionByName(lm).join(coords.select("way_id", "lons", "lats"), "way_id")

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        rid = int(key[0])
        if pdf["kind"].iloc[0] == "area":
            geom = _build_area_geom(pdf, precision)
        else:
            geom = _build_line_geom(pdf, precision)
        return pd.DataFrame([{"relation_id": rid, "geometry": geom}])

    return _spread(m, "relation_id").groupBy("relation_id").applyInPandas(
        build, schema=_REL_GEOM_SCHEMA
    )


def relations_to_features(relations: DataFrame, members: DataFrame,
                          ways: DataFrame, nodes: DataFrame,
                          precision: int = 6,
                          coords: DataFrame | None = None) -> DataFrame:
    """relationToFeature (entity-to-feature.ts:130-330) by relation kind.

    relations: (id, tags); members: (relation_id, member_type, member_ref,
    role, seq) — seq preserves the reference's member order for point
    relations. coords: optional shared way_coord_arrays frame."""
    if coords is None:
        coords = way_coord_arrays(ways, nodes)
    has_rel = members.filter(F.col("member_type") == "relation").select(
        F.col("relation_id").alias("id"), F.lit(True).alias("__hrm")
    ).distinct()
    rel = relations.join(has_rel, "id", "left").withColumn(
        "kind", geo.relation_kind(F.col("tags"), F.coalesce("__hrm", F.lit(False)))
    )

    area_ids = rel.filter(F.col("kind") == "area").select("id")
    line_ids = rel.filter(F.col("kind") == "line").select("id")
    point_ids = rel.filter(F.col("kind") == "point").select("id")

    area_members = members.join(
        area_ids.withColumnRenamed("id", "relation_id"), "relation_id", "left_semi"
    ).filter(F.col("member_type") == "way")
    line_members = members.join(
        line_ids.withColumnRenamed("id", "relation_id"), "relation_id", "left_semi"
    )
    al_geom = _relation_geometry_json(area_members, line_members, coords, precision)

    # point relations: node members in member order (collectRelationPoints)
    pm = (
        members.join(point_ids.withColumnRenamed("id", "relation_id"),
                     "relation_id", "left_semi")
        .filter(F.col("member_type") == "node")
        .join(nodes.select(F.col("id").alias("member_ref"), "lon", "lat"), "member_ref")
        .groupBy("relation_id")
        .agg(F.array_sort(F.collect_list(F.struct("seq", "lon", "lat"))).alias("s"))
    )
    pt_list = F.transform(
        F.col("s"),
        lambda x: F.concat(F.lit("["), _fmt(x.lon, precision), F.lit(","),
                           _fmt(x.lat, precision), F.lit("]")),
    )
    point_geom = pm.select(
        "relation_id",
        F.when(
            F.size("s") == 1,
            F.concat(F.lit('{"type":"Point","coordinates":'),
                     F.element_at(pt_list, 1), F.lit("}")),
        ).otherwise(
            F.concat(F.lit('{"type":"MultiPoint","coordinates":['),
                     F.array_join(pt_list, ","), F.lit("]}"))
        ).alias("geometry"),
    )

    geom = al_geom.unionByName(point_geom)
    out = rel.join(geom.withColumnRenamed("relation_id", "id"), "id", "left")
    geometry = F.coalesce(
        F.col("geometry"),
        # logic/super relations and empty geometries (entity-to-feature.ts:297-306)
        F.when(F.col("kind") == "area", '{"type":"MultiPolygon","coordinates":[]}')
        .when(F.col("kind") == "line", '{"type":"MultiLineString","coordinates":[]}')
        .when(F.col("kind") == "point", '{"type":"MultiPoint","coordinates":[]}')
        .otherwise('{"type":"GeometryCollection","geometries":[]}'),
    )
    return out.select(
        "id",
        F.lit("relation").alias("entity_type"),
        _feature_json(F.col("id"), geometry,
                      _props_json(F.col("id"), "relation", F.col("tags"))).alias("feature"),
    )


def to_geojson_features(nodes: DataFrame | None = None, ways: DataFrame | None = None,
                        relations: DataFrame | None = None,
                        members: DataFrame | None = None,
                        precision: int = 6) -> DataFrame:
    """osmEntityToGeoJSONFeature over whole layers: union of the three
    feature classes as (id, entity_type, feature-json) rows."""
    frames = []
    # ONE shared coordinate-resolution frame: the way path and both
    # relation geometry paths reference the same subplan, so ReuseExchange
    # materializes the resolve shuffle once
    coords = way_coord_arrays(ways, nodes) if ways is not None and nodes is not None else None
    if nodes is not None:
        frames.append(nodes_to_features(nodes, precision))
    if ways is not None:
        if nodes is None:
            raise ValueError("ways need the node layer for coordinates")
        frames.append(ways_to_features(ways, nodes, precision, coords=coords))
    if relations is not None:
        if members is None or ways is None or nodes is None:
            raise ValueError("relations need members + ways + nodes")
        frames.append(relations_to_features(relations, members, ways, nodes,
                                            precision, coords=coords))
    if not frames:
        raise ValueError("at least one layer required")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def write_geojson_seq(features: DataFrame, path: str) -> None:
    """Newline-delimited GeoJSON (GeoJSONSeq / RFC 8142): partition-parallel
    writer — the 100 TB-safe export format."""
    features.select("feature").write.mode("overwrite").text(path)


def feature_collection(features: DataFrame, limit: int | None = None) -> str:
    """Small-extract convenience: a single FeatureCollection string
    (DRIVER-side collect — use write_geojson_seq at scale)."""
    df = features.orderBy("entity_type", "id")
    if limit is not None:
        df = df.limit(limit)
    feats = [r["feature"] for r in df.select("feature").collect()]
    return '{"type":"FeatureCollection","features":[' + ",".join(feats) + "]}"
