"""Shortbread-schema layer classification (T3) — the FULL 20-layer schema.

Reference: packages/shortbread/src/layers.ts — matchers (layers.ts:103-800)
feeding the layer definition list (layers.ts:809-908). matchTags
(layers.ts:921-946) returns ALL matching layers for an entity's geometry
type, each with a `kind` plus name attributes (extractNames,
layers.ts:53-61) and per-layer properties.

Re-expressed as pure Catalyst expressions: every matcher is a CASE chain
over the tags map, generated from the same kind-map dicts that generate the
DuckDB oracle SQL — so the Spark expression and its SQL twin cannot drift.
`layer_matches` returns an array<struct> of (layer, kind, attributes) for
one entity, ready to explode into the per-layer tile feature table.

Known intentional divergence: the reference's parseNumber is JS parseFloat
(accepts trailing garbage, "12px" -> 12); we use CAST AS DOUBLE (NULL on
trailing garbage). OSM numeric tags in the wild are overwhelmingly clean.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# kind maps (copied constants from layers.ts — data, not code)
# ---------------------------------------------------------------------------

WATER_KIND_MAP = {
    "water": "water", "ocean": "ocean", "sea": "ocean", "riverbank": "river",
    "river": "river", "lake": "lake", "reservoir": "reservoir",
    "basin": "basin", "dock": "dock", "swimming_pool": "swimming_pool",
}

WATER_LINE_KIND_MAP = {
    "river": "river", "canal": "canal", "stream": "stream",
    "ditch": "ditch", "drain": "drain", "dam": "dam",
}

LAND_KIND_MAP = {
    "wood": "wood", "forest": "forest", "grassland": "grass", "grass": "grass",
    "heath": "heath", "scrub": "scrub", "wetland": "wetland", "mud": "mud",
    "beach": "beach", "sand": "sand", "bare_rock": "bare_rock",
    "scree": "scree", "glacier": "glacier", "residential": "residential",
    "commercial": "commercial", "industrial": "industrial", "retail": "retail",
    "railway": "railway", "farmland": "farmland", "cemetery": "cemetery",
    "allotments": "allotments", "brownfield": "brownfield",
    "greenfield": "greenfield", "meadow": "meadow", "orchard": "orchard",
    "vineyard": "vineyard", "quarry": "quarry", "landfill": "landfill",
    "military": "military", "construction": "construction",
    "recreation_ground": "recreation_ground", "village_green": "village_green",
    "winter_sports": "winter_sports",
}

SITE_KIND_MAP = {
    "attraction": "attraction", "zoo": "zoo", "theme_park": "theme_park",
    "park": "park", "garden": "garden", "playground": "playground",
    "sports_centre": "sports_centre", "stadium": "stadium", "pitch": "pitch",
    "golf_course": "golf_course", "swimming_pool": "swimming_pool",
    "water_park": "water_park", "marina": "marina", "hospital": "hospital",
    "university": "university", "school": "school", "college": "college",
    "kindergarten": "kindergarten", "parking": "parking",
    "bus_station": "bus_station", "prison": "prison",
    "place_of_worship": "place_of_worship", "aerodrome": "aerodrome",
    "helipad": "helipad",
}

STREET_KIND_MAP = {
    k: k for k in (
        "motorway", "motorway_link", "trunk", "trunk_link", "primary",
        "primary_link", "secondary", "secondary_link", "tertiary",
        "tertiary_link", "unclassified", "residential", "living_street",
        "pedestrian", "service", "track", "footway", "path", "cycleway",
        "steps", "bridleway", "construction", "raceway",
    )
}

POI_AMENITY_MAP = {
    **{k: k for k in (
        "restaurant", "cafe", "fast_food", "bar", "pub", "biergarten",
        "food_court", "ice_cream", "bank", "atm", "post_office", "library",
        "theatre", "cinema", "nightclub", "casino", "community_centre",
        "arts_centre", "hospital", "clinic", "doctors", "dentist",
        "veterinary", "pharmacy", "school", "kindergarten", "college",
        "university", "place_of_worship", "fuel", "car_wash", "car_repair",
        "bicycle_parking", "bicycle_rental", "parking", "bus_station",
        "taxi", "charging_station", "drinking_water", "bench", "shelter",
        "waste_basket", "recycling", "post_box", "telephone", "fire_station",
        "police", "townhall", "embassy", "courthouse", "prison",
        "marketplace",
    )},
    "toilets": "toilet",
}

POI_TOURISM_MAP = {k: k for k in (
    "hotel", "motel", "hostel", "guest_house", "camp_site", "caravan_site",
    "alpine_hut", "wilderness_hut", "museum", "gallery", "zoo", "theme_park",
    "attraction", "viewpoint", "information",
)}

POI_SHOP_MAP = {k: k for k in (
    "supermarket", "convenience", "bakery", "butcher", "greengrocer",
    "kiosk", "mall", "department_store", "clothes", "shoes", "sports",
    "furniture", "electronics", "hardware", "books", "stationery", "bicycle",
    "car", "hairdresser", "beauty", "laundry", "dry_cleaning", "optician",
)}

POI_LEISURE_MAP = {k: k for k in (
    "stadium", "sports_centre", "swimming_pool", "water_park",
    "fitness_centre", "golf_course", "pitch", "playground", "park", "garden",
)}

POI_NATURAL_MAP = {k: k for k in (
    "peak", "volcano", "saddle", "spring", "cave_entrance",
)}

POI_MAN_MADE_MAP = {k: k for k in ("tower", "lighthouse", "windmill", "watermill")}

POI_HISTORIC_MAP = {k: k for k in (
    "monument", "memorial", "wayside_cross", "wayside_shrine", "castle",
    "ruins", "archaeological_site", "city_gate",
)}

PLACE_KIND_MAP = {k: k for k in (
    "continent", "country", "state", "region", "county", "city", "town",
    "village", "hamlet", "suburb", "neighbourhood", "isolated_dwelling",
    "farm", "island", "islet", "locality",
)}

PUBLIC_TRANSPORT_KIND_MAP = {
    "rail": "railway", "light_rail": "light_rail", "subway": "subway",
    "tram": "tram", "monorail": "monorail", "funicular": "funicular",
}

AERIALWAY_KIND_MAP = {
    **{k: k for k in (
        "cable_car", "gondola", "chair_lift", "mixed_lift", "drag_lift",
        "platter", "rope_tow", "magic_carpet", "zip_line",
    )},
    "t-bar": "t-bar", "j-bar": "j-bar",
}


# ---------------------------------------------------------------------------
# expression builders (Column + SQL from the same data)
# ---------------------------------------------------------------------------

def _t(tags: Column, key: str) -> Column:
    return F.element_at(tags, F.lit(key))


def _g(k: str) -> str:
    """DuckDB tag lookup (map extraction returns a LIST; [1] unwraps)."""
    return f"tags['{k}'][1]"


def _map_case(col: Column, mapping: dict[str, str]) -> Column:
    out = None
    for k, v in mapping.items():
        out = F.when(col == k, v) if out is None else out.when(col == k, v)
    return out


def _map_case_sql(expr: str, mapping: dict[str, str]) -> str:
    whens = " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in mapping.items())
    return f"(CASE {expr} {whens} END)"


def parse_boolean(col: Column) -> Column:
    """parseBoolean (layers.ts:76-82): yes/true/1, no/false/0, else NULL."""
    return (
        F.when(col.isin("yes", "true", "1"), F.lit(True))
        .when(col.isin("no", "false", "0"), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def _pb_sql(expr: str) -> str:
    return (f"(CASE WHEN {expr} IN ('yes','true','1') THEN true"
            f" WHEN {expr} IN ('no','false','0') THEN false ELSE NULL END)")


def parse_number(col: Column) -> Column:
    """parseNumber (layers.ts:66-71) as TRY_CAST: NULL on malformed input
    (a plain cast throws under Spark 4's default ANSI mode on real-world
    tags like maxspeed='50 mph'; see module docstring for the remaining
    parseFloat divergence)."""
    return col.try_cast("double")


def _pn_sql(expr: str) -> str:
    return f"try_cast({expr} AS DOUBLE)"


# --- per-matcher kind expressions -------------------------------------------

def water_kind(tags: Column) -> Column:
    """matchWater (layers.ts:103-127)."""
    water = F.coalesce(_t(tags, "water"), F.lit("water"))
    return (
        F.when(_t(tags, "natural") == "water",
               F.coalesce(_map_case(water, WATER_KIND_MAP), F.lit("water")))
        .when(_t(tags, "waterway").isin("riverbank", "dock"),
              _map_case(_t(tags, "waterway"), WATER_KIND_MAP))
        .when(_t(tags, "landuse").isin("reservoir", "basin"),
              _map_case(_t(tags, "landuse"), WATER_KIND_MAP))
        .when(_t(tags, "leisure") == "swimming_pool", "swimming_pool")
    )


def water_kind_sql() -> str:
    w = f"coalesce({_g('water')}, 'water')"
    return f"""(CASE
      WHEN {_g('natural')} = 'water' THEN coalesce({_map_case_sql(w, WATER_KIND_MAP)}, 'water')
      WHEN {_g('waterway')} IN ('riverbank','dock') THEN {_map_case_sql(_g('waterway'), WATER_KIND_MAP)}
      WHEN {_g('landuse')} IN ('reservoir','basin') THEN {_map_case_sql(_g('landuse'), WATER_KIND_MAP)}
      WHEN {_g('leisure')} = 'swimming_pool' THEN 'swimming_pool' END)"""


def water_line_kind(tags: Column) -> Column:
    """matchWaterLines (layers.ts:142-157)."""
    return _map_case(_t(tags, "waterway"), WATER_LINE_KIND_MAP)


def water_line_kind_sql() -> str:
    return _map_case_sql(_g("waterway"), WATER_LINE_KIND_MAP)


def land_kind(tags: Column) -> Column:
    """matchLand (layers.ts:200-225): natural first, then landuse, then
    leisure=recreation_ground."""
    return F.coalesce(
        _map_case(_t(tags, "natural"), LAND_KIND_MAP),
        _map_case(_t(tags, "landuse"), LAND_KIND_MAP),
        F.when(_t(tags, "leisure") == "recreation_ground", "recreation_ground"),
    )


def land_kind_sql() -> str:
    return (f"coalesce({_map_case_sql(_g('natural'), LAND_KIND_MAP)},"
            f" {_map_case_sql(_g('landuse'), LAND_KIND_MAP)},"
            f" CASE WHEN {_g('leisure')} = 'recreation_ground' THEN 'recreation_ground' END)")


def site_kind(tags: Column) -> Column:
    """matchSites (layers.ts:260-295): tourism, leisure, amenity, aeroway
    via the kind map, then the special cases in reference order."""
    return F.coalesce(
        _map_case(_t(tags, "tourism"), SITE_KIND_MAP),
        _map_case(_t(tags, "leisure"), SITE_KIND_MAP),
        _map_case(_t(tags, "amenity"), SITE_KIND_MAP),
        _map_case(_t(tags, "aeroway"), SITE_KIND_MAP),
        F.when(_t(tags, "railway") == "station", "railway_station"),
        F.when(_t(tags, "amenity") == "fuel", "fuel"),
        F.when(_t(tags, "landuse") == "cemetery", "cemetery"),
        F.when(_t(tags, "shop").isin("mall", "shopping_centre"), "shopping"),
    )


def site_kind_sql() -> str:
    return (
        f"coalesce({_map_case_sql(_g('tourism'), SITE_KIND_MAP)},"
        f" {_map_case_sql(_g('leisure'), SITE_KIND_MAP)},"
        f" {_map_case_sql(_g('amenity'), SITE_KIND_MAP)},"
        f" {_map_case_sql(_g('aeroway'), SITE_KIND_MAP)},"
        f" CASE WHEN {_g('railway')} = 'station' THEN 'railway_station' END,"
        f" CASE WHEN {_g('amenity')} = 'fuel' THEN 'fuel' END,"
        f" CASE WHEN {_g('landuse')} = 'cemetery' THEN 'cemetery' END,"
        f" CASE WHEN {_g('shop')} IN ('mall','shopping_centre') THEN 'shopping' END)"
    )


def building_kind(tags: Column) -> Column:
    """matchBuildings (layers.ts:301-314)."""
    b = _t(tags, "building")
    return F.when(b.isNotNull() & (b != "no"), "building")


def building_kind_sql() -> str:
    return (f"(CASE WHEN {_g('building')} IS NOT NULL"
            f" AND {_g('building')} <> 'no' THEN 'building' END)")


def street_kind(tags: Column) -> Column:
    """matchStreets (layers.ts:347-368)."""
    return _map_case(_t(tags, "highway"), STREET_KIND_MAP)


def street_kind_sql() -> str:
    return _map_case_sql(_g("highway"), STREET_KIND_MAP)


def poi_kind(tags: Column) -> Column:
    """matchPois (layers.ts:514-565) in exact precedence order."""
    railway = _t(tags, "railway")
    return F.coalesce(
        _map_case(_t(tags, "amenity"), POI_AMENITY_MAP),
        _map_case(_t(tags, "tourism"), POI_TOURISM_MAP),
        _map_case(_t(tags, "shop"), POI_SHOP_MAP),
        _map_case(_t(tags, "leisure"), POI_LEISURE_MAP),
        _map_case(_t(tags, "natural"), POI_NATURAL_MAP),
        _map_case(_t(tags, "man_made"), POI_MAN_MADE_MAP),
        _map_case(_t(tags, "historic"), POI_HISTORIC_MAP),
        F.when(railway == "station", "railway_station").when(railway == "halt", "halt"),
        F.when(_t(tags, "highway") == "bus_stop", "bus_stop"),
        F.when(railway == "tram_stop", "tram_stop"),
        F.when(railway == "subway_entrance", "subway_entrance"),
        F.when(_t(tags, "aeroway") == "aerodrome", "aerodrome"),
        F.when(_t(tags, "aeroway") == "helipad", "helipad"),
        F.when(_t(tags, "amenity") == "ferry_terminal", "ferry_terminal"),
    )


def poi_kind_sql() -> str:
    return (
        f"coalesce({_map_case_sql(_g('amenity'), POI_AMENITY_MAP)},"
        f" {_map_case_sql(_g('tourism'), POI_TOURISM_MAP)},"
        f" {_map_case_sql(_g('shop'), POI_SHOP_MAP)},"
        f" {_map_case_sql(_g('leisure'), POI_LEISURE_MAP)},"
        f" {_map_case_sql(_g('natural'), POI_NATURAL_MAP)},"
        f" {_map_case_sql(_g('man_made'), POI_MAN_MADE_MAP)},"
        f" {_map_case_sql(_g('historic'), POI_HISTORIC_MAP)},"
        f" CASE WHEN {_g('railway')} = 'station' THEN 'railway_station'"
        f"      WHEN {_g('railway')} = 'halt' THEN 'halt' END,"
        f" CASE WHEN {_g('highway')} = 'bus_stop' THEN 'bus_stop' END,"
        f" CASE WHEN {_g('railway')} = 'tram_stop' THEN 'tram_stop' END,"
        f" CASE WHEN {_g('railway')} = 'subway_entrance' THEN 'subway_entrance' END,"
        f" CASE WHEN {_g('aeroway')} = 'aerodrome' THEN 'aerodrome' END,"
        f" CASE WHEN {_g('aeroway')} = 'helipad' THEN 'helipad' END,"
        f" CASE WHEN {_g('amenity')} = 'ferry_terminal' THEN 'ferry_terminal' END)"
    )


def place_kind(tags: Column) -> Column:
    """matchPlaces (layers.ts:591-615)."""
    return _map_case(_t(tags, "place"), PLACE_KIND_MAP)


def place_kind_sql() -> str:
    return _map_case_sql(_g("place"), PLACE_KIND_MAP)


def boundary_kind(tags: Column) -> Column:
    """matchBoundary (layers.ts:621-647): protected_area, else by
    admin_level (<=2 national, <=4 regional, numeric local, else
    administrative)."""
    b = _t(tags, "boundary")
    lvl = parse_number(_t(tags, "admin_level"))
    return F.when(
        b.isin("administrative", "protected_area"),
        F.when(b == "protected_area", "protected_area")
        .when(lvl <= 2, "national")
        .when(lvl <= 4, "regional")
        .when(lvl.isNotNull(), "local")
        .otherwise("administrative"),
    )


def boundary_kind_sql() -> str:
    lvl = _pn_sql(_g("admin_level"))
    return f"""(CASE WHEN {_g('boundary')} IN ('administrative','protected_area') THEN
      (CASE WHEN {_g('boundary')} = 'protected_area' THEN 'protected_area'
            WHEN {lvl} <= 2 THEN 'national'
            WHEN {lvl} <= 4 THEN 'regional'
            WHEN {lvl} IS NOT NULL THEN 'local'
            ELSE 'administrative' END) END)"""


def address_kind(tags: Column) -> Column:
    """matchAddresses (layers.ts:655-668): housenumber required."""
    return F.when(_t(tags, "addr:housenumber").isNotNull(), "address")


def address_kind_sql() -> str:
    return f"(CASE WHEN {_g('addr:housenumber')} IS NOT NULL THEN 'address' END)"


def public_transport_kind(tags: Column) -> Column:
    """matchPublicTransport (layers.ts:683-707)."""
    route = _t(tags, "route")
    return F.coalesce(
        _map_case(_t(tags, "railway"), PUBLIC_TRANSPORT_KIND_MAP),
        F.when(route == "bus", "bus")
        .when(route == "tram", "tram")
        .when(route == "subway", "subway")
        .when(route == "light_rail", "light_rail")
        .when(route.isin("train", "railway"), "railway"),
    )


def public_transport_kind_sql() -> str:
    return (
        f"coalesce({_map_case_sql(_g('railway'), PUBLIC_TRANSPORT_KIND_MAP)},"
        f" CASE WHEN {_g('route')} = 'bus' THEN 'bus'"
        f"      WHEN {_g('route')} = 'tram' THEN 'tram'"
        f"      WHEN {_g('route')} = 'subway' THEN 'subway'"
        f"      WHEN {_g('route')} = 'light_rail' THEN 'light_rail'"
        f"      WHEN {_g('route')} IN ('train','railway') THEN 'railway' END)"
    )


def aerialway_kind(tags: Column) -> Column:
    """matchAerialways (layers.ts:727-737)."""
    return _map_case(_t(tags, "aerialway"), AERIALWAY_KIND_MAP)


def aerialway_kind_sql() -> str:
    return _map_case_sql(_g("aerialway"), AERIALWAY_KIND_MAP)


def ferry_kind(tags: Column) -> Column:
    return F.when(_t(tags, "route") == "ferry", "ferry")


def ferry_kind_sql() -> str:
    return f"(CASE WHEN {_g('route')} = 'ferry' THEN 'ferry' END)"


def bridge_kind(tags: Column) -> Column:
    return F.when(_t(tags, "man_made") == "bridge", "bridge")


def bridge_kind_sql() -> str:
    return f"(CASE WHEN {_g('man_made')} = 'bridge' THEN 'bridge' END)"


def dam_kind(tags: Column) -> Column:
    return F.when(_t(tags, "waterway") == "dam", "dam")


def dam_kind_sql() -> str:
    return f"(CASE WHEN {_g('waterway')} = 'dam' THEN 'dam' END)"


def pier_kind(tags: Column) -> Column:
    return F.when(_t(tags, "man_made") == "pier", "pier")


def pier_kind_sql() -> str:
    return f"(CASE WHEN {_g('man_made')} = 'pier' THEN 'pier' END)"


# ---------------------------------------------------------------------------
# layer definitions (SHORTBREAD_LAYERS, layers.ts:809-908)
# ---------------------------------------------------------------------------

# (name, geometry types, kind fn, kind-sql fn)
LAYER_DEFS: list[tuple[str, tuple[str, ...], object, object]] = [
    ("water", ("Polygon",), water_kind, water_kind_sql),
    ("water_lines", ("LineString",), water_line_kind, water_line_kind_sql),
    ("water_lines_labels", ("LineString",), water_line_kind, water_line_kind_sql),
    ("land", ("Polygon",), land_kind, land_kind_sql),
    ("sites", ("Polygon",), site_kind, site_kind_sql),
    ("buildings", ("Polygon",), building_kind, building_kind_sql),
    ("streets", ("LineString",), street_kind, street_kind_sql),
    ("street_labels", ("LineString",), street_kind, street_kind_sql),
    ("street_labels_points", ("Point",), street_kind, street_kind_sql),
    ("pois", ("Point",), poi_kind, poi_kind_sql),
    ("places", ("Point",), place_kind, place_kind_sql),
    ("boundary_lines", ("LineString",), boundary_kind, boundary_kind_sql),
    ("boundary_labels", ("Point",), boundary_kind, boundary_kind_sql),
    ("addresses", ("Point",), address_kind, address_kind_sql),
    ("public_transport", ("LineString",), public_transport_kind, public_transport_kind_sql),
    ("aerialways", ("LineString",), aerialway_kind, aerialway_kind_sql),
    ("ferries", ("LineString",), ferry_kind, ferry_kind_sql),
    ("bridges", ("Polygon",), bridge_kind, bridge_kind_sql),
    ("dams", ("LineString", "Polygon"), dam_kind, dam_kind_sql),
    ("piers", ("LineString", "Polygon"), pier_kind, pier_kind_sql),
]

LAYER_NAMES = [name for name, *_ in LAYER_DEFS]

# per-layer extra attributes emitted by layer_matches (subset of each
# matcher's property struct; names are always included)
_ATTR_LAYERS = {
    "height": {"buildings"},                       # parseNumber(height)
    "admin_level": {"boundary_lines", "boundary_labels"},
    "population": {"places"},
    "surface": {"streets", "street_labels", "street_labels_points"},
    "oneway": {"streets", "street_labels", "street_labels_points"},
    "maxspeed": {"streets", "street_labels", "street_labels_points"},
    "intermittent": {"water", "water_lines", "water_lines_labels"},
    "housenumber": {"addresses"},
}


def names(tags: Column) -> tuple[Column, Column, Column]:
    """extractNames (layers.ts:53-61)."""
    return (_t(tags, "name"), _t(tags, "name:en"), _t(tags, "name:de"))


def layer_matches(tags: Column, geometry_type: Column) -> Column:
    """ALL matching (layer, kind, attributes) entries for one entity —
    matchTags (layers.ts:921-946) as a single Catalyst expression returning
    array<struct>. Explode it to build the per-layer feature table."""
    name, name_en, name_de = names(tags)
    null_d = F.lit(None).cast("double")
    null_b = F.lit(None).cast("boolean")
    null_s = F.lit(None).cast("string")
    entries = []
    for lname, geoms, kind_fn, _sql in LAYER_DEFS:
        kind = kind_fn(tags)
        geom_ok = geometry_type.isin(*geoms)

        def attr(col: Column, key: str):
            return col if lname in _ATTR_LAYERS[key] else (
                null_b if key in ("oneway", "intermittent")
                else null_s if key in ("surface", "housenumber")
                else null_d
            )

        entry = F.struct(
            F.lit(lname).alias("layer"),
            kind.alias("kind"),
            name.alias("name"),
            name_en.alias("name_en"),
            name_de.alias("name_de"),
            attr(parse_number(_t(tags, "height")), "height").alias("height"),
            attr(parse_number(_t(tags, "admin_level")), "admin_level").alias("admin_level"),
            attr(parse_number(_t(tags, "population")), "population").alias("population"),
            attr(_t(tags, "surface"), "surface").alias("surface"),
            attr(parse_boolean(_t(tags, "oneway")), "oneway").alias("oneway"),
            attr(parse_number(_t(tags, "maxspeed")), "maxspeed").alias("maxspeed"),
            attr(parse_boolean(_t(tags, "intermittent")), "intermittent").alias("intermittent"),
            attr(_t(tags, "addr:housenumber"), "housenumber").alias("housenumber"),
        )
        entries.append(F.when(geom_ok & kind.isNotNull(), entry))
    return F.filter(F.array(*entries), lambda x: x.isNotNull())


def _spark_expr_sql(duck: str) -> str:
    """Convert a matcher's generated DuckDB SQL into Spark SQL. The ONLY
    dialect difference in the matcher snippets is the tag getter (DuckDB
    map extraction yields a LIST, unwrapped with [1]); everything else
    (CASE, coalesce, IN, try_cast) parses identically — so the Spark
    expression and the oracle stay generated from one source."""
    import re

    return re.sub(r"tags\['([^']+)'\]\[1\]", r"element_at(tags, '\1')", duck)


_SPARK_NULL_T = {"height": "DOUBLE", "admin_level": "DOUBLE",
                 "population": "DOUBLE", "surface": "STRING",
                 "oneway": "BOOLEAN", "maxspeed": "DOUBLE",
                 "intermittent": "BOOLEAN", "housenumber": "STRING"}


def layer_matches_expr() -> Column:
    """layer_matches as ONE parsed SQL expression over columns (tags, geom).

    Semantics identical to the Column-builder twin (generated from the same
    kind maps + *_sql snippets, asserted equal in tests), but the whole
    20-layer tree is ONE py4j parse instead of thousands of Column calls —
    DataFrame build time for shortbread_layers drops ~4s."""
    ne = _spark_expr_sql
    entries = []
    for lname, geoms, _fn, sql_fn in LAYER_DEFS:
        kind = ne(sql_fn())
        geom_ok = " OR ".join(f"geom = '{g}'" for g in geoms)

        def attr(expr: str, key: str) -> str:
            return expr if lname in _ATTR_LAYERS[key] else (
                f"CAST(NULL AS {_SPARK_NULL_T[key]})"
            )

        entry = (
            f"named_struct('layer', '{lname}', 'kind', {kind}, "
            f"'name', {ne(_g('name'))}, 'name_en', {ne(_g('name:en'))}, "
            f"'name_de', {ne(_g('name:de'))}, "
            f"'height', {attr(ne(_pn_sql(_g('height'))), 'height')}, "
            f"'admin_level', {attr(ne(_pn_sql(_g('admin_level'))), 'admin_level')}, "
            f"'population', {attr(ne(_pn_sql(_g('population'))), 'population')}, "
            f"'surface', {attr(ne(_g('surface')), 'surface')}, "
            f"'oneway', {attr(ne(_pb_sql(_g('oneway'))), 'oneway')}, "
            f"'maxspeed', {attr(ne(_pn_sql(_g('maxspeed'))), 'maxspeed')}, "
            f"'intermittent', {attr(ne(_pb_sql(_g('intermittent'))), 'intermittent')}, "
            f"'housenumber', {attr(ne(_g('addr:housenumber')), 'housenumber')})"
        )
        entries.append(
            f"CASE WHEN ({geom_ok}) AND ({kind}) IS NOT NULL THEN {entry} END"
        )
    arr = "array(" + ", ".join(entries) + ")"
    return F.expr(f"filter({arr}, x -> x IS NOT NULL)")


def layer_matches_sql(tagged: str = "tagged", id_col: str = "doc_id",
                      geom_col: str = "geom") -> str:
    """DuckDB twin of (explode . layer_matches): UNION ALL of one SELECT per
    layer over `tagged(id, tags, geom)`."""
    selects = []
    for lname, geoms, _fn, sql_fn in LAYER_DEFS:
        kind_sql = sql_fn()
        geom_pred = " OR ".join(f"{geom_col} = '{g}'" for g in geoms)

        def attr(expr: str, key: str, typ: str) -> str:
            return expr if lname in _ATTR_LAYERS[key] else f"NULL::{typ}"

        selects.append(f"""
        SELECT {id_col}, '{lname}' AS layer, {kind_sql} AS kind,
               {_g('name')} AS name, {_g('name:en')} AS name_en, {_g('name:de')} AS name_de,
               {attr(_pn_sql(_g('height')), 'height', 'DOUBLE')} AS height,
               {attr(_pn_sql(_g('admin_level')), 'admin_level', 'DOUBLE')} AS admin_level,
               {attr(_pn_sql(_g('population')), 'population', 'DOUBLE')} AS population,
               {attr(_g('surface'), 'surface', 'VARCHAR')} AS surface,
               {attr(_pb_sql(_g('oneway')), 'oneway', 'BOOLEAN')} AS oneway,
               {attr(_pn_sql(_g('maxspeed')), 'maxspeed', 'DOUBLE')} AS maxspeed,
               {attr(_pb_sql(_g('intermittent')), 'intermittent', 'BOOLEAN')} AS intermittent,
               {attr(_g('addr:housenumber'), 'housenumber', 'VARCHAR')} AS housenumber
        FROM {tagged}
        WHERE ({geom_pred}) AND {kind_sql} IS NOT NULL""")
    return " UNION ALL ".join(selects)


# ---------------------------------------------------------------------------
# back-compat single-layer classifier (round-1 API; subset semantics)
# ---------------------------------------------------------------------------

_STREET_VALUES = (
    "motorway", "trunk", "primary", "secondary", "tertiary", "residential",
    "service", "unclassified", "living_street", "pedestrian", "track",
)
_PATH_VALUES = ("footway", "path", "cycleway", "bridleway", "steps")
_WATER_LANDUSE = ("basin", "reservoir")
_SITE_LANDUSE = (
    "residential", "commercial", "industrial", "retail", "railway",
    "cemetery", "forest", "grass", "meadow", "farmland", "orchard",
)


def classify(tags: Column) -> Column:
    """tags -> FIRST matching major layer name (round-1 simplified API;
    prefer layer_matches for the full schema)."""
    highway = _t(tags, "highway")
    return (
        F.when(_t(tags, "building").isNotNull(), "buildings")
        .when(
            (_t(tags, "natural") == "water")
            | _t(tags, "waterway").isNotNull()
            | _t(tags, "landuse").isin(*_WATER_LANDUSE),
            "water",
        )
        .when(highway.isin(*_STREET_VALUES), "streets")
        .when(highway.isin(*_PATH_VALUES), "streets")  # paths render in streets
        .when(_t(tags, "railway").isNotNull(), "streets")
        .when(_t(tags, "boundary") == "administrative", "boundaries")
        .when(_t(tags, "place").isNotNull(), "place_labels")
        .when(
            _t(tags, "amenity").isNotNull()
            | _t(tags, "shop").isNotNull()
            | _t(tags, "tourism").isNotNull(),
            "pois",
        )
        .when(
            _t(tags, "landuse").isin(*_SITE_LANDUSE) | (_t(tags, "natural").isNotNull()),
            "land",
        )
        .otherwise(F.lit(None))
    )


def classify_sql(tags_expr: str = "tags") -> str:
    """DuckDB twin of classify() for oracle parity."""
    def g(k: str) -> str:
        return f"{tags_expr}['{k}'][1]"

    def isin(k: str, vals) -> str:
        lst = ", ".join(f"'{v}'" for v in vals)
        return f"{g(k)} IN ({lst})"

    return f"""CASE
      WHEN {g('building')} IS NOT NULL THEN 'buildings'
      WHEN {g('natural')} = 'water' OR {g('waterway')} IS NOT NULL
           OR {isin('landuse', _WATER_LANDUSE)} THEN 'water'
      WHEN {isin('highway', _STREET_VALUES)} THEN 'streets'
      WHEN {isin('highway', _PATH_VALUES)} THEN 'streets'
      WHEN {g('railway')} IS NOT NULL THEN 'streets'
      WHEN {g('boundary')} = 'administrative' THEN 'boundaries'
      WHEN {g('place')} IS NOT NULL THEN 'place_labels'
      WHEN {g('amenity')} IS NOT NULL OR {g('shop')} IS NOT NULL
           OR {g('tourism')} IS NOT NULL THEN 'pois'
      WHEN {isin('landuse', _SITE_LANDUSE)} OR {g('natural')} IS NOT NULL THEN 'land'
      ELSE NULL END"""
