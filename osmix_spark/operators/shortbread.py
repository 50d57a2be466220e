"""Shortbread-schema layer classification (T3).

Reference: packages/shortbread/src/layers.ts:809-946 — 14 tag-matcher
layers feeding the shortbread tile schema. Re-expressed as a single CASE
Column expression over the tags map (pure Catalyst; the classification
runs inside the scan's codegen stage and can drive partition pruning when
the layer column is written out).

The matcher subset below covers the schema's major layers; precedence
follows the reference's first-match order (water before land, boundaries
before places).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

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


def _t(tags: Column, key: str) -> Column:
    return F.element_at(tags, F.lit(key))


def classify(tags: Column) -> Column:
    """tags -> shortbread layer name (NULL = unstyled)."""
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
    """DuckDB twin of classify() for oracle parity. DuckDB map extraction
    returns a LIST — [1] unwraps to the scalar (NULL when absent)."""
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
