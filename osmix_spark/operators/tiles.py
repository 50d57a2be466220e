"""Tile materialization: the reference's per-tile RPC encoders re-expressed
as a distributed materialization job (SURVEY §2.9, §3.3).

Reference: vector tiles packages/vt/src/encode.ts:22-31,59-260 (extent 4096,
buffer 64, project lon/lat -> tile px, clip, encode); raster tiles
packages/raster/src/raster-tile.ts:44-345 (256 px RGBA, line draw +
scanline fill). Here: features x covering-tiles explode -> repartition by
(z,x,y) (AQE-salted for dense cells) -> applyInPandas encode -> a
tiles(z, x, y, bytes, n_features, content_hash) table.

Determinism: features are sorted by id inside each tile group before
encoding, so tile bytes are identical at any parallelism — the tile table
content hash is the golden output the north rule compares.

Scale notes: the explode is linear in (features x zoom levels); the only
shuffle keys on (z,x,y) which is also the output table's partition key.
Dense-city skew is handled by AQE skew-split on the groupBy; the encoder
is an Arrow-batched applyInPandas, one group per tile.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import geo, mvt


def point_tile_px(df: DataFrame, z: int, lon: str = "lon", lat: str = "lat",
                  extent: int = mvt.EXTENT) -> DataFrame:
    """Assign each point its covering tile at zoom z plus integer
    extent-space pixel coords (llToTilePx, geo/src/tile.ts:53-59)."""
    xf = geo.tile_x_fraction(F.col(lon), F.lit(z))
    yf = geo.tile_y_fraction(F.col(lat), F.lit(z))
    df = (
        df.withColumn("__xf", xf)
        .withColumn("__yf", yf)
        .withColumn("tx", F.floor("__xf").cast("long"))
        .withColumn("ty", F.floor("__yf").cast("long"))
    )
    return (
        df.withColumn("px", F.round((F.col("__xf") - F.col("tx")) * extent).cast("int"))
        .withColumn("py", F.round((F.col("__yf") - F.col("ty")) * extent).cast("int"))
        .withColumn("z", F.lit(z).cast("int"))
        .drop("__xf", "__yf")
    )


MVT_SCHEMA = T.StructType(
    [
        T.StructField("z", T.IntegerType(), False),
        T.StructField("tx", T.LongType(), False),
        T.StructField("ty", T.LongType(), False),
        T.StructField("n_features", T.IntegerType(), False),
        T.StructField("size_bytes", T.IntegerType(), False),
        T.StructField("content_hash", T.LongType(), False),
        T.StructField("tile", T.BinaryType(), False),
    ]
)


def encode_point_mvt(points_px: DataFrame, layer: str = "points",
                     id_col: str = "id",
                     tag_cols: tuple[str, ...] = ()) -> DataFrame:
    """points_px: output of point_tile_px (z, tx, ty, px, py, id, tags...).
    Returns the materialized tile table with deterministic bytes."""
    cols = ["z", "tx", "ty", id_col, "px", "py", *tag_cols]

    def encode(key, pdf: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        z, tx, ty = int(key[0]), int(key[1]), int(key[2])
        pdf = pdf.sort_values(id_col)
        feats = []
        for row in pdf.itertuples(index=False):
            d = row._asdict()
            feats.append(
                {
                    "id": int(d[id_col]),
                    "type": mvt.GEOM_POINT,
                    "geometry": [[(int(d["px"]), int(d["py"]))]],
                    "tags": {c: d[c] for c in tag_cols if d.get(c) is not None},
                }
            )
        buf = mvt.encode_tile({layer: feats})
        h = int.from_bytes(hashlib.md5(buf).digest()[:8], "big") >> 1
        return pd.DataFrame(
            [
                {
                    "z": z, "tx": tx, "ty": ty,
                    "n_features": len(feats), "size_bytes": len(buf),
                    "content_hash": h, "tile": buf,
                }
            ]
        )

    return (
        points_px.select(*cols)
        .groupBy("z", "tx", "ty")
        .applyInPandas(encode, schema=MVT_SCHEMA)
    )


def encode_way_mvt(ways_px: DataFrame, layer: str = "ways") -> DataFrame:
    """ways_px: (z, tx, ty, way_id, pxs array<int>, pys array<int>) — one row
    per (way, covering tile) with extent-space vertex arrays (may extend
    past the tile edge into the 64 px buffer; clipping to extent+buffer is
    done here)."""
    lo, hi = -mvt.BUFFER_PX, mvt.EXTENT + mvt.BUFFER_PX

    def encode(key, pdf: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        z, tx, ty = int(key[0]), int(key[1]), int(key[2])
        pdf = pdf.sort_values("way_id")
        feats = []
        for row in pdf.itertuples(index=False):
            pts = [
                (max(lo, min(hi, int(x))), max(lo, min(hi, int(y))))
                for x, y in zip(row.pxs, row.pys)
            ]
            # drop consecutive duplicates after clamping (cleanCoords,
            # change/src/utils.ts:86-98)
            cleaned = [p for i, p in enumerate(pts) if i == 0 or p != pts[i - 1]]
            if len(cleaned) < 2:
                continue
            feats.append(
                {"id": int(row.way_id), "type": mvt.GEOM_LINESTRING,
                 "geometry": [cleaned], "tags": {}}
            )
        buf = mvt.encode_tile({layer: feats})
        h = int.from_bytes(hashlib.md5(buf).digest()[:8], "big") >> 1
        return pd.DataFrame(
            [{"z": z, "tx": tx, "ty": ty, "n_features": len(feats),
              "size_bytes": len(buf), "content_hash": h, "tile": buf}]
        )

    return ways_px.groupBy("z", "tx", "ty").applyInPandas(encode, schema=MVT_SCHEMA)


def _shoelace_px(pts: list[tuple[int, int]]) -> float:
    """Standard shoelace (>0 == CCW in y-up axes == CW on screen, since
    extent-space y grows downward)."""
    s = 0.0
    for i in range(len(pts) - 1):
        s += pts[i][0] * pts[i + 1][1] - pts[i + 1][0] * pts[i][1]
    return s / 2.0


def encode_polygon_mvt(rings_px: DataFrame, layer: str = "areas") -> DataFrame:
    """Encode multipolygon features (vt/encode.ts:35-45,234-247 winding fix):
    in extent space (y down) outer rings must be screen-CW (positive
    shoelace as computed in raw px axes), inner rings screen-CCW.

    rings_px: (z, tx, ty, feature_id, ring_index, role, pxs array<int>,
    pys array<int>) — one row per (ring, covering tile); ring vertices in
    extent space, closed (first == last). Rings of one feature are grouped
    into a single GEOM_POLYGON feature, ordered by ring_index.
    """
    lo, hi = -mvt.BUFFER_PX, mvt.EXTENT + mvt.BUFFER_PX

    def encode(key, pdf: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        z, tx, ty = int(key[0]), int(key[1]), int(key[2])
        feats = []
        for fid, grp in pdf.sort_values(["feature_id", "ring_index"]).groupby(
            "feature_id", sort=True
        ):
            rings = []
            for row in grp.itertuples(index=False):
                pts = [
                    (max(lo, min(hi, int(x))), max(lo, min(hi, int(y))))
                    for x, y in zip(row.pxs, row.pys)
                ]
                cleaned = [p for i, p in enumerate(pts) if i == 0 or p != pts[i - 1]]
                if len(cleaned) < 4 or cleaned[0] != cleaned[-1]:
                    continue
                want_screen_cw = row.role != "inner"
                if (_shoelace_px(cleaned) > 0) != want_screen_cw:
                    cleaned = list(reversed(cleaned))
                rings.append(cleaned)
            if rings:
                feats.append(
                    {"id": int(fid), "type": mvt.GEOM_POLYGON,
                     "geometry": rings, "tags": {}}
                )
        buf = mvt.encode_tile({layer: feats})
        h = int.from_bytes(hashlib.md5(buf).digest()[:8], "big") >> 1
        return pd.DataFrame(
            [{"z": z, "tx": tx, "ty": ty, "n_features": len(feats),
              "size_bytes": len(buf), "content_hash": h, "tile": buf}]
        )

    return rings_px.groupBy("z", "tx", "ty").applyInPandas(encode, schema=MVT_SCHEMA)


# ---------------------------------------------------------------------------
# raster tiles (T2)
# ---------------------------------------------------------------------------

RASTER_SCHEMA = T.StructType(
    [
        T.StructField("z", T.IntegerType(), False),
        T.StructField("tx", T.LongType(), False),
        T.StructField("ty", T.LongType(), False),
        T.StructField("n_features", T.IntegerType(), False),
        T.StructField("content_hash", T.LongType(), False),
        T.StructField("png", T.BinaryType(), False),
    ]
)


def _write_png_rgba(arr) -> bytes:
    """Minimal PNG writer (RGBA8): zlib-compressed scanlines, filter 0."""
    import struct
    import zlib

    h, w = arr.shape[:2]

    def chunk(typ: bytes, data: bytes) -> bytes:
        c = struct.pack(">I", len(data)) + typ + data
        return c + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b"")


def render_point_raster(points_px: DataFrame, id_col: str = "id",
                        tile_size: int = 256,
                        rgba: tuple[int, int, int, int] = (20, 120, 220, 255)) -> DataFrame:
    """Rasterize points per tile: NumPy scatter into an RGBA buffer
    (raster-tile.ts:44-120's point path), PNG-encoded. Deterministic:
    pixel writes are idempotent (fixed color)."""

    def render(key, pdf: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        import numpy as np

        z, tx, ty = int(key[0]), int(key[1]), int(key[2])
        img = np.zeros((tile_size, tile_size, 4), dtype=np.uint8)
        xs = (pdf["px"].to_numpy() * tile_size // mvt.EXTENT).clip(0, tile_size - 1)
        ys = (pdf["py"].to_numpy() * tile_size // mvt.EXTENT).clip(0, tile_size - 1)
        img[ys, xs] = rgba
        png = _write_png_rgba(img)
        h = int.from_bytes(hashlib.md5(png).digest()[:8], "big") >> 1
        return pd.DataFrame(
            [{"z": z, "tx": tx, "ty": ty, "n_features": len(pdf),
              "content_hash": h, "png": png}]
        )

    return (
        points_px.select("z", "tx", "ty", id_col, "px", "py")
        .groupBy("z", "tx", "ty")
        .applyInPandas(render, schema=RASTER_SCHEMA)
    )


def render_line_raster(ways_px: DataFrame, tile_size: int = 256,
                       rgba: tuple[int, int, int, int] = (40, 40, 40, 255)) -> DataFrame:
    """Rasterize way polylines per tile (raster-tile.ts line path): each
    segment is sampled at max(|dx|,|dy|)+1 evenly-spaced points (NumPy
    linspace — the vectorized stand-in for Bresenham; identical pixel sets
    for the axis-aligned and 45-degree cases, superset otherwise).

    ways_px: (z, tx, ty, way_id, pxs array<int>, pys array<int>) in extent
    space (see encode_way_mvt).
    """

    def render(key, pdf: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        import numpy as np

        z, tx, ty = int(key[0]), int(key[1]), int(key[2])
        img = np.zeros((tile_size, tile_size, 4), dtype=np.uint8)
        scale = tile_size / mvt.EXTENT
        for row in pdf.sort_values("way_id").itertuples(index=False):
            xs = np.asarray(row.pxs, dtype=np.float64) * scale
            ys = np.asarray(row.pys, dtype=np.float64) * scale
            for i in range(len(xs) - 1):
                n = int(max(abs(xs[i + 1] - xs[i]), abs(ys[i + 1] - ys[i]))) + 1
                px = np.linspace(xs[i], xs[i + 1], n).round().astype(int)
                py = np.linspace(ys[i], ys[i + 1], n).round().astype(int)
                ok = (px >= 0) & (px < tile_size) & (py >= 0) & (py < tile_size)
                img[py[ok], px[ok]] = rgba
        png = _write_png_rgba(img)
        h = int.from_bytes(hashlib.md5(png).digest()[:8], "big") >> 1
        return pd.DataFrame(
            [{"z": z, "tx": tx, "ty": ty, "n_features": len(pdf),
              "content_hash": h, "png": png}]
        )

    return ways_px.groupBy("z", "tx", "ty").applyInPandas(render, schema=RASTER_SCHEMA)


def _polygon_mask(grp, tile_size: int, scale: float):
    """Boolean even-odd scanline fill mask for one feature's rings
    (raster-tile.ts:279-330). Crossing computation vectorized over
    (edges x scanlines); grp rows carry pxs/pys extent-space arrays."""
    import numpy as np

    mask = np.zeros((tile_size, tile_size), dtype=bool)
    scan = np.arange(tile_size, dtype=np.float64) + 0.5
    x1s, y1s, x2s, y2s = [], [], [], []
    for row in grp.itertuples(index=False):
        xs = np.asarray(row.pxs, dtype=np.float64) * scale
        ys = np.asarray(row.pys, dtype=np.float64) * scale
        x1s.append(xs[:-1]); y1s.append(ys[:-1])
        x2s.append(xs[1:]); y2s.append(ys[1:])
    if not x1s:
        return mask
    x1 = np.concatenate(x1s); y1 = np.concatenate(y1s)
    x2 = np.concatenate(x2s); y2 = np.concatenate(y2s)
    keep = y1 != y2  # horizontal edges never cross a scanline boundary pair
    x1, y1, x2, y2 = x1[keep], y1[keep], x2[keep], y2[keep]
    if not len(x1):
        return mask
    cross = ((y1[:, None] <= scan) & (scan < y2[:, None])) | (
        (y2[:, None] <= scan) & (scan < y1[:, None])
    )
    import numpy as _np

    with _np.errstate(divide="ignore", invalid="ignore"):
        xc = x1[:, None] + (scan - y1[:, None]) * ((x2 - x1)[:, None] / (y2 - y1)[:, None])
    for yi in range(tile_size):
        xs_cross = _np.sort(xc[cross[:, yi], yi])
        for j in range(0, len(xs_cross) - 1, 2):
            a = max(0, int(_np.ceil(xs_cross[j] - 0.5)))
            b = min(tile_size - 1, int(_np.floor(xs_cross[j + 1] - 0.5)))
            if b >= a:
                mask[yi, a : b + 1] = True
    return mask


def _polyline_mask(rows, tile_size: int, scale: float):
    """Boolean mask of all polyline pixels (linspace segment sampling)."""
    import numpy as np

    mask = np.zeros((tile_size, tile_size), dtype=bool)
    for row in rows:
        xs = np.asarray(row.pxs, dtype=np.float64) * scale
        ys = np.asarray(row.pys, dtype=np.float64) * scale
        for i in range(len(xs) - 1):
            n = int(max(abs(xs[i + 1] - xs[i]), abs(ys[i + 1] - ys[i]))) + 1
            px = np.linspace(xs[i], xs[i + 1], n).round().astype(int)
            py = np.linspace(ys[i], ys[i + 1], n).round().astype(int)
            ok = (px >= 0) & (px < tile_size) & (py >= 0) & (py < tile_size)
            mask[py[ok], px[ok]] = True
    return mask


def _blend(img, mask, rgba) -> None:
    """Source-over alpha compositing (raster-tile.ts compositing path),
    integer-exact: out = src*sa + dst*(255-sa), /255 rounded."""
    import numpy as np

    sr, sg, sb, sa = rgba
    dst = img[mask].astype(np.uint32)
    src = np.array([sr, sg, sb, 255], dtype=np.uint32)
    out = (src * sa + dst * (255 - sa) + 127) // 255
    img[mask] = out.astype(np.uint8)


def render_polygon_raster(rings_px: DataFrame, tile_size: int = 256,
                          rgba: tuple[int, int, int, int] = (120, 180, 90, 255)) -> DataFrame:
    """Scanline even-odd polygon fill (raster-tile.ts:279-330): fixed fill
    color keeps pixel writes idempotent, so feature order can't change the
    output bytes. rings_px: same shape as encode_polygon_mvt input."""

    def render(key, pdf: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        import numpy as np

        z, tx, ty = int(key[0]), int(key[1]), int(key[2])
        img = np.zeros((tile_size, tile_size, 4), dtype=np.uint8)
        scale = tile_size / mvt.EXTENT
        for _fid, grp in pdf.sort_values(["feature_id", "ring_index"]).groupby(
            "feature_id", sort=True
        ):
            img[_polygon_mask(grp, tile_size, scale)] = rgba
        png = _write_png_rgba(img)
        h = int.from_bytes(hashlib.md5(png).digest()[:8], "big") >> 1
        return pd.DataFrame(
            [{"z": z, "tx": tx, "ty": ty, "n_features": int(pdf["feature_id"].nunique()),
              "content_hash": h, "png": png}]
        )

    return rings_px.groupBy("z", "tx", "ty").applyInPandas(render, schema=RASTER_SCHEMA)


# ---------------------------------------------------------------------------
# composited raster tile (drawToRasterTile, osmix/src/raster.ts:43-100)
# ---------------------------------------------------------------------------

DEFAULT_AREA_RGBA = (0, 0, 255, 64)       # raster-tile.ts:29
DEFAULT_LINE_RGBA = (255, 255, 255, 230)  # raster-tile.ts:27
DEFAULT_POINT_RGBA = (255, 0, 0, 255)     # raster-tile.ts:28

_COMPOSITE_SCHEMA_STR = (
    "z int, tx long, ty long, kind string, fid long, ring_index int, "
    "role string, pxs array<int>, pys array<int>"
)


def composite_raster_inputs(points_px: DataFrame | None = None,
                            ways_px: DataFrame | None = None,
                            rings_px: DataFrame | None = None) -> DataFrame:
    """Union the three per-class tile inputs into one discriminated frame
    for render_composite_raster. points_px from point_tile_px; ways_px as
    encode_way_mvt; rings_px as encode_polygon_mvt."""
    frames = []
    if rings_px is not None:
        frames.append(rings_px.select(
            "z", "tx", "ty", F.lit("area").alias("kind"),
            F.col("feature_id").alias("fid"), "ring_index", "role", "pxs", "pys",
        ))
    if ways_px is not None:
        frames.append(ways_px.select(
            "z", "tx", "ty", F.lit("line").alias("kind"),
            F.col("way_id").alias("fid"), F.lit(0).alias("ring_index"),
            F.lit("").alias("role"), "pxs", "pys",
        ))
    if points_px is not None:
        frames.append(points_px.select(
            "z", "tx", "ty", F.lit("point").alias("kind"),
            F.col("id").alias("fid"), F.lit(0).alias("ring_index"),
            F.lit("").alias("role"),
            F.array(F.col("px")).alias("pxs"), F.array(F.col("py")).alias("pys"),
        ))
    if not frames:
        raise ValueError("at least one feature class required")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def render_composite_raster(features: DataFrame, tile_size: int = 256,
                            area_rgba=DEFAULT_AREA_RGBA,
                            line_rgba=DEFAULT_LINE_RGBA,
                            point_rgba=DEFAULT_POINT_RGBA) -> DataFrame:
    """The reference's default raster tile (drawToRasterTile): areas filled
    first (low-alpha blue), then lines (semi-transparent white), then
    points (opaque red), source-over composited. Deterministic: painter's
    order is fixed by class, and within a class every feature blends the
    same color, so overlap order cannot change the result.

    features: output of composite_raster_inputs.
    """

    def render(key, pdf: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        import numpy as np

        z, tx, ty = int(key[0]), int(key[1]), int(key[2])
        img = np.zeros((tile_size, tile_size, 4), dtype=np.uint8)
        scale = tile_size / mvt.EXTENT
        areas = pdf[pdf["kind"] == "area"]
        for _fid, grp in areas.sort_values(["fid", "ring_index"]).groupby("fid", sort=True):
            _blend(img, _polygon_mask(grp, tile_size, scale), area_rgba)
        lines = pdf[pdf["kind"] == "line"]
        if len(lines):
            _blend(img, _polyline_mask(
                lines.sort_values("fid").itertuples(index=False), tile_size, scale
            ), line_rgba)
        points = pdf[pdf["kind"] == "point"]
        if len(points):
            xs = np.array([p[0] for p in points["pxs"]], dtype=np.float64)
            ys = np.array([p[0] for p in points["pys"]], dtype=np.float64)
            xi = (xs * scale).astype(int).clip(0, tile_size - 1)
            yi = (ys * scale).astype(int).clip(0, tile_size - 1)
            mask = np.zeros((tile_size, tile_size), dtype=bool)
            mask[yi, xi] = True
            _blend(img, mask, point_rgba)
        png = _write_png_rgba(img)
        h = int.from_bytes(hashlib.md5(png).digest()[:8], "big") >> 1
        return pd.DataFrame(
            [{"z": z, "tx": tx, "ty": ty, "n_features": int(pdf["fid"].nunique()),
              "content_hash": h, "png": png}]
        )

    return features.groupBy("z", "tx", "ty").applyInPandas(render, schema=RASTER_SCHEMA)


# ---------------------------------------------------------------------------
# feature x covering-tile explode (the distributed tile cover, §3.3 step 3)
# ---------------------------------------------------------------------------


def way_tile_px(ways: DataFrame, nodes: DataFrame, z: int,
                extent: int = mvt.EXTENT) -> DataFrame:
    """ways(id, refs array<long>) + nodes(id, lon, lat) -> one row per
    (way, covering tile at z) with extent-space vertex arrays — the input
    shape of encode_way_mvt / render_line_raster.

    Plan shape: ONE equi-join (J1 way->node resolution), tile fractions
    computed once per way (transform over the coord arrays — materialized
    as columns BEFORE the tile explode so the trig never re-runs per
    tile), then a bounded sequence-explode over the way's bbox tile range
    (bboxToTileRange, geo/src/tile.ts:66-79).
    """
    refs = ways.select(F.col("id").alias("way_id"),
                       F.posexplode("refs").alias("seq", "ref"))
    coords = (
        refs.join(nodes.select(F.col("id").alias("ref"), "lon", "lat"), "ref")
        .groupBy("way_id")
        .agg(F.array_sort(F.collect_list(F.struct("seq", "lon", "lat"))).alias("s"))
        .select("way_id", F.col("s.lon").alias("lons"), F.col("s.lat").alias("lats"))
    )
    zc = F.lit(z)
    proj = coords.select(
        "way_id",
        F.transform("lons", lambda v: geo.tile_x_fraction(v, zc)).alias("xfs"),
        F.transform("lats", lambda v: geo.tile_y_fraction(v, zc)).alias("yfs"),
    )
    exploded = (
        proj.withColumn(
            "tx", F.explode(F.sequence(
                F.floor(F.array_min("xfs")).cast("long"),
                F.floor(F.array_max("xfs")).cast("long"),
            ))
        )
        .withColumn(
            "ty", F.explode(F.sequence(
                F.floor(F.array_min("yfs")).cast("long"),
                F.floor(F.array_max("yfs")).cast("long"),
            ))
        )
    )
    return exploded.select(
        F.lit(z).cast("int").alias("z"), "tx", "ty", "way_id",
        F.transform("xfs", lambda v: F.round((v - F.col("tx")) * extent).cast("int")).alias("pxs"),
        F.transform("yfs", lambda v: F.round((v - F.col("ty")) * extent).cast("int")).alias("pys"),
    )


def ring_tile_px(rings: DataFrame, z: int, extent: int = mvt.EXTENT) -> DataFrame:
    """rings (relation_id, ring_index, role, lons, lats — the output of
    rings.assemble_relation_rings) -> one row per (ring, covering tile of
    the FEATURE bbox) in extent space — the input of encode_polygon_mvt /
    render_polygon_raster. All rings of a feature replicate to every tile
    the feature's bbox covers, so holes fill correctly in every tile."""
    zc = F.lit(z)
    proj = rings.select(
        F.col("relation_id").alias("feature_id"), "ring_index", "role",
        F.transform("lons", lambda v: geo.tile_x_fraction(v, zc)).alias("xfs"),
        F.transform("lats", lambda v: geo.tile_y_fraction(v, zc)).alias("yfs"),
    )
    bounds = proj.groupBy("feature_id").agg(
        F.floor(F.min(F.array_min("xfs"))).cast("long").alias("tx0"),
        F.floor(F.max(F.array_max("xfs"))).cast("long").alias("tx1"),
        F.floor(F.min(F.array_min("yfs"))).cast("long").alias("ty0"),
        F.floor(F.max(F.array_max("yfs"))).cast("long").alias("ty1"),
    )
    exploded = (
        proj.join(bounds, "feature_id")
        .withColumn("tx", F.explode(F.sequence("tx0", "tx1")))
        .withColumn("ty", F.explode(F.sequence("ty0", "ty1")))
    )
    return exploded.select(
        F.lit(z).cast("int").alias("z"), "tx", "ty", "feature_id", "ring_index", "role",
        F.transform("xfs", lambda v: F.round((v - F.col("tx")) * extent).cast("int")).alias("pxs"),
        F.transform("yfs", lambda v: F.round((v - F.col("ty")) * extent).cast("int")).alias("pys"),
    )


# ---------------------------------------------------------------------------
# decoded tile statistics — SQL-checkable invariants of the tile tables
# (the driver oracle recomputes the same aggregates from raw tile math, so a
# green hash proves the encode->decode path bit-exactly: projection,
# rounding, clamping, cleanCoords, zigzag/delta codec)
# ---------------------------------------------------------------------------

MVT_STATS_SCHEMA = T.StructType(
    [
        T.StructField("z", T.IntegerType(), False),
        T.StructField("tx", T.LongType(), False),
        T.StructField("ty", T.LongType(), False),
        T.StructField("n_features", T.LongType(), False),
        T.StructField("n_vertices", T.LongType(), False),
        T.StructField("sum_px", T.LongType(), False),
        T.StructField("sum_py", T.LongType(), False),
        T.StructField("min_px", T.LongType(), False),
        T.StructField("max_px", T.LongType(), False),
        T.StructField("min_py", T.LongType(), False),
        T.StructField("max_py", T.LongType(), False),
        T.StructField("sum_ids", T.LongType(), False),
    ]
)


def mvt_decoded_stats(tiles: DataFrame, layer: str) -> DataFrame:
    """Decode each materialized tile's protobuf bytes (functions/mvt
    decoder) and emit per-tile aggregates over the DECODED vertices."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                feats = mvt.decode_tile(bytes(r.tile)).get(layer, [])
                xs: list[int] = []
                ys: list[int] = []
                sum_ids = 0
                for f in feats:
                    sum_ids += int(f["id"] or 0)
                    for part in f["geometry"]:
                        for x, y in part:
                            xs.append(int(x))
                            ys.append(int(y))
                if not feats:
                    continue
                rows.append(
                    {
                        "z": int(r.z), "tx": int(r.tx), "ty": int(r.ty),
                        "n_features": len(feats), "n_vertices": len(xs),
                        "sum_px": sum(xs), "sum_py": sum(ys),
                        "min_px": min(xs), "max_px": max(xs),
                        "min_py": min(ys), "max_py": max(ys),
                        "sum_ids": sum_ids,
                    }
                )
            if rows:
                yield pd.DataFrame(rows, columns=[f.name for f in MVT_STATS_SCHEMA.fields])

    return tiles.select("z", "tx", "ty", "tile").mapInPandas(stats, schema=MVT_STATS_SCHEMA)


RASTER_STATS_SCHEMA = T.StructType(
    [
        T.StructField("z", T.IntegerType(), False),
        T.StructField("tx", T.LongType(), False),
        T.StructField("ty", T.LongType(), False),
        T.StructField("n_features", T.LongType(), False),
        T.StructField("n_pixels", T.LongType(), False),
        T.StructField("sum_x", T.LongType(), False),
        T.StructField("sum_y", T.LongType(), False),
    ]
)


def _read_png_rgba(data: bytes):
    """Decode a PNG written by _write_png_rgba (RGBA8, filter 0 scanlines)
    back into an (h, w, 4) uint8 array — pure stdlib zlib + NumPy."""
    import struct
    import zlib

    import numpy as np

    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    i = 8
    w = h = 0
    idat = bytearray()
    while i < len(data):
        (ln,) = struct.unpack(">I", data[i : i + 4])
        typ = data[i + 4 : i + 8]
        payload = data[i + 8 : i + 8 + ln]
        if typ == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack(">IIBB", payload[:10])
            assert bit_depth == 8 and color_type == 6, "RGBA8 only"
        elif typ == b"IDAT":
            idat += payload
        i += 12 + ln
    raw = zlib.decompress(bytes(idat))
    stride = w * 4 + 1
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    assert (arr[:, 0] == 0).all(), "filter-0 scanlines only"
    return arr[:, 1:].reshape(h, w, 4)


def raster_pixel_stats(tiles: DataFrame) -> DataFrame:
    """Decode each raster tile's PNG and emit per-tile lit-pixel aggregates
    (alpha > 0): count plus coordinate sums — the SQL-checkable shadow of
    the rasterization."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = _read_png_rgba(bytes(r.png))
                ys, xs = np.nonzero(img[:, :, 3] > 0)
                rows.append(
                    {
                        "z": int(r.z), "tx": int(r.tx), "ty": int(r.ty),
                        "n_features": int(r.n_features),
                        "n_pixels": int(len(xs)),
                        "sum_x": int(xs.sum()), "sum_y": int(ys.sum()),
                    }
                )
            if rows:
                yield pd.DataFrame(rows, columns=[f.name for f in RASTER_STATS_SCHEMA.fields])

    return tiles.select("z", "tx", "ty", "n_features", "png").mapInPandas(
        stats, schema=RASTER_STATS_SCHEMA
    )
