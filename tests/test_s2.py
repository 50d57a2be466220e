"""S2 cell index: NumPy vs independent recursive reference, Spark vs
NumPy, DuckDB oracle vs NumPy, hierarchy/range invariants."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from osmix_spark.functions import s2
from osmix_spark.sources import synth


def _hilbert_pos_slow(face: int, i: int, j: int) -> int:
    """Bit-at-a-time Hilbert position — independent of the lookup tables."""
    pos, orient = 0, face & 1
    for L in range(s2.MAX_LEVEL - 1, -1, -1):
        ij = (((i >> L) & 1) << 1) | ((j >> L) & 1)
        index = s2._POS_TO_IJ[orient].index(ij)
        pos = (pos << 2) | index
        orient ^= s2._POS_TO_ORIENT[index]
    return pos


def _rand_lonlat(n=500, seed=7):
    rng = np.random.default_rng(seed)
    lon = rng.uniform(-180, 180, n)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))  # uniform on sphere
    return lon, lat


def test_lookup_hilbert_matches_recursive_reference():
    lon, lat = _rand_lonlat()
    face, u, v = s2._face_uv_np(*s2._xyz_from_lonlat(lon, lat))
    i = s2._ij_from_st_np(s2._st_from_uv_np(u))
    j = s2._ij_from_st_np(s2._st_from_uv_np(v))
    fast = s2._pos_from_faceij_np(face, i, j)
    slow = np.array([
        _hilbert_pos_slow(int(f), int(a), int(b))
        for f, a, b in zip(face, i, j)
    ])
    assert (fast == slow).all()


def test_known_canonical_id_origin():
    # S2CellId::FromLatLng(0, 0) == 0x1000000000000001 (face 0, first
    # Hilbert crumb of the (+,+) quadrant) — fixed point of the spec
    assert int(s2.s2_id_np(np.array([0.0]), np.array([0.0]), 30)[0]) \
        == 0x1000000000000001
    assert s2.s2_token_np(s2.s2_id_np(np.array([0.0]), np.array([0.0]), 30)) \
        == ["1000000000000001"]


def test_faces_cover_and_keys_in_range():
    lon, lat = _rand_lonlat(4000)
    for level in (0, 4, 12, 30):
        key = s2.s2_cell_np(lon, lat, level)
        face = key >> (2 * level)
        assert set(np.unique(face)) <= set(range(6))
        assert (key >= 0).all() and (key < 6 << (2 * level)).all()
    # every face appears with 4k sphere-uniform samples
    assert len(np.unique(s2.s2_cell_np(lon, lat, 0))) == 6


def test_parent_child_and_range_invariants():
    lon, lat = _rand_lonlat(1000)
    k12 = s2.s2_cell_np(lon, lat, 12)
    k8 = s2.s2_cell_np(lon, lat, 8)
    assert (s2.s2_parent_np(k12, 4) == k8).all()
    lo, hi = s2.s2_range_np(int(k8[0]), 8, 12)
    inside = k12[k8 == k8[0]]
    assert ((inside >= lo) & (inside <= hi)).all()
    # range is exactly the 4^4 children
    assert hi - lo + 1 == 4 ** 4


def test_center_roundtrip():
    lon, lat = _rand_lonlat(800, seed=11)
    for level in (6, 12, 20, 30):
        key = s2.s2_cell_np(lon, lat, level)
        clon, clat = s2.s2_cell_center_np(key, level)
        key2 = s2.s2_cell_np(clon, clat, level)
        assert (key2 == key).all()


def test_hilbert_locality_beats_random():
    # adjacent cells along a small ground path should mostly be close in
    # key space — sanity check that the curve is actually Hilbert, not Z
    lon = np.linspace(10.0, 10.01, 200)
    lat = np.full(200, 45.0)
    key = s2.s2_cell_np(lon, lat, 20)
    jumps = np.abs(np.diff(np.unique(key)))
    assert np.median(jumps) <= 4


def test_edge_neighbors_symmetric_and_distinct():
    lon, lat = _rand_lonlat(300, seed=3)
    # force face-edge and near-corner cells into the sample
    lon = np.concatenate([lon, [44.9999, 45.0001, -135.0, 0.0, 90.0]])
    lat = np.concatenate([lat, [0.0, 35.2644, 35.2644, 89.9, -89.9]])
    for level in (2, 7, 12):
        keys = np.unique(s2.s2_cell_np(lon, lat, level))
        nbrs = s2.s2_edge_neighbors_np(keys, level)
        for row, k in enumerate(keys):
            ns = nbrs[row]
            assert k not in ns
            assert len(set(ns.tolist())) == 4
            # symmetry: k is an edge neighbor of each of its neighbors
            for nb in ns:
                back = s2.s2_edge_neighbors_np(np.array([nb]), level)[0]
                assert k in back, (level, int(k), int(nb))


def test_cover_bbox_is_superset():
    west, south, east, north = -122.5, 37.2, -121.7, 38.1
    for level in (5, 8, 10):
        cover = set(s2.s2_cover_bbox(west, south, east, north, level))
        rng = np.random.default_rng(5)
        lon = rng.uniform(west, east, 5000)
        lat = rng.uniform(south, north, 5000)
        inside = set(s2.s2_cell_np(lon, lat, level).tolist())
        assert inside <= cover, f"level {level}: missing {inside - cover}"
    # covering stays proportionate (superset, not the planet)
    assert len(s2.s2_cover_bbox(west, south, east, north, 10)) < 4000


def test_cover_bbox_antimeridian():
    cover = set(s2.s2_cover_bbox(179.0, -10.0, -179.0, 10.0, 6))
    rng = np.random.default_rng(9)
    lon = np.where(rng.uniform(size=2000) < 0.5,
                   rng.uniform(179.0, 180.0, 2000),
                   rng.uniform(-180.0, -179.0, 2000))
    lat = rng.uniform(-10.0, 10.0, 2000)
    assert set(s2.s2_cell_np(lon, lat, 6).tolist()) <= cover


def test_s2_partitioned_layout_prunes(spark, sf_dir, tmp_path):
    """S2-layout twin of test_cell_partitioned_layout_prunes: planning-time
    partition pruning via the covering, byte-exact results via refine."""
    from pyspark.sql import functions as F

    from osmix_spark.sources import layout

    pts = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").alias("id"),
        ((F.col("doc_id") * 37 % 340) - 170.0 + 0.5).alias("lon"),
        ((F.col("doc_id") * 91 % 140) - 70.0 + 0.5).alias("lat"),
    )
    path = str(tmp_path / "s2cells")
    layout.write_s2_partitioned(pts, path, level=4)

    full = spark.read.parquet(path)
    pruned = layout.read_bbox_s2(spark, path, -1.0, -1.0, 6.0, 6.0, level=4)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [s2_p" in plan

    def n_files(df):
        return df.select(F.input_file_name()).distinct().count()

    assert n_files(pruned) < n_files(full) / 4
    expect = pts.filter(
        (F.col("lon") >= -1.0) & (F.col("lon") <= 6.0)
        & (F.col("lat") >= -1.0) & (F.col("lat") <= 6.0)
    ).count()
    assert pruned.count() == expect


def test_spark_matches_numpy_and_duckdb(spark, sf_dir):
    from osmix_spark.queries import EXTRA_ORACLES, EXTRA_QUERIES

    sdf = EXTRA_QUERIES["geo_s2_cell_assign"](spark, sf_dir).toPandas()
    ids = sdf["doc_id"].to_numpy()
    lon = synth_lon(ids)
    lat = synth_lat(ids)
    np_key = s2.s2_cell_np(lon, lat, 12)
    got = sdf.sort_values("doc_id")
    want = np_key[np.argsort(ids)]
    assert (got["s2_key"].to_numpy() == want).all()
    assert (got["s2_parent"].to_numpy() == want >> 8).all()

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    odf = con.sql(EXTRA_ORACLES["geo_s2_cell_assign"]).df().sort_values("doc_id")
    con.close()
    assert (odf["s2_key"].to_numpy() == want).all()


def synth_lon(ids: np.ndarray) -> np.ndarray:
    cid = ((ids * ids + 3) % 17) % synth.NUM_CLUSTERS
    return (synth.CENTROID_LON + cid.astype(float) * synth.CLUSTER_STEP_LON
            + ((ids * 9973) % 2000).astype(float) / synth.JITTER_SCALE)


def synth_lat(ids: np.ndarray) -> np.ndarray:
    cid = ((ids * ids + 3) % 17) % synth.NUM_CLUSTERS
    return (synth.CENTROID_LAT + (cid % 3).astype(float) * synth.CLUSTER_STEP_LAT
            + ((ids * 7919) % 2000).astype(float) / synth.JITTER_SCALE)
