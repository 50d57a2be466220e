"""Property-based tests (hypothesis) for the pure kernels — codec
round-trips and algebraic invariants that must hold for ALL inputs, not
just fixtures. No SparkSession needed; these run in milliseconds."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from osmix_spark.functions import mvt
from osmix_spark.operators import rings as rings_op

coord = st.integers(min_value=-(mvt.BUFFER_PX), max_value=mvt.EXTENT + mvt.BUFFER_PX)
point = st.tuples(coord, coord)


@given(st.lists(point, min_size=1, max_size=20))
@settings(max_examples=200)
def test_mvt_point_feature_roundtrip(pts):
    feats = [
        {"id": i, "type": mvt.GEOM_POINT, "geometry": [[p]], "tags": {}}
        for i, p in enumerate(pts)
    ]
    out = mvt.decode_tile(mvt.encode_tile({"l": feats}))["l"]
    assert [f["geometry"][0][0] for f in out] == pts


@given(st.lists(point, min_size=2, max_size=50))
@settings(max_examples=200)
def test_mvt_linestring_roundtrip(pts):
    # MVT delta-encoding collapses zero-length moves; feed deduped input
    deduped = [p for i, p in enumerate(pts) if i == 0 or p != pts[i - 1]]
    if len(deduped) < 2:
        return
    feats = [{"id": 1, "type": mvt.GEOM_LINESTRING, "geometry": [deduped], "tags": {}}]
    out = mvt.decode_tile(mvt.encode_tile({"l": feats}))["l"]
    assert out[0]["geometry"][0] == deduped


@given(st.dictionaries(st.text(max_size=20), st.one_of(
    st.text(max_size=20), st.integers(min_value=-(2**31), max_value=2**31 - 1)),
    max_size=8))
@settings(max_examples=200)
def test_mvt_tags_roundtrip(tags):
    feats = [{"id": 1, "type": mvt.GEOM_POINT, "geometry": [[(0, 0)]], "tags": tags}]
    out = mvt.decode_tile(mvt.encode_tile({"l": feats}))["l"]
    assert out[0]["tags"] == tags


@given(st.lists(st.tuples(
    st.floats(min_value=-180, max_value=180, allow_nan=False),
    st.floats(min_value=-85, max_value=85, allow_nan=False)),
    min_size=3, max_size=12, unique=True))
@settings(max_examples=200)
def test_ring_winding_involution(body):
    ring = body + [body[0]]
    area = rings_op.ring_area_signed(ring)
    # skip numerically-degenerate rings: when |area| is at cancellation
    # scale, reversal/rotation changes the float summation order enough to
    # collapse it to 0.0 (seen with subnormal-magnitude coordinates) —
    # winding is undefined there
    mag = max(max(abs(x), abs(y)) for x, y in body) + 1.0
    if abs(area) <= 1e-9 * mag * mag:
        return
    ccw = rings_op.ensure_winding(ring, clockwise=False)
    cw = rings_op.ensure_winding(ring, clockwise=True)
    assert rings_op.ring_area_signed(ccw) > 0
    assert rings_op.ring_area_signed(cw) < 0
    # idempotent
    assert rings_op.ensure_winding(ccw, clockwise=False) == ccw
    # canonical rotation preserves orientation and vertex multiset
    canon = rings_op.canonical_ring(ccw)
    assert sorted(canon[:-1]) == sorted(ccw[:-1])
    assert rings_op.ring_area_signed(canon) > 0
    assert canon[0] == min(canon[:-1])


@given(st.integers(min_value=-(2**30), max_value=2**30))
@settings(max_examples=500)
def test_zigzag_roundtrip(v):
    z = mvt._zigzag(v)
    assert z >= 0
    assert mvt._unzigzag(z) == v


@given(st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2**40),  # feature id
        st.lists(st.tuples(st.integers(min_value=-64, max_value=4160),
                           st.integers(min_value=-64, max_value=4160)),
                 min_size=2, max_size=8),
    ),
    min_size=1, max_size=10))
@settings(max_examples=100)
def test_vectorized_line_encoder_matches_scalar(feats_in):
    import numpy as np

    feats = [{"id": fid, "type": mvt.GEOM_LINESTRING, "geometry": [pts], "tags": {}}
             for fid, pts in feats_in]
    scalar = mvt.encode_tile({"ways": feats})
    ids = [f for f, _ in feats_in]
    lens = [len(p) for _, p in feats_in]
    xs = np.array([x for _, pts in feats_in for x, _ in pts], dtype=np.int64)
    ys = np.array([y for _, pts in feats_in for _, y in pts], dtype=np.int64)
    vec = mvt._len_delim(3, mvt.encode_lines_layer_np("ways", ids, xs, ys, lens))
    assert vec == scalar
    # and the vectorized stats decoder agrees with the scalar decode
    s = mvt.decode_tile_stats_np(scalar)["ways"]
    allx = [x for _, pts in feats_in for x, _ in pts]
    ally = [y for _, pts in feats_in for _, y in pts]
    assert s["n_features"] == len(feats_in)
    assert s["n_vertices"] == len(allx)
    assert s["sum_px"] == sum(allx) and s["sum_py"] == sum(ally)
    assert s["min_px"] == min(allx) and s["max_py"] == max(ally)
    assert s["sum_ids"] == sum(ids)


@given(st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2**40),
        st.lists(  # rings: open bodies of >= 3 vertices
            st.lists(st.tuples(st.integers(min_value=-64, max_value=4160),
                               st.integers(min_value=-64, max_value=4160)),
                     min_size=3, max_size=6),
            min_size=1, max_size=3),
    ),
    min_size=1, max_size=6))
@settings(max_examples=100)
def test_vectorized_polygon_encoder_matches_scalar(feats_in):
    import numpy as np  # noqa: F401

    feats = []
    ids, rl, rpf, xs, ys = [], [], [], [], []
    for fid, rings in feats_in:
        closed = [ring + [ring[0]] for ring in rings]
        feats.append({"id": fid, "type": mvt.GEOM_POLYGON,
                      "geometry": closed, "tags": {}})
        ids.append(fid)
        rpf.append(len(rings))
        for ring in rings:
            rl.append(len(ring))
            xs.extend(p[0] for p in ring)
            ys.extend(p[1] for p in ring)
    scalar = mvt.encode_tile({"areas": feats})
    vec = mvt._len_delim(3, mvt.layer_wrap(
        "areas", mvt.encode_polygon_frames_np(ids, xs, ys, rl, rpf)))
    assert vec == scalar


@given(
    st.lists(st.integers(min_value=0, max_value=255), min_size=4, max_size=4),
)
@settings(max_examples=30, deadline=None)
def test_jpeg_block_constant_roundtrip_exact(vals):
    """Property: ANY 16x16 gray image whose four 8x8 blocks are constant
    round-trips bit-exactly through the baseline JPEG codec at quality 75
    (the DC quantizer equals the constant-block DCT gain) — the exactness
    contract the SQL oracles rely on."""
    import numpy as np

    from osmix_spark.functions import jpeg

    img = np.zeros((16, 16), dtype=np.uint8)
    img[:8, :8], img[:8, 8:], img[8:, :8], img[8:, 8:] = vals
    dec = jpeg.decode_baseline(jpeg.encode_baseline(img, quality=75))
    assert (dec[:, :, 0] == img).all()


@given(
    st.integers(min_value=1, max_value=100),
    st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=20, deadline=None)
def test_jpeg_arbitrary_roundtrip_bounded(quality, seed):
    """Property: arbitrary content decodes without error and with bounded
    per-pixel error at high quality."""
    import numpy as np

    from osmix_spark.functions import jpeg

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    dec = jpeg.decode_baseline(jpeg.encode_baseline(img, quality=quality))
    assert dec.shape == (16, 16, 3)
    if quality >= 95:
        err = np.abs(dec.astype(int) - img.astype(int)).mean()
        assert err < 8.0


def test_adjacent_member_fold_matches_reference_model(spark):
    """The Spark array-fold in rewrite_relation_members must agree with a
    direct Python port of removeDuplicateAdjacentRelationMembers
    (utils.ts:62-80) on pseudo-random member lists — including null roles
    (undefined === undefined keeps the pair foldable) and duplicates
    separated by other members (kept)."""
    import random

    from osmix_spark.operators import merge
    from osmix_spark.sources import fixtures

    rng = random.Random(42)
    rows = []
    expected = {}
    for rid in range(40):
        n = rng.randint(0, 10)
        members = [
            (rng.choice(["node", "way"]), rng.randint(1, 4),
             rng.choice(["outer", "inner", None]))
            for _ in range(n)
        ]
        # reference filter: keep member when the NEXT differs (equivalent to
        # one-per-run for maximal runs)
        kept = [
            m for i, m in enumerate(members)
            if i + 1 >= len(members) or m != members[i + 1]
        ]
        rows.append((rid, members, None))
        expected[rid] = kept
    rels = spark.createDataFrame(rows, fixtures.RELATION_SCHEMA)
    out = merge.rewrite_relation_members(rels)
    got = {r["id"]: [tuple(m) for m in r["members"]] for r in out.collect()}
    assert got == expected
