"""GIF codec (functions/gif) + multimodal integration.

The encoder and decoder are pinned against each other (round-trip over
palette sizes, interlace, width growth, 4096-entry table reset), against
EXTERNALLY-authored canonical bytes (the smallest published GIF89a), and
against hand-built containers (local color table, disposal methods) the
encoder never writes — so a matching encoder/decoder bug cannot hide.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from osmix_spark.functions import gif

PAL256 = (np.arange(256 * 3, dtype=np.int64).reshape(256, 3) * 37 % 256).astype(
    np.uint8
)


# ---------------------------------------------------------------------------
# LZW + container round-trip
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ncol", [2, 4, 16, 64, 256])
@pytest.mark.parametrize("interlace", [False, True])
def test_roundtrip_palette_sizes(ncol, interlace):
    rng = np.random.RandomState(ncol)
    pal = PAL256[:ncol]
    for shape in ((1, 1), (3, 5), (16, 16), (40, 17)):
        idx = rng.randint(0, ncol, size=shape).astype(np.uint8)
        img = gif.decode_gif(gif.encode_gif([idx], pal, interlace=interlace))
        assert img.shape == (*shape, 4)
        assert (img[:, :, :3] == pal[idx]).all()
        assert (img[:, :, 3] == 255).all()


def test_roundtrip_forces_width_growth_and_table_reset():
    # 300*256 = 76,800 pixels of a repeating ramp: the LZW table hits 4096
    # entries (clear + reset) several times and every width 9..12 is used
    idx = np.tile(np.arange(256, dtype=np.uint8), 300).reshape(300, 256)
    img = gif.decode_gif(gif.encode_gif([idx], PAL256))
    assert (img[:, :, :3] == PAL256[idx]).all()


def test_lzw_kwkwk_case():
    # "ababab..." over a 2-symbol alphabet exercises code == next_code
    idx = np.array([0, 1] * 40, dtype=np.uint8)
    out = gif.lzw_decode(gif.lzw_encode(idx, 2), 2, idx.size)
    assert (out == idx).all()


def test_constant_raster_compresses():
    idx = np.zeros((200, 200), dtype=np.uint8)
    data = gif.encode_gif([idx], PAL256)
    assert len(data) < 2000  # 40k pixels -> ~1KB: LZW is really compressing
    assert (gif.decode_gif(data)[:, :, :3] == PAL256[0]).all()


# ---------------------------------------------------------------------------
# external / hand-built bytes (decoder-only evidence)
# ---------------------------------------------------------------------------

def test_canonical_minimal_gif89a():
    """The widely published smallest valid GIF89a: 1x1 white pixel.
    Authored outside this repo, so encoder and decoder cannot share a
    bug through it."""
    data = bytes.fromhex(
        "474946383961010001008000"
        "00ffffff00000021f90400000000002c00000000010001000002024401003b"
    )
    img = gif.decode_gif(data)
    assert img.shape == (1, 1, 4)
    assert tuple(img[0, 0]) == (255, 255, 255, 255)


def test_local_color_table_and_gif87a():
    """Hand-built GIF87a whose image carries a LOCAL color table that
    inverts the global one — the encoder never writes LCTs, so this pins
    the decoder path independently."""
    w = h = 2
    gct = bytes([0, 0, 0, 10, 20, 30])  # 2 colors
    lct = bytes([255, 255, 255, 200, 100, 50])
    lzw = gif.lzw_encode(np.array([0, 1, 1, 0], dtype=np.uint8), 2)
    data = (
        b"GIF87a"
        + struct.pack("<HHBBB", w, h, 0x80 | 0x00, 0, 0)  # GCT, 2 colors
        + gct
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, w, h, 0x80 | 0x00)  # LCT, 2 colors
        + lct
        + bytes([2])
        + gif._sub_blocks(lzw)
        + b"\x3b"
    )
    img = gif.decode_gif(data)
    assert tuple(img[0, 0, :3]) == (255, 255, 255)  # LCT color 0, not GCT's
    assert tuple(img[0, 1, :3]) == (200, 100, 50)


def test_sub_rect_frame_composites_onto_canvas():
    """Hand-built: a 4x4 canvas, first frame full red, second image block
    a 2x2 green rect at (left=1, top=2) — the decoder must place it."""
    pal = np.array([[255, 0, 0], [0, 255, 0]], dtype=np.uint8)
    full = gif.encode_gif([np.zeros((4, 4), dtype=np.uint8)], pal)
    assert full.endswith(b"\x3b")
    body = bytearray(full[:-1])
    sub = gif.lzw_encode(np.full(4, 1, dtype=np.uint8), 2)
    body += b"\x2c" + struct.pack("<HHHHB", 1, 2, 2, 2, 0)
    body += bytes([2]) + gif._sub_blocks(sub) + b"\x3b"
    frames, w, h = gif.gif_frames(bytes(body))
    assert len(frames) == 2 and (w, h) == (4, 4)
    f1 = frames[1]
    assert tuple(f1[2, 1, :3]) == (0, 255, 0)
    assert tuple(f1[3, 2, :3]) == (0, 255, 0)
    assert tuple(f1[0, 0, :3]) == (255, 0, 0)  # untouched canvas keeps red


# ---------------------------------------------------------------------------
# animation semantics
# ---------------------------------------------------------------------------

def test_transparency_keeps_underlying_pixel():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]],
                   dtype=np.uint8)
    f0 = np.zeros((8, 8), dtype=np.uint8)
    f1 = np.full((8, 8), 1, dtype=np.uint8)
    f1[0, 0] = 3  # transparent index
    frames, _, _ = gif.gif_frames(
        gif.encode_gif([f0, f1], pal, transparent=3, disposal=1)
    )
    assert tuple(frames[1][0, 0, :3]) == (255, 0, 0)  # shows through
    assert tuple(frames[1][1, 1, :3]) == (0, 255, 0)


def test_disposal_restore_to_background():
    """Disposal 2 clears the frame's rect to transparent before the next
    frame; a transparent pixel in frame 3 then shows NOTHING (alpha 0),
    not frame 2's color."""
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]],
                   dtype=np.uint8)
    f0 = np.zeros((4, 4), dtype=np.uint8)
    f1 = np.full((4, 4), 1, dtype=np.uint8)
    f2 = np.full((4, 4), 3, dtype=np.uint8)  # fully transparent frame
    frames, _, _ = gif.gif_frames(
        gif.encode_gif([f0, f1, f2], pal, transparent=3, disposal=2)
    )
    assert frames[2][:, :, 3].max() == 0  # restored-to-background = cleared


def test_disposal_restore_to_previous():
    """Disposal 3 on the MIDDLE frame only: after it is shown, the canvas
    snaps back to what preceded it."""
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]],
                   dtype=np.uint8)
    f0 = np.zeros((4, 4), dtype=np.uint8)
    f1 = np.full((4, 4), 1, dtype=np.uint8)
    f2 = np.full((4, 4), 3, dtype=np.uint8)  # transparent: reveals canvas
    data = gif.encode_gif([f0, f1, f2], pal, transparent=3,
                          disposal=[1, 3, 1])
    frames, _, _ = gif.gif_frames(data)
    assert tuple(frames[1][0, 0, :3]) == (0, 255, 0)  # f1 shows green
    # f1's disposal 3 restored frame 0's red before the all-transparent
    # frame 2 — so frame 2 shows red, not green
    assert tuple(frames[2][0, 0, :3]) == (255, 0, 0)


def test_decoder_rejects_corrupt_streams():
    pal = PAL256[:4]
    good = gif.encode_gif([np.zeros((4, 4), dtype=np.uint8)], pal)
    with pytest.raises(ValueError):
        gif.decode_gif(good[:15])  # truncated mid-container
    with pytest.raises(ValueError):
        gif.decode_gif(b"NOTG" + good[4:])
    with pytest.raises(ValueError):
        # out-of-range LZW code: mcs says 2 bits of alphabet but the
        # stream immediately references code 200
        bad = bytearray(good)
        i = bad.index(0x2C)
        bad[i + 10] = 7  # min code size -> alphabet 128, code table shifts
        gif.decode_gif(bytes(bad))
    with pytest.raises(ValueError):
        gif.gif_frames(good[:-1] + b"\x00")  # trailer replaced


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------

def test_decode_media_routes_gif(spark):
    """decode_media sniffs GIF and emits first-frame RGBA means; exact
    because GIF is lossless."""
    from pyspark.sql import functions as F

    from osmix_spark.operators import multimodal as mm

    ids = spark.range(6).select(F.col("id").alias("media_id"))
    media = mm.synth_gif_media(ids, size=16, n_frames=1, ncolors=64)
    got = {
        r["media_id"]: r
        for r in mm.decode_media(media).collect()
    }
    x = np.arange(16, dtype=np.int64)[None, :]
    y = np.arange(16, dtype=np.int64)[:, None]
    i = np.arange(64, dtype=np.int64)
    pal = np.stack([(5 * i) % 256, (11 * i) % 256, (23 * i) % 256], -1)
    for mid in range(6):
        idx = (x + 3 * y + mid) % 64
        expect = pal[idx].reshape(-1, 3).mean(axis=0)
        row = got[mid]
        assert (row["width"], row["height"]) == (16, 16)
        feats = np.array(row["features"])
        np.testing.assert_allclose(feats[:3], expect, rtol=1e-6)
        assert feats[3] == 255.0


def test_sample_video_frames_mixed_mjpg_and_gif(spark):
    """One media table mixing MJPG containers and animated GIFs: frame
    sampling routes per-row and both decode for real."""
    from pyspark.sql import functions as F

    from osmix_spark.operators import multimodal as mm

    ids = spark.range(4).select(F.col("id").alias("media_id"))
    mjpg = mm.synth_mjpeg_media(ids.filter("media_id % 2 = 0"), n_frames=4)
    gifs = mm.synth_gif_media(ids.filter("media_id % 2 = 1"), n_frames=4)
    out = mm.sample_video_frames(mjpg.unionByName(gifs), every_n=2).collect()
    by_media = {}
    for r in out:
        by_media.setdefault(r["media_id"], []).append(r)
    assert set(by_media) == {0, 1, 2, 3}
    for mid, rows in by_media.items():
        assert sorted(r["frame_index"] for r in rows) == [0, 2]
        assert all(r["n_frames"] == 4 for r in rows)
        assert all((r["width"], r["height"]) == (16, 16) for r in rows)


def test_lzw_encode_empty_raises_valueerror():
    import numpy as np

    from osmix_spark.functions import gif as g

    with pytest.raises(ValueError):
        g.encode_gif([np.zeros((0, 0), np.uint8)], [(0, 0, 0)])
