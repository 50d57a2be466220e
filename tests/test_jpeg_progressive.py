"""Progressive JPEG (SOF2) codec tests.

The exactness hook: encode_progressive's default scan script is
coefficient-lossless (every coefficient ends at Al=0 over the full
band), so its decode must be PIXEL-IDENTICAL to decoding the baseline
encoding of the same image at the same quality/subsampling — both paths
share one quantized-coefficient set and one IDCT. Any drift in either
the progressive encoder's bit buffering or the decoder's scan
accumulation breaks the identity.

Reference scope note: conveyal/osmix has no media path; this codec
serves the training-data brief (crawl media columns) where progressive
JPEG is common.
"""

from __future__ import annotations

import numpy as np
import pytest

from osmix_spark.functions import jpeg


def _grad(h, w):
    x = np.arange(w)
    y = np.arange(h)
    g = ((x[None, :] * 3 + y[:, None] * 5) % 256).astype(np.uint8)
    return g


def _assert_prog_matches_baseline(img, quality=75, subsample="444", **kw):
    base = jpeg.decode(jpeg.encode_baseline(img, quality=quality,
                                            subsample=subsample))
    blob = jpeg.encode_progressive(img, quality=quality,
                                   subsample=subsample, **kw)
    # really SOF2 on the wire
    assert b"\xff\xc2" in blob and b"\xff\xc0" not in blob[:200]
    prog = jpeg.decode(blob)
    np.testing.assert_array_equal(base, prog)


def test_gray_roundtrip_matches_baseline():
    rng = np.random.default_rng(11)
    for q in (10, 50, 92):
        _assert_prog_matches_baseline(
            rng.integers(0, 256, (24, 32), dtype=np.uint8), quality=q)


def test_rgb_444_roundtrip_matches_baseline():
    rng = np.random.default_rng(12)
    for q in (25, 75):
        _assert_prog_matches_baseline(
            rng.integers(0, 256, (16, 24, 3), dtype=np.uint8), quality=q)


def test_rgb_420_subsampled_roundtrip():
    rng = np.random.default_rng(13)
    _assert_prog_matches_baseline(
        rng.integers(0, 256, (32, 48, 3), dtype=np.uint8), subsample="420")


def test_smooth_gradient_long_eob_runs():
    """Smooth content quantizes to mostly-zero AC bands -> long EOB runs
    with buffered correction bits (the G.1.2.3 two-buffer ordering)."""
    g = _grad(48, 64)
    _assert_prog_matches_baseline(np.stack([g, g, g], axis=-1), quality=40)


def test_sparse_spikes_zrl_paths():
    """Isolated spikes produce >15-zero runs inside bands -> ZRL symbols
    in both first and refinement scans."""
    rng = np.random.default_rng(14)
    img = np.where(rng.random((40, 48)) > 0.99, 255, 128).astype(np.uint8)
    _assert_prog_matches_baseline(img, quality=90)


def test_restart_markers_in_progressive_scans():
    rng = np.random.default_rng(15)
    img = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    for ri in (1, 3, 7):
        _assert_prog_matches_baseline(img, subsample="420",
                                      restart_interval=ri)


def test_spectral_selection_only_script():
    """A script with no successive approximation (all Al=0) is the other
    standard progressive flavor."""
    rng = np.random.default_rng(16)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    script = [("dc", [0, 1, 2], 0, 0), ("ac", 0, 1, 63, 0, 0),
              ("ac", 1, 1, 63, 0, 0), ("ac", 2, 1, 63, 0, 0)]
    _assert_prog_matches_baseline(img, scans=script)


def test_truncated_progressive_raises_valueerror():
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    blob = jpeg.encode_progressive(img)
    for cut in (len(blob) // 3, len(blob) // 2, len(blob) - 3):
        with pytest.raises(ValueError):
            jpeg.decode(blob[:cut])


def test_partial_script_is_a_coarse_preview():
    """Decoding a stream whose script stops after the DC-first scan must
    still produce an image (the progressive promise), just a coarse one:
    per-8x8-block means within DC quantization of the source."""
    g = _grad(32, 32)
    blob = jpeg.encode_progressive(g, quality=75,
                                   scans=[("dc", [0], 0, 0)])
    dec = jpeg.decode(blob)
    blockmeans_src = g.reshape(4, 8, 4, 8).mean(axis=(1, 3))
    blockmeans_dec = dec[..., 0].reshape(4, 8, 4, 8).mean(axis=(1, 3))
    # quality-75 luma DC quantizer is 8
    assert np.abs(blockmeans_src - blockmeans_dec).max() <= 4.0


def test_progressive_flows_through_decode_media(spark):
    """decode_media must route SOF2 payloads through the real decoder
    (no unsupported_codec row)."""
    from osmix_spark.operators import multimodal

    rng = np.random.default_rng(18)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    blob = jpeg.encode_progressive(img)
    df = spark.createDataFrame(
        [(1, "image/jpeg", bytearray(blob))],
        "media_id long, mime string, payload binary")
    rows = multimodal.decode_media(df, with_status=True).collect()
    assert len(rows) == 1
    assert rows[0]["status"] == "ok"
    assert rows[0]["width"] == 16 and rows[0]["height"] == 16


def test_missing_dqt_raises_valueerror():
    # stripping the DQT segments must surface as the documented ValueError
    # contract, not a KeyError from the reconstruct step
    img = _grad(16, 16)
    blob = jpeg.encode_progressive(img)
    out, i = bytearray(), 0
    while i < len(blob):
        if blob[i] == 0xFF and blob[i + 1] == 0xDB:  # DQT
            seglen = int.from_bytes(blob[i + 2:i + 4], "big")
            i += 2 + seglen
            continue
        out.append(blob[i])
        i += 1
    with pytest.raises(ValueError):
        jpeg.decode(bytes(out))


def test_corrupt_restart_marker_raises_valueerror():
    img = _grad(32, 32)
    blob = bytearray(jpeg.encode_progressive(img, restart_interval=2))
    # corrupt the first RSTn marker byte (FF D0..D7 -> FF 3F)
    for i in range(2, len(blob) - 1):
        if blob[i] == 0xFF and 0xD0 <= blob[i + 1] <= 0xD7:
            blob[i + 1] = 0x3F
            break
    with pytest.raises(ValueError):
        jpeg.decode(bytes(blob))
