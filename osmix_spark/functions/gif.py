"""Pure-Python/NumPy GIF codec (GIF87a/GIF89a, real LZW).

No image libraries: the decoder handles both signatures, global AND local
color tables, interlaced images (the 4-pass row schedule), Graphic
Control Extensions (transparency index, disposal methods none/keep/
restore-to-background/restore-to-previous), application/comment/plain-
text extension skipping, multi-frame animations, and the full variable-
width LZW scheme (clear/end codes, width growth to 12 bits, 4096-entry
table reset). The encoder writes spec-standard GIF89a with a real LZW
compressor (same width schedule the decoder uses) so fixtures are
deterministic bytes.

Used by operators/multimodal.decode_media for image/gif payloads and by
sample_video_frames for animated GIFs — the reference engine has no media
path at all; this exists for the training-data pipeline brief (GIF is a
top web image format and animated GIF is the web's container-free video).

Exactness note for oracle-backed fixtures: GIF is LOSSLESS (palette-
indexed), so any deterministic index pattern + closed-form palette gives
pixel statistics SQL oracles can state exactly (see
operators/multimodal.synth_gif_media).

Corrupt payloads raise ValueError (decode_media contract: data errors
surface; codec gaps are NotImplementedError).
"""

from __future__ import annotations

import struct

import numpy as np

GIF87A = b"GIF87a"
GIF89A = b"GIF89a"

# interlace pass schedule (GIF89a spec Appendix E): (first row, step)
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))
_MAX_CODE = 1 << 12  # LZW table is capped at 4096 entries / 12-bit codes


# ---------------------------------------------------------------------------
# LZW (GIF variant: variable width, LSB-first bit packing)
# ---------------------------------------------------------------------------

class _BitWriter:
    """LSB-first bit packer (GIF packs code bits little-endian)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.buf.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.buf)


def lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Compress palette indices with GIF LZW.

    The emit width follows the DECODER's schedule (the decoder adds its
    table entry one code later than the encoder, so the encoder simulates
    the decoder's next_code counter instead of reusing its own): width
    grows when the decoder's entry count reaches 2^width, capped at 12;
    at 4096 encoder entries a Clear code resets both sides.
    """
    clear = 1 << min_code_size
    end = clear + 1
    bw = _BitWriter()

    def reset():
        return {}, end + 1, min_code_size + 1, clear + 2, True

    table, next_code, width, dec_next, first_emit = reset()
    bw.write(clear, width)

    def emit_data(code: int):
        nonlocal dec_next, width, first_emit
        bw.write(code, width)
        if first_emit:
            first_emit = False
        else:
            dec_next += 1
            if dec_next == (1 << width) and width < 12:
                width += 1

    it = iter(int(v) for v in indices)
    try:
        prefix = next(it)
    except StopIteration:
        raise ValueError("cannot LZW-encode an empty index stream") from None
    for sym in it:
        key = (prefix, sym)
        code = table.get(key)
        if code is not None:
            prefix = code
            continue
        emit_data(prefix)
        table[key] = next_code
        next_code += 1
        prefix = sym
        if next_code == _MAX_CODE:
            bw.write(clear, width)
            table, next_code, width, dec_next, first_emit = reset()
    emit_data(prefix)
    bw.write(end, width)
    return bw.flush()


def lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """Decompress GIF LZW to exactly n_pixels palette indices (uint8).

    Extra pixels beyond n_pixels are ignored (spec allows trailing junk);
    running out of data or an out-of-range code raises ValueError.
    """
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    base = [bytes([i]) for i in range(clear)]

    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    table = list(base)
    table += [b""] * 2  # clear/end placeholders
    width = min_code_size + 1
    prev: bytes | None = None
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base) + [b""] * 2
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"corrupt GIF LZW stream: code {code} "
                             f"with {len(table)} entries")
        out += entry
        if prev is not None and len(table) < _MAX_CODE:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("GIF LZW stream ended before the raster filled")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


# ---------------------------------------------------------------------------
# container encode
# ---------------------------------------------------------------------------

def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _deinterlace_rows(height: int) -> list[int]:
    """Row order in which an interlaced image stores its lines."""
    rows = []
    for first, step in _INTERLACE_PASSES:
        rows.extend(range(first, height, step))
    return rows


def encode_gif(frames, palette: np.ndarray, delays_cs: int = 4,
               transparent: int | None = None, interlace: bool = False,
               disposal=1, loop: bool = True) -> bytes:
    """Write a GIF89a. `frames`: list of (H, W) uint8 index rasters (all
    the same shape, full-canvas); `palette`: (N, 3) uint8, N a power of
    two >= 2. Animated (len > 1) output gets a NETSCAPE loop extension and
    per-frame Graphic Control Extensions; `transparent` marks one palette
    index transparent in every frame's GCE; `disposal` is one method for
    all frames or a per-frame sequence."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    disposals = (list(disposal) if hasattr(disposal, "__len__")
                 else [disposal] * len(frames))
    if len(disposals) != len(frames):
        raise ValueError("per-frame disposal list must match frame count")
    if not frames:
        raise ValueError("encode_gif needs at least one frame")
    h, w = frames[0].shape
    palette = np.asarray(palette, dtype=np.uint8)
    ncol = palette.shape[0]
    if ncol < 2 or ncol & (ncol - 1):
        raise ValueError("palette size must be a power of two >= 2")
    ct_bits = max(ncol.bit_length() - 1, 1)  # 2^(ct_bits) colors
    mcs = max(ct_bits, 2)

    out = bytearray(GIF89A)
    # logical screen descriptor: GCT flag, color resolution, GCT size
    packed = 0x80 | ((ct_bits - 1) << 4) | (ct_bits - 1)
    out += struct.pack("<HHBBB", w, h, packed, 0, 0)
    out += palette.tobytes()
    animated = len(frames) > 1
    if animated and loop:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for idx, frame_disposal in zip(frames, disposals):
        if idx.shape != (h, w):
            raise ValueError("all frames must share the canvas shape")
        if animated or transparent is not None:
            gce_packed = (frame_disposal & 7) << 2
            tix = 0
            if transparent is not None:
                gce_packed |= 1
                tix = transparent
            out += b"\x21\xf9\x04" + struct.pack(
                "<BHB", gce_packed, delays_cs, tix
            ) + b"\x00"
        ilace_flag = 0x40 if interlace else 0
        # image descriptor: separator, left, top, width, height, packed(no LCT)
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ilace_flag)
        stored = idx[_deinterlace_rows(h), :] if interlace else idx
        out.append(mcs)
        out += _sub_blocks(lzw_encode(stored.reshape(-1), mcs))
    out.append(0x3B)
    return bytes(out)


# ---------------------------------------------------------------------------
# container decode
# ---------------------------------------------------------------------------

def _read_sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(data):
            raise ValueError("truncated GIF sub-blocks")
        out += data[pos : pos + n]
        pos += n


def _skip_sub_blocks(data: bytes, pos: int) -> int:
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return pos
        pos += n


def gif_frames(data: bytes, max_frames: int | None = None):
    """Decode a GIF to composited RGBA frames.

    Returns (frames, width, height): frames is a list of (H, W, 4) uint8
    arrays, each the full canvas AFTER compositing that image per the
    animation disposal rules (none/keep draw over, restore-to-background
    clears the frame's rect to transparent, restore-to-previous snapshots).
    `max_frames` stops early (frame sampling reads only what it needs).
    """
    if data[:6] not in (GIF87A, GIF89A):
        raise ValueError("not a GIF (bad signature)")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    w, h, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8)
        if gct.size != 3 * n:
            raise ValueError("truncated global color table")
        gct = gct.reshape(n, 3)
        pos += 3 * n

    canvas = np.zeros((h, w, 4), dtype=np.uint8)
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    while True:
        if pos >= len(data):
            raise ValueError("GIF ended without trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("truncated GIF extension")
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                body, pos = _read_sub_blocks(data, pos)
                if len(body) < 4:
                    raise ValueError("short graphic control extension")
                gp = body[0]
                disposal = (gp >> 2) & 7
                transparent = body[3] if gp & 1 else None
            else:  # application / comment / plain text: skip
                pos = _skip_sub_blocks(data, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        if pos + 9 > len(data):
            raise ValueError("truncated image descriptor")
        left, top, iw, ih, ipk = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        ct = gct
        if ipk & 0x80:  # local color table
            n = 2 << (ipk & 7)
            ct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8)
            if ct.size != 3 * n:
                raise ValueError("truncated local color table")
            ct = ct.reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF image with no color table")
        if left + iw > w or top + ih > h:
            raise ValueError("GIF image rect exceeds the logical screen")
        if pos >= len(data):
            raise ValueError("truncated GIF image data")
        mcs = data[pos]
        pos += 1
        lzw, pos = _read_sub_blocks(data, pos)
        idx = lzw_decode(lzw, mcs, iw * ih).reshape(ih, iw)
        if int(idx.max(initial=0)) >= ct.shape[0]:
            raise ValueError("GIF pixel index outside the color table")
        if ipk & 0x40:  # interlaced: stored rows -> display rows
            order = np.asarray(_deinterlace_rows(ih))
            display = np.empty_like(idx)
            display[order, :] = idx
            idx = display

        prev_canvas = canvas.copy() if disposal == 3 else None
        rgba = np.concatenate(
            [ct[idx], np.full((ih, iw, 1), 255, dtype=np.uint8)], axis=-1
        )
        region = canvas[top : top + ih, left : left + iw]
        if transparent is not None:
            opaque = (idx != transparent)[:, :, None]
            region[:] = np.where(opaque, rgba, region)
        else:
            region[:] = rgba
        frames.append(canvas.copy())
        if max_frames is not None and len(frames) >= max_frames:
            return frames, w, h
        # disposal applies AFTER this frame is shown, preparing the next
        if disposal == 2:  # restore to background = transparent per spec
            canvas[top : top + ih, left : left + iw] = 0
        elif disposal == 3 and prev_canvas is not None:
            canvas = prev_canvas
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image")
    return frames, w, h


def decode_gif(data: bytes) -> np.ndarray:
    """First frame as an (H, W, 4) uint8 RGBA canvas."""
    frames, _w, _h = gif_frames(data, max_frames=1)
    return frames[0]
