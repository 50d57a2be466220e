"""Pure-NumPy baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

No image libraries: the decoder handles baseline sequential DCT (SOF0),
8-bit samples, 1 (grayscale) or 3 (YCbCr) components, 4:4:4 / 4:2:2 / 4:2:0
sampling, byte stuffing, and restart markers; the encoder writes baseline
4:4:4 or 4:2:0 with the Annex K quantization and Huffman tables so fixtures
are deterministic and spec-standard.

Used by operators/multimodal.decode_media for image/jpeg payloads — the
reference engine has no media path at all; this exists for the
training-data pipeline brief (Common-Crawl media columns are mostly JPEG).

Exactness note for oracle-backed fixtures: an image whose 8x8 blocks are
each CONSTANT has only DC coefficients; with the Annex-K luma table at
quality 75 the DC quantizer is exactly 8 = the DCT gain of a constant
block, so encode->decode reproduces the source pixels bit-exactly and SQL
oracles can state pixel statistics in closed form (see
operators/multimodal.synth_jpeg_media).
"""

from __future__ import annotations

import struct

import numpy as np

# zig-zag scan order (T.81 Figure 5)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K Table K.1 / K.2 quantization tables (natural order)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K Tables K.3-K.6: standard Huffman tables as (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# 8x8 DCT-II basis matrix: M[u, x] = C(u)/2 * cos((2x+1) u pi / 16)
_M = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _M[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _scale_qt(qt: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-compatible quality scaling of an Annex K table."""
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((qt * scale + 50) // 100, 1, 255).astype(np.int64)


def _build_codes(bits, vals):
    """(BITS, HUFFVAL) -> {symbol: (code, length)} per T.81 Annex C."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_map(bits, vals):
    """(BITS, HUFFVAL) -> {(length, code): symbol}."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


# the standard tables never change — build the encoder's code dicts once
def _std_codes():
    return (
        [_build_codes(DC_LUMA_BITS, DC_LUMA_VALS),
         _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)],
        [_build_codes(AC_LUMA_BITS, AC_LUMA_VALS),
         _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)],
    )


_STD_DC_CODES, _STD_AC_CODES = _std_codes()


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """DC/AC amplitude coding (T.81 F.1.2.1): (size, value-bits)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _fdct_quant(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """plane (H, W) float level-shifted -> (H//8 * W//8, 64) quantized
    coefficients in zig-zag order, vectorized over blocks."""
    h, w = plane.shape
    blocks = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    coef = np.einsum("ux,nxy,vy->nuv", _M, blocks, _M)
    q = np.round(coef / qt.reshape(8, 8)).astype(np.int64)
    return q.reshape(-1, 64)[:, ZIGZAG]


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = (img[..., 0].astype(np.float64), img[..., 1].astype(np.float64),
               img[..., 2].astype(np.float64))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def encode_baseline(img: np.ndarray, quality: int = 75, subsample: str = "444") -> bytes:
    """Encode (H, W, 3) RGB or (H, W) grayscale uint8 as baseline JPEG.

    H and W must be multiples of 8 (and of 16 for 4:2:0) — fixtures are;
    general edge-padding is out of scope for the synthetic pipeline."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qly = _scale_qt(QT_LUMA, quality)
    qlc = _scale_qt(QT_CHROMA, quality)

    if gray:
        planes = [img.astype(np.float64) - 128.0]
        samp = [(1, 1)]
        qids = [0]
    else:
        ycc = _rgb_to_ycbcr(img)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsample == "420":
            if h % 16 or w % 16:
                raise ValueError("4:2:0 needs dimensions divisible by 16")
            cb = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        elif subsample == "444":
            samp = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError(f"unsupported subsampling {subsample}")
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
        qids = [0, 1, 1]

    dc_codes = _STD_DC_CODES
    ac_codes = _STD_AC_CODES

    # per-plane quantized blocks (row-major block order)
    qblocks = []
    for p, qid in zip(planes, qids):
        qblocks.append(_fdct_quant(p, qly if qid == 0 else qlc))

    # interleaved MCU scan (T.81 A.2.3)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    bw = _BitWriter()
    pred = [0] * len(planes)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (hs, vs) in enumerate(samp):
                tid = 0 if ci == 0 else 1
                plane_w_blocks = (w * hs // hmax) // 8
                for by in range(vs):
                    for bx in range(hs):
                        bi = (my * vs + by) * plane_w_blocks + (mx * hs + bx)
                        blk = qblocks[ci][bi]
                        diff = int(blk[0]) - pred[ci]
                        pred[ci] = int(blk[0])
                        size, bits = _magnitude(diff)
                        code, ln = dc_codes[tid][size]
                        bw.write(code, ln)
                        if size:
                            bw.write(bits, size)
                        run = 0
                        for k in range(1, 64):
                            v = int(blk[k])
                            if v == 0:
                                run += 1
                                continue
                            while run >= 16:
                                code, ln = ac_codes[tid][0xF0]  # ZRL
                                bw.write(code, ln)
                                run -= 16
                            size, bits = _magnitude(v)
                            code, ln = ac_codes[tid][(run << 4) | size]
                            bw.write(code, ln)
                            bw.write(bits, size)
                            run = 0
                        if run:
                            code, ln = ac_codes[tid][0x00]  # EOB
                            bw.write(code, ln)
    scan = bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT segments
    for tid, qt in ((0, qly), (1, qlc)):
        if gray and tid == 1:
            continue
        seg = bytes([tid]) + bytes(int(x) for x in qt[ZIGZAG])
        out += b"\xff\xdb" + struct.pack(">H", len(seg) + 2) + seg
    # SOF0
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hs, vs = samp[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, qids[ci]])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    # DHT segments
    for cls, tid, bits, vals in (
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS), (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
        (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS), (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        if gray and tid == 1:
            continue
        seg = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", len(seg) + 2) + seg
    # SOS
    sos = bytes([ncomp])
    for ci in range(ncomp):
        tid = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Entropy-coded segment reader with 0xFF00 unstuffing and RST skip."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy stream")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by caller via sync()
                raise _RestartMarker()
            else:
                raise ValueError("unexpected marker inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Consume an RSTn marker at a byte boundary."""
        self.acc = 0
        self.nbits = 0
        assert self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        self.pos += 2


class _RestartMarker(Exception):
    pass


def _decode_huff(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_baseline(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG -> (H, W, 3) RGB uint8 (grayscale replicated).

    Supports SOF0, 8-bit, 1 or 3 components, sampling factors 1-2, restart
    intervals, multi-table DQT/DHT segments, 0xFF fill bytes between
    markers (T.81 B.1.1.2). Progressive (SOF2) and arithmetic coding raise
    NotImplementedError; any malformed/truncated stream raises ValueError
    (the decode_media contract), never a raw struct/Index/Overflow error."""
    try:
        return _decode_baseline(data)
    except (struct.error, IndexError, OverflowError) as e:
        raise ValueError(f"corrupt or truncated JPEG stream: {e!r}") from e


def _decode_baseline(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    i = 2
    while i < len(data):
        if data[i] != 0xFF:
            raise ValueError("bad marker sync")
        while data[i + 1] == 0xFF:
            i += 1  # T.81 B.1.1.2: optional 0xFF fill bytes before a marker
        marker = data[i + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        (ln,) = struct.unpack(">H", data[i + 2 : i + 4])
        seg = data[i + 4 : i + 2 + ln]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8).astype(np.int64)
                qts[tq] = tbl[UNZIGZAG]  # store natural order
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                huff[(cls, tid)] = _build_decode_map(bits, vals)
                p += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError("8-bit precision only")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"non-baseline SOF 0x{marker:02x}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            order = []
            for c in range(ns):
                cid, tids = seg[1 + 2 * c : 3 + 2 * c]
                comp = next(cc for cc in comps if cc["id"] == cid)
                comp["dc"] = tids >> 4
                comp["ac"] = tids & 0xF
                order.append(comp)
            scan_start = i + 2 + ln
            try:
                return _decode_scan(data, scan_start, w, h, order, qts, huff,
                                    restart_interval)
            except (_RestartMarker, IndexError, KeyError, OverflowError) as e:
                # internal decode-state exceptions must not escape: a restart
                # marker with no DRI, a truncated stream, or a missing table
                # are all "corrupt JPEG" to the caller
                raise ValueError(f"corrupt or truncated JPEG stream: {e!r}") from e
        i += 2 + ln
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, w, h, comps, qts, huff, restart_interval):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        pw = mcux * 8 * c["h"]
        ph = mcuy * 8 * c["v"]
        planes.append(np.zeros((ph, pw), dtype=np.float64))
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.sync_restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dct = huff[(0, c["dc"])]
                act = huff[(1, c["ac"])]
                qt = qts[c["tq"]].reshape(8, 8)
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int64)
                        size = _decode_huff(br, dct)
                        diff = _extend(br.read_bits(size), size) if size else 0
                        pred[ci] += diff
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(br, act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            coef[k] = _extend(br.read_bits(s), s)
                            k += 1
                        blk = np.zeros(64, dtype=np.float64)
                        blk[ZIGZAG] = coef * qt.reshape(64)[ZIGZAG]
                        spatial = np.einsum(
                            "ux,uv,vy->xy", _M, blk.reshape(8, 8), _M
                        ) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = spatial
            mcu_count += 1
    # upsample to full resolution and crop
    full = []
    for c, p in zip(comps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    return _ycbcr_to_rgb(full[0], full[1], full[2])
