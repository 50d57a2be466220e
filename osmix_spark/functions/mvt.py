"""Minimal Mapbox Vector Tile (MVT) encoder/decoder in pure Python.

Implements the public MVT 2.1 spec (protobuf wire format written by hand —
varints, length-delimited messages): layers with POINT/LINESTRING/POLYGON
features, zigzag-encoded MoveTo/LineTo/ClosePath command geometry, and
per-layer key/value dictionaries.

Parity target: the reference's vector-tile encoder output shape
(packages/vt/src/encode.ts:22-31,59-260 and write-vt-pbf.ts) — extent 4096,
64 px buffer — re-derived from the published spec, not ported.

Determinism: features are encoded in the order given; callers sort by
feature id. Key/value dictionaries are built in first-seen order, which is
deterministic given sorted features. The encoder is called inside
applyInPandas batches (one tile per group), so bytes are reproducible at
any parallelism.
"""

from __future__ import annotations

EXTENT = 4096  # vt/encode.ts:22-25
BUFFER_PX = 64

GEOM_POINT = 1
GEOM_LINESTRING = 2
GEOM_POLYGON = 3

_CMD_MOVETO = 1
_CMD_LINETO = 2
_CMD_CLOSEPATH = 7


def _varint(v: int) -> bytes:
    # negative ints encode as 64-bit two's complement (protobuf int64);
    # without the mask Python's arithmetic shift never terminates
    v &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _encode_geometry(geom_type: int, rings: list[list[tuple[int, int]]]) -> list[int]:
    """Command-integer sequence with zigzag deltas (MVT spec §4.3)."""
    cmds: list[int] = []
    cx = cy = 0
    for ring in rings:
        if not ring:
            continue
        if geom_type == GEOM_POINT:
            cmds.append((_CMD_MOVETO) | (len(ring) << 3))
            for x, y in ring:
                cmds.append(_zigzag(x - cx))
                cmds.append(_zigzag(y - cy))
                cx, cy = x, y
        else:
            x0, y0 = ring[0]
            cmds.append(_CMD_MOVETO | (1 << 3))
            cmds.append(_zigzag(x0 - cx))
            cmds.append(_zigzag(y0 - cy))
            cx, cy = x0, y0
            rest = ring[1:]
            if geom_type == GEOM_POLYGON and len(rest) and ring[-1] == ring[0]:
                rest = rest[:-1]  # implicit close
            if rest:
                cmds.append(_CMD_LINETO | (len(rest) << 3))
                for x, y in rest:
                    cmds.append(_zigzag(x - cx))
                    cmds.append(_zigzag(y - cy))
                    cx, cy = x, y
            if geom_type == GEOM_POLYGON:
                cmds.append(_CMD_CLOSEPATH | (1 << 3))
    return cmds


def _encode_value(v) -> bytes:
    if isinstance(v, bool):
        return _tag(7, 0) + _varint(1 if v else 0)
    if isinstance(v, int):
        return _tag(6, 0) + _varint(_zigzag(v))
    if isinstance(v, float):
        import struct

        return _tag(3, 1) + struct.pack("<d", v)
    b = str(v).encode("utf-8")
    return _len_delim(1, b)


def encode_layer(name: str, features: list[dict], extent: int = EXTENT) -> bytes:
    """features: [{'id': int, 'type': 1|2|3,
    'geometry': [[(x,y), ...ring/line...], ...], 'tags': {k: v}}, ...]"""
    keys: list[str] = []
    key_idx: dict[str, int] = {}
    vals: list = []
    val_idx: dict = {}
    feat_bufs: list[bytes] = []
    for f in features:
        tag_ints: list[int] = []
        for k, v in (f.get("tags") or {}).items():
            if k not in key_idx:
                key_idx[k] = len(keys)
                keys.append(k)
            vk = (type(v).__name__, v)
            if vk not in val_idx:
                val_idx[vk] = len(vals)
                vals.append(v)
            tag_ints.extend((key_idx[k], val_idx[vk]))
        body = bytearray()
        if f.get("id") is not None:
            body += _tag(1, 0) + _varint(int(f["id"]))
        if tag_ints:
            payload = b"".join(_varint(t) for t in tag_ints)
            body += _len_delim(2, payload)
        body += _tag(3, 0) + _varint(f["type"])
        cmds = _encode_geometry(f["type"], f["geometry"])
        body += _len_delim(4, b"".join(_varint(c) for c in cmds))
        feat_bufs.append(_len_delim(2, bytes(body)))
    layer = bytearray()
    layer += _tag(15, 0) + _varint(2)  # version
    layer += _len_delim(1, name.encode("utf-8"))
    for fb in feat_bufs:
        layer += fb
    for k in keys:
        layer += _len_delim(3, k.encode("utf-8"))
    for v in vals:
        layer += _len_delim(4, _encode_value(v))
    layer += _tag(5, 0) + _varint(extent)
    return bytes(layer)


def encode_tile(layers: dict[str, list[dict]], extent: int = EXTENT) -> bytes:
    out = bytearray()
    for name in layers:  # caller controls order (sorted for determinism)
        out += _len_delim(3, encode_layer(name, layers[name], extent))
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder (round-trip tests)
# ---------------------------------------------------------------------------

def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    v = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, i
        shift += 7


def decode_tile(buf: bytes) -> dict[str, list[dict]]:
    layers: dict[str, list[dict]] = {}
    i = 0
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        assert tag >> 3 == 3 and tag & 7 == 2, "expected layer"
        ln, i = _read_varint(buf, i)
        name, feats = _decode_layer(buf[i : i + ln])
        layers[name] = feats
        i += ln
    return layers


def _decode_layer(buf: bytes) -> tuple[str, list[dict]]:
    i = 0
    name = ""
    feats: list[dict] = []
    keys: list[str] = []
    vals: list = []
    raw_feats: list[bytes] = []
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        field, wire = tag >> 3, tag & 7
        if wire == 2:
            ln, i = _read_varint(buf, i)
            payload = buf[i : i + ln]
            i += ln
            if field == 1:
                name = payload.decode("utf-8")
            elif field == 2:
                raw_feats.append(payload)
            elif field == 3:
                keys.append(payload.decode("utf-8"))
            elif field == 4:
                vals.append(_decode_value(payload))
        else:
            _, i = _read_varint(buf, i)
    for rf in raw_feats:
        feats.append(_decode_feature(rf, keys, vals))
    return name, feats


def _decode_value(buf: bytes):
    tag, i = _read_varint(buf, 0)
    field, wire = tag >> 3, tag & 7
    if field == 1:
        ln, i = _read_varint(buf, i)
        return buf[i : i + ln].decode("utf-8")
    if field == 3:
        import struct

        return struct.unpack("<d", buf[i : i + 8])[0]
    if field == 6:
        v, _ = _read_varint(buf, i)
        return _unzigzag(v)
    if field == 7:
        v, _ = _read_varint(buf, i)
        return bool(v)
    raise ValueError(f"unsupported value field {field}")


def _decode_feature(buf: bytes, keys: list[str], vals: list) -> dict:
    i = 0
    f: dict = {"id": None, "tags": {}, "type": 0, "geometry": []}
    geom_ints: list[int] = []
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        field, wire = tag >> 3, tag & 7
        if field == 1 and wire == 0:
            f["id"], i = _read_varint(buf, i)
        elif field == 2 and wire == 2:
            ln, i = _read_varint(buf, i)
            end = i + ln
            while i < end:
                ki, i = _read_varint(buf, i)
                vi, i = _read_varint(buf, i)
                f["tags"][keys[ki]] = vals[vi]
        elif field == 3 and wire == 0:
            f["type"], i = _read_varint(buf, i)
        elif field == 4 and wire == 2:
            ln, i = _read_varint(buf, i)
            end = i + ln
            while i < end:
                v, i = _read_varint(buf, i)
                geom_ints.append(v)
    f["geometry"] = _decode_geom_ints(f["type"], geom_ints)
    return f


def _decode_geom_ints(geom_type: int, ints: list[int]) -> list[list[tuple[int, int]]]:
    rings: list[list[tuple[int, int]]] = []
    i = 0
    cx = cy = 0
    cur: list[tuple[int, int]] = []
    while i < len(ints):
        cmd = ints[i] & 7
        count = ints[i] >> 3
        i += 1
        if cmd == _CMD_MOVETO:
            for _ in range(count):
                cx += _unzigzag(ints[i])
                cy += _unzigzag(ints[i + 1])
                i += 2
                if geom_type == GEOM_POINT:
                    rings.append([(cx, cy)])
                else:
                    if cur:
                        rings.append(cur)
                    cur = [(cx, cy)]
        elif cmd == _CMD_LINETO:
            for _ in range(count):
                cx += _unzigzag(ints[i])
                cy += _unzigzag(ints[i + 1])
                i += 2
                cur.append((cx, cy))
        elif cmd == _CMD_CLOSEPATH:
            if cur:
                cur.append(cur[0])
    if cur:
        rings.append(cur)
    return rings
