"""Minimal protobuf wire-format helpers shared by the MVT and OSM-PBF
codecs (public wire format: varints, zigzag, length-delimited fields)."""

from __future__ import annotations


def varint(v: int) -> bytes:
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


def read_varint(buf: bytes, i: int) -> tuple[int, int]:
    v = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, i
        shift += 7


def zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def tag(field: int, wire: int) -> bytes:
    return varint((field << 3) | wire)


def len_delim(field: int, payload: bytes) -> bytes:
    return tag(field, 2) + varint(len(payload)) + payload


def packed_varints(field: int, values) -> bytes:
    return len_delim(field, b"".join(varint(v) for v in values))


def packed_sint_deltas(field: int, values) -> bytes:
    """Delta + zigzag packed sint64 (the OSM PBF refs/ids encoding)."""
    out = bytearray()
    prev = 0
    for v in values:
        out += varint(zigzag(v - prev))
        prev = v
    return len_delim(field, bytes(out))


def iter_fields(buf: bytes):
    """Yield (field, wire, value) — value is int for varint fields, bytes
    for length-delimited, raw 8/4 bytes for fixed."""
    i = 0
    n = len(buf)
    while i < n:
        t, i = read_varint(buf, i)
        field, wire = t >> 3, t & 7
        if wire == 0:
            v, i = read_varint(buf, i)
            yield field, wire, v
        elif wire == 2:
            ln, i = read_varint(buf, i)
            yield field, wire, buf[i : i + ln]
            i += ln
        elif wire == 1:
            yield field, wire, buf[i : i + 8]
            i += 8
        elif wire == 5:
            yield field, wire, buf[i : i + 4]
            i += 4
        else:  # pragma: no cover
            raise ValueError(f"unsupported wire type {wire}")


def unpack_varints(buf: bytes) -> list[int]:
    out = []
    i = 0
    while i < len(buf):
        v, i = read_varint(buf, i)
        out.append(v)
    return out


def unpack_sint_deltas(buf: bytes) -> list[int]:
    out = []
    prev = 0
    for v in unpack_varints(buf):
        prev += unzigzag(v)
        out.append(prev)
    return out
