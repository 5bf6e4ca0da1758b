"""Minimal WKB (ISO well-known binary) codec — no dependencies.

Geometry at rest is a ``geom_wkb: binary`` Arrow column (SURVEY.md
§7.0). Supports the six 2-D types the reference's vector model allows
(SpaVectors.py:8-9): Point, LineString, Polygon, MultiPoint,
MultiLineString, MultiPolygon. Little-endian only on encode; both
byte orders accepted on decode.

Decoded form mirrors :mod:`spapy_ray.kernels.geom`:
  ("Point", (x, y))
  ("LineString", ndarray[m,2])
  ("Polygon", [ring, ...])            ring = ndarray[k,2] (closed as stored)
  ("MultiPolygon", [[ring, ...], ...]) etc.
"""

from __future__ import annotations

import struct

import numpy as np

POINT, LINESTRING, POLYGON = 1, 2, 3
MULTIPOINT, MULTILINESTRING, MULTIPOLYGON = 4, 5, 6

_TYPE_NAMES = {POINT: "Point", LINESTRING: "LineString", POLYGON: "Polygon",
               MULTIPOINT: "MultiPoint", MULTILINESTRING: "MultiLineString",
               MULTIPOLYGON: "MultiPolygon"}


def encode_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, POINT, x, y)


def _encode_coords(coords: np.ndarray) -> bytes:
    c = np.ascontiguousarray(np.asarray(coords, dtype="<f8"))
    return struct.pack("<I", len(c)) + c.tobytes()


def encode_linestring(coords: np.ndarray) -> bytes:
    return struct.pack("<BI", 1, LINESTRING) + _encode_coords(coords)


def _closed(ring: np.ndarray) -> np.ndarray:
    r = np.asarray(ring, dtype=np.float64)
    if len(r) == 0 or (r[0] == r[-1]).all():
        return r
    return np.vstack([r, r[:1]])


def encode_polygon(rings: list[np.ndarray]) -> bytes:
    out = [struct.pack("<BII", 1, POLYGON, len(rings))]
    for ring in rings:
        out.append(_encode_coords(_closed(ring)))
    return b"".join(out)


def encode_multipolygon(polys: list[list[np.ndarray]]) -> bytes:
    out = [struct.pack("<BII", 1, MULTIPOLYGON, len(polys))]
    for rings in polys:
        out.append(encode_polygon(rings))
    return b"".join(out)


def encode_multipoint(coords: np.ndarray) -> bytes:
    coords = np.asarray(coords, dtype=np.float64)
    out = [struct.pack("<BII", 1, MULTIPOINT, len(coords))]
    for x, y in coords:
        out.append(encode_point(x, y))
    return b"".join(out)


def encode_multilinestring(lines: list[np.ndarray]) -> bytes:
    out = [struct.pack("<BII", 1, MULTILINESTRING, len(lines))]
    for line in lines:
        out.append(encode_linestring(line))
    return b"".join(out)


def encode(geom_type: str, value) -> bytes:
    t = geom_type
    if t == "Point":
        return encode_point(value[0], value[1])
    if t == "LineString":
        return encode_linestring(value)
    if t == "Polygon":
        return encode_polygon(value)
    if t == "MultiPoint":
        return encode_multipoint(value)
    if t == "MultiLineString":
        return encode_multilinestring(value)
    if t == "MultiPolygon":
        return encode_multipolygon(value)
    raise ValueError(f"unsupported geometry type {geom_type!r}")


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def _endian(self) -> str:
        b = self.buf[self.pos]
        self.pos += 1
        return "<" if b == 1 else ">"

    def u32(self, e: str) -> int:
        v = struct.unpack_from(e + "I", self.buf, self.pos)[0]
        self.pos += 4
        return v

    def coords(self, e: str, n: int) -> np.ndarray:
        arr = np.frombuffer(self.buf, dtype=e + "f8", count=2 * n, offset=self.pos)
        self.pos += 16 * n
        return arr.reshape(n, 2).astype(np.float64, copy=False)

    def geometry(self):
        e = self._endian()
        gtype = self.u32(e) & 0xFF  # mask off Z/M/SRID flag bits
        if gtype == POINT:
            xy = self.coords(e, 1)[0]
            return "Point", (float(xy[0]), float(xy[1]))
        if gtype == LINESTRING:
            return "LineString", self.coords(e, self.u32(e))
        if gtype == POLYGON:
            nrings = self.u32(e)
            return "Polygon", [self.coords(e, self.u32(e)) for _ in range(nrings)]
        if gtype in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON):
            n = self.u32(e)
            parts = [self.geometry()[1] for _ in range(n)]
            if gtype == MULTIPOINT:
                return "MultiPoint", np.asarray(parts, dtype=np.float64)
            return _TYPE_NAMES[gtype], parts
        raise ValueError(f"unsupported WKB geometry type {gtype}")


def decode(buf: bytes):
    """WKB bytes → (type_name, value)."""
    return _Reader(bytes(buf)).geometry()


def as_multipolygon(buf: bytes) -> list[list[np.ndarray]]:
    """Decode and normalize Polygon→[polygon] (the reference's
    single→Multi promotion, SpaVectors.py:308-309,659-663)."""
    t, v = decode(buf)
    if t == "Polygon":
        return [v]
    if t == "MultiPolygon":
        return v
    raise ValueError(f"expected (Multi)Polygon, got {t}")
