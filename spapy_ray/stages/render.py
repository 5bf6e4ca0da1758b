"""Raster tile rendering: color ramp → RGBA → PNG, no imaging libs.

The reference's rendering layer (SpaView.py:50-597, SpaPlot.py:30-164)
draws through matplotlib; SURVEY §2.9 scopes interactive rendering out
of the engine. What a data ENGINE does need at scale is the tile-server
form of the same feature: classify each raster tile through a color
table and emit one PNG per tile, embarrassingly parallel over the tile
table. This module supplies that with a pure-stdlib PNG codec
(zlib + struct — RFC 2083 signature/IHDR/IDAT/IEND, filter 0).

Exactness: the oracled query uses a DISCRETE ramp (searchsorted class
→ fixed RGB), so per-tile channel sums are integer-exact and SQL-
expressible as a CASE over the synthetic DEM's closed form. The
piecewise-linear gdaldem ramp lives in raster.color_relief (np.interp
— pytest-covered; float interpolation order is not worth mirroring in
SQL, see DIVERGENCES.md).

Scale notes: one task per tile batch, output rows are (tx, ty, small
png binary + int sums) — no driver materialization; PNG encode cost is
per-pixel vectorized except the final zlib.compress (C code).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

from spapy_ray.stages.raster import decode_tile

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def encode_png(img: np.ndarray) -> bytes:
    """uint8 array (H, W, 3|4) → PNG bytes (8-bit RGB/RGBA, filter 0)."""
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] not in (3, 4):
        raise ValueError("encode_png wants uint8 (H, W, 3|4)")
    h, w, ch = img.shape
    color_type = 2 if ch == 3 else 6
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # one filter byte (0 = None) per row, then raw pixels
    raw = np.empty((h, 1 + w * ch), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = img.reshape(h, w * ch)
    idat = zlib.compress(raw.tobytes(), 6)
    return (_PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def decode_png(buf: bytes) -> np.ndarray:
    """Inverse of encode_png (filter-0 8-bit RGB/RGBA only) — the
    test-side parity decoder."""
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, w = 8, b"", 0
    while pos < len(buf):
        (ln,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4:pos + 8]
        payload = buf[pos + 8:pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ct = struct.unpack_from(">IIBB", payload)
            if depth != 8 or ct not in (2, 6):
                raise ValueError("decode_png handles 8-bit RGB/RGBA only")
            ch = 3 if ct == 2 else 4
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + ln
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    raw = raw.reshape(h, 1 + w * ch)
    if raw[:, 0].any():
        raise ValueError("decode_png handles filter 0 only")
    return raw[:, 1:].reshape(h, w, ch).copy()


# gdaldem-style discrete table: value < breaks[i] → colors[i];
# >= last break → colors[-1]
DEFAULT_RENDER_BREAKS = (64, 128, 192)
DEFAULT_RENDER_COLORS = ((38, 70, 83), (42, 157, 143),
                         (233, 196, 106), (231, 111, 81))


def classify_rgb(a: np.ndarray, breaks, colors) -> np.ndarray:
    """values (H, W) → uint8 (H, W, 3) via right-open class intervals."""
    lut = np.asarray(colors, dtype=np.uint8)
    cls = np.searchsorted(np.asarray(breaks, dtype=np.float64), a,
                          side="right")
    return lut[cls]


def render_tiles(ds, *, dtype: str, tile_size: int,
                 breaks=DEFAULT_RENDER_BREAKS,
                 colors=DEFAULT_RENDER_COLORS,
                 include_png: bool = True):
    """Tile table (tx, ty, data) → (tx, ty, r_sum, g_sum, b_sum
    [, png]) — one rendered PNG per tile plus integer channel sums
    (the SQL-checkable projection of the rendered pixels)."""
    if len(colors) != len(breaks) + 1:
        raise ValueError("need len(colors) == len(breaks) + 1")

    def _batch(t: pa.Table) -> pa.Table:
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        sums = np.zeros((t.num_rows, 3), dtype=np.int64)
        pngs: list[bytes] = []
        for i, buf in enumerate(t.column("data").to_pylist()):
            a = decode_tile(buf, dtype, tile_size)
            rgb = classify_rgb(a, breaks, colors)
            sums[i] = rgb.reshape(-1, 3).sum(axis=0, dtype=np.int64)
            if include_png:
                pngs.append(encode_png(rgb))
        cols = {
            "tx": pa.array(txs.astype(np.int64)),
            "ty": pa.array(tys.astype(np.int64)),
            "r_sum": pa.array(sums[:, 0]),
            "g_sum": pa.array(sums[:, 1]),
            "b_sum": pa.array(sums[:, 2]),
        }
        if include_png:
            cols["png"] = pa.array(pngs, type=pa.binary())
        return pa.table(cols)

    return ds.map_batches(_batch, batch_format="pyarrow")
