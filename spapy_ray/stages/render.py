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

import numpy as np
import pyarrow as pa

from spapy_ray.stages.raster import decode_tile

# PNG encode/decode now delegate to the full pure-stdlib codec
# (kernels/png.py — all five scanline filters, gray/RGB/RGBA, CRC
# verification); the round-3 filter-0-only encoder this module
# carried is retired. Thin wrappers keep the historical render API
# (uint8 (H, W, 3|4) in, same out).

def encode_png(img: np.ndarray) -> bytes:
    """uint8 array (H, W, 3|4) → PNG bytes (kernels/png.py)."""
    from spapy_ray.kernels.png import encode_png as _enc

    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] not in (3, 4):
        raise ValueError("encode_png wants uint8 (H, W, 3|4)")
    return _enc(img)


def decode_png(buf: bytes) -> np.ndarray:
    """Inverse of encode_png — the test-side parity decoder
    (kernels/png.py, any supported filter/color type)."""
    from spapy_ray.kernels.png import decode_png as _dec

    a = _dec(buf)
    if a.ndim != 3:
        raise ValueError("decode_png expects an RGB/RGBA image")
    return a


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
