"""Raster tile tables: the engine's raster model (SURVEY.md §1.2 →
tile-table mapping).

A raster = Arrow/Parquet table, one row per (tile, band):

    tx:int32  ty:int32  band:int32  data:binary  (raw little-endian
    ndarray bytes, tile_size x tile_size)

with grid metadata in :class:`RasterMeta` (geotransform exactly as the
reference: x_min, y_max NW corner, pixel_w > 0, pixel_h < 0 —
SpaRasters.py:113-116). Replaces the in-RAM list-of-2D-bands model
(SpaRasters.py:110,740-745) with a distributable table.

Synthetic DEMs (deterministic, no external data):

- :func:`dem_int_value` — integer surface, exactly reproducible in SQL
  (oracle for zonal stats / histogram / raster math);
- :func:`dem_float_value` — smooth float surface (slope/hillshade
  tests against a whole-array numpy reference).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa


@dataclass(frozen=True)
class RasterMeta:
    width: int           # pixels
    height: int
    tile_size: int
    x_min: float
    y_max: float
    pixel_w: float
    pixel_h: float       # negative (north-up), as in the reference
    nodata: float | None = None
    dtype: str = "int32"

    @property
    def tiles_x(self) -> int:
        return -(-self.width // self.tile_size)

    @property
    def tiles_y(self) -> int:
        return -(-self.height // self.tile_size)

    def pixel_center_lonlat(self, px: np.ndarray, py: np.ndarray):
        """Reference-style pixel→reference conversion
        (SpaRasters.py:349-401), at pixel centers."""
        lon = self.x_min + (np.asarray(px, dtype=np.float64) + 0.5) * self.pixel_w
        lat = self.y_max + (np.asarray(py, dtype=np.float64) + 0.5) * self.pixel_h
        return lon, lat


# Default test raster: whole-globe 512x512 grid of 64-pixel tiles.
DEM_META = RasterMeta(width=512, height=512, tile_size=64,
                      x_min=-180.0, y_max=85.0,
                      pixel_w=360.0 / 512, pixel_h=-170.0 / 512)

MIX_PX = 2654435761
MIX_PY = 40503
M32 = 1 << 32


def dem_int_value(px: np.ndarray, py: np.ndarray, salt: int = 0) -> np.ndarray:
    """Integer surface in [0, 256): exact SQL twin in oracle module."""
    v = (np.asarray(px, dtype=np.uint64) * np.uint64(MIX_PX)
         + np.asarray(py, dtype=np.uint64) * np.uint64(MIX_PY)
         + np.uint64(salt) * np.uint64(7919))
    return ((v & np.uint64(M32 - 1)) % np.uint64(256)).astype(np.int32)


def sql_dem_int(px: str, py: str, salt: int = 0) -> str:
    return (f"((({px} * {MIX_PX} + {py} * {MIX_PY} + {salt} * 7919) "
            f"% {M32}) % 256)")


def dem_float_value(px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """Smooth analytic surface (FIXTURES.md F4): sines + a ridge."""
    x = np.asarray(px, dtype=np.float64)
    y = np.asarray(py, dtype=np.float64)
    return (120.0 * np.sin(x / 37.0) + 80.0 * np.cos(y / 23.0)
            + 0.3 * np.abs((x + y) % 97 - 48.5)).astype(np.float32)


def _tile_ids(meta: RasterMeta) -> np.ndarray:
    txs, tys = np.meshgrid(np.arange(meta.tiles_x), np.arange(meta.tiles_y))
    return np.column_stack([txs.ravel(), tys.ravel()]).astype(np.int32)


def tile_pixels(meta: RasterMeta, tx: int, ty: int) -> tuple[np.ndarray, np.ndarray]:
    """Global (px, py) index grids for one tile (2-D arrays)."""
    t = meta.tile_size
    px = np.arange(tx * t, min((tx + 1) * t, meta.width))
    py = np.arange(ty * t, min((ty + 1) * t, meta.height))
    gx, gy = np.meshgrid(px, py)
    return gx, gy


def synth_dem_table(meta: RasterMeta = DEM_META, kind: str = "int",
                    salt: int = 0, band: int = 0) -> pa.Table:
    """Driver-side synthesis of a full tile table (test scale)."""
    rows = _tile_ids(meta)
    data = []
    for tx, ty in rows:
        gx, gy = tile_pixels(meta, int(tx), int(ty))
        if kind == "int":
            arr = dem_int_value(gx, gy, salt=salt)
        else:
            arr = dem_float_value(gx, gy)
        data.append(np.ascontiguousarray(arr).tobytes())
    return pa.table({
        "tx": pa.array(rows[:, 0], type=pa.int32()),
        "ty": pa.array(rows[:, 1], type=pa.int32()),
        "band": pa.array(np.full(len(rows), band, dtype=np.int32)),
        "data": pa.array(data, type=pa.binary()),
    })


def synth_dem_dataset(meta: RasterMeta = DEM_META, kind: str = "int",
                      salt: int = 0, parallelism: int = -1):
    """Streaming tile synthesis as a Dataset (one row per tile) — the
    distributed source form (ray.data.range over tile ids)."""
    import ray.data as rd

    ntiles = meta.tiles_x * meta.tiles_y

    def _gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy()
        tx = (ids % meta.tiles_x).astype(np.int32)
        ty = (ids // meta.tiles_x).astype(np.int32)
        data = []
        for i in range(len(ids)):
            gx, gy = tile_pixels(meta, int(tx[i]), int(ty[i]))
            arr = dem_int_value(gx, gy, salt) if kind == "int" \
                else dem_float_value(gx, gy)
            data.append(np.ascontiguousarray(arr).tobytes())
        return pa.table({
            "tx": pa.array(tx), "ty": pa.array(ty),
            "band": pa.array(np.zeros(len(ids), dtype=np.int32)),
            "data": pa.array(data, type=pa.binary()),
        })

    ds = rd.range(ntiles, override_num_blocks=parallelism if parallelism > 0 else None)
    return ds.map_batches(_gen, batch_format="pyarrow")


def np_dtype(meta: RasterMeta, kind: str = "int") -> np.dtype:
    return np.dtype("<i4") if kind == "int" else np.dtype("<f4")
