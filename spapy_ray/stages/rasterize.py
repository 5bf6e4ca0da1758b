"""Rasterize: vector points → raster point-density grid.

The inverse of polygonize closes the raster↔vector pair (SURVEY §2.8
covers only raster→vector; gdal_rasterize is the reference-world
counterpart it shells out to for the other direction). Pixels are the
engine's quadkey grid at ``res`` (2^res per side), so the pixel
assignment shares the proven bit-identical float path of
kernels.cells.xy_for / sql_cell_expr — the oracle recomputes every
pixel count independently in DuckDB.

Scale shape: ONE narrow shuffle (packed tile key + within-tile pixel
index per point — 16 bytes/point regardless of payload), bucketed on
hash(tile) so group count is bounded, then one vectorized bincount
per tile. Output is a standard tile table (tx, ty, band, data int32)
+ RasterMeta, so density grids feed straight into tile math,
reclassify, rendering and overview stages.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from spapy_ray.kernels import cells
from spapy_ray.sources.rasters import RasterMeta
from spapy_ray.util import cluster_cpus

_MIX = np.uint64(0x9E3779B97F4A7C15)


def density_meta(res: int = 9, tile_size: int = 64) -> RasterMeta:
    n = 1 << res
    return RasterMeta(width=n, height=n, tile_size=tile_size,
                      x_min=-180.0, y_max=90.0,
                      pixel_w=360.0 / n, pixel_h=-180.0 / n,
                      dtype="int32")


def rasterize_points(ds, *, res: int = 9, tile_size: int = 64,
                     lat_col: str = "lat", lon_col: str = "lon",
                     buckets: int | None = None):
    """Point Dataset → (tile Dataset(tx, ty, band, data), RasterMeta):
    int32 per-pixel counts on the 2^res world grid (row 0 = north).
    Only tiles containing at least one point are emitted (the tile
    table convention for sparse rasters — absent tile == all zeros).
    """
    n = 1 << res
    if n % tile_size:
        raise ValueError("tile_size must divide 2^res")
    b = buckets or max(64, cluster_cpus() * 4)
    T = tile_size

    def tag(t: pa.Table) -> pa.Table:
        lon = t.column(lon_col).to_numpy(zero_copy_only=False)
        lat = t.column(lat_col).to_numpy(zero_copy_only=False)
        x, y = cells.xy_for(lon, lat, res)
        py = (n - 1) - y                     # north-up raster rows
        tkey = (x // T) * np.int64(n) + (py // T)
        pidx = ((py % T) * T + (x % T)).astype(np.int32)
        hbk = ((tkey.astype(np.uint64) * _MIX) >> np.uint64(33)) \
            % np.uint64(b)
        return pa.table({"_tkey": tkey, "_pidx": pidx,
                         "_bucket": hbk.astype(np.int64)})

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        tk = df["_tkey"].to_numpy()
        order = np.argsort(tk, kind="stable")
        tk = tk[order]
        pidx = df["_pidx"].to_numpy()[order]
        starts = np.concatenate(([0], np.flatnonzero(np.diff(tk)) + 1))
        ends = np.concatenate((starts[1:], [len(tk)]))
        txs, tys, bufs = [], [], []
        for s, e in zip(starts, ends):
            counts = np.bincount(pidx[s:e], minlength=T * T) \
                .astype(np.int32)
            txs.append(int(tk[s]) // n)
            tys.append(int(tk[s]) % n)
            bufs.append(np.ascontiguousarray(counts.reshape(T, T))
                        .tobytes())
        return pd.DataFrame({
            "tx": np.asarray(txs, dtype=np.int32),
            "ty": np.asarray(tys, dtype=np.int32),
            "band": np.zeros(len(txs), dtype=np.int32),
            "data": bufs})

    tiles = ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(per_bucket, batch_format="pandas")
    return tiles, density_meta(res, tile_size)
