"""Native Esri ASCII Grid (AAIGrid, .asc) reader/writer — no GDAL.

The reference writes .asc through gdal's AAIGrid driver
(SpaRasters.py:752-824, DriverName="AAIGrid") and loads any
gdal-readable raster; this implements the public ASCII grid format
directly against the engine's tile-table raster model.

Format: header lines (ncols, nrows, xllcorner, yllcorner, cellsize,
optional NODATA_value) then nrows rows of ncols whitespace-separated
values, north row first.

Scale note: .asc is a single sequential TEXT file — an interchange
format, not a compute format. The writer streams tile-row strips in
order (per-strip text rendered DISTRIBUTED via map_batches-shaped
groupby(ty), concatenated on the driver in ty order — driver memory
is one tile-row strip); the reader parses on the driver and re-tiles.
Convert to the parquet tile table for anything large.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from spapy_ray.sources.rasters import RasterMeta


def write_aaigrid(ds, meta: RasterMeta, path: str, *, dtype: str,
                  nodata: float | None = None) -> None:
    """Tile Dataset + RasterMeta → .asc file.

    Requires square pixels (AAIGrid has one cellsize); pixel_h is
    negative (north-up) in the engine's meta, matching y-row order.
    """
    from spapy_ray.stages.raster import decode_tile

    if abs(abs(meta.pixel_h) - meta.pixel_w) > 1e-12:
        raise ValueError("AAIGrid needs square pixels (one cellsize)")
    T = meta.tile_size

    def strip_text(g: pa.Table) -> pa.Table:
        """One tile ROW (fixed ty) → its text block, fully assembled."""
        tys = g.column("ty").to_numpy()
        txs = g.column("tx").to_numpy()
        has_hw = "h" in g.schema.names and "w" in g.schema.names
        hs = g.column("h").to_numpy() if has_hw else None
        ws = g.column("w").to_numpy() if has_hw else None
        ty = int(tys[0])
        h = min(T, meta.height - ty * T)
        row = np.full((h, meta.width), nodata if nodata is not None
                      else 0, dtype=np.float64)
        bufs = g.column("data").to_pylist()
        for i, tx in enumerate(txs):
            a = decode_tile(bufs[i], dtype, T,
                            int(hs[i]) if has_hw else None,
                            int(ws[i]) if has_hw else None)
            w = a.shape[1]
            row[:a.shape[0], tx * T:tx * T + w] = a
        is_int = np.issubdtype(np.dtype(dtype), np.integer)
        fmt = "%d" if is_int else "%.10g"
        lines = "\n".join(" ".join(fmt % v for v in r) for r in row)
        return pa.table({"ty": pa.array([ty], type=pa.int64()),
                         "text": pa.array([lines])})

    # strips STREAM to the driver in ty order (sort shuffle + batch
    # iteration): driver memory is one batch of strip texts, never
    # the whole raster's text (the prior full to_pandas concatenated
    # every strip driver-side)
    strips = ds.groupby("ty").map_groups(strip_text,
                                         batch_format="pyarrow") \
        .sort("ty")

    with open(path, "w") as f:
        f.write(f"ncols {meta.width}\n")
        f.write(f"nrows {meta.height}\n")
        f.write(f"xllcorner {meta.x_min!r}\n")
        yll = meta.y_max + meta.pixel_h * meta.height
        f.write(f"yllcorner {yll!r}\n")
        f.write(f"cellsize {meta.pixel_w!r}\n")
        if nodata is not None:
            f.write(f"NODATA_value {nodata!r}\n")
        expect = 0
        for b in strips.iter_batches(batch_format="pyarrow"):
            for ty, text in zip(b.column("ty").to_pylist(),
                                b.column("text").to_pylist()):
                if ty != expect:
                    raise ValueError(
                        f"strip order broke: got ty={ty}, "
                        f"expected {expect}")
                expect += 1
                f.write(text)
                f.write("\n")


def read_aaigrid(path: str, *, tile_size: int = 256,
                 dtype: str | None = None):
    """.asc → (tile Dataset, RasterMeta, nodata). dtype defaults to
    int32 when every value parses as an integer, else float32."""
    import ray.data as rd

    hdr: dict[str, float] = {}
    data_start = 0
    with open(path) as f:
        while True:
            pos = f.tell()
            line = f.readline()
            parts = line.split()
            if len(parts) == 2 and parts[0].lower() in (
                    "ncols", "nrows", "xllcorner", "yllcorner",
                    "cellsize", "nodata_value"):
                hdr[parts[0].lower()] = float(parts[1])
            else:
                data_start = pos
                break
        f.seek(data_start)
        vals = np.loadtxt(f, dtype=np.float64)
    ncols, nrows = int(hdr["ncols"]), int(hdr["nrows"])
    vals = vals.reshape(nrows, ncols)
    nodata = hdr.get("nodata_value")
    if dtype is None:
        dtype = "int32" if np.all(vals == np.floor(vals)) else "float32"
    arr = vals.astype(np.dtype(dtype))
    cell = hdr["cellsize"]
    meta = RasterMeta(width=ncols, height=nrows, tile_size=tile_size,
                      x_min=hdr["xllcorner"],
                      y_max=hdr["yllcorner"] + cell * nrows,
                      pixel_w=cell, pixel_h=-cell)
    rows = []
    for ty in range(-(-nrows // tile_size)):
        for tx in range(-(-ncols // tile_size)):
            tile = arr[ty * tile_size:(ty + 1) * tile_size,
                       tx * tile_size:(tx + 1) * tile_size]
            rows.append({"tx": tx, "ty": ty, "band": 0,
                         "h": tile.shape[0], "w": tile.shape[1],
                         "data": np.ascontiguousarray(tile).tobytes()})
    return rd.from_arrow(pa.Table.from_pylist(rows)), meta, nodata
