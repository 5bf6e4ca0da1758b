"""Cell / tile indexing stage: append quadkey cell ids from lat/lon.

``cell``  — fine resolution (default 12 → ~0.088 deg), the spatial
            shuffle / co-partition key (groupbys, kNN rings).
``tile``  — coarse resolution (default 7 → ~2.8 deg), the output
            partitioning + manifest key (resumable tile runs).

Stored as int64 (ids use < 60 bits) for friction-free Arrow/Parquet/
SQL interop; the SQL twin is kernels.cells.sql_cell_expr.
"""

from __future__ import annotations

import pyarrow as pa

from spapy_ray.kernels import cells

CELL_RES = 12
TILE_RES = 7


def cell_index_batch(batch: pa.Table, cell_res: int = CELL_RES,
                     tile_res: int = TILE_RES) -> pa.Table:
    lat = batch.column("lat").to_numpy(zero_copy_only=False)
    lon = batch.column("lon").to_numpy(zero_copy_only=False)
    cell = cells.encode(lon, lat, cell_res).astype("int64")
    tile = cells.encode(lon, lat, tile_res).astype("int64")
    return batch.append_column("cell", pa.array(cell)) \
                .append_column("tile", pa.array(tile))


def cell_index(ds, cell_res: int = CELL_RES, tile_res: int = TILE_RES,
               batch_size: int = 32768):
    return ds.map_batches(
        lambda t: cell_index_batch(t, cell_res, tile_res),
        batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True)
