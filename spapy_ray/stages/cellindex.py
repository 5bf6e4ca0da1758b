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


def tile_pyramid(geo_ds, *, res_hi: int = TILE_RES, res_lo: int = 3,
                 count_col: str = "n_pages"):
    """Multi-resolution tile count pyramid: per-tile point counts at
    every resolution in [res_lo, res_hi], as one Dataset
    (res, tile, count).

    Scale shape: the raw points are aggregated ONCE (the combiner
    count at res_hi — shuffle volume O(distinct tiles x blocks), not
    O(points)); every coarser level is then rolled up from the
    res_hi counts in a SINGLE groupby on the res_lo ancestor — all
    intermediate levels are derived locally inside the group, so the
    whole pyramid costs one wide pass + one tiny shuffle regardless
    of depth. Group size is bounded by 4^(res_hi - res_lo) cells;
    split deeper pyramids into two hops if that bound outgrows a
    worker (res 12→7 then 7→3).

    Roll-up correctness rests on parent() truncation == direct
    coarse encode: floor(floor(v * 2^r) / 2) == floor(v * 2^(r-1)),
    clipping included — so the SQL twin can recompute each level
    independently from the raw points.
    """
    if not 0 <= res_lo <= res_hi:
        raise ValueError("need 0 <= res_lo <= res_hi")
    import numpy as np
    import pandas as pd

    from spapy_ray.stages.relational import pre_aggregated_count

    fine = pre_aggregated_count(
        geo_ds.map_batches(
            lambda t: cell_index_batch(t, cell_res=res_hi,
                                       tile_res=res_hi)
            .select(["tile"]),
            batch_format="pyarrow"),
        "tile", alias=count_col)

    def tag_root(t: pa.Table) -> pa.Table:
        tile = t.column("tile").to_numpy().astype("uint64")
        root = cells.parent(tile, res_lo).astype("int64")
        return t.append_column("_root", pa.array(root))

    def rollup(df: pd.DataFrame) -> pd.DataFrame:
        tiles = df["tile"].to_numpy().astype("uint64")
        counts = df[count_col].to_numpy().astype("int64")
        out_res = [np.full(len(tiles), res_hi, dtype=np.int64)]
        out_tile = [tiles.astype("int64")]
        out_n = [counts]
        for r in range(res_hi - 1, res_lo - 1, -1):
            up = cells.parent(tiles, r).astype("int64")
            agg = pd.DataFrame({"t": up, "n": counts}) \
                .groupby("t", sort=False)["n"].sum().reset_index()
            tiles = agg["t"].to_numpy().astype("uint64")
            counts = agg["n"].to_numpy().astype("int64")
            out_res.append(np.full(len(tiles), r, dtype=np.int64))
            out_tile.append(tiles.astype("int64"))
            out_n.append(counts)
        return pd.DataFrame({"res": np.concatenate(out_res),
                             "tile": np.concatenate(out_tile),
                             count_col: np.concatenate(out_n)})

    return fine.map_batches(tag_root, batch_format="pyarrow") \
        .groupby("_root").map_groups(rollup, batch_format="pandas")
