"""Engine-side implementations of the driver-checked queries.

Each function takes ``sf_dir`` and returns a lazy ray.data.Dataset (or
a small pandas/pyarrow result). The matching DuckDB SQL lives in
spapy_ray.oracle; column names are kept identical in both (driver
hash-compare contract).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from spapy_ray.pipelines.flagship import pages_dataset
from spapy_ray.sources.zones import zones_table
from spapy_ray.stages.ann import cosine_topk
from spapy_ray.stages.cellindex import cell_index
from spapy_ray.stages.dedup import (dedup_documents_by_text, dedup_pages_agg)
from spapy_ray.stages.geocode import geocode
from spapy_ray.stages.join import pip_join
from spapy_ray.stages.knn import knn_join_broadcast
from spapy_ray.stages.measures import measure_wkb_table
from spapy_ray.stages.relational import broadcast_join
from spapy_ray.stages.text import token_stats


def _read(sf_dir: str, table: str, columns=None, predicate=None):
    """Column-pruned parquet read; ``predicate`` is a
    pyarrow.dataset expression pushed into the fragment scanner
    (row-group + page pruning — rows never leave storage), the
    prune-at-the-read form of a leading filter()."""
    import ray.data as rd

    kwargs = {}
    if predicate is not None:
        kwargs["filter"] = predicate
    return rd.read_parquet(f"{sf_dir}/{table}.parquet",
                           columns=columns, **kwargs)


def _geo(sf_dir: str):
    return geocode(pages_dataset(sf_dir, include_html=False))


def _join(sf_dir: str):
    return pip_join(_geo(sf_dir), zones_table(),
                    left_columns=["url", "warc_ts"],
                    zone_columns=["zone_id", "name", "labelrank"])


def _dem(salt: int = 0):
    from spapy_ray.sources.rasters import DEM_META, synth_dem_dataset

    return synth_dem_dataset(DEM_META, kind="int", salt=salt), DEM_META


CROP_WINDOW = (37, 101, 333, 414)      # deliberately NOT tile-aligned


_E0_US = 1704067200 * 1_000_000          # 2024-01-01 epoch, us
_CAMP_N, _CAMP_SLIDE_US, _CAMP_WIDTH_US = 40, 43_200_000_000, 64_800_000_000


def campaigns_table() -> pa.Table:
    """Deterministic overlapping time intervals (18h windows every
    12h) — the broadcast small side of the range join."""
    c = np.arange(_CAMP_N, dtype=np.int64)
    return pa.table({
        "campaign_id": pa.array(c),
        "lo": pa.array(_E0_US + c * _CAMP_SLIDE_US),
        "hi": pa.array(_E0_US + c * _CAMP_SLIDE_US + _CAMP_WIDTH_US),
    })


def warp_dst_meta():
    """Destination grid for the oracled warp query: equirect meters
    over [-150,150]x[-80,80] at a resolution incommensurate with the
    source DEM (300x200), so nearest-neighbor indices are nontrivial.
    Constants are embedded verbatim into the SQL twin."""
    from spapy_ray.kernels import proj
    from spapy_ray.sources.rasters import RasterMeta

    # deliberately incommensurate with the 0.703125-deg source grid
    # (a round 300-deg/300-px window put nearest-neighbor fractions
    # EXACTLY on .5, where np.rint half-even and SQL round half-away
    # disagree)
    x0 = float(proj.R_SPHERE * np.radians(-149.37))
    x1 = float(proj.R_SPHERE * np.radians(150.89))
    y1 = float(proj.R_SPHERE * np.radians(80.07))
    y0 = float(proj.R_SPHERE * np.radians(-79.53))
    return RasterMeta(width=307, height=211, tile_size=64,
                      x_min=x0, y_max=y1,
                      pixel_w=(x1 - x0) / 307, pixel_h=-(y1 - y0) / 211,
                      dtype="int32")


OVERLAY_BOX = (-60.0, -85.0, 80.0, -55.0)


def zones_with_holes_table() -> pa.Table:
    """Zone layer with a rectangular hole punched into every zone's
    first part (hole = [x0+2w/10, x0+4w/10] x [y0+2h2/10, y0+6h2/10]
    in fixed point — inside the first rectangle of every shape).
    Built from the WKB geometry, not the generator parameters."""
    from spapy_ray.kernels import wkb as _w
    from spapy_ray.sources.zones import U, zone_params

    zt = zones_table()
    out = []
    for i, g in enumerate(zt.column("geom_wkb").to_pylist()):
        p = zone_params(i)
        hx0 = p["x0"] + 2 * p["w"] // 10
        hx1 = p["x0"] + 4 * p["w"] // 10
        hy0 = p["y0"] + 2 * p["h2"] // 10
        hy1 = p["y0"] + 6 * p["h2"] // 10
        hole = np.array([[hx0, hy0], [hx0, hy1], [hx1, hy1], [hx1, hy0]],
                        dtype=np.float64) / U                       # CW
        mp = _w.as_multipolygon(g)
        mp[0].append(hole)
        out.append(_w.encode_multipolygon(mp))
    return zt.set_column(zt.schema.get_field_index("geom_wkb"), "geom_wkb",
                         pa.array(out, type=pa.binary()))


DENSIFY_MAX_SEG = 0.07


CLIP_BOX = (-600_000, -400_000, 600_000, 400_000)


RESAMPLE_DST = dict(width=200, height=200, tile_size=64,
                    x_min=-179.984375, y_max=84.96875,
                    pixel_w=1.7578125, pixel_h=-0.830078125)


CONTOUR_LEVELS = [63.5, 127.5, 191.5]


def _reclassified_dem():
    from spapy_ray.sources.rasters import DEM_META, synth_dem_dataset
    from spapy_ray.stages.raster import reclassify

    return reclassify(synth_dem_dataset(DEM_META, kind="int"),
                      bounds=[0, 64, 128, 192, 256], values=[1, 2, 3, 4],
                      dtype="int32", tile_size=DEM_META.tile_size), DEM_META


_COMP_SORT = ["value", "minx", "miny", "maxx", "maxy", "n_pixels", "n_tiles"]


def _tile_int_stats(ds, dtype: str, tile_size: int):
    """Per-tile integer stats (sum/min/max/count) over decoded tiles;
    honors ragged (h, w) columns when present."""
    from spapy_ray.stages.raster import decode_tile

    def stats(t: pa.Table) -> pa.Table:
        has_hw = "h" in t.schema.names and "w" in t.schema.names
        hs = t.column("h").to_numpy() if has_hw else None
        ws = t.column("w").to_numpy() if has_hw else None
        sums, mins, maxs, ns = [], [], [], []
        for i, b in enumerate(t.column("data").to_pylist()):
            a = decode_tile(b, dtype, tile_size,
                            int(hs[i]) if has_hw else None,
                            int(ws[i]) if has_hw else None)
            sums.append(int(a.sum(dtype=np.int64)))
            mins.append(int(a.min()))
            maxs.append(int(a.max()))
            ns.append(int(a.size))
        return pa.table({
            "tx": pc.cast(t.column("tx"), pa.int64()),
            "ty": pc.cast(t.column("ty"), pa.int64()),
            "sum_v": pa.array(sums, type=pa.int64()),
            "min_v": pa.array(mins, type=pa.int64()),
            "max_v": pa.array(maxs, type=pa.int64()),
            "n_px": pa.array(ns, type=pa.int64())})

    return ds.map_batches(stats, batch_format="pyarrow")


def _grid_boxes_table() -> pa.Table:
    """12 axis-aligned boxes (6x2 grid over the globe, integer
    fixed-point bounds) — the broadcast right side of the
    dataset x dataset overlay; SQL twin in oracle.q_overlay_grid."""
    from spapy_ray.kernels import clip, wkb as _wkb
    from spapy_ray.sources.zones import U

    ids, geoms = [], []
    for b in range(12):
        x0 = -1800000 + (b % 6) * 600000
        y0 = -850000 + (b // 6) * 850000
        ids.append(b)
        geoms.append(_wkb.encode_polygon([clip.bbox_ring(
            x0 / U, y0 / U, (x0 + 600000) / U, (y0 + 850000) / U)]))
    return pa.table({"box_id": pa.array(ids, type=pa.int64()),
                     "geom_wkb": pa.array(geoms, type=pa.binary())})


def _nation_year_qty(sf_dir: str):
    """Shared base for rollup/cube: lineitem x orders hash join, then
    supplier/nation broadcast lookups, projected to
    (n_name, year, l_quantity)."""
    import pyarrow.parquet as pq

    from spapy_ray.stages.relational import hash_join

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_quantity"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate"])
    j = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey")

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    sup = sup.set_column(0, "s_suppkey",
                         pc.cast(sup.column("s_suppkey"), pa.int64()))
    sup = sup.set_column(1, "s_nationkey",
                         pc.cast(sup.column("s_nationkey"), pa.int64()))
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    nat = nat.set_column(0, "n_nationkey",
                         pc.cast(nat.column("n_nationkey"), pa.int64()))

    j = broadcast_join(j, sup, key="l_suppkey", small_key="s_suppkey")
    j = broadcast_join(j, nat, key="s_nationkey", small_key="n_nationkey")

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": t.column("n_name"),
            "year": pc.year(t.column("o_orderdate")),
            "l_quantity": t.column("l_quantity")})

    return j.map_batches(proj, batch_format="pyarrow")


BENFORD_MILLI = (301, 176, 124, 96, 79, 66, 57, 51, 45)


def _cents(col) -> np.ndarray:
    return np.rint(col.to_numpy(zero_copy_only=False) * 100) \
        .astype(np.int64)


def _qty_i(col) -> np.ndarray:
    return np.rint(col.to_numpy(zero_copy_only=False)).astype(np.int64)


def _year_of_us(us: np.ndarray) -> np.ndarray:
    return (us.astype("datetime64[us]").astype("datetime64[Y]")
            .astype(np.int64) + 1970)


_SEARCH_TERMS = ("hash", "join", "filter")


_LOG5 = ((0, 0, -1, 0, 0),
         (0, -1, -2, -1, 0),
         (-1, -2, 16, -2, -1),
         (0, -1, -2, -1, 0),
         (0, 0, -1, 0, 0))


__all__ = [n for n in globals()
           if not n.startswith('__')]
