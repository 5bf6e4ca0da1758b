"""Raster operators over tile tables.

Replaces the reference's per-band numpy ops + GDAL utilities
(SpaRasters.Math SpaRasters.py:894-985, one-liners 1640-2073,
Reclassify 1170-1217, Crop 1235-1282, GetMinMax 456-490, GetHistogram
571-620) with tile-parallel Ray Data stages:

- scalar / unary math, reclassify, crop  → stateless map_batches
- raster ⊗ raster                        → co-partition groupby on
                                           (tx, ty, band) (tile-key join)
- min/max/histogram                      → per-tile partials + tiny
                                           global aggregate
- zonal stats (north rule)               → tile × zone PIP masks →
                                           groupby(zone_id)
- slope / hillshade (Horn 1981)          → 1-px halo exchange:
                                           flat_map strips → groupby(tile)

The nodata convention follows the reference: a mask of
``data == nodata`` pixels is carried through ops and re-substituted on
output (SpaRasters.py:105-107, 749-750, 817-819).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from spapy_ray.sources.rasters import RasterMeta

# ---- operation table (reference one-liner set, SpaRasters.py:1640-2073)
UNARY_OPS = {
    "not": lambda a: (~(a.astype(bool))).astype(np.uint8),
    "round": np.round, "floor": np.floor, "ceil": np.ceil,
    "trunc": np.trunc, "ln": np.log,
    # reference bug: Log computes natural log (SpaRasters.py:2006-2017);
    # we implement the documented log10 — recorded in DIVERGENCES.md
    "log": np.log10,
    "exp": np.exp, "square": np.square, "sqrt": np.sqrt, "abs": np.abs,
}
BINARY_OPS = {
    "add": np.add, "subtract": np.subtract, "multiply": np.multiply,
    "divide": np.divide, "power": np.power,
    "maximum": np.maximum, "minimum": np.minimum,
    "equal": lambda a, b: np.equal(a, b).astype(np.uint8),
    "not_equal": lambda a, b: np.not_equal(a, b).astype(np.uint8),
    "less": lambda a, b: np.less(a, b).astype(np.uint8),
    "greater": lambda a, b: np.greater(a, b).astype(np.uint8),
    "less_equal": lambda a, b: np.less_equal(a, b).astype(np.uint8),
    "greater_equal": lambda a, b: np.greater_equal(a, b).astype(np.uint8),
    "and": lambda a, b: (a.astype(bool) & b.astype(bool)).astype(np.uint8),
    "or": lambda a, b: (a.astype(bool) | b.astype(bool)).astype(np.uint8),
}


def decode_tile(buf: bytes, dtype: str, tile_size: int,
                h: int | None = None, w: int | None = None) -> np.ndarray:
    """Tile bytes → 2-D array. Pass explicit (h, w) for ragged tiles
    (crop output carries them as columns); without them the tile is
    assumed FULL-WIDTH (w == tile_size), which holds for every
    tile-aligned raster in the engine. A ragged-width tile decoded
    without (h, w) would silently transpose — hence the contract."""
    a = np.frombuffer(buf, dtype=np.dtype(dtype).newbyteorder("<"))
    if h is not None and w is not None:
        return a.reshape(h, w)
    n = len(a)
    w = tile_size if n % tile_size == 0 else n
    return a.reshape(n // w, w)


def _map_tiles(ds, fn, dtype: str, tile_size: int, out_dtype: str | None = None):
    """Apply ``fn(array) -> array`` to every tile (stateless tasks)."""
    def _batch(t: pa.Table) -> pa.Table:
        bufs = t.column("data").to_pylist()
        out = [np.ascontiguousarray(fn(decode_tile(b, dtype, tile_size))).tobytes()
               for b in bufs]
        return t.set_column(t.schema.get_field_index("data"), "data",
                            pa.array(out, type=pa.binary()))

    return ds.map_batches(_batch, batch_format="pyarrow")


def tile_math(ds, op: str, operand: float | None = None, *,
              dtype: str, tile_size: int, nodata: float | None = None,
              swap: bool = False):
    """raster ⊗ scalar / unary math (reference Math dispatch,
    SpaRasters.py:894-985; scalar/raster argument order normalized by
    ``swap`` like the one-liners do)."""
    if operand is None:
        fn0 = UNARY_OPS[op]
        fn = fn0
    else:
        b = operand
        bop = BINARY_OPS[op]
        fn = (lambda a: bop(b, a)) if swap else (lambda a: bop(a, b))
    if nodata is None:
        return _map_tiles(ds, fn, dtype, tile_size)

    def masked(a: np.ndarray) -> np.ndarray:
        m = a == nodata
        r = fn(a)
        # predicate/bool ops yield uint8 — promote so the nodata
        # sentinel (often negative) is representable before
        # re-substitution (ADVICE r1: OverflowError / modular wrap)
        r = r.astype(np.result_type(r.dtype, np.min_scalar_type(nodata)),
                     copy=True)
        r[m] = nodata
        return r

    return _map_tiles(ds, masked, dtype, tile_size)


def reclassify(ds, bounds: list[float], values: list[float], *,
               dtype: str, tile_size: int):
    """Range reclassify (SpaRasters.py:1170-1217): value v → values[i]
    where bounds[i] <= v < bounds[i+1]; len(values) = len(bounds)-1."""
    b = np.asarray(bounds, dtype=np.float64)
    v = np.asarray(values)

    def fn(a: np.ndarray) -> np.ndarray:
        idx = np.clip(np.searchsorted(b, a, side="right") - 1, 0, len(v) - 1)
        return v[idx].astype(a.dtype)

    return _map_tiles(ds, fn, dtype, tile_size)


def crop_aligned(ds, tx0: int, ty0: int, tx1: int, ty1: int):
    """Tile-aligned crop: keep tiles in [tx0,tx1)x[ty0,ty1), rebase
    tile coords to the crop origin (reference Crop / ExtractByPixels,
    SpaRasters.py:1235-1282, restricted to tile multiples)."""
    import pyarrow.compute as pc

    def _batch(t: pa.Table) -> pa.Table:
        tx = t.column("tx")
        ty = t.column("ty")
        mask = pc.and_(
            pc.and_(pc.greater_equal(tx, tx0), pc.less(tx, tx1)),
            pc.and_(pc.greater_equal(ty, ty0), pc.less(ty, ty1)))
        out = t.filter(mask)
        out = out.set_column(out.schema.get_field_index("tx"), "tx",
                             pc.subtract(out.column("tx"), tx0))
        return out.set_column(out.schema.get_field_index("ty"), "ty",
                              pc.subtract(out.column("ty"), ty0))

    return ds.map_batches(_batch, batch_format="pyarrow")


def tile_binary_math(ds_a, ds_b, op: str, *, dtype: str, tile_size: int,
                     block: int = 8):
    """raster ⊗ raster: co-partition both tile tables on a BLOCKED
    tile key and pair vectorized inside each block. This is the
    tile-key shuffle join (SURVEY.md §2.7) — at scale both sides hash
    to the same partitions, no broadcast.

    A direct ``groupby((tx, ty, band)).map_groups`` would invoke
    Python once per 2-row group (~1 ms each — the near-singleton-key
    anti-pattern, NOTES_r2); instead tiles bucket by the spatial
    super-block ``(tx//block, ty//block, band)``, ONE groupby
    co-locates both sides, and each group sorts + pairs its
    ≤ 2·block² rows in one call. Per-group Python overhead amortizes
    ~block²×; group payload stays bounded (block² tile pairs)
    independent of raster size, and no ``count()`` of a derived
    dataset is needed to size buckets."""
    fn = BINARY_OPS[op]

    def tag(side: int):
        def _t(t: pa.Table) -> pa.Table:
            tx = t.column("tx").to_numpy().astype(np.int64)
            ty = t.column("ty").to_numpy().astype(np.int64)
            band = t.column("band").to_numpy().astype(np.int64)
            # pack (tx//block, ty//block, band) into one int64 key
            bk = (((tx // block) << np.int64(24))
                  ^ ((ty // block) << np.int64(4)) ^ band)
            t = t.append_column("bk__", pa.array(bk))
            return t.append_column("side__", pa.array(
                np.full(len(t), side, dtype=np.int8)))
        return _t

    both = ds_a.map_batches(tag(0), batch_format="pyarrow").union(
        ds_b.map_batches(tag(1), batch_format="pyarrow"))

    has_hw = "h" in ds_a.schema().names and "w" in ds_a.schema().names

    def bucket_pair(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["tx", "ty", "band", "side__"], kind="stable")
        n = len(g)
        keys = g[["tx", "ty", "band"]].to_numpy()
        if n % 2 or not (keys[0::2] == keys[1::2]).all() \
                or not (g["side__"].to_numpy()[0::2] == 0).all():
            raise ValueError("tile join expects exactly one tile per "
                             "side per (tx, ty, band) key")
        data = g["data"].to_numpy()
        hs = g["h"].to_numpy() if has_hw else None
        ws = g["w"].to_numpy() if has_hw else None
        out = []
        for i in range(0, n, 2):
            a = decode_tile(data[i], dtype, tile_size,
                            hs[i] if has_hw else None,
                            ws[i] if has_hw else None)
            b = decode_tile(data[i + 1], dtype, tile_size,
                            hs[i + 1] if has_hw else None,
                            ws[i + 1] if has_hw else None)
            out.append(np.ascontiguousarray(fn(a, b)).tobytes())
        res = {"tx": keys[0::2, 0], "ty": keys[0::2, 1],
               "band": keys[0::2, 2], "data": out}
        if has_hw:
            res["h"] = hs[0::2]
            res["w"] = ws[0::2]
        return pd.DataFrame(res)

    return both.groupby("bk__").map_groups(bucket_pair, batch_format="pandas")


# ------------------------------------------------------- aggregates

def raster_minmax(ds, *, dtype: str, tile_size: int, nodata: float | None = None):
    """Global (min, max, n_pixels): per-tile partials → one aggregate
    (replaces the pure-Python pixel loop, SpaRasters.py:456-490)."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(t: pa.Table) -> pa.Table:
        has_hw = "h" in t.schema.names and "w" in t.schema.names
        hs = t.column("h").to_pylist() if has_hw else None
        ws = t.column("w").to_pylist() if has_hw else None
        mins, maxs, counts = [], [], []
        for i, b in enumerate(t.column("data").to_pylist()):
            a = decode_tile(b, dtype, tile_size,
                            hs[i] if has_hw else None,
                            ws[i] if has_hw else None)
            if nodata is not None:
                a = a[a != nodata]
            mins.append(a.min() if a.size else None)
            maxs.append(a.max() if a.size else None)
            counts.append(int(a.size))
        return pa.table({"tmin": pa.array(np.asarray(mins, dtype=np.float64)),
                         "tmax": pa.array(np.asarray(maxs, dtype=np.float64)),
                         "tcount": pa.array(counts, type=pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow").aggregate(
        Min("tmin", alias_name="min_z"), Max("tmax", alias_name="max_z"),
        Sum("tcount", alias_name="n_pixels"))


def raster_histogram(ds, *, dtype: str, tile_size: int, nbins: int,
                     lo: float, hi: float):
    """Per-tile np.histogram partials with shared edges → vector-sum
    reduce (replaces the 2-pass Python binning loop,
    SpaRasters.py:571-620). Returns Dataset(bin, n_pixels)."""
    from ray.data.aggregate import Sum

    width = (hi - lo) / nbins

    def partial(t: pa.Table) -> pa.Table:
        bins_out, counts_out = [], []
        for b in t.column("data").to_pylist():
            a = decode_tile(b, dtype, tile_size).ravel()
            idx = np.clip(((a - lo) / width).astype(np.int64), 0, nbins - 1)
            c = np.bincount(idx, minlength=nbins)
            nz = np.nonzero(c)[0]
            bins_out.append(nz.astype(np.int64))
            counts_out.append(c[nz].astype(np.int64))
        return pa.table({"bin": pa.array(np.concatenate(bins_out)),
                         "n": pa.array(np.concatenate(counts_out))})

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("bin").aggregate(Sum("n", alias_name="n_pixels"))
              .select_columns(["bin", "n_pixels"]))


# ------------------------------------------------------- zonal stats

class ZonalPartials:
    """Actor: tile → per-zone partial (count, sum, min, max).

    Zones broadcast once (ray.put → __init__); pixel centers from the
    geotransform; membership via the same STRtree + ray-cast PIP as
    the vector join — the north rule's "raster-to-vector zonal stats".
    """

    def __init__(self, zones_ref=None, zones_table=None,
                 meta: RasterMeta = None, dtype: str = "int32"):
        from spapy_ray.stages.join import ZoneIndex

        if zones_table is None:
            import ray
            zones_table = ray.get(zones_ref)
        self.index = ZoneIndex(zones_table)
        self.meta = meta
        self.dtype = dtype

    def __call__(self, t: pa.Table) -> pa.Table:
        meta = self.meta
        zid, cnt, ssum, smin, smax = [], [], [], [], []
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        for i, buf in enumerate(t.column("data").to_pylist()):
            a = decode_tile(buf, self.dtype, meta.tile_size)
            from spapy_ray.sources.rasters import tile_pixels

            gx, gy = tile_pixels(meta, int(txs[i]), int(tys[i]))
            lon, lat = meta.pixel_center_lonlat(gx.ravel(), gy.ravel())
            pi, zi = self.index.query(lon, lat)
            if len(pi) == 0:
                continue
            vals = a.ravel()[pi].astype(np.int64)
            order = np.argsort(zi, kind="stable")
            zi, vals = zi[order], vals[order]
            uz, starts = np.unique(zi, return_index=True)
            ends = np.append(starts[1:], len(zi))
            for u, s, e in zip(uz, starts, ends):
                zid.append(int(self.index.zone_ids[u]))
                cnt.append(int(e - s))
                ssum.append(int(vals[s:e].sum()))
                smin.append(int(vals[s:e].min()))
                smax.append(int(vals[s:e].max()))
        return pa.table({"zone_id": pa.array(zid, type=pa.int64()),
                         "n_pixels": pa.array(cnt, type=pa.int64()),
                         "sum_z": pa.array(ssum, type=pa.int64()),
                         "min_z": pa.array(smin, type=pa.int64()),
                         "max_z": pa.array(smax, type=pa.int64())})


def zonal_stats(ds, zones: pa.Table, meta: RasterMeta, *, dtype: str = "int32",
                concurrency=None, batch_size: int = 16):
    """tile table × zone polygons → per-zone (count, sum, min, max)."""
    import ray
    from ray.data.aggregate import Max, Min, Sum

    from spapy_ray.util import cached_state

    box = (ray.put(zones),)

    def _task(t: pa.Table) -> pa.Table:
        worker = cached_state(
            box, lambda zt: ZonalPartials(zones_table=zt, meta=meta,
                                          dtype=dtype))
        return worker(t)

    partials = ds.map_batches(_task, batch_format="pyarrow",
                              batch_size=batch_size, zero_copy_batch=True)
    return partials.groupby("zone_id").aggregate(
        Sum("n_pixels", alias_name="n_pixels"),
        Sum("sum_z", alias_name="sum_z"),
        Min("min_z", alias_name="min_z"),
        Max("max_z", alias_name="max_z"),
    ).select_columns(["zone_id", "n_pixels", "sum_z", "min_z", "max_z"])


# ------------------------------------------------------- halo stencils
#
# ---- super-block bucketing helpers (VERDICT r3 #1) ----------------
#
# Every per-tile assembly below used to run as
# ``groupby(["tx","ty"]).map_groups`` — one ~1 ms Python invocation
# per 1-9-row group, the near-singleton-key anti-pattern that
# tile_binary_math already fixed. The shared pattern now: tag rows
# with a packed (tx//block, ty//block) super-block key, ONE groupby
# co-locates each block's ~block² tiles, and a vectorized
# lexsort + boundary-slice walk inside the bucket hands each tile's
# rows to the assembly kernel as raw numpy slices. Per-group Python
# overhead amortizes ~block²×; bucket payload stays bounded
# (block² tiles + halos) independent of raster size.

def _auto_block(meta: RasterMeta, cap: int = 8) -> int:
    """Super-block side for per-tile bucketing: big enough to
    amortize the ~1 ms per-group Python cost over ~block² tiles,
    small enough that the raster still yields ≥ ~4 groups per CPU
    (a fixed block=8 put a whole 8×8-tile sandbox raster into ONE
    bucket and serialized it — measured 2.5× on contour pieces)."""
    from spapy_ray.util import cluster_cpus

    n = meta.tiles_x * meta.tiles_y
    b = int(np.sqrt(max(1, n // (4 * cluster_cpus()))))
    return max(1, min(cap, b))


def _block_tagger(tx_col: str, ty_col: str, block: int):
    """map_batches fn appending ``bk__`` = packed super-block key."""
    def _tag(t: pa.Table) -> pa.Table:
        tx = t.column(tx_col).to_numpy().astype(np.int64)
        ty = t.column(ty_col).to_numpy().astype(np.int64)
        bk = ((tx // block) << np.int64(32)) | (ty // block)
        return t.append_column("bk__", pa.array(bk))
    return _tag


def _tile_runs(txs: np.ndarray, tys: np.ndarray):
    """lexsort rows by (tx, ty) → (order, starts, ends) of the
    per-tile runs in the sorted order. No pandas sub-frames, no
    per-group hashing — the NOTES_r3 boundary-slice pattern."""
    order = np.lexsort((tys, txs))
    k = (txs[order].astype(np.int64) << np.int64(32)) \
        | tys[order].astype(np.int64)
    starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
    ends = np.r_[starts[1:], len(k)]
    return order, starts, ends


def horn_slope_aspect(pad: np.ndarray, cellsize_x: float, cellsize_y: float):
    """Horn (1981) 3x3 gradient on a padded array → (slope_rad, aspect_rad)
    for the core region. Public formula, same as gdaldem slope."""
    z = pad.astype(np.float64)
    a = z[:-2, :-2]; b = z[:-2, 1:-1]; c = z[:-2, 2:]
    d = z[1:-1, :-2];                  f = z[1:-1, 2:]
    g = z[2:, :-2]; h = z[2:, 1:-1]; i = z[2:, 2:]
    dzdx = ((c + 2 * f + i) - (a + 2 * d + g)) / (8.0 * cellsize_x)
    dzdy = ((g + 2 * h + i) - (a + 2 * b + c)) / (8.0 * cellsize_y)
    slope = np.arctan(np.hypot(dzdx, dzdy))
    aspect = np.arctan2(dzdy, -dzdx)
    return slope, aspect


def hillshade_constants(azimuth_deg: float = 315.0,
                        altitude_deg: float = 45.0):
    """(ca, sa, cz, sz) — shared by the kernel and the SQL oracle so
    both embed the exact same float64 constants."""
    az = float(np.radians(360.0 - azimuth_deg + 90.0))
    zen = float(np.radians(90.0 - altitude_deg))
    import math
    return math.cos(az), math.sin(az), math.cos(zen), math.sin(zen)


def hillshade_kernel(pad: np.ndarray, cellsize_x: float, cellsize_y: float,
                     azimuth_deg: float = 315.0, altitude_deg: float = 45.0) -> np.ndarray:
    """255-scaled Horn/gdaldem illumination.

    NOTE (DIVERGENCES.md #11): this is gdaldem semantics, NOT the
    reference's SpaTopo.py:51-80 Hillshade (which uses numpy.gradient
    without cellsize and scales 255*(shaded+1)/2).

    Trig-free algebraic form — with g = hypot(dzdx, dzdy):
        cos(atan g) = 1/sqrt(1+g^2),  sin(atan g) = g/sqrt(1+g^2),
        cos(az - aspect) = (ca*(-dzdx) + sa*dzdy)/g
    so   shade = (cz + sz*(ca*(-dzdx) + sa*dzdy)) / sqrt(1+dzdx^2+dzdy^2).
    Every op is IEEE-deterministic (* + / sqrt), which makes the whole
    kernel bit-reproducible in SQL (oracle.q_hillshade_stats).
    """
    z = pad.astype(np.float64)
    a = z[:-2, :-2]; b = z[:-2, 1:-1]; c = z[:-2, 2:]
    d = z[1:-1, :-2];                  f = z[1:-1, 2:]
    g = z[2:, :-2]; h = z[2:, 1:-1]; i = z[2:, 2:]
    dzdx = ((c + 2 * f + i) - (a + 2 * d + g)) / (8.0 * cellsize_x)
    dzdy = ((g + 2 * h + i) - (a + 2 * b + c)) / (8.0 * cellsize_y)
    ca, sa, cz, sz = hillshade_constants(azimuth_deg, altitude_deg)
    shaded = ((cz + sz * (ca * (-dzdx) + sa * dzdy))
              / np.sqrt(1.0 + dzdx * dzdx + dzdy * dzdy))
    return (255.0 * np.clip(shaded, 0.0, 1.0)).astype(np.float32)


# ---- block-mosaic halo exchange (round-4 rework #2) ---------------
#
# The original exchange emitted up to NINE fragment rows per tile
# (core + 8 neighbor strips) — at 409,600 tiles that is 3.7M rows
# through the sort shuffle and throughput collapsed superlinearly
# (15.1k → 5.5k tiles/s at 4× the tiles). Tiles of one super-block
# are co-located by construction, so interior halos never need to
# travel: ship each CORE once (keyed by its own block) plus only the
# 1-px strips that CROSS a block boundary (~0.5 extra rows/tile at
# B=8), assemble ONE (B·T+2)² mosaic per bucket, and hand every
# kernel its tile's pad as a zero-copy VIEW of the mosaic.

def _halo_block_rows(t: pa.Table, meta: RasterMeta, dtype: str,
                     block: int, halo: int = 1) -> pa.Table:
    """Tile batch → core rows + cross-block halo strips, tagged with
    the destination super-block key ``bk__``. ``halo`` is the strip
    width in pixels (1 for the 3×3 kernels; up to tile_size for wider
    windows — the strip payload scales linearly, the row count does
    not)."""
    txs = t.column("tx").to_numpy()
    tys = t.column("ty").to_numpy()
    out_bk, out_tx, out_ty, out_dx, out_dy, out_data = \
        [], [], [], [], [], []
    for i, buf in enumerate(t.column("data").to_pylist()):
        tx, ty = int(txs[i]), int(tys[i])
        own = ((tx // block) << 32) | (ty // block)
        out_bk.append(own)
        out_tx.append(tx)
        out_ty.append(ty)
        out_dx.append(0)
        out_dy.append(0)
        out_data.append(buf)                 # core ships unsliced
        a = None
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                ntx, nty = tx + dx, ty + dy
                if not (0 <= ntx < meta.tiles_x
                        and 0 <= nty < meta.tiles_y):
                    continue
                nbk = ((ntx // block) << 32) | (nty // block)
                if nbk == own:               # co-located: no traffic
                    continue
                if a is None:
                    a = decode_tile(buf, dtype, meta.tile_size)
                sl_x = slice(None) if dx == 0 else \
                    (slice(-halo, None) if dx == 1
                     else slice(0, halo))
                sl_y = slice(None) if dy == 0 else \
                    (slice(-halo, None) if dy == 1
                     else slice(0, halo))
                out_bk.append(nbk)
                out_tx.append(tx)
                out_ty.append(ty)
                out_dx.append(dx)            # direction TOWARD dest
                out_dy.append(dy)
                out_data.append(np.ascontiguousarray(
                    a[sl_y, sl_x]).tobytes())
    return pa.table({
        "bk__": pa.array(out_bk, type=pa.int64()),
        "tx": pa.array(out_tx, type=pa.int32()),
        "ty": pa.array(out_ty, type=pa.int32()),
        "dx": pa.array(out_dx, type=pa.int8()),
        "dy": pa.array(out_dy, type=pa.int8()),
        "data": pa.array(out_data, type=pa.binary()),
    })


def _block_mosaic_tiles(g: pd.DataFrame, meta: RasterMeta, dtype: str,
                        block: int, halo: int = 1):
    """One bucket's rows → (mosaic with an ``halo``-px apron, tx0,
    ty0, [(tx, ty), ...] core tiles). Each tile's padded array is
    ``mosaic[(ty-ty0)*T:(ty-ty0)*T+T+2h, (tx-tx0)*T:(tx-tx0)*T+T+2h]``
    — a view, no copy. Raster-exterior apron cells are edge-
    replicated, columns first then rows (the np.pad(mode='edge')
    convention — Horn kernel boundary)."""
    T = meta.tile_size
    hp = halo
    txs = g["tx"].to_numpy()
    tys = g["ty"].to_numpy()
    dxs = g["dx"].to_numpy()
    dys = g["dy"].to_numpy()
    datas = g["data"].to_numpy()
    core = (dxs == 0) & (dys == 0)
    ctx, cty = txs[core], tys[core]
    bx, by = int(ctx[0]) // block, int(cty[0]) // block
    tx0, ty0 = bx * block, by * block
    nx = min(block, meta.tiles_x - tx0)
    ny = min(block, meta.tiles_y - ty0)
    dt = np.dtype(dtype)
    mosaic = np.zeros((ny * T + 2 * hp, nx * T + 2 * hp), dtype=dt)
    le = dt.newbyteorder("<")
    for k in np.flatnonzero(core):
        a = np.frombuffer(datas[k], dtype=le).reshape(T, T)
        oy = (int(tys[k]) - ty0) * T + hp
        ox = (int(txs[k]) - tx0) * T + hp
        mosaic[oy:oy + T, ox:ox + T] = a
    # incoming cross-block strips land at their global pixel coords
    for k in np.flatnonzero(~core):
        tx, ty = int(txs[k]), int(tys[k])
        dx, dy = int(dxs[k]), int(dys[k])
        gx0 = tx * T + (T - hp if dx == 1 else 0)
        gy0 = ty * T + (T - hp if dy == 1 else 0)
        w = hp if dx != 0 else T
        h = hp if dy != 0 else T
        frag = np.frombuffer(datas[k], dtype=le).reshape(h, w)
        oy = gy0 - ty0 * T + hp
        ox = gx0 - tx0 * T + hp
        mosaic[oy:oy + h, ox:ox + w] = frag
    # raster-exterior apron: edge replication, columns then rows
    if tx0 == 0:
        mosaic[:, :hp] = mosaic[:, hp:hp + 1]
    if tx0 + nx == meta.tiles_x:
        mosaic[:, -hp:] = mosaic[:, -hp - 1:-hp]
    if ty0 == 0:
        mosaic[:hp, :] = mosaic[hp:hp + 1, :]
    if ty0 + ny == meta.tiles_y:
        mosaic[-hp:, :] = mosaic[-hp - 1:-hp, :]
    order = np.lexsort((cty, ctx))
    tiles = [(int(ctx[j]), int(cty[j])) for j in order]
    return mosaic, tx0, ty0, tiles


def _stencil_bucketed(ds, meta: RasterMeta, named_kernels: dict, *,
                      dtype: str, out_dtype: str,
                      block: int | None = None, halo: int = 1):
    """Shared engine for the halo stencils: block-mosaic halo
    exchange → one mosaic per bucket → kernel(s) over per-tile pad
    VIEWS. ``halo`` is the apron width: 1 for 3×3 kernels, 2 for
    5×5, etc. (each kernel receives a (T+2·halo)² view).

    Each output column ``name`` in ``named_kernels`` receives
    ``kernel(padded_array)`` cast to ``out_dtype``; one row per tile."""
    block = block or _auto_block(meta)
    T = meta.tile_size
    if not (1 <= halo <= T):
        raise ValueError(f"halo must be in [1, tile_size]; got {halo}")
    tagged = ds.map_batches(
        lambda t: _halo_block_rows(t, meta, dtype, block, halo),
        batch_format="pyarrow")
    names = list(named_kernels)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        mosaic, tx0, ty0, tiles = _block_mosaic_tiles(g, meta, dtype,
                                                      block, halo)
        cols = {n: [] for n in names}
        o_tx = np.empty(len(tiles), dtype=np.int32)
        o_ty = np.empty(len(tiles), dtype=np.int32)
        for j, (tx, ty) in enumerate(tiles):
            oy, ox = (ty - ty0) * T, (tx - tx0) * T
            pad = mosaic[oy:oy + T + 2 * halo, ox:ox + T + 2 * halo]
            o_tx[j], o_ty[j] = tx, ty
            for n in names:
                cols[n].append(np.ascontiguousarray(
                    named_kernels[n](pad).astype(np.dtype(out_dtype)))
                    .tobytes())
        res = {"tx": o_tx, "ty": o_ty,
               "band": np.zeros(len(tiles), dtype=np.int64)}
        res.update(cols)
        return pd.DataFrame(res)

    return tagged.groupby("bk__").map_groups(per_bucket,
                                             batch_format="pandas")


def stencil_op(ds, meta: RasterMeta, kernel, *, dtype: str = "float32",
               out_dtype: str = "float32", block: int | None = None,
               halo: int = 1):
    """Generic halo stencil: fragments → groupby(super-block) →
    vectorized per-tile walk → kernel. ``halo`` widens the apron for
    (2·halo+1)² windows (halo=2 → true non-separable 5×5 kernels).

    kernel(padded_array) -> core-sized array.
    """
    return _stencil_bucketed(ds, meta, {"data": kernel}, dtype=dtype,
                             out_dtype=out_dtype, block=block,
                             halo=halo)


def hillshade(ds, meta: RasterMeta, *, dtype: str = "float32",
              azimuth_deg: float = 315.0, altitude_deg: float = 45.0):
    cx = abs(meta.pixel_w)
    cy = abs(meta.pixel_h)
    return stencil_op(
        ds, meta,
        lambda pad: hillshade_kernel(pad, cx, cy, azimuth_deg, altitude_deg),
        dtype=dtype)


def slope_degrees(ds, meta: RasterMeta, *, dtype: str = "float32"):
    cx = abs(meta.pixel_w)
    cy = abs(meta.pixel_h)

    def k(pad):
        s, _ = horn_slope_aspect(pad, cx, cy)
        return np.degrees(s).astype(np.float32)

    return stencil_op(ds, meta, k, dtype=dtype)


# ---- additional 3x3 neighborhood products (gdaldem set, SpaTopo.py:147-182)

def _neighborhood(pad: np.ndarray):
    z = pad.astype(np.float64)
    center = z[1:-1, 1:-1]
    neigh = np.stack([z[:-2, :-2], z[:-2, 1:-1], z[:-2, 2:],
                      z[1:-1, :-2], z[1:-1, 2:],
                      z[2:, :-2], z[2:, 1:-1], z[2:, 2:]])
    return center, neigh


def tri_kernel(pad: np.ndarray, *_args) -> np.ndarray:
    """Terrain Ruggedness Index (Riley 1999, as in gdaldem): mean
    absolute difference between center and its 8 neighbors."""
    center, neigh = _neighborhood(pad)
    return np.abs(neigh - center).mean(axis=0).astype(np.float32)


def tpi_kernel(pad: np.ndarray, *_args) -> np.ndarray:
    """Topographic Position Index: center minus neighbor mean."""
    center, neigh = _neighborhood(pad)
    return (center - neigh.mean(axis=0)).astype(np.float32)


def roughness_kernel(pad: np.ndarray, *_args) -> np.ndarray:
    """Roughness: max - min of the 3x3 window (center included)."""
    z = pad.astype(np.float64)
    win = np.stack([z[:-2, :-2], z[:-2, 1:-1], z[:-2, 2:],
                    z[1:-1, :-2], z[1:-1, 1:-1], z[1:-1, 2:],
                    z[2:, :-2], z[2:, 1:-1], z[2:, 2:]])
    return (win.max(axis=0) - win.min(axis=0)).astype(np.float32)


def tri(ds, meta: RasterMeta, *, dtype: str = "float32"):
    return stencil_op(ds, meta, tri_kernel, dtype=dtype)


def tpi(ds, meta: RasterMeta, *, dtype: str = "float32"):
    return stencil_op(ds, meta, tpi_kernel, dtype=dtype)


def roughness(ds, meta: RasterMeta, *, dtype: str = "float32"):
    return stencil_op(ds, meta, roughness_kernel, dtype=dtype)


def d8_flow_kernel(pad: np.ndarray, *_args) -> np.ndarray:
    """D8 steepest-descent flow direction (the gdaldem/TauDEM flow
    operator class; absent from the reference). Codes 1..8 index the
    fixed neighbor order E, SE, S, SW, W, NW, N, NE; 0 = pit/flat (no
    strictly positive weighted drop). Drops are weighted 10 for
    cardinal and 7 for diagonal neighbors — the integer approximation
    of the 1/√2 diagonal-distance penalty that keeps every comparison
    exact int64 and therefore bit-identical to the SQL twin (a float
    1/√2 weighting has no such twin). Ties break to the LOWEST code
    (np.argmax first-occurrence == SQL's ordered CASE chain)."""
    z = pad.astype(np.int64)
    h, w = pad.shape[0] - 2, pad.shape[1] - 2
    c = z[1:-1, 1:-1]
    wd = np.empty((8, h, w), dtype=np.int64)
    for k, (dy, dx, wt) in enumerate(D8_OFFSETS):
        wd[k] = (c - z[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]) * wt
    best = wd.max(axis=0)
    code = wd.argmax(axis=0).astype(np.int64) + 1
    return np.where(best > 0, code, 0)


# (dy, dx, weight): E SE S SW W NW N NE — codes 1..8 in this order
D8_OFFSETS = ((0, 1, 10), (1, 1, 7), (1, 0, 10), (1, -1, 7),
              (0, -1, 10), (-1, -1, 7), (-1, 0, 10), (-1, 1, 7))


def focal_majority_kernel(pad: np.ndarray, n_classes: int) -> np.ndarray:
    """3x3 focal mode (majority filter) for small-alphabet class
    rasters — the standard post-classification smoothing op (gdal
    sieve / ArcGIS FocalStatistics MAJORITY class; absent from the
    reference). Center included in the window; ties break to the
    LOWEST class value (argmax first occurrence == SQL's ordered CASE
    chain). Classes must lie in [0, n_classes)."""
    z = pad.astype(np.int64)
    h, w = pad.shape[0] - 2, pad.shape[1] - 2
    counts = np.zeros((n_classes, h, w), dtype=np.int16)
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            win = z[dy:dy + h, dx:dx + w]
            for c in range(n_classes):
                counts[c] += win == c
    return counts.argmax(axis=0)


def focal_majority(ds, meta: RasterMeta, *, n_classes: int,
                   dtype: str = "int32"):
    """Class-tile Dataset → majority-filtered class tiles (int32),
    one block-mosaic halo exchange."""
    return stencil_op(ds, meta,
                      lambda pad: focal_majority_kernel(pad, n_classes),
                      dtype=dtype, out_dtype="int32")


def flow_direction(ds, meta: RasterMeta, *, dtype: str = "int32"):
    """Tile Dataset → D8 direction-code tiles (int32; one 1-px halo
    exchange through the block-mosaic stencil engine)."""
    return stencil_op(ds, meta, d8_flow_kernel, dtype=dtype,
                      out_dtype="int32")


def stencil_op_multi(ds, meta: RasterMeta, kernels: dict, *,
                     dtype: str = "float32", out_dtype: str = "float32",
                     block: int | None = None):
    """Several 1-px halo stencils over the SAME source in ONE pass:
    one fragment exchange + one super-block groupby, each kernel
    applied to the shared padded array. Output rows carry one
    ``data_<name>`` binary column per kernel. N independent
    stencil_op calls would re-read the source and re-shuffle the halo
    N times."""
    return _stencil_bucketed(
        ds, meta, {f"data_{name}": k for name, k in kernels.items()},
        dtype=dtype, out_dtype=out_dtype, block=block)


def aspect_degrees(ds, meta: RasterMeta, *, dtype: str = "float32"):
    """Aspect in degrees clockwise from north (gdaldem convention)."""
    cx, cy = abs(meta.pixel_w), abs(meta.pixel_h)

    def k(pad):
        _, asp = horn_slope_aspect(pad, cx, cy)
        deg = 90.0 - np.degrees(asp)
        deg = np.where(deg < 0, deg + 360.0, deg)
        return deg.astype(np.float32)

    return stencil_op(ds, meta, k, dtype=dtype)


# ------------------------------------------------------- resample

def resample_to_grid(ds, src: RasterMeta, dst: RasterMeta, *,
                     dtype: str = "float32", method: str = "bilinear",
                     out_dtype: str | None = None):
    """Inverse-mapping resample onto an arbitrary target grid — one op
    covering the reference's Scale (SpaRasters.py:1284-1339),
    NearestNeighbor (1390-1498, the "really slow" pixel loop, here
    vectorized), Crop-to-grid, and the geometric half of
    ResampleToMatch (2088-2165).

    Distributed shape: every SOURCE tile routes itself to the DST
    tiles whose inverse-mapped footprint it intersects (flat-map-
    shaped), then groupby(dst tile) assembles a local source mosaic
    and samples it. Pixel-center mapping:
        xs = (dst.x_min + (px'+0.5)·dst.pw - src.x_min)/src.pw - 0.5
    Bilinear uses edge-clamped neighbors (matches scipy order-1 zoom
    boundary behavior closely; exact at interior pixels).
    """
    if method not in ("bilinear", "nearest"):
        raise ValueError(f"unknown method {method!r}")
    odt = out_dtype or dtype
    T = dst.tile_size
    S = src.tile_size

    def dst_range_for_src(tx: int, ty: int):
        """dst pixel index range a src tile can influence (+1 margin)."""
        lon0 = src.x_min + tx * S * src.pixel_w
        lon1 = src.x_min + (tx + 1) * S * src.pixel_w
        lat0 = src.y_max + ty * S * src.pixel_h
        lat1 = src.y_max + (ty + 1) * S * src.pixel_h
        px0 = (min(lon0, lon1) - dst.x_min) / dst.pixel_w
        px1 = (max(lon0, lon1) - dst.x_min) / dst.pixel_w
        # pixel_h negative: larger lat → smaller py
        py0 = (max(lat0, lat1) - dst.y_max) / dst.pixel_h
        py1 = (min(lat0, lat1) - dst.y_max) / dst.pixel_h
        return (int(np.floor(px0)) - 2, int(np.ceil(px1)) + 2,
                int(np.floor(py0)) - 2, int(np.ceil(py1)) + 2)

    def route(t: pa.Table) -> pa.Table:
        otx, oty, stx, sty, data = [], [], [], [], []
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        bufs = t.column("data").to_pylist()
        for i in range(len(t)):
            px0, px1, py0, py1 = dst_range_for_src(int(txs[i]), int(tys[i]))
            tx_lo = max(px0 // T, 0)
            tx_hi = min((px1 - 1) // T, dst.tiles_x - 1)
            ty_lo = max(py0 // T, 0)
            ty_hi = min((py1 - 1) // T, dst.tiles_y - 1)
            for TX in range(tx_lo, tx_hi + 1):
                for TY in range(ty_lo, ty_hi + 1):
                    otx.append(TX)
                    oty.append(TY)
                    stx.append(int(txs[i]))
                    sty.append(int(tys[i]))
                    data.append(bufs[i])
        return pa.table({
            "tx": pa.array(otx, type=pa.int32()),
            "ty": pa.array(oty, type=pa.int32()),
            "stx": pa.array(stx, type=pa.int32()),
            "sty": pa.array(sty, type=pa.int32()),
            "data": pa.array(data, type=pa.binary()),
        })

    frags = ds.map_batches(route, batch_format="pyarrow")
    tagged = frags.map_batches(
        _block_tagger("tx", "ty", _auto_block(dst, cap=4)),
        batch_format="pyarrow")

    def sample_one(TX, TY, sxs, sys_, datas):
        # mosaic the contributing source tiles
        x_lo, x_hi = sxs.min() * S, (sxs.max() + 1) * S
        y_lo, y_hi = sys_.min() * S, (sys_.max() + 1) * S
        mosaic = np.zeros((y_hi - y_lo, x_hi - x_lo), dtype=np.dtype(dtype))
        for k in range(len(datas)):
            a = decode_tile(datas[k], dtype, S)
            oy, ox = int(sys_[k]) * S - y_lo, int(sxs[k]) * S - x_lo
            mosaic[oy:oy + a.shape[0], ox:ox + a.shape[1]] = a
        # dst pixels of this tile
        pxs = np.arange(TX * T, min((TX + 1) * T, dst.width))
        pys = np.arange(TY * T, min((TY + 1) * T, dst.height))
        lon = dst.x_min + (pxs + 0.5) * dst.pixel_w
        lat = dst.y_max + (pys + 0.5) * dst.pixel_h
        xs = (lon - src.x_min) / src.pixel_w - 0.5
        ys = (lat - src.y_max) / src.pixel_h - 0.5
        gx, gy = np.meshgrid(xs - x_lo, ys - y_lo)
        H, W = mosaic.shape
        if method == "nearest":
            ix = np.clip(np.rint(gx).astype(np.int64), 0, W - 1)
            iy = np.clip(np.rint(gy).astype(np.int64), 0, H - 1)
            out = mosaic[iy, ix]
        else:
            x0 = np.clip(np.floor(gx).astype(np.int64), 0, W - 1)
            y0 = np.clip(np.floor(gy).astype(np.int64), 0, H - 1)
            x1 = np.clip(x0 + 1, 0, W - 1)
            y1 = np.clip(y0 + 1, 0, H - 1)
            fx = np.clip(gx - x0, 0.0, 1.0)
            fy = np.clip(gy - y0, 0.0, 1.0)
            m = mosaic.astype(np.float64)
            out = ((1 - fy) * ((1 - fx) * m[y0, x0] + fx * m[y0, x1])
                   + fy * ((1 - fx) * m[y1, x0] + fx * m[y1, x1]))
        return np.ascontiguousarray(out.astype(np.dtype(odt)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        txs = g["tx"].to_numpy()
        tys = g["ty"].to_numpy()
        order, starts, ends = _tile_runs(txs, tys)
        txs, tys = txs[order], tys[order]
        sxs = g["stx"].to_numpy()[order]
        sys_ = g["sty"].to_numpy()[order]
        datas = g["data"].to_numpy()[order]
        bufs = [sample_one(int(txs[s]), int(tys[s]),
                           sxs[s:e], sys_[s:e], datas[s:e]).tobytes()
                for s, e in zip(starts, ends)]
        return pd.DataFrame({
            "tx": txs[starts].astype(np.int64),
            "ty": tys[starts].astype(np.int64),
            "band": np.zeros(len(starts), dtype=np.int64),
            "data": bufs})

    return tagged.groupby("bk__").map_groups(per_bucket,
                                             batch_format="pandas")


def scale_raster(ds, src: RasterMeta, factor: float, *, dtype: str = "float32",
                 method: str = "bilinear"):
    """Reference Scale/Resample one-liner (SpaRasters.py:1509-1524):
    same extent, pixel count scaled by ``factor``."""
    dst = RasterMeta(width=int(round(src.width * factor)),
                     height=int(round(src.height * factor)),
                     tile_size=src.tile_size, x_min=src.x_min, y_max=src.y_max,
                     pixel_w=src.pixel_w / factor, pixel_h=src.pixel_h / factor,
                     nodata=src.nodata, dtype=src.dtype)
    return resample_to_grid(ds, src, dst, dtype=dtype, method=method), dst


def resample_to_match(ds_fine, meta_fine: RasterMeta, meta_coarse: RasterMeta,
                      *, dtype: str = "float32", method: str = "bilinear"):
    """Geometric half of ResampleToMatch (SpaRasters.py:2088-2165):
    bring the finer raster onto the coarser raster's exact grid, after
    which raster⊗raster ops are plain tile-key joins."""
    return resample_to_grid(ds_fine, meta_fine, meta_coarse,
                            dtype=dtype, method=method)


# ------------------------------------------------- pixel-exact crop

def crop_pixels(ds, meta: RasterMeta, px0: int, py0: int, px1: int, py1: int,
                *, dtype: str = "int32"):
    """Pixel-exact crop to [px0,px1) x [py0,py1) (reference Crop /
    ExtractByPixels, SpaRasters.py:1235-1282,1341-1388 — arbitrary
    rects, not just tile multiples).

    Distributed shape: each source tile slices its overlap with the
    crop window and routes the fragment to the destination tile(s) it
    lands in (the crop origin shifts the tiling, so one source tile
    can feed up to 4 destination tiles); groupby(dst tile) assembles.
    Output rows carry explicit (h, w) columns — edge tiles are ragged.

    Returns (tile Dataset, RasterMeta of the cropped raster).
    """
    T = meta.tile_size
    W, H = px1 - px0, py1 - py0
    if W <= 0 or H <= 0:
        raise ValueError("empty crop window")
    out_meta = RasterMeta(
        width=W, height=H, tile_size=T,
        x_min=meta.x_min + px0 * meta.pixel_w,
        y_max=meta.y_max + py0 * meta.pixel_h,
        pixel_w=meta.pixel_w, pixel_h=meta.pixel_h,
        nodata=meta.nodata, dtype=dtype)

    def route(t: pa.Table) -> pa.Table:
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        cols = {"dtx": [], "dty": [], "ox": [], "oy": [],
                "fh": [], "fw": [], "data": []}
        for i, buf in enumerate(t.column("data").to_pylist()):
            tx, ty = int(txs[i]), int(tys[i])
            gx0, gy0 = tx * T, ty * T
            a = decode_tile(buf, dtype, T)
            th, tw = a.shape
            # overlap of this tile with the crop window, global coords
            ox0, ox1 = max(gx0, px0), min(gx0 + tw, px1)
            oy0, oy1 = max(gy0, py0), min(gy0 + th, py1)
            if ox0 >= ox1 or oy0 >= oy1:
                continue
            # destination tiles covered by the overlap
            for dtx in range((ox0 - px0) // T, (ox1 - 1 - px0) // T + 1):
                for dty in range((oy0 - py0) // T, (oy1 - 1 - py0) // T + 1):
                    fx0 = max(ox0, px0 + dtx * T)
                    fx1 = min(ox1, px0 + (dtx + 1) * T)
                    fy0 = max(oy0, py0 + dty * T)
                    fy1 = min(oy1, py0 + (dty + 1) * T)
                    frag = a[fy0 - gy0:fy1 - gy0, fx0 - gx0:fx1 - gx0]
                    cols["dtx"].append(dtx)
                    cols["dty"].append(dty)
                    cols["ox"].append(fx0 - px0 - dtx * T)   # offset in dst
                    cols["oy"].append(fy0 - py0 - dty * T)
                    cols["fh"].append(frag.shape[0])
                    cols["fw"].append(frag.shape[1])
                    cols["data"].append(np.ascontiguousarray(frag).tobytes())
        return pa.table({
            "dtx": pa.array(cols["dtx"], type=pa.int32()),
            "dty": pa.array(cols["dty"], type=pa.int32()),
            "ox": pa.array(cols["ox"], type=pa.int32()),
            "oy": pa.array(cols["oy"], type=pa.int32()),
            "fh": pa.array(cols["fh"], type=pa.int32()),
            "fw": pa.array(cols["fw"], type=pa.int32()),
            "data": pa.array(cols["data"], type=pa.binary()),
        })

    frags = ds.map_batches(route, batch_format="pyarrow")
    tagged = frags.map_batches(
        _block_tagger("dtx", "dty", _auto_block(out_meta)),
        batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        dtxs = g["dtx"].to_numpy()
        dtys = g["dty"].to_numpy()
        order, starts, ends = _tile_runs(dtxs, dtys)
        dtxs, dtys = dtxs[order], dtys[order]
        fhs = g["fh"].to_numpy()[order]
        fws = g["fw"].to_numpy()[order]
        oys = g["oy"].to_numpy()[order]
        oxs = g["ox"].to_numpy()[order]
        datas = g["data"].to_numpy()[order]
        o_h, o_w, bufs = [], [], []
        for s, e in zip(starts, ends):
            dtx, dty = int(dtxs[s]), int(dtys[s])
            h = min(T, H - dty * T)
            w = min(T, W - dtx * T)
            out = np.zeros((h, w), dtype=np.dtype(dtype))
            if meta.nodata is not None:
                out[:] = meta.nodata
            for k in range(s, e):
                fh, fw = int(fhs[k]), int(fws[k])
                frag = np.frombuffer(
                    datas[k], dtype=np.dtype(dtype).newbyteorder("<")) \
                    .reshape(fh, fw)
                out[int(oys[k]):int(oys[k]) + fh,
                    int(oxs[k]):int(oxs[k]) + fw] = frag
            o_h.append(h)
            o_w.append(w)
            bufs.append(np.ascontiguousarray(out).tobytes())
        return pd.DataFrame({
            "tx": dtxs[starts].astype(np.int64),
            "ty": dtys[starts].astype(np.int64),
            "band": np.zeros(len(starts), dtype=np.int64),
            "h": np.asarray(o_h, dtype=np.int64),
            "w": np.asarray(o_w, dtype=np.int64),
            "data": bufs})

    return tagged.groupby("bk__").map_groups(
        per_bucket, batch_format="pandas"), out_meta


def set_type(ds, *, dtype: str, tile_size: int, out_dtype: str):
    """Dtype conversion tile op (reference SetType,
    SpaRasters.py:546-560: gdal.Translate outputType — numpy astype
    semantics: trunc toward zero for float→int, modular wrap for
    narrowing ints)."""
    def _batch(t: pa.Table) -> pa.Table:
        has_hw = "h" in t.schema.names and "w" in t.schema.names
        hs = t.column("h").to_pylist() if has_hw else None
        ws = t.column("w").to_pylist() if has_hw else None
        out = []
        for i, b in enumerate(t.column("data").to_pylist()):
            a = decode_tile(b, dtype, tile_size,
                            hs[i] if has_hw else None,
                            ws[i] if has_hw else None)
            out.append(np.ascontiguousarray(
                a.astype(np.dtype(out_dtype))).tobytes())
        return t.set_column(t.schema.get_field_index("data"), "data",
                            pa.array(out, type=pa.binary()))

    return ds.map_batches(_batch, batch_format="pyarrow")


# ------------------------------------------------- gdaldem color-relief

DEFAULT_RELIEF_TABLE = [
    # (elevation, r, g, b) — a public-domain hypsometric ramp
    (0.0, 0, 97, 71),
    (50.0, 16, 122, 47),
    (100.0, 232, 215, 125),
    (180.0, 161, 67, 0),
    (250.0, 130, 30, 30),
    (255.0, 255, 255, 255),
]


def color_relief(ds, *, dtype: str, tile_size: int,
                 table=None):
    """gdaldem color-relief (reference ColorRelief, SpaTopo.py:354
    shells to `gdaldem color-relief`): piecewise-linear interpolation
    of each (elevation → R,G,B) channel over a color table. One input
    tile row → three uint8 band rows (band 0=R, 1=G, 2=B)."""
    tab = table or DEFAULT_RELIEF_TABLE
    elev = np.array([t[0] for t in tab], dtype=np.float64)
    chans = [np.array([t[c] for t in tab], dtype=np.float64)
             for c in (1, 2, 3)]

    def _batch(t: pa.Table) -> pa.Table:
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        otx, oty, oband, odata = [], [], [], []
        for i, b in enumerate(t.column("data").to_pylist()):
            a = decode_tile(b, dtype, tile_size).astype(np.float64)
            for band, ch in enumerate(chans):
                v = np.interp(a, elev, ch)
                odata.append(np.ascontiguousarray(
                    np.rint(v).astype(np.uint8)).tobytes())
                otx.append(int(txs[i]))
                oty.append(int(tys[i]))
                oband.append(band)
        return pa.table({
            "tx": pa.array(otx, type=pa.int32()),
            "ty": pa.array(oty, type=pa.int32()),
            "band": pa.array(oband, type=pa.int32()),
            "data": pa.array(odata, type=pa.binary()),
        })

    return ds.map_batches(_batch, batch_format="pyarrow")


# ------------------------------------------------- projective warp

def warp_to_crs(ds, src: RasterMeta, crs: str, *, dst: RasterMeta | None = None,
                dtype: str = "int32", method: str = "nearest",
                margin_px: int = 2):
    """TransformRaster (SpaReferencing.py TransformRaster → gdal.Warp):
    reproject a lon/lat raster into a projected CRS grid.

    Inverse-mapping warp, distributed like resample_to_grid: every
    SOURCE tile forward-projects its corner bbox (+margin) to find the
    destination tiles it can influence and ships itself there; each
    destination tile inverse-projects its own pixel centers back to
    lon/lat and samples the assembled source mosaic. Projection math
    is kernels/proj.py (mercator / equirect / UTM Krüger).

    When ``dst`` is None a grid is derived by projecting the source
    bounds and keeping the pixel COUNT. Returns (tile Dataset with
    (h, w) columns, dst RasterMeta).
    """
    from spapy_ray.kernels import proj

    if dst is None:
        lon_c = np.array([src.x_min, src.x_min + src.width * src.pixel_w])
        lat_c = np.array([src.y_max + src.height * src.pixel_h, src.y_max])
        X, Y = proj.forward(crs, lon_c, lat_c)
        x0, x1 = float(np.min(X)), float(np.max(X))
        y0, y1 = float(np.min(Y)), float(np.max(Y))
        dst = RasterMeta(width=src.width, height=src.height,
                         tile_size=src.tile_size, x_min=x0, y_max=y1,
                         pixel_w=(x1 - x0) / src.width,
                         pixel_h=-(y1 - y0) / src.height,
                         nodata=src.nodata, dtype=dtype)
    T = dst.tile_size
    S = src.tile_size

    def route(t: pa.Table) -> pa.Table:
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        cols = {"dtx": [], "dty": [], "stx": [], "sty": [], "data": []}
        for i, buf in enumerate(t.column("data").to_pylist()):
            tx, ty = int(txs[i]), int(tys[i])
            # project this tile's pixel-corner bbox (sampled edges —
            # projected edges curve, corners alone under-cover)
            px = np.linspace(tx * S, min((tx + 1) * S, src.width), 9)
            py = np.linspace(ty * S, min((ty + 1) * S, src.height), 9)
            gx, gy = np.meshgrid(px, py)
            lon = src.x_min + gx.ravel() * src.pixel_w
            lat = src.y_max + gy.ravel() * src.pixel_h
            X, Y = proj.forward(crs, lon, lat)
            dpx = (np.asarray(X) - dst.x_min) / dst.pixel_w
            dpy = (np.asarray(Y) - dst.y_max) / dst.pixel_h
            tx_lo = max(int(np.floor(dpx.min() - margin_px)) // T, 0)
            tx_hi = min(int(np.ceil(dpx.max() + margin_px)) // T,
                        dst.tiles_x - 1)
            ty_lo = max(int(np.floor(dpy.min() - margin_px)) // T, 0)
            ty_hi = min(int(np.ceil(dpy.max() + margin_px)) // T,
                        dst.tiles_y - 1)
            for DX in range(tx_lo, tx_hi + 1):
                for DY in range(ty_lo, ty_hi + 1):
                    cols["dtx"].append(DX)
                    cols["dty"].append(DY)
                    cols["stx"].append(tx)
                    cols["sty"].append(ty)
                    cols["data"].append(buf)
        return pa.table({
            "dtx": pa.array(cols["dtx"], type=pa.int32()),
            "dty": pa.array(cols["dty"], type=pa.int32()),
            "stx": pa.array(cols["stx"], type=pa.int32()),
            "sty": pa.array(cols["sty"], type=pa.int32()),
            "data": pa.array(cols["data"], type=pa.binary()),
        })

    frags = ds.map_batches(route, batch_format="pyarrow")
    tagged = frags.map_batches(
        _block_tagger("dtx", "dty", _auto_block(dst, cap=4)),
        batch_format="pyarrow")

    def warp_one(DX, DY, sxs, sys_, datas):
        x_lo, x_hi = int(sxs.min()) * S, (int(sxs.max()) + 1) * S
        y_lo, y_hi = int(sys_.min()) * S, (int(sys_.max()) + 1) * S
        mosaic = np.zeros((y_hi - y_lo, x_hi - x_lo), dtype=np.dtype(dtype))
        if src.nodata is not None:
            mosaic[:] = src.nodata
        for k in range(len(datas)):
            a = decode_tile(datas[k], dtype, S)
            oy, ox = int(sys_[k]) * S - y_lo, int(sxs[k]) * S - x_lo
            mosaic[oy:oy + a.shape[0], ox:ox + a.shape[1]] = a
        h = min(T, dst.height - DY * T)
        w = min(T, dst.width - DX * T)
        pxs = np.arange(DX * T, DX * T + w)
        pys = np.arange(DY * T, DY * T + h)
        X = dst.x_min + (pxs + 0.5) * dst.pixel_w
        Y = dst.y_max + (pys + 0.5) * dst.pixel_h
        GX, GY = np.meshgrid(X, Y)
        lon, lat = proj.inverse(crs, GX.ravel(), GY.ravel())
        spx = (np.asarray(lon) - src.x_min) / src.pixel_w - 0.5
        spy = (np.asarray(lat) - src.y_max) / src.pixel_h - 0.5
        ix = np.rint(spx).astype(np.int64) - x_lo
        iy = np.rint(spy).astype(np.int64) - y_lo
        H, W = mosaic.shape
        valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        out = np.full(h * w, src.nodata if src.nodata is not None else 0,
                      dtype=np.dtype(dtype))
        out[valid] = mosaic[iy[valid], ix[valid]]
        return h, w, np.ascontiguousarray(out.reshape(h, w)).tobytes()

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        dtxs = g["dtx"].to_numpy()
        dtys = g["dty"].to_numpy()
        order, starts, ends = _tile_runs(dtxs, dtys)
        dtxs, dtys = dtxs[order], dtys[order]
        sxs = g["stx"].to_numpy()[order]
        sys_ = g["sty"].to_numpy()[order]
        datas = g["data"].to_numpy()[order]
        o_h, o_w, bufs = [], [], []
        for s, e in zip(starts, ends):
            h, w, buf = warp_one(int(dtxs[s]), int(dtys[s]),
                                 sxs[s:e], sys_[s:e], datas[s:e])
            o_h.append(h)
            o_w.append(w)
            bufs.append(buf)
        return pd.DataFrame({
            "tx": dtxs[starts].astype(np.int64),
            "ty": dtys[starts].astype(np.int64),
            "band": np.zeros(len(starts), dtype=np.int64),
            "h": np.asarray(o_h, dtype=np.int64),
            "w": np.asarray(o_w, dtype=np.int64),
            "data": bufs})

    return tagged.groupby("bk__").map_groups(
        per_bucket, batch_format="pandas"), dst


def raster_overviews(ds, *, dtype: str, tile_size: int, levels: int):
    """COG-style overview pyramid: the level-l raster's pixel (bx, by)
    is the exact int64 SUM of its 2^l x 2^l source block (GeoTIFF
    overviews / gdaladdo, which the reference reaches through GDAL
    file options; SpaRasters.py:752-824 Save). SUM, not mean: means
    divide (float rounding, nodata weighting) — a sum pyramid is the
    lossless integral form from which mean/density renders derive,
    and it is exactly SQL-twinnable.

    Scale shape (mirrors cellindex.tile_pyramid): ONE groupby on the
    level-`levels` tile ancestor; each group assembles its
    2^levels x 2^levels tile block and derives every level locally by
    2x2 reshape-sums. Group memory is 4^levels x tile bytes — run
    deep pyramids as two hops (e.g. 6 = 3 + 3) if that outgrows a
    worker. Requires a full tile-aligned grid (crop/pad first).

    Output rows: (level, tx, ty, band, data) with int64 tiles of the
    SAME tile_size (the standard overview tiling: 4 source tiles
    shrink into one quadrant, so tile counts per side halve each
    level; side counts not divisible by 2^levels get zero-padded
    blocks at the high edges, which only ever add empty quadrants).
    """
    if levels < 1:
        raise ValueError("levels must be >= 1")
    S = 1 << levels
    # bucket key is COARSER than the root ancestor when levels is
    # shallow, so a levels=1 pyramid doesn't degenerate into 4-tile
    # groups (the near-singleton anti-pattern); per-root work walks
    # sorted runs inside the bucket.
    L = max(levels, 3)

    def tag(t: pa.Table) -> pa.Table:
        tx = t.column("tx").to_numpy().astype(np.int64)
        ty = t.column("ty").to_numpy().astype(np.int64)
        bk = ((tx >> L) << np.int64(32)) | (ty >> L)
        return t.append_column("bk__", pa.array(bk))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        txs = df["tx"].to_numpy().astype(np.int64)
        tys = df["ty"].to_numpy().astype(np.int64)
        bands = df["band"].to_numpy().astype(np.int64)
        datas = df["data"].to_numpy()
        rxs, rys = txs >> levels, tys >> levels
        # runs of (root, band) in sorted order (no packed key — a
        # packed int64 would cap tile-grid side lengths)
        order = np.lexsort((bands, rys, rxs))
        rx_o, ry_o, b_o = rxs[order], rys[order], bands[order]
        changed = ((rx_o[1:] != rx_o[:-1]) | (ry_o[1:] != ry_o[:-1])
                   | (b_o[1:] != b_o[:-1]))
        starts = np.flatnonzero(np.r_[True, changed])
        ends = np.r_[starts[1:], len(rx_o)]
        txs, tys, bands, datas = (txs[order], tys[order], bands[order],
                                  datas[order])
        out_rows = {"level": [], "tx": [], "ty": [], "band": [],
                    "data": []}
        for s, e in zip(starts, ends):
            rx, ry, band = int(txs[s]) >> levels, int(tys[s]) >> levels, \
                int(bands[s])
            block = np.zeros((S * tile_size, S * tile_size),
                             dtype=np.int64)
            for k in range(s, e):
                a = decode_tile(datas[k], dtype, tile_size) \
                    .astype(np.int64)
                ox, oy = (int(txs[k]) - (rx << levels)) * tile_size, \
                    (int(tys[k]) - (ry << levels)) * tile_size
                block[oy:oy + tile_size, ox:ox + tile_size] = a
            cur = block
            for lv in range(1, levels + 1):
                h, w = cur.shape
                cur = cur.reshape(h // 2, 2, w // 2, 2).sum(axis=(1, 3))
                ntiles = S >> lv  # tiles per side at this level (>= 1)
                for j in range(ntiles):
                    for i in range(ntiles):
                        tile = cur[j * tile_size:(j + 1) * tile_size,
                                   i * tile_size:(i + 1) * tile_size]
                        out_rows["level"].append(lv)
                        out_rows["tx"].append(rx * ntiles + i)
                        out_rows["ty"].append(ry * ntiles + j)
                        out_rows["band"].append(band)
                        out_rows["data"].append(np.ascontiguousarray(
                            tile).tobytes())
        return pd.DataFrame({
            "level": np.asarray(out_rows["level"], dtype=np.int32),
            "tx": np.asarray(out_rows["tx"], dtype=np.int32),
            "ty": np.asarray(out_rows["ty"], dtype=np.int32),
            "band": np.asarray(out_rows["band"], dtype=np.int32),
            "data": out_rows["data"]})

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("bk__").map_groups(per_bucket, batch_format="pandas")


def watershed_stats(ds, meta: RasterMeta, *,
                    components_mode: str = "distributed",
                    buckets: int | None = None):
    """D8 watershed (drainage-basin) delineation — the hydrology op
    downstream of :func:`flow_direction` (TauDEM/ArcGIS Watershed
    class; the reference has no hydrology at all).

    Semantics: every cell drains along its D8 pointer until a pit
    (code 0); a basin is the set of cells reaching the same pit.
    Because every D8 step strictly decreases elevation, the pointer
    graph is a forest — basins are exactly the weakly-connected
    components, so the proven distributed machinery applies:

      1. one halo exchange computes the D8 codes (flow_direction);
      2. one vectorized map turns code tiles into global pointer
         edges (node, nxt) — pits emit self-edges so isolated pits
         stay visible to the labeler;
      3. components.hash_to_min labels every cell with its basin
         (scrambled hash contraction — no driver materialization in
         "distributed" mode);
      4. a semi join picks each basin's PIT row and one bucketed
         fold counts cells per basin.

    Returns Dataset(px, py, n_cells): pit pixel coordinates and basin
    size (including the pit). SQL twin: recursive pointer walk —
    termination is guaranteed by the strict descent, and the walk's
    total row count is sum(path lengths), small for any real DEM.
    """
    from spapy_ray.stages.components import hash_to_min
    from spapy_ray.stages.relational import bucketed_group_agg, \
        hash_join

    dirs = flow_direction(ds, meta)
    W = meta.width
    # consumed twice (labeler + pit extraction) — materialize so the
    # halo-exchange stencil upstream runs once, not twice
    edges = _d8_pointer_edges(dirs, meta).materialize()
    labels = hash_to_min(edges, mode=components_mode, buckets=buckets
                         or 64)
    def pit_rows(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return pa.table({"a": pa.array(a[a == b])})

    pits = edges.map_batches(pit_rows, batch_format="pyarrow")
    # (lab -> pit): the labels rows whose cell IS a pit
    pitlab = hash_join(labels, pits, on="v", right_on="a", how="semi",
                       buckets=buckets)

    def count_local(g):
        return g.groupby("lab", sort=False).size() \
            .reset_index(name="n_cells")

    counts = bucketed_group_agg(labels, "lab", count_local,
                                buckets=buckets)
    joined = hash_join(counts, pitlab, on="lab", buckets=buckets)

    def decode(t: pa.Table) -> pa.Table:
        pit = t.column("v").to_numpy(zero_copy_only=False)
        return pa.table({
            "px": pa.array(pit % W),
            "py": pa.array(pit // W),
            "n_cells": t.column("n_cells").cast(pa.int64())})

    return joined.map_batches(decode, batch_format="pyarrow")


def _d8_pointer_edges(dirs, meta: RasterMeta):
    """D8 code tiles → global pointer rows Dataset(a=node, b=nxt);
    pits emit self-edges (a == b). node = py*width + px. Edge cells
    never point outside the raster (the stencil's edge-replicated
    apron makes every outward drop 0)."""
    T = meta.tile_size
    W = meta.width
    # code k -> (dy, dx); 0 -> self
    dy_by_code = np.array([0] + [o[0] for o in D8_OFFSETS],
                          dtype=np.int64)
    dx_by_code = np.array([0] + [o[1] for o in D8_OFFSETS],
                          dtype=np.int64)

    def pointer_edges(t: pa.Table) -> pa.Table:
        txs = t.column("tx").to_numpy(zero_copy_only=False)
        tys = t.column("ty").to_numpy(zero_copy_only=False)
        bufs = t.column("data").to_pylist()
        outs_a = []
        outs_b = []
        for i in range(len(t)):
            code = decode_tile(bufs[i], "int32", T).astype(np.int64)
            h, w = code.shape
            py0, px0 = int(tys[i]) * T, int(txs[i]) * T
            py = py0 + np.arange(h, dtype=np.int64)[:, None]
            px = px0 + np.arange(w, dtype=np.int64)[None, :]
            node = py * W + px
            nxt = node + dy_by_code[code] * W + dx_by_code[code]
            outs_a.append(node.ravel())
            outs_b.append(nxt.ravel())
        return pa.table({"a": pa.array(np.concatenate(outs_a)),
                         "b": pa.array(np.concatenate(outs_b))})

    return dirs.map_batches(pointer_edges, batch_format="pyarrow")


def flow_accumulation_stats(ds, meta: RasterMeta, *,
                            components_mode: str = "distributed",
                            buckets: int | None = None):
    """D8 flow accumulation (upstream cell count per cell, itself
    included — the TauDEM/gdaldem AccumulatedFlow class), reduced to
    per-tile (n_cells, acc_sum, acc_max).

    Distributed shape: basins are independent by definition, so the
    accumulation is BASIN-CO-PARTITIONED — pointer edges join their
    hash_to_min basin label, one hash(label) bucket shuffle colocates
    every complete basin, and the per-bucket kernel walks ALL its
    basins' pointers simultaneously (vectorized rounds = max path
    length in the bucket, every step one np.add.at over the live
    walkers). Partitioning assumption (documented): one basin fits a
    task — true for pit-terminated D8 fields at any tile scale;
    continental-river accumulation over a pit-filled DEM would need
    the hierarchical tree-contraction variant instead.

    Per-tile fold keyed by packed tile id; output
    Dataset(tx, ty, n_cells, acc_sum, acc_max), all int64.
    """
    from spapy_ray.stages.components import hash_to_min
    from spapy_ray.stages.relational import bucketed_group_agg, \
        hash_join

    dirs = flow_direction(ds, meta)
    T = meta.tile_size
    W = meta.width
    tiles_x = meta.tiles_x

    edges = _d8_pointer_edges(dirs, meta).materialize()
    labels = hash_to_min(edges, mode=components_mode,
                         buckets=buckets or 64)
    lab_edges = hash_join(edges, labels, on="a", right_on="v",
                          buckets=buckets)

    def acc_local(g: pd.DataFrame) -> pd.DataFrame:
        a = g["a"].to_numpy(dtype=np.int64)
        b = g["b"].to_numpy(dtype=np.int64)
        order = np.argsort(a, kind="stable")
        ns = a[order]
        ptr = np.searchsorted(ns, b[order])
        n = len(ns)
        # complete-basin invariant: every pointer target must live in
        # this bucket (a silent searchsorted miss would corrupt acc)
        if n and not (ns[np.minimum(ptr, n - 1)] == b[order]).all():
            raise AssertionError(
                "flow_accumulation bucket is missing pointer targets "
                "— basin labels did not co-partition a full basin")
        acc = np.ones(n, dtype=np.int64)
        walkers = np.flatnonzero(ptr != np.arange(n))
        cur = ptr[walkers]
        while len(cur):
            np.add.at(acc, cur, 1)
            keep = ptr[cur] != cur
            cur = ptr[cur[keep]]
        px = ns % W
        py = ns // W
        tkey = (py // T) * tiles_x + (px // T)
        df = pd.DataFrame({"tkey": tkey, "acc": acc})
        out = df.groupby("tkey", sort=False)["acc"].agg(
            ["size", "sum", "max"]).reset_index()
        out.columns = ["tkey", "n_cells", "acc_sum", "acc_max"]
        return out

    partials = bucketed_group_agg(lab_edges.select_columns(
        ["a", "b", "lab"]), "lab", acc_local, buckets=buckets)

    def tile_fold(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("tkey", sort=False).agg(
            n_cells=("n_cells", "sum"), acc_sum=("acc_sum", "sum"),
            acc_max=("acc_max", "max")).reset_index()

    folded = bucketed_group_agg(partials, "tkey", tile_fold,
                                buckets=buckets)

    def decode(t: pa.Table) -> pa.Table:
        tk = t.column("tkey").to_numpy(zero_copy_only=False)
        return pa.table({
            "tx": pa.array(tk % tiles_x),
            "ty": pa.array(tk // tiles_x),
            "n_cells": t.column("n_cells").cast(pa.int64()),
            "acc_sum": t.column("acc_sum").cast(pa.int64()),
            "acc_max": t.column("acc_max").cast(pa.int64())})

    return folded.map_batches(decode, batch_format="pyarrow")


def equalize_stats(ds, meta: RasterMeta, *, nbins: int = 256,
                   lo: float = 0.0, hi: float = 256.0,
                   out_scale: int = 255):
    """Global histogram equalization (the gdaldem / ArcGIS Stretch
    "histogram equalize" contrast op; the reference has only linear
    scalar math, SpaRasters.py one-liners) over an integer-binned
    raster, reduced to per-tile (n, eq_sum, eq_min, eq_max).

        eq(v) = (cdf(v) - cdf_min) * out_scale // (N - cdf_min)

    — the classic integer equalization transfer, exact in int64 and
    bit-identical to a window-sum SQL twin. A constant raster
    (N == cdf_min) maps to 0.

    Distributed shape: one pass folds the global value histogram
    (per-tile bincount partials through the existing
    raster_histogram reduce — the histogram is nbins rows, the SMALL
    side); the transfer table broadcasts via ray.put and the remap +
    per-tile stats run in a single stateless map. Two passes over
    the tiles, zero shuffles beyond the nbins-row histogram fold.
    """
    import ray
    import pyarrow.compute as pc

    hist = raster_histogram(ds, dtype=meta.dtype,
                            tile_size=meta.tile_size, nbins=nbins,
                            lo=lo, hi=hi).to_pandas()
    counts = np.zeros(nbins, dtype=np.int64)
    counts[hist["bin"].to_numpy(dtype=np.int64)] = \
        hist["n_pixels"].to_numpy(dtype=np.int64)
    cdf = np.cumsum(counts)
    n_total = int(cdf[-1])
    nz = np.nonzero(counts)[0]
    cdf_min = int(cdf[nz[0]]) if len(nz) else 0
    if n_total > cdf_min:
        table = (cdf - cdf_min) * np.int64(out_scale) \
            // np.int64(n_total - cdf_min)
        table = np.clip(table, 0, out_scale)
    else:
        table = np.zeros(nbins, dtype=np.int64)
    return _transfer_remap_stats(ds, meta, table, lo=lo, hi=hi)


def _transfer_remap_stats(ds, meta: RasterMeta, table: np.ndarray, *,
                          lo: float, hi: float):
    """Shared tail of the global-contrast family (equalize/stretch):
    broadcast an int64 transfer table, remap every tile statelessly,
    fold per-tile (n, sum, min, max) of the transferred values."""
    import ray
    import pyarrow.compute as pc

    ref = ray.put(np.asarray(table, dtype=np.int64))
    nbins = len(table)
    width = (hi - lo) / nbins
    T = meta.tile_size
    dt = meta.dtype

    def remap(t: pa.Table, _ref=ref) -> pa.Table:
        tab = ray.get(_ref)
        txs = pc.cast(t.column("tx"), pa.int64())
        tys = pc.cast(t.column("ty"), pa.int64())
        n = np.empty(len(t), dtype=np.int64)
        s = np.empty(len(t), dtype=np.int64)
        mn = np.empty(len(t), dtype=np.int64)
        mx = np.empty(len(t), dtype=np.int64)
        for i, b in enumerate(t.column("data").to_pylist()):
            a = decode_tile(b, dt, T).ravel()
            idx = np.clip(((a - lo) / width).astype(np.int64), 0,
                          nbins - 1)
            e = tab[idx]
            n[i] = len(e)
            s[i] = int(e.sum())
            mn[i] = int(e.min())
            mx[i] = int(e.max())
        return pa.table({"tx": txs, "ty": tys,
                         "n_pixels": pa.array(n),
                         "eq_sum": pa.array(s),
                         "eq_min": pa.array(mn),
                         "eq_max": pa.array(mx)})

    return ds.map_batches(remap, batch_format="pyarrow")


def stretch_stats(ds, meta: RasterMeta, *, nbins: int = 256,
                  lo: float = 0.0, hi: float = 256.0,
                  p_lo: int = 2, p_hi: int = 98, den: int = 100,
                  out_scale: int = 255):
    """Percentile linear stretch (gdal_translate -scale with
    percentile clip / ArcGIS Percent Clip stretch): clip bounds are
    the smallest bins whose CDF reaches p_lo/p_hi percent (exact
    integer conditions cdf*den >= N*p), then

        e(v) = clip((bin(v) - lo_bin) * out_scale // span, 0, L)

    — integer-exact end to end, same per-tile stats reduction and
    SQL-twin structure as equalize_stats. A degenerate span (constant
    raster) maps everything to 0."""
    hist = raster_histogram(ds, dtype=meta.dtype,
                            tile_size=meta.tile_size, nbins=nbins,
                            lo=lo, hi=hi).to_pandas()
    counts = np.zeros(nbins, dtype=np.int64)
    counts[hist["bin"].to_numpy(dtype=np.int64)] =         hist["n_pixels"].to_numpy(dtype=np.int64)
    cdf = np.cumsum(counts)
    n_total = int(cdf[-1])
    lo_bin = int(np.argmax(cdf * den >= n_total * p_lo))
    hi_bin = int(np.argmax(cdf * den >= n_total * p_hi))
    span = hi_bin - lo_bin
    bins = np.arange(nbins, dtype=np.int64)
    if span > 0:
        table = np.clip((bins - lo_bin) * np.int64(out_scale)
                        // np.int64(span), 0, out_scale)
    else:
        table = np.zeros(nbins, dtype=np.int64)
    return _transfer_remap_stats(ds, meta, table, lo=lo, hi=hi)


def zonal_majority(ds, zones: pa.Table, meta: RasterMeta, *,
                   dtype: str = "int32", class_width: int = 64,
                   batch_size: int = 16, buckets: int | None = None):
    """Zonal MAJORITY (modal class per zone — ArcGIS ZonalStatistics
    MAJORITY; the reference's zonal family stops at count/sum/min/
    max): pixel values bucket into classes (v // class_width + 1),
    per-tile per-zone class-count partials fold through ONE
    hash(zone) bucket shuffle, and each zone's mode resolves locally
    (ties to the LOWEST class, same ordered-CASE convention as
    focal_majority).

    Zones broadcast once (ray.put), membership via the shared
    STRtree + ray-cast PIP. Returns Dataset(zone_id, mode_class,
    n_mode, n_pixels), int64.
    """
    import ray

    from spapy_ray.sources.rasters import tile_pixels
    from spapy_ray.stages.join import ZoneIndex
    from spapy_ray.stages.relational import bucketed_group_agg
    from spapy_ray.util import cached_state

    box = (ray.put(zones),)

    def partial(t: pa.Table) -> pa.Table:
        index = cached_state(box, ZoneIndex)
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        zid_out, cls_out, n_out = [], [], []
        for i, buf in enumerate(t.column("data").to_pylist()):
            a = decode_tile(buf, dtype, meta.tile_size)
            gx, gy = tile_pixels(meta, int(txs[i]), int(tys[i]))
            lon, lat = meta.pixel_center_lonlat(gx.ravel(), gy.ravel())
            pi, zi = index.query(lon, lat)
            if len(pi) == 0:
                continue
            cls = a.ravel()[pi].astype(np.int64) // class_width + 1
            zid = index.zone_ids[zi].astype(np.int64)
            key = zid * 100_000 + cls
            u, c = np.unique(key, return_counts=True)
            zid_out.append(u // 100_000)
            cls_out.append(u % 100_000)
            n_out.append(c.astype(np.int64))
        if not zid_out:
            return pa.table({"zone_id": pa.array([], pa.int64()),
                             "cls": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"zone_id": pa.array(np.concatenate(zid_out)),
                         "cls": pa.array(np.concatenate(cls_out)),
                         "n": pa.array(np.concatenate(n_out))})

    def per_zone(g: pd.DataFrame) -> pd.DataFrame:
        cc = g.groupby(["zone_id", "cls"], sort=False)["n"].sum() \
            .reset_index()
        cc = cc.sort_values(["zone_id", "n", "cls"],
                            ascending=[True, False, True],
                            kind="mergesort")
        tot = cc.groupby("zone_id", sort=False)["n"].sum()
        head = cc.drop_duplicates("zone_id", keep="first")
        return pd.DataFrame({
            "zone_id": head["zone_id"].to_numpy(dtype=np.int64),
            "mode_class": head["cls"].to_numpy(dtype=np.int64),
            "n_mode": head["n"].to_numpy(dtype=np.int64),
            "n_pixels": tot.loc[head["zone_id"]].to_numpy(
                dtype=np.int64)})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=batch_size,
                           zero_copy_batch=True)
    return bucketed_group_agg(parts, "zone_id", per_zone,
                              buckets=buckets)


def flow_length_stats(ds, meta: RasterMeta, *,
                      components_mode: str = "distributed",
                      buckets: int | None = None):
    """D8 flow-path length per cell (edge count to the pit — the
    TauDEM Flow Path Length class), completing the hydrology family
    (direction → watershed → accumulation → length). Same
    basin-co-partitioned shape as flow_accumulation_stats: every
    bucket advances all its basins' walkers together; rounds = max
    path length in the bucket. Returns per-tile
    Dataset(tx, ty, n_cells, len_sum, len_max), int64.
    """
    from spapy_ray.stages.components import hash_to_min
    from spapy_ray.stages.relational import bucketed_group_agg, \
        hash_join

    dirs = flow_direction(ds, meta)
    T = meta.tile_size
    W = meta.width
    tiles_x = meta.tiles_x

    edges = _d8_pointer_edges(dirs, meta).materialize()
    labels = hash_to_min(edges, mode=components_mode,
                         buckets=buckets or 64)
    lab_edges = hash_join(edges, labels, on="a", right_on="v",
                          buckets=buckets)

    def len_local(g: pd.DataFrame) -> pd.DataFrame:
        a = g["a"].to_numpy(dtype=np.int64)
        b = g["b"].to_numpy(dtype=np.int64)
        order = np.argsort(a, kind="stable")
        ns = a[order]
        ptr = np.searchsorted(ns, b[order])
        n = len(ns)
        if n and not (ns[np.minimum(ptr, n - 1)] == b[order]).all():
            raise AssertionError(
                "flow_length bucket is missing pointer targets")
        steps = np.zeros(n, dtype=np.int64)
        origin = np.flatnonzero(ptr != np.arange(n))
        cur = ptr[origin]
        steps[origin] = 1
        while len(origin):
            alive = ptr[cur] != cur
            origin = origin[alive]
            cur = ptr[cur[alive]]
            steps[origin] += 1
        px = ns % W
        py = ns // W
        tkey = (py // T) * tiles_x + (px // T)
        df = pd.DataFrame({"tkey": tkey, "s": steps})
        out = df.groupby("tkey", sort=False)["s"].agg(
            ["size", "sum", "max"]).reset_index()
        out.columns = ["tkey", "n_cells", "len_sum", "len_max"]
        return out

    partials = bucketed_group_agg(lab_edges.select_columns(
        ["a", "b", "lab"]), "lab", len_local, buckets=buckets)

    def tile_fold(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("tkey", sort=False).agg(
            n_cells=("n_cells", "sum"), len_sum=("len_sum", "sum"),
            len_max=("len_max", "max")).reset_index()

    folded = bucketed_group_agg(partials, "tkey", tile_fold,
                                buckets=buckets)

    def decode(t: pa.Table) -> pa.Table:
        tk = t.column("tkey").to_numpy(zero_copy_only=False)
        return pa.table({
            "tx": pa.array(tk % tiles_x),
            "ty": pa.array(tk // tiles_x),
            "n_cells": t.column("n_cells").cast(pa.int64()),
            "len_sum": t.column("len_sum").cast(pa.int64()),
            "len_max": t.column("len_max").cast(pa.int64())})

    return folded.map_batches(decode, batch_format="pyarrow")


def zonal_quantiles(ds, zones: pa.Table, meta: RasterMeta, *,
                    qs: tuple[float, ...] = (0.5, 0.9),
                    dtype: str = "int32",
                    buckets: int | None = None):
    """Zonal PERCENTILES (ArcGIS ZonalStatistics PERCENTILE; the
    reference's zonal family stops at count/sum/min/max): per-tile
    per-zone VALUE-COUNT partials — for discrete rasters the
    exchange is O(zones x distinct values), never the pixels — fold
    through one hash(zone) shuffle; each zone's quantile_disc values
    (rank max(1, ceil(q*n)), DuckDB convention) resolve locally from
    the cumulative histogram. Zones broadcast once (ray.put),
    membership via the shared STRtree + ray-cast PIP.

    Returns Dataset(zone_id, n_pixels, p<q> ...), int64.
    """
    import math

    import ray

    from spapy_ray.sources.rasters import tile_pixels
    from spapy_ray.stages.join import ZoneIndex
    from spapy_ray.stages.relational import bucketed_group_agg
    from spapy_ray.util import cached_state

    box = (ray.put(zones),)
    qnames = [f"p{int(round(q * 100))}" for q in qs]

    def partial(t: pa.Table) -> pa.Table:
        index = cached_state(box, ZoneIndex)
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        zid_out, val_out, n_out = [], [], []
        for i, buf in enumerate(t.column("data").to_pylist()):
            a = decode_tile(buf, dtype, meta.tile_size)
            gx, gy = tile_pixels(meta, int(txs[i]), int(tys[i]))
            lon, lat = meta.pixel_center_lonlat(gx.ravel(), gy.ravel())
            pi, zi = index.query(lon, lat)
            if len(pi) == 0:
                continue
            v = a.ravel()[pi].astype(np.int64)
            zid = index.zone_ids[zi].astype(np.int64)
            key = zid * 1_000_000 + v
            u, c = np.unique(key, return_counts=True)
            zid_out.append(u // 1_000_000)
            val_out.append(u % 1_000_000)
            n_out.append(c.astype(np.int64))
        if not zid_out:
            return pa.table({"zone_id": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"zone_id": pa.array(np.concatenate(zid_out)),
                         "v": pa.array(np.concatenate(val_out)),
                         "n": pa.array(np.concatenate(n_out))})

    def per_zone(g: pd.DataFrame) -> pd.DataFrame:
        cc = g.groupby(["zone_id", "v"], sort=False)["n"].sum() \
            .reset_index().sort_values(["zone_id", "v"])
        rows = []
        for zid, gg in cc.groupby("zone_id", sort=True):
            v = gg["v"].to_numpy()
            cum = np.cumsum(gg["n"].to_numpy())
            n = int(cum[-1])
            picks = [int(v[np.searchsorted(
                cum, max(1, math.ceil(q * n)))]) for q in qs]
            rows.append((int(zid), n, *picks))
        return pd.DataFrame(rows, columns=["zone_id", "n_pixels",
                                           *qnames]) \
            .astype(np.int64)

    return bucketed_group_agg(
        ds.map_batches(partial, batch_format="pyarrow",
                       batch_size=16), "zone_id", per_zone,
        buckets=buckets)


def strahler_stats(ds, meta: RasterMeta, *,
                   components_mode: str = "distributed",
                   buckets: int | None = None):
    """Strahler stream order of the D8 pointer forest (the stream-
    classification capstone of the hydrology family: direction →
    watershed → accumulation → length → ORDER). order(leaf) = 1;
    order(v) = m + 1 if ≥ 2 children attain the children's max m,
    else m.

    Distributed shape: identical to flow_accumulation_stats —
    basins co-partition by their hash_to_min label (one shuffle),
    and each bucket peels its basins topologically: every round
    resolves the whole frontier vectorized (pandas max/count-of-max
    per parent), rounds = max path length in the bucket. Returns
    Dataset(tx, ty, ord, n_cells)."""
    from spapy_ray.stages.components import hash_to_min
    from spapy_ray.stages.relational import bucketed_group_agg, \
        hash_join

    dirs = flow_direction(ds, meta)
    T = meta.tile_size
    W = meta.width
    tiles_x = meta.tiles_x

    edges = _d8_pointer_edges(dirs, meta).materialize()
    labels = hash_to_min(edges, mode=components_mode,
                         buckets=buckets or 64)
    lab_edges = hash_join(edges, labels, on="a", right_on="v",
                          buckets=buckets)

    def strahler_local(g: pd.DataFrame) -> pd.DataFrame:
        a = g["a"].to_numpy(dtype=np.int64)
        b = g["b"].to_numpy(dtype=np.int64)
        o_sort = np.argsort(a, kind="stable")
        ns = a[o_sort]
        ptr = np.searchsorted(ns, b[o_sort])
        n = len(ns)
        if n and not (ns[np.minimum(ptr, n - 1)] == b[o_sort]).all():
            raise AssertionError("strahler bucket is missing pointer "
                                 "targets")
        self_loop = ptr == np.arange(n)
        indeg = np.bincount(ptr[~self_loop], minlength=n)
        order = np.ones(n, dtype=np.int64)
        maxo = np.zeros(n, dtype=np.int64)
        cnt = np.zeros(n, dtype=np.int64)
        rem = indeg.copy()
        frontier = np.flatnonzero(rem == 0)
        done = np.zeros(n, dtype=bool)
        while frontier.size:
            o = np.where(maxo[frontier] == 0, 1,
                         np.where(cnt[frontier] >= 2,
                                  maxo[frontier] + 1,
                                  maxo[frontier]))
            order[frontier] = o
            done[frontier] = True
            push = ~self_loop[frontier]
            p = ptr[frontier[push]]
            po = o[push]
            if len(p):
                df = pd.DataFrame({"p": p, "o": po})
                gg = df.groupby("p", sort=False)["o"] \
                    .agg(["max", "size"]).reset_index()
                mx = gg["max"].to_numpy(dtype=np.int64)
                # count of children attaining the batch max
                cmx = df[df["o"].to_numpy()
                         == gg.set_index("p")["max"]
                         .reindex(df["p"]).to_numpy()] \
                    .groupby("p", sort=False).size()
                pu = gg["p"].to_numpy(dtype=np.int64)
                cm = cmx.reindex(gg["p"]).to_numpy().astype(np.int64)
                cur_m, cur_c = maxo[pu], cnt[pu]
                new_m = np.maximum(cur_m, mx)
                new_c = np.where(mx > cur_m, cm,
                                 np.where(mx == cur_m, cur_c + cm,
                                          cur_c))
                maxo[pu], cnt[pu] = new_m, new_c
                rem[pu] -= gg["size"].to_numpy(dtype=np.int64)
            frontier = np.flatnonzero((rem == 0) & ~done)
        px, py = ns % W, ns // W
        tkey = (py // T) * tiles_x + (px // T)
        df = pd.DataFrame({"tkey": tkey, "ord": order})
        out = df.groupby(["tkey", "ord"], sort=False).size() \
            .reset_index(name="n_cells")
        out["n_cells"] = out["n_cells"].astype(np.int64)
        return out

    partials = bucketed_group_agg(lab_edges.select_columns(
        ["a", "b", "lab"]), "lab", strahler_local, buckets=buckets)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["tkey", "ord"], sort=False)["n_cells"] \
            .sum().reset_index()

    folded = bucketed_group_agg(partials, "tkey", fold,
                                buckets=buckets)

    def decode(t: pa.Table) -> pa.Table:
        tk = t.column("tkey").to_numpy(zero_copy_only=False)
        return pa.table({
            "tx": pa.array((tk % tiles_x).astype(np.int64)),
            "ty": pa.array((tk // tiles_x).astype(np.int64)),
            "ord": t.column("ord").cast(pa.int64()),
            "n_cells": t.column("n_cells").cast(pa.int64())})

    return folded.map_batches(decode, batch_format="pyarrow")


def tile_stack_fold(stack, k: int, fold_fn, *, dtype: str,
                    tile_size: int, out_dtype: str = "int64",
                    block: int = 8):
    """Temporal/multi-source raster stack fold: ``stack`` is a list of
    k co-gridded tile tables (epochs of a time series, sensors of a
    collection); each (tx, ty, band) cell folds its k tiles through
    ``fold_fn([arr_0..arr_{k-1}]) -> arr`` (epoch order preserved).

    The k-way generalization of tile_binary_math's shuffle join:
    every side tags epoch + the (tx//block, ty//block, band)
    super-block key, ONE union + ONE bucketed groupby co-locates all
    k epochs of a tile, and each group folds its <= k*block^2 rows in
    one call — never a per-tile Python group (the near-singleton
    anti-pattern)."""
    def tag(epoch: int):
        def _t(t: pa.Table) -> pa.Table:
            tx = t.column("tx").to_numpy().astype(np.int64)
            ty = t.column("ty").to_numpy().astype(np.int64)
            band = t.column("band").to_numpy().astype(np.int64)
            bk = (((tx // block) << np.int64(24))
                  ^ ((ty // block) << np.int64(4)) ^ band)
            t = t.select(["tx", "ty", "band", "data"])
            t = t.append_column("bk__", pa.array(bk))
            return t.append_column("ep__", pa.array(
                np.full(len(t), epoch, dtype=np.int8)))
        return _t

    u = stack[0].map_batches(tag(0), batch_format="pyarrow")
    for e in range(1, k):
        u = u.union(stack[e].map_batches(tag(e), batch_format="pyarrow"))

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["tx", "ty", "band", "ep__"], kind="stable")
        n = len(g)
        if n % k:
            raise ValueError("stack fold expects exactly k tiles per "
                             "(tx, ty, band) key")
        keys = g[["tx", "ty", "band"]].to_numpy()
        eps = g["ep__"].to_numpy()
        if not (keys[0::k] == keys[k - 1::k]).all() \
                or not (eps.reshape(-1, k)
                        == np.arange(k, dtype=np.int8)).all():
            raise ValueError("stack fold: missing or duplicate epoch "
                             "for some tile")
        data = g["data"].to_numpy()
        out = []
        for i in range(0, n, k):
            arrs = [decode_tile(data[i + e], dtype, tile_size)
                    .astype(np.int64) for e in range(k)]
            out.append(np.ascontiguousarray(
                fold_fn(arrs).astype(np.dtype(out_dtype))).tobytes())
        return pd.DataFrame({"tx": keys[0::k, 0], "ty": keys[0::k, 1],
                             "band": keys[0::k, 2], "data": out})

    return u.groupby("bk__").map_groups(bucket_fold,
                                        batch_format="pandas")


def cost_distance(ds, meta: RasterMeta, *, rounds: int,
                  mark_value: float = 0, dtype: str = "int32",
                  sent: int = 1 << 40, block: int | None = None):
    """Iterative 4-neighbor min-plus relaxation (the gdal
    cost-distance operator class): sources are the ``mark_value``
    pixels at cost 0; each round applies

        c'(p) = min(c(p), min_{q in N4(p)} c(q) + value(p) + 1)

    so after ``rounds`` rounds every pixel holds the EXACT minimum
    accumulated cost over paths of <= rounds steps (unreached pixels
    stay at the ``sent`` sentinel).  Each round is ONE halo stencil
    (stencil_op) over a PACKED int64 field (cost * 512 + value, for
    values in [0, 512)) — cost and terrain ride one exchange, and the
    edge-replicated apron is a no-op for min-plus (clamped neighbor
    == self, and the step weight is >= 1).  The iterative sibling of
    rasterprefix.distance_transform_l1 (which solves the unweighted
    case in exactly two passes)."""
    T = meta.tile_size

    def init(t: pa.Table) -> pa.Table:
        bufs = []
        for b in t.column("data").to_pylist():
            v = decode_tile(b, dtype, T).astype(np.int64)
            if (v < 0).any() or (v >= 512).any():
                raise ValueError("cost_distance packs values in "
                                 "[0, 512)")
            c0 = np.where(v == mark_value, 0, sent)
            bufs.append(np.ascontiguousarray(c0 * 512 + v).tobytes())
        return t.set_column(t.schema.get_field_index("data"), "data",
                            pa.array(bufs, type=pa.binary()))

    def relax(pad):
        c = pad // 512
        w = pad[1:-1, 1:-1] % 512 + 1
        m4 = np.minimum(np.minimum(c[:-2, 1:-1], c[2:, 1:-1]),
                        np.minimum(c[1:-1, :-2], c[1:-1, 2:]))
        nc = np.minimum(c[1:-1, 1:-1], m4 + w)
        return nc * 512 + pad[1:-1, 1:-1] % 512

    field = ds.map_batches(init, batch_format="pyarrow")
    for _ in range(rounds):
        field = stencil_op(field, meta, relax, dtype="int64",
                           out_dtype="int64", block=block)
    return field
