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
import pyarrow.compute as pc

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


def _idw_frags(meta: RasterMeta, r5: int, b: int):
    """Shared fragment router for the IDW stages: point batch →
    one copy per raster tile whose pixel CENTERS the point can reach
    (bbox test; the exact circle predicate runs inside the tile
    kernel). All integer 1e-5 fixed-point arithmetic."""
    T = meta.tile_size
    x_min5 = int(round(meta.x_min * 1e5))
    y_max5 = int(round(meta.y_max * 1e5))
    pw5 = int(round(meta.pixel_w * 1e5))
    ph5 = int(round(meta.pixel_h * 1e5))        # negative (north-up)
    if pw5 % 2 or ph5 % 2:
        raise ValueError("pixel size must be an even 1e-5 multiple "
                         "so pixel centers are exact fixed-point")
    ntx = (meta.width + T - 1) // T
    nty = (meta.height + T - 1) // T

    def frags(t: pa.Table, lat_col: str, lon_col: str,
              v: np.ndarray) -> pa.Table:
        from spapy_ray.stages.distjoin import _fixed5
        lat5 = _fixed5(t.column(lat_col))
        lon5 = _fixed5(t.column(lon_col))
        # candidate pixel index range (centers within the r bbox),
        # padded one pixel each side: the exact circle predicate in
        # the tile kernel makes overcoverage free, undercoverage a bug
        pxa = np.floor_divide(lon5 - r5 - x_min5 - pw5 // 2, pw5)
        pxb = np.floor_divide(lon5 + r5 - x_min5 - pw5 // 2, pw5)
        px0 = np.minimum(pxa, pxb) - 1
        px1 = np.maximum(pxa, pxb) + 2
        pya = np.floor_divide(lat5 - r5 - y_max5 - ph5 // 2, ph5)
        pyb = np.floor_divide(lat5 + r5 - y_max5 - ph5 // 2, ph5)
        py0 = np.minimum(pya, pyb) - 1
        py1 = np.maximum(pya, pyb) + 2
        tx0 = np.clip(px0 // T, 0, ntx - 1)
        tx1 = np.clip((px1 - 1) // T, 0, ntx - 1)
        ty0 = np.clip(py0 // T, 0, nty - 1)
        ty1 = np.clip((py1 - 1) // T, 0, nty - 1)
        inb = (px1 > 0) & (px0 < meta.width) \
            & (py1 > 0) & (py0 < meta.height)
        lat5, lon5, v = lat5[inb], lon5[inb], v[inb]
        tx0, tx1, ty0, ty1 = tx0[inb], tx1[inb], ty0[inb], ty1[inb]
        nx = (tx1 - tx0 + 1)
        ny = (ty1 - ty0 + 1)
        cnt = nx * ny
        total = int(cnt.sum())
        idx = np.repeat(np.arange(len(cnt)), cnt)
        off = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        txc = tx0[idx] + off // ny[idx]
        tyc = ty0[idx] + off % ny[idx]
        tkey = txc * np.int64(1 << 20) + tyc
        hbk = ((tkey.astype(np.uint64) * _MIX) >> np.uint64(33)) \
            % np.uint64(b)
        return pa.table({"_tkey": pa.array(tkey),
                         "_bucket": pa.array(hbk.astype(np.int64)),
                         "lat5": pa.array(lat5[idx]),
                         "lon5": pa.array(lon5[idx]),
                         "v": pa.array(v[idx])})

    return frags


def _idw_tile(meta: RasterMeta, tx: int, ty: int, klat: np.ndarray,
              klon: np.ndarray, kv: np.ndarray, r5: int, scale: int):
    """num/den int64 grids for one tile: integer IDW weights
    w = scale // (d2 + 1) for candidates with d2 <= r5^2."""
    T = meta.tile_size
    x_min5 = int(round(meta.x_min * 1e5))
    y_max5 = int(round(meta.y_max * 1e5))
    pw5 = int(round(meta.pixel_w * 1e5))
    ph5 = int(round(meta.pixel_h * 1e5))
    w_ = min(T, meta.width - tx * T)
    h_ = min(T, meta.height - ty * T)
    plon = x_min5 + (tx * T + np.arange(w_, dtype=np.int64)) * pw5 \
        + pw5 // 2
    plat = y_max5 + (ty * T + np.arange(h_, dtype=np.int64)) * ph5 \
        + ph5 // 2
    GLat = np.repeat(plat, w_)
    GLon = np.tile(plon, h_)
    num = np.zeros(h_ * w_, dtype=np.int64)
    den = np.zeros(h_ * w_, dtype=np.int64)
    r5sq = r5 * r5
    step = max(1, 4_000_000 // max(1, len(klat)))
    # chunk buffers allocated ONCE per tile and reused via out= —
    # fresh [step x cand] allocations per chunk page-fault ~100x
    # slower than the arithmetic under memory pressure
    d2b = np.empty((min(step, len(GLat)), len(klat)), dtype=np.int64)
    tb = np.empty_like(d2b)
    for i in range(0, len(GLat), step):
        m = min(step, len(GLat) - i)
        d2, tt = d2b[:m], tb[:m]
        np.subtract(GLon[i:i + m, None], klon[None, :], out=d2)
        np.multiply(d2, d2, out=d2)
        np.subtract(GLat[i:i + m, None], klat[None, :], out=tt)
        np.multiply(tt, tt, out=tt)
        np.add(d2, tt, out=d2)
        # int64 division is the expensive op and the radius circle
        # covers ~(pi r^2 / tile area) of the matrix — divide only
        # the within-radius cells (10x on sparse tiles), then fold
        # them back with exact int64 scatter-adds
        rows, cols = np.nonzero(d2 <= r5sq)
        if len(rows):
            w = scale // (d2[rows, cols] + 1)
            np.add.at(num, i + rows, w * kv[cols])
            np.add.at(den, i + rows, w)
    return num.reshape(h_, w_), den.reshape(h_, w_)


def idw_tile_stats(ds, meta: RasterMeta, *, radius_deg: float,
                   value_col: str, lat_col: str = "lat",
                   lon_col: str = "lon", scale: int = 10 ** 12,
                   buckets: int | None = None):
    """Inverse-distance-weighted interpolation of a point attribute
    onto ``meta``'s pixel grid, reduced to per-tile INTEGER partials
    (num_sum = Σ w·v, den_sum = Σ w, n_covered = pixels with a point
    within r): exact, order-independent, oracle-hashable. Weights are
    the discrete w = scale // (d2 + 1) with d in 1e-5-degree units —
    pure int64 arithmetic end to end (the conventional 1/d^2 float
    weight has no order-independent distributed sum). Tiles where no
    pixel is covered are dropped.

    Scale shape: one narrow fragment shuffle (each point ships ~28 B
    to the few tiles its radius touches), bucketed on hash(tile);
    per tile a chunked [pixels x candidates] int64 matrix."""
    r5 = int(round(radius_deg * 1e5))
    if r5 <= 0:
        raise ValueError("radius_deg must be >= 1e-5")
    if scale <= r5 * r5:
        raise ValueError("scale must exceed r5^2 or far weights "
                         "truncate to 0 inside the radius")
    b = buckets or max(64, cluster_cpus() * 4)
    frags = _idw_frags(meta, r5, b)

    def tag(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return frags(t, lat_col, lon_col, v)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        tk = df["_tkey"].to_numpy()
        order = np.argsort(tk, kind="stable")
        tk = tk[order]
        klat = df["lat5"].to_numpy()[order]
        klon = df["lon5"].to_numpy()[order]
        kv = df["v"].to_numpy()[order]
        starts = np.concatenate(([0], np.flatnonzero(np.diff(tk)) + 1))
        ends = np.concatenate((starts[1:], [len(tk)]))
        txs, tys, nums, dens, covs = [], [], [], [], []
        for s, e in zip(starts, ends):
            tx = int(tk[s]) // (1 << 20)
            ty = int(tk[s]) % (1 << 20)
            num, den = _idw_tile(meta, tx, ty, klat[s:e], klon[s:e],
                                 kv[s:e], r5, scale)
            cov = int((den > 0).sum())
            if cov == 0:
                continue          # bbox overlapped, circle missed
            txs.append(tx)
            tys.append(ty)
            nums.append(int(num.sum()))
            dens.append(int(den.sum()))
            covs.append(cov)
        return pd.DataFrame({
            "tx": np.asarray(txs, dtype=np.int64),
            "ty": np.asarray(tys, dtype=np.int64),
            "num_sum": np.asarray(nums, dtype=np.int64),
            "den_sum": np.asarray(dens, dtype=np.int64),
            "n_covered": np.asarray(covs, dtype=np.int64)})

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(per_bucket, batch_format="pandas")


def idw_raster(ds, meta: RasterMeta, *, radius_deg: float,
               value_col: str, lat_col: str = "lat",
               lon_col: str = "lon", scale: int = 10 ** 12,
               buckets: int | None = None):
    """The raster form of :func:`idw_tile_stats`: (tile Dataset(tx,
    ty, band, data float64 num/den; 0 where uncovered), meta with
    dtype float64). Sparse-tile convention: tiles with no covered
    pixel are absent. Feeds the standard raster stages (tile_math,
    minmax, reclassify, rendering)."""
    r5 = int(round(radius_deg * 1e5))
    if r5 <= 0:
        raise ValueError("radius_deg must be >= 1e-5")
    b = buckets or max(64, cluster_cpus() * 4)
    frags = _idw_frags(meta, r5, b)
    T = meta.tile_size

    def tag(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return frags(t, lat_col, lon_col, v)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        tk = df["_tkey"].to_numpy()
        order = np.argsort(tk, kind="stable")
        tk = tk[order]
        klat = df["lat5"].to_numpy()[order]
        klon = df["lon5"].to_numpy()[order]
        kv = df["v"].to_numpy()[order]
        starts = np.concatenate(([0], np.flatnonzero(np.diff(tk)) + 1))
        ends = np.concatenate((starts[1:], [len(tk)]))
        txs, tys, bufs = [], [], []
        for s, e in zip(starts, ends):
            tx = int(tk[s]) // (1 << 20)
            ty = int(tk[s]) % (1 << 20)
            num, den = _idw_tile(meta, tx, ty, klat[s:e], klon[s:e],
                                 kv[s:e], r5, scale)
            if not (den > 0).any():
                continue
            with np.errstate(divide="ignore", invalid="ignore"):
                val = np.where(den > 0, num / np.maximum(den, 1), 0.0)
            # ragged edge tiles pad to T x T (tile table convention)
            if val.shape != (T, T):
                full = np.zeros((T, T), dtype=np.float64)
                full[:val.shape[0], :val.shape[1]] = val
                val = full
            txs.append(tx)
            tys.append(ty)
            bufs.append(np.ascontiguousarray(
                val.astype(np.float64)).tobytes())
        return pd.DataFrame({
            "tx": np.asarray(txs, dtype=np.int32),
            "ty": np.asarray(tys, dtype=np.int32),
            "band": np.zeros(len(txs), dtype=np.int32),
            "data": bufs})

    import dataclasses
    out_meta = dataclasses.replace(meta, dtype="float64")
    tiles = ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(per_bucket, batch_format="pandas")
    return tiles, out_meta


def proximity_tile_stats(ds, meta: RasterMeta, *, radius_deg: float,
                         lat_col: str = "lat", lon_col: str = "lon",
                         buckets: int | None = None,
                         dedup_coords: bool = True):
    """Proximity grid (the gdal_proximity operator class, absent from
    the reference): per pixel the MINIMUM squared fixed-point distance
    to any input point within ``radius_deg``, reduced to per-tile
    integer aggregates (d2_sum = Σ min-d2 over covered pixels,
    d2_min = min over the tile, n_covered) — exact int64 end to end,
    so the per-pixel SQL twin hashes identically. Shares the IDW
    fragment router (one narrow shuffle, bbox-overcovered, exact
    circle predicate in the kernel). Uncovered tiles are dropped.
    ``dedup_coords`` folds duplicate fixed-point coordinates before
    the shuffle — exact for a min."""
    r5 = int(round(radius_deg * 1e5))
    if r5 <= 0:
        raise ValueError("radius_deg must be >= 1e-5")
    b = buckets or max(64, cluster_cpus() * 4)
    frags = _idw_frags(meta, r5, b)
    T = meta.tile_size
    x_min5 = int(round(meta.x_min * 1e5))
    y_max5 = int(round(meta.y_max * 1e5))
    pw5 = int(round(meta.pixel_w * 1e5))
    ph5 = int(round(meta.pixel_h * 1e5))
    SENT = np.iinfo(np.int64).max
    r5sq = r5 * r5

    if dedup_coords:
        from spapy_ray.stages.cluster import distinct_coords, unpack5

        src = distinct_coords(ds, lat_col=lat_col, lon_col=lon_col,
                              buckets=b)

        def tag(t: pa.Table) -> pa.Table:
            lat5, lon5 = unpack5(t.column("pk").to_numpy())
            pts = pa.table({lat_col: pa.array(lat5 / 1e5),
                            lon_col: pa.array(lon5 / 1e5)})
            return frags(pts, lat_col, lon_col,
                         np.zeros(len(pts), dtype=np.int64))
    else:
        src = ds

        def tag(t: pa.Table) -> pa.Table:
            return frags(t, lat_col, lon_col,
                         np.zeros(len(t), dtype=np.int64))

    def _tile_min(tx: int, ty: int, klat, klon) -> np.ndarray:
        w_ = min(T, meta.width - tx * T)
        h_ = min(T, meta.height - ty * T)
        plon = x_min5 + (tx * T + np.arange(w_, dtype=np.int64)) \
            * pw5 + pw5 // 2
        plat = y_max5 + (ty * T + np.arange(h_, dtype=np.int64)) \
            * ph5 + ph5 // 2
        GLat = np.repeat(plat, w_)
        GLon = np.tile(plon, h_)
        best = np.full(h_ * w_, SENT, dtype=np.int64)
        step = max(1, 4_000_000 // max(1, len(klat)))
        # once-per-tile chunk buffers (see _idw_tile)
        d2b = np.empty((min(step, len(GLat)), len(klat)),
                       dtype=np.int64)
        tb = np.empty_like(d2b)
        for i in range(0, len(GLat), step):
            m = min(step, len(GLat) - i)
            d2, tt = d2b[:m], tb[:m]
            np.subtract(GLon[i:i + m, None], klon[None, :], out=d2)
            np.multiply(d2, d2, out=d2)
            np.subtract(GLat[i:i + m, None], klat[None, :], out=tt)
            np.multiply(tt, tt, out=tt)
            np.add(d2, tt, out=d2)
            np.minimum(best[i:i + m], d2.min(axis=1),
                       out=best[i:i + m])
        best[best > r5sq] = SENT
        return best

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        tk = df["_tkey"].to_numpy()
        order = np.argsort(tk, kind="stable")
        tk = tk[order]
        klat = df["lat5"].to_numpy()[order]
        klon = df["lon5"].to_numpy()[order]
        starts = np.concatenate(([0], np.flatnonzero(np.diff(tk)) + 1))
        ends = np.concatenate((starts[1:], [len(tk)]))
        txs, tys, sums, mins, covs = [], [], [], [], []
        for s, e in zip(starts, ends):
            tx = int(tk[s]) // (1 << 20)
            ty = int(tk[s]) % (1 << 20)
            best = _tile_min(tx, ty, klat[s:e], klon[s:e])
            cov = best < SENT
            ncov = int(cov.sum())
            if ncov == 0:
                continue
            txs.append(tx)
            tys.append(ty)
            sums.append(int(best[cov].sum()))
            mins.append(int(best[cov].min()))
            covs.append(ncov)
        return pd.DataFrame({
            "tx": np.asarray(txs, dtype=np.int64),
            "ty": np.asarray(tys, dtype=np.int64),
            "d2_sum": np.asarray(sums, dtype=np.int64),
            "d2_min": np.asarray(mins, dtype=np.int64),
            "n_covered": np.asarray(covs, dtype=np.int64)})

    return src.map_batches(tag, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(per_bucket, batch_format="pandas")


def kde_tile_stats(ds, meta: RasterMeta, *, radius_deg: float,
                   kscale: int = 100_000, lat_col: str = "lat",
                   lon_col: str = "lon", buckets: int | None = None,
                   dedup_coords: bool = True):
    """Kernel-density heatmap (the point-heatmap / KDE operator class,
    absent from the reference): per pixel the integer quartic-kernel
    density  Σ_points u², u = (r5² − d2) // kscale  for points with
    d2 ≤ r5² — the discrete analogue of the Epanechnikov-squared
    kernel (1 − (d/r)²)². Integer weights make the distributed sum
    order-independent and exactly SQL-twinnable (the float Gaussian
    has neither property). Reduced to per-tile aggregates
    (w_sum = Σ pixel densities, w_max = hottest pixel, n_covered =
    pixels with density > 0); pixels whose every candidate lands at
    u = 0 count as uncovered in both engine and twin. Shares the IDW
    fragment router: one narrow shuffle, bbox overcoverage, exact
    circle predicate in the tile kernel. Uncovered tiles drop.

    kscale bounds the per-point weight at (r5²//kscale)² — size it so
    hot-cell pixel sums stay far from int64 (defaults give ≤1.6e11
    per point, ~3e14 for a 2000-point urban pixel).

    ``dedup_coords`` (default on) folds duplicate fixed-point
    coordinates to one weighted candidate BEFORE the fragment
    shuffle (stages.cluster.distinct_coords) — exact, because the
    kernel depends only on the coordinate: dens += w·u². Web-page
    corpora are duplicate-heavy (repeated urls geocode identically);
    the hot-tile candidate count is what the kernel's cost scales
    with."""
    r5 = int(round(radius_deg * 1e5))
    if r5 <= 0:
        raise ValueError("radius_deg must be >= 1e-5")
    if kscale <= 0 or (r5 * r5) // kscale <= 0:
        raise ValueError("kscale must be positive and below r5^2")
    b = buckets or max(64, cluster_cpus() * 4)
    frags = _idw_frags(meta, r5, b)
    T = meta.tile_size
    x_min5 = int(round(meta.x_min * 1e5))
    y_max5 = int(round(meta.y_max * 1e5))
    pw5 = int(round(meta.pixel_w * 1e5))
    ph5 = int(round(meta.pixel_h * 1e5))
    r5sq = r5 * r5

    if dedup_coords:
        from spapy_ray.stages.cluster import distinct_coords, unpack5

        dc = distinct_coords(ds, lat_col=lat_col, lon_col=lon_col,
                             buckets=b)

        def tag(t: pa.Table) -> pa.Table:
            lat5, lon5 = unpack5(t.column("pk").to_numpy())
            # /1e5 then rint(*1e5) round-trips exactly for |deg|<=180
            pts = pa.table({lat_col: pa.array(lat5 / 1e5),
                            lon_col: pa.array(lon5 / 1e5)})
            w = t.column("w").to_numpy().astype(np.int64)
            return frags(pts, lat_col, lon_col, w)

        src = dc
    else:
        def tag(t: pa.Table) -> pa.Table:
            return frags(t, lat_col, lon_col,
                         np.ones(len(t), dtype=np.int64))

        src = ds

    def _tile_kde(tx: int, ty: int, klat, klon, kw) -> np.ndarray:
        w_ = min(T, meta.width - tx * T)
        h_ = min(T, meta.height - ty * T)
        plon = x_min5 + (tx * T + np.arange(w_, dtype=np.int64)) \
            * pw5 + pw5 // 2
        plat = y_max5 + (ty * T + np.arange(h_, dtype=np.int64)) \
            * ph5 + ph5 // 2
        GLat = np.repeat(plat, w_)
        GLon = np.tile(plon, h_)
        dens = np.zeros(h_ * w_, dtype=np.int64)
        step = max(1, 4_000_000 // max(1, len(klat)))
        # once-per-tile chunk buffers (see _idw_tile)
        d2b = np.empty((min(step, len(GLat)), len(klat)),
                       dtype=np.int64)
        tb = np.empty_like(d2b)
        for i in range(0, len(GLat), step):
            m = min(step, len(GLat) - i)
            d2, tt = d2b[:m], tb[:m]
            np.subtract(GLon[i:i + m, None], klon[None, :], out=d2)
            np.multiply(d2, d2, out=d2)
            np.subtract(GLat[i:i + m, None], klat[None, :], out=tt)
            np.multiply(tt, tt, out=tt)
            np.add(d2, tt, out=d2)
            rows, cols = np.nonzero(d2 <= r5sq)
            if len(rows):
                u = (r5sq - d2[rows, cols]) // kscale
                np.add.at(dens, i + rows, u * u * kw[cols])
        return dens

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        tk = df["_tkey"].to_numpy()
        order = np.argsort(tk, kind="stable")
        tk = tk[order]
        klat = df["lat5"].to_numpy()[order]
        klon = df["lon5"].to_numpy()[order]
        kw = df["v"].to_numpy()[order]
        starts = np.concatenate(([0], np.flatnonzero(np.diff(tk)) + 1))
        ends = np.concatenate((starts[1:], [len(tk)]))
        txs, tys, sums, maxs, covs = [], [], [], [], []
        for s, e in zip(starts, ends):
            tx = int(tk[s]) // (1 << 20)
            ty = int(tk[s]) % (1 << 20)
            dens = _tile_kde(tx, ty, klat[s:e], klon[s:e], kw[s:e])
            cov = dens > 0
            ncov = int(cov.sum())
            if ncov == 0:
                continue
            txs.append(tx)
            tys.append(ty)
            sums.append(int(dens.sum()))
            maxs.append(int(dens.max()))
            covs.append(ncov)
        return pd.DataFrame({
            "tx": np.asarray(txs, dtype=np.int64),
            "ty": np.asarray(tys, dtype=np.int64),
            "w_sum": np.asarray(sums, dtype=np.int64),
            "w_max": np.asarray(maxs, dtype=np.int64),
            "n_covered": np.asarray(covs, dtype=np.int64)})

    return src.map_batches(tag, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(per_bucket, batch_format="pandas")


def sample_raster(pts, tiles, meta: RasterMeta, *, dtype: str,
                  px_col: str = "px", py_col: str = "py",
                  out_col: str = "z", fill: float | None = None,
                  buckets: int | None = None):
    """Point-sample a tile-table raster: attach the pixel value under
    each point's (px, py) to the point rows (the gather half of the
    vector<->raster pair; rasterize_points is the scatter half).

    Scale shape: points and tiles co-partition through ONE bucketed
    union-groupby on hash(tile key) — each group decodes its tiles
    ONCE and gathers all of its points with vectorized indexing, so
    the tile payload never replicates per point (a row-level join
    would copy tile_size^2 bytes onto every sample row).  Points in
    tiles absent from a sparse raster get ``fill`` (raise if None).
    """
    from spapy_ray.stages.raster import decode_tile

    T = meta.tile_size
    b = buckets or max(64, cluster_cpus() * 4)
    sch = pts.schema()
    pnames = list(sch.names)
    int_out = np.dtype(dtype).kind in "iu"
    out_type = pa.int64() if int_out else pa.float64()

    def p_rows(t: pa.Table) -> pa.Table:
        px = t.column(px_col).to_numpy(zero_copy_only=False)
        py = t.column(py_col).to_numpy(zero_copy_only=False)
        tk = ((px // T) * np.int64(1 << 21) + (py // T)).astype(np.int64)
        t = t.append_column("_tk", pa.array(tk))
        t = t.append_column("_data", pa.nulls(len(t), type=pa.binary()))
        h = ((tk.astype(np.uint64) * _MIX) >> np.uint64(33)) \
            % np.uint64(b)
        return t.append_column("_bkt", pa.array(h.astype(np.int32)))

    def t_rows(t: pa.Table) -> pa.Table:
        tx = t.column("tx").to_numpy(zero_copy_only=False).astype(np.int64)
        ty = t.column("ty").to_numpy(zero_copy_only=False).astype(np.int64)
        tk = tx * np.int64(1 << 21) + ty
        cols = {c: pa.nulls(len(t), type=sch.types[i])
                for i, c in enumerate(pnames)}
        cols["_tk"] = pa.array(tk)
        cols["_data"] = t.column("data")
        h = ((tk.astype(np.uint64) * _MIX) >> np.uint64(33)) \
            % np.uint64(b)
        cols["_bkt"] = pa.array(h.astype(np.int32))
        return pa.table(cols)

    import pyarrow.compute as pc

    def gather(g: pa.Table) -> pa.Table:
        is_tile = pc.is_valid(g.column("_data"))
        tl = g.filter(is_tile)
        pt = g.filter(pc.invert(is_tile))
        if len(pt) == 0:
            return pt.select(pnames).append_column(
                out_col, pa.array([], type=out_type))
        tks = tl.column("_tk").to_pylist()
        if len(set(tks)) != len(tks):
            raise ValueError("sample_raster: duplicate tile key — "
                             "multi-band rasters need a band filter "
                             "before sampling (keys are (tx, ty))")
        arrs = {int(k): decode_tile(bf, dtype, T).ravel()
                for k, bf in zip(tks, tl.column("_data").to_pylist())}
        px = pt.column(px_col).to_numpy(zero_copy_only=False)
        py = pt.column(py_col).to_numpy(zero_copy_only=False)
        tk = ((px // T) * np.int64(1 << 21) + (py // T)).astype(np.int64)
        pidx = ((py % T) * T + (px % T)).astype(np.int64)
        out = np.full(len(pt), fill if fill is not None else 0,
                      dtype=np.int64 if int_out else np.float64)
        done = np.zeros(len(pt), dtype=bool)
        for k in np.unique(tk):
            m = tk == k
            a = arrs.get(int(k))
            if a is not None:
                out[m] = a[pidx[m]]
                done[m] = True
        if fill is None and not done.all():
            raise KeyError("sample_raster: point in a tile absent "
                           "from the raster (pass fill= for sparse)")
        return pt.select(pnames).append_column(
            out_col, pa.array(out, type=out_type))

    u = pts.map_batches(p_rows, batch_format="pyarrow").union(
        tiles.map_batches(t_rows, batch_format="pyarrow"))
    return u.groupby("_bkt").map_groups(gather, batch_format="pyarrow")


def burn_cells(segments, *, n: int, tile_size: int,
               buckets: int | None = None):
    """Burn axis-aligned cell-space segments into the 2^res grid (the
    line half of gdal_rasterize; rasterize_points is the point half).

    ``segments`` rows: (gid, cx0, cx1, cy0, cy1) with inclusive cell
    ranges (a segment is one cell wide in one axis; a filled box
    works too).  Expansion is vectorized (repeat + arange over the
    range lengths), duplicate (gid, cell) burns collapse in ONE
    hash(gid) bucket groupby — a feature's overlapping edge corners
    dedup locally because a gid lives in exactly one bucket — and the
    per-tile counts fold through per-batch combiner partials.

    Returns Dataset(tx, ty, n_burned, n_gids): distinct burned
    (gid, cell) pairs and distinct gids touching each tile.
    """
    import pandas as pd

    from spapy_ray.stages.relational import bucketed_group_agg

    T = tile_size

    def expand(t: pa.Table) -> pa.Table:
        gid = t.column("gid").to_numpy(zero_copy_only=False)
        cx0 = t.column("cx0").to_numpy(zero_copy_only=False)
        cx1 = t.column("cx1").to_numpy(zero_copy_only=False)
        cy0 = t.column("cy0").to_numpy(zero_copy_only=False)
        cy1 = t.column("cy1").to_numpy(zero_copy_only=False)
        nx = cx1 - cx0 + 1
        ny = cy1 - cy0 + 1
        if len(nx) and (min(nx.min(), ny.min()) < 1
                        or cx0.min() < 0 or cy0.min() < 0
                        or cx1.max() >= n or cy1.max() >= n):
            raise ValueError("burn_cells: segment ranges must be "
                             "ascending and inside the grid")
        reps = nx * ny
        idx = np.repeat(np.arange(len(gid)), reps)
        offs = np.concatenate([np.arange(v) for v in reps]) \
            if len(gid) else np.empty(0, np.int64)
        ox = offs % np.maximum(nx[idx], 1)
        oy = offs // np.maximum(nx[idx], 1)
        cell = (cy0[idx] + oy) * np.int64(n) + (cx0[idx] + ox)
        return pa.table({
            "gid": pa.array(gid[idx].astype(np.int64)),
            "cell": pa.array(cell.astype(np.int64)),
        })

    cells = segments.map_batches(expand, batch_format="pyarrow")

    def local(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["gid", "cell"])

    uniq = bucketed_group_agg(cells, "gid", local, buckets=buckets)

    # tile stats from the deduped (gid, cell) rows: one more bucketed
    # groupby keyed on the tile (n_gids is a per-tile DISTINCT, so it
    # cannot fold from additive partials — the tile key must own all
    # of its rows, which the bucket shuffle guarantees)
    def tile_rows(t: pa.Table) -> pa.Table:
        cell = t.column("cell").to_numpy(zero_copy_only=False)
        gid = t.column("gid").to_numpy(zero_copy_only=False)
        cx, cy = cell % n, cell // n
        tk = (cx // T) * np.int64(n) + (cy // T)
        return pa.table({"tk": pa.array(tk),
                         "gid": pa.array(gid)})

    def tile_agg(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("tk", as_index=False, sort=False).agg(
            n_burned=("gid", "size"), n_gids=("gid", "nunique"))

    tiles = bucketed_group_agg(
        uniq.map_batches(tile_rows, batch_format="pyarrow"),
        "tk", tile_agg)

    def shape(t: pa.Table) -> pa.Table:
        tk = t.column("tk").to_numpy(zero_copy_only=False)
        return pa.table({
            "tx": pa.array((tk // n).astype(np.int64)),
            "ty": pa.array((tk % n).astype(np.int64)),
            "n_burned": pc.cast(t.column("n_burned"), pa.int64()),
            "n_gids": pc.cast(t.column("n_gids"), pa.int64()),
        })

    return tiles.map_batches(shape, batch_format="pyarrow")
