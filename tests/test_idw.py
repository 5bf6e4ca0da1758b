"""IDW interpolation (stages/rasterize.idw_*) vs a whole-grid
brute-force kernel: integer weights scale // (d2+1), exact int64
num/den, per-tile sums, and the float raster form."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from spapy_ray.sources.rasters import RasterMeta
from spapy_ray.stages.rasterize import idw_raster, idw_tile_stats

META = RasterMeta(width=320, height=160, tile_size=32,
                  x_min=-160.0, y_max=80.0, pixel_w=1.0, pixel_h=-1.0)
R5 = 200000
SCALE = 10 ** 12


def brute_grids(lat, lon, v):
    x_min5, y_max5, pw5, ph5 = -16000000, 8000000, 100000, -100000
    lat5 = np.round(lat * 1e5).astype(np.int64)
    lon5 = np.round(lon * 1e5).astype(np.int64)
    plon = x_min5 + np.arange(320, dtype=np.int64) * pw5 + pw5 // 2
    plat = y_max5 + np.arange(160, dtype=np.int64) * ph5 + ph5 // 2
    NUM = np.zeros((160, 320), np.int64)
    DEN = np.zeros((160, 320), np.int64)
    for yi in range(160):
        dy = plat[yi] - lat5
        dx = plon[None, :] - lon5[:, None]
        d2 = dx * dx + (dy * dy)[:, None]
        w = np.where(d2 <= R5 * R5, SCALE // (d2 + 1), 0)
        NUM[yi] = (w * v[:, None]).sum(axis=0)
        DEN[yi] = w.sum(axis=0)
    return NUM, DEN


def points(seed=5, n=2500):
    rng = np.random.default_rng(seed)
    lat = np.round(rng.uniform(-85, 85, n) * 1e5) / 1e5
    lon = np.round(rng.uniform(-179, 179, n) * 1e5) / 1e5
    v = rng.integers(0, 256, n).astype(np.int64)
    return lat, lon, v


def test_idw_tile_stats_matches_brute(ray_session):
    lat, lon, v = points()
    NUM, DEN = brute_grids(lat, lon, v)
    ref = []
    for ty in range(5):
        for tx in range(10):
            nm = NUM[ty * 32:(ty + 1) * 32, tx * 32:(tx + 1) * 32]
            dn = DEN[ty * 32:(ty + 1) * 32, tx * 32:(tx + 1) * 32]
            cov = int((dn > 0).sum())
            if cov:
                ref.append((tx, ty, int(nm.sum()), int(dn.sum()), cov))
    ref = pd.DataFrame(ref, columns=["tx", "ty", "num_sum", "den_sum",
                                     "n_covered"]) \
        .sort_values(["tx", "ty"]).reset_index(drop=True)
    ds = rd.from_arrow(pa.table({"lat": lat, "lon": lon, "v": v}))
    got = idw_tile_stats(ds, META, radius_deg=2.0, value_col="v") \
        .to_pandas().sort_values(["tx", "ty"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[ref.columns].astype(np.int64), ref.astype(np.int64))


def test_idw_raster_per_pixel_exact(ray_session):
    lat, lon, v = points(11, 1500)
    NUM, DEN = brute_grids(lat, lon, v)
    ds = rd.from_arrow(pa.table({"lat": lat, "lon": lon, "v": v}))
    tiles, ometa = idw_raster(ds, META, radius_deg=2.0, value_col="v")
    assert ometa.dtype == "float64"
    tp = tiles.to_pandas()
    assert len(tp) > 0
    for _, row in tp.iterrows():
        tx, ty = int(row.tx), int(row.ty)
        arr = np.frombuffer(row["data"], dtype=np.float64) \
            .reshape(32, 32)
        nm = NUM[ty * 32:(ty + 1) * 32, tx * 32:(tx + 1) * 32]
        dn = DEN[ty * 32:(ty + 1) * 32, tx * 32:(tx + 1) * 32]
        want = np.where(dn > 0, nm / np.maximum(dn, 1), 0.0)
        assert np.array_equal(arr, want), (tx, ty)


def test_idw_point_on_pixel_center_and_far(ray_session):
    # exact pixel-center hit -> w = scale // 1; far point -> dropped
    ds = rd.from_arrow(pa.table({
        "lat": [79.5, 0.0], "lon": [-159.5, 0.123],
        "v": np.array([7, 9], dtype=np.int64)}))
    got = idw_tile_stats(ds, META, radius_deg=0.6, value_col="v") \
        .to_pandas().sort_values(["tx", "ty"]).reset_index(drop=True)
    top = got[(got.tx == 0) & (got.ty == 0)].iloc[0]
    # the center pixel contributes scale//1 * 7 to num
    assert top.num_sum >= SCALE * 7
    assert top.den_sum >= SCALE


def test_idw_rejects_odd_pixel_size(ray_session):
    bad = RasterMeta(width=10, height=10, tile_size=5, x_min=0.0,
                     y_max=1.0, pixel_w=0.00003, pixel_h=-0.00003)
    ds = rd.from_arrow(pa.table({"lat": [0.5], "lon": [0.5],
                                 "v": np.array([1], dtype=np.int64)}))
    with pytest.raises(ValueError):
        idw_tile_stats(ds, bad, radius_deg=0.1, value_col="v") \
            .to_pandas()


def test_proximity_matches_brute(ray_session):
    from spapy_ray.stages.rasterize import proximity_tile_stats
    lat, lon, _ = points(21, 1200)
    lat5 = np.round(lat * 1e5).astype(np.int64)
    lon5 = np.round(lon * 1e5).astype(np.int64)
    x_min5, y_max5, pw5, ph5 = -16000000, 8000000, 100000, -100000
    plon = x_min5 + np.arange(320, dtype=np.int64) * pw5 + pw5 // 2
    plat = y_max5 + np.arange(160, dtype=np.int64) * ph5 + ph5 // 2
    SENT = np.iinfo(np.int64).max
    BEST = np.full((160, 320), SENT, dtype=np.int64)
    for yi in range(160):
        dy = plat[yi] - lat5
        dx = plon[None, :] - lon5[:, None]
        d2 = dx * dx + (dy * dy)[:, None]
        BEST[yi] = d2.min(axis=0)
    BEST[BEST > R5 * R5] = SENT
    ref = []
    for ty in range(5):
        for tx in range(10):
            blk = BEST[ty * 32:(ty + 1) * 32, tx * 32:(tx + 1) * 32]
            cov = blk < SENT
            if cov.any():
                ref.append((tx, ty, int(blk[cov].sum()),
                            int(blk[cov].min()), int(cov.sum())))
    ref = pd.DataFrame(ref, columns=["tx", "ty", "d2_sum", "d2_min",
                                     "n_covered"]) \
        .sort_values(["tx", "ty"]).reset_index(drop=True)
    ds = rd.from_arrow(pa.table({"lat": lat, "lon": lon}))
    got = proximity_tile_stats(ds, META, radius_deg=2.0) \
        .to_pandas().sort_values(["tx", "ty"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[ref.columns].astype(np.int64), ref.astype(np.int64))
