"""Distributed raster prefix scans vs whole-array numpy references
(a 256x256 grid of 32-px tiles — 8x8 tiles, so every carry path
crosses several tiles in both axes)."""

import numpy as np
import pytest

from spapy_ray.sources.rasters import (RasterMeta, dem_int_value,
                                       synth_dem_dataset)
from spapy_ray.stages.rasterprefix import (SENT_MAX, distance_transform_l1,
                                           horizon_visibility,
                                           integral_image)

META = RasterMeta(width=256, height=256, tile_size=32,
                  x_min=-180.0, y_max=85.0,
                  pixel_w=360.0 / 256, pixel_h=-170.0 / 256)


def _full(meta: RasterMeta, salt: int = 0) -> np.ndarray:
    gx, gy = np.meshgrid(np.arange(meta.width), np.arange(meta.height))
    return dem_int_value(gx, gy, salt=salt).astype(np.int64)


def _tiles_to_array(ds, meta: RasterMeta) -> np.ndarray:
    T = meta.tile_size
    out = np.zeros((meta.height, meta.width), dtype=np.int64)
    for r in ds.take_all():
        a = np.frombuffer(r["data"], dtype=np.int64).reshape(T, T)
        out[r["ty"] * T:(r["ty"] + 1) * T,
            r["tx"] * T:(r["tx"] + 1) * T] = a
    return out


@pytest.fixture(scope="module")
def dem(ray_session):
    return synth_dem_dataset(META, kind="int").materialize()


def test_integral_matches_numpy(dem):
    sat_ds, out_meta = integral_image(dem, META, dtype="int32")
    got = _tiles_to_array(sat_ds, META)
    ref = _full(META).cumsum(axis=1).cumsum(axis=0)
    assert out_meta.dtype == "int64"
    np.testing.assert_array_equal(got, ref)


def test_distance_transform_matches_bruteforce(dem):
    dt_ds, _ = distance_transform_l1(dem, META, mark_value=0,
                                     dtype="int32")
    got = _tiles_to_array(dt_ds, META)
    arr = _full(META)
    ys, xs = np.nonzero(arr == 0)
    assert len(xs) > 50                     # fixture has real marks
    gy, gx = np.mgrid[0:META.height, 0:META.width]
    ref = np.full_like(arr, SENT_MAX)
    # brute force in chunks of marks (exact L1 min)
    for i in range(0, len(xs), 64):
        d = (np.abs(gx[..., None] - xs[None, None, i:i + 64])
             + np.abs(gy[..., None] - ys[None, None, i:i + 64])).min(-1)
        ref = np.minimum(ref, d)
    np.testing.assert_array_equal(got, ref)
    assert (got[arr == 0] == 0).all()


def test_horizon_matches_sequential(dem):
    stats = {(r["tx"], r["ty"]): (r["n_visible"], r["sum_q_visible"])
             for r in horizon_visibility(dem, META,
                                         dtype="int32").take_all()}
    arr = _full(META)
    T = META.tile_size
    nvis = np.zeros((META.height // T, META.width // T), dtype=np.int64)
    sq = np.zeros_like(nvis)
    for py in range(META.height):
        z0 = arr[py, 0]
        best = -(1 << 40)
        for px in range(1, META.width):
            d = (int(arr[py, px]) - int(z0)) << 20
            q = d // px if d >= 0 else -((-d) // px)
            if q >= best:
                nvis[py // T, px // T] += 1
                sq[py // T, px // T] += q
            best = max(best, q)
    for (tx, ty), (n, s) in stats.items():
        assert n == nvis[ty, tx]
        assert s == sq[ty, tx]


def test_integral_nonsquare_band_counts(ray_session):
    # 4x2 tile grid exercises unequal band lengths in both scans
    meta = RasterMeta(width=128, height=64, tile_size=32,
                      x_min=0.0, y_max=0.0, pixel_w=1.0, pixel_h=-1.0)
    ds = synth_dem_dataset(meta, kind="int", salt=3)
    sat_ds, _ = integral_image(ds, meta, dtype="int32")
    got = _tiles_to_array(sat_ds, meta)
    gx, gy = np.meshgrid(np.arange(meta.width), np.arange(meta.height))
    ref = dem_int_value(gx, gy, salt=3).astype(np.int64) \
        .cumsum(axis=1).cumsum(axis=0)
    np.testing.assert_array_equal(got, ref)
