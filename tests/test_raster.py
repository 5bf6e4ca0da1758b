"""Raster tile-table operator tests (shared Ray session)."""

import numpy as np
import pytest

from spapy_ray.sources.rasters import (DEM_META, RasterMeta, dem_float_value,
                                       dem_int_value, np_dtype,
                                       synth_dem_dataset, synth_dem_table,
                                       tile_pixels)
from spapy_ray.stages.raster import (crop_aligned, decode_tile,
                                     hillshade_kernel, horn_slope_aspect,
                                     raster_histogram, raster_minmax,
                                     reclassify, tile_binary_math, tile_math)

SMALL = RasterMeta(width=128, height=128, tile_size=32,
                   x_min=-180.0, y_max=85.0,
                   pixel_w=360.0 / 128, pixel_h=-170.0 / 128)


def _assemble(df, meta, dtype):
    """Tile table rows → full 2-D array."""
    full = np.zeros((meta.height, meta.width), dtype=np.dtype(dtype))
    for _, r in df.iterrows():
        a = decode_tile(r["data"], dtype, meta.tile_size)
        t = meta.tile_size
        full[r["ty"] * t:(r["ty"] + 1) * t, r["tx"] * t:(r["tx"] + 1) * t] = a
    return full


def _full_int(meta, salt=0):
    gx, gy = np.meshgrid(np.arange(meta.width), np.arange(meta.height))
    return dem_int_value(gx, gy, salt)


def test_synth_dataset_matches_table(ray_session):
    ds = synth_dem_dataset(SMALL, kind="int")
    df = ds.to_pandas().sort_values(["ty", "tx"]).reset_index(drop=True)
    tbl = synth_dem_table(SMALL, kind="int").to_pandas() \
        .sort_values(["ty", "tx"]).reset_index(drop=True)
    assert df.equals(tbl)
    assert np.array_equal(_assemble(df, SMALL, "int32"), _full_int(SMALL))


def test_tile_math_scalar_and_unary(ray_session):
    ds = synth_dem_dataset(SMALL, kind="int")
    out = tile_math(ds, "add", 100, dtype="int32", tile_size=32).to_pandas()
    assert np.array_equal(_assemble(out, SMALL, "int32"), _full_int(SMALL) + 100)
    out2 = tile_math(ds, "greater", 128, dtype="int32", tile_size=32).to_pandas()
    got = _assemble(out2, SMALL, "uint8")
    assert np.array_equal(got, (_full_int(SMALL) > 128).astype(np.uint8))
    # swap: scalar - raster
    out3 = tile_math(ds, "subtract", 255, dtype="int32", tile_size=32,
                     swap=True).to_pandas()
    assert np.array_equal(_assemble(out3, SMALL, "int32"), 255 - _full_int(SMALL))


def test_tile_math_nodata_mask(ray_session):
    ds = synth_dem_dataset(SMALL, kind="int")
    # value 0 acts as nodata: must survive +100 untouched
    out = tile_math(ds, "add", 100, dtype="int32", tile_size=32,
                    nodata=0).to_pandas()
    full = _full_int(SMALL)
    expected = np.where(full == 0, 0, full + 100)
    assert np.array_equal(_assemble(out, SMALL, "int32"), expected)


def test_reclassify(ray_session):
    ds = synth_dem_dataset(SMALL, kind="int")
    out = reclassify(ds, bounds=[0, 64, 128, 192, 256], values=[1, 2, 3, 4],
                     dtype="int32", tile_size=32).to_pandas()
    full = _full_int(SMALL)
    expected = np.digitize(full, [64, 128, 192]) + 1
    assert np.array_equal(_assemble(out, SMALL, "int32"), expected)


def test_crop_aligned(ray_session):
    ds = synth_dem_dataset(SMALL, kind="int")
    out = crop_aligned(ds, 1, 1, 3, 3).to_pandas()
    assert len(out) == 4
    meta_c = RasterMeta(width=64, height=64, tile_size=32, x_min=0, y_max=0,
                        pixel_w=1, pixel_h=-1)
    got = _assemble(out, meta_c, "int32")
    assert np.array_equal(got, _full_int(SMALL)[32:96, 32:96])


def test_binary_math_tile_join(ray_session):
    a = synth_dem_dataset(SMALL, kind="int", salt=0)
    b = synth_dem_dataset(SMALL, kind="int", salt=1)
    out = tile_binary_math(a, b, "subtract", dtype="int32", tile_size=32).to_pandas()
    expected = _full_int(SMALL, 0) - _full_int(SMALL, 1)
    assert np.array_equal(_assemble(out, SMALL, "int32"), expected)


def test_minmax_histogram(ray_session):
    ds = synth_dem_dataset(SMALL, kind="int")
    row = raster_minmax(ds, dtype="int32", tile_size=32)
    full = _full_int(SMALL)
    assert int(row["min_z"]) == int(full.min())
    assert int(row["max_z"]) == int(full.max())
    assert int(row["n_pixels"]) == full.size
    hist = raster_histogram(ds, dtype="int32", tile_size=32, nbins=16,
                            lo=0.0, hi=256.0).to_pandas()
    expected = np.bincount(full.ravel() // 16, minlength=16)
    got = np.zeros(16, dtype=np.int64)
    got[hist["bin"].to_numpy()] = hist["n_pixels"].to_numpy()
    assert np.array_equal(got, expected)


def test_hillshade_halo_matches_whole_array(ray_session):
    """Distributed halo-exchange hillshade == single whole-array
    computation with replicated-edge padding."""
    from spapy_ray.stages.raster import hillshade

    meta = RasterMeta(width=128, height=128, tile_size=32,
                      x_min=0.0, y_max=0.0, pixel_w=30.0, pixel_h=-30.0)
    gx, gy = np.meshgrid(np.arange(meta.width), np.arange(meta.height))
    full = dem_float_value(gx, gy)
    ds = synth_dem_dataset(meta, kind="float")
    out = hillshade(ds, meta, dtype="float32").to_pandas()
    got = _assemble(out, meta, "float32")
    pad = np.pad(full.astype(np.float64), 1, mode="edge")
    expected = hillshade_kernel(pad, 30.0, 30.0)
    assert np.allclose(got, expected, rtol=1e-5, atol=1e-4)


def test_slope_flat_is_zero(ray_session):
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd
    from spapy_ray.stages.raster import slope_degrees

    meta = RasterMeta(width=64, height=64, tile_size=32, x_min=0, y_max=0,
                      pixel_w=10.0, pixel_h=-10.0)
    flat = np.full((32, 32), 7.0, dtype=np.float32)
    rows = [{"tx": tx, "ty": ty, "band": 0, "data": flat.tobytes()}
            for tx in range(2) for ty in range(2)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = slope_degrees(ds, meta, dtype="float32").to_pandas()
    got = _assemble(out, meta, "float32")
    assert np.allclose(got, 0.0)
