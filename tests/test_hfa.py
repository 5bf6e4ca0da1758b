"""Native minimal Erdas HFA (.img) codec (sources/hfa.py)."""

import os

import numpy as np
import pytest


def _tiles_from_array(arr, T):
    import pyarrow as pa
    import ray.data as rd

    h, w = arr.shape
    rows = []
    for ty in range(-(-h // T)):
        for tx in range(-(-w // T)):
            tile = arr[ty * T:(ty + 1) * T, tx * T:(tx + 1) * T]
            rows.append({"tx": tx, "ty": ty, "band": 0,
                         "h": tile.shape[0], "w": tile.shape[1],
                         "data": np.ascontiguousarray(tile).tobytes()})
    return rd.from_arrow(pa.Table.from_pylist(rows))


@pytest.mark.parametrize("dtype", ["uint8", "int16", "int32",
                                   "float32", "float64"])
def test_hfa_roundtrip_ragged(ray_session, tmp_path, dtype):
    from spapy_ray.sources.hfa import read_hfa, write_hfa
    from spapy_ray.sources.rasters import RasterMeta
    from spapy_ray.stages.raster import decode_tile

    rng = np.random.default_rng(hash(dtype) % 2 ** 31)
    arr = rng.integers(0, 200, size=(70, 90)).astype(dtype)
    meta = RasterMeta(width=90, height=70, tile_size=32,
                      x_min=-3.5, y_max=41.25, pixel_w=0.5,
                      pixel_h=-0.5, dtype=dtype)
    path = str(tmp_path / "t.img")
    write_hfa(_tiles_from_array(arr, 32), meta, path, dtype=dtype)

    back, bmeta, nodata = read_hfa(path)
    assert (bmeta.width, bmeta.height) == (90, 70)
    assert bmeta.tile_size == 32 and bmeta.dtype == dtype
    assert abs(bmeta.x_min - meta.x_min) < 1e-9
    assert abs(bmeta.y_max - meta.y_max) < 1e-9
    assert bmeta.pixel_w == 0.5 and bmeta.pixel_h == -0.5

    got = np.zeros_like(arr)
    for r in back.to_pandas().itertuples(index=False):
        a = decode_tile(r.data, dtype, 32, int(r.h), int(r.w))
        got[r.ty * 32:r.ty * 32 + int(r.h),
            r.tx * 32:r.tx * 32 + int(r.w)] = a
    assert (got == arr).all()


def test_hfa_get_input_routes(ray_session, tmp_path):
    from spapy_ray.sources.dispatch import get_input
    from spapy_ray.sources.hfa import write_hfa
    from spapy_ray.sources.rasters import RasterMeta

    arr = np.arange(64 * 64, dtype=np.int32).reshape(64, 64)
    meta = RasterMeta(width=64, height=64, tile_size=64,
                      x_min=0.0, y_max=64.0, pixel_w=1.0,
                      pixel_h=-1.0)
    path = str(tmp_path / "r.img")
    write_hfa(_tiles_from_array(arr, 64), meta, path, dtype="int32")
    ds, m = get_input(path)
    assert m.width == 64
    assert ds.count() == 1


def test_hfa_fails_loud(tmp_path):
    from spapy_ray.sources.hfa import read_hfa, write_hfa

    p = str(tmp_path / "bad.img")
    with open(p, "wb") as f:
        f.write(b"NOT AN HFA FILE AT ALL")
    with pytest.raises(ValueError, match="magic"):
        read_hfa(p)
    with pytest.raises(ValueError, match="dtype"):
        write_hfa(None, None, p, dtype="int8")
