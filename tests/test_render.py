"""PNG tile rendering: codec round-trip, ramp classification, and the
rendered-tile Dataset (png pixels == classify_rgb of the source)."""

import numpy as np
import pytest

from spapy_ray.stages.render import (DEFAULT_RENDER_BREAKS,
                                     DEFAULT_RENDER_COLORS, classify_rgb,
                                     decode_png, encode_png, render_tiles)


def test_png_roundtrip_rgb_and_rgba():
    rng = np.random.default_rng(5)
    for ch in (3, 4):
        img = rng.integers(0, 256, (17, 23, ch), dtype=np.uint8)
        back = decode_png(encode_png(img))
        assert back.shape == img.shape
        assert (back == img).all()


def test_png_rejects_bad_input():
    with pytest.raises(ValueError):
        encode_png(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_classify_rgb_interval_edges():
    a = np.array([[0, 63, 64], [127, 128, 192]], dtype=np.int32)
    rgb = classify_rgb(a, DEFAULT_RENDER_BREAKS, DEFAULT_RENDER_COLORS)
    cl = np.asarray(DEFAULT_RENDER_COLORS, dtype=np.uint8)
    exp = cl[np.array([[0, 0, 1], [1, 2, 3]])]
    assert (rgb == exp).all()


def test_render_tiles_pngs_match_source(ray_session):
    from spapy_ray.sources.rasters import DEM_META, synth_dem_dataset
    from spapy_ray.stages.raster import decode_tile

    ds = synth_dem_dataset(DEM_META, kind="int")
    src = {(int(r["tx"]), int(r["ty"])): r["data"]
           for r in ds.take_all()}
    out = render_tiles(ds, dtype="int32",
                       tile_size=DEM_META.tile_size).take_all()
    assert len(out) == len(src)
    for row in out[:8]:
        a = decode_tile(src[(row["tx"], row["ty"])], "int32",
                        DEM_META.tile_size)
        exp = classify_rgb(a, DEFAULT_RENDER_BREAKS, DEFAULT_RENDER_COLORS)
        got = decode_png(row["png"])
        assert (got == exp).all()
        assert row["r_sum"] == int(exp[:, :, 0].sum())
        assert row["b_sum"] == int(exp[:, :, 2].sum())
