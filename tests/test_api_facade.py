"""Reference-named one-liner façade (spapy_ray.api): a SpaPy user's
script shapes work over Datasets/Raster handles."""

import numpy as np
import pyarrow as pa
import pytest

from spapy_ray import api
from spapy_ray.kernels import geom, wkb
from spapy_ray.sources.rasters import RasterMeta, dem_int_value, \
    synth_dem_dataset
from spapy_ray.sources.zones import zones_table


def test_vector_one_liners(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(zones_table(12))
    assert api.Centroid(ds).count() == 12
    assert api.Buffer(ds, 0.5).count() == 12
    assert api.Simplify(api.Densify(ds, 0.5), 0.01).count() == 12
    hull = api.ConvexHull(ds).to_pandas()
    assert all(wkb.decode(g)[0] == "Polygon" for g in hull["geom_wkb"])
    clipped = api.Clip(ds, -180, -85, 0, 0)
    assert 0 < clipped.count() <= 12
    box = wkb.encode_polygon([np.array(
        [[-60, -85], [80, -85], [80, -55], [-60, -55]], float)])
    inter = api.Intersection(ds, box).to_pandas()
    assert (inter["overlay_area"] > 0).all()
    flags = api.Intersects(ds, box).to_pandas()
    assert set(inter["zone_id"]) == set(
        flags[flags["intersects"]]["zone_id"])
    # union self-fold returns a single-geometry result
    u = api.Union(ds)
    assert u is not None


def test_raster_one_liners(ray_session):
    meta = RasterMeta(width=128, height=128, tile_size=32, x_min=-180.0,
                      y_max=85.0, pixel_w=360.0 / 128, pixel_h=-170.0 / 128)
    r = api.Raster(synth_dem_dataset(meta, kind="int"), meta, "int32")
    mm = api.GetMinMax(r)
    assert mm["n_pixels"] == 128 * 128
    r2 = api.Add(r, 100)
    mm2 = api.GetMinMax(r2)
    assert mm2["min_z"] == mm["min_z"] + 100
    diff = api.Subtract(r, r)
    mmd = api.GetMinMax(diff)
    assert mmd["min_z"] == 0 and mmd["max_z"] == 0
    cropped = api.NumpyCrop(r, 10, 20, 70, 90)
    assert api.GetMinMax(cropped)["n_pixels"] == 60 * 70
    b = api.SetType(r, "uint8")
    assert b.dtype == "uint8"
    hs = api.Hillshade(api.SetType(r, "float32"))
    assert hs.ds.count() == 16
    cr = api.ColorRelief(r)
    assert cr.ds.count() == 3 * 16
    comp = api.Polygonize(api.ReclassifyRange(
        r, [0, 128, 256], [1, 2]))
    assert (comp["ring_area"] == comp["n_pixels"]).all()


def test_load_roundtrip(ray_session, tmp_path):
    from spapy_ray.sources.dispatch import write_raster

    meta = RasterMeta(width=64, height=64, tile_size=32, x_min=0.0,
                      y_max=0.0, pixel_w=1.0, pixel_h=-1.0)
    p = str(tmp_path / "r")
    write_raster(synth_dem_dataset(meta, kind="int"), p, meta)
    r = api.Load(p)
    assert isinstance(r, api.Raster)
    assert api.GetMinMax(r)["n_pixels"] == 64 * 64


def test_save_facade_shapefile_and_aaigrid(ray_session, tmp_path):
    """Save() routes vector layers to the native .shp writer and
    rasters to AAIGrid, round-tripping through Load()."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd
    from spapy_ray import api
    from spapy_ray.kernels import wkb

    tbl = pa.table({
        "geom_wkb": pa.array([wkb.encode_point(1.0, 2.0)],
                             type=pa.binary()),
        "id": pa.array([7], type=pa.int64())})
    p = str(tmp_path / "layer.shp")
    api.Save(rd.from_arrow(tbl), p)
    back = api.Load(p).to_pandas()
    assert back["id"].tolist() == [7]

    from spapy_ray.sources.rasters import RasterMeta

    meta = RasterMeta(width=8, height=8, tile_size=8, x_min=0.0,
                      y_max=8.0, pixel_w=1.0, pixel_h=-1.0)
    a = np.arange(64, dtype=np.int32).reshape(8, 8)
    ds = rd.from_arrow(pa.Table.from_pylist(
        [{"tx": 0, "ty": 0, "band": 0, "data": a.tobytes()}]))
    asc = str(tmp_path / "r.asc")
    api.Save(api.Raster(ds, meta, "int32"), asc)
    r2 = api.Load(asc)
    mm = api.GetMinMax(r2)
    assert (int(mm["min_z"]), int(mm["max_z"])) == (0, 63)


def test_north_rule_one_liners(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from spapy_ray import api

    pts = pa.table({
        "pid": np.arange(50, dtype=np.int64),
        "lat": np.linspace(-40, 40, 50) + 0.00005,
        "lon": np.linspace(-90, 90, 50) + 0.00005,
    })
    ds = rd.from_arrow(pts)
    counts = api.WithinDistanceCount(ds, 5.0, key_cols=("pid",)).to_pandas()
    assert len(counts) == 50 and (counts["n_neighbors"] >= 0).all()
    pairs = api.WithinDistancePairs(ds, 5.0, "pid").to_pandas()
    assert (pairs["key_a"] < pairs["key_b"]).all()

    pyr = api.TilePyramid(ds, res_hi=4, res_lo=2).to_pandas()
    assert set(pyr["res"]) == {2, 3, 4}
    assert pyr.groupby("res")["n_pages"].sum().eq(50).all()

    tiles, meta = api.RasterizePoints(ds, res=8, tile_size=64)
    r = api.Raster(tiles, meta, "int32")
    assert api.GetMinMax(r)["max_z"] >= 1

    left = rd.from_arrow(pa.table({"k": [1, 2], "x": ["a", "b"]}))
    right = rd.from_arrow(pa.table({"k": [2, 3], "y": [9, 9]}))
    j = api.HashJoin(left, right, "k").to_pandas()
    assert j["k"].tolist() == [2]

    parsed = api.UrlParse(rd.from_arrow(pa.table(
        {"url": ["https://h.example/p"]}))).to_pandas()
    assert parsed["host"][0] == "h.example"


def test_final_r4_facade_one_liners(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from spapy_ray import api
    from spapy_ray.stages.voronoi import grid_sites

    meta = RasterMeta(width=64, height=64, tile_size=32, x_min=0.0,
                      y_max=0.0, pixel_w=1.0, pixel_h=-1.0)
    r = api.Raster(synth_dem_dataset(meta, kind="int"), meta)
    fd = api.FlowDirection(r)
    assert fd.ds.count() == 4 and fd.dtype == "int32"
    fm = api.FocalMajority(api.ReclassifyRange(r, [0, 128, 256], [1, 2]),
                           n_classes=3)
    assert fm.ds.count() == 4

    sid, slat5, slon5 = grid_sites()
    pts = rd.from_pandas(pd.DataFrame(
        {"lat": [10.0, -42.5], "lon": [3.25, 100.0]}))
    ns = api.NearestSite(pts, sid, slat5, slon5).to_pandas()
    assert len(ns) == 2 and ns["site_id"].between(0, 63).all()

    emb = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(6, dtype=np.int64),
        "embedding": [list(v) for v in np.tile(
            np.eye(3), (2, 1)).astype(np.float64)]}))
    ex = api.EmbedNearDup(emb, threshold=0.99, exact=True).to_pandas()
    assert {(a, b) for a, b in zip(ex.key_a, ex.key_b)} == \
        {(0, 3), (1, 4), (2, 5)}


def test_session5_facade_one_liners(ray_session):
    import pandas as pd
    import ray.data as rd

    from spapy_ray import api

    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": [0, 1, 2],
        "lang": ["en", "en", "de"],
        "text": ["a b c d e f g h", "a b c d e f g h x", "q w e"]}))
    nd = api.NgramOverlapDups(docs, n=8).to_pandas()
    assert nd.to_dict("records") == [
        {"doc_id": 1, "n_dup_grams": 1, "first_owner": 0}]

    tf = api.TfidfTopTerms(docs, n_docs=3, k=2).to_pandas()
    assert set(tf.columns) == {"lang", "term", "tf", "df", "score",
                               "rank"}
    assert (tf.groupby("lang")["rank"].max() <= 2).all()

    edges = rd.from_pandas(pd.DataFrame(
        {"src": [0, 1, 1, 2], "dst": [1, 0, 2, 1]}))
    pr = api.PageRank(edges, iterations=2).to_pandas()
    assert len(pr) == 3 and (pr["pr"] > 0).all()

    meta = RasterMeta(width=64, height=64, tile_size=32, x_min=0.0,
                      y_max=0.0, pixel_w=1.0, pixel_h=-1.0)
    r = api.Raster(synth_dem_dataset(meta, kind="int"), meta)
    ws = api.Watershed(r, components_mode="driver").to_pandas()
    assert ws["n_cells"].sum() == 64 * 64
    fa = api.FlowAccumulation(r, components_mode="driver").to_pandas()
    assert fa["n_cells"].sum() == 64 * 64
    assert (fa["acc_sum"] >= fa["n_cells"]).all()
