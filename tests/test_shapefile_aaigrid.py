"""Native Shapefile + AAIGrid I/O (no fiona/GDAL).

Reference parity targets: SpaVectors.py:195-222 (fiona Load),
240-281 (Save); SpaRasters.py:752-824 (AAIGrid save via gdal)."""

import os
import struct

import numpy as np
import pyarrow as pa
import pytest

from spapy_ray.kernels import wkb
from spapy_ray.sources import shapefile as shp
from spapy_ray.sources.rasters import RasterMeta


def _square(x0, y0, s):
    return np.array([[x0, y0], [x0 + s, y0], [x0 + s, y0 + s],
                     [x0, y0 + s], [x0, y0]], dtype=np.float64)


def test_shapefile_polygon_roundtrip(tmp_path):
    """write → read: polygons with a hole + a multipolygon + typed
    attributes survive byte-exactly (coordinates are f8 in both WKB
    and .shp, so the round trip is lossless)."""
    outer = _square(0, 0, 10)
    hole = _square(2, 2, 3)[::-1].copy()        # CCW hole in WKB order
    poly = wkb.encode_polygon([outer, hole])
    mp = wkb.encode_multipolygon([[_square(20, 0, 4)],
                                  [_square(30, 0, 5)]])
    tbl = pa.table({
        "geom_wkb": pa.array([poly, mp], type=pa.binary()),
        "name": pa.array(["with-hole", "two-parts"]),
        "rank": pa.array([3, 17], type=pa.int64()),
        "score": pa.array([0.25, -1.5], type=pa.float64()),
        "flag": pa.array([True, False]),
    })
    p = str(tmp_path / "layer.shp")
    shp.write_shapefile(tbl, p, crs="LOCAL_CS[\"test\"]")
    back, meta = shp.read_shapefile(p)
    assert meta["shp_type"] == shp.SHP_POLYGON
    assert meta["crs"] == "LOCAL_CS[\"test\"]"
    assert back.column("name").to_pylist() == ["with-hole", "two-parts"]
    assert back.column("rank").to_pylist() == [3, 17]
    assert back.column("score").to_pylist() == [0.25, -1.5]
    assert back.column("flag").to_pylist() == [True, False]
    # geometry: same ring structure (ring order/orientation normalized
    # through the shapefile CW-outer convention, so compare as sets of
    # vertex multisets per polygon)
    g0 = wkb.decode(back.column("geom_wkb")[0].as_py())
    assert g0[0] == "Polygon" and len(g0[1]) == 2
    assert {tuple(map(tuple, np.sort(r[:-1], axis=0))) for r in g0[1]} == \
        {tuple(map(tuple, np.sort(r[:-1], axis=0))) for r in [outer, hole]}
    g1 = wkb.decode(back.column("geom_wkb")[1].as_py())
    assert g1[0] == "MultiPolygon" and len(g1[1]) == 2


def test_shapefile_points_lines_roundtrip(tmp_path):
    pts = pa.table({
        "geom_wkb": pa.array([wkb.encode_point(1.5, -2.5),
                              wkb.encode_point(3.25, 4.75)],
                             type=pa.binary()),
        "id": pa.array([1, 2], type=pa.int64())})
    p1 = str(tmp_path / "pts.shp")
    shp.write_shapefile(pts, p1)
    back, meta = shp.read_shapefile(p1)
    assert meta["shp_type"] == shp.SHP_POINT
    assert [wkb.decode(g.as_py()) for g in back.column("geom_wkb")] == \
        [("Point", (1.5, -2.5)), ("Point", (3.25, 4.75))]

    line = np.array([[0, 0], [1, 1], [2, 0.5]], dtype=np.float64)
    mls = [np.array([[5, 5], [6, 6]], dtype=np.float64),
           np.array([[7, 7], [8, 6], [9, 9]], dtype=np.float64)]
    lines = pa.table({
        "geom_wkb": pa.array([wkb.encode_linestring(line),
                              wkb.encode_multilinestring(mls)],
                             type=pa.binary()),
        "id": pa.array([1, 2], type=pa.int64())})
    p2 = str(tmp_path / "lines.shp")
    shp.write_shapefile(lines, p2)
    back2, meta2 = shp.read_shapefile(p2)
    assert meta2["shp_type"] == shp.SHP_POLYLINE
    t0, v0 = wkb.decode(back2.column("geom_wkb")[0].as_py())
    assert t0 == "LineString" and np.array_equal(v0, line)
    t1, v1 = wkb.decode(back2.column("geom_wkb")[1].as_py())
    assert t1 == "MultiLineString"
    assert all(np.array_equal(a, b) for a, b in zip(v1, mls))


def test_shapefile_reads_handwritten_golden(tmp_path):
    """Parse a .shp built BYTE-BY-BYTE from the public spec (not via
    our writer): one point record. Catches writer/reader co-bugs."""
    content = struct.pack("<i", shp.SHP_POINT) + struct.pack("<dd", 7.0, -3.0)
    rec = struct.pack(">ii", 1, len(content) // 2) + content
    total_words = (100 + len(rec)) // 2
    hdr = struct.pack(">i", 9994) + b"\x00" * 20 + \
        struct.pack(">i", total_words) + struct.pack("<ii", 1000, 1) + \
        struct.pack("<8d", 7.0, -3.0, 7.0, -3.0, 0, 0, 0, 0)
    p = str(tmp_path / "golden.shp")
    with open(p, "wb") as f:
        f.write(hdr + rec)
    tbl, meta = shp.read_shapefile(p)
    assert tbl.num_rows == 1
    assert wkb.decode(tbl.column("geom_wkb")[0].as_py()) == \
        ("Point", (7.0, -3.0))


def test_get_input_dispatches_shp(ray_session, tmp_path):
    from spapy_ray.sources.dispatch import get_input

    tbl = pa.table({
        "geom_wkb": pa.array([wkb.encode_point(0.0, 0.0)],
                             type=pa.binary()),
        "id": pa.array([42], type=pa.int64())})
    p = str(tmp_path / "d.shp")
    shp.write_shapefile(tbl, p)
    ds = get_input(p)
    out = ds.to_pandas()
    assert len(out) == 1 and out["id"].iloc[0] == 42


def test_aaigrid_roundtrip(ray_session, tmp_path):
    """tile table → .asc → tile table: values, meta and nodata
    survive; ragged edge tiles (width/height not tile multiples)."""
    import ray.data as rd

    from spapy_ray.sources.aaigrid import read_aaigrid, write_aaigrid

    W, H, T = 70, 45, 32
    meta = RasterMeta(width=W, height=H, tile_size=T, x_min=10.0,
                      y_max=200.0, pixel_w=2.5, pixel_h=-2.5)
    gx, gy = np.meshgrid(np.arange(W), np.arange(H))
    full = ((gx * 7 + gy * 13) % 97).astype(np.int32)
    full[0, 0] = -9999                      # a nodata pixel
    rows = []
    for ty in range(-(-H // T)):
        for tx in range(-(-W // T)):
            tile = full[ty * T:(ty + 1) * T, tx * T:(tx + 1) * T]
            rows.append({"tx": tx, "ty": ty, "band": 0,
                         "h": tile.shape[0], "w": tile.shape[1],
                         "data": np.ascontiguousarray(tile).tobytes()})
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    p = str(tmp_path / "grid.asc")
    write_aaigrid(ds, meta, p, dtype="int32", nodata=-9999)

    with open(p) as f:
        head = [next(f).split() for _ in range(6)]
    assert head[0] == ["ncols", "70"] and head[1] == ["nrows", "45"]

    ds2, meta2, nodata2 = read_aaigrid(p, tile_size=T)
    assert nodata2 == -9999
    assert (meta2.width, meta2.height) == (W, H)
    assert meta2.x_min == pytest.approx(10.0)
    assert meta2.y_max == pytest.approx(200.0)
    assert meta2.pixel_w == pytest.approx(2.5)

    from spapy_ray.stages.raster import decode_tile

    got = np.zeros((H, W), dtype=np.int32)
    for r in ds2.to_pandas().itertuples():
        a = decode_tile(r.data, "int32", T, r.h, r.w)
        got[r.ty * T:r.ty * T + r.h, r.tx * T:r.tx * T + r.w] = a
    assert np.array_equal(got, full)


def test_shapefile_layer_flows_through_vector_stages(ray_session, tmp_path):
    """A GetInput-loaded .shp plugs straight into the engine's vector
    operators (geom_wkb convention): measure areas of the loaded
    layer and buffer-free bounds must match the source squares."""
    import ray.data as rd

    from spapy_ray.sources.dispatch import get_input
    from spapy_ray.stages.measures import measure_wkb_table

    tbl = pa.table({
        "geom_wkb": pa.array([wkb.encode_polygon([_square(0, 0, 10)]),
                              wkb.encode_polygon([_square(5, 5, 2)])],
                             type=pa.binary()),
        "zone_id": pa.array([0, 1], type=pa.int64())})
    p = str(tmp_path / "flow.shp")
    shp.write_shapefile(tbl, p)
    loaded = get_input(p)
    measured = measure_wkb_table(
        pa.Table.from_pandas(loaded.to_pandas(),
                             preserve_index=False)).to_pandas()
    m = measured.sort_values("zone_id").reset_index(drop=True)
    assert list(m["area"]) == [100.0, 4.0]
    assert list(m["maxx"]) == [10.0, 7.0]


def test_shapefile_streaming_dataset_matches_driver(ray_session, tmp_path):
    """read_shapefile_dataset (.shx-indexed, workers seek-and-parse
    their record ranges) returns the same rows as the driver-side
    reader, and its driver-side allocations stay near-flat while the
    layer grows 8x (VERDICT r3 #6)."""
    import gc
    import tracemalloc

    import numpy as np
    import pyarrow as pa

    from spapy_ray.kernels import wkb as K
    from spapy_ray.sources.shapefile import (read_shapefile,
                                             read_shapefile_dataset,
                                             write_shapefile)

    def make(n, name):
        rng = np.random.default_rng(5)
        xs = rng.uniform(-170, 170, n)
        ys = rng.uniform(-80, 80, n)
        tbl = pa.table({
            "geom_wkb": pa.array([K.encode_point(float(x), float(y))
                                  for x, y in zip(xs, ys)],
                                 type=pa.binary()),
            "fid": pa.array(np.arange(n, dtype=np.int64)),
            "w8": pa.array(rng.integers(0, 1000, n).astype(np.int64)),
        })
        p = str(tmp_path / f"{name}.shp")
        write_shapefile(tbl, p)
        return p

    p = make(20_000, "small")
    drv, meta_d = read_shapefile(p)
    ds, meta_s = read_shapefile_dataset(p, batch_rows=4096)
    got = ds.to_pandas().sort_values("fid").reset_index(drop=True)
    want = drv.to_pandas().sort_values("fid").reset_index(drop=True)
    assert meta_s["shp_type"] == meta_d["shp_type"]
    assert list(got.columns) == list(want.columns)
    assert got["fid"].equals(want["fid"])
    assert got["w8"].equals(want["w8"])
    assert (got["geom_wkb"] == want["geom_wkb"]).all()

    # driver memory: 8x the features must not show up as ~8x driver
    # allocations (the .shx index is the only per-feature driver state)
    big = make(160_000, "big")

    def peak(path, rows):
        gc.collect()
        tracemalloc.start()
        ds, _ = read_shapefile_dataset(path, batch_rows=4096)
        n = ds.count()
        _, pk = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        assert n == rows
        return pk

    peak(p, 20_000)                       # warmup
    p_small = min(peak(p, 20_000), peak(p, 20_000))
    p_big = min(peak(big, 160_000), peak(big, 160_000))
    assert p_big < 3.0 * p_small + 8_000_000
