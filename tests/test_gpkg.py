"""Native OGC GeoPackage container (sources/gpkg.py)."""

import sqlite3
import struct

import numpy as np
import pyarrow as pa
import pytest


def test_gpkg_roundtrip_bit_exact(tmp_path):
    from spapy_ray.sources.gpkg import read_gpkg, write_gpkg
    from spapy_ray.sources.zones import zones_table

    t = zones_table()
    p = str(tmp_path / "z.gpkg")
    write_gpkg(t, p)
    back = read_gpkg(p)
    assert back.column("geom_wkb").to_pylist() == \
        t.column("geom_wkb").to_pylist()
    for c in ("zone_id", "name", "labelrank", "area_class"):
        assert back.column(c).to_pylist() == t.column(c).to_pylist()


def test_gpkg_container_is_valid_sqlite_with_spec_tables(tmp_path):
    from spapy_ray.sources.gpkg import write_gpkg
    from spapy_ray.sources.zones import zones_table

    p = str(tmp_path / "z.gpkg")
    write_gpkg(zones_table(), p)
    con = sqlite3.connect(p)
    assert con.execute("PRAGMA application_id").fetchone()[0] == \
        0x47504B47
    (tn, dt, srs) = con.execute(
        "SELECT table_name, data_type, srs_id FROM gpkg_contents"
    ).fetchone()
    assert (tn, dt, srs) == ("zones", "features", -1)
    assert con.execute(
        "SELECT geometry_type_name FROM gpkg_geometry_columns"
    ).fetchone()[0] == "MULTIPOLYGON"
    # geometry blobs carry the spec header: GP magic, version 0,
    # little-endian flags with XY envelope indicator
    blob = con.execute("SELECT geom FROM zones LIMIT 1").fetchone()[0]
    assert blob[:2] == b"GP" and blob[2] == 0
    assert (blob[3] >> 1) & 0b111 == 1 and blob[3] & 1 == 1
    # envelope really is the geometry's bbox
    minx, maxx, miny, maxy = struct.unpack_from("<dddd", blob, 8)
    assert minx <= maxx and miny <= maxy


def test_gpkg_decode_handbuilt_blob():
    """A spec-assembled blob (not our encoder) decodes to its WKB."""
    from spapy_ray.kernels import wkb as wkbmod
    from spapy_ray.sources.gpkg import _gpb_decode

    ring = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 3.0], [0.0, 0.0]])
    w = wkbmod.encode_multipolygon([[ring]])
    # envelope indicator 0 (no envelope): header is just 8 bytes
    blob = b"GP" + bytes([0, 0b0000_0001]) + struct.pack("<i", 0) + w
    assert _gpb_decode(blob) == w


def test_gpkg_fails_loud(tmp_path):
    from spapy_ray.sources.gpkg import _gpb_decode, read_gpkg

    p = str(tmp_path / "fake.gpkg")
    con = sqlite3.connect(p)
    con.execute("CREATE TABLE x (a int)")
    con.commit()
    con.close()
    with pytest.raises(ValueError, match="application_id"):
        read_gpkg(p)
    with pytest.raises(ValueError, match="magic"):
        _gpb_decode(b"XXnot a blob")


def test_gpkg_get_input_routes(ray_session, tmp_path):
    from spapy_ray.sources.dispatch import get_input
    from spapy_ray.sources.gpkg import write_gpkg
    from spapy_ray.sources.zones import zones_table

    p = str(tmp_path / "z.gpkg")
    write_gpkg(zones_table(), p)
    ds = get_input(p)
    assert ds.count() == 200
    assert "geom_wkb" in ds.schema().names


def test_gpkg_tiles_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from spapy_ray.kernels.png import decode_png, encode_png
    from spapy_ray.sources.gpkg import read_gpkg_tiles, \
        write_gpkg_tiles
    from spapy_ray.sources.rasters import RasterMeta

    rng = np.random.default_rng(12)
    tiles = []
    imgs = {}
    for ty in range(2):
        for tx in range(3):
            img = rng.integers(0, 256, size=(16, 16, 3)) \
                .astype(np.uint8)
            imgs[(tx, ty)] = img
            tiles.append({"tx": tx, "ty": ty,
                          "png": encode_png(img)})
    meta = RasterMeta(width=48, height=32, tile_size=16, x_min=0.0,
                      y_max=32.0, pixel_w=1.0, pixel_h=-1.0)
    p = str(tmp_path / "t.gpkg")
    write_gpkg_tiles(rd.from_arrow(pa.Table.from_pylist(tiles)),
                     meta, p)
    con = sqlite3.connect(p)
    assert con.execute(
        "SELECT data_type FROM gpkg_contents").fetchone()[0] == \
        "tiles"
    mw, mh, tw = con.execute(
        "SELECT matrix_width, matrix_height, tile_width "
        "FROM gpkg_tile_matrix").fetchone()
    assert (mw, mh, tw) == (3, 2, 16)
    con.close()
    back = read_gpkg_tiles(p)
    assert len(back) == 6
    for i in range(len(back)):
        tx = back.column("tile_column")[i].as_py()
        ty = back.column("tile_row")[i].as_py()
        a = decode_png(back.column("tile_data")[i].as_py())
        assert (a == imgs[(tx, ty)]).all()


def test_gpkg_tiles_fails_loud(tmp_path):
    from spapy_ray.sources.gpkg import read_gpkg_tiles, write_gpkg
    from spapy_ray.sources.zones import zones_table

    # a features-only gpkg has no tiles layer
    p = str(tmp_path / "z.gpkg")
    write_gpkg(zones_table(), p)
    with pytest.raises(ValueError, match="no tiles"):
        read_gpkg_tiles(p)


def test_geoparquet_roundtrip_and_metadata(tmp_path):
    import json

    import pyarrow.parquet as pq

    from spapy_ray.sources.gpkg import read_geoparquet, \
        write_geoparquet
    from spapy_ray.sources.zones import zones_table

    t = zones_table()
    p = str(tmp_path / "z.parquet")
    write_geoparquet(t, p)
    # a generic parquet reader sees the spec's file metadata
    md = pq.read_schema(p).metadata
    geo = json.loads(md[b"geo"])
    assert geo["primary_column"] == "geom_wkb"
    assert geo["columns"]["geom_wkb"]["encoding"] == "WKB"
    bbox = geo["columns"]["geom_wkb"]["bbox"]
    assert bbox[0] <= bbox[2] and bbox[1] <= bbox[3]
    back, _ = read_geoparquet(p)
    assert back.column("geom_wkb").to_pylist() == \
        t.column("geom_wkb").to_pylist()
    # plain parquet without geo metadata fails loud
    pq.write_table(t, p)
    with pytest.raises(ValueError, match="geo"):
        read_geoparquet(p)
