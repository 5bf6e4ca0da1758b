"""Native GeoJSON I/O: exact WKB round-trips for every RFC geometry
type, dispatch/Save wiring, and a loaded layer flowing through a
vector stage."""

import json

import numpy as np
import pyarrow as pa

from spapy_ray.kernels import wkb
from spapy_ray.sources.geojson import read_geojson, write_geojson


def _sample_table() -> pa.Table:
    sq = np.array([[0., 0.], [4., 0.], [4., 4.], [0., 4.], [0., 0.]])
    hole = np.array([[1., 1.], [1., 2.], [2., 2.], [2., 1.], [1., 1.]])
    geoms = [
        wkb.encode("Point", (1.5, -2.25)),
        wkb.encode("LineString", np.array([[0., 0.], [1., 1.], [2., 0.5]])),
        wkb.encode("Polygon", [sq, hole]),
        wkb.encode("MultiPoint", np.array([[0.1, 0.2], [3.3, 4.4]])),
        wkb.encode("MultiLineString", [np.array([[0., 0.], [1., 0.]]),
                                       np.array([[5., 5.], [6., 7.]])]),
        wkb.encode("MultiPolygon", [[sq], [sq + 10.0]]),
    ]
    return pa.table({
        "geom_wkb": pa.array(geoms, type=pa.binary()),
        "name": [f"f{i}" for i in range(6)],
        "rank": pa.array([3, 1, 4, 1, 5, 9], type=pa.int64()),
        "score": [0.5, 1.25, -3.75, 2.0, 0.1, 11.0],
    })


def test_geojson_roundtrip_exact(tmp_path):
    t = _sample_table()
    p = str(tmp_path / "layer.geojson")
    write_geojson(t, p, crs={"type": "name",
                             "properties": {"name": "EPSG:4326"}})
    back, meta = read_geojson(p)
    assert meta["crs"]["properties"]["name"] == "EPSG:4326"
    assert back.column("geom_wkb").to_pylist() == t.column("geom_wkb").to_pylist()
    for c in ("name", "rank", "score"):
        assert back.column(c).to_pylist() == t.column(c).to_pylist()
    # the file itself is valid RFC 7946
    doc = json.load(open(p))
    assert doc["type"] == "FeatureCollection"
    assert [f["geometry"]["type"] for f in doc["features"]] == [
        "Point", "LineString", "Polygon", "MultiPoint",
        "MultiLineString", "MultiPolygon"]


def test_geojson_single_feature_and_bare_geometry(tmp_path):
    p = str(tmp_path / "one.geojson")
    with open(p, "w") as f:
        json.dump({"type": "Feature",
                   "geometry": {"type": "Point", "coordinates": [2.0, 3.0]},
                   "properties": {"a": 7}}, f)
    t, _ = read_geojson(p)
    assert t.num_rows == 1 and t.column("a").to_pylist() == [7]
    assert wkb.decode(t.column("geom_wkb")[0].as_py()) == ("Point", (2.0, 3.0))

    with open(p, "w") as f:
        json.dump({"type": "LineString",
                   "coordinates": [[0, 0], [1, 2]]}, f)
    t, _ = read_geojson(p)
    assert wkb.decode(t.column("geom_wkb")[0].as_py())[0] == "LineString"


def test_geojson_dispatch_and_save(ray_session, tmp_path):
    import ray.data as rd

    from spapy_ray.api import Save
    from spapy_ray.sources.dispatch import get_input

    t = _sample_table()
    p = str(tmp_path / "zones.geojson")
    Save(rd.from_arrow(t), p)
    ds = get_input(p)
    got = ds.to_pandas()
    assert list(got["geom_wkb"]) == t.column("geom_wkb").to_pylist()
    assert list(got["rank"]) == t.column("rank").to_pylist()


def test_geojson_layer_flows_through_vector_stages(tmp_path):
    from spapy_ray.sources.zones import zones_table
    from spapy_ray.stages.measures import measure_wkb_table

    zones = zones_table()
    p = str(tmp_path / "zones.geojson")
    write_geojson(zones, p)
    back, _ = read_geojson(p)
    assert back.column("geom_wkb").to_pylist() == \
        zones.column("geom_wkb").to_pylist()
    m_direct = measure_wkb_table(zones).to_pandas()
    m_loaded = measure_wkb_table(
        back.select(zones.column_names)).to_pandas()
    assert m_direct.equals(m_loaded)
