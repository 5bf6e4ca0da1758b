import numpy as np
import pytest

from spapy_ray.kernels import wkb


def test_point_roundtrip():
    b = wkb.encode_point(1.5, -2.25)
    t, v = wkb.decode(b)
    assert t == "Point" and v == (1.5, -2.25)
    assert len(b) == 21


def test_linestring_roundtrip():
    line = np.array([[0.0, 0.0], [1.0, 2.0], [3.0, -4.0]])
    t, v = wkb.decode(wkb.encode_linestring(line))
    assert t == "LineString"
    assert np.array_equal(v, line)


def test_polygon_roundtrip_closes_ring():
    ring = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])
    hole = np.array([[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0]])
    t, v = wkb.decode(wkb.encode_polygon([ring, hole]))
    assert t == "Polygon" and len(v) == 2
    assert np.array_equal(v[0][0], v[0][-1])  # closed on encode
    assert np.array_equal(v[0][:-1], ring)
    assert np.array_equal(v[1][:-1], hole)


def test_multipolygon_roundtrip_and_promotion():
    r1 = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    r2 = r1 + 10.0
    b = wkb.encode_multipolygon([[r1], [r2]])
    t, v = wkb.decode(b)
    assert t == "MultiPolygon" and len(v) == 2
    mp = wkb.as_multipolygon(b)
    assert len(mp) == 2
    # single polygon promoted to 1-element multipolygon
    mp1 = wkb.as_multipolygon(wkb.encode_polygon([r1]))
    assert len(mp1) == 1 and len(mp1[0]) == 1


def test_multipoint_multilinestring():
    pts = np.array([[0.0, 1.0], [2.0, 3.0]])
    t, v = wkb.decode(wkb.encode_multipoint(pts))
    assert t == "MultiPoint" and np.array_equal(v, pts)
    lines = [np.array([[0.0, 0.0], [1.0, 1.0]]), np.array([[2.0, 2.0], [3.0, 3.0], [4.0, 2.0]])]
    t, v = wkb.decode(wkb.encode_multilinestring(lines))
    assert t == "MultiLineString" and len(v) == 2
    assert np.array_equal(v[1], lines[1])


def test_big_endian_decode():
    import struct
    # big-endian point
    b = struct.pack(">BIdd", 0, 1, 5.0, 6.0)
    t, v = wkb.decode(b)
    assert t == "Point" and v == (5.0, 6.0)


def test_generic_encode_dispatch():
    assert wkb.decode(wkb.encode("Point", (1.0, 2.0)))[0] == "Point"
    with pytest.raises(ValueError):
        wkb.encode("Frob", None)
