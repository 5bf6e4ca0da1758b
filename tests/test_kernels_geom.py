import numpy as np
import pytest

from spapy_ray.kernels import geom

SQUARE = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
# concave L-shape: unit square minus top-right quarter
LSHAPE = np.array([[0, 0], [10, 0], [10, 5], [5, 5], [5, 10], [0, 10]], dtype=float)


def test_pip_square():
    px = np.array([5.0, -1.0, 10.5, 9.99, 0.01])
    py = np.array([5.0, 5.0, 5.0, 9.99, 0.01])
    got = geom.pip_ring(px, py, SQUARE)
    assert list(got) == [True, False, False, True, True]


def test_pip_concave():
    px = np.array([2.0, 7.0, 7.0, 2.0])
    py = np.array([2.0, 2.0, 7.0, 7.0])
    got = geom.pip_ring(px, py, LSHAPE)
    assert list(got) == [True, True, False, True]


def test_pip_matches_winding_number_random():
    rng = np.random.default_rng(42)
    # random simple star-shaped polygon around origin
    ang = np.sort(rng.uniform(0, 2 * np.pi, 17))
    rad = rng.uniform(1.0, 5.0, 17)
    ring = np.column_stack([rad * np.cos(ang), rad * np.sin(ang)])
    px = rng.uniform(-6, 6, 5000)
    py = rng.uniform(-6, 6, 5000)
    assert (geom.pip_ring(px, py, ring) == geom.winding_number(px, py, ring)).all()


def test_pip_polygon_with_hole():
    hole = np.array([[4.0, 4.0], [6.0, 4.0], [6.0, 6.0], [4.0, 6.0]])
    poly = [SQUARE, hole]
    px = np.array([5.0, 2.0, 11.0])
    py = np.array([5.0, 2.0, 5.0])
    assert list(geom.pip_polygon(px, py, poly)) == [False, True, False]


def test_pip_multipolygon():
    sq2 = SQUARE + 100.0
    mp = [[SQUARE], [sq2]]
    px = np.array([5.0, 105.0, 50.0])
    py = np.array([5.0, 105.0, 50.0])
    assert list(geom.pip_multipolygon(px, py, mp)) == [True, True, False]


def test_area_length_centroid():
    assert geom.ring_signed_area(SQUARE) == pytest.approx(100.0)
    assert geom.ring_signed_area(SQUARE[::-1]) == pytest.approx(-100.0)
    assert geom.polygon_area([SQUARE]) == pytest.approx(100.0)
    hole = np.array([[4.0, 4.0], [6.0, 4.0], [6.0, 6.0], [4.0, 6.0]])
    assert geom.polygon_area([SQUARE, hole]) == pytest.approx(96.0)
    assert geom.ring_length(SQUARE) == pytest.approx(40.0)
    cx, cy, a = geom.ring_centroid(SQUARE)
    assert (cx, cy) == pytest.approx((5.0, 5.0))
    # L-shape centroid, known value: area 75, centroid (4.1666..., 4.1666...)
    cx, cy, a = geom.ring_centroid(LSHAPE)
    assert a == pytest.approx(75.0)
    assert (cx, cy) == pytest.approx((4 + 1 / 6, 4 + 1 / 6))


def test_multipolygon_centroid_weighted():
    sq_small = SQUARE / 10.0 + np.array([100.0, 0.0])  # area 1 at (100.5, 0.5)
    mp = [[SQUARE], [sq_small]]
    cx, cy = geom.multipolygon_centroid(mp)
    assert cx == pytest.approx((100 * 5 + 1 * 100.5) / 101)
    assert cy == pytest.approx((100 * 5 + 1 * 0.5) / 101)


def test_bbox():
    assert geom.ring_bbox(LSHAPE) == (0, 0, 10, 10)
    mp = [[SQUARE], [SQUARE + 50]]
    assert geom.multipolygon_bbox(mp) == (0, 0, 60, 60)


def test_convex_hull():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-1, 1, (500, 2))
    pts = np.vstack([pts, [[-2, -2], [2, -2], [2, 2], [-2, 2]]])
    hull = geom.convex_hull(pts)
    assert len(hull) == 4
    assert set(map(tuple, hull)) == {(-2, -2), (2, -2), (2, 2), (-2, 2)}
    # CCW orientation
    assert geom.ring_signed_area(hull) > 0
    # all input points inside or on hull
    assert geom.winding_number(pts[:, 0] * 0.999, pts[:, 1] * 0.999, hull).all()


def test_simplify_dp():
    # points on a line with one big bump
    x = np.arange(11, dtype=float)
    y = np.zeros(11)
    y[5] = 3.0
    out = geom.simplify_dp(np.column_stack([x, y]), tol=2.5)
    assert (out == np.array([[0, 0], [5, 3], [10, 0]])).all()
    out2 = geom.simplify_dp(np.column_stack([x, y]), tol=5.0)
    assert (out2 == np.array([[0, 0], [10, 0]])).all()


def test_densify():
    line = np.array([[0.0, 0.0], [10.0, 0.0]])
    out = geom.densify(line, 3.0)
    assert len(out) == 5  # 0, 2.5, 5, 7.5, 10
    d = np.diff(out[:, 0])
    assert np.all(d <= 3.0) and out[0, 0] == 0.0 and out[-1, 0] == 10.0
    # closed ring keeps vertex count multiple + original corners
    ring = geom.densify(SQUARE, 2.5, closed=True)
    assert len(ring) == 16
    assert geom.ring_signed_area(ring) == pytest.approx(100.0)


def test_buffer_point():
    ring = geom.buffer_point(2.0, 3.0, 1.5, segments=16)
    assert len(ring) == 64
    d = np.hypot(ring[:, 0] - 2.0, ring[:, 1] - 3.0)
    assert np.allclose(d, 1.5)
    # area approximates circle area from below
    a = geom.ring_signed_area(ring)
    assert 0.99 * np.pi * 1.5**2 < a < np.pi * 1.5**2


def test_haversine():
    # equator degree ~111.19 km
    d = geom.haversine_m(0.0, 0.0, 1.0, 0.0)
    assert d == pytest.approx(111195, rel=1e-3)
    assert geom.haversine_m(10, 20, 10, 20) == 0.0
    # symmetric
    assert geom.haversine_m(1, 2, 3, 4) == pytest.approx(geom.haversine_m(3, 4, 1, 2))


def test_sql_haversine_matches(tmp_path):
    import duckdb
    import pandas as pd

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "lon1": rng.uniform(-180, 180, 200), "lat1": rng.uniform(-85, 85, 200),
        "lon2": rng.uniform(-180, 180, 200), "lat2": rng.uniform(-85, 85, 200),
    })
    expected = geom.haversine_m(df.lon1, df.lat1, df.lon2, df.lat2)
    con = duckdb.connect()
    con.register("t", df)
    got = con.execute(
        f"SELECT {geom.sql_haversine('lon1','lat1','lon2','lat2')} AS d FROM t"
    ).fetchnumpy()["d"]
    assert np.allclose(got, expected, rtol=1e-12, atol=1e-6)
