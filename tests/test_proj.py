import numpy as np
import pytest

from spapy_ray.kernels import proj


def test_mercator_roundtrip_and_anchor():
    rng = np.random.default_rng(2)
    lon = rng.uniform(-179, 179, 1000)
    lat = rng.uniform(-84, 84, 1000)
    x, y = proj.mercator_forward(lon, lat)
    lon2, lat2 = proj.mercator_inverse(x, y)
    assert np.allclose(lon, lon2, atol=1e-9)
    assert np.allclose(lat, lat2, atol=1e-9)
    # known anchor: (0,0) -> (0,0)
    assert proj.mercator_forward(0.0, 0.0) == (0.0, 0.0)
    # 1 deg lon at equator = 111319.49 m (spherical)
    x, _ = proj.mercator_forward(1.0, 0.0)
    assert x == pytest.approx(111319.4908, abs=1e-3)


def test_equirect_roundtrip():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    x, y = proj.equirect_forward(lon, lat, lat_ts=30.0)
    lon2, lat2 = proj.equirect_inverse(x, y, lat_ts=30.0)
    assert np.allclose(lon, lon2, atol=1e-9)
    assert np.allclose(lat, lat2, atol=1e-9)


def _redfearn(lon_deg, lat_deg, zone):
    """Independent classic Redfearn/Snyder TM series — the test oracle
    for the Krüger-series implementation (public formulas, Snyder
    'Map Projections: A Working Manual' eq. 8-9..8-13)."""
    a = 6378137.0
    f = 1 / 298.257223563
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    k0 = 0.9996
    lat = np.radians(lat_deg)
    lon = np.radians(lon_deg)
    lon0 = np.radians(-183.0 + 6 * zone)
    N = a / np.sqrt(1 - e2 * np.sin(lat) ** 2)
    T = np.tan(lat) ** 2
    C = ep2 * np.cos(lat) ** 2
    A = (lon - lon0) * np.cos(lat)
    M = a * ((1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256) * lat
             - (3 * e2 / 8 + 3 * e2**2 / 32 + 45 * e2**3 / 1024) * np.sin(2 * lat)
             + (15 * e2**2 / 256 + 45 * e2**3 / 1024) * np.sin(4 * lat)
             - (35 * e2**3 / 3072) * np.sin(6 * lat))
    E = k0 * N * (A + (1 - T + C) * A**3 / 6
                  + (5 - 18 * T + T**2 + 72 * C - 58 * ep2) * A**5 / 120) + 500000
    Nn = k0 * (M + N * np.tan(lat) * (A**2 / 2 + (5 - T + 9 * C + 4 * C**2) * A**4 / 24
               + (61 - 58 * T + T**2 + 600 * C - 330 * ep2) * A**6 / 720))
    return E, Nn


def test_utm_matches_independent_series():
    rng = np.random.default_rng(6)
    lon = rng.uniform(6.05, 11.95, 500)  # zone 32
    lat = rng.uniform(-80, 84, 500)
    e, n = proj.utm_forward(lon, lat, zone=32)
    er, nr = _redfearn(lon, lat, 32)
    nr = np.where(lat < 0, nr + 10000000.0, nr)
    assert np.allclose(e, er, atol=5e-3)
    assert np.allclose(n, nr, atol=5e-3)


def test_utm_central_meridian_properties():
    # on the central meridian: easting exactly 500000, scale k0
    e, n = proj.utm_forward(9.0, 48.0, zone=32)
    assert float(e) == pytest.approx(500000.0, abs=1e-6)
    # northing of equator is 0 (north) / 10^7 (south false northing)
    e0, n0 = proj.utm_forward(9.0, 0.0, zone=32)
    assert float(n0) == pytest.approx(0.0, abs=1e-6)
    e1, n1 = proj.utm_forward(9.0, -0.0001, zone=32)
    assert float(n1) == pytest.approx(10000000.0, abs=20.0)


def test_utm_roundtrip():
    rng = np.random.default_rng(4)
    # points within zone 33 (12E-18E)
    lon = rng.uniform(12.1, 17.9, 2000)
    lat = rng.uniform(-79.9, 83.9, 2000)
    e, n = proj.utm_forward(lon, lat, zone=33)
    south = lat < 0
    # split round-trip by hemisphere (false northing)
    lon_n, lat_n = proj.utm_inverse(e[~south], n[~south], zone=33, south=False)
    lon_s, lat_s = proj.utm_inverse(e[south], n[south], zone=33, south=True)
    assert np.allclose(lon_n, lon[~south], atol=1e-8)
    assert np.allclose(lat_n, lat[~south], atol=1e-8)
    assert np.allclose(lon_s, lon[south], atol=1e-8)
    assert np.allclose(lat_s, lat[south], atol=1e-8)


def test_dispatch():
    x, y = proj.forward("utm:33", 15.0, 50.0)
    lon, lat = proj.inverse("utm:33", x, y)
    assert float(lon) == pytest.approx(15.0, abs=1e-6)
    assert float(lat) == pytest.approx(50.0, abs=1e-6)  # inverse series ~cm accuracy
