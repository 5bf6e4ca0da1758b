"""Deterministic zone (polygon) layer — the broadcast small side of the
spatial join (FIXTURES.md F2; stands in for the reference's Natural
Earth country layer, SpaPyTests/Tests/SpaVectorTest.py:34).

Z zones on a jittered 20x10 grid over [-180,180]x[-85,85]. All bounds
are integers in 1e-4-degree fixed point, derived from zone_id with
multiplicative mixing — so the layer has an exact DuckDB SQL twin
(:func:`sql_zones_cte`) used by the correctness oracle. Shapes by
``zone_id % 4``:

    0, 1 → axis-aligned rectangle
    2    → concave L-shaped hexagonal ring (union of two rectangles)
    3    → MultiPolygon of two disjoint rectangles

Every 7th zone (z % 7 == 3) is widened by 15 deg so it overlaps its
east neighbor — points there land in 2+ zones (multi-hit join rows,
mirroring overlapping-polygon semantics of the reference overlay
tests). The engine consumes only (zone_id, attrs, geom_wkb); the
generator's parameters never leak into the join path, so STRtree +
ray-cast PIP is exercised for real, while SQL reconstructs membership
from the arithmetic definition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from spapy_ray.kernels import wkb

U = 10000  # fixed-point units per degree

MIX_A = 2654435761
MIX_W = 2246822519
MIX_H = 3266489917
M32 = 1 << 32


def zone_params(z: int) -> dict:
    """Integer zone parameters (1e-4 deg units) — the single source of
    truth shared by the WKB builder and the SQL oracle."""
    col, row = z % 20, (z // 20) % 10
    lon0 = -180 * U + col * 18 * U
    lat0 = -85 * U + row * 17 * U
    g = (z * MIX_A) % M32
    x0 = lon0 + (g % 30000)
    y0 = lat0 + ((g // 30000) % 30000)
    w = 6 * U + ((z * MIX_W) % M32) % 90000
    h = 5 * U + ((z * MIX_H) % M32) % 70000
    if z % 7 == 3:
        w += 15 * U  # spill east → overlapping zones
    w2 = w * 6 // 10
    h2 = h * 6 // 10
    return {"zone_id": z, "x0": x0, "y0": y0, "w": w, "h": h,
            "w2": w2, "h2": h2, "shape": z % 4}


def _rect(x0: int, y0: int, x1: int, y1: int) -> np.ndarray:
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=np.float64) / U


def zone_geometry(p: dict) -> bytes:
    """Zone params → WKB (Polygon or MultiPolygon)."""
    x0, y0, w, h, w2, h2 = p["x0"], p["y0"], p["w"], p["h"], p["w2"], p["h2"]
    if p["shape"] in (0, 1):
        return wkb.encode_polygon([_rect(x0, y0, x0 + w, y0 + h)])
    if p["shape"] == 2:
        # L-shape: full-width bottom rect + left-part top rect, one concave ring
        ring = np.array([
            [x0, y0], [x0 + w, y0], [x0 + w, y0 + h2],
            [x0 + w2, y0 + h2], [x0 + w2, y0 + h], [x0, y0 + h],
        ], dtype=np.float64) / U
        return wkb.encode_polygon([ring])
    # shape 3: two disjoint rectangles
    r1 = _rect(x0, y0, x0 + w2, y0 + h2)
    r2 = _rect(x0 + w2 + 5000, y0 + h2 + 5000, x0 + w, y0 + h)
    return wkb.encode_multipolygon([[r1], [r2]])


def zones_table(num_zones: int = 200) -> pa.Table:
    """The zone layer as one small Arrow table (driver-side; broadcast
    into join actors via ray.put)."""
    params = [zone_params(z) for z in range(num_zones)]
    return pa.table({
        "zone_id": pa.array([p["zone_id"] for p in params], type=pa.int64()),
        "name": pa.array([f"zone{p['zone_id']}" for p in params]),
        "labelrank": pa.array([p["zone_id"] % 9 + 1 for p in params], type=pa.int64()),
        "area_class": pa.array([(p["w"] / U) * (p["h"] / U) for p in params],
                               type=pa.float64()),
        "geom_wkb": pa.array([zone_geometry(p) for p in params], type=pa.binary()),
    })


def sql_zones_cte(num_zones: int = 200) -> str:
    """DuckDB CTE with the zone parameters (integer fixed point)."""
    return (
        "SELECT z AS zone_id, 'zone' || z::VARCHAR AS name, z % 9 + 1 AS labelrank, "
        f"(w::DOUBLE / {U}) * (h::DOUBLE / {U}) AS area_class, "
        "x0, y0, w, h, (w * 6 // 10) AS w2, (h * 6 // 10) AS h2, z % 4 AS shape "
        "FROM (SELECT z, "
        f"(-180 * {U} + (z % 20) * 18 * {U}) + ((z * {MIX_A}) % {M32}) % 30000 AS x0, "
        f"(-85 * {U} + ((z // 20) % 10) * 17 * {U}) + (((z * {MIX_A}) % {M32}) // 30000) % 30000 AS y0, "
        f"6 * {U} + ((z * {MIX_W}) % {M32}) % 90000 + (CASE WHEN z % 7 = 3 THEN 15 * {U} ELSE 0 END) AS w, "
        f"5 * {U} + ((z * {MIX_H}) % {M32}) % 70000 AS h "
        f"FROM range({num_zones}) t(z))"
    )


def sql_pip_condition(lon: str, lat: str) -> str:
    """SQL membership test of point (lon, lat) in a zones-CTE row —
    the oracle twin of the engine's ray-cast PIP. All bounds are
    integer/1e4 doubles; fixture points never lie on bounds."""
    def box(xa, ya, xb, yb):
        return (f"({lon} > ({xa})::DOUBLE / {U} AND {lon} < ({xb})::DOUBLE / {U} AND "
                f"{lat} > ({ya})::DOUBLE / {U} AND {lat} < ({yb})::DOUBLE / {U})")

    rect = box("x0", "y0", "x0 + w", "y0 + h")
    lshape = (f"({box('x0', 'y0', 'x0 + w', 'y0 + h2')} OR "
              f"{box('x0', 'y0 + h2', 'x0 + w2', 'y0 + h')})")
    two = (f"({box('x0', 'y0', 'x0 + w2', 'y0 + h2')} OR "
           f"{box('x0 + w2 + 5000', 'y0 + h2 + 5000', 'x0 + w', 'y0 + h')})")
    return (f"(CASE WHEN shape IN (0, 1) THEN {rect} "
            f"WHEN shape = 2 THEN {lshape} ELSE {two} END)")
