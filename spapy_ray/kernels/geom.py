"""Hand-rolled vectorized geometry kernels (numpy only).

Replaces the shapely/GEOS calls of the reference (buffer/simplify/hull/
centroid at SpaVectors.py:790-894, predicates at SpaVectors.py:1109-1146)
with numpy formulations. A geometry here is:

- point:        (x, y) floats
- ring:         float64 array [m, 2], closed or open (kernels treat the
                last->first edge implicitly; a duplicated closing vertex
                is tolerated and ignored)
- polygon:      list of rings — ring[0] exterior, ring[1:] holes
- multipolygon: list of polygons

Conventions match the reference semantics: a point exactly on a
boundary is implementation-defined (same as GEOS ray-cast intersects);
fixtures are constructed so no test point lies on an edge (FIXTURES.md).
"""

from __future__ import annotations

import numpy as np

Ring = np.ndarray           # [m, 2]
Polygon = list              # list[Ring]
MultiPolygon = list         # list[Polygon]

EARTH_RADIUS_M = 6371008.8


def _close_open(ring: Ring) -> Ring:
    """Drop an explicit closing vertex if present."""
    r = np.asarray(ring, dtype=np.float64)
    if len(r) > 1 and r[0, 0] == r[-1, 0] and r[0, 1] == r[-1, 1]:
        r = r[:-1]
    return r


# ---------------------------------------------------------------- PIP

def pip_ring(px: np.ndarray, py: np.ndarray, ring: Ring) -> np.ndarray:
    """Ray-casting point-in-ring test, vectorized over points.

    Crossing-number algorithm (the classic even-odd rule the north rule
    names): cast a ray in +x and count edge crossings. O(points × edges)
    but fully vectorized; callers prune candidates with bbox/STRtree
    first so rings stay small per call.
    """
    r = _close_open(ring)
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    x1, y1 = r[:, 0], r[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    inside = np.zeros(px.shape, dtype=bool)
    # Loop over edges (few), vectorized over points (many).
    for i in range(len(r)):
        xi, yi, xj, yj = x1[i], y1[i], x2[i], y2[i]
        cond = (yi > py) != (yj > py)
        if not cond.any():
            continue
        xcross = (xj - xi) * (py - yi) / (yj - yi) + xi
        inside ^= cond & (px < xcross)
    return inside


def winding_number(px: np.ndarray, py: np.ndarray, ring: Ring) -> np.ndarray:
    """Winding-number point-in-ring (nonzero rule) — cross-check oracle
    for :func:`pip_ring` on simple rings (property tests, SURVEY.md §5)."""
    r = _close_open(ring)
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    wn = np.zeros(px.shape, dtype=np.int64)
    x1, y1 = r[:, 0], r[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    for i in range(len(r)):
        xi, yi, xj, yj = x1[i], y1[i], x2[i], y2[i]
        is_left = (xj - xi) * (py - yi) - (px - xi) * (yj - yi)
        up = (yi <= py) & (yj > py) & (is_left > 0)
        dn = (yi > py) & (yj <= py) & (is_left < 0)
        wn += up.astype(np.int64) - dn.astype(np.int64)
    return wn != 0


def pip_polygon(px: np.ndarray, py: np.ndarray, poly: Polygon) -> np.ndarray:
    """Inside exterior ring and in no hole."""
    inside = pip_ring(px, py, poly[0])
    for hole in poly[1:]:
        inside &= ~pip_ring(px, py, hole)
    return inside


def pip_multipolygon(px: np.ndarray, py: np.ndarray, mp: MultiPolygon) -> np.ndarray:
    inside = np.zeros(np.asarray(px).shape, dtype=bool)
    for poly in mp:
        inside |= pip_polygon(px, py, poly)
    return inside


# ------------------------------------------------------- measures

def ring_signed_area(ring: Ring) -> float:
    """Shoelace signed area (CCW positive)."""
    r = _close_open(ring)
    x, y = r[:, 0], r[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def polygon_area(poly: Polygon) -> float:
    """|exterior| - sum(|holes|), matching shapely .area semantics
    (SpaVectors.py:690-700 GetFeatureArea)."""
    a = abs(ring_signed_area(poly[0]))
    for hole in poly[1:]:
        a -= abs(ring_signed_area(hole))
    return a


def multipolygon_area(mp: MultiPolygon) -> float:
    return float(sum(polygon_area(p) for p in mp))


def ring_length(ring: Ring, closed: bool = True) -> float:
    r = _close_open(ring) if closed else np.asarray(ring, dtype=np.float64)
    d = np.diff(np.vstack([r, r[:1]]) if closed else r, axis=0)
    return float(np.sum(np.hypot(d[:, 0], d[:, 1])))


def ring_centroid(ring: Ring) -> tuple[float, float, float]:
    """(cx, cy, signed_area) of one ring — area-weighted polygon
    centroid formula (replaces shapely .centroid, SpaVectors.py:871-894)."""
    r = _close_open(ring)
    x, y = r[:, 0], r[:, 1]
    xn, yn = np.roll(x, -1), np.roll(y, -1)
    cross = x * yn - xn * y
    a = 0.5 * float(np.sum(cross))
    if a == 0.0:
        return float(x.mean()), float(y.mean()), 0.0
    cx = float(np.sum((x + xn) * cross)) / (6.0 * a)
    cy = float(np.sum((y + yn) * cross)) / (6.0 * a)
    return cx, cy, a


def multipolygon_centroid(mp: MultiPolygon) -> tuple[float, float]:
    num_x = num_y = den = 0.0
    for poly in mp:
        for i, ring in enumerate(poly):
            cx, cy, a = ring_centroid(ring)
            w = abs(a) if i == 0 else -abs(a)
            num_x += cx * w
            num_y += cy * w
            den += w
    if den == 0.0:
        pts = np.vstack([_close_open(r) for p in mp for r in p])
        return float(pts[:, 0].mean()), float(pts[:, 1].mean())
    return num_x / den, num_y / den


def ring_bbox(ring: Ring) -> tuple[float, float, float, float]:
    r = np.asarray(ring, dtype=np.float64)
    return (float(r[:, 0].min()), float(r[:, 1].min()),
            float(r[:, 0].max()), float(r[:, 1].max()))


def multipolygon_bbox(mp: MultiPolygon) -> tuple[float, float, float, float]:
    boxes = np.array([ring_bbox(p[0]) for p in mp])
    return (float(boxes[:, 0].min()), float(boxes[:, 1].min()),
            float(boxes[:, 2].max()), float(boxes[:, 3].max()))


# ------------------------------------------------------- transforms

def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain; returns hull vertices CCW, open ring.

    Replaces shapely convex_hull (SpaVectors.py:848-869).
    """
    pts = np.unique(np.asarray(points, dtype=np.float64), axis=0)
    if len(pts) <= 2:
        return pts
    # np.unique sorts lexicographically by (x, y) already.
    def half(iterable):
        out = []
        for p in iterable:
            while len(out) >= 2:
                o, a = out[-2], out[-1]
                if (a[0] - o[0]) * (p[1] - o[1]) - (a[1] - o[1]) * (p[0] - o[0]) <= 0:
                    out.pop()
                else:
                    break
            out.append(p)
        return out
    lower = half(pts)
    upper = half(pts[::-1])
    return np.asarray(lower[:-1] + upper[:-1], dtype=np.float64)


def simplify_dp(coords: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker polyline simplification (iterative, stack-based).

    Replaces shapely .simplify (SpaVectors.py:820-846). Keeps first and
    last vertices; tolerance is max perpendicular deviation.
    """
    pts = np.asarray(coords, dtype=np.float64)
    n = len(pts)
    if n <= 2:
        return pts.copy()
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i0, i1 = stack.pop()
        if i1 <= i0 + 1:
            continue
        seg = pts[i1] - pts[i0]
        sub = pts[i0 + 1:i1] - pts[i0]
        seg_len = np.hypot(seg[0], seg[1])
        if seg_len == 0.0:
            d = np.hypot(sub[:, 0], sub[:, 1])
        else:
            d = np.abs(seg[0] * sub[:, 1] - seg[1] * sub[:, 0]) / seg_len
        imax = int(np.argmax(d))
        if d[imax] > tol:
            j = i0 + 1 + imax
            keep[j] = True
            stack.append((i0, j))
            stack.append((j, i1))
    return pts[keep]


def densify(coords: np.ndarray, max_dist: float, closed: bool = False) -> np.ndarray:
    """Insert vertices so no segment exceeds max_dist (SpaDensify.py:41-101).

    Vectorized: per-segment subdivision counts, then one interpolation
    pass. Original vertices are always preserved.
    """
    pts = np.asarray(coords, dtype=np.float64)
    if closed:
        pts = np.vstack([_close_open(pts), _close_open(pts)[:1]])
    if len(pts) < 2:
        return pts.copy()
    seg = np.diff(pts, axis=0)
    lengths = np.hypot(seg[:, 0], seg[:, 1])
    nsub = np.maximum(1, np.ceil(lengths / float(max_dist)).astype(np.int64))
    out = []
    for i in range(len(seg)):
        t = np.arange(nsub[i], dtype=np.float64) / nsub[i]
        out.append(pts[i] + t[:, None] * seg[i])
    out.append(pts[-1:])
    res = np.vstack(out)
    if closed:
        res = res[:-1]
    return res


def buffer_point(x: float, y: float, dist: float, segments: int = 16) -> np.ndarray:
    """Disc polygon around a point — the point path of shapely buffer
    (SpaVectors.py:790-818). Returns an open CCW ring with
    4*segments vertices (matches GEOS's default resolution=16 sense:
    quarter-circle segment count)."""
    n = 4 * int(segments)
    ang = np.arange(n, dtype=np.float64) * (2.0 * np.pi / n)
    return np.column_stack([x + dist * np.cos(ang), y + dist * np.sin(ang)])


# ------------------------------------------------------- distance

def haversine_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Great-circle distance in meters, vectorized (broadcasting)."""
    lon1, lat1, lon2, lat2 = (np.radians(np.asarray(a, dtype=np.float64))
                              for a in (lon1, lat1, lon2, lat2))
    dlon = lon2 - lon1
    dlat = lat2 - lat1
    h = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(h, 0.0, 1.0)))


def sql_haversine(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    """DuckDB SQL mirroring haversine_m exactly (same formula + radius)."""
    return (
        f"(2.0 * {EARTH_RADIUS_M} * asin(sqrt(least(greatest("
        f"pow(sin((radians({lat2}) - radians({lat1})) / 2.0), 2) + "
        f"cos(radians({lat1})) * cos(radians({lat2})) * "
        f"pow(sin((radians({lon2}) - radians({lon1})) / 2.0), 2)"
        f", 0.0), 1.0))))"
    )
