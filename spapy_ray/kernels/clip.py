"""Polygon clipping: Sutherland–Hodgman against a CONVEX clip polygon.

Covers the reference's dominant overlay usage — clipping a layer
against a bounding box (Clip, SpaVectors.py:1501-1523; the overlay
tests in SpaPyTests/Tests/SpaVectorTest.py:213-232 intersect against a
bounding rectangle). General concave×concave boolean ops are a
documented round-2 item (DIVERGENCES.md); the engine rejects a
non-convex clip geometry rather than silently producing wrong output.
"""

from __future__ import annotations

import numpy as np

from spapy_ray.kernels import geom


def is_convex(ring: np.ndarray) -> bool:
    r = geom._close_open(np.asarray(ring, dtype=np.float64))
    if len(r) < 3:
        return False
    nxt = np.roll(r, -1, axis=0)
    nxt2 = np.roll(r, -2, axis=0)
    cross = ((nxt[:, 0] - r[:, 0]) * (nxt2[:, 1] - nxt[:, 1])
             - (nxt[:, 1] - r[:, 1]) * (nxt2[:, 0] - nxt[:, 0]))
    return bool((cross >= 0).all() or (cross <= 0).all())


def clip_ring_convex(subject: np.ndarray, clip: np.ndarray) -> np.ndarray | None:
    """Sutherland–Hodgman: subject ring ∩ convex clip ring → ring or
    None when empty. Output may contain collinear/duplicate vertices
    (harmless for area/PIP)."""
    clip = geom._close_open(np.asarray(clip, dtype=np.float64))
    if geom.ring_signed_area(clip) < 0:
        clip = clip[::-1]  # need CCW for the inside test
    if not is_convex(clip):
        raise ValueError("clip polygon must be convex (round-2: general booleans)")
    out = geom._close_open(np.asarray(subject, dtype=np.float64))
    m = len(clip)
    for i in range(m):
        if len(out) == 0:
            return None
        a, b = clip[i], clip[(i + 1) % m]
        ex, ey = b[0] - a[0], b[1] - a[1]
        pts = out
        nxt = np.roll(pts, -1, axis=0)
        side_p = ex * (pts[:, 1] - a[1]) - ey * (pts[:, 0] - a[0])
        side_n = ex * (nxt[:, 1] - a[1]) - ey * (nxt[:, 0] - a[0])
        new_pts = []
        for j in range(len(pts)):
            cur_in = side_p[j] >= 0
            nxt_in = side_n[j] >= 0
            if cur_in:
                new_pts.append(pts[j])
            if cur_in != nxt_in:
                denom = side_p[j] - side_n[j]
                t = side_p[j] / denom if denom != 0 else 0.0
                new_pts.append(pts[j] + t * (nxt[j] - pts[j]))
        out = np.asarray(new_pts, dtype=np.float64).reshape(-1, 2)
    if len(out) < 3 or abs(geom.ring_signed_area(out)) == 0.0:
        return None
    return out


def clip_multipolygon_convex(mp, clip_ring: np.ndarray):
    """Clip every part (holes clipped too); returns a multipolygon or
    None when the intersection is empty."""
    out = []
    for poly in mp:
        ext = clip_ring_convex(poly[0], clip_ring)
        if ext is None:
            continue
        rings = [ext]
        for hole in poly[1:]:
            h = clip_ring_convex(hole, clip_ring)
            if h is not None:
                rings.append(h)
        out.append(rings)
    return out or None


def bbox_ring(minx: float, miny: float, maxx: float, maxy: float) -> np.ndarray:
    return np.array([[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy]],
                    dtype=np.float64)
