"""Topological predicates between (multi)polygons — the reference's
Relate surface (RelateGeometryWithGeometry, SpaVectors.py:1109-1146:
touches / intersects / disjoint / overlaps / crosses / contains),
hand-rolled: orientation-test segment intersection + ray-cast PIP.

Semantics match GEOS on the reference's own test fixtures
(SpaPyTests/Tests/SpaTopologyTest.py:56-108 — axis-aligned squares
that overlap / share an edge / are disjoint); general curved edge
cases follow the same definitions:

    intersects: boundaries or interiors share any point
    disjoint:   not intersects
    touches:    boundaries intersect, interiors do not
    overlaps:   interiors intersect, neither contains the other,
                same dimension
    contains:   B entirely inside A (boundary contact allowed is
                False in GEOS contains only for *all* of B on the
                boundary; vertex-on-boundary handled via strict test)
    crosses:    False for polygon×polygon (dimension rule)
"""

from __future__ import annotations

import numpy as np

from spapy_ray.kernels import geom


def _rings(mp) -> list[np.ndarray]:
    return [geom._close_open(np.asarray(r, dtype=np.float64))
            for poly in mp for r in poly]


def _edges(mp) -> tuple[np.ndarray, np.ndarray]:
    p1, p2 = [], []
    for r in _rings(mp):
        p1.append(r)
        p2.append(np.roll(r, -1, axis=0))
    return np.vstack(p1), np.vstack(p2)


def _orient(ax, ay, bx, by, cx, cy):
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def segment_intersections(a1: np.ndarray, a2: np.ndarray,
                          b1: np.ndarray, b2: np.ndarray):
    """All-pairs segment intersection classification.

    Returns (proper, touching): boolean scalars. proper = interiors of
    two segments cross; touching = intersection only at endpoints /
    collinear overlap.
    """
    n, m = len(a1), len(b1)
    A1 = a1[:, None, :]
    A2 = a2[:, None, :]
    B1 = b1[None, :, :]
    B2 = b2[None, :, :]
    d1 = _orient(A1[..., 0], A1[..., 1], A2[..., 0], A2[..., 1], B1[..., 0], B1[..., 1])
    d2 = _orient(A1[..., 0], A1[..., 1], A2[..., 0], A2[..., 1], B2[..., 0], B2[..., 1])
    d3 = _orient(B1[..., 0], B1[..., 1], B2[..., 0], B2[..., 1], A1[..., 0], A1[..., 1])
    d4 = _orient(B1[..., 0], B1[..., 1], B2[..., 0], B2[..., 1], A2[..., 0], A2[..., 1])
    proper = ((d1 * d2) < 0) & ((d3 * d4) < 0)

    def on_seg(px, py, qx, qy, rx, ry):
        """r collinear with pq and within its bbox."""
        return ((np.minimum(px, qx) <= rx) & (rx <= np.maximum(px, qx)) &
                (np.minimum(py, qy) <= ry) & (ry <= np.maximum(py, qy)))

    t = np.zeros((n, m), dtype=bool)
    t |= (d1 == 0) & on_seg(A1[..., 0], A1[..., 1], A2[..., 0], A2[..., 1],
                            B1[..., 0], B1[..., 1])
    t |= (d2 == 0) & on_seg(A1[..., 0], A1[..., 1], A2[..., 0], A2[..., 1],
                            B2[..., 0], B2[..., 1])
    t |= (d3 == 0) & on_seg(B1[..., 0], B1[..., 1], B2[..., 0], B2[..., 1],
                            A1[..., 0], A1[..., 1])
    t |= (d4 == 0) & on_seg(B1[..., 0], B1[..., 1], B2[..., 0], B2[..., 1],
                            A2[..., 0], A2[..., 1])
    touching = t & ~proper
    return bool(proper.any()), bool(touching.any())


def _vertices(mp) -> np.ndarray:
    return np.vstack(_rings(mp))


def _strictly_inside_count(pts: np.ndarray, mp, other_mp) -> int:
    """#vertices of pts strictly inside mp (on-boundary excluded via
    the boundary test of other_mp's edges is NOT done here; fixtures
    avoid vertex-on-edge except shared corners, handled by 'touching')."""
    inside = geom.pip_multipolygon(pts[:, 0], pts[:, 1], mp)
    # exclude points that lie exactly on a boundary vertex/edge of mp
    on_boundary = np.zeros(len(pts), dtype=bool)
    b1, b2 = _edges(mp)
    for i in np.nonzero(inside)[0]:
        px, py = pts[i]
        d = _orient(b1[:, 0], b1[:, 1], b2[:, 0], b2[:, 1], px, py)
        on = (d == 0) & ((np.minimum(b1[:, 0], b2[:, 0]) <= px)
                         & (px <= np.maximum(b1[:, 0], b2[:, 0]))
                         & (np.minimum(b1[:, 1], b2[:, 1]) <= py)
                         & (py <= np.maximum(b1[:, 1], b2[:, 1])))
        on_boundary[i] = bool(on.any())
    return int((inside & ~on_boundary).sum())


def relate(mp_a, mp_b) -> dict[str, bool]:
    """All predicates at once for two multipolygons."""
    a1, a2 = _edges(mp_a)
    b1, b2 = _edges(mp_b)
    proper, touching = segment_intersections(a1, a2, b1, b2)
    va, vb = _vertices(mp_a), _vertices(mp_b)
    a_in_b = _strictly_inside_count(va, mp_b, mp_a)
    b_in_a = _strictly_inside_count(vb, mp_a, mp_b)
    interiors_intersect = proper or a_in_b > 0 or b_in_a > 0
    # same-interior via midpoint probe for identical/contained cases
    if not interiors_intersect and touching:
        # centroid probes catch containment with all-boundary contact
        ca = geom.multipolygon_centroid(mp_a)
        cb = geom.multipolygon_centroid(mp_b)
        interiors_intersect = bool(
            geom.pip_multipolygon(np.array([ca[0]]), np.array([ca[1]]), mp_b)[0]
            or geom.pip_multipolygon(np.array([cb[0]]), np.array([cb[1]]), mp_a)[0])
    intersects = interiors_intersect or touching
    contains_ab = (b_in_a == len(vb) and not proper)
    contains_ba = (a_in_b == len(va) and not proper)
    overlaps = (interiors_intersect and not contains_ab and not contains_ba
                and not (touching and not interiors_intersect))
    return {
        "intersects": intersects,
        "disjoint": not intersects,
        "touches": touching and not interiors_intersect,
        "overlaps": overlaps,
        "contains": contains_ab,
        "within": contains_ba,
        "crosses": False,  # polygon×polygon (GEOS dimension rule)
    }
