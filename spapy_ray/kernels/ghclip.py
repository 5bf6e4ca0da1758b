"""Greiner–Hormann polygon clipping — general (non-rectilinear)
boolean ops for simple single-ring polygons in general position.

Public algorithm (Greiner & Hormann 1998). Scope & contract:

- operands: simple polygons (one ring each, no holes, no
  self-intersection), any orientation (normalized to CCW internally);
- ops: intersection, union, difference;
- DEGENERATE inputs (vertex exactly on an edge, collinear edge
  overlap, shared vertices) raise :class:`DegenerateGeometry` — the
  caller falls back to the exact rectilinear path
  (kernels.rectilinear) when the inputs are axis-parallel, which is
  where degeneracy actually occurs in this engine's fixtures;
- no intersections: resolved by containment (ray-cast) into
  [], [S], [C] or both as the op requires.

Result: list of rings (possibly several output rings).
"""

from __future__ import annotations

import numpy as np

from spapy_ray.kernels import geom


class DegenerateGeometry(ValueError):
    pass


class _V:
    __slots__ = ("x", "y", "nxt", "prv", "neighbor", "intersect", "entry",
                 "visited", "alpha")

    def __init__(self, x: float, y: float):
        self.x = x
        self.y = y
        self.nxt = None
        self.prv = None
        self.neighbor = None
        self.intersect = False
        self.entry = False
        self.visited = False
        self.alpha = 0.0


def _ring_list(ring: np.ndarray) -> _V:
    r = geom._close_open(np.asarray(ring, dtype=np.float64))
    if geom.ring_signed_area(r) < 0:
        r = r[::-1]
    verts = [_V(float(x), float(y)) for x, y in r]
    n = len(verts)
    for i, v in enumerate(verts):
        v.nxt = verts[(i + 1) % n]
        v.prv = verts[(i - 1) % n]
    return verts[0]


def _iter_ring(start: _V):
    v = start
    while True:
        yield v
        v = v.nxt
        if v is start:
            break


def _orig_edges(start: _V):
    """Original (non-intersection) vertices paired with the next
    original vertex."""
    origs = [v for v in _iter_ring(start) if not v.intersect]
    n = len(origs)
    for i in range(n):
        yield origs[i], origs[(i + 1) % n]


def _seg_intersect(p1, p2, q1, q2):
    """Proper-crossing test with parametric positions.

    Returns (t, u) in (0,1)x(0,1) for a proper crossing, None when
    disjoint, raises DegenerateGeometry on touch/collinear cases."""
    d1x, d1y = p2.x - p1.x, p2.y - p1.y
    d2x, d2y = q2.x - q1.x, q2.y - q1.y
    denom = d1x * d2y - d1y * d2x
    ex, ey = q1.x - p1.x, q1.y - p1.y
    if denom == 0.0:
        cross = ex * d1y - ey * d1x
        if cross == 0.0:
            # collinear: overlap is degenerate, separation is fine
            t0 = (ex * d1x + ey * d1y) / (d1x * d1x + d1y * d1y)
            t1 = t0 + (d2x * d1x + d2y * d1y) / (d1x * d1x + d1y * d1y)
            lo, hi = min(t0, t1), max(t0, t1)
            if hi < 0.0 or lo > 1.0:
                return None
            raise DegenerateGeometry("collinear overlapping edges")
        return None
    t = (ex * d2y - ey * d2x) / denom
    u = (ex * d1y - ey * d1x) / denom
    eps = 1e-12
    if t < -eps or t > 1 + eps or u < -eps or u > 1 + eps:
        return None
    if t < eps or t > 1 - eps or u < eps or u > 1 - eps:
        # endpoint touches an edge / shared vertex
        if (-eps <= t <= 1 + eps) and (-eps <= u <= 1 + eps):
            raise DegenerateGeometry("vertex-on-edge intersection")
        return None
    return t, u


def _insert_sorted(edge_start: _V, v: _V):
    """Insert intersection vertex v after edge_start, keeping alpha
    order among intersection vertices on the same edge."""
    cur = edge_start
    while cur.nxt.intersect and cur.nxt.alpha < v.alpha:
        cur = cur.nxt
    v.nxt = cur.nxt
    v.prv = cur
    cur.nxt.prv = v
    cur.nxt = v


def _inside(v: _V, ring: np.ndarray) -> bool:
    return bool(geom.pip_ring(np.array([v.x]), np.array([v.y]), ring)[0])


def clip(subject: np.ndarray, clipper: np.ndarray, op: str = "intersection"):
    """→ list of rings (np arrays). op ∈ intersection|union|difference."""
    if op not in ("intersection", "union", "difference"):
        raise ValueError(f"unknown op {op!r}")
    s_ring = geom._close_open(np.asarray(subject, dtype=np.float64))
    c_ring = geom._close_open(np.asarray(clipper, dtype=np.float64))
    S = _ring_list(s_ring)
    C = _ring_list(c_ring)

    # 1. find + insert all proper intersections
    found = 0
    for p1, p2 in list(_orig_edges(S)):
        for q1, q2 in list(_orig_edges(C)):
            r = _seg_intersect(p1, p2, q1, q2)
            if r is None:
                continue
            t, u = r
            x = p1.x + t * (p2.x - p1.x)
            y = p1.y + t * (p2.y - p1.y)
            vs = _V(x, y)
            vc = _V(x, y)
            vs.intersect = vc.intersect = True
            vs.alpha, vc.alpha = t, u
            vs.neighbor, vc.neighbor = vc, vs
            _insert_sorted(p1, vs)
            _insert_sorted(q1, vc)
            found += 1

    sr = geom._close_open(np.asarray(subject, dtype=np.float64))
    cr = geom._close_open(np.asarray(clipper, dtype=np.float64))
    if geom.ring_signed_area(sr) < 0:
        sr = sr[::-1]
    if geom.ring_signed_area(cr) < 0:
        cr = cr[::-1]

    if found == 0:
        s_in_c = _inside(S, cr)
        c_in_s = _inside(C, sr)
        if op == "intersection":
            if s_in_c:
                return [sr]
            if c_in_s:
                return [cr]
            return []
        if op == "union":
            if s_in_c:
                return [cr]
            if c_in_s:
                return [sr]
            return [sr, cr]
        # difference S - C
        if s_in_c:
            return []
        if c_in_s:
            return [sr, cr[::-1]]  # hole (returned as reversed ring)
        return [sr]
    if found % 2 != 0:
        raise DegenerateGeometry("odd intersection count (tangency)")

    # 2. entry/exit marking
    def mark(start: _V, other_ring: np.ndarray, flip: bool):
        status = not _inside(start, other_ring)  # True = next xing is entry
        if flip:
            status = not status
        for v in _iter_ring(start):
            if v.intersect:
                v.entry = status
                status = not status

    # op-dependent initial flips (classic GH table)
    flip_s = op in ("union", "difference")
    flip_c = op == "union"
    mark(S, cr, flip_s)
    mark(C, sr, flip_c)

    # 3. traversal
    results = []
    def unvisited():
        for v in _iter_ring(S):
            if v.intersect and not v.visited:
                return v
        return None

    while True:
        cur = unvisited()
        if cur is None:
            break
        ring_pts = []
        start = cur
        while True:
            cur.visited = True
            if cur.neighbor is not None:
                cur.neighbor.visited = True
            if cur.entry:
                while True:
                    ring_pts.append((cur.x, cur.y))
                    cur = cur.nxt
                    if cur.intersect:
                        break
            else:
                while True:
                    ring_pts.append((cur.x, cur.y))
                    cur = cur.prv
                    if cur.intersect:
                        break
            cur = cur.neighbor
            if cur is start or cur.neighbor is start or cur.visited and \
                    (cur is start or cur.neighbor is start):
                break
            if cur.visited:
                break
        if len(ring_pts) >= 3:
            r = np.asarray(ring_pts, dtype=np.float64)
            if geom.ring_signed_area(r) < 0:
                r = r[::-1]  # crossing outputs are simply connected: CCW
            results.append(r)
    return results
