"""Per-feature vector transforms over WKB datasets (SURVEY.md §2.2).

Each op mirrors a reference transform (file:line cited per function)
as a stateless ``map_batches`` kernel over a table with a
``geom_wkb: binary`` column; attributes pass through. Failed/empty
geometries are dropped with the reference's swallow-errors-drop-row
policy (SpaVectors.py:808-812) — but counted in a ``_dropped``
metric column convention (see state.metrics).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from spapy_ray.kernels import geom, wkb


def _map_geoms(ds, fn, geom_col: str = "geom_wkb"):
    """fn(wkb_bytes) -> wkb_bytes | None (None drops the row)."""

    def _batch(t: pa.Table) -> pa.Table:
        out, keep = [], []
        for i, g in enumerate(t.column(geom_col).to_pylist()):
            try:
                r = fn(g)
            except Exception:
                r = None  # reference behavior: swallow + drop (SpaVectors.py:808-812)
            if r is not None:
                out.append(r)
                keep.append(i)
        kept = t.take(pa.array(keep, type=pa.int64()))
        idx = kept.schema.get_field_index(geom_col)
        return kept.set_column(idx, geom_col, pa.array(out, type=pa.binary()))

    return ds.map_batches(_batch, batch_format="pyarrow")


def _ring_buffer_shapes(ring: np.ndarray, dist: float, segments: int):
    """Minkowski decomposition pieces of a ring's boundary fattening:
    one 2*dist-wide rectangle per edge + one disc (segments-gon,
    vertices ON the circle — the GEOS quad-segs convention) per
    vertex."""
    r = geom._close_open(np.asarray(ring, dtype=np.float64))
    nxt = np.roll(r, -1, axis=0)
    e = nxt - r
    ln = np.hypot(e[:, 0], e[:, 1])
    ln[ln == 0] = 1.0
    nx, ny = e[:, 1] / ln, -e[:, 0] / ln
    shapes = []
    for i in range(len(r)):
        p, q = r[i], nxt[i]
        off = np.array([nx[i], ny[i]]) * dist
        shapes.append([np.array([p + off, q + off, q - off, p - off])])
        shapes.append([geom.buffer_point(r[i, 0], r[i, 1], dist, segments)])
    return shapes


def buffer_round(mp, dist: float, segments: int = 16):
    """GEOS-parity round-join polygon buffer via boolean folds
    (SpaVectors.py:790-818 wraps shapely .buffer; arcs discretized to
    ``segments``-gons like GEOS quadrant segments):

        dilate:  P ∪ (edge rectangles) ∪ (vertex discs)
        erode:   P − (edge rectangles) − (vertex discs)

    over every ring (exteriors and holes) through the general
    edge-classification kernel. Exact up to arc discretization;
    concave corners and self-overlap resolve through the union.
    Returns (rings, area)."""
    from spapy_ray.kernels.edgeclass import boolean_edges

    shapes = []
    for poly in mp:
        for ring in poly:
            shapes.extend(_ring_buffer_shapes(ring, abs(dist), segments))
    cur = [list(p) for p in mp]
    rings = None
    op = "union" if dist >= 0 else "difference"
    for s in shapes:
        out_rings, _ = boolean_edges(cur, [s], op)
        from spapy_ray.kernels.booleans import rings_to_multipolygon
        cur = rings_to_multipolygon(out_rings)
        rings = out_rings
        if not cur:
            break
    area = float(sum(geom.ring_signed_area(r) for r in (rings or [])))
    return (rings or []), area


def buffer(ds, dist: float, segments: int = 16, geom_col: str = "geom_wkb",
           method: str = "offset"):
    """Buffer (SpaVectors.py:790-818, one-liner 1433-1451).

    Point → disc polygon; Polygon/MultiPolygon →
    - method="offset" (default): vertex-offset approximation (each
      ring densified then offset outward along vertex normals) —
      fast, documented approximation, exact for discs;
    - method="round": GEOS-parity round joins via boolean folds
      (buffer_round) — supports negative dist (erosion).
    """
    if method == "round":
        from spapy_ray.kernels.booleans import rings_to_multipolygon

        def fr(g: bytes):
            t, v = wkb.decode(g)
            if t == "Point":
                return wkb.encode_polygon([geom.buffer_point(v[0], v[1],
                                                             dist, segments)])
            mp = wkb.as_multipolygon(g)
            rings, _ = buffer_round(mp, dist, segments)
            if not rings:
                return None
            return wkb.encode_multipolygon(rings_to_multipolygon(rings))

        return _map_geoms(ds, fr, geom_col)

    def f(g: bytes):
        t, v = wkb.decode(g)
        if t == "Point":
            return wkb.encode_polygon([geom.buffer_point(v[0], v[1], dist,
                                                         segments)])
        if t == "MultiPoint":
            return wkb.encode_multipolygon(
                [[geom.buffer_point(x, y, dist, segments)] for x, y in v])
        if t in ("Polygon", "MultiPolygon"):
            mp = [v] if t == "Polygon" else v
            out = []
            for poly in mp:
                ring = geom._close_open(np.asarray(poly[0], dtype=np.float64))
                if geom.ring_signed_area(ring) < 0:
                    ring = ring[::-1]
                dense = geom.densify(ring, max(abs(dist) / 2.0, 1e-9), closed=True)
                prev = np.roll(dense, 1, axis=0)
                nxt = np.roll(dense, -1, axis=0)
                e = nxt - prev
                ln = np.hypot(e[:, 0], e[:, 1])
                ln[ln == 0] = 1.0
                # CCW ring: outward normal of travel direction (dx,dy)
                # is (dy,-dx); offset outward by +dist
                normal = np.column_stack([e[:, 1] / ln, -e[:, 0] / ln])
                out.append([dense + normal * dist])
            return (wkb.encode_polygon(out[0]) if t == "Polygon"
                    else wkb.encode_multipolygon(out))
        return None

    return _map_geoms(ds, f, geom_col)


def simplify(ds, tol: float, geom_col: str = "geom_wkb"):
    """Douglas-Peucker simplify (SpaVectors.py:820-846)."""

    def f(g: bytes):
        t, v = wkb.decode(g)
        if t == "LineString":
            return wkb.encode_linestring(geom.simplify_dp(v, tol))
        if t in ("Polygon", "MultiPolygon"):
            mp = [v] if t == "Polygon" else v
            out = []
            for poly in mp:
                rings = []
                for ring in poly:
                    s = geom.simplify_dp(np.asarray(ring), tol)
                    if len(s) >= 4:  # closed ring needs >= 3 distinct pts
                        rings.append(s)
                if rings:
                    out.append(rings)
            if not out:
                return None
            return (wkb.encode_polygon(out[0]) if t == "Polygon" and len(out) == 1
                    else wkb.encode_multipolygon(out))
        return g  # points unchanged

    return _map_geoms(ds, f, geom_col)


def convex_hull(ds, geom_col: str = "geom_wkb"):
    """Per-feature hull (SpaVectors.py:848-869) → Polygon column."""

    def f(g: bytes):
        t, v = wkb.decode(g)
        if t == "Point":
            pts = np.asarray([v])
        elif t in ("LineString", "MultiPoint"):
            pts = np.asarray(v)
        elif t == "Polygon":
            pts = np.vstack(v)
        elif t == "MultiPolygon":
            pts = np.vstack([r for p in v for r in p])
        else:
            pts = np.vstack(v)
        hull = geom.convex_hull(pts)
        if len(hull) < 3:
            return None
        return wkb.encode_polygon([hull])

    return _map_geoms(ds, f, geom_col)


def centroid(ds, geom_col: str = "geom_wkb", fixed_point: bool = False):
    """Per-feature centroid → Point dataset (SpaVectors.py:871-894).

    ``fixed_point=True`` switches polygon centroids to exact integer
    shoelace accumulation on the 1e-4-degree grid (bit-identical to
    the closed-form SQL oracle; see measures.fixed_point_multipolygon_centroid).
    """

    def f(g: bytes):
        t, v = wkb.decode(g)
        if t == "Point":
            return wkb.encode_point(*v)
        if t in ("LineString", "MultiPoint"):
            pts = np.asarray(v, dtype=np.float64)
            return wkb.encode_point(float(pts[:, 0].mean()), float(pts[:, 1].mean()))
        mp = [v] if t == "Polygon" else v
        if fixed_point:
            from spapy_ray.stages.measures import fixed_point_multipolygon_centroid
            cx, cy = fixed_point_multipolygon_centroid(mp)
        else:
            cx, cy = geom.multipolygon_centroid(mp)
        return wkb.encode_point(cx, cy)

    return _map_geoms(ds, f, geom_col)


def densify(ds, max_dist: float, geom_col: str = "geom_wkb"):
    """Densify (SpaDensify.py:41-187)."""

    def f(g: bytes):
        t, v = wkb.decode(g)
        if t == "LineString":
            return wkb.encode_linestring(geom.densify(v, max_dist))
        if t in ("Polygon", "MultiPolygon"):
            mp = [v] if t == "Polygon" else v
            out = [[geom.densify(r, max_dist, closed=True) for r in poly]
                   for poly in mp]
            return (wkb.encode_polygon(out[0]) if t == "Polygon"
                    else wkb.encode_multipolygon(out))
        return g

    return _map_geoms(ds, f, geom_col)


def split_features(ds, geom_col: str = "geom_wkb"):
    """Explode Multi* into one row per part, attributes replicated
    (SplitFeatures, SpaVectors.py:591-615) — a flat_map-shaped
    map_batches (rows out >= rows in)."""

    def _batch(t: pa.Table) -> pa.Table:
        idx, parts = [], []
        for i, g in enumerate(t.column(geom_col).to_pylist()):
            ty, v = wkb.decode(g)
            if ty == "MultiPolygon":
                for poly in v:
                    idx.append(i)
                    parts.append(wkb.encode_polygon(poly))
            elif ty == "MultiLineString":
                for line in v:
                    idx.append(i)
                    parts.append(wkb.encode_linestring(line))
            elif ty == "MultiPoint":
                for x, y in np.asarray(v):
                    idx.append(i)
                    parts.append(wkb.encode_point(float(x), float(y)))
            else:
                idx.append(i)
                parts.append(g)
        out = t.take(pa.array(idx, type=pa.int64()))
        gi = out.schema.get_field_index(geom_col)
        return out.set_column(gi, geom_col, pa.array(parts, type=pa.binary()))

    return ds.map_batches(_batch, batch_format="pyarrow")


def measures(ds, geom_col: str = "geom_wkb"):
    """Append area/length/bbox columns (GetFeatureArea/Length/Bounds,
    SpaVectors.py:690-724)."""

    def _batch(t: pa.Table) -> pa.Table:
        from spapy_ray.stages.measures import measure_wkb_table

        return measure_wkb_table(t, geom_col, fixed_point=False)

    return ds.map_batches(_batch, batch_format="pyarrow")
