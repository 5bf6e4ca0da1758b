"""Per-feature measures & dataset aggregates (SURVEY.md §2.5):
area / length / bounds columns, dataset bounds fold, zone measure
tables. Mirrors GetFeatureArea/GetFeatureLength/GetFeatureBounds
(SpaVectors.py:690-724) and GetBounds (SpaVectors.py:754-782).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from spapy_ray.kernels import geom, wkb

U = 10000  # fixed-point units per degree (zone layer convention)


def fixed_point_multipolygon_area(mp, unit: int = U) -> float:
    """Exact shoelace area for geometries whose vertices lie on a
    1/unit grid: quantize to int64 and sum integer cross products, so
    the result is bit-identical to the SQL oracle's closed-form
    integer arithmetic (oracle.q_zone_bounds_area)."""
    total = 0
    for poly in mp:
        for j, ring in enumerate(poly):
            r = np.rint(np.asarray(ring, dtype=np.float64) * unit).astype(np.int64)
            if len(r) > 1 and (r[0] == r[-1]).all():
                r = r[:-1]
            x, y = r[:, 0], r[:, 1]
            s2 = int(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))  # 2*area
            a = abs(s2)
            total += a if j == 0 else -a
    return (total / 2.0) / (unit * unit)


def fixed_point_multipolygon_centroid(mp, unit: int = U) -> tuple[float, float]:
    """Exact area-weighted centroid for geometries on a 1/unit grid.

    Shoelace sums accumulated in arbitrary-precision Python ints
    (signed: CCW exterior positive, CW holes negative), then a fixed
    two-division float tail — so a closed-form SQL twin
    (oracle.q_zone_centroids) matches bit-for-bit:

        cx = double(cx6) / double(3 * a2) / unit

    where a2 = 2*area and cx6 = 6*integral(x dA) are exact integers.
    """
    a2 = 0
    cx6 = 0
    cy6 = 0
    for poly in mp:
        for ring in poly:
            r = np.rint(np.asarray(ring, dtype=np.float64) * unit).astype(np.int64)
            if len(r) > 1 and (r[0] == r[-1]).all():
                r = r[:-1]
            xs = r[:, 0].tolist()
            ys = r[:, 1].tolist()
            n = len(xs)
            for i in range(n):
                j = (i + 1) % n
                cr = xs[i] * ys[j] - xs[j] * ys[i]
                a2 += cr
                cx6 += (xs[i] + xs[j]) * cr
                cy6 += (ys[i] + ys[j]) * cr
    if a2 == 0:
        pts = np.vstack([np.asarray(r, dtype=np.float64) for p in mp for r in p])
        return float(pts[:, 0].mean()), float(pts[:, 1].mean())
    return (float(cx6) / float(3 * a2) / unit,
            float(cy6) / float(3 * a2) / unit)


def measure_wkb_table(table: pa.Table, geom_col: str = "geom_wkb",
                      fixed_point: bool = True) -> pa.Table:
    """Append minx/miny/maxx/maxy/area columns computed from WKB."""
    geoms = table.column(geom_col).to_pylist()
    n = len(geoms)
    minx = np.empty(n); miny = np.empty(n)
    maxx = np.empty(n); maxy = np.empty(n)
    area = np.empty(n)
    for i, g in enumerate(geoms):
        mp = wkb.as_multipolygon(g)
        minx[i], miny[i], maxx[i], maxy[i] = geom.multipolygon_bbox(mp)
        area[i] = (fixed_point_multipolygon_area(mp) if fixed_point
                   else geom.multipolygon_area(mp))
    out = table
    for name, arr in (("minx", minx), ("miny", miny), ("maxx", maxx),
                      ("maxy", maxy), ("area", area)):
        out = out.append_column(name, pa.array(arr))
    return out


def dataset_bounds(ds, cols=("lon", "lat")):
    """Global bounds fold: partial per-block min/max + tiny final
    aggregate (replaces the sequential fold of SpaVectors.py:754-782)."""
    from ray.data.aggregate import Max, Min

    x, y = cols
    return ds.aggregate(Min(x, alias_name="minx"), Min(y, alias_name="miny"),
                        Max(x, alias_name="maxx"), Max(y, alias_name="maxy"))


def dataset_convex_hull(ds, geom_col: str = "geom_wkb") -> np.ndarray:
    """Convex hull of ALL features: per-block partial hulls (the only
    points that can matter) → tiny driver-side final merge. The
    distributed form of the reference's whole-dataset folds
    (OverlayWithSelf-style accumulation, SpaVectors.py:1006-1038, for
    the associative hull case)."""

    def partial(t: pa.Table) -> pa.Table:
        pts = []
        for g in t.column(geom_col).to_pylist():
            ty, v = wkb.decode(g)
            if ty == "Point":
                pts.append(np.asarray([v]))
            elif ty in ("LineString", "MultiPoint"):
                pts.append(np.asarray(v))
            elif ty == "Polygon":
                pts.append(np.vstack(v))
            else:
                pts.append(np.vstack([r for p in v for r in p]))
        hull = geom.convex_hull(np.vstack(pts)) if pts else np.zeros((0, 2))
        return pa.table({"x": pa.array(hull[:, 0]), "y": pa.array(hull[:, 1])})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return geom.convex_hull(parts[["x", "y"]].to_numpy())


def fixed_point_multipolygon_perimeter(mp, unit: int = U) -> int:
    """Exact integer perimeter (in 1/unit units) for geometries whose
    vertices lie on a 1/unit grid: per-edge hypot on quantized int
    coordinates — exact for axis-parallel edges (hypot(d, 0) == |d|),
    float for diagonals, then one rint. Sums ALL rings of every
    polygon (GetFeatureLength semantics, SpaVectors.py:690-724:
    holes add their boundary)."""
    total = 0.0
    for poly in mp:
        for ring in poly:
            r = np.rint(np.asarray(ring, dtype=np.float64) * unit) \
                .astype(np.int64)
            if len(r) > 1 and (r[0] == r[-1]).all():
                r = r[:-1]
            d = r - np.roll(r, -1, axis=0)
            total += float(np.hypot(d[:, 0], d[:, 1]).sum())
    return int(np.rint(total))
