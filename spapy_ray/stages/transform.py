"""CRS transform stage (SpaReferencing.Transform, SpaReferencing.py:162-271).

Vectorized map_batches over either point columns (lon/lat → x/y) or a
WKB geometry column. Non-finite results are dropped row-wise, matching
the reference's NaN/±1e30 filtering (SpaReferencing.py:220-243).
Kernels are pure functions (kernels.proj) so the stage is stateless —
the reference's per-instance Transformer cache (SpaReferencing.py:150-152)
becomes nothing at all.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from spapy_ray.kernels import proj, wkb


def transform_points(ds, crs: str, lon_col: str = "lon", lat_col: str = "lat",
                     x_col: str = "x", y_col: str = "y", inverse: bool = False):
    """Append projected x/y (or lon/lat when inverse) columns; drop
    rows that project to non-finite values."""

    def _batch(t: pa.Table) -> pa.Table:
        a = t.column(lon_col).to_numpy(zero_copy_only=False)
        b = t.column(lat_col).to_numpy(zero_copy_only=False)
        x, y = (proj.inverse(crs, a, b) if inverse else proj.forward(crs, a, b))
        ok = np.isfinite(x) & np.isfinite(y)
        out = t.append_column(x_col, pa.array(x)).append_column(y_col, pa.array(y))
        return out.filter(pa.array(ok)) if not ok.all() else out

    return ds.map_batches(_batch, batch_format="pyarrow", zero_copy_batch=True)


def transform_geoms(ds, crs: str, geom_col: str = "geom_wkb",
                    inverse: bool = False):
    """Reproject every coordinate of a WKB column."""

    def conv(coords: np.ndarray) -> np.ndarray:
        x, y = (proj.inverse(crs, coords[:, 0], coords[:, 1]) if inverse
                else proj.forward(crs, coords[:, 0], coords[:, 1]))
        return np.column_stack([x, y])

    def one(g: bytes):
        t, v = wkb.decode(g)
        if t == "Point":
            c = conv(np.asarray([v]))
            if not np.isfinite(c).all():
                return None
            return wkb.encode_point(float(c[0, 0]), float(c[0, 1]))
        if t in ("LineString", "MultiPoint"):
            c = conv(np.asarray(v))
            c = c[np.isfinite(c).all(axis=1)]
            if len(c) < (1 if t == "MultiPoint" else 2):
                return None
            return (wkb.encode_linestring(c) if t == "LineString"
                    else wkb.encode_multipoint(c))
        mp = [v] if t == "Polygon" else v
        out = []
        for poly in mp:
            rings = []
            for ring in poly:
                c = conv(np.asarray(ring))
                c = c[np.isfinite(c).all(axis=1)]
                if len(c) >= 3:  # reference: polygons need >= 3 pts
                    rings.append(c)
            if rings:
                out.append(rings)
        if not out:
            return None
        return (wkb.encode_polygon(out[0]) if t == "Polygon" and len(out) == 1
                else wkb.encode_multipolygon(out))

    from spapy_ray.stages.vector_ops import _map_geoms

    return _map_geoms(ds, one, geom_col)
