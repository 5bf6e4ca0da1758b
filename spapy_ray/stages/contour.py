"""Contour extraction (SpaTopoTools.Contour, SpaTopo.py:185-233 —
gdal.ContourGenerate replacement): marching squares per tile with a
1-px halo, then cross-tile polyline stitching.

- segment generation is a vectorized marching-squares kernel over the
  padded tile (the same halo-exchange fragments as hillshade), each
  tile OWNING the cells whose top-left pixel it contains → no
  duplicate segments;
- stitching chains segments into polylines by quantized-endpoint
  matching. Segment volume is O(contour length), tiny next to the
  raster, so the chain step runs on the driver; the scale path is a
  groupby on quantized endpoints (documented).

Outputs one row per polyline: (level, line_id, n_points, length,
closed, wkb LineString).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from spapy_ray.kernels import wkb
from spapy_ray.sources.rasters import RasterMeta
from spapy_ray.stages.raster import _halo_fragments, _assemble_padded

# marching-squares: for each case (bit0=TL, bit1=TR, bit2=BR, bit3=BL
# above level) the crossed edge pairs. Edges: 0=top,1=right,2=bottom,3=left.
_CASES: dict[int, list[tuple[int, int]]] = {
    0: [], 15: [],
    1: [(3, 0)], 14: [(3, 0)],
    2: [(0, 1)], 13: [(0, 1)],
    4: [(1, 2)], 11: [(1, 2)],
    8: [(2, 3)], 7: [(2, 3)],
    3: [(3, 1)], 12: [(3, 1)],
    6: [(0, 2)], 9: [(0, 2)],
    5: [(3, 0), (1, 2)],      # ambiguous saddles: fixed resolution
    10: [(0, 1), (2, 3)],
}


def marching_squares_segments(z: np.ndarray, level: float,
                              x0: float, y0: float,
                              dx: float, dy: float) -> np.ndarray:
    """Segments [k, 4] (x1,y1,x2,y2) for cells whose top-left corner is
    in z[:-1, :-1]; corner (i,j) sits at (x0 + j*dx, y0 + i*dy)."""
    zz = z.astype(np.float64)
    above = zz >= level
    tl = above[:-1, :-1]
    tr = above[:-1, 1:]
    br = above[1:, 1:]
    bl = above[1:, :-1]
    case = (tl.astype(np.int8) | (tr.astype(np.int8) << 1)
            | (br.astype(np.int8) << 2) | (bl.astype(np.int8) << 3))
    ii, jj = np.nonzero((case != 0) & (case != 15))
    if len(ii) == 0:
        return np.zeros((0, 4))

    zTL = zz[ii, jj]
    zTR = zz[ii, jj + 1]
    zBR = zz[ii + 1, jj + 1]
    zBL = zz[ii + 1, jj]

    def interp(za, zb):
        d = zb - za
        t = np.where(d != 0, (level - za) / np.where(d == 0, 1, d), 0.5)
        return np.clip(t, 0.0, 1.0)

    # edge crossing coordinates per cell
    ex = {
        0: (jj + interp(zTL, zTR), ii + 0.0),            # top
        1: (jj + 1.0, ii + interp(zTR, zBR)),            # right
        2: (jj + interp(zBL, zBR), ii + 1.0),            # bottom
        3: (jj + 0.0, ii + interp(zTL, zBL)),            # left
    }
    segs = []
    cases = case[ii, jj]
    for c, pairs in _CASES.items():
        if not pairs:
            continue
        m = cases == c
        if not m.any():
            continue
        for e1, e2 in pairs:
            x1 = x0 + ex[e1][0][m] * dx
            y1 = y0 + ex[e1][1][m] * dy
            x2 = x0 + ex[e2][0][m] * dx
            y2 = y0 + ex[e2][1][m] * dy
            segs.append(np.column_stack([x1, y1, x2, y2]))
    return np.vstack(segs) if segs else np.zeros((0, 4))


def contour_segments(ds, meta: RasterMeta, levels: list[float], *,
                     dtype: str = "float32"):
    """Tile table → Dataset of contour segments (level, x1,y1,x2,y2)."""
    frags = ds.map_batches(lambda t: _halo_fragments(t, meta, dtype),
                           batch_format="pyarrow")

    def per_tile(g: pd.DataFrame) -> pd.DataFrame:
        pad = _assemble_padded(g, meta, dtype)
        T = meta.tile_size
        tx, ty = int(g["tx"].iloc[0]), int(g["ty"].iloc[0])
        # cells owned: top-left corners = this tile's pixels → use
        # pad[1:T+2, 1:T+2] (core + one E/S halo row/col)
        z = pad[1:T + 2, 1:T + 2]
        # clip at raster edge (no cells beyond last pixel row/col)
        max_i = min(T, meta.height - ty * T - 1) + 1
        max_j = min(T, meta.width - tx * T - 1) + 1
        z = z[:max_i, :max_j]
        x0 = meta.x_min + (tx * T + 0.5) * meta.pixel_w
        y0 = meta.y_max + (ty * T + 0.5) * meta.pixel_h
        rows = {"level": [], "x1": [], "y1": [], "x2": [], "y2": []}
        for lv in levels:
            segs = marching_squares_segments(z, lv, x0, y0,
                                             meta.pixel_w, meta.pixel_h)
            rows["level"].extend([lv] * len(segs))
            for k, col in enumerate(("x1", "y1", "x2", "y2")):
                rows[col].extend(segs[:, k])
        return pd.DataFrame(rows)

    return frags.groupby(["tx", "ty"]).map_groups(per_tile,
                                                  batch_format="pandas")


def stitch_segments(segs: pd.DataFrame, snap: float = 1e-9) -> pd.DataFrame:
    """Segments → polylines by endpoint chaining (per level).

    Returns (level, line_id, n_points, length, closed, geom_wkb).
    """
    out = []
    for lv, g in segs.groupby("level"):
        pts = g[["x1", "y1", "x2", "y2"]].to_numpy()
        qa = np.round(pts[:, :2] / snap).astype(np.int64)
        qb = np.round(pts[:, 2:] / snap).astype(np.int64)
        adj: dict[tuple, list] = {}
        for i in range(len(pts)):
            adj.setdefault(tuple(qa[i]), []).append((i, 0))
            adj.setdefault(tuple(qb[i]), []).append((i, 1))
        used = np.zeros(len(pts), dtype=bool)
        line_id = 0
        for i in range(len(pts)):
            if used[i]:
                continue
            # walk both directions from segment i
            chain = [tuple(qa[i]), tuple(qb[i])]
            coords = [pts[i, :2], pts[i, 2:]]
            used[i] = True
            for end in (1, 0):
                while True:
                    key = chain[-1] if end == 1 else chain[0]
                    nxt = [e for e in adj.get(key, []) if not used[e[0]]]
                    if not nxt:
                        break
                    j, side = nxt[0]
                    used[j] = True
                    other = tuple(qa[j]) if side == 1 else tuple(qb[j])
                    pt = pts[j, :2] if side == 1 else pts[j, 2:]
                    if end == 1:
                        chain.append(other)
                        coords.append(pt)
                    else:
                        chain.insert(0, other)
                        coords.insert(0, pt)
            arr = np.asarray(coords, dtype=np.float64)
            closed = bool(np.all(np.abs(arr[0] - arr[-1]) < snap * 10))
            d = np.diff(arr, axis=0)
            length = float(np.hypot(d[:, 0], d[:, 1]).sum())
            out.append({"level": lv, "line_id": line_id,
                        "n_points": len(arr), "length": length,
                        "closed": closed,
                        "geom_wkb": wkb.encode_linestring(arr)})
            line_id += 1
    return pd.DataFrame(out)


def contour(ds, meta: RasterMeta, levels: list[float], *,
            dtype: str = "float32") -> pd.DataFrame:
    """Full contour op: distributed segments → stitched polylines."""
    segs = contour_segments(ds, meta, levels, dtype=dtype).to_pandas()
    return stitch_segments(segs)
