"""Exact boolean ops (∩ ∪ − △) for RECTILINEAR polygons.

The reference's overlay surface delegates to GEOS for arbitrary
geometry (SpaVectors.py:901-1102). This engine implements the boolean
algebra exactly for axis-parallel (rectilinear) polygons — which
covers every reference topology/overlay test fixture (axis-aligned
squares, SpaTopologyTest.py:56-108) and the synthetic zone layer —
via coordinate compression:

1. collect the x/y coordinates of both operands → compressed grid;
2. classify each grid cell center with ray-cast PIP per operand;
3. apply the boolean on the two masks;
4. return maximal row-merged rectangles (+ exact area), convertible
   to a MultiPolygon of rectangles.

Exact because rectilinear polygon edges lie ON compressed grid lines,
so every cell is homogeneously inside/outside. Non-rectilinear input
raises (Greiner–Hormann is the round-3 general path; DIVERGENCES #7).
"""

from __future__ import annotations

import numpy as np

from spapy_ray.kernels import geom

OPS = {
    "intersection": lambda a, b: a & b,
    "union": lambda a, b: a | b,
    "difference": lambda a, b: a & ~b,
    "symmetric_difference": lambda a, b: a ^ b,
}


def is_rectilinear(mp) -> bool:
    for poly in mp:
        for ring in poly:
            r = geom._close_open(np.asarray(ring, dtype=np.float64))
            nxt = np.roll(r, -1, axis=0)
            dx = nxt[:, 0] - r[:, 0]
            dy = nxt[:, 1] - r[:, 1]
            if not np.all((dx == 0) | (dy == 0)):
                return False
    return True


def _coords(mp, axis: int) -> np.ndarray:
    return np.concatenate([
        geom._close_open(np.asarray(r, dtype=np.float64))[:, axis]
        for poly in mp for r in poly])


def _grid_masks(mps: list) -> tuple[np.ndarray, np.ndarray, list[np.ndarray]]:
    xs = np.unique(np.concatenate([_coords(mp, 0) for mp in mps]))
    ys = np.unique(np.concatenate([_coords(mp, 1) for mp in mps]))
    cx = (xs[:-1] + xs[1:]) / 2.0
    cy = (ys[:-1] + ys[1:]) / 2.0
    gx, gy = np.meshgrid(cx, cy)           # [ny-1, nx-1]
    masks = [geom.pip_multipolygon(gx.ravel(), gy.ravel(), mp)
             .reshape(gx.shape) for mp in mps]
    return xs, ys, masks


def mask_to_rects(xs: np.ndarray, ys: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Row-merge + identical-row vertical merge → [k,4] rects."""
    rects = []
    row_runs: list[tuple] = []
    prev_runs: list[list] = []  # open rects: [x0, x1, y0]
    for j in range(mask.shape[0] + 1):
        runs = []
        if j < mask.shape[0]:
            row = mask[j]
            i = 0
            while i < len(row):
                if row[i]:
                    k = i
                    while k < len(row) and row[k]:
                        k += 1
                    runs.append((xs[i], xs[k]))
                    i = k
                else:
                    i += 1
        # merge with open rects: continue those with identical span
        cur = {(r[0], r[1]): r for r in prev_runs}
        nxt_open = []
        for span in runs:
            if span in cur:
                nxt_open.append(cur.pop(span))
            else:
                nxt_open.append([span[0], span[1], ys[j]])
        for r in cur.values():  # closed
            rects.append((r[0], r[2], r[1], ys[j]))
        prev_runs = nxt_open
    return np.asarray(rects, dtype=np.float64).reshape(-1, 4)


def boolean_op(mp_a, mp_b, op: str):
    """→ (rects [k,4], area). Empty result → (empty array, 0.0)."""
    if op not in OPS:
        raise ValueError(f"unknown op {op!r}")
    for mp in (mp_a, mp_b):
        if not is_rectilinear(mp):
            raise ValueError(
                "boolean_op supports rectilinear polygons (round-3: "
                "general Greiner-Hormann)")
    xs, ys, masks = _grid_masks([mp_a, mp_b])
    ma, mb = masks
    mask = OPS[op](ma, mb)
    dx = np.diff(xs)[None, :]
    dy = np.diff(ys)[:, None]
    area = float((mask * dx * dy).sum())
    return mask_to_rects(xs, ys, mask), area


def rects_to_multipolygon(rects: np.ndarray):
    """[k,4] rects → MultiPolygon (one rectangle part each)."""
    out = []
    for x0, y0, x1, y1 in rects:
        out.append([np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]],
                             dtype=np.float64)])
    return out


def union_rects(rect_sets: list[np.ndarray]) -> tuple[np.ndarray, float]:
    """Union of many rect lists (the associative fold used for
    dataset-level union): compress all coords, any-covers mask."""
    allr = np.vstack([r for r in rect_sets if len(r)]) if rect_sets else \
        np.zeros((0, 4))
    if len(allr) == 0:
        return np.zeros((0, 4)), 0.0
    xs = np.unique(np.concatenate([allr[:, 0], allr[:, 2]]))
    ys = np.unique(np.concatenate([allr[:, 1], allr[:, 3]]))
    cx = (xs[:-1] + xs[1:]) / 2.0
    cy = (ys[:-1] + ys[1:]) / 2.0
    mask = np.zeros((len(cy), len(cx)), dtype=bool)
    for x0, y0, x1, y1 in allr:
        xi0, xi1 = np.searchsorted(xs, x0), np.searchsorted(xs, x1)
        yi0, yi1 = np.searchsorted(ys, y0), np.searchsorted(ys, y1)
        mask[yi0:yi1, xi0:xi1] = True
    dx = np.diff(xs)[None, :]
    dy = np.diff(ys)[:, None]
    area = float((mask * dx * dy).sum())
    return mask_to_rects(xs, ys, mask), area


def multipolygon_to_rects(mp) -> np.ndarray:
    """Rectilinear multipolygon → covering rects (exact decomposition)."""
    if not is_rectilinear(mp):
        raise ValueError("rectilinear input required")
    xs, ys, masks = _grid_masks([mp])
    return mask_to_rects(xs, ys, masks[0])


def parity_rects(rect_sets: list[np.ndarray]) -> tuple[np.ndarray, float]:
    """Region covered by an ODD number of rect sets — the associative
    form of the reference's sequential symmetric-difference self-fold
    (SpaVectors.py:1006-1038): XOR is associative, so
    f0 △ f1 △ ... △ fn = odd-coverage(f0..fn)."""
    allr = [r for r in rect_sets if len(r)]
    if not allr:
        return np.zeros((0, 4)), 0.0
    flat = np.vstack(allr)
    xs = np.unique(np.concatenate([flat[:, 0], flat[:, 2]]))
    ys = np.unique(np.concatenate([flat[:, 1], flat[:, 3]]))
    count = np.zeros((len(ys) - 1, len(xs) - 1), dtype=np.int64)
    for rset in allr:
        cover = np.zeros_like(count, dtype=bool)
        for x0, y0, x1, y1 in rset:
            xi0, xi1 = np.searchsorted(xs, x0), np.searchsorted(xs, x1)
            yi0, yi1 = np.searchsorted(ys, y0), np.searchsorted(ys, y1)
            cover[yi0:yi1, xi0:xi1] = True
        count += cover
    mask = (count % 2) == 1
    dx = np.diff(xs)[None, :]
    dy = np.diff(ys)[:, None]
    return mask_to_rects(xs, ys, mask), float((mask * dx * dy).sum())


def difference_fold_rects(first: np.ndarray,
                          rest_sets: list[np.ndarray]) -> tuple[np.ndarray, float]:
    """first \\ (union of rest) — the closed form of the reference's
    sequential difference fold acc = (((f0 - f1) - f2) - ...)."""
    rest, _ = union_rects(rest_sets)
    if len(first) == 0:
        return np.zeros((0, 4)), 0.0
    if len(rest) == 0:
        xs = np.unique(np.concatenate([first[:, 0], first[:, 2]]))
        ys = np.unique(np.concatenate([first[:, 1], first[:, 3]]))
        area = float(((first[:, 2] - first[:, 0])
                      * (first[:, 3] - first[:, 1])).sum())
        return first, area
    mp_first = rects_to_multipolygon(first)
    mp_rest = rects_to_multipolygon(rest)
    return boolean_op(mp_first, mp_rest, "difference")
