"""H3/S2-style hierarchical cell index: uint64 quadkeys over lat/lon.

The reference has *no* spatial index of any kind (SURVEY.md §2.10); the
north rule adds one. We use a Morton/quadkey scheme on an
equirectangular grid because it is deterministic, needs no tables, and
parent / child / neighbor / ring are all O(1) bit math — the properties
the engine needs for cell-partitioned shuffles and kNN ring expansion.

Layout of a cell id (uint64)::

    bits 63..59  : resolution r (0..26), so ids at different
                   resolutions never collide
    bits 2r-1..0 : Morton interleave of (x, y) where
                   x = floor((lon+180)/360 * 2**r)  (bit 0, 2, 4, ...)
                   y = floor((lat+ 90)/180 * 2**r)  (bit 1, 3, 5, ...)

All functions are vectorized over numpy arrays and use only integer
ops, so the exact same computation is expressible in DuckDB SQL with
``<< >> | &`` on UBIGINT (used by the driver's correctness oracle).
"""

from __future__ import annotations

import numpy as np

MAX_RES = 26  # 2*26 = 52 Morton bits + 5 resolution bits < 64

_M16 = np.uint64(0x0000FFFF0000FFFF)
_M8 = np.uint64(0x00FF00FF00FF00FF)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_M2 = np.uint64(0x3333333333333333)
_M1 = np.uint64(0x5555555555555555)


def _spread(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of v so bit i lands at bit 2i (Morton)."""
    v = v.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    v = (v | (v << np.uint64(16))) & _M16
    v = (v | (v << np.uint64(8))) & _M8
    v = (v | (v << np.uint64(4))) & _M4
    v = (v | (v << np.uint64(2))) & _M2
    v = (v | (v << np.uint64(1))) & _M1
    return v


def _compact(v: np.ndarray) -> np.ndarray:
    """Inverse of _spread: gather bits 0,2,4,... into the low 32 bits."""
    v = v.astype(np.uint64) & _M1
    v = (v | (v >> np.uint64(1))) & _M2
    v = (v | (v >> np.uint64(2))) & _M4
    v = (v | (v >> np.uint64(4))) & _M8
    v = (v | (v >> np.uint64(8))) & _M16
    v = (v | (v >> np.uint64(16))) & np.uint64(0xFFFFFFFF)
    return v


def xy_for(lon: np.ndarray, lat: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Integer grid coords at resolution ``res``, clipped to the grid."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}], got {res}")
    n = np.int64(1) << np.int64(res)
    x = np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * n).astype(np.int64)
    y = np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / 180.0 * n).astype(np.int64)
    np.clip(x, 0, n - 1, out=x)
    np.clip(y, 0, n - 1, out=y)
    return x, y


def encode_xy(x: np.ndarray, y: np.ndarray, res: int) -> np.ndarray:
    head = np.uint64(res) << np.uint64(59)
    return head | _spread(np.asarray(x)) | (_spread(np.asarray(y)) << np.uint64(1))


def encode(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """lat/lon (degrees) → uint64 cell ids at resolution ``res``."""
    x, y = xy_for(lon, lat, res)
    return encode_xy(x, y, res)


def resolution(cell: np.ndarray) -> np.ndarray:
    return (np.asarray(cell, dtype=np.uint64) >> np.uint64(59)).astype(np.int64)


def decode_xy(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cell ids → (x, y, res)."""
    c = np.asarray(cell, dtype=np.uint64)
    res = (c >> np.uint64(59)).astype(np.int64)
    morton = c & ((np.uint64(1) << np.uint64(59)) - np.uint64(1))
    x = _compact(morton).astype(np.int64)
    y = _compact(morton >> np.uint64(1)).astype(np.int64)
    return x, y, res


def cell_center(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """cell ids → (lon, lat) of the cell center, degrees."""
    x, y, res = decode_xy(cell)
    n = (np.int64(1) << res).astype(np.float64)
    lon = (x + 0.5) / n * 360.0 - 180.0
    lat = (y + 0.5) / n * 180.0 - 90.0
    return lon, lat

def cell_bounds(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """cell ids → (lon_min, lat_min, lon_max, lat_max), degrees."""
    x, y, res = decode_xy(cell)
    n = (np.int64(1) << res).astype(np.float64)
    return (x / n * 360.0 - 180.0, y / n * 180.0 - 90.0,
            (x + 1) / n * 360.0 - 180.0, (y + 1) / n * 180.0 - 90.0)


def parent(cell: np.ndarray, parent_res: int) -> np.ndarray:
    """Ancestor of each cell at ``parent_res`` (must be <= cell res)."""
    x, y, res = decode_xy(cell)
    shift = res - np.int64(parent_res)
    if np.any(shift < 0):
        raise ValueError("parent_res must be <= cell resolution")
    return encode_xy(x >> shift, y >> shift, parent_res)


def children(cell: int) -> np.ndarray:
    """The 4 direct children of a single cell (scalar helper)."""
    x, y, res = decode_xy(np.asarray([cell]))
    r = int(res[0]) + 1
    if r > MAX_RES:
        raise ValueError("cell already at max resolution")
    cx, cy = int(x[0]) << 1, int(y[0]) << 1
    xs = np.array([cx, cx + 1, cx, cx + 1], dtype=np.int64)
    ys = np.array([cy, cy, cy + 1, cy + 1], dtype=np.int64)
    return encode_xy(xs, ys, r)


def ring(cell: int, k: int) -> np.ndarray:
    """Cells at Chebyshev grid distance exactly ``k`` from ``cell``.

    Longitude (x) wraps around the antimeridian; latitude (y) is
    clamped (off-grid rows dropped). k=0 returns the cell itself.
    Scalar helper — used for kNN ring expansion where each group
    expands its own home cell.
    """
    x, y, res = decode_xy(np.asarray([cell]))
    r = int(res[0])
    n = 1 << r
    x0, y0 = int(x[0]), int(y[0])
    if k == 0:
        return np.asarray([cell], dtype=np.uint64)
    dxs, dys = [], []
    for dx in range(-k, k + 1):
        for dy in range(-k, k + 1):
            if max(abs(dx), abs(dy)) == k:
                dxs.append(dx)
                dys.append(dy)
    xs = (np.asarray(dxs, dtype=np.int64) + x0) % n
    ys = np.asarray(dys, dtype=np.int64) + y0
    keep = (ys >= 0) & (ys < n)
    return np.unique(encode_xy(xs[keep], ys[keep], r))


def disk(cell: int, k: int) -> np.ndarray:
    """All cells within Chebyshev distance ``k`` (union of rings 0..k)."""
    return np.unique(np.concatenate([ring(cell, i) for i in range(k + 1)]))


def sql_cell_expr(lon_expr: str, lat_expr: str, res: int) -> str:
    """DuckDB SQL computing exactly ``encode(lon, lat, res)``.

    Used to build the driver's correctness oracles: the same magic-mask
    Morton spread as :func:`_spread`, on UBIGINT.
    """
    n = 1 << res

    def spread(v: str) -> str:
        s = f"(({v})::UBIGINT & 4294967295::UBIGINT)"
        for shift, mask in ((16, 0x0000FFFF0000FFFF), (8, 0x00FF00FF00FF00FF),
                            (4, 0x0F0F0F0F0F0F0F0F), (2, 0x3333333333333333),
                            (1, 0x5555555555555555)):
            s = f"(({s} | ({s} << {shift})) & {mask}::UBIGINT)"
        return s

    x = f"least(greatest(floor((({lon_expr}) + 180.0) / 360.0 * {n})::BIGINT, 0), {n - 1})"
    y = f"least(greatest(floor((({lat_expr}) + 90.0) / 180.0 * {n})::BIGINT, 0), {n - 1})"
    return (f"(({res}::UBIGINT << 59) | {spread(x)} | ({spread(y)} << 1))")


# ---- geohash (Niemeyer 2008): the interoperable base32 cell id ----

GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_encode(lon: np.ndarray, lat: np.ndarray,
                   precision: int = 6) -> np.ndarray:
    """Standard geohash strings (lon bit first, base32 alphabet) —
    the interoperable sibling of the quadkey index, for EXPORT to
    external geo systems. Supports even precisions (lon/lat get
    equal bit counts — 5*p/2 each), which keeps the kernel one
    Morton interleave: morton = (spread(gx) << 1) | spread(gy).
    Pure integer ops after the two quantizations, so the SQL twin is
    exact."""
    if precision % 2:
        raise ValueError("geohash_encode supports even precisions")
    half = 5 * precision // 2
    gx = np.floor((np.asarray(lon, np.float64) + 180.0) / 360.0
                  * float(1 << half))
    gy = np.floor((np.asarray(lat, np.float64) + 90.0) / 180.0
                  * float(1 << half))
    gx = np.clip(gx, 0, (1 << half) - 1).astype(np.uint64)
    gy = np.clip(gy, 0, (1 << half) - 1).astype(np.uint64)
    m = (_spread(gx) << np.uint64(1)) | _spread(gy)
    chars = np.frombuffer(GEOHASH32.encode(), dtype="S1")
    out = chars[(m >> np.uint64(5 * (precision - 1)))
                & np.uint64(31)].astype("U1")
    for k in range(1, precision):
        idx = (m >> np.uint64(5 * (precision - 1 - k))) & np.uint64(31)
        out = np.char.add(out, chars[idx.astype(np.int64)]
                          .astype("U1"))
    return out


# ---- Hilbert curve (the locality-preserving partition key) ----

def hilbert_d(x: np.ndarray, y: np.ndarray, order: int) -> np.ndarray:
    """Hilbert-curve distance of integer grid cells (x, y) at the
    given order (grid side 2^order) — the classic iterative
    quadrant-rotate walk (Hilbert 1891; the bitwise form is the
    public-domain Wikipedia xy2d). Pure int64 vector ops, one fixed
    loop over ``order`` levels; better partition locality than the
    Morton interleave for range scans (neighbors stay in one
    contiguous key run through quadrant corners)."""
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros(len(x), dtype=np.int64)
    n = np.int64(1) << np.int64(order)
    s = n >> np.int64(1)
    while s > 0:
        rx = ((x // s) & 1).astype(np.int64)
        ry = ((y // s) & 1).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # canonical rotation flips over the FULL grid (n-1-x), which
        # keeps x, y in [0, n) forever — load-bearing for the SQL
        # twin: a negative x under DuckDB's truncating // would break
        # the (x // s) & 1 bit test
        flip = (ry == 0) & (rx == 1)
        xf = np.where(flip, n - 1 - x, x)
        yf = np.where(flip, n - 1 - y, y)
        swap = ry == 0
        x, y = np.where(swap, yf, xf), np.where(swap, xf, yf)
        s >>= 1
    return d


def sql_hilbert_chain(x_expr: str, y_expr: str, order: int,
                      src_cte: str, carry_cols: str) -> str:
    """Chained-CTE SQL computing exactly ``hilbert_d`` for every row
    of ``src_cte``: one MATERIALIZED round per level (the
    stream_order lesson — un-hinted CTE chains re-inline
    exponentially). ``carry_cols`` are passed through every round;
    the final CTE is ``hil`` with columns carry_cols + hkey."""
    parts = [f"hr0 AS MATERIALIZED (SELECT {carry_cols}, "
             f"({x_expr})::BIGINT AS x, ({y_expr})::BIGINT AS y, "
             f"0::BIGINT AS d FROM {src_cte})"]
    for i in range(order):
        s = 1 << (order - 1 - i)
        rx = f"((x // {s}) & 1)"
        ry = f"((y // {s}) & 1)"
        dd = (f"d + {s * s}::BIGINT * (CASE {rx} * 2 + {ry} "
              "WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 3 "
              "ELSE 2 END)")
        n = 1 << order
        nx = (f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
              f"THEN {n - 1} - y ELSE y END) ELSE x END")
        ny = (f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
              f"THEN {n - 1} - x ELSE x END) ELSE y END")
        parts.append(
            f"hr{i + 1} AS MATERIALIZED (SELECT {carry_cols}, "
            f"{nx} AS x, {ny} AS y, {dd} AS d FROM hr{i})")
    parts.append(f"hil AS (SELECT {carry_cols}, d AS hkey "
                 f"FROM hr{order})")
    return ", ".join(parts)
