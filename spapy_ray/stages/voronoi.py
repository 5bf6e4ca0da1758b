"""Nearest-site (discrete Voronoi) assignment.

Assign every point to its nearest site from a small site table — the
Voronoi-partition / nearest-facility operator class (absent from the
reference, which has no site-assignment or nearest-feature op). At
engine scale this is the classic broadcast pattern: the site table is
tiny (10²–10⁴ rows) and ships once per worker inside the task
closure; each batch runs a running-min loop over sites in exact 1e-5
fixed-point int64 (O(n) memory — see _assign_min for why not an
[n × k] matrix). No shuffle at all for the assignment itself; the
per-site rollup is one combiner-style groupby over ≤ n_sites rows
per block.

Determinism: distances are exact integers; ties break to the LOWEST
site id (sites are sorted by id, np.argmin takes the first minimum) —
the same total order as SQL's ``ORDER BY d2, site_id``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from spapy_ray.util import cluster_cpus


def grid_sites(n_rows: int = 8, n_cols: int = 8):
    """The deterministic 8x8 world site lattice used by the oracled
    query: site s at row s//n_cols, col s%n_cols, centers spaced
    evenly inside lat ±85° / lon ±180° (exact 1e-5 ints)."""
    s = np.arange(n_rows * n_cols, dtype=np.int64)
    lat_step = 17_000_000 // n_rows
    lon_step = 36_000_000 // n_cols
    lat5 = (s // n_cols) * lat_step + lat_step // 2 - 8_500_000
    lon5 = (s % n_cols) * lon_step + lon_step // 2 - 18_000_000
    return s, lat5, lon5


def _assign_min(lat5: np.ndarray, lon5: np.ndarray, slat: np.ndarray,
                slon: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(best site index, best d2) per point: a running-min loop over
    sites with four reused n-vectors instead of an [n × k] matrix —
    the matrix form allocates O(n·k) fresh pages per batch (a measured
    100× slowdown under memory pressure) and caps k at what fits in a
    worker; the loop is O(n) memory at identical op count. Strict
    ``<`` keeps the earliest (lowest-id) site on exact ties."""
    n = len(lat5)
    t = np.empty(n, dtype=np.int64)
    d = np.empty(n, dtype=np.int64)
    best = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    j = np.zeros(n, dtype=np.int64)
    m = np.empty(n, dtype=bool)
    for k in range(len(slat)):
        np.subtract(lat5, slat[k], out=d)
        np.multiply(d, d, out=d)
        np.subtract(lon5, slon[k], out=t)
        np.multiply(t, t, out=t)
        np.add(d, t, out=d)
        np.less(d, best, out=m)
        j[m] = k
        np.minimum(best, d, out=best)
    return j, best


def nearest_site(ds, site_ids: np.ndarray, site_lat5: np.ndarray,
                 site_lon5: np.ndarray, *, lat_col: str = "lat",
                 lon_col: str = "lon", keep_cols: list[str] | None = None):
    """Point Dataset → same rows + (site_id, d2) of the nearest site.

    Exact int64 fixed-point squared planar distance; ties → lowest
    site id. Sites must be sorted by id (asserted)."""
    from spapy_ray.stages.distjoin import _fixed5

    if not (np.diff(site_ids) > 0).all():
        raise ValueError("site_ids must be strictly increasing "
                         "(argmin tie-break contract)")
    sid = np.asarray(site_ids, dtype=np.int64)
    slat = np.asarray(site_lat5, dtype=np.int64)
    slon = np.asarray(site_lon5, dtype=np.int64)
    keep = keep_cols

    def assign(t: pa.Table) -> pa.Table:
        lat5 = _fixed5(t.column(lat_col))
        lon5 = _fixed5(t.column(lon_col))
        j, best = _assign_min(lat5, lon5, slat, slon)
        base = t.select(keep) if keep is not None else t
        base = base.append_column("site_id", pa.array(sid[j]))
        return base.append_column("d2", pa.array(best))

    return ds.map_batches(assign, batch_format="pyarrow",
                          batch_size=16384)


def site_assignment_stats(ds, site_ids: np.ndarray,
                          site_lat5: np.ndarray, site_lon5: np.ndarray,
                          *, lat_col: str = "lat", lon_col: str = "lon",
                          d2_div: int = 10_000):
    """Per-site rollup of the nearest-site assignment: (site_id,
    n_points, sum_d2q) with d2 pre-divided by ``d2_div`` (floor) so
    the sum stays far from int64 at 10⁹-point scale. Combiner shape:
    each block folds to ≤ n_sites partial rows before ONE tiny
    groupby — shuffle volume is O(blocks × sites), independent of
    the point count."""
    from spapy_ray.stages.distjoin import _fixed5

    if not (np.diff(site_ids) > 0).all():
        raise ValueError("site_ids must be strictly increasing")
    sid = np.asarray(site_ids, dtype=np.int64)
    slat = np.asarray(site_lat5, dtype=np.int64)
    slon = np.asarray(site_lon5, dtype=np.int64)
    k = len(sid)

    def partial(t: pa.Table) -> pa.Table:
        lat5 = _fixed5(t.column(lat_col))
        lon5 = _fixed5(t.column(lon_col))
        j, best = _assign_min(lat5, lon5, slat, slon)
        best //= d2_div
        n = np.bincount(j, minlength=k)
        # exact int64 partial sums (bincount weights= would sum in
        # float64 — only exact below 2^53)
        s_int = np.zeros(k, dtype=np.int64)
        np.add.at(s_int, j, best)
        nz = n > 0
        return pa.table({"site_id": pa.array(sid[nz]),
                         "n_points": pa.array(n[nz].astype(np.int64)),
                         "sum_d2q": pa.array(s_int[nz])})

    from ray.data.aggregate import Sum

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=16384)
    return parts.groupby("site_id").aggregate(
        Sum(on="n_points", alias_name="n_points"),
        Sum(on="sum_d2q", alias_name="sum_d2q"))
