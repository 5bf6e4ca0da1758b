"""Spatial autocorrelation statistics over regular grids.

Join-count statistics (Cliff & Ord 1981) — the categorical form of
spatial autocorrelation: classify every rook-adjacent cell pair of a
regular grid as BB (both occupied), BW (mixed) or WW (both empty) and
compare against the random-labeling expectation. The classic first
question about any geocoded web corpus: is page density spatially
clustered? The reference has no spatial statistics at all.

All counts are exact integers, so the whole statistic is bit-exact
against a SQL twin.

Distributed shape: points fold to occupied-cell counts with ONE
hash(cell) bucket shuffle; adjacency needs no grid materialization —
each black cell emits its east/south neighbor keys, and a second
small bucket shuffle pairs them with the base cells (a pair exists
iff the neighbor key hits a black cell). BW then falls out of the
degree identity  sum(deg(b)) = 2·BB + BW  (deg = in-domain rook
neighbors, local arithmetic per cell), and WW = pairs − BB − BW.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def grid_join_counts(geo, *, lon_col: str = "lon",
                     lat_col: str = "lat", nx: int = 360,
                     ny: int = 170, x_min: float = -180.0,
                     y_min: float = -85.0, step: float = 1.0,
                     min_count: int = 1,
                     buckets: int | None = None):
    """Rook join-count statistics of the ``>= min_count`` occupancy
    grid. Returns a single-row Dataset(n_cells, n_pairs, n_black,
    bb, bw, ww) — all int64, exact.
    """
    from spapy_ray.stages.relational import bucketed_group_agg

    def cells_of(t: pa.Table) -> pa.Table:
        lon = t.column(lon_col).to_numpy(zero_copy_only=False)
        lat = t.column(lat_col).to_numpy(zero_copy_only=False)
        gx = np.floor((lon - x_min) / step).astype(np.int64)
        gy = np.floor((lat - y_min) / step).astype(np.int64)
        ok = (gx >= 0) & (gx < nx) & (gy >= 0) & (gy < ny)
        cell = gy[ok] * nx + gx[ok]
        # per-batch partial counts (combiner)
        u, c = np.unique(cell, return_counts=True)
        return pa.table({"cell": pa.array(u), "n": pa.array(c)})

    def black_local(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("cell", sort=False)["n"].sum()
        s = s[s >= min_count]
        return pd.DataFrame({"cell": s.index.to_numpy(dtype=np.int64)})

    black = bucketed_group_agg(
        geo.map_batches(cells_of, batch_format="pyarrow"), "cell",
        black_local, buckets=buckets)

    def emit_pair_probes(t: pa.Table) -> pa.Table:
        cell = t.column("cell").to_numpy(zero_copy_only=False)
        gx = cell % nx
        gy = cell // nx
        base = pa.table({
            "k": pa.array(cell),
            "t": pa.array(np.zeros(len(cell), dtype=np.int64)),
            # degree of each black cell (in-domain rook neighbors),
            # carried on the base row for the BW identity
            "deg": pa.array((gx > 0).astype(np.int64)
                            + (gx < nx - 1) + (gy > 0)
                            + (gy < ny - 1))})
        e = cell[gx < nx - 1] + 1
        s = cell[gy < ny - 1] + nx
        probes = np.concatenate([e, s])
        probe = pa.table({
            "k": pa.array(probes),
            "t": pa.array(np.ones(len(probes), dtype=np.int64)),
            "deg": pa.array(np.zeros(len(probes), dtype=np.int64))})
        return pa.concat_tables([base, probe])

    def pair_local(g: pd.DataFrame) -> pd.DataFrame:
        # per cell: a probe row pairs iff the base (black) row exists
        is_base = g["t"].to_numpy() == 0
        base_cells = g.loc[is_base, "k"]
        probe_ct = g.loc[~is_base].groupby("k", sort=False).size()
        bb = int(probe_ct[probe_ct.index.isin(base_cells)].sum())
        return pd.DataFrame({"bb": [bb],
                             "degsum": [int(g["deg"].sum())],
                             "n_black": [int(is_base.sum())]})

    parts = bucketed_group_agg(
        black.map_batches(emit_pair_probes, batch_format="pyarrow"),
        "k", pair_local, buckets=buckets)

    n_pairs = (nx - 1) * ny + nx * (ny - 1)

    def fold(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sum()
        bb = int(df["bb"])
        bw = int(df["degsum"]) - 2 * bb
        n_black = int(df["n_black"])
        return pa.table({
            "n_cells": pa.array([nx * ny], pa.int64()),
            "n_pairs": pa.array([n_pairs], pa.int64()),
            "n_black": pa.array([n_black], pa.int64()),
            "bb": pa.array([bb], pa.int64()),
            "bw": pa.array([bw], pa.int64()),
            "ww": pa.array([n_pairs - bb - bw], pa.int64())})

    return parts.repartition(1).map_batches(fold,
                                            batch_format="pyarrow",
                                            batch_size=None)
