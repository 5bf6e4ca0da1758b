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


def moran_i(ds, meta, *, dtype: str = "int32", q: int = 10 ** 6,
            block: int | None = None):
    """Global Moran's I (Moran 1950, Cliff & Ord 1981) of an integer
    raster under rook adjacency (binary weights, no row
    standardization) — the continuous-value complement of
    :func:`grid_join_counts`. The reference has no spatial
    statistics; this fills the classic "is the surface spatially
    clustered?" question over the tile table.

    Everything is exact: with x-bar = S/N multiplied out,

        num·N² = N²·ΣΣ w_ij x_i x_j − 2·N·S·Σ deg_i x_i + S²·W
        den·N² = N·(N·Σx² − S²)
        I      = (N / W) · num / den

    so the statistic is a ratio of big integers; ``moran_q`` is
    trunc(q·N·num / (W·den)) with truncation TOWARD ZERO (matching
    DuckDB's ``//``; Python's ``//`` floors, hence sign·(abs//abs)).

    Distributed shape: ONE 1-px halo exchange into super-block
    buckets (the raster.py mosaic machinery — east/south neighbor
    products never materialize a shifted raster), one tiny partial
    row per bucket, constant-size driver fold.
    """
    from spapy_ray.stages.raster import (_auto_block, _block_mosaic_tiles,
                                         _halo_block_rows)

    T = meta.tile_size
    if meta.width % T or meta.height % T:
        raise ValueError("moran_i requires tile-aligned rasters")
    block = block or _auto_block(meta)
    tagged = ds.map_batches(
        lambda t: _halo_block_rows(t, meta, dtype, block),
        batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        mosaic, tx0, ty0, _tiles = _block_mosaic_tiles(g, meta, dtype,
                                                       block)
        a = mosaic[1:-1, 1:-1].astype(np.int64)
        at_l = tx0 == 0
        at_t = ty0 == 0
        at_r = (tx0 * T + a.shape[1]) == meta.width
        at_b = (ty0 * T + a.shape[0]) == meta.height
        east = mosaic[1:-1, 2:].astype(np.int64)
        south = mosaic[2:, 1:-1].astype(np.int64)
        pe = int((a[:, :-1] * east[:, :-1]).sum()) if at_r \
            else int((a * east).sum())
        ps = int((a[:-1, :] * south[:-1, :]).sum()) if at_b \
            else int((a * south).sum())
        s = int(a.sum())
        d = 4 * s
        if at_l:
            d -= int(a[:, 0].sum())
        if at_r:
            d -= int(a[:, -1].sum())
        if at_t:
            d -= int(a[0, :].sum())
        if at_b:
            d -= int(a[-1, :].sum())
        return pd.DataFrame({
            "n": [a.size], "s": [s], "ss": [int((a * a).sum())],
            "p": [pe + ps], "d": [d]})

    parts = tagged.groupby("bk__").map_groups(
        per_bucket, batch_format="pandas").to_pandas()
    n = int(parts["n"].sum())
    s = int(parts["s"].sum())
    ss = int(parts["ss"].sum())
    p_und = int(parts["p"].sum())
    d_deg = int(parts["d"].sum())
    w_dir = 2 * ((meta.width - 1) * meta.height
                 + meta.width * (meta.height - 1))
    num = n * n * 2 * p_und - 2 * n * s * d_deg + s * s * w_dir
    den = n * (n * ss - s * s)
    aa, bb = q * n * num, w_dir * den
    moran_q = (1 if aa >= 0 else -1) * (abs(aa) // bb) if bb else 0
    return pd.DataFrame({
        "n_pix": [n], "w_dir": [w_dir], "s_sum": [s], "ss_sum": [ss],
        "p_und": [p_und], "d_deg": [d_deg],
        "moran_q": [moran_q]}).astype(np.int64)


def directional_variogram(ds, meta, *, lags: int = 8,
                          dtype: str = "int32", q: int = 10 ** 6,
                          block: int | None = None):
    """Empirical directional semivariogram (Matheron 1963) of an
    integer raster: for each lag h = 1..lags and axis x / y,

        gamma(h) = sum (z(p + h·e) - z(p))² / (2 · n_pairs)

    over every in-raster pixel pair at offset h along the axis.
    Integer ssd / counts are exact; ``gamma_q`` = trunc(q·ssd/(2n)).

    Distributed shape — the moran/stencil halo generalized to width
    ``lags``: pairs at offset +h only ever look EAST or SOUTH, so a
    tile on a super-block's west/north boundary ships its first
    ``lags`` columns (rows) to the neighboring block — strips only,
    no corners, ONE shuffle. Each bucket mosaics its tiles plus the
    two aprons and folds all ``2·lags`` partials vectorized (one
    whole-mosaic subtract per lag); the exchange is O(perimeter ·
    lags), the output 2·lags rows.
    """
    from ray.data.aggregate import Sum

    from spapy_ray.stages.raster import _auto_block, decode_tile

    T = meta.tile_size
    if meta.width % T or meta.height % T:
        raise ValueError("directional_variogram requires tile-aligned "
                         "rasters")
    if lags > T:
        raise ValueError("lags must be <= tile_size (one-ring strips)")
    block = block or _auto_block(meta)
    L = lags

    def tag(t: pa.Table) -> pa.Table:
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        out = {"bk__": [], "tx": [], "ty": [], "kind": [], "data": []}
        for i, buf in enumerate(t.column("data").to_pylist()):
            tx, ty = int(txs[i]), int(tys[i])
            own = ((tx // block) << 32) | (ty // block)
            out["bk__"].append(own)
            out["tx"].append(tx)
            out["ty"].append(ty)
            out["kind"].append(0)
            out["data"].append(buf)
            a = None
            if tx % block == 0 and tx > 0:      # west strip -> west block
                a = decode_tile(buf, dtype, T)
                out["bk__"].append((((tx - 1) // block) << 32)
                                   | (ty // block))
                out["tx"].append(tx)
                out["ty"].append(ty)
                out["kind"].append(1)
                out["data"].append(
                    np.ascontiguousarray(a[:, :L]).tobytes())
            if ty % block == 0 and ty > 0:      # north strip -> north block
                if a is None:
                    a = decode_tile(buf, dtype, T)
                out["bk__"].append(((tx // block) << 32)
                                   | (((ty - 1) // block)))
                out["tx"].append(tx)
                out["ty"].append(ty)
                out["kind"].append(2)
                out["data"].append(
                    np.ascontiguousarray(a[:L, :]).tobytes())
        return pa.table({
            "bk__": pa.array(out["bk__"], type=pa.int64()),
            "tx": pa.array(out["tx"], type=pa.int32()),
            "ty": pa.array(out["ty"], type=pa.int32()),
            "kind": pa.array(out["kind"], type=pa.int8()),
            "data": pa.array(out["data"], type=pa.binary())})

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        txs = g["tx"].to_numpy()
        tys = g["ty"].to_numpy()
        kinds = g["kind"].to_numpy()
        datas = g["data"].to_numpy()
        core = kinds == 0
        bx = int(txs[core][0]) // block
        by = int(tys[core][0]) // block
        tx0, ty0 = bx * block, by * block
        nx = min(block, meta.tiles_x - tx0)
        ny = min(block, meta.tiles_y - ty0)
        dt = np.dtype(dtype).newbyteorder("<")
        z = np.zeros((ny * T + L, nx * T + L), dtype=np.int64)
        has_e = tx0 + nx < meta.tiles_x
        has_s = ty0 + ny < meta.tiles_y
        for k in range(len(g)):
            tx, ty, kind = int(txs[k]), int(tys[k]), int(kinds[k])
            if kind == 0:
                a = np.frombuffer(datas[k], dtype=dt).reshape(T, T)
                z[(ty - ty0) * T:(ty - ty0) * T + T,
                  (tx - tx0) * T:(tx - tx0) * T + T] = a
            elif kind == 1:                     # east apron strip
                a = np.frombuffer(datas[k], dtype=dt).reshape(T, L)
                z[(ty - ty0) * T:(ty - ty0) * T + T,
                  nx * T:nx * T + L] = a
            else:                               # south apron strip
                a = np.frombuffer(datas[k], dtype=dt).reshape(L, T)
                z[ny * T:ny * T + L,
                  (tx - tx0) * T:(tx - tx0) * T + T] = a
        rows = []
        cw, ch = nx * T, ny * T                 # core extent in pixels
        for h in range(1, L + 1):
            xmax = cw if has_e else cw - h
            d = z[:ch, h:h + xmax] - z[:ch, :xmax]
            rows.append(("x", h, ch * xmax, int((d * d).sum())))
            ymax = ch if has_s else ch - h
            d = z[h:h + ymax, :cw] - z[:ymax, :cw]
            rows.append(("y", h, ymax * cw, int((d * d).sum())))
        return pd.DataFrame(rows, columns=["dir", "h", "n", "ssd"])

    parts = tagged.groupby("bk__").map_groups(per_bucket,
                                              batch_format="pandas")
    out = parts.groupby(["dir", "h"]).aggregate(
        Sum("n", alias_name="n_pairs"), Sum("ssd", alias_name="ssd")) \
        .to_pandas()
    out["gamma_q"] = (q * out["ssd"]) // (2 * out["n_pairs"])
    for c in ("h", "n_pairs", "ssd", "gamma_q"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["dir", "h"]).reset_index(drop=True)


def local_moran_tiles(ds, meta, *, dtype: str = "int32",
                      q: int = 10 ** 6, block: int | None = None):
    """Tile-aggregated local Moran's I (Anselin 1995 LISA, rolled up
    to the tile grid — the hotspot-detection output layer). For tile
    t, with directed rook pairs anchored at i ∈ t:

        num_t·N² = N²·Σ x_i x_j − N·S·(d_t + nb_t) + S²·g_t
        lisa_q_t = trunc(q · num_t·N² / (N·(N·SS − S²)))

    where d_t = Σ deg_i·x_i, nb_t = Σ_i Σ_j x_j, g_t = Σ deg_i —
    i.e. Σ_{i∈t}(x_i−x̄)·Σ_{j~i}(x_j−x̄) over the global variance,
    all exact integers (Σ_t num_t reproduces the global Moran
    numerator). Positive lisa_q = hot/cold cluster tile, negative =
    spatial outlier tile.

    Distributed shape: the SAME single 1-px halo exchange as
    moran_i; per bucket every per-tile reduction is one
    reshape(ny,T,nx,T).sum((1,3)) — no per-tile Python. Global
    (N, S, SS) fold first (tiny), broadcast into the final map.
    """
    import ray

    from spapy_ray.stages.raster import (_auto_block,
                                         _block_mosaic_tiles,
                                         _halo_block_rows)

    T = meta.tile_size
    if meta.width % T or meta.height % T:
        raise ValueError("local_moran_tiles requires tile-aligned "
                         "rasters")
    block = block or _auto_block(meta)
    tagged = ds.map_batches(
        lambda t: _halo_block_rows(t, meta, dtype, block),
        batch_format="pyarrow").materialize()

    def per_bucket_parts(g: pd.DataFrame) -> pd.DataFrame:
        mosaic, tx0, ty0, _tiles = _block_mosaic_tiles(g, meta, dtype,
                                                       block)
        a = mosaic[1:-1, 1:-1].astype(np.int64)
        ph, pw = a.shape
        ny, nx = ph // T, pw // T
        at_l, at_t = tx0 == 0, ty0 == 0
        at_r = (tx0 * T + pw) == meta.width
        at_b = (ty0 * T + ph) == meta.height
        e = mosaic[1:-1, 2:].astype(np.int64)
        w = mosaic[1:-1, :-2].astype(np.int64)
        n = mosaic[:-2, 1:-1].astype(np.int64)
        s = mosaic[2:, 1:-1].astype(np.int64)
        deg = np.full_like(a, 4)
        if at_r:
            e[:, -1] = 0
            deg[:, -1] -= 1
        if at_l:
            w[:, 0] = 0
            deg[:, 0] -= 1
        if at_t:
            n[0, :] = 0
            deg[0, :] -= 1
        if at_b:
            s[-1, :] = 0
            deg[-1, :] -= 1
        nbr = e + w + n + s

        def tsum(m):
            return m.reshape(ny, T, nx, T).sum(axis=(1, 3)).ravel()

        tys, txs = np.divmod(np.arange(ny * nx), nx)
        return pd.DataFrame({
            "tx": (tx0 + txs).astype(np.int64),
            "ty": (ty0 + tys).astype(np.int64),
            "n_pix": np.full(ny * nx, T * T, dtype=np.int64),
            "s_sum": tsum(a), "ss_sum": tsum(a * a),
            "p_dir": tsum(a * nbr), "nb_sum": tsum(nbr),
            "d_deg": tsum(deg * a), "g_deg": tsum(deg)})

    parts = tagged.groupby("bk__").map_groups(
        per_bucket_parts, batch_format="pandas").to_pandas()
    N = int(parts["n_pix"].sum())
    S = int(parts["s_sum"].sum())
    SS = int(parts["ss_sum"].sum())
    den = N * (N * SS - S * S)

    def lq(p, nb, d, gg):
        num = N * N * int(p) - N * S * (int(d) + int(nb)) \
            + S * S * int(gg)
        a_, b_ = q * num, den
        return 0 if b_ == 0 else \
            (1 if (a_ >= 0) == (b_ >= 0) else -1) \
            * (abs(a_) // abs(b_))

    parts["lisa_q"] = [
        lq(p, nb, d, gg) for p, nb, d, gg in
        zip(parts["p_dir"], parts["nb_sum"], parts["d_deg"],
            parts["g_deg"])]
    parts["lisa_q"] = parts["lisa_q"].astype(np.int64)
    out = parts[["tx", "ty", "n_pix", "s_sum", "ss_sum", "p_dir",
                 "nb_sum", "d_deg", "g_deg", "lisa_q"]]
    return out.sort_values(["ty", "tx"]).reset_index(drop=True) \
        .astype(np.int64)


def geary_c(ds, meta, *, dtype: str = "int32", q: int = 10 ** 6,
            block: int | None = None):
    """Global Geary's C (Geary 1954) of an integer raster under rook
    adjacency (binary weights) — Moran's sibling that measures
    squared LOCAL differences instead of cross-products, so it is
    more sensitive to small-scale dissimilarity (C < 1 clustered,
    C = 1 random, C > 1 dispersed).

    Exact integer form (variance multiplied out by N):

        C = (N-1) * sum_directed (x_i - x_j)^2 / (2 W var_sum)
          = N * (N-1) * p_sq / (W * (N*ss - s^2))

    with p_sq the UNDIRECTED rook squared-difference sum, W the
    directed weight count. geary_q = trunc(q * C) toward zero
    (DuckDB ``//`` convention; C >= 0 so floor == trunc here, the
    sign guard kept for uniformity with moran_i).

    Distributed shape: identical to moran_i — ONE 1-px halo exchange
    into super-block buckets, a 5-int partial row per bucket, a
    constant driver fold.
    """
    from spapy_ray.stages.raster import (_auto_block,
                                         _block_mosaic_tiles,
                                         _halo_block_rows)

    T = meta.tile_size
    if meta.width % T or meta.height % T:
        raise ValueError("geary_c requires tile-aligned rasters")
    block = block or _auto_block(meta)
    tagged = ds.map_batches(
        lambda t: _halo_block_rows(t, meta, dtype, block),
        batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        mosaic, tx0, ty0, _tiles = _block_mosaic_tiles(g, meta, dtype,
                                                       block)
        a = mosaic[1:-1, 1:-1].astype(np.int64)
        at_r = (tx0 * T + a.shape[1]) == meta.width
        at_b = (ty0 * T + a.shape[0]) == meta.height
        east = mosaic[1:-1, 2:].astype(np.int64)
        south = mosaic[2:, 1:-1].astype(np.int64)
        de = a[:, :-1] - east[:, :-1] if at_r else a - east
        ds_ = a[:-1, :] - south[:-1, :] if at_b else a - south
        return pd.DataFrame({
            "n": [a.size], "s": [int(a.sum())],
            "ss": [int((a * a).sum())],
            "psq": [int((de * de).sum()) + int((ds_ * ds_).sum())]})

    parts = tagged.groupby("bk__").map_groups(
        per_bucket, batch_format="pandas").to_pandas()
    n = int(parts["n"].sum())
    s = int(parts["s"].sum())
    ss = int(parts["ss"].sum())
    p_sq = int(parts["psq"].sum())
    w_dir = 2 * ((meta.width - 1) * meta.height
                 + meta.width * (meta.height - 1))
    aa = q * n * (n - 1) * p_sq
    bb = w_dir * (n * ss - s * s)
    geary_q = (1 if aa >= 0 else -1) * (abs(aa) // bb) if bb else 0
    return pd.DataFrame({
        "n_pix": [n], "w_dir": [w_dir], "s_sum": [s], "ss_sum": [ss],
        "p_sq": [p_sq], "geary_q": [geary_q]}).astype(np.int64)


def trajectory_stats(ds, key_col: str, order_cols: list[str],
                     x_col: str = "lon5", y_col: str = "lat5",
                     buckets: int | None = None):
    """Per-key trajectory statistics over ordered integer points —
    the centrography of MOTION (trajectory mining: path length, net
    displacement, radius of gyration), exact to the last bit:

      l1_path  = sum of |dx| + |dy| over consecutive points
      net_l1   = |last - first| (L1)
      gyr_q    = floor[(n*S2 - Sx^2 - Sy^2) / n^2], the per-point
                 variance about the centroid (shift-invariant, so
                 points anchor to the key's FIRST point; the squared
                 anchored deltas accumulate in (hi, lo) 2^31 limbs so
                 int64 never overflows, and the final fold runs in
                 vectorized Python bigints on the per-key table).

    ONE hash shuffle on key; each bucket resolves all of its keys in
    one lexsorted vectorized pass (no per-key Python).
    """
    from spapy_ray.stages.relational import bucketed_group_agg

    sort_cols = [key_col] + order_cols

    def local(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({key_col: [], "n_points": [],
                                 "l1_path": [], "net_l1": [],
                                 "gyr_q": []})
        df = df.sort_values(sort_cols, kind="stable")
        k = df[key_col].to_numpy()
        x = df[x_col].to_numpy().astype(np.int64)
        y = df[y_col].to_numpy().astype(np.int64)
        first = np.r_[True, k[1:] != k[:-1]]
        gid = np.cumsum(first) - 1
        nh = int(gid[-1]) + 1
        fi = np.nonzero(first)[0]
        li = np.r_[fi[1:] - 1, len(k) - 1]
        n = np.diff(np.r_[fi, len(k)]).astype(np.int64)

        valid = ~first[1:]
        step = (np.abs(np.diff(x)) + np.abs(np.diff(y)))[valid]
        path = np.zeros(nh, dtype=np.int64)
        np.add.at(path, gid[1:][valid], step)

        net = np.abs(x[li] - x[fi]) + np.abs(y[li] - y[fi])

        ax = x - x[fi][gid]
        ay = y - y[fi][gid]
        sdx = np.zeros(nh, dtype=np.int64)
        sdy = np.zeros(nh, dtype=np.int64)
        np.add.at(sdx, gid, ax)
        np.add.at(sdy, gid, ay)
        s2 = ax * ax + ay * ay          # <= 2.6e15 per element
        shi = np.zeros(nh, dtype=np.int64)
        slo = np.zeros(nh, dtype=np.int64)
        np.add.at(shi, gid, s2 >> 31)
        np.add.at(slo, gid, s2 & ((1 << 31) - 1))
        stot = shi.astype(object) * (1 << 31) + slo
        num = n.astype(object) * stot \
            - sdx.astype(object) ** 2 - sdy.astype(object) ** 2
        gyr = (num // (n.astype(object) * n)).astype(np.int64)

        return pd.DataFrame({key_col: k[fi], "n_points": n,
                             "l1_path": path, "net_l1": net,
                             "gyr_q": gyr})

    return bucketed_group_agg(ds, key_col, local, buckets=buckets)


def stay_points(ds, key_col: str, order_cols: list[str],
                x_col: str = "lon5", y_col: str = "lat5", *,
                radius: int, min_pts: int = 2, ts_col: str | None = None,
                buckets: int | None = None):
    """Stay-point detection over ordered integer trajectories (Li et
    al. 2008's GPS stay points, recast for the crawl-as-trajectory
    view): walk each key's points in ``order_cols`` order and start a
    new segment whenever the L1 step from the previous point exceeds
    ``radius`` (fixed-point units, integer-exact predicate); segments
    with >= ``min_pts`` points are stays.

    seg_id is the 1-based ordinal of the segment within its key
    COUNTING dropped (short) segments — the same running sum of break
    flags a SQL window computes, so the twin needs no re-ranking after
    its HAVING.

    ONE hash shuffle on key (bucketed_group_agg); each bucket resolves
    all of its keys in one lexsorted vectorized pass: break flags →
    cumsum segment labels → np.add.reduceat folds per segment. Returns
    Dataset(key, seg_id, n_points, dwell_us, sum_x, sum_y) where
    dwell_us = max - min of ``ts_col`` within the segment (default
    ts_col: order_cols[0]; the reduceat max/min form matches the SQL
    twin's max(us)-min(us) even for a ts_col that is not monotone in
    the sort order, and can never go negative) and sum_x/sum_y are
    exact integer centroid numerators.
    """
    from spapy_ray.stages.relational import bucketed_group_agg

    sort_cols = [key_col] + order_cols
    tcol = ts_col or order_cols[0]
    out_cols = [key_col, "seg_id", "n_points", "dwell_us",
                "sum_x", "sum_y"]

    def local(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({c: [] for c in out_cols}) \
                .astype({c: np.int64 for c in out_cols[1:]})
        df = df.sort_values(sort_cols, kind="stable")
        k = df[key_col].to_numpy()
        ts = df[tcol].to_numpy().astype(np.int64)
        x = df[x_col].to_numpy().astype(np.int64)
        y = df[y_col].to_numpy().astype(np.int64)
        newkey = np.r_[True, k[1:] != k[:-1]]
        step = np.r_[np.int64(0),
                     np.abs(np.diff(x)) + np.abs(np.diff(y))]
        brk = newkey | (step > radius)
        seg = np.cumsum(brk) - 1              # bucket-global label
        si = np.nonzero(brk)[0]               # first row per segment
        n = np.diff(np.r_[si, len(k)]).astype(np.int64)
        sum_x = np.add.reduceat(x, si)
        sum_y = np.add.reduceat(y, si)
        # max-min per segment (not last-first in sort order): exact
        # for a non-monotone ts_col too, like the twin's max-min
        dwell = np.maximum.reduceat(ts, si) - np.minimum.reduceat(ts, si)
        # per-key 1-based ordinal over the segment table
        knew = newkey[si]                     # segment starts new key
        kfi = np.nonzero(knew)[0]
        seg_id = np.arange(len(si), dtype=np.int64) \
            - kfi[np.cumsum(knew) - 1] + 1
        keep = n >= min_pts
        return pd.DataFrame({
            key_col: k[si][keep], "seg_id": seg_id[keep],
            "n_points": n[keep], "dwell_us": dwell[keep],
            "sum_x": sum_x[keep], "sum_y": sum_y[keep]})

    proj = list(dict.fromkeys(
        [key_col, *order_cols, tcol, x_col, y_col]))
    return bucketed_group_agg(ds.select_columns(proj), key_col, local,
                              buckets=buckets)
