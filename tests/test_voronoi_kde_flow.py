"""Nearest-site assignment, KDE heatmap, D8 flow direction."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _points(n=400, seed=3):
    rng = np.random.default_rng(seed)
    lat = np.round(rng.uniform(-80, 80, n), 5)
    lon = np.round(rng.uniform(-170, 170, n), 5)
    return pd.DataFrame({"lat": lat, "lon": lon})


def test_nearest_site_matches_bruteforce(ray_session):
    import ray.data as rd

    from spapy_ray.stages.voronoi import grid_sites, nearest_site

    sid, slat5, slon5 = grid_sites()
    df = _points()
    out = nearest_site(rd.from_pandas(df), sid, slat5, slon5) \
        .to_pandas().sort_values(["lat", "lon"]).reset_index(drop=True)
    lat5 = np.rint(df["lat"].to_numpy() * 1e5).astype(np.int64)
    lon5 = np.rint(df["lon"].to_numpy() * 1e5).astype(np.int64)
    d2 = (lat5[:, None] - slat5[None, :]) ** 2 \
        + (lon5[:, None] - slon5[None, :]) ** 2
    want = pd.DataFrame({"lat": df["lat"], "lon": df["lon"],
                         "site_id": sid[np.argmin(d2, axis=1)],
                         "d2": d2.min(axis=1)}) \
        .sort_values(["lat", "lon"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out[want.columns], want)


def test_site_assignment_stats_tie_breaks_low_id(ray_session):
    import ray.data as rd

    from spapy_ray.stages.voronoi import site_assignment_stats

    # point (3,4) is d2=25 from BOTH (0,0) and (6,8) — exact tie,
    # lowest site id must win
    pts = pd.DataFrame({"lat": [3e-5], "lon": [4e-5]})
    sid = np.array([0, 1], dtype=np.int64)
    slat5 = np.array([0, 6], dtype=np.int64)
    slon5 = np.array([0, 8], dtype=np.int64)
    out = site_assignment_stats(rd.from_pandas(pts), sid, slat5, slon5,
                                d2_div=1).to_pandas()
    assert out["site_id"].tolist() == [0]
    assert out["n_points"].tolist() == [1]
    assert out["sum_d2q"].tolist() == [25]


def test_kde_tile_stats_single_point(ray_session):
    """One point: per-pixel densities recomputed brute force."""
    import ray.data as rd

    from spapy_ray.sources.rasters import RasterMeta
    from spapy_ray.stages.rasterize import kde_tile_stats

    meta = RasterMeta(width=32, height=32, tile_size=16,
                      x_min=-16.0, y_max=16.0, pixel_w=1.0,
                      pixel_h=-1.0)
    pt = pd.DataFrame({"lat": [0.4], "lon": [-0.3]})
    r5, ksc = 300000, 100000
    out = kde_tile_stats(rd.from_pandas(pt), meta, radius_deg=3.0,
                         kscale=ksc).to_pandas()
    # brute force over all 1024 pixel centers
    px = np.arange(32)
    plon5 = -1600000 + px * 100000 + 50000
    plat5 = 1600000 - px * 100000 - 50000
    GLon, GLat = np.meshgrid(plon5, plat5)
    d2 = (GLat - 40000) ** 2 + (GLon - (-30000)) ** 2
    u = np.where(d2 <= r5 * r5, (r5 * r5 - d2) // ksc, 0)
    dens = u * u
    want = {}
    for ty in range(2):
        for tx in range(2):
            blk = dens[ty * 16:(ty + 1) * 16, tx * 16:(tx + 1) * 16]
            if (blk > 0).any():
                want[(tx, ty)] = (int(blk.sum()), int(blk.max()),
                                  int((blk > 0).sum()))
    got = {(int(r.tx), int(r.ty)): (int(r.w_sum), int(r.w_max),
                                    int(r.n_covered))
           for r in out.itertuples()}
    assert got == want and len(want) >= 2


def test_d8_flow_kernel_bruteforce():
    from spapy_ray.stages.raster import D8_OFFSETS, d8_flow_kernel

    rng = np.random.default_rng(11)
    z = rng.integers(0, 50, (10, 12)).astype(np.int32)
    pad = np.pad(z, 1, mode="edge")
    got = d8_flow_kernel(pad)
    for y in range(10):
        for x in range(12):
            best, code = 0, 0
            for k, (dy, dx, wt) in enumerate(D8_OFFSETS):
                ny = min(max(y + dy, 0), 9)
                nx = min(max(x + dx, 0), 11)
                wd = (int(z[y, x]) - int(z[ny, nx])) * wt
                if wd > best:
                    best, code = wd, k + 1
            assert got[y, x] == code, (y, x)


def test_flow_direction_conserves_pixels(ray_session):
    from spapy_ray.sources.rasters import DEM_META, synth_dem_dataset
    from spapy_ray.stages.raster import decode_tile, flow_direction

    dirs = flow_direction(synth_dem_dataset(DEM_META, kind="int"),
                          DEM_META).to_pandas()
    total = 0
    for b in dirs["data"]:
        codes = decode_tile(b, "int32", DEM_META.tile_size)
        assert codes.min() >= 0 and codes.max() <= 8
        total += codes.size
    assert total == DEM_META.width * DEM_META.height


def test_focal_majority_kernel_bruteforce():
    from spapy_ray.stages.raster import focal_majority_kernel

    rng = np.random.default_rng(5)
    z = rng.integers(0, 5, (9, 11)).astype(np.int32)
    pad = np.pad(z, 1, mode="edge")
    got = focal_majority_kernel(pad, 5)
    for y in range(9):
        for x in range(11):
            cnt = np.zeros(5, dtype=int)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    ny = min(max(y + dy, 0), 8)
                    nx = min(max(x + dx, 0), 10)
                    cnt[z[ny, nx]] += 1
            assert got[y, x] == int(np.argmax(cnt)), (y, x)


def test_watershed_matches_bruteforce(ray_session):
    import numpy as np
    import pandas as pd

    from spapy_ray.sources.rasters import (RasterMeta, dem_int_value,
                                           synth_dem_dataset)
    from spapy_ray.stages.raster import D8_OFFSETS, watershed_stats

    meta = RasterMeta(width=128, height=128, tile_size=32,
                      x_min=-180.0, y_max=85.0,
                      pixel_w=360.0 / 128, pixel_h=-170.0 / 128)
    got = watershed_stats(synth_dem_dataset(meta, kind="int"), meta,
                          components_mode="driver").to_pandas() \
        .sort_values(["py", "px"]).reset_index(drop=True)

    # brute force: follow pointers to pits
    W = H = 128
    py, px = np.mgrid[0:H, 0:W]
    z = dem_int_value(px.ravel(), py.ravel()).reshape(H, W) \
        .astype(np.int64)
    pad = np.pad(z, 1, mode="edge")
    wd = np.empty((8, H, W), dtype=np.int64)
    for k, (dy, dx, wt) in enumerate(D8_OFFSETS):
        wd[k] = (z - pad[1 + dy:1 + dy + H, 1 + dx:1 + dx + W]) * wt
    best = wd.max(axis=0)
    code = np.where(best > 0, wd.argmax(axis=0) + 1, 0)
    nxt = (py * W + px).astype(np.int64)
    for k, (dy, dx, _) in enumerate(D8_OFFSETS):
        m = code == k + 1
        nxt[m] = (py[m] + dy) * W + (px[m] + dx)
    ptr = nxt.ravel()
    cur = ptr.copy()
    while True:
        step = ptr[cur]
        if (step == cur).all():
            break
        cur = step
    u, c = np.unique(cur, return_counts=True)
    exp = pd.DataFrame({"px": u % W, "py": u // W,
                        "n_cells": c.astype(np.int64)}) \
        .sort_values(["py", "px"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  exp.astype("int64"))


def test_flow_accumulation_matches_bruteforce(ray_session):
    import numpy as np
    import pandas as pd

    from spapy_ray.sources.rasters import (RasterMeta, dem_int_value,
                                           synth_dem_dataset)
    from spapy_ray.stages.raster import (D8_OFFSETS,
                                         flow_accumulation_stats)

    meta = RasterMeta(width=128, height=128, tile_size=32,
                      x_min=-180.0, y_max=85.0,
                      pixel_w=360.0 / 128, pixel_h=-170.0 / 128)
    got = flow_accumulation_stats(
        synth_dem_dataset(meta, kind="int"), meta,
        components_mode="driver").to_pandas() \
        .sort_values(["ty", "tx"]).reset_index(drop=True)

    W = H = 128
    py, px = np.mgrid[0:H, 0:W]
    z = dem_int_value(px.ravel(), py.ravel()).reshape(H, W) \
        .astype(np.int64)
    pad = np.pad(z, 1, mode="edge")
    wd = np.empty((8, H, W), dtype=np.int64)
    for k, (dy, dx, wt) in enumerate(D8_OFFSETS):
        wd[k] = (z - pad[1 + dy:1 + dy + H, 1 + dx:1 + dx + W]) * wt
    best = wd.max(axis=0)
    code = np.where(best > 0, wd.argmax(axis=0) + 1, 0)
    nxt = (py * W + px).astype(np.int64)
    for k, (dy, dx, _) in enumerate(D8_OFFSETS):
        m = code == k + 1
        nxt[m] = (py[m] + dy) * W + (px[m] + dx)
    ptr = nxt.ravel()
    acc = np.ones(W * H, dtype=np.int64)
    cur = ptr[ptr != np.arange(W * H)]
    while len(cur):
        np.add.at(acc, cur, 1)
        keep = ptr[cur] != cur
        cur = ptr[cur[keep]]
    n = np.arange(W * H)
    df = pd.DataFrame({"tx": (n % W) // 32, "ty": (n // W) // 32,
                       "acc": acc})
    exp = df.groupby(["tx", "ty"])["acc"].agg(
        ["size", "sum", "max"]).reset_index()
    exp.columns = ["tx", "ty", "n_cells", "acc_sum", "acc_max"]
    exp = exp.sort_values(["ty", "tx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns].astype("int64"),
                                  exp.astype("int64"))


def test_flow_length_matches_bruteforce(ray_session):
    import numpy as np
    import pandas as pd

    from spapy_ray.sources.rasters import (RasterMeta, dem_int_value,
                                           synth_dem_dataset)
    from spapy_ray.stages.raster import D8_OFFSETS, flow_length_stats

    meta = RasterMeta(width=128, height=128, tile_size=32,
                      x_min=-180.0, y_max=85.0,
                      pixel_w=360.0 / 128, pixel_h=-170.0 / 128)
    got = flow_length_stats(synth_dem_dataset(meta, kind="int"),
                            meta, components_mode="driver") \
        .to_pandas().sort_values(["ty", "tx"]).reset_index(drop=True)

    W = H = 128
    py, px = np.mgrid[0:H, 0:W]
    z = dem_int_value(px.ravel(), py.ravel()).reshape(H, W) \
        .astype(np.int64)
    pad = np.pad(z, 1, mode="edge")
    wd = np.empty((8, H, W), dtype=np.int64)
    for k, (dy, dx, wt) in enumerate(D8_OFFSETS):
        wd[k] = (z - pad[1 + dy:1 + dy + H, 1 + dx:1 + dx + W]) * wt
    code = np.where(wd.max(axis=0) > 0, wd.argmax(axis=0) + 1, 0)
    nxt = (py * W + px).astype(np.int64)
    for k, (dy, dx, _) in enumerate(D8_OFFSETS):
        m = code == k + 1
        nxt[m] = (py[m] + dy) * W + (px[m] + dx)
    ptr = nxt.ravel()
    steps = np.zeros(W * H, dtype=np.int64)
    origin = np.flatnonzero(ptr != np.arange(W * H))
    cur = ptr[origin]
    steps[origin] = 1
    while len(origin):
        alive = ptr[cur] != cur
        origin = origin[alive]
        cur = ptr[cur[alive]]
        steps[origin] += 1
    n = np.arange(W * H)
    df = pd.DataFrame({"tx": (n % W) // 32, "ty": (n // W) // 32,
                       "s": steps})
    exp = df.groupby(["tx", "ty"])["s"].agg(
        ["size", "sum", "max"]).reset_index()
    exp.columns = ["tx", "ty", "n_cells", "len_sum", "len_max"]
    exp = exp.sort_values(["ty", "tx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns].astype("int64"),
                                  exp.astype("int64"))
