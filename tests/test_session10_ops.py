"""Brute-force parity for the session-10 stages (the query suite
already hash-checks them against DuckDB at two scales; these pin the
kernels against tiny sequential references)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _mk_ds(tbl: pa.Table):
    import ray.data as rd

    return rd.from_arrow(tbl)


def test_sssp_matches_bruteforce(ray_session):
    from spapy_ray.stages.graph import sssp_minplus

    rng = np.random.RandomState(7)
    m = 60
    a = rng.randint(0, 25, m).astype(np.int64)
    b = rng.randint(0, 25, m).astype(np.int64)
    keep = a != b
    a, b = a[keep], b[keep]
    pairs = _mk_ds(pa.table({"a": pa.array(a), "b": pa.array(b)}))
    sources = np.array([0, 1, 2], dtype=np.int64)
    rounds = 4
    got = sssp_minplus(pairs, sources, rounds=rounds)

    # sequential synchronous Bellman-Ford, <= rounds edges
    INF = 1 << 60
    nodes = np.unique(np.concatenate([a, b, sources]))
    dist = {int(n): INF for n in nodes}
    for s in sources:
        dist[int(s)] = 0
    edges = set()
    for u, v in zip(a, b):
        edges.add((int(min(u, v)), int(max(u, v))))
    und = [(u, v) for u, v in edges] + [(v, u) for u, v in edges]
    for _ in range(rounds):
        cur = dict(dist)
        for u, v in und:
            w = (u + v) % 97 + 1
            if cur[u] + w < dist[v]:
                dist[v] = cur[u] + w
        # synchronous: relax against the PREVIOUS round's map
        dist = {n: min(dist[n], cur[n]) for n in dist}
    ref = {n: d for n, d in dist.items() if d < INF}
    assert dict(zip(got["node"], got["dist"])) == ref


def test_ewma_kinds_match_bruteforce(ray_session):
    from spapy_ray.stages.window import window_over

    rng = np.random.RandomState(3)
    n, K = 200, 8
    key = rng.randint(0, 5, n).astype(np.int64)
    order = np.arange(n, dtype=np.int64)
    v = rng.randint(-50, 50, n).astype(np.int64)
    ds = _mk_ds(pa.table({"k": pa.array(key), "o": pa.array(order),
                          "v": pa.array(v)}))
    out = window_over(ds, key_col="k", order_cols=["o"],
                      keep_cols=["v"],
                      ops=[("num", f"ewma_num:{K}", "v"),
                           ("den", f"ewma_den:{K}", "v")]).to_pandas()
    out = out.sort_values(["k", "o"]).reset_index(drop=True)
    df = pd.DataFrame({"k": key, "o": order, "v": v}) \
        .sort_values(["k", "o"]).reset_index(drop=True)
    for kk, sub in df.groupby("k"):
        vals = sub["v"].to_numpy()
        gotk = out[out["k"] == kk]
        for i in range(len(vals)):
            num = sum(int(vals[i - j]) * (1 << (K - 1 - j))
                      for j in range(min(K, i + 1)))
            den = sum(1 << (K - 1 - j) for j in range(min(K, i + 1)))
            assert int(gotk["num"].iloc[i]) == num
            assert int(gotk["den"].iloc[i]) == den


def test_burn_cells_matches_bruteforce(ray_session):
    from spapy_ray.stages.rasterize import burn_cells

    rng = np.random.RandomState(11)
    n, T = 64, 16
    segs = []
    for gid in range(12):
        for _ in range(3):
            if rng.rand() < 0.5:
                y = rng.randint(0, n)
                x0, x1 = sorted(rng.randint(0, n, 2))
                segs.append((gid, x0, x1, y, y))
            else:
                x = rng.randint(0, n)
                y0, y1 = sorted(rng.randint(0, n, 2))
                segs.append((gid, x, x, y0, y1))
    arr = np.asarray(segs, dtype=np.int64)
    ds = _mk_ds(pa.table({
        "gid": pa.array(arr[:, 0]), "cx0": pa.array(arr[:, 1]),
        "cx1": pa.array(arr[:, 2]), "cy0": pa.array(arr[:, 3]),
        "cy1": pa.array(arr[:, 4])}))
    got = {(r["tx"], r["ty"]): (r["n_burned"], r["n_gids"])
           for r in burn_cells(ds, n=n, tile_size=T).take_all()}

    ref: dict = {}
    for gid, x0, x1, y0, y1 in segs:
        for x in range(x0, x1 + 1):
            for y in range(y0, y1 + 1):
                ref.setdefault((x // T, y // T), set()).add(
                    (gid, x, y))
    exp = {t: (len(s), len({g for g, _, _ in s}))
           for t, s in ref.items()}
    assert got == exp


def test_sample_raster_gathers_exact_values(ray_session):
    from spapy_ray.sources.rasters import (RasterMeta, dem_int_value,
                                           synth_dem_dataset)
    from spapy_ray.stages.rasterize import sample_raster

    meta = RasterMeta(width=128, height=128, tile_size=32,
                      x_min=0.0, y_max=0.0, pixel_w=1.0, pixel_h=-1.0)
    tiles = synth_dem_dataset(meta, kind="int")
    rng = np.random.RandomState(5)
    px = rng.randint(0, 128, 500).astype(np.int64)
    py = rng.randint(0, 128, 500).astype(np.int64)
    pts = _mk_ds(pa.table({"pid": pa.array(np.arange(500)),
                           "px": pa.array(px), "py": pa.array(py)}))
    out = sample_raster(pts, tiles, meta, dtype="int32").to_pandas() \
        .sort_values("pid").reset_index(drop=True)
    np.testing.assert_array_equal(
        out["z"].to_numpy(), dem_int_value(px, py).astype(np.int64))


def test_tile_stack_fold_epoch_order(ray_session):
    from spapy_ray.sources.rasters import (RasterMeta, dem_int_value,
                                           synth_dem_dataset)
    from spapy_ray.stages.raster import decode_tile, tile_stack_fold

    meta = RasterMeta(width=64, height=64, tile_size=16,
                      x_min=0.0, y_max=0.0, pixel_w=1.0, pixel_h=-1.0)
    k = 3
    stack = [synth_dem_dataset(meta, kind="int", salt=s)
             for s in range(k)]

    def fold(arrs):
        # epoch-sensitive: 100*a0 + 10*a1 + a2 detects any reorder
        return 100 * arrs[0] + 10 * arrs[1] + arrs[2]

    tiles = tile_stack_fold(stack, k, fold, dtype="int32",
                            tile_size=16)
    got = {(r["tx"], r["ty"]): np.frombuffer(r["data"], np.int64)
           for r in tiles.take_all()}
    gx, gy = np.meshgrid(np.arange(64), np.arange(64))
    full = sum(m * dem_int_value(gx, gy, salt=s).astype(np.int64)
               for m, s in zip((100, 10, 1), range(k)))
    for (tx, ty), buf in got.items():
        ref = full[ty * 16:(ty + 1) * 16, tx * 16:(tx + 1) * 16]
        np.testing.assert_array_equal(buf.reshape(16, 16), ref)
    assert len(got) == 16
