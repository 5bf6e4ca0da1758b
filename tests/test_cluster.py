"""Grid-DBSCAN (stages/cluster.py) vs an independent brute-force
DBSCAN with the same deterministic conventions (self-inclusive
counts, weighted duplicate coords, nearest-core border rule with
(d2, pk) ties, min-core-pk cluster ids)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from spapy_ray.stages.cluster import (dbscan, dbscan_labels,
                                      dbscan_summary, pack5)

STRIDE = 1 << 32


def brute_dbscan(lat: np.ndarray, lon: np.ndarray, eps_deg: float,
                 min_pts: int) -> pd.DataFrame:
    """O(m^2) reference over distinct fixed-point coords."""
    lat5 = np.round(lat * 1e5).astype(np.int64)
    lon5 = np.round(lon * 1e5).astype(np.int64)
    pk = (lat5 + 8_500_000) * STRIDE + (lon5 + 18_000_000)
    upk, w = np.unique(pk, return_counts=True)
    ula = upk // STRIDE - 8_500_000
    ulo = upk % STRIDE - 18_000_000
    m = len(upk)
    eps5 = int(round(eps_deg * 1e5))
    d2 = (ula[:, None] - ula[None, :]) ** 2 \
        + (ulo[:, None] - ulo[None, :]) ** 2
    within = d2 <= eps5 * eps5
    cnt = (within * w[None, :]).sum(axis=1)
    core = cnt >= min_pts

    parent = np.arange(m)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ci = np.flatnonzero(core)
    for i in ci:
        for j in ci:
            if j > i and within[i, j]:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    roots = {}
    for i in ci:
        roots.setdefault(find(i), []).append(i)
    canon = {r: upk[m_].min() for r, m_ in
             ((r, np.array(v)) for r, v in roots.items())}
    lab = np.full(m, -1, np.int64)
    role = np.full(m, 2, np.int8)
    for i in ci:
        lab[i] = canon[find(i)]
        role[i] = 0
    for i in range(m):
        if core[i]:
            continue
        cands = [j for j in ci if within[i, j]]
        if cands:
            best = min((int(d2[i, j]), int(upk[j])) for j in cands)
            jstar = next(j for j in cands
                         if d2[i, j] == best[0] and upk[j] == best[1])
            lab[i] = canon[find(jstar)]
            role[i] = 1
    return pd.DataFrame({"pk": upk, "w": w.astype(np.int64),
                         "cnt": cnt.astype(np.int64),
                         "role": role, "cluster": lab}) \
        .sort_values("pk").reset_index(drop=True)


def fixture_points(seed: int = 7):
    rng = np.random.default_rng(seed)
    pts = []
    for cx, cy, n in [(10.0, 20.0, 60), (10.3, 20.1, 40),
                      (-50.0, -30.0, 50), (120.0, 5.0, 8)]:
        pts.append(np.column_stack([cy + rng.normal(0, 0.08, n),
                                    cx + rng.normal(0, 0.08, n)]))
    pts.append(np.column_stack([rng.uniform(-80, 80, 120),
                                rng.uniform(-170, 170, 120)]))
    pts.append(np.array([[33.0, 77.0]]).repeat(5, axis=0))
    # dense strip: a long chain spanning many eps/sqrt(2) cells
    pts.append(np.column_stack([
        np.linspace(-6, 6, 200),
        np.full(200, -179.9) + rng.uniform(0, 0.02, 200)]))
    P = np.vstack(pts)
    P = np.round(P * 1e5) / 1e5
    return P[:, 0], P[:, 1]      # lat, lon


def engine_labels(lat, lon, eps_deg, min_pts, components):
    ds = rd.from_arrow(pa.table({"lat": lat, "lon": lon}))
    out = dbscan_labels(ds, eps_deg=eps_deg, min_pts=min_pts,
                        components=components).to_pandas()
    return out.sort_values("pk").reset_index(drop=True)[
        ["pk", "w", "cnt", "role", "cluster"]]


@pytest.mark.parametrize("eps,min_pts,components", [
    (0.2, 5, "distributed"),     # blob cores, dup-coord singleton
    (0.15, 12, "driver"),        # borders + strip chain
])
def test_dbscan_matches_brute(ray_session, eps, min_pts, components):
    lat, lon = fixture_points()
    ref = brute_dbscan(lat, lon, eps, min_pts)
    got = engine_labels(lat, lon, eps, min_pts, components)
    pd.testing.assert_frame_equal(
        got.astype(ref.dtypes.to_dict()), ref)
    # the harder fixture must actually exercise every role
    if min_pts == 12:
        assert (got.role == 1).any() and (got.role == 2).any()
    assert (got.role == 0).any()


def test_dbscan_min_pts_one_all_core(ray_session):
    lat, lon = fixture_points(3)
    got = engine_labels(lat[:80], lon[:80], 0.1, 1, "distributed")
    assert (got.role == 0).all()
    assert (got.cluster >= 0).all()


def test_dbscan_per_point_join(ray_session):
    lat, lon = fixture_points()
    ds = rd.from_arrow(pa.table({
        "url": pa.array([f"u{i}" for i in range(len(lat))]),
        "warc_ts": pa.array(np.arange(len(lat), dtype=np.int64)),
        "lat": lat, "lon": lon}))
    rows = dbscan(ds, eps_deg=0.2, min_pts=5,
                  components="driver").to_pandas()
    assert len(rows) == len(lat)
    ref = brute_dbscan(lat, lon, 0.2, 5).set_index("pk")
    lat5 = np.round(lat * 1e5).astype(np.int64)
    lon5 = np.round(lon * 1e5).astype(np.int64)
    pk = pack5(lat5, lon5)
    rows = rows.sort_values("warc_ts").reset_index(drop=True)
    want = ref.loc[pk[rows["warc_ts"].to_numpy()]]
    assert np.array_equal(rows["cluster"].to_numpy(),
                          want["cluster"].to_numpy())
    assert np.array_equal(rows["role"].to_numpy(),
                          want["role"].to_numpy())


def test_dbscan_summary_consistent(ray_session):
    lat, lon = fixture_points()
    ds = rd.from_arrow(pa.table({"lat": lat, "lon": lon}))
    summ = dbscan_summary(ds, eps_deg=0.2, min_pts=5,
                          components="driver").to_pandas()
    ref = brute_dbscan(lat, lon, 0.2, 5)
    ref["lat5"] = ref["pk"] // STRIDE - 8_500_000
    ref["lon5"] = ref["pk"] % STRIDE - 18_000_000
    g = ref.assign(one=1,
                   wc=np.where(ref.role == 0, ref.w, 0),
                   wb=np.where(ref.role == 1, ref.w, 0)) \
        .groupby("cluster")
    want = g.agg(n_coords=("one", "sum"), n_points=("w", "sum"),
                 n_core=("wc", "sum"), n_border=("wb", "sum"),
                 minlat5=("lat5", "min"), minlon5=("lon5", "min"),
                 maxlat5=("lat5", "max"), maxlon5=("lon5", "max")) \
        .reset_index()
    summ = summ.sort_values("cluster").reset_index(drop=True)
    want = want.sort_values("cluster").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        summ[want.columns].astype(want.dtypes.to_dict()), want)


def test_dbscan_empty_and_single(ray_session):
    empty = rd.from_arrow(pa.table({
        "lat": pa.array([], type=pa.float64()),
        "lon": pa.array([], type=pa.float64())}))
    out = dbscan_labels(empty, eps_deg=0.5, min_pts=3,
                        components="driver").to_pandas()
    assert len(out) == 0
    one = rd.from_arrow(pa.table({"lat": [1.0], "lon": [2.0]}))
    got = dbscan_labels(one, eps_deg=0.5, min_pts=2,
                        components="driver").to_pandas()
    assert len(got) == 1 and got.loc[0, "role"] == 2 \
        and got.loc[0, "cluster"] == -1
