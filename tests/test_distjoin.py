"""Within-distance (range) self-join: grid path vs brute force, and
salted == unsalted exactness."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from spapy_ray.stages.distjoin import (within_distance_count,
                                       within_distance_pairs_local)


def _points(n: int, seed: int = 11) -> pa.Table:
    rng = np.random.default_rng(seed)
    # trailing-5 fixed point like the pages fixture, clustered so
    # cells are non-trivially occupied (some points share coords —
    # zero-distance neighbors must count)
    lat5 = (rng.integers(-850_000, 850_000, n) * 10 + 5)
    lon5 = (rng.integers(-1_800_000, 1_800_000, n) * 10 + 5)
    dup = rng.integers(0, n, n // 10)
    lat5[:len(dup)] = lat5[dup]
    lon5[:len(dup)] = lon5[dup]
    return pa.table({
        "pid": np.arange(n, dtype=np.int64),
        "lat": lat5.astype(np.float64) / 1e5,
        "lon": lon5.astype(np.float64) / 1e5,
    })


def _expected(t: pa.Table, radius_deg: float) -> pd.DataFrame:
    r5 = int(round(radius_deg * 1e5))
    lat5 = np.rint(t.column("lat").to_numpy() * 1e5).astype(np.int64)
    lon5 = np.rint(t.column("lon").to_numpy() * 1e5).astype(np.int64)
    i, _ = within_distance_pairs_local(lat5, lon5, r5)
    counts = np.bincount(i, minlength=len(lat5)).astype(np.int64)
    return pd.DataFrame({"pid": np.arange(len(lat5), dtype=np.int64),
                         "n_neighbors": counts})


def _run(t: pa.Table, radius_deg: float, **kw) -> pd.DataFrame:
    import ray.data as rd

    out = within_distance_count(rd.from_arrow(t), radius_deg=radius_deg,
                                key_cols=("pid",), **kw)
    return out.to_pandas().sort_values("pid").reset_index(drop=True)


@pytest.mark.parametrize("radius", [0.5, 2.0, 11.0])
def test_grid_matches_bruteforce(ray_session, radius):
    t = _points(400)
    got = _run(t, radius)
    exp = _expected(t, radius)
    pd.testing.assert_frame_equal(got, exp)


def test_salted_equals_unsalted(ray_session):
    t = _points(400, seed=23)
    base = _run(t, 2.0)
    salted = _run(t, 2.0, salt=4)
    pd.testing.assert_frame_equal(salted, base)
    pd.testing.assert_frame_equal(base, _expected(t, 2.0))


def test_isolated_points_get_zero(ray_session):
    # two far-apart points: both rows present, counts 0
    t = pa.table({"pid": np.array([0, 1], dtype=np.int64),
                  "lat": [10.00005, -40.00005],
                  "lon": [100.00005, -90.00005]})
    got = _run(t, 1.0)
    assert got["n_neighbors"].tolist() == [0, 0]


def test_pairs_match_bruteforce(ray_session):
    import ray.data as rd

    from spapy_ray.stages.distjoin import within_distance_pairs

    t = _points(300, seed=5)
    r5 = 200000
    lat5 = np.rint(t.column("lat").to_numpy() * 1e5).astype(np.int64)
    lon5 = np.rint(t.column("lon").to_numpy() * 1e5).astype(np.int64)
    i, j = within_distance_pairs_local(lat5, lon5, r5)
    exp_undir = {(min(a, b), max(a, b)) for a, b in zip(i, j)}
    exp_dir = set(zip(i.tolist(), j.tolist()))

    got = within_distance_pairs(rd.from_arrow(t), radius_deg=2.0,
                                key_col="pid").to_pandas()
    assert set(zip(got["key_a"], got["key_b"])) == exp_undir
    assert len(got) == len(exp_undir)  # no duplicate emissions
    dx = lon5[got["key_a"]] - lon5[got["key_b"]]
    dy = lat5[got["key_a"]] - lat5[got["key_b"]]
    assert (got["dist5sq"].to_numpy() == dx * dx + dy * dy).all()

    gd = within_distance_pairs(rd.from_arrow(t), radius_deg=2.0,
                               key_col="pid", directed=True).to_pandas()
    assert set(zip(gd["key_a"], gd["key_b"])) == exp_dir


def _hist_expected(t: pa.Table, radii):
    lat5 = np.rint(t.column("lat").to_numpy() * 1e5).astype(np.int64)
    lon5 = np.rint(t.column("lon").to_numpy() * 1e5).astype(np.int64)
    d2 = (lat5[:, None] - lat5[None, :]) ** 2 \
        + (lon5[:, None] - lon5[None, :]) ** 2
    np.fill_diagonal(d2, np.iinfo(np.int64).max)
    r5s = sorted(int(round(r * 1e5)) for r in radii)
    return pd.DataFrame({
        "r5": np.array(r5s, dtype=np.int64),
        "n_pairs": np.array([(d2 <= r * r).sum() for r in r5s],
                            dtype=np.int64)})


@pytest.mark.parametrize("salt", [1, 3])
def test_pair_distance_histogram_bruteforce(ray_session, salt):
    import ray.data as rd

    from spapy_ray.stages.distjoin import pair_distance_histogram

    rng = np.random.default_rng(5)
    # tight cluster so radii catch many pairs + duplicates
    lat5 = rng.integers(-40_000, 40_000, 400) * 5
    lon5 = rng.integers(-40_000, 40_000, 400) * 5
    lat5[:40] = lat5[40:80]
    lon5[:40] = lon5[40:80]
    t = pa.table({"pid": np.arange(400, dtype=np.int64),
                  "lat": lat5.astype(np.float64) / 1e5,
                  "lon": lon5.astype(np.float64) / 1e5})
    radii = [0.05, 0.2, 0.4]
    got = pair_distance_histogram(
        rd.from_arrow(t), radii_deg=radii, key_cols=("pid",),
        buckets=8, salt=salt)
    want = _hist_expected(t, radii)
    pd.testing.assert_frame_equal(got, want)
