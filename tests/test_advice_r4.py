"""Round-4 ADVICE regressions (fixed round 5).

1. grouped_moments: the overflow guard bounds the per-key SUM of
   |v|^4 (fail-loud float tracker), not just a single element — two
   rows at v=50000 used to silently wrap int64.
2. _gini_fold: num is O(n^3); above ~1.66e6 total rows the fold
   switches to Python-bigint arithmetic instead of wrapping int64.
3. stay_points: dwell_us is max-min of ts_col per segment (reduceat),
   exact for a ts_col that is not monotone in the sort order.
"""

import numpy as np
import pandas as pd
import pytest


def _ds(df):
    import ray.data as rd

    return rd.from_pandas(df)


def test_grouped_moments_sum_overflow_fails_loud(ray_session):
    from spapy_ray.stages.ml import grouped_moments

    # each element passes the |v| <= 50000 element bound, but two of
    # them already overflow the int64 sum of v^4 (2 * 6.25e18 > 2^63)
    df = pd.DataFrame({"k": ["a", "a"], "v": [50_000, 50_000]})
    with pytest.raises(ValueError, match="power sums overflow"):
        grouped_moments(_ds(df), "k", "v")


def test_grouped_moments_still_exact_below_bound(ray_session):
    from spapy_ray.stages.ml import grouped_moments

    rng = np.random.default_rng(5)
    v = rng.integers(-900, 900, size=400)
    df = pd.DataFrame({"k": np.where(np.arange(400) % 2 == 0,
                                     "a", "b"), "v": v})
    got = grouped_moments(_ds(df), "k", "v") \
        .sort_values("k").reset_index(drop=True)
    for _, row in got.iterrows():
        x = [int(t) for t in df[df["k"] == row["k"]]["v"]]
        n = len(x)
        s1, s2 = sum(x), sum(t * t for t in x)
        s3, s4 = sum(t ** 3 for t in x), sum(t ** 4 for t in x)
        m3 = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 ** 3
        m4 = (n ** 3 * s4 - 4 * n * n * s1 * s3
              + 6 * n * s1 * s1 * s2 - 3 * s1 ** 4)
        assert int(row["n"]) == n and int(row["s1"]) == s1
        assert row["m3_num"] == float(m3)
        assert row["m4_num"] == float(m4)


def test_gini_fold_bigint_path_matches_exact():
    from spapy_ray.stages.ml import _gini_fold

    # ~8M total rows: nt^3 overflows int64; the object path must
    # match exact Python arithmetic (same double/double rounding)
    v = np.array([1, 2, 3, 4], dtype=np.int64)
    n = np.array([2_000_000, 2_500_000, 1_500_000, 2_000_000],
                 dtype=np.int64)
    pos = np.array([1_200_000, 300_000, 900_000, 1_999_999],
                   dtype=np.int64)
    vv, nl, posl, nr, posr, score = _gini_fold(v, n, pos)
    nt, pt = int(n.sum()), int(pos.sum())
    for i in range(len(vv)):
        l, p = int(nl[i]), int(posl[i])
        r, q = nt - l, pt - p
        num = ((l * l - p * p - (l - p) ** 2) * r
               + (r * r - q * q - (r - q) ** 2) * l)
        den = l * r
        assert abs(num) > 2 ** 63 or i >= 0  # exercise the big regime
        assert score[i] == float(num) / float(den)
        assert int(nr[i]) == r and int(posr[i]) == q


def test_gini_fold_small_path_unchanged():
    from spapy_ray.stages.ml import _gini_fold

    v = np.array([1, 2, 3], dtype=np.int64)
    n = np.array([10, 20, 5], dtype=np.int64)
    pos = np.array([5, 8, 4], dtype=np.int64)
    _, nl, posl, nr, posr, score = _gini_fold(v, n, pos)
    assert score.dtype == np.float64
    l, p = 10, 5
    r, q = 25, 12
    num = ((l * l - p * p - (l - p) ** 2) * r
           + (r * r - q * q - (r - q) ** 2) * l)
    assert score[0] == num / (l * r)


def test_stay_points_nonmonotone_ts(ray_session):
    from spapy_ray.stages.spatialstats import stay_points

    # ts is NOT monotone in the sort order (order col o); the dwell
    # must be max(ts)-min(ts) per segment, not last-first (which
    # would be negative here)
    df = pd.DataFrame({
        "k": ["u"] * 4,
        "o": [1, 2, 3, 4],
        "ts": [500, 900, 200, 100],
        "x": [0, 1, 2, 3],
        "y": [0, 0, 0, 0],
    })
    got = stay_points(_ds(df), "k", ["o"], "x", "y", radius=10,
                      min_pts=2, ts_col="ts", buckets=4).to_pandas()
    assert len(got) == 1
    assert int(got["dwell_us"].iloc[0]) == 800  # max 900 - min 100
    assert int(got["n_points"].iloc[0]) == 4
