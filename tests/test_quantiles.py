"""grouped_quantile vs DuckDB quantile_disc on adversarial data."""

import duckdb
import numpy as np
import pandas as pd
import pytest


def _check(df: pd.DataFrame, qs, bins, max_collect, ray_session):
    import ray.data as rd

    from spapy_ray.stages.quantiles import grouped_quantile

    got = grouped_quantile(rd.from_pandas(df), "k", "v", qs,
                           bins=bins, max_collect=max_collect)
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(" UNION ALL ".join(
        f"SELECT k, {q} AS q, quantile_disc(v, {q}) AS value "
        "FROM t GROUP BY k" for q in qs)).df() \
        .sort_values(["k", "q"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=True)


def test_quantiles_uniform(ray_session):
    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], size=20000),
        "v": rng.normal(0.0, 100.0, size=20000)})
    _check(df, [0.0, 0.25, 0.5, 0.9, 1.0], bins=8, max_collect=50,
           ray_session=ray_session)


def test_quantiles_heavy_ties(ray_session):
    # one value makes up 90% of a group: the containing bin never
    # shrinks by count, so refinement must terminate via the
    # adjacent-float interval collapse, not via max_collect
    rng = np.random.default_rng(11)
    v = np.where(rng.random(30000) < 0.9, 42.5,
                 rng.normal(0.0, 10.0, 30000))
    df = pd.DataFrame({"k": rng.choice(["x", "y"], size=30000), "v": v})
    _check(df, [0.25, 0.5, 0.9], bins=4, max_collect=20,
           ray_session=ray_session)


def test_quantiles_tiny_groups(ray_session):
    df = pd.DataFrame({"k": ["a", "a", "b", "c", "c", "c"],
                       "v": [5.0, 1.0, 2.0, 9.0, 7.0, 8.0]})
    _check(df, [0.5, 0.9], bins=4, max_collect=2,
           ray_session=ray_session)


def test_quantiles_rejects_nulls(ray_session):
    import ray.data as rd

    from spapy_ray.stages.quantiles import grouped_quantile

    df = pd.DataFrame({"k": ["a", "a"], "v": [1.0, None]})
    with pytest.raises(Exception):
        grouped_quantile(rd.from_pandas(df), "k", "v", [0.5])


def test_hll_approx_distinct_error_envelope(ray_session):
    """HLL estimate within 5% (expected ~1.6% at p=12) of the exact
    per-key distinct count, for string and int value columns."""
    import ray.data as rd

    from spapy_ray.stages.relational import approx_distinct_hll

    rng = np.random.default_rng(3)
    n = 200_000
    keys = rng.choice(["a", "b"], size=n)
    # key a: ~50k distinct strings; key b: ~5k distinct
    vals = np.where(keys == "a",
                    rng.integers(0, 50_000, n),
                    rng.integers(0, 5_000, n))
    df = pd.DataFrame({"k": keys, "v": ("u" + pd.Series(vals).astype(str))})
    exact = df.groupby("k")["v"].nunique()
    got = approx_distinct_hll(
        rd.from_pandas(df).repartition(16), "k", "v").to_pandas() \
        .set_index("k")["n_approx"]
    for k in ("a", "b"):
        rel = abs(got[k] / exact[k] - 1.0)
        assert rel < 0.05, (k, got[k], exact[k], rel)


def test_quantile_sketch_exact_regime(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from spapy_ray.stages.quantiles import quantile_sketch

    rng = np.random.default_rng(7)
    v = rng.normal(100, 20, 5000)
    qs = [0.0, 0.1, 0.5, 0.9, 1.0]
    out = quantile_sketch(
        rd.from_arrow(pa.table({"x": v})).repartition(6),
        "x", qs, capacity=10_000).to_pandas()
    sv = np.sort(v)
    for q, got in zip(out["q"], out["value"]):
        rank = max(1, int(np.ceil(q * len(sv))))
        assert got == sv[rank - 1], q


def test_quantile_sketch_approx_envelope(ray_session):
    """Compaction regime: every estimated quantile's TRUE rank must
    sit within a generous O(n/k * log) envelope of the target."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from spapy_ray.stages.quantiles import quantile_sketch

    rng = np.random.default_rng(19)
    n, k = 200_000, 512
    v = rng.zipf(1.5, n).astype(np.float64) + rng.random(n)
    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    out = quantile_sketch(
        rd.from_arrow(pa.table({"x": v})).repartition(10),
        "x", qs, capacity=k).to_pandas()
    sv = np.sort(v)
    budget = (n / k) * 24        # deterministic-compaction envelope
    for q, got in zip(out["q"], out["value"]):
        true_rank = np.searchsorted(sv, got, side="right")
        target = max(1, int(np.ceil(q * n)))
        assert abs(true_rank - target) <= budget, \
            (q, int(true_rank), target)


def test_grouped_median_exact_both_parities(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from spapy_ray.stages.relational import grouped_median

    rng = np.random.default_rng(17)
    df = pd.DataFrame({
        "k": ["odd"] * 7 + ["even"] * 8,
        "v": rng.normal(size=15)})
    got = grouped_median(rd.from_pandas(df), "k", "v").to_pandas() \
        .set_index("k")
    for k, g in df.groupby("k"):
        v = np.sort(g["v"].to_numpy())
        n = len(v)
        assert got.loc[k, "n"] == n
        assert got.loc[k, "median_x2"] == v[(n - 1) // 2] + v[n // 2]


def test_grouped_mad_outliers_planted(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from spapy_ray.stages.relational import grouped_mad_outliers

    rng = np.random.default_rng(19)
    base = rng.normal(0, 1, 200)
    spikes = np.array([50.0, -60.0, 45.0])
    df = pd.DataFrame({"k": "a",
                       "v": np.concatenate([base, spikes])})
    got = grouped_mad_outliers(rd.from_pandas(df), "k", "v", k=3) \
        .to_pandas().iloc[0]
    assert got["n"] == 203
    # all three planted spikes flagged; the normal bulk mostly not
    assert got["n_outliers"] >= 3
    assert got["n_outliers"] < 30

    # brute-force parity of the counting rule
    v = np.sort(df["v"].to_numpy())
    n = len(v)
    m2 = v[(n - 1) // 2] + v[n // 2]
    d = np.sort(np.abs(2 * df["v"].to_numpy() - m2))
    mad4 = d[(n - 1) // 2] + d[n // 2]
    exp = int((2 * np.abs(2 * df["v"].to_numpy() - m2)
               > 3 * mad4).sum())
    assert got["n_outliers"] == exp
    assert got["median_x2"] == m2 and got["mad_x4"] == mad4


def test_gini_exact_known_distributions(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from spapy_ray.stages.quantiles import gini_exact

    # all-equal -> G = 0; one-holder -> G = (n-1)/n
    eq = rd.from_pandas(pd.DataFrame(
        {"c": np.full(1000, 7, np.int64)}), override_num_blocks=4)
    assert gini_exact(eq, "c").iloc[0]["gini_q"] == 0
    one = np.zeros(100, np.int64)
    one[0] = 1_000_000
    oh = rd.from_pandas(pd.DataFrame({"c": one}),
                        override_num_blocks=3)
    assert gini_exact(oh, "c").iloc[0]["gini_q"] == 990_000
    # random vs brute force
    rng = np.random.default_rng(5)
    v = rng.integers(0, 10 ** 6, 5000)
    ds = rd.from_pandas(pd.DataFrame({"c": v}),
                        override_num_blocks=7)
    got = gini_exact(ds, "c").iloc[0]
    sv = np.sort(v).astype(object)
    n, s = len(sv), int(sv.sum())
    s1 = int((np.arange(1, n + 1, dtype=object) * sv).sum())
    exp = (10 ** 6 * n * 0 + (2 * s1 - (n + 1) * s) * 10 ** 6) \
        // (n * s)
    assert got["gini_q"] == exp and got["s1_sum"] == s1


def test_mann_whitney_u_scipy_free_bruteforce(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from spapy_ray.stages.relational import mann_whitney_u

    rng = np.random.default_rng(9)
    a = rng.integers(0, 50, 700)          # heavy ties
    b = rng.integers(10, 60, 400)
    da = rd.from_pandas(pd.DataFrame({"c": a}), override_num_blocks=4)
    db = rd.from_pandas(pd.DataFrame({"c": b}), override_num_blocks=3)
    got = mann_whitney_u(da, db, "c", window=16).iloc[0]

    # brute force: u2 = sum over a of (2*#{b<a} + #{b=a})
    u2 = sum(2 * int((b < x).sum()) + int((b == x).sum()) for x in a)
    assert got["na"] == 700 and got["nb"] == 400
    assert got["u2"] == u2
    # complement identity
    got_b = mann_whitney_u(db, da, "c", window=16).iloc[0]
    assert got["u2"] + got_b["u2"] == 2 * 700 * 400


def test_grouped_spearman_vs_scipy_free_reference(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from spapy_ray.stages.relational import grouped_spearman

    rng = np.random.default_rng(13)
    rows = []
    for k, (slope, noise) in enumerate([(3.0, 0.1), (-2.0, 5.0),
                                        (0.0, 1.0)]):
        x = rng.integers(0, 100, 400)
        y = (slope * x + rng.normal(0, noise, 400) * 10) \
            .astype(np.int64)
        rows.append(pd.DataFrame({"k": k, "x": x, "y": y}))
    df = pd.concat(rows, ignore_index=True)
    got = grouped_spearman(
        rd.from_pandas(df, override_num_blocks=5), "k", "x", "y") \
        .to_pandas().sort_values("k").reset_index(drop=True)

    for k in range(3):
        g = df[df.k == k]
        rx = pd.Series(g.x).rank(method="average").to_numpy()
        ry = pd.Series(g.y).rank(method="average").to_numpy()
        rho = np.corrcoef(rx, ry)[0, 1]
        exp = np.sign(rho) * rho * rho * 1e6
        assert abs(got.loc[k, "rho2_q"] - exp) < 3  # trunc vs float
    assert got.loc[0, "rho2_q"] > 900_000   # strong positive
    assert got.loc[1, "rho2_q"] < -500_000  # strong negative
