"""window_over vs a straightforward pandas ground truth."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _frame():
    rng = np.random.default_rng(11)
    n = 400
    return pd.DataFrame({
        "k": rng.integers(0, 23, n).astype(np.int64),
        "o": np.arange(n, dtype=np.int64),          # unique order col
        "v": rng.normal(size=n),
        "i": rng.integers(-50, 50, n).astype(np.int64),
    })


def _truth(df: pd.DataFrame) -> pd.DataFrame:
    g = df.sort_values(["k", "o"], kind="stable")
    gb = g.groupby("k", sort=False)
    out = g[["k", "o"]].copy()
    out["rn"] = gb.cumcount().to_numpy() + 1
    out["lag_v"] = gb["v"].shift(1).to_numpy()
    out["lead_v"] = gb["v"].shift(-1).to_numpy()
    out["cs_v"] = gb["v"].cumsum().to_numpy()
    out["cmin_i"] = gb["i"].cummin().to_numpy()
    out["d_i"] = g["i"].to_numpy() - gb["i"].shift(1).to_numpy()
    out["d_i"] = np.where(np.isnan(out["d_i"]), 0,
                          out["d_i"]).astype(np.int64)
    return out.sort_values("o").reset_index(drop=True)


def test_window_over_all_kinds(ray_session):
    import ray.data as rd

    from spapy_ray.stages.window import window_over

    df = _frame()
    got = window_over(
        rd.from_arrow(pa.Table.from_pandas(df)), key_col="k",
        order_cols=["o"],
        ops=[("rn", "row_number", None),
             ("lag_v", "lag", "v"), ("lead_v", "lead", "v"),
             ("cs_v", "cumsum", "v"), ("cmin_i", "cummin", "i"),
             ("d_i", "delta", "i")],
        buckets=7,
    ).to_pandas().sort_values("o").reset_index(drop=True)
    want = _truth(df)
    assert list(got.columns) == list(want.columns)
    # typed-exact where no nulls are possible
    assert got["rn"].dtype == np.int64
    assert got["d_i"].dtype == np.int64
    assert got["cmin_i"].dtype == np.int64
    for c in want.columns:
        gv, wv = got[c].to_numpy(), want[c].to_numpy()
        if gv.dtype.kind == "f":
            assert np.array_equal(gv, wv, equal_nan=True), c
        else:
            assert np.array_equal(gv, wv), c


def test_window_over_bad_kind(ray_session):
    import ray.data as rd

    from spapy_ray.stages.window import window_over

    ds = rd.from_arrow(pa.table({"k": [1], "o": [1]}))
    with pytest.raises(ValueError):
        window_over(ds, key_col="k", order_cols=["o"],
                    ops=[("x", "median", "o")])


def test_rolling_sum_matches_pandas(ray_session):
    import ray.data as rd

    from spapy_ray.stages.window import window_over

    df = _frame()
    got = window_over(
        rd.from_arrow(pa.Table.from_pandas(df)), key_col="k",
        order_cols=["o"],
        ops=[("r3", "rolling_sum:3", "i")], buckets=5,
    ).to_pandas().sort_values("o").reset_index(drop=True)

    g = df.sort_values(["k", "o"], kind="stable")
    want = g.groupby("k", sort=False)["i"] \
        .rolling(3, min_periods=1).sum().reset_index(level=0, drop=True)
    want = want.loc[g.index]
    g2 = g.assign(r3=want.astype(np.int64)).sort_values("o") \
        .reset_index(drop=True)
    assert got["r3"].dtype == np.int64      # typed-exact for int src
    assert np.array_equal(got["r3"].to_numpy(), g2["r3"].to_numpy())

    with pytest.raises(ValueError, match="width"):
        window_over(rd.from_arrow(pa.table({"k": [1], "o": [1]})),
                    key_col="k", order_cols=["o"],
                    ops=[("x", "rolling_sum", "o")])


def test_funnel_counts_brute_force(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from spapy_ray.stages.sessions import funnel_counts

    rng = np.random.default_rng(5)
    n = 600
    ev = pd.DataFrame({
        "user_id": rng.integers(0, 40, n),
        "ts": pd.to_datetime(
            rng.choice(10_000_000, size=n, replace=False), unit="us"),
        "event_type": rng.choice(["a", "b", "c", "noise"], n),
    })
    got = funnel_counts(rd.from_pandas(ev), ["a", "b", "c"]) \
        .to_pandas().sort_values("stage").reset_index(drop=True)

    # brute force per user
    stages = {1: [], 2: [], 3: []}
    for u, g in ev.groupby("user_id"):
        g = g.sort_values("ts")
        t_prev = None
        t1 = None
        for k, s in enumerate(["a", "b", "c"]):
            sel = g[g["event_type"] == s]
            if t_prev is not None:
                sel = sel[sel["ts"] > t_prev]
            if len(sel) == 0:
                break
            tk = sel["ts"].min()
            if k == 0:
                t1 = tk
            stages[k + 1].append(int((tk.value - t1.value) // 1000))
            t_prev = tk
    exp = pd.DataFrame({
        "stage": [1, 2, 3],
        "step": ["a", "b", "c"],
        "n_users": [len(stages[k]) for k in (1, 2, 3)],
        "lag_us": [int(sum(stages[k])) for k in (1, 2, 3)]})
    pd.testing.assert_frame_equal(
        got[["stage", "step", "n_users", "lag_us"]].astype(
            {"stage": "int64", "n_users": "int64", "lag_us": "int64"}),
        exp.astype({"stage": "int64", "n_users": "int64",
                    "lag_us": "int64"}))
    assert got["n_users"].is_monotonic_decreasing


def test_retention_cohorts_brute_force(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from spapy_ray.stages.sessions import retention_cohorts

    rng = np.random.default_rng(9)
    n = 500
    ev = pd.DataFrame({
        "user_id": rng.integers(0, 30, n),
        "ts": pd.to_datetime(
            rng.integers(0, 20 * 86_400_000_000, n), unit="us")})
    got = retention_cohorts(rd.from_pandas(ev)).to_pandas() \
        .sort_values(["cohort_period", "period_offset"]) \
        .reset_index(drop=True)

    df = ev.assign(day=ev["ts"].astype("int64") // 1000
                   // 86_400_000_000).drop_duplicates(
        ["user_id", "day"])
    cohort = df.groupby("user_id")["day"].transform("min")
    exp = pd.DataFrame({"cohort_period": cohort,
                        "period_offset": df["day"] - cohort}) \
        .groupby(["cohort_period", "period_offset"]).size() \
        .reset_index(name="n_users") \
        .sort_values(["cohort_period", "period_offset"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  exp.astype("int64"))


def test_asof_forward_direction_brute_force(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from spapy_ray.stages.sessions import asof_join

    rng = np.random.default_rng(23)
    left = pd.DataFrame({
        "user_id": rng.integers(0, 10, 80),
        "ts": rng.choice(100_000, 80, replace=False).astype("int64"),
        "lv": np.arange(80)})
    right = pd.DataFrame({
        "user_id": rng.integers(0, 10, 60),
        "ts": rng.choice(100_000, 60, replace=False).astype("int64"),
        "rv": np.arange(60)})
    got = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    by="user_id", on="ts", left_cols=["lv"],
                    right_cols=["rv"], direction="forward") \
        .to_pandas().sort_values("lv").reset_index(drop=True)
    exp_rv = []
    for _, r in left.iterrows():
        cand = right[(right["user_id"] == r["user_id"])
                     & (right["ts"] >= r["ts"])]
        exp_rv.append(np.nan if cand.empty
                      else cand.sort_values("ts").iloc[0]["rv"])
    assert len(got) == 80
    a = got["rv_r"].to_numpy(dtype="float64")
    b = np.asarray(exp_rv, dtype="float64")
    assert ((a == b) | (np.isnan(a) & np.isnan(b))).all()

    import pytest

    with pytest.raises(ValueError):
        asof_join(rd.from_pandas(left), rd.from_pandas(right),
                  by="user_id", on="ts", direction="nearest")


def test_grouped_cusum_matches_sequential(ray_session):
    import ray.data as rd

    from spapy_ray.stages.sessions import grouped_cusum

    rng = np.random.default_rng(4)
    n = 3000
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], n),
        "i": rng.permutation(n).astype(np.int64),
        "x": rng.integers(-80, 70, n).astype(np.int64)})
    got = grouped_cusum(rd.from_pandas(df), key_col="k", id_col="i",
                        x_col="x", threshold=300, window=128,
                        buckets=8)
    rows = []
    for k, g in df.sort_values("i").groupby("k"):
        s = 0
        alarms = 0
        mx = -1 << 62
        for x in g["x"]:
            s = max(0, s + int(x))
            alarms += s > 300
            mx = max(mx, s)
        rows.append((k, alarms, mx))
    want = pd.DataFrame(sorted(rows),
                        columns=["k", "n_alarms", "max_s"]) \
        .astype({"n_alarms": np.int64, "max_s": np.int64})
    pd.testing.assert_frame_equal(got, want)
