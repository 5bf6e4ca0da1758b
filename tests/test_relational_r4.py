"""Round-4 session additions: transition counts, xor fingerprint,
grouped rollup — each vs a straightforward pandas/python ground
truth on randomized inputs."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _events(n=900, n_users=60, seed=7):
    rng = np.random.default_rng(seed)
    ts = rng.integers(0, 10_000, n) * 1_000_000
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": ts.astype("datetime64[us]"),
        "user_id": rng.integers(0, n_users, n).astype(np.int64),
        "event_type": rng.choice(["view", "click", "purchase", "share"],
                                 n),
    })


def test_transition_counts_vs_pandas(ray_session):
    import ray.data as rd

    from spapy_ray.stages.sessions import transition_counts

    df = _events()
    out = transition_counts(rd.from_pandas(df)).to_pandas() \
        .sort_values(["prev_type", "next_type"]).reset_index(drop=True)

    g = df.assign(us=df["ts"].astype("int64")) \
        .sort_values(["user_id", "us", "event_id"], kind="stable")
    same = g["user_id"].to_numpy()[1:] == g["user_id"].to_numpy()[:-1]
    idx = np.nonzero(same)[0] + 1
    truth = pd.DataFrame({
        "prev_type": g["event_type"].to_numpy()[idx - 1],
        "next_type": g["event_type"].to_numpy()[idx],
    }).groupby(["prev_type", "next_type"]).size().reset_index(name="n")
    truth["n"] = truth["n"].astype(np.int64)

    pd.testing.assert_frame_equal(out, truth.reset_index(drop=True))
    # conservation: every non-first event of a multi-event user is a
    # transition
    n_first = g.groupby("user_id").size().shape[0]
    assert out["n"].sum() == len(df) - n_first


def test_xor_fingerprint_order_invariant_and_sensitive(ray_session):
    import ray.data as rd

    from spapy_ray.kernels.hashing import fnv1a64_scalar
    from spapy_ray.stages.relational import xor_fingerprint

    rng = np.random.default_rng(3)
    rows = [f"row-{i}-{rng.integers(0, 1 << 30)}" for i in range(500)]
    df = pd.DataFrame({"row": rows})

    a = xor_fingerprint(rd.from_pandas(df), "row").to_pandas() \
        .sort_values("bucket").reset_index(drop=True)
    # permuted + differently blocked input -> identical fingerprint
    perm = df.sample(frac=1.0, random_state=9).reset_index(drop=True)
    b = xor_fingerprint(
        rd.from_pandas(perm).repartition(7), "row").to_pandas() \
        .sort_values("bucket").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    # ground truth: scalar fnv xor-fold per bucket
    fp = {}
    cnt = {}
    for s in rows:
        h = fnv1a64_scalar(s)
        k = h % 64
        fp[k] = fp.get(k, 0) ^ h
        cnt[k] = cnt.get(k, 0) + 1
    truth = pd.DataFrame({
        "bucket": sorted(fp),
        "fp": np.array([fp[k] for k in sorted(fp)],
                       dtype=np.uint64).view(np.int64),
        "n_rows": np.array([cnt[k] for k in sorted(fp)], dtype=np.int64),
    })
    pd.testing.assert_frame_equal(a, truth)

    # single-row corruption flips exactly one bucket row
    df2 = df.copy()
    df2.loc[123, "row"] = df2.loc[123, "row"] + "X"
    c = xor_fingerprint(rd.from_pandas(df2), "row").to_pandas() \
        .sort_values("bucket").reset_index(drop=True)
    merged = a.merge(c, on="bucket", suffixes=("_a", "_c"))
    assert (merged["fp_a"] != merged["fp_c"]).sum() in (1, 2)


def test_grouped_rollup_vs_pandas(ray_session):
    import ray.data as rd

    from spapy_ray.stages.relational import grouped_rollup

    rng = np.random.default_rng(5)
    n = 700
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], n),
        "b": rng.integers(2000, 2005, n).astype(np.int64),
        "v": rng.integers(0, 100, n).astype(np.int64),
    })
    out = grouped_rollup(rd.from_pandas(df), ["a", "b"], "v",
                         sentinels={"a": "ALL", "b": -1})
    out["v"] = out["v"].astype(np.int64)
    out = out.sort_values(["a", "b"]).reset_index(drop=True)

    base = df.groupby(["a", "b"], as_index=False).agg(
        v=("v", "sum"), n=("v", "size"))
    l1 = df.groupby(["a"], as_index=False).agg(
        v=("v", "sum"), n=("v", "size"))
    l1["b"] = -1
    l0 = pd.DataFrame({"a": ["ALL"], "b": [-1], "v": [df["v"].sum()],
                       "n": [len(df)]})
    truth = pd.concat([base, l1[["a", "b", "v", "n"]], l0],
                      ignore_index=True)
    truth["n"] = truth["n"].astype(np.int64)
    truth = truth.sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[["a", "b", "v", "n"]], truth[["a", "b", "v", "n"]])


def test_grouped_cube_vs_pandas(ray_session):
    import ray.data as rd

    from spapy_ray.stages.relational import grouped_cube

    rng = np.random.default_rng(6)
    n = 600
    df = pd.DataFrame({
        "a": rng.choice(["x", "y"], n),
        "b": rng.integers(0, 3, n).astype(np.int64),
        "v": rng.integers(0, 50, n).astype(np.int64),
    })
    out = grouped_cube(rd.from_pandas(df), ["a", "b"], "v",
                       sentinels={"a": "ALL", "b": -1})
    out["v"] = out["v"].astype(np.int64)
    out = out.sort_values(["a", "b"]).reset_index(drop=True)

    def agg(keys):
        if keys:
            g = df.groupby(keys, as_index=False).agg(
                v=("v", "sum"), n=("v", "size"))
        else:
            g = pd.DataFrame({"v": [df["v"].sum()], "n": [len(df)]})
        for c, s in (("a", "ALL"), ("b", -1)):
            if c not in keys:
                g[c] = s
        return g[["a", "b", "v", "n"]]

    truth = pd.concat(
        [agg(["a", "b"]), agg(["a"]), agg(["b"]), agg([])],
        ignore_index=True).sort_values(["a", "b"]) \
        .reset_index(drop=True)
    truth["n"] = truth["n"].astype(np.int64)
    pd.testing.assert_frame_equal(out[["a", "b", "v", "n"]], truth)


def test_pivot_counts_vs_crosstab(ray_session):
    import ray.data as rd

    from spapy_ray.stages.relational import pivot_counts

    rng = np.random.default_rng(8)
    n = 800
    labels = ["p", "q", "r"]
    df = pd.DataFrame({
        "k": rng.integers(0, 40, n).astype(np.int64),
        "lab": rng.choice(labels, n),
    })
    out = pivot_counts(rd.from_pandas(df), "k", "lab", labels) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    ct = pd.crosstab(df["k"], df["lab"]).reindex(
        columns=labels, fill_value=0)
    truth = ct.rename(columns={l: f"n_{l}" for l in labels}) \
        .reset_index().rename_axis(None, axis=1)
    truth["n_total"] = ct.sum(axis=1).to_numpy()
    for c in truth.columns:
        truth[c] = truth[c].astype(np.int64)
    pd.testing.assert_frame_equal(out, truth)


def test_multiset_except_vs_counter(ray_session):
    import ray.data as rd
    from collections import Counter

    from spapy_ray.stages.relational import multiset_except

    rng = np.random.default_rng(9)
    a = rng.integers(0, 50, 700).astype(np.int64)
    b = rng.integers(0, 50, 600).astype(np.int64)
    out = multiset_except(
        rd.from_pandas(pd.DataFrame({"v": a})),
        rd.from_pandas(pd.DataFrame({"v": b})), "v") \
        .to_pandas().sort_values("v").reset_index(drop=True)
    diff = Counter(a.tolist()) - Counter(b.tolist())
    truth = pd.DataFrame(
        {"v": sorted(diff), "n": [diff[k] for k in sorted(diff)]}) \
        .astype(np.int64)
    pd.testing.assert_frame_equal(out, truth)


def test_grouped_corr_int_exact(ray_session):
    import ray.data as rd

    from spapy_ray.stages.relational import grouped_corr_int

    rng = np.random.default_rng(10)
    n = 500
    df = pd.DataFrame({
        "g": rng.choice(["u", "w"], n),
        "x": rng.integers(0, 200, n) / 100.0,
    })
    # y correlated with x in group u, anti in group w
    noise = rng.integers(-20, 21, n) / 100.0
    df["y"] = np.where(df["g"] == "u", df["x"], 2.0 - df["x"]) + noise
    df["y"] = np.round(df["y"], 2)
    out = grouped_corr_int(rd.from_pandas(df), ["g"], "x", "y") \
        .sort_values("g").reset_index(drop=True)
    for _, r in out.iterrows():
        gg = df[df["g"] == r["g"]]
        xi = np.rint(gg["x"] * 100).astype(np.int64)
        yi = np.rint(gg["y"] * 100).astype(np.int64)
        nn = len(gg)
        num = nn * int((xi * yi).sum()) - int(xi.sum()) * int(yi.sum())
        varx = nn * int((xi * xi).sum()) - int(xi.sum()) ** 2
        vary = nn * int((yi * yi).sum()) - int(yi.sum()) ** 2
        assert r["corr_sign"] == (0 if num == 0 else
                                  (1 if num > 0 else -1))
        assert r["corr2_q"] == (num * num * 1_000_000) // (varx * vary)
        # the quantized corr^2 tracks the float corr
        cf = num / np.sqrt(varx * vary)
        assert abs(r["corr2_q"] / 1e6 - cf * cf) < 1e-5
    assert out.loc[out["g"] == "u", "corr_sign"].iloc[0] == 1
    assert out.loc[out["g"] == "w", "corr_sign"].iloc[0] == -1


def test_grouped_quartiles_convention(ray_session):
    import ray.data as rd

    from spapy_ray.stages.relational import grouped_quartiles

    rng = np.random.default_rng(12)
    for n in (4, 5, 7, 101):
        v = rng.normal(size=n)
        df = pd.DataFrame({"g": ["a"] * n, "v": v})
        out = grouped_quartiles(rd.from_pandas(df), "g", "v") \
            .to_pandas()
        s = np.sort(v)
        a1, a2 = (n - 1) // 4, n // 4
        assert out["q1_x2"].iloc[0] == s[a1] + s[a2]
        assert out["q3_x2"].iloc[0] == s[n - 1 - a2] + s[n - 1 - a1]
        assert out["iqr_x2"].iloc[0] == \
            (s[n - 1 - a2] + s[n - 1 - a1]) - (s[a1] + s[a2])


def test_lev1_verify_kernel():
    from spapy_ray.stages.text import _lev1_verify

    a = np.array(["cat", "cat", "cat", "abc", "aaa", "ab", "x", "x",
                  "same"], dtype=object)
    b = np.array(["bat", "cart", "at", "bca", "aa", "ba", "xy", "yx",
                  "same"], dtype=object)
    exp = np.array([True, True, True, False, True, False, True, True,
                    False])
    assert (_lev1_verify(a, b) == exp).all()


def test_fuzzy_vocab_pairs_synthetic(ray_session):
    import ray.data as rd

    from spapy_ray.stages.text import fuzzy_vocab_pairs

    # vocabulary with a known distance-1 structure
    docs = pd.DataFrame({"text": [
        "alpha alpho beta betta gamma",
        "alpha beta delta gamma gamma",
        "alpha salpha beta",
    ]})
    out = fuzzy_vocab_pairs(rd.from_pandas(docs)).to_pandas()
    pairs = set(zip(out["w1"], out["w2"]))
    assert ("alpha", "alpho") in pairs
    assert ("beta", "betta") in pairs
    assert ("alpha", "salpha") in pairs
    assert ("alpha", "beta") not in pairs
    row = out[(out["w1"] == "alpha") & (out["w2"] == "alpho")].iloc[0]
    assert row["n1"] == 3 and row["n2"] == 1


def test_triangle_stats_modes_vs_brute(ray_session):
    import ray.data as rd
    from itertools import combinations

    from spapy_ray.stages.graph import triangle_stats

    rng = np.random.default_rng(21)
    n_v, n_e = 60, 400
    a = rng.integers(0, n_v, n_e).astype(np.int64)
    b = rng.integers(0, n_v, n_e).astype(np.int64)
    pairs = pd.DataFrame({"a": a, "b": b})

    edges = set()
    for x, y in zip(a, b):
        if x != y:
            edges.add((min(x, y), max(x, y)))
    adj = {}
    for x, y in edges:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    tri = sum(1 for x, y, z in combinations(sorted(adj), 3)
              if y in adj[x] and z in adj[x] and z in adj[y])
    wedges = sum(len(s) * (len(s) - 1) // 2 for s in adj.values())

    for mode in ("broadcast", "shuffle"):
        out = triangle_stats(rd.from_pandas(pairs), mode=mode)
        assert out["n_vertices"].iloc[0] == len(adj)
        assert out["n_edges"].iloc[0] == len(edges)
        assert out["n_wedges"].iloc[0] == wedges
        assert out["n_triangles"].iloc[0] == tri, mode


def test_triangle_stats_known_graph(ray_session):
    import ray.data as rd

    from spapy_ray.stages.graph import triangle_stats

    # K4 plus a pendant: C(4,3)=4 triangles
    pairs = pd.DataFrame({
        "a": np.array([0, 0, 0, 1, 1, 2, 3], dtype=np.int64),
        "b": np.array([1, 2, 3, 2, 3, 3, 4], dtype=np.int64)})
    out = triangle_stats(rd.from_pandas(pairs))
    assert out["n_triangles"].iloc[0] == 4
    assert out["n_edges"].iloc[0] == 7
    assert out["n_vertices"].iloc[0] == 5


def test_quantize_int8_stats_reconstruction(ray_session):
    import ray.data as rd

    from spapy_ray.stages.ann import quantize_int8_stats

    rng = np.random.default_rng(30)
    n, d = 200, 16
    m = rng.normal(size=(n, d)).astype(np.float32)
    m[:, 3] = 7.0  # constant dim -> code 0
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": list(m)})
    out = quantize_int8_stats(rd.from_pandas(df)).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)

    mm = m.astype(np.float64)
    lo, hi = mm.min(axis=0), mm.max(axis=0)
    span = np.where(hi > lo, hi - lo, 1.0)
    codes = np.clip(np.floor(((mm - lo) * 255.0) / span), 0, 255)
    codes[:, hi <= lo] = 0
    codes = codes.astype(np.int64)
    assert (out["code_sum"].to_numpy() == codes.sum(axis=1)).all()
    assert (out["code_min"].to_numpy() == codes.min(axis=1)).all()
    assert (out["code_max"].to_numpy() == codes.max(axis=1)).all()
    assert (out["dim"] == d).all()
    # codes reconstruct within one quantization step
    rec = lo + (codes + 0.5) * span / 255.0
    err = np.abs(rec - mm)[:, span > 0]
    assert err.max() <= (span.max() / 255.0)


def test_multiset_intersect_vs_counter(ray_session):
    import ray.data as rd
    from collections import Counter

    from spapy_ray.stages.relational import multiset_intersect

    rng = np.random.default_rng(14)
    a = rng.integers(0, 30, 500).astype(np.int64)
    b = rng.integers(10, 40, 400).astype(np.int64)
    out = multiset_intersect(
        rd.from_pandas(pd.DataFrame({"v": a})),
        rd.from_pandas(pd.DataFrame({"v": b})), "v") \
        .to_pandas().sort_values("v").reset_index(drop=True)
    inter = Counter(a.tolist()) & Counter(b.tolist())
    truth = pd.DataFrame(
        {"v": sorted(inter), "n": [inter[k] for k in sorted(inter)]}) \
        .astype(np.int64)
    pd.testing.assert_frame_equal(out, truth)


def test_chi2_assoc_exact(ray_session):
    import ray.data as rd

    from spapy_ray.stages.relational import chi2_assoc

    rng = np.random.default_rng(15)
    n = 2000
    df = pd.DataFrame({
        "a": rng.choice(["p", "q", "r"], n),
        "b": rng.choice(["x", "y"], n, p=[0.3, 0.7]),
    })
    out = chi2_assoc(rd.from_pandas(df), "a", "b")
    ct = pd.crosstab(df["a"], df["b"])
    N = n
    tot = 0.0
    for _, r in out.iterrows():
        o = ct.loc[r["a"], r["b"]]
        assert r["observed"] == o
        ra, cb = int(ct.loc[r["a"]].sum()), int(ct[r["b"]].sum())
        d = N * int(o) - ra * cb
        assert r["chi2_q"] == (d * d * 1_000_000) // (N * ra * cb)
        e = ra * cb / N
        tot += (o - e) ** 2 / e
    # quantized total tracks the float chi-square statistic
    assert abs(out["chi2_q"].sum() / 1e6 - tot) < 1e-4


def test_skyline2_vs_brute(ray_session):
    import ray.data as rd

    from spapy_ray.stages.relational import skyline2

    rng = np.random.default_rng(17)
    n = 400
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "price": rng.integers(0, 60, n).astype(np.int64),
        "size": rng.integers(0, 60, n).astype(np.int64),
    })
    out = skyline2(rd.from_pandas(df).repartition(7), "price", "size")
    got = set(out["id"])
    p = df["price"].to_numpy()
    s = df["size"].to_numpy()
    truth = set()
    for i in range(n):
        dom = ((p <= p[i]) & (s >= s[i]) &
               ((p < p[i]) | (s > s[i]))).any()
        if not dom:
            truth.add(i)
    assert got == truth
    # duplicated frontier points both survive
    df2 = pd.concat([df, df[df["id"].isin(list(truth)[:1])]],
                    ignore_index=True)
    out2 = skyline2(rd.from_pandas(df2), "price", "size")
    first = list(truth)[:1][0]
    assert (out2["id"] == first).sum() == 2


def test_exact_global_ranks_vs_sort(ray_session):
    import ray.data as rd

    from spapy_ray.stages.quantiles import exact_global_ranks

    rng = np.random.default_rng(19)
    v = np.concatenate([rng.normal(size=3000),
                        -rng.exponential(size=1500),
                        rng.integers(-3, 3, 500).astype(float),
                        [0.0, -0.0, 1e300, -1e300, 1e-320]])
    n = len(v)
    ranks = [0, 1, n // 7, n // 2, n - 2, n - 1]
    out = exact_global_ranks(
        rd.from_pandas(pd.DataFrame({"x": v})).repartition(11),
        "x", ranks)
    s = np.sort(v)
    assert (out["rank"].to_numpy() == np.array(sorted(set(ranks)))).all()
    got = out.set_index("rank")["value"]
    for r in ranks:
        assert got[r] == s[r], (r, got[r], s[r])


def test_lev1_verify_non_ascii_fallback():
    from spapy_ray.stages.text import _lev1_verify

    # byte-level distance: 'é' is 2 UTF-8 bytes, so 'cafe' vs 'café'
    # differs by byte insertion+substitution (distance 2) -> False;
    # 'caf\xc3' vs 'caf' IS one byte apart via the loop path
    a = np.array(["café", "naïve", "abc"], dtype=object)
    b = np.array(["cafë", "naive", "abé"], dtype=object)
    out = _lev1_verify(a, b)
    # café/cafë share the 0xC3 lead byte, differ in one continuation
    # byte -> byte-distance 1
    assert out[0] == True  # noqa: E712
    assert out[1] == False  # noqa: E712  (2-byte é vs 1-byte e)
    # 'abc' vs 'abé': c (1B) vs é (2B) -> distance 2 bytes
    assert out[2] == False  # noqa: E712


def test_ohlc_bars_vs_pandas(ray_session):
    import ray.data as rd

    from spapy_ray.stages.sessions import ohlc_bars

    df = _events(n=1200, n_users=40, seed=23)
    df["value"] = np.random.default_rng(24).normal(size=len(df))
    out = ohlc_bars(rd.from_pandas(df).repartition(9),
                    period_us=600_000_000).to_pandas() \
        .sort_values(["k", "bar"]).reset_index(drop=True)

    g = df.assign(tsu=df["ts"].astype("int64"))
    g["bar"] = g["tsu"] // 600_000_000
    g = g.sort_values(["event_type", "bar", "tsu", "event_id"],
                      kind="mergesort")
    truth = g.groupby(["event_type", "bar"], sort=False).agg(
        open=("value", "first"), high=("value", "max"),
        low=("value", "min"), close=("value", "last"),
        n=("value", "size")).reset_index() \
        .rename(columns={"event_type": "k"}) \
        .sort_values(["k", "bar"]).reset_index(drop=True)
    truth["n"] = truth["n"].astype(np.int64)
    pd.testing.assert_frame_equal(
        out[["k", "bar", "open", "high", "low", "close", "n"]],
        truth[["k", "bar", "open", "high", "low", "close", "n"]])


def test_rolling_active_users_vs_pandas(ray_session):
    import ray.data as rd

    from spapy_ray.stages.sessions import rolling_active_users

    df = _events(n=900, n_users=25, seed=26)
    out = rolling_active_users(rd.from_pandas(df), window_days=3) \
        .to_pandas().sort_values("w").reset_index(drop=True)

    ud = pd.DataFrame({
        "u": df["user_id"],
        "d": df["ts"].astype("int64") // 86_400_000_000,
    }).drop_duplicates()
    md = ud["d"].max()
    truth = {}
    for _, r in ud.iterrows():
        for i in range(3):
            w = r["d"] + i
            if w <= md:
                truth.setdefault(w, set()).add(r["u"])
    tdf = pd.DataFrame({
        "w": sorted(truth),
        "n_users": [len(truth[w]) for w in sorted(truth)]}) \
        .astype(np.int64)
    pd.testing.assert_frame_equal(out, tdf, check_dtype=False)


def test_interval_attach_vs_bruteforce(ray_session):
    import ray.data as rd

    from spapy_ray.stages.sessions import interval_attach

    rng = np.random.default_rng(31)
    n_keys = 12
    ivs = []
    for k in range(n_keys):
        t = 0
        for _ in range(rng.integers(1, 6)):
            lo = t + int(rng.integers(1, 50))
            hi = lo + int(rng.integers(0, 30))
            ivs.append((k, lo, hi))
            t = hi + 1  # non-overlapping per key
    iv = pd.DataFrame(ivs, columns=["k", "lo", "hi"]).astype(np.int64)
    pts = pd.DataFrame({
        "k": rng.integers(0, n_keys, 300).astype(np.int64),
        "pid": np.arange(300, dtype=np.int64),
        "t": rng.integers(0, 250, 300).astype(np.int64)})

    out = interval_attach(
        rd.from_pandas(pts).repartition(5),
        rd.from_pandas(iv).repartition(3),
        key="k", ts_col="t").to_pandas()
    got = set(zip(out["pid"], out["lo"]))
    truth = set()
    for _, p in pts.iterrows():
        m = iv[(iv["k"] == p["k"]) & (iv["lo"] <= p["t"]) &
               (p["t"] <= iv["hi"])]
        for _, r in m.iterrows():
            truth.add((p["pid"], r["lo"]))
    assert got == truth
    assert len(out) == len(truth)


def test_global_distinct_count_with_nulls(ray_session):
    import ray.data as rd

    from spapy_ray.stages.relational import global_distinct_count

    rng = np.random.default_rng(33)
    v = rng.integers(0, 40, 500).astype(np.float64)
    v[rng.choice(500, 60, replace=False)] = np.nan
    df = pd.DataFrame({"c": pd.array(
        [None if np.isnan(x) else int(x) for x in v],
        dtype="Int64")})
    n, nn, nd = global_distinct_count(
        rd.from_pandas(df).repartition(7), "c")
    assert n == 500
    assert nn == 60
    assert nd == df["c"].nunique()

    # all-null dataset keeps its counts
    df2 = pd.DataFrame({"c": pd.array([None] * 20, dtype="Int64")})
    n, nn, nd = global_distinct_count(rd.from_pandas(df2), "c")
    assert (n, nn, nd) == (20, 20, 0)


def test_value_islands_vs_rownumber_trick(ray_session):
    import ray.data as rd

    from spapy_ray.stages.relational import value_islands

    rng = np.random.default_rng(37)
    # values straddling several windows, with duplicates
    v = np.unique(rng.integers(0, 3000, 900))
    vals = np.concatenate([v, v[:50]])  # dupes
    out = value_islands(
        rd.from_pandas(pd.DataFrame({"x": vals})).repartition(6),
        "x", window=256).to_pandas().sort_values("start") \
        .reset_index(drop=True)

    brk = np.nonzero(np.diff(v) > 1)[0]
    starts = v[np.r_[0, brk + 1]]
    ends = v[np.r_[brk, len(v) - 1]]
    truth = pd.DataFrame({
        "start": starts, "end": ends,
        "n_values": (ends - starts + 1)}).astype(np.int64)
    pd.testing.assert_frame_equal(out, truth)
    # single contiguous run collapses to one island
    one = value_islands(
        rd.from_pandas(pd.DataFrame(
            {"x": np.arange(500, 1500, dtype=np.int64)})),
        "x", window=128).to_pandas()
    assert len(one) == 1
    assert one["start"].iloc[0] == 500 and one["end"].iloc[0] == 1499


def test_exact_global_ranks_weighted(ray_session):
    import ray.data as rd

    from spapy_ray.stages.quantiles import exact_global_ranks

    rng = np.random.default_rng(41)
    v = rng.normal(size=2000)
    w = rng.integers(1, 8, 2000).astype(np.int64)
    W = int(w.sum())
    ranks = [0, (W - 1) // 3, (W - 1) // 2, W - 1]
    out = exact_global_ranks(
        rd.from_pandas(pd.DataFrame({"x": v, "w": w})).repartition(5),
        "x", ranks, weight_col="w")
    order = np.argsort(v, kind="stable")
    cv, cw = v[order], np.cumsum(w[order])
    got = out.set_index("rank")["value"]
    for r in set(ranks):
        idx = np.searchsorted(cw, r, side="right")
        assert got[r] == cv[idx]


def test_snapshot_diff_statuses(ray_session):
    import ray.data as rd

    from spapy_ray.stages.relational import snapshot_diff

    a = pd.DataFrame({"k": np.array([1, 2, 3, 4], dtype=np.int64),
                      "fp": np.array([10, 20, 30, 40],
                                     dtype=np.int64)})
    b = pd.DataFrame({"k": np.array([2, 3, 4, 5], dtype=np.int64),
                      "fp": np.array([20, 31, 40, 50],
                                     dtype=np.int64)})
    out = snapshot_diff(rd.from_pandas(a), rd.from_pandas(b),
                        "k", "fp").to_pandas() \
        .set_index("k")["status"].to_dict()
    assert out == {1: "removed", 2: "same", 3: "changed",
                   4: "same", 5: "added"}


def test_two_sample_ks_vs_scipy_style(ray_session):
    import ray.data as rd

    from spapy_ray.stages.relational import two_sample_ks

    rng = np.random.default_rng(43)
    a = rng.integers(0, 10_000, 3000).astype(np.int64)
    b = (rng.integers(0, 10_000, 2500) + 500).astype(np.int64)
    out = two_sample_ks(
        rd.from_pandas(pd.DataFrame({"v": a})).repartition(5),
        rd.from_pandas(pd.DataFrame({"v": b})).repartition(4),
        "v", window=512)
    na, nb = len(a), len(b)
    vs = np.unique(np.concatenate([a, b]))
    ca = np.searchsorted(np.sort(a), vs, side="right")
    cb = np.searchsorted(np.sort(b), vs, side="right")
    d_num = int(np.abs(ca.astype(object) * nb
                       - cb.astype(object) * na).max())
    assert out["na"].iloc[0] == na
    assert out["nb"].iloc[0] == nb
    assert out["d_num"].iloc[0] == d_num
    # sanity: D matches the float KS statistic
    D = d_num / (na * nb)
    Df = np.abs(ca / na - cb / nb).max()
    assert abs(D - Df) < 1e-12


def test_pack_chunks_bruteforce_multiwindow(ray_session):
    # ids deliberately sparse + shuffled; window tiny so offsets
    # cross many windows; weights straddle chunk boundaries and one
    # weight (37) spans several 16-token chunks (peel loop > 2 iters)
    import ray.data as rd

    from spapy_ray.stages.packing import pack_chunks

    rng = np.random.default_rng(7)
    ids = rng.permutation(np.arange(0, 500, 3))
    wt = rng.integers(1, 38, size=len(ids))
    ds = rd.from_pandas(pd.DataFrame({"id": ids, "wt": wt}),
                        override_num_blocks=7)
    got = pack_chunks(ds, id_col="id", weight_col="wt",
                      chunk_size=16, window=32).to_pandas() \
        .sort_values("chunk_id").reset_index(drop=True)

    order = np.argsort(ids)
    sid, swt = ids[order].astype(int), wt[order].astype(int)
    rows = {}
    cur = 0
    for i, w in zip(sid, swt):
        first = True
        while w:
            k = cur // 16
            take = min(w, 16 - cur % 16)
            r = rows.setdefault(k, [0, 0, 0, 0])
            r[0] += take
            r[1] += 1
            r[2] += int(first)
            r[3] += i * take
            cur += take
            w -= take
            first = False
    exp = pd.DataFrame(
        [(k, *v) for k, v in sorted(rows.items())],
        columns=["chunk_id", "n_tokens", "n_docs", "n_starts", "ck"])
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  exp.astype("int64"))


def test_count_min_envelope_and_exactness(ray_session):
    import ray.data as rd

    from spapy_ray.kernels.hashing import fnv1a64
    from spapy_ray.stages.relational import CM_ADD, CM_MIX, count_min

    rng = np.random.default_rng(3)
    keys = rng.choice([f"k{i}" for i in range(40)], size=5000)
    ds = rd.from_pandas(pd.DataFrame({"k": keys}),
                        override_num_blocks=6)
    true = pd.Series(keys).value_counts()

    def brute(width, depth=4):
        sk = np.zeros((depth, width), dtype=np.int64)
        f = fnv1a64(list(true.index))
        for d in range(depth):
            h = ((f * np.uint64(CM_MIX[d])) + np.uint64(CM_ADD[d])) \
                % np.uint64(width)
            np.add.at(sk[d], h.astype(np.int64),
                      true.to_numpy().astype(np.int64))
        est = np.full(len(true), np.iinfo(np.int64).max, np.int64)
        for d in range(depth):
            h = ((f * np.uint64(CM_MIX[d])) + np.uint64(CM_ADD[d])) \
                % np.uint64(width)
            est = np.minimum(est, sk[d][h.astype(np.int64)])
        return dict(zip(true.index, est))

    for width in (4, 4096):  # forced collisions vs collision-free
        got = count_min(ds, "k", width=width).to_pandas()
        gm = dict(zip(got["key"], got["c_est"]))
        exp = brute(width)
        assert gm == exp
        assert all(gm[k] >= true[k] for k in true.index)
    # wide sketch on 40 keys: whp exact
    assert all(gm[k] == true[k] for k in true.index)


def test_hll_registers_estimate_envelope(ray_session):
    import ray.data as rd

    from spapy_ray.stages.relational import hll_registers

    n = 50_000
    ds = rd.from_pandas(pd.DataFrame({"k": np.arange(n, dtype=np.int64)}))
    out = hll_registers(ds, "k", p=10)
    assert len(out) == 1024
    m = 1024
    # apply the alpha bias correction driver-side and check the
    # classic ~1.04/sqrt(m) error envelope (generous 4x margin)
    alpha = 0.7213 / (1 + 1.079 / m)
    # est_q is m^2/Z exactly (the 2^55 scaling cancels in the ratio)
    corrected = alpha * float(out["est_q"].iloc[0])
    assert abs(corrected - n) / n < 4 * 1.04 / np.sqrt(m)


def test_hll_registers_merge_equals_whole(ray_session):
    import ray.data as rd

    from spapy_ray.stages.relational import hll_registers

    ks = np.arange(9_999, dtype=np.int64) * 7
    a = hll_registers(rd.from_pandas(pd.DataFrame({"k": ks[:4000]})),
                      "k", p=10)
    b = hll_registers(rd.from_pandas(pd.DataFrame({"k": ks[4000:]})),
                      "k", p=10)
    whole = hll_registers(rd.from_pandas(pd.DataFrame({"k": ks})),
                          "k", p=10)
    merged = np.maximum(a["rho"].to_numpy(), b["rho"].to_numpy())
    assert np.array_equal(merged, whole["rho"].to_numpy())


def test_two_sample_emd_bruteforce(ray_session):
    import ray.data as rd

    from spapy_ray.stages.relational import two_sample_emd

    rng = np.random.default_rng(9)
    # negatives + values spanning several 64-wide windows + gaps
    a = rng.integers(-300, 300, 700) * rng.integers(1, 4, 700)
    b = rng.integers(-250, 350, 500) * rng.integers(1, 4, 500)
    got = two_sample_emd(
        rd.from_pandas(pd.DataFrame({"v": a})),
        rd.from_pandas(pd.DataFrame({"v": b})), "v",
        window=64, buckets=8).iloc[0]
    na, nb = len(a), len(b)
    vals = np.unique(np.concatenate([a, b]))
    ca = np.searchsorted(np.sort(a), vals, side="right")
    cb = np.searchsorted(np.sort(b), vals, side="right")
    emd = int(np.sum(np.abs(ca[:-1].astype(object) * nb
                            - cb[:-1].astype(object) * na)
                     * np.diff(vals)))
    assert (int(got["na"]), int(got["nb"])) == (na, nb)
    assert int(got["emd_hi"]) * (1 << 62) + int(got["emd_lo"]) == emd
    # identical samples -> zero transport
    z = two_sample_emd(
        rd.from_pandas(pd.DataFrame({"v": a})),
        rd.from_pandas(pd.DataFrame({"v": a})), "v",
        window=64, buckets=8).iloc[0]
    assert int(z["emd_hi"]) == 0 and int(z["emd_lo"]) == 0


def test_grouped_two_sample_ks_matches_global(ray_session):
    import ray.data as rd

    from spapy_ray.stages.relational import (grouped_two_sample_ks,
                                             two_sample_ks)

    rng = np.random.default_rng(12)
    ga = pd.DataFrame({
        "g": rng.choice(["x", "y", "z"], 900),
        "v": rng.integers(-500, 500, 900)})
    gb = pd.DataFrame({
        "g": rng.choice(["x", "y", "z"], 700),
        "v": rng.integers(-400, 600, 700)})
    got = grouped_two_sample_ks(
        rd.from_pandas(ga), rd.from_pandas(gb), "g", "v",
        window=64, buckets=8)
    for g in ("x", "y", "z"):
        ref = two_sample_ks(
            rd.from_pandas(ga[ga.g == g][["v"]]),
            rd.from_pandas(gb[gb.g == g][["v"]]), "v",
            window=64, buckets=8).iloc[0]
        row = got[got["g"] == g].iloc[0]
        assert (row["na"], row["nb"], row["d_num"]) == \
            (ref["na"], ref["nb"], ref["d_num"])


def test_interval_concurrency_bruteforce(ray_session):
    import ray.data as rd

    from spapy_ray.stages.sessions import interval_concurrency

    rng = np.random.default_rng(13)
    day = 86_400_000_000
    opens = rng.integers(0, 400, 300) * day
    closes = opens + rng.integers(1, 90, 300) * day
    df = pd.DataFrame({"t_open": opens, "t_close": closes})
    got = interval_concurrency(rd.from_pandas(df),
                               window_us=30 * day)
    # brute: running count at every change point, max per month
    ev = sorted([(int(t), 1) for t in opens]
                + [(int(t), -1) for t in closes])
    from collections import defaultdict
    net = defaultdict(int)
    for t, d in ev:
        net[t] += d
    run = 0
    best = {}
    for t in sorted(net):
        run += net[t]
        ym = int(np.datetime64(int(t), "us").astype("datetime64[M]")
                 .astype(np.int64))
        best[ym] = max(best.get(ym, -1 << 60), run)
    want = pd.DataFrame(sorted(best.items()),
                        columns=["ym", "max_open"]).astype(np.int64)
    pd.testing.assert_frame_equal(got, want)


def test_kmeans_int_matches_sequential_lloyd(ray_session):
    import ray.data as rd

    from spapy_ray.stages.ann import kmeans_int

    rng = np.random.default_rng(14)
    n, dim, k, iters, scale = 120, 8, 4, 3, 1 << 20
    emb = rng.normal(size=(n, dim)).astype(np.float32)
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": list(emb)}))
    got = kmeans_int(ds, k=k, iters=iters, scale=scale) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)

    x = np.trunc(emb.astype(np.float64) * scale).astype(np.int64)
    c = x[:k].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for j in range(k):
            m = a == j
            if m.any():
                s = x[m].sum(axis=0)
                c[j] = np.sign(s) * (np.abs(s) // m.sum())
    d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
    want = d.argmin(axis=1).astype(np.int64)
    assert np.array_equal(got["cluster"].to_numpy(), want)
