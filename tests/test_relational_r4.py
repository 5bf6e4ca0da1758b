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
