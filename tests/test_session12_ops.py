"""Session-12 stage parity: stay_points vs a sequential walk,
best_split_gini vs exhaustive threshold search, grouped_moments vs
direct numpy central-moment numerators."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(tbl):
    import ray.data as rd

    return rd.from_arrow(tbl)


def test_stay_points_matches_sequential(ray_session):
    from spapy_ray.stages.spatialstats import stay_points

    rng = np.random.default_rng(5)
    n, radius, min_pts = 4000, 40, 2
    keys = rng.integers(0, 37, n)
    ts = np.arange(n, dtype=np.int64) * 1000
    # random walk with occasional jumps so both stays and breaks occur
    x = np.cumsum(rng.integers(-12, 13, n)).astype(np.int64)
    y = np.cumsum(rng.integers(-12, 13, n)).astype(np.int64)
    jump = rng.random(n) < 0.15
    x[jump] += rng.integers(100, 500, int(jump.sum()))
    t = pa.table({"k": pa.array(keys), "us": pa.array(ts),
                  "x": pa.array(x), "y": pa.array(y)})

    got = stay_points(_ds(t), "k", ["us"], "x", "y",
                      radius=radius, min_pts=min_pts).to_pandas()
    got = got.sort_values(["k", "seg_id"]).reset_index(drop=True)

    # sequential oracle
    df = pd.DataFrame({"k": keys, "us": ts, "x": x, "y": y}) \
        .sort_values(["k", "us"], kind="stable")
    rows = []
    for k, g in df.groupby("k", sort=True):
        seg, buf = 0, []
        prev = None
        for r in g.itertuples(index=False):
            brk = prev is None or \
                abs(r.x - prev.x) + abs(r.y - prev.y) > radius
            if brk:
                if len(buf) >= min_pts:
                    rows.append((k, seg, len(buf),
                                 buf[-1].us - buf[0].us,
                                 sum(b.x for b in buf),
                                 sum(b.y for b in buf)))
                seg += 1
                buf = []
            buf.append(r)
            prev = r
        if len(buf) >= min_pts:
            rows.append((k, seg, len(buf), buf[-1].us - buf[0].us,
                         sum(b.x for b in buf), sum(b.y for b in buf)))
    want = pd.DataFrame(rows, columns=["k", "seg_id", "n_points",
                                       "dwell_us", "sum_x", "sum_y"]) \
        .sort_values(["k", "seg_id"]).reset_index(drop=True)
    assert len(got) == len(want) and len(want) > 10
    for c in want.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_best_split_matches_exhaustive(ray_session):
    from spapy_ray.stages.ml import best_split_gini

    rng = np.random.default_rng(11)
    f = rng.integers(0, 30, 20000).astype(np.int64)
    # label correlated with the feature so the split is non-trivial
    y = ((f + rng.integers(0, 12, 20000)) > 20).astype(np.int64)
    got = best_split_gini(
        _ds(pa.table({"f": pa.array(f), "y": pa.array(y)})),
        "f", "y").to_pandas().iloc[0]

    vals = np.unique(f)
    best = None
    for v in vals[:-1]:
        L, R = y[f <= v], y[f > v]
        nl, nr = len(L), len(R)
        pl, pr = int(L.sum()), int(R.sum())
        num = ((nl * nl - pl * pl - (nl - pl) ** 2) * nr
               + (nr * nr - pr * pr - (nr - pr) ** 2) * nl)
        score = num / (nl * nr)
        if best is None or score < best[1]:
            best = (int(v), score, nl, pl, nr, pr)
    assert int(got["split_at"]) == best[0]
    assert float(got["score"]) == pytest.approx(best[1], abs=0)
    assert (int(got["n_left"]), int(got["pos_left"]),
            int(got["n_right"]), int(got["pos_right"])) == best[2:]


def test_grouped_moments_exact(ray_session):
    from spapy_ray.stages.ml import grouped_moments

    rng = np.random.default_rng(3)
    g = rng.integers(0, 4, 5000)
    v = rng.integers(1, 51, 5000).astype(np.int64)
    got = grouped_moments(
        _ds(pa.table({"g": pa.array(g), "v": pa.array(v)})),
        "g", "v").sort_values("g").reset_index(drop=True)
    for i, key in enumerate(sorted(set(g.tolist()))):
        x = [int(t) for t in v[g == key]]
        n = len(x)
        s1, s2 = sum(x), sum(t * t for t in x)
        s3, s4 = sum(t ** 3 for t in x), sum(t ** 4 for t in x)
        m3 = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 ** 3
        m4 = (n ** 3 * s4 - 4 * n * n * s1 * s3
              + 6 * n * s1 * s1 * s2 - 3 * s1 ** 4)
        r = got.iloc[i]
        assert (int(r["n"]), int(r["s1"]), int(r["s2"])) == (n, s1, s2)
        assert float(r["m3_num"]) == float(m3)
        assert float(r["m4_num"]) == float(m4)
        # cross-check: m3_num sign == direct central-moment sign
        mu = s1 / n
        direct = sum((t - mu) ** 3 for t in x)
        assert (m3 > 0) == (direct > 0) or abs(direct) < 1e-6


def test_radix_exact_ranks_matches_sort(ray_session):
    from spapy_ray.stages.relational import radix_exact_ranks

    rng = np.random.default_rng(9)
    # lognormal-ish skewed ints + heavy ties
    x = np.concatenate([
        rng.integers(0, 1 << 20, 30000),
        np.full(5000, 77777, dtype=np.int64),
        rng.integers(0, 200, 5000)]).astype(np.int64)
    t = pa.table({"v": pa.array(x)})
    want = np.sort(x)
    ranks = [0, 1, len(x) // 3, (len(x) - 1) // 2, len(x) // 2,
             len(x) - 1]
    vals, total = radix_exact_ranks(_ds(t), "v",
                                    lambda n: ranks, shift=10)
    assert total == len(x)
    assert vals == [int(want[r]) for r in ranks]

    # out-of-range rank raises
    with pytest.raises(IndexError):
        radix_exact_ranks(_ds(t), "v", lambda n: [n], shift=10)


def test_cms_never_underestimates(ray_session):
    from spapy_ray.stages.relational import (cms_point_query,
                                             count_min_sketch)

    rng = np.random.default_rng(21)
    keys = [f"k{int(i)}" for i in rng.integers(0, 900, 25000)]
    got = count_min_sketch(
        _ds(pa.table({"k": pa.array(keys)})), "k", width=128)
    assert got.shape == (4, 128)
    # every row of the matrix sums to the total count (mergeable,
    # no drops)
    assert (got.sum(axis=1) == len(keys)).all()
    import collections

    true = collections.Counter(keys)
    uniq = sorted(true)
    est = cms_point_query(got, uniq)
    tv = np.array([true[u] for u in uniq])
    assert (est >= tv).all()              # CMS guarantee
    # width=128 on 900 keys: estimates stay within the classic
    # eps*N envelope with huge margin
    assert (est - tv).max() <= 4 * len(keys) // 128

    with pytest.raises(ValueError):
        count_min_sketch(_ds(pa.table({"k": pa.array(keys)})), "k",
                         width=100)


def test_radix_exact_ranks_recursive_path(ray_session):
    from spapy_ray.stages.relational import radix_exact_ranks

    rng = np.random.default_rng(31)
    # one hot bucket at shift=10 (values 0..1023) holding 60% of rows
    x = np.concatenate([
        rng.integers(0, 1024, 24000),
        rng.integers(0, 1 << 18, 16000)]).astype(np.int64)
    t = pa.table({"v": pa.array(x)})
    want = np.sort(x)
    ranks = [100, len(x) // 2, len(x) - 7]
    # cap forces recursion: the hot bucket alone exceeds 2000 rows
    vals, total = radix_exact_ranks(_ds(t), "v", lambda n: ranks,
                                    shift=10, max_scan_rows=2000)
    assert total == len(x)
    assert vals == [int(want[r]) for r in ranks]


def test_stencil_halo2_matches_whole_array(ray_session):
    """halo=2 block-mosaic exchange == np.pad(mode='edge') on the
    whole raster, including a non-square tile grid and block
    boundaries."""
    from spapy_ray.sources.rasters import RasterMeta
    from spapy_ray.stages.raster import decode_tile, stencil_op

    rng = np.random.default_rng(13)
    T, nx, ny = 16, 5, 3
    meta = RasterMeta(width=nx * T, height=ny * T, tile_size=T,
                      x_min=0.0, y_max=float(ny * T),
                      pixel_w=1.0, pixel_h=-1.0)
    full = rng.integers(0, 256, (ny * T, nx * T)).astype(np.int32)

    rows = []
    for ty in range(ny):
        for tx in range(nx):
            a = full[ty * T:(ty + 1) * T, tx * T:(tx + 1) * T]
            rows.append({"tx": tx, "ty": ty,
                         "data": np.ascontiguousarray(a).tobytes()})
    import ray.data as rd

    ds = rd.from_items(rows)

    def k5(pad):
        z = pad.astype(np.int64)
        h, w = pad.shape[0] - 4, pad.shape[1] - 4
        out = np.zeros((h, w), dtype=np.int64)
        for dy in range(5):
            for dx in range(5):
                out += (dy * 5 + dx + 1) * z[dy:dy + h, dx:dx + w]
        return out.astype(np.int32)

    got = stencil_op(ds, meta, k5, dtype="int32", out_dtype="int32",
                     halo=2, block=2).to_pandas()
    pf = np.pad(full.astype(np.int64), 2, mode="edge")
    want = np.zeros((ny * T, nx * T), dtype=np.int64)
    for dy in range(5):
        for dx in range(5):
            want += (dy * 5 + dx + 1) * pf[dy:dy + ny * T,
                                           dx:dx + nx * T]
    for r in got.itertuples(index=False):
        a = decode_tile(r.data, "int32", T)
        w = want[r.ty * T:(r.ty + 1) * T, r.tx * T:(r.tx + 1) * T]
        assert (a == w.astype(np.int32)).all(), (r.tx, r.ty)
    assert len(got) == nx * ny

    with pytest.raises(ValueError):
        stencil_op(ds, meta, k5, dtype="int32", halo=0)


def test_grouped_hll_estimate_envelope(ray_session):
    """Grouped HLL estimates track true per-key cardinalities within
    the classic ~1.04/sqrt(m) envelope (x4 slack) after the alpha
    correction, and the grouped fold == the global hll_registers
    estimate when there is one key."""
    from spapy_ray.stages.relational import (grouped_hll_distinct,
                                             hll_registers)

    rng = np.random.default_rng(17)
    # all above the 2.5·m small-range threshold — raw HLL (no
    # linear-counting branch) is only calibrated there
    sizes = {"a": 2000, "b": 20000, "c": 700}
    keys, vals = [], []
    for k, n in sizes.items():
        v = rng.integers(0, 1 << 62, n * 2)[:n]  # distinct-ish
        keys += [k] * (2 * n)                    # duplicate each val
        vals += list(v) + list(v)
    t = pa.table({"k": pa.array(keys),
                  "hv": pa.array(np.array(vals, dtype=np.uint64))})
    got = grouped_hll_distinct(_ds(t), "k", "hv", p=8).to_pandas()
    got = dict(zip(got["k"], got["est_q"]))
    alpha = 0.7182725932495458  # alpha_256 * m correction factor
    for k, n in sizes.items():
        est = alpha * float(got[k])
        assert abs(est - n) / n < 4 * 1.04 / np.sqrt(256), (k, est, n)

    one = pa.table({"k": pa.array(["x"] * 1000),
                    "hv": pa.array(rng.integers(
                        0, 1 << 62, 1000).astype(np.uint64))})
    g1 = grouped_hll_distinct(_ds(one), "k", "hv", p=8).to_pandas()
    glob = hll_registers(_ds(pa.table({"v": one.column("hv")})),
                         "v", p=8)
    assert int(g1["est_q"].iloc[0]) == int(glob["est_q"].iloc[0])
