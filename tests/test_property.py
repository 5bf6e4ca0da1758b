"""Property-based kernel tests (hypothesis): inverses, parity with
reference implementations, and closure invariants — pure kernels, no
Ray session needed."""

import numpy as np
from hypothesis import given, settings, strategies as st

from spapy_ray.kernels import cells, wkb
from spapy_ray.kernels.hashing import fnv1a64

SET = settings(max_examples=60, deadline=None)

finite_coord = st.floats(min_value=-1e6, max_value=1e6,
                         allow_nan=False, allow_infinity=False)


@SET
@given(st.lists(st.tuples(finite_coord, finite_coord),
                min_size=2, max_size=40))
def test_wkb_linestring_roundtrip(pts):
    arr = np.array(pts, dtype=np.float64)
    t, v = wkb.decode(wkb.encode("LineString", arr))
    assert t == "LineString"
    assert np.array_equal(np.asarray(v), arr)


@SET
@given(st.lists(st.tuples(finite_coord, finite_coord),
                min_size=3, max_size=20),
       st.integers(0, 3))
def test_wkb_polygon_roundtrip(ring_pts, extra_rings):
    ring = np.array(ring_pts + ring_pts[:1], dtype=np.float64)
    rings = [ring] + [ring * 0.5] * extra_rings
    t, v = wkb.decode(wkb.encode("Polygon", rings))
    assert t == "Polygon"
    assert len(v) == len(rings)
    for got, exp in zip(v, rings):
        assert np.array_equal(np.asarray(got), exp)


@SET
@given(st.floats(min_value=-180, max_value=180, allow_nan=False),
       st.floats(min_value=-90, max_value=90, allow_nan=False),
       st.integers(1, 15), st.integers(0, 15))
def test_cells_decode_inverse_and_parent_consistency(lon, lat, r, pr_raw):
    pr = min(pr_raw, r)
    c = cells.encode(np.array([lon]), np.array([lat]), r)
    x, y, res = cells.decode_xy(c)
    assert res[0] == r
    assert np.array_equal(cells.encode_xy(x, y, r), c)
    # parent truncation == direct encode at the coarser res
    assert cells.parent(c, pr)[0] == \
        cells.encode(np.array([lon]), np.array([lat]), pr)[0]


def _fnv1a_ref(s: str) -> int:
    h = 0xCBF29CE484222325
    for byte in s.encode("utf-8"):
        h ^= byte
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


@SET
@given(st.lists(st.text(max_size=40), min_size=1, max_size=20))
def test_fnv1a_matches_bytewise_reference(strs):
    import pyarrow as pa

    got = fnv1a64(pa.array(strs, type=pa.string()))
    exp = np.array([_fnv1a_ref(s) for s in strs], dtype=np.uint64)
    assert np.array_equal(np.asarray(got, dtype=np.uint64), exp)


def _uf_ref(a, b):
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for x, y in zip(a, b):
        rx, ry = find(int(x)), find(int(y))
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    return {int(v): find(int(v))
            for v in set(a.tolist()) | set(b.tolist())}


@SET
@given(st.lists(st.tuples(st.integers(0, 60), st.integers(0, 60)),
                min_size=1, max_size=120))
def test_min_label_closure_matches_union_find(edges):
    from spapy_ray.stages.components import _min_label_closure

    a = np.array([e[0] for e in edges], dtype=np.int64)
    b = np.array([e[1] for e in edges], dtype=np.int64)
    v, lab = _min_label_closure(a, b)
    assert dict(zip(v.tolist(), lab.tolist())) == _uf_ref(a, b)


@SET
@given(st.integers(1, 24), st.integers(1, 24), st.booleans(),
       st.integers(0, 2**32 - 1))
def test_png_roundtrip_random(h, w, rgba, seed):
    from spapy_ray.stages.render import decode_png, encode_png

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 4 if rgba else 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


@SET
@given(st.lists(st.tuples(st.integers(-10**7, 10**7),
                          st.integers(-10**7, 10**7)),
                min_size=1, max_size=60),
       st.integers(1, 5_000_000))
def test_within_distance_local_symmetry(pts, r5):
    from spapy_ray.stages.distjoin import within_distance_pairs_local

    lat5 = np.array([p[0] for p in pts], dtype=np.int64)
    lon5 = np.array([p[1] for p in pts], dtype=np.int64)
    i, j = within_distance_pairs_local(lat5, lon5, r5)
    pairs = set(zip(i.tolist(), j.tolist()))
    # symmetric, irreflexive, and predicate-exact
    assert all((b, a) in pairs for a, b in pairs)
    assert all(a != b for a, b in pairs)
    for a, b in pairs:
        d2 = (lat5[a] - lat5[b]) ** 2 + (lon5[a] - lon5[b]) ** 2
        assert d2 <= r5 * r5


@SET
@given(st.binary(max_size=4096))
def test_lzw_codec_roundtrip_property(data):
    """TIFF LZW encode∘decode == identity on arbitrary bytes."""
    from spapy_ray.sources.geotiff import lzw_decode, lzw_encode

    assert lzw_decode(lzw_encode(data)) == data


@SET
@given(st.integers(1, 4), st.integers(0, 255), st.integers(1, 64))
def test_lzw_runs_compress_and_roundtrip(rep, byte, n):
    """Runs compress below identity and still round-trip."""
    from spapy_ray.sources.geotiff import lzw_decode, lzw_encode

    data = bytes([byte]) * (n * 64 * rep)
    enc = lzw_encode(data)
    assert lzw_decode(enc) == data
    assert len(enc) < len(data) + 8


def test_trajectory_stats_brute_parity(ray_session):
    """trajectory_stats == per-key sequential bigint reference."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from spapy_ray.stages.spatialstats import trajectory_stats

    rng = np.random.default_rng(21)
    n = 3000
    df = pd.DataFrame({
        "host": rng.integers(0, 40, n).astype(str),
        "us": rng.permutation(n).astype(np.int64),
        "url": [f"u{i}" for i in range(n)],
        "lon5": rng.integers(-18_000_000, 18_000_000, n),
        "lat5": rng.integers(-8_500_000, 8_500_000, n)})

    got = trajectory_stats(rd.from_pandas(df), "host",
                           ["us", "url", "lat5", "lon5"], buckets=8) \
        .to_pandas().sort_values("host").reset_index(drop=True)

    rows = []
    for h, g in df.sort_values(["host", "us"]).groupby("host"):
        x = [int(v) for v in g["lon5"]]
        y = [int(v) for v in g["lat5"]]
        m = len(x)
        path = sum(abs(x[i] - x[i - 1]) + abs(y[i] - y[i - 1])
                   for i in range(1, m))
        net = abs(x[-1] - x[0]) + abs(y[-1] - y[0])
        ax = [v - x[0] for v in x]
        ay = [v - y[0] for v in y]
        num = m * sum(a * a + b * b for a, b in zip(ax, ay)) \
            - sum(ax) ** 2 - sum(ay) ** 2
        rows.append((h, m, path, net, num // (m * m)))
    want = pd.DataFrame(rows, columns=["host", "n_points", "l1_path",
                                       "net_l1", "gyr_q"]) \
        .sort_values("host").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({c: "int64" for c in want.columns[1:]}),
        want.astype({c: "int64" for c in want.columns[1:]}))


# ---- session-12 pure-fold properties (no Ray: the folds are the
# deterministic cores the distributed stages wrap)


@SET
@given(st.lists(st.integers(-1000, 1000), min_size=2, max_size=200),
       st.integers(0, 30))
def test_gini_fold_matches_bruteforce(vals, seed):
    from spapy_ray.stages.ml import _gini_fold

    rng = np.random.default_rng(seed)
    f = np.array(vals, dtype=np.int64)
    y = rng.integers(0, 2, len(f)).astype(np.int64)
    uv, inv = np.unique(f, return_inverse=True)
    if len(uv) < 2:
        return
    n = np.bincount(inv).astype(np.int64)
    pos = np.bincount(inv, weights=y).astype(np.int64)
    vv, nl, posl, nr, posr, score = _gini_fold(uv, n, pos)
    # brute force each threshold
    for i, v in enumerate(vv):
        L, R = y[f <= v], y[f > v]
        assert nl[i] == len(L) and nr[i] == len(R)
        assert posl[i] == L.sum() and posr[i] == R.sum()
        num = ((nl[i] ** 2 - posl[i] ** 2 - (nl[i] - posl[i]) ** 2)
               * nr[i]
               + (nr[i] ** 2 - posr[i] ** 2 - (nr[i] - posr[i]) ** 2)
               * nl[i])
        assert score[i] == num / (nl[i] * nr[i])


@SET
@given(st.lists(st.integers(0, (1 << 64) - 1), min_size=1,
                max_size=200),
       st.integers(1, 10))
def test_cms_mod_composition(hashes, width_pow):
    """The CMS twin-exactness identity: (h·M mod 2^64) mod w ==
    ((h·M) mod 2^62) mod w == (h·M) mod w for power-of-two w — the
    proof the engine's uint64 wrap and the HUGEINT twin rest on."""
    from spapy_ray.stages.relational import CMS_MULTS

    w = 1 << width_pow
    h = np.array(hashes, dtype=np.uint64)
    for mult in CMS_MULTS:
        eng = (h * np.uint64(mult)) % np.uint64(w)
        exact = [((int(x) * mult) % (1 << 62)) % w for x in hashes]
        assert [int(e) for e in eng] == exact
