"""Regression tests for the round-3 ADVICE findings:

1. hash_join semi/anti/merge paths must use SQL join semantics on
   NULL keys (NULL never matches, including NULL-to-NULL).
2. broadcast_join is a unique-key lookup join — duplicate build keys
   must raise, not silently drop matches.
3. KLL compaction must conserve total sketch weight on odd-length
   levels.
4. TIFF IFD external value blocks must stay word-aligned (even
   offsets) after an odd-length ASCII value.
5. DBF integer fields are 20 chars wide — extreme int64 values
   round-trip instead of being left-truncated.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _join_fixture():
    left = pa.table({
        "k": pa.array([1, 2, None, None, 3], type=pa.int64()),
        "lv": pa.array([10, 20, 30, 40, 50], type=pa.int64())})
    right = pa.table({
        "k": pa.array([2, None, 4], type=pa.int64()),
        "rv": pa.array([200, 999, 400], type=pa.int64())})
    return left, right


def _duck(left, right, sql):
    import duckdb

    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    try:
        return con.execute(sql).df()
    finally:
        con.close()


@pytest.mark.parametrize("how", ["semi", "anti", "inner", "left", "outer"])
def test_hash_join_null_keys_sql_semantics(ray_session, how):
    """NULL keys never match — engine == DuckDB on every join type."""
    import ray.data as rd

    from spapy_ray.stages.relational import hash_join

    left, right = _join_fixture()
    out = hash_join(rd.from_arrow(left), rd.from_arrow(right),
                    on="k", how=how).to_pandas()
    sql = {
        "semi": "SELECT * FROM l WHERE EXISTS "
                "(SELECT 1 FROM r WHERE r.k = l.k)",
        "anti": "SELECT * FROM l WHERE NOT EXISTS "
                "(SELECT 1 FROM r WHERE r.k = l.k)",
        "inner": "SELECT l.k, l.lv, r.rv FROM l JOIN r ON l.k = r.k",
        "left": "SELECT l.k, l.lv, r.rv FROM l LEFT JOIN r ON l.k = r.k",
        "outer": "SELECT l.k, l.lv, r.rv, r.k AS k_right "
                 "FROM l FULL JOIN r ON l.k = r.k",
    }[how]
    want = _duck(left, right, sql)
    cols = ["k", "lv"] if how in ("semi", "anti") else ["k", "lv", "rv"]
    if how == "outer":
        # right-unmatched rows: compare the right key too (the engine
        # carries it as the suffixed column)
        rk = [c for c in out.columns if c.startswith("k_")]
        out = out.rename(columns={rk[0]: "k_right"})
        cols = cols + ["k_right"]
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b), (how, a, b)
    for c in cols:
        av = a[c].astype("float64")
        bv = b[c].astype("float64")
        assert ((av == bv) | (av.isna() & bv.isna())).all(), (how, c, a, b)


def test_broadcast_join_rejects_duplicate_build_keys(ray_session):
    from spapy_ray.stages.relational import BroadcastHashJoin

    small = pa.table({"k": [1, 2, 2, 3], "v": [1.0, 2.0, 2.5, 3.0]})
    with pytest.raises(ValueError, match="duplicate"):
        BroadcastHashJoin(small_table=small, key="k")


def test_broadcast_join_unique_keys_still_work(ray_session):
    from spapy_ray.stages.relational import BroadcastHashJoin

    small = pa.table({"k": [3, 1, 2], "v": [30, 10, 20]})
    j = BroadcastHashJoin(small_table=small, key="k")
    out = j(pa.table({"k": [2, 3, 9]}))
    assert out.column("v").to_pylist() == [20, 30]


def test_kll_compaction_conserves_weight():
    """sum(2^level * len(level)) must equal the item count fed in,
    even when levels compact at odd lengths (ADVICE r3: the old
    even-index promotion of an odd level inflated weight by one per
    compaction)."""
    from spapy_ray.stages.quantiles import _compact_levels

    rng = np.random.default_rng(7)
    k = 8
    for n in (17, 33, 101, 1023):
        levels = {0: rng.standard_normal(n)}
        out = _compact_levels(levels, k)
        weight = sum((1 << lv) * len(v) for lv, v in out.items())
        assert weight == n, (n, {lv: len(v) for lv, v in out.items()})


def test_tiff_external_blocks_word_aligned():
    """An odd-length ASCII value must not knock later external value
    offsets off word alignment (TIFF 6.0)."""
    import struct

    from spapy_ray.sources.geotiff import _IFDWriter

    w = _IFDWriter()
    w.add(270, 2, "abcd")        # ImageDescription: 4+NUL = 5 bytes, odd
    w.add(339, 3, [1, 1, 1])     # 3 SHORTs = 6 bytes, external
    w.add(340, 12, 1.5)          # DOUBLE, 8 bytes, external
    blob = w.render(8)
    n = struct.unpack("<H", blob[:2])[0]
    for i in range(n):
        tag, ftype, count, val = struct.unpack(
            "<HHII", blob[2 + i * 12:2 + (i + 1) * 12])
        from spapy_ray.sources.geotiff import _FIELD
        ch, size = _FIELD[ftype]
        if count * size > 4:
            assert val % 2 == 0, (tag, val)


def test_dbf_int64_extremes_roundtrip(tmp_path):
    from spapy_ray.sources.shapefile import read_shapefile, write_shapefile

    from spapy_ray.kernels import wkb as K

    pts = [K.encode_point(float(i), float(i)) for i in range(3)]
    tbl = pa.table({
        "geom_wkb": pa.array(pts, type=pa.binary()),
        "big": pa.array([2 ** 63 - 1, -(2 ** 63) + 1, 123],
                        type=pa.int64())})
    p = str(tmp_path / "t.shp")
    write_shapefile(tbl, p)
    back, _meta = read_shapefile(p)
    assert sorted(back.column("big").to_pylist()) == \
        sorted([2 ** 63 - 1, -(2 ** 63) + 1, 123])


def test_bloom_filter_join_matches_plain(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from spapy_ray.stages.relational import bloom_filter_join, \
        hash_join

    rng = np.random.default_rng(21)
    left = pd.DataFrame({
        "k": rng.integers(0, 500, 3000).astype("float64"),
        "v": np.arange(3000)})
    left.loc[::97, "k"] = np.nan          # null probe keys
    right = pd.DataFrame({"k": rng.integers(0, 80, 200)})
    lds, rds = rd.from_pandas(left), rd.from_pandas(right)
    for how in ("semi", "anti"):
        plain = hash_join(lds, rds, on="k", how=how).to_pandas() \
            .sort_values("v").reset_index(drop=True)
        bloom = bloom_filter_join(lds, rds, on="k", how=how,
                                  bits_log2=12).to_pandas() \
            .sort_values("v").reset_index(drop=True)
        pd.testing.assert_frame_equal(bloom, plain)


def test_bloom_filter_join_string_keys(ray_session):
    import pandas as pd
    import ray.data as rd

    from spapy_ray.stages.relational import bloom_filter_join

    left = rd.from_pandas(pd.DataFrame(
        {"u": [f"url{i}" for i in range(100)]}))
    right = rd.from_pandas(pd.DataFrame(
        {"u": [f"url{i}" for i in range(0, 100, 10)]}))
    semi = bloom_filter_join(left, right, on="u", how="semi") \
        .to_pandas()
    anti = bloom_filter_join(left, right, on="u", how="anti") \
        .to_pandas()
    assert len(semi) == 10 and len(anti) == 90
    assert set(semi["u"]) == {f"url{i}" for i in range(0, 100, 10)}


def test_hash_split_group_consistent_and_complete(ray_session):
    import pandas as pd
    import ray.data as rd

    from spapy_ray.stages.relational import hash_split

    df = pd.DataFrame({"u": [f"k{i % 40}" for i in range(400)],
                       "v": range(400)})
    out = hash_split(rd.from_pandas(df), "u",
                     {"train": 80, "val": 10, "test": 10}).to_pandas()
    assert len(out) == 400
    # group-consistency: one split per key
    assert (out.groupby("u")["split"].nunique() == 1).all()
    assert set(out["split"]) <= {"train", "val", "test"}
    import pytest

    with pytest.raises(ValueError):
        hash_split(rd.from_pandas(df), "u", {"a": 50, "b": 49})
