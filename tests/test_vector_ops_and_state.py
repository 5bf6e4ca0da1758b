"""Vector transform stages, CRS transform stage, resumable manifest,
cell-partitioned kNN — end-to-end over Ray (shared session)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from spapy_ray.kernels import geom, wkb
from spapy_ray.sources.zones import zones_table


def _zones_ds(n=40):
    import ray.data as rd

    return rd.from_arrow(zones_table(n))


def test_buffer_points(ray_session):
    import ray.data as rd

    from spapy_ray.stages.vector_ops import buffer

    pts = pa.table({
        "pid": pa.array([0, 1]),
        "geom_wkb": pa.array([wkb.encode_point(0.0, 0.0),
                              wkb.encode_point(10.0, 5.0)], type=pa.binary()),
    })
    out = buffer(rd.from_arrow(pts), 2.0).to_pandas()
    assert len(out) == 2
    t, v = wkb.decode(out["geom_wkb"].iloc[0])
    assert t == "Polygon"
    a = abs(geom.ring_signed_area(v[0]))
    assert 0.99 * np.pi * 4 < a < np.pi * 4


def test_buffer_polygon_grows_area(ray_session):
    from spapy_ray.stages.vector_ops import buffer, measures

    src = measures(_zones_ds(10)).to_pandas()
    out = measures(buffer(_zones_ds(10), 0.5)).to_pandas()
    m = pd.merge(src, out, on="zone_id", suffixes=("_a", "_b"))
    assert (m["area_b"] > m["area_a"]).all()


def test_simplify_and_densify_roundtrip(ray_session):
    from spapy_ray.stages.vector_ops import densify, simplify

    dense = densify(_zones_ds(10), 0.2)
    n_dense = sum(len(wkb.as_multipolygon(g)[0][0])
                  for g in dense.to_pandas()["geom_wkb"])
    n_src = sum(len(wkb.as_multipolygon(g)[0][0])
                for g in _zones_ds(10).to_pandas()["geom_wkb"])
    assert n_dense > 4 * n_src
    # simplifying the densified rectangles recovers ~the corner count
    simp = simplify(densify(_zones_ds(10), 0.2), 0.01).to_pandas()
    for g, g0 in zip(simp["geom_wkb"], _zones_ds(10).to_pandas()["geom_wkb"]):
        mp, mp0 = wkb.as_multipolygon(g), wkb.as_multipolygon(g0)
        assert abs(geom.multipolygon_area(mp) - geom.multipolygon_area(mp0)) < 1e-6


def test_centroid_and_hull(ray_session):
    from spapy_ray.stages.vector_ops import centroid, convex_hull

    cent = centroid(_zones_ds(8)).to_pandas()
    for g in cent["geom_wkb"]:
        t, v = wkb.decode(g)
        assert t == "Point"
    hull = convex_hull(_zones_ds(8)).to_pandas()
    for g, g0 in zip(hull["geom_wkb"], _zones_ds(8).to_pandas()["geom_wkb"]):
        t, v = wkb.decode(g)
        assert t == "Polygon"
        mp0 = wkb.as_multipolygon(g0)
        assert geom.multipolygon_area([v]) >= geom.multipolygon_area(mp0) - 1e-9


def test_split_features(ray_session):
    from spapy_ray.stages.vector_ops import split_features

    src = _zones_ds(40).to_pandas()
    n_parts = sum(len(wkb.as_multipolygon(g)) for g in src["geom_wkb"])
    out = split_features(_zones_ds(40)).to_pandas()
    assert len(out) == n_parts
    for g in out["geom_wkb"]:
        assert wkb.decode(g)[0] == "Polygon"
    # attributes replicated
    assert set(out.columns) == set(src.columns)


def test_transform_points_roundtrip(ray_session):
    import ray.data as rd

    from spapy_ray.stages.transform import transform_points

    df = pd.DataFrame({"lon": np.linspace(-170, 170, 100),
                       "lat": np.linspace(-80, 80, 100)})
    ds = rd.from_pandas(df)
    out = transform_points(ds, "epsg:3857").to_pandas()
    assert {"x", "y"} <= set(out.columns)
    back = transform_points(
        rd.from_pandas(out.rename(columns={"x": "mx", "y": "my"})),
        "epsg:3857", lon_col="mx", lat_col="my", x_col="lon2", y_col="lat2",
        inverse=True).to_pandas()
    assert np.allclose(back["lon2"], back["lon"], atol=1e-9)
    assert np.allclose(back["lat2"], back["lat"], atol=1e-9)


def test_transform_geoms(ray_session):
    from spapy_ray.stages.transform import transform_geoms

    out = transform_geoms(_zones_ds(6), "equirect").to_pandas()
    for g in out["geom_wkb"]:
        mp = wkb.as_multipolygon(g)
        # projected coords are meters: far outside degree range
        assert abs(mp[0][0]).max() > 1e5


def test_manifest_write_resume(ray_session, tmp_path):
    import ray.data as rd

    from spapy_ray.state.manifest import (load_manifest, read_partitioned,
                                          write_partitioned)

    out = str(tmp_path / "tiles")
    df = pd.DataFrame({"tile": np.repeat([1, 2, 3, 4], 25),
                       "v": np.arange(100)})
    m1 = write_partitioned(rd.from_pandas(df), out, "tile")
    assert set(m1["partitions"]) == {"1", "2", "3", "4"}
    total1 = sum(p["rows"] for p in m1["partitions"].values())
    assert total1 == 100

    # resume: delete one partition from the manifest, rerun → only that
    # partition is rewritten (fingerprints of others unchanged)
    m = load_manifest(out)
    fp_before = {k: v["fingerprint"] for k, v in m["partitions"].items()}
    del m["partitions"]["3"]
    import json

    with open(os.path.join(out, "_manifest.json"), "w") as f:
        json.dump(m, f)
    m2 = write_partitioned(rd.from_pandas(df), out, "tile")
    assert set(m2["partitions"]) == {"1", "2", "3", "4"}
    assert m2["partitions"]["3"]["fingerprint"] == fp_before["3"]

    back = read_partitioned(out, "tile").to_pandas().sort_values("v")
    assert np.array_equal(back["v"].to_numpy(), np.arange(100))


def test_knn_cells_matches_broadcast(ray_session):
    """Cell-partitioned kNN == broadcast kNN for points whose k-th
    neighbor lies within the ring guarantee."""
    import ray.data as rd

    from spapy_ray.stages.knn import knn_join_broadcast, knn_join_cells

    rng = np.random.default_rng(11)
    n_t = 300
    tdf = pd.DataFrame({"zone_id": np.arange(n_t),
                        "lon": rng.uniform(-20, 20, n_t),
                        "lat": rng.uniform(-20, 20, n_t)})
    pdf = pd.DataFrame({"url": [f"p{i}" for i in range(500)],
                        "lon": rng.uniform(-18, 18, 500),
                        "lat": rng.uniform(-18, 18, 500)})
    zt = pa.table({"zone_id": pa.array(tdf["zone_id"]),
                   "geom_wkb": pa.array(
                       [wkb.encode_point(x, y) for x, y in zip(tdf.lon, tdf.lat)],
                       type=pa.binary())})
    # broadcast reference (anchors == the points themselves)
    bc = knn_join_broadcast(rd.from_pandas(pdf), zt, k=2,
                            left_columns=["url"]).to_pandas()
    cc = knn_join_cells(rd.from_pandas(pdf), rd.from_pandas(tdf), k=2,
                        res=4, max_ring=2).to_pandas()
    # ring guarantee at res 4: cell ~ 22.5 x 11.25 deg, ring 2 covers
    # >= 2 cells in every direction — all neighbors found here
    cc = cc.rename(columns={"key": "url"})
    got = cc.sort_values(["url", "rank"]).reset_index()
    exp = bc.sort_values(["url", "rank"]).reset_index()
    assert len(got) == len(exp)
    assert (got["zone_id"].to_numpy() == exp["zone_id"].to_numpy()).all()


def test_knn_tail_broadcast_matches_shuffle_widen(ray_session):
    """Sparse targets at a fine resolution force widening; the
    broadcast tail-resolve and the pure ring-doubling shuffle path
    must produce identical (key, zone_id, rank) sets."""
    import ray.data as rd

    from spapy_ray.stages.knn import knn_join_cells

    rng = np.random.default_rng(23)
    n_t, n_p = 12, 300                      # 12 targets on a 64x64 grid
    tdf = pd.DataFrame({"zone_id": np.arange(n_t),
                        "lon": rng.uniform(-150, 150, n_t),
                        "lat": rng.uniform(-60, 60, n_t)})
    pdf = pd.DataFrame({"url": [f"p{i}" for i in range(n_p)],
                        "lon": rng.uniform(-170, 170, n_p),
                        "lat": rng.uniform(-75, 75, n_p)})

    def run(tail_max):
        out = knn_join_cells(rd.from_pandas(pdf), rd.from_pandas(tdf),
                             k=3, res=6, max_ring=1, widen_passes=8,
                             tail_broadcast_max=tail_max).to_pandas()
        return set(zip(out["key"], out["zone_id"], out["rank"]))

    via_broadcast = run(10_000)             # tail resolves by broadcast
    via_shuffle = run(0)                    # pure ring-doubling rounds
    assert via_broadcast == via_shuffle
    assert len(via_broadcast) == n_p * 3


def test_repartition_by_range_balances_skew(ray_session):
    """Range partitioning with sampled boundaries balances a heavily
    skewed cell distribution (half the points in one hot region)."""
    import pyarrow as pa

    import ray.data as rd
    from spapy_ray.kernels import cells
    from spapy_ray.stages.partition import repartition_by_range

    rng = np.random.default_rng(17)
    # 50% of points inside a 1-degree hot box, rest uniform
    n = 40_000
    hot = rng.uniform([10.0, 10.0], [11.0, 11.0], (n // 2, 2))
    cold = rng.uniform([-180.0, -85.0], [180.0, 85.0], (n - n // 2, 2))
    pts = np.vstack([hot, cold])
    cell = cells.encode(pts[:, 0], pts[:, 1], 12).astype("int64")
    ds = rd.from_arrow(pa.table({"cell": pa.array(cell)}))
    out, bounds = repartition_by_range(ds, "cell", 16)
    df = out.to_pandas()
    sizes = df.groupby("range_id").size()
    k = len(sizes)
    assert 8 <= k <= 16  # duplicates may merge some cut points
    # balanced: no partition more than 2.5x the ideal share
    assert sizes.max() <= 2.5 * (n / k)
    # contrast: a FIXED uniform split of the key space is terribly
    # skewed (hot region lands in one partition)
    lo, hi = cell.min(), cell.max()
    fixed = np.clip(((cell - lo) * 16 // max(hi - lo, 1)), 0, 15)
    assert np.bincount(fixed.astype(int), minlength=16).max() > 0.4 * n
    # range property: partitions are contiguous key ranges
    mins = df.groupby("range_id")["cell"].min().sort_index()
    maxs = df.groupby("range_id")["cell"].max().sort_index()
    assert (maxs.values[:-1] <= mins.values[1:]).all()


def test_knn_cells_widening_converges_to_exact(ray_session):
    """Sparse-target stress: ring-widening + the distance-guarantee
    check converge to EXACT broadcast results even when the initial
    ring misses every target."""
    import ray.data as rd

    from spapy_ray.stages.knn import knn_join_broadcast, knn_join_cells

    rng = np.random.default_rng(3)
    tdf = pd.DataFrame({"zone_id": np.arange(5),
                        "lon": rng.uniform(-150, 150, 5),
                        "lat": rng.uniform(-60, 60, 5)})
    pdf = pd.DataFrame({"url": [f"p{i}" for i in range(300)],
                        "lon": rng.uniform(-170, 170, 300),
                        "lat": rng.uniform(-80, 80, 300)})
    cc = knn_join_cells(rd.from_pandas(pdf), rd.from_pandas(tdf), k=2,
                        res=4, max_ring=1, widen_passes=6).to_pandas()
    zt = pa.table({"zone_id": pa.array(tdf["zone_id"]),
                   "geom_wkb": pa.array(
                       [wkb.encode_point(x, y) for x, y in zip(tdf.lon, tdf.lat)],
                       type=pa.binary())})
    bc = knn_join_broadcast(rd.from_pandas(pdf), zt, k=2,
                            left_columns=["url"]).to_pandas()
    assert cc["exact"].all()
    assert set(zip(cc["key"], cc["zone_id"])) == \
        set(zip(bc["url"], bc["zone_id"]))


def test_vector_meta_roundtrip_and_row_values(ray_session, tmp_path):
    """SURVEY §2.4 tail: CopyMetadata semantics survive two stages and
    a parquet write/read round-trip; key-addressed Get/Set
    AttributeValue (SpaVectors.py:224-238, 564-587)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray.data as rd
    from spapy_ray.sources.zones import zones_table
    from spapy_ray.state.vmeta import (VectorMeta, get_attribute_value,
                                       read_vector_parquet,
                                       set_attribute_value,
                                       write_vector_parquet)

    vm = VectorMeta(crs="epsg:3857", geom_type="MultiPolygon",
                    attribute_defs={"zone_id": "int:4", "name": "str:254"})
    ds = rd.from_arrow(zones_table(20))

    # two transform stages — companion metadata rides alongside
    def stage1(t: pa.Table) -> pa.Table:
        return t.append_column("lab2", pc.add(t.column("labelrank"), 1))

    def stage2(t: pa.Table) -> pa.Table:
        return t.drop_columns(["area_class"])

    out = ds.map_batches(stage1, batch_format="pyarrow") \
            .map_batches(stage2, batch_format="pyarrow")
    vm2 = VectorMeta()
    vm2.copy_from(vm)
    assert vm2.crs == "epsg:3857" and vm2.attribute_defs == vm.attribute_defs

    path = str(tmp_path / "zones_meta")
    write_vector_parquet(out, path, vm2)
    ds3, vm3 = read_vector_parquet(path)
    assert vm3 is not None
    assert vm3.crs == "epsg:3857"
    assert vm3.geom_type == "MultiPolygon"
    assert vm3.attribute_defs == {"zone_id": "int:4", "name": "str:254"}
    assert ds3.count() == 20

    # row-level get/set
    assert get_attribute_value(ds3, "zone_id", 7, "name") == "zone7"
    upd = set_attribute_value(ds3, "zone_id", 7, "name", "renamed")
    assert get_attribute_value(upd, "zone_id", 7, "name") == "renamed"
    assert get_attribute_value(upd, "zone_id", 8, "name") == "zone8"


def test_get_input_dispatch(ray_session, tmp_path):
    """GetInput extension routing (SpaBase.py:131-155): parquet/csv/
    json readers, raster dir round-trip with RasterMeta, dataset
    pass-through, clear error for GDAL-needing formats."""
    import pytest as _pytest

    import ray.data as rd
    from spapy_ray.sources.dispatch import get_input, write_raster
    from spapy_ray.sources.rasters import DEM_META, RasterMeta, \
        synth_dem_dataset

    df = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    pq_path = str(tmp_path / "t.parquet")
    csv_path = str(tmp_path / "t.csv")
    df.to_parquet(pq_path)
    df.to_csv(csv_path, index=False)
    assert get_input(pq_path).count() == 3
    assert get_input(csv_path).count() == 3
    ds = rd.from_pandas(df)
    assert get_input(ds) is ds
    # .shp is now a native reader (sources/shapefile.py) — a missing
    # file is a plain file error, not an unsupported format
    with _pytest.raises(FileNotFoundError):
        get_input("/x/y.shp")
    # .tif and .img are native readers (sources/geotiff.py,
    # sources/hfa.py) — a missing file is a plain file error
    with _pytest.raises(FileNotFoundError):
        get_input("/x/y.tif")
    with _pytest.raises(FileNotFoundError):
        get_input("/x/y.img")
    with _pytest.raises(ValueError):
        get_input("/x/y.xyz")

    # raster round-trip
    small = RasterMeta(width=64, height=64, tile_size=32, x_min=0.0,
                       y_max=0.0, pixel_w=1.0, pixel_h=-1.0)
    rdir = str(tmp_path / "rast")
    write_raster(synth_dem_dataset(small, kind="int"), rdir, small)
    ds2, meta2 = get_input(rdir)
    assert meta2 == small
    assert ds2.count() == 4


def test_buffer_round_joins(ray_session):
    """GEOS-parity round-join buffer (boolean-fold decomposition):
    dilation matches the analytic round buffer to discretization
    accuracy; erosion is exact for rectangles; concave corners
    resolve through the union."""
    from spapy_ray.kernels.booleans import rings_to_multipolygon
    from spapy_ray.kernels.edgeclass import _pip_multipolygon
    from spapy_ray.stages.vector_ops import buffer_round

    sq = [[np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)]]
    rings, area = buffer_round(sq, 2.0, segments=32)
    mp = rings_to_multipolygon(rings)
    rng = np.random.default_rng(0)
    n = 200000
    px = rng.uniform(-3, 13, n)
    py = rng.uniform(-3, 13, n)
    got = _pip_multipolygon(px, py, mp)
    dx = np.maximum(np.maximum(0 - px, px - 10), 0)
    dy = np.maximum(np.maximum(0 - py, py - 10), 0)
    true = np.hypot(dx, dy) <= 2.0
    assert (got == true).mean() >= 0.9999
    # erosion: exact for rectilinear input
    _, area2 = buffer_round(sq, -2.0, segments=32)
    assert area2 == pytest.approx(36.0, abs=1e-9)
    # concave L: area between offset lower bound and full-disc bound
    L = [[np.array([[0, 0], [10, 0], [10, 4], [4, 4], [4, 10], [0, 10]],
                   float)]]
    _, areaL = buffer_round(L, 1.0, segments=32)
    assert 64 + 40 - np.pi < areaL < 64 + 40 + np.pi
    # stage route: method="round" through the Dataset API
    import ray.data as rd

    from spapy_ray.kernels import wkb as _wkb
    from spapy_ray.stages.vector_ops import buffer

    t = pa.table({"pid": pa.array([0]),
                  "geom_wkb": pa.array([_wkb.encode_polygon(sq[0])],
                                       type=pa.binary())})
    out = buffer(rd.from_arrow(t), 2.0, segments=32,
                 method="round").to_pandas()
    mp2 = _wkb.as_multipolygon(out["geom_wkb"].iloc[0])
    from spapy_ray.kernels import geom as _geom
    a = sum(_geom.ring_signed_area(p[0]) for p in mp2)
    assert a == pytest.approx(area, rel=1e-12)


def test_hash_sample_stratified_rates_and_consistency(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from spapy_ray.kernels.hashing import fnv1a64
    from spapy_ray.stages.relational import hash_sample_stratified

    n = 4000
    keys = pa.array([f"k{i % 1000}" for i in range(n)])
    strata = pa.array([("a", "b", "c")[i % 3] for i in range(n)])
    t = pa.table({"k": keys, "s": strata, "i": np.arange(n)})
    rates = {"a": (1, 2), "b": (1, 4)}
    got = hash_sample_stratified(rd.from_arrow(t), "k", "s", rates,
                                 default=(1, 8)).to_pandas()
    h = fnv1a64(keys).astype(np.uint64)
    s = np.array(strata.to_pylist())
    num = np.where(s == "a", 1, 1)
    den = np.select([s == "a", s == "b"], [2, 4], default=8).astype(np.uint64)
    exp = (h % den) < num
    assert len(got) == int(exp.sum())
    assert set(got["i"]) == set(np.arange(n)[exp])
    # group consistency: every kept key is kept for ALL its rows
    # within one stratum
    kept = got.groupby(["k", "s"]).size()
    full = pa.table({"k": keys, "s": strata}).to_pandas() \
        .groupby(["k", "s"]).size()
    assert all(full[idx] == c for idx, c in kept.items())


def test_hash_join_inner_left_and_collisions(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from spapy_ray.stages.relational import hash_join

    left = pa.table({"k": np.array([1, 2, 2, 3, 5], dtype=np.int64),
                     "v": ["a", "b", "c", "d", "e"]})
    right = pa.table({"k": np.array([2, 3, 3, 4], dtype=np.int64),
                      "v": ["X", "Y", "Z", "W"],
                      "w": np.array([10, 20, 30, 40], dtype=np.int64)})
    got = hash_join(rd.from_arrow(left), rd.from_arrow(right), on="k") \
        .to_pandas().sort_values(["k", "v", "v_r"]).reset_index(drop=True)
    exp = left.to_pandas().merge(
        right.to_pandas(), on="k", how="inner", suffixes=("", "_r")) \
        .sort_values(["k", "v", "v_r"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns], exp)
    assert got["k"].dtype == np.int64 and got["w"].dtype == np.int64

    gl = hash_join(rd.from_arrow(left), rd.from_arrow(right), on="k",
                   how="left").to_pandas()
    assert len(gl) == 6  # 4 matches + unmatched k=1, k=5
    assert gl.loc[gl["k"].isin([1, 5]), "v_r"].isna().all()


def test_hash_join_semi_anti(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from spapy_ray.stages.relational import hash_join

    left = pa.table({"k": np.array([1, 2, 3, 4], dtype=np.int64),
                     "v": ["a", "b", "c", "d"]})
    right = pa.table({"j": np.array([2, 3, 3], dtype=np.int64)})
    semi = hash_join(rd.from_arrow(left), rd.from_arrow(right),
                     on="k", right_on="j", how="semi").to_pandas()
    anti = hash_join(rd.from_arrow(left), rd.from_arrow(right),
                     on="k", right_on="j", how="anti").to_pandas()
    assert sorted(semi["k"]) == [2, 3]          # no duplication
    assert sorted(anti["k"]) == [1, 4]
    assert semi["k"].dtype == np.int64


def test_within_group_pairs(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from spapy_ray.stages.relational import within_group_pairs

    rng = np.random.default_rng(3)
    n = 600
    grp = rng.integers(0, 80, n).astype(np.int64)  # sizes 0..~15
    keys = np.array([f"k{int(v)}" for v in rng.integers(0, 300, n)])
    ds = rd.from_arrow(pa.table({"g": grp, "key": keys}))
    got = set(map(tuple, within_group_pairs(ds, "g", "key")
                  .to_pandas()[["key_a", "key_b"]].to_numpy()))

    want = set()
    for g in np.unique(grp):
        ks = sorted(set(keys[grp == g]))
        for i in range(len(ks)):
            for j in range(i + 1, len(ks)):
                want.add((ks[i], ks[j]))
    assert got == want and len(want) > 500

    # int keys keep their dtype; singleton groups emit nothing
    ds2 = rd.from_arrow(pa.table({
        "g": pa.array([1, 1, 2], pa.int64()),
        "key": pa.array([7, 7, 9], pa.int64())}))  # dup (g,key) row
    out2 = within_group_pairs(ds2, "g", "key").to_pandas()
    assert len(out2) == 0


def test_hash_join_outer(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from spapy_ray.stages.relational import hash_join

    left = pa.table({"k": np.array([1, 2, 3], dtype=np.int64),
                     "v": ["a", "b", "c"]})
    right = pa.table({"k": np.array([2, 4], dtype=np.int64),
                      "w": np.array([20, 40], dtype=np.int64)})
    out = hash_join(rd.from_arrow(left), rd.from_arrow(right),
                    on="k", how="outer").to_pandas()
    assert len(out) == 4  # 1 match + 2 left-only + 1 right-only
    m = out.set_index(out["k"].fillna(out["k_r"]).astype(np.int64))
    assert m.loc[2, "v"] == "b" and m.loc[2, "w"] == 20
    assert pd.isna(m.loc[4, "v"])
    assert m.loc[[1, 3], "w"].isna().all()


def test_heavy_hitters_guarantees(ray_session):
    import collections

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from spapy_ray.stages.relational import heavy_hitters

    rng = np.random.default_rng(17)
    n = 60_000
    vals = rng.zipf(1.3, n)                   # heavy-tailed frequencies
    items = np.array([f"item{int(v)}" for v in vals])
    truth = collections.Counter(items.tolist())
    m = 64
    out = heavy_hitters(
        rd.from_arrow(pa.table({"k": items})).repartition(8),
        "k", capacity=m).to_pandas()
    assert len(out) <= m
    est = dict(zip(out["k"], out["est_count"]))
    bound = n / (m + 1)
    # every true-heavy item survives; estimates never overcount and
    # undercount at most n/(m+1)
    for item, c in truth.items():
        if c > bound:
            assert item in est, (item, c)
    for item, e in est.items():
        assert truth[item] - bound <= e <= truth[item], (item, e)
    # output ordering is deterministic: est desc, item asc
    assert list(out["est_count"]) == sorted(out["est_count"], reverse=True)


def test_heavy_hitters_exact_regime(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from spapy_ray.stages.relational import heavy_hitters

    items = np.repeat([f"x{i}" for i in range(20)],
                      np.arange(1, 21))       # known exact counts
    out = heavy_hitters(
        rd.from_arrow(pa.table({"k": items})).repartition(6),
        "k", capacity=100).to_pandas()
    assert dict(zip(out["k"], out["est_count"])) == \
        {f"x{i}": i + 1 for i in range(20)}


def test_hash_join_salted_matches_unsalted(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from spapy_ray.stages.relational import hash_join

    rng = np.random.default_rng(13)
    n = 4000
    # one hot key carries half the probe volume (the skew case)
    k = np.where(rng.random(n) < 0.5, 7,
                 rng.integers(0, 500, n)).astype(np.int64)
    left = pa.table({"k": k, "v": np.arange(n, dtype=np.int64)})
    right = pa.table({"k": np.arange(0, 500, 2, dtype=np.int64),
                      "w": np.arange(0, 500, 2, dtype=np.int64) * 10})

    def run(how, salt):
        out = hash_join(rd.from_arrow(left).repartition(4),
                        rd.from_arrow(right), on="k",
                        how=how, salt=salt).to_pandas()
        cs = sorted(out.columns)
        return out[cs].sort_values(cs, kind="stable") \
            .reset_index(drop=True)

    # outer: right keys 500..520 have no left match, and left key 7
    # (the hot key) has no right match (odd) — both unmatched
    # directions exercised through the salted two-pass form
    right = pa.table({"k": np.arange(0, 522, 2, dtype=np.int64),
                      "w": np.arange(0, 522, 2, dtype=np.int64) * 10})

    for how in ("inner", "left", "semi", "anti", "outer"):
        a, b = run(how, 1), run(how, 4)
        assert len(a) == len(b), how
        for c in a.columns:
            av = a[c].to_numpy()
            bv = b[c].to_numpy()
            if av.dtype.kind == "f":
                assert np.array_equal(av, bv, equal_nan=True), (how, c)
            else:
                assert np.array_equal(av, bv), (how, c)


def test_flagship_resume_end_to_end(ray_session, tmp_path):
    """North-rule integration: the REAL flagship pipeline written as
    tile-partitioned parquet with a manifest, crash-resumed — only the
    missing partition is rewritten (other fingerprints unchanged),
    and the reloaded table is row-identical, including byte-identical
    text per url."""
    import json

    from spapy_ray.pipelines.flagship import flagship_join
    from spapy_ray.state.manifest import (load_manifest, read_partitioned,
                                          write_partitioned)

    out = str(tmp_path / "join_tiles")
    ds = flagship_join("/root/testdata/sf0.001")
    m1 = write_partitioned(ds, out, "tile")
    assert len(m1["partitions"]) > 3
    before = read_partitioned(out, "tile").to_pandas() \
        .sort_values(["url", "zone_id"]).reset_index(drop=True)

    # crash simulation: one partition vanishes from the manifest
    m = load_manifest(out)
    victim = sorted(m["partitions"])[1]
    fp_before = {k: v["fingerprint"] for k, v in m["partitions"].items()}
    del m["partitions"][victim]
    with open(os.path.join(out, "_manifest.json"), "w") as f:
        json.dump(m, f)

    m2 = write_partitioned(flagship_join("/root/testdata/sf0.001"),
                           out, "tile")
    assert set(m2["partitions"]) == set(fp_before)
    for k, fp in fp_before.items():
        if k != victim:
            assert m2["partitions"][k]["fingerprint"] == fp, k

    after = read_partitioned(out, "tile").to_pandas() \
        .sort_values(["url", "zone_id"]).reset_index(drop=True)
    assert len(after) == len(before)
    assert (after["url"].to_numpy() == before["url"].to_numpy()).all()
    assert (after["text"].to_numpy() == before["text"].to_numpy()).all()
    assert (after["zone_id"].to_numpy() == before["zone_id"].to_numpy()).all()
