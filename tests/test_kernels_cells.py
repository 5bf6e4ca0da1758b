import duckdb
import numpy as np
import pytest

from spapy_ray.kernels import cells


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(42)
    lon = rng.uniform(-180, 180, 1000)
    lat = rng.uniform(-90, 90, 1000)
    for res in (0, 1, 5, 12, 26):
        c = cells.encode(lon, lat, res)
        x, y, r = cells.decode_xy(c)
        assert (r == res).all()
        ex, ey = cells.xy_for(lon, lat, res)
        assert (x == ex).all() and (y == ey).all()


def test_center_within_cell():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 200)
    lat = rng.uniform(-90, 90, 200)
    c = cells.encode(lon, lat, 10)
    clon, clat = cells.cell_center(c)
    # re-encoding the center gives the same cell
    assert (cells.encode(clon, clat, 10) == c).all()
    # cell size at res 10: 360/1024 x 180/1024
    assert np.all(np.abs(clon - lon) <= 360 / 1024)
    assert np.all(np.abs(clat - lat) <= 180 / 1024)


def test_parent_contains():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    c12 = cells.encode(lon, lat, 12)
    c7 = cells.encode(lon, lat, 7)
    assert (cells.parent(c12, 7) == c7).all()


def test_children_partition_parent():
    c = cells.encode(np.array([12.3]), np.array([45.6]), 8)[0]
    kids = cells.children(int(c))
    assert len(kids) == 4
    assert (cells.parent(kids, 8) == c).all()


def test_ring_and_disk():
    c = cells.encode(np.array([0.1]), np.array([0.1]), 6)[0]
    r0 = cells.ring(int(c), 0)
    assert list(r0) == [c]
    r1 = cells.ring(int(c), 1)
    assert len(r1) == 8
    r2 = cells.ring(int(c), 2)
    assert len(r2) == 16
    d2 = cells.disk(int(c), 2)
    assert len(d2) == 25
    # all ring-1 cells are grid-adjacent to c
    x0, y0, _ = cells.decode_xy(np.asarray([c]))
    x, y, _ = cells.decode_xy(r1)
    assert np.max(np.maximum(np.abs(x - x0[0]), np.abs(y - y0[0]))) == 1


def test_ring_wraps_antimeridian():
    c = cells.encode(np.array([-179.99]), np.array([0.0]), 5)[0]
    r1 = cells.ring(int(c), 1)
    assert len(r1) == 8  # wrapped in x, not clipped
    x, y, _ = cells.decode_xy(r1)
    assert 0 in x and (2**5 - 1) in x


def test_ring_clips_poles():
    c = cells.encode(np.array([0.0]), np.array([89.9]), 4)[0]
    r1 = cells.ring(int(c), 1)
    assert len(r1) == 5  # top row clipped


def test_sql_expr_matches_numpy():
    rng = np.random.default_rng(11)
    lon = rng.uniform(-180, 180, 300)
    lat = rng.uniform(-90, 90, 300)
    for res in (4, 9, 15):
        expected = cells.encode(lon, lat, res)
        con = duckdb.connect()
        con.register("pts", __import__("pandas").DataFrame({"lon": lon, "lat": lat}))
        got = con.execute(
            f"SELECT {cells.sql_cell_expr('lon', 'lat', res)} AS c FROM pts"
        ).fetchnumpy()["c"]
        assert (got.astype(np.uint64) == expected).all()


def test_tile_pyramid_rollup_equals_direct(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from spapy_ray.kernels import cells
    from spapy_ray.stages.cellindex import tile_pyramid

    rng = np.random.default_rng(9)
    lon = rng.uniform(-180, 180, 5000)
    lat = rng.uniform(-90, 90, 5000)
    # grid-edge clipping cases
    lon[:4] = [180.0, -180.0, 179.999999, 0.0]
    lat[:4] = [90.0, -90.0, 0.0, 89.999999]
    ds = rd.from_arrow(pa.table({"lon": lon, "lat": lat}))
    got = tile_pyramid(ds, res_hi=6, res_lo=2).to_pandas() \
        .sort_values(["res", "tile"]).reset_index(drop=True)
    exp_parts = []
    for r in range(2, 7):
        t = cells.encode(lon, lat, r).astype("int64")
        vc = pd.Series(t).value_counts().sort_index()
        exp_parts.append(pd.DataFrame({
            "res": np.int64(r), "tile": vc.index.to_numpy(),
            "n_pages": vc.to_numpy().astype(np.int64)}))
    exp = pd.concat(exp_parts, ignore_index=True) \
        .sort_values(["res", "tile"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_grid_join_counts_brute_force(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from spapy_ray.stages.spatialstats import grid_join_counts

    rng = np.random.default_rng(2)
    nx, ny = 12, 9
    pts = pd.DataFrame({
        "lon": rng.uniform(0, nx, 300) + 0.0,
        "lat": rng.uniform(0, ny, 300) + 0.0})
    got = grid_join_counts(rd.from_pandas(pts), nx=nx, ny=ny,
                           x_min=0.0, y_min=0.0, min_count=2) \
        .to_pandas().iloc[0]

    grid = np.zeros((ny, nx), dtype=np.int64)
    np.add.at(grid, (pts["lat"].astype(int), pts["lon"].astype(int)),
              1)
    black = grid >= 2
    bb = bw = ww = 0
    for y in range(ny):
        for x in range(nx):
            for dy, dx in ((0, 1), (1, 0)):
                y2, x2 = y + dy, x + dx
                if y2 >= ny or x2 >= nx:
                    continue
                pair = int(black[y, x]) + int(black[y2, x2])
                if pair == 2:
                    bb += 1
                elif pair == 1:
                    bw += 1
                else:
                    ww += 1
    assert got["n_cells"] == nx * ny
    assert got["n_pairs"] == bb + bw + ww
    assert got["n_black"] == int(black.sum())
    assert (got["bb"], got["bw"], got["ww"]) == (bb, bw, ww)


def test_geohash_matches_textbook_bisection():
    import numpy as np

    from spapy_ray.kernels.cells import geohash_encode

    B32 = "0123456789bcdefghjkmnpqrstuvwxyz"

    def ref(lat, lon, p=6):
        latr, lonr = [-90.0, 90.0], [-180.0, 180.0]
        bits = bit = 0
        even, gh = True, ""
        while len(gh) < p:
            if even:
                mid = (lonr[0] + lonr[1]) / 2
                if lon >= mid:
                    bits = (bits << 1) | 1
                    lonr[0] = mid
                else:
                    bits <<= 1
                    lonr[1] = mid
            else:
                mid = (latr[0] + latr[1]) / 2
                if lat >= mid:
                    bits = (bits << 1) | 1
                    latr[0] = mid
                else:
                    bits <<= 1
                    latr[1] = mid
            even = not even
            bit += 1
            if bit == 5:
                gh += B32[bits]
                bits = bit = 0
        return gh

    rng = np.random.default_rng(2)
    lon = rng.uniform(-179.9, 179.9, 300)
    lat = rng.uniform(-89.9, 89.9, 300)
    got = geohash_encode(lon, lat, 6)
    assert all(g == ref(a, o) for o, a, g in zip(lon, lat, got))
    # canonical vector (wikipedia): (57.64911, 10.40744) -> u4pruy
    assert geohash_encode(np.array([10.40744]),
                          np.array([57.64911]), 6)[0] == "u4pruy"
    assert geohash_encode(np.array([10.40744]),
                          np.array([57.64911]), 4)[0] == "u4pr"


def _hilbert_ref(order: int, x: int, y: int) -> int:
    n = 1 << order
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_scalar_reference():
    from spapy_ray.kernels.cells import hilbert_d

    rng = np.random.default_rng(3)
    x = rng.integers(0, 1 << 16, 300)
    y = rng.integers(0, 1 << 16, 300)
    want = np.array([_hilbert_ref(16, int(a), int(b))
                     for a, b in zip(x, y)])
    assert np.array_equal(hilbert_d(x, y, 16), want)


def test_hilbert_bijection_and_unit_step_locality():
    from spapy_ray.kernels.cells import hilbert_d

    o, n = 5, 1 << 5
    gx, gy = np.meshgrid(np.arange(n), np.arange(n))
    d = hilbert_d(gx.ravel(), gy.ravel(), o)
    assert sorted(d) == list(range(n * n))
    pos = np.empty(n * n, dtype=np.int64)
    pos[d] = np.arange(n * n)
    xs, ys = gx.ravel()[pos], gy.ravel()[pos]
    # consecutive curve positions are 4-neighbors — the locality
    # property Morton lacks (quadrant-corner jumps)
    assert (np.abs(np.diff(xs)) + np.abs(np.diff(ys)) == 1).all()


def test_hilbert_sql_chain_parity():
    import duckdb

    from spapy_ray.kernels.cells import hilbert_d, sql_hilbert_chain

    chain = sql_hilbert_chain("xx", "yy", 16, "src", "i")
    q = (f"WITH src AS (SELECT p AS i, (p * 2654435761) % 65536 AS xx, "
         f"(p * 2246822519) % 65536 AS yy FROM range(300) t(p)), "
         f"{chain} SELECT hkey FROM hil ORDER BY i")
    got = duckdb.sql(q).df()["hkey"].to_numpy()
    p = np.arange(300, dtype=np.int64)
    want = hilbert_d((p * 2654435761) % 65536,
                     (p * 2246822519) % 65536, 16)
    assert np.array_equal(got, want)
