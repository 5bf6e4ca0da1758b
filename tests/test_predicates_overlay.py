"""Topology predicates + convex clipping.

The F3 fixture squares and expectations are a direct port of the
reference's own test (SpaPyTests/Tests/SpaTopologyTest.py:56-108):
square1 = (-10..10)^2, square2 = (-20..0)x(-20..0),
square3 = (-200..-100)x(-100..-30), with the printed
`# should be true/False` comments as the truth matrix.
"""

import numpy as np
import pytest

from spapy_ray.kernels import clip, geom, predicates, wkb

SQ1 = [[np.array([[-10, 10], [10, 10], [10, -10], [-10, -10]], dtype=float)]]
SQ2 = [[np.array([[-20, 0], [0, 0], [0, -20], [-20, -20]], dtype=float)]]
SQ3 = [[np.array([[-200, -100], [-100, -100], [-100, -30], [-200, -30]], dtype=float)]]


def test_reference_truth_matrix():
    r21 = predicates.relate(SQ2, SQ1)
    assert r21["intersects"] is True          # SpaTopologyTest.py:89
    assert predicates.relate(SQ3, SQ1)["intersects"] is False   # :92
    assert r21["touches"] is False            # :95
    assert r21["disjoint"] is False           # :98
    assert r21["overlaps"] is True            # :101
    assert r21["crosses"] is False            # :104
    assert r21["contains"] is False           # :107


def test_touching_squares():
    # share only the edge x=10
    sq_right = [[np.array([[10, -10], [30, -10], [30, 10], [10, 10]], dtype=float)]]
    r = predicates.relate(SQ1, sq_right)
    assert r["touches"] is True
    assert r["intersects"] is True
    assert r["overlaps"] is False
    assert r["disjoint"] is False
    # corner-only touch
    sq_corner = [[np.array([[10, 10], [20, 10], [20, 20], [10, 20]], dtype=float)]]
    rc = predicates.relate(SQ1, sq_corner)
    assert rc["touches"] is True and rc["overlaps"] is False


def test_containment():
    inner = [[np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], dtype=float)]]
    r = predicates.relate(SQ1, inner)
    assert r["contains"] is True
    assert r["within"] is False
    assert r["overlaps"] is False
    assert r["intersects"] is True
    r2 = predicates.relate(inner, SQ1)
    assert r2["within"] is True and r2["contains"] is False


def test_identical_squares():
    r = predicates.relate(SQ1, SQ1)
    assert r["intersects"] is True
    assert r["disjoint"] is False
    assert r["touches"] is False


# ---------------------------------------------------------------- clip

def test_clip_square_partial_overlap():
    # SQ2 ∩ SQ1 = [-10,0]x[-10,0], area 100
    out = clip.clip_ring_convex(SQ2[0][0], SQ1[0][0])
    assert out is not None
    assert abs(geom.ring_signed_area(out)) == pytest.approx(100.0)
    assert geom.ring_bbox(out) == (-10.0, -10.0, 0.0, 0.0)


def test_clip_disjoint_empty():
    assert clip.clip_ring_convex(SQ3[0][0], SQ1[0][0]) is None


def test_clip_concave_subject_convex_clip():
    lshape = np.array([[0, 0], [10, 0], [10, 5], [5, 5], [5, 10], [0, 10]], dtype=float)
    box = clip.bbox_ring(2, 2, 8, 8)
    out = clip.clip_ring_convex(lshape, box)
    # expected area: box ∩ L = 6x6 minus the notch [5,8]x[5,8] = 36 - 9
    assert abs(geom.ring_signed_area(out)) == pytest.approx(27.0)


def test_clip_rejects_concave_clip():
    lshape = np.array([[0, 0], [10, 0], [10, 5], [5, 5], [5, 10], [0, 10]], dtype=float)
    with pytest.raises(ValueError):
        clip.clip_ring_convex(SQ1[0][0], lshape)


def test_clip_multipolygon():
    mp = SQ1 + [[np.asarray(r) + 100 for r in SQ1[0]]]
    out = clip.clip_multipolygon_convex(mp, clip.bbox_ring(-5, -5, 5, 5))
    assert len(out) == 1
    assert abs(geom.ring_signed_area(out[0][0])) == pytest.approx(100.0)


def test_clip_matches_pip_sampling():
    """Property: clipped polygon contains exactly the points that are
    in both inputs (random sampling oracle)."""
    rng = np.random.default_rng(9)
    ring = np.column_stack([5 * np.cos(np.linspace(0, 2 * np.pi, 9)[:-1]),
                            5 * np.sin(np.linspace(0, 2 * np.pi, 9)[:-1])])
    box = clip.bbox_ring(-3, -6, 4, 2)
    out = clip.clip_ring_convex(ring, box)
    px = rng.uniform(-7, 7, 4000)
    py = rng.uniform(-7, 7, 4000)
    in_both = geom.pip_ring(px, py, ring) & geom.pip_ring(px, py, box)
    in_clip = geom.pip_ring(px, py, out)
    # boundary-grazing points can differ; tolerate none in practice
    assert (in_both == in_clip).mean() > 0.999


def test_union_area_sweep_fuzz_vs_grid():
    import numpy as np

    from spapy_ray.stages.overlay import union_area_sweep

    rng = np.random.default_rng(0)
    for trial in range(100):
        k = int(rng.integers(1, 40))
        x0 = rng.integers(0, 100, k)
        x1 = x0 + rng.integers(1, 40, k)
        y0 = rng.integers(0, 100, k)
        y1 = y0 + rng.integers(1, 40, k)
        rects = np.stack([x0, y0, x1, y1], axis=1).astype(np.int64)
        grid = np.zeros((160, 160), dtype=bool)
        for a, b, c, d in rects:
            grid[a:c, b:d] = True
        assert union_area_sweep(rects) == int(grid.sum()), trial
    assert union_area_sweep(np.empty((0, 4), dtype=np.int64)) == 0


def test_dissolve_union_area_matches_mask_union(ray_session):
    import numpy as np
    import ray.data as rd

    from spapy_ray.kernels import rectilinear as rl, wkb as wkbk
    from spapy_ray.sources.zones import zones_table
    from spapy_ray.stages.overlay import dissolve_union_area

    zt = zones_table()
    got = dissolve_union_area(
        rd.from_arrow(zt.select(["labelrank", "geom_wkb"])),
        "labelrank").to_pandas().sort_values("labelrank") \
        .reset_index(drop=True)
    # independent oracle: the existing mask-grid union per group
    lr = zt.column("labelrank").to_numpy()
    for k in np.unique(lr):
        sets = [rl.multipolygon_to_rects(wkbk.as_multipolygon(g))
                for g, key in zip(zt.column("geom_wkb").to_pylist(),
                                  lr) if key == k]
        _, area = rl.union_rects(sets)
        row = got[got["labelrank"] == k].iloc[0]
        assert row["n_feats"] == len(sets)
        assert abs(row["area_u"] / 1e8 - area) < 1e-6


def test_areal_transfer_conservation_and_exactness(ray_session):
    # weights fully allocated when a zone lies inside the grid:
    # sum over cells of per-zone alloc == weight - (floor remainders),
    # and a zone covering exactly one cell allocates everything there
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from spapy_ray.kernels import wkb
    from spapy_ray.stages.overlay import areal_transfer

    U = 10000

    def rectz(zid, x0, y0, x1, y1):
        r = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]],
                     float) / U
        return {"zone_id": zid, "geom_wkb": wkb.encode_polygon([r])}

    # zone 1: exactly cell (182, 87) in fixed point; zone 2: straddles
    # two cells horizontally 30%/70%
    z1 = rectz(1, -1800000 + 182 * 10000, -850000 + 87 * 10000,
               -1800000 + 183 * 10000, -850000 + 88 * 10000)
    z2 = rectz(2, -1800000 + 10 * 10000 + 7000, -850000 + 5 * 10000,
               -1800000 + 11 * 10000 + 7000, -850000 + 6 * 10000)
    zones = pa.Table.from_pylist([z1, z2])
    out = areal_transfer(zones, {1: 1000, 2: 10}).to_pandas()
    got = {(r.gx, r.gy): r.alloc for r in out.itertuples()}
    assert got[(182, 87)] == 1000
    assert got[(10, 5)] == 3 and got[(11, 5)] == 7
    assert len(got) == 3
