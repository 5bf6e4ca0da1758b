"""Greiner–Hormann general polygon booleans — Monte-Carlo oracles,
dispatcher routing, degenerate rejection, stage integration."""

import numpy as np
import pytest

from spapy_ray.kernels import geom, ghclip, wkb
from spapy_ray.kernels.booleans import boolean_general, rings_to_multipolygon


def star(cx, cy, k, r0, r1, seed):
    g = np.random.default_rng(seed)
    ang = np.sort(g.uniform(0, 2 * np.pi, k))
    rad = g.uniform(r0, r1, k)
    return np.column_stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)])


def mc_agree(rings, op, A, B, n=60000, seed=0, lo=-8, hi=8):
    rng = np.random.default_rng(seed)
    px = rng.uniform(lo, hi, n)
    py = rng.uniform(lo, hi, n)
    ia = geom.pip_ring(px, py, A)
    ib = geom.pip_ring(px, py, B)
    truth = {"intersection": ia & ib, "union": ia | ib,
             "difference": ia & ~ib}[op]
    got = np.zeros(n, dtype=bool)
    for r in rings:
        got ^= geom.pip_ring(px, py, r)
    return (got == truth).mean()


@pytest.mark.parametrize("op", ["intersection", "union", "difference"])
def test_gh_random_star_polygons(op):
    rng = np.random.default_rng(5)
    for trial in range(25):
        A = star(rng.uniform(-2, 2), rng.uniform(-2, 2),
                 int(rng.integers(4, 11)), 1, 5, 300 + trial)
        B = star(rng.uniform(-2, 2), rng.uniform(-2, 2),
                 int(rng.integers(4, 11)), 1, 5, 600 + trial)
        rings = ghclip.clip(A, B, op)
        assert mc_agree(rings, op, A, B, seed=trial) >= 0.999


def test_gh_containment_and_disjoint():
    big = star(0, 0, 8, 6, 7, 1)
    small = star(0, 0, 6, 1, 2, 2)
    far = small + 100.0
    assert len(ghclip.clip(small, big, "intersection")) == 1
    assert ghclip.clip(small, far, "intersection") == []
    # difference with a hole: big - small → 2 rings, one CW (the hole)
    rings = ghclip.clip(big, small, "difference")
    signs = sorted(np.sign([geom.ring_signed_area(r) for r in rings]))
    assert signs == [-1, 1]
    # union of disjoint → both rings
    assert len(ghclip.clip(small, far, "union")) == 2


def test_gh_degenerate_raises():
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)
    shifted = sq + np.array([10.0, 0.0])  # shared edge
    with pytest.raises(ghclip.DegenerateGeometry):
        ghclip.clip(sq, shifted, "intersection")
    with pytest.raises(ghclip.DegenerateGeometry):
        ghclip.clip(sq, sq + np.array([5.0, 0.0]), "union")  # collinear edges


def test_dispatcher_routes_rectilinear_degenerates():
    """Axis-parallel inputs with shared edges go through the exact
    rectilinear engine, not GH."""
    sq = [[np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)]]
    shifted = [[np.asarray(sq[0][0]) + np.array([10.0, 0.0])]]
    rings, area = boolean_general(sq, shifted, "union")
    assert area == pytest.approx(200.0)
    rings, area = boolean_general(sq, shifted, "intersection")
    assert area == 0.0


def test_dispatcher_gh_route_and_multipart_intersection():
    A = star(0, 0, 7, 2, 5, 11)
    B = star(1, 0, 6, 2, 5, 12)
    rings, area = boolean_general([[A]], [[B]], "intersection")
    assert mc_agree(rings, "intersection", A, B) >= 0.999
    # multipart ∩ single: decomposes
    C = star(20, 20, 5, 1, 2, 13)
    rings2, area2 = boolean_general([[A], [C]], [[B]], "intersection")
    assert area2 == pytest.approx(area)
    # multipart union/difference/symdiff in general position: the
    # round-1 DegenerateGeometry escape is gone (kernels.edgeclass)
    aA = abs(geom.ring_signed_area(A))
    aC = abs(geom.ring_signed_area(C))
    _, a_un = boolean_general([[A], [C]], [[B]], "union")
    aB = abs(geom.ring_signed_area(B))
    assert a_un == pytest.approx(aA + aC + aB - area2)
    _, a_diff = boolean_general([[A], [C]], [[B]], "difference")
    assert a_diff == pytest.approx(aA + aC - area2)
    _, a_sym = boolean_general([[A], [C]], [[B]], "symmetric_difference")
    assert a_sym == pytest.approx(a_un - area2)


def test_overlay_stage_with_curved_geometry(ray_session):
    """overlay_with_geometry drives GH for a rotated clip polygon."""
    import pyarrow as pa

    import ray.data as rd
    from spapy_ray.stages.overlay import overlay_with_geometry

    ang = 0.35
    R = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]])
    rot_box = (np.array([[-30, -80], [40, -80], [40, -55], [-30, -55]],
                        dtype=float) - [5, -67]) @ R.T + [5, -67]
    clip_geom = wkb.encode_polygon([rot_box])
    rows = [{"pid": i,
             "geom_wkb": wkb.encode_polygon([star(si * 15 - 30, -70, 8, 3, 6, si)])}
            for i, si in enumerate(range(5))]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = overlay_with_geometry(ds, clip_geom, "intersection").to_pandas()
    assert len(out) >= 1
    for _, r in out.iterrows():
        mp = wkb.as_multipolygon(r["geom_wkb"])
        si = int(r["pid"])
        A = star(si * 15 - 30, -70, 8, 3, 6, si)
        agree = mc_agree([ring for p in mp for ring in p], "intersection",
                         A, rot_box, lo=-60, hi=60)
        assert agree >= 0.999
        assert r["overlay_area"] > 0


def test_rings_to_multipolygon_hole_assignment():
    big = star(0, 0, 8, 6, 7, 1)
    small = star(0, 0, 6, 1, 2, 2)
    rings = ghclip.clip(big, small, "difference")
    mp = rings_to_multipolygon(rings)
    assert len(mp) == 1 and len(mp[0]) == 2  # exterior + hole
    # point inside the hole is NOT in the polygon
    assert not geom.pip_polygon(np.array([0.0]), np.array([0.0]), mp[0])[0]
