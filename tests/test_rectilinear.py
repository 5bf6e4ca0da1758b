"""Rectilinear boolean ops — exactness vs analytic expectations and
random sampling oracles."""

import numpy as np
import pytest

from spapy_ray.kernels import geom, rectilinear as rl, wkb
from spapy_ray.sources.zones import zones_table

SQ1 = [[np.array([[-10, -10], [10, -10], [10, 10], [-10, 10]], dtype=float)]]
SQ2 = [[np.array([[-20, -20], [0, -20], [0, 0], [-20, 0]], dtype=float)]]
LSHAPE = [[np.array([[0, 0], [10, 0], [10, 5], [5, 5], [5, 10], [0, 10]],
                    dtype=float)]]


def test_reference_square_overlaps():
    # SQ1 ∩ SQ2 = [-10,0]^2 (the SpaTopologyTest square pair)
    rects, area = rl.boolean_op(SQ1, SQ2, "intersection")
    assert area == pytest.approx(100.0)
    assert len(rects) == 1
    assert tuple(rects[0]) == (-10.0, -10.0, 0.0, 0.0)
    _, u = rl.boolean_op(SQ1, SQ2, "union")
    assert u == pytest.approx(400 + 400 - 100)
    _, d = rl.boolean_op(SQ1, SQ2, "difference")
    assert d == pytest.approx(300.0)
    _, s = rl.boolean_op(SQ1, SQ2, "symmetric_difference")
    assert s == pytest.approx(600.0)


def test_concave_and_disjoint():
    _, a = rl.boolean_op(LSHAPE, SQ1, "intersection")
    assert a == pytest.approx(75.0)  # L fully inside SQ1
    far = [[np.asarray(SQ1[0][0]) + 1000.0]]
    rects, a2 = rl.boolean_op(LSHAPE, far, "intersection")
    assert a2 == 0.0 and len(rects) == 0
    # difference with a notch: SQ1 - LSHAPE
    _, d = rl.boolean_op(SQ1, LSHAPE, "difference")
    assert d == pytest.approx(400.0 - 75.0)


def test_shared_edge_no_slivers():
    right = [[np.array([[10, -10], [30, -10], [30, 10], [10, 10]], dtype=float)]]
    _, inter = rl.boolean_op(SQ1, right, "intersection")
    assert inter == 0.0
    _, u = rl.boolean_op(SQ1, right, "union")
    assert u == pytest.approx(800.0)


def test_boolean_matches_sampling_oracle():
    rng = np.random.default_rng(21)
    zt = zones_table(30)
    geoms = [wkb.as_multipolygon(g) for g in zt.column("geom_wkb").to_pylist()]
    px = rng.uniform(-180, 180, 20000)
    py = rng.uniform(-85, 85, 20000)
    for op, fn in rl.OPS.items():
        for a, b in [(0, 3), (3, 10), (2, 17)]:
            rects, area = rl.boolean_op(geoms[a], geoms[b], op)
            in_a = geom.pip_multipolygon(px, py, geoms[a])
            in_b = geom.pip_multipolygon(px, py, geoms[b])
            expected = fn(in_a, in_b)
            mp = rl.rects_to_multipolygon(rects)
            got = geom.pip_multipolygon(px, py, mp) if mp else \
                np.zeros(len(px), dtype=bool)
            # random points never on edges → exact agreement
            assert (got == expected).all(), (op, a, b)


def test_rect_decomposition_roundtrip():
    rects = rl.multipolygon_to_rects(LSHAPE)
    total = sum((x1 - x0) * (y1 - y0) for x0, y0, x1, y1 in rects)
    assert total == pytest.approx(75.0)
    # union of per-zone decompositions == fold union
    zt = zones_table(25)
    sets = [rl.multipolygon_to_rects(wkb.as_multipolygon(g))
            for g in zt.column("geom_wkb").to_pylist()]
    _, area = rl.union_rects(sets)
    # sampling check of the union area over the bbox
    rng = np.random.default_rng(5)
    allr = np.vstack(sets)
    bx0, by0 = allr[:, 0].min(), allr[:, 1].min()
    bx1, by1 = allr[:, 2].max(), allr[:, 3].max()
    px = rng.uniform(bx0, bx1, 200000)
    py = rng.uniform(by0, by1, 200000)
    inside = np.zeros(len(px), dtype=bool)
    for g in zt.column("geom_wkb").to_pylist():
        inside |= geom.pip_multipolygon(px, py, wkb.as_multipolygon(g))
    mc = inside.mean() * (bx1 - bx0) * (by1 - by0)
    assert area == pytest.approx(mc, rel=0.02)


def test_non_rectilinear_rejected():
    tri = [[np.array([[0, 0], [10, 0], [5, 8]], dtype=float)]]
    with pytest.raises(ValueError, match="rectilinear"):
        rl.boolean_op(tri, SQ1, "intersection")
    with pytest.raises(ValueError, match="unknown op"):
        rl.boolean_op(SQ1, SQ2, "frobnicate")


def test_overlay_stages(ray_session):
    import ray.data as rd

    from spapy_ray.kernels import clip
    from spapy_ray.stages.overlay import (dataset_union, overlay_datasets,
                                          overlay_with_geometry)

    zds = rd.from_arrow(zones_table(40))
    box = wkb.encode_polygon([clip.bbox_ring(-60.0, -85.0, 80.0, -55.0)])

    # dataset x geometry intersection == serial kernel
    out = overlay_with_geometry(zds, box, "intersection").to_pandas()
    total = 0.0
    for g in zones_table(40).column("geom_wkb").to_pylist():
        _, a = rl.boolean_op(wkb.as_multipolygon(g),
                             wkb.as_multipolygon(box), "intersection")
        total += a
    assert out["overlay_area"].sum() == pytest.approx(total)
    assert len(out) > 0

    # dataset x dataset: pairs with positive intersection area match
    # brute force over all pairs
    left = rd.from_arrow(zones_table(15))
    right = zones_table(40)
    pairs = overlay_datasets(left, right, "intersection").to_pandas()
    got = {(r["zone_id"], r["right_zone_id"]): r["overlay_area"]
           for _, r in pairs.iterrows()}
    lg = [wkb.as_multipolygon(g) for g in zones_table(15).column("geom_wkb").to_pylist()]
    rg = [wkb.as_multipolygon(g) for g in right.column("geom_wkb").to_pylist()]
    expected = {}
    for i, a in enumerate(lg):
        for j, b in enumerate(rg):
            _, ar = rl.boolean_op(a, b, "intersection")
            if ar > 0:
                expected[(i, j)] = ar
    assert set(got) == set(expected)
    for k in got:
        assert got[k] == pytest.approx(expected[k])

    # dataset union fold == one-shot union of all rect decompositions
    rects, area = dataset_union(rd.from_arrow(zones_table(25)))
    sets = [rl.multipolygon_to_rects(wkb.as_multipolygon(g))
            for g in zones_table(25).column("geom_wkb").to_pylist()]
    _, area_ref = rl.union_rects(sets)
    assert area == pytest.approx(area_ref)


def test_self_folds_match_sequential_reference(ray_session):
    """parity/difference folds == the reference's literal sequential
    fold over features in row order (computed serially with the same
    boolean kernel)."""
    import ray.data as rd

    from spapy_ray.stages.overlay import (dataset_difference_fold,
                                          dataset_symdiff)

    zt = zones_table(12)
    geoms = [wkb.as_multipolygon(g) for g in zt.column("geom_wkb").to_pylist()]

    # sequential symdiff fold (reference order)
    acc = rl.multipolygon_to_rects(geoms[0])
    for g in geoms[1:]:
        mp_acc = rl.rects_to_multipolygon(acc) if len(acc) else []
        if not mp_acc:
            acc = rl.multipolygon_to_rects(g)
            continue
        acc, _ = rl.boolean_op(mp_acc, g, "symmetric_difference")
    seq_area = float(((acc[:, 2] - acc[:, 0]) * (acc[:, 3] - acc[:, 1])).sum())
    _, par_area = dataset_symdiff(rd.from_arrow(zt))
    assert par_area == pytest.approx(seq_area)

    # sequential difference fold
    accd = rl.multipolygon_to_rects(geoms[0])
    for g in geoms[1:]:
        mp_acc = rl.rects_to_multipolygon(accd) if len(accd) else []
        if not mp_acc:
            break
        accd, _ = rl.boolean_op(mp_acc, g, "difference")
    seq_d = float(((accd[:, 2] - accd[:, 0]) * (accd[:, 3] - accd[:, 1])).sum()) \
        if len(accd) else 0.0
    _, fold_d = dataset_difference_fold(rd.from_arrow(zt), "zone_id")
    assert fold_d == pytest.approx(seq_d)
