"""Edge-classification booleans (kernels.edgeclass): Monte-Carlo
oracles over multipart-with-holes inputs, exact degenerate-incidence
cases, and algebraic identities. This is the round-2 kernel that
removed the DegenerateGeometry escape (VERDICT.md item 2)."""

import numpy as np
import pytest

from spapy_ray.kernels import geom
from spapy_ray.kernels.edgeclass import _pip_multipolygon, boolean_edges

OPS = ("intersection", "union", "difference", "symdiff")


def star(cx, cy, k, r0, r1, seed):
    """Guaranteed-simple star: evenly spaced angles + jitter (a fully
    random angle set can have a >180-degree gap, which breaks
    star-shapedness and yields a self-intersecting ring)."""
    g = np.random.default_rng(seed)
    ang = (np.arange(k) + g.uniform(0.1, 0.9, k)) * 2 * np.pi / k
    rad = g.uniform(r0, r1, k)
    return np.column_stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)])


def sq(x0, y0, x1, y1):
    return [[np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], float)]]


def mc_check(mp_a, mp_b, op, rings, area, seed, n=120000, lo=-12, hi=12):
    rng = np.random.default_rng(seed)
    px = rng.uniform(lo, hi, n)
    py = rng.uniform(lo, hi, n)
    ia = _pip_multipolygon(px, py, mp_a)
    ib = _pip_multipolygon(px, py, mp_b)
    truth = {"intersection": ia & ib, "union": ia | ib,
             "difference": ia & ~ib, "symdiff": ia ^ ib}[op]
    got = np.zeros(n, dtype=bool)
    for r in rings:
        got ^= geom.pip_ring(px, py, r)
    agree = (got == truth).mean()
    # non-crossing rings: signed ring sum == edge sum == MC measure
    ra = sum(geom.ring_signed_area(r) for r in rings)
    mc_area = truth.mean() * (hi - lo) ** 2
    sigma = (hi - lo) ** 2 * np.sqrt(max(truth.mean(), 1e-5) / n)
    return agree, abs(ra - area), abs(area - mc_area), sigma


@pytest.mark.parametrize("op", OPS)
def test_multipart_holes_monte_carlo(op):
    for trial in range(12):
        A = [[star(-2, 0, 8, 2, 5, 100 + trial),
              star(-2, 0, 5, 0.5, 1.2, 200 + trial)[::-1]],
             [star(6, 5, 6, 1, 2.5, 300 + trial)]]
        B = [[star(0, 1, 7, 2, 5, 400 + trial)],
             [star(-6, -5, 5, 1, 2, 500 + trial)]]
        rings, area = boolean_edges(A, B, op)
        agree, ring_err, area_err, sigma = mc_check(A, B, op, rings, area,
                                                    seed=trial)
        assert agree >= 0.9995, (trial, op, agree)
        assert ring_err < 1e-6, (trial, op, ring_err)
        assert area_err < 5 * sigma + 0.05, (trial, op, area_err)


def test_degenerate_incidences_exact():
    A = sq(0, 0, 10, 10)
    cases = [
        # (name, B, op, expected area)
        ("shared-edge", sq(10, 0, 20, 10), "union", 200.0),
        ("shared-edge", sq(10, 0, 20, 10), "intersection", 0.0),
        ("shared-edge", sq(10, 0, 20, 10), "difference", 100.0),
        ("shared-edge", sq(10, 0, 20, 10), "symdiff", 200.0),
        ("identical", A, "union", 100.0),
        ("identical", A, "intersection", 100.0),
        ("identical", A, "difference", 0.0),
        ("identical", A, "symdiff", 0.0),
        ("partial-collinear", sq(5, 10, 15, 20), "union", 200.0),
        ("partial-collinear", sq(5, 10, 15, 20), "intersection", 0.0),
        ("corner-touch", sq(10, 10, 20, 20), "union", 200.0),
        ("corner-touch", sq(10, 10, 20, 20), "intersection", 0.0),
        ("flush-inner", sq(0, 2, 4, 8), "difference", 76.0),
        ("flush-inner", sq(0, 2, 4, 8), "intersection", 24.0),
    ]
    for name, B, op, want in cases:
        rings, area = boolean_edges(A, B, op)
        ra = sum(geom.ring_signed_area(r) for r in rings)
        assert area == pytest.approx(want, abs=1e-9), (name, op)
        assert ra == pytest.approx(want, abs=1e-9), (name, op)
    # T-joint: triangle apex exactly on the square's edge
    T = [[np.array([[5, 10], [2, 16], [8, 16]], float)]]
    _, a_u = boolean_edges(A, T, "union")
    assert a_u == pytest.approx(118.0)
    _, a_i = boolean_edges(A, T, "intersection")
    assert a_i == pytest.approx(0.0)


def test_hole_partially_overlapped():
    H = [[np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float),
          np.array([[3, 3], [3, 7], [7, 7], [7, 3]], float)]]   # hole (CW)
    F = sq(5, 5, 12, 12)
    _, a_i = boolean_edges(H, F, "intersection")
    assert a_i == pytest.approx(21.0)      # F∩A(25) − F∩hole(4)
    _, a_u = boolean_edges(H, F, "union")
    assert a_u == pytest.approx(112.0)     # 84 + 49 − 21
    _, a_d = boolean_edges(H, F, "difference")
    assert a_d == pytest.approx(63.0)
    _, a_s = boolean_edges(H, F, "symdiff")
    assert a_s == pytest.approx(91.0)


def test_algebraic_identities_curved_multipart():
    th = np.linspace(0, 2 * np.pi, 33)[:-1]

    def disc(cx, cy, r):
        return [np.column_stack([cx + r * np.cos(th), cy + r * np.sin(th)])]

    D1 = [disc(0, 0, 3), disc(8, 0, 2)]
    D2 = [disc(3, 0, 3)]
    _, a_u = boolean_edges(D1, D2, "union")
    _, a_i = boolean_edges(D1, D2, "intersection")
    _, a_d = boolean_edges(D1, D2, "difference")
    _, a_s = boolean_edges(D1, D2, "symdiff")
    a1 = sum(geom.ring_signed_area(p[0]) for p in D1)
    a2 = geom.ring_signed_area(D2[0][0])
    assert a_u + a_i == pytest.approx(a1 + a2, abs=1e-9)
    assert a_d == pytest.approx(a1 - a_i, abs=1e-9)
    assert a_s == pytest.approx(a_u - a_i, abs=1e-9)
