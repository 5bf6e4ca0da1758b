"""Unified boolean-op dispatcher over multipolygons.

Routes to the exact rectilinear engine (kernels.rectilinear) when both
operands are axis-parallel — which is also where degenerate incidences
(shared edges, vertex-on-edge) live — and to Greiner–Hormann
(kernels.ghclip) for general-position curved inputs. The two engines
cover complementary ground:

    rectilinear: any op, multiparts, holes, heavy degeneracy — exact
    GH:          any op on simple single-ring pairs in general
                 position; intersection extends to multiparts
                 (pairwise decomposition is valid for ∩ only)

Returns (rings, area): ``rings`` with even-odd semantics (holes from
containment differences are CW), ``area`` = Σ signed ring areas.
"""

from __future__ import annotations

import numpy as np

from spapy_ray.kernels import geom, ghclip
from spapy_ray.kernels import rectilinear as rl


def _rings_area(rings) -> float:
    return float(sum(geom.ring_signed_area(r) for r in rings))


def boolean_general(mp_a, mp_b, op: str):
    """→ (rings: list[np.ndarray], area: float)."""
    if rl.is_rectilinear(mp_a) and rl.is_rectilinear(mp_b):
        rects, area = rl.boolean_op(mp_a, mp_b, op)
        rings = [p[0] for p in rl.rects_to_multipolygon(rects)]
        return rings, area
    a_simple = len(mp_a) == 1 and len(mp_a[0]) == 1
    b_simple = len(mp_b) == 1 and len(mp_b[0]) == 1
    if a_simple and b_simple:
        rings = ghclip.clip(mp_a[0][0], mp_b[0][0], op)
        return rings, _rings_area(rings)
    if op == "intersection":
        # ∩ decomposes over disjoint parts; holes unsupported here
        for mp in (mp_a, mp_b):
            if any(len(p) > 1 for p in mp):
                raise ghclip.DegenerateGeometry(
                    "holes in general-position booleans: round 3")
        rings = []
        for pa_ in mp_a:
            for pb in mp_b:
                rings.extend(ghclip.clip(pa_[0], pb[0], "intersection"))
        return rings, _rings_area(rings)
    raise ghclip.DegenerateGeometry(
        f"{op} of general-position MULTIpolygons: round 3")


def rings_to_multipolygon(rings):
    """Even-odd ring soup → multipolygon: CCW rings are exteriors, CW
    rings become holes of the exterior that contains them."""
    exts = [r for r in rings if geom.ring_signed_area(r) >= 0]
    holes = [r for r in rings if geom.ring_signed_area(r) < 0]
    polys = [[e] for e in exts]
    for h in holes:
        cx, cy = h[:, 0].mean(), h[:, 1].mean()
        for poly in polys:
            if geom.pip_ring(np.array([cx]), np.array([cy]), poly[0])[0]:
                poly.append(h)
                break
    return polys
