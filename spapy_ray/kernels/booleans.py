"""Unified boolean-op dispatcher over multipolygons.

Routes to the exact rectilinear engine (kernels.rectilinear) when both
operands are axis-parallel (integer-exact, fastest) and to the
edge-classification overlay (kernels.edgeclass) for everything else —
curved inputs with multiparts, holes, and degenerate incidences
(shared edges, shared vertices, T-joints, collinear overlaps) all
included. The round-1 DegenerateGeometry escape hatch is gone;
Greiner–Hormann (kernels.ghclip) remains as an independently-tested
reference kernel for simple general-position pairs.

Returns (rings, area): ``rings`` with even-odd semantics (holes from
containment differences are CW), ``area`` = Σ signed ring areas.
"""

from __future__ import annotations

import numpy as np

from spapy_ray.kernels import edgeclass, geom
from spapy_ray.kernels import rectilinear as rl

_OP_ALIASES = {"symmetric_difference": "symdiff"}     # edgeclass name
_RL_ALIASES = {"symdiff": "symmetric_difference"}     # rectilinear name


def _rings_area(rings) -> float:
    return float(sum(geom.ring_signed_area(r) for r in rings))


def boolean_general(mp_a, mp_b, op: str, engine: str | None = None):
    """→ (rings: list[np.ndarray], area: float).

    ``engine``: None (auto: rectilinear when both operands are
    axis-parallel, else edge-classification), or force "rectilinear" /
    "edgeclass"."""
    use_rl = (engine == "rectilinear" if engine is not None
              else rl.is_rectilinear(mp_a) and rl.is_rectilinear(mp_b))
    if use_rl:
        rects, area = rl.boolean_op(mp_a, mp_b, _RL_ALIASES.get(op, op))
        rings = [p[0] for p in rl.rects_to_multipolygon(rects)]
        return rings, area
    return edgeclass.boolean_edges(mp_a, mp_b, _OP_ALIASES.get(op, op))


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
