"""General polygon booleans via edge classification — the
round-2 replacement for the DegenerateGeometry escape hatch.

Public algorithm family (overlay by edge classification, as in
Weiler–Atherton descendants and Vatti-style planar overlays): boolean
ops over arbitrary MULTIPOLYGONS WITH HOLES, tolerant of the
degenerate incidences Greiner–Hormann rejects (shared edges, shared
vertices, T-joints, collinear overlaps).

    1. normalize rings (exteriors CCW, holes CW) → directed edges;
    2. split every edge at every intersection with the other side's
       edges; intersection coordinates are computed ONCE and snapped
       to segment endpoints, so both sides split at bit-identical
       points; collinear overlaps split at the overlap endpoints;
    3. classify each sub-edge: strictly inside / strictly outside the
       other multipolygon (even-odd PIP of the midpoint over all its
       rings), or shared (an identical sub-edge exists on the other
       side, same or opposite direction);
    4. op-specific keep rules over directed sub-edges:
         intersection: A-in, B-in, shared-same (once)
         union:        A-out, B-out, shared-same (once)
         difference:   A-out, B-in reversed, shared-opposite (once)
         symdiff:      A-out, A-in reversed, B-out, B-in reversed
    5. stitch kept edges into rings with the leftmost-turn rule
       (keeps the result interior on the left), yielding CCW
       exteriors and CW holes; area = shoelace over kept edges /2,
       stitch-independent.

Scope note: inputs must be valid multipolygons (simple rings, holes
inside their exteriors). Nearly-coincident-but-unequal vertices
(< 1e-9 apart) may chain through the quantized stitching keys; exact
fixture coordinates (1e-4 fixed point) are always exact here.
"""

from __future__ import annotations

import numpy as np

from spapy_ray.kernels import geom

_SNAP = 1e-9      # parametric endpoint snap + stitch quantization
_OPS = ("intersection", "union", "difference", "symdiff")


def _normalized_edges(mp) -> np.ndarray:
    """Multipolygon → directed edges [n,4], exteriors CCW, holes CW."""
    segs = []
    for poly in mp:
        for j, ring in enumerate(poly):
            r = geom._close_open(np.asarray(ring, dtype=np.float64))
            sa = geom.ring_signed_area(r)
            if (j == 0 and sa < 0) or (j > 0 and sa > 0):
                r = r[::-1]
            nxt = np.roll(r, -1, axis=0)
            segs.append(np.column_stack([r, nxt]))
    return np.vstack(segs) if segs else np.zeros((0, 4))


def _split_points(edges_a: np.ndarray, edges_b: np.ndarray):
    """For every A-edge, the canonical split coordinates produced by
    B-edges (and vice versa). Returns (splits_a, splits_b): lists of
    per-edge coordinate lists [(t, x, y), ...]."""
    na, nb = len(edges_a), len(edges_b)
    splits_a: list[list] = [[] for _ in range(na)]
    splits_b: list[list] = [[] for _ in range(nb)]
    if na == 0 or nb == 0:
        return splits_a, splits_b
    bp = edges_b[:, 0:2]
    bq = edges_b[:, 2:4]
    bd = bq - bp
    blen = np.hypot(bd[:, 0], bd[:, 1])
    for i in range(na):
        p = edges_a[i, 0:2]
        q = edges_a[i, 2:4]
        d = q - p
        alen = float(np.hypot(d[0], d[1]))
        denom = d[0] * bd[:, 1] - d[1] * bd[:, 0]
        e = bp - p[None, :]
        para = denom == 0.0
        # --- proper/touching crossings (non-parallel)
        nz = ~para
        if nz.any():
            t = (e[nz, 0] * bd[nz, 1] - e[nz, 1] * bd[nz, 0]) / denom[nz]
            u = (e[nz, 0] * d[1] - e[nz, 1] * d[0]) / denom[nz]
            # snap parameters to endpoints
            t = np.where(np.abs(t) < _SNAP, 0.0, t)
            t = np.where(np.abs(1.0 - t) < _SNAP, 1.0, t)
            u = np.where(np.abs(u) < _SNAP, 0.0, u)
            u = np.where(np.abs(1.0 - u) < _SNAP, 1.0, u)
            ok = (t >= 0.0) & (t <= 1.0) & (u >= 0.0) & (u <= 1.0)
            js = np.nonzero(nz)[0][ok]
            ts = t[ok]
            us = u[ok]
            for j, tt, uu in zip(js, ts, us):
                # canonical coordinate: an exact endpoint when snapped,
                # else interpolated on the A edge (both sides use it)
                if tt == 0.0:
                    x, y = p
                elif tt == 1.0:
                    x, y = q
                elif uu == 0.0:
                    x, y = bp[j]
                elif uu == 1.0:
                    x, y = bq[j]
                else:
                    x, y = p + tt * d
                if 0.0 < tt < 1.0:
                    splits_a[i].append((tt, float(x), float(y)))
                if 0.0 < uu < 1.0:
                    splits_b[j].append((uu, float(x), float(y)))
        # --- parallel: collinear overlap
        pz = np.nonzero(para)[0]
        for j in pz:
            cross = e[j, 0] * d[1] - e[j, 1] * d[0]
            scale = max(alen * blen[j], 1e-300)
            if abs(cross) > _SNAP * scale:
                continue                      # parallel, not collinear
            dd = float(d[0] * d[0] + d[1] * d[1])
            t0 = float(e[j, 0] * d[0] + e[j, 1] * d[1]) / dd
            t1 = t0 + float(bd[j, 0] * d[0] + bd[j, 1] * d[1]) / dd
            for tt, src in ((t0, bp[j]), (t1, bq[j])):
                if np.abs(tt) < _SNAP:
                    tt = 0.0
                elif np.abs(1.0 - tt) < _SNAP:
                    tt = 1.0
                if 0.0 < tt < 1.0:
                    splits_a[i].append((tt, float(src[0]), float(src[1])))
            # B-edge splits at A's endpoints when they land inside it
            bb = float(bd[j, 0] ** 2 + bd[j, 1] ** 2)
            u0 = float((p - bp[j]) @ bd[j]) / bb
            u1 = float((q - bp[j]) @ bd[j]) / bb
            for uu, src in ((u0, p), (u1, q)):
                if np.abs(uu) < _SNAP:
                    uu = 0.0
                elif np.abs(1.0 - uu) < _SNAP:
                    uu = 1.0
                if 0.0 < uu < 1.0:
                    splits_b[j].append((uu, float(src[0]), float(src[1])))
    return splits_a, splits_b


def _apply_splits(edges: np.ndarray, splits: list[list]) -> np.ndarray:
    """Edges + per-edge split points → sub-edges [m,4]."""
    out = []
    for i in range(len(edges)):
        p = (edges[i, 0], edges[i, 1])
        q = (edges[i, 2], edges[i, 3])
        pts = sorted(set(splits[i]))          # by t, dedup exact repeats
        chain = [p] + [(x, y) for _, x, y in pts] + [q]
        for a, b in zip(chain[:-1], chain[1:]):
            if a != b:
                out.append((a[0], a[1], b[0], b[1]))
    return np.asarray(out, dtype=np.float64) if out else np.zeros((0, 4))


def _pip_multipolygon(px: np.ndarray, py: np.ndarray, mp) -> np.ndarray:
    """Even-odd membership over every ring (holes flip)."""
    inside = np.zeros(px.shape, dtype=bool)
    for poly in mp:
        for ring in poly:
            inside ^= geom.pip_ring(px, py, ring)
    return inside


def _qkey(x: float, y: float) -> tuple[int, int]:
    return (int(round(x / _SNAP)), int(round(y / _SNAP)))


def _edge_keys(sub: np.ndarray):
    """(undirected segment key, forward?) per sub-edge."""
    keys = []
    for x1, y1, x2, y2 in sub:
        a, b = _qkey(x1, y1), _qkey(x2, y2)
        if a <= b:
            keys.append((a, b, True))
        else:
            keys.append((b, a, False))
    return keys


def _classify(sub: np.ndarray, other_mp, shared: dict):
    """Per sub-edge: 'in' / 'out' / 'same' / 'opp'."""
    n = len(sub)
    cls = np.empty(n, dtype=object)
    mx = (sub[:, 0] + sub[:, 2]) / 2.0
    my = (sub[:, 1] + sub[:, 3]) / 2.0
    inside = _pip_multipolygon(mx, my, other_mp)
    for i, (a, b, fwd) in enumerate(_edge_keys(sub)):
        om = shared.get((a, b))
        if om is not None:
            cls[i] = "same" if om == fwd else "opp"
        else:
            cls[i] = "in" if inside[i] else "out"
    return cls


def _stitch(edges: list[tuple]) -> list[np.ndarray]:
    """Directed edges → rings, leftmost-turn continuation (keeps the
    result interior on the left; pinch vertices split into separate
    rings consistently)."""
    n = len(edges)
    if n == 0:
        return []
    out_adj: dict[tuple, list[int]] = {}
    for i, (x1, y1, x2, y2) in enumerate(edges):
        out_adj.setdefault(_qkey(x1, y1), []).append(i)
    used = [False] * n
    rings = []
    for i0 in range(n):
        if used[i0]:
            continue
        start_key = _qkey(edges[i0][0], edges[i0][1])
        ring = [(edges[i0][0], edges[i0][1])]
        cur = i0
        used[i0] = True
        closed = False
        guard = 0
        while guard <= n:
            guard += 1
            x1, y1, x2, y2 = edges[cur]
            head = _qkey(x2, y2)
            if head == start_key:
                closed = True
                break
            cands = [j for j in out_adj.get(head, []) if not used[j]]
            if not cands:
                break                          # broken chain — drop
            if len(cands) == 1:
                nxt = cands[0]
            else:
                # leftmost turn: maximize CCW angle of the candidate
                # direction relative to the incoming direction
                din = np.arctan2(y2 - y1, x2 - x1)
                best, best_ang = None, -np.inf
                for j in cands:
                    a1, b1, a2, b2 = edges[j]
                    ang = np.arctan2(b2 - b1, a2 - a1) - din
                    while ang <= -np.pi:
                        ang += 2 * np.pi
                    while ang > np.pi:
                        ang -= 2 * np.pi
                    if ang > best_ang:
                        best, best_ang = j, ang
                nxt = best
            ring.append((edges[nxt][0], edges[nxt][1]))
            used[nxt] = True
            cur = nxt
        if closed and len(ring) >= 3:
            rings.append(np.asarray(ring, dtype=np.float64))
    return rings


def boolean_edges(mp_a, mp_b, op: str):
    """→ (rings: list[np.ndarray], area: float). Rings follow even-odd
    semantics: CCW exteriors, CW holes; area = Σ signed ring areas
    (computed directly from the kept edges, stitch-independent)."""
    if op not in _OPS:
        raise ValueError(f"unknown op {op!r}")
    ea = _normalized_edges(mp_a)
    eb = _normalized_edges(mp_b)
    sa, sb = _split_points(ea, eb)
    sub_a = _apply_splits(ea, sa)
    sub_b = _apply_splits(eb, sb)

    # shared-segment detection on exact (quantized) segment keys
    bkeys = {}
    for (a, b, fwd) in _edge_keys(sub_b):
        bkeys[(a, b)] = fwd
    akeys = {}
    for (a, b, fwd) in _edge_keys(sub_a):
        akeys[(a, b)] = fwd
    cls_a = _classify(sub_a, mp_b, bkeys)
    cls_b = _classify(sub_b, mp_a, akeys)

    def fwd_e(e):
        return (e[0], e[1], e[2], e[3])

    def rev_e(e):
        return (e[2], e[3], e[0], e[1])

    keep: list[tuple] = []
    if op == "intersection":
        keep += [fwd_e(e) for e, c in zip(sub_a, cls_a) if c in ("in", "same")]
        keep += [fwd_e(e) for e, c in zip(sub_b, cls_b) if c == "in"]
    elif op == "union":
        keep += [fwd_e(e) for e, c in zip(sub_a, cls_a) if c in ("out", "same")]
        keep += [fwd_e(e) for e, c in zip(sub_b, cls_b) if c == "out"]
    elif op == "difference":
        keep += [fwd_e(e) for e, c in zip(sub_a, cls_a) if c in ("out", "opp")]
        keep += [rev_e(e) for e, c in zip(sub_b, cls_b) if c == "in"]
    else:                                     # symdiff
        keep += [fwd_e(e) for e, c in zip(sub_a, cls_a) if c == "out"]
        keep += [rev_e(e) for e, c in zip(sub_a, cls_a) if c == "in"]
        keep += [fwd_e(e) for e, c in zip(sub_b, cls_b) if c == "out"]
        keep += [rev_e(e) for e, c in zip(sub_b, cls_b) if c == "in"]

    area = 0.0
    for x1, y1, x2, y2 in keep:
        area += x1 * y2 - x2 * y1
    area /= 2.0
    rings = _stitch(keep)
    return rings, area
