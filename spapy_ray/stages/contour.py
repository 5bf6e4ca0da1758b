"""Contour extraction (SpaTopoTools.Contour, SpaTopo.py:185-233 —
gdal.ContourGenerate replacement): marching squares per tile with a
1-px halo, then polyline stitching.

Distributed shape (round-2 rewrite):

- segment generation is a vectorized marching-squares kernel over the
  padded tile (the same halo-exchange fragments as hillshade), each
  tile OWNING the cells whose top-left pixel it contains → no
  duplicate segments;
- every segment endpoint carries an EXACT integer grid-edge id
  (kind, global px, py packed into one int64) — adjacent tiles derive
  the identical id for a shared crossing, so stitching needs no
  floating-point snap and cannot mis-join;
- stitching runs LOCALLY inside the same per-tile map_groups: loops
  contained in a tile close there; only chains that touch the tile
  border leave the worker, as (endpoint-id, endpoint-id, n_points,
  length, wkb) fragments;
- the driver merges the small cross-tile fragment graph (O(border
  crossings), not O(contour length)).

Outputs one row per polyline: (level, line_id, n_points, length,
closed, wkb LineString).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from spapy_ray.kernels import wkb
from spapy_ray.sources.rasters import RasterMeta

# marching-squares: for each case (bit0=TL, bit1=TR, bit2=BR, bit3=BL
# above level) the crossed edge pairs. Edges: 0=top,1=right,2=bottom,3=left.
_CASES: dict[int, list[tuple[int, int]]] = {
    0: [], 15: [],
    1: [(3, 0)], 14: [(3, 0)],
    2: [(0, 1)], 13: [(0, 1)],
    4: [(1, 2)], 11: [(1, 2)],
    8: [(2, 3)], 7: [(2, 3)],
    3: [(3, 1)], 12: [(3, 1)],
    6: [(0, 2)], 9: [(0, 2)],
    5: [(3, 0), (1, 2)],      # ambiguous saddles: fixed resolution
    10: [(0, 1), (2, 3)],
}

_EDGE_SHIFT = 21              # grid coords < 2^21; id = kind<<42 | gx<<21 | gy


def _edge_id(kind: np.ndarray, gx: np.ndarray, gy: np.ndarray) -> np.ndarray:
    """Pack a grid-edge identity into int64. kind 0 = horizontal edge
    between pixels (gx,gy)-(gx+1,gy); kind 1 = vertical edge between
    (gx,gy)-(gx,gy+1). Exact — both tiles adjacent to a crossing
    compute the same id."""
    return ((kind.astype(np.int64) << (2 * _EDGE_SHIFT))
            | (gx.astype(np.int64) << _EDGE_SHIFT) | gy.astype(np.int64))


def marching_squares_segments_ids(z: np.ndarray, level: float,
                                  x0: float, y0: float,
                                  dx: float, dy: float,
                                  col0: int = 0, row0: int = 0):
    """Segments for cells whose top-left corner is in z[:-1, :-1].

    Returns (segs [k,4] float xy pairs, ida [k], idb [k]) where
    ida/idb are packed GLOBAL grid-edge ids of the two endpoints
    (corner (i,j) of z = global pixel (col0+j, row0+i))."""
    zz = z.astype(np.float64)
    above = zz >= level
    tl = above[:-1, :-1]
    tr = above[:-1, 1:]
    br = above[1:, 1:]
    bl = above[1:, :-1]
    case = (tl.astype(np.int8) | (tr.astype(np.int8) << 1)
            | (br.astype(np.int8) << 2) | (bl.astype(np.int8) << 3))
    ii, jj = np.nonzero((case != 0) & (case != 15))
    if len(ii) == 0:
        return np.zeros((0, 4)), np.zeros(0, np.int64), np.zeros(0, np.int64)

    zTL = zz[ii, jj]
    zTR = zz[ii, jj + 1]
    zBR = zz[ii + 1, jj + 1]
    zBL = zz[ii + 1, jj]

    def interp(za, zb):
        d = zb - za
        t = np.where(d != 0, (level - za) / np.where(d == 0, 1, d), 0.5)
        return np.clip(t, 0.0, 1.0)

    gj = jj + col0
    gi = ii + row0
    # per-edge crossing coordinates and exact ids
    ex = {
        0: (jj + interp(zTL, zTR), ii + 0.0,
            _edge_id(np.zeros(len(ii)), gj, gi)),                 # top
        1: (jj + 1.0, ii + interp(zTR, zBR),
            _edge_id(np.ones(len(ii)), gj + 1, gi)),              # right
        2: (jj + interp(zBL, zBR), ii + 1.0,
            _edge_id(np.zeros(len(ii)), gj, gi + 1)),             # bottom
        3: (jj + 0.0, ii + interp(zTL, zBL),
            _edge_id(np.ones(len(ii)), gj, gi)),                  # left
    }
    segs, ida, idb = [], [], []
    cases = case[ii, jj]
    for c, pairs in _CASES.items():
        if not pairs:
            continue
        m = cases == c
        if not m.any():
            continue
        for e1, e2 in pairs:
            x1 = x0 + ex[e1][0][m] * dx
            y1 = y0 + ex[e1][1][m] * dy
            x2 = x0 + ex[e2][0][m] * dx
            y2 = y0 + ex[e2][1][m] * dy
            segs.append(np.column_stack([x1, y1, x2, y2]))
            ida.append(ex[e1][2][m])
            idb.append(ex[e2][2][m])
    return (np.vstack(segs), np.concatenate(ida), np.concatenate(idb))


def marching_squares_segments(z: np.ndarray, level: float,
                              x0: float, y0: float,
                              dx: float, dy: float) -> np.ndarray:
    """Back-compat wrapper: segments only."""
    return marching_squares_segments_ids(z, level, x0, y0, dx, dy)[0]


def _chain_local(segs: np.ndarray, ida: np.ndarray, idb: np.ndarray,
                 with_geometry: bool = True):
    """Chain segments into polylines by exact endpoint-id matching.

    Returns list of (closed, n_points, length, end_id_a, end_id_b,
    coords|None). Interior loops come out closed; open chains report
    their terminal edge ids for cross-partition merging."""
    n = len(segs)
    seglen = np.hypot(segs[:, 2] - segs[:, 0], segs[:, 3] - segs[:, 1])
    la = ida.tolist()
    lb = idb.tolist()
    ll = seglen.tolist()
    adj: dict[int, list] = {}
    for i in range(n):
        adj.setdefault(la[i], []).append((i, 0))
        adj.setdefault(lb[i], []).append((i, 1))
    used = bytearray(n)
    out = []
    for i in range(n):
        if used[i]:
            continue
        ids = [la[i], lb[i]]
        chain = [(i, True)]          # (segment index, forward?)
        length = ll[i]
        used[i] = 1
        for end in (1, 0):
            while ids[0] != ids[-1]:
                key = ids[-1] if end == 1 else ids[0]
                nxt = [e for e in adj.get(key, []) if not used[e[0]]]
                if not nxt:
                    break
                j, side = nxt[0]
                used[j] = 1
                other = la[j] if side == 1 else lb[j]
                length += ll[j]
                if end == 1:
                    ids.append(other)
                    chain.append((j, side == 0))
                else:
                    ids.insert(0, other)
                    chain.insert(0, (j, side == 1))
        closed = ids[0] == ids[-1] and len(ids) > 2
        if with_geometry:
            pts = [(segs[j, :2], segs[j, 2:]) if fwd else
                   (segs[j, 2:], segs[j, :2]) for j, fwd in chain]
            arr = np.vstack([pts[0][0]] + [p[1] for p in pts])
        else:
            arr = None
        out.append((closed, len(ids), length, ids[0], ids[-1], arr))
    return out


def contour_pieces(ds, meta: RasterMeta, levels: list[float], *,
                   dtype: str = "float32", with_geometry: bool = True):
    """Tile table → Dataset of locally-stitched contour pieces.

    Columns: level f64, closed bool, n_points i64, length f64,
    id_a i64, id_b i64 (terminal edge ids; -1 for closed pieces),
    geom_wkb binary (empty if with_geometry=False)."""
    from spapy_ray.stages.raster import (_auto_block, _block_mosaic_tiles,
                                         _halo_block_rows)

    block = _auto_block(meta)
    tagged = ds.map_batches(
        lambda t: _halo_block_rows(t, meta, dtype, block),
        batch_format="pyarrow")
    T = meta.tile_size

    def one_tile(tx, ty, pad, rows):
        # cells owned: top-left corners = this tile's pixels → use
        # pad[1:T+2, 1:T+2] (core + one E/S halo row/col)
        z = pad[1:T + 2, 1:T + 2]
        # clip at raster edge (no cells beyond last pixel row/col)
        max_i = min(T, meta.height - ty * T - 1) + 1
        max_j = min(T, meta.width - tx * T - 1) + 1
        z = z[:max_i, :max_j]
        x0 = meta.x_min + (tx * T + 0.5) * meta.pixel_w
        y0 = meta.y_max + (ty * T + 0.5) * meta.pixel_h
        for lv in levels:
            segs, ida, idb = marching_squares_segments_ids(
                z, lv, x0, y0, meta.pixel_w, meta.pixel_h,
                col0=tx * T, row0=ty * T)
            for closed, npts, ln, ia, ib, arr in _chain_local(
                    segs, ida, idb, with_geometry):
                rows["level"].append(lv)
                rows["closed"].append(closed)
                rows["n_points"].append(npts)
                rows["length"].append(ln)
                rows["id_a"].append(-1 if closed else ia)
                rows["id_b"].append(-1 if closed else ib)
                rows["geom_wkb"].append(
                    wkb.encode_linestring(arr) if arr is not None else b"")

    # block-mosaic halo exchange (raster.py r4): ~1.5 shuffle rows
    # per tile instead of 9; per-tile pads are VIEWS of one mosaic
    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        mosaic, tx0, ty0, tiles = _block_mosaic_tiles(g, meta, dtype,
                                                      block)
        rows = {"level": [], "closed": [], "n_points": [], "length": [],
                "id_a": [], "id_b": [], "geom_wkb": []}
        for tx, ty in tiles:
            pad = mosaic[(ty - ty0) * T:(ty - ty0) * T + T + 2,
                         (tx - tx0) * T:(tx - tx0) * T + T + 2]
            one_tile(tx, ty, pad, rows)
        return pd.DataFrame(rows)

    return tagged.groupby("bk__").map_groups(per_bucket,
                                             batch_format="pandas")


def merge_open_pieces(df: pd.DataFrame, with_geometry: bool = True) -> pd.DataFrame:
    """Driver-side merge of cross-tile open pieces (exact edge-id
    adjacency; O(#fragments), fragments ≈ tile-border crossings).
    Input/output columns as contour_pieces."""
    out = {"level": [], "closed": [], "n_points": [], "length": [],
           "id_a": [], "id_b": [], "geom_wkb": []}
    if len(df) == 0:            # empty-Dataset to_pandas has no columns
        return pd.DataFrame(out)
    for lv, g in df.groupby("level", sort=True):
        ia = g["id_a"].to_numpy()
        ib = g["id_b"].to_numpy()
        npts = g["n_points"].to_numpy()
        lens = g["length"].to_numpy()
        wkbs = g["geom_wkb"].to_list()
        n = len(g)
        adj: dict[int, list] = {}
        for i in range(n):
            adj.setdefault(int(ia[i]), []).append((i, 0))
            adj.setdefault(int(ib[i]), []).append((i, 1))
        used = np.zeros(n, dtype=bool)

        def piece_coords(i: int, forward: bool) -> np.ndarray:
            arr = np.asarray(wkb.decode(wkbs[i])[1], dtype=np.float64)
            return arr if forward else arr[::-1]

        for i in range(n):
            if used[i]:
                continue
            used[i] = True
            ids = [int(ia[i]), int(ib[i])]
            chain = [(i, True)]
            total_pts = int(npts[i])
            total_len = float(lens[i])
            for end in (1, 0):
                while ids[0] != ids[-1]:
                    key = ids[-1] if end == 1 else ids[0]
                    nxt = [e for e in adj.get(key, []) if not used[e[0]]]
                    if not nxt:
                        break
                    j, side = nxt[0]
                    used[j] = True
                    # side==0 means we matched j's id_a → traverse forward
                    other = int(ib[j]) if side == 0 else int(ia[j])
                    total_pts += int(npts[j]) - 1     # shared junction point
                    total_len += float(lens[j])
                    if end == 1:
                        ids.append(other)
                        chain.append((j, side == 0))
                    else:
                        ids.insert(0, other)
                        chain.insert(0, (j, side == 1))
            closed = ids[0] == ids[-1]
            out["level"].append(lv)
            out["closed"].append(bool(closed))
            out["n_points"].append(total_pts)
            out["length"].append(total_len)
            out["id_a"].append(-1 if closed else ids[0])
            out["id_b"].append(-1 if closed else ids[-1])
            if with_geometry:
                parts = [piece_coords(j, fwd) for j, fwd in chain]
                arr = np.vstack([parts[0]] + [p[1:] for p in parts[1:]])
                out["geom_wkb"].append(wkb.encode_linestring(arr))
            else:
                out["geom_wkb"].append(b"")
    return pd.DataFrame(out)


def _contour_block(node: np.ndarray, G: int) -> np.ndarray:
    """Level-tagged edge-id node → spatial block id at granularity G
    pixels (node = edge_id << 6 | level_idx; edge_id packs gx, gy)."""
    eid = node >> np.int64(6)
    gx = (eid >> np.int64(_EDGE_SHIFT)) & np.int64((1 << _EDGE_SHIFT) - 1)
    gy = eid & np.int64((1 << _EDGE_SHIFT) - 1)
    return ((gx // G) << np.int64(_EDGE_SHIFT)) | (gy // G)


def merge_open_pieces_dist(open_ds, levels: list[float], meta: RasterMeta,
                           *, with_geometry: bool = True,
                           buckets: int = 64):
    """Distributed cross-tile chain merge: each open piece is an edge
    between its two terminal grid-edge ids; chains = connected
    components of that graph. Components come from the hierarchical
    spatial merge (polygonize.spatial_min_label over pixel-space
    blocks — piece spans are bounded by the tile size, so almost all
    contract at the first level); every chain then lands wholly in
    one hash(root) bucket where the existing driver merge algorithm
    stitches it. Driver memory: O(1) — only Datasets flow.

    Returns a Dataset with contour_pieces' columns, one row per
    merged line."""
    import pyarrow.compute as pc

    from spapy_ray.stages.polygonize import spatial_min_label

    if len(levels) > 64:
        raise ValueError("level index packed into 6 bits (<=64 levels)")
    lv_arr = np.asarray(sorted(levels), dtype=np.float64)

    def add_node(t: pa.Table) -> pa.Table:
        lv = t.column("level").to_numpy()
        li = np.searchsorted(lv_arr, lv).astype(np.int64)
        na = (t.column("id_a").to_numpy().astype(np.int64) << 6) | li
        nb = (t.column("id_b").to_numpy().astype(np.int64) << 6) | li
        t = t.append_column("node", pa.array(na))
        return t.append_column("node_b", pa.array(nb))

    # two consumers (as_pairs, piece_rows) but add_node is a cheap
    # projection over the caller's already-materialized piece table —
    # re-running it twice beats another execution barrier
    pieces = open_ds.map_batches(add_node, batch_format="pyarrow")

    def as_pairs(t: pa.Table) -> pa.Table:
        return pa.table({"a": t.column("node"), "b": t.column("node_b")})

    ext = max(meta.width, meta.height, 1)
    # base block 8x the tile size: a piece spans at most one tile, so
    # >98% of chain edges are internal at level 1; the payload of one
    # block (open-chain terminals in an 8x8-tile region) stays small
    # roots feeds exactly one consumer (root_rows) — stream it so the
    # whole merge fuses into one execution with the stage-1 shuffle
    roots = spatial_min_label(
        pieces.map_batches(as_pairs, batch_format="pyarrow"), ext, ext,
        base_block=max(8 * meta.tile_size, 16),
        block_fn=_contour_block)

    # stage 1: deliver each piece its chain root (bucketed hash join
    # on the piece's node_a; missing root → singleton chain)
    Bk = np.uint64(buckets)

    def _hash(n: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            return ((n.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                    % Bk).astype(np.int64)

    def root_rows(t: pa.Table) -> pa.Table:
        n = t.column("node").to_numpy().astype(np.int64)
        z = len(t)
        return pa.table({
            "hbk": pa.array(_hash(n)),
            "kind": pa.array(np.zeros(z, np.int8)),
            "node": pa.array(n),
            "root": t.column("root"),
            "level": pa.array(np.zeros(z, np.float64)),
            "closed": pa.array(np.zeros(z, np.bool_)),
            "n_points": pa.array(np.zeros(z, np.int64)),
            "length": pa.array(np.zeros(z, np.float64)),
            "id_a": pa.array(np.zeros(z, np.int64)),
            "id_b": pa.array(np.zeros(z, np.int64)),
            "geom_wkb": pa.array([b""] * z, type=pa.binary()),
        })

    def piece_rows(t: pa.Table) -> pa.Table:
        n = t.column("node").to_numpy().astype(np.int64)
        z = len(t)
        return pa.table({
            "hbk": pa.array(_hash(n)),
            "kind": pa.array(np.ones(z, np.int8)),
            "node": pa.array(n),
            "root": pa.array(np.zeros(z, np.int64)),
            "level": t.column("level"),
            "closed": pc.cast(t.column("closed"), pa.bool_()),
            "n_points": pc.cast(t.column("n_points"), pa.int64()),
            "length": t.column("length"),
            "id_a": pc.cast(t.column("id_a"), pa.int64()),
            "id_b": pc.cast(t.column("id_b"), pa.int64()),
            "geom_wkb": t.column("geom_wkb"),
        })

    stage1 = roots.map_batches(root_rows, batch_format="pyarrow").union(
        pieces.map_batches(piece_rows, batch_format="pyarrow"))

    PIECE_COLS = ["level", "closed", "n_points", "length",
                  "id_a", "id_b", "geom_wkb"]

    def bucket_assign(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        lab = df[df["kind"] == 0][["node", "root"]]
        pcs = df[df["kind"] == 1].drop(columns=["root"])
        m = pcs.merge(lab, on="node", how="left")
        m["root"] = m["root"].fillna(m["node"]).astype(np.int64)
        out = m[["root"] + PIECE_COLS]
        return pa.Table.from_pandas(out, preserve_index=False)

    assigned = stage1.groupby("hbk").map_groups(
        bucket_assign, batch_format="pyarrow")

    # stage 2: co-locate whole chains on hash(root); stitch per bucket
    def tag_root(t: pa.Table) -> pa.Table:
        r = t.column("root").to_numpy().astype(np.int64)
        return t.append_column("hbk", pa.array(_hash(r)))

    PIECE_SCHEMA = pa.schema(
        [("level", pa.float64()), ("closed", pa.bool_()),
         ("n_points", pa.int64()), ("length", pa.float64()),
         ("id_a", pa.int64()), ("id_b", pa.int64()),
         ("geom_wkb", pa.binary())])

    def bucket_stitch(g: pa.Table) -> pa.Table:
        df = g.to_pandas()[PIECE_COLS]
        out = merge_open_pieces(df, with_geometry=with_geometry)
        if len(out) == 0:
            return PIECE_SCHEMA.empty_table()
        return pa.Table.from_pandas(
            out, preserve_index=False).cast(PIECE_SCHEMA)

    return assigned.map_batches(tag_root, batch_format="pyarrow") \
        .groupby("hbk").map_groups(bucket_stitch, batch_format="pyarrow")


def contour(ds, meta: RasterMeta, levels: list[float], *,
            dtype: str = "float32", merge: str = "auto",
            driver_max_pieces: int = 2_000_000,
            as_dataset: bool = True, with_geometry: bool = True):
    """Full contour op: distributed per-tile stitch → cross-tile merge
    of the border-fragment graph. Returns (level, line_id, n_points,
    length, closed, geom_wkb), line_id numbered 0..n-1 per level.

    ``as_dataset=True`` (the DEFAULT — VERDICT r3 #2) streams the
    closed ∪ merged lines as a Dataset and assigns line_id through
    ``window_over(row_number)`` partitioned by level, ordered by
    (n_points, length, fnv1a(geom_wkb)) — no whole-line-table driver
    materialization anywhere; consumers write_parquet or aggregate
    directly. Forces merge="distributed" when merge="auto".

    ``as_dataset=False`` keeps the small-output pandas form: driver
    concat + stable sort + per-level cumcount. Its line_id tie order
    is concat order, NOT the hash tiebreak — on ties the two forms
    can number identical-stat lines differently (both are valid
    0..n-1 numberings; SQL row_number has the same latitude).

    ``merge``: "driver" (one pandas pass over all open fragments),
    "distributed" (merge_open_pieces_dist — chains stitched inside
    hash(root) buckets, driver only sees finished lines), or "auto"
    (driver below ``driver_max_pieces`` open fragments; always
    "distributed" in the dataset form)."""
    pieces_ds = contour_pieces(ds, meta, levels, dtype=dtype,
                               with_geometry=with_geometry).materialize()
    import pyarrow.compute as pc

    def open_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(t.column("closed")))

    open_ds = pieces_ds.map_batches(open_only, batch_format="pyarrow")
    if merge == "auto":
        if as_dataset:
            merge = "distributed"
        else:
            merge = "driver" if open_ds.count() <= driver_max_pieces \
                else "distributed"

    def closed_only(t: pa.Table) -> pa.Table:
        return t.filter(t.column("closed"))

    if as_dataset:
        if merge != "distributed":
            raise ValueError("as_dataset requires merge='distributed'")
        from spapy_ray.kernels.hashing import fnv1a64
        from spapy_ray.stages.window import window_over

        merged_ds = merge_open_pieces_dist(open_ds, levels, meta,
                                           with_geometry=with_geometry)
        lines = pieces_ds.map_batches(
            closed_only, batch_format="pyarrow").union(merged_ds)

        # with geometry the fnv1a(wkb) tiebreak makes line_id a pure
        # function of the line set; without it (with_geometry=False —
        # the cheap stats form) ties order arbitrarily, like SQL
        # row_number without a unique ORDER BY — line_id is still
        # exactly 0..n-1 per level either way
        def add_tie(t: pa.Table) -> pa.Table:
            tie = fnv1a64(t.column("geom_wkb")).astype(np.int64)                 if with_geometry else np.zeros(len(t), np.int64)
            return pa.table({
                "level": t.column("level"),
                "closed": t.column("closed"),
                "n_points": t.column("n_points"),
                "length": t.column("length"),
                "geom_wkb": t.column("geom_wkb"),
                "tie__": pa.array(tie),
            })

        numbered = window_over(
            lines.map_batches(add_tie, batch_format="pyarrow"),
            key_col="level", order_cols=["n_points", "length", "tie__"],
            ops=[("line_id", "row_number", None)],
            keep_cols=["closed", "geom_wkb"])

        def finish(t: pa.Table) -> pa.Table:
            return pa.table({
                "level": t.column("level"),
                "line_id": pc.subtract(t.column("line_id"),
                                       pa.scalar(1, pa.int64())),
                "n_points": t.column("n_points"),
                "length": t.column("length"),
                "closed": t.column("closed"),
                "geom_wkb": t.column("geom_wkb"),
            })

        return numbered.map_batches(finish, batch_format="pyarrow")

    closed = pieces_ds.map_batches(closed_only,
                                   batch_format="pyarrow").to_pandas()
    if merge == "distributed":
        merged = merge_open_pieces_dist(
            open_ds, levels, meta, with_geometry=with_geometry).to_pandas()
    else:
        merged = merge_open_pieces(open_ds.to_pandas(),
                                   with_geometry=with_geometry)
    # empty-Dataset to_pandas drops columns — concat only real parts
    parts = [p for p in (closed, merged) if len(p)]
    if not parts:
        return pd.DataFrame(columns=["level", "line_id", "n_points",
                                     "length", "closed", "geom_wkb"])
    lines = pd.concat(parts, ignore_index=True)
    lines = lines.sort_values(["level", "n_points", "length"],
                              kind="stable").reset_index(drop=True)
    lines["line_id"] = lines.groupby("level").cumcount()
    return lines[["level", "line_id", "n_points", "length", "closed",
                  "geom_wkb"]]


def stitch_segments(segs: pd.DataFrame, snap: float = 1e-9) -> pd.DataFrame:
    """Legacy whole-array stitcher on quantized float endpoints (used
    by polygonize_rings where coords are exact corner-lattice ints).

    Returns (level, line_id, n_points, length, closed, geom_wkb).
    """
    out = []
    for lv, g in segs.groupby("level"):
        pts = g[["x1", "y1", "x2", "y2"]].to_numpy()
        qa = np.round(pts[:, :2] / snap).astype(np.int64)
        qb = np.round(pts[:, 2:] / snap).astype(np.int64)
        adj: dict[tuple, list] = {}
        for i in range(len(pts)):
            adj.setdefault(tuple(qa[i]), []).append((i, 0))
            adj.setdefault(tuple(qb[i]), []).append((i, 1))
        used = np.zeros(len(pts), dtype=bool)
        line_id = 0
        for i in range(len(pts)):
            if used[i]:
                continue
            # walk both directions from segment i
            chain = [tuple(qa[i]), tuple(qb[i])]
            coords = [pts[i, :2], pts[i, 2:]]
            used[i] = True
            for end in (1, 0):
                while True:
                    key = chain[-1] if end == 1 else chain[0]
                    nxt = [e for e in adj.get(key, []) if not used[e[0]]]
                    if not nxt:
                        break
                    j, side = nxt[0]
                    used[j] = True
                    other = tuple(qa[j]) if side == 1 else tuple(qb[j])
                    pt = pts[j, :2] if side == 1 else pts[j, 2:]
                    if end == 1:
                        chain.append(other)
                        coords.append(pt)
                    else:
                        chain.insert(0, other)
                        coords.insert(0, pt)
            arr = np.asarray(coords, dtype=np.float64)
            closed = bool(np.all(np.abs(arr[0] - arr[-1]) < snap * 10))
            d = np.diff(arr, axis=0)
            length = float(np.hypot(d[:, 0], d[:, 1]).sum())
            out.append({"level": lv, "line_id": line_id,
                        "n_points": len(arr), "length": length,
                        "closed": closed,
                        "geom_wkb": wkb.encode_linestring(arr)})
            line_id += 1
    return pd.DataFrame(out)
