"""Polygonize: contiguous same-value regions of a raster → components.

The reference shells into gdal.Polygonize (SpaRasters.py:827-882) to
get one polygon per contiguous same-value area with the value as an
attribute. The distributed form here produces the same *partition* of
the raster — a global component id per contiguous region plus its
attributes (value, pixel count, bbox, tiles touched, ring-derived
area) — via ONE pass over the tiles:

1. per-tile two-pass union-find labeling (stateless map_batches);
   the same pass emits, per batch, a single combined table holding
   (a) per-(tile,label) stats rows, (b) border-pixel rows keyed by
   the shared tile edge, and (c) per-(tile,label) boundary-edge
   cross-product partial sums (the shoelace pieces of the component's
   boundary rings, interior + raster-border edges);
2. a groupby on the shared tile edge pairs adjacent tiles' borders,
   yielding cross-tile (comp_a ~ comp_b) equivalences AND the
   boundary cross-sum contributions of value-change edges that lie ON
   tile seams;
3. a global union-find over the (small) equivalence list merges
   components that span tiles; per-component stats and ring areas
   aggregate from the partials.

Step 3 runs on the driver over O(cross-tile-adjacency) pairs — fine
up to millions of border runs; the documented scale-out path is
iterative min-label propagation over the same pair table (the SQL
oracle q_polygonize_components does exactly that with a recursive
CTE over horizontal runs).

Ring-derived area: the boundary of a component is a set of directed
pixel edges with the component on the left; the shoelace sum over
directed edges is ring-decomposition-independent, so
    area = -1/2 * sum(cross(tail, head))
needs no ring tracing and equals n_pixels exactly for a correct
boundary. `component_rings` does trace the actual rings (WKB) for
the geometry-facing operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from spapy_ray.sources.rasters import RasterMeta
from spapy_ray.stages.raster import decode_tile


def label_tile(a: np.ndarray) -> np.ndarray:
    """4-connected same-value components of one tile → int32 labels
    (0..k-1). Two-pass union-find; pair collection vectorized."""
    h, w = a.shape
    idx = np.arange(h * w, dtype=np.int64).reshape(h, w)
    parent = np.arange(h * w, dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x: int, y: int) -> None:
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    hpairs = np.nonzero(a[:, 1:] == a[:, :-1])
    for i, j in zip(*hpairs):
        union(idx[i, j], idx[i, j + 1])
    vpairs = np.nonzero(a[1:, :] == a[:-1, :])
    for i, j in zip(*vpairs):
        union(idx[i, j], idx[i + 1, j])
    roots = np.array([find(int(x)) for x in range(h * w)], dtype=np.int64)
    _, labels = np.unique(roots, return_inverse=True)
    return labels.reshape(h, w).astype(np.int32)


def _tile_stats(tx: int, ty: int, a: np.ndarray, labels: np.ndarray):
    """Per-(tile,label) rows: label, value, n_pixels, local bbox."""
    h, w = a.shape
    flat_l = labels.ravel()
    flat_v = a.ravel()
    order = np.argsort(flat_l, kind="stable")
    uniq, starts = np.unique(flat_l[order], return_index=True)
    ends = np.append(starts[1:], len(flat_l))
    ys, xs = np.divmod(np.arange(h * w, dtype=np.int64)[order], w)
    return {
        "label": uniq.astype(np.int32),
        "value": flat_v[order[starts]].astype(np.int64),
        "n_pixels": (ends - starts).astype(np.int64),
        "minx": np.minimum.reduceat(xs, starts),
        "miny": np.minimum.reduceat(ys, starts),
        "maxx": np.maximum.reduceat(xs, starts),
        "maxy": np.maximum.reduceat(ys, starts),
    }


def _tile_ringsums(tx: int, ty: int, a: np.ndarray, labels: np.ndarray,
                   meta: RasterMeta):
    """Per-label shoelace partial over interior value-change edges and
    raster-border edges (tile-seam edges come from the border-pair
    stage). Directed edges keep the component on the LEFT (y-down
    pixel space), so signed area = -sum/2 (exact integers)."""
    T = meta.tile_size
    h, w = a.shape
    gx0, gy0 = tx * T, ty * T
    nlab = int(labels.max()) + 1
    acc = np.zeros(nlab, dtype=np.float64)
    # vertical neighbor pairs (rows y, y+1) with different values
    m = a[1:, :] != a[:-1, :]
    if m.any():
        yy, _ = np.nonzero(m)
        yc = (gy0 + yy + 1).astype(np.float64)
        acc += np.bincount(labels[:-1, :][m], weights=-yc, minlength=nlab)
        acc += np.bincount(labels[1:, :][m], weights=yc, minlength=nlab)
    # horizontal neighbor pairs (cols x, x+1)
    m = a[:, 1:] != a[:, :-1]
    if m.any():
        _, xx = np.nonzero(m)
        xc = (gx0 + xx + 1).astype(np.float64)
        acc += np.bincount(labels[:, :-1][m], weights=-xc, minlength=nlab)
        acc += np.bincount(labels[:, 1:][m], weights=xc, minlength=nlab)
    # raster borders (no neighbor): top edge +y, bottom -(y+1),
    # west +x, east -(x+1), in global coords
    if ty == 0:
        acc += np.bincount(labels[0, :], weights=np.full(w, float(gy0)),
                           minlength=nlab)
    if ty == meta.tiles_y - 1:
        acc += np.bincount(labels[-1, :], weights=np.full(w, -float(gy0 + h)),
                           minlength=nlab)
    if tx == 0:
        acc += np.bincount(labels[:, 0], weights=np.full(h, float(gx0)),
                           minlength=nlab)
    if tx == meta.tiles_x - 1:
        acc += np.bincount(labels[:, -1], weights=np.full(h, -float(gx0 + w)),
                           minlength=nlab)
    nz = np.nonzero(acc)[0]
    return nz.astype(np.int32), acc[nz].astype(np.int64)


_COMBINED_FIELDS = [
    ("kind", pa.string()), ("tx", pa.int32()), ("ty", pa.int32()),
    ("label", pa.int32()), ("value", pa.int64()), ("n_pixels", pa.int64()),
    ("minx", pa.int64()), ("miny", pa.int64()),
    ("maxx", pa.int64()), ("maxy", pa.int64()),
    ("ekind", pa.string()), ("etx", pa.int32()), ("ety", pa.int32()),
    ("side", pa.int8()), ("pos", pa.int32()), ("cross", pa.int64()),
]


def _combined_table(parts: list[dict]) -> pa.Table:
    """Struct-of-arrays assembly (numpy concat per field, no python
    list building — the combined table is ~half a million rows on the
    512x512 noise DEM)."""
    cols = {}
    for name, typ in _COMBINED_FIELDS:
        chunks = []
        for p in parts:
            n = len(p["kind"])
            if name in p:
                v = p[name]
                chunks.append(np.asarray(v) if not isinstance(v, list) else v)
            elif typ == pa.string():
                chunks.append([""] * n)
            else:
                chunks.append(np.zeros(n, dtype=np.int64))
        if typ == pa.string():
            flat = []
            for c in chunks:
                flat.extend(c if isinstance(c, list) else c.tolist())
            cols[name] = pa.array(flat, type=typ)
        else:
            arrs = [np.asarray(c) for c in chunks]
            cols[name] = pa.array(
                np.concatenate(arrs) if arrs else np.zeros(0, np.int64),
                type=typ)
    return pa.table(cols)


def _per_batch_combined(t: pa.Table, meta: RasterMeta, dtype: str) -> pa.Table:
    """ONE labeling pass per tile → stats ('s'), border pixels ('b'),
    ring partial sums ('r') in a single combined table."""
    T = meta.tile_size
    parts = []
    txs = t.column("tx").to_numpy()
    tys = t.column("ty").to_numpy()
    for i, buf in enumerate(t.column("data").to_pylist()):
        a = decode_tile(buf, dtype, T)
        tx, ty = int(txs[i]), int(tys[i])
        labels = label_tile(a)
        h, w = a.shape
        st = _tile_stats(tx, ty, a, labels)
        n = len(st["label"])
        parts.append({"kind": ["s"] * n, "tx": np.full(n, tx),
                      "ty": np.full(n, ty), **st})
        # border pixels: edge id convention — vertical edge between
        # (tx,ty) and (tx+1,ty) is ("v", tx, ty); horizontal between
        # (tx,ty) and (tx,ty+1) is ("h", tx, ty)
        for ekind, etx, ety, side, vals, labs in (
                ("v", tx, ty, 0, a[:, -1], labels[:, -1]),
                ("v", tx - 1, ty, 1, a[:, 0], labels[:, 0]),
                ("h", tx, ty, 0, a[-1, :], labels[-1, :]),
                ("h", tx, ty - 1, 1, a[0, :], labels[0, :])):
            k = len(vals)
            parts.append({"kind": ["b"] * k, "tx": np.full(k, tx),
                          "ty": np.full(k, ty),
                          "label": labs.astype(np.int32),
                          "value": vals.astype(np.int64),
                          "ekind": [ekind] * k, "etx": np.full(k, etx),
                          "ety": np.full(k, ety),
                          "side": np.full(k, side, dtype=np.int8),
                          "pos": np.arange(k, dtype=np.int32)})
        rl, rc = _tile_ringsums(tx, ty, a, labels, meta)
        parts.append({"kind": ["r"] * len(rl), "tx": np.full(len(rl), tx),
                      "ty": np.full(len(rl), ty), "label": rl, "cross": rc})
    return _combined_table(parts)


_EDGE_GROUP_SCHEMA = pa.schema([
    ("kind", pa.string()), ("tx", pa.int32()), ("ty", pa.int32()),
    ("l_or_la", pa.int32()), ("tx_b", pa.int32()), ("ty_b", pa.int32()),
    ("l_b", pa.int32()), ("cross", pa.int64())])


def _edge_group_arrow(g: pa.Table, T: int) -> pa.Table:
    """Arrow wrapper (typed empty blocks keep Ray's size estimator
    quiet and block types uniform)."""
    out = _edge_group(g.to_pandas(), T)
    return pa.Table.from_pandas(out, schema=_EDGE_GROUP_SCHEMA,
                                preserve_index=False)


def _edge_group(g: pd.DataFrame, T: int) -> pd.DataFrame:
    """One shared tile edge → equivalence pairs ('p') for same-value
    border pixels + seam ring contributions ('r') for value changes."""
    a = g[g["side"] == 0]
    b = g[g["side"] == 1]
    empty = pd.DataFrame({
        "kind": pd.Series([], dtype=str),
        "tx": pd.Series([], dtype=np.int32), "ty": pd.Series([], dtype=np.int32),
        "l_or_la": pd.Series([], dtype=np.int32),
        "tx_b": pd.Series([], dtype=np.int32), "ty_b": pd.Series([], dtype=np.int32),
        "l_b": pd.Series([], dtype=np.int32),
        "cross": pd.Series([], dtype=np.int64)})
    if len(a) == 0 or len(b) == 0:
        return empty
    m = a.merge(b, on="pos", suffixes=("_a", "_b"))
    same = m[m["value_a"] == m["value_b"]]
    eq = same[["tx_a", "ty_a", "label_a", "tx_b", "ty_b", "label_b"]] \
        .drop_duplicates()
    diff = m[m["value_a"] != m["value_b"]]
    ek = g["ekind"].iloc[0]
    etx, ety = int(g["etx"].iloc[0]), int(g["ety"].iloc[0])
    # seam coordinate: X for vertical seams, Y for horizontal
    c = (etx + 1) * T if ek == "v" else (ety + 1) * T
    rows_p = pd.DataFrame({
        "kind": "p", "tx": eq["tx_a"].to_numpy(), "ty": eq["ty_a"].to_numpy(),
        "l_or_la": eq["label_a"].to_numpy(),
        "tx_b": eq["tx_b"].to_numpy(), "ty_b": eq["ty_b"].to_numpy(),
        "l_b": eq["label_b"].to_numpy(), "cross": 0})
    out = rows_p
    if len(diff):
        # side 0 (west/north tile): its east/south edge → -c;
        # side 1 (east/south tile): its west/top edge → +c.
        # Per (tile,label) partial sums (dedup by summing counts).
        d0 = diff.groupby(["tx_a", "ty_a", "label_a"]).size().reset_index(name="n")
        d1 = diff.groupby(["tx_b", "ty_b", "label_b"]).size().reset_index(name="n")
        rows_r = pd.DataFrame({
            "kind": "r",
            "tx": np.concatenate([d0["tx_a"].to_numpy(), d1["tx_b"].to_numpy()]),
            "ty": np.concatenate([d0["ty_a"].to_numpy(), d1["ty_b"].to_numpy()]),
            "l_or_la": np.concatenate([d0["label_a"].to_numpy(),
                                       d1["label_b"].to_numpy()]),
            "tx_b": 0, "ty_b": 0, "l_b": 0,
            "cross": np.concatenate([-c * d0["n"].to_numpy(),
                                     c * d1["n"].to_numpy()])})
        out = pd.concat([rows_p, rows_r], ignore_index=True)
    return out.astype({"tx": np.int32, "ty": np.int32, "l_or_la": np.int32,
                       "tx_b": np.int32, "ty_b": np.int32, "l_b": np.int32,
                       "cross": np.int64})


def _pack(tx, ty, lb):
    return ((np.asarray(tx).astype(np.int64) << 40)
            | (np.asarray(ty).astype(np.int64) << 20)
            | np.asarray(lb).astype(np.int64))


def polygonize_components(ds, meta: RasterMeta, *, dtype: str = "int32",
                          with_ring_area: bool = False,
                          return_mapping: bool = False,
                          merge: str = "auto",
                          driver_max_nodes: int = 2_000_000,
                          as_dataset: bool = False):
    """→ pandas DataFrame: one row per global component
    (component_id, value, n_pixels, minx, miny, maxx, maxy [global
    pixel coords], n_tiles [DISTINCT tiles touched], and ring_area
    when requested). With ``return_mapping`` also returns the
    {packed (tx,ty,label) → component_id} dict that ties per-tile
    local labels to global components (consumed by component_rings).

    ``merge`` selects the cross-tile label merge:
    - ``"driver"``: union-find over (tile, label) nodes on the driver
      — fastest while the node table fits one machine;
    - ``"distributed"``: iterative min-label propagation + Dataset
      joins/groupbys (distributed_min_label) — driver memory stays
      O(components), independent of node count;
    - ``"auto"``: driver below ``driver_max_nodes`` nodes, else
      distributed.
    """
    T = meta.tile_size
    combined = ds.map_batches(
        lambda t: _per_batch_combined(t, meta, dtype),
        batch_format="pyarrow").materialize()

    import pyarrow.compute as pc

    def _only(kind):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t.column("kind"), kind))
        return f

    border_ds = combined.map_batches(_only("b"), batch_format="pyarrow")
    pair_ds = border_ds.groupby(["ekind", "etx", "ety"]).map_groups(
        lambda g: _edge_group_arrow(g, T), batch_format="pyarrow")

    if merge == "auto":
        n_nodes = combined.map_batches(_only("s"), batch_format="pyarrow") \
            .count()
        merge = "driver" if n_nodes <= driver_max_nodes else "distributed"
    if merge == "distributed":
        # pair_ds has ONE consumer (the root merge) unless ring areas
        # also fold the seam crossings — only then pin it in memory
        pin = pair_ds.materialize() if with_ring_area else pair_ds
        return _components_distributed(
            combined, pin, meta,
            with_ring_area=with_ring_area, return_mapping=return_mapping,
            as_dataset=as_dataset)

    pair_out = pair_ds.to_pandas()

    def _sr(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column("kind"), pa.array(["s", "r"])))

    sr = combined.map_batches(_sr, batch_format="pyarrow").to_pandas()
    stats = sr[sr["kind"] == "s"].reset_index(drop=True)
    rings = sr[sr["kind"] == "r"]

    # driver-side union-find over (tile, label) nodes; the scale-out
    # path is iterative min-label propagation over the pair table
    # (exactly what the SQL oracle's recursive CTE does over runs)
    keys = _pack(stats["tx"], stats["ty"], stats["label"])
    codes, uniques = pd.factorize(keys)
    lookup = {int(k): i for i, k in enumerate(uniques)}
    parent = list(range(len(uniques)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    pairs = pair_out[pair_out["kind"] == "p"]
    if len(pairs):
        pa_keys = _pack(pairs["tx"], pairs["ty"], pairs["l_or_la"])
        pb_keys = _pack(pairs["tx_b"], pairs["ty_b"], pairs["l_b"])
        for ka, kb in zip(pa_keys.tolist(), pb_keys.tolist()):
            ra, rb = find(lookup[ka]), find(lookup[kb])
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)

    stats["root"] = [find(int(c)) for c in codes]
    stats["gminx"] = stats["minx"] + stats["tx"].astype(np.int64) * T
    stats["gminy"] = stats["miny"] + stats["ty"].astype(np.int64) * T
    stats["gmaxx"] = stats["maxx"] + stats["tx"].astype(np.int64) * T
    stats["gmaxy"] = stats["maxy"] + stats["ty"].astype(np.int64) * T
    stats["tile_key"] = (stats["tx"].to_numpy().astype(np.int64) << 20) \
        | stats["ty"].to_numpy().astype(np.int64)
    agg = stats.groupby("root").agg(
        value=("value", "first"), n_pixels=("n_pixels", "sum"),
        minx=("gminx", "min"), miny=("gminy", "min"),
        maxx=("gmaxx", "max"), maxy=("gmaxy", "max"),
        n_tiles=("tile_key", "nunique")).reset_index()

    if with_ring_area:
        ring_all = pd.concat(
            [rings[["tx", "ty", "label", "cross"]],
             pair_out[pair_out["kind"] == "r"].rename(
                 columns={"l_or_la": "label"})[["tx", "ty", "label", "cross"]]],
            ignore_index=True)
        rk = _pack(ring_all["tx"], ring_all["ty"], ring_all["label"])
        ring_all["root"] = [find(lookup[int(k)]) for k in rk]
        rsum = ring_all.groupby("root")["cross"].sum()
        agg["ring_area"] = (-agg["root"].map(rsum).fillna(0) // 2).astype(np.int64)

    agg["component_id"] = np.arange(len(agg), dtype=np.int64)
    if return_mapping:
        root_to_comp = dict(zip(agg["root"].tolist(),
                                agg["component_id"].tolist()))
        mapping = {int(k): root_to_comp[find(lookup[int(k)])]
                   for k in uniques}
        return agg.drop(columns=["root"]), mapping
    return agg.drop(columns=["root"])


def _local_uf_min(x: np.ndarray, y: np.ndarray):
    """Union-find over the pairs (x[i], y[i]) with union-by-min-index;
    keys are sorted-unique so the root index is the MIN key of each
    component. Returns (keys, min_label_per_key)."""
    keys = np.unique(np.concatenate([x, y]))
    xi = np.searchsorted(keys, x)
    yi = np.searchsorted(keys, y)
    parent = np.arange(len(keys), dtype=np.int64)

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i, j in zip(xi.tolist(), yi.tolist()):
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[max(ri, rj)] = min(ri, rj)
    roots = np.array([find(i) for i in range(len(keys))], dtype=np.int64)
    return keys, keys[roots]


def _node_block(node: np.ndarray, G: int) -> np.ndarray:
    """Packed (tx, ty, label) node id → spatial super-block id at
    granularity G tiles (matches _pack's bit layout)."""
    tx = node >> np.int64(40)
    ty = (node >> np.int64(20)) & np.int64(0xFFFFF)
    return ((tx // G) << np.int64(21)) | (ty // G)


def spatial_min_label(pairs_ds, tiles_x: int, tiles_y: int, *,
                      base_block: int = 16, fan: int = 4,
                      buckets: int = 64, block_fn=None):
    """Hierarchical spatial connected-components over a tile-adjacency
    pair table (nodes are packed (tx, ty, label) ids): per level,
    edges INTERNAL to a G×G tile super-block are contracted with a
    local union-find inside ONE groupby(block) pass; edges crossing
    block boundaries defer to the next level (G *= fan). Per-bucket
    payload is bounded by a block's border-component count and the
    cross-level edge volume shrinks geometrically — the classic
    hierarchical polygonize merge, log_fan(max_dim) rounds.

    ``block_fn(node_array, G) -> int64 block ids`` generalizes the
    node→space mapping (default: _node_block for packed tile nodes;
    contour passes a pixel-coordinate unpacker). ``tiles_x/tiles_y``
    are the spatial extent in block_fn's units.

    Returns Dataset(node, root) for every node incident to a pair
    whose root differs from itself (identity rows are implicit;
    callers coalesce missing nodes to themselves).
    """
    import pyarrow.compute as pc

    if block_fn is None:
        block_fn = _node_block

    levels = []
    G = base_block
    while True:
        levels.append(G)
        if G >= max(tiles_x, tiles_y, 1):
            break
        G *= fan

    # single-level runs (small grids / huge base_block) consume every
    # intermediate exactly once — skip the materialize barriers so the
    # whole merge fuses into ONE streaming execution (each execution
    # costs ~0.5-2 s of scheduling at sandbox scale)
    single = len(levels) == 1
    E = pairs_ds if single else pairs_ds.materialize()
    L = None                    # (node, lab) labels riding up levels
    emitted = []
    for li, G in enumerate(levels):
        def tag_edges(t: pa.Table, G=G) -> pa.Table:
            a = t.column("a").to_numpy().astype(np.int64)
            b = t.column("b").to_numpy().astype(np.int64)
            abk = block_fn(a, G)
            bbk = block_fn(b, G)
            internal = abk == bbk
            return pa.table({
                "bk": pa.array(np.where(internal, abk, np.int64(-1))),
                "x": pa.array(a), "y": pa.array(b)})

        tagged = E.map_batches(tag_edges, batch_format="pyarrow")
        if not single:
            tagged = tagged.materialize()

        def internal_only(t: pa.Table) -> pa.Table:
            return t.filter(pc.greater_equal(t.column("bk"), 0))

        def external_only(t: pa.Table) -> pa.Table:
            t = t.filter(pc.less(t.column("bk"), 0))
            return pa.table({"a": t.column("x"), "b": t.column("y")})

        parts = tagged.map_batches(internal_only, batch_format="pyarrow")
        if L is not None:
            def tag_labels(t: pa.Table, G=G) -> pa.Table:
                n = t.column("node").to_numpy().astype(np.int64)
                return pa.table({"bk": pa.array(block_fn(n, G)),
                                 "x": t.column("node"),
                                 "y": t.column("lab")})
            parts = parts.union(
                L.map_batches(tag_labels, batch_format="pyarrow"))

        def bucket_uf(g: pa.Table) -> pa.Table:
            keys, lab = _local_uf_min(g.column("x").to_numpy(),
                                      g.column("y").to_numpy())
            keep = lab != keys            # identity rows add nothing
            return pa.table({"node": pa.array(keys[keep]),
                             "lab": pa.array(lab[keep])})

        out = parts.groupby("bk").map_groups(
            bucket_uf, batch_format="pyarrow")
        if not single:
            out = out.materialize()
        emitted.append(out)

        if li == len(levels) - 1:
            break
        E = tagged.map_batches(external_only, batch_format="pyarrow") \
            .materialize()
        if E.count() == 0:
            break

        # labels needed next level: only nodes incident to a surviving
        # external edge (bucketed semijoin keeps the ride-up volume
        # proportional to the boundary skeleton, not all nodes)
        def refs(t: pa.Table) -> pa.Table:
            n = np.concatenate([t.column("a").to_numpy(),
                                t.column("b").to_numpy()]).astype(np.int64)
            return pa.table({"node": pa.array(n),
                             "lab": pa.array(np.full(len(n), -1, np.int64)),
                             "is_ref": pa.array(np.ones(len(n), np.int8))})

        def labrows(t: pa.Table) -> pa.Table:
            return pa.table({"node": t.column("node"),
                             "lab": t.column("lab"),
                             "is_ref": pa.array(
                                 np.zeros(len(t), np.int8))})

        cand = out if L is None else out.union(
            L.map_batches(lambda t: t.select(["node", "lab"]),
                          batch_format="pyarrow"))
        semi = E.map_batches(refs, batch_format="pyarrow").union(
            cand.map_batches(labrows, batch_format="pyarrow"))

        Bk = np.uint64(buckets)

        def tag_hash(t: pa.Table) -> pa.Table:
            n = t.column("node").to_numpy().astype(np.uint64)
            with np.errstate(over="ignore"):
                h = (n * np.uint64(0x9E3779B97F4A7C15)) % Bk
            return t.append_column("hbk", pa.array(h.astype(np.int64)))

        def per_bucket_semi(g: pa.Table) -> pa.Table:
            df = g.to_pandas()
            want = set(df.loc[df["is_ref"] == 1, "node"].tolist())
            lb = df[(df["is_ref"] == 0) & df["node"].isin(want)]
            if len(lb) == 0:
                return pa.table({"node": pa.array([], type=pa.int64()),
                                 "lab": pa.array([], type=pa.int64())})
            # a node may carry labels from two levels; keep the min
            m = lb.groupby("node", sort=False)["lab"].min().reset_index()
            return pa.table({"node": pa.array(m["node"].to_numpy()),
                             "lab": pa.array(m["lab"].to_numpy())})

        L = semi.map_batches(tag_hash, batch_format="pyarrow") \
            .groupby("hbk").map_groups(per_bucket_semi,
                                       batch_format="pyarrow").materialize()

    def _as_root(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("node"), "root": t.column("lab")})

    if len(emitted) == 1:
        return emitted[0].map_batches(_as_root, batch_format="pyarrow")

    # resolve the label forest: parent chains are <= #levels deep
    # (each level's emitted lab points to a node labeled at the same
    # or a later level), so a FIXED ceil(log2(depth))+1 rounds of
    # pointer doubling suffice — no convergence aggregates, no
    # open-ended iteration (a generic min-label propagation here
    # measured 8x the whole merge's cost in scheduling overhead)
    import math

    from ray.data.aggregate import Min as _Min

    facts = emitted[0].union(*emitted[1:])
    F = facts.groupby("node").aggregate(_Min("lab", alias_name="lab")) \
        .repartition(max(buckets // 8, 1)).materialize()

    Bk2 = np.uint64(buckets)

    def _h(n: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            return ((n.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                    % Bk2).astype(np.int64)

    rounds = max(1, math.ceil(math.log2(len(emitted) + 2)))
    for _ in range(rounds):
        def tag_l(t: pa.Table) -> pa.Table:
            n = t.column("node").to_numpy().astype(np.int64)
            return pa.table({"hbk": pa.array(_h(n)),
                             "key": t.column("node"),
                             "payload": t.column("node"),
                             "lab": t.column("lab"),
                             "kind": pa.array(np.zeros(len(t), np.int8))})

        def tag_r(t: pa.Table) -> pa.Table:
            k = t.column("lab").to_numpy().astype(np.int64)
            return pa.table({"hbk": pa.array(_h(k)),
                             "key": t.column("lab"),
                             "payload": t.column("node"),
                             "lab": pa.array(np.zeros(len(t), np.int64)),
                             "kind": pa.array(np.ones(len(t), np.int8))})

        def dbl_bucket(g: pa.Table) -> pa.Table:
            df = g.to_pandas()
            lab = df[df["kind"] == 0][["key", "lab"]]
            req = df[df["kind"] == 1][["key", "payload"]]
            m = req.merge(lab, on="key", how="inner")
            return pa.table({"node": pa.array(m["payload"].to_numpy()),
                             "lab": pa.array(m["lab"].to_numpy())})

        dbl = F.map_batches(tag_l, batch_format="pyarrow").union(
            F.map_batches(tag_r, batch_format="pyarrow")) \
            .groupby("hbk").map_groups(dbl_bucket, batch_format="pyarrow")
        F = dbl.union(F).groupby("node").aggregate(
            _Min("lab", alias_name="lab")) \
            .repartition(max(buckets // 8, 1)).materialize()

    return F.map_batches(_as_root, batch_format="pyarrow")


def _components_distributed(combined, pair_ds, meta: RasterMeta, *,
                            with_ring_area: bool, return_mapping: bool,
                            as_dataset: bool = False):
    """Distributed cross-tile merge: hierarchical spatial min-label
    (spatial_min_label) + ONE two-stage bucketed shuffle that fuses
    the root join, per-component stats fold, distinct-tile count and
    ring-area fold. Nothing O(nodes) ever lands on the driver — only
    the final O(components) aggregate table (and the node→component
    mapping when explicitly requested, which is inherently O(nodes))."""
    import pyarrow.compute as pc

    T = meta.tile_size
    B = 64

    def eq_pairs(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("kind"), "p"))
        return pa.table({
            "a": pa.array(_pack(t.column("tx").to_numpy(),
                                t.column("ty").to_numpy(),
                                t.column("l_or_la").to_numpy())),
            "b": pa.array(_pack(t.column("tx_b").to_numpy(),
                                t.column("ty_b").to_numpy(),
                                t.column("l_b").to_numpy()))})

    # roots feeds one consumer (root_rows) — stream it; the node→
    # component mapping path reads it a second time, so pin it then
    roots = spatial_min_label(
        pair_ds.map_batches(eq_pairs, batch_format="pyarrow"),
        meta.tiles_x, meta.tiles_y)
    if return_mapping:
        roots = roots.materialize()

    # ---- stage 1: bucket stats/roots/rings on hash(node); per bucket
    # resolve each row's root (left merge, identity fallback) and fold
    # PARTIAL per-root aggregates. kind: 0=stats 1=root 2=ring in,
    # 0=agg-partial 1=tile-partial 2=ring-partial out.
    ZERO8 = ("value", "n_pixels", "minx", "miny", "maxx", "maxy",
             "tile_key", "cross")

    def _wide(n: int, **cols) -> pa.Table:
        base = {"kind": np.zeros(n, np.int8), "node": np.zeros(n, np.int64)}
        base.update({c: np.zeros(n, np.int64) for c in ZERO8})
        base.update(cols)
        return pa.table({k: pa.array(v) for k, v in base.items()})

    def stats_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("kind"), "s"))
        tx = t.column("tx").to_numpy().astype(np.int64)
        ty = t.column("ty").to_numpy().astype(np.int64)
        return _wide(
            len(t),
            kind=np.zeros(len(t), np.int8),
            node=_pack(tx, ty, t.column("label").to_numpy()),
            value=t.column("value").to_numpy().astype(np.int64),
            n_pixels=t.column("n_pixels").to_numpy().astype(np.int64),
            minx=t.column("minx").to_numpy() + tx * T,
            miny=t.column("miny").to_numpy() + ty * T,
            maxx=t.column("maxx").to_numpy() + tx * T,
            maxy=t.column("maxy").to_numpy() + ty * T,
            tile_key=(tx << 20) | ty)

    def root_rows(t: pa.Table) -> pa.Table:
        return _wide(len(t),
                     kind=np.ones(len(t), np.int8),
                     node=t.column("node").to_numpy().astype(np.int64),
                     value=t.column("root").to_numpy().astype(np.int64))

    def ring_rows_tile(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("kind"), "r"))
        return _wide(len(t),
                     kind=np.full(len(t), 2, np.int8),
                     node=_pack(t.column("tx").to_numpy(),
                                t.column("ty").to_numpy(),
                                t.column("label").to_numpy()),
                     cross=t.column("cross").to_numpy().astype(np.int64))

    def ring_rows_seam(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("kind"), "r"))
        return _wide(len(t),
                     kind=np.full(len(t), 2, np.int8),
                     node=_pack(t.column("tx").to_numpy(),
                                t.column("ty").to_numpy(),
                                t.column("l_or_la").to_numpy()),
                     cross=t.column("cross").to_numpy().astype(np.int64))

    stage1 = combined.map_batches(stats_rows, batch_format="pyarrow") \
        .union(roots.map_batches(root_rows, batch_format="pyarrow"))
    if with_ring_area:
        stage1 = stage1.union(
            combined.map_batches(ring_rows_tile, batch_format="pyarrow"),
            pair_ds.map_batches(ring_rows_seam, batch_format="pyarrow"))

    def tag_node_hash(t: pa.Table) -> pa.Table:
        n = t.column("node").to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (n * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(B)
        return t.append_column("hbk", pa.array(h.astype(np.int64)))

    def bucket_partial(g: pd.DataFrame) -> pd.DataFrame:
        lab = g[g["kind"] == 1][["node", "value"]] \
            .rename(columns={"value": "root"})
        st = g[g["kind"] == 0].merge(lab, on="node", how="left")
        st["root"] = st["root"].fillna(st["node"]).astype(np.int64)
        pagg = st.groupby("root", sort=False).agg(
            value=("value", "first"), n_pixels=("n_pixels", "sum"),
            minx=("minx", "min"), miny=("miny", "min"),
            maxx=("maxx", "max"), maxy=("maxy", "max")).reset_index()
        pagg["kind"] = np.int8(0)
        tiles = st[["root", "tile_key"]].drop_duplicates()
        tiles["kind"] = np.int8(1)
        outs = [pagg, tiles]
        rg = g[g["kind"] == 2]
        if len(rg):
            rg = rg[["node", "cross"]].merge(lab, on="node", how="left")
            rg["root"] = rg["root"].fillna(rg["node"]).astype(np.int64)
            rsum = rg.groupby("root", sort=False)["cross"].sum().reset_index()
            rsum["kind"] = np.int8(2)
            outs.append(rsum)
        out = pd.concat(outs, ignore_index=True)
        for c in ("value", "n_pixels", "minx", "miny", "maxx", "maxy",
                  "tile_key", "cross"):
            if c not in out:
                out[c] = 0
            out[c] = out[c].fillna(0).astype(np.int64)
        return out[["kind", "root", "value", "n_pixels", "minx", "miny",
                    "maxx", "maxy", "tile_key", "cross"]]

    partials = stage1.map_batches(tag_node_hash, batch_format="pyarrow") \
        .groupby("hbk").map_groups(bucket_partial, batch_format="pandas")

    # ---- stage 2: bucket partials on hash(root); final fold per root
    def tag_root_hash(t: pa.Table) -> pa.Table:
        r = t.column("root").to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (r * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(B)
        return t.append_column("hbk", pa.array(h.astype(np.int64)))

    def bucket_final(g: pd.DataFrame) -> pd.DataFrame:
        ag = g[g["kind"] == 0].groupby("root", sort=False).agg(
            value=("value", "first"), n_pixels=("n_pixels", "sum"),
            minx=("minx", "min"), miny=("miny", "min"),
            maxx=("maxx", "max"), maxy=("maxy", "max")).reset_index()
        nt = g[g["kind"] == 1][["root", "tile_key"]].drop_duplicates() \
            .groupby("root", sort=False).size().rename("n_tiles") \
            .reset_index()
        out = ag.merge(nt, on="root", how="left")
        out["n_tiles"] = out["n_tiles"].fillna(0).astype(np.int64)
        if with_ring_area:
            rs = g[g["kind"] == 2].groupby("root", sort=False)["cross"] \
                .sum().rename("csum").reset_index()
            out = out.merge(rs, on="root", how="left")
            out["ring_area"] = \
                (-out["csum"].fillna(0) // 2).astype(np.int64)
            out = out.drop(columns=["csum"])
        return out

    final_ds = partials.map_batches(tag_root_hash, batch_format="pyarrow") \
        .groupby("hbk").map_groups(bucket_final, batch_format="pandas")

    if as_dataset:
        # streaming form: one row per component, keyed by the stable
        # min-node root (no global renumbering pass) — write_parquet /
        # further stages consume it without ANY driver materialization
        def keyed(t: pa.Table) -> pa.Table:
            cols = {"component_key": t.column("root")}
            for c in t.schema.names:
                if c != "root":
                    cols[c] = t.column(c)
            return pa.table(cols)
        return final_ds.map_batches(keyed, batch_format="pyarrow")

    agg = final_ds.to_pandas()
    agg = agg.sort_values("root", kind="stable").reset_index(drop=True)
    agg["component_id"] = np.arange(len(agg), dtype=np.int64)
    for c in ("value", "n_pixels", "minx", "miny", "maxx", "maxy", "n_tiles"):
        agg[c] = agg[c].astype(np.int64)

    if return_mapping:
        root_to_comp = dict(zip(agg["root"].tolist(),
                                agg["component_id"].tolist()))
        rdf = roots.to_pandas()
        rmap = dict(zip(rdf["node"].astype(np.int64),
                        rdf["root"].astype(np.int64)))

        def nodes_only(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t.column("kind"), "s"))
            return pa.table({"node": pa.array(_pack(
                t.column("tx").to_numpy(), t.column("ty").to_numpy(),
                t.column("label").to_numpy()))})

        all_nodes = combined.map_batches(
            nodes_only, batch_format="pyarrow").to_pandas()["node"]
        mapping = {int(n): root_to_comp[int(rmap.get(int(n), int(n)))]
                   for n in all_nodes}
        return agg.drop(columns=["root"]), mapping
    return agg.drop(columns=["root"])


# ---------------------------------------------------- boundary rings

def _mask_boundary_segments(mask: np.ndarray, x_off: int, y_off: int) -> np.ndarray:
    """Pixel-edge boundary segments of a binary mask, in global PIXEL
    coordinates (corner lattice): exact GDAL-polygonize-style edges.
    Vectorized: an edge exists wherever inside/outside flips."""
    h, w = mask.shape
    segs = []
    pad = np.zeros((h + 2, w + 2), dtype=bool)
    pad[1:-1, 1:-1] = mask
    # vertical edges: between (i,j-1) and (i,j) when they differ
    vdiff = pad[1:-1, 1:] != pad[1:-1, :-1]          # [h, w+1]
    vi, vj = np.nonzero(vdiff)
    if len(vi):
        x = vj + x_off
        segs.append(np.column_stack([x, vi + y_off, x, vi + y_off + 1]))
    hdiff = pad[1:, 1:-1] != pad[:-1, 1:-1]          # [h+1, w]
    hi, hj = np.nonzero(hdiff)
    if len(hi):
        y = hi + y_off
        segs.append(np.column_stack([hj + x_off, y, hj + x_off + 1, y]))
    return np.vstack(segs) if segs else np.zeros((0, 4))


def polygonize_rings(ds, meta: RasterMeta, values: list[int], *,
                     dtype: str = "int32"):
    """Exact pixel-edge boundary rings per raster value (the geometry
    half of gdal.Polygonize): per-tile vectorized boundary-segment
    extraction (each tile owns its own pixels' edges; interior shared
    edges cancel because both sides emit iff the flip is real) →
    cross-tile ring stitching. Returns a DataFrame
    (value, ring_id, n_points, area, closed, geom_wkb).

    Note: a tile's edge ON the tile boundary needs the neighbor pixel
    to decide the flip — handled with the 1-px halo fragments. Rings
    follow even-odd semantics (holes appear as separate rings);
    degree-4 corner vertices (8-connectivity pinch points) are chained
    by first-match, a documented convention.
    """
    from spapy_ray.stages.contour import stitch_segments
    from spapy_ray.stages.raster import (_auto_block, _block_mosaic_tiles,
                                         _halo_block_rows)

    block = _auto_block(meta)
    tagged = ds.map_batches(
        lambda t: _halo_block_rows(t, meta, dtype, block),
        batch_format="pyarrow")
    T = meta.tile_size

    def one_tile(pad, tx, ty, rows):
        # raster borders: the replicated halo would suppress real
        # boundary edges at the raster edge — mark outside explicitly
        if tx == 0:
            pad[:, 0] = -2**30
        if ty == 0:
            pad[0, :] = -2**30
        if tx == meta.tiles_x - 1:
            pad[:, -1] = -2**30
        if ty == meta.tiles_y - 1:
            pad[-1, :] = -2**30
        for v in values:
            m = pad == v
            segs = _mask_boundary_segments(m[1:-1, 1:-1], tx * T, ty * T)
            core_m = m[1:-1, 1:-1]
            extra = []
            # halo-aware rebuild of the four border columns/rows
            wfix = np.nonzero(m[1:-1, 0] != core_m[:, 0])[0]
            keep = ~((segs[:, 0] == tx * T) & (segs[:, 2] == tx * T))
            segs = segs[keep]
            if len(wfix):
                x = np.full(len(wfix), tx * T)
                extra.append(np.column_stack([x, wfix + ty * T, x, wfix + ty * T + 1]))
            efix = np.nonzero(m[1:-1, -1] != core_m[:, -1])[0]
            keep = ~((segs[:, 0] == tx * T + core_m.shape[1])
                     & (segs[:, 2] == tx * T + core_m.shape[1]))
            segs = segs[keep]
            if len(efix):
                x = np.full(len(efix), tx * T + core_m.shape[1])
                extra.append(np.column_stack([x, efix + ty * T, x, efix + ty * T + 1]))
            nfix = np.nonzero(m[0, 1:-1] != core_m[0, :])[0]
            keep = ~((segs[:, 1] == ty * T) & (segs[:, 3] == ty * T))
            segs = segs[keep]
            if len(nfix):
                y = np.full(len(nfix), ty * T)
                extra.append(np.column_stack([nfix + tx * T, y, nfix + tx * T + 1, y]))
            sfix = np.nonzero(m[-1, 1:-1] != core_m[-1, :])[0]
            keep = ~((segs[:, 1] == ty * T + core_m.shape[0])
                     & (segs[:, 3] == ty * T + core_m.shape[0]))
            segs = segs[keep]
            if len(sfix):
                y = np.full(len(sfix), ty * T + core_m.shape[0])
                extra.append(np.column_stack([sfix + tx * T, y, sfix + tx * T + 1, y]))
            if extra:
                segs = np.vstack([segs] + extra)
            # shared interior-tile edges: dedupe by ownership
            if tx > 0:
                own = ~((segs[:, 0] == tx * T) & (segs[:, 2] == tx * T))
                segs = segs[own]
            if ty > 0:
                own = ~((segs[:, 1] == ty * T) & (segs[:, 3] == ty * T))
                segs = segs[own]
            rows["level"].extend([v] * len(segs))
            for kk, col in enumerate(("x1", "y1", "x2", "y2")):
                rows[col].extend(segs[:, kk])

    # block-mosaic halo exchange (raster.py r4); one_tile MUTATES
    # its pad (raster-border sentinel), so it gets a copy of the view
    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        mosaic, tx0, ty0, tiles = _block_mosaic_tiles(g, meta, dtype,
                                                      block)
        rows = {"level": [], "x1": [], "y1": [], "x2": [], "y2": []}
        for tx, ty in tiles:
            pad = mosaic[(ty - ty0) * T:(ty - ty0) * T + T + 2,
                         (tx - tx0) * T:(tx - tx0) * T + T + 2].copy()
            one_tile(pad, tx, ty, rows)
        return pd.DataFrame(rows)

    segs = tagged.groupby("bk__").map_groups(
        per_bucket, batch_format="pandas").to_pandas()
    lines = stitch_segments(segs, snap=0.5)
    lines = lines.rename(columns={"level": "value", "line_id": "ring_id"})
    # ring area via shoelace on the decoded linestrings
    from spapy_ray.kernels import geom, wkb as _wkb

    areas = []
    for g_ in lines["geom_wkb"]:
        _, coords = _wkb.decode(g_)
        areas.append(abs(geom.ring_signed_area(np.asarray(coords))))
    lines["area"] = areas
    return lines


# -------------------------------------- per-component ring tracing

def _tile_directed_edges(pad: np.ndarray, labels: np.ndarray,
                         tx: int, ty: int, T: int):
    """Directed boundary edges (inside pixel on the LEFT, y-down) of
    every labeled pixel whose 4-neighbor (halo included; outside
    raster = sentinel) has a different value. Global corner-lattice
    integer coordinates. Returns (label, x1, y1, x2, y2) arrays."""
    gx0, gy0 = tx * T, ty * T
    core = pad[1:-1, 1:-1]
    out_l, out = [], []
    h, w = core.shape
    X, Y = np.meshgrid(np.arange(w), np.arange(h))
    # top edge of pixel: (x+1, y) -> (x, y)
    m = core != pad[:-2, 1:-1]
    if m.any():
        x, y = X[m] + gx0, Y[m] + gy0
        out_l.append(labels[m])
        out.append(np.column_stack([x + 1, y, x, y]))
    # bottom edge: (x, y+1) -> (x+1, y+1)
    m = core != pad[2:, 1:-1]
    if m.any():
        x, y = X[m] + gx0, Y[m] + gy0
        out_l.append(labels[m])
        out.append(np.column_stack([x, y + 1, x + 1, y + 1]))
    # west edge: (x, y) -> (x, y+1)
    m = core != pad[1:-1, :-2]
    if m.any():
        x, y = X[m] + gx0, Y[m] + gy0
        out_l.append(labels[m])
        out.append(np.column_stack([x, y, x, y + 1]))
    # east edge: (x+1, y+1) -> (x+1, y)
    m = core != pad[1:-1, 2:]
    if m.any():
        x, y = X[m] + gx0, Y[m] + gy0
        out_l.append(labels[m])
        out.append(np.column_stack([x + 1, y + 1, x + 1, y]))
    if not out:
        return np.zeros(0, np.int32), np.zeros((0, 4), np.int64)
    return np.concatenate(out_l), np.vstack(out).astype(np.int64)


_TURN_ORDER = {  # incoming direction -> outgoing preference (leftmost first)
    (1, 0): [(0, -1), (1, 0), (0, 1)],
    (-1, 0): [(0, 1), (-1, 0), (0, -1)],
    (0, 1): [(1, 0), (0, 1), (-1, 0)],
    (0, -1): [(-1, 0), (0, -1), (1, 0)],
}


def _trace_rings(edges: np.ndarray):
    """Directed integer edges of ONE component → rings (corner-lattice
    coords). Leftmost-turn at pinch vertices keeps rings simple;
    exteriors come out with positive area under area = -shoelace/2
    (y-down, inside-left), holes negative."""
    n = len(edges)
    out_adj: dict[tuple, list[int]] = {}
    for i in range(n):
        out_adj.setdefault((int(edges[i, 0]), int(edges[i, 1])), []).append(i)
    used = np.zeros(n, dtype=bool)
    rings = []
    for i0 in range(n):
        if used[i0]:
            continue
        start = (int(edges[i0, 0]), int(edges[i0, 1]))
        ring = [start]
        cur = i0
        used[i0] = True
        while True:
            head = (int(edges[cur, 2]), int(edges[cur, 3]))
            if head == start:
                break
            ring.append(head)
            cands = [j for j in out_adj.get(head, []) if not used[j]]
            if not cands:
                break
            if len(cands) == 1:
                nxt = cands[0]
            else:
                din = (int(np.sign(edges[cur, 2] - edges[cur, 0])),
                       int(np.sign(edges[cur, 3] - edges[cur, 1])))
                nxt = None
                for want in _TURN_ORDER[din]:
                    for j in cands:
                        dj = (int(np.sign(edges[j, 2] - edges[j, 0])),
                              int(np.sign(edges[j, 3] - edges[j, 1])))
                        if dj == want:
                            nxt = j
                            break
                    if nxt is not None:
                        break
                if nxt is None:
                    nxt = cands[0]
            used[nxt] = True
            cur = nxt
        rings.append(np.asarray(ring, dtype=np.float64))
    return rings


def component_rings(ds, meta: RasterMeta, *, dtype: str = "int32"):
    """gdal.Polygonize's actual output shape (SpaRasters.py:827-882):
    one MULTIPOLYGON (exterior + holes) per contiguous same-value
    component, with the value as an attribute.

    Distributed: per-tile directed-edge emission with a 1-px halo
    (each tile owns its own pixels' edges), local labels mapped to
    global components via the union-find mapping broadcast from
    polygonize_components, then groupby(component) traces rings.
    Returns a pandas DataFrame (component_id, value, n_pixels,
    ring_area, n_rings, geom_wkb) — ring_area == n_pixels for every
    component by construction (checked in tests/the polygons query).
    """
    import ray

    from spapy_ray.kernels import wkb as _wkb
    from spapy_ray.stages.raster import (_auto_block, _block_mosaic_tiles,
                                         _halo_block_rows)
    from spapy_ray.util import cached_state

    comp, mapping = polygonize_components(ds, meta, dtype=dtype,
                                          return_mapping=True)
    mref = ray.put(mapping)
    box = (mref,)
    T = meta.tile_size
    SENT = -2 ** 30
    block = _auto_block(meta)

    tagged = ds.map_batches(
        lambda t: _halo_block_rows(t, meta, dtype, block),
        batch_format="pyarrow")

    # block-mosaic halo exchange (raster.py r4); raster-exterior
    # sentinel painted once on the shared mosaic apron (same cells
    # the assembler edge-replicates), pads stay zero-copy views
    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = cached_state(box, lambda d: d)
        mosaic, tx0, ty0, tiles = _block_mosaic_tiles(g, meta, dtype,
                                                      block)
        if tx0 == 0:
            mosaic[:, 0] = SENT
        if ty0 == 0:
            mosaic[0, :] = SENT
        if tx0 + (mosaic.shape[1] - 2) // T == meta.tiles_x:
            mosaic[:, -1] = SENT
        if ty0 + (mosaic.shape[0] - 2) // T == meta.tiles_y:
            mosaic[-1, :] = SENT
        comps, e1, e2, e3, e4 = [], [], [], [], []
        for tx, ty in tiles:
            pad = mosaic[(ty - ty0) * T:(ty - ty0) * T + T + 2,
                         (tx - tx0) * T:(tx - tx0) * T + T + 2]
            labels = label_tile(pad[1:-1, 1:-1])
            labs, e = _tile_directed_edges(pad, labels, tx, ty, T)
            packed = _pack(np.full(len(labs), tx), np.full(len(labs), ty),
                           labs)
            comps.append(np.array([m[int(k)] for k in packed],
                                  dtype=np.int64))
            e1.append(e[:, 0]); e2.append(e[:, 1])
            e3.append(e[:, 2]); e4.append(e[:, 3])
        return pd.DataFrame({"comp": np.concatenate(comps),
                             "x1": np.concatenate(e1),
                             "y1": np.concatenate(e2),
                             "x2": np.concatenate(e3),
                             "y2": np.concatenate(e4)})

    edges = tagged.groupby("bk__").map_groups(per_bucket,
                                              batch_format="pandas")

    def trace_one(e: np.ndarray):
        rings = _trace_rings(e)
        signed = []
        for r in rings:
            x, y = r[:, 0], r[:, 1]
            sh = float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
            signed.append(-sh / 2.0)
        # exterior(s) positive; holes negative, assigned by containment
        order = np.argsort(signed)[::-1]
        exts = [i for i in order if signed[i] > 0]
        polys = {i: [rings[i]] for i in exts}
        from spapy_ray.kernels import geom as _geom
        for i in order:
            if signed[i] > 0:
                continue
            cx, cy = rings[i][:, 0].mean(), rings[i][:, 1].mean()
            for j in exts:
                if _geom.pip_ring(np.array([cx]), np.array([cy]),
                                  rings[j])[0]:
                    polys[j].append(rings[i])
                    break
        mp = [polys[i] for i in exts]
        return (float(sum(signed)), len(rings),
                _wkb.encode_multipolygon(mp))

    # components hash-bucketed (~1k comps/bucket) — NOT one Python
    # group per component; within a bucket a sort + run-boundary walk
    # hands each component its edge slice
    def hbk_tag(t: pa.Table) -> pa.Table:
        c = t.column("comp").to_numpy().astype(np.uint64)
        z = (c + np.uint64(0x9E3779B97F4A7C15))
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        hbk = ((z ^ (z >> np.uint64(31))) % np.uint64(256)).astype(np.int64)
        return t.append_column("hbk", pa.array(hbk, type=pa.int64()))

    def bucket_trace(g: pd.DataFrame) -> pd.DataFrame:
        comps = g["comp"].to_numpy()
        order = np.argsort(comps, kind="stable")
        comps = comps[order]
        e = g[["x1", "y1", "x2", "y2"]].to_numpy()[order]
        bounds = np.flatnonzero(np.diff(comps)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(comps)]))
        out_c, out_a, out_n, out_w = [], [], [], []
        for s, en in zip(starts, ends):
            area, n_rings, wkb_bytes = trace_one(e[s:en])
            out_c.append(int(comps[s]))
            out_a.append(area)
            out_n.append(n_rings)
            out_w.append(wkb_bytes)
        return pd.DataFrame({"comp": out_c, "ring_area": out_a,
                             "n_rings": out_n, "geom_wkb": out_w})

    traced = edges.map_batches(hbk_tag, batch_format="pyarrow") \
        .groupby("hbk").map_groups(bucket_trace,
                                   batch_format="pandas").to_pandas()
    out = comp.merge(traced, left_on="component_id", right_on="comp",
                     how="left").drop(columns=["comp"])
    return out[["component_id", "value", "n_pixels", "ring_area",
                "n_rings", "geom_wkb"]]


# --------------------------- distributed component merge (scale path)

def distributed_min_label(nodes_ds, pairs_ds, max_iters: int = 64,
                          buckets: int = 64):
    """Hash-partitioned min-label propagation — the scale-out
    replacement for the driver union-find when the cross-tile
    component graph itself is too large for one machine.

    nodes_ds: Dataset(node:int64)         (packed (tile,label) keys)
    pairs_ds: Dataset(a:int64, b:int64)   (cross-tile equivalences)

    Each round: (1) a BUCKETED join (groupby on hash(node) % buckets,
    vectorized pandas merge inside each bucket — never one Python
    call per node) sends each node's current label across its edges,
    (2) a min-fold per node, (3) a pointer-doubling bucketed join
    (lab <- lab[lab]) for O(log diameter) convergence. Terminates
    when a round changes nothing. This is the same algorithm the SQL
    oracle runs as a recursive CTE.

    Returns Dataset(node:int64, root:int64).
    """
    import pyarrow.compute as pc

    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    B = np.int64(buckets)

    def sym(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": pa.concat_arrays([t.column("a").combine_chunks(),
                                     t.column("b").combine_chunks()]),
            "dst": pa.concat_arrays([t.column("b").combine_chunks(),
                                     t.column("a").combine_chunks()])})

    edges = pairs_ds.map_batches(sym, batch_format="pyarrow").materialize()

    # Restrict propagation to the EDGE-INDUCED subgraph: a node with no
    # cross-partition edge is its own root and never needs a round of
    # messaging. On tiled rasters that shrinks the iterated set from
    # O(all components) to O(border-touching components) — typically
    # 10-20x fewer rows per round.
    from ray.data.aggregate import Count as _Count

    def src_only(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("src")})

    edge_nodes = edges.map_batches(src_only, batch_format="pyarrow") \
        .groupby("node").aggregate(_Count(alias_name="c___"))

    def init_labels(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("node"),
                         "lab": t.column("node")})

    labels = edge_nodes.map_batches(init_labels, batch_format="pyarrow") \
        .materialize()

    def _bucketed_send(lab_ds, req_ds, req_key: str, req_payload: str):
        """For every request row, deliver (payload, lab[req_key]) —
        a bucketed hash join: lab rows and request rows co-partition
        on hash(key) % buckets; each bucket merges vectorized."""
        def tag_lab(t: pa.Table) -> pa.Table:
            k = t.column("node").to_numpy()
            return pa.table({"bkt": pa.array((k % B).astype(np.int64)),
                             "key": t.column("node"),
                             "payload": t.column("node"),
                             "lab": t.column("lab"),
                             "kind": pa.array(np.zeros(len(t), np.int8))})

        def tag_req(t: pa.Table) -> pa.Table:
            k = t.column(req_key).to_numpy()
            return pa.table({"bkt": pa.array((k % B).astype(np.int64)),
                             "key": t.column(req_key),
                             "payload": t.column(req_payload),
                             "lab": pa.array(np.zeros(len(t), np.int64)),
                             "kind": pa.array(np.ones(len(t), np.int8))})

        both = lab_ds.map_batches(tag_lab, batch_format="pyarrow").union(
            req_ds.map_batches(tag_req, batch_format="pyarrow"))

        def per_bucket(g: pa.Table) -> pa.Table:
            df = g.to_pandas()
            lab = df[df["kind"] == 0][["key", "lab"]]
            req = df[df["kind"] == 1][["key", "payload"]]
            m = req.merge(lab, on="key", how="inner")
            return pa.table({"node": pa.array(m["payload"].to_numpy()),
                             "lab": pa.array(m["lab"].to_numpy())})

        return both.groupby("bkt").map_groups(per_bucket,
                                              batch_format="pyarrow")

    old_sum = labels.aggregate(Sum("lab", alias_name="s"))["s"]
    for _ in range(max_iters):
        # one fused round: (1) edge propagation — each node's label
        # delivered to its neighbors, min-fold; (2) ONE pointer
        # doubling (lab <- min(lab, lab[lab])), min-fold. Doubling
        # every round gives the same O(log diameter) convergence as an
        # inner doubling loop, but at 2 Dataset executions per round
        # instead of up to 17 — per-execution scheduling latency, not
        # data volume, dominates below ~10^7 nodes. repartition keeps
        # block counts bounded (iterative groupbys otherwise multiply
        # tiny blocks; measured 2s -> 44s per round).
        prop = _bucketed_send(labels, edges, "src", "dst")
        half = prop.union(labels).groupby("node").aggregate(
            Min("lab", alias_name="lab")).repartition(buckets // 8 or 1) \
            .materialize()
        dbl = _bucketed_send(half, half, "lab", "node")
        labels = dbl.union(half).groupby("node").aggregate(
            Min("lab", alias_name="lab")).repartition(buckets // 8 or 1) \
            .materialize()
        # convergence check runs on the materialized result — no
        # recompute, one tiny aggregate
        cur_sum = labels.aggregate(Sum("lab", alias_name="s"))["s"]
        if cur_sum == old_sum:
            break
        old_sum = cur_sum

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("node"), "root": t.column("lab")})

    edge_roots = labels.map_batches(rename, batch_format="pyarrow")

    # non-edge nodes are their own root: left-join the full node set
    # against the propagated labels and coalesce null -> identity
    import ray as _ray

    nparts = max(2, int(_ray.cluster_resources().get("CPU", 4)) // 2) \
        if _ray.is_initialized() else 4
    joined = nodes_ds.join(edge_roots, "left_outer", nparts, on=("node",))

    def coalesce(t: pa.Table) -> pa.Table:
        node = t.column("node")
        root = t.column("root")
        return pa.table({"node": node,
                         "root": pc.coalesce(root, node)})

    return joined.map_batches(coalesce, batch_format="pyarrow")
