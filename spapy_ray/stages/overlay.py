"""Table-level overlay ops: Intersection / Union / Difference /
SymmetricDifference (reference methods + one-liners,
SpaVectors.py:1043-1102, 1529-1613). Boolean engine dispatch
(kernels.booleans): exact rectilinear path for axis-parallel inputs
(incl. all degenerate incidences), Greiner-Hormann for general-
position curved inputs; symmetric_difference of curved multiparts is
the remaining round-3 gap (DIVERGENCES #7).

- overlay_with_geometry: dataset x single geometry (OverlayWithGeometry
  semantics, SpaVectors.py:939-962 — keep non-empty results, attrs
  from the left row).
- overlay_datasets: dataset x dataset pairwise (OverlayWithDataset's
  nested loop, SpaVectors.py:964-983, replaced by STRtree bbox
  pruning) — one output row per intersecting (left, right) pair.
- dataset_union: OverlayWithSelf union fold (SpaVectors.py:1006-1038)
  as per-block partial rect-decompositions + associative driver merge.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from spapy_ray.kernels import geom, rectilinear as rl, wkb
from spapy_ray.kernels.booleans import boolean_general, rings_to_multipolygon
from spapy_ray.kernels.strtree import STRtree


def overlay_with_geometry(ds, other_wkb: bytes, op: str = "intersection",
                          geom_col: str = "geom_wkb",
                          engine: str | None = None):
    """Per-feature boolean vs one geometry; empty results dropped."""
    other = wkb.as_multipolygon(other_wkb)

    def _batch(t: pa.Table) -> pa.Table:
        keep, out, areas = [], [], []
        for i, g in enumerate(t.column(geom_col).to_pylist()):
            rings, area = boolean_general(wkb.as_multipolygon(g), other, op,
                                          engine=engine)
            if len(rings):
                keep.append(i)
                out.append(wkb.encode_multipolygon(rings_to_multipolygon(rings)))
                areas.append(area)
        kept = t.take(pa.array(keep, type=pa.int64()))
        gi = kept.schema.get_field_index(geom_col)
        kept = kept.set_column(gi, geom_col, pa.array(out, type=pa.binary()))
        return kept.append_column("overlay_area",
                                  pa.array(areas, type=pa.float64()))

    return ds.map_batches(_batch, batch_format="pyarrow")


def overlay_datasets(ds, right: pa.Table, op: str = "intersection",
                     geom_col: str = "geom_wkb", right_key: str = "zone_id",
                     batch_size: int | None = 1024):
    """Pairwise overlay vs a broadcast right table: STRtree bbox-prunes
    candidate pairs, exact boolean per pair. Output: left columns
    (geom replaced by the result), right key, overlay_area."""
    import ray

    from spapy_ray.util import cached_state

    def build(rt: pa.Table):
        mps = [wkb.as_multipolygon(g) for g in rt.column(geom_col).to_pylist()]
        boxes = np.array([geom.multipolygon_bbox(mp) for mp in mps]).reshape(-1, 4)
        keys = rt.column(right_key).to_numpy()
        return mps, keys, STRtree(boxes)

    box = (ray.put(right),)

    def _batch(t: pa.Table) -> pa.Table:
        mps, keys, tree = cached_state(box, build)
        lgeoms = [wkb.as_multipolygon(g) for g in t.column(geom_col).to_pylist()]
        lboxes = np.array([geom.multipolygon_bbox(mp) for mp in lgeoms]) \
            .reshape(-1, 4)
        li, ri = tree.query_boxes(lboxes)
        keep_l, out_g, out_k, areas = [], [], [], []
        for a, b in zip(li, ri):
            rings, area = boolean_general(lgeoms[a], mps[b], op)
            if len(rings):
                keep_l.append(int(a))
                out_g.append(wkb.encode_multipolygon(
                    rings_to_multipolygon(rings)))
                out_k.append(int(keys[b]))
                areas.append(area)
        kept = t.take(pa.array(keep_l, type=pa.int64()))
        gi = kept.schema.get_field_index(geom_col)
        kept = kept.set_column(gi, geom_col, pa.array(out_g, type=pa.binary()))
        kept = kept.append_column(f"right_{right_key}",
                                  pa.array(out_k, type=pa.int64()))
        return kept.append_column("overlay_area",
                                  pa.array(areas, type=pa.float64()))

    return ds.map_batches(_batch, batch_format="pyarrow",
                          batch_size=batch_size, zero_copy_batch=True)


def dataset_union(ds, geom_col: str = "geom_wkb"):
    """Union of ALL features (OverlayWithSelf union fold): per-block
    rect decompositions (partial) → associative union merge. Returns
    (rects, area). Union is associative/commutative so the fold is
    order-free, unlike the reference's order-dependent difference fold
    (handled separately via sorted row_id when needed)."""

    def partial(t: pa.Table) -> pa.Table:
        sets = [rl.multipolygon_to_rects(wkb.as_multipolygon(g))
                for g in t.column(geom_col).to_pylist()]
        rects, _ = rl.union_rects(sets)
        return pa.table({"x0": pa.array(rects[:, 0]), "y0": pa.array(rects[:, 1]),
                         "x1": pa.array(rects[:, 2]), "y1": pa.array(rects[:, 3])})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return rl.union_rects([parts[["x0", "y0", "x1", "y1"]].to_numpy()])


def dataset_symdiff(ds, geom_col: str = "geom_wkb"):
    """OverlayWithSelf symmetric-difference fold: odd-coverage parity.

    Needs per-feature coverage counts, so blocks emit their features'
    rect sets tagged by a block-unique id; parity composes as
    (sum of per-feature parities) mod 2 — here computed in one driver
    pass over all feature rect sets (scale path: hierarchical parity
    masks, same shape as dataset_union)."""
    def lists(t: pa.Table) -> pa.Table:
        import pickle

        blobs = [pickle.dumps(
            rl.multipolygon_to_rects(wkb.as_multipolygon(g)))
            for g in t.column(geom_col).to_pylist()]
        return pa.table({"rects": pa.array(blobs, type=pa.binary())})

    import pickle

    parts = ds.map_batches(lists, batch_format="pyarrow").to_pandas()
    sets = [pickle.loads(b) for b in parts["rects"]]
    return rl.parity_rects(sets)


def dataset_difference_fold(ds, order_col: str, geom_col: str = "geom_wkb"):
    """OverlayWithSelf difference fold in reference row order
    (SpaVectors.py:1006-1038): acc = ((f0 - f1) - f2)... == the first
    feature (by order_col) minus the union of all the rest — the
    order-dependence collapses to ONE distinguished row, so the rest
    is an associative union fold."""
    import pickle

    def lists(t: pa.Table) -> pa.Table:
        blobs = [pickle.dumps(
            rl.multipolygon_to_rects(wkb.as_multipolygon(g)))
            for g in t.column(geom_col).to_pylist()]
        return pa.table({"ord": t.column(order_col),
                         "rects": pa.array(blobs, type=pa.binary())})

    parts = ds.map_batches(lists, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values("ord", kind="stable").reset_index(drop=True)
    first = pickle.loads(parts["rects"].iloc[0])
    rest = [pickle.loads(b) for b in parts["rects"].iloc[1:]]
    return rl.difference_fold_rects(first, rest)
