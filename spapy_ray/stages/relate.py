"""Dataset-level relates & overlays — the reference's Relate/Overlay
surface (SpaVectors.py:939-1348) re-expressed on Ray Data.

- per-row predicate columns / filters   (RelateWithGeometry per-row)
- dataset-level existence (one bool)    (RelateWithDataset OR-fold,
  SpaVectors.py:1148-1254) via limit(1) early-exit
- semi / anti join against a polygon layer (the useful generalization)
- clip: overlay-intersection against a convex clip geometry
  (Clip, SpaVectors.py:1501-1523; OverlayWithGeometry keep-hits-only
  semantics, SpaVectors.py:939-962)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from spapy_ray.kernels import clip as clipmod
from spapy_ray.kernels import geom, predicates, wkb
from spapy_ray.stages.join import ZoneIndex


def point_semi_join(ds, zones: pa.Table, anti: bool = False,
                    batch_size: int | None = 32768):
    """Keep rows whose (lon, lat) falls in ANY zone (semi) or NONE
    (anti). The broadcast-small-side existence filter."""
    import ray

    from spapy_ray.util import cached_state

    box = (ray.put(zones),)

    def _task(batch: pa.Table) -> pa.Table:
        index = cached_state(box, ZoneIndex)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        pi, _ = index.query(lon, lat)
        hit = np.zeros(len(batch), dtype=bool)
        hit[pi] = True
        return batch.filter(pa.array(~hit if anti else hit))

    return ds.map_batches(_task, batch_format="pyarrow", batch_size=batch_size,
                          zero_copy_batch=True)


def relate_exists(ds, other_wkb: bytes, predicate: str = "intersects") -> bool:
    """One boolean for the whole dataset (the reference's
    RelateWithDataset OR-fold): does ANY feature satisfy the
    predicate vs the given geometry? Early-exits via limit(1)."""
    other = wkb.as_multipolygon(other_wkb)

    def _flag(t: pa.Table) -> pa.Table:
        keep = []
        for i, g in enumerate(t.column("geom_wkb").to_pylist()):
            r = predicates.relate(wkb.as_multipolygon(g), other)
            if r[predicate]:
                keep.append(i)
        return t.take(pa.array(keep, type=pa.int64()))

    return ds.map_batches(_flag, batch_format="pyarrow").limit(1).count() > 0


def relate_column(ds, other_wkb: bytes, predicate: str = "intersects",
                  out: str | None = None):
    """Per-row boolean predicate column vs a fixed geometry
    (RelateWithGeometry per-feature semantics)."""
    other = wkb.as_multipolygon(other_wkb)
    name = out or predicate

    def _batch(t: pa.Table) -> pa.Table:
        flags = [predicates.relate(wkb.as_multipolygon(g), other)[predicate]
                 for g in t.column("geom_wkb").to_pylist()]
        return t.append_column(name, pa.array(flags, type=pa.bool_()))

    return ds.map_batches(_batch, batch_format="pyarrow")


def clip_to(ds, clip_wkb: bytes, geom_col: str = "geom_wkb"):
    """Overlay-intersection against a CONVEX clip geometry: each
    feature replaced by its intersection; empty results dropped
    (keep-hits-only, SpaVectors.py:959-960). The clip ring is
    bbox-prescreened per batch before exact clipping."""
    ct, cv = wkb.decode(clip_wkb)
    if ct == "Polygon":
        clip_ring = cv[0]
    elif ct == "MultiPolygon" and len(cv) == 1:
        clip_ring = cv[0][0]
    else:
        raise ValueError("clip geometry must be a single (convex) polygon")
    cb = geom.ring_bbox(clip_ring)

    def _batch(t: pa.Table) -> pa.Table:
        out, keep = [], []
        for i, g in enumerate(t.column(geom_col).to_pylist()):
            mp = wkb.as_multipolygon(g)
            minx, miny, maxx, maxy = geom.multipolygon_bbox(mp)
            if minx > cb[2] or maxx < cb[0] or miny > cb[3] or maxy < cb[1]:
                continue  # bbox-disjoint: clipped away
            res = clipmod.clip_multipolygon_convex(mp, clip_ring)
            if res is not None:
                keep.append(i)
                out.append(wkb.encode_multipolygon(res))
        kept = t.take(pa.array(keep, type=pa.int64()))
        gi = kept.schema.get_field_index(geom_col)
        return kept.set_column(gi, geom_col, pa.array(out, type=pa.binary()))

    return ds.map_batches(_batch, batch_format="pyarrow")
