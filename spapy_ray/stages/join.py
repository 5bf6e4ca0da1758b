"""Spatial join stages.

The reference joins datasets with O(N*M) nested Python loops and no
index (OverlayWithDataset / RelateWithDataset, SpaVectors.py:964-983,
1148-1254). Here the polygon side is STRtree-indexed once, broadcast
through the object store, and every Arrow batch of points is joined by
bbox-pruned candidates + exact ray-cast PIP — the north rule's
"point-in-polygon tests (ray-casting with STRtree-pruned candidate
sets broadcast to actor pools)".

Scale notes (100 TB thinking):
- zones are ray.put ONCE on the driver; each actor fetches the handle
  in __init__ (once per worker process), never per batch;
- the batch path is numpy-vectorized: one STRtree batch query, then
  one PIP call per *distinct candidate zone* in the batch (vectorized
  over that zone's candidate points);
- output preserves all requested left columns via a single `take`,
  so `text` bytes pass through untouched (per-url invariant);
- for very large polygon sides, swap broadcast for the cell
  co-partition form (groupby on `cell`) — see pipelines.flagship.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from spapy_ray.kernels import geom, wkb
from spapy_ray.kernels.strtree import STRtree
from spapy_ray.util import default_pool


class ZoneIndex:
    """Decoded + STRtree-indexed zone layer. Built once per actor."""

    def __init__(self, zones: pa.Table):
        self.table = zones
        self.zone_ids = zones.column("zone_id").to_numpy()
        geoms = zones.column("geom_wkb").to_pylist()
        self.multipolygons = [wkb.as_multipolygon(g) for g in geoms]
        self.boxes = np.array([geom.multipolygon_bbox(mp)
                               for mp in self.multipolygons]).reshape(-1, 4)
        self.tree = STRtree(self.boxes)

    def query(self, lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(point_idx, zone_row_idx) pairs after exact PIP."""
        pi, zi = self.tree.query_points(lon, lat)
        if len(pi) == 0:
            return pi, zi
        keep = np.zeros(len(pi), dtype=bool)
        for z in np.unique(zi):
            m = zi == z
            keep[m] = geom.pip_multipolygon(lon[pi[m]], lat[pi[m]],
                                            self.multipolygons[z])
        return pi[keep], zi[keep]


class PIPJoin:
    """Actor-pool batch joiner: pages x zones → join rows.

    __init__ once per actor (fetch broadcast zones, build STRtree);
    __call__ per Arrow batch. Inner-join semantics: non-matching
    points are dropped, matching the reference's keep-hits-only
    overlay behavior (SpaVectors.py:959-960); pass keep_unmatched for
    left-join semantics (zone columns null).
    """

    def __init__(self, zones_ref=None, zones_table: pa.Table | None = None,
                 left_columns: list[str] | None = None,
                 zone_columns: list[str] | None = None,
                 keep_unmatched: bool = False):
        if zones_table is None:
            import ray
            zones_table = ray.get(zones_ref)
        self.index = ZoneIndex(zones_table)
        self.left_columns = left_columns
        self.zone_columns = zone_columns or [
            c for c in zones_table.column_names if c != "geom_wkb"]
        self.keep_unmatched = keep_unmatched

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _join_batch(batch, self.index, self.left_columns,
                           self.zone_columns, self.keep_unmatched)


def _join_batch(batch: pa.Table, index: ZoneIndex,
                left_columns: list[str] | None,
                zone_columns: list[str], keep_unmatched: bool) -> pa.Table:
    """The shared per-batch join body (used by both task and actor forms)."""
    lon = batch.column("lon").to_numpy(zero_copy_only=False)
    lat = batch.column("lat").to_numpy(zero_copy_only=False)
    pi, zi = index.query(lon, lat)
    left = batch.select(left_columns) if left_columns else batch
    if keep_unmatched:
        unmatched = np.setdiff1d(np.arange(len(batch), dtype=np.int64), pi)
        out_left = left.take(pa.array(np.concatenate([pi, unmatched])))
        ztab = index.table.select(zone_columns)
        matched_z = ztab.take(pa.array(zi))
        null_z = pa.table({c: pa.nulls(len(unmatched), type=ztab.schema.field(c).type)
                           for c in zone_columns})
        zcols = pa.concat_tables([matched_z, null_z])
    else:
        out_left = left.take(pa.array(pi))
        zcols = index.table.select(zone_columns).take(pa.array(zi))
    out = out_left
    for name in zone_columns:
        out = out.append_column(name, zcols.column(name))
    return out


def pip_join(ds, zones: pa.Table, left_columns: list[str] | None = None,
             zone_columns: list[str] | None = None, concurrency=None,
             batch_size: int | None = 32768, keep_unmatched: bool = False,
             use_actors: bool = False):
    """Broadcast PIP join stage over a Dataset with lon/lat columns.

    Default form: STATELESS tasks + per-worker cached ZoneIndex
    (util.cached_state) — the broadcast state is still fetched once
    and indexed once per worker process, but without paying actor-pool
    process startup per pipeline (~7s for 32 actors, measured) and
    with fully elastic parallelism. ``use_actors=True`` selects the
    classic actor-pool form — right when state build is expensive
    (big polygon layers, models) relative to the job.
    """
    import ray

    from spapy_ray.util import cached_state

    zones_ref = ray.put(zones)
    zcols = zone_columns or [c for c in zones.column_names if c != "geom_wkb"]
    if use_actors:
        return ds.map_batches(
            PIPJoin,
            fn_constructor_kwargs={
                "zones_ref": zones_ref,
                "left_columns": left_columns,
                "zone_columns": zcols,
                "keep_unmatched": keep_unmatched,
            },
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency or default_pool(),
        )

    box = (zones_ref,)

    def _task(batch: pa.Table) -> pa.Table:
        index = cached_state(box, ZoneIndex)
        return _join_batch(batch, index, left_columns, zcols, keep_unmatched)

    return ds.map_batches(_task, batch_format="pyarrow", batch_size=batch_size,
                          zero_copy_batch=True)


def pip_join_cells(points_ds, zones_ds, res: int = 4, salt: int = 1,
                   point_cols: tuple[str, str] = ("lon", "lat"),
                   point_key: str = "url", geom_col: str = "geom_wkb",
                   zone_key: str = "zone_id"):
    """Large x large PIP join: co-partition BOTH sides on quadkey cell.

    The broadcast form (pip_join) assumes the polygon side fits a
    worker; this form shuffles instead (north rule: "spatial shuffles
    expressed as groupby-on-H3-cell with explicit salting for hot
    cells"):

    1. each zone row is replicated to every res-cell its bbox
       overlaps (flat_map-shaped map_batches);
    2. each point row is tagged with its own cell;
    3. one groupby(cell[, salt]) co-partitions them; the per-group
       kernel builds a local STRtree over that cell's zone candidates
       and ray-casts that cell's points.

    ``salt > 1`` splits each cell's POINT set into ``salt`` sub-groups
    (hash of the point key) and duplicates the zone candidates into
    each — the documented skew treatment for dense urban cells. A
    point is only ever tested in its own (cell, salt) group, so no
    duplicate join rows arise. Output: (point_key, zone_key) pairs;
    re-attach attributes of either side afterwards by key (broadcast
    lookup for small attr tables, co-partition join otherwise).
    """
    import pandas as pd

    from spapy_ray.kernels import cells as cellmod
    from spapy_ray.kernels.hashing import fnv1a64

    plon, plat = point_cols

    def tag_points(t: pa.Table) -> pa.Table:
        lon = t.column(plon).to_numpy(zero_copy_only=False)
        lat = t.column(plat).to_numpy(zero_copy_only=False)
        c = cellmod.encode(lon, lat, res).astype("int64")
        s = (fnv1a64(t.column(point_key)) % np.uint64(salt)).astype(np.int8) \
            if salt > 1 else np.zeros(len(t), dtype=np.int8)
        return pa.table({
            "cell": pa.array(c), "salt": pa.array(s),
            "kind": pa.array(np.zeros(len(t), dtype=np.int8)),
            "pkey": t.column(point_key),
            "lon": t.column(plon), "lat": t.column(plat),
            "zkey": pa.nulls(len(t), type=pa.int64()),
            "geom": pa.nulls(len(t), type=pa.binary()),
        })

    def replicate_zones(t: pa.Table) -> pa.Table:
        out_cell, out_salt, out_i = [], [], []
        geoms = t.column(geom_col).to_pylist()
        n = np.int64(1) << np.int64(res)
        for i, g in enumerate(geoms):
            minx, miny, maxx, maxy = geom.multipolygon_bbox(wkb.as_multipolygon(g))
            x0, y0 = cellmod.xy_for(np.array([minx]), np.array([miny]), res)
            x1, y1 = cellmod.xy_for(np.array([maxx]), np.array([maxy]), res)
            xs = np.arange(x0[0], x1[0] + 1)
            ys = np.arange(y0[0], y1[0] + 1)
            gx, gy = np.meshgrid(xs, ys)
            cc = cellmod.encode_xy(gx.ravel() % n, gy.ravel(), res).astype("int64")
            for sv in range(salt):
                out_cell.append(cc)
                out_salt.append(np.full(len(cc), sv, dtype=np.int8))
                out_i.append(np.full(len(cc), i, dtype=np.int64))
        cell = np.concatenate(out_cell) if out_cell else np.zeros(0, np.int64)
        sl = np.concatenate(out_salt) if out_salt else np.zeros(0, np.int8)
        idx = np.concatenate(out_i) if out_i else np.zeros(0, np.int64)
        zk = t.column(zone_key).to_numpy(zero_copy_only=False)[idx]
        gm = [geoms[j] for j in idx]
        return pa.table({
            "cell": pa.array(cell), "salt": pa.array(sl),
            "kind": pa.array(np.ones(len(cell), dtype=np.int8)),
            "pkey": pa.nulls(len(cell), type=pa.string()),
            "lon": pa.nulls(len(cell), type=pa.float64()),
            "lat": pa.nulls(len(cell), type=pa.float64()),
            "zkey": pa.array(zk.astype(np.int64)),
            "geom": pa.array(gm, type=pa.binary()),
        })

    tagged_p = points_ds.map_batches(tag_points, batch_format="pyarrow")
    tagged_z = zones_ds.map_batches(replicate_zones, batch_format="pyarrow")
    both = tagged_p.union(tagged_z)

    def per_cell(g: pd.DataFrame) -> pd.DataFrame:
        pts = g[g["kind"] == 0]
        zs = g[g["kind"] == 1]
        if len(pts) == 0 or len(zs) == 0:
            return pd.DataFrame({"pkey": pd.Series([], dtype=object),
                                 "zkey": pd.Series([], dtype=np.int64)})
        sub = pa.table({"zone_id": pa.array(zs["zkey"].to_numpy().astype(np.int64)),
                        "geom_wkb": pa.array(list(zs["geom"]), type=pa.binary())})
        index = ZoneIndex(sub)
        pi, zi = index.query(pts["lon"].to_numpy(), pts["lat"].to_numpy())
        return pd.DataFrame({"pkey": pts["pkey"].to_numpy()[pi],
                             "zkey": index.zone_ids[zi].astype(np.int64)})

    return both.groupby(["cell", "salt"]).map_groups(per_cell,
                                                     batch_format="pandas")
