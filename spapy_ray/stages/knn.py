"""kNN join: each page → k nearest zones by haversine distance.

Two forms (north rule: "kNN joins via cell-ring expansion"):

- :func:`knn_join_broadcast` — the small-target form: zone anchor
  points are broadcast (ray.put once) and every Arrow batch does one
  vectorized [batch x zones] haversine + stable argsort. Right for
  target sets that fit a worker (the usual case for admin layers).

- :func:`knn_join_cells` — the scale form for LARGE target sets:
  both sides keyed by quadkey cell, candidates replicated to
  neighboring cells via ring expansion (flat_map), per-cell top-k in
  map_groups, with a widening fallback pass for unsatisfied points.

Ties broken by zone_id (stable argsort over zone_id-ordered columns ==
SQL ORDER BY dist, zone_id).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from spapy_ray.kernels import geom, wkb
from spapy_ray.util import default_pool


def zone_anchors(zones: pa.Table) -> np.ndarray:
    """[Z, 2] (lon, lat) bbox-center anchor per zone, zone_id order.

    Uses the geometry bbox (not the generator's parameters), so the
    engine path is independent of the synthesis arithmetic.
    """
    out = np.empty((len(zones), 2), dtype=np.float64)
    for i, g in enumerate(zones.column("geom_wkb").to_pylist()):
        t, v = wkb.decode(g)
        if t == "Point":
            out[i] = v
            continue
        if t == "Polygon":
            mp = [v]
        elif t == "MultiPolygon":
            mp = v
        else:  # LineString / MultiPoint / MultiLineString: bbox of coords
            pts = np.vstack(v) if isinstance(v, list) else np.asarray(v)
            out[i] = ((pts[:, 0].min() + pts[:, 0].max()) / 2.0,
                      (pts[:, 1].min() + pts[:, 1].max()) / 2.0)
            continue
        minx, miny, maxx, maxy = geom.multipolygon_bbox(mp)
        out[i] = ((minx + maxx) / 2.0, (miny + maxy) / 2.0)
    return out


class KNNJoin:
    """Actor-pool stage: batch of points → k nearest zone rows.

    Two-phase exact kNN: candidate selection via a float32 GEMM on
    unit-sphere vectors (chord distance is EXACTLY monotonic with the
    great-circle angle, so dot-product order == haversine order up to
    float rounding), then exact float64 haversine — the same formula
    as the SQL oracle — on only k+8 candidates per point for the
    final ranking. The margin of 8 absorbs f32 rounding in selection;
    a true top-k zone would have to be displaced past 8 impostors
    within ~1e-7 relative chord distance to be missed. This replaces
    the memory-bound [n x z] float64 distance matrix (8 temporaries)
    with one [n x z] float32 GEMM output — ~6x less memory traffic.
    """

    MARGIN = 8

    def __init__(self, zones_ref=None, zones_table: pa.Table | None = None,
                 k: int = 3, left_columns: list[str] | None = None):
        if zones_table is None:
            import ray
            zones_table = ray.get(zones_ref)
        self.k = k
        self.left_columns = left_columns
        self.zone_ids = zones_table.column("zone_id").to_numpy()
        if "geom_wkb" in zones_table.column_names:
            anchors = zone_anchors(zones_table)
        else:                     # plain (zone_id, lon, lat) anchor table
            anchors = np.column_stack([
                zones_table.column("lon").to_numpy(zero_copy_only=False),
                zones_table.column("lat").to_numpy(zero_copy_only=False)])
        self.alon, self.alat = anchors[:, 0], anchors[:, 1]
        lam = np.radians(self.alon)
        phi = np.radians(self.alat)
        self.zvec = np.column_stack([
            np.cos(phi) * np.cos(lam), np.cos(phi) * np.sin(lam),
            np.sin(phi)]).astype(np.float32)          # [z, 3]

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        n, z = len(lon), len(self.zone_ids)
        k = min(self.k, z)
        m = min(k + self.MARGIN, z)
        if m < z:
            lam = np.radians(lon).astype(np.float32)
            phi = np.radians(lat).astype(np.float32)
            cp = np.cos(phi)
            pts = np.column_stack([cp * np.cos(lam), cp * np.sin(lam),
                                   np.sin(phi)])      # [n, 3] f32
            dots = pts @ self.zvec.T                  # [n, z] f32 GEMM
            cand = np.argpartition(-dots, m - 1, axis=1)[:, :m]
            cand.sort(axis=1)                         # zone_id order
            d = geom.haversine_m(lon[:, None], lat[:, None],
                                 self.alon[cand], self.alat[cand])
        else:
            cand = np.broadcast_to(np.arange(z), (n, z))
            d = geom.haversine_m(lon[:, None], lat[:, None],
                                 self.alon[None, :], self.alat[None, :])
        # stable argsort of zone_id-ordered candidates == SQL
        # ORDER BY (dist, zone_id)
        order = np.argsort(d, axis=1, kind="stable")[:, :k]
        nearest = np.take_along_axis(cand, order, axis=1)
        left = batch.select(self.left_columns) if self.left_columns else batch
        idx = np.repeat(np.arange(n, dtype=np.int64), k)
        out = left.take(pa.array(idx))
        out = out.append_column("zone_id", pa.array(self.zone_ids[nearest.ravel()]))
        out = out.append_column(
            "rank", pa.array(np.tile(np.arange(1, k + 1, dtype=np.int64), n)))
        return out


def knn_join_broadcast(ds, zones: pa.Table, k: int = 3,
                       left_columns: list[str] | None = None,
                       concurrency=None, batch_size: int | None = 4096,
                       use_actors: bool = False):
    import ray

    from spapy_ray.util import cached_state

    zones_ref = ray.put(zones)
    if use_actors:
        return ds.map_batches(
            KNNJoin,
            fn_constructor_kwargs={"zones_ref": zones_ref, "k": k,
                                   "left_columns": left_columns},
            batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency or default_pool(),
        )

    box = (zones_ref,)

    def _task(batch: pa.Table) -> pa.Table:
        joiner = cached_state(
            box, lambda zt: KNNJoin(zones_table=zt, k=k,
                                    left_columns=left_columns))
        return joiner(batch)

    return ds.map_batches(_task, batch_format="pyarrow", batch_size=batch_size,
                          zero_copy_batch=True)


def _knn_tail_broadcast(retry_pts, targets_ds, *, k: int, n_targets: int,
                        point_key: str, target_key: str):
    """Resolve a (small) unsat tail exactly against a broadcastable
    target side: one KNNJoin GEMM pass, same (dist, zone_id)
    tie-break as per_cell. Output schema matches the cell path so the
    final union is seamless."""
    import ray

    tgt = targets_ds.to_pandas().sort_values(target_key)
    ztab = pa.table({"zone_id": tgt[target_key].to_numpy().astype(np.int64),
                     "lon": tgt["lon"].to_numpy(),
                     "lat": tgt["lat"].to_numpy()})
    ref = ray.put(ztab)
    box = (ref,)

    def _task(batch: pa.Table) -> pa.Table:
        from spapy_ray.util import cached_state

        joiner = cached_state(
            box, lambda zt: KNNJoin(zones_table=zt, k=k,
                                    left_columns=[point_key, "lon", "lat"]))
        out = joiner(batch)
        n = len(out)
        if point_key != "key":
            out = out.rename_columns(
                ["key" if c == point_key else c for c in out.column_names])
        return pa.table({
            "key": out.column("key"),
            "zone_id": pc.cast(out.column("zone_id"), pa.int64()),
            "rank": pc.cast(out.column("rank"), pa.int64()),
            "n_cand": pa.array(np.full(n, n_targets, dtype=np.int64)),
            "exact": pa.array(np.ones(n, dtype=bool)),
            "lon": out.column("lon"),
            "lat": out.column("lat")})

    return retry_pts.map_batches(_task, batch_format="pyarrow",
                                 zero_copy_batch=True)


def knn_join_cells(points_ds, targets_ds, k: int = 3, res: int = 6,
                   max_ring: int = 2, widen_passes: int = 2,
                   _keep_coords: bool = False,
                   point_cols: tuple[str, str] = ("lon", "lat"),
                   target_cols: tuple[str, str] = ("lon", "lat"),
                   point_key: str = "url", target_key: str = "zone_id",
                   tail_broadcast_max: int = 200_000):
    """Cell-partitioned kNN for large x large: co-shuffle on quadkey.

    Targets are replicated into every cell within ``max_ring`` of their
    home cell (flat_map), then one groupby(cell) co-partitions points
    with candidate targets and map_groups computes per-point top-k.
    Points whose cell neighborhood holds < k candidates are RERUN
    through additional passes with a doubled ring (``widen_passes``
    rounds); any still-unsatisfied leftovers keep their partial
    results with ``n_cand`` reporting how many candidates they saw.
    The partitioning assumption — target density roughly uniform at
    resolution ``res`` — is the documented contract (SURVEY.md §2.6).

    Returns a ray.data.Dataset (key, zone_id, rank, n_cand, exact);
    nothing output-sized ever touches the driver — only the
    unsatisfied keys of each widening round do.

    When a widening round is needed AND the target side turns out to
    be broadcastable (count ≤ ``tail_broadcast_max``), the whole
    unsat tail is finished exactly in ONE broadcast pass (the
    KNNJoin GEMM kernel) instead of further ring-doubling shuffle
    rounds — the common shape in practice (points huge, zones
    modest). Targets larger than the bound keep the pure-shuffle
    widening path.
    """
    import pandas as pd

    from spapy_ray.kernels import cells as cellmod

    plon, plat = point_cols
    tlon, tlat = target_cols

    def tag_points(t: pa.Table) -> pa.Table:
        lon = t.column(plon).to_numpy(zero_copy_only=False)
        lat = t.column(plat).to_numpy(zero_copy_only=False)
        c = cellmod.encode(lon, lat, res).astype("int64")
        return pa.table({
            "cell": pa.array(c),
            "kind": pa.array(np.zeros(len(t), dtype=np.int8)),
            "key": t.column(point_key),
            "lon": t.column(plon), "lat": t.column(plat),
            "tkey": pa.nulls(len(t), type=pa.int64()),
        })

    def replicate_targets(t: pa.Table) -> pa.Table:
        lon = t.column(tlon).to_numpy(zero_copy_only=False)
        lat = t.column(tlat).to_numpy(zero_copy_only=False)
        tkey = t.column(target_key).to_numpy(zero_copy_only=False)
        home = cellmod.encode(lon, lat, res)
        out_cell, out_i = [], []
        for i in range(len(t)):
            d = cellmod.disk(int(home[i]), max_ring)
            out_cell.append(d.astype(np.int64))
            out_i.append(np.full(len(d), i, dtype=np.int64))
        cell = np.concatenate(out_cell) if out_cell else np.zeros(0, np.int64)
        idx = np.concatenate(out_i) if out_i else np.zeros(0, np.int64)
        return pa.table({
            "cell": pa.array(cell),
            "kind": pa.array(np.ones(len(cell), dtype=np.int8)),
            "key": pa.nulls(len(cell), type=pa.string()),
            "lon": pa.array(lon[idx]), "lat": pa.array(lat[idx]),
            "tkey": pa.array(tkey[idx].astype(np.int64)),
        })

    tagged_p = points_ds.map_batches(tag_points, batch_format="pyarrow")
    tagged_t = targets_ds.map_batches(replicate_targets, batch_format="pyarrow")
    both = tagged_p.union(tagged_t)

    n_cells = 1 << res
    cell_w = 360.0 / n_cells
    cell_h = 180.0 / n_cells
    full_cover = max_ring >= n_cells  # ring spans the whole grid

    def _guarantee_m(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        """Safe lower bound (m) on the distance from each point to
        anything OUTSIDE its (2*max_ring+1)-cell replication box:

        - north/south edges: dlat * min-meridian-meters (110.5 km/deg
          underestimates everywhere on the sphere);
        - east/west meridian edges: the true min distance to a
          meridian is R*asin(sin(dlon)*cos(lat)) >= R*sin(dlon)*
          cos(lat) at the point's OWN latitude (asin(x) >= x).

        Monotone in max_ring — the round-1 bound used the cos of the
        box's FARTHEST latitude, so WIDENING the ring could SHRINK
        the guarantee and re-queue points forever."""
        cx = np.floor((lon + 180.0) / cell_w)
        cy = np.floor((lat + 90.0) / cell_h)
        x0 = (cx - max_ring) * cell_w - 180.0
        x1 = (cx + max_ring + 1) * cell_w - 180.0
        y0 = (cy - max_ring) * cell_h - 90.0
        y1 = (cy + max_ring + 1) * cell_h - 90.0
        dy = np.minimum(lat - y0, y1 - lat)
        dx = np.minimum(np.minimum(lon - x0, x1 - lon), 90.0)
        dy_m = dy * 110500.0
        dx_m = 6371000.0 * np.sin(np.radians(dx)) * \
            np.cos(np.radians(np.minimum(np.abs(lat), 89.9)))
        return np.minimum(dy_m, dx_m)

    def per_cell(g: pd.DataFrame) -> pd.DataFrame:
        pts = g[g["kind"] == 0]
        tgt = g[g["kind"] == 1]
        if len(pts) == 0:
            return pd.DataFrame({"key": pd.Series([], dtype=object),
                                 "zone_id": pd.Series([], dtype=np.int64),
                                 "rank": pd.Series([], dtype=np.int64),
                                 "n_cand": pd.Series([], dtype=np.int64),
                                 "exact": pd.Series([], dtype=bool),
                                 "lon": pd.Series([], dtype=np.float64),
                                 "lat": pd.Series([], dtype=np.float64)})
        nt = len(tgt)
        if nt == 0:
            return pd.DataFrame({"key": pts["key"], "zone_id": -1,
                                 "rank": 0, "n_cand": 0, "exact": False,
                                 "lon": pts["lon"], "lat": pts["lat"]})
        tk = tgt["tkey"].to_numpy().astype(np.int64)   # nullable col → f64
        order_t = np.argsort(tk, kind="stable")
        tk = tk[order_t]
        tl = tgt["lon"].to_numpy()[order_t]
        tb = tgt["lat"].to_numpy()[order_t]
        d = geom.haversine_m(pts["lon"].to_numpy()[:, None],
                             pts["lat"].to_numpy()[:, None],
                             tl[None, :], tb[None, :])
        kk = min(k, nt)
        order = np.argsort(d, axis=1, kind="stable")
        nearest = order[:, :kk]
        kth = np.take_along_axis(d, order[:, kk - 1:kk], axis=1)[:, 0]
        plon = pts["lon"].to_numpy()
        plat = pts["lat"].to_numpy()
        if full_cover:
            exact = np.ones(len(pts), dtype=bool) & (nt >= k)
        else:
            # exact iff the kth-nearest candidate is provably closer
            # than anything outside the replication box
            exact = (nt >= k) & (kth <= _guarantee_m(plon, plat))
        return pd.DataFrame({
            "key": np.repeat(pts["key"].to_numpy(), kk),
            "zone_id": tk[nearest.ravel()],
            "rank": np.tile(np.arange(1, kk + 1), len(pts)),
            "n_cand": nt,
            "exact": np.repeat(exact, kk),
            "lon": np.repeat(plon, kk),
            "lat": np.repeat(plat, kk),
        })

    out = both.groupby("cell").map_groups(per_cell, batch_format="pandas")

    # widening passes: points that saw < k candidates rerun with a
    # doubled replication ring. The OUTPUT stays a Dataset end to end;
    # only the unsatisfied point KEYS (bounded, usually a tiny tail)
    # are collected to the driver to seed the retry.
    import ray.data as rd

    def _sat(t: pa.Table) -> pa.Table:
        return t.filter(t.column("exact"))

    def _unsat(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(t.column("exact"))) \
            .select(["key", "lon", "lat"])

    # Each round materializes only its OWN output (the first pass is
    # output-sized, retries shrink geometrically); satisfied parts
    # accumulate lazily and union once at the end — re-materializing
    # the growing union every round measured 3x slower.
    ring = max_ring
    sat_parts = []
    current = out
    n_targets = None
    for _ in range(widen_passes):
        current = current.materialize()
        unsat_df = current.map_batches(_unsat, batch_format="pyarrow") \
            .to_pandas().drop_duplicates("key")
        if len(unsat_df) == 0:
            break
        if n_targets is None:
            n_targets = targets_ds.count()
        if n_targets == 0:        # nothing can satisfy the tail
            break                 # (current keeps the zone_id=-1 rows)
        sat_parts.append(current.map_batches(_sat, batch_format="pyarrow"))
        retry_pts = rd.from_pandas(
            unsat_df.rename(columns={"key": point_key}))
        if n_targets <= tail_broadcast_max:
            # the unsat tail (geometrically shrinking) against a
            # broadcastable target side: finish EXACTLY in one
            # broadcast pass instead of 1-2 more ring-doubling
            # shuffle rounds (each ~1-2 s of fixed scheduling at any
            # scale, plus a full union+sort of the retry cells)
            current = _knn_tail_broadcast(
                retry_pts, targets_ds, k=k, n_targets=n_targets,
                point_key=point_key, target_key=target_key)
            break
        ring *= 2
        current = knn_join_cells(retry_pts, targets_ds, k=k, res=res,
                                 max_ring=ring, widen_passes=0,
                                 _keep_coords=True,
                                 point_cols=("lon", "lat"),
                                 target_cols=target_cols,
                                 point_key=point_key, target_key=target_key)
    out = current
    for p in sat_parts:
        out = out.union(p)
    if not _keep_coords:
        out = out.drop_columns(["lon", "lat"])
    return out
