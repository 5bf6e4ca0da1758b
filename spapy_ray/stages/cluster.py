"""Distributed grid-DBSCAN over a point Dataset.

Density-based clustering (DBSCAN: Ester et al., KDD'96) re-expressed
as the grid-partitioned variant used by the scalable literature
(cell width eps/sqrt(2) "supernodes", cf. Gunawan's grid DBSCAN and
its MapReduce descendants): every stage is a bucketed Ray Data
shuffle over DISTINCT fixed-point coordinates, never over raw rows,
and the component step reuses the engine's scrambled hash contraction
(components.hash_to_min). The reference has no clustering operator at
all (its closest machinery is the per-pair Python relate loops,
SpaVectors.py:964-983); this is a north-rule scale addition like the
range join it builds on (stages/distjoin.py).

Semantics (deterministic, implementation-independent — shared with
the DuckDB oracle):

- distance: planar euclidean on degrees, EXACT int64 fixed-point
  predicate dx5^2 + dy5^2 <= eps5^2 (same convention as distjoin);
- a point's eps-neighborhood count INCLUDES itself (sklearn's
  min_samples convention), and all points at the same exact
  coordinate share one fate (their multiplicity w rides as a weight);
- core: count >= min_pts; border: non-core with >= 1 core within
  eps, assigned to the cluster of its NEAREST core (ties broken by
  smallest core coordinate pack) — no first-scan order dependence;
- cluster id: the MINIMUM coordinate pack among the cluster's core
  points (canonical, so engine and oracle agree bit-for-bit);
- noise: everything else (cluster = -1).

Why the cell graph is exact: with cell width c5 = floor(eps5/sqrt(2))
any two coords in one cell satisfy dist^2 <= 2*(c5-1)^2 < eps5^2, so
all cores of a cell are mutually eps-reachable and the cell is a
connectivity supernode; conversely any core pair within eps is at
most 2 cells apart per axis, so the 5x5 candidate ring sees it and
emits the (cell, cell) edge. Components of the cell graph therefore
equal components of the core eps-graph.

100 TB notes: shuffle volume everywhere is O(distinct coords), not
O(rows) — the first stage is a per-block combiner dedup. The pass-2
expansion ships 5x5 = 25 copies of CORE coords only (24 B each) and
1 home copy of every coord; hot cells are bounded by coordinate
dedup exactly as in distjoin. The cell-edge set is deduped per
bucket before the component contraction, so a dense blob of k cells
emits O(k * 24) edges, never O(points^2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from spapy_ray.stages.distjoin import (_MIX, _STRIDE, _bucket_of, _cell_of,
                                       _fixed5, _grid)
from spapy_ray.util import cluster_cpus

_LAT_OFF = np.int64(8_500_000)
_LON_OFF = np.int64(18_000_000)


def pack5(lat5: np.ndarray, lon5: np.ndarray) -> np.ndarray:
    """(lat5, lon5) -> one non-negative int64 coordinate key."""
    return (lat5 + _LAT_OFF) * _STRIDE + (lon5 + _LON_OFF)


def unpack5(pk: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lat5 = pk // _STRIDE - _LAT_OFF
    lon5 = pk % _STRIDE - _LON_OFF
    return lat5, lon5


def _hash_bucket(pk: np.ndarray, b: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return (((pk.astype(np.uint64) * _MIX) >> np.uint64(33))
                % np.uint64(b)).astype(np.int64)


def distinct_coords(ds, *, lat_col: str = "lat", lon_col: str = "lon",
                    buckets: int | None = None):
    """Dataset of points -> Dataset(pk, w): distinct fixed-point
    coordinates with multiplicities. Per-block combiner dedup before
    ONE bucketed shuffle, so shuffle volume is O(distinct per block)."""
    b = buckets or max(64, cluster_cpus() * 4)

    def combine(t: pa.Table) -> pa.Table:
        lat5 = _fixed5(t.column(lat_col))
        lon5 = _fixed5(t.column(lon_col))
        u, c = np.unique(pack5(lat5, lon5), return_counts=True)
        return pa.table({"hbk": pa.array(_hash_bucket(u, b)),
                         "pk": pa.array(u),
                         "w": pa.array(c.astype(np.int64))})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("pk", as_index=False, sort=False)["w"].sum()
        return g[["pk", "w"]]

    return ds.map_batches(combine, batch_format="pyarrow") \
        .groupby("hbk").map_groups(fold, batch_format="pandas")


def _slices(cell: np.ndarray):
    """Run boundaries of a sorted int array: yields (start, end)."""
    change = np.diff(cell) != 0
    starts = np.concatenate(([0], np.flatnonzero(change) + 1))
    ends = np.concatenate((starts[1:], [len(cell)]))
    return starts, ends


def core_counts(coords_ds, *, eps5: int, min_pts: int,
                buckets: int | None = None):
    """Dataset(pk, w) -> Dataset(pk, w, cnt, core): weighted
    eps-neighborhood count per distinct coordinate (self included).

    Grid cell width == eps5, 3x3 candidate replication, one bucketed
    shuffle; per cell a chunked [home x cand] int64 distance matrix
    (the distjoin kernel shape)."""
    b = buckets or max(64, cluster_cpus() * 4)
    eps5sq = eps5 * eps5

    def expand(t: pa.Table) -> pa.Table:
        pk = t.column("pk").to_numpy()
        w = t.column("w").to_numpy()
        lat5, lon5 = unpack5(pk)
        gx, gy = _grid(lat5, lon5, eps5)
        n = len(pk)
        zsub = np.zeros(n, dtype=np.int64)
        parts = [pa.table({
            "_bucket": pa.array(_bucket_of(_cell_of(gx, gy), zsub, 1, b)),
            "_cell": pa.array(_cell_of(gx, gy)),
            "pk": pa.array(pk), "w": pa.array(w),
            "_home": pa.array(np.ones(n, dtype=bool))})]
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                ncell = _cell_of(gx + dx, gy + dy)
                parts.append(pa.table({
                    "_bucket": pa.array(_bucket_of(ncell, zsub, 1, b)),
                    "_cell": pa.array(ncell),
                    "pk": pa.array(pk), "w": pa.array(w),
                    "_home": pa.array(np.zeros(n, dtype=bool))}))
        return pa.concat_tables(parts)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        cell = df["_cell"].to_numpy()
        order = np.argsort(cell, kind="stable")
        cell = cell[order]
        pk = df["pk"].to_numpy()[order]
        w = df["w"].to_numpy()[order]
        home = df["_home"].to_numpy()[order]
        lat5, lon5 = unpack5(pk)
        out_pk, out_w, out_cnt = [], [], []
        starts, ends = _slices(cell)
        for s, e in zip(starts, ends):
            hm = home[s:e]
            if not hm.any():
                continue
            cd = ~hm
            hpk, hw = pk[s:e][hm], w[s:e][hm]
            cnt = np.zeros(len(hpk), dtype=np.int64)
            if cd.any():
                hla, hlo = lat5[s:e][hm], lon5[s:e][hm]
                kla, klo = lat5[s:e][cd], lon5[s:e][cd]
                kw = w[s:e][cd]
                step = max(1, 4_000_000 // max(1, len(kla)))
                for i in range(0, len(hla), step):
                    dx = hlo[i:i + step, None] - klo[None, :]
                    dy = hla[i:i + step, None] - kla[None, :]
                    cnt[i:i + step] = \
                        ((dx * dx + dy * dy <= eps5sq) * kw).sum(axis=1)
            out_pk.append(hpk)
            out_w.append(hw)
            out_cnt.append(cnt)
        if not out_pk:
            return pd.DataFrame({"pk": pd.Series(dtype=np.int64),
                                 "w": pd.Series(dtype=np.int64),
                                 "cnt": pd.Series(dtype=np.int64)})
        return pd.DataFrame({"pk": np.concatenate(out_pk),
                             "w": np.concatenate(out_w),
                             "cnt": np.concatenate(out_cnt)})

    counted = coords_ds.map_batches(expand, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(per_bucket, batch_format="pandas")

    def flag(t: pa.Table) -> pa.Table:
        core = t.column("cnt").to_numpy() >= np.int64(min_pts)
        t = t.append_column("core", pa.array(core))
        # int twin so Dataset.sum() can cheaply test "any core at all"
        return t.append_column("corei", pa.array(core.astype(np.int64)))

    return counted.map_batches(flag, batch_format="pyarrow")


def _cell_edges_and_borders(cored_ds, *, eps5: int,
                            buckets: int | None = None):
    """One bucketed shuffle emitting BOTH outputs of pass 2 in a
    kind-tagged table: kind=0 -> (a, b) = deduped (home cell,
    neighbor cell) core-connectivity edge; kind=1 -> (a, b) =
    (border pk, cell of its nearest core).

    Home side = every coord (with its core flag); candidate side =
    CORE coords only, replicated to the 5x5 ring of the eps/sqrt(2)
    grid."""
    b = buckets or max(64, cluster_cpus() * 4)
    c5 = max(1, int(eps5 / np.sqrt(2.0)))
    eps5sq = eps5 * eps5

    def expand(t: pa.Table) -> pa.Table:
        pk = t.column("pk").to_numpy()
        core = t.column("core").to_numpy()
        lat5, lon5 = unpack5(pk)
        gx, gy = _grid(lat5, lon5, c5)
        n = len(pk)
        zsub = np.zeros(n, dtype=np.int64)
        home_cell = _cell_of(gx, gy)
        parts = [pa.table({
            "_bucket": pa.array(_bucket_of(home_cell, zsub, 1, b)),
            "_cell": pa.array(home_cell),
            "pk": pa.array(pk),
            "core": pa.array(core),
            "_home": pa.array(np.ones(n, dtype=bool))})]
        kpk = pk[core]
        kgx, kgy = gx[core], gy[core]
        m = len(kpk)
        kz = np.zeros(m, dtype=np.int64)
        kcore = np.ones(m, dtype=bool)
        for dx in (-2, -1, 0, 1, 2):
            for dy in (-2, -1, 0, 1, 2):
                ncell = _cell_of(kgx + dx, kgy + dy)
                parts.append(pa.table({
                    "_bucket": pa.array(_bucket_of(ncell, kz, 1, b)),
                    "_cell": pa.array(ncell),
                    "pk": pa.array(kpk),
                    "core": pa.array(kcore),
                    "_home": pa.array(np.zeros(m, dtype=bool))}))
        return pa.concat_tables(parts)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        cell = df["_cell"].to_numpy()
        order = np.argsort(cell, kind="stable")
        cell = cell[order]
        pk = df["pk"].to_numpy()[order]
        core = df["core"].to_numpy()[order]
        home = df["_home"].to_numpy()[order]
        lat5, lon5 = unpack5(pk)
        kinds, aa, bb = [], [], []
        starts, ends = _slices(cell)
        for s, e in zip(starts, ends):
            hm = home[s:e]
            cd = ~hm
            if not hm.any() or not cd.any():
                continue
            hcell = cell[s]
            hpk, hcore = pk[s:e][hm], core[s:e][hm]
            hla, hlo = lat5[s:e][hm], lon5[s:e][hm]
            kpk = pk[s:e][cd]
            kla, klo = lat5[s:e][cd], lon5[s:e][cd]
            kgx, kgy = _grid(kla, klo, c5)
            kcell = _cell_of(kgx, kgy)
            step = max(1, 4_000_000 // max(1, len(kpk)))
            for i in range(0, len(hpk), step):
                dx = hlo[i:i + step, None] - klo[None, :]
                dy = hla[i:i + step, None] - kla[None, :]
                d2 = dx * dx + dy * dy
                within = d2 <= eps5sq
                ic = hcore[i:i + step]
                if ic.any():
                    # connectivity: any core home hit -> dedup'd
                    # (home cell, cand cell) edge; drop the self cell
                    hit = within[ic].any(axis=0)
                    tc = np.unique(kcell[hit])
                    tc = tc[tc != hcell]
                    if len(tc):
                        kinds.append(np.zeros(len(tc), np.int8))
                        aa.append(np.full(len(tc), hcell, np.int64))
                        bb.append(tc)
                inc = ~ic
                if inc.any():
                    # border: nearest core, ties by min core pk
                    d2n = np.where(within[inc], d2[inc],
                                   np.iinfo(np.int64).max)
                    best = d2n.min(axis=1)
                    ok = best < np.iinfo(np.int64).max
                    if ok.any():
                        tie = np.where(d2n[ok] == best[ok][:, None],
                                       kpk[None, :],
                                       np.iinfo(np.int64).max)
                        cpk = tie.min(axis=1)
                        cgx, cgy = _grid(*unpack5(cpk), c5)
                        kinds.append(np.ones(int(ok.sum()), np.int8))
                        aa.append(hpk[i:i + step][inc][ok])
                        bb.append(_cell_of(cgx, cgy))
        if not kinds:
            return pd.DataFrame({"kind": pd.Series(dtype=np.int8),
                                 "a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64)})
        out = pd.DataFrame({"kind": np.concatenate(kinds),
                            "a": np.concatenate(aa),
                            "b": np.concatenate(bb)})
        # a border coord may appear once per home-row chunk; its
        # nearest-core choice is identical in each (same candidates),
        # and edges repeat across chunks — cheap local dedup
        return out.drop_duplicates(ignore_index=True)

    return cored_ds.map_batches(expand, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(per_bucket, batch_format="pandas")


def dbscan_labels(ds, *, eps_deg: float, min_pts: int,
                  lat_col: str = "lat", lon_col: str = "lon",
                  buckets: int | None = None, components: str = "auto"):
    """Point Dataset -> Dataset(pk, w, cnt, role, cluster): DBSCAN
    label per DISTINCT coordinate (all points at one coordinate share
    a fate). role: 0 core, 1 border, 2 noise. cluster: minimum core
    coordinate pack of the cluster (-1 for noise).

    ``components`` is forwarded to hash_to_min ("auto" / "driver" /
    "distributed") — everything else always runs distributed."""
    import pyarrow.compute as pc

    from spapy_ray.stages.components import hash_to_min

    eps5 = int(round(eps_deg * 1e5))
    if eps5 <= 0:
        raise ValueError("eps_deg must be >= 1e-5")
    if min_pts < 1:
        raise ValueError("min_pts must be >= 1")
    c5 = max(1, int(eps5 / np.sqrt(2.0)))

    coords = distinct_coords(ds, lat_col=lat_col, lon_col=lon_col,
                             buckets=buckets)
    # two consumers (pass-2 home side + the final label join)
    cored = core_counts(coords, eps5=eps5, min_pts=min_pts,
                        buckets=buckets).materialize()
    def all_noise(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({"pk": t.column("pk"), "w": t.column("w"),
                         "cnt": t.column("cnt"),
                         "role": pa.array(np.full(n, 2, np.int8)),
                         "cluster": pa.array(np.full(n, -1, np.int64))})

    # no cores anywhere -> no borders either; everything is noise.
    # (Also covers the empty input, whose zero-block datasets would
    # otherwise reach hash_join with an undefined schema.)
    if cored.count() == 0 or cored.sum("corei") == 0:
        if cored.count() == 0:
            import ray.data as rd
            return rd.from_arrow(pa.table({
                "pk": pa.array([], pa.int64()),
                "w": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
                "role": pa.array([], pa.int8()),
                "cluster": pa.array([], pa.int64())}))
        return cored.map_batches(all_noise, batch_format="pyarrow")

    p2 = _cell_edges_and_borders(cored, eps5=eps5,
                                 buckets=buckets).materialize()

    def edges_only(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("kind"), 0))
        return pa.table({"a": t.column("a"), "b": t.column("b")})

    def borders_only(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("kind"), 1))
        return pa.table({"pk": t.column("a"), "cell": t.column("b")})

    labels = hash_to_min(p2.map_batches(edges_only,
                                        batch_format="pyarrow"),
                         mode=components)

    # (pk, cell, role) for every labeled coord: cores map through
    # their own cell, borders through their chosen core's cell
    def core_cells(t: pa.Table) -> pa.Table:
        t = t.filter(t.column("core"))
        pk = t.column("pk").to_numpy()
        gx, gy = _grid(*unpack5(pk), c5)
        n = len(pk)
        return pa.table({"pk": pa.array(pk),
                         "cell": pa.array(_cell_of(gx, gy)),
                         "role": pa.array(np.zeros(n, np.int8))})

    def border_cells(t: pa.Table) -> pa.Table:
        return t.append_column(
            "role", pa.array(np.ones(len(t), np.int8)))

    members = cored.map_batches(core_cells, batch_format="pyarrow") \
        .union(p2.map_batches(borders_only, batch_format="pyarrow")
               .map_batches(border_cells, batch_format="pyarrow"))

    # The label-resolution tail is THREE fused cogroup shuffles (an
    # earlier form spent 6 hash_join/agg executions here — each
    # inner+anti pair shuffled the same union twice; fusing halved
    # the dbscan wall time at sf0.1). Inside each bucket the left
    # merge uses pandas NULLABLE Int64 so the 60-bit cell/pk packs
    # survive unmatched rows exactly (plain int64 would NaN-upcast
    # to float64 and corrupt ids beyond 2^53).
    b = buckets or max(64, cluster_cpus() * 4)

    def _hb(v: np.ndarray) -> np.ndarray:
        return _hash_bucket(v, b)

    # shuffle 1 (key = cell): members ⟕ labels, identity fallback —
    # a cell with no cross-cell edge is its own singleton component
    def mem_rows(t: pa.Table) -> pa.Table:
        cell = t.column("cell").to_numpy()
        return pa.table({"hbk": pa.array(_hb(cell)),
                         "kind": pa.array(np.ones(len(t), np.int8)),
                         "cell": pa.array(cell),
                         "pk": t.column("pk"),
                         "role": pc.cast(t.column("role"), pa.int64())})

    def lab_rows(t: pa.Table) -> pa.Table:
        v = t.column("v").to_numpy()
        z = len(t)
        return pa.table({"hbk": pa.array(_hb(v)),
                         "kind": pa.array(np.zeros(z, np.int8)),
                         "cell": pa.array(v),
                         "pk": t.column("lab"),
                         "role": pa.array(np.zeros(z, np.int64))})

    def resolve_bucket(df: pd.DataFrame) -> pd.DataFrame:
        lab = df[df["kind"] == 0][["cell", "pk"]] \
            .rename(columns={"pk": "lab"})
        lab["lab"] = lab["lab"].astype("Int64")
        m = df[df["kind"] == 1][["cell", "pk", "role"]] \
            .merge(lab, on="cell", how="left")
        m["lab"] = m["lab"].fillna(m["cell"]).astype(np.int64)
        return m[["pk", "role", "lab"]]

    resolved = members.map_batches(mem_rows, batch_format="pyarrow") \
        .union(labels.map_batches(lab_rows, batch_format="pyarrow")) \
        .groupby("hbk").map_groups(resolve_bucket, batch_format="pandas")

    # shuffle 2 (key = lab): canonical min-core-pk per component,
    # computed AND attached in one pass (all rows of a component are
    # co-located, and every component holds >= 1 core)
    def tag_lab(t: pa.Table) -> pa.Table:
        lab = t.column("lab").to_numpy()
        return t.append_column("hbk", pa.array(_hb(lab)))

    def canon_bucket(df: pd.DataFrame) -> pd.DataFrame:
        cores = df[df["role"] == 0]
        canon = cores.groupby("lab", sort=False)["pk"].min()
        df = df.assign(cluster=df["lab"].map(canon).astype(np.int64))
        return df[["pk", "role", "cluster"]]

    labeled = resolved.map_batches(tag_lab, batch_format="pyarrow") \
        .groupby("hbk").map_groups(canon_bucket, batch_format="pandas")

    # shuffle 3 (key = pk): attach labels to the distinct-coord
    # table; coords with no label row are noise
    def coord_rows(t: pa.Table) -> pa.Table:
        pk = t.column("pk").to_numpy()
        z = len(t)
        return pa.table({"hbk": pa.array(_hb(pk)),
                         "kind": pa.array(np.ones(z, np.int8)),
                         "pk": pa.array(pk),
                         "w": t.column("w"), "cnt": t.column("cnt"),
                         "role": pa.array(np.zeros(z, np.int64)),
                         "cluster": pa.array(np.zeros(z, np.int64))})

    def label_rows(t: pa.Table) -> pa.Table:
        pk = t.column("pk").to_numpy()
        z = len(t)
        return pa.table({"hbk": pa.array(_hb(pk)),
                         "kind": pa.array(np.zeros(z, np.int8)),
                         "pk": pa.array(pk),
                         "w": pa.array(np.zeros(z, np.int64)),
                         "cnt": pa.array(np.zeros(z, np.int64)),
                         "role": t.column("role"),
                         "cluster": t.column("cluster")})

    def attach_bucket(df: pd.DataFrame) -> pd.DataFrame:
        lab = df[df["kind"] == 0][["pk", "role", "cluster"]].copy()
        lab["role"] = lab["role"].astype("Int64")
        lab["cluster"] = lab["cluster"].astype("Int64")
        m = df[df["kind"] == 1][["pk", "w", "cnt"]] \
            .merge(lab, on="pk", how="left")
        m["role"] = m["role"].fillna(2).astype(np.int8)
        m["cluster"] = m["cluster"].fillna(-1).astype(np.int64)
        return m[["pk", "w", "cnt", "role", "cluster"]]

    return cored.map_batches(coord_rows, batch_format="pyarrow") \
        .union(labeled.map_batches(label_rows, batch_format="pyarrow")) \
        .groupby("hbk").map_groups(attach_bucket, batch_format="pandas")


def dbscan(ds, *, eps_deg: float, min_pts: int,
           key_cols: tuple[str, ...] = ("url", "warc_ts"),
           lat_col: str = "lat", lon_col: str = "lon",
           buckets: int | None = None, components: str = "auto"):
    """Per-point DBSCAN: key_cols + (role, cluster) for every input
    row — the coord-level labels joined back by coordinate pack."""
    from spapy_ray.stages.relational import hash_join

    labels = dbscan_labels(ds, eps_deg=eps_deg, min_pts=min_pts,
                           lat_col=lat_col, lon_col=lon_col,
                           buckets=buckets, components=components)

    def keyed(t: pa.Table) -> pa.Table:
        lat5 = _fixed5(t.column(lat_col))
        lon5 = _fixed5(t.column(lon_col))
        cols = {k: t.column(k) for k in key_cols}
        cols["pk"] = pa.array(pack5(lat5, lon5))
        return pa.table(cols)

    pts = ds.map_batches(keyed, batch_format="pyarrow")
    return hash_join(pts, labels.select_columns(["pk", "role",
                                                 "cluster"]),
                     on="pk", buckets=buckets)


def dbscan_summary(ds, *, eps_deg: float, min_pts: int,
                   lat_col: str = "lat", lon_col: str = "lon",
                   buckets: int | None = None,
                   components: str = "auto"):
    """Per-cluster aggregate Dataset(cluster, n_coords, n_points,
    n_core, n_border, minlat5, minlon5, maxlat5, maxlon5) — noise
    folds into the cluster = -1 row (its n_core/n_border are 0).
    All-integer output so the oracle hash is exact; callers
    dense-renumber by the canonical cluster key if they need 0..k-1
    ids (the output is small by construction: one row per cluster)."""
    from spapy_ray.stages.relational import bucketed_group_agg

    labels = dbscan_labels(ds, eps_deg=eps_deg, min_pts=min_pts,
                           lat_col=lat_col, lon_col=lon_col,
                           buckets=buckets, components=components)

    def widen(t: pa.Table) -> pa.Table:
        pk = t.column("pk").to_numpy()
        lat5, lon5 = unpack5(pk)
        role = t.column("role").to_numpy()
        w = t.column("w").to_numpy()
        return pa.table({
            "cluster": t.column("cluster"),
            "one": pa.array(np.ones(len(pk), np.int64)),
            "w": pa.array(w),
            "wc": pa.array(np.where(role == 0, w, 0).astype(np.int64)),
            "wb": pa.array(np.where(role == 1, w, 0).astype(np.int64)),
            "lat5": pa.array(lat5), "lon5": pa.array(lon5)})

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("cluster", sort=False)
        out = g.agg(n_coords=("one", "sum"), n_points=("w", "sum"),
                    n_core=("wc", "sum"), n_border=("wb", "sum"),
                    minlat5=("lat5", "min"), minlon5=("lon5", "min"),
                    maxlat5=("lat5", "max"), maxlon5=("lon5", "max"))
        return out.reset_index()

    return bucketed_group_agg(
        labels.map_batches(widen, batch_format="pyarrow"),
        "cluster", agg, buckets=buckets)
