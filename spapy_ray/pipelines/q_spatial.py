"""Spatial query pipelines (split from queries.py; registry order lives in
pipelines/queries.py)."""

from spapy_ray.pipelines.qcommon import *  # noqa: F401,F403


def q_pages(sf_dir: str):
    return pages_dataset(sf_dir, include_html=False)


def q_geocode(sf_dir: str):
    return _geo(sf_dir).select_columns(["url", "warc_ts", "lat", "lon", "geo_src"])


def q_cell_index(sf_dir: str):
    return cell_index(_geo(sf_dir)).select_columns(["url", "warc_ts", "cell", "tile"])


def q_pip_join(sf_dir: str):
    return _join(sf_dir)


def q_zone_page_counts(sf_dir: str):
    from spapy_ray.stages.relational import pre_aggregated_count

    return pre_aggregated_count(_join(sf_dir), "zone_id", alias="n_pages")


def q_tile_counts(sf_dir: str):
    from spapy_ray.stages.relational import pre_aggregated_count

    return pre_aggregated_count(cell_index(_geo(sf_dir)), "tile",
                                alias="n_pages")


def q_dedup_pages(sf_dir: str):
    return dedup_pages_agg(pages_dataset(sf_dir, include_html=False))


def q_knn_zones(sf_dir: str, k: int = 3):
    # The [batch x zones] distance stage is ~10x the per-row cost of
    # the linear stages AND cache-sensitive; Ray bundles fused-map
    # inputs to the chain's LARGEST batch_size, so the linear-stage
    # default (32768) would split 600k rows into only ~19 tasks.
    # 4096 measures fastest per-core (GEMM output stays in cache) and
    # yields ~4 tasks/CPU.
    geo = geocode(pages_dataset(sf_dir, include_html=False), batch_size=4096)
    return knn_join_broadcast(geo, zones_table(), k=k,
                              left_columns=["url", "warc_ts"],
                              batch_size=4096)


def q_knn_zones_cells(sf_dir: str, k: int = 3):
    """kNN join in the CELL-PARTITIONED (large x large) form: both
    sides shuffled on quadkey, ring-replicated candidates, per-cell
    top-k with the distance-guarantee exactness check + widening
    passes. Output stays a Dataset end to end (only unsatisfied keys
    visit the driver). The oracle is the same exact cross-join kNN as
    knn_zones, keyed by url#epoch."""
    import ray.data as rd

    from spapy_ray.stages.knn import knn_join_cells, zone_anchors

    zones = zones_table()
    anchors = zone_anchors(zones)
    targets = rd.from_arrow(pa.table({
        "zone_id": zones.column("zone_id"),
        "lon": pa.array(anchors[:, 0]), "lat": pa.array(anchors[:, 1])}))

    def keyed(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t.column("warc_ts"), pa.int64()), pa.string())
        key = pc.binary_join_element_wise(t.column("url"), us, "#")
        return t.append_column("key", key)

    pts = _geo(sf_dir).map_batches(keyed, batch_format="pyarrow")
    out = knn_join_cells(pts, targets, k=k, res=4, max_ring=2,
                         widen_passes=5, point_key="key")
    return out.select_columns(["key", "zone_id", "rank"])


def q_zone_bounds_area(sf_dir: str):
    out = measure_wkb_table(zones_table())
    return out.select(["zone_id", "name", "minx", "miny", "maxx", "maxy", "area"])


def q_select_zones(sf_dir: str):
    z = zones_table()
    mask = pc.and_(pc.greater_equal(z.column("labelrank"), pa.scalar(7)),
                   pc.less(z.column("area_class"), pa.scalar(80.0)))
    return z.filter(mask).select(["zone_id", "name", "labelrank"])


def q_suppliers_per_nation(sf_dir: str):
    from ray.data.aggregate import Count

    nation = pa.Table.from_pandas(
        _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas())
    sup = _read(sf_dir, "supplier", columns=["s_nationkey"])

    def widen(t: pa.Table) -> pa.Table:  # align key dtypes (int32 vs int64)
        return t.set_column(t.schema.get_field_index("s_nationkey"),
                            "s_nationkey",
                            pc.cast(t.column("s_nationkey"), pa.int64()))

    nation = nation.set_column(0, "n_nationkey",
                               pc.cast(nation.column("n_nationkey"), pa.int64()))
    joined = broadcast_join(sup.map_batches(widen, batch_format="pyarrow"),
                            nation, key="s_nationkey", small_key="n_nationkey")
    return joined.groupby("n_name").aggregate(Count(alias_name="n_suppliers")) \
                 .select_columns(["n_name", "n_suppliers"])


def q_split_zones(sf_dir: str):
    """split_features over the zone layer → one row per part with its
    exact bbox (validates Multi* explode + WKB + bbox, SURVEY §2.2)."""
    import ray.data as rd

    from spapy_ray.stages.measures import measure_wkb_table
    from spapy_ray.stages.vector_ops import split_features

    parts = split_features(rd.from_arrow(zones_table()))

    def bounds(t: pa.Table) -> pa.Table:
        return measure_wkb_table(t, "geom_wkb")

    return parts.map_batches(bounds, batch_format="pyarrow") \
        .select_columns(["zone_id", "minx", "miny", "maxx", "maxy"])


def q_buffer_zone_bounds(sf_dir: str, dist: float = 0.5):
    """buffer(zones, 0.5) → exact bbox growth of ±dist (edge-midpoint
    offsets dominate the bbox; dyadic dist keeps doubles exact)."""
    import ray.data as rd

    from spapy_ray.stages.measures import measure_wkb_table
    from spapy_ray.stages.vector_ops import buffer

    buf = buffer(rd.from_arrow(zones_table()), dist)

    def bounds(t: pa.Table) -> pa.Table:
        return measure_wkb_table(t, "geom_wkb")

    return buf.map_batches(bounds, batch_format="pyarrow") \
        .select_columns(["zone_id", "minx", "miny", "maxx", "maxy"])


def q_project_equirect(sf_dir: str):
    """Geocoded pages projected to equirectangular meters (pure
    multiplicative projection → bit-identical SQL twin)."""
    from spapy_ray.stages.transform import transform_points

    out = transform_points(_geo(sf_dir), "equirect")
    return out.select_columns(["url", "warc_ts", "x", "y"])


def q_zone_centroids(sf_dir: str):
    """Area-weighted centroids from WKB, fixed-point shoelace
    accumulation → bit-identical to the closed-form SQL oracle
    (oracle.q_zone_centroids)."""
    import ray.data as rd

    from spapy_ray.stages.vector_ops import centroid

    cent = centroid(rd.from_arrow(zones_table()), fixed_point=True)

    def pts(t: pa.Table) -> pa.Table:
        from spapy_ray.kernels import wkb as _w

        xs, ys = [], []
        for g in t.column("geom_wkb").to_pylist():
            _, (x, y) = _w.decode(g)
            xs.append(x)
            ys.append(y)
        return pa.table({"zone_id": t.column("zone_id"),
                         "cx": pa.array(xs), "cy": pa.array(ys)})

    return cent.map_batches(pts, batch_format="pyarrow")


def q_dedup_first_rows(sf_dir: str):
    """Row-level dedup: per url keep the first-crawled row
    (groupby + map_groups head(1) — the hash-partition + first form)."""
    from spapy_ray.stages.dedup import dedup_first

    ds = dedup_first(pages_dataset(sf_dir, include_html=False),
                     key="url", order_col="warc_ts")
    return ds.select_columns(["url", "warc_ts", "lang"])


def q_events_campaigns(sf_dir: str):
    """Range (non-equi) join: events into overlapping campaign
    windows (broadcast interval side), then count + value sum per
    campaign."""
    from ray.data.aggregate import Count, Sum

    from spapy_ray.stages.relational import interval_join

    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def us(t: pa.Table) -> pa.Table:
        return t.append_column("ts_us", pc.cast(t.column("ts"), pa.int64()))

    joined = interval_join(ds.map_batches(us, batch_format="pyarrow"),
                           campaigns_table(), on="ts_us",
                           keep=["ts_us", "value"])
    out = joined.groupby("campaign_id").aggregate(
        Count(alias_name="n_events"), Sum("value", alias_name="sum_value")) \
        .to_pandas()
    out["sum_value"] = out["sum_value"].round(2)
    return out[["campaign_id", "n_events", "sum_value"]]


def q_hull_areas(sf_dir: str):
    """Convex hull per zone (shapes 0-2; the multipart hull's closed
    form is octagonal algebra, excluded) → exact fixed-point area.
    Rect hull = rect; L-shape hull closes the notch with a diagonal,
    area = w*h - (w-w2)(h-h2)/2."""
    import ray.data as rd

    from spapy_ray.kernels import wkb as _wkb
    from spapy_ray.stages.measures import fixed_point_multipolygon_area
    from spapy_ray.stages.vector_ops import convex_hull

    zt = zones_table()
    keep = [i for i in range(len(zt)) if i % 4 != 3]
    ds = rd.from_arrow(zt.take(pa.array(keep, type=pa.int64())))
    hull = convex_hull(ds)

    def area(t: pa.Table) -> pa.Table:
        areas = [fixed_point_multipolygon_area(_wkb.as_multipolygon(g))
                 for g in t.column("geom_wkb").to_pylist()]
        return pa.table({"zone_id": t.column("zone_id"),
                         "hull_area": pa.array(areas, type=pa.float64())})

    return hull.map_batches(area, batch_format="pyarrow")


def q_relate_flags(sf_dir: str):
    """Relate predicates as a driver query: per zone vs the fixed
    box, intersects (closed intervals — touching counts) and within
    (zone inside box). SQL twin decomposes each shape into rect
    parts."""
    import ray.data as rd

    from spapy_ray.kernels import clip, wkb as _wkb
    from spapy_ray.stages.relate import relate_column

    box = _wkb.encode_polygon([clip.bbox_ring(*OVERLAY_BOX)])
    ds = rd.from_arrow(zones_table())
    out = relate_column(relate_column(ds, box, "intersects"),
                        box, "within")
    return out.select_columns(["zone_id", "intersects", "within"])


def q_simplify_areas(sf_dir: str):
    """Douglas-Peucker simplify preserves the zone corners (no
    collinear vertices in the fixture), so fixed-point areas equal
    the originals — the SQL twin is the closed-form area."""
    import ray.data as rd

    from spapy_ray.kernels import wkb as _wkb
    from spapy_ray.stages.measures import fixed_point_multipolygon_area
    from spapy_ray.stages.vector_ops import simplify

    ds = simplify(rd.from_arrow(zones_table()), 0.01)

    def area(t: pa.Table) -> pa.Table:
        areas = [fixed_point_multipolygon_area(_wkb.as_multipolygon(g))
                 for g in t.column("geom_wkb").to_pylist()]
        return pa.table({"zone_id": t.column("zone_id"),
                         "area": pa.array(areas, type=pa.float64())})

    return ds.map_batches(area, batch_format="pyarrow")


def q_text_invariant(sf_dir: str):
    """Per-url text fingerprint AFTER the full flagship pipeline
    (synth -> geocode -> cell index -> PIP join): proves the
    byte-identical-text-per-url invariant end-to-end against an
    oracle that fingerprints the text straight from the input spec."""
    from spapy_ray.stages.dedup import add_text_hash
    from spapy_ray.stages.join import pip_join

    joined = pip_join(_geo(sf_dir), zones_table(),
                      left_columns=["url", "text"], zone_columns=["zone_id"])
    from spapy_ray.stages.relational import bucketed_group_agg

    hashed = joined.map_batches(add_text_hash, batch_format="pyarrow") \
        .select_columns(["url", "text_hash"])

    def local(g):
        return g.groupby("url", sort=False).agg(
            text_fnv=("text_hash", "min"),
            n_rows=("text_hash", "size")).reset_index()

    return bucketed_group_agg(hashed, "url", local) \
        .select_columns(["url", "text_fnv", "n_rows"])


def q_overlay_box_areas(sf_dir: str):
    """Per-zone intersection area with a fixed clip box via the
    rectilinear overlay stage; areas recomputed from the output WKB in
    exact fixed point so the SQL twin (integer clamped-overlap
    arithmetic) matches bit-for-bit."""
    import ray.data as rd

    from spapy_ray.kernels import clip, wkb as _wkb
    from spapy_ray.stages.measures import fixed_point_multipolygon_area
    from spapy_ray.stages.overlay import overlay_with_geometry

    box = _wkb.encode_polygon([clip.bbox_ring(*OVERLAY_BOX)])
    out = overlay_with_geometry(rd.from_arrow(zones_table()), box,
                                "intersection")

    def exact_area(t: pa.Table) -> pa.Table:
        areas = [fixed_point_multipolygon_area(_wkb.as_multipolygon(g))
                 for g in t.column("geom_wkb").to_pylist()]
        return pa.table({"zone_id": t.column("zone_id"),
                         "inter_area": pa.array(areas, type=pa.float64())})

    return out.map_batches(exact_area, batch_format="pyarrow")


def q_overlay_holes_areas(sf_dir: str):
    """Multipart-with-holes zones ∩ clip box through the
    edge-classification boolean kernel (forced — the inputs are
    rectilinear, so this doubles as an exactness proof of the general
    kernel against integer arithmetic): per-zone intersection area in
    exact fixed point vs the clamped-overlap SQL twin."""
    import ray.data as rd

    from spapy_ray.kernels import clip, wkb as _wkb
    from spapy_ray.stages.measures import fixed_point_multipolygon_area
    from spapy_ray.stages.overlay import overlay_with_geometry

    box = _wkb.encode_polygon([clip.bbox_ring(*OVERLAY_BOX)])
    out = overlay_with_geometry(rd.from_arrow(zones_with_holes_table()), box,
                                "intersection", engine="edgeclass")

    def exact_area(t: pa.Table) -> pa.Table:
        areas = [fixed_point_multipolygon_area(_wkb.as_multipolygon(g))
                 for g in t.column("geom_wkb").to_pylist()]
        tt = pa.table({"zone_id": t.column("zone_id"),
                       "inter_area": pa.array(areas, type=pa.float64())})
        return tt.filter(pc.greater(tt.column("inter_area"), 0.0))

    return out.map_batches(exact_area, batch_format="pyarrow")


def q_revenue_by_nation(sf_dir: str):
    """3-way join: lineitem ⋈ supplier ⋈ nation (both small sides
    broadcast) → revenue per nation. The canonical star-schema shape:
    the fact table streams, dimensions broadcast, no shuffle until the
    final tiny groupby."""
    import pyarrow.parquet as pq

    from ray.data.aggregate import Count, Sum

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    li = _read(sf_dir, "lineitem",
               columns=["l_suppkey", "l_extendedprice", "l_discount"])

    sup = sup.set_column(0, "s_suppkey", pc.cast(sup.column("s_suppkey"), pa.int64()))
    sup = sup.set_column(1, "s_nationkey", pc.cast(sup.column("s_nationkey"), pa.int64()))
    nat = nat.set_column(0, "n_nationkey", pc.cast(nat.column("n_nationkey"), pa.int64()))

    def disc(t: pa.Table) -> pa.Table:
        return t.append_column(
            "revenue", pc.multiply(t.column("l_extendedprice"),
                                   pc.subtract(pa.scalar(1.0),
                                               t.column("l_discount"))))

    j1 = broadcast_join(li.map_batches(disc, batch_format="pyarrow"),
                        sup, key="l_suppkey", small_key="s_suppkey")
    j2 = broadcast_join(j1, nat, key="s_nationkey", small_key="n_nationkey")
    out = j2.groupby("n_name").aggregate(
        Sum("revenue", alias_name="revenue"),
        Count(alias_name="n_items")).to_pandas()
    out["revenue"] = out["revenue"].round(2)
    return out[["n_name", "revenue", "n_items"]]


def q_densify_counts(sf_dir: str):
    """Densify every zone ring to <=0.07-degree segments, report the
    per-feature ring + vertex counts. The SQL twin mirrors the
    engine's per-edge ceil(length / max_seg) in the SAME float op
    order (each coordinate divided by U first, then subtracted), so
    the counts are bit-deterministic on both sides."""
    import ray.data as rd

    from spapy_ray.kernels import wkb as _wkb
    from spapy_ray.stages.vector_ops import densify

    dn = densify(rd.from_arrow(zones_table()), max_dist=DENSIFY_MAX_SEG)

    def counts(t: pa.Table) -> pa.Table:
        n_v, n_r = [], []
        for g in t.column("geom_wkb").to_pylist():
            tname, v = _wkb.decode(g)
            mp = [v] if tname == "Polygon" else v
            n_r.append(sum(len(poly) for poly in mp))
            n_v.append(sum(len(r) for poly in mp for r in poly))
        return pa.table({
            "zone_id": pc.cast(t.column("zone_id"), pa.int64()),
            "n_rings": pa.array(n_r, type=pa.int64()),
            "n_vertices": pa.array(n_v, type=pa.int64())})

    return dn.map_batches(counts, batch_format="pyarrow")


def q_clip_zones(sf_dir: str):
    """Clip every zone to a fixed bbox (Sutherland–Hodgman against a
    convex ring), report the clipped area in integer 1e-8 deg² units.
    The SQL twin computes the rectilinear overlap exactly in fixed
    point; the engine's float shoelace is ~1e-11 accurate, 3 orders
    below the 0.5-unit rounding threshold, so the integers match."""
    import ray.data as rd

    from spapy_ray.kernels import geom as _geom
    from spapy_ray.kernels import wkb as _wkb
    from spapy_ray.stages.relate import clip_to

    bx0, by0, bx1, by1 = [c / 10000.0 for c in CLIP_BOX]
    ring = np.array([[bx0, by0], [bx1, by0], [bx1, by1], [bx0, by1]])
    out = clip_to(rd.from_arrow(zones_table()),
                  _wkb.encode_polygon([ring]))

    def areas(t: pa.Table) -> pa.Table:
        em8 = []
        for g in t.column("geom_wkb").to_pylist():
            mp = _wkb.as_multipolygon(g)
            em8.append(int(round(_geom.multipolygon_area(mp) * 1e8)))
        return pa.table({
            "zone_id": pc.cast(t.column("zone_id"), pa.int64()),
            "area_em8": pa.array(em8, type=pa.int64())})

    return out.map_batches(areas, batch_format="pyarrow")


def q_dataset_bounds(sf_dir: str):
    """Whole-dataset bounds fold over the geocoded pages (GetBounds,
    SpaVectors.py:754-782 — a sequential feature loop there, a
    partial+final min/max aggregate here)."""
    from spapy_ray.stages.measures import dataset_bounds

    row = dataset_bounds(_geo(sf_dir), cols=("lon", "lat"))
    return pd.DataFrame([{k: float(row[k])
                          for k in ("minx", "miny", "maxx", "maxy")}])


def q_shp_roundtrip(sf_dir: str):
    """Native Shapefile I/O (sources/shapefile.py — public-spec
    parser/writer, reference Load/Save: SpaVectors.py:195-281) pushed
    through the driver's value-hash gate: the zone layer is written
    to .shp/.shx/.dbf, read back, and measured. Coordinates are
    float64 in the format, the CW-outer re-orientation only reverses
    ring walks (|shoelace| invariant), and int64/string attributes
    survive the dBase round-trip typed — so bounds + fixed-point area
    of the reloaded layer must be BIT-IDENTICAL to computing them on
    the original table (oracle: q_zone_bounds_area)."""
    import os
    import tempfile

    from spapy_ray.sources import shapefile as shp
    from spapy_ray.sources.zones import zones_table
    from spapy_ray.stages.measures import measure_wkb_table

    d = tempfile.mkdtemp(prefix="spapy_shp_")
    try:
        path = os.path.join(d, "zones.shp")
        shp.write_shapefile(zones_table(), path, crs='LOCAL_CS["u2"]')
        back, _meta = shp.read_shapefile(path)
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)
    return measure_wkb_table(back).select(
        ["zone_id", "name", "minx", "miny", "maxx", "maxy", "area"])


def q_semi_pages(sf_dir: str):
    """Point-in-any-zone existence filter (semi join) — the
    broadcast-small-side form of the reference's RelateWithDataset
    OR-fold (SpaVectors.py:1148-1254) applied per row."""
    from spapy_ray.stages.relate import point_semi_join

    return point_semi_join(_geo(sf_dir), zones_table()) \
        .select_columns(["url", "warc_ts", "lang"])


def q_anti_pages(sf_dir: str):
    """Complement of q_semi_pages: pages in NO zone (anti join)."""
    from spapy_ray.stages.relate import point_semi_join

    return point_semi_join(_geo(sf_dir), zones_table(), anti=True) \
        .select_columns(["url", "warc_ts", "lang"])


def q_zone_top_pages(sf_dir: str, k: int = 3):
    """Top-k rows per key (newest 3 pages per zone, url tiebreak)
    via the combiner top-k (stages/relational.grouped_topk): each
    block ships at most k rows per key; no global sort."""
    from spapy_ray.stages.relational import grouped_topk

    rows = _join(sf_dir).select_columns(["zone_id", "url", "warc_ts"])
    out = grouped_topk(rows, "zone_id", "warc_ts", k,
                       descending=True, tie_cols=["url"])
    return out.select_columns(["zone_id", "url", "warc_ts", "rank"])


def q_sample_pages(sf_dir: str):
    """Deterministic 30% hash sample keyed on url (group-consistent:
    all copies of a url are kept or dropped together) — the
    training-corpus downsampling primitive, twin-checked through the
    same fnv1a fold DuckDB runs (kernels.hashing.sql_fnv1a)."""
    from spapy_ray.stages.relational import hash_sample

    return hash_sample(pages_dataset(sf_dir, include_html=False),
                       "url", 3, 10) \
        .select_columns(["url", "warc_ts", "lang"])


def q_overlay_grid(sf_dir: str):
    """OverlayWithDataset (SpaVectors.py pairwise overlay surface):
    zones x 12-box grid through the broadcast STRtree pair overlay
    (stages/overlay.overlay_datasets); per-pair intersection area
    recomputed from the OUTPUT WKB in exact fixed point, so the
    clamped-overlap integer SQL twin matches bit-for-bit."""
    import ray.data as rd

    from spapy_ray.kernels import wkb as _wkb
    from spapy_ray.stages.measures import fixed_point_multipolygon_area
    from spapy_ray.stages.overlay import overlay_datasets

    out = overlay_datasets(rd.from_arrow(zones_table()),
                           _grid_boxes_table(), "intersection",
                           right_key="box_id")

    def exact_area(t: pa.Table) -> pa.Table:
        areas = [fixed_point_multipolygon_area(_wkb.as_multipolygon(g))
                 for g in t.column("geom_wkb").to_pylist()]
        tt = pa.table({"zone_id": t.column("zone_id"),
                       "box_id": t.column("right_box_id"),
                       "inter_area": pa.array(areas, type=pa.float64())})
        return tt.filter(pc.greater(tt.column("inter_area"), 0.0))

    return out.map_batches(exact_area, batch_format="pyarrow")


def q_dist_join_counts(sf_dir: str, radius_deg: float = 2.0):
    """Within-distance (range) self-join: for every geocoded page, the
    number of other pages within 2 degrees (planar, exact fixed-point
    predicate). Grid co-partition with cell width == radius, one
    bucketed shuffle, per-cell numpy broadcast — the operator class
    the brief names as "range join" (stages/distjoin.py)."""
    from spapy_ray.stages.distjoin import within_distance_count

    geo = _geo(sf_dir).select_columns(["url", "warc_ts", "lat", "lon"])
    return within_distance_count(geo, radius_deg=radius_deg)


def q_geojson_roundtrip(sf_dir: str):
    """Native GeoJSON I/O (sources/geojson.py — RFC 7946, stdlib json;
    reference Load/Save keeps fiona's driver, SpaVectors.py:208,263)
    through the driver's value-hash gate: zones → .geojson → read
    back → bounds + fixed-point area. JSON doubles use shortest-repr
    serialization, so coordinates round-trip exactly and the result
    must be BIT-IDENTICAL to measuring the original layer (oracle:
    q_zone_bounds_area)."""
    import os
    import shutil
    import tempfile

    from spapy_ray.sources import geojson as gj
    from spapy_ray.sources.zones import zones_table
    from spapy_ray.stages.measures import measure_wkb_table

    d = tempfile.mkdtemp(prefix="spapy_gj_")
    try:
        path = os.path.join(d, "zones.geojson")
        gj.write_geojson(zones_table(), path)
        back, _meta = gj.read_geojson(path)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return measure_wkb_table(back).select(
        ["zone_id", "name", "minx", "miny", "maxx", "maxy", "area"])


def q_tile_pyramid(sf_dir: str):
    """Tile-count pyramid res 7..3 (stages/cellindex.tile_pyramid):
    one combiner count at the fine level, one roll-up groupby for all
    coarser levels. The oracle recomputes every level directly from
    the raw points, so the hash check proves the roll-up identity."""
    from spapy_ray.stages.cellindex import tile_pyramid

    return tile_pyramid(_geo(sf_dir), res_hi=7, res_lo=3)


def q_sample_stratified(sf_dir: str):
    """Per-language deterministic downsampling (corpus rebalancing:
    halve the dominant language, keep progressively more of the rare
    ones) — stages/relational.hash_sample_stratified; same fnv1a fold
    as the oracle, group-consistent on url."""
    from spapy_ray.stages.relational import hash_sample_stratified

    rates = {"en": (1, 2), "es": (1, 4), "de": (1, 8), "fr": (3, 16)}
    return hash_sample_stratified(
        pages_dataset(sf_dir, include_html=False), "url", "lang",
        rates, default=(1, 16)) \
        .select_columns(["url", "warc_ts", "lang"])


def q_orders_lineitem_join(sf_dir: str):
    """Big x big hash equijoin (stages/relational.hash_join): lineitem
    x orders on the order key, one union + one bucket shuffle, no
    broadcast bound and no native-join actor pools."""
    from spapy_ray.stages.relational import hash_join

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_extendedprice"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderpriority"])
    out = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey")
    return out.select_columns(["l_orderkey", "l_linenumber",
                               "l_extendedprice", "o_orderpriority"])


def q_customers_without_orders(sf_dir: str):
    """Relational anti-join through hash_join(how='anti'): customers
    with no FINISHED ('F') orders — the typed-exact left-only form of
    the bucket equijoin (every customer has SOME order in the
    fixture, so the right side is status-filtered to keep the result
    non-trivial)."""
    from spapy_ray.stages.relational import hash_join, select_where

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    orders = select_where(
        _read(sf_dir, "orders", columns=["o_custkey", "o_orderstatus"]),
        "o_orderstatus", "==", "F").select_columns(["o_custkey"])
    return hash_join(cust, orders, on="c_custkey", right_on="o_custkey",
                     how="anti")


def q_order_priority_revenue(sf_dir: str):
    """TPC-H-Q3-shaped chain: big x big equijoin (lineitem x orders
    through relational.hash_join — union + ONE bucket shuffle), then
    a discounted-revenue groupby over the 5 priority classes (partial
    per-block Sum/Count, rounded to 2dp like every float-sum twin)."""
    from ray.data.aggregate import Count, Sum

    from spapy_ray.stages.relational import hash_join

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderpriority"])

    def revenue(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return pa.table({"o_orderpriority": t.column("o_orderpriority"),
                         "rev": rev})

    joined = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey") \
        .map_batches(revenue, batch_format="pyarrow")
    agg = joined.groupby("o_orderpriority").aggregate(
        Sum("rev", alias_name="revenue"), Count(alias_name="n_items"))

    def finish(t: pa.Table) -> pa.Table:
        return t.set_column(t.column_names.index("revenue"), "revenue",
                            pc.round(t.column("revenue"), 2))

    return agg.map_batches(finish, batch_format="pyarrow")


def q_customer_order_balance(sf_dir: str):
    """Full-outer equijoin of two per-customer aggregates with
    partially disjoint key sets (F-only and P-only customers exist on
    both sides) — exercises hash_join(how="outer"); keys and counts
    coalesced back to typed-exact int64."""
    from ray.data.aggregate import Count

    from spapy_ray.stages.relational import hash_join, select_where

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderstatus"])
    f = select_where(orders, "o_orderstatus", "==", "F") \
        .groupby("o_custkey").aggregate(Count(alias_name="n_f"))
    p = select_where(orders, "o_orderstatus", "==", "P") \
        .groupby("o_custkey").aggregate(Count(alias_name="n_p"))
    j = hash_join(f, p, on="o_custkey", how="outer")

    def finish(t: pa.Table) -> pa.Table:
        ck = pc.cast(pc.coalesce(t.column("o_custkey"),
                                 t.column("o_custkey_r")), pa.int64())
        nf = pc.cast(pc.fill_null(t.column("n_f"), 0), pa.int64())
        np_ = pc.cast(pc.fill_null(t.column("n_p"), 0), pa.int64())
        return pa.table({"custkey": ck, "n_f": nf, "n_p": np_})

    return j.map_batches(finish, batch_format="pyarrow")


def q_dist_join_pairs(sf_dir: str, radius_deg: float = 0.05):
    """Pair-returning range join (distjoin.within_distance_pairs):
    every unordered page pair within 0.05° plus its exact integer
    squared distance — the join-output form of dist_join_counts
    (same grid co-partition; pairs emit once per unordered pair by
    the key_a < key_b rule on the url, which both sides share)."""
    from spapy_ray.stages.distjoin import within_distance_pairs

    geo = _geo(sf_dir).select_columns(["url", "lat", "lon"])
    return within_distance_pairs(geo, radius_deg=radius_deg,
                                 key_col="url")


def q_shp_stream_roundtrip(sf_dir: str):
    """.shx-indexed DISTRIBUTED shapefile ingest (VERDICT r3 #6,
    sources/shapefile.read_shapefile_dataset: the driver reads only
    the record index, workers seek-and-parse their .shp/.dbf ranges)
    pushed through the value-hash gate: zones written to
    .shp/.shx/.dbf, read back through the streaming reader with
    batch_rows=64 (so the 200-feature layer really spans multiple
    fetch tasks), measured. Same bit-exact twin as shp_roundtrip
    (oracle: q_zone_bounds_area)."""
    import os
    import shutil
    import tempfile

    import ray

    from spapy_ray.sources import shapefile as shp
    from spapy_ray.sources.zones import zones_table
    from spapy_ray.stages.measures import measure_wkb_table

    d = tempfile.mkdtemp(prefix="spapy_shps_")
    try:
        path = os.path.join(d, "zones.shp")
        shp.write_shapefile(zones_table(), path, crs='LOCAL_CS["u2"]')
        ds, _meta = shp.read_shapefile_dataset(path, batch_rows=64)
        # workers seek into the files lazily — materialize the rows
        # before the temp dir goes away
        back = pa.concat_tables(ray.get(ds.to_arrow_refs()))
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return measure_wkb_table(back).select(
        ["zone_id", "name", "minx", "miny", "maxx", "maxy", "area"])


def q_voronoi_sites(sf_dir: str):
    """Discrete-Voronoi nearest-site assignment: every geocoded page
    assigned to the nearest of 64 deterministic lattice sites (exact
    int64 fixed-point distance, ties → lowest site id), rolled up per
    site (n_points, sum of d2 // 1e4). Broadcast pattern — no shuffle
    for the assignment, combiner partials for the rollup."""
    from spapy_ray.stages.voronoi import grid_sites, site_assignment_stats

    sid, slat5, slon5 = grid_sites()
    geo = _geo(sf_dir).select_columns(["lat", "lon"])
    return site_assignment_stats(geo, sid, slat5, slon5)


def q_dissolve_area(sf_dir: str):
    """Dissolve-by-attribute (labelrank) union area: per-feature rect
    decomposition → ONE hash(key) shuffle of (key, 4 int64) rows →
    per-group vectorized x-slab sweep (O(P log P), no coordinate
    mask grid). Exact 1e-8 deg² integers."""
    import ray.data as rd

    from spapy_ray.stages.overlay import dissolve_union_area

    def with_key(t: pa.Table) -> pa.Table:
        return t.select(["labelrank", "geom_wkb"])

    ds = rd.from_arrow(zones_table()).map_batches(
        with_key, batch_format="pyarrow")
    return dissolve_union_area(ds, "labelrank")


def q_join_counts(sf_dir: str):
    """Rook join-count spatial autocorrelation of the geocoded-page
    occupancy grid (1-degree world lattice): occupied-cell fold, black
    cells probe their east/south neighbors through one small bucket
    shuffle, BW from the degree identity (stages/spatialstats.py)."""
    from spapy_ray.stages.spatialstats import grid_join_counts

    geo = _geo(sf_dir).select_columns(["lat", "lon"])
    return grid_join_counts(geo)


def q_customers_bloom_anti(sf_dir: str):
    """The customers_without_orders anti-join through the BLOOM
    prefilter path (relational.bloom_filter_join): probe rows failing
    the filter stream straight to output with no shuffle; only the
    filter-passing minority runs the exact bucketed anti join. Same
    SQL twin — exactness is unconditional (no false negatives)."""
    from spapy_ray.stages.relational import bloom_filter_join, \
        select_where

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    orders = select_where(
        _read(sf_dir, "orders", columns=["o_custkey", "o_orderstatus"]),
        "o_orderstatus", "==", "F").select_columns(["o_custkey"])
    return bloom_filter_join(cust, orders, on="c_custkey",
                             right_on="o_custkey", how="anti")


def q_dataset_split(sf_dir: str):
    """Deterministic 80/10/10 train/val/test assignment keyed by url
    (group-consistent: duplicate urls cannot straddle splits), folded
    to per-(split, lang) counts (relational.hash_split)."""
    from ray.data.aggregate import Count

    from spapy_ray.stages.relational import hash_split

    pages = pages_dataset(sf_dir, include_html=False)
    split = hash_split(pages, "url",
                       {"train": 80, "val": 10, "test": 10})
    return split.groupby(["split", "lang"]).aggregate(
        Count(alias_name="n_pages"))


def q_late_shipments(sf_dir: str):
    """Late-shipment rate per order priority (TPC-H Q12 shape over
    the columns this schema carries): big x big hash_join on
    orderkey, per-batch lateness flag in integer microseconds,
    combiner-folded counts."""
    from spapy_ray.stages.relational import hash_join, \
        pre_aggregated_sums

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    j = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey")

    late_us = 30 * 86_400_000_000

    def flag(t: pa.Table) -> pa.Table:
        ship = pc.cast(t.column("l_shipdate"), pa.int64())
        ordr = pc.cast(t.column("o_orderdate"), pa.int64())
        late = pc.cast(
            pc.greater(pc.subtract(ship, ordr), pa.scalar(late_us)),
            pa.int64())
        return pa.table({"o_orderpriority": t.column("o_orderpriority"),
                         "late": late})

    out = pre_aggregated_sums(j.map_batches(flag, batch_format="pyarrow"),
                              ["o_orderpriority"], ["late"],
                              count_alias="n_items").to_pandas()
    out["n_late"] = out["late"].astype(np.int64)
    return out[["o_orderpriority", "n_late", "n_items"]]


def q_returned_customers(sf_dir: str, k: int = 20):
    """Top-20 customers by returned-item revenue (TPC-H Q10 shape):
    returnflag filter at the read -> per-order combiner partials ->
    ONE hash_join with orders -> per-customer fold -> customer name
    broadcast -> deterministic sort+limit."""
    from ray.data.aggregate import Count, Sum

    from spapy_ray.stages.relational import hash_join, select_where

    import pyarrow.dataset as pds

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice",
                        "l_discount"],
               predicate=pds.field("l_returnflag") == "R")
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(t.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return pa.table({"l_orderkey": t.column("l_orderkey"), "rev": r})

    j = hash_join(li.map_batches(rev, batch_format="pyarrow"), orders,
                  on="l_orderkey", right_on="o_orderkey")
    per_cust = j.groupby("o_custkey").aggregate(
        Sum("rev", alias_name="revenue"), Count(alias_name="n_items"))

    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name"])
    named = broadcast_join(per_cust, cust, key="o_custkey",
                           small_key="c_custkey")
    out = named.sort(["revenue", "o_custkey"],
                     descending=[True, False]).limit(k).to_pandas()
    out["revenue"] = out["revenue"].round(2)
    out = out.rename(columns={"o_custkey": "custkey"})
    return out[["custkey", "c_name", "revenue", "n_items"]]


def q_priority_flag_chi2(sf_dir: str):
    """Chi-square association between order priority and return flag
    (relational.chi2_assoc over the orderkey hash_join): exact
    integer contingency + floor-quantized per-cell statistic."""
    from spapy_ray.stages.relational import chi2_assoc, hash_join

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_returnflag"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderpriority"])
    j = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey")
    out = chi2_assoc(j, "o_orderpriority", "l_returnflag")
    return out.sort_values(["o_orderpriority", "l_returnflag"]) \
        .reset_index(drop=True)


def q_nation_revenue_share(sf_dir: str):
    """Percent-of-total in exact integers: per-nation revenue in
    CENTS (2-dp money x100 is exact int64) plus the floor-quantized
    share share_q = (rev_cents * 1e6) // total_cents — no float
    division on either side. Reuses the revenue_by_nation join
    chain; the share fold runs on the tiny folded table."""
    from ray.data.aggregate import Sum

    from spapy_ray.stages.relational import hash_join

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey"])
    j = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey")

    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    cust = pa.table({
        "c_custkey": pc.cast(cust.column("c_custkey"), pa.int64()),
        "c_nationkey": pc.cast(cust.column("c_nationkey"), pa.int64())})
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    nat = pa.table({
        "n_nationkey": pc.cast(nat.column("n_nationkey"), pa.int64()),
        "n_name": nat.column("n_name")})
    j = broadcast_join(j, cust, key="o_custkey",
                       small_key="c_custkey")
    j = broadcast_join(j, nat, key="c_nationkey",
                       small_key="n_nationkey")

    def cents(t: pa.Table) -> pa.Table:
        c = np.rint(t.column("l_extendedprice")
                    .to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        return pa.table({"n_name": t.column("n_name"),
                         "cents": pa.array(c)})

    out = j.map_batches(cents, batch_format="pyarrow") \
        .groupby("n_name").aggregate(
            Sum("cents", alias_name="rev_cents")).to_pandas()
    total = int(out["rev_cents"].sum())
    out["rev_cents"] = out["rev_cents"].astype(np.int64)
    out["share_q"] = np.asarray(
        [(int(c) * 1_000_000) // total for c in out["rev_cents"]],
        dtype=np.int64)
    return out.sort_values("n_name").reset_index(drop=True)


def q_shipping_delay_iqr(sf_dir: str):
    """Fulfilment-latency dispersion per order priority: exact
    quartiles/IQR of (shipdate - orderdate) in integer days through
    the x2 rank-pair convention (hash_join + grouped_quartiles
    composition)."""
    from spapy_ray.stages.relational import (grouped_quartiles,
                                             hash_join)

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate",
                            "o_orderpriority"])
    j = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey")

    def delay(t: pa.Table) -> pa.Table:
        d = (pc.cast(t.column("l_shipdate"), pa.int64())
             .to_numpy(zero_copy_only=False)
             - pc.cast(t.column("o_orderdate"), pa.int64())
             .to_numpy(zero_copy_only=False)) // 86_400_000_000
        return pa.table({
            "o_orderpriority": t.column("o_orderpriority"),
            "delay_days": pa.array(d.astype(np.float64))})

    out = grouped_quartiles(
        j.map_batches(delay, batch_format="pyarrow"),
        "o_orderpriority", "delay_days").to_pandas()
    for c in ("q1_x2", "q3_x2", "iqr_x2"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def q_nation_year_flag_rollup(sf_dir: str):
    """Three-dimension ROLLUP (nation, year, returnflag): the k=3
    prefix-level path of relational.grouped_rollup — still ONE
    combiner shuffle, three derived super-levels."""
    from spapy_ray.stages.relational import grouped_rollup, hash_join

    import pyarrow.parquet as pq

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_quantity",
                        "l_returnflag"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate"])
    j = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey")

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    sup = pa.table({
        "s_suppkey": pc.cast(sup.column("s_suppkey"), pa.int64()),
        "s_nationkey": pc.cast(sup.column("s_nationkey"),
                               pa.int64())})
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    nat = pa.table({
        "n_nationkey": pc.cast(nat.column("n_nationkey"), pa.int64()),
        "n_name": nat.column("n_name")})
    j = broadcast_join(j, sup, key="l_suppkey", small_key="s_suppkey")
    j = broadcast_join(j, nat, key="s_nationkey",
                       small_key="n_nationkey")

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": t.column("n_name"),
            "year": pc.year(t.column("o_orderdate")),
            "flag": t.column("l_returnflag"),
            "l_quantity": t.column("l_quantity")})

    out = grouped_rollup(j.map_batches(proj, batch_format="pyarrow"),
                         ["n_name", "year", "flag"], "l_quantity",
                         sentinels={"n_name": "ALL", "year": -1,
                                    "flag": "ALL"},
                         count_alias="n_items")
    out["sum_qty"] = out["l_quantity"].round().astype(np.int64)
    out["year"] = out["year"].astype(np.int64)
    return out[["n_name", "year", "flag", "sum_qty", "n_items"]]


def q_areal_interp(sf_dir: str):
    """Dasymetric re-basing of the spatial-join result: per-zone page
    counts (pip_join + combiner) allocated onto the 1-degree grid by
    exact zone-cell intersection-area weights
    (stages.overlay.areal_transfer — zones broadcast once, the grid
    streams, no shuffle)."""
    from spapy_ray.stages.overlay import areal_transfer
    from spapy_ray.stages.relational import pre_aggregated_count

    cnt = pre_aggregated_count(_join(sf_dir), "zone_id",
                               alias="n_pages").to_pandas()
    weights = dict(zip(cnt["zone_id"].astype(int),
                       cnt["n_pages"].astype(int)))
    out = areal_transfer(zones_table(), weights)

    def typed(t: pa.Table) -> pa.Table:
        return pa.table({c: pc.cast(t.column(c), pa.int64())
                         for c in t.column_names})

    return out.map_batches(typed, batch_format="pyarrow")


def q_geohash_index(sf_dir: str):
    """Geohash-6 cell ids for every geocoded page — the
    interoperable export twin of the internal quadkey index
    (kernels.cells.geohash_encode; one Morton interleave, pure
    integer ops after quantization)."""
    from spapy_ray.kernels.cells import geohash_encode

    geo = _geo(sf_dir)

    def gh(t: pa.Table) -> pa.Table:
        lon = t.column("lon").to_numpy(zero_copy_only=False)
        lat = t.column("lat").to_numpy(zero_copy_only=False)
        return pa.table({
            "url": t.column("url"), "warc_ts": t.column("warc_ts"),
            "gh": pa.array(geohash_encode(lon, lat, 6))})

    return geo.map_batches(gh, batch_format="pyarrow")


def q_quality_gate(sf_dir: str):
    """Data-contract gate in one result: FK orphans (lineitem ->
    orders anti join), duplicate primary keys, and rows-per-check
    totals — the CI check a warehouse runs before publishing a
    snapshot. Composes hash_join(anti) + combiner counts."""
    from ray.data.aggregate import Sum

    from spapy_ray.stages.relational import hash_join

    li = _read(sf_dir, "lineitem", columns=["l_orderkey"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey"])

    orphans = hash_join(
        li, orders.map_batches(
            lambda t: t.rename_columns(["l_orderkey"]),
            batch_format="pyarrow"),
        on="l_orderkey", how="anti").count()

    def pre(t: pa.Table) -> pa.Table:
        vc = t.column("o_orderkey").value_counts()
        return pa.table({
            "k": vc.field("values"),
            "c": pc.cast(vc.field("counts"), pa.int64())})

    keys = orders.map_batches(pre, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("c", alias_name="c"))
    dup_rows = keys.filter(expr="c > 1")
    n_dup_keys = dup_rows.count()
    n_rows = li.count()
    return pd.DataFrame({
        "check": ["fk_orphan_lineitems", "dup_order_keys",
                  "lineitem_rows"],
        "n": np.array([orphans, n_dup_keys, n_rows],
                      dtype=np.int64)})


def q_cell_smoothing(sf_dir: str):
    """Sparse focal sum over the occupancy grid: every occupied
    1-degree cell's count plus its 8 neighbors' counts (spatial
    smoothing of page density) — each cell's count emits to its 9
    neighbor keys (a 9x fan-out of the COUNTS table, never the
    points), one combiner shuffle, output restricted to occupied
    cells."""
    from ray.data.aggregate import Sum

    geo = _geo(sf_dir)
    NX, NY = 360, 170

    def cells(t: pa.Table) -> pa.Table:
        lon = t.column("lon").to_numpy(zero_copy_only=False)
        lat = t.column("lat").to_numpy(zero_copy_only=False)
        gx = np.floor(lon + 180.0).astype(np.int64)
        gy = np.floor(lat + 85.0).astype(np.int64)
        ok = (gx >= 0) & (gx < NX) & (gy >= 0) & (gy < NY)
        cell = gy[ok] * NX + gx[ok]
        u, c = np.unique(cell, return_counts=True)
        return pa.table({"cell": pa.array(u),
                         "c": pa.array(c.astype(np.int64))})

    counts = geo.map_batches(cells, batch_format="pyarrow") \
        .groupby("cell").aggregate(Sum("c", alias_name="c")) \
        .materialize()

    def fan(t: pa.Table) -> pa.Table:
        cell = t.column("cell").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        c = t.column("c").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        gx, gy = cell % NX, cell // NX
        outs, occ = [], []
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                nx_, ny_ = gx + dx, gy + dy
                ok = (nx_ >= 0) & (nx_ < NX) & (ny_ >= 0) & (ny_ < NY)
                outs.append(pa.table({
                    "cell": pa.array(ny_[ok] * NX + nx_[ok]),
                    "sm": pa.array(c[ok]),
                    "own": pa.array((c * (dx == 0 and dy == 0))[ok])}))
        return pa.concat_tables(outs)

    sm = counts.map_batches(fan, batch_format="pyarrow") \
        .groupby("cell").aggregate(Sum("sm", alias_name="sm"),
                                   Sum("own", alias_name="own"))

    def fin(t: pa.Table) -> pa.Table:
        keep = pc.greater(t.column("own"), 0)
        t = t.filter(keep)
        return pa.table({
            "cell": pc.cast(t.column("cell"), pa.int64()),
            "n_pages": pc.cast(t.column("own"), pa.int64()),
            "n_smooth": pc.cast(t.column("sm"), pa.int64())})

    return sm.map_batches(fin, batch_format="pyarrow")


def q_vector_tiles(sf_dir: str):
    """Vector tile cutting (the MVT pipeline step): every zone
    clipped to a 10x5 grid of 36 x 34 degree tiles, reporting the
    exact clipped area per (tile, zone) — zones decode once to
    integer rects and broadcast; the tile grid streams; pure
    box-intersection arithmetic (same decomposition as
    areal_transfer, but emitting the per-pair rows a tile renderer
    consumes)."""
    import ray
    import ray.data as rd

    from spapy_ray.kernels.rectilinear import multipolygon_to_rects
    from spapy_ray.kernels.wkb import as_multipolygon

    U = 10_000
    NX, NY = 10, 5
    SX, SY = 360_000, 340_000           # 36 deg x 34 deg in units
    X0, Y0 = -1_800_000, -850_000
    zt = zones_table()
    rx0, ry0, rx1, ry1 = [], [], [], []
    seg, zid_l = [0], []
    for zid, buf in zip(zt.column("zone_id").to_pylist(),
                        zt.column("geom_wkb").to_pylist()):
        r = np.rint(np.asarray(
            multipolygon_to_rects(as_multipolygon(bytes(buf))),
            np.float64) * U).astype(np.int64)
        rx0.append(r[:, 0]); ry0.append(r[:, 1])
        rx1.append(r[:, 2]); ry1.append(r[:, 3])
        seg.append(seg[-1] + len(r))
        zid_l.append(int(zid))
    pack = (np.concatenate(rx0), np.concatenate(ry0),
            np.concatenate(rx1), np.concatenate(ry1),
            np.asarray(seg[:-1], np.int64),
            np.asarray(zid_l, np.int64))
    ref = ray.put(pack)

    def per_batch(t: pa.Table) -> pa.Table:
        ax0, ay0, ax1, ay1, starts, zids = ray.get(ref)
        p = t.column("id").to_numpy().astype(np.int64)
        gx, gy = p % NX, p // NX
        cx0 = X0 + gx * SX
        cy0 = Y0 + gy * SY
        ix = (np.minimum(ax1[None, :], (cx0 + SX)[:, None])
              - np.maximum(ax0[None, :], cx0[:, None])).clip(min=0)
        iy = (np.minimum(ay1[None, :], (cy0 + SY)[:, None])
              - np.maximum(ay0[None, :], cy0[:, None])).clip(min=0)
        inter = np.add.reduceat(ix * iy, starts, axis=1)
        ti, zi = np.nonzero(inter)
        return pa.table({
            "tile": pa.array(p[ti]),
            "zone_id": pa.array(zids[zi]),
            "area_u": pa.array(inter[ti, zi])})

    return rd.range(NX * NY).map_batches(per_batch,
                                         batch_format="pyarrow",
                                         batch_size=64)


def q_local_supplier_revenue(sf_dir: str):
    """TPC-H Q5 shape — local supplier volume: revenue from ASIA-
    region lineitems where the ordering customer and the supplier
    share a nation, orders from calendar-1996. Join plan is the
    scale-canonical mix: DATE predicate pushed into the orders scan,
    customer attached with one bucketed hash_join, the fact table
    (lineitem) probes that result in the ONE big hash_join, supplier
    + nation ride as broadcast lookups, and the revenue fold is a
    per-batch combiner into a 5-row groupby. Revenue is exact integer
    cents x (100 - discount_pct): revenue_u = sum(cents * (100 - d)).
    """
    import pyarrow.parquet as pq
    import pyarrow.dataset as pds

    from ray.data.aggregate import Sum

    from spapy_ray.stages.relational import broadcast_join, hash_join

    t0 = pd.Timestamp("1996-01-01")
    t1 = pd.Timestamp("1997-01-01")
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"],
                   predicate=(pds.field("o_orderdate") >= t0)
                   & (pds.field("o_orderdate") < t1))
    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey"])
    oc = hash_join(orders, cust, on="o_custkey",
                   right_on="c_custkey") \
        .select_columns(["o_orderkey", "c_nationkey"])

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount"])
    j = hash_join(li, oc, on="l_orderkey", right_on="o_orderkey")

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    sup = pa.table({"s_suppkey": pc.cast(sup.column("s_suppkey"),
                                         pa.int64()),
                    "s_nationkey": pc.cast(sup.column("s_nationkey"),
                                           pa.int64())})
    js = broadcast_join(j, sup, key="l_suppkey",
                        small_key="s_suppkey")

    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    asia = int(reg.filter(pc.equal(reg.column("r_name"),
                                   "ASIA")).column("r_regionkey")[0]
               .as_py())
    nmap = {int(k): (str(n), int(r)) for k, n, r in zip(
        nat.column("n_nationkey").to_pylist(),
        nat.column("n_name").to_pylist(),
        nat.column("n_regionkey").to_pylist())}
    keys = np.array(sorted(nmap), dtype=np.int64)
    names = np.array([nmap[k][0] for k in keys])
    in_asia = np.array([nmap[k][1] == asia for k in keys])

    def fold(t: pa.Table) -> pa.Table:
        cn = t.column("c_nationkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sn = t.column("s_nationkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pos = np.searchsorted(keys, sn)
        m = (cn == sn) & in_asia[pos]
        cents = np.rint(t.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False)[m] * 100) \
            .astype(np.int64)
        d = np.rint(t.column("l_discount")
                    .to_numpy(zero_copy_only=False)[m] * 100) \
            .astype(np.int64)
        rev = cents * (100 - d)
        u, inv = np.unique(sn[m], return_inverse=True)
        s = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, rev)
        return pa.table({"n_name": pa.array(
            names[np.searchsorted(keys, u)]),
            "revenue_u": pa.array(s)})

    return js.map_batches(fold, batch_format="pyarrow") \
        .groupby("n_name") \
        .aggregate(Sum("revenue_u", alias_name="revenue_u"))


def q_ripley_pairs(sf_dir: str):
    """Ripley's-K pair counts of the geocoded corpus at radii
    0.1/0.25/0.5 degrees: ONE range-join-shaped shuffle whose buckets
    fold straight into a 3-row histogram (ordered pairs, self-matches
    subtracted) — the point-pattern clustering summary
    (stages/distjoin.pair_distance_histogram)."""
    from spapy_ray.stages.distjoin import pair_distance_histogram

    geo = _geo(sf_dir).select_columns(["url", "warc_ts", "lat",
                                       "lon"])
    return pair_distance_histogram(geo, radii_deg=[0.1, 0.25, 0.5])


def q_zone_compactness(sf_dir: str):
    """Per-zone shape compactness audit: exact integer perimeter
    (fixed_point_multipolygon_perimeter over the WKB rings) + the
    doubled shoelace area, and the isoperimetric-style quotient
    compact_q = 10^6 * area_u2 // perim_u^2 — all closed-form in the
    twin (L-ring perimeter == bounding rect's 2(w+h); the two-rect
    MultiPolygon sums both boxes)."""
    from spapy_ray.kernels import wkb as kwkb
    from spapy_ray.stages.measures import (
        fixed_point_multipolygon_perimeter)

    z = zones_table()
    perim = np.empty(len(z), dtype=np.int64)
    area2 = np.empty(len(z), dtype=np.int64)
    for i, g in enumerate(z.column("geom_wkb").to_pylist()):
        mp = kwkb.as_multipolygon(g)
        perim[i] = fixed_point_multipolygon_perimeter(mp)
        a2 = 0
        for poly in mp:
            for j, ring in enumerate(poly):
                r = np.rint(np.asarray(ring, dtype=np.float64)
                            * 10000).astype(np.int64)
                if len(r) > 1 and (r[0] == r[-1]).all():
                    r = r[:-1]
                x, y = r[:, 0], r[:, 1]
                s2 = abs(int(np.sum(x * np.roll(y, -1)
                                    - np.roll(x, -1) * y)))
                a2 += s2 if j == 0 else -s2
        area2[i] = a2
    return pd.DataFrame({
        "zone_id": z.column("zone_id").to_numpy(),
        "perim_u": perim,
        "area_u2": area2 // 2,
        "compact_q": 1_000_000 * (area2 // 2) // (perim * perim)})


def q_open_orders(sf_dir: str):
    """Order backlog curve: an order is open from o_orderdate until
    its last lineitem ships (inclusive, day grain); the result is
    the per-month MAXIMUM simultaneously-open order count — the
    interval-concurrency primitive (sessions.interval_concurrency,
    the ordered-global-prefix machinery on time windows) fed by a
    combiner-first grouped max + one hash_join."""
    from spapy_ray.stages.relational import (bucketed_group_agg,
                                             hash_join)
    from spapy_ray.stages.sessions import interval_concurrency

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_shipdate"])

    def pre(t: pa.Table) -> pa.Table:
        k = t.column("l_orderkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        s = pc.cast(t.column("l_shipdate"), pa.int64()).to_numpy()
        u, inv = np.unique(k, return_inverse=True)
        m = np.full(len(u), np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(m, inv, s)
        return pa.table({"l_orderkey": pa.array(u),
                         "cl": pa.array(m)})

    def local(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("l_orderkey", as_index=False,
                         sort=False)["cl"].max()

    mx = bucketed_group_agg(li.map_batches(pre,
                                           batch_format="pyarrow"),
                            "l_orderkey", local)
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate"])
    j = hash_join(orders, mx, on="o_orderkey",
                  right_on="l_orderkey")

    def iv(t: pa.Table) -> pa.Table:
        return pa.table({
            "t_open": pc.cast(t.column("o_orderdate"), pa.int64()),
            "t_close": pa.array(
                t.column("cl").to_numpy(zero_copy_only=False)
                .astype(np.int64) + 86_400_000_000)})

    return interval_concurrency(
        j.map_batches(iv, batch_format="pyarrow"))


def q_hilbert_index(sf_dir: str, order: int = 16):
    """Hilbert-curve partition key for every geocoded page (order-16
    grid): the locality-preserving alternative to the Morton quadkey
    — consecutive key ranges stay spatially contiguous through
    quadrant corners, so range-partitioning 100 TB by hkey gives
    tighter per-shard bounding boxes than the interleave
    (kernels.cells.hilbert_d, pure int64 vector walk)."""
    from spapy_ray.kernels.cells import hilbert_d, xy_for

    geo = _geo(sf_dir)

    def hk(t: pa.Table) -> pa.Table:
        lon = t.column("lon").to_numpy(zero_copy_only=False)
        lat = t.column("lat").to_numpy(zero_copy_only=False)
        x, y = xy_for(lon, lat, order)
        return pa.table({
            "url": t.column("url"), "warc_ts": t.column("warc_ts"),
            "hkey": pa.array(hilbert_d(x, y, order))})

    return geo.map_batches(hk, batch_format="pyarrow")


def q_quadtree_leaves(sf_dir: str):
    """Adaptive quadtree layout of the geocoded corpus (cap 512,
    max res 8): the skew-adaptive partitioning primitive — the
    fixture's 70%-hot antimeridian column splits to max depth while
    empty ocean stays coarse (stages/partition.quadtree_leaves: one
    bucketed count fold + numpy ancestor walk)."""
    from spapy_ray.stages.partition import quadtree_leaves

    geo = _geo(sf_dir).select_columns(["lat", "lon"])
    return quadtree_leaves(geo, max_res=8, cap=512)


def q_cross_ripley(sf_dir: str):
    """Bivariate Ripley's-K: pair counts between TEXT-geocoded pages
    (the sparse precise class) and URL-geocoded pages (the dense
    fallback class) at 0.1/0.25/0.5 degrees — do the two geocoding
    sources co-locate? (distjoin.cross_pair_distance_histogram —
    disjoint classes, no self term)."""
    from spapy_ray.stages.distjoin import cross_pair_distance_histogram
    from spapy_ray.stages.relational import select_where

    geo = _geo(sf_dir).select_columns(["lat", "lon", "geo_src"])
    a = select_where(geo, "geo_src", "==", "text")
    b = select_where(geo, "geo_src", "==", "url")
    return cross_pair_distance_histogram(
        a, b, radii_deg=[0.1, 0.25, 0.5])


def q_url_bloom(sf_dir: str):
    """Bloom filter of the corpus URL set as an exported artifact
    (2^20 bits, 4 hashes from the count_min family): mergeable-by-OR
    partials, shuffle-free fold — the membership sketch a crawler
    ships to dedup against previous crawls. Every nonzero word is
    reproduced by the twin (relational.bloom_bits)."""
    from spapy_ray.stages.relational import bloom_bits

    pages = pages_dataset(sf_dir, include_html=False) \
        .select_columns(["url"])
    return bloom_bits(pages, "url")


def q_zone_coocc(sf_dir: str):
    """Zone co-occurrence graph: pairs of zones hit by the SAME page
    (the overlapping-zone multi-hit rows of the PIP join), with
    shared-page counts — the spatial-overlap adjacency audit.
    Composition: pip_join → within_group_pairs over the page key →
    combiner pair counts."""
    from ray.data.aggregate import Sum

    from spapy_ray.stages.relational import within_group_pairs

    j = _join(sf_dir).select_columns(["url", "warc_ts", "zone_id"])

    def pk(t: pa.Table) -> pa.Table:
        from spapy_ray.kernels.hashing import fnv1a64

        # one int key per page row: fnv(url) xor ts (urls unique per
        # warc_ts in the fixture; the pair group key just needs to be
        # injective per page)
        h = fnv1a64(t.column("url"))
        ts = pc.cast(t.column("warc_ts"), pa.int64()).to_numpy()
        return pa.table({
            "pg": pa.array((h ^ ts.view(np.uint64)).view(np.int64)),
            "zone_id": t.column("zone_id")})

    pairs = within_group_pairs(
        j.map_batches(pk, batch_format="pyarrow"), "pg", "zone_id",
        out_a="za", out_b="zb")

    def cnt(t: pa.Table) -> pa.Table:
        za = t.column("za").to_numpy(zero_copy_only=False)
        zb = t.column("zb").to_numpy(zero_copy_only=False)
        k = za * np.int64(1 << 32) + zb
        u, c = np.unique(k, return_counts=True)
        return pa.table({
            "za": pa.array((u >> np.int64(32)).astype(np.int64)),
            "zb": pa.array((u & np.int64(0xFFFFFFFF))
                           .astype(np.int64)),
            "n_pages": pa.array(c.astype(np.int64))})

    return pairs.map_batches(cnt, batch_format="pyarrow") \
        .groupby(["za", "zb"]).aggregate(
            Sum("n_pages", alias_name="n_pages"))


def q_point_pyramid(sf_dir: str, max_res: int = 8):
    """Web-map point-count pyramid: occupied-cell page counts at
    EVERY resolution 0..8 in one pass — finest-cell bucketed counts,
    then pure numpy ancestor folds on the occupied set (the vector
    sibling of raster_overviews; shares the quadtree machinery's
    driver-small occupied-cell bound)."""
    from spapy_ray.kernels.cells import xy_for
    from spapy_ray.stages.relational import bucketed_group_agg

    geo = _geo(sf_dir).select_columns(["lat", "lon"])
    n = 1 << max_res

    def partial(t: pa.Table) -> pa.Table:
        x, y = xy_for(t.column("lon").to_numpy(zero_copy_only=False),
                      t.column("lat").to_numpy(zero_copy_only=False),
                      max_res)
        cell = y * n + x
        u, c = np.unique(cell, return_counts=True)
        return pa.table({"cell": pa.array(u.astype(np.int64)),
                         "c": pa.array(c.astype(np.int64))})

    def local(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("cell", as_index=False, sort=False)["c"] \
            .sum()

    fine = bucketed_group_agg(
        geo.map_batches(partial, batch_format="pyarrow"), "cell",
        local).to_pandas()
    cells = fine["cell"].to_numpy(dtype=np.int64)
    cnt = fine["c"].to_numpy(dtype=np.int64)
    fx, fy = cells % n, cells // n
    frames = []
    for r in range(max_res + 1):
        sh = max_res - r
        key = (fy >> sh) * (1 << r) + (fx >> sh)
        u, inv = np.unique(key, return_inverse=True)
        s = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, cnt)
        frames.append(pd.DataFrame({
            "res": np.full(len(u), r, dtype=np.int64),
            "cx": u % (1 << r), "cy": u // (1 << r),
            "n_points": s}))
    return pd.concat(frames, ignore_index=True) \
        .sort_values(["res", "cy", "cx"]).reset_index(drop=True) \
        .astype(np.int64)


def q_promo_revenue_share(sf_dir: str):
    """TPC-H Q14 shape — promo revenue share per ship month: lineitem
    probes the broadcast part dimension (p_type lookup, no shuffle),
    revenue folds per-batch into (month, promo) integer partials, and
    the share is the truncating ratio promo*10^6 // total. Exact
    int64 end to end."""
    import pyarrow.parquet as pq

    from spapy_ray.stages.relational import broadcast_join

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_extendedprice", "l_discount",
                        "l_shipdate"])
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    promo = pa.table({
        "p_partkey": pc.cast(part.column("p_partkey"), pa.int64()),
        "is_promo": pc.cast(pc.equal(part.column("p_type"),
                                     pa.scalar("PROMO")), pa.int64()),
    })
    j = broadcast_join(li, promo, key="l_partkey",
                       small_key="p_partkey")

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("l_shipdate"), pa.int64()).to_numpy()
        ym = (us // 86_400_000_000).astype("datetime64[D]") \
            .astype("datetime64[M]")
        ymk = ym.astype(np.int64)          # months since 1970-01
        cents = np.rint(t.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        dpct = np.rint(t.column("l_discount")
                       .to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        rev = cents * (100 - dpct)
        isp = t.column("is_promo").to_numpy(zero_copy_only=False)
        key, inv = np.unique(ymk, return_inverse=True)
        tot = np.zeros(len(key), dtype=np.int64)
        pr = np.zeros(len(key), dtype=np.int64)
        np.add.at(tot, inv, rev)
        np.add.at(pr, inv, rev * isp)
        return pa.table({"ym": pa.array(key),
                         "promo_rev_u": pa.array(pr),
                         "total_rev_u": pa.array(tot)})

    agg = j.map_batches(partial, batch_format="pyarrow") \
        .groupby("ym").sum(["promo_rev_u", "total_rev_u"]) \
        .to_pandas()
    agg = agg.rename(columns={"sum(promo_rev_u)": "promo_rev_u",
                              "sum(total_rev_u)": "total_rev_u"})
    agg["share_ppm"] = (agg["promo_rev_u"] * 1_000_000
                        // agg["total_rev_u"]).astype(np.int64)
    return agg.sort_values("ym").reset_index(drop=True) \
        .astype(np.int64)


def q_large_orders(sf_dir: str, min_qty: int = 300, k: int = 20):
    """TPC-H Q18 shape — large-volume orders: per-order quantity sums
    through the bucketed two-stage groupby (orderkey is
    high-cardinality — a direct ray groupby would sort every key),
    threshold filter, then the tiny winner set broadcast back into
    the orders scan as a lookup join. Top-k by (sum_qty desc,
    orderkey) is deterministic."""
    from spapy_ray.stages.relational import (broadcast_join,
                                             bucketed_group_agg)

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def ints(t: pa.Table) -> pa.Table:
        q = t.column("l_quantity").to_numpy(zero_copy_only=False)
        return pa.table({
            "l_orderkey": pc.cast(t.column("l_orderkey"), pa.int64()),
            "qty": pa.array(np.rint(q).astype(np.int64))})

    def local(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_orderkey", sort=False)["qty"].sum().reset_index()
        g = g[g["qty"] >= min_qty]
        return g.rename(columns={"qty": "sum_qty"})

    big = bucketed_group_agg(li.map_batches(ints, batch_format="pyarrow"),
                             "l_orderkey", local).to_pandas()
    small = pa.table({
        "l_orderkey": pa.array(big["l_orderkey"].to_numpy()
                               .astype(np.int64)),
        "sum_qty": pa.array(big["sum_qty"].to_numpy().astype(np.int64))})

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def okey(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
            "o_totalprice": t.column("o_totalprice")})

    hit = broadcast_join(orders.map_batches(okey, batch_format="pyarrow"),
                         small, key="o_orderkey",
                         small_key="l_orderkey").to_pandas()
    hit["totalprice_cents"] = np.rint(
        hit["o_totalprice"].to_numpy() * 100).astype(np.int64)
    out = hit.sort_values(["sum_qty", "o_orderkey"],
                          ascending=[False, True], kind="stable").head(k)
    return out[["o_orderkey", "sum_qty", "totalprice_cents"]] \
        .reset_index(drop=True)


def q_zone_dispersion(sf_dir: str):
    """Standard-distance dispersion per zone (the classic centrographic
    statistic): PIP-joined pages quantize to 1e-5-degree ints, shift
    to their zone's x0/y0 anchor (zone_params arithmetic — variance is
    shift-invariant, and anchored deltas keep int64 partials exact),
    per-batch combiner partials fold the five sufficient statistics,
    and n*sxx - sx^2 finalizes in Python ints on the 200-row table.
    varx_q / vary_q / sd2_q are the floor-quantized per-point
    variances (fit int64 by construction)."""
    from ray.data.aggregate import Sum

    from spapy_ray.sources.zones import M32, MIX_A, U
    from spapy_ray.stages.distjoin import _fixed5
    from spapy_ray.stages.join import pip_join
    from spapy_ray.sources.zones import zones_table

    j = pip_join(_geo(sf_dir), zones_table(),
                 left_columns=["lat", "lon"],
                 zone_columns=["zone_id"])

    def partial(t: pa.Table) -> pa.Table:
        z = t.column("zone_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        lat5 = _fixed5(t.column("lat"))
        lon5 = _fixed5(t.column("lon"))
        col = z % 20
        row = (z // 20) % 10
        g = (z * MIX_A) % M32
        x0 = (-180 * U + col * 18 * U) + g % 30000
        y0 = (-85 * U + row * 17 * U) + (g // 30000) % 30000
        dx = lon5 - 10 * x0
        dy = lat5 - 10 * y0
        u, inv = np.unique(z, return_inverse=True)
        out = {"zone_id": u, "n": np.bincount(inv).astype(np.int64)}
        for name, v in (("sdx", dx), ("sdy", dy),
                        ("sdxx", dx * dx), ("sdyy", dy * dy)):
            s = np.zeros(len(u), dtype=np.int64)
            np.add.at(s, inv, v)
            out[name] = s
        return pa.table({k: pa.array(v) for k, v in out.items()})

    cols = ["n", "sdx", "sdy", "sdxx", "sdyy"]
    agg = j.map_batches(partial, batch_format="pyarrow") \
        .groupby("zone_id") \
        .aggregate(*[Sum(c, alias_name=c) for c in cols]).to_pandas()

    n = [int(v) for v in agg["n"]]
    fin = {"varx_q": [], "vary_q": [], "sd2_q": []}
    for i in range(len(agg)):
        nn = n[i]
        vx = nn * int(agg["sdxx"][i]) - int(agg["sdx"][i]) ** 2
        vy = nn * int(agg["sdyy"][i]) - int(agg["sdy"][i]) ** 2
        fin["varx_q"].append(vx // (nn * nn))
        fin["vary_q"].append(vy // (nn * nn))
        fin["sd2_q"].append((vx + vy) // (nn * nn))
    out = agg.rename(columns={"n": "n_pages"})
    for k, v in fin.items():
        out[k] = np.asarray(v, dtype=np.int64)
    return out.sort_values("zone_id").reset_index(drop=True)


def q_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 shape — revenue locked in small-quantity orders:
    per-part (sum_qty, count) fold over the fact table, broadcast
    back as a lookup join (part is the small dimension), and the
    avg-quantity predicate kept exactly integral as
    qty * 5 * cnt < sum_qty (l_quantity is integral by schema), so
    no float average ever exists on either side."""
    from ray.data.aggregate import Sum

    from spapy_ray.stages.relational import broadcast_join

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def qty_int(t: pa.Table) -> pa.Table:
        q = t.column("l_quantity").to_numpy(zero_copy_only=False)
        return pa.table({
            "l_partkey": pc.cast(t.column("l_partkey"), pa.int64()),
            "qty": pa.array(np.rint(q).astype(np.int64)),
            "l_extendedprice": t.column("l_extendedprice")})

    ints = li.map_batches(qty_int, batch_format="pyarrow")

    def part_partial(t: pa.Table) -> pa.Table:
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False)
        q = t.column("qty").to_numpy(zero_copy_only=False)
        u, inv = np.unique(pk, return_inverse=True)
        sq = np.zeros(len(u), dtype=np.int64)
        np.add.at(sq, inv, q)
        c = np.bincount(inv, minlength=len(u)).astype(np.int64)
        return pa.table({"l_partkey": pa.array(u), "sq": pa.array(sq),
                         "c": pa.array(c)})

    per_part = ints.map_batches(part_partial, batch_format="pyarrow") \
        .groupby("l_partkey") \
        .aggregate(Sum("sq", alias_name="sq"), Sum("c", alias_name="c"))
    small = pa.Table.from_pandas(per_part.to_pandas(), preserve_index=False)
    small = pa.table({"l_partkey": pc.cast(small.column("l_partkey"),
                                           pa.int64()),
                      "sq": pc.cast(small.column("sq"), pa.int64()),
                      "c": pc.cast(small.column("c"), pa.int64())})

    joined = broadcast_join(ints, small, key="l_partkey")

    def fold(t: pa.Table) -> pa.Table:
        q = t.column("qty").to_numpy(zero_copy_only=False)
        sq = t.column("sq").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        m = q * 5 * c < sq
        cents = np.rint(t.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False)[m] * 100) \
            .astype(np.int64)
        return pa.table({"revenue_cents": pa.array([int(cents.sum())]),
                         "n_items": pa.array([int(m.sum())])})

    parts = joined.map_batches(fold, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({
        "revenue_cents": [np.int64(parts["revenue_cents"].sum())],
        "n_items": [np.int64(parts["n_items"].sum())]})


def q_idle_customers(sf_dir: str):
    """TPC-H Q22 shape — positive-balance customers with no recent
    orders, by nation: global (n_pos, sum_pos) balance stats from one
    combiner pass, the above-average predicate kept exact as
    cents * n_pos > sum_pos_cents (no float average), recent ordering
    customers distinct-folded behind a pushed-down date predicate,
    anti hash_join, nation names attached on the driver (25-row
    dimension)."""
    import pyarrow.dataset as pds
    import pyarrow.parquet as pq

    from spapy_ray.stages.relational import (hash_join,
                                             pre_aggregated_count,
                                             pre_aggregated_sums)

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def cents_tbl(t: pa.Table) -> pa.Table:
        b = t.column("c_acctbal").to_numpy(zero_copy_only=False)
        return pa.table({
            "c_custkey": pc.cast(t.column("c_custkey"), pa.int64()),
            "c_nationkey": pc.cast(t.column("c_nationkey"), pa.int64()),
            "cents": pa.array(np.rint(b * 100).astype(np.int64))})

    cc = cust.map_batches(cents_tbl, batch_format="pyarrow")

    def pos_partial(t: pa.Table) -> pa.Table:
        c = t.column("cents").to_numpy(zero_copy_only=False)
        p = c[c > 0]
        return pa.table({"np_": pa.array([len(p)]),
                         "sp": pa.array([int(p.sum())])})

    stats = cc.map_batches(pos_partial, batch_format="pyarrow").to_pandas()
    n_pos, s_pos = int(stats["np_"].sum()), int(stats["sp"].sum())

    def rich(t: pa.Table) -> pa.Table:
        c = t.column("cents").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(c * n_pos > s_pos))

    t0 = pd.Timestamp("1999-01-01")
    recent = pre_aggregated_count(
        _read(sf_dir, "orders", columns=["o_custkey"],
              predicate=pds.field("o_orderdate") >= t0),
        "o_custkey").select_columns(["o_custkey"])

    idle = hash_join(cc.map_batches(rich, batch_format="pyarrow"), recent,
                     on="c_custkey", right_on="o_custkey", how="anti")
    per_nat = pre_aggregated_sums(idle, ["c_nationkey"], ["cents"],
                                  count_alias="n_custs").to_pandas()

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"]).to_pandas()
    out = per_nat.merge(nat, left_on="c_nationkey", right_on="n_nationkey")
    out["n_custs"] = out["n_custs"].astype(np.int64)
    out["bal_cents"] = out["cents"].astype(np.int64)
    return out[["n_name", "n_custs", "bal_cents"]] \
        .sort_values("n_name").reset_index(drop=True)


def q_promo_share(sf_dir: str):
    """TPC-H Q14 shape — promo revenue share for 1996-03 shipments:
    part is the broadcast dimension (is_promo flag only), revenue in
    exact integer units, and the share reported as an integer
    floor(promo_u * 1e6 / total_u) so the ratio needs no float on
    either side."""
    import pyarrow.dataset as pds
    import pyarrow.parquet as pq

    from spapy_ray.stages.relational import broadcast_join

    t0, t1 = pd.Timestamp("1996-03-01"), pd.Timestamp("1996-04-01")
    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_extendedprice", "l_discount"],
               predicate=(pds.field("l_shipdate") >= t0)
               & (pds.field("l_shipdate") < t1))

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    small = pa.table({
        "p_partkey": pc.cast(part.column("p_partkey"), pa.int64()),
        "is_promo": pc.cast(pc.equal(part.column("p_type"), "PROMO"),
                            pa.int64())})

    def pk_int(t: pa.Table) -> pa.Table:
        return t.set_column(t.schema.get_field_index("l_partkey"),
                            "l_partkey",
                            pc.cast(t.column("l_partkey"), pa.int64()))

    j = broadcast_join(li.map_batches(pk_int, batch_format="pyarrow"),
                       small, key="l_partkey", small_key="p_partkey")

    def fold(t: pa.Table) -> pa.Table:
        cents = np.rint(t.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        d = np.rint(t.column("l_discount")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        rev = cents * (100 - d)
        promo = t.column("is_promo").to_numpy(zero_copy_only=False)
        return pa.table({"promo_u": pa.array([int(rev[promo == 1].sum())]),
                         "total_u": pa.array([int(rev.sum())])})

    parts = j.map_batches(fold, batch_format="pyarrow").to_pandas()
    pu, tu = int(parts["promo_u"].sum()), int(parts["total_u"].sum())
    return pd.DataFrame({"promo_revenue_u": [np.int64(pu)],
                         "total_revenue_u": [np.int64(tu)],
                         "promo_ppm": [np.int64(pu * 1_000_000 // tu)]})


def q_late_sole_suppliers(sf_dir: str, late_us: int = 120 * 86_400_000_000,
                          k: int = 10):
    """TPC-H Q21 shape — suppliers solely responsible for a late
    multi-supplier order: ONE big hash_join (lineitem x orders), then
    a single bucketed shuffle keyed on orderkey does BOTH fold levels
    locally (per-(order, supplier) any-late, then the per-order
    sole-blame test) because every row of an order co-locates in its
    bucket; the per-supplier blame count is a second tiny fold."""
    import pyarrow.parquet as pq

    from spapy_ray.stages.relational import (bucketed_group_agg, hash_join,
                                             pre_aggregated_count)

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_shipdate"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    j = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey")

    def flag(t: pa.Table) -> pa.Table:
        ship = pc.cast(t.column("l_shipdate"), pa.int64()).to_numpy()
        ordr = pc.cast(t.column("o_orderdate"), pa.int64()).to_numpy()
        return pa.table({
            "l_orderkey": pc.cast(t.column("l_orderkey"), pa.int64()),
            "l_suppkey": pc.cast(t.column("l_suppkey"), pa.int64()),
            "late": pa.array((ship - ordr > late_us).astype(np.int64))})

    def local(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["l_orderkey", "l_suppkey"], sort=False)["late"] \
            .max().reset_index()
        g["skl"] = g["l_suppkey"] * g["late"]
        per = g.groupby("l_orderkey", sort=False).agg(
            ns=("l_suppkey", "size"), nl=("late", "sum"), skl=("skl", "sum"))
        sel = per[(per["nl"] == 1) & (per["ns"] >= 2)]
        return pd.DataFrame({"s_suppkey": sel["skl"].to_numpy()
                             .astype(np.int64)})

    blamed = bucketed_group_agg(j.map_batches(flag, batch_format="pyarrow"),
                                "l_orderkey", local)
    counts = pre_aggregated_count(blamed, "s_suppkey",
                                  alias="n_orders").to_pandas()
    counts["s_suppkey"] = counts["s_suppkey"].astype(np.int64)
    counts["n_orders"] = counts["n_orders"].astype(np.int64)

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name"]).to_pandas()
    sup["s_suppkey"] = sup["s_suppkey"].astype(np.int64)
    out = counts.merge(sup, on="s_suppkey")
    out = out.sort_values(["n_orders", "s_suppkey"],
                          ascending=[False, True], kind="stable").head(k)
    return out[["s_suppkey", "s_name", "n_orders"]].reset_index(drop=True)


def q_shipping_priority(sf_dir: str, k: int = 10):
    """TPC-H Q3 shape — unshipped-order revenue by order: BUILDING
    customers semi-filter orders (one bucketed hash_join, date
    predicate pushed into the orders scan), the fact table probes
    that result, per-order revenue folds through the bucketed
    two-stage groupby, and the global top-10 is a sort+limit on the
    per-order aggregate (never the raw fact rows)."""
    import pyarrow.dataset as pds

    from spapy_ray.stages.relational import bucketed_group_agg, hash_join

    d = pd.Timestamp("1998-06-01")
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"],
                   predicate=pds.field("o_orderdate") < d)
    cust = _read(sf_dir, "customer", columns=["c_custkey"],
                 predicate=pds.field("c_mktsegment") == "BUILDING")
    o2 = hash_join(orders, cust, on="o_custkey", right_on="c_custkey",
                   how="semi").map_batches(
        lambda t: t.select(["o_orderkey", "o_orderdate"]),
        batch_format="pyarrow")

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"],
               predicate=pds.field("l_shipdate") > d)
    j = hash_join(li, o2, on="l_orderkey", right_on="o_orderkey")

    def proj(t: pa.Table) -> pa.Table:
        rev = _cents(t.column("l_extendedprice")) * \
            (100 - _cents(t.column("l_discount")))
        return pa.table({
            "l_orderkey": pc.cast(t.column("l_orderkey"), pa.int64()),
            "odate_us": pc.cast(t.column("o_orderdate"), pa.int64()),
            "rev": pa.array(rev)})

    def local(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["l_orderkey", "odate_us"], sort=False)["rev"] \
            .sum().reset_index()
        return g.rename(columns={"rev": "revenue_u"})

    per_order = bucketed_group_agg(
        j.map_batches(proj, batch_format="pyarrow"), "l_orderkey", local)
    return per_order.sort(["revenue_u", "l_orderkey"],
                          descending=[True, False]).limit(k)


def q_late_order_priority(sf_dir: str):
    """TPC-H Q4 shape — order-priority check: orders from one quarter
    counted per priority when ANY lineitem shipped > 90 days after
    the order date (the schema has no commit/receipt dates). The
    EXISTS is one bucketed hash_join + vectorized late mask +
    bucketed per-order dedup; the final count is a combiner fold
    over the 5-row priority domain."""
    import pyarrow.dataset as pds

    from spapy_ray.stages.relational import (bucketed_group_agg,
                                             hash_join,
                                             pre_aggregated_count)

    t0 = pd.Timestamp("1997-07-01")
    t1 = pd.Timestamp("1997-10-01")
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate",
                            "o_orderpriority"],
                   predicate=(pds.field("o_orderdate") >= t0)
                   & (pds.field("o_orderdate") < t1))
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    j = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey")
    late_us = 90 * 86_400_000_000

    def late_pairs(t: pa.Table) -> pa.Table:
        ship = t.column("l_shipdate").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        od = t.column("o_orderdate").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        m = ship > od + late_us
        sub = t.filter(pa.array(m))
        df = pd.DataFrame({
            "l_orderkey": sub.column("l_orderkey")
            .to_numpy(zero_copy_only=False).astype(np.int64),
            "o_orderpriority": sub.column("o_orderpriority")
            .to_pandas()}).drop_duplicates("l_orderkey")
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = j.map_batches(late_pairs, batch_format="pyarrow")
    dedup = bucketed_group_agg(
        pairs, "l_orderkey",
        lambda df: df.drop_duplicates("l_orderkey"))
    out = pre_aggregated_count(dedup, "o_orderpriority",
                               alias="n_orders").to_pandas()
    out["n_orders"] = out["n_orders"].astype(np.int64)
    return out


def q_nation_pair_trade(sf_dir: str):
    """TPC-H Q7 shape — volume shipping between NATION_3 and
    NATION_8 by ship year: the Q5 join plan (customer hash_join,
    fact probe, supplier broadcast) with the cross-nation mask and
    (supp_nation, cust_nation, year) combiner fold."""
    import pyarrow.dataset as pds
    import pyarrow.parquet as pq

    from ray.data.aggregate import Sum

    from spapy_ray.stages.relational import broadcast_join, hash_join

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey"],
                 predicate=pds.field("c_nationkey").isin([3, 8]))
    # map_batches select, not select_columns: Ray's static Project
    # schema over a map_groups result can over-report columns, which
    # breaks the downstream hash_join's schema-driven unify
    oc = hash_join(orders, cust, on="o_custkey", right_on="c_custkey") \
        .map_batches(lambda t: t.select(["o_orderkey", "c_nationkey"]),
                     batch_format="pyarrow")

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount", "l_shipdate"],
               predicate=(pds.field("l_shipdate")
                          >= pd.Timestamp("1996-01-01"))
               & (pds.field("l_shipdate") < pd.Timestamp("1998-01-01")))
    j = hash_join(li, oc, on="l_orderkey", right_on="o_orderkey")

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    sup = sup.filter(pc.is_in(sup.column("s_nationkey"),
                              value_set=pa.array([3, 8], pa.int32())))
    sup = pa.table({"s_suppkey": pc.cast(sup.column("s_suppkey"),
                                         pa.int64()),
                    "s_nationkey": pc.cast(sup.column("s_nationkey"),
                                           pa.int64())})
    js = broadcast_join(j, sup, key="l_suppkey", small_key="s_suppkey")

    def fold(t: pa.Table) -> pa.Table:
        cn = t.column("c_nationkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sn = t.column("s_nationkey").to_numpy(zero_copy_only=False)
        m = cn != sn
        sub = t.filter(pa.array(m))
        rev = _cents(sub.column("l_extendedprice")) * \
            (100 - _cents(sub.column("l_discount")))
        yr = _year_of_us(sub.column("l_shipdate").cast(pa.int64())
                         .to_numpy(zero_copy_only=False))
        df = pd.DataFrame({
            "supp_nation": np.where(sn[m] == 3, "NATION_3", "NATION_8"),
            "cust_nation": np.where(cn[m] == 3, "NATION_3", "NATION_8"),
            "l_year": yr, "rev": rev})
        g = df.groupby(["supp_nation", "cust_nation", "l_year"],
                       sort=False)["rev"].sum().reset_index()
        return pa.Table.from_pandas(
            g.rename(columns={"rev": "revenue_u"}), preserve_index=False)

    return js.map_batches(fold, batch_format="pyarrow") \
        .groupby(["supp_nation", "cust_nation", "l_year"]) \
        .aggregate(Sum("revenue_u", alias_name="revenue_u"))


def q_market_share(sf_dir: str):
    """TPC-H Q8 shape — NATION_3's market share of ECONOMY-part
    revenue among AMERICA-region customers, per order year: part
    keys broadcast-semi into the fact scan, region customers via one
    hash_join, supplier nation broadcast, and the share computed as
    an exact ppm trunc ratio on the 2-row year fold."""
    import pyarrow.dataset as pds
    import pyarrow.parquet as pq

    from ray.data.aggregate import Sum

    from spapy_ray.stages.relational import broadcast_join, hash_join

    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    amer = int(reg.filter(pc.equal(reg.column("r_name"), "AMERICA"))
               .column("r_regionkey")[0].as_py())
    amer_nations = [int(k) for k, r in zip(
        nat.column("n_nationkey").to_pylist(),
        nat.column("n_regionkey").to_pylist()) if int(r) == amer]

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"],
                   predicate=(pds.field("o_orderdate")
                              >= pd.Timestamp("1996-01-01"))
                   & (pds.field("o_orderdate")
                      < pd.Timestamp("1998-01-01")))
    cust = _read(sf_dir, "customer", columns=["c_custkey"],
                 predicate=pds.field("c_nationkey").isin(amer_nations))
    o2 = hash_join(orders, cust, on="o_custkey", right_on="c_custkey",
                   how="semi").map_batches(
        lambda t: t.select(["o_orderkey", "o_orderdate"]),
        batch_format="pyarrow")

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    econ = pa.table({"p_partkey": pc.cast(
        part.filter(pc.equal(part.column("p_type"), "ECONOMY"))
        .column("p_partkey"), pa.int64())})
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_partkey", "l_suppkey",
                        "l_extendedprice", "l_discount"])
    lf = broadcast_join(li, econ, key="l_partkey", small_key="p_partkey")
    j = hash_join(lf, o2, on="l_orderkey", right_on="o_orderkey")

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    sup = pa.table({"s_suppkey": pc.cast(sup.column("s_suppkey"),
                                         pa.int64()),
                    "s_nationkey": pc.cast(sup.column("s_nationkey"),
                                           pa.int64())})
    js = broadcast_join(j, sup, key="l_suppkey", small_key="s_suppkey")

    def fold(t: pa.Table) -> pa.Table:
        rev = _cents(t.column("l_extendedprice")) * \
            (100 - _cents(t.column("l_discount")))
        yr = _year_of_us(t.column("o_orderdate").cast(pa.int64())
                         .to_numpy(zero_copy_only=False))
        sn = t.column("s_nationkey").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"o_year": yr, "rev_all_u": rev,
                           "rev_nation_u": np.where(sn == 3, rev, 0)})
        g = df.groupby("o_year", sort=False)[
            ["rev_all_u", "rev_nation_u"]].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = js.map_batches(fold, batch_format="pyarrow") \
        .groupby("o_year") \
        .aggregate(Sum("rev_all_u", alias_name="rev_all_u"),
                   Sum("rev_nation_u", alias_name="rev_nation_u")) \
        .to_pandas()
    out["o_year"] = out["o_year"].astype(np.int64)
    out["rev_all_u"] = out["rev_all_u"].astype(np.int64)
    out["rev_nation_u"] = out["rev_nation_u"].astype(np.int64)
    out["share_ppm"] = (out["rev_nation_u"] * 1_000_000
                        // out["rev_all_u"]).astype(np.int64)
    return out


def q_product_profit(sf_dir: str):
    """TPC-H Q9 shape — profit on 'gear' product lines by supplier
    nation and order year. No partsupp: unit cost is half the part's
    retail price, so profit_u = cents*(100-disc_pct) -
    qty*retail_cents*50, exact in int64. Parts and suppliers ride as
    broadcast lookups; orders attach through the one bucketed
    hash_join; the (nation, year) fold is a combiner."""
    import pyarrow.parquet as pq

    from ray.data.aggregate import Sum

    from spapy_ray.stages.relational import broadcast_join, hash_join

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name",
                                  "p_retailprice"])
    gear = part.filter(pc.match_substring(part.column("p_name"),
                                          "gear"))
    gear = pa.table({
        "p_partkey": pc.cast(gear.column("p_partkey"), pa.int64()),
        "retail_cents": pa.array(_cents(gear.column("p_retailprice")))})

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_partkey", "l_suppkey",
                        "l_quantity", "l_extendedprice", "l_discount"])
    lf = broadcast_join(li, gear, key="l_partkey", small_key="p_partkey")

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    nmap = {int(k): str(n) for k, n in zip(
        nat.column("n_nationkey").to_pylist(),
        nat.column("n_name").to_pylist())}
    sup = pa.table({
        "s_suppkey": pc.cast(sup.column("s_suppkey"), pa.int64()),
        "n_name": pa.array([nmap[int(k)] for k in
                            sup.column("s_nationkey").to_pylist()])})
    ls = broadcast_join(lf, sup, key="l_suppkey", small_key="s_suppkey")

    orders = _read(sf_dir, "orders", columns=["o_orderkey",
                                              "o_orderdate"])
    j = hash_join(ls, orders, on="l_orderkey", right_on="o_orderkey")

    def fold(t: pa.Table) -> pa.Table:
        rev = _cents(t.column("l_extendedprice")) * \
            (100 - _cents(t.column("l_discount")))
        cost = _qty_i(t.column("l_quantity")) * \
            t.column("retail_cents").to_numpy(zero_copy_only=False) * 50
        yr = _year_of_us(t.column("o_orderdate").cast(pa.int64())
                         .to_numpy(zero_copy_only=False))
        df = pd.DataFrame({"n_name": t.column("n_name").to_pandas(),
                           "o_year": yr, "profit_u": rev - cost})
        g = df.groupby(["n_name", "o_year"], sort=False)["profit_u"] \
            .sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    return j.map_batches(fold, batch_format="pyarrow") \
        .groupby(["n_name", "o_year"]) \
        .aggregate(Sum("profit_u", alias_name="profit_u"))


def q_brand_discount_revenue(sf_dir: str):
    """TPC-H Q19 shape — OR-of-ANDs predicate revenue: three
    (brand, quantity-range, size-range) disjuncts evaluated as one
    vectorized compound mask against broadcast part attributes; the
    result is a single-row scalar fold."""
    import pyarrow.parquet as pq

    from spapy_ray.stages.relational import broadcast_join

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_size"])
    small = pa.table({
        "p_partkey": pc.cast(part.column("p_partkey"), pa.int64()),
        "p_brand": part.column("p_brand"),
        "p_size": pc.cast(part.column("p_size"), pa.int64())})

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice",
                        "l_discount"])
    j = broadcast_join(li, small, key="l_partkey", small_key="p_partkey")

    def fold(t: pa.Table) -> pa.Table:
        qty = _qty_i(t.column("l_quantity"))
        size = t.column("p_size").to_numpy(zero_copy_only=False)
        brand = np.asarray(t.column("p_brand").to_pylist())
        m = (((brand == "Brand#1") & (qty >= 1) & (qty <= 11)
              & (size >= 1) & (size <= 5))
             | ((brand == "Brand#2") & (qty >= 10) & (qty <= 20)
                & (size >= 1) & (size <= 10))
             | ((brand == "Brand#3") & (qty >= 20) & (qty <= 30)
                & (size >= 1) & (size <= 15)))
        sub = t.filter(pa.array(m))
        rev = _cents(sub.column("l_extendedprice")) * \
            (100 - _cents(sub.column("l_discount")))
        return pa.table({"revenue_u": pa.array([int(rev.sum())]),
                         "n_items": pa.array([int(m.sum())])})

    parts = j.map_batches(fold, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({
        "revenue_u": [np.int64(parts["revenue_u"].sum())],
        "n_items": [np.int64(parts["n_items"].sum())]})


def q_min_cost_supplier(sf_dir: str):
    """TPC-H Q2 shape — minimum-unit-cost supplier per SMALL-type
    part among EUROPE-region suppliers. No partsupp: the offer
    relation is derived from lineitem with
    unit_cents = cents // qty (qty is integral >= 1, so the division
    is exact trunc on positives). Part keys and the EUROPE supplier
    set broadcast-semi into the fact scan; the per-part argmin
    (unit_cents asc, suppkey asc) folds in one bucketed groupby."""
    import pyarrow.parquet as pq

    from spapy_ray.stages.relational import (broadcast_join,
                                             bucketed_group_agg)

    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    eur = int(reg.filter(pc.equal(reg.column("r_name"), "EUROPE"))
              .column("r_regionkey")[0].as_py())
    eur_nations = {int(k) for k, r in zip(
        nat.column("n_nationkey").to_pylist(),
        nat.column("n_regionkey").to_pylist()) if int(r) == eur}
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    eu_sup = pa.table({"s_suppkey": pc.cast(
        sup.filter(pa.array([int(n) in eur_nations for n in
                             sup.column("s_nationkey").to_pylist()]))
        .column("s_suppkey"), pa.int64())})

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    pk = pa.table({"p_partkey": pc.cast(
        part.filter(pc.equal(part.column("p_type"), "SMALL"))
        .column("p_partkey"), pa.int64())})

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_quantity",
                        "l_extendedprice"])
    lf = broadcast_join(li, pk, key="l_partkey", small_key="p_partkey")
    lf = broadcast_join(lf, eu_sup, key="l_suppkey",
                        small_key="s_suppkey")

    def proj(t: pa.Table) -> pa.Table:
        uc = _cents(t.column("l_extendedprice")) // \
            _qty_i(t.column("l_quantity"))
        return pa.table({
            "p_partkey": pc.cast(t.column("l_partkey"), pa.int64()),
            "s_suppkey": pc.cast(t.column("l_suppkey"), pa.int64()),
            "uc": pa.array(uc)})

    def local(df: pd.DataFrame) -> pd.DataFrame:
        m = df.groupby("p_partkey", sort=False)["uc"].transform("min")
        best = df[df["uc"] == m]
        g = best.groupby("p_partkey", sort=False).agg(
            s_suppkey=("s_suppkey", "min"),
            unit_cents=("uc", "min")).reset_index()
        return g

    return bucketed_group_agg(
        lf.map_batches(proj, batch_format="pyarrow"), "p_partkey", local)


def q_important_parts(sf_dir: str):
    """TPC-H Q11 shape — important inventory: per-part extended-price
    value over NATION_3 suppliers' lineitems, keeping parts whose
    value exceeds 0.1% of the total (value_u * 1000 > total_u — the
    fraction predicate stays integral). Supplier set broadcast-semi;
    per-part sums via the combiner; the global total folds from the
    per-part aggregate, never a second corpus pass."""
    import pyarrow.parquet as pq

    from spapy_ray.stages.relational import (broadcast_join,
                                             pre_aggregated_sums)

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    n0 = pa.table({"s_suppkey": pc.cast(
        sup.filter(pc.equal(sup.column("s_nationkey"),
                            pa.scalar(3, pa.int32())))
        .column("s_suppkey"), pa.int64())})

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_extendedprice"])
    lf = broadcast_join(li, n0, key="l_suppkey", small_key="s_suppkey")

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": pc.cast(t.column("l_partkey"), pa.int64()),
            "value_u": pa.array(_cents(t.column("l_extendedprice")))})

    per_part = pre_aggregated_sums(
        lf.map_batches(proj, batch_format="pyarrow"),
        ["l_partkey"], ["value_u"]).to_pandas()
    total = int(per_part["value_u"].sum())
    out = per_part[per_part["value_u"] * 1000 > total]
    return pd.DataFrame({
        "l_partkey": out["l_partkey"].to_numpy().astype(np.int64),
        "value_u": out["value_u"].to_numpy().astype(np.int64)})


def q_supplier_part_counts(sf_dir: str):
    """TPC-H Q16 shape — supplier counts per part attribute triple:
    distinct (part, supplier) pairs from lineitem (per-batch distinct
    + one bucketed dedup), negative-balance suppliers and
    Brand#9 / PROMO parts excluded via broadcast lookups, then the
    distinct-supplier count per (brand, type, size) through a second
    bucketed dedup on (triple, supplier) and a combiner count."""
    import pyarrow.parquet as pq

    from spapy_ray.stages.relational import (broadcast_join,
                                             bucketed_group_agg,
                                             pre_aggregated_sums)

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_type",
                                  "p_size"])
    keep = part.filter(pc.and_(
        pc.not_equal(part.column("p_brand"), "Brand#9"),
        pc.not_equal(part.column("p_type"), "PROMO")))
    attrs = pa.table({
        "p_partkey": pc.cast(keep.column("p_partkey"), pa.int64()),
        "p_brand": keep.column("p_brand"),
        "p_type": keep.column("p_type"),
        "p_size": pc.cast(keep.column("p_size"), pa.int64())})

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_acctbal"])
    ok_sup = pa.table({"s_suppkey": pc.cast(
        sup.filter(pc.greater_equal(sup.column("s_acctbal"), 0.0))
        .column("s_suppkey"), pa.int64())})

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def pairs(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "l_partkey": t.column("l_partkey")
            .to_numpy(zero_copy_only=False).astype(np.int64),
            "l_suppkey": t.column("l_suppkey")
            .to_numpy(zero_copy_only=False).astype(np.int64)}) \
            .drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    dd = bucketed_group_agg(
        li.map_batches(pairs, batch_format="pyarrow"), "l_partkey",
        lambda df: df.drop_duplicates())
    dd = broadcast_join(dd, attrs, key="l_partkey",
                        small_key="p_partkey")
    dd = broadcast_join(dd, ok_sup, key="l_suppkey",
                        small_key="s_suppkey")

    # distinct (brand, type, size, suppkey): a supplier shipping two
    # parts of the same triple must count once
    def quads(t: pa.Table) -> pa.Table:
        df = t.select(["p_brand", "p_type", "p_size", "l_suppkey"]) \
            .to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    dq = bucketed_group_agg(
        dd.map_batches(quads, batch_format="pyarrow"), "l_suppkey",
        lambda df: df.drop_duplicates())

    def ones(t: pa.Table) -> pa.Table:
        return t.append_column(
            "one", pa.array(np.ones(len(t), dtype=np.int64)))

    out = pre_aggregated_sums(
        dq.map_batches(ones, batch_format="pyarrow"),
        ["p_brand", "p_type", "p_size"], ["one"]).to_pandas()
    return pd.DataFrame({
        "p_brand": out["p_brand"], "p_type": out["p_type"],
        "p_size": out["p_size"].astype(np.int64),
        "supplier_cnt": out["one"].astype(np.int64)})


def q_promo_suppliers(sf_dir: str):
    """TPC-H Q20 shape — suppliers in NATION_8 whose 1996 shipments
    of red parts dominate: per (supplier, part) total and 1996
    quantity sums in one combiner pass (the conditional year sum
    rides the same fold), keep pairs with q96 * 2 > q_total, distinct
    suppliers, names attached from the broadcast dimension."""
    import pyarrow.parquet as pq

    from spapy_ray.stages.relational import (broadcast_join,
                                             pre_aggregated_sums)

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name"])
    red = pa.table({"p_partkey": pc.cast(
        part.filter(pc.starts_with(part.column("p_name"), "red "))
        .column("p_partkey"), pa.int64())})
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name", "s_nationkey"])
    sup2 = sup.filter(pc.equal(sup.column("s_nationkey"),
                               pa.scalar(8, pa.int32())))
    n2 = pa.table({"s_suppkey": pc.cast(sup2.column("s_suppkey"),
                                        pa.int64())})

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_quantity",
                        "l_shipdate"])
    lf = broadcast_join(li, red, key="l_partkey", small_key="p_partkey")
    lf = broadcast_join(lf, n2, key="l_suppkey", small_key="s_suppkey")

    t0 = pd.Timestamp("1996-01-01").value // 1000
    t1 = pd.Timestamp("1997-01-01").value // 1000

    def proj(t: pa.Table) -> pa.Table:
        qty = _qty_i(t.column("l_quantity"))
        us = t.column("l_shipdate").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        in96 = (us >= t0) & (us < t1)
        return pa.table({
            "l_suppkey": pc.cast(t.column("l_suppkey"), pa.int64()),
            "l_partkey": pc.cast(t.column("l_partkey"), pa.int64()),
            "qa": pa.array(qty),
            "q96": pa.array(np.where(in96, qty, 0))})

    agg = pre_aggregated_sums(
        lf.map_batches(proj, batch_format="pyarrow"),
        ["l_suppkey", "l_partkey"], ["qa", "q96"]).to_pandas()
    win = agg[(agg["q96"] * 2 > agg["qa"]) & (agg["q96"] > 0)]
    sk = np.unique(win["l_suppkey"].to_numpy().astype(np.int64))
    names = {int(k): str(n) for k, n in zip(
        sup2.column("s_suppkey").to_pylist(),
        sup2.column("s_name").to_pylist())}
    return pd.DataFrame({
        "s_suppkey": sk,
        "s_name": np.array([names[int(k)] for k in sk], dtype=object)})


def q_l_diversity(sf_dir: str, l_min: int = 3):
    """l-diversity privacy audit (k_anonymity's sibling): per
    quasi-identifier group (c_nationkey, c_mktsegment), the count of
    DISTINCT sensitive values (o_orderpriority) over the customer's
    orders. Customer attrs broadcast once; distinct via the tiny
    triple-count fold."""
    from spapy_ray.stages.relational import (broadcast_join,
                                             pre_aggregated_sums)

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey", "c_mktsegment"]) \
        .to_arrow_refs()
    import ray
    cust_t = pa.concat_tables(ray.get(cust))
    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderpriority"])
    j = broadcast_join(orders, cust_t, key="o_custkey",
                       small_key="c_custkey")
    triple = pre_aggregated_sums(
        j.map_batches(lambda t: pa.table({
            "c_nationkey": pc.cast(t.column("c_nationkey"), pa.int64()),
            "c_mktsegment": t.column("c_mktsegment"),
            "pri": t.column("o_orderpriority")}),
            batch_format="pyarrow"),
        ["c_nationkey", "c_mktsegment", "pri"], [],
        count_alias="n").to_pandas()
    g = triple.groupby(["c_nationkey", "c_mktsegment"], sort=False) \
        .agg(n_orders=("n", "sum"), l_div=("pri", "size")).reset_index()
    g["safe"] = (g["l_div"] >= l_min).astype(np.int64)
    return g.astype({"c_nationkey": np.int64, "n_orders": np.int64,
                     "l_div": np.int64})


def q_hotspot_cube(sf_dir: str):
    """Space-time hot-spot cube (Getis-Ord-style): pages binned into
    (1°-cell x, cell y, crawl hour) voxels; each voxel's 3x3x3
    space-time neighborhood sum computed by SPARSE SCATTER — every
    occupied voxel's count is re-keyed to its 27 neighbors (one
    vectorized repeat+tile expansion) and a bucketed fold sums them;
    an inner hash join restricts to occupied voxels. No dense grid is
    ever built. Voxels travel as ONE packed int64 key — the 3-key ray
    groupby here cost 7.1 s at sf0.1 (440k near-unique voxels through
    the default sort shuffle) vs 0.5 s bucketed. hot ⟺ neighborhood
    mean > 2× the global occupied-cell mean: s27·C > 54·N in
    integers."""
    from ray.data.aggregate import Sum

    from spapy_ray.stages.distjoin import _fixed5
    from spapy_ray.stages.relational import bucketed_group_agg

    geo = _geo(sf_dir)

    def pack(hx, hy, hr):
        return ((hx + 1) * 512 + (hy + 1)) * (1 << 20) + (hr + 1)

    def voxel(t: pa.Table) -> pa.Table:
        lon5 = _fixed5(t.column("lon")).astype(np.int64)
        lat5 = _fixed5(t.column("lat")).astype(np.int64)
        us = t.column("warc_ts").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({"key": pa.array(pack(
            (lon5 + 18_000_000) // 100_000,
            (lat5 + 8_500_000) // 100_000,
            us // 3_600_000_000))})

    def cfold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("key", sort=False).size().reset_index(name="n")
        return out.astype({"n": np.int64})

    counts = bucketed_group_agg(
        geo.map_batches(voxel, batch_format="pyarrow"),
        "key", cfold).materialize()

    tot = counts.aggregate(Sum("n", alias_name="N"))
    N, C = int(tot["N"]), counts.count()

    OFF = np.array([(dx, dy, dt) for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1) for dt in (-1, 0, 1)],
                   dtype=np.int64)
    # neighbor key deltas are linear in the pack: d = (dx*512 + dy)
    # * 2^20 + dt
    DELTA = (OFF[:, 0] * 512 + OFF[:, 1]) * (1 << 20) + OFF[:, 2]
    CENTER = int(np.nonzero(DELTA == 0)[0][0])

    def scatter(t: pa.Table) -> pa.Table:
        # center count rides the scatter (c = n on the delta-0 row,
        # 0 elsewhere), so ONE bucketed fold yields both s27 and n —
        # no join back to the counts table (1.8 s of union-sort
        # saved at sf0.1)
        key = t.column("key").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = len(t)
        c = np.zeros((m, 27), dtype=np.int64)
        c[:, CENTER] = n
        return pa.table({
            "key": pa.array(np.repeat(key, 27)
                            + np.tile(DELTA, m)),
            "s": pa.array(np.repeat(n, 27)),
            "c": pa.array(c.reshape(-1))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("key", sort=False)[["s", "c"]].sum() \
            .reset_index()
        out = out[out["c"] > 0]          # occupied voxels only
        return out.astype({"s": np.int64, "c": np.int64})

    j = bucketed_group_agg(
        counts.map_batches(scatter, batch_format="pyarrow"),
        "key", fold)

    def final(t: pa.Table) -> pa.Table:
        key = t.column("key").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        s = t.column("s").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        hot = (s * C > 54 * N).astype(np.int64)
        hr = key % (1 << 20) - 1
        q = key >> 20
        return pa.table({
            "hx": pa.array(q // 512 - 1),
            "hy": pa.array(q % 512 - 1),
            "hr": pa.array(hr),
            "n": pc.cast(t.column("c"), pa.int64()),
            "s27": pa.array(s), "hot": pa.array(hot)})

    return j.map_batches(final, batch_format="pyarrow")


def q_zone_lang_mix(sf_dir: str):
    """Per-zone language mix over the spatial join (the
    geo-stratified corpus composition report): PIP join → (zone,
    lang) count combiner → majority language per zone on the tiny
    fold (ties: count desc, lang asc)."""
    from spapy_ray.sources.zones import zones_table
    from spapy_ray.stages.join import pip_join
    from spapy_ray.stages.relational import pre_aggregated_sums

    joined = pip_join(_geo(sf_dir), zones_table(200),
                      left_columns=["url", "lang", "lon", "lat"])
    c = pre_aggregated_sums(
        joined.map_batches(
            lambda t: t.select(["zone_id", "lang"]),
            batch_format="pyarrow"),
        ["zone_id", "lang"], [], count_alias="n").to_pandas()
    c["n"] = c["n"].astype(np.int64)
    c["zone_id"] = c["zone_id"].astype(np.int64)
    c = c.sort_values(["zone_id", "n", "lang"],
                      ascending=[True, False, True], kind="stable")
    agg = c.groupby("zone_id", sort=True).agg(
        n_pages=("n", "sum"), n_langs=("lang", "size"),
        top_lang=("lang", "first"), top_n=("n", "first")) \
        .reset_index()
    return agg.astype({"n_pages": np.int64, "n_langs": np.int64,
                       "top_n": np.int64})


def q_geo_corpus_prep(sf_dir: str, min_tokens: int = 8, cap: int = 50):
    """GEO-stratified corpus prep — the composite a spatial training
    mix runs: geocode → PIP join (zones broadcast) → token-count
    quality gate → per-zone cap of ``cap`` docs in deterministic
    fnv(url) order (the seedless shuffle) via grouped_topk's
    combiner. Output (zone_id, url, rank) — the manifest a packing
    stage would consume."""
    from spapy_ray.kernels.hashing import fnv1a64
    from spapy_ray.sources.zones import zones_table
    from spapy_ray.stages.join import pip_join
    from spapy_ray.stages.relational import grouped_topk

    joined = pip_join(_geo(sf_dir), zones_table(200),
                      left_columns=["url", "text", "lon", "lat"])

    def gate(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        ntok = pc.cast(pc.list_value_length(
            pc.split_pattern(txt, " ")), pa.int64())
        url = t.column("url")
        if isinstance(url, pa.ChunkedArray):
            url = url.combine_chunks()
        hv = fnv1a64(url)
        out = pa.table({
            "zone_id": pc.cast(t.column("zone_id"), pa.int64()),
            "url": url,
            "hv": pa.array(hv.astype(np.uint64))})
        return out.filter(pc.greater_equal(ntok, min_tokens))

    gated = joined.map_batches(gate, batch_format="pyarrow")
    top = grouped_topk(gated, "zone_id", "hv", cap,
                       descending=False, tie_cols=["url"])
    return top.map_batches(
        lambda t: t.select(["zone_id", "url", "rank"]),
        batch_format="pyarrow")


def q_zone_recency(sf_dir: str):
    """Per-zone crawl freshness: page count and latest crawl
    timestamp (the staleness report a regional recrawl scheduler
    reads). Max/count partials per batch, tiny groupby fold."""
    from ray.data.aggregate import Max, Sum

    from spapy_ray.sources.zones import zones_table
    from spapy_ray.stages.join import pip_join

    joined = pip_join(_geo(sf_dir), zones_table(200),
                      left_columns=["url", "warc_ts", "lon", "lat"])

    def partial(t: pa.Table) -> pa.Table:
        df = pa.table({
            "zone_id": pc.cast(t.column("zone_id"), pa.int64()),
            "us": pc.cast(t.column("warc_ts"), pa.int64())
        }).to_pandas()
        g = df.groupby("zone_id", sort=False)["us"] \
            .agg(["max", "size"]).reset_index()
        g.columns = ["zone_id", "last_us", "n_pages"]
        return pa.Table.from_pandas(g, preserve_index=False)

    out = joined.map_batches(partial, batch_format="pyarrow") \
        .groupby("zone_id") \
        .aggregate(Max("last_us", alias_name="last_us"),
                   Sum("n_pages", alias_name="n_pages")) \
        .to_pandas().sort_values("zone_id")
    return out.reset_index(drop=True).astype(np.int64)


def q_zone_density(sf_dir: str):
    """Per-zone page density (pages per square degree, integer ppm
    quotient against the closed-form zone area) — the spatial
    normalization a coverage report needs before comparing regions of
    different sizes."""
    from spapy_ray.sources.zones import U, zone_params, zones_table
    from spapy_ray.stages.join import pip_join
    from spapy_ray.stages.relational import pre_aggregated_count

    joined = pip_join(_geo(sf_dir), zones_table(200),
                      left_columns=["url", "lon", "lat"])
    c = pre_aggregated_count(
        joined.map_batches(lambda t: t.select(["zone_id"]),
                           batch_format="pyarrow"),
        "zone_id", alias="n_pages").to_pandas()
    c["zone_id"] = c["zone_id"].astype(np.int64)
    c["n_pages"] = c["n_pages"].astype(np.int64)

    def area_u2(z: int) -> int:
        p = zone_params(z)
        w, h, w2, h2 = p["w"], p["h"], p["w2"], p["h2"]
        s = p["shape"]
        if s in (0, 1):
            return w * h
        if s == 2:
            return w * h2 + w2 * (h - h2)
        return w2 * h2 + (w - w2 - 5000) * (h - h2 - 5000)

    c["area_u2"] = c["zone_id"].map(area_u2).astype(np.int64)
    # pages per square degree, ppm: 1e6 * n * U^2 // area_u2
    c["density_ppm"] = (1_000_000 * c["n_pages"] * (U * U)) \
        // c["area_u2"]
    return c.sort_values("zone_id").reset_index(drop=True) \
        .astype({"density_ppm": np.int64})


def q_gpkg_roundtrip(sf_dir: str):
    """Native OGC GeoPackage I/O (sources/gpkg.py — sqlite3 stdlib
    container, GeoPackageBinary geometry blobs wrapping the repo's
    own WKB; the reference reads .gpkg transparently through
    fiona/GDAL) pushed through the value-hash gate: the zone layer is
    written to .gpkg, read back, and measured. WKB passes through the
    blob header byte-exactly and int64/float/string attributes
    round-trip typed through SQLite, so bounds + fixed-point area of
    the reloaded layer are BIT-IDENTICAL to computing them on the
    original table (oracle: q_zone_bounds_area, like shp/geojson)."""
    import os
    import shutil
    import tempfile

    from spapy_ray.sources.gpkg import read_gpkg, write_gpkg
    from spapy_ray.stages.measures import measure_wkb_table

    d = tempfile.mkdtemp(prefix="spapy_gpkg_")
    try:
        path = os.path.join(d, "zones.gpkg")
        write_gpkg(zones_table(), path)
        back = read_gpkg(path)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return measure_wkb_table(back).select(
        ["zone_id", "name", "minx", "miny", "maxx", "maxy", "area"])


def q_geoparquet_roundtrip(sf_dir: str):
    """GeoParquet interchange (public spec: file-level "geo" metadata
    naming the WKB column, geometry types and bbox — the modern
    parquet convention fiona/GDAL-era users migrate to): zones →
    .parquet with geo metadata → read back (metadata validated) →
    measured. WKB is stored verbatim, so the zone_bounds_area twin is
    bit-exact, like shp/geojson/gpkg."""
    import os
    import shutil
    import tempfile

    from spapy_ray.sources.gpkg import read_geoparquet, \
        write_geoparquet
    from spapy_ray.stages.measures import measure_wkb_table

    d = tempfile.mkdtemp(prefix="spapy_geopq_")
    try:
        path = os.path.join(d, "zones.parquet")
        write_geoparquet(zones_table(), path)
        back, geo = read_geoparquet(path)
        assert geo["primary_column"] == "geom_wkb"
        assert geo["columns"]["geom_wkb"]["encoding"] == "WKB"
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return measure_wkb_table(back).select(
        ["zone_id", "name", "minx", "miny", "maxx", "maxy", "area"])
