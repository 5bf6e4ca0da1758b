"""Raster query pipelines (split from queries.py; registry order lives in
pipelines/queries.py)."""

from spapy_ray.pipelines.qcommon import *  # noqa: F401,F403


def q_zonal_stats(sf_dir: str):
    from spapy_ray.stages.raster import zonal_stats

    ds, meta = _dem()
    return zonal_stats(ds, zones_table(), meta, dtype="int32")


def q_raster_histogram(sf_dir: str):
    from spapy_ray.stages.raster import raster_histogram

    ds, meta = _dem()
    return raster_histogram(ds, dtype="int32", tile_size=meta.tile_size,
                            nbins=16, lo=0.0, hi=256.0)


def q_raster_minmax(sf_dir: str):
    from spapy_ray.stages.raster import raster_minmax

    ds, meta = _dem()
    row = raster_minmax(ds, dtype="int32", tile_size=meta.tile_size)
    out = pd.DataFrame([row])
    out["min_z"] = out["min_z"].astype(np.int64)
    out["max_z"] = out["max_z"].astype(np.int64)
    out["n_pixels"] = out["n_pixels"].astype(np.int64)
    return out


def q_raster_diff_stats(sf_dir: str):
    """raster ⊗ raster subtract via the tile-key co-partition join,
    then global stats of the diff."""
    from ray.data.aggregate import Max, Min, Sum

    from spapy_ray.stages.raster import decode_tile, tile_binary_math

    a, meta = _dem(0)
    b, _ = _dem(1)
    diff = tile_binary_math(a, b, "subtract", dtype="int32",
                            tile_size=meta.tile_size)

    def partial(t: pa.Table) -> pa.Table:
        sums, mins, maxs, cnts = [], [], [], []
        for buf in t.column("data").to_pylist():
            arr = decode_tile(buf, "int32", meta.tile_size).astype(np.int64)
            sums.append(int(arr.sum()))
            mins.append(int(arr.min()))
            maxs.append(int(arr.max()))
            cnts.append(int(arr.size))
        return pa.table({"s": pa.array(sums, type=pa.int64()),
                         "mn": pa.array(mins, type=pa.int64()),
                         "mx": pa.array(maxs, type=pa.int64()),
                         "c": pa.array(cnts, type=pa.int64())})

    row = diff.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("s", alias_name="sum_d"), Min("mn", alias_name="min_d"),
        Max("mx", alias_name="max_d"), Sum("c", alias_name="n_pixels"))
    return pd.DataFrame([row])


def q_reclassify_hist(sf_dir: str):
    """reclassify the int DEM into 4 classes then count per class."""
    from ray.data.aggregate import Sum

    from spapy_ray.stages.raster import decode_tile, reclassify

    ds, meta = _dem()
    rc = reclassify(ds, bounds=[0, 64, 128, 192, 256], values=[1, 2, 3, 4],
                    dtype="int32", tile_size=meta.tile_size)

    def partial(t: pa.Table) -> pa.Table:
        cls, cnt = [], []
        for buf in t.column("data").to_pylist():
            a = decode_tile(buf, "int32", meta.tile_size).ravel()
            c = np.bincount(a, minlength=5)
            nz = np.nonzero(c)[0]
            cls.append(nz.astype(np.int64))
            cnt.append(c[nz].astype(np.int64))
        return pa.table({"class": pa.array(np.concatenate(cls)),
                         "n": pa.array(np.concatenate(cnt))})

    return rc.map_batches(partial, batch_format="pyarrow") \
        .groupby("class").aggregate(Sum("n", alias_name="n_pixels")) \
        .select_columns(["class", "n_pixels"])


def q_raster_crop_minmax(sf_dir: str):
    """Pixel-exact crop to a non-tile-aligned window, then global
    min/max over the ragged tile table (crop fragments → groupby(dst
    tile) assembly → aggregate)."""
    from spapy_ray.stages.raster import crop_pixels, raster_minmax

    ds, meta = _dem()
    px0, py0, px1, py1 = CROP_WINDOW
    cropped, cmeta = crop_pixels(ds, meta, px0, py0, px1, py1,
                                 dtype="int32")
    row = raster_minmax(cropped, dtype="int32", tile_size=cmeta.tile_size)
    out = pd.DataFrame([row])
    for c in ("min_z", "max_z", "n_pixels"):
        out[c] = out[c].astype(np.int64)
    return out


def q_dedup_clusters(sf_dir: str, threshold: float = 0.8):
    """Cluster-level dedup: connected components over the verified
    near-dup pair graph, each clustered doc mapped to its component's
    minimum doc_id (the canonical representative). Components run
    distributed hash-to-min (stages/components.py) with a
    violated-edge convergence certificate; the oracle recomputes the
    exact pair graph all-pairs and resolves components with a
    recursive CTE."""
    from spapy_ray.stages.neardup import near_dup_clusters

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def keyed(t: pa.Table) -> pa.Table:
        return t.append_column("key", t.column("doc_id"))

    # components_mode pinned "distributed" so the driver hash-checks
    # the scale path (same policy as the polygonize queries); the
    # library default is "auto" (driver closure below 2M edges)
    return near_dup_clusters(ds.map_batches(keyed, batch_format="pyarrow"),
                             key_col="key", threshold=threshold,
                             verify="join", components_mode="distributed")


def q_warp_equirect(sf_dir: str):
    """Projective warp through the full distributed machinery (route
    by forward-projected footprints → inverse-project dst pixel
    centers → nearest sample), reduced to per-tile integer sums. The
    equirect chain is pure * / + degrees() arithmetic, which DuckDB
    reproduces bit-for-bit, so the SQL twin recomputes every pixel."""
    from spapy_ray.stages.raster import decode_tile, warp_to_crs

    ds, meta = _dem()
    dst = warp_dst_meta()
    warped, dmeta = warp_to_crs(ds, meta, "equirect", dst=dst,
                                dtype="int32", method="nearest")

    def stats(t: pa.Table) -> pa.Table:
        hs = t.column("h").to_pylist()
        ws = t.column("w").to_pylist()
        sums, counts = [], []
        for i, b in enumerate(t.column("data").to_pylist()):
            a = decode_tile(b, "int32", dmeta.tile_size, hs[i], ws[i])
            sums.append(int(a.astype(np.int64).sum()))
            counts.append(int(a.size))
        return pa.table({"tx": pc.cast(t.column("tx"), pa.int64()),
                         "ty": pc.cast(t.column("ty"), pa.int64()),
                         "sum_z": pa.array(sums, type=pa.int64()),
                         "n_px": pa.array(counts, type=pa.int64())})

    return warped.map_batches(stats, batch_format="pyarrow")


def q_resample_nearest(sf_dir: str):
    """Nearest-neighbor resample of the int DEM onto an offset coarser
    grid (the reference's 'really slow' NearestNeighbor pixel loop,
    SpaRasters.py:1390-1498, as the distributed inverse-mapping
    route→mosaic→gather), reduced to per-tile integer sums. The SQL
    twin recomputes every dst pixel's source index with the same
    float ops."""
    from spapy_ray.sources.rasters import DEM_META, RasterMeta, \
        synth_dem_dataset
    from spapy_ray.stages.raster import decode_tile, resample_to_grid

    dst = RasterMeta(**RESAMPLE_DST)
    out = resample_to_grid(synth_dem_dataset(DEM_META, kind="int"),
                           DEM_META, dst, dtype="int32", method="nearest")

    def stats(t: pa.Table) -> pa.Table:
        txs = t.column("tx").to_pylist()
        tys = t.column("ty").to_pylist()
        sums, counts = [], []
        for i, b in enumerate(t.column("data").to_pylist()):
            h = min(dst.tile_size, dst.height - tys[i] * dst.tile_size)
            w = min(dst.tile_size, dst.width - txs[i] * dst.tile_size)
            a = decode_tile(b, "int32", dst.tile_size, h, w)
            sums.append(int(a.astype(np.int64).sum()))
            counts.append(int(a.size))
        return pa.table({"tx": pc.cast(t.column("tx"), pa.int64()),
                         "ty": pc.cast(t.column("ty"), pa.int64()),
                         "sum_z": pa.array(sums, type=pa.int64()),
                         "n_px": pa.array(counts, type=pa.int64())})

    return out.map_batches(stats, batch_format="pyarrow")


def q_terrain_stats(sf_dir: str):
    """TRI / TPI / roughness over the INT DEM (distributed 1-px halo
    stencils), reduced to per-tile integer sums: tri*8 and tpi*8 are
    exact integers (sum of 8 integer diffs / 8c - sum), roughness is
    max-min of ints — the SQL twin is pure integer arithmetic with
    edge-clamped neighbors, bit-exact by construction."""
    from spapy_ray.sources.rasters import DEM_META, synth_dem_dataset
    from spapy_ray.stages.raster import (decode_tile, roughness_kernel,
                                         stencil_op_multi, tpi_kernel,
                                         tri_kernel)

    T = DEM_META.tile_size
    # all three stencils share one halo exchange + one groupby(tile)
    # (stencil_op_multi) — three stencil_op calls would synthesize and
    # shuffle the DEM three times
    multi = stencil_op_multi(
        synth_dem_dataset(DEM_META, kind="int"), DEM_META,
        {"tri": tri_kernel, "tpi": tpi_kernel, "rough": roughness_kernel},
        dtype="int32")

    SCALES = {"tri": ("sum_tri8", 8), "tpi": ("sum_tpi8", 8),
              "rough": ("sum_rough", 1)}

    def stats(t: pa.Table) -> pa.Table:
        cols = {"tx": pc.cast(t.column("tx"), pa.int64()),
                "ty": pc.cast(t.column("ty"), pa.int64())}
        for key, (name, scale) in SCALES.items():
            sums = []
            for b in t.column(f"data_{key}").to_pylist():
                a = decode_tile(b, "float32", T).astype(np.float64)
                sums.append(int(np.rint(a * scale).astype(np.int64).sum())
                            if scale != 1 else
                            int(np.rint(a).astype(np.int64).sum()))
            cols[name] = pa.array(sums, type=pa.int64())
        return pa.table(cols)

    out = multi.map_batches(stats, batch_format="pyarrow").to_pandas()
    return out.sort_values(["tx", "ty"]).reset_index(drop=True)[
        ["tx", "ty", "sum_tri8", "sum_tpi8", "sum_rough"]]


def q_contour_lines(sf_dir: str):
    """Contour over the INT DEM at half-integer levels (crossing
    tests are exact integer comparisons) through the FULL Dataset
    path — contour(as_dataset=True): per-tile marching squares →
    distributed chain merge (chains stitched inside hash(root)
    buckets) → line_id via window_over(row_number) partitioned by
    level — reduced to per-level topological invariants the SQL twin
    derives from the generator CTE: open-line count (= boundary
    crossings / 2) and total grid crossings (= stitched vertices
    minus closed-loop closures). A dropped/duplicated/mis-joined
    segment anywhere in the distributed stitch breaks the counts.
    No whole-line-table driver materialization (VERDICT r3 #2): only
    the 3-row per-level aggregate lands on the driver. The line_id
    numbering (not SQL-derivable — the twin cannot count closed
    loops without a recursive CC CTE) is self-checked here: per
    level, sum(line_id) must equal n(n-1)/2, i.e. the distributed
    row_number emitted exactly 0..n-1. Geometry exactness is covered
    in pytest (cone fixture vs whole-array kernel)."""
    from ray.data.aggregate import Count, Max, Sum

    from spapy_ray.sources.rasters import DEM_META, synth_dem_dataset
    from spapy_ray.stages.contour import contour

    # with_geometry=False: the per-level invariants never read the
    # WKB, and hauling ~66k line geometries through the merge +
    # window shuffles tripled the query for nothing (BENCH r4 local
    # A/B 28.9 s → with stats-only lines the full Dataset path is
    # back near the r3 cost). line_id is still assigned distributed.
    lines = contour(synth_dem_dataset(DEM_META, kind="int"), DEM_META,
                    CONTOUR_LEVELS, dtype="int32", as_dataset=True,
                    with_geometry=False)

    def partial(t: pa.Table) -> pa.Table:
        cl = t.column("closed").to_numpy()
        npts = t.column("n_points").to_numpy()
        return pa.table({
            "level": t.column("level"),
            "open1": pa.array((~cl).astype(np.int64)),
            "cr": pa.array((npts - cl.astype(np.int64)).astype(np.int64)),
            "lid": t.column("line_id")})

    agg = lines.map_batches(partial, batch_format="pyarrow") \
        .groupby("level").aggregate(
            Sum("open1", alias_name="o"), Sum("cr", alias_name="c2"),
            Count(alias_name="n"), Sum("lid", alias_name="lidsum")) \
        .to_pandas()

    rows = []
    for lv in CONTOUR_LEVELS:
        mrow = agg[agg["level"] == lv]
        n = int(mrow["n"].sum())
        lidsum = int(mrow["lidsum"].sum())
        if lidsum != n * (n - 1) // 2:
            raise AssertionError(
                f"line_id numbering broken at level {lv}: "
                f"sum={lidsum} != {n * (n - 1) // 2} for n={n}")
        rows.append({"level": lv,
                     "n_open_lines": int(mrow["o"].sum()),
                     "n_crossings": int(mrow["c2"].sum())})
    return pd.DataFrame(rows)


def q_polygonize_components(sf_dir: str):
    """Connected same-value components of the reclassified DEM.
    component_id is renumbered by (value, bbox, size) for stable
    output; the SQL twin labels via horizontal runs + a recursive-CTE
    min-label propagation over the run-adjacency graph
    (oracle.q_polygonize_components)."""
    from spapy_ray.stages.polygonize import polygonize_components

    rc, meta = _reclassified_dem()
    # merge="distributed" exercises the scale path (min-label
    # propagation + Dataset joins) under the driver's value-hash
    # oracle; "driver"/"auto" give the identical result (pytest
    # asserts equality of the two paths)
    comp = polygonize_components(rc, meta, dtype="int32",
                                 merge="distributed")
    comp = comp.sort_values(_COMP_SORT).reset_index(drop=True)
    comp["component_id"] = np.arange(len(comp), dtype=np.int64)
    return comp[["component_id", "value", "n_pixels",
                 "minx", "miny", "maxx", "maxy", "n_tiles"]]


def q_polygonize_polygons(sf_dir: str):
    """Components + ring-derived area: the signed shoelace sum over
    each component's directed boundary edges (inside-on-left; exact
    integers). For a correct boundary extraction ring_area equals
    n_pixels — the oracle emits n_pixels for both columns, so any
    dropped/misattributed boundary edge breaks the hash."""
    from spapy_ray.stages.polygonize import polygonize_components

    rc, meta = _reclassified_dem()
    comp = polygonize_components(rc, meta, dtype="int32",
                                 with_ring_area=True, merge="distributed")
    comp = comp.sort_values(_COMP_SORT).reset_index(drop=True)
    comp["component_id"] = np.arange(len(comp), dtype=np.int64)
    return comp[["component_id", "value", "n_pixels", "ring_area",
                 "minx", "miny", "maxx", "maxy"]]


def q_hillshade_stats(sf_dir: str):
    """Hillshade over the INT DEM (trig-free Horn kernel — every op
    IEEE-deterministic), reduced to per-tile integer sums of
    floor(shade * 16). Per-pixel float32 shade values are bit-exact
    against the SQL twin (oracle.q_hillshade_stats), so the integer
    quantization + sum match exactly — a full value-hash check of the
    distributed halo-stencil path."""
    from spapy_ray.sources.rasters import DEM_META, synth_dem_dataset
    from spapy_ray.stages.raster import decode_tile, hillshade

    hs = hillshade(synth_dem_dataset(DEM_META, kind="int"), DEM_META,
                   dtype="int32")

    def stats(t: pa.Table) -> pa.Table:
        sums, counts = [], []
        for b in t.column("data").to_pylist():
            a = decode_tile(b, "float32", DEM_META.tile_size)
            q = np.floor(a.astype(np.float64) * 16.0).astype(np.int64)
            sums.append(int(q.sum()))
            counts.append(int(q.size))
        return pa.table({"tx": pc.cast(t.column("tx"), pa.int64()),
                         "ty": pc.cast(t.column("ty"), pa.int64()),
                         "sum_q": pa.array(sums, type=pa.int64()),
                         "n_px": pa.array(counts, type=pa.int64())})

    return hs.map_batches(stats, batch_format="pyarrow")


def q_raster_math_stats(sf_dir: str):
    """Scalar/unary raster-algebra chain (reference Math dispatch +
    one-liners, SpaRasters.py:894-985): multiply(3) -> swap-subtract
    500-a with nodata=0 masking -> abs -> square -> minimum(40000),
    reduced to per-tile int stats. Every step is exact int32
    arithmetic, so the CASE/least SQL twin value-hashes the whole op
    table dispatch, the swap normalization and the nodata mask."""
    from spapy_ray.sources.rasters import DEM_META, synth_dem_dataset
    from spapy_ray.stages.raster import tile_math

    T = DEM_META.tile_size
    ds = synth_dem_dataset(DEM_META, kind="int")
    ds = tile_math(ds, "multiply", 3, dtype="int32", tile_size=T)
    ds = tile_math(ds, "subtract", 500, swap=True, nodata=0,
                   dtype="int32", tile_size=T)
    ds = tile_math(ds, "abs", dtype="int32", tile_size=T)
    ds = tile_math(ds, "square", dtype="int32", tile_size=T)
    ds = tile_math(ds, "minimum", 40000, dtype="int32", tile_size=T)
    return _tile_int_stats(ds, "int32", T)


def q_asc_roundtrip(sf_dir: str):
    """Native AAIGrid Save/Load (sources/aaigrid.py; reference writes
    .asc via gdal's AAIGrid driver, SpaRasters.py:752-824) under the
    value-hash gate: the int DEM on a square-pixel meta (AAIGrid has
    one cellsize) is written to .asc text, read back, re-tiled and
    reduced to per-tile stats against the closed-form pixel twin."""
    import os
    import shutil
    import tempfile

    from spapy_ray.sources.aaigrid import read_aaigrid, write_aaigrid
    from spapy_ray.sources.rasters import RasterMeta, synth_dem_dataset

    meta = RasterMeta(width=512, height=512, tile_size=64,
                      x_min=0.0, y_max=128.0, pixel_w=0.25,
                      pixel_h=-0.25)
    d = tempfile.mkdtemp(prefix="spapy_asc_")
    try:
        path = os.path.join(d, "dem.asc")
        write_aaigrid(synth_dem_dataset(meta, kind="int"), meta, path,
                      dtype="int32")
        # read_aaigrid parses on the driver (interchange format): the
        # returned Dataset holds in-memory blocks, so the temp dir can
        # go away before execution
        back, bmeta, _ = read_aaigrid(path, tile_size=64)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert bmeta.width == meta.width and bmeta.pixel_w == meta.pixel_w
    return _tile_int_stats(back, "int32", 64)


def q_tif_roundtrip(sf_dir: str):
    """Native tiled GeoTIFF Save/Load (sources/geotiff.py; reference
    routes .tif through gdal's GTiff driver, SpaRasters.py:752-871)
    under the value-hash gate. The grid is deliberately RAGGED
    (500x420 on 64-pixel tiles) with deflate compression and a
    GDAL_NODATA tag, so edge-tile padding, crop-on-read, zlib and
    the geo tags are all inside the hash: write → read → per-tile
    stats vs the closed-form pixel twin."""
    import os
    import shutil
    import tempfile

    from spapy_ray.sources.geotiff import read_geotiff, write_geotiff
    from spapy_ray.sources.rasters import RasterMeta, synth_dem_dataset

    meta = RasterMeta(width=500, height=420, tile_size=64,
                      x_min=-10.0, y_max=55.0, pixel_w=0.125,
                      pixel_h=-0.125)
    d = tempfile.mkdtemp(prefix="spapy_tif_")
    try:
        path = os.path.join(d, "dem.tif")
        write_geotiff(synth_dem_dataset(meta, kind="int"), meta, path,
                      dtype="int32", nodata=-9999)
        back, bmeta, nodata = read_geotiff(path)
        assert bmeta.width == meta.width and bmeta.pixel_w == meta.pixel_w
        assert nodata == -9999
        # the distributed tile fetch seeks into the file lazily —
        # materialize the decoded stats before the temp dir goes away
        out = _tile_int_stats(back, "int32", 64).to_pandas()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out


def q_render_tiles(sf_dir: str):
    """Tile rendering (SURVEY §2.9's engine-side form — SpaView/
    SpaPlot's matplotlib drawing re-expressed as a tile-server stage,
    stages/render.py): discrete color ramp over the DEM, per-tile
    integer channel sums. The PNG bytes themselves are pytest-checked
    (decode_png == classify_rgb); the driver hashes the channel sums,
    whose CASE twin is exact."""
    from spapy_ray.stages.render import render_tiles

    ds, meta = _dem()
    return render_tiles(ds, dtype="int32", tile_size=meta.tile_size,
                        include_png=False)


def q_raster_overviews(sf_dir: str):
    """COG-style sum-overview pyramid (stages/raster.raster_overviews):
    3 levels derived from ONE ancestor groupby; hashed as per-tile
    integer stats of each overview level."""
    from spapy_ray.stages.raster import raster_overviews

    ds, meta = _dem()
    ov = raster_overviews(ds, dtype="int32", tile_size=meta.tile_size,
                          levels=3)
    T = meta.tile_size

    def stats(t: pa.Table) -> pa.Table:
        sums, mins, maxs = [], [], []
        for buf in t.column("data").to_pylist():
            a = np.frombuffer(buf, dtype=np.int64).reshape(T, T)
            sums.append(int(a.sum()))
            mins.append(int(a.min()))
            maxs.append(int(a.max()))
        return pa.table({
            "level": pc.cast(t.column("level"), pa.int64()),
            "tx": pc.cast(t.column("tx"), pa.int64()),
            "ty": pc.cast(t.column("ty"), pa.int64()),
            "sum_v": pa.array(sums, type=pa.int64()),
            "min_v": pa.array(mins, type=pa.int64()),
            "max_v": pa.array(maxs, type=pa.int64()),
        })

    return ov.map_batches(stats, batch_format="pyarrow")


def q_rasterize_points(sf_dir: str):
    """Vector → raster (stages/rasterize.rasterize_points): per-pixel
    point-density counts of the geocoded pages on the 512-pixel world
    grid, hashed as per-tile (n_points, n_occupied, max_px)."""
    from spapy_ray.stages.rasterize import rasterize_points

    tiles, meta = rasterize_points(
        _geo(sf_dir).select_columns(["lat", "lon"]), res=9, tile_size=64)
    T = meta.tile_size

    def stats(t: pa.Table) -> pa.Table:
        pts, occ, mx = [], [], []
        for buf in t.column("data").to_pylist():
            a = np.frombuffer(buf, dtype=np.int32)
            pts.append(int(a.sum()))
            occ.append(int(np.count_nonzero(a)))
            mx.append(int(a.max()))
        return pa.table({
            "tx": pc.cast(t.column("tx"), pa.int64()),
            "ty": pc.cast(t.column("ty"), pa.int64()),
            "n_points": pa.array(pts, type=pa.int64()),
            "n_occupied": pa.array(occ, type=pa.int64()),
            "max_px": pa.array(mx, type=pa.int64()),
        })

    return tiles.map_batches(stats, batch_format="pyarrow")


def q_resample_match_diff(sf_dir: str):
    """ResampleToMatch end-to-end (SpaRasters.py:2088-2165: bring the
    finer raster onto the coarser's grid, then raster⊗raster): the
    fine DEM nearest-resampled onto the offset coarse grid, minus an
    independent coarse-grid DEM (salt 1), through the tile-key pair
    join, reduced to per-tile integer stats. One hash covers
    resample_to_match + tile_binary_math composition."""
    from spapy_ray.sources.rasters import DEM_META, RasterMeta, \
        synth_dem_dataset
    from spapy_ray.stages.raster import (decode_tile, resample_to_match,
                                         tile_binary_math)

    dst = RasterMeta(**RESAMPLE_DST)
    a = resample_to_match(synth_dem_dataset(DEM_META, kind="int"),
                          DEM_META, dst, dtype="int32", method="nearest")
    b = synth_dem_dataset(dst, kind="int", salt=1)
    diff = tile_binary_math(a, b, "subtract", dtype="int32",
                            tile_size=dst.tile_size)

    def stats(t: pa.Table) -> pa.Table:
        txs = t.column("tx").to_pylist()
        tys = t.column("ty").to_pylist()
        hs = t.column("h").to_pylist() if "h" in t.column_names else None
        ws = t.column("w").to_pylist() if "w" in t.column_names else None
        sums, mins, maxs, cnts = [], [], [], []
        for i, buf in enumerate(t.column("data").to_pylist()):
            h = hs[i] if hs else min(dst.tile_size,
                                     dst.height - tys[i] * dst.tile_size)
            w = ws[i] if ws else min(dst.tile_size,
                                     dst.width - txs[i] * dst.tile_size)
            arr = decode_tile(buf, "int32", dst.tile_size, h, w) \
                .astype(np.int64)
            sums.append(int(arr.sum()))
            mins.append(int(arr.min()))
            maxs.append(int(arr.max()))
            cnts.append(int(arr.size))
        return pa.table({
            "tx": pc.cast(t.column("tx"), pa.int64()),
            "ty": pc.cast(t.column("ty"), pa.int64()),
            "sum_d": pa.array(sums, type=pa.int64()),
            "min_d": pa.array(mins, type=pa.int64()),
            "max_d": pa.array(maxs, type=pa.int64()),
            "n_px": pa.array(cnts, type=pa.int64()),
        })

    return diff.map_batches(stats, batch_format="pyarrow")


def q_tif_lzw_roundtrip(sf_dir: str):
    """GeoTIFF round-trip through the round-4 LZW codec (TIFF 6.0
    §13 with the early-change width bump, sources/geotiff.py): same
    ragged 500x420 grid and nodata tag as tif_roundtrip but
    compression='lzw', so the codec's bit packing, width bumps and
    table clears sit inside the value hash (oracle: the same
    closed-form pixel twin as tif_roundtrip)."""
    import os
    import shutil
    import tempfile

    from spapy_ray.sources.geotiff import read_geotiff, write_geotiff
    from spapy_ray.sources.rasters import RasterMeta, synth_dem_dataset

    meta = RasterMeta(width=500, height=420, tile_size=64,
                      x_min=-10.0, y_max=55.0, pixel_w=0.125,
                      pixel_h=-0.125)
    d = tempfile.mkdtemp(prefix="spapy_lzw_")
    try:
        path = os.path.join(d, "dem.tif")
        write_geotiff(synth_dem_dataset(meta, kind="int"), meta, path,
                      dtype="int32", nodata=-9999, compression="lzw")
        back, bmeta, nodata = read_geotiff(path)
        assert bmeta.width == meta.width and nodata == -9999
        out = _tile_int_stats(back, "int32", 64).to_pandas()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out


def q_dbscan_clusters(sf_dir: str, eps_deg: float = 0.5,
                      min_pts: int = 3):
    """Distributed grid-DBSCAN (stages/cluster.py) over the geocoded
    pages, excluding the url-fallback strip near -180 (it is one
    giant eps-chain whose recursive-CTE twin would not terminate in
    reasonable time; the engine itself handles it — pytest covers a
    dense strip). Per-cluster integer aggregates + the noise row;
    cluster ids are the canonical minimum core coordinate pack, so
    engine and oracle agree without any renumbering convention.
    components="distributed" pins the scale path (hash contraction)
    under the driver's value hash, same policy as polygonize/
    dedup_clusters."""
    import pyarrow.compute as pc

    from spapy_ray.stages.cluster import dbscan_summary

    geo = _geo(sf_dir).select_columns(["lat", "lon"])

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column("lon"), -170.0))

    pts = geo.map_batches(keep, batch_format="pyarrow")
    return dbscan_summary(pts, eps_deg=eps_deg, min_pts=min_pts,
                          components="distributed")


def q_idw_raster(sf_dir: str):
    """Inverse-distance-weighted interpolation of a per-page integer
    attribute (fnv1a(url) % 256) onto a 1-degree world grid
    (stages/rasterize.idw_tile_stats): discrete integer weights
    scale // (d2+1), exact int64 num/den per pixel, per-tile sums —
    fully order-independent, so the per-pixel SQL twin hashes
    identically. The reference has no interpolation operator at all;
    this closes the classic points→surface gap (gdal_grid territory)
    in the engine's fragment-shuffle shape."""
    from spapy_ray.kernels.hashing import fnv1a64
    from spapy_ray.sources.rasters import RasterMeta
    from spapy_ray.stages.rasterize import idw_tile_stats

    meta = RasterMeta(width=320, height=160, tile_size=32,
                      x_min=-160.0, y_max=80.0,
                      pixel_w=1.0, pixel_h=-1.0)
    geo = _geo(sf_dir).select_columns(["url", "lat", "lon"])

    def val(t: pa.Table) -> pa.Table:
        v = (fnv1a64(t.column("url")) % np.uint64(256)).astype(np.int64)
        return pa.table({"lat": t.column("lat"),
                         "lon": t.column("lon"), "v": pa.array(v)})

    pts = geo.map_batches(val, batch_format="pyarrow")
    return idw_tile_stats(pts, meta, radius_deg=2.0, value_col="v")


def q_proximity_grid(sf_dir: str):
    """Proximity raster (gdal_proximity's operator class — the
    reference has no distance-grid op): per pixel of the 1-degree
    world grid, the min squared fixed-point distance to any geocoded
    page within 2 degrees; per-tile integer aggregates
    (stages/rasterize.proximity_tile_stats). Exact int64 end to end."""
    from spapy_ray.sources.rasters import RasterMeta
    from spapy_ray.stages.rasterize import proximity_tile_stats

    meta = RasterMeta(width=320, height=160, tile_size=32,
                      x_min=-160.0, y_max=80.0,
                      pixel_w=1.0, pixel_h=-1.0)
    geo = _geo(sf_dir).select_columns(["lat", "lon"])
    return proximity_tile_stats(geo, meta, radius_deg=2.0)


def q_kde_heatmap(sf_dir: str):
    """Integer quartic-kernel density heatmap of the geocoded pages
    on the 320x160 1-degree grid (2-degree bandwidth), per-tile
    (w_sum, w_max, n_covered) — exact int64 end to end, per-pixel
    SQL twin."""
    from spapy_ray.sources.rasters import RasterMeta
    from spapy_ray.stages.rasterize import kde_tile_stats

    meta = RasterMeta(width=320, height=160, tile_size=32,
                      x_min=-160.0, y_max=80.0,
                      pixel_w=1.0, pixel_h=-1.0)
    geo = _geo(sf_dir).select_columns(["lat", "lon"])
    return kde_tile_stats(geo, meta, radius_deg=2.0)


def q_flow_direction(sf_dir: str):
    """D8 flow direction over the int DEM (one halo exchange), reduced
    to a per-tile histogram of the 9 direction codes — 64 tiles x 9
    exact integer counts, per-pixel SQL twin."""
    from spapy_ray.sources.rasters import DEM_META, synth_dem_dataset
    from spapy_ray.stages.raster import decode_tile, flow_direction

    T = DEM_META.tile_size
    dirs = flow_direction(synth_dem_dataset(DEM_META, kind="int"),
                          DEM_META)

    def hist(t: pa.Table) -> pa.Table:
        cols = {"tx": pc.cast(t.column("tx"), pa.int64()),
                "ty": pc.cast(t.column("ty"), pa.int64())}
        counts = np.zeros((len(t), 9), dtype=np.int64)
        for i, b in enumerate(t.column("data").to_pylist()):
            codes = decode_tile(b, "int32", T).astype(np.int64)
            counts[i] = np.bincount(codes.ravel(), minlength=9)
        for k in range(9):
            cols[f"c{k}"] = pa.array(counts[:, k])
        return pa.table(cols)

    out = dirs.map_batches(hist, batch_format="pyarrow").to_pandas()
    return out.sort_values(["tx", "ty"]).reset_index(drop=True)


def q_focal_majority(sf_dir: str):
    """Reclassify the int DEM into 4 classes, then a 3x3 focal
    majority (mode) filter — the classic post-classification
    smoothing chain — reduced to per-tile class histograms. The
    stencil reuses the reclassified TILE table directly (class tiles
    in, class tiles out), so the chain is reclassify → one halo
    exchange; ties to the lowest class in both engine and twin."""
    from spapy_ray.stages.raster import (decode_tile, focal_majority,
                                         reclassify)

    ds, meta = _dem()
    rc = reclassify(ds, bounds=[0, 64, 128, 192, 256],
                    values=[1, 2, 3, 4], dtype="int32",
                    tile_size=meta.tile_size)
    fm = focal_majority(rc, meta, n_classes=5)
    T = meta.tile_size

    def hist(t: pa.Table) -> pa.Table:
        cols = {"tx": pc.cast(t.column("tx"), pa.int64()),
                "ty": pc.cast(t.column("ty"), pa.int64())}
        counts = np.zeros((len(t), 5), dtype=np.int64)
        for i, b in enumerate(t.column("data").to_pylist()):
            cls = decode_tile(b, "int32", T).astype(np.int64)
            counts[i] = np.bincount(cls.ravel(), minlength=5)
        for k in range(1, 5):
            cols[f"n{k}"] = pa.array(counts[:, k])
        return pa.table(cols)

    out = fm.map_batches(hist, batch_format="pyarrow").to_pandas()
    return out.sort_values(["tx", "ty"]).reset_index(drop=True)


def q_raster_equalize(sf_dir: str):
    """Global histogram equalization of the int DEM: one histogram
    fold (256-row small side), transfer table broadcast, stateless
    remap + per-tile stats (stages/raster.equalize_stats)."""
    from spapy_ray.sources.rasters import DEM_META, synth_dem_dataset
    from spapy_ray.stages.raster import equalize_stats

    out = equalize_stats(synth_dem_dataset(DEM_META, kind="int"),
                         DEM_META).to_pandas()
    return out.sort_values(["tx", "ty"]).reset_index(drop=True)


def q_zonal_majority(sf_dir: str):
    """Zonal MAJORITY: modal 64-wide value class per zone polygon
    (broadcast STRtree membership, per-tile class-count partials,
    one zone-bucket shuffle; ties to the lowest class)."""
    from spapy_ray.stages.raster import zonal_majority

    ds, meta = _dem()
    return zonal_majority(ds, zones_table(), meta, dtype="int32")


def q_raster_stretch(sf_dir: str):
    """2-98 percentile linear stretch of the int DEM (integer clip
    bounds from the global CDF, broadcast transfer table, per-tile
    stats — stages/raster.stretch_stats)."""
    from spapy_ray.sources.rasters import DEM_META, synth_dem_dataset
    from spapy_ray.stages.raster import stretch_stats

    out = stretch_stats(synth_dem_dataset(DEM_META, kind="int"),
                        DEM_META).to_pandas()
    return out.sort_values(["tx", "ty"]).reset_index(drop=True)


def q_flow_length(sf_dir: str):
    """D8 flow-path length per cell (steps to pit), basin-
    co-partitioned walker rounds, per-tile (n, sum, max) fold —
    stages/raster.flow_length_stats."""
    from spapy_ray.sources.rasters import DEM_META, synth_dem_dataset
    from spapy_ray.stages.raster import flow_length_stats

    return flow_length_stats(synth_dem_dataset(DEM_META, kind="int"),
                             DEM_META, components_mode="distributed")


def q_raster_moran(sf_dir: str):
    """Global Moran's I of the int DEM under rook adjacency —
    exact integer spatial-autocorrelation (one halo exchange, one
    tiny partial per super-block, constant driver fold).
    moran_q = trunc(1e6 * I); components are int64-exact."""
    from spapy_ray.sources.rasters import DEM_META, synth_dem_dataset
    from spapy_ray.stages.spatialstats import moran_i

    return moran_i(synth_dem_dataset(DEM_META, kind="int"), DEM_META,
                   dtype="int32")


def q_raster_variogram(sf_dir: str):
    """Directional empirical semivariogram of the int DEM, lags 1-8
    (stages.spatialstats.directional_variogram): width-8 strip halo,
    2·8 exact integer partials per super-block."""
    from spapy_ray.sources.rasters import DEM_META, synth_dem_dataset
    from spapy_ray.stages.spatialstats import directional_variogram

    return directional_variogram(
        synth_dem_dataset(DEM_META, kind="int"), DEM_META,
        lags=8, dtype="int32")


def q_resample_bilinear(sf_dir: str):
    """Bilinear resample of the int DEM onto the offset 2.5x grid
    (gdalwarp -r bilinear parity; the reference only has the nearest
    pixel loop). Per-pixel values are quantized trunc(v * 2^20) —
    exact: the mosaic-relative float subtractions are ulp-multiple
    exact, so the engine's sample arithmetic is bit-identical to the
    twin's global-coordinate form; per-tile int64 sums/min/max."""
    from spapy_ray.sources.rasters import DEM_META, RasterMeta, \
        synth_dem_dataset
    from spapy_ray.stages.raster import decode_tile, resample_to_grid

    dst = RasterMeta(**RESAMPLE_DST)
    out = resample_to_grid(synth_dem_dataset(DEM_META, kind="int"),
                           DEM_META, dst, dtype="int32",
                           method="bilinear", out_dtype="float64")
    Q = 1 << 20

    def stats(t: pa.Table) -> pa.Table:
        txs = t.column("tx").to_pylist()
        tys = t.column("ty").to_pylist()
        sums, mins, maxs, counts = [], [], [], []
        for i, b in enumerate(t.column("data").to_pylist()):
            h = min(dst.tile_size, dst.height - tys[i] * dst.tile_size)
            w = min(dst.tile_size, dst.width - txs[i] * dst.tile_size)
            a = decode_tile(b, "float64", dst.tile_size, h, w)
            q = np.trunc(a * float(Q)).astype(np.int64)
            sums.append(int(q.sum()))
            mins.append(int(q.min()))
            maxs.append(int(q.max()))
            counts.append(int(q.size))
        return pa.table({"tx": pc.cast(t.column("tx"), pa.int64()),
                         "ty": pc.cast(t.column("ty"), pa.int64()),
                         "sum_q": pa.array(sums, type=pa.int64()),
                         "min_q": pa.array(mins, type=pa.int64()),
                         "max_q": pa.array(maxs, type=pa.int64()),
                         "n_px": pa.array(counts, type=pa.int64())})

    return out.map_batches(stats, batch_format="pyarrow")


def q_raster_lisa(sf_dir: str):
    """Tile-aggregated local Moran's I hotspot map over the int DEM
    (stages.spatialstats.local_moran_tiles): per-tile exact integer
    LISA components + quantized local statistic."""
    from spapy_ray.sources.rasters import DEM_META, synth_dem_dataset
    from spapy_ray.stages.spatialstats import local_moran_tiles

    return local_moran_tiles(synth_dem_dataset(DEM_META, kind="int"),
                             DEM_META, dtype="int32")


def q_zonal_percentiles(sf_dir: str):
    """Zonal p50/p90 elevation per zone (raster.zonal_quantiles:
    value-count partials, one zone shuffle, cumulative-histogram
    quantile_disc picks)."""
    from spapy_ray.sources.rasters import DEM_META, synth_dem_dataset
    from spapy_ray.stages.raster import zonal_quantiles

    out = zonal_quantiles(synth_dem_dataset(DEM_META, kind="int"),
                          zones_table(), DEM_META,
                          qs=(0.5, 0.9), dtype="int32").to_pandas()
    return out.sort_values("zone_id").reset_index(drop=True) \
        .astype(np.int64)


def q_stream_order(sf_dir: str):
    """Strahler stream order per tile over the int DEM's D8 forest
    (raster.strahler_stats: basin co-partition + vectorized
    topological peel) — completes the hydrology chain."""
    from spapy_ray.sources.rasters import DEM_META, synth_dem_dataset
    from spapy_ray.stages.raster import strahler_stats

    out = strahler_stats(synth_dem_dataset(DEM_META, kind="int"),
                         DEM_META, components_mode="distributed") \
        .to_pandas()
    return out.sort_values(["ty", "tx", "ord"]) \
        .reset_index(drop=True).astype(np.int64)


def q_raster_geary(sf_dir: str):
    """Global Geary's C of the int DEM under rook adjacency —
    the squared-difference sibling of raster_moran on the identical
    halo machinery (one exchange, one 5-int partial per super-block,
    constant driver fold). geary_q = trunc(1e6 * C)."""
    from spapy_ray.sources.rasters import DEM_META, synth_dem_dataset
    from spapy_ray.stages.spatialstats import geary_c

    return geary_c(synth_dem_dataset(DEM_META, kind="int"), DEM_META,
                   dtype="int32")


def q_focal_median(sf_dir: str):
    """3x3 focal MEDIAN filter over the int DEM (salt-and-pepper
    denoise; the rank-filter sibling of focal_majority) — 9 shifted
    windows sorted per pixel, element 4 is exact int. One halo
    exchange (stencil_op), reduced to per-tile integer
    sum/min/max."""
    from spapy_ray.stages.raster import decode_tile, stencil_op

    ds, meta = _dem()
    T = meta.tile_size

    def med_kernel(pad: np.ndarray) -> np.ndarray:
        z = pad.astype(np.int64)
        h, w = pad.shape[0] - 2, pad.shape[1] - 2
        stack = np.empty((9, h, w), dtype=np.int64)
        i = 0
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                stack[i] = z[dy:dy + h, dx:dx + w]
                i += 1
        stack.sort(axis=0)
        return stack[4].astype(np.int32)

    fm = stencil_op(ds, meta, med_kernel, dtype="int32",
                    out_dtype="int32")

    def stats(t: pa.Table) -> pa.Table:
        cols = {"tx": pc.cast(t.column("tx"), pa.int64()),
                "ty": pc.cast(t.column("ty"), pa.int64())}
        s = np.zeros(len(t), dtype=np.int64)
        mn = np.zeros(len(t), dtype=np.int64)
        mx = np.zeros(len(t), dtype=np.int64)
        for i, b in enumerate(t.column("data").to_pylist()):
            a = decode_tile(b, "int32", T).astype(np.int64)
            s[i], mn[i], mx[i] = a.sum(), a.min(), a.max()
        cols["med_sum"] = pa.array(s)
        cols["med_min"] = pa.array(mn)
        cols["med_max"] = pa.array(mx)
        return pa.table(cols)

    out = fm.map_batches(stats, batch_format="pyarrow").to_pandas()
    return out.sort_values(["tx", "ty"]).reset_index(drop=True)


def q_raster_integral(sf_dir: str):
    """Distributed summed-area table over the int DEM
    (stages/rasterprefix.integral_image: within-tile 2-D prefix +
    row-strip / col-strip / corner carries from two band scans),
    reduced to per-tile (corner SAT, SAT sum) — exact int64. The SQL
    twin is two chained window cumsums over the pixel CTE."""
    from spapy_ray.stages.rasterprefix import integral_image

    ds, meta = _dem()
    sat, _ = integral_image(ds, meta, dtype="int32")
    T = meta.tile_size

    def stats(t: pa.Table) -> pa.Table:
        cor, ss = [], []
        for buf in t.column("data").to_pylist():
            a = np.frombuffer(buf, dtype=np.int64).reshape(T, T)
            cor.append(int(a[-1, -1]))
            ss.append(int(a.sum()))
        return pa.table({
            "tx": pc.cast(t.column("tx"), pa.int64()),
            "ty": pc.cast(t.column("ty"), pa.int64()),
            "sat_corner": pa.array(cor, type=pa.int64()),
            "sat_sum": pa.array(ss, type=pa.int64()),
        })

    return sat.map_batches(stats, batch_format="pyarrow")


def q_raster_dt(sf_dir: str):
    """Exact L1 distance transform (stages/rasterprefix
    .distance_transform_l1 — separable min-plus passes, one int64
    carry per tile row/column per pass), marks = DEM pixels == 0;
    per-tile (n_marks, sum_d, max_d). Twin: four window scans."""
    from spapy_ray.stages.rasterprefix import distance_transform_l1

    ds, meta = _dem()
    dt, _ = distance_transform_l1(ds, meta, mark_value=0, dtype="int32")
    T = meta.tile_size

    def stats(t: pa.Table) -> pa.Table:
        nm, sd, mx = [], [], []
        for buf in t.column("data").to_pylist():
            a = np.frombuffer(buf, dtype=np.int64)
            nm.append(int((a == 0).sum()))
            sd.append(int(a.sum()))
            mx.append(int(a.max()))
        return pa.table({
            "tx": pc.cast(t.column("tx"), pa.int64()),
            "ty": pc.cast(t.column("ty"), pa.int64()),
            "n_marks": pa.array(nm, type=pa.int64()),
            "sum_d": pa.array(sd, type=pa.int64()),
            "max_d": pa.array(mx, type=pa.int64()),
        })

    return dt.map_batches(stats, batch_format="pyarrow")


def q_raster_horizon(sf_dir: str):
    """Westward line-of-sight per DEM row (stages/rasterprefix
    .horizon_visibility): quantized slope q = trunc((z - z0)·2^20 / x)
    vs the running row max — per-tile visible-pixel count and visible
    slope sum. Twin: one window max with a 1-PRECEDING frame."""
    from spapy_ray.stages.rasterprefix import horizon_visibility

    ds, meta = _dem()
    return horizon_visibility(ds, meta, dtype="int32")


def q_line_of_sight(sf_dir: str):
    """DEM line-of-sight between 40 deterministic stations: each of
    the 780 sight lines is sampled at N = max(|dx|,|dy|) integer
    steps (coordinates via trunc-division, matching DuckDB //), the
    samples gather their elevation through rasterize.sample_raster
    (tile co-partition — no per-sample tile copies), and a pair is
    visible iff no interior sample rises above the chord:
    z_t * N > z_i * N + (z_j - z_i) * t, all int64-exact."""
    from spapy_ray.sources.rasters import dem_int_value
    from spapy_ray.stages.rasterize import sample_raster
    from spapy_ray.stages.rasterprefix import _tdiv
    from spapy_ray.stages.relational import bucketed_group_agg

    ds, meta = _dem()
    K = 40
    si = np.arange(K, dtype=np.int64)
    sx = (37 * si + 11) % 512
    sy = (59 * si + 23) % 512
    sz = dem_int_value(sx, sy).astype(np.int64)
    a, b = np.triu_indices(K, k=1)
    n = np.maximum(np.abs(sx[b] - sx[a]), np.abs(sy[b] - sy[a]))
    pairs = pa.table({
        "si": pa.array(si[a]), "sj": pa.array(si[b]),
        "x0": pa.array(sx[a]), "y0": pa.array(sy[a]),
        "dx": pa.array(sx[b] - sx[a]), "dy": pa.array(sy[b] - sy[a]),
        "zi": pa.array(sz[a]), "zj": pa.array(sz[b]),
        "n": pa.array(n),
    })

    def expand(t: pa.Table) -> pa.Table:
        nn = t.column("n").to_numpy()
        reps = np.maximum(nn - 1, 0)
        idx = np.repeat(np.arange(len(t)), reps)
        tt = np.concatenate([np.arange(1, v) for v in nn]) \
            if len(t) else np.empty(0, np.int64)
        g = {c: t.column(c).to_numpy()[idx] for c in t.column_names}
        px = g["x0"] + _tdiv(g["dx"] * tt, g["n"])
        py = g["y0"] + _tdiv(g["dy"] * tt, g["n"])
        thr = g["zi"] * g["n"] + (g["zj"] - g["zi"]) * tt
        return pa.table({
            "si": pa.array(g["si"]), "sj": pa.array(g["sj"]),
            "px": pa.array(px), "py": pa.array(py),
            "thr": pa.array(thr), "n": pa.array(g["n"]),
        })

    import ray.data as rd
    samples = rd.from_arrow(pairs).map_batches(
        expand, batch_format="pyarrow")
    with_z = sample_raster(samples, ds, meta, dtype="int32")

    def blocked(t: pa.Table) -> pa.Table:
        z = t.column("z").to_numpy(zero_copy_only=False)
        nn = t.column("n").to_numpy(zero_copy_only=False)
        thr = t.column("thr").to_numpy(zero_copy_only=False)
        key = t.column("si").to_numpy(zero_copy_only=False) * 64 \
            + t.column("sj").to_numpy(zero_copy_only=False)
        return pa.table({"k": pa.array(key),
                         "b": pa.array((z * nn > thr).astype(np.int64))})

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("k", as_index=False, sort=False)["b"].sum()

    got = bucketed_group_agg(
        with_z.map_batches(blocked, batch_format="pyarrow"), "k", agg) \
        .to_pandas()
    out = pd.DataFrame({"k": si[a] * 64 + si[b], "si": si[a],
                        "sj": si[b], "n_int": n - 1})
    nb = dict(zip(got["k"], got["b"])) if len(got) else {}
    out["n_blocked"] = out["k"].map(nb).fillna(0).astype(np.int64)
    out["visible"] = (out["n_blocked"] == 0).astype(np.int64)
    return out.drop(columns=["k"]).sort_values(["si", "sj"]) \
        .reset_index(drop=True).astype(np.int64)


def q_events_ewma(sf_dir: str, k: int = 16):
    """Exact exponentially-weighted moving average per user (half-life
    one event, window K=16): dyadic weights 2^(K-1-j) make numerator
    and denominator exact int64 window sums (stages/window.window_over
    ewma_num/ewma_den kinds), and the reported ewma_x100 is the
    truncating ratio — bit-exact vs a banded row_number self-join."""
    from spapy_ray.stages.rasterprefix import _tdiv
    from spapy_ray.stages.window import window_over

    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64())
        cents = pc.cast(pc.floor(pc.add(
            pc.multiply(t.column("value"), pa.scalar(100.0)),
            pa.scalar(0.5))), pa.int64())
        return pa.table({"event_id": t.column("event_id"),
                         "user_id": t.column("user_id"),
                         "us": us, "cents": cents})

    w = window_over(
        ev.map_batches(prep, batch_format="pyarrow"),
        key_col="user_id", order_cols=["us", "event_id"],
        ops=[("ewma_num", f"ewma_num:{k}", "cents"),
             ("ewma_den", f"ewma_den:{k}", "cents")])

    def ratio(t: pa.Table) -> pa.Table:
        num = t.column("ewma_num").to_numpy(zero_copy_only=False)
        den = t.column("ewma_den").to_numpy(zero_copy_only=False)
        return t.drop_columns(["us"]).append_column(
            "ewma_x100", pa.array(_tdiv(num, den)))

    return w.map_batches(ratio, batch_format="pyarrow")


def q_raster_mosaic(sf_dir: str):
    """Mosaic two overlapping rasters with last-wins precedence (the
    gdal_merge operator class): the full salt-0 DEM under a salt-1
    patch covering tiles [2,5]x[2,5] — one bucketed tile-key dedup
    (grouped_topk k=1 by precedence) merges the tile tables without
    touching pixel payloads outside the winner; per-tile int stats."""
    from spapy_ray.sources.rasters import DEM_META, synth_dem_dataset
    from spapy_ray.stages.raster import decode_tile
    from spapy_ray.stages.relational import bucketed_group_agg

    base = synth_dem_dataset(DEM_META, kind="int", salt=0)
    patch = synth_dem_dataset(DEM_META, kind="int", salt=1)

    def tag(pri: int):
        def _f(t: pa.Table) -> pa.Table:
            tx = t.column("tx").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            ty = t.column("ty").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            keep = np.ones(len(t), dtype=bool) if pri == 0 else \
                (tx >= 2) & (tx <= 5) & (ty >= 2) & (ty <= 5)
            t = t.filter(pa.array(keep))
            tx, ty = tx[keep], ty[keep]
            return pa.table({
                "tk": pa.array(tx * 512 + ty),
                "pri": pa.array(np.full(len(tx), pri, np.int64)),
                "tx": pa.array(tx), "ty": pa.array(ty),
                "data": t.column("data"),
            })
        return _f

    u = base.map_batches(tag(0), batch_format="pyarrow").union(
        patch.map_batches(tag(1), batch_format="pyarrow"))

    def local(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["tk", "pri"], kind="mergesort")
        return df.groupby("tk", sort=False).tail(1)   # max precedence

    merged = bucketed_group_agg(u, "tk", local)
    T = DEM_META.tile_size

    def stats(t: pa.Table) -> pa.Table:
        s, mn, mx = [], [], []
        for buf in t.column("data").to_pylist():
            a = decode_tile(buf, "int32", T).astype(np.int64)
            s.append(int(a.sum()))
            mn.append(int(a.min()))
            mx.append(int(a.max()))
        return pa.table({
            "tx": pc.cast(t.column("tx"), pa.int64()),
            "ty": pc.cast(t.column("ty"), pa.int64()),
            "sum_v": pa.array(s, type=pa.int64()),
            "min_v": pa.array(mn, type=pa.int64()),
            "max_v": pa.array(mx, type=pa.int64()),
        })

    return merged.map_batches(stats, batch_format="pyarrow")


def q_rasterize_edges(sf_dir: str):
    """Burn zone boundary LINES into the 512 world grid (the line
    half of gdal_rasterize; rasterize_points covers points): zone
    edges become integer cell-range segments (exact floor arithmetic
    on the 1e-4 fixed-point bounds), stages/rasterize.burn_cells
    expands + dedups + folds per tile. Output: per tile, distinct
    burned (zone, cell) pairs and distinct zones touching it."""
    import ray.data as rd

    from spapy_ray.sources.zones import U, zone_params
    from spapy_ray.stages.rasterize import burn_cells

    n = 512

    def cx(v: int) -> int:
        return min(max((v + 180 * U) * n // (360 * U), 0), n - 1)

    def cy(v: int) -> int:
        return (n - 1) - min(max((v + 90 * U) * n // (180 * U), 0),
                             n - 1)

    rows = []
    for z in range(200):
        p = zone_params(z)
        x0, y0, w, h = p["x0"], p["y0"], p["w"], p["h"]
        w2, h2, shape = p["w2"], p["h2"], p["shape"]
        if shape in (0, 1):
            segs = [("h", y0, x0, x0 + w), ("h", y0 + h, x0, x0 + w),
                    ("v", x0, y0, y0 + h), ("v", x0 + w, y0, y0 + h)]
        elif shape == 2:
            segs = [("h", y0, x0, x0 + w),
                    ("v", x0 + w, y0, y0 + h2),
                    ("h", y0 + h2, x0 + w2, x0 + w),
                    ("v", x0 + w2, y0 + h2, y0 + h),
                    ("h", y0 + h, x0, x0 + w2),
                    ("v", x0, y0, y0 + h)]
        else:
            segs = []
            for (a, b, c, d) in ((x0, y0, x0 + w2, y0 + h2),
                                 (x0 + w2 + 5000, y0 + h2 + 5000,
                                  x0 + w, y0 + h)):
                segs += [("h", b, a, c), ("h", d, a, c),
                         ("v", a, b, d), ("v", c, b, d)]
        for kind, f, a0, a1 in segs:
            if kind == "h":
                rows.append((z, cx(a0), cx(a1), cy(f), cy(f)))
            else:
                rows.append((z, cx(f), cx(f), cy(a1), cy(a0)))

    arr = np.asarray(rows, dtype=np.int64)
    segments = rd.from_arrow(pa.table({
        "gid": pa.array(arr[:, 0]), "cx0": pa.array(arr[:, 1]),
        "cx1": pa.array(arr[:, 2]), "cy0": pa.array(arr[:, 3]),
        "cy1": pa.array(arr[:, 4])}))
    return burn_cells(segments, n=n, tile_size=64)


def q_raster_trend(sf_dir: str, k: int = 4):
    """Per-pixel temporal trend over a 4-epoch raster stack (change
    detection): slope numerator n*sum(t*v) - sum(t)*sum(v) per pixel,
    exact int64 (denominator is the constant n*sum(t^2) - sum(t)^2 =
    20) — raster.tile_stack_fold co-locates all epochs of a tile in
    ONE bucketed shuffle. Per-tile sum / rising / falling counts."""
    from spapy_ray.sources.rasters import DEM_META, synth_dem_dataset
    from spapy_ray.stages.raster import decode_tile, tile_stack_fold

    stack = [synth_dem_dataset(DEM_META, kind="int", salt=s)
             for s in range(k)]
    st = np.arange(k, dtype=np.int64).sum()

    def slope_num(arrs):
        sv = sum(arrs)
        stv = sum(t * a for t, a in enumerate(arrs))
        return k * stv - st * sv

    tiles = tile_stack_fold(stack, k, slope_num, dtype="int32",
                            tile_size=DEM_META.tile_size)
    T = DEM_META.tile_size

    def stats(t: pa.Table) -> pa.Table:
        s, up, dn = [], [], []
        for buf in t.column("data").to_pylist():
            a = decode_tile(buf, "int64", T)
            s.append(int(a.sum()))
            up.append(int((a > 0).sum()))
            dn.append(int((a < 0).sum()))
        return pa.table({
            "tx": pc.cast(t.column("tx"), pa.int64()),
            "ty": pc.cast(t.column("ty"), pa.int64()),
            "sum_slope_num": pa.array(s, type=pa.int64()),
            "n_rising": pa.array(up, type=pa.int64()),
            "n_falling": pa.array(dn, type=pa.int64()),
        })

    return tiles.map_batches(stats, batch_format="pyarrow")


def q_raster_morphology(sf_dir: str):
    """Binary morphology on the DEM's zero-mask (gdal sieve/morphology
    operator class): with v >= 0, 3x3 erosion == (window max == 0)
    and dilation == (window min == 0) — two pure min/max stencils off
    ONE shared halo exchange (stencil_op_multi). Per-tile mark /
    eroded / dilated counts; twin = LEAST/GREATEST over the 9
    edge-clamped neighbors."""
    from spapy_ray.stages.raster import decode_tile, stencil_op_multi

    ds, meta = _dem()
    T = meta.tile_size

    def win_max(pad):
        return np.max([pad[dy:dy + T, dx:dx + T]
                       for dy in range(3) for dx in range(3)], axis=0)

    def win_min(pad):
        return np.min([pad[dy:dy + T, dx:dx + T]
                       for dy in range(3) for dx in range(3)], axis=0)

    multi = stencil_op_multi(ds, meta,
                             {"wmax": win_max, "wmin": win_min,
                              "c": lambda pad: pad[1:-1, 1:-1]},
                             dtype="int32")

    def stats(t: pa.Table) -> pa.Table:
        nm, ne, nd = [], [], []
        for i in range(t.num_rows):
            mx = decode_tile(t.column("data_wmax")[i].as_py(),
                             "float32", T)
            mn = decode_tile(t.column("data_wmin")[i].as_py(),
                             "float32", T)
            c = decode_tile(t.column("data_c")[i].as_py(),
                            "float32", T)
            nm.append(int((c == 0).sum()))
            ne.append(int((mx == 0).sum()))
            nd.append(int((mn == 0).sum()))
        return pa.table({
            "tx": pc.cast(t.column("tx"), pa.int64()),
            "ty": pc.cast(t.column("ty"), pa.int64()),
            "n_marks": pa.array(nm, type=pa.int64()),
            "n_eroded": pa.array(ne, type=pa.int64()),
            "n_dilated": pa.array(nd, type=pa.int64()),
        })

    return multi.map_batches(stats, batch_format="pyarrow")


def q_cost_distance(sf_dir: str, rounds: int = 8):
    """Weighted cost-distance from the DEM's zero pixels, 8 min-plus
    relaxation rounds (raster.cost_distance — one halo stencil per
    round over the packed cost*512+value field). Per-tile reached
    count, cost sum and max over reached pixels."""
    from spapy_ray.stages.raster import cost_distance, decode_tile

    ds, meta = _dem()
    field = cost_distance(ds, meta, rounds=rounds, dtype="int32")
    T = meta.tile_size
    SENT = 1 << 40

    def stats(t: pa.Table) -> pa.Table:
        nr, sc, mc = [], [], []
        for buf in t.column("data").to_pylist():
            c = decode_tile(buf, "int64", T) // 512
            r = c < SENT
            nr.append(int(r.sum()))
            sc.append(int(c[r].sum()))
            mc.append(int(c[r].max()) if r.any() else -1)
        return pa.table({
            "tx": pc.cast(t.column("tx"), pa.int64()),
            "ty": pc.cast(t.column("ty"), pa.int64()),
            "n_reached": pa.array(nr, type=pa.int64()),
            "sum_cost": pa.array(sc, type=pa.int64()),
            "max_cost": pa.array(mc, type=pa.int64()),
        })

    return field.map_batches(stats, batch_format="pyarrow")


def q_zonal_argmax(sf_dir: str):
    """Zonal max-location (the 'zonal statistics as table' max +
    its pixel coordinates): per zone, the highest DEM value and WHERE
    it sits, ties to the smallest (py, px). One packed int64 key
    (511 - v)*2^42 + py*2^21 + px makes argmax a plain mergeable MIN
    — per-tile partials through the broadcast ZoneIndex, one tiny
    groupby, no second pass to locate the winner."""
    import ray
    from ray.data.aggregate import Min

    from spapy_ray.sources.rasters import tile_pixels
    from spapy_ray.sources.zones import zones_table
    from spapy_ray.stages.join import ZoneIndex
    from spapy_ray.stages.raster import decode_tile
    from spapy_ray.util import cached_state

    ds, meta = _dem()
    box = (ray.put(zones_table()),)
    T = meta.tile_size

    def partial(t: pa.Table) -> pa.Table:
        index = cached_state(box, ZoneIndex)
        txs = t.column("tx").to_numpy(zero_copy_only=False)
        tys = t.column("ty").to_numpy(zero_copy_only=False)
        zid, best = [], []
        for i, buf in enumerate(t.column("data").to_pylist()):
            a = decode_tile(buf, "int32", T).astype(np.int64)
            gx, gy = tile_pixels(meta, int(txs[i]), int(tys[i]))
            lon, lat = meta.pixel_center_lonlat(gx.ravel(), gy.ravel())
            pi, zi = index.query(lon, lat)
            if len(pi) == 0:
                continue
            v = a.ravel()[pi]
            key = ((511 - v) * np.int64(1 << 42)
                   + gy.ravel()[pi] * np.int64(1 << 21)
                   + gx.ravel()[pi])
            order = np.argsort(zi, kind="stable")
            zi, key = zi[order], key[order]
            uz, starts = np.unique(zi, return_index=True)
            mins = np.minimum.reduceat(key, starts)
            zid.extend(int(index.zone_ids[u]) for u in uz)
            best.extend(int(m) for m in mins)
        return pa.table({"zone_id": pa.array(zid, type=pa.int64()),
                         "k": pa.array(best, type=pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         batch_size=16, zero_copy_batch=True) \
        .groupby("zone_id").aggregate(Min("k", alias_name="k"))

    def decode(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy(zero_copy_only=False)
        return pa.table({
            "zone_id": pc.cast(t.column("zone_id"), pa.int64()),
            "max_z": pa.array(511 - (k >> 42)),
            "at_py": pa.array((k >> 21) & ((1 << 21) - 1)),
            "at_px": pa.array(k & ((1 << 21) - 1)),
        })

    return agg.map_batches(decode, batch_format="pyarrow")


def q_raster_nodata_stats(sf_dir: str, nodata: int = 255):
    """NoData-aware per-tile statistics (the reference's nodata
    contract, SpaRasters.py:113-116 geotransform + nodata field):
    value 255 masks out of count/sum/min/max; an all-nodata tile
    reports -1 sentinels. Exercises the masked-stats path end to
    end with a FILTER twin."""
    from spapy_ray.stages.raster import decode_tile

    ds, meta = _dem()
    T = meta.tile_size

    def stats(t: pa.Table) -> pa.Table:
        nv, sv, mn, mx = [], [], [], []
        for buf in t.column("data").to_pylist():
            a = decode_tile(buf, "int32", T).astype(np.int64)
            m = a != nodata
            nv.append(int(m.sum()))
            sv.append(int(a[m].sum()))
            mn.append(int(a[m].min()) if m.any() else -1)
            mx.append(int(a[m].max()) if m.any() else -1)
        return pa.table({
            "tx": pc.cast(t.column("tx"), pa.int64()),
            "ty": pc.cast(t.column("ty"), pa.int64()),
            "n_valid": pa.array(nv, type=pa.int64()),
            "sum_valid": pa.array(sv, type=pa.int64()),
            "min_valid": pa.array(mn, type=pa.int64()),
            "max_valid": pa.array(mx, type=pa.int64()),
        })

    return ds.map_batches(stats, batch_format="pyarrow")


def q_raster_blur5(sf_dir: str):
    """5x5 binomial blur as two chained 3x3 stencil passes (kernel
    composition: [1,2,1]⊗[1,2,1] twice == the 5x5 binomial with
    edge-replicated borders composing exactly) — two block-mosaic
    halo exchanges, undivided integer response (x256), per-tile
    sum/min/max."""
    from spapy_ray.stages.raster import decode_tile, stencil_op

    ds, meta = _dem()
    T = meta.tile_size
    W = ((1, 2, 1), (2, 4, 2), (1, 2, 1))

    def binom(pad: np.ndarray) -> np.ndarray:
        z = pad.astype(np.int64)
        h, w = pad.shape[0] - 2, pad.shape[1] - 2
        out = np.zeros((h, w), dtype=np.int64)
        for dy in range(3):
            for dx in range(3):
                out += W[dy][dx] * z[dy:dy + h, dx:dx + w]
        return out.astype(np.int32)

    p1 = stencil_op(ds, meta, binom, dtype="int32", out_dtype="int32")
    p2 = stencil_op(p1, meta, binom, dtype="int32", out_dtype="int32")

    def stats(t: pa.Table) -> pa.Table:
        n = len(t)
        s = np.zeros(n, dtype=np.int64)
        mn = np.zeros(n, dtype=np.int64)
        mx = np.zeros(n, dtype=np.int64)
        for i, b in enumerate(t.column("data").to_pylist()):
            a = decode_tile(b, "int32", T).astype(np.int64)
            s[i], mn[i], mx[i] = a.sum(), a.min(), a.max()
        return pa.table({
            "tx": pc.cast(t.column("tx"), pa.int64()),
            "ty": pc.cast(t.column("ty"), pa.int64()),
            "blur_sum": pa.array(s), "blur_min": pa.array(mn),
            "blur_max": pa.array(mx)})

    return p2.map_batches(stats, batch_format="pyarrow")


def q_raster_hist_match(sf_dir: str):
    """Histogram matching (radiometric normalization across scenes —
    the classic mosaicking preprocess): remap surface A's values so
    its CDF matches surface B's. Two 256-bin histogram passes (tiny
    bincount partials), the LUT lut[v] = min{u: cdfB(u) >= cdfA(v)}
    built once on the driver (dense searchsorted always lands on an
    occupied bin: cdf strictly rises at the landing index), broadcast
    into a per-tile LUT-apply + integer stats."""
    from ray.data.aggregate import Sum

    from spapy_ray.sources.rasters import DEM_META, synth_dem_dataset
    from spapy_ray.stages.raster import decode_tile

    T = DEM_META.tile_size
    a = synth_dem_dataset(DEM_META, kind="int", salt=0)
    b = synth_dem_dataset(DEM_META, kind="int", salt=1)

    def hist(ds):
        def partial(t: pa.Table) -> pa.Table:
            acc = np.zeros(256, dtype=np.int64)
            for buf in t.column("data").to_pylist():
                arr = decode_tile(buf, "int32", T)
                acc += np.bincount(arr.ravel(), minlength=256)
            v = np.nonzero(acc)[0]
            return pa.table({"v": pa.array(v.astype(np.int64)),
                             "n": pa.array(acc[v])})

        h = ds.map_batches(partial, batch_format="pyarrow") \
            .groupby("v").aggregate(Sum("n", alias_name="n")) \
            .to_pandas()
        out = np.zeros(256, dtype=np.int64)
        out[h["v"].to_numpy().astype(np.int64)] = \
            h["n"].to_numpy().astype(np.int64)
        return np.cumsum(out)

    cdf_a, cdf_b = hist(a), hist(b)
    lut = np.searchsorted(cdf_b, cdf_a, side="left").astype(np.int64)

    def apply_stats(t: pa.Table) -> pa.Table:
        n = len(t)
        s = np.zeros(n, dtype=np.int64)
        mn = np.zeros(n, dtype=np.int64)
        mx = np.zeros(n, dtype=np.int64)
        for i, buf in enumerate(t.column("data").to_pylist()):
            m = lut[decode_tile(buf, "int32", T)]
            s[i], mn[i], mx[i] = m.sum(), m.min(), m.max()
        return pa.table({
            "tx": pc.cast(t.column("tx"), pa.int64()),
            "ty": pc.cast(t.column("ty"), pa.int64()),
            "m_sum": pa.array(s), "m_min": pa.array(mn),
            "m_max": pa.array(mx)})

    return a.map_batches(apply_stats, batch_format="pyarrow")


def q_raster_log5(sf_dir: str):
    """True 5×5 Laplacian-of-Gaussian edge response — a
    NON-separable kernel, so unlike raster_blur5 it cannot chain two
    3×3 passes: this runs the generalized halo-2 block-mosaic
    exchange (stencil_op(halo=2): 2-px strips, (T+4)² pad views) in
    ONE pass. Integer kernel, zero-sum; per-tile sum/min/max."""
    from spapy_ray.stages.raster import decode_tile, stencil_op

    ds, meta = _dem()
    T = meta.tile_size

    def log5(pad: np.ndarray) -> np.ndarray:
        z = pad.astype(np.int64)
        h, w = pad.shape[0] - 4, pad.shape[1] - 4
        out = np.zeros((h, w), dtype=np.int64)
        for dy in range(5):
            for dx in range(5):
                wgt = _LOG5[dy][dx]
                if wgt:
                    out += wgt * z[dy:dy + h, dx:dx + w]
        return out.astype(np.int32)

    resp = stencil_op(ds, meta, log5, dtype="int32",
                      out_dtype="int32", halo=2)

    def stats(t: pa.Table) -> pa.Table:
        n = len(t)
        s = np.zeros(n, dtype=np.int64)
        mn = np.zeros(n, dtype=np.int64)
        mx = np.zeros(n, dtype=np.int64)
        for i, b in enumerate(t.column("data").to_pylist()):
            a = decode_tile(b, "int32", T).astype(np.int64)
            s[i], mn[i], mx[i] = a.sum(), a.min(), a.max()
        return pa.table({
            "tx": pc.cast(t.column("tx"), pa.int64()),
            "ty": pc.cast(t.column("ty"), pa.int64()),
            "log_sum": pa.array(s), "log_min": pa.array(mn),
            "log_max": pa.array(mx)})

    return resp.map_batches(stats, batch_format="pyarrow")


def q_raster_texture5(sf_dir: str):
    """5×5 local texture (variance numerator 25·Σx² − (Σx)² — the
    GLCM-free roughness feature): one halo-2 stencil pass, exact
    integers (≤ 25·255²·25 < 2^33 per pixel), per-tile stats."""
    from spapy_ray.stages.raster import decode_tile, stencil_op

    ds, meta = _dem()
    T = meta.tile_size

    def tex(pad: np.ndarray) -> np.ndarray:
        z = pad.astype(np.int64)
        h, w = pad.shape[0] - 4, pad.shape[1] - 4
        s1 = np.zeros((h, w), dtype=np.int64)
        s2 = np.zeros((h, w), dtype=np.int64)
        for dy in range(5):
            for dx in range(5):
                v = z[dy:dy + h, dx:dx + w]
                s1 += v
                s2 += v * v
        return (25 * s2 - s1 * s1).astype(np.int64)

    resp = stencil_op(ds, meta, tex, dtype="int32",
                      out_dtype="int64", halo=2)

    def stats(t: pa.Table) -> pa.Table:
        n = len(t)
        s = np.zeros(n, dtype=np.int64)
        mn = np.zeros(n, dtype=np.int64)
        mx = np.zeros(n, dtype=np.int64)
        for i, b in enumerate(t.column("data").to_pylist()):
            a = decode_tile(b, "int64", T)
            s[i], mn[i], mx[i] = a.sum(), a.min(), a.max()
        return pa.table({
            "tx": pc.cast(t.column("tx"), pa.int64()),
            "ty": pc.cast(t.column("ty"), pa.int64()),
            "tex_sum": pa.array(s), "tex_min": pa.array(mn),
            "tex_max": pa.array(mx)})

    return resp.map_batches(stats, batch_format="pyarrow")


def q_terrain_rose(sf_dir: str):
    """Terrain gradient rose: Horn integer derivatives (gx = (c+2f+i)
    − (a+2d+g), gy = (g+2h+i) − (a+2b+c)) classified into the same
    exact 45°-boundary octants as the trajectory compass rose —
    downhill direction census per raster. One halo exchange, global
    per-direction pixel counts."""
    from ray.data.aggregate import Sum

    from spapy_ray.stages.raster import stencil_op

    ds, meta = _dem()

    DIRS = np.array(["O", "E", "W", "N", "S", "NE", "NW", "SE", "SW"])

    def rose(pad: np.ndarray) -> np.ndarray:
        z = pad.astype(np.int64)
        a, b, c = z[:-2, :-2], z[:-2, 1:-1], z[:-2, 2:]
        d, f = z[1:-1, :-2], z[1:-1, 2:]
        g, h, i = z[2:, :-2], z[2:, 1:-1], z[2:, 2:]
        gx = (c + 2 * f + i) - (a + 2 * d + g)
        gy = (g + 2 * h + i) - (a + 2 * b + c)
        ax, ay = np.abs(gx), np.abs(gy)
        code = np.where(
            (gx == 0) & (gy == 0), 0,
            np.where(ax > ay, np.where(gx > 0, 1, 2),
                     np.where(ay > ax, np.where(gy > 0, 3, 4),
                              np.where(gy > 0,
                                       np.where(gx > 0, 5, 6),
                                       np.where(gx > 0, 7, 8)))))
        return code.astype(np.int32)

    coded = stencil_op(ds, meta, rose, dtype="int32",
                       out_dtype="int32")

    def counts(t: pa.Table) -> pa.Table:
        from spapy_ray.stages.raster import decode_tile

        acc = np.zeros(9, dtype=np.int64)
        for buf in t.column("data").to_pylist():
            arr = decode_tile(buf, "int32", meta.tile_size)
            acc += np.bincount(arr.ravel(), minlength=9)
        nz = np.nonzero(acc)[0]
        return pa.table({"dir": pa.array(DIRS[nz]),
                         "n_pix": pa.array(acc[nz])})

    out = coded.map_batches(counts, batch_format="pyarrow") \
        .groupby("dir").aggregate(Sum("n_pix", alias_name="n_pix")) \
        .to_pandas().sort_values("dir")
    out["n_pix"] = out["n_pix"].astype(np.int64)
    return out.reset_index(drop=True)


def q_img_roundtrip(sf_dir: str):
    """Native Erdas HFA (.img) Save/Load (sources/hfa.py; reference
    routes .img through gdal's HFA driver, SpaRasters.py:776-787)
    under the value-hash gate: same ragged 500x420 int DEM as
    q_tif_roundtrip so edge-block padding, crop-on-read and the
    Eprj_MapInfo pixel-center georeferencing all sit inside the hash
    (write -> distributed seek-read -> per-tile stats vs the
    closed-form pixel twin)."""
    import os
    import shutil
    import tempfile

    from spapy_ray.sources.hfa import read_hfa, write_hfa
    from spapy_ray.sources.rasters import RasterMeta, synth_dem_dataset

    meta = RasterMeta(width=500, height=420, tile_size=64,
                      x_min=-10.0, y_max=55.0, pixel_w=0.125,
                      pixel_h=-0.125)
    d = tempfile.mkdtemp(prefix="spapy_img_")
    try:
        path = os.path.join(d, "dem.img")
        write_hfa(synth_dem_dataset(meta, kind="int"), meta, path,
                  dtype="int32")
        back, bmeta, _ = read_hfa(path)
        assert bmeta.width == meta.width and bmeta.height == meta.height
        assert abs(bmeta.x_min - meta.x_min) < 1e-9
        assert abs(bmeta.pixel_w - meta.pixel_w) < 1e-12
        # the distributed block fetch seeks into the file lazily —
        # materialize the decoded stats before the temp dir goes away
        out = _tile_int_stats(back, "int32", 64).to_pandas()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out


def q_tif_rgb_roundtrip(sf_dir: str):
    """Multi-sample (RGB) GeoTIFF Save/Load under the value hash
    (sources/geotiff.py bands=3 — chunky PlanarConfiguration=1, LZW,
    photometric RGB; the reference reads N-band files through gdal,
    SpaRasters.py:826-871): band rows synthesize distributed,
    co-locate per tile through one bucketed shuffle into a
    sample-interleaved payload, and the read path de-interleaves each
    fetched tile back into band rows. Ragged 210x130 grid on
    64-pixel tiles keeps edge padding + crop inside the hash."""
    import os
    import shutil
    import tempfile

    import ray.data as rd

    from spapy_ray.sources.geotiff import read_geotiff, write_geotiff
    from spapy_ray.sources.rasters import RasterMeta
    from spapy_ray.stages.raster import decode_tile

    W, H, T = 210, 130, 64
    meta = RasterMeta(width=W, height=H, tile_size=T, x_min=-5.0,
                      y_max=13.0, pixel_w=0.1, pixel_h=-0.1,
                      dtype="uint8")
    ntx, nty = meta.tiles_x, meta.tiles_y

    def gen(b: pa.Table) -> pa.Table:
        ids = b.column("id").to_numpy()
        txs, tys, bands, hs, ws, bufs = [], [], [], [], [], []
        for i in ids.tolist():
            band = i % 3
            tx = (i // 3) % ntx
            ty = i // (3 * ntx)
            h = min(T, H - ty * T)
            w = min(T, W - tx * T)
            y, x = np.mgrid[0:h, 0:w]
            a = (((tx * T + x) * 3 + (ty * T + y) * 5 + band * 17)
                 % 251).astype(np.uint8)
            txs.append(tx)
            tys.append(ty)
            bands.append(band)
            hs.append(h)
            ws.append(w)
            bufs.append(np.ascontiguousarray(a).tobytes())
        return pa.table({
            "tx": pa.array(txs, type=pa.int64()),
            "ty": pa.array(tys, type=pa.int64()),
            "band": pa.array(bands, type=pa.int64()),
            "h": pa.array(hs, type=pa.int64()),
            "w": pa.array(ws, type=pa.int64()),
            "data": pa.array(bufs, type=pa.binary())})

    tiles = rd.range(ntx * nty * 3).map_batches(
        gen, batch_format="pyarrow")
    d = tempfile.mkdtemp(prefix="spapy_rgb_")
    try:
        path = os.path.join(d, "rgb.tif")
        write_geotiff(tiles, meta, path, dtype="uint8",
                      compression="lzw", bands=3)
        back, bmeta, _ = read_geotiff(path)
        assert bmeta.width == W and bmeta.height == H

        def stats(t: pa.Table) -> pa.Table:
            hs = t.column("h").to_numpy()
            ws = t.column("w").to_numpy()
            sums, mins, maxs = [], [], []
            for i, buf in enumerate(t.column("data").to_pylist()):
                a = decode_tile(buf, "uint8", T, int(hs[i]),
                                int(ws[i])).astype(np.int64)
                sums.append(int(a.sum()))
                mins.append(int(a.min()))
                maxs.append(int(a.max()))
            return pa.table({
                "tx": t.column("tx").cast(pa.int64()),
                "ty": t.column("ty").cast(pa.int64()),
                "band": t.column("band").cast(pa.int64()),
                "px_sum": pa.array(sums, type=pa.int64()),
                "px_min": pa.array(mins, type=pa.int64()),
                "px_max": pa.array(maxs, type=pa.int64())})

        out = back.map_batches(stats,
                               batch_format="pyarrow").to_pandas()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out


def q_tif_big_roundtrip(sf_dir: str):
    """BigTIFF (TIFF version 43, 8-byte offsets, LONG8 tile
    addresses) Save/Load under the value hash — same ragged 500x420
    int DEM and pixel twin as q_tif_roundtrip; the 64-bit container
    is the engine-side difference. Clears the last TIFF-profile
    NotImplementedError (sources/geotiff.py)."""
    import os
    import shutil
    import tempfile

    from spapy_ray.sources.geotiff import read_geotiff, write_geotiff
    from spapy_ray.sources.rasters import RasterMeta, synth_dem_dataset

    meta = RasterMeta(width=500, height=420, tile_size=64,
                      x_min=-10.0, y_max=55.0, pixel_w=0.125,
                      pixel_h=-0.125)
    d = tempfile.mkdtemp(prefix="spapy_bigtif_")
    try:
        path = os.path.join(d, "dem.tif")
        write_geotiff(synth_dem_dataset(meta, kind="int"), meta, path,
                      dtype="int32", nodata=-9999, bigtiff=True)
        back, bmeta, nodata = read_geotiff(path)
        assert bmeta.width == meta.width and nodata == -9999
        out = _tile_int_stats(back, "int32", 64).to_pandas()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out


def q_gpkg_tiles_roundtrip(sf_dir: str):
    """GeoPackage TILES pyramid round-trip under the value hash —
    three native codecs composed: the DEM renders to real PNG tiles
    (stages/render.py -> kernels/png.py), the tiles stream into the
    standard gpkg tile container (gpkg_tile_matrix_set/_matrix +
    zoom/column/row/blob table, sources/gpkg.py), and the read-back
    blobs are PNG-DECODED to per-tile channel sums — same twin as
    q_render_tiles (the CASE color-classification oracle)."""
    import os
    import shutil
    import tempfile

    from spapy_ray.kernels.png import decode_png
    from spapy_ray.sources.gpkg import read_gpkg_tiles, \
        write_gpkg_tiles
    from spapy_ray.stages.render import render_tiles

    ds, meta = _dem()
    rendered = render_tiles(ds, dtype="int32",
                            tile_size=meta.tile_size,
                            include_png=True) \
        .select_columns(["tx", "ty", "png"])
    d = tempfile.mkdtemp(prefix="spapy_gpkgt_")
    try:
        path = os.path.join(d, "dem_tiles.gpkg")
        write_gpkg_tiles(rendered, meta, path)
        back = read_gpkg_tiles(path)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    txs = back.column("tile_column").to_numpy()
    tys = back.column("tile_row").to_numpy()
    sums = np.zeros((len(back), 3), dtype=np.int64)
    for i, blob in enumerate(back.column("tile_data").to_pylist()):
        rgb = decode_png(blob).astype(np.int64)
        sums[i] = rgb.reshape(-1, 3).sum(axis=0)
    return pa.table({
        "tx": pa.array(txs.astype(np.int64)),
        "ty": pa.array(tys.astype(np.int64)),
        "r_sum": pa.array(sums[:, 0]),
        "g_sum": pa.array(sums[:, 1]),
        "b_sum": pa.array(sums[:, 2])})
