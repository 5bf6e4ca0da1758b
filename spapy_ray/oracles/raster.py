"""Raster oracle twins (split from oracle.py)."""

from spapy_ray.oracles.common import *  # noqa: F401,F403


def q_zonal_stats(num_zones: int = 200) -> str:
    return (
        f"WITH {_pixel_grid_cte()}, zones AS ({sql_zones_cte(num_zones)}) "
        "SELECT z.zone_id, count(*)::BIGINT AS n_pixels, "
        "sum(g.z)::BIGINT AS sum_z, min(g.z)::BIGINT AS min_z, "
        "max(g.z)::BIGINT AS max_z "
        "FROM grid g CROSS JOIN zones z "
        f"WHERE {sql_pip_condition('g.lon', 'g.lat')} "
        "GROUP BY z.zone_id"
    )


def q_raster_histogram() -> str:
    return (f"WITH {_pixel_grid_cte()} "
            "SELECT (z // 16)::BIGINT AS bin, count(*)::BIGINT AS n_pixels "
            "FROM grid GROUP BY 1")


def q_raster_minmax() -> str:
    return (f"WITH {_pixel_grid_cte()} "
            "SELECT min(z)::BIGINT AS min_z, max(z)::BIGINT AS max_z, "
            "count(*)::BIGINT AS n_pixels FROM grid")


def q_raster_diff_stats() -> str:
    return (f"WITH {_pixel_grid_cte()} "
            "SELECT sum(z - z2)::BIGINT AS sum_d, min(z - z2)::BIGINT AS min_d, "
            "max(z - z2)::BIGINT AS max_d, count(*)::BIGINT AS n_pixels FROM grid")


def q_hillshade_stats() -> str:
    """Whole-array twin of the distributed halo-stencil hillshade:
    neighbor values come straight from the DEM closed form with
    edge-clamped coordinates (== np.pad mode='edge'), the kernel is
    the same trig-free algebra with the same embedded constants, and
    the per-pixel result is quantized (floor(f32*16)) before the
    per-tile integer sum — bit-exact end to end."""
    from spapy_ray.sources.rasters import DEM_META, sql_dem_int
    from spapy_ray.stages.raster import hillshade_constants

    ca, sa, cz, sz = hillshade_constants()
    cx = abs(DEM_META.pixel_w)   # 0.703125, exact dyadic
    cy = abs(DEM_META.pixel_h)   # 0.33203125, exact dyadic

    def cl(e: str) -> str:
        return f"LEAST(GREATEST({e}, 0), 511)"

    n = {k: sql_dem_int(cl(f"px + {dx}"), cl(f"py + {dy}"), 0)
         for k, (dx, dy) in {"a": (-1, -1), "b": (0, -1), "c": (1, -1),
                             "d": (-1, 0), "f": (1, 0),
                             "g": (-1, 1), "h": (0, 1), "i": (1, 1)}.items()}
    dzdx = (f"((({n['c']} + 2*{n['f']} + {n['i']}) - "
            f"({n['a']} + 2*{n['d']} + {n['g']}))::DOUBLE / (8.0 * {cx!r}))")
    dzdy = (f"((({n['g']} + 2*{n['h']} + {n['i']}) - "
            f"({n['a']} + 2*{n['b']} + {n['c']}))::DOUBLE / (8.0 * {cy!r}))")
    shade = (f"(({cz!r} + {sz!r} * ({ca!r} * (-dzdx) + {sa!r} * dzdy)) "
             "/ sqrt(1.0 + dzdx*dzdx + dzdy*dzdy))")
    return (
        "WITH px AS (SELECT p % 512 AS px, p // 512 AS py FROM range(262144) t(p)), "
        f"grad AS (SELECT px, py, {dzdx} AS dzdx, {dzdy} AS dzdy FROM px), "
        f"sh AS (SELECT px, py, CAST(255.0 * LEAST(GREATEST({shade}, 0.0), 1.0) AS FLOAT) AS s32 FROM grad) "
        "SELECT (px // 64)::BIGINT AS tx, (py // 64)::BIGINT AS ty, "
        "sum(CAST(floor(CAST(s32 AS DOUBLE) * 16.0) AS BIGINT))::BIGINT AS sum_q, "
        "count(*)::BIGINT AS n_px "
        "FROM sh GROUP BY 1, 2"
    )


def q_contour_lines() -> str:
    """Topological twin of the distributed marching-squares +
    stitching pipeline: a level-L contour crosses a pixel-adjacency
    edge iff (z <= k) flips across it (levels are half-integers
    k+0.5, so the test is an exact integer comparison); open
    polylines terminate exactly at crossings on the raster border,
    two terminals per line."""
    from spapy_ray.sources.rasters import sql_dem_int

    z = sql_dem_int("x", "y", 0)
    zr = sql_dem_int("(x + 1)", "y", 0)
    zd = sql_dem_int("x", "(y + 1)", 0)
    return (
        "WITH lv(level, k) AS (VALUES (63.5, 63), (127.5, 127), (191.5, 191)), "
        "he AS (SELECT p % 511 AS x, p // 511 AS y FROM range(261632) t(p)), "
        "ve AS (SELECT p // 511 AS x, p % 511 AS y FROM range(261632) t(p)), "
        f"hx AS (SELECT l.level, (CASE WHEN y = 0 OR y = 511 THEN 1 ELSE 0 END) AS bnd "
        f"FROM he CROSS JOIN lv l WHERE ({z} <= l.k) <> ({zr} <= l.k)), "
        f"vx AS (SELECT l.level, (CASE WHEN x = 0 OR x = 511 THEN 1 ELSE 0 END) AS bnd "
        f"FROM ve CROSS JOIN lv l WHERE ({z} <= l.k) <> ({zd} <= l.k)), "
        "allx AS (SELECT * FROM hx UNION ALL SELECT * FROM vx) "
        "SELECT level, (sum(bnd) // 2)::BIGINT AS n_open_lines, "
        "count(*)::BIGINT AS n_crossings FROM allx GROUP BY level"
    )


def q_polygonize_components() -> str:
    return (
        f"WITH RECURSIVE {_polygonize_cc_cte()} "
        f"SELECT row_number() OVER (ORDER BY {_COMP_ORDER}) - 1 AS component_id, "
        "value::BIGINT AS value, n_pixels, minx, miny, maxx, maxy, n_tiles "
        "FROM comp"
    )


def q_polygonize_polygons() -> str:
    """Twin of the ring-derived-area query: for a correct directed
    boundary, the shoelace sum equals the pixel count, so the oracle
    emits n_pixels as ring_area."""
    return (
        f"WITH RECURSIVE {_polygonize_cc_cte()} "
        f"SELECT row_number() OVER (ORDER BY {_COMP_ORDER}) - 1 AS component_id, "
        "value::BIGINT AS value, n_pixels, n_pixels AS ring_area, "
        "minx, miny, maxx, maxy "
        "FROM comp"
    )


# ------------------------------------------------- vector-op queries


def q_reclassify_hist() -> str:
    return (
        f"WITH {_pixel_grid_cte()} "
        "SELECT (CASE WHEN z < 64 THEN 1 WHEN z < 128 THEN 2 "
        "WHEN z < 192 THEN 3 ELSE 4 END)::BIGINT AS class, "
        "count(*)::BIGINT AS n_pixels FROM grid GROUP BY 1"
    )


def q_raster_crop_minmax() -> str:
    from spapy_ray.pipelines.queries import CROP_WINDOW

    px0, py0, px1, py1 = CROP_WINDOW
    return (
        f"WITH {_pixel_grid_cte()} "
        "SELECT min(z)::BIGINT AS min_z, max(z)::BIGINT AS max_z, "
        "count(*)::BIGINT AS n_pixels FROM grid "
        f"WHERE px >= {px0} AND px < {px1} AND py >= {py0} AND py < {py1}"
    )


def q_dedup_clusters(threshold: float = 0.8) -> str:
    """Connected components over the exact all-pairs near-dup graph
    (same pair SQL as q_near_dup_docs) via a recursive CTE: reach
    closes each node over undirected edges, min(reachable) is the
    component's canonical representative."""
    return (
        "WITH RECURSIVE "
        "t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
        "s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1), "
        "j -> toks[j] || ' ' || toks[j + 1] || ' ' || toks[j + 2])) AS sh FROM t), "
        "p AS (SELECT a.doc_id AS key_a, b.doc_id AS key_b "
        "FROM s a JOIN s b ON a.doc_id < b.doc_id "
        "WHERE len(list_intersect(a.sh, b.sh))::DOUBLE / "
        f"len(list_distinct(list_concat(a.sh, b.sh))) >= {threshold}), "
        "e AS (SELECT key_a AS u, key_b AS v FROM p "
        "UNION ALL SELECT key_b, key_a FROM p), "
        "reach(n, r) AS ("
        "SELECT u, u FROM e "
        "UNION "
        "SELECT e.u, reach.r FROM e JOIN reach ON reach.n = e.v) "
        "SELECT n::BIGINT AS doc_id, min(r)::BIGINT AS cluster_rep "
        "FROM reach GROUP BY n"
    )


def q_warp_equirect() -> str:
    """Per-pixel twin of the distributed equirect warp: dst pixel
    center (meters, embedded constants) → degrees(x/R) → nearest
    source index → DEM closed form → per-tile sums. Every float op
    (* / + degrees) is IEEE-deterministic and bit-identical between
    numpy and DuckDB (verified)."""
    from spapy_ray.kernels.proj import R_SPHERE
    from spapy_ray.pipelines.queries import warp_dst_meta
    from spapy_ray.sources.rasters import DEM_META, sql_dem_int

    d = warp_dst_meta()
    X = f"({d.x_min!r} + (px + 0.5) * {d.pixel_w!r})"
    Y = f"({d.y_max!r} + (py + 0.5) * {d.pixel_h!r})"
    lon = f"degrees({X} / {R_SPHERE!r})"
    lat = f"degrees({Y} / {R_SPHERE!r})"
    spx = f"(({lon} - {DEM_META.x_min!r}) / {DEM_META.pixel_w!r} - 0.5)"
    spy = f"(({lat} - {DEM_META.y_max!r}) / {DEM_META.pixel_h!r} - 0.5)"
    ix = f"CAST(round({spx}) AS BIGINT)"
    iy = f"CAST(round({spy}) AS BIGINT)"
    z = sql_dem_int(ix, iy, 0)
    n = d.width * d.height
    return (
        f"WITH px AS (SELECT p % {d.width} AS px, p // {d.width} AS py "
        f"FROM range({n}) t(p)) "
        f"SELECT (px // {d.tile_size})::BIGINT AS tx, "
        f"(py // {d.tile_size})::BIGINT AS ty, "
        f"sum({z})::BIGINT AS sum_z, count(*)::BIGINT AS n_px "
        "FROM px GROUP BY 1, 2"
    )


def q_resample_nearest() -> str:
    """Twin of queries.q_resample_nearest: recompute every dst pixel's
    nearest source index with the engine's exact float op order. The
    dst grid constants are exact binary doubles and the dst/src pixel
    ratio is exactly 2.5 per axis, so index fractions alternate
    between two values >=0.15 away from the round-half boundary —
    DuckDB round() == np.rint for every pixel (verified numerically
    for all indices)."""
    from spapy_ray.sources.rasters import sql_dem_int

    W, H, T = 200, 200, 64
    lon = "(-179.984375 + (px + 0.5) * 1.7578125)"
    lat = "(84.96875 + (py + 0.5) * -0.830078125)"
    xs = f"(({lon} - (-180.0)) / 0.703125 - 0.5)"
    ys = f"(({lat} - 85.0) / (-0.33203125) - 0.5)"
    ix = f"GREATEST(0, LEAST(511, round({xs})::BIGINT))"
    iy = f"GREATEST(0, LEAST(511, round({ys})::BIGINT))"
    z = sql_dem_int("ix", "iy", 0)
    return (
        f"WITH px AS (SELECT p % {W} AS px, p // {W} AS py "
        f"FROM range({W * H}) t(p)), "
        f"m AS (SELECT px, py, {ix} AS ix, {iy} AS iy FROM px), "
        f"v AS (SELECT px // {T} AS tx, py // {T} AS ty, {z} AS z FROM m) "
        "SELECT tx::BIGINT AS tx, ty::BIGINT AS ty, "
        "sum(z)::BIGINT AS sum_z, count(*)::BIGINT AS n_px "
        "FROM v GROUP BY tx, ty"
    )


def q_terrain_stats() -> str:
    """Twin of queries.q_terrain_stats: per-pixel TRI/TPI/roughness
    over the int DEM with edge-clamped neighbors — tri*8 = sum of the
    8 absolute integer diffs, tpi*8 = 8c - neighbor sum, roughness =
    window max - min. Pure integer arithmetic, bit-exact."""
    from spapy_ray.sources.rasters import sql_dem_int

    def cl(e: str) -> str:
        return f"LEAST(GREATEST({e}, 0), 511)"

    offs = [(-1, -1), (0, -1), (1, -1), (-1, 0), (1, 0),
            (-1, 1), (0, 1), (1, 1)]
    n = [sql_dem_int(cl(f"px + {dx}"), cl(f"py + {dy}"), 0)
         for dx, dy in offs]
    c = sql_dem_int("px", "py", 0)
    tri8 = " + ".join(f"abs(({v}) - c)" for v in n)
    nsum = " + ".join(f"({v})" for v in n)
    g9 = ", ".join(["c"] + [f"({v})" for v in n])
    return (
        "WITH px AS (SELECT p % 512 AS px, p // 512 AS py "
        "FROM range(262144) t(p)), "
        f"v AS (SELECT px, py, {c} AS c FROM px), "
        f"k AS (SELECT px // 64 AS tx, py // 64 AS ty, "
        f"({tri8}) AS tri8, (8 * c - ({nsum})) AS tpi8, "
        f"(GREATEST({g9}) - LEAST({g9})) AS rough FROM v) "
        "SELECT tx::BIGINT AS tx, ty::BIGINT AS ty, "
        "sum(tri8)::BIGINT AS sum_tri8, sum(tpi8)::BIGINT AS sum_tpi8, "
        "sum(rough)::BIGINT AS sum_rough FROM k GROUP BY tx, ty"
    )


def q_raster_math_stats() -> str:
    """Twin of the tile_math chain in queries.q_raster_math_stats:
    v*3 -> nodata-masked swap-subtract (0 stays 0, else 500-3v) ->
    abs -> square -> minimum(40000), folded to per-tile int stats.
    All steps are exact integer arithmetic in both engines."""
    from spapy_ray.sources.rasters import sql_dem_int

    v = sql_dem_int("(p % 512)", "(p // 512)", 0)
    return (
        f"WITH grid AS (SELECT p % 512 AS px, p // 512 AS py, {v} AS v "
        "FROM range(262144) t(p)), "
        "s AS (SELECT px, py, least((CASE WHEN v = 0 THEN 0 ELSE "
        "abs(500 - v * 3) END) * (CASE WHEN v = 0 THEN 0 ELSE "
        "abs(500 - v * 3) END), 40000) AS r FROM grid) "
        + _tile_stats_select("r", "s")
    )


def q_asc_roundtrip() -> str:
    """Per-tile stats of the int DEM straight from the closed form —
    the engine side must reproduce them THROUGH the .asc text file
    (write_aaigrid -> read_aaigrid), so any format/parse/re-tile
    error breaks the hash. z depends only on (px, py), not on the
    geo transform, so the square-pixel meta needs no SQL mirror."""
    from spapy_ray.sources.rasters import sql_dem_int

    v = sql_dem_int("(p % 512)", "(p // 512)", 0)
    return (
        f"WITH grid AS (SELECT p % 512 AS px, p // 512 AS py, {v} AS v "
        "FROM range(262144) t(p)) " + _tile_stats_select("v", "grid")
    )


def q_tif_roundtrip() -> str:
    """Per-tile stats of the int DEM on the RAGGED 500x420 grid; the
    engine side reproduces them through the tiled-GeoTIFF file
    (write_geotiff -> read_geotiff), so tile padding/cropping,
    deflate and tag parsing are all under the hash."""
    from spapy_ray.sources.rasters import sql_dem_int

    v = sql_dem_int("(p % 500)", "(p // 500)", 0)
    return (
        f"WITH grid AS (SELECT p % 500 AS px, p // 500 AS py, {v} AS v "
        "FROM range(210000) t(p)) " + _tile_stats_select("v", "grid")
    )


def q_render_tiles() -> str:
    """Twin of stages.render.render_tiles: right-open class intervals
    (searchsorted side='right' == CASE WHEN z < b ...), fixed RGB per
    class, per-tile integer channel sums."""
    from spapy_ray.stages.render import (DEFAULT_RENDER_BREAKS,
                                         DEFAULT_RENDER_COLORS)

    def chan(c: int) -> str:
        b = DEFAULT_RENDER_BREAKS
        cl = DEFAULT_RENDER_COLORS
        parts = " ".join(f"WHEN z < {b[i]} THEN {cl[i][c]}"
                         for i in range(len(b)))
        return f"(CASE {parts} ELSE {cl[-1][c]} END)"

    return (f"WITH {_pixel_grid_cte()} "
            "SELECT (px // 64)::BIGINT AS tx, (py // 64)::BIGINT AS ty, "
            f"sum({chan(0)})::BIGINT AS r_sum, "
            f"sum({chan(1)})::BIGINT AS g_sum, "
            f"sum({chan(2)})::BIGINT AS b_sum "
            "FROM grid GROUP BY 1, 2")


def q_raster_overviews(levels: int = 3, tile_size: int = 64) -> str:
    """Twin of stages.raster.raster_overviews: level-l pixel (bx, by)
    = exact int64 sum of its 2^l x 2^l source block; per-tile
    sum/min/max of those block sums."""
    parts = []
    for lv in range(1, levels + 1):
        d = 1 << lv
        parts.append(
            f"SELECT {lv}::BIGINT AS level, "
            f"(bx // {tile_size})::BIGINT AS tx, "
            f"(by // {tile_size})::BIGINT AS ty, "
            "sum(s)::BIGINT AS sum_v, min(s)::BIGINT AS min_v, "
            "max(s)::BIGINT AS max_v FROM ("
            f"SELECT px // {d} AS bx, py // {d} AS by, sum(z) AS s "
            "FROM grid GROUP BY 1, 2) GROUP BY 1, 2, 3")
    return f"WITH {_pixel_grid_cte()} " + " UNION ALL ".join(parts)


def q_rasterize_points(res: int = 9, tile_size: int = 64) -> str:
    """Twin of stages.rasterize.rasterize_points: identical clipped
    floor pixel mapping (sql_cell_expr's x/y arithmetic), row 0 =
    north, per-tile count aggregates recomputed independently."""
    n = 1 << res
    x = (f"least(greatest(floor((lon + 180.0) / 360.0 * {n})::BIGINT,"
         f" 0), {n - 1})")
    y = (f"least(greatest(floor((lat + 90.0) / 180.0 * {n})::BIGINT,"
         f" 0), {n - 1})")
    return (
        f"WITH {geo_cte()}, "
        f"px AS (SELECT {x} AS x, {n - 1} - {y} AS py FROM geo), "
        f"pcnt AS (SELECT x // {tile_size} AS tx, py // {tile_size} AS ty, "
        "x, py, count(*) AS c FROM px GROUP BY 1, 2, 3, 4) "
        "SELECT tx::BIGINT AS tx, ty::BIGINT AS ty, "
        "sum(c)::BIGINT AS n_points, count(*)::BIGINT AS n_occupied, "
        "max(c)::BIGINT AS max_px FROM pcnt GROUP BY 1, 2")


def q_resample_match_diff() -> str:
    """Twin of queries.q_resample_match_diff: per coarse pixel, the
    NN-mapped fine DEM value (identical float index arithmetic to
    q_resample_nearest) minus the coarse-grid salt-1 DEM value —
    integer-exact end to end."""
    from spapy_ray.sources.rasters import sql_dem_int

    W, H, T = 200, 200, 64
    lon = "(-179.984375 + (px + 0.5) * 1.7578125)"
    lat = "(84.96875 + (py + 0.5) * -0.830078125)"
    xs = f"(({lon} - (-180.0)) / 0.703125 - 0.5)"
    ys = f"(({lat} - 85.0) / (-0.33203125) - 0.5)"
    ix = f"GREATEST(0, LEAST(511, round({xs})::BIGINT))"
    iy = f"GREATEST(0, LEAST(511, round({ys})::BIGINT))"
    za = sql_dem_int("ix", "iy", 0)
    zb = sql_dem_int("px", "py", 1)
    return (
        f"WITH px AS (SELECT p % {W} AS px, p // {W} AS py "
        f"FROM range({W * H}) t(p)), "
        f"m AS (SELECT px, py, {ix} AS ix, {iy} AS iy FROM px), "
        f"v AS (SELECT px // {T} AS tx, py // {T} AS ty, "
        f"{za} - {zb} AS d FROM m) "
        "SELECT tx::BIGINT AS tx, ty::BIGINT AS ty, "
        "sum(d)::BIGINT AS sum_d, min(d)::BIGINT AS min_d, "
        "max(d)::BIGINT AS max_d, count(*)::BIGINT AS n_px "
        "FROM v GROUP BY tx, ty")


def q_dbscan_clusters(eps_deg: float = 0.5, min_pts: int = 3) -> str:
    """Twin of stages.cluster.dbscan_summary: neighbor counts over
    distinct fixed-point coords (self included, multiplicities as
    weights), core = cnt >= min_pts, clusters = recursive min-label
    closure over the core eps-graph (min reachable pk == the
    engine's canonical min core pk), border = nearest core by
    (d2, pk), noise folded in as cluster -1."""
    eps5 = int(round(eps_deg * 1e5))
    e2 = eps5 * eps5
    d2 = ("(a.lat5-b.lat5)*(a.lat5-b.lat5) + "
          "(a.lon5-b.lon5)*(a.lon5-b.lon5)")
    band = f"b.lat5 BETWEEN a.lat5 - {eps5} AND a.lat5 + {eps5}"
    return (
        f"WITH RECURSIVE {geo_cte()}, "
        "pts AS (SELECT CAST(round(lat*100000.0) AS BIGINT) AS lat5, "
        "CAST(round(lon*100000.0) AS BIGINT) AS lon5 "
        "FROM geo WHERE lon >= -170.0), "
        "coords AS (SELECT (lat5+8500000)*4294967296 + (lon5+18000000) "
        "AS pk, lat5, lon5, count(*)::BIGINT AS w "
        "FROM pts GROUP BY 1, 2, 3), "
        "neigh AS (SELECT a.pk, a.lat5, a.lon5, a.w, "
        "sum(b.w)::BIGINT AS cnt FROM coords a JOIN coords b "
        f"ON {band} AND {d2} <= {e2} GROUP BY 1, 2, 3, 4), "
        f"core AS (SELECT * FROM neigh WHERE cnt >= {min_pts}), "
        "ep AS (SELECT a.pk AS u, b.pk AS v FROM core a JOIN core b "
        f"ON a.pk <> b.pk AND {band} AND {d2} <= {e2}), "
        "reach(n, r) AS (SELECT pk, pk FROM core "
        "UNION SELECT ep.u, reach.r FROM ep JOIN reach ON reach.n = ep.v), "
        "comp AS (SELECT n AS pk, min(r) AS cluster FROM reach GROUP BY n), "
        "corelab AS (SELECT c.pk, c.lat5, c.lon5, c.w, comp.cluster, "
        "0 AS role FROM core c JOIN comp ON comp.pk = c.pk), "
        "bc AS (SELECT a.pk, a.lat5, a.lon5, a.w, b.pk AS cpk, "
        f"{d2} AS d2 FROM neigh a JOIN core b "
        f"ON a.cnt < {min_pts} AND {band} AND {d2} <= {e2}), "
        "bpick AS (SELECT pk, lat5, lon5, w, cpk FROM "
        "(SELECT *, row_number() OVER (PARTITION BY pk ORDER BY d2, cpk) "
        "AS rn FROM bc) WHERE rn = 1), "
        "blab AS (SELECT b.pk, b.lat5, b.lon5, b.w, cl.cluster, "
        "1 AS role FROM bpick b JOIN corelab cl ON cl.pk = b.cpk), "
        "lab AS (SELECT * FROM corelab UNION ALL SELECT * FROM blab), "
        "allr AS (SELECT * FROM lab UNION ALL "
        "SELECT n.pk, n.lat5, n.lon5, n.w, -1 AS cluster, 2 AS role "
        "FROM neigh n WHERE n.pk NOT IN (SELECT pk FROM lab)) "
        "SELECT cluster::BIGINT AS cluster, count(*)::BIGINT AS n_coords, "
        "sum(w)::BIGINT AS n_points, "
        "sum(CASE WHEN role = 0 THEN w ELSE 0 END)::BIGINT AS n_core, "
        "sum(CASE WHEN role = 1 THEN w ELSE 0 END)::BIGINT AS n_border, "
        "min(lat5)::BIGINT AS minlat5, min(lon5)::BIGINT AS minlon5, "
        "max(lat5)::BIGINT AS maxlat5, max(lon5)::BIGINT AS maxlon5 "
        "FROM allr GROUP BY cluster"
    )


def q_idw_raster() -> str:
    """Twin of stages.rasterize.idw_tile_stats on the 320x160
    1-degree grid: per pixel center (exact fixed-point ints), integer
    IDW weights 1e12 // (d2+1) over points within 2 degrees, per-tile
    sums. Every operation is int64, so summation order is free."""
    from spapy_ray.kernels.hashing import sql_fnv1a

    r5 = 200000
    d2 = ("(g.plat5-p.lat5)*(g.plat5-p.lat5) + "
          "(g.plon5-p.lon5)*(g.plon5-p.lon5)")
    w = f"(1000000000000 // ({d2} + 1))"
    return (
        f"WITH {geo_cte()}, "
        "pts AS (SELECT CAST(round(lat*100000.0) AS BIGINT) AS lat5, "
        "CAST(round(lon*100000.0) AS BIGINT) AS lon5, "
        f"({sql_fnv1a('url')} % 256)::BIGINT AS v FROM geo), "
        "grid AS (SELECT gx.range AS px, gy.range AS py, "
        "(-16000000 + gx.range*100000 + 50000)::BIGINT AS plon5, "
        "(8000000 - gy.range*100000 - 50000)::BIGINT AS plat5 "
        "FROM range(320) gx, range(160) gy), "
        "pix AS (SELECT g.px, g.py, "
        f"sum({w} * p.v)::BIGINT AS num, "
        f"sum({w})::BIGINT AS den "
        "FROM grid g JOIN pts p "
        f"ON p.lat5 BETWEEN g.plat5 - {r5} AND g.plat5 + {r5} "
        f"AND {d2} <= {r5 * r5} GROUP BY 1, 2) "
        "SELECT (px // 32)::BIGINT AS tx, (py // 32)::BIGINT AS ty, "
        "sum(num)::BIGINT AS num_sum, sum(den)::BIGINT AS den_sum, "
        "count(*)::BIGINT AS n_covered FROM pix GROUP BY 1, 2"
    )


def q_proximity_grid() -> str:
    """Twin of stages.rasterize.proximity_tile_stats: per pixel min
    d2 over points within 2 degrees on the 320x160 1-degree grid,
    per-tile (sum, min, count) — all int64."""
    r5 = 200000
    d2 = ("(g.plat5-p.lat5)*(g.plat5-p.lat5) + "
          "(g.plon5-p.lon5)*(g.plon5-p.lon5)")
    return (
        f"WITH {geo_cte()}, "
        "pts AS (SELECT CAST(round(lat*100000.0) AS BIGINT) AS lat5, "
        "CAST(round(lon*100000.0) AS BIGINT) AS lon5 FROM geo), "
        "grid AS (SELECT gx.range AS px, gy.range AS py, "
        "(-16000000 + gx.range*100000 + 50000)::BIGINT AS plon5, "
        "(8000000 - gy.range*100000 - 50000)::BIGINT AS plat5 "
        "FROM range(320) gx, range(160) gy), "
        "pix AS (SELECT g.px, g.py, "
        f"min({d2})::BIGINT AS best FROM grid g JOIN pts p "
        f"ON p.lat5 BETWEEN g.plat5 - {r5} AND g.plat5 + {r5} "
        f"AND {d2} <= {r5 * r5} GROUP BY 1, 2) "
        "SELECT (px // 32)::BIGINT AS tx, (py // 32)::BIGINT AS ty, "
        "sum(best)::BIGINT AS d2_sum, min(best)::BIGINT AS d2_min, "
        "count(*)::BIGINT AS n_covered FROM pix GROUP BY 1, 2"
    )


def q_kde_heatmap() -> str:
    """Twin of stages.rasterize.kde_tile_stats: per pixel the integer
    quartic density Σ u², u = (r5² − d2) // kscale over points within
    2°, per-tile sums on the 320x160 grid. Pixels whose density is 0
    (every candidate at u = 0) are uncovered in both paths."""
    r5 = 200000
    ksc = 100000
    d2 = ("(g.plat5-p.lat5)*(g.plat5-p.lat5) + "
          "(g.plon5-p.lon5)*(g.plon5-p.lon5)")
    u = f"(({r5 * r5} - ({d2})) // {ksc})"
    return (
        f"WITH {geo_cte()}, "
        "pts AS (SELECT CAST(round(lat*100000.0) AS BIGINT) AS lat5, "
        "CAST(round(lon*100000.0) AS BIGINT) AS lon5 FROM geo), "
        "grid AS (SELECT gx.range AS px, gy.range AS py, "
        "(-16000000 + gx.range*100000 + 50000)::BIGINT AS plon5, "
        "(8000000 - gy.range*100000 - 50000)::BIGINT AS plat5 "
        "FROM range(320) gx, range(160) gy), "
        "pix AS (SELECT g.px, g.py, "
        f"sum({u} * {u})::BIGINT AS wd "
        "FROM grid g JOIN pts p "
        f"ON p.lat5 BETWEEN g.plat5 - {r5} AND g.plat5 + {r5} "
        f"AND {d2} <= {r5 * r5} GROUP BY 1, 2 "
        f"HAVING sum({u} * {u}) > 0) "
        "SELECT (px // 32)::BIGINT AS tx, (py // 32)::BIGINT AS ty, "
        "sum(wd)::BIGINT AS w_sum, max(wd)::BIGINT AS w_max, "
        "count(*)::BIGINT AS n_covered FROM pix GROUP BY 1, 2"
    )


def q_flow_direction() -> str:
    """Twin of stages.raster.flow_direction: per pixel the D8 code
    with integer 10/7 drop weighting, edge-clamped neighbors
    (== np.pad mode='edge'), ties to the lowest code; per-tile
    histogram of the 9 codes."""
    from spapy_ray.sources.rasters import sql_dem_int
    from spapy_ray.stages.raster import D8_OFFSETS

    def cl(e: str) -> str:
        return f"LEAST(GREATEST({e}, 0), 511)"

    z = sql_dem_int("px", "py", 0)
    wds = []
    for (dy, dx, wt) in D8_OFFSETS:
        n = sql_dem_int(cl(f"px + {dx}"), cl(f"py + {dy}"), 0)
        wds.append(f"(({z}) - ({n})) * {wt}")
    m = "GREATEST(" + ", ".join(f"wd{k + 1}" for k in range(8)) + ")"
    case = "CASE WHEN " + m + " <= 0 THEN 0 " + " ".join(
        f"WHEN wd{k + 1} = {m} THEN {k + 1}" for k in range(8)) + " END"
    wd_cols = ", ".join(f"{e} AS wd{k + 1}" for k, e in enumerate(wds))
    c_cols = ", ".join(
        f"sum(CASE WHEN code = {k} THEN 1 ELSE 0 END)::BIGINT AS c{k}"
        for k in range(9))
    return (
        "WITH px AS (SELECT p % 512 AS px, p // 512 AS py FROM range(262144) t(p)), "
        f"wd AS (SELECT px, py, {wd_cols} FROM px), "
        f"code AS (SELECT px, py, {case} AS code FROM wd) "
        f"SELECT (px // 64)::BIGINT AS tx, (py // 64)::BIGINT AS ty, {c_cols} "
        "FROM code GROUP BY 1, 2"
    )


def q_focal_majority() -> str:
    """Twin of reclassify → stages.raster.focal_majority: per pixel
    the 3x3 majority of the 4 reclassify classes (center included,
    edge-clamped neighbors == np.pad mode='edge', ties to the lowest
    class), per-tile class histogram."""
    from spapy_ray.sources.rasters import sql_dem_int

    def cl(e: str) -> str:
        return f"LEAST(GREATEST({e}, 0), 511)"

    def cls(dx: int, dy: int) -> str:
        z = sql_dem_int(cl(f"px + {dx}"), cl(f"py + {dy}"), 0)
        return (f"(CASE WHEN ({z}) < 64 THEN 1 WHEN ({z}) < 128 THEN 2 "
                f"WHEN ({z}) < 192 THEN 3 ELSE 4 END)")

    window = [cls(dx, dy) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    ncols = ", ".join(
        "(" + " + ".join(f"(w{i + 1} = {c})::INT" for i in range(9))
        + f") AS n_{c}" for c in (1, 2, 3, 4))
    wcols = ", ".join(f"{e} AS w{i + 1}" for i, e in enumerate(window))
    m = "GREATEST(n_1, n_2, n_3, n_4)"
    mode = ("CASE " + " ".join(
        f"WHEN n_{c} = {m} THEN {c}" for c in (1, 2, 3, 4)) + " END")
    hcols = ", ".join(
        f"sum(CASE WHEN mode = {c} THEN 1 ELSE 0 END)::BIGINT AS n{c}"
        for c in (1, 2, 3, 4))
    return (
        "WITH px AS (SELECT p % 512 AS px, p // 512 AS py FROM range(262144) t(p)), "
        f"w AS (SELECT px, py, {wcols} FROM px), "
        f"n AS (SELECT px, py, {ncols} FROM w), "
        f"md AS (SELECT px, py, {mode} AS mode FROM n) "
        f"SELECT (px // 64)::BIGINT AS tx, (py // 64)::BIGINT AS ty, {hcols} "
        "FROM md GROUP BY 1, 2"
    )


def q_raster_equalize(out_scale: int = 255) -> str:
    """Twin of stages.raster.equalize_stats on the 512x512 int DEM:
    value histogram → window-sum CDF → integer transfer → per-tile
    (n, sum, min, max) of the equalized values."""
    from spapy_ray.sources.rasters import sql_dem_int

    z = sql_dem_int("px", "py", 0)
    return (
        "WITH px AS (SELECT p % 512 AS px, p // 512 AS py "
        "FROM range(262144) t(p)), "
        f"pix AS (SELECT px, py, ({z})::BIGINT AS v FROM px), "
        "hist AS (SELECT v, count(*)::BIGINT AS c FROM pix "
        "GROUP BY v), "
        "cdf AS (SELECT v, sum(c) OVER (ORDER BY v "
        "ROWS UNBOUNDED PRECEDING)::BIGINT AS f FROM hist), "
        "cmin AS (SELECT min(f) AS m FROM cdf), "
        "eq AS (SELECT p.px, p.py, "
        f"((cdf.f - cmin.m) * {out_scale}) // (262144 - cmin.m) AS e "
        "FROM pix p JOIN cdf ON cdf.v = p.v, cmin) "
        "SELECT (px // 64)::BIGINT AS tx, (py // 64)::BIGINT AS ty, "
        "count(*)::BIGINT AS n_pixels, sum(e)::BIGINT AS eq_sum, "
        "min(e)::BIGINT AS eq_min, max(e)::BIGINT AS eq_max "
        "FROM eq GROUP BY 1, 2"
    )


def q_zonal_majority(num_zones: int = 200,
                     class_width: int = 64) -> str:
    """Twin of stages.raster.zonal_majority: per-pixel PIP membership
    (same grid CTE as q_zonal_stats), class counts per zone, mode
    with ties to the lowest class."""
    return (
        f"WITH {_pixel_grid_cte()}, zones AS ({sql_zones_cte(num_zones)}), "
        "memb AS (SELECT z.zone_id, "
        f"(g.z // {class_width} + 1)::BIGINT AS cls "
        "FROM grid g CROSS JOIN zones z "
        f"WHERE {sql_pip_condition('g.lon', 'g.lat')}), "
        "cc AS (SELECT zone_id, cls, count(*)::BIGINT AS n "
        "FROM memb GROUP BY 1, 2), "
        "tot AS (SELECT zone_id, sum(n)::BIGINT AS n_pixels "
        "FROM cc GROUP BY 1), "
        "r AS (SELECT zone_id, cls, n, row_number() OVER "
        "(PARTITION BY zone_id ORDER BY n DESC, cls) AS rn FROM cc) "
        "SELECT r.zone_id, r.cls AS mode_class, r.n AS n_mode, "
        "tot.n_pixels FROM r JOIN tot USING (zone_id) WHERE rn = 1"
    )


def q_raster_stretch(p_lo: int = 2, p_hi: int = 98, den: int = 100,
                     out_scale: int = 255) -> str:
    """Twin of stages.raster.stretch_stats on the 512x512 int DEM."""
    from spapy_ray.sources.rasters import sql_dem_int

    z = sql_dem_int("px", "py", 0)
    return (
        "WITH px AS (SELECT p % 512 AS px, p // 512 AS py "
        "FROM range(262144) t(p)), "
        f"pix AS (SELECT px, py, ({z})::BIGINT AS v FROM px), "
        "hist AS (SELECT v, count(*)::BIGINT AS c FROM pix "
        "GROUP BY v), "
        "cdf AS (SELECT v, sum(c) OVER (ORDER BY v "
        "ROWS UNBOUNDED PRECEDING)::BIGINT AS f FROM hist), "
        f"b AS (SELECT (SELECT min(v) FROM cdf WHERE f * {den} >= "
        f"262144 * {p_lo}) AS lo_bin, (SELECT min(v) FROM cdf WHERE "
        f"f * {den} >= 262144 * {p_hi}) AS hi_bin), "
        "eq AS (SELECT p.px, p.py, least(greatest("
        f"(p.v - b.lo_bin) * {out_scale} // (b.hi_bin - b.lo_bin), "
        f"0), {out_scale}) AS e FROM pix p, b) "
        "SELECT (px // 64)::BIGINT AS tx, (py // 64)::BIGINT AS ty, "
        "count(*)::BIGINT AS n_pixels, sum(e)::BIGINT AS eq_sum, "
        "min(e)::BIGINT AS eq_min, max(e)::BIGINT AS eq_max "
        "FROM eq GROUP BY 1, 2"
    )


def q_flow_length() -> str:
    """Twin of stages.raster.flow_length_stats: len(node) = number of
    walk rows with node <> cur (strict descent never revisits, and a
    pit's only row is its self row), per-tile fold."""
    return (
        f"{_sql_d8_walk()}, "
        "lenc AS (SELECT node, count(*)::BIGINT AS l FROM walk "
        "WHERE node <> cur GROUP BY node), "
        "cell AS (SELECT p.node, coalesce(lenc.l, 0) AS l FROM ptr p "
        "LEFT JOIN lenc ON lenc.node = p.node) "
        "SELECT ((node % 512) // 64)::BIGINT AS tx, "
        "((node // 512) // 64)::BIGINT AS ty, "
        "count(*)::BIGINT AS n_cells, sum(l)::BIGINT AS len_sum, "
        "max(l)::BIGINT AS len_max FROM cell GROUP BY 1, 2"
    )


def q_raster_moran(q: int = 10 ** 6) -> str:
    """Twin of stages.spatialstats.moran_i over the int DEM: rook
    neighbor values come from the closed form (no self-join), the
    Moran ratio is HUGEINT arithmetic; DuckDB's ``//`` truncates
    toward zero, which is the documented moran_q convention."""
    from spapy_ray.sources.rasters import sql_dem_int

    z = sql_dem_int("gx", "gy", 0)
    ze = sql_dem_int("(gx + 1)", "gy", 0)
    zs = sql_dem_int("gx", "(gy + 1)", 0)
    w_dir = 2 * (511 * 512 + 512 * 511)
    return (
        "WITH px AS (SELECT p % 512 AS gx, p // 512 AS gy "
        "FROM range(262144) t(p)), "
        f"v AS (SELECT gx, gy, ({z})::HUGEINT AS zz, "
        f"(CASE WHEN gx < 511 THEN ({z})::HUGEINT * ({ze}) "
        "ELSE 0 END) AS pxe, "
        f"(CASE WHEN gy < 511 THEN ({z})::HUGEINT * ({zs}) "
        "ELSE 0 END) AS pxs, "
        "((gx > 0)::INT + (gx < 511)::INT + (gy > 0)::INT "
        "+ (gy < 511)::INT) AS deg FROM px), "
        "agg AS (SELECT count(*)::HUGEINT AS n, sum(zz) AS s, "
        "sum(zz * zz) AS ss, sum(pxe + pxs) AS p, "
        "sum(deg * zz) AS d FROM v) "
        "SELECT n::BIGINT AS n_pix, "
        f"{w_dir}::BIGINT AS w_dir, s::BIGINT AS s_sum, "
        "ss::BIGINT AS ss_sum, p::BIGINT AS p_und, "
        "d::BIGINT AS d_deg, "
        f"(({q}::HUGEINT * n * (n * n * 2 * p - 2 * n * s * d "
        f"+ s * s * {w_dir})) // ({w_dir}::HUGEINT * n * "
        "(n * ss - s * s)))::BIGINT AS moran_q "
        "FROM agg"
    )


def q_raster_variogram(lags: int = 8, q: int = 10 ** 6) -> str:
    """Twin of directional_variogram over the int DEM: per-lag pair
    sums with closed-form (parenthesized) neighbor values."""
    from spapy_ray.sources.rasters import sql_dem_int

    z = sql_dem_int("gx", "gy", 0)
    ze = sql_dem_int("(gx + h)", "gy", 0)
    zs = sql_dem_int("gx", "(gy + h)", 0)
    return (
        "WITH px AS (SELECT p % 512 AS gx, p // 512 AS gy "
        "FROM range(262144) t(p)), "
        f"lag AS (SELECT unnest(generate_series(1, {lags})) AS h), "
        "dx AS (SELECT 'x' AS dir, h, count(*)::BIGINT AS n_pairs, "
        f"sum((({ze}) - ({z})) * (({ze}) - ({z})))::BIGINT AS ssd "
        "FROM px, lag WHERE gx + h < 512 GROUP BY h), "
        "dy AS (SELECT 'y' AS dir, h, count(*)::BIGINT AS n_pairs, "
        f"sum((({zs}) - ({z})) * (({zs}) - ({z})))::BIGINT AS ssd "
        "FROM px, lag WHERE gy + h < 512 GROUP BY h) "
        "SELECT dir, h::BIGINT AS h, n_pairs, ssd, "
        f"(({q} * ssd) // (2 * n_pairs))::BIGINT AS gamma_q "
        "FROM (SELECT * FROM dx UNION ALL SELECT * FROM dy)"
    )


def q_resample_bilinear(q: int = 1 << 20) -> str:
    """Twin of queries.q_resample_bilinear — every dst pixel's
    bilinear sample recomputed with the engine's exact float op
    order and parenthesization (edge-clamped corners)."""
    from spapy_ray.sources.rasters import sql_dem_int

    W, H, T = 200, 200, 64
    lon = "(-179.984375 + (px + 0.5) * 1.7578125)"
    lat = "(84.96875 + (py + 0.5) * -0.830078125)"
    xs = f"(({lon} - (-180.0)) / 0.703125 - 0.5)"
    ys = f"(({lat} - 85.0) / (-0.33203125) - 0.5)"
    z00 = sql_dem_int("x0", "y0", 0)
    z01 = sql_dem_int("x1", "y0", 0)
    z10 = sql_dem_int("x0", "y1", 0)
    z11 = sql_dem_int("x1", "y1", 0)
    v = (f"((1.0 - fy) * ((1.0 - fx) * ({z00}) + fx * ({z01})) "
         f"+ fy * ((1.0 - fx) * ({z10}) + fx * ({z11})))")
    return (
        f"WITH px AS (SELECT p % {W} AS px, p // {W} AS py "
        f"FROM range({W * H}) t(p)), "
        f"m AS (SELECT px, py, {xs} AS xs, {ys} AS ys FROM px), "
        "c AS (SELECT px, py, xs, ys, "
        "GREATEST(0, LEAST(511, floor(xs)::BIGINT)) AS x0, "
        "GREATEST(0, LEAST(511, floor(ys)::BIGINT)) AS y0 FROM m), "
        "f AS (SELECT px, py, x0, y0, "
        "LEAST(x0 + 1, 511) AS x1, LEAST(y0 + 1, 511) AS y1, "
        "LEAST(GREATEST(xs - x0, 0.0), 1.0) AS fx, "
        "LEAST(GREATEST(ys - y0, 0.0), 1.0) AS fy FROM c), "
        f"v AS (SELECT px // {T} AS tx, py // {T} AS ty, "
        f"trunc({v} * {float(q)})::BIGINT AS vq FROM f) "
        "SELECT tx::BIGINT AS tx, ty::BIGINT AS ty, "
        "sum(vq)::BIGINT AS sum_q, min(vq)::BIGINT AS min_q, "
        "max(vq)::BIGINT AS max_q, count(*)::BIGINT AS n_px "
        "FROM v GROUP BY tx, ty"
    )


def q_raster_lisa(q: int = 10 ** 6) -> str:
    """Twin of local_moran_tiles: per-pixel 4-neighbor sums from the
    closed form (validity-gated, parenthesized substitutions),
    per-tile integer components, HUGEINT LISA ratio."""
    from spapy_ray.sources.rasters import sql_dem_int

    z = sql_dem_int("gx", "gy", 0)
    ze = sql_dem_int("(gx + 1)", "gy", 0)
    zw = sql_dem_int("(gx - 1)", "gy", 0)
    zn = sql_dem_int("gx", "(gy - 1)", 0)
    zs = sql_dem_int("gx", "(gy + 1)", 0)
    nbr = (f"(CASE WHEN gx < 511 THEN ({ze}) ELSE 0 END "
           f"+ CASE WHEN gx > 0 THEN ({zw}) ELSE 0 END "
           f"+ CASE WHEN gy > 0 THEN ({zn}) ELSE 0 END "
           f"+ CASE WHEN gy < 511 THEN ({zs}) ELSE 0 END)")
    deg = ("((gx > 0)::INT + (gx < 511)::INT + (gy > 0)::INT "
           "+ (gy < 511)::INT)")
    return (
        "WITH px AS (SELECT p % 512 AS gx, p // 512 AS gy "
        "FROM range(262144) t(p)), "
        f"v AS (SELECT gx // 64 AS tx, gy // 64 AS ty, "
        f"({z})::BIGINT AS z, ({nbr})::BIGINT AS nbr, "
        f"({deg})::BIGINT AS deg FROM px), "
        "t AS (SELECT tx, ty, count(*)::BIGINT AS n_pix, "
        "sum(z)::BIGINT AS s_sum, sum(z * z)::BIGINT AS ss_sum, "
        "sum(z * nbr)::BIGINT AS p_dir, sum(nbr)::BIGINT AS nb_sum, "
        "sum(deg * z)::BIGINT AS d_deg, sum(deg)::BIGINT AS g_deg "
        "FROM v GROUP BY tx, ty), "
        "g AS (SELECT sum(n_pix)::HUGEINT AS nn, "
        "sum(s_sum)::HUGEINT AS s, sum(ss_sum)::HUGEINT AS ss "
        "FROM t) "
        "SELECT tx::BIGINT AS tx, ty::BIGINT AS ty, n_pix, s_sum, "
        "ss_sum, p_dir, nb_sum, d_deg, g_deg, "
        f"(({q} * (nn * nn * p_dir - nn * s * (d_deg + nb_sum) "
        "+ s * s * g_deg)) // (nn * (nn * ss - s * s)))::BIGINT "
        "AS lisa_q FROM t, g"
    )


def q_zonal_percentiles(num_zones: int = 200) -> str:
    """Twin of raster.zonal_quantiles (DuckDB quantile_disc has the
    same max(1, ceil(q*n)) rank convention)."""
    return (
        f"WITH {_pixel_grid_cte()}, "
        f"zones AS ({sql_zones_cte(num_zones)}) "
        "SELECT z.zone_id, count(*)::BIGINT AS n_pixels, "
        "quantile_disc(g.z, 0.5)::BIGINT AS p50, "
        "quantile_disc(g.z, 0.9)::BIGINT AS p90 "
        "FROM grid g CROSS JOIN zones z "
        f"WHERE {sql_pip_condition('g.lon', 'g.lat')} "
        "GROUP BY z.zone_id"
    )


def q_stream_order(rounds: int = 6) -> str:
    """Twin of raster.strahler_stats: the D8 pointer CTE (same
    construction as _sql_d8_walk) + ``rounds`` unrolled synchronous
    Strahler iterations. Starting from all-ones, the iteration is
    monotone from below and converges to the least fixpoint (the
    true Strahler order) within max-path-length rounds — 3 on this
    DEM, 6 for margin."""
    from spapy_ray.sources.rasters import sql_dem_int
    from spapy_ray.stages.raster import D8_OFFSETS

    def cl(e: str) -> str:
        return f"LEAST(GREATEST({e}, 0), 511)"

    z = sql_dem_int("px", "py", 0)
    wds = []
    for (dy, dx, wt) in D8_OFFSETS:
        nb = sql_dem_int(cl(f"px + {dx}"), cl(f"py + {dy}"), 0)
        wds.append(f"(({z}) - ({nb})) * {wt}")
    m = "GREATEST(" + ", ".join(f"wd{k + 1}" for k in range(8)) + ")"
    case = "CASE WHEN " + m + " <= 0 THEN 0 " + " ".join(
        f"WHEN wd{k + 1} = {m} THEN {k + 1}" for k in range(8)) \
        + " END"
    wd_cols = ", ".join(f"{e} AS wd{k + 1}"
                        for k, e in enumerate(wds))
    nxt = "CASE code " + " ".join(
        f"WHEN {k + 1} THEN node + {dy * 512 + dx}"
        for k, (dy, dx, _) in enumerate(D8_OFFSETS)) + " ELSE node END"
    # every CTE is MATERIALIZED: without the hint DuckDB re-inlines
    # ptr (and each round) into every consumer and the 6-round chain
    # re-evaluates the closed-form DEM exponentially (measured DNF)
    parts = [
        "WITH px AS MATERIALIZED (SELECT p % 512 AS px, "
        "p // 512 AS py FROM range(262144) t(p))",
        f"wd AS MATERIALIZED (SELECT px, py, {wd_cols} FROM px)",
        f"code AS MATERIALIZED (SELECT px, py, py * 512 + px "
        f"AS node, {case} AS code FROM wd)",
        f"ptr AS MATERIALIZED (SELECT node, {nxt} AS nxt FROM code)",
        "o0 AS MATERIALIZED (SELECT node, 1::BIGINT AS ord "
        "FROM ptr)",
    ]
    for i in range(rounds):
        parts.append(
            f"j{i} AS MATERIALIZED (SELECT pt.nxt AS parent, o.ord "
            f"FROM ptr pt JOIN o{i} o ON o.node = pt.node "
            "WHERE pt.nxt <> pt.node)")
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT parent, max(ord) AS m "
            f"FROM j{i} GROUP BY parent)")
        parts.append(
            f"b{i} AS MATERIALIZED (SELECT j.parent, a.m, "
            f"count(*)::BIGINT AS c FROM j{i} j JOIN a{i} a "
            "ON a.parent = j.parent AND j.ord = a.m GROUP BY 1, 2)")
        parts.append(
            f"o{i + 1} AS MATERIALIZED (SELECT p.node, "
            "coalesce(CASE WHEN b.c >= 2 THEN b.m + 1 ELSE b.m "
            f"END, 1)::BIGINT AS ord FROM ptr p "
            f"LEFT JOIN b{i} b ON b.parent = p.node)")
    return (
        ", ".join(parts) + " "
        f"SELECT ((node % 512) // 64)::BIGINT AS tx, "
        "((node // 512) // 64)::BIGINT AS ty, ord, "
        f"count(*)::BIGINT AS n_cells FROM o{rounds} "
        "GROUP BY 1, 2, 3"
    )


def q_raster_geary(q: int = 10 ** 6) -> str:
    """Twin of stages.spatialstats.geary_c over the int DEM: rook
    east/south squared differences from the closed form, HUGEINT
    ratio, trunc-toward-zero (DuckDB ``//``)."""
    from spapy_ray.sources.rasters import sql_dem_int

    z = sql_dem_int("gx", "gy", 0)
    ze = sql_dem_int("(gx + 1)", "gy", 0)
    zs = sql_dem_int("gx", "(gy + 1)", 0)
    w_dir = 2 * (511 * 512 + 512 * 511)
    return (
        "WITH px AS (SELECT p % 512 AS gx, p // 512 AS gy "
        "FROM range(262144) t(p)), "
        f"v AS (SELECT gx, gy, ({z})::HUGEINT AS zz, "
        f"(CASE WHEN gx < 511 THEN (({z})::HUGEINT - ({ze})) "
        f"* (({z})::HUGEINT - ({ze})) ELSE 0 END) AS sqe, "
        f"(CASE WHEN gy < 511 THEN (({z})::HUGEINT - ({zs})) "
        f"* (({z})::HUGEINT - ({zs})) ELSE 0 END) AS sqs FROM px), "
        "agg AS (SELECT count(*)::HUGEINT AS n, sum(zz) AS s, "
        "sum(zz * zz) AS ss, sum(sqe + sqs) AS psq FROM v) "
        "SELECT n::BIGINT AS n_pix, "
        f"{w_dir}::BIGINT AS w_dir, s::BIGINT AS s_sum, "
        "ss::BIGINT AS ss_sum, psq::BIGINT AS p_sq, "
        f"(({q}::HUGEINT * n * (n - 1) * psq) // "
        f"({w_dir}::HUGEINT * (n * ss - s * s)))::BIGINT AS geary_q "
        "FROM agg"
    )


def q_focal_median() -> str:
    """Twin of the 3x3 focal median: list_sort of the 9 edge-clamped
    closed-form neighbors, element 5 (1-based) == the engine's sorted
    index 4; per-tile integer sum/min/max."""
    from spapy_ray.sources.rasters import sql_dem_int

    def cl(e: str) -> str:
        return f"LEAST(GREATEST({e}, 0), 511)"

    window = ", ".join(
        sql_dem_int(cl(f"px + {dx}"), cl(f"py + {dy}"), 0)
        for dy in (-1, 0, 1) for dx in (-1, 0, 1))
    return (
        "WITH px AS (SELECT p % 512 AS px, p // 512 AS py "
        "FROM range(262144) t(p)), "
        f"md AS (SELECT px, py, list_sort([{window}])[5]::BIGINT "
        "AS med FROM px) "
        "SELECT (px // 64)::BIGINT AS tx, (py // 64)::BIGINT AS ty, "
        "sum(med)::BIGINT AS med_sum, min(med)::BIGINT AS med_min, "
        "max(med)::BIGINT AS med_max FROM md GROUP BY 1, 2"
    )


def q_raster_integral() -> str:
    """Twin of queries.q_raster_integral: SAT = cumsum along px per
    row, then cumsum of that along py per column — exactly the
    separable form the engine's block decomposition reassembles."""
    from spapy_ray.sources.rasters import sql_dem_int

    z = sql_dem_int("px", "py", 0)
    return (
        "WITH px AS (SELECT p % 512 AS px, p // 512 AS py "
        "FROM range(262144) t(p)), "
        f"v AS (SELECT px, py, ({z})::BIGINT AS z FROM px), "
        "w1 AS (SELECT px, py, sum(z) OVER "
        "(PARTITION BY py ORDER BY px) AS s1 FROM v), "
        "sat AS (SELECT px, py, sum(s1) OVER "
        "(PARTITION BY px ORDER BY py) AS sat FROM w1) "
        "SELECT (px // 64)::BIGINT AS tx, (py // 64)::BIGINT AS ty, "
        "max(CASE WHEN px % 64 = 63 AND py % 64 = 63 THEN sat END)"
        "::BIGINT AS sat_corner, sum(sat)::BIGINT AS sat_sum "
        "FROM sat GROUP BY 1, 2"
    )


def q_raster_dt() -> str:
    """Twin of queries.q_raster_dt: the same separable min-plus
    passes as window functions — row pass via mark-position extrema,
    column pass via min(g - py) / min(g + py) prefixes; saturation
    sentinel 2^40 on both sides."""
    from spapy_ray.sources.rasters import sql_dem_int

    z = sql_dem_int("px", "py", 0)
    big = 1 << 40
    return (
        "WITH px AS (SELECT p % 512 AS px, p // 512 AS py "
        "FROM range(262144) t(p)), "
        f"v AS (SELECT px, py, ({z})::BIGINT AS z FROM px), "
        "g1 AS (SELECT px, py, z, "
        "max(CASE WHEN z = 0 THEN px END) OVER "
        "(PARTITION BY py ORDER BY px) AS lmax, "
        "min(CASE WHEN z = 0 THEN px END) OVER "
        "(PARTITION BY py ORDER BY px DESC) AS rmin FROM v), "
        f"g2 AS (SELECT px, py, LEAST(px - COALESCE(lmax, -{big}), "
        f"COALESCE(rmin, {big}) - px, {big}) AS g FROM g1), "
        "d1 AS (SELECT px, py, "
        "py + min(g - py) OVER (PARTITION BY px ORDER BY py) AS da, "
        "-py + min(g + py) OVER (PARTITION BY px ORDER BY py DESC) "
        "AS db FROM g2), "
        f"dd AS (SELECT px, py, LEAST(da, db, {big}) AS d FROM d1) "
        "SELECT (px // 64)::BIGINT AS tx, (py // 64)::BIGINT AS ty, "
        "sum(CASE WHEN d = 0 THEN 1 ELSE 0 END)::BIGINT AS n_marks, "
        "sum(d)::BIGINT AS sum_d, max(d)::BIGINT AS max_d "
        "FROM dd GROUP BY 1, 2"
    )


def q_raster_horizon() -> str:
    """Twin of queries.q_raster_horizon: q = trunc((z - z0)·2^20 / px)
    (DuckDB // truncates toward zero; the engine applies the same
    sign-split), visible iff q >= the 1-PRECEDING running row max."""
    from spapy_ray.sources.rasters import sql_dem_int

    z = sql_dem_int("px", "py", 0)
    big = 1 << 40
    return (
        "WITH px AS (SELECT p % 512 AS px, p // 512 AS py "
        "FROM range(262144) t(p)), "
        f"v AS (SELECT px, py, ({z})::BIGINT AS z FROM px), "
        "z0 AS (SELECT py, z AS z0 FROM v WHERE px = 0), "
        "q AS (SELECT v.px, v.py, CASE WHEN v.z >= z0.z0 THEN "
        "((v.z - z0.z0) * 1048576) // v.px ELSE "
        "-(((z0.z0 - v.z) * 1048576) // v.px) END AS q "
        "FROM v JOIN z0 USING (py) WHERE v.px >= 1), "
        "w AS (SELECT px, py, q, COALESCE(max(q) OVER "
        "(PARTITION BY py ORDER BY px ROWS BETWEEN UNBOUNDED "
        f"PRECEDING AND 1 PRECEDING), -{big}) AS h FROM q) "
        "SELECT (px // 64)::BIGINT AS tx, (py // 64)::BIGINT AS ty, "
        "sum(CASE WHEN q >= h THEN 1 ELSE 0 END)::BIGINT AS n_visible, "
        "sum(CASE WHEN q >= h THEN q ELSE 0 END)::BIGINT "
        "AS sum_q_visible FROM w GROUP BY 1, 2"
    )


def q_line_of_sight() -> str:
    """Twin of queries.q_line_of_sight: same station grid, same
    trunc-division sample coordinates (DuckDB // truncates toward
    zero — the engine sign-splits to match), same cross-multiplied
    chord test z_t*n > zi*n + (zj-zi)*t."""
    from spapy_ray.sources.rasters import sql_dem_int

    zst = sql_dem_int("((37 * si + 11) % 512)", "((59 * si + 23) % 512)")
    zpx = sql_dem_int("px", "py", 0)
    return (
        "WITH st AS (SELECT si, (37 * si + 11) % 512 AS x, "
        f"(59 * si + 23) % 512 AS y, ({zst})::BIGINT AS z "
        "FROM range(40) t(si)), "
        "pr AS (SELECT a.si AS si, c.si AS sj, a.x AS x0, a.y AS y0, "
        "c.x - a.x AS dx, c.y - a.y AS dy, a.z AS zi, c.z AS zj, "
        "GREATEST(abs(c.x - a.x), abs(c.y - a.y)) AS n "
        "FROM st a, st c WHERE a.si < c.si), "
        "sm AS (SELECT pr.*, s.s AS tt FROM pr, range(1, 512) s(s) "
        "WHERE s.s < pr.n), "
        "co AS (SELECT si, sj, n, zi, zj, tt, "
        "x0 + CASE WHEN dx * tt >= 0 THEN (dx * tt) // n "
        "ELSE -((-(dx * tt)) // n) END AS px, "
        "y0 + CASE WHEN dy * tt >= 0 THEN (dy * tt) // n "
        "ELSE -((-(dy * tt)) // n) END AS py FROM sm), "
        f"bl AS (SELECT si, sj, CASE WHEN ({zpx})::BIGINT * n > "
        "zi * n + (zj - zi) * tt THEN 1 ELSE 0 END AS bb FROM co) "
        "SELECT pr.si::BIGINT AS si, pr.sj::BIGINT AS sj, "
        "(pr.n - 1)::BIGINT AS n_int, "
        "COALESCE(sum(bl.bb), 0)::BIGINT AS n_blocked, "
        "(CASE WHEN COALESCE(sum(bl.bb), 0) = 0 THEN 1 ELSE 0 END)"
        "::BIGINT AS visible "
        "FROM pr LEFT JOIN bl ON pr.si = bl.si AND pr.sj = bl.sj "
        "GROUP BY pr.si, pr.sj, pr.n ORDER BY si, sj"
    )


def q_events_ewma(k: int = 16) -> str:
    """Twin of queries.q_events_ewma: banded row_number self-join
    with 1 << (K-1-lag) weights; den = 2^K - 2^(K-1-m); the ratio is
    the truncating // (both numbers positive here, but the engine
    truncates explicitly either way)."""
    return (
        "WITH e AS (SELECT event_id, user_id, "
        "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents, "
        "row_number() OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS rn FROM events), "
        "j AS (SELECT a.event_id, a.user_id, "
        f"sum(b.cents * (1::BIGINT << ({k} - 1 - (a.rn - b.rn))))"
        "::BIGINT AS ewma_num, "
        f"sum(1::BIGINT << ({k} - 1 - (a.rn - b.rn)))::BIGINT "
        "AS ewma_den FROM e a JOIN e b ON a.user_id = b.user_id "
        f"AND b.rn BETWEEN a.rn - {k - 1} AND a.rn "
        "GROUP BY a.event_id, a.user_id) "
        "SELECT event_id, user_id, ewma_num, ewma_den, "
        "(CASE WHEN ewma_num >= 0 THEN ewma_num // ewma_den "
        "ELSE -((-ewma_num) // ewma_den) END)::BIGINT AS ewma_x100 "
        "FROM j"
    )


def q_raster_mosaic() -> str:
    """Twin of queries.q_raster_mosaic: per pixel, the salt-1 surface
    inside the patch tile window, salt-0 outside."""
    from spapy_ray.sources.rasters import sql_dem_int

    z0 = sql_dem_int("px", "py", 0)
    z1 = sql_dem_int("px", "py", 1)
    return (
        "WITH px AS (SELECT p % 512 AS px, p // 512 AS py "
        "FROM range(262144) t(p)), "
        "v AS (SELECT px, py, (CASE WHEN px // 64 BETWEEN 2 AND 5 "
        f"AND py // 64 BETWEEN 2 AND 5 THEN ({z1}) ELSE ({z0}) END)"
        "::BIGINT AS z FROM px) "
        "SELECT (px // 64)::BIGINT AS tx, (py // 64)::BIGINT AS ty, "
        "sum(z)::BIGINT AS sum_v, min(z)::BIGINT AS min_v, "
        "max(z)::BIGINT AS max_v FROM v GROUP BY 1, 2"
    )


def q_rasterize_edges() -> str:
    """Twin of queries.q_rasterize_edges: the same zone-edge cell
    ranges (floor arithmetic on the fixed-point bounds, north-up
    rows), DISTINCT (zone, cell) burn, per-tile counts."""
    from spapy_ray.sources.zones import sql_zones_cte

    return (
        f"WITH zones AS ({sql_zones_cte()}), "
        "he AS (SELECT zone_id AS z, LEAST(GREATEST(((x0) + 1800000) * 512 // 3600000, 0), 511) AS cxa, LEAST(GREATEST(((x0 + w) + 1800000) * 512 // 3600000, 0), 511) AS cxb, (511 - LEAST(GREATEST(((y0) + 900000) * 512 // 1800000, 0), 511)) AS cyf FROM zones WHERE shape IN (0, 1) UNION ALL SELECT zone_id AS z, LEAST(GREATEST(((x0) + 1800000) * 512 // 3600000, 0), 511) AS cxa, LEAST(GREATEST(((x0 + w) + 1800000) * 512 // 3600000, 0), 511) AS cxb, (511 - LEAST(GREATEST(((y0 + h) + 900000) * 512 // 1800000, 0), 511)) AS cyf FROM zones WHERE shape IN (0, 1) UNION ALL SELECT zone_id AS z, LEAST(GREATEST(((x0) + 1800000) * 512 // 3600000, 0), 511) AS cxa, LEAST(GREATEST(((x0 + w) + 1800000) * 512 // 3600000, 0), 511) AS cxb, (511 - LEAST(GREATEST(((y0) + 900000) * 512 // 1800000, 0), 511)) AS cyf FROM zones WHERE shape = 2 UNION ALL SELECT zone_id AS z, LEAST(GREATEST(((x0 + w2) + 1800000) * 512 // 3600000, 0), 511) AS cxa, LEAST(GREATEST(((x0 + w) + 1800000) * 512 // 3600000, 0), 511) AS cxb, (511 - LEAST(GREATEST(((y0 + h2) + 900000) * 512 // 1800000, 0), 511)) AS cyf FROM zones WHERE shape = 2 UNION ALL SELECT zone_id AS z, LEAST(GREATEST(((x0) + 1800000) * 512 // 3600000, 0), 511) AS cxa, LEAST(GREATEST(((x0 + w2) + 1800000) * 512 // 3600000, 0), 511) AS cxb, (511 - LEAST(GREATEST(((y0 + h) + 900000) * 512 // 1800000, 0), 511)) AS cyf FROM zones WHERE shape = 2 UNION ALL SELECT zone_id AS z, LEAST(GREATEST(((x0) + 1800000) * 512 // 3600000, 0), 511) AS cxa, LEAST(GREATEST(((x0 + w2) + 1800000) * 512 // 3600000, 0), 511) AS cxb, (511 - LEAST(GREATEST(((y0) + 900000) * 512 // 1800000, 0), 511)) AS cyf FROM zones WHERE shape = 3 UNION ALL SELECT zone_id AS z, LEAST(GREATEST(((x0) + 1800000) * 512 // 3600000, 0), 511) AS cxa, LEAST(GREATEST(((x0 + w2) + 1800000) * 512 // 3600000, 0), 511) AS cxb, (511 - LEAST(GREATEST(((y0 + h2) + 900000) * 512 // 1800000, 0), 511)) AS cyf FROM zones WHERE shape = 3 UNION ALL SELECT zone_id AS z, LEAST(GREATEST(((x0 + w2 + 5000) + 1800000) * 512 // 3600000, 0), 511) AS cxa, LEAST(GREATEST(((x0 + w) + 1800000) * 512 // 3600000, 0), 511) AS cxb, (511 - LEAST(GREATEST(((y0 + h2 + 5000) + 900000) * 512 // 1800000, 0), 511)) AS cyf FROM zones WHERE shape = 3 UNION ALL SELECT zone_id AS z, LEAST(GREATEST(((x0 + w2 + 5000) + 1800000) * 512 // 3600000, 0), 511) AS cxa, LEAST(GREATEST(((x0 + w) + 1800000) * 512 // 3600000, 0), 511) AS cxb, (511 - LEAST(GREATEST(((y0 + h) + 900000) * 512 // 1800000, 0), 511)) AS cyf FROM zones WHERE shape = 3), "
        "ve AS (SELECT zone_id AS z, LEAST(GREATEST(((x0) + 1800000) * 512 // 3600000, 0), 511) AS cxf, (511 - LEAST(GREATEST(((y0 + h) + 900000) * 512 // 1800000, 0), 511)) AS cya, (511 - LEAST(GREATEST(((y0) + 900000) * 512 // 1800000, 0), 511)) AS cyb FROM zones WHERE shape IN (0, 1) UNION ALL SELECT zone_id AS z, LEAST(GREATEST(((x0 + w) + 1800000) * 512 // 3600000, 0), 511) AS cxf, (511 - LEAST(GREATEST(((y0 + h) + 900000) * 512 // 1800000, 0), 511)) AS cya, (511 - LEAST(GREATEST(((y0) + 900000) * 512 // 1800000, 0), 511)) AS cyb FROM zones WHERE shape IN (0, 1) UNION ALL SELECT zone_id AS z, LEAST(GREATEST(((x0 + w) + 1800000) * 512 // 3600000, 0), 511) AS cxf, (511 - LEAST(GREATEST(((y0 + h2) + 900000) * 512 // 1800000, 0), 511)) AS cya, (511 - LEAST(GREATEST(((y0) + 900000) * 512 // 1800000, 0), 511)) AS cyb FROM zones WHERE shape = 2 UNION ALL SELECT zone_id AS z, LEAST(GREATEST(((x0 + w2) + 1800000) * 512 // 3600000, 0), 511) AS cxf, (511 - LEAST(GREATEST(((y0 + h) + 900000) * 512 // 1800000, 0), 511)) AS cya, (511 - LEAST(GREATEST(((y0 + h2) + 900000) * 512 // 1800000, 0), 511)) AS cyb FROM zones WHERE shape = 2 UNION ALL SELECT zone_id AS z, LEAST(GREATEST(((x0) + 1800000) * 512 // 3600000, 0), 511) AS cxf, (511 - LEAST(GREATEST(((y0 + h) + 900000) * 512 // 1800000, 0), 511)) AS cya, (511 - LEAST(GREATEST(((y0) + 900000) * 512 // 1800000, 0), 511)) AS cyb FROM zones WHERE shape = 2 UNION ALL SELECT zone_id AS z, LEAST(GREATEST(((x0) + 1800000) * 512 // 3600000, 0), 511) AS cxf, (511 - LEAST(GREATEST(((y0 + h2) + 900000) * 512 // 1800000, 0), 511)) AS cya, (511 - LEAST(GREATEST(((y0) + 900000) * 512 // 1800000, 0), 511)) AS cyb FROM zones WHERE shape = 3 UNION ALL SELECT zone_id AS z, LEAST(GREATEST(((x0 + w2) + 1800000) * 512 // 3600000, 0), 511) AS cxf, (511 - LEAST(GREATEST(((y0 + h2) + 900000) * 512 // 1800000, 0), 511)) AS cya, (511 - LEAST(GREATEST(((y0) + 900000) * 512 // 1800000, 0), 511)) AS cyb FROM zones WHERE shape = 3 UNION ALL SELECT zone_id AS z, LEAST(GREATEST(((x0 + w2 + 5000) + 1800000) * 512 // 3600000, 0), 511) AS cxf, (511 - LEAST(GREATEST(((y0 + h) + 900000) * 512 // 1800000, 0), 511)) AS cya, (511 - LEAST(GREATEST(((y0 + h2 + 5000) + 900000) * 512 // 1800000, 0), 511)) AS cyb FROM zones WHERE shape = 3 UNION ALL SELECT zone_id AS z, LEAST(GREATEST(((x0 + w) + 1800000) * 512 // 3600000, 0), 511) AS cxf, (511 - LEAST(GREATEST(((y0 + h) + 900000) * 512 // 1800000, 0), 511)) AS cya, (511 - LEAST(GREATEST(((y0 + h2 + 5000) + 900000) * 512 // 1800000, 0), 511)) AS cyb FROM zones WHERE shape = 3), "
        "cells AS (SELECT z, unnest(generate_series(cxa, cxb)) AS cx, "
        "cyf AS cy FROM he "
        "UNION ALL SELECT z, cxf AS cx, "
        "unnest(generate_series(cya, cyb)) AS cy FROM ve), "
        "u AS (SELECT DISTINCT z, cx, cy FROM cells) "
        "SELECT (cx // 64)::BIGINT AS tx, (cy // 64)::BIGINT AS ty, "
        "count(*)::BIGINT AS n_burned, "
        "count(DISTINCT z)::BIGINT AS n_gids FROM u GROUP BY 1, 2"
    )


def q_raster_trend(k: int = 4) -> str:
    """Twin of queries.q_raster_trend: the same integer slope
    numerator over the four salted surfaces per pixel."""
    from spapy_ray.sources.rasters import sql_dem_int

    vs = [f"({sql_dem_int('px', 'py', s)})::BIGINT" for s in range(k)]
    sv = " + ".join(vs)
    stv = " + ".join(f"{t} * {v}" for t, v in enumerate(vs))
    st = sum(range(k))
    return (
        "WITH px AS (SELECT p % 512 AS px, p // 512 AS py "
        "FROM range(262144) t(p)), "
        f"v AS (SELECT px, py, {k} * ({stv}) - {st} * ({sv}) "
        "AS sn FROM px) "
        "SELECT (px // 64)::BIGINT AS tx, (py // 64)::BIGINT AS ty, "
        "sum(sn)::BIGINT AS sum_slope_num, "
        "sum(CASE WHEN sn > 0 THEN 1 ELSE 0 END)::BIGINT AS n_rising, "
        "sum(CASE WHEN sn < 0 THEN 1 ELSE 0 END)::BIGINT AS n_falling "
        "FROM v GROUP BY 1, 2"
    )


def q_raster_morphology() -> str:
    """Twin of queries.q_raster_morphology: LEAST/GREATEST over the 9
    edge-clamped neighbors (v >= 0, so erosion == window max = 0 and
    dilation == window min = 0)."""
    from spapy_ray.sources.rasters import sql_dem_int

    def cl(e: str) -> str:
        return f"LEAST(GREATEST({e}, 0), 511)"

    nine = [sql_dem_int(cl(f"px + {dx}"), cl(f"py + {dy}"), 0)
            for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    g9 = ", ".join(f"({v})" for v in nine)
    c = sql_dem_int("px", "py", 0)
    return (
        "WITH px AS (SELECT p % 512 AS px, p // 512 AS py "
        "FROM range(262144) t(p)), "
        f"v AS (SELECT px, py, ({c}) AS c, GREATEST({g9}) AS mx, "
        f"LEAST({g9}) AS mn FROM px) "
        "SELECT (px // 64)::BIGINT AS tx, (py // 64)::BIGINT AS ty, "
        "sum(CASE WHEN c = 0 THEN 1 ELSE 0 END)::BIGINT AS n_marks, "
        "sum(CASE WHEN mx = 0 THEN 1 ELSE 0 END)::BIGINT AS n_eroded, "
        "sum(CASE WHEN mn = 0 THEN 1 ELSE 0 END)::BIGINT AS n_dilated "
        "FROM v GROUP BY 1, 2"
    )


def q_cost_distance(rounds: int = 8, sent: int = 1 << 40) -> str:
    """Twin of queries.q_cost_distance: unrolled MATERIALIZED
    min-plus rounds with window-lag neighbors (a missing neighbor
    coalesces to self — the same no-op as the engine's
    edge-replicated apron)."""
    from spapy_ray.sources.rasters import sql_dem_int

    z = sql_dem_int("px", "py", 0)
    parts = [
        "WITH px AS (SELECT p % 512 AS px, p // 512 AS py "
        "FROM range(262144) t(p)), "
        f"c0 AS MATERIALIZED (SELECT px, py, ({z})::BIGINT AS v, "
        f"(CASE WHEN ({z}) = 0 THEN 0 ELSE {sent} END)::BIGINT AS c "
        "FROM px)"
    ]
    for r in range(1, rounds + 1):
        p = f"c{r-1}"
        nb = [
            f"COALESCE(lag(c) OVER (PARTITION BY py ORDER BY px), c)",
            f"COALESCE(lead(c) OVER (PARTITION BY py ORDER BY px), c)",
            f"COALESCE(lag(c) OVER (PARTITION BY px ORDER BY py), c)",
            f"COALESCE(lead(c) OVER (PARTITION BY px ORDER BY py), c)",
        ]
        terms = ", ".join(f"{e} + v + 1" for e in nb)
        parts.append(
            f"c{r} AS MATERIALIZED (SELECT px, py, v, "
            f"LEAST(c, {terms})::BIGINT AS c FROM {p})")
    return (
        ", ".join(parts)
        + f" SELECT (px // 64)::BIGINT AS tx, (py // 64)::BIGINT AS ty, "
        f"sum(CASE WHEN c < {sent} THEN 1 ELSE 0 END)::BIGINT "
        "AS n_reached, "
        f"sum(CASE WHEN c < {sent} THEN c ELSE 0 END)::BIGINT "
        "AS sum_cost, "
        f"COALESCE(max(CASE WHEN c < {sent} THEN c END), -1)::BIGINT "
        f"AS max_cost FROM c{rounds} GROUP BY 1, 2"
    )


def q_zonal_argmax() -> str:
    """Twin of queries.q_zonal_argmax: the same packed-key MIN over
    the pixel-zone membership join."""
    return (
        f"WITH {_pixel_grid_cte()}, zones AS ({sql_zones_cte()}), "
        "j AS (SELECT z.zone_id, (511 - g.z) * 4398046511104 "
        "+ g.py * 2097152 + g.px AS k FROM grid g CROSS JOIN zones z "
        f"WHERE {sql_pip_condition('g.lon', 'g.lat')}), "
        "m AS (SELECT zone_id, min(k) AS k FROM j GROUP BY 1) "
        "SELECT zone_id::BIGINT AS zone_id, "
        "(511 - k // 4398046511104)::BIGINT AS max_z, "
        "((k // 2097152) % 2097152)::BIGINT AS at_py, "
        "(k % 2097152)::BIGINT AS at_px FROM m"
    )


def q_raster_nodata_stats(nodata: int = 255) -> str:
    """Twin of queries.q_raster_nodata_stats (FILTER out nodata)."""
    from spapy_ray.sources.rasters import sql_dem_int

    z = sql_dem_int("px", "py", 0)
    return (
        "WITH px AS (SELECT p % 512 AS px, p // 512 AS py "
        "FROM range(262144) t(p)), "
        f"v AS (SELECT px, py, ({z})::BIGINT AS z FROM px) "
        "SELECT (px // 64)::BIGINT AS tx, (py // 64)::BIGINT AS ty, "
        f"count(*) FILTER (z <> {nodata})::BIGINT AS n_valid, "
        f"COALESCE(sum(z) FILTER (z <> {nodata}), 0)::BIGINT "
        "AS sum_valid, "
        f"COALESCE(min(z) FILTER (z <> {nodata}), -1)::BIGINT "
        "AS min_valid, "
        f"COALESCE(max(z) FILTER (z <> {nodata}), -1)::BIGINT "
        "AS max_valid FROM v GROUP BY 1, 2"
    )


def q_raster_blur5() -> str:
    """Twin of the chained binomial blur: pass 1 is closed-form
    (9 clamped sql_dem_int terms), pass 2 joins the MATERIALIZED
    pass-1 table to a 9-row offset VALUES list with the same
    LEAST/GREATEST edge clamp (== np.pad mode='edge'); per-tile
    sum/min/max of the undivided x256 response."""
    from spapy_ray.sources.rasters import sql_dem_int

    def cl(e: str) -> str:
        return f"LEAST(GREATEST({e}, 0), 511)"

    W = {(-1, -1): 1, (0, -1): 2, (1, -1): 1,
         (-1, 0): 2, (0, 0): 4, (1, 0): 2,
         (-1, 1): 1, (0, 1): 2, (1, 1): 1}
    p1 = " + ".join(
        f"{w} * ({sql_dem_int(cl(f'px + {dx}'), cl(f'py + {dy}'), 0)})"
        for (dx, dy), w in W.items())
    offs = ", ".join(f"({dx}, {dy}, {w})" for (dx, dy), w in W.items())
    return (
        "WITH px AS (SELECT p % 512 AS px, p // 512 AS py "
        "FROM range(262144) t(p)), "
        f"p1 AS MATERIALIZED (SELECT px, py, ({p1})::BIGINT AS v "
        "FROM px), "
        f"o(dx, dy, w) AS (SELECT * FROM (VALUES {offs})), "
        "p2 AS (SELECT c.px, c.py, sum(n.v * o.w)::BIGINT AS v "
        "FROM px c CROSS JOIN o JOIN p1 n "
        "ON n.px = LEAST(GREATEST(c.px + o.dx, 0), 511) "
        "AND n.py = LEAST(GREATEST(c.py + o.dy, 0), 511) "
        "GROUP BY 1, 2) "
        "SELECT (px // 64)::BIGINT AS tx, (py // 64)::BIGINT AS ty, "
        "sum(v)::BIGINT AS blur_sum, min(v)::BIGINT AS blur_min, "
        "max(v)::BIGINT AS blur_max FROM p2 GROUP BY 1, 2"
    )


def q_raster_hist_match() -> str:
    """Twin of histogram matching: closed-form surfaces A (salt 0)
    and B (salt 1), windowed CDFs over occupied bins, LUT = min
    existing B value whose CDF covers A's (== dense searchsorted:
    the landing bin is always occupied), per-tile stats."""
    from spapy_ray.sources.rasters import sql_dem_int

    va = sql_dem_int("px", "py", 0)
    vb = sql_dem_int("px", "py", 1)
    return (
        "WITH px AS (SELECT p % 512 AS px, p // 512 AS py "
        "FROM range(262144) t(p)), "
        f"a AS (SELECT px, py, ({va})::BIGINT AS v FROM px), "
        f"b AS (SELECT ({vb})::BIGINT AS v FROM px), "
        "ca AS (SELECT v, sum(n) OVER (ORDER BY v)::BIGINT AS c FROM "
        "(SELECT v, count(*) AS n FROM a GROUP BY 1)), "
        "cb AS (SELECT v, sum(n) OVER (ORDER BY v)::BIGINT AS c FROM "
        "(SELECT v, count(*) AS n FROM b GROUP BY 1)), "
        "lut AS (SELECT ca.v AS va, min(cb.v) AS m FROM ca "
        "JOIN cb ON cb.c >= ca.c GROUP BY 1), "
        "mp AS (SELECT a.px, a.py, lut.m FROM a "
        "JOIN lut ON lut.va = a.v) "
        "SELECT (px // 64)::BIGINT AS tx, (py // 64)::BIGINT AS ty, "
        "sum(m)::BIGINT AS m_sum, min(m)::BIGINT AS m_min, "
        "max(m)::BIGINT AS m_max FROM mp GROUP BY 1, 2"
    )


def q_raster_log5() -> str:
    """Twin of the 5×5 LoG: 21 nonzero closed-form terms with the
    same 2-px edge clamp, per-tile stats."""
    from spapy_ray.sources.rasters import sql_dem_int

    W5 = ((0, 0, -1, 0, 0),
          (0, -1, -2, -1, 0),
          (-1, -2, 16, -2, -1),
          (0, -1, -2, -1, 0),
          (0, 0, -1, 0, 0))

    def cl(e: str) -> str:
        return f"LEAST(GREATEST({e}, 0), 511)"

    terms = " + ".join(
        f"{W5[dy + 2][dx + 2]} * "
        f"({sql_dem_int(cl(f'px + {dx}'), cl(f'py + {dy}'), 0)})"
        for dy in range(-2, 3) for dx in range(-2, 3)
        if W5[dy + 2][dx + 2])
    return (
        "WITH px AS (SELECT p % 512 AS px, p // 512 AS py "
        "FROM range(262144) t(p)), "
        f"r AS (SELECT px, py, ({terms})::BIGINT AS v FROM px) "
        "SELECT (px // 64)::BIGINT AS tx, (py // 64)::BIGINT AS ty, "
        "sum(v)::BIGINT AS log_sum, min(v)::BIGINT AS log_min, "
        "max(v)::BIGINT AS log_max FROM r GROUP BY 1, 2"
    )


def q_raster_texture5() -> str:
    """Twin of 5×5 texture: Σx and Σx² as 25 clamped closed-form
    terms each, 25·s2 − s1²."""
    from spapy_ray.sources.rasters import sql_dem_int

    def cl(e: str) -> str:
        return f"LEAST(GREATEST({e}, 0), 511)"

    cells = [sql_dem_int(cl(f"px + {dx}"), cl(f"py + {dy}"), 0)
             for dy in range(-2, 3) for dx in range(-2, 3)]
    s1 = " + ".join(f"({c})" for c in cells)
    s2 = " + ".join(f"({c}) * ({c})" for c in cells)
    return (
        "WITH px AS (SELECT p % 512 AS px, p // 512 AS py "
        "FROM range(262144) t(p)), "
        f"r AS (SELECT px, py, (25 * ({s2}) - ({s1}) * ({s1}))"
        "::BIGINT AS v FROM px) "
        "SELECT (px // 64)::BIGINT AS tx, (py // 64)::BIGINT AS ty, "
        "sum(v)::BIGINT AS tex_sum, min(v)::BIGINT AS tex_min, "
        "max(v)::BIGINT AS tex_max FROM r GROUP BY 1, 2"
    )


def q_terrain_rose() -> str:
    """Twin of the gradient rose: Horn integer derivatives from 8
    clamped closed-form neighbors, the same octant CASE, global
    counts."""
    from spapy_ray.sources.rasters import sql_dem_int

    def cl(e: str) -> str:
        return f"LEAST(GREATEST({e}, 0), 511)"

    def cell(dx: int, dy: int) -> str:
        return f"({sql_dem_int(cl(f'px + {dx}'), cl(f'py + {dy}'), 0)})"

    a, b, c = cell(-1, -1), cell(0, -1), cell(1, -1)
    d, f = cell(-1, 0), cell(1, 0)
    g, h, i = cell(-1, 1), cell(0, 1), cell(1, 1)
    gx = f"(({c} + 2 * {f} + {i}) - ({a} + 2 * {d} + {g}))"
    gy = f"(({g} + 2 * {h} + {i}) - ({a} + 2 * {b} + {c}))"
    return (
        "WITH px AS (SELECT p % 512 AS px, p // 512 AS py "
        "FROM range(262144) t(p)), "
        f"gr AS (SELECT {gx} AS gx, {gy} AS gy FROM px), "
        "d AS (SELECT CASE "
        "WHEN gx = 0 AND gy = 0 THEN 'O' "
        "WHEN abs(gx) > abs(gy) THEN "
        "(CASE WHEN gx > 0 THEN 'E' ELSE 'W' END) "
        "WHEN abs(gy) > abs(gx) THEN "
        "(CASE WHEN gy > 0 THEN 'N' ELSE 'S' END) "
        "WHEN gy > 0 THEN (CASE WHEN gx > 0 THEN 'NE' ELSE 'NW' END) "
        "ELSE (CASE WHEN gx > 0 THEN 'SE' ELSE 'SW' END) END AS dir "
        "FROM gr) "
        "SELECT dir, count(*)::BIGINT AS n_pix FROM d GROUP BY 1"
    )


def q_tif_rgb_roundtrip(W: int = 210, H: int = 130, T: int = 64) -> str:
    """Twin of the chunky RGB GeoTIFF round-trip: per-(tile, band)
    pixel aggregates of the closed-form image
    px(X, Y, b) = (3X + 5Y + 17b) % 251."""
    return (
        "WITH px AS (SELECT x.x AS X, y.y AS Y, b.b AS band, "
        "(x.x * 3 + y.y * 5 + b.b * 17) % 251 AS px "
        f"FROM (SELECT unnest(range({W})) AS x) x, "
        f"(SELECT unnest(range({H})) AS y) y, "
        "(SELECT unnest(range(3)) AS b) b) "
        f"SELECT (X // {T})::BIGINT AS tx, (Y // {T})::BIGINT AS ty, "
        "band::BIGINT AS band, sum(px)::BIGINT AS px_sum, "
        "min(px)::BIGINT AS px_min, max(px)::BIGINT AS px_max "
        f"FROM px GROUP BY X // {T}, Y // {T}, band")
