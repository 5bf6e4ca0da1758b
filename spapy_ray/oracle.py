"""DuckDB oracle SQL builders.

Every SQL string here is the independent twin of an engine pipeline:
the driver runs both at sf=0.01 and hash-compares results
(__ray_entry__.py contract). Synthetic inputs (pages, zones) are
reconstructed arithmetically in SQL — see sources/pages.py and
sources/zones.py for the shared integer specs.

The row index for page synthesis comes from ``row_number() OVER () - 1``
on the lineitem view (DuckDB's range() rejects subquery bounds);
only the *set* of indices matters, so window order is irrelevant.
"""

from __future__ import annotations

from spapy_ray.kernels.cells import sql_cell_expr
from spapy_ray.kernels.geom import sql_haversine
from spapy_ray.kernels.hashing import sql_fnv1a
from spapy_ray.sources.pages import sql_fixed5
from spapy_ray.sources.zones import sql_pip_condition, sql_zones_cte
from spapy_ray.stages.cellindex import CELL_RES, TILE_RES

GEO_RE_SQL = r" geo: (-?\d+\.\d+),(-?\d+\.\d+)"


def pages_cte() -> str:
    """pages reconstructed from lineitem's row count (sql twin of
    sources.pages.gen_pages_table; html omitted)."""
    m = "(SELECT greatest(1, count(*) * 7 // 10) FROM lineitem)"
    key = f"(i % {m})"
    g = f"((({key}::UBIGINT * 2654435761::UBIGINT) % 4294967296::UBIGINT))"
    lat5 = f"((({g} % 1700000)::BIGINT * 10 + 5) - 8500000)"
    lon5 = f"(((({g} // 1700000) % 3600000)::BIGINT * 10 + 5) - 18000000)"
    has_geo = f"({g} % 10 < 3)"
    text = (
        f"('doc ' || {key}::VARCHAR || ' tok' || ({key} * 7919 % 997)::VARCHAR || "
        f"' tok' || ({key} * 104729 % 997)::VARCHAR || ' lorem ipsum dolor sit amet' || "
        f"(CASE WHEN {has_geo} THEN ' geo: ' || {sql_fixed5(lat5)} || ',' || {sql_fixed5(lon5)} "
        f"ELSE '' END) || ' consectetur adipiscing elit')"
    )
    html = (f"('<html><head><title>page ' || {key}::VARCHAR || "
            f"'</title></head><body>' || {text} || '</body></html>')")
    return (
        "pages AS (SELECT "
        f"'https://site' || ({key} % 1000)::VARCHAR || '.example/page' || {key}::VARCHAR AS url, "
        "TIMESTAMP '2020-01-01 00:00:00' + to_microseconds(i * 1000000) AS warc_ts, "
        f"{text} AS text, "
        f"{html} AS html, "
        f"(['en','es','de','fr','pt'])[{key} % 5 + 1] AS lang "
        "FROM (SELECT row_number() OVER () - 1 AS i FROM lineitem) t)"
    )


def geo_cte() -> str:
    """pages → hashed (url fnv + regex groups, computed once) → geo
    (lat/lon/geo_src). Twin of stages.geocode.geocode_batch."""
    f_lat = "(((urlhash % 1700000)::BIGINT * 10 + 5 - 8500000)::DOUBLE / 100000.0)"
    f_lon = "((((urlhash // 1700000) % 3600000)::BIGINT * 10 + 5 - 18000000)::DOUBLE / 100000.0)"
    return (
        f"{pages_cte()}, "
        f"hashed AS (SELECT *, {sql_fnv1a('url')} AS urlhash, "
        f"regexp_extract(text, '{GEO_RE_SQL}', 1) AS glat, "
        f"regexp_extract(text, '{GEO_RE_SQL}', 2) AS glon FROM pages), "
        "geo AS (SELECT url, warc_ts, text, lang, "
        f"CASE WHEN glat <> '' THEN glat::DOUBLE ELSE {f_lat} END AS lat, "
        f"CASE WHEN glat <> '' THEN glon::DOUBLE ELSE {f_lon} END AS lon, "
        "CASE WHEN glat <> '' THEN 'text' ELSE 'url' END AS geo_src "
        "FROM hashed)"
    )


def geo_zones_cte(num_zones: int = 200) -> str:
    return f"{geo_cte()}, zones AS ({sql_zones_cte(num_zones)})"


def join_cte(num_zones: int = 200) -> str:
    """The PIP join rows (url, warc_ts, zone attrs)."""
    return (
        f"{geo_zones_cte(num_zones)}, "
        "joined AS (SELECT g.url, g.warc_ts, g.lang, z.zone_id, z.name, z.labelrank "
        "FROM geo g CROSS JOIN zones z "
        f"WHERE {sql_pip_condition('g.lon', 'g.lat')})"
    )


# ---------------------------------------------------------------- queries

def q_pages() -> str:
    return f"WITH {pages_cte()} SELECT url, warc_ts, text, lang FROM pages"


def q_geocode() -> str:
    return (f"WITH {geo_cte()} "
            "SELECT url, warc_ts, lat, lon, geo_src FROM geo")


def q_cell_index() -> str:
    cell = sql_cell_expr("lon", "lat", CELL_RES)
    tile = sql_cell_expr("lon", "lat", TILE_RES)
    return (f"WITH {geo_cte()} "
            f"SELECT url, warc_ts, {cell}::BIGINT AS cell, {tile}::BIGINT AS tile FROM geo")


def q_pip_join() -> str:
    return (f"WITH {join_cte()} "
            "SELECT url, warc_ts, zone_id, name, labelrank FROM joined")


def q_media_decode() -> str:
    """Twin of the real PNG decode: pixel aggregates from the
    closed-form pixel spec (sources/media.py). The payload bytes are
    zlib-dependent and never hashed."""
    from spapy_ray.sources.media import sql_media_cte

    return (
        f"WITH {sql_media_cte()} "
        "SELECT d.media_id, d.w::BIGINT AS width, "
        "d.h::BIGINT AS height, sum(p.px)::BIGINT AS px_sum, "
        "min(p.px)::BIGINT AS px_min, max(p.px)::BIGINT AS px_max "
        "FROM media_dims d JOIN media_px p USING (media_id) "
        "GROUP BY d.media_id, d.w, d.h")


def q_media_resize(width: int = 24, height: int = 20) -> str:
    """Twin of decode → nearest-neighbor resize → re-encode →
    decode: target pixel (y', x') samples source index
    floor(t * src // dst) of the closed-form image."""
    from spapy_ray.sources.media import sql_media_dims_cte

    return (
        f"WITH {sql_media_dims_cte()}, "
        "tgt AS (SELECT d.media_id, "
        f"((x.x * d.w // {width}) * 3 + (y.y * d.h // {height}) * 5 "
        "+ d.media_id * 7) % 251 AS px "
        "FROM media_dims d, "
        f"LATERAL (SELECT unnest(range({width})) AS x) x, "
        f"LATERAL (SELECT unnest(range({height})) AS y) y) "
        f"SELECT media_id, {width}::BIGINT AS width, "
        f"{height}::BIGINT AS height, sum(px)::BIGINT AS px_sum, "
        "min(px)::BIGINT AS px_min, max(px)::BIGINT AS px_max "
        "FROM tgt GROUP BY media_id")


def q_pip_join_cells() -> str:
    """Twin of the co-partitioned (cell + salt) spatial join — the
    partitioning is an engine-side detail, so the oracle is simply
    the PIP pair set."""
    return (f"WITH {join_cte()} "
            "SELECT url, zone_id FROM joined")


def q_zone_page_counts() -> str:
    return (f"WITH {join_cte()} "
            "SELECT zone_id, count(*)::BIGINT AS n_pages FROM joined GROUP BY zone_id")


def q_top_zones(k: int = 20) -> str:
    return (f"WITH {join_cte()} "
            "SELECT zone_id, count(*)::BIGINT AS n_pages FROM joined GROUP BY zone_id "
            f"ORDER BY n_pages DESC, zone_id LIMIT {k}")


def q_tile_counts() -> str:
    tile = sql_cell_expr("lon", "lat", TILE_RES)
    return (f"WITH {geo_cte()} "
            f"SELECT {tile}::BIGINT AS tile, count(*)::BIGINT AS n_pages "
            "FROM geo GROUP BY 1")


def q_dedup_pages() -> str:
    return (f"WITH {pages_cte()} "
            "SELECT url, min(warc_ts) AS first_ts, count(*)::BIGINT AS n_copies "
            "FROM pages GROUP BY url")


def q_knn_zones(k: int = 3) -> str:
    cx = "((z.x0::DOUBLE / 10000.0) + ((z.x0 + z.w)::DOUBLE / 10000.0)) / 2.0"
    cy = "((z.y0::DOUBLE / 10000.0) + ((z.y0 + z.h)::DOUBLE / 10000.0)) / 2.0"
    dist = sql_haversine("g.lon", "g.lat", f"({cx})", f"({cy})")
    return (
        f"WITH {geo_zones_cte()} "
        "SELECT g.url, g.warc_ts, z.zone_id, "
        f"row_number() OVER (PARTITION BY g.url, g.warc_ts ORDER BY {dist}, z.zone_id)::BIGINT AS rank "
        "FROM geo g CROSS JOIN zones z "
        f"QUALIFY rank <= {k}"
    )


def q_knn_zones_cells(k: int = 3) -> str:
    """Same exact kNN as q_knn_zones, keyed by url#epoch-us (the
    cell-partitioned engine form carries a single point key)."""
    cx = "((z.x0::DOUBLE / 10000.0) + ((z.x0 + z.w)::DOUBLE / 10000.0)) / 2.0"
    cy = "((z.y0::DOUBLE / 10000.0) + ((z.y0 + z.h)::DOUBLE / 10000.0)) / 2.0"
    dist = sql_haversine("g.lon", "g.lat", f"({cx})", f"({cy})")
    return (
        f"WITH {geo_zones_cte()} "
        "SELECT g.url || '#' || epoch_us(g.warc_ts)::VARCHAR AS key, z.zone_id, "
        f"row_number() OVER (PARTITION BY g.url, g.warc_ts ORDER BY {dist}, z.zone_id)::BIGINT AS rank "
        "FROM geo g CROSS JOIN zones z "
        f"QUALIFY rank <= {k}"
    )


def q_zone_bounds_area(num_zones: int = 200) -> str:
    area_u2 = ("(CASE WHEN shape IN (0, 1) THEN w * h "
               "WHEN shape = 2 THEN w * h2 + w2 * (h - h2) "
               "ELSE w2 * h2 + (w - w2 - 5000) * (h - h2 - 5000) END)")
    return (
        f"WITH zones AS ({sql_zones_cte(num_zones)}) "
        "SELECT zone_id, name, "
        "x0::DOUBLE / 10000.0 AS minx, y0::DOUBLE / 10000.0 AS miny, "
        "(x0 + w)::DOUBLE / 10000.0 AS maxx, (y0 + h)::DOUBLE / 10000.0 AS maxy, "
        f"{area_u2}::DOUBLE / 100000000.0 AS area FROM zones"
    )


def q_select_zones(num_zones: int = 200) -> str:
    return (f"WITH zones AS ({sql_zones_cte(num_zones)}) "
            "SELECT zone_id, name, labelrank FROM zones "
            "WHERE labelrank >= 7 AND area_class < 80.0")


def q_lineitem_pricing() -> str:
    return (
        "SELECT l_returnflag, l_linestatus, "
        "sum(l_quantity) AS sum_qty, "
        "round(sum(l_extendedprice), 2) AS sum_base_price, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, "
        "count(*)::BIGINT AS count_order "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus"
    )


def q_events_by_type() -> str:
    return ("SELECT event_type, count(*)::BIGINT AS n_events, "
            "round(sum(value), 2) AS sum_value "
            "FROM events GROUP BY event_type")


def q_docs_token_stats() -> str:
    stop = "','".join(("the", "and", "of", "a", "to", "in", "is", "it"))
    return (
        "SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens, "
        f"len(list_filter(string_split(text, ' '), w -> w IN ('{stop}')))::BIGINT AS n_stop, "
        f"len(list_filter(string_split(text, ' '), w -> w IN ('{stop}')))::DOUBLE / "
        "greatest(len(string_split(text, ' ')), 1)::DOUBLE AS stop_ratio "
        "FROM documents"
    )


def q_docs_dedup_text() -> str:
    return ("SELECT min(doc_id) AS min_doc_id, count(*)::BIGINT AS n_copies "
            "FROM documents GROUP BY text")


def q_suppliers_per_nation() -> str:
    return ("SELECT n.n_name, count(*)::BIGINT AS n_suppliers "
            "FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey "
            "GROUP BY n.n_name")


def q_ann_topk(k: int = 5, n_queries: int = 10) -> str:
    sim = ("list_cosine_similarity("
           "list_transform(q.embedding, x -> x::DOUBLE), "
           "list_transform(e.embedding, x -> x::DOUBLE))")
    return (
        f"SELECT q.vec_id AS qid, e.vec_id AS vec_id, "
        f"row_number() OVER (PARTITION BY q.vec_id ORDER BY {sim} DESC, e.vec_id)::BIGINT AS rank "
        f"FROM embeddings q CROSS JOIN embeddings e "
        f"WHERE q.vec_id < {n_queries} AND e.vec_id <> q.vec_id "
        f"QUALIFY rank <= {k}"
    )


# ---------------------------------------------------------------- raster

def _pixel_grid_cte() -> str:
    """512x512 global pixel grid with exact-dyadic center coords and the
    integer DEM surface (sql twin of sources.rasters; pixel_w=360/512
    and pixel_h=-170/512 are exactly representable, so lon/lat are
    bit-identical to the engine's float64 path)."""
    from spapy_ray.sources.rasters import sql_dem_int

    return (
        "grid AS (SELECT p % 512 AS px, p // 512 AS py, "
        "-180.0 + ((p % 512) + 0.5) * 0.703125 AS lon, "
        "85.0 + ((p // 512) + 0.5) * -0.33203125 AS lat, "
        f"{sql_dem_int('(p % 512)', '(p // 512)', 0)} AS z, "
        f"{sql_dem_int('(p % 512)', '(p // 512)', 1)} AS z2 "
        "FROM range(262144) t(p))"
    )


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


def _polygonize_cc_cte() -> str:
    """Connected-component labeling of the reclassified DEM in pure
    SQL: horizontal runs (window functions) → run-adjacency edges
    (same value, overlapping x-range on adjacent rows) → min-label
    propagation via a recursive CTE (the label only propagates to
    nodes with larger ids, which is sufficient: the component minimum
    is below every other node id on some path). Produces
    comp(root, value, n_pixels, minx, miny, maxx, maxy, n_tiles)."""
    from spapy_ray.sources.rasters import sql_dem_int

    v = f"(({sql_dem_int('(p % 512)', '(p // 512)', 0)}) // 64 + 1)"
    return (
        f"cells AS (SELECT p % 512 AS x, p // 512 AS y, {v} AS v FROM range(262144) t(p)), "
        "marks AS (SELECT x, y, v, CASE WHEN lag(v) OVER (PARTITION BY y ORDER BY x) "
        "IS DISTINCT FROM v THEN 1 ELSE 0 END AS brk FROM cells), "
        "runsx AS (SELECT x, y, v, sum(brk) OVER (PARTITION BY y ORDER BY x "
        "ROWS UNBOUNDED PRECEDING) AS rseq FROM marks), "
        "runs AS (SELECT y, v, min(x) AS x0, max(x) AS x1, count(*) AS len, "
        "y * 1024 + rseq AS rid FROM runsx GROUP BY y, rseq, v), "
        "redges AS (SELECT a.rid AS src, b.rid AS dst FROM runs a JOIN runs b "
        "ON b.y = a.y + 1 AND a.v = b.v AND a.x0 <= b.x1 AND b.x0 <= a.x1), "
        "bedges AS (SELECT src, dst FROM redges UNION ALL SELECT dst AS src, src AS dst FROM redges), "
        "cc AS (SELECT rid AS node, rid AS lab FROM runs "
        "UNION SELECT e.dst AS node, cc.lab FROM cc JOIN bedges e ON e.src = cc.node "
        "WHERE cc.lab < e.dst), "
        "lab AS (SELECT node, min(lab) AS root FROM cc GROUP BY node), "
        "tiles AS (SELECT DISTINCT l.root, (r.y // 64) AS tty, "
        "unnest(generate_series(r.x0 // 64, r.x1 // 64)) AS ttx "
        "FROM runs r JOIN lab l ON l.node = r.rid), "
        "ntl AS (SELECT root, count(*) AS n_tiles FROM tiles GROUP BY root), "
        "comp AS (SELECT l.root, min(r.v) AS value, sum(r.len)::BIGINT AS n_pixels, "
        "min(r.x0)::BIGINT AS minx, min(r.y)::BIGINT AS miny, "
        "max(r.x1)::BIGINT AS maxx, max(r.y)::BIGINT AS maxy, "
        "min(n.n_tiles)::BIGINT AS n_tiles "
        "FROM runs r JOIN lab l ON l.node = r.rid JOIN ntl n ON n.root = l.root "
        "GROUP BY l.root)"
    )


_COMP_ORDER = "value, minx, miny, maxx, maxy, n_pixels, n_tiles"


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

def q_split_zones(num_zones: int = 200) -> str:
    """Part bboxes after Multi* explode: shape 3 zones contribute two
    rows (their two disjoint rects), everything else its full bbox."""
    return (
        f"WITH zones AS ({sql_zones_cte(num_zones)}), parts AS ("
        "SELECT zone_id, x0 AS a, y0 AS b, "
        "CASE WHEN shape = 3 THEN x0 + w2 ELSE x0 + w END AS c, "
        "CASE WHEN shape = 3 THEN y0 + h2 ELSE y0 + h END AS d FROM zones "
        "UNION ALL "
        "SELECT zone_id, x0 + w2 + 5000, y0 + h2 + 5000, x0 + w, y0 + h "
        "FROM zones WHERE shape = 3) "
        "SELECT zone_id, a::DOUBLE / 10000.0 AS minx, b::DOUBLE / 10000.0 AS miny, "
        "c::DOUBLE / 10000.0 AS maxx, d::DOUBLE / 10000.0 AS maxy FROM parts"
    )


def q_buffer_zone_bounds(num_zones: int = 200, dist: float = 0.5) -> str:
    """Buffered bbox = bbox ± dist exactly (edge-midpoint offsets; dist
    dyadic so the double arithmetic is exact on both sides)."""
    return (
        f"WITH zones AS ({sql_zones_cte(num_zones)}) "
        f"SELECT zone_id, (x0::DOUBLE / 10000.0) - {dist} AS minx, "
        f"(y0::DOUBLE / 10000.0) - {dist} AS miny, "
        f"((x0 + w)::DOUBLE / 10000.0) + {dist} AS maxx, "
        f"((y0 + h)::DOUBLE / 10000.0) + {dist} AS maxy FROM zones"
    )


def q_project_equirect() -> str:
    """Equirectangular projection: x = R * (lon * pi/180) with the same
    double constant and multiply order as kernels.proj.equirect_forward."""
    rad = "0.017453292519943295"  # repr(pi/180) as a double literal
    return (
        f"WITH {geo_cte()} "
        f"SELECT url, warc_ts, 6378137.0 * (lon * {rad}) AS x, "
        f"6378137.0 * (lat * {rad}) AS y FROM geo"
    )


def q_dedup_first_rows() -> str:
    return (
        f"WITH {pages_cte()} "
        "SELECT url, warc_ts, lang FROM ("
        "SELECT url, warc_ts, lang, "
        "row_number() OVER (PARTITION BY url ORDER BY warc_ts) AS rn "
        "FROM pages) WHERE rn = 1"
    )


def q_events_hourly() -> str:
    return (
        "SELECT user_id, epoch_us(ts) // 3600000000 AS hour, "
        "count(*)::BIGINT AS n_events, round(sum(value), 2) AS sum_value "
        "FROM events GROUP BY 1, 2"
    )


def q_docs_lang_guess() -> str:
    from spapy_ray.stages.text import LANG_MARKERS

    scores = []
    for lang, markers in LANG_MARKERS.items():
        quoted = "','".join(markers)
        scores.append(
            f"len(list_filter(string_split(text, ' '), w -> w IN ('{quoted}'))) AS s_{lang}")
    langs = list(LANG_MARKERS)
    # first-wins argmax over the LANG_MARKERS order == np.argmax ties
    cases = []
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(f"s_{lang} >= s_{other}" for other in langs[i + 1:])
        cases.append(f"WHEN {conds} THEN '{lang}'")
    case = "CASE " + " ".join(cases) + f" ELSE '{langs[-1]}' END"
    return (f"SELECT doc_id, {case} AS lang_guess FROM "
            f"(SELECT doc_id, {', '.join(scores)} FROM documents)")


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


def q_minhash_sigs(num_hashes: int = 4) -> str:
    """MinHash signatures over documents: sig_i = min over 3-token
    shingles of mix(fnv1a64(shingle), i) — the exact twin of
    stages.neardup.minhash_batch (hash once, per-seed integer mix)."""
    from spapy_ray.stages.neardup import FNV_PRIME, minhash_mix_key

    def mix(i: int) -> str:
        k = minhash_mix_key(i)
        return ("((xor(" + sql_fnv1a("s") + f", {k}::UBIGINT)::HUGEINT * "
                f"{FNV_PRIME}::HUGEINT) % 18446744073709551616::HUGEINT)"
                "::UBIGINT")

    sigs = ", ".join(
        f"list_min(list_transform(sh, s -> {mix(i)})) AS sig{i}"
        for i in range(num_hashes))
    # degenerate case mirrored from the engine (minhash_batch): a
    # document with < 3 tokens hashes its whole text as one shingle
    return (
        "SELECT doc_id, " + sigs + " FROM ("
        "SELECT doc_id, CASE WHEN len(toks) < 3 THEN [text] ELSE "
        "list_transform(range(1, len(toks) - 1), "
        "j -> toks[j] || ' ' || toks[j + 1] || ' ' || toks[j + 2]) END AS sh "
        "FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents))"
    )


def q_simhash_docs() -> str:
    """Bit-exact SimHash twin: explode tokens, hash each with the
    UTF-8 fnv1a fold, majority-vote each of the 64 bits, repack."""
    th = sql_fnv1a("tok")
    return (
        "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
        "FROM documents), "
        f"h AS (SELECT doc_id, {th} AS th FROM toks), "
        "bits AS (SELECT doc_id, b, "
        "CASE WHEN sum(CASE WHEN (th >> b::INTEGER) & 1 = 1 THEN 1 ELSE -1 END) > 0 "
        "THEN 1 ELSE 0 END AS bit "
        "FROM h CROSS JOIN range(64) t(b) GROUP BY doc_id, b) "
        "SELECT doc_id, "
        "sum((bit::HUGEINT * (1::HUGEINT << b::INTEGER)))::UBIGINT AS simhash "
        "FROM bits GROUP BY doc_id"
    )


def q_embed_top_pairs(n_pairs: int = 20) -> str:
    sim = ("list_cosine_similarity("
           "list_transform(a.embedding, x -> x::DOUBLE), "
           "list_transform(b.embedding, x -> x::DOUBLE))")
    return (
        "SELECT a.vec_id AS key_a, b.vec_id AS key_b, "
        f"row_number() OVER (ORDER BY {sim} DESC, a.vec_id, b.vec_id)::BIGINT AS rank "
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
        f"QUALIFY rank <= {n_pairs}"
    )


def q_near_dup_docs(threshold: float = 0.8) -> str:
    """Exact all-pairs 3-shingle Jaccard — ground truth for the LSH
    near-dup pipeline (engine jaccard = |A∩B| / |A∪B| of distinct
    shingle sets; identical integer counts → identical doubles)."""
    return (
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
        "s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1), "
        "j -> toks[j] || ' ' || toks[j + 1] || ' ' || toks[j + 2])) AS sh FROM t), "
        "p AS (SELECT a.doc_id AS key_a, b.doc_id AS key_b, "
        "len(list_intersect(a.sh, b.sh))::DOUBLE / "
        "len(list_distinct(list_concat(a.sh, b.sh))) AS jacc "
        "FROM s a JOIN s b ON a.doc_id < b.doc_id) "
        f"SELECT key_a, key_b, jacc FROM p WHERE jacc >= {threshold}"
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


def q_events_sessions() -> str:
    from spapy_ray.stages.sessions import sql_sessionize

    return sql_sessionize()


def q_events_sliding() -> str:
    return (
        "WITH ev AS (SELECT epoch_us(ts) AS us, event_type, value FROM events), "
        "w AS (SELECT (us // 900000000 - j) * 900000000 AS window_start_us, "
        "event_type, value FROM ev CROSS JOIN range(2) t(j) "
        "WHERE us // 900000000 - j >= 0) "
        "SELECT window_start_us, event_type, count(*)::BIGINT AS n_events, "
        "round(sum(value), 2) AS sum_value "
        "FROM w GROUP BY 1, 2"
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


def q_docs_rolling_fp() -> str:
    """Twin of the rolling-hash fingerprint: min over 8-byte windows
    of the polynomial hash (base 1000003, mod 2^64), whole-text hash
    for docs shorter than a window."""
    from spapy_ray.kernels.hashing import sql_utf8_bytes

    fold = ("(h, c) -> ((h::HUGEINT * 1000003::HUGEINT + c::HUGEINT) "
            "% 18446744073709551616::HUGEINT)::UBIGINT")
    win = (f"list_min(list_transform(range(1, len(bs) - 6), i -> "
           f"list_reduce(list_prepend(0::UBIGINT, "
           f"list_transform(bs[i:i+7], x -> x::UBIGINT)), {fold})))")
    whole = (f"list_reduce(list_prepend(0::UBIGINT, "
             f"list_transform(bs, x -> x::UBIGINT)), {fold})")
    return (
        f"WITH b AS (SELECT doc_id, {sql_utf8_bytes('text')} AS bs FROM documents) "
        f"SELECT doc_id, CASE WHEN len(bs) < 8 THEN {whole} ELSE {win} END AS rfp "
        "FROM b"
    )


def q_hull_areas(num_zones: int = 200) -> str:
    a2 = ("(CASE WHEN shape IN (0, 1) THEN 2 * w * h "
          "ELSE 2 * w * h - (w - w2) * (h - h2) END)::BIGINT")
    return (f"WITH zones AS ({sql_zones_cte(num_zones)}) "
            f"SELECT zone_id, {a2}::DOUBLE / 2.0 / 100000000.0 AS hull_area "
            "FROM zones WHERE shape <> 3")


def q_relate_flags(num_zones: int = 200) -> str:
    """Closed-interval rect-part logic for intersects/within vs the
    fixed box (touching counts as intersecting, as in the engine's
    relate)."""
    B = (-600000, -850000, 800000, -550000)

    def hit(rx0, ry0, rx1, ry1):
        return (f"(({rx0}) <= {B[2]} AND ({rx1}) >= {B[0]} AND "
                f"({ry0}) <= {B[3]} AND ({ry1}) >= {B[1]})")

    inter = (f"(CASE WHEN shape IN (0, 1) THEN {hit('x0', 'y0', 'x0 + w', 'y0 + h')} "
             f"WHEN shape = 2 THEN {hit('x0', 'y0', 'x0 + w', 'y0 + h2')} OR "
             f"{hit('x0', 'y0 + h2', 'x0 + w2', 'y0 + h')} "
             f"ELSE {hit('x0', 'y0', 'x0 + w2', 'y0 + h2')} OR "
             f"{hit('x0 + w2 + 5000', 'y0 + h2 + 5000', 'x0 + w', 'y0 + h')} END)")
    within = (f"(x0 >= {B[0]} AND x0 + w <= {B[2]} AND "
              f"y0 >= {B[1]} AND y0 + h <= {B[3]})")
    return (f"WITH zones AS ({sql_zones_cte(num_zones)}) "
            f"SELECT zone_id, {inter} AS intersects, {within} AS within "
            "FROM zones")


def q_simplify_areas(num_zones: int = 200) -> str:
    area_u2 = ("(CASE WHEN shape IN (0, 1) THEN w * h "
               "WHEN shape = 2 THEN w * h2 + w2 * (h - h2) "
               "ELSE w2 * h2 + (w - w2 - 5000) * (h - h2 - 5000) END)")
    return (f"WITH zones AS ({sql_zones_cte(num_zones)}) "
            f"SELECT zone_id, {area_u2}::DOUBLE / 100000000.0 AS area "
            "FROM zones")


def q_events_props() -> str:
    return (
        "SELECT event_type, count(*)::BIGINT AS n, "
        "sum(regexp_extract(props, '\"k\":\\s*(-?\\d+)', 1)::BIGINT)::BIGINT AS sum_k "
        "FROM events GROUP BY event_type"
    )


def q_media_probe() -> str:
    """Twin of the actor-pool media probe with the deterministic fake
    codec: pseudo metadata = FNV arithmetic over the payload bytes
    (html is ASCII, so character ops == byte ops)."""
    h = sql_fnv1a("html")
    return (
        f"WITH {pages_cte()}, "
        f"probe AS (SELECT url, warc_ts, {h} AS h, length(html) AS nb FROM pages) "
        "SELECT url, warc_ts, "
        "(h % 1920 + 16)::BIGINT AS width, "
        "((h // 65536) % 1080 + 16)::BIGINT AS height, "
        "((h // 4294967296) % 240 + 1)::BIGINT AS n_frames, "
        "nb::BIGINT AS n_bytes FROM probe"
    )


def q_events_campaigns() -> str:
    from spapy_ray.pipelines.queries import (_CAMP_N, _CAMP_SLIDE_US,
                                             _CAMP_WIDTH_US, _E0_US)

    return (
        f"WITH camp AS (SELECT c AS campaign_id, "
        f"{_E0_US} + c * {_CAMP_SLIDE_US} AS lo, "
        f"{_E0_US} + c * {_CAMP_SLIDE_US} + {_CAMP_WIDTH_US} AS hi "
        f"FROM range({_CAMP_N}) t(c)), "
        "ev AS (SELECT epoch_us(ts) AS us, value FROM events) "
        "SELECT c.campaign_id, count(*)::BIGINT AS n_events, "
        "round(sum(e.value), 2) AS sum_value "
        "FROM ev e JOIN camp c ON c.lo <= e.us AND e.us < c.hi "
        "GROUP BY c.campaign_id"
    )


def q_events_asof() -> str:
    """DuckDB native ASOF JOIN as the independent twin of the
    groupby + merge_asof engine path."""
    return (
        "WITH p AS (SELECT event_id, ts, user_id FROM events "
        "WHERE event_type = 'purchase'), "
        "v AS (SELECT event_id, ts, user_id FROM events "
        "WHERE event_type = 'view') "
        "SELECT p.user_id, p.event_id AS purchase_event_id, "
        "COALESCE(v.event_id, -1)::BIGINT AS view_event_id "
        "FROM p ASOF LEFT JOIN v "
        "ON p.user_id = v.user_id AND v.ts <= p.ts"
    )


def q_text_invariant() -> str:
    """Join rows grouped by url with the text FNV computed from the
    INPUT pages spec — any byte change to text anywhere in the engine
    pipeline breaks the hash equality. int64 view of the uint64 FNV
    (engine .view(int64) == SQL wraparound subtraction)."""
    fnv = sql_fnv1a("g.text")
    i64 = (f"(CASE WHEN {fnv} >= 9223372036854775808::UBIGINT "
           f"THEN ({fnv}::HUGEINT - 18446744073709551616::HUGEINT)::BIGINT "
           f"ELSE {fnv}::BIGINT END)")
    return (
        f"WITH {geo_zones_cte()} "
        "SELECT g.url, "
        f"min({i64}) AS text_fnv, count(*)::BIGINT AS n_rows "
        "FROM geo g CROSS JOIN zones z "
        f"WHERE {sql_pip_condition('g.lon', 'g.lat')} "
        "GROUP BY g.url"
    )


def q_overlay_box_areas(num_zones: int = 200) -> str:
    """Clamped-overlap integer arithmetic per zone shape vs the fixed
    clip box — twin of the rectilinear overlay intersection."""
    B = (-600000, -850000, 800000, -550000)  # OVERLAY_BOX in 1e-4 units

    def ov(rx0, ry0, rx1, ry1):
        return (f"(greatest(0, least({rx1}, {B[2]}) - greatest({rx0}, {B[0]})) * "
                f"greatest(0, least({ry1}, {B[3]}) - greatest({ry0}, {B[1]})))")

    a = (f"(CASE WHEN shape IN (0, 1) THEN {ov('x0', 'y0', 'x0 + w', 'y0 + h')} "
         f"WHEN shape = 2 THEN {ov('x0', 'y0', 'x0 + w', 'y0 + h2')} + "
         f"{ov('x0', 'y0 + h2', 'x0 + w2', 'y0 + h')} "
         f"ELSE {ov('x0', 'y0', 'x0 + w2', 'y0 + h2')} + "
         f"{ov('x0 + w2 + 5000', 'y0 + h2 + 5000', 'x0 + w', 'y0 + h')} END)")
    return (f"WITH zones AS ({sql_zones_cte(num_zones)}) "
            f"SELECT zone_id, {a}::DOUBLE / 100000000.0 AS inter_area "
            f"FROM zones WHERE {a} > 0")


def q_overlay_holes_areas(num_zones: int = 200) -> str:
    """Clamped-overlap arithmetic for zones WITH a punched hole:
    outer decomposition overlap minus hole overlap (the hole lies in
    the first rectangle of every shape, so subtraction is exact)."""
    B = (-600000, -850000, 800000, -550000)

    def ov(rx0, ry0, rx1, ry1):
        return (f"(greatest(0, least({rx1}, {B[2]}) - greatest({rx0}, {B[0]})) * "
                f"greatest(0, least({ry1}, {B[3]}) - greatest({ry0}, {B[1]})))")

    outer = (f"(CASE WHEN shape IN (0, 1) THEN {ov('x0', 'y0', 'x0 + w', 'y0 + h')} "
             f"WHEN shape = 2 THEN {ov('x0', 'y0', 'x0 + w', 'y0 + h2')} + "
             f"{ov('x0', 'y0 + h2', 'x0 + w2', 'y0 + h')} "
             f"ELSE {ov('x0', 'y0', 'x0 + w2', 'y0 + h2')} + "
             f"{ov('x0 + w2 + 5000', 'y0 + h2 + 5000', 'x0 + w', 'y0 + h')} END)")
    hole = ov("x0 + 2*w//10", "y0 + 2*h2//10", "x0 + 4*w//10", "y0 + 6*h2//10")
    a = f"({outer} - {hole})"
    return (f"WITH zones AS ({sql_zones_cte(num_zones)}) "
            f"SELECT zone_id, {a}::DOUBLE / 100000000.0 AS inter_area "
            f"FROM zones WHERE {a} > 0")


def q_zone_centroids(num_zones: int = 200) -> str:
    """Closed-form area-weighted centroid per zone shape. Exact
    integer shoelace sums (a2 = 2*area, cx6 = 6*int(x dA)) over the
    rectangular decomposition, then the same float division tail as
    the engine: double(cx6) / double(3*a2) / 10000. BIGINT is enough:
    |cx6| < 4e17."""
    # widths of shape-3's second rectangle
    wb, hb = "(w - w2 - 5000)", "(h - h2 - 5000)"
    a2 = ("(CASE WHEN shape IN (0, 1) THEN 2 * w * h "
          "WHEN shape = 2 THEN 2 * (w * h2 + w2 * (h - h2)) "
          f"ELSE 2 * (w2 * h2 + {wb} * {hb}) END)::BIGINT")
    cx6 = ("(CASE WHEN shape IN (0, 1) THEN 3 * (2*x0 + w) * w * h "
           "WHEN shape = 2 THEN 3 * ((2*x0 + w) * w * h2 "
           "                       + (2*x0 + w2) * w2 * (h - h2)) "
           f"ELSE 3 * ((2*x0 + w2) * w2 * h2 "
           f"        + (2*x0 + w + w2 + 5000) * {wb} * {hb}) END)::BIGINT")
    cy6 = ("(CASE WHEN shape IN (0, 1) THEN 3 * (2*y0 + h) * w * h "
           "WHEN shape = 2 THEN 3 * ((2*y0 + h2) * w * h2 "
           "                       + (2*y0 + h2 + h) * w2 * (h - h2)) "
           f"ELSE 3 * ((2*y0 + h2) * w2 * h2 "
           f"        + (2*y0 + h + h2 + 5000) * {wb} * {hb}) END)::BIGINT")
    return (
        f"WITH zones AS ({sql_zones_cte(num_zones)}), "
        f"sums AS (SELECT zone_id, {a2} AS a2, {cx6} AS cx6, {cy6} AS cy6 FROM zones) "
        "SELECT zone_id, "
        "cx6::DOUBLE / (3 * a2)::DOUBLE / 10000.0 AS cx, "
        "cy6::DOUBLE / (3 * a2)::DOUBLE / 10000.0 AS cy "
        "FROM sums"
    )


def q_revenue_by_nation() -> str:
    return (
        "SELECT n.n_name, "
        "round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue, "
        "count(*)::BIGINT AS n_items "
        "FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey "
        "JOIN nation n ON s.s_nationkey = n.n_nationkey "
        "GROUP BY n.n_name"
    )


def q_densify_counts(num_zones: int = 200, max_seg: float = 0.07) -> str:
    """Twin of queries.q_densify_counts: per-edge subdivision count
    mirrors the engine's float ops in the SAME order — each endpoint
    divided by U first, difference, then ceil(length / max_seg)."""
    def e(a: str, b: str) -> str:
        return (f"ceil(((({b})::DOUBLE / 10000.0) - "
                f"(({a})::DOUBLE / 10000.0)) / {max_seg!r})::BIGINT")

    def rect_v(xa: str, xb: str, ya: str, yb: str) -> str:
        return f"(2 * {e(xa, xb)} + 2 * {e(ya, yb)} + 1)"

    l_v = (f"({e('x0', 'x0 + w')} + {e('y0', 'y0 + h2')} + "
           f"{e('x0 + w2', 'x0 + w')} + {e('y0 + h2', 'y0 + h')} + "
           f"{e('x0', 'x0 + w2')} + {e('y0', 'y0 + h')} + 1)")
    two_v = (f"({rect_v('x0', 'x0 + w2', 'y0', 'y0 + h2')} + "
             f"{rect_v('x0 + w2 + 5000', 'x0 + w', 'y0 + h2 + 5000', 'y0 + h')})")
    return (
        f"WITH zones AS ({sql_zones_cte(num_zones)}) "
        "SELECT zone_id, "
        "(CASE WHEN shape = 3 THEN 2 ELSE 1 END)::BIGINT AS n_rings, "
        f"(CASE WHEN shape IN (0, 1) THEN {rect_v('x0', 'x0 + w', 'y0', 'y0 + h')} "
        f"WHEN shape = 2 THEN {l_v} ELSE {two_v} END)::BIGINT AS n_vertices "
        "FROM zones"
    )


def q_clip_zones(num_zones: int = 200,
                 box: tuple = (-600_000, -400_000, 600_000, 400_000)) -> str:
    """Twin of queries.q_clip_zones: exact integer overlap of the
    rectilinear zone parts with the clip box (1e-4-unit fixed point;
    products are 1e-8 deg² units). Features whose clip is empty are
    dropped, matching clip_to's keep-hits-only contract."""
    bx0, by0, bx1, by1 = box

    def ov(a: str, b: str, lo: int, hi: int) -> str:
        return f"GREATEST(0, LEAST({b}, {hi}) - GREATEST({a}, {lo}))"

    def rect(xa: str, xb: str, ya: str, yb: str) -> str:
        return (f"({ov(xa, xb, bx0, bx1)} * {ov(ya, yb, by0, by1)})")

    area = (f"(CASE WHEN shape IN (0, 1) THEN {rect('x0', 'x0 + w', 'y0', 'y0 + h')} "
            f"WHEN shape = 2 THEN {rect('x0', 'x0 + w', 'y0', 'y0 + h2')} "
            f"+ {rect('x0', 'x0 + w2', 'y0 + h2', 'y0 + h')} "
            f"ELSE {rect('x0', 'x0 + w2', 'y0', 'y0 + h2')} "
            f"+ {rect('x0 + w2 + 5000', 'x0 + w', 'y0 + h2 + 5000', 'y0 + h')} END)")
    return (
        f"WITH zones AS ({sql_zones_cte(num_zones)}), "
        f"clipped AS (SELECT zone_id, {area}::BIGINT AS area_em8 FROM zones) "
        "SELECT zone_id, area_em8 FROM clipped WHERE area_em8 > 0"
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


def q_dataset_bounds() -> str:
    """Twin of queries.q_dataset_bounds: min/max fold over the
    geocoded coordinates (no arithmetic beyond the geocode CTE —
    min/max of doubles is exact)."""
    return (f"WITH {geo_cte()} "
            "SELECT min(lon) AS minx, min(lat) AS miny, "
            "max(lon) AS maxx, max(lat) AS maxy FROM geo")


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


def q_docs_quality() -> str:
    """Twin of queries.q_docs_quality: RE2 character-class counts
    (DuckDB regexp_replace) and the same int/int double division."""
    punct = r"[!-/:-@\[-`{-~]"
    return (
        "SELECT doc_id, length(text)::BIGINT AS n_chars, "
        f"(length(text) - length(regexp_replace(text, '{punct}', '', 'g')))::BIGINT AS n_punct, "
        "(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::BIGINT AS n_digits, "
        f"((length(text) - length(regexp_replace(text, '{punct}', '', 'g')))::DOUBLE "
        "/ GREATEST(length(text), 1)::DOUBLE) AS punct_ratio "
        "FROM documents"
    )


def q_quality_filter() -> str:
    """Twin of queries.q_quality_filter: same RE2 class counts as
    q_docs_quality, median length via quantile_disc (an exact
    element, so the >= compare has no rounding slack), punct cap."""
    punct = r"[!-/:-@\[-`{-~]"
    ratio = (f"((length(text) - length(regexp_replace(text, '{punct}', "
             "'', 'g')))::DOUBLE / GREATEST(length(text), 1)::DOUBLE)")
    return (
        f"WITH q AS (SELECT doc_id, length(text)::BIGINT AS n_chars, "
        f"{ratio} AS punct_ratio FROM documents), "
        "t AS (SELECT quantile_disc(n_chars, 0.5) AS thr FROM q) "
        "SELECT doc_id, n_chars, punct_ratio FROM q, t "
        "WHERE n_chars >= thr AND punct_ratio <= 0.2"
    )


def q_semi_pages(anti: bool = False) -> str:
    """Twin of stages.relate.point_semi_join: keep pages whose
    geocoded point lies in ANY zone (semi) / NO zone (anti)."""
    ex = "NOT EXISTS" if anti else "EXISTS"
    return (f"WITH {geo_zones_cte()} "
            "SELECT g.url, g.warc_ts, g.lang FROM geo g "
            f"WHERE {ex} (SELECT 1 FROM zones z WHERE "
            f"{sql_pip_condition('g.lon', 'g.lat')})")


def _tile_stats_select(val: str, src: str) -> str:
    return (f"SELECT (px // 64)::BIGINT AS tx, (py // 64)::BIGINT AS ty, "
            f"sum({val})::BIGINT AS sum_v, min({val})::BIGINT AS min_v, "
            f"max({val})::BIGINT AS max_v, count(*)::BIGINT AS n_px "
            f"FROM {src} GROUP BY 1, 2")


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


def q_events_quantiles() -> str:
    """Twin of stages.quantiles.grouped_quantile (quantile_disc
    semantics: exact element at 1-based rank max(1, ceil(q*n)))."""
    parts = [
        (f"SELECT event_type, {q} AS q, "
         f"quantile_disc(value, {q}) AS value "
         "FROM events GROUP BY event_type")
        for q in (0.25, 0.5, 0.9)]
    return " UNION ALL ".join(parts)


def q_events_distinct_users() -> str:
    return ("SELECT event_type, count(DISTINCT user_id)::BIGINT "
            "AS n_users FROM events GROUP BY event_type")


def q_zone_top_pages(k: int = 3) -> str:
    """(url, warc_ts) is unique per page, so the (warc_ts DESC, url)
    order is total and row_number is deterministic."""
    return (
        f"WITH {join_cte()} "
        "SELECT zone_id, url, warc_ts, "
        "row_number() OVER (PARTITION BY zone_id "
        "ORDER BY warc_ts DESC, url)::BIGINT AS rank "
        f"FROM joined QUALIFY rank <= {k}")


def q_sample_pages() -> str:
    return (f"WITH {pages_cte()} "
            "SELECT url, warc_ts, lang FROM pages "
            f"WHERE ({sql_fnv1a('url')} % 10) < 3")


def q_docs_bigrams(top: int = 50) -> str:
    """Twin of stages.text.ngram_counts(n=2): 1-based list indexing,
    range() excludes the end, so docs with < 2 tokens emit nothing —
    matching the engine's doc-boundary mask."""
    return (
        "WITH g AS (SELECT unnest(list_transform(range(1, len(toks)), "
        "j -> toks[j] || ' ' || toks[j + 1])) AS gram "
        "FROM (SELECT string_split(text, ' ') AS toks FROM documents)) "
        "SELECT gram, count(*)::BIGINT AS n FROM g GROUP BY gram "
        f"ORDER BY n DESC, gram LIMIT {top}")


def q_overlay_grid(num_zones: int = 200) -> str:
    """Zones x 12-box grid intersection areas by clamped-overlap
    integer arithmetic over each shape's rectangle decomposition —
    twin of the broadcast pairwise overlay (queries.q_overlay_grid)."""
    def ov(rx0, ry0, rx1, ry1):
        return (f"(greatest(0, least({rx1}, bx1) - greatest({rx0}, bx0)) * "
                f"greatest(0, least({ry1}, by1) - greatest({ry0}, by0)))")

    a = (f"(CASE WHEN shape IN (0, 1) THEN {ov('x0', 'y0', 'x0 + w', 'y0 + h')} "
         f"WHEN shape = 2 THEN {ov('x0', 'y0', 'x0 + w', 'y0 + h2')} + "
         f"{ov('x0', 'y0 + h2', 'x0 + w2', 'y0 + h')} "
         f"ELSE {ov('x0', 'y0', 'x0 + w2', 'y0 + h2')} + "
         f"{ov('x0 + w2 + 5000', 'y0 + h2 + 5000', 'x0 + w', 'y0 + h')} END)")
    return (
        f"WITH zones AS ({sql_zones_cte(num_zones)}), "
        "boxes AS (SELECT b AS box_id, "
        "(-1800000 + (b % 6) * 600000) AS bx0, "
        "(-850000 + (b // 6) * 850000) AS by0, "
        "(-1800000 + (b % 6) * 600000 + 600000) AS bx1, "
        "(-850000 + (b // 6) * 850000 + 850000) AS by1 "
        "FROM range(12) t(b)) "
        f"SELECT zone_id, box_id, {a}::DOUBLE / 100000000.0 AS inter_area "
        f"FROM zones CROSS JOIN boxes WHERE {a} > 0")


def q_dist_join_counts(radius_deg: float = 2.0) -> str:
    """Twin of stages.distjoin.within_distance_count: per-point count
    of OTHER points within r, exact int64 fixed-point predicate
    dx5^2 + dy5^2 <= r5^2 (coords are exact multiples of 1e-5, so
    round() recovers the integers). The lat5 band predicate is
    redundant with the circle (|dlat5| <= r5) — it only steers DuckDB
    into an IEJoin instead of a full cross product. count(*) - 1
    drops the self-match, mirroring the engine's own-candidate-copy
    subtraction."""
    r5 = int(round(radius_deg * 1e5))
    return (
        f"WITH {geo_cte()}, "
        "pts AS (SELECT url, warc_ts, "
        "CAST(round(lat * 100000.0) AS BIGINT) AS lat5, "
        "CAST(round(lon * 100000.0) AS BIGINT) AS lon5 FROM geo) "
        "SELECT a.url, a.warc_ts, (count(*) - 1)::BIGINT AS n_neighbors "
        "FROM pts a JOIN pts b "
        f"ON b.lat5 BETWEEN a.lat5 - {r5} AND a.lat5 + {r5} "
        "AND (a.lat5 - b.lat5) * (a.lat5 - b.lat5) "
        f"+ (a.lon5 - b.lon5) * (a.lon5 - b.lon5) <= {r5 * r5} "
        "GROUP BY a.url, a.warc_ts")


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


def q_tile_pyramid(res_hi: int = 7, res_lo: int = 3) -> str:
    """Twin of stages.cellindex.tile_pyramid: each level computed
    INDEPENDENTLY from the raw points (no roll-up), so a hash match
    certifies parent-truncation == direct coarse encode."""
    levels = " UNION ALL ".join(
        f"SELECT {r}::BIGINT AS res, "
        f"{sql_cell_expr('lon', 'lat', r)}::BIGINT AS tile, "
        "count(*)::BIGINT AS n_pages FROM geo GROUP BY 2"
        for r in range(res_lo, res_hi + 1))
    return f"WITH {geo_cte()} {levels}"


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


def q_sample_stratified() -> str:
    """Twin of stages.relational.hash_sample_stratified with the
    query's per-language rate table (pt falls to the default)."""
    num = ("CASE lang WHEN 'fr' THEN 3 ELSE 1 END")
    den = ("CASE lang WHEN 'en' THEN 2 WHEN 'es' THEN 4 "
           "WHEN 'de' THEN 8 ELSE 16 END")
    return (f"WITH {pages_cte()} "
            "SELECT url, warc_ts, lang FROM pages "
            f"WHERE ({sql_fnv1a('url')} % {den}) < {num}")


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


def q_domain_stats() -> str:
    """Twin of q_domain_stats: same RE2 pattern, group 2 = host.

    NOTE the partial/fold decomposition is exact (not approximate):
    url → host is functional, so distinct (host, url) pairs with
    summed multiplicities reproduce count(*) and count(distinct url)
    per host."""
    from spapy_ray.stages.text import URL_PATTERN
    import re

    anon = re.sub(r"\?P<[a-z]+>", "", URL_PATTERN)
    return (f"WITH {pages_cte()}, "
            f"hosts AS (SELECT url, regexp_extract(url, '{anon}', 2) "
            "AS host FROM pages) "
            "SELECT host, count(*)::BIGINT AS n_pages, "
            "count(DISTINCT url)::BIGINT AS n_urls "
            "FROM hosts GROUP BY host")


def q_bpe_tokens() -> str:
    """Twin of stages.text.bpe_token_count_batch — both engines run
    RE2, so non-overlapping match counts agree exactly."""
    from spapy_ray.stages.text import BPE_PATTERN

    pat = BPE_PATTERN.replace("'", "''")
    return (f"WITH {pages_cte()} "
            "SELECT url, warc_ts, "
            f"len(regexp_extract_all(text, '{pat}'))::BIGINT AS n_bpe "
            "FROM pages")


def q_docs_repetition() -> str:
    """Twin of stages.text.repetition_stats_batch. Both sides split on
    single spaces (split_pattern == string_split, '' → ['']) and the
    final fractions are one IEEE double division each."""
    return (
        "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts "
        "FROM documents), "
        "tok AS (SELECT doc_id, unnest(ts) AS tok, len(ts) AS n "
        "FROM toks), "
        "cnt AS (SELECT doc_id, tok, max(n) AS n, count(*) AS c "
        "FROM tok GROUP BY doc_id, tok) "
        "SELECT doc_id, max(c)::DOUBLE / max(n) AS top_tok_frac, "
        "count(*)::DOUBLE / max(n) AS distinct_ratio "
        "FROM cnt GROUP BY doc_id")


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


def q_orders_lineitem_join() -> str:
    return ("SELECT l_orderkey, l_linenumber, l_extendedprice, "
            "o_orderpriority FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey")


def q_customers_without_orders() -> str:
    return ("SELECT c_custkey, c_name FROM customer "
            "WHERE NOT EXISTS (SELECT 1 FROM orders "
            "WHERE o_custkey = c_custkey AND o_orderstatus = 'F')")


def q_events_windows() -> str:
    return (
        "SELECT user_id, event_id, "
        "row_number() OVER w AS rn, "
        "coalesce(epoch_us(ts) - lag(epoch_us(ts)) OVER w, 0) AS delta_us, "
        "max(value) OVER (PARTITION BY user_id "
        "ORDER BY epoch_us(ts), event_id "
        "ROWS UNBOUNDED PRECEDING) AS run_max_value "
        "FROM events "
        "WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)"
    )


def q_order_priority_revenue() -> str:
    return (
        "SELECT o_orderpriority, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, "
        "count(*)::BIGINT AS n_items "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "GROUP BY o_orderpriority"
    )


def q_customer_order_balance() -> str:
    return (
        "WITH f AS (SELECT o_custkey, count(*)::BIGINT AS n_f FROM orders "
        "WHERE o_orderstatus = 'F' GROUP BY o_custkey), "
        "p AS (SELECT o_custkey, count(*)::BIGINT AS n_p FROM orders "
        "WHERE o_orderstatus = 'P' GROUP BY o_custkey) "
        "SELECT coalesce(f.o_custkey, p.o_custkey) AS custkey, "
        "coalesce(n_f, 0)::BIGINT AS n_f, "
        "coalesce(n_p, 0)::BIGINT AS n_p "
        "FROM f FULL OUTER JOIN p ON f.o_custkey = p.o_custkey"
    )


def q_hh_domains() -> str:
    """Twin of queries.q_hh_domains: in the no-truncation regime the
    Misra-Gries estimates ARE the exact per-host counts."""
    import re

    from spapy_ray.stages.text import URL_PATTERN

    anon = re.sub(r"\?P<[a-z]+>", "", URL_PATTERN)
    return (f"WITH {pages_cte()} "
            f"SELECT regexp_extract(url, '{anon}', 2) AS host, "
            "count(*)::BIGINT AS est_count FROM pages GROUP BY host")


def q_label_centroids(scale: int = 1_000_000) -> str:
    """Twin of ann.vector_group_mean: floor(x*scale + 0.5) fixed-point
    quantization on both sides makes the partial sums exact integers,
    so the final double division matches bit-for-bit. (This DuckDB
    lacks UNNEST ... WITH ORDINALITY; generate_subscripts pairs each
    unnested element with its position instead.)"""
    return (
        "WITH e AS (SELECT label, "
        "(generate_subscripts(embedding, 1) - 1)::BIGINT AS dim_idx, "
        f"CAST(floor(unnest(embedding)::DOUBLE * {scale} + 0.5) "
        "AS BIGINT) AS q "
        "FROM embeddings) "
        "SELECT label, dim_idx, "
        f"sum(q)::DOUBLE / (count(*)::DOUBLE * {scale}.0) AS mean_val "
        "FROM e GROUP BY label, dim_idx"
    )


def q_cross_corpus_knn(k: int = 3) -> str:
    sim = ("list_cosine_similarity("
           "list_transform(q.embedding, x -> x::DOUBLE), "
           "list_transform(e.embedding, x -> x::DOUBLE))")
    return (
        "SELECT q.vec_id AS qid, e.vec_id AS vec_id, "
        f"row_number() OVER (PARTITION BY q.vec_id ORDER BY {sim} DESC, "
        "e.vec_id)::BIGINT AS rank "
        "FROM embeddings q CROSS JOIN embeddings e "
        f"WHERE q.label < 5 AND e.label >= 5 QUALIFY rank <= {k}"
    )


def q_contamination_pairs(threshold: float = 0.8) -> str:
    """Exact all-pairs cross-corpus 3-shingle Jaccard (even doc_ids x
    odd doc_ids) — ground truth for the contamination LSH pipeline
    (same shingle arithmetic as q_near_dup_docs)."""
    return (
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
        "s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1), "
        "j -> toks[j] || ' ' || toks[j + 1] || ' ' || toks[j + 2])) AS sh FROM t), "
        "p AS (SELECT a.doc_id AS key_left, b.doc_id AS key_right, "
        "len(list_intersect(a.sh, b.sh))::DOUBLE / "
        "len(list_distinct(list_concat(a.sh, b.sh))) AS jacc "
        "FROM s a JOIN s b ON a.doc_id % 2 = 0 AND b.doc_id % 2 = 1) "
        f"SELECT key_left, key_right, jacc FROM p WHERE jacc >= {threshold}"
    )


def q_price_quantile_sketch() -> str:
    """Twin of quantiles.quantile_sketch in the no-compaction regime:
    quantile_disc at each q (same max(1, ceil(q*n)) rank rule the
    exact grouped path verified numerically)."""
    qs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    return " UNION ALL ".join(
        f"SELECT {q}::DOUBLE AS q, "
        f"quantile_disc(l_extendedprice, {q})::DOUBLE AS value "
        "FROM lineitem" for q in qs)


def q_docs_pii_scrub() -> str:
    """Twin of text.pii_scrub — identical RE2 patterns applied in the
    same order through regexp_replace(..., 'g')."""
    from spapy_ray.stages.text import PII_PATTERNS

    expr = "text"
    for tag, pat in PII_PATTERNS:
        # DuckDB single-quoted strings are literal (no backslash
        # processing) — only quotes need doubling
        p = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{tag}', 'g')"
    return f"SELECT doc_id, {expr} AS text FROM documents"


def q_dist_join_pairs(radius_deg: float = 0.05) -> str:
    """Twin of queries.q_dist_join_pairs — IEJoin band + exact int64
    circle predicate, one row per unordered url pair (url_a < url_b;
    duplicate-url row pairs drop on both sides identically)."""
    r5 = int(round(radius_deg * 1e5))
    return (
        f"WITH {geo_cte()}, "
        "pts AS (SELECT url, "
        "CAST(round(lat * 100000.0) AS BIGINT) AS lat5, "
        "CAST(round(lon * 100000.0) AS BIGINT) AS lon5 FROM geo) "
        "SELECT a.url AS key_a, b.url AS key_b, "
        "((a.lat5 - b.lat5) * (a.lat5 - b.lat5) "
        "+ (a.lon5 - b.lon5) * (a.lon5 - b.lon5))::BIGINT AS dist5sq "
        "FROM pts a JOIN pts b "
        f"ON b.lat5 BETWEEN a.lat5 - {r5} AND a.lat5 + {r5} "
        "AND a.url < b.url "
        "AND (a.lat5 - b.lat5) * (a.lat5 - b.lat5) "
        f"+ (a.lon5 - b.lon5) * (a.lon5 - b.lon5) <= {r5 * r5}"
    )


def q_events_rolling(width: int = 5) -> str:
    return (
        "SELECT user_id, event_id, "
        "sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) OVER "
        "(PARTITION BY user_id ORDER BY epoch_us(ts), event_id "
        f"ROWS BETWEEN {width - 1} PRECEDING AND CURRENT ROW)::BIGINT "
        f"AS roll{width}_cents FROM events"
    )


def q_domain_caps(k: int = 5) -> str:
    """Twin of queries.q_domain_caps: row_number over the identical
    (fnv1a(url) ASC, url ASC) order per host."""
    import re

    from spapy_ray.kernels.hashing import sql_fnv1a
    from spapy_ray.stages.text import URL_PATTERN

    anon = re.sub(r"\?P<[a-z]+>", "", URL_PATTERN)
    return (f"WITH {pages_cte()}, "
            f"h2 AS (SELECT regexp_extract(url, '{anon}', 2) AS host, "
            f"url, {sql_fnv1a('url')} AS hv FROM pages) "
            "SELECT host, url, row_number() OVER "
            "(PARTITION BY host ORDER BY hv, url)::BIGINT AS rank "
            f"FROM h2 QUALIFY rank <= {k}"
    )


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


def q_jaccard_pairs() -> str:
    """Exact 3-shingle Jaccard for adjacent doc_id pairs (the
    explicit-candidate form of the near-dup kernel). Same shingle
    algebra as q_near_dup_docs; the last doc's pair drops via the
    doc_id + 1 self-join, mirroring the engine's inner co-partition."""
    return (
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
        "s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1), "
        "j -> toks[j] || ' ' || toks[j + 1] || ' ' || toks[j + 2])) AS sh FROM t) "
        "SELECT a.doc_id AS key_a, b.doc_id AS key_b, "
        "len(list_intersect(a.sh, b.sh))::DOUBLE / "
        "len(list_distinct(list_concat(a.sh, b.sh))) AS jacc "
        "FROM s a JOIN s b ON b.doc_id = a.doc_id + 1"
    )


def q_embed_near_dup(threshold: float = 0.45) -> str:
    """All-pairs exact cosine >= threshold, cos quantized to 1e-6
    micro-units (both engine and oracle compute in float64; the
    fixture's nearest cosines are 2e-3 from the threshold)."""
    sim = ("list_cosine_similarity("
           "list_transform(a.embedding, x -> x::DOUBLE), "
           "list_transform(b.embedding, x -> x::DOUBLE))")
    return (
        f"SELECT a.vec_id AS key_a, b.vec_id AS key_b, "
        f"floor({sim} * 1e6)::BIGINT AS cos_u "
        f"FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
        f"WHERE {sim} >= {threshold}"
    )


def q_embed_near_dup_lsh() -> str:
    """Ground truth for the LSH near-dup query: the corpus is
    embeddings ∪ (vec_id + 100000 copy), so the only >= 0.99 pairs
    are the 1:1 identity pairs (max non-identical fixture cosine is
    0.51)."""
    return ("SELECT vec_id AS key_a, vec_id + 100000 AS key_b "
            "FROM embeddings")


def q_voronoi_sites() -> str:
    """Twin of stages.voronoi.site_assignment_stats on the 8x8 world
    lattice: nearest site by exact int64 fixed-point d2, ties to the
    lowest site id, per-site count + floor-scaled d2 sum."""
    return (
        f"WITH {geo_cte()}, "
        "pts AS (SELECT url, warc_ts, "
        "CAST(round(lat*100000.0) AS BIGINT) AS lat5, "
        "CAST(round(lon*100000.0) AS BIGINT) AS lon5 FROM geo), "
        "sites AS (SELECT s.range AS site_id, "
        "((s.range // 8) * 2125000 + 1062500 - 8500000)::BIGINT AS slat5, "
        "((s.range % 8) * 4500000 + 2250000 - 18000000)::BIGINT AS slon5 "
        "FROM range(64) s), "
        "d AS (SELECT p.url, p.warc_ts, s.site_id, "
        "(p.lat5 - s.slat5)*(p.lat5 - s.slat5) + "
        "(p.lon5 - s.slon5)*(p.lon5 - s.slon5) AS d2, "
        "row_number() OVER (PARTITION BY p.url, p.warc_ts "
        "ORDER BY (p.lat5 - s.slat5)*(p.lat5 - s.slat5) + "
        "(p.lon5 - s.slon5)*(p.lon5 - s.slon5), s.site_id) AS rn "
        "FROM pts p CROSS JOIN sites s) "
        "SELECT site_id, count(*)::BIGINT AS n_points, "
        "sum(d2 // 10000)::BIGINT AS sum_d2q "
        "FROM d WHERE rn = 1 GROUP BY site_id"
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


def q_ngram_overlap(n: int = 8) -> str:
    """Twin of stages.neardup.ngram_overlap_dups: distinct word
    n-grams per doc (same FNV-1a hash as the engine, so even a
    collision cannot diverge), each gram's min owner, per-doc fold
    over grams first seen in an earlier doc."""
    # NB: the position variable must not be named i/b/c/h — sql_fnv1a's
    # inner lambda variables would shadow it inside the gram expression
    gram = sql_fnv1a(f"array_to_string(w[gi:gi+{n - 1}], ' ')")
    return (
        "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w "
        "FROM documents), "
        f"grams AS (SELECT DISTINCT doc_id, {gram} AS h "
        f"FROM toks, unnest(generate_series(1, len(w) - {n - 1})) t(gi)), "
        "own AS (SELECT h, min(doc_id) AS own FROM grams GROUP BY h) "
        "SELECT g.doc_id, count(*)::BIGINT AS n_dup_grams, "
        "min(o.own) AS first_owner "
        "FROM grams g JOIN own o USING (h) WHERE g.doc_id > o.own "
        "GROUP BY g.doc_id"
    )


def q_tfidf_terms(k: int = 10, idf_scale: int = 1000) -> str:
    """Twin of stages.text.tfidf_top_terms over documents grouped by
    lang: integer-quantized idf ((N*scale)//df) so the score is exact
    int64 on both sides."""
    return (
        "WITH w AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) "
        "AS term FROM documents), "
        "tf AS (SELECT lang, term, count(*)::BIGINT AS tf "
        "FROM w GROUP BY 1, 2), "
        "df AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df "
        "FROM w GROUP BY 1), "
        "sc AS (SELECT lang, term, tf, df, "
        f"tf * (((SELECT count(*) FROM documents) * {idf_scale}) // df) "
        "AS score FROM tf JOIN df USING (term)), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY lang "
        "ORDER BY score DESC, term)::BIGINT AS rank FROM sc) "
        f"SELECT lang, term, tf, df, score, rank FROM r WHERE rank <= {k}"
    )


def q_graph_pagerank(iterations: int = 4, r0: int = 1_000_000,
                     num: int = 85, den: int = 100) -> str:
    """Twin of stages.graph.pagerank on the customer–supplier graph:
    one chained CTE per iteration, identical int64 floor arithmetic."""
    base = r0 * (den - num) // den
    ctes = [
        "pairs AS (SELECT DISTINCT o_custkey * 2 AS a, "
        "l_suppkey * 2 + 1 AS b "
        "FROM orders JOIN lineitem ON l_orderkey = o_orderkey)",
        "und AS (SELECT a AS src, b AS dst FROM pairs "
        "UNION ALL SELECT b, a FROM pairs)",
        "deg AS (SELECT src, count(*)::BIGINT AS deg "
        "FROM und GROUP BY 1)",
        f"r0 AS (SELECT src AS node, {r0}::BIGINT AS r FROM deg)",
    ]
    for t in range(1, iterations + 1):
        ctes.append(
            f"r{t} AS (SELECT u.dst AS node, "
            f"({base} + ({num} * sum(r.r // d.deg)) // {den})::BIGINT "
            f"AS r FROM und u JOIN r{t - 1} r ON r.node = u.src "
            "JOIN deg d ON d.src = u.src GROUP BY u.dst)")
    return (
        "WITH " + ", ".join(ctes) + " "
        "SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' "
        "END AS kind, node // 2 AS key, r AS pr "
        f"FROM r{iterations}"
    )


def _sql_d8_walk() -> str:
    """Shared CTE prefix for the hydrology twins: the same D8 code
    chain as q_flow_direction, the pointer table, and the recursive
    walk down the pointer forest (terminates because every D8 step
    strictly decreases elevation)."""
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
    nxt = "CASE code " + " ".join(
        f"WHEN {k + 1} THEN node + {dy * 512 + dx}"
        for k, (dy, dx, _) in enumerate(D8_OFFSETS)) + " ELSE node END"
    return (
        "WITH RECURSIVE "
        "px AS (SELECT p % 512 AS px, p // 512 AS py "
        "FROM range(262144) t(p)), "
        f"wd AS (SELECT px, py, {wd_cols} FROM px), "
        f"code AS (SELECT px, py, py * 512 + px AS node, {case} "
        "AS code FROM wd), "
        f"ptr AS (SELECT node, {nxt} AS nxt FROM code), "
        "walk AS (SELECT node, nxt AS cur FROM ptr "
        "UNION ALL SELECT w.node, p.nxt FROM walk w "
        "JOIN ptr p ON p.node = w.cur WHERE p.nxt <> w.cur)"
    )


def q_watershed() -> str:
    """Twin of stages.raster.watershed_stats: walk every cell to its
    pit, group by pit."""
    return (
        f"{_sql_d8_walk()}, "
        "done AS (SELECT w.node, w.cur AS pit FROM walk w "
        "JOIN ptr p ON p.node = w.cur WHERE p.nxt = w.cur) "
        "SELECT (pit % 512)::BIGINT AS px, (pit // 512)::BIGINT AS py, "
        "count(*)::BIGINT AS n_cells FROM done GROUP BY 1, 2"
    )


def q_flow_accumulation() -> str:
    """Twin of stages.raster.flow_accumulation_stats: acc(v) = 1 +
    number of walk visits to v from OTHER cells (a pit's initial
    self row is excluded — pits are not walkers in the engine),
    folded per tile."""
    return (
        f"{_sql_d8_walk()}, "
        "acc AS (SELECT cur AS node, count(*)::BIGINT AS c FROM walk "
        "WHERE node <> cur GROUP BY cur), "
        "cell AS (SELECT p.node, 1 + coalesce(a.c, 0) AS acc "
        "FROM ptr p LEFT JOIN acc a ON a.node = p.node) "
        "SELECT ((node % 512) // 64)::BIGINT AS tx, "
        "((node // 512) // 64)::BIGINT AS ty, "
        "count(*)::BIGINT AS n_cells, sum(acc)::BIGINT AS acc_sum, "
        "max(acc)::BIGINT AS acc_max FROM cell GROUP BY 1, 2"
    )


def q_dissolve_area() -> str:
    """Twin of stages.overlay.dissolve_union_area on zones grouped by
    labelrank: decompose each zone shape into its covering boxes,
    then the same x-slab sweep as the engine expressed with window
    functions (exclusive running max of y1 per slab)."""
    return (
        f"WITH z AS ({sql_zones_cte()}), "
        "boxes AS ("
        "SELECT labelrank AS k, x0, y0, x0 + w AS x1, y0 + h AS y1 "
        "FROM z WHERE shape IN (0, 1) "
        "UNION ALL SELECT labelrank, x0, y0, x0 + w, y0 + h2 "
        "FROM z WHERE shape = 2 "
        "UNION ALL SELECT labelrank, x0, y0 + h2, x0 + w2, y0 + h "
        "FROM z WHERE shape = 2 "
        "UNION ALL SELECT labelrank, x0, y0, x0 + w2, y0 + h2 "
        "FROM z WHERE shape = 3 "
        "UNION ALL SELECT labelrank, x0 + w2 + 5000, y0 + h2 + 5000, "
        "x0 + w, y0 + h FROM z WHERE shape = 3), "
        "xs AS (SELECT DISTINCT k, x FROM "
        "(SELECT k, x0 AS x FROM boxes "
        "UNION SELECT k, x1 FROM boxes) t), "
        "slabs AS (SELECT k, x AS xa, "
        "lead(x) OVER (PARTITION BY k ORDER BY x) AS xb FROM xs), "
        "sb AS (SELECT s.k, s.xa, s.xb, b.y0, b.y1 FROM slabs s "
        "JOIN boxes b ON b.k = s.k AND b.x0 <= s.xa AND b.x1 >= s.xb "
        "WHERE s.xb IS NOT NULL), "
        "iv AS (SELECT k, xa, xb, y0, y1, max(y1) OVER "
        "(PARTITION BY k, xa ORDER BY y0, y1 "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm "
        "FROM sb), "
        "contrib AS (SELECT k, xa, xb, "
        "greatest(0, y1 - greatest(y0, coalesce(pm, y0))) AS c "
        "FROM iv), "
        "area AS (SELECT k, sum(c * (xb - xa))::BIGINT AS area_u "
        "FROM contrib GROUP BY k), "
        "zc AS (SELECT labelrank AS k, count(*)::BIGINT AS n_feats "
        "FROM z GROUP BY 1) "
        "SELECT zc.k AS labelrank, zc.n_feats, area.area_u "
        "FROM zc JOIN area ON area.k = zc.k"
    )


def q_events_funnel(steps: tuple = ("view", "click", "purchase")) \
        -> str:
    """Twin of stages.sessions.funnel_counts: chained per-user
    first-occurrence CTEs with strict-after joins."""
    ctes = [f"u1 AS (SELECT user_id, min(ts) AS t1 FROM events "
            f"WHERE event_type = '{steps[0]}' GROUP BY 1)"]
    for k in range(2, len(steps) + 1):
        ctes.append(
            f"u{k} AS (SELECT e.user_id, min(e.ts) AS t{k} "
            f"FROM events e JOIN u{k - 1} p ON p.user_id = e.user_id "
            f"WHERE e.event_type = '{steps[k - 1]}' "
            f"AND e.ts > p.t{k - 1} GROUP BY 1)")
    selects = [
        f"SELECT 1::BIGINT AS stage, '{steps[0]}' AS step, "
        "count(*)::BIGINT AS n_users, 0::BIGINT AS lag_us FROM u1"]
    for k in range(2, len(steps) + 1):
        selects.append(
            f"SELECT {k}::BIGINT, '{steps[k - 1]}', count(*)::BIGINT, "
            f"coalesce(sum(epoch_us(u{k}.t{k}) - epoch_us(u1.t1)), 0)"
            f"::BIGINT FROM u{k} JOIN u1 USING (user_id)")
    return ("WITH " + ", ".join(ctes) + " "
            + " UNION ALL ".join(selects))


def q_events_retention(period_us: int = 86_400_000_000) -> str:
    """Twin of stages.sessions.retention_cohorts."""
    return (
        "WITH d AS (SELECT DISTINCT user_id, "
        f"epoch_us(ts) // {period_us} AS day FROM events), "
        "c AS (SELECT user_id, min(day) AS cohort FROM d GROUP BY 1) "
        "SELECT c.cohort::BIGINT AS cohort_period, "
        "(d.day - c.cohort)::BIGINT AS period_offset, "
        "count(*)::BIGINT AS n_users "
        "FROM d JOIN c USING (user_id) GROUP BY 1, 2"
    )


def q_join_counts(nx: int = 360, ny: int = 170) -> str:
    """Twin of stages.spatialstats.grid_join_counts (min_count=1):
    distinct occupied cells, east/south self-joins for BB, the degree
    identity for BW."""
    n_pairs = (nx - 1) * ny + nx * (ny - 1)
    return (
        f"WITH {geo_cte()}, "
        "pts AS (SELECT floor(lon + 180.0)::BIGINT AS gx, "
        "floor(lat + 85.0)::BIGINT AS gy FROM geo), "
        "b AS (SELECT DISTINCT gy * 360 + gx AS cell, gx, gy FROM pts "
        f"WHERE gx BETWEEN 0 AND {nx - 1} "
        f"AND gy BETWEEN 0 AND {ny - 1}), "
        "bb AS (SELECT "
        f"(SELECT count(*) FROM b a JOIN b c ON c.cell = a.cell + 1 "
        f"WHERE a.gx < {nx - 1}) + "
        f"(SELECT count(*) FROM b a JOIN b c ON c.cell = a.cell + {nx} "
        f"WHERE a.gy < {ny - 1}) AS v), "
        "deg AS (SELECT sum((gx > 0)::INT + "
        f"(gx < {nx - 1})::INT + (gy > 0)::INT + "
        f"(gy < {ny - 1})::INT)::BIGINT AS v FROM b) "
        f"SELECT {nx * ny}::BIGINT AS n_cells, "
        f"{n_pairs}::BIGINT AS n_pairs, "
        "(SELECT count(*) FROM b)::BIGINT AS n_black, "
        "bb.v::BIGINT AS bb, (deg.v - 2 * bb.v)::BIGINT AS bw, "
        f"({n_pairs} - deg.v + bb.v)::BIGINT AS ww "
        "FROM bb, deg"
    )


def q_docs_surprisal(scale: int = 1000) -> str:
    """Twin of stages.text.unigram_surprisal."""
    return (
        "WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) "
        "AS term FROM documents), "
        "c AS (SELECT term, count(*)::BIGINT AS cnt FROM w GROUP BY 1), "
        "tot AS (SELECT count(*)::BIGINT AS t FROM w) "
        "SELECT doc_id, count(*)::BIGINT AS n_tokens, "
        f"sum((tot.t * {scale}) // cnt)::BIGINT AS surprisal "
        "FROM w JOIN c USING (term), tot GROUP BY doc_id"
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


def q_embed_projection(in_dim: int = 64, out_dim: int = 8,
                       quant: int = 1_000_000) -> str:
    """Twin of stages.ann.random_projection: the same FNV-parity sign
    matrix built from two ranges, quantized int64 inputs, exact sums.
    (Position variables named ii/jj — sql_fnv1a's lambdas shadow
    i/b/c/h.)"""
    sgn = sql_fnv1a("'rp:' || ii::VARCHAR || ':' || jj::VARCHAR")
    return (
        "WITH el AS (SELECT vec_id, "
        "generate_subscripts(embedding, 1) AS pos, "
        "unnest(list_transform(embedding, "
        f"x -> round(x::DOUBLE * {quant})::BIGINT)) AS e "
        "FROM embeddings), "
        f"sg AS (SELECT ii + 1 AS pos, jj AS j, "
        f"CASE WHEN ({sgn}) % 2 = 1 THEN 1 ELSE -1 END AS s "
        f"FROM (SELECT a.range AS ii, b.range AS jj "
        f"FROM range({in_dim}) a, range({out_dim}) b) t) "
        "SELECT el.vec_id, sg.j::BIGINT AS j, "
        "sum(sg.s * el.e)::BIGINT AS y "
        "FROM el JOIN sg ON sg.pos = el.pos GROUP BY 1, 2"
    )


def q_dataset_split(den: int = 100) -> str:
    """Twin of relational.hash_split 80/10/10 by url → per-(split,
    lang) counts."""
    h = f"({sql_fnv1a('url')} % {den})"
    case = (f"CASE WHEN {h} < 80 THEN 'train' "
            f"WHEN {h} < 90 THEN 'val' ELSE 'test' END")
    return (f"WITH {pages_cte()} "
            f"SELECT {case} AS split, lang, count(*)::BIGINT AS n_pages "
            "FROM pages GROUP BY 1, 2")


def q_events_median() -> str:
    """Twin of relational.grouped_median on events.value by type:
    two FILTERed one-element sums — the odd case hits the same row
    twice (= 2*median), the even case the two middles."""
    return (
        "WITH r AS (SELECT event_type, value, "
        "row_number() OVER (PARTITION BY event_type ORDER BY value) "
        "- 1 AS rn, count(*) OVER (PARTITION BY event_type) AS n "
        "FROM events) "
        "SELECT event_type, max(n)::BIGINT AS n, "
        "(sum(value) FILTER (rn = (n - 1) // 2) + "
        "sum(value) FILTER (rn = n // 2)) AS median_x2 "
        "FROM r GROUP BY event_type"
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


def q_events_outliers(k: int = 3) -> str:
    """Twin of relational.grouped_mad_outliers on events.value by
    type: the two-middle FILTER trick applied twice (median, then
    MAD of |2v - M2|), outliers = 2*D > k*MAD4."""
    return (
        "WITH r1 AS (SELECT event_type, value, "
        "row_number() OVER (PARTITION BY event_type ORDER BY value) "
        "- 1 AS rn, count(*) OVER (PARTITION BY event_type) AS n "
        "FROM events), "
        "m1 AS (SELECT event_type, max(n)::BIGINT AS n, "
        "(sum(value) FILTER (rn = (n - 1) // 2) + "
        "sum(value) FILTER (rn = n // 2)) AS m2 FROM r1 "
        "GROUP BY event_type), "
        "d AS (SELECT e.event_type, abs(2 * e.value - m1.m2) AS dv "
        "FROM events e JOIN m1 USING (event_type)), "
        "r2 AS (SELECT event_type, dv, "
        "row_number() OVER (PARTITION BY event_type ORDER BY dv) "
        "- 1 AS rn, count(*) OVER (PARTITION BY event_type) AS n "
        "FROM d), "
        "m2t AS (SELECT event_type, "
        "(sum(dv) FILTER (rn = (n - 1) // 2) + "
        "sum(dv) FILTER (rn = n // 2)) AS mad4 FROM r2 "
        "GROUP BY event_type) "
        "SELECT m1.event_type, m1.n, m1.m2 AS median_x2, "
        "m2t.mad4 AS mad_x4, "
        f"(SELECT count(*) FROM d WHERE d.event_type = m1.event_type "
        f"AND 2 * d.dv > {k} * m2t.mad4)::BIGINT AS n_outliers "
        "FROM m1 JOIN m2t USING (event_type)"
    )


def q_events_asof_fwd() -> str:
    """Twin of the forward as-of attribution: for each view, the
    user's EARLIEST purchase with ts >= view.ts (argmin by ts, ties
    impossible — (user, ts) is unique in the fixture); unmatched
    views report -1."""
    return (
        "WITH v AS (SELECT user_id, event_id, ts FROM events "
        "WHERE event_type = 'view'), "
        "p AS (SELECT user_id, event_id, ts FROM events "
        "WHERE event_type = 'purchase'), "
        "m AS (SELECT v.user_id, v.event_id AS view_event_id, "
        "p.event_id AS p_id, row_number() OVER "
        "(PARTITION BY v.user_id, v.event_id ORDER BY p.ts) AS rn "
        "FROM v JOIN p ON p.user_id = v.user_id AND p.ts >= v.ts) "
        "SELECT v.user_id, v.event_id AS view_event_id, "
        "coalesce(m.p_id, -1)::BIGINT AS purchase_event_id "
        "FROM v LEFT JOIN m ON m.view_event_id = v.event_id "
        "AND m.rn = 1"
    )


def q_bigram_pmi(k: int = 50, min_count: int = 5,
                 quant: int = 1_000_000) -> str:
    """Twin of stages.text.bigram_pmi: identical chained integer
    floor ((c_ab*quant)//c_a*quant)//c_b, (score desc, gram asc)
    order."""
    return (
        "WITH t AS (SELECT string_split(text, ' ') AS toks "
        "FROM documents), "
        "g AS (SELECT unnest(list_transform(range(1, len(toks)), "
        "j -> toks[j] || ' ' || toks[j + 1])) AS gram FROM t), "
        "bg AS (SELECT gram, count(*)::BIGINT AS c_ab FROM g "
        f"GROUP BY gram HAVING count(*) >= {min_count}), "
        "w AS (SELECT unnest(toks) AS term FROM t), "
        "u AS (SELECT term, count(*)::BIGINT AS c FROM w "
        "GROUP BY term), "
        "s AS (SELECT bg.gram, bg.c_ab, u1.c AS c_a, u2.c AS c_b, "
        f"bg.c_ab * {quant} // u1.c * {quant} // u2.c AS score "
        "FROM bg JOIN u u1 ON u1.term = string_split(bg.gram, ' ')[1] "
        "JOIN u u2 ON u2.term = string_split(bg.gram, ' ')[2]) "
        "SELECT gram, c_ab, c_a, c_b, score FROM s "
        f"ORDER BY score DESC, gram LIMIT {k}"
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


def q_events_transitions() -> str:
    """Twin of sessions.transition_counts: lag() over
    (user ORDER BY epoch_us(ts), event_id) — the same (ts, id) tie
    order the engine sorts by inside each bucket."""
    return (
        "WITH o AS (SELECT user_id, event_type, "
        "lag(event_type) OVER (PARTITION BY user_id "
        "ORDER BY epoch_us(ts), event_id) AS prev FROM events) "
        "SELECT prev AS prev_type, event_type AS next_type, "
        "count(*)::BIGINT AS n FROM o WHERE prev IS NOT NULL "
        "GROUP BY 1, 2"
    )


def q_late_shipments(late_us: int = 30 * 86_400_000_000) -> str:
    """Twin of queries.q_late_shipments (integer-microsecond
    lateness, same strict > threshold)."""
    return (
        "SELECT o_orderpriority, "
        "sum(CASE WHEN epoch_us(l_shipdate) - epoch_us(o_orderdate) "
        f"> {late_us} THEN 1 ELSE 0 END)::BIGINT AS n_late, "
        "count(*)::BIGINT AS n_items "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "GROUP BY o_orderpriority"
    )


def q_returned_customers(k: int = 20) -> str:
    """Twin of queries.q_returned_customers (TPC-H Q10 shape).
    Ordering ties broken by custkey; revenue rounded to 2dp after
    the full per-customer sum on both sides."""
    return (
        "SELECT o_custkey AS custkey, any_value(c_name) AS c_name, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, "
        "count(*)::BIGINT AS n_items "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "WHERE l_returnflag = 'R' "
        "GROUP BY o_custkey "
        "ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC, "
        f"o_custkey LIMIT {k}"
    )


def q_nation_year_rollup() -> str:
    """Twin of relational.grouped_rollup over (nation, order year):
    native GROUP BY ROLLUP with the engine's typed sentinels
    coalesced in ('ALL'/-1; quantity integral by construction)."""
    return (
        "SELECT coalesce(n.n_name, 'ALL') AS n_name, "
        "coalesce(year(o.o_orderdate), -1)::BIGINT AS year, "
        "sum(l.l_quantity)::BIGINT AS sum_qty, "
        "count(*)::BIGINT AS n_items "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
        "JOIN nation n ON s.s_nationkey = n.n_nationkey "
        "GROUP BY ROLLUP (n.n_name, year(o.o_orderdate))"
    )


def q_table_checksum(buckets: int = 64) -> str:
    """Twin of relational.xor_fingerprint over documents keyed by
    doc_id:text — per-row fnv converted to the int64 bit pattern,
    bit_xor per hash bucket (XOR commutes, so any evaluation order
    matches the engine's block partials)."""
    fnv = sql_fnv1a("doc_id::VARCHAR || ':' || text")
    i64 = (f"(CASE WHEN h >= 9223372036854775808::UBIGINT "
           f"THEN (h::HUGEINT - 18446744073709551616::HUGEINT)::BIGINT "
           f"ELSE h::BIGINT END)")
    return (
        f"WITH t AS (SELECT ({fnv}) AS h FROM documents) "
        f"SELECT (h % {buckets})::BIGINT AS bucket, "
        f"bit_xor({i64}) AS fp, count(*)::BIGINT AS n_rows "
        "FROM t GROUP BY 1"
    )


def q_nation_year_cube() -> str:
    """Twin of relational.grouped_cube over (nation, order year):
    native GROUP BY CUBE with the engine's typed sentinels."""
    return (
        "SELECT coalesce(n.n_name, 'ALL') AS n_name, "
        "coalesce(year(o.o_orderdate), -1)::BIGINT AS year, "
        "sum(l.l_quantity)::BIGINT AS sum_qty, "
        "count(*)::BIGINT AS n_items "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
        "JOIN nation n ON s.s_nationkey = n.n_nationkey "
        "GROUP BY CUBE (n.n_name, year(o.o_orderdate))"
    )


def q_events_pivot() -> str:
    """Twin of relational.pivot_counts on events by user."""
    labels = ["click", "error", "purchase", "signup", "view"]
    cols = ", ".join(
        f"count(*) FILTER (event_type = '{l}')::BIGINT AS n_{l}"
        for l in labels)
    return (f"SELECT user_id, {cols}, count(*)::BIGINT AS n_total "
            "FROM events GROUP BY user_id")


def q_part_flag_balance() -> str:
    """Twin of relational.multiset_except: native EXCEPT ALL then a
    count per surviving value."""
    return (
        "SELECT l_partkey, count(*)::BIGINT AS n FROM "
        "(SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R' "
        "EXCEPT ALL "
        "SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A') "
        "GROUP BY l_partkey"
    )


def q_lineitem_corr(q: int = 1_000_000) -> str:
    """Twin of relational.grouped_corr_int: the same integer
    sufficient statistics in HUGEINT, corr^2 floor-quantized —
    no float division on either side."""
    num = "(n::HUGEINT*sxy - sx::HUGEINT*sy)"
    varx = "(n::HUGEINT*sxx - sx::HUGEINT*sx)"
    vary = "(n::HUGEINT*syy - sy::HUGEINT*sy)"
    return (
        "WITH t AS (SELECT l_returnflag, l_linestatus, "
        "round(l_discount*100)::BIGINT AS xi, "
        "round(l_tax*100)::BIGINT AS yi FROM lineitem), "
        "s AS (SELECT l_returnflag, l_linestatus, "
        "count(*)::BIGINT AS n, sum(xi)::BIGINT AS sx, "
        "sum(yi)::BIGINT AS sy, sum(xi*xi)::BIGINT AS sxx, "
        "sum(yi*yi)::BIGINT AS syy, sum(xi*yi)::BIGINT AS sxy "
        "FROM t GROUP BY 1, 2) "
        "SELECT l_returnflag, l_linestatus, n, "
        f"(CASE WHEN {num} > 0 THEN 1 WHEN {num} < 0 THEN -1 "
        "ELSE 0 END)::BIGINT AS corr_sign, "
        f"(CASE WHEN {varx} * {vary} > 0 THEN "
        f"({num} * {num} * {q} // ({varx} * {vary}))::BIGINT "
        "ELSE -1 END) AS corr2_q, "
        "sx, sy, sxx, syy, sxy FROM s"
    )


def q_events_iqr() -> str:
    """Twin of relational.grouped_quartiles: FILTER-by-rank picks of
    the same two-element sums (q1 ranks (n-1)//4, n//4; q3 the
    mirror ranks) — float-bit-exact."""
    q1 = ("(sum(value) FILTER (rn = (n-1)//4) + "
          "sum(value) FILTER (rn = n//4))")
    q3 = ("(sum(value) FILTER (rn = n-1-n//4) + "
          "sum(value) FILTER (rn = n-1-(n-1)//4))")
    return (
        "WITH r AS (SELECT event_type, value, "
        "row_number() OVER (PARTITION BY event_type ORDER BY value) "
        "- 1 AS rn, count(*) OVER (PARTITION BY event_type) AS n "
        "FROM events) "
        f"SELECT event_type, max(n)::BIGINT AS n, {q1} AS q1_x2, "
        f"{q3} AS q3_x2, {q3} - {q1} AS iqr_x2 "
        "FROM r GROUP BY event_type"
    )


def q_fuzzy_names() -> str:
    """Twin of text.fuzzy_vocab_pairs on customer names: quadratic
    levenshtein self-join over the distinct-token table (the engine
    side is the SymSpell candidate path — same result set)."""
    return (
        "WITH v AS (SELECT w, count(*)::BIGINT AS n FROM "
        "(SELECT unnest(string_split(c_name, ' ')) AS w "
        "FROM customer) GROUP BY w) "
        "SELECT a.w AS w1, b.w AS w2, a.n AS n1, b.n AS n2 "
        "FROM v a JOIN v b "
        "ON a.w < b.w AND levenshtein(a.w, b.w) = 1"
    )


def q_cust_triangles() -> str:
    """Twin of graph.triangle_stats on the same-day co-order graph:
    canonical edge CTE, degree CTE, and the 3-way canonical-order
    self-join (each triangle matched exactly once)."""
    return (
        "WITH e AS (SELECT DISTINCT a.o_custkey AS lo, "
        "b.o_custkey AS hi FROM orders a JOIN orders b "
        "ON a.o_orderdate = b.o_orderdate "
        "AND a.o_custkey < b.o_custkey), "
        "d AS (SELECT v, count(*)::BIGINT AS deg FROM "
        "(SELECT lo AS v FROM e UNION ALL SELECT hi FROM e) "
        "GROUP BY v) "
        "SELECT (SELECT count(*) FROM d)::BIGINT AS n_vertices, "
        "(SELECT count(*) FROM e)::BIGINT AS n_edges, "
        "(SELECT sum(deg * (deg - 1) // 2) FROM d)::BIGINT "
        "AS n_wedges, "
        "(SELECT count(*) FROM e e1 JOIN e e2 ON e1.hi = e2.lo "
        "JOIN e e3 ON e3.lo = e1.lo AND e3.hi = e2.hi)::BIGINT "
        "AS n_triangles"
    )


def q_embed_quantize() -> str:
    """Twin of ann.quantize_int8_stats: identical float64 op order
    (cast ::DOUBLE before arithmetic — FLOAT list math diverges)."""
    return (
        "WITH x AS (SELECT vec_id, "
        "generate_subscripts(embedding, 1) AS gi, "
        "unnest(embedding)::DOUBLE AS v FROM embeddings), "
        "mm AS (SELECT gi, min(v) AS mn, max(v) AS mx FROM x "
        "GROUP BY gi), "
        "c AS (SELECT vec_id, CASE WHEN mx > mn THEN "
        "least(greatest(floor(((v - mn) * 255.0) / (mx - mn)), 0), "
        "255) ELSE 0 END::BIGINT AS code "
        "FROM x JOIN mm USING (gi)) "
        "SELECT vec_id, sum(code)::BIGINT AS code_sum, "
        "min(code)::BIGINT AS code_min, "
        "max(code)::BIGINT AS code_max, count(*)::BIGINT AS dim "
        "FROM c GROUP BY vec_id"
    )


def q_view_purchase_overlap() -> str:
    """Twin of relational.multiset_intersect: native INTERSECT ALL
    then a count per surviving value."""
    return (
        "SELECT user_id, count(*)::BIGINT AS n FROM "
        "(SELECT user_id FROM events WHERE event_type = 'view' "
        "INTERSECT ALL "
        "SELECT user_id FROM events WHERE event_type = 'purchase') "
        "GROUP BY user_id"
    )


def q_user_last_event() -> str:
    """Twin of grouped_topk k=1 keep-latest: row_number over
    (ts DESC, event_id ASC); ts reported as epoch microseconds
    (engine casts timestamp[us] to int64)."""
    return (
        "WITH r AS (SELECT user_id, event_id, epoch_us(ts) AS ts, "
        "event_type, row_number() OVER (PARTITION BY user_id "
        "ORDER BY epoch_us(ts) DESC, event_id) AS rn FROM events) "
        "SELECT user_id, event_id, ts, event_type FROM r "
        "WHERE rn = 1"
    )


def q_priority_flag_chi2(q: int = 1_000_000) -> str:
    """Twin of relational.chi2_assoc: HUGEINT contingency margins and
    the same floor-quantized per-cell statistic."""
    return (
        "WITH j AS (SELECT o.o_orderpriority, l.l_returnflag "
        "FROM lineitem l JOIN orders o "
        "ON l.l_orderkey = o.o_orderkey), "
        "cell AS (SELECT o_orderpriority, l_returnflag, "
        "count(*)::BIGINT AS o FROM j GROUP BY 1, 2), "
        "m AS (SELECT o_orderpriority, l_returnflag, o, "
        "sum(o) OVER ()::HUGEINT AS N, "
        "sum(o) OVER (PARTITION BY o_orderpriority)::HUGEINT AS ra, "
        "sum(o) OVER (PARTITION BY l_returnflag)::HUGEINT AS cb "
        "FROM cell) "
        "SELECT o_orderpriority, l_returnflag, o AS observed, "
        f"((N*o - ra*cb) * (N*o - ra*cb) * {q} "
        "// (N * ra * cb))::BIGINT AS chi2_q FROM m"
    )


def q_part_skyline() -> str:
    """Twin of relational.skyline2: the NOT EXISTS dominance
    definition (<= / >= with one strict)."""
    return (
        "SELECT p_partkey, p_retailprice, p_size FROM part a "
        "WHERE NOT EXISTS (SELECT 1 FROM part b WHERE "
        "b.p_retailprice <= a.p_retailprice "
        "AND b.p_size >= a.p_size "
        "AND (b.p_retailprice < a.p_retailprice "
        "OR b.p_size > a.p_size)) "
        "ORDER BY p_partkey"
    )


def q_price_deciles() -> str:
    """Twin of quantiles.exact_global_ranks at the 11 decile ranks:
    row_number pick of the identical element."""
    return (
        "WITH r AS (SELECT l_extendedprice AS v, "
        "row_number() OVER (ORDER BY l_extendedprice) - 1 AS rn, "
        "count(*) OVER () AS n FROM lineitem) "
        "SELECT i::BIGINT AS decile, max(v) AS value "
        "FROM r JOIN range(0, 11) t(i) ON rn = (i * (n - 1)) // 10 "
        "GROUP BY i"
    )


def q_price_qty_grid() -> str:
    """Twin of the 2-D equi-depth grid: identical quartile cut ranks
    via row_number picks, identical right-closed binning (count of
    cuts <= v)."""
    def cuts(col):
        return (
            f"(SELECT list(v ORDER BY r) FROM (SELECT v, rn AS r "
            f"FROM (SELECT {col} AS v, row_number() OVER "
            f"(ORDER BY {col}) - 1 AS rn, count(*) OVER () AS n "
            f"FROM lineitem) WHERE rn = (1 * (n - 1)) // 4 "
            f"OR rn = (2 * (n - 1)) // 4 OR rn = (3 * (n - 1)) // 4))"
        )
    return (
        f"WITH px AS (SELECT {cuts('l_extendedprice')} AS c), "
        f"py AS (SELECT {cuts('l_quantity')} AS c) "
        "SELECT ((l_extendedprice >= px.c[1])::BIGINT + "
        "(l_extendedprice >= px.c[2])::BIGINT + "
        "(l_extendedprice >= px.c[3])::BIGINT) AS cx, "
        "((l_quantity >= py.c[1])::BIGINT + "
        "(l_quantity >= py.c[2])::BIGINT + "
        "(l_quantity >= py.c[3])::BIGINT) AS cy, "
        "count(*)::BIGINT AS n "
        "FROM lineitem, px, py GROUP BY 1, 2"
    )


def q_events_ohlc(period_us: int = 3_600_000_000) -> str:
    """Twin of sessions.ohlc_bars: row_number picks for open/close
    under the same (ts, event_id) total order."""
    return (
        "WITH e AS (SELECT event_type AS k, epoch_us(ts) AS tsu, "
        "event_id, value FROM events), "
        f"b AS (SELECT k, tsu // {period_us} AS bar, value, "
        "row_number() OVER (PARTITION BY k, tsu // "
        f"{period_us} ORDER BY tsu, event_id) AS rn_a, "
        "row_number() OVER (PARTITION BY k, tsu // "
        f"{period_us} ORDER BY tsu DESC, event_id DESC) AS rn_d "
        "FROM e) "
        "SELECT k, bar::BIGINT AS bar, "
        "max(value) FILTER (rn_a = 1) AS open, "
        "max(value) AS high, min(value) AS low, "
        "max(value) FILTER (rn_d = 1) AS close, "
        "count(*)::BIGINT AS n FROM b GROUP BY k, bar"
    )


def q_rolling_users(window_days: int = 7) -> str:
    """Twin of sessions.rolling_active_users: DISTINCT (user, day)
    x window expansion, windows past the last day dropped."""
    return (
        "WITH ud AS (SELECT DISTINCT user_id AS u, "
        "epoch_us(ts) // 86400000000 AS d FROM events), "
        "ex AS (SELECT DISTINCT u, d + i AS w FROM ud, "
        f"range(0, {window_days}) t(i) "
        "WHERE d + i <= (SELECT max(d) FROM ud)) "
        "SELECT w::BIGINT AS w, count(*)::BIGINT AS n_users "
        "FROM ex GROUP BY w"
    )


def q_purchase_attribution(gap_us: int = 1800_000_000) -> str:
    """Twin of the interval_attach attribution chain: session CTE
    (lag-gap sessionize over the full log), BETWEEN containment
    join, per-session fold."""
    return (
        "WITH e AS (SELECT user_id, epoch_us(ts) AS us "
        "FROM events), "
        "flagged AS (SELECT user_id, us, CASE WHEN us - lag(us) "
        "OVER (PARTITION BY user_id ORDER BY us) > "
        f"{gap_us} OR lag(us) OVER (PARTITION BY user_id "
        "ORDER BY us) IS NULL THEN 1 ELSE 0 END AS ns FROM e), "
        "sess0 AS (SELECT user_id, us, sum(ns) OVER "
        "(PARTITION BY user_id ORDER BY us ROWS UNBOUNDED "
        "PRECEDING) AS sid FROM flagged), "
        "sess AS (SELECT user_id, min(us)::BIGINT AS "
        "session_start_us, max(us)::BIGINT AS session_end_us "
        "FROM sess0 GROUP BY user_id, sid) "
        "SELECT s.user_id, s.session_start_us, s.session_end_us, "
        "count(*)::BIGINT AS n_purchases, "
        "min(epoch_us(p.ts))::BIGINT AS first_purchase_us "
        "FROM sess s JOIN events p ON p.user_id = s.user_id "
        "AND p.event_type = 'purchase' "
        "AND epoch_us(p.ts) BETWEEN s.session_start_us "
        "AND s.session_end_us "
        "GROUP BY s.user_id, s.session_start_us, s.session_end_us"
    )


def q_nation_revenue_share(q: int = 1_000_000) -> str:
    """Twin of the integer revenue share: cents sums in BIGINT,
    share floor-quantized in HUGEINT."""
    return (
        "WITH r AS (SELECT n.n_name, "
        "sum(round(l.l_extendedprice * 100)::BIGINT)::BIGINT "
        "AS rev_cents "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "GROUP BY n.n_name) "
        "SELECT n_name, rev_cents, "
        f"((rev_cents::HUGEINT * {q}) // "
        "(SELECT sum(rev_cents)::HUGEINT FROM r))::BIGINT AS share_q "
        "FROM r"
    )


def q_source_mode_lang() -> str:
    """Twin of the grouped mode: row_number over
    (count DESC, lang ASC)."""
    return (
        "WITH c AS (SELECT source, lang, count(*)::BIGINT AS n "
        "FROM documents GROUP BY 1, 2), "
        "r AS (SELECT source, lang, n, row_number() OVER "
        "(PARTITION BY source ORDER BY n DESC, lang) AS rn FROM c) "
        "SELECT source, lang, n FROM r WHERE rn = 1"
    )


def q_embed_dim_stats(scale: int = 10_000_000) -> str:
    """Twin of ann.embed_dim_stats (cast ::DOUBLE before round —
    FLOAT list arithmetic diverges; 1-based subscripts shifted)."""
    return (
        "WITH x AS (SELECT generate_subscripts(embedding, 1) - 1 "
        "AS dim, unnest(embedding)::DOUBLE AS v FROM embeddings) "
        "SELECT dim::BIGINT AS dim, count(*)::BIGINT AS n, "
        f"sum(trunc(v * {scale})::BIGINT)::BIGINT AS sum_q, "
        "min(v) AS mn, max(v) AS mx FROM x GROUP BY dim"
    )


def q_lineitem_profile() -> str:
    """Twin of the per-column profiler: UNION ALL of exact
    count/distinct/null triples."""
    cols = ["l_orderkey", "l_partkey", "l_suppkey", "l_returnflag",
            "l_linestatus"]
    parts = [
        (f"SELECT '{c}' AS column, count(*)::BIGINT AS n_rows, "
         f"sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)::BIGINT "
         f"AS n_null, count(DISTINCT {c})::BIGINT AS n_distinct "
         "FROM lineitem")
        for c in cols]
    return " UNION ALL ".join(parts)


def q_orderkey_islands() -> str:
    """Twin of relational.value_islands: the classic
    v - row_number() islands grouping."""
    return (
        "WITH v AS (SELECT DISTINCT l_orderkey AS v FROM lineitem WHERE l_returnflag = 'R'), "
        "g AS (SELECT v, v - row_number() OVER (ORDER BY v) AS grp "
        "FROM v) "
        "SELECT min(v)::BIGINT AS start, max(v)::BIGINT AS \"end\", "
        "count(*)::BIGINT AS n_values FROM g GROUP BY grp"
    )


def q_user_twap() -> str:
    """Twin of the TWAP fold: lead() under the same (ts, id) order,
    trunc-quantized value, exact integer sums."""
    return (
        "WITH o AS (SELECT user_id, value, epoch_us(ts) AS us, "
        "lead(epoch_us(ts)) OVER (PARTITION BY user_id "
        "ORDER BY epoch_us(ts), event_id) AS nxt FROM events) "
        "SELECT user_id, "
        "sum(trunc(value * 100)::BIGINT * (nxt - us))::BIGINT "
        "AS twap_num, sum(nxt - us)::BIGINT AS twap_den "
        "FROM o WHERE nxt IS NOT NULL GROUP BY user_id"
    )


def q_event_gap_hist() -> str:
    """Twin of the inter-arrival histogram (minute buckets capped
    at 1440)."""
    return (
        "WITH o AS (SELECT epoch_us(ts) AS us, "
        "lead(epoch_us(ts)) OVER (PARTITION BY user_id "
        "ORDER BY epoch_us(ts), event_id) AS nxt FROM events) "
        "SELECT least((nxt - us) // 60000000, 1440)::BIGINT "
        "AS gap_min, count(*)::BIGINT AS n "
        "FROM o WHERE nxt IS NOT NULL GROUP BY 1"
    )


def q_copurchase_pairs(k: int = 20, min_count: int = 3,
                       q: int = 1_000_000) -> str:
    """Twin of the market-basket lift: identical chained floor,
    (lift desc, pa, pb) order."""
    return (
        "WITH op AS (SELECT DISTINCT l_orderkey, l_partkey "
        "FROM lineitem), "
        "pr AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb "
        "FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey "
        "AND a.l_partkey < b.l_partkey), "
        "s AS (SELECT pa, pb, count(*)::BIGINT AS c_ab FROM pr "
        f"GROUP BY 1, 2 HAVING count(*) >= {min_count}), "
        "u AS (SELECT l_partkey, count(*)::BIGINT AS c FROM op "
        "GROUP BY 1) "
        "SELECT pa, pb, c_ab, u1.c AS c_a, u2.c AS c_b, "
        f"c_ab * {q} // u1.c * {q} // u2.c AS lift_q "
        "FROM s JOIN u u1 ON u1.l_partkey = pa "
        "JOIN u u2 ON u2.l_partkey = pb "
        f"ORDER BY lift_q DESC, pa, pb LIMIT {k}"
    )


def q_weighted_price_quartiles() -> str:
    """Twin of the weighted radix selection: smallest value whose
    cumulative weight (value-ascending) exceeds (i*(W-1))//4."""
    return (
        "WITH t AS (SELECT l_extendedprice AS v, "
        "l_quantity::BIGINT AS w FROM lineitem), "
        "tw AS (SELECT sum(w)::BIGINT AS tw FROM t), "
        "c AS (SELECT v, sum(w) OVER (ORDER BY v "
        "ROWS UNBOUNDED PRECEDING)::BIGINT AS cw FROM t) "
        "SELECT i::BIGINT AS q_idx, min(v) AS value "
        "FROM c, tw, range(0, 5) r(i) "
        "WHERE c.cw > (i * (tw.tw - 1)) // 4 GROUP BY i"
    )


def q_snapshot_diff() -> str:
    """Twin of the CDC diff: rebuild snapshot B with the same
    deterministic edits, FULL OUTER JOIN, CASE status. Fingerprints
    compare equal iff texts compare equal, so the twin compares
    texts directly."""
    return (
        "WITH a AS (SELECT doc_id, text FROM documents), "
        "b AS (SELECT doc_id, CASE WHEN doc_id % 7 = 0 "
        "THEN text || 'X' ELSE text END AS text FROM documents "
        "WHERE doc_id % 13 <> 0 "
        "UNION ALL SELECT doc_id + 1000000000, text FROM documents "
        "WHERE doc_id % 11 = 0), "
        "j AS (SELECT coalesce(a.doc_id, b.doc_id) AS k, "
        "CASE WHEN a.doc_id IS NULL THEN 'added' "
        "WHEN b.doc_id IS NULL THEN 'removed' "
        "WHEN a.text = b.text THEN 'same' ELSE 'changed' END "
        "AS status FROM a FULL OUTER JOIN b "
        "ON a.doc_id = b.doc_id) "
        "SELECT status, count(*)::BIGINT AS n_keys FROM j "
        "GROUP BY status"
    )


def q_top_paths(k: int = 10, k_steps: int = 8) -> str:
    """Twin of the journey top-k: string_agg of the first k_steps
    types under the same (ts, id) order, (n desc, path asc) ties."""
    return (
        "WITH r AS (SELECT user_id, event_type, row_number() OVER "
        "(PARTITION BY user_id ORDER BY epoch_us(ts), event_id) "
        "AS rn FROM events), "
        "p AS (SELECT user_id, string_agg(event_type, '>' "
        "ORDER BY rn) AS path FROM r "
        f"WHERE rn <= {k_steps} GROUP BY user_id) "
        "SELECT path, count(*)::BIGINT AS n_users FROM p "
        f"GROUP BY path ORDER BY n_users DESC, path LIMIT {k}"
    )


def q_revenue_total_128() -> str:
    """Twin of the 128-bit limb total (HUGEINT)."""
    return (
        "WITH t AS (SELECT sum(round(l_extendedprice * 100)"
        "::BIGINT)::HUGEINT AS s, count(*)::BIGINT AS n "
        "FROM lineitem) "
        "SELECT (s // 4611686018427387904)::BIGINT AS hi, "
        "(s % 4611686018427387904)::BIGINT AS lo, n FROM t"
    )


def q_events_trimmed_mean() -> str:
    """Twin of the interquartile trimmed sum: trunc-quantized
    values, rank-range FILTER, exact integer sums."""
    return (
        "WITH r AS (SELECT event_type, "
        "trunc(value * 100)::BIGINT AS vq, "
        "row_number() OVER (PARTITION BY event_type "
        "ORDER BY trunc(value * 100)::BIGINT) - 1 AS rn, "
        "count(*) OVER (PARTITION BY event_type) AS n FROM events) "
        "SELECT event_type, max(n)::BIGINT AS n, "
        "sum(vq) FILTER (rn >= (n-1)//4 AND rn <= n-1-(n-1)//4)"
        "::BIGINT AS trimmed_sum_q, "
        "count(*) FILTER (rn >= (n-1)//4 AND rn <= n-1-(n-1)//4)"
        "::BIGINT AS n_kept FROM r GROUP BY event_type"
    )


def q_hive_partition_roundtrip() -> str:
    """Twin of the pruned hive-layout read: per-lang counts + XOR of
    per-row text fnv for the two pruned languages."""
    fnv = sql_fnv1a("text")
    i64 = ("(CASE WHEN h >= 9223372036854775808::UBIGINT "
           "THEN (h::HUGEINT - 18446744073709551616::HUGEINT)::BIGINT "
           "ELSE h::BIGINT END)")
    return (
        f"WITH t AS (SELECT lang, ({fnv}) AS h FROM documents "
        "WHERE lang IN ('en', 'de')) "
        f"SELECT lang, count(*)::BIGINT AS n, bit_xor({i64}) AS fp "
        "FROM t GROUP BY lang"
    )


def q_events_dow_hour() -> str:
    """Twin of the seasonal profile (dayofweek 0=Sunday; integer
    epoch arithmetic on both sides)."""
    return (
        "SELECT ((epoch_us(ts) // 86400000000 + 4) % 7)::BIGINT "
        "AS dow, "
        "((epoch_us(ts) % 86400000000) // 3600000000)::BIGINT "
        "AS hour, count(*)::BIGINT AS n FROM events GROUP BY 1, 2"
    )


def q_shipping_delay_iqr() -> str:
    """Twin of the delay-dispersion composition: integer-day delays,
    FILTER-by-rank quartile picks (x2 convention)."""
    q1 = ("(sum(d) FILTER (rn = (n-1)//4) + "
          "sum(d) FILTER (rn = n//4))")
    q3 = ("(sum(d) FILTER (rn = n-1-n//4) + "
          "sum(d) FILTER (rn = n-1-(n-1)//4))")
    return (
        "WITH j AS (SELECT o.o_orderpriority, "
        "(epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)) "
        "// 86400000000 AS d "
        "FROM lineitem l JOIN orders o "
        "ON l.l_orderkey = o.o_orderkey), "
        "r AS (SELECT o_orderpriority, d, row_number() OVER "
        "(PARTITION BY o_orderpriority ORDER BY d) - 1 AS rn, "
        "count(*) OVER (PARTITION BY o_orderpriority) AS n FROM j) "
        "SELECT o_orderpriority, max(n)::BIGINT AS n, "
        f"{q1}::BIGINT AS q1_x2, {q3}::BIGINT AS q3_x2, "
        f"({q3} - {q1})::BIGINT AS iqr_x2 "
        "FROM r GROUP BY o_orderpriority"
    )


def q_text_freq_of_freqs() -> str:
    """Twin of the Good-Turing frequency-of-frequencies fold."""
    return (
        "SELECT c::BIGINT AS multiplicity, count(*)::BIGINT "
        "AS n_texts FROM (SELECT count(*) AS c FROM documents "
        "GROUP BY text) GROUP BY c"
    )


def q_user_type_hhi(q: int = 1_000_000) -> str:
    """Twin of the integer Herfindahl fold (HUGEINT floor)."""
    return (
        "WITH c AS (SELECT user_id, event_type, count(*)::BIGINT "
        "AS c FROM events GROUP BY 1, 2), "
        "s AS (SELECT user_id, sum(c)::BIGINT AS n, "
        "sum(c::HUGEINT * c)::HUGEINT AS ss FROM c GROUP BY 1) "
        f"SELECT user_id, n, ((ss * {q}) // "
        "(n::HUGEINT * n))::BIGINT AS hhi_q FROM s"
    )


def q_bounce_rate(gap_us: int = 1800_000_000) -> str:
    """Twin of the bounce fold over the sessionize CTE."""
    return (
        "WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events), "
        "flagged AS (SELECT user_id, us, CASE WHEN us - lag(us) "
        "OVER (PARTITION BY user_id ORDER BY us) > "
        f"{gap_us} OR lag(us) OVER (PARTITION BY user_id "
        "ORDER BY us) IS NULL THEN 1 ELSE 0 END AS ns FROM e), "
        "sess0 AS (SELECT user_id, us, sum(ns) OVER "
        "(PARTITION BY user_id ORDER BY us ROWS UNBOUNDED "
        "PRECEDING) AS sid FROM flagged), "
        "sess AS (SELECT user_id, sid, count(*)::BIGINT AS ne "
        "FROM sess0 GROUP BY 1, 2) "
        "SELECT user_id, count(*)::BIGINT AS n_sessions, "
        "sum(CASE WHEN ne = 1 THEN 1 ELSE 0 END)::BIGINT "
        "AS n_bounces FROM sess GROUP BY user_id"
    )


def q_nation_year_flag_rollup() -> str:
    """Twin of the k=3 rollup (native GROUP BY ROLLUP, typed
    sentinels)."""
    return (
        "SELECT coalesce(n.n_name, 'ALL') AS n_name, "
        "coalesce(year(o.o_orderdate), -1)::BIGINT AS year, "
        "coalesce(l.l_returnflag, 'ALL') AS flag, "
        "sum(l.l_quantity)::BIGINT AS sum_qty, "
        "count(*)::BIGINT AS n_items "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
        "JOIN nation n ON s.s_nationkey = n.n_nationkey "
        "GROUP BY ROLLUP (n.n_name, year(o.o_orderdate), "
        "l.l_returnflag)"
    )


def q_events_centered() -> str:
    """Twin of the median-centering map: the same median_x2 from the
    FILTER-by-rank CTE, the same 2v - m2 subtraction."""
    return (
        "WITH r AS (SELECT event_type, value, row_number() OVER "
        "(PARTITION BY event_type ORDER BY value) - 1 AS rn, "
        "count(*) OVER (PARTITION BY event_type) AS n FROM events), "
        "m AS (SELECT event_type, (sum(value) FILTER "
        "(rn = (n-1)//2) + sum(value) FILTER (rn = n//2)) AS m2 "
        "FROM r GROUP BY event_type) "
        "SELECT e.event_id, 2 * e.value - m.m2 AS c2 "
        "FROM events e JOIN m ON e.event_type = m.event_type"
    )


def q_value_drift() -> str:
    """Twin of the exact KS numerator: integer cumulative counts
    cross-multiplied, max over distinct values."""
    return (
        "WITH x AS (SELECT trunc(value * 100)::BIGINT AS v, "
        "CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS isa "
        "FROM events WHERE event_type IN ('click', 'view')), "
        "t AS (SELECT v, sum(isa)::BIGINT AS ca, "
        "sum(1 - isa)::BIGINT AS cb FROM x GROUP BY v), "
        "c AS (SELECT v, sum(ca) OVER (ORDER BY v "
        "ROWS UNBOUNDED PRECEDING)::HUGEINT AS cca, "
        "sum(cb) OVER (ORDER BY v "
        "ROWS UNBOUNDED PRECEDING)::HUGEINT AS ccb FROM t), "
        "n AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb "
        "FROM t) "
        "SELECT na, nb, max(abs(cca * nb - ccb * na))::BIGINT "
        "AS d_num FROM c, n GROUP BY na, nb"
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


def q_seq_packing(chunk_tokens: int = 2048) -> str:
    """Twin of stages.packing.pack_chunks over documents: window
    running total -> per-doc chunk span via generate_series unnest."""
    c = chunk_tokens
    return (
        "WITH d AS (SELECT doc_id, len(string_split(text, ' '))"
        "::BIGINT AS tok FROM documents), "
        "r AS (SELECT doc_id, tok, sum(tok) OVER (ORDER BY doc_id "
        "ROWS UNBOUNDED PRECEDING)::BIGINT - tok AS cb FROM d), "
        f"s AS (SELECT doc_id, tok, cb, unnest(generate_series("
        f"cb // {c}, (cb + tok - 1) // {c})) AS k FROM r), "
        f"t AS (SELECT doc_id, cb, k, least(cb + tok, (k + 1) * {c}) "
        f"- greatest(cb, k * {c}) AS tk FROM s) "
        "SELECT k::BIGINT AS chunk_id, sum(tk)::BIGINT AS n_tokens, "
        "count(*)::BIGINT AS n_docs, "
        f"sum((cb // {c} = k)::INT)::BIGINT AS n_starts, "
        "sum(doc_id * tk)::BIGINT AS ck FROM t GROUP BY k"
    )


def q_vocab_ids(v: int = 200) -> str:
    """Twin of the vocabulary builder."""
    return (
        "WITH w AS (SELECT unnest(string_split(text, ' ')) AS token "
        "FROM documents), "
        "c AS (SELECT token, count(*)::BIGINT AS cnt FROM w "
        "GROUP BY token) "
        "SELECT token, cnt, row_number() OVER "
        "(ORDER BY cnt DESC, token)::BIGINT AS tok_id FROM c "
        f"ORDER BY cnt DESC, token LIMIT {v}"
    )


def q_docs_stop_strip() -> str:
    """Twin of stages.text.stopword_strip_fp: same blank-join-collapse
    construction, FNV over the stripped text, int64 view."""
    from spapy_ray.stages.text import STOPWORDS

    sw = ", ".join(f"'{s}'" for s in STOPWORDS)
    stripped = (
        "trim(regexp_replace(array_to_string(list_transform("
        f"string_split(text, ' '), t -> CASE WHEN t IN ({sw}) "
        "THEN '' ELSE t END), ' '), ' +', ' ', 'g'), ' ')"
    )
    fnv = sql_fnv1a("st")
    i64 = (f"(CASE WHEN {fnv} >= 9223372036854775808::UBIGINT "
           f"THEN ({fnv}::HUGEINT - 18446744073709551616::HUGEINT)"
           f"::BIGINT ELSE {fnv}::BIGINT END)")
    return (
        f"WITH s AS (SELECT doc_id, text, {stripped} AS st "
        "FROM documents) "
        "SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tok, "
        "len(list_filter(string_split(text, ' '), t -> t NOT IN "
        f"({sw})))::BIGINT AS n_kept, {i64} AS fp FROM s"
    )


def q_lineitem_regr(q: int = 10 ** 6) -> str:
    """Twin of the grouped OLS fold — HUGEINT moments, DuckDB //
    truncation == the engine's sign*(abs//abs) convention."""
    return (
        "WITH b AS (SELECT l_returnflag, l_linestatus, "
        "round(l_quantity)::HUGEINT AS x, "
        "round(l_extendedprice * 100)::HUGEINT AS y FROM lineitem), "
        "s AS (SELECT l_returnflag, l_linestatus, "
        "count(*)::HUGEINT AS n, sum(x) AS sx, sum(y) AS sy, "
        "sum(x * y) AS sxy, sum(x * x) AS sxx FROM b GROUP BY 1, 2) "
        "SELECT l_returnflag, l_linestatus, n::BIGINT AS n, "
        f"(({q}::HUGEINT * (n * sxy - sx * sy)) // "
        "(n * sxx - sx * sx))::BIGINT AS slope_q, "
        f"(({q}::HUGEINT * (sy * sxx - sx * sxy)) // "
        "(n * sxx - sx * sx))::BIGINT AS icept_q FROM s"
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


def q_areal_interp() -> str:
    """Twin of stages.overlay.areal_transfer over the pip-join zone
    counts: disjoint 1-2 rect decomposition per zone shape, exact
    integer intersection areas, floor allocation."""
    za = ("(CASE WHEN shape IN (0, 1) THEN w * h "
          "WHEN shape = 2 THEN w * h2 + w2 * (h - h2) "
          "ELSE w2 * h2 + (w - w2 - 5000) * (h - h2 - 5000) END)")

    def rect(n: int) -> str:
        if n == 1:
            return ("SELECT zone_id, "
                    "x0 AS a0, y0 AS b0, "
                    "x0 + (CASE WHEN shape = 3 THEN w2 ELSE w END) AS a1, "
                    "y0 + (CASE WHEN shape IN (0, 1) THEN h "
                    "WHEN shape = 2 THEN h2 ELSE h2 END) AS b1 "
                    "FROM zc")
        return ("SELECT zone_id, "
                "x0 + (CASE WHEN shape = 2 THEN 0 ELSE w2 + 5000 END) AS a0, "
                "y0 + h2 + (CASE WHEN shape = 2 THEN 0 ELSE 5000 END) AS b0, "
                "x0 + (CASE WHEN shape = 2 THEN w2 ELSE w END) AS a1, "
                "y0 + h AS b1 FROM zc WHERE shape IN (2, 3)")

    return (
        f"WITH {join_cte()}, "
        "cnt AS (SELECT zone_id, count(*)::BIGINT AS c FROM joined "
        "GROUP BY zone_id), "
        f"zc AS (SELECT z.*, coalesce(cnt.c, 0) AS c, {za} AS za "
        "FROM zones z LEFT JOIN cnt USING (zone_id)), "
        f"rects AS ({rect(1)} UNION ALL {rect(2)}), "
        "cells AS (SELECT (p % 360)::BIGINT AS gx, "
        "(p // 360)::BIGINT AS gy, "
        "-1800000 + (p % 360) * 10000 AS cx0, "
        "-850000 + (p // 360) * 10000 AS cy0 FROM range(61200) t(p)), "
        "iz AS (SELECT gx, gy, r.zone_id, "
        "sum(greatest(0, least(a1, cx0 + 10000) - greatest(a0, cx0)) "
        "* greatest(0, least(b1, cy0 + 10000) - greatest(b0, cy0)))"
        "::BIGINT AS inter FROM cells, rects r "
        "WHERE a0 < cx0 + 10000 AND a1 > cx0 "
        "AND b0 < cy0 + 10000 AND b1 > cy0 GROUP BY 1, 2, 3), "
        "al AS (SELECT gx, gy, "
        "sum((zc.c * iz.inter) // zc.za)::BIGINT AS alloc "
        "FROM iz JOIN zc USING (zone_id) GROUP BY 1, 2) "
        "SELECT gx, gy, alloc FROM al WHERE alloc > 0"
    )


def q_events_interp() -> str:
    """Twin of stages.sessions.interp_attach: backward bracket via
    native ASOF JOIN, forward via the row_number formulation (DuckDB
    ASOF is backward-only), floor interpolation on non-negative
    integers."""
    return (
        "WITH e AS (SELECT event_id, user_id, ts, epoch_us(ts) AS us, "
        "event_type, round(value * 100)::BIGINT AS c FROM events), "
        "v AS (SELECT event_id, user_id, ts, us FROM e "
        "WHERE event_type = 'view'), "
        "p AS (SELECT user_id, ts, us, c FROM e "
        "WHERE event_type = 'purchase'), "
        "b AS (SELECT v.event_id, v.user_id, v.us, p.us AS us0, "
        "p.c AS c0 FROM v ASOF LEFT JOIN p "
        "ON v.user_id = p.user_id AND p.ts <= v.ts), "
        "fm AS (SELECT v.event_id, p.us AS us1, p.c AS c1, "
        "row_number() OVER (PARTITION BY v.event_id "
        "ORDER BY p.ts) AS rn "
        "FROM v JOIN p ON p.user_id = v.user_id AND p.ts >= v.ts), "
        "f AS (SELECT event_id, us1, c1 FROM fm WHERE rn = 1) "
        "SELECT b.user_id, b.event_id AS view_event_id, "
        "(CASE WHEN b.us0 IS NULL OR f.us1 IS NULL THEN -1 "
        "WHEN f.us1 = b.us0 THEN b.c0 "
        "ELSE (b.c0 * (f.us1 - b.us) + f.c1 * (b.us - b.us0)) "
        "// (f.us1 - b.us0) END)::BIGINT AS interp_c "
        "FROM b LEFT JOIN f USING (event_id)"
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


def q_events_percent_rank(q: int = 10 ** 6) -> str:
    """Twin of the rank-normalized window query (integer form of
    percent_rank / cume_dist; (user, ts, event_id) ordering is
    unique, so rank == row_number)."""
    return (
        "WITH r AS (SELECT user_id, event_id, "
        "row_number() OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id)::BIGINT AS rn, "
        "count(*) OVER (PARTITION BY user_id)::BIGINT AS n "
        "FROM events) "
        "SELECT user_id, event_id, "
        f"(CASE WHEN n = 1 THEN 0 ELSE ({q} * (rn - 1)) "
        "// (n - 1) END)::BIGINT AS pct_q, "
        f"(({q} * rn) // n)::BIGINT AS cd_q FROM r"
    )


def q_cust_assortativity(q: int = 10 ** 6) -> str:
    """Twin of graph.degree_assortativity on the co-order graph."""
    return (
        "WITH e AS (SELECT DISTINCT a.o_custkey AS lo, "
        "b.o_custkey AS hi FROM orders a JOIN orders b "
        "ON a.o_orderdate = b.o_orderdate "
        "AND a.o_custkey < b.o_custkey), "
        "d AS (SELECT v, count(*)::BIGINT AS deg FROM "
        "(SELECT lo AS v FROM e UNION ALL SELECT hi FROM e) "
        "GROUP BY v), "
        "x AS (SELECT da.deg::HUGEINT AS dx, db.deg::HUGEINT AS dy "
        "FROM e JOIN d da ON da.v = e.lo JOIN d db ON db.v = e.hi), "
        "s AS (SELECT 2 * count(*)::HUGEINT AS n, sum(dx + dy) AS sx, "
        "sum(2 * dx * dy) AS sxy, sum(dx * dx + dy * dy) AS sxx "
        "FROM x) "
        "SELECT (SELECT count(*) FROM d)::BIGINT AS n_vertices, "
        "(n // 2)::BIGINT AS n_edges, sx::BIGINT AS sx, "
        "sxy::BIGINT AS sxy, sxx::BIGINT AS sxx, "
        f"(({q} * (n * sxy - sx * sx)) // "
        "(n * sxx - sx * sx))::BIGINT AS assort_q FROM s"
    )


def q_domain_cm(width: int = 2048, depth: int = 4) -> str:
    """Twin of relational.count_min over page hosts: the whole
    sketch — including collisions — reproduced in SQL (same fnv,
    same mix/add wraparound, same cells), so estimates are
    value-exact even where they overestimate."""
    import re

    from spapy_ray.stages.relational import CM_ADD, CM_MIX
    from spapy_ray.stages.text import URL_PATTERN

    anon = re.sub(r"\?P<[a-z]+>", "", URL_PATTERN)
    fnv = sql_fnv1a("key")
    mix = "[" + ", ".join(f"{m}::HUGEINT" for m in CM_MIX) + "]"
    add = "[" + ", ".join(str(a) for a in CM_ADD) + "]"
    m64 = "18446744073709551616"
    pos = (f"((((({fnv})::HUGEINT * ({mix})[d + 1]) % {m64}) "
           f"+ ({add})[d + 1]) % {m64}) % {width}")
    return (
        f"WITH {pages_cte()}, "
        f"hosts AS (SELECT regexp_extract(url, '{anon}', 2) AS key "
        "FROM pages), "
        "k AS (SELECT key, count(*)::BIGINT AS c FROM hosts "
        "GROUP BY key), "
        f"hh AS (SELECT key, c, d, {pos} AS pos "
        f"FROM k CROSS JOIN range({depth}) t(d)), "
        "cells AS (SELECT d, pos, sum(c)::BIGINT AS cell FROM hh "
        "GROUP BY 1, 2) "
        "SELECT key, min(cell)::BIGINT AS c_est "
        "FROM hh JOIN cells USING (d, pos) GROUP BY key"
    )


def q_orders_gini(q: int = 10 ** 6) -> str:
    """Twin of quantiles.gini_exact over order cents (rank sums are
    tie-order invariant, so row_number ties don't matter)."""
    return (
        "WITH b AS (SELECT round(o_totalprice * 100)::BIGINT AS x "
        "FROM orders), "
        "r AS (SELECT x, row_number() OVER (ORDER BY x)::HUGEINT "
        "AS rn FROM b), "
        "s AS (SELECT count(*)::HUGEINT AS n, sum(x::HUGEINT) AS s, "
        "sum(rn * x) AS s1 FROM r) "
        "SELECT n::BIGINT AS n, s::BIGINT AS s_sum, "
        "s1::BIGINT AS s1_sum, "
        f"(({q} * (2 * s1 - (n + 1) * s)) // (n * s))::BIGINT "
        "AS gini_q FROM s"
    )


def q_price_wmedian() -> str:
    """Twin of the quantity-weighted exact median (expanded-rank
    two-middle convention; the threshold crossing inside a tie block
    picks that block's value, so ORDER BY c alone is sufficient)."""
    return (
        "WITH b AS (SELECT l_returnflag, "
        "round(l_extendedprice * 100)::BIGINT AS c, "
        "round(l_quantity)::BIGINT AS wt FROM lineitem), "
        "t AS (SELECT l_returnflag, sum(wt)::BIGINT AS w FROM b "
        "GROUP BY 1), "
        "cw AS (SELECT l_returnflag, c, sum(wt) OVER "
        "(PARTITION BY l_returnflag ORDER BY c "
        "ROWS UNBOUNDED PRECEDING)::BIGINT AS cw FROM b) "
        "SELECT cw.l_returnflag, max(t.w)::BIGINT AS w_total, "
        "(min(c) FILTER (WHERE cw > (t.w - 1) // 2) "
        "+ min(c) FILTER (WHERE cw > t.w // 2))::BIGINT "
        "AS wmedian_x2 "
        "FROM cw JOIN t USING (l_returnflag) GROUP BY 1"
    )


def q_orders_benford() -> str:
    """Twin of the Benford first-digit audit (decimal-string first
    char, shared per-mille constant table)."""
    from spapy_ray.pipelines.queries import BENFORD_MILLI

    lst = "[" + ", ".join(str(x) for x in BENFORD_MILLI) + "]"
    return (
        "WITH b AS (SELECT round(o_totalprice * 100)::BIGINT AS c "
        "FROM orders), "
        "d AS (SELECT substr(c::VARCHAR, 1, 1)::BIGINT AS digit "
        "FROM b WHERE c > 0), "
        "o AS (SELECT digit, count(*)::BIGINT AS n_obs FROM d "
        "GROUP BY digit), "
        "tot AS (SELECT sum(n_obs)::BIGINT AS n FROM o) "
        f"SELECT digit, n_obs, ({lst})[digit]::BIGINT AS exp_milli, "
        f"((1000 * n_obs) // n - ({lst})[digit])::BIGINT "
        "AS delta_milli FROM o, tot"
    )


def q_events_mwu() -> str:
    """Twin of relational.mann_whitney_u: per-tie-block midrank-
    doubled rank sums over the union, u2 = 2*sum(R_a) - na*(na+1)."""
    return (
        "WITH e AS (SELECT event_type, round(value * 100)::BIGINT "
        "AS v FROM events WHERE event_type IN ('view', 'purchase')), "
        "g AS (SELECT v, "
        "sum((event_type = 'view')::INT)::BIGINT AS ca, "
        "count(*)::BIGINT AS c FROM e GROUP BY v), "
        "r AS (SELECT v, ca, c, (sum(c) OVER (ORDER BY v "
        "ROWS UNBOUNDED PRECEDING) - c)::BIGINT AS cb FROM g), "
        "s AS (SELECT sum(ca * (2 * cb + c + 1))::HUGEINT AS r2, "
        "sum(ca)::HUGEINT AS na, sum(c - ca)::HUGEINT AS nb FROM r) "
        "SELECT na::BIGINT AS na, nb::BIGINT AS nb, "
        "(r2 - na * (na + 1))::BIGINT AS u2 FROM s"
    )


def q_docs_merge() -> str:
    """Twin of the CDC merge: versioned union, row_number keep-latest,
    delete filter, per-lang bit_xor of the row fingerprints."""
    fnv = sql_fnv1a("doc_id::VARCHAR || ':' || text")
    i64 = (f"(CASE WHEN {fnv} >= 9223372036854775808::UBIGINT "
           f"THEN ({fnv}::HUGEINT - 18446744073709551616::HUGEINT)"
           f"::BIGINT ELSE {fnv}::BIGINT END)")
    return (
        "WITH d AS (SELECT doc_id, text, lang FROM documents), "
        "a AS ("
        "SELECT doc_id, text, lang, 0 AS ver, 'U' AS op FROM d "
        "UNION ALL SELECT doc_id, text || ' v2', lang, 1, 'U' "
        "FROM d WHERE doc_id % 3 = 0 "
        "UNION ALL SELECT doc_id, '', lang, 2, 'D' "
        "FROM d WHERE doc_id % 7 = 0 "
        "UNION ALL SELECT doc_id, text || ' v3', lang, 3, 'U' "
        "FROM d WHERE doc_id % 9 = 0 "
        "UNION ALL SELECT doc_id + 1000000000, "
        "'new doc ' || doc_id::VARCHAR, lang, 1, 'U' "
        "FROM d WHERE doc_id % 11 = 0), "
        "last AS (SELECT *, row_number() OVER "
        "(PARTITION BY doc_id ORDER BY ver DESC) AS rn FROM a), "
        "m AS (SELECT doc_id, text, lang FROM last "
        "WHERE rn = 1 AND op = 'U') "
        f"SELECT lang, count(*)::BIGINT AS n_docs, "
        f"bit_xor({i64})::BIGINT AS fp FROM m GROUP BY lang"
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


def q_geohash_index(precision: int = 6) -> str:
    """Twin of kernels.cells.geohash_encode (p=6): same float
    quantization op order, arithmetic Morton interleave, unrolled
    base32 chars."""
    half = 5 * precision // 2
    gxe = (f"LEAST(GREATEST(floor((lon + 180.0) / 360.0 * "
           f"{float(1 << half)})::BIGINT, 0), {(1 << half) - 1})")
    gye = (f"LEAST(GREATEST(floor((lat + 90.0) / 180.0 * "
           f"{float(1 << half)})::BIGINT, 0), {(1 << half) - 1})")
    m = ("list_sum(list_transform(range(0, " + str(half) + "), jj -> "
         "(((gx >> jj) & 1) << (2 * jj + 1)) "
         "+ (((gy >> jj) & 1) << (2 * jj))))")
    ch = " || ".join(
        f"substr('0123456789bcdefghjkmnpqrstuvwxyz', "
        f"((m >> {5 * (precision - 1 - k)}) & 31)::INT + 1, 1)"
        for k in range(precision))
    return (
        f"WITH {geo_cte()}, "
        f"g AS (SELECT url, warc_ts, {gxe} AS gx, {gye} AS gy "
        "FROM geo), "
        f"mm AS (SELECT url, warc_ts, {m} AS m FROM g) "
        f"SELECT url, warc_ts, {ch} AS gh FROM mm"
    )


def q_corpus_overlap(q: int = 10 ** 6) -> str:
    """Twin of the EN/ES histogram intersection."""
    return (
        "WITH w AS (SELECT lang, unnest(string_split(text, ' ')) "
        "AS token FROM documents WHERE lang IN ('en', 'es')), "
        "c AS (SELECT token, "
        "sum((lang = 'en')::INT)::BIGINT AS ca, "
        "sum((lang = 'es')::INT)::BIGINT AS cb FROM w "
        "GROUP BY token), "
        "t AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb "
        "FROM c), "
        "s AS (SELECT sum(LEAST(ca * t.nb, cb * t.na))::BIGINT "
        "AS inter FROM c, t) "
        "SELECT t.na, t.nb, s.inter AS inter_num, "
        f"(({q} * s.inter) // (t.na * t.nb))::BIGINT AS overlap_q "
        "FROM t, s"
    )


def q_events_spearman(q: int = 10 ** 6) -> str:
    """Twin of relational.grouped_spearman: doubled midranks
    (2*rank() + peer_count - 1), HUGEINT moments, signed-square."""
    return (
        "WITH e AS (SELECT event_type, epoch_us(ts) AS us, "
        "round(value * 100)::BIGINT AS c FROM events), "
        "r AS (SELECT event_type, "
        "2 * rank() OVER (PARTITION BY event_type ORDER BY us) "
        "+ count(*) OVER (PARTITION BY event_type, us) - 1 AS rx, "
        "2 * rank() OVER (PARTITION BY event_type ORDER BY c) "
        "+ count(*) OVER (PARTITION BY event_type, c) - 1 AS ry "
        "FROM e), "
        "s AS (SELECT event_type, count(*)::HUGEINT AS n, "
        "sum(rx::HUGEINT) AS sx, sum(ry::HUGEINT) AS sy, "
        "sum(rx::HUGEINT * ry) AS sxy, "
        "sum(rx::HUGEINT * rx) AS sxx, "
        "sum(ry::HUGEINT * ry) AS syy FROM r GROUP BY 1) "
        "SELECT event_type, n::BIGINT AS n, "
        "((CASE WHEN n * sxy - sx * sy >= 0 THEN 1 ELSE -1 END) "
        f"* (({q}::HUGEINT * (n * sxy - sx * sy) "
        "* (n * sxy - sx * sy)) // ((n * sxx - sx * sx) "
        "* (n * syy - sy * sy))))::BIGINT AS rho2_q FROM s"
    )


def q_docs_shuffle_order(seed: str = "epoch1") -> str:
    """Twin of the deterministic epoch shuffle: row_number over the
    unsigned FNV order (ties broken by doc_id; UBIGINT sorts
    unsigned exactly like the engine's uint64 lexsort)."""
    fnv = sql_fnv1a(f"'{seed}:' || doc_id::VARCHAR")
    return (
        f"WITH h AS (SELECT doc_id, {fnv} AS hh FROM documents) "
        "SELECT doc_id, (row_number() OVER "
        "(ORDER BY hh, doc_id) - 1)::BIGINT AS pos FROM h"
    )


def q_priority_gini(q: int = 10 ** 6) -> str:
    """Twin of quantiles.grouped_gini per order priority."""
    return (
        "WITH b AS (SELECT o_orderpriority AS k, "
        "round(o_totalprice * 100)::BIGINT AS x FROM orders), "
        "r AS (SELECT k, x, row_number() OVER "
        "(PARTITION BY k ORDER BY x)::HUGEINT AS rn FROM b), "
        "s AS (SELECT k, count(*)::HUGEINT AS n, "
        "sum(x::HUGEINT) AS s, sum(rn * x) AS s1 FROM r GROUP BY k) "
        "SELECT k AS o_orderpriority, n::BIGINT AS n, "
        "s::BIGINT AS s_sum, "
        f"(({q} * (2 * s1 - (n + 1) * s)) // (n * s))::BIGINT "
        "AS gini_q FROM s"
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


def q_events_late(allowed_us: int = 300_000_000,
                  bucket_us: int = 3_600_000_000) -> str:
    """Twin of sessions.late_event_counts: exclusive running max
    over arrival order, strict lateness beyond the allowance."""
    return (
        "WITH e AS (SELECT event_id, epoch_us(ts) AS us FROM events), "
        "w AS (SELECT us, max(us) OVER (ORDER BY event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm "
        "FROM e) "
        f"SELECT (us // {bucket_us})::BIGINT AS bucket, "
        "count(*)::BIGINT AS n_events, "
        f"sum((wm IS NOT NULL AND wm - us > {allowed_us})::INT)"
        "::BIGINT AS n_late FROM w GROUP BY 1"
    )


def q_quality_gate() -> str:
    """Twin of the data-contract gate."""
    return (
        "SELECT 'fk_orphan_lineitems' AS check, (SELECT count(*) "
        "FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o "
        "WHERE o.o_orderkey = l.l_orderkey))::BIGINT AS n "
        "UNION ALL SELECT 'dup_order_keys', (SELECT count(*) FROM "
        "(SELECT o_orderkey FROM orders GROUP BY o_orderkey "
        "HAVING count(*) > 1))::BIGINT "
        "UNION ALL SELECT 'lineitem_rows', "
        "(SELECT count(*) FROM lineitem)::BIGINT"
    )


def q_k_anonymity(k: int = 5) -> str:
    """Twin of the k-anonymity audit."""
    return (
        "WITH c AS (SELECT lang, source, count(*)::BIGINT AS n "
        "FROM documents GROUP BY 1, 2) "
        f"SELECT {k}::BIGINT AS k_threshold, "
        "count(*)::BIGINT AS n_classes, "
        "min(n)::BIGINT AS min_class, "
        f"coalesce(sum(n) FILTER (WHERE n < {k}), 0)::BIGINT "
        "AS n_rows_below_k FROM c"
    )


def q_lang_confusion() -> str:
    """Twin of the language-ID confusion matrix (reuses the guess
    CASE from q_docs_lang_guess)."""
    inner = q_docs_lang_guess()
    return (
        f"WITH g AS ({inner}) "
        "SELECT d.lang, g.lang_guess, count(*)::BIGINT AS n "
        "FROM documents d JOIN g USING (doc_id) GROUP BY 1, 2"
    )


def q_trending_domains(k: int = 3) -> str:
    """Twin of the per-day top-k hosts (count desc, host asc)."""
    import re

    from spapy_ray.stages.text import URL_PATTERN

    anon = re.sub(r"\?P<[a-z]+>", "", URL_PATTERN)
    return (
        f"WITH {pages_cte()}, "
        "d AS (SELECT epoch_us(warc_ts) // 86400000000 AS day, "
        f"regexp_extract(url, '{anon}', 2) AS host FROM pages), "
        "c AS (SELECT day, host, count(*)::BIGINT AS n FROM d "
        "GROUP BY 1, 2), "
        "r AS (SELECT day, host, n, row_number() OVER "
        "(PARTITION BY day ORDER BY n DESC, host)::BIGINT AS rank "
        "FROM c) "
        f"SELECT day::BIGINT AS day, host, n, rank FROM r "
        f"WHERE rank <= {k}"
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


def q_events_rolling_slope(w: int = 8, q: int = 10 ** 6) -> str:
    """Twin of the rolling OLS slope: framed windowed sums over the
    per-user index, HUGEINT closed form, trunc toward zero (den = 0
    for single-row windows -> slope 0)."""
    frame = f"ROWS {w - 1} PRECEDING"
    return (
        "WITH e AS (SELECT event_id, ts, user_id, "
        "round(value * 100)::BIGINT AS c FROM events), "
        "r AS (SELECT *, row_number() OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id)::BIGINT "
        "AS rn FROM e), "
        "s AS (SELECT user_id, event_id, "
        f"count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        f"{frame})::HUGEINT AS n, "
        f"sum(rn) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        f"{frame})::HUGEINT AS sx, "
        f"sum(c) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        f"{frame})::HUGEINT AS sy, "
        f"sum(rn * c) OVER (PARTITION BY user_id ORDER BY ts, "
        f"event_id {frame})::HUGEINT AS sxy, "
        f"sum(rn * rn) OVER (PARTITION BY user_id ORDER BY ts, "
        f"event_id {frame})::HUGEINT AS sxx FROM r) "
        "SELECT user_id, event_id, n::BIGINT AS n_w, "
        "(CASE WHEN n * sxx - sx * sx = 0 THEN 0 ELSE "
        f"({q}::HUGEINT * (n * sxy - sx * sy)) "
        "// (n * sxx - sx * sx) END)::BIGINT AS slope_q FROM s"
    )


def q_label_separation(scale: int = 1_000_000,
                       q: int = 10 ** 6) -> str:
    """Twin of the centroid-separation matrix (same quantization as
    q_label_centroids; HUGEINT multiplied-out rational distance)."""
    return (
        "WITH e AS (SELECT label, "
        "(generate_subscripts(embedding, 1) - 1)::BIGINT AS dim, "
        f"CAST(floor(unnest(embedding)::DOUBLE * {scale} + 0.5) "
        "AS BIGINT) AS qv FROM embeddings), "
        "s AS (SELECT label, dim, sum(qv)::HUGEINT AS sq, "
        "count(*)::HUGEINT AS n FROM e GROUP BY 1, 2), "
        "p AS (SELECT a.label AS la, b.label AS lb, "
        "max(a.n) AS n1, max(b.n) AS n2, "
        "sum((a.sq * b.n - b.sq * a.n) "
        "* (a.sq * b.n - b.sq * a.n)) AS num "
        "FROM s a JOIN s b ON a.dim = b.dim AND a.label < b.label "
        "GROUP BY 1, 2) "
        "SELECT la::BIGINT AS la, lb::BIGINT AS lb, "
        "n1::BIGINT AS n1, n2::BIGINT AS n2, "
        f"(({q}::HUGEINT * num) // ((n1 * n2 * {scale}) "
        f"* (n1 * n2 * {scale})))::BIGINT AS d2_q FROM p"
    )


def q_cell_smoothing() -> str:
    """Twin of the sparse focal sum over the occupancy grid."""
    return (
        f"WITH {geo_cte()}, "
        "pts AS (SELECT floor(lon + 180.0)::BIGINT AS gx, "
        "floor(lat + 85.0)::BIGINT AS gy FROM geo), "
        "c AS (SELECT gy * 360 + gx AS cell, gx, gy, "
        "count(*)::BIGINT AS c FROM pts "
        "WHERE gx BETWEEN 0 AND 359 AND gy BETWEEN 0 AND 169 "
        "GROUP BY 1, 2, 3), "
        "o AS (SELECT p % 3 - 1 AS dx, p // 3 - 1 AS dy "
        "FROM range(9) t(p)), "
        "sm AS (SELECT (c.gy + o.dy) * 360 + (c.gx + o.dx) AS cell, "
        "sum(c.c)::BIGINT AS sm FROM c CROSS JOIN o "
        "WHERE c.gx + o.dx BETWEEN 0 AND 359 "
        "AND c.gy + o.dy BETWEEN 0 AND 169 GROUP BY 1) "
        "SELECT c.cell::BIGINT AS cell, c.c AS n_pages, "
        "sm.sm AS n_smooth FROM c JOIN sm USING (cell)"
    )


def q_orders_mom_growth() -> str:
    """Twin of the month-over-month growth (epoch-month arithmetic
    matches numpy datetime64[M]: months since 1970-01)."""
    return (
        "WITH m AS (SELECT (date_part('year', o_orderdate) - 1970) "
        "* 12 + date_part('month', o_orderdate) - 1 AS month, "
        "count(*)::BIGINT AS c FROM orders GROUP BY 1), "
        "g AS (SELECT month::BIGINT AS month, c, "
        "lag(c) OVER (ORDER BY month) AS p FROM m) "
        "SELECT month, c, (CASE WHEN p IS NULL OR p = 0 THEN 0 "
        "ELSE (1000 * (c - p)) // p END)::BIGINT AS growth_pm "
        "FROM g"
    )


def q_user_survival() -> str:
    """Twin of the survival counts (window suffix sum)."""
    return (
        "WITH l AS (SELECT user_id, (epoch_us(max(ts)) "
        "- epoch_us(min(ts))) // 86400000000 AS k FROM events "
        "GROUP BY user_id), "
        "h AS (SELECT k::BIGINT AS day_k, count(*)::BIGINT "
        "AS n_lifetime FROM l GROUP BY k) "
        "SELECT day_k, n_lifetime, sum(n_lifetime) OVER "
        "(ORDER BY day_k DESC ROWS UNBOUNDED PRECEDING)::BIGINT "
        "AS n_surviving FROM h"
    )


def q_cust_components() -> str:
    """Twin of the (day, priority) co-order component histogram —
    recursive reach closure, min-reachable representative."""
    return (
        "WITH RECURSIVE e0 AS (SELECT DISTINCT a.o_custkey AS u, "
        "b.o_custkey AS v FROM orders a JOIN orders b "
        "ON a.o_orderdate = b.o_orderdate "
        "AND a.o_orderpriority = b.o_orderpriority "
        "AND a.o_custkey < b.o_custkey), "
        "e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0), "
        "reach(n, r) AS (SELECT u, u FROM e UNION "
        "SELECT e.u, reach.r FROM e JOIN reach ON reach.n = e.v), "
        "comp AS (SELECT n, min(r) AS rep FROM reach GROUP BY n), "
        "sz AS (SELECT rep, count(*)::BIGINT AS size FROM comp "
        "GROUP BY rep) "
        "SELECT size, count(*)::BIGINT AS n_components FROM sz "
        "GROUP BY size"
    )


def q_events_zscore_outliers(k: int = 3) -> str:
    """Twin of the squared-form z-score gate (no sqrt; HUGEINT)."""
    return (
        "WITH e AS (SELECT event_type, "
        "round(value * 100)::HUGEINT AS c FROM events), "
        "m AS (SELECT event_type, count(*)::HUGEINT AS n, "
        "sum(c) AS s, sum(c * c) AS ss FROM e GROUP BY 1) "
        "SELECT e.event_type, max(m.n)::BIGINT AS n, "
        "sum(((m.n * e.c - m.s) * (m.n * e.c - m.s) > "
        f"{k * k} * (m.n * m.ss - m.s * m.s))::INT)::BIGINT "
        "AS n_outliers "
        "FROM e JOIN m USING (event_type) GROUP BY e.event_type"
    )


def q_vector_tiles() -> str:
    """Twin of the vector tile cutter: the areal_interp rect
    decomposition against the 10x5 tile grid."""
    def rect(n: int) -> str:
        if n == 1:
            return ("SELECT zone_id, x0 AS a0, y0 AS b0, "
                    "x0 + (CASE WHEN shape = 3 THEN w2 ELSE w END) "
                    "AS a1, y0 + (CASE WHEN shape IN (0, 1) THEN h "
                    "ELSE h2 END) AS b1 FROM z")
        return ("SELECT zone_id, "
                "x0 + (CASE WHEN shape = 2 THEN 0 ELSE w2 + 5000 "
                "END) AS a0, y0 + h2 + (CASE WHEN shape = 2 THEN 0 "
                "ELSE 5000 END) AS b0, "
                "x0 + (CASE WHEN shape = 2 THEN w2 ELSE w END) "
                "AS a1, y0 + h AS b1 FROM z WHERE shape IN (2, 3)")

    return (
        f"WITH z AS ({sql_zones_cte()}), "
        f"rects AS ({rect(1)} UNION ALL {rect(2)}), "
        "tiles AS (SELECT p::BIGINT AS tile, "
        "-1800000 + (p % 10) * 360000 AS cx0, "
        "-850000 + (p // 10) * 340000 AS cy0 FROM range(50) t(p)), "
        "iz AS (SELECT tile, r.zone_id, "
        "sum(greatest(0, least(a1, cx0 + 360000) - greatest(a0, cx0)) "
        "* greatest(0, least(b1, cy0 + 340000) - greatest(b0, cy0)))"
        "::BIGINT AS area_u FROM tiles, rects r "
        "WHERE a0 < cx0 + 360000 AND a1 > cx0 "
        "AND b0 < cy0 + 340000 AND b1 > cy0 GROUP BY 1, 2) "
        "SELECT tile, zone_id, area_u FROM iz WHERE area_u > 0"
    )


def q_cust_kcore(k: int = 2, rounds: int = 12) -> str:
    """Twin of graph.k_core on the (day, priority) co-order graph:
    ``rounds`` unrolled peel iterations (degree over survivors →
    keep deg >= k). The peel is monotone, so any rounds >= the
    convergence count yields the fixpoint (9 rounds at sf0.001,
    2 at sf0.01; 12 for margin). Every CTE is MATERIALIZED — the
    stream_order lesson: without the hint DuckDB re-inlines each
    round into every consumer and the chain re-evaluates
    exponentially."""
    parts = [
        "WITH e0 AS MATERIALIZED (SELECT DISTINCT a.o_custkey AS u, "
        "b.o_custkey AS v FROM orders a JOIN orders b "
        "ON a.o_orderdate = b.o_orderdate "
        "AND a.o_orderpriority = b.o_orderpriority "
        "AND a.o_custkey < b.o_custkey)",
        "e AS MATERIALIZED (SELECT u, v FROM e0 "
        "UNION ALL SELECT v, u FROM e0)",
        "a0 AS MATERIALIZED (SELECT DISTINCT u AS n FROM e)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT e.u AS n, "
            f"count(*)::BIGINT AS deg FROM e "
            f"JOIN a{i - 1} x ON e.u = x.n "
            f"JOIN a{i - 1} y ON e.v = y.n GROUP BY e.u)")
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT n FROM d{i} "
            f"WHERE deg >= {k})")
    return (", ".join(parts)
            + f" SELECT n AS custkey, deg AS core_deg FROM d{rounds} "
            f"WHERE deg >= {k}")


def q_cust_reach(max_hops: int = 4) -> str:
    """Twin of graph.bfs_hops: bounded recursive reach from the
    nation-0 customer seed set (UNION dedups (n, d) states; d is
    capped, so recursion terminates on the cyclic graph), then
    min(d) per vertex = BFS hop distance."""
    return (
        "WITH RECURSIVE e0 AS (SELECT DISTINCT a.o_custkey AS u, "
        "b.o_custkey AS v FROM orders a JOIN orders b "
        "ON a.o_orderdate = b.o_orderdate "
        "AND a.o_custkey < b.o_custkey), "
        "e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0), "
        "reach(n, d) AS (SELECT c_custkey, 0 FROM customer "
        "WHERE c_nationkey = 0 "
        "UNION SELECT e.v, reach.d + 1 FROM e "
        f"JOIN reach ON e.u = reach.n WHERE reach.d < {max_hops}) "
        "SELECT n AS custkey, min(d)::BIGINT AS hops "
        "FROM reach GROUP BY n"
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


def q_events_hll(p: int = 10) -> str:
    """Twin of relational.hll_registers over event_id: identical
    < 2^40-multiplier mix (HUGEINT products < 2^104), rho via
    lpad(bin(rest)) first-'1' position, registers maxed per bucket,
    harmonic estimate as one HUGEINT ratio."""
    from spapy_ray.stages.relational import HLL_MIX_A, HLL_MIX_B

    m = 1 << p
    rb = 64 - p
    m64 = "18446744073709551616"
    return (
        "WITH x AS (SELECT event_id::UBIGINT AS v FROM events), "
        f"h1 AS (SELECT ((xor(v, v >> 33)::HUGEINT * {HLL_MIX_A}"
        f"::HUGEINT) % {m64})::UBIGINT AS h FROM x), "
        f"h2 AS (SELECT ((xor(h, h >> 29)::HUGEINT * {HLL_MIX_B}"
        f"::HUGEINT) % {m64})::UBIGINT AS h FROM h1), "
        "hf AS (SELECT xor(h, h >> 32) AS h FROM h2), "
        f"r AS (SELECT (h >> {rb})::BIGINT AS reg, "
        f"CASE WHEN (h % (1::UBIGINT << {rb})) = 0 THEN {rb + 1} "
        f"ELSE strpos(lpad(bin(h % (1::UBIGINT << {rb})), {rb}, "
        "'0'), '1') END::BIGINT AS rho FROM hf), "
        "mx AS (SELECT reg, max(rho) AS rho FROM r GROUP BY reg), "
        f"allr AS (SELECT p::BIGINT AS reg FROM range({m}) t(p)), "
        "j AS (SELECT allr.reg, coalesce(mx.rho, 0)::BIGINT AS rho "
        "FROM allr LEFT JOIN mx USING (reg)), "
        f"d AS (SELECT sum(1::HUGEINT << ({rb + 1} - rho)) AS den "
        "FROM j) "
        f"SELECT j.reg, j.rho, (({m * m}::HUGEINT << {rb + 1}) "
        "// d.den)::BIGINT AS est_q FROM j, d"
    )


def q_local_supplier_revenue() -> str:
    """Twin of the TPC-H-Q5-shaped join chain: same integer
    cents x (100 - discount_pct) revenue (round() half-away == np.rint
    half-even here — 2-dp money x100 has no .5 ties)."""
    return (
        "SELECT n_name, sum(round(l_extendedprice * 100)::BIGINT * "
        "(100 - round(l_discount * 100)::BIGINT))::BIGINT "
        "AS revenue_u "
        "FROM customer, orders, lineitem, supplier, nation, region "
        "WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey "
        "AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
        "AND s_nationkey = n_nationkey "
        "AND n_regionkey = r_regionkey AND r_name = 'ASIA' "
        "AND o_orderdate >= TIMESTAMP '1996-01-01' "
        "AND o_orderdate < TIMESTAMP '1997-01-01' "
        "GROUP BY n_name"
    )


def q_ripley_pairs() -> str:
    """Twin of distjoin.pair_distance_histogram: IEJoin band at the
    max radius, exact integer circle predicate, per-radius ordered
    pair counts excluding self (row identity = (url, warc_ts))."""
    r5s = [10000, 25000, 50000]
    rmax = r5s[-1]
    return (
        f"WITH {geo_cte()}, "
        "pts AS (SELECT url, warc_ts, "
        "CAST(round(lat * 100000.0) AS BIGINT) AS lat5, "
        "CAST(round(lon * 100000.0) AS BIGINT) AS lon5 FROM geo), "
        "pairs AS (SELECT (a.lat5 - b.lat5) * (a.lat5 - b.lat5) "
        "+ (a.lon5 - b.lon5) * (a.lon5 - b.lon5) AS d2 "
        "FROM pts a JOIN pts b "
        f"ON b.lat5 BETWEEN a.lat5 - {rmax} AND a.lat5 + {rmax} "
        "AND (a.lat5 - b.lat5) * (a.lat5 - b.lat5) "
        "+ (a.lon5 - b.lon5) * (a.lon5 - b.lon5) "
        f"<= {rmax * rmax}::BIGINT "
        "AND NOT (a.url = b.url AND a.warc_ts = b.warc_ts)), "
        f"rad AS (SELECT unnest({r5s}) AS r5) "
        "SELECT rad.r5::BIGINT AS r5, "
        "sum((pairs.d2 <= rad.r5::BIGINT * rad.r5)::INT)::BIGINT "
        "AS n_pairs FROM pairs, rad GROUP BY rad.r5"
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


def q_media_chunks(chunk: int = 256) -> str:
    """Twin of the payload chunker: generate_series chunk ordinals
    ((ln + 255) // 256 - 1 as the hi bound — DuckDB // truncates, so
    the naive (ln-1)//256 would emit a ghost chunk for empty
    payloads), substr pieces, same FNV mod signature."""
    fnv = sql_fnv1a("piece")
    return (
        f"WITH {pages_cte()}, "
        "d AS (SELECT url, warc_ts, html, length(html) AS ln "
        "FROM pages), "
        "c AS (SELECT url, warc_ts, html, "
        f"unnest(generate_series(0, (ln + {chunk - 1}) // {chunk} "
        "- 1)) AS chunk_id FROM d), "
        "s AS (SELECT url, warc_ts, chunk_id, "
        f"substr(html, chunk_id * {chunk} + 1, {chunk}) AS piece "
        "FROM c) "
        "SELECT url, warc_ts, chunk_id::BIGINT AS chunk_id, "
        "length(piece)::BIGINT AS n_bytes, "
        f"(({fnv}) % 1000000007)::BIGINT AS sig FROM s"
    )


def q_zone_compactness() -> str:
    """Twin of the zone compactness audit: closed-form perimeter per
    shape family (rect and L-ring both 2(w+h); the disjoint pair sums
    both rects), closed-form area, integer quotient."""
    from spapy_ray.sources.zones import sql_zones_cte

    perim = ("(CASE WHEN shape IN (0, 1, 2) THEN 2 * (w + h) "
             "ELSE 2 * (w2 + h2) "
             "+ 2 * ((w - w2 - 5000) + (h - h2 - 5000)) END)")
    area = ("(CASE WHEN shape IN (0, 1) THEN w * h "
            "WHEN shape = 2 THEN w * h2 + w2 * (h - h2) "
            "ELSE w2 * h2 + (w - w2 - 5000) * (h - h2 - 5000) END)")
    return (
        f"WITH zones AS ({sql_zones_cte()}) "
        "SELECT zone_id, "
        f"{perim}::BIGINT AS perim_u, {area}::BIGINT AS area_u2, "
        f"(1000000 * ({area})::BIGINT) // (({perim})::BIGINT "
        f"* ({perim})::BIGINT) AS compact_q FROM zones"
    )


def q_open_orders() -> str:
    """Twin of the backlog curve: endpoint deltas netted per instant,
    one global ordered window sum, per-month max at change points.
    ym = months since epoch (integer calendar)."""
    return (
        "WITH mx AS (SELECT l_orderkey, max(l_shipdate) AS cl "
        "FROM lineitem GROUP BY 1), "
        "iv AS (SELECT epoch_us(o_orderdate) AS o, "
        "epoch_us(cl) + 86400000000 AS c FROM orders "
        "JOIN mx ON o_orderkey = l_orderkey), "
        "ev AS (SELECT o AS t, 1 AS d FROM iv "
        "UNION ALL SELECT c, -1 FROM iv), "
        "net AS (SELECT t, sum(d)::BIGINT AS d FROM ev GROUP BY t), "
        "run AS (SELECT t, (sum(d) OVER (ORDER BY t "
        "ROWS UNBOUNDED PRECEDING))::BIGINT AS open FROM net), "
        "m AS (SELECT (year(make_timestamp(t)) - 1970) * 12 "
        "+ month(make_timestamp(t)) - 1 AS ym, open FROM run) "
        "SELECT ym::BIGINT AS ym, max(open)::BIGINT AS max_open "
        "FROM m GROUP BY ym"
    )


def q_events_ntile(tiles: int = 4) -> str:
    """Twin of the even-split value quartiles: same
    ((rn-1)*t)//n + 1 formula over the (cents, event_id) order."""
    return (
        "WITH e AS (SELECT event_type, event_id, "
        "round(value * 100)::BIGINT AS c FROM events), "
        "w AS (SELECT event_type, c, row_number() OVER "
        "(PARTITION BY event_type ORDER BY c, event_id) AS rn, "
        "count(*) OVER (PARTITION BY event_type) AS n FROM e), "
        f"t AS (SELECT event_type, ((rn - 1) * {tiles}) // n + 1 "
        "AS tile, c FROM w) "
        "SELECT event_type, tile::BIGINT AS tile, "
        "count(*)::BIGINT AS n_rows, sum(c)::BIGINT AS sum_cents "
        "FROM t GROUP BY 1, 2"
    )


def q_hilbert_index(order: int = 16) -> str:
    """Twin of kernels.cells.hilbert_d over the geocoded pages: the
    same float quantization op order as xy_for, then the 16-round
    MATERIALIZED quadrant-rotate chain (sql_hilbert_chain)."""
    from spapy_ray.kernels.cells import sql_hilbert_chain

    n = 1 << order
    gx = (f"LEAST(GREATEST(floor((lon + 180.0) / 360.0 * "
          f"{float(n)})::BIGINT, 0), {n - 1})")
    gy = (f"LEAST(GREATEST(floor((lat + 90.0) / 180.0 * "
          f"{float(n)})::BIGINT, 0), {n - 1})")
    chain = sql_hilbert_chain(gx, gy, order, "geo", "url, warc_ts")
    return (f"WITH {geo_cte()}, {chain} "
            "SELECT url, warc_ts, hkey FROM hil")


def q_quadtree_leaves(max_res: int = 8, cap: int = 512) -> str:
    """Twin of partition.quadtree_leaves: per-resolution ancestor
    counts via window COUNT over shifted coords, leaf res = the
    shallowest fitting resolution (ordered CASE chain)."""
    n = 1 << max_res
    gx = (f"LEAST(GREATEST(floor((lon + 180.0) / 360.0 * "
          f"{float(n)})::BIGINT, 0), {n - 1})")
    gy = (f"LEAST(GREATEST(floor((lat + 90.0) / 180.0 * "
          f"{float(n)})::BIGINT, 0), {n - 1})")
    ccols = ", ".join(
        f"count(*) OVER (PARTITION BY gx >> {max_res - r}, "
        f"gy >> {max_res - r})::BIGINT AS c{r}"
        for r in range(max_res + 1))
    case = ("CASE " + " ".join(
        f"WHEN c{r} <= {cap} THEN {r}" for r in range(max_res + 1))
        + f" ELSE {max_res} END")
    return (
        f"WITH {geo_cte()}, "
        f"g AS (SELECT {gx} AS gx, {gy} AS gy FROM geo), "
        f"cc AS (SELECT gx, gy, {ccols} FROM g), "
        f"lf AS (SELECT ({case}) AS res, gx, gy FROM cc) "
        f"SELECT res::BIGINT AS res, (gx >> ({max_res} - res))"
        f"::BIGINT AS cx, (gy >> ({max_res} - res))::BIGINT AS cy, "
        "count(*)::BIGINT AS n_points FROM lf GROUP BY 1, 2, 3"
    )


def q_value_emd() -> str:
    """Twin of the exact EMD numerator: cumulative cross products
    times forward value gaps, HUGEINT sum, split into 2^62 limbs."""
    lim = 1 << 62
    return (
        "WITH x AS (SELECT trunc(value * 100)::BIGINT AS v, "
        "CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS isa "
        "FROM events WHERE event_type IN ('click', 'view')), "
        "t AS (SELECT v, sum(isa)::BIGINT AS ca, "
        "sum(1 - isa)::BIGINT AS cb FROM x GROUP BY v), "
        "c AS (SELECT v, sum(ca) OVER (ORDER BY v "
        "ROWS UNBOUNDED PRECEDING)::HUGEINT AS cca, "
        "sum(cb) OVER (ORDER BY v "
        "ROWS UNBOUNDED PRECEDING)::HUGEINT AS ccb, "
        "lead(v) OVER (ORDER BY v) AS nv FROM t), "
        "n AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb "
        "FROM t), "
        "e AS (SELECT coalesce(sum(abs(cca * nb - ccb * na) "
        "* (nv - v)::HUGEINT) FILTER (WHERE nv IS NOT NULL), 0) "
        "AS emd FROM c, n) "
        "SELECT na, nb, "
        f"(emd // {lim})::BIGINT AS emd_hi, "
        f"(emd % {lim})::BIGINT AS emd_lo FROM e, n"
    )


def q_cross_ripley() -> str:
    """Twin of the bivariate pair histogram: IEJoin band between the
    two geo_src classes at the max radius, per-radius counts."""
    r5s = [10000, 25000, 50000]
    rmax = r5s[-1]
    return (
        f"WITH {geo_cte()}, "
        "pts AS (SELECT geo_src, "
        "CAST(round(lat * 100000.0) AS BIGINT) AS lat5, "
        "CAST(round(lon * 100000.0) AS BIGINT) AS lon5 FROM geo), "
        "pairs AS (SELECT (a.lat5 - b.lat5) * (a.lat5 - b.lat5) "
        "+ (a.lon5 - b.lon5) * (a.lon5 - b.lon5) AS d2 "
        "FROM pts a JOIN pts b "
        "ON a.geo_src = 'text' AND b.geo_src = 'url' "
        f"AND b.lat5 BETWEEN a.lat5 - {rmax} AND a.lat5 + {rmax} "
        "AND (a.lat5 - b.lat5) * (a.lat5 - b.lat5) "
        "+ (a.lon5 - b.lon5) * (a.lon5 - b.lon5) "
        f"<= {rmax * rmax}::BIGINT), "
        f"rad AS (SELECT unnest({r5s}) AS r5) "
        "SELECT rad.r5::BIGINT AS r5, "
        "sum((pairs.d2 <= rad.r5::BIGINT * rad.r5)::INT)::BIGINT "
        "AS n_pairs FROM pairs, rad GROUP BY rad.r5"
    )


def q_forecast_revenue() -> str:
    """Twin of the TPC-H-Q6-shaped filtered fold: same integer
    cents x discount_pct revenue."""
    return (
        "SELECT sum(round(l_extendedprice * 100)::BIGINT "
        "* round(l_discount * 100)::BIGINT)::BIGINT AS revenue_u, "
        "count(*)::BIGINT AS n_rows FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1997-01-01' "
        "AND l_discount BETWEEN 0.05 AND 0.07 "
        "AND l_quantity < 24"
    )


def q_events_cusum(target: int = 5000, threshold: int = 200_000) -> str:
    """Twin of the CUSUM scan: prefix sum minus clamped running
    minimum, per event type in event_id order."""
    return (
        "WITH e AS (SELECT event_type, event_id, "
        f"round(value * 100)::BIGINT - {target} AS x FROM events), "
        "p AS (SELECT event_type, event_id, sum(x) OVER "
        "(PARTITION BY event_type ORDER BY event_id "
        "ROWS UNBOUNDED PRECEDING)::BIGINT AS pf FROM e), "
        "m AS (SELECT event_type, pf, least(0, min(pf) OVER "
        "(PARTITION BY event_type ORDER BY event_id "
        "ROWS UNBOUNDED PRECEDING))::BIGINT AS mn FROM p), "
        "s AS (SELECT event_type, pf - mn AS s FROM m) "
        f"SELECT event_type, sum((s > {threshold})::INT)::BIGINT "
        "AS n_alarms, max(s)::BIGINT AS max_s FROM s "
        "GROUP BY event_type"
    )


def q_url_bloom(m_bits: int = 1 << 20, depth: int = 4) -> str:
    """Twin of relational.bloom_bits over page urls: same fnv + mix
    positions, per-word bit_or on UBIGINT, 32-bit halves (a set bit
    63 does not survive a BIGINT cast)."""
    from spapy_ray.stages.relational import CM_ADD, CM_MIX

    fnv = sql_fnv1a("url")
    mix = "[" + ", ".join(f"{m}::HUGEINT" for m in CM_MIX) + "]"
    add = "[" + ", ".join(str(a) for a in CM_ADD) + "]"
    m64 = "18446744073709551616"
    pos = (f"(((((f)::HUGEINT * ({mix})[d + 1]) % {m64}) "
           f"+ ({add})[d + 1]) % {m64}) % {m_bits}")
    return (
        f"WITH {pages_cte()}, "
        "k AS (SELECT DISTINCT url FROM pages), "
        f"fv AS (SELECT {fnv} AS f FROM k), "
        f"p AS (SELECT ({pos})::BIGINT AS pos FROM fv "
        f"CROSS JOIN range({depth}) t(d)), "
        "w AS (SELECT pos // 64 AS word, "
        "bit_or(1::UBIGINT << (pos % 64)::INT) AS bits "
        "FROM p GROUP BY 1) "
        "SELECT word::BIGINT AS word, "
        "(bits >> 32)::BIGINT AS hi, "
        "(bits & 4294967295::UBIGINT)::BIGINT AS lo FROM w"
    )


def q_orders_rfm() -> str:
    """Twin of the RFM census: quantile_disc value thresholds per
    metric, 1 + count(thresholds strictly below)."""
    def tile(col, pre):
        return ("(1 + (" + " + ".join(
            f"({col} > {pre}{i})::INT" for i in (1, 2, 3)) + "))")

    return (
        "WITH c AS (SELECT o_custkey, "
        "epoch_us(max(o_orderdate)) // 86400000000 AS r_days, "
        "count(*)::BIGINT AS f, "
        "sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS m "
        "FROM orders GROUP BY 1), "
        "q AS (SELECT "
        "quantile_disc(r_days, 0.25) AS r1, "
        "quantile_disc(r_days, 0.5) AS r2, "
        "quantile_disc(r_days, 0.75) AS r3, "
        "quantile_disc(f, 0.25) AS f1, quantile_disc(f, 0.5) AS f2, "
        "quantile_disc(f, 0.75) AS f3, "
        "quantile_disc(m, 0.25) AS m1, quantile_disc(m, 0.5) AS m2, "
        "quantile_disc(m, 0.75) AS m3 FROM c) "
        f"SELECT {tile('r_days', 'r')}::BIGINT AS r_tile, "
        f"{tile('f', 'f')}::BIGINT AS f_tile, "
        f"{tile('m', 'm')}::BIGINT AS m_tile, "
        "count(*)::BIGINT AS n_customers FROM c, q "
        "GROUP BY 1, 2, 3"
    )


def q_orders_pareto() -> str:
    """Twin of the Pareto decile audit: row_number over (spend,
    custkey), even-split decile formula."""
    return (
        "WITH c AS (SELECT o_custkey, "
        "sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS m "
        "FROM orders GROUP BY 1), "
        "w AS (SELECT m, row_number() OVER (ORDER BY m, o_custkey) "
        "AS rn, count(*) OVER () AS n FROM c) "
        "SELECT (((rn - 1) * 10) // n + 1)::BIGINT AS decile, "
        "count(*)::BIGINT AS n_customers, "
        "sum(m)::BIGINT AS revenue_u FROM w GROUP BY 1"
    )


def q_docs_winnow(winnow_w: int = 16) -> str:
    """Twin of text.winnow_fingerprints: per-position window hashes
    (same HUGEINT fold as q_docs_rolling_fp), list_min per winnow
    window, list_distinct, count + xor fold in 32-bit halves."""
    from spapy_ray.kernels.hashing import sql_utf8_bytes

    fold = ("(h, c) -> ((h::HUGEINT * 1000003::HUGEINT + c::HUGEINT)"
            " % 18446744073709551616::HUGEINT)::UBIGINT")
    hs = (f"list_transform(range(1, len(bs) - 6), i -> "
          f"list_reduce(list_prepend(0::UBIGINT, "
          f"list_transform(bs[i:i+7], x -> x::UBIGINT)), {fold}))")
    whole = (f"list_reduce(list_prepend(0::UBIGINT, "
             f"list_transform(bs, x -> x::UBIGINT)), {fold})")
    w = winnow_w
    sel = (f"CASE WHEN len(hs) = 0 THEN [{whole}] "
           f"WHEN len(hs) <= {w} THEN [list_min(hs)] "
           f"ELSE list_transform(range(1, len(hs) - {w - 2}), "
           f"j -> list_min(hs[j:j+{w - 1}])) END")
    return (
        "WITH b AS (SELECT doc_id, "
        f"{sql_utf8_bytes('text')} AS bs FROM documents), "
        f"h AS (SELECT doc_id, bs, {hs} AS hs FROM b), "
        f"s AS (SELECT doc_id, list_distinct({sel}) AS fp FROM h) "
        "SELECT doc_id, len(fp)::BIGINT AS n_fp, "
        "(list_reduce(fp, (a, v) -> xor(a, v)) >> 32)::BIGINT "
        "AS fp_hi, "
        "(list_reduce(fp, (a, v) -> xor(a, v)) "
        "& 4294967295::UBIGINT)::BIGINT AS fp_lo FROM s"
    )


def q_embed_kmeans(k: int = 8, iters: int = 3,
                   scale: int = 1 << 20) -> str:
    """Twin of ann.kmeans_int: trunc-quantized components, unrolled
    MATERIALIZED Lloyd rounds (argmin ties to lowest j via
    row_number; trunc-division centroid update; empty clusters keep
    the previous centroid via LEFT JOIN + coalesce)."""
    parts = [
        "x AS MATERIALIZED (SELECT vec_id, "
        "generate_subscripts(embedding, 1) AS gi, "
        f"trunc(unnest(embedding)::DOUBLE * {scale})::BIGINT AS xq "
        "FROM embeddings)",
        f"c0 AS MATERIALIZED (SELECT vec_id AS j, gi, xq AS c "
        f"FROM x WHERE vec_id < {k})",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT x.vec_id, c.j, "
            f"sum((x.xq - c.c) * (x.xq - c.c)) AS dist "
            f"FROM x JOIN c{i - 1} c ON x.gi = c.gi GROUP BY 1, 2)")
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT vec_id, j FROM "
            f"(SELECT vec_id, j, row_number() OVER (PARTITION BY "
            f"vec_id ORDER BY dist, j) AS rn FROM d{i}) WHERE rn = 1)")
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT a.j, x.gi, "
            f"sum(x.xq)::BIGINT AS sm, count(*)::BIGINT AS cnt "
            f"FROM x JOIN a{i} a USING (vec_id) GROUP BY 1, 2)")
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT p.j, p.gi, "
            "coalesce(CASE WHEN s.sm >= 0 THEN s.sm // s.cnt "
            "ELSE -((-s.sm) // s.cnt) END, p.c) AS c "
            f"FROM c{i - 1} p LEFT JOIN s{i} s "
            "ON p.j = s.j AND p.gi = s.gi)")
    t = iters
    return (
        "WITH " + ", ".join(parts) + ", "
        f"df AS (SELECT x.vec_id, c.j, sum((x.xq - c.c) "
        f"* (x.xq - c.c)) AS dist FROM x JOIN c{t} c "
        "ON x.gi = c.gi GROUP BY 1, 2) "
        "SELECT vec_id, j::BIGINT AS cluster FROM "
        "(SELECT vec_id, j, row_number() OVER (PARTITION BY vec_id "
        "ORDER BY dist, j) AS rn FROM df) WHERE rn = 1"
    )


def q_cust_ktruss(k: int = 3, rounds: int = 4) -> str:
    """Twin of graph.k_truss on the (day, priority) co-order graph:
    unrolled MATERIALIZED support-peel rounds (common-neighbor count
    via the doubled-adjacency 2-hop join; support-0 edges drop out
    of the join, which IS the k>=3 filter). Fixpoint in 2 rounds at
    both scales; 4 for margin."""
    s = k - 2
    parts = [
        "e0 AS MATERIALIZED (SELECT DISTINCT a.o_custkey AS u, "
        "b.o_custkey AS v FROM orders a JOIN orders b "
        "ON a.o_orderdate = b.o_orderdate "
        "AND a.o_orderpriority = b.o_orderpriority "
        "AND a.o_custkey < b.o_custkey)",
        "a0 AS MATERIALIZED (SELECT u, v FROM e0)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"ad{i - 1} AS MATERIALIZED (SELECT u, v FROM a{i - 1} "
            f"UNION ALL SELECT v, u FROM a{i - 1})")
        parts.append(
            f"sup{i} AS MATERIALIZED (SELECT e.u, e.v, "
            f"count(*)::BIGINT AS c FROM a{i - 1} e "
            f"JOIN ad{i - 1} x ON x.u = e.u "
            f"JOIN ad{i - 1} y ON y.u = e.v AND y.v = x.v "
            "GROUP BY 1, 2)")
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT u, v FROM sup{i} "
            f"WHERE c >= {s})")
    return ("WITH " + ", ".join(parts)
            + f" SELECT u AS lo, v AS hi, c AS support "
            f"FROM sup{rounds} WHERE c >= {s}")


def q_zone_coocc() -> str:
    """Twin of the zone co-occurrence pairs: the PIP join CTE
    self-paired per page row."""
    return (
        f"WITH {join_cte()} "
        "SELECT a.zone_id AS za, b.zone_id AS zb, "
        "count(*)::BIGINT AS n_pages FROM joined a JOIN joined b "
        "ON a.url = b.url AND a.warc_ts = b.warc_ts "
        "AND a.zone_id < b.zone_id GROUP BY 1, 2"
    )


def q_events_pctl() -> str:
    """Twin of the exact percentile_cont pair: rank-indexed element
    weights (the doubled-median and the 10-scaled p90 lerp)."""
    return (
        "WITH e AS (SELECT event_type, round(value * 100)::BIGINT "
        "AS c FROM events), "
        "w AS (SELECT event_type, c, row_number() OVER "
        "(PARTITION BY event_type ORDER BY c) - 1 AS i, "
        "count(*) OVER (PARTITION BY event_type) AS n FROM e), "
        "p AS (SELECT event_type, c, i, n, "
        "(9 * (n - 1)) // 10 AS lo, (9 * (n - 1)) % 10 AS r, "
        "least((9 * (n - 1)) // 10 + 1, n - 1) AS hi FROM w) "
        "SELECT event_type, max(n)::BIGINT AS n, "
        "sum(c * ((i = (n - 1) // 2)::INT + (i = n // 2)::INT))"
        "::BIGINT AS p50_x2, "
        "sum(c * (CASE WHEN i = lo THEN 10 - r ELSE 0 END "
        "+ CASE WHEN i = hi THEN r ELSE 0 END))::BIGINT AS p90_x10 "
        "FROM p GROUP BY event_type"
    )


def q_cust_eccentricity(max_hops: int = 6) -> str:
    """Twin of the per-source reach audit: one recursive closure
    carrying the source id in the state (bounded depth terminates
    the cyclic expansion), min hop per (src, vertex), then the
    per-source fold."""
    return (
        "WITH RECURSIVE e0 AS (SELECT DISTINCT a.o_custkey AS u, "
        "b.o_custkey AS v FROM orders a JOIN orders b "
        "ON a.o_orderdate = b.o_orderdate "
        "AND a.o_custkey < b.o_custkey), "
        "e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0), "
        "reach(s, n, d) AS (SELECT src, src, 0 FROM "
        "(SELECT unnest([1, 2, 3, 4]) AS src) "
        "UNION SELECT reach.s, e.v, reach.d + 1 FROM e "
        f"JOIN reach ON e.u = reach.n WHERE reach.d < {max_hops}), "
        "m AS (SELECT s, n, min(d) AS d FROM reach GROUP BY 1, 2) "
        "SELECT s::BIGINT AS src, count(*)::BIGINT AS n_reached, "
        "max(d)::BIGINT AS ecc FROM m GROUP BY s"
    )


def q_decontam_audit(n: int = 8, eval_mod: int = 50) -> str:
    """Twin of neardup.decontam_audit: distinct grams per doc (same
    FNV), eval-present gram set, per-train-doc shared counts."""
    gram = sql_fnv1a(f"array_to_string(w[gi:gi+{n - 1}], ' ')")
    return (
        "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w "
        "FROM documents), "
        f"grams AS (SELECT DISTINCT doc_id, {gram} AS h "
        f"FROM toks, unnest(generate_series(1, len(w) - {n - 1})) "
        "t(gi)), "
        f"ev AS (SELECT DISTINCT h FROM grams "
        f"WHERE doc_id % {eval_mod} = 0) "
        "SELECT g.doc_id, count(*)::BIGINT AS n_shared_grams "
        f"FROM grams g JOIN ev USING (h) "
        f"WHERE g.doc_id % {eval_mod} <> 0 GROUP BY g.doc_id"
    )


def q_point_pyramid(max_res: int = 8) -> str:
    """Twin of the point-count pyramid: one grouped count per
    resolution, unioned."""
    n = 1 << max_res
    gx = (f"LEAST(GREATEST(floor((lon + 180.0) / 360.0 * "
          f"{float(n)})::BIGINT, 0), {n - 1})")
    gy = (f"LEAST(GREATEST(floor((lat + 90.0) / 180.0 * "
          f"{float(n)})::BIGINT, 0), {n - 1})")
    levels = " UNION ALL ".join(
        f"SELECT {r}::BIGINT AS res, (gx >> {max_res - r})::BIGINT "
        f"AS cx, (gy >> {max_res - r})::BIGINT AS cy, "
        "count(*)::BIGINT AS n_points FROM g GROUP BY 2, 3"
        for r in range(max_res + 1))
    return (f"WITH {geo_cte()}, "
            f"g AS (SELECT {gx} AS gx, {gy} AS gy FROM geo) "
            + levels)


def q_weekend_drift() -> str:
    """Twin of the grouped KS: per-type cumulative cross products
    over the cents order, weekday (s=0) vs weekend (s=1) sides."""
    return (
        "WITH e AS (SELECT event_type, round(value * 100)::BIGINT "
        "AS c, ((epoch_us(ts) // 86400000000 + 4) % 7) AS dow "
        "FROM events), "
        "x AS (SELECT event_type, c, "
        "(dow IN (0, 6))::INT AS s FROM e), "
        "t AS (SELECT event_type, c, sum((s = 0)::INT)::BIGINT "
        "AS ca, sum((s = 1)::INT)::BIGINT AS cb FROM x "
        "GROUP BY 1, 2), "
        "cw AS (SELECT event_type, "
        "sum(ca) OVER (PARTITION BY event_type ORDER BY c "
        "ROWS UNBOUNDED PRECEDING)::HUGEINT AS cca, "
        "sum(cb) OVER (PARTITION BY event_type ORDER BY c "
        "ROWS UNBOUNDED PRECEDING)::HUGEINT AS ccb FROM t), "
        "n AS (SELECT event_type, sum(ca)::BIGINT AS na, "
        "sum(cb)::BIGINT AS nb FROM t GROUP BY 1) "
        "SELECT event_type, na, nb, "
        "max(abs(cca * nb - ccb * na))::BIGINT AS d_num "
        "FROM cw JOIN n USING (event_type) GROUP BY 1, 2, 3"
    )


# -------------------------------------------- session-10: raster scans

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


def q_promo_revenue_share() -> str:
    """Twin of queries.q_promo_revenue_share (TPC-H Q14 shape):
    month key = months since 1970-01, revenue_u = cents*(100-d_pct),
    share_ppm = promo*10^6 // total (all positive, trunc == floor)."""
    return (
        "WITH j AS (SELECT (year(l_shipdate) - 1970) * 12 "
        "+ month(l_shipdate) - 1 AS ym, "
        "CAST(round(l_extendedprice * 100.0) AS BIGINT) "
        "* (100 - CAST(round(l_discount * 100.0) AS BIGINT)) AS rev, "
        "CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END AS isp "
        "FROM lineitem JOIN part ON p_partkey = l_partkey) "
        "SELECT ym::BIGINT AS ym, "
        "sum(rev * isp)::BIGINT AS promo_rev_u, "
        "sum(rev)::BIGINT AS total_rev_u, "
        "(sum(rev * isp) * 1000000 // sum(rev))::BIGINT AS share_ppm "
        "FROM j GROUP BY ym ORDER BY ym"
    )


def q_large_orders() -> str:
    """Twin of queries.q_large_orders (TPC-H Q18 shape): HAVING on
    the x100-quantized per-order quantity sum, joined back to orders
    and customer."""
    return (
        "WITH s AS (SELECT l_orderkey, "
        "sum(CAST(round(l_quantity * 100.0) AS BIGINT))::BIGINT "
        "AS sum_qty100 FROM lineitem GROUP BY l_orderkey "
        "HAVING sum(CAST(round(l_quantity * 100.0) AS BIGINT)) "
        "> 30000) "
        "SELECT c_custkey::BIGINT AS c_custkey, c_name, "
        "o_orderkey::BIGINT AS o_orderkey, "
        "(epoch_us(o_orderdate) // 86400000000)::BIGINT "
        "AS o_date_days, "
        "CAST(round(o_totalprice * 100.0) AS BIGINT) "
        "AS totalprice_cents, s.sum_qty100 "
        "FROM s JOIN orders ON o_orderkey = l_orderkey "
        "JOIN customer ON c_custkey = o_custkey"
    )


def q_docs_cosine_pairs(df_cap: int = 20, k: int = 50) -> str:
    """Twin of queries.q_docs_cosine_pairs: token 3-gram shingles via
    lead() over the space-split positions (empty split tokens count,
    same as the engine's flat-buffer shifts), same df cap, shingle-tf
    dot product per pair, same (sim desc, doc_a, doc_b) order."""
    return (
        "WITH w AS (SELECT doc_id, "
        "generate_subscripts(string_split(text, ' '), 1) AS pos, "
        "unnest(string_split(text, ' ')) AS tok FROM documents), "
        "sh AS (SELECT doc_id, tok || '_' "
        "|| lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) "
        "|| '_' "
        "|| lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) "
        "AS term FROM w), "
        "tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM sh "
        "WHERE term IS NOT NULL GROUP BY 1, 2), "
        "df AS (SELECT term, count(*)::BIGINT AS df FROM tf "
        "GROUP BY 1), "
        f"rare AS (SELECT term FROM df WHERE df BETWEEN 2 AND {df_cap}), "
        "pr AS (SELECT a.doc_id AS doc_a, c.doc_id AS doc_b, "
        "sum(a.tf * c.tf)::BIGINT AS sim "
        "FROM tf a JOIN tf c USING (term) JOIN rare USING (term) "
        "WHERE a.doc_id < c.doc_id GROUP BY 1, 2) "
        "SELECT doc_a, doc_b, sim, "
        "row_number() OVER (ORDER BY sim DESC, doc_a, doc_b)::BIGINT "
        f"AS rank FROM pr ORDER BY rank LIMIT {k}"
    )


def q_docs_readability() -> str:
    """Twin of queries.q_docs_readability: the same three RE2 counts
    via regexp_extract_all lengths and the same positive truncating
    divisions."""
    return (
        "WITH c AS (SELECT doc_id, "
        "len(regexp_extract_all(text, '[A-Za-z]+'))::BIGINT AS w, "
        "len(regexp_extract_all(text, '[.!?]+'))::BIGINT AS s, "
        "len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))::BIGINT "
        "AS y FROM documents) "
        "SELECT doc_id, w AS n_words, s AS n_sentences, "
        "y AS n_syllables, "
        "(206835 - (1015000 * w) // GREATEST(s, 1) "
        "- (84600 * y) // GREATEST(w, 1))::BIGINT AS flesch_x1000 "
        "FROM c"
    )


def q_cust_shortest_paths(rounds: int = 4, mod: int = 97) -> str:
    """Twin of graph.sssp_minplus: unrolled MATERIALIZED min-plus
    rounds (relaxation is monotone and stationary, so the unroll
    count only needs to reach the engine's round cap)."""
    parts = [
        "WITH e0 AS MATERIALIZED (SELECT DISTINCT a.o_custkey AS u, "
        "b.o_custkey AS v FROM orders a JOIN orders b "
        "ON a.o_orderdate = b.o_orderdate "
        "AND a.o_custkey < b.o_custkey), "
        f"e AS MATERIALIZED (SELECT u, v, (u + v) % {mod} + 1 AS w "
        f"FROM e0 UNION ALL SELECT v, u, (u + v) % {mod} + 1 FROM e0), "
        "d0 AS MATERIALIZED (SELECT c_custkey AS n, 0::BIGINT AS d "
        "FROM customer WHERE c_nationkey = 0)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"d{r} AS MATERIALIZED (SELECT n, min(d)::BIGINT AS d "
            f"FROM (SELECT n, d FROM d{r-1} UNION ALL "
            f"SELECT e.v, d{r-1}.d + e.w FROM e "
            f"JOIN d{r-1} ON e.u = d{r-1}.n) GROUP BY n)")
    return (", ".join(parts)
            + f" SELECT n AS custkey, d AS dist FROM d{rounds}")


def q_events_autocorr(q: int = 1_000_000) -> str:
    """Twin of queries.q_events_autocorr: lag-1 cents pairs per type,
    then the HUGEINT sufficient-statistics corr (same floor-quantized
    square as q_lineitem_corr)."""
    num = "(n::HUGEINT*sxy - sx::HUGEINT*sy)"
    varx = "(n::HUGEINT*sxx - sx::HUGEINT*sx)"
    vary = "(n::HUGEINT*syy - sy::HUGEINT*sy)"
    return (
        "WITH e AS (SELECT event_type, "
        "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents, "
        "lag(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) OVER "
        "(PARTITION BY event_type ORDER BY ts, event_id) AS prev "
        "FROM events), "
        "t AS (SELECT event_type, prev AS xi, cents AS yi FROM e "
        "WHERE prev IS NOT NULL), "
        "s AS (SELECT event_type, count(*)::BIGINT AS n, "
        "sum(xi)::BIGINT AS sx, sum(yi)::BIGINT AS sy, "
        "sum(xi*xi)::BIGINT AS sxx, sum(yi*yi)::BIGINT AS syy, "
        "sum(xi*yi)::BIGINT AS sxy FROM t GROUP BY 1) "
        "SELECT event_type, n, "
        f"(CASE WHEN {num} > 0 THEN 1 WHEN {num} < 0 THEN -1 "
        "ELSE 0 END)::BIGINT AS corr_sign, "
        f"(CASE WHEN {varx} * {vary} > 0 THEN "
        f"({num} * {num} * {q} // ({varx} * {vary}))::BIGINT "
        "ELSE -1 END) AS corr2_q, "
        "sx, sy, sxx, syy, sxy FROM s"
    )


def q_media_chunk_dedup(chunk: int = 256) -> str:
    """Twin of queries.q_media_chunk_dedup: the q_media_chunks chunk
    CTE deduped by (sig, length), histogrammed by copy count."""
    fnv = sql_fnv1a("piece")
    return (
        f"WITH {pages_cte()}, "
        "d AS (SELECT url, html, length(html) AS ln FROM pages), "
        "c AS (SELECT url, html, "
        f"unnest(generate_series(0, (ln + {chunk - 1}) // {chunk} "
        "- 1)) AS chunk_id FROM d), "
        "s AS (SELECT "
        f"substr(html, chunk_id * {chunk} + 1, {chunk}) AS piece "
        "FROM c), "
        "g AS (SELECT length(piece)::BIGINT AS n_bytes, "
        f"(({fnv}) % 1000000007)::BIGINT AS sig, "
        "count(*)::BIGINT AS copies FROM s GROUP BY 1, 2) "
        "SELECT copies, count(*)::BIGINT AS n_sigs, "
        "(copies * count(*))::BIGINT AS n_chunks, "
        "sum(n_bytes)::BIGINT AS bytes_stored, "
        "(copies * sum(n_bytes))::BIGINT AS bytes_logical "
        "FROM g GROUP BY copies ORDER BY copies"
    )


def q_zone_dispersion() -> str:
    """Twin of queries.q_zone_dispersion: same PIP membership, same
    1e-5 quantization and zone-anchor shift, HUGEINT sufficient
    statistics, floor-quantized per-point variances."""
    vx = "(n * sdxx - sdx * sdx)"
    vy = "(n * sdyy - sdy * sdy)"
    return (
        f"WITH {geo_zones_cte()}, "
        "j AS (SELECT z.zone_id, "
        "CAST(round(g.lat * 100000.0) AS BIGINT) - 10 * z.y0 AS dy, "
        "CAST(round(g.lon * 100000.0) AS BIGINT) - 10 * z.x0 AS dx "
        "FROM geo g CROSS JOIN zones z "
        f"WHERE {sql_pip_condition('g.lon', 'g.lat')}), "
        "s AS (SELECT zone_id, count(*)::HUGEINT AS n, "
        "sum(dx)::HUGEINT AS sdx, sum(dy)::HUGEINT AS sdy, "
        "sum(dx::HUGEINT * dx)::HUGEINT AS sdxx, "
        "sum(dy::HUGEINT * dy)::HUGEINT AS sdyy FROM j GROUP BY 1) "
        "SELECT zone_id, n::BIGINT AS n_pages, sdx::BIGINT AS sdx, "
        "sdy::BIGINT AS sdy, sdxx::BIGINT AS sdxx, "
        "sdyy::BIGINT AS sdyy, "
        f"({vx} // (n * n))::BIGINT AS varx_q, "
        f"({vy} // (n * n))::BIGINT AS vary_q, "
        f"(({vx} + {vy}) // (n * n))::BIGINT AS sd2_q FROM s"
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



def q_importance_sample() -> str:
    """Twin of queries.q_importance_sample: same string-keyed FNV,
    same p = qty100 * 20 / 100000 keep rule."""
    h = sql_fnv1a("CAST(l_orderkey * 16 + l_linenumber AS VARCHAR)")
    return (
        "WITH t AS (SELECT l_returnflag, "
        "CAST(round(l_quantity * 100.0) AS BIGINT) AS q, "
        f"(CASE WHEN (({h}) % 100000) < "
        "CAST(round(l_quantity * 100.0) AS BIGINT) * 20 "
        "THEN 1 ELSE 0 END)::BIGINT AS k FROM lineitem) "
        "SELECT l_returnflag, count(*)::BIGINT AS n_total, "
        "sum(k)::BIGINT AS n_kept, sum(q)::BIGINT AS qty100_total, "
        "sum(q * k)::BIGINT AS qty100_kept FROM t "
        "GROUP BY l_returnflag ORDER BY l_returnflag"
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


def q_events_dense_rank() -> str:
    """Twin of queries.q_events_dense_rank."""
    return (
        "SELECT event_id, event_type, "
        "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents, "
        "dense_rank() OVER (PARTITION BY event_type "
        "ORDER BY CAST(floor(value * 100.0 + 0.5) AS BIGINT))"
        "::BIGINT AS vrank FROM events"
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


def q_user_overlap_sketch(k: int = 64, m_mod: int = 1 << 62) -> str:
    """Twin of relational.kmv_sketch_overlap over weekday/weekend
    user sets: identical k-smallest-distinct-hash sketches (ORDER BY
    LIMIT k), identical HUGEINT estimator arithmetic + clamps."""
    h0 = sql_fnv1a("CAST(user_id AS VARCHAR)")
    h = f"(({h0})::HUGEINT * 2654435761)"
    M = m_mod
    return (
        "WITH e AS (SELECT user_id, ((epoch_us(ts) // 86400000000 "
        "+ 4) % 7) IN (0, 6) AS wk FROM events), "
        f"ha AS (SELECT DISTINCT (({h}) % {M})::BIGINT AS h FROM e "
        "WHERE NOT wk), "
        f"hb AS (SELECT DISTINCT (({h}) % {M})::BIGINT AS h FROM e "
        "WHERE wk), "
        f"ka AS (SELECT h FROM ha ORDER BY h LIMIT {k}), "
        f"kb AS (SELECT h FROM hb ORDER BY h LIMIT {k}), "
        "un AS (SELECT DISTINCT h FROM (SELECT h FROM ka "
        f"UNION ALL SELECT h FROM kb) ORDER BY h LIMIT {k}), "
        "st AS (SELECT (SELECT count(*) FROM ka) AS na, "
        "(SELECT count(*) FROM kb) AS nb, "
        "(SELECT max(h) FROM ka) AS ta, "
        "(SELECT max(h) FROM kb) AS tb, "
        "(SELECT count(*) FROM un) AS nu, "
        "(SELECT max(h) FROM un) AS tu, "
        "(SELECT count(*) FROM un WHERE h IN (SELECT h FROM ka) "
        "AND h IN (SELECT h FROM kb)) AS m, "
        "(SELECT count(*) FROM ha WHERE h IN (SELECT h FROM hb)) "
        "AS exact_inter) "
        f"SELECT {k}::BIGINT AS k, na::BIGINT AS n_sketch_a, "
        "nb::BIGINT AS n_sketch_b, "
        f"(CASE WHEN na < {k} THEN na ELSE LEAST("
        f"({k - 1}::HUGEINT * {M}) // ta, {M}) END)::BIGINT AS est_a, "
        f"(CASE WHEN nb < {k} THEN nb ELSE LEAST("
        f"({k - 1}::HUGEINT * {M}) // tb, {M}) END)::BIGINT AS est_b, "
        "m::BIGINT AS m_common, "
        f"(CASE WHEN nu < {k} THEN m ELSE LEAST("
        f"(m::HUGEINT * {k - 1} * {M}) // ({k}::HUGEINT * tu), {M}) "
        "END)::BIGINT AS est_inter, "
        "exact_inter::BIGINT AS exact_inter FROM st"
    )


def q_corpus_prep(chunk_tokens: int = 2048) -> str:
    """Twin of queries.q_corpus_prep: median gate + punct cap, first
    doc per distinct TEXT (the engine keys on a 64-bit text hash —
    collision-free at corpus scale by the dedup family convention),
    then the q_seq_packing window layout over the survivors."""
    punct = r"[!-/:-@\[-`{-~]"
    ratio = (f"((length(text) - length(regexp_replace(text, '{punct}', "
             "'', 'g')))::DOUBLE / GREATEST(length(text), 1)::DOUBLE)")
    c = chunk_tokens
    return (
        "WITH q AS (SELECT doc_id, text, length(text)::BIGINT AS nc, "
        f"{ratio} AS pr FROM documents), "
        "t AS (SELECT quantile_disc(nc, 0.5) AS thr FROM q), "
        "s AS (SELECT doc_id, text, "
        "len(string_split(text, ' '))::BIGINT AS tok FROM q, t "
        "WHERE nc >= thr AND pr <= 0.2), "
        "w AS (SELECT doc_id, tok FROM (SELECT doc_id, tok, "
        "row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn "
        "FROM s) WHERE rn = 1), "
        "r AS (SELECT doc_id, tok, sum(tok) OVER (ORDER BY doc_id "
        "ROWS UNBOUNDED PRECEDING)::BIGINT - tok AS cb FROM w), "
        f"u AS (SELECT doc_id, tok, cb, unnest(generate_series("
        f"cb // {c}, (cb + tok - 1) // {c})) AS k FROM r), "
        f"v AS (SELECT doc_id, cb, k, least(cb + tok, (k + 1) * {c}) "
        f"- greatest(cb, k * {c}) AS tk FROM u) "
        "SELECT k::BIGINT AS chunk_id, sum(tk)::BIGINT AS n_tokens, "
        "count(*)::BIGINT AS n_docs, "
        f"sum((cb // {c} = k)::INT)::BIGINT AS n_starts, "
        "sum(doc_id * tk)::BIGINT AS ck FROM v GROUP BY k"
    )


def q_embed_gram(scale: int = 10_000) -> str:
    """Twin of queries.q_embed_gram: unnest + subscript -> self-join
    per vec_id on dim_i <= dim_j over the same trunc-quantized
    DOUBLE values (FLOAT list elements multiply in FLOAT — cast
    before quantizing, the established list-element rule)."""
    return (
        "WITH e AS (SELECT vec_id, "
        "generate_subscripts(embedding, 1) - 1 AS d, "
        f"trunc(unnest(embedding)::DOUBLE * {scale})::BIGINT AS q "
        "FROM embeddings) "
        "SELECT a.d::BIGINT AS dim_i, b.d::BIGINT AS dim_j, "
        "sum(a.q * b.q)::BIGINT AS g "
        "FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.d <= b.d "
        "GROUP BY 1, 2"
    )


def q_frequent_triples(min_support: int = 2, k: int = 30) -> str:
    """Twin of relational.frequent_triples over lineitem baskets:
    three-way self-join on the order with a < b < c."""
    return (
        "WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p "
        "FROM lineitem), "
        "t AS (SELECT x.p AS a, y.p AS b, z.p AS c, "
        "count(*)::BIGINT AS cnt "
        "FROM b x JOIN b y ON x.o = y.o AND x.p < y.p "
        "JOIN b z ON y.o = z.o AND y.p < z.p "
        "GROUP BY 1, 2, 3 "
        f"HAVING count(*) >= {min_support}) "
        "SELECT a::BIGINT AS a, b::BIGINT AS b, c::BIGINT AS c, cnt, "
        "row_number() OVER (ORDER BY cnt DESC, a, b, c)::BIGINT "
        f"AS rank FROM t ORDER BY rank LIMIT {k}"
    )


# --- TPC-H decision-support batch twins (session-11).


def q_cust_order_histogram() -> str:
    """Twin of queries.q_cust_order_histogram (TPC-H Q13 shape):
    the LEFT JOIN the engine never materializes — zero-order
    customers come from parquet row counts there."""
    return (
        "SELECT n_orders, count(*)::BIGINT AS n_custs FROM ("
        "SELECT c_custkey, count(o_orderkey)::BIGINT AS n_orders "
        "FROM customer LEFT JOIN orders ON c_custkey = o_custkey "
        "GROUP BY c_custkey) GROUP BY n_orders"
    )


def q_small_qty_revenue() -> str:
    """Twin of queries.q_small_qty_revenue (TPC-H Q17 shape).
    The avg-quantity predicate is the same exact integer cross-
    multiplication on both sides: qty * 5 * cnt < sum_qty."""
    return (
        "SELECT coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT)), "
        "0)::BIGINT AS revenue_cents, count(*)::BIGINT AS n_items "
        "FROM lineitem JOIN ("
        "SELECT l_partkey AS pk, sum(l_quantity)::BIGINT AS sq, "
        "count(*)::BIGINT AS c FROM lineitem GROUP BY l_partkey) "
        "ON l_partkey = pk "
        "WHERE CAST(l_quantity AS BIGINT) * 5 * c < sq"
    )


def q_large_orders(min_qty: int = 300, k: int = 20) -> str:
    """Twin of queries.q_large_orders (TPC-H Q18 shape); ordering
    ties broken by orderkey."""
    return (
        "SELECT o_orderkey, sum_qty, "
        "CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_cents "
        "FROM orders JOIN ("
        "SELECT l_orderkey, sum(l_quantity)::BIGINT AS sum_qty "
        f"FROM lineitem GROUP BY l_orderkey HAVING sum_qty >= {min_qty}) "
        "ON o_orderkey = l_orderkey "
        f"ORDER BY sum_qty DESC, o_orderkey LIMIT {k}"
    )


def q_idle_customers() -> str:
    """Twin of queries.q_idle_customers (TPC-H Q22 shape). The
    above-average-positive-balance predicate is the exact integer
    cross-multiplication cents * n_pos > sum_pos on both sides;
    'recent' orders are 1999+."""
    return (
        "WITH stats AS (SELECT count(*)::BIGINT AS np, "
        "sum(CAST(round(c_acctbal * 100) AS BIGINT))::BIGINT AS sp "
        "FROM customer WHERE CAST(round(c_acctbal * 100) AS BIGINT) > 0) "
        "SELECT n_name, count(*)::BIGINT AS n_custs, "
        "sum(CAST(round(c_acctbal * 100) AS BIGINT))::BIGINT AS bal_cents "
        "FROM customer, stats JOIN nation ON c_nationkey = n_nationkey "
        "WHERE CAST(round(c_acctbal * 100) AS BIGINT) * np > sp "
        "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey "
        "AND o_orderdate >= TIMESTAMP '1999-01-01') "
        "GROUP BY n_name"
    )


def q_top_supplier() -> str:
    """Twin of queries.q_top_supplier (TPC-H Q15 shape): 1996-H1
    shipped revenue in exact integer units cents x (100 - disc_pct),
    all max-ties kept."""
    return (
        "WITH r AS (SELECT l_suppkey AS s_suppkey, "
        "sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
        "(100 - CAST(round(l_discount * 100) AS BIGINT)))::BIGINT "
        "AS revenue_u FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1996-07-01' GROUP BY l_suppkey) "
        "SELECT r.s_suppkey, s_name, revenue_u "
        "FROM r JOIN supplier ON r.s_suppkey = supplier.s_suppkey "
        "WHERE revenue_u = (SELECT max(revenue_u) FROM r)"
    )


def q_promo_share() -> str:
    """Twin of queries.q_promo_share (TPC-H Q14 shape); the share is
    the same integer floor(promo_u * 1e6 / total_u) — DuckDB // on
    non-negative BIGINTs is the same floor."""
    return (
        "WITH j AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) * "
        "(100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev, "
        "CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END AS is_promo "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE l_shipdate >= TIMESTAMP '1996-03-01' "
        "AND l_shipdate < TIMESTAMP '1996-04-01') "
        "SELECT sum(rev * is_promo)::BIGINT AS promo_revenue_u, "
        "sum(rev)::BIGINT AS total_revenue_u, "
        "(sum(rev * is_promo)::BIGINT * 1000000 // sum(rev)::BIGINT) "
        "::BIGINT AS promo_ppm FROM j"
    )


def q_late_sole_suppliers(late_us: int = 120 * 86_400_000_000,
                          k: int = 10) -> str:
    """Twin of queries.q_late_sole_suppliers (TPC-H Q21 shape):
    per-(order, supplier) any-late, orders with >= 2 suppliers and
    exactly one late one blame that supplier; ties by suppkey."""
    return (
        "WITH ls AS (SELECT l_orderkey AS ok, l_suppkey AS sk, "
        "max(CASE WHEN epoch_us(l_shipdate) - epoch_us(o_orderdate) "
        f"> {late_us} THEN 1 ELSE 0 END) AS late "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "GROUP BY 1, 2), "
        "per_ok AS (SELECT ok, count(*) AS ns, sum(late) AS nl, "
        "sum(sk * late) AS skl FROM ls GROUP BY ok) "
        "SELECT skl::BIGINT AS s_suppkey, any_value(s_name) AS s_name, "
        "count(*)::BIGINT AS n_orders "
        "FROM per_ok JOIN supplier ON skl = s_suppkey "
        "WHERE nl = 1 AND ns >= 2 GROUP BY skl "
        f"ORDER BY n_orders DESC, skl LIMIT {k}"
    )


def _hex4_int(col: str) -> str:
    """SQL expression: 4-char uppercase-hex string -> BIGINT."""
    def d(i):
        return f"(strpos('0123456789ABCDEF', substr({col}, {i}, 1)) - 1)"
    return (f"((({d(1)} * 16 + {d(2)}) * 16 + {d(3)}) * 16 + {d(4)})"
            "::BIGINT")


def q_bpe_merges(rounds: int = 8) -> str:
    """Twin of queries.q_bpe_merges — byte-level BPE merge training,
    every round reproduced exactly. Words render as fixed-width hex
    token strings '|0041|0042|' (prefix-free, so any byte — incl. a
    literal '|' in a word — is safe), pair counts come from the
    split token lists, the argmax tie order (cnt desc, a, b) on hex
    strings equals the engine's numeric order, and replace() applies
    the merge with BPE's exact leftmost-non-overlapping scan."""
    parts = [
        "WITH w0 AS MATERIALIZED (SELECT '|' || "
        "regexp_replace(hex(word), '([0-9A-F]{2})', '00\\1|', 'g') AS s, "
        "c FROM (SELECT word, count(*)::BIGINT AS c FROM "
        "(SELECT unnest(string_split(text, ' ')) AS word FROM documents) "
        "WHERE word <> '' GROUP BY word))"]
    for r in range(rounds):
        new_hex = f"{256 + r:04X}"
        parts.append(
            f"p{r} AS MATERIALIZED (SELECT tok[i] AS a, tok[i+1] AS b, "
            "sum(c)::BIGINT AS cnt FROM (SELECT "
            f"string_split(trim(s, '|'), '|') AS tok, c FROM w{r}) t, "
            "unnest(generate_series(1, len(tok) - 1)) AS u(i) "
            "GROUP BY 1, 2)")
        parts.append(
            f"b{r} AS MATERIALIZED (SELECT a, b, cnt FROM p{r} "
            "ORDER BY cnt DESC, a ASC, b ASC LIMIT 1)")
        if r + 1 < rounds:
            parts.append(
                f"w{r + 1} AS MATERIALIZED (SELECT replace(s, "
                f"'|' || (SELECT a FROM b{r}) || '|' || "
                f"(SELECT b FROM b{r}), '|{new_hex}') AS s, c FROM w{r})")
    selects = [
        f"SELECT {r}::BIGINT AS round, {_hex4_int('a')} AS tok_a, "
        f"{_hex4_int('b')} AS tok_b, {256 + r}::BIGINT AS new_id, "
        f"cnt FROM b{r}"
        for r in range(rounds)]
    return ", ".join(parts) + " " + " UNION ALL ".join(selects)


def q_cust_hits(iterations: int = 4, r0: int = 1_000_000) -> str:
    """Twin of queries.q_cust_hits — HITS with integer
    max-normalization, every half-iteration a chained CTE (sum over
    the distinct bipartite edges, then v * r0 // max(v))."""
    parts = [
        "WITH e AS MATERIALIZED (SELECT DISTINCT o_custkey AS c, "
        "l_suppkey AS s FROM orders JOIN lineitem "
        "ON o_orderkey = l_orderkey)"]
    prev_h = None
    for i in range(iterations):
        if prev_h is None:
            parts.append(
                f"a{i}r AS MATERIALIZED (SELECT s, "
                f"(count(*) * {r0})::BIGINT AS v FROM e GROUP BY s)")
        else:
            parts.append(
                f"a{i}r AS MATERIALIZED (SELECT s, sum({prev_h}.v)"
                f"::BIGINT AS v FROM e JOIN {prev_h} USING (c) "
                "GROUP BY s)")
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT s, (v * {r0} // "
            f"(SELECT max(v) FROM a{i}r))::BIGINT AS v FROM a{i}r)")
        parts.append(
            f"h{i}r AS MATERIALIZED (SELECT c, sum(a{i}.v)::BIGINT "
            f"AS v FROM e JOIN a{i} USING (s) GROUP BY c)")
        parts.append(
            f"h{i} AS MATERIALIZED (SELECT c, (v * {r0} // "
            f"(SELECT max(v) FROM h{i}r))::BIGINT AS v FROM h{i}r)")
        prev_h = f"h{i}"
    last = iterations - 1
    return (
        ", ".join(parts) +
        f" SELECT 'hub' AS side, c::BIGINT AS node, v AS score "
        f"FROM h{last} UNION ALL "
        f"SELECT 'auth' AS side, s::BIGINT AS node, v AS score "
        f"FROM a{last}")


def q_session_overlap_pairs() -> str:
    """Twin of queries.q_session_overlap_pairs: sessions via the
    sessionize twin, then the same rank-sum identity expressed as an
    ordered window cumsum (at equal timestamps starts sort before
    ends, matching searchsorted side='right')."""
    from spapy_ray.stages.sessions import sql_sessionize

    sess = sql_sessionize()
    # sql_sessionize is a full statement "WITH ... SELECT ..."; wrap
    # it as a subquery source.
    return (
        f"WITH sess AS MATERIALIZED ({sess}), "
        "u AS (SELECT session_start_us AS v, 1 AS ist FROM sess "
        "UNION ALL SELECT session_end_us, 0 FROM sess), "
        "o AS (SELECT ist, sum(ist) OVER (ORDER BY v ASC, ist DESC "
        "ROWS UNBOUNDED PRECEDING) AS sle FROM u) "
        "SELECT (SELECT count(*) FROM sess)::BIGINT AS n_intervals, "
        "(sum(CASE WHEN ist = 0 THEN sle ELSE 0 END) - "
        "(SELECT count(*)::BIGINT * (count(*) + 1) // 2 FROM sess))"
        "::BIGINT AS overlap_pairs FROM o"
    )


def q_domain_trajectories() -> str:
    """Twin of queries.q_domain_trajectories: same host regex, same
    1e-5 quantization; warc_ts is unique by construction so the
    ORDER BY us equals the engine's (us, url, lat5, lon5) tie
    order; HUGEINT moments, floor gyr."""
    import re

    from spapy_ray.stages.text import URL_PATTERN

    anon = re.sub(r"\?P<[a-z]+>", "", URL_PATTERN)
    return (
        f"WITH {geo_cte()}, "
        f"pts AS (SELECT regexp_extract(url, '{anon}', 2) AS host, "
        "epoch_us(warc_ts) AS us, "
        "CAST(round(lat * 100000.0) AS BIGINT) AS lat5, "
        "CAST(round(lon * 100000.0) AS BIGINT) AS lon5 FROM geo), "
        "w AS (SELECT host, lat5, lon5, "
        "lag(lat5) OVER o AS plat, lag(lon5) OVER o AS plon, "
        "first_value(lat5) OVER o AS flat, "
        "first_value(lon5) OVER o AS flon "
        "FROM pts WINDOW o AS (PARTITION BY host ORDER BY us)), "
        "agg AS (SELECT host, count(*)::HUGEINT AS n, "
        "sum(CASE WHEN plat IS NULL THEN 0 "
        "ELSE abs(lon5 - plon) + abs(lat5 - plat) END)::BIGINT "
        "AS l1_path, "
        "sum((lon5 - flon)::HUGEINT) AS sdx, "
        "sum((lat5 - flat)::HUGEINT) AS sdy, "
        "sum((lon5 - flon)::HUGEINT * (lon5 - flon) + "
        "(lat5 - flat)::HUGEINT * (lat5 - flat)) AS stot, "
        "any_value(flon) AS flon, any_value(flat) AS flat "
        "FROM w GROUP BY host), "
        "lastp AS (SELECT host, arg_max(lon5, us) AS llon, "
        "arg_max(lat5, us) AS llat FROM pts GROUP BY host) "
        "SELECT a.host, n::BIGINT AS n_points, l1_path, "
        "(abs(llon - flon) + abs(llat - flat))::BIGINT AS net_l1, "
        "((n * stot - sdx * sdx - sdy * sdy) // (n * n))::BIGINT "
        "AS gyr_q FROM agg a JOIN lastp USING (host)"
    )


# --- TPC-H completion batch (session-12) twins. Money convention
# everywhere: round(x*100)::BIGINT == np.rint on 2-dp values (no .5
# ties possible at 2 decimals x100).

_REV = ("round(l_extendedprice * 100)::BIGINT * "
        "(100 - round(l_discount * 100)::BIGINT)")


def q_shipping_priority(k: int = 10) -> str:
    """Twin of queries.q_shipping_priority (Q3 shape): order keys are
    unique per group so (revenue_u DESC, l_orderkey) is a total
    order."""
    return (
        "SELECT l_orderkey, epoch_us(o_orderdate) AS odate_us, "
        f"sum({_REV})::BIGINT AS revenue_u "
        "FROM customer, orders, lineitem "
        "WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey "
        "AND l_orderkey = o_orderkey "
        "AND o_orderdate < TIMESTAMP '1998-06-01' "
        "AND l_shipdate > TIMESTAMP '1998-06-01' "
        "GROUP BY 1, 2 "
        f"ORDER BY revenue_u DESC, l_orderkey LIMIT {k}"
    )


def q_late_order_priority() -> str:
    """Twin of queries.q_late_order_priority (Q4 shape, adapted:
    EXISTS lineitem shipped > 90 days after the order date)."""
    return (
        "SELECT o_orderpriority, count(*)::BIGINT AS n_orders "
        "FROM orders WHERE o_orderdate >= TIMESTAMP '1997-07-01' "
        "AND o_orderdate < TIMESTAMP '1997-10-01' "
        "AND EXISTS (SELECT 1 FROM lineitem "
        "WHERE l_orderkey = o_orderkey "
        "AND l_shipdate > o_orderdate + INTERVAL 90 DAY) "
        "GROUP BY 1"
    )


def q_nation_pair_trade() -> str:
    """Twin of queries.q_nation_pair_trade (Q7 shape)."""
    return (
        "SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation, "
        "year(l_shipdate)::BIGINT AS l_year, "
        f"sum({_REV})::BIGINT AS revenue_u "
        "FROM supplier, lineitem, orders, customer, "
        "nation ns, nation nc "
        "WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey "
        "AND c_custkey = o_custkey AND s_nationkey = ns.n_nationkey "
        "AND c_nationkey = nc.n_nationkey "
        "AND ((ns.n_nationkey = 3 AND nc.n_nationkey = 8) "
        "OR (ns.n_nationkey = 8 AND nc.n_nationkey = 3)) "
        "AND l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1998-01-01' "
        "GROUP BY 1, 2, 3"
    )


def q_market_share() -> str:
    """Twin of queries.q_market_share (Q8 shape): exact ppm trunc
    ratio (both sums positive, so // is floor == trunc)."""
    return (
        "WITH base AS (SELECT year(o_orderdate)::BIGINT AS o_year, "
        f"{_REV} AS rev, s_nationkey "
        "FROM part, lineitem, supplier, orders, customer, "
        "nation nc, region "
        "WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey "
        "AND l_orderkey = o_orderkey AND o_custkey = c_custkey "
        "AND c_nationkey = nc.n_nationkey "
        "AND nc.n_regionkey = r_regionkey AND r_name = 'AMERICA' "
        "AND o_orderdate >= TIMESTAMP '1996-01-01' "
        "AND o_orderdate < TIMESTAMP '1998-01-01' "
        "AND p_type = 'ECONOMY') "
        "SELECT o_year, sum(rev)::BIGINT AS rev_all_u, "
        "sum(CASE WHEN s_nationkey = 3 THEN rev ELSE 0 END)::BIGINT "
        "AS rev_nation_u, "
        "(sum(CASE WHEN s_nationkey = 3 THEN rev ELSE 0 END) "
        "* 1000000 // sum(rev))::BIGINT AS share_ppm "
        "FROM base GROUP BY 1"
    )


def q_product_profit() -> str:
    """Twin of queries.q_product_profit (Q9 shape, adapted: unit cost
    = half the retail price, exact in cents x100 scale)."""
    return (
        "SELECT n_name, year(o_orderdate)::BIGINT AS o_year, "
        f"sum({_REV} - round(l_quantity)::BIGINT * "
        "round(p_retailprice * 100)::BIGINT * 50)::BIGINT AS profit_u "
        "FROM part, lineitem, supplier, orders, nation "
        "WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey "
        "AND l_orderkey = o_orderkey "
        "AND s_nationkey = n_nationkey "
        "AND p_name LIKE '%gear%' "
        "GROUP BY 1, 2"
    )


def q_brand_discount_revenue() -> str:
    """Twin of queries.q_brand_discount_revenue (Q19 shape)."""
    return (
        f"SELECT coalesce(sum({_REV}), 0)::BIGINT AS revenue_u, "
        "count(*)::BIGINT AS n_items "
        "FROM lineitem JOIN part ON p_partkey = l_partkey "
        "WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 "
        "AND p_size BETWEEN 1 AND 5) "
        "OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 "
        "AND p_size BETWEEN 1 AND 10) "
        "OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 "
        "AND p_size BETWEEN 1 AND 15)"
    )


def q_min_cost_supplier() -> str:
    """Twin of queries.q_min_cost_supplier (Q2 shape, adapted: offers
    derived from lineitem, unit_cents = cents // qty exact trunc on
    positives; argmin tie -> min suppkey)."""
    return (
        "WITH eu AS (SELECT s_suppkey FROM supplier "
        "JOIN nation ON s_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "WHERE r_name = 'EUROPE'), "
        "pk AS (SELECT p_partkey FROM part WHERE p_type = 'SMALL'), "
        "offers AS (SELECT l_partkey, l_suppkey, "
        "round(l_extendedprice * 100)::BIGINT "
        "// round(l_quantity)::BIGINT AS uc "
        "FROM lineitem JOIN eu ON l_suppkey = s_suppkey "
        "JOIN pk ON l_partkey = p_partkey), "
        "best AS (SELECT l_partkey, min(uc) AS uc FROM offers "
        "GROUP BY 1) "
        "SELECT o.l_partkey AS p_partkey, "
        "min(o.l_suppkey)::BIGINT AS s_suppkey, "
        "b.uc::BIGINT AS unit_cents "
        "FROM offers o JOIN best b "
        "ON o.l_partkey = b.l_partkey AND o.uc = b.uc "
        "GROUP BY 1, 3"
    )


def q_important_parts() -> str:
    """Twin of queries.q_important_parts (Q11 shape, adapted: value =
    extended-price cents over NATION_0 suppliers; keep
    value_u * 1000 > total)."""
    return (
        "WITH v AS (SELECT l_partkey, "
        "sum(round(l_extendedprice * 100)::BIGINT)::BIGINT AS value_u "
        "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
        "WHERE s_nationkey = 3 GROUP BY 1) "
        "SELECT l_partkey, value_u FROM v "
        "WHERE value_u * 1000 > (SELECT sum(value_u) FROM v)"
    )


def q_supplier_part_counts() -> str:
    """Twin of queries.q_supplier_part_counts (Q16 shape, adapted:
    the part-supplier relation is distinct lineitem pairs; negative
    balance stands in for complaints)."""
    return (
        "SELECT p_brand, p_type, p_size::BIGINT AS p_size, "
        "count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt "
        "FROM lineitem JOIN part ON p_partkey = l_partkey "
        "JOIN supplier ON s_suppkey = l_suppkey "
        "WHERE s_acctbal >= 0 AND p_brand <> 'Brand#9' "
        "AND p_type <> 'PROMO' "
        "GROUP BY 1, 2, 3"
    )


def q_promo_suppliers() -> str:
    """Twin of queries.q_promo_suppliers (Q20 shape, adapted: 1996
    red-part shipments dominate the pair's all-time quantity)."""
    return (
        "WITH agg AS (SELECT l_suppkey, l_partkey, "
        "sum(round(l_quantity)::BIGINT) AS qa, "
        "sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1997-01-01' "
        "THEN round(l_quantity)::BIGINT ELSE 0 END) AS q96 "
        "FROM lineitem "
        "JOIN part ON p_partkey = l_partkey "
        "JOIN supplier ON s_suppkey = l_suppkey "
        "WHERE p_name LIKE 'red %' AND s_nationkey = 8 "
        "GROUP BY 1, 2) "
        "SELECT DISTINCT s_suppkey, s_name "
        "FROM agg JOIN supplier ON l_suppkey = s_suppkey "
        "WHERE q96 * 2 > qa AND q96 > 0"
    )


# --- Session-12 twins.


def q_best_split() -> str:
    """Twin of the Gini decision stump: per-quantity counts, window
    cumsums, the common-denominator score as HUGEINT::DOUBLE /
    HUGEINT::DOUBLE (num fits int64, so the IEEE double equals the
    engine's int64 ratio), argmin with ties to the smallest
    threshold."""
    return (
        "WITH c AS (SELECT round(l_quantity)::BIGINT AS q, "
        "count(*)::BIGINT AS n, sum(CASE WHEN l_returnflag = 'R' "
        "THEN 1 ELSE 0 END)::BIGINT AS pos FROM lineitem GROUP BY 1), "
        "w AS (SELECT q, sum(n) OVER (ORDER BY q)::BIGINT AS nl, "
        "sum(pos) OVER (ORDER BY q)::BIGINT AS posl FROM c), "
        "t AS (SELECT sum(n)::BIGINT AS nt, sum(pos)::BIGINT AS pt "
        "FROM c), "
        "s AS (SELECT q, nl, posl, nt - nl AS nr, pt - posl AS posr "
        "FROM w, t WHERE nl < nt) "
        "SELECT q AS split_at, nl AS n_left, posl AS pos_left, "
        "nr AS n_right, posr AS pos_right, "
        "((nl * nl - posl * posl - (nl - posl) * (nl - posl))::HUGEINT"
        " * nr + (nr * nr - posr * posr - (nr - posr) * (nr - posr))"
        "::HUGEINT * nl)::DOUBLE / ((nl::HUGEINT * nr)::DOUBLE) "
        "AS score FROM s ORDER BY score, split_at LIMIT 1"
    )


def q_lineitem_moments() -> str:
    """Twin of the grouped moment numerators: HUGEINT power sums,
    exact 128-bit numerator arithmetic, ::DOUBLE cast (same
    round-to-nearest as Python float(int))."""
    return (
        "WITH p AS (SELECT l_returnflag AS flag, "
        "round(l_quantity)::BIGINT AS q FROM lineitem), "
        "a AS (SELECT flag, count(*)::HUGEINT AS n, "
        "sum(q)::HUGEINT AS s1, sum(q * q)::HUGEINT AS s2, "
        "sum(q * q * q)::HUGEINT AS s3, "
        "sum(q * q * q * q)::HUGEINT AS s4 FROM p GROUP BY 1) "
        "SELECT flag, n::BIGINT AS n, s1::BIGINT AS s1, "
        "s2::BIGINT AS s2, "
        "(n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1)::DOUBLE "
        "AS m3_num, "
        "(n * n * n * s4 - 4 * n * n * s1 * s3 "
        "+ 6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1)::DOUBLE "
        "AS m4_num FROM a"
    )


def q_index_search(k: int = 20) -> str:
    """Twin of ranked boolean retrieval: \\b-bounded regex counts ==
    whitespace-token equality counts on the space-separated corpus;
    same (score DESC, doc_id) top-k."""
    tf = ", ".join(
        f"length(regexp_extract_all(text, '\\b{t}\\b'))::BIGINT "
        f"AS tf_{t}" for t in ("hash", "join", "filter"))
    return (
        f"WITH d AS (SELECT doc_id, {tf} FROM documents) "
        "SELECT doc_id, tf_hash, tf_join, tf_filter, "
        "(tf_hash + tf_join + tf_filter)::BIGINT AS score FROM d "
        "WHERE tf_hash > 0 AND tf_join > 0 AND tf_filter > 0 "
        f"ORDER BY score DESC, doc_id LIMIT {k}"
    )


def q_stay_points(radius: int = 20_000_000, min_pts: int = 2) -> str:
    """Twin of stay-point detection: lag window break flags, running
    sum = per-host segment ordinal (counting dropped segments, like
    the engine), GROUP BY segment HAVING n >= min_pts. warc_ts is
    unique so ORDER BY us is total."""
    import re

    from spapy_ray.stages.text import URL_PATTERN

    anon = re.sub(r"\?P<[a-z]+>", "", URL_PATTERN)
    return (
        f"WITH {geo_cte()}, "
        f"pts AS (SELECT regexp_extract(url, '{anon}', 2) AS host, "
        "epoch_us(warc_ts) AS us, "
        "CAST(round(lat * 100000.0) AS BIGINT) AS lat5, "
        "CAST(round(lon * 100000.0) AS BIGINT) AS lon5 FROM geo), "
        "w AS (SELECT host, us, lat5, lon5, "
        "lag(lat5) OVER o AS plat, lag(lon5) OVER o AS plon "
        "FROM pts WINDOW o AS (PARTITION BY host ORDER BY us)), "
        "b AS (SELECT host, us, lat5, lon5, "
        "CASE WHEN plat IS NULL OR abs(lat5 - plat) + "
        f"abs(lon5 - plon) > {radius} THEN 1 ELSE 0 END AS brk "
        "FROM w), "
        "s AS (SELECT host, us, lat5, lon5, sum(brk) OVER "
        "(PARTITION BY host ORDER BY us) AS seg FROM b) "
        "SELECT host, seg::BIGINT AS seg_id, count(*)::BIGINT AS "
        "n_points, (max(us) - min(us))::BIGINT AS dwell_us, "
        "sum(lon5)::BIGINT AS sum_x, sum(lat5)::BIGINT AS sum_y "
        f"FROM s GROUP BY host, seg HAVING count(*) >= {min_pts}"
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


def q_l_diversity(l_min: int = 3) -> str:
    """Twin of the l-diversity audit: plain join + COUNT(DISTINCT)."""
    return (
        "WITH j AS (SELECT c.c_nationkey AS nat, "
        "c.c_mktsegment AS seg, o.o_orderpriority AS pri "
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey) "
        "SELECT nat::BIGINT AS c_nationkey, seg AS c_mktsegment, "
        "count(*)::BIGINT AS n_orders, "
        "count(DISTINCT pri)::BIGINT AS l_div, "
        f"(CASE WHEN count(DISTINCT pri) >= {l_min} THEN 1 ELSE 0 "
        "END)::BIGINT AS safe FROM j GROUP BY 1, 2"
    )


def q_price_exact_median() -> str:
    """Twin of the radix-selection median: two-middle ranks via one
    ordered window (the oracle may sort; the engine may not)."""
    return (
        "WITH c AS (SELECT round(l_extendedprice * 100)::BIGINT AS v "
        "FROM lineitem), "
        "s AS (SELECT v, row_number() OVER (ORDER BY v) - 1 AS r, "
        "count(*) OVER () AS n FROM c) "
        "SELECT max(n)::BIGINT AS n, "
        "(sum(CASE WHEN r = (n - 1) // 2 THEN v ELSE 0 END) "
        "+ sum(CASE WHEN r = n // 2 THEN v ELSE 0 END))::BIGINT "
        "AS median_x2 FROM s"
    )


def q_domain_mix() -> str:
    """Twin of temperature mixing: floor(sqrt(n::DOUBLE)) == isqrt(n)
    for n < 2^52 (correctly-rounded sqrt of n < (k+1)^2 sits below
    k+1 by >= 1/(2(k+1)) >> half an ulp), same fnv hash order, same
    integer quota."""
    h = sql_fnv1a("doc_id::VARCHAR")
    return (
        "WITH c AS (SELECT source, count(*)::BIGINT AS n_d "
        "FROM documents GROUP BY 1), "
        "w AS (SELECT source, floor(sqrt(n_d::DOUBLE))::BIGINT AS w_d "
        "FROM c), "
        "tot AS (SELECT sum(w_d)::BIGINT AS ws, "
        "(SELECT count(*) // 4 FROM documents)::BIGINT AS nt FROM w), "
        "k AS (SELECT source, (nt * w_d) // ws AS k_d FROM w, tot), "
        f"hh AS (SELECT source, doc_id, {h} AS hv FROM documents), "
        "r AS (SELECT source, doc_id, row_number() OVER "
        "(PARTITION BY source ORDER BY hv, doc_id) AS rn FROM hh) "
        "SELECT r.source, r.doc_id, rn::BIGINT AS rn "
        "FROM r JOIN k USING (source) WHERE rn <= k_d"
    )


def q_ngram_diversity() -> str:
    """Twin of per-source shingle diversity: lead()-built 3-grams
    (same window as the cosine-pairs twin), COUNT(DISTINCT term) and
    COUNT(*) per source, integer ppm."""
    return (
        "WITH w AS (SELECT source, doc_id, "
        "generate_subscripts(string_split(text, ' '), 1) AS pos, "
        "unnest(string_split(text, ' ')) AS tok FROM documents), "
        "sh AS (SELECT source, tok || '_' "
        "|| lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) "
        "|| '_' "
        "|| lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) "
        "AS term FROM w), "
        "f AS (SELECT source, term FROM sh WHERE term IS NOT NULL) "
        "SELECT source, count(DISTINCT term)::BIGINT AS n_distinct, "
        "count(*)::BIGINT AS n_total, "
        "(1000000 * count(DISTINCT term)) // count(*) AS div_ppm "
        "FROM f GROUP BY 1"
    )


def q_cust_cohort_ltv() -> str:
    """Twin of the cohort LTV curves: months-since-epoch calendar
    (== numpy datetime64[M]), min-month cohorts, window cumsum."""
    return (
        "WITH o AS (SELECT o_custkey AS c, "
        "(year(o_orderdate) - 1970) * 12 + month(o_orderdate) - 1 "
        "AS ym, round(o_totalprice * 100)::BIGINT AS cents "
        "FROM orders), "
        "f AS (SELECT c, min(ym) AS coh FROM o GROUP BY 1), "
        "nc AS (SELECT coh, count(*)::BIGINT AS n_custs FROM f "
        "GROUP BY 1), "
        "r AS (SELECT coh, (ym - coh) AS k, sum(cents)::BIGINT AS "
        "rev FROM o JOIN f USING (c) GROUP BY 1, 2) "
        "SELECT coh::BIGINT AS cohort_ym, k::BIGINT AS k, n_custs, "
        "rev AS rev_cents, "
        "sum(rev) OVER (PARTITION BY coh ORDER BY k)::BIGINT AS "
        "cum_cents FROM r JOIN nc USING (coh)"
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


def q_events_sax(w: int = 8) -> str:
    """Twin of SAX symbolization: same rank order (ts unique per
    user; event_id tie guard anyway), integer cross-multiplied
    thresholds, string_agg ORDER BY seg."""
    return (
        "WITH e AS (SELECT user_id::BIGINT AS user_id, "
        "round(value * 100)::BIGINT AS cents, "
        "row_number() OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS rn FROM events), "
        f"s AS (SELECT user_id, (rn - 1) // {w} AS seg, "
        "sum(cents)::BIGINT AS sm, count(*)::BIGINT AS n FROM e "
        "GROUP BY 1, 2), "
        "y AS (SELECT user_id, seg, "
        "CASE WHEN sm < 1500 * n THEN 'a' "
        "WHEN sm < 3600 * n THEN 'b' "
        "WHEN sm < 7200 * n THEN 'c' ELSE 'd' END AS sym FROM s) "
        "SELECT user_id, count(*)::BIGINT AS n_segs, "
        "string_agg(sym, '' ORDER BY seg) AS sax FROM y GROUP BY 1"
    )


def q_hotspot_cube() -> str:
    """Twin of the space-time hot-spot cube: same nonneg integer
    voxel bins (floor == trunc after the +offset shift), 27-offset
    CROSS JOIN scatter, occupied-voxel join, integer hot test."""
    offs = ", ".join(f"({dx}, {dy}, {dt})" for dx in (-1, 0, 1)
                     for dy in (-1, 0, 1) for dt in (-1, 0, 1))
    return (
        f"WITH {geo_cte()}, "
        "p AS (SELECT ((CAST(round(lon * 100000.0) AS BIGINT) "
        "+ 18000000) // 100000) AS hx, "
        "((CAST(round(lat * 100000.0) AS BIGINT) + 8500000) "
        "// 100000) AS hy, "
        "(epoch_us(warc_ts) // 3600000000) AS hr FROM geo), "
        "c AS (SELECT hx, hy, hr, count(*)::BIGINT AS n FROM p "
        "GROUP BY 1, 2, 3), "
        "t AS (SELECT sum(n)::BIGINT AS nn, count(*)::BIGINT AS cc "
        "FROM c), "
        f"o(dx, dy, dt) AS (SELECT * FROM (VALUES {offs})), "
        "s AS (SELECT c.hx + dx AS hx, c.hy + dy AS hy, "
        "c.hr + dt AS hr, sum(n)::BIGINT AS s27 "
        "FROM c CROSS JOIN o GROUP BY 1, 2, 3) "
        "SELECT c.hx::BIGINT AS hx, c.hy::BIGINT AS hy, "
        "c.hr::BIGINT AS hr, c.n, s.s27, "
        "(CASE WHEN s.s27 * t.cc > 54 * t.nn THEN 1 ELSE 0 END)"
        "::BIGINT AS hot "
        "FROM c JOIN s USING (hx, hy, hr), t"
    )


def q_best_feature() -> str:
    """Twin of root-node feature selection: one histogram CTE per
    feature, identical Gini formula, UNION ALL, global (score,
    feature, split_at) argmin."""
    def branch(expr: str, name: str) -> str:
        return (
            f"SELECT '{name}' AS feature, {expr} AS v, "
            "count(*)::BIGINT AS n, sum(CASE WHEN l_returnflag = 'R' "
            "THEN 1 ELSE 0 END)::BIGINT AS pos FROM lineitem "
            "GROUP BY 2")

    u = " UNION ALL ".join([
        branch("round(l_quantity)::BIGINT", "qty"),
        branch("round(l_discount * 100)::BIGINT", "disc"),
        branch("round(l_tax * 100)::BIGINT", "tax")])
    return (
        f"WITH c AS ({u}), "
        "w AS (SELECT feature, v, "
        "sum(n) OVER (PARTITION BY feature ORDER BY v)::BIGINT AS nl, "
        "sum(pos) OVER (PARTITION BY feature ORDER BY v)::BIGINT "
        "AS posl, sum(n) OVER (PARTITION BY feature)::BIGINT AS nt, "
        "sum(pos) OVER (PARTITION BY feature)::BIGINT AS pt FROM c), "
        "s AS (SELECT feature, v, nl, posl, nt - nl AS nr, "
        "pt - posl AS posr FROM w WHERE nl < nt) "
        "SELECT feature, v AS split_at, nl AS n_left, "
        "posl AS pos_left, nr AS n_right, posr AS pos_right, "
        "((nl * nl - posl * posl - (nl - posl) * (nl - posl))::HUGEINT"
        " * nr + (nr * nr - posr * posr - (nr - posr) * (nr - posr))"
        "::HUGEINT * nl)::DOUBLE / ((nl::HUGEINT * nr)::DOUBLE) "
        "AS score FROM s ORDER BY score, feature, split_at LIMIT 1"
    )


def q_heading_rose() -> str:
    """Twin of the compass rose: lag window steps, the same exact
    sign/abs sector CASE."""
    import re

    from spapy_ray.stages.text import URL_PATTERN

    anon = re.sub(r"\?P<[a-z]+>", "", URL_PATTERN)
    return (
        f"WITH {geo_cte()}, "
        f"pts AS (SELECT regexp_extract(url, '{anon}', 2) AS host, "
        "epoch_us(warc_ts) AS us, "
        "CAST(round(lat * 100000.0) AS BIGINT) AS lat5, "
        "CAST(round(lon * 100000.0) AS BIGINT) AS lon5 FROM geo), "
        "w AS (SELECT host, lon5 - lag(lon5) OVER o AS dx, "
        "lat5 - lag(lat5) OVER o AS dy, "
        "(lag(lon5) OVER o IS NULL) AS first "
        "FROM pts WINDOW o AS (PARTITION BY host ORDER BY us)), "
        "d AS (SELECT host, CASE "
        "WHEN dx = 0 AND dy = 0 THEN 'O' "
        "WHEN abs(dx) > abs(dy) THEN "
        "(CASE WHEN dx > 0 THEN 'E' ELSE 'W' END) "
        "WHEN abs(dy) > abs(dx) THEN "
        "(CASE WHEN dy > 0 THEN 'N' ELSE 'S' END) "
        "WHEN dy > 0 THEN (CASE WHEN dx > 0 THEN 'NE' ELSE 'NW' END) "
        "ELSE (CASE WHEN dx > 0 THEN 'SE' ELSE 'SW' END) END AS dir "
        "FROM w WHERE NOT first) "
        "SELECT host, dir, count(*)::BIGINT AS n FROM d GROUP BY 1, 2"
    )


def q_zone_lang_mix() -> str:
    """Twin of the zone language mix: PIP join CTE, per-(zone, lang)
    counts, row_number majority with the same tie order."""
    return (
        f"WITH {join_cte()}, "
        "c AS (SELECT zone_id, lang, count(*)::BIGINT AS n "
        "FROM joined GROUP BY 1, 2), "
        "r AS (SELECT zone_id, lang, n, row_number() OVER "
        "(PARTITION BY zone_id ORDER BY n DESC, lang) AS rn FROM c), "
        "t AS (SELECT zone_id, lang AS top_lang, n AS top_n FROM r "
        "WHERE rn = 1), "
        "a AS (SELECT zone_id, sum(n)::BIGINT AS n_pages, "
        "count(*)::BIGINT AS n_langs FROM c GROUP BY 1) "
        "SELECT a.zone_id::BIGINT AS zone_id, n_pages, n_langs, "
        "top_lang, top_n FROM a JOIN t USING (zone_id)"
    )


def q_events_cume_dist() -> str:
    """Twin of integer cume_dist: the RANGE frame count includes
    peers, exactly the engine's last-of-run index."""
    return (
        "WITH e AS (SELECT user_id::BIGINT AS user_id, "
        "event_id::BIGINT AS event_id, "
        "round(value * 100)::BIGINT AS cents FROM events) "
        "SELECT user_id, event_id, cents, "
        "count(*) OVER (PARTITION BY user_id ORDER BY cents "
        "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT "
        "AS cume_n, "
        "count(*) OVER (PARTITION BY user_id)::BIGINT AS n FROM e"
    )


def q_cms_hosts(k: int = 20) -> str:
    """Twin of the CMS audit: the sketch is deterministic, so SQL
    rebuilds the same matrix — per-host fnv, HUGEINT row hashes mod
    2^62 mod 256 (== the engine's mod-2^64 wrap; 256 | 2^62 | 2^64),
    cell sums, min-over-rows estimates for the same top-k."""
    import re

    from spapy_ray.stages.text import URL_PATTERN

    anon = re.sub(r"\?P<[a-z]+>", "", URL_PATTERN)
    fnv = sql_fnv1a("host")
    M62 = 1 << 62
    mults = ", ".join(f"({r}, {m})" for r, m in enumerate(
        (2654435761, 2246822519, 3266489917, 668265263)))
    return (
        f"WITH {pages_cte()}, "
        f"hl AS (SELECT regexp_extract(url, '{anon}', 2) AS host "
        "FROM pages), "
        f"hh AS (SELECT host, count(*)::BIGINT AS n, ({fnv}) AS f "
        "FROM hl GROUP BY host), "
        f"m(r, mult) AS (SELECT * FROM (VALUES {mults})), "
        "cm AS (SELECT r, ((f::HUGEINT * mult) % "
        f"{M62}) % 256 AS c, sum(n)::BIGINT AS cnt "
        "FROM hh CROSS JOIN m GROUP BY 1, 2), "
        "top AS (SELECT host, n, f FROM hh "
        f"ORDER BY n DESC, host LIMIT {k}) "
        "SELECT t.host, t.n AS true_n, min(cm.cnt)::BIGINT AS est_n "
        "FROM top t CROSS JOIN m "
        "JOIN cm ON cm.r = m.r AND cm.c = "
        f"((t.f::HUGEINT * m.mult) % {M62}) % 256 "
        "GROUP BY 1, 2"
    )


def q_knn_label_vote(k: int = 5) -> str:
    """Twin of the kNN label vote: exact cosine ranks with self
    excluded, the same (count desc, label asc) vote, confusion
    counts."""
    sim = ("list_cosine_similarity("
           "list_transform(q.embedding, x -> x::DOUBLE), "
           "list_transform(e.embedding, x -> x::DOUBLE))")
    return (
        "WITH r AS (SELECT q.vec_id AS qid, e.label AS nlab, "
        f"row_number() OVER (PARTITION BY q.vec_id ORDER BY {sim} "
        "DESC, e.vec_id) AS rank "
        "FROM embeddings q CROSS JOIN embeddings e "
        f"WHERE q.vec_id <> e.vec_id QUALIFY rank <= {k}), "
        "v AS (SELECT qid, nlab, count(*) AS c FROM r GROUP BY 1, 2), "
        "p AS (SELECT qid, nlab, row_number() OVER (PARTITION BY qid "
        "ORDER BY c DESC, nlab) AS rn FROM v) "
        "SELECT q.label::BIGINT AS true_label, p.nlab::BIGINT AS "
        "pred_label, count(*)::BIGINT AS n "
        "FROM p JOIN embeddings q ON p.qid = q.vec_id "
        "WHERE p.rn = 1 GROUP BY 1, 2"
    )


def q_vocab_drift(k: int = 15) -> str:
    """Twin of vocabulary drift: unnest token counts per half, same
    signed cross-product, same (|dnum| desc, term) top-k."""
    return (
        "WITH w AS (SELECT doc_id % 2 AS side, "
        "unnest(string_split(text, ' ')) AS term FROM documents), "
        "c AS (SELECT term, "
        "sum(CASE WHEN side = 0 THEN 1 ELSE 0 END)::BIGINT AS a, "
        "sum(CASE WHEN side = 1 THEN 1 ELSE 0 END)::BIGINT AS b "
        "FROM w GROUP BY 1), "
        "t AS (SELECT sum(a)::BIGINT AS ta, sum(b)::BIGINT AS tb "
        "FROM c) "
        "SELECT term, a, b, (a * tb - b * ta)::BIGINT AS dnum "
        "FROM c, t "
        f"ORDER BY abs(a * tb - b * ta) DESC, term LIMIT {k}"
    )


def q_duplicate_orders(max_gap_days: int = 30) -> str:
    """Twin of the rapid-reorder audit: lag window per customer
    ordered by (day, orderkey), same gap filter."""
    return (
        "WITH o AS (SELECT o_custkey AS c, "
        "round(o_totalprice * 100)::BIGINT AS cents, "
        "(epoch_us(o_orderdate) // 86400000000) AS day, "
        "o_orderkey AS ok FROM orders), "
        "w AS (SELECT c, cents, day, ok, "
        "lag(day) OVER p AS pday, lag(ok) OVER p AS pok, "
        "lag(cents) OVER p AS pcents "
        "FROM o WINDOW p AS (PARTITION BY c ORDER BY day, ok)) "
        "SELECT c::BIGINT AS o_custkey, pok::BIGINT AS ok1, "
        "ok::BIGINT AS ok2, (day - pday)::BIGINT AS gap_days, "
        "abs(cents - pcents)::BIGINT AS diff_cents FROM w "
        f"WHERE pday IS NOT NULL AND day - pday <= {max_gap_days}"
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


def q_geo_corpus_prep(min_tokens: int = 8, cap: int = 50) -> str:
    """Twin of geo corpus prep: PIP join carrying text inline (a
    re-join on url would duplicate rows — urls repeat in the page
    synthesis when i wraps the key modulus), token-length gate, the
    same (fnv(url), url) per-zone cap via QUALIFY."""
    h = sql_fnv1a("url")
    return (
        f"WITH {geo_zones_cte()}, "
        "j AS (SELECT g.url, g.text, z.zone_id "
        "FROM geo g CROSS JOIN zones z "
        f"WHERE {sql_pip_condition('g.lon', 'g.lat')}), "
        f"g2 AS (SELECT zone_id, url, {h} AS hv FROM j "
        f"WHERE length(string_split(text, ' ')) >= {min_tokens}) "
        "SELECT zone_id::BIGINT AS zone_id, url, "
        "row_number() OVER (PARTITION BY zone_id "
        "ORDER BY hv, url)::BIGINT AS rank FROM g2 "
        f"QUALIFY rank <= {cap}"
    )


def q_events_seasonal_error(season: int = 24) -> str:
    """Twin of the forecast baselines: dense hour × type grid via
    generate_series CROSS JOIN, zero-filled LEFT JOIN, lag windows."""
    return (
        "WITH e AS (SELECT event_type, "
        "(epoch_us(ts) // 3600000000) AS hr FROM events), "
        "b AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM e), "
        "hours AS (SELECT unnest(generate_series(h0, h1)) AS hr "
        "FROM b), "
        "types AS (SELECT DISTINCT event_type FROM e), "
        "c AS (SELECT event_type, hr, count(*)::BIGINT AS n FROM e "
        "GROUP BY 1, 2), "
        "d AS (SELECT t.event_type, h.hr, coalesce(c.n, 0) AS n "
        "FROM types t CROSS JOIN hours h "
        "LEFT JOIN c ON c.event_type = t.event_type "
        "AND c.hr = h.hr), "
        "w AS (SELECT event_type, n, "
        "lag(n, 1) OVER o AS p1, "
        f"lag(n, {season}) OVER o AS ps "
        "FROM d WINDOW o AS (PARTITION BY event_type ORDER BY hr)) "
        "SELECT event_type, count(*)::BIGINT AS n_hours, "
        "sum(n)::BIGINT AS n_events, "
        "sum(CASE WHEN p1 IS NULL THEN 0 ELSE abs(n - p1) END)"
        "::BIGINT AS naive_err, "
        "sum(CASE WHEN ps IS NULL THEN 0 ELSE abs(n - ps) END)"
        "::BIGINT AS seasonal_err FROM w GROUP BY 1"
    )


def q_source_distinct_hll(p: int = 8) -> str:
    """Twin of grouped HLL: fnv(text) → the hll mix in HUGEINT →
    per-(source, reg) max rho over the DENSE register range → exact
    big-integer harmonic estimate per source; exact distinct rides
    along."""
    from spapy_ray.stages.relational import HLL_MIX_A, HLL_MIX_B

    m = 1 << p
    rb = 64 - p
    m64 = "18446744073709551616"
    fnv = sql_fnv1a("text")
    return (
        f"WITH x AS (SELECT source, ({fnv}) AS v FROM documents), "
        f"h1 AS (SELECT source, ((xor(v, v >> 33)::HUGEINT * "
        f"{HLL_MIX_A}::HUGEINT) % {m64})::UBIGINT AS h FROM x), "
        f"h2 AS (SELECT source, ((xor(h, h >> 29)::HUGEINT * "
        f"{HLL_MIX_B}::HUGEINT) % {m64})::UBIGINT AS h FROM h1), "
        "hf AS (SELECT source, xor(h, h >> 32) AS h FROM h2), "
        f"r AS (SELECT source, (h >> {rb})::BIGINT AS reg, "
        f"CASE WHEN (h % (1::UBIGINT << {rb})) = 0 THEN {rb + 1} "
        f"ELSE strpos(lpad(bin(h % (1::UBIGINT << {rb})), {rb}, "
        "'0'), '1') END::BIGINT AS rho FROM hf), "
        "mx AS (SELECT source, reg, max(rho) AS rho FROM r "
        "GROUP BY 1, 2), "
        "srcs AS (SELECT DISTINCT source FROM x), "
        f"allr AS (SELECT source, pp::BIGINT AS reg FROM srcs "
        f"CROSS JOIN range({m}) t(pp)), "
        "j AS (SELECT allr.source, allr.reg, "
        "coalesce(mx.rho, 0)::BIGINT AS rho FROM allr "
        "LEFT JOIN mx USING (source, reg)), "
        f"d AS (SELECT source, sum(1::HUGEINT << ({rb + 1} - rho)) "
        "AS den FROM j GROUP BY 1), "
        "ex AS (SELECT source, count(DISTINCT v)::BIGINT AS n_exact "
        "FROM x GROUP BY 1) "
        f"SELECT d.source, (({m * m}::HUGEINT << {rb + 1}) "
        "// d.den)::BIGINT AS est_q, ex.n_exact "
        "FROM d JOIN ex USING (source)"
    )


def q_top_hosts_rescore(k: int = 20) -> str:
    """Twin of sketch-then-rescore top-k: the engine certifies
    exactness, so the twin is the plain exact top-k."""
    import re

    from spapy_ray.stages.text import URL_PATTERN

    anon = re.sub(r"\?P<[a-z]+>", "", URL_PATTERN)
    return (
        f"WITH {pages_cte()}, "
        f"h AS (SELECT regexp_extract(url, '{anon}', 2) AS host "
        "FROM pages), "
        "c AS (SELECT host, count(*)::BIGINT AS n FROM h GROUP BY 1) "
        "SELECT host, n, row_number() OVER (ORDER BY n DESC, host)"
        f"::BIGINT AS rank FROM c ORDER BY rank LIMIT {k}"
    )


def q_weighted_doc_sample(k: int = 100) -> str:
    """Twin of the deterministic weighted sample: same fnv >> 1 (into
    int64 range), same integer quotient priority, same total order."""
    h = sql_fnv1a("doc_id::VARCHAR")
    return (
        "WITH p AS (SELECT doc_id::BIGINT AS doc_id, "
        "n_chars::BIGINT AS n_chars, "
        f"(({h}) >> 1)::BIGINT // greatest(n_chars, 1) "
        "AS priority_q FROM documents) "
        "SELECT doc_id, n_chars, priority_q FROM p "
        f"ORDER BY priority_q, doc_id LIMIT {k}"
    )


def q_events_seasonal_anomaly(season: int = 24, k: int = 3) -> str:
    """Twin of seasonal anomaly detection: dense grid + lag
    residuals, two-middle median and MAD via per-type ranked windows,
    the same cross-multiplied integer gate."""
    return (
        "WITH e AS (SELECT event_type, "
        "(epoch_us(ts) // 3600000000) AS hr FROM events), "
        "b AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM e), "
        "hours AS (SELECT unnest(generate_series(h0, h1)) AS hr "
        "FROM b), "
        "types AS (SELECT DISTINCT event_type FROM e), "
        "c AS (SELECT event_type, hr, count(*)::BIGINT AS n FROM e "
        "GROUP BY 1, 2), "
        "d AS (SELECT t.event_type, h.hr, coalesce(c.n, 0) AS n "
        "FROM types t CROSS JOIN hours h "
        "LEFT JOIN c ON c.event_type = t.event_type "
        "AND c.hr = h.hr), "
        "w AS (SELECT event_type, n, "
        f"lag(n, {season}) OVER (PARTITION BY event_type "
        "ORDER BY hr) AS ps FROM d), "
        "r AS (SELECT event_type, (n - ps)::BIGINT AS r FROM w "
        "WHERE ps IS NOT NULL), "
        "rk AS (SELECT event_type, r, row_number() OVER "
        "(PARTITION BY event_type ORDER BY r) - 1 AS rn, "
        "count(*) OVER (PARTITION BY event_type) AS cnt FROM r), "
        "md AS (SELECT event_type, max(cnt)::BIGINT AS n_resid, "
        "(sum(CASE WHEN rn = (cnt - 1) // 2 THEN r ELSE 0 END) + "
        "sum(CASE WHEN rn = cnt // 2 THEN r ELSE 0 END))::BIGINT "
        "AS med_x2 FROM rk GROUP BY 1), "
        "dv AS (SELECT r.event_type, "
        "abs(2 * r.r - md.med_x2)::BIGINT AS d "
        "FROM r JOIN md USING (event_type)), "
        "dk AS (SELECT event_type, d, row_number() OVER "
        "(PARTITION BY event_type ORDER BY d) - 1 AS rn, "
        "count(*) OVER (PARTITION BY event_type) AS cnt FROM dv), "
        "mad AS (SELECT event_type, "
        "(sum(CASE WHEN rn = (cnt - 1) // 2 THEN d ELSE 0 END) + "
        "sum(CASE WHEN rn = cnt // 2 THEN d ELSE 0 END))::BIGINT "
        "AS mad_x4 FROM dk GROUP BY 1) "
        "SELECT md.event_type, md.n_resid, md.med_x2, mad.mad_x4, "
        "(SELECT count(*) FROM dv WHERE dv.event_type = "
        f"md.event_type AND 2 * dv.d > {k} * mad.mad_x4)::BIGINT "
        "AS n_anom "
        "FROM md JOIN mad USING (event_type)"
    )


def q_crawl_politeness() -> str:
    """Twin of the politeness audit: lag gaps per host, ranked
    two-middle median."""
    import re

    from spapy_ray.stages.text import URL_PATTERN

    anon = re.sub(r"\?P<[a-z]+>", "", URL_PATTERN)
    return (
        f"WITH {pages_cte()}, "
        f"p AS (SELECT regexp_extract(url, '{anon}', 2) AS host, "
        "epoch_us(warc_ts) AS us FROM pages), "
        "w AS (SELECT host, us - lag(us) OVER "
        "(PARTITION BY host ORDER BY us) AS gap FROM p), "
        "g AS (SELECT host, gap FROM w WHERE gap IS NOT NULL), "
        "rk AS (SELECT host, gap, row_number() OVER "
        "(PARTITION BY host ORDER BY gap) - 1 AS rn, "
        "count(*) OVER (PARTITION BY host) AS cnt FROM g) "
        "SELECT host, max(cnt)::BIGINT AS n_gaps, "
        "min(gap)::BIGINT AS min_gap_us, "
        "(sum(CASE WHEN rn = (cnt - 1) // 2 THEN gap ELSE 0 END) + "
        "sum(CASE WHEN rn = cnt // 2 THEN gap ELSE 0 END))::BIGINT "
        "AS med_gap_x2 FROM rk GROUP BY 1"
    )


def q_host_zone_affinity() -> str:
    """Twin of host→zone affinity: PIP join CTE, plurality via
    ranked window with the same tie order, integer ppm."""
    import re

    from spapy_ray.stages.text import URL_PATTERN

    anon = re.sub(r"\?P<[a-z]+>", "", URL_PATTERN)
    return (
        f"WITH {join_cte()}, "
        f"hz AS (SELECT regexp_extract(url, '{anon}', 2) AS host, "
        "zone_id FROM joined), "
        "c AS (SELECT host, zone_id, count(*)::BIGINT AS n FROM hz "
        "GROUP BY 1, 2), "
        "r AS (SELECT host, zone_id, n, row_number() OVER "
        "(PARTITION BY host ORDER BY n DESC, zone_id) AS rn, "
        "sum(n) OVER (PARTITION BY host) AS tot FROM c) "
        "SELECT host, tot::BIGINT AS n_pages, "
        "zone_id::BIGINT AS top_zone, n AS top_n, "
        "(1000000 * n) // tot::BIGINT AS share_ppm "
        "FROM r WHERE rn = 1"
    )


def q_events_runs_test() -> str:
    """Twin of the runs test: ranked two-middle median per user,
    above = 2v > med_x2, runs = 1 + lag transitions."""
    return (
        "WITH e AS (SELECT user_id::BIGINT AS user_id, "
        "epoch_us(ts) AS us, event_id, "
        "round(value * 100)::BIGINT AS v FROM events), "
        "rk AS (SELECT user_id, v, row_number() OVER "
        "(PARTITION BY user_id ORDER BY v) - 1 AS rn, "
        "count(*) OVER (PARTITION BY user_id) AS cnt FROM e), "
        "md AS (SELECT user_id, "
        "(sum(CASE WHEN rn = (cnt - 1) // 2 THEN v ELSE 0 END) + "
        "sum(CASE WHEN rn = cnt // 2 THEN v ELSE 0 END))::BIGINT "
        "AS med2 FROM rk GROUP BY 1), "
        "s AS (SELECT e.user_id, e.us, e.event_id, "
        "(2 * e.v > md.med2) AS above "
        "FROM e JOIN md USING (user_id)), "
        "w AS (SELECT user_id, above, lag(above) OVER "
        "(PARTITION BY user_id ORDER BY us, event_id) AS pa FROM s) "
        "SELECT user_id, count(*)::BIGINT AS n, "
        "sum(CASE WHEN above THEN 1 ELSE 0 END)::BIGINT AS n_above, "
        "(1 + sum(CASE WHEN pa IS NOT NULL AND above <> pa "
        "THEN 1 ELSE 0 END))::BIGINT AS n_runs FROM w GROUP BY 1"
    )


def q_zone_recency() -> str:
    """Twin of zone freshness: plain per-zone max/count over the PIP
    join rows."""
    return (
        f"WITH {join_cte()} "
        "SELECT zone_id::BIGINT AS zone_id, "
        "max(epoch_us(warc_ts))::BIGINT AS last_us, "
        "count(*)::BIGINT AS n_pages FROM joined GROUP BY 1"
    )


def q_delta_view_merge() -> str:
    """Twin of the incremental-view check: the FULL recompute (the
    invariant the base⊕delta merge must equal)."""
    return (
        "SELECT event_type, "
        "sum(round(value * 100)::BIGINT)::BIGINT AS sum_cents, "
        "count(*)::BIGINT AS n_events FROM events GROUP BY 1"
    )


def q_value_qq_table(knots: int = 16) -> str:
    """Twin of the QQ table: per-side ranked windows, order statistic
    at (cnt−1)·i//16 for each knot. Weekend rule: ((day+4)%7) >= 5
    (same epoch-day convention as the overlap sketch)."""
    return (
        "WITH e AS (SELECT round(value * 100)::BIGINT AS v, "
        "(((epoch_us(ts) // 86400000000) + 4) % 7) >= 5 AS we "
        "FROM events), "
        "rk AS (SELECT v, we, row_number() OVER "
        "(PARTITION BY we ORDER BY v) - 1 AS rn, "
        "count(*) OVER (PARTITION BY we) AS cnt FROM e), "
        f"k AS (SELECT unnest(generate_series(0, {knots})) AS knot), "
        "wd AS (SELECT k.knot, rk.v FROM k JOIN rk "
        f"ON NOT rk.we AND rk.rn = (rk.cnt - 1) * k.knot // {knots}), "
        "wk AS (SELECT k.knot, rk.v FROM k JOIN rk "
        f"ON rk.we AND rk.rn = (rk.cnt - 1) * k.knot // {knots}) "
        "SELECT wd.knot::BIGINT AS knot, wd.v AS weekday_v, "
        "wk.v AS weekend_v FROM wd JOIN wk USING (knot)"
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


def q_events_hour_hhi() -> str:
    """Twin of hour-of-day concentration: per-(type, hour) counts,
    Σn² fold."""
    return (
        "WITH c AS (SELECT event_type, "
        "(epoch_us(ts) // 3600000000) % 24 AS hod, "
        "count(*)::BIGINT AS n FROM events GROUP BY 1, 2) "
        "SELECT event_type, sum(n)::BIGINT AS n_events, "
        "count(*)::BIGINT AS n_hours, "
        "sum(n * n)::BIGINT AS hhi_num FROM c GROUP BY 1"
    )


def q_zone_density() -> str:
    """Twin of zone density: PIP counts against the closed-form
    shape-family area, same integer ppm quotient."""
    from spapy_ray.sources.zones import U

    area = ("(CASE WHEN shape IN (0, 1) THEN w * h "
            "WHEN shape = 2 THEN w * h2 + w2 * (h - h2) "
            "ELSE w2 * h2 + (w - w2 - 5000) * (h - h2 - 5000) END)")
    return (
        f"WITH {join_cte()}, "
        "c AS (SELECT zone_id, count(*)::BIGINT AS n_pages "
        "FROM joined GROUP BY 1) "
        "SELECT c.zone_id::BIGINT AS zone_id, c.n_pages, "
        f"{area}::BIGINT AS area_u2, "
        f"(1000000 * c.n_pages * {U * U}) // {area}::BIGINT "
        "AS density_ppm "
        "FROM c JOIN zones USING (zone_id)"
    )
