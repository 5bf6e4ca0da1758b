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


def _tile_stats_select(val: str, src: str) -> str:
    return (f"SELECT (px // 64)::BIGINT AS tx, (py // 64)::BIGINT AS ty, "
            f"sum({val})::BIGINT AS sum_v, min({val})::BIGINT AS min_v, "
            f"max({val})::BIGINT AS max_v, count(*)::BIGINT AS n_px "
            f"FROM {src} GROUP BY 1, 2")


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


def _hex4_int(col: str) -> str:
    """SQL expression: 4-char uppercase-hex string -> BIGINT."""
    def d(i):
        return f"(strpos('0123456789ABCDEF', substr({col}, {i}, 1)) - 1)"
    return (f"((({d(1)} * 16 + {d(2)}) * 16 + {d(3)}) * 16 + {d(4)})"
            "::BIGINT")


_REV = ("round(l_extendedprice * 100)::BIGINT * "
        "(100 - round(l_discount * 100)::BIGINT)")


__all__ = [n for n in globals()
           if not n.startswith('__')]
