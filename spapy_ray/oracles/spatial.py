"""Spatial oracle twins (split from oracle.py)."""

from spapy_ray.oracles.common import *  # noqa: F401,F403


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


def q_zone_page_counts() -> str:
    return (f"WITH {join_cte()} "
            "SELECT zone_id, count(*)::BIGINT AS n_pages FROM joined GROUP BY zone_id")


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


def q_suppliers_per_nation() -> str:
    return ("SELECT n.n_name, count(*)::BIGINT AS n_suppliers "
            "FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey "
            "GROUP BY n.n_name")


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


def q_dataset_bounds() -> str:
    """Twin of queries.q_dataset_bounds: min/max fold over the
    geocoded coordinates (no arithmetic beyond the geocode CTE —
    min/max of doubles is exact)."""
    return (f"WITH {geo_cte()} "
            "SELECT min(lon) AS minx, min(lat) AS miny, "
            "max(lon) AS maxx, max(lat) AS maxy FROM geo")


def q_semi_pages(anti: bool = False) -> str:
    """Twin of stages.relate.point_semi_join: keep pages whose
    geocoded point lies in ANY zone (semi) / NO zone (anti)."""
    ex = "NOT EXISTS" if anti else "EXISTS"
    return (f"WITH {geo_zones_cte()} "
            "SELECT g.url, g.warc_ts, g.lang FROM geo g "
            f"WHERE {ex} (SELECT 1 FROM zones z WHERE "
            f"{sql_pip_condition('g.lon', 'g.lat')})")


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


def q_sample_stratified() -> str:
    """Twin of stages.relational.hash_sample_stratified with the
    query's per-language rate table (pt falls to the default)."""
    num = ("CASE lang WHEN 'fr' THEN 3 ELSE 1 END")
    den = ("CASE lang WHEN 'en' THEN 2 WHEN 'es' THEN 4 "
           "WHEN 'de' THEN 8 ELSE 16 END")
    return (f"WITH {pages_cte()} "
            "SELECT url, warc_ts, lang FROM pages "
            f"WHERE ({sql_fnv1a('url')} % {den}) < {num}")


def q_orders_lineitem_join() -> str:
    return ("SELECT l_orderkey, l_linenumber, l_extendedprice, "
            "o_orderpriority FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey")


def q_customers_without_orders() -> str:
    return ("SELECT c_custkey, c_name FROM customer "
            "WHERE NOT EXISTS (SELECT 1 FROM orders "
            "WHERE o_custkey = c_custkey AND o_orderstatus = 'F')")


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


def q_dataset_split(den: int = 100) -> str:
    """Twin of relational.hash_split 80/10/10 by url → per-(split,
    lang) counts."""
    h = f"({sql_fnv1a('url')} % {den})"
    case = (f"CASE WHEN {h} < 80 THEN 'train' "
            f"WHEN {h} < 90 THEN 'val' ELSE 'test' END")
    return (f"WITH {pages_cte()} "
            f"SELECT {case} AS split, lang, count(*)::BIGINT AS n_pages "
            "FROM pages GROUP BY 1, 2")


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


def q_zone_recency() -> str:
    """Twin of zone freshness: plain per-zone max/count over the PIP
    join rows."""
    return (
        f"WITH {join_cte()} "
        "SELECT zone_id::BIGINT AS zone_id, "
        "max(epoch_us(warc_ts))::BIGINT AS last_us, "
        "count(*)::BIGINT AS n_pages FROM joined GROUP BY 1"
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
