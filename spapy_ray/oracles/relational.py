"""Relational oracle twins (split from oracle.py)."""

from spapy_ray.oracles.common import *  # noqa: F401,F403


def q_top_zones(k: int = 20) -> str:
    return (f"WITH {join_cte()} "
            "SELECT zone_id, count(*)::BIGINT AS n_pages FROM joined GROUP BY zone_id "
            f"ORDER BY n_pages DESC, zone_id LIMIT {k}")


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


def q_events_hourly() -> str:
    return (
        "SELECT user_id, epoch_us(ts) // 3600000000 AS hour, "
        "count(*)::BIGINT AS n_events, round(sum(value), 2) AS sum_value "
        "FROM events GROUP BY 1, 2"
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


def q_events_distinct_users() -> str:
    return ("SELECT event_type, count(DISTINCT user_id)::BIGINT "
            "AS n_users FROM events GROUP BY event_type")


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


def q_events_rolling(width: int = 5) -> str:
    return (
        "SELECT user_id, event_id, "
        "sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) OVER "
        "(PARTITION BY user_id ORDER BY epoch_us(ts), event_id "
        f"ROWS BETWEEN {width - 1} PRECEDING AND CURRENT ROW)::BIGINT "
        f"AS roll{width}_cents FROM events"
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


def q_events_dow_hour() -> str:
    """Twin of the seasonal profile (dayofweek 0=Sunday; integer
    epoch arithmetic on both sides)."""
    return (
        "SELECT ((epoch_us(ts) // 86400000000 + 4) % 7)::BIGINT "
        "AS dow, "
        "((epoch_us(ts) % 86400000000) // 3600000000)::BIGINT "
        "AS hour, count(*)::BIGINT AS n FROM events GROUP BY 1, 2"
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


def q_events_dense_rank() -> str:
    """Twin of queries.q_events_dense_rank."""
    return (
        "SELECT event_id, event_type, "
        "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents, "
        "dense_rank() OVER (PARTITION BY event_type "
        "ORDER BY CAST(floor(value * 100.0 + 0.5) AS BIGINT))"
        "::BIGINT AS vrank FROM events"
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
