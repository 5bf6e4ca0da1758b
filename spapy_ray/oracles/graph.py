"""Graph oracle twins (split from oracle.py)."""

from spapy_ray.oracles.common import *  # noqa: F401,F403


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
