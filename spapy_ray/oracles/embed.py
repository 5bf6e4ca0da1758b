"""Embed oracle twins (split from oracle.py)."""

from spapy_ray.oracles.common import *  # noqa: F401,F403


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


def q_events_quantiles() -> str:
    """Twin of stages.quantiles.grouped_quantile (quantile_disc
    semantics: exact element at 1-based rank max(1, ceil(q*n)))."""
    parts = [
        (f"SELECT event_type, {q} AS q, "
         f"quantile_disc(value, {q}) AS value "
         "FROM events GROUP BY event_type")
        for q in (0.25, 0.5, 0.9)]
    return " UNION ALL ".join(parts)


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


def q_price_quantile_sketch() -> str:
    """Twin of quantiles.quantile_sketch in the no-compaction regime:
    quantile_disc at each q (same max(1, ceil(q*n)) rank rule the
    exact grouped path verified numerically)."""
    qs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    return " UNION ALL ".join(
        f"SELECT {q}::DOUBLE AS q, "
        f"quantile_disc(l_extendedprice, {q})::DOUBLE AS value "
        "FROM lineitem" for q in qs)


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
