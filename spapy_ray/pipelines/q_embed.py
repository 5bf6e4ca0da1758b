"""Embed query pipelines (split from queries.py; registry order lives in
pipelines/queries.py)."""

from spapy_ray.pipelines.qcommon import *  # noqa: F401,F403


def q_ann_topk(sf_dir: str, k: int = 5, n_queries: int = 10):
    import pyarrow.parquet as pq

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qt = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"],
                       filters=[("vec_id", "<", n_queries)])
    from spapy_ray.stages.ann import _stack_embeddings

    qids = qt.column("vec_id").to_numpy()
    qmat = _stack_embeddings(qt.column("embedding"))
    return cosine_topk(ds, qids, qmat, k=k)


def q_embed_top_pairs(sf_dir: str, n_pairs: int = 20):
    """Embedding-cosine near-dup, top-pairs form: the 20 most similar
    embedding pairs via the EXACT scale path — one Ray task per block
    pair (bounded [chunk x chunk] GEMM, tie-safe local top-N), no
    driver-side embedding matrix (VERDICT r2 #4; the LSH mode exists
    for approximate high-similarity search but cannot recall low-
    cosine 'most similar' pairs, so the exact query uses blockpair).
    Output is rank-only so float summation order cannot break the
    hash — pair cosines in the fixture are separated by >=1e-4."""
    from spapy_ray.stages.ann import top_similar_pairs

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return top_similar_pairs(ds, n_pairs=n_pairs, key_col="vec_id",
                             mode="blockpair")


def q_ann_topk_ivf(sf_dir: str, k: int = 5, n_queries: int = 10):
    """The IVF ANN path (coarse quantizer + cluster pruning +
    probe-set masking + per-query merge) pinned EXACT: with
    n_probe == n_clusters every (cluster, query) cell is probed, so
    the prune drops nothing and the result must equal the exact
    brute-force top-k — the same SQL twin as ann_topk value-hashes
    the whole IVF machinery (assignment, masking, merge). Normal use
    sets n_probe << n_clusters (recall measured in pytest)."""
    import pyarrow.parquet as pq

    from spapy_ray.stages.ann import _stack_embeddings, cosine_topk_ivf

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qt = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"],
                       filters=[("vec_id", "<", n_queries)])
    qids = qt.column("vec_id").to_numpy()
    qmat = _stack_embeddings(qt.column("embedding"))
    return cosine_topk_ivf(ds, qids, qmat, k=k, n_clusters=16, n_probe=16)


def q_events_quantiles(sf_dir: str):
    """Exact per-type percentiles of the event value (distributed
    order statistics by histogram refinement — stages/quantiles.py;
    the values never shuffle, only O(targets x bins) counter rows).
    DuckDB quantile_disc twin, element-exact."""
    from spapy_ray.stages.quantiles import grouped_quantile

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    # bins/max_collect pinned so EXACTLY ONE histogram-refinement
    # round (the 100 TB path) runs under the value-hash gate at every
    # test scale (group sizes 200..20k: n/256 < 100 <= n); production
    # defaults are bins=1024/max_collect=64k
    return grouped_quantile(ds, "event_type", "value",
                            [0.25, 0.5, 0.9], bins=256, max_collect=100)


def q_label_centroids(sf_dir: str):
    """Per-label embedding centroids in exact fixed point
    (ann.vector_group_mean): combiner partial sums, one tiny fold,
    long-form (label, dim_idx, mean_val) bit-identical to the unnest
    WITH ORDINALITY twin."""
    from spapy_ray.stages.ann import vector_group_mean

    ds = _read(sf_dir, "embeddings", columns=["label", "embedding"])
    return vector_group_mean(ds, group_col="label")


def q_cross_corpus_knn(sf_dir: str, k: int = 3):
    """Bipartite embedding kNN join (ann.knn_join_embeddings): each
    label<5 vector retrieves its top-3 label>=5 vectors — block-pair
    GEMM, block refs only on the driver, per-key merge of block-local
    tie-exact top-ks."""
    from spapy_ray.stages.ann import knn_join_embeddings
    from spapy_ray.stages.relational import select_where

    emb = _read(sf_dir, "embeddings",
                columns=["vec_id", "embedding", "label"])
    left = select_where(emb, "label", "<", 5)
    right = select_where(emb, "label", ">=", 5)
    return knn_join_embeddings(left, right, k=k)


def q_price_quantile_sketch(sf_dir: str):
    """One-pass mergeable quantile sketch (KLL-lite) over
    l_extendedprice, pinned in its EXACTNESS regime (capacity 65536
    >= 60k rows at the checked tiers, so nothing compacts and the
    weighted walk IS quantile_disc). The approximate regime's rank
    envelope is pinned by pytest."""
    from spapy_ray.stages.quantiles import quantile_sketch

    li = _read(sf_dir, "lineitem", columns=["l_extendedprice"])
    return quantile_sketch(li, "l_extendedprice",
                           qs=[0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99])


def q_embed_near_dup(sf_dir: str, threshold: float = 0.45):
    """Embedding-cosine near-dup, exact brute-force baseline: every
    unordered pair with cosine >= threshold via one GEMM task per
    block pair (driver holds block refs only; result assembled with
    from_pandas_refs). cos quantized to 1e-6 so the float column
    hash-matches DuckDB's double cosine (both paths compute in
    float64; the fixture's nearest cosines sit 2e-3 from the
    threshold, so the pair set is ulp-robust)."""
    from spapy_ray.stages.ann import cosine_threshold_pairs

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    pairs = cosine_threshold_pairs(ds, threshold=threshold)

    def quant(t: pa.Table) -> pa.Table:
        cos = np.asarray(t.column("cos").to_numpy(zero_copy_only=False),
                         dtype=np.float64)
        return pa.table({
            "key_a": t.column("key_a"),
            "key_b": t.column("key_b"),
            "cos_u": pa.array(np.floor(cos * 1e6).astype(np.int64))})

    return pairs.map_batches(quant, batch_format="pyarrow")


def q_embed_near_dup_lsh(sf_dir: str, threshold: float = 0.99):
    """Embedding-cosine near-dup, LSH-bucketed scale path: hyperplane
    signatures → banded bucket shuffle → co-partitioned exact-cosine
    verify (verify="join" pinned so the corpus-scale path is under
    the value hash). The corpus is the embeddings table unioned with
    a key-shifted byte-identical copy of itself: identical vectors
    produce identical sign signatures, so every planted pair collides
    in EVERY band — recall is deterministically 1, which is what
    makes an exact oracle possible (the fixture's max non-identical
    cosine is 0.51, far below the threshold). The approximate-recall
    regime is pinned separately in tests/test_ann.py."""
    from spapy_ray.stages.ann import embed_near_dup_lsh

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def shifted(t: pa.Table) -> pa.Table:
        return pa.table({"vec_id": pc.add(t.column("vec_id"), 100000),
                         "embedding": t.column("embedding")})

    both = ds.union(ds.map_batches(shifted, batch_format="pyarrow"))
    first = ds.limit(1).to_pandas()
    dim = len(first["embedding"].iloc[0])
    # bands=4 -> 16-bit band hashes (65k buckets/band): random
    # collisions scale as n^2/2^16 per band instead of n^2/2^8 —
    # identical-vector recall is 1 for ANY banding (all bands match)
    pairs = embed_near_dup_lsh(both, dim=dim, threshold=threshold,
                               bands=4, verify="join")
    # cos is ~1.0 up to summation ulp — not hashable; the pair SET is
    # the assertion
    return pairs.select_columns(["key_a", "key_b"])


def q_embed_projection(sf_dir: str):
    """Signed random projection of the embeddings table to 8 dims
    (stateless int64 GEMM per batch; FNV-parity sign matrix needs no
    storage) — stages/ann.random_projection."""
    from spapy_ray.stages.ann import random_projection

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return random_projection(ds)


def q_embed_quantize(sf_dir: str):
    """Int8 embedding quantization summary per vector
    (ann.quantize_int8_stats: per-dim min/max fold pass + broadcast
    quantize pass, float64 op-order matched to the SQL twin)."""
    from spapy_ray.stages.ann import quantize_int8_stats

    emb = _read(sf_dir, "embeddings",
                columns=["vec_id", "embedding"])
    return quantize_int8_stats(emb)


def q_price_deciles(sf_dir: str):
    """Exact global price deciles WITHOUT a sort: distributed radix
    selection (quantiles.exact_global_ranks — 4 rounds of per-block
    histogram folds; the equi-depth range-partition planner). Decile
    i picks rank (i*(n-1))//10, bit-identical to the SQL
    row_number twin."""
    from spapy_ray.stages.quantiles import exact_global_ranks

    li = _read(sf_dir, "lineitem", columns=["l_extendedprice"])
    n = li.count()
    ranks = {i: (i * (n - 1)) // 10 for i in range(11)}
    sel = exact_global_ranks(li, "l_extendedprice",
                             list(ranks.values()))
    lookup = dict(zip(sel["rank"], sel["value"]))
    return pd.DataFrame({
        "decile": np.arange(11, dtype=np.int64),
        "value": np.array([lookup[ranks[i]] for i in range(11)])})


def q_price_qty_grid(sf_dir: str):
    """2-D equi-depth tiling planner: 4x4 grid over
    (l_extendedprice, l_quantity) with per-cell counts. Cutpoints are
    EXACT global quartile ranks from the radix selector (two
    histogram-fold passes, no sort), broadcast into one combiner
    count pass — the composition that plans a balanced
    repartition-by-range in 2-D."""
    from ray.data.aggregate import Sum

    from spapy_ray.stages.quantiles import exact_global_ranks

    li = _read(sf_dir, "lineitem",
               columns=["l_extendedprice", "l_quantity"])
    n = li.count()
    ranks = [(i * (n - 1)) // 4 for i in (1, 2, 3)]
    cx = exact_global_ranks(li, "l_extendedprice", ranks)["value"] \
        .to_numpy()
    cy = exact_global_ranks(li, "l_quantity", ranks)["value"] \
        .to_numpy()

    def cellify(t: pa.Table) -> pa.Table:
        x = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        y = t.column("l_quantity").to_numpy(zero_copy_only=False)
        ci = np.searchsorted(cx, x, side="right").astype(np.int64)
        cj = np.searchsorted(cy, y, side="right").astype(np.int64)
        k = ci * 4 + cj
        u, c = np.unique(k, return_counts=True)
        return pa.table({"cx": pa.array(u // 4), "cy": pa.array(u % 4),
                         "n": pa.array(c.astype(np.int64))})

    out = li.map_batches(cellify, batch_format="pyarrow") \
        .groupby(["cx", "cy"]).aggregate(Sum("n", alias_name="n"))
    df = out.to_pandas().sort_values(["cx", "cy"]).reset_index(drop=True)
    df["n"] = df["n"].astype(np.int64)
    return df


def q_embed_dim_stats(sf_dir: str):
    """Per-dimension embedding profile (ann.embed_dim_stats:
    one streaming pass, d-row block partials, integer-exact sums)."""
    from spapy_ray.stages.ann import embed_dim_stats

    emb = _read(sf_dir, "embeddings", columns=["embedding"])
    return embed_dim_stats(emb)


def q_weighted_price_quartiles(sf_dir: str):
    """Quantity-weighted price quartiles: exact weighted order
    statistics via the radix selector with weight-sum histograms
    (quantiles.exact_global_ranks weight_col path) — no sort, no
    row exchange."""
    from ray.data.aggregate import Sum

    from spapy_ray.stages.quantiles import exact_global_ranks

    li = _read(sf_dir, "lineitem",
               columns=["l_extendedprice", "l_quantity"])

    def wq(t: pa.Table) -> pa.Table:
        return pa.table({
            "v": t.column("l_extendedprice"),
            "w": pc.cast(t.column("l_quantity"), pa.int64())})

    ds = li.map_batches(wq, batch_format="pyarrow")
    W = ds.aggregate(Sum("w", alias_name="tw"))["tw"]
    ranks = {i: (i * (W - 1)) // 4 for i in range(5)}
    sel = exact_global_ranks(ds, "v", list(ranks.values()),
                             weight_col="w")
    lookup = dict(zip(sel["rank"], sel["value"]))
    return pd.DataFrame({
        "q_idx": np.arange(5, dtype=np.int64),
        "value": np.array([lookup[ranks[i]] for i in range(5)])})


def q_orders_gini(sf_dir: str):
    """Exact Gini coefficient of order value cents
    (quantiles.gini_exact: value-window co-partition, rank-offset
    prefix on the driver, per-window rank-weighted dot products)."""
    from spapy_ray.stages.quantiles import gini_exact

    orders = _read(sf_dir, "orders", columns=["o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        c = np.rint(t.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        return pa.table({"c": pa.array(c)})

    return gini_exact(orders.map_batches(cents,
                                         batch_format="pyarrow"), "c")


def q_priority_gini(sf_dir: str):
    """Within-segment inequality table: exact Gini of order value
    cents per order priority (quantiles.grouped_gini)."""
    from spapy_ray.stages.quantiles import grouped_gini

    orders = _read(sf_dir, "orders",
                   columns=["o_orderpriority", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        c = np.rint(t.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        return pa.table({"o_orderpriority":
                         t.column("o_orderpriority"),
                         "c": pa.array(c)})

    out = grouped_gini(orders.map_batches(cents,
                                          batch_format="pyarrow"),
                       "o_orderpriority", "c").to_pandas()
    return out.sort_values("o_orderpriority").reset_index(drop=True) \
        .astype({"n": np.int64, "s_sum": np.int64,
                 "gini_q": np.int64})


def q_label_separation(sf_dir: str, scale: int = 1_000_000,
                       q: int = 10 ** 6):
    """Between-class centroid separation matrix (the cluster-quality
    diagnostic): exact squared distance between every pair of label
    centroids — rational centroids multiplied out so the numerator
    sum((sq1*n2 - sq2*n1)^2) is a big integer; d2_q = trunc(q * num
    / (n1*n2*scale)^2). One combiner shuffle for the per-(label,
    dim) sums; the pairwise fold runs on the tiny centroid table."""
    from ray.data.aggregate import Sum

    emb = _read(sf_dir, "embeddings", columns=["label", "embedding"])

    def pre(t: pa.Table) -> pa.Table:
        col = t.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = np.floor(col.flatten().to_numpy(zero_copy_only=False)
                        .astype(np.float64) * scale + 0.5) \
            .astype(np.int64)
        nper = pc.list_value_length(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        labels = np.repeat(
            t.column("label").to_numpy(zero_copy_only=False)
            .astype(np.int64), nper)
        if len(nper) and (nper == nper[0]).all():
            dims = np.tile(np.arange(nper[0], dtype=np.int64),
                           len(nper))
        else:  # ragged fallback (never hit on fixed-dim embeddings)
            dims = np.concatenate(
                [np.arange(n, dtype=np.int64) for n in nper]) \
                if len(nper) else np.array([], dtype=np.int64)
        df = pd.DataFrame({"label": labels, "dim": dims, "s": flat})
        g = df.groupby(["label", "dim"], sort=False).agg(
            sq=("s", "sum"), n=("s", "size")).reset_index()
        return pa.Table.from_pandas(g.astype(np.int64),
                                    preserve_index=False)

    sums = emb.map_batches(pre, batch_format="pyarrow") \
        .groupby(["label", "dim"]).aggregate(
            Sum("sq", alias_name="sq"), Sum("n", alias_name="n")) \
        .to_pandas()
    labels = sorted(sums["label"].unique())
    piv_s = sums.pivot_table(index="dim", columns="label",
                             values="sq", aggfunc="sum")
    piv_n = sums.pivot_table(index="dim", columns="label",
                             values="n", aggfunc="sum")
    rows = []
    for i, la in enumerate(labels):
        for lb in labels[i + 1:]:
            s1 = piv_s[la].to_numpy().astype(object)
            s2 = piv_s[lb].to_numpy().astype(object)
            n1 = int(piv_n[la].iloc[0])
            n2 = int(piv_n[lb].iloc[0])
            num = int(((s1 * n2 - s2 * n1) ** 2).sum())
            den = (n1 * n2 * scale) ** 2
            rows.append((int(la), int(lb), n1, n2,
                         q * num // den))
    return pd.DataFrame(rows, columns=["la", "lb", "n1", "n2",
                                       "d2_q"]).astype(np.int64)


def q_orders_rfm(sf_dir: str):
    """RFM customer segmentation: per customer recency (epoch day of
    last order), frequency (order count), monetary (total cents);
    each metric quartiled by its exact quantile_disc thresholds
    (value thresholds, NOT rank splits — tie-free and
    scale-deterministic), 64-way segment census. Composition:
    bucketed per-customer fold → 3 grouped_quantile threshold passes
    → broadcast compare → tiny groupby."""
    from ray.data.aggregate import Sum

    from spapy_ray.stages.quantiles import grouped_quantile
    from spapy_ray.stages.relational import bucketed_group_agg

    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderdate",
                            "o_totalprice"])

    def pre(t: pa.Table) -> pa.Table:
        k = t.column("o_custkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d = pc.cast(t.column("o_orderdate"), pa.int64()).to_numpy() \
            // 86_400_000_000
        c = np.rint(t.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        u, inv = np.unique(k, return_inverse=True)
        md = np.full(len(u), -1, dtype=np.int64)
        np.maximum.at(md, inv, d)
        f = np.zeros(len(u), dtype=np.int64)
        np.add.at(f, inv, 1)
        m = np.zeros(len(u), dtype=np.int64)
        np.add.at(m, inv, c)
        return pa.table({"cust": pa.array(u), "r_days": pa.array(md),
                         "f": pa.array(f), "m": pa.array(m)})

    def local(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("cust", as_index=False, sort=False).agg(
            r_days=("r_days", "max"), f=("f", "sum"), m=("m", "sum"))

    cust = bucketed_group_agg(
        orders.map_batches(pre, batch_format="pyarrow"), "cust",
        local).materialize()

    def const_key(t: pa.Table) -> pa.Table:
        return t.append_column(
            "k__", pa.array(np.zeros(len(t), dtype=np.int64)))

    tagged = cust.map_batches(const_key, batch_format="pyarrow") \
        .materialize()
    qs = [0.25, 0.5, 0.75]
    thr = {}
    for col in ("r_days", "f", "m"):
        out = grouped_quantile(tagged, "k__", col, qs)
        thr[col] = out.sort_values("q")["value"].to_numpy()

    def tiles(t: pa.Table) -> pa.Table:
        def tile(col):
            v = t.column(col).to_numpy(zero_copy_only=False)
            return (1 + sum((v > th).astype(np.int64)
                            for th in thr[col]))
        df = pd.DataFrame({"r_tile": tile("r_days"),
                           "f_tile": tile("f"),
                           "m_tile": tile("m")})
        p = df.groupby(["r_tile", "f_tile", "m_tile"], sort=False) \
            .size().reset_index(name="n_customers")
        return pa.Table.from_pandas(p.astype(np.int64),
                                    preserve_index=False)

    out = cust.map_batches(tiles, batch_format="pyarrow") \
        .groupby(["r_tile", "f_tile", "m_tile"]).aggregate(
            Sum("n_customers", alias_name="n_customers")).to_pandas()
    return out.sort_values(["r_tile", "f_tile", "m_tile"]) \
        .reset_index(drop=True).astype(np.int64)


def q_orders_pareto(sf_dir: str):
    """Revenue-concentration (Pareto) audit: customers ranked by
    total spend (exact global rank via the range-partitioned window
    machinery — no all-to-all sort), split into even-split deciles,
    per decile the customer count and exact revenue share. The
    80/20 check every marketplace runs."""
    from ray.data.aggregate import Sum

    from spapy_ray.stages.quantiles import global_rank_attach
    from spapy_ray.stages.relational import (bucketed_group_agg,
                                             hash_join)

    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_totalprice"])

    def pre(t: pa.Table) -> pa.Table:
        k = t.column("o_custkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        c = np.rint(t.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        u, inv = np.unique(k, return_inverse=True)
        m = np.zeros(len(u), dtype=np.int64)
        np.add.at(m, inv, c)
        return pa.table({"cust": pa.array(u), "m": pa.array(m)})

    def local(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("cust", as_index=False, sort=False)["m"] \
            .sum()

    cust = bucketed_group_agg(
        orders.map_batches(pre, batch_format="pyarrow"), "cust",
        local).materialize()
    n = cust.count()
    ranks = global_rank_attach(cust, "m", "cust", shift=20)
    j = hash_join(cust, ranks, on="cust", right_on="id")

    def fold(t: pa.Table) -> pa.Table:
        pos = t.column("pos").to_numpy(zero_copy_only=False)
        m = t.column("m").to_numpy(zero_copy_only=False)
        dec = (pos * 10) // n + 1
        df = pd.DataFrame({"decile": dec, "m": m})
        p = df.groupby("decile", sort=False).agg(
            n_customers=("m", "size"),
            revenue_u=("m", "sum")).reset_index()
        return pa.Table.from_pandas(p.astype(np.int64),
                                    preserve_index=False)

    out = j.map_batches(fold, batch_format="pyarrow") \
        .groupby("decile").aggregate(
            Sum("n_customers", alias_name="n_customers"),
            Sum("revenue_u", alias_name="revenue_u")).to_pandas()
    return out.sort_values("decile").reset_index(drop=True) \
        .astype(np.int64)


def q_embed_kmeans(sf_dir: str):
    """Deterministic exact-integer k-means (k=8, 3 Lloyd rounds)
    over the embedding table — assignment table after the final
    round (ann.kmeans_int: pagerank-style broadcast iteration, one
    map pass per round, k x dim integer partials)."""
    from spapy_ray.stages.ann import kmeans_int

    emb = _read(sf_dir, "embeddings",
                columns=["vec_id", "embedding"])
    return kmeans_int(emb, k=8, iters=3)


def q_embed_gram(sf_dir: str, scale: int = 10_000):
    """Distributed Gram matrix of the embedding corpus (the
    whitening / PCA-prep statistic): per-batch integer GEMM partials
    Q^T Q over trunc-quantized vectors fold through one tiny groupby
    — d^2 numbers total, never a vector shuffle. Upper triangle
    (dim_i <= dim_j), exact int64."""
    from ray.data.aggregate import Sum

    from spapy_ray.stages.ann import _stack_embeddings

    emb = _read(sf_dir, "embeddings", columns=["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        v = _stack_embeddings(t.column("embedding")).astype(np.float64)
        q = np.trunc(v * scale).astype(np.int64)
        g = q.T @ q
        d = g.shape[0]
        iu, ju = np.triu_indices(d)
        return pa.table({
            "k": pa.array((iu * d + ju).astype(np.int64)),
            "g": pa.array(g[iu, ju]),
        })

    agg = emb.map_batches(partial, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("g", alias_name="g"))

    def decode(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy(zero_copy_only=False)
        return pa.table({
            "dim_i": pa.array(k // 64), "dim_j": pa.array(k % 64),
            "g": pc.cast(t.column("g"), pa.int64()),
        })

    return agg.map_batches(decode, batch_format="pyarrow")


def q_best_split(sf_dir: str):
    """Exact histogram-based decision-stump training (the inner loop
    of distributed GBDT): best Gini split of l_quantity predicting
    l_returnflag = 'R'. Combiner partials per distinct quantity, one
    tiny groupby, driver argmin over <= 50 thresholds."""
    from spapy_ray.stages.ml import best_split_gini

    lf = _read(sf_dir, "lineitem", columns=["l_quantity", "l_returnflag"])

    def proj(t: pa.Table) -> pa.Table:
        q = np.rint(t.column("l_quantity").to_numpy(
            zero_copy_only=False)).astype(np.int64)
        y = (t.column("l_returnflag").to_numpy(zero_copy_only=False)
             == "R").astype(np.int64)
        return pa.table({"q": pa.array(q), "y": pa.array(y)})

    return best_split_gini(lf.map_batches(proj, batch_format="pyarrow"),
                           "q", "y")


def q_lineitem_moments(sf_dir: str):
    """Grouped skewness/kurtosis numerators from exact integer power
    sums (one mergeable pass; Python-bigint fold on the tiny per-flag
    table): the distribution-shape statistics a data-quality monitor
    tracks per partition."""
    from spapy_ray.stages.ml import grouped_moments

    lf = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])

    def proj(t: pa.Table) -> pa.Table:
        q = np.rint(t.column("l_quantity").to_numpy(
            zero_copy_only=False)).astype(np.int64)
        return pa.table({"flag": t.column("l_returnflag"),
                         "q": pa.array(q)})

    return grouped_moments(lf.map_batches(proj, batch_format="pyarrow"),
                           "flag", "q")


def q_best_feature(sf_dir: str):
    """Root-node feature selection across three lineitem features in
    ONE melted histogram pass (ml.best_feature_gini) — the level-0
    step of distributed tree growing: every feature's (value, n,
    n_pos) histogram rides the same combiner, the driver folds each
    and argmins globally."""
    from spapy_ray.stages.ml import best_feature_gini

    lf = _read(sf_dir, "lineitem",
               columns=["l_quantity", "l_discount", "l_tax",
                        "l_returnflag"])

    def proj(t: pa.Table) -> pa.Table:
        def ri(c, s):
            return np.rint(t.column(c).to_numpy(
                zero_copy_only=False) * s).astype(np.int64)
        y = (t.column("l_returnflag").to_numpy(zero_copy_only=False)
             == "R").astype(np.int64)
        return pa.table({"qty": pa.array(ri("l_quantity", 1)),
                         "disc": pa.array(ri("l_discount", 100)),
                         "tax": pa.array(ri("l_tax", 100)),
                         "y": pa.array(y)})

    return best_feature_gini(
        lf.map_batches(proj, batch_format="pyarrow"),
        ["qty", "disc", "tax"], "y")


def q_knn_label_vote(sf_dir: str, k: int = 5):
    """Embedding kNN label-vote classifier eval (the leave-one-out
    sanity check a curated-embedding pipeline runs): each vector's
    k=5 nearest OTHER vectors (exact block-pair GEMM, k+1 retrieved
    and self dropped — top-(k+1) overall ⊇ top-k excluding self)
    vote on its label (ties: count desc, label asc); output is the
    confusion matrix (true_label, pred_label, n)."""
    import ray

    from spapy_ray.stages.ann import knn_join_embeddings
    from spapy_ray.stages.relational import bucketed_group_agg

    emb = _read(sf_dir, "embeddings",
                columns=["vec_id", "embedding", "label"])
    lab = emb.select_columns(["vec_id", "label"]).to_pandas()
    lab_map = dict(zip(lab["vec_id"].astype(np.int64),
                       lab["label"].astype(np.int64)))
    ref = ray.put(lab_map)

    knn = knn_join_embeddings(emb, emb, k=k + 1)
    noself = knn.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("qid"),
                                        t.column("vec_id"))),
        batch_format="pyarrow")

    def fold(df: pd.DataFrame, _ref=ref) -> pd.DataFrame:
        mm = ray.get(_ref)
        if len(df) == 0:
            return pd.DataFrame({
                "true_label": pd.array([], dtype=np.int64),
                "pred_label": pd.array([], dtype=np.int64),
                "n": pd.array([], dtype=np.int64)})
        df = df.sort_values(["qid", "rank"], kind="stable")
        df = df.groupby("qid", sort=False).head(k)
        df["nlab"] = df["vec_id"].map(mm).astype(np.int64)
        votes = df.groupby(["qid", "nlab"], sort=False).size() \
            .reset_index(name="c") \
            .sort_values(["qid", "c", "nlab"],
                         ascending=[True, False, True], kind="stable")
        pred = votes.groupby("qid", sort=False).first().reset_index()
        pred["true_label"] = pred["qid"].map(mm).astype(np.int64)
        conf = pred.groupby(["true_label", "nlab"], sort=False) \
            .size().reset_index(name="n")
        conf.columns = ["true_label", "pred_label", "n"]
        return conf.astype(np.int64)

    parts = bucketed_group_agg(noself, "qid", fold).to_pandas()
    out = parts.groupby(["true_label", "pred_label"], sort=True) \
        .agg(n=("n", "sum")).reset_index()
    return out.astype(np.int64)
