"""Graph query pipelines (split from queries.py; registry order lives in
pipelines/queries.py)."""

from spapy_ray.pipelines.qcommon import *  # noqa: F401,F403


def q_graph_pagerank(sf_dir: str, iterations: int = 4):
    """Fixed-point PageRank over the customer–supplier bipartite
    graph (distinct o_custkey—l_suppkey pairs, doubled undirected):
    the web link-graph quality-signal op. mode="join" is PINNED (the
    components_mode="distributed" discipline): ranks stay a Dataset
    end to end — the edge table is span-pinned by src-bucket once and
    every iteration exchanges only node-sized rank rows + dst
    partials, never edges and never a driver-resident rank vector
    (stages/graph.py). The broadcast fast path stays available behind
    pagerank's auto gate for small graphs."""
    from spapy_ray.stages.graph import pagerank, undirected_edges
    from spapy_ray.stages.relational import hash_join

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    ol = hash_join(orders, li, on="o_orderkey", right_on="l_orderkey")

    def ids(t: pa.Table) -> pa.Table:
        c = pc.cast(t.column("o_custkey"), pa.int64())
        s = pc.cast(t.column("l_suppkey"), pa.int64())
        return pa.table({"a": pc.multiply(c, 2),
                         "b": pc.add(pc.multiply(s, 2), 1)})

    und = undirected_edges(ol.map_batches(ids, batch_format="pyarrow"),
                           a_col="a", b_col="b")
    pr = pagerank(und, iterations=iterations, mode="join")

    def decode(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy(zero_copy_only=False)
        kind = np.where(node % 2 == 0, "customer", "supplier")
        return pa.table({"kind": pa.array(kind),
                         "key": pa.array(node // 2),
                         "pr": t.column("pr")})

    return pr.map_batches(decode, batch_format="pyarrow")


def q_watershed(sf_dir: str):
    """D8 watershed delineation over the int DEM: flow_direction →
    pointer forest → hash_to_min basin labels (distributed hash
    contraction pinned) → pit semi-join + basin-size fold. 24,700
    basins on the 512x512 surface; SQL twin is a recursive pointer
    walk (strict descent ⇒ bounded recursion)."""
    from spapy_ray.sources.rasters import DEM_META, synth_dem_dataset
    from spapy_ray.stages.raster import watershed_stats

    return watershed_stats(synth_dem_dataset(DEM_META, kind="int"),
                           DEM_META, components_mode="distributed")


def q_flow_accumulation(sf_dir: str):
    """D8 flow accumulation per cell (upstream count incl. self),
    basin-co-partitioned: pointer edges join their hash_to_min basin
    label and each bucket walks all its complete basins' pointers
    vectorized; per-tile (n_cells, acc_sum, acc_max) fold."""
    from spapy_ray.sources.rasters import DEM_META, synth_dem_dataset
    from spapy_ray.stages.raster import flow_accumulation_stats

    return flow_accumulation_stats(
        synth_dem_dataset(DEM_META, kind="int"), DEM_META,
        components_mode="distributed")


def q_cust_triangles(sf_dir: str):
    """Triangle census of the same-day co-order customer graph:
    pair generation is within_group_pairs over order date, the count
    is the degree-oriented distributed wedge join
    (graph.triangle_stats). Returns one row
    (n_vertices, n_edges, n_wedges, n_triangles)."""
    from spapy_ray.stages.graph import triangle_stats
    from spapy_ray.stages.relational import within_group_pairs

    orders = _read(sf_dir, "orders",
                   columns=["o_orderdate", "o_custkey"])
    pairs = within_group_pairs(orders, "o_orderdate", "o_custkey",
                               out_a="a", out_b="b")
    return triangle_stats(pairs)


def q_cust_assortativity(sf_dir: str):
    """Degree assortativity of the same-day co-order customer graph
    (graph.degree_assortativity — sqrt-free exact Pearson over the
    symmetric directed edge list)."""
    from spapy_ray.stages.graph import degree_assortativity
    from spapy_ray.stages.relational import within_group_pairs

    orders = _read(sf_dir, "orders",
                   columns=["o_orderdate", "o_custkey"])
    pairs = within_group_pairs(orders, "o_orderdate", "o_custkey",
                               out_a="a", out_b="b")
    return degree_assortativity(pairs)


def q_cust_components(sf_dir: str):
    """Connected components of the (same day, same priority)
    co-order customer graph (hash_to_min reused on a second graph
    family): component-size histogram — the community-structure
    audit. The group key packs (epoch day, priority digit) into one
    int so within_group_pairs stays a single-key shuffle."""
    from ray.data.aggregate import Sum

    from spapy_ray.stages.components import hash_to_min
    from spapy_ray.stages.relational import within_group_pairs

    orders = _read(sf_dir, "orders",
                   columns=["o_orderdate", "o_custkey",
                            "o_orderpriority"])

    def key(t: pa.Table) -> pa.Table:
        day = pc.cast(t.column("o_orderdate"), pa.int64())             .to_numpy() // 86_400_000_000
        pr = pc.utf8_slice_codeunits(t.column("o_orderpriority"),
                                     0, 1)
        prd = pc.cast(pr, pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"grp": pa.array(day * 10 + prd),
                         "o_custkey": t.column("o_custkey")})

    pairs = within_group_pairs(
        orders.map_batches(key, batch_format="pyarrow"), "grp",
        "o_custkey", out_a="a", out_b="b")

    def canon(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        b = t.column("b").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = a != b
        return pa.table({"a": pa.array(a[keep]),
                         "b": pa.array(b[keep])})

    labels = hash_to_min(pairs.map_batches(canon,
                                           batch_format="pyarrow"),
                         mode="distributed")

    def pre(t: pa.Table) -> pa.Table:
        lab = t.column("lab").to_numpy(zero_copy_only=False)
        u, c = np.unique(lab, return_counts=True)
        return pa.table({"lab": pa.array(u.astype(np.int64)),
                         "c": pa.array(c.astype(np.int64))})

    sizes = labels.map_batches(pre, batch_format="pyarrow") \
        .groupby("lab").aggregate(Sum("c", alias_name="size")) \
        .to_pandas()
    sz = sizes["size"].to_numpy().astype(np.int64)
    u, c = np.unique(sz, return_counts=True)
    return pd.DataFrame({"size": u.astype(np.int64),
                         "n_components": c.astype(np.int64)})


def q_cust_kcore(sf_dir: str, k: int = 2):
    """k-core (k=2) of the (day, priority) co-order customer graph:
    graph.k_core — the classic iterative degree peel run as one
    broadcast-bitmask map pass per round over the materialized edge
    Dataset (no per-round shuffle). Returns (custkey, core_deg) for
    every vertex of the 2-core, core_deg measured WITHIN the core.
    Same packed (epoch-day, priority-digit) group key as
    cust_components, so the SQL twin's (date, priority) equi-join is
    bijectively identical."""
    from spapy_ray.stages.graph import k_core
    from spapy_ray.stages.relational import within_group_pairs

    orders = _read(sf_dir, "orders",
                   columns=["o_orderdate", "o_custkey",
                            "o_orderpriority"])

    def key(t: pa.Table) -> pa.Table:
        day = pc.cast(t.column("o_orderdate"), pa.int64()) \
            .to_numpy() // 86_400_000_000
        pr = pc.utf8_slice_codeunits(t.column("o_orderpriority"),
                                     0, 1)
        prd = pc.cast(pr, pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"grp": pa.array(day * 10 + prd),
                         "o_custkey": t.column("o_custkey")})

    pairs = within_group_pairs(
        orders.map_batches(key, batch_format="pyarrow"), "grp",
        "o_custkey", out_a="a", out_b="b")
    out = k_core(pairs, k=k)
    return out.rename(columns={"node": "custkey"})


def q_cust_reach(sf_dir: str, max_hops: int = 4):
    """Multi-source BFS hop distance on the same-day co-order
    customer graph, sources = every nation-0 customer (including
    order-less ones at hops 0): graph.bfs_hops — one broadcast
    frontier pass per level over the materialized edge Dataset,
    capped at 4 hops. Returns (custkey, hops) with MINIMUM hop
    counts."""
    import pyarrow.dataset as pds

    from spapy_ray.stages.graph import bfs_hops
    from spapy_ray.stages.relational import within_group_pairs

    orders = _read(sf_dir, "orders",
                   columns=["o_orderdate", "o_custkey"])
    pairs = within_group_pairs(orders, "o_orderdate", "o_custkey",
                               out_a="a", out_b="b")
    cust = _read(sf_dir, "customer", columns=["c_custkey"],
                 predicate=pds.field("c_nationkey") == 0)
    batches = [b for b in cust.iter_batches(batch_format="pyarrow")]
    src = (pa.concat_tables(batches).column("c_custkey")
           .to_numpy(zero_copy_only=False).astype(np.int64)
           if batches else np.empty(0, np.int64))
    out = bfs_hops(pairs, src, max_hops=max_hops)
    return out.rename(columns={"node": "custkey"})


def q_cust_ktruss(sf_dir: str, k: int = 3):
    """3-truss of the (day, priority) co-order customer graph: every
    surviving edge sits in >= 1 triangle within the truss — the
    edge-cohesion peel (graph.k_truss: per round ONE bucketed
    oriented-wedge pass with the broadcast closing-key set, support
    partials fold on the driver's alive-key array). Returns
    (lo, hi, support) within the truss."""
    from spapy_ray.stages.graph import k_truss
    from spapy_ray.stages.relational import within_group_pairs

    orders = _read(sf_dir, "orders",
                   columns=["o_orderdate", "o_custkey",
                            "o_orderpriority"])

    def key(t: pa.Table) -> pa.Table:
        day = pc.cast(t.column("o_orderdate"), pa.int64()) \
            .to_numpy() // 86_400_000_000
        pr = pc.utf8_slice_codeunits(t.column("o_orderpriority"),
                                     0, 1)
        prd = pc.cast(pr, pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"grp": pa.array(day * 10 + prd),
                         "o_custkey": t.column("o_custkey")})

    pairs = within_group_pairs(
        orders.map_batches(key, batch_format="pyarrow"), "grp",
        "o_custkey", out_a="a", out_b="b")
    return k_truss(pairs, k=k)


def q_cust_eccentricity(sf_dir: str, max_hops: int = 6):
    """Per-source reach audit on the same-day co-order graph: for
    each probe customer (ids 1-4), the number of vertices reachable
    within 6 hops and the capped eccentricity (max hop) — four
    single-source bfs_hops sweeps (each: one edge dedup + <=6
    broadcast-frontier passes)."""
    from spapy_ray.stages.graph import bfs_hops
    from spapy_ray.stages.relational import within_group_pairs

    orders = _read(sf_dir, "orders",
                   columns=["o_orderdate", "o_custkey"])
    pairs = within_group_pairs(orders, "o_orderdate", "o_custkey",
                               out_a="a", out_b="b")
    rows = []
    for s in (1, 2, 3, 4):
        out = bfs_hops(pairs, [s], max_hops=max_hops)
        rows.append((s, len(out), int(out["hops"].max())))
    return pd.DataFrame(rows, columns=["src", "n_reached", "ecc"]) \
        .astype(np.int64)


def q_cust_shortest_paths(sf_dir: str, rounds: int = 4):
    """Bounded weighted shortest paths (synchronous min-plus
    Bellman–Ford, graph.sssp_minplus) on the same-day co-order
    customer graph from the nation-0 seed set, edge weight
    (u + v) % 97 + 1: the weighted sibling of cust_reach's BFS —
    exact minimum path weight over <= 4 edges."""
    import pyarrow.dataset as pds

    from spapy_ray.stages.graph import sssp_minplus
    from spapy_ray.stages.relational import within_group_pairs

    orders = _read(sf_dir, "orders",
                   columns=["o_orderdate", "o_custkey"])
    pairs = within_group_pairs(orders, "o_orderdate", "o_custkey",
                               out_a="a", out_b="b")
    cust = _read(sf_dir, "customer", columns=["c_custkey"],
                 predicate=pds.field("c_nationkey") == 0)
    batches = [b for b in cust.iter_batches(batch_format="pyarrow")]
    src = (pa.concat_tables(batches).column("c_custkey")
           .to_numpy(zero_copy_only=False).astype(np.int64)
           if batches else np.empty(0, np.int64))
    out = sssp_minplus(pairs, src, rounds=rounds)
    return out.rename(columns={"node": "custkey"})


def q_cust_hits(sf_dir: str, iterations: int = 4):
    """Fixed-point HITS hubs/authorities over the distinct
    customer->supplier bipartite graph (stages/graph.hits).
    mode="join" is PINNED (the components_mode discipline): scores
    stay Datasets end to end — the edge table is span-pinned once per
    lookup side and every half-iteration exchanges only node-sized
    score rows + per-bucket partials; the only driver-resident value
    is the scalar normalization max. Integer max-normalization keeps
    every value in [0, r0] and bit-equal to the chained-CTE twin;
    the broadcast fast path stays behind hits' auto gate."""
    from spapy_ray.stages.graph import hits
    from spapy_ray.stages.relational import bucketed_group_agg, hash_join

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    ol = hash_join(orders, li, on="o_orderkey", right_on="l_orderkey")

    def ids(t: pa.Table) -> pa.Table:
        return pa.table({"src": pc.cast(t.column("o_custkey"), pa.int64()),
                         "dst": pc.cast(t.column("l_suppkey"), pa.int64())})

    # duplicates dedup INSIDE hits' own partitionings (copies of an
    # edge co-locate in both) — the standalone dedup shuffle was a
    # whole third exchange of the edge table
    e = ol.map_batches(ids, batch_format="pyarrow")
    return hits(e, iterations=iterations, dedup=True, mode="join")
