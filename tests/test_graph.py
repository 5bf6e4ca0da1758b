import numpy as np
import pandas as pd
import pytest


def _rand_pairs(rng, n_a=25, n_b=8, m=60):
    a = rng.integers(0, n_a, size=m) * 2
    b = rng.integers(0, n_b, size=m) * 2 + 1
    return pd.DataFrame({"a": a, "b": b})


def _brute_pagerank(pairs: pd.DataFrame, iterations=4, r0=1_000_000,
                    num=85, den=100):
    und = pd.concat([
        pairs.drop_duplicates().rename(columns={"a": "s", "b": "d"}),
        pairs.drop_duplicates().rename(columns={"a": "d", "b": "s"})],
        ignore_index=True)
    nodes = np.sort(und["s"].unique())
    deg = und.groupby("s").size().reindex(nodes).to_numpy()
    r = np.full(len(nodes), r0, dtype=np.int64)
    base = r0 * (den - num) // den
    src_i = np.searchsorted(nodes, und["s"].to_numpy())
    dst_i = np.searchsorted(nodes, und["d"].to_numpy())
    for _ in range(iterations):
        contrib = r[src_i] // deg[src_i]
        s = np.zeros(len(nodes), dtype=np.int64)
        np.add.at(s, dst_i, contrib)
        r = base + num * s // den
    return pd.DataFrame({"node": nodes, "pr": r})


@pytest.mark.parametrize("mode", ["broadcast", "join"])
def test_pagerank_matches_brute_force(ray_session, mode):
    import ray.data as rd

    from spapy_ray.stages.graph import pagerank, undirected_edges

    rng = np.random.default_rng(3)
    pairs = _rand_pairs(rng)
    und = undirected_edges(rd.from_pandas(pairs), a_col="a", b_col="b")
    got = pagerank(und, iterations=4, mode=mode).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    exp = _brute_pagerank(pairs)
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  exp.astype("int64"))


def test_pagerank_rank_mass_sensible(ray_session):
    # a star graph: the hub ends with more rank than any leaf
    import ray.data as rd

    from spapy_ray.stages.graph import pagerank, undirected_edges

    pairs = pd.DataFrame({"a": [0] * 6, "b": list(range(1, 7))})
    und = undirected_edges(rd.from_pandas(pairs), a_col="a", b_col="b")
    pr = pagerank(und, iterations=4).to_pandas().set_index("node")["pr"]
    assert pr.loc[0] > pr.drop(0).max()


def test_degree_assortativity_star_vs_path(ray_session):
    # star graph: maximally disassortative (r < 0); known closed
    # forms cross-checked against numpy Pearson on directed endpoints
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from spapy_ray.stages.graph import degree_assortativity

    def brute(edges):
        deg = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        xs, ys = [], []
        for a, b in edges:
            xs += [deg[a], deg[b]]
            ys += [deg[b], deg[a]]
        x, y = np.array(xs, float), np.array(ys, float)
        n = len(x)
        num = n * (x * y).sum() - x.sum() * y.sum()
        den = n * (x * x).sum() - x.sum() ** 2
        return num / den

    for edges in ([(0, i) for i in range(1, 8)],           # star
                  [(i, i + 1) for i in range(9)],          # path
                  [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]):
        ds = rd.from_pandas(pd.DataFrame(edges, columns=["a", "b"]),
                            override_num_blocks=2)
        got = degree_assortativity(ds).iloc[0]
        exp = brute(edges)
        assert got["n_edges"] == len(edges)
        assert abs(got["assort_q"] / 1e6 - exp) < 2e-6


def _brute_kcore(pairs: pd.DataFrame, k: int) -> pd.DataFrame:
    e = pairs.drop_duplicates()
    e = e[e["a"] != e["b"]]
    edges = set(map(tuple, np.sort(e[["a", "b"]].to_numpy(), axis=1)))
    alive = {v for ab in edges for v in ab}
    while True:
        deg = {}
        for a, b in edges:
            if a in alive and b in alive:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
        new = {v for v, d in deg.items() if d >= k}
        if new == alive:
            return pd.DataFrame(
                sorted((v, deg[v]) for v in alive),
                columns=["node", "core_deg"]).astype(np.int64)
        alive = new


@pytest.mark.parametrize("k", [2, 3])
def test_k_core_matches_brute_force(ray_session, k):
    import ray.data as rd

    from spapy_ray.stages.graph import k_core

    rng = np.random.default_rng(7 + k)
    pairs = _rand_pairs(rng, n_a=30, n_b=10, m=70)
    got = k_core(rd.from_pandas(pairs), k=k, buckets=8) \
        .sort_values("node").reset_index(drop=True)
    want = _brute_kcore(pairs, k)
    pd.testing.assert_frame_equal(got, want)


def test_k_core_empty_core(ray_session):
    import ray.data as rd

    from spapy_ray.stages.graph import k_core

    # a path graph has an empty 2-core
    pairs = pd.DataFrame({"a": [0, 1, 2, 3], "b": [1, 2, 3, 4]})
    got = k_core(rd.from_pandas(pairs), k=2, buckets=4)
    assert len(got) == 0
    assert list(got.columns) == ["node", "core_deg"]


def test_bfs_hops_levels_and_cap(ray_session):
    import ray.data as rd

    from spapy_ray.stages.graph import bfs_hops

    # chain 0-1-2-3-4-5 plus a triangle 0-10-11 and isolated source 99
    pairs = pd.DataFrame({
        "a": [0, 1, 2, 3, 4, 0, 10, 0],
        "b": [1, 2, 3, 4, 5, 10, 11, 11]})
    got = bfs_hops(rd.from_pandas(pairs), [0, 99], max_hops=3,
                   buckets=4)
    want = pd.DataFrame({
        "node": [0, 1, 2, 3, 10, 11, 99],
        "hops": [0, 1, 2, 3, 1, 1, 0]}).astype(np.int64)
    pd.testing.assert_frame_equal(got, want)


def test_bfs_hops_min_distance_multi_source(ray_session):
    import ray.data as rd

    from spapy_ray.stages.graph import bfs_hops

    # two sources converging: node 2 reachable at 2 from 0, 1 from 5
    pairs = pd.DataFrame({"a": [0, 1, 5], "b": [1, 2, 2]})
    got = bfs_hops(rd.from_pandas(pairs), [0, 5], max_hops=4,
                   buckets=4)
    want = pd.DataFrame({"node": [0, 1, 2, 5],
                         "hops": [0, 1, 1, 0]}).astype(np.int64)
    pd.testing.assert_frame_equal(got, want)


def _brute_ktruss(pairs: pd.DataFrame, k: int) -> pd.DataFrame:
    e = pairs.drop_duplicates()
    e = e[e["a"] != e["b"]]
    edges = set(map(tuple, np.sort(e[["a", "b"]].to_numpy(),
                                   axis=1)))
    while True:
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {(a, b): len(adj[a] & adj[b]) for a, b in edges}
        dead = {eb for eb, s in sup.items() if s < k - 2}
        if not dead:
            rows = sorted((a, b, sup[(a, b)]) for a, b in edges)
            return pd.DataFrame(rows,
                                columns=["lo", "hi", "support"]) \
                .astype(np.int64)
        edges -= dead


@pytest.mark.parametrize("k", [3, 4])
def test_k_truss_matches_brute_force(ray_session, k):
    import ray.data as rd

    from spapy_ray.stages.graph import k_truss

    rng = np.random.default_rng(11 + k)
    pairs = pd.DataFrame({"a": rng.integers(0, 24, 140),
                          "b": rng.integers(0, 24, 140)})
    pairs = pairs[pairs.a != pairs.b]
    got = k_truss(rd.from_pandas(pairs), k=k, buckets=8) \
        .sort_values(["lo", "hi"]).reset_index(drop=True)
    want = _brute_ktruss(pairs, k)
    pd.testing.assert_frame_equal(got, want)


def test_k_truss_empty(ray_session):
    import ray.data as rd

    from spapy_ray.stages.graph import k_truss

    # a tree has no triangles: 3-truss is empty
    pairs = pd.DataFrame({"a": [0, 0, 1, 1], "b": [1, 2, 3, 4]})
    got = k_truss(rd.from_pandas(pairs), k=3, buckets=4)
    assert len(got) == 0
    assert list(got.columns) == ["lo", "hi", "support"]


@pytest.mark.parametrize("mode", ["broadcast", "join"])
def test_hits_matches_sequential_reference(ray_session, mode):
    """Distributed HITS == the sequential integer iteration, in both
    the broadcast and the scores-as-Dataset join mode."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from spapy_ray.stages.graph import hits

    rng = np.random.default_rng(11)
    e = pd.DataFrame({"src": rng.integers(0, 20, 200),
                      "dst": rng.integers(100, 115, 200)}) \
        .drop_duplicates().reset_index(drop=True)
    r0 = 1_000_000
    got = hits(rd.from_pandas(e), iterations=4, r0=r0, buckets=8,
               mode=mode)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()

    hubs = np.sort(e["src"].unique())
    auths = np.sort(e["dst"].unique())
    hi = np.searchsorted(hubs, e["src"].to_numpy())
    ai = np.searchsorted(auths, e["dst"].to_numpy())
    h = np.full(len(hubs), r0, dtype=np.int64)
    for _ in range(4):
        a = np.zeros(len(auths), dtype=np.int64)
        np.add.at(a, ai, h[hi])
        a = a * r0 // a.max()
        h = np.zeros(len(hubs), dtype=np.int64)
        np.add.at(h, hi, a[ai])
        h = h * r0 // h.max()

    gh = got[got["side"] == "hub"].sort_values("node")
    ga = got[got["side"] == "auth"].sort_values("node")
    assert np.array_equal(gh["node"].to_numpy(), hubs)
    assert np.array_equal(gh["score"].to_numpy(), h)
    assert np.array_equal(ga["node"].to_numpy(), auths)
    assert np.array_equal(ga["score"].to_numpy(), a)
