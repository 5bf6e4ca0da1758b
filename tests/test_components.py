"""Distributed connected components (stages/components.py) and
cluster-level near-dup dedup (neardup.near_dup_clusters)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _uf_reference(a, b):
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for x, y in zip(a, b):
        rx, ry = find(int(x)), find(int(y))
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    return {v: find(int(v)) for v in set(a.tolist()) | set(b.tolist())}


@pytest.mark.parametrize("mode", ["driver", "distributed"])
def test_hash_to_min_random_graph(ray_session, mode):
    """Near-critical random graph (long paths, many small comps)
    matches a driver union-find exactly, on BOTH the driver-closure
    and the distributed propagation paths."""
    import ray.data as rd

    from spapy_ray.stages.components import hash_to_min

    rng = np.random.default_rng(5)
    a = rng.integers(0, 800, 700)
    b = rng.integers(0, 800, 700)
    keep = a != b
    a, b = a[keep] + 10_000, b[keep] + 10_000
    edges = rd.from_arrow(pa.table({"a": a.astype(np.int64),
                                    "b": b.astype(np.int64)}))
    got = hash_to_min(edges, mode=mode).to_pandas()
    assert dict(zip(got.v, got.lab)) == _uf_reference(a, b)


def test_hash_to_min_long_chain(ray_session):
    """A 40-node path needs several pointer-jump rounds; labels must
    still all collapse to the chain minimum."""
    import ray.data as rd

    from spapy_ray.stages.components import hash_to_min

    n = 40
    a = np.arange(n - 1, dtype=np.int64) + 500
    b = a + 1
    edges = rd.from_arrow(pa.table({"a": a, "b": b}))
    got = hash_to_min(edges, mode="distributed").to_pandas()
    assert len(got) == n
    assert (got.lab == 500).all()


def test_hash_to_min_multiblock_input(ray_session):
    """Edges split across many input blocks (duplicate edges too)
    give the same labeling."""
    import ray.data as rd

    from spapy_ray.stages.components import hash_to_min

    a = np.array([1, 2, 3, 10, 11, 1, 2], dtype=np.int64)
    b = np.array([2, 3, 4, 11, 12, 2, 3], dtype=np.int64)
    edges = rd.from_arrow(pa.table({"a": a, "b": b})).repartition(5)
    got = hash_to_min(edges, mode="distributed").to_pandas()
    assert dict(zip(got.v, got.lab)) == _uf_reference(a, b)


def test_near_dup_clusters_matches_driver(ray_session):
    """Cluster mapping == components over the verified pair set
    computed driver-side with exact jaccard."""
    import ray.data as rd

    from spapy_ray.stages.neardup import jaccard, near_dup_clusters

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark woods tonight")
    variant = base.replace("lazy", "sleepy")
    docs = pd.DataFrame({
        "key": np.arange(8, dtype=np.int64),
        "text": [base, base, variant,
                 "completely different text about maritime law and ships",
                 base + " extra tail words appended here",
                 "another unrelated short document",
                 base, variant]})
    out = near_dup_clusters(rd.from_pandas(docs), key_col="key",
                            threshold=0.7, bands=8, num_hashes=16) \
        .to_pandas()
    # driver truth: exact jaccard over all pairs, then union-find
    pairs = []
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            if jaccard(docs.text[i], docs.text[j], 3) >= 0.7:
                pairs.append((i, j))
    assert pairs, "fixture must contain duplicate pairs"
    aa = np.array([p[0] for p in pairs])
    bb = np.array([p[1] for p in pairs])
    exp = _uf_reference(aa, bb)
    assert dict(zip(out.doc_id, out.cluster_rep)) == exp


def test_hash_to_min_raises_on_round_budget(ray_session):
    import ray.data as rd

    from spapy_ray.stages.components import hash_to_min

    # a long path spread over many buckets leaves a non-empty
    # contracted graph after one level; driver_max_edges=0 disables
    # the tail so the depth budget is the only way out
    a = np.arange(300, dtype=np.int64) * 7  # break bucket locality
    edges = rd.from_arrow(pa.table({"a": a, "b": a + 7}))
    with pytest.raises(RuntimeError, match="did not converge"):
        hash_to_min(edges, max_rounds=1, mode="distributed",
                    driver_max_edges=0)


def test_hash_to_min_deep_contraction(ray_session):
    import ray.data as rd

    from spapy_ray.stages.components import hash_to_min

    # driver_max_edges=0 disables the tail: contraction must run to an
    # EMPTY contracted graph, exercising multi-level _apply_map resolve
    rng = np.random.default_rng(5)
    a = (np.arange(400, dtype=np.int64) * 7)     # long path, scattered
    edges_p = np.stack([a, a + 7], axis=1)
    extra = rng.integers(0, 4000, (150, 2)).astype(np.int64)  # noise
    ed = np.vstack([edges_p, extra])
    out = hash_to_min(
        rd.from_arrow(pa.table({"a": ed[:, 0], "b": ed[:, 1]})),
        mode="distributed", driver_max_edges=0).to_pandas()

    # union-find truth
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in ed:
        rx, ry = find(int(x)), find(int(y))
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    truth = {v: find(v) for v in set(ed.ravel().tolist())}
    got = dict(zip(out["v"], out["lab"]))
    assert got == truth
