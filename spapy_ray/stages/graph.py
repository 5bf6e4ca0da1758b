"""Iterative graph algorithms over edge Datasets (PageRank).

The web-quality side of the north rule's Common-Crawl framing:
link-graph centrality is the classic corpus quality signal (PageRank,
Brin & Page 1998), used by training-data pipelines to weight or filter
pages. The reference has no graph ops at all; connected components
live in stages/components.py — this module holds the value-iteration
family.

All rank arithmetic is FIXED-POINT INTEGER (r0-scaled, floor
division), because a float PageRank has no deterministic distributed
sum — integer partials are order-independent and the whole iteration
is bit-identical to a chained-CTE SQL twin.

Distributed shape (mode="broadcast", the default): the edge table is
degree-fused and hash-partitioned by DESTINATION once (one shuffle,
materialized — each dst's in-edges land wholly inside one block);
after that, every iteration is a SINGLE map over the edge blocks with
the node→rank array broadcast via ray.put — per-block sums are final
per dst by construction, so no per-iteration shuffle at all. The rank
vector is the SMALL side (hosts, domains: ~1e8 nodes ≈ 1.6 GB for a
1e11-edge web graph) — the same broadcast-once bound the engine's
zone/centroid tables use. For node sets beyond memory,
mode="join" keeps ranks a Dataset and runs each iteration as one
hash_join + one bucketed groupby (2 shuffles/iteration, no driver
state); both modes are bit-identical (pytest parity).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def undirected_edges(pairs, *, a_col: str, b_col: str,
                     buckets: int | None = None):
    """Distinct (a, b) pairs doubled into both directions →
    Dataset(src, dst). Dedup is a hash(a) bucket shuffle with a
    bucket-local drop_duplicates (every (a, *) pair lives in one
    bucket, so local dedup is globally exact)."""
    from spapy_ray.stages.relational import bucketed_group_agg

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"a": t.column(a_col).cast(pa.int64()),
                         "b": t.column(b_col).cast(pa.int64())})

    def local(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["a", "b"])
        a = g["a"].to_numpy(dtype=np.int64)
        b = g["b"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"src": np.concatenate([a, b]),
                             "dst": np.concatenate([b, a])})

    return bucketed_group_agg(pairs.map_batches(project,
                                                batch_format="pyarrow"),
                              "a", local, buckets=buckets)


def _ranks_broadcast(eddeg_by_dst, nodes: np.ndarray, deg: np.ndarray,
                     iterations: int, base: int, num: int, den: int,
                     r0: int):
    """Broadcast value iteration: one map over the dst-partitioned
    edge blocks per iteration; per-block dst sums are final."""
    import ray

    r = np.full(len(nodes), r0, dtype=np.int64)
    for _ in range(iterations):
        ref = ray.put(r)

        def step(t: pa.Table, _ref=ref) -> pa.Table:
            rv = ray.get(_ref)
            src = t.column("src").to_numpy(zero_copy_only=False)
            dst = t.column("dst").to_numpy(zero_copy_only=False)
            d = t.column("deg").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            contrib = rv[np.searchsorted(nodes, src)] // d
            u, inv = np.unique(dst, return_inverse=True)
            s = np.zeros(len(u), dtype=np.int64)
            np.add.at(s, inv, contrib)
            # guard the out-degree>=1 precondition: a dst that is not
            # a known node (dangling target) must be DROPPED, not let
            # an out-of-range searchsorted corrupt another node's slot
            pos = np.searchsorted(nodes, u)
            ok = (pos < len(nodes)) & (nodes[np.minimum(
                pos, len(nodes) - 1)] == u)
            return pa.table({"node": pa.array(u[ok]),
                             "r": pa.array(base + num * s[ok] // den)})

        # batch_size=None → one batch per BLOCK, and every dst lives
        # wholly inside one block → the per-batch sums are final
        out = pa.concat_tables(
            [b for b in eddeg_by_dst
             .map_batches(step, batch_format="pyarrow",
                          batch_size=None)
             .iter_batches(batch_format="pyarrow")],
            promote_options="default")
        r_new = np.full(len(nodes), base, dtype=np.int64)
        got_nodes = out.column("node").to_numpy(zero_copy_only=False)
        got_r = out.column("r").to_numpy(zero_copy_only=False)
        r_new[np.searchsorted(nodes, got_nodes)] = got_r
        r = r_new
    return r


def pagerank(edges, *, src_col: str = "src", dst_col: str = "dst",
             iterations: int = 4, damping_num: int = 85,
             damping_den: int = 100, r0: int = 1_000_000,
             mode: str = "broadcast", buckets: int | None = None):
    """Fixed-point PageRank over a directed edge Dataset where every
    node has out-degree >= 1 (an undirected/doubled graph always
    does; a dangling node would silently keep no rank row — use the
    usual dangling-mass extension before calling if that matters).

        r_0(v)     = r0
        r_{t+1}(v) = r0*(den-num)//den + num * S_t(v) // den
        S_t(v)     = sum over in-edges (u, v) of r_t(u) // deg_out(u)

    Every operation is int64 floor arithmetic — partial sums are
    order-independent, so the distributed fold is exact and the
    chained-CTE SQL twin matches bit for bit.

    Returns Dataset(node, pr) — nodes with at least one out-edge.
    """
    from spapy_ray.stages.relational import bucketed_group_agg, \
        hash_join

    if mode not in ("broadcast", "join"):
        raise ValueError(f"unknown mode {mode!r}")

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"src": t.column(src_col).cast(pa.int64()),
                         "dst": t.column(dst_col).cast(pa.int64())})

    e = edges.map_batches(project, batch_format="pyarrow")

    def deg_local(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("src", sort=False).size() \
            .reset_index(name="deg")

    deg = bucketed_group_agg(e.select_columns(["src"]), "src",
                             deg_local, buckets=buckets)
    base = r0 * (damping_den - damping_num) // damping_den

    if mode == "broadcast":
        # degree vector to the driver (node-sized — the documented
        # small side), fused onto edges inside the ONE dst shuffle
        dt = pa.concat_tables(
            [b for b in deg.iter_batches(batch_format="pyarrow")],
            promote_options="default")
        nodes = np.sort(dt.column("src").to_numpy(zero_copy_only=False)
                        .astype(np.int64))
        degv = np.empty(len(nodes), dtype=np.int64)
        degv[np.searchsorted(
            nodes, dt.column("src").to_numpy(zero_copy_only=False))] = \
            dt.column("deg").to_numpy(zero_copy_only=False)

        def attach(t: pa.Table) -> pa.Table:
            src = t.column("src").to_numpy(zero_copy_only=False)
            return t.append_column(
                "deg", pa.array(degv[np.searchsorted(nodes, src)]))

        def ident(g: pd.DataFrame) -> pd.DataFrame:
            return g

        eddeg = bucketed_group_agg(
            e.map_batches(attach, batch_format="pyarrow"), "dst",
            ident, buckets=buckets).materialize()
        r = _ranks_broadcast(eddeg, nodes, degv, iterations, base,
                             damping_num, damping_den, r0)
        import ray.data as rd

        return rd.from_arrow(pa.table({"node": pa.array(nodes),
                                       "pr": pa.array(r)}))

    # mode == "join": ranks stay a Dataset; 2 shuffles per iteration
    eddeg = hash_join(e, deg, on="src", buckets=buckets).materialize()

    def init_ranks(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t.column("src"),
            "r": pa.array(np.full(len(t), r0, dtype=np.int64))})

    ranks = deg.map_batches(init_ranks, batch_format="pyarrow") \
        .materialize()

    def fold_local(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("dst", sort=False)["contrib"].sum() \
            .reset_index(name="s")
        r_new = base + damping_num * s["s"].to_numpy(dtype=np.int64) \
            // damping_den
        return pd.DataFrame({"node": s["dst"].to_numpy(dtype=np.int64),
                             "r": r_new})

    def contrib(t: pa.Table) -> pa.Table:
        r = t.column("r").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d = t.column("deg").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"dst": t.column("dst"),
                         "contrib": pa.array(r // d)})

    for _ in range(iterations):
        j = hash_join(eddeg, ranks, on="src", right_on="node",
                      buckets=buckets)
        ranks = bucketed_group_agg(
            j.map_batches(contrib, batch_format="pyarrow"), "dst",
            fold_local, buckets=buckets).materialize()

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("node"),
                         "pr": t.column("r")})

    return ranks.map_batches(rename, batch_format="pyarrow")
