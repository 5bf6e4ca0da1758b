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
mode="join" keeps ranks a Dataset end to end: the degree-fused edge
table is hash(src)-bucketed ONCE into object-store spans (the driver
holds O(B) block refs + offsets, never rows or node vectors); each
iteration shuffles only the NODE-sized rank rows to their bucket,
joins them locally against the pinned edge slices, and folds the
per-bucket dst partials — O(nodes) exchange per iteration, never
O(edges). Both modes are bit-identical (pytest parity); mode="auto"
gates between them on node count.
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


def _bucket_spans(ds, key: str, b: int, *, local=None):
    """Shuffle ``ds`` ONCE into hash(key)-bucket runs pinned in the
    object store and return ``(spans, pinned)`` where ``spans`` maps
    bucket -> list of (block_ref, offset, length) and ``pinned`` is
    the MaterializedDataset that owns the blocks (the caller must
    keep it referenced while using the spans).

    This is the static side of a co-partitioned iteration: the driver
    holds only O(B) refs and offsets — never rows — and later
    iterations read each bucket's rows as zero-copy Arrow slices.
    ``local(df) -> df`` optionally rewrites each bucket's rows during
    the one shuffle (e.g. drop_duplicates).

    A map_groups group lands contiguously in its output block, but a
    very large group may be SPLIT across blocks — the per-block probe
    handles both, so a bucket may own several spans."""
    import ray

    from spapy_ray.stages.relational import _bucket_column

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("_bucket", _bucket_column(t, key, b))

    def keep(g: pd.DataFrame) -> pd.DataFrame:
        if local is not None:
            bk = g["_bucket"].iat[0]
            g = local(g.drop(columns=["_bucket"])).copy()
            g["_bucket"] = bk
        return g

    mat = ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("_bucket") \
        .map_groups(keep, batch_format="pandas").materialize()
    refs = [r for bundle in mat.iter_internal_ref_bundles()
            for r in bundle.block_refs]

    @ray.remote
    def probe(blk):
        t = blk if isinstance(blk, pa.Table) \
            else pa.Table.from_pandas(blk, preserve_index=False)
        # empty output blocks carry an empty schema
        if len(t) == 0 or "_bucket" not in t.column_names:
            return []
        bk = t.column("_bucket").to_numpy(zero_copy_only=False)
        cut = np.flatnonzero(np.diff(bk) != 0) + 1
        starts = np.concatenate([[0], cut]).astype(np.int64)
        ends = np.concatenate([cut, [len(bk)]]).astype(np.int64)
        return [(int(bk[s]), int(s), int(e - s))
                for s, e in zip(starts, ends)]

    spans: dict[int, list] = {}
    for ref, runs in zip(refs, ray.get([probe.remote(r)
                                        for r in refs])):
        for bkt, off, ln in runs:
            spans.setdefault(bkt, []).append((ref, off, ln))
    return spans, mat


def _span_tables(spans_entry):
    """Yield the Arrow tables for one bucket's spans (zero-copy
    slices of pinned blocks), fetched inside the worker."""
    import ray

    for ref, off, ln in spans_entry:
        blk = ray.get(ref)
        t = blk if isinstance(blk, pa.Table) \
            else pa.Table.from_pandas(blk, preserve_index=False)
        yield t.slice(off, ln)


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
             mode: str = "auto", buckets: int | None = None,
             broadcast_max_nodes: int = 50_000_000):
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

    mode="auto" (default) gates on node count: "broadcast" holds the
    node-sized rank vector on the driver (fast, one map/iteration, no
    per-iteration shuffle — fine up to ``broadcast_max_nodes``, ~0.8
    GB of int64 at the default); beyond that it picks "join", where
    ranks stay a Dataset end to end and each iteration moves only
    node-sized data against span-pinned edge buckets (see the mode ==
    "join" block). Both modes are bit-identical (pytest parity).

    Returns Dataset(node, pr) — nodes with at least one out-edge.
    """
    from spapy_ray.stages.relational import bucketed_group_agg, \
        hash_join

    if mode not in ("auto", "broadcast", "join"):
        raise ValueError(f"unknown mode {mode!r}")

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"src": t.column(src_col).cast(pa.int64()),
                         "dst": t.column(dst_col).cast(pa.int64())})

    e = edges.map_batches(project, batch_format="pyarrow")

    def deg_local(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("src", sort=False).size() \
            .reset_index(name="deg")

    base = r0 * (damping_den - damping_num) // damping_den

    if mode in ("auto", "broadcast"):
        deg = bucketed_group_agg(e.select_columns(["src"]), "src",
                                 deg_local, buckets=buckets)
    if mode == "auto":
        deg = deg.materialize()
        mode = "broadcast" if deg.count() <= broadcast_max_nodes \
            else "join"

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

    # mode == "join": ranks stay a Dataset end to end. The degree-
    # fused edge table is hash(src)-bucketed ONCE into object-store
    # spans (_bucket_spans — driver holds O(B) refs, never rows);
    # each iteration then moves only NODE-sized data and costs ONE
    # shuffle: a plain map over the rank blocks joins each row
    # against its bucket's pinned edge slices and emits pre-summed
    # per-dst partials (additive across batches, so NO contiguity or
    # co-location assumption — a split bucket just yields two
    # partials), and one bucketed groupby folds them into the next
    # ranks. Exchange volume is O(nodes + sum_b distinct_dst(b)) per
    # iteration, never O(edges) — the cluster-shaped path for
    # beyond-memory node sets. The fold's map_groups output comes
    # back naturally clustered by bucket, so the next map touches
    # few spans per block.
    from spapy_ray.stages.relational import _bucket_column
    from spapy_ray.util import cluster_cpus

    # node-sized rows per shuffle: fewer, larger buckets beat the
    # big-data default (sort-shuffle task count grows with blocks)
    b = buckets or max(16, cluster_cpus())

    # ALL of a src's edges land in its bucket, so out-degree is
    # computable inside the one span-building shuffle — no separate
    # deg fold and no deg join (two whole edge exchanges saved)
    def attach_deg(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["src", "dst"]].copy()
        g["deg"] = g.groupby("src", sort=False)["src"] \
            .transform("size").astype(np.int64)
        return g

    spans, pinned = _bucket_spans(e, "src", b, local=attach_deg)

    def step(t: pa.Table) -> pa.Table:
        nodes = t.column("node").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        r = t.column("r").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        bk = _bucket_column(t, "node", b).to_numpy() \
            .astype(np.int64)
        o = np.lexsort((nodes, bk))
        nodes, r, bk = nodes[o], r[o], bk[o]
        cut = np.r_[0, np.flatnonzero(np.diff(bk) != 0) + 1, len(bk)]
        acc_d, acc_s = [], []
        for i in range(len(cut) - 1):
            lo, hi = cut[i], cut[i + 1]
            sp = spans.get(int(bk[lo]))
            if not sp:
                continue
            nn, rr = nodes[lo:hi], r[lo:hi]
            for tt in _span_tables(sp):
                src = tt.column("src").to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                dst = tt.column("dst").to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                dg = tt.column("deg").to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                pos = np.searchsorted(nn, src)
                ok = (pos < len(nn)) & \
                    (nn[np.minimum(pos, len(nn) - 1)] == src)
                contrib = rr[pos[ok]] // dg[ok]
                u, inv = np.unique(dst[ok], return_inverse=True)
                s = np.zeros(len(u), dtype=np.int64)
                np.add.at(s, inv, contrib)
                acc_d.append(u)
                acc_s.append(s)
        if not acc_d:
            return pa.table({"dst": pa.array([], type=pa.int64()),
                             "s": pa.array([], type=pa.int64())})
        d = np.concatenate(acc_d)
        sv = np.concatenate(acc_s)
        if len(acc_d) > 1:
            u, inv = np.unique(d, return_inverse=True)
            tot = np.zeros(len(u), dtype=np.int64)
            np.add.at(tot, inv, sv)
            d, sv = u, tot
        return pa.table({"dst": pa.array(d), "s": pa.array(sv)})

    def fold_local(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("dst", sort=False)["s"].sum() \
            .reset_index(name="s")
        r_new = base + damping_num * s["s"].to_numpy(dtype=np.int64) \
            // damping_den
        return pd.DataFrame({"node": s["dst"].to_numpy(dtype=np.int64),
                             "r": r_new})

    def step0(t: pa.Table) -> pa.Table:
        # iteration 1: every rank is r0, so the partials come straight
        # off the pinned edge blocks — no rank dataset, no lookup
        if len(t) == 0 or "dst" not in t.column_names:
            return pa.table({"dst": pa.array([], type=pa.int64()),
                             "s": pa.array([], type=pa.int64())})
        dst = t.column("dst").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        dg = t.column("deg").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        contrib = r0 // dg
        u, inv = np.unique(dst, return_inverse=True)
        s = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, contrib)
        return pa.table({"dst": pa.array(u), "s": pa.array(s)})

    if iterations < 1:
        def distinct_src(g: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "node": np.unique(g["src"].to_numpy(dtype=np.int64)),
            }).assign(r=np.int64(r0))

        ranks = bucketed_group_agg(e.select_columns(["src"]), "src",
                                   distinct_src, buckets=b)
    else:
        partials = pinned.map_batches(step0, batch_format="pyarrow",
                                      batch_size=None)
        ranks = bucketed_group_agg(partials, "dst", fold_local,
                                   buckets=b).materialize()
        for _ in range(iterations - 1):
            partials = ranks.map_batches(step, batch_format="pyarrow",
                                         batch_size=None)
            ranks = bucketed_group_agg(partials, "dst", fold_local,
                                       buckets=b).materialize()
    del pinned  # spans no longer needed once the final fold is real

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("node"),
                         "pr": t.column("r")})

    return ranks.map_batches(rename, batch_format="pyarrow")


def triangle_stats(pairs, *, a_col: str = "a", b_col: str = "b",
                   mode: str = "broadcast",
                   buckets: int | None = None):
    """Distributed triangle counting via the degree-oriented wedge
    join (the MapReduce-classic node-iterator++, Suri & Vassilvitskii
    2011 — public algorithm):

    1. canonical distinct edge set (lo < hi, self-loops dropped):
       ONE bucketed dedup on the packed edge key; materialized once
       and reused by every later stage.
    2. degrees per vertex: per-block partials + bucketed fold. The
       degree VECTOR is the small side (nodes, not edges — the same
       ~1e8-node broadcast bound pagerank's rank vector uses).
    3. each edge is oriented from its (deg, id)-smaller endpoint to
       the larger, so every out-neighborhood is O(sqrt(m)) — the
       wedge volume is bounded by m^1.5 even on power-law graphs
       (the hot-key guard: a celebrity vertex only ever RECEIVES
       edges, it never fans out).
    4. wedges = within_group_pairs over the oriented source: each
       triangle appears as EXACTLY ONE wedge (the orientation DAG of
       a triangle has one out-degree-2 vertex).
    5. closing check — mode="broadcast" (default): the packed edge
       key set (8 B/edge) is ray.put ONCE and each wedge batch counts
       its closing edges in place with a searchsorted membership test,
       so the exchange carries one integer per bucket and the m^1.5
       wedge stream never leaves the task (3.0e9-wedge sandbox graph:
       shuffle path DNF, broadcast path minutes). mode="shuffle"
       keeps wedges distributed (wedge partial-counts and the edge
       set meet in ONE bucketed shuffle on the closing key) for edge
       sets beyond driver memory (~1e9 edges).

    Vertices must be non-negative int64 < 2^31 (packed closing key).
    Returns a one-row pandas frame
    (n_vertices, n_edges, n_wedges, n_triangles) where n_wedges is
    the unordered-path count sum C(deg, 2) — so the global clustering
    coefficient is 3 * n_triangles / n_wedges on either side.
    """
    import ray

    from spapy_ray.stages.relational import (bucketed_group_agg,
                                             within_group_pairs)

    SHIFT = np.int64(1) << np.int64(32)

    def canon(t: pa.Table) -> pa.Table:
        a = t.column(a_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        b = t.column(b_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        if len(lo) and (lo.min() < 0 or hi.max() >= (1 << 31)):
            raise ValueError("vertex ids must be in [0, 2^31)")
        return pa.table({"lo": pa.array(lo), "hi": pa.array(hi),
                         "ck": pa.array(lo * SHIFT + hi)})

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates("ck")

    edges = bucketed_group_agg(
        pairs.map_batches(canon, batch_format="pyarrow"), "ck",
        dedup, buckets=buckets).materialize()
    n_edges = edges.count()

    def deg_partial(t: pa.Table) -> pa.Table:
        v = np.concatenate([
            t.column("lo").to_numpy(zero_copy_only=False),
            t.column("hi").to_numpy(zero_copy_only=False)])
        u, c = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(u.astype(np.int64)),
                         "c": pa.array(c.astype(np.int64))})

    def deg_fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("v", sort=False)["c"].sum().reset_index(
            name="deg")
        s["deg"] = s["deg"].astype(np.int64)
        return s

    degs = bucketed_group_agg(
        edges.map_batches(deg_partial, batch_format="pyarrow"), "v",
        deg_fold, buckets=buckets).to_pandas().sort_values("v")
    nodes = degs["v"].to_numpy(dtype=np.int64)
    deg = degs["deg"].to_numpy(dtype=np.int64)
    n_vertices = len(nodes)
    n_wedges = int((deg.astype(object) * (deg - 1) // 2).sum())
    dref = ray.put((nodes, deg))

    def orient(t: pa.Table, _ref=dref) -> pa.Table:
        nv, dv = ray.get(_ref)
        lo = t.column("lo").to_numpy(zero_copy_only=False)
        hi = t.column("hi").to_numpy(zero_copy_only=False)
        dl = dv[np.searchsorted(nv, lo)]
        dh = dv[np.searchsorted(nv, hi)]
        lo_first = (dl < dh) | ((dl == dh) & (lo < hi))
        return pa.table({
            "src": pa.array(np.where(lo_first, lo, hi)),
            "dst": pa.array(np.where(lo_first, hi, lo))})

    oriented = edges.map_batches(orient, batch_format="pyarrow")

    if mode == "broadcast":
        # the packed edge-key set is 8 bytes/edge (36 MB at 4.5M
        # edges; ~1e9 edges before this bound bites — beyond that use
        # mode="shuffle") — ship it ONCE and count closing edges
        # inside wedge generation: the exchange carries one int per
        # bucket instead of the m^1.5 wedge stream.
        eks = np.sort(np.concatenate(
            [b.column("ck").to_numpy(zero_copy_only=False)
             for b in edges.select_columns(["ck"])
             .iter_batches(batch_format="pyarrow", batch_size=None)]
        )) if n_edges else np.empty(0, dtype=np.int64)
        eref = ray.put(eks)

        def count_bucket(g: pd.DataFrame, _ref=eref) -> pd.DataFrame:
            ek = ray.get(_ref)
            grp = g["src"].to_numpy()
            keys = g["dst"].to_numpy()
            order = np.lexsort((keys, grp))
            grp, keys = grp[order], keys[order]
            new = np.empty(len(grp), dtype=bool)
            if len(grp):
                new[0] = True
                new[1:] = grp[1:] != grp[:-1]
            starts = np.nonzero(new)[0]
            lens = np.diff(np.append(starts, len(grp)))
            total = 0
            for k in np.unique(lens):
                if k < 2:
                    continue
                iu0, iu1 = np.triu_indices(int(k), 1)
                s = starts[lens == k]
                # chunk the fancy-index so a big size-class stays
                # within a bounded pair buffer
                step = max(1, 4_000_000 // max(1, len(iu0)))
                for c0 in range(0, len(s), step):
                    sc = s[c0:c0 + step]
                    wl = keys[(sc[:, None] + iu0[None, :]).ravel()]
                    wh = keys[(sc[:, None] + iu1[None, :]).ravel()]
                    ck = wl * SHIFT + wh
                    pos = np.searchsorted(ek, ck)
                    pos[pos >= len(ek)] = len(ek) - 1 if len(ek) else 0
                    total += int((ek[pos] == ck).sum()) if len(ek) \
                        else 0
            return pd.DataFrame({"t": np.array([total],
                                               dtype=np.int64)})

        tri = bucketed_group_agg(oriented, "src", count_bucket,
                                 buckets=buckets).to_pandas()
    else:
        wedges = within_group_pairs(
            oriented, "src", "dst", out_a="wlo", out_b="whi",
            buckets=buckets)

        def wedge_partial(t: pa.Table) -> pa.Table:
            ck = t.column("wlo").to_numpy(zero_copy_only=False) \
                * SHIFT \
                + t.column("whi").to_numpy(zero_copy_only=False)
            u2, c = np.unique(ck, return_counts=True)
            return pa.table({"ck": pa.array(u2),
                             "nw": pa.array(c.astype(np.int64)),
                             "is_edge": pa.array(
                                 np.zeros(len(u2), dtype=np.int64))})

        def edge_side(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table({"ck": t.column("ck"),
                             "nw": pa.array(np.zeros(n,
                                                     dtype=np.int64)),
                             "is_edge": pa.array(
                                 np.ones(n, dtype=np.int64))})

        u = wedges.map_batches(wedge_partial, batch_format="pyarrow") \
            .union(edges.select_columns(["ck"]).map_batches(
                edge_side, batch_format="pyarrow"))

        def close_fold(g: pd.DataFrame) -> pd.DataFrame:
            s = g.groupby("ck", sort=False)[["nw", "is_edge"]].sum()
            t = int(s.loc[s["is_edge"] > 0, "nw"].sum())
            return pd.DataFrame({"t": np.array([t], dtype=np.int64)})

        tri = bucketed_group_agg(u, "ck", close_fold,
                                 buckets=buckets).to_pandas()
    n_triangles = int(tri["t"].sum())
    return pd.DataFrame({
        "n_vertices": np.array([n_vertices], dtype=np.int64),
        "n_edges": np.array([n_edges], dtype=np.int64),
        "n_wedges": np.array([n_wedges], dtype=np.int64),
        "n_triangles": np.array([n_triangles], dtype=np.int64)})


def degree_assortativity(pairs, *, a_col: str = "a", b_col: str = "b",
                         q: int = 10 ** 6, buckets: int | None = None):
    """Degree assortativity (Newman 2002): Pearson correlation of the
    endpoint degrees over every DIRECTED edge. Because the directed
    list is symmetric, sx == sy and sxx == syy, so the correlation
    needs NO square root —

        r = (n·sxy − sx²) / (n·sxx − sx²)

    an exact ratio of big integers; ``assort_q`` = trunc(q·r)
    (sign·(abs//abs) == DuckDB //).

    Same distributed shape as triangle_stats' front half: canonical
    edge dedup (one ck-bucket shuffle), degree fold (one v-bucket
    shuffle), degrees broadcast once (ray.put; at web-graph node
    counts swap for a co-partitioned join), then ONE streaming pass
    over edges folding five integer moments — driver state is a
    handful of ints. Returns a single-row DataFrame.
    """
    import ray

    from spapy_ray.stages.relational import bucketed_group_agg

    SHIFT = np.int64(1) << np.int64(32)

    def canon(t: pa.Table) -> pa.Table:
        a = t.column(a_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        b = t.column(b_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        if len(lo) and (lo.min() < 0 or hi.max() >= (1 << 31)):
            raise ValueError("vertex ids must be in [0, 2^31)")
        return pa.table({"lo": pa.array(lo), "hi": pa.array(hi),
                         "ck": pa.array(lo * SHIFT + hi)})

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates("ck")

    edges = bucketed_group_agg(
        pairs.map_batches(canon, batch_format="pyarrow"), "ck",
        dedup, buckets=buckets).materialize()
    n_edges = edges.count()

    def deg_partial(t: pa.Table) -> pa.Table:
        v = np.concatenate([
            t.column("lo").to_numpy(zero_copy_only=False),
            t.column("hi").to_numpy(zero_copy_only=False)])
        u, c = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(u.astype(np.int64)),
                         "c": pa.array(c.astype(np.int64))})

    def deg_fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("v", sort=False)["c"].sum().reset_index(
            name="deg")
        s["deg"] = s["deg"].astype(np.int64)
        return s

    degs = bucketed_group_agg(
        edges.map_batches(deg_partial, batch_format="pyarrow"), "v",
        deg_fold, buckets=buckets).to_pandas().sort_values("v")
    nodes = degs["v"].to_numpy(dtype=np.int64)
    deg = degs["deg"].to_numpy(dtype=np.int64)
    dref = ray.put((nodes, deg))

    def moments(t: pa.Table, _ref=dref) -> pa.Table:
        nd, dg = ray.get(_ref)
        lo = t.column("lo").to_numpy(zero_copy_only=False)
        hi = t.column("hi").to_numpy(zero_copy_only=False)
        dx = dg[np.searchsorted(nd, lo)]
        dy = dg[np.searchsorted(nd, hi)]
        return pa.table({
            "sx": pa.array([int((dx + dy).sum())]),
            "sxy": pa.array([2 * int((dx * dy).sum())]),
            "sxx": pa.array([int((dx * dx).sum())
                             + int((dy * dy).sum())])})

    m = edges.map_batches(moments, batch_format="pyarrow") \
        .to_pandas().sum()
    n = 2 * n_edges
    sx, sxy, sxx = int(m["sx"]), int(m["sxy"]), int(m["sxx"])
    num = n * sxy - sx * sx
    den = n * sxx - sx * sx
    aq = 0 if den == 0 else \
        (1 if (num >= 0) == (den >= 0) else -1) \
        * (abs(num) * q // abs(den))
    return pd.DataFrame({
        "n_vertices": [len(nodes)], "n_edges": [n_edges],
        "sx": [sx], "sxy": [sxy], "sxx": [sxx],
        "assort_q": [aq]}).astype(np.int64)



def _canon_pairs(pairs, a_col: str, b_col: str):
    """Canonicalize an undirected pair Dataset to (a=lo < b=hi):
    undirected_edges dedups EXACT (a, b) rows within one hash(a)
    bucket, so a reversed duplicate (b, a) would survive and double
    the edge — orient every pair before the dedup (self-loops
    dropped), the same guard triangle_stats applies."""

    def canon(t: pa.Table) -> pa.Table:
        a = t.column(a_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        b = t.column(b_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        return pa.table({"a": pa.array(np.minimum(a, b)),
                         "b": pa.array(np.maximum(a, b))})

    return pairs.map_batches(canon, batch_format="pyarrow")


def k_core(pairs, *, k: int, a_col: str = "a", b_col: str = "b",
           max_rounds: int = 64, buckets: int | None = None):
    """k-core of the undirected graph induced by ``pairs``: the
    maximal subgraph in which every vertex has degree >= k, found by
    the classic iterative peel (drop deg<k vertices, recompute
    degrees over the survivors, repeat to fixpoint — public
    algorithm, Matula & Beck 1983).

    Distributed shape (reference parity: SpaPy has no graph module;
    this is a north-rule addition on the pagerank machinery):
    the doubled distinct edge Dataset is materialized ONCE; each peel
    round is one map over the edge blocks with the alive-vertex
    BITMASK broadcast via ray.put (node-sized — the same small-side
    bound pagerank's rank vector uses), emitting per-batch partial
    degree counts that fold into a node-length vector on the driver.
    No per-round shuffle; the peel is monotone (alive only shrinks),
    so equal alive COUNTS mean a fixpoint.

    Returns a pandas frame (node, core_deg) over the k-core —
    core_deg is the vertex degree WITHIN the core (empty frame with
    int64 dtypes when the core is empty).
    """
    import ray

    und = undirected_edges(_canon_pairs(pairs, a_col, b_col),
                           a_col="a", b_col="b",
                           buckets=buckets).materialize()

    def deg_partial(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy(zero_copy_only=False)
        u, c = np.unique(src, return_counts=True)
        return pa.table({"n": pa.array(u.astype(np.int64)),
                         "c": pa.array(c.astype(np.int64))})

    parts = pa.concat_tables(
        [b for b in und.map_batches(deg_partial, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow")],
        promote_options="default")
    nodes = np.unique(parts.column("n").to_numpy(zero_copy_only=False)
                      .astype(np.int64))
    deg = np.zeros(len(nodes), dtype=np.int64)
    np.add.at(deg, np.searchsorted(
        nodes, parts.column("n").to_numpy(zero_copy_only=False)),
        parts.column("c").to_numpy(zero_copy_only=False).astype(np.int64))

    nodes_ref = ray.put(nodes)
    alive = deg >= k
    prev, cur = len(nodes), int(alive.sum())
    rounds = 1
    while cur != prev:
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(f"k_core did not converge in "
                               f"{max_rounds} rounds")
        prev = cur
        alive_ref = ray.put(alive)

        def step(t: pa.Table, _a=alive_ref, _n=nodes_ref) -> pa.Table:
            al, nd = ray.get(_a), ray.get(_n)
            src = t.column("src").to_numpy(zero_copy_only=False)
            dst = t.column("dst").to_numpy(zero_copy_only=False)
            m = al[np.searchsorted(nd, src)] \
                & al[np.searchsorted(nd, dst)]
            u, c = np.unique(src[m], return_counts=True)
            return pa.table({"n": pa.array(u.astype(np.int64)),
                             "c": pa.array(c.astype(np.int64))})

        got = [b for b in und.map_batches(step,
                                          batch_format="pyarrow")
               .iter_batches(batch_format="pyarrow")]
        deg = np.zeros(len(nodes), dtype=np.int64)
        if got:
            parts = pa.concat_tables(got, promote_options="default")
            np.add.at(deg, np.searchsorted(
                nodes,
                parts.column("n").to_numpy(zero_copy_only=False)),
                parts.column("c").to_numpy(zero_copy_only=False)
                .astype(np.int64))
        alive = deg >= k
        cur = int(alive.sum())

    return pd.DataFrame({"node": nodes[alive],
                         "core_deg": deg[alive]}).astype(np.int64) \
        .reset_index(drop=True)


def bfs_hops(pairs, sources, *, max_hops: int, a_col: str = "a",
             b_col: str = "b", buckets: int | None = None):
    """Multi-source BFS hop distance over the undirected graph of
    ``pairs``, capped at ``max_hops``: every vertex reachable from
    any source within the cap gets its MINIMUM hop count (sources
    themselves at 0, including isolated sources with no edges).

    Distributed shape: edges materialized once; each BFS level is one
    map over the edge blocks with the (frontier, known) vertex arrays
    broadcast via ray.put, emitting the per-batch unique new
    neighbours; the driver unions them into the next frontier. Level
    count is bounded by ``max_hops``, so the total work is
    O(levels x edge-pass) with no shuffle after the edge dedup.

    Returns a pandas frame (node, hops), node-sorted.
    """
    import ray

    und = undirected_edges(_canon_pairs(pairs, a_col, b_col),
                           a_col="a", b_col="b",
                           buckets=buckets).materialize()

    frontier = np.unique(np.asarray(sources, dtype=np.int64))
    known_nodes = frontier.copy()
    known_hops = np.zeros(len(frontier), dtype=np.int64)

    for d in range(1, max_hops + 1):
        if not len(frontier):
            break
        ref = ray.put((frontier, known_nodes))

        def step(t: pa.Table, _ref=ref) -> pa.Table:
            fr, kn = ray.get(_ref)
            src = t.column("src").to_numpy(zero_copy_only=False)
            dst = t.column("dst").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(fr, src)
            m = (pos < len(fr)) & (fr[np.minimum(pos, len(fr) - 1)]
                                   == src)
            cand = np.unique(dst[m])
            pos2 = np.searchsorted(kn, cand)
            seen = (pos2 < len(kn)) & (kn[np.minimum(
                pos2, len(kn) - 1)] == cand)
            return pa.table({"n": pa.array(cand[~seen])})

        got = [b for b in und.map_batches(step,
                                          batch_format="pyarrow")
               .iter_batches(batch_format="pyarrow")]
        if not got:                      # every block filtered empty
            break
        out = pa.concat_tables(got, promote_options="default")
        new = np.unique(out.column("n").to_numpy(zero_copy_only=False)
                        .astype(np.int64))
        if not len(new):
            break
        order = np.argsort(np.concatenate([known_nodes, new]),
                           kind="stable")
        known_hops = np.concatenate(
            [known_hops, np.full(len(new), d, dtype=np.int64)])[order]
        known_nodes = np.concatenate([known_nodes, new])[order]
        frontier = new

    return pd.DataFrame({"node": known_nodes,
                         "hops": known_hops}).astype(np.int64) \
        .reset_index(drop=True)


def k_truss(pairs, *, k: int, a_col: str = "a", b_col: str = "b",
            max_rounds: int = 32, buckets: int | None = None):
    """k-truss of the undirected graph of ``pairs``: the maximal
    subgraph where every edge sits in >= k-2 triangles (Cohen 2008)
    — the edge-cohesion sibling of k_core, found by the support peel
    (drop low-support edges, recount, repeat to fixpoint).

    Distributed shape: the heavy part of each round — wedge
    generation + closing-edge membership — is ONE bucketed pass over
    the degree-oriented alive edges (the triangle_stats broadcast
    path, m^1.5-bounded); hits emit per-bucket (edge key, count)
    partials that fold onto the driver's alive-key array (the same
    8 B/edge driver bound the triangle broadcast documents). The
    peel is monotone, so an unchanged alive count is the fixpoint.

    Returns pandas (lo, hi, support) over the k-truss edges with
    their support WITHIN the truss.
    """
    import ray
    import ray.data as rd

    from spapy_ray.stages.relational import bucketed_group_agg
    from spapy_ray.util import cluster_cpus

    SHIFT = np.int64(1) << np.int64(32)
    MASK = np.int64(0xFFFFFFFF)

    def canon(t: pa.Table) -> pa.Table:
        a = t.column(a_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        b = t.column(b_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        if len(lo) and (lo.min() < 0 or hi.max() >= (1 << 31)):
            raise ValueError("vertex ids must be in [0, 2^31)")
        return pa.table({"ck": pa.array(lo * SHIFT + hi)})

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates("ck")

    edges = bucketed_group_agg(
        pairs.map_batches(canon, batch_format="pyarrow"), "ck",
        dedup, buckets=buckets)
    keys = np.sort(np.concatenate(
        [b.column("ck").to_numpy(zero_copy_only=False)
         for b in edges.iter_batches(batch_format="pyarrow")]
        or [np.empty(0, dtype=np.int64)]))

    support = np.empty(0, dtype=np.int64)
    for _round in range(max_rounds + 1):
        if not len(keys):
            break
        lo = keys >> np.int64(32)
        hi = keys & MASK
        nodes, deg = np.unique(np.concatenate([lo, hi]),
                               return_counts=True)
        dl = deg[np.searchsorted(nodes, lo)]
        dh = deg[np.searchsorted(nodes, hi)]
        lo_first = (dl < dh) | ((dl == dh) & (lo < hi))
        src = np.where(lo_first, lo, hi)
        dst = np.where(lo_first, hi, lo)
        oriented = rd.from_arrow(pa.table({
            "src": pa.array(src), "dst": pa.array(dst)})) \
            .repartition(max(2, cluster_cpus()))
        eref = ray.put(keys)

        def count_bucket(g: pd.DataFrame, _ref=eref) -> pd.DataFrame:
            ek = ray.get(_ref)
            grp = g["src"].to_numpy()
            kys = g["dst"].to_numpy()
            order = np.lexsort((kys, grp))
            grp, kys = grp[order], kys[order]
            new = np.empty(len(grp), dtype=bool)
            if len(grp):
                new[0] = True
                new[1:] = grp[1:] != grp[:-1]
            starts = np.nonzero(new)[0]
            lens = np.diff(np.append(starts, len(grp)))
            acc_k: list[np.ndarray] = []
            for kk in np.unique(lens):
                if kk < 2:
                    continue
                iu0, iu1 = np.triu_indices(int(kk), 1)
                s = starts[lens == kk]
                step = max(1, 4_000_000 // max(1, len(iu0)))
                for c0 in range(0, len(s), step):
                    sc = s[c0:c0 + step]
                    ctr = grp[np.repeat(sc, len(iu0))]
                    wl = kys[(sc[:, None] + iu0[None, :]).ravel()]
                    wh = kys[(sc[:, None] + iu1[None, :]).ravel()]
                    cl = np.minimum(wl, wh)
                    ch = np.maximum(wl, wh)
                    ck = cl * SHIFT + ch
                    pos = np.searchsorted(ek, ck)
                    pos[pos >= len(ek)] = len(ek) - 1
                    hit = ek[pos] == ck
                    if not hit.any():
                        continue
                    u, v, w = ctr[hit], wl[hit], wh[hit]
                    tri_keys = np.concatenate([
                        np.minimum(u, v) * SHIFT + np.maximum(u, v),
                        np.minimum(u, w) * SHIFT + np.maximum(u, w),
                        ck[hit]])
                    acc_k.append(tri_keys)
            if not acc_k:
                return pd.DataFrame({
                    "ck": pd.Series([], dtype=np.int64),
                    "c": pd.Series([], dtype=np.int64)})
            allk = np.concatenate(acc_k)
            u2, c = np.unique(allk, return_counts=True)
            return pd.DataFrame({"ck": u2,
                                 "c": c.astype(np.int64)})

        parts = bucketed_group_agg(oriented, "src", count_bucket,
                                   buckets=buckets)
        support = np.zeros(len(keys), dtype=np.int64)
        for b in parts.iter_batches(batch_format="pyarrow"):
            ckv = b.column("ck").to_numpy(zero_copy_only=False)
            cv = b.column("c").to_numpy(zero_copy_only=False)
            np.add.at(support, np.searchsorted(keys, ckv), cv)
        alive = support >= (k - 2)
        if alive.all():
            break
        keys = keys[alive]
    else:
        raise RuntimeError(f"k_truss did not converge in "
                           f"{max_rounds} rounds")

    if not len(keys):
        return pd.DataFrame({"lo": pd.Series([], dtype=np.int64),
                             "hi": pd.Series([], dtype=np.int64),
                             "support": pd.Series([],
                                                  dtype=np.int64)})
    return pd.DataFrame({
        "lo": (keys >> np.int64(32)).astype(np.int64),
        "hi": (keys & MASK).astype(np.int64),
        "support": support}).reset_index(drop=True)


def sssp_minplus(pairs, sources, *, rounds: int, mod: int = 97,
                 a_col: str = "a", b_col: str = "b",
                 buckets: int | None = None):
    """Bounded Bellman–Ford (synchronous min-plus relaxation) over
    the undirected graph of ``pairs`` with deterministic integer
    edge weights w(u, v) = (u + v) % mod + 1: after ``rounds``
    rounds every vertex holds the exact minimum path weight over
    paths of <= ``rounds`` edges from any source (sources at 0).

    Distributed shape (the bfs_hops / k-core iteration family):
    edges materialize once; each round is ONE map over the edge
    blocks with the (node, dist) frontier broadcast via ray.put —
    blocks emit per-block per-dst minima (a vectorized pandas
    groupby-min), the driver folds the bounded candidate table and
    stops early at the fixpoint.  Relaxation is monotone, so equal
    dist maps == convergence, exactly like the unrolled MATERIALIZED
    rounds of the SQL twin.

    Returns a pandas frame (node, dist), node-sorted.
    """
    import ray

    und = undirected_edges(_canon_pairs(pairs, a_col, b_col),
                           a_col="a", b_col="b",
                           buckets=buckets).materialize()

    nodes = np.unique(np.asarray(sources, dtype=np.int64))
    dists = np.zeros(len(nodes), dtype=np.int64)
    if not len(nodes):                    # no sources: nothing reaches
        return pd.DataFrame({"node": nodes, "dist": dists})

    for _ in range(rounds):
        ref = ray.put((nodes, dists))

        def relax(t: pa.Table, _ref=ref) -> pa.Table:
            nd, dd = ray.get(_ref)
            src = t.column("src").to_numpy(zero_copy_only=False)
            dst = t.column("dst").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(nd, src)
            m = (pos < len(nd)) & (nd[np.minimum(pos, len(nd) - 1)]
                                   == src)
            if not m.any():
                return pa.table({"n": pa.array([], pa.int64()),
                                 "d": pa.array([], pa.int64())})
            w = (src[m] + dst[m]) % mod + 1
            cand = dd[pos[m]] + w
            u, inv = np.unique(dst[m], return_inverse=True)
            best = np.full(len(u), np.iinfo(np.int64).max, np.int64)
            np.minimum.at(best, inv, cand)
            return pa.table({"n": pa.array(u), "d": pa.array(best)})

        got = [b for b in und.map_batches(relax,
                                          batch_format="pyarrow")
               .iter_batches(batch_format="pyarrow")]
        if not got:
            break
        cat = pa.concat_tables(got, promote_options="default")
        if cat.num_rows == 0:
            break
        cn = cat.column("n").to_numpy(zero_copy_only=False)
        cd = cat.column("d").to_numpy(zero_copy_only=False)
        u, inv = np.unique(cn, return_inverse=True)
        best = np.full(len(u), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(best, inv, cd)
        # merge candidates into the dist map (min with existing)
        alln = np.unique(np.concatenate([nodes, u]))
        nd = np.full(len(alln), np.iinfo(np.int64).max, np.int64)
        nd[np.searchsorted(alln, nodes)] = dists
        pos = np.searchsorted(alln, u)
        np.minimum.at(nd, pos, best)
        if len(alln) == len(nodes) and (nd == dists).all():
            break                        # fixpoint
        nodes, dists = alln, nd

    return pd.DataFrame({"node": nodes, "dist": dists}) \
        .sort_values("node").reset_index(drop=True)


def _hits_join(e, *, iterations: int, r0: int,
               buckets: int | None, dedup: bool):
    """HITS with scores as Datasets end to end (see hits() docstring,
    mode="join"). The edge table is span-pinned once per LOOKUP side:
    the authority step looks scores up by src, so it reads the
    src-bucketed spans and folds per dst; the hub step is symmetric.
    Per half-iteration exchange volume is O(nodes + partials), never
    O(edges); the only driver-resident value is the scalar max used
    for integer normalization."""
    from spapy_ray.stages.relational import _bucket_column, \
        bucketed_group_agg
    from spapy_ray.util import cluster_cpus

    b = buckets or max(16, cluster_cpus())
    local = (lambda g: g.drop_duplicates()) if dedup else None
    # both span builds consume e — materialize once or the upstream
    # pipeline (reads, joins) executes twice
    e = e.materialize()
    src_spans, pin_s = _bucket_spans(e, "src", b, local=local)
    dst_spans, pin_d = _bucket_spans(e, "dst", b, local=local)

    def fold_local(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("node", sort=False)["s"].sum() \
            .reset_index(name="v")

    def first_partials(t: pa.Table) -> pa.Table:
        # first authority half: every hub score is r0, so the
        # partials come straight off the src-pinned edge blocks
        if len(t) == 0 or "dst" not in t.column_names:
            return pa.table({"node": pa.array([], type=pa.int64()),
                             "s": pa.array([], type=pa.int64())})
        dst = t.column("dst").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        u, cnt = np.unique(dst, return_counts=True)
        return pa.table({"node": pa.array(u),
                         "s": pa.array(cnt.astype(np.int64) * r0)})

    def make_step(spans, mx: int, lookup_col: str, group_col: str):
        # phaseA of a half: normalize the incoming RAW scores by the
        # scalar mx inline, then join each row against its bucket's
        # pinned edge slices; per-group partial sums are additive
        # across batches, so no contiguity assumption
        def step(t: pa.Table) -> pa.Table:
            nodes = t.column("node").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            v = t.column("v").to_numpy(zero_copy_only=False) \
                .astype(np.int64) * r0 // mx
            bk = _bucket_column(t, "node", b).to_numpy() \
                .astype(np.int64)
            o = np.lexsort((nodes, bk))
            nodes, v, bk = nodes[o], v[o], bk[o]
            cut = np.r_[0, np.flatnonzero(np.diff(bk) != 0) + 1,
                        len(bk)]
            acc_n, acc_s = [], []
            for i in range(len(cut) - 1):
                lo, hi = cut[i], cut[i + 1]
                sp = spans.get(int(bk[lo]))
                if not sp:
                    continue
                nn, vv = nodes[lo:hi], v[lo:hi]
                for tt in _span_tables(sp):
                    look = tt.column(lookup_col) \
                        .to_numpy(zero_copy_only=False) \
                        .astype(np.int64)
                    grp = tt.column(group_col) \
                        .to_numpy(zero_copy_only=False) \
                        .astype(np.int64)
                    pos = np.searchsorted(nn, look)
                    ok = (pos < len(nn)) & \
                        (nn[np.minimum(pos, len(nn) - 1)] == look)
                    u, inv = np.unique(grp[ok], return_inverse=True)
                    s = np.zeros(len(u), dtype=np.int64)
                    np.add.at(s, inv, vv[pos[ok]])
                    acc_n.append(u)
                    acc_s.append(s)
            if not acc_n:
                return pa.table({"node": pa.array([], type=pa.int64()),
                                 "s": pa.array([], type=pa.int64())})
            n = np.concatenate(acc_n)
            sv = np.concatenate(acc_s)
            if len(acc_n) > 1:
                u, inv = np.unique(n, return_inverse=True)
                tot = np.zeros(len(u), dtype=np.int64)
                np.add.at(tot, inv, sv)
                n, sv = u, tot
            return pa.table({"node": pa.array(n), "s": pa.array(sv)})

        return step

    def fold(partials):
        raw = bucketed_group_agg(partials, "node", fold_local,
                                 buckets=b).materialize()
        return raw, max(int(raw.max("v") or 0), 1)

    a_raw = amax = h_raw = hmax = None
    for it in range(iterations):
        if it == 0:
            parts = pin_s.map_batches(first_partials,
                                      batch_format="pyarrow",
                                      batch_size=None)
        else:
            parts = h_raw.map_batches(
                make_step(src_spans, hmax, "src", "dst"),
                batch_format="pyarrow", batch_size=None)
        a_raw, amax = fold(parts)
        h_raw, hmax = fold(a_raw.map_batches(
            make_step(dst_spans, amax, "dst", "src"),
            batch_format="pyarrow", batch_size=None))

    def label(side: str, mx: int):
        def f(t: pa.Table) -> pa.Table:
            v = t.column("v").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            return pa.table({
                "side": pa.array(np.full(len(t), side)),
                "node": t.column("node"),
                "score": pa.array(v * r0 // mx)})

        return f

    out = h_raw.map_batches(label("hub", hmax),
                            batch_format="pyarrow").union(
        a_raw.map_batches(label("auth", amax),
                          batch_format="pyarrow")).materialize()
    del pin_s, pin_d
    return out


def hits(edges, *, src_col: str = "src", dst_col: str = "dst",
         iterations: int = 4, r0: int = 1_000_000,
         buckets: int | None = None, dedup: bool = False,
         mode: str = "auto", broadcast_max_nodes: int = 50_000_000):
    """Fixed-point HITS (Kleinberg 1999, hubs & authorities) over a
    DISTINCT directed edge Dataset — the second classic link-graph
    quality signal next to pagerank(). With ``dedup=True`` the input
    may carry duplicate edges: every copy of an edge lands in the
    same bucket of BOTH partitionings (keyed by its own src / dst),
    so dropping duplicates inside each materialization is globally
    correct and saves the caller a whole third shuffle.

        h_0(u)   = r0
        a'_t(v)  = sum over (u, v) of h_t(u);  a_t = a' * r0 // max a'
        h'_t(u)  = sum over (u, v) of a_t(v);  h_{t+1} = h' * r0 // max h'

    Max-normalization in integer floor arithmetic replaces the float
    L2 norm — every value stays in [0, r0], partial sums are
    order-independent, and the chained-CTE SQL twin matches bit for
    bit. Overflow bound: max degree < 2^63 / r0^2 (9.2e6 at the
    default r0).

    Distribution, mode="broadcast": mirrors pagerank's broadcast —
    the edge table is hash-partitioned ONCE by each aggregation side
    (dst for the authority step, src for the hub step, both
    materialized); each half-iteration is a single map over the
    co-partitioned blocks with the node→score vector broadcast via
    ray.put — per-block sums are final for their key by
    construction, so no per-iteration shuffle. Score vectors are the
    documented small side (node-sized); returns a pandas DataFrame.

    mode="join": scores stay Datasets end to end — the edge table is
    span-pinned ONCE per lookup side (_bucket_spans: the driver
    holds O(B) block refs, never rows or node vectors); each
    half-iteration shuffles only the node-sized score rows to their
    bucket, joins them locally against the pinned edge slices, folds
    the per-bucket partials, and normalizes by a scalar Dataset.max.
    Returns Dataset(side, node, score), bit-identical to broadcast
    (pytest parity). mode="auto" (default) gates on distinct-node
    count, like pagerank.
    """
    import ray

    from spapy_ray.stages.relational import bucketed_group_agg

    if mode not in ("auto", "broadcast", "join"):
        raise ValueError(f"unknown mode {mode!r}")

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"src": t.column(src_col).cast(pa.int64()),
                         "dst": t.column(dst_col).cast(pa.int64())})

    def ident(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates() if dedup else g

    e = edges.map_batches(project, batch_format="pyarrow")

    if mode == "auto":
        # distinct-endpoint count via one bucketed fold (node-sized
        # output, no driver vector)
        def nuniq(g: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "n": [g["src"].nunique() + g["dst"].nunique()]})

        # per-src-bucket dst nunique overcounts dsts shared across
        # buckets — an UPPER bound, which is all the gate needs
        cnt = bucketed_group_agg(e, "src", nuniq, buckets=buckets) \
            .sum("n")
        mode = "broadcast" if cnt <= broadcast_max_nodes else "join"

    if mode == "join":
        return _hits_join(e, iterations=iterations, r0=r0,
                          buckets=buckets, dedup=dedup)

    by_dst = bucketed_group_agg(e, "dst", ident,
                                buckets=buckets).materialize()
    by_src = bucketed_group_agg(e, "src", ident,
                                buckets=buckets).materialize()

    def _uniq(ds, col):
        def part(t: pa.Table) -> pa.Table:
            return pa.table({col: pa.array(np.unique(
                t.column(col).to_numpy(zero_copy_only=False)))})
        out = pa.concat_tables(
            [b for b in ds.map_batches(part, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow")],
            promote_options="default")
        return np.unique(out.column(col).to_numpy(zero_copy_only=False))

    hubs = _uniq(by_src, "src")
    auths = _uniq(by_dst, "dst")

    def _half(part_ds, group_col, lookup_col, state_ref, out_len,
              out_keys):
        # one map over key-partitioned blocks; per-block sums final.
        # (keys, vector) ride ONE ray.put — read per task, never
        # re-shipped in the closure.
        def step(t: pa.Table) -> pa.Table:
            import ray as _r
            keys, vec = _r.get(state_ref)
            look = t.column(lookup_col).to_numpy(zero_copy_only=False)
            grp = t.column(group_col).to_numpy(zero_copy_only=False)
            contrib = vec[np.searchsorted(keys, look)]
            u, inv = np.unique(grp, return_inverse=True)
            s = np.zeros(len(u), dtype=np.int64)
            np.add.at(s, inv, contrib)
            return pa.table({"node": pa.array(u), "v": pa.array(s)})

        out = pa.concat_tables(
            [b for b in part_ds.map_batches(
                step, batch_format="pyarrow", batch_size=None)
             .iter_batches(batch_format="pyarrow")],
            promote_options="default")
        raw = np.zeros(out_len, dtype=np.int64)
        raw[np.searchsorted(
            out_keys, out.column("node").to_numpy(zero_copy_only=False))] \
            = out.column("v").to_numpy(zero_copy_only=False)
        return raw * r0 // max(int(raw.max()), 1)

    h = np.full(len(hubs), r0, dtype=np.int64)
    a = np.zeros(len(auths), dtype=np.int64)
    for _ in range(iterations):
        a = _half(by_dst, "dst", "src", ray.put((hubs, h)), len(auths),
                  auths)
        h = _half(by_src, "src", "dst", ray.put((auths, a)), len(hubs),
                  hubs)

    return pd.DataFrame({
        "side": np.concatenate([np.full(len(hubs), "hub"),
                                np.full(len(auths), "auth")]),
        "node": np.concatenate([hubs, auths]).astype(np.int64),
        "score": np.concatenate([h, a]).astype(np.int64)})
