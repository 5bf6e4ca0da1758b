"""Generic distributed connected components over an edge Dataset.

Complements the HIERARCHICAL spatial merge (polygonize.spatial_min_label,
which exploits edge locality in a tile grid): near-duplicate graphs hash
their node ids uniformly, so no spatial coarsening helps. ``hash_to_min``
runs min-label propagation in the MapReduce style of Rastogi et al.
("Finding Connected Components in MapReduce", ICDE 2013), accelerated
with per-round pointer jumping: each round every node takes the
minimum label over itself and its neighbors, then shortcuts through
its own label's label — O(log diameter) rounds.

Convergence is CERTIFIED, not assumed, and the certificate is free:
a round where no node's label changed proves, for every edge (u, v),
lab(u) >= lab(v) and lab(v) >= lab(u) — i.e. edge-consistency — so
each round folds a ``changed`` counter and the driver stops on zero.

All shuffles are plain groupby bucket exchanges (union + groupby(hash)
per round), never native Dataset.join — same rationale as
relational.pair_payload_copartition: no per-partition aggregator actor
pools, no deadlock when partitions exceed CPUs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from spapy_ray.stages.relational import _bucket_column


def _cat(c):
    return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c


def _min_label_closure(a: np.ndarray, b: np.ndarray) \
        -> tuple[np.ndarray, np.ndarray]:
    """Exact min-id component labels of an in-memory edge list —
    vectorized min-propagation with pointer jumping until a fixed
    point (no Python per-edge loop). Serves as the driver path for
    small graphs and the per-bucket seed kernel for the distributed
    path; the fixed point IS its convergence certificate."""
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ia, ib = inv[:len(a)], inv[len(a):]
    lab = np.arange(len(nodes), dtype=np.int64)
    while True:
        new = lab.copy()
        np.minimum.at(new, ia, lab[ib])
        np.minimum.at(new, ib, lab[ia])
        new = new[new]                      # pointer jump
        if np.array_equal(new, lab):
            return nodes, nodes[lab]
        lab = new


def _min_neighbor_round(edges, labels, buckets: int):
    """One propagation round: new_label(v) = min(label(v),
    min over neighbors u of label(u)); each output row carries
    ``changed`` = 1 iff the label strictly decreased.

    Stage 1 co-partitions directed edge rows (key=src, dst) with the
    label rows (key=v, lab) on hash(key) and emits, per directed
    edge, (dst, lab(src)); label rows pass through as (v, lab(v),
    own=1). Stage 2 groupbys hash(node) and folds the min. Both
    stages stream.
    """
    def edge_rows(t: pa.Table) -> pa.Table:
        a, b = _cat(t.column("a")), _cat(t.column("b"))
        tt = pa.table({
            "k": pa.concat_arrays([a, b]),          # edge source
            "dst": pa.concat_arrays([b, a]),        # both directions
            "lab": pa.nulls(2 * len(t), type=pa.int64()),
        })
        return tt.append_column("hbk", _bucket_column(tt, "k", buckets))

    def label_rows(t: pa.Table) -> pa.Table:
        tt = pa.table({
            "k": t.column("v"),
            "dst": pa.nulls(len(t), type=pa.int64()),
            "lab": t.column("lab"),
        })
        return tt.append_column("hbk", _bucket_column(tt, "k", buckets))

    stage1 = edges.map_batches(edge_rows, batch_format="pyarrow").union(
        labels.map_batches(label_rows, batch_format="pyarrow"))

    def send(g: pa.Table) -> pa.Table:
        is_lab = pc.is_valid(g.column("lab"))
        lab = g.filter(is_lab)
        edge = g.filter(pc.invert(is_lab))
        lk = lab.column("k").to_numpy(zero_copy_only=False)
        lv = lab.column("lab").to_numpy(zero_copy_only=False)
        order = np.argsort(lk, kind="stable")
        lk, lv = lk[order], lv[order]
        src = edge.column("k").to_numpy(zero_copy_only=False)
        # every edge node has a label row (seeded from the edge node
        # set and preserved by fold_min), so the lookup is exact
        pos = np.searchsorted(lk, src)
        n_e, n_l = len(src), len(lk)
        tt = pa.table({
            "v": pa.array(np.concatenate([
                edge.column("dst").to_numpy(zero_copy_only=False),
                lk]).astype(np.int64)),
            "lab": pa.array(np.concatenate([lv[pos], lv]).astype(np.int64)),
            "own": pa.array(np.concatenate([
                np.zeros(n_e, np.int8), np.ones(n_l, np.int8)])),
        })
        return tt.append_column("hbk2", _bucket_column(tt, "v", buckets))

    sent = stage1.groupby("hbk").map_groups(send, batch_format="pyarrow")

    def fold_min(g: pa.Table) -> pa.Table:
        v = g.column("v").to_numpy(zero_copy_only=False)
        lab = g.column("lab").to_numpy(zero_copy_only=False)
        own = g.column("own").to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        v, lab, own = v[order], lab[order], own[order]
        first = np.ones(len(v), dtype=bool)
        first[1:] = v[1:] != v[:-1]
        starts = np.flatnonzero(first)
        mins = np.minimum.reduceat(lab, starts) if len(v) else lab
        # own label per node: exactly one own==1 row per node
        own_lab = np.empty(len(starts), dtype=np.int64)
        own_pos = np.flatnonzero(own == 1)
        own_lab[np.searchsorted(starts, own_pos, side="right") - 1] = \
            lab[own_pos]
        return pa.table({
            "v": pa.array(v[first]),
            "lab": pa.array(mins),
            "changed": pa.array((mins < own_lab).astype(np.int64))})

    return sent.groupby("hbk2").map_groups(fold_min, batch_format="pyarrow")


def _jump_round(labels, buckets: int):
    """Pointer-doubling: new_label(v) = label(label(v)), carrying the
    round's ``changed`` flag forward (set when the jump shortens).

    Valid because the label map is monotone (lab(w) <= w from the
    min-fold invariant), so lab(lab(v)) <= lab(v) and both ids name
    nodes with label rows. One bucket exchange: query rows key on
    lab(v), source rows on v, rendezvous in the hash bucket."""
    def qrows(t: pa.Table) -> pa.Table:
        tt = pa.table({
            "k": t.column("lab"),
            "v": t.column("v"),
            "lab": t.column("lab"),
            "changed": t.column("changed"),
            "is_src": pa.array(np.zeros(len(t), np.int8)),
        })
        return tt.append_column("hbk", _bucket_column(tt, "k", buckets))

    def srows(t: pa.Table) -> pa.Table:
        tt = pa.table({
            "k": t.column("v"),
            "v": pa.nulls(len(t), type=pa.int64()),
            "lab": t.column("lab"),
            "changed": pa.nulls(len(t), type=pa.int64()),
            "is_src": pa.array(np.ones(len(t), np.int8)),
        })
        return tt.append_column("hbk", _bucket_column(tt, "k", buckets))

    both = labels.map_batches(qrows, batch_format="pyarrow").union(
        labels.map_batches(srows, batch_format="pyarrow"))

    def jump(g: pa.Table) -> pa.Table:
        is_src = pc.equal(g.column("is_src"), 1)
        src = g.filter(is_src)
        qry = g.filter(pc.invert(is_src))
        sk = src.column("k").to_numpy(zero_copy_only=False)
        sl = src.column("lab").to_numpy(zero_copy_only=False)
        order = np.argsort(sk, kind="stable")
        sk, sl = sk[order], sl[order]
        qk = qry.column("k").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(sk, qk)
        lab2 = sl[pos]
        lab1 = qry.column("lab").to_numpy(zero_copy_only=False)
        changed = qry.column("changed").to_numpy(zero_copy_only=False)
        return pa.table({
            "v": qry.column("v"),
            "lab": pa.array(lab2.astype(np.int64)),
            "changed": pa.array(
                (changed | (lab2 < lab1)).astype(np.int64))})

    return both.groupby("hbk").map_groups(jump, batch_format="pyarrow")


def hash_to_min(edges, *, buckets: int = 64, max_rounds: int = 32,
                mode: str = "auto", driver_max_edges: int = 2_000_000):
    """Edge Dataset(a, b) int64 → Dataset(v, lab): every node incident
    to an edge labeled with its component's MINIMUM node id.

    ``mode``: "distributed" always runs the propagation rounds;
    "driver" collects the edges and solves with the vectorized
    closure kernel (bounded by ``driver_max_edges``); "auto" picks
    driver below the bound — the same threshold policy as
    polygonize's merge="auto" (each distributed round costs ~4
    Dataset executions of scheduling latency, which dwarfs microscopic
    graphs; the oracled query pins "distributed" so the scale path
    stays hash-checked).

    Distributed path: the seed runs the SAME closure kernel per edge
    bucket (transitive closure within each bucket, min-reduced per
    node), so rounds only reconcile ACROSS buckets; each round is
    min-neighbor propagation + a pointer jump (lab(v) <- lab(lab(v))),
    O(log diameter) rounds. Iterates until a round changes nothing —
    the quiescent round IS the convergence certificate (changed == 0
    implies every edge's endpoints agree), so there is no separate
    verification pass. ``max_rounds`` only guards a pathological
    graph — it raises rather than returning unverified labels."""
    edges = edges.materialize()               # re-read every round
    if mode not in ("auto", "driver", "distributed"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode == "auto":
        mode = "driver" if edges.count() <= driver_max_edges \
            else "distributed"
    if mode == "driver":
        import ray.data as rd

        df = edges.to_pandas()
        v, lab = _min_label_closure(df["a"].to_numpy(),
                                    df["b"].to_numpy())
        return rd.from_arrow(pa.table({"v": v, "lab": lab}))

    def bucket_edges(t: pa.Table) -> pa.Table:
        return t.append_column("hbk0", _bucket_column(t, "a", buckets))

    def local_closure(g: pa.Table) -> pa.Table:
        v, lab = _min_label_closure(
            g.column("a").to_numpy(zero_copy_only=False),
            g.column("b").to_numpy(zero_copy_only=False))
        tt = pa.table({"v": v, "lab": lab})
        return tt.append_column("hbk2", _bucket_column(tt, "v", buckets))

    def min_per_node(g: pa.Table) -> pa.Table:
        v = g.column("v").to_numpy(zero_copy_only=False)
        lab = g.column("lab").to_numpy(zero_copy_only=False)
        order = np.lexsort((lab, v))
        v, lab = v[order], lab[order]
        first = np.concatenate(([0], np.flatnonzero(np.diff(v)) + 1))
        return pa.table({"v": v[first], "lab": lab[first]})

    labels = edges.map_batches(bucket_edges, batch_format="pyarrow") \
        .groupby("hbk0").map_groups(local_closure, batch_format="pyarrow") \
        .groupby("hbk2").map_groups(min_per_node, batch_format="pyarrow")

    # Without an explicit repartition the per-round union + sort
    # DOUBLES the block count every iteration (4 → 190 blocks in 6
    # rounds, measured) and scheduling cost grows with it; pinning
    # the count keeps every round O(1) executions of O(1) blocks.
    rep_blocks = max(2, buckets // 8)
    for _ in range(max_rounds):
        labels = _jump_round(
            _min_neighbor_round(edges, labels, buckets), buckets) \
            .repartition(rep_blocks).materialize()
        if not labels.sum("changed"):
            return labels.drop_columns(["changed"])
    raise RuntimeError(
        f"hash_to_min did not converge in {max_rounds} rounds "
        "(component structure exceeds the budget); raise max_rounds")
