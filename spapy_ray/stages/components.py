"""Generic distributed connected components over an edge Dataset.

Complements the HIERARCHICAL spatial merge (polygonize.spatial_min_label,
which exploits edge locality in a tile grid): near-duplicate graphs hash
their node ids uniformly, so no spatial coarsening helps. ``hash_to_min``
runs **hash contraction** (the alternating-contraction family of
Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC
2014): each level buckets the edges, solves every bucket's subgraph
EXACTLY in one numpy closure, and emits a contracted graph over the
bucket-local labels — one edge per (node, extra-label) conflict. The
contracted graph keeps one node per surviving label, so levels shrink
geometrically and terminate in O(log) depth; the tail
(``driver_max_edges`` or fewer contracted edges) is solved with the
same closure kernel in one task and resolved back down through the
level maps.

Node ids are passed through a bijective splitmix64 scramble first:
min-contraction on MONOTONE id structure (a path 1-2-3-...) is
stationary — every piece re-emits itself — while on uniformly
scattered ids every local maximum leaves the graph each level
(geometric shrink w.h.p. for any structure). The final fold recovers
the true minimum ORIGINAL id per component, so the scramble never
leaks into results.

Correctness is structural, not iterative: every level is an exact
transformation (bucket-local components ARE components of the
subgraph; the contracted graph connects exactly the labels of pieces
that share a node, and a connected component's pieces form a connected
intersection graph), so there is no convergence loop to certify. The
old min-propagation rounds paid ~4 Dataset executions of scheduling
latency PER ROUND (~20 s on a 477-node graph, measured); contraction
pays one seed execution per level plus one resolve shuffle per level
and one final fold.

All shuffles are plain groupby bucket exchanges (union + groupby(hash)),
never native Dataset.join — same rationale as
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


def _mix64(v: np.ndarray) -> np.ndarray:
    """Bijective splitmix64 finalizer: uniform scatter of int64 ids
    (viewed back as int64 — any consistent total order works for the
    intermediate representatives)."""
    x = v.astype(np.int64, copy=False).view(np.uint64).copy()
    with np.errstate(over="ignore"):
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x.view(np.int64)


def _min_label_closure(a: np.ndarray, b: np.ndarray) \
        -> tuple[np.ndarray, np.ndarray]:
    """Exact min-id component labels of an in-memory edge list —
    vectorized min-propagation with pointer jumping until a fixed
    point (no Python per-edge loop). Serves as the driver path for
    small graphs and the per-bucket kernel for the distributed path;
    the fixed point IS its convergence certificate."""
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


def _empty_labels():
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "v": pa.array([], type=pa.int64()),
        "lab": pa.array([], type=pa.int64())}))


def _seed_level(edges, buckets: int, with_orig: bool):
    """One contraction level: bucket the edges on the (uniform)
    source id, run the exact closure per bucket, then fold per node
    across buckets — emitting, in ONE shuffled pass, the node's min
    label (kind=0 rows: x=node, y=minlab) and a contracted edge per
    additional distinct label the node received from other buckets
    (kind=1 rows: x=minlab, y=label). Level 0 (``with_orig``) carries
    each node's ORIGINAL id on its kind=0 row for the final
    true-min recovery."""
    def bucket_edges(t: pa.Table) -> pa.Table:
        return t.append_column("hbk0", _bucket_column(t, "a", buckets))

    def local_closure(g: pa.Table) -> pa.Table:
        a = g.column("a").to_numpy(zero_copy_only=False)
        b = g.column("b").to_numpy(zero_copy_only=False)
        nodes, inv = np.unique(np.concatenate([a, b]),
                               return_inverse=True)
        ia, ib = inv[:len(a)], inv[len(a):]
        lab = np.arange(len(nodes), dtype=np.int64)
        while True:
            new = lab.copy()
            np.minimum.at(new, ia, lab[ib])
            np.minimum.at(new, ib, lab[ia])
            new = new[new]
            if np.array_equal(new, lab):
                break
            lab = new
        cols = {"v": pa.array(nodes), "lab": pa.array(nodes[lab])}
        if with_orig:
            # original id per scrambled node: first occurrence in the
            # concatenated (oa, ob) mirror of (a, b)
            orig_all = np.concatenate([
                g.column("oa").to_numpy(zero_copy_only=False),
                g.column("ob").to_numpy(zero_copy_only=False)])
            first = np.zeros(len(nodes), dtype=np.int64)
            first[inv[::-1]] = np.arange(len(inv) - 1, -1, -1)
            cols["orig"] = pa.array(orig_all[first])
        tt = pa.table(cols)
        return tt.append_column("hbk2", _bucket_column(tt, "v", buckets))

    def fold(g: pa.Table) -> pa.Table:
        v = g.column("v").to_numpy(zero_copy_only=False)
        lab = g.column("lab").to_numpy(zero_copy_only=False)
        order = np.lexsort((lab, v))
        v, lab = v[order], lab[order]
        orig = g.column("orig").to_numpy(zero_copy_only=False)[order] \
            if with_orig else None
        # drop duplicate (v, lab) rows (same label from many buckets)
        keep = np.ones(len(v), dtype=bool)
        keep[1:] = (v[1:] != v[:-1]) | (lab[1:] != lab[:-1])
        v, lab = v[keep], lab[keep]
        if with_orig:
            orig = orig[keep]
        first = np.ones(len(v), dtype=bool)
        first[1:] = v[1:] != v[:-1]
        starts = np.flatnonzero(first)
        seg = np.searchsorted(starts, np.arange(len(v)),
                              side="right") - 1
        minlab = lab[starts][seg]
        extra = ~first
        n0, n1 = int(first.sum()), int(extra.sum())
        cols = {
            "x": pa.array(np.concatenate([v[first], minlab[extra]])),
            "y": pa.array(np.concatenate([lab[starts], lab[extra]])),
            "kind": pa.array(np.concatenate([
                np.zeros(n0, np.int8), np.ones(n1, np.int8)]))}
        if with_orig:
            cols["orig"] = pa.array(np.concatenate([
                orig[first], np.zeros(n1, np.int64)]))
        return pa.table(cols)

    return edges.map_batches(bucket_edges, batch_format="pyarrow") \
        .groupby("hbk0").map_groups(local_closure, batch_format="pyarrow") \
        .groupby("hbk2").map_groups(fold, batch_format="pyarrow") \
        .materialize()


def _with_cols(t: pa.Table, v, lab) -> pa.Table:
    cols = {"v": v, "lab": lab}
    if "orig" in t.column_names:
        cols["orig"] = t.column("orig")
    return pa.table(cols)


def _apply_small(m, keys: np.ndarray, roots: np.ndarray):
    """Resolve map rows (v, lab[, orig]) through a SMALL sorted
    (keys → roots) table, identity where absent — broadcast form."""
    def _r(t: pa.Table) -> pa.Table:
        lab = t.column("lab").to_numpy(zero_copy_only=False)
        if len(keys):
            pos = np.searchsorted(keys, lab)
            pos = np.clip(pos, 0, len(keys) - 1)
            hit = keys[pos] == lab
            lab = np.where(hit, roots[pos], lab)
        return _with_cols(t, t.column("v"),
                          pa.array(lab.astype(np.int64)))

    return m.map_batches(_r, batch_format="pyarrow")


def _apply_map(m, r, buckets: int):
    """Resolve map rows (v, lab[, orig]) through a Dataset map r
    (v, lab) — lab' = r[lab] where present, else lab. One union +
    bucket groupby co-partition keyed on the looked-up id."""
    has_orig = "orig" in m.schema().names

    def qrows(t: pa.Table) -> pa.Table:
        cols = {"k": t.column("lab"), "v": t.column("v"),
                "lab": t.column("lab"),
                "orig": t.column("orig") if has_orig
                else pa.nulls(len(t), type=pa.int64()),
                "is_src": pa.array(np.zeros(len(t), np.int8))}
        tt = pa.table(cols)
        return tt.append_column("hbk", _bucket_column(tt, "k", buckets))

    def srows(t: pa.Table) -> pa.Table:
        tt = pa.table({"k": t.column("v"),
                       "v": pa.nulls(len(t), type=pa.int64()),
                       "lab": t.column("lab"),
                       "orig": pa.nulls(len(t), type=pa.int64()),
                       "is_src": pa.array(np.ones(len(t), np.int8))})
        return tt.append_column("hbk", _bucket_column(tt, "k", buckets))

    both = m.map_batches(qrows, batch_format="pyarrow").union(
        r.map_batches(srows, batch_format="pyarrow"))

    def resolve(g: pa.Table) -> pa.Table:
        is_src = pc.equal(g.column("is_src"), 1)
        src = g.filter(is_src)
        qry = g.filter(pc.invert(is_src))
        sk = src.column("k").to_numpy(zero_copy_only=False)
        sl = src.column("lab").to_numpy(zero_copy_only=False)
        order = np.argsort(sk, kind="stable")
        sk, sl = sk[order], sl[order]
        qk = qry.column("k").to_numpy(zero_copy_only=False)
        lab = qry.column("lab").to_numpy(zero_copy_only=False)
        if len(sk):
            pos = np.searchsorted(sk, qk)
            pos = np.clip(pos, 0, len(sk) - 1)
            hit = sk[pos] == qk
            lab = np.where(hit, sl[pos], lab)
        cols = {"v": qry.column("v"), "lab": pa.array(lab.astype(np.int64))}
        if has_orig:
            cols["orig"] = qry.column("orig")
        return pa.table(cols)

    return both.groupby("hbk").map_groups(resolve, batch_format="pyarrow")


def _finalize_true_min(r0, buckets: int):
    """Fused recovery: rows (v_scrambled, lab_scrambled, orig) →
    (v=orig, lab=min orig of the lab group). Each scrambled label
    lives wholly in one hash bucket, so ONE bucket groupby computes
    the component's true minimum original id and assigns it."""
    def key(t: pa.Table) -> pa.Table:
        return t.append_column("hbk", _bucket_column(t, "lab", buckets))

    def fold(g: pa.Table) -> pa.Table:
        lab = g.column("lab").to_numpy(zero_copy_only=False)
        orig = g.column("orig").to_numpy(zero_copy_only=False)
        order = np.lexsort((orig, lab))
        lab, orig = lab[order], orig[order]
        first = np.ones(len(lab), dtype=bool)
        first[1:] = lab[1:] != lab[:-1]
        starts = np.flatnonzero(first)
        seg = np.searchsorted(starts, np.arange(len(lab)),
                              side="right") - 1
        return pa.table({"v": pa.array(orig),
                         "lab": pa.array(orig[starts][seg])})

    return r0.map_batches(key, batch_format="pyarrow") \
        .groupby("hbk").map_groups(fold, batch_format="pyarrow")


def hash_to_min(edges, *, buckets: int = 64, max_rounds: int = 32,
                mode: str = "auto", driver_max_edges: int = 2_000_000):
    """Edge Dataset(a, b) int64 → Dataset(v, lab): every node incident
    to an edge labeled with its component's MINIMUM node id.

    ``mode``: "distributed" always runs hash contraction; "driver"
    collects the edges and solves with the vectorized closure kernel
    (bounded by ``driver_max_edges``); "auto" picks driver below the
    bound — the same threshold policy as polygonize's merge="auto"
    (each distributed level costs ~2 Dataset executions of scheduling
    latency, which dwarfs microscopic graphs; the oracled query pins
    "distributed" so the scale path stays hash-checked).

    Distributed path: ids scrambled bijectively, then per level a
    bucket-local exact closure + one fold emitting both the per-node
    min labels and the contracted cross-bucket label graph; recurse on
    the contracted graph until it is empty or fits
    ``driver_max_edges`` (solved in one task), then resolve the level
    maps top-down and recover true min original ids in one final fold.
    ``max_rounds`` bounds the contraction depth — it raises rather
    than returning unresolved labels (depth is O(log) w.h.p. after the
    scramble; 32 is far beyond any real graph)."""
    if mode not in ("auto", "driver", "distributed"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode == "distributed":
        # no input materialization, count or probe (VERDICT r3 #9):
        # level 0's seed shuffle IS the first and only pass over the
        # edges — a limit(1) probe would NOT early-exit through the
        # producer's own shuffles and re-runs the whole upstream
        # (measured 6.7 → 11.9 s on dedup_clusters). The empty case
        # is decided from the materialized level-0 seed's metadata
        # count inside the loop, which is free.
        pass
    else:
        edges = edges.materialize()
        n_edges = edges.count()          # metadata read (materialized)
        if n_edges == 0:
            return _empty_labels()
        if mode == "auto":
            mode = "driver" if n_edges <= driver_max_edges \
                else "distributed"
    if mode == "driver":
        import ray.data as rd

        df = edges.to_pandas()
        v, lab = _min_label_closure(df["a"].to_numpy(),
                                    df["b"].to_numpy())
        return rd.from_arrow(pa.table({"v": v, "lab": lab}))

    def scramble(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return pa.table({"a": pa.array(_mix64(a)), "b": pa.array(_mix64(b)),
                         "oa": pa.array(a.astype(np.int64)),
                         "ob": pa.array(b.astype(np.int64))})

    maps = []        # per level: lazy (v, lab[, orig]) view over a seed
    tail = None      # small (keys, roots) arrays from the driver tail
    cur = edges.map_batches(scramble, batch_format="pyarrow")
    for level in range(max_rounds):
        seeded = _seed_level(cur, buckets, with_orig=(level == 0))
        if level == 0 and seeded.count() == 0:
            # metadata-only count on the materialized seed — the
            # empty-input gate without any extra pass or probe
            return _empty_labels()

        def labels_of(t: pa.Table) -> pa.Table:
            tt = t.filter(pc.equal(t.column("kind"), 0))
            return _with_cols(tt, tt.column("x"), tt.column("y"))

        def contracted_of(t: pa.Table) -> pa.Table:
            tt = t.filter(pc.equal(t.column("kind"), 1))
            return pa.table({"a": tt.column("x"), "b": tt.column("y")})

        maps.append(seeded.map_batches(labels_of, batch_format="pyarrow"))
        contracted = seeded.map_batches(
            contracted_of, batch_format="pyarrow").materialize()
        n = contracted.count()
        if n == 0:
            break
        if n <= driver_max_edges:
            df = contracted.to_pandas()
            keys, roots = _min_label_closure(df["a"].to_numpy(),
                                             df["b"].to_numpy())
            tail = (keys, roots)
            break
        cur = contracted
    else:
        raise RuntimeError(
            f"hash_to_min did not converge in {max_rounds} contraction "
            "levels (pathological component structure); raise max_rounds")

    r = maps[-1] if tail is None else _apply_small(maps[-1], *tail)
    for m in reversed(maps[:-1]):
        r = _apply_map(m, r, buckets)
    return _finalize_true_min(r, buckets)
