"""Approximate/exact nearest-neighbor search over an embedding column.

Baseline (exact): brute-force cosine top-k — the query matrix is
broadcast once (ray.put), each Arrow batch does one numpy matmul, and
only batch-local top-k candidate rows move to the final per-query
merge (global top-k ⊆ union of batch-local top-ks, so the merge is
exact). The scale path swaps the batch scorer for an LSH/IVF-bucketed
variant with the same output contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _stack_embeddings(col) -> np.ndarray:
    """list<float> / fixed_size_list<float> column → [n, d] float64
    matrix via flat-buffer reshape — never a per-row to_pylist walk."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col.type, pa.ExtensionType):
        # Ray's ArrowTensorArray (from_pandas over ndarray cells)
        return np.asarray(col.to_numpy(zero_copy_only=False),
                          dtype=np.float64)
    if pa.types.is_fixed_size_list(col.type):
        d = col.type.list_size
        values = np.asarray(col.values.to_numpy(zero_copy_only=False),
                            dtype=np.float64)
        return values.reshape(-1, d)
    values = np.asarray(col.values.to_numpy(zero_copy_only=False), dtype=np.float64)
    offsets = np.asarray(col.offsets)
    widths = np.diff(offsets)
    d = int(widths[0]) if len(widths) else 0
    if len(widths) and not (widths == d).all():
        raise ValueError("ragged embedding column")
    return values.reshape(-1, d)


class CosineTopKScorer:
    """map_batches actor: emit batch-local top-k (qid, vec_id, sim)."""

    def __init__(self, queries_ref=None, queries: tuple | None = None, k: int = 5):
        if queries is None:
            import ray
            queries = ray.get(queries_ref)
        self.qids, qmat = queries
        qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
        self.qn = qn
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _stack_embeddings(batch.column("embedding"))
        vec_ids = batch.column("vec_id").to_numpy()
        en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        sims = en @ self.qn.T                        # [B, Q]
        # mask self-matches
        self_m = vec_ids[:, None] == self.qids[None, :]
        sims[self_m] = -np.inf
        k = min(self.k, sims.shape[0])
        out_q, out_v, out_s = [], [], []
        for j in range(sims.shape[1]):
            idx = np.argpartition(-sims[:, j], k - 1)[:k] if k < len(sims) \
                else np.arange(len(sims))
            out_q.append(np.full(len(idx), self.qids[j], dtype=np.int64))
            out_v.append(vec_ids[idx])
            out_s.append(sims[idx, j])
        return pa.table({
            "qid": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_v)),
            "sim": pa.array(np.concatenate(out_s)),
        })


def cosine_topk(ds, query_ids: np.ndarray, query_matrix: np.ndarray,
                k: int = 5, concurrency=None, batch_size: int = 4096):
    """Exact cosine top-k of each query over the dataset's embeddings.

    Returns a small Dataset (qid, vec_id, rank), rank 1..k ordered by
    (sim desc, vec_id) — the SQL-oracle tie-break.
    """
    import ray

    from spapy_ray.util import cached_state

    qref = ray.put((np.asarray(query_ids, dtype=np.int64),
                    np.asarray(query_matrix, dtype=np.float64)))
    box = (qref,)

    def _task(batch: pa.Table) -> pa.Table:
        scorer = cached_state(box, lambda q: CosineTopKScorer(queries=q, k=k))
        return scorer(batch)

    cands = ds.map_batches(_task, batch_format="pyarrow",
                           batch_size=batch_size, zero_copy_batch=True)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True],
                          kind="stable").head(k)
        g = g.drop(columns=["sim"])
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return cands.groupby("qid").map_groups(final, batch_format="pandas")


# ---------------------------------------------------------------- IVF

def kmeans_lite(sample: np.ndarray, n_clusters: int, iters: int = 8) -> np.ndarray:
    """Deterministic Lloyd k-means on unit-normalized vectors:
    init = first n_clusters sample rows (sample order is deterministic),
    cosine assignment. Good enough as an IVF coarse quantizer."""
    x = sample / np.linalg.norm(sample, axis=1, keepdims=True)
    cent = x[:n_clusters].copy()
    for _ in range(iters):
        cent_n = cent / np.linalg.norm(cent, axis=1, keepdims=True)
        assign = np.argmax(x @ cent_n.T, axis=1)
        for c in range(n_clusters):
            m = assign == c
            if m.any():
                cent[c] = x[m].mean(axis=0)
    return cent / np.linalg.norm(cent, axis=1, keepdims=True)


def cosine_topk_ivf(ds, query_ids: np.ndarray, query_matrix: np.ndarray,
                    k: int = 5, n_clusters: int = 16, n_probe: int = 4,
                    train_sample: int = 2048, batch_size: int = 4096):
    """IVF-bucketed approximate cosine top-k — the scale path.

    1. driver trains a coarse quantizer on a bounded sample (limit());
    2. a stateless map assigns every row to its nearest centroid and
       DROPS rows whose cluster no query probes (the IVF prune —
       at scale this is the partition-pruning read);
    3. the surviving rows flow through the same batch scorer as the
       exact path, with (row, query) pairs outside the probe set
       masked out;
    4. identical final per-query merge.

    Approximate: recall measured against the exact path in tests.
    """
    import ray

    from spapy_ray.util import cached_state

    sample_tbl = ds.limit(train_sample).to_pandas()
    sample = np.stack(sample_tbl["embedding"].to_numpy()).astype(np.float64)
    cents = kmeans_lite(sample, n_clusters)

    qids = np.asarray(query_ids, dtype=np.int64)
    qmat = np.asarray(query_matrix, dtype=np.float64)
    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    probe = np.argsort(-(qn @ cents.T), axis=1, kind="stable")[:, :n_probe]
    probed_mask = np.zeros((n_clusters, len(qids)), dtype=bool)
    for j in range(len(qids)):
        probed_mask[probe[j], j] = True
    any_probed = probed_mask.any(axis=1)

    box = (ray.put((qids, qn, cents, probed_mask, any_probed)),)

    def _task(batch: pa.Table) -> pa.Table:
        qids_, qn_, cents_, pmask, anyp = cached_state(box, lambda v: v)
        emb = _stack_embeddings(batch.column("embedding"))
        vec_ids = batch.column("vec_id").to_numpy()
        en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        cluster = np.argmax(en @ cents_.T, axis=1)
        keep = anyp[cluster]
        if not keep.any():
            return pa.table({"qid": pa.array([], type=pa.int64()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "sim": pa.array([], type=pa.float64())})
        en, vec_ids, cluster = en[keep], vec_ids[keep], cluster[keep]
        sims = en @ qn_.T
        sims[~pmask[cluster]] = -np.inf              # outside probe set
        sims[vec_ids[:, None] == qids_[None, :]] = -np.inf  # self
        kk = min(k, sims.shape[0])
        out_q, out_v, out_s = [], [], []
        for j in range(sims.shape[1]):
            idx = (np.argpartition(-sims[:, j], kk - 1)[:kk]
                   if kk < len(sims) else np.arange(len(sims)))
            ok = sims[idx, j] > -np.inf
            out_q.append(np.full(int(ok.sum()), qids_[j], dtype=np.int64))
            out_v.append(vec_ids[idx[ok]])
            out_s.append(sims[idx[ok], j])
        return pa.table({"qid": pa.array(np.concatenate(out_q)),
                         "vec_id": pa.array(np.concatenate(out_v)),
                         "sim": pa.array(np.concatenate(out_s))})

    cands = ds.map_batches(_task, batch_format="pyarrow",
                           batch_size=batch_size, zero_copy_batch=True)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True],
                          kind="stable").head(k)
        g = g.drop(columns=["sim"])
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return cands.groupby("qid").map_groups(final, batch_format="pandas")


# ------------------------------------------- all-pairs similarity

def top_similar_pairs(ds, n_pairs: int = 20, key_col: str = "vec_id",
                      vec_col: str = "embedding", batch_size: int = 4096,
                      mode: str = "auto",
                      broadcast_max_rows: int = 1_000_000,
                      lsh_threshold: float = 0.5):
    """Embedding-cosine near-duplicate detection, top-pairs form: the
    N most cosine-similar DISTINCT pairs over the whole table.

    Two paths, picked by ``mode``:

    - ``broadcast`` (exact): the (normalized id, matrix) pair is
      broadcast once (ray.put); every batch computes a
      [block x all] GEMM and keeps only pairs that could reach the
      global top-N — INCLUDING ties at the block cut, selected by the
      full (sim desc, key_a, key_b) order, so results never depend on
      block layout (ADVICE r2). Right for <= broadcast_max_rows
      tables; the one driver-side matrix build is its documented
      bound.
    - ``lsh`` (scale path, no driver-side embedding matrix):
      hyperplane-LSH banding generates candidate pairs, exact cosine
      verifies them, and the verified set is ranked by
      (cos desc, key_a, key_b). Exact whenever every true top-N pair
      has cosine >= lsh_threshold and collides in some band (recall
      measured in tests).

    - ``blockpair`` (exact, no driver-side matrix): the table is
      materialized into blocks; one Ray task per block PAIR computes
      a bounded [chunk x chunk] GEMM and its tie-safe local top-N.
      The driver holds only block refs and P² small candidate sets.
      Exact all-pairs is inherently quadratic — this form removes
      the single-machine matrix, not the N² work; use ``lsh`` when
      an approximate high-similarity search is acceptable.

    ``auto`` picks broadcast below broadcast_max_rows rows, else
    blockpair. Returns Dataset (key_a, key_b, rank), key_a < key_b.
    """
    import ray
    import ray.data as rd

    from spapy_ray.util import cached_state

    if mode == "auto":
        mode = "broadcast" if ds.count() <= broadcast_max_rows \
            else "blockpair"
    if mode == "lsh":
        return _top_pairs_lsh(ds, n_pairs, key_col, vec_col, lsh_threshold)
    if mode == "blockpair":
        return _top_pairs_blockpair(ds, n_pairs, key_col, vec_col)

    all_tbl = pa.concat_tables(
        [b for b in ds.iter_batches(batch_format="pyarrow")])
    ids = all_tbl.column(key_col).to_numpy()
    E = _stack_embeddings(all_tbl.column(vec_col))
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    ref = ray.put((ids.astype(np.int64), En))
    box = (ref,)

    def _block(t: pa.Table) -> pa.Table:
        aid, mat = cached_state(box, lambda x: x)
        bid = t.column(key_col).to_numpy().astype(np.int64)
        B = _stack_embeddings(t.column(vec_col))
        Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
        sims = Bn @ mat.T                       # [block, all]
        # keep i<j pairs only; local top-N keeps ties at the cut
        mask = bid[:, None] < aid[None, :]
        flat = np.nonzero(mask)
        ka, kb, s = _topn_with_ties(bid[flat[0]], aid[flat[1]],
                                    sims[flat], n_pairs)
        return pa.table({"key_a": pa.array(ka), "key_b": pa.array(kb),
                         "sim": pa.array(s)})

    cands = ds.map_batches(_block, batch_format="pyarrow",
                           batch_size=batch_size).to_pandas()
    cands = cands.sort_values(["sim", "key_a", "key_b"],
                              ascending=[False, True, True],
                              kind="stable").head(n_pairs)
    cands = cands.drop(columns=["sim"]).reset_index(drop=True)
    cands["rank"] = np.arange(1, len(cands) + 1, dtype=np.int64)
    return rd.from_pandas(cands)


def _topn_with_ties(ka: np.ndarray, kb: np.ndarray, s: np.ndarray,
                    n_pairs: int) -> tuple:
    """Local top-n_pairs by (sim desc, key_a, key_b) INCLUDING ties at
    the sim cut — a tied pair that wins the lexicographic global
    order can never be dropped locally (ADVICE r2)."""
    if len(s) <= n_pairs:
        return ka, kb, s
    cut = np.partition(-s, n_pairs - 1)[n_pairs - 1]
    pool = np.nonzero(-s <= cut)[0]
    order = np.lexsort((kb[pool], ka[pool], -s[pool]))[:n_pairs]
    sel = pool[order]
    return ka[sel], kb[sel], s[sel]


def _top_pairs_blockpair(ds, n_pairs: int, key_col: str, vec_col: str,
                         target_rows_per_block: int = 8192):
    """Exact top-N similar pairs WITHOUT a driver-side embedding
    matrix: normalize per block, materialize, then one Ray task per
    unordered block pair (i <= j) does a [rows_i x rows_j] GEMM and a
    tie-safe local top-N. Driver memory: block refs + P² candidate
    frames of <= n_pairs rows. Peak worker memory: two blocks.

    Raw Ray tasks are used because the Dataset API has no
    cross-product operator; each task reads its two blocks zero-copy
    from the object store."""
    import ray
    import ray.data as rd

    def prep(t: pa.Table) -> pa.Table:
        E = _stack_embeddings(t.column(vec_col))
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        flat = pa.array(En.reshape(-1))
        return pa.table({
            "key": pc.cast(t.column(key_col), pa.int64()),
            "vec": pa.FixedSizeListArray.from_arrays(flat, E.shape[1]),
        })

    import ray as _r

    cpus = int(_r.cluster_resources().get("CPU", 4)) \
        if _r.is_initialized() else 4
    n = ds.count()
    # enough blocks that P(P+1)/2 tasks saturate the cluster, bounded
    # by target block size (worker memory) and 64 (task-count blowup)
    by_cpu = int(np.ceil(np.sqrt(2 * cpus)))
    nblocks = max(1, min(64, max(-(-n // target_rows_per_block),
                                 min(by_cpu, -(-n // 256)))))
    mat = ds.map_batches(prep, batch_format="pyarrow") \
        .repartition(nblocks).materialize()
    refs = [r for bundle in mat.iter_internal_ref_bundles()
            for r in bundle.block_refs]

    @ray.remote
    def pair_task(blk_a, blk_b, same: bool):
        ta = blk_a if isinstance(blk_a, pa.Table) else blk_a.to_arrow()
        tb = blk_b if isinstance(blk_b, pa.Table) else blk_b.to_arrow()
        ida = ta.column("key").to_numpy()
        idb = tb.column("key").to_numpy()
        A = _stack_embeddings(ta.column("vec"))
        Bm = _stack_embeddings(tb.column("vec"))
        sims = A @ Bm.T
        lo = np.minimum(ida[:, None], idb[None, :])
        hi = np.maximum(ida[:, None], idb[None, :])
        mask = ida[:, None] < idb[None, :] if same \
            else ida[:, None] != idb[None, :]
        ii, jj = np.nonzero(mask)
        ka, kb, s = lo[ii, jj], hi[ii, jj], sims[ii, jj]
        if not same:
            # cross-block duplicates impossible (keys unique across
            # blocks), but both (a,b) orderings never co-occur since
            # each unordered block pair runs once
            pass
        ka, kb, s = _topn_with_ties(ka, kb, s, n_pairs)
        return pd.DataFrame({"key_a": ka, "key_b": kb, "sim": s})

    futs = []
    for i in range(len(refs)):
        for j in range(i, len(refs)):
            futs.append(pair_task.remote(refs[i], refs[j], i == j))
    cands = pd.concat(ray.get(futs), ignore_index=True)
    cands = cands.sort_values(["sim", "key_a", "key_b"],
                              ascending=[False, True, True],
                              kind="stable").head(n_pairs)
    cands = cands.drop(columns=["sim"]).reset_index(drop=True)
    cands["rank"] = np.arange(1, len(cands) + 1, dtype=np.int64)
    return rd.from_pandas(cands)


def cosine_threshold_pairs(ds, *, threshold: float,
                           key_col: str = "vec_id",
                           vec_col: str = "embedding",
                           target_rows_per_block: int = 8192):
    """Exact embedding-cosine near-dup: every unordered pair with
    cosine >= threshold, via one Ray task per unordered block pair
    (the brute-force baseline of the near-dup family; the LSH-bucketed
    scale path is embed_near_dup_lsh). Same block machinery as
    _top_pairs_blockpair, but tasks emit every qualifying pair and the
    result is assembled with from_pandas_refs — the driver holds only
    block refs, never a pair table.

    Returns Dataset(key_a, key_b, cos) with key_a < key_b."""
    import ray
    import ray.data as rd

    def prep(t: pa.Table) -> pa.Table:
        E = _stack_embeddings(t.column(vec_col))
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        flat = pa.array(En.reshape(-1))
        return pa.table({
            "key": pc.cast(t.column(key_col), pa.int64()),
            "vec": pa.FixedSizeListArray.from_arrays(flat, E.shape[1]),
        })

    cpus = int(ray.cluster_resources().get("CPU", 4)) \
        if ray.is_initialized() else 4
    n = ds.count()
    by_cpu = int(np.ceil(np.sqrt(2 * cpus)))
    nblocks = max(1, min(64, max(-(-n // target_rows_per_block),
                                 min(by_cpu, -(-n // 256)))))
    mat = ds.map_batches(prep, batch_format="pyarrow") \
        .repartition(nblocks).materialize()
    refs = [r for bundle in mat.iter_internal_ref_bundles()
            for r in bundle.block_refs]

    @ray.remote
    def pair_task(blk_a, blk_b, same: bool):
        ta = blk_a if isinstance(blk_a, pa.Table) else blk_a.to_arrow()
        tb = blk_b if isinstance(blk_b, pa.Table) else blk_b.to_arrow()
        ida = ta.column("key").to_numpy()
        idb = tb.column("key").to_numpy()
        A = _stack_embeddings(ta.column("vec"))
        Bm = _stack_embeddings(tb.column("vec"))
        sims = A @ Bm.T
        mask = sims >= threshold
        if same:
            mask &= ida[:, None] < idb[None, :]
        ii, jj = np.nonzero(mask)
        ka = np.minimum(ida[ii], idb[jj])
        kb = np.maximum(ida[ii], idb[jj])
        return pd.DataFrame({"key_a": ka, "key_b": kb,
                             "cos": sims[ii, jj]})

    futs = []
    for i in range(len(refs)):
        for j in range(i, len(refs)):
            futs.append(pair_task.remote(refs[i], refs[j], i == j))
    return rd.from_pandas_refs(futs)


def _top_pairs_lsh(ds, n_pairs: int, key_col: str, vec_col: str,
                   threshold: float):
    """Top-N pair ranking over LSH-generated, exact-verified
    candidates — no driver-side embedding matrix; the driver only
    sees the verified (small) pair set."""
    import ray.data as rd

    first = ds.limit(1).to_pandas()
    dim = len(first[vec_col].iloc[0])
    pairs = embed_near_dup_lsh(ds, dim=dim, threshold=threshold,
                               key_col=key_col, vec_col=vec_col) \
        .to_pandas()
    if len(pairs) == 0:
        return rd.from_arrow(pa.table({
            "key_a": pa.array([], type=pa.int64()),
            "key_b": pa.array([], type=pa.int64()),
            "rank": pa.array([], type=pa.int64())}))
    pairs = pairs.sort_values(["cos", "key_a", "key_b"],
                              ascending=[False, True, True],
                              kind="stable").head(n_pairs)
    pairs = pairs.drop(columns=["cos"]).reset_index(drop=True)
    pairs["rank"] = np.arange(1, len(pairs) + 1, dtype=np.int64)
    return rd.from_pandas(pairs)


# ---------------------------------------- hyperplane LSH (scale path)

def hyperplane_signatures(ds, *, dim: int, n_bits: int = 64,
                          key_col: str = "vec_id",
                          vec_col: str = "embedding", seed: int = 0x5EED):
    """Sign-random-projection signatures: bit b = sign(v . h_b) for a
    deterministic (seeded) hyperplane matrix — P(bit match) =
    1 - angle/pi, the cosine-LSH family. One GEMM per batch."""
    rng = np.random.default_rng(seed)
    H = rng.standard_normal((dim, n_bits))
    powers = np.uint64(1) << np.arange(n_bits, dtype=np.uint64)

    def _b(t: pa.Table) -> pa.Table:
        E = _stack_embeddings(t.column(vec_col))
        bits = (E @ H) > 0
        sig = (bits.astype(np.uint64) * powers[None, :]).sum(axis=1,
                                                             dtype=np.uint64)
        return pa.table({"key": t.column(key_col), "sig": pa.array(sig)})

    return ds.map_batches(_b, batch_format="pyarrow")


def embed_near_dup_lsh(ds, *, dim: int, threshold: float = 0.85,
                       n_bits: int = 64, bands: int = 8,
                       key_col: str = "vec_id", vec_col: str = "embedding",
                       seed: int = 0x5EED, verify: str = "auto",
                       broadcast_max_candidates: int = 200_000):
    """Embedding near-dup at corpus scale: hyperplane signatures →
    banded bucket shuffle (identical shape to MinHash LSH — only
    fixed-width columns move) → exact-cosine verification of
    candidate pairs. No all-pairs GEMM, no full-matrix broadcast.
    Approximate (LSH recall measured in tests); `top_similar_pairs`
    is the exact small-table form.

    ``verify``: "broadcast" re-fetches candidate vectors into a
    ray.put'd dict (cheapest while candidates fit worker RAM);
    "join" double hash-joins the pair table against the (key, vec)
    corpus projection — no driver key set, memory bounded per
    partition; "auto" switches at ``broadcast_max_candidates``.

    Returns Dataset (key_a, key_b, cos)."""
    import ray

    from spapy_ray.util import cached_state

    rows_per_band = n_bits // bands
    # sigs feeds exactly one consumer (band_rows) — no materialize
    # barrier; `banded` IS materialized because two stages read it
    sigs = hyperplane_signatures(ds, dim=dim, n_bits=n_bits,
                                 key_col=key_col, vec_col=vec_col,
                                 seed=seed)

    def band_rows(t: pa.Table) -> pa.Table:
        sig = t.column("sig").to_numpy()
        n = len(t)
        mask = np.uint64((1 << rows_per_band) - 1)
        parts_b, parts_h, keys = [], [], []
        for b in range(bands):
            bh = (sig >> np.uint64(b * rows_per_band)) & mask
            parts_b.append(np.full(n, b, dtype=np.int8))
            parts_h.append(bh.view(np.int64))
            keys.append(t.column("key"))
        return pa.table({
            "bkey": pa.array(np.concatenate(parts_h) * np.int64(16)
                             + np.concatenate(parts_b)),
            "key": pa.concat_arrays([k.combine_chunks()
                                     if isinstance(k, pa.ChunkedArray) else k
                                     for k in keys])})

    banded = sigs.map_batches(band_rows, batch_format="pyarrow")

    # candidate pairs within each collision bucket — same vectorized
    # batched-by-size emission as the MinHash path (relational.py);
    # one shuffle, singleton buckets emit nothing (no Count pre-pass,
    # no driver-side hot-bucket list — see neardup.near_dup_pairs)
    from ray.data.aggregate import Count
    from spapy_ray.stages.relational import within_group_pairs

    cand = within_group_pairs(banded, "bkey", "key")

    def pair_dedup_local(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates(["key_a", "key_b"])
        return pa.Table.from_pandas(df, preserve_index=False)

    cand = cand.map_batches(pair_dedup_local, batch_format="pyarrow") \
        .groupby(["key_a", "key_b"]).aggregate(Count(alias_name="c__"))

    def drop_c(t: pa.Table) -> pa.Table:
        return t.select(["key_a", "key_b"])

    cand = cand.map_batches(drop_c, batch_format="pyarrow").materialize()

    if verify == "auto":
        verify = "broadcast" if cand.count() <= broadcast_max_candidates \
            else "join"
    if verify == "join":
        return _verify_embed_join(ds, cand, key_col, vec_col, threshold)

    # exact verification: fetch candidate vectors only
    cand_keys = set()
    for b in cand.iter_batches(batch_format="pyarrow"):
        cand_keys.update(b.column("key_a").to_pylist())
        cand_keys.update(b.column("key_b").to_pylist())
    key_type = pa.int64()
    base = ds.schema().base_schema
    if isinstance(base, pa.Schema) and key_col in base.names:
        key_type = base.field(key_col).type
    if not cand_keys:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "key_a": pa.array([], type=key_type),
            "key_b": pa.array([], type=key_type),
            "cos": pa.array([], type=pa.float64())}))
    keys_arr = pa.array(sorted(cand_keys), type=key_type)

    fetched = []

    def fetch(t: pa.Table) -> pa.Table:
        m = pc.is_in(t.column(key_col), value_set=keys_arr)
        tt = t.filter(m)
        return pa.table({"key": tt.column(key_col),
                         "vec": tt.column(vec_col)})

    for b in ds.map_batches(fetch, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        if len(b):
            V = _stack_embeddings(b.column("vec"))
            fetched.append((b.column("key").to_numpy(zero_copy_only=False),
                            V / np.linalg.norm(V, axis=1, keepdims=True)))
    lookup = {k_: v for ks, vs in fetched for k_, v in zip(ks, vs)}
    vref = ray.put(lookup)
    box = (vref,)

    def verify_bc(t: pa.Table) -> pa.Table:
        lk = cached_state(box, lambda d: d)
        ka = t.column("key_a").to_pylist()
        kb = t.column("key_b").to_pylist()
        cos = np.array([float(lk[a] @ lk[b]) for a, b in zip(ka, kb)])
        keep = cos >= threshold
        out = t.filter(pa.array(keep))
        return out.append_column("cos", pa.array(cos[keep]))

    return cand.map_batches(verify_bc, batch_format="pyarrow")


def _verify_embed_join(ds, cand, key_col: str, vec_col: str,
                       threshold: float, buckets: int = 64):
    """Co-partitioned exact-cosine verify: the candidate pairs pick
    up both vectors through the union + bucketed-groupby co-partition
    (relational.pair_payload_copartition) — no driver key collection,
    no broadcast; per-worker memory is one bucket of
    (candidates + vectors). Vectors ship as little-endian f8 bytes
    (fixed-width binary payload) and reshape after."""
    from spapy_ray.stages.relational import pair_payload_copartition

    def project(t: pa.Table) -> pa.Table:
        V = np.ascontiguousarray(
            _stack_embeddings(t.column(vec_col)), dtype="<f8")
        d = V.shape[1] if len(V) else 0
        flat = V.tobytes()
        bufs = [flat[i * 8 * d:(i + 1) * 8 * d] for i in range(len(V))]
        return pa.table({"k": t.column(key_col),
                         "payload": pa.array(bufs, type=pa.binary())})

    paired = pair_payload_copartition(
        cand, ds.map_batches(project, batch_format="pyarrow"),
        payload_col="payload", payload_type=pa.binary(), buckets=buckets)

    def _unpack(col) -> np.ndarray:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        buf = b"".join(col.to_pylist())
        n = len(col)
        return np.frombuffer(buf, dtype="<f8").reshape(n, -1)

    def verify_join(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.drop_columns(["payload_a", "payload_b"]) \
                .append_column("cos", pa.array([], type=pa.float64()))
        A = _unpack(t.column("payload_a"))
        B = _unpack(t.column("payload_b"))
        An = A / np.linalg.norm(A, axis=1, keepdims=True)
        Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
        cos = np.einsum("ij,ij->i", An, Bn)
        keep = cos >= threshold
        out = t.filter(pa.array(keep)) \
            .drop_columns(["payload_a", "payload_b"])
        return out.append_column("cos", pa.array(cos[keep]))

    return paired.map_batches(verify_join, batch_format="pyarrow")


def vector_group_mean(ds, group_col: str = "label",
                      vec_col: str = "embedding",
                      scale: int = 1_000_000):
    """Per-group embedding centroids (class means) — the vector
    AGGREGATE primitive (kmeans seeding, per-language/type centroids)
    as one combiner pass + one tiny bucketed fold.

    Components are quantized to exact int64 fixed point
    (floor(x*scale + 0.5) — floor-plus-half on BOTH engine and SQL
    sides sidesteps the np.rint/DuckDB-round half-even divergence,
    NOTES_r3), so partial sums are order-independent and the final
    mean (int sum / (n*scale), one double division of exact operands)
    is bit-identical to the DuckDB unnest-WITH-ORDINALITY twin.

    Each batch collapses to one (group, n, sums-payload) row per group
    seen — O(groups x blocks) rows shuffle, never one per vector.
    Returns long form (group_col, dim_idx, mean_val)."""
    def partial(t: pa.Table) -> pa.Table:
        V = _stack_embeddings(t.column(vec_col))
        q = np.floor(V * scale + 0.5).astype(np.int64)
        lab = t.column(group_col).to_numpy(zero_copy_only=False)
        u, inv = np.unique(lab, return_inverse=True)
        acc = np.zeros((len(u), q.shape[1]), dtype=np.int64)
        np.add.at(acc, inv, q)
        cnt = np.bincount(inv, minlength=len(u)).astype(np.int64)
        payload = [acc[i].tobytes() for i in range(len(u))]
        return pa.table({group_col: pa.array(u), "n": pa.array(cnt),
                         "s": pa.array(payload, type=pa.binary())})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        labs, dims, means = [], [], []
        for lab_val, grp in df.groupby(group_col, sort=False):
            S = np.sum(np.stack([np.frombuffer(b, dtype=np.int64)
                                 for b in grp["s"]]), axis=0)
            n = int(grp["n"].sum())
            d = len(S)
            labs.append(np.full(d, lab_val,
                                dtype=grp[group_col].dtype))
            dims.append(np.arange(d, dtype=np.int64))
            means.append(S.astype(np.float64) / float(n * scale))
        if not labs:
            return pd.DataFrame({group_col: [], "dim_idx": [],
                                 "mean_val": []})
        return pd.DataFrame({
            group_col: np.concatenate(labs),
            "dim_idx": np.concatenate(dims),
            "mean_val": np.concatenate(means)})

    from spapy_ray.stages.relational import bucketed_group_agg

    return bucketed_group_agg(
        ds.map_batches(partial, batch_format="pyarrow"), group_col, fold)


def knn_join_embeddings(left, right, *, k: int = 5,
                        key_col: str = "vec_id",
                        vec_col: str = "embedding",
                        target_rows_per_block: int = 8192):
    """Bipartite exact cosine kNN join: every LEFT vector retrieves
    its top-k RIGHT vectors — the cross-corpus retrieval shape (query
    log vs document index, new batch vs reference corpus).

    Scale design: both sides normalize per block and materialize; one
    Ray task per (left block, right block) pair runs a GEMM and emits
    each left row's block-local top-k (global top-k per key ⊆ union
    of block-local top-ks); a final groupby(key) merges partials. The
    driver holds BLOCK REFS plus partial frames of <= rows x k — never
    an embedding matrix.

    Tie-exactness (ADVICE r2 theme): right rows are pre-sorted by key
    inside each block, so a STABLE argsort of -sims realizes the
    (sim desc, key asc) total order; selection pools k+64 candidates
    by argpartition and falls back to a full stable row sort for the
    rare rows whose pool boundary ties the k-th value.

    Returns Dataset (qid, vec_id, rank), rank 1..k.
    """
    import ray
    import ray.data as rd

    def prep(t: pa.Table) -> pa.Table:
        E = _stack_embeddings(t.column(vec_col))
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        flat = pa.array(En.reshape(-1))
        return pa.table({
            "key": pc.cast(t.column(key_col), pa.int64()),
            "vec": pa.FixedSizeListArray.from_arrays(flat, E.shape[1]),
        })

    def blocks_of(ds):
        n = ds.count()
        if n == 0:
            # an empty side never runs prep, so its lone block would
            # miss the prepped schema entirely
            return []
        nb = max(1, min(64, -(-n // target_rows_per_block)))
        mat = ds.map_batches(prep, batch_format="pyarrow") \
            .repartition(nb).materialize()
        return [r for bundle in mat.iter_internal_ref_bundles()
                for r in bundle.block_refs]

    lrefs, rrefs = blocks_of(left), blocks_of(right)
    if not lrefs or not rrefs:
        return rd.from_arrow(pa.table({
            "qid": pa.array([], type=pa.int64()),
            "vec_id": pa.array([], type=pa.int64()),
            "rank": pa.array([], type=pa.int64())}))

    @ray.remote
    def pair_task(bl, br):
        tl = bl if isinstance(bl, pa.Table) else bl.to_arrow()
        tr = br if isinstance(br, pa.Table) else br.to_arrow()
        qid = tl.column("key").to_numpy()
        rid = tr.column("key").to_numpy()
        if len(qid) == 0 or len(rid) == 0:
            return pd.DataFrame({"qid": np.array([], dtype=np.int64),
                                 "vec_id": np.array([], dtype=np.int64),
                                 "sim": np.array([], dtype=np.float64)})
        order = np.argsort(rid, kind="stable")   # key-ascending columns
        rid = rid[order]
        A = _stack_embeddings(tl.column("vec"))
        B = _stack_embeddings(tr.column("vec"))[order]
        sims = A @ B.T
        n, nb = sims.shape
        kk = min(k, nb)
        P = min(nb, kk + 64)
        if P < nb:
            part = np.argpartition(-sims, P - 1, axis=1)[:, :P]
        else:
            part = np.broadcast_to(np.arange(nb), (n, nb)).copy()
        part.sort(axis=1)                        # id-ascending pool
        pooled = np.take_along_axis(sims, part, axis=1)
        ordp = np.argsort(-pooled, axis=1, kind="stable")[:, :kk]
        sel = np.take_along_axis(part, ordp, axis=1)
        sel_sims = np.take_along_axis(pooled, ordp, axis=1)
        if P < nb:
            # rows whose pool boundary ties the k-th value may miss an
            # equal-sim smaller id outside the pool: full sort those
            kth = sel_sims[:, -1]
            bound = pooled.min(axis=1)
            for r in np.flatnonzero(bound >= kth):
                full = np.argsort(-sims[r], kind="stable")[:kk]
                sel[r], sel_sims[r] = full, sims[r][full]
        return pd.DataFrame({
            "qid": np.repeat(qid, kk),
            "vec_id": rid[sel].reshape(-1),
            "sim": sel_sims.reshape(-1)})

    futs = [pair_task.remote(bl, br) for bl in lrefs for br in rrefs]
    cands = rd.from_pandas_refs(futs)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True],
                          kind="stable").head(k)
        g = g.drop(columns=["sim"])
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return cands.groupby("qid").map_groups(final, batch_format="pandas")


def random_projection(ds, *, key_col: str = "vec_id",
                      vec_col: str = "embedding", out_dim: int = 8,
                      quant: int = 1_000_000):
    """Signed random projection (Achlioptas/JL dimensionality
    reduction — the hyperplane-LSH basis exposed as a first-class
    embedding transform): y_j = Σ_i sign(i, j) · round(x_i · quant),
    sign(i, j) = ±1 from the parity of fnv1a64("rp:i:j") — a pure
    function of the coordinates, so the projection matrix needs no
    storage, no broadcast, and has a bit-exact SQL twin (quantized
    int64 inputs make the sum order-independent).

    Stateless single map (one int64 GEMM per batch); returns the
    LONG form Dataset(key_col, j, y) — out_dim rows per vector.
    """
    from spapy_ray.kernels.hashing import fnv1a64_scalar

    sign_cache: dict[int, np.ndarray] = {}

    def signs_for(d: int) -> np.ndarray:
        m = sign_cache.get(d)
        if m is None:
            m = np.array([[1 if fnv1a64_scalar(f"rp:{i}:{j}") & 1
                           else -1 for j in range(out_dim)]
                          for i in range(d)], dtype=np.int64)
            sign_cache[d] = m
        return m

    def project(t: pa.Table) -> pa.Table:
        emb = _stack_embeddings(t.column(vec_col))
        n, d = emb.shape
        e_int = np.round(emb * quant).astype(np.int64)
        y = e_int @ signs_for(d)
        keys = t.column(key_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            key_col: pa.array(np.repeat(keys, out_dim)),
            "j": pa.array(np.tile(np.arange(out_dim, dtype=np.int64),
                                  n)),
            "y": pa.array(y.ravel())})

    return ds.map_batches(project, batch_format="pyarrow")


def quantize_int8_stats(ds, *, vec_col: str = "embedding",
                        key_col: str = "vec_id"):
    """Linear int8 (0..255) embedding quantization — the storage/
    bandwidth compression step before ANN at corpus scale (4x over
    float32, 8x over float64). Two streaming passes:

    1. per-dimension global min/max: each block folds to ONE
       (2 x d)-float partial; the driver reduces a blocks-count pile
       of 1 KB rows (never the vectors);
    2. codes = clamp(floor(((v - mn) * 255.0) / (mx - mn)), 0, 255)
       per element with the (d)-sized bounds broadcast once. The
       expression is evaluated in float64 in EXACTLY this operation
       order so the codes are bit-identical to the SQL twin
       (DuckDB list elements must be cast ::DOUBLE first — FLOAT
       list arithmetic diverges, NOTES_r3). Constant dimensions
       (mx == mn) quantize to 0.

    Returns Dataset(key, code_sum, code_min, code_max, dim) — the
    per-vector code summary (hash-checkable without shipping the
    code lists; the codes themselves stay inside the pipeline for a
    downstream ANN stage to consume).
    """
    import ray

    def mm_partial(t: pa.Table) -> pa.Table:
        m = _stack_embeddings(t.column(vec_col))
        return pa.table({
            "mn": pa.array(m.min(axis=0)),
            "mx": pa.array(m.max(axis=0)),
            "i": pa.array(np.arange(m.shape[1], dtype=np.int64))})

    parts = ds.select_columns([vec_col]).map_batches(
        mm_partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby("i", sort=True)
    mn = g["mn"].min().to_numpy(dtype=np.float64)
    mx = g["mx"].max().to_numpy(dtype=np.float64)
    ref = ray.put((mn, mx))

    def quant(t: pa.Table, _ref=ref) -> pa.Table:
        lo, hi = ray.get(_ref)
        m = _stack_embeddings(t.column(vec_col))
        span = hi - lo
        safe = np.where(span > 0, span, 1.0)
        codes = np.floor(((m - lo[None, :]) * 255.0) / safe[None, :])
        codes = np.clip(codes, 0, 255)
        codes[:, span <= 0] = 0
        codes = codes.astype(np.int64)
        return pa.table({
            key_col: t.column(key_col),
            "code_sum": pa.array(codes.sum(axis=1)),
            "code_min": pa.array(codes.min(axis=1)),
            "code_max": pa.array(codes.max(axis=1)),
            "dim": pa.array(np.full(len(codes), m.shape[1],
                                    dtype=np.int64))})

    return ds.select_columns([key_col, vec_col]).map_batches(
        quant, batch_format="pyarrow")


def embed_dim_stats(ds, *, vec_col: str = "embedding",
                    scale: int = 10_000_000):
    """Per-dimension embedding statistics for normalization planning:
    (dim, n, sum_q, min, max) where sum_q folds trunc(v * scale) in
    int64 (truncation, not rounding — round-half ties differ between
    numpy's half-even and SQL's half-away; trunc has no ties) — integer partials are order-independent, so the
    distributed sum is exact and SQL-twin-able (a float64 sum has no
    deterministic distributed order). min/max are exact doubles.
    One streaming pass; each block collapses to d rows."""
    def partial(t: pa.Table) -> pa.Table:
        m = _stack_embeddings(t.column(vec_col))
        q = np.trunc(m * scale).astype(np.int64)
        d = m.shape[1]
        return pa.table({
            "dim": pa.array(np.arange(d, dtype=np.int64)),
            "n": pa.array(np.full(d, len(m), dtype=np.int64)),
            "sum_q": pa.array(q.sum(axis=0)),
            "mn": pa.array(m.min(axis=0)),
            "mx": pa.array(m.max(axis=0))})

    parts = ds.select_columns([vec_col]).map_batches(
        partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby("dim", sort=True)
    out = pd.DataFrame({
        "dim": np.asarray(sorted(parts["dim"].unique()),
                          dtype=np.int64),
        "n": g["n"].sum().to_numpy(dtype=np.int64),
        "sum_q": g["sum_q"].sum().to_numpy(dtype=np.int64),
        "mn": g["mn"].min().to_numpy(dtype=np.float64),
        "mx": g["mx"].max().to_numpy(dtype=np.float64)})
    return out


def kmeans_int(ds, *, k: int = 8, iters: int = 3,
               scale: int = 1 << 20, id_col: str = "vec_id",
               emb_col: str = "embedding"):
    """Deterministic EXACT-integer Lloyd k-means over an embedding
    column: components quantize to trunc(v * scale) (trunc is
    tie-free, the engine's float-quantization convention), centroids
    init from the k smallest ids, squared-L2 assignment with ties to
    the LOWEST cluster, centroid update by trunc-division of integer
    sums (sign * (|num| // |den|) — DuckDB ``//`` truncates), empty
    clusters keep their previous centroid. Everything is int64, so
    the whole iteration unrolls into a bit-exact SQL twin.

    Distributed shape — the pagerank pattern: centroids broadcast
    via ray.put each iteration; one map pass folds per-batch
    (cluster, dim) integer sums + counts (k x dim partials, tiny);
    the driver updates centroids; a final pass emits assignments.
    Returns Dataset(vec_id, cluster).
    """
    import ray

    def quant(t: pa.Table) -> pa.Table:
        x = np.trunc(_stack_embeddings(t.column(emb_col))
                     .astype(np.float64) * scale).astype(np.int64)
        return pa.table({
            "vec_id": pc.cast(t.column(id_col), pa.int64()),
            "xq": pa.array(list(x)),
        })

    q = ds.map_batches(quant, batch_format="pyarrow").materialize()

    # init: the k smallest vec_ids (collected via a filtered pass —
    # k rows, driver-small)
    init = pa.concat_tables(
        [b for b in q.filter(expr=f"vec_id < {k}")
         .iter_batches(batch_format="pyarrow")],
        promote_options="default").to_pandas().sort_values("vec_id")
    if len(init) != k:
        raise ValueError(f"need vec_ids 0..{k - 1} for init")
    cents = np.stack([np.asarray(v, dtype=np.int64)
                      for v in init["xq"]])

    def assign(x: np.ndarray, c: np.ndarray) -> np.ndarray:
        # dist matrix [n, k]; argmin ties to lowest cluster index
        d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return d.argmin(axis=1)

    for _ in range(iters):
        ref = ray.put(cents)

        def partial(t: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref)
            x = np.stack([np.asarray(v, dtype=np.int64)
                          for v in t.column("xq").to_pylist()])
            a = assign(x, c)
            dim = x.shape[1]
            s = np.zeros((len(c), dim), dtype=np.int64)
            np.add.at(s, a, x)
            n = np.bincount(a, minlength=len(c)).astype(np.int64)
            return pa.table({
                "j": pa.array(np.arange(len(c), dtype=np.int64)),
                "n": pa.array(n),
                "s": pa.array(list(s))})

        got = pa.concat_tables(
            [b for b in q.map_batches(partial,
                                      batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow")],
            promote_options="default")
        js = got.column("j").to_numpy(zero_copy_only=False)
        ns = got.column("n").to_numpy(zero_copy_only=False)
        dim = cents.shape[1]
        s = np.zeros((k, dim), dtype=np.int64)
        n = np.zeros(k, dtype=np.int64)
        for row, (j, cnt) in enumerate(zip(js, ns)):
            s[j] += np.asarray(got.column("s")[row].as_py(),
                               dtype=np.int64)
            n[j] += cnt
        new = cents.copy()
        nz = n > 0
        num = s[nz]
        den = n[nz][:, None]
        new[nz] = np.sign(num) * (np.abs(num) // den)
        cents = new

    ref = ray.put(cents)

    def final(t: pa.Table, _ref=ref) -> pa.Table:
        c = ray.get(_ref)
        x = np.stack([np.asarray(v, dtype=np.int64)
                      for v in t.column("xq").to_pylist()])
        return pa.table({
            "vec_id": t.column("vec_id"),
            "cluster": pa.array(assign(x, c).astype(np.int64))})

    return q.map_batches(final, batch_format="pyarrow")
