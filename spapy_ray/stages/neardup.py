"""Near-duplicate detection: MinHash + LSH, SimHash, n-gram Jaccard.

Training-data dedup family over text tables. All signature math is
deterministic FNV-1a (kernels.hashing), so MinHash signatures have an
exact DuckDB twin (oracle.q_minhash_signatures) — the LSH banding /
candidate verification layers are checked in pytest against planted
near-duplicates.

Scale shape: signatures are a stateless vectorized map; LSH is ONE
groupby on (band_id, band_hash) — the canonical shingle→minhash→
band→bucket shuffle; exact-Jaccard verification runs inside the
bucket groups (candidate sets are small by construction).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from spapy_ray.kernels.hashing import fnv1a64

U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def _shingle_array(text: pa.Array, n: int = 3):
    """→ (flat_shingles: pa.Array, doc_starts, doc_counts).

    Shingle = n consecutive ' '-separated tokens joined by ' '.
    Documents with < n tokens contribute their whole text as one
    shingle (degenerate case)."""
    toks = pc.split_pattern(text, " ")
    offsets = np.asarray(toks.offsets)
    flat = toks.values
    counts = np.diff(offsets)
    total = len(flat)
    if total >= n:
        parts = [flat.slice(i, total - n + 1) for i in range(n)]
        shingles_all = pc.binary_join_element_wise(*parts, " ")
    else:
        shingles_all = pa.array([], type=pa.string())
    # valid shingle start positions: per doc, [start, start+count-n]
    starts = offsets[:-1]
    sh_counts = np.maximum(counts - (n - 1), 0)
    return shingles_all, starts, sh_counts, counts


MINHASH_SEED = 0x9E3779B97F4A7C15
FNV_PRIME = 0x100000001B3


def minhash_mix_key(i: int) -> int:
    return (MINHASH_SEED * (i + 1)) % (1 << 64)


def minhash_batch(batch: pa.Table, text_col: str = "text",
                  num_hashes: int = 16, shingle_n: int = 3) -> pa.Table:
    """Append sig0..sig{k-1} uint64 MinHash columns.

    sig_i(doc) = min over shingles s of mix(fnv1a64(s), i) with
        mix(h, i) = ((h XOR K_i) * FNV_PRIME) mod 2^64,
        K_i = golden-ratio constant * (i+1) mod 2^64.
    Shingles are byte-hashed ONCE; per-seed variation is pure integer
    arithmetic (16x less string hashing than seed-prefix concat), and
    the SQL twin reproduces the same mix exactly.
    """
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    shingles, starts, sh_counts, tok_counts = _shingle_array(text, shingle_n)
    ndocs = len(batch)
    out = batch
    # fully-vectorized segmented min: interleaved [start, end) index
    # pairs into np.minimum.reduceat (even slots are the real
    # segments; odd slots cover the cross-document gap shingles and
    # are discarded)
    seg_starts = starts.astype(np.int64)
    short = sh_counts == 0
    nzi = np.nonzero(~short)[0]
    idx = np.empty(2 * len(nzi), dtype=np.int64)
    if len(nzi):
        idx[0::2] = seg_starts[nzi]
        idx[1::2] = seg_starts[nzi] + sh_counts[nzi]
    h_base = fnv1a64(shingles) if len(shingles) else np.zeros(0, np.uint64)
    h_short = fnv1a64(pc.take(text, pa.array(np.nonzero(short)[0]))) \
        if short.any() else None
    prime = np.uint64(FNV_PRIME)
    with np.errstate(over="ignore"):
        for i in range(num_hashes):
            k = np.uint64(minhash_mix_key(i))
            h_all = (h_base ^ k) * prime
            sig = np.full(ndocs, U64_MAX, dtype=np.uint64)
            if len(nzi):
                ix = idx[:-1] if idx[-1] >= len(h_all) else idx
                sig[nzi] = np.minimum.reduceat(h_all, ix)[0::2]
            if h_short is not None:
                sig[short] = (h_short ^ k) * prime
            out = out.append_column(f"sig{i}", pa.array(sig))
    return out


def minhash_signatures(ds, text_col: str = "text", num_hashes: int = 16,
                       shingle_n: int = 3, batch_size: int | None = 4096):
    return ds.map_batches(
        lambda t: minhash_batch(t, text_col, num_hashes, shingle_n),
        batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True)


def jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    def sh(t):
        w = t.split(" ")
        return set(" ".join(w[i:i + n]) for i in range(max(len(w) - n + 1, 1)))

    a, b = sh(text_a), sh(text_b)
    return len(a & b) / max(len(a | b), 1)


def _key_type(ds, key_col: str) -> pa.DataType:
    base = ds.schema().base_schema
    if isinstance(base, pa.Schema) and key_col in base.names:
        return base.field(key_col).type
    # pandas-block datasets expose a PandasBlockSchema (names +
    # numpy dtypes), not a pa.Schema — falling back to string there
    # broke integer keys
    names = getattr(base, "names", None)
    types = getattr(base, "types", None)
    if names and types is not None and key_col in names:
        t = types[list(names).index(key_col)]
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(t)
        except (pa.ArrowNotImplementedError, TypeError):
            pass
    return pa.string()


def _empty_pairs(ds, key_col: str):
    """Empty (key_a, key_b, jacc) result with the corpus key type —
    a null-typed empty array would poison downstream is_in/joins."""
    import ray as _ray

    kt = _key_type(ds, key_col)
    return _ray.data.from_arrow(pa.table({
        "key_a": pa.array([], type=kt),
        "key_b": pa.array([], type=kt),
        "jacc": pa.array([], type=pa.float64())}))


def near_dup_pairs(ds, key_col: str, text_col: str = "text",
                   num_hashes: int = 16, bands: int = 4,
                   threshold: float = 0.8, shingle_n: int = 3,
                   verify: str = "auto",
                   broadcast_max_candidates: int = 200_000,
                   pair_filter=None):
    """MinHash-LSH candidate generation + exact-Jaccard verification.

    shingle → minhash (map) → band rows (flat map, FIXED-WIDTH
    columns only: band, bhash, key) → groupby(band, band_hash) →
    candidate pairs → dedup → verify.

    The banded shuffle never carries document text (at corpus scale
    that would move bands× the corpus through the exchange);
    verification re-fetches text for the candidate keys only.  Two
    verify paths:

    - ``broadcast``: is_in filter on the corpus + ray.put'd
      {key: text} dict — cheapest while the candidate set fits in
      worker RAM.
    - ``join``: co-partitioned double hash-join of the candidate
      pairs against the (key, text) corpus projection — no driver
      key collection, no broadcast; memory per worker bounded by
      partition size, so it holds when candidates outgrow a
      broadcast.

    ``verify="auto"`` picks broadcast below
    ``broadcast_max_candidates`` candidate pairs and join above.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(ds, text_col, num_hashes, shingle_n)

    def band_rows(t: pa.Table) -> pa.Table:
        n = len(t)
        sig_mat = np.column_stack([t.column(f"sig{i}").to_numpy()
                                   for i in range(num_hashes)])
        out_band, out_hash, out_key = [], [], []
        keys = t.column(key_col)
        for b in range(bands):
            chunk = sig_mat[:, b * rows_per_band:(b + 1) * rows_per_band]
            # band hash: fnv over the band's signature bytes
            with np.errstate(over="ignore"):
                bh = np.full(n, np.uint64(0xCBF29CE484222325))
                for c in range(rows_per_band):
                    bh = (bh ^ chunk[:, c]) * np.uint64(0x100000001B3)
            out_band.append(np.full(n, b, dtype=np.int8))
            out_hash.append(bh.view(np.int64))
            out_key.append(keys)
        return pa.table({
            "band": pa.array(np.concatenate(out_band)),
            "bhash": pa.array(np.concatenate(out_hash)),
            "key": pa.concat_arrays([k.combine_chunks() if
                                     isinstance(k, pa.ChunkedArray) else k
                                     for k in out_key]),
        })

    def add_bucket_key(t: pa.Table) -> pa.Table:
        bk = (t.column("bhash").to_numpy() * np.int64(8)
              + t.column("band").to_numpy().astype(np.int64))
        return t.append_column("bkey", pa.array(bk))

    banded = sigs.map_batches(band_rows, batch_format="pyarrow") \
        .map_batches(add_bucket_key, batch_format="pyarrow")

    # candidate pairs within each collision bucket: ONE hash-bucket
    # shuffle + batched-by-size vectorized emission; singleton
    # buckets (almost all of them) die inside the segment walk at
    # zero cost. An earlier version pre-filtered collision buckets
    # through a Count aggregate — that added a second full shuffle
    # AND a driver-side hot-bucket list (O(collision buckets) rows on
    # the driver: a scale hazard), for no change in the pair set.
    from ray.data.aggregate import Count
    from spapy_ray.stages.relational import within_group_pairs

    cand = within_group_pairs(banded, "bkey", "key")

    # a pair can surface from several bands → dedup on (key_a, key_b)
    def pair_dedup_local(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates(["key_a", "key_b"])
        return pa.Table.from_pandas(df, preserve_index=False)

    cand = cand.map_batches(pair_dedup_local, batch_format="pyarrow") \
        .groupby(["key_a", "key_b"]).aggregate(Count(alias_name="c__"))

    def drop_c(t: pa.Table) -> pa.Table:
        return t.select(["key_a", "key_b"])

    cand = cand.map_batches(drop_c, batch_format="pyarrow")
    if pair_filter is not None:
        # e.g. keep only cross-corpus pairs (contamination check) —
        # applied BEFORE verification so filtered pairs never fetch
        # their texts
        cand = cand.map_batches(pair_filter, batch_format="pyarrow")
    cand = cand.materialize()

    n_cand = cand.count()
    key_type = _key_type(ds, key_col)
    if n_cand == 0:
        return _empty_pairs(ds, key_col)

    if verify == "auto":
        verify = "broadcast" if n_cand <= broadcast_max_candidates else "join"

    if verify == "join":
        return _verify_pairs_join(ds, cand, key_col, text_col,
                                  threshold, shingle_n)

    # candidate keys (small) → broadcast text lookup
    import ray

    from spapy_ray.util import cached_state

    cand_keys = set()
    for b in cand.iter_batches(batch_format="pyarrow"):
        cand_keys.update(b.column("key_a").to_pylist())
        cand_keys.update(b.column("key_b").to_pylist())
    keys_arr = pa.array(sorted(cand_keys), type=key_type)

    def fetch_texts(t: pa.Table) -> pa.Table:
        m = pc.is_in(t.column(key_col), value_set=keys_arr)
        tt = t.filter(m)
        return pa.table({"key": tt.column(key_col),
                         "text": tt.column(text_col)})

    texts_df = ds.map_batches(fetch_texts, batch_format="pyarrow").to_pandas()
    lookup_ref = ray.put(dict(zip(texts_df["key"], texts_df["text"])))
    box = (lookup_ref,)

    def verify_bc(t: pa.Table) -> pa.Table:
        lookup = cached_state(box, lambda d: d)
        ka = t.column("key_a").to_pylist()
        kb = t.column("key_b").to_pylist()
        jc = np.array([jaccard(lookup[a], lookup[b], shingle_n)
                       for a, b in zip(ka, kb)])
        keep = jc >= threshold
        out = t.filter(pa.array(keep))
        return out.append_column("jacc", pa.array(jc[keep]))

    return cand.map_batches(verify_bc, batch_format="pyarrow")


def _verify_pairs_join(ds, cand, key_col: str, text_col: str,
                       threshold: float, shingle_n: int,
                       buckets: int = 64):
    """Co-partitioned exact-Jaccard verify with NO driver key set and
    no broadcast: one union + groupby(hash-bucket) attaches the text
    to each pair SIDE (the corpus projection shuffles once, on the
    key bucket), a second bucket shuffle on key_a reunites the two
    sides of each pair. Per-worker memory is one bucket of
    (candidates + texts), independent of total candidate count.

    This replaces two native Dataset.joins: same shuffle volume, but
    plain groupby exchanges instead of two per-partition aggregator
    actor pools (which cost ~2 s each to spin up at sandbox scale and
    deadlock when num_partitions exceeds the CPU count)."""
    from spapy_ray.stages.relational import pair_payload_copartition

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"k": t.column(key_col),
                         "payload": t.column(text_col)})

    paired = pair_payload_copartition(
        cand, ds.map_batches(project, batch_format="pyarrow"),
        payload_col="payload", payload_type=pa.string(), buckets=buckets)

    def verify(t: pa.Table) -> pa.Table:
        ta = t.column("payload_a").to_pylist()
        tb = t.column("payload_b").to_pylist()
        jc = np.array([jaccard(a, b, shingle_n) for a, b in zip(ta, tb)]) \
            if len(ta) else np.zeros(0)
        keep = jc >= threshold
        out = t.filter(pa.array(keep)) \
            .drop_columns(["payload_a", "payload_b"])
        return out.append_column("jacc", pa.array(jc[keep]))

    return paired.map_batches(verify, batch_format="pyarrow")


def pairwise_jaccard(ds, cand, key_col: str, text_col: str = "text",
                     shingle_n: int = 3, buckets: int = 64):
    """Exact n-gram (token-shingle) Jaccard for an explicit pair list
    — the direct dedup primitive when candidates come from elsewhere
    (an external blocklist, a URL-normalized key, a prior LSH round)
    rather than this module's own LSH banding.

    ``cand`` is a Dataset(key_a, key_b); the texts are attached with
    ONE co-partitioned payload shuffle (pair_payload_copartition —
    no driver key set, no broadcast) and every pair is scored inside
    its bucket. Pairs whose key is absent from the corpus drop
    (inner semantics, same as a SQL join on key existence).

    Returns Dataset(key_a, key_b, jacc) for ALL candidate pairs —
    jacc = |A∩B| / |A∪B| over distinct shingle sets, an exact
    rational of integer counts (bit-identical to its SQL twin)."""
    return _verify_pairs_join(ds, cand, key_col, text_col,
                              threshold=0.0, shingle_n=shingle_n,
                              buckets=buckets)


def near_dup_clusters(ds, key_col: str, text_col: str = "text",
                      num_hashes: int = 16, bands: int = 4,
                      threshold: float = 0.8, shingle_n: int = 3,
                      verify: str = "auto", buckets: int = 64,
                      components_mode: str = "auto"):
    """Cluster-level dedup (the CCNet/RefinedWeb shape): verified
    near-dup pairs → connected components → every clustered document
    mapped to its cluster's canonical representative (minimum key).

    Components run hash-to-min (stages/components.py) — near-dup
    graphs hash node ids uniformly, so the tile-local hierarchical
    merge (polygonize.spatial_min_label) has no locality to exploit
    here. A downstream keep-filter is ``doc_id == cluster_rep`` plus
    every unclustered document.

    Requires an integer key column. Returns Dataset(doc_id,
    cluster_rep) covering exactly the documents incident to at least
    one >= threshold pair."""
    from spapy_ray.stages.components import hash_to_min

    pairs = near_dup_pairs(ds, key_col, text_col=text_col,
                           num_hashes=num_hashes, bands=bands,
                           threshold=threshold, shingle_n=shingle_n,
                           verify=verify)

    def as_edges(t: pa.Table) -> pa.Table:
        return pa.table({
            "a": pc.cast(t.column("key_a"), pa.int64()),
            "b": pc.cast(t.column("key_b"), pa.int64())})

    labels = hash_to_min(pairs.map_batches(as_edges,
                                           batch_format="pyarrow"),
                         buckets=buckets, mode=components_mode)

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("v"),
                         "cluster_rep": t.column("lab")})

    return labels.map_batches(rename, batch_format="pyarrow")


# ------------------------------------------------------------ simhash

def simhash_batch(batch: pa.Table, text_col: str = "text",
                  out: str = "simhash") -> pa.Table:
    """64-bit SimHash over ' '-tokens (unweighted): per-bit majority
    vote of token FNV hashes, vectorized with a bit-unpack matrix."""
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern(text, " ")
    offsets = np.asarray(toks.offsets)
    h = fnv1a64(toks.values)
    starts = offsets[:-1].astype(np.int64)
    counts = np.diff(offsets).astype(np.int64)
    # per-bit segmented sums (np.add.reduceat) instead of a
    # [tokens x 64] vote matrix — ~10x less memory traffic
    sim = np.zeros(len(starts), dtype=np.uint64)
    nz = counts > 0
    idx = starts[nz]          # nonempty segments are contiguous in h
    for b in range(64):
        bits = ((h >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
        if len(idx):
            ones = np.add.reduceat(bits, idx)
            # reduceat's final segment runs to the end, which is what
            # we want since token segments are contiguous
            votes = 2 * ones - counts[nz]
            sim[nz] |= (votes > 0).astype(np.uint64) << np.uint64(b)
    return batch.append_column(out, pa.array(sim))


def simhash(ds, text_col: str = "text", batch_size: int | None = 4096):
    return ds.map_batches(lambda t: simhash_batch(t, text_col),
                          batch_format="pyarrow", batch_size=batch_size,
                          zero_copy_batch=True)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt


def cross_corpus_near_dup(left, right, key_col: str,
                          text_col: str = "text",
                          num_hashes: int = 16, bands: int = 4,
                          threshold: float = 0.8, shingle_n: int = 3,
                          verify: str = "auto"):
    """Contamination / train-eval overlap detection: near-duplicate
    pairs ACROSS two corpora (never within one) — the decontamination
    step of a training-data pipeline, as ONE banded LSH pass over the
    tagged union.

    Both sides must have int64 keys; the side is encoded in the key's
    low bit (key*2 + side) so the shared banding/bucketing machinery
    needs no schema change, candidate pairs are filtered to
    cross-side BEFORE text verification, and keys are decoded on the
    way out. Returns Dataset (key_left, key_right, jacc).
    """
    def tag(side: int):
        def _t(t: pa.Table) -> pa.Table:
            k = pc.add(pc.multiply(pc.cast(t.column(key_col), pa.int64()),
                                   pa.scalar(2, pa.int64())),
                       pa.scalar(side, pa.int64()))
            return pa.table({"key2": k, text_col: t.column(text_col)})
        return _t

    union = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow"))

    def cross_only(t: pa.Table) -> pa.Table:
        a = t.column("key_a").to_numpy()
        b = t.column("key_b").to_numpy()
        return t.filter(pa.array(((a ^ b) & 1) == 1))

    pairs = near_dup_pairs(union, key_col="key2", text_col=text_col,
                           num_hashes=num_hashes, bands=bands,
                           threshold=threshold, shingle_n=shingle_n,
                           verify=verify, pair_filter=cross_only)

    def decode(t: pa.Table) -> pa.Table:
        a = t.column("key_a").to_numpy()
        b = t.column("key_b").to_numpy()
        left_k = np.where(a & 1 == 0, a, b) >> 1
        right_k = np.where(a & 1 == 0, b, a) >> 1
        return pa.table({"key_left": pa.array(left_k.astype(np.int64)),
                         "key_right": pa.array(right_k.astype(np.int64)),
                         "jacc": t.column("jacc")})

    return pairs.map_batches(decode, batch_format="pyarrow")


def ngram_overlap_dups(ds, key_col: str = "doc_id",
                       text_col: str = "text", *, n: int = 8,
                       buckets: int | None = None):
    """Exact SUBSTRING-level dedup (the "exact substring" mode of
    training-data dedup, Lee et al. 2021, arXiv:2107.06499): a
    document is flagged when any of its word ``n``-grams already
    occurs in a document with a smaller key. The reference has no
    dedup at all (SURVEY.md §2.10); this is the contamination-grade
    complement to MinHash (whole-doc similarity) — it catches a
    single copied paragraph inside an otherwise novel document.

    Distributed shape (three bucket shuffles, no driver funnel):
      1. one vectorized map over the corpus emits the DISTINCT
         (key, fnv1a64(n-gram)) pairs of each document (a doc is one
         row, so per-batch dedup is globally exact);
      2. a hash(gram) bucket shuffle finds each gram's minimum owner
         key and emits (key, owner) only for keys ABOVE the owner —
         pre-filtering inside the bucket so only duplicated grams
         travel on;
      3. a hash(key) bucket shuffle folds per-document totals.

    Documents with < n tokens have no n-gram and are never flagged
    (mirrors the SQL twin's empty generate_series). Both the engine
    and the twin hash grams with the same FNV-1a, so even a hash
    collision (p ~ 2^-64) cannot cause a mismatch.

    Returns Dataset(key_col, n_dup_grams, first_owner):
    ``n_dup_grams`` = number of DISTINCT grams of this doc first seen
    in an earlier doc, ``first_owner`` = smallest such owner key.
    """
    from spapy_ray.stages.relational import bucketed_group_agg

    def grams(t: pa.Table) -> pa.Table:
        text = t.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        sh_all, starts, sh_counts, _ = _shingle_array(text, n)
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        total = int(sh_counts.sum())
        if total == 0:
            return pa.table({"key": pa.array([], pa.int64()),
                             "h": pa.array([], pa.int64())})
        h_all = fnv1a64(sh_all).view(np.int64)
        docrep = np.repeat(np.arange(len(keys)), sh_counts)
        seg0 = np.repeat(np.cumsum(sh_counts) - sh_counts, sh_counts)
        flat = starts[docrep] + (np.arange(total) - seg0)
        k = keys[docrep].astype(np.int64)
        h = h_all[flat]
        # distinct (key, h) within each doc (== globally: 1 doc/row)
        o = np.lexsort((h, k))
        k, h = k[o], h[o]
        keep = np.empty(total, dtype=bool)
        keep[0] = True
        keep[1:] = (k[1:] != k[:-1]) | (h[1:] != h[:-1])
        return pa.table({"key": pa.array(k[keep]),
                         "h": pa.array(h[keep])})

    def per_gram(g: pd.DataFrame) -> pd.DataFrame:
        h = g["h"].to_numpy()
        k = g["key"].to_numpy()
        o = np.lexsort((k, h))
        h, k = h[o], k[o]
        m = len(h)
        newrun = np.empty(m, dtype=bool)
        newrun[0] = True
        newrun[1:] = h[1:] != h[:-1]
        first_idx = np.maximum.accumulate(
            np.where(newrun, np.arange(m), 0))
        owner = k[first_idx]
        dup = k > owner
        return pd.DataFrame({"key": k[dup], "owner": owner[dup]})

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("key", sort=False).agg(
            n_dup_grams=("owner", "size"),
            first_owner=("owner", "min")).reset_index()
        return out.rename(columns={"key": key_col})

    pairs = bucketed_group_agg(
        ds.map_batches(grams, batch_format="pyarrow"), "h", per_gram,
        buckets=buckets)
    return bucketed_group_agg(pairs, "key", per_doc, buckets=buckets)


def decontam_audit(ds, key_col: str = "doc_id",
                   text_col: str = "text", *, n: int = 8,
                   eval_mod: int = 50,
                   buckets: int | None = None):
    """Benchmark decontamination audit (the Lee et al. 2021 /
    GPT-3-appendix n-gram decontam step): partition the corpus into
    an EVAL set (key % eval_mod == 0) and a TRAIN set, and flag every
    train document sharing any distinct word n-gram with any eval
    document. Same three-shuffle shape as ngram_overlap_dups — the
    per-gram bucket just tests eval-presence instead of min-owner.

    Returns Dataset(key_col, n_shared_grams) over CONTAMINATED train
    docs (the survivors are the complement — this table is what a
    pipeline quarantines and audits).
    """
    from spapy_ray.stages.relational import bucketed_group_agg

    def grams(t: pa.Table) -> pa.Table:
        text = t.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        sh_all, starts, sh_counts, _ = _shingle_array(text, n)
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        total = int(sh_counts.sum())
        if total == 0:
            return pa.table({"key": pa.array([], pa.int64()),
                             "h": pa.array([], pa.int64())})
        h_all = fnv1a64(sh_all).view(np.int64)
        docrep = np.repeat(np.arange(len(keys)), sh_counts)
        seg0 = np.repeat(np.cumsum(sh_counts) - sh_counts, sh_counts)
        flat = starts[docrep] + (np.arange(total) - seg0)
        k = keys[docrep].astype(np.int64)
        h = h_all[flat]
        o = np.lexsort((h, k))
        k, h = k[o], h[o]
        keep = np.empty(total, dtype=bool)
        keep[0] = True
        keep[1:] = (k[1:] != k[:-1]) | (h[1:] != h[:-1])
        return pa.table({"key": pa.array(k[keep]),
                         "h": pa.array(h[keep])})

    def per_gram(g: pd.DataFrame) -> pd.DataFrame:
        h = g["h"].to_numpy()
        k = g["key"].to_numpy()
        is_eval = (k % eval_mod) == 0
        # eval-present grams, vectorized per bucket
        eh = np.unique(h[is_eval])
        tr = ~is_eval
        pos = np.searchsorted(eh, h[tr])
        hit = np.zeros(tr.sum(), dtype=bool)
        if len(eh):
            pos2 = np.minimum(pos, len(eh) - 1)
            hit = eh[pos2] == h[tr]
        return pd.DataFrame({"key": k[tr][hit]})

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("key", sort=False).size() \
            .reset_index(name="n_shared_grams")
        out["n_shared_grams"] = out["n_shared_grams"] \
            .astype(np.int64)
        return out.rename(columns={"key": key_col})

    pairs = bucketed_group_agg(
        ds.map_batches(grams, batch_format="pyarrow"), "h", per_gram,
        buckets=buckets)
    return bucketed_group_agg(pairs, "key", per_doc, buckets=buckets)
