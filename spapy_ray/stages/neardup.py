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


def minhash_batch(batch: pa.Table, text_col: str = "text",
                  num_hashes: int = 16, shingle_n: int = 3) -> pa.Table:
    """Append sig0..sig{k-1} uint64 MinHash columns.

    sig_i(doc) = min over shingles s of fnv1a64(f"{i}|{s}") — the seed
    is a string prefix so the SQL twin is a plain string concat.
    """
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    shingles, starts, sh_counts, tok_counts = _shingle_array(text, shingle_n)
    ndocs = len(batch)
    out = batch
    # reduceat segments over the flat shingle array
    seg_starts = starts.astype(np.int64)
    seg_starts = np.minimum(seg_starts, max(len(shingles) - 1, 0))
    short = sh_counts == 0
    for i in range(num_hashes):
        prefix = f"{i}|"
        h_all = fnv1a64(pc.binary_join_element_wise(prefix, shingles, "")) \
            if len(shingles) else np.zeros(0, dtype=np.uint64)
        sig = np.full(ndocs, U64_MAX, dtype=np.uint64)
        for d in range(ndocs):          # segmented min (short python loop
            c = sh_counts[d]            # over docs; inner min vectorized)
            if c > 0:
                s = seg_starts[d]
                sig[d] = h_all[s:s + c].min()
        if short.any():
            sig[short] = fnv1a64(
                pc.binary_join_element_wise(
                    prefix, pc.take(text, pa.array(np.nonzero(short)[0])), ""))
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


def near_dup_pairs(ds, key_col: str, text_col: str = "text",
                   num_hashes: int = 16, bands: int = 4,
                   threshold: float = 0.8, shingle_n: int = 3):
    """MinHash-LSH candidate generation + exact-Jaccard verification.

    shingle → minhash (map) → band rows (flat map) →
    groupby(band, band_hash) → verified pairs (key_a < key_b, jacc).
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(ds, text_col, num_hashes, shingle_n)

    def band_rows(t: pa.Table) -> pa.Table:
        n = len(t)
        sig_mat = np.column_stack([t.column(f"sig{i}").to_numpy()
                                   for i in range(num_hashes)])
        out_band, out_hash, out_key, out_text = [], [], [], []
        keys = t.column(key_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        for b in range(bands):
            chunk = sig_mat[:, b * rows_per_band:(b + 1) * rows_per_band]
            # band hash: fnv over the band's signature bytes
            with np.errstate(over="ignore"):
                bh = np.full(n, np.uint64(0xCBF29CE484222325))
                for c in range(rows_per_band):
                    bh = (bh ^ chunk[:, c]) * np.uint64(0x100000001B3)
            out_band.append(np.full(n, b, dtype=np.int8))
            out_hash.append(bh.view(np.int64))
            out_key.extend(keys)
            out_text.extend(texts)
        return pa.table({
            "band": pa.array(np.concatenate(out_band)),
            "bhash": pa.array(np.concatenate(out_hash)),
            "key": pa.array(out_key),
            "text": pa.array(out_text),
        })

    banded = sigs.map_batches(band_rows, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"key_a": pd.Series([], dtype=object),
                                 "key_b": pd.Series([], dtype=object),
                                 "jacc": pd.Series([], dtype=float)})
        g = g.drop_duplicates("key").sort_values("key", kind="stable")
        keys = g["key"].tolist()
        texts = g["text"].tolist()
        ka, kb, jc = [], [], []
        for i in range(len(keys)):
            for j in range(i + 1, len(keys)):
                jv = jaccard(texts[i], texts[j], shingle_n)
                if jv >= threshold:
                    ka.append(keys[i])
                    kb.append(keys[j])
                    jc.append(jv)
        return pd.DataFrame({"key_a": ka, "key_b": kb, "jacc": jc})

    pairs = banded.groupby(["band", "bhash"]).map_groups(
        bucket_pairs, batch_format="pandas")

    # a pair can surface from several bands → dedup on (key_a, key_b)
    def dedup_pair(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return pairs.groupby(["key_a", "key_b"]).map_groups(
        dedup_pair, batch_format="pandas")


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
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int32)
    votes = 2 * bits - 1
    csum = np.vstack([np.zeros((1, 64), dtype=np.int64),
                      np.cumsum(votes, axis=0)])
    seg = csum[offsets[1:]] - csum[offsets[:-1]]
    sim = (seg > 0).astype(np.uint64) @ (np.uint64(1) << np.arange(64, dtype=np.uint64))
    return batch.append_column(out, pa.array(sim.astype(np.uint64)))


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
