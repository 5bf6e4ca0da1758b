"""Text query pipelines (split from queries.py; registry order lives in
pipelines/queries.py)."""

from spapy_ray.pipelines.qcommon import *  # noqa: F401,F403


def q_docs_token_stats(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return token_stats(ds).select_columns(
        ["doc_id", "n_tokens", "n_stop", "stop_ratio"])


def q_docs_dedup_text(sf_dir: str):
    return dedup_documents_by_text(_read(sf_dir, "documents",
                                         columns=["doc_id", "text"]))


def q_docs_lang_guess(sf_dir: str):
    from spapy_ray.stages.text import lang_guess_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(lang_guess_batch, batch_format="pyarrow") \
        .select_columns(["doc_id", "lang_guess"])


def q_minhash_sigs(sf_dir: str, num_hashes: int = 4):
    """MinHash signatures over documents (near-dup building block)."""
    from spapy_ray.stages.neardup import minhash_signatures

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    cols = ["doc_id"] + [f"sig{i}" for i in range(num_hashes)]
    return minhash_signatures(ds, num_hashes=num_hashes).select_columns(cols)


def q_simhash_docs(sf_dir: str):
    """64-bit SimHash per document (near-dup family): per-bit
    majority vote of token FNV hashes — deterministic, so the SQL
    twin recomputes the identical bits."""
    from spapy_ray.stages.neardup import simhash

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return simhash(ds).select_columns(["doc_id", "simhash"])


def q_near_dup_docs(sf_dir: str, threshold: float = 0.8):
    """MinHash-LSH near-duplicate pairs over documents, verified by
    exact 3-shingle Jaccard. The oracle computes ALL >= threshold
    pairs exactly; at 16 hashes / 8 bands the LSH miss probability
    for jaccard >= 0.8 pairs is < 1e-11, so the sets coincide."""
    from spapy_ray.stages.neardup import near_dup_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def keyed(t: pa.Table) -> pa.Table:
        return t.append_column("key", t.column("doc_id"))

    # verify="join" pins the corpus-scale co-partitioned double-join
    # verify (no driver key set, no broadcast dict) under the value
    # hash, same policy as the topo queries' merge="distributed"
    pairs = near_dup_pairs(ds.map_batches(keyed, batch_format="pyarrow"),
                           key_col="key", threshold=threshold,
                           verify="join")
    return pairs.select_columns(["key_a", "key_b", "jacc"])


def q_events_props(sf_dir: str):
    """Semi-structured extraction: integer field k from the events
    props JSON blob (vectorized regex), summed per event_type."""
    from ray.data.aggregate import Count, Sum

    from spapy_ray.stages.text import extract_json_int

    ds = _read(sf_dir, "events", columns=["event_type", "props"])
    out = extract_json_int(ds, "props", "k", "k") \
        .groupby("event_type").aggregate(
            Count(alias_name="n"), Sum("k", alias_name="sum_k")).to_pandas()
    out["sum_k"] = out["sum_k"].astype(np.int64)
    return out[["event_type", "n", "sum_k"]]


def q_docs_rolling_fp(sf_dir: str):
    """Winnowing-style rolling-hash fingerprint per document (min of
    all 8-byte Rabin-Karp window hashes; vectorized modular-prefix
    implementation). The SQL twin recomputes every window hash with
    HUGEINT arithmetic over the UTF-8 byte list."""
    from spapy_ray.stages.text import rolling_fingerprints

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return rolling_fingerprints(ds).select_columns(["doc_id", "rfp"])


def q_docs_quality(sf_dir: str):
    """Text-quality scoring over documents (training-data quality
    family): char/punct/digit counts + punct ratio, all vectorized
    Arrow RE2 — DuckDB runs RE2 too, so the class counts and the
    int/int double division match bit-exactly."""
    from spapy_ray.stages.text import quality_stats

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return quality_stats(ds).select_columns(
        ["doc_id", "n_chars", "n_punct", "n_digits", "punct_ratio"])


def q_quality_filter(sf_dir: str):
    """Percentile-based quality pruning — the canonical web-pipeline
    shape (global statistic → broadcast threshold → filter): keep
    documents whose length is at or above the corpus MEDIAN (exact
    distributed quantile_disc — the threshold is an actual data
    element, so the compare has no rounding slack) and whose
    punctuation ratio stays under a constant cap. The stats table is
    computed once, materialized narrow, and consumed by both the
    quantile and the filter."""
    from spapy_ray.stages.quantiles import global_quantile
    from spapy_ray.stages.text import quality_stats

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    stats = quality_stats(ds).select_columns(
        ["doc_id", "n_chars", "punct_ratio"]).materialize()
    thr = global_quantile(stats, "n_chars", [0.5])[0.5]

    def keep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t.column("n_chars"),
                                     pa.scalar(thr, pa.float64())),
                    pc.less_equal(t.column("punct_ratio"),
                                  pa.scalar(0.2, pa.float64())))
        return t.filter(m)

    return stats.map_batches(keep, batch_format="pyarrow")


def q_docs_bigrams(sf_dir: str, top: int = 50):
    """Top-50 corpus bigrams by (count desc, gram asc) — flat-buffer
    shifted-slice gram construction + combiner counts + bucketed fold
    (stages/text.ngram_counts)."""
    from spapy_ray.stages.text import ngram_counts

    ds = _read(sf_dir, "documents", columns=["text"])
    return ngram_counts(ds, n=2, top=top)


def q_domain_stats(sf_dir: str):
    """Per-domain corpus stats: host split from the url (ONE RE2 pass,
    stages/text.url_parse) → pages per host + distinct urls per host.
    Combiner shape: each batch collapses to its distinct (host, url)
    pairs with row multiplicities, so raw rows never shuffle."""
    from spapy_ray.stages.relational import bucketed_group_agg
    from spapy_ray.stages.text import url_parse_batch

    ds = pages_dataset(sf_dir, include_html=False)

    def partial(t: pa.Table) -> pa.Table:
        vc = t.column("url").value_counts()
        urls = pa.table({"url": vc.field("values"),
                         "_c": pc.cast(vc.field("counts"), pa.int64())})
        return url_parse_batch(urls).select(["host", "url", "_c"])

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("host", sort=False)
        out = g.agg(n_pages=("_c", "sum"), n_urls=("url", "nunique")) \
            .reset_index()
        out["n_pages"] = out["n_pages"].astype(np.int64)
        out["n_urls"] = out["n_urls"].astype(np.int64)
        return out

    return bucketed_group_agg(ds.map_batches(partial,
                                             batch_format="pyarrow"),
                              "host", fold)


def q_bpe_tokens(sf_dir: str):
    """BPE-ish pretoken counts per page (stages/text.BPE_PATTERN) —
    the brief's 'token counting (whitespace + a BPE-ish regex)';
    whitespace counting is docs_token_stats."""
    from spapy_ray.stages.text import bpe_token_count_batch

    ds = pages_dataset(sf_dir, include_html=False)
    return ds.map_batches(
        lambda t: bpe_token_count_batch(t).select(
            ["url", "warc_ts", "n_bpe"]),
        batch_format="pyarrow")


def q_docs_repetition(sf_dir: str):
    """Gopher-style repetition quality signals per document
    (stages/text.repetition_stats_batch): top-token fraction and
    distinct-token ratio, one dictionary-encode + one lexsort per
    batch."""
    from spapy_ray.stages.text import repetition_stats_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: repetition_stats_batch(t).select(
            ["doc_id", "top_tok_frac", "distinct_ratio"]),
        batch_format="pyarrow")


def q_hh_domains(sf_dir: str):
    """Heavy hitters (Misra-Gries mergeable sketch) over page hosts,
    pinned in its EXACTNESS regime (capacity 4096 >> 1000 distinct
    hosts, so no truncation ever fires and the sketch counts equal the
    exact groupby — the oracle). Rows shuffled: O(blocks x capacity),
    never one per page. The approximate regime's guarantee
    (freq > n/(capacity+1) survives; undercount <= n/(capacity+1)) is
    pinned by pytest on a zipf corpus."""
    from spapy_ray.stages.relational import heavy_hitters
    from spapy_ray.stages.text import url_parse_batch

    ds = pages_dataset(sf_dir, include_html=False)

    def hosts(t: pa.Table) -> pa.Table:
        return url_parse_batch(t.select(["url"])).select(["host"])

    return heavy_hitters(ds.map_batches(hosts, batch_format="pyarrow"),
                         "host", capacity=4096)


def q_contamination_pairs(sf_dir: str, threshold: float = 0.8):
    """Train/eval contamination check: near-dup pairs ACROSS the
    even-doc_id corpus ("train") and odd-doc_id corpus ("eval") —
    one banded LSH pass over the tagged union, candidates filtered
    to cross-side before text verification
    (neardup.cross_corpus_near_dup). Oracle: exact all-pairs cross
    Jaccard."""
    from spapy_ray.stages.neardup import cross_corpus_near_dup

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def side(par: int):
        def _f(t: pa.Table) -> pa.Table:
            keep = pc.equal(
                pc.bit_wise_and(t.column("doc_id"), pa.scalar(1, pa.int64())),
                pa.scalar(par, pa.int64()))
            return t.filter(keep)
        return _f

    train = docs.map_batches(side(0), batch_format="pyarrow")
    evals = docs.map_batches(side(1), batch_format="pyarrow")
    return cross_corpus_near_dup(train, evals, key_col="doc_id",
                                 threshold=threshold, verify="join")


def q_docs_pii_scrub(sf_dir: str):
    """PII redaction (C4/CCNet-style cleaning): emails, IPv4 literals
    and phone-like numbers replaced with fixed tags — one RE2 pass per
    class per batch (text.pii_scrub). Both engines run RE2, so the
    scrubbed text is byte-identical to the regexp_replace twin.
    Returns (doc_id, text)."""
    from spapy_ray.stages.text import pii_scrub

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return pii_scrub(ds)


def q_domain_caps(sf_dir: str, k: int = 5):
    """Hot-domain downsampling: keep at most 5 pages per host, chosen
    by deterministic fnv1a(url) order (RNG-free, reproducible across
    runs/partitionings — the hash_sample philosophy applied per
    group). grouped_topk combiner: at most k x hosts-seen rows leave
    each block."""
    from spapy_ray.kernels.hashing import fnv1a64
    from spapy_ray.stages.relational import grouped_topk
    from spapy_ray.stages.text import url_parse_batch

    ds = pages_dataset(sf_dir, include_html=False)

    def prep(t: pa.Table) -> pa.Table:
        t = url_parse_batch(t.select(["url"]))
        return pa.table({"host": t.column("host"),
                         "url": t.column("url"),
                         "hv": pa.array(fnv1a64(t.column("url")))})

    capped = grouped_topk(ds.map_batches(prep, batch_format="pyarrow"),
                          key="host", order_col="hv", k=k,
                          descending=False, tie_cols=["url"])
    return capped.select_columns(["host", "url", "rank"])


def q_jaccard_pairs(sf_dir: str):
    """Exact n-gram (3-token-shingle) Jaccard for an explicit
    candidate pair list — adjacent doc_ids here, standing in for any
    externally supplied blocking key. The texts attach through ONE
    co-partitioned payload shuffle (no broadcast, no driver key set);
    jacc = |A∩B| / |A∪B| over distinct shingle sets is an exact
    rational, bit-identical to the SQL twin."""
    from spapy_ray.stages.neardup import pairwise_jaccard

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def cand(t: pa.Table) -> pa.Table:
        return pa.table({"key_a": t.column("doc_id"),
                         "key_b": pc.add(t.column("doc_id"), 1)})

    # the last doc's (n-1, n) pair drops in BOTH paths: the engine's
    # payload co-partition is inner on key existence, the oracle
    # joins documents to itself on doc_id + 1
    pairs = pairwise_jaccard(ds, ds.map_batches(cand,
                                                batch_format="pyarrow"),
                             key_col="doc_id")
    return pairs.select_columns(["key_a", "key_b", "jacc"])


def q_ngram_overlap(sf_dir: str):
    """Substring-level exact dedup (Lee et al. exact-substring mode):
    documents sharing any word 8-gram with a smaller doc_id, with the
    count of duplicated distinct grams and the earliest owner. Three
    bucket shuffles, no driver key set (stages/neardup.py)."""
    from spapy_ray.stages.neardup import ngram_overlap_dups

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ngram_overlap_dups(ds, key_col="doc_id", text_col="text",
                              n=8)


def q_tfidf_terms(sf_dir: str):
    """Top-10 terms per language by integer-quantized tf-idf: one
    corpus pass emits tf and df partials together, one term-bucket
    shuffle finalizes both, grouped_topk picks the winners
    (stages/text.tfidf_top_terms)."""
    from spapy_ray.stages.text import tfidf_top_terms

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    n_docs = ds.count()  # parquet metadata, no data pass
    return tfidf_top_terms(ds, n_docs, group_col="lang", k=10)


def q_docs_surprisal(sf_dir: str):
    """Unigram-LM surprisal quality score per document (integer-exact
    perplexity-filter stand-in): one token-count fold, sorted-vocab
    broadcast, pure scoring map (stages/text.unigram_surprisal)."""
    from spapy_ray.stages.text import unigram_surprisal

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return unigram_surprisal(ds)


def q_bigram_pmi(sf_dir: str, k: int = 50):
    """Top-50 collocations by quantized PMI lift over the documents
    corpus (combiner-folded bigram + unigram counts, sorted-vocab
    broadcast, deterministic sort+limit — stages/text.bigram_pmi)."""
    from spapy_ray.stages.text import bigram_pmi

    ds = _read(sf_dir, "documents", columns=["text"])
    return bigram_pmi(ds, k=k, min_count=5)


def q_table_checksum(sf_dir: str):
    """Bucketed XOR fingerprint of the documents table keyed by
    (doc_id, text) — the anti-entropy primitive for replica diff /
    corruption localization (relational.xor_fingerprint)."""
    from spapy_ray.stages.relational import xor_fingerprint

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def rowstr(t: pa.Table) -> pa.Table:
        s = pc.binary_join_element_wise(
            pc.cast(t.column("doc_id"), pa.string()),
            t.column("text"), ":")
        return pa.table({"row": s})

    return xor_fingerprint(
        docs.map_batches(rowstr, batch_format="pyarrow"), "row")


def q_fuzzy_names(sf_dir: str):
    """Entity-resolution primitive: customer-name pairs at edit
    distance exactly 1 (one-digit typos) via distributed SymSpell —
    deletion-variant shuffle + vectorized verify
    (text.fuzzy_vocab_pairs). The oracle twin is a quadratic
    levenshtein self-join; the engine never compares beyond
    shared-variant candidates."""
    from spapy_ray.stages.text import fuzzy_vocab_pairs

    cust = _read(sf_dir, "customer", columns=["c_name"])
    out = fuzzy_vocab_pairs(cust, column="c_name").to_pandas()
    return out.sort_values(["w1", "w2"]).reset_index(drop=True)


def q_source_mode_lang(sf_dir: str):
    """Grouped mode with deterministic ties: per document source the
    most frequent lang (count desc, lang asc). Combiner-folded
    (source, lang) counts; the argmax runs on the tiny folded
    table."""
    from spapy_ray.stages.relational import pre_aggregated_sums

    docs = _read(sf_dir, "documents", columns=["source", "lang"])

    def one(t: pa.Table) -> pa.Table:
        return t.append_column(
            "one", pa.array(np.ones(t.num_rows, dtype=np.int64)))

    counts = pre_aggregated_sums(
        docs.map_batches(one, batch_format="pyarrow"),
        ["source", "lang"], ["one"], count_alias="n").to_pandas()
    counts = counts.sort_values(["source", "n", "lang"],
                                ascending=[True, False, True],
                                kind="mergesort")
    out = counts.groupby("source", sort=True).head(1) \
        .reset_index(drop=True)
    out["n"] = out["n"].astype(np.int64)
    return out[["source", "lang", "n"]]


def q_jsonl_roundtrip(sf_dir: str):
    """JSONL ingest path (the LLM-corpus interchange format):
    documents -> partitioned JSONL under /tmp -> ray.data.read_json
    -> bucketed XOR fingerprint. Hash-equality with the parquet-side
    SQL twin proves the round-trip is byte-lossless; the write is
    partitioned (one file per block) so a resumable run can skip
    finished shards."""
    import shutil
    import tempfile

    import ray.data

    from spapy_ray.stages.relational import xor_fingerprint

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    tmp = tempfile.mkdtemp(prefix="spapy_jsonl_")
    try:
        docs.write_json(tmp)
        back = ray.data.read_json(tmp)

        def rowstr(t: pa.Table) -> pa.Table:
            s = pc.binary_join_element_wise(
                pc.cast(t.column("doc_id"), pa.string()),
                t.column("text"), ":")
            return pa.table({"row": s})

        return xor_fingerprint(
            back.map_batches(rowstr, batch_format="pyarrow"),
            "row").to_pandas().sort_values("bucket") \
            .reset_index(drop=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_snapshot_diff(sf_dir: str):
    """CDC change detection between two document snapshots
    (relational.snapshot_diff). Snapshot B is derived
    deterministically: doc_id % 13 == 0 rows removed,
    doc_id % 7 == 0 texts edited, doc_id % 11 == 0 rows re-added
    under key + 10^9; the SQL twin rebuilds the same B. Output:
    per-status key counts."""
    from ray.data.aggregate import Count

    from spapy_ray.kernels.hashing import fnv1a64
    from spapy_ray.stages.relational import snapshot_diff

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fpa(t: pa.Table) -> pa.Table:
        h = fnv1a64(t.column("text")).view(np.int64)
        return pa.table({"doc_id": t.column("doc_id"),
                         "fp": pa.array(h)})

    def fpb(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        txt = t.column("text")
        edited = pc.binary_join_element_wise(
            txt, pa.scalar("X"), "")
        use_edit = pa.array(did % 7 == 0)
        newtxt = pc.if_else(use_edit, edited, txt)
        keep = did % 13 != 0
        base = pa.table({"doc_id": t.column("doc_id"),
                         "text": newtxt}).filter(pa.array(keep))
        extra_m = did % 11 == 0
        extra = pa.table({
            "doc_id": pa.array(did[extra_m] + 1_000_000_000),
            "text": txt.filter(pa.array(extra_m))})
        out = pa.concat_tables([base, extra])
        h = fnv1a64(out.column("text")).view(np.int64)
        return pa.table({"doc_id": out.column("doc_id"),
                         "fp": pa.array(h)})

    a = docs.map_batches(fpa, batch_format="pyarrow")
    b = docs.map_batches(fpb, batch_format="pyarrow")
    out = snapshot_diff(a, b, "doc_id", "fp") \
        .groupby("status").aggregate(Count(alias_name="n_keys")) \
        .to_pandas()
    out["n_keys"] = out["n_keys"].astype(np.int64)
    return out.sort_values("status").reset_index(drop=True)


def q_csv_roundtrip(sf_dir: str):
    """CSV ingest/export path: documents -> partitioned CSV under
    /tmp (quoted text survives embedded delimiters) -> read_csv ->
    XOR fingerprint; hash-equality with the parquet-side twin proves
    the transport lossless."""
    import shutil
    import tempfile

    import ray.data

    from spapy_ray.stages.relational import xor_fingerprint

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    tmp = tempfile.mkdtemp(prefix="spapy_csv_")
    try:
        docs.write_csv(tmp)
        back = ray.data.read_csv(tmp)

        def rowstr(t: pa.Table) -> pa.Table:
            s = pc.binary_join_element_wise(
                pc.cast(t.column("doc_id"), pa.string()),
                t.column("text"), ":")
            return pa.table({"row": s})

        return xor_fingerprint(
            back.map_batches(rowstr, batch_format="pyarrow"),
            "row").to_pandas().sort_values("bucket") \
            .reset_index(drop=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_hive_partition_roundtrip(sf_dir: str):
    """Hive-partitioned output layout: documents written
    partition_cols=['lang'] (one directory per language — the
    resumable / prunable layout), read back with a partition-pruned
    read of two languages, per-lang counts + text-hash XOR so the
    pruned read is value-checked."""
    import shutil
    import tempfile

    import ray.data
    from ray.data.datasource.partitioning import (Partitioning,
                                                  PathPartitionFilter)

    from spapy_ray.kernels.hashing import fnv1a64

    docs = _read(sf_dir, "documents",
                 columns=["doc_id", "text", "lang"])
    tmp = tempfile.mkdtemp(prefix="spapy_hive_")
    try:
        docs.write_parquet(tmp, partition_cols=["lang"])
        pf = PathPartitionFilter.of(
            lambda kv: kv.get("lang") in ("en", "de"),
            style="hive", base_dir=tmp)
        back = ray.data.read_parquet(
            tmp, partitioning=Partitioning("hive", base_dir=tmp),
            partition_filter=pf)

        def fold(t: pa.Table) -> pa.Table:
            h = fnv1a64(t.column("text")).view(np.int64)
            df = pd.DataFrame({
                "lang": t.column("lang").to_pandas(),
                "h": h})
            g = df.groupby("lang", sort=False)["h"].agg(
                n="size",
                fp=lambda x: np.bitwise_xor.reduce(
                    x.to_numpy().view(np.uint64)).view(np.int64)
                if len(x) else np.int64(0)).reset_index()
            g["n"] = g["n"].astype(np.int64)
            g["fp"] = g["fp"].astype(np.int64)
            return pa.Table.from_pandas(g, preserve_index=False)

        def final(g: pd.DataFrame) -> pd.DataFrame:
            out = []
            for k, gg in g.groupby("lang", sort=False):
                x = np.bitwise_xor.reduce(
                    gg["fp"].to_numpy().view(np.uint64))
                out.append((k, int(gg["n"].sum()),
                            int(np.int64(x.astype(np.int64)))))
            return pd.DataFrame(out, columns=["lang", "n", "fp"]) \
                .astype({"n": np.int64, "fp": np.int64})

        from spapy_ray.stages.relational import bucketed_group_agg

        out = bucketed_group_agg(
            back.map_batches(fold, batch_format="pyarrow"), "lang",
            final).to_pandas()
        return out.sort_values("lang").reset_index(drop=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_text_freq_of_freqs(sf_dir: str):
    """Frequency-of-frequencies over document texts (the Good-Turing
    smoothing input / duplicate-multiplicity distribution): bucketed
    per-text counts (blocks ship local uniques), then a tiny second
    fold over the counts."""
    from ray.data.aggregate import Sum

    from spapy_ray.stages.relational import bucketed_group_agg

    docs = _read(sf_dir, "documents", columns=["text"])

    def pre(t: pa.Table) -> pa.Table:
        # block-local collapse: ship (text, local count) partials
        df = t.to_pandas().groupby("text", sort=False).size() \
            .reset_index(name="c")
        df["c"] = df["c"].astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def fold2(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("text", sort=False)["c"].sum().to_numpy()
        u, n = np.unique(c, return_counts=True)
        return pd.DataFrame({
            "multiplicity": u.astype(np.int64),
            "n_texts": n.astype(np.int64)})

    parts = bucketed_group_agg(
        docs.map_batches(pre, batch_format="pyarrow"), "text", fold2)
    out = parts.groupby("multiplicity").aggregate(
        Sum("n_texts", alias_name="n_texts")).to_pandas()
    out["n_texts"] = out["n_texts"].astype(np.int64)
    return out.sort_values("multiplicity").reset_index(drop=True)


def q_seq_packing(sf_dir: str, chunk_tokens: int = 2048):
    """LLM sequence packing (concat-and-chunk) over documents in
    doc_id order: distributed ordered prefix sum of token counts →
    per-chunk doc/start counts + layout checksum. Token convention =
    literal-space split (len(string_split(text,' ')) in the twin)."""
    from spapy_ray.stages.packing import pack_chunks

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def tok(t: pa.Table) -> pa.Table:
        n = pc.add(pc.count_substring(t.column("text"), " "),
                   pa.scalar(1))
        return pa.table({"doc_id": t.column("doc_id"),
                         "tok": pc.cast(n, pa.int64())})

    return pack_chunks(docs.map_batches(tok, batch_format="pyarrow"),
                       id_col="doc_id", weight_col="tok",
                       chunk_size=chunk_tokens)


def q_vocab_ids(sf_dir: str, v: int = 200):
    """Vocabulary building (the tokenizer-training step of an LLM
    corpus pipeline): global token counts via per-batch partials,
    then distributed top-V by (count desc, token asc) and
    rank-contiguous ids. Only the V-row head ever reaches the
    driver."""
    from ray.data.aggregate import Sum

    docs = _read(sf_dir, "documents", columns=["text"])

    def counts(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(
            pc.split_pattern(t.column("text"), " "))
        vc = pd.Series(flat.to_pandas()).value_counts()
        return pa.table({
            "token": pa.array(vc.index.astype(str)),
            "cnt": pa.array(vc.to_numpy().astype(np.int64))})

    top = docs.map_batches(counts, batch_format="pyarrow") \
        .groupby("token").aggregate(Sum("cnt", alias_name="cnt")) \
        .sort(["cnt", "token"], descending=[True, False]) \
        .limit(v).to_pandas()
    top["cnt"] = top["cnt"].astype(np.int64)
    top["tok_id"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top


def q_docs_stop_strip(sf_dir: str):
    """Stopword-stripped text fingerprints per document (vectorized
    list rebuild; see stages.text.stopword_strip_fp)."""
    from spapy_ray.stages.text import STOPWORDS, stopword_strip_fp

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return stopword_strip_fp(docs, stopwords=STOPWORDS)


def q_domain_cm(sf_dir: str):
    """Count-Min sketch frequency estimates for every page host
    (relational.count_min): mergeable (depth x width) partials, one
    scan, exact-including-collisions vs the SQL twin."""
    from spapy_ray.stages.relational import count_min
    from spapy_ray.stages.text import url_parse_batch

    ds = pages_dataset(sf_dir, include_html=False)
    hosts = ds.map_batches(
        lambda t: url_parse_batch(t.select(["url"])).select(["host"]),
        batch_format="pyarrow")
    return count_min(hosts, "host")


def q_docs_merge(sf_dir: str):
    """CDC merge apply (Delta/Hudi-style upsert + delete semantics):
    a deterministic changeset (updates v2, deletes, later v3
    updates that resurrect deleted keys, inserts under new keys) is
    applied to the documents snapshot as keep-latest-per-key over
    the versioned union (grouped_topk k=1) minus deletes — ONE
    bucket shuffle. Output: per-lang row count + XOR text
    fingerprint of the merged table (any wrong/missing/stale row
    breaks the hash)."""
    from spapy_ray.kernels.hashing import fnv1a64
    from spapy_ray.stages.relational import (bucketed_group_agg,
                                             grouped_topk)

    docs = _read(sf_dir, "documents",
                 columns=["doc_id", "text", "lang"])

    def with_changes(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        txt = t.column("text")
        lang = t.column("lang")

        def sub(mask, id_off, text_arr, ver, op):
            m = pa.array(mask)
            return pa.table({
                "doc_id": pc.add(pc.filter(t.column("doc_id"), m),
                                 pa.scalar(id_off, type=pa.int64())),
                "text": pc.filter(text_arr, m),
                "lang": pc.filter(lang, m),
                "ver": pa.array(np.full(int(mask.sum()), ver,
                                        dtype=np.int64)),
                "op": pa.array([op] * int(mask.sum()))})

        base = pa.table({
            "doc_id": t.column("doc_id"), "text": txt, "lang": lang,
            "ver": pa.array(np.zeros(len(t), dtype=np.int64)),
            "op": pa.array(["U"] * len(t))})
        v2 = pc.binary_join_element_wise(
            txt, pa.scalar(" v2", type=pa.string()), "")
        v3 = pc.binary_join_element_wise(
            txt, pa.scalar(" v3", type=pa.string()), "")
        newt = pc.binary_join_element_wise(
            pa.scalar("new doc ", type=pa.string()),
            pc.cast(t.column("doc_id"), pa.string()), "")
        empty = pa.array([""] * len(t), type=pa.string())
        return pa.concat_tables([
            base,
            sub(ids % 3 == 0, 0, v2, 1, "U"),
            sub(ids % 7 == 0, 0, empty, 2, "D"),
            sub(ids % 9 == 0, 0, v3, 3, "U"),
            sub(ids % 11 == 0, 10 ** 9, newt, 1, "U")])

    u = docs.map_batches(with_changes, batch_format="pyarrow")
    last = grouped_topk(u, "doc_id", "ver", 1)

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.equal(t.column("op"), "U")
        t = t.filter(keep)
        s = pc.binary_join_element_wise(
            pc.cast(t.column("doc_id"), pa.string()),
            t.column("text"), ":")
        f = fnv1a64(s).view(np.int64)
        df = pd.DataFrame({"lang": t.column("lang").to_pandas(),
                           "f": f})
        g = df.groupby("lang", sort=False).agg(
            n_docs=("f", "size"),
            fp=("f", lambda x: int(np.bitwise_xor.reduce(
                x.to_numpy())))).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("lang", sort=False).agg(
            n_docs=("n_docs", "sum"),
            fp=("fp", lambda x: int(np.bitwise_xor.reduce(
                x.to_numpy())))).reset_index()
        out["n_docs"] = out["n_docs"].astype(np.int64)
        out["fp"] = out["fp"].astype(np.int64)
        return out

    return bucketed_group_agg(
        last.map_batches(partial, batch_format="pyarrow"), "lang",
        fold)


def q_corpus_overlap(sf_dir: str, q: int = 10 ** 6):
    """Histogram intersection between the EN and ES token
    distributions — the exact corpus-similarity measure (overlap =
    sum min(p_en, p_es)) with no floats: scale both sides by the
    other's total, overlap_q = trunc(q * sum min(ca*nb, cb*na) /
    (na*nb)). One combiner shuffle for (token, side) counts; side
    totals ride the same fold."""
    from ray.data.aggregate import Sum

    from spapy_ray.stages.relational import bucketed_group_agg

    docs = _read(sf_dir, "documents", columns=["text", "lang"])

    def counts(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t.column("lang"),
                        value_set=pa.array(["en", "es"]))
        t = t.filter(keep)
        toks = pc.split_pattern(t.column("text"), " ")
        flat = pc.list_flatten(toks)
        nper = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        side = (t.column("lang").to_pandas() == "es") \
            .to_numpy().astype(np.int8)
        sides = np.repeat(side, nper)
        df = pd.DataFrame({"token": flat.to_pandas(), "s": sides})
        g = df.groupby(["token", "s"], sort=False).size() \
            .reset_index(name="c")
        g["c"] = g["c"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    cnts = docs.map_batches(counts, batch_format="pyarrow") \
        .groupby(["token", "s"]).aggregate(Sum("c", alias_name="c")) \
        .materialize()

    tot = cnts.groupby("s").aggregate(Sum("c", alias_name="n")) \
        .to_pandas().set_index("s")["n"]
    na = int(tot.get(0, 0))
    nb = int(tot.get(1, 0))

    def per_token(g: pd.DataFrame) -> pd.DataFrame:
        p = g.pivot_table(index="token", columns="s", values="c",
                          fill_value=0, aggfunc="sum")
        ca = p[0].to_numpy(np.int64) if 0 in p else \
            np.zeros(len(p), np.int64)
        cb = p[1].to_numpy(np.int64) if 1 in p else \
            np.zeros(len(p), np.int64)
        m = np.minimum(ca * nb, cb * na)
        return pd.DataFrame({"m": [int(m.sum())]})

    parts = bucketed_group_agg(cnts, "token", per_token).to_pandas()
    inter = int(parts["m"].sum()) if len(parts) else 0
    den = na * nb
    oq = 0 if den == 0 else (q * inter) // den
    return pd.DataFrame({"na": [na], "nb": [nb],
                         "inter_num": [inter],
                         "overlap_q": [oq]}).astype(np.int64)


def q_docs_shuffle_order(sf_dir: str, seed: str = "epoch1"):
    """Deterministic, verifiable training-epoch shuffle: every doc's
    position under ORDER BY fnv(seed:doc_id) — an exact distributed
    global sort via hash-top-bit range partitioning
    (quantiles.global_rank_attach); reproducible from the seed
    alone, no RNG state."""
    from spapy_ray.kernels.hashing import fnv1a64
    from spapy_ray.stages.quantiles import global_rank_attach

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def h(t: pa.Table) -> pa.Table:
        s = pc.binary_join_element_wise(
            pa.scalar(seed + ":", type=pa.string()),
            pc.cast(t.column("doc_id"), pa.string()), "")
        return pa.table({"doc_id": t.column("doc_id"),
                         "h": pa.array(fnv1a64(s).view(np.int64))})

    out = global_rank_attach(
        docs.map_batches(h, batch_format="pyarrow"), "h", "doc_id")

    def named(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("id"),
                         "pos": pc.cast(t.column("pos"), pa.int64())})

    return out.map_batches(named, batch_format="pyarrow")


def q_k_anonymity(sf_dir: str, k: int = 5):
    """k-anonymity audit over the (lang, source) quasi-identifier:
    equivalence-class sizes from one combiner shuffle; reports the
    smallest class, class count, and rows living in classes below
    k — the privacy gate of a release pipeline."""
    from spapy_ray.stages.relational import pre_aggregated_sums

    docs = _read(sf_dir, "documents", columns=["lang", "source"])

    def one(t: pa.Table) -> pa.Table:
        return t.append_column(
            "one", pa.array(np.ones(len(t), dtype=np.int64)))

    cls = pre_aggregated_sums(
        docs.map_batches(one, batch_format="pyarrow"),
        ["lang", "source"], ["one"], count_alias="c").to_pandas()
    sizes = cls["one"].to_numpy().astype(np.int64)
    return pd.DataFrame({
        "k_threshold": [k],
        "n_classes": [len(sizes)],
        "min_class": [int(sizes.min()) if len(sizes) else 0],
        "n_rows_below_k": [int(sizes[sizes < k].sum())]}) \
        .astype(np.int64)


def q_lang_confusion(sf_dir: str):
    """Language-ID evaluation: confusion matrix of the declared lang
    vs the n-gram classifier's guess (the model-eval workflow over
    the corpus — one combiner shuffle of (truth, guess) counts)."""
    from spapy_ray.stages.relational import pre_aggregated_sums
    from spapy_ray.stages.text import lang_guess_batch

    docs = _read(sf_dir, "documents", columns=["doc_id", "text",
                                               "lang"])
    guessed = docs.map_batches(lang_guess_batch,
                               batch_format="pyarrow")

    def one(t: pa.Table) -> pa.Table:
        return pa.table({
            "lang": t.column("lang"),
            "lang_guess": t.column("lang_guess"),
            "one": pa.array(np.ones(len(t), dtype=np.int64))})

    out = pre_aggregated_sums(
        guessed.map_batches(one, batch_format="pyarrow"),
        ["lang", "lang_guess"], ["one"], count_alias="c") \
        .to_pandas()[["lang", "lang_guess", "one"]] \
        .rename(columns={"one": "n"})
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(["lang", "lang_guess"]) \
        .reset_index(drop=True)


def q_trending_domains(sf_dir: str, k: int = 3):
    """Trending hosts: top-k domains per crawl day by page count —
    per-(day, host) combiner counts, then grouped_topk per day
    (never a global sort)."""
    from ray.data.aggregate import Sum

    from spapy_ray.stages.relational import grouped_topk
    from spapy_ray.stages.text import url_parse_batch

    ds = pages_dataset(sf_dir, include_html=False)

    def pre(t: pa.Table) -> pa.Table:
        day = pc.cast(t.column("warc_ts"), pa.int64()).to_numpy() \
            // 86_400_000_000
        h = url_parse_batch(t.select(["url"])).column("host")
        df = pd.DataFrame({"day": day, "host": h.to_pandas()})
        g = df.groupby(["day", "host"], sort=False).size() \
            .reset_index(name="c")
        g["c"] = g["c"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = ds.map_batches(pre, batch_format="pyarrow") \
        .groupby(["day", "host"]).aggregate(Sum("c", alias_name="n"))

    top = grouped_topk(counts, "day", "n", k,
                       tie_cols=["host"]).to_pandas()
    out = top[["day", "host", "n", "rank"]].copy()
    for c in ("day", "n", "rank"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["day", "rank"]).reset_index(drop=True)


def q_docs_winnow(sf_dir: str):
    """MOSS winnowing fingerprints per document (8-byte Rabin-Karp
    hashes, winnow window 16): distinct selected-minima set size +
    XOR fold — the plagiarism/overlap detection primitive
    (text.winnow_fingerprints, one vectorized pass, global sliding
    min shared across the batch)."""
    from spapy_ray.stages.text import winnow_fingerprints

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return winnow_fingerprints(ds) \
        .select_columns(["doc_id", "n_fp", "fp_hi", "fp_lo"])


def q_decontam_audit(sf_dir: str):
    """Benchmark decontamination: train docs (doc_id % 50 != 0)
    sharing any word 8-gram with the eval split (doc_id % 50 == 0),
    with shared-distinct-gram counts — the quarantine table of the
    n-gram decontam step (stages/neardup.decontam_audit)."""
    from spapy_ray.stages.neardup import decontam_audit

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return decontam_audit(ds, key_col="doc_id", text_col="text",
                          n=8, eval_mod=50)


def q_docs_cosine_pairs(sf_dir: str):
    """Top-50 most similar document pairs by sparse term-count dot
    product over an inverted index (stages/text.cosine_pair_scores):
    rare-term posting lists (2 <= df <= 20) emit weighted pairs, a
    pair-bucket groupby folds them — never an all-pairs matrix."""
    from spapy_ray.stages.text import cosine_pair_scores

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return cosine_pair_scores(ds, df_cap=20, k=50)


def q_docs_readability(sf_dir: str):
    """Integer Flesch-style readability per document: words, sentence
    runs, vowel-group 'syllables' — three vectorized RE2 counts
    (pc.count_substring_regex) and the quantized score 206835 -
    1015000*w//s - 84600*y//w, exact int64 (all terms positive)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        w = pc.count_substring_regex(txt, "[A-Za-z]+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        s = pc.count_substring_regex(txt, "[.!?]+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        y = pc.count_substring_regex(txt, "[aeiouyAEIOUY]+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        s1 = np.maximum(s, 1)
        w1 = np.maximum(w, 1)
        f = 206835 - (1015000 * w) // s1 - (84600 * y) // w1
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_words": pa.array(w), "n_sentences": pa.array(s),
            "n_syllables": pa.array(y),
            "flesch_x1000": pa.array(f),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def q_corpus_prep(sf_dir: str, chunk_tokens: int = 2048):
    """END-TO-END training-corpus preparation — the composite
    web-pipeline flagship: quality gate (length >= corpus median,
    punct ratio <= 0.2) -> exact text dedup (keep lowest doc_id per
    text hash) -> LLM sequence packing of the survivors. One stats
    pass fixes the broadcast threshold, one corpus pass filters +
    hashes + token-counts, one bucketed groupby picks dedup winners,
    and pack_chunks lays out the chunks — every stage the same code
    the standalone queries pin, chained."""
    from spapy_ray.kernels.hashing import fnv1a64
    from spapy_ray.stages.packing import pack_chunks
    from spapy_ray.stages.quantiles import global_quantile
    from spapy_ray.stages.relational import bucketed_group_agg
    from spapy_ray.stages.text import quality_stats, quality_stats_batch

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    stats = quality_stats(docs).select_columns(
        ["doc_id", "n_chars", "punct_ratio"]).materialize()
    thr = global_quantile(stats, "n_chars", [0.5])[0.5]

    def survivors(t: pa.Table) -> pa.Table:
        t = quality_stats_batch(t)
        m = pc.and_(pc.greater_equal(t.column("n_chars"),
                                     pa.scalar(thr, pa.float64())),
                    pc.less_equal(t.column("punct_ratio"),
                                  pa.scalar(0.2, pa.float64())))
        t = t.filter(m)
        text = t.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        h = fnv1a64(text).view(np.int64)
        tok = pc.cast(pc.add(pc.count_substring(text, " "),
                             pa.scalar(1)), pa.int64())
        return pa.table({"h": pa.array(h),
                         "doc_id": pc.cast(t.column("doc_id"),
                                           pa.int64()),
                         "tok": tok})

    surv = docs.map_batches(survivors, batch_format="pyarrow")

    def local(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["h", "doc_id"], kind="mergesort")
        return df.groupby("h", sort=False, as_index=False) \
            .first()[["doc_id", "tok"]]

    winners = bucketed_group_agg(surv, "h", local)
    return pack_chunks(winners, id_col="doc_id", weight_col="tok",
                       chunk_size=chunk_tokens)


def q_bpe_merges(sf_dir: str, rounds: int = 8):
    """Byte-level BPE merge-table training over the document corpus
    (stages/text.bpe_train_merges): ONE corpus pass folds the word
    dictionary, then 8 merge rounds run over the compact word table
    with bounded pair-count shuffles. The SQL twin reproduces every
    round exactly via a fixed-width-hex token-string rendering where
    replace() IS the leftmost-non-overlapping BPE merge."""
    from spapy_ray.stages.text import bpe_train_merges

    docs = _read(sf_dir, "documents", columns=["text"])
    return bpe_train_merges(docs, rounds=rounds)


def q_domain_trajectories(sf_dir: str):
    """Per-domain trajectory mining over the geocoded corpus: order
    each host's pages by crawl time, then exact-integer L1 path
    length, net displacement and radius of gyration
    (stages/spatialstats.trajectory_stats) — the moving-object view
    of a web crawl, one host shuffle."""
    from spapy_ray.stages.distjoin import _fixed5
    from spapy_ray.stages.spatialstats import trajectory_stats
    from spapy_ray.stages.text import url_parse_batch

    geo = _geo(sf_dir)

    def project(t: pa.Table) -> pa.Table:
        h = url_parse_batch(t.select(["url"]))
        return pa.table({
            "host": h.column("host"),
            "us": pc.cast(t.column("warc_ts"), pa.int64()),
            "url": t.column("url"),
            "lat5": pa.array(_fixed5(t.column("lat"))),
            "lon5": pa.array(_fixed5(t.column("lon")))})

    pts = geo.map_batches(project, batch_format="pyarrow")
    return trajectory_stats(pts, "host",
                            ["us", "url", "lat5", "lon5"])


def q_index_search(sf_dir: str, k: int = 20):
    """Ranked boolean retrieval (AND of three terms, score = summed
    term frequency, top-k by score desc / doc_id asc): per-batch
    token-equality bincounts — the postings are never shuffled; only
    the matching (doc, tf) rows reach the global top-k sort."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t.column("text"), " ")
        flat = toks.combine_chunks().flatten() \
            if isinstance(toks, pa.ChunkedArray) else toks.flatten()
        parent = pc.list_parent_indices(
            toks.combine_chunks() if isinstance(toks, pa.ChunkedArray)
            else toks).to_numpy(zero_copy_only=False)
        cols = {"doc_id": pc.cast(t.column("doc_id"), pa.int64())}
        total = np.zeros(len(t), dtype=np.int64)
        present = np.ones(len(t), dtype=bool)
        for term in _SEARCH_TERMS:
            m = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            tf = np.bincount(parent[m], minlength=len(t)) \
                .astype(np.int64)
            cols[f"tf_{term}"] = pa.array(tf)
            total += tf
            present &= tf > 0
        cols["score"] = pa.array(total)
        return pa.table(cols).filter(pa.array(present))

    return docs.map_batches(score, batch_format="pyarrow") \
        .sort(["score", "doc_id"], descending=[True, False]).limit(k)


def q_stay_points(sf_dir: str, radius: int = 20_000_000,
                  min_pts: int = 2):
    """Stay-point detection over the geocoded corpus (each host's
    pages as a trajectory): segments of consecutive crawl positions
    within an L1 radius, with dwell time and exact centroid
    numerators — stages/spatialstats.stay_points, one host shuffle."""
    from spapy_ray.stages.distjoin import _fixed5
    from spapy_ray.stages.spatialstats import stay_points
    from spapy_ray.stages.text import url_parse_batch

    geo = _geo(sf_dir)

    def project(t: pa.Table) -> pa.Table:
        h = url_parse_batch(t.select(["url"]))
        return pa.table({
            "host": h.column("host"),
            "us": pc.cast(t.column("warc_ts"), pa.int64()),
            "lat5": pa.array(_fixed5(t.column("lat"))),
            "lon5": pa.array(_fixed5(t.column("lon")))})

    pts = geo.map_batches(project, batch_format="pyarrow")
    return stay_points(pts, "host", ["us"], "lon5", "lat5",
                       radius=radius, min_pts=min_pts)


def q_domain_mix(sf_dir: str):
    """Temperature-resampled domain mixing (the LLM data-mixing
    sampler, alpha = 0.5): per-source quotas k_d = N/4 · isqrt(n_d) /
    Σ isqrt(n_d) flatten the source distribution, selection is the
    first k_d docs per source by deterministic hash order (fnv of the
    doc id — a seedless shuffle both sides can replay). One window
    shuffle; quotas from a tiny count fold. isqrt == floor(sqrt(
    ::DOUBLE)) for all n < 2^52 (proof sketch in the twin)."""
    import math

    from spapy_ray.kernels.hashing import fnv1a64
    from spapy_ray.stages.relational import pre_aggregated_count
    from spapy_ray.stages.window import window_over

    docs = _read(sf_dir, "documents", columns=["doc_id", "source"])
    counts = pre_aggregated_count(
        docs.select_columns(["source"]), "source", alias="n_d") \
        .to_pandas()
    total = int(counts["n_d"].sum())
    w = {s: math.isqrt(int(n))
         for s, n in zip(counts["source"], counts["n_d"])}
    W = sum(w.values())
    n_target = total // 4
    k_d = {s: (n_target * wd) // W for s, wd in w.items()}

    def hashed(t: pa.Table) -> pa.Table:
        s = pc.cast(t.column("doc_id"), pa.string())
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        h = fnv1a64(s)
        return pa.table({"source": t.column("source"),
                         "doc_id": pc.cast(t.column("doc_id"),
                                           pa.int64()),
                         "hv": pa.array(h.astype(np.uint64))})

    ranked = window_over(docs.map_batches(hashed,
                                          batch_format="pyarrow"),
                         key_col="source", order_cols=["hv", "doc_id"],
                         ops=[("rn", "row_number", None)])

    def keep(t: pa.Table) -> pa.Table:
        src = t.column("source").to_pylist()
        rn = t.column("rn").to_numpy(zero_copy_only=False)
        lim = np.array([k_d.get(s, 0) for s in src], dtype=np.int64)
        m = pa.array(rn <= lim)
        return t.filter(m).select(["source", "doc_id", "rn"])

    return ranked.map_batches(keep, batch_format="pyarrow")


def q_ngram_diversity(sf_dir: str, ngram: int = 3):
    """Per-source n-gram diversity (distinct token 3-grams / total
    3-grams — the self-repetition metric a data-curation pass tracks
    per slice): shingles from the flat-token-buffer shifted joins,
    distinct via the bucketed (source, term) dedup, ppm ratio in
    integer arithmetic. At corpus scale the dedup key would be a
    shingle hash; strings keep the twin trivially exact here."""
    from spapy_ray.stages.relational import bucketed_group_agg

    docs = _read(sf_dir, "documents", columns=["source", "text"])

    def shingles(t: pa.Table) -> pa.Table:
        text = t.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern(text, " ")
        counts = np.diff(np.asarray(toks.offsets))
        flat = pd.Series(toks.values.to_pandas())
        srcs = t.column("source").to_numpy(zero_copy_only=False)
        if len(flat) < ngram:
            return pa.table({"source": pa.array([], pa.string()),
                             "term": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64())})
        sh = flat.iloc[:len(flat) - ngram + 1].reset_index(drop=True)
        for j in range(1, ngram):
            nxt = flat.iloc[j:len(flat) - ngram + 1 + j] \
                .reset_index(drop=True)
            sh = sh.str.cat(nxt, sep="_")
        src_of = np.repeat(srcs, counts)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        within = np.arange(len(flat)) - np.repeat(starts, counts)
        keep = (within <= np.repeat(counts, counts) - ngram)[
            :len(flat) - ngram + 1]
        df_ = pd.DataFrame({"source": src_of[:len(flat) - ngram + 1][keep],
                            "term": sh[keep]})
        tf = df_.groupby(["source", "term"], sort=False).size() \
            .reset_index(name="tf")
        return pa.Table.from_pandas(tf, preserve_index=False)

    # (source, term) fold rides ONE bucketed shuffle on the joined
    # key — the ray 2-key groupby on 260k near-unique partials cost
    # 3.4 s at sf0.1 vs 0.6 s bucketed
    def pairkey(t: pa.Table) -> pa.Table:
        return t.append_column("st__", pc.binary_join_element_wise(
            t.column("source"), t.column("term"), "|"))

    def pfold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["source", "term"], sort=False)["tf"].sum() \
            .reset_index()
        return out.astype({"tf": np.int64})

    per_pair = bucketed_group_agg(
        docs.map_batches(shingles, batch_format="pyarrow")
        .map_batches(pairkey, batch_format="pyarrow"),
        "st__", lambda g: pfold(g.drop(columns=["st__"])))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("source", sort=False).agg(
            n_distinct=("term", "size"), n_total=("tf", "sum")) \
            .reset_index()
        return out.astype({"n_distinct": np.int64, "n_total": np.int64})

    agg = bucketed_group_agg(per_pair, "source", fold).to_pandas()
    g = agg.groupby("source", sort=False).sum().reset_index()
    g["div_ppm"] = (1_000_000 * g["n_distinct"]) // g["n_total"]
    return g.astype({c: np.int64 for c in
                     ("n_distinct", "n_total", "div_ppm")})


def q_heading_rose(sf_dir: str):
    """Per-host compass rose of crawl-trajectory headings: each
    consecutive step classified into the 8 exact 45°-boundary sectors
    (cardinal when |dx| vs |dy| strictly dominates, inter-cardinal on
    the exact diagonal, 'O' for zero steps — all integer sign/abs
    comparisons, no trig), counted per (host, dir). One host-bucketed
    shuffle, vectorized diff + classify per bucket."""
    from spapy_ray.stages.distjoin import _fixed5
    from spapy_ray.stages.relational import bucketed_group_agg
    from spapy_ray.stages.text import url_parse_batch

    geo = _geo(sf_dir)

    def project(t: pa.Table) -> pa.Table:
        h = url_parse_batch(t.select(["url"]))
        return pa.table({
            "host": h.column("host"),
            "us": pc.cast(t.column("warc_ts"), pa.int64()),
            "lat5": pa.array(_fixed5(t.column("lat"))),
            "lon5": pa.array(_fixed5(t.column("lon")))})

    pts = geo.map_batches(project, batch_format="pyarrow")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"host": [], "dir": [],
                                 "n": pd.array([], dtype=np.int64)})
        df = df.sort_values(["host", "us"], kind="stable")
        k = df["host"].to_numpy()
        x = df["lon5"].to_numpy().astype(np.int64)
        y = df["lat5"].to_numpy().astype(np.int64)
        newkey = np.r_[True, k[1:] != k[:-1]]
        dx = np.r_[np.int64(0), np.diff(x)]
        dy = np.r_[np.int64(0), np.diff(y)]
        ax, ay = np.abs(dx), np.abs(dy)
        d = np.where(
            (dx == 0) & (dy == 0), "O",
            np.where(ax > ay, np.where(dx > 0, "E", "W"),
                     np.where(ay > ax, np.where(dy > 0, "N", "S"),
                              np.where(dy > 0,
                                       np.where(dx > 0, "NE", "NW"),
                                       np.where(dx > 0, "SE",
                                                "SW")))))
        keep = ~newkey
        out = pd.DataFrame({"host": k[keep], "dir": d[keep]}) \
            .groupby(["host", "dir"], sort=False).size() \
            .reset_index(name="n")
        return out.astype({"n": np.int64})

    return bucketed_group_agg(pts, "host", fold)


def q_cms_hosts(sf_dir: str, k: int = 20):
    """Count-min sketch frequency audit (the sketch family's missing
    classic, joining MG/KLL/HLL/KMV/Bloom): build a 4×256 CMS of page
    hosts, then report the CMS estimate next to the true count for
    the top-k hosts — est_n >= true_n by construction (the
    overestimate-only guarantee), with collisions visible at 1000
    hosts on 1024 cells."""
    from spapy_ray.stages.relational import (cms_point_query,
                                             count_min_sketch,
                                             pre_aggregated_count)
    from spapy_ray.stages.text import url_parse

    hosts = url_parse(pages_dataset(sf_dir, include_html=False)) \
        .select_columns(["host"])
    mat = count_min_sketch(hosts, "host")
    truth = pre_aggregated_count(hosts, "host", alias="n").to_pandas()
    truth["n"] = truth["n"].astype(np.int64)
    top = truth.sort_values(["n", "host"],
                            ascending=[False, True]).head(k)
    est = cms_point_query(mat, top["host"].tolist())
    out = pd.DataFrame({"host": top["host"].to_numpy(),
                        "true_n": top["n"].to_numpy(),
                        "est_n": est})
    return out.reset_index(drop=True).astype(
        {"true_n": np.int64, "est_n": np.int64})


def q_vocab_drift(sf_dir: str, k: int = 15):
    """Train/eval vocabulary drift: token counts in the even-doc_id
    half vs the odd half, per-term signed cross-product deviation
    dnum = a·B − b·A (exact integer — the χ² numerator's directional
    core; zero ⟺ identical rates). Top-k by |dnum| desc, term asc.
    One flat-token combiner pass, driver fold on the tiny vocab."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def counts(t: pa.Table) -> pa.Table:
        text = t.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern(text, " ")
        ntok = np.diff(np.asarray(toks.offsets))
        side = (t.column("doc_id").to_numpy(zero_copy_only=False)
                % 2).astype(np.int64)
        df = pd.DataFrame({
            "term": toks.values.to_pandas(),
            "side": np.repeat(side, ntok)})
        g = df.groupby(["term", "side"], sort=False).size() \
            .reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    from spapy_ray.stages.relational import pre_aggregated_sums

    agg = pre_aggregated_sums(
        docs.map_batches(counts, batch_format="pyarrow"),
        ["term", "side"], ["n"]).to_pandas()
    agg["n"] = agg["n"].astype(np.int64)
    piv = agg.pivot_table(index="term", columns="side", values="n",
                          aggfunc="sum", fill_value=0)
    a = piv.get(0, pd.Series(0, index=piv.index)).to_numpy(
        dtype=np.int64)
    b = piv.get(1, pd.Series(0, index=piv.index)).to_numpy(
        dtype=np.int64)
    A, B = int(a.sum()), int(b.sum())
    dnum = a * B - b * A
    out = pd.DataFrame({"term": piv.index.to_numpy(), "a": a, "b": b,
                        "dnum": dnum})
    out["absd"] = np.abs(out["dnum"])
    out = out.sort_values(["absd", "term"],
                          ascending=[False, True]).head(k)
    return out[["term", "a", "b", "dnum"]].reset_index(drop=True) \
        .astype({"a": np.int64, "b": np.int64, "dnum": np.int64})


def q_source_distinct_hll(sf_dir: str, p: int = 8):
    """Per-source distinct-document estimates for dedup planning:
    grouped HLL over fnv(text) (relational.grouped_hll_distinct — one
    bucketed shuffle of register partials) joined with the EXACT
    per-source distinct count as the calibration column. The twin
    rebuilds every register in HUGEINT, so even the estimates are
    value-hash-checked — not just bounded."""
    from spapy_ray.kernels.hashing import fnv1a64
    from spapy_ray.stages.relational import (bucketed_group_agg,
                                             grouped_hll_distinct)

    docs = _read(sf_dir, "documents", columns=["source", "text"])

    def hv(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        return pa.table({"source": t.column("source"),
                         "hv": pa.array(fnv1a64(txt))})

    hashed = docs.map_batches(hv, batch_format="pyarrow")
    est = grouped_hll_distinct(hashed, "source", "hv", p=p) \
        .to_pandas()

    def exact(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop_duplicates().groupby("source", sort=False) \
            .size().reset_index(name="n_exact")
        return out.astype({"n_exact": np.int64})

    ex = bucketed_group_agg(hashed, "source", exact).to_pandas()
    out = est.merge(ex, on="source").sort_values("source")
    return out.reset_index(drop=True).astype(
        {"est_q": np.int64, "n_exact": np.int64})


def q_top_hosts_rescore(sf_dir: str, k: int = 20):
    """EXACT top-20 hosts by page count through the sketch-then-
    rescore pattern (relational.exact_topk_rescore): MG candidates,
    filtered exact counts, certificate check with adaptive width —
    on this near-uniform 1000-host corpus the first width's
    certificate FAILS and the widening loop is genuinely exercised
    before the result (which the plain GROUP BY twin then
    hash-confirms is exact)."""
    from spapy_ray.stages.relational import exact_topk_rescore
    from spapy_ray.stages.text import url_parse

    hosts = url_parse(pages_dataset(sf_dir, include_html=False)) \
        .select_columns(["host"])
    return exact_topk_rescore(hosts, "host", k)


def q_weighted_doc_sample(sf_dir: str, k: int = 100):
    """Deterministic weighted sampling without replacement (integer
    A-ES variant): priority = fnv(doc_id) // n_chars — a longer doc
    divides its hash harder, so the k smallest priorities favor
    length exactly like exponential-key reservoir sampling, but
    replayable on both sides with no RNG. Global top-k via
    sort+limit on the tiny priority projection."""
    from spapy_ray.kernels.hashing import fnv1a64

    docs = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def pri(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column("doc_id"), pa.string())
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        h = (fnv1a64(ids) >> np.uint64(1)).astype(np.int64)
        w = t.column("n_chars").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
            "n_chars": pa.array(w),
            "priority_q": pa.array(h // np.maximum(w, 1))})

    return docs.map_batches(pri, batch_format="pyarrow") \
        .sort(["priority_q", "doc_id"]).limit(k)


def q_crawl_politeness(sf_dir: str):
    """Crawl-politeness audit: per-host inter-request gap statistics
    (count, min gap, two-middle median gap — the rate-limiting
    evidence a crawler operator reports). One host-bucketed shuffle;
    gaps from a vectorized sorted diff, median in the engine-wide
    x2 convention."""
    from spapy_ray.stages.relational import bucketed_group_agg
    from spapy_ray.stages.text import url_parse_batch

    pages = pages_dataset(sf_dir, include_html=False)

    def proj(t: pa.Table) -> pa.Table:
        h = url_parse_batch(t.select(["url"]))
        return pa.table({
            "host": h.column("host"),
            "us": pc.cast(t.column("warc_ts"), pa.int64())})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["host", "n_gaps", "min_gap_us", "med_gap_x2"]
        if len(df) == 0:
            return pd.DataFrame({"host": []}).assign(
                **{c: pd.array([], dtype=np.int64)
                   for c in cols[1:]})
        df = df.sort_values(["host", "us"], kind="stable")
        k = df["host"].to_numpy()
        us = df["us"].to_numpy()
        newkey = np.r_[True, k[1:] != k[:-1]]
        gap = np.diff(us)
        valid = ~newkey[1:]
        gk = k[1:][valid]
        gv = gap[valid]
        if len(gv) == 0:
            return pd.DataFrame({"host": []}).assign(
                **{c: pd.array([], dtype=np.int64)
                   for c in cols[1:]})
        # fully vectorized per-key fold: gaps sorted within key, then
        # reduceat mins and two-middle medians by offset arithmetic
        order = np.lexsort((gv, gk))
        gk, gv = gk[order], gv[order]
        first = np.r_[True, gk[1:] != gk[:-1]]
        starts = np.nonzero(first)[0]
        n = np.diff(np.r_[starts, len(gk)]).astype(np.int64)
        med2 = gv[starts + (n - 1) // 2] + gv[starts + n // 2]
        return pd.DataFrame({
            "host": gk[starts], "n_gaps": n,
            "min_gap_us": gv[starts],
            "med_gap_x2": med2}).astype(
                {c: np.int64 for c in cols[1:]})

    return bucketed_group_agg(
        pages.map_batches(proj, batch_format="pyarrow"),
        "host", fold)


def q_host_zone_affinity(sf_dir: str):
    """Host→zone affinity: the zone holding the plurality of each
    host's geocoded pages, with the share in ppm (integer quotient) —
    the per-publisher geography signal. PIP join → (host, zone) count
    combiner → vectorized plurality fold (ties: count desc, zone
    asc)."""
    from spapy_ray.sources.zones import zones_table
    from spapy_ray.stages.join import pip_join
    from spapy_ray.stages.relational import pre_aggregated_sums
    from spapy_ray.stages.text import url_parse_batch

    joined = pip_join(_geo(sf_dir), zones_table(200),
                      left_columns=["url", "lon", "lat"])

    def hz(t: pa.Table) -> pa.Table:
        h = url_parse_batch(t.select(["url"]))
        return pa.table({"host": h.column("host"),
                         "zone_id": pc.cast(t.column("zone_id"),
                                            pa.int64())})

    c = pre_aggregated_sums(
        joined.map_batches(hz, batch_format="pyarrow"),
        ["host", "zone_id"], [], count_alias="n").to_pandas()
    c["n"] = c["n"].astype(np.int64)
    c["zone_id"] = c["zone_id"].astype(np.int64)
    c = c.sort_values(["host", "n", "zone_id"],
                      ascending=[True, False, True], kind="stable")
    g = c.groupby("host", sort=True)
    out = g.agg(n_pages=("n", "sum"), top_zone=("zone_id", "first"),
                top_n=("n", "first")).reset_index()
    out["share_ppm"] = (1_000_000 * out["top_n"]) // out["n_pages"]
    return out.astype({c_: np.int64 for c_ in
                       ("n_pages", "top_zone", "top_n", "share_ppm")})


def q_pip_join_cells(sf_dir: str):
    """The north rule's LARGE x LARGE spatial join under the value
    hash: both sides co-partitioned on quadkey cell (groupby-on-cell
    with salt=4 PINNED — the hot-cell skew treatment the north rule
    names), per-(cell, salt) local STRtree build + ray-cast; the
    polygon side is never broadcast (stages/join.py pip_join_cells;
    broadcast-parity pytest in tests/test_neardup_relate.py). Twin:
    the q_pip_join join condition restricted to (url, zone_id)."""
    import ray.data as rd

    from spapy_ray.stages.join import pip_join_cells

    zones = rd.from_arrow(zones_table())
    j = pip_join_cells(_geo(sf_dir), zones, salt=4)

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"url": t.column("pkey"),
                         "zone_id": t.column("zkey")})

    return j.map_batches(rename, batch_format="pyarrow")
