"""Text-analysis batch kernels over the documents / pages tables:
token counting, stopword/quality ratios, n-gram language heuristic,
rolling-hash fingerprints. All vectorized Arrow compute — no per-row
Python in the hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from spapy_ray.kernels.hashing import fnv1a64

STOPWORDS = ("the", "and", "of", "a", "to", "in", "is", "it")

# Tiny per-language marker vocabularies for the n-gram/keyword language
# heuristic (public-knowledge common words).
LANG_MARKERS = {
    "en": ("the", "and", "of", "is"),
    "es": ("el", "la", "de", "que"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "la", "et", "les"),
    "pt": ("o", "a", "de", "que"),
}


def token_stats_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Append n_tokens, n_stop, stop_ratio, avg_token_len.

    Token = ' '-separated word (matches SQL string_split semantics so
    the oracle can reproduce counts exactly).
    """
    text = batch.column(column)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern(text, " ")
    n_tokens = pc.cast(pc.list_value_length(toks), pa.int64())
    flat = pc.list_flatten(toks)
    is_stop = pc.is_in(flat, value_set=pa.array(STOPWORDS))
    # per-row stopword count: segmented reduction over list offsets
    offsets = np.asarray(toks.offsets)
    stop_np = is_stop.to_numpy(zero_copy_only=False).astype(np.int64)
    csum = np.concatenate([[0], np.cumsum(stop_np)])
    n_stop = csum[offsets[1:]] - csum[offsets[:-1]]
    ntok = n_tokens.to_numpy()
    stop_ratio = n_stop / np.maximum(ntok, 1).astype(np.float64)
    total_chars = pc.cast(pc.utf8_length(text), pa.int64()).to_numpy()
    # avg token length over ' '-separated tokens: (chars - separators)/n
    avg_len = (total_chars - (ntok - 1)) / np.maximum(ntok, 1).astype(np.float64)
    return (batch.append_column("n_tokens", n_tokens)
                 .append_column("n_stop", pa.array(n_stop))
                 .append_column("stop_ratio", pa.array(stop_ratio))
                 .append_column("avg_token_len", pa.array(avg_len)))


def token_stats(ds, column: str = "text", batch_size: int = 4096):
    return ds.map_batches(lambda t: token_stats_batch(t, column),
                          batch_format="pyarrow", batch_size=batch_size,
                          zero_copy_batch=True)


def lang_guess_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Append lang_guess: argmax of marker-word hit counts (stable
    first-wins over the LANG_MARKERS order on ties)."""
    text = batch.column(column)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern(text, " ")
    flat = pc.list_flatten(toks)
    offsets = np.asarray(toks.offsets)
    scores = np.zeros((len(batch), len(LANG_MARKERS)), dtype=np.int64)
    for j, (_, markers) in enumerate(LANG_MARKERS.items()):
        hit = pc.is_in(flat, value_set=pa.array(markers)).to_numpy(
            zero_copy_only=False).astype(np.int64)
        csum = np.concatenate([[0], np.cumsum(hit)])
        scores[:, j] = csum[offsets[1:]] - csum[offsets[:-1]]
    langs = np.asarray(list(LANG_MARKERS), dtype=object)
    guess = langs[np.argmax(scores, axis=1)].astype(str)
    return batch.append_column("lang_guess", pa.array(guess))


def fingerprint_batch(batch: pa.Table, column: str = "text",
                      out: str = "fingerprint") -> pa.Table:
    """Document fingerprint = FNV-1a of the text bytes (int64 view)."""
    h = fnv1a64(batch.column(column)).view(np.int64)
    return batch.append_column(out, pa.array(h))


def extract_json_int(ds, column: str, field: str, out: str,
                     batch_size: int = 32768):
    """Semi-structured extraction: pull an integer field out of a
    flat JSON string column with a vectorized Arrow regex (no
    per-row Python). The common web-data shape: props blobs too
    uniform to justify a full JSON parse."""
    import pyarrow as pa
    import pyarrow.compute as pc

    pat = '"' + field + '":\\s*(?P<v>-?\\d+)'

    def _b(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(t.column(column), pat)
        vals = pc.struct_field(ex, "v")
        return t.append_column(out, pc.cast(vals, pa.int64()))

    return ds.map_batches(_b, batch_format="pyarrow", batch_size=batch_size,
                          zero_copy_batch=True)


ROLL_B = np.uint64(1000003)            # odd -> invertible mod 2^64
ROLL_W = 8                              # window bytes


def rolling_fingerprint_batch(batch: pa.Table, column: str = "text",
                              out: str = "rfp", window: int = ROLL_W,
                              base: int = int(ROLL_B)) -> pa.Table:
    """Rabin-Karp rolling-hash document fingerprint (winnowing-style):
    min over all ``window``-byte windows of the polynomial hash
    sum b_j * B^(w-1-j) mod 2^64. Fully vectorized via the modular
    prefix trick: P_k = B^k * sum(b_j * Binv^(j+1)) so every window
    hash is P_{i+w} - P_i * B^w with two array lookups — one pass
    over the flat byte buffer, no per-window loop. Documents shorter
    than the window fall back to the whole-text polynomial hash."""
    col = batch.column(column)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # raw-buffer parse: offsets are int32 for string, int64 for
    # large_string (Arrow auto-promotes big chunks) — reading the
    # wrong width silently yields garbage fingerprints (ADVICE r2)
    if pa.types.is_large_string(col.type):
        off_dtype = np.int64
    elif pa.types.is_string(col.type):
        off_dtype = np.int32
    else:
        raise TypeError(f"rolling_fingerprint expects a string column, "
                        f"got {col.type}")
    buffers = col.buffers()
    flat = np.frombuffer(buffers[2], dtype=np.uint8)
    off = np.frombuffer(buffers[1], dtype=off_dtype)
    starts = off[col.offset:col.offset + len(col)].astype(np.int64)
    ends = off[col.offset + 1:col.offset + len(col) + 1].astype(np.int64)
    n = len(flat)
    B = np.uint64(base)
    Binv = pow(base, -1, 1 << 64)
    with np.errstate(over="ignore"):
        ks = np.arange(n + 1, dtype=np.uint64)
        # powers B^k and Binv^(k+1) mod 2^64 via wrapping cumprod
        powB = np.ones(n + 1, dtype=np.uint64)
        np.multiply.accumulate(np.full(n, B), out=powB[1:])
        powI = np.empty(n, dtype=np.uint64)
        np.multiply.accumulate(np.full(n, np.uint64(Binv)), out=powI)
        terms = flat.astype(np.uint64) * powI
        S = np.zeros(n + 1, dtype=np.uint64)
        np.add.accumulate(terms, out=S[1:])
        P = powB * S                              # prefix poly values
        Bw = np.uint64(pow(base, window, 1 << 64))
        lens = ends - starts
        rfp = np.empty(len(starts), dtype=np.uint64)
        long = lens >= window
        # windows of long docs: h_i = P[i+w] - P[i]*B^w, i in
        # [start, end-w]; segmented min via interleaved reduceat
        if long.any():
            h_all = P[window:] - P[:-window] * Bw   # h for start index i
            st = starts[long]
            ct = (lens[long] - window + 1)
            idx = np.empty(2 * len(st), dtype=np.int64)
            idx[0::2] = st
            idx[1::2] = st + ct
            ix = idx[:-1] if idx[-1] >= len(h_all) else idx
            rfp[long] = np.minimum.reduceat(h_all, ix)[0::2]
        short = ~long
        if short.any():
            for i in np.nonzero(short)[0]:
                s, e = int(starts[i]), int(ends[i])
                rfp[i] = P[e] - P[s] * np.uint64(pow(base, e - s, 1 << 64))
    return batch.append_column(out, pa.array(rfp))


def rolling_fingerprints(ds, column: str = "text", batch_size: int = 32768):
    return ds.map_batches(
        lambda t: rolling_fingerprint_batch(t, column),
        batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True)


def quality_stats_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Text-quality features (training-data quality scoring family):
    character count, ASCII punctuation count, digit count and the
    punctuation ratio. Both Arrow and DuckDB run RE2, so the regex
    class counts match exactly and the ratio (same int inputs, one
    double division) is bit-identical to the SQL twin."""
    text = batch.column(column)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    n_punct = pc.count_substring_regex(
        text, r"[!-/:-@\[-`{-~]").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    n_digit = pc.count_substring_regex(
        text, r"[0-9]").to_numpy(zero_copy_only=False).astype(np.int64)
    ratio = n_punct / np.maximum(n_chars, 1)
    return batch.append_column("n_chars", pa.array(n_chars)) \
        .append_column("n_punct", pa.array(n_punct)) \
        .append_column("n_digits", pa.array(n_digit)) \
        .append_column("punct_ratio", pa.array(ratio))


def quality_stats(ds, column: str = "text", batch_size: int = 4096):
    return ds.map_batches(lambda t: quality_stats_batch(t, column),
                          batch_format="pyarrow", batch_size=batch_size,
                          zero_copy_batch=True)


def ngram_counts(ds, n: int = 2, column: str = "text", *,
                 top: int | None = None, buckets: int | None = None):
    """Corpus n-gram counts — the classic training-corpus statistic.

    Per batch: ONE split_pattern, then grams are built from the flat
    token buffer with n shifted zero-copy slices joined element-wise
    (no per-row Python); grams straddling a document boundary are
    masked out with a doc-id compare over the list offsets. Each
    batch collapses to its (gram, count) partials (combiner), the
    two-stage hash-bucket shuffle folds them exactly, and the
    optional ``top`` applies a deterministic (count desc, gram asc)
    sort+limit. Shuffle volume is O(distinct grams per block), never
    O(tokens)."""
    from spapy_ray.stages.relational import bucketed_group_agg

    def partial(t: pa.Table) -> pa.Table:
        text = t.column(column)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern(text, " ")
        flat = pc.list_flatten(toks)
        m = len(flat)
        w = m - (n - 1)
        if w <= 0:
            return pa.table({"gram": pa.array([], type=pa.string()),
                             "_pc": pa.array([], type=pa.int64())})
        offsets = np.asarray(toks.offsets)
        lengths = offsets[1:] - offsets[:-1]
        did = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
        ok = did[:w] == did[n - 1:]
        parts = [flat.slice(i, w) for i in range(n)]
        grams = pc.binary_join_element_wise(*parts, " ")
        grams = grams.filter(pa.array(ok))
        vc = grams.value_counts()
        return pa.table({"gram": vc.field("values"),
                         "_pc": pc.cast(vc.field("counts"), pa.int64())})

    def local(g):
        out = g.groupby("gram", sort=False)["_pc"].sum().reset_index()
        out = out.rename(columns={"_pc": "n"})
        out["n"] = out["n"].astype(np.int64)
        return out

    counts = bucketed_group_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        "gram", local, buckets=buckets).select_columns(["gram", "n"])
    if top is None:
        return counts
    return counts.sort(["n", "gram"], descending=[True, False]).limit(top)


URL_PATTERN = (r"^(?P<scheme>[a-z][a-z0-9+.-]*)://(?P<host>[^/?#]*)"
               r"(?P<path>[^?#]*)")


def url_parse_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Append scheme/host/path columns split from ``url_col`` — ONE
    vectorized RE2 pass (pc.extract_regex), the webtext URL primitive
    (per-domain grouping, host-level dedup/sampling keys). Rows that
    do not parse get empty strings (never nulls — downstream groupbys
    and pandas conversions stay typed)."""
    url = batch.column(url_col)
    if isinstance(url, pa.ChunkedArray):
        url = url.combine_chunks()
    ext = pc.extract_regex(url, pattern=URL_PATTERN)
    ok = pc.is_valid(ext)
    empty = pa.scalar("", type=pa.string())
    out = batch
    for part in ("scheme", "host", "path"):
        col = pc.if_else(ok, pc.struct_field(ext, part), empty)
        out = out.append_column(part, col)
    return out


def url_parse(ds, url_col: str = "url", batch_size: int = 32768):
    return ds.map_batches(
        lambda t: url_parse_batch(t, url_col),
        batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True)


# GPT-2-style pretokenizer, restricted to RE2 (no lookahead, ASCII
# classes): contraction suffixes, space-prefixed letter/digit runs,
# space-prefixed punctuation runs, residual whitespace
BPE_PATTERN = (r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+"
               r"| ?[^A-Za-z0-9\s]+|\s+")


def bpe_token_count_batch(batch: pa.Table, column: str = "text",
                          alias: str = "n_bpe") -> pa.Table:
    """Append the BPE-ish pretoken count — the standard proxy for LLM
    token budgets when no tokenizer model ships with the engine. One
    vectorized RE2 count per batch; DuckDB's RE2 reproduces it via
    len(regexp_extract_all(...)), so counts are oracle-exact."""
    text = batch.column(column)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n = pc.cast(pc.count_substring_regex(text, pattern=BPE_PATTERN),
                pa.int64())
    return batch.append_column(alias, n)


def repetition_stats_batch(batch: pa.Table, column: str = "text") \
        -> pa.Table:
    """Append Gopher-style repetition signals per document:

    - ``top_tok_frac``  — occurrences of the most frequent token /
      total tokens (1.0 for a fully repeated doc);
    - ``distinct_ratio`` — distinct tokens / total tokens.

    Fully vectorized: ONE dictionary-encode of the flat token stream
    + ONE lexsort of (doc, code); per-doc max run lengths come from
    boundary differences, no Python per doc. Empty docs get 0/0 → 0.
    """
    text = batch.column(column)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern(text, " ")
    offsets = np.asarray(toks.offsets, dtype=np.int64)
    flat = pc.list_flatten(toks)
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    ntok = np.diff(offsets)
    doc = np.repeat(np.arange(len(ntok), dtype=np.int64), ntok)
    order = np.lexsort((codes, doc))
    d, c = doc[order], codes[order]
    # run boundaries of equal (doc, code)
    new_run = np.concatenate(([True], (d[1:] != d[:-1])
                              | (c[1:] != c[:-1])))
    run_start = np.flatnonzero(new_run)
    run_len = np.diff(np.concatenate((run_start, [len(d)])))
    run_doc = d[run_start]
    top = np.zeros(len(ntok), dtype=np.int64)
    np.maximum.at(top, run_doc, run_len)
    distinct = np.bincount(run_doc, minlength=len(ntok)).astype(np.int64)
    denom = np.maximum(ntok, 1).astype(np.float64)
    return (batch
            .append_column("top_tok_frac",
                           pa.array(top / denom))
            .append_column("distinct_ratio",
                           pa.array(distinct / denom)))


# --------------------------------------------------- PII redaction
# The C4/CCNet-style cleaning step: emails, phone-like numbers and
# IPv4 literals replaced with fixed tags. One RE2 pass per class per
# batch (pc.replace_substring_regex); DuckDB's regexp_replace(...,
# 'g') runs the SAME RE2 patterns, so scrubbed text is byte-identical
# between engine and oracle.
PII_PATTERNS = [
    ("[EMAIL]", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("[IP]", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
    ("[PHONE]", r"\+?\d{1,3}[-. ]\(?\d{2,4}\)?[-. ]\d{3,4}[-. ]\d{3,4}"),
]


def pii_scrub_batch(batch: pa.Table, text_col: str = "text",
                    out_col: str | None = None) -> pa.Table:
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    for tag, pat in PII_PATTERNS:
        col = pc.replace_substring_regex(col, pattern=pat,
                                         replacement=tag)
    name = out_col or text_col
    if name in batch.column_names:
        return batch.set_column(batch.column_names.index(name), name, col)
    return batch.append_column(name, col)


def pii_scrub(ds, text_col: str = "text", batch_size: int = 32768):
    return ds.map_batches(
        lambda t: pii_scrub_batch(t, text_col),
        batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True)


def tfidf_top_terms(ds, n_docs: int, *, group_col: str = "lang",
                    text_col: str = "text", k: int = 10,
                    idf_scale: int = 1000, buckets: int | None = None):
    """Top-k terms per group by tf-idf — the corpus-analysis op behind
    domain/language keyword profiling (reference has no text analysis
    at all; SURVEY.md §2.10 north-rule family).

    tf(g, t)   = term occurrences within the group,
    idf_q(t)   = (n_docs * idf_scale) // df(t)   (integer-quantized
                 reciprocal idf — exact in int64, so the score is
                 bit-identical to the SQL twin; a float log idf has
                 no deterministic cross-engine twin),
    score      = tf * idf_q.

    Distributed shape: ONE pass over the corpus emits per-batch
    partials for BOTH aggregates — (group, term, tf) counts and
    (term, df) distinct-doc counts (each document is one row, so
    per-batch distinct is globally exact) — tagged into one unified
    table; ONE hash(term) bucket shuffle finalizes tf and df together
    (term determines the bucket, so the tf⋈df join is bucket-local);
    the per-group top-k runs through grouped_topk (combiner + bucket
    shuffle, never a global sort).

    ``n_docs`` is the corpus document count (metadata-cheap
    ``ds.count()`` on a parquet read). Returns
    Dataset(group_col, term, tf, df, score, rank), rank 1..k per
    group ordered by (score desc, term asc).
    """
    from spapy_ray.stages.relational import bucketed_group_agg, \
        grouped_topk

    def partials(t: pa.Table) -> pa.Table:
        text = t.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern(text, " ")
        counts = np.diff(np.asarray(toks.offsets))
        flat = toks.values
        grp = t.column(group_col).to_numpy(zero_copy_only=False)
        df_ = pd.DataFrame({
            "term": flat.to_numpy(zero_copy_only=False),
            "grp": np.repeat(grp, counts),
            "doc": np.repeat(np.arange(len(t)), counts)})
        tf = df_.groupby(["grp", "term"], sort=False).size() \
            .reset_index(name="cnt")
        tf["kind"] = np.int32(0)
        dfc = df_.drop_duplicates(["term", "doc"]) \
            .groupby("term", sort=False).size().reset_index(name="cnt")
        dfc["kind"] = np.int32(1)
        dfc["grp"] = ""
        out = pd.concat([tf, dfc[["grp", "term", "cnt", "kind"]]],
                        ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False)

    def per_term(g: pd.DataFrame) -> pd.DataFrame:
        tf = g[g["kind"] == 0].groupby(["grp", "term"], sort=False)[
            "cnt"].sum().reset_index(name="tf")
        df_ = g[g["kind"] == 1].groupby("term", sort=False)[
            "cnt"].sum().reset_index(name="df")
        m = tf.merge(df_, on="term", how="inner")
        idf_q = (np.int64(n_docs) * np.int64(idf_scale)) \
            // m["df"].to_numpy(dtype=np.int64)
        m["score"] = m["tf"].to_numpy(dtype=np.int64) * idf_q
        m["tf"] = m["tf"].astype(np.int64)
        m["df"] = m["df"].astype(np.int64)
        return m.rename(columns={"grp": group_col})

    scored = bucketed_group_agg(
        ds.map_batches(partials, batch_format="pyarrow"), "term",
        per_term, buckets=buckets)
    return grouped_topk(scored, group_col, "score", k,
                        descending=True, tie_cols=["term"],
                        buckets=buckets)


def unigram_surprisal(ds, *, key_col: str = "doc_id",
                      text_col: str = "text", scale: int = 1000,
                      buckets: int | None = None):
    """Unigram-LM surprisal quality score per document — the
    integer-exact stand-in for perplexity-based corpus filtering
    (CCNet/KenLM-style): rare-token-heavy documents score high,
    boilerplate scores low.

        surprise(tok) = (N_total_tokens * scale) // count(tok)
        score(doc)    = sum over the doc's tokens of surprise(tok)

    The quantized reciprocal frequency keeps everything int64 (a
    float log-prob has no bit-exact distributed sum), same design as
    tfidf_top_terms' idf.

    Distributed shape: one pass folds global token counts (per-batch
    combiner + ONE term-bucket shuffle); the vocabulary is the SMALL
    side (unique terms, not tokens) and is broadcast sorted via
    ray.put — the same bound as zone/centroid/rank broadcasts; the
    scoring pass is then a pure map (searchsorted + segmented
    reduceat), no second shuffle.

    Returns Dataset(key_col, n_tokens, surprisal), int64.
    """
    import ray

    from spapy_ray.stages.relational import bucketed_group_agg

    def count_partial(t: pa.Table) -> pa.Table:
        text = t.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern(text, " ")
        flat = toks.values
        df_ = pd.DataFrame(
            {"term": flat.to_numpy(zero_copy_only=False)})
        out = df_.groupby("term", sort=False).size() \
            .reset_index(name="cnt")
        return pa.Table.from_pandas(out, preserve_index=False)

    def count_local(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("term", sort=False)["cnt"].sum() \
            .reset_index(name="cnt")

    counts = bucketed_group_agg(
        ds.map_batches(count_partial, batch_format="pyarrow"), "term",
        count_local, buckets=buckets)
    ct = pa.concat_tables(
        [b for b in counts.iter_batches(batch_format="pyarrow")],
        promote_options="default")
    terms = ct.column("term").to_numpy(zero_copy_only=False)
    cnts = ct.column("cnt").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    order = np.argsort(terms)
    terms = terms[order]
    total = int(cnts.sum())
    surprise = (np.int64(total) * np.int64(scale)) // cnts[order]
    ref = ray.put((terms, surprise))

    def score(t: pa.Table, _ref=ref) -> pa.Table:
        vocab, sur = ray.get(_ref)
        text = t.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern(text, " ")
        flat = toks.values.to_numpy(zero_copy_only=False)
        counts_per_doc = np.diff(np.asarray(toks.offsets))
        idx = np.searchsorted(vocab, flat)
        vals = sur[idx]
        starts = np.concatenate(
            ([0], np.cumsum(counts_per_doc)[:-1]))
        tot = np.zeros(len(t), dtype=np.int64)
        nz = counts_per_doc > 0
        if nz.any():
            # reduceat over the NON-EMPTY segment starts only: an
            # empty doc's start can equal len(vals) (out of range),
            # and empty docs contribute no values anyway
            tot[nz] = np.add.reduceat(vals, starts[nz])
        return pa.table({
            key_col: t.column(key_col),
            "n_tokens": pa.array(counts_per_doc.astype(np.int64)),
            "surprisal": pa.array(tot)})

    return ds.map_batches(score, batch_format="pyarrow")


def bigram_pmi(ds, *, column: str = "text", k: int = 50,
               min_count: int = 5, quant: int = 1_000_000,
               buckets: int | None = None):
    """Collocation extraction: top-k bigrams by quantized pointwise
    association (the PMI-family corpus statistic behind phrase
    mining / tokenizer-merge candidates). The score is the chained
    integer floor

        score = ((c_ab * quant) // c_a * quant) // c_b

    — monotone in c_ab/(c_a·c_b) (unnormalized PMI lift), never
    overflows (c_ab <= c_a caps the first factor at quant), and is
    DEFINED as this exact expression so the SQL twin matches bit for
    bit; a float log-PMI has no such twin.

    Distributed shape: bigram and unigram counts each fold through
    the existing combiner + bucket shuffle (ngram_counts); the
    unigram table is the SMALL side (vocabulary) and broadcasts
    sorted via ray.put; top-k is a deterministic
    (score desc, gram asc) sort+limit over the min_count survivors.

    Returns Dataset(gram, c_ab, c_a, c_b, score), k rows.
    """
    import ray

    uni = ngram_counts(ds, n=1, column=column, buckets=buckets)
    ut = pa.concat_tables(
        [b for b in uni.iter_batches(batch_format="pyarrow")],
        promote_options="default")
    terms = ut.column("gram").to_numpy(zero_copy_only=False)
    cnts = ut.column("n").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    order = np.argsort(terms)
    ref = ray.put((terms[order], cnts[order]))

    big = ngram_counts(ds, n=2, column=column, buckets=buckets)

    def score(t: pa.Table, _ref=ref) -> pa.Table:
        vocab, vc = ray.get(_ref)
        c_ab = t.column("n").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = c_ab >= min_count
        t = t.filter(pa.array(keep))
        c_ab = c_ab[keep]
        grams = t.column("gram")
        if isinstance(grams, pa.ChunkedArray):
            grams = grams.combine_chunks()
        parts = pc.split_pattern(grams, " ")
        flat = parts.values.to_numpy(zero_copy_only=False)
        w1 = flat[0::2]
        w2 = flat[1::2]
        c_a = vc[np.searchsorted(vocab, w1)]
        c_b = vc[np.searchsorted(vocab, w2)]
        sc = (c_ab * np.int64(quant)) // c_a * np.int64(quant) // c_b
        return pa.table({"gram": t.column("gram"),
                         "c_ab": pa.array(c_ab),
                         "c_a": pa.array(c_a),
                         "c_b": pa.array(c_b),
                         "score": pa.array(sc)})

    scored = big.map_batches(score, batch_format="pyarrow")
    return scored.sort(["score", "gram"],
                       descending=[True, False]).limit(k)


def _lev1_verify(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized levenshtein(a,b)==1 check for candidate pairs
    (object arrays of str). Covers the two SymSpell-candidate cases:
    equal length (exactly one substitution) and length diff 1 (one
    insertion/deletion: prefix-equal then shift-equal suffix)."""
    n = len(a)
    ok = np.zeros(n, dtype=bool)
    if n == 0:
        return ok
    # vectorized byte matrices: S-dtype view, zero Python loops
    # (edit distance is over BYTES — the SQL twin agrees on ASCII;
    # multi-byte text diverges from character-level levenshtein).
    # numpy's unicode->S cast is ASCII-only; fall back to the
    # per-string UTF-8 encode loop when the vocab isn't ASCII.
    try:
        As = np.asarray(a, dtype=bytes)
        Bs = np.asarray(b, dtype=bytes)
        wa, wb = As.dtype.itemsize, Bs.dtype.itemsize
        L = max(wa, wb) + 1
        A = np.zeros((n, L), dtype=np.uint8)
        B = np.zeros((n, L), dtype=np.uint8)
        A[:, :wa] = As.view(np.uint8).reshape(n, wa)
        B[:, :wb] = Bs.view(np.uint8).reshape(n, wb)
        la = (A != 0).sum(axis=1).astype(np.int64)
        lb = (B != 0).sum(axis=1).astype(np.int64)
    except (UnicodeEncodeError, UnicodeDecodeError):
        la = np.fromiter((len(s.encode()) for s in a), np.int64, n)
        lb = np.fromiter((len(s.encode()) for s in b), np.int64, n)
        L = int(max(la.max(), lb.max())) + 1
        A = np.zeros((n, L), dtype=np.uint8)
        B = np.zeros((n, L), dtype=np.uint8)
        for i in range(n):
            ba, bb = a[i].encode(), b[i].encode()
            A[i, :len(ba)] = np.frombuffer(ba, np.uint8)
            B[i, :len(bb)] = np.frombuffer(bb, np.uint8)
    eq = la == lb
    if eq.any():
        ok[eq] = (A[eq] != B[eq]).sum(axis=1) == 1
    d1 = np.abs(la - lb) == 1
    if d1.any():
        idx = np.nonzero(d1)[0]
        # orient: X = longer, Y = shorter
        swap = lb[idx] > la[idx]
        X = np.where(swap[:, None], B[idx], A[idx])
        Y = np.where(swap[:, None], A[idx], B[idx])
        pe = np.cumprod(X == Y, axis=1).astype(bool)       # prefix equal
        sh = X[:, 1:] == Y[:, :-1]
        se = np.cumprod(sh[:, ::-1], axis=1)[:, ::-1].astype(bool)
        # delete X[k]: prefix equal before k AND shifted suffix from k
        cand = np.concatenate(
            [np.ones((len(idx), 1), bool), pe[:, :-1]], axis=1)
        ok[idx] = (cand[:, :-1] & se).any(axis=1)
    return ok


def fuzzy_vocab_pairs(ds, *, column: str = "text", min_count: int = 1,
                      buckets: int | None = None):
    """Spelling-variant pairs of the corpus vocabulary at edit
    distance EXACTLY 1 — SymSpell symmetric-delete, distributed:

    1. vocab extraction: one split per batch, per-batch partial
       counts, bucketed fold -> (word, n) rows (the only stage that
       touches the corpus; exchange carries distinct-word partials);
    2. each vocab word emits its unique deletion-1 variants (and
       itself), keyed by variant -> ONE bucketed shuffle co-locates
       every word pair within edit distance 1 (candidates);
    3. within a variant group, pairs are generated and verified with
       the vectorized lev==1 check; a final bucketed dedup collapses
       pairs that met in two variant groups.

    Partitioning assumption (classic SymSpell caveat): a variant
    group holds the words sharing one deletion — bounded by alphabet
    x length in natural text, quadratic only under adversarial vocab.
    Token = literal ' ' split (string_split semantics, empty tokens
    count). Returns Dataset(w1, w2, n1, n2) with w1 < w2.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from spapy_ray.stages.relational import bucketed_group_agg

    def tok_partial(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern(t.column(column), " "))
        df = pd.DataFrame({"w": toks.to_pandas()})
        g = df.groupby("w", sort=False).size().reset_index(name="c")
        g["c"] = g["c"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("w", sort=False)["c"].sum().reset_index(name="n")
        s = s[s["n"] >= min_count]
        s["n"] = s["n"].astype(np.int64)
        return s

    vocab = bucketed_group_agg(
        ds.map_batches(tok_partial, batch_format="pyarrow"), "w",
        fold, buckets=buckets)

    def variants(t: pa.Table) -> pa.Table:
        ws = t.column("w").to_pandas().to_numpy()
        ns = t.column("n").to_numpy(zero_copy_only=False)
        vs, vw, vn = [], [], []
        for w, cn in zip(ws, ns):
            seen = {w}
            for i in range(len(w)):
                seen.add(w[:i] + w[i + 1:])
            for v in seen:
                vs.append(v)
                vw.append(w)
                vn.append(cn)
        return pa.table({"v": pa.array(vs, pa.string()),
                         "w": pa.array(vw, pa.string()),
                         "n": pa.array(np.asarray(vn, np.int64))})

    def pair_group(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "pk": pd.Series([], dtype=object),
            "w1": pd.Series([], dtype=object),
            "w2": pd.Series([], dtype=object),
            "n1": pd.Series([], dtype=np.int64),
            "n2": pd.Series([], dtype=np.int64)})
        frames = [empty]
        for _, gg in g.groupby("v", sort=False):
            m = len(gg)
            if m < 2:
                continue
            w = gg["w"].to_numpy()
            cn = gg["n"].to_numpy()
            ii, jj = np.triu_indices(m, k=1)
            lo = np.minimum(w[ii], w[jj])
            hi = np.maximum(w[ii], w[jj])
            nlo = np.where(w[ii] <= w[jj], cn[ii], cn[jj])
            nhi = np.where(w[ii] <= w[jj], cn[jj], cn[ii])
            keep = _lev1_verify(lo, hi)
            if keep.any():
                frames.append(pd.DataFrame({
                    "pk": np.char.add(np.char.add(
                        lo[keep].astype(str), "|"),
                        hi[keep].astype(str)).astype(object),
                    "w1": lo[keep], "w2": hi[keep],
                    "n1": nlo[keep].astype(np.int64),
                    "n2": nhi[keep].astype(np.int64)}))
        return pd.concat(frames, ignore_index=True)

    pairs = bucketed_group_agg(
        vocab.map_batches(variants, batch_format="pyarrow"), "v",
        pair_group, buckets=buckets)

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates("pk").drop(columns=["pk"])

    return bucketed_group_agg(pairs, "pk", dedup, buckets=buckets)


def stopword_strip_fp(ds, *, column: str = "text",
                      stopwords: tuple[str, ...] = ("the", "a"),
                      id_col: str = "doc_id"):
    """Stopword removal with a byte-exact fingerprint of the result —
    the normalization step of a dedup-after-cleaning pipeline, kept
    fully vectorized: stopword tokens are BLANKED in the flat token
    array (pc.if_else over one is_in mask), the list is rebuilt on
    the original offsets and space-joined, and the double spaces are
    collapsed by one RE2 pass — identical construction to the SQL
    twin, so the FNV of the stripped text is comparable bit-for-bit.
    No per-row Python; the only loop-shaped thing is a segmented
    reduction over list offsets."""
    from spapy_ray.kernels.hashing import fnv1a64

    def strip(batch: pa.Table) -> pa.Table:
        text = batch.column(column)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern(text, " ")
        flat = pc.list_flatten(toks)
        mask = pc.is_in(flat, value_set=pa.array(stopwords))
        blanked = pc.if_else(mask, pa.scalar(""), flat)
        # list_flatten compacts values, so rebase offsets to 0 before
        # rebuilding (a sliced ListArray's offsets need not start at 0)
        off = np.asarray(toks.offsets, dtype=np.int64)
        off0 = off - off[0]
        rebuilt = pa.ListArray.from_arrays(
            pa.array(off0, type=pa.int32()), blanked)
        joined = pc.binary_join(
            rebuilt, pa.scalar(" ", type=pa.string()))
        stripped = pc.utf8_trim(
            pc.replace_substring_regex(joined, pattern=" +",
                                       replacement=" "), " ")
        kept = (~mask.to_numpy(zero_copy_only=False)) \
            .astype(np.int64)
        csum = np.concatenate([[0], np.cumsum(kept)])
        n_kept = csum[off0[1:]] - csum[off0[:-1]]
        return pa.table({
            id_col: batch.column(id_col),
            "n_tok": pc.cast(pc.list_value_length(toks), pa.int64()),
            "n_kept": pa.array(n_kept),
            "fp": pa.array(fnv1a64(stripped).view(np.int64))})

    return ds.map_batches(strip, batch_format="pyarrow")


def winnow_batch(batch: pa.Table, column: str = "text", *,
                 window: int = ROLL_W, winnow_w: int = 16,
                 base: int = int(ROLL_B)) -> pa.Table:
    """Winnowing fingerprint selection (Schleimer, Wilkerson &
    Aiken 2003, the MOSS algorithm): over each document's sequence
    of ``window``-byte Rabin-Karp hashes, select the MINIMUM of
    every ``winnow_w``-wide hash window; the distinct selected
    hashes are the document's fingerprint set (guaranteed to share a
    fingerprint with any document overlapping >= w+k-1 bytes).

    Vectorized: the modular-prefix trick gives every position hash in
    one pass over the flat byte buffer; a single global
    sliding_window_view min covers all LONG docs (per-doc valid
    ranges gathered with one repeat/arange expansion — windows never
    straddle a doc because starts are range-restricted); short docs
    fall back to their single min (or the whole-text hash below one
    window). Returns (doc keys..., n_fp, fp_hi, fp_lo) — the
    fingerprint-set size and the XOR fold in 32-bit halves."""
    col = batch.column(column)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_large_string(col.type):
        off_dtype = np.int64
    elif pa.types.is_string(col.type):
        off_dtype = np.int32
    else:
        raise TypeError("winnow expects a string column")
    buffers = col.buffers()
    flat = np.frombuffer(buffers[2], dtype=np.uint8)
    off = np.frombuffer(buffers[1], dtype=off_dtype)
    starts = off[col.offset:col.offset + len(col)].astype(np.int64)
    ends = off[col.offset + 1:col.offset + len(col) + 1] \
        .astype(np.int64)
    n = len(flat)
    B = np.uint64(base)
    Binv = pow(base, -1, 1 << 64)
    docs = np.empty(0, dtype=np.int64)
    fps = np.empty(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        powB = np.ones(n + 1, dtype=np.uint64)
        np.multiply.accumulate(np.full(n, B), out=powB[1:])
        powI = np.empty(n, dtype=np.uint64)
        np.multiply.accumulate(np.full(n, np.uint64(Binv)), out=powI)
        S = np.zeros(n + 1, dtype=np.uint64)
        np.add.accumulate(flat.astype(np.uint64) * powI, out=S[1:])
        P = powB * S
        Bw = np.uint64(pow(base, window, 1 << 64))
        lens = ends - starts
        h_all = P[window:] - P[:-window] * Bw if n >= window \
            else np.empty(0, dtype=np.uint64)
        n_hash = np.maximum(lens - window + 1, 0)
        # LONG docs: >= winnow_w hashes -> global sliding min gather
        long = n_hash >= winnow_w
        if long.any() and len(h_all) >= winnow_w:
            from numpy.lib.stride_tricks import sliding_window_view

            smin = sliding_window_view(h_all, winnow_w).min(axis=1)
            st = starts[long]
            ct = n_hash[long] - winnow_w + 1
            tot = int(ct.sum())
            di = np.repeat(np.nonzero(long)[0], ct)
            base_idx = np.repeat(st, ct)
            intra = np.arange(tot, dtype=np.int64) \
                - np.repeat(np.cumsum(ct) - ct, ct)
            docs = di
            fps = smin[base_idx + intra]
        # MID docs: at least one hash but fewer than winnow_w ->
        # single fingerprint = min over all hashes (reduceat)
        mid = (n_hash >= 1) & ~long
        if mid.any():
            st = starts[mid]
            idx = np.empty(2 * len(st), dtype=np.int64)
            idx[0::2] = st
            idx[1::2] = st + n_hash[mid]
            ix = idx[:-1] if idx[-1] >= len(h_all) else idx
            m = np.minimum.reduceat(h_all, ix)[0::2]
            docs = np.concatenate([docs, np.nonzero(mid)[0]])
            fps = np.concatenate([fps, m])
        # SHORT docs (< one window): whole-text hash
        short = n_hash < 1
        for i in np.nonzero(short)[0]:
            s, e = int(starts[i]), int(ends[i])
            docs = np.concatenate([docs, [i]])
            fps = np.concatenate(
                [fps, [P[e] - P[s] * np.uint64(pow(base, e - s,
                                                   1 << 64))]])
    # distinct (doc, fp) pairs, then per-doc count + xor fold
    order = np.lexsort((fps, docs))
    docs, fps = docs[order], fps[order]
    keep = np.r_[True, (docs[1:] != docs[:-1]) | (fps[1:] != fps[:-1])]
    docs, fps = docs[keep], fps[keep]
    n_fp = np.zeros(len(col), dtype=np.int64)
    np.add.at(n_fp, docs, 1)
    x = np.zeros(len(col), dtype=np.uint64)
    np.bitwise_xor.at(x, docs, fps)
    out = batch.drop_columns([column])
    out = out.append_column("n_fp", pa.array(n_fp))
    out = out.append_column("fp_hi", pa.array(
        (x >> np.uint64(32)).astype(np.int64)))
    out = out.append_column("fp_lo", pa.array(
        (x & np.uint64(0xFFFFFFFF)).astype(np.int64)))
    return out


def winnow_fingerprints(ds, column: str = "text",
                        batch_size: int = 32768, **kw):
    return ds.map_batches(
        lambda t: winnow_batch(t, column, **kw),
        batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True)


def cosine_pair_scores(ds, *, id_col: str = "doc_id",
                       text_col: str = "text", ngram: int = 3,
                       df_cap: int = 20, k: int = 50,
                       buckets: int | None = None):
    """Top-k most similar document pairs by sparse shingle-count dot
    product through an INVERTED INDEX — the all-pairs-free similarity
    shape (each posting list of a rare shingle emits its own pairs;
    no doc x doc matrix ever exists).  Terms are token ``ngram``-
    shingles (MOSS-style): unigrams over a web corpus are stopword-
    dominated, and the df cap would prune them all anyway.

    Pipeline: one corpus pass -> (term, doc, tf) postings; ONE
    hash(term) bucket shuffle where each term's document-frequency is
    bucket-local-exact — terms with 2 <= df <= ``df_cap`` emit
    weighted pairs (tf_a * tf_b) batched by distinct posting-list
    size (np.triu_indices per size, the within_group_pairs pattern);
    a pair-key bucket groupby sums the per-term contributions;
    per-block partial top-k bounds the final sort+limit to k rows per
    block.  Common shingles (df > cap) are pruned exactly like
    production near-dup indexes prune boilerplate — the SQL twin
    applies the same cap, so results stay value-exact.

    Returns the top-k (doc_a, doc_b, sim, rank) ordered by
    (sim desc, doc_a, doc_b); integer-exact end to end.
    """
    import pandas as pd

    from spapy_ray.stages.relational import (_bucket_column,
                                             bucketed_group_agg)
    from spapy_ray.util import cluster_cpus

    nb = buckets or max(64, cluster_cpus() * 4)

    def postings(t: pa.Table) -> pa.Table:
        text = t.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern(text, " ")
        counts = np.diff(np.asarray(toks.offsets))
        flat = pd.Series(toks.values.to_numpy(zero_copy_only=False))
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        # token n-gram shingles, vectorized over the flat buffer:
        # join n shifted views, then mask out cross-document windows
        # (within-doc position must leave room for n tokens)
        if len(flat) < ngram:
            return pa.table({"term": pa.array([], pa.string()),
                             "doc": pa.array([], pa.int64()),
                             "tf": pa.array([], pa.int64())})
        sh = flat.iloc[:len(flat) - ngram + 1].reset_index(drop=True)
        for j in range(1, ngram):
            nxt = flat.iloc[j:len(flat) - ngram + 1 + j] \
                .reset_index(drop=True)
            sh = sh.str.cat(nxt, sep="_")
        doc_of = np.repeat(ids, counts)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        within = np.arange(len(flat)) - np.repeat(starts, counts)
        keep = (within <= np.repeat(counts, counts) - ngram)[
            :len(flat) - ngram + 1]
        df_ = pd.DataFrame({"term": sh[keep],
                            "doc": doc_of[:len(flat) - ngram + 1][keep]})
        tf = df_.groupby(["term", "doc"], sort=False).size() \
            .reset_index(name="tf")
        return pa.Table.from_pandas(tf, preserve_index=False)

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("bkt__",
                               _bucket_column(t, "term", nb))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        term = g["term"].to_numpy()
        doc = g["doc"].to_numpy()
        tf = g["tf"].to_numpy().astype(np.int64)
        order = np.lexsort((doc, term))
        term, doc, tf = term[order], doc[order], tf[order]
        n = len(term)
        empty = pd.DataFrame({"pk": np.empty(0, np.int64),
                              "w": np.empty(0, np.int64)})
        if n < 2:
            return empty
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = term[1:] != term[:-1]
        starts = np.nonzero(new)[0]
        lens = np.diff(np.append(starts, n))
        out_k, out_w = [], []
        for m in np.unique(lens):
            if m < 2 or m > df_cap:
                continue
            iu0, iu1 = np.triu_indices(int(m), 1)
            s = starts[lens == m]
            ia = (s[:, None] + iu0[None, :]).ravel()
            ib = (s[:, None] + iu1[None, :]).ravel()
            out_k.append(doc[ia] * np.int64(1 << 32) + doc[ib])
            out_w.append(tf[ia] * tf[ib])
        if not out_k:
            return empty
        return pd.DataFrame({"pk": np.concatenate(out_k),
                             "w": np.concatenate(out_w)})

    posted = ds.map_batches(postings, batch_format="pyarrow") \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("bkt__").map_groups(pairs, batch_format="pandas")

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        if "w" not in df.columns:          # empty upstream block
            return pd.DataFrame({"pk": np.empty(0, np.int64),
                                 "w": np.empty(0, np.int64)})
        return df.groupby("pk", as_index=False, sort=False)["w"].sum()

    sims = bucketed_group_agg(posted, "pk", agg)

    def partial_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"pk": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        df = t.to_pandas()
        df = df.sort_values(["w", "pk"], ascending=[False, True]) \
            .head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    top = sims.map_batches(partial_topk, batch_format="pyarrow") \
        .to_pandas()
    top = top.sort_values(["w", "pk"], ascending=[False, True]).head(k)
    return pd.DataFrame({
        "doc_a": (top["pk"].to_numpy() >> 32).astype(np.int64),
        "doc_b": (top["pk"].to_numpy()
                  & ((1 << 32) - 1)).astype(np.int64),
        "sim": top["w"].to_numpy().astype(np.int64),
        "rank": np.arange(1, len(top) + 1, dtype=np.int64),
    }).reset_index(drop=True)


def bpe_train_merges(ds, text_col: str = "text", rounds: int = 8):
    """Distributed byte-level BPE merge training (the tokenizer-
    training core of an LLM data pipeline; reference tokenizes via
    host libs — this trains the merge table itself).

    Plan (the real BPE training layout — Sennrich et al. 2016 train
    over the WORD-COUNT dictionary, never the raw corpus):
      1. ONE corpus pass folds distinct (word, count) through the
         bucketed two-stage groupby — the corpus never re-enters.
      2. Words become int32 byte-token lists zero-copy from the
         Arrow string buffers (no per-word Python).
      3. Each round: per-batch adjacent-pair bincount partials
         (packed key a*4096+b, vocab <= 256+rounds so the pair space
         is tiny and bounded) -> one small groupby -> driver argmax
         with (count desc, pair asc) tie order -> vectorized
         leftmost-non-overlapping merge apply (run-parity trick for
         aa-chains) -> materialize the compact word table.

    At 10^12 docs the word table is the compacted vocabulary —
    orders of magnitude smaller than the corpus — so the k round
    passes run over the small table while the corpus is read once.

    Returns a pandas DataFrame (round, tok_a, tok_b, new_id, cnt).
    """
    from ray.data.aggregate import Sum

    from spapy_ray.stages.relational import bucketed_group_agg

    def word_partial(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(t.column(text_col), " "))
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table({"word": vc.field("values"),
                         "wc": pc.cast(vc.field("counts"), pa.int64())})

    def local(df):
        return df.groupby("word", sort=False)["wc"].sum().reset_index()

    words = bucketed_group_agg(
        ds.map_batches(word_partial, batch_format="pyarrow"), "word", local)

    def tokenize(t: pa.Table) -> pa.Table:
        arr = pc.cast(t.column("word"), pa.large_string()).combine_chunks()
        voff = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
            arr.offset:arr.offset + len(arr) + 1]
        vbuf = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        flat = vbuf[voff[0]:voff[-1]].astype(np.int32)
        offs = (voff - voff[0]).astype(np.int64)
        toks = pa.LargeListArray.from_arrays(offs, pa.array(flat))
        return pa.table({"toks": toks,
                         "wc": pc.cast(t.column("wc"), pa.int64())})

    cur = words.map_batches(tokenize, batch_format="pyarrow").materialize()

    def _flat_offs(t: pa.Table):
        col = t.column("toks").combine_chunks()
        offs_raw = col.offsets.to_numpy()
        vals = col.values.to_numpy(zero_copy_only=False)[
            offs_raw[0]:offs_raw[-1]]
        return vals, (offs_raw - offs_raw[0]).astype(np.int64)

    merges = []
    for r in range(rounds):
        def pair_partial(t: pa.Table) -> pa.Table:
            flat, offs = _flat_offs(t)
            n = len(flat)
            if n < 2:
                return pa.table({"k": pa.array([], pa.int64()),
                                 "w": pa.array([], pa.int64())})
            wc = t.column("wc").to_numpy(zero_copy_only=False)
            mask = np.ones(n - 1, dtype=bool)
            interior = offs[1:-1]
            interior = interior[(interior > 0) & (interior < n)]
            mask[interior - 1] = False
            w = np.repeat(wc, np.diff(offs))[:-1][mask]
            key = flat[:-1][mask].astype(np.int64) * 4096 + \
                flat[1:][mask].astype(np.int64)
            u, inv = np.unique(key, return_inverse=True)
            s = np.zeros(len(u), dtype=np.int64)
            np.add.at(s, inv, w)
            return pa.table({"k": pa.array(u), "w": pa.array(s)})

        agg = cur.map_batches(pair_partial, batch_format="pyarrow") \
            .groupby("k").aggregate(Sum("w", alias_name="w")).to_pandas()
        if len(agg) == 0:          # empty to_pandas has no columns
            break
        mw = int(agg["w"].max())
        k = int(agg.loc[agg["w"] == mw, "k"].min())
        a, b = k // 4096, k % 4096
        new_id = 256 + r
        merges.append((r, a, b, new_id, mw))

        def apply(t: pa.Table, a=a, b=b, new_id=new_id) -> pa.Table:
            flat, offs = _flat_offs(t)
            flat = flat.copy()
            n = len(flat)
            if n >= 2:
                m = np.zeros(n, dtype=bool)
                m[:-1] = (flat[:-1] == a) & (flat[1:] == b)
                interior = offs[1:-1]
                interior = interior[(interior > 0) & (interior < n)]
                m[interior - 1] = False
                idx = np.nonzero(m)[0]
            else:
                idx = np.array([], dtype=np.int64)
            if len(idx):
                run_start = np.ones(len(idx), dtype=bool)
                run_start[1:] = idx[1:] != idx[:-1] + 1
                run_first = idx[run_start]
                run_id = np.cumsum(run_start) - 1
                ki = idx[(idx - run_first[run_id]) % 2 == 0]
                flat[ki] = new_id
                dele = np.zeros(n, dtype=bool)
                dele[ki + 1] = True
                word_of = np.searchsorted(offs, ki + 1, side="right") - 1
                rem = np.bincount(word_of, minlength=len(offs) - 1)
                offs = np.concatenate(
                    ([0], np.cumsum(np.diff(offs) - rem)))
                flat = flat[~dele]
            toks = pa.LargeListArray.from_arrays(offs, pa.array(flat))
            return pa.table({"toks": toks, "wc": t.column("wc")})

        cur = cur.map_batches(apply, batch_format="pyarrow").materialize()

    return pd.DataFrame(
        merges, columns=["round", "tok_a", "tok_b", "new_id", "cnt"]) \
        .astype(np.int64)
