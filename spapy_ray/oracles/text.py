"""Text oracle twins (split from oracle.py)."""

from spapy_ray.oracles.common import *  # noqa: F401,F403


def q_pip_join_cells() -> str:
    """Twin of the co-partitioned (cell + salt) spatial join — the
    partitioning is an engine-side detail, so the oracle is simply
    the PIP pair set."""
    return (f"WITH {join_cte()} "
            "SELECT url, zone_id FROM joined")


def q_docs_token_stats() -> str:
    stop = "','".join(("the", "and", "of", "a", "to", "in", "is", "it"))
    return (
        "SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens, "
        f"len(list_filter(string_split(text, ' '), w -> w IN ('{stop}')))::BIGINT AS n_stop, "
        f"len(list_filter(string_split(text, ' '), w -> w IN ('{stop}')))::DOUBLE / "
        "greatest(len(string_split(text, ' ')), 1)::DOUBLE AS stop_ratio "
        "FROM documents"
    )


def q_docs_dedup_text() -> str:
    return ("SELECT min(doc_id) AS min_doc_id, count(*)::BIGINT AS n_copies "
            "FROM documents GROUP BY text")


def q_docs_lang_guess() -> str:
    from spapy_ray.stages.text import LANG_MARKERS

    scores = []
    for lang, markers in LANG_MARKERS.items():
        quoted = "','".join(markers)
        scores.append(
            f"len(list_filter(string_split(text, ' '), w -> w IN ('{quoted}'))) AS s_{lang}")
    langs = list(LANG_MARKERS)
    # first-wins argmax over the LANG_MARKERS order == np.argmax ties
    cases = []
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(f"s_{lang} >= s_{other}" for other in langs[i + 1:])
        cases.append(f"WHEN {conds} THEN '{lang}'")
    case = "CASE " + " ".join(cases) + f" ELSE '{langs[-1]}' END"
    return (f"SELECT doc_id, {case} AS lang_guess FROM "
            f"(SELECT doc_id, {', '.join(scores)} FROM documents)")


def q_minhash_sigs(num_hashes: int = 4) -> str:
    """MinHash signatures over documents: sig_i = min over 3-token
    shingles of mix(fnv1a64(shingle), i) — the exact twin of
    stages.neardup.minhash_batch (hash once, per-seed integer mix)."""
    from spapy_ray.stages.neardup import FNV_PRIME, minhash_mix_key

    def mix(i: int) -> str:
        k = minhash_mix_key(i)
        return ("((xor(" + sql_fnv1a("s") + f", {k}::UBIGINT)::HUGEINT * "
                f"{FNV_PRIME}::HUGEINT) % 18446744073709551616::HUGEINT)"
                "::UBIGINT")

    sigs = ", ".join(
        f"list_min(list_transform(sh, s -> {mix(i)})) AS sig{i}"
        for i in range(num_hashes))
    # degenerate case mirrored from the engine (minhash_batch): a
    # document with < 3 tokens hashes its whole text as one shingle
    return (
        "SELECT doc_id, " + sigs + " FROM ("
        "SELECT doc_id, CASE WHEN len(toks) < 3 THEN [text] ELSE "
        "list_transform(range(1, len(toks) - 1), "
        "j -> toks[j] || ' ' || toks[j + 1] || ' ' || toks[j + 2]) END AS sh "
        "FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents))"
    )


def q_simhash_docs() -> str:
    """Bit-exact SimHash twin: explode tokens, hash each with the
    UTF-8 fnv1a fold, majority-vote each of the 64 bits, repack."""
    th = sql_fnv1a("tok")
    return (
        "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
        "FROM documents), "
        f"h AS (SELECT doc_id, {th} AS th FROM toks), "
        "bits AS (SELECT doc_id, b, "
        "CASE WHEN sum(CASE WHEN (th >> b::INTEGER) & 1 = 1 THEN 1 ELSE -1 END) > 0 "
        "THEN 1 ELSE 0 END AS bit "
        "FROM h CROSS JOIN range(64) t(b) GROUP BY doc_id, b) "
        "SELECT doc_id, "
        "sum((bit::HUGEINT * (1::HUGEINT << b::INTEGER)))::UBIGINT AS simhash "
        "FROM bits GROUP BY doc_id"
    )


def q_near_dup_docs(threshold: float = 0.8) -> str:
    """Exact all-pairs 3-shingle Jaccard — ground truth for the LSH
    near-dup pipeline (engine jaccard = |A∩B| / |A∪B| of distinct
    shingle sets; identical integer counts → identical doubles)."""
    return (
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
        "s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1), "
        "j -> toks[j] || ' ' || toks[j + 1] || ' ' || toks[j + 2])) AS sh FROM t), "
        "p AS (SELECT a.doc_id AS key_a, b.doc_id AS key_b, "
        "len(list_intersect(a.sh, b.sh))::DOUBLE / "
        "len(list_distinct(list_concat(a.sh, b.sh))) AS jacc "
        "FROM s a JOIN s b ON a.doc_id < b.doc_id) "
        f"SELECT key_a, key_b, jacc FROM p WHERE jacc >= {threshold}"
    )


def q_docs_rolling_fp() -> str:
    """Twin of the rolling-hash fingerprint: min over 8-byte windows
    of the polynomial hash (base 1000003, mod 2^64), whole-text hash
    for docs shorter than a window."""
    from spapy_ray.kernels.hashing import sql_utf8_bytes

    fold = ("(h, c) -> ((h::HUGEINT * 1000003::HUGEINT + c::HUGEINT) "
            "% 18446744073709551616::HUGEINT)::UBIGINT")
    win = (f"list_min(list_transform(range(1, len(bs) - 6), i -> "
           f"list_reduce(list_prepend(0::UBIGINT, "
           f"list_transform(bs[i:i+7], x -> x::UBIGINT)), {fold})))")
    whole = (f"list_reduce(list_prepend(0::UBIGINT, "
             f"list_transform(bs, x -> x::UBIGINT)), {fold})")
    return (
        f"WITH b AS (SELECT doc_id, {sql_utf8_bytes('text')} AS bs FROM documents) "
        f"SELECT doc_id, CASE WHEN len(bs) < 8 THEN {whole} ELSE {win} END AS rfp "
        "FROM b"
    )


def q_events_props() -> str:
    return (
        "SELECT event_type, count(*)::BIGINT AS n, "
        "sum(regexp_extract(props, '\"k\":\\s*(-?\\d+)', 1)::BIGINT)::BIGINT AS sum_k "
        "FROM events GROUP BY event_type"
    )


def q_docs_quality() -> str:
    """Twin of queries.q_docs_quality: RE2 character-class counts
    (DuckDB regexp_replace) and the same int/int double division."""
    punct = r"[!-/:-@\[-`{-~]"
    return (
        "SELECT doc_id, length(text)::BIGINT AS n_chars, "
        f"(length(text) - length(regexp_replace(text, '{punct}', '', 'g')))::BIGINT AS n_punct, "
        "(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::BIGINT AS n_digits, "
        f"((length(text) - length(regexp_replace(text, '{punct}', '', 'g')))::DOUBLE "
        "/ GREATEST(length(text), 1)::DOUBLE) AS punct_ratio "
        "FROM documents"
    )


def q_quality_filter() -> str:
    """Twin of queries.q_quality_filter: same RE2 class counts as
    q_docs_quality, median length via quantile_disc (an exact
    element, so the >= compare has no rounding slack), punct cap."""
    punct = r"[!-/:-@\[-`{-~]"
    ratio = (f"((length(text) - length(regexp_replace(text, '{punct}', "
             "'', 'g')))::DOUBLE / GREATEST(length(text), 1)::DOUBLE)")
    return (
        f"WITH q AS (SELECT doc_id, length(text)::BIGINT AS n_chars, "
        f"{ratio} AS punct_ratio FROM documents), "
        "t AS (SELECT quantile_disc(n_chars, 0.5) AS thr FROM q) "
        "SELECT doc_id, n_chars, punct_ratio FROM q, t "
        "WHERE n_chars >= thr AND punct_ratio <= 0.2"
    )


def q_docs_bigrams(top: int = 50) -> str:
    """Twin of stages.text.ngram_counts(n=2): 1-based list indexing,
    range() excludes the end, so docs with < 2 tokens emit nothing —
    matching the engine's doc-boundary mask."""
    return (
        "WITH g AS (SELECT unnest(list_transform(range(1, len(toks)), "
        "j -> toks[j] || ' ' || toks[j + 1])) AS gram "
        "FROM (SELECT string_split(text, ' ') AS toks FROM documents)) "
        "SELECT gram, count(*)::BIGINT AS n FROM g GROUP BY gram "
        f"ORDER BY n DESC, gram LIMIT {top}")


def q_domain_stats() -> str:
    """Twin of q_domain_stats: same RE2 pattern, group 2 = host.

    NOTE the partial/fold decomposition is exact (not approximate):
    url → host is functional, so distinct (host, url) pairs with
    summed multiplicities reproduce count(*) and count(distinct url)
    per host."""
    from spapy_ray.stages.text import URL_PATTERN
    import re

    anon = re.sub(r"\?P<[a-z]+>", "", URL_PATTERN)
    return (f"WITH {pages_cte()}, "
            f"hosts AS (SELECT url, regexp_extract(url, '{anon}', 2) "
            "AS host FROM pages) "
            "SELECT host, count(*)::BIGINT AS n_pages, "
            "count(DISTINCT url)::BIGINT AS n_urls "
            "FROM hosts GROUP BY host")


def q_bpe_tokens() -> str:
    """Twin of stages.text.bpe_token_count_batch — both engines run
    RE2, so non-overlapping match counts agree exactly."""
    from spapy_ray.stages.text import BPE_PATTERN

    pat = BPE_PATTERN.replace("'", "''")
    return (f"WITH {pages_cte()} "
            "SELECT url, warc_ts, "
            f"len(regexp_extract_all(text, '{pat}'))::BIGINT AS n_bpe "
            "FROM pages")


def q_docs_repetition() -> str:
    """Twin of stages.text.repetition_stats_batch. Both sides split on
    single spaces (split_pattern == string_split, '' → ['']) and the
    final fractions are one IEEE double division each."""
    return (
        "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts "
        "FROM documents), "
        "tok AS (SELECT doc_id, unnest(ts) AS tok, len(ts) AS n "
        "FROM toks), "
        "cnt AS (SELECT doc_id, tok, max(n) AS n, count(*) AS c "
        "FROM tok GROUP BY doc_id, tok) "
        "SELECT doc_id, max(c)::DOUBLE / max(n) AS top_tok_frac, "
        "count(*)::DOUBLE / max(n) AS distinct_ratio "
        "FROM cnt GROUP BY doc_id")


def q_hh_domains() -> str:
    """Twin of queries.q_hh_domains: in the no-truncation regime the
    Misra-Gries estimates ARE the exact per-host counts."""
    import re

    from spapy_ray.stages.text import URL_PATTERN

    anon = re.sub(r"\?P<[a-z]+>", "", URL_PATTERN)
    return (f"WITH {pages_cte()} "
            f"SELECT regexp_extract(url, '{anon}', 2) AS host, "
            "count(*)::BIGINT AS est_count FROM pages GROUP BY host")


def q_contamination_pairs(threshold: float = 0.8) -> str:
    """Exact all-pairs cross-corpus 3-shingle Jaccard (even doc_ids x
    odd doc_ids) — ground truth for the contamination LSH pipeline
    (same shingle arithmetic as q_near_dup_docs)."""
    return (
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
        "s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1), "
        "j -> toks[j] || ' ' || toks[j + 1] || ' ' || toks[j + 2])) AS sh FROM t), "
        "p AS (SELECT a.doc_id AS key_left, b.doc_id AS key_right, "
        "len(list_intersect(a.sh, b.sh))::DOUBLE / "
        "len(list_distinct(list_concat(a.sh, b.sh))) AS jacc "
        "FROM s a JOIN s b ON a.doc_id % 2 = 0 AND b.doc_id % 2 = 1) "
        f"SELECT key_left, key_right, jacc FROM p WHERE jacc >= {threshold}"
    )


def q_docs_pii_scrub() -> str:
    """Twin of text.pii_scrub — identical RE2 patterns applied in the
    same order through regexp_replace(..., 'g')."""
    from spapy_ray.stages.text import PII_PATTERNS

    expr = "text"
    for tag, pat in PII_PATTERNS:
        # DuckDB single-quoted strings are literal (no backslash
        # processing) — only quotes need doubling
        p = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{tag}', 'g')"
    return f"SELECT doc_id, {expr} AS text FROM documents"


def q_domain_caps(k: int = 5) -> str:
    """Twin of queries.q_domain_caps: row_number over the identical
    (fnv1a(url) ASC, url ASC) order per host."""
    import re

    from spapy_ray.kernels.hashing import sql_fnv1a
    from spapy_ray.stages.text import URL_PATTERN

    anon = re.sub(r"\?P<[a-z]+>", "", URL_PATTERN)
    return (f"WITH {pages_cte()}, "
            f"h2 AS (SELECT regexp_extract(url, '{anon}', 2) AS host, "
            f"url, {sql_fnv1a('url')} AS hv FROM pages) "
            "SELECT host, url, row_number() OVER "
            "(PARTITION BY host ORDER BY hv, url)::BIGINT AS rank "
            f"FROM h2 QUALIFY rank <= {k}"
    )


def q_jaccard_pairs() -> str:
    """Exact 3-shingle Jaccard for adjacent doc_id pairs (the
    explicit-candidate form of the near-dup kernel). Same shingle
    algebra as q_near_dup_docs; the last doc's pair drops via the
    doc_id + 1 self-join, mirroring the engine's inner co-partition."""
    return (
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
        "s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1), "
        "j -> toks[j] || ' ' || toks[j + 1] || ' ' || toks[j + 2])) AS sh FROM t) "
        "SELECT a.doc_id AS key_a, b.doc_id AS key_b, "
        "len(list_intersect(a.sh, b.sh))::DOUBLE / "
        "len(list_distinct(list_concat(a.sh, b.sh))) AS jacc "
        "FROM s a JOIN s b ON b.doc_id = a.doc_id + 1"
    )


def q_ngram_overlap(n: int = 8) -> str:
    """Twin of stages.neardup.ngram_overlap_dups: distinct word
    n-grams per doc (same FNV-1a hash as the engine, so even a
    collision cannot diverge), each gram's min owner, per-doc fold
    over grams first seen in an earlier doc."""
    # NB: the position variable must not be named i/b/c/h — sql_fnv1a's
    # inner lambda variables would shadow it inside the gram expression
    gram = sql_fnv1a(f"array_to_string(w[gi:gi+{n - 1}], ' ')")
    return (
        "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w "
        "FROM documents), "
        f"grams AS (SELECT DISTINCT doc_id, {gram} AS h "
        f"FROM toks, unnest(generate_series(1, len(w) - {n - 1})) t(gi)), "
        "own AS (SELECT h, min(doc_id) AS own FROM grams GROUP BY h) "
        "SELECT g.doc_id, count(*)::BIGINT AS n_dup_grams, "
        "min(o.own) AS first_owner "
        "FROM grams g JOIN own o USING (h) WHERE g.doc_id > o.own "
        "GROUP BY g.doc_id"
    )


def q_tfidf_terms(k: int = 10, idf_scale: int = 1000) -> str:
    """Twin of stages.text.tfidf_top_terms over documents grouped by
    lang: integer-quantized idf ((N*scale)//df) so the score is exact
    int64 on both sides."""
    return (
        "WITH w AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) "
        "AS term FROM documents), "
        "tf AS (SELECT lang, term, count(*)::BIGINT AS tf "
        "FROM w GROUP BY 1, 2), "
        "df AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df "
        "FROM w GROUP BY 1), "
        "sc AS (SELECT lang, term, tf, df, "
        f"tf * (((SELECT count(*) FROM documents) * {idf_scale}) // df) "
        "AS score FROM tf JOIN df USING (term)), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY lang "
        "ORDER BY score DESC, term)::BIGINT AS rank FROM sc) "
        f"SELECT lang, term, tf, df, score, rank FROM r WHERE rank <= {k}"
    )


def q_docs_surprisal(scale: int = 1000) -> str:
    """Twin of stages.text.unigram_surprisal."""
    return (
        "WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) "
        "AS term FROM documents), "
        "c AS (SELECT term, count(*)::BIGINT AS cnt FROM w GROUP BY 1), "
        "tot AS (SELECT count(*)::BIGINT AS t FROM w) "
        "SELECT doc_id, count(*)::BIGINT AS n_tokens, "
        f"sum((tot.t * {scale}) // cnt)::BIGINT AS surprisal "
        "FROM w JOIN c USING (term), tot GROUP BY doc_id"
    )


def q_bigram_pmi(k: int = 50, min_count: int = 5,
                 quant: int = 1_000_000) -> str:
    """Twin of stages.text.bigram_pmi: identical chained integer
    floor ((c_ab*quant)//c_a*quant)//c_b, (score desc, gram asc)
    order."""
    return (
        "WITH t AS (SELECT string_split(text, ' ') AS toks "
        "FROM documents), "
        "g AS (SELECT unnest(list_transform(range(1, len(toks)), "
        "j -> toks[j] || ' ' || toks[j + 1])) AS gram FROM t), "
        "bg AS (SELECT gram, count(*)::BIGINT AS c_ab FROM g "
        f"GROUP BY gram HAVING count(*) >= {min_count}), "
        "w AS (SELECT unnest(toks) AS term FROM t), "
        "u AS (SELECT term, count(*)::BIGINT AS c FROM w "
        "GROUP BY term), "
        "s AS (SELECT bg.gram, bg.c_ab, u1.c AS c_a, u2.c AS c_b, "
        f"bg.c_ab * {quant} // u1.c * {quant} // u2.c AS score "
        "FROM bg JOIN u u1 ON u1.term = string_split(bg.gram, ' ')[1] "
        "JOIN u u2 ON u2.term = string_split(bg.gram, ' ')[2]) "
        "SELECT gram, c_ab, c_a, c_b, score FROM s "
        f"ORDER BY score DESC, gram LIMIT {k}"
    )


def q_table_checksum(buckets: int = 64) -> str:
    """Twin of relational.xor_fingerprint over documents keyed by
    doc_id:text — per-row fnv converted to the int64 bit pattern,
    bit_xor per hash bucket (XOR commutes, so any evaluation order
    matches the engine's block partials)."""
    fnv = sql_fnv1a("doc_id::VARCHAR || ':' || text")
    i64 = (f"(CASE WHEN h >= 9223372036854775808::UBIGINT "
           f"THEN (h::HUGEINT - 18446744073709551616::HUGEINT)::BIGINT "
           f"ELSE h::BIGINT END)")
    return (
        f"WITH t AS (SELECT ({fnv}) AS h FROM documents) "
        f"SELECT (h % {buckets})::BIGINT AS bucket, "
        f"bit_xor({i64}) AS fp, count(*)::BIGINT AS n_rows "
        "FROM t GROUP BY 1"
    )


def q_fuzzy_names() -> str:
    """Twin of text.fuzzy_vocab_pairs on customer names: quadratic
    levenshtein self-join over the distinct-token table (the engine
    side is the SymSpell candidate path — same result set)."""
    return (
        "WITH v AS (SELECT w, count(*)::BIGINT AS n FROM "
        "(SELECT unnest(string_split(c_name, ' ')) AS w "
        "FROM customer) GROUP BY w) "
        "SELECT a.w AS w1, b.w AS w2, a.n AS n1, b.n AS n2 "
        "FROM v a JOIN v b "
        "ON a.w < b.w AND levenshtein(a.w, b.w) = 1"
    )


def q_source_mode_lang() -> str:
    """Twin of the grouped mode: row_number over
    (count DESC, lang ASC)."""
    return (
        "WITH c AS (SELECT source, lang, count(*)::BIGINT AS n "
        "FROM documents GROUP BY 1, 2), "
        "r AS (SELECT source, lang, n, row_number() OVER "
        "(PARTITION BY source ORDER BY n DESC, lang) AS rn FROM c) "
        "SELECT source, lang, n FROM r WHERE rn = 1"
    )


def q_snapshot_diff() -> str:
    """Twin of the CDC diff: rebuild snapshot B with the same
    deterministic edits, FULL OUTER JOIN, CASE status. Fingerprints
    compare equal iff texts compare equal, so the twin compares
    texts directly."""
    return (
        "WITH a AS (SELECT doc_id, text FROM documents), "
        "b AS (SELECT doc_id, CASE WHEN doc_id % 7 = 0 "
        "THEN text || 'X' ELSE text END AS text FROM documents "
        "WHERE doc_id % 13 <> 0 "
        "UNION ALL SELECT doc_id + 1000000000, text FROM documents "
        "WHERE doc_id % 11 = 0), "
        "j AS (SELECT coalesce(a.doc_id, b.doc_id) AS k, "
        "CASE WHEN a.doc_id IS NULL THEN 'added' "
        "WHEN b.doc_id IS NULL THEN 'removed' "
        "WHEN a.text = b.text THEN 'same' ELSE 'changed' END "
        "AS status FROM a FULL OUTER JOIN b "
        "ON a.doc_id = b.doc_id) "
        "SELECT status, count(*)::BIGINT AS n_keys FROM j "
        "GROUP BY status"
    )


def q_hive_partition_roundtrip() -> str:
    """Twin of the pruned hive-layout read: per-lang counts + XOR of
    per-row text fnv for the two pruned languages."""
    fnv = sql_fnv1a("text")
    i64 = ("(CASE WHEN h >= 9223372036854775808::UBIGINT "
           "THEN (h::HUGEINT - 18446744073709551616::HUGEINT)::BIGINT "
           "ELSE h::BIGINT END)")
    return (
        f"WITH t AS (SELECT lang, ({fnv}) AS h FROM documents "
        "WHERE lang IN ('en', 'de')) "
        f"SELECT lang, count(*)::BIGINT AS n, bit_xor({i64}) AS fp "
        "FROM t GROUP BY lang"
    )


def q_text_freq_of_freqs() -> str:
    """Twin of the Good-Turing frequency-of-frequencies fold."""
    return (
        "SELECT c::BIGINT AS multiplicity, count(*)::BIGINT "
        "AS n_texts FROM (SELECT count(*) AS c FROM documents "
        "GROUP BY text) GROUP BY c"
    )


def q_seq_packing(chunk_tokens: int = 2048) -> str:
    """Twin of stages.packing.pack_chunks over documents: window
    running total -> per-doc chunk span via generate_series unnest."""
    c = chunk_tokens
    return (
        "WITH d AS (SELECT doc_id, len(string_split(text, ' '))"
        "::BIGINT AS tok FROM documents), "
        "r AS (SELECT doc_id, tok, sum(tok) OVER (ORDER BY doc_id "
        "ROWS UNBOUNDED PRECEDING)::BIGINT - tok AS cb FROM d), "
        f"s AS (SELECT doc_id, tok, cb, unnest(generate_series("
        f"cb // {c}, (cb + tok - 1) // {c})) AS k FROM r), "
        f"t AS (SELECT doc_id, cb, k, least(cb + tok, (k + 1) * {c}) "
        f"- greatest(cb, k * {c}) AS tk FROM s) "
        "SELECT k::BIGINT AS chunk_id, sum(tk)::BIGINT AS n_tokens, "
        "count(*)::BIGINT AS n_docs, "
        f"sum((cb // {c} = k)::INT)::BIGINT AS n_starts, "
        "sum(doc_id * tk)::BIGINT AS ck FROM t GROUP BY k"
    )


def q_vocab_ids(v: int = 200) -> str:
    """Twin of the vocabulary builder."""
    return (
        "WITH w AS (SELECT unnest(string_split(text, ' ')) AS token "
        "FROM documents), "
        "c AS (SELECT token, count(*)::BIGINT AS cnt FROM w "
        "GROUP BY token) "
        "SELECT token, cnt, row_number() OVER "
        "(ORDER BY cnt DESC, token)::BIGINT AS tok_id FROM c "
        f"ORDER BY cnt DESC, token LIMIT {v}"
    )


def q_docs_stop_strip() -> str:
    """Twin of stages.text.stopword_strip_fp: same blank-join-collapse
    construction, FNV over the stripped text, int64 view."""
    from spapy_ray.stages.text import STOPWORDS

    sw = ", ".join(f"'{s}'" for s in STOPWORDS)
    stripped = (
        "trim(regexp_replace(array_to_string(list_transform("
        f"string_split(text, ' '), t -> CASE WHEN t IN ({sw}) "
        "THEN '' ELSE t END), ' '), ' +', ' ', 'g'), ' ')"
    )
    fnv = sql_fnv1a("st")
    i64 = (f"(CASE WHEN {fnv} >= 9223372036854775808::UBIGINT "
           f"THEN ({fnv}::HUGEINT - 18446744073709551616::HUGEINT)"
           f"::BIGINT ELSE {fnv}::BIGINT END)")
    return (
        f"WITH s AS (SELECT doc_id, text, {stripped} AS st "
        "FROM documents) "
        "SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tok, "
        "len(list_filter(string_split(text, ' '), t -> t NOT IN "
        f"({sw})))::BIGINT AS n_kept, {i64} AS fp FROM s"
    )


def q_domain_cm(width: int = 2048, depth: int = 4) -> str:
    """Twin of relational.count_min over page hosts: the whole
    sketch — including collisions — reproduced in SQL (same fnv,
    same mix/add wraparound, same cells), so estimates are
    value-exact even where they overestimate."""
    import re

    from spapy_ray.stages.relational import CM_ADD, CM_MIX
    from spapy_ray.stages.text import URL_PATTERN

    anon = re.sub(r"\?P<[a-z]+>", "", URL_PATTERN)
    fnv = sql_fnv1a("key")
    mix = "[" + ", ".join(f"{m}::HUGEINT" for m in CM_MIX) + "]"
    add = "[" + ", ".join(str(a) for a in CM_ADD) + "]"
    m64 = "18446744073709551616"
    pos = (f"((((({fnv})::HUGEINT * ({mix})[d + 1]) % {m64}) "
           f"+ ({add})[d + 1]) % {m64}) % {width}")
    return (
        f"WITH {pages_cte()}, "
        f"hosts AS (SELECT regexp_extract(url, '{anon}', 2) AS key "
        "FROM pages), "
        "k AS (SELECT key, count(*)::BIGINT AS c FROM hosts "
        "GROUP BY key), "
        f"hh AS (SELECT key, c, d, {pos} AS pos "
        f"FROM k CROSS JOIN range({depth}) t(d)), "
        "cells AS (SELECT d, pos, sum(c)::BIGINT AS cell FROM hh "
        "GROUP BY 1, 2) "
        "SELECT key, min(cell)::BIGINT AS c_est "
        "FROM hh JOIN cells USING (d, pos) GROUP BY key"
    )


def q_docs_merge() -> str:
    """Twin of the CDC merge: versioned union, row_number keep-latest,
    delete filter, per-lang bit_xor of the row fingerprints."""
    fnv = sql_fnv1a("doc_id::VARCHAR || ':' || text")
    i64 = (f"(CASE WHEN {fnv} >= 9223372036854775808::UBIGINT "
           f"THEN ({fnv}::HUGEINT - 18446744073709551616::HUGEINT)"
           f"::BIGINT ELSE {fnv}::BIGINT END)")
    return (
        "WITH d AS (SELECT doc_id, text, lang FROM documents), "
        "a AS ("
        "SELECT doc_id, text, lang, 0 AS ver, 'U' AS op FROM d "
        "UNION ALL SELECT doc_id, text || ' v2', lang, 1, 'U' "
        "FROM d WHERE doc_id % 3 = 0 "
        "UNION ALL SELECT doc_id, '', lang, 2, 'D' "
        "FROM d WHERE doc_id % 7 = 0 "
        "UNION ALL SELECT doc_id, text || ' v3', lang, 3, 'U' "
        "FROM d WHERE doc_id % 9 = 0 "
        "UNION ALL SELECT doc_id + 1000000000, "
        "'new doc ' || doc_id::VARCHAR, lang, 1, 'U' "
        "FROM d WHERE doc_id % 11 = 0), "
        "last AS (SELECT *, row_number() OVER "
        "(PARTITION BY doc_id ORDER BY ver DESC) AS rn FROM a), "
        "m AS (SELECT doc_id, text, lang FROM last "
        "WHERE rn = 1 AND op = 'U') "
        f"SELECT lang, count(*)::BIGINT AS n_docs, "
        f"bit_xor({i64})::BIGINT AS fp FROM m GROUP BY lang"
    )


def q_corpus_overlap(q: int = 10 ** 6) -> str:
    """Twin of the EN/ES histogram intersection."""
    return (
        "WITH w AS (SELECT lang, unnest(string_split(text, ' ')) "
        "AS token FROM documents WHERE lang IN ('en', 'es')), "
        "c AS (SELECT token, "
        "sum((lang = 'en')::INT)::BIGINT AS ca, "
        "sum((lang = 'es')::INT)::BIGINT AS cb FROM w "
        "GROUP BY token), "
        "t AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb "
        "FROM c), "
        "s AS (SELECT sum(LEAST(ca * t.nb, cb * t.na))::BIGINT "
        "AS inter FROM c, t) "
        "SELECT t.na, t.nb, s.inter AS inter_num, "
        f"(({q} * s.inter) // (t.na * t.nb))::BIGINT AS overlap_q "
        "FROM t, s"
    )


def q_docs_shuffle_order(seed: str = "epoch1") -> str:
    """Twin of the deterministic epoch shuffle: row_number over the
    unsigned FNV order (ties broken by doc_id; UBIGINT sorts
    unsigned exactly like the engine's uint64 lexsort)."""
    fnv = sql_fnv1a(f"'{seed}:' || doc_id::VARCHAR")
    return (
        f"WITH h AS (SELECT doc_id, {fnv} AS hh FROM documents) "
        "SELECT doc_id, (row_number() OVER "
        "(ORDER BY hh, doc_id) - 1)::BIGINT AS pos FROM h"
    )


def q_k_anonymity(k: int = 5) -> str:
    """Twin of the k-anonymity audit."""
    return (
        "WITH c AS (SELECT lang, source, count(*)::BIGINT AS n "
        "FROM documents GROUP BY 1, 2) "
        f"SELECT {k}::BIGINT AS k_threshold, "
        "count(*)::BIGINT AS n_classes, "
        "min(n)::BIGINT AS min_class, "
        f"coalesce(sum(n) FILTER (WHERE n < {k}), 0)::BIGINT "
        "AS n_rows_below_k FROM c"
    )


def q_lang_confusion() -> str:
    """Twin of the language-ID confusion matrix (reuses the guess
    CASE from q_docs_lang_guess)."""
    inner = q_docs_lang_guess()
    return (
        f"WITH g AS ({inner}) "
        "SELECT d.lang, g.lang_guess, count(*)::BIGINT AS n "
        "FROM documents d JOIN g USING (doc_id) GROUP BY 1, 2"
    )


def q_trending_domains(k: int = 3) -> str:
    """Twin of the per-day top-k hosts (count desc, host asc)."""
    import re

    from spapy_ray.stages.text import URL_PATTERN

    anon = re.sub(r"\?P<[a-z]+>", "", URL_PATTERN)
    return (
        f"WITH {pages_cte()}, "
        "d AS (SELECT epoch_us(warc_ts) // 86400000000 AS day, "
        f"regexp_extract(url, '{anon}', 2) AS host FROM pages), "
        "c AS (SELECT day, host, count(*)::BIGINT AS n FROM d "
        "GROUP BY 1, 2), "
        "r AS (SELECT day, host, n, row_number() OVER "
        "(PARTITION BY day ORDER BY n DESC, host)::BIGINT AS rank "
        "FROM c) "
        f"SELECT day::BIGINT AS day, host, n, rank FROM r "
        f"WHERE rank <= {k}"
    )


def q_docs_winnow(winnow_w: int = 16) -> str:
    """Twin of text.winnow_fingerprints: per-position window hashes
    (same HUGEINT fold as q_docs_rolling_fp), list_min per winnow
    window, list_distinct, count + xor fold in 32-bit halves."""
    from spapy_ray.kernels.hashing import sql_utf8_bytes

    fold = ("(h, c) -> ((h::HUGEINT * 1000003::HUGEINT + c::HUGEINT)"
            " % 18446744073709551616::HUGEINT)::UBIGINT")
    hs = (f"list_transform(range(1, len(bs) - 6), i -> "
          f"list_reduce(list_prepend(0::UBIGINT, "
          f"list_transform(bs[i:i+7], x -> x::UBIGINT)), {fold}))")
    whole = (f"list_reduce(list_prepend(0::UBIGINT, "
             f"list_transform(bs, x -> x::UBIGINT)), {fold})")
    w = winnow_w
    sel = (f"CASE WHEN len(hs) = 0 THEN [{whole}] "
           f"WHEN len(hs) <= {w} THEN [list_min(hs)] "
           f"ELSE list_transform(range(1, len(hs) - {w - 2}), "
           f"j -> list_min(hs[j:j+{w - 1}])) END")
    return (
        "WITH b AS (SELECT doc_id, "
        f"{sql_utf8_bytes('text')} AS bs FROM documents), "
        f"h AS (SELECT doc_id, bs, {hs} AS hs FROM b), "
        f"s AS (SELECT doc_id, list_distinct({sel}) AS fp FROM h) "
        "SELECT doc_id, len(fp)::BIGINT AS n_fp, "
        "(list_reduce(fp, (a, v) -> xor(a, v)) >> 32)::BIGINT "
        "AS fp_hi, "
        "(list_reduce(fp, (a, v) -> xor(a, v)) "
        "& 4294967295::UBIGINT)::BIGINT AS fp_lo FROM s"
    )


def q_decontam_audit(n: int = 8, eval_mod: int = 50) -> str:
    """Twin of neardup.decontam_audit: distinct grams per doc (same
    FNV), eval-present gram set, per-train-doc shared counts."""
    gram = sql_fnv1a(f"array_to_string(w[gi:gi+{n - 1}], ' ')")
    return (
        "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w "
        "FROM documents), "
        f"grams AS (SELECT DISTINCT doc_id, {gram} AS h "
        f"FROM toks, unnest(generate_series(1, len(w) - {n - 1})) "
        "t(gi)), "
        f"ev AS (SELECT DISTINCT h FROM grams "
        f"WHERE doc_id % {eval_mod} = 0) "
        "SELECT g.doc_id, count(*)::BIGINT AS n_shared_grams "
        f"FROM grams g JOIN ev USING (h) "
        f"WHERE g.doc_id % {eval_mod} <> 0 GROUP BY g.doc_id"
    )


def q_docs_cosine_pairs(df_cap: int = 20, k: int = 50) -> str:
    """Twin of queries.q_docs_cosine_pairs: token 3-gram shingles via
    lead() over the space-split positions (empty split tokens count,
    same as the engine's flat-buffer shifts), same df cap, shingle-tf
    dot product per pair, same (sim desc, doc_a, doc_b) order."""
    return (
        "WITH w AS (SELECT doc_id, "
        "generate_subscripts(string_split(text, ' '), 1) AS pos, "
        "unnest(string_split(text, ' ')) AS tok FROM documents), "
        "sh AS (SELECT doc_id, tok || '_' "
        "|| lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) "
        "|| '_' "
        "|| lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) "
        "AS term FROM w), "
        "tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM sh "
        "WHERE term IS NOT NULL GROUP BY 1, 2), "
        "df AS (SELECT term, count(*)::BIGINT AS df FROM tf "
        "GROUP BY 1), "
        f"rare AS (SELECT term FROM df WHERE df BETWEEN 2 AND {df_cap}), "
        "pr AS (SELECT a.doc_id AS doc_a, c.doc_id AS doc_b, "
        "sum(a.tf * c.tf)::BIGINT AS sim "
        "FROM tf a JOIN tf c USING (term) JOIN rare USING (term) "
        "WHERE a.doc_id < c.doc_id GROUP BY 1, 2) "
        "SELECT doc_a, doc_b, sim, "
        "row_number() OVER (ORDER BY sim DESC, doc_a, doc_b)::BIGINT "
        f"AS rank FROM pr ORDER BY rank LIMIT {k}"
    )


def q_docs_readability() -> str:
    """Twin of queries.q_docs_readability: the same three RE2 counts
    via regexp_extract_all lengths and the same positive truncating
    divisions."""
    return (
        "WITH c AS (SELECT doc_id, "
        "len(regexp_extract_all(text, '[A-Za-z]+'))::BIGINT AS w, "
        "len(regexp_extract_all(text, '[.!?]+'))::BIGINT AS s, "
        "len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))::BIGINT "
        "AS y FROM documents) "
        "SELECT doc_id, w AS n_words, s AS n_sentences, "
        "y AS n_syllables, "
        "(206835 - (1015000 * w) // GREATEST(s, 1) "
        "- (84600 * y) // GREATEST(w, 1))::BIGINT AS flesch_x1000 "
        "FROM c"
    )


def q_corpus_prep(chunk_tokens: int = 2048) -> str:
    """Twin of queries.q_corpus_prep: median gate + punct cap, first
    doc per distinct TEXT (the engine keys on a 64-bit text hash —
    collision-free at corpus scale by the dedup family convention),
    then the q_seq_packing window layout over the survivors."""
    punct = r"[!-/:-@\[-`{-~]"
    ratio = (f"((length(text) - length(regexp_replace(text, '{punct}', "
             "'', 'g')))::DOUBLE / GREATEST(length(text), 1)::DOUBLE)")
    c = chunk_tokens
    return (
        "WITH q AS (SELECT doc_id, text, length(text)::BIGINT AS nc, "
        f"{ratio} AS pr FROM documents), "
        "t AS (SELECT quantile_disc(nc, 0.5) AS thr FROM q), "
        "s AS (SELECT doc_id, text, "
        "len(string_split(text, ' '))::BIGINT AS tok FROM q, t "
        "WHERE nc >= thr AND pr <= 0.2), "
        "w AS (SELECT doc_id, tok FROM (SELECT doc_id, tok, "
        "row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn "
        "FROM s) WHERE rn = 1), "
        "r AS (SELECT doc_id, tok, sum(tok) OVER (ORDER BY doc_id "
        "ROWS UNBOUNDED PRECEDING)::BIGINT - tok AS cb FROM w), "
        f"u AS (SELECT doc_id, tok, cb, unnest(generate_series("
        f"cb // {c}, (cb + tok - 1) // {c})) AS k FROM r), "
        f"v AS (SELECT doc_id, cb, k, least(cb + tok, (k + 1) * {c}) "
        f"- greatest(cb, k * {c}) AS tk FROM u) "
        "SELECT k::BIGINT AS chunk_id, sum(tk)::BIGINT AS n_tokens, "
        "count(*)::BIGINT AS n_docs, "
        f"sum((cb // {c} = k)::INT)::BIGINT AS n_starts, "
        "sum(doc_id * tk)::BIGINT AS ck FROM v GROUP BY k"
    )


def q_bpe_merges(rounds: int = 8) -> str:
    """Twin of queries.q_bpe_merges — byte-level BPE merge training,
    every round reproduced exactly. Words render as fixed-width hex
    token strings '|0041|0042|' (prefix-free, so any byte — incl. a
    literal '|' in a word — is safe), pair counts come from the
    split token lists, the argmax tie order (cnt desc, a, b) on hex
    strings equals the engine's numeric order, and replace() applies
    the merge with BPE's exact leftmost-non-overlapping scan."""
    parts = [
        "WITH w0 AS MATERIALIZED (SELECT '|' || "
        "regexp_replace(hex(word), '([0-9A-F]{2})', '00\\1|', 'g') AS s, "
        "c FROM (SELECT word, count(*)::BIGINT AS c FROM "
        "(SELECT unnest(string_split(text, ' ')) AS word FROM documents) "
        "WHERE word <> '' GROUP BY word))"]
    for r in range(rounds):
        new_hex = f"{256 + r:04X}"
        parts.append(
            f"p{r} AS MATERIALIZED (SELECT tok[i] AS a, tok[i+1] AS b, "
            "sum(c)::BIGINT AS cnt FROM (SELECT "
            f"string_split(trim(s, '|'), '|') AS tok, c FROM w{r}) t, "
            "unnest(generate_series(1, len(tok) - 1)) AS u(i) "
            "GROUP BY 1, 2)")
        parts.append(
            f"b{r} AS MATERIALIZED (SELECT a, b, cnt FROM p{r} "
            "ORDER BY cnt DESC, a ASC, b ASC LIMIT 1)")
        if r + 1 < rounds:
            parts.append(
                f"w{r + 1} AS MATERIALIZED (SELECT replace(s, "
                f"'|' || (SELECT a FROM b{r}) || '|' || "
                f"(SELECT b FROM b{r}), '|{new_hex}') AS s, c FROM w{r})")
    selects = [
        f"SELECT {r}::BIGINT AS round, {_hex4_int('a')} AS tok_a, "
        f"{_hex4_int('b')} AS tok_b, {256 + r}::BIGINT AS new_id, "
        f"cnt FROM b{r}"
        for r in range(rounds)]
    return ", ".join(parts) + " " + " UNION ALL ".join(selects)


def q_domain_trajectories() -> str:
    """Twin of queries.q_domain_trajectories: same host regex, same
    1e-5 quantization; warc_ts is unique by construction so the
    ORDER BY us equals the engine's (us, url, lat5, lon5) tie
    order; HUGEINT moments, floor gyr."""
    import re

    from spapy_ray.stages.text import URL_PATTERN

    anon = re.sub(r"\?P<[a-z]+>", "", URL_PATTERN)
    return (
        f"WITH {geo_cte()}, "
        f"pts AS (SELECT regexp_extract(url, '{anon}', 2) AS host, "
        "epoch_us(warc_ts) AS us, "
        "CAST(round(lat * 100000.0) AS BIGINT) AS lat5, "
        "CAST(round(lon * 100000.0) AS BIGINT) AS lon5 FROM geo), "
        "w AS (SELECT host, lat5, lon5, "
        "lag(lat5) OVER o AS plat, lag(lon5) OVER o AS plon, "
        "first_value(lat5) OVER o AS flat, "
        "first_value(lon5) OVER o AS flon "
        "FROM pts WINDOW o AS (PARTITION BY host ORDER BY us)), "
        "agg AS (SELECT host, count(*)::HUGEINT AS n, "
        "sum(CASE WHEN plat IS NULL THEN 0 "
        "ELSE abs(lon5 - plon) + abs(lat5 - plat) END)::BIGINT "
        "AS l1_path, "
        "sum((lon5 - flon)::HUGEINT) AS sdx, "
        "sum((lat5 - flat)::HUGEINT) AS sdy, "
        "sum((lon5 - flon)::HUGEINT * (lon5 - flon) + "
        "(lat5 - flat)::HUGEINT * (lat5 - flat)) AS stot, "
        "any_value(flon) AS flon, any_value(flat) AS flat "
        "FROM w GROUP BY host), "
        "lastp AS (SELECT host, arg_max(lon5, us) AS llon, "
        "arg_max(lat5, us) AS llat FROM pts GROUP BY host) "
        "SELECT a.host, n::BIGINT AS n_points, l1_path, "
        "(abs(llon - flon) + abs(llat - flat))::BIGINT AS net_l1, "
        "((n * stot - sdx * sdx - sdy * sdy) // (n * n))::BIGINT "
        "AS gyr_q FROM agg a JOIN lastp USING (host)"
    )


# --- TPC-H completion batch (session-12) twins. Money convention
# everywhere: round(x*100)::BIGINT == np.rint on 2-dp values (no .5
# ties possible at 2 decimals x100).


def q_index_search(k: int = 20) -> str:
    """Twin of ranked boolean retrieval: \\b-bounded regex counts ==
    whitespace-token equality counts on the space-separated corpus;
    same (score DESC, doc_id) top-k."""
    tf = ", ".join(
        f"length(regexp_extract_all(text, '\\b{t}\\b'))::BIGINT "
        f"AS tf_{t}" for t in ("hash", "join", "filter"))
    return (
        f"WITH d AS (SELECT doc_id, {tf} FROM documents) "
        "SELECT doc_id, tf_hash, tf_join, tf_filter, "
        "(tf_hash + tf_join + tf_filter)::BIGINT AS score FROM d "
        "WHERE tf_hash > 0 AND tf_join > 0 AND tf_filter > 0 "
        f"ORDER BY score DESC, doc_id LIMIT {k}"
    )


def q_stay_points(radius: int = 20_000_000, min_pts: int = 2) -> str:
    """Twin of stay-point detection: lag window break flags, running
    sum = per-host segment ordinal (counting dropped segments, like
    the engine), GROUP BY segment HAVING n >= min_pts. warc_ts is
    unique so ORDER BY us is total."""
    import re

    from spapy_ray.stages.text import URL_PATTERN

    anon = re.sub(r"\?P<[a-z]+>", "", URL_PATTERN)
    return (
        f"WITH {geo_cte()}, "
        f"pts AS (SELECT regexp_extract(url, '{anon}', 2) AS host, "
        "epoch_us(warc_ts) AS us, "
        "CAST(round(lat * 100000.0) AS BIGINT) AS lat5, "
        "CAST(round(lon * 100000.0) AS BIGINT) AS lon5 FROM geo), "
        "w AS (SELECT host, us, lat5, lon5, "
        "lag(lat5) OVER o AS plat, lag(lon5) OVER o AS plon "
        "FROM pts WINDOW o AS (PARTITION BY host ORDER BY us)), "
        "b AS (SELECT host, us, lat5, lon5, "
        "CASE WHEN plat IS NULL OR abs(lat5 - plat) + "
        f"abs(lon5 - plon) > {radius} THEN 1 ELSE 0 END AS brk "
        "FROM w), "
        "s AS (SELECT host, us, lat5, lon5, sum(brk) OVER "
        "(PARTITION BY host ORDER BY us) AS seg FROM b) "
        "SELECT host, seg::BIGINT AS seg_id, count(*)::BIGINT AS "
        "n_points, (max(us) - min(us))::BIGINT AS dwell_us, "
        "sum(lon5)::BIGINT AS sum_x, sum(lat5)::BIGINT AS sum_y "
        f"FROM s GROUP BY host, seg HAVING count(*) >= {min_pts}"
    )


def q_domain_mix() -> str:
    """Twin of temperature mixing: floor(sqrt(n::DOUBLE)) == isqrt(n)
    for n < 2^52 (correctly-rounded sqrt of n < (k+1)^2 sits below
    k+1 by >= 1/(2(k+1)) >> half an ulp), same fnv hash order, same
    integer quota."""
    h = sql_fnv1a("doc_id::VARCHAR")
    return (
        "WITH c AS (SELECT source, count(*)::BIGINT AS n_d "
        "FROM documents GROUP BY 1), "
        "w AS (SELECT source, floor(sqrt(n_d::DOUBLE))::BIGINT AS w_d "
        "FROM c), "
        "tot AS (SELECT sum(w_d)::BIGINT AS ws, "
        "(SELECT count(*) // 4 FROM documents)::BIGINT AS nt FROM w), "
        "k AS (SELECT source, (nt * w_d) // ws AS k_d FROM w, tot), "
        f"hh AS (SELECT source, doc_id, {h} AS hv FROM documents), "
        "r AS (SELECT source, doc_id, row_number() OVER "
        "(PARTITION BY source ORDER BY hv, doc_id) AS rn FROM hh) "
        "SELECT r.source, r.doc_id, rn::BIGINT AS rn "
        "FROM r JOIN k USING (source) WHERE rn <= k_d"
    )


def q_ngram_diversity() -> str:
    """Twin of per-source shingle diversity: lead()-built 3-grams
    (same window as the cosine-pairs twin), COUNT(DISTINCT term) and
    COUNT(*) per source, integer ppm."""
    return (
        "WITH w AS (SELECT source, doc_id, "
        "generate_subscripts(string_split(text, ' '), 1) AS pos, "
        "unnest(string_split(text, ' ')) AS tok FROM documents), "
        "sh AS (SELECT source, tok || '_' "
        "|| lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) "
        "|| '_' "
        "|| lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) "
        "AS term FROM w), "
        "f AS (SELECT source, term FROM sh WHERE term IS NOT NULL) "
        "SELECT source, count(DISTINCT term)::BIGINT AS n_distinct, "
        "count(*)::BIGINT AS n_total, "
        "(1000000 * count(DISTINCT term)) // count(*) AS div_ppm "
        "FROM f GROUP BY 1"
    )


def q_heading_rose() -> str:
    """Twin of the compass rose: lag window steps, the same exact
    sign/abs sector CASE."""
    import re

    from spapy_ray.stages.text import URL_PATTERN

    anon = re.sub(r"\?P<[a-z]+>", "", URL_PATTERN)
    return (
        f"WITH {geo_cte()}, "
        f"pts AS (SELECT regexp_extract(url, '{anon}', 2) AS host, "
        "epoch_us(warc_ts) AS us, "
        "CAST(round(lat * 100000.0) AS BIGINT) AS lat5, "
        "CAST(round(lon * 100000.0) AS BIGINT) AS lon5 FROM geo), "
        "w AS (SELECT host, lon5 - lag(lon5) OVER o AS dx, "
        "lat5 - lag(lat5) OVER o AS dy, "
        "(lag(lon5) OVER o IS NULL) AS first "
        "FROM pts WINDOW o AS (PARTITION BY host ORDER BY us)), "
        "d AS (SELECT host, CASE "
        "WHEN dx = 0 AND dy = 0 THEN 'O' "
        "WHEN abs(dx) > abs(dy) THEN "
        "(CASE WHEN dx > 0 THEN 'E' ELSE 'W' END) "
        "WHEN abs(dy) > abs(dx) THEN "
        "(CASE WHEN dy > 0 THEN 'N' ELSE 'S' END) "
        "WHEN dy > 0 THEN (CASE WHEN dx > 0 THEN 'NE' ELSE 'NW' END) "
        "ELSE (CASE WHEN dx > 0 THEN 'SE' ELSE 'SW' END) END AS dir "
        "FROM w WHERE NOT first) "
        "SELECT host, dir, count(*)::BIGINT AS n FROM d GROUP BY 1, 2"
    )


def q_cms_hosts(k: int = 20) -> str:
    """Twin of the CMS audit: the sketch is deterministic, so SQL
    rebuilds the same matrix — per-host fnv, HUGEINT row hashes mod
    2^62 mod 256 (== the engine's mod-2^64 wrap; 256 | 2^62 | 2^64),
    cell sums, min-over-rows estimates for the same top-k."""
    import re

    from spapy_ray.stages.text import URL_PATTERN

    anon = re.sub(r"\?P<[a-z]+>", "", URL_PATTERN)
    fnv = sql_fnv1a("host")
    M62 = 1 << 62
    mults = ", ".join(f"({r}, {m})" for r, m in enumerate(
        (2654435761, 2246822519, 3266489917, 668265263)))
    return (
        f"WITH {pages_cte()}, "
        f"hl AS (SELECT regexp_extract(url, '{anon}', 2) AS host "
        "FROM pages), "
        f"hh AS (SELECT host, count(*)::BIGINT AS n, ({fnv}) AS f "
        "FROM hl GROUP BY host), "
        f"m(r, mult) AS (SELECT * FROM (VALUES {mults})), "
        "cm AS (SELECT r, ((f::HUGEINT * mult) % "
        f"{M62}) % 256 AS c, sum(n)::BIGINT AS cnt "
        "FROM hh CROSS JOIN m GROUP BY 1, 2), "
        "top AS (SELECT host, n, f FROM hh "
        f"ORDER BY n DESC, host LIMIT {k}) "
        "SELECT t.host, t.n AS true_n, min(cm.cnt)::BIGINT AS est_n "
        "FROM top t CROSS JOIN m "
        "JOIN cm ON cm.r = m.r AND cm.c = "
        f"((t.f::HUGEINT * m.mult) % {M62}) % 256 "
        "GROUP BY 1, 2"
    )


def q_vocab_drift(k: int = 15) -> str:
    """Twin of vocabulary drift: unnest token counts per half, same
    signed cross-product, same (|dnum| desc, term) top-k."""
    return (
        "WITH w AS (SELECT doc_id % 2 AS side, "
        "unnest(string_split(text, ' ')) AS term FROM documents), "
        "c AS (SELECT term, "
        "sum(CASE WHEN side = 0 THEN 1 ELSE 0 END)::BIGINT AS a, "
        "sum(CASE WHEN side = 1 THEN 1 ELSE 0 END)::BIGINT AS b "
        "FROM w GROUP BY 1), "
        "t AS (SELECT sum(a)::BIGINT AS ta, sum(b)::BIGINT AS tb "
        "FROM c) "
        "SELECT term, a, b, (a * tb - b * ta)::BIGINT AS dnum "
        "FROM c, t "
        f"ORDER BY abs(a * tb - b * ta) DESC, term LIMIT {k}"
    )


def q_source_distinct_hll(p: int = 8) -> str:
    """Twin of grouped HLL: fnv(text) → the hll mix in HUGEINT →
    per-(source, reg) max rho over the DENSE register range → exact
    big-integer harmonic estimate per source; exact distinct rides
    along."""
    from spapy_ray.stages.relational import HLL_MIX_A, HLL_MIX_B

    m = 1 << p
    rb = 64 - p
    m64 = "18446744073709551616"
    fnv = sql_fnv1a("text")
    return (
        f"WITH x AS (SELECT source, ({fnv}) AS v FROM documents), "
        f"h1 AS (SELECT source, ((xor(v, v >> 33)::HUGEINT * "
        f"{HLL_MIX_A}::HUGEINT) % {m64})::UBIGINT AS h FROM x), "
        f"h2 AS (SELECT source, ((xor(h, h >> 29)::HUGEINT * "
        f"{HLL_MIX_B}::HUGEINT) % {m64})::UBIGINT AS h FROM h1), "
        "hf AS (SELECT source, xor(h, h >> 32) AS h FROM h2), "
        f"r AS (SELECT source, (h >> {rb})::BIGINT AS reg, "
        f"CASE WHEN (h % (1::UBIGINT << {rb})) = 0 THEN {rb + 1} "
        f"ELSE strpos(lpad(bin(h % (1::UBIGINT << {rb})), {rb}, "
        "'0'), '1') END::BIGINT AS rho FROM hf), "
        "mx AS (SELECT source, reg, max(rho) AS rho FROM r "
        "GROUP BY 1, 2), "
        "srcs AS (SELECT DISTINCT source FROM x), "
        f"allr AS (SELECT source, pp::BIGINT AS reg FROM srcs "
        f"CROSS JOIN range({m}) t(pp)), "
        "j AS (SELECT allr.source, allr.reg, "
        "coalesce(mx.rho, 0)::BIGINT AS rho FROM allr "
        "LEFT JOIN mx USING (source, reg)), "
        f"d AS (SELECT source, sum(1::HUGEINT << ({rb + 1} - rho)) "
        "AS den FROM j GROUP BY 1), "
        "ex AS (SELECT source, count(DISTINCT v)::BIGINT AS n_exact "
        "FROM x GROUP BY 1) "
        f"SELECT d.source, (({m * m}::HUGEINT << {rb + 1}) "
        "// d.den)::BIGINT AS est_q, ex.n_exact "
        "FROM d JOIN ex USING (source)"
    )


def q_top_hosts_rescore(k: int = 20) -> str:
    """Twin of sketch-then-rescore top-k: the engine certifies
    exactness, so the twin is the plain exact top-k."""
    import re

    from spapy_ray.stages.text import URL_PATTERN

    anon = re.sub(r"\?P<[a-z]+>", "", URL_PATTERN)
    return (
        f"WITH {pages_cte()}, "
        f"h AS (SELECT regexp_extract(url, '{anon}', 2) AS host "
        "FROM pages), "
        "c AS (SELECT host, count(*)::BIGINT AS n FROM h GROUP BY 1) "
        "SELECT host, n, row_number() OVER (ORDER BY n DESC, host)"
        f"::BIGINT AS rank FROM c ORDER BY rank LIMIT {k}"
    )


def q_weighted_doc_sample(k: int = 100) -> str:
    """Twin of the deterministic weighted sample: same fnv >> 1 (into
    int64 range), same integer quotient priority, same total order."""
    h = sql_fnv1a("doc_id::VARCHAR")
    return (
        "WITH p AS (SELECT doc_id::BIGINT AS doc_id, "
        "n_chars::BIGINT AS n_chars, "
        f"(({h}) >> 1)::BIGINT // greatest(n_chars, 1) "
        "AS priority_q FROM documents) "
        "SELECT doc_id, n_chars, priority_q FROM p "
        f"ORDER BY priority_q, doc_id LIMIT {k}"
    )


def q_crawl_politeness() -> str:
    """Twin of the politeness audit: lag gaps per host, ranked
    two-middle median."""
    import re

    from spapy_ray.stages.text import URL_PATTERN

    anon = re.sub(r"\?P<[a-z]+>", "", URL_PATTERN)
    return (
        f"WITH {pages_cte()}, "
        f"p AS (SELECT regexp_extract(url, '{anon}', 2) AS host, "
        "epoch_us(warc_ts) AS us FROM pages), "
        "w AS (SELECT host, us - lag(us) OVER "
        "(PARTITION BY host ORDER BY us) AS gap FROM p), "
        "g AS (SELECT host, gap FROM w WHERE gap IS NOT NULL), "
        "rk AS (SELECT host, gap, row_number() OVER "
        "(PARTITION BY host ORDER BY gap) - 1 AS rn, "
        "count(*) OVER (PARTITION BY host) AS cnt FROM g) "
        "SELECT host, max(cnt)::BIGINT AS n_gaps, "
        "min(gap)::BIGINT AS min_gap_us, "
        "(sum(CASE WHEN rn = (cnt - 1) // 2 THEN gap ELSE 0 END) + "
        "sum(CASE WHEN rn = cnt // 2 THEN gap ELSE 0 END))::BIGINT "
        "AS med_gap_x2 FROM rk GROUP BY 1"
    )


def q_host_zone_affinity() -> str:
    """Twin of host→zone affinity: PIP join CTE, plurality via
    ranked window with the same tie order, integer ppm."""
    import re

    from spapy_ray.stages.text import URL_PATTERN

    anon = re.sub(r"\?P<[a-z]+>", "", URL_PATTERN)
    return (
        f"WITH {join_cte()}, "
        f"hz AS (SELECT regexp_extract(url, '{anon}', 2) AS host, "
        "zone_id FROM joined), "
        "c AS (SELECT host, zone_id, count(*)::BIGINT AS n FROM hz "
        "GROUP BY 1, 2), "
        "r AS (SELECT host, zone_id, n, row_number() OVER "
        "(PARTITION BY host ORDER BY n DESC, zone_id) AS rn, "
        "sum(n) OVER (PARTITION BY host) AS tot FROM c) "
        "SELECT host, tot::BIGINT AS n_pages, "
        "zone_id::BIGINT AS top_zone, n AS top_n, "
        "(1000000 * n) // tot::BIGINT AS share_ppm "
        "FROM r WHERE rn = 1"
    )
