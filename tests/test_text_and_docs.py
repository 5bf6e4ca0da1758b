

def test_pii_scrub_planted(ray_session):
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from spapy_ray.stages.text import pii_scrub
    from spapy_ray import oracle as o

    docs = pd.DataFrame({"doc_id": list(range(6)), "text": [
        "contact me at jane.doe+spam@example.co.uk for details",
        "server at 192.168.0.1 and 8.8.8.8 responded",
        "call +1-555-123-4567 or 020 7946 0958 now",
        "no pii here at all just words",
        "mixed: bob@x.io from 10.0.0.255 dials +44 20 7946 0958",
        "",
    ]})
    got = pii_scrub(rd.from_pandas(docs)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute(o.q_docs_pii_scrub()).fetchdf() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(got["text"]) == list(want["text"])  # byte-identical
    joined = " ".join(got["text"])
    assert "[EMAIL]" in joined and "[IP]" in joined and "[PHONE]" in joined
    assert "@" not in joined and "192.168" not in joined


def test_tfidf_top_terms_brute_force_parity(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from spapy_ray.stages.text import tfidf_top_terms

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(20)]
    rows = [{"doc_id": i, "lang": ("en", "de")[i % 2],
             "text": " ".join(rng.choice(vocab, size=int(m)))}
            for i, m in enumerate(rng.integers(3, 30, size=40))]
    ds = rd.from_items(rows)
    got = tfidf_top_terms(ds, n_docs=40, group_col="lang", k=5,
                          idf_scale=1000).to_pandas()
    got = got.sort_values(["lang", "rank"]).reset_index(drop=True)

    # brute force
    from collections import Counter
    tf: Counter = Counter()
    df_: Counter = Counter()
    for r in rows:
        toks = r["text"].split()
        for t in toks:
            tf[(r["lang"], t)] += 1
        for t in set(toks):
            df_[t] += 1
    scored = [(lang, t, c, df_[t], c * ((40 * 1000) // df_[t]))
              for (lang, t), c in tf.items()]
    exp_rows = []
    for lang in ("de", "en"):
        grp = sorted([s for s in scored if s[0] == lang],
                     key=lambda s: (-s[4], s[1]))[:5]
        exp_rows += [{"lang": lang, "term": t, "tf": c, "df": d,
                      "score": sc, "rank": i + 1}
                     for i, (_, t, c, d, sc) in enumerate(grp)]
    exp = pd.DataFrame(exp_rows).sort_values(["lang", "rank"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns], exp,
                                  check_dtype=False)
    assert got["score"].dtype == np.int64


def test_unigram_surprisal_brute_force(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from spapy_ray.stages.text import unigram_surprisal

    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(15)]
    rows = [{"doc_id": i,
             "text": " ".join(rng.choice(vocab, size=int(m)))}
            for i, m in enumerate(rng.integers(1, 25, size=30))]
    got = unigram_surprisal(rd.from_items(rows)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    from collections import Counter
    cnt: Counter = Counter()
    for r in rows:
        cnt.update(r["text"].split())
    total = sum(cnt.values())
    exp_rows = []
    for r in rows:
        toks = r["text"].split()
        exp_rows.append({
            "doc_id": r["doc_id"], "n_tokens": len(toks),
            "surprisal": sum((total * 1000) // cnt[t] for t in toks)})
    exp = pd.DataFrame(exp_rows)
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  exp.astype("int64"))


def test_bigram_pmi_brute_force(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from spapy_ray.stages.text import bigram_pmi

    rng = np.random.default_rng(29)
    vocab = [f"w{i}" for i in range(10)]
    texts = [" ".join(rng.choice(vocab, size=20)) for _ in range(40)]
    # plant a strong collocation
    texts += [("qq zz " * 10).strip()] * 3
    got = bigram_pmi(rd.from_items([{"text": t} for t in texts]),
                     k=10, min_count=3).to_pandas()

    from collections import Counter
    uni: Counter = Counter()
    big: Counter = Counter()
    for t in texts:
        toks = t.split(" ")          # literal split, like the engine
        uni.update(toks)
        big.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    rows = []
    for g, c_ab in big.items():
        if c_ab < 3:
            continue
        a, b = g.split()
        rows.append((g, c_ab, uni[a], uni[b],
                     c_ab * 1_000_000 // uni[a] * 1_000_000 // uni[b]))
    exp = pd.DataFrame(rows, columns=["gram", "c_ab", "c_a", "c_b",
                                      "score"]) \
        .sort_values(["score", "gram"], ascending=[False, True]) \
        .head(10).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype({"score": "int64"}),
        exp.astype({"score": "int64"}), check_dtype=False)
    assert got.iloc[0]["gram"] in ("qq zz", "zz qq")


def test_stopword_strip_fp_adversarial(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from spapy_ray.kernels.hashing import fnv1a64_scalar
    from spapy_ray.stages.text import stopword_strip_fp

    texts = [
        "the quick a fox",          # interior stopwords
        "the the the",              # all stopwords -> empty
        "a",                        # single stopword
        "naïve café the señor",     # non-ASCII survives byte-exact
        "x  y the  z",              # pre-existing double spaces
        "keep these words",         # no stopwords
        "",                         # empty text
    ]
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64),
         "text": texts}), override_num_blocks=3)
    got = stopword_strip_fp(ds, stopwords=("the", "a")) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)

    import re

    def ref(t):
        toks = t.split(" ")
        blank = ["" if x in ("the", "a") else x for x in toks]
        st = re.sub(" +", " ", " ".join(blank)).strip(" ")
        kept = sum(1 for x in toks if x not in ("the", "a"))
        h = fnv1a64_scalar(st)
        return (len(toks), kept,
                h - (1 << 64) if h >= (1 << 63) else h)

    exp = pd.DataFrame([ref(t) for t in texts],
                       columns=["n_tok", "n_kept", "fp"])
    exp.insert(0, "doc_id", np.arange(len(texts), dtype=np.int64))
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  exp.astype("int64"))


def test_lineitem_regr_closed_form(ray_session):
    # exact known line: y = 3x + 5 -> slope_q = 3e6, icept_q = 5e6
    import numpy as np
    import pandas as pd

    x = np.arange(1, 50)
    df = pd.DataFrame({
        "l_returnflag": ["A"] * len(x), "l_linestatus": ["O"] * len(x),
        "l_quantity": x.astype(float),
        "l_extendedprice": (3 * x + 5) / 100.0})
    import tempfile, os
    d = tempfile.mkdtemp()
    df.to_parquet(os.path.join(d, "lineitem.parquet"))
    from spapy_ray.pipelines.queries import q_lineitem_regr
    out = q_lineitem_regr(d)
    assert out.iloc[0]["slope_q"] == 3_000_000
    assert out.iloc[0]["icept_q"] == 5_000_000


def test_winnow_planted_overlap_shares_fingerprint(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from spapy_ray.stages.text import winnow_batch

    rng = np.random.default_rng(2)

    def rand_text(n):
        return "".join(chr(c) for c in rng.integers(97, 123, n))

    shared = rand_text(64)   # >= w + k - 1 = 8 + 16 - 1 guarantees
    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [rand_text(200) + shared + rand_text(150),
                 rand_text(90) + shared + rand_text(300),
                 rand_text(250),
                 "tiny"]})
    t = winnow_batch(pa.Table.from_pandas(docs, preserve_index=False))
    out = t.to_pandas()
    # fingerprint SETS via a scalar reference
    def ref_fps(s):
        bs = s.encode()
        if len(bs) < 8:
            h = 0
            for b in bs:
                h = (h * 1000003 + b) % (1 << 64)
            return {h}
        hs = []
        for i in range(len(bs) - 7):
            h = 0
            for b in bs[i:i + 8]:
                h = (h * 1000003 + b) % (1 << 64)
            hs.append(h)
        if len(hs) <= 16:
            return {min(hs)}
        return {min(hs[j:j + 16]) for j in range(len(hs) - 15)}

    sets = [ref_fps(s) for s in docs["text"]]
    assert sets[0] & sets[1], "winnowing guarantee violated in ref"
    for i in range(4):
        x = 0
        for f in sets[i]:
            x ^= f
        assert out["n_fp"].iloc[i] == len(sets[i])
        assert out["fp_hi"].iloc[i] == x >> 32
        assert out["fp_lo"].iloc[i] == x & 0xFFFFFFFF


def test_bpe_train_merges_matches_sequential_reference(ray_session):
    """Distributed BPE == sequential reference (Sennrich-style):
    overlapping pair counts, (cnt desc, pair asc) argmax, leftmost
    non-overlapping apply — incl. aa-chains where the run-parity
    trick matters."""
    import pandas as pd
    import ray.data as rd

    from spapy_ray.stages.text import bpe_train_merges

    docs = pd.DataFrame({"text": [
        "aaaa aaa ab abab bb aa",
        "banana bandana ananas",
        "aaaa aaaa banana",
        "",
        "  double  spaces  collapse ",
    ]})

    def seq_bpe(texts, rounds):
        from collections import Counter
        wc = Counter(w for t in texts for w in t.split(" ") if w != "")
        words = {w: list(w.encode()) for w in wc}
        merges = []
        for r in range(rounds):
            pc_ = Counter()
            for w, toks in words.items():
                for i in range(len(toks) - 1):
                    pc_[(toks[i], toks[i + 1])] += wc[w]
            if not pc_:
                break
            best = min(pc_.items(), key=lambda kv: (-kv[1], kv[0]))
            (a, b), cnt = best
            new_id = 256 + r
            merges.append((r, a, b, new_id, cnt))
            for w, toks in words.items():
                out, i = [], 0
                while i < len(toks):
                    if i + 1 < len(toks) and toks[i] == a and \
                            toks[i + 1] == b:
                        out.append(new_id)
                        i += 2
                    else:
                        out.append(toks[i])
                        i += 1
                words[w] = out
        return pd.DataFrame(merges, columns=["round", "tok_a", "tok_b",
                                             "new_id", "cnt"])

    got = bpe_train_merges(rd.from_pandas(docs), rounds=6)
    want = seq_bpe(docs["text"].tolist(), 6)
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"))
