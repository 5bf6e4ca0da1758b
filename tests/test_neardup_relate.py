"""MinHash/LSH/SimHash near-dup + dataset relates/clip (shared Ray)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from spapy_ray.kernels import clip, geom, wkb
from spapy_ray.sources.zones import zones_table


def _docs_with_dups():
    """60 docs: 20 base texts; docs 40..59 are near-dups of 0..19
    (one token changed); plus exact dups of 0..4."""
    rng = np.random.default_rng(13)
    words = [f"w{i}" for i in range(200)]
    base = [" ".join(rng.choice(words, 30)) for _ in range(20)]
    texts = list(base)
    texts += [" ".join(rng.choice(words, 30)) for _ in range(15)]  # 20..34 unique
    texts += [base[i] for i in range(5)]                            # 35..39 exact dups
    for i in range(20):                                             # 40..59 near dups
        w = base[i].split(" ")
        w[7] = "CHANGED"
        texts.append(" ".join(w))
    return pd.DataFrame({"key": [f"d{i}" for i in range(len(texts))],
                         "text": texts})


def test_minhash_identical_texts_same_signature(ray_session):
    import ray.data as rd

    from spapy_ray.stages.neardup import minhash_signatures

    df = _docs_with_dups()
    out = minhash_signatures(rd.from_pandas(df), num_hashes=8).to_pandas()
    out = out.set_index("key")
    for i in range(5):
        a, b = out.loc[f"d{i}"], out.loc[f"d{35 + i}"]
        for s in range(8):
            assert a[f"sig{s}"] == b[f"sig{s}"]


def test_lsh_finds_planted_near_dups(ray_session):
    import ray.data as rd

    from spapy_ray.stages.neardup import jaccard, near_dup_pairs

    df = _docs_with_dups()
    pairs = near_dup_pairs(rd.from_pandas(df), key_col="key",
                           num_hashes=16, bands=8, threshold=0.7).to_pandas()
    got = {frozenset(p) for p in zip(pairs["key_a"], pairs["key_b"])}
    # every exact dup pair must be found (all bands collide)
    for i in range(5):
        assert frozenset((f"d{i}", f"d{35 + i}")) in got
    # most planted near-dups (jaccard ~0.8) should be found
    found_near = sum(frozenset((f"d{i}", f"d{40 + i}")) in got for i in range(20))
    assert found_near >= 16
    # no false positives below threshold
    for a, b, j in zip(pairs["key_a"], pairs["key_b"], pairs["jacc"]):
        ia, ib = int(a[1:]), int(b[1:])
        ta = df.set_index("key").loc[a, "text"]
        tb = df.set_index("key").loc[b, "text"]
        assert jaccard(ta, tb) >= 0.7


def test_near_dup_join_verify_matches_broadcast(ray_session):
    """The co-partitioned double-join verify path must return the
    exact same pair set + jaccard values as the broadcast path."""
    import ray.data as rd

    from spapy_ray.stages.neardup import near_dup_pairs

    df = _docs_with_dups()

    def run(mode):
        out = near_dup_pairs(rd.from_pandas(df), key_col="key",
                             num_hashes=16, bands=8, threshold=0.7,
                             verify=mode).to_pandas()
        return out.sort_values(["key_a", "key_b"]).reset_index(drop=True)

    bc, jn = run("broadcast"), run("join")
    assert len(bc) == len(jn) > 0
    pd.testing.assert_frame_equal(bc, jn[bc.columns])


def test_near_dup_empty_candidates_no_crash(ray_session):
    """A duplicate-free corpus yields zero LSH candidates; the stage
    must return an empty typed result, not ArrowTypeError (ADVICE r2)."""
    import ray.data as rd

    from spapy_ray.stages.neardup import near_dup_pairs

    rng = np.random.default_rng(99)
    words = [f"u{i}" for i in range(5000)]
    texts = [" ".join(rng.choice(words, 30, replace=False)) for _ in range(40)]
    df = pd.DataFrame({"key": [f"k{i}" for i in range(40)], "text": texts})
    out = near_dup_pairs(rd.from_pandas(df), key_col="key",
                         num_hashes=16, bands=4, threshold=0.9)
    assert out.count() == 0
    assert out.schema().names == ["key_a", "key_b", "jacc"]


def test_simhash_near_dup_small_hamming(ray_session):
    import ray.data as rd

    from spapy_ray.stages.neardup import hamming64, simhash

    df = _docs_with_dups()
    out = simhash(rd.from_pandas(df)).to_pandas().set_index("key")
    h = lambda k: np.array([out.loc[k, "simhash"]], dtype=np.uint64)
    # exact dup: distance 0
    assert hamming64(h("d0"), h("d35"))[0] == 0
    # near dup: small distance; unrelated: larger
    near = hamming64(h("d3"), h("d43"))[0]
    far = hamming64(h("d3"), h("d25"))[0]
    assert near < far


def test_point_semi_anti_join(ray_session):
    import ray.data as rd

    from spapy_ray.pipelines.flagship import pages_dataset
    from spapy_ray.stages.geocode import geocode
    from spapy_ray.stages.join import pip_join
    from spapy_ray.stages.relate import point_semi_join

    geo = geocode(pages_dataset(n=2000, include_html=False))
    semi = point_semi_join(geo, zones_table()).to_pandas()
    anti = point_semi_join(geo, zones_table(), anti=True).to_pandas()
    assert len(semi) + len(anti) == 2000
    joined = pip_join(geo, zones_table(), left_columns=["url", "warc_ts"],
                      zone_columns=["zone_id"]).to_pandas()
    assert set(semi["url"]) == set(joined["url"])
    assert set(anti["url"]).isdisjoint(set(joined["url"]))


def test_relate_exists_and_column(ray_session):
    import ray.data as rd

    from spapy_ray.stages.relate import relate_column, relate_exists

    zds = rd.from_arrow(zones_table(20))
    # a polygon covering everything intersects some zone
    world = wkb.encode_polygon([clip.bbox_ring(-180, -85, 180, 85)])
    assert relate_exists(zds, world, "intersects") is True
    nowhere = wkb.encode_polygon([clip.bbox_ring(500, 500, 510, 510)])
    assert relate_exists(zds, nowhere, "intersects") is False
    col = relate_column(zds, world, "intersects").to_pandas()
    assert col["intersects"].all()


def test_clip_to_stage(ray_session):
    import ray.data as rd

    from spapy_ray.stages.relate import clip_to
    from spapy_ray.stages.vector_ops import measures

    box = wkb.encode_polygon([clip.bbox_ring(-50.0, -40.0, 60.0, 50.0)])
    out = measures(clip_to(rd.from_arrow(zones_table(100)), box)).to_pandas()
    assert len(out) > 0
    assert (out["minx"] >= -50.0).all() and (out["maxx"] <= 60.0).all()
    assert (out["miny"] >= -40.0).all() and (out["maxy"] <= 50.0).all()
    # total clipped area equals sum over zones of (zone ∩ box) computed
    # serially with the same kernel (stage == kernel composition)
    total = 0.0
    for g in zones_table(100).column("geom_wkb").to_pylist():
        mp = wkb.as_multipolygon(g)
        res = clip.clip_multipolygon_convex(mp, clip.bbox_ring(-50, -40, 60, 50))
        if res:
            total += geom.multipolygon_area(res)
    assert out["area"].sum() == pytest.approx(total)


def test_pip_join_cells_matches_broadcast(ray_session):
    import ray.data as rd

    from spapy_ray.pipelines.flagship import pages_dataset
    from spapy_ray.stages.geocode import geocode
    from spapy_ray.stages.join import pip_join, pip_join_cells

    geo = geocode(pages_dataset(n=3000, include_html=False))
    bc = pip_join(geo, zones_table(), left_columns=["url"],
                  zone_columns=["zone_id"]).to_pandas()
    for salt in (1, 3):
        cc = pip_join_cells(geo, rd.from_arrow(zones_table()), res=4,
                            salt=salt).to_pandas()
        assert set(zip(bc["url"], bc["zone_id"])) == \
            set(zip(cc["pkey"], cc["zkey"]))


def test_ngram_counts_trigram_boundary_mask(ray_session):
    """Trigrams never straddle documents; <n-token docs emit none."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from spapy_ray.stages.text import ngram_counts

    df = pd.DataFrame({"text": [
        "a b c d", "a b", "x", "", "b c d", "a b c"]})
    got = ngram_counts(rd.from_pandas(df), n=3).to_pandas() \
        .sort_values("gram").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(
        "WITH g AS (SELECT unnest(list_transform(range(1, len(toks) - 1), "
        "j -> toks[j] || ' ' || toks[j+1] || ' ' || toks[j+2])) AS gram "
        "FROM (SELECT string_split(text, ' ') AS toks FROM documents)) "
        "SELECT gram, count(*)::BIGINT AS n FROM g GROUP BY gram "
        "ORDER BY gram").df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_pairwise_jaccard_explicit_candidates(ray_session):
    """pairwise_jaccard scores an explicit pair list exactly and
    drops pairs whose key is absent (inner semantics)."""
    import ray.data as rd

    from spapy_ray.stages.neardup import jaccard, pairwise_jaccard

    df = _docs_with_dups()
    df["key"] = np.arange(len(df), dtype=np.int64)
    ds = rd.from_pandas(df)
    cand = rd.from_items([
        {"key_a": 0, "key_b": 35},    # exact dup -> 1.0
        {"key_a": 0, "key_b": 40},    # near dup
        {"key_a": 0, "key_b": 21},    # unrelated
        {"key_a": 0, "key_b": 999},   # absent key -> dropped
    ])
    out = pairwise_jaccard(ds, cand, key_col="key").to_pandas()
    out = out.set_index(["key_a", "key_b"])["jacc"]
    assert len(out) == 3 and (0, 999) not in out.index
    assert out[(0, 35)] == 1.0
    texts = df.set_index("key")["text"]
    assert out[(0, 40)] == jaccard(texts[0], texts[40])
    assert out[(0, 21)] == jaccard(texts[0], texts[21])


def test_cosine_threshold_pairs_matches_bruteforce(ray_session):
    """cosine_threshold_pairs == the numpy all-pairs set, across a
    block boundary (repartition forces multiple block-pair tasks)."""
    import ray.data as rd

    from spapy_ray.stages.ann import cosine_threshold_pairs

    rng = np.random.default_rng(7)
    E = rng.standard_normal((300, 16))
    E[150:] = E[:150] + rng.standard_normal((150, 16)) * 0.05  # planted
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    S = En @ En.T
    iu = np.triu_indices(300, 1)
    thr = 0.9
    want = {(int(a), int(b)) for a, b in zip(*[x[S[iu] >= thr]
            for x in (iu[0], iu[1])])}
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(300, dtype=np.int64)),
        "embedding": pa.array(list(E.astype(np.float64)),
                              type=pa.list_(pa.float64()))}))
    got = cosine_threshold_pairs(ds, threshold=thr,
                                 target_rows_per_block=64).to_pandas()
    got_set = {(int(a), int(b)) for a, b in zip(got.key_a, got.key_b)}
    assert got_set == want and len(want) >= 100


def test_ngram_overlap_dups_brute_force_parity(ray_session):
    import ray.data as rd

    from spapy_ray.stages.neardup import ngram_overlap_dups

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(12)]
    texts = [" ".join(rng.choice(vocab, size=int(m)))
             for m in rng.integers(2, 40, size=60)]
    # plant: doc 50 copies a 10-token span of doc 3 inside noise
    span = texts[3].split()[:10]
    if len(span) >= 8:
        texts[50] = " ".join(["zz1", "zz2", *span, "zz3"])
    ds = rd.from_items([{"doc_id": i, "text": t}
                        for i, t in enumerate(texts)])
    got = ngram_overlap_dups(ds, n=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    # brute force
    def grams(t):
        w = t.split()
        return {" ".join(w[j:j + 4]) for j in range(len(w) - 3)}

    owner: dict[str, int] = {}
    for i, t in enumerate(texts):
        for g in sorted(grams(t)):
            owner.setdefault(g, i)
    rows = []
    for i, t in enumerate(texts):
        dup = [owner[g] for g in grams(t) if owner[g] < i]
        if dup:
            rows.append({"doc_id": i, "n_dup_grams": len(dup),
                         "first_owner": min(dup)})
    exp = pd.DataFrame(rows).sort_values("doc_id").reset_index(drop=True)
    assert len(exp) > 0
    pd.testing.assert_frame_equal(
        got.astype("int64"), exp.astype("int64"))


def test_ngram_overlap_short_docs_never_flagged(ray_session):
    import ray.data as rd

    from spapy_ray.stages.neardup import ngram_overlap_dups

    ds = rd.from_items([{"doc_id": 0, "text": "a b c"},
                        {"doc_id": 1, "text": "a b c"},
                        {"doc_id": 2, "text": "a b c d e f g h"},
                        {"doc_id": 3, "text": "a b c d e f g h"}])
    out = ngram_overlap_dups(ds, n=8).to_pandas()
    # docs 0/1 have < 8 tokens -> no gram; doc 3 duplicates doc 2's
    # single 8-gram
    assert out.to_dict("records") == [
        {"doc_id": 3, "n_dup_grams": 1, "first_owner": 2}]


def test_random_projection_preserves_cosine_roughly(ray_session):
    # JL property smoke: identical vectors project identically;
    # orthogonal-ish vectors stay far. Plus exact brute parity.
    import ray.data as rd

    from spapy_ray.kernels.hashing import fnv1a64_scalar
    from spapy_ray.stages.ann import random_projection

    rng = np.random.default_rng(4)
    emb = rng.normal(size=(40, 16)).astype(np.float32)
    emb[7] = emb[3]
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(40, dtype=np.int64),
        "embedding": [list(map(float, v)) for v in emb]}))
    got = random_projection(ds, out_dim=4).to_pandas() \
        .sort_values(["vec_id", "j"]).reset_index(drop=True)

    signs = np.array([[1 if fnv1a64_scalar(f"rp:{i}:{j}") & 1 else -1
                       for j in range(4)] for i in range(16)],
                     dtype=np.int64)
    e_int = np.round(emb.astype(np.float64) * 1_000_000) \
        .astype(np.int64)
    y = e_int @ signs
    exp = pd.DataFrame({
        "vec_id": np.repeat(np.arange(40, dtype=np.int64), 4),
        "j": np.tile(np.arange(4, dtype=np.int64), 40),
        "y": y.ravel()})
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  exp.astype("int64"))
    y3 = y[3]
    y7 = y[7]
    assert (y3 == y7).all()
