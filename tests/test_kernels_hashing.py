import duckdb
import numpy as np
import pyarrow as pa

from spapy_ray.kernels import hashing


def test_scalar_known_values():
    # FNV-1a 64 published test vectors
    assert hashing.fnv1a64_scalar("") == 0xCBF29CE484222325
    assert hashing.fnv1a64_scalar("a") == 0xAF63DC4C8601EC8C
    assert hashing.fnv1a64_scalar("foobar") == 0x85944171F73967E8


def test_vectorized_matches_scalar():
    strs = ["", "a", "foobar", "https://site42.example/page123",
            "x" * 100, "yy", "https://site0.example/page0"]
    got = hashing.fnv1a64(pa.array(strs))
    expected = np.array([hashing.fnv1a64_scalar(s) for s in strs], dtype=np.uint64)
    assert (got == expected).all()


def test_large_string_and_chunked():
    strs = ["alpha", "beta", "gamma"]
    got = hashing.fnv1a64(pa.array(strs, type=pa.large_string()))
    expected = np.array([hashing.fnv1a64_scalar(s) for s in strs], dtype=np.uint64)
    assert (got == expected).all()
    ch = pa.chunked_array([pa.array(strs[:2]), pa.array(strs[2:])])
    assert (hashing.fnv1a64(ch) == expected).all()


def test_sliced_array():
    arr = pa.array(["aaa", "bbb", "ccc", "ddd"]).slice(1, 2)
    got = hashing.fnv1a64(arr)
    expected = np.array([hashing.fnv1a64_scalar(s) for s in ["bbb", "ccc"]], dtype=np.uint64)
    assert (got == expected).all()


def test_sql_fnv_matches():
    strs = ["a", "foobar", "https://site42.example/page123", "zz9"]
    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame({"s": strs}))
    got = con.execute(f"SELECT {hashing.sql_fnv1a('s')} AS h FROM t").fetchnumpy()["h"]
    expected = np.array([hashing.fnv1a64_scalar(s) for s in strs], dtype=np.uint64)
    assert (got.astype(np.uint64) == expected).all()


def test_sql_fnv_matches_unicode():
    """The SQL twin folds over UTF-8 bytes — exact for non-ASCII too
    (ADVICE r1: the round-1 twin hashed codepoints)."""
    import duckdb

    from spapy_ray.kernels.hashing import fnv1a64_scalar, sql_fnv1a

    con = duckdb.connect()
    for s in ["héllo wörld", "日本語テキスト", "emoji 🎉 test", "ünïcødé", ""]:
        got = con.sql(f"SELECT {sql_fnv1a(repr(s))} AS h").fetchone()[0]
        assert int(got) == fnv1a64_scalar(s), s
