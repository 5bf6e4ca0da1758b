"""Deterministic Common-Crawl-style page table (the engine's primary
input, per BASELINE.json input_hint):

    url:string  warc_ts:timestamp[us]  html:binary  text:string  lang:string

No external data: pages are synthesized from the row index with pure
integer arithmetic (multiplicative mixing, fixed-point coordinates), so
the *exact same table* is expressible as a DuckDB SQL CTE
(:func:`sql_pages_cte`) — the driver's correctness oracle recomputes it
independently.

Spec (i = row index, N rows; all ops are exact integer math):

    M        = max(1, N*7 // 10)        # distinct page keys → ~30% dup urls
    key      = i % M                     # rows i and i+M are the same page
    g        = (key * 2654435761) % 2**32
    url      = 'https://site{key%1000}.example/page{key}'
    warc_ts  = 2020-01-01T00:00:00Z + i seconds   (dups differ only here)
    lang     = ('en','es','de','fr','pt')[key % 5]
    has_geo  = g % 10 < 3                # ~30% carry a text coordinate
    lat5     = (g % 1700000)*10 + 5 - 8500000          # 1e-5 deg, last digit 5
    lon5     = ((g // 1700000) % 3600000)*10 + 5 - 18000000
    text     = 'doc {key} tok{key*7919%997} tok{key*104729%997}'
               ' lorem ipsum dolor sit amet'
               [' geo: {lat5/1e5:.5f},{lon5/1e5:.5f}' if has_geo]
               ' consectetur adipiscing elit'
    html     = b'<html><head><title>page {key}</title></head><body>'
               + text + b'</body></html>'

The trailing-5 fixed-point trick guarantees no coordinate ever lies on
a zone boundary (zones use 1e-4 fixed point — FIXTURES.md).
Because text is a pure function of ``key`` (= of ``url``), duplicate
urls carry byte-identical text, which is what makes the per-row
"byte-identical text per url" invariant well-defined under dedup.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

EPOCH_US = 1577836800_000_000  # 2020-01-01T00:00:00Z in microseconds
LANGS = ("en", "es", "de", "fr", "pt")
MIX = np.uint64(2654435761)
M32 = np.uint64(0xFFFFFFFF)


def page_count(sf_dir: str) -> int:
    """Page-table size for a testdata tier = lineitem row count.

    Read from parquet footer metadata only — no data IO.
    """
    return pq.ParquetFile(f"{sf_dir}/lineitem.parquet").metadata.num_rows


def _s(ints: np.ndarray) -> pa.Array:
    """int array → arrow string array (decimal)."""
    return pc.cast(pa.array(ints), pa.string())


def fixed5_str(v5: np.ndarray) -> pa.Array:
    """Fixed-point 1e-5 ints → decimal strings with exactly 5 decimals.

    Pure integer formatting (sign + int part + zero-padded fraction) so
    DuckDB reproduces it byte-for-byte (see sql_fixed5).
    """
    v5 = np.asarray(v5, dtype=np.int64)
    av = np.abs(v5)
    sign = pa.array(np.where(v5 < 0, "-", ""))
    frac = pc.utf8_lpad(_s(av % 100000), 5, "0")
    return pc.binary_join_element_wise(sign, _s(av // 100000), ".", frac, "")


def sql_fixed5(expr: str) -> str:
    return (f"(CASE WHEN ({expr}) < 0 THEN '-' ELSE '' END || "
            f"(abs({expr}) // 100000)::VARCHAR || '.' || "
            f"lpad((abs({expr}) % 100000)::VARCHAR, 5, '0'))")


def page_key(i: np.ndarray, n: int) -> np.ndarray:
    m = max(1, n * 7 // 10)
    return (np.asarray(i, dtype=np.int64) % m).astype(np.int64)


def geo_fields(key: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(has_geo, lat5, lon5) for each key — the text-embedded coordinate."""
    g = (key.astype(np.uint64) * MIX) & M32
    has_geo = (g % np.uint64(10)) < np.uint64(3)
    lat5 = ((g % np.uint64(1700000)).astype(np.int64) * 10 + 5) - 8500000
    lon5 = (((g // np.uint64(1700000)) % np.uint64(3600000)).astype(np.int64) * 10 + 5) - 18000000
    return has_geo, lat5, lon5


def gen_pages_table(i: np.ndarray, n: int, include_html: bool = True) -> pa.Table:
    """Row indices → page table chunk. Vectorized (arrow string kernels)."""
    i = np.asarray(i, dtype=np.int64)
    key = page_key(i, n)
    has_geo, lat5, lon5 = geo_fields(key)

    url = pc.binary_join_element_wise(
        "https://site", _s(key % 1000), ".example/page", _s(key), "")
    warc_ts = pa.array(EPOCH_US + i * 1_000_000, type=pa.timestamp("us"))
    lang = pa.array(np.asarray(LANGS, dtype=object)[key % 5].astype(str))

    geo_part = pc.binary_join_element_wise(
        " geo: ", fixed5_str(lat5), ",", fixed5_str(lon5), "")
    geo_part = pc.if_else(pa.array(has_geo), geo_part, "")
    text = pc.binary_join_element_wise(
        "doc ", _s(key), " tok", _s(key * 7919 % 997), " tok", _s(key * 104729 % 997),
        " lorem ipsum dolor sit amet", geo_part,
        " consectetur adipiscing elit", "")

    cols: dict[str, pa.Array] = {"url": url, "warc_ts": warc_ts}
    if include_html:
        html = pc.binary_join_element_wise(
            "<html><head><title>page ", _s(key), "</title></head><body>",
            text, "</body></html>", "")
        cols["html"] = pc.cast(html, pa.binary())
    cols["text"] = text
    cols["lang"] = lang
    return pa.table(cols)


def synth_pages(n: int, include_html: bool = True, parallelism: int = -1):
    """Streaming page synthesis as a ray.data.Dataset of n rows.

    Built on ``ray.data.range`` so generation itself is distributed and
    streams — at 10^12 rows this is a parallel source, not a driver
    loop. (Caller owns the Ray session.)
    """
    import ray.data as rd

    ds = rd.range(n, override_num_blocks=parallelism if parallelism > 0 else None)

    def _gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy()
        return gen_pages_table(ids, n, include_html=include_html)

    return ds.map_batches(_gen, batch_format="pyarrow")


def sql_pages_cte(n: int, include_html: bool = False) -> str:
    """DuckDB CTE body reproducing synth_pages(n) exactly (sans html by
    default — binary columns aren't part of the hash compare)."""
    m = max(1, n * 7 // 10)
    key = f"(i % {m})"
    g = f"((({key}::UBIGINT * 2654435761::UBIGINT) % 4294967296::UBIGINT))"
    lat5 = f"((({g} % 1700000)::BIGINT * 10 + 5) - 8500000)"
    lon5 = f"(((({g} // 1700000) % 3600000)::BIGINT * 10 + 5) - 18000000)"
    has_geo = f"({g} % 10 < 3)"
    text = (
        f"('doc ' || {key}::VARCHAR || ' tok' || ({key} * 7919 % 997)::VARCHAR || "
        f"' tok' || ({key} * 104729 % 997)::VARCHAR || ' lorem ipsum dolor sit amet' || "
        f"(CASE WHEN {has_geo} THEN ' geo: ' || {sql_fixed5(lat5)} || ',' || {sql_fixed5(lon5)} "
        f"ELSE '' END) || ' consectetur adipiscing elit')"
    )
    html = f", ('<html><head><title>page ' || {key}::VARCHAR || '</title></head><body>' || {text} || '</body></html>') AS html" if include_html else ""
    return (
        f"SELECT 'https://site' || ({key} % 1000)::VARCHAR || '.example/page' || {key}::VARCHAR AS url, "
        f"TIMESTAMP '2020-01-01 00:00:00' + to_microseconds(i * 1000000) AS warc_ts"
        f"{html}, "
        f"{text} AS text, "
        f"(['en','es','de','fr','pt'])[{key} % 5 + 1] AS lang "
        f"FROM range({n}) t(i)"
    )
