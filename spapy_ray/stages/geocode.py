"""Geocode stage: page → (lat, lon, geo_src).

North-rule requirement (BASELINE.json north_star): "geocode each
Common-Crawl-style web page (url-derived and text-extracted lat/lon)".

Two-path, fully vectorized, stateless ``map_batches`` kernel:

1. text path — RE2 extraction of ``geo: <lat>,<lon>`` from ``text``
   (pyarrow.compute.extract_regex, zero-copy in), ``geo_src='text'``;
2. url fallback — deterministic FNV-1a hash of ``url`` mapped to a
   fixed-point lat/lon, ``geo_src='url'`` (kernels/hashing.py; exact
   SQL twin via hashing.sql_fnv1a for the oracle).

The ``text`` column itself passes through untouched (byte-identical
per-url invariant, BASELINE.json input_hint).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from spapy_ray.kernels.hashing import fnv1a64, sql_fnv1a

GEO_PATTERN = r" geo: (?P<glat>-?\d+\.\d+),(?P<glon>-?\d+\.\d+)"


def hash_lat5_lon5(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """uint64 url hash → (lat5, lon5) fixed-point 1e-5 deg coords.

    Same trailing-5 construction as the text coordinates, so fallback
    points also never touch 1e-4 zone boundaries.
    """
    h = np.asarray(h, dtype=np.uint64)
    lat5 = ((h % np.uint64(1700000)).astype(np.int64) * 10 + 5) - 8500000
    lon5 = (((h // np.uint64(1700000)) % np.uint64(3600000)).astype(np.int64) * 10 + 5) - 18000000
    return lat5, lon5


def geocode_batch(batch: pa.Table) -> pa.Table:
    """Append lat, lon (float64) and geo_src ('text'|'url') columns."""
    text = batch.column("text")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    ext = pc.extract_regex(text, pattern=GEO_PATTERN)
    matched = pc.is_valid(ext)
    t_lat = pc.cast(pc.struct_field(ext, "glat"), pa.float64())
    t_lon = pc.cast(pc.struct_field(ext, "glon"), pa.float64())

    h = fnv1a64(batch.column("url"))
    lat5, lon5 = hash_lat5_lon5(h)
    f_lat = pa.array(lat5.astype(np.float64) / 1e5)
    f_lon = pa.array(lon5.astype(np.float64) / 1e5)

    lat = pc.if_else(matched, t_lat, f_lat)
    lon = pc.if_else(matched, t_lon, f_lon)
    src = pc.if_else(matched, pa.scalar("text"), pa.scalar("url"))
    return batch.append_column("lat", lat).append_column("lon", lon) \
                .append_column("geo_src", src)


def geocode(ds, batch_size: int = 32768):
    """Dataset stage. Stateless tasks; zero-copy Arrow batches."""
    return ds.map_batches(geocode_batch, batch_format="pyarrow",
                          batch_size=batch_size, zero_copy_batch=True)


def sql_geocode_columns(url: str = "url", text: str = "text") -> dict[str, str]:
    """DuckDB expressions mirroring geocode_batch exactly.

    Returns {'lat': expr, 'lon': expr, 'geo_src': expr}.
    """
    fnv = sql_fnv1a(url)
    glat = f"regexp_extract({text}, ' geo: (-?\\d+\\.\\d+),(-?\\d+\\.\\d+)', 1)"
    glon = f"regexp_extract({text}, ' geo: (-?\\d+\\.\\d+),(-?\\d+\\.\\d+)', 2)"
    matched = f"({glat} <> '')"
    f_lat = f"(((({fnv}) % 1700000)::BIGINT * 10 + 5 - 8500000)::DOUBLE / 100000.0)"
    f_lon = f"(((({fnv}) // 1700000) % 3600000)::BIGINT * 10 + 5 - 18000000)::DOUBLE / 100000.0"
    return {
        "lat": f"(CASE WHEN {matched} THEN {glat}::DOUBLE ELSE {f_lat} END)",
        "lon": f"(CASE WHEN {matched} THEN {glon}::DOUBLE ELSE ({f_lon}) END)",
        "geo_src": f"(CASE WHEN {matched} THEN 'text' ELSE 'url' END)",
    }
