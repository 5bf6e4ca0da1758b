"""Deterministic synthetic media payloads — REAL PNGs — plus the
closed-form integer spec their SQL twins reconstruct.

The media table for a testdata tier is derived from the tier's page
count (sources/pages.py convention): n_media = max(64, min(2000,
pages // 300)). Image ``i`` is an 8-bit grayscale PNG with

    width  w(i) = 16 + (i * 31) % 40
    height h(i) = 16 + (i * 17) % 24
    pixel (y, x) = (x * 3 + y * 5 + i * 7) % 251
    scanline r encoded with PNG filter (r + i) % 5

so every decode exercises all five de-filter paths, while the decoded
width/height/pixel aggregates have exact integer twins DuckDB computes
from generate_series — the trick that puts a REAL codec under the
value hash (the payload bytes themselves are zlib-dependent and are
never hashed).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from spapy_ray.kernels.png import encode_png
from spapy_ray.sources.pages import page_count


def media_count(n_pages: int) -> int:
    return max(64, min(2000, n_pages // 300))


def media_params(i: np.ndarray):
    i = np.asarray(i, dtype=np.int64)
    return 16 + (i * 31) % 40, 16 + (i * 17) % 24


def gen_media_table(idx: np.ndarray) -> pa.Table:
    """media_id + png payload for the given image indices."""
    idx = np.asarray(idx, dtype=np.int64)
    ws, hs = media_params(idx)
    payloads = []
    for i, w, h in zip(idx.tolist(), ws.tolist(), hs.tolist()):
        y, x = np.mgrid[0:h, 0:w]
        arr = ((x * 3 + y * 5 + i * 7) % 251).astype(np.uint8)
        payloads.append(encode_png(
            arr, filters=[(r + i) % 5 for r in range(h)]))
    return pa.table({
        "media_id": pa.array(idx),
        "png": pa.array(payloads, type=pa.binary())})


def media_dataset(sf_dir: str):
    """Distributed synth: a range Dataset mapped through the PNG
    encoder (batch-local, no driver payloads)."""
    import ray.data as rd

    n = media_count(page_count(sf_dir))

    def gen(batch: pa.Table) -> pa.Table:
        return gen_media_table(
            batch.column("id").to_numpy(zero_copy_only=False))

    return rd.range(n).map_batches(gen, batch_format="pyarrow",
                                   batch_size=256)


def sql_media_dims_cte() -> str:
    """CTE ``media_dims(media_id, w, h)`` from the same integer spec
    (media count derived the engine's way from the lineitem view)."""
    n = ("greatest(64, least(2000, (SELECT count(*) FROM lineitem) "
         "// 300))")
    return (
        f"media_ids AS (SELECT i FROM (SELECT row_number() OVER () - 1 "
        f"AS i FROM lineitem) t WHERE i < {n}), "
        "media_dims AS (SELECT i AS media_id, "
        "16 + (i * 31) % 40 AS w, 16 + (i * 17) % 24 AS h "
        "FROM media_ids)"
    )


def sql_media_cte() -> str:
    """…plus ``media_px(media_id, x, y, px)`` — one row per pixel."""
    return (
        f"{sql_media_dims_cte()}, "
        "media_px AS (SELECT media_id, x.x, y.y, "
        "(x.x * 3 + y.y * 5 + media_id * 7) % 251 AS px "
        "FROM media_dims, "
        "LATERAL (SELECT unnest(range(w)) AS x) x, "
        "LATERAL (SELECT unnest(range(h)) AS y) y)"
    )


def audio_params(i: np.ndarray):
    i = np.asarray(i, dtype=np.int64)
    return 8000 + 1000 * (i % 3), 400 + (i * 37) % 300


def gen_audio_table(idx: np.ndarray) -> pa.Table:
    """media_id + REAL 16-bit PCM WAV payload for the given indices:
    mono, rate r(i) = 8000 + 1000*(i%3), n(i) = 400 + (i*37)%300
    samples, sample[t] = ((t*t + 3t + 11i) % 2001) - 1000 — the same
    closed-form-twin trick as the PNG table (sample values are exact
    SQL arithmetic; the RIFF container bytes are never hashed)."""
    from spapy_ray.kernels.wav import encode_wav

    idx = np.asarray(idx, dtype=np.int64)
    rates, ns = audio_params(idx)
    payloads = []
    for i, r, n in zip(idx.tolist(), rates.tolist(), ns.tolist()):
        t = np.arange(n, dtype=np.int64)
        s = ((t * t + 3 * t + 11 * i) % 2001 - 1000).astype(np.int16)
        payloads.append(encode_wav(s, int(r)))
    return pa.table({
        "media_id": pa.array(idx),
        "wav": pa.array(payloads, type=pa.binary())})


def audio_dataset(sf_dir: str):
    import ray.data as rd

    n = media_count(page_count(sf_dir))

    def gen(batch: pa.Table) -> pa.Table:
        return gen_audio_table(
            batch.column("id").to_numpy(zero_copy_only=False))

    return rd.range(n).map_batches(gen, batch_format="pyarrow",
                                   batch_size=256)


def sql_audio_cte() -> str:
    """CTE ``audio_smp(media_id, rate, t, s)`` — one row per sample
    of every synthetic clip."""
    n = ("greatest(64, least(2000, (SELECT count(*) FROM lineitem) "
         "// 300))")
    return (
        f"audio_ids AS (SELECT i FROM (SELECT row_number() OVER () - 1 "
        f"AS i FROM lineitem) t WHERE i < {n}), "
        "audio_dims AS (SELECT i AS media_id, "
        "8000 + 1000 * (i % 3) AS rate, 400 + (i * 37) % 300 AS n "
        "FROM audio_ids), "
        "audio_smp AS (SELECT media_id, rate, t.t, "
        "(t.t * t.t + 3 * t.t + 11 * media_id) % 2001 - 1000 AS s "
        "FROM audio_dims, "
        "LATERAL (SELECT unnest(range(n)) AS t) t)"
    )


def video_params(i: np.ndarray):
    i = np.asarray(i, dtype=np.int64)
    return 12 + (i * 7) % 20, 10 + (i * 5) % 14, 2 + i % 5


def gen_video_table(idx: np.ndarray) -> pa.Table:
    """media_id + REAL APNG clip: w(i)=12+(7i)%20, h(i)=10+(5i)%14,
    nf(i)=2+i%5 full-size gray frames, frame f pixel (y,x) =
    (3x + 5y + 7i + 13f) % 251 — closed-form per-frame twins."""
    from spapy_ray.kernels.png import encode_apng

    idx = np.asarray(idx, dtype=np.int64)
    ws, hs, nfs = video_params(idx)
    payloads = []
    for i, w, h, nf in zip(idx.tolist(), ws.tolist(), hs.tolist(),
                           nfs.tolist()):
        y, x = np.mgrid[0:h, 0:w]
        frames = [((x * 3 + y * 5 + i * 7 + f * 13) % 251)
                  .astype(np.uint8) for f in range(nf)]
        payloads.append(encode_apng(frames))
    return pa.table({
        "media_id": pa.array(idx),
        "apng": pa.array(payloads, type=pa.binary())})


def video_dataset(sf_dir: str):
    import ray.data as rd

    n = media_count(page_count(sf_dir))

    def gen(batch: pa.Table) -> pa.Table:
        return gen_video_table(
            batch.column("id").to_numpy(zero_copy_only=False))

    return rd.range(n).map_batches(gen, batch_format="pyarrow",
                                   batch_size=256)
