"""Media oracle twins (split from oracle.py)."""

from spapy_ray.oracles.common import *  # noqa: F401,F403


def q_media_decode() -> str:
    """Twin of the real PNG decode: pixel aggregates from the
    closed-form pixel spec (sources/media.py). The payload bytes are
    zlib-dependent and never hashed."""
    from spapy_ray.sources.media import sql_media_cte

    return (
        f"WITH {sql_media_cte()} "
        "SELECT d.media_id, d.w::BIGINT AS width, "
        "d.h::BIGINT AS height, sum(p.px)::BIGINT AS px_sum, "
        "min(p.px)::BIGINT AS px_min, max(p.px)::BIGINT AS px_max "
        "FROM media_dims d JOIN media_px p USING (media_id) "
        "GROUP BY d.media_id, d.w, d.h")


def q_media_resize(width: int = 24, height: int = 20) -> str:
    """Twin of decode → nearest-neighbor resize → re-encode →
    decode: target pixel (y', x') samples source index
    floor(t * src // dst) of the closed-form image."""
    from spapy_ray.sources.media import sql_media_dims_cte

    return (
        f"WITH {sql_media_dims_cte()}, "
        "tgt AS (SELECT d.media_id, "
        f"((x.x * d.w // {width}) * 3 + (y.y * d.h // {height}) * 5 "
        "+ d.media_id * 7) % 251 AS px "
        "FROM media_dims d, "
        f"LATERAL (SELECT unnest(range({width})) AS x) x, "
        f"LATERAL (SELECT unnest(range({height})) AS y) y) "
        f"SELECT media_id, {width}::BIGINT AS width, "
        f"{height}::BIGINT AS height, sum(px)::BIGINT AS px_sum, "
        "min(px)::BIGINT AS px_min, max(px)::BIGINT AS px_max "
        "FROM tgt GROUP BY media_id")


def q_media_probe() -> str:
    """Twin of the actor-pool media probe with the deterministic fake
    codec: pseudo metadata = FNV arithmetic over the payload bytes
    (html is ASCII, so character ops == byte ops)."""
    h = sql_fnv1a("html")
    return (
        f"WITH {pages_cte()}, "
        f"probe AS (SELECT url, warc_ts, {h} AS h, length(html) AS nb FROM pages) "
        "SELECT url, warc_ts, "
        "(h % 1920 + 16)::BIGINT AS width, "
        "((h // 65536) % 1080 + 16)::BIGINT AS height, "
        "((h // 4294967296) % 240 + 1)::BIGINT AS n_frames, "
        "nb::BIGINT AS n_bytes FROM probe"
    )


def q_media_chunks(chunk: int = 256) -> str:
    """Twin of the payload chunker: generate_series chunk ordinals
    ((ln + 255) // 256 - 1 as the hi bound — DuckDB // truncates, so
    the naive (ln-1)//256 would emit a ghost chunk for empty
    payloads), substr pieces, same FNV mod signature."""
    fnv = sql_fnv1a("piece")
    return (
        f"WITH {pages_cte()}, "
        "d AS (SELECT url, warc_ts, html, length(html) AS ln "
        "FROM pages), "
        "c AS (SELECT url, warc_ts, html, "
        f"unnest(generate_series(0, (ln + {chunk - 1}) // {chunk} "
        "- 1)) AS chunk_id FROM d), "
        "s AS (SELECT url, warc_ts, chunk_id, "
        f"substr(html, chunk_id * {chunk} + 1, {chunk}) AS piece "
        "FROM c) "
        "SELECT url, warc_ts, chunk_id::BIGINT AS chunk_id, "
        "length(piece)::BIGINT AS n_bytes, "
        f"(({fnv}) % 1000000007)::BIGINT AS sig FROM s"
    )


def q_audio_decode() -> str:
    """Twin of the real WAV decode: sample aggregates from the
    closed-form spec (sources/media.py sql_audio_cte)."""
    from spapy_ray.sources.media import sql_audio_cte

    return (
        f"WITH {sql_audio_cte()} "
        "SELECT d.media_id, d.rate::BIGINT AS rate, "
        "1::BIGINT AS channels, d.n::BIGINT AS n_samples, "
        "sum(a.s)::BIGINT AS amp_sum, min(a.s)::BIGINT AS amp_min, "
        "max(a.s)::BIGINT AS amp_max "
        "FROM audio_dims d JOIN audio_smp a USING (media_id) "
        "GROUP BY d.media_id, d.rate, d.n")


def q_audio_decimate(stride: int = 4) -> str:
    """Twin of decode → decimate(stride) → re-encode → decode:
    surviving sample t' reads source index stride*t', and the
    re-encoded rate is rate // stride."""
    n = ("greatest(64, least(2000, (SELECT count(*) FROM lineitem) "
         "// 300))")
    src = f"({stride} * t.t)"
    return (
        "WITH audio_ids AS (SELECT i FROM (SELECT row_number() "
        f"OVER () - 1 AS i FROM lineitem) t WHERE i < {n}), "
        "audio_dims AS (SELECT i AS media_id, "
        "8000 + 1000 * (i % 3) AS rate, 400 + (i * 37) % 300 AS n "
        "FROM audio_ids), "
        "dec AS (SELECT media_id, rate, "
        f"({src} * {src} + 3 * {src} + 11 * media_id) "
        "% 2001 - 1000 AS s "
        "FROM audio_dims, "
        f"LATERAL (SELECT unnest(range((n + {stride} - 1) // "
        f"{stride})) AS t) t) "
        f"SELECT d.media_id, (d.rate // {stride})::BIGINT AS rate, "
        "1::BIGINT AS channels, "
        f"((d.n + {stride} - 1) // {stride})::BIGINT AS n_samples, "
        "sum(c.s)::BIGINT AS amp_sum, min(c.s)::BIGINT AS amp_min, "
        "max(c.s)::BIGINT AS amp_max "
        "FROM audio_dims d JOIN dec c USING (media_id) "
        "GROUP BY d.media_id, d.rate, d.n")


def q_video_frames(stride: int = 2, max_frames: int = 4) -> str:
    """Twin of the real APNG frame sampling: sampled frame f =
    stride*k, k < min(ceil(nf/stride), max_frames); per-frame pixel
    aggregates from the closed-form spec."""
    n = ("greatest(64, least(2000, (SELECT count(*) FROM lineitem) "
         "// 300))")
    return (
        "WITH video_ids AS (SELECT i FROM (SELECT row_number() "
        f"OVER () - 1 AS i FROM lineitem) t WHERE i < {n}), "
        "video_dims AS (SELECT i AS media_id, "
        "12 + (i * 7) % 20 AS w, 10 + (i * 5) % 14 AS h, "
        "2 + i % 5 AS nf FROM video_ids), "
        "fr AS (SELECT media_id, w, h, "
        f"{stride} * k.k AS f FROM video_dims, "
        "LATERAL (SELECT unnest(range(least("
        f"(nf + {stride} - 1) // {stride}, {max_frames}))) AS k) k), "
        "px AS (SELECT media_id, f, w, h, "
        "(x.x * 3 + y.y * 5 + media_id * 7 + f * 13) % 251 AS px "
        "FROM fr, "
        "LATERAL (SELECT unnest(range(w)) AS x) x, "
        "LATERAL (SELECT unnest(range(h)) AS y) y) "
        "SELECT media_id, f::INTEGER AS frame_idx, "
        "w::BIGINT AS width, h::BIGINT AS height, "
        "sum(px)::BIGINT AS px_sum, min(px)::BIGINT AS px_min, "
        "max(px)::BIGINT AS px_max "
        "FROM px GROUP BY media_id, f, w, h")
