"""Media query pipelines (split from queries.py; registry order lives in
pipelines/queries.py)."""

from spapy_ray.pipelines.qcommon import *  # noqa: F401,F403


def q_media_probe(sf_dir: str):
    """Multimodal plumbing end-to-end WITH a value oracle: binary
    payload column (html) → actor-pool probe stage → typed metadata
    columns. The codec is the deterministic fake (no image libs in
    this environment — DIVERGENCES / stages.multimodal), whose
    pseudo-metadata is pure FNV arithmetic, so the SQL twin
    reconstructs it from the page spec."""
    from spapy_ray.stages.multimodal import probe_media

    ds = pages_dataset(sf_dir, include_html=True)
    out = probe_media(ds, payload_col="html")

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "url": t.column("url"), "warc_ts": t.column("warc_ts"),
            "width": pc.cast(t.column("width"), pa.int64()),
            "height": pc.cast(t.column("height"), pa.int64()),
            "n_frames": pc.cast(t.column("n_frames"), pa.int64()),
            "n_bytes": pc.cast(t.column("n_bytes"), pa.int64())})

    return out.map_batches(project, batch_format="pyarrow")


def q_media_chunks(sf_dir: str, chunk: int = 256):
    """Fixed-size payload chunking (the transfer/storage sharding
    step a multimodal pipeline runs before shipping blobs): each
    page's payload splits into 256-byte chunks, one row per chunk
    with its exact length and FNV signature. Fully vectorized — one
    utf8 slice + one batched FNV per chunk ORDINAL (max-chunks
    passes over the whole batch, no per-row loop); payloads are
    ASCII so codepoint slices == byte slices (the media_probe
    contract)."""
    from spapy_ray.kernels.hashing import fnv1a64

    ds = pages_dataset(sf_dir, include_html=True)

    def chunks(t: pa.Table) -> pa.Table:
        html = t.column("html")
        if isinstance(html, pa.ChunkedArray):
            html = html.combine_chunks()
        # payload arrives as an opaque BINARY column; it is ASCII by
        # the media_probe contract, so a utf8 view is zero-risk and
        # codepoint slices == byte slices
        html = pc.cast(html, pa.string())
        ln = pc.utf8_length(html).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        parts = []
        k = 0
        while True:
            m = ln > k * chunk
            if not m.any():
                break
            mask = pa.array(m)
            piece = pc.utf8_slice_codeunits(
                html.filter(mask), k * chunk, (k + 1) * chunk)
            h = fnv1a64(piece)
            parts.append(pa.table({
                "url": t.column("url").filter(mask),
                "warc_ts": t.column("warc_ts").filter(mask),
                "chunk_id": pa.array(
                    np.full(int(m.sum()), k, dtype=np.int64)),
                "n_bytes": pc.cast(pc.utf8_length(piece), pa.int64()),
                "sig": pa.array(
                    (h % np.uint64(1_000_000_007)).astype(np.int64)),
            }))
            k += 1
        if not parts:
            return pa.table({
                "url": html.slice(0, 0),
                "warc_ts": t.column("warc_ts").slice(0, 0),
                "chunk_id": pa.array([], type=pa.int64()),
                "n_bytes": pa.array([], type=pa.int64()),
                "sig": pa.array([], type=pa.int64())})
        return pa.concat_tables(parts)

    return ds.map_batches(chunks, batch_format="pyarrow")


def q_media_decode(sf_dir: str):
    """REAL image decode under the value hash: the synthetic media
    table is actual PNG bytes (sources/media.py — zlib stream, CRC
    chunks, a different scanline filter per row), decoded by the
    pure-stdlib codec (kernels/png.py) in an actor-pool stage
    (multimodal.decode_media_stats); the output is exact integer
    pixel aggregates whose twin DuckDB reconstructs from the closed-
    form pixel spec — the payload bytes are never hashed."""
    from spapy_ray.sources.media import media_dataset
    from spapy_ray.stages.multimodal import RealPngCodec, \
        decode_media_stats

    return decode_media_stats(media_dataset(sf_dir), "png",
                              codec=RealPngCodec())


def q_media_resize(sf_dir: str, width: int = 24, height: int = 20):
    """Decode -> nearest-neighbor resize -> re-encode -> decode
    again, all through the real PNG codec: the resized image's pixel
    aggregates equal the twin's closed form over source indices
    floor(target * src // dst) — pinning the whole decode/resize/
    encode loop, not just the probe."""
    from spapy_ray.sources.media import media_dataset
    from spapy_ray.stages.multimodal import RealPngCodec, \
        decode_media_stats, resize_media
    from spapy_ray.util import chained_pools

    # two actor-pool stages share one pipeline: split the cluster or
    # their pre-started minimums starve the read (util.chained_pools)
    r = resize_media(media_dataset(sf_dir), payload_col="png",
                     codec=RealPngCodec(), width=width, height=height,
                     concurrency=chained_pools(2))
    return decode_media_stats(r, "resized", codec=RealPngCodec(),
                              keep=["media_id"],
                              concurrency=chained_pools(2))


def q_audio_decode(sf_dir: str):
    """REAL audio decode under the value hash: synthetic clips are
    actual RIFF/WAVE PCM bytes (sources/media.py gen_audio_table),
    decoded by the pure-stdlib codec (kernels/wav.py) in an
    actor-pool stage; output is exact integer sample aggregates whose
    twin DuckDB reconstructs from the closed-form sample spec."""
    from spapy_ray.sources.media import audio_dataset
    from spapy_ray.stages.multimodal import audio_stats

    return audio_stats(audio_dataset(sf_dir), "wav",
                       keep=["media_id"])


def q_audio_decimate(sf_dir: str, stride: int = 4):
    """Decode → integer decimation (every stride-th frame) →
    re-encode → decode again, all through the real WAV codec: the
    decimated clip's aggregates equal the twin's closed form over
    sample indices stride*t — pinning the decode/resample/encode
    loop (two chained actor pools → util.chained_pools)."""
    from spapy_ray.sources.media import audio_dataset
    from spapy_ray.stages.multimodal import audio_stats, \
        decimate_audio
    from spapy_ray.util import chained_pools

    d = decimate_audio(audio_dataset(sf_dir), "wav", stride=stride,
                       concurrency=chained_pools(2))
    return audio_stats(d, "decimated", keep=["media_id"],
                       concurrency=chained_pools(2))


def q_video_frames(sf_dir: str, stride: int = 2, max_frames: int = 4):
    """REAL video frame sampling under the value hash: synthetic
    clips are actual APNG bytes (acTL/fcTL/fdAT per the public spec),
    FrameSampler reads n_frames from the header-only acTL probe and
    extracts every stride-th frame through the real codec
    (RealApngCodec), and each sampled frame's pixel aggregates come
    from a second real PNG decode — two chained actor pools
    (util.chained_pools). Twin: closed-form per-frame pixel spec."""
    from spapy_ray.sources.media import video_dataset
    from spapy_ray.stages.multimodal import MediaDecodeStats, \
        RealApngCodec, RealPngCodec, sample_frames
    from spapy_ray.util import chained_pools

    fr = sample_frames(video_dataset(sf_dir), payload_col="apng",
                       codec=RealApngCodec(), stride=stride,
                       max_frames=max_frames,
                       concurrency=chained_pools(2))
    return fr.map_batches(
        MediaDecodeStats,
        fn_constructor_kwargs={"codec": RealPngCodec(),
                               "payload_col": "frame",
                               "keep": ["media_id", "frame_idx"]},
        batch_format="pyarrow", batch_size=128,
        concurrency=chained_pools(2))
