"""Multimodal (image/audio/video) columns as opaque binary + typed
metadata — the plumbing a 100 TB media pipeline needs, with the codec
layer stubbed (no PIL/ffmpeg in this environment).

Design (per the build brief): media lives in ``binary`` columns
(here: the page ``html`` column stands in as the payload); decode /
feature-extract / resize / frame-sample are actor-pool map_batches
stages whose Ray-side contract (schema, batch size, actor signature,
output layout) is real and tested, while the pixel codec itself is
either

- ``DeterministicFakeCodec`` — parses nothing, derives a fake
  (width, height, n_frames) + a feature vector from the payload bytes
  deterministically (FNV), so pipelines and tests run end-to-end; or
- ``RealCodecStub`` — raises NotImplementedError with the exact
  dependency needed, the marked integration point for PIL/ffmpeg.

Media stages keep batches SMALL (payloads are fat) and run as actor
pools sized via util.default_pool — the codec is the expensive
per-worker state in real deployments (model weights, ffmpeg ctx).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from spapy_ray.kernels.hashing import fnv1a64
from spapy_ray.util import default_pool


_RSZ_MAGIC = b"RSZ1"


def _as_bytes(payloads: list) -> list[bytes]:
    """Accept str (text stand-in) or bytes payload columns."""
    return [p.encode("utf-8") if isinstance(p, str) else p
            for p in payloads]


class DeterministicFakeCodec:
    """Stands in for an image/audio decoder: deterministic pseudo
    metadata + features from the payload bytes. Resized payloads are
    tagged containers (RSZ1 + dims + source digest) so a probe AFTER
    a resize reports the target dimensions — the real pipeline's
    observable behavior, without pixels."""

    feature_dim = 16

    def decode_meta(self, payloads: list[bytes]) -> dict[str, np.ndarray]:
        import struct

        payloads = _as_bytes(payloads)
        n = len(payloads)
        width = np.empty(n, dtype=np.int32)
        height = np.empty(n, dtype=np.int32)
        n_frames = np.empty(n, dtype=np.int32)
        plain_idx = [i for i, p in enumerate(payloads)
                     if not p.startswith(_RSZ_MAGIC)]
        if plain_idx:
            h = fnv1a64(pa.array([payloads[i].decode("latin1")
                                  for i in plain_idx]))
            width[plain_idx] = (h % np.uint64(1920) + np.uint64(16)) \
                .astype(np.int32)
            height[plain_idx] = ((h >> np.uint64(16)) % np.uint64(1080)
                                 + np.uint64(16)).astype(np.int32)
            n_frames[plain_idx] = ((h >> np.uint64(32)) % np.uint64(240)
                                   + np.uint64(1)).astype(np.int32)
        for i, p in enumerate(payloads):
            if p.startswith(_RSZ_MAGIC):
                w, hh, nf = struct.unpack_from("<iii", p, 4)
                width[i], height[i], n_frames[i] = w, hh, nf
        size = np.array([len(p) for p in payloads], dtype=np.int64)
        return {"width": width, "height": height, "n_frames": n_frames,
                "n_bytes": size}

    def resize(self, payloads: list[bytes], width: int,
               height: int) -> list[bytes]:
        import struct

        payloads = _as_bytes(payloads)
        meta = self.decode_meta(payloads)
        h = fnv1a64(pa.array([p.decode("latin1") for p in payloads]))
        return [_RSZ_MAGIC
                + struct.pack("<iii", width, height, int(meta["n_frames"][i]))
                + struct.pack("<Q", int(h[i]))
                for i in range(len(payloads))]

    def extract_frames(self, payload: bytes,
                       frame_idx: np.ndarray) -> list[bytes]:
        import struct

        payload, = _as_bytes([payload])
        h = int(fnv1a64(pa.array([payload.decode("latin1")]))[0])
        return [b"FRM1" + struct.pack("<iQ", int(i), h) for i in frame_idx]

    def features(self, payloads: list[bytes]) -> np.ndarray:
        payloads = _as_bytes(payloads)
        h = fnv1a64(pa.array([p.decode("latin1") for p in payloads]))
        cols = []
        for i in range(self.feature_dim):
            cols.append(((h >> np.uint64(i * 4)) & np.uint64(0xFF)).astype(
                np.float32) / 255.0)
        return np.column_stack(cols)


class RealPngCodec:
    """REAL pixels behind the media stages: pure-stdlib PNG decode/
    encode (kernels/png.py — zlib stream, CRC-verified chunks, all
    five scanline filters). Stills only: n_frames is 1 and
    extract_frames serves frame 0 as the payload itself. Swap in a
    compiled decoder behind the same four methods for JPEG/video."""

    feature_dim = 16

    def decode_meta(self, payloads: list[bytes]) -> dict[str, np.ndarray]:
        from spapy_ray.kernels.png import parse_ihdr

        payloads = _as_bytes(payloads)
        n = len(payloads)
        width = np.empty(n, dtype=np.int32)
        height = np.empty(n, dtype=np.int32)
        for i, p in enumerate(payloads):
            m = parse_ihdr(p)
            width[i], height[i] = m["width"], m["height"]
        return {"width": width, "height": height,
                "n_frames": np.ones(n, dtype=np.int32),
                "n_bytes": np.array([len(p) for p in payloads],
                                    dtype=np.int64)}

    def decode_stats(self, payloads: list[bytes]) -> dict[str, np.ndarray]:
        """Full decode → exact integer pixel aggregates (the oracle
        surface: sums/extremes over REAL decoded pixels)."""
        from spapy_ray.kernels.png import decode_png

        payloads = _as_bytes(payloads)
        n = len(payloads)
        out = {k: np.empty(n, dtype=np.int64)
               for k in ("width", "height", "px_sum", "px_min",
                         "px_max")}
        for i, p in enumerate(payloads):
            a = decode_png(p).astype(np.int64)
            out["height"][i], out["width"][i] = a.shape[:2]
            out["px_sum"][i] = int(a.sum())
            out["px_min"][i] = int(a.min())
            out["px_max"][i] = int(a.max())
        return out

    def features(self, payloads: list[bytes]) -> np.ndarray:
        from spapy_ray.kernels.png import decode_png

        payloads = _as_bytes(payloads)
        feats = np.empty((len(payloads), self.feature_dim),
                         dtype=np.float32)
        for i, p in enumerate(payloads):
            a = decode_png(p)
            gray = a if a.ndim == 2 else a.mean(axis=2)
            hist = np.bincount((gray.astype(np.int64) // 22)
                               .ravel().clip(0, 11), minlength=12)
            feats[i, :4] = (gray.mean() / 255.0, gray.std() / 255.0,
                            gray.min() / 255.0, gray.max() / 255.0)
            feats[i, 4:] = hist / gray.size
        return feats

    def resize(self, payloads: list[bytes], width: int,
               height: int) -> list[bytes]:
        from spapy_ray.kernels.png import decode_png, encode_png

        payloads = _as_bytes(payloads)
        out = []
        for p in payloads:
            a = decode_png(p)
            h, w = a.shape[:2]
            # nearest-neighbor: source index floor(target * src / dst)
            yi = (np.arange(height, dtype=np.int64) * h) // height
            xi = (np.arange(width, dtype=np.int64) * w) // width
            out.append(encode_png(a[yi][:, xi]))
        return out

    def extract_frames(self, payload: bytes,
                       frame_idx: np.ndarray) -> list[bytes]:
        payload, = _as_bytes([payload])
        out = []
        for i in frame_idx:
            if int(i) != 0:
                raise ValueError("PNG stills have a single frame")
            out.append(payload)
        return out


class RealApngCodec:
    """REAL video-shaped codec: APNG clips (kernels/png.py
    encode_apng/decode_apng — acTL/fcTL/fdAT chunks per the public
    spec, full-size frames). n_frames comes from the header-only
    acTL probe; extract_frames re-encodes each requested frame as a
    standalone PNG, so downstream per-frame stages run the real
    single-image codec."""

    feature_dim = 16

    def decode_meta(self, payloads: list[bytes]) -> dict[str, np.ndarray]:
        from spapy_ray.kernels.png import parse_actl

        payloads = _as_bytes(payloads)
        n = len(payloads)
        width = np.empty(n, dtype=np.int32)
        height = np.empty(n, dtype=np.int32)
        n_frames = np.empty(n, dtype=np.int32)
        for i, p in enumerate(payloads):
            m = parse_actl(p)
            width[i], height[i] = m["width"], m["height"]
            n_frames[i] = m["n_frames"]
        return {"width": width, "height": height,
                "n_frames": n_frames,
                "n_bytes": np.array([len(p) for p in payloads],
                                    dtype=np.int64)}

    def extract_frames(self, payload: bytes,
                       frame_idx: np.ndarray) -> list[bytes]:
        from spapy_ray.kernels.png import decode_apng, encode_png

        payload, = _as_bytes([payload])
        frames = decode_apng(payload)
        return [encode_png(frames[int(i)]) for i in frame_idx]

    def features(self, payloads: list[bytes]) -> np.ndarray:
        from spapy_ray.kernels.png import decode_apng

        payloads = _as_bytes(payloads)
        feats = np.empty((len(payloads), self.feature_dim),
                         dtype=np.float32)
        for i, p in enumerate(payloads):
            stack = np.stack([f if f.ndim == 2 else f.mean(axis=2)
                              for f in decode_apng(p)])
            hist = np.bincount((stack.astype(np.int64) // 22)
                               .ravel().clip(0, 11), minlength=12)
            feats[i, :4] = (stack.mean() / 255.0, stack.std() / 255.0,
                            stack.min() / 255.0, stack.max() / 255.0)
            feats[i, 4:] = hist / stack.size
        return feats

    def resize(self, payloads: list[bytes], width: int,
               height: int) -> list[bytes]:
        from spapy_ray.kernels.png import decode_apng, encode_apng

        out = []
        for p in _as_bytes(payloads):
            frames = decode_apng(p)
            rs = []
            for a in frames:
                h, w = a.shape[:2]
                yi = (np.arange(height, dtype=np.int64) * h) // height
                xi = (np.arange(width, dtype=np.int64) * w) // width
                rs.append(a[yi][:, xi])
            out.append(encode_apng(rs))
        return out


class AudioDecodeStats:
    """Actor: WAV payload column → exact integer sample aggregates
    from a REAL decode (rate, channels, n_samples, amp_sum, amp_min,
    amp_max) — the audio twin of MediaDecodeStats."""

    def __init__(self, payload_col: str = "wav",
                 keep: list[str] | None = None):
        self.payload_col = payload_col
        self.keep = keep

    def __call__(self, batch: pa.Table) -> pa.Table:
        from spapy_ray.kernels.wav import decode_wav

        payloads = _as_bytes(batch.column(self.payload_col).to_pylist())
        n = len(payloads)
        out_cols = {k: np.empty(n, dtype=np.int64)
                    for k in ("rate", "channels", "n_samples",
                              "amp_sum", "amp_min", "amp_max")}
        for i, p in enumerate(payloads):
            s, rate = decode_wav(p)
            ch = 1 if s.ndim == 1 else s.shape[1]
            a = s.astype(np.int64)
            out_cols["rate"][i] = rate
            out_cols["channels"][i] = ch
            out_cols["n_samples"][i] = s.shape[0]
            out_cols["amp_sum"][i] = int(a.sum())
            out_cols["amp_min"][i] = int(a.min())
            out_cols["amp_max"][i] = int(a.max())
        keep = self.keep if self.keep is not None else \
            [c for c in batch.column_names if c != self.payload_col]
        out = batch.select(keep)
        for name, arr in out_cols.items():
            out = out.append_column(name, pa.array(arr))
        return out


class AudioDecimate:
    """Actor: decode → keep every ``stride``-th sample frame →
    re-encode. The integer-decimation resample (a real resampler's
    polyphase core with the filter taps left to a compiled codec)."""

    def __init__(self, payload_col: str = "wav",
                 out_col: str = "decimated", stride: int = 4):
        self.payload_col = payload_col
        self.out_col = out_col
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        from spapy_ray.kernels.wav import decode_wav, encode_wav

        payloads = _as_bytes(batch.column(self.payload_col).to_pylist())
        out = []
        for p in payloads:
            s, rate = decode_wav(p)
            out.append(encode_wav(s[::self.stride],
                                  max(1, rate // self.stride)))
        return batch.append_column(self.out_col,
                                   pa.array(out, type=pa.binary()))


def audio_stats(ds, payload_col: str = "wav",
                keep: list[str] | None = None,
                batch_size: int = 256, concurrency=None):
    return ds.map_batches(
        AudioDecodeStats,
        fn_constructor_kwargs={"payload_col": payload_col,
                               "keep": keep},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or default_pool())


def decimate_audio(ds, payload_col: str = "wav",
                   out_col: str = "decimated", stride: int = 4,
                   batch_size: int = 256, concurrency=None):
    return ds.map_batches(
        AudioDecimate,
        fn_constructor_kwargs={"payload_col": payload_col,
                               "out_col": out_col, "stride": stride},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or default_pool())


class RealCodecStub:
    """The integration point for decoders beyond PNG and WAV (JPEG,
    compressed audio, video). PNG is REAL (RealPngCodec /
    kernels/png.py); WAV PCM is REAL (AudioDecodeStats /
    kernels/wav.py)."""

    feature_dim = 16

    def decode_meta(self, payloads):
        raise NotImplementedError(
            "JPEG / compressed-audio / video decode needs PIL / "
            "ffmpeg, not present in this environment; plug a codec "
            "with decode_meta/features/resize/extract_frames here "
            "(PNG and WAV PCM already have real pure-stdlib codecs)")

    features = decode_meta
    resize = decode_meta
    extract_frames = decode_meta


class MediaProbe:
    """Actor: payload column → typed metadata columns."""

    def __init__(self, codec=None, payload_col: str = "html"):
        self.codec = codec or DeterministicFakeCodec()
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        meta = self.codec.decode_meta(payloads)
        out = batch
        for name, arr in meta.items():
            out = out.append_column(name, pa.array(arr))
        return out


class MediaEmbed:
    """Actor: payload column → fixed-dim float32 feature vector column
    (list<float32>), the shape an embedding model stage produces."""

    def __init__(self, codec=None, payload_col: str = "html",
                 out_col: str = "media_vec"):
        self.codec = codec or DeterministicFakeCodec()
        self.payload_col = payload_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        feats = self.codec.features(payloads)
        flat = pa.array(feats.ravel(), type=pa.float32())
        offsets = pa.array(np.arange(len(batch) + 1, dtype=np.int32)
                           * feats.shape[1])
        return batch.append_column(self.out_col,
                                   pa.ListArray.from_arrays(offsets, flat))


class MediaResize:
    """Actor: payload column → resized-payload column. A probe on the
    output reports the target (width, height) — the contract a real
    PIL/ffmpeg resize satisfies."""

    def __init__(self, codec=None, payload_col: str = "html",
                 out_col: str = "resized", width: int = 224,
                 height: int = 224):
        self.codec = codec or DeterministicFakeCodec()
        self.payload_col = payload_col
        self.out_col = out_col
        self.width = width
        self.height = height

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        out = self.codec.resize(payloads, self.width, self.height)
        return batch.append_column(self.out_col,
                                   pa.array(out, type=pa.binary()))


class FrameSampler:
    """Actor, flat-map shape: each video payload expands into one row
    per sampled frame (every ``stride``-th frame, capped at
    ``max_frames``) with frame_idx + frame payload columns; the other
    columns replicate. The output row count is data-dependent — the
    canonical frame-sampling stage of a video training pipeline."""

    def __init__(self, codec=None, payload_col: str = "html",
                 stride: int = 30, max_frames: int = 8):
        self.codec = codec or DeterministicFakeCodec()
        self.payload_col = payload_col
        self.stride = stride
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        meta = self.codec.decode_meta(payloads)
        take_idx, frame_idx, frames = [], [], []
        for i, p in enumerate(payloads):
            idx = np.arange(0, int(meta["n_frames"][i]),
                            self.stride)[:self.max_frames]
            fr = self.codec.extract_frames(p, idx)
            take_idx.extend([i] * len(idx))
            frame_idx.extend(idx.tolist())
            frames.extend(fr)
        out = batch.drop_columns([self.payload_col]) \
            .take(pa.array(take_idx, type=pa.int64()))
        out = out.append_column("frame_idx",
                                pa.array(frame_idx, type=pa.int32()))
        return out.append_column("frame",
                                 pa.array(frames, type=pa.binary()))


class MediaDecodeStats:
    """Actor: payload column → exact integer pixel aggregates from a
    REAL decode (width, height, px_sum, px_min, px_max)."""

    def __init__(self, codec=None, payload_col: str = "png",
                 keep: list[str] | None = None):
        self.codec = codec or RealPngCodec()
        self.payload_col = payload_col
        self.keep = keep

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        stats = self.codec.decode_stats(payloads)
        keep = self.keep if self.keep is not None else \
            [c for c in batch.column_names if c != self.payload_col]
        out = batch.select(keep)
        for name, arr in stats.items():
            out = out.append_column(name, pa.array(arr))
        return out


def decode_media_stats(ds, payload_col: str = "png", codec=None,
                       keep: list[str] | None = None,
                       batch_size: int = 128, concurrency=None):
    """Real-decode stage (actor pool; decode is the per-row hot cost,
    batches stay small because payloads are fat)."""
    return ds.map_batches(
        MediaDecodeStats,
        fn_constructor_kwargs={"codec": codec,
                               "payload_col": payload_col,
                               "keep": keep},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or default_pool())


def probe_media(ds, payload_col: str = "html", codec=None,
                batch_size: int = 256, concurrency=None):
    """Metadata-probe stage. Small batches: payloads are fat."""
    return ds.map_batches(
        MediaProbe,
        fn_constructor_kwargs={"codec": codec, "payload_col": payload_col},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or default_pool())


def embed_media(ds, payload_col: str = "html", codec=None,
                batch_size: int = 256, concurrency=None):
    """Feature-extraction stage (actor pool; codec = per-worker state)."""
    return ds.map_batches(
        MediaEmbed,
        fn_constructor_kwargs={"codec": codec, "payload_col": payload_col},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or default_pool())


def resize_media(ds, payload_col: str = "html", codec=None,
                 width: int = 224, height: int = 224,
                 batch_size: int = 256, concurrency=None):
    """Resize stage (actor pool; small batches — two payload copies
    live per batch)."""
    return ds.map_batches(
        MediaResize,
        fn_constructor_kwargs={"codec": codec, "payload_col": payload_col,
                               "width": width, "height": height},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or default_pool())


def sample_frames(ds, payload_col: str = "html", codec=None,
                  stride: int = 30, max_frames: int = 8,
                  batch_size: int = 64, concurrency=None):
    """Frame-sampling stage (flat-map; output rows = sampled frames).
    Smallest batches of the family — each input row fans out."""
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"codec": codec, "payload_col": payload_col,
                               "stride": stride, "max_frames": max_frames},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or default_pool())
