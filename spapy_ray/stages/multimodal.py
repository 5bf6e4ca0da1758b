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


class DeterministicFakeCodec:
    """Stands in for an image/audio decoder: deterministic pseudo
    metadata + features from the payload bytes."""

    feature_dim = 16

    def decode_meta(self, payloads: list[bytes]) -> dict[str, np.ndarray]:
        h = fnv1a64(pa.array([p.decode("latin1") for p in payloads]))
        width = (h % np.uint64(1920) + np.uint64(16)).astype(np.int32)
        height = ((h >> np.uint64(16)) % np.uint64(1080) + np.uint64(16)).astype(np.int32)
        n_frames = ((h >> np.uint64(32)) % np.uint64(240) + np.uint64(1)).astype(np.int32)
        size = np.array([len(p) for p in payloads], dtype=np.int64)
        return {"width": width, "height": height, "n_frames": n_frames,
                "n_bytes": size}

    def features(self, payloads: list[bytes]) -> np.ndarray:
        h = fnv1a64(pa.array([p.decode("latin1") for p in payloads]))
        cols = []
        for i in range(self.feature_dim):
            cols.append(((h >> np.uint64(i * 4)) & np.uint64(0xFF)).astype(
                np.float32) / 255.0)
        return np.column_stack(cols)


class RealCodecStub:
    """The integration point for a real decoder."""

    feature_dim = 16

    def decode_meta(self, payloads):
        raise NotImplementedError(
            "real image/audio decode needs PIL / ffmpeg, not present in "
            "this environment; plug a codec with decode_meta/features here")

    features = decode_meta


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
