"""Pure-stdlib RIFF/WAVE PCM codec — the real audio path behind the
multimodal stages (public spec: RIFF-1991 / WAVE PCM; the format is a
chunked container around raw little-endian PCM frames).

Supported profile (fail-loud outside it): PCM (format tag 1), 16-bit
samples, 1..8 channels, arbitrary sample rate. Mirrors kernels/png.py
for images: the container logic is implemented directly, numpy does
the sample work, and a compiled codec can replace it behind the same
interface at 100 TB scale.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 samples (n,) mono or (n, ch) → WAV bytes."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2 or not 1 <= s.shape[1] <= 8:
        raise ValueError(f"unsupported sample shape {samples.shape}")
    n, ch = s.shape
    data = np.ascontiguousarray(s).tobytes()
    block = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _chunks(buf: bytes):
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    size = struct.unpack_from("<I", buf, 4)[0]
    end = min(8 + size, len(buf))
    off = 12
    while off + 8 <= end:
        tag = buf[off:off + 4]
        ln = struct.unpack_from("<I", buf, off + 4)[0]
        data = buf[off + 8:off + 8 + ln]
        if len(data) != ln:
            raise ValueError(f"truncated WAV chunk {tag!r}")
        yield tag, data
        off += 8 + ln + (ln & 1)   # chunks are word-aligned


def parse_fmt(buf: bytes) -> dict:
    """Header-only probe: channels / rate / bits / n_samples
    (no sample copy)."""
    fmt = None
    n_bytes = None
    for tag, data in _chunks(buf):
        if tag == b"fmt ":
            tag1, ch, rate, _br, _ba, bits = \
                struct.unpack_from("<HHIIHH", data, 0)
            if tag1 != 1:
                raise ValueError(f"unsupported WAV format tag {tag1}")
            if bits != 16:
                raise ValueError(f"unsupported WAV bit depth {bits}")
            fmt = {"channels": int(ch), "rate": int(rate),
                   "bits": int(bits)}
        elif tag == b"data":
            n_bytes = len(data)
    if fmt is None or n_bytes is None:
        raise ValueError("WAV missing fmt/data chunk")
    fmt["n_samples"] = n_bytes // (2 * fmt["channels"])
    return fmt


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 samples (n,) mono / (n, ch), rate)."""
    meta = parse_fmt(buf)
    for tag, data in _chunks(buf):
        if tag == b"data":
            s = np.frombuffer(
                data, dtype="<i2",
                count=meta["n_samples"] * meta["channels"])
            s = s.reshape(-1, meta["channels"])
            return (s[:, 0] if meta["channels"] == 1 else s,
                    meta["rate"])
    raise ValueError("WAV missing data chunk")
