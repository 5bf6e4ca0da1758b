"""Pure-stdlib PNG codec (zlib + struct): the real pixel path behind
the multimodal stages.

The environment has no PIL/ffmpeg, but PNG's container is just
CRC-framed chunks around a zlib stream (public spec: RFC 2083 / W3C
PNG), so a complete 8-bit codec fits in numpy + zlib — the same
precedent as the native GeoTIFF/LZW codec (sources/geotiff.py).
Supported: bit depth 8, color types 0 (gray), 2 (RGB), 6 (RGBA),
interlace 0, all five scanline filters (None/Sub/Up/Average/Paeth).

Filter maths operate on RAW bytes of the current and prior scanline
(per the spec); Sub undo is a per-lane modular cumsum, Average/Paeth
undo walk pixels left-to-right (inherently sequential) with the
channel lanes vectorized — fine for the fixture/tile sizes this repo
decodes; a 100 TB media run would swap in a compiled codec behind the
same interface (multimodal.RealPngCodec).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a + b - c
    pa_, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa_ <= pb) & (pa_ <= pc), a,
                    np.where(pb <= pc, b, c))


def encode_png(arr: np.ndarray, filters=None, level: int = 6) -> bytes:
    """uint8 array (h, w) gray / (h, w, 3) RGB / (h, w, 4) RGBA →
    PNG bytes. ``filters`` is None (all rows filter 0), an int, or a
    per-row sequence of filter types 0..4."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        color = 0
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color = 2
    elif arr.ndim == 3 and arr.shape[2] == 4:
        color = 6
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    ch = _CHANNELS[color]
    h, w = arr.shape[:2]
    raw = arr.reshape(h, w * ch).astype(np.int32)
    bpp = ch
    parts = []
    prior = np.zeros(w * ch, dtype=np.int32)
    for r in range(h):
        cur = raw[r]
        if filters is None:
            f = 0
        elif hasattr(filters, "__len__"):
            f = int(filters[r])
        else:
            f = int(filters)
        left = np.zeros_like(cur)
        left[bpp:] = cur[:-bpp]
        if f == 0:
            out = cur
        elif f == 1:
            out = cur - left
        elif f == 2:
            out = cur - prior
        elif f == 3:
            out = cur - (left + prior) // 2
        elif f == 4:
            ul = np.zeros_like(prior)
            ul[bpp:] = prior[:-bpp]
            out = cur - _paeth(left, prior, ul)
        else:
            raise ValueError(f"bad filter {f}")
        parts.append(bytes([f]) + (out % 256).astype(np.uint8).tobytes())
        prior = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(b"".join(parts), level)
    return (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def _iter_chunks(buf: bytes):
    if buf[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    off = 8
    while off < len(buf):
        if off + 8 > len(buf):
            raise ValueError("truncated PNG chunk header")
        ln = struct.unpack_from(">I", buf, off)[0]
        tag = buf[off + 4:off + 8]
        data = buf[off + 8:off + 8 + ln]
        if len(data) != ln or off + 12 + ln > len(buf):
            raise ValueError("truncated PNG chunk")
        crc = struct.unpack_from(">I", buf, off + 8 + ln)[0]
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG CRC mismatch in {tag!r}")
        yield tag, data
        off += 12 + ln
        if tag == b"IEND":
            return
    raise ValueError("PNG missing IEND")


def parse_ihdr(buf: bytes) -> dict:
    """Header-only probe (no decompression): width/height/bit_depth/
    color_type/channels."""
    for tag, data in _iter_chunks(buf):
        if tag != b"IHDR":
            raise ValueError("first chunk is not IHDR")
        w, h, depth, color, comp, filt, inter = \
            struct.unpack(">IIBBBBB", data)
        if color not in _CHANNELS:
            raise ValueError(f"unsupported color type {color}")
        return {"width": int(w), "height": int(h),
                "bit_depth": int(depth), "color_type": int(color),
                "channels": _CHANNELS[color],
                "interlace": int(inter)}
    raise ValueError("empty PNG")


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (h, w) for gray, (h, w, ch) otherwise.
    Verifies every chunk CRC; raises ValueError on anything outside
    the supported profile (8-bit, color 0/2/6, interlace 0)."""
    meta = None
    idat = []
    for tag, data in _iter_chunks(buf):
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, inter = \
                struct.unpack(">IIBBBBB", data)
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color not in _CHANNELS:
                raise ValueError(f"unsupported color type {color}")
            if comp != 0 or filt != 0 or inter != 0:
                raise ValueError("unsupported compression/filter/"
                                 "interlace method")
            meta = (int(w), int(h), _CHANNELS[color])
        elif tag == b"IDAT":
            idat.append(data)
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, ch = meta
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError(f"bad decompressed length {len(raw)} for "
                         f"{w}x{h}x{ch}")
    bpp = ch
    out = np.empty((h, stride), dtype=np.int32)
    prior = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        f = raw[r * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride,
            offset=r * (stride + 1) + 1).astype(np.int32)
        if f == 0:
            rec = line
        elif f == 1:
            rec = line.copy()
            for k in range(bpp):
                rec[k::bpp] = np.cumsum(rec[k::bpp]) % 256
        elif f == 2:
            rec = (line + prior) % 256
        elif f == 3:
            rec = line.copy()
            left = np.zeros(bpp, dtype=np.int32)
            for x in range(w):
                s = x * bpp
                px = (rec[s:s + bpp]
                      + (left + prior[s:s + bpp]) // 2) % 256
                rec[s:s + bpp] = px
                left = px
        elif f == 4:
            rec = line.copy()
            left = np.zeros(bpp, dtype=np.int32)
            ul = np.zeros(bpp, dtype=np.int32)
            for x in range(w):
                s = x * bpp
                up = prior[s:s + bpp]
                px = (rec[s:s + bpp] + _paeth(left, up, ul)) % 256
                rec[s:s + bpp] = px
                left, ul = px, up
        else:
            raise ValueError(f"bad scanline filter {f}")
        out[r] = rec
        prior = out[r]
    pix = out.astype(np.uint8)
    if ch == 1:
        return pix.reshape(h, w)
    return pix.reshape(h, w, ch)


# ------------------------------------------------------------------
# APNG (animated PNG, public spec: acTL/fcTL/fdAT chunks) — the real
# VIDEO container for the multimodal stages. Profile: full-size
# frames, dispose_op 0 (none), blend_op 0 (source), 8-bit color
# types as above.

def encode_apng(frames: list[np.ndarray], delay_num: int = 1,
                delay_den: int = 10, level: int = 6) -> bytes:
    """List of same-shape uint8 frames → APNG bytes. The first frame
    is the IDAT (part of the animation); later frames are fdAT with
    running sequence numbers, per the spec."""
    if not frames:
        raise ValueError("APNG needs at least one frame")
    shape = frames[0].shape
    singles = []
    for fr in frames:
        if fr.shape != shape:
            raise ValueError("APNG frames must share one shape")
        singles.append(encode_png(fr, level=level))
    # take IHDR + raw IDAT payloads from the single-frame encodings
    def idat_of(buf: bytes) -> bytes:
        return b"".join(d for t, d in _iter_chunks(buf)
                        if t == b"IDAT")

    ihdr = next(d for t, d in _iter_chunks(singles[0])
                if t == b"IHDR")
    h, w = shape[0], shape[1]
    out = [_SIG, _chunk(b"IHDR", ihdr),
           _chunk(b"acTL", struct.pack(">II", len(frames), 0))]
    seq = 0
    for i, s in enumerate(singles):
        fctl = struct.pack(">IIIIIHHBB", seq, w, h, 0, 0,
                           delay_num, delay_den, 0, 0)
        out.append(_chunk(b"fcTL", fctl))
        seq += 1
        data = idat_of(s)
        if i == 0:
            out.append(_chunk(b"IDAT", data))
        else:
            out.append(_chunk(b"fdAT",
                              struct.pack(">I", seq) + data))
            seq += 1
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)


def parse_actl(buf: bytes) -> dict:
    """Header-only probe: IHDR dims + acTL frame count (1 for a
    plain PNG)."""
    meta = parse_ihdr(buf)
    n = 1
    for tag, data in _iter_chunks(buf):
        if tag == b"acTL":
            n = struct.unpack_from(">I", data, 0)[0]
            break
        if tag == b"IDAT":
            break
    meta["n_frames"] = int(n)
    return meta


def decode_apng(buf: bytes) -> list[np.ndarray]:
    """APNG bytes → list of full-size frames (each decoded exactly
    like a standalone PNG; a plain PNG yields one frame). Verifies
    fcTL full-frame geometry and sequence-number ordering."""
    ihdr = None
    frames: list[bytes] = []
    cur: list[bytes] | None = None
    seqs: list[int] = []
    saw_actl = False
    for tag, data in _iter_chunks(buf):
        if tag == b"IHDR":
            ihdr = data
            w, h = struct.unpack_from(">II", data, 0)
        elif tag == b"acTL":
            saw_actl = True
        elif tag == b"fcTL":
            seq, fw, fh, xo, yo = struct.unpack_from(">IIIII",
                                                     data, 0)
            if (fw, fh, xo, yo) != (w, h, 0, 0):
                raise ValueError(
                    "only full-frame APNG is supported")
            if data[24] != 0 or data[25] != 0:
                raise ValueError(
                    "only dispose none / blend source supported")
            seqs.append(seq)
            if cur is not None:
                frames.append(b"".join(cur))
            cur = []
        elif tag == b"IDAT":
            if cur is None:
                cur = []       # plain PNG (no fcTL yet)
            cur.append(data)
        elif tag == b"fdAT":
            seqs.append(struct.unpack_from(">I", data, 0)[0])
            if cur is None:
                raise ValueError("fdAT before any fcTL")
            cur.append(data[4:])
    if cur:
        frames.append(b"".join(cur))
    if saw_actl and seqs != sorted(seqs):
        raise ValueError("APNG sequence numbers out of order")
    if ihdr is None or not frames:
        raise ValueError("APNG missing IHDR or frame data")
    out = []
    for data in frames:
        single = (_SIG + _chunk(b"IHDR", ihdr)
                  + _chunk(b"IDAT", data) + _chunk(b"IEND", b""))
        out.append(decode_png(single))
    return out
