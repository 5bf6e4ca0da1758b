"""Pure-stdlib PNG codec (kernels/png.py) + real-codec media stages.

The decoder is validated two independent ways: roundtrip through the
repo's own encoder over every filter/color-type combination, and
against HAND-BUILT spec vectors (scanlines constructed directly from
the W3C filter definitions, not via the encoder) so a shared
encoder/decoder misunderstanding cannot cancel out.
"""

import struct
import zlib

import numpy as np
import pytest


def _chunk(tag, data):
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


_SIG = b"\x89PNG\r\n\x1a\n"


@pytest.mark.parametrize("shape", [(17, 23), (9, 5, 3), (33, 14, 4),
                                   (1, 1), (2, 300, 3)])
@pytest.mark.parametrize("filt", [None, 1, 2, 3, 4, "mixed"])
def test_png_roundtrip(shape, filt):
    from spapy_ray.kernels.png import decode_png, encode_png, \
        parse_ihdr

    rng = np.random.default_rng(hash((shape, str(filt))) % 2 ** 31)
    a = rng.integers(0, 256, size=shape).astype(np.uint8)
    f = [i % 5 for i in range(shape[0])] if filt == "mixed" else filt
    b = encode_png(a, filters=f)
    m = parse_ihdr(b)
    assert (m["height"], m["width"]) == shape[:2]
    d = decode_png(b)
    assert d.shape == a.shape
    assert (d == a).all()


def test_png_decode_spec_vectors():
    """Hand-built scanlines straight from the spec definitions."""
    from spapy_ray.kernels.png import decode_png

    # 3x2 gray: row0 Sub (f[x] = raw[x]-raw[x-1]), row1 Up
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0)
    scan = bytes([1, 10, 10, 10]) + bytes([2, 5, 5, 170])
    png = (_SIG + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(scan))
           + _chunk(b"IEND", b""))
    assert (decode_png(png)
            == np.array([[10, 20, 30], [15, 25, 200]], np.uint8)).all()

    # 2x2 gray with Paeth on row1: predictor picks nearest of
    # (left, up, upper-left) to p = left + up - ul
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    scan = bytes([0, 9, 200]) + bytes([4, 7, 100])
    png = (_SIG + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(scan))
           + _chunk(b"IEND", b""))
    assert (decode_png(png)
            == np.array([[9, 200], [16, 44]], np.uint8)).all()


def test_png_crc_and_truncation_fail_loud():
    from spapy_ray.kernels.png import decode_png, encode_png

    b = bytearray(encode_png(np.zeros((4, 4), np.uint8)))
    b[20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(b))
    with pytest.raises(ValueError):
        decode_png(encode_png(np.zeros((4, 4), np.uint8))[:-8])


def test_media_table_is_real_png():
    from spapy_ray.kernels.png import decode_png
    from spapy_ray.sources.media import gen_media_table, media_params

    t = gen_media_table(np.array([0, 7, 63]))
    for i, payload in zip(t.column("media_id").to_pylist(),
                          t.column("png").to_pylist()):
        a = decode_png(payload)
        w, h = media_params(np.array([i]))
        assert a.shape == (int(h[0]), int(w[0]))
        y, x = np.mgrid[0:a.shape[0], 0:a.shape[1]]
        assert (a == ((x * 3 + y * 5 + i * 7) % 251)).all()


def test_real_codec_resize_nearest(ray_session):
    from spapy_ray.kernels.png import decode_png
    from spapy_ray.sources.media import gen_media_table
    from spapy_ray.stages.multimodal import RealPngCodec

    c = RealPngCodec()
    t = gen_media_table(np.array([3]))
    p = t.column("png").to_pylist()[0]
    src = decode_png(p)
    out, = c.resize([p], 10, 6)
    got = decode_png(out)
    h, w = src.shape
    yi = (np.arange(6) * h) // 6
    xi = (np.arange(10) * w) // 10
    assert (got == src[yi][:, xi]).all()

    meta = c.decode_meta([p, out])
    assert meta["width"].tolist() == [w, 10]
    assert meta["height"].tolist() == [h, 6]
    assert meta["n_frames"].tolist() == [1, 1]

    feats = c.features([p])
    assert feats.shape == (1, 16)
    assert abs(feats[0, 0] - src.mean() / 255.0) < 1e-6


@pytest.mark.parametrize("shape", [(100,), (33, 2), (7, 5)])
def test_wav_roundtrip(shape):
    from spapy_ray.kernels.wav import decode_wav, encode_wav, \
        parse_fmt

    rng = np.random.default_rng(sum(shape))
    s = rng.integers(-32768, 32768, size=shape).astype(np.int16)
    b = encode_wav(s, 8000)
    m = parse_fmt(b)
    assert m["n_samples"] == shape[0]
    assert m["channels"] == (shape[1] if len(shape) > 1 else 1)
    got, rate = decode_wav(b)
    assert rate == 8000
    assert got.shape == s.shape and (got == s).all()


def test_wav_decode_handbuilt_spec_bytes():
    """RIFF bytes assembled by hand from the spec, not our encoder."""
    import struct

    from spapy_ray.kernels.wav import decode_wav

    data = struct.pack("<4h", 1, -2, 300, -32768)
    fmt = struct.pack("<HHIIHH", 1, 1, 44100, 88200, 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 8) + data)
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    s, rate = decode_wav(wav)
    assert rate == 44100
    assert s.tolist() == [1, -2, 300, -32768]


def test_wav_fails_loud():
    import struct

    from spapy_ray.kernels.wav import decode_wav, encode_wav, \
        parse_fmt

    with pytest.raises(ValueError, match="RIFF"):
        parse_fmt(b"NOT A WAVE FILE!")
    # 8-bit and non-PCM rejected
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 0))
    with pytest.raises(ValueError, match="bit depth"):
        parse_fmt(b"RIFF" + struct.pack("<I", len(body)) + body)
    with pytest.raises(ValueError):
        encode_wav(np.zeros((2, 2, 2), np.int16), 8000)
    # truncated data chunk
    good = encode_wav(np.arange(50, dtype=np.int16), 8000)
    with pytest.raises(ValueError):
        decode_wav(good[:-10])


def test_audio_table_is_real_wav(ray_session):
    from spapy_ray.kernels.wav import decode_wav
    from spapy_ray.sources.media import audio_params, gen_audio_table

    t = gen_audio_table(np.array([0, 5, 17]))
    for i, payload in zip(t.column("media_id").to_pylist(),
                          t.column("wav").to_pylist()):
        s, rate = decode_wav(payload)
        r, n = audio_params(np.array([i]))
        assert rate == int(r[0]) and len(s) == int(n[0])
        tt = np.arange(len(s), dtype=np.int64)
        want = (tt * tt + 3 * tt + 11 * i) % 2001 - 1000
        assert (s.astype(np.int64) == want).all()


def test_apng_roundtrip_and_probe():
    from spapy_ray.kernels.png import decode_apng, encode_apng, \
        encode_png, parse_actl

    rng = np.random.default_rng(9)
    frames = [rng.integers(0, 256, size=(9, 13)).astype(np.uint8)
              for _ in range(4)]
    b = encode_apng(frames)
    m = parse_actl(b)
    assert (m["width"], m["height"], m["n_frames"]) == (13, 9, 4)
    got = decode_apng(b)
    assert len(got) == 4
    assert all((g == f).all() for g, f in zip(got, frames))
    # a plain PNG is a one-frame clip
    p = encode_png(frames[0])
    assert parse_actl(p)["n_frames"] == 1
    assert (decode_apng(p)[0] == frames[0]).all()
    with pytest.raises(ValueError):
        encode_apng([])
    with pytest.raises(ValueError):
        encode_apng([frames[0], frames[0][:4]])


def test_real_apng_codec_frame_sampling(ray_session):
    import ray.data as rd

    from spapy_ray.kernels.png import decode_png
    from spapy_ray.sources.media import gen_video_table, video_params
    from spapy_ray.stages.multimodal import RealApngCodec, \
        sample_frames

    t = gen_video_table(np.array([3, 8]))
    out = sample_frames(rd.from_arrow(t), payload_col="apng",
                        codec=RealApngCodec(), stride=2,
                        max_frames=4, concurrency=2).to_pandas()
    for mid in (3, 8):
        w, h, nf = (int(v[0]) for v in video_params(np.array([mid])))
        rows = out[out["media_id"] == mid].sort_values("frame_idx")
        want_idx = list(range(0, nf, 2))
        assert rows["frame_idx"].tolist() == want_idx
        for _, r in rows.iterrows():
            a = decode_png(r["frame"])
            assert a.shape == (h, w)
            y, x = np.mgrid[0:h, 0:w]
            want = (x * 3 + y * 5 + mid * 7
                    + int(r["frame_idx"]) * 13) % 251
            assert (a == want).all()


def test_chained_pools_split_cluster(ray_session):
    from spapy_ray.util import chained_pools, cluster_cpus

    n = max(4, cluster_cpus())
    lo, hi = chained_pools(2)
    assert lo >= 1 and hi >= 2
    # two chained pools' minimums must leave CPUs for task operators
    assert 2 * lo < n
    lo3, hi3 = chained_pools(3)
    assert 3 * lo3 <= n
