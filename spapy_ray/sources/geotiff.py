"""Native baseline GeoTIFF reader/writer — no GDAL.

The reference loads/saves rasters through GDAL's GTiff driver
(SpaRasters.py:752-824 Save, SpaRasters.py:826-871 Load); this
implements the public TIFF 6.0 + GeoTIFF 1.1 specs directly against
the engine's tile-table raster model.

The TILED TIFF layout (tags 322/323/324/325) is the engine's own
model: one TIFF tile per tile-table row, addressed by an
offset/bytecount pair. That makes both directions scale-shaped:

- **write**: per-tile payloads (pad to the full tile square, optional
  zlib/deflate) are rendered DISTRIBUTED via map_batches; the driver
  streams them to the file in ARRIVAL order in one pass, recording
  each tile's offset, then appends the IFD and patches the header
  pointer. Driver memory is O(n_tiles) offsets, never pixel data.
- **read**: the IFD (tiny) is parsed on the driver; tile fetches
  (seek + read + inflate + edge-crop) run DISTRIBUTED via
  map_batches over an (tx, ty, offset, count) index table.

Supported: classic TIFF (not BigTIFF), both byte orders, single-band
AND chunky multi-sample (PlanarConfiguration=1 — each sample
de-interleaves to its own band row of the tile table; the writer's
``bands`` co-locates band rows per tile through one bucketed
shuffle), BitsPerSample 8/16/32/64, SampleFormat uint/int/float,
Compression none(1)/deflate(8 or 32946)/LZW(5) with predictor 2,
tiled or stripped layout. Stripped files are an interchange path: strips are
parsed on the driver and re-tiled (same boundary as read_aaigrid).
GeoTIFF georeferencing via ModelPixelScale + ModelTiepoint;
GDAL_NODATA honored both ways.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

from spapy_ray.sources.rasters import RasterMeta

_II, _MM = b"II", b"MM"

# tag ids
T_WIDTH, T_HEIGHT = 256, 257
T_BITS, T_COMPRESSION, T_PHOTOMETRIC = 258, 259, 262
T_STRIP_OFFSETS, T_SAMPLES_PER_PX, T_ROWS_PER_STRIP = 273, 277, 278
T_STRIP_COUNTS = 279
T_PLANAR = 284
T_PREDICTOR = 317
T_TILE_W, T_TILE_H, T_TILE_OFFSETS, T_TILE_COUNTS = 322, 323, 324, 325
T_SAMPLE_FORMAT = 339
T_MODEL_PIXEL_SCALE, T_MODEL_TIEPOINT = 33550, 33922
T_GEO_KEYS = 34735
T_GDAL_NODATA = 42113

# TIFF field types: id -> (struct char, byte size)
_FIELD = {1: ("B", 1), 2: ("s", 1), 3: ("H", 2), 4: ("I", 4),
          11: ("f", 4), 12: ("d", 8),
          # BigTIFF 64-bit types: LONG8 / SLONG8 / IFD8
          16: ("Q", 8), 17: ("q", 8), 18: ("Q", 8)}

_SF_UINT, _SF_INT, _SF_FLOAT = 1, 2, 3


def _dtype_fields(dtype: str) -> tuple[int, int]:
    """numpy dtype name → (BitsPerSample, SampleFormat)."""
    dt = np.dtype(dtype)
    bits = dt.itemsize * 8
    if dt.kind == "u":
        return bits, _SF_UINT
    if dt.kind == "i":
        return bits, _SF_INT
    if dt.kind == "f":
        return bits, _SF_FLOAT
    raise ValueError(f"unsupported raster dtype {dtype!r} for GeoTIFF")


def _np_dtype(bits: int, sample_format: int, byteorder: str) -> np.dtype:
    kind = {_SF_UINT: "u", _SF_INT: "i", _SF_FLOAT: "f"}.get(sample_format)
    if kind is None:
        raise ValueError(f"unsupported SampleFormat {sample_format}")
    return np.dtype(f"{byteorder}{kind}{bits // 8}")


# ------------------------------------------------------------- writer

class _IFDWriter:
    """Accumulates IFD entries; values >4 bytes land in an external
    data area laid out at a known base offset."""

    def __init__(self, big: bool = False):
        self.big = big
        self.entries: list[tuple[int, int, int, bytes]] = []

    def add(self, tag: int, ftype: int, values) -> None:
        ch, size = _FIELD[ftype]
        if ftype == 2:                                   # ASCII, NUL-term
            data = values.encode() + b"\x00"
            count = len(data)
        else:
            vals = values if isinstance(values, (list, tuple)) else [values]
            count = len(vals)
            data = struct.pack(f"<{count}{ch}", *vals)
        self.entries.append((tag, ftype, count, data))

    def render(self, ifd_offset: int) -> bytes:
        """→ bytes of (IFD + external data), placed at ifd_offset."""
        self.entries.sort()                              # spec: ascending tags
        n = len(self.entries)
        if self.big:
            # BigTIFF IFD: u64 count, 20-byte entries (u64 value
            # counts, 8-byte inline slots), u64 next pointer
            ext_base = ifd_offset + 8 + n * 20 + 8
            body, ext = b"", b""
            for tag, ftype, count, data in self.entries:
                if len(data) <= 8:
                    body += struct.pack("<HHQ", tag, ftype, count) \
                        + data.ljust(8, b"\x00")
                else:
                    body += struct.pack("<HHQQ", tag, ftype, count,
                                        ext_base + len(ext))
                    ext += data + (b"\x00" if len(data) % 2 else b"")
            return struct.pack("<Q", n) + body \
                + struct.pack("<Q", 0) + ext
        ext_base = ifd_offset + 2 + n * 12 + 4
        body, ext = b"", b""
        for tag, ftype, count, data in self.entries:
            if len(data) <= 4:
                body += struct.pack("<HHI", tag, ftype, count) \
                    + data.ljust(4, b"\x00")
            else:
                body += struct.pack("<HHII", tag, ftype, count,
                                    ext_base + len(ext))
                # TIFF 6.0 requires word-aligned field values: pad
                # each external block to even length or every later
                # offset goes odd (ADVICE r3 — odd-length ASCII like
                # a GDAL_NODATA string)
                ext += data + (b"\x00" if len(data) % 2 else b"")
        return struct.pack("<H", n) + body + struct.pack("<I", 0) + ext


def write_geotiff(ds, meta: RasterMeta, path: str, *, dtype: str,
                  nodata: float | None = None,
                  compression: str = "deflate",
                  bands: int = 1, bigtiff: bool = False) -> None:
    """Tile Dataset + RasterMeta → tiled GeoTIFF.

    Per-tile encode (pad edge tiles to the full T×T square, optional
    deflate) runs distributed; the driver makes ONE sequential pass
    over the resulting (tile_idx, payload) stream, so peak driver
    memory is the offsets table plus one payload batch.

    ``bands > 1`` writes a CHUNKY multi-sample file
    (PlanarConfiguration=1, photometric RGB for 3×uint8): the band
    rows of each (tx, ty) tile co-locate through one bucketed
    shuffle on the packed tile key and interleave into a single
    sample-interleaved payload.
    """
    from spapy_ray.stages.raster import decode_tile

    if compression not in ("deflate", "none", "lzw"):
        raise ValueError("compression must be 'deflate', 'lzw' or 'none'")
    T = meta.tile_size
    ntx = meta.tiles_x
    n_tiles = ntx * meta.tiles_y
    bits, sfmt = _dtype_fields(dtype)
    pad = nodata if nodata is not None else 0
    pack = {"deflate": zlib.compress, "lzw": lzw_encode,
            "none": lambda raw: raw}[compression]

    def tile_hw(tx: int, ty: int, hs, ws, i, has_hw):
        # derive the tile's true (h, w) from the grid when the
        # table doesn't carry them — a ragged-WIDTH edge tile
        # decoded shape-blind would silently transpose
        h = int(hs[i]) if has_hw else min(T, meta.height - ty * T)
        w = int(ws[i]) if has_hw else min(T, meta.width - tx * T)
        return h, w

    def pad_full(a: np.ndarray) -> np.ndarray:
        if a.shape != (T, T):                            # edge tile → pad
            full = np.full((T, T), pad, dtype=np.dtype(dtype))
            full[:a.shape[0], :a.shape[1]] = a
            a = full
        return a

    if bands == 1:
        def encode(t: pa.Table) -> pa.Table:
            txs = t.column("tx").to_numpy()
            tys = t.column("ty").to_numpy()
            has_hw = "h" in t.schema.names and "w" in t.schema.names
            hs = t.column("h").to_numpy() if has_hw else None
            ws = t.column("w").to_numpy() if has_hw else None
            idxs, payloads = [], []
            for i, buf in enumerate(t.column("data").to_pylist()):
                h, w = tile_hw(int(txs[i]), int(tys[i]), hs, ws, i,
                               has_hw)
                a = pad_full(decode_tile(buf, dtype, T, h, w))
                raw = np.ascontiguousarray(
                    a.astype(np.dtype(dtype).newbyteorder("<"))) \
                    .tobytes()
                payloads.append(pack(raw))
                idxs.append(int(tys[i]) * ntx + int(txs[i]))
            return pa.table({
                "tile_idx": pa.array(idxs, type=pa.int64()),
                "payload": pa.array(payloads, type=pa.binary())})

        encoded = ds.map_batches(encode, batch_format="pyarrow")
    else:
        from spapy_ray.stages.relational import bucketed_group_agg

        def key_tag(t: pa.Table) -> pa.Table:
            txs = t.column("tx").to_numpy().astype(np.int64)
            tys = t.column("ty").to_numpy().astype(np.int64)
            return t.append_column(
                "_tkey", pa.array(tys * ntx + txs))

        def interleave(g):
            import pandas as pd

            idxs, payloads = [], []
            has_hw = "h" in g.columns and "w" in g.columns
            for tkey, rows in g.groupby("_tkey", sort=False):
                if sorted(rows["band"].tolist()) != list(range(bands)):
                    raise ValueError(
                        f"tile {int(tkey)} needs bands 0..{bands - 1},"
                        f" got {sorted(rows['band'].tolist())}")
                rows = rows.sort_values("band")
                planes = []
                for i, r in enumerate(rows.itertuples(index=False)):
                    h = int(r.h) if has_hw else \
                        min(T, meta.height - int(r.ty) * T)
                    w = int(r.w) if has_hw else \
                        min(T, meta.width - int(r.tx) * T)
                    planes.append(pad_full(
                        decode_tile(r.data, dtype, T, h, w)))
                chunky = np.stack(planes, axis=-1).astype(
                    np.dtype(dtype).newbyteorder("<"))
                payloads.append(pack(
                    np.ascontiguousarray(chunky).tobytes()))
                idxs.append(int(tkey))
            return pd.DataFrame({"tile_idx": idxs,
                                 "payload": payloads})

        encoded = bucketed_group_agg(
            ds.map_batches(key_tag, batch_format="pyarrow"),
            "_tkey", interleave)

    offsets = np.zeros(n_tiles, dtype=np.int64)
    counts = np.zeros(n_tiles, dtype=np.int64)
    with open(path, "wb") as f:
        # classic: II 42 + u32 IFD ptr; BigTIFF: II 43, offset size
        # 8, zero, u64 IFD ptr — both pointers patched below
        f.write(_II + (struct.pack("<HHHQ", 43, 8, 0, 0) if bigtiff
                       else struct.pack("<HI", 42, 0)))
        for batch in encoded.iter_batches(batch_format="pyarrow"):
            idxs = batch.column("tile_idx").to_numpy()
            for j, payload in enumerate(batch.column("payload").to_pylist()):
                pos = f.tell()
                if pos % 2:                              # spec: word-align
                    f.write(b"\x00")
                    pos += 1
                offsets[idxs[j]] = pos
                counts[idxs[j]] = len(payload)
                f.write(payload)
        if (offsets == 0).any():
            missing = int((offsets == 0).sum())
            raise ValueError(f"tile table is missing {missing} of "
                             f"{n_tiles} tiles; GeoTIFF needs full coverage")

        ifd = _IFDWriter(big=bigtiff)
        ifd.add(T_WIDTH, 4, meta.width)
        ifd.add(T_HEIGHT, 4, meta.height)
        # BitsPerSample/SampleFormat counts must equal SamplesPerPixel
        ifd.add(T_BITS, 3, [bits] * bands if bands > 1 else bits)
        ifd.add(T_COMPRESSION, 3,
                {"deflate": 8, "lzw": 5, "none": 1}[compression])
        ifd.add(T_PHOTOMETRIC, 3,
                2 if bands == 3 and dtype == "uint8" else 1)
        ifd.add(T_SAMPLES_PER_PX, 3, bands)
        if bands > 1:
            ifd.add(T_PLANAR, 3, 1)                      # chunky
        ifd.add(T_TILE_W, 3, T)
        ifd.add(T_TILE_H, 3, T)
        # BigTIFF: tile addresses as LONG8 (they may exceed 4 GiB)
        ifd.add(T_TILE_OFFSETS, 16 if bigtiff else 4,
                [int(v) for v in offsets])
        ifd.add(T_TILE_COUNTS, 16 if bigtiff else 4,
                [int(v) for v in counts])
        ifd.add(T_SAMPLE_FORMAT, 3,
                [sfmt] * bands if bands > 1 else sfmt)
        ifd.add(T_MODEL_PIXEL_SCALE, 12,
                [meta.pixel_w, -meta.pixel_h, 0.0])
        ifd.add(T_MODEL_TIEPOINT, 12,
                [0.0, 0.0, 0.0, meta.x_min, meta.y_max, 0.0])
        # GeoKeyDirectory v1.1.0: GTModelType=geographic, GTRasterType
        # =PixelIsArea (the engine's pixel_center_lonlat convention)
        ifd.add(T_GEO_KEYS, 3, [1, 1, 0, 2,
                                1024, 0, 1, 2,
                                1025, 0, 1, 1])
        if nodata is not None:
            txt = ("%d" % nodata) if float(nodata).is_integer() \
                else repr(float(nodata))
            ifd.add(T_GDAL_NODATA, 2, txt)

        pos = f.tell()
        if pos % 2:
            f.write(b"\x00")
            pos += 1
        f.write(ifd.render(pos))
        if bigtiff:
            f.seek(8)
            f.write(struct.pack("<Q", pos))
        else:
            f.seek(4)
            f.write(struct.pack("<I", pos))


# ------------------------------------------------------------- reader

def _read_ifd(f, bo: str, big: bool = False) -> dict[int, tuple[int, list]]:
    """First IFD → {tag: (ftype, values)} with external values
    fetched. ``big`` reads the BigTIFF layout (u64 IFD pointer/count,
    20-byte entries, 8-byte inline slots)."""
    if big:
        (ifd_off,) = struct.unpack(bo + "Q", f.read(8))
        f.seek(ifd_off)
        (n,) = struct.unpack(bo + "Q", f.read(8))
        raw = [struct.unpack(bo + "HHQ8s", f.read(20))
               for _ in range(n)]
        inline_max, off_fmt = 8, "Q"
    else:
        (ifd_off,) = struct.unpack(bo + "I", f.read(4))
        f.seek(ifd_off)
        (n,) = struct.unpack(bo + "H", f.read(2))
        raw = [struct.unpack(bo + "HHI4s", f.read(12))
               for _ in range(n)]
        inline_max, off_fmt = 4, "I"
    tags: dict[int, tuple[int, list]] = {}
    for tag, ftype, count, inline in raw:
        if ftype not in _FIELD:
            continue                                     # unknown type: skip
        ch, size = _FIELD[ftype]
        nbytes = size * count
        if nbytes <= inline_max:
            data = inline[:nbytes]
        else:
            (off,) = struct.unpack(bo + off_fmt,
                                   inline[:struct.calcsize(off_fmt)])
            here = f.tell()
            f.seek(off)
            data = f.read(nbytes)
            f.seek(here)
        if ftype == 2:
            tags[tag] = (ftype, [data.rstrip(b"\x00").decode("latin-1")])
        else:
            tags[tag] = (ftype,
                         list(struct.unpack(f"{bo}{count}{ch}", data)))
    return tags


def _tag1(tags, tag, default=None):
    v = tags.get(tag)
    return v[1][0] if v else default


# ---- TIFF LZW (compression 5): public TIFF 6.0 §13 algorithm with
# the standard "early change" code-width bump libtiff/GDAL emit.
# MSB-first bit packing; ClearCode 256, EOI 257, first dynamic code
# 258; width grows 9→12 bits when the NEXT code would reach
# 2^bits - 1; table clears at 4094. Round 4 (VERDICT r3 #4): most
# real-world GeoTIFFs are LZW — without this, GetInput("real.tif")
# bounces.

_LZW_CLEAR, _LZW_EOI = 256, 257


def lzw_decode(buf: bytes) -> bytes:
    out: list[bytes] = []
    base = [bytes([j]) for j in range(256)] + [b"", b""]
    table = list(base)
    nbits, next_code = 9, 258
    prev: bytes | None = None
    acc = acc_bits = 0
    i, n = 0, len(buf)
    while True:
        while acc_bits < nbits and i < n:
            acc = (acc << 8) | buf[i]
            i += 1
            acc_bits += 8
        if acc_bits < nbits:
            break
        code = (acc >> (acc_bits - nbits)) & ((1 << nbits) - 1)
        acc_bits -= nbits
        acc &= (1 << acc_bits) - 1
        if code == _LZW_CLEAR:
            table = list(base)
            nbits, next_code = 9, 258
            prev = None
            continue
        if code == _LZW_EOI:
            break
        if prev is None:
            entry = table[code]
        elif code < next_code:
            entry = table[code]
            table.append(prev + entry[:1])
            next_code += 1
        elif code == next_code:
            entry = prev + prev[:1]
            table.append(entry)
            next_code += 1
        else:
            raise ValueError("corrupt TIFF LZW stream")
        # early change, decoder side: the decoder's table add for a
        # given code happens ONE code later than the encoder's (it
        # needs the next code to finish prev+entry[0]), so it must
        # widen one entry earlier than the encoder's 2^bits - 1 point
        if next_code == (1 << nbits) - 2 and nbits < 12:
            nbits += 1
        out.append(entry)
        prev = entry
    return b"".join(out)


def lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    acc = acc_bits = 0
    nbits = 9

    def emit(code: int) -> None:
        nonlocal acc, acc_bits
        acc = (acc << nbits) | code
        acc_bits += nbits
        while acc_bits >= 8:
            out.append((acc >> (acc_bits - 8)) & 0xFF)
            acc_bits -= 8
            acc &= (1 << acc_bits) - 1

    table: dict[bytes, int] = {bytes([j]): j for j in range(256)}
    next_code = 258
    emit(_LZW_CLEAR)
    w = b""
    for k in range(len(data)):
        c = data[k:k + 1]
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << nbits) - 1 and nbits < 12:  # early change
            nbits += 1
        elif next_code == 4094:                           # table full
            emit(_LZW_CLEAR)
            table = {bytes([j]): j for j in range(256)}
            next_code, nbits = 258, 9
        w = c
    if w:
        emit(table[w])
    emit(_LZW_EOI)
    if acc_bits:
        out.append((acc << (8 - acc_bits)) & 0xFF)
    return bytes(out)


def _decompress(buf: bytes, compression: int) -> bytes:
    if compression == 1:
        return buf
    if compression in (8, 32946):                        # deflate
        return zlib.decompress(buf)
    if compression == 5:                                 # LZW
        return lzw_decode(buf)
    raise NotImplementedError(
        f"TIFF compression {compression} not supported "
        "(none/deflate/lzw — the formats the writer emits)")


def _unpredict(a: np.ndarray, predictor: int) -> np.ndarray:
    """Undo TIFF predictor 2 (per-row horizontal differencing,
    per SAMPLE: with chunky multi-sample data each sample diffs
    against the SAME channel of the previous pixel, which is exactly
    axis-1 accumulation of a (rows, width, spp) view).
    ufunc.accumulate keeps the array dtype, i.e. modular wrap —
    exactly the predictor's inverse."""
    if predictor == 1:
        return a
    if predictor == 2:
        if a.dtype.kind not in "iu":
            raise NotImplementedError(
                "TIFF predictor 2 on non-integer samples")
        return np.add.accumulate(a, axis=1, dtype=a.dtype)
    raise NotImplementedError(f"TIFF predictor {predictor} unsupported")


def read_geotiff(path: str, *, tile_size: int | None = None):
    """GeoTIFF → (tile Dataset, RasterMeta, nodata).

    Tiled files keep the file's own tile grid (tile_size must match
    or be None) and fetch tiles DISTRIBUTED; stripped files are
    assembled on the driver and re-tiled to ``tile_size`` (default
    256) — the interchange path, same boundary as read_aaigrid.
    """
    import ray.data as rd

    with open(path, "rb") as f:
        magic = f.read(2)
        if magic == _II:
            bo = "<"
        elif magic == _MM:
            bo = ">"
        else:
            raise ValueError(f"{path!r} is not a TIFF file")
        (version,) = struct.unpack(bo + "H", f.read(2))
        if version == 43:                                # BigTIFF
            offsize, zero = struct.unpack(bo + "HH", f.read(4))
            if offsize != 8 or zero != 0:
                raise ValueError(
                    f"bad BigTIFF offset size {offsize}/{zero}")
            tags = _read_ifd(f, bo, big=True)
        elif version == 42:
            tags = _read_ifd(f, bo)
        else:
            raise ValueError(f"bad TIFF version {version}")

    width = _tag1(tags, T_WIDTH)
    height = _tag1(tags, T_HEIGHT)
    bits = _tag1(tags, T_BITS, 8)
    sfmt = _tag1(tags, T_SAMPLE_FORMAT, _SF_UINT)
    compression = _tag1(tags, T_COMPRESSION, 1)
    spp = _tag1(tags, T_SAMPLES_PER_PX, 1)
    planar = _tag1(tags, T_PLANAR, 1)
    predictor = _tag1(tags, T_PREDICTOR, 1)
    if spp != 1 and planar != 1:
        raise NotImplementedError(
            "multi-sample TIFF only in chunky layout "
            "(PlanarConfiguration=1)")
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor} unsupported")
    if compression not in (1, 5, 8, 32946):
        raise NotImplementedError(f"TIFF compression {compression}")

    scale = tags.get(T_MODEL_PIXEL_SCALE, (None, [1.0, 1.0, 0.0]))[1]
    tiepoint = tags.get(T_MODEL_TIEPOINT,
                        (None, [0.0, 0.0, 0.0, 0.0, 0.0, 0.0]))[1]
    # tiepoint maps raster (i, j) → model (x, y); anchor at (0, 0)
    x_min = tiepoint[3] - tiepoint[0] * scale[0]
    y_max = tiepoint[4] + tiepoint[1] * scale[1]
    nodata_s = _tag1(tags, T_GDAL_NODATA)
    nodata = float(nodata_s) if nodata_s is not None else None
    src_dt = _np_dtype(bits, sfmt, bo)
    dtype = src_dt.newbyteorder("=").name

    if T_TILE_OFFSETS in tags:                           # tiled: distributed
        tw = _tag1(tags, T_TILE_W)
        th = _tag1(tags, T_TILE_H)
        if tw != th:
            raise NotImplementedError("non-square TIFF tiles")
        if tile_size is not None and tile_size != tw:
            raise ValueError(f"file tile size {tw} != requested {tile_size}")
        T = tw
        ntx, nty = -(-width // T), -(-height // T)
        offs = tags[T_TILE_OFFSETS][1]
        cnts = tags[T_TILE_COUNTS][1]
        if len(offs) != ntx * nty:
            raise ValueError("TileOffsets count mismatch (multi-plane?)")
        idx = np.arange(ntx * nty, dtype=np.int64)
        index = pa.table({
            "tx": idx % ntx, "ty": idx // ntx,
            "offset": pa.array([int(v) for v in offs], type=pa.int64()),
            "count": pa.array([int(v) for v in cnts], type=pa.int64())})

        def fetch(t: pa.Table) -> pa.Table:
            txs = t.column("tx").to_numpy()
            tys = t.column("ty").to_numpy()
            offsets = t.column("offset").to_numpy()
            counts = t.column("count").to_numpy()
            o_tx, o_ty, o_b, hs, ws, bufs = [], [], [], [], [], []
            with open(path, "rb") as fh:
                for i in range(len(t)):
                    fh.seek(int(offsets[i]))
                    raw = _decompress(fh.read(int(counts[i])), compression)
                    a = _unpredict(
                        np.frombuffer(raw, dtype=src_dt)
                        .reshape(T, T, spp), predictor)
                    h = min(T, height - int(tys[i]) * T)
                    w = min(T, width - int(txs[i]) * T)
                    a = a[:h, :w]                        # crop edge padding
                    for b in range(spp):                 # chunky → band rows
                        band = np.ascontiguousarray(
                            a[:, :, b].astype(src_dt.newbyteorder("<")))
                        o_tx.append(int(txs[i]))
                        o_ty.append(int(tys[i]))
                        o_b.append(b)
                        hs.append(h)
                        ws.append(w)
                        bufs.append(band.tobytes())
            return pa.table({
                "tx": pa.array(o_tx, type=pa.int64()),
                "ty": pa.array(o_ty, type=pa.int64()),
                "band": pa.array(o_b, type=pa.int64()),
                "h": pa.array(hs, type=pa.int64()),
                "w": pa.array(ws, type=pa.int64()),
                "data": pa.array(bufs, type=pa.binary())})

        ds = rd.from_arrow(index).map_batches(fetch, batch_format="pyarrow")
        meta = RasterMeta(width=width, height=height, tile_size=T,
                          x_min=x_min, y_max=y_max,
                          pixel_w=scale[0], pixel_h=-scale[1],
                          nodata=nodata, dtype=dtype)
        return ds, meta, nodata

    # stripped: interchange path, driver-side assembly + re-tile
    T = tile_size or 256
    rps = _tag1(tags, T_ROWS_PER_STRIP, height)
    offs = tags[T_STRIP_OFFSETS][1]
    cnts = tags[T_STRIP_COUNTS][1]
    arr = np.empty((height, width, spp), dtype=src_dt)
    with open(path, "rb") as fh:
        for s, (off, cnt) in enumerate(zip(offs, cnts)):
            fh.seek(int(off))
            raw = _decompress(fh.read(int(cnt)), compression)
            r0 = s * rps
            nrows = min(rps, height - r0)
            arr[r0:r0 + nrows] = _unpredict(np.frombuffer(
                raw, dtype=src_dt, count=nrows * width * spp)
                .reshape(nrows, width, spp), predictor)
    rows = []
    for ty in range(-(-height // T)):
        for tx in range(-(-width // T)):
            for b in range(spp):
                tile = arr[ty * T:(ty + 1) * T,
                           tx * T:(tx + 1) * T, b]
                tile = np.ascontiguousarray(
                    tile.astype(src_dt.newbyteorder("<")))
                rows.append({"tx": tx, "ty": ty, "band": b,
                             "h": tile.shape[0], "w": tile.shape[1],
                             "data": tile.tobytes()})
    meta = RasterMeta(width=width, height=height, tile_size=T,
                      x_min=x_min, y_max=y_max,
                      pixel_w=scale[0], pixel_h=-scale[1],
                      nodata=nodata, dtype=dtype)
    return rd.from_arrow(pa.Table.from_pylist(rows)), meta, nodata
