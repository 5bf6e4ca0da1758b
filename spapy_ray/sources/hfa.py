"""Minimal native Erdas Imagine HFA (.img) writer/reader — no GDAL.

The reference routes .img through GDAL's HFA driver
(SpaRasters.py:776-787 Save, SpaBase.py GetInput reads it
transparently); this environment has no GDAL, so — like the native
GeoTIFF (sources/geotiff.py) and shapefile codecs — the container is
implemented directly from the public layout (the HFA structure
documented by the GDAL driver: EHFA_HEADER_TAG magic, Ehfa_File
header, a linked tree of 128-byte Ehfa_Entry nodes, little-endian
structs described by a trailing data dictionary, and raster pixels in
fixed-size virtual blocks indexed by Edms_State).

Profile written/read here (asserted, everything else fails loud):
- single band, uncompressed blocks (Edms_State compressionType 0),
- pixel types u8 / s16 / s32 / f32 / f64 (HFA pixelType enum
  indices 3, 6, 8, 9, 10),
- full-size edge blocks with zero padding (the HFA convention;
  the reader crops to width/height),
- georeferencing via Eprj_MapInfo with pixel-CENTER corner
  coordinates (upperLeftCenter = x_min + pw/2 etc — the HFA
  convention GDAL converts to a geotransform).

DIVERGENCES.md records that the container cannot be cross-validated
against GDAL in this environment: the structure tree, dictionary and
block layout follow the public documentation, and the round-trip +
struct assertions are the verification available here.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from spapy_ray.sources.rasters import RasterMeta

_MAGIC = b"EHFA_HEADER_TAG\x00"
_ENTRY_LEN = 128

# HFA pixelType enum (u1 u2 u4 u8 s8 u16 s16 u32 s32 f32 f64 c64 c128)
_PIXEL_ENUM = {"uint8": 3, "int16": 6, "int32": 8,
               "float32": 9, "float64": 10}
_ENUM_PIXEL = {v: k for k, v in _PIXEL_ENUM.items()}

# data dictionary text for the node types this module writes; each
# definition is {count:typechar name,...}TypeName, and the dictionary
# ends with '.' (HFA dictionary syntax)
_DICTIONARY = (
    "{1:lwidth,1:lheight,1:e3:thematic,athematic,fft,layerType,"
    "1:e13:u1,u2,u4,u8,s8,u16,s16,u32,s32,f32,f64,c64,c128,pixelType,"
    "1:lblockWidth,1:lblockHeight,}Eimg_Layer,"
    "{1:lnumvirtualblocks,1:lnumobjectsperblock,1:lnextobjectnum,"
    "1:e2:no compression,RLC compression,compressionType,"
    "0:pEdms_VirtualBlockInfo,blockinfo,0:pEdms_FreeIDList,freelist,"
    "1:Lmodtime,}Edms_State,"
    "{1:sfileCode,1:Loffset,1:lsize,1:e2:false,true,logvalid,"
    "1:e2:no compression,RLC compression,compressionType,}"
    "Edms_VirtualBlockInfo,"
    "{0:pcproName,1:*oEprj_Coordinate,upperLeftCenter,"
    "1:*oEprj_Coordinate,lowerRightCenter,1:*oEprj_Size,pixelSize,"
    "0:pcunits,}Eprj_MapInfo,"
    "{1:dx,1:dy,}Eprj_Coordinate,"
    "{1:dwidth,1:dheight,}Eprj_Size,."
)


def _entry(next_: int, parent: int, child: int, data: int,
           dsize: int, name: str, typ: str) -> bytes:
    b = struct.pack("<IIIIIi", next_, 0, parent, child, data, dsize)
    b += name.encode()[:63].ljust(64, b"\x00")
    b += typ.encode()[:31].ljust(32, b"\x00")
    b += struct.pack("<I", 0)  # modTime
    return b.ljust(_ENTRY_LEN, b"\x00")


def write_hfa(ds, meta: RasterMeta, path: str, *, dtype: str) -> None:
    """Tile Dataset + RasterMeta → single-band uncompressed .img.
    Blocks are meta.tile_size square (full-size, zero-padded at the
    ragged edges); tiles stream from the Dataset one batch at a time
    and seek-write into their block slot — no full-raster driver
    buffer."""
    if dtype not in _PIXEL_ENUM:
        raise ValueError(f"unsupported HFA dtype {dtype!r}")
    from spapy_ray.stages.raster import decode_tile

    T = meta.tile_size
    bx, by = meta.tiles_x, meta.tiles_y
    nblocks = bx * by
    item = np.dtype(dtype).itemsize
    bsize = T * T * item

    # fixed layout: magic+ptr | Ehfa_File | entries x4 | layer struct
    # | dms struct | blockinfo[] | mapinfo struct+subobjects | blocks
    # | dictionary
    p_file = len(_MAGIC) + 4                     # Ehfa_File position
    file_hdr_len = 4 + 4 + 4 + 2 + 4
    p_root = p_file + file_hdr_len
    p_layer = p_root + _ENTRY_LEN
    p_dms = p_layer + _ENTRY_LEN
    p_map = p_dms + _ENTRY_LEN
    p_layer_data = p_map + _ENTRY_LEN
    layer_data = struct.pack("<iiHHii", meta.width, meta.height,
                             1, _PIXEL_ENUM[dtype], T, T)
    p_dms_data = p_layer_data + len(layer_data)
    dms_fixed = struct.calcsize("<iiiH") + 8 + 8 + 4
    p_blockinfo = p_dms_data + dms_fixed
    bi_len = struct.calcsize("<HIiHH")
    p_map_data = p_blockinfo + nblocks * bi_len
    # Eprj_MapInfo: proName p(8) + 3 object ptrs (4 each) + units p(8)
    map_fixed = 8 + 4 + 4 + 4 + 8
    p_proname = p_map_data + map_fixed
    proname = b"Generic\x00"
    p_ulc = p_proname + len(proname)
    p_lrc = p_ulc + 16
    p_psz = p_lrc + 16
    p_units = p_psz + 16
    units = b"meters\x00"
    p_blocks = p_units + len(units)
    p_dict = p_blocks + nblocks * bsize

    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", p_file))
        f.write(struct.pack("<IIIHI", 1, 0, p_root, _ENTRY_LEN,
                            p_dict))
        f.write(_entry(0, 0, p_layer, 0, 0, "root", "root"))
        f.write(_entry(0, p_root, p_dms, p_layer_data,
                       len(layer_data), "Layer_1", "Eimg_Layer"))
        f.write(_entry(p_map, p_layer, 0, p_dms_data,
                       dms_fixed + nblocks * bi_len, "RasterDMS",
                       "Edms_State"))
        f.write(_entry(0, p_layer, 0, p_map_data,
                       map_fixed, "Map_Info", "Eprj_MapInfo"))
        f.write(layer_data)
        # Edms_State: counts, compressionType, blockinfo p, free p,
        # modtime
        f.write(struct.pack("<iiiH", nblocks, T * T, T * T, 0))
        f.write(struct.pack("<II", nblocks, p_blockinfo))
        f.write(struct.pack("<II", 0, 0))
        f.write(struct.pack("<I", 0))
        for i in range(nblocks):
            f.write(struct.pack("<HIiHH", 0, p_blocks + i * bsize,
                                bsize, 1, 0))
        # Eprj_MapInfo (pixel-center corner convention)
        f.write(struct.pack("<II", len(proname), p_proname))
        f.write(struct.pack("<I", p_ulc))
        f.write(struct.pack("<I", p_lrc))
        f.write(struct.pack("<I", p_psz))
        f.write(struct.pack("<II", len(units), p_units))
        f.write(proname)
        f.write(struct.pack("<dd", meta.x_min + meta.pixel_w / 2,
                            meta.y_max + meta.pixel_h / 2))
        f.write(struct.pack(
            "<dd", meta.x_min + meta.pixel_w * (meta.width - 0.5),
            meta.y_max + meta.pixel_h * (meta.height - 0.5)))
        f.write(struct.pack("<dd", meta.pixel_w, abs(meta.pixel_h)))
        f.write(units)
        # zero-fill the block region, then stream tiles into slots
        f.seek(p_dict - 1)
        f.write(b"\x00")
        for t in ds.iter_batches(batch_format="pyarrow"):
            txs = t.column("tx").to_numpy()
            tys = t.column("ty").to_numpy()
            has_hw = "h" in t.schema.names and "w" in t.schema.names
            hs = t.column("h").to_numpy() if has_hw else None
            ws = t.column("w").to_numpy() if has_hw else None
            bufs = t.column("data").to_pylist()
            for i in range(len(txs)):
                # ragged edge dims come from the grid when the table
                # carries no (h, w) columns
                th = int(hs[i]) if has_hw else \
                    min(T, meta.height - int(tys[i]) * T)
                tw = int(ws[i]) if has_hw else \
                    min(T, meta.width - int(txs[i]) * T)
                a = decode_tile(bufs[i], dtype, T, th, tw)
                if a.shape != (T, T):
                    full = np.zeros((T, T), dtype=np.dtype(dtype))
                    full[:a.shape[0], :a.shape[1]] = a
                    a = full
                bi = int(tys[i]) * bx + int(txs[i])
                f.seek(p_blocks + bi * bsize)
                f.write(np.ascontiguousarray(a).tobytes())
        f.seek(p_dict)
        f.write(_DICTIONARY.encode())


def _read_entry(buf: bytes, pos: int):
    next_, prev, parent, child, data, dsize = \
        struct.unpack_from("<IIIIIi", buf, pos)
    name = buf[pos + 24:pos + 88].split(b"\x00")[0].decode()
    typ = buf[pos + 88:pos + 120].split(b"\x00")[0].decode()
    return {"next": next_, "child": child, "data": data,
            "dsize": dsize, "name": name, "type": typ}


def _find_entries(buf: bytes, pos: int, out: list):
    while pos:
        e = _read_entry(buf, pos)
        out.append(e)
        if e["child"]:
            _find_entries(buf, e["child"], out)
        pos = e["next"]


def read_hfa(path: str):
    """.img → (tile Dataset, RasterMeta, nodata=None). The header and
    block index parse on the driver (KBs); each worker batch then
    seek-reads only its own blocks from the file — the distributed
    ingest shape of read_shapefile_dataset."""
    import ray.data as rd

    with open(path, "rb") as f:
        head = f.read(1 << 20)
    if head[:16] != _MAGIC:
        raise ValueError("not an HFA file (bad magic)")
    p_file = struct.unpack_from("<I", head, 16)[0]
    version, _free, p_root, entry_len, _p_dict = \
        struct.unpack_from("<IIIHI", head, p_file)
    if version != 1 or entry_len != _ENTRY_LEN:
        raise ValueError(f"unsupported HFA version/entry size "
                         f"{version}/{entry_len}")
    entries: list = []
    _find_entries(head, p_root, entries)
    layer = next((e for e in entries if e["type"] == "Eimg_Layer"),
                 None)
    if layer is None:
        raise ValueError("HFA has no Eimg_Layer node")
    w, h, ltype, ptype, bw, bh = \
        struct.unpack_from("<iiHHii", head, layer["data"])
    if ptype not in _ENUM_PIXEL:
        raise ValueError(f"unsupported HFA pixelType {ptype}")
    dtype = _ENUM_PIXEL[ptype]
    dms = next((e for e in entries if e["type"] == "Edms_State"),
               None)
    if dms is None:
        raise ValueError("HFA layer has no Edms_State")
    nvb, nobj, nxt, comp = struct.unpack_from("<iiiH", head,
                                              dms["data"])
    if comp != 0:
        raise ValueError("only uncompressed HFA blocks supported")
    bcount, bptr = struct.unpack_from("<II", head, dms["data"] + 14)
    bi_len = struct.calcsize("<HIiHH")
    if bptr + bcount * bi_len > len(head):
        # very large block tables overflow the 1 MB header read
        with open(path, "rb") as f:
            head = f.read(bptr + bcount * bi_len)
    blocks = []
    for i in range(bcount):
        fc, off, size, valid, bcomp = \
            struct.unpack_from("<HIiHH", head, bptr + i * bi_len)
        if bcomp != 0:
            raise ValueError("only uncompressed HFA blocks supported")
        blocks.append((off, size))
    x_min, y_max = 0.0, 0.0
    pw, ph = 1.0, -1.0
    mi = next((e for e in entries if e["type"] == "Eprj_MapInfo"),
              None)
    if mi is not None:
        base = mi["data"]
        p_ulc = struct.unpack_from("<I", head, base + 8)[0]
        p_psz = struct.unpack_from("<I", head, base + 16)[0]
        ulx, uly = struct.unpack_from("<dd", head, p_ulc)
        pw, ph_abs = struct.unpack_from("<dd", head, p_psz)
        ph = -ph_abs
        x_min = ulx - pw / 2
        y_max = uly - ph / 2
    meta = RasterMeta(width=w, height=h, tile_size=bw, x_min=x_min,
                      y_max=y_max, pixel_w=pw, pixel_h=ph,
                      dtype=dtype)
    bx = -(-w // bw)
    idx = pa.table({
        "tx": pa.array(np.arange(len(blocks)) % bx,
                       type=pa.int32()),
        "ty": pa.array(np.arange(len(blocks)) // bx,
                       type=pa.int32()),
        "off": pa.array([b[0] for b in blocks], type=pa.int64()),
        "size": pa.array([b[1] for b in blocks], type=pa.int64()),
    })

    def read_blocks(t: pa.Table) -> pa.Table:
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        offs = t.column("off").to_numpy()
        sizes = t.column("size").to_numpy()
        rows_h, rows_w, data = [], [], []
        with open(path, "rb") as f:
            for i in range(len(txs)):
                f.seek(int(offs[i]))
                raw = f.read(int(sizes[i]))
                a = np.frombuffer(raw, dtype=np.dtype(dtype)) \
                    .reshape(bh, bw)
                th = min(bh, h - int(tys[i]) * bh)
                tw = min(bw, w - int(txs[i]) * bw)
                a = a[:th, :tw]
                rows_h.append(th)
                rows_w.append(tw)
                data.append(np.ascontiguousarray(a).tobytes())
        return pa.table({
            "tx": t.column("tx"), "ty": t.column("ty"),
            "band": pa.array(np.zeros(len(txs), dtype=np.int32)),
            "h": pa.array(rows_h, type=pa.int32()),
            "w": pa.array(rows_w, type=pa.int32()),
            "data": pa.array(data, type=pa.binary())})

    ds = rd.from_arrow(idx).map_batches(read_blocks,
                                        batch_format="pyarrow")
    return ds, meta, None
