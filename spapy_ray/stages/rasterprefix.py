"""Distributed raster prefix scans: segmented scans with per-band
tile carries.

Three operators share one machinery:

- :func:`integral_image` — exact summed-area table (the classic
  block-decomposed SAT: within-tile 2-D prefix + row-strip, col-strip
  and corner offsets, each an exclusive scan over the tile grid);
- :func:`distance_transform_l1` — exact city-block distance to the
  nearest mark pixel via the separable two-pass min-plus form (the
  operator class of gdal_proximity / scipy distance_transform_cdt;
  the reference has no native equivalent — raster analysis breadth
  per SpaRasters.py:1284-1498);
- :func:`horizon_visibility` — per-row westward line-of-sight: a
  pixel is visible from the row's west-edge observer iff its
  quantized slope reaches the running max of all predecessors
  (SpaTopo.py:118-180 is the hillshade/terrain family this extends).

Scale shape: the per-pixel work happens ONLY in embarrassingly
parallel per-tile map stages.  What shuffles is the per-tile summary
— at most ``tile_size`` int64 per tile regardless of pixel count —
through ONE bucketed groupby keyed on the band index (a row of tiles
for x-scans, a column for y-scans), where the exclusive scan is a
vectorized ``cumsum``/``accumulate`` over the ``[n_tiles, T]`` band
matrix.  Carries rejoin tiles via the standard salted
:func:`~spapy_ray.stages.relational.hash_join`.  A 2^20-pixel-wide
raster puts ~16k summaries x 512 B = ~8 MB in a band group — bounded
whatever the raster payload is.

All arithmetic is int64-exact (sentinels at +-2^40), so every
operator carries a bit-exact DuckDB window-function twin.

Input tiles are consumed TWICE per pass (once by the summary map,
once by the carry join) — for a parquet-backed raster that is two
streaming reads, the standard two-pass trade; nothing pins the pixel
payload.  distance_transform_l1 materializes its row-pass result
once (two downstream consumers — re-running the whole first pass per
consumer costs more; graph.pagerank's edge-materialize trade).
horizon_visibility broadcasts the observer column instead of
scanning it: O(raster height) int64 via ray.put, the zones-broadcast
pattern, so the op is ONE scan + ONE carry join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from spapy_ray.sources.rasters import RasterMeta
from spapy_ray.stages.raster import decode_tile
from spapy_ray.stages.relational import hash_join
from spapy_ray.util import cluster_cpus

SENT_MIN = -(1 << 40)          # identity for max-monoids ("-inf")
SENT_MAX = (1 << 40)           # identity for min-monoids ("+inf")

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _enc(a: np.ndarray) -> bytes:
    return np.ascontiguousarray(a, dtype=np.int64).tobytes()


def _dec(b: bytes) -> np.ndarray:
    return np.frombuffer(b, dtype=np.int64)


def _tdiv(n: np.ndarray, d: np.ndarray) -> np.ndarray:
    """Integer division truncating toward zero (== DuckDB ``//``);
    numpy's ``//`` floors, which diverges on negative numerators."""
    neg = n < 0
    out = np.where(neg, -((-n) // d), n // d)
    return out


def _pack_key(band: np.ndarray, tx: np.ndarray, ty: np.ndarray) -> np.ndarray:
    return ((band.astype(np.int64) << 42)
            | (tx.astype(np.int64) << 21) | ty.astype(np.int64))


# ------------------------------------------------------------- band scan

def _scan_matrix(m: np.ndarray, monoid: str, direction: str) -> np.ndarray:
    """EXCLUSIVE scan of the [n_tiles, width] band matrix along axis 0.
    Row i of the result folds rows [0, i) (fwd) or (i, n) (rev);
    the boundary row gets the monoid identity.  ``bcast0`` instead
    broadcasts row 0 (inclusive) to every row — used to distribute a
    band-head value (e.g. the observer column) down the band."""
    if monoid == "bcast0":
        return np.broadcast_to(m[0], m.shape).copy()
    if direction == "rev":
        return _scan_matrix(m[::-1], monoid, "fwd")[::-1]
    out = np.empty_like(m)
    if monoid == "sum":
        out[0] = 0
        np.cumsum(m[:-1], axis=0, out=out[1:])
    elif monoid == "max":
        out[0] = SENT_MIN
        np.maximum.accumulate(m[:-1], axis=0, out=out[1:])
    elif monoid == "min":
        out[0] = SENT_MAX
        np.minimum.accumulate(m[:-1], axis=0, out=out[1:])
    else:
        raise ValueError(f"unknown monoid {monoid!r}")
    return out


def band_scan(summaries, *, band_col: str, pos_col: str,
              fields: dict[str, tuple[str, str]],
              buckets: int | None = None):
    """Per-band exclusive scan of per-tile summary arrays.

    ``summaries`` rows: ``band_col`` (int64 band index), ``pos_col``
    (int64 position along the band) and binary columns of int64 array
    bytes.  ``fields`` maps column name -> (monoid, direction) with
    monoid in {sum, max, min, bcast0} and direction in {fwd, rev};
    listed columns are REPLACED by their exclusive prefix, everything
    else passes through unchanged.  One bucketed groupby — a band
    never splits across buckets, so the in-bucket scan is globally
    correct."""
    b = buckets or max(32, cluster_cpus() * 2)

    def tag(t: pa.Table) -> pa.Table:
        band = t.column(band_col).to_numpy(zero_copy_only=False)
        h = ((band.astype(np.uint64) * _MIX) >> np.uint64(33)) % np.uint64(b)
        return t.append_column("_bkt", pa.array(h.astype(np.int32)))

    group_keys = [band_col] + (["_band"] if band_col != "_band" else [])

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:                     # empty bucket block
            return g.drop(columns=["_bkt"])
        parts = []
        for _, sub in g.groupby(group_keys, sort=False):
            sub = sub.sort_values(pos_col, kind="mergesort")
            out = {band_col: sub[band_col].to_numpy(),
                   pos_col: sub[pos_col].to_numpy()}
            for c in sub.columns:
                if c in (band_col, pos_col, "_bkt") or c in fields:
                    continue
                out[c] = sub[c].to_numpy()
            for name, (monoid, direction) in fields.items():
                m = np.stack([_dec(v) for v in sub[name].to_numpy()])
                s = _scan_matrix(m, monoid, direction)
                out[name] = [_enc(r) for r in s]
            parts.append(pd.DataFrame(out))
        return pd.concat(parts, ignore_index=True)

    return (summaries.map_batches(tag, batch_format="pyarrow")
            .groupby("_bkt").map_groups(scan, batch_format="pandas"))


def attach_carries(tiles, carries, *, buckets: int | None = None):
    """Co-locate tiles with their per-tile carry rows (both keyed by
    (band, tx, ty), packed into one int64) through the standard
    bucketed hash_join — one shuffle of the tile payload."""
    def pk(t: pa.Table) -> pa.Table:
        key = _pack_key(t.column("band").to_numpy(zero_copy_only=False),
                        t.column("tx").to_numpy(zero_copy_only=False),
                        t.column("ty").to_numpy(zero_copy_only=False))
        return t.append_column("_tk", pa.array(key))

    def pk_c(t: pa.Table) -> pa.Table:
        key = _pack_key(t.column("_band").to_numpy(zero_copy_only=False),
                        t.column("_tx").to_numpy(zero_copy_only=False),
                        t.column("_ty").to_numpy(zero_copy_only=False))
        t = t.append_column("_tk", pa.array(key))
        return t.drop_columns(["_band", "_tx", "_ty"])

    left = tiles.map_batches(pk, batch_format="pyarrow")
    right = carries.map_batches(pk_c, batch_format="pyarrow")
    return hash_join(left, right, on="_tk", buckets=buckets)


def _auto_buckets(meta: RasterMeta) -> int:
    """Bucket count sized to the KNOWN tile count: ~4 tiles per
    bucket task, clamped to the usual cpu-scaled ceiling — 128
    near-empty bucket tasks on a 64-tile fixture is pure scheduling
    overhead (measured 2.4 s -> ~0.8 s per carry join), while a
    10^7-tile raster still gets the full fan-out."""
    n = meta.tiles_x * meta.tiles_y
    return int(min(max(8, n // 4), max(64, cluster_cpus() * 4)))


def _summaries(tiles, meta: RasterMeta, dtype: str, fn):
    """Map tiles -> narrow summary rows.  ``fn(arr, tx, ty) -> dict``
    of int64 scalars / int64-array bytes; (band, tx, ty) keys are
    prefixed with ``_`` so attach_carries never collides with the
    tile table's own columns."""
    T = meta.tile_size
    if meta.width % T or meta.height % T:
        raise ValueError("prefix scans require tile-aligned rasters")

    def summarize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            # derive the field schema from a probe tile so empty
            # blocks keep the full schema (schema-less empties make
            # the executor re-derive schemas downstream)
            probe = fn(np.zeros((T, T), dtype=np.int64), 0, 0)
            out = {"_band": pa.array([], pa.int64()),
                   "_tx": pa.array([], pa.int64()),
                   "_ty": pa.array([], pa.int64())}
            for k, v in probe.items():
                out[k] = pa.array([], pa.binary()
                                  if isinstance(v, bytes)
                                  else pa.int64())
            return pa.table(out)
        txs = t.column("tx").to_numpy(zero_copy_only=False)
        tys = t.column("ty").to_numpy(zero_copy_only=False)
        bands = t.column("band").to_numpy(zero_copy_only=False)
        rows: dict[str, list] = {}
        for i, buf in enumerate(t.column("data").to_pylist()):
            arr = decode_tile(buf, dtype, T).astype(np.int64)
            d = fn(arr, int(txs[i]), int(tys[i]))
            for k, v in d.items():
                rows.setdefault(k, []).append(v)
        out = {"_band": pa.array(bands.astype(np.int64)),
               "_tx": pa.array(txs.astype(np.int64)),
               "_ty": pa.array(tys.astype(np.int64))}
        for k, vals in rows.items():
            out[k] = (pa.array(vals, type=pa.binary())
                      if isinstance(vals[0], bytes)
                      else pa.array(vals, type=pa.int64()))
        return pa.table(out)

    return tiles.map_batches(summarize, batch_format="pyarrow")


def _emit_tiles(joined, meta: RasterMeta, dtype: str, fn):
    """Finalize: per joined (tile + carries) row, ``fn(arr, carries
    dict, tx, ty) -> int64 tile``; emits the standard tile table."""
    T = meta.tile_size

    def finalize(t: pa.Table) -> pa.Table:
        txs = t.column("tx").to_numpy(zero_copy_only=False)
        tys = t.column("ty").to_numpy(zero_copy_only=False)
        bands = t.column("band").to_numpy(zero_copy_only=False)
        carry_cols = [c for c in t.column_names
                      if c not in ("tx", "ty", "band", "data")
                      and not c.startswith("_")]
        data = t.column("data").to_pylist()
        carries = {c: t.column(c).to_pylist() for c in carry_cols}
        out = []
        for i, buf in enumerate(data):
            arr = decode_tile(buf, dtype, T).astype(np.int64)
            cd = {c: (_dec(carries[c][i])
                      if isinstance(carries[c][i], bytes)
                      else int(carries[c][i])) for c in carry_cols}
            res = fn(arr, cd, int(txs[i]), int(tys[i]))
            out.append(_enc(res))
        return pa.table({
            "tx": pa.array(txs, type=pa.int32()),
            "ty": pa.array(tys, type=pa.int32()),
            "band": pa.array(bands, type=pa.int32()),
            "data": pa.array(out, type=pa.binary()),
        })

    return joined.map_batches(finalize, batch_format="pyarrow")


# --------------------------------------------------------- integral image

def integral_image(tiles, meta: RasterMeta, *, dtype: str = "int32",
                   buckets: int | None = None):
    """Exact distributed summed-area table: SAT(x, y) = sum of all
    pixels with px <= x and py <= y, as an int64 tile table.

    Block decomposition: SAT = P + R[ly] + C[lx] + D with P the
    within-tile inclusive 2-D prefix, R the same-band left row
    strips, C the same-column upper col strips, D the corner total —
    R and the x-prefix of tile totals come from one x band_scan,
    C and D from one y band_scan over its output."""
    T = meta.tile_size
    buckets = buckets or _auto_buckets(meta)

    def summ(arr, tx, ty):
        return {"rs": _enc(arr.sum(axis=1).cumsum()),
                "cs": _enc(arr.sum(axis=0).cumsum()),
                "s": int(arr.sum())}

    s = _summaries(tiles, meta, dtype, summ)
    # x scan (band = row of tiles): R[ly] and E = sum of left totals
    sx = band_scan(
        s.map_batches(lambda t: t.append_column(
            "e", pc.cast(t.column("s"), pa.int64())), batch_format="pyarrow")
        .map_batches(_to_arr_cols(["e"]), batch_format="pyarrow"),
        band_col="_ty", pos_col="_tx",
        fields={"rs": ("sum", "fwd"), "e": ("sum", "fwd")}, buckets=buckets)
    # y scan (band = column of tiles): C[lx] and D = y-prefix of E
    sy = band_scan(sx, band_col="_tx", pos_col="_ty",
                   fields={"cs": ("sum", "fwd"), "e": ("sum", "fwd")},
                   buckets=buckets)

    def drop_s(t: pa.Table) -> pa.Table:
        return t.drop_columns(["s"])

    joined = attach_carries(
        tiles, sy.map_batches(drop_s, batch_format="pyarrow"),
        buckets=buckets)

    def fin(arr, cd, tx, ty):
        p = arr.cumsum(axis=0).cumsum(axis=1)
        d = int(cd["e"][0])
        return p + cd["rs"][:, None] + cd["cs"][None, :] + d

    out_meta = RasterMeta(width=meta.width, height=meta.height,
                          tile_size=T, x_min=meta.x_min, y_max=meta.y_max,
                          pixel_w=meta.pixel_w, pixel_h=meta.pixel_h,
                          dtype="int64")
    return _emit_tiles(joined, meta, dtype, fin), out_meta


def _to_arr_cols(names: list[str]):
    """Scalar int64 columns -> 1-element int64-array bytes so they
    ride the same band_scan field machinery as the strip arrays."""
    def conv(t: pa.Table) -> pa.Table:
        for n in names:
            vals = t.column(n).to_numpy(zero_copy_only=False)
            t = t.drop_columns([n]).append_column(
                n, pa.array([_enc(np.array([v])) for v in vals],
                            type=pa.binary()))
        return t
    return conv


# ---------------------------------------------------- L1 distance transform

def distance_transform_l1(tiles, meta: RasterMeta, *, mark_value: int = 0,
                          dtype: str = "int32",
                          buckets: int | None = None):
    """Exact city-block (L1) distance to the nearest mark pixel
    (``value == mark_value``), separable two-pass min-plus form:

    row pass   g(x,y) = min(x - Lmax, Rmin - x) over the row's marks
    col pass   d(x,y) = min(y + min_{y'<=y}(g - y'),
                            -y + min_{y'>=y}(g + y'))

    Both passes are per-band scans whose carries are ONE int64 per
    tile row/column (the running mark extremum / min-plus potential),
    so the shuffle volume is tile_size int64 per tile per pass.
    Distances saturate at SENT_MAX when no mark exists anywhere."""
    T = meta.tile_size
    buckets = buckets or _auto_buckets(meta)

    def summ_row(arr, tx, ty):
        xs = np.arange(tx * T, tx * T + T, dtype=np.int64)
        mark = arr == mark_value
        mp = np.where(mark, xs[None, :], SENT_MIN)
        mr = np.where(mark, xs[None, :], SENT_MAX)
        return {"lmax": _enc(mp.max(axis=1)), "rmin": _enc(mr.min(axis=1))}

    s1 = _summaries(tiles, meta, dtype, summ_row)
    c1 = band_scan(s1, band_col="_ty", pos_col="_tx",
                   fields={"lmax": ("max", "fwd"), "rmin": ("min", "rev")},
                   buckets=buckets)

    def fin_row(arr, cd, tx, ty):
        xs = np.arange(tx * T, tx * T + T, dtype=np.int64)
        mark = arr == mark_value
        mp = np.where(mark, xs[None, :], SENT_MIN)
        run_l = np.maximum(np.maximum.accumulate(mp, axis=1),
                           cd["lmax"][:, None])
        mr = np.where(mark, xs[None, :], SENT_MAX)
        run_r = np.minimum(np.minimum.accumulate(mr[:, ::-1],
                                                 axis=1)[:, ::-1],
                           cd["rmin"][:, None])
        g = np.minimum(xs[None, :] - run_l, run_r - xs[None, :])
        return np.minimum(g, SENT_MAX)

    # two consumers below (column summaries + the carry join) — pin
    # the row-pass result once instead of re-running the whole first
    # pass per consumer (same trade as horizon's slope tiles)
    g_tiles = _emit_tiles(attach_carries(tiles, c1, buckets=buckets),
                          meta, dtype, fin_row).materialize()

    def summ_col(g, tx, ty):
        ys = np.arange(ty * T, ty * T + T, dtype=np.int64)
        return {"a": _enc((g - ys[:, None]).min(axis=0)),
                "b": _enc((g + ys[:, None]).min(axis=0))}

    s2 = _summaries(g_tiles, meta, "int64", summ_col)
    c2 = band_scan(s2, band_col="_tx", pos_col="_ty",
                   fields={"a": ("min", "fwd"), "b": ("min", "rev")},
                   buckets=buckets)

    def fin_col(g, cd, tx, ty):
        ys = np.arange(ty * T, ty * T + T, dtype=np.int64)[:, None]
        run_a = np.minimum(np.minimum.accumulate(g - ys, axis=0),
                           cd["a"][None, :])
        run_b = np.minimum(np.minimum.accumulate((g + ys)[::-1],
                                                 axis=0)[::-1],
                           cd["b"][None, :])
        d = np.minimum(ys + run_a, run_b - ys)
        return np.minimum(d, SENT_MAX)

    out = _emit_tiles(attach_carries(g_tiles, c2, buckets=buckets),
                      meta, "int64", fin_col)
    out_meta = RasterMeta(width=meta.width, height=meta.height,
                          tile_size=T, x_min=meta.x_min, y_max=meta.y_max,
                          pixel_w=meta.pixel_w, pixel_h=meta.pixel_h,
                          dtype="int64")
    return out, out_meta


# ------------------------------------------------------ horizon visibility

HORIZON_SHIFT = 20


def horizon_visibility(tiles, meta: RasterMeta, *, dtype: str = "int32",
                       buckets: int | None = None):
    """Westward line-of-sight per raster row: the observer sits on the
    row's x = 0 pixel; pixel x >= 1 is visible iff its quantized slope
    q = trunc((z - z0) << 20 / x) reaches the running max over
    1..x-1 (empty max = -inf, so x = 1 is always visible).

    The observer column is O(raster height) int64 — it broadcasts
    whole (one narrow filter pass over the tx == 0 tiles, ray.put,
    read in every map task; the zones-broadcast pattern), so the only
    shuffled state is the running-slope max: ONE band scan + ONE
    carry join.  Returns per-tile (n_visible, sum_q_visible)."""
    import ray

    T = meta.tile_size
    buckets = buckets or _auto_buckets(meta)

    def z0_rows(t: pa.Table) -> pa.Table:
        tx = t.column("tx").to_numpy(zero_copy_only=False)
        keep = tx == 0
        t = t.filter(pa.array(keep))
        tys = t.column("ty").to_numpy(zero_copy_only=False)
        bands = t.column("band").to_numpy(zero_copy_only=False)
        cols = [decode_tile(b, dtype, T).astype(np.int64)[:, 0]
                for b in t.column("data").to_pylist()]
        return pa.table({
            "band": pa.array(bands.astype(np.int64)),
            "ty": pa.array(tys.astype(np.int64)),
            "z0": pa.array([_enc(c) for c in cols], type=pa.binary()),
        })

    zt = {}
    for b in tiles.map_batches(z0_rows, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        for band, ty, buf in zip(b.column("band").to_pylist(),
                                 b.column("ty").to_pylist(),
                                 b.column("z0").to_pylist()):
            zt[(band, ty)] = _dec(buf)
    z0_ref = ray.put(zt)

    def qslope_tile(arr, z0, tx):
        xs = np.arange(tx * T, tx * T + T, dtype=np.int64)[None, :]
        d = (arr - z0[:, None]) << HORIZON_SHIFT
        q = _tdiv(d, np.maximum(xs, 1))
        if tx == 0:
            q[:, 0] = SENT_MIN          # the observer never occludes
        return q

    def summ_q(t: pa.Table, _ref=z0_ref) -> pa.Table:
        zmap = ray.get(_ref)
        txs = t.column("tx").to_numpy(zero_copy_only=False)
        tys = t.column("ty").to_numpy(zero_copy_only=False)
        bands = t.column("band").to_numpy(zero_copy_only=False)
        mx = []
        for i, buf in enumerate(t.column("data").to_pylist()):
            arr = decode_tile(buf, dtype, T).astype(np.int64)
            q = qslope_tile(arr, zmap[(int(bands[i]), int(tys[i]))],
                            int(txs[i]))
            mx.append(_enc(q.max(axis=1)))
        return pa.table({
            "_band": pa.array(bands.astype(np.int64)),
            "_tx": pa.array(txs.astype(np.int64)),
            "_ty": pa.array(tys.astype(np.int64)),
            "qmax": pa.array(mx, type=pa.binary()),
        })

    summaries = tiles.map_batches(summ_q, batch_format="pyarrow")
    c_max = band_scan(summaries, band_col="_ty", pos_col="_tx",
                      fields={"qmax": ("max", "fwd")}, buckets=buckets)
    joined = attach_carries(tiles, c_max, buckets=buckets)

    def fin_stats(t: pa.Table, _ref=z0_ref) -> pa.Table:
        zmap = ray.get(_ref)
        txs = t.column("tx").to_numpy(zero_copy_only=False)
        tys = t.column("ty").to_numpy(zero_copy_only=False)
        bands = t.column("band").to_numpy(zero_copy_only=False)
        carries = t.column("qmax").to_pylist()
        nvis, sq = [], []
        for i, buf in enumerate(t.column("data").to_pylist()):
            arr = decode_tile(buf, dtype, T).astype(np.int64)
            q = qslope_tile(arr, zmap[(int(bands[i]), int(tys[i]))],
                            int(txs[i]))
            prev = np.empty_like(q)
            prev[:, 0] = _dec(carries[i])
            np.maximum.accumulate(q[:, :-1], axis=1, out=prev[:, 1:])
            prev[:, 1:] = np.maximum(prev[:, 1:],
                                     _dec(carries[i])[:, None])
            vis = q >= prev
            if int(txs[i]) == 0:
                vis[:, 0] = False       # observer column excluded
            nvis.append(int(vis.sum()))
            sq.append(int(q[vis].sum()))
        return pa.table({
            "tx": pa.array(txs.astype(np.int64)),
            "ty": pa.array(tys.astype(np.int64)),
            "n_visible": pa.array(nvis, type=pa.int64()),
            "sum_q_visible": pa.array(sq, type=pa.int64()),
        })

    return joined.map_batches(fin_stats, batch_format="pyarrow")
