"""Vectorized 64-bit FNV-1a over Arrow string columns.

Deterministic url-hash geocoding fallback (north rule: "url-derived
lat/lon") and exact-dedup keys both need a hash that (a) vectorizes in
numpy over a whole Arrow batch and (b) is reproducible in DuckDB SQL
for the driver's oracle (via ``list_reduce`` — see :func:`sql_fnv1a`).
FNV-1a is public domain and fits both.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

FNV_OFFSET = np.uint64(0xCBF29CE484222325)
FNV_PRIME = np.uint64(0x100000001B3)


def _string_offsets_data(arr: pa.Array) -> tuple[np.ndarray, np.ndarray,
                                                 np.ndarray]:
    """(starts, lengths, data) — zero-copy views on the Arrow buffers."""
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64,
                                count=len(arr) + 1, offset=arr.offset * 8)
    else:
        offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32,
                                count=len(arr) + 1, offset=arr.offset * 4)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    starts = offsets[:-1].astype(np.int64)
    lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
    return starts, lengths, data


_FNV_CHUNK = 1 << 16


def fnv1a64(strings: pa.Array | pa.ChunkedArray | list[str]) -> np.ndarray:
    """FNV-1a 64 of each string's UTF-8 bytes → uint64 array.

    numpy uint64 arithmetic wraps mod 2**64 natively, which is exactly
    the FNV recurrence h = (h ^ byte) * prime.

    Rows are processed grouped by byte length (stable argsort), in
    fixed-size chunks through three PREALLOCATED buffers: the old
    padded [n, maxlen] matrix built an n×maxlen int64 index array —
    a multi-hundred-MB fresh allocation on shingle-sized inputs,
    which this box page-faults at ~30 MB/s (NOTES_r4 allocation
    trap; 8× measured on 3.6M 87-byte grams). Grouping by length
    also removes the per-column validity mask and np.where lane
    merge entirely.
    """
    if isinstance(strings, pa.ChunkedArray):
        return np.concatenate([fnv1a64(c) for c in strings.chunks]) if strings.num_chunks \
            else np.zeros(0, dtype=np.uint64)
    if isinstance(strings, list):
        strings = pa.array(strings, type=pa.string())
    starts, lengths, data = _string_offsets_data(strings)
    n = len(strings)
    h = np.full(n, FNV_OFFSET, dtype=np.uint64)
    if n == 0:
        return h
    order = np.argsort(lengths, kind="stable")
    sl = lengths[order]
    maxlen = int(sl[-1])
    if maxlen == 0:
        return h
    # bound the working set to ~32 MB of idx regardless of maxlen
    # (long-document batches would otherwise blow the buffer up)
    chunk = max(1, min(_FNV_CHUNK, (1 << 22) // maxlen))
    idx_buf = np.empty((chunk, maxlen), dtype=np.int64)
    chr_buf = np.empty((chunk, maxlen), dtype=np.uint64)
    hh_buf = np.empty(chunk, dtype=np.uint64)
    pos = np.arange(maxlen, dtype=np.int64)
    bnd = np.flatnonzero(np.diff(sl)) + 1
    groups = np.concatenate(([0], bnd, [n]))
    with np.errstate(over="ignore"):
        for gi in range(len(groups) - 1):
            a, b = int(groups[gi]), int(groups[gi + 1])
            length = int(sl[a])
            if length == 0:
                continue
            for c0 in range(a, b, chunk):
                c1 = min(c0 + chunk, b)
                m = c1 - c0
                rows = order[c0:c1]
                idx = idx_buf[:m, :length]
                np.add(starts[rows][:, None], pos[None, :length], out=idx)
                ch = chr_buf[:m, :length]
                ch[:, :] = data[idx]
                hh = hh_buf[:m]
                hh[:] = FNV_OFFSET
                for j in range(length):
                    np.bitwise_xor(hh, ch[:, j], out=hh)
                    np.multiply(hh, FNV_PRIME, out=hh)
                h[rows] = hh
    return h


def fnv1a64_scalar(s: str) -> int:
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) % (1 << 64)
    return h


def sql_utf8_bytes(expr: str) -> str:
    """DuckDB list of UTF-8 byte values for a string expression
    (codepoints expanded arithmetically; shared by the fnv and
    rolling-hash twins)."""
    cps = (f"list_transform(range(1, length({expr}) + 1), "
           f"i -> ord(substr({expr}, i, 1)))")
    return (f"flatten(list_transform({cps}, c -> "
            "CASE WHEN c < 128 THEN [c] "
            "WHEN c < 2048 THEN [192 + c//64, 128 + c%64] "
            "WHEN c < 65536 THEN [224 + c//4096, 128 + (c//64)%64, 128 + c%64] "
            "ELSE [240 + c//262144, 128 + (c//4096)%64, 128 + (c//64)%64, "
            "128 + c%64] END))")


def sql_fnv1a(expr: str) -> str:
    """DuckDB SQL computing fnv1a64 of a string expression → UBIGINT.

    Folds over UTF-8 BYTES (codepoints expanded arithmetically), so
    the twin matches :func:`fnv1a64` for all of Unicode — not just
    ASCII (ADVICE r1). Sequential fold via list_reduce; 64-bit
    wraparound emulated with HUGEINT multiply + mod 2**64 (product
    < 2**104 < 2**127, safe).
    """
    utf8 = sql_utf8_bytes(expr)
    return (
        "list_reduce(list_prepend(14695981039346656037::UBIGINT, "
        f"list_transform({utf8}, b -> b::UBIGINT)), "
        "(h, c) -> ((xor(h, c)::HUGEINT * 1099511628211::HUGEINT) "
        "% 18446744073709551616::HUGEINT)::UBIGINT)"
    )
