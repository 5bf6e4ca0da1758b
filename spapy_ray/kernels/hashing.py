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


def _string_bytes_matrix(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(chars, valid) — padded [n, maxlen] uint8 matrix + validity mask.

    Zero-copy views on the Arrow buffers; only the padding gather
    allocates.
    """
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64,
                                count=len(arr) + 1, offset=arr.offset * 8)
    else:
        offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32,
                                count=len(arr) + 1, offset=arr.offset * 4)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    starts = offsets[:-1].astype(np.int64)
    lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
    maxlen = int(lengths.max()) if len(lengths) else 0
    if maxlen == 0:
        return (np.zeros((len(arr), 0), dtype=np.uint8),
                np.zeros((len(arr), 0), dtype=bool))
    pos = np.arange(maxlen, dtype=np.int64)
    idx = starts[:, None] + pos[None, :]
    valid = pos[None, :] < lengths[:, None]
    np.clip(idx, 0, max(len(data) - 1, 0), out=idx)
    chars = data[idx]
    return chars, valid


def fnv1a64(strings: pa.Array | pa.ChunkedArray | list[str]) -> np.ndarray:
    """FNV-1a 64 of each string's UTF-8 bytes → uint64 array.

    numpy uint64 arithmetic wraps mod 2**64 natively, which is exactly
    the FNV recurrence h = (h ^ byte) * prime.
    """
    if isinstance(strings, pa.ChunkedArray):
        return np.concatenate([fnv1a64(c) for c in strings.chunks]) if strings.num_chunks \
            else np.zeros(0, dtype=np.uint64)
    if isinstance(strings, list):
        strings = pa.array(strings, type=pa.string())
    chars, valid = _string_bytes_matrix(strings)
    n, maxlen = chars.shape
    h = np.full(n, FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            v = valid[:, j]
            if not v.any():
                break
            hj = (h ^ chars[:, j].astype(np.uint64)) * FNV_PRIME
            h = np.where(v, hj, h)
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
