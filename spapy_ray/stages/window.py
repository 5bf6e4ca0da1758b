"""Generic per-key window operators (lag / lead / row_number /
cumulative aggregates) over an event log.

The reference engine has no window functions; this is part of the
web-pipeline extension family (sessionize / sliding windows / as-of
join live in stages/sessions.py). SQL twin: ``<fn>() OVER (PARTITION
BY key ORDER BY order_cols ROWS UNBOUNDED PRECEDING)``.

Scale contract (same as sessionize, NOTES_r2/r3):
- ONE hash-bucket shuffle on the key; a bucket holds many keys;
- per bucket a single sort + pandas *groupby transforms*
  (cumcount/shift/cumsum/cummax) — Cython kernels vectorized across
  the whole bucket, NEVER a Python call per key (the near-singleton
  map_groups anti-pattern);
- per-key state is bounded by that key's rows; no global sort.

Determinism: ``order_cols`` must be a UNIQUE ordering (include a
tiebreak id column) — with ties, lag/lead/row_number are not a
function of the data and can differ between engine and oracle runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# (out_name, kind, src) kinds understood by window_over; a framed
# rolling sum is spelled "rolling_sum:<width>" (ROWS width-1 PRECEDING
# AND CURRENT ROW)
KINDS = ("row_number", "lag", "lead", "cumsum", "cummax", "cummin",
         "delta", "rolling_sum", "group_size", "ewma_num", "ewma_den",
         "dense_rank")


def window_over(ds, *, key_col: str, order_cols: list[str],
                ops: list[tuple[str, str, str | None]],
                keep_cols: list[str] | None = None,
                buckets: int | None = None):
    """Evaluate window functions per ``key_col`` group ordered by
    ``order_cols``.

    ops: list of ``(out_name, kind, src_col)``:
      - ``row_number``: 1-based position in the ordered group (int64;
        src ignored);
      - ``lag`` / ``lead``: previous / next value of src in the group
        (first/last row per key → null; integer srcs upcast to
        float64 through pandas, the usual nullable-shift caveat);
      - ``cumsum`` / ``cummax`` / ``cummin``: running aggregate over
        rows unbounded preceding (no nulls, src dtype preserved for
        cummax/cummin — comparison only, no float arithmetic);
      - ``delta``: ``src - lag(src)`` with the first row per key
        coalesced to 0 and the src dtype restored — the typed-exact
        form for integer gap/difference columns;
      - ``rolling_sum:<w>``: framed sum over ROWS w-1 PRECEDING AND
        CURRENT ROW via a segmented cumsum-diff (typed-exact for
        integer srcs; float srcs inherit cumsum association — use an
        integer quantization when mirroring SQL);
      - ``group_size``: COUNT(*) OVER (PARTITION BY key) (int64;
        src ignored) — with row_number it yields integer
        percent_rank/cume_dist in the same single shuffle.

    Returns a Dataset with ``[key_col, *order_cols, *keep_cols,
    *out_names]`` rows (row order unspecified — downstream must not
    rely on it, exactly like SQL).
    """
    import pyarrow as pa

    for name, kind, _src in ops:
        if kind.split(":")[0] not in KINDS:
            raise ValueError(f"unknown window op kind {kind!r} ({name})")
        if kind.startswith("rolling_sum") and (":" not in kind or
                                               int(kind.split(":")[1]) < 1):
            raise ValueError(f"rolling_sum needs a width >= 1 ({name})")

    keep = keep_cols or []
    base_cols = [key_col] + list(order_cols) + list(keep)
    # de-dup while preserving order (an order col may also be kept)
    seen: dict[str, None] = {}
    for c in base_cols:
        seen.setdefault(c)
    base_cols = list(seen)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({c: [] for c in base_cols
                                 + [n for n, _, _ in ops]})
        g = g.sort_values([key_col] + list(order_cols), kind="stable")
        gb = g.groupby(key_col, sort=False)
        out = g[base_cols].copy()
        for name, kind, src in ops:
            if kind == "row_number":
                out[name] = gb.cumcount().to_numpy() + 1
            elif kind == "group_size":
                # COUNT(*) OVER (PARTITION BY key) — a Cython
                # transform, feeds rank-normalized stats
                # (percent_rank/cume_dist) without a second shuffle
                out[name] = gb[key_col].transform("size").to_numpy() \
                    .astype(np.int64)
            elif kind == "lag":
                out[name] = gb[src].shift(1).to_numpy()
            elif kind == "lead":
                out[name] = gb[src].shift(-1).to_numpy()
            elif kind == "cumsum":
                out[name] = gb[src].cumsum().to_numpy()
            elif kind == "cummax":
                out[name] = gb[src].cummax().to_numpy()
            elif kind == "cummin":
                out[name] = gb[src].cummin().to_numpy()
            elif kind.startswith("rolling_sum"):
                # framed sum (ROWS w-1 PRECEDING AND CURRENT ROW),
                # typed-exact for integer srcs: segmented cumsum-diff
                # rs[i] = cs[i] - cs[lo-1], lo = max(i-w+1, seg_start)
                w = int(kind.split(":")[1])
                v = g[src].to_numpy()
                keys_np = g[key_col].to_numpy()
                seg_new = np.ones(len(v), dtype=bool)
                seg_new[1:] = keys_np[1:] != keys_np[:-1]
                seg_start = np.maximum.accumulate(
                    np.where(seg_new, np.arange(len(v)), 0))
                cs = np.concatenate(([0], np.cumsum(v)))
                lo = np.maximum(np.arange(len(v)) - w + 1, seg_start)
                rs = cs[np.arange(1, len(v) + 1)] - cs[lo]
                if v.dtype.kind in "iu":
                    rs = rs.astype(v.dtype)
                out[name] = rs
            elif kind == "dense_rank":
                # rank by the src VALUE (ascending, ties share a
                # rank, no gaps) — DENSE_RANK() OVER (PARTITION BY
                # key ORDER BY src); value-determined, so it needs no
                # unique ordering to be deterministic
                out[name] = gb[src].rank(method="dense") \
                    .to_numpy().astype(np.int64)
            elif kind.startswith("ewma_"):
                # exact dyadic-weight EWMA over the last K rows:
                # num = sum_j v[i-j] * 2^(K-1-j), den = 2^K -
                # 2^(K-1-m) with m = available lags — both int64, so
                # the SQL twin (a banded rn self-join with 1<<(...)
                # weights) matches bit-for-bit; the ratio is the
                # truncating num // den downstream
                K = int(kind.split(":")[1])
                keys_np = g[key_col].to_numpy()
                seg_new = np.ones(len(keys_np), dtype=bool)
                seg_new[1:] = keys_np[1:] != keys_np[:-1]
                idx = np.arange(len(keys_np))
                seg_start = np.maximum.accumulate(
                    np.where(seg_new, idx, 0))
                if kind.startswith("ewma_den"):
                    m = np.minimum(idx - seg_start, K - 1)
                    out[name] = (np.int64(1 << K)
                                 - (np.int64(1) << (K - 1 - m)))
                else:
                    v = g[src].to_numpy().astype(np.int64)
                    num = v * np.int64(1 << (K - 1))
                    for j in range(1, K):
                        w = np.int64(1 << (K - 1 - j))
                        valid = idx[j:] - j >= seg_start[j:]
                        num[j:] += np.where(valid, v[:-j] * w, 0)
                    out[name] = num
            else:  # delta
                base = g[src].to_numpy()
                d = base - gb[src].shift(1).to_numpy()
                first = np.isnan(d) if d.dtype.kind == "f" \
                    else pd.isna(d)
                d = np.where(first, 0, d)
                if base.dtype.kind in "iu":
                    d = d.astype(base.dtype)
                out[name] = d
        return out

    from spapy_ray.stages.relational import _bucket_column
    from spapy_ray.util import cluster_cpus

    nbuckets = buckets or max(64, cluster_cpus() * 4)

    def tag_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("bkt__",
                               _bucket_column(t, key_col, nbuckets))

    return ds.map_batches(tag_bucket, batch_format="pyarrow") \
        .groupby("bkt__").map_groups(per_bucket, batch_format="pandas")
