"""Exact distributed order statistics (grouped quantiles).

The reference has no quantile operator; this is one of the
beyond-reference training-data-pipeline aggregates (alongside dedup /
LSH / token stats): per-key exact percentiles over a value column,
with DuckDB ``quantile_disc`` semantics — the returned value is the
element at 1-based rank ``max(1, ceil(q * n))`` of the sorted group
(rule verified numerically against DuckDB for n in 4..10, q in
{0, .25, .5, .9, 1}).

Scale design — selection by histogram refinement, never a sort:
- pass 1 (one execution): per-batch partial (key, n, min, max) folded
  by ONE groupby; driver state is O(#keys).
- refinement rounds (usually exactly one): the driver broadcasts each
  target's candidate interval; batches histogram their values into B
  bins per target (np.searchsorted, vectorized) and ONE groupby sums
  the (key, target, bin) partials — the VALUES never shuffle, only
  #targets x B counter rows do. The driver walks the cumulative
  counts to find the bin holding the target rank and narrows the
  interval; a bin whose edges are adjacent float64s resolves exactly
  without collecting anything.
- final pass: for targets whose bin population is <= ``max_collect``,
  collect just those in-interval values and take the exact rank.

Driver memory: O(#keys x #qs x bins) counters + O(max_collect) values
per unresolved target — independent of row count. The documented
contract is modest key cardinality (an aggregate result table); for
high-cardinality keys compose with the bucketed group machinery
instead (stages/relational.py).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Max, Min, Sum


def _rank(q: float, n: int) -> int:
    """DuckDB quantile_disc 1-based rank."""
    return max(1, math.ceil(q * n))


def grouped_quantile(ds, key_col: str, val_col: str, qs: list[float], *,
                     bins: int = 1024, max_collect: int = 65536,
                     max_rounds: int = 8) -> pd.DataFrame:
    """→ DataFrame (key_col, q, value): exact per-key quantile_disc
    of ``val_col`` for every q in ``qs``. NULL values must be absent
    (DuckDB drops them; the engine asserts instead of guessing)."""
    import ray.data as rd  # noqa: F401  (documents the Dataset dep)

    # ---- pass 1: per-key count/min/max (one partial per batch)
    def stats_partial(t: pa.Table) -> pa.Table:
        if t.column(val_col).null_count:
            raise ValueError(f"{val_col} contains NULLs")
        df = pd.DataFrame({"k": t.column(key_col).to_pandas(),
                           "v": t.column(val_col).to_numpy()})
        g = df.groupby("k", sort=False)["v"].agg(["count", "min", "max"])
        g = g.reset_index()
        return pa.table({key_col: pa.array(g["k"]),
                         "n": pa.array(g["count"].to_numpy(np.int64)),
                         "lo": pa.array(g["min"].to_numpy(np.float64)),
                         "hi": pa.array(g["max"].to_numpy(np.float64))})

    stats = ds.map_batches(stats_partial, batch_format="pyarrow") \
        .groupby(key_col).aggregate(Sum("n", alias_name="n"),
                                    Min("lo", alias_name="lo"),
                                    Max("hi", alias_name="hi")).to_pandas()

    # targets: one per (key, q); interval [lo, hi] INCLUSIVE, rank is
    # relative to values inside the interval (offset = count below lo)
    targets = []            # dicts, mutated across rounds
    for _, r in stats.iterrows():
        n = int(r["n"])
        for q in qs:
            targets.append({"key": r[key_col], "q": float(q),
                            "rank": _rank(float(q), n),
                            "lo": float(r["lo"]), "hi": float(r["hi"]),
                            "count": n, "value": None})
    for t in targets:       # single-value interval resolves instantly
        if t["lo"] == t["hi"]:
            t["value"] = t["lo"]

    def _edges(t) -> np.ndarray:
        e = np.linspace(t["lo"], t["hi"], bins + 1)
        e[0], e[-1] = t["lo"], t["hi"]
        return e

    rounds = 0
    while True:
        open_t = [t for t in targets
                  if t["value"] is None and t["count"] > max_collect]
        if not open_t or rounds >= max_rounds:
            break
        rounds += 1
        spec = [(t["key"], _edges(t)) for t in open_t]

        def hist_partial(tb: pa.Table, spec=spec) -> pa.Table:
            keys = tb.column(key_col).to_pandas().to_numpy()
            vals = tb.column(val_col).to_numpy()
            tid_out, bin_out, cnt_out = [], [], []
            for ti, (key, edges) in enumerate(spec):
                m = (keys == key) & (vals >= edges[0]) & (vals <= edges[-1])
                if not m.any():
                    continue
                b = np.searchsorted(edges, vals[m], side="right") - 1
                np.clip(b, 0, bins - 1, out=b)
                c = np.bincount(b, minlength=bins)
                nz = np.nonzero(c)[0]
                tid_out.append(np.full(len(nz), ti, np.int64))
                bin_out.append(nz.astype(np.int64))
                cnt_out.append(c[nz].astype(np.int64))
            if not tid_out:
                return pa.table({"tid": pa.array([], type=pa.int64()),
                                 "bin": pa.array([], type=pa.int64()),
                                 "cnt": pa.array([], type=pa.int64())})
            return pa.table({"tid": pa.array(np.concatenate(tid_out)),
                             "bin": pa.array(np.concatenate(bin_out)),
                             "cnt": pa.array(np.concatenate(cnt_out))})

        hist = ds.map_batches(hist_partial, batch_format="pyarrow") \
            .groupby(["tid", "bin"]).aggregate(
                Sum("cnt", alias_name="cnt")).to_pandas()

        for ti, t in enumerate(open_t):
            h = hist[hist["tid"] == ti]
            counts = np.zeros(bins, dtype=np.int64)
            counts[h["bin"].to_numpy()] = h["cnt"].to_numpy()
            cum = np.cumsum(counts)
            bi = int(np.searchsorted(cum, t["rank"]))
            below = int(cum[bi - 1]) if bi else 0
            edges = _edges(t)
            lo_b = float(edges[bi])
            # the last bin is inclusive of hi; interior bins are
            # half-open, so their sup is the previous float64
            hi_b = float(edges[bi + 1]) if bi == bins - 1 \
                else float(np.nextafter(edges[bi + 1], -np.inf))
            t["rank"] -= below
            t["count"] = int(counts[bi])
            t["lo"], t["hi"] = lo_b, min(hi_b, t["hi"])
            if t["lo"] == t["hi"] or np.nextafter(t["lo"], np.inf) > t["hi"]:
                # interval collapsed to (at most) one representable
                # float — every remaining value equals lo
                t["value"] = t["lo"]

    # ---- final pass: collect the (bounded) in-interval values
    open_t = [t for t in targets if t["value"] is None]
    if open_t:
        spec = [(t["key"], t["lo"], t["hi"]) for t in open_t]

        def collect_partial(tb: pa.Table, spec=spec) -> pa.Table:
            keys = tb.column(key_col).to_pandas().to_numpy()
            vals = tb.column(val_col).to_numpy()
            tid_out, val_out = [], []
            for ti, (key, lo, hi) in enumerate(spec):
                m = (keys == key) & (vals >= lo) & (vals <= hi)
                if m.any():
                    v = vals[m]
                    tid_out.append(np.full(len(v), ti, np.int64))
                    val_out.append(v)
            if not tid_out:
                return pa.table({"tid": pa.array([], type=pa.int64()),
                                 "v": pa.array([], type=pa.float64())})
            return pa.table({"tid": pa.array(np.concatenate(tid_out)),
                             "v": pa.array(np.concatenate(val_out))})

        got = ds.map_batches(collect_partial, batch_format="pyarrow") \
            .to_pandas()
        for ti, t in enumerate(open_t):
            v = np.sort(got.loc[got["tid"] == ti, "v"].to_numpy())
            t["value"] = float(v[t["rank"] - 1])

    out = pd.DataFrame({
        key_col: [t["key"] for t in targets],
        "q": np.array([t["q"] for t in targets], dtype=np.float64),
        "value": np.array([t["value"] for t in targets], dtype=np.float64),
    })
    return out.sort_values([key_col, "q"]).reset_index(drop=True)


def global_quantile(ds, val_col: str, qs: list[float], *,
                    bins: int = 1024, max_collect: int = 65536) -> dict:
    """→ {q: value}: exact corpus-wide quantile_disc of ``val_col``
    (the per-key machinery with one constant key — the values never
    shuffle, only O(bins) counters per batch)."""
    def const_key(t: pa.Table) -> pa.Table:
        return pa.table({"k__": pa.array(np.zeros(len(t), np.int8)),
                         val_col: t.column(val_col)})

    tagged = ds.map_batches(const_key, batch_format="pyarrow")
    out = grouped_quantile(tagged, "k__", val_col, qs, bins=bins,
                           max_collect=max_collect)
    return dict(zip(out["q"], out["value"]))
