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
import pyarrow.compute as pc

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


# ------------------------------------------- mergeable quantile sketch

def _compact_levels(levels: dict, k: int) -> dict:
    """KLL-lite compaction: any level holding more than ``k`` values
    sorts, keeps the even-index half, and promotes it one level up
    (weight doubles). Deterministic (always the even offset): the
    per-compaction rank drift is at most its weight, so total rank
    error is bounded by sum of compacted weights ~ O(n/k) with log
    depth — the pytest pins a generous envelope on random data."""
    if not levels:
        return {}
    lv = 0
    while True:
        vals = levels.get(lv)
        if vals is not None and len(vals) > k:
            vals = np.sort(vals, kind="stable")
            keep = vals[:0]
            if len(vals) % 2:
                # compact an EVEN count (ADVICE r3): promoting
                # ceil(n/2) of an odd level inflates total sketch
                # weight by one unit per compaction; hold one element
                # back at this level (it keeps its exact weight) and
                # halve the even remainder.
                keep = vals[-1:]
                vals = vals[:-1]
            promoted = vals[0::2]
            levels[lv] = keep
            levels[lv + 1] = np.concatenate(
                [levels.get(lv + 1, vals[:0]), promoted])
        elif lv > max(levels.keys()):
            return {l_: v for l_, v in levels.items() if len(v)}
        lv += 1
        if lv > 64:
            raise RuntimeError("sketch compaction ran away")


def _levels_to_table(levels: dict) -> "pa.Table":
    import pyarrow as pa

    lvs, vls = [], []
    for l_, v in sorted(levels.items()):
        lvs.append(np.full(len(v), l_, dtype=np.int8))
        vls.append(v.astype(np.float64))
    if not lvs:
        return pa.table({"lvl": pa.array([], type=pa.int8()),
                         "val": pa.array([], type=pa.float64())})
    return pa.table({"lvl": pa.array(np.concatenate(lvs)),
                     "val": pa.array(np.concatenate(vls))})


def _table_to_levels(t) -> dict:
    lv = t.column("lvl").to_numpy()
    va = t.column("val").to_numpy()
    return {int(l_): va[lv == l_] for l_ in np.unique(lv)}


def quantile_sketch(ds, col: str, qs: list[float], *,
                    capacity: int = 65536, fan: int = 32):
    """One-pass mergeable quantile sketch (KLL-lite) over ``col`` —
    the streaming complement to the exact histogram-refinement path
    (grouped_quantile needs a second pass per refinement round; the
    sketch folds in one tree reduce like heavy_hitters /
    approx_distinct_hll).

    Each block builds level buffers (level-i values weigh 2^i);
    sketches tree-reduce through two fixed repartition levels; the
    final task walks the weighted sorted values to DuckDB
    ``quantile_disc`` ranks max(1, ceil(q*W)).

    EXACT while nothing compacts (total rows <= capacity — the regime
    the oracled query pins); beyond that, rank error is O(n/capacity)
    with deterministic compaction (pytest envelope).

    Returns a one-block Dataset (q, value)."""
    import pyarrow as pa

    def block_sketch(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        return _levels_to_table(_compact_levels({0: v}, capacity))

    def merge(t: pa.Table) -> pa.Table:
        return _levels_to_table(
            _compact_levels(_table_to_levels(t), capacity))

    def finish(t: pa.Table) -> pa.Table:
        levels = _table_to_levels(t)
        vals = np.concatenate([v for v in levels.values()]) \
            if levels else np.array([], dtype=np.float64)
        wts = np.concatenate(
            [np.full(len(v), 1 << l_, dtype=np.int64)
             for l_, v in levels.items()]) \
            if levels else np.array([], dtype=np.int64)
        order = np.argsort(vals, kind="stable")
        vals, wts = vals[order], wts[order]
        cum = np.cumsum(wts)
        total = int(cum[-1]) if len(cum) else 0
        out_q, out_v = [], []
        for q in qs:
            if total == 0:
                continue
            rank = max(1, int(np.ceil(q * total)))
            i = int(np.searchsorted(cum, rank))
            out_q.append(q)
            out_v.append(vals[min(i, len(vals) - 1)])
        return pa.table({"q": pa.array(np.array(out_q, dtype=np.float64)),
                         "value": pa.array(np.array(out_v,
                                                    dtype=np.float64))})

    s = ds.map_batches(block_sketch, batch_format="pyarrow")
    s = s.repartition(fan).map_batches(merge, batch_format="pyarrow",
                                       batch_size=None)
    return s.repartition(1) \
        .map_batches(merge, batch_format="pyarrow", batch_size=None) \
        .map_batches(finish, batch_format="pyarrow", batch_size=None)


def _f64_sortable_u64(v: np.ndarray) -> np.ndarray:
    """Order-preserving float64 -> uint64 bijection (flip sign bit on
    positives, all bits on negatives) — the standard radix-sort key
    trick; NaN sorts above +inf and is the caller's problem."""
    b = np.ascontiguousarray(v, dtype=np.float64).view(np.uint64)
    neg = (b >> np.uint64(63)) == 1
    out = b.copy()
    out[neg] = ~b[neg]
    out[~neg] = b[~neg] | np.uint64(1) << np.uint64(63)
    return out


def exact_global_ranks(ds, col: str, ranks: list[int], *,
                       weight_col: str | None = None,
                       digit_bits: int = 16):
    """EXACT order statistics at arbitrary 0-based global ranks
    WITHOUT a global sort: distributed radix selection. Four rounds
    (64 / digit_bits) of per-block masked bincount histograms; each
    round pins ``digit_bits`` more high bits of every target's value,
    and the exchange carries only (blocks x active-prefixes x 2^bits)
    int64 counts — never a row. The per-round fold is a plain
    integer sum, so the result is deterministic at any scale and
    bit-identical to the SQL FILTER-by-rank twin. This is the
    equi-depth range-partition planner (exact splitters for
    repartition-by-range) and the exact complement of the KLL sketch.

    Values are float64 (mapped through the order-preserving uint64
    bijection) — int64 columns pass through exactly (2^53 caveat:
    ints beyond float64 precision need a dedicated int path).
    Returns pandas (rank, value) sorted by rank.

    With ``weight_col`` (non-negative int64 weights), histograms fold
    WEIGHT SUMS instead of counts and a rank r picks the smallest
    value whose cumulative weight (value-ascending) EXCEEDS r —
    weighted order statistics (weighted median at r = (W-1)//2, W =
    total weight), same passes, same exchange shape.
    """
    targets = sorted(set(int(r) for r in ranks))
    if not targets:
        return pd.DataFrame({"rank": [], "value": []})
    rounds = 64 // digit_bits
    mask_digit = (1 << digit_bits) - 1

    # state per target: known prefix (uint64) and the residual rank
    # within the rows matching that prefix
    prefixes = {t: (np.uint64(0), t) for t in targets}

    for rnd in range(rounds):
        shift = np.uint64(64 - digit_bits * (rnd + 1))
        pmask = (~np.uint64(0)) << np.uint64(64 - digit_bits * rnd) \
            if rnd else np.uint64(0)
        uniq = sorted(set(p for p, _ in prefixes.values()))
        pidx = {p: i for i, p in enumerate(uniq)}

        def hist(t: pa.Table, _uniq=tuple(uniq), _pmask=pmask,
                 _shift=shift) -> pa.Table:
            u = _f64_sortable_u64(
                t.column(col).to_numpy(zero_copy_only=False)
                .astype(np.float64))
            wts = (t.column(weight_col)
                   .to_numpy(zero_copy_only=False).astype(np.int64)
                   if weight_col else None)
            out = np.zeros((len(_uniq), 1 << digit_bits),
                           dtype=np.int64)
            hp = u & _pmask
            dig = ((u >> _shift) & np.uint64(mask_digit)) \
                .astype(np.int64)
            for i, p in enumerate(_uniq):
                m = hp == p
                if m.any():
                    out[i] = np.bincount(
                        dig[m], minlength=1 << digit_bits,
                        weights=wts[m] if wts is not None else None
                    ).astype(np.int64)
            return pa.table({
                "pi": pa.array(np.repeat(
                    np.arange(len(_uniq), dtype=np.int64),
                    1 << digit_bits)),
                "d": pa.array(np.tile(
                    np.arange(1 << digit_bits, dtype=np.int64),
                    len(_uniq))),
                "c": pa.array(out.ravel())})

        read_cols = [col] + ([weight_col] if weight_col else [])
        folded = ds.select_columns(read_cols) \
            .map_batches(hist, batch_format="pyarrow").to_pandas()
        h = np.zeros((len(uniq), 1 << digit_bits), dtype=np.int64)
        np.add.at(h, (folded["pi"].to_numpy(),
                      folded["d"].to_numpy()),
                  folded["c"].to_numpy())
        cum = np.cumsum(h, axis=1)

        nxt = {}
        for t, (p, r) in prefixes.items():
            row = pidx[p]
            d = int(np.searchsorted(cum[row], r, side="right"))
            below = int(cum[row][d - 1]) if d else 0
            nxt[t] = (p | (np.uint64(d) << shift), r - below)
        prefixes = nxt

    sign = np.uint64(1) << np.uint64(63)
    u = np.array([prefixes[t][0] for t in targets], dtype=np.uint64)
    was_neg = (u >> np.uint64(63)) == 0
    bits = np.where(was_neg, ~u, u & ~sign)
    vals = bits.view(np.float64)
    return pd.DataFrame({"rank": np.array(targets, dtype=np.int64),
                         "value": vals})


def gini_exact(ds, col: str, *, window: int = 4096,
               buckets: int | None = None):
    """Exact Gini coefficient of a non-negative int64 column — the
    inequality statistic, as a ratio of big integers:

        G = (2*S1 - (n+1)*S) / (n*S),  S1 = sum_i rank_i * x_(i)

    (1-based ranks over the sorted multiset; a tie block's rank SUM
    is order-invariant, so S1 is well-defined without a tiebreak).

    Distribution is the two_sample_ks value-window pattern: ONE
    shuffle co-partitions values by v // window; per-window
    (count, sum) partials prefix-sum on the driver into rank
    offsets; each window then folds its LOCAL rank-weighted sum
    (one sort + one dot product) and S1 = sum(off_w * S_w + local_w)
    assembles in Python big ints. Exchange = per-window summaries.
    Returns one row (n, s_sum, s1_sum, gini_q), gini_q =
    trunc(1e6 * G).
    """
    import ray
    from ray.data.aggregate import Sum

    from spapy_ray.stages.relational import bucketed_group_agg

    def tag(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"v": pa.array(v), "w": pa.array(v // window)})

    u = ds.map_batches(tag, batch_format="pyarrow").materialize()

    def totals(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"w": t.column("w").to_numpy()})
        df["s"] = t.column("v").to_numpy()
        g = df.groupby("w", sort=False).agg(c=("s", "size"),
                                            s=("s", "sum")) \
            .reset_index()
        g["c"] = g["c"].astype(np.int64)
        g["s"] = g["s"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    tot = u.map_batches(totals, batch_format="pyarrow") \
        .groupby("w").aggregate(Sum("c", alias_name="c"),
                                Sum("s", alias_name="s")) \
        .to_pandas().sort_values("w")
    ws = tot["w"].to_numpy(dtype=np.int64)
    cs = tot["c"].to_numpy(dtype=np.int64)
    ss = tot["s"].to_numpy(dtype=np.int64)
    n = int(cs.sum())
    s = int(ss.sum())
    offs = {int(w): int(o) for w, o in
            zip(ws, np.r_[0, np.cumsum(cs)[:-1]])}
    ref = ray.put(offs)

    def local(g: pd.DataFrame, _ref=ref) -> pd.DataFrame:
        offs_ = ray.get(_ref)
        rows = []
        for w, gg in g.groupby("w", sort=False):
            v = np.sort(gg["v"].to_numpy())
            j = np.arange(1, len(v) + 1, dtype=np.int64)
            rows.append((int(offs_[int(w)]) * int(v.sum())
                         + int(np.dot(j, v)),))
        return pd.DataFrame(rows, columns=["s1"]).astype(object)

    parts = bucketed_group_agg(u, "w", local, buckets=buckets) \
        .to_pandas()
    s1 = int(sum(int(x) for x in parts["s1"])) if len(parts) else 0
    num = 2 * s1 - (n + 1) * s
    den = n * s
    q = 10 ** 6
    gq = 0 if den == 0 else \
        (1 if (num >= 0) == (den >= 0) else -1) \
        * (abs(num) * q // abs(den))
    return pd.DataFrame({
        "n": [n], "s_sum": [s], "s1_sum": [s1],
        "gini_q": [gq]}).astype(np.int64)


def global_rank_attach(ds, val_col: str, id_col: str, *,
                       shift: int = 48, buckets: int | None = None):
    """Attach the EXACT global 0-based rank of (val, id) to every
    row — a distributed global sort expressed as range partitioning:
    rows co-partition by the value's top bits (uint64 values →
    w = v >> shift, ONE shuffle that is already range-ordered), the
    per-window counts prefix-sum on the driver into starting ranks,
    and each window sorts locally. No all-to-all sort operator, no
    driver materialization of rows.

    With val = a salted hash this is the deterministic epoch-shuffle
    order of a training pipeline (verifiable, seed-reproducible);
    with val = any uint64-encoded sort key it is ORDER BY rank
    attach. Returns Dataset(id, pos)."""
    import ray
    from ray.data.aggregate import Count

    from spapy_ray.stages.relational import bucketed_group_agg

    def tag(t: pa.Table) -> pa.Table:
        v = t.column(val_col).to_numpy(zero_copy_only=False) \
            .view(np.uint64)
        return pa.table({
            "v": pa.array(v.view(np.int64)),
            "id": pc.cast(t.column(id_col), pa.int64()),
            "w": pa.array((v >> np.uint64(shift))
                          .astype(np.int64))})

    u = ds.map_batches(tag, batch_format="pyarrow").materialize()
    tot = u.groupby("w").aggregate(Count(alias_name="c")) \
        .to_pandas().sort_values("w")
    ws = tot["w"].to_numpy(dtype=np.int64)
    cs = tot["c"].to_numpy(dtype=np.int64)
    offs = {int(w): int(o) for w, o in
            zip(ws, np.r_[0, np.cumsum(cs)[:-1]])}
    ref = ray.put(offs)

    def local(g: pd.DataFrame, _ref=ref) -> pd.DataFrame:
        offs_ = ray.get(_ref)
        out = []
        for w, gg in g.groupby("w", sort=False):
            v = gg["v"].to_numpy().view(np.uint64)
            ids = gg["id"].to_numpy()
            order = np.lexsort((ids, v))
            pos = int(offs_[int(w)]) + np.arange(len(v),
                                                 dtype=np.int64)
            out.append(pd.DataFrame({"id": ids[order], "pos": pos}))
        return pd.concat(out, ignore_index=True)

    return bucketed_group_agg(u, "w", local, buckets=buckets)


def grouped_gini(ds, key: str, val: str, *, q: int = 10 ** 6,
                 buckets: int | None = None):
    """Exact per-group Gini (the within-segment inequality table):
    one bucketed shuffle, per-key sort + rank dot product, the same
    big-integer ratio as :func:`gini_exact`. Group rows fit their
    bucket (the grouped_median scale contract)."""
    from spapy_ray.stages.relational import bucketed_group_agg

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, gg in g.groupby(key, sort=False):
            v = np.sort(gg[val].to_numpy()).astype(object)
            n, s = len(v), int(v.sum())
            s1 = int((np.arange(1, n + 1, dtype=object) * v).sum())
            num = 2 * s1 - (n + 1) * s
            den = n * s
            gq = 0 if den == 0 else \
                (1 if (num >= 0) == (den >= 0) else -1) \
                * (abs(num) * q // abs(den))
            rows.append((k, n, s, gq))
        return pd.DataFrame(rows, columns=[key, "n", "s_sum",
                                           "gini_q"]) \
            .astype({"n": np.int64, "s_sum": np.int64,
                     "gini_q": np.int64})

    return bucketed_group_agg(ds.select_columns([key, val]), key,
                              fold, buckets=buckets)
