"""Relational building blocks over driver tables: broadcast hash join
for scalar keys, selection predicates, and grouped aggregates.

These cover the reference's attribute-level surface (selections
SpaVectors.py:442-549, attribute ops 393-440) re-expressed as Arrow
expressions, plus the scalar-key join the web-scale pipelines need
(small side broadcast via ray.put — never a shuffle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from spapy_ray.util import default_pool


class BroadcastHashJoin:
    """map_batches actor: inner-join each batch against a small
    broadcast table on one key (dictionary-encoded numpy lookup)."""

    def __init__(self, small_ref=None, small_table: pa.Table | None = None,
                 key: str = None, small_key: str | None = None,
                 small_columns: list[str] | None = None):
        if small_table is None:
            import ray
            small_table = ray.get(small_ref)
        self.key = key
        self.small_key = small_key or key
        cols = small_columns or [c for c in small_table.column_names
                                 if c != self.small_key]
        self.small = small_table.select(cols)
        kv = small_table.column(self.small_key).to_numpy()
        order = np.argsort(kv, kind="stable")
        self.sorted_keys = kv[order]
        # searchsorted resolves each probe key to ONE build row, so a
        # duplicated build key would silently drop matches (ADVICE
        # r3) — this is a lookup join by contract; use hash_join for
        # one-to-many sides.
        if len(self.sorted_keys) > 1 and \
                (self.sorted_keys[1:] == self.sorted_keys[:-1]).any():
            raise ValueError(
                f"broadcast_join build side has duplicate "
                f"{self.small_key!r} keys; it is a unique-key lookup "
                f"join — use hash_join for one-to-many joins")
        self.order = order

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(self.sorted_keys) == 0:
            # empty build side (e.g. a dimension filter selected no
            # rows at this scale): inner lookup join yields no rows
            out = batch.slice(0, 0)
            empty = self.small.slice(0, 0)
            for name in empty.column_names:
                out = out.append_column(name, empty.column(name))
            return out
        bk = batch.column(self.key).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(self.sorted_keys, bk)
        pos = np.clip(pos, 0, len(self.sorted_keys) - 1)
        hit = self.sorted_keys[pos] == bk
        rows = self.order[pos[hit]]
        out = batch.filter(pa.array(hit))
        small_rows = self.small.take(pa.array(rows))
        for name in small_rows.column_names:
            out = out.append_column(name, small_rows.column(name))
        return out


def broadcast_join(ds, small: pa.Table, key: str, small_key: str | None = None,
                   small_columns: list[str] | None = None,
                   concurrency=None, batch_size: int | None = 16384,
                   use_actors: bool = False):
    import ray

    from spapy_ray.util import cached_state

    small_ref = ray.put(small)
    if use_actors:
        return ds.map_batches(
            BroadcastHashJoin,
            fn_constructor_kwargs={"small_ref": small_ref, "key": key,
                                   "small_key": small_key,
                                   "small_columns": small_columns},
            batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency or default_pool(),
        )

    box = (small_ref,)

    def _task(batch: pa.Table) -> pa.Table:
        joiner = cached_state(
            box, lambda st: BroadcastHashJoin(
                small_table=st, key=key, small_key=small_key,
                small_columns=small_columns))
        return joiner(batch)

    return ds.map_batches(_task, batch_format="pyarrow", batch_size=batch_size,
                          zero_copy_batch=True)


# --- SpaPy-style selections (SpaVectors.py:442-549) as fused filters.
_OPS = {
    "==": pc.equal, ">": pc.greater, ">=": pc.greater_equal,
    "<": pc.less, "<=": pc.less_equal, "!=": pc.not_equal,
}


def select_where(ds, column: str, op: str, value):
    """SelectEqual/Greater/Less... + SubsetBySelection fused into one
    vectorized filter stage (no two-phase boolean list)."""
    fn = _OPS[op]

    def _f(t: pa.Table) -> pa.Table:
        return t.filter(fn(t.column(column), pa.scalar(value)))

    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)


def pre_aggregated_count(ds, key: str, alias: str = "n"):
    """Count-by-key with PARTIAL aggregation: each batch emits one row
    per key seen (vectorized value_counts), then a tiny groupby sums
    the partials — the guide's combiner pattern. At 10^12 rows this
    moves O(distinct keys x blocks) rows through the shuffle instead
    of O(rows); the final merge uses the bucketed two-stage shuffle."""
    def partial(t: pa.Table) -> pa.Table:
        vc = t.column(key).value_counts()
        return pa.table({key: vc.field("values"),
                         "_pc": pc.cast(vc.field("counts"), pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def local(g):
        out = g.groupby(key, sort=False)["_pc"].sum().reset_index()
        return out.rename(columns={"_pc": alias})

    return bucketed_group_agg(partials, key, local).select_columns([key, alias])


def pre_aggregated_sums(ds, keys: list[str], sum_cols: list[str],
                        count_alias: str | None = None):
    """Sum/count-by-key with PARTIAL aggregation (combiner pattern):
    each batch collapses to one row per key-combination seen (pandas
    groupby inside the map), then a tiny global groupby folds the
    partials. For LOW-cardinality keys (TPC-H pricing flags, event
    types) this moves O(distinct x blocks) rows through the exchange
    instead of O(rows) — measured ~3x on 600k-row aggregates."""
    from ray.data.aggregate import Sum

    cnt = count_alias or "__n"

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby(keys, sort=False)[sum_cols].sum().reset_index()
        g[cnt] = df.groupby(keys, sort=False).size().to_numpy()
        return pa.Table.from_pandas(g, preserve_index=False)

    aggs = [Sum(c, alias_name=c) for c in sum_cols] + \
        [Sum(cnt, alias_name=cnt)]
    out = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(keys).aggregate(*aggs)
    return out


def _bucket_column(t: pa.Table, key: str, buckets: int) -> pa.Array:
    from spapy_ray.kernels.hashing import fnv1a64

    col = t.column(key)
    if pa.types.is_null(col.type):
        # untyped all-null column: single bucket
        return pa.array(np.zeros(len(col), dtype=np.int32))
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        h = fnv1a64(col)
    else:
        if col.null_count:
            # null keys bucket as 0 — placement is free, any bucket
            # works as long as all nulls co-locate
            col = pc.fill_null(col, 0)
        v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = v * np.uint64(0x9E3779B97F4A7C15)
    return pa.array((h % np.uint64(buckets)).astype(np.int32))


def bucketed_group_agg(ds, key: str, local_agg, buckets: int | None = None):
    """Two-stage shuffle for HIGH-CARDINALITY groupby: hash rows into
    a small number of buckets, shuffle on the tiny int bucket key,
    then aggregate all of a bucket's keys locally with one pandas
    groupby. Measured 8x faster than ray's direct groupby on 420k
    string keys (BASELINE.md) because the all-to-all sort runs on B
    distinct values instead of every key.

    ``local_agg(df) -> df`` must do the complete per-key aggregation
    for one bucket (each key lives in exactly one bucket, so local
    results are final).
    """
    from spapy_ray.util import cluster_cpus

    b = buckets or max(64, cluster_cpus() * 4)

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("_bucket", _bucket_column(t, key, b))

    def per_bucket(g):
        out = local_agg(g.drop(columns=["_bucket"]))
        return out

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(per_bucket, batch_format="pandas")


def interval_join(ds, intervals: pa.Table, *, on: str,
                  lo_col: str = "lo", hi_col: str = "hi",
                  keep: list[str] | None = None):
    """Range (non-equi) join: each row matches every interval with
    lo <= row[on] < hi; overlapping intervals yield multiple output
    rows (flat-map shape).

    The interval side is broadcast (ray.put once, sorted-endpoint
    arrays per worker); membership is vectorized searchsorted over
    the interval START order plus an explicit hi check per candidate
    — O(rows x avg overlap). The co-partitioned sort-merge form is
    the documented alternative when the interval side is large.
    """
    import ray

    from spapy_ray.util import cached_state

    ref = ray.put(intervals)
    box = (ref,)

    def _task(t: pa.Table) -> pa.Table:
        tbl = cached_state(box, lambda x: x)
        lo = tbl.column(lo_col).to_numpy()
        hi = tbl.column(hi_col).to_numpy()
        v = t.column(on).to_numpy(zero_copy_only=False)
        # [rows x intervals] membership, fully vectorized (the
        # broadcast side is small by contract)
        m = (lo[None, :] <= v[:, None]) & (v[:, None] < hi[None, :])
        ri, ii = np.nonzero(m)
        left = t.select(keep) if keep else t
        out = left.take(pa.array(ri))
        for name in tbl.schema.names:
            if name in (lo_col, hi_col):
                continue
            out = out.append_column(name, tbl.column(name).take(pa.array(ii)))
        return out

    return ds.map_batches(_task, batch_format="pyarrow")


def distinct_count(ds, key: str, distinct_col: str, alias: str = "n_distinct",
                   buckets: int | None = None):
    """COUNT(DISTINCT distinct_col) per key, exactly, without ever
    shuffling raw rows: each batch first collapses to its distinct
    (key, value) pairs (combiner), then the two-stage bucket shuffle
    dedups pairs and counts per key — every pair lives in exactly one
    hash(key) bucket, so per-bucket nunique is final. A single
    mega-hot key would serialize into one bucket; salt the pair
    (hash(key, value)) + a second fold if that ever binds."""
    def partial(t: pa.Table) -> pa.Table:
        df = t.select([key, distinct_col]).to_pandas()
        return pa.Table.from_pandas(df.drop_duplicates(),
                                    preserve_index=False)

    def local(g):
        out = g.drop_duplicates().groupby(key, sort=False)[distinct_col] \
            .size().reset_index(name=alias)
        out[alias] = out[alias].astype(np.int64)
        return out

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return bucketed_group_agg(parts, key, local, buckets=buckets) \
        .select_columns([key, alias])


def grouped_topk(ds, key: str, order_col: str, k: int, *,
                 descending: bool = True, tie_cols: list[str] | None = None,
                 rank_alias: str = "rank", buckets: int | None = None):
    """Top-k rows PER KEY (the training-pipeline "best k docs per
    domain" primitive) with deterministic total order
    (order_col [desc], then tie_cols asc): every batch keeps only its
    local per-key top-k (combiner — at most k x keys-seen rows leave
    a block), then the hash(key) bucket shuffle finalizes per key.
    Never a global sort; shuffle volume is O(k x keys x blocks)."""
    tie = tie_cols or []

    def _headk(df):
        df = df.sort_values([order_col, *tie], kind="mergesort",
                            ascending=[not descending] + [True] * len(tie))
        return df.groupby(key, sort=False).head(k)

    def partial(t: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(_headk(t.to_pandas()),
                                    preserve_index=False)

    def local(g):
        out = _headk(g)
        out[rank_alias] = out.groupby(key, sort=False).cumcount() + 1
        out[rank_alias] = out[rank_alias].astype(np.int64)
        return out

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return bucketed_group_agg(parts, key, local, buckets=buckets)


def hash_sample(ds, col: str, num: int, den: int):
    """Deterministic hash sampling: keep rows where
    fnv1a64(col) % den < num. Consistent across runs, machines and
    re-partitions (pure function of the value — no RNG state), and
    GROUP-CONSISTENT: every row sharing the key is kept or dropped
    together, so joins/dedup over the sample stay self-consistent.
    SQL twin via kernels.hashing.sql_fnv1a."""
    from spapy_ray.kernels.hashing import fnv1a64

    def _f(t: pa.Table) -> pa.Table:
        h = fnv1a64(t.column(col))
        return t.filter(pa.array((h % np.uint64(den))
                                 < np.uint64(num)))

    return ds.map_batches(_f, batch_format="pyarrow")



def hash_sample_stratified(ds, col: str, strata_col: str,
                           rates: dict[str, tuple[int, int]],
                           default: tuple[int, int] = (0, 1)):
    """Per-stratum deterministic sampling: row kept iff
    fnv1a64(col) % den_s < num_s for its stratum's (num, den) rate —
    the corpus-rebalancing primitive (e.g. downsample dominant
    languages, keep all of rare ones). Same group-consistency and
    SQL-twin properties as hash_sample; the rate table is a tiny
    broadcast closure, never a shuffle."""
    import pandas as pd

    from spapy_ray.kernels.hashing import fnv1a64

    keys = sorted(rates)
    nums = np.array([rates[k][0] for k in keys], dtype=np.uint64)
    dens = np.array([rates[k][1] for k in keys], dtype=np.uint64)

    def _f(t: pa.Table) -> pa.Table:
        h = fnv1a64(t.column(col))
        s = t.column(strata_col).to_pandas()
        idx = pd.Index(keys).get_indexer(s)
        num = np.where(idx >= 0, nums[np.maximum(idx, 0)],
                       np.uint64(default[0])).astype(np.uint64)
        den = np.where(idx >= 0, dens[np.maximum(idx, 0)],
                       np.uint64(default[1])).astype(np.uint64)
        return t.filter(pa.array((h % den) < num))

    return ds.map_batches(_f, batch_format="pyarrow")


def approx_distinct_hll(ds, key: str, distinct_col: str, *, p: int = 12,
                        alias: str = "n_approx"):
    """Per-key approximate COUNT(DISTINCT) via HyperLogLog — the
    mergeable-sketch form of :func:`distinct_count` for when even the
    distinct (key, value) pair volume is too large to shuffle.

    Each batch folds its values into one 2^p-byte register array per
    key (vectorized: fnv1a64 → bucket = high p bits, rank = leading
    zeros of the rest + 1, np.maximum.at) and emits (key, registers)
    — a FIXED 2^p bytes per key per block regardless of row count.
    One groupby(key) max-merges the registers (map_groups is fine:
    group count == key count, not value count) and applies the
    standard bias/linear-counting corrections. Expected relative
    error ~= 1.04 / sqrt(2^p) (~1.6% at p=12).

    Exactness is NOT claimed — pair it with distinct_count when the
    answer must hash-match; pytest pins the error envelope."""
    from spapy_ray.kernels.hashing import fnv1a64

    m = 1 << p
    mask = np.uint64((1 << (64 - p)) - 1)

    def partial(t: pa.Table) -> pa.Table:
        keys = t.column(key).to_pandas().to_numpy()
        col = t.column(distinct_col)
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            h = fnv1a64(col)
        else:
            v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
            with np.errstate(over="ignore"):
                h = v * np.uint64(0x9E3779B97F4A7C15) + np.uint64(1)
        # fnv1a avalanches its LOW bits only for short inputs; HLL
        # splits the hash, so run a murmur3-style finalizer first
        with np.errstate(over="ignore"):
            h = h ^ (h >> np.uint64(33))
            h = h * np.uint64(0xFF51AFD7ED558CCD)
            h = h ^ (h >> np.uint64(33))
            h = h * np.uint64(0xC4CEB9FE1A85EC53)
            h = h ^ (h >> np.uint64(33))
        bucket = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = h & mask
        # rank = leading zeros within the low 64-p bits, + 1; rest==0
        # maps to the max rank 64-p+1
        nz = rest != 0
        fl = np.zeros(len(rest), dtype=np.int64)
        fl[nz] = np.frexp(rest[nz].astype(np.float64))[1]  # bit length
        rank = np.where(nz, (64 - p) - fl + 1, (64 - p) + 1).astype(np.uint8)
        out_k, out_r = [], []
        import pandas as pd
        for kv, idx in pd.Series(np.arange(len(keys))).groupby(keys).groups.items():
            regs = np.zeros(m, dtype=np.uint8)
            ii = np.asarray(idx)
            np.maximum.at(regs, bucket[ii], rank[ii])
            out_k.append(kv)
            out_r.append(regs.tobytes())
        return pa.table({key: pa.array(out_k),
                         "regs": pa.array(out_r, type=pa.binary())})

    def merge(g: pa.Table) -> pa.Table:
        regs = np.zeros(m, dtype=np.uint8)
        for b in g.column("regs").to_pylist():
            np.maximum(regs, np.frombuffer(b, dtype=np.uint8), out=regs)
        est = _hll_estimate(regs)
        return pa.table({key: g.column(key).slice(0, 1),
                         alias: pa.array([est], type=pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(key).map_groups(merge, batch_format="pyarrow")


def _hll_estimate(regs: np.ndarray) -> int:
    """Standard HLL estimator with linear-counting small-range and
    the large-range correction omitted (64-bit hash: collisions are
    negligible below ~2^57 distincts)."""
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m / np.sum(np.ldexp(1.0, -regs.astype(np.int64)))
    zeros = int(np.count_nonzero(regs == 0))
    if raw <= 2.5 * m and zeros:
        return int(round(m * np.log(m / zeros)))
    return int(round(raw))


def pair_payload_copartition(cand, corpus, *, payload_col: str,
                             payload_type, buckets: int = 64):
    """Attach a corpus payload to BOTH sides of a pair table without
    native joins: cand(key_a, key_b) x corpus(k, <payload_col>) →
    Dataset(key_a, key_b, payload_a, payload_b).

    Stage 1 unions pair-side rows with the corpus projection and
    groupbys ONE hash(key) bucket column — the corpus payload
    shuffles exactly once; inner-merge semantics (pairs whose key is
    absent drop). Stage 2 re-buckets on hash(key_a) so both completed
    sides of a pair land in one group. Same shuffle volume as a
    double hash join, but plain groupby exchanges instead of two
    per-partition aggregator actor pools (~2 s spin-up each at
    sandbox scale; deadlock-prone when partitions exceed CPUs)."""
    def _cat(c):
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

    def side_rows(t: pa.Table) -> pa.Table:
        n = len(t)
        ka, kb = _cat(t.column("key_a")), _cat(t.column("key_b"))
        tt = pa.table({
            "k": pa.concat_arrays([ka, kb]),
            "key_a": pa.concat_arrays([ka, ka]),
            "key_b": pa.concat_arrays([kb, kb]),
            "side": pa.array(np.concatenate([np.zeros(n, np.int8),
                                             np.ones(n, np.int8)])),
            "payload": pa.nulls(2 * n, type=payload_type),
        })
        return tt.append_column("hbk", _bucket_column(tt, "k", buckets))

    def corpus_rows(t: pa.Table) -> pa.Table:
        k = _cat(t.column("k"))
        tt = pa.table({
            "k": k,
            "key_a": pa.nulls(len(t), type=k.type),
            "key_b": pa.nulls(len(t), type=k.type),
            "side": pa.array(np.full(len(t), -1, np.int8)),
            "payload": t.column(payload_col),
        })
        return tt.append_column("hbk", _bucket_column(tt, "k", buckets))

    stage1 = cand.map_batches(side_rows, batch_format="pyarrow").union(
        corpus.map_batches(corpus_rows, batch_format="pyarrow"))

    # Group-local merges stay in Arrow (pa.Table.join): a pandas
    # round-trip would upcast int64 keys to float64 because the
    # unioned table null-fills key_a/key_b on corpus rows.
    def attach(g: pa.Table) -> pa.Table:
        neg = pc.less(g.column("side"), 0)
        payloads = g.filter(neg).select(["k", "payload"])
        sides = g.filter(pc.invert(neg)).drop_columns(["payload", "hbk"])
        m = sides.join(payloads, keys="k", join_type="inner")
        return m.select(["key_a", "key_b", "side", "payload"])

    attached = stage1.groupby("hbk").map_groups(attach,
                                                batch_format="pyarrow")

    def tag_pair(t: pa.Table) -> pa.Table:
        return t.append_column("hbk", _bucket_column(t, "key_a", buckets))

    def unite(g: pa.Table) -> pa.Table:
        is_a = pc.equal(g.column("side"), 0)
        a = g.filter(is_a).select(["key_a", "key_b", "payload"]) \
            .rename_columns(["key_a", "key_b", "payload_a"])
        b = g.filter(pc.invert(is_a)) \
            .select(["key_a", "key_b", "payload"]) \
            .rename_columns(["key_a", "key_b", "payload_b"])
        return a.join(b, keys=["key_a", "key_b"], join_type="inner")

    return attached.map_batches(tag_pair, batch_format="pyarrow") \
        .groupby("hbk").map_groups(unite, batch_format="pyarrow")


def _salted_outer(left, right, *, on: str, right_on: str | None,
                  suffix: str, buckets: int | None, salt: int):
    """Full outer join with hot-key salting: salted LEFT join ∪
    (right rows with no left-key match, null-filled on the left).

    The anti pass probes the RIGHT side (the hot rows scatter) against
    the distinct left keys (replicated ×salt but pre-deduped per batch
    — bounded by key cardinality, not row count). Right-unmatched rows
    convert through pandas with NaN left columns, matching the dtype
    behavior of the unsalted bucket-local outer merge."""
    rk = right_on or on
    left_part = hash_join(left, right, on=on, right_on=rk, how="left",
                          suffix=suffix, buckets=buckets, salt=salt)

    def batch_keys(t: pa.Table) -> pa.Table:
        return pa.table({on: pc.unique(pc.drop_null(t.column(on)))})

    lkeys = left.map_batches(batch_keys, batch_format="pyarrow")
    right_unmatched = hash_join(right, lkeys, on=rk, right_on=on,
                                how="anti", buckets=buckets, salt=salt)

    lsch, rsch = left.schema(), right.schema()
    lnames = list(lsch.names)
    rmap = {c: (c + suffix if c in lnames else c) for c in rsch.names}
    allnames = lnames + [rmap[c] for c in rsch.names
                         if rmap[c] not in lnames]

    def as_joined(t: pa.Table) -> pa.Table:
        df = t.to_pandas().rename(columns=rmap)
        for c in lnames:
            if c not in df.columns:
                df[c] = np.nan
        return pa.Table.from_pandas(df[allnames], preserve_index=False)

    return left_part.union(
        right_unmatched.map_batches(as_joined, batch_format="pyarrow"))


def hash_join(left, right, *, on: str, right_on: str | None = None,
              how: str = "inner", suffix: str = "_r",
              buckets: int | None = None, salt: int = 1):
    """General big x big equijoin as ONE union + one hash-bucket
    groupby — no native Dataset.join (whose per-partition aggregator
    actor pools spin up ~2 s each and deadlock when partitions exceed
    CPUs; see pair_payload_copartition) and no broadcast bound.

    Both sides are projected into one unified schema (each side
    null-fills the other's columns) so the union sorts cleanly; each
    bucket then converts its two sides to pandas SEPARATELY (a joint
    frame would upcast null-filled int64 columns to float64) and
    merges. Right columns colliding with left names get ``suffix``.
    how: "inner" (typed-exact), "left" / "outer" (unmatched rows
    null-fill the other side's columns, with pandas' usual nullable
    upcasts — coalesce downstream for typed-exact outputs), "semi" /
    "anti" (left rows with ≥1 / 0 key matches; left columns only,
    typed-exact). Bucket-local left/outer is globally correct: every
    key lives in exactly one bucket, so a row unmatched in its bucket
    is unmatched everywhere.

    ``salt`` (skew handling, the north rule's hot-key case): a single
    hot key funnels its whole row volume into one bucket task. With
    salt=k, LEFT rows scatter per-row over k sub-buckets and RIGHT
    rows replicate into all k, so a hot bucket's probe volume splits
    ~k ways at the cost of k× the (smaller) build side — put the
    small side on the RIGHT when salting. Correct for
    inner/left/semi/anti in one shuffle (each left row still sees
    every matching right row in its sub-bucket). ``outer`` + salt
    runs as TWO salted passes (VERDICT r3 #5): a salted LEFT join
    unioned with the right rows anti-joined against the distinct
    left keys (per-batch pc.unique pre-aggregation keeps the
    replicated build side tiny even when the probe side is hot) —
    a right row replicated into k sub-buckets is globally unmatched
    iff its key never occurs on the left, which the anti pass
    decides exactly."""
    if how not in ("inner", "left", "outer", "semi", "anti"):
        raise ValueError("how must be inner|left|outer|semi|anti")
    if salt < 1:
        raise ValueError("salt must be >= 1")
    if salt > 1 and how == "outer":
        return _salted_outer(left, right, on=on, right_on=right_on,
                             suffix=suffix, buckets=buckets, salt=salt)
    from spapy_ray.util import cluster_cpus

    rk = right_on or on
    b = buckets or max(64, cluster_cpus() * 4)
    lsch, rsch = left.schema(), right.schema()
    lnames = list(lsch.names)
    rmap = {c: (c + suffix if c in lnames else c) for c in rsch.names}
    rnames = [rmap[c] for c in rsch.names]

    def _pa_type(t):
        # a pandas-block dataset reports numpy dtypes / <class
        # 'object'> instead of Arrow types — normalize so pa.nulls
        # accepts them (same mapping as sessions.asof_join)
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.string() if t == object else pa.from_numpy_dtype(t)
        except (TypeError, pa.ArrowNotImplementedError):
            return pa.string()

    fields = {**{n: _pa_type(t) for n, t in zip(lsch.names,
                                                lsch.types)},
              **{rmap[c]: _pa_type(t) for c, t in zip(rsch.names,
                                                      rsch.types)}}
    allnames = lnames + [c for c in rnames if c not in lnames]

    def unify(t: pa.Table, own: list[str], ren: dict | None,
              key: str, side: int) -> pa.Table:
        cols = {}
        for c in allnames:
            src = c
            if ren is not None:
                inv = {v: k for k, v in ren.items()}
                src = inv.get(c, c)
            if (ren is None and c in own) or \
                    (ren is not None and src in own and ren[src] == c):
                cols[c] = t.column(src)
            else:
                cols[c] = pa.nulls(len(t), type=fields[c])
        tt = pa.table(cols)
        tt = tt.append_column("_side",
                              pa.array(np.full(len(t), side, np.int8)))
        hbk = _bucket_column(t, key, b).to_numpy().astype(np.int32)
        if salt == 1:
            return tt.append_column("_hbk", pa.array(hbk))
        if side == 0:
            # probe rows scatter per-row (NOT by key — the whole
            # point is splitting one key's volume)
            sub = np.arange(len(t), dtype=np.int32) % salt
            return tt.append_column(
                "_hbk", pa.array(hbk * np.int32(salt) + sub))
        # build rows replicate into every sub-bucket
        parts = []
        for s in range(salt):
            parts.append(tt.append_column(
                "_hbk", pa.array(hbk * np.int32(salt) + np.int32(s))))
        return pa.concat_tables(parts)

    def lrows(t: pa.Table) -> pa.Table:
        return unify(t, lnames, None, on, 0)

    def rrows(t: pa.Table) -> pa.Table:
        return unify(t, list(rsch.names), rmap, rk, 1)

    rkey_out = rmap[rk]

    def per_bucket(g: pa.Table) -> pa.Table:
        lmask = pc.equal(g.column("_side"), 0)
        lt = g.filter(lmask)
        rt = g.filter(pc.invert(lmask))
        if how in ("semi", "anti"):
            # SQL EXISTS semantics on nullable keys (ADVICE r3):
            # NULL never equals anything — drop nulls from the build
            # set and force NULL probe keys to non-matching (so semi
            # drops them and anti keeps them, like NOT EXISTS).
            keys = pc.drop_null(pc.unique(rt.column(rkey_out)))
            lk = lt.column(on)
            hit = pc.and_(pc.fill_null(
                pc.is_in(lk, value_set=keys), False), pc.is_valid(lk))
            if how == "anti":
                hit = pc.invert(hit)
            return lt.filter(hit).select(lnames)
        ldf = lt.select(lnames).to_pandas()
        rdf = rt.select(rnames).to_pandas()
        lnull = ldf[on].isna()
        rnull = rdf[rkey_out].isna()
        if not lnull.any() and not rnull.any():
            out = ldf.merge(rdf, left_on=on, right_on=rkey_out, how=how)
        else:
            # pandas merge matches NaN keys to each other; SQL join
            # predicates never match NULL (ADVICE r3). Join the
            # non-null cores, then re-attach null-key rows as
            # unmatched for the outer sides (merging against an empty
            # frame keeps the merged dtypes identical to the core).
            parts = [ldf[~lnull].merge(rdf[~rnull], left_on=on,
                                       right_on=rkey_out, how=how)]
            if how in ("left", "outer") and lnull.any():
                parts.append(ldf[lnull].merge(
                    rdf.iloc[0:0], left_on=on, right_on=rkey_out,
                    how="left"))
            if how == "outer" and rnull.any():
                parts.append(ldf.iloc[0:0].merge(
                    rdf[rnull], left_on=on, right_on=rkey_out,
                    how="right"))
            out = pd.concat(parts, ignore_index=True) if len(parts) > 1 \
                else parts[0]
        return pa.Table.from_pandas(out, preserve_index=False)

    u = left.map_batches(lrows, batch_format="pyarrow").union(
        right.map_batches(rrows, batch_format="pyarrow"))
    return u.groupby("_hbk").map_groups(per_bucket, batch_format="pyarrow")


def within_group_pairs(ds, group_col: str, key_col: str,
                       out_a: str = "key_a", out_b: str = "key_b",
                       buckets: int | None = None):
    """All unordered key pairs (out_a < out_b) within each
    ``group_col`` group — the LSH candidate-generation shape.

    A ``groupby(group).map_groups(python pairs)`` here pays one Python
    call per collision bucket (millions of hot buckets at corpus
    scale) plus an O(k^2) Python loop inside each. Instead: ONE
    hash-bucket shuffle on ``group_col`` (a bucket holds many
    groups), then per bucket a single np.lexsort + segment walk where
    pair emission is batched BY DISTINCT GROUP SIZE — one
    ``np.triu_indices`` fancy-index per distinct k, applied to every
    k-sized group in the bucket at once. Python iterations per bucket
    == number of distinct group sizes (dozens), independent of group
    count.

    Duplicate (group, key) rows are collapsed; groups of one key emit
    nothing. Within a group, keys are sorted ascending so out_a <
    out_b deterministically (same contract as the loop it replaces).
    """
    import pandas as pd

    from spapy_ray.util import cluster_cpus

    nbuckets = buckets or max(64, cluster_cpus() * 4)

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bkt__", _bucket_column(t, group_col, nbuckets))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        grp = g[group_col].to_numpy()
        keys = g[key_col].to_numpy()
        order = np.lexsort((keys, grp))
        grp, keys = grp[order], keys[order]
        if len(grp):
            # collapse duplicate (group, key) rows (adjacent after sort)
            keep = np.empty(len(grp), dtype=bool)
            keep[0] = True
            keep[1:] = (grp[1:] != grp[:-1]) | (keys[1:] != keys[:-1])
            grp, keys = grp[keep], keys[keep]
        n = len(grp)
        empty = pd.DataFrame({out_a: keys[:0], out_b: keys[:0]})
        if n < 2:
            return empty
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = grp[1:] != grp[:-1]
        starts = np.nonzero(new)[0]
        lens = np.diff(np.append(starts, n))
        outs_a, outs_b = [], []
        for k in np.unique(lens):
            if k < 2:
                continue
            iu0, iu1 = np.triu_indices(int(k), 1)
            s = starts[lens == k]
            outs_a.append(keys[(s[:, None] + iu0[None, :]).ravel()])
            outs_b.append(keys[(s[:, None] + iu1[None, :]).ravel()])
        if not outs_a:
            return empty
        return pd.DataFrame({out_a: np.concatenate(outs_a),
                             out_b: np.concatenate(outs_b)})

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("bkt__").map_groups(per_bucket, batch_format="pandas")


def _mg_truncate(items: pa.Array, counts: np.ndarray, m: int):
    """Misra-Gries truncation: if more than ``m`` counters survive,
    subtract the (m+1)-th largest count from all and drop the
    non-positive — at most ``m`` remain, and every decrement of d is
    charged to >= m+1 counters, so the total undercount across a whole
    run is <= n_rows/(m+1) (the classic guarantee)."""
    if len(counts) <= m:
        return items, counts
    d = np.partition(counts, len(counts) - (m + 1))[len(counts) - (m + 1)]
    keep = counts > d
    idx = np.flatnonzero(keep)
    return items.take(pa.array(idx)), counts[idx] - d


def heavy_hitters(ds, col: str, capacity: int = 1024, fan: int = 32,
                  est_col: str = "est_count"):
    """Mergeable Misra-Gries frequent-items sketch over ``col`` —
    the 100 TB way to get top domains/terms WITHOUT shuffling every
    distinct key: each block collapses to <= ``capacity`` (item,
    count) counters (vectorized value_counts + one np.partition), and
    sketches tree-reduce through two fixed repartition levels. Rows
    moved: O(blocks x capacity), independent of corpus size.

    Guarantees (standard MG, preserved under arbitrary merge trees):
    every item with true frequency > n/(capacity+1) survives, and
    true_count - n/(capacity+1) <= est <= true_count. When no
    truncation ever fires (capacity >= distinct items at every merge)
    the counts are EXACT — the regime the oracled query pins.

    Returns a one-block Dataset (col, est_col) sorted by
    (est desc, item asc) for deterministic output."""
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    import pandas as pd

    def block_sketch(t: pa.Table) -> pa.Table:
        vc = t.column(col).value_counts()
        items = vc.field("values")
        counts = pc.cast(vc.field("counts"), pa.int64()).to_numpy()
        items, counts = _mg_truncate(items, counts, capacity)
        return pa.table({col: items, est_col: pa.array(counts)})

    def merge(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({col: t.column(col).to_pandas(),
                           est_col: t.column(est_col).to_numpy()})
        g = df.groupby(col, sort=False, as_index=False)[est_col].sum()
        items = pa.array(g[col].to_numpy())
        items, counts = _mg_truncate(items, g[est_col].to_numpy(),
                                     capacity)
        return pa.table({col: items, est_col: pa.array(counts)})

    def finish(t: pa.Table) -> pa.Table:
        order = np.lexsort((t.column(col).to_pandas().to_numpy(),
                            -t.column(est_col).to_numpy()))
        return t.take(pa.array(order))

    s = ds.map_batches(block_sketch, batch_format="pyarrow")
    s = s.repartition(fan).map_batches(merge, batch_format="pyarrow",
                                       batch_size=None)
    return s.repartition(1) \
        .map_batches(merge, batch_format="pyarrow", batch_size=None) \
        .map_batches(finish, batch_format="pyarrow", batch_size=None)


_BLOOM_MIX2 = np.uint64(0xFF51AFD7ED558CCD)


def _bloom_hashes(col, k: int, m: int) -> np.ndarray:
    """[k, n] Bloom bit positions via double hashing (h1 + i*h2) % m.
    Same per-type base hash as _bucket_column, so strings and ints
    both work."""
    from spapy_ray.kernels.hashing import fnv1a64

    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        h1 = fnv1a64(col)
    else:
        v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h1 = v * np.uint64(0x9E3779B97F4A7C15)
    with np.errstate(over="ignore"):
        h2 = (h1 * _BLOOM_MIX2) | np.uint64(1)
        out = np.empty((k, len(h1)), dtype=np.int64)
        for i in range(k):
            out[i] = ((h1 + np.uint64(i) * h2) % np.uint64(m)) \
                .astype(np.int64)
    return out


def bloom_filter_join(left, right, *, on: str,
                      right_on: str | None = None, how: str = "semi",
                      bits_log2: int = 23, k: int = 4,
                      buckets: int | None = None, salt: int = 1):
    """Semi/anti equijoin with a BLOOM PREFILTER on the probe side —
    the shuffle-volume primitive for url-blocklist filtering /
    contains-key checks at corpus scale. Exactness is preserved
    unconditionally (a Bloom filter has no false negatives):

      semi: probe rows failing the filter are DEFINITE non-matches
            and drop before the shuffle; survivors run the exact
            bucketed semi join (hash_join).
      anti: failing rows are definite non-matches and stream
            STRAIGHT TO OUTPUT with no shuffle at all; only the
            (few) filter-passing rows run the exact anti join.

    Only the k-bit membership test moves per probe row; the filter
    itself is built distributedly (per-batch partial bitmaps,
    OR-folded — 2^bits_log2 bits = 1 MiB at the default, the small
    side) and broadcast via ray.put. NULL probe keys follow SQL
    EXISTS semantics like hash_join: they never match (semi drops
    them at the filter; anti emits them directly).
    """
    import ray

    if how not in ("semi", "anti"):
        raise ValueError("bloom prefilter applies to semi/anti only")
    rk = right_on or on
    m = 1 << bits_log2
    words = m // 64

    def bloom_partial(t: pa.Table) -> pa.Table:
        col = t.column(rk)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.drop_null()
        bm = np.zeros(words, dtype=np.uint64)
        if len(col):
            pos = _bloom_hashes(col, k, m).ravel()
            np.bitwise_or.at(bm, pos // 64,
                             np.uint64(1) << (pos % 64).astype(
                                 np.uint64))
        return pa.table({"bm": pa.array([bm.tobytes()],
                                        type=pa.binary())})

    bm = np.zeros(words, dtype=np.uint64)
    for b_ in right.map_batches(bloom_partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        for blob in b_.column("bm").to_pylist():
            np.bitwise_or(bm, np.frombuffer(blob, dtype=np.uint64),
                          out=bm)
    ref = ray.put(bm)

    def probe_mask(t: pa.Table, _ref=ref) -> np.ndarray:
        filt = ray.get(_ref)
        col = t.column(on)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        null_mask = pc.is_null(col).to_numpy(zero_copy_only=False)
        safe = col.fill_null(col[0]) if null_mask.any() and len(col) \
            else col
        pos = _bloom_hashes(safe, k, m)
        hit = np.ones(len(t), dtype=bool)
        for i in range(k):
            w = filt[pos[i] // 64]
            hit &= (w >> (pos[i] % 64).astype(np.uint64)) \
                .astype(np.uint64) & np.uint64(1) > 0
        hit[null_mask] = False          # NULL never matches
        return hit

    def keep_pass(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(probe_mask(t)))

    if how == "semi":
        survivors = left.map_batches(keep_pass,
                                     batch_format="pyarrow")
        return hash_join(survivors, right, on=on, right_on=right_on,
                         how="semi", buckets=buckets, salt=salt)

    def keep_fail(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(~probe_mask(t)))

    definite = left.map_batches(keep_fail, batch_format="pyarrow")
    maybe = left.map_batches(keep_pass, batch_format="pyarrow")
    checked = hash_join(maybe, right, on=on, right_on=right_on,
                        how="anti", buckets=buckets, salt=salt)
    return definite.union(checked)


def hash_split(ds, col: str, fractions: dict[str, int], *,
               den: int = 100, out: str = "split"):
    """Deterministic train/val/test assignment — the dataset-split
    primitive every training pipeline needs: row r goes to the split
    whose cumulative band contains fnv1a64(r[col]) % den. Pure
    function of the key (no RNG state) and GROUP-CONSISTENT like
    hash_sample: all rows sharing the key land in the SAME split, so
    a url's duplicates can never leak across train/test.

    ``fractions`` maps split name → band width (must sum to ``den``),
    iterated in insertion order. Stateless single map; appends the
    ``out`` string column. SQL twin via kernels.hashing.sql_fnv1a +
    an ordered CASE over the same cumulative bands.
    """
    from spapy_ray.kernels.hashing import fnv1a64

    if sum(fractions.values()) != den:
        raise ValueError("fractions must sum to den")
    names = list(fractions)
    cuts = np.cumsum([fractions[n] for n in names]).astype(np.uint64)
    labels = np.asarray(names, dtype=object)

    def _f(t: pa.Table) -> pa.Table:
        h = fnv1a64(t.column(col)) % np.uint64(den)
        idx = np.searchsorted(cuts, h, side="right")
        return t.append_column(out, pa.array(labels[idx].astype(str)))

    return ds.map_batches(_f, batch_format="pyarrow")


def grouped_median(ds, key: str, val: str, *,
                   buckets: int | None = None):
    """EXACT per-group median through the bucketed two-stage shuffle
    (the sketch-free complement to the KLL quantile path): each key's
    values sort inside its bucket and the median is reported as
    ``median_x2`` = v[(n-1)//2] + v[n//2] — twice the median, exact
    for both parities with ONE addition of two elements, so even a
    float column is bit-identical to the SQL twin (the same two
    doubles added in the same order; no interpolation-convention
    ambiguity).

    Returns Dataset(key, n, median_x2).
    """
    def local(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, gg in g.groupby(key, sort=False):
            v = np.sort(gg[val].to_numpy())
            n = len(v)
            rows.append((k, n, v[(n - 1) // 2] + v[n // 2]))
        return pd.DataFrame(rows, columns=[key, "n", "median_x2"]) \
            .astype({"n": np.int64})

    return bucketed_group_agg(ds.select_columns([key, val]), key,
                              local, buckets=buckets)


def grouped_mad_outliers(ds, key: str, val: str, *, k: int = 3,
                         buckets: int | None = None):
    """Robust per-group outlier counts via median/MAD — the
    quality-gate statistic that survives the heavy tails a mean/std
    z-score drowns in. Everything is expressed in the two-middle
    "x2" convention of grouped_median so float columns stay
    bit-exact against the SQL twin:

        M2   = v[(n-1)//2] + v[n//2]            (2 x median)
        D    = |2·v − M2|                        (2 x |v − median|)
        MAD4 = D[(n-1)//2] + D[n//2]             (4 x MAD)
        outlier(v)  ⟺  2·D > k · MAD4           (⟺ |v−med| > k·MAD)

    Three bucket shuffles (two medians + the outlier fold); the
    per-key median/MAD tables are the SMALL side and broadcast via
    ray.put between passes. Returns
    Dataset(key, n, median_x2, mad_x4, n_outliers).
    """
    import ray

    med = grouped_median(ds, key, val, buckets=buckets).to_pandas()
    m2 = dict(zip(med[key], med["median_x2"]))
    ref = ray.put(m2)

    def dev(t: pa.Table, _ref=ref) -> pa.Table:
        mm = ray.get(_ref)
        v = t.column(val).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        keys = t.column(key).to_pandas()
        m = keys.map(mm).to_numpy(dtype=np.float64)
        return pa.table({key: t.column(key),
                         "d": pa.array(np.abs(2.0 * v - m))})

    devs = ds.select_columns([key, val]).map_batches(
        dev, batch_format="pyarrow")
    mad = grouped_median(devs, key, "d", buckets=buckets).to_pandas()
    mad4 = dict(zip(mad[key], mad["median_x2"]))
    ref2 = ray.put((m2, mad4))

    def flag(t: pa.Table, _ref=ref2) -> pa.Table:
        mm, aa = ray.get(_ref)
        v = t.column(val).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        keys = t.column(key).to_pandas()
        m = keys.map(mm).to_numpy(dtype=np.float64)
        a = keys.map(aa).to_numpy(dtype=np.float64)
        d = np.abs(2.0 * v - m)
        out = (2.0 * d > k * a).astype(np.int64)
        return pa.table({key: t.column(key), "o": pa.array(out)})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(key, sort=False)["o"].agg(["size", "sum"]) \
            .reset_index()
        out.columns = [key, "n", "n_outliers"]
        return out.astype({"n": np.int64, "n_outliers": np.int64})

    counts = bucketed_group_agg(
        ds.select_columns([key, val]).map_batches(
            flag, batch_format="pyarrow"), key, fold,
        buckets=buckets)

    def attach(t: pa.Table) -> pa.Table:
        keys = t.column(key).to_pandas()
        return (t.append_column("median_x2", pa.array(
            keys.map(m2).to_numpy(dtype=np.float64)))
            .append_column("mad_x4", pa.array(
                keys.map(mad4).to_numpy(dtype=np.float64))))

    return counts.map_batches(attach, batch_format="pyarrow")


def xor_fingerprint(ds, col: str, *, buckets: int = 64):
    """Order-independent table fingerprint (anti-entropy / replica
    diff): XOR-fold of per-row fnv1a64 hashes, bucketed by hash so a
    mismatch localizes to 1/buckets of the key space. Two tables are
    byte-identical on ``col`` (as multisets) iff every
    (bucket, fp, n_rows) row matches. XOR partials collapse per block
    (<= buckets rows each), a tiny groupby folds them — the exchange
    never carries row data, so this costs one streaming pass at any
    scale.
    """
    from spapy_ray.kernels.hashing import fnv1a64

    def partial(t: pa.Table) -> pa.Table:
        h = fnv1a64(t.column(col))
        b = (h % np.uint64(buckets)).astype(np.int64)
        order = np.argsort(b, kind="stable")
        bs, hs = b[order], h[order]
        starts = np.nonzero(np.r_[True, bs[1:] != bs[:-1]])[0]
        fp = np.bitwise_xor.reduceat(hs, starts)
        n = np.diff(np.append(starts, len(bs)))
        return pa.table({"bucket": pa.array(bs[starts]),
                         "fp": pa.array(fp.view(np.int64)),
                         "n_rows": pa.array(n.astype(np.int64))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        x = np.bitwise_xor.reduce(
            g["fp"].to_numpy().astype(np.int64).view(np.uint64))
        return pd.DataFrame({
            "bucket": g["bucket"].iloc[:1].astype(np.int64).to_numpy(),
            "fp": np.array([x], dtype=np.uint64).view(np.int64),
            "n_rows": np.array([g["n_rows"].sum()], dtype=np.int64)})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("bucket").map_groups(fold, batch_format="pandas")


def grouped_rollup(ds, dims: list[str], sum_col: str, *,
                   sentinels: dict, count_alias: str = "n"):
    """GROUP BY ROLLUP re-expressed for a streaming engine: ONE
    combiner-folded shuffle computes the finest (d1..dk) level; every
    coarser prefix level is derived from that tiny base on the driver
    (super-aggregates fold from sub-aggregates — never re-shuffled).
    Rolled-up dimensions carry caller-chosen typed sentinels instead
    of SQL NULLs (null int64 upcasts to float in pandas, NOTES_r2).

    Returns a pandas frame (dims..., sum_col, count_alias) with one
    row per rollup group. Base must be small (it is a full-grouped
    aggregate); the input can be any size.
    """
    base = pre_aggregated_sums(ds, dims, [sum_col],
                               count_alias=count_alias).to_pandas()
    frames = [base[dims + [sum_col, count_alias]]]
    for lvl in range(len(dims) - 1, -1, -1):
        keep = dims[:lvl]
        if keep:
            g = base.groupby(keep, sort=False)[[sum_col, count_alias]] \
                .sum().reset_index()
        else:
            g = base[[sum_col, count_alias]].sum().to_frame().T
        for d in dims[lvl:]:
            g[d] = sentinels[d]
        frames.append(g[dims + [sum_col, count_alias]])
    out = pd.concat(frames, ignore_index=True)
    out[count_alias] = out[count_alias].astype(np.int64)
    return out


def grouped_cube(ds, dims: list[str], sum_col: str, *,
                 sentinels: dict, count_alias: str = "n"):
    """GROUP BY CUBE for a streaming engine: like grouped_rollup but
    every subset of ``dims`` (2^k levels) folds from the ONE
    combiner-shuffled finest base — super-aggregates are derived on
    the driver, never re-shuffled. Rolled-up dimensions carry typed
    sentinels (SQL NULL upcasts int64 to float in pandas)."""
    from itertools import combinations

    base = pre_aggregated_sums(ds, dims, [sum_col],
                               count_alias=count_alias).to_pandas()
    frames = []
    for k in range(len(dims), -1, -1):
        for keep in combinations(dims, k):
            keep = list(keep)
            if len(keep) == len(dims):
                g = base.copy()
            elif keep:
                g = base.groupby(keep, sort=False)[
                    [sum_col, count_alias]].sum().reset_index()
            else:
                g = base[[sum_col, count_alias]].sum().to_frame().T
            for d in dims:
                if d not in keep:
                    g[d] = sentinels[d]
            frames.append(g[dims + [sum_col, count_alias]])
    out = pd.concat(frames, ignore_index=True)
    out[count_alias] = out[count_alias].astype(np.int64)
    return out


def pivot_counts(ds, key: str, label_col: str, labels: list[str],
                 prefix: str = "n_"):
    """Crosstab / PIVOT: one wide row per key with a count column per
    label value. The one-hot expansion happens inside map_batches
    (vectorized compare per label), so the exchange is the same
    combiner-folded sum shuffle as pre_aggregated_sums — at 100 TB
    the wide matrix never exists except as per-block partials.
    Labels must be the (small) closed set of label_col values;
    unseen labels yield zero columns, unexpected values are ignored.
    """
    cols = [prefix + l for l in labels]

    def onehot(t: pa.Table) -> pa.Table:
        lab = t.column(label_col)
        out = {key: t.column(key)}
        for l, c in zip(labels, cols):
            out[c] = pc.cast(pc.equal(lab, pa.scalar(l)), pa.int64())
        return pa.table(out)

    return pre_aggregated_sums(
        ds.map_batches(onehot, batch_format="pyarrow"), [key], cols,
        count_alias=prefix + "total")


def multiset_except(ds_a, ds_b, col: str, *, buckets: int | None = None,
                    out: str = "n"):
    """EXCEPT ALL as a streaming operator: per distinct value of
    ``col``, emit max(0, count_a - count_b) (bag difference — the
    "what actually differs" follow-up to xor_fingerprint's "something
    differs"). Sides are weight-tagged (+1/-1) and unioned, then ONE
    bucketed shuffle folds the signed counts; only positive rows
    survive. Never materializes either side; exchange carries
    (value, weight-partial) rows only.
    """
    def tag(w):
        def _f(t: pa.Table) -> pa.Table:
            df = t.select([col]).to_pandas()
            g = df.groupby(col, sort=False).size().reset_index(name="w")
            g["w"] = g["w"].astype(np.int64) * w
            return pa.Table.from_pandas(g, preserve_index=False)
        return _f

    u = ds_a.map_batches(tag(1), batch_format="pyarrow").union(
        ds_b.map_batches(tag(-1), batch_format="pyarrow"))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(col, sort=False)["w"].sum().reset_index(name=out)
        s = s[s[out] > 0]
        s[out] = s[out].astype(np.int64)
        return s

    return bucketed_group_agg(u, col, fold, buckets=buckets)


def grouped_corr_int(ds, keys: list[str], x: str, y: str, *,
                     scale_x: int = 100, scale_y: int = 100,
                     q: int = 1_000_000):
    """EXACT grouped correlation via integer sufficient statistics:
    x, y are quantized to integers (caller-chosen decimal scale must
    make them exact, e.g. 2-dp money x100), per-batch partials carry
    (n, sx, sy, sxx, syy, sxy) in int64, a tiny groupby folds them,
    and the final correlation is reported as a FLOOR-QUANTIZED square

        corr2_q = (num^2 * q) // (varx * vary),  sign = sign(num)
        num  = n*sxy - sx*sy
        varx = n*sxx - sx^2,  vary = n*syy - sy^2

    computed in arbitrary-precision Python int on the tiny folded
    table — overflow-free at any scale, bit-identical to a HUGEINT
    SQL twin (no float division anywhere). Returns a pandas frame
    (keys..., n, corr_sign, corr2_q, plus the six statistics).
    """
    from ray.data.aggregate import Sum

    stats = ["sx", "sy", "sxx", "syy", "sxy"]

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        xi = np.rint(df[x].to_numpy(dtype=np.float64) * scale_x) \
            .astype(np.int64)
        yi = np.rint(df[y].to_numpy(dtype=np.float64) * scale_y) \
            .astype(np.int64)
        d = df[keys].copy()
        d["sx"], d["sy"] = xi, yi
        d["sxx"], d["syy"], d["sxy"] = xi * xi, yi * yi, xi * yi
        d["nn"] = np.int64(1)
        g = d.groupby(keys, sort=False)[stats + ["nn"]].sum() \
            .reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    aggs = [Sum(c, alias_name=c) for c in stats] + \
        [Sum("nn", alias_name="n")]
    folded = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(keys).aggregate(*aggs).to_pandas()

    signs, c2 = [], []
    for _, r in folded.iterrows():
        n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
        num = n * int(r["sxy"]) - sx * sy
        varx = n * int(r["sxx"]) - sx * sx
        vary = n * int(r["syy"]) - sy * sy
        den = varx * vary
        signs.append(0 if num == 0 else (1 if num > 0 else -1))
        c2.append((num * num * q) // den if den > 0 else -1)
    folded["corr_sign"] = np.asarray(signs, dtype=np.int64)
    folded["corr2_q"] = np.asarray(c2, dtype=np.int64)
    folded["n"] = folded["n"].astype(np.int64)
    return folded[keys + ["n", "corr_sign", "corr2_q"] + stats]


def grouped_quartiles(ds, key: str, val: str, *,
                      buckets: int | None = None):
    """EXACT per-group quartiles in the parity-free x2 convention
    (grouped_median generalized to any rank pair): with v sorted and
    0-based,

        q1_x2  = v[(n-1)//4] + v[n//4]
        q3_x2  = v[n-1-n//4] + v[n-1-(n-1)//4]   (mirror ranks)
        iqr_x2 = q3_x2 - q1_x2

    The hi ranks mirror the lo ranks, so the statistic is symmetric
    under negation; each is a one-addition pick of two elements —
    float-bit-exact against the FILTER-by-rank SQL twin, no
    interpolation convention. Returns Dataset(key, n, q1_x2, q3_x2,
    iqr_x2) via the bucketed two-stage shuffle."""
    def local(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, gg in g.groupby(key, sort=False):
            v = np.sort(gg[val].to_numpy())
            n = len(v)
            a1, a2 = (n - 1) // 4, n // 4
            q1 = v[a1] + v[a2]
            q3 = v[n - 1 - a2] + v[n - 1 - a1]
            rows.append((k, n, q1, q3, q3 - q1))
        return pd.DataFrame(
            rows, columns=[key, "n", "q1_x2", "q3_x2", "iqr_x2"]) \
            .astype({"n": np.int64})

    return bucketed_group_agg(ds.select_columns([key, val]), key,
                              local, buckets=buckets)


def multiset_intersect(ds_a, ds_b, col: str, *,
                       buckets: int | None = None, out: str = "n"):
    """INTERSECT ALL as a streaming operator: per distinct value,
    min(count_a, count_b) when both sides contain it (bag
    intersection — multiset_except's complement). Sides are
    count-collapsed per block with a side tag, ONE bucketed shuffle
    folds per-side totals and takes the min."""
    def tag(side):
        def _f(t: pa.Table) -> pa.Table:
            df = t.select([col]).to_pandas()
            g = df.groupby(col, sort=False).size().reset_index(name="c")
            g["c"] = g["c"].astype(np.int64)
            g["ca"] = g["c"] if side == 0 else np.int64(0)
            g["cb"] = g["c"] if side == 1 else np.int64(0)
            return pa.Table.from_pandas(g[[col, "ca", "cb"]],
                                        preserve_index=False)
        return _f

    u = ds_a.map_batches(tag(0), batch_format="pyarrow").union(
        ds_b.map_batches(tag(1), batch_format="pyarrow"))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(col, sort=False)[["ca", "cb"]].sum()
        s[out] = np.minimum(s["ca"], s["cb"]).astype(np.int64)
        s = s[s[out] > 0].reset_index()
        return s[[col, out]]

    return bucketed_group_agg(u, col, fold, buckets=buckets)


def chi2_assoc(ds, col_a: str, col_b: str, *, q: int = 1_000_000):
    """EXACT chi-square association table between two categorical
    columns, in overflow-free integer arithmetic: the contingency
    table comes from ONE combiner-folded shuffle
    (pre_aggregated_sums pattern — O(cells x blocks) exchange), and
    each cell's contribution is reported floor-quantized,

        chi2_q(a, b) = ((N*o - ra*cb)^2 * q) // (N * ra * cb)

    computed in arbitrary-precision Python int on the tiny folded
    table (cells x 1 rows) — bit-identical to a HUGEINT SQL twin; the
    statistic is sum(chi2_q)/q up to per-cell floor error (< cells/q).
    Returns pandas (col_a, col_b, observed, chi2_q)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        df = t.select([col_a, col_b]).to_pandas()
        g = df.groupby([col_a, col_b], sort=False).size() \
            .reset_index(name="o")
        g["o"] = g["o"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([col_a, col_b]).aggregate(Sum("o", alias_name="o")) \
        .to_pandas()
    N = int(cells["o"].sum())
    ra = cells.groupby(col_a)["o"].transform("sum").astype(np.int64)
    cb = cells.groupby(col_b)["o"].transform("sum").astype(np.int64)
    chi = []
    for o, r, c in zip(cells["o"], ra, cb):
        d = N * int(o) - int(r) * int(c)
        chi.append((d * d * q) // (N * int(r) * int(c)))
    cells["observed"] = cells["o"].astype(np.int64)
    cells["chi2_q"] = np.asarray(chi, dtype=np.int64)
    return cells[[col_a, col_b, "observed", "chi2_q"]]


def skyline2(ds, min_col: str, max_col: str):
    """2-D skyline (Pareto frontier: minimize ``min_col``, maximize
    ``max_col``): a row survives iff no other row is <= on min_col,
    >= on max_col, and strictly better on one. Incomparable ties
    (equal on both) all survive, matching the SQL NOT EXISTS twin.

    Distribution is the textbook combiner: the skyline of a union is
    the skyline of the skylines, so every block collapses to its
    local frontier (vectorized sort + running-max sweep) and ONE
    final fold over the tiny concatenated frontiers finishes — the
    exchange carries O(frontier x blocks) rows, never the table."""
    def local(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        df = df.sort_values([min_col, max_col],
                            ascending=[True, False], kind="mergesort")
        v = df[max_col].to_numpy(dtype=np.float64)
        p = df[min_col].to_numpy()
        first = np.r_[True, p[1:] != p[:-1]]    # min_col class starts
        cls = np.cumsum(first) - 1              # class index per row
        ctop = v[first]                         # class max (sorted desc)
        run = np.maximum.accumulate(ctop)
        prev_best = np.r_[-np.inf, run[:-1]]    # best among cheaper
        keep = (v == ctop[cls]) & (ctop[cls] > prev_best[cls])
        return df[keep]

    def partial(t: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(local(t.to_pandas()),
                                    preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return local(parts.to_pandas())


def global_distinct_count(ds, col: str, *, buckets: int | None = None,
                          count_nulls: bool = True):
    """Exact global COUNT(DISTINCT col) plus row/null counts in one
    streaming pass: each block emits its local unique values (the
    combiner — a block never ships duplicates), ONE bucketed shuffle
    dedups across blocks, and per-bucket distinct subtotals fold on
    the driver. Returns (n_rows, n_null, n_distinct) ints; nulls are
    excluded from the distinct count (SQL semantics)."""
    import ray.data

    meta = {"rows": 0, "nulls": 0}

    def partial(t: pa.Table) -> pa.Table:
        c = t.column(col)
        nn = pc.drop_null(c)
        u = pc.unique(nn)
        if len(u) == 0 and t.num_rows:
            # all-null block: one null carrier row keeps the counts
            # (pandas nunique drops NaN, so distinct is unaffected)
            u = pa.nulls(1, type=c.type)
        k = len(u)
        rows = np.zeros(k, np.int64)
        nulls = np.zeros(k, np.int64)
        if k:
            rows[0] = t.num_rows
            nulls[0] = t.num_rows - len(nn)
        return pa.table({col: u, "rows__": pa.array(rows),
                         "null__": pa.array(nulls)})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "nd": np.array([g[col].nunique()], dtype=np.int64),
            "rows__": np.array([g["rows__"].sum()], dtype=np.int64),
            "null__": np.array([g["null__"].sum()], dtype=np.int64)})

    parts = bucketed_group_agg(
        ds.select_columns([col]).map_batches(
            partial, batch_format="pyarrow"), col, fold,
        buckets=buckets).to_pandas()
    return (int(parts["rows__"].sum()), int(parts["null__"].sum()),
            int(parts["nd"].sum()))


def value_islands(ds, col: str, *, window: int = 4096):
    """Gaps-and-islands over an integer key column: maximal runs of
    consecutive DISTINCT values, the continuity audit behind
    "which orderkey ranges exist" / missing-shard detection.

    Distribution is a 1-D dissolve: values co-partition by
    fixed-width windows (v // window — ONE shuffle), each window
    resolves its interior islands vectorized and FINAL, and only the
    <= 2 edge islands per window go to the driver, which stitches
    cross-window chains (s == prev_end + 1) in one linear pass —
    O(windows) driver rows; interior islands STAY a Dataset (on
    sparse keys the island list is itself big). Returns
    Dataset(start, end, n_values), n_values == end-start+1 by
    construction."""
    def tag(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"v": pa.array(v),
                         "w": pa.array(v // window)})

    def per_window(g: pd.DataFrame) -> pd.DataFrame:
        v = np.unique(g["v"].to_numpy())
        w0 = int(g["w"].iloc[0])
        brk = np.nonzero(np.diff(v) > 1)[0]
        starts = np.r_[0, brk + 1]
        ends = np.r_[brk, len(v) - 1]
        s, e = v[starts], v[ends]
        # an island can only continue across the window boundary if
        # it touches it — everything else is final where it stands
        edge = (s == w0 * window) | (e == w0 * window + window - 1)
        return pd.DataFrame({"start": s, "end": e,
                             "edge": edge.astype(np.int64)})

    parts = ds.select_columns([col]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("w").map_groups(per_window, batch_format="pandas") \
        .materialize()
    interior = parts.filter(expr="edge == 0") \
        .select_columns(["start", "end"])
    edges = parts.filter(expr="edge == 1") \
        .select_columns(["start", "end"]).to_pandas()
    if len(edges):  # empty to_pandas drops columns (NOTES_r2)
        edges = edges.sort_values("start").reset_index(drop=True)
        s = edges["start"].to_numpy()
        e = edges["end"].to_numpy()
        gid = np.cumsum(np.r_[True, s[1:] != e[:-1] + 1]) - 1
        st = pd.DataFrame({"start": s, "end": e, "g": gid}) \
            .groupby("g").agg(start=("start", "min"),
                              end=("end", "max")) \
            .reset_index(drop=True)
    else:
        st = pd.DataFrame({"start": pd.Series([], dtype=np.int64),
                           "end": pd.Series([], dtype=np.int64)})

    import ray.data

    def finish(t: pa.Table) -> pa.Table:
        s2 = t.column("start").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        e2 = t.column("end").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"start": pa.array(s2), "end": pa.array(e2),
                         "n_values": pa.array(e2 - s2 + 1)})

    stitched = ray.data.from_pandas(
        st.astype({"start": np.int64, "end": np.int64})) \
        if len(st) else None
    out = interior.union(stitched) if stitched is not None \
        else interior
    return out.map_batches(finish, batch_format="pyarrow")


def snapshot_diff(a, b, key: str, fp: str, *,
                  buckets: int | None = None):
    """Change detection between two snapshot Datasets keyed by a
    unique ``key`` with a payload fingerprint ``fp`` (int64): per key
    emit status 'added' (b only) / 'removed' (a only) / 'changed'
    (fingerprints differ) / 'same'. Side-tagged union + ONE bucketed
    shuffle; a bucket resolves its keys with one vectorized sort +
    pairing pass. Pairs with xor_fingerprint: the checksum says a
    replica diverged, snapshot_diff says which keys and how.
    Returns Dataset(key, status)."""
    def tag(side):
        def _f(t: pa.Table) -> pa.Table:
            return pa.table({
                key: t.column(key),
                fp: pc.cast(t.column(fp), pa.int64()),
                "side__": pa.array(
                    np.full(t.num_rows, side, dtype=np.int8))})
        return _f

    u = a.map_batches(tag(0), batch_format="pyarrow").union(
        b.map_batches(tag(1), batch_format="pyarrow"))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        k = g[key].to_numpy()
        s = g["side__"].to_numpy()
        f = g[fp].to_numpy()
        order = np.lexsort((s, k))
        k, s, f = k[order], s[order], f[order]
        n = len(k)
        first = np.r_[True, k[1:] != k[:-1]]
        starts = np.nonzero(first)[0]
        ends = np.r_[starts[1:], n]
        span = ends - starts
        if (span > 2).any():
            raise ValueError("snapshot keys must be unique per side")
        both = span == 2
        status = np.empty(len(starts), dtype=object)
        # singleton: side 0 -> removed, side 1 -> added
        solo = ~both
        status[solo] = np.where(s[starts[solo]] == 0,
                                "removed", "added")
        if both.any():
            i0 = starts[both]
            status[both] = np.where(f[i0] == f[i0 + 1],
                                    "same", "changed")
        return pd.DataFrame({key: k[starts], "status": status})

    return bucketed_group_agg(u, key, fold, buckets=buckets)


def two_sample_ks(ds_a, ds_b, col: str, *, window: int = 4096,
                  buckets: int | None = None):
    """Two-sample Kolmogorov–Smirnov distance in EXACT integers (the
    data-drift monitor): over int64 values, returns one row
    (na, nb, d_num) with

        d_num = max over v of |cdf_a(v)*nb - cdf_b(v)*na|

    so D = d_num / (na*nb) exactly — no float CDFs anywhere.

    Distribution: side-tagged union co-partitions by value window
    (v // window, ONE shuffle). Phase 1 folds per-window side totals
    (tiny); the driver prefix-sums them into per-window CDF offsets;
    phase 2 broadcasts the offsets and each window computes its local
    maximum gap FINAL — the exchange carries per-window summaries,
    never the samples. The tagged table materializes once and feeds
    both phases."""
    import ray

    def tag(side):
        def _f(t: pa.Table) -> pa.Table:
            v = t.column(col).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            return pa.table({
                "v": pa.array(v),
                "w": pa.array(v // window),
                "s": pa.array(np.full(len(v), side, dtype=np.int8))})
        return _f

    u = ds_a.map_batches(tag(0), batch_format="pyarrow").union(
        ds_b.map_batches(tag(1), batch_format="pyarrow")) \
        .materialize()

    def totals(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "w": t.column("w").to_numpy(zero_copy_only=False),
            "s": t.column("s").to_numpy(zero_copy_only=False)})
        g = df.groupby(["w", "s"], sort=False).size() \
            .reset_index(name="c")
        g["c"] = g["c"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    tot = u.map_batches(totals, batch_format="pyarrow") \
        .groupby(["w", "s"]).aggregate(Sum("c", alias_name="c")) \
        .to_pandas()
    piv = tot.pivot_table(index="w", columns="s", values="c",
                          fill_value=0, aggfunc="sum").sort_index()
    wa = piv[0].to_numpy(dtype=np.int64) if 0 in piv else \
        np.zeros(len(piv), dtype=np.int64)
    wb = piv[1].to_numpy(dtype=np.int64) if 1 in piv else \
        np.zeros(len(piv), dtype=np.int64)
    na, nb = int(wa.sum()), int(wb.sum())
    off_a = np.r_[0, np.cumsum(wa)[:-1]]
    off_b = np.r_[0, np.cumsum(wb)[:-1]]
    offs = {int(w): (int(oa), int(ob)) for w, oa, ob in
            zip(piv.index.to_numpy(), off_a, off_b)}
    ref = ray.put((offs, na, nb))

    def gap(g: pd.DataFrame, _ref=ref) -> pd.DataFrame:
        # a hash bucket holds many windows — resolve each window's
        # local maximum in one vectorized sweep over the sorted frame
        offs_, na_, nb_ = ray.get(_ref)
        if not len(g):
            return pd.DataFrame({"d": pd.Series([], dtype=object)})
        w = g["w"].to_numpy()
        v = g["v"].to_numpy()
        s = g["s"].to_numpy()
        order = np.lexsort((v, w))
        w, v, s = w[order], v[order], s[order]
        first = np.r_[True, w[1:] != w[:-1]]
        gid = np.cumsum(first) - 1
        # per-window cumulative side counts: global cumsum minus the
        # window's starting cumsum
        ca_g = np.cumsum(s == 0).astype(np.int64)
        cb_g = np.cumsum(s == 1).astype(np.int64)
        start_a = np.r_[0, ca_g[:-1]][first][gid]
        start_b = np.r_[0, cb_g[:-1]][first][gid]
        ca = ca_g - start_a
        cb = cb_g - start_b
        oa = np.array([offs_[int(x)][0] for x in w[first]],
                      dtype=np.int64)[gid]
        ob = np.array([offs_[int(x)][1] for x in w[first]],
                      dtype=np.int64)[gid]
        last = np.r_[(v[1:] != v[:-1]) | (w[1:] != w[:-1]), True]
        d = np.abs((oa[last] + ca[last]).astype(object) * nb_
                   - (ob[last] + cb[last]).astype(object) * na_)
        return pd.DataFrame({"d": [int(max(d))]})

    parts = bucketed_group_agg(u, "w", gap, buckets=buckets) \
        .to_pandas()
    d_num = int(parts["d"].astype(object).max()) if len(parts) else 0
    return pd.DataFrame({
        "na": np.array([na], dtype=np.int64),
        "nb": np.array([nb], dtype=np.int64),
        "d_num": np.array([d_num], dtype=np.int64)})



def two_sample_emd(ds_a, ds_b, col: str, *, window: int = 4096,
                   buckets: int | None = None):
    """Exact two-sample 1-D Earth Mover (Wasserstein-1) distance
    numerator — the L1 sibling of two_sample_ks (the KS max becomes
    an integral):

        emd_num = sum over consecutive distinct values v_i of
                  |cdf_a(v_i)*nb - cdf_b(v_i)*na| * (v_{i+1} - v_i)

    so EMD = emd_num / (na*nb) exactly. Same distributed shape as
    the KS: ONE value-window co-partition, per-window side totals ->
    driver prefix offsets -> per-window LOCAL integral (internal
    gaps) plus per-window (vmin, vmax); the driver adds the boundary
    terms between consecutive occupied windows from the phase-1
    offsets alone (cdf at a window's end == the next window's
    offset). Per-window sums fold in two int64 limbs (terms stay
    < 2^62; a straight int64 sum overflows at corpus scale), the
    driver fold is python-int exact. Returns one row
    (na, nb, emd_hi, emd_lo) with emd_num = emd_hi * 2^62 + emd_lo.
    """
    import ray

    LIMB = np.int64(1) << np.int64(31)

    def tag(side):
        def _f(t: pa.Table) -> pa.Table:
            v = t.column(col).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            return pa.table({
                "v": pa.array(v),
                "w": pa.array(v // window),
                "s": pa.array(np.full(len(v), side, dtype=np.int8))})
        return _f

    u = ds_a.map_batches(tag(0), batch_format="pyarrow").union(
        ds_b.map_batches(tag(1), batch_format="pyarrow")) \
        .materialize()

    def totals(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "w": t.column("w").to_numpy(zero_copy_only=False),
            "s": t.column("s").to_numpy(zero_copy_only=False)})
        g = df.groupby(["w", "s"], sort=False).size() \
            .reset_index(name="c")
        g["c"] = g["c"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    tot = u.map_batches(totals, batch_format="pyarrow") \
        .groupby(["w", "s"]).aggregate(Sum("c", alias_name="c")) \
        .to_pandas()
    piv = tot.pivot_table(index="w", columns="s", values="c",
                          fill_value=0, aggfunc="sum").sort_index()
    wa = piv[0].to_numpy(dtype=np.int64) if 0 in piv else \
        np.zeros(len(piv), dtype=np.int64)
    wb = piv[1].to_numpy(dtype=np.int64) if 1 in piv else \
        np.zeros(len(piv), dtype=np.int64)
    na, nb = int(wa.sum()), int(wb.sum())
    off_a = np.r_[0, np.cumsum(wa)[:-1]]
    off_b = np.r_[0, np.cumsum(wb)[:-1]]
    offs = {int(w): (int(oa), int(ob)) for w, oa, ob in
            zip(piv.index.to_numpy(), off_a, off_b)}
    ref = ray.put((offs, na, nb))

    def local(g: pd.DataFrame, _ref=ref) -> pd.DataFrame:
        offs_, na_, nb_ = ray.get(_ref)
        if not len(g):
            return pd.DataFrame({
                "w": pd.Series([], dtype=np.int64),
                "vmin": pd.Series([], dtype=np.int64),
                "vmax": pd.Series([], dtype=np.int64),
                "hi": pd.Series([], dtype=np.int64),
                "lo": pd.Series([], dtype=np.int64)})
        w = g["w"].to_numpy()
        v = g["v"].to_numpy()
        s = g["s"].to_numpy()
        order = np.lexsort((v, w))
        w, v, s = w[order], v[order], s[order]
        first = np.r_[True, w[1:] != w[:-1]]
        gid = np.cumsum(first) - 1
        ca_g = np.cumsum(s == 0).astype(np.int64)
        cb_g = np.cumsum(s == 1).astype(np.int64)
        ca = ca_g - np.r_[0, ca_g[:-1]][first][gid]
        cb = cb_g - np.r_[0, cb_g[:-1]][first][gid]
        oa = np.array([offs_[int(x)][0] for x in w[first]],
                      dtype=np.int64)[gid]
        ob = np.array([offs_[int(x)][1] for x in w[first]],
                      dtype=np.int64)[gid]
        # last duplicate of each distinct (w, v) carries the cdf AT v
        last = np.r_[(v[1:] != v[:-1]) | (w[1:] != w[:-1]), True]
        wl, vl = w[last], v[last]
        gap_ok = np.r_[wl[1:] == wl[:-1], False]   # internal gaps only
        diff = np.abs((oa[last] + ca[last]) * nb_
                      - (ob[last] + cb[last]) * na_)
        gapv = np.r_[vl[1:] - vl[:-1], 0]
        term = diff * gapv * gap_ok
        out = pd.DataFrame({
            "w": wl, "t_lo": term % LIMB, "t_hi": term // LIMB,
            "v": vl})
        p = out.groupby("w", sort=False).agg(
            vmin=("v", "min"), vmax=("v", "max"),
            lo=("t_lo", "sum"), hi=("t_hi", "sum")).reset_index()
        return p.astype(np.int64)

    parts = bucketed_group_agg(u, "w", local, buckets=buckets) \
        .to_pandas().sort_values("w").reset_index(drop=True)
    emd = 0
    for hi, lo in zip(parts["hi"].to_numpy(),
                      parts["lo"].to_numpy()):
        emd += int(hi) * int(LIMB) + int(lo)
    # boundary terms between consecutive occupied windows: cdf at the
    # end of window i is the exclusive offset of window i+1
    ws = parts["w"].to_numpy(dtype=np.int64)
    for i in range(len(ws) - 1):
        wi = int(ws[i])
        oa, ob = offs[wi]
        cend_a = oa + int(wa[piv.index.get_loc(wi)])
        cend_b = ob + int(wb[piv.index.get_loc(wi)])
        gap = int(parts["vmin"].iloc[i + 1]) \
            - int(parts["vmax"].iloc[i])
        emd += abs(cend_a * nb - cend_b * na) * gap
    return pd.DataFrame({
        "na": np.array([na], dtype=np.int64),
        "nb": np.array([nb], dtype=np.int64),
        "emd_hi": np.array([emd // (1 << 62)], dtype=np.int64),
        "emd_lo": np.array([emd % (1 << 62)], dtype=np.int64)})


# ---- Count-Min sketch (Cormode & Muthukrishnan 2005) ----------------

# mix multipliers are odd and < 2^40 so the SQL twin's HUGEINT
# product fnv(2^64) * mix stays < 2^104 (the sql_fnv1a headroom rule)
CM_MIX = (0x9E3779B97F, 0xC2B2AE3D27, 0x165667B19F, 0x27D4EB2F17)
CM_ADD = (0x1B873593, 0xCC9E2D51, 0x85EBCA6B, 0xE6546B64)
_M64 = 1 << 64


def count_min(ds, col: str, *, width: int = 2048, depth: int = 4):
    """Count-Min sketch of a string column plus point estimates for
    every distinct key: cell(d, j) = sum of counts of keys with
    h_d(key) == j, estimate = min_d cell(d, h_d(key)) — the classic
    biased-up frequency sketch, O(depth·width) memory regardless of
    cardinality. h_d = (fnv1a64(key)·MIX_d + ADD_d) mod 2^64 mod w,
    all wraparound arithmetic, so the WHOLE sketch (collisions
    included) is reproducible in SQL — the twin hashes the key set
    the same way and reproduces every cell, making even the
    overestimates value-exact.

    Distributed shape: one pass folds per-block (depth, width) int64
    partials (np.add.at over the block's distinct keys) — sketches
    are mergeable by elementwise add; the per-block distinct
    (key, count) partials ride the SAME pass into the existing
    bucketed distinct fold, so estimates come out in one source
    scan + one small shuffle + one O(d·w) driver add.

    Returns Dataset(key, c_est). At true corpus scale you would skip
    the distinct fold and query the sketch directly; the distinct
    join here is what makes the output an oracle-checkable table.
    """
    import ray
    from ray.data.aggregate import Sum

    from spapy_ray.kernels.hashing import fnv1a64

    def partial(t: pa.Table) -> pa.Table:
        vc = t.column(col).value_counts()
        keys = vc.field("values")
        cnts = vc.field("counts").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        f = fnv1a64(keys)
        sk = np.zeros((depth, width), dtype=np.int64)
        for d in range(depth):
            h = ((f * np.uint64(CM_MIX[d])) + np.uint64(CM_ADD[d])) \
                % np.uint64(width)
            np.add.at(sk[d], h.astype(np.int64), cnts)
        kt = pa.table({
            "key": pc.cast(keys, pa.string()),
            "c": pa.array(cnts),
            "sk": pa.nulls(len(keys), type=pa.binary()),
            "is_sk": pa.array(np.zeros(len(keys), dtype=np.int8))})
        st = pa.table({
            "key": pa.array([""], type=pa.string()),
            "c": pa.array([0], type=pa.int64()),
            "sk": pa.array([sk.tobytes()], type=pa.binary()),
            "is_sk": pa.array(np.ones(1, dtype=np.int8))})
        return pa.concat_tables([kt, st])

    both = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow").materialize()

    # O(blocks) sketch rows fold on the driver (elementwise add)
    skp = both.filter(expr="is_sk == 1").select_columns(["sk"]) \
        .to_pandas()
    sk = np.zeros((depth, width), dtype=np.int64)
    if len(skp):
        for b in skp["sk"]:
            sk += np.frombuffer(b, dtype=np.int64) \
                .reshape(depth, width)
    ref = ray.put(sk)

    keys = both.filter(expr="is_sk == 0") \
        .groupby("key").aggregate(Sum("c", alias_name="c"))

    def estimate(t: pa.Table, _ref=ref) -> pa.Table:
        s = ray.get(_ref)
        f = fnv1a64(t.column("key"))
        est = np.full(len(t), np.iinfo(np.int64).max, dtype=np.int64)
        for d in range(depth):
            h = ((f * np.uint64(CM_MIX[d])) + np.uint64(CM_ADD[d])) \
                % np.uint64(width)
            est = np.minimum(est, s[d][h.astype(np.int64)])
        return pa.table({"key": t.column("key"),
                         "c_est": pa.array(est)})

    return keys.map_batches(estimate, batch_format="pyarrow")


def mann_whitney_u(ds_a, ds_b, col: str, *, window: int = 4096,
                   buckets: int | None = None):
    """Exact Mann–Whitney U (Wilcoxon rank-sum) statistic between two
    int64 samples — the nonparametric location-shift drift test that
    complements two_sample_ks. Tie handling is the midrank
    convention kept integral by doubling:

        u2 = sum over distinct v of
                 c_a(v) * (2*cum_before(v) + c(v) + 1)
             - na*(na+1)            (== 2*U_a; u2_a + u2_b = 2*na*nb)

    Same distributed shape as two_sample_ks: ONE value-window
    co-partition, per-window side totals prefix-summed on the driver
    into rank offsets, per-window vectorized tie-block folds, tiny
    exchange. Returns one row (na, nb, u2)."""
    import ray
    from ray.data.aggregate import Sum

    def tag(side):
        def _f(t: pa.Table) -> pa.Table:
            v = t.column(col).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            return pa.table({
                "v": pa.array(v),
                "w": pa.array(v // window),
                "s": pa.array(np.full(len(v), side, dtype=np.int8))})
        return _f

    u = ds_a.map_batches(tag(0), batch_format="pyarrow").union(
        ds_b.map_batches(tag(1), batch_format="pyarrow")) \
        .materialize()

    def totals(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "w": t.column("w").to_numpy(zero_copy_only=False),
            "s": t.column("s").to_numpy(zero_copy_only=False)})
        g = df.groupby(["w", "s"], sort=False).size() \
            .reset_index(name="c")
        g["c"] = g["c"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    tot = u.map_batches(totals, batch_format="pyarrow") \
        .groupby(["w", "s"]).aggregate(Sum("c", alias_name="c")) \
        .to_pandas()
    piv = tot.pivot_table(index="w", columns="s", values="c",
                          fill_value=0, aggfunc="sum").sort_index()
    wa = piv[0].to_numpy(dtype=np.int64) if 0 in piv else \
        np.zeros(len(piv), dtype=np.int64)
    wb = piv[1].to_numpy(dtype=np.int64) if 1 in piv else \
        np.zeros(len(piv), dtype=np.int64)
    na, nb = int(wa.sum()), int(wb.sum())
    off = np.r_[0, np.cumsum(wa + wb)[:-1]]
    offs = {int(w): int(o) for w, o in
            zip(piv.index.to_numpy(), off)}
    ref = ray.put(offs)

    def fold(g: pd.DataFrame, _ref=ref) -> pd.DataFrame:
        offs_ = ray.get(_ref)
        if not len(g):
            return pd.DataFrame({"r2": pd.Series([], dtype=object)})
        w = g["w"].to_numpy()
        v = g["v"].to_numpy()
        s = g["s"].to_numpy()
        order = np.lexsort((v, w))
        w, v, s = w[order], v[order], s[order]
        neww = np.r_[True, w[1:] != w[:-1]]
        newv = neww | np.r_[True, v[1:] != v[:-1]]
        gid = np.cumsum(newv) - 1                 # tie-block id
        ca = np.bincount(gid, weights=(s == 0)).astype(np.int64)
        c = np.bincount(gid).astype(np.int64)
        # block's cum_before within its window + the window offset
        blk_w = w[newv]
        cum_in_w = np.concatenate([[0], np.cumsum(c)[:-1]])
        w_start = cum_in_w[np.r_[True, blk_w[1:] != blk_w[:-1]]]
        cum_before = cum_in_w - w_start[
            np.cumsum(np.r_[True, blk_w[1:] != blk_w[:-1]]) - 1]
        base = np.array([offs_[int(x)] for x in blk_w],
                        dtype=np.int64)
        r2 = (ca.astype(object)
              * (2 * (base + cum_before) + c + 1)).sum()
        return pd.DataFrame({"r2": [int(r2)]})

    parts = bucketed_group_agg(u, "w", fold, buckets=buckets) \
        .to_pandas()
    r2 = int(sum(int(x) for x in parts["r2"])) if len(parts) else 0
    u2 = r2 - na * (na + 1)
    return pd.DataFrame({
        "na": np.array([na], dtype=np.int64),
        "nb": np.array([nb], dtype=np.int64),
        "u2": np.array([u2], dtype=np.int64)})


def grouped_spearman(ds, key: str, x: str, y: str, *,
                     q: int = 10 ** 6, buckets: int | None = None):
    """Exact per-group Spearman rank correlation, reported as the
    SIGNED SQUARE (sqrt-free): with doubled midranks rx, ry
    (integers even under ties),

        num = n·Σrxry − Σrx·Σry
        rho2_q = sign(num) · trunc(q · num² / (dxx · dyy))

    dxx = n·Σrx² − (Σrx)², dyy likewise — every quantity a big
    integer, so the statistic is value-exact (a plain Spearman would
    need a square root). One bucketed shuffle; ranks and moments are
    group-local (the grouped_median scale contract: a key's rows fit
    its bucket). Returns Dataset-(key, n, rho2_q) as pandas."""
    def fold(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, gg in g.groupby(key, sort=False):
            n = len(gg)
            rx = (2.0 * gg[x].rank(method="average")).astype(np.int64)
            ry = (2.0 * gg[y].rank(method="average")).astype(np.int64)
            rxl = rx.to_numpy().astype(object)
            ryl = ry.to_numpy().astype(object)
            sx, sy = int(rxl.sum()), int(ryl.sum())
            sxy = int((rxl * ryl).sum())
            sxx = int((rxl * rxl).sum())
            syy = int((ryl * ryl).sum())
            num = n * sxy - sx * sy
            dxx = n * sxx - sx * sx
            dyy = n * syy - sy * sy
            den = dxx * dyy
            r = 0 if den == 0 else \
                (1 if num >= 0 else -1) * (q * num * num // den)
            rows.append((k, n, r))
        return pd.DataFrame(rows, columns=[key, "n", "rho2_q"]) \
            .astype({"n": np.int64, "rho2_q": np.int64})

    return bucketed_group_agg(ds.select_columns([key, x, y]), key,
                              fold, buckets=buckets)


# integer mix for hll_registers: Murmur3-finalizer shape with
# multipliers < 2^40 so the SQL twin's HUGEINT products stay < 2^104
# (the sql_fnv1a headroom rule — 64-bit constants overflow INT128)
HLL_MIX_A = 0xFF51AFD7ED
HLL_MIX_B = 0xC4CEB9FE1A


def _hll_mix(x: np.ndarray) -> np.ndarray:
    """Avalanche an int64/uint64 key column (wraparound uint64)."""
    h = x.astype(np.uint64)
    h = h ^ (h >> np.uint64(33))
    h = h * np.uint64(HLL_MIX_A)
    h = h ^ (h >> np.uint64(29))
    h = h * np.uint64(HLL_MIX_B)
    return h ^ (h >> np.uint64(32))


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact bit length of uint64 values (no float round trip —
    values above 2^53 are not float64-exact, so log2 is unsafe)."""
    x = x.copy()
    r = np.zeros(len(x), dtype=np.int64)
    for sh in (32, 16, 8, 4, 2, 1):
        m = x >= (np.uint64(1) << np.uint64(sh))
        r[m] += sh
        x[m] >>= np.uint64(sh)
    r[x > 0] += 1
    return r


def hll_registers(ds, col: str, *, p: int = 10):
    """HyperLogLog sketch (Flajolet et al. 2007) of an integer key
    column: m = 2^p registers, register j = max over keys hashing to
    bucket j of (leading zero count of the remaining 64-p bits + 1).
    Registers are MERGEABLE by elementwise max, so the distributed
    fold is one map pass emitting per-block (reg, rho) partials and
    an O(m) driver max — no shuffle at all.

    Returns a pandas frame of ALL m rows (reg, rho — 0 for untouched
    registers) plus the constant raw-estimate column
    est_q = m^2 * 2^(64-p+1) // sum_j 2^(64-p+1-rho_j), the
    harmonic-mean HLL estimate as one exact big-integer ratio (no
    alpha bias correction — that constant is a float; applying it is
    a driver-side one-liner and pytest checks the corrected estimate
    lands within the expected error envelope).
    """
    m = 1 << p
    rest_bits = 64 - p

    def partial(t: pa.Table) -> pa.Table:
        x = t.column(col).to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            h = _hll_mix(x)
        reg = (h >> np.uint64(rest_bits)).astype(np.int64)
        rest = h & ((np.uint64(1) << np.uint64(rest_bits))
                    - np.uint64(1))
        rho = rest_bits + 1 - _bit_length_u64(rest)
        best = np.zeros(m, dtype=np.int64)
        np.maximum.at(best, reg, rho)
        nz = np.nonzero(best)[0]
        return pa.table({"reg": pa.array(nz.astype(np.int64)),
                         "rho": pa.array(best[nz])})

    parts = pa.concat_tables(
        [b for b in ds.select_columns([col])
         .map_batches(partial, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow")],
        promote_options="default")
    regs = np.zeros(m, dtype=np.int64)
    np.maximum.at(regs,
                  parts.column("reg").to_numpy(zero_copy_only=False),
                  parts.column("rho").to_numpy(zero_copy_only=False))
    denom = sum(1 << (rest_bits + 1 - int(r)) for r in regs)
    est_q = (m * m) * (1 << (rest_bits + 1)) // denom
    return pd.DataFrame({
        "reg": np.arange(m, dtype=np.int64),
        "rho": regs,
        "est_q": np.full(m, est_q, dtype=np.int64)})


def bloom_bits(ds, col: str, *, m_bits: int = 1 << 20,
               depth: int = 4):
    """Bloom filter of a string column as an EXPORTED artifact: the
    classic membership sketch (Bloom 1970) — k=depth positions per
    key via the count_min hash family (fnv1a64 * MIX_d + ADD_d mod
    2^64 mod m), OR-folded into an m-bit array. Registers are
    mergeable by OR, so the distributed fold is one map pass of
    per-block nonzero words + an O(m/64) driver OR — no shuffle.

    Returns pandas (word, hi, lo) for every NONZERO 64-bit word —
    hi/lo are the word's 32-bit halves (a raw uint64 word does not
    survive the BIGINT twin cast once bit 63 is set).
    """
    from spapy_ray.kernels.hashing import fnv1a64

    n_words = m_bits >> 6

    def partial(t: pa.Table) -> pa.Table:
        keys = pc.unique(t.column(col))
        f = fnv1a64(keys)
        arr = np.zeros(n_words, dtype=np.uint64)
        for d in range(depth):
            pos = ((f * np.uint64(CM_MIX[d]) + np.uint64(CM_ADD[d]))
                   % np.uint64(m_bits)).astype(np.int64)
            np.bitwise_or.at(arr, pos >> 6,
                             np.uint64(1) << (pos & 63).astype(np.uint64))
        nz = np.nonzero(arr)[0]
        return pa.table({"word": pa.array(nz.astype(np.int64)),
                         "bits": pa.array(arr[nz].view(np.int64))})

    parts = pa.concat_tables(
        [b for b in ds.select_columns([col])
         .map_batches(partial, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow")],
        promote_options="default")
    arr = np.zeros(n_words, dtype=np.uint64)
    np.bitwise_or.at(
        arr, parts.column("word").to_numpy(zero_copy_only=False),
        parts.column("bits").to_numpy(zero_copy_only=False)
        .view(np.uint64))
    nz = np.nonzero(arr)[0]
    w = arr[nz]
    return pd.DataFrame({
        "word": nz.astype(np.int64),
        "hi": (w >> np.uint64(32)).astype(np.int64),
        "lo": (w & np.uint64(0xFFFFFFFF)).astype(np.int64)})


def grouped_two_sample_ks(ds_a, ds_b, group_col: str, col: str, *,
                          window: int = 4096,
                          buckets: int | None = None):
    """Per-GROUP exact two-sample KS numerator — the segment-wise
    drift monitor (one row per group): same value-window machinery
    as two_sample_ks with the group riding in the window key, so one
    shuffle covers every segment. Per (group, window) side totals
    fold to the driver, per-group prefix offsets broadcast back,
    per-window local maxima fold to a per-group max.

    Returns pandas (group_col, na, nb, d_num), group-sorted;
    D_g = d_num / (na*nb) per group."""
    import ray
    from ray.data.aggregate import Sum

    def tag(side):
        def _f(t: pa.Table) -> pa.Table:
            v = t.column(col).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            return pa.table({
                "g": t.column(group_col),
                "v": pa.array(v),
                "w": pa.array(v // window),
                "s": pa.array(np.full(len(v), side, dtype=np.int8))})
        return _f

    u = ds_a.map_batches(tag(0), batch_format="pyarrow").union(
        ds_b.map_batches(tag(1), batch_format="pyarrow")) \
        .materialize()

    def totals(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "g": t.column("g").to_numpy(zero_copy_only=False),
            "w": t.column("w").to_numpy(zero_copy_only=False),
            "s": t.column("s").to_numpy(zero_copy_only=False)})
        out = df.groupby(["g", "w", "s"], sort=False).size() \
            .reset_index(name="c")
        out["c"] = out["c"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    tot = u.map_batches(totals, batch_format="pyarrow") \
        .groupby(["g", "w", "s"]).aggregate(Sum("c", alias_name="c")) \
        .to_pandas()
    piv = tot.pivot_table(index=["g", "w"], columns="s", values="c",
                          fill_value=0, aggfunc="sum").sort_index()
    wa = piv[0].to_numpy(dtype=np.int64) if 0 in piv else \
        np.zeros(len(piv), dtype=np.int64)
    wb = piv[1].to_numpy(dtype=np.int64) if 1 in piv else \
        np.zeros(len(piv), dtype=np.int64)
    gs = piv.index.get_level_values(0).to_numpy()
    nsums = {}
    offs = {}
    # per-group exclusive prefixes in window order (index is sorted)
    run_a = run_b = 0
    prev_g = None
    for i, (g, w) in enumerate(piv.index):
        if g != prev_g:
            run_a = run_b = 0
            prev_g = g
        offs[(g, int(w))] = (run_a, run_b)
        run_a += int(wa[i])
        run_b += int(wb[i])
        nsums[g] = (run_a, run_b)
    ref = ray.put((offs, nsums))

    def gap(gdf: pd.DataFrame, _ref=ref) -> pd.DataFrame:
        offs_, nsums_ = ray.get(_ref)
        if not len(gdf):
            return pd.DataFrame({
                "g": pd.Series([], dtype=object),
                "d": pd.Series([], dtype=np.int64)})
        rows = []
        for (g, w), gg in gdf.groupby(["g", "w"], sort=False):
            v = gg["v"].to_numpy()
            s = gg["s"].to_numpy()
            order = np.argsort(v, kind="stable")
            v, s = v[order], s[order]
            ca = np.cumsum(s == 0).astype(np.int64)
            cb = np.cumsum(s == 1).astype(np.int64)
            oa, ob = offs_[(g, int(w))]
            na, nb = nsums_[g]
            last = np.r_[v[1:] != v[:-1], True]
            d = np.abs((oa + ca[last]).astype(object) * nb
                       - (ob + cb[last]).astype(object) * na)
            rows.append((g, int(max(d))))
        out = pd.DataFrame(rows, columns=["g", "d"])
        return out.groupby("g", as_index=False)["d"].max()

    def wkey(t: pa.Table) -> pa.Table:
        return t.append_column(
            "wk", t.column("w"))

    parts = bucketed_group_agg(
        u.map_batches(wkey, batch_format="pyarrow"), "wk", gap,
        buckets=buckets).to_pandas()
    agg = parts.groupby("g", as_index=False)["d"].max()
    agg["na"] = [nsums[g][0] for g in agg["g"]]
    agg["nb"] = [nsums[g][1] for g in agg["g"]]
    out = agg.rename(columns={"g": group_col, "d": "d_num"})
    out["d_num"] = out["d_num"].astype(np.int64)
    out["na"] = out["na"].astype(np.int64)
    out["nb"] = out["nb"].astype(np.int64)
    return out[[group_col, "na", "nb", "d_num"]] \
        .sort_values(group_col).reset_index(drop=True)


def kmv_sketch_overlap(ds_a, ds_b, col: str, *, k: int = 256,
                       m_mod: int = 1 << 62):
    """KMV (k-minimum-values / theta) distinct sketches of two sides
    plus their set-intersection estimate — the sketch family member
    the HLL registers cannot provide (register max is union-only;
    KMV intersects).  Deterministic: h(x) = fnv(x) % 2^62, the
    sketch is the k SMALLEST DISTINCT hash values, so the SQL twin
    reproduces every number exactly (ORDER BY h LIMIT k).

    est(S)      = (k-1) * M // theta_S        (theta = k-th value)
    U           = k smallest of K_a ∪ K_b, theta_u = max(U)
    m           = |{x in U : x in K_a and x in K_b}|
    est_inter   = m * (k-1) * M // (k * theta_u)

    When a side has fewer than k distinct values its sketch is the
    whole set and est falls back to the exact count.  Distributed
    shape: per-block k-min partials over per-block distinct hashes
    (bounded k int64 each), an associative fold (tree-reducible; the
    driver folds blocks*k ints here, same bound class as the MG/KLL
    folds).  Returns a one-row pandas frame with the sketch numbers
    and the exact intersection for calibration."""
    import ray

    from spapy_ray.kernels.hashing import fnv1a64

    def partial(side: int):
        def _f(t: pa.Table) -> pa.Table:
            vals = t.column(col)
            if isinstance(vals, pa.ChunkedArray):
                vals = vals.combine_chunks()
            h = ((fnv1a64(pc.cast(vals, pa.string()))
                  * np.uint64(2654435761))       # magnitude mix: raw
                 # FNV of short keys clusters low (est was 3.4x off);
                 # an odd multiplier mod 2^62 is uniform AND exactly
                 # (fnv * C) % 2^62 in HUGEINT on the SQL side
                 % np.uint64(m_mod)).astype(np.int64)
            u = np.unique(h)
            return pa.table({"side": pa.array(
                np.full(1, side, np.int8)),
                "mins": pa.array([u[:k].tobytes()], type=pa.binary()),
                "alln": pa.array([len(u)], type=pa.int64())})
        return _f

    def collect(ds, side):
        outs = []
        exact = set()
        for b in ds.map_batches(partial(side), batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow"):
            for buf in b.column("mins").to_pylist():
                arr = np.frombuffer(buf, dtype=np.int64)
                outs.append(arr)
                exact.update(int(v) for v in arr)
        # per-block mins are partial (block-distinct only); the k-min
        # fold over them is exact because a global k-min value is a
        # k-min value of its own block
        allv = np.unique(np.concatenate(outs)) if outs \
            else np.empty(0, np.int64)
        return allv[:k]

    ka = collect(ds_a, 0)
    kb = collect(ds_b, 1)

    def est(ks: np.ndarray) -> int:
        if len(ks) < k:
            return len(ks)
        # clamp: a pathologically small theta must not overflow the
        # int64 output (the SQL twin applies the same LEAST)
        return min((k - 1) * m_mod // int(ks[-1]), m_mod)

    union = np.unique(np.concatenate([ka, kb]))
    u = union[:k]
    sa, sb = set(ka.tolist()), set(kb.tolist())
    m = sum(1 for x in u.tolist() if x in sa and x in sb)
    if len(u) < k:
        est_inter = m
    else:
        theta_u = int(u[-1])
        est_inter = min(m * (k - 1) * m_mod // (k * theta_u), m_mod)
    # calibration column: the exact intersection from its own
    # bucketed pass (what the sketch avoids at scale; here it shows
    # the estimator's error to the oracle)
    exact_inter = _exact_distinct_intersection(ds_a, ds_b, col, m_mod)
    import pandas as pd

    return pd.DataFrame([{
        "k": np.int64(k),
        "n_sketch_a": np.int64(len(ka)),
        "n_sketch_b": np.int64(len(kb)),
        "est_a": np.int64(est(ka)),
        "est_b": np.int64(est(kb)),
        "m_common": np.int64(m),
        "est_inter": np.int64(est_inter),
        "exact_inter": np.int64(exact_inter),
    }])


def _exact_distinct_intersection(ds_a, ds_b, col: str,
                                 m_mod: int) -> int:
    """Exact |distinct(A) ∩ distinct(B)| by hash value: one bucketed
    union pass (side-tagged distinct partials, bucket-local
    intersection counts)."""
    from spapy_ray.kernels.hashing import fnv1a64

    def rows(side: int):
        def _f(t: pa.Table) -> pa.Table:
            vals = t.column(col)
            if isinstance(vals, pa.ChunkedArray):
                vals = vals.combine_chunks()
            h = ((fnv1a64(pc.cast(vals, pa.string()))
                  * np.uint64(2654435761))       # magnitude mix: raw
                 # FNV of short keys clusters low (est was 3.4x off);
                 # an odd multiplier mod 2^62 is uniform AND exactly
                 # (fnv * C) % 2^62 in HUGEINT on the SQL side
                 % np.uint64(m_mod)).astype(np.int64)
            u = np.unique(h)
            return pa.table({"h": pa.array(u), "side": pa.array(
                np.full(len(u), side, np.int8))})
        return _f

    u = ds_a.map_batches(rows(0), batch_format="pyarrow").union(
        ds_b.map_batches(rows(1), batch_format="pyarrow"))

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("_bkt", _bucket_column(t, "h", 64))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["h", "side"])
        c = d.groupby("h", sort=False)["side"].nunique()
        return pd.DataFrame({"n": [int((c == 2).sum())]})

    tot = 0
    bucketed = u.map_batches(tag, batch_format="pyarrow") \
        .groupby("_bkt").map_groups(per_bucket, batch_format="pandas")
    for b in bucketed.iter_batches(batch_format="pyarrow"):
        tot += int(np.sum(b.column("n").to_numpy(zero_copy_only=False)))
    return tot


def frequent_triples(ds, group_col: str, key_col: str, *,
                     min_support: int = 2, k: int = 30,
                     max_group: int = 64, buckets: int | None = None):
    """Top-k frequent 3-itemsets (the Apriori level the pair-count
    queries stop short of): all sorted key triples within each
    ``group_col`` basket, counted corpus-wide, support-filtered.

    Same bucketed shape as within_group_pairs, generalized to
    3-subsets: one hash(group) shuffle; per bucket a lexsort +
    dedup + per-distinct-basket-size batched emission (ONE
    combinations fancy-index per size, applied to every same-sized
    basket at once); the (a, b, c) counts then co-locate on hash(a)
    — every triple shares its smallest member, so bucket-local
    counts are global — and per-block partial top-k bounds the
    final fold.  Baskets larger than ``max_group`` raise (C(m,3)
    emission is cubic; cap and pre-prune upstream for heavy-tailed
    baskets)."""
    from itertools import combinations

    import pandas as pd

    from spapy_ray.util import cluster_cpus

    nb = buckets or max(64, cluster_cpus() * 4)

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("bkt__",
                               _bucket_column(t, group_col, nb))

    def triples(g: pd.DataFrame) -> pd.DataFrame:
        grp = g[group_col].to_numpy()
        keys = g[key_col].to_numpy()
        order = np.lexsort((keys, grp))
        grp, keys = grp[order], keys[order]
        empty = pd.DataFrame({"a": keys[:0], "b": keys[:0],
                              "c": keys[:0]})
        if len(grp) == 0:
            return empty
        keep = np.empty(len(grp), dtype=bool)
        keep[0] = True
        keep[1:] = (grp[1:] != grp[:-1]) | (keys[1:] != keys[:-1])
        grp, keys = grp[keep], keys[keep]
        new = np.empty(len(grp), dtype=bool)
        new[0] = True
        new[1:] = grp[1:] != grp[:-1]
        starts = np.nonzero(new)[0]
        lens = np.diff(np.append(starts, len(grp)))
        if lens.max(initial=0) > max_group:
            raise ValueError(f"basket larger than {max_group}")
        outs = []
        for m in np.unique(lens):
            if m < 3:
                continue
            idx = np.asarray(list(combinations(range(int(m)), 3)))
            s = starts[lens == m]
            outs.append(pd.DataFrame({
                "a": keys[(s[:, None] + idx[None, :, 0]).ravel()],
                "b": keys[(s[:, None] + idx[None, :, 1]).ravel()],
                "c": keys[(s[:, None] + idx[None, :, 2]).ravel()]}))
        return pd.concat(outs, ignore_index=True) if outs else empty

    trip = ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("bkt__").map_groups(triples, batch_format="pandas")

    def count(df: pd.DataFrame) -> pd.DataFrame:
        if "a" not in df.columns:
            return pd.DataFrame({"a": [], "b": [], "c": [], "cnt": []})
        out = df.groupby(["a", "b", "c"], sort=False).size() \
            .reset_index(name="cnt")
        return out[out["cnt"] >= min_support]

    counted = bucketed_group_agg(trip, "a", count)

    def partial_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64())
                             for c in ("a", "b", "c", "cnt")})
        df = t.to_pandas()
        df = df.sort_values(["cnt", "a", "b", "c"],
                            ascending=[False, True, True, True]) \
            .head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    top = counted.map_batches(partial_topk, batch_format="pyarrow") \
        .to_pandas()
    if "cnt" not in top.columns:
        top = pd.DataFrame({c: [] for c in ("a", "b", "c", "cnt")})
    top = top.sort_values(["cnt", "a", "b", "c"],
                          ascending=[False, True, True, True]).head(k)
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top.reset_index(drop=True).astype(np.int64)


def radix_exact_ranks(ds, col: str, ranks_fn, *, shift: int = 12,
                      max_scan_rows: int = 10_000_000):
    """Exact global order statistics of an integer column in TWO
    streaming passes (distributed radix selection — the scalable
    alternative to a full sort for a handful of ranks):

      pass 1: per-batch bincount of ``value >> shift`` partials →
              tiny bucket-histogram groupby → the driver locates,
              from cumulative counts, which radix bucket holds each
              requested rank;
      pass 2: a filtered re-scan collects ONLY the rows of the
              needed buckets (≈ total/2^shift rows for a uniform
              column), sorts them locally, and indexes the exact
              offsets.

    ``ranks_fn(total_rows) -> list[int]`` (0-based ranks) lets the
    caller derive ranks from the count pass-1 already produced (e.g.
    the two middle ranks of a median). Returns ``(values, total)``
    where values[i] is the exact value at ranks[i].

    If the needed buckets together hold more than ``max_scan_rows``
    rows (heavy skew, or a shift too coarse for the data volume), the
    collection step RECURSES: the scan is narrowed to those buckets
    and re-histogrammed at ``shift - 8`` until the residue fits — the
    100 TB path, exercised by a unit test with a tiny cap. The input
    Dataset is executed twice per level (lineage re-read) — pass it a
    column-pruned read.
    """
    from ray.data.aggregate import Sum

    def hist(t: pa.Table) -> pa.Table:
        x = t.column(col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        u, c = np.unique(x >> shift, return_counts=True)
        return pa.table({"b": pa.array(u),
                         "n": pa.array(c.astype(np.int64))})

    agg = ds.map_batches(hist, batch_format="pyarrow") \
        .groupby("b").aggregate(Sum("n", alias_name="n")) \
        .to_pandas().sort_values("b")
    b = agg["b"].to_numpy().astype(np.int64)
    n = agg["n"].to_numpy().astype(np.int64)
    cum = np.cumsum(n)
    total = int(cum[-1]) if len(cum) else 0
    ranks = list(ranks_fn(total))
    need: dict[int, list[tuple[int, int]]] = {}
    for r in ranks:
        if not (0 <= r < total):
            raise IndexError(f"rank {r} out of range 0..{total - 1}")
        i = int(np.searchsorted(cum, r + 1))
        base = int(cum[i - 1]) if i else 0
        need.setdefault(int(b[i]), []).append((r, r - base))
    want = np.array(sorted(need), dtype=np.int64)
    residue = int(sum(n[np.isin(b, want)]))

    if residue > max_scan_rows and shift > 0:
        # recurse: narrow the scan to the rank-holding buckets and
        # re-select at a finer shift. Ranks re-express as offsets
        # into the CONCATENATION of the kept buckets (bucket order ==
        # value order, so local offsets accumulate in bucket order).
        prior = 0
        flat = []                      # (orig_rank, residue_rank)
        for bk in sorted(need):
            for r, off in sorted(need[bk], key=lambda t: t[1]):
                flat.append((r, prior + off))
            prior += int(n[b == bk][0])

        def narrow(t: pa.Table) -> pa.Table:
            x = t.column(col).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            return pa.table({col: pa.array(x[np.isin(x >> shift,
                                                     want)])})

        sub = ds.map_batches(narrow, batch_format="pyarrow")
        sub_ranks = [fr for _orig, fr in flat]
        vals_sub, _ = radix_exact_ranks(
            sub, col, lambda _n: sub_ranks,
            shift=max(0, shift - 8), max_scan_rows=max_scan_rows)
        got = {orig: v for (orig, _fr), v in zip(flat, vals_sub)}
        return [got[r] for r in ranks], total

    def pick(t: pa.Table) -> pa.Table:
        x = t.column(col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = np.isin(x >> shift, want)
        return pa.table({col: pa.array(x[m])})

    vals = ds.map_batches(pick, batch_format="pyarrow") \
        .to_pandas()[col].to_numpy().astype(np.int64)
    out = {}
    for bk, lst in need.items():
        v = np.sort(vals[(vals >> shift) == bk])
        for r, off in lst:
            out[r] = int(v[off])
    return [out[r] for r in ranks], total


# xxhash-style odd multipliers (< 2^32, so the HUGEINT twin product
# stays < 2^94); row hash r = (fnv1a64(key) * mult_r) % width. The
# engine wraps mod 2^64 and the twin reduces mod 2^62 — both equal
# the true product mod width because width | 2^62 | 2^64.
CMS_MULTS = (2654435761, 2246822519, 3266489917, 668265263)


def count_min_sketch(ds, key_col: str, *, width: int = 256,
                     mults: tuple = CMS_MULTS) -> np.ndarray:
    """Count-min sketch of a key column (Cormode–Muthukrishnan): the
    mergeable d×w counter matrix every streaming frequency monitor
    carries. Per-batch partials scatter into a local matrix and ship
    only NONZERO (cell, n) pairs; one tiny groupby folds them; the
    driver assembles the d×w matrix (point query = min over rows —
    always an overestimate, never under).

    width must be a power of two <= 2^62 (the mod-composition proof
    in CMS_MULTS' comment relies on it).
    """
    from ray.data.aggregate import Sum

    from spapy_ray.kernels.hashing import fnv1a64

    if width & (width - 1):
        raise ValueError("width must be a power of two")
    d = len(mults)

    def partial(t: pa.Table) -> pa.Table:
        keys = t.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        h = fnv1a64(keys)
        mat = np.zeros((d, width), dtype=np.int64)
        for r, m in enumerate(mults):
            c = ((h * np.uint64(m)) % np.uint64(width)) \
                .astype(np.int64)
            np.add.at(mat[r], c, 1)
        rr, cc = np.nonzero(mat)
        return pa.table({"cell": pa.array(rr * width + cc),
                         "n": pa.array(mat[rr, cc])})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("cell").aggregate(Sum("n", alias_name="n")) \
        .to_pandas()
    mat = np.zeros((d, width), dtype=np.int64)
    cell = agg["cell"].to_numpy().astype(np.int64)
    mat[cell // width, cell % width] = agg["n"].to_numpy()
    return mat


def cms_point_query(mat: np.ndarray, keys, *,
                    mults: tuple = CMS_MULTS) -> np.ndarray:
    """Point-frequency estimates (min over rows) for string keys."""
    from spapy_ray.kernels.hashing import fnv1a64

    width = mat.shape[1]
    keys = list(keys)
    if not keys:
        return np.array([], dtype=np.int64)
    h = fnv1a64(keys)
    est = np.full(len(h), np.iinfo(np.int64).max, dtype=np.int64)
    for r, m in enumerate(mults):
        c = ((h * np.uint64(m)) % np.uint64(width)).astype(np.int64)
        est = np.minimum(est, mat[r, c])
    return est


def grouped_hll_distinct(ds, key_col: str, hash_col: str, *,
                         p: int = 8, buckets: int | None = None):
    """Per-KEY HyperLogLog distinct estimates (the grouped form of
    hll_registers — dedup planning per corpus slice): each batch
    collapses to (key, reg, rho-max) partials (≤ keys·2^p rows leave
    a block), ONE bucketed shuffle co-locates each key's registers,
    and the bucket fold computes the exact big-integer harmonic
    estimate per key. ``hash_col`` must hold uint64/int64 values the
    caller already hashed (fnv of the dedup key); the avalanche mix
    on top is this module's _hll_mix, twin-replicable in HUGEINT.

    Returns Dataset(key, est_q) — the same no-alpha raw estimate
    convention as hll_registers.
    """
    m = 1 << p
    rb = 64 - p

    def partial(t: pa.Table) -> pa.Table:
        x = t.column(hash_col).to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            h = _hll_mix(x)
        reg = (h >> np.uint64(rb)).astype(np.int64)
        rest = h & ((np.uint64(1) << np.uint64(rb)) - np.uint64(1))
        rho = rb + 1 - _bit_length_u64(rest)
        df = pd.DataFrame({key_col: t.column(key_col).to_pandas(),
                           "reg": reg, "rho": rho})
        out = df.groupby([key_col, "reg"], sort=False)["rho"].max() \
            .reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, gg in g.groupby(key_col, sort=False):
            regs = np.zeros(m, dtype=np.int64)
            np.maximum.at(regs, gg["reg"].to_numpy(),
                          gg["rho"].to_numpy())
            denom = sum(1 << (rb + 1 - int(r)) for r in regs)
            rows.append((k, (m * m) * (1 << (rb + 1)) // denom))
        return pd.DataFrame(rows, columns=[key_col, "est_q"]) \
            .astype({"est_q": np.int64})

    return bucketed_group_agg(
        ds.select_columns([key_col, hash_col])
        .map_batches(partial, batch_format="pyarrow"),
        key_col, fold, buckets=buckets)


def exact_topk_rescore(ds, col: str, k: int, *, capacity: int = 256,
                       fan: int = 32, max_rounds: int = 4):
    """EXACT top-k frequent items for ANY distribution via the
    two-phase production pattern: a Misra-Gries sketch pass proposes
    candidates, a filtered combiner pass counts ONLY those candidates
    exactly, and the MG survival guarantee certifies the result —
    every non-candidate has true count <= n/(capacity+1), so if the
    k-th exact candidate count clears that bar, no non-candidate can
    displace it. When the certificate fails (near-uniform keys), the
    width quadruples and the sketch pass reruns — deterministic,
    terminates in O(log(distinct/capacity)) rounds.

    Rows shuffled per round: O(blocks x capacity) for the sketch +
    O(candidates x blocks) for the rescore — never one row per input
    row, never a full-distinct groupby.

    Returns pandas (col, n, rank) — rank 1..k by (n desc, col asc).
    """
    n_total = ds.count()
    cap = capacity
    for _ in range(max_rounds):
        cand = heavy_hitters(ds, col, capacity=cap, fan=fan) \
            .to_pandas()
        if len(cand) == 0 or col not in cand.columns:
            # near-uniform keys can wipe an undersized MG sketch
            # entirely (every decrement round hits every counter) —
            # the certificate trivially fails; widen and retry
            cap *= 4
            continue
        vs = pa.array(cand[col].to_numpy())

        def flt(t: pa.Table, _vs=vs) -> pa.Table:
            c = t.column(col)
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            return t.filter(pc.is_in(c, value_set=_vs))

        exact = pre_aggregated_count(
            ds.map_batches(flt, batch_format="pyarrow"), col,
            alias="n").to_pandas()
        if len(exact) == 0 or "n" not in exact.columns:
            cap *= 4
            continue
        exact["n"] = exact["n"].astype(np.int64)
        top = exact.sort_values(["n", col],
                                ascending=[False, True]).head(k)
        if len(top) >= min(k, len(exact)) and len(top) and \
                int(top["n"].min()) * (cap + 1) > n_total:
            top = top.reset_index(drop=True)
            top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
            return top
        cap *= 4
    raise RuntimeError(
        f"top-{k} certificate not met at capacity {cap // 4} "
        f"after {max_rounds} rounds")
