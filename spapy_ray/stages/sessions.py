"""Stream-shaped operators over the events log.

Ray Data has no event-time windows (ray_guide: treat the input as an
ordered, partitioned log); sessionization = groupby(user) + per-group
sort + gap detection with numpy. The SQL oracle uses lag() window
functions — both sides work on exact integer microseconds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def sessionize(ds, gap_us: int = 1800_000_000, user_col: str = "user_id",
               ts_col: str = "ts"):
    """Gap-based sessions: a new session starts when the time since
    the previous event of the same user exceeds ``gap_us``.

    Returns one row per session: (user_id, session_start_us,
    session_end_us, n_events). Partitioning contract: one group per
    user (hash shuffle on user_col); within-group order established by
    an explicit sort inside the group (driver order never matters).
    """

    import pyarrow as pa

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # one hash bucket = many users, handled in ONE vectorized pass:
        # sort by (user, ts); a session break is a gap > gap_us OR a
        # user change. One Python call per bucket instead of per user
        # (near-singleton map_groups anti-pattern, NOTES_r2).
        if len(g) == 0:
            return pd.DataFrame({"user_id": [], "session_start_us": [],
                                 "session_end_us": [], "n_events": []})
        col = g[ts_col]
        if np.issubdtype(col.dtype, np.datetime64):
            col = pd.to_datetime(col).astype("datetime64[us]")
        g = g.assign(_us=col.astype("int64")) \
            .sort_values([user_col, "_us"], kind="stable")
        ts = g["_us"].to_numpy()
        u = g[user_col].to_numpy()
        new = np.empty(len(ts), dtype=bool)
        new[0] = True
        new[1:] = (np.diff(ts) > gap_us) | (u[1:] != u[:-1])
        starts_idx = np.nonzero(new)[0]
        ends_idx = np.append(starts_idx[1:], len(ts))
        return pd.DataFrame({
            "user_id": u[starts_idx],
            "session_start_us": ts[starts_idx].astype(np.int64),
            "session_end_us": ts[ends_idx - 1].astype(np.int64),
            "n_events": (ends_idx - starts_idx).astype(np.int64),
        })

    from spapy_ray.stages.relational import _bucket_column
    from spapy_ray.util import cluster_cpus

    nbuckets = max(64, cluster_cpus() * 4)

    def tag_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("bkt__",
                               _bucket_column(t, user_col, nbuckets))

    return ds.map_batches(tag_bucket, batch_format="pyarrow") \
        .groupby("bkt__").map_groups(per_bucket, batch_format="pandas")


def sql_sessionize(gap_us: int = 1800_000_000) -> str:
    """DuckDB twin: lag() gap flags → running session ids → aggregate."""
    return (
        "WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events), "
        "flagged AS (SELECT user_id, us, "
        "CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us) "
        f"> {gap_us} OR lag(us) OVER (PARTITION BY user_id ORDER BY us) "
        "IS NULL THEN 1 ELSE 0 END AS new_session FROM e), "
        "sess AS (SELECT user_id, us, "
        "sum(new_session) OVER (PARTITION BY user_id ORDER BY us "
        "ROWS UNBOUNDED PRECEDING) AS sid FROM flagged) "
        "SELECT user_id, min(us)::BIGINT AS session_start_us, "
        "max(us)::BIGINT AS session_end_us, count(*)::BIGINT AS n_events "
        "FROM sess GROUP BY user_id, sid"
    )


def sliding_window_counts(ds, width_us: int = 1800_000_000,
                          slide_us: int = 900_000_000,
                          ts_col: str = "ts", key_col: str = "event_type"):
    """Sliding-window aggregate (streaming-window operator family):
    count + value sum per (window, key) for windows
    [w*slide, w*slide + width). Each event replicates into
    width/slide windows inside map_batches (flat-map shape), then one
    groupby folds — no per-event state, scales as a plain shuffle.

    Returns Dataset (window_start_us, <key_col>, n_events, sum_value).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Sum

    k = width_us // slide_us

    def assign(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column(ts_col), pa.int64()).to_numpy()
        w0 = us // slide_us
        parts = []
        for j in range(k):
            w = w0 - j
            keep = w >= 0
            idx = np.nonzero(keep)[0]
            tt = t.take(pa.array(idx))
            tt = tt.append_column(
                "window_start_us", pa.array(w[idx] * slide_us))
            parts.append(tt)
        return pa.concat_tables(parts)

    out = ds.map_batches(assign, batch_format="pyarrow")
    return out.groupby(["window_start_us", key_col]).aggregate(
        Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))


def asof_join(left_ds, right_ds, *, by: str = "user_id", on: str = "ts",
              left_cols: list[str] | None = None,
              right_cols: list[str] | None = None, suffix: str = "_r",
              direction: str = "backward"):
    """Per-key as-of join (custom operator family, SURVEY §2.11):
    each left row picks the LATEST right row with right.on <= left.on
    within the same ``by`` key — the classic event-attribution /
    point-in-time-lookup shape (DuckDB/kdb ASOF JOIN semantics,
    direction=backward).

    Distributed form: both sides projected onto one unified schema
    (right value columns suffixed, absent side null-filled), ONE
    groupby(by) co-partitions them, each group runs a sorted
    two-pointer merge (pandas merge_asof). Per-key state is bounded
    by that key's rows — the same contract as sessionize. Left rows
    with no prior right row keep nulls in the suffixed columns.
    """
    import pyarrow as pa

    def _arrow_types(ds):
        base = ds.schema().base_schema
        if isinstance(base, pa.Schema):
            return {n: base.field(n).type for n in base.names}
        # PandasBlockSchema: map numpy dtypes
        return {n: pa.from_numpy_dtype(t) if t != object else pa.string()
                for n, t in zip(base.names, base.types)}

    ltypes_all = _arrow_types(left_ds)
    rtypes_all = _arrow_types(right_ds)
    lcols = left_cols or [c for c in ltypes_all if c not in (by, on)]
    rcols = right_cols or [c for c in rtypes_all if c not in (by, on)]
    ltypes = {c: ltypes_all[c] for c in lcols}
    rtypes = {c: rtypes_all[c] for c in rcols}

    def tag_left(t: pa.Table) -> pa.Table:
        t = t.select([by, on] + lcols)
        for c in rcols:
            t = t.append_column(c + suffix, pa.nulls(len(t), type=rtypes[c]))
        return t.append_column("side__", pa.array(
            np.zeros(len(t), dtype=np.int8)))

    def tag_right(t: pa.Table) -> pa.Table:
        out = t.select([by, on])
        for c in lcols:
            out = out.append_column(c, pa.nulls(len(t), type=ltypes[c]))
        for c in rcols:
            out = out.append_column(c + suffix, t.column(c))
        return out.append_column("side__", pa.array(
            np.ones(len(t), dtype=np.int8)))

    both = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow"))
    if direction not in ("backward", "forward"):
        # "nearest" is excluded deliberately: its tie convention is
        # implementation-defined in pandas and has no exact SQL twin
        raise ValueError("direction must be backward|forward")
    return _asof_merge(both, by, on, lcols, rcols, ltypes_all, ltypes,
                       suffix, direction=direction)


def asof_join_split(ds, *, by: str, on: str, side_col: str,
                    left_value, right_value,
                    left_cols: list[str], right_cols: list[str],
                    suffix: str = "_r", direction: str = "backward"):
    """As-of join where BOTH sides live in one log, discriminated by
    ``side_col`` (the classic purchase←view attribution over a single
    events table). Reads the source ONCE: a single map_batches splits
    each batch into left/right unified-schema rows — `asof_join` on
    two filtered branches of the same input would execute the source
    read twice (Datasets share no DAG), a 2x source scan at corpus
    scale."""
    import pyarrow as pa
    import pyarrow.compute as pc

    base = ds.schema().base_schema
    types_all = {n: base.field(n).type for n in base.names}
    ltypes = {c: types_all[c] for c in left_cols}
    rtypes = {c: types_all[c] for c in right_cols}

    def tag_both(t: pa.Table) -> pa.Table:
        lt = t.filter(pc.equal(t.column(side_col), left_value))
        rt = t.filter(pc.equal(t.column(side_col), right_value))
        lout = lt.select([by, on] + left_cols)
        for c in right_cols:
            lout = lout.append_column(
                c + suffix, pa.nulls(len(lt), type=rtypes[c]))
        lout = lout.append_column("side__", pa.array(
            np.zeros(len(lt), dtype=np.int8)))
        rout = rt.select([by, on])
        for c in left_cols:
            rout = rout.append_column(c, pa.nulls(len(rt), type=ltypes[c]))
        for c in right_cols:
            rout = rout.append_column(c + suffix, rt.column(c))
        rout = rout.append_column("side__", pa.array(
            np.ones(len(rt), dtype=np.int8)))
        return pa.concat_tables([lout, rout])

    both = ds.map_batches(tag_both, batch_format="pyarrow")
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be backward|forward")
    return _asof_merge(both, by, on, left_cols, right_cols, types_all,
                       ltypes, suffix, direction=direction)


def _asof_merge(both, by: str, on: str, lcols: list[str],
                rcols: list[str], ltypes_all: dict, ltypes: dict,
                suffix: str, direction: str = "backward"):
    """Shared tail of the as-of joins: hash-bucket the key, run one
    vectorized merge_asof(by=...) per bucket, restore left dtypes."""
    import pyarrow as pa

    rnames = [c + suffix for c in rcols]

    def restore_left_dtypes(out: pd.DataFrame) -> pd.DataFrame:
        # The unified-schema union null-fills left columns on right-side
        # rows, so pandas upcasts int64 -> float64 in the group frame.
        # After filtering back to left rows those nulls are gone; restore
        # the original dtypes (right/suffixed columns may hold genuine
        # no-match nulls and are left as produced, matching SQL ASOF).
        for c, t in [(by, ltypes_all[by]), (on, ltypes_all[on])] + [
                (c, ltypes[c]) for c in lcols]:
            if (pa.types.is_integer(t) or pa.types.is_boolean(t)) \
                    and out[c].notna().all():
                out[c] = out[c].astype(t.to_pandas_dtype())
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # all keys of one hash bucket at once: merge_asof(by=...) runs
        # the per-key backward search vectorized over the whole bucket
        # — one Python call per ~thousands of keys instead of one per
        # key (the near-singleton map_groups anti-pattern, NOTES_r2)
        lf = g[g["side__"] == 0][[by, on] + lcols] \
            .sort_values(on, kind="stable")
        rt = g[g["side__"] == 1][[by, on] + rnames] \
            .sort_values(on, kind="stable")
        if len(lf) == 0:
            return lf.assign(**{c: pd.Series([], dtype="float64")
                                for c in rnames})
        if len(rt) == 0:
            out = lf.copy()
            for c in rnames:
                out[c] = np.nan
            return restore_left_dtypes(out)
        return restore_left_dtypes(
            pd.merge_asof(lf, rt, on=on, by=by, direction=direction))

    from spapy_ray.stages.relational import _bucket_column
    from spapy_ray.util import cluster_cpus

    nbuckets = max(64, cluster_cpus() * 4)

    def tag_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("bkt__",
                               _bucket_column(t, by, nbuckets))

    return both.map_batches(tag_bucket, batch_format="pyarrow") \
        .groupby("bkt__").map_groups(per_bucket, batch_format="pandas")


def funnel_counts(ds, steps: list[str], *, user_col: str = "user_id",
                  ts_col: str = "ts", type_col: str = "event_type",
                  buckets: int | None = None):
    """Sequential first-occurrence funnel (the product-analytics
    "view → click → purchase" op; nothing like it in the reference):
    a user reaches stage k when an event of type steps[k] occurs
    STRICTLY AFTER the user's stage-(k-1) completion time, where
    completion time is the earliest qualifying occurrence.

    Distributed shape: one projection filters the log to the funnel's
    event types (pre-shuffle narrowing), ONE hash(user) bucket shuffle
    colocates each user's events, and each bucket resolves all its
    users' stage times with per-step vectorized groupby-min passes
    (len(steps) passes, no per-user Python). The per-bucket output is
    len(steps) partial rows, so the final fold is trivially small.

    Returns Dataset(stage, step, n_users, lag_us): users reaching
    each stage and the summed microseconds from each user's stage-1
    time to their stage-k completion (0 at stage 1) — exact int64.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from spapy_ray.stages.relational import bucketed_group_agg

    idx_of = {s: k for k, s in enumerate(steps)}

    def project(t: pa.Table) -> pa.Table:
        et = t.column(type_col)
        mask = pc.is_in(et, value_set=pa.array(steps))
        t = t.filter(mask)
        et = t.column(type_col).to_pandas()
        step_idx = et.map(idx_of).to_numpy(dtype=np.int64)
        # normalize to MICROSECONDS regardless of source resolution
        # (parquet fixtures are timestamp[us]; from_pandas inputs ns)
        ts = t.column(ts_col).cast(pa.timestamp("us")) \
            .cast(pa.int64())
        return pa.table({"u": t.column(user_col).cast(pa.int64()),
                         "k": pa.array(step_idx),
                         "us": ts})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"stage": pd.Series([], dtype=np.int64),
                                 "n_users": pd.Series([], dtype=np.int64),
                                 "lag_us": pd.Series([], dtype=np.int64)})
        rows = []
        # per-user stage times, resolved step by step (vectorized
        # groupby-min per step; users sharing the bucket fold together)
        prev = None          # Series: user -> completion time so far
        t1 = None
        for k in range(len(steps)):
            sel = g[g["k"] == k]
            if prev is not None:
                lim = sel["u"].map(prev)
                sel = sel[lim.notna() & (sel["us"] > lim)]
            tk = sel.groupby("u")["us"].min()
            if k == 0:
                t1 = tk
                lag = np.int64(0)
            else:
                lag = (tk - t1.reindex(tk.index)).sum()
            rows.append((k + 1, len(tk), int(lag)))
            prev = tk
        return pd.DataFrame(rows, columns=["stage", "n_users",
                                           "lag_us"]) \
            .astype(np.int64)

    parts = bucketed_group_agg(
        ds.map_batches(project, batch_format="pyarrow"), "u",
        per_bucket, buckets=buckets)

    def fold(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby("stage", sort=True).agg(
            n_users=("n_users", "sum"),
            lag_us=("lag_us", "sum")).reset_index()
        df["step"] = [steps[s - 1] for s in df["stage"]]
        return pa.Table.from_pandas(
            df[["stage", "step", "n_users", "lag_us"]],
            preserve_index=False)

    # the partial table is len(steps) x buckets rows — a driver-free
    # single-block fold via repartition(1)
    return parts.repartition(1).map_batches(fold,
                                            batch_format="pyarrow",
                                            batch_size=None)


def retention_cohorts(ds, *, period_us: int = 86_400_000_000,
                      user_col: str = "user_id", ts_col: str = "ts",
                      buckets: int | None = None):
    """Cohort retention matrix (the product-analytics complement to
    funnel_counts): users are cohorted by the period of their FIRST
    event; each (cohort, offset) cell counts users active
    ``offset`` periods after their cohort period.

    Distributed shape: per-batch distinct (user, period) pairs
    (combiner — at most periods-per-user rows leave a block), ONE
    hash(user) bucket shuffle resolves each user's cohort and emits
    per-bucket (cohort, offset) partial counts, and a final small
    bucket fold sums the matrix (periods² cells).

    Returns Dataset(cohort_period, period_offset, n_users), int64.
    """
    import pyarrow as pa

    from spapy_ray.stages.relational import bucketed_group_agg

    def project(t: pa.Table) -> pa.Table:
        us = t.column(ts_col).cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        u = t.column(user_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        day = us // period_us
        df = pd.DataFrame({"u": u, "d": day}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def per_user_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["u", "d"])
        cohort = g.groupby("u")["d"].transform("min")
        out = pd.DataFrame({"cohort": cohort,
                            "off": g["d"] - cohort})
        return out.groupby(["cohort", "off"], sort=False).size() \
            .reset_index(name="n")

    parts = bucketed_group_agg(
        ds.map_batches(project, batch_format="pyarrow"), "u",
        per_user_bucket, buckets=buckets)

    def pack(t: pa.Table) -> pa.Table:
        c = t.column("cohort").to_numpy(zero_copy_only=False)
        o = t.column("off").to_numpy(zero_copy_only=False)
        return t.append_column(
            "ck", pa.array(c * 1_000_000 + o))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("ck", sort=False)["n"].sum() \
            .reset_index(name="n_users")
        return pd.DataFrame({
            "cohort_period": out["ck"] // 1_000_000,
            "period_offset": out["ck"] % 1_000_000,
            "n_users": out["n_users"].astype(np.int64)})

    return bucketed_group_agg(
        parts.map_batches(pack, batch_format="pyarrow"), "ck", fold,
        buckets=buckets)


def transition_counts(ds, *, user_col: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type", id_col: str = "event_id"):
    """Markov transition counts over the per-user event sequence:
    one row per (prev_type, next_type) ordered pair with its global
    count — the first-order behavioural transition matrix (path
    analysis; reference models this as sequential attribute iteration,
    SpaPy.py SpaDatasetVector attribute walk).

    Partitioning contract: ONE hash shuffle on user co-locates each
    user's full history; inside a bucket the sequence is rebuilt with
    a vectorized sort by (user, ts, id) and shifted ONCE — per-bucket
    counts are combiner partials (<= n_types^2 rows per bucket) and a
    tiny final groupby folds them. At 100 TB the exchange carries
    O(buckets x types^2) rows, not the event log.
    """
    import pyarrow as pa

    from ray.data.aggregate import Sum

    from spapy_ray.stages.relational import _bucket_column
    from spapy_ray.util import cluster_cpus

    nbuckets = max(64, cluster_cpus() * 4)

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bkt__", _bucket_column(t, user_col, nbuckets))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "prev_type": pd.Series([], dtype=object),
            "next_type": pd.Series([], dtype=object),
            "n": pd.Series([], dtype=np.int64)})
        if len(g) < 2:
            return empty
        col = g[ts_col]
        if np.issubdtype(col.dtype, np.datetime64):
            col = pd.to_datetime(col).astype("datetime64[us]")
        g = g.assign(_us=col.astype("int64")) \
            .sort_values([user_col, "_us", id_col], kind="stable")
        u = g[user_col].to_numpy()
        et = g[type_col].to_numpy()
        idx = np.nonzero(u[1:] == u[:-1])[0] + 1
        if len(idx) == 0:
            return empty
        out = pd.DataFrame({"prev_type": et[idx - 1],
                            "next_type": et[idx]}) \
            .groupby(["prev_type", "next_type"], sort=False) \
            .size().reset_index(name="n")
        out["n"] = out["n"].astype(np.int64)
        return out

    parts = ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("bkt__").map_groups(per_bucket, batch_format="pandas")
    return parts.groupby(["prev_type", "next_type"]).aggregate(
        Sum("n", alias_name="n"))


def ohlc_bars(ds, *, key_col: str = "event_type", ts_col: str = "ts",
              val_col: str = "value", id_col: str = "event_id",
              period_us: int = 3_600_000_000,
              buckets: int | None = None):
    """Time-series downsample to OHLC bars: per (key, period bucket)
    the open/high/low/close of ``val_col`` with deterministic
    open/close picks (min/max of (ts, id) — id breaks ts ties).
    Open/close are EXACT element picks and high/low are exact
    extrema, so float values hash-match the SQL row_number twin.

    Per-batch partials carry one row per (key, bar) seen — each holds
    the block's own (o_ts, o_id, open, c_ts, c_id, close, hi, lo, n)
    — and ONE bucketed shuffle folds them with lexicographic
    min/max merges: the classic mergeable-summary shape, so the
    exchange is O(bars x blocks), never the event stream."""
    from spapy_ray.stages.relational import bucketed_group_agg

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": t.column(key_col).to_pandas(),
            "ts": t.column(ts_col).to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64),
            "id": t.column(id_col).to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "v": t.column(val_col).to_numpy(zero_copy_only=False)
            .astype(np.float64)})
        df["bar"] = df["ts"] // period_us
        df = df.sort_values(["k", "bar", "ts", "id"], kind="mergesort")
        g = df.groupby(["k", "bar"], sort=False)
        out = g.agg(o_ts=("ts", "first"), o_id=("id", "first"),
                    open=("v", "first"), c_ts=("ts", "last"),
                    c_id=("id", "last"), close=("v", "last"),
                    high=("v", "max"), low=("v", "min"),
                    n=("v", "size")).reset_index()
        out["gk"] = out["k"].astype(str) + "|" + out["bar"].astype(str)
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for gk, gg in g.groupby("gk", sort=False):
            oi = np.lexsort((gg["o_id"].to_numpy(),
                             gg["o_ts"].to_numpy()))[0]
            ci = np.lexsort((-gg["c_id"].to_numpy(),
                             -gg["c_ts"].to_numpy()))[0]
            rows.append((gg["k"].iloc[0], int(gg["bar"].iloc[0]),
                         gg["open"].iloc[oi], gg["high"].max(),
                         gg["low"].min(), gg["close"].iloc[ci],
                         int(gg["n"].sum())))
        return pd.DataFrame(rows, columns=[
            "k", "bar", "open", "high", "low", "close", "n"]) \
            .astype({"bar": np.int64, "n": np.int64})

    return bucketed_group_agg(
        ds.map_batches(partial, batch_format="pyarrow"), "gk", fold,
        buckets=buckets)


def rolling_active_users(ds, *, user_col: str = "user_id",
                         ts_col: str = "ts", window_days: int = 7,
                         buckets: int | None = None):
    """Rolling distinct active users: for each day d, the count of
    users active at least once in the trailing ``window_days`` window
    ending at d. Exact distributed distinct via set-membership
    expansion: one bucketed (user, day) dedup, a x window_days
    flat expansion to (window_end, user), a second bucketed dedup,
    then tiny per-window count folds — exchange is
    O(window_days x active-user-days), never the event stream.
    Windows past the last observed day are dropped (both sides).
    Returns Dataset(day, n_users)."""
    from spapy_ray.stages.relational import bucketed_group_agg

    DAY = 86_400_000_000

    def ud_partial(t: pa.Table) -> pa.Table:
        u = t.column(user_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d = (t.column(ts_col).to_numpy(zero_copy_only=False)
             .astype("datetime64[us]").astype(np.int64)) // DAY
        df = pd.DataFrame({"u": u, "d": d}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def ud_fold(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates()

    ud = bucketed_group_agg(
        ds.select_columns([user_col, ts_col]).map_batches(
            ud_partial, batch_format="pyarrow"), "u", ud_fold,
        buckets=buckets).materialize()
    max_day = int(pa.concat_tables(
        [b for b in ud.select_columns(["d"])
         .iter_batches(batch_format="pyarrow", batch_size=None)],
        promote_options="default").column("d").to_numpy().max())

    def expand(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        d = t.column("d").to_numpy(zero_copy_only=False)
        w = (d[:, None] + np.arange(window_days)[None, :]).ravel()
        uu = np.repeat(u, window_days)
        keep = w <= max_day
        df = pd.DataFrame({"u": uu[keep], "w": w[keep]}) \
            .drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def count_fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g.drop_duplicates().groupby("w", sort=False).size() \
            .reset_index(name="c")
        s["c"] = s["c"].astype(np.int64)
        return s

    parts = bucketed_group_agg(
        ud.map_batches(expand, batch_format="pyarrow"), "u",
        count_fold, buckets=buckets)

    from ray.data.aggregate import Sum

    return parts.groupby("w").aggregate(Sum("c", alias_name="n_users"))


def interval_attach(points, intervals, *, key: str = "user_id",
                    ts_col: str = "ts_us", lo_col: str = "lo",
                    hi_col: str = "hi", buckets: int | None = None):
    """Two-sided keyed interval join (both sides Datasets): attach to
    each point the containing interval of the SAME key, for interval
    sets that are NON-OVERLAPPING per key (sessions, windows, SCD
    validity ranges — the common case; overlapping sets need the
    broadcast relational.interval_join instead).

    ONE hash shuffle on the key co-locates both sides (side-tagged
    union with typed null-filled schemas); inside a bucket a single
    pandas merge_asof(by=key, direction='backward') finds the last
    interval starting at-or-before each point and the containment
    filter ts <= hi keeps true hits — O(n log n) Cython per bucket,
    one Python call per bucket, never per key. All ts columns are
    int64 microseconds. Returns points' columns + (lo, hi), inner.
    """
    from spapy_ray.stages.relational import _bucket_column
    from spapy_ray.util import cluster_cpus

    nbuckets = buckets or max(64, cluster_cpus() * 4)
    pcols = [c for c in points.schema().names]
    icols = [c for c in intervals.schema().names]

    def tag(side, other_fill):
        def _f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {c: t.column(c) for c in t.column_names}
            for c, typ in other_fill:
                cols[c] = pa.nulls(n, type=typ)
            cols["side__"] = pa.array(
                np.full(n, side, dtype=np.int8))
            out = pa.table(cols)
            return out.append_column(
                "bkt__", _bucket_column(out, key, nbuckets))
        return _f

    ifill = [(c, pa.int64()) for c in (lo_col, hi_col)]
    pfill = [(c, pa.int64()) for c in pcols if c not in (key,)]
    u = points.map_batches(tag(0, ifill), batch_format="pyarrow") \
        .union(intervals.map_batches(tag(1, pfill),
                                     batch_format="pyarrow"))

    out_cols = pcols + [lo_col, hi_col]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["side__"] == 0]
        iv = g[g["side__"] == 1]
        empty = pd.DataFrame({c: pd.Series([], dtype=np.int64)
                              for c in out_cols})
        if not len(p) or not len(iv):
            return empty
        p = p[pcols].copy()
        for c in pcols:
            if c != key:
                p[c] = p[c].astype(np.int64)
        iv = iv[[key, lo_col, hi_col]].copy()
        iv[lo_col] = iv[lo_col].astype(np.int64)
        iv[hi_col] = iv[hi_col].astype(np.int64)
        p = p.sort_values(ts_col, kind="mergesort")
        iv = iv.sort_values(lo_col, kind="mergesort")
        m = pd.merge_asof(p, iv, left_on=ts_col, right_on=lo_col,
                          by=key, direction="backward")
        m = m[m[hi_col].notna()]
        m = m[m[ts_col] <= m[hi_col].astype(np.int64)]
        m[lo_col] = m[lo_col].astype(np.int64)
        m[hi_col] = m[hi_col].astype(np.int64)
        return m[out_cols]

    return u.groupby("bkt__").map_groups(per_bucket,
                                         batch_format="pandas")


def with_next_ts(ds, *, user_col: str = "user_id", ts_col: str = "ts",
                 id_col: str = "event_id",
                 val_col: str | None = "value",
                 buckets: int | None = None):
    """Attach each event's successor timestamp within its user
    sequence (lead(ts) over (user ORDER BY ts, id)) — the primitive
    under time-weighted averages, inter-arrival histograms and dwell
    times. ONE user shuffle; per-bucket one vectorized sort + shift
    (never per user). Last event of a user gets next_us = -1.
    Returns Dataset(user, ts_us, next_us[, value])."""
    from spapy_ray.stages.relational import _bucket_column
    from spapy_ray.util import cluster_cpus

    nbuckets = buckets or max(64, cluster_cpus() * 4)

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bkt__", _bucket_column(t, user_col, nbuckets))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {user_col: pd.Series([], dtype=np.int64),
                "ts_us": pd.Series([], dtype=np.int64),
                "next_us": pd.Series([], dtype=np.int64)}
        if val_col:
            cols[val_col] = pd.Series([], dtype=np.float64)
        if not len(g):
            return pd.DataFrame(cols)
        col = g[ts_col]
        if np.issubdtype(col.dtype, np.datetime64):
            col = pd.to_datetime(col).astype("datetime64[us]")
        g = g.assign(_us=col.astype("int64")) \
            .sort_values([user_col, "_us", id_col], kind="stable")
        u = g[user_col].to_numpy()
        ts = g["_us"].to_numpy()
        nxt = np.r_[ts[1:], -1]
        nxt[np.r_[u[1:] != u[:-1], True]] = -1
        out = {user_col: u, "ts_us": ts.astype(np.int64),
               "next_us": nxt.astype(np.int64)}
        if val_col:
            out[val_col] = g[val_col].to_numpy(dtype=np.float64)
        return pd.DataFrame(out)

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("bkt__").map_groups(per_bucket,
                                     batch_format="pandas")


def user_paths(ds, *, user_col: str = "user_id", ts_col: str = "ts",
               type_col: str = "event_type", id_col: str = "event_id",
               k_steps: int = 8, sep: str = ">",
               buckets: int | None = None):
    """Path / journey extraction: each user's first ``k_steps`` event
    types in (ts, id) order joined into one signature string. ONE
    user shuffle; inside a bucket the prefix matrix is built with a
    cumcount mask and the join is ``k_steps`` vectorized np.char.add
    passes — no per-user Python join. Returns
    Dataset(user, path, n_steps)."""
    from spapy_ray.stages.relational import _bucket_column
    from spapy_ray.util import cluster_cpus

    nbuckets = buckets or max(64, cluster_cpus() * 4)

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bkt__", _bucket_column(t, user_col, nbuckets))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({
                user_col: pd.Series([], dtype=np.int64),
                "path": pd.Series([], dtype=object),
                "n_steps": pd.Series([], dtype=np.int64)})
        col = g[ts_col]
        if np.issubdtype(col.dtype, np.datetime64):
            col = pd.to_datetime(col).astype("datetime64[us]")
        g = g.assign(_us=col.astype("int64")) \
            .sort_values([user_col, "_us", id_col], kind="stable")
        step = g.groupby(user_col, sort=False).cumcount().to_numpy()
        m = step < k_steps
        u = g[user_col].to_numpy()[m]
        et = g[type_col].to_numpy()[m].astype(str)
        st = step[m]
        uu, inv = np.unique(u, return_inverse=True)
        width = int(et.dtype.itemsize // 4) if et.dtype.kind == "U" \
            else 16
        mat = np.full((len(uu), k_steps), "",
                      dtype=f"<U{max(width, 1)}")
        mat[inv, st] = et
        path = mat[:, 0]
        for j in range(1, k_steps):
            has = mat[:, j] != ""
            path = np.where(has,
                            np.char.add(np.char.add(path, sep),
                                        mat[:, j]),
                            path)
        n_steps = (mat != "").sum(axis=1).astype(np.int64)
        return pd.DataFrame({user_col: uu,
                             "path": path.astype(object),
                             "n_steps": n_steps})

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("bkt__").map_groups(per_bucket,
                                     batch_format="pandas")


def interp_attach(ds, *, by: str = "user_id", on: str = "ts",
                  side_col: str = "event_type",
                  left_value="view", right_value="purchase",
                  id_col: str = "event_id", value_col: str = "value"):
    """Linear interpolation attach: for every LEFT row, bracket it
    with the nearest RIGHT rows on both sides (two-sided as-of) and
    linearly interpolate the right value at the left timestamp —
    the gap-filling / sensor-alignment primitive. Exact integer
    convention: value in cents (round(v*100)), time in microseconds,

        interp_c = (c0·(t1-t) + c1·(t-t0)) // (t1-t0)

    (floor of a non-negative rational == DuckDB //); -1 when either
    bracket is missing; c0 when the brackets coincide.

    ONE source scan (side-tagged unified-schema union) and ONE hash
    bucket shuffle; both merge_asof directions run inside the same
    per-bucket pandas pass, so the corpus is never read or shuffled
    twice (contrast: composing two asof_join_split calls would scan
    the source twice and shuffle twice)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def tag_both(t: pa.Table) -> pa.Table:
        lt = t.filter(pc.equal(t.column(side_col), left_value))
        rt = t.filter(pc.equal(t.column(side_col), right_value))
        cents = np.rint(rt.column(value_col)
                        .to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        lout = pa.table({
            by: lt.column(by), on: lt.column(on),
            "id__": lt.column(id_col),
            "c__": pa.nulls(len(lt), type=pa.int64()),
            "side__": pa.array(np.zeros(len(lt), dtype=np.int8))})
        rout = pa.table({
            by: rt.column(by), on: rt.column(on),
            "id__": pa.nulls(len(rt), type=pa.int64()),
            "c__": pa.array(cents),
            "side__": pa.array(np.ones(len(rt), dtype=np.int8))})
        return pa.concat_tables([lout, rout])

    from spapy_ray.stages.relational import _bucket_column
    from spapy_ray.util import cluster_cpus

    nbuckets = max(64, cluster_cpus() * 4)

    def tag_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("bkt__",
                               _bucket_column(t, by, nbuckets))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g["side__"] == 0][[by, on, "id__"]] \
            .sort_values(on, kind="stable")
        rt = g[g["side__"] == 1][[by, on, "c__"]] \
            .sort_values(on, kind="stable")
        empty = pd.DataFrame({
            by: pd.Series([], dtype=np.int64),
            "view_event_id": pd.Series([], dtype=np.int64),
            "interp_c": pd.Series([], dtype=np.int64)})
        if len(lf) == 0:
            return empty
        t_us = lf[on].to_numpy().astype("datetime64[us]") \
            .view(np.int64)
        if len(rt) == 0:
            return pd.DataFrame({
                by: lf[by].to_numpy().astype(np.int64),
                "view_event_id": lf["id__"].to_numpy()
                .astype(np.int64),
                "interp_c": np.full(len(lf), -1, dtype=np.int64)})
        rb = rt.rename(columns={"c__": "c0"})
        rb["t0"] = rb[on].to_numpy()
        b = pd.merge_asof(lf, rb, on=on, by=by, direction="backward")
        rf = rt.rename(columns={"c__": "c1"})
        rf["t1"] = rf[on].to_numpy()
        f = pd.merge_asof(lf, rf, on=on, by=by, direction="forward")
        ok = b["t0"].notna().to_numpy() & f["t1"].notna().to_numpy()
        out = np.full(len(lf), -1, dtype=np.int64)
        if ok.any():
            t0 = b["t0"].to_numpy()[ok].astype("datetime64[us]") \
                .view(np.int64)
            t1 = f["t1"].to_numpy()[ok].astype("datetime64[us]") \
                .view(np.int64)
            c0 = b["c0"].to_numpy()[ok].astype(np.int64)
            c1 = f["c1"].to_numpy()[ok].astype(np.int64)
            t = t_us[ok]
            dt = t1 - t0
            num = c0 * (t1 - t) + c1 * (t - t0)
            out[ok] = np.where(dt == 0, c0,
                               num // np.maximum(dt, 1))
        return pd.DataFrame({
            by: lf[by].to_numpy().astype(np.int64),
            "view_event_id": lf["id__"].to_numpy().astype(np.int64),
            "interp_c": out})

    return ds.map_batches(tag_both, batch_format="pyarrow") \
        .map_batches(tag_bucket, batch_format="pyarrow") \
        .groupby("bkt__").map_groups(per_bucket,
                                     batch_format="pandas")


def late_event_counts(ds, *, id_col: str = "event_id",
                      ts_col: str = "ts",
                      allowed_us: int = 300_000_000,
                      bucket_us: int = 3_600_000_000,
                      window: int = 4096):
    """Watermark / late-data accounting (the streaming-ingestion
    audit): process events in ARRIVAL order (``id_col``), keep the
    running maximum event time seen so far (the watermark), and
    count per event-time bucket how many events arrived more than
    ``allowed_us`` behind it — exactly what a streaming engine's
    allowed-lateness policy would have dropped.

    The global ordered cummax distributes like the ordered prefix
    sum (packing.pack_chunks): per-id-window max partials fold to
    the driver (O(#windows)), an exclusive prefix max broadcasts
    back, and each window resolves its local running max
    independently. Returns Dataset(bucket, n_events, n_late)."""
    import ray
    from ray.data.aggregate import Max, Sum

    def tag(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        us = t.column(ts_col).to_numpy().astype("datetime64[us]") \
            .view(np.int64)
        return pa.table({"id": pa.array(ids), "us": pa.array(us),
                         "w": pa.array(ids // window)})

    u = ds.map_batches(tag, batch_format="pyarrow").materialize()
    tot = u.groupby("w").aggregate(Max("us", alias_name="m")) \
        .to_pandas().sort_values("w")
    ws = tot["w"].to_numpy(dtype=np.int64)
    ms = tot["m"].to_numpy(dtype=np.int64)
    # exclusive prefix max over windows in id order
    # sentinel -2^62 (not int64 min: wm - us must not underflow)
    pre = np.r_[-(1 << 62), np.maximum.accumulate(ms)[:-1]]
    offs = {int(w): int(p) for w, p in zip(ws, pre)}
    ref = ray.put(offs)

    def per_window(g: pd.DataFrame, _ref=ref) -> pd.DataFrame:
        offs_ = ray.get(_ref)
        out = []
        for w, gg in g.groupby("w", sort=False):
            order = np.argsort(gg["id"].to_numpy(), kind="stable")
            us = gg["us"].to_numpy()[order]
            run = np.maximum.accumulate(us)
            wm = np.r_[-(1 << 62), run[:-1]]
            wm = np.maximum(wm, int(offs_[int(w)]))
            late = (wm - us) > allowed_us
            b = us // bucket_us
            df = pd.DataFrame({"bucket": b,
                               "late": late.astype(np.int64)})
            p = df.groupby("bucket", sort=False).agg(
                n_events=("late", "size"),
                n_late=("late", "sum")).reset_index()
            out.append(p)
        return pd.concat(out, ignore_index=True).astype(np.int64)

    parts = bucketed_group_agg_sessions(u, "w", per_window)
    out = parts.groupby("bucket").aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("n_late", alias_name="n_late"))

    def typed(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return pa.table({c: _pc.cast(t.column(c), pa.int64())
                         for c in t.column_names})

    return out.map_batches(typed, batch_format="pyarrow")


def bucketed_group_agg_sessions(ds, key, fold, buckets=None):
    """Thin alias to relational.bucketed_group_agg (import cycle
    guard)."""
    from spapy_ray.stages.relational import bucketed_group_agg

    return bucketed_group_agg(ds, key, fold, buckets=buckets)


def interval_concurrency(ds, *, open_col: str = "t_open",
                         close_col: str = "t_close",
                         window_us: int = 7 * 86_400_000_000):
    """Interval-concurrency curve (the backlog / occupancy metric):
    each row holds an inclusive [open, close] microsecond interval;
    the result is, per calendar month, the MAXIMUM number of
    simultaneously-open intervals measured at change points (every
    open/close instant — between change points the count is
    constant, so this is the true maximum over each month that
    contains at least one change point).

    Distributed shape — the ordered-global-prefix-sum pattern
    (packing.pack_chunks / late_event_counts) on TIME windows:
    endpoint deltas (+1 at open, -1 at close + 1 us tick... close
    boundary: the decrement lands at close + 1 day for date-grain
    closes, supplied by the caller via close_col) fold to per-window
    sums, the driver broadcasts the exclusive prefix, and each
    window resolves its local running count independently. One
    shuffle, O(#windows) driver state.

    Returns pandas (ym, max_open) where ym = (year-1970)*12 +
    month-1 (months since epoch — calendar-exact, pure integer).
    """
    import ray
    from ray.data.aggregate import Sum

    def endpoints(t: pa.Table) -> pa.Table:
        to = t.column(open_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        tc = t.column(close_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ts = np.concatenate([to, tc])
        d = np.concatenate([np.ones(len(to), dtype=np.int64),
                            -np.ones(len(tc), dtype=np.int64)])
        return pa.table({"t": pa.array(ts), "d": pa.array(d),
                         "w": pa.array(ts // window_us)})

    u = ds.map_batches(endpoints, batch_format="pyarrow") \
        .materialize()

    # per-window sums: per-batch combiner partials + driver fold
    # (the window table is tiny — a ray groupby sort here costs more
    # than the whole stage; measured 5.5 s -> ~2 s at sf0.1)
    def wsum(t: pa.Table) -> pa.Table:
        w = t.column("w").to_numpy(zero_copy_only=False)
        d = t.column("d").to_numpy(zero_copy_only=False)
        uw, inv = np.unique(w, return_inverse=True)
        s = np.zeros(len(uw), dtype=np.int64)
        np.add.at(s, inv, d)
        return pa.table({"w": pa.array(uw), "s": pa.array(s)})

    got = [b for b in u.map_batches(wsum, batch_format="pyarrow")
           .iter_batches(batch_format="pyarrow")]
    tp = pa.concat_tables(got, promote_options="default")
    wv = tp.column("w").to_numpy(zero_copy_only=False)
    sv = tp.column("s").to_numpy(zero_copy_only=False)
    ws = np.unique(wv)
    ss = np.zeros(len(ws), dtype=np.int64)
    np.add.at(ss, np.searchsorted(ws, wv), sv)
    pre = np.r_[0, np.cumsum(ss)[:-1]]
    offs = {int(w): int(p) for w, p in zip(ws, pre)}
    ref = ray.put(offs)

    def per_window(g: pd.DataFrame, _ref=ref) -> pd.DataFrame:
        offs_ = ray.get(_ref)
        out = []
        for w, gg in g.groupby("w", sort=False):
            t = gg["t"].to_numpy()
            d = gg["d"].to_numpy()
            # net delta per distinct instant: the count is evaluated
            # AFTER all deltas at that instant apply
            ut, inv = np.unique(t, return_inverse=True)
            nd = np.zeros(len(ut), dtype=np.int64)
            np.add.at(nd, inv, d)
            run = np.cumsum(nd) + int(offs_[int(w)])
            ym = ut.astype("datetime64[us]").astype("datetime64[M]") \
                .view(np.int64)
            p = pd.DataFrame({"ym": ym, "open": run}) \
                .groupby("ym", sort=False)["open"].max() \
                .reset_index(name="max_open")
            out.append(p)
        return pd.concat(out, ignore_index=True).astype(np.int64)

    parts = bucketed_group_agg_sessions(u, "w", per_window) \
        .to_pandas()
    # final (ym, max) fold on the driver — parts is O(#windows)
    out = parts.groupby("ym", as_index=False)["max_open"].max()
    return out.sort_values("ym").reset_index(drop=True) \
        .astype(np.int64)


def grouped_cusum(ds, *, key_col: str, id_col: str, x_col: str,
                  threshold: int, window: int = 4096,
                  buckets: int | None = None):
    """Per-key CUSUM changepoint scan in arrival (``id_col``) order:
    S_t = max(0, S_{t-1} + x_t) — the classic drift alarm. The
    sequential recursion distributes because S_t = P_t - min(0,
    min_{j<=t} P_j) with P the plain prefix sum: prefix sums AND
    prefix minima are both associative scans, so the ordered-global-
    prefix pattern (pack_chunks / late_event_counts) applies — per
    (key, id-window) partials (window sum, window min-prefix) fold on
    the driver into per-window incoming (sum, min) pairs, broadcast
    back, and each window resolves its alarms locally. One shuffle,
    two passes over the materialized tagged table.

    Returns pandas (key, n_alarms, max_s) — alarms are rows with
    S_t > threshold; everything int64-exact."""
    import ray
    from ray.data.aggregate import Max, Sum

    def tag(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "k": t.column(key_col),
            "i": pa.array(ids),
            "x": pa.array(t.column(x_col)
                          .to_numpy(zero_copy_only=False)
                          .astype(np.int64)),
            "w": pa.array(ids // window)})

    u = ds.map_batches(tag, batch_format="pyarrow").materialize()

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (k, w), gg in g.groupby(["k", "w"], sort=False):
            x = gg["x"].to_numpy()[np.argsort(gg["i"].to_numpy(),
                                              kind="stable")]
            pf = np.cumsum(x)
            out.append((k, w, int(pf[-1]), int(pf.min())))
        return pd.DataFrame(out, columns=["k", "w", "s", "m"])

    def kw_key(t: pa.Table) -> pa.Table:
        return t.append_column(
            "kw", pa.array(
                t.column("w").to_numpy(zero_copy_only=False)))

    parts = bucketed_group_agg_sessions(
        u.map_batches(kw_key, batch_format="pyarrow"), "kw",
        partial).to_pandas().sort_values(["k", "w"])

    # per key, fold window partials in window order:
    # incoming_sum and incoming_min (min over all prior prefixes & 0)
    offs = {}
    for k, gg in parts.groupby("k", sort=False):
        inc_s, inc_m = 0, 0
        for w, s, m in zip(gg["w"], gg["s"], gg["m"]):
            offs[(str(k), int(w))] = (inc_s, inc_m)
            inc_m = min(inc_m, inc_s + int(m))
            inc_s += int(s)
    ref = ray.put(offs)

    def resolve(g: pd.DataFrame, _ref=ref) -> pd.DataFrame:
        offs_ = ray.get(_ref)
        out = []
        for (k, w), gg in g.groupby(["k", "w"], sort=False):
            x = gg["x"].to_numpy()[np.argsort(gg["i"].to_numpy(),
                                              kind="stable")]
            inc_s, inc_m = offs_[(str(k), int(w))]
            pf = np.cumsum(x) + inc_s
            mn = np.minimum(np.minimum.accumulate(pf), inc_m)
            s_t = pf - mn
            out.append((k, int((s_t > threshold).sum()),
                        int(s_t.max())))
        return pd.DataFrame(out, columns=["k", "n_alarms", "max_s"])

    res = bucketed_group_agg_sessions(
        u.map_batches(kw_key, batch_format="pyarrow"), "kw",
        resolve).groupby("k").aggregate(
            Sum("n_alarms", alias_name="n_alarms"),
            Max("max_s", alias_name="max_s")).to_pandas()
    res["n_alarms"] = res["n_alarms"].astype(np.int64)
    res["max_s"] = res["max_s"].astype(np.int64)
    return res.sort_values("k").reset_index(drop=True)


def interval_overlap_pairs(ds, start_col: str, end_col: str, *,
                           window: int = 3600_000_000,
                           buckets: int | None = None):
    """Count unordered pairs of CLOSED intervals [start, end] that
    overlap (start_a <= end_b AND start_b <= end_a) — the interval
    self-join cardinality, without materializing a single pair.

    Identity: a disjoint ordered pair is exactly one with
    start_j > end_i (closed intervals make the double-count case
    impossible), so with S = sum over ends of #{starts <= end}:

        pairs = S - n*(n+1)//2

    Distribution is the two_sample_ks shape: starts (side 0) and
    ends (side 1) ride ONE side-tagged union co-partitioned by value
    window; phase 1 folds per-window start counts (tiny) into driver
    prefix offsets; phase 2 computes each window's local
    searchsorted rank sum FINAL — the exchange carries window
    summaries, never pairs. Exact int64 throughout.

    Returns a one-row pandas DataFrame (n_intervals, overlap_pairs).
    """
    import ray

    from ray.data.aggregate import Sum

    from spapy_ray.stages.relational import bucketed_group_agg

    def tag(t: pa.Table) -> pa.Table:
        s = t.column(start_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        e = t.column(end_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        v = np.concatenate([s, e])
        side = np.concatenate([np.zeros(len(s), dtype=np.int8),
                               np.ones(len(e), dtype=np.int8)])
        return pa.table({"v": pa.array(v), "w": pa.array(v // window),
                         "s": pa.array(side)})

    u = ds.map_batches(tag, batch_format="pyarrow").materialize()

    def totals(t: pa.Table) -> pa.Table:
        w = t.column("w").to_numpy(zero_copy_only=False)
        sd = t.column("s").to_numpy(zero_copy_only=False)
        ws = w[sd == 0]
        uw, cnt = np.unique(ws, return_counts=True)
        return pa.table({"w": pa.array(uw),
                         "c": pa.array(cnt.astype(np.int64))})

    tot = u.map_batches(totals, batch_format="pyarrow") \
        .groupby("w").aggregate(Sum("c", alias_name="c")).to_pandas()
    if len(tot) == 0:
        return pd.DataFrame({"n_intervals": [np.int64(0)],
                             "overlap_pairs": [np.int64(0)]})
    tot = tot.sort_values("w")
    wk = tot["w"].to_numpy().astype(np.int64)
    wc = tot["c"].to_numpy().astype(np.int64)
    n = int(wc.sum())
    # offset for ANY window w = starts in all windows < w (an
    # end-only window still sees every earlier start)
    cum = np.r_[0, np.cumsum(wc)]
    ref = ray.put((wk, cum))

    def rank_sum(g: pd.DataFrame, _ref=ref) -> pd.DataFrame:
        wk_, cum_ = ray.get(_ref)
        if not len(g):
            return pd.DataFrame({"rs": pd.Series([], dtype=np.int64)})
        total = 0
        for w, gw in g.groupby("w", sort=False):
            v = gw["v"].to_numpy()
            sd = gw["s"].to_numpy()
            starts = np.sort(v[sd == 0])
            ends = v[sd == 1]
            if len(ends) == 0:
                continue
            local = int(np.searchsorted(starts, ends,
                                        side="right").sum())
            off = int(cum_[np.searchsorted(wk_, int(w), side="left")])
            total += local + off * len(ends)
        return pd.DataFrame({"rs": [np.int64(total)]})

    parts = bucketed_group_agg(u, "w", rank_sum,
                               buckets=buckets).to_pandas()
    s_sum = int(parts["rs"].sum()) if len(parts) else 0
    return pd.DataFrame({
        "n_intervals": [np.int64(n)],
        "overlap_pairs": [np.int64(s_sum - n * (n + 1) // 2)]})
