"""Relational query pipelines (split from queries.py; registry order lives in
pipelines/queries.py)."""

from spapy_ray.pipelines.qcommon import *  # noqa: F401,F403


def q_top_zones(sf_dir: str, k: int = 20):
    from spapy_ray.pipelines.q_spatial import q_zone_page_counts
    counts = q_zone_page_counts(sf_dir)
    # two-key top-k: sort (count desc, zone_id asc), limit k
    return counts.sort(["n_pages", "zone_id"], descending=[True, False]).limit(k)


def q_lineitem_pricing(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity",
                        "l_extendedprice", "l_discount"])

    def disc(t: pa.Table) -> pa.Table:
        return t.append_column(
            "disc_price", pc.multiply(t.column("l_extendedprice"),
                                      pc.subtract(pa.scalar(1.0), t.column("l_discount"))))

    from spapy_ray.stages.relational import pre_aggregated_sums

    out = pre_aggregated_sums(
        ds.map_batches(disc, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        ["l_quantity", "l_extendedprice", "disc_price"],
        count_alias="count_order").to_pandas()
    out = out.rename(columns={"l_quantity": "sum_qty",
                              "l_extendedprice": "sum_base_price",
                              "disc_price": "sum_disc_price"})
    out["sum_base_price"] = out["sum_base_price"].round(2)
    out["sum_disc_price"] = out["sum_disc_price"].round(2)
    return out[["l_returnflag", "l_linestatus", "sum_qty",
                "sum_base_price", "sum_disc_price", "count_order"]]


def q_events_by_type(sf_dir: str):
    from spapy_ray.stages.relational import pre_aggregated_sums

    out = pre_aggregated_sums(
        _read(sf_dir, "events", columns=["event_type", "value"]),
        ["event_type"], ["value"], count_alias="n_events").to_pandas()
    out = out.rename(columns={"value": "sum_value"})
    out["sum_value"] = out["sum_value"].round(2)
    return out[["event_type", "n_events", "sum_value"]]


def q_events_hourly(sf_dir: str):
    """Temporal bucket aggregate over the events table (integer hour
    buckets keep both sides exact)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def bucket(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64())
        hour = pc.divide(us, 3600000000)
        return t.append_column("hour", hour)

    out = ds.map_batches(bucket, batch_format="pyarrow") \
        .groupby(["user_id", "hour"]).aggregate(
            Count(alias_name="n_events"), Sum("value", alias_name="sum_value")) \
        .to_pandas()
    out["sum_value"] = out["sum_value"].round(2)
    return out[["user_id", "hour", "n_events", "sum_value"]]


def q_events_sessions(sf_dir: str):
    """Gap-based sessionization of the events log (30-min gap)."""
    from spapy_ray.stages.sessions import sessionize

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    return sessionize(ds).select_columns(
        ["user_id", "session_start_us", "session_end_us", "n_events"])


def q_events_sliding(sf_dir: str):
    """Sliding-window aggregate: 30-min windows every 15 min, counts
    and value sums per (window, event_type). Flat-map window
    assignment + one groupby — the streaming-window operator family
    in shuffle form."""
    from spapy_ray.stages.sessions import sliding_window_counts

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])
    out = sliding_window_counts(ds).to_pandas()
    out["sum_value"] = out["sum_value"].round(2)
    return out[["window_start_us", "event_type", "n_events", "sum_value"]]


def q_events_asof(sf_dir: str):
    """As-of join: every purchase event attributed to the user's most
    recent prior-or-simultaneous view event (classic event
    attribution). Unmatched purchases report view_event_id -1 /
    gap_us -1 to keep the output null-free for hashing."""
    from spapy_ray.stages.sessions import asof_join_split

    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type"])
    out = asof_join_split(ds, by="user_id", on="ts",
                          side_col="event_type", left_value="purchase",
                          right_value="view", left_cols=["event_id"],
                          right_cols=["event_id"]).to_pandas()
    out["view_event_id"] = out["event_id_r"].fillna(-1).astype(np.int64)
    out = out.rename(columns={"event_id": "purchase_event_id"})
    return out[["user_id", "purchase_event_id", "view_event_id"]]


def q_events_distinct_users(sf_dir: str):
    """Exact COUNT(DISTINCT) per key through the pair-dedup bucket
    shuffle (stages/relational.distinct_count) — raw rows never
    shuffle, only distinct-per-block pairs."""
    from spapy_ray.stages.relational import distinct_count

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    return distinct_count(ds, "event_type", "user_id", alias="n_users")


def q_events_windows(sf_dir: str):
    """Window functions over the events log: per user ordered by
    (ts, event_id) — row_number, typed-exact delta_us (gap to the
    previous event, first row 0), and the running max of value
    (comparison-only cumulative, no float arithmetic). One hash-bucket
    shuffle; Cython groupby transforms per bucket (stages/window.py)."""
    from spapy_ray.stages.window import window_over

    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "value"])

    def to_us(t: pa.Table) -> pa.Table:
        return t.append_column("us", pc.cast(t.column("ts"), pa.int64())) \
            .drop_columns(["ts"])

    ev = ev.map_batches(to_us, batch_format="pyarrow")
    return window_over(
        ev, key_col="user_id", order_cols=["us", "event_id"],
        ops=[("rn", "row_number", None),
             ("delta_us", "delta", "us"),
             ("run_max_value", "cummax", "value")],
    ).drop_columns(["us"])


def q_events_rolling(sf_dir: str, width: int = 5):
    """Framed rolling window: per user ordered by (ts, event_id), the
    sum of the last 5 events' value-in-cents (exact int64 — value
    quantized floor(v*100 + 0.5) on both sides so the segmented
    cumsum-diff matches SQL's ROWS 4 PRECEDING sum bit-for-bit)."""
    from spapy_ray.stages.window import window_over

    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64())
        cents = pc.cast(pc.floor(pc.add(
            pc.multiply(t.column("value"), pa.scalar(100.0)),
            pa.scalar(0.5))), pa.int64())
        return pa.table({"event_id": t.column("event_id"),
                         "user_id": t.column("user_id"),
                         "us": us, "cents": cents})

    ev = ev.map_batches(prep, batch_format="pyarrow")
    return window_over(
        ev, key_col="user_id", order_cols=["us", "event_id"],
        ops=[(f"roll{width}_cents", f"rolling_sum:{width}", "cents")],
    ).drop_columns(["us"])


def q_events_funnel(sf_dir: str):
    """Sequential first-occurrence funnel view → click → purchase:
    type-filtered projection, ONE user-bucket shuffle, per-step
    vectorized stage resolution, trivial final fold
    (stages/sessions.funnel_counts)."""
    from spapy_ray.stages.sessions import funnel_counts

    ev = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_type"])
    return funnel_counts(ev, ["view", "click", "purchase"])


def q_events_retention(sf_dir: str):
    """Daily cohort retention matrix over the events log: distinct
    (user, day) combiner, one user-bucket shuffle for cohort
    resolution, small matrix fold (stages/sessions.retention_cohorts)."""
    from spapy_ray.stages.sessions import retention_cohorts

    ev = _read(sf_dir, "events", columns=["user_id", "ts"])
    return retention_cohorts(ev)


def q_events_median(sf_dir: str):
    """Exact per-event-type median of value via the bucketed shuffle
    (reported as median_x2 = the two middle elements' sum — parity-
    free and float-exact; relational.grouped_median)."""
    from spapy_ray.stages.relational import grouped_median

    ev = _read(sf_dir, "events", columns=["event_type", "value"])
    return grouped_median(ev, "event_type", "value")


def q_events_outliers(sf_dir: str):
    """Robust per-type outlier counts (median/MAD, k=3) over
    events.value — two exact distributed medians + one fold, all in
    the bit-exact two-middle convention
    (relational.grouped_mad_outliers)."""
    from spapy_ray.stages.relational import grouped_mad_outliers

    ev = _read(sf_dir, "events", columns=["event_type", "value"])
    return grouped_mad_outliers(ev, "event_type", "value", k=3)


def q_events_asof_fwd(sf_dir: str):
    """FORWARD as-of join: every view event attributed to the user's
    next (earliest >= ts) purchase — the conversion-lookahead form of
    event attribution (direction='forward' through the same
    single-scan split as q_events_asof)."""
    from spapy_ray.stages.sessions import asof_join_split

    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type"])
    out = asof_join_split(ds, by="user_id", on="ts",
                          side_col="event_type", left_value="view",
                          right_value="purchase",
                          left_cols=["event_id"],
                          right_cols=["event_id"],
                          direction="forward").to_pandas()
    out["purchase_event_id"] = out["event_id_r"].fillna(-1) \
        .astype(np.int64)
    out = out.rename(columns={"event_id": "view_event_id"})
    return out[["user_id", "view_event_id", "purchase_event_id"]]


def q_events_transitions(sf_dir: str):
    """First-order Markov transition matrix of the per-user event
    sequence (prev_type -> next_type counts): one user shuffle,
    per-bucket vectorized shift, combiner partials
    (stages/sessions.transition_counts)."""
    from spapy_ray.stages.sessions import transition_counts

    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type"])
    return transition_counts(ev)


def q_nation_year_rollup(sf_dir: str):
    """GROUP BY ROLLUP (nation, order year) over shipped quantity:
    the finest level is one combiner-folded shuffle; coarser levels
    fold from that tiny base (relational.grouped_rollup). Sentinels
    'ALL'/-1 stand in for SQL's rollup NULLs (typed-exact both
    sides)."""
    from spapy_ray.stages.relational import grouped_rollup

    out = grouped_rollup(_nation_year_qty(sf_dir),
                         ["n_name", "year"], "l_quantity",
                         sentinels={"n_name": "ALL", "year": -1},
                         count_alias="n_items")
    out["sum_qty"] = out["l_quantity"].round().astype(np.int64)
    out["year"] = out["year"].astype(np.int64)
    return out[["n_name", "year", "sum_qty", "n_items"]]


def q_nation_year_cube(sf_dir: str):
    """GROUP BY CUBE (nation, order year): all four aggregation
    levels folded from ONE combiner shuffle (relational.grouped_cube
    over the shared rollup base)."""
    from spapy_ray.stages.relational import grouped_cube

    out = grouped_cube(_nation_year_qty(sf_dir),
                       ["n_name", "year"], "l_quantity",
                       sentinels={"n_name": "ALL", "year": -1},
                       count_alias="n_items")
    out["sum_qty"] = out["l_quantity"].round().astype(np.int64)
    out["year"] = out["year"].astype(np.int64)
    return out[["n_name", "year", "sum_qty", "n_items"]]


def q_events_pivot(sf_dir: str):
    """Crosstab: one wide row per user with per-event-type counts
    (relational.pivot_counts — one-hot inside map_batches, the
    exchange is combiner-folded partials)."""
    from spapy_ray.stages.relational import pivot_counts

    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])
    labels = ["click", "error", "purchase", "signup", "view"]
    return pivot_counts(ev, "user_id", "event_type", labels)


def q_part_flag_balance(sf_dir: str):
    """EXCEPT ALL as a streaming bag difference: per part, how many
    more 'R' (returned) lineitems than 'A' ones — positive rows only
    (relational.multiset_except; pairs with table_checksum as the
    localize step of replica reconciliation)."""
    from spapy_ray.stages.relational import multiset_except

    import pyarrow.dataset as pds

    a = _read(sf_dir, "lineitem", columns=["l_partkey"],
              predicate=pds.field("l_returnflag") == "R")
    b = _read(sf_dir, "lineitem", columns=["l_partkey"],
              predicate=pds.field("l_returnflag") == "A")
    return multiset_except(a, b, "l_partkey")


def q_lineitem_corr(sf_dir: str):
    """EXACT grouped correlation (discount vs tax per
    returnflag x linestatus) via integer sufficient statistics and a
    floor-quantized corr^2 — overflow-free arbitrary-precision fold,
    bit-identical to the HUGEINT SQL twin
    (relational.grouped_corr_int)."""
    from spapy_ray.stages.relational import grouped_corr_int

    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus",
                        "l_discount", "l_tax"])
    return grouped_corr_int(li, ["l_returnflag", "l_linestatus"],
                            "l_discount", "l_tax")


def q_events_iqr(sf_dir: str):
    """Per-type exact quartiles/IQR in the parity-free x2 convention
    (relational.grouped_quartiles — rank-pair picks, float-bit-exact
    vs the FILTER-by-rank SQL twin)."""
    from spapy_ray.stages.relational import grouped_quartiles

    ev = _read(sf_dir, "events", columns=["event_type", "value"])
    return grouped_quartiles(ev, "event_type", "value")


def q_view_purchase_overlap(sf_dir: str):
    """INTERSECT ALL of the view-user and purchase-user multisets:
    per user, min(n_views, n_purchases) — the matched-event balance
    (relational.multiset_intersect)."""
    from spapy_ray.stages.relational import multiset_intersect

    import pyarrow.dataset as pds

    a = _read(sf_dir, "events", columns=["user_id"],
              predicate=pds.field("event_type") == "view")
    b = _read(sf_dir, "events", columns=["user_id"],
              predicate=pds.field("event_type") == "purchase")
    return multiset_intersect(a, b, "user_id")


def q_user_last_event(sf_dir: str):
    """Keep-latest compaction (CDC snapshot): each user's most recent
    event row, deterministic under ts ties (max ts, then min
    event_id) — grouped_topk k=1, combiner-first so only one row per
    (user, block) reaches the shuffle."""
    from spapy_ray.stages.relational import grouped_topk

    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type"])

    def us(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("ts"), "ts",
            pc.cast(t.column("ts"), pa.int64()))

    out = grouped_topk(ev.map_batches(us, batch_format="pyarrow"),
                       "user_id", "ts", 1,
                       tie_cols=["event_id"]).to_pandas()
    out = out.drop(columns=["rank"]).sort_values("user_id") \
        .reset_index(drop=True)
    return out[["user_id", "event_id", "ts", "event_type"]]


def q_part_skyline(sf_dir: str):
    """Pareto frontier of parts (minimize retail price, maximize
    size): relational.skyline2 — per-block frontier combiner + one
    driver fold of the tiny frontiers."""
    from spapy_ray.stages.relational import skyline2

    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_retailprice", "p_size"])
    out = skyline2(part, "p_retailprice", "p_size")
    return out.sort_values("p_partkey").reset_index(drop=True)


def q_events_ohlc(sf_dir: str):
    """Hourly OHLC bars per event type (sessions.ohlc_bars —
    mergeable per-block bar partials, one bucketed fold;
    deterministic open/close picks)."""
    from spapy_ray.stages.sessions import ohlc_bars

    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "event_type", "value"])
    out = ohlc_bars(ev).to_pandas().sort_values(["k", "bar"]) \
        .reset_index(drop=True)
    return out[["k", "bar", "open", "high", "low", "close", "n"]]


def q_rolling_users(sf_dir: str):
    """Trailing-7-day distinct active users per day
    (sessions.rolling_active_users — exact distributed distinct via
    (user, day) dedup + window expansion; exchange is
    O(7 x active-user-days))."""
    from spapy_ray.stages.sessions import rolling_active_users

    ev = _read(sf_dir, "events", columns=["user_id", "ts"])
    return rolling_active_users(ev)


def q_purchase_attribution(sf_dir: str):
    """Purchase-to-session attribution: gap-30min sessions over the
    full event log, purchases joined into the containing session via
    the two-sided keyed interval join (sessions.interval_attach —
    one user co-partition, per-bucket merge_asof + containment
    filter), then a per-session fold."""
    from ray.data.aggregate import Count, Min

    from spapy_ray.stages.sessions import interval_attach, sessionize

    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type"])
    sess = sessionize(ev) \
        .select_columns(["user_id", "session_start_us",
                         "session_end_us"])

    def us(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t.column("user_id"),
            "event_id": t.column("event_id"),
            "ts_us": pc.cast(t.column("ts"), pa.int64())})

    pur = ev.filter(expr="event_type == 'purchase'") \
        .map_batches(us, batch_format="pyarrow")
    j = interval_attach(pur, sess, key="user_id", ts_col="ts_us",
                        lo_col="session_start_us",
                        hi_col="session_end_us")
    out = j.groupby(["user_id", "session_start_us",
                     "session_end_us"]).aggregate(
        Count(alias_name="n_purchases"),
        Min("ts_us", alias_name="first_purchase_us")).to_pandas()
    cols = ["user_id", "session_start_us", "session_end_us",
            "n_purchases", "first_purchase_us"]
    if not len(out):  # empty to_pandas drops columns (NOTES_r2)
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in cols})
    out["n_purchases"] = out["n_purchases"].astype(np.int64)
    out["first_purchase_us"] = out["first_purchase_us"] \
        .astype(np.int64)
    return out.sort_values(["user_id", "session_start_us"]) \
        .reset_index(drop=True)


def q_lineitem_profile(sf_dir: str):
    """Data-quality profiler: per column exact (n_rows, n_null,
    n_distinct) via relational.global_distinct_count — one
    column-pruned streaming pass per column; blocks ship only their
    local unique values."""
    from spapy_ray.stages.relational import global_distinct_count

    cols = ["l_orderkey", "l_partkey", "l_suppkey", "l_returnflag",
            "l_linestatus"]
    rows = []
    for c in cols:
        ds = _read(sf_dir, "lineitem", columns=[c])
        n, nn, nd = global_distinct_count(ds, c)
        rows.append((c, n, nn, nd))
    return pd.DataFrame(rows, columns=["column", "n_rows", "n_null",
                                       "n_distinct"]) \
        .astype({"n_rows": np.int64, "n_null": np.int64,
                 "n_distinct": np.int64})


def q_orderkey_islands(sf_dir: str):
    """Key-continuity audit: maximal consecutive runs among the
    orderkeys having returned items — a scattered subset, so the
    island structure is real (relational.value_islands — 1-D
    dissolve: windows resolve interior islands final, only edge
    islands stitch on the driver)."""
    from spapy_ray.stages.relational import value_islands

    import pyarrow.dataset as pds

    li = _read(sf_dir, "lineitem", columns=["l_orderkey"],
               predicate=pds.field("l_returnflag") == "R")
    out = value_islands(li, "l_orderkey").to_pandas()
    return out.sort_values("start").reset_index(drop=True)


def q_user_twap(sf_dir: str):
    """Time-weighted value per user: TWAP numerator
    sum(trunc(value*100) * dt_us) and denominator sum(dt_us) in
    exact int64 (trunc dodges rounding-tie divergence), over the
    lead-attached event stream (sessions.with_next_ts)."""
    from ray.data.aggregate import Sum

    from spapy_ray.stages.sessions import with_next_ts

    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "value"])
    led = with_next_ts(ev)

    def w(t: pa.Table) -> pa.Table:
        nxt = t.column("next_us").to_numpy(zero_copy_only=False)
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        keep = nxt >= 0
        dt = (nxt - ts)[keep]
        vq = np.trunc(t.column("value").to_numpy(
            zero_copy_only=False)[keep] * 100.0).astype(np.int64)
        return pa.table({
            "user_id": pa.array(t.column("user_id")
                                .to_numpy(zero_copy_only=False)[keep]),
            "num": pa.array(vq * dt),
            "den": pa.array(dt.astype(np.int64))})

    out = led.map_batches(w, batch_format="pyarrow") \
        .groupby("user_id").aggregate(
            Sum("num", alias_name="twap_num"),
            Sum("den", alias_name="twap_den")).to_pandas()
    out["twap_num"] = out["twap_num"].astype(np.int64)
    out["twap_den"] = out["twap_den"].astype(np.int64)
    return out.sort_values("user_id").reset_index(drop=True)


def q_event_gap_hist(sf_dir: str):
    """Inter-arrival distribution: histogram of per-user event gaps
    in minute buckets capped at one day (sessions.with_next_ts +
    one combiner-folded count shuffle)."""
    from ray.data.aggregate import Sum

    from spapy_ray.stages.sessions import with_next_ts

    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "value"])
    led = with_next_ts(ev)

    def h(t: pa.Table) -> pa.Table:
        nxt = t.column("next_us").to_numpy(zero_copy_only=False)
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        keep = nxt >= 0
        gap_min = np.minimum((nxt - ts)[keep] // 60_000_000, 1440)
        u, c = np.unique(gap_min, return_counts=True)
        return pa.table({"gap_min": pa.array(u.astype(np.int64)),
                         "n": pa.array(c.astype(np.int64))})

    out = led.map_batches(h, batch_format="pyarrow") \
        .groupby("gap_min").aggregate(Sum("n", alias_name="n")) \
        .to_pandas()
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values("gap_min").reset_index(drop=True)


def q_copurchase_pairs(sf_dir: str, k: int = 20, min_count: int = 3):
    """Market-basket mining: top-20 co-purchased part pairs by
    quantized lift ((c_ab*q)//c_a*q)//c_b — the overflow-free chained
    floor of bigram_pmi applied to baskets. Pair generation is
    within_group_pairs over the order (size-class-batched triu);
    supports fold in one bucketed shuffle; per-part counts broadcast
    once."""
    import ray

    from spapy_ray.stages.relational import (bucketed_group_agg,
                                             within_group_pairs)

    Q = 1_000_000
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_partkey"])
    pairs = within_group_pairs(li, "l_orderkey", "l_partkey",
                               out_a="pa", out_b="pb")

    def pack(t: pa.Table) -> pa.Table:
        a = t.column("pa").to_numpy(zero_copy_only=False)
        b = t.column("pb").to_numpy(zero_copy_only=False)
        return pa.table({"pk": pa.array(a * (np.int64(1) << 32) + b)})

    def cnt(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("pk", sort=False).size().reset_index(name="c_ab")
        s = s[s["c_ab"] >= min_count]
        s["c_ab"] = s["c_ab"].astype(np.int64)
        return s

    sup = bucketed_group_agg(
        pairs.map_batches(pack, batch_format="pyarrow"), "pk", cnt)

    # per-part distinct-order counts (the part-count vector is the
    # SMALL side): exact (order, part) dedup inside the order-keyed
    # bucket pass, then a tiny driver fold
    def od_fold(g: pd.DataFrame) -> pd.DataFrame:
        df = g.drop_duplicates()
        s = df.groupby("l_partkey", sort=False).size() \
            .reset_index(name="c")
        s["c"] = s["c"].astype(np.int64)
        return s

    pc_counts = bucketed_group_agg(li, "l_orderkey", od_fold) \
        .to_pandas().groupby("l_partkey")["c"].sum()
    cmap = ray.put(dict(pc_counts))

    def score(t: pa.Table, _ref=cmap) -> pa.Table:
        m = ray.get(_ref)
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        a = (pk >> np.int64(32)).astype(np.int64)
        b = (pk & np.int64((1 << 32) - 1)).astype(np.int64)
        cab = t.column("c_ab").to_numpy(zero_copy_only=False)
        ca = pd.Series(a).map(m).to_numpy(dtype=np.int64)
        cb = pd.Series(b).map(m).to_numpy(dtype=np.int64)
        lift = (cab.astype(object) * Q // ca * Q // cb) \
            .astype(np.int64)
        return pa.table({"pa": pa.array(a), "pb": pa.array(b),
                         "c_ab": pa.array(cab.astype(np.int64)),
                         "c_a": pa.array(ca), "c_b": pa.array(cb),
                         "lift_q": pa.array(lift)})

    out = sup.map_batches(score, batch_format="pyarrow") \
        .sort(["lift_q", "pa", "pb"],
              descending=[True, False, False]).limit(k).to_pandas()
    return out


def q_top_paths(sf_dir: str, k: int = 10):
    """Top user journeys: each user's first-8 event-type signature
    (sessions.user_paths — cumcount prefix matrix, vectorized
    np.char joins), then a combiner-folded path count and a
    deterministic top-10."""
    from spapy_ray.stages.relational import pre_aggregated_sums

    from spapy_ray.stages.sessions import user_paths

    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type"])
    paths = user_paths(ev)

    def one(t: pa.Table) -> pa.Table:
        return pa.table({"path": t.column("path"),
                         "one": pa.array(
                             np.ones(t.num_rows, dtype=np.int64))})

    counts = pre_aggregated_sums(
        paths.map_batches(one, batch_format="pyarrow"),
        ["path"], ["one"], count_alias="n_users").to_pandas()
    counts = counts.sort_values(["n_users", "path"],
                                ascending=[False, True],
                                kind="mergesort").head(k)
    counts["n_users"] = counts["n_users"].astype(np.int64)
    return counts[["path", "n_users"]].reset_index(drop=True)


def q_revenue_total_128(sf_dir: str):
    """Whole-table revenue in cents as a 128-bit (hi, lo) limb pair:
    per-block int64 partials fold in arbitrary-precision Python on
    the driver, so the total is exact even where a 100-TB sum
    overflows int64 (the overflow-safety policy made visible).
    lo = total % 2^62, hi = total // 2^62 (both sides)."""
    li = _read(sf_dir, "lineitem", columns=["l_extendedprice"])

    def cents(t: pa.Table) -> pa.Table:
        c = np.rint(t.column("l_extendedprice")
                    .to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        return pa.table({"s": pa.array([int(c.sum())]),
                         "n": pa.array([np.int64(t.num_rows)])})

    parts = li.map_batches(cents, batch_format="pyarrow").to_pandas()
    total = sum(int(x) for x in parts["s"])
    n = int(parts["n"].sum())
    return pd.DataFrame({
        "hi": np.array([total >> 62], dtype=np.int64),
        "lo": np.array([total % (1 << 62)], dtype=np.int64),
        "n": np.array([n], dtype=np.int64)})


def q_events_trimmed_mean(sf_dir: str):
    """Robust per-type center: interquartile (trimmed) integer sum —
    values trunc-quantized x100, ranks [(n-1)//4, n-1-(n-1)//4]
    inclusive kept, summed ascending as exact int64. The
    rank-range FILTER twin matches bit for bit."""
    from spapy_ray.stages.relational import bucketed_group_agg

    ev = _read(sf_dir, "events", columns=["event_type", "value"])

    def local(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, gg in g.groupby("event_type", sort=False):
            v = np.sort(np.trunc(
                gg["value"].to_numpy(dtype=np.float64) * 100.0)
                .astype(np.int64))
            n = len(v)
            a = (n - 1) // 4
            b = n - 1 - a
            rows.append((k, n, int(v[a:b + 1].sum()),
                         b - a + 1))
        return pd.DataFrame(rows, columns=[
            "event_type", "n", "trimmed_sum_q", "n_kept"]) \
            .astype({"n": np.int64, "trimmed_sum_q": np.int64,
                     "n_kept": np.int64})

    return bucketed_group_agg(ev, "event_type", local)


def q_events_dow_hour(sf_dir: str):
    """Seasonal activity profile: counts per (day-of-week, hour) —
    integer epoch arithmetic (1970-01-01 is a Thursday; DuckDB
    dayofweek 0=Sunday convention matched), one combiner shuffle."""
    from spapy_ray.stages.relational import pre_aggregated_sums

    ev = _read(sf_dir, "events", columns=["ts"])

    def cal(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        day = us // 86_400_000_000
        dow = (day + 4) % 7
        hour = (us % 86_400_000_000) // 3_600_000_000
        return pa.table({"dow": pa.array(dow.astype(np.int64)),
                         "hour": pa.array(hour.astype(np.int64)),
                         "one": pa.array(
                             np.ones(len(us), dtype=np.int64))})

    out = pre_aggregated_sums(ev.map_batches(cal,
                                             batch_format="pyarrow"),
                              ["dow", "hour"], ["one"],
                              count_alias="n").to_pandas()
    out = out[["dow", "hour", "n"]].astype(np.int64)
    return out.sort_values(["dow", "hour"]).reset_index(drop=True)


def q_user_type_hhi(sf_dir: str):
    """Per-user event-type concentration: exact integer Herfindahl
    index hhi_q = (sum c_i^2) * 1e6 // n^2 (log-free diversity
    metric, the docs_surprisal integer trick applied to shares).
    One combiner shuffle for the (user, type) counts; the HHI fold
    runs on the tiny folded table."""
    from spapy_ray.stages.relational import pre_aggregated_sums

    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def one(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t.column("user_id"),
            "event_type": t.column("event_type"),
            "one": pa.array(np.ones(t.num_rows, dtype=np.int64))})

    from ray.data.aggregate import Sum

    counts = pre_aggregated_sums(
        ev.map_batches(one, batch_format="pyarrow"),
        ["user_id", "event_type"], ["one"], count_alias="c")

    def sq(t: pa.Table) -> pa.Table:
        c = t.column("c").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"user_id": t.column("user_id"),
                         "n": pa.array(c), "ss": pa.array(c * c)})

    folded = counts.map_batches(sq, batch_format="pyarrow") \
        .groupby("user_id").aggregate(
            Sum("n", alias_name="n"), Sum("ss", alias_name="ss"))

    def hhi(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ss = t.column("ss").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        h = (ss.astype(object) * 1_000_000 // (n.astype(object) * n)) \
            .astype(np.int64)
        return pa.table({"user_id": t.column("user_id"),
                         "n": pa.array(n), "hhi_q": pa.array(h)})

    out = folded.map_batches(hhi, batch_format="pyarrow").to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_bounce_rate(sf_dir: str):
    """Per-user bounce profile: session count and single-event
    (bounce) session count from the sessionize operator — a
    composition fold over its output."""
    from ray.data.aggregate import Count, Sum

    from spapy_ray.stages.sessions import sessionize

    ev = _read(sf_dir, "events", columns=["user_id", "ts"])
    sess = sessionize(ev)

    def flag(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.equal(t.column("n_events"), pa.scalar(1)),
                    pa.int64())
        return pa.table({"user_id": t.column("user_id"),
                         "b": b})

    out = sess.map_batches(flag, batch_format="pyarrow") \
        .groupby("user_id").aggregate(
            Count(alias_name="n_sessions"),
            Sum("b", alias_name="n_bounces")).to_pandas()
    out["n_sessions"] = out["n_sessions"].astype(np.int64)
    out["n_bounces"] = out["n_bounces"].astype(np.int64)
    return out.sort_values("user_id").reset_index(drop=True)


def q_events_centered(sf_dir: str):
    """Median-centered values (robust normalization, the broadcast-
    back pattern): per event, c2 = 2*value - median_x2(type) — the
    per-type exact median table is the SMALL side, ray.put once,
    subtracted per batch. Exact float convention (one subtraction of
    the same two doubles both sides)."""
    import ray

    from spapy_ray.stages.relational import grouped_median

    ev = _read(sf_dir, "events",
               columns=["event_id", "event_type", "value"])
    med = grouped_median(ev, "event_type", "value").to_pandas()
    m2 = dict(zip(med["event_type"], med["median_x2"]))
    ref = ray.put(m2)

    def center(t: pa.Table, _ref=ref) -> pa.Table:
        mm = ray.get(_ref)
        v = t.column("value").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        keys = t.column("event_type").to_pandas()
        m = keys.map(mm).to_numpy(dtype=np.float64)
        return pa.table({"event_id": t.column("event_id"),
                         "c2": pa.array(2.0 * v - m)})

    return ev.map_batches(center, batch_format="pyarrow")


def q_value_drift(sf_dir: str):
    """Distribution drift between click and view event values: exact
    integer two-sample KS numerator (relational.two_sample_ks —
    window co-partition, per-window offsets broadcast, local maxima
    fold). D = d_num / (na*nb)."""
    import pyarrow.dataset as pds

    from spapy_ray.stages.relational import two_sample_ks

    def q(label):
        ds = _read(sf_dir, "events", columns=["value"],
                   predicate=pds.field("event_type") == label)

        def qz(t: pa.Table) -> pa.Table:
            v = np.trunc(t.column("value")
                         .to_numpy(zero_copy_only=False) * 100.0) \
                .astype(np.int64)
            return pa.table({"vq": pa.array(v)})

        return ds.map_batches(qz, batch_format="pyarrow")

    return two_sample_ks(q("click"), q("view"), "vq")


def q_lineitem_regr(sf_dir: str, q: int = 10 ** 6):
    """Per-(returnflag, linestatus) OLS regression of price cents on
    quantity — exact integer moment sums (ONE combiner shuffle), the
    closed-form slope/intercept folded in Python big ints on the
    4-row moment table; trunc-toward-zero quantization (DuckDB //).
    At 10^12 rows the int64 partials would switch to the (hi, lo)
    limb fold of revenue_total_128."""
    from spapy_ray.stages.relational import pre_aggregated_sums

    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity",
                        "l_extendedprice"])

    def pre(t: pa.Table) -> pa.Table:
        x = np.rint(t.column("l_quantity")
                    .to_numpy(zero_copy_only=False)).astype(np.int64)
        y = np.rint(t.column("l_extendedprice")
                    .to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        return pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "l_linestatus": t.column("l_linestatus"),
            "x": pa.array(x), "y": pa.array(y),
            "xy": pa.array(x * y), "xx": pa.array(x * x)})

    s = pre_aggregated_sums(li.map_batches(pre, batch_format="pyarrow"),
                            ["l_returnflag", "l_linestatus"],
                            ["x", "y", "xy", "xx"], count_alias="n")
    df = s.to_pandas()

    def tq(a: int, b: int) -> int:
        return (1 if (a >= 0) == (b >= 0) else -1) \
            * (abs(a) // abs(b))

    rows = []
    for r in df.itertuples(index=False):
        n, sx, sy = int(r.n), int(r.x), int(r.y)
        sxy, sxx = int(r.xy), int(r.xx)
        d = n * sxx - sx * sx
        rows.append((r.l_returnflag, r.l_linestatus, n,
                     tq(q * (n * sxy - sx * sy), d),
                     tq(q * (sy * sxx - sx * sxy), d)))
    out = pd.DataFrame(rows, columns=["l_returnflag", "l_linestatus",
                                      "n", "slope_q", "icept_q"])
    for c in ("n", "slope_q", "icept_q"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["l_returnflag", "l_linestatus"]) \
        .reset_index(drop=True)


def q_events_interp(sf_dir: str):
    """Linear interpolation of purchase value at each view timestamp
    (two-sided as-of + exact integer interpolation, one scan + one
    shuffle; stages.sessions.interp_attach)."""
    from spapy_ray.stages.sessions import interp_attach

    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type",
                        "value"])
    return interp_attach(ds)


def q_events_percent_rank(sf_dir: str, q: int = 10 ** 6):
    """Rank-normalized position of every event within its user's
    timeline: pct_q = (q*(rn-1))//(n-1) (percent_rank) and cd_q =
    (q*rn)//n (cume_dist), integer-exact — row_number + the
    group_size window kind in ONE bucket shuffle (no second
    count aggregate)."""
    from spapy_ray.stages.window import window_over

    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id"])
    w = window_over(ev, key_col="user_id",
                    order_cols=["ts", "event_id"],
                    ops=[("rn", "row_number", None),
                         ("n", "group_size", None)],
                    keep_cols=["event_id"])

    def fin(t: pa.Table) -> pa.Table:
        rn = t.column("rn").to_numpy().astype(np.int64)
        n = t.column("n").to_numpy().astype(np.int64)
        pct = np.where(n == 1, 0,
                       (q * (rn - 1)) // np.maximum(n - 1, 1))
        return pa.table({
            "user_id": t.column("user_id"),
            "event_id": t.column("event_id"),
            "pct_q": pa.array(pct.astype(np.int64)),
            "cd_q": pa.array(((q * rn) // n).astype(np.int64))})

    return w.map_batches(fin, batch_format="pyarrow")


def q_price_wmedian(sf_dir: str):
    """Quantity-weighted exact median of price cents per return
    flag: per key sort + weight cumsum, values at expanded ranks
    (W-1)//2 and W//2 (the two-middle-sum convention applied to the
    weighted multiset)."""
    from spapy_ray.stages.relational import bucketed_group_agg

    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity",
                        "l_extendedprice"])

    def pre(t: pa.Table) -> pa.Table:
        c = np.rint(t.column("l_extendedprice")
                    .to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        w = np.rint(t.column("l_quantity")
                    .to_numpy(zero_copy_only=False)).astype(np.int64)
        return pa.table({"l_returnflag": t.column("l_returnflag"),
                         "c": pa.array(c), "wt": pa.array(w)})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, gg in g.groupby("l_returnflag", sort=False):
            o = np.argsort(gg["c"].to_numpy(), kind="stable")
            v = gg["c"].to_numpy()[o]
            cw = np.cumsum(gg["wt"].to_numpy()[o])
            W = int(cw[-1])
            v1 = v[np.searchsorted(cw, (W - 1) // 2 + 1)]
            v2 = v[np.searchsorted(cw, W // 2 + 1)]
            rows.append((k, W, int(v1) + int(v2)))
        return pd.DataFrame(rows, columns=["l_returnflag", "w_total",
                                           "wmedian_x2"]) \
            .astype({"w_total": np.int64, "wmedian_x2": np.int64})

    out = bucketed_group_agg(
        li.map_batches(pre, batch_format="pyarrow"), "l_returnflag",
        fold).to_pandas()
    return out.sort_values("l_returnflag").reset_index(drop=True) \
        .astype({"w_total": np.int64, "wmedian_x2": np.int64})


def q_orders_benford(sf_dir: str):
    """Benford first-digit audit of order values (fraud-detection
    classic): exact digit counts via the decimal-string first char
    (no float log), per-digit observed-vs-expected per-mille delta."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", columns=["o_totalprice"])

    def digits(t: pa.Table) -> pa.Table:
        c = np.rint(t.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        c = c[c > 0]
        d = pc.utf8_slice_codeunits(
            pc.cast(pa.array(c), pa.string()), 0, 1)
        dd = pc.cast(d, pa.int64()).to_numpy(zero_copy_only=False)
        u, n = np.unique(dd, return_counts=True)
        return pa.table({"digit": pa.array(u.astype(np.int64)),
                         "n_obs": pa.array(n.astype(np.int64))})

    out = orders.map_batches(digits, batch_format="pyarrow") \
        .groupby("digit").aggregate(Sum("n_obs", alias_name="n_obs")) \
        .to_pandas().sort_values("digit").reset_index(drop=True)
    out["n_obs"] = out["n_obs"].astype(np.int64)
    n = int(out["n_obs"].sum())
    exp = np.array([BENFORD_MILLI[int(d) - 1] for d in out["digit"]],
                   dtype=np.int64)
    out["exp_milli"] = exp
    out["delta_milli"] = (1000 * out["n_obs"].astype(np.int64)) // n \
        - exp
    out["digit"] = out["digit"].astype(np.int64)
    return out


def q_events_mwu(sf_dir: str):
    """Mann-Whitney U (rank-sum, midrank-doubled) between view and
    purchase value distributions (relational.mann_whitney_u — the
    location-shift drift test next to the KS value_drift)."""
    from spapy_ray.stages.relational import mann_whitney_u

    ev = _read(sf_dir, "events", columns=["event_type", "value"])

    def cents(kind):
        def _f(t: pa.Table) -> pa.Table:
            keep = pc.equal(t.column("event_type"), kind)
            v = np.rint(t.filter(keep).column("value")
                        .to_numpy(zero_copy_only=False) * 100.0) \
                .astype(np.int64)
            return pa.table({"c": pa.array(v)})
        return _f

    a = ev.map_batches(cents("view"), batch_format="pyarrow")
    b = ev.map_batches(cents("purchase"), batch_format="pyarrow")
    return mann_whitney_u(a, b, "c")


def q_events_spearman(sf_dir: str):
    """Per-type Spearman rank correlation of value vs time (signed
    squared, exact — relational.grouped_spearman): is a metric
    drifting monotonically within each event type?"""
    from spapy_ray.stages.relational import grouped_spearman

    ev = _read(sf_dir, "events",
               columns=["event_type", "ts", "value"])

    def pre(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t.column("event_type"),
            "us": pc.cast(t.column("ts"), pa.int64()),
            "c": pa.array(np.rint(t.column("value").to_numpy(
                zero_copy_only=False) * 100.0).astype(np.int64))})

    out = grouped_spearman(
        ev.map_batches(pre, batch_format="pyarrow"),
        "event_type", "us", "c").to_pandas()
    return out.sort_values("event_type").reset_index(drop=True) \
        .astype({"n": np.int64, "rho2_q": np.int64})


def q_events_late(sf_dir: str):
    """Watermark / allowed-lateness audit: events arriving (by
    event_id order) more than 5 min behind the running max event
    time, counted per event-time hour
    (sessions.late_event_counts — distributed ordered cummax)."""
    from spapy_ray.stages.sessions import late_event_counts

    ev = _read(sf_dir, "events", columns=["event_id", "ts"])
    return late_event_counts(ev)


def q_events_rolling_slope(sf_dir: str, w: int = 8, q: int = 10 ** 6):
    """Per-user rolling OLS slope of value-cents against the event
    index over the last w events (the streaming trend/momentum
    feature): two window_over passes — row_number first, then framed
    rolling sums of (1, rn, c, rn*c, rn*rn); the closed-form slope
    folds per row, trunc-toward-zero. All moments integer-exact
    (rn is the per-user index, so products stay small)."""
    from spapy_ray.stages.window import window_over

    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "value"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t.column("event_id"),
            "ts": t.column("ts"),
            "user_id": t.column("user_id"),
            "c": pa.array(np.rint(t.column("value").to_numpy(
                zero_copy_only=False) * 100.0).astype(np.int64))})

    rn = window_over(ev.map_batches(cents, batch_format="pyarrow"),
                     key_col="user_id", order_cols=["ts", "event_id"],
                     ops=[("rn", "row_number", None)],
                     keep_cols=["event_id", "c"])

    def prods(t: pa.Table) -> pa.Table:
        r = t.column("rn").to_numpy().astype(np.int64)
        c = t.column("c").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "user_id": t.column("user_id"), "ts": t.column("ts"),
            "event_id": t.column("event_id"),
            "rn": pa.array(r), "c": pa.array(c),
            "one": pa.array(np.ones(len(r), dtype=np.int64)),
            "xy": pa.array(r * c), "xx": pa.array(r * r)})

    rolled = window_over(
        rn.map_batches(prods, batch_format="pyarrow"),
        key_col="user_id", order_cols=["ts", "event_id"],
        ops=[("n_w", f"rolling_sum:{w}", "one"),
             ("sx", f"rolling_sum:{w}", "rn"),
             ("sy", f"rolling_sum:{w}", "c"),
             ("sxy", f"rolling_sum:{w}", "xy"),
             ("sxx", f"rolling_sum:{w}", "xx")],
        keep_cols=["event_id"])

    def slope(t: pa.Table) -> pa.Table:
        n = t.column("n_w").to_numpy().astype(np.int64)
        sx = t.column("sx").to_numpy().astype(np.int64)
        sy = t.column("sy").to_numpy().astype(np.int64)
        sxy = t.column("sxy").to_numpy().astype(np.int64)
        sxx = t.column("sxx").to_numpy().astype(np.int64)
        num = q * (n * sxy - sx * sy)
        den = n * sxx - sx * sx
        out = np.zeros(len(n), dtype=np.int64)
        nz = den > 0
        sgn = np.where(num >= 0, 1, -1)
        out[nz] = (sgn[nz] * (np.abs(num[nz]) // den[nz]))
        return pa.table({"user_id": t.column("user_id"),
                         "event_id": t.column("event_id"),
                         "n_w": pa.array(n),
                         "slope_q": pa.array(out)})

    return rolled.map_batches(slope, batch_format="pyarrow")


def q_orders_mom_growth(sf_dir: str):
    """Month-over-month order-count growth in integer per-mille:
    monthly combiner counts (tiny), consecutive-month attach on the
    driver table, growth_pm = (1000*(c - prev)) // prev (trunc both
    sides; first month = 0 sentinel)."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", columns=["o_orderdate"])

    def pre(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("o_orderdate"), pa.int64()).to_numpy()
        d = (us // 86_400_000_000).astype("datetime64[D]")
        m = d.astype("datetime64[M]").astype(np.int64)  # months
        u, c = np.unique(m, return_counts=True)
        return pa.table({"month": pa.array(u),
                         "c": pa.array(c.astype(np.int64))})

    mc = orders.map_batches(pre, batch_format="pyarrow") \
        .groupby("month").aggregate(Sum("c", alias_name="c")) \
        .to_pandas().sort_values("month").reset_index(drop=True)
    c = mc["c"].to_numpy().astype(np.int64)
    prev = np.r_[0, c[:-1]]
    g = np.zeros(len(c), dtype=np.int64)
    nz = prev > 0
    num = 1000 * (c[nz] - prev[nz])
    g[nz] = np.where(num >= 0, num // prev[nz],
                     -((-num) // prev[nz]))
    mc["growth_pm"] = g
    mc["c"] = mc["c"].astype(np.int64)
    mc["month"] = mc["month"].astype(np.int64)
    return mc


def q_user_survival(sf_dir: str):
    """User survival curve (uncensored Kaplan-Meier counts): each
    user's observed lifetime in whole days (max ts - min ts), then
    n_surviving(day k) = users with lifetime >= k — per-user min/max
    fold (one shuffle), lifetime histogram, suffix-sum on the tiny
    day table."""
    from ray.data.aggregate import Max, Min

    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def pre(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t.column("user_id"),
            "us": pc.cast(t.column("ts"), pa.int64())})

    mm = ev.map_batches(pre, batch_format="pyarrow") \
        .groupby("user_id").aggregate(Min("us", alias_name="lo"),
                                      Max("us", alias_name="hi")) \
        .to_pandas()
    life = ((mm["hi"].to_numpy() - mm["lo"].to_numpy())
            // 86_400_000_000).astype(np.int64)
    u, c = np.unique(life, return_counts=True)
    # suffix sums: users surviving to at least day k
    surv = np.cumsum(c[::-1])[::-1]
    return pd.DataFrame({"day_k": u.astype(np.int64),
                         "n_lifetime": c.astype(np.int64),
                         "n_surviving": surv.astype(np.int64)})


def q_events_zscore_outliers(sf_dir: str, k: int = 3):
    """Classical z-score outlier counts per event type, exact with
    no square root: |v - mu| > k*sigma  <=>  (n*v - S)^2 >
    k^2*(n*SS - S^2) — integer moment sums broadcast back, one count
    pass (the mean/variance complement of the median/MAD gate)."""
    import ray
    from ray.data.aggregate import Sum

    from spapy_ray.stages.relational import pre_aggregated_sums

    ev = _read(sf_dir, "events", columns=["event_type", "value"])

    def pre(t: pa.Table) -> pa.Table:
        c = np.rint(t.column("value").to_numpy(zero_copy_only=False)
                    * 100.0).astype(np.int64)
        return pa.table({"event_type": t.column("event_type"),
                         "c": pa.array(c), "cc": pa.array(c * c)})

    m = pre_aggregated_sums(ev.map_batches(pre,
                                           batch_format="pyarrow"),
                            ["event_type"], ["c", "cc"],
                            count_alias="n").to_pandas()
    mom = {r.event_type: (int(r.n), int(r.c), int(r.cc))
           for r in m.itertuples()}
    ref = ray.put(mom)

    def flag(t: pa.Table, _ref=ref) -> pa.Table:
        mm = ray.get(_ref)
        keys = t.column("event_type").to_pandas()
        c = np.rint(t.column("value").to_numpy(zero_copy_only=False)
                    * 100.0).astype(object)
        n = keys.map({k_: v[0] for k_, v in mm.items()}) \
            .to_numpy().astype(object)
        s = keys.map({k_: v[1] for k_, v in mm.items()}) \
            .to_numpy().astype(object)
        ss = keys.map({k_: v[2] for k_, v in mm.items()}) \
            .to_numpy().astype(object)
        lhs = (n * c - s) ** 2
        rhs = (k * k) * (n * ss - s * s)
        out = (lhs > rhs).astype(np.int64)
        return pa.table({"event_type": t.column("event_type"),
                         "o": pa.array(out),
                         "one": pa.array(np.ones(len(out),
                                                 dtype=np.int64))})

    cnt = ev.map_batches(flag, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            Sum("o", alias_name="n_outliers"),
            Sum("one", alias_name="n")) \
        .to_pandas()[["event_type", "n", "n_outliers"]]
    for c2 in ("n", "n_outliers"):
        cnt[c2] = cnt[c2].astype(np.int64)
    return cnt.sort_values("event_type").reset_index(drop=True)


def q_events_hll(sf_dir: str):
    """HyperLogLog distinct-event sketch over event_id: 1024
    mergeable registers folded in one shuffle-free map pass
    (relational.hll_registers) — the cardinality-estimation
    primitive for corpus-scale dedup planning. Every register AND
    the exact big-integer harmonic estimate are reproduced by the
    SQL twin."""
    from spapy_ray.stages.relational import hll_registers

    ev = _read(sf_dir, "events", columns=["event_id"])
    return hll_registers(ev, "event_id", p=10)


def q_events_ntile(sf_dir: str, tiles: int = 4):
    """Even-split quartile buckets of event value per event type:
    tile = ((rn - 1) * 4) // n + 1 over the (cents, event_id)
    order — row_number + group_size in ONE bucket shuffle
    (stages/window.window_over), folded to per-(type, tile) row
    counts and exact cent sums. (The formula is the even-split
    bucket, shared verbatim with the twin — NOT SQL NTILE's
    big-buckets-first convention.)"""
    from ray.data.aggregate import Sum

    from spapy_ray.stages.window import window_over

    ev = _read(sf_dir, "events",
               columns=["event_id", "event_type", "value"])

    def cents(t: pa.Table) -> pa.Table:
        c = np.rint(t.column("value").to_numpy(zero_copy_only=False)
                    * 100.0).astype(np.int64)
        return pa.table({"event_id": t.column("event_id"),
                         "event_type": t.column("event_type"),
                         "c": pa.array(c)})

    w = window_over(ev.map_batches(cents, batch_format="pyarrow"),
                    key_col="event_type",
                    order_cols=["c", "event_id"],
                    ops=[("rn", "row_number", None),
                         ("n", "group_size", None)],
                    keep_cols=["c"])

    def fold(t: pa.Table) -> pa.Table:
        rn = t.column("rn").to_numpy().astype(np.int64)
        n = t.column("n").to_numpy().astype(np.int64)
        c = t.column("c").to_numpy().astype(np.int64)
        tile = ((rn - 1) * tiles) // n + 1
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"event_type": et, "tile": tile, "c": c})
        p = df.groupby(["event_type", "tile"], sort=False).agg(
            n_rows=("c", "size"), sum_cents=("c", "sum")) \
            .reset_index()
        return pa.Table.from_pandas(p, preserve_index=False)

    out = w.map_batches(fold, batch_format="pyarrow") \
        .groupby(["event_type", "tile"]).aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("sum_cents", alias_name="sum_cents")).to_pandas()
    out["tile"] = out["tile"].astype(np.int64)
    out["n_rows"] = out["n_rows"].astype(np.int64)
    out["sum_cents"] = out["sum_cents"].astype(np.int64)
    return out.sort_values(["event_type", "tile"]) \
        .reset_index(drop=True)


def q_value_emd(sf_dir: str):
    """Exact 1-D Earth-Mover (Wasserstein-1) distance numerator
    between click and view event values — the transport-cost drift
    metric next to value_drift's KS max (relational.two_sample_emd:
    same value-window co-partition, per-window integral partials in
    two int64 limbs, python-int driver fold + inter-window boundary
    terms). EMD = (emd_hi*2^62 + emd_lo) / (na*nb)."""
    import pyarrow.dataset as pds

    from spapy_ray.stages.relational import two_sample_emd

    def q(label):
        ds = _read(sf_dir, "events", columns=["value"],
                   predicate=pds.field("event_type") == label)

        def qz(t: pa.Table) -> pa.Table:
            v = np.trunc(t.column("value")
                         .to_numpy(zero_copy_only=False) * 100.0) \
                .astype(np.int64)
            return pa.table({"vq": pa.array(v)})

        return ds.map_batches(qz, batch_format="pyarrow")

    return two_sample_emd(q("click"), q("view"), "vq")


def q_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape — forecast revenue change: one filtered scan
    with EVERY predicate pushed into the parquet fragment reader
    (date range, discount band, quantity cap — no row leaves storage
    unfiltered), then a two-limb exact cents*discount_pct partial
    fold. The canonical prune-at-the-read demonstration."""
    import pyarrow.dataset as pds

    t0 = pd.Timestamp("1996-01-01")
    t1 = pd.Timestamp("1997-01-01")
    pred = ((pds.field("l_shipdate") >= t0)
            & (pds.field("l_shipdate") < t1)
            & (pds.field("l_discount") >= 0.05)
            & (pds.field("l_discount") <= 0.07)
            & (pds.field("l_quantity") < 24.0))
    li = _read(sf_dir, "lineitem",
               columns=["l_extendedprice", "l_discount"],
               predicate=pred)

    def fold(t: pa.Table) -> pa.Table:
        cents = np.rint(t.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        d = np.rint(t.column("l_discount")
                    .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        return pa.table({
            "revenue_u": pa.array([int((cents * d).sum())]),
            "n_rows": pa.array([len(t)])})

    from ray.data.aggregate import Sum

    out = li.map_batches(fold, batch_format="pyarrow").aggregate(
        Sum("revenue_u", alias_name="revenue_u"),
        Sum("n_rows", alias_name="n_rows"))
    return pd.DataFrame({
        "revenue_u": [int(out["sum(revenue_u)"]
                          if "sum(revenue_u)" in out
                          else out["revenue_u"])],
        "n_rows": [int(out["sum(n_rows)"] if "sum(n_rows)" in out
                       else out["n_rows"])]}).astype(np.int64)


def q_events_cusum(sf_dir: str, target: int = 5000,
                   threshold: int = 200_000):
    """Per-event-type CUSUM drift alarm over value cents (arrival
    order): S_t = max(0, S_{t-1} + cents - target), alarms where
    S > threshold — the classic changepoint monitor, distributed as
    an associative (sum, min-prefix) scan
    (sessions.grouped_cusum)."""
    from spapy_ray.stages.sessions import grouped_cusum

    ev = _read(sf_dir, "events",
               columns=["event_id", "event_type", "value"])

    def x(t: pa.Table) -> pa.Table:
        c = np.rint(t.column("value").to_numpy(zero_copy_only=False)
                    * 100.0).astype(np.int64) - target
        return pa.table({"event_type": t.column("event_type"),
                         "event_id": t.column("event_id"),
                         "x": pa.array(c)})

    out = grouped_cusum(ev.map_batches(x, batch_format="pyarrow"),
                        key_col="event_type", id_col="event_id",
                        x_col="x", threshold=threshold)
    return out.rename(columns={"k": "event_type"})


def q_events_pctl(sf_dir: str):
    """Interpolated percentile_cont, exact: per event type the p50
    (two-middle x2 convention) and the p90 as p90_x10 =
    v[lo]*(10-r) + v[hi]*r over cents, with pos = 0.9*(n-1) split
    into lo = 9(n-1)//10 and r = 9(n-1)%10 — pure integers, no
    interpolation-convention ambiguity (the percentile_cont
    complement of the quantile_disc family)."""
    from spapy_ray.stages.relational import bucketed_group_agg

    ev = _read(sf_dir, "events", columns=["event_type", "value"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t.column("event_type"),
            "c": pa.array(np.rint(
                t.column("value").to_numpy(zero_copy_only=False)
                * 100.0).astype(np.int64))})

    def local(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, gg in g.groupby("event_type", sort=False):
            v = np.sort(gg["c"].to_numpy())
            n = len(v)
            p50x2 = int(v[(n - 1) // 2]) + int(v[n // 2])
            num = 9 * (n - 1)
            lo, r = num // 10, num % 10
            hi = min(lo + 1, n - 1)
            p90x10 = int(v[lo]) * (10 - r) + int(v[hi]) * r
            rows.append((k, n, p50x2, p90x10))
        return pd.DataFrame(rows, columns=["event_type", "n",
                                           "p50_x2", "p90_x10"]) \
            .astype({"n": np.int64, "p50_x2": np.int64,
                     "p90_x10": np.int64})

    return bucketed_group_agg(
        ev.map_batches(cents, batch_format="pyarrow"),
        "event_type", local)


def q_weekend_drift(sf_dir: str):
    """Per-event-type weekday-vs-weekend value drift: exact grouped
    two-sample KS numerators in ONE value-window shuffle for every
    segment (relational.grouped_two_sample_ks) — the segment-wise
    drift monitor next to the global value_drift."""
    from spapy_ray.stages.relational import grouped_two_sample_ks

    ev = _read(sf_dir, "events",
               columns=["event_type", "ts", "value"])

    def side(weekend: bool):
        def _f(t: pa.Table) -> pa.Table:
            us = pc.cast(t.column("ts"), pa.int64()).to_numpy()
            dow = (us // 86_400_000_000 + 4) % 7
            m = np.isin(dow, (0, 6)) == weekend
            c = np.rint(t.column("value")
                        .to_numpy(zero_copy_only=False)[m] * 100.0) \
                .astype(np.int64)
            et = t.column("event_type").filter(pa.array(m))
            return pa.table({"event_type": et, "c": pa.array(c)})
        return _f

    a = ev.map_batches(side(False), batch_format="pyarrow")
    b = ev.map_batches(side(True), batch_format="pyarrow")
    return grouped_two_sample_ks(a, b, "event_type", "c")


def q_events_autocorr(sf_dir: str):
    """Lag-1 autocorrelation of event values per type: one window
    shuffle produces (prev, cur) cents pairs, then the exact integer
    sufficient-statistics fold (relational.grouped_corr_int,
    floor-quantized corr^2, HUGEINT-twin-exact)."""
    from spapy_ray.stages.relational import grouped_corr_int
    from spapy_ray.stages.window import window_over

    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64())
        cents = pc.cast(pc.floor(pc.add(
            pc.multiply(t.column("value"), pa.scalar(100.0)),
            pa.scalar(0.5))), pa.int64())
        return pa.table({"event_id": t.column("event_id"),
                         "event_type": t.column("event_type"),
                         "us": us, "cents": cents})

    w = window_over(ev.map_batches(prep, batch_format="pyarrow"),
                    key_col="event_type", order_cols=["us", "event_id"],
                    keep_cols=["cents"],
                    ops=[("prev", "lag", "cents")])

    def pairs(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("prev")))
        return pa.table({"event_type": t.column("event_type"),
                         "xi": pc.cast(t.column("prev"), pa.int64()),
                         "yi": t.column("cents")})

    return grouped_corr_int(w.map_batches(pairs, batch_format="pyarrow"),
                            ["event_type"], "xi", "yi",
                            scale_x=1, scale_y=1)


def q_media_chunk_dedup(sf_dir: str):
    """Content-addressed chunk-store audit: the 256-byte payload
    chunks (q_media_chunks) dedup by (signature, length) — the
    copies histogram reports, per duplication count, how many
    distinct chunks / physical vs logical bytes a content-addressed
    store would hold. Two bucketed groupbys, final table tiny."""
    from spapy_ray.pipelines.q_media import q_media_chunks
    from spapy_ray.stages.relational import bucketed_group_agg

    chunks = q_media_chunks(sf_dir).select_columns(["sig", "n_bytes"])

    def local(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["sig", "n_bytes"], sort=False).size() \
            .reset_index(name="copies")
        return g

    sigs = bucketed_group_agg(chunks, "sig", local)

    def hist(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        if "copies" not in df.columns:
            df = pd.DataFrame({"n_bytes": np.empty(0, np.int64),
                               "copies": np.empty(0, np.int64)})
        g = df.groupby("copies", sort=False).agg(
            n_sigs=("copies", "size"),
            bytes_stored=("n_bytes", "sum")).reset_index()
        g["n_chunks"] = g["copies"] * g["n_sigs"]
        g["bytes_logical"] = g["copies"] * g["bytes_stored"]
        return pa.Table.from_pandas(g, preserve_index=False)

    out = sigs.map_batches(hist, batch_format="pyarrow").to_pandas()
    out = out.groupby("copies", as_index=False).sum()
    return out[["copies", "n_sigs", "n_chunks", "bytes_stored",
                "bytes_logical"]].sort_values("copies") \
        .reset_index(drop=True).astype(np.int64)


def q_importance_sample(sf_dir: str):
    """Deterministic importance sampling (the data-mixing primitive:
    keep a row with probability proportional to its weight, decided
    by a hash — reproducible across runs and engines, no RNG state):
    lineitem rows keep iff fnv(key) % 100000 < qty100 * 20 (p =
    quantity/50). Per-returnflag audit of kept rows vs totals; the
    expected-vs-actual ratio is the sampler's own bias check."""
    ev = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_quantity",
                        "l_returnflag"])

    def partial(t: pa.Table) -> pa.Table:
        from spapy_ray.kernels.hashing import fnv1a64

        key = (t.column("l_orderkey").to_numpy(zero_copy_only=False)
               .astype(np.int64) * 16
               + t.column("l_linenumber").to_numpy(zero_copy_only=False))
        h = fnv1a64(pa.array(key.astype(str)))
        q100 = np.rint(t.column("l_quantity")
                       .to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        keep = (h % np.uint64(100000)).astype(np.int64) < q100 * 20
        rf = t.column("l_returnflag").to_pandas()
        df = pd.DataFrame({"l_returnflag": rf, "q": q100,
                           "k": keep.astype(np.int64),
                           "qk": np.where(keep, q100, 0)})
        g = df.groupby("l_returnflag", sort=False).agg(
            n_total=("k", "size"), n_kept=("k", "sum"),
            qty100_total=("q", "sum"),
            qty100_kept=("qk", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    cols = ["n_total", "n_kept", "qty100_total", "qty100_kept"]
    out = ev.map_batches(partial, batch_format="pyarrow") \
        .groupby("l_returnflag") \
        .aggregate(*[Sum(c, alias_name=c) for c in cols]).to_pandas()
    for c in cols:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("l_returnflag").reset_index(drop=True)


def q_events_dense_rank(sf_dir: str):
    """DENSE_RANK of the value (cents) within each event type — the
    remaining standard window function (rank by VALUE with shared
    tie ranks, no gaps), one hash-bucket shuffle like every
    window_over kind."""
    from spapy_ray.stages.window import window_over

    ev = _read(sf_dir, "events",
               columns=["event_id", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.add(
            pc.multiply(t.column("value"), pa.scalar(100.0)),
            pa.scalar(0.5))), pa.int64())
        return pa.table({"event_id": t.column("event_id"),
                         "event_type": t.column("event_type"),
                         "cents": cents})

    return window_over(ev.map_batches(prep, batch_format="pyarrow"),
                       key_col="event_type", order_cols=["event_id"],
                       keep_cols=["cents"],
                       ops=[("vrank", "dense_rank", "cents")])


def q_user_overlap_sketch(sf_dir: str, k: int = 64):
    """KMV/theta distinct sketches of weekday vs weekend user sets +
    their intersection estimate (relational.kmv_sketch_overlap) —
    the sketch family member HLL cannot provide (register maxima
    union but never intersect). Deterministic k-smallest-hash
    semantics make every number SQL-twin-exact; the exact
    intersection rides along as the calibration column."""
    from spapy_ray.stages.relational import kmv_sketch_overlap

    ev = _read(sf_dir, "events", columns=["ts", "user_id"])

    def side(weekend: bool):
        def _f(t: pa.Table) -> pa.Table:
            us = pc.cast(t.column("ts"), pa.int64()).to_numpy()
            dow = (us // 86_400_000_000 + 4) % 7
            m = np.isin(dow, (0, 6)) == weekend
            return pa.table({"user_id": t.column("user_id")
                             .filter(pa.array(m))})
        return _f

    a = ev.map_batches(side(False), batch_format="pyarrow")
    b = ev.map_batches(side(True), batch_format="pyarrow")
    return kmv_sketch_overlap(a, b, "user_id", k=k)


def q_frequent_triples(sf_dir: str):
    """Market-basket 3-itemsets (the Apriori level above
    copurchase_pairs): top-30 part triples co-ordered in one order,
    support >= 2 — batched per-basket-size combination emission, one
    basket shuffle + one smallest-member count shuffle
    (relational.frequent_triples)."""
    from spapy_ray.stages.relational import frequent_triples

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def ints(t: pa.Table) -> pa.Table:
        return pa.table({
            "o": pc.cast(t.column("l_orderkey"), pa.int64()),
            "p": pc.cast(t.column("l_partkey"), pa.int64())})

    return frequent_triples(li.map_batches(ints, batch_format="pyarrow"),
                            "o", "p", min_support=2, k=30)


def q_cust_order_histogram(sf_dir: str):
    """TPC-H Q13 shape — customer order-count distribution including
    the zero bucket: per-customer counts via the bucketed combiner,
    histogram via a second tiny count fold; zero-order customers =
    total customers (parquet metadata, no scan) minus distinct
    ordering customers — the LEFT JOIN is never materialized."""
    import pyarrow.parquet as pq

    from spapy_ray.stages.relational import pre_aggregated_count

    orders = _read(sf_dir, "orders", columns=["o_custkey"])
    per_cust = pre_aggregated_count(orders, "o_custkey", alias="n_orders")
    hist = pre_aggregated_count(per_cust, "n_orders", alias="n_custs") \
        .to_pandas()
    hist["n_orders"] = hist["n_orders"].astype(np.int64)
    hist["n_custs"] = hist["n_custs"].astype(np.int64)
    total = pq.ParquetFile(f"{sf_dir}/customer.parquet").metadata.num_rows
    missing = int(total) - int(hist["n_custs"].sum())
    if missing > 0:
        hist = pd.concat([hist, pd.DataFrame(
            {"n_orders": [np.int64(0)], "n_custs": [np.int64(missing)]})],
            ignore_index=True)
    return hist.sort_values("n_orders").reset_index(drop=True)


def q_top_supplier(sf_dir: str):
    """TPC-H Q15 shape — top supplier(s) by 1996-H1 shipped revenue,
    ties kept: date predicate pushed into the scan, per-supplier
    exact integer revenue_u = cents x (100 - disc_pct) combiner
    partials, one tiny groupby (supplier is the small dimension),
    global max + tie filter on the driver."""
    import pyarrow.dataset as pds
    import pyarrow.parquet as pq

    from ray.data.aggregate import Sum

    t0, t1 = pd.Timestamp("1996-01-01"), pd.Timestamp("1996-07-01")
    li = _read(sf_dir, "lineitem",
               columns=["l_suppkey", "l_extendedprice", "l_discount"],
               predicate=(pds.field("l_shipdate") >= t0)
               & (pds.field("l_shipdate") < t1))

    def partial(t: pa.Table) -> pa.Table:
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cents = np.rint(t.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        d = np.rint(t.column("l_discount")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        rev = cents * (100 - d)
        u, inv = np.unique(sk, return_inverse=True)
        s = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, rev)
        return pa.table({"s_suppkey": pa.array(u), "revenue_u": pa.array(s)})

    per_sup = li.map_batches(partial, batch_format="pyarrow") \
        .groupby("s_suppkey") \
        .aggregate(Sum("revenue_u", alias_name="revenue_u")).to_pandas()
    per_sup["revenue_u"] = per_sup["revenue_u"].astype(np.int64)
    best = per_sup[per_sup["revenue_u"] == per_sup["revenue_u"].max()]

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name"]).to_pandas()
    sup["s_suppkey"] = sup["s_suppkey"].astype(np.int64)
    best = best.copy()
    best["s_suppkey"] = best["s_suppkey"].astype(np.int64)
    out = best.merge(sup, on="s_suppkey")
    return out[["s_suppkey", "s_name", "revenue_u"]] \
        .sort_values("s_suppkey").reset_index(drop=True)


def q_session_overlap_pairs(sf_dir: str):
    """Concurrent-session pair count: gap-sessionize the events log,
    then count overlapping session pairs WITHOUT the quadratic self
    join (stages/sessions.interval_overlap_pairs — rank-sum identity
    over one value-window co-partition)."""
    import ray.data as rd

    from spapy_ray.stages.sessions import interval_overlap_pairs, \
        sessionize

    ev = _read(sf_dir, "events", columns=["user_id", "ts"])
    sess = sessionize(ev)
    return interval_overlap_pairs(sess, "session_start_us",
                                  "session_end_us")


def q_price_exact_median(sf_dir: str):
    """Exact global median of lineitem price cents WITHOUT a global
    sort: two-pass distributed radix selection
    (relational.radix_exact_ranks) — bucket histogram, driver rank
    location, filtered re-scan of one bucket. median_x2 = v[(n-1)//2]
    + v[n//2], the engine-wide two-middle convention."""
    from spapy_ray.stages.relational import radix_exact_ranks

    lf = _read(sf_dir, "lineitem", columns=["l_extendedprice"])

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({"cents": pa.array(_cents(
            t.column("l_extendedprice")))})

    vals, total = radix_exact_ranks(
        lf.map_batches(proj, batch_format="pyarrow"), "cents",
        lambda n: [(n - 1) // 2, n // 2])
    return pa.table({
        "n": pa.array([total], type=pa.int64()),
        "median_x2": pa.array([vals[0] + vals[1]], type=pa.int64())})


def q_cust_cohort_ltv(sf_dir: str):
    """Cohort lifetime-value curves: cohort = month of first order,
    k = months since cohort, cumulative revenue per cohort over k.
    First-month per customer via a min-combiner, cohort map broadcast
    once (ray.put), (cohort, k) revenue through the sum combiner, the
    tiny cohort×k table cumsums on the driver."""
    import ray
    from ray.data.aggregate import Min

    from spapy_ray.stages.relational import pre_aggregated_sums

    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def proj(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate").to_numpy(zero_copy_only=False)
        ym = d.astype("datetime64[M]").astype(np.int64)
        return pa.table({
            "c": pc.cast(t.column("o_custkey"), pa.int64()),
            "ym": pa.array(ym),
            "cents": pa.array(_cents(t.column("o_totalprice")))})

    o = orders.map_batches(proj, batch_format="pyarrow")

    def pmin(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("c", sort=False)["ym"].min().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    first = o.select_columns(["c", "ym"]) \
        .map_batches(pmin, batch_format="pyarrow") \
        .groupby("c").aggregate(Min("ym", alias_name="coh")) \
        .to_pandas()
    coh_map = dict(zip(first["c"].astype(np.int64),
                       first["coh"].astype(np.int64)))
    nc = first.groupby("coh").size().to_dict()
    ref = ray.put(coh_map)

    def att(t: pa.Table, _ref=ref) -> pa.Table:
        mm = ray.get(_ref)
        c = t.column("c").to_numpy(zero_copy_only=False)
        coh = pd.Series(c).map(mm).to_numpy(dtype=np.int64)
        ym = t.column("ym").to_numpy(zero_copy_only=False)
        return pa.table({"cohort_ym": pa.array(coh),
                         "k": pa.array(ym - coh),
                         "cents": t.column("cents")})

    rev = pre_aggregated_sums(
        o.map_batches(att, batch_format="pyarrow"),
        ["cohort_ym", "k"], ["cents"]).to_pandas() \
        .sort_values(["cohort_ym", "k"], kind="stable")
    rev["rev_cents"] = rev["cents"].astype(np.int64)
    rev["cum_cents"] = rev.groupby("cohort_ym")["rev_cents"].cumsum()
    rev["n_custs"] = rev["cohort_ym"].map(nc).astype(np.int64)
    out = rev[["cohort_ym", "k", "n_custs", "rev_cents", "cum_cents"]]
    return out.reset_index(drop=True).astype(
        {"cohort_ym": np.int64, "k": np.int64, "cum_cents": np.int64})


def q_events_sax(sf_dir: str, w: int = 8):
    """SAX symbolization of each user's value series (the
    time-series-mining index form): PAA segments of w events, symbol
    by integer cross-multiplied mean thresholds (sum < B·n, no
    division), per-user ordered symbol string. One window shuffle for
    ranks, one (user, seg) sum combiner, one bucketed ordered-concat
    fold."""
    from spapy_ray.stages.relational import (bucketed_group_agg,
                                             pre_aggregated_sums)
    from spapy_ray.stages.window import window_over

    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "value"])

    def proj(t: pa.Table) -> pa.Table:
        cents = np.rint(t.column("value").to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({
            "user_id": pc.cast(t.column("user_id"), pa.int64()),
            "us": pc.cast(t.column("ts"), pa.int64()),
            "event_id": pc.cast(t.column("event_id"), pa.int64()),
            "cents": pa.array(cents)})

    ranked = window_over(ev.map_batches(proj, batch_format="pyarrow"),
                         key_col="user_id",
                         order_cols=["us", "event_id"],
                         ops=[("rn", "row_number", None)],
                         keep_cols=["cents"])

    def seg(t: pa.Table) -> pa.Table:
        rn = t.column("rn").to_numpy(zero_copy_only=False)
        return pa.table({"user_id": t.column("user_id"),
                         "seg": pa.array((rn - 1) // w),
                         "cents": t.column("cents")})

    sums = pre_aggregated_sums(
        ranked.map_batches(seg, batch_format="pyarrow"),
        ["user_id", "seg"], ["cents"], count_alias="n")

    B1, B2, B3 = 1500, 3600, 7200

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g["cents"].to_numpy().astype(np.int64)
        n = g["n"].to_numpy().astype(np.int64)
        sym = np.where(s < B1 * n, "a",
                       np.where(s < B2 * n, "b",
                                np.where(s < B3 * n, "c", "d")))
        df = pd.DataFrame({"user_id": g["user_id"].to_numpy(),
                           "seg": g["seg"].to_numpy(), "sym": sym}) \
            .sort_values(["user_id", "seg"], kind="stable")
        out = df.groupby("user_id", sort=False)["sym"] \
            .agg(["size", "".join]).reset_index()
        out.columns = ["user_id", "n_segs", "sax"]
        return out.astype({"n_segs": np.int64})

    return bucketed_group_agg(sums, "user_id", fold)


def q_events_cume_dist(sf_dir: str):
    """cume_dist as exact integers (the last of the SQL window-rank
    family: row_number / dense_rank / percent_rank / ntile are
    elsewhere): per user, cume_n = #rows with value <= v (peers
    INCLUDED — a searchsorted over the bucket-sorted values, not a
    row_number), n = group size. One bucketed shuffle."""
    from spapy_ray.stages.relational import bucketed_group_agg

    ev = _read(sf_dir, "events",
               columns=["event_id", "user_id", "value"])

    def proj(t: pa.Table) -> pa.Table:
        cents = np.rint(t.column("value").to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({
            "user_id": pc.cast(t.column("user_id"), pa.int64()),
            "event_id": pc.cast(t.column("event_id"), pa.int64()),
            "cents": pa.array(cents)})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({c: pd.array([], dtype=np.int64)
                                 for c in ("user_id", "event_id",
                                           "cents", "cume_n", "n")})
        df = df.sort_values(["user_id", "cents"], kind="stable")
        u = df["user_id"].to_numpy()
        v = df["cents"].to_numpy()
        first = np.r_[True, u[1:] != u[:-1]]
        gid = np.cumsum(first) - 1
        # within each sorted group, cume_n(v) = index of the LAST
        # occurrence of v (peers included) + 1 - group start
        starts = np.nonzero(first)[0]
        idx = np.arange(len(v))
        run_start = np.r_[True, (v[1:] != v[:-1]) | first[1:]]
        rid = np.cumsum(run_start) - 1
        run_end = np.zeros(rid[-1] + 1, dtype=np.int64)
        np.maximum.at(run_end, rid, idx)
        cume = run_end[rid] + 1 - starts[gid]
        n = np.diff(np.r_[starts, len(v)])[gid]
        return pd.DataFrame({
            "user_id": u, "event_id": df["event_id"].to_numpy(),
            "cents": v, "cume_n": cume, "n": n}).astype(
                {c: np.int64 for c in ("cume_n", "n")})

    return bucketed_group_agg(
        ev.map_batches(proj, batch_format="pyarrow"), "user_id", fold)


def q_duplicate_orders(sf_dir: str, max_gap_days: int = 30):
    """Rapid-reorder audit: consecutive orders by the same customer
    within 30 days (the double-charge / accidental-resubmit check a
    billing pipeline runs — amounts attached so downstream can score
    similarity). One customer-bucketed shuffle; adjacent-pair
    emission inside a vectorized sorted walk."""
    from spapy_ray.stages.relational import bucketed_group_agg

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate",
                            "o_totalprice"])

    def proj(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate").to_numpy(zero_copy_only=False)
        return pa.table({
            "c": pc.cast(t.column("o_custkey"), pa.int64()),
            "cents": pa.array(_cents(t.column("o_totalprice"))),
            "day": pa.array(d.astype("datetime64[D]")
                            .astype(np.int64)),
            "ok": pc.cast(t.column("o_orderkey"), pa.int64())})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["o_custkey", "ok1", "ok2", "gap_days", "diff_cents"]
        if len(df) == 0:
            return pd.DataFrame({c: pd.array([], dtype=np.int64)
                                 for c in cols})
        df = df.sort_values(["c", "day", "ok"], kind="stable")
        c = df["c"].to_numpy()
        ce = df["cents"].to_numpy()
        day = df["day"].to_numpy()
        ok = df["ok"].to_numpy()
        same = c[1:] == c[:-1]
        gap = day[1:] - day[:-1]
        m = same & (gap <= max_gap_days)
        return pd.DataFrame({
            "o_custkey": c[1:][m],
            "ok1": ok[:-1][m], "ok2": ok[1:][m],
            "gap_days": gap[m],
            "diff_cents": np.abs(ce[1:][m] - ce[:-1][m])}) \
            .astype(np.int64)

    return bucketed_group_agg(
        orders.map_batches(proj, batch_format="pyarrow"), "c", fold)


def q_events_seasonal_error(sf_dir: str, season: int = 24):
    """Forecast-baseline evaluation (the MASE denominators): per
    event type over the DENSE global hour range, naive error
    Σ|c_t − c_{t−1}| and seasonal-naive error Σ|c_t − c_{t−24}| —
    missing hours count as zero (a forecast still has to predict
    them). Hour counts via the combiner; the dense ~720×types fold is
    driver-side by design (bounded by the calendar, not the data)."""
    from spapy_ray.stages.relational import pre_aggregated_sums

    ev = _read(sf_dir, "events", columns=["ts", "event_type"])

    def proj(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({"event_type": t.column("event_type"),
                         "hr": pa.array(us // 3_600_000_000)})

    c = pre_aggregated_sums(
        ev.map_batches(proj, batch_format="pyarrow"),
        ["event_type", "hr"], [], count_alias="n").to_pandas()
    c["n"] = c["n"].astype(np.int64)
    c["hr"] = c["hr"].astype(np.int64)
    h0, h1 = int(c["hr"].min()), int(c["hr"].max())
    span = h1 - h0 + 1
    rows = []
    for et, g in c.groupby("event_type", sort=True):
        dense = np.zeros(span, dtype=np.int64)
        dense[g["hr"].to_numpy() - h0] = g["n"].to_numpy()
        naive = int(np.abs(np.diff(dense)).sum())
        seas = int(np.abs(dense[season:] - dense[:-season]).sum()) \
            if span > season else 0
        rows.append((et, span, int(dense.sum()), naive, seas))
    out = pd.DataFrame(rows, columns=["event_type", "n_hours",
                                      "n_events", "naive_err",
                                      "seasonal_err"])
    return out.astype({c_: np.int64 for c_ in out.columns[1:]})


def q_events_seasonal_anomaly(sf_dir: str, season: int = 24,
                              k: int = 3):
    """Seasonal anomaly detection — the composition a monitoring
    pipeline runs: seasonal-naive residuals r_t = c_t − c_{t−24} over
    the dense hourly grid, robust median/MAD gate per type in the
    engine-wide x2/x4 integer convention (anomaly ⟺ 2·|2r − med_x2|
    > k·mad_x4). Counts via the combiner; the calendar-bounded dense
    fold is driver-side by design."""
    from spapy_ray.stages.relational import pre_aggregated_sums

    ev = _read(sf_dir, "events", columns=["ts", "event_type"])

    def proj(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({"event_type": t.column("event_type"),
                         "hr": pa.array(us // 3_600_000_000)})

    c = pre_aggregated_sums(
        ev.map_batches(proj, batch_format="pyarrow"),
        ["event_type", "hr"], [], count_alias="n").to_pandas()
    c["n"] = c["n"].astype(np.int64)
    c["hr"] = c["hr"].astype(np.int64)
    h0, h1 = int(c["hr"].min()), int(c["hr"].max())
    span = h1 - h0 + 1
    rows = []
    for et, g in c.groupby("event_type", sort=True):
        dense = np.zeros(span, dtype=np.int64)
        dense[g["hr"].to_numpy() - h0] = g["n"].to_numpy()
        if span <= season:
            rows.append((et, 0, 0, 0, 0))
            continue
        r = dense[season:] - dense[:-season]
        n = len(r)
        s = np.sort(r)
        med2 = int(s[(n - 1) // 2] + s[n // 2])
        d = np.sort(np.abs(2 * r - med2))
        mad4 = int(d[(n - 1) // 2] + d[n // 2])
        anom = int((2 * np.abs(2 * r - med2) > k * mad4).sum())
        rows.append((et, n, med2, mad4, anom))
    out = pd.DataFrame(rows, columns=["event_type", "n_resid",
                                      "med_x2", "mad_x4", "n_anom"])
    return out.astype({c_: np.int64 for c_ in out.columns[1:]})


def q_events_runs_test(sf_dir: str):
    """Wald–Wolfowitz runs statistic per user (the randomness audit
    for metric streams): values split above/below the user median
    (x2 convention, median-equal values count as 'below'), runs =
    1 + sign transitions in time order. All integers; one bucketed
    shuffle, vectorized fold."""
    from spapy_ray.stages.relational import bucketed_group_agg

    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "value"])

    def proj(t: pa.Table) -> pa.Table:
        cents = np.rint(t.column("value").to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({
            "user_id": pc.cast(t.column("user_id"), pa.int64()),
            "us": pc.cast(t.column("ts"), pa.int64()),
            "event_id": pc.cast(t.column("event_id"), pa.int64()),
            "cents": pa.array(cents)})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "n", "n_above", "n_runs"]
        if len(df) == 0:
            return pd.DataFrame({c: pd.array([], dtype=np.int64)
                                 for c in cols})
        df = df.sort_values(["user_id", "us", "event_id"],
                            kind="stable")
        u = df["user_id"].to_numpy()
        v = df["cents"].to_numpy()
        first = np.r_[True, u[1:] != u[:-1]]
        # per-user median_x2 via a value-sorted view
        o = np.lexsort((v, u))
        uv, vv = u[o], v[o]
        f2 = np.r_[True, uv[1:] != uv[:-1]]
        st = np.nonzero(f2)[0]
        n = np.diff(np.r_[st, len(uv)]).astype(np.int64)
        med2 = vv[st + (n - 1) // 2] + vv[st + n // 2]
        med_of = dict(zip(uv[st], med2))
        m = pd.Series(u).map(med_of).to_numpy(dtype=np.int64)
        above = (2 * v > m)
        trans = (~first[1:]) & (above[1:] != above[:-1])
        gid = np.cumsum(first) - 1
        runs = np.ones(int(gid[-1]) + 1, dtype=np.int64)
        np.add.at(runs, gid[1:][trans], 1)
        n_above = np.zeros(len(runs), dtype=np.int64)
        np.add.at(n_above, gid, above.astype(np.int64))
        cnt = np.zeros(len(runs), dtype=np.int64)
        np.add.at(cnt, gid, 1)
        return pd.DataFrame({
            "user_id": u[first], "n": cnt, "n_above": n_above,
            "n_runs": runs}).astype({c: np.int64 for c in cols[1:]})

    return bucketed_group_agg(
        ev.map_batches(proj, batch_format="pyarrow"),
        "user_id", fold)


def q_delta_view_merge(sf_dir: str, split_day: int = 20):
    """Incremental view maintenance check: the per-type aggregate
    maintained as BASE (days < 20) ⊕ DELTA (days >= 20) — two
    independent combiner folds merged by addition — must equal the
    full recompute, which is exactly what the twin computes. The
    mergeability demo behind every incremental pipeline here."""
    import pyarrow.dataset as pds

    from spapy_ray.stages.relational import pre_aggregated_sums

    cut = pd.Timestamp("2024-01-01") + pd.Timedelta(days=split_day)

    def agg(pred):
        ev = _read(sf_dir, "events", columns=["event_type", "value"],
                   predicate=pred)

        def proj(t: pa.Table) -> pa.Table:
            cents = np.rint(t.column("value").to_numpy(
                zero_copy_only=False) * 100).astype(np.int64)
            return pa.table({"event_type": t.column("event_type"),
                             "cents": pa.array(cents)})

        out = pre_aggregated_sums(
            ev.map_batches(proj, batch_format="pyarrow"),
            ["event_type"], ["cents"], count_alias="n").to_pandas()
        return out.astype({"cents": np.int64, "n": np.int64})

    base = agg(pds.field("ts") < cut)
    delta = agg(pds.field("ts") >= cut)
    m = pd.concat([base, delta]).groupby("event_type", sort=True) \
        .sum().reset_index()
    m.columns = ["event_type", "sum_cents", "n_events"]
    return m.astype({"sum_cents": np.int64, "n_events": np.int64})


def q_value_qq_table(sf_dir: str, knots: int = 16):
    """Quantile–quantile mapping table between the weekday and
    weekend value distributions (the drift-diagnosis companion to
    the KS tests): 17 exact order statistics PER SIDE at ranks
    (n−1)·i//16, each side resolved by ONE radix-selection pair of
    passes (relational.radix_exact_ranks fetching all 17 ranks
    together) — no sort, no per-quantile scans."""
    from spapy_ray.stages.relational import radix_exact_ranks

    ev = _read(sf_dir, "events", columns=["ts", "value"])

    def proj(weekend: bool):
        def f(t: pa.Table) -> pa.Table:
            us = pc.cast(t.column("ts"), pa.int64()) \
                .to_numpy(zero_copy_only=False)
            wk = ((us // 86_400_000_000 + 4) % 7) >= 5
            cents = np.rint(t.column("value").to_numpy(
                zero_copy_only=False) * 100).astype(np.int64)
            keep = wk if weekend else ~wk
            return pa.table({"cents": pa.array(cents[keep])})
        return f

    def side(weekend: bool):
        ds = ev.map_batches(proj(weekend), batch_format="pyarrow")
        vals, n = radix_exact_ranks(
            ds, "cents",
            lambda m: [(m - 1) * i // knots
                       for i in range(knots + 1)])
        return vals, n

    wd, n_wd = side(False)
    we, n_we = side(True)
    return pd.DataFrame({
        "knot": np.arange(knots + 1, dtype=np.int64),
        "weekday_v": np.array(wd, dtype=np.int64),
        "weekend_v": np.array(we, dtype=np.int64)})


def q_events_hour_hhi(sf_dir: str):
    """Temporal concentration per event type: Herfindahl numerator
    Σ n_h² over the 24 hour-of-day bins (the log-free concentration
    index, same trick as user_type_hhi) — flags types that burst in
    narrow daily windows. One (type, hour) combiner, tiny fold."""
    from spapy_ray.stages.relational import pre_aggregated_sums

    ev = _read(sf_dir, "events", columns=["ts", "event_type"])

    def proj(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({"event_type": t.column("event_type"),
                         "hod": pa.array((us // 3_600_000_000) % 24)})

    c = pre_aggregated_sums(
        ev.map_batches(proj, batch_format="pyarrow"),
        ["event_type", "hod"], [], count_alias="n").to_pandas()
    c["n"] = c["n"].astype(np.int64)
    g = c.groupby("event_type", sort=True)
    out = pd.DataFrame({
        "event_type": [k for k, _ in g],
        "n_events": [int(gg["n"].sum()) for _, gg in g],
        "n_hours": [len(gg) for _, gg in g],
        "hhi_num": [int((gg["n"].to_numpy() ** 2).sum())
                    for _, gg in g]})
    return out.astype({"n_events": np.int64, "n_hours": np.int64,
                       "hhi_num": np.int64})
