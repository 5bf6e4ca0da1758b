"""Histogram-based supervised primitives.

The reference has no learning ops; these are the training-data-engine
additions (round-4 brief): the split-finding histogram is the core of
every distributed gradient-boosting / decision-tree system (XGBoost's
approx mode, LightGBM's feature histograms) and maps 1:1 onto the
combiner pattern — per-batch (feature_value → n, n_pos) partials, one
tiny groupby, and a driver fold over the distinct-value table.

Exactness: all counts are int64; the weighted-Gini objective is
reported as an exact integer (num, den) pair plus their float64 ratio.
Both engine and SQL twin compute ratio = double(num)/double(den) from
the same int64s, so the IEEE result is bit-identical and the argmin is
hash-stable. (int64 holds num for n up to ~1e6 rows per side at the
test scales; the partials themselves never overflow — a 100 TB run
would lift the fold to Python ints, which the driver-side fold already
is in spirit: it sees only distinct feature values.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _gini_fold(v: np.ndarray, n: np.ndarray, pos: np.ndarray):
    """Shared threshold fold over one feature's (value, n, n_pos)
    histogram (rows sorted by value): returns the per-threshold
    (values, nl, posl, nr, posr, score) arrays. score is the common-
    denominator weighted Gini as float64 of exact integers.

    num is O(n³): the int64 fast path is provably safe only while
    2·nt³ < 2^63 (nt ≤ ~1.66e6 rows); beyond that the fold switches
    to Python-bigint (object-dtype) arithmetic — exact at any nt,
    with the same double(num)/double(den) rounding as the HUGEINT
    SQL twin (cast each exact integer to float64, then divide)."""
    nl = np.cumsum(n)[:-1]
    posl = np.cumsum(pos)[:-1]
    nt, pt = int(n.sum()), int(pos.sum())
    nr = nt - nl
    posr = pt - posl
    negl = nl - posl
    negr = nr - posr
    if 2 * nt ** 3 < 2 ** 63:
        num = ((nl * nl - posl * posl - negl * negl) * nr
               + (nr * nr - posr * posr - negr * negr) * nl)
        den = nl * nr
        score = num.astype(np.float64) / den.astype(np.float64)
        return v[:-1], nl, posl, nr, posr, score
    onl, oposl = nl.astype(object), posl.astype(object)
    onr, oposr = nr.astype(object), posr.astype(object)
    onegl, onegr = negl.astype(object), negr.astype(object)
    num = ((onl * onl - oposl * oposl - onegl * onegl) * onr
           + (onr * onr - oposr * oposr - onegr * onegr) * onl)
    den = onl * onr
    score = (np.array([float(x) for x in num], dtype=np.float64)
             / np.array([float(x) for x in den], dtype=np.float64))
    return v[:-1], nl, posl, nr, posr, score


def best_split_gini(ds, feature_col: str, label_col: str) -> pa.Table:
    """Exact decision-stump split on an integer feature vs a 0/1
    label: minimize weighted Gini impurity over thresholds
    ``feature <= v``.

    score(v) = [(nl² - posl² - negl²)·nr + (nr² - posr² - negr²)·nl]
               / (nl·nr)
    which is nl·nr times ... /: the usual nl·gini_l + nr·gini_r scaled
    by the common denominator, so the argmin is unchanged. Ties break
    to the smallest feature value.

    Returns a ONE-ROW pa.Table:
      (split_at, n_left, pos_left, n_right, pos_right, score).
    """
    from spapy_ray.stages.relational import pre_aggregated_sums

    agg = pre_aggregated_sums(ds.select_columns([feature_col, label_col]),
                              [feature_col], [label_col],
                              count_alias="__n")
    df = agg.to_pandas().sort_values(feature_col, kind="stable")
    v = df[feature_col].to_numpy().astype(np.int64)
    n = df["__n"].to_numpy().astype(np.int64)
    pos = df[label_col].to_numpy().astype(np.int64)
    if len(v) < 2:
        raise ValueError("best_split_gini needs >= 2 distinct "
                         f"{feature_col!r} values")
    vv, nl, posl, nr, posr, score = _gini_fold(v, n, pos)
    i = int(np.lexsort((vv, score))[0])
    return pa.table({
        "split_at": pa.array([int(vv[i])], type=pa.int64()),
        "n_left": pa.array([int(nl[i])], type=pa.int64()),
        "pos_left": pa.array([int(posl[i])], type=pa.int64()),
        "n_right": pa.array([int(nr[i])], type=pa.int64()),
        "pos_right": pa.array([int(posr[i])], type=pa.int64()),
        "score": pa.array([float(score[i])], type=pa.float64()),
    })


def best_feature_gini(ds, feature_cols: list[str],
                      label_col: str) -> pa.Table:
    """Root-node FEATURE SELECTION across several integer features in
    ONE pass (the level-0 step of distributed tree growing): each
    batch melts to (feature, value, n, n_pos) partials for every
    feature at once, a single tiny groupby folds all histograms, and
    the driver runs the threshold fold per feature and takes the
    global argmin (ties: score, then feature name, then value).

    Returns a ONE-ROW pa.Table: (feature, split_at, n_left, pos_left,
    n_right, pos_right, score).
    """
    from spapy_ray.stages.relational import pre_aggregated_sums

    def melt(t: pa.Table) -> pa.Table:
        y = t.column(label_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        fs, vs, ys = [], [], []
        for f in feature_cols:
            x = t.column(f).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            fs.append(np.full(len(x), f, dtype=object))
            vs.append(x)
            ys.append(y)
        return pa.table({
            "feature": pa.array(np.concatenate(fs), type=pa.string()),
            "v": pa.array(np.concatenate(vs)),
            "y": pa.array(np.concatenate(ys))})

    agg = pre_aggregated_sums(
        ds.select_columns(list(feature_cols) + [label_col])
        .map_batches(melt, batch_format="pyarrow"),
        ["feature", "v"], ["y"], count_alias="__n").to_pandas() \
        .sort_values(["feature", "v"], kind="stable")
    best = None
    for f in sorted(feature_cols):
        g = agg[agg["feature"] == f]
        v = g["v"].to_numpy().astype(np.int64)
        if len(v) < 2:
            continue
        vv, nl, posl, nr, posr, score = _gini_fold(
            v, g["__n"].to_numpy().astype(np.int64),
            g["y"].to_numpy().astype(np.int64))
        i = int(np.lexsort((vv, score))[0])
        cand = (float(score[i]), f, int(vv[i]), int(nl[i]),
                int(posl[i]), int(nr[i]), int(posr[i]))
        if best is None or cand < best:
            best = cand
    if best is None:
        raise ValueError("no feature has >= 2 distinct values")
    sc, f, v, nl, pl, nr, pr = best
    return pa.table({
        "feature": pa.array([f], type=pa.string()),
        "split_at": pa.array([v], type=pa.int64()),
        "n_left": pa.array([nl], type=pa.int64()),
        "pos_left": pa.array([pl], type=pa.int64()),
        "n_right": pa.array([nr], type=pa.int64()),
        "pos_right": pa.array([pr], type=pa.int64()),
        "score": pa.array([sc], type=pa.float64()),
    })


def grouped_moments(ds, key: str, val: str) -> pd.DataFrame:
    """Per-group skewness/kurtosis NUMERATORS from exact integer power
    sums (the one-pass mergeable form): partials ship (Σv, Σv², Σv³,
    Σv⁴) per key through the combiner, the tiny per-key fold runs in
    Python bigints, and the (huge) central-moment numerators

      m3_num = n²·S3 − 3n·S1·S2 + 2·S1³
      m4_num = n³·S4 − 4n²·S1·S3 + 6n·S1²·S2 − 3·S1⁴

    are reported as float64 of the exact integer — identical to the
    SQL twin's HUGEINT→DOUBLE cast (both round-to-nearest from the
    same integer).

    Overflow contract (fail-loud, never silent): per ELEMENT
    |v| ≤ 50000 so a single v⁴ fits int64, and per KEY the whole
    power-sum Σ|v|⁴ must stay below 2^62 — enforced with an
    order-independent float64 upper tracker shipped alongside the
    int64 partials (any int64 wrap in a batch partial or the global
    fold implies the per-key total tripped the tracker, because every
    partial is bounded by its key's total; Σ|v|⁴+n also upper-bounds
    every lower power since |v|^k ≤ v⁴+1 for k ≤ 4). The 2x margin to
    2^63 absorbs float summation error.

    Returns DataFrame(key, n, s1, s2, m3_num, m4_num).
    """
    from spapy_ray.stages.relational import pre_aggregated_sums

    def powers(t: pa.Table) -> pa.Table:
        x = t.column(val).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(x) and int(np.abs(x).max()) > 50_000:
            # a single v^4 must fit int64 — fail loud instead of
            # silently wrapping (the docstring contract)
            raise ValueError(
                f"grouped_moments values must satisfy |v| <= 50000; "
                f"got {int(np.abs(x).max())}")
        x4 = x ** 4
        return pa.table({key: t.column(key), "s1": pa.array(x),
                         "s2": pa.array(x * x), "s3": pa.array(x ** 3),
                         "s4": pa.array(x4),
                         "b4": pa.array(np.abs(x4).astype(np.float64))})

    agg = pre_aggregated_sums(
        ds.select_columns([key, val]).map_batches(
            powers, batch_format="pyarrow"),
        [key], ["s1", "s2", "s3", "s4", "b4"],
        count_alias="n").to_pandas()
    rows = []
    for r in agg.itertuples(index=False):
        k = getattr(r, key)
        n, s1, s2, s3, s4 = (int(r.n), int(r.s1), int(r.s2),
                             int(r.s3), int(r.s4))
        if float(r.b4) + n >= float(2 ** 62):
            # the int64 power sums for this key are no longer provably
            # un-wrapped — fail loud (sum bound, not element bound)
            raise ValueError(
                f"grouped_moments per-key power sums overflow: key "
                f"{k!r} has sum(|v|^4) ~ {float(r.b4):.3e} >= 2^62; "
                "reduce value magnitude or pre-scale")
        m3 = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 ** 3
        m4 = (n ** 3 * s4 - 4 * n * n * s1 * s3
              + 6 * n * s1 * s1 * s2 - 3 * s1 ** 4)
        rows.append((k, n, s1, s2, float(m3), float(m4)))
    out = pd.DataFrame(rows, columns=[key, "n", "s1", "s2",
                                      "m3_num", "m4_num"])
    return out.astype({"n": np.int64, "s1": np.int64, "s2": np.int64})
