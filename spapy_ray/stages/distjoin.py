"""Within-distance (range) spatial self-join over a point Dataset.

The reference's only distance machinery is per-pair Python
(SpaPy's nested overlay/relate loops, SpaVectors.py:964-983); Ray
Data has no range join at all. This stage supplies the missing
operator class the brief names ("range join") in its scale-safe form:

  1. fixed-point coords: lat5/lon5 = round(coord * 1e5) as int64, so
     the membership predicate dx5^2 + dy5^2 <= r5^2 is EXACT integer
     math, shared verbatim with the DuckDB oracle (no float epsilon);
  2. grid co-partition: cell width == radius, so every point within r
     of a home point lives in the home cell's 3x3 neighborhood.
     Home rows are tagged with their own cell; candidate copies are
     replicated to the 9 neighbor cells (narrow columns only);
  3. ONE shuffle on a hashed int bucket of the cell key (the
     bucketed_group_agg trick: B buckets, not |cells| groups — group
     count independent of grid resolution), per-cell slices separated
     again inside the bucket;
  4. per-cell numpy broadcast distance, chunked so the [home x cand]
     int64 matrix stays cache-sized.

100 TB notes: shuffle volume is 10 rows x ~50 bytes per input point
(key + 2 int64 + grouping ints), independent of text/html payload —
callers should project coords first and join results back by key if
they need payload columns. Hot cells (dense urban tiles) are salted
by splitting CANDIDATE copies across ``salt`` sub-buckets (home rows
replicated to each) and summing the per-key partial counts — counts
are additive over any candidate partition, so the result is exact for
every ``salt`` (tested salted == unsalted).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from spapy_ray.util import cluster_cpus

_MIX = np.uint64(0x9E3779B97F4A7C15)
_STRIDE = np.int64(1) << np.int64(32)


def _fixed5(col) -> np.ndarray:
    """float64 degrees → exact 1e-5 fixed-point int64.

    Inputs are exact multiples of 1e-5 by construction (sources/pages
    trailing-5 coords), so rint recovers the integer exactly.
    """
    v = col.to_numpy(zero_copy_only=False)
    return np.rint(v * 1e5).astype(np.int64)


def _grid(lat5: np.ndarray, lon5: np.ndarray, r5: int) -> tuple[np.ndarray, np.ndarray]:
    return (lon5 + 18_000_000) // r5, (lat5 + 8_500_000) // r5


def _cell_of(gx: np.ndarray, gy: np.ndarray) -> np.ndarray:
    # multiply+add (NOT bit-or): injective even when a neighbor index
    # goes to -1 at the grid edge
    return gx * _STRIDE + gy


def _bucket_of(cell: np.ndarray, sub: np.ndarray, salt: int, b: int) -> np.ndarray:
    k = (cell * np.int64(salt) + sub).astype(np.uint64)
    return (((k * _MIX) >> np.uint64(33)) % np.uint64(b)).astype(np.int64)


def _neutral_column(col, n: int):
    """A length-n column of col's type holding one repeated throwaway
    value (empty string / the first element) — same schema, ~zero
    payload bytes for variable-width types."""
    typ = col.type
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return pa.array([""] * n, type=typ)
    if pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
        return pa.array([b""] * n, type=typ)
    if n == 0 or len(col) == 0:
        return col.slice(0, 0)
    first = col.slice(0, 1)
    if isinstance(first, pa.ChunkedArray):
        first = first.combine_chunks()
    return pa.concat_arrays([first] * n)


def within_distance_count(ds, *, radius_deg: float,
                          key_cols: tuple[str, ...] = ("url", "warc_ts"),
                          lat_col: str = "lat", lon_col: str = "lon",
                          buckets: int | None = None, salt: int = 1,
                          count_col: str = "n_neighbors"):
    """Per-point count of OTHER points within ``radius_deg`` (planar
    euclidean on degrees, exact fixed-point predicate).

    Returns a Dataset of key_cols + ``count_col`` (int64), one row per
    input point (isolated points get 0).
    """
    r5 = int(round(radius_deg * 1e5))
    if r5 <= 0:
        raise ValueError("radius_deg must be >= 1e-5")
    if salt < 1:
        raise ValueError("salt must be >= 1")
    b = buckets or max(64, cluster_cpus() * 4)
    r5sq = r5 * r5
    key_cols = list(key_cols)

    def expand(t: pa.Table) -> pa.Table:
        lat5 = _fixed5(t.column(lat_col))
        lon5 = _fixed5(t.column(lon_col))
        n = len(lat5)
        gx, gy = _grid(lat5, lon5, r5)
        home_cell = _cell_of(gx, gy)
        parts = []
        # home rows: one per salt sub-bucket (each must see its
        # candidate subset); these carry the key columns
        for s in range(salt):
            sub = np.full(n, s, dtype=np.int64)
            parts.append(pa.table({
                **{k: t.column(k) for k in key_cols},
                "lat5": lat5, "lon5": lon5,
                "_bucket": _bucket_of(home_cell, sub, salt, b),
                "_cell": home_cell, "_sub": sub,
                "_home": np.ones(n, dtype=bool),
            }))
        # candidate copies: 3x3 neighborhood, each point's copies all
        # in ONE deterministic sub-bucket. Candidate key columns are
        # typed CONSTANTS (not nulls — a null int64 key would force
        # pandas to float64 inside map_groups and the output keys
        # would come back upcast; not the real values — shipping the
        # url string 9x was ~40% of the shuffle volume)
        csub = ((lat5.astype(np.uint64) * _MIX + lon5.astype(np.uint64))
                % np.uint64(salt)).astype(np.int64)
        keys = {k: _neutral_column(t.column(k), n) for k in key_cols}
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                ncell = _cell_of(gx + dx, gy + dy)
                parts.append(pa.table({
                    **keys,
                    "lat5": lat5, "lon5": lon5,
                    "_bucket": _bucket_of(ncell, csub, salt, b),
                    "_cell": ncell, "_sub": csub,
                    "_home": np.zeros(n, dtype=bool),
                }))
        return pa.concat_tables(parts)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # sort once, then walk (cell, sub) slices as raw numpy — a
        # pandas groupby here builds one sub-DataFrame per cell
        # (~1-2 ms each), which at ~10^4 occupied cells per dataset
        # dominated the stage (33 s → ~4 s at sf0.1)
        cell = df["_cell"].to_numpy()
        sub = df["_sub"].to_numpy()
        order = np.lexsort((sub, cell))
        cell, sub = cell[order], sub[order]
        lat = df["lat5"].to_numpy()[order]
        lon = df["lon5"].to_numpy()[order]
        home = df["_home"].to_numpy()[order]
        change = (np.diff(cell) != 0) | (np.diff(sub) != 0)
        starts = np.concatenate(([0], np.flatnonzero(change) + 1))
        ends = np.concatenate((starts[1:], [len(cell)]))
        keep_pos: list[np.ndarray] = []
        out_counts: list[np.ndarray] = []
        for s, e in zip(starts, ends):
            hm = home[s:e]
            if not hm.any():
                continue
            cd = ~hm
            counts = np.zeros(int(hm.sum()), dtype=np.int64)
            if cd.any():
                # compress duplicate coordinates on BOTH sides: equal
                # points share one matrix row/column (weights on the
                # candidate side, a gather on the home side) — ~2x in
                # dense cells where dup urls pin many keys to one point
                # bias to non-negative so the pack splits exactly
                # (distances are offset-invariant)
                pk = (lat[s:e] + np.int64(8_500_000)) * _STRIDE \
                    + (lon[s:e] + np.int64(18_000_000))
                hu, hidx = np.unique(pk[hm], return_inverse=True)
                ku, w = np.unique(pk[cd], return_counts=True)
                hlat, hlon = hu >> np.int64(32), hu & np.int64(0xFFFFFFFF)
                klat, klon = ku >> np.int64(32), ku & np.int64(0xFFFFFFFF)
                ucounts = np.zeros(len(hu), dtype=np.int64)
                # chunk the [home x cand] matrix to ~4M int64 cells
                step = max(1, 4_000_000 // len(ku))
                for i in range(0, len(hu), step):
                    dx = hlon[i:i + step, None] - klon[None, :]
                    dy = hlat[i:i + step, None] - klat[None, :]
                    ucounts[i:i + step] = \
                        ((dx * dx + dy * dy <= r5sq) * w).sum(axis=1)
                counts = ucounts[hidx]
            keep_pos.append(order[s:e][hm])
            out_counts.append(counts)
        if not keep_pos:
            res = df.loc[df.index[:0], key_cols].copy()
            res[count_col] = pd.Series(dtype=np.int64)
            return res
        res = df[key_cols].iloc[np.concatenate(keep_pos)] \
            .reset_index(drop=True)
        res[count_col] = np.concatenate(out_counts)
        return res

    grouped = ds.map_batches(expand, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(per_bucket, batch_format="pandas")

    def drop_self(t: pa.Table) -> pa.Table:
        # each point's own candidate copy is within r of itself exactly
        # once across all sub-buckets
        i = t.schema.get_field_index(count_col)
        return t.set_column(i, count_col,
                            pa.array(t.column(count_col).to_numpy() - 1))

    if salt == 1:
        return grouped.map_batches(drop_self, batch_format="pyarrow")

    # salt > 1: sum the per-sub-bucket partial counts, then drop self
    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(key_cols, as_index=False, sort=False)[count_col].sum()

    from spapy_ray.stages.relational import bucketed_group_agg
    folded = bucketed_group_agg(grouped, key_cols[0], fold)
    return folded.map_batches(drop_self, batch_format="pyarrow")


def within_distance_pairs(ds, *, radius_deg: float, key_col: str,
                          lat_col: str = "lat", lon_col: str = "lon",
                          buckets: int | None = None,
                          directed: bool = False):
    """The pair-returning form of the range join: (key_a, key_b,
    dist5sq) for every pair within ``radius_deg``; ``directed=False``
    keeps each unordered pair once (key_a < key_b).

    Same grid co-partition as within_distance_count — each candidate
    copy meets each home point in exactly one cell, so pairs are
    emitted exactly once per direction with no dedup shuffle. Output
    is a Dataset (at 100 TB the pair set itself can be huge; it
    streams straight to the consumer or a write)."""
    r5 = int(round(radius_deg * 1e5))
    if r5 <= 0:
        raise ValueError("radius_deg must be >= 1e-5")
    b = buckets or max(64, cluster_cpus() * 4)
    r5sq = r5 * r5

    def expand(t: pa.Table) -> pa.Table:
        lat5 = _fixed5(t.column(lat_col))
        lon5 = _fixed5(t.column(lon_col))
        gx, gy = _grid(lat5, lon5, r5)
        zero = np.zeros(len(lat5), dtype=np.int64)
        parts = [pa.table({
            key_col: t.column(key_col), "lat5": lat5, "lon5": lon5,
            "_bucket": _bucket_of(_cell_of(gx, gy), zero, 1, b),
            "_cell": _cell_of(gx, gy), "_home": np.ones(len(lat5), bool),
        })]
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                ncell = _cell_of(gx + dx, gy + dy)
                parts.append(pa.table({
                    key_col: t.column(key_col), "lat5": lat5, "lon5": lon5,
                    "_bucket": _bucket_of(ncell, zero, 1, b),
                    "_cell": ncell, "_home": np.zeros(len(lat5), bool),
                }))
        return pa.concat_tables(parts)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # numpy slice walk, same rationale as within_distance_count
        cell = df["_cell"].to_numpy()
        order = np.argsort(cell, kind="stable")
        cell = cell[order]
        lat = df["lat5"].to_numpy()[order]
        lon = df["lon5"].to_numpy()[order]
        home = df["_home"].to_numpy()[order]
        keys = df[key_col].to_numpy()[order]
        starts = np.concatenate(([0], np.flatnonzero(np.diff(cell)) + 1))
        ends = np.concatenate((starts[1:], [len(cell)]))
        out: list[pd.DataFrame] = []
        for s, e in zip(starts, ends):
            hm = home[s:e]
            cd = ~hm
            if not hm.any() or not cd.any():
                continue
            hlat, hlon, hkey = lat[s:e][hm], lon[s:e][hm], keys[s:e][hm]
            klat, klon, kkey = lat[s:e][cd], lon[s:e][cd], keys[s:e][cd]
            step = max(1, 4_000_000 // len(klat))
            for i in range(0, len(hlat), step):
                dx = hlon[i:i + step, None] - klon[None, :]
                dy = hlat[i:i + step, None] - klat[None, :]
                d2 = dx * dx + dy * dy
                hi, ki = np.nonzero(d2 <= r5sq)
                ka, kb = hkey[i:i + step][hi], kkey[ki]
                keep = ka != kb if directed else ka < kb
                out.append(pd.DataFrame({
                    "key_a": ka[keep], "key_b": kb[keep],
                    "dist5sq": d2[hi, ki][keep].astype(np.int64)}))
        if not out:
            return pd.DataFrame({
                "key_a": df[key_col].iloc[:0], "key_b": df[key_col].iloc[:0],
                "dist5sq": pd.Series(dtype=np.int64)})
        return pd.concat(out, ignore_index=True)

    return ds.map_batches(expand, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(per_bucket, batch_format="pandas")


def within_distance_pairs_local(lat5: np.ndarray, lon5: np.ndarray,
                                r5: int) -> tuple[np.ndarray, np.ndarray]:
    """Brute-force O(n^2) exact pair index (i, j), i != j — the parity
    oracle for tests."""
    dx = lon5[:, None] - lon5[None, :]
    dy = lat5[:, None] - lat5[None, :]
    hit = dx * dx + dy * dy <= np.int64(r5) * np.int64(r5)
    np.fill_diagonal(hit, False)
    return np.nonzero(hit)


def pair_distance_histogram(ds, *, radii_deg: list[float],
                            key_cols: tuple[str, ...] = ("url",
                                                         "warc_ts"),
                            lat_col: str = "lat", lon_col: str = "lon",
                            buckets: int | None = None,
                            salt: int = 1):
    """Ripley's-K pair counts: for each radius r in ``radii_deg``,
    the number of ORDERED point pairs (i != j) within r of each other
    (planar fixed-point predicate — K-hat(r) is this count divided by
    n * lambda for whoever wants the normalized form).

    Same grid co-partition as within_distance_count at cell width ==
    max(radii): each bucket folds its pairs into ONE len(radii)-row
    partial (no per-point output at all), so the exchange after the
    single shuffle is a few integers per bucket — the whole-corpus
    histogram costs the same shuffle as one range join. Self-matches
    (every point's own candidate copy, distance 0) are subtracted as
    one count per point per radius; duplicate coordinates compress to
    weighted unique points on both matrix sides exactly as in the
    range join.

    Returns a Dataset(r5, n_pairs) — r5 = round(r * 1e5), int64.
    """
    from ray.data.aggregate import Sum

    r5s = sorted(int(round(r * 1e5)) for r in radii_deg)
    if not r5s or r5s[0] <= 0:
        raise ValueError("radii_deg must be positive")
    if salt < 1:
        raise ValueError("salt must be >= 1")
    rmax = r5s[-1]
    rsq = np.array([r * r for r in r5s], dtype=np.int64)
    b = buckets or max(64, cluster_cpus() * 4)

    def expand(t: pa.Table) -> pa.Table:
        lat5 = _fixed5(t.column(lat_col))
        lon5 = _fixed5(t.column(lon_col))
        n = len(lat5)
        gx, gy = _grid(lat5, lon5, rmax)
        home_cell = _cell_of(gx, gy)
        parts = []
        for s in range(salt):
            sub = np.full(n, s, dtype=np.int64)
            parts.append(pa.table({
                "lat5": lat5, "lon5": lon5,
                "_bucket": _bucket_of(home_cell, sub, salt, b),
                "_cell": home_cell, "_sub": sub,
                "_home": np.ones(n, dtype=bool)}))
        csub = ((lat5.astype(np.uint64) * _MIX
                 + lon5.astype(np.uint64))
                % np.uint64(salt)).astype(np.int64)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                ncell = _cell_of(gx + dx, gy + dy)
                parts.append(pa.table({
                    "lat5": lat5, "lon5": lon5,
                    "_bucket": _bucket_of(ncell, csub, salt, b),
                    "_cell": ncell, "_sub": csub,
                    "_home": np.zeros(n, dtype=bool)}))
        return pa.concat_tables(parts)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        cell = df["_cell"].to_numpy()
        sub = df["_sub"].to_numpy()
        order = np.lexsort((sub, cell))
        cell, sub = cell[order], sub[order]
        lat = df["lat5"].to_numpy()[order]
        lon = df["lon5"].to_numpy()[order]
        home = df["_home"].to_numpy()[order]
        change = (np.diff(cell) != 0) | (np.diff(sub) != 0)
        starts = np.concatenate(([0], np.flatnonzero(change) + 1))
        ends = np.concatenate((starts[1:], [len(cell)]))
        tot = np.zeros(len(rsq), dtype=np.int64)
        n_home = 0
        for s, e in zip(starts, ends):
            hm = home[s:e]
            if not hm.any():
                continue
            n_home += int(hm.sum())
            cd = ~hm
            if not cd.any():
                continue
            pk = (lat[s:e] + np.int64(8_500_000)) * _STRIDE \
                + (lon[s:e] + np.int64(18_000_000))
            hu, hcnt = np.unique(pk[hm], return_counts=True)
            ku, w = np.unique(pk[cd], return_counts=True)
            hlat, hlon = hu >> np.int64(32), hu & np.int64(0xFFFFFFFF)
            klat, klon = ku >> np.int64(32), ku & np.int64(0xFFFFFFFF)
            step = max(1, 4_000_000 // len(ku))
            for i in range(0, len(hu), step):
                dx = hlon[i:i + step, None] - klon[None, :]
                dy = hlat[i:i + step, None] - klat[None, :]
                d2 = dx * dx + dy * dy
                for ri, r2 in enumerate(rsq):
                    tot[ri] += int((((d2 <= r2) * w[None, :])
                                    .sum(axis=1)
                                    * hcnt[i:i + step]).sum())
        return pd.DataFrame({
            "r5": np.concatenate([np.array(r5s, dtype=np.int64),
                                  [-1]]),
            "n_pairs": np.concatenate([tot, [n_home]])})

    parts = ds.map_batches(expand, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(per_bucket,
                                       batch_format="pandas") \
        .groupby("r5").aggregate(Sum("n_pairs", alias_name="n_pairs")) \
        .to_pandas()
    n_points = int(parts.loc[parts["r5"] == -1, "n_pairs"].sum()) \
        // salt
    out = parts[parts["r5"] != -1].sort_values("r5") \
        .reset_index(drop=True)
    out["n_pairs"] = out["n_pairs"].to_numpy() - n_points
    return out.astype(np.int64)


def cross_pair_distance_histogram(ds_a, ds_b, *,
                                  radii_deg: list[float],
                                  lat_col: str = "lat",
                                  lon_col: str = "lon",
                                  buckets: int | None = None):
    """Bivariate (cross-type) Ripley's-K pair counts: for each radius
    r, the number of (a in A, b in B) pairs within r — "are the A
    points clustered around the B points?". Same grid co-partition
    as pair_distance_histogram with A as home rows and B replicated
    to the 3x3 candidate neighborhoods; disjoint sets, so there is
    no self-match to subtract. Returns pandas (r5, n_pairs)."""
    from ray.data.aggregate import Sum

    r5s = sorted(int(round(r * 1e5)) for r in radii_deg)
    if not r5s or r5s[0] <= 0:
        raise ValueError("radii_deg must be positive")
    rmax = r5s[-1]
    rsq = np.array([r * r for r in r5s], dtype=np.int64)
    b = buckets or max(64, cluster_cpus() * 4)

    def expand(home: bool):
        def _f(t: pa.Table) -> pa.Table:
            lat5 = _fixed5(t.column(lat_col))
            lon5 = _fixed5(t.column(lon_col))
            gx, gy = _grid(lat5, lon5, rmax)
            sub = np.zeros(len(lat5), dtype=np.int64)
            if home:
                cell = _cell_of(gx, gy)
                return pa.table({
                    "lat5": lat5, "lon5": lon5,
                    "_bucket": _bucket_of(cell, sub, 1, b),
                    "_cell": cell, "_sub": sub,
                    "_home": np.ones(len(lat5), dtype=bool)})
            parts = []
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    ncell = _cell_of(gx + dx, gy + dy)
                    parts.append(pa.table({
                        "lat5": lat5, "lon5": lon5,
                        "_bucket": _bucket_of(ncell, sub, 1, b),
                        "_cell": ncell, "_sub": sub,
                        "_home": np.zeros(len(lat5), dtype=bool)}))
            return pa.concat_tables(parts)
        return _f

    u = ds_a.map_batches(expand(True), batch_format="pyarrow") \
        .union(ds_b.map_batches(expand(False),
                                batch_format="pyarrow"))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        cell = df["_cell"].to_numpy()
        order = np.argsort(cell, kind="stable")
        cell = cell[order]
        lat = df["lat5"].to_numpy()[order]
        lon = df["lon5"].to_numpy()[order]
        home = df["_home"].to_numpy()[order]
        change = np.diff(cell) != 0
        starts = np.concatenate(([0], np.flatnonzero(change) + 1))
        ends = np.concatenate((starts[1:], [len(cell)]))
        tot = np.zeros(len(rsq), dtype=np.int64)
        for s, e in zip(starts, ends):
            hm = home[s:e]
            if not hm.any() or hm.all():
                continue
            cd = ~hm
            pk = (lat[s:e] + np.int64(8_500_000)) * _STRIDE \
                + (lon[s:e] + np.int64(18_000_000))
            hu, hcnt = np.unique(pk[hm], return_counts=True)
            ku, w = np.unique(pk[cd], return_counts=True)
            hlat, hlon = hu >> np.int64(32), hu & np.int64(0xFFFFFFFF)
            klat, klon = ku >> np.int64(32), ku & np.int64(0xFFFFFFFF)
            step = max(1, 4_000_000 // len(ku))
            for i in range(0, len(hu), step):
                dx = hlon[i:i + step, None] - klon[None, :]
                dy = hlat[i:i + step, None] - klat[None, :]
                d2 = dx * dx + dy * dy
                for ri, r2 in enumerate(rsq):
                    tot[ri] += int((((d2 <= r2) * w[None, :])
                                    .sum(axis=1)
                                    * hcnt[i:i + step]).sum())
        return pd.DataFrame({"r5": np.array(r5s, dtype=np.int64),
                             "n_pairs": tot})

    out = u.groupby("_bucket").map_groups(per_bucket,
                                          batch_format="pandas") \
        .groupby("r5").aggregate(Sum("n_pairs",
                                     alias_name="n_pairs")) \
        .to_pandas()
    return out.sort_values("r5").reset_index(drop=True) \
        .astype(np.int64)
