"""Deduplication operators.

The reference has no dedup at all (SURVEY.md §2.10); the north rule's
web-page table needs it (dup urls from re-crawls). Exact dedup =
hash-partitioned groupby — the groupby IS the shuffle, keyed on the
dedup key, with partial aggregation where the output allows it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from spapy_ray.kernels.hashing import fnv1a64


def dedup_pages_agg(ds):
    """Aggregate form of url-dedup: one row per url with first-crawl
    timestamp and copy count, via the bucketed two-stage shuffle
    (relational.bucketed_group_agg — 8x faster than a direct
    high-cardinality groupby, BASELINE.md)."""
    from spapy_ray.stages.relational import bucketed_group_agg

    def local(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("url", sort=False).agg(
            first_ts=("warc_ts", "min"),
            n_copies=("warc_ts", "size")).reset_index()

    return bucketed_group_agg(ds, "url", local)


def dedup_first(ds, key: str, order_col: str):
    """Row-level exact dedup: keep, per key, the row with the smallest
    order_col (the reference-order "first", cf. stable row_id design
    in SURVEY.md §4). Hash-partition on key + per-group head(1).
    """
    from spapy_ray.stages.relational import bucketed_group_agg

    def local(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order_col, kind="stable") \
                .drop_duplicates(key, keep="first")

    return bucketed_group_agg(ds, key, local)


def add_text_hash(batch: pa.Table, column: str = "text",
                  out: str = "text_hash") -> pa.Table:
    """Vectorized FNV-1a content hash column (dedup / fingerprint key).

    int64 view of the uint64 hash for Arrow/SQL friendliness.
    """
    h = fnv1a64(batch.column(column)).view(np.int64)
    return batch.append_column(out, pa.array(h))


def dedup_documents_by_text(ds):
    """Exact content dedup on the documents table: group by text hash,
    keep min doc_id + copy count. The hash column is computed in a
    vectorized map_batches BEFORE the shuffle so the groupby key is a
    fixed-width int, not the full text payload."""
    from spapy_ray.stages.relational import bucketed_group_agg

    hashed = ds.map_batches(add_text_hash, batch_format="pyarrow")

    def local(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("text_hash", sort=False).agg(
            min_doc_id=("doc_id", "min"),
            n_copies=("doc_id", "size")).reset_index()

    out = bucketed_group_agg(hashed, "text_hash", local)
    return out.select_columns(["min_doc_id", "n_copies"])
