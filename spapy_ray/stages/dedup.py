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
    timestamp and copy count. Fully partial-aggregatable (no row
    payload moves through the shuffle — only (url, min, count)
    partials), which is the 100 TB-friendly formulation.
    """
    from ray.data.aggregate import Count, Min

    return ds.groupby("url").aggregate(
        Min("warc_ts", alias_name="first_ts"),
        Count(alias_name="n_copies"),
    )


def dedup_first(ds, key: str, order_col: str):
    """Row-level exact dedup: keep, per key, the row with the smallest
    order_col (the reference-order "first", cf. stable row_id design
    in SURVEY.md §4). Hash-partition on key + per-group head(1).
    """
    def first_row(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order_col, kind="stable").head(1)

    return ds.groupby(key).map_groups(first_row, batch_format="pandas")


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
    from ray.data.aggregate import Count, Min

    hashed = ds.map_batches(add_text_hash, batch_format="pyarrow")
    out = hashed.groupby("text_hash").aggregate(
        Min("doc_id", alias_name="min_doc_id"),
        Count(alias_name="n_copies"),
    )
    return out.select_columns(["min_doc_id", "n_copies"])
