"""Flagship pipeline: the north-star spatial join.

    synth pages (streamed)                  ray.data.range → map_batches
      → geocode (text regex | url hash)     stateless map_batches
      → cell/tile quadkey index             stateless map_batches
      → PIP join vs broadcast zone layer    actor pool + STRtree
      [→ write partitioned parquet]         tile-keyed, resumable

Everything is lazy/streaming: no stage materializes the page table.
The reference equivalent is a Load → per-feature loop → Save script
(SpaPyTests/Tests/SpaVectorTest.py:194-232) — single-threaded and fully
in-memory; here the streaming executor pipelines all stages.
"""

from __future__ import annotations

import pyarrow as pa

from spapy_ray.sources.pages import page_count, synth_pages
from spapy_ray.sources.zones import zones_table
from spapy_ray.stages.cellindex import cell_index
from spapy_ray.stages.geocode import geocode
from spapy_ray.stages.join import pip_join

JOIN_LEFT_COLUMNS = ["url", "warc_ts", "text", "lang", "cell", "tile"]


def pages_dataset(sf_dir: str | None = None, n: int | None = None,
                  include_html: bool = True, parallelism: int = -1):
    """The page table for a testdata tier (n = lineitem row count)."""
    if n is None:
        if sf_dir is None:
            raise ValueError("need sf_dir or n")
        n = page_count(sf_dir)
    return synth_pages(n, include_html=include_html, parallelism=parallelism)


def flagship_join(sf_dir: str | None = None, n: int | None = None,
                  num_zones: int = 200, include_html: bool = False,
                  concurrency=None, batch_size: int = 32768,
                  left_columns: list[str] | None = None,
                  parallelism: int = -1):
    """pages → geocode → cell index → PIP join. Returns a lazy Dataset
    of join rows (page cols + zone attrs)."""
    ds = pages_dataset(sf_dir, n, include_html=include_html, parallelism=parallelism)
    ds = geocode(ds, batch_size=batch_size)
    ds = cell_index(ds, batch_size=batch_size)
    cols = left_columns if left_columns is not None else [
        c for c in JOIN_LEFT_COLUMNS if include_html or c != "html"]
    return pip_join(ds, zones_table(num_zones), left_columns=cols,
                    concurrency=concurrency, batch_size=batch_size)
