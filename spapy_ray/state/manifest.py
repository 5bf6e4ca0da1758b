"""Checkpointed tile manifests — resumable partitioned output
(north rule: "per-partition lineage records and checkpointed tile
manifests for resumable runs").

Layout for one pipeline run::

    out_dir/
      tile=<tile_id>/part.parquet       one atomic file per partition
      _manifest.json                    completed partitions + lineage

Each partition is written by its own task to a temp name and renamed
(atomic on POSIX), so a crashed run leaves only complete partitions
plus temp litter that a resume ignores. ``write_partitioned`` with
``resume=True`` prunes already-manifested partitions from the INPUT
(a vectorized anti-join filter on the partition key) before any work
runs, then merges the new completions into the manifest.

Lineage per partition: row count, content fingerprint (xor-fold of
row hashes), kernel/package version, wall time. The manifest is the
unit a 256-node run would use to skip finished key ranges on restart.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import spapy_ray

MANIFEST = "_manifest.json"


def load_manifest(out_dir: str) -> dict:
    p = os.path.join(out_dir, MANIFEST)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"version": spapy_ray.__version__, "partitions": {}}


def _save_manifest(out_dir: str, m: dict) -> None:
    tmp = os.path.join(out_dir, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(m, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, MANIFEST))


def write_partitioned(ds, out_dir: str, partition_col: str = "tile",
                      resume: bool = True) -> dict:
    """Write ds as one parquet file per partition key + manifest.

    Returns the manifest. The write itself is distributed: a
    groupby(partition_col) ships each partition to one task, which
    writes atomically and emits a lineage row; only those small rows
    return to the driver.
    """
    os.makedirs(out_dir, exist_ok=True)
    manifest = load_manifest(out_dir)
    done = set(manifest["partitions"]) if resume else set()

    if done:
        import pyarrow.compute as pc

        done_arr = pa.array(np.array(sorted(int(d) for d in done), dtype=np.int64))

        def prune(t: pa.Table) -> pa.Table:
            return t.filter(pc.invert(pc.is_in(t.column(partition_col),
                                               value_set=done_arr)))

        ds = ds.map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)

    def write_one(g: pd.DataFrame) -> pd.DataFrame:
        key = g[partition_col].iloc[0]
        part_dir = os.path.join(out_dir, f"{partition_col}={key}")
        os.makedirs(part_dir, exist_ok=True)
        final = os.path.join(part_dir, "part.parquet")
        tmp = final + f".tmp{os.getpid()}"
        t0 = time.time()
        table = pa.Table.from_pandas(g, preserve_index=False)
        pq.write_table(table, tmp)
        os.replace(tmp, final)
        fp = int(np.uint64(np.bitwise_xor.reduce(
            pd.util.hash_pandas_object(g, index=False).to_numpy())).astype(
                np.int64)) if len(g) else 0
        return pd.DataFrame({
            "partition": [int(key)],
            "rows": [len(g)],
            "fingerprint": [fp],
            "sec": [round(time.time() - t0, 4)],
        })

    lineage = ds.groupby(partition_col).map_groups(
        write_one, batch_format="pandas").to_pandas()

    for _, r in lineage.iterrows():
        manifest["partitions"][str(int(r["partition"]))] = {
            "rows": int(r["rows"]),
            "fingerprint": int(r["fingerprint"]),
            "sec": float(r["sec"]),
            "engine_version": spapy_ray.__version__,
        }
    manifest["updated_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    _save_manifest(out_dir, manifest)
    return manifest


def read_partitioned(out_dir: str, partition_col: str = "tile"):
    """Read back a partitioned output as a Dataset."""
    import ray.data as rd

    paths = []
    for name in sorted(os.listdir(out_dir)):
        if name.startswith(f"{partition_col}="):
            p = os.path.join(out_dir, name, "part.parquet")
            if os.path.exists(p):
                paths.append(p)
    return rd.read_parquet(paths)
