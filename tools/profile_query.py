"""Profile one registered query: wall time + Ray Dataset stage stats.

Usage:
    python tools/profile_query.py <query> [sf_dir] [num_cpus]

Runs QUERIES[<query>] against sf_dir (default /root/testdata/sf0.01),
prints the wall time, row count and — when the result is a Dataset —
the per-stage ``ds.stats()`` breakdown, which is the feedback loop
for sizing batch/concurrency on a stage (BASELINE.md protocol).
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from spapy_ray.pipelines.queries import QUERIES

    t0 = time.time()
    res = QUERIES[name](sf_dir)
    is_ds = hasattr(res, "iter_batches")
    if is_ds:
        res = res.materialize()
        rows = res.count()
    else:
        rows = len(res)
    dt = time.time() - t0
    print(f"{name}: {rows} rows in {dt:.2f}s  (sf={sf_dir}, "
          f"num_cpus={cpus})")
    if is_ds:
        print(res.stats())
    ray.shutdown()


if __name__ == "__main__":
    main()
