"""Hot-cell skew evidence: salted vs unsalted cell co-partition join.

Workload: 1.5M points all inside ONE res-4 cell (a dense "urban tile")
joined against the 200-zone layer. Unsalted, the groupby ships every
point to one group → one task does all the PIP work; salted, the hot
cell splits into k sub-groups that run in parallel.

Usage: python tools/bench_salting.py [n_points] [ncpus]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pyarrow as pa


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_500_000
    ncpu = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    sys.path.insert(0, "/root/repo")
    from spapy_ray.sources.zones import zone_params, zones_table
    from spapy_ray.stages.join import pip_join_cells

    # hot cell: a 2x2-degree patch inside zone 0's rectangle
    p = zone_params(0)
    lon0 = p["x0"] / 1e4 + 0.5
    lat0 = p["y0"] / 1e4 + 0.5

    def gen(t: pa.Table) -> pa.Table:
        ids = t.column("id").to_numpy()
        h = (ids.astype(np.uint64) * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
        lon = lon0 + (h % np.uint64(20000)).astype(np.float64) / 1e4
        lat = lat0 + ((h >> np.uint64(16)) % np.uint64(20000)).astype(np.float64) / 1e4
        return pa.table({"url": pa.array(ids.astype(str)),
                         "lon": pa.array(lon), "lat": pa.array(lat)})

    def points():
        return rd.range(n, override_num_blocks=ncpu * 4).map_batches(
            gen, batch_format="pyarrow")

    zt = zones_table(200)
    results = {}
    for salt in (1, ncpu):
        # warm
        pip_join_cells(points(), rd.from_arrow(zt), res=4, salt=salt).count()
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            rows = pip_join_cells(points(), rd.from_arrow(zt), res=4,
                                  salt=salt).count()
            best = min(best, time.time() - t0)
        results[salt] = (best, rows)
        print(f"salt={salt:3d}: {best:6.2f}s  rows={rows}")
    s1, sk = results[1][0], results[ncpu][0]
    assert results[1][1] == results[ncpu][1], "row mismatch!"
    print(f"speedup from salting the hot cell: {s1 / sk:.2f}x "
          f"({ncpu} cpus, {n} points in one res-4 cell)")
    ray.shutdown()


if __name__ == "__main__":
    main()
