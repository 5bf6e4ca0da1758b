"""Benchmark harness (driver contract).

Runs the headline spatial-join pipeline plus per-query timings over
$GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE JSON line:

    {"metric": "spatial_join_sec", "value": N, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, "docs_per_sec": ...}

--scaling: run the headline pipeline in two fresh processes at
RAY_GRAFT_CPUS=8 and 32 on the same input and report both throughputs
plus scaling efficiency (sandbox substitute for the N vs 4N node
criterion — see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# queries timed individually in the bench (subset: the expensive ones
# that exercise distinct execution paths)
BENCH_QUERIES = ["pip_join", "zone_page_counts", "knn_zones", "tile_counts",
                 "dedup_pages", "lineitem_pricing", "docs_token_stats",
                 "ann_topk"]


def _consume(res) -> int:
    """Materialize a result enough to have actually executed it."""
    import pandas as pd

    if isinstance(res, pd.DataFrame):
        return len(res)
    try:
        import pyarrow as pa

        if isinstance(res, pa.Table):
            return res.num_rows
    except ImportError:
        pass
    n = 0
    for batch in res.iter_batches(batch_size=65536, batch_format="pyarrow"):
        n += batch.num_rows
    return n


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from spapy_ray.pipelines.flagship import flagship_join
    from spapy_ray.pipelines.queries import QUERIES
    from spapy_ray.sources.pages import page_count

    n_docs = page_count(SF_DIR)

    # warm-up: small untimed run (JIT-ish costs, worker start, page cache)
    _consume(flagship_join(n=20_000))

    t0 = time.time()
    rows = _consume(flagship_join(SF_DIR))
    headline = time.time() - t0

    per_query: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        _consume(QUERIES[name](SF_DIR))
        per_query[name] = round(time.time() - t0, 3)

    ray.shutdown()
    return {
        "metric": "spatial_join_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "docs": n_docs,
        "join_rows": rows,
        "docs_per_sec": round(n_docs / headline, 1),
    }


def run_scaling() -> dict:
    """Same headline job at 8 and 32 CPUs in fresh processes."""
    here = os.path.abspath(__file__)

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=SF_DIR)
        out = subprocess.run([sys.executable, here], env=env,
                             capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = one(8), one(32)
    tput_lo, tput_hi = lo["docs_per_sec"], hi["docs_per_sec"]
    eff = (tput_hi / tput_lo) / (32 / 8)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_8": lo["value"], "sec_32": hi["value"],
        "docs_per_sec_8": tput_lo, "docs_per_sec_32": tput_hi,
        "sf": SF_DIR, "docs": hi["docs"],
    }


if __name__ == "__main__":
    result = run_scaling() if "--scaling" in sys.argv else run_bench()
    print(json.dumps(result))
