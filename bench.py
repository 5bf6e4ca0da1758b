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
                 "ann_topk",
                 # round-2 additions
                 "knn_zones_cells", "near_dup_docs", "polygonize_components",
                 "contour_lines", "simhash_docs", "events_sliding",
                 "media_probe",
                 # round-3 additions (polygonize/contour above now run the
                 # DISTRIBUTED merge paths — see BASELINE.md round-3 table)
                 "events_asof", "embed_top_pairs", "terrain_stats",
                 "resample_nearest",
                 # round-3 session-2 additions
                 "events_quantiles", "docs_bigrams", "zone_top_pages",
                 "events_distinct_users",
                 # round-3 session-3 additions
                 "tif_roundtrip", "dedup_clusters",
                 # round-3 session-4 additions
                 "dist_join_counts", "render_tiles",
                 # round-3 session-5 additions
                 "orders_lineitem_join", "events_windows",
                 "contamination_pairs", "cross_corpus_knn",
                 "price_quantile_sketch", "dbscan_clusters",
                 "idw_raster", "proximity_grid", "voronoi_sites",
                 "kde_heatmap", "flow_direction", "jaccard_pairs",
                 "embed_near_dup", "embed_near_dup_lsh", "focal_majority",
                 # round-4 session-5 additions
                 "ngram_overlap", "tfidf_terms", "graph_pagerank",
                 "watershed", "flow_accumulation", "docs_surprisal",
                 "zonal_majority",
                 # round-4 session-7 additions (SymSpell fuzzy join,
                 # xor anti-entropy checksum, Markov transitions, CUBE,
                 # integer-exact corr, keep-latest compaction)
                 "fuzzy_names", "table_checksum", "events_transitions",
                 "nation_year_cube", "lineitem_corr", "user_last_event",
                 # round-4 session-8 additions (rook Moran, width-L
                 # strip variogram, ordered-prefix-sum packing,
                 # dasymetric transfer, two-sided as-of interp,
                 # degree assortativity)
                 "raster_moran", "raster_variogram", "seq_packing",
                 "areal_interp", "events_interp", "cust_assortativity",
                 # round-4 session-9 additions (k-core peel, multi-
                 # source BFS, HLL registers, TPC-H Q5 join chain,
                 # Ripley pair histogram, payload chunking, interval
                 # concurrency, Hilbert partition key)
                 "cust_kcore", "cust_reach", "events_hll",
                 "local_supplier_revenue", "ripley_pairs",
                 "media_chunks", "open_orders", "hilbert_index",
                 # session-9 late additions (EMD drift, CUSUM scan,
                 # quadtree layout, winnowing, integer k-means,
                 # bloom export)
                 "value_emd", "events_cusum", "quadtree_leaves",
                 "docs_winnow", "embed_kmeans", "url_bloom",
                 # session-10 additions (band-scan raster family:
                 # summed-area table / L1 distance transform /
                 # horizon; DEM sight lines over sample_raster;
                 # dyadic EWMA windows; inverted-index shingle
                 # similarity; bounded Bellman-Ford)
                 "raster_integral", "raster_dt", "raster_horizon",
                 "line_of_sight", "events_ewma", "docs_cosine_pairs",
                 "cust_shortest_paths",
                 # session-10 late additions (k-epoch stack fold,
                 # iterative min-plus cost distance, KMV sketch,
                 # composite corpus prep, Gram partials, 3-itemsets)
                 "raster_trend", "cost_distance",
                 "user_overlap_sketch", "corpus_prep", "embed_gram",
                 "frequent_triples",
                 # session-11 additions (distributed BPE training,
                 # HITS broadcast iteration, Q21 two-level bucket
                 # fold, interval-overlap rank sum, per-domain
                 # trajectory moments)
                 "bpe_merges", "cust_hits", "late_sole_suppliers",
                 "session_overlap_pairs", "domain_trajectories",
                 # session-12 additions (histogram decision stump,
                 # stay-point segmentation, chained-stencil blur,
                 # ranked boolean retrieval)
                 "best_split", "stay_points", "raster_blur5",
                 "index_search",
                 # session-12 wave 2-4 (radix selection, shingle
                 # diversity, sparse space-time stencil)
                 "price_exact_median", "ngram_diversity",
                 "hotspot_cube", "knn_label_vote", "cms_hosts",
                 "heading_rose",
                 # session-12 late additions (halo-2 stencil, drift,
                 # reorder audit, cume_dist, zone mix)
                 "raster_log5", "vocab_drift", "duplicate_orders",
                 "events_cume_dist", "zone_lang_mix",
                 # session-12 final additions (grouped HLL, rescore
                 # top-k, texture, geo corpus prep, forecast bases)
                 "source_distinct_hll", "top_hosts_rescore",
                 "raster_texture5", "geo_corpus_prep",
                 "events_seasonal_error",
                 # round-5 additions (co-partitioned spatial join,
                 # real-PNG decode/resize, native HFA round-trip;
                 # graph_pagerank/cust_hits above now run the pinned
                 # join modes)
                 "pip_join_cells", "media_decode", "media_resize",
                 "img_roundtrip", "audio_decode", "audio_decimate",
                 "video_frames", "tif_rgb_roundtrip", "tif_big_roundtrip",
                 "gpkg_roundtrip", "gpkg_tiles_roundtrip",
                 "geoparquet_roundtrip"]


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

    # headline best-of-N, same convention as the per-query rows (a
    # single sample swings 2-3x with co-tenant load on this host)
    reps0 = int(os.environ.get("GRAFT_BENCH_REPS", "3"))
    headline, rows = float("inf"), 0
    for _ in range(reps0):
        t0 = time.time()
        rows = _consume(flagship_join(SF_DIR))
        headline = min(headline, time.time() - t0)

    # per-query minima over <=3 runs (VERDICT r3 #8: single samples
    # made round-over-round regression detection meaningless on this
    # co-tenant host). Reps are ADAPTIVE: short queries (where one
    # sample is pure noise) get the full 3; a query whose samples
    # already cost >15 s stops repeating (long runs self-average,
    # and flat best-of-3 over the now-58-query list blows past the
    # driver's bench window — a truncated run records NOTHING).
    # A global budget guards the tail the same way.
    reps = int(os.environ.get("GRAFT_BENCH_REPS", "3"))
    budget = float(os.environ.get("GRAFT_BENCH_BUDGET", "480"))
    t_all = time.time()
    per_query: dict[str, float] = {}
    for name in BENCH_QUERIES:
        best, spent = float("inf"), 0.0
        for _r in range(reps):
            t0 = time.time()
            _consume(QUERIES[name](SF_DIR))
            dt = time.time() - t0
            best = min(best, dt)
            spent += dt
            if spent > 15.0 or time.time() - t_all > budget:
                break
        per_query[name] = round(best, 3)

    ray.shutdown()
    return {
        "metric": "spatial_join_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": per_query,
        "query_reps": f"adaptive<={reps}",
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "docs": n_docs,
        "join_rows": rows,
        "docs_per_sec": round(n_docs / headline, 1),
    }


def run_scaling_worker(n_docs: int) -> None:
    """One scaling measurement in THIS process: flagship at n_docs.

    The scaling workload uses a denser zone layer (GRAFT_SCALE_ZONES,
    default 2000 — realistic admin layers are 10^4-10^5 polygons) so
    per-doc spatial compute dominates the local object-store fabric,
    and reports best-of-GRAFT_SCALE_REPS (the sandbox host is shared;
    co-tenant load adds several noisy cores — best-of filters it).
    """
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from spapy_ray.pipelines.flagship import flagship_join

    zones = int(os.environ.get("GRAFT_SCALE_ZONES", "2000"))
    reps = int(os.environ.get("GRAFT_SCALE_REPS", "3"))
    _consume(flagship_join(n=50_000, num_zones=zones))   # warm workers
    blocks = NUM_CPUS * int(os.environ.get("GRAFT_SCALE_BLOCKS_PER_CPU", "4"))
    best, rows = float("inf"), 0
    for _ in range(reps):
        t0 = time.time()
        # consume distributedly: count() executes every stage but does
        # not funnel the (text-heavy) join output through the single
        # driver — the realistic sink at scale is a distributed write,
        # and a driver pull is a FIXED serial cost that would fake a
        # scaling ceiling
        rows = flagship_join(n=n_docs, parallelism=blocks,
                             num_zones=zones).count()
        best = min(best, time.time() - t0)
    ray.shutdown()
    print(json.dumps({"sec": round(best, 3), "rows": rows,
                      "docs_per_sec": round(n_docs / best, 1)}))


def _mp_worker(seed: int) -> int:
    """Raw-multiprocessing flagship kernel chain (no Ray) — measures
    the MACHINE's parallel ceiling for the identical per-doc work."""
    import numpy as np

    from spapy_ray.sources.pages import gen_pages_table
    from spapy_ray.sources.zones import zones_table
    from spapy_ray.stages.cellindex import cell_index_batch
    from spapy_ray.stages.geocode import geocode_batch
    from spapy_ray.stages.join import PIPJoin

    zones = int(os.environ.get("GRAFT_SCALE_ZONES", "2000"))
    pj = PIPJoin(zones_table=zones_table(zones),
                 left_columns=["url", "warc_ts", "text", "lang", "cell", "tile"])
    n, t0 = 0, time.time()
    while time.time() - t0 < 5.0:
        ids = np.arange(seed * 32768, seed * 32768 + 32768)
        pj(cell_index_batch(geocode_batch(
            gen_pages_table(ids, 4_000_000, include_html=False))))
        n += 32768
    return n


def _mp_ceiling(nprocs: int) -> float:
    """docs/sec of the identical kernel chain via multiprocessing."""
    import multiprocessing as mp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    with mp.Pool(nprocs) as p:
        res = p.map(_mp_worker, range(nprocs))
    return sum(res) / 5.0


def run_raster_pairs() -> dict:
    """raster ⊗ raster throughput on a >=10^5-tile synthetic pair
    (VERDICT r2 #2 done-criterion): two GTxGT tile tables (32x32
    float32 tiles) generated distributed, subtracted through
    tile_binary_math's blocked co-partition join, consumed with
    count(). Reports tiles/sec through the pair kernel."""
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import numpy as np
    import pyarrow as pa

    import ray.data as rd
    from spapy_ray.stages.raster import tile_binary_math

    GT = int(os.environ.get("GRAFT_RP_GRID", "320"))    # 320^2 = 102,400
    T = 32

    def make(side: int):
        def gen(b: pa.Table) -> pa.Table:
            ids = b.column("id").to_numpy()
            tile = np.empty((len(ids), T * T), dtype="<f4")
            tile[:] = (ids % 251 + side)[:, None]
            return pa.table({
                "tx": pa.array((ids % GT).astype(np.int64)),
                "ty": pa.array((ids // GT).astype(np.int64)),
                "band": pa.array(np.zeros(len(ids), np.int64)),
                "data": pa.array([t.tobytes() for t in tile],
                                 type=pa.binary())})
        return rd.range(GT * GT).map_batches(gen, batch_format="pyarrow")

    # warm-up on a small grid
    t0 = time.time()
    out = tile_binary_math(make(0), make(1), "subtract",
                           dtype="float32", tile_size=T)
    n = out.count()
    dt = time.time() - t0
    ray.shutdown()
    return {"metric": "raster_pair_tiles_per_sec",
            "value": round(n / dt, 1), "unit": "tiles/sec",
            "tiles": n, "sec": round(dt, 2), "grid": GT,
            "tile_size": T, "num_cpus": NUM_CPUS}


def run_stencil() -> dict:
    """Halo-stencil throughput on a >=10^5-tile synthetic DEM
    (VERDICT r3 #1 done-criterion): a GTxGT single-band tile table
    (32x32 float32) run through the super-block-bucketed
    stencil_op_multi (slope via hillshade kernel + TRI + roughness off
    ONE halo exchange), consumed with count(). Reports tiles/sec
    through the stencil engine — the analogue of the raster-pairs
    number."""
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import numpy as np
    import pyarrow as pa

    import ray.data as rd
    from spapy_ray.sources.rasters import RasterMeta
    from spapy_ray.stages.raster import (hillshade_kernel, roughness_kernel,
                                         stencil_op_multi, tri_kernel)

    GT = int(os.environ.get("GRAFT_ST_GRID", "320"))    # 320^2 = 102,400
    T = 32
    meta = RasterMeta(width=GT * T, height=GT * T, tile_size=T,
                      x_min=-180.0, y_max=90.0,
                      pixel_w=360.0 / (GT * T), pixel_h=-180.0 / (GT * T),
                      dtype="float32")

    def gen(b: pa.Table) -> pa.Table:
        ids = b.column("id").to_numpy()
        base = (ids % 251).astype(np.float32)
        ramp = np.add.outer(np.zeros(T, np.float32),
                            np.arange(T, dtype=np.float32)).ravel()
        tile = base[:, None] + ramp[None, :]
        return pa.table({
            "tx": pa.array((ids % GT).astype(np.int64)),
            "ty": pa.array((ids // GT).astype(np.int64)),
            "band": pa.array(np.zeros(len(ids), np.int64)),
            "data": pa.array([np.ascontiguousarray(t).tobytes()
                              for t in tile], type=pa.binary())})

    ds = rd.range(GT * GT).map_batches(gen, batch_format="pyarrow")
    kernels = {
        "shade": lambda pad: hillshade_kernel(pad, abs(meta.pixel_w),
                                              abs(meta.pixel_h)),
        "tri": tri_kernel,
        "rough": roughness_kernel,
    }
    t0 = time.time()
    n = stencil_op_multi(ds, meta, kernels, dtype="float32").count()
    dt = time.time() - t0

    # halo-2 leg: one non-separable 5x5 pass through the widened
    # exchange (2-px strips, (T+4)^2 views)
    from spapy_ray.stages.raster import stencil_op

    def k5(pad):
        z = pad.astype(np.float64)
        h, w = pad.shape[0] - 4, pad.shape[1] - 4
        out = np.zeros((h, w))
        for dy in range(5):
            for dx in range(5):
                out += z[dy:dy + h, dx:dx + w]
        return (out / 25.0).astype(np.float32)

    t1 = time.time()
    n2 = stencil_op(ds, meta, k5, dtype="float32", halo=2).count()
    dt2 = time.time() - t1
    ray.shutdown()
    return {"metric": "stencil_tiles_per_sec",
            "value": round(n / dt, 1), "unit": "tiles/sec",
            "tiles": n, "kernels": 3, "sec": round(dt, 2), "grid": GT,
            "tile_size": T, "num_cpus": NUM_CPUS,
            "halo2_tiles_per_sec": round(n2 / dt2, 1),
            "halo2_sec": round(dt2, 2)}


def run_scan() -> dict:
    """Band-scan throughput on a large synthetic int raster: the
    summed-area table (two array scans + carry joins, the heaviest
    member of the rasterprefix family) over a GSxGS grid of 64-px
    tiles, consumed with count(). Reports tiles/sec through the
    whole scan pipeline — the scale datapoint for the session-10
    prefix-scan machinery (carries are <=512 B/tile, so the number is
    dominated by the two per-tile map passes, as it should be)."""
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import numpy as np

    from spapy_ray.sources.rasters import RasterMeta, synth_dem_dataset
    from spapy_ray.stages.rasterprefix import integral_image

    GS = int(os.environ.get("GRAFT_SCAN_GRID", "64"))   # 64^2 = 4096 tiles
    T = 64
    meta = RasterMeta(width=GS * T, height=GS * T, tile_size=T,
                      x_min=-180.0, y_max=90.0,
                      pixel_w=360.0 / (GS * T), pixel_h=-180.0 / (GS * T))
    ds = synth_dem_dataset(meta, kind="int")
    t0 = time.time()
    sat, _ = integral_image(ds, meta, dtype="int32")
    n = sat.count()
    dt = time.time() - t0
    ray.shutdown()
    return {"metric": "scan_tiles_per_sec",
            "value": round(n / dt, 1), "unit": "tiles/sec",
            "tiles": n, "sec": round(dt, 2), "grid": GS,
            "tile_size": T, "num_cpus": NUM_CPUS}


def run_scaling() -> dict:
    """Same job at N and 4N CPUs in fresh processes (sandbox substitute
    for the N vs 4N node criterion; see BASELINE.md for the protocol).
    Also measures the machine's own parallel ceiling for the identical
    per-doc work (raw multiprocessing, no Ray) at both levels —
    ``machine_efficiency`` — because on this shared single box the
    per-core memory bandwidth and co-tenant load cap ANY engine below
    the nominal 4x; ``normalized_efficiency`` is the engine's scaling
    relative to what the hardware itself delivers."""
    here = os.path.abspath(__file__)
    n_docs = int(os.environ.get("GRAFT_SCALE_DOCS", str(4_000_000)))
    # default N=4 -> 4N=16: both levels sit within this host's physical
    # cores, so the nominal 4x is actually available to ANY engine;
    # N=8 -> 32 spans the SMT threshold where the raw-multiprocessing
    # hardware ceiling itself is ~0.71 (see BASELINE.md). Override with
    # GRAFT_SCALE_N=8 to measure the SMT-spanning range.
    n_lo = int(os.environ.get("GRAFT_SCALE_N", "4"))
    n_hi = 4 * n_lo

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=SF_DIR)
        out = subprocess.run([sys.executable, here, "--scaling-worker",
                              str(n_docs)], env=env,
                             capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = one(n_lo), one(n_hi)
    tput_lo, tput_hi = lo["docs_per_sec"], hi["docs_per_sec"]
    eff = (tput_hi / tput_lo) / (n_hi / n_lo)
    mp_lo, mp_hi = _mp_ceiling(n_lo), _mp_ceiling(n_hi)
    mp_eff = (mp_hi / mp_lo) / (n_hi / n_lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        f"sec_{n_lo}": lo["sec"], f"sec_{n_hi}": hi["sec"],
        f"docs_per_sec_{n_lo}": tput_lo, f"docs_per_sec_{n_hi}": tput_hi,
        f"mp_docs_per_sec_{n_lo}": round(mp_lo, 1),
        f"mp_docs_per_sec_{n_hi}": round(mp_hi, 1),
        "machine_efficiency": round(mp_eff, 3),
        "normalized_efficiency": round(eff / mp_eff, 3) if mp_eff else None,
        "sf": SF_DIR, "docs": n_docs,
    }


if __name__ == "__main__":
    if "--scaling-worker" in sys.argv:
        run_scaling_worker(int(sys.argv[sys.argv.index("--scaling-worker") + 1]))
    elif "--raster-pairs" in sys.argv:
        print(json.dumps(run_raster_pairs()))
    elif "--stencil" in sys.argv:
        print(json.dumps(run_stencil()))
    elif "--scan" in sys.argv:
        print(json.dumps(run_scan()))
    else:
        result = run_scaling() if "--scaling" in sys.argv else run_bench()
        print(json.dumps(result))
