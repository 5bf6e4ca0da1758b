"""spapy_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch rewrite of the *capabilities* of mdl27/SpaPy
(reference at /root/reference, read-only) on top of ray.data.Dataset:

- vector data = Arrow tables with a WKB ``geom_wkb`` binary column
  (points fast-path as ``lon``/``lat`` float64 columns),
- raster data = Arrow tile tables (one row per 2-D tile),
- every transform = ``map_batches`` over zero-copy Arrow batches,
- stateful stages (STRtree PIP join, projections) = actor pools,
- wide ops (zonal stats, kNN rings, dedup) = cell-keyed groupbys.

No geometry library exists in this environment (no shapely/GDAL/h3);
every kernel in :mod:`spapy_ray.kernels` is hand-rolled numpy.

Library code never calls ``ray.init()`` — sessions are owned by the
caller (driver / bench.py / test fixture).
"""

__version__ = "0.1.0"

# Engine execution config: the engine uses Ray Data's DEFAULT
# (pull-based) sort shuffle. Push-based shuffle was enabled briefly in
# round 4 when the halo exchange shipped 9 fragment rows/tile, where
# it measured 22.3->12.4 s; after the block-mosaic exchange cut
# shuffle volume 6x, an interleaved same-process A/B at 32 cpus
# (best-of-3 per strategy, strategies alternated per run) showed
# pull-based wins or ties 10/12 expensive queries — sum 54.3 s vs
# 61.6 s (contamination_pairs 9.7 vs 13.0, near_dup_docs 4.8 vs 6.1,
# dist_join_counts 4.7 vs 5.7) and the 102,400-tile stencil bench
# 3.6-4.0 s vs 4.0-6.4 s. Small-per-row keyed exchanges don't
# amortize push-based's extra pipelining machinery; revisit only for
# genuinely multi-node, large-block shuffles.
