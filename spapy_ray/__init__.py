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
