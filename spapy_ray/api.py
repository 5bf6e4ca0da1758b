"""Reference-named one-liner façade (API parity layer).

The reference exposes its operators as module-level one-liners
(`SpaVectors.Buffer(...)`, `SpaRasters.Add(...)`, `SpaTopo.Slope(...)`
— see SpaVectors.py:1390-1640, SpaRasters.py:1640-2073,
SpaTopo.py:258-396). This module provides the same names over the
engine's Dataset-native stages so a reference user can port scripts
mechanically:

    vectors:  Dataset with a geom_wkb column (or a path — GetInput
              routing applies)
    rasters:  a :class:`Raster` handle = (tile Dataset, RasterMeta,
              dtype) — the distributed stand-in for SpaDatasetRaster

Everything returns lazily (Datasets / Raster handles); scalar
one-liners mirror the reference's eager semantics only in signature.
"""

from __future__ import annotations

from typing import NamedTuple

from spapy_ray.sources.dispatch import get_input
from spapy_ray.sources.rasters import RasterMeta


class Raster(NamedTuple):
    """Distributed raster handle (tile table + grid metadata)."""
    ds: object
    meta: RasterMeta
    dtype: str = "int32"


def Load(path):
    """SpaBase.GetInput / SpaVectors.Load / SpaRasters.Load: raster
    dirs come back as a Raster handle, everything else as a Dataset."""
    out = get_input(path)
    if isinstance(out, tuple):
        ds, meta = out
        return Raster(ds, meta, meta.dtype)
    return out


# ---------------------------------------------------------- vectors

def _v(ds):
    return get_input(ds)


def Buffer(ds, dist, segments: int = 16, method: str = "offset"):
    from spapy_ray.stages.vector_ops import buffer

    return buffer(_v(ds), dist, segments=segments, method=method)


def Simplify(ds, tolerance):
    from spapy_ray.stages.vector_ops import simplify

    return simplify(_v(ds), tolerance)


def ConvexHull(ds):
    from spapy_ray.stages.vector_ops import convex_hull

    return convex_hull(_v(ds))


def Centroid(ds):
    from spapy_ray.stages.vector_ops import centroid

    return centroid(_v(ds))


def Densify(ds, max_distance=1.0):
    from spapy_ray.stages.vector_ops import densify

    return densify(_v(ds), max_distance)


def SplitFeatures(ds):
    from spapy_ray.stages.vector_ops import split_features

    return split_features(_v(ds))


def Clip(ds, MinX, MinY, MaxX, MaxY):
    from spapy_ray.kernels import clip as _clip, wkb as _wkb
    from spapy_ray.stages.relate import clip_to

    box = _wkb.encode_polygon([_clip.bbox_ring(MinX, MinY, MaxX, MaxY)])
    return clip_to(_v(ds), box)


def _overlay(ds, other_wkb, op):
    from spapy_ray.stages.overlay import overlay_with_geometry

    return overlay_with_geometry(_v(ds), other_wkb, op)


def Intersection(ds, other_wkb):
    return _overlay(ds, other_wkb, "intersection")


def Union(ds, other_wkb=None):
    if other_wkb is None:          # self-fold (SpaVectors.py:1006-1038)
        from spapy_ray.stages.overlay import dataset_union

        return dataset_union(_v(ds))
    return _overlay(ds, other_wkb, "union")


def Difference(ds, other_wkb):
    return _overlay(ds, other_wkb, "difference")


def SymmetricDifference(ds, other_wkb):
    return _overlay(ds, other_wkb, "symmetric_difference")


def _predicate(name):
    def f(ds, other_wkb, out=None):
        from spapy_ray.stages.relate import relate_column

        return relate_column(_v(ds), other_wkb, name, out=out)
    f.__name__ = name
    return f


Intersects = _predicate("intersects")
Touches = _predicate("touches")
Disjoint = _predicate("disjoint")
Overlaps = _predicate("overlaps")
Contains = _predicate("contains")
Crosses = _predicate("crosses")


def Transform(ds, crs, **kw):
    """SpaReferencing.Transform over point columns or geometries."""
    from spapy_ray.stages.transform import transform_geoms

    return transform_geoms(_v(ds), crs, **kw)


# ---------------------------------------------------------- rasters

def _math1(op):
    def f(r: Raster, operand=None, swap=False):
        from spapy_ray.stages.raster import tile_math

        return Raster(tile_math(r.ds, op, operand, dtype=r.dtype,
                                tile_size=r.meta.tile_size,
                                nodata=r.meta.nodata, swap=swap),
                      r.meta, r.dtype)
    return f


def _math2(op):
    def f(a: Raster, b):
        from spapy_ray.stages.raster import tile_binary_math, tile_math

        if isinstance(b, Raster):
            return Raster(tile_binary_math(a.ds, b.ds, op, dtype=a.dtype,
                                           tile_size=a.meta.tile_size),
                          a.meta, a.dtype)
        return Raster(tile_math(a.ds, op, b, dtype=a.dtype,
                                tile_size=a.meta.tile_size,
                                nodata=a.meta.nodata),
                      a.meta, a.dtype)
    return f


Add = _math2("add")
Subtract = _math2("subtract")
Multiply = _math2("multiply")
Divide = _math2("divide")
Power = _math2("power")
Maximum = _math2("maximum")
Minimum = _math2("minimum")
Equal = _math2("equal")
NotEqual = _math2("not_equal")
LessThan = _math2("less")
GreaterThan = _math2("greater")
LessThanOrEqual = _math2("less_equal")
GreaterThanOrEqual = _math2("greater_equal")
And = _math2("and")
Or = _math2("or")
Not = _math1("not")
RoundInteger = _math1("round")
RoundFloor = _math1("floor")
RoundCeiling = _math1("ceil")
Truncate = _math1("trunc")
NaturalLog = _math1("ln")
Log = _math1("log")
Exponential = _math1("exp")
Square = _math1("square")
SquareRoot = _math1("sqrt")
AbsoluteValue = _math1("abs")


def ReclassifyRange(r: Raster, bounds, values):
    from spapy_ray.stages.raster import reclassify

    return Raster(reclassify(r.ds, bounds, values, dtype=r.dtype,
                             tile_size=r.meta.tile_size), r.meta, r.dtype)


def NumpyCrop(r: Raster, px0, py0, px1, py1):
    """Pixel-exact crop (SpaRasters.NumpyCrop / ExtractByPixels)."""
    from spapy_ray.stages.raster import crop_pixels

    ds, meta = crop_pixels(r.ds, r.meta, px0, py0, px1, py1, dtype=r.dtype)
    return Raster(ds, meta, r.dtype)


def SetType(r: Raster, out_dtype: str):
    from spapy_ray.stages.raster import set_type

    return Raster(set_type(r.ds, dtype=r.dtype,
                           tile_size=r.meta.tile_size,
                           out_dtype=out_dtype), r.meta, out_dtype)


def Resample(r: Raster, zoom_factor, method: str = "bilinear"):
    from spapy_ray.stages.raster import scale_raster

    ds, meta = scale_raster(r.ds, r.meta, zoom_factor, dtype=r.dtype,
                            method=method)
    return Raster(ds, meta, r.dtype)


def ResampleToMatch(fine: Raster, coarse: Raster, method: str = "bilinear"):
    from spapy_ray.stages.raster import resample_to_match

    return Raster(resample_to_match(fine.ds, fine.meta, coarse.meta,
                                    dtype=fine.dtype, method=method),
                  coarse.meta, fine.dtype)


def GetMinMax(r: Raster):
    from spapy_ray.stages.raster import raster_minmax

    return raster_minmax(r.ds, dtype=r.dtype, tile_size=r.meta.tile_size,
                         nodata=r.meta.nodata)


def GetHistogram(r: Raster, nbins=16, lo=0.0, hi=256.0):
    from spapy_ray.stages.raster import raster_histogram

    return raster_histogram(r.ds, dtype=r.dtype,
                            tile_size=r.meta.tile_size,
                            nbins=nbins, lo=lo, hi=hi)


def Polygonize(r: Raster):
    """One multipolygon + value per component (gdal.Polygonize)."""
    from spapy_ray.stages.polygonize import component_rings

    return component_rings(r.ds, r.meta, dtype=r.dtype)


# ------------------------------------------------------------- topo

def _topo(fn_name, out_dtype="float32"):
    def f(r: Raster, **kw):
        import spapy_ray.stages.raster as rs

        fn = getattr(rs, fn_name)
        return Raster(fn(r.ds, r.meta, dtype=r.dtype, **kw), r.meta,
                      out_dtype)
    return f


Hillshade = _topo("hillshade")
Slope = _topo("slope_degrees")
Aspect = _topo("aspect_degrees")
TRI = _topo("tri")
TPI = _topo("tpi")
Roughness = _topo("roughness")


def ColorRelief(r: Raster, table=None):
    from spapy_ray.stages.raster import color_relief

    return Raster(color_relief(r.ds, dtype=r.dtype,
                               tile_size=r.meta.tile_size, table=table),
                  r.meta, "uint8")


def TransformRaster(r: Raster, crs: str, method: str = "nearest"):
    """SpaReferencing.TransformRaster (gdal.Warp): reproject to a
    projected CRS grid."""
    from spapy_ray.stages.raster import warp_to_crs

    ds, meta = warp_to_crs(r.ds, r.meta, crs, dtype=r.dtype, method=method)
    return Raster(ds, meta, r.dtype)


def Contour(r: Raster, interval=100, base=0):
    from spapy_ray.stages.contour import contour

    import numpy as np

    # reference signature: levels every `interval` from `base`
    # (SpaTopo.py:340-352); derive the level list from the raster
    # min/max
    mm = GetMinMax(r)
    levels = list(np.arange(base, float(mm["max_z"]) + interval, interval))
    levels = [lv for lv in levels if lv >= float(mm["min_z"])]
    return contour(r.ds, r.meta, levels, dtype=r.dtype)


def Save(obj, path, *, crs: str | None = None, nodata: float | None = None):
    """SpaVectors.Save / SpaRasters.Save (SpaVectors.py:240-281,
    SpaRasters.py:752-824): route by extension —

    - vector Dataset/Table + .shp  → native shapefile writer
    - vector Dataset + .parquet / dir → write_parquet
    - Raster + .asc → native AAIGrid writer
    - Raster + .tif/.tiff → native tiled GeoTIFF writer
    - Raster + dir  → tile-table parquet + _raster_meta.json

    Writing a .shp collects the layer to the driver first (the format
    is one sequential file — the same boundary fiona has); big layers
    belong in parquet.
    """
    import os as _os

    ext = _os.path.splitext(str(path))[1].lower()
    if isinstance(obj, Raster):
        if ext == ".asc":
            from spapy_ray.sources.aaigrid import write_aaigrid

            write_aaigrid(obj.ds, obj.meta, str(path), dtype=obj.dtype,
                          nodata=nodata)
            return
        if ext in (".tif", ".tiff"):
            from spapy_ray.sources.geotiff import write_geotiff

            write_geotiff(obj.ds, obj.meta, str(path), dtype=obj.dtype,
                          nodata=nodata)
            return
        from spapy_ray.sources.dispatch import write_raster

        write_raster(obj.ds, str(path), obj.meta)
        return
    if ext in (".shp", ".geojson"):
        import pyarrow as _pa

        tbl = obj if isinstance(obj, _pa.Table) else _pa.Table.from_pandas(
            obj.to_pandas(), preserve_index=False)
        if ext == ".shp":
            from spapy_ray.sources.shapefile import write_shapefile

            write_shapefile(tbl, str(path), crs=crs)
        else:
            from spapy_ray.sources.geojson import write_geojson

            write_geojson(tbl, str(path), crs=crs)
        return
    obj.write_parquet(str(path))


# ---------------------------------------------------------------------
# North-rule / pipeline one-liners beyond the reference surface
# (kept thin: each delegates to its stage module, where the scale
# notes live)

def WithinDistanceCount(ds, radius_deg, **kw):
    from spapy_ray.stages.distjoin import within_distance_count

    return within_distance_count(ds, radius_deg=radius_deg, **kw)


def WithinDistancePairs(ds, radius_deg, key_col, **kw):
    from spapy_ray.stages.distjoin import within_distance_pairs

    return within_distance_pairs(ds, radius_deg=radius_deg,
                                 key_col=key_col, **kw)


def HashJoin(left, right, on, **kw):
    from spapy_ray.stages.relational import hash_join

    return hash_join(left, right, on=on, **kw)


def TilePyramid(geo_ds, **kw):
    from spapy_ray.stages.cellindex import tile_pyramid

    return tile_pyramid(geo_ds, **kw)


def RasterOverviews(r: Raster, levels: int = 3):
    from spapy_ray.stages.raster import raster_overviews

    return raster_overviews(r.ds, dtype=r.dtype,
                            tile_size=r.meta.tile_size, levels=levels)


def RenderTiles(r: Raster, **kw):
    from spapy_ray.stages.render import render_tiles

    return render_tiles(r.ds, dtype=r.dtype,
                        tile_size=r.meta.tile_size, **kw)


def RasterizePoints(ds, **kw):
    from spapy_ray.stages.rasterize import rasterize_points

    return rasterize_points(ds, **kw)


def UrlParse(ds, url_col: str = "url"):
    from spapy_ray.stages.text import url_parse

    return url_parse(ds, url_col=url_col)


def SampleStratified(ds, col, strata_col, rates, **kw):
    from spapy_ray.stages.relational import hash_sample_stratified

    return hash_sample_stratified(ds, col, strata_col, rates, **kw)


def NearDupClusters(ds, key_col, **kw):
    from spapy_ray.stages.neardup import near_dup_clusters

    return near_dup_clusters(ds, key_col, **kw)


def NearestSite(ds, site_ids, site_lat5, site_lon5, **kw):
    from spapy_ray.stages.voronoi import nearest_site

    return nearest_site(ds, site_ids, site_lat5, site_lon5, **kw)


def KdeHeatmap(ds, meta, *, radius_deg, **kw):
    from spapy_ray.stages.rasterize import kde_tile_stats

    return kde_tile_stats(ds, meta, radius_deg=radius_deg, **kw)


def FlowDirection(r: Raster):
    from spapy_ray.stages.raster import flow_direction

    return Raster(flow_direction(r.ds, r.meta, dtype=r.dtype), r.meta,
                  "int32")


def FocalMajority(r: Raster, n_classes: int):
    from spapy_ray.stages.raster import focal_majority

    return Raster(focal_majority(r.ds, r.meta, n_classes=n_classes,
                                 dtype=r.dtype), r.meta, "int32")


def PairwiseJaccard(ds, cand, key_col, **kw):
    from spapy_ray.stages.neardup import pairwise_jaccard

    return pairwise_jaccard(ds, cand, key_col, **kw)


def EmbedNearDup(ds, *, threshold, exact: bool = False, **kw):
    """Embedding-cosine near-dup: LSH scale path by default, exact
    block-pair GEMM baseline with exact=True."""
    if exact:
        from spapy_ray.stages.ann import cosine_threshold_pairs

        return cosine_threshold_pairs(ds, threshold=threshold, **kw)
    from spapy_ray.stages.ann import embed_near_dup_lsh

    return embed_near_dup_lsh(ds, threshold=threshold, **kw)


def NgramOverlapDups(ds, key_col="doc_id", **kw):
    from spapy_ray.stages.neardup import ngram_overlap_dups

    return ngram_overlap_dups(ds, key_col, **kw)


def TfidfTopTerms(ds, n_docs, **kw):
    from spapy_ray.stages.text import tfidf_top_terms

    return tfidf_top_terms(ds, n_docs, **kw)


def PageRank(edges, **kw):
    from spapy_ray.stages.graph import pagerank

    return pagerank(edges, **kw)


def Watershed(r: Raster, **kw):
    from spapy_ray.stages.raster import watershed_stats

    return watershed_stats(r.ds, r.meta, **kw)


def FlowAccumulation(r: Raster, **kw):
    from spapy_ray.stages.raster import flow_accumulation_stats

    return flow_accumulation_stats(r.ds, r.meta, **kw)


def DissolveUnionArea(ds, key_col, **kw):
    from spapy_ray.stages.overlay import dissolve_union_area

    return dissolve_union_area(ds, key_col, **kw)


def FunnelCounts(ds, steps, **kw):
    from spapy_ray.stages.sessions import funnel_counts

    return funnel_counts(ds, steps, **kw)


def RetentionCohorts(ds, **kw):
    from spapy_ray.stages.sessions import retention_cohorts

    return retention_cohorts(ds, **kw)


def GridJoinCounts(geo, **kw):
    from spapy_ray.stages.spatialstats import grid_join_counts

    return grid_join_counts(geo, **kw)


def UnigramSurprisal(ds, **kw):
    from spapy_ray.stages.text import unigram_surprisal

    return unigram_surprisal(ds, **kw)


def EqualizeStats(r: Raster, **kw):
    from spapy_ray.stages.raster import equalize_stats

    return equalize_stats(r.ds, r.meta, **kw)


def ZonalMajority(r: Raster, zones, **kw):
    from spapy_ray.stages.raster import zonal_majority

    return zonal_majority(r.ds, zones, r.meta, **kw)


def RandomProjection(ds, **kw):
    from spapy_ray.stages.ann import random_projection

    return random_projection(ds, **kw)


def BloomFilterJoin(left, right, on, **kw):
    from spapy_ray.stages.relational import bloom_filter_join

    return bloom_filter_join(left, right, on=on, **kw)


def HashSplit(ds, col, fractions, **kw):
    from spapy_ray.stages.relational import hash_split

    return hash_split(ds, col, fractions, **kw)


def GroupedMedian(ds, key, val, **kw):
    from spapy_ray.stages.relational import grouped_median

    return grouped_median(ds, key, val, **kw)


def StretchStats(r: Raster, **kw):
    from spapy_ray.stages.raster import stretch_stats

    return stretch_stats(r.ds, r.meta, **kw)


def GroupedMadOutliers(ds, key, val, **kw):
    from spapy_ray.stages.relational import grouped_mad_outliers

    return grouped_mad_outliers(ds, key, val, **kw)


def BigramPmi(ds, **kw):
    from spapy_ray.stages.text import bigram_pmi

    return bigram_pmi(ds, **kw)


def FlowLength(r: Raster, **kw):
    from spapy_ray.stages.raster import flow_length_stats

    return flow_length_stats(r.ds, r.meta, **kw)


def BestSplit(ds, feature_col, label_col):
    from spapy_ray.stages.ml import best_split_gini

    return best_split_gini(ds, feature_col, label_col)


def StayPoints(ds, key_col, order_cols, **kw):
    from spapy_ray.stages.spatialstats import stay_points

    return stay_points(ds, key_col, order_cols, **kw)


def ExactRanks(ds, col, ranks_fn, **kw):
    from spapy_ray.stages.relational import radix_exact_ranks

    return radix_exact_ranks(ds, col, ranks_fn, **kw)


def CountMinSketch(ds, key_col, **kw):
    from spapy_ray.stages.relational import count_min_sketch

    return count_min_sketch(ds, key_col, **kw)


def KnnJoinEmbeddings(left, right, **kw):
    from spapy_ray.stages.ann import knn_join_embeddings

    return knn_join_embeddings(left, right, **kw)
