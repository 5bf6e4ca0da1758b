"""GetInput path dispatch (SpaBase.py:131-155): the reference routes a
string path by extension to SpaDatasetVector (.shp) or
SpaDatasetRaster (anything else), and passes dataset objects through
unchanged. The engine's equivalents are Dataset-producing readers:

    .parquet file/dir → ray.data.read_parquet  (vector/feature table;
                        the engine's native format — VectorMeta is
                        recovered from the footer when present)
    .csv              → ray.data.read_csv
    .json / .jsonl    → ray.data.read_json
    tile table dir with _raster_meta.json → raster tile Dataset +
                        RasterMeta
    ray.data.Dataset  → passed through (reference's non-str branch)

    .shp              → native spec parser (sources/shapefile.py,
                        no fiona) → WKB `geometry` + attribute table
    .asc              → native AAIGrid parser (sources/aaigrid.py,
                        no GDAL) → (tile Dataset, RasterMeta)

GeoTIFF/HFA still need GDAL, which this environment deliberately
excludes (SURVEY.md env constraint): those extensions raise with a
clear message naming the integration point rather than silently
misloading.
"""

from __future__ import annotations

import json
import os


def write_raster(ds, out_dir: str, meta) -> None:
    """Persist a raster tile table + its grid metadata (the engine's
    raster Save; SpaRasters.py Save → GDAL file)."""
    from dataclasses import asdict

    os.makedirs(out_dir, exist_ok=True)
    ds.write_parquet(out_dir)
    with open(os.path.join(out_dir, "_raster_meta.json"), "w") as f:
        json.dump(asdict(meta), f)


def read_raster(path: str):
    """→ (tile Dataset, RasterMeta)."""
    import ray.data as rd

    from spapy_ray.sources.rasters import RasterMeta

    with open(os.path.join(path, "_raster_meta.json")) as f:
        meta = RasterMeta(**json.load(f))
    files = [os.path.join(path, f) for f in sorted(os.listdir(path))
             if f.endswith(".parquet")]
    return rd.read_parquet(files), meta


def get_input(source):
    """Path / Dataset → Dataset (plus metadata where applicable).

    Returns the input unchanged when it is already a Dataset (the
    reference's isinstance(str) branch, SpaBase.py:143); for paths,
    routes by extension. Raster directories return (Dataset,
    RasterMeta); everything else returns a Dataset.
    """
    if not isinstance(source, (str, os.PathLike)):
        return source                           # already a dataset/object
    path = str(source)
    if os.path.isdir(path):
        if os.path.exists(os.path.join(path, "_raster_meta.json")):
            return read_raster(path)
        import ray.data as rd

        return rd.read_parquet(path)
    ext = os.path.splitext(path)[1].lower()
    import ray.data as rd

    if ext == ".parquet":
        return rd.read_parquet(path)
    if ext == ".csv":
        return rd.read_csv(path)
    if ext in (".json", ".jsonl"):
        return rd.read_json(path)
    if ext == ".geojson":
        # native RFC 7946 parser — no fiona (sources/geojson.py)
        from spapy_ray.sources.geojson import read_geojson

        tbl, _meta = read_geojson(path)
        return rd.from_arrow(tbl)
    if ext == ".gpkg":
        # native OGC GeoPackage parser — sqlite3 stdlib, no GDAL
        # (sources/gpkg.py)
        from spapy_ray.sources.gpkg import read_gpkg

        return rd.from_arrow(read_gpkg(path))
    if ext == ".shp":
        # native spec parser — no fiona (sources/shapefile.py).
        # Layers with a .shx companion above the cutoff stream
        # distributed (workers seek-and-parse their record ranges);
        # small layers take the driver parse (one task, no scheduling
        # overhead).
        import os as _os

        from spapy_ray.sources.shapefile import (read_shapefile,
                                                 read_shapefile_dataset)

        if _os.path.getsize(path) > 32 * 1024 * 1024 and \
                _os.path.exists(_os.path.splitext(path)[0] + ".shx"):
            ds, _meta = read_shapefile_dataset(path)
            return ds
        tbl, _meta = read_shapefile(path)
        return rd.from_arrow(tbl)
    if ext == ".asc":
        # native AAIGrid parser — no GDAL (sources/aaigrid.py)
        from spapy_ray.sources.aaigrid import read_aaigrid

        ds, meta, _nodata = read_aaigrid(path)
        return ds, meta
    if ext in (".tif", ".tiff"):
        # native baseline GeoTIFF parser — no GDAL (sources/geotiff.py)
        from spapy_ray.sources.geotiff import read_geotiff

        ds, meta, _nodata = read_geotiff(path)
        return ds, meta
    if ext == ".img":
        # native minimal Erdas HFA parser — no GDAL (sources/hfa.py)
        from spapy_ray.sources.hfa import read_hfa

        ds, meta, _nodata = read_hfa(path)
        return ds, meta
    raise ValueError(f"unrecognized input extension {ext!r} for {path!r}")
