"""Native OGC GeoPackage (.gpkg) vector I/O — sqlite3 is stdlib.

The reference loads vectors through fiona/GDAL, which read GeoPackage
transparently (SpaBase.py GetInput routes by extension); this module
implements the public OGC GeoPackage 1.x encoding directly:

- the SQLite container with the GPKG application_id,
- the required metadata tables (gpkg_spatial_ref_sys, gpkg_contents,
  gpkg_geometry_columns),
- the GeoPackageBinary geometry blob ("GP" magic, version 0, flags
  byte with byte-order + envelope-indicator bits, srs_id, optional
  XY envelope) wrapping standard WKB — decoded/encoded with the
  repo's own WKB codec (kernels/wkb.py).

Profile written here: one features layer, XY envelope (indicator 1),
little-endian headers, undefined-cartesian srs (srs_id -1, the spec's
"undefined cartesian coordinate reference system" row) — matching the
engine's local fixed-point zone plane. Readers accept any srs_id and
either envelope indicator 0 or 1, both header byte orders.
"""

from __future__ import annotations

import sqlite3
import struct

import numpy as np
import pyarrow as pa

from spapy_ray.kernels import geom as gkern
from spapy_ray.kernels import wkb as wkbmod

_GPKG_APP_ID = 0x47504B47           # "GPKG"


def _gpb_encode(wkb: bytes, srs_id: int = -1) -> bytes:
    """WKB → GeoPackageBinary blob with an XY envelope header."""
    mp = wkbmod.as_multipolygon(wkb)
    minx, miny, maxx, maxy = gkern.multipolygon_bbox(mp)
    # flags: bit0 = 1 (little-endian header), envelope indicator 1
    # (XY) in bits 1-3
    flags = 0b0000_0011
    return (b"GP" + bytes([0, flags])
            + struct.pack("<i", srs_id)
            + struct.pack("<dddd", minx, maxx, miny, maxy)
            + wkb)


def _gpb_decode(blob: bytes) -> bytes:
    """GeoPackageBinary blob → the contained WKB."""
    if blob[:2] != b"GP":
        raise ValueError("not a GeoPackage geometry blob (bad magic)")
    version, flags = blob[2], blob[3]
    if version != 0:
        raise ValueError(f"unsupported GeoPackageBinary version "
                         f"{version}")
    env = (flags >> 1) & 0b111
    if env not in (0, 1):
        raise ValueError(f"unsupported envelope indicator {env} "
                         "(XY or none)")
    header = 8 + (32 if env == 1 else 0)
    return blob[header:]


def write_gpkg(tbl: pa.Table, path: str, *, layer: str = "zones",
               geom_col: str = "geom_wkb",
               geometry_type: str = "MULTIPOLYGON",
               srs_id: int = -1) -> None:
    """Arrow table with a WKB column → a valid GeoPackage."""
    con = sqlite3.connect(path)
    try:
        con.execute(f"PRAGMA application_id = {_GPKG_APP_ID}")
        con.execute("PRAGMA user_version = 10300")       # GPKG 1.3
        con.execute(
            "CREATE TABLE gpkg_spatial_ref_sys ("
            "srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY, "
            "organization TEXT NOT NULL, "
            "organization_coordsys_id INTEGER NOT NULL, "
            "definition TEXT NOT NULL, description TEXT)")
        # the spec's two required rows + undefined cartesian
        con.executemany(
            "INSERT INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
            [("Undefined cartesian SRS", -1, "NONE", -1, "undefined",
              "undefined cartesian coordinate reference system"),
             ("Undefined geographic SRS", 0, "NONE", 0, "undefined",
              "undefined geographic coordinate reference system"),
             ("WGS 84 geodetic", 4326, "EPSG", 4326,
              "GEOGCS[\"WGS 84\"]", "longitude/latitude")])
        con.execute(
            "CREATE TABLE gpkg_contents ("
            "table_name TEXT NOT NULL PRIMARY KEY, "
            "data_type TEXT NOT NULL, identifier TEXT UNIQUE, "
            "description TEXT DEFAULT '', "
            "last_change DATETIME NOT NULL DEFAULT "
            "(strftime('%Y-%m-%dT%H:%M:%fZ','now')), "
            "min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, "
            "srs_id INTEGER)")
        con.execute(
            "CREATE TABLE gpkg_geometry_columns ("
            "table_name TEXT NOT NULL, column_name TEXT NOT NULL, "
            "geometry_type_name TEXT NOT NULL, srs_id INTEGER "
            "NOT NULL, z TINYINT NOT NULL, m TINYINT NOT NULL, "
            "CONSTRAINT pk_geom_cols PRIMARY KEY "
            "(table_name, column_name))")

        attrs = [c for c in tbl.column_names if c != geom_col]
        cols = []
        for c in attrs:
            t = tbl.schema.field(c).type
            if pa.types.is_integer(t):
                sql_t = "INTEGER"
            elif pa.types.is_floating(t):
                sql_t = "REAL"
            else:
                sql_t = "TEXT"
            cols.append(f'"{c}" {sql_t}')
        con.execute(
            f'CREATE TABLE "{layer}" (fid INTEGER PRIMARY KEY '
            f"AUTOINCREMENT, geom BLOB, {', '.join(cols)})")

        gminx = gminy = np.inf
        gmaxx = gmaxy = -np.inf
        rows = []
        wkbs = tbl.column(geom_col).to_pylist()
        attr_data = [tbl.column(c).to_pylist() for c in attrs]
        for i, w in enumerate(wkbs):
            mp = wkbmod.as_multipolygon(w)
            minx, miny, maxx, maxy = gkern.multipolygon_bbox(mp)
            gminx, gminy = min(gminx, minx), min(gminy, miny)
            gmaxx, gmaxy = max(gmaxx, maxx), max(gmaxy, maxy)
            rows.append((_gpb_encode(w, srs_id),
                         *(col[i] for col in attr_data)))
        ph = ", ".join("?" * (1 + len(attrs)))
        con.executemany(
            f'INSERT INTO "{layer}" (geom, '
            f'{", ".join(chr(34) + c + chr(34) for c in attrs)}) '
            f"VALUES ({ph})", rows)
        con.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, "
            "identifier, min_x, min_y, max_x, max_y, srs_id) "
            "VALUES (?, 'features', ?, ?, ?, ?, ?, ?)",
            (layer, layer, float(gminx), float(gminy), float(gmaxx),
             float(gmaxy), srs_id))
        con.execute(
            "INSERT INTO gpkg_geometry_columns VALUES "
            "(?, 'geom', ?, ?, 0, 0)",
            (layer, geometry_type, srs_id))
        con.commit()
    finally:
        con.close()


def read_gpkg(path: str, layer: str | None = None,
              geom_col: str = "geom_wkb") -> pa.Table:
    """GeoPackage → Arrow table (attrs + WKB column). Verifies the
    application_id and reads the layer registration from
    gpkg_geometry_columns (first features layer when unnamed)."""
    con = sqlite3.connect(path)
    try:
        (app_id,) = con.execute(
            "PRAGMA application_id").fetchone()
        if app_id != _GPKG_APP_ID:
            raise ValueError(
                f"not a GeoPackage (application_id {app_id:#x})")
        reg = con.execute(
            "SELECT table_name, column_name FROM "
            "gpkg_geometry_columns").fetchall()
        if not reg:
            raise ValueError("GeoPackage has no registered "
                             "geometry layers")
        if layer is None:
            layer, gcol = reg[0]
        else:
            match = [r for r in reg if r[0] == layer]
            if not match:
                raise ValueError(f"layer {layer!r} not registered")
            gcol = match[0][1]
        info = con.execute(f'PRAGMA table_info("{layer}")').fetchall()
        attrs = [r[1] for r in info
                 if r[1] not in (gcol, "fid")]
        sel = ", ".join([f'"{gcol}"'] + [f'"{c}"' for c in attrs])
        rows = con.execute(
            f'SELECT {sel} FROM "{layer}" ORDER BY fid').fetchall()
    finally:
        con.close()
    cols: dict[str, list] = {c: [] for c in attrs}
    wkbs = []
    for r in rows:
        wkbs.append(_gpb_decode(r[0]))
        for c, v in zip(attrs, r[1:]):
            cols[c].append(v)
    out = {}
    for c in attrs:
        out[c] = pa.array(cols[c])
    out[geom_col] = pa.array(wkbs, type=pa.binary())
    return pa.table(out)


def write_gpkg_tiles(ds, meta, path: str, *, layer: str = "tiles",
                     png_col: str = "png", zoom: int = 0,
                     srs_id: int = -1) -> None:
    """Rendered tile Dataset (tx, ty, png) + RasterMeta → a
    GeoPackage TILES layer (the standard tile-pyramid container:
    gpkg_tile_matrix_set + gpkg_tile_matrix + a zoom/column/row/blob
    user table). Tiles stream batch-at-a-time into the insert — the
    driver never holds the pyramid."""
    T = meta.tile_size
    con = sqlite3.connect(path)
    try:
        con.execute(f"PRAGMA application_id = {_GPKG_APP_ID}")
        con.execute("PRAGMA user_version = 10300")
        con.execute(
            "CREATE TABLE gpkg_spatial_ref_sys ("
            "srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY, "
            "organization TEXT NOT NULL, "
            "organization_coordsys_id INTEGER NOT NULL, "
            "definition TEXT NOT NULL, description TEXT)")
        con.executemany(
            "INSERT INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
            [("Undefined cartesian SRS", -1, "NONE", -1, "undefined",
              None),
             ("Undefined geographic SRS", 0, "NONE", 0, "undefined",
              None),
             ("WGS 84 geodetic", 4326, "EPSG", 4326,
              "GEOGCS[\"WGS 84\"]", None)])
        min_x = meta.x_min
        max_x = meta.x_min + meta.pixel_w * meta.width
        max_y = meta.y_max
        min_y = meta.y_max + meta.pixel_h * meta.height
        con.execute(
            "CREATE TABLE gpkg_contents (table_name TEXT NOT NULL "
            "PRIMARY KEY, data_type TEXT NOT NULL, identifier TEXT "
            "UNIQUE, description TEXT DEFAULT '', last_change "
            "DATETIME NOT NULL DEFAULT "
            "(strftime('%Y-%m-%dT%H:%M:%fZ','now')), min_x DOUBLE, "
            "min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, "
            "srs_id INTEGER)")
        con.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, "
            "identifier, min_x, min_y, max_x, max_y, srs_id) "
            "VALUES (?, 'tiles', ?, ?, ?, ?, ?, ?)",
            (layer, layer, min_x, min_y, max_x, max_y, srs_id))
        con.execute(
            "CREATE TABLE gpkg_tile_matrix_set (table_name TEXT NOT "
            "NULL PRIMARY KEY, srs_id INTEGER NOT NULL, min_x DOUBLE "
            "NOT NULL, min_y DOUBLE NOT NULL, max_x DOUBLE NOT NULL, "
            "max_y DOUBLE NOT NULL)")
        con.execute(
            "INSERT INTO gpkg_tile_matrix_set VALUES (?,?,?,?,?,?)",
            (layer, srs_id, min_x, min_y, max_x, max_y))
        con.execute(
            "CREATE TABLE gpkg_tile_matrix (table_name TEXT NOT "
            "NULL, zoom_level INTEGER NOT NULL, matrix_width INTEGER "
            "NOT NULL, matrix_height INTEGER NOT NULL, tile_width "
            "INTEGER NOT NULL, tile_height INTEGER NOT NULL, "
            "pixel_x_size DOUBLE NOT NULL, pixel_y_size DOUBLE NOT "
            "NULL, CONSTRAINT pk_ttm PRIMARY KEY "
            "(table_name, zoom_level))")
        con.execute(
            "INSERT INTO gpkg_tile_matrix VALUES (?,?,?,?,?,?,?,?)",
            (layer, zoom, meta.tiles_x, meta.tiles_y, T, T,
             meta.pixel_w, abs(meta.pixel_h)))
        con.execute(
            f'CREATE TABLE "{layer}" (id INTEGER PRIMARY KEY '
            "AUTOINCREMENT, zoom_level INTEGER NOT NULL, "
            "tile_column INTEGER NOT NULL, tile_row INTEGER NOT "
            "NULL, tile_data BLOB NOT NULL, UNIQUE (zoom_level, "
            "tile_column, tile_row))")
        for b in ds.iter_batches(batch_format="pyarrow"):
            rows = list(zip(
                [zoom] * len(b),
                b.column("tx").to_pylist(),
                b.column("ty").to_pylist(),
                b.column(png_col).to_pylist()))
            con.executemany(
                f'INSERT INTO "{layer}" (zoom_level, tile_column, '
                "tile_row, tile_data) VALUES (?,?,?,?)", rows)
        con.commit()
    finally:
        con.close()


def read_gpkg_tiles(path: str, layer: str | None = None) -> pa.Table:
    """GeoPackage tiles layer → Arrow (zoom_level, tile_column,
    tile_row, tile_data) plus the tile-matrix georeferencing checked
    present."""
    con = sqlite3.connect(path)
    try:
        (app_id,) = con.execute("PRAGMA application_id").fetchone()
        if app_id != _GPKG_APP_ID:
            raise ValueError(
                f"not a GeoPackage (application_id {app_id:#x})")
        reg = con.execute(
            "SELECT table_name FROM gpkg_contents "
            "WHERE data_type = 'tiles'").fetchall()
        if not reg:
            raise ValueError("GeoPackage has no tiles layers")
        layer = layer or reg[0][0]
        n_tm = con.execute(
            "SELECT count(*) FROM gpkg_tile_matrix WHERE "
            "table_name = ?", (layer,)).fetchone()[0]
        if n_tm == 0:
            raise ValueError(f"tiles layer {layer!r} has no "
                             "gpkg_tile_matrix rows")
        rows = con.execute(
            f'SELECT zoom_level, tile_column, tile_row, tile_data '
            f'FROM "{layer}" ORDER BY zoom_level, tile_row, '
            "tile_column").fetchall()
    finally:
        con.close()
    return pa.table({
        "zoom_level": pa.array([r[0] for r in rows],
                               type=pa.int64()),
        "tile_column": pa.array([r[1] for r in rows],
                                type=pa.int64()),
        "tile_row": pa.array([r[2] for r in rows], type=pa.int64()),
        "tile_data": pa.array([r[3] for r in rows],
                              type=pa.binary())})


# ------------------------------------------------------------------
# GeoParquet (public spec: geoparquet.org 1.x) — the modern parquet
# convention for vector layers: file-level "geo" metadata naming the
# primary WKB column, its geometry types and bbox.

def write_geoparquet(tbl: pa.Table, path: str, *,
                     geom_col: str = "geom_wkb",
                     geometry_types=("MultiPolygon",)) -> None:
    """Arrow table with a WKB column → parquet with GeoParquet file
    metadata (single file; the engine's partitioned writes go through
    state/manifest — this is the interchange form)."""
    import json

    import pyarrow.parquet as pq

    gminx = gminy = np.inf
    gmaxx = gmaxy = -np.inf
    for w in tbl.column(geom_col).to_pylist():
        minx, miny, maxx, maxy = gkern.multipolygon_bbox(
            wkbmod.as_multipolygon(w))
        gminx, gminy = min(gminx, minx), min(gminy, miny)
        gmaxx, gmaxy = max(gmaxx, maxx), max(gmaxy, maxy)
    geo = {
        "version": "1.1.0",
        "primary_column": geom_col,
        "columns": {geom_col: {
            "encoding": "WKB",
            "geometry_types": list(geometry_types),
            "bbox": [float(gminx), float(gminy),
                     float(gmaxx), float(gmaxy)],
        }},
    }
    md = dict(tbl.schema.metadata or {})
    md[b"geo"] = json.dumps(geo).encode()
    pq.write_table(tbl.replace_schema_metadata(md), path)


def read_geoparquet(path: str) -> tuple[pa.Table, dict]:
    """GeoParquet → (table, parsed "geo" metadata). Raises when the
    file carries no geo metadata or names a missing column."""
    import json

    import pyarrow.parquet as pq

    tbl = pq.read_table(path)
    md = tbl.schema.metadata or {}
    if b"geo" not in md:
        raise ValueError("parquet file has no GeoParquet 'geo' "
                         "metadata")
    geo = json.loads(md[b"geo"])
    col = geo.get("primary_column")
    if col not in tbl.column_names:
        raise ValueError(f"GeoParquet primary column {col!r} not in "
                         "the table")
    return tbl, geo
