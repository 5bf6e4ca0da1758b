"""Native GeoJSON (RFC 7946) reader/writer — stdlib json only.

The reference loads/saves whatever vector format fiona's drivers
expose (SpaVectors.py:195-222 Load keeps `TheShapefile.driver` and
writes it back at :263); GeoJSON is the most common of those after
the shapefile. This module implements it directly:

- FeatureCollection / single Feature / bare geometry → Arrow table
  with a WKB ``geom_wkb`` column (the engine convention: loaded
  layers plug into every vector stage) + one column per property;
- all RFC geometry types both ways (Point, LineString, Polygon,
  MultiPoint, MultiLineString, MultiPolygon) via kernels/wkb;
- floats round-trip exactly (json shortest-repr doubles).

Scale note: one .geojson is a single sequential text file (no
internal chunking), so reading is a driver-side parse →
``ray.data.from_arrow`` — the same boundary the shapefile reader and
the reference's fiona path have. Big layers should be converted to
parquet once and read distributed afterwards.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from spapy_ray.kernels import wkb


def _geom_to_wkb(geom: dict | None) -> bytes | None:
    if geom is None:
        return None
    t = geom["type"]
    c = geom["coordinates"]
    if t == "Point":
        return wkb.encode("Point", (float(c[0]), float(c[1])))
    if t in ("LineString", "MultiPoint"):
        return wkb.encode(t, np.asarray(c, dtype=np.float64).reshape(-1, 2))
    if t in ("Polygon", "MultiLineString"):
        return wkb.encode(t, [np.asarray(r, dtype=np.float64).reshape(-1, 2)
                              for r in c])
    if t == "MultiPolygon":
        return wkb.encode(t, [[np.asarray(r, dtype=np.float64).reshape(-1, 2)
                               for r in poly] for poly in c])
    raise NotImplementedError(f"GeoJSON geometry type {t!r}")


def _wkb_to_geom(buf: bytes | None) -> dict | None:
    if buf is None:
        return None
    t, v = wkb.decode(buf)
    if t == "Point":
        coords = [v[0], v[1]]
    elif t in ("LineString", "MultiPoint"):
        coords = np.asarray(v).tolist()
    elif t in ("Polygon", "MultiLineString"):
        coords = [np.asarray(r).tolist() for r in v]
    else:  # MultiPolygon
        coords = [[np.asarray(r).tolist() for r in poly] for poly in v]
    return {"type": t, "coordinates": coords}


def read_geojson(path: str, geom_col: str = "geom_wkb") \
        -> tuple[pa.Table, dict]:
    """layer.geojson → (Arrow table with WKB ``geom_col`` + property
    columns, metadata {"crs": ...} when the legacy member is present)."""
    with open(path, encoding="utf-8") as f:
        doc = json.load(f)
    if doc.get("type") == "FeatureCollection":
        feats = doc["features"]
    elif doc.get("type") == "Feature":
        feats = [doc]
    else:  # bare geometry
        feats = [{"type": "Feature", "geometry": doc, "properties": {}}]

    geoms = [_geom_to_wkb(ft.get("geometry")) for ft in feats]
    prop_keys: list[str] = []
    for ft in feats:
        for k in (ft.get("properties") or {}):
            if k not in prop_keys:
                prop_keys.append(k)
    cols: dict[str, object] = {
        geom_col: pa.array(geoms, type=pa.binary())}
    for k in prop_keys:
        cols[k] = pa.array([(ft.get("properties") or {}).get(k)
                            for ft in feats])
    meta = {}
    if "crs" in doc:
        meta["crs"] = doc["crs"]
    return pa.table(cols), meta


def write_geojson(tbl: pa.Table, path: str, *, crs=None,
                  geom_col: str = "geom_wkb") -> None:
    """Arrow table (WKB ``geom_col`` + attribute columns) →
    FeatureCollection. Property values pass through ``as_py`` so
    timestamps/decimals degrade to their JSON string/number forms."""
    geoms = tbl.column(geom_col).to_pylist()
    attrs = {c: tbl.column(c).to_pylist()
             for c in tbl.column_names if c != geom_col}
    feats = []
    for i, g in enumerate(geoms):
        props = {}
        for k, vals in attrs.items():
            v = vals[i]
            if isinstance(v, bytes):
                v = v.hex()
            elif v is not None and not isinstance(v, (str, int, float, bool)):
                v = str(v)
            props[k] = v
        feats.append({"type": "Feature",
                      "geometry": _wkb_to_geom(g),
                      "properties": props})
    doc: dict = {"type": "FeatureCollection", "features": feats}
    if crs is not None:
        doc["crs"] = crs
    with open(path, "w", encoding="utf-8") as f:
        json.dump(doc, f, separators=(",", ":"))
