"""GeoJSON source connector (RFC 7946).

The OpenMapTiles toolchain ships lake centerlines as GeoJSON
(`lake_centerline.geojson` in openmaptiles/openmaptiles; the reference
consumes the SHP mirror — OpenMapTilesMain.java:40-44), and planetiler
core accepts GeoJSON sources generally. Two layouts:

- **newline-delimited** (GeoJSONSeq / .geojsonl, one Feature per line) —
  the scale path: ``spark.read.text`` splits the file by line ranges and
  an Arrow-batched ``mapInPandas`` parses each executor's slice. This is
  the layout a 100 TB feature dump should use.
- **FeatureCollection** (one JSON object) — a convenience for
  dimension-scale files: the driver streams the file once to re-emit it
  as line-split features, then the same distributed parse runs. A planet
  corpus should never arrive in this layout (single-object JSON cannot be
  split); the reader warns via docstring, not at runtime.

Geometry JSON → the engine's WKT tuple form via geom/wkt.to_wkt; property
values stringify into the tags map (nested values as compact JSON).
"""

from __future__ import annotations

import json
import math
import os

import numpy as np


def _geom_to_tuple(g: dict):
    if g is None:
        return None
    t = g.get("type")
    c = g.get("coordinates")
    if t == "Point":
        return ("Point", np.asarray(c, dtype=np.float64)[:2])
    if t == "MultiPoint":
        return ("MultiPoint", np.asarray(c, dtype=np.float64)[:, :2])
    if t == "LineString":
        return ("LineString", np.asarray(c, dtype=np.float64)[:, :2])
    if t == "MultiLineString":
        return ("MultiLineString", [np.asarray(l, dtype=np.float64)[:, :2] for l in c])
    if t == "Polygon":
        return ("Polygon", [np.asarray(r, dtype=np.float64)[:, :2] for r in c])
    if t == "MultiPolygon":
        return ("MultiPolygon",
                [[np.asarray(r, dtype=np.float64)[:, :2] for r in p] for p in c])
    if t == "GeometryCollection":
        return ("GeometryCollection",
                [_geom_to_tuple(sub) for sub in g.get("geometries", [])])
    raise ValueError(f"unsupported GeoJSON geometry type: {t}")


def _props_to_tags(props) -> dict:
    if not props:
        return {}
    out = {}
    for k, v in props.items():
        if v is None:
            continue
        if isinstance(v, bool):
            out[str(k)] = "true" if v else "false"
        elif isinstance(v, (dict, list)):
            out[str(k)] = json.dumps(v, sort_keys=True, separators=(",", ":"))
        elif (isinstance(v, float) and math.isfinite(v)
              and abs(v) < 1e15 and v == int(v)):
            out[str(k)] = str(int(v))  # 3.0 → "3": match typed-tag coercion
        else:
            out[str(k)] = str(v)
    return out


def _is_feature_collection(path: str) -> bool:
    with open(path, "rb") as f:
        head = f.read(4096)
    # a FeatureCollection starts with one object whose "type" is
    # FeatureCollection; a .geojsonl line starts with a Feature object
    return b"FeatureCollection" in head.split(b'"features"')[0]


def _as_lines_path(path: str) -> str:
    """FeatureCollection → .geojsonl cache (driver streams once, json.load
    then one line per feature). Line files pass through. The cache lives in
    the temp dir (the input's directory may be read-only), keyed by the
    input's absolute path + mtime."""
    if not _is_feature_collection(path):
        return path
    import hashlib
    import tempfile

    key = hashlib.sha256(
        f"{os.path.abspath(path)}|{os.stat(path).st_mtime_ns}".encode()
    ).hexdigest()[:16]
    out = os.path.join(tempfile.gettempdir(), f"geojson_lines_{key}.geojsonl")
    if os.path.exists(out):
        return out
    with open(path, "r", encoding="utf-8") as f:
        fc = json.load(f)
    tmp = out + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        for feat in fc.get("features", []):
            f.write(json.dumps(feat, ensure_ascii=False, separators=(",", ":")) + "\n")
    os.replace(tmp, out)
    return out


def read_geojson(spark, path: str, partitions: int | None = None):
    """GeoJSON(.geojsonl) → DataFrame(fid long, kind string, geom_wkt
    string, attrs map<string,string>). fid = the feature's "id" member if
    integral, else a stable unique id derived from the line position (not
    necessarily dense — use an id member or elem_id_attr for joins)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from ..geom.wkt import geom_kind, to_wkt
    from .archive import materialize

    lines_path = _as_lines_path(materialize(path))
    lines = spark.read.text(lines_path).select(
        F.col("value"), F.monotonically_increasing_id().alias("_ord"))
    if partitions:
        lines = lines.repartition(partitions)

    schema = "fid long, kind string, geom_wkt string, attrs map<string,string>"
    _KIND = {"Point": "point", "MultiPoint": "point",
             "LineString": "linestring", "MultiLineString": "linestring",
             "Polygon": "polygon", "MultiPolygon": "polygon"}

    def _parse(batches):
        for pdf in batches:
            rows = {"fid": [], "kind": [], "geom_wkt": [], "attrs": []}
            for text, ord_ in zip(pdf["value"], pdf["_ord"]):
                s = text.strip().rstrip(",")
                if not s or s in ("[", "]"):
                    continue
                feat = json.loads(s)
                g = _geom_to_tuple(feat.get("geometry"))
                if g is None:
                    continue
                fid = feat.get("id")
                rows["fid"].append(int(fid) if isinstance(fid, int)
                                   else int(ord_) + 1)
                rows["kind"].append(_KIND.get(g[0], geom_kind(g)))
                rows["geom_wkt"].append(to_wkt(g))
                rows["attrs"].append(_props_to_tags(feat.get("properties")))
            yield pd.DataFrame(rows)

    return lines.mapInPandas(_parse, schema)


def geojson_to_documents(spark, path: str, source: str,
                         elem_id_attr: str | None = None,
                         partitions: int | None = None,
                         keep_attrs: bool = True):
    """GeoJSON → canonical documents(doc_id, spans) rows (FIXTURES.md §1),
    mirroring shapefile_to_documents. elem_id = the named property when
    given (lake centerlines carry OSM_ID), else the feature id/line no."""
    from pyspark.sql import functions as F

    from ..spans import reencode_spans

    df = read_geojson(spark, path, partitions)
    if elem_id_attr:
        # cast each branch BEFORE coalescing: a non-numeric attr value
        # must fall through to the fid, not become a NULL elem_id
        elem_id = F.coalesce(
            F.element_at("attrs", elem_id_attr).cast("long"),
            F.element_at("attrs", elem_id_attr.lower()).cast("long"),
            F.col("fid"),
        )
    else:
        elem_id = F.col("fid")
    feat = df.select(
        elem_id.alias("elem_id"),
        F.lit(source).alias("source"),
        F.lit("").alias("source_layer"),
        (F.col("attrs") if keep_attrs
         else F.create_map().cast("map<string,string>")).alias("tags"),
        "geom_wkt",
        F.array().cast(
            "array<struct<rel_id:long,role:string,rel_tags:map<string,string>>>"
        ).alias("rels"),
        F.array().cast("array<string>").alias("media_refs"),
    )
    return feat.select(
        F.concat_ws("/", F.lit(source), F.lit("geojson"),
                    F.col("elem_id").cast("string")).alias("doc_id"),
        reencode_spans().alias("spans"),
    )


def write_geojson(path: str, records: list, collection: bool = False) -> str:
    """records = [(attrs dict, wkt)] → .geojsonl (or a FeatureCollection
    when collection=True). Fixture writer; geometry via geom/wkt.parse_wkt."""
    from ..geom.wkt import parse_wkt

    def _tuple_to_geojson(g):
        kind, data = g
        if kind == "Point":
            return {"type": "Point", "coordinates": [float(data[0]), float(data[1])]}
        if kind in ("LineString", "MultiPoint"):
            return {"type": kind,
                    "coordinates": np.asarray(data, dtype=float).reshape(-1, 2).tolist()}
        if kind in ("Polygon", "MultiLineString"):
            return {"type": kind,
                    "coordinates": [np.asarray(r, dtype=float).reshape(-1, 2).tolist()
                                    for r in data]}
        if kind == "MultiPolygon":
            return {"type": kind,
                    "coordinates": [[np.asarray(r, dtype=float).reshape(-1, 2).tolist()
                                     for r in p] for p in data]}
        return {"type": "GeometryCollection",
                "geometries": [_tuple_to_geojson(s) for s in data]}

    feats = []
    for i, (attrs, wkt) in enumerate(records):
        g = parse_wkt(wkt)
        feats.append({"type": "Feature", "id": i + 1,
                      "geometry": _tuple_to_geojson(g) if g else None,
                      "properties": attrs})
    with open(path, "w", encoding="utf-8") as f:
        if collection:
            json.dump({"type": "FeatureCollection", "features": feats}, f,
                      ensure_ascii=False)
        else:
            for feat in feats:
                f.write(json.dumps(feat, ensure_ascii=False,
                                   separators=(",", ":")) + "\n")
    return path
