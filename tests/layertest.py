"""Golden-vector harness — port of the reference's AbstractLayerTest.

Reference: src/test/java/org/openmaptiles/layers/AbstractLayerTest.java:
 - feature constructors (:121-205): point/line/polygon/closed-way/relation
 - assertFeatures (:45-56): submap equality incl. meta keys `_layer`,
   `_type`, `_minzoom`, `_maxzoom`, `_buffer`, `_minpixelsize` and the
   `"<null>"` must-be-absent sentinel.

Our `process()` runs the real Spark transform stage on a one-row documents
table (the engine's per-row invariant path, SURVEY.md §3.2) and resolves
zoom-gated specs in Python exactly as tiling/explode.py stage B does.
"""

from __future__ import annotations

import json
import math

import pyarrow as pa

from planetiler_openmaptiles_spark.datagen import _DocBuilder
from planetiler_openmaptiles_spark.features import union_features
from planetiler_openmaptiles_spark.layers import Config, LayerContext, transform_all
from planetiler_openmaptiles_spark.spans import decode_documents

WORLD_CIRC = 40075016.686

_TYPE_OF_FORM = {
    "point": "point",
    "centroid": "point",
    "point_on_surface": "point",
    "centroid_if_convex": "point",
    "line": "line",
    "polygon": "polygon",
}


def world_to_lonlat(x: float, y: float) -> tuple[float, float]:
    lon = x * 360.0 - 180.0
    lat = 90.0 - 360.0 * math.atan(math.exp((y - 0.5) * 2 * math.pi)) / math.pi
    return lon, lat


def world_rect_wkt(a: float, b: float) -> str:
    """TestUtils.rectangle(a, b) in world coords → lon/lat WKT."""
    pts = [(a, a), (b, a), (b, b), (a, b), (a, a)]
    ll = [world_to_lonlat(x, y) for x, y in pts]
    return "POLYGON ((" + ", ".join(f"{x:.12f} {y:.12f}" for x, y in ll) + "))"


def latlon_rect_wkt(a: float, b: float) -> str:
    """TestUtils.rectangle used directly as lat/lon degrees."""
    return (
        f"POLYGON (({a} {a}, {b} {a}, {b} {b}, {a} {b}, {a} {a}))"
    )


def line_with_length_wkt(meters: float) -> str:
    """AbstractLayerTest.latLonLineWithLength: world line at (0.5, 0.5) with
    world span = metersToPixelAtEquator(0, meters) (NB the reference's test
    constructor inflates by 256× — we reproduce it exactly)."""
    dx = meters * 256.0 / WORLD_CIRC
    (x0, y0), (x1, y1) = world_to_lonlat(0.5, 0.5), world_to_lonlat(0.5 + dx, 0.5)
    return f"LINESTRING ({x0:.12f} {y0:.12f}, {x1:.12f} {y1:.12f})"


class Feat(dict):
    """One rendered feature as a flat dict (attrs + meta keys)."""


class LayerHarness:
    def __init__(self, spark, config: Config | None = None):
        self.spark = spark
        self.config = config or Config()

    def process(self, docs: list[dict], side: dict | None = None) -> "FeatureSet":
        """docs: list of dicts with keys source, source_layer, elem_id, tags,
        wkt, rels, media."""
        b = _DocBuilder()
        for d in docs:
            b.add(
                d.get("source", "osm"),
                d.get("source_layer"),
                d.get("elem_id", 0),
                d.get("tags", {}),
                d["wkt"],
                d.get("rels"),
                d.get("media"),
            )
        import pandas as pd
        from pyspark.sql import types as T
        from planetiler_openmaptiles_spark.spans import SPAN_SCHEMA

        schema = T.StructType(
            [T.StructField("doc_id", T.StringType()), T.StructField("spans", SPAN_SCHEMA)]
        )
        pdf = pd.DataFrame({"doc_id": b.doc_ids, "spans": [
            [(s0["kind"], s0["text"], s0["media_ref"], s0["offset"]) for s0 in spans]
            for spans in b.spans
        ]})
        docs_df = self.spark.createDataFrame(pdf, schema=schema)
        from planetiler_openmaptiles_spark.layers.util import names_map

        feats = decode_documents(docs_df).withColumn("names", names_map())
        ctx = LayerContext(spark=self.spark, features=feats, side=side or {}, config=self.config)
        rendered = union_features(transform_all(ctx))
        return FeatureSet([r.asDict(recursive=True) for r in rendered.collect()])


class FeatureSet:
    def __init__(self, rows: list[dict]):
        self.rows = rows

    def at_zoom(self, zoom: int, layer: str | None = None) -> list[Feat]:
        out = []
        for r in self.rows:
            if layer and r["layer"] != layer:
                continue
            f = Feat()
            attrs = dict(r["attrs"] or {})
            for e in sorted(r["zattrs"] or [], key=lambda e: e["minzoom"]):
                if e["minzoom"] <= zoom:
                    attrs[e["key"]] = e["value"]
            f.update(attrs)
            f["_layer"] = r["layer"]
            f["_type"] = _TYPE_OF_FORM[r["form"]]
            f["_minzoom"] = r["minzoom"]
            f["_maxzoom"] = r["maxzoom"]
            f["_buffer"] = _buffer_at(r, zoom)
            f["_minpixelsize"] = _mps_at(r, zoom)
            f["_sortkey"] = r["sort_key"]
            f["_elem_id"] = r["elem_id"]
            f["_doc_id"] = r["doc_id"]
            gs, gl = None, 0
            for g in r.get("grid") or []:
                if g["minzoom"] <= zoom <= g["maxzoom"]:
                    gs, gl = g["size"], g["limit"]
                    break
            f["_labelgrid_size"] = gs
            f["_labelgrid_limit"] = gl
            out.append(f)
        return out

    def all_features(self) -> list[dict]:
        return self.rows


def _buffer_at(r: dict, zoom: int) -> float:
    for o in r.get("buffer_overrides") or []:
        if o["zoom"] == zoom:
            return o["size"]
    return r["buffer_px"]


def _mps_at(r: dict, zoom: int) -> float:
    best = None
    for o in sorted(r.get("mps_overrides") or [], key=lambda o: o["below_zoom"]):
        if zoom <= o["below_zoom"]:
            best = o["size"]
            break
    return r["min_pixel_size"] if best is None else best


def assert_features(expected: list[dict], actual: list[Feat], exact_count: bool = True):
    """Port of AbstractLayerTest.assertFeatures: positional submap match."""
    if exact_count:
        assert len(actual) == len(expected), (
            f"expected {len(expected)} features, got {len(actual)}:\n"
            + "\n".join(json.dumps(a, default=str) for a in actual)
        )
    for i, exp in enumerate(expected):
        act = actual[i]
        for k, v in exp.items():
            if v == "<null>":
                assert k not in act or act[k] is None, f"feature {i}: expected {k} absent, got {act.get(k)!r}"
            else:
                got = act.get(k)
                if isinstance(v, (int, float)) and not isinstance(v, bool) and k not in (
                    "_minzoom", "_maxzoom",
                ):
                    assert got is not None, f"feature {i}: missing {k} (have {sorted(act)})"
                    assert math.isclose(float(got), float(v), rel_tol=1e-9, abs_tol=1e-9), (
                        f"feature {i}: {k} expected {v!r} got {got!r}"
                    )
                else:
                    assert str(got) == str(v), f"feature {i}: {k} expected {v!r} got {got!r}\nfull: {act}"
