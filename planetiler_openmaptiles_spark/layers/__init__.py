"""Layer registry + shared transform context.

Each layer module mirrors one reference `Layer` class (SURVEY.md §2.10):
it exposes ``transform(ctx) -> DataFrame`` returning rendered-feature rows
(features.FEATURE_COLUMNS) and optionally registers a tile post-processor
in tiling.postprocess.POST_PROCESSORS at import time.

`LayerContext` is the Spark replacement for the reference's profile wiring
(OpenMapTilesProfile.java:59-143): it owns the decoded documents DataFrame,
lazily-cached typed table projections, the auxiliary side tables, and the
engine config knobs; layer modules never touch SparkSession directly.
"""

from __future__ import annotations

import importlib
import threading
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema.tables import table_rows

# reference layer order (OpenMapTilesSchema.createInstances,
# OpenMapTilesSchema.java:69-88)
LAYER_MODULES = [
    "water",
    "waterway",
    "landcover",
    "landuse",
    "mountain_peak",
    "park",
    "boundary",
    "aeroway",
    "transportation",
    "building",
    "water_name",
    "transportation_name",
    "place",
    "housenumber",
    "poi",
    "aerodrome_label",
]


@dataclass
class Config:
    """Engine knobs (reference arg surface, SURVEY.md §2.10)."""

    only_layers: tuple = ()
    exclude_layers: tuple = ()
    transportation_z13_paths: bool = False
    building_merge_z13: bool = True
    boundary_country_names: bool = True
    boundary_osm_only: bool = False
    transportation_name_brunnel: bool = False
    transportation_name_size_for_shield: bool = False
    transportation_name_limit_merge: bool = False
    transportation_name_minor_refs: bool = False
    transliterate: bool = True  # name:latin fallback (reference default on)
    # --languages (planetiler arg; OpenMapTilesMain.java:33): language
    # codes whose name:<code> translation keys are emitted. None = the
    # reference default list (OpenMapTilesSchema.LANGUAGES, see
    # layers/util.OMT_LANGUAGES); () = no passthrough translations.
    languages: "tuple | None" = None
    max_zoom: int = 14
    # --simplify-tolerance (reference README.md:33): px tolerance for
    # Douglas-Peucker at z<max; negative = keep all points; per-layer
    # overrides (tiling/explode.LAYER_TOLERANCE) still apply unless the
    # user set a non-default value, matching planetiler where the CLI arg
    # overrides the per-layer setPixelTolerance defaults
    simplify_tolerance: float = 0.1
    # --simplify-algorithm: "dp" (Douglas-Peucker offset criterion, the
    # reference algorithm) or "vw" (Visvalingam-Whyatt effective-area
    # criterion, the cartography-standard alternative; tolerance px maps
    # to the conventional area threshold tol**2). Beyond-reference knob;
    # both run through the same precomputed-threshold boolean filter in
    # the fused render, so the choice is wall-time-neutral
    simplify_algorithm: str = "dp"
    # --bounds (planetiler arg surface; reference README.md quickstart):
    # (lon_min, lat_min, lon_max, lat_max) — only tiles whose extent
    # intersects the box are rendered. None = whole world. The clamp is
    # applied inside the fused render per zoom (tiling/explode.
    # bounds_tile_ranges), so partial-build cost is proportional to the
    # box, not the corpus extent.
    bounds: "tuple | None" = None
    # extra custom layers (reference addons/ExtraLayers.java:12-19): import
    # paths of modules exposing LAYER_NAME + transform(ctx) and optionally
    # registering a tile post-processor at import
    addons: tuple = ()
    # real source-file connectors (OpenMapTilesMain.java:40-53): when set,
    # these REPLACE the corpus' synthesized rows for that source —
    # water_polygons documents from an ESRI shapefile (EPSG:3857 like
    # water-polygons-split-3857), the lake_centerlines side table from
    # lake_centerline.shp, the natural_earth side table from the NE sqlite
    water_shp: "str | None" = None
    lake_centerline_shp: "str | None" = None
    natural_earth_sqlite: "str | None" = None
    # lake_centerline.geojson form (openmaptiles/openmaptiles ships GeoJSON;
    # the reference consumes the SHP mirror) — mutually exclusive with
    # lake_centerline_shp
    lake_centerline_geojson: "str | None" = None
    # persisted wikidata fetch cache (OpenMapTilesMain.java:34-35
    # wikidata_names.json) replacing the corpus wikidata side table
    wikidata_json: "str | None" = None
    # mid-zoom resume (north-rule checkpoint granularity): when set AND a
    # checkpoint dir is active, the tile finalize/reduce phase runs as one
    # checkpoint stage per inclusive zoom band, e.g. ((0,12),(13,13),
    # (14,14)) — a kill during the z14 reduce resumes with z0-13 already
    # on disk. Bands must cover 0..max_zoom disjointly. () = single-pass
    # finalize (the default; fewer exchanges, no mid-phase resume).
    finalize_zoom_bands: tuple = ()

    def active_layers(self) -> list[str]:
        names = [l for l in LAYER_MODULES if not self.only_layers or l in self.only_layers]
        return [l for l in names if l not in self.exclude_layers]


@dataclass
class LayerContext:
    spark: object
    features: DataFrame  # decoded documents (spans.decode_documents output)
    side: dict = field(default_factory=dict)  # side tables by name
    config: Config = field(default_factory=Config)
    _tables: dict = field(default_factory=dict)
    _shared: dict = field(default_factory=dict)
    # layer transforms may run from concurrent driver threads (pipeline
    # submits per-layer checkpoint stages in parallel) — guard the lazily
    # built shared intermediates so builders run exactly once
    _lock: threading.RLock = field(default_factory=threading.RLock)  # reentrant: builders call table()

    def table(self, name: str) -> DataFrame:
        with self._lock:
            if name not in self._tables:
                self._tables[name] = table_rows(self.features, name)
            return self._tables[name]

    def natural_earth(self, *source_layers: str) -> DataFrame:
        """NE rows from the document stream (source dispatch — S3)."""
        return self.features.filter(
            (F.col("source") == "natural_earth") & F.col("source_layer").isin(*source_layers)
        )

    def source(self, name: str) -> DataFrame:
        return self.features.filter(F.col("source") == name)

    def shared(self, key: str, builder):
        """Cross-layer shared intermediates (J9: transportation_name reuses
        transportation's route join — OpenMapTilesProfile.java:86-93)."""
        with self._lock:
            if key not in self._shared:
                self._shared[key] = builder()
            return self._shared[key]


def load_addon_modules(config: Config) -> list:
    """Import the configured addon layer modules (absolute import paths).
    Each must expose ``LAYER_NAME: str`` and ``transform(ctx) -> DataFrame``;
    importing may register a post-processor, exactly like built-in layers."""
    mods = []
    for path in config.addons:
        mod = importlib.import_module(path)
        if not hasattr(mod, "LAYER_NAME") or not hasattr(mod, "transform"):
            raise ValueError(f"addon {path!r} must define LAYER_NAME and transform(ctx)")
        mods.append(mod)
    return mods


def layer_output(ctx: LayerContext, name: str, mod) -> DataFrame:
    """One layer's rendered-feature DataFrame, cached on the context —
    the plan is a pure function of (ctx, layer), so repeated builds in a
    long-lived session (bench loops, incremental drivers, resume) skip
    the per-layer driver plan construction entirely."""
    return ctx.shared(f"__layer_out_{name}", lambda: mod.transform(ctx))


def transform_all(ctx: LayerContext) -> list[DataFrame]:
    """Run every active layer's transform; returns rendered-feature DFs."""
    out = []
    for name in ctx.config.active_layers():
        mod = importlib.import_module(f".{name}", __package__)
        df = layer_output(ctx, name, mod)
        if df is not None:
            out.append(df)
    for mod in load_addon_modules(ctx.config):
        df = layer_output(ctx, f"addon_{mod.LAYER_NAME}", mod)
        if df is not None:
            out.append(df)
    return out
