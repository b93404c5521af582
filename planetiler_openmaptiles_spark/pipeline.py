"""End-to-end tile build: documents → decoded features → layers → tiles.

The Spark mirror of OpenMapTilesMain (SURVEY.md §3.1): one declarative DAG
instead of the reference's multi-pass imperative pipeline. Stage boundaries
(decode / rendered features / tile features / tiles) checkpoint through
`checkpoint.CheckpointManager` (parquet+manifest Iceberg emulation) with
lineage + row counts, so a killed job resumes from the last complete stage.

Run via spark-submit:

    spark-submit --py-files planetiler_openmaptiles_spark.zip \
        -m planetiler_openmaptiles_spark.pipeline \
        --corpus /path/corpus --out /path/tiles --checkpoints /path/ckpt

The per-row span-sequence invariant (BASELINE.json input_hint) is enforced
in `decode_stage` — any document whose re-encoded spans differ from the
original fails the run.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
from collections import OrderedDict
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .checkpoint import CheckpointManager
from .features import union_features
from .layers import Config, LayerContext, transform_all
from .spans import decode_documents, reencode_spans
from .tiling.explode import render_tiles
from .tiling.postprocess import finalize_tiles


def _parquet_row_groups(path: str) -> int:
    """Estimated total row groups under a local parquet file/dir (sampled
    driver-side footer probe). Returns a large sentinel when the layout
    cannot be inspected (remote filesystem, corrupt footer, ...)."""
    try:
        import pyarrow.parquet as _pq

        if os.path.isdir(path):
            files = sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )
        else:
            files = [path]
        if not files:
            return 1 << 30
        sample = files[:16]
        rgs = sum(_pq.ParquetFile(f).metadata.num_row_groups for f in sample)
        return int(rgs * (len(files) / len(sample)))
    except Exception:
        return 1 << 30


# Corpus spec scheme for catalog-managed tables: "table:<namespace>"
# reads documents/side tables via spark.read.table("<namespace>.<name>")
# — catalog-agnostic, so the SAME code path serves an Iceberg catalog
# (spark.sql.catalog.* configured + iceberg-spark-runtime jar, the
# production deployment in SURVEY.md §7) and plain Hive/temp-view
# catalogs in the sandbox. An empty namespace ("table:") resolves bare
# table names (temp views). Path specs keep the parquet layout guard
# below; catalog tables delegate split planning to the table format
# (Iceberg plans splits from its own file manifests, so the single-row-
# group pathology guarded below cannot occur there).
TABLE_SCHEME = "table:"

# "pbf:<path.osm.pbf>" — read the documents table straight from an OSM PBF
# extract via the block-parallel connector (sources/osm_pbf.py). Side tables
# (natural_earth, …) are simply absent, matching a planetiler run given only
# the OSM source.
PBF_SCHEME = "pbf:"


def _table_name(spec: str, name: str) -> str:
    ns = spec[len(TABLE_SCHEME):]
    return f"{ns}.{name}" if ns else name


def load_documents(spark: SparkSession, corpus_dir: str) -> DataFrame:
    if corpus_dir.startswith(TABLE_SCHEME):
        return spark.read.table(_table_name(corpus_dir, "documents"))
    if corpus_dir.startswith(PBF_SCHEME):
        from .sources.osm_pbf import pbf_to_documents

        return pbf_to_documents(spark, corpus_dir[len(PBF_SCHEME):])
    path = os.path.join(corpus_dir, "documents.parquet")
    df = spark.read.parquet(path)
    # Layout-robustness guard: Spark plans byte-range splits, but parquet
    # rows land in whole row groups — a corpus written as a few giant row
    # groups collapses the span decode and every narrow layer transform
    # onto that many tasks no matter how many executors exist (measured:
    # the 1M-doc single-row-group fixture ran the whole decode on ONE core
    # in the multi-JVM bench). One explicit exchange of the raw documents
    # is far cheaper than a serialized decode. At production scale the
    # input has thousands of files/row groups and this never fires.
    cores = spark.sparkContext.defaultParallelism
    if _parquet_row_groups(path) < cores:
        df = df.repartition(cores)
    return df


def _release_source_caches() -> None:
    """Drop source-connector caches (pbf entity/way-point persists) once
    their derived tables are on disk — a no-op for parquet/table corpora."""
    from .sources.osm_pbf import release_caches

    release_caches()


def load_side_tables(spark: SparkSession, corpus_dir: str) -> dict:
    side = {}
    for name in ("natural_earth", "lake_centerlines", "wikidata"):
        if corpus_dir.startswith(TABLE_SCHEME):
            try:
                side[name] = spark.read.table(_table_name(corpus_dir, name))
            except Exception:
                pass  # optional side table absent from the catalog
            continue
        p = os.path.join(corpus_dir, f"{name}.parquet")
        if os.path.exists(p):
            side[name] = spark.read.parquet(p)
    return side


def check_span_invariant(docs: DataFrame, feats: DataFrame) -> int:
    """Count rows violating span-sequence equality (must be 0)."""
    rebuilt = feats.withColumn("_re", reencode_spans())
    orig = docs.select("doc_id", F.array_sort(
        F.col("spans"),
        lambda a, b: F.when(a["offset"] < b["offset"], F.lit(-1))
        .when(a["offset"] > b["offset"], F.lit(1)).otherwise(F.lit(0)),
    ).alias("_orig"))
    j = rebuilt.join(orig, "doc_id")
    same = F.zip_with(
        F.col("_re"), F.col("_orig"),
        lambda a, b: a["kind"].eqNullSafe(b["kind"]) & a["text"].eqNullSafe(b["text"])
        & a["media_ref"].eqNullSafe(b["media_ref"]) & a["offset"].eqNullSafe(b["offset"]),
    )
    ok = (F.size("_re") == F.size("_orig")) & F.forall(same, lambda x: x)
    return j.filter(~ok).count()


# tables consumed ONLY by layers that ignore wikidata translations
# (Transportation / TransportationName implement IgnoreWikidata —
# OpenMapTilesProfile.java:125-128,155-165, TransportationName.java:85)
_WIKIDATA_IGNORED_TABLES = frozenset({
    "osm_highway_linestring", "osm_railway_linestring",
    "osm_aerialway_linestring", "osm_shipway_linestring",
    "osm_highway_polygon", "osm_highway_point",
})


def _cares_about_wikidata():
    """OR of every table filter whose handling layers want translations —
    the Spark form of OpenMapTilesProfile.wikidataMappings."""
    from .schema.tables import TABLES

    conds = [
        spec.mapping.col()
        for name, spec in TABLES.items()
        if name not in _WIKIDATA_IGNORED_TABLES
    ]
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return out


def with_wikidata_translations(feats: DataFrame, wikidata: DataFrame) -> DataFrame:
    """S4: join wikidata name translations onto the tag map — the Spark
    mirror of the reference's wikidata fetch + Translations provider
    (OpenMapTilesMain.java:34, OpenMapTilesProfile.java:125-128). The
    wikidata table is a small dimension → broadcast left join on the
    `wikidata` tag; matched languages surface as name:<lang> tags, which
    layers/util.names_map then emits automatically.

    Relevance prune (caresAboutWikidataTranslation): the join key is
    nulled for OSM elements matched ONLY by tables whose layers implement
    IgnoreWikidata, so the map-side hash probe is skipped for the highest-
    volume element class (roads) — at 100 TB that is a wasted per-element
    lookup on ~half the corpus."""
    wd = (
        wikidata.groupBy("qid")
        .agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(F.concat(F.lit("name:"), F.col("lang")).alias("key"),
                             F.col("name").alias("value"))
                )
            ).alias("_wd_names")
        )
    )
    qid = F.when(
        (F.col("source") == "osm") & _cares_about_wikidata(),
        F.element_at(F.col("tags"), "wikidata"),
    )
    out = feats.join(F.broadcast(wd), qid == wd["qid"], "left").drop("qid")
    # existing name:xx tags on the element win over wikidata (reference
    # Translations precedence) → concat with element tags LAST
    return out.withColumn(
        "tags",
        F.when(
            F.col("_wd_names").isNotNull(), F.map_concat(F.col("_wd_names"), F.col("tags"))
        ).otherwise(F.col("tags")),
    ).drop("_wd_names")


# Runtime SQL confs the layer expressions are written against. The engine's
# semantics are deliberately lenient (imposm3/planetiler getLong/getDouble:
# bad tag cast → null, element_at out-of-bounds → null) and zoom-gated attrs
# overwrite base attrs via map_concat (explode.py) — under Spark 4's default
# ANSI dialect those throw instead, so any entry point that accepts a
# caller-built SparkSession must pin them. All are runtime-settable.
REQUIRED_SQL_CONFS = (
    ("spark.sql.ansi.enabled", "false"),
    ("spark.sql.mapKeyDedupPolicy", "LAST_WIN"),
)


def apply_required_confs(spark: SparkSession) -> None:
    for k, v in REQUIRED_SQL_CONFS:
        if spark.conf.get(k, None) != v:
            spark.conf.set(k, v)


# (session, corpus, config, corpus-mtime) → LayerContext. A LayerContext —
# the decoded-features DataFrame plus its lazily built table/shared-plan
# caches — is an immutable bundle of logical plans, so rebuilding it per
# build only re-pays driver plan construction (~10 s of py4j + Catalyst
# analysis for the 16 layers). Long-lived sessions that build repeatedly
# (bench loops, incremental/streaming drivers, resume) reuse the plans;
# the corpus mtime keys out stale schemas if files are regenerated in
# place. Execution state is NOT cached beyond the persist marker, which
# build_tiles re-arms below. Bounded LRU: each entry pins hundreds of
# py4j-backed plan objects (and, via ctx.features, a persist marker), so
# an unbounded dict leaks in long-lived drivers that vary configs — the
# oracle board alone builds water-only / tolerance-override /
# single-layer contexts in one session. Eviction unpersists the entry's
# shared decode cache.
_CTX_CACHE: "OrderedDict" = OrderedDict()
_CTX_CACHE_MAX = 8


def _corpus_mtime(corpus_dir: str) -> int:
    try:
        if corpus_dir.startswith(PBF_SCHEME):
            return os.stat(corpus_dir[len(PBF_SCHEME):]).st_mtime_ns
        return os.stat(os.path.join(corpus_dir, "documents.parquet")).st_mtime_ns
    except OSError:
        return 0


def make_context(spark: SparkSession, corpus_dir: str, config: Config | None = None) -> LayerContext:
    cfg = config or Config()
    key = (
        id(spark),
        os.path.abspath(corpus_dir),
        _fingerprint(sorted((k, str(v)) for k, v in vars(cfg).items())),
        _corpus_mtime(corpus_dir),
    )
    ctx = _CTX_CACHE.get(key)
    if ctx is None:
        _CTX_CACHE[key] = ctx = _build_context(spark, corpus_dir, cfg)
        while len(_CTX_CACHE) > _CTX_CACHE_MAX:
            _, old_ctx = _CTX_CACHE.popitem(last=False)
            try:
                old_ctx.features.unpersist()
            except Exception:
                pass
    else:
        _CTX_CACHE.move_to_end(key)
        apply_required_confs(spark)
        sl = ctx.features.storageLevel
        if not (sl.useMemory or sl.useDisk):
            # a previous build released the shared decode cache on its way
            # out — re-arm it so this build's layer stages share one fill
            ctx.features.persist()
    return ctx


def _build_context(spark: SparkSession, corpus_dir: str, config: Config) -> LayerContext:
    apply_required_confs(spark)
    docs = load_documents(spark, corpus_dir)
    side = load_side_tables(spark, corpus_dir)
    # Real source-file connectors replace the corpus' synthesized rows for
    # their source (OpenMapTilesMain.java:40-53). All three sources flow
    # through the document stream (ctx.source dispatch), so each override
    # swaps that source's document rows wholesale.
    cfg0 = config or Config()
    if cfg0.lake_centerline_shp and cfg0.lake_centerline_geojson:
        raise ValueError(
            "lake_centerline_shp and lake_centerline_geojson are mutually"
            " exclusive — both would double every centerline document")
    if cfg0.water_shp:
        from .sources.shapefile import shapefile_to_documents

        docs = docs.filter(~F.col("doc_id").startswith("water_polygons/")).unionByName(
            shapefile_to_documents(spark, cfg0.water_shp, "water_polygons"))
    if cfg0.lake_centerline_shp:
        from .sources.shapefile import shapefile_to_lake_centerlines

        docs = docs.filter(~F.col("doc_id").startswith("lake_centerlines/")).unionByName(
            shapefile_to_lake_centerlines(spark, cfg0.lake_centerline_shp))
    if cfg0.lake_centerline_geojson:
        from .sources.geojson import geojson_to_documents

        docs = docs.filter(~F.col("doc_id").startswith("lake_centerlines/")).unionByName(
            geojson_to_documents(spark, cfg0.lake_centerline_geojson,
                                 "lake_centerlines", elem_id_attr="OSM_ID",
                                 keep_attrs=False))
    if cfg0.natural_earth_sqlite:
        from .sources.natural_earth import natural_earth_to_documents

        docs = docs.filter(~F.col("doc_id").startswith("natural_earth/")).unionByName(
            natural_earth_to_documents(spark, cfg0.natural_earth_sqlite))
    if cfg0.wikidata_json:
        from .sources.wikidata_names import read_wikidata_names

        side["wikidata"] = read_wikidata_names(spark, cfg0.wikidata_json)
    return context_from_docs(spark, docs, side, config)


def context_from_docs(
    spark: SparkSession, docs: DataFrame, side: dict, config: Config | None
) -> LayerContext:
    """documents DF (+ side tables) → LayerContext with the SAME decode /
    wikidata / i18n-names treatment as a corpus-dir build — shared by
    _build_context and the streaming incremental path so streamed tiles
    carry identical name attrs to a batch build of the same corpus."""
    # the decoded features feed 30 table projections + several plan-time
    # collects (NE registries, region polygons) — persist the decode once.
    # At full scale this is the decode-stage checkpoint instead.
    feats = decode_documents(docs)
    if "wikidata" in side:
        feats = with_wikidata_translations(feats, side["wikidata"])
    # materialize the i18n name map ONCE per element: inlining names_map into
    # every layer expression blew the generated code past the JVM 64 KB
    # method limit → interpreted fallback (~300 ms/row). The persist() below
    # is the collapse barrier that makes this a real materialization.
    from .layers.util import names_map

    cfg = config or Config()
    feats = feats.withColumn(
        "names",
        names_map(
            transliterate=cfg.transliterate,
            **(
                {}
                if cfg.languages is None
                else {"languages": cfg.languages}
            ),
        ),
    ).persist()
    return LayerContext(
        spark=spark,
        features=feats,
        side=side,
        config=config or Config(),
    )


def rendered_features(ctx: LayerContext) -> DataFrame:
    return union_features(transform_all(ctx))


def _fingerprint(*parts) -> str:
    return hashlib.sha256("|".join(str(p) for p in parts).encode()).hexdigest()[:16]


def build_tiles(
    spark: SparkSession,
    corpus_dir: str,
    config: Config | None = None,
    checkpoint_dir: str | None = None,
    check_invariant: bool = False,
) -> DataFrame:
    """documents → final per-tile features DataFrame (checkpointed)."""
    config = config or Config()
    cp = CheckpointManager(checkpoint_dir or "", enabled=bool(checkpoint_dir))
    fp = _fingerprint(corpus_dir, sorted(vars(config).items()))

    docs = load_documents(spark, corpus_dir)
    if check_invariant:
        feats = decode_documents(docs)
        bad = check_span_invariant(docs, feats)
        if bad:
            raise AssertionError(f"span-sequence invariant violated for {bad} documents")

    if checkpoint_dir:
        # one checkpoint stage per layer: Catalyst analysis/optimization cost
        # grows superlinearly with plan size — the single 16-layer union plan
        # serialized to ~26 MB and its per-action optimization dominated wall
        # time (zero core-scaling). Sixteen small plans optimize fast, fail
        # independently, and give per-layer resume + lineage. The stages are
        # submitted from CONCURRENT driver threads (Spark schedules jobs from
        # multiple threads fine) so per-stage driver analysis and the small
        # write barriers overlap instead of serializing — on a real cluster
        # this is the difference between 16 sequential barriers and ~3.
        from .features import FEATURE_COLUMNS
        import importlib
        from concurrent.futures import ThreadPoolExecutor

        names = config.active_layers()
        # import serially first: modules register post-processors at import
        mods = [importlib.import_module(f".layers.{n}", __package__) for n in names]
        from .layers import load_addon_modules

        for mod in load_addon_modules(config):
            names.append(f"addon_{mod.LAYER_NAME}")
            mods.append(mod)
        # build the decode context ONLY if some layer stage must actually
        # run — a fully-resumed build must not pay the corpus decode
        # (materializing the persist on the resume path costs the whole
        # decode scan for nothing)
        if all(cp.has(f"layer_{n}", fp) for n in names):
            ctx = None
        else:
            ctx = make_context(spark, corpus_dir, config)
            # materialize the shared decode persist once before fan-out so
            # concurrent stages hit the cache instead of racing to fill it
            ctx.features.count()

        from .layers import layer_output

        def run_stage(name, mod):
            # 8 files per layer: the 16-layer union still reads with 128-way
            # parallelism, and each render task gets a real slice of work
            # instead of a 100 KB file plus ~0.3 s of fixed task cost. At
            # 100 TB the layer outputs are large and size-based splitting
            # (maxPartitionBytes) takes over; this floor only binds when a
            # layer's output is tiny.
            return cp.stage(
                f"layer_{name}", fp,
                lambda: layer_output(ctx, name, mod).select(*FEATURE_COLUMNS),
                spark, lineage=["documents"], out_partitions=8,
            )

        # pool width >= layer count: with 8 workers the 16 stages ran in two
        # waves and the second wave's stragglers set the critical path; the
        # submit threads only drive py4j analysis + job scheduling (no GIL-
        # bound work), so one thread per layer is cheap
        with ThreadPoolExecutor(max_workers=max(len(names), 8)) as ex:
            futs = [ex.submit(run_stage, n, m) for n, m in zip(names, mods)]
            layer_dfs = [f.result() for f in futs]
        if ctx is not None:
            # every layer output is on disk now; the decoded-corpus cache is
            # dead weight from here on. Freeing it matters on real executors:
            # blocks above the storageFraction floor resist eviction, so a
            # resident-but-unused cache squeezes execution memory for the
            # render/reduce phases on every executor in the cluster.
            ctx.features.unpersist()
            _release_source_caches()
        rendered = union_features(layer_dfs)
    else:

        def _rendered():
            ctx = make_context(spark, corpus_dir, config)
            return rendered_features(ctx)

        rendered = cp.stage("rendered_features", fp, _rendered, spark, lineage=["documents"])
        if checkpoint_dir:
            # rendered_features is on disk; the pbf entity/way-point caches
            # are dead weight now. Without checkpoints the plan is still
            # lazy here — the caches stay pinned until the caller's sink
            # action (main() releases them after write_tiles).
            _release_source_caches()
    tile_feats = cp.stage(
        "tile_features", fp,
        lambda: render_tiles(rendered, config.max_zoom, config.simplify_tolerance,
                             config.bounds, config.simplify_algorithm),
        spark, lineage=["rendered_features"],
    )
    # reduce-exchange width hint from the corpus size on disk (stat only,
    # no job): ~one partition per 256 KB of compressed input (the exploded
    # tile-feature table is ~3.5x the corpus bytes) keeps the pandas
    # dispatch straggler-proof on fresh builds, where the cached plan
    # hides inputFiles() from finalize_tiles' own probe. Small corpora
    # fall back to the session default inside finalize_tiles.
    try:
        doc_dir = os.path.join(corpus_dir, "documents.parquet")
        sz = sum(
            os.path.getsize(os.path.join(doc_dir, f))
            for f in os.listdir(doc_dir)
        ) if os.path.isdir(doc_dir) else os.path.getsize(doc_dir)
        size_hint = int(sz // (256 * 1024))
    except OSError:
        size_hint = 0
    bands = tuple(config.finalize_zoom_bands or ())
    if checkpoint_dir and bands:
        # mid-zoom resume: one finalize checkpoint stage per zoom band.
        # The reduce is zoom-separable (every window/groupBy key starts
        # with z), so band outputs are exactly the single-pass rows split
        # by z — parity-tested in test_e2e_pipeline. Total shuffled bytes
        # match the single pass; the extra cost is per-stage fixed
        # overhead plus writing the finalized table once before the sink,
        # which is the price of not re-running an hours-long reduce after
        # a mid-phase kill at 100 TB.
        covered = sorted(z for lo, hi in bands for z in range(lo, hi + 1))
        if covered != list(range(config.max_zoom + 1)):
            raise ValueError(
                f"finalize_zoom_bands {bands!r} must cover 0..{config.max_zoom}"
                " disjointly")
        from .tiling.postprocess import release_finalize_cache

        parts = []
        for lo, hi in bands:
            parts.append(cp.stage(
                f"tiles_z{lo}_{hi}", fp,
                lambda lo=lo, hi=hi: finalize_tiles(
                    tile_feats.filter(F.col("z").between(lo, hi)),
                    size_hint=size_hint),
                spark, lineage=["tile_features"],
            ))
        release_finalize_cache(spark)  # last band's ranked-table cache
        tiles = parts[0]
        for p in parts[1:]:
            tiles = tiles.unionByName(p)
        return tiles
    tiles = finalize_tiles(tile_feats, size_hint=size_hint)
    return tiles


# layers whose rendered output is a pure function of each document (plus
# broadcast side tables) — the sound scope for append-shard incremental
# rebuilds; the excluded layers carry cross-document aggregation state
PER_DOC_LAYERS = frozenset(
    {"aerodrome_label", "aeroway", "building", "housenumber", "landcover",
     "landuse", "mountain_peak", "park", "place", "transportation"}
)


def incremental_retile(
    spark: SparkSession,
    base_corpus: str,
    shard_corpus: str,
    checkpoint_dir: str,
    base_tiles_dir: str,
    config: Config | None = None,
    new_doc_pred=None,
    removed_doc_ids: list | DataFrame | None = None,
) -> DataFrame:
    """Append-shard incremental build — recompute ONLY the tiles the new
    shard touches, splice everything else through unchanged. The reference
    has no update path at all (planetiler is full-planet batch); at 100 TB
    a daily append re-renders a few thousand tiles instead of 270M.

    Soundness: every finalize key (windows, P1-P4 groupBys, rank stamps,
    pandas dispatch) starts with (z, x, y) — the reduce is strictly
    tile-separable — and the seq/ord columns derive from (sort_key,
    elem_id), not from partition order. So finalizing {old pre-finalize
    rows of affected tiles ∪ shard rows} is byte-identical to the full
    rebuild's output for those tiles (asserted by the parity test).

    Mechanics (three bounded jobs, no full-corpus work):
      1. shard render: decode/layers/explode over the SHARD only;
      2. affected keys = distinct (z, x, y) of the shard's exploded rows
         (broadcastable — a shard touches few tiles);
      3. recompute = finalize(semi-join(old tile_features, affected)
         ∪ shard rows); splice = anti-join(old finalized tiles, affected)
         ∪ recompute.

    Requires the base build's checkpoint dir (the ``tile_features`` stage
    is the pre-finalize table this reads; a killed/deleted checkpoint
    falls back to an error — rerun the base build).

    ``removed_doc_ids`` extends append to UPDATE/DELETE (the OSM daily-diff
    shape): the pre-finalize table carries doc_id, so removed docs' rows
    are dropped from the affected-tile recompute, and the tiles they used
    to occupy join the affected set. A replace is remove(old id) + the new
    version in the shard. Finding where removed docs lived costs one
    column-pruned (doc_id, z, x, y) scan of the pre-finalize table — at
    100 TB keep a doc→tile-range index beside the checkpoint if diffs are
    frequent.

    Layer scope: only layers whose RENDER is per-document are eligible —
    layers with cross-document aggregation state (water's biggest-lake
    registry, waterway's river-length merge, boundary's L/R votes +
    polygonize, transportation_name's junction max-class, poi's agg_stop,
    water_name's lake⋈centerline) would need that state recomputed over
    the full corpus, so the guard below rejects them rather than splice
    stale rows."""
    from .checkpoint import CheckpointManager
    from .tiling.postprocess import finalize_tiles

    from .layers import load_addon_modules

    config = config or Config()
    bad = [n for n in config.active_layers() if n not in PER_DOC_LAYERS]
    if bad:
        raise ValueError(
            f"incremental_retile: layers {bad} aggregate across documents; "
            "restrict Config(only_layers=...) to per-document layers "
            f"({sorted(PER_DOC_LAYERS)}) or run a full rebuild"
        )
    if load_addon_modules(config):
        # addons bypass active_layers(); their cross-document-ness is
        # unknowable here, so reject rather than splice stale rows
        raise ValueError(
            "incremental_retile: addon layers are not supported — their "
            "render may aggregate across documents; run a full rebuild"
        )
    cp = CheckpointManager(checkpoint_dir, enabled=True)
    fp = _fingerprint(base_corpus, sorted(vars(config).items()))
    if not cp.has("tile_features", fp):
        raise ValueError(
            "incremental_retile needs the base build's tile_features "
            f"checkpoint in {checkpoint_dir} (fingerprint mismatch or "
            "missing) — run the full build once first"
        )

    def _absent():
        raise AssertionError("resume read expected")

    old_feats = cp.stage("tile_features", fp, _absent, spark)

    # The shard corpus must carry the dimension documents (natural_earth /
    # water_polygons / lake_centerlines rows) so layer joins see the same
    # side data as the base build — but those documents were already
    # rendered into the base tiles. `new_doc_pred` selects the genuinely
    # NEW documents (e.g. F.col("doc_id").startswith("osm/")); dimension
    # rows then provide join context without being re-emitted.
    ctx = make_context(spark, shard_corpus, config)
    rendered = rendered_features(ctx)
    if new_doc_pred is not None:
        rendered = rendered.filter(new_doc_pred)
    else:
        # default: anything already in the base corpus is NOT new — this
        # keeps the required ride-along dimension documents (and any
        # accidentally re-shipped docs) from being emitted twice. One
        # doc_id-pruned scan of the base corpus + an anti-join; pass an
        # explicit predicate to skip it.
        base_ids = load_documents(spark, base_corpus).select("doc_id")
        rendered = rendered.join(base_ids, "doc_id", "left_anti")
    shard_feats = render_tiles(
        rendered, config.max_zoom, config.simplify_tolerance, config.bounds,
        config.simplify_algorithm,
    )
    # the shard render feeds BOTH the affected-key set and the combined
    # union — materialize it once instead of re-running decode+layers+
    # explode per consumer
    shard_feats = shard_feats.localCheckpoint(eager=True)
    key = ["z", "x", "y"]
    affected = shard_feats.select(*key).distinct()
    if isinstance(removed_doc_ids, DataFrame):
        # the osc path hands the affected-set as a DataFrame (planet daily
        # diffs fan out to millions of ids — never collect them)
        rem = removed_doc_ids.select("doc_id")
    elif removed_doc_ids:
        rem = spark.createDataFrame(
            [(str(i),) for i in removed_doc_ids], "doc_id string"
        )
    else:
        rem = None
    if rem is not None:
        affected = affected.unionByName(
            old_feats.join(F.broadcast(rem), "doc_id", "left_semi")
            .select(*key).distinct()
        ).distinct()
        old_feats = old_feats.join(F.broadcast(rem), "doc_id", "left_anti")
    combined = old_feats.join(F.broadcast(affected), key, "left_semi").unionByName(
        shard_feats
    )
    recomputed = finalize_tiles(combined)
    old_final = spark.read.parquet(os.path.join(base_tiles_dir, "tiles"))
    kept = old_final.join(F.broadcast(affected), key, "left_anti")
    out = kept.unionByName(recomputed.select(*kept.columns))
    # pass the finalize cache handle through so write_tiles can unpersist
    out._omt_cached = getattr(recomputed, "_omt_cached", None)
    # the affected key set, for downstream in-place archive updates
    # (update_mbtiles) without recomputing it
    out._omt_affected = affected
    return out


def write_tiles(tiles: DataFrame, out_dir: str) -> dict:
    """Write the tile table partitioned by zoom (the mbtiles-sink analog,
    S5) and a small metadata JSON.

    The writer repartitions on a static (z, x-slice) bucket first so each
    task emits exactly one zoom directory: without it, every one of the
    shuffle's N tasks opens a writer per zoom it sees (N×15 small files at
    z0-14 — file-handle churn locally, a small-file explosion on object
    storage at 100 TB). Deep zooms get 16 x-slices each since that's where
    the rows are; a static map avoids repartitionByRange's extra sampling
    pass over the full finalize plan. 60 bucket values hash into 256
    partitions (not 60): hashing 60 values into exactly 60 partitions
    leaves ~1/e of them empty and co-locates buckets across zooms —
    birthday collisions at 256 are ~7 pairs, so write parallelism stays
    ~the bucket count and the file count per zoom is unchanged (one file
    per bucket either way; empty partitions are free no-op tasks)."""
    z = F.col("z")
    bucket = F.when(z < 12, z).otherwise(
        (z - 12) * 16 + F.pmod(F.col("x"), F.lit(16)) + 12
    )
    out = tiles.repartition(256, bucket.alias("_zbucket"))
    out.write.mode("overwrite").partitionBy("z").parquet(os.path.join(out_dir, "tiles"))
    cached = getattr(tiles, "_omt_cached", None)
    if cached is not None:
        # release the finalize-stage cache now that the sink action ran —
        # it otherwise stays pinned in executor memory through the mbtiles
        # write and read-back phases
        cached.unpersist()
    return {"path": os.path.join(out_dir, "tiles")}


def encode_mvt_blobs(tiles: DataFrame) -> DataFrame:
    """(z,x,y,gzipped MVT blob) rows: per-tile protobuf encoding runs on the
    executors (applyInPandas over the tile group); only the finished blobs
    reach the sink. Layer order inside a tile follows the reference schema
    order (OpenMapTilesSchema.createInstances), features keep their seq."""
    import pandas as pd
    from pyspark.sql import types as T

    from .geom import packed
    from .layers import LAYER_MODULES
    from .tiling import mvt

    order = {n: i for i, n in enumerate(LAYER_MODULES)}
    schema = T.StructType(
        [
            T.StructField("z", T.IntegerType()),
            T.StructField("x", T.IntegerType()),
            T.StructField("y", T.IntegerType()),
            T.StructField("tile_data", T.BinaryType()),
        ]
    )

    def enc(key, pdf: pd.DataFrame) -> pd.DataFrame:
        z, x, y = int(key[0]), int(key[1]), int(key[2])
        pdf = pdf.assign(_lo=[order.get(l, 99) for l in pdf["layer"]])
        pdf = pdf.sort_values(["_lo", "seq"], kind="mergesort")
        layers: dict = {}
        for row in pdf.itertuples(index=False):
            g = packed.to_geom(row.geom_px, row.kind)
            if g is None:
                continue
            attrs = dict(row.attrs) if row.attrs is not None else {}
            layers.setdefault(row.layer, []).append((row.elem_id, row.kind, g, attrs))
        blob = mvt.gzip_tile(mvt.encode_tile(layers))
        return pd.DataFrame(
            {"z": [z], "x": [x], "y": [y], "tile_data": [blob]}
        ).astype({"z": "int32", "x": "int32", "y": "int32"})

    return tiles.groupBy("z", "x", "y").applyInPandas(enc, schema)


def vector_layers_json(tiles: DataFrame) -> list:
    """TileJSON vector_layers derived from the observed tile features (the
    reference's Mbtiles metadata builder aggregates the same way)."""
    rows = (
        tiles.select("layer", "z", F.explode_outer("attrs").alias("k", "v"))
        .groupBy("layer", "k")
        .agg(
            F.min("z").alias("minzoom"),
            F.max("z").alias("maxzoom"),
            F.min(F.col("v").cast("double").isNotNull()).alias("all_num"),
            F.min(F.col("v").isin("true", "false")).alias("all_bool"),
        )
        .collect()
    )
    layers: dict = {}
    for r in rows:
        ent = layers.setdefault(r["layer"], {"id": r["layer"], "fields": {},
                                             "minzoom": 99, "maxzoom": -1})
        ent["minzoom"] = min(ent["minzoom"], r["minzoom"])
        ent["maxzoom"] = max(ent["maxzoom"], r["maxzoom"])
        if r["k"] is not None:
            ent["fields"][r["k"]] = (
                "Boolean" if r["all_bool"] else "Number" if r["all_num"] else "String"
            )
    return [layers[k] for k in sorted(layers)]


def _compact_mark(blobs: DataFrame) -> DataFrame:
    """Compact-schema dedup marking, fully Spark-side (unlike planetiler's
    in-driver LongLongMap): one window over xxhash64(blob) marks the first
    (z, x, y) occurrence of each distinct blob — only that row keeps the
    bytes, so duplicates never cross to the archive writer. A 64-bit hash
    collision (two distinct blobs, same id) is detected via md5 min/max
    over the same window and flagged rather than corrupting the archive."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("tile_data_id")
    return (
        blobs.withColumn("tile_data_id", F.xxhash64("tile_data"))
        .withColumn("_md5", F.md5("tile_data"))
        .withColumn(
            "_first",
            F.row_number().over(w.orderBy("z", "x", "y")) == F.lit(1),
        )
        .withColumn(
            "_collide", F.min("_md5").over(w) != F.max("_md5").over(w)
        )
        .select(
            "z", "x", "y", "tile_data_id",
            F.when(F.col("_first"), F.col("tile_data")).alias("tile_data"),
            "_collide",
        )
    )


def _mbtiles_meta(name, max_zoom, zmin, zmax, xymin, xymax, tiles) -> dict:
    """The metadata table the reference writes (OpenMapTilesTest.java:79-102:
    name/format/minzoom/maxzoom/type/bounds/center/description/attribution +
    TileJSON vector_layers); bounds from the deepest zoom's covered range."""
    from .geom import mercator

    if zmax >= 0:
        n = 1 << zmax
        (x0, y0), (x1, y1) = xymin[zmax], xymax[zmax]
        w, n_lat = mercator.world_to_lonlat(x0 / n, y0 / n)
        e, s_lat = mercator.world_to_lonlat((x1 + 1) / n, (y1 + 1) / n)
        bounds = f"{w:.5f},{s_lat:.5f},{e:.5f},{n_lat:.5f}"
        center = f"{(w + e) / 2:.5f},{(s_lat + n_lat) / 2:.5f},{zmax}"
    else:
        bounds, center = "-180,-85.05113,180,85.05113", "0,0,0"
    return {
        "name": name,
        "format": "pbf",
        "type": "baselayer",
        "minzoom": str(zmin if zmin <= zmax else 0),
        "maxzoom": str(zmax if zmax >= 0 else max_zoom),
        "bounds": bounds,
        "center": center,
        "description": f"{name} built with a PySpark-native engine; schema "
                       "from https://openmaptiles.org",
        "attribution": '<a href="https://www.openmaptiles.org/" target="_blank">'
                       "&copy; OpenMapTiles</a> "
                       '<a href="https://www.openstreetmap.org/copyright" '
                       'target="_blank">&copy; OpenStreetMap contributors</a>',
        "json": json.dumps({"vector_layers": vector_layers_json(tiles)}),
    }


def write_mbtiles(
    tiles: DataFrame,
    path: str,
    name: str = "OpenMapTiles",
    max_zoom: int = 14,
    compact: bool = True,
    sharded: bool = True,
    n_shards: int | None = None,
    blobs: DataFrame | None = None,
) -> dict:
    """S5: real mbtiles sink — gzipped MVT blobs in a sqlite archive.

    ``sharded=True`` (default) builds the archive EXECUTOR-SIDE: blobs are
    hash-partitioned on (z, x, y) into ``n_shards`` tasks, each task writes
    its own sqlite shard (tiles + per-zoom extent stats) next to ``path``,
    and the driver merges shards with pure ``ATTACH`` + ``INSERT…SELECT``
    SQL — sequential but I/O-bound, no per-tile Python. This removes the
    r3-flagged 100 TB scale wall where every blob streamed through a
    single-threaded driver loop (planetiler's own Mbtiles.java writer is
    equally single-writer, but its encode threads feed it in-process; at
    cluster scale the funnel dominates). On a cluster the shard directory
    (``path + ".shards"``) must be on a filesystem both executors and the
    driver can reach — the same constraint as the final archive itself.
    ``sharded=False`` keeps the legacy driver-stream writer (used by the
    parity test, and for archives on driver-only storage).

    ``compact=True`` writes planetiler's compact schema (Mbtiles.java
    ``--compact-db``, the reference default): ``tiles`` becomes a view over
    ``tiles_shallow`` (z/x/y → tile_data_id) + ``tiles_data`` (one row per
    DISTINCT blob) — on a planet build most deep-zoom ocean/empty tiles are
    byte-identical, so the archive stores each blob once. Dedup marking is
    Spark-side (see :func:`_compact_mark`).

    ``blobs``: pass a pre-encoded (z, x, y, tile_data) frame (typically
    ``encode_mvt_blobs(tiles).persist()``) to skip re-encoding — the MVT
    encode dominates sink wall, so a pipeline writing BOTH archive formats
    should encode once and share."""
    if blobs is None:
        blobs = encode_mvt_blobs(tiles)
    if compact:
        blobs = _compact_mark(blobs)
    if os.path.exists(path):
        os.remove(path)
    if sharded:
        return _write_mbtiles_sharded(
            blobs, tiles, path, name, max_zoom, compact, n_shards
        )
    return _write_mbtiles_stream(blobs, tiles, path, name, max_zoom, compact)


def _write_mbtiles_stream(blobs, tiles, path, name, max_zoom, compact) -> dict:
    """Legacy sink: stream every blob through the driver into sqlite."""
    import sqlite3

    con = sqlite3.connect(path)
    cur = con.cursor()
    cur.execute("CREATE TABLE metadata (name text, value text)")
    if compact:
        from .sources.tile_archive import create_compact_schema

        create_compact_schema(con)
    else:
        cur.execute(
            "CREATE TABLE tiles (zoom_level integer, tile_column integer,"
            " tile_row integer, tile_data blob)"
        )
        cur.execute(
            "CREATE UNIQUE INDEX tile_index ON tiles"
            " (zoom_level, tile_column, tile_row)"
        )
    n_tiles = 0
    n_blobs = 0
    zmin, zmax = 99, -1
    xymin = {}
    xymax = {}
    for row in blobs.toLocalIterator():
        z, x, y = row["z"], row["x"], row["y"]
        tms_row = (1 << z) - 1 - y  # mbtiles stores TMS (flipped y)
        if compact:
            if row["_collide"]:
                con.close()
                os.remove(path)
                raise RuntimeError(
                    "xxhash64 collision between distinct tile blobs at "
                    f"z{z}/{x}/{y} — rerun with compact=False"
                )
            cur.execute(
                "INSERT INTO tiles_shallow VALUES (?, ?, ?, ?)",
                (z, x, tms_row, row["tile_data_id"]),
            )
            if row["tile_data"] is not None:
                cur.execute(
                    "INSERT INTO tiles_data VALUES (?, ?)",
                    (row["tile_data_id"], row["tile_data"]),
                )
                n_blobs += 1
        else:
            cur.execute(
                "INSERT INTO tiles VALUES (?, ?, ?, ?)",
                (z, x, tms_row, row["tile_data"]),
            )
        n_tiles += 1
        zmin, zmax = min(zmin, z), max(zmax, z)
        ax, ay = xymin.get(z, (1 << z, 1 << z))
        bx, by = xymax.get(z, (-1, -1))
        xymin[z] = (min(ax, x), min(ay, y))
        xymax[z] = (max(bx, x), max(by, y))
    meta = _mbtiles_meta(name, max_zoom, zmin, zmax, xymin, xymax, tiles)
    cur.executemany("INSERT INTO metadata VALUES (?, ?)", sorted(meta.items()))
    con.commit()
    con.close()
    return {
        "path": path,
        "tiles": n_tiles,
        "minzoom": zmin,
        "maxzoom": zmax,
        "distinct_blobs": n_blobs if compact else n_tiles,
        "compact": compact,
    }


_SHARD_SUMMARY_SCHEMA = (
    "shard string, n_tiles long, n_blobs long, collide boolean,"
    " z int, x0 int, y0 int, x1 int, y1 int"
)


def _shard_writer(shards_dir: str, compact: bool):
    """Task body for the executor-side archive build: drain this partition's
    Arrow batches into one sqlite shard file, emit one summary row per zoom
    (tile/blob counts, extent box, collision flag). Written once per task
    attempt under a unique tmp name then os.replace'd, so retries are safe."""

    def write_shard(batches):
        import sqlite3

        import numpy as np
        import pandas as pd
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        final = os.path.join(shards_dir, f"shard_{pid:05d}.db")
        tmp = f"{final}.tmp{ctx.taskAttemptId()}"
        con = sqlite3.connect(tmp)
        con.execute("PRAGMA journal_mode=OFF")
        con.execute("PRAGMA synchronous=OFF")
        cur = con.cursor()
        if compact:
            cur.execute(
                "CREATE TABLE tiles_shallow (zoom_level integer,"
                " tile_column integer, tile_row integer, tile_data_id integer)"
            )
            cur.execute(
                "CREATE TABLE tiles_data (tile_data_id integer, tile_data blob)"
            )
        else:
            cur.execute(
                "CREATE TABLE tiles (zoom_level integer, tile_column integer,"
                " tile_row integer, tile_data blob)"
            )
        n_tiles = 0
        n_blobs = 0
        collide = False
        ext: dict = {}  # z -> [x0, y0, x1, y1]
        for pdf in batches:
            if not len(pdf):
                continue
            z = pdf["z"].to_numpy().astype(np.int64)
            x = pdf["x"].to_numpy().astype(np.int64)
            y = pdf["y"].to_numpy().astype(np.int64)
            tms = (np.int64(1) << z) - 1 - y  # mbtiles stores TMS (flipped y)
            if compact:
                collide = collide or bool(pdf["_collide"].any())
                ids = pdf["tile_data_id"].to_numpy().astype(np.int64)
                cur.executemany(
                    "INSERT INTO tiles_shallow VALUES (?, ?, ?, ?)",
                    zip(z.tolist(), x.tolist(), tms.tolist(), ids.tolist()),
                )
                mask = pdf["tile_data"].notna().to_numpy()
                data_rows = [
                    (int(i), bytes(b))
                    for i, b in zip(ids[mask], pdf["tile_data"].to_numpy()[mask])
                ]
                cur.executemany("INSERT INTO tiles_data VALUES (?, ?)", data_rows)
                n_blobs += len(data_rows)
            else:
                cur.executemany(
                    "INSERT INTO tiles VALUES (?, ?, ?, ?)",
                    [
                        (int(a), int(b), int(c), bytes(d))
                        for a, b, c, d in zip(z, x, tms, pdf["tile_data"])
                    ],
                )
            n_tiles += len(pdf)
            for zz in np.unique(z):
                m = z == zz
                e = ext.setdefault(
                    int(zz), [1 << int(zz), 1 << int(zz), -1, -1]
                )
                e[0] = min(e[0], int(x[m].min()))
                e[1] = min(e[1], int(y[m].min()))
                e[2] = max(e[2], int(x[m].max()))
                e[3] = max(e[3], int(y[m].max()))
        con.commit()
        con.close()
        if n_tiles == 0:
            os.remove(tmp)
            return
        os.replace(tmp, final)
        yield pd.DataFrame(
            [
                (os.path.basename(final), n_tiles, n_blobs, collide,
                 zz, e[0], e[1], e[2], e[3])
                for zz, e in sorted(ext.items())
            ],
            columns=["shard", "n_tiles", "n_blobs", "collide",
                     "z", "x0", "y0", "x1", "y1"],
        )

    return write_shard


def _write_mbtiles_sharded(
    blobs, tiles, path, name, max_zoom, compact, n_shards
) -> dict:
    """Executor-side sink: per-task sqlite shards, driver ATTACH-merge."""
    import glob as _glob
    import shutil
    import sqlite3

    shards_dir = path + ".shards"
    shutil.rmtree(shards_dir, ignore_errors=True)
    os.makedirs(shards_dir, exist_ok=True)
    spark = tiles.sparkSession
    if n_shards is None:
        n_shards = max(1, min(64, spark.sparkContext.defaultParallelism))
    summaries = (
        blobs.repartition(n_shards, "z", "x", "y")
        .mapInPandas(_shard_writer(shards_dir, compact), _SHARD_SUMMARY_SCHEMA)
        .collect()
    )
    n_tiles = sum(r["n_tiles"] for r in {r["shard"]: r for r in summaries}.values())
    n_blobs = sum(r["n_blobs"] for r in {r["shard"]: r for r in summaries}.values())
    zmin, zmax = 99, -1
    xymin: dict = {}
    xymax: dict = {}
    for r in summaries:
        z = r["z"]
        zmin, zmax = min(zmin, z), max(zmax, z)
        ax, ay = xymin.get(z, (1 << z, 1 << z))
        bx, by = xymax.get(z, (-1, -1))
        xymin[z] = (min(ax, r["x0"]), min(ay, r["y0"]))
        xymax[z] = (max(bx, r["x1"]), max(by, r["y1"]))
    if any(r["collide"] for r in summaries):
        shutil.rmtree(shards_dir, ignore_errors=True)
        raise RuntimeError(
            "xxhash64 collision between distinct tile blobs — rerun with "
            "compact=False"
        )
    con = sqlite3.connect(path)
    con.execute("PRAGMA journal_mode=OFF")
    con.execute("PRAGMA synchronous=OFF")
    cur = con.cursor()
    cur.execute("CREATE TABLE metadata (name text, value text)")
    if compact:
        from .sources.tile_archive import create_compact_schema

        create_compact_schema(con)
    else:
        cur.execute(
            "CREATE TABLE tiles (zoom_level integer, tile_column integer,"
            " tile_row integer, tile_data blob)"
        )
    for shard in sorted(_glob.glob(os.path.join(shards_dir, "shard_*.db"))):
        quoted = shard.replace("'", "''")
        cur.execute(f"ATTACH DATABASE '{quoted}' AS s")
        if compact:
            cur.execute(
                "INSERT INTO tiles_shallow SELECT zoom_level, tile_column,"
                " tile_row, tile_data_id FROM s.tiles_shallow"
            )
            cur.execute(
                "INSERT INTO tiles_data SELECT tile_data_id, tile_data"
                " FROM s.tiles_data"
            )
        else:
            cur.execute("INSERT INTO tiles SELECT * FROM s.tiles")
        con.commit()
        cur.execute("DETACH DATABASE s")
    if not compact:
        # build the unique index after the bulk load (same sqlite_master
        # DDL as the stream writer, ~2x faster than indexed inserts)
        cur.execute(
            "CREATE UNIQUE INDEX tile_index ON tiles"
            " (zoom_level, tile_column, tile_row)"
        )
    meta = _mbtiles_meta(name, max_zoom, zmin, zmax, xymin, xymax, tiles)
    cur.executemany("INSERT INTO metadata VALUES (?, ?)", sorted(meta.items()))
    con.commit()
    con.close()
    shutil.rmtree(shards_dir, ignore_errors=True)
    return {
        "path": path,
        "tiles": n_tiles,
        "minzoom": zmin,
        "maxzoom": zmax,
        "distinct_blobs": n_blobs if compact else n_tiles,
        "compact": compact,
        "shards": n_shards,
    }


def update_mbtiles(tiles: DataFrame, path: str, affected: DataFrame) -> dict:
    """In-place incremental update of a COMPACT mbtiles archive: delete the
    affected tile keys, insert their recomputed blobs (deduping against the
    blobs already in ``tiles_data`` via indexed PK probes — no global hash
    set on the driver), then garbage-collect orphaned blobs with one SQL
    anti-join. Together with ``incremental_retile`` this takes a daily
    append/diff all the way to the served archive without rewriting it.

    ``tiles``: the recomputed feature rows for the affected keys (e.g.
    ``incremental_retile``'s output semi-joined to them, or the whole
    spliced frame — only rows matching ``affected`` are written).
    ``affected``: DataFrame of (z, x, y) keys to replace (collected —
    a diff touches few tiles)."""
    import sqlite3

    keys = [(int(r["z"]), int(r["x"]), int(r["y"]))
            for r in affected.select("z", "x", "y").distinct().collect()]
    if not keys:
        return {"path": path, "updated": 0, "gc_blobs": 0}
    kdf = tiles.sparkSession.createDataFrame(keys, "z int, x int, y int")
    blobs = encode_mvt_blobs(
        tiles.join(F.broadcast(kdf), ["z", "x", "y"], "left_semi")
    ).withColumn("tile_data_id", F.xxhash64("tile_data"))

    con = sqlite3.connect(path)
    cur = con.cursor()
    is_compact = cur.execute(
        "SELECT count(*) FROM sqlite_master WHERE name='tiles_shallow'"
    ).fetchone()[0]
    if not is_compact:
        con.close()
        raise ValueError("update_mbtiles requires the compact schema "
                         "(write_mbtiles compact=True)")
    n = 0
    for z, x, y in keys:
        cur.execute(
            "DELETE FROM tiles_shallow WHERE zoom_level=? AND tile_column=?"
            " AND tile_row=?", (z, x, (1 << z) - 1 - y))
    for row in blobs.toLocalIterator():
        z, x, y = row["z"], row["x"], row["y"]
        did = int(row["tile_data_id"])
        have = cur.execute(
            "SELECT tile_data FROM tiles_data WHERE tile_data_id=?", (did,)
        ).fetchone()
        blob = bytes(row["tile_data"])
        if have is None:
            cur.execute("INSERT INTO tiles_data VALUES (?, ?)", (did, blob))
        elif bytes(have[0]) != blob:
            con.close()
            raise RuntimeError(
                f"xxhash64 collision updating z{z}/{x}/{y} — rewrite the "
                "archive with write_mbtiles")
        cur.execute(
            "INSERT INTO tiles_shallow VALUES (?, ?, ?, ?)",
            (z, x, (1 << z) - 1 - y, did))
        n += 1
    gc = cur.execute(
        "DELETE FROM tiles_data WHERE tile_data_id NOT IN"
        " (SELECT tile_data_id FROM tiles_shallow)"
    ).rowcount
    # refresh the metadata rows the update can shift (zoom extremes, and
    # bounds/center from the deepest zoom's covered range) — index-only
    # probes, no blob scan
    zr = cur.execute(
        "SELECT min(zoom_level), max(zoom_level) FROM tiles_shallow"
    ).fetchone()
    if zr[0] is not None:
        from .geom import mercator

        zmax = int(zr[1])
        x0, x1, r0, r1 = cur.execute(
            "SELECT min(tile_column), max(tile_column), min(tile_row),"
            " max(tile_row) FROM tiles_shallow WHERE zoom_level=?", (zmax,)
        ).fetchone()
        nt = 1 << zmax
        y0, y1 = nt - 1 - int(r1), nt - 1 - int(r0)  # undo TMS flip
        w, n_lat = mercator.world_to_lonlat(x0 / nt, y0 / nt)
        e, s_lat = mercator.world_to_lonlat((x1 + 1) / nt, (y1 + 1) / nt)
        for k, v in (
            ("minzoom", str(int(zr[0]))),
            ("maxzoom", str(zmax)),
            ("bounds", f"{w:.5f},{s_lat:.5f},{e:.5f},{n_lat:.5f}"),
            ("center", f"{(w + e) / 2:.5f},{(s_lat + n_lat) / 2:.5f},{zmax}"),
        ):
            cur.execute("UPDATE metadata SET value=? WHERE name=?", (v, k))
    con.commit()
    con.close()
    return {"path": path, "updated": n, "gc_blobs": gc}


def write_layerstats(tiles: DataFrame, path: str) -> dict:
    """Planetiler core `--output-layerstats` analog (TileSizeStats): one TSV
    of per-(z, layer) encoded sizes — n_tiles, n_features, total/gz/max
    bytes, biggest tile — the size-budget feedback loop schema authors run
    after every build. Sizing is distributed (tiling/stats.py rides the
    sink's own tile partitioning); only the small rollup reaches the
    driver."""
    from .tiling.stats import layer_stats, tile_layer_sizes

    rows = (
        layer_stats(tile_layer_sizes(tiles))
        .orderBy("z", "layer")
        .collect()
    )
    cols = ["z", "layer", "n_tiles", "n_features", "total_bytes",
            "total_gz_bytes", "max_bytes", "big_x", "big_y"]
    with open(path, "w") as f:
        f.write("\t".join(cols) + "\n")
        for r in rows:
            f.write("\t".join(str(r[c]) for c in cols) + "\n")
    return {"path": path, "rows": len(rows)}


_PMTILES_CHUNK_SCHEMA = (
    "chunk int, tile_id long, z int, x int, y int,"
    " local_off long, length long, digest binary, local_first boolean"
)


def _pmtiles_chunk_writer(chunks_dir: str):
    """Task body for the executor-side PMTiles build: spool this
    tile_id-range's gzipped blobs into one data chunk (deduplicated within
    the chunk by sha1), emit one row per tile (tile_id, local offset,
    digest) for the driver's global merge. The per-blob hashing + spooling
    — the byte-heavy part of the legacy driver loop — runs here, in
    parallel across ranges."""

    def write_chunk(batches):
        import hashlib

        import pandas as pd
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        final = os.path.join(chunks_dir, f"chunk_{pid:05d}.data")
        tmp = f"{final}.tmp{ctx.taskAttemptId()}"
        f = open(tmp, "wb")
        local: dict = {}  # digest -> (local_off, length)
        recs = []
        pos = 0
        for pdf in batches:
            for tid_, blob, z, x, y in zip(
                pdf["tile_id"], pdf["tile_data"], pdf["z"], pdf["x"], pdf["y"]
            ):
                b = bytes(blob)
                d = hashlib.sha1(b).digest()
                hit = local.get(d)
                if hit is None:
                    local[d] = (pos, len(b))
                    f.write(b)
                    recs.append(
                        (pid, int(tid_), int(z), int(x), int(y),
                         pos, len(b), d, True)
                    )
                    pos += len(b)
                else:
                    recs.append(
                        (pid, int(tid_), int(z), int(x), int(y),
                         hit[0], hit[1], d, False)
                    )
        f.close()
        if not recs:
            os.remove(tmp)
            return
        os.replace(tmp, final)
        yield pd.DataFrame(
            recs,
            columns=["chunk", "tile_id", "z", "x", "y",
                     "local_off", "length", "digest", "local_first"],
        )

    return write_chunk


def write_pmtiles(
    tiles: DataFrame,
    path: str,
    name: str = "OpenMapTiles",
    max_zoom: int = 14,
    sharded: bool = True,
    n_chunks: int | None = None,
    blobs: DataFrame | None = None,
) -> dict:
    """S5 (second archive format): single-file PMTiles v3 sink, parity with
    planetiler's ``--output=tiles.pmtiles`` (WriteablePmtiles in planetiler
    core; this profile is archive-format-agnostic).

    ``sharded=True`` (default) builds the data section EXECUTOR-SIDE:
    blobs are range-partitioned on Hilbert tile_id, each task hashes and
    spools its range into a data chunk on shared storage, and the driver
    merges chunks with a streamed keep/skip byte copy driven by the tiny
    (tile_id, digest, offset) entry rows — global content dedup and
    run-length coalescing replay the legacy writer's logic exactly, so the
    output archive is BYTE-IDENTICAL to ``sharded=False`` (the r3-flagged
    driver funnel, kept for parity tests). Directory building remains
    centralized (the format's single global clustered directory makes a
    driver pass unavoidable) but entries spill to a 32 B-record disk spool
    and leaf directories build incrementally from it, so driver RAM is
    O(root + one leaf) instead of O(tiles); no blob bytes cross the driver
    except the single sequential chunk-merge copy, which is I/O-bound.

    Encoding is distributed (same executor-side MVT pass as mbtiles); the
    Hilbert tile ids are computed executor-side too (numpy, no per-row
    Python). ``blobs``: pre-encoded (z, x, y, tile_data) frame to share the
    encode with another sink (see :func:`write_mbtiles`)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from .geom import mercator
    from .tiling import pmtiles as pmt

    def _tid(z, x, y):
        return pd.Series(
            pmt.tile_ids_np(z.to_numpy(), x.to_numpy(), y.to_numpy())
        )

    # module has `from __future__ import annotations`, so inline hints are
    # strings pandas_udf can't infer from — set real ones explicitly
    _tid.__annotations__ = {
        "z": pd.Series, "x": pd.Series, "y": pd.Series, "return": pd.Series
    }
    tid = pandas_udf(_tid, "long")

    if blobs is None:
        blobs = encode_mvt_blobs(tiles)
    # persist BEFORE the range partitioner: repartitionByRange (and the
    # legacy orderBy) runs a sampling job over its child to pick range
    # bounds, which would execute the expensive MVT encode twice
    blobs = blobs.withColumn("tile_id", tid("z", "x", "y")).persist()
    meta = {
        "name": name,
        "format": "pbf",
        "type": "baselayer",
        "description": f"{name} built with a PySpark-native engine; schema "
                       "from https://openmaptiles.org",
        "attribution": '<a href="https://www.openmaptiles.org/" target="_blank">'
                       "&copy; OpenMapTiles</a> "
                       '<a href="https://www.openstreetmap.org/copyright" '
                       'target="_blank">&copy; OpenStreetMap contributors</a>',
        "vector_layers": vector_layers_json(tiles),
    }

    zmin, zmax = 99, -1
    xymin: dict = {}
    xymax: dict = {}

    if not sharded:
        writer = pmt.PmtilesWriter(path, meta)
        for row in blobs.orderBy("tile_id").toLocalIterator():
            writer.add_tile(int(row["tile_id"]), bytes(row["tile_data"]),
                            compressed=True)
            z, x, y = row["z"], row["x"], row["y"]
            zmin, zmax = min(zmin, z), max(zmax, z)
            ax, ay = xymin.get(z, (1 << z, 1 << z))
            bx, by = xymax.get(z, (-1, -1))
            xymin[z] = (min(ax, x), min(ay, y))
            xymax[z] = (max(bx, x), max(by, y))
        _pmtiles_bounds(writer.header, zmin, zmax, max_zoom, xymin, xymax,
                        mercator)
        blobs.unpersist()
        return writer.finish()

    import glob as _glob
    import shutil

    chunks_dir = path + ".chunks"
    shutil.rmtree(chunks_dir, ignore_errors=True)
    os.makedirs(chunks_dir, exist_ok=True)
    spark = tiles.sparkSession
    if n_chunks is None:
        n_chunks = max(1, min(64, spark.sparkContext.defaultParallelism))
    entry_rows = (
        blobs.repartitionByRange(n_chunks, "tile_id")
        .sortWithinPartitions("tile_id")
        .mapInPandas(_pmtiles_chunk_writer(chunks_dir), _PMTILES_CHUNK_SCHEMA)
        .persist()
    )
    # ONE parallel action materializes every chunk (toLocalIterator alone
    # would run one job per partition, serializing the executor-side
    # hash+spool work); the iterator below then drains the tiny cached
    # entry rows partition-by-partition. A re-computed partition (cache
    # eviction) harmlessly rewrites its chunk file with identical bytes.
    entry_rows.count()
    # Global merge: rows arrive partition-ordered = ascending tile_id
    # (range partitions). Replays PmtilesWriter.add_tile's dedup +
    # run-length logic over digests instead of blobs.
    spool = path + ".data"
    out = open(spool, "wb")
    dedup: dict = {}  # digest -> (global_off, length)
    # entries spill to a disk spool (32 B records) instead of a Python
    # list: a planet archive's ~270 M entries would be ~11 GB of driver
    # heap as objects — the spool + streamed leaf building in
    # assemble_archive caps driver RAM at O(root + one leaf directory).
    # (The content-dedup digest dict remains O(distinct blobs), the same
    # shape planetiler's WriteablePmtiles holds.)
    entries = pmt.EntrySpool(path + ".entries")
    n_addressed = 0
    out_pos = 0
    cur_chunk = -1
    cf = None
    last_tid = -1
    for row in entry_rows.toLocalIterator():
        if row["chunk"] != cur_chunk:
            if cf is not None:
                cf.close()
            cur_chunk = row["chunk"]
            cf = open(
                os.path.join(chunks_dir, f"chunk_{cur_chunk:05d}.data"), "rb"
            )
        tid_ = row["tile_id"]
        if tid_ <= last_tid:
            raise RuntimeError("pmtiles chunk rows out of tile_id order")
        last_tid = tid_
        d = bytes(row["digest"])
        n_addressed += 1
        known = dedup.get(d)
        if known is None:
            cf.seek(row["local_off"])
            buf = cf.read(row["length"])
            dedup[d] = (out_pos, row["length"])
            out.write(buf)
            entries.append(pmt.Entry(tid_, out_pos, row["length"], 1))
            out_pos += row["length"]
        else:
            off, length = known
            last = entries.last
            if (
                last is not None
                and last.offset == off
                and last.tile_id + last.run_length == tid_
            ):
                last.run_length += 1
            else:
                entries.append(pmt.Entry(tid_, off, length, 1))
        z, x, y = row["z"], row["x"], row["y"]
        zmin, zmax = min(zmin, z), max(zmax, z)
        ax, ay = xymin.get(z, (1 << z, 1 << z))
        bx, by = xymax.get(z, (-1, -1))
        xymin[z] = (min(ax, x), min(ay, y))
        xymax[z] = (max(bx, x), max(by, y))
    if cf is not None:
        cf.close()
    out.close()
    entry_rows.unpersist()
    blobs.unpersist()
    shutil.rmtree(chunks_dir, ignore_errors=True)
    header = pmt.Header()
    _pmtiles_bounds(header, zmin, zmax, max_zoom, xymin, xymax, mercator)
    rep = pmt.assemble_archive(
        path, meta, header, entries, spool, out_pos, n_addressed, len(dedup)
    )
    rep["chunks"] = n_chunks
    return rep


def _pmtiles_bounds(h, zmin, zmax, max_zoom, xymin, xymax, mercator) -> None:
    """Header zoom/bounds/center from the deepest zoom's covered range
    (shared by the stream + sharded pmtiles paths)."""
    h.min_zoom = zmin if zmin <= zmax else 0
    h.max_zoom = zmax if zmax >= 0 else max_zoom
    if zmax >= 0:
        n = 1 << zmax
        (x0, y0), (x1, y1) = xymin[zmax], xymax[zmax]
        w, n_lat = mercator.world_to_lonlat(x0 / n, y0 / n)
        e, s_lat = mercator.world_to_lonlat((x1 + 1) / n, (y1 + 1) / n)
        h.bounds = (w, s_lat, e, n_lat)
        h.center = ((w + e) / 2, (s_lat + n_lat) / 2)
        h.center_zoom = zmax


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default=None,
                    help="corpus dir | table:<namespace> | pbf:<extract>")
    ap.add_argument("--osm-pbf", default=None,
                    help="read input from a .osm.pbf extract (shorthand"
                         " for --corpus pbf:<path>)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoints", default=None)
    ap.add_argument("--max-zoom", type=int, default=14)
    ap.add_argument("--only-layers", default="")
    ap.add_argument("--exclude-layers", default="")
    ap.add_argument("--check-invariant", action="store_true")
    ap.add_argument("--bounds", default=None,
                    help="lon_min,lat_min,lon_max,lat_max — render only"
                         " tiles intersecting this box (planetiler --bounds)")
    ap.add_argument("--simplify-tolerance", type=float, default=0.1,
                    help="px simplification tolerance below max zoom"
                         " (reference README.md:33); negative disables")
    ap.add_argument("--simplify-algorithm", choices=("dp", "vw"), default="dp",
                    help="line simplification criterion: Douglas-Peucker"
                         " offset (reference) or Visvalingam-Whyatt area")
    ap.add_argument("--languages", default=None,
                    help="comma-separated translation language codes"
                         " (planetiler --languages; default the reference"
                         " OpenMapTilesSchema.LANGUAGES list)")
    ap.add_argument("--water-shp", default=None,
                    help="water-polygons ESRI shapefile (.shp) replacing"
                         " the corpus water_polygons rows"
                         " (water-polygons-split-3857)")
    ap.add_argument("--lake-centerline-shp", default=None,
                    help="lake_centerline.shp replacing the"
                         " lake_centerlines side table")
    ap.add_argument("--lake-centerline-geojson", default=None,
                    help="lake_centerline.geojson(/.geojsonl) form of the"
                         " same source")
    ap.add_argument("--wikidata", default=None,
                    help="persisted wikidata_names.json translation cache"
                         " replacing the corpus wikidata side table")
    ap.add_argument("--finalize-bands", default=None,
                    help="comma list of inclusive zoom bands (e.g."
                         " '0-12,13,14') — checkpoint the tile reduce per"
                         " band for mid-zoom resume; needs --checkpoints")
    ap.add_argument("--natural-earth", default=None,
                    help="natural_earth_vector.sqlite replacing the"
                         " natural_earth side table")
    ap.add_argument("--mbtiles", default=None,
                    help="also write a gzipped-MVT mbtiles archive here")
    ap.add_argument("--pmtiles", default=None,
                    help="also write a single-file PMTiles v3 archive here")
    ap.add_argument("--layerstats", default=None,
                    help="write per-(z,layer) encoded-size stats TSV here "
                         "(planetiler --output-layerstats analog)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)
    if args.osm_pbf:
        args.corpus = PBF_SCHEME + args.osm_pbf
    if not args.corpus:
        ap.error("one of --corpus / --osm-pbf is required")

    from pyspark.sql import SparkSession

    from .session import get_spark

    # Only stop the session on exit if main() created it — a programmatic
    # caller (tests, notebooks) invoking main() against a live session must
    # get it back alive.
    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark("omt-tile-build", master=args.master)
    config = Config(
        only_layers=tuple(x for x in args.only_layers.split(",") if x),
        exclude_layers=tuple(x for x in args.exclude_layers.split(",") if x),
        max_zoom=args.max_zoom,
        simplify_tolerance=args.simplify_tolerance,
        simplify_algorithm=args.simplify_algorithm,
        bounds=(
            tuple(float(v) for v in args.bounds.split(","))
            if args.bounds
            else None
        ),
        languages=(
            None
            if args.languages is None
            else tuple(x for x in args.languages.split(",") if x)
        ),
        water_shp=args.water_shp,
        lake_centerline_shp=args.lake_centerline_shp,
        lake_centerline_geojson=args.lake_centerline_geojson,
        natural_earth_sqlite=args.natural_earth,
        wikidata_json=args.wikidata,
        finalize_zoom_bands=tuple(
            (int(b.split("-")[0]), int(b.split("-")[-1]))
            for b in args.finalize_bands.split(",")
        ) if args.finalize_bands else (),
    )
    t0 = time.time()
    tiles = build_tiles(spark, args.corpus, config, args.checkpoints,
                        check_invariant=args.check_invariant)
    t_stages = time.time()
    # ONE action: the finalize plan streams straight into the sink. The
    # report counts come from parquet footers (free) and a column-pruned
    # read-back — not from extra cache+count+distinct passes over the full
    # finalize output (at 100 TB those are three scans of the biggest table).
    written = write_tiles(tiles, args.out)
    t_write = time.time()
    # checkpoint-less pbf builds keep the connector caches pinned until the
    # sink action above; they are dead weight for the report/archive phases
    _release_source_caches()
    from .checkpoint import _parquet_row_count

    n_feats = _parquet_row_count(written["path"])
    tiles_back = spark.read.parquet(written["path"])
    n_tiles = tiles_back.select("z", "x", "y").distinct().count()
    t_report = time.time()
    # both archive formats requested -> encode the MVT blobs ONCE and share
    # (the encode dominates sink wall; each sink would otherwise redo it)
    shared_blobs = None
    if args.mbtiles and args.pmtiles:
        shared_blobs = encode_mvt_blobs(tiles_back).persist()
    mb = (
        write_mbtiles(tiles_back, args.mbtiles, max_zoom=args.max_zoom,
                      blobs=shared_blobs)
        if args.mbtiles
        else None
    )
    t_mb = time.time()
    pm = (
        write_pmtiles(tiles_back, args.pmtiles, max_zoom=args.max_zoom,
                      blobs=shared_blobs)
        if args.pmtiles
        else None
    )
    t_pm = time.time()
    if shared_blobs is not None:
        shared_blobs.unpersist()
    ls = write_layerstats(tiles_back, args.layerstats) if args.layerstats else None
    wall = time.time() - t0
    report = {
        "tile_features": n_feats,
        "tiles": n_tiles,
        "wall_s": round(wall, 2),
        "tiles_per_sec": round(n_tiles / wall, 2),
        # decomposition so scaling runs can attribute wall to the
        # checkpointed stages (decode/layers/render) vs the finalize+sink
        # action vs report bookkeeping vs the served-artifact archive
        # builds, without a separate event-log pass
        "phase_walls": {
            "checkpointed_stages_s": round(t_stages - t0, 2),
            "finalize_write_s": round(t_write - t_stages, 2),
            "report_counts_s": round(t_report - t_write, 2),
            **({"mbtiles_sink_s": round(t_mb - t_report, 2)} if mb else {}),
            **({"pmtiles_sink_s": round(t_pm - t_mb, 2)} if pm else {}),
        },
        **({"mbtiles": mb} if mb else {}),
        **({"pmtiles": pm} if pm else {}),
        **({"layerstats": ls} if ls else {}),
    }
    with open(os.path.join(args.out, "build_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main()
