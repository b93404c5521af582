"""End-to-end corpus test (FIXTURES.md §5 analog of OpenMapTilesTest):
full 16-layer z0-14 build on the seeded Monaco-shaped corpus with frozen
per-layer counts, span invariant, geometry validity, and checkpoint resume.
"""

import json
import os

import pytest

from planetiler_openmaptiles_spark.layers import Config
from planetiler_openmaptiles_spark.pipeline import (
    build_tiles,
    check_span_invariant,
    load_documents,
)
from planetiler_openmaptiles_spark.spans import decode_documents


@pytest.fixture(scope="module")
def tiles(spark, corpus_dir):
    t = build_tiles(spark, corpus_dir, Config(max_zoom=12))
    t.cache()
    t.count()
    return t


def test_span_invariant(spark, corpus_dir):
    docs = load_documents(spark, corpus_dir)
    feats = decode_documents(docs)
    assert check_span_invariant(docs, feats) == 0


def test_all_layers_present(tiles):
    layers = {r["layer"] for r in tiles.select("layer").distinct().collect()}
    # building (minzoom 13) and housenumber (minzoom 14) correctly have no
    # features in a z0-12 build (reference semantics: a feature whose
    # minzoom exceeds the build max zoom renders nowhere)
    expected = {"water", "waterway", "landcover", "landuse", "mountain_peak", "park",
                "boundary", "transportation", "place",
                "poi", "aerodrome_label", "aeroway", "transportation_name"}
    missing = expected - layers
    # water_name needs named lakes near centerlines; allow its absence only
    assert not missing, f"missing layers: {missing}"
    assert "building" not in layers and "housenumber" not in layers


def test_counts_stable(tiles, corpus_dir):
    """Frozen per-layer feature counts at z12 — regenerate the frozen file
    only for intentional behavior changes."""
    frozen_path = os.path.join(os.path.dirname(__file__), "frozen_counts_z12.json")
    got = {
        r["layer"]: r["n"]
        for r in tiles.filter("z = 12").groupBy("layer").agg(
            __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
        ).collect()
    }
    if not os.path.exists(frozen_path):
        with open(frozen_path, "w") as f:
            json.dump(got, f, indent=2, sort_keys=True)
        pytest.skip("frozen counts generated on first run")
    with open(frozen_path) as f:
        frozen = json.load(f)
    assert got == frozen


def test_geometry_validity(tiles):
    """Every tile geometry decodes and stays within tile+buffer bounds."""
    from planetiler_openmaptiles_spark.geom import ops, packed

    rows = tiles.filter("z = 10").select("layer", "kind", "geom_px").collect()
    assert rows
    for r in rows:
        g = packed.to_geom(r["geom_px"], r["kind"])
        assert g is not None
        x0, y0, x1, y1 = ops.bbox(g)
        assert -300 <= x0 <= x1 <= 556, (r["layer"], x0, x1)
        assert -300 <= y0 <= y1 <= 556, (r["layer"], y0, y1)


def test_checkpoint_resume(spark, corpus_dir, tmp_path):
    """Second build with the same checkpoint dir reuses the manifests
    (kill/resume semantics: stage skipped when fingerprint matches)."""
    ckpt = str(tmp_path / "ckpt")
    cfg = Config(only_layers=("water",), max_zoom=6)
    t1 = build_tiles(spark, corpus_dir, cfg, checkpoint_dir=ckpt)
    n1 = t1.count()
    m1 = json.load(open(os.path.join(ckpt, "layer_water", "_MANIFEST.json")))
    t2 = build_tiles(spark, corpus_dir, cfg, checkpoint_dir=ckpt)
    n2 = t2.count()
    m2 = json.load(open(os.path.join(ckpt, "layer_water", "_MANIFEST.json")))
    assert n1 == n2
    assert m1["written_at"] == m2["written_at"]  # not rewritten → resumed
    # changed config → different fingerprint → recompute
    cfg2 = Config(only_layers=("water",), max_zoom=7)
    build_tiles(spark, corpus_dir, cfg2, checkpoint_dir=ckpt).count()
    m3 = json.load(open(os.path.join(ckpt, "layer_water", "_MANIFEST.json")))
    assert m3["fingerprint"] != m2["fingerprint"]


def test_wikidata_prune_ignores_transportation_only_elements(spark):
    """caresAboutWikidataTranslation parity (OpenMapTilesProfile.java:
    125-128,155-165): translations join only onto elements matched by a
    table whose layers consume them — a highway-only element with a
    wikidata tag gets NO name:xx injection; a city point does."""
    from planetiler_openmaptiles_spark.pipeline import with_wikidata_translations

    feats = spark.createDataFrame(
        [
            ("osm", "", 1, {"highway": "motorway", "name": "A1", "wikidata": "Q7"},
             "linestring"),
            ("osm", "", 2, {"place": "city", "name": "Town", "wikidata": "Q7"},
             "point"),
        ],
        "source string, source_layer string, elem_id long,"
        " tags map<string,string>, geom_kind string",
    )
    wd = spark.createDataFrame([("Q7", "de", "Stadt")], "qid string, lang string, name string")
    out = {r["elem_id"]: dict(r["tags"]) for r in with_wikidata_translations(feats, wd).collect()}
    assert "name:de" not in out[1]
    assert out[2]["name:de"] == "Stadt"


def test_ansi_session_hardening(spark, corpus_dir):
    """A caller-built Spark 4 session defaults to ANSI mode, where the
    lenient tag semantics the layers rely on (element_at out-of-bounds →
    null, bad cast → null, map_concat LAST_WIN) throw instead — e.g. the
    transportation route-relation argmax (transportation.py:379) crashed
    with INVALID_ARRAY_INDEX_IN_ELEMENT_AT. make_context must pin its
    required runtime confs on whatever session it is handed."""
    from planetiler_openmaptiles_spark.pipeline import make_context, rendered_features

    prev = {
        "spark.sql.ansi.enabled": spark.conf.get("spark.sql.ansi.enabled"),
        "spark.sql.mapKeyDedupPolicy": spark.conf.get("spark.sql.mapKeyDedupPolicy"),
    }
    spark.conf.set("spark.sql.ansi.enabled", "true")
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
    try:
        ctx = make_context(spark, corpus_dir, Config(only_layers=("transportation",), max_zoom=7))
        assert spark.conf.get("spark.sql.ansi.enabled") == "false"
        assert rendered_features(ctx).count() > 0
        ctx.features.unpersist()
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_single_row_group_corpus_is_resplit(spark, tmp_path):
    """A corpus file written as ONE parquet row group defeats byte-range
    splitting (every row lands in the split holding the row-group start),
    serializing the span decode and each narrow layer transform onto one
    task no matter how many executors exist — measured on the 1M-doc
    multi-JVM bench. load_documents' footer probe must repartition such
    inputs to cluster parallelism; a well-laid-out corpus (row groups >=
    cores) must pass through untouched with zero added exchange."""
    import pyarrow.parquet as pq

    from planetiler_openmaptiles_spark.datagen import generate_corpus

    docs, _ = generate_corpus(500, seed=7)
    cores = spark.sparkContext.defaultParallelism

    pathological = tmp_path / "bad" / "documents.parquet"
    pathological.parent.mkdir()
    pq.write_table(docs, str(pathological))  # single row group
    df = load_documents(spark, str(tmp_path / "bad"))
    assert df.rdd.getNumPartitions() >= cores
    assert df.count() == docs.num_rows

    healthy = tmp_path / "good" / "documents.parquet"
    healthy.parent.mkdir()
    pq.write_table(docs, str(healthy), row_group_size=docs.num_rows // (cores * 2))
    df2 = load_documents(spark, str(tmp_path / "good"))
    assert "Exchange" not in df2._jdf.queryExecution().executedPlan().toString()
    assert df2.count() == docs.num_rows


def test_ctx_cache_bounded_lru(spark, corpus_dir, monkeypatch):
    """make_context must evict (and unpersist) old contexts beyond the
    LRU bound — long-lived drivers vary configs per query and an
    unbounded cache pins every build's plan objects forever."""
    from planetiler_openmaptiles_spark import pipeline as P

    monkeypatch.setattr(P, "_CTX_CACHE_MAX", 2)
    ctxs = [
        P.make_context(
            spark, corpus_dir, Config(only_layers=("water",), max_zoom=z)
        )
        for z in (3, 4, 5)
    ]
    assert len(P._CTX_CACHE) == 2
    # the evicted (oldest) context's shared decode cache is released
    sl = ctxs[0].features.storageLevel
    assert not (sl.useMemory or sl.useDisk)
    # survivors share the identical decode plan, so the CacheManager
    # drops their cached data too — the cache-hit path must RE-ARM it
    again = P.make_context(
        spark, corpus_dir, Config(only_layers=("water",), max_zoom=5)
    )
    assert again is ctxs[2]
    sl2 = again.features.storageLevel
    assert sl2.useMemory or sl2.useDisk


def test_finalize_cache_released_on_next_build(spark, corpus_dir):
    """Back-to-back finalize_tiles calls in one session must not stack
    pinned grid-window caches (bench loops / the oracle board never call
    write_tiles' unpersist)."""
    from planetiler_openmaptiles_spark.pipeline import build_tiles
    from planetiler_openmaptiles_spark.tiling import postprocess as PP

    cfg = Config(only_layers=("water",), max_zoom=4)
    t1 = build_tiles(spark, corpus_dir, cfg)
    t1.count()
    first = PP._FINALIZE_CACHE.get(id(spark))
    assert first is not None
    t2 = build_tiles(spark, corpus_dir, cfg)
    t2.count()
    second = PP._FINALIZE_CACHE.get(id(spark))
    assert second is not None and second is not first
    sl = first.storageLevel
    assert not (sl.useMemory or sl.useDisk)
    PP.release_finalize_cache(spark)
    assert id(spark) not in PP._FINALIZE_CACHE


def test_table_scheme_corpus(spark, corpus_dir):
    """'table:<namespace>' corpus specs read documents + side tables via
    the session catalog (the Iceberg deployment path, SURVEY.md §7);
    results must match the parquet-path form exactly."""
    import glob as _glob

    from planetiler_openmaptiles_spark.pipeline import (
        load_documents,
        load_side_tables,
        make_context,
    )

    for name in ("documents", "natural_earth", "lake_centerlines", "wikidata"):
        p = os.path.join(corpus_dir, f"{name}.parquet")
        if os.path.exists(p) or _glob.glob(p):
            spark.read.parquet(p).createOrReplaceTempView(name)

    via_table = load_documents(spark, "table:")
    via_path = load_documents(spark, corpus_dir)
    assert via_table.count() == via_path.count()
    assert set(load_side_tables(spark, "table:")) == set(
        load_side_tables(spark, corpus_dir)
    )

    cfg = Config(only_layers=("water",), max_zoom=4)
    t_tbl = build_tiles(spark, "table:", cfg)
    t_path = build_tiles(spark, corpus_dir, cfg)
    assert t_tbl.count() == t_path.count()
    a = {tuple(r) for r in t_tbl.select("z", "x", "y", "layer").collect()}
    b = {tuple(r) for r in t_path.select("z", "x", "y", "layer").collect()}
    assert a == b


def test_finalize_zoom_bands_parity_and_resume(spark, corpus_dir, tmp_path):
    """Mid-zoom resume: a banded finalize must produce exactly the
    single-pass tile rows (the reduce is zoom-separable), and a second
    build must resume every band from its manifest."""
    cfg_plain = Config(only_layers=("water", "housenumber"), max_zoom=8)
    plain = build_tiles(spark, corpus_dir, cfg_plain,
                        checkpoint_dir=str(tmp_path / "ckpt_plain"))

    cfg_band = Config(only_layers=("water", "housenumber"), max_zoom=8,
                      finalize_zoom_bands=((0, 6), (7, 7), (8, 8)))
    ckpt = str(tmp_path / "ckpt_band")
    banded = build_tiles(spark, corpus_dir, cfg_band, checkpoint_dir=ckpt)

    def rows(df):
        return sorted(
            (r["z"], r["x"], r["y"], r["layer"], r["seq"],
             bytes(r["geom_px"]), tuple(sorted(r["attrs"].items())))
            for r in df.collect())

    assert rows(banded) == rows(plain)

    # each band has its own manifest; resume touches none of them
    manifests = {}
    for lo, hi in cfg_band.finalize_zoom_bands:
        p = os.path.join(ckpt, f"tiles_z{lo}_{hi}", "_MANIFEST.json")
        manifests[(lo, hi)] = json.load(open(p))["written_at"]
    again = build_tiles(spark, corpus_dir, cfg_band, checkpoint_dir=ckpt)
    assert rows(again) == rows(plain)
    for lo, hi in cfg_band.finalize_zoom_bands:
        p = os.path.join(ckpt, f"tiles_z{lo}_{hi}", "_MANIFEST.json")
        assert json.load(open(p))["written_at"] == manifests[(lo, hi)]

    # bands must cover 0..max_zoom
    with pytest.raises(ValueError, match="cover 0..8"):
        build_tiles(spark, corpus_dir,
                    Config(only_layers=("water",), max_zoom=8,
                           finalize_zoom_bands=((0, 6),)),
                    checkpoint_dir=str(tmp_path / "ckpt_bad"))


def test_incremental_retile_parity_and_guard(spark, corpus_dir, tmp_path):
    """Append-shard incremental build: recomputing only the shard-touched
    tiles and splicing the rest must be row-identical to a full rebuild
    over base ∪ shard (sound because every finalize key is tile-local and
    the allowlisted layers render per-document)."""
    import shutil

    from pyspark.sql import functions as F

    from planetiler_openmaptiles_spark.pipeline import (
        incremental_retile, write_tiles,
    )

    cfg = Config(
        only_layers=("building", "housenumber", "transportation", "place"),
        max_zoom=10,
    )

    docs = spark.read.parquet(os.path.join(corpus_dir, "documents.parquet"))
    # shard = ~10% of the OSM documents; dimension documents (natural_earth
    # / water_polygons / lake_centerlines rows) ride along in BOTH corpora
    # so layer joins see identical side data — new_doc_pred keeps the shard
    # from re-emitting them
    is_dim = ~F.col("doc_id").startswith("osm/")
    is_new = F.col("doc_id").startswith("osm/") & F.substring(
        F.col("doc_id"), -1, 1
    ).isin("3", "7")
    base_dir = str(tmp_path / "base_corpus")
    shard_dir = str(tmp_path / "shard_corpus")
    for d, pred in ((base_dir, ~is_new), (shard_dir, is_new | is_dim)):
        os.makedirs(d, exist_ok=True)
        docs.filter(pred).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet")
        )
        for side in ("lake_centerlines.parquet", "natural_earth.parquet",
                     "wikidata.parquet"):
            src = os.path.join(corpus_dir, side)
            dst = os.path.join(d, side)
            (shutil.copytree if os.path.isdir(src) else shutil.copy2)(src, dst)

    full = build_tiles(spark, corpus_dir, cfg,
                       checkpoint_dir=str(tmp_path / "ckpt_full"))

    ckpt_base = str(tmp_path / "ckpt_base")
    base = build_tiles(spark, base_dir, cfg, checkpoint_dir=ckpt_base)
    base_out = str(tmp_path / "base_out")
    write_tiles(base, base_out)

    # no new_doc_pred: the default anti-joins the base corpus's doc_ids,
    # which must exclude the ride-along dimension documents on its own
    inc = incremental_retile(
        spark, base_dir, shard_dir, ckpt_base, base_out, cfg,
    )

    def rows(df):
        return sorted(
            (r["z"], r["x"], r["y"], r["layer"], r["seq"],
             bytes(r["geom_px"]), tuple(sorted(r["attrs"].items())))
            for r in df.collect())

    inc_rows = rows(inc)
    assert inc_rows == rows(full)
    assert docs.filter(is_new).count() > 0
    assert len(inc_rows) > 0

    # cross-document layers are rejected, not silently spliced stale
    with pytest.raises(ValueError, match="aggregate across documents"):
        incremental_retile(
            spark, base_dir, shard_dir, ckpt_base, base_out,
            Config(only_layers=("water", "building"), max_zoom=10),
        )


def test_incremental_retile_delete_and_replace(spark, corpus_dir, tmp_path):
    """The OSM daily-diff shape: removed_doc_ids drops a doc's rows from
    the affected-tile recompute. Delete parity: base build + remove(D)
    must equal a full rebuild without D. Replace identity: remove(D) +
    re-append identical D must reproduce the base build exactly."""
    import shutil

    from pyspark.sql import functions as F

    from planetiler_openmaptiles_spark.pipeline import (
        incremental_retile, write_tiles,
    )

    cfg = Config(only_layers=("building", "housenumber", "place"), max_zoom=9)
    docs = spark.read.parquet(os.path.join(corpus_dir, "documents.parquet"))
    is_dim = ~F.col("doc_id").startswith("osm/")
    is_del = F.col("doc_id").startswith("osm/") & F.substring(
        F.col("doc_id"), -1, 1
    ).isin("1")
    deleted = [r["doc_id"] for r in docs.filter(is_del).select("doc_id").collect()]
    assert deleted

    def mk(name, pred):
        d = str(tmp_path / name)
        os.makedirs(d, exist_ok=True)
        docs.filter(pred).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet"))
        for side in ("lake_centerlines.parquet", "natural_earth.parquet",
                     "wikidata.parquet"):
            src = os.path.join(corpus_dir, side)
            dst = os.path.join(d, side)
            (shutil.copytree if os.path.isdir(src) else shutil.copy2)(src, dst)
        return d

    minus_dir = mk("minus", ~is_del)        # full corpus without D
    dim_dir = mk("dim_only", is_dim)        # empty shard (dimensions only)
    repl_dir = mk("repl", is_dim | is_del)  # D re-appended unchanged

    ckpt = str(tmp_path / "ckpt_b")
    base = build_tiles(spark, corpus_dir, cfg, checkpoint_dir=ckpt)
    base_out = str(tmp_path / "b_out")
    write_tiles(base, base_out)

    def rows(df):
        return sorted(
            (r["z"], r["x"], r["y"], r["layer"], r["seq"],
             bytes(r["geom_px"]), tuple(sorted(r["attrs"].items())))
            for r in df.collect())

    pred = F.col("doc_id").startswith("osm/")
    inc_del = incremental_retile(
        spark, corpus_dir, dim_dir, ckpt, base_out, cfg,
        new_doc_pred=pred, removed_doc_ids=deleted,
    )
    full_minus = build_tiles(spark, minus_dir, cfg,
                             checkpoint_dir=str(tmp_path / "ckpt_m"))
    assert rows(inc_del) == rows(full_minus)

    inc_repl = incremental_retile(
        spark, corpus_dir, repl_dir, ckpt, base_out, cfg,
        new_doc_pred=pred, removed_doc_ids=deleted,
    )
    assert rows(inc_repl) == rows(base)
