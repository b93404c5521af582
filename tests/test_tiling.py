"""Tile render (explode) stage tests — stage C clipping correctness.

Covers the memo-staleness bug: multiple rendered features sharing
(doc_id, elem_id, layer, form) but carrying DIFFERENT geometries (as
boundary._bordering_with_vote emits) must each be clipped against their
own geometry, not a stale memoized one.
"""

import pandas as pd
import pytest
from pyspark.sql import types as T

from planetiler_openmaptiles_spark.tiling.explode import render_tiles

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("elem_id", T.LongType()),
        T.StructField("layer", T.StringType()),
        T.StructField("form", T.StringType()),
        T.StructField("geom_wkt", T.StringType()),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
        T.StructField(
            "zattrs",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("key", T.StringType()),
                        T.StructField("minzoom", T.IntegerType()),
                        T.StructField("value", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("minzoom", T.IntegerType()),
        T.StructField("maxzoom", T.IntegerType()),
        T.StructField("buffer_px", T.DoubleType()),
        T.StructField(
            "buffer_overrides",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("zoom", T.IntegerType()),
                        T.StructField("size", T.DoubleType()),
                    ]
                )
            ),
        ),
        T.StructField("min_pixel_size", T.DoubleType()),
        T.StructField(
            "mps_overrides",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("below_zoom", T.IntegerType()),
                        T.StructField("size", T.DoubleType()),
                    ]
                )
            ),
        ),
        T.StructField("sort_key", T.IntegerType()),
        T.StructField(
            "grid",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("minzoom", T.IntegerType()),
                        T.StructField("maxzoom", T.IntegerType()),
                        T.StructField("size", T.DoubleType()),
                        T.StructField("limit", T.IntegerType()),
                    ]
                )
            ),
        ),
    ]
)


def _feature_row(
    geom_wkt,
    doc_id="d1",
    elem_id=1,
    layer="boundary",
    form="line",
    minzoom=2,
    maxzoom=2,
):
    return (
        doc_id,
        elem_id,
        layer,
        form,
        geom_wkt,
        {},
        None,
        minzoom,
        maxzoom,
        4.0,
        None,
        0.0,
        None,
        0,
        None,
    )


def test_same_key_different_geoms_both_render(spark):
    """Reproduces the ADVICE round-1 finding: two rows with identical
    (doc_id, elem_id, layer, form) but far-apart geometries must both
    emit tile rows (boundary vote groups emit such rows)."""
    rows = [
        _feature_row("LINESTRING (10 10, 10.5 10.5)"),
        _feature_row("LINESTRING (-120 40, -119.5 40.5)"),
    ]
    df = spark.createDataFrame(rows, FEATURE_SCHEMA).coalesce(1)
    out = render_tiles(df, max_zoom=2).toPandas()
    assert len(out) >= 2
    # the two features live on opposite sides of the antimeridian-ish world:
    # tile x must differ between them at z2
    assert out["x"].nunique() >= 2


def test_line_clip_across_tiles(spark):
    """A long line crossing several z4 tiles emits one clipped piece per
    tile it actually passes through, each within the buffered tile box."""
    from planetiler_openmaptiles_spark.geom import packed

    rows = [_feature_row("LINESTRING (0 40, 40 41)", minzoom=4, maxzoom=4)]
    df = spark.createDataFrame(rows, FEATURE_SCHEMA)
    out = render_tiles(df, max_zoom=4).toPandas()
    assert len(out) >= 2
    for g in out["geom_px"]:
        lines = packed.lines_of(g)
        assert lines
        import numpy as np

        c = np.asarray(lines[0])
        assert c[:, 0].min() >= -4.0 - 1e-6 and c[:, 0].max() <= 260.0 + 1e-6


def test_polygon_clip_across_tiles(spark):
    """A polygon spanning multiple z4 tiles: every covered tile gets a
    clipped polygon, and tiles fully inside get full coverage."""
    rows = [
        _feature_row(
            "POLYGON ((0 10, 50 10, 50 45, 0 45, 0 10))",
            layer="landcover",
            form="polygon",
            minzoom=4,
            maxzoom=4,
        )
    ]
    df = spark.createDataFrame(rows, FEATURE_SCHEMA)
    out = render_tiles(df, max_zoom=4).toPandas()
    # z4 world = 16 tiles across; lon 0..50 is > 2 tiles wide
    assert out["x"].nunique() >= 2
    assert (out["kind"] == "polygon").all()


def test_fused_matches_staged(spark):
    """The fused one-pass render must emit the same rows as the staged
    A/B/C reference pipeline (same keys/attrs/grid; coordinates equal up
    to the staged form's world-WKT %.10g round-trip, ~1e-3 px)."""
    import numpy as np

    from planetiler_openmaptiles_spark.tiling.explode import (
        render_tiles_fused,
        render_tiles_staged,
    )

    rows = [
        _feature_row("LINESTRING (0 40, 40 41)", minzoom=3, maxzoom=6),
        _feature_row(
            "POLYGON ((0 10, 50 10, 50 45, 0 45, 0 10))",
            elem_id=2, layer="landcover", form="polygon", minzoom=0, maxzoom=5,
        ),
        _feature_row("POINT (7.42 43.73)", elem_id=3, layer="poi", form="point",
                     minzoom=10, maxzoom=14),
        # zoom-gated attrs + mps gate interplay
        (
            "d2", 4, "transportation", "line", "LINESTRING (7.40 43.72, 7.41 43.73)",
            {"class": "primary"},
            [{"key": "brunnel", "minzoom": 12, "value": "bridge"}],
            6, 14, 4.0, None, 8.0,
            [{"below_zoom": 11, "size": 50.0}],
            5, None,
        ),
        # label grid
        (
            "d3", 5, "place", "point", "POINT (7.43 43.75)",
            {"class": "city"}, None, 4, 14, 64.0, None, 0.0, None,
            7, [{"minzoom": 8, "maxzoom": 12, "size": 128.0, "limit": 2}],
        ),
    ]
    df = spark.createDataFrame(rows, FEATURE_SCHEMA).coalesce(2)
    staged = render_tiles_staged(df, max_zoom=14).toPandas()
    fused = render_tiles_fused(df, max_zoom=14).toPandas()

    def index(pdf):
        out = {}
        for r in pdf.itertuples(index=False):
            key = (r.z, r.x, r.y, r.layer, r.doc_id, r.elem_id, r.kind, r.sort_key,
                   tuple(sorted((r.attrs or {}).items())),
                   None if r.grid_cell is None or (isinstance(r.grid_cell, float) and np.isnan(r.grid_cell)) else int(r.grid_cell),
                   r.grid_limit)
            out.setdefault(key, []).append(r.geom_px)
        return out

    a, b = index(staged), index(fused)
    assert set(a) == set(b)

    def flat(blob):
        return np.frombuffer(blob, dtype=np.float64)

    for key in a:
        fa_all = sorted((tuple(flat(g)) for g in a[key]))
        fb_all = sorted((tuple(flat(g)) for g in b[key]))
        for fa, fb in zip(fa_all, fb_all):
            assert len(fa) == len(fb), key
            assert np.allclose(fa, fb, atol=2e-3), key


def test_simplify_tolerance_override_changes_geometry(spark):
    """--simplify-tolerance parity (reference README.md:33): a coarser
    tolerance drops more vertices; a negative tolerance disables
    simplification and keeps every input vertex."""
    import numpy as np
    from planetiler_openmaptiles_spark.geom import packed

    # a gently wiggly line: amplitude small enough that 0.1px at z2 keeps
    # some wiggles a 5px tolerance drops
    xs = np.linspace(10.0, 12.0, 41)
    ys = 45.0 + 0.2 * np.sin(np.arange(41) * 1.7)  # ~0.8px amplitude at z2
    wkt_line = "LINESTRING (" + ", ".join(f"{x:.6f} {y:.6f}" for x, y in zip(xs, ys)) + ")"
    df = spark.createDataFrame([_feature_row(wkt_line)], FEATURE_SCHEMA)

    def npts(default_tol):
        out = render_tiles(df, max_zoom=2, default_tol=default_tol).toPandas()
        assert len(out) >= 1
        return sum(
            len(l) for _, r in out.iterrows()
            for l in packed.lines_of(r["geom_px"])
        )

    n_exact = npts(-1.0)
    n_default = npts(0.1)
    n_coarse = npts(5.0)
    assert n_exact == 41
    assert n_coarse < n_default <= n_exact


def test_layer_stats_rollup_and_tiebreak(spark):
    from planetiler_openmaptiles_spark.tiling.stats import layer_stats

    rows = [
        # (z, x, y, layer, n_features, bytes, gz_bytes)
        (3, 1, 1, "water", 5, 100, None),
        (3, 2, 7, "water", 2, 100, None),  # tie on bytes -> bigger x wins
        (3, 0, 0, "water", 1, 40, None),
        (3, 1, 1, "_tile", 5, 140, 90),
        (4, 9, 3, "waterway", 7, 300, None),
    ]
    sizes = spark.createDataFrame(
        rows,
        "z int, x int, y int, layer string, n_features long, "
        "bytes long, gz_bytes long",
    )
    got = {
        (r["z"], r["layer"]): r
        for r in layer_stats(sizes).collect()
    }
    w = got[(3, "water")]
    assert (w["n_tiles"], w["n_features"], w["total_bytes"]) == (3, 8, 240)
    assert (w["max_bytes"], w["big_x"], w["big_y"]) == (100, 2, 7)
    assert w["total_gz_bytes"] is None
    t = got[(3, "_tile")]
    assert (t["total_gz_bytes"], t["max_bytes"]) == (90, 140)
    assert got[(4, "waterway")]["n_tiles"] == 1


def test_tile_diff_classification(spark):
    from planetiler_openmaptiles_spark.tiling.diff import tile_diff

    schema = (
        "z long, x int, y int, layer string, kind string, "
        "geom_px binary, attrs map<string,string>"
    )
    a = spark.createDataFrame(
        [
            (3, 0, 0, "water", "polygon", bytearray(b"g1"), {"class": "lake"}),
            (3, 0, 0, "water", "polygon", bytearray(b"g2"), {"class": "sea"}),
            (3, 1, 0, "water", "polygon", bytearray(b"g3"), {}),  # only_a
            (3, 2, 2, "water", "polygon", bytearray(b"g4"), {}),  # changes
        ],
        schema,
    )
    b = spark.createDataFrame(
        [
            # same tile, features in DIFFERENT order -> multiset sig equal
            (3, 0, 0, "water", "polygon", bytearray(b"g2"), {"class": "sea"}),
            (3, 0, 0, "water", "polygon", bytearray(b"g1"), {"class": "lake"}),
            (3, 2, 2, "water", "polygon", bytearray(b"g4x"), {}),  # changed
            (3, 3, 3, "water", "polygon", bytearray(b"g5"), {}),  # only_b
        ],
        schema,
    )
    r = tile_diff(a, b).collect()
    assert len(r) == 1
    row = r[0]
    assert (row["z"], row["layer"]) == (3, "water")
    assert (
        row["n_only_a"], row["n_only_b"], row["n_changed"], row["n_same"]
    ) == (1, 1, 1, 1)
