"""--bounds partial-build tests (planetiler arg surface parity).

Planetiler's TileExtents semantics: a tile is rendered iff its extent
intersects the closed bounds box; features are otherwise untouched (no
geometry re-clipping beyond the normal tile cut). The engine's invariant is
therefore exact: render_tiles(bounds=B) == render_tiles(bounds=None)
filtered to tiles inside bounds_tile_ranges(B) — verified below per kind
(point / line / polygon / fill-path polygon).
"""

import numpy as np
import pandas as pd
import pytest

from planetiler_openmaptiles_spark.tiling.explode import (
    bounds_tile_ranges,
    render_tiles,
)

from .test_tiling import FEATURE_SCHEMA, _feature_row

WORLD = (-180.0, -85.05112878, 180.0, 85.05112878)


def test_bounds_tile_ranges_world():
    rng = bounds_tile_ranges(WORLD, 4)
    for z in range(5):
        n = 1 << z
        assert rng[z] == (0, n - 1, 0, n - 1)


def test_bounds_tile_ranges_quadrant():
    # NE quadrant (lon>=0, lat>=0): world x in [0.5,1], y in [0,0.5]
    rng = bounds_tile_ranges((0.0, 0.0, 180.0, 85.05112878), 3)
    assert rng[0] == (0, 0, 0, 0)
    # edge tiles are included (closed box intersects tile boundary):
    # lat=0 is exactly the z1 row edge, so row 1 intersects too
    assert rng[1] == (1, 1, 0, 1)
    assert rng[2] == (2, 3, 0, 2)
    assert rng[3] == (4, 7, 0, 4)


def _mixed_features(spark):
    rows = [
        _feature_row("POINT (10 50)", elem_id=1, form="point",
                     minzoom=0, maxzoom=6),
        _feature_row("POINT (-120 -30)", elem_id=2, form="point",
                     minzoom=0, maxzoom=6),
        _feature_row("LINESTRING (-20 40, 30 42)", elem_id=3, form="line",
                     minzoom=2, maxzoom=6),
        _feature_row(
            "POLYGON ((5 45, 15 45, 15 55, 5 55, 5 45))",
            elem_id=4, form="polygon", minzoom=2, maxzoom=6,
        ),
        # big polygon: wide enough to take the fill path at deeper zooms
        _feature_row(
            "POLYGON ((-60 -40, 60 -40, 60 40, -60 40, -60 -40))",
            elem_id=5, form="polygon", minzoom=4, maxzoom=6,
        ),
    ]
    return spark.createDataFrame(rows, FEATURE_SCHEMA).coalesce(2)


def _key(df):
    return set(zip(df["z"], df["x"], df["y"], df["elem_id"]))


@pytest.mark.parametrize(
    "bounds",
    [
        (0.0, 30.0, 40.0, 60.0),     # europe-ish box
        (-130.0, -40.0, -100.0, -20.0),  # SW box around point 2
        (9.0, 49.0, 11.0, 51.0),     # tiny box inside the small polygon
    ],
)
def test_bounded_equals_unbounded_filtered(spark, bounds):
    df = _mixed_features(spark)
    full = render_tiles(df, max_zoom=6).toPandas()
    part = render_tiles(df, max_zoom=6, bounds=bounds).toPandas()
    rng = bounds_tile_ranges(bounds, 6)

    def in_rng(z, x, y):
        x0, x1, y0, y1 = rng[z]
        return x0 <= x <= x1 and y0 <= y <= y1

    expect = {k for k in _key(full) if in_rng(k[0], k[1], k[2])}
    assert _key(part) == expect
    assert len(part) == sum(
        1 for _, r in full.iterrows() if in_rng(r["z"], r["x"], r["y"])
    )


def test_world_bounds_is_identity(spark):
    df = _mixed_features(spark)
    full = render_tiles(df, max_zoom=5).toPandas()
    bounded = render_tiles(df, max_zoom=5, bounds=WORLD).toPandas()
    s = ["z", "x", "y", "elem_id"]
    a = full.sort_values(s).reset_index(drop=True)
    b = bounded.sort_values(s).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a[s + ["geom_px"]], b[s + ["geom_px"]]
    )


def test_config_bounds_plumbs_through_build(spark, corpus_dir):
    """End-to-end: Config(bounds=...) restricts the built tile set and the
    in-box tiles are byte-identical to the unbounded build's."""
    from planetiler_openmaptiles_spark.layers import Config
    from planetiler_openmaptiles_spark.pipeline import build_tiles

    box = (-90.0, 0.0, 0.0, 66.0)
    full = build_tiles(spark, corpus_dir, Config(max_zoom=6)).toPandas()
    part = build_tiles(
        spark, corpus_dir, Config(max_zoom=6, bounds=box)
    ).toPandas()
    rng = bounds_tile_ranges(box, 6)
    # every bounded tile is in range
    for _, r in part.iterrows():
        x0, x1, y0, y1 = rng[r["z"]]
        assert x0 <= r["x"] <= x1 and y0 <= r["y"] <= y1
    # and matches the unbounded build's tiles exactly within the box
    def keyed(df):
        return {
            (r["z"], r["x"], r["y"], r["layer"], bytes(r["geom_px"]))
            for _, r in df.iterrows()
        }
    x0x1 = {
        k for k in keyed(full)
        if rng[k[0]][0] <= k[1] <= rng[k[0]][1]
        and rng[k[0]][2] <= k[2] <= rng[k[0]][3]
    }
    assert keyed(part) == x0x1
    assert len(part) < len(full)
