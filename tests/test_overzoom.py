"""Overzoom: transform+clip z_max parent tiles into descendants; verified
by decoding the children back and checking exact coordinates."""

import numpy as np

from planetiler_openmaptiles_spark.tiling import mvt
from planetiler_openmaptiles_spark.tiling.overzoom import (
    overzoom_blob, overzoom_tiles)


def _parent_blob():
    square = np.array(
        [[10.0, 10.0], [240.0, 10.0], [240.0, 240.0], [10.0, 240.0],
         [10.0, 10.0]]
    )
    line = np.array([[10.0, 64.0], [240.0, 64.0]])
    feats = [
        (1, "polygon", ("Polygon", [square]), {"class": "building"}),
        (2, "linestring", ("LineString", line), {"class": "road"}),
        (3, "point", ("Point", np.array([30.0, 30.0])), {"name": "poi"}),
    ]
    return mvt.encode_tile({"test": feats})


def _decoded(blob):
    out = {}
    for lname, layer in mvt.decode_tile(blob).items():
        for f in layer["features"]:
            out[f["id"]] = (
                f["type"],
                [np.asarray(p, dtype=np.float64) / 16.0 for p in f["paths"]],
                f["attrs"],
            )
    return out


def test_overzoom_quadrants():
    blob = _parent_blob()
    kids = {
        (qx, qy): overzoom_blob(blob, 1, qx, qy)
        for qx in (0, 1) for qy in (0, 1)
    }
    assert all(k is not None for k in kids.values())

    d00 = _decoded(kids[(0, 0)])
    # point only in (0,0), exactly doubled
    assert 3 in d00 and np.allclose(d00[3][1][0][0], [60.0, 60.0])
    for q in ((1, 0), (0, 1), (1, 1)):
        assert 3 not in _decoded(kids[q])
    # line crosses (0,0)->(1,0) at y=128; clipped at the +4 buffer edge
    l00 = d00[2][1][0]
    assert np.allclose(l00[0], [20.0, 128.0]) and np.allclose(l00[-1], [260.0, 128.0])
    l10 = _decoded(kids[(1, 0)])[2][1][0]
    assert np.allclose(l10[0], [-4.0, 128.0]) and np.allclose(l10[-1], [224.0, 128.0])
    assert 2 not in _decoded(kids[(0, 1)])  # y=128 scaled leaves lower row
    # polygon present in every child, clipped to the buffered box
    for q, k in kids.items():
        d = _decoded(k)
        assert 1 in d and d[1][2]["class"] == "building"
        ring = d[1][1][0]
        assert ring.min() >= -4.0 and ring.max() <= 260.0
    # (0,0) keeps the original corner, clip cuts only the far edges
    r00 = d00[1][1][0]
    assert r00.min() == 20.0 and r00.max() == 260.0


def test_overzoom_empty_quadrant_none():
    pt = [(9, "point", ("Point", np.array([10.0, 10.0])), {})]
    blob = mvt.encode_tile({"only": pt})
    assert overzoom_blob(blob, 1, 1, 1) is None


def test_overzoom_tiles_distributed(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        [(10, 5, 6, bytearray(mvt.gzip_tile(_parent_blob())))],
        columns=["z", "x", "y", "tile_data"],
    )
    tiles = spark.createDataFrame(pdf, "z int, x int, y int, tile_data binary")
    kids = overzoom_tiles(tiles, 12).collect()
    keys = {(r["z"], r["x"], r["y"]) for r in kids}
    # dz=2: polygon covers the center, so all 16 children exist
    assert len(keys) == 16
    assert all(z == 12 and 20 <= x < 24 and 24 <= y < 28 for z, x, y in keys)
    # children decode and keep layer content
    one = next(r for r in kids if (r["x"], r["y"]) == (20, 24))
    dec = mvt.decode_tile(bytes(one["tile_data"]))
    assert "test" in dec and len(dec["test"]["features"]) >= 1
