"""Archive verification (VerifyMonaco parity — util/VerifyMonaco.java).

Builds tiny mbtiles/pmtiles archives by hand with known features at known
tiles, then asserts the min-feature-count checks count per-zoom per-tile and
respect the tag filter, geometry kind, and lon/lat envelope.
"""

import sqlite3

import numpy as np

from planetiler_openmaptiles_spark.tiling import mvt
from planetiler_openmaptiles_spark.tiling.pmtiles import PmtilesWriter, zxy_to_tile_id
from planetiler_openmaptiles_spark.tiling.verify import Check, verify

WORLD = (-180.0, -85.0, 180.0, 85.0)


def _tile_blob():
    """One tile: 2 building polygons, 1 road line, 1 park point."""
    sq = ("Polygon", [np.array([[0.0, 0.0], [100.0, 0.0], [100.0, 100.0], [0.0, 100.0]])])
    sq2 = ("Polygon", [np.array([[200.0, 200.0], [300.0, 200.0], [300.0, 300.0], [200.0, 300.0]])])
    line = ("LineString", np.array([[0.0, 0.0], [4096.0, 4096.0]]))
    pt = ("Point", np.array([50.0, 50.0]))
    layers = {
        "building": [
            (1, "polygon", sq, {"render_height": "5"}),
            (2, "polygon", sq2, {}),
        ],
        "transportation": [(3, "linestring", line, {"class": "minor"})],
        "poi": [(4, "point", pt, {"class": "park"})],
    }
    return mvt.gzip_tile(mvt.encode_tile(layers))


def _write_mbtiles(path, zxys, blob):
    con = sqlite3.connect(path)
    con.execute(
        "CREATE TABLE tiles (zoom_level integer, tile_column integer,"
        " tile_row integer, tile_data blob)"
    )
    for z, x, y in zxys:
        con.execute(
            "INSERT INTO tiles VALUES (?,?,?,?)", (z, x, (1 << z) - 1 - y, blob)
        )
    con.commit()
    con.close()
    return path


def test_counts_per_zoom_and_tile(tmp_path):
    blob = _tile_blob()
    # z1: two tiles; z2: one tile
    path = _write_mbtiles(
        str(tmp_path / "a.mbtiles"), [(1, 0, 0), (1, 1, 0), (2, 2, 1)], blob
    )
    res = verify(
        path,
        WORLD,
        [
            Check("building", "polygon", 1, 2, 1),
            Check("transportation", "linestring", 1, 1, 2),
            Check("poi", "point", 2, 2, 1, {"class": "park"}),
        ],
    )
    b, t, p = res.results
    # buildings: 2 per tile -> z1 has 2 tiles = 4, z2 has 1 tile = 2
    assert b.counts == {1: 4, 2: 2} and b.ok
    assert t.counts == {1: 2} and t.ok
    assert p.counts == {2: 1} and p.ok
    assert res.num_errors() == 0


def test_tag_filter_kind_and_failure(tmp_path):
    blob = _tile_blob()
    path = _write_mbtiles(str(tmp_path / "b.mbtiles"), [(0, 0, 0)], blob)
    res = verify(
        path,
        WORLD,
        [
            # tag filter: only one building carries render_height
            Check("building", "polygon", 0, 0, 2, {"render_height": "5"}),
            # kind filter: no building linestrings exist
            Check("building", "linestring", 0, 0, 1),
            # absent layer
            Check("water", "polygon", 0, 0, 1, {"class": "ocean"}),
        ],
    )
    tagged, wrong_kind, absent = res.results
    assert tagged.counts == {0: 1} and not tagged.ok
    assert wrong_kind.counts == {0: 0} and not wrong_kind.ok
    assert absent.counts == {0: 0} and not absent.ok
    assert res.num_errors() == 3


def test_bounds_envelope_excludes(tmp_path):
    blob = _tile_blob()
    # z1 tile (1,0) covers lon 0..180, lat 0..85. Input geoms are 256-px
    # tile coords, so they decode x16 into extent units: sq1 spans
    # 0..1600, sq2 spans 3200..4800.
    path = _write_mbtiles(str(tmp_path / "c.mbtiles"), [(1, 1, 0)], blob)
    hit = verify(path, (0.0, 60.0, 40.0, 85.0), [Check("building", "polygon", 1, 1, 1)])
    # envelope x 0..910: overlaps sq1 only
    assert hit.results[0].counts == {1: 1} and hit.results[0].ok
    # lon 100..140 -> extent x 2275..3185: the gap between the two squares
    miss = verify(path, (100.0, 0.0, 140.0, 85.0), [Check("building", "polygon", 1, 1, 1)])
    assert miss.results[0].counts == {1: 0} and not miss.results[0].ok


def test_pmtiles_archive(tmp_path):
    blob = _tile_blob()
    path = str(tmp_path / "a.pmtiles")
    w = PmtilesWriter(path, {"name": "t"})
    ids = sorted(zxy_to_tile_id(z, x, y) for z, x, y in [(1, 0, 0), (1, 1, 0)])
    for tid in ids:
        w.add_tile(tid, blob, compressed=True)
    w.finish()
    res = verify(path, WORLD, [Check("building", "polygon", 1, 1, 4)])
    assert res.results[0].counts == {1: 4} and res.results[0].ok
    assert res.num_errors() == 0
