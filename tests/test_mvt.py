"""MVT encoder/decoder + mbtiles sink (S5 parity).

Reference: tiles are gzipped MVT protobufs at extent 4096 with the metadata
table asserted in OpenMapTilesTest.java:79-102; geometry validity per the
public vector-tile spec v2 (exterior rings positive area in y-down space).
"""

import gzip
import json
import os
import sqlite3

import numpy as np
import pytest

from planetiler_openmaptiles_spark.tiling import mvt


def test_varint_zigzag_roundtrip():
    for v in (0, 1, 127, 128, 300, 2**31, 2**63 - 1):
        buf = mvt._uvarint(v)
        got, pos = mvt._read_uvarint(buf, 0)
        assert got == v and pos == len(buf)
    for v in (0, -1, 1, -64, 63, -(2**31), 2**31):
        assert mvt._unzigzag(mvt._zigzag(v)) == v


def test_point_feature_roundtrip():
    layers = {
        "place": [(7, "point", ("Point", np.array([10.3, 200.7])),
                   {"name": "Nice", "rank": "3", "capital": "true"})]
    }
    dec = mvt.decode_tile(mvt.encode_tile(layers))
    f = dec["place"]["features"][0]
    assert f["id"] == 7 and f["type"] == mvt.GEOM_POINT
    # 10.3*16=164.8 -> 165 ; 200.7*16=3211.2 -> 3211
    np.testing.assert_array_equal(f["paths"][0], [[165, 3211]])
    # typed value promotion: int-looking and boolean strings
    assert f["attrs"] == {"name": "Nice", "rank": 3, "capital": True}


def test_multilinestring_and_quantize_collapse():
    # second line collapses to a single grid point -> dropped
    lines = ("MultiLineString", [
        np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0]]),
        np.array([[5.0, 5.0], [5.01, 5.01]]),
    ])
    layers = {"transportation": [(1, "linestring", lines, {})]}
    f = mvt.decode_tile(mvt.encode_tile(layers))["transportation"]["features"][0]
    assert f["type"] == mvt.GEOM_LINE
    assert len(f["paths"]) == 1
    np.testing.assert_array_equal(f["paths"][0], [[0, 0], [160, 0], [160, 160]])


def test_polygon_orientation_and_hole():
    outer = np.array([[0, 0], [100, 0], [100, 100], [0, 100], [0, 0]], float)
    hole = np.array([[20, 20], [40, 20], [40, 40], [20, 40], [20, 20]], float)
    layers = {"building": [(2, "polygon", ("Polygon", [outer, hole]), {"render_height": "5"})]}
    f = mvt.decode_tile(mvt.encode_tile(layers))["building"]["features"][0]
    assert f["type"] == mvt.GEOM_POLY
    paths = f["paths"]
    assert len(paths) == 2
    # spec v2: exterior positive area, interior negative (y-down shoelace)
    assert mvt._ring_area2(paths[0]) > 0
    assert mvt._ring_area2(paths[1]) < 0
    assert f["attrs"]["render_height"] == 5


def test_degenerate_outer_ring_drops_feature():
    tiny = np.array([[0, 0], [0.01, 0], [0.01, 0.01], [0, 0]], float)
    layers = {"building": [(1, "polygon", ("Polygon", [tiny]), {})]}
    dec = mvt.decode_tile(mvt.encode_tile(layers))
    assert dec["building"]["features"] == []


def test_negative_and_buffer_coords():
    # buffer coordinates outside [0,256) are legal in MVT (negative deltas)
    line = np.array([[-4.0, -4.0], [260.0, 260.0]])
    layers = {"boundary": [(1, "linestring", ("LineString", line), {})]}
    f = mvt.decode_tile(mvt.encode_tile(layers))["boundary"]["features"][0]
    np.testing.assert_array_equal(f["paths"][0], [[-64, -64], [4160, 4160]])


def test_gzip_deterministic():
    layers = {"water": [(1, "point", ("Point", np.array([1.0, 2.0])), {})]}
    a = mvt.gzip_tile(mvt.encode_tile(layers))
    b = mvt.gzip_tile(mvt.encode_tile(layers))
    assert a == b and a[:2] == b"\x1f\x8b"
    assert gzip.decompress(a) == mvt.encode_tile(layers)


def test_mbtiles_sink_end_to_end(spark, tmp_path):
    """Full S5: build water tiles from the corpus, write mbtiles, assert the
    reference's metadata fields and that every stored blob decodes."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry
    from planetiler_openmaptiles_spark.layers import Config
    from planetiler_openmaptiles_spark.pipeline import build_tiles, write_mbtiles

    corpus = entry._corpus_dir("/root/testdata/sf0.001")
    tiles = build_tiles(spark, corpus, Config(only_layers=("water", "place"), max_zoom=6))
    path = str(tmp_path / "out.mbtiles")
    report = write_mbtiles(tiles, path, max_zoom=6)
    assert report["tiles"] > 0

    con = sqlite3.connect(path)
    meta = dict(con.execute("SELECT name, value FROM metadata").fetchall())
    assert meta["name"] == "OpenMapTiles"
    assert meta["format"] == "pbf"
    assert meta["type"] == "baselayer"
    assert int(meta["minzoom"]) <= int(meta["maxzoom"]) == 6
    assert "openmaptiles.org" in meta["description"]
    assert "www.openstreetmap.org/copyright" in meta["attribution"]
    w, s, e, n = [float(v) for v in meta["bounds"].split(",")]
    assert -180 <= w < e <= 180 and -86 <= s < n <= 86
    vl = json.loads(meta["json"])["vector_layers"]
    ids = {l["id"] for l in vl}
    assert "water" in ids and "place" in ids
    water = next(l for l in vl if l["id"] == "water")
    assert water["fields"].get("class") == "String"

    rows = con.execute(
        "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles"
    ).fetchall()
    assert len(rows) == report["tiles"]
    n_feats = 0
    for z, x, tms_row, blob in rows:
        y = (1 << z) - 1 - tms_row  # undo TMS flip
        assert 0 <= x < (1 << z) and 0 <= y < (1 << z)
        dec = mvt.decode_tile(bytes(blob))
        for lname, layer in dec.items():
            assert layer["extent"] == 4096
            for f in layer["features"]:
                n_feats += len(f["paths"])
                # spec: polygons' first ring positive
                if f["type"] == mvt.GEOM_POLY and f["paths"]:
                    assert mvt._ring_area2(f["paths"][0]) > 0
    assert n_feats > 0
    con.close()


def test_mbtiles_compact_schema_dedups_identical_blobs(spark, tmp_path):
    """Planetiler compact-db parity (Mbtiles.java): identical blobs are
    stored once in tiles_data; the `tiles` view reproduces the plain table
    byte-for-byte. Plant 4 tiles where 3 share identical tile-local
    geometry (MVT coords are tile-relative, so the gzipped blobs are
    byte-identical) and 1 differs."""
    from planetiler_openmaptiles_spark.geom import packed
    from planetiler_openmaptiles_spark.pipeline import write_mbtiles

    square = np.array([[10.0, 10.0], [200.0, 10.0], [200.0, 200.0],
                       [10.0, 200.0], [10.0, 10.0]])
    blob_same = packed.from_polys([[square]])
    blob_diff = packed.from_polys([[square * 0.5]])
    rows = [
        (6, 10, 20, "water", 0, 1, "polygon", blob_same, {"class": "lake"}),
        (6, 11, 20, "water", 0, 1, "polygon", blob_same, {"class": "lake"}),
        (6, 12, 21, "water", 0, 1, "polygon", blob_same, {"class": "lake"}),
        (6, 13, 21, "water", 0, 1, "polygon", blob_diff, {"class": "lake"}),
    ]
    tiles = spark.createDataFrame(
        rows,
        "z int, x int, y int, layer string, seq long, elem_id long,"
        " kind string, geom_px binary, attrs map<string,string>",
    )

    compact_path = str(tmp_path / "compact.mbtiles")
    plain_path = str(tmp_path / "plain.mbtiles")
    rep_c = write_mbtiles(tiles, compact_path, max_zoom=6, compact=True)
    rep_p = write_mbtiles(tiles, plain_path, max_zoom=6, compact=False)
    assert rep_c["tiles"] == rep_p["tiles"] == 4
    assert rep_c["compact"] and not rep_p["compact"]
    assert rep_c["distinct_blobs"] == 2  # 3 identical + 1 different
    assert rep_p["distinct_blobs"] == 4

    con_c = sqlite3.connect(compact_path)
    con_p = sqlite3.connect(plain_path)
    # physical schema: shallow rows = tiles, data rows = distinct blobs
    assert con_c.execute("SELECT count(*) FROM tiles_shallow").fetchone()[0] == 4
    assert con_c.execute("SELECT count(*) FROM tiles_data").fetchone()[0] == 2
    assert con_c.execute(
        "SELECT type FROM sqlite_master WHERE name='tiles'"
    ).fetchone()[0] == "view"
    # the view is byte-identical to the plain table
    q = ("SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles"
         " ORDER BY zoom_level, tile_column, tile_row")
    assert con_c.execute(q).fetchall() == con_p.execute(q).fetchall()
    # and the deduped blob still decodes to the planted square
    blob = con_c.execute(
        "SELECT tile_data FROM tiles WHERE tile_column=11"
    ).fetchone()[0]
    dec = mvt.decode_tile(bytes(blob))
    assert len(dec["water"]["features"]) == 1
    con_c.close(); con_p.close()


def test_mbtiles_sharded_matches_stream_writer(spark, tmp_path):
    """Parity gate for the executor-side archive build (r3 verdict #3):
    the sharded writer (per-task sqlite shards + driver ATTACH-merge) must
    produce the same logical archive as the legacy driver-stream writer —
    identical metadata rows, identical (z, x, tms_row, blob) tile sets,
    identical physical dedup (tiles_data row count), in both compact and
    plain schemas."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry
    from planetiler_openmaptiles_spark.layers import Config
    from planetiler_openmaptiles_spark.pipeline import build_tiles, write_mbtiles

    corpus = entry._corpus_dir("/root/testdata/sf0.001")
    tiles = build_tiles(
        spark, corpus, Config(only_layers=("water", "place"), max_zoom=6)
    )
    for compact in (True, False):
        p_shard = str(tmp_path / f"shard_{compact}.mbtiles")
        p_stream = str(tmp_path / f"stream_{compact}.mbtiles")
        rep_sh = write_mbtiles(
            tiles, p_shard, max_zoom=6, compact=compact, sharded=True, n_shards=7
        )
        rep_st = write_mbtiles(
            tiles, p_stream, max_zoom=6, compact=compact, sharded=False
        )
        assert rep_sh["tiles"] == rep_st["tiles"] > 0
        assert rep_sh["distinct_blobs"] == rep_st["distinct_blobs"]
        assert rep_sh["minzoom"] == rep_st["minzoom"]
        assert rep_sh["maxzoom"] == rep_st["maxzoom"]
        assert not os.path.exists(p_shard + ".shards")  # shards cleaned up
        ca = sqlite3.connect(p_shard)
        cb = sqlite3.connect(p_stream)
        assert (
            sorted(ca.execute("SELECT name, value FROM metadata").fetchall())
            == sorted(cb.execute("SELECT name, value FROM metadata").fetchall())
        )
        q = ("SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles"
             " ORDER BY zoom_level, tile_column, tile_row")
        assert ca.execute(q).fetchall() == cb.execute(q).fetchall()
        if compact:
            for t in ("tiles_shallow", "tiles_data"):
                assert (
                    ca.execute(f"SELECT count(*) FROM {t}").fetchone()[0]
                    == cb.execute(f"SELECT count(*) FROM {t}").fetchone()[0]
                )
            # exactly one blob per distinct id globally across shards
            assert ca.execute(
                "SELECT count(*) FROM (SELECT tile_data_id FROM tiles_data"
                " GROUP BY tile_data_id HAVING count(*) > 1)"
            ).fetchone()[0] == 0
        # schema DDL parity (indexes/views identical)
        sm = "SELECT type, name FROM sqlite_master ORDER BY 1, 2"
        assert ca.execute(sm).fetchall() == cb.execute(sm).fetchall()
        ca.close(); cb.close()
