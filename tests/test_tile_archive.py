"""Tile-archive source connectors + compare_archives (planetiler core's
CompareArchives workflow): read .mbtiles / .pmtiles back into the engine
tile-frame shape, distributed, and diff two finished archives."""

import sqlite3

import numpy as np
import pytest

from planetiler_openmaptiles_spark.geom import packed
from planetiler_openmaptiles_spark.sources import tile_archive as ta
from planetiler_openmaptiles_spark.tiling import mvt


def _tiles_df(spark, variant=0):
    """4-tile frame with one duplicate blob pair; dyadic coords so the MVT
    1/16-px quantization is exact and decode round-trips byte-identically."""
    sq = np.array([[10.0, 10.0], [60.0, 10.0], [60.0, 60.0],
                   [10.0, 60.0], [10.0, 10.0]])
    line = np.array([[0.0, 0.0], [128.0, 64.0]])
    pt = np.array([[100.25, 200.5]])
    rows = [
        (6, 10, 20, "water", 0, 1, "polygon", packed.from_polys([[sq]]),
         {"class": "lake"}),
        (6, 11, 20, "water", 0, 1, "polygon", packed.from_polys([[sq]]),
         {"class": "lake"}),
        (6, 12, 21, "transportation", 0, 7, "linestring",
         packed.from_lines([line]),
         {"class": "minor" if variant == 0 else "primary"}),
        (6, 13, 21, "place", 0, 9, "point", packed.from_points(pt),
         {"name": "X", "rank": "3"}),
    ]
    if variant == 1:
        rows = rows[:3]  # drop the place tile
    return spark.createDataFrame(
        rows,
        "z int, x int, y int, layer string, seq long, elem_id long,"
        " kind string, geom_px binary, attrs map<string,string>",
    )


def _write_both(spark, tiles, tmp_path, tag):
    from planetiler_openmaptiles_spark.pipeline import (
        write_mbtiles, write_pmtiles,
    )

    mb = str(tmp_path / f"{tag}.mbtiles")
    pm = str(tmp_path / f"{tag}.pmtiles")
    write_mbtiles(tiles, mb, max_zoom=6)
    write_pmtiles(tiles, pm, max_zoom=6)
    return mb, pm


def test_read_mbtiles_matches_encoded_blobs(spark, tmp_path):
    from planetiler_openmaptiles_spark.pipeline import encode_mvt_blobs

    tiles = _tiles_df(spark)
    mb, pm = _write_both(spark, tiles, tmp_path, "a")
    want = sorted(
        (r["z"], r["x"], r["y"], bytes(r["tile_data"]))
        for r in encode_mvt_blobs(tiles).collect()
    )
    for path, reader in ((mb, ta.read_mbtiles), (pm, ta.read_pmtiles)):
        got = sorted(
            (r["z"], r["x"], r["y"], bytes(r["tile_data"]))
            for r in reader(spark, path).collect()
        )
        assert got == want, path


def test_read_mbtiles_many_splits_no_dup_no_loss(spark, tmp_path):
    tiles = _tiles_df(spark)
    mb, _ = _write_both(spark, tiles, tmp_path, "s")
    got = ta.read_mbtiles(spark, mb, n_splits=16).collect()
    keys = [(r["z"], r["x"], r["y"]) for r in got]
    assert sorted(keys) == [(6, 10, 20), (6, 11, 20), (6, 12, 21), (6, 13, 21)]
    # plain (non-compact) schema reads through the same path
    from planetiler_openmaptiles_spark.pipeline import write_mbtiles

    plain = str(tmp_path / "plain.mbtiles")
    write_mbtiles(tiles, plain, max_zoom=6, compact=False)
    assert sorted(
        (r["z"], r["x"], r["y"]) for r in ta.read_mbtiles(spark, plain).collect()
    ) == sorted(keys)


def test_decode_tiles_roundtrips_frame(spark, tmp_path):
    """Dyadic-coordinate features decode back byte-identical: same kinds,
    attrs, and packed geometry as the source frame."""
    tiles = _tiles_df(spark)
    mb, _ = _write_both(spark, tiles, tmp_path, "d")
    dec = ta.decode_tiles(ta.read_mbtiles(spark, mb))
    got = {
        (r["z"], r["x"], r["y"], r["layer"]): r for r in dec.collect()
    }
    src = {(r["z"], r["x"], r["y"], r["layer"]): r for r in tiles.collect()}
    assert set(got) == set(src)
    for k, g in got.items():
        s = src[k]
        assert g["kind"] == s["kind"]
        assert g["elem_id"] == s["elem_id"]
        assert bytes(g["geom_px"]) == bytes(s["geom_px"]), k
        assert dict(g["attrs"]) == dict(s["attrs"])


def test_compare_archives_cross_format_identical(spark, tmp_path):
    tiles = _tiles_df(spark)
    mb, pm = _write_both(spark, tiles, tmp_path, "c")
    rows = ta.compare_archives(spark, mb, pm).collect()
    assert all(
        r["n_only_a"] == 0 and r["n_only_b"] == 0 and r["n_changed"] == 0
        for r in rows
    )
    assert sum(r["n_same"] for r in rows) == 4


def test_compare_archives_detects_change_and_drop(spark, tmp_path):
    a_mb, _ = _write_both(spark, _tiles_df(spark, 0), tmp_path, "va")
    b_mb, _ = _write_both(spark, _tiles_df(spark, 1), tmp_path, "vb")
    rows = {
        (r["z"], r["layer"]): r
        for r in ta.compare_archives(spark, a_mb, b_mb).collect()
    }
    assert rows[(6, "water")]["n_same"] == 2
    assert rows[(6, "transportation")]["n_changed"] == 1  # class flipped
    assert rows[(6, "place")]["n_only_a"] == 1  # dropped in b


def test_read_tile_archive_rejects_unknown():
    with pytest.raises(ValueError):
        ta.read_tile_archive(None, "/tmp/x.tar")


def test_decode_tiles_idless_feature_and_subpixel_outer_ring(spark, tmp_path):
    """Review regressions: (1) encode_tile omits the id field for
    None/negative elem_ids — decode must map absent ids to -1, not crash;
    (2) a sub-pixel SECOND outer ring (integer area2 < 256) must start a
    new polygon, not become a hole of the preceding one."""
    import sqlite3 as sq

    from planetiler_openmaptiles_spark.sources.tile_archive import (
        create_compact_schema,
    )

    big = np.array([[10.0, 10.0], [60.0, 10.0], [60.0, 60.0],
                    [10.0, 60.0], [10.0, 10.0]])
    # 0.5 x 0.5 px square: integer-grid area2 = 128, float area2 = 0.5
    tiny = np.array([[100.0, 100.0], [100.5, 100.0], [100.5, 100.5],
                     [100.0, 100.5], [100.0, 100.0]])
    blob = mvt.gzip_tile(mvt.encode_tile({
        "water": [
            (-1, "polygon", ("MultiPolygon", [[big], [tiny]]), {"c": "x"}),
        ]
    }))
    path = str(tmp_path / "idless.mbtiles")
    con = sq.connect(path)
    con.execute("CREATE TABLE metadata (name text, value text)")
    create_compact_schema(con)
    con.execute("INSERT INTO tiles_data VALUES (0, ?)", (blob,))
    con.execute("INSERT INTO tiles_shallow VALUES (5, 3, (1 << 5) - 1 - 4, 0)")
    con.commit()
    con.close()

    rows = ta.decode_tiles(ta.read_mbtiles(spark, path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["elem_id"] == -1  # absent id maps back, no crash
    from planetiler_openmaptiles_spark.geom import packed

    polys = packed.polys_of(bytes(r["geom_px"]))
    assert len(polys) == 2  # tiny ring is its own polygon, not a hole
    assert all(len(rings) == 1 for rings in polys)


def test_decode_tiles_corrupt_gzip_raises_valueerror(spark, tmp_path):
    import sqlite3 as sq

    from planetiler_openmaptiles_spark.sources.tile_archive import (
        create_compact_schema,
    )

    path = str(tmp_path / "torn.mbtiles")
    con = sq.connect(path)
    con.execute("CREATE TABLE metadata (name text, value text)")
    create_compact_schema(con)
    con.execute("INSERT INTO tiles_data VALUES (0, ?)",
                (b"\x1f\x8b\x08\x00torn-gzip-stream",))
    con.execute("INSERT INTO tiles_shallow VALUES (5, 3, 27, 0)")
    con.commit()
    con.close()
    with pytest.raises(Exception) as ei:
        ta.decode_tiles(ta.read_mbtiles(spark, path)).collect()
    assert "malformed MVT tile" in str(ei.value)


def test_update_mbtiles_in_place_matches_fresh_write(spark, tmp_path):
    """Incremental archive update: deleting + reinserting only the
    affected keys (changed transportation tile, dropped place tile) makes
    the archive byte-identical to a fresh write of the new build, and
    orphaned blobs are garbage-collected."""
    from planetiler_openmaptiles_spark.pipeline import (
        update_mbtiles, write_mbtiles,
    )

    a, b = _tiles_df(spark, 0), _tiles_df(spark, 1)
    upd = str(tmp_path / "upd.mbtiles")
    fresh = str(tmp_path / "fresh.mbtiles")
    write_mbtiles(a, upd, max_zoom=6)
    write_mbtiles(b, fresh, max_zoom=6)

    affected = spark.createDataFrame(
        [(6, 12, 21), (6, 13, 21)], "z int, x int, y int"
    )  # changed transportation + dropped place
    rep = update_mbtiles(b, upd, affected)
    assert rep["updated"] == 1          # only the transportation tile remains
    assert rep["gc_blobs"] >= 1         # old transportation + place blobs

    con_u = sqlite3.connect(upd)
    con_f = sqlite3.connect(fresh)
    q = ("SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles"
         " ORDER BY 1, 2, 3")
    assert con_u.execute(q).fetchall() == con_f.execute(q).fetchall()
    # dedup state identical to a fresh write (same xxhash64 ids, orphans gone)
    cnt = "SELECT count(*) FROM tiles_data"
    assert con_u.execute(cnt).fetchone() == con_f.execute(cnt).fetchone()
    # metadata refreshed to match the post-update content
    meta = "SELECT name, value FROM metadata WHERE name IN" \
           " ('minzoom','maxzoom','bounds','center') ORDER BY name"
    assert con_u.execute(meta).fetchall() == con_f.execute(meta).fetchall()
    con_u.close(); con_f.close()

    # plain-schema archives are rejected
    plain = str(tmp_path / "plain.mbtiles")
    write_mbtiles(a, plain, max_zoom=6, compact=False)
    with pytest.raises(ValueError, match="compact"):
        update_mbtiles(b, plain, affected)
