"""Shapefile + Natural Earth sqlite source connectors.

Same independence layers as test_osm_pbf.py: (1) wire-format byte vectors
hand-built from the published specs (ESRI Shapefile Technical Description;
OGC WKB / GeoPackage / SpatiaLite BLOB layouts) — no writer involved;
(2) writer→reader round-trips; (3) pipeline integration: Config source
overrides replace the corpus' synthesized rows in the decoded stream."""

import math
import os
import sqlite3
import struct

from pyspark.sql import functions as F

import numpy as np
import pytest

from planetiler_openmaptiles_spark.geom import wkb as W
from planetiler_openmaptiles_spark.geom.wkt import parse_wkt, to_wkt
from planetiler_openmaptiles_spark.sources import shapefile as S
from planetiler_openmaptiles_spark.sources import natural_earth as NE


# ------------------------------------------------------------ wire vectors


def test_shp_point_record_hand_bytes(tmp_path):
    """Minimal 1-point .shp/.shx built from struct literals (spec layout:
    BE file header ints, LE shape data) — reader must decode it."""
    content = struct.pack("<idd", 1, 12.5, -33.25)  # shape type 1, X, Y
    rec = struct.pack(">ii", 1, len(content) // 2) + content
    header = (struct.pack(">i20xi", 9994, (100 + len(rec)) // 2)
              + struct.pack("<ii", 1000, 1)
              + struct.pack("<4d", 12.5, -33.25, 12.5, -33.25)
              + struct.pack("<4d", 0, 0, 0, 0))
    (tmp_path / "pt.shp").write_bytes(header + rec)
    shx_rec = struct.pack(">ii", 50, len(content) // 2)
    shx_header = (struct.pack(">i20xi", 9994, (100 + 8) // 2)
                  + header[28:])
    (tmp_path / "pt.shx").write_bytes(shx_header + shx_rec)

    idx = S.scan_shx_index(str(tmp_path / "pt.shp"))
    assert idx.tolist() == [[100, len(content) + 8]]
    kind, wkt = S._decode_record(content, epsg=4326)
    assert (kind, wkt) == ("point", "POINT (12.5 -33.25)")


def test_wkb_hand_vectors():
    # big-endian (XDR) point
    assert to_wkt(W.decode_geometry_blob(struct.pack(">BIdd", 0, 1, 1.0, 2.0))) == "POINT (1 2)"
    # ISO PointZ (1001): z dropped
    assert to_wkt(W.decode_geometry_blob(struct.pack("<BIddd", 1, 1001, 3.0, 4.0, 9.0))) == "POINT (3 4)"
    # EWKB point with SRID flag (0x20000000 | 1) + srid 4326
    b = struct.pack("<BIIdd", 1, 0x20000001, 4326, 5.0, 6.0)
    assert to_wkt(W.decode_geometry_blob(b)) == "POINT (5 6)"
    # GeoPackage framing: GP + version + flags(LE, env=1) + srid + env + wkb
    wkb = struct.pack("<BIdd", 1, 1, 7.0, 8.0)
    gp = b"GP" + bytes([0, 0b11]) + struct.pack("<i", 4326) + struct.pack("<4d", 7, 7, 8, 8) + wkb
    assert to_wkt(W.decode_geometry_blob(gp)) == "POINT (7 8)"
    # SpatiaLite framing: 00 01 srid MBR 7C class=1 x y FE
    sl = (b"\x00\x01" + struct.pack("<i", 4326) + struct.pack("<4d", 1, 2, 1, 2)
          + b"\x7c" + struct.pack("<Idd", 1, 1.0, 2.0) + b"\xfe")
    assert to_wkt(W.decode_geometry_blob(sl)) == "POINT (1 2)"


def test_wkb_malformed_raises():
    with pytest.raises(ValueError):
        W.decode_geometry_blob(struct.pack("<BI", 1, 99))  # unknown type
    sl = (b"\x00\x01" + struct.pack("<i", 0) + struct.pack("<4d", 0, 0, 0, 0)
          + b"\x7c" + struct.pack("<Idd", 1, 0.0, 0.0) + b"\x00")  # bad terminator
    with pytest.raises(ValueError):
        W.decode_geometry_blob(sl)


def test_wkb_all_kinds_all_framings_round_trip():
    cases = [
        "POINT (12.5 -33.25)",
        "LINESTRING (0 0, 1 1, 2 0.5)",
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
        "MULTIPOINT (1 1, 2 2)",
        "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))",
    ]
    for wkt in cases:
        g = parse_wkt(wkt)
        for blob in (W.encode_wkb(g), W.encode_gpkg(g), W.encode_spatialite(g)):
            assert to_wkt(W.decode_geometry_blob(blob)) == to_wkt(g)


# --------------------------------------------------------- CRS correctness


def test_merc_inverse_matches_independent_reference():
    """Connector 3857→lon/lat vs an inline closed-form reference (no shared
    code path: plain math.* here, numpy in the connector)."""
    R = 6378137.0
    xs = [0.0, 1113194.9079327357, -20037508.34, 12345.678]
    ys = [0.0, 6446275.841017158, -5621521.486, 8399737.89]
    lon, lat = S.merc_to_lonlat(np.array(xs), np.array(ys))
    for i, (x, y) in enumerate(zip(xs, ys)):
        ref_lon = math.degrees(x / R)
        ref_lat = math.degrees(2 * math.atan(math.exp(y / R)) - math.pi / 2)
        assert abs(lon[i] - ref_lon) < 1e-12
        assert abs(lat[i] - ref_lat) < 1e-12
    # forward∘inverse identity
    x2, y2 = S.lonlat_to_merc(lon, lat)
    assert np.allclose(x2, xs, atol=1e-6) and np.allclose(y2, ys, atol=1e-6)


# ------------------------------------------------------------- round trips


def test_shapefile_polygon_hole_assignment(tmp_path):
    """Two outers + one hole: the hole must land inside the SECOND outer
    (even-odd containment), and orientation must normalize to CCW/CW."""
    wkt = ("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
           "((10 10, 14 10, 14 14, 10 14, 10 10), (11 11, 12 11, 12 12, 11 12, 11 11)))")
    p = S.write_shapefile(str(tmp_path / "mp"), [({}, wkt)], epsg=4326)
    idx = S.scan_shx_index(p)
    with open(p, "rb") as f:
        f.seek(int(idx[0, 0]))
        blob = f.read(int(idx[0, 1]))
    kind, out = S._decode_record(blob[8:], 4326)
    assert kind == "polygon"
    g = parse_wkt(out)
    assert g[0] == "MultiPolygon" and len(g[1]) == 2
    with_hole = [rings for rings in g[1] if len(rings) == 2]
    assert len(with_hole) == 1
    assert with_hole[0][0][:, 0].min() == 10  # hole went to the 10..14 outer
    # orientation: outer CCW (positive shoelace), hole CW
    assert S._ring_signed_area(with_hole[0][0]) > 0
    assert S._ring_signed_area(with_hole[0][1]) < 0


def test_shapefile_distributed_read_and_attrs(spark, tmp_path):
    recs = []
    for i in range(300):
        x = (i % 30) * 0.03 - 0.4
        y = (i // 30) * 0.03 - 0.1
        attrs = {"name": f"w{i}"} if i % 3 else {}  # empty attrs rows too
        recs.append((attrs, f"POLYGON (({x} {y}, {x + 0.02} {y}, {x + 0.02} {y + 0.02}, {x} {y + 0.02}, {x} {y}))"))
    p = S.write_shapefile(str(tmp_path / "water"), recs, epsg=3857)
    assert S.read_prj_epsg(p) == 3857
    df = S.read_shapefile(spark, p, partitions=4)
    rows = {r["fid"]: r for r in df.collect()}
    assert len(rows) == 300 and min(rows) == 1 and max(rows) == 300
    assert rows[2]["attrs"] == {"name": "w1"} and rows[1]["attrs"] == {}
    g = parse_wkt(rows[1]["geom_wkt"])
    assert g[0] == "Polygon"
    assert np.allclose(g[1][0][:, 0].min(), -0.4, atol=1e-9)


def test_shapefile_null_and_polyline_parts(spark, tmp_path):
    recs = [
        ({"OSM_ID": "101"}, "LINESTRING (0 0, 1 1)"),
        ({"OSM_ID": ""}, "GEOMETRYCOLLECTION EMPTY"),  # → null shape, dropped
        ({"OSM_ID": "102"}, "MULTILINESTRING ((0 0, 1 0), (2 0, 3 0))"),
    ]
    p = S.write_shapefile(str(tmp_path / "lines"), recs, epsg=4326)
    out = {r["fid"]: r for r in S.read_shapefile(spark, p).collect()}
    assert set(out) == {1, 3}
    assert out[1]["kind"] == "linestring"
    assert parse_wkt(out[3]["geom_wkt"])[0] == "MultiLineString"


def test_ne_sqlite_round_trip_all_formats(spark, tmp_path):
    tables = {
        "ne_10m_lakes": [({"name": f"Lake {i}", "ne_id": str(100 + i)},
                          f"POLYGON (({i} 0, {i + 1} 0, {i + 1} 1, {i} 1, {i} 0))")
                         for i in range(7)],
        "ne_10m_populated_places": [({"name": "City", "scalerank": "3"}, "POINT (5 5)")],
    }
    for fmt in ("spatialite", "gpkg", "wkb"):
        p = NE.write_natural_earth_sqlite(str(tmp_path / f"ne_{fmt}.sqlite"), tables, blob_format=fmt)
        out = NE.read_natural_earth_sqlite(spark, p, rows_per_split=3).collect()
        by_key = {(r["table"], r["elem_id"]): r for r in out}
        assert len(by_key) == 8
        r = by_key[("ne_10m_lakes", 3)]
        assert r["tags"] == {"name": "Lake 2", "ne_id": "102"}
        assert parse_wkt(r["geom_wkt"])[1][0][:, 0].min() == 2


def test_ne_documents_elem_ids_globally_unique(spark, tmp_path):
    tables = {
        "ne_10m_lakes": [({"ne_id": "1"}, "POINT (0 0)"), ({"ne_id": "2"}, "POINT (1 1)")],
        "ne_50m_lakes": [({"ne_id": "3"}, "POINT (2 2)")],
    }
    p = NE.write_natural_earth_sqlite(str(tmp_path / "ne.sqlite"), tables)
    docs = NE.natural_earth_to_documents(spark, p)
    ids = [r["doc_id"] for r in docs.collect()]
    assert len(ids) == len(set(ids)) == 3
    from planetiler_openmaptiles_spark.spans import decode_documents

    feats = decode_documents(docs).select("elem_id", "source_layer").collect()
    elem_ids = [r["elem_id"] for r in feats]
    assert len(set(elem_ids)) == 3  # per-table rowids offset apart


# ------------------------------------------------------ pipeline overrides


def test_config_source_overrides_replace_corpus_rows(spark, tmp_path, corpus_dir):
    from planetiler_openmaptiles_spark.layers import Config
    from planetiler_openmaptiles_spark.pipeline import _build_context

    water = S.write_shapefile(
        str(tmp_path / "water"),
        [({}, "POLYGON ((7 43, 7.5 43, 7.5 43.5, 7 43.5, 7 43))")], epsg=3857)
    lakes = S.write_shapefile(
        str(tmp_path / "lake_cl"),
        [({"OSM_ID": "424242"}, "LINESTRING (7.1 43.1, 7.2 43.2)")], epsg=3857)
    ne = NE.write_natural_earth_sqlite(
        str(tmp_path / "ne.sqlite"),
        {"ne_10m_lakes": [({"name": "Lago", "ne_id": "77"}, "POLYGON ((7 43, 7.2 43, 7.2 43.2, 7 43.2, 7 43))")]})

    ctx = _build_context(spark, corpus_dir, Config(
        water_shp=water, lake_centerline_shp=lakes, natural_earth_sqlite=ne))
    try:
        wp = ctx.source("water_polygons").select("elem_id", "geom_wkt").collect()
        assert len(wp) == 1 and parse_wkt(wp[0]["geom_wkt"])[0] == "Polygon"
        cl = ctx.source("lake_centerlines").select("elem_id").collect()
        assert [r["elem_id"] for r in cl] == [424242]
        nerows = ctx.natural_earth("ne_10m_lakes").select("tags").collect()
        assert len(nerows) == 1 and nerows[0]["tags"]["ne_id"] == "77"
    finally:
        ctx.features.unpersist()


def test_span_invariant_on_connector_documents(spark, tmp_path):
    """Connector-produced documents must satisfy the span-sequence
    invariant (BASELINE.json per-row invariant) like corpus rows do."""
    from planetiler_openmaptiles_spark.pipeline import check_span_invariant
    from planetiler_openmaptiles_spark.spans import decode_documents

    p = S.write_shapefile(
        str(tmp_path / "w"),
        [({"name": f"n{i}"}, f"POLYGON (({i} 0, {i}.5 0, {i}.5 0.5, {i} 0.5, {i} 0))")
         for i in range(5)], epsg=3857)
    docs = S.shapefile_to_documents(spark, p, "water_polygons")
    assert check_span_invariant(docs, decode_documents(docs)) == 0


# ------------------------------------------------- geojson + wikidata json


def test_geojson_lines_and_collection_parity(spark, tmp_path):
    from planetiler_openmaptiles_spark.sources import geojson as GJ

    recs = [
        ({"name": "a", "n": 3, "deep": {"x": 1}, "flag": True},
         "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0), (0.5 0.5, 1 0.5, 1 1, 0.5 1, 0.5 0.5))"),
        ({"OSM_ID": "77"}, "LINESTRING (0 0, 1 1, 2 0.5)"),
        ({}, "MULTIPOLYGON (((4 4, 5 4, 5 5, 4 5, 4 4)), ((6 6, 7 6, 7 7, 6 7, 6 6)))"),
        ({"name": "pt"}, "POINT (-12.25 33.5)"),
    ]
    p_lines = GJ.write_geojson(str(tmp_path / "f.geojsonl"), recs)
    p_fc = GJ.write_geojson(str(tmp_path / "fc.geojson"), recs, collection=True)
    a = {r["fid"]: r for r in GJ.read_geojson(spark, p_lines).collect()}
    b = {r["fid"]: r for r in GJ.read_geojson(spark, p_fc).collect()}
    assert set(a) == set(b) == {1, 2, 3, 4}
    for fid in a:
        assert a[fid]["geom_wkt"] == b[fid]["geom_wkt"]
        assert a[fid]["attrs"] == b[fid]["attrs"]
    # property stringification: int-valued float, nested json, bool
    assert a[1]["attrs"] == {"name": "a", "n": "3", "deep": '{"x":1}', "flag": "true"}
    assert a[1]["kind"] == "polygon" and a[4]["kind"] == "point"


def test_geojson_documents_elem_id_attr(spark, tmp_path):
    from planetiler_openmaptiles_spark.sources import geojson as GJ
    from planetiler_openmaptiles_spark.spans import decode_documents

    p = GJ.write_geojson(str(tmp_path / "lc.geojsonl"),
                         [({"OSM_ID": "4242"}, "LINESTRING (7.1 43.1, 7.2 43.2)")])
    docs = GJ.geojson_to_documents(spark, p, "lake_centerlines",
                                   elem_id_attr="OSM_ID", keep_attrs=False)
    feats = decode_documents(docs).collect()
    assert len(feats) == 1
    assert feats[0]["elem_id"] == 4242 and feats[0]["tags"] == {}


def test_wikidata_names_json_both_shapes(spark, tmp_path):
    from planetiler_openmaptiles_spark.sources import wikidata_names as WD

    rows = [(f"Q{100 + i}", {"es": f"es{i}", "de": f"de{i}"}) for i in range(6)]
    p = WD.write_wikidata_names(str(tmp_path / "wikidata_names.json"), rows)
    # malformed trailing line must be skipped, not crash
    with open(p, "a") as f:
        f.write("{truncated\n")
    out = WD.read_wikidata_names(spark, p).collect()
    got = {(r["qid"], r["lang"]): r["name"] for r in out}
    assert len(got) == 12
    assert got[("Q101", "es")] == "es0".replace("0", "1")  # array-form line
    assert got[("Q100", "de")] == "de0"  # object-form line


def test_wikidata_json_override_joins_translations(spark, tmp_path, corpus_dir):
    from planetiler_openmaptiles_spark.layers import Config
    from planetiler_openmaptiles_spark.pipeline import _build_context
    from planetiler_openmaptiles_spark.sources import wikidata_names as WD

    p = WD.write_wikidata_names(str(tmp_path / "wd.json"),
                                [("Q1000", {"es": "Ciudad X"})])
    ctx = _build_context(spark, corpus_dir, Config(wikidata_json=p))
    try:
        hit = ctx.features.filter(
            F.element_at("tags", "name:es") == "Ciudad X").count()
        assert hit > 0  # corpus has wikidata=Q1000 elements (datagen)
    finally:
        ctx.features.unpersist()


def test_zip_packaged_sources(spark, tmp_path):
    """Reference artifact shapes: lake_centerline.shp.zip and
    natural_earth_vector.sqlite.zip read directly (archive.materialize)."""
    import zipfile

    base = S.write_shapefile(str(tmp_path / "lake_centerline"),
                             [({"OSM_ID": "9"}, "LINESTRING (0 0, 1 1)")], epsg=3857)
    zp = tmp_path / "lake_centerline.shp.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        for ext in (".shp", ".shx", ".dbf", ".prj"):
            zf.write(str(tmp_path / ("lake_centerline" + ext)), "lake_centerline" + ext)
    rows = S.read_shapefile(spark, str(zp)).collect()
    assert len(rows) == 1 and rows[0]["attrs"]["OSM_ID"] == "9"

    ne = NE.write_natural_earth_sqlite(
        str(tmp_path / "natural_earth_vector.sqlite"),
        {"ne_10m_lakes": [({"ne_id": "5"}, "POINT (1 2)")]})
    zp2 = tmp_path / "natural_earth_vector.sqlite.zip"
    with zipfile.ZipFile(zp2, "w") as zf:
        zf.write(ne, "natural_earth_vector.sqlite")
    out = NE.read_natural_earth_sqlite(spark, str(zp2)).collect()
    assert len(out) == 1 and out[0]["tags"]["ne_id"] == "5"


def test_reference_workflow_all_real_sources(spark, tmp_path):
    """The reference's exact workflow (OpenMapTilesMain.java:32-58) on this
    engine: tiles built ENTIRELY from real source files — .osm.pbf extract,
    water-polygons shapefile, lake_centerline GeoJSON, Natural Earth
    sqlite, wikidata_names.json — no parquet corpus anywhere."""
    from planetiler_openmaptiles_spark.layers import Config
    from planetiler_openmaptiles_spark.pipeline import build_tiles
    from planetiler_openmaptiles_spark.sources import geojson as GJ
    from planetiler_openmaptiles_spark.sources import wikidata_names as WD
    from planetiler_openmaptiles_spark.sources.osm_pbf import write_osm_pbf

    lon0, lat0 = 7.42, 43.73
    nodes = [
        (1, lat0, lon0, [("place", "city"), ("name", "Monato"),
                         ("wikidata", "Q909")]),
    ] + [(10 + i, lat0 + dy, lon0 + dx, [])
         for i, (dx, dy) in enumerate(
             [(0.01, 0.01), (0.05, 0.01), (0.05, 0.05), (0.01, 0.05)])]
    ways = [(100, [("natural", "water"), ("name", "Lac Bleu")],
             [10, 11, 12, 13, 10])]
    pbf = str(tmp_path / "area.osm.pbf")
    write_osm_pbf(pbf, nodes, ways, [], block_size=64)

    water = S.write_shapefile(
        str(tmp_path / "water_poly"),
        [({}, f"POLYGON (({lon0 - 0.3} {lat0 - 0.3}, {lon0 - 0.1} {lat0 - 0.3}, "
              f"{lon0 - 0.1} {lat0 - 0.1}, {lon0 - 0.3} {lat0 - 0.1}, "
              f"{lon0 - 0.3} {lat0 - 0.3}))")], epsg=3857)
    lake_cl = GJ.write_geojson(
        str(tmp_path / "lake_centerline.geojsonl"),
        [({"OSM_ID": "100"},
          f"LINESTRING ({lon0 + 0.015} {lat0 + 0.03}, {lon0 + 0.045} {lat0 + 0.03})")])
    ne = NE.write_natural_earth_sqlite(
        str(tmp_path / "natural_earth_vector.sqlite"),
        {"ne_10m_admin_0_countries": [
            ({"name": "Monatoland", "iso_a2": "MO"},
             f"POLYGON (({lon0 - 1} {lat0 - 1}, {lon0 + 1} {lat0 - 1}, "
             f"{lon0 + 1} {lat0 + 1}, {lon0 - 1} {lat0 + 1}, {lon0 - 1} {lat0 - 1}))")]})
    wd = WD.write_wikidata_names(str(tmp_path / "wikidata_names.json"),
                                 [("Q909", {"es": "Ciudad M"})])

    cfg = Config(water_shp=water, lake_centerline_geojson=lake_cl,
                 natural_earth_sqlite=ne, wikidata_json=wd, max_zoom=8,
                 # the assertions touch these three layers; the full
                 # 16-layer build from a pbf corpus is covered by
                 # test_osm_pbf.py::test_e2e_cli_build_from_pbf
                 only_layers=("water", "water_name", "place"))
    tiles = build_tiles(spark, "pbf:" + pbf, cfg).cache()
    try:
        assert tiles.count() > 0
        layers = {r["layer"] for r in tiles.select("layer").distinct().collect()}
        assert "water" in layers  # shapefile ocean rendered
        es = tiles.filter(
            (F.col("layer") == "place")
            & (F.element_at("attrs", "name:es") == "Ciudad M")).count()
        assert es > 0  # wikidata_names.json translation reached the tiles
        named_water = tiles.filter(
            (F.col("layer") == "water_name")
            & (F.element_at("attrs", "name") == "Lac Bleu")).count()
        assert named_water > 0  # lake + centerline flowed through water_name
    finally:
        tiles.unpersist()


# ----------------------------------------------------- review regressions


def test_geojson_nonfinite_properties(spark, tmp_path):
    """json.loads accepts Infinity/NaN tokens; they must stringify, not
    crash the executor task."""
    p = str(tmp_path / "inf.geojsonl")
    with open(p, "w") as f:
        f.write('{"type":"Feature","id":1,"geometry":{"type":"Point",'
                '"coordinates":[1,2]},"properties":{"depth":Infinity,'
                '"q":NaN,"ok":3.0}}\n')
    from planetiler_openmaptiles_spark.sources import geojson as GJ

    rows = GJ.read_geojson(spark, p).collect()
    assert rows[0]["attrs"]["ok"] == "3"
    assert rows[0]["attrs"]["depth"] == "inf"


def test_elem_id_attr_nonnumeric_falls_back_to_fid(spark, tmp_path):
    p = S.write_shapefile(str(tmp_path / "bad_ids"),
                          [({"OSM_ID": "n123"}, "LINESTRING (0 0, 1 1)"),
                           ({"OSM_ID": "77"}, "LINESTRING (2 2, 3 3)")],
                          epsg=4326)
    docs = S.shapefile_to_documents(spark, p, "lake_centerlines",
                                    elem_id_attr="OSM_ID")
    from planetiler_openmaptiles_spark.spans import decode_documents

    got = {r["elem_id"] for r in decode_documents(docs).collect()}
    assert got == {1, 77}  # non-numeric attr -> fid, numeric attr kept


def test_lake_centerline_sources_mutually_exclusive(spark, tmp_path, corpus_dir):
    from planetiler_openmaptiles_spark.layers import Config
    from planetiler_openmaptiles_spark.pipeline import _build_context

    with pytest.raises(ValueError, match="mutually exclusive"):
        _build_context(spark, corpus_dir, Config(
            lake_centerline_shp="a.shp", lake_centerline_geojson="b.geojson"))


def test_wkb_big_endian_not_misread_as_spatialite():
    """A BE WKB blob starting 0x00 whose byte 38 collides with 0x7C and
    whose last byte collides with 0xFE must still decode as WKB (the
    SpatiaLite parse cannot consume it exactly)."""
    # BE linestring with crafted coordinate bytes
    pts = np.array([[1.5, 2.5], [3.25, 4.75], [5.0, 6.0]])
    blob = bytearray(struct.pack(">BII", 0, 2, 3) + pts.astype(">f8").tobytes())
    # force the collision bytes inside coordinate mantissas (keeps doubles finite)
    blob[38] = 0x7C
    blob[-1] = 0xFE
    g = W.decode_geometry_blob(bytes(blob))
    assert g[0] == "LineString" and g[1].shape == (3, 2)
