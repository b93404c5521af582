"""OSM PBF source connector tests.

Three independence layers: (1) wire-format vectors hand-verified against the
published spec (no writer involved — byte literals in the test), (2)
writer→reader round-trips at multi-block sizes, (3) end-to-end: pbf →
documents table → span invariant + schema table match."""

import struct
import zlib

import numpy as np
import pytest

from planetiler_openmaptiles_spark.sources.osm_pbf import (
    parse_header_block,
    parse_primitive_block,
    pbf_to_documents,
    read_blob,
    read_osm_entities,
    scan_blob_index,
    write_osm_pbf,
    ways_with_geometry,
    _packed_sints,
    _packed_varints,
    _zigzag_decode,
)


# ------------------------------------------------------------- wire vectors


def test_varint_zigzag_hand_vectors():
    # zigzag(10) = 20 = 0x14 — single byte (hand-checked)
    assert _packed_sints(b"\x14").tolist() == [10]
    # zigzag(-1) = 1
    assert _packed_sints(b"\x01").tolist() == [-1]
    # zigzag(10_000_000) = 20_000_000 = (((9*128 + 68)*128 + 90)*128 + 0)
    # → LSB-first 7-bit groups [0, 90, 68, 9] → bytes 0x80 0xDA 0xC4 0x09
    # (hand-derived)
    assert _packed_sints(b"\x80\xda\xc4\x09").tolist() == [10_000_000]
    # packed varints: [1, 300]; 300 = 0xAC 0x02
    assert _packed_varints(b"\x01\xac\x02").tolist() == [1, 300]
    # zigzag decode of array
    assert _zigzag_decode(np.array([0, 1, 2, 3], dtype=np.uint64)).tolist() == [0, -1, 1, -2]


def test_vectorized_varints_match_scalar_reference():
    """The numpy masked-pass decoder must agree with a byte-at-a-time
    scalar reference on adversarial values (every varint length 1-10,
    boundary values, u64 wraparound)."""
    import random

    def scalar_decode(buf):
        out, v, shift = [], 0, 0
        for b in buf:
            v |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                out.append(v & ((1 << 64) - 1))
                v, shift = 0, 0
        return out

    def encode(v):
        out = bytearray()
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    rng = random.Random(1234)
    vals = [0, 1, 127, 128, 16383, 16384, (1 << 64) - 1, 1 << 63, (1 << 63) - 1]
    vals += [rng.getrandbits(rng.randint(1, 64)) for _ in range(500)]
    rng.shuffle(vals)
    buf = b"".join(encode(v) for v in vals)
    got = _packed_varints(buf)
    assert got.dtype == np.uint64
    assert got.tolist() == scalar_decode(buf) == vals
    # truncated payload (trailing continuation byte) must raise, not hang
    with pytest.raises(ValueError):
        _packed_varints(buf + b"\x80")
    assert _packed_varints(b"").tolist() == []


def _ld(field, payload):  # local, independent len-delim helper
    return bytes([field << 3 | 2, len(payload)]) + payload


def test_hand_built_dense_block(tmp_path):
    """A full pbf file assembled from byte literals (spec, not writer):
    one OSMHeader blob + one OSMData blob holding two dense nodes,
    node 10 tagged amenity=cafe at (lat 1.0, lon 2.0), node 12 untagged at
    (1.00005, 2.00005)."""
    # StringTable: "", "amenity", "cafe"
    st = _ld(1, _ld(1, b"") + _ld(1, b"amenity") + _ld(1, b"cafe"))
    # DenseNodes: id deltas [10, 2]  -> zigzag [20, 4] = 14 04
    dense = _ld(1, b"\x14\x04")
    # lat raw (granularity 100): 1.0deg = 10_000_000 raw, delta2 = 500
    # zigzag: 20_000_000 -> 80 DA C4 09 ; 1000 -> E8 07
    dense += _ld(8, b"\x80\xda\xc4\x09\xe8\x07")
    # lon raw: 2.0deg = 20_000_000 raw -> zigzag 40_000_000; the multi-byte
    # varint literal comes from the local vi() helper below (independent of
    # the module's writer):
    def vi(v):
        out = bytearray()
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    dense += _ld(9, vi(40_000_000) + vi(1000))
    # keys_vals: node1: [1,2,0]; node2: [0]
    dense += _ld(10, b"\x01\x02\x00\x00")
    group = _ld(2, dense)
    block = st + _ld(2, group)

    hdr_block = _ld(4, b"OsmSchema-V0.6") + _ld(4, b"DenseNodes")

    def blob(btype, payload):
        gz = zlib.compress(payload)
        b = bytes([2 << 3]) + vi(len(payload)) + _ld(3, gz)
        h = _ld(1, btype) + bytes([3 << 3]) + vi(len(b))
        return struct.pack(">i", len(h)) + h + b

    path = tmp_path / "hand.osm.pbf"
    path.write_bytes(blob(b"OSMHeader", hdr_block) + blob(b"OSMData", block))

    idx = scan_blob_index(str(path))
    assert [b["type"] for b in idx] == ["OSMHeader", "OSMData"]
    with open(path, "rb") as f:
        hdr = parse_header_block(read_blob(f, idx[0]["offset"], idx[0]["size"]))
        assert "DenseNodes" in hdr["required_features"]
        ents = parse_primitive_block(read_blob(f, idx[1]["offset"], idx[1]["size"]))
    nd = ents["nodes"]
    assert nd["id"].tolist() == [10, 12]
    assert nd["lat"].tolist() == pytest.approx([1.0, 1.00005], abs=1e-9)
    assert nd["lon"].tolist() == pytest.approx([2.0, 2.00005], abs=1e-9)
    assert nd["tags"] == [[("amenity", "cafe")], []]


# -------------------------------------------------------------- round trips


def _fixture_entities(n_nodes=300):
    nodes = []
    for i in range(n_nodes):
        lat = ((i * 7919) % 160_000) / 1000.0 - 80.0
        lon = ((i * 104_729) % 340_000) / 1000.0 - 170.0
        tags = [("name", f"n{i}"), ("natural", "peak")] if i % 7 == 0 else []
        nodes.append((i + 1, lat, lon, tags))
    ways = []
    for w in range(n_nodes // 10):
        refs = [w * 5 + k + 1 for k in range(6)]
        ways.append((100_000 + w, [("highway", "primary"), ("ref", f"W{w}")], refs))
    rels = [
        (900_000 + r,
         [("type", "route"), ("route", "road"), ("network", "US:I")],
         [(100_000 + r * 3, "member", 1), (100_000 + r * 3 + 1, "", 1)])
        for r in range(5)
    ]
    return nodes, ways, rels


def test_writer_reader_roundtrip_multiblock(tmp_path):
    nodes, ways, rels = _fixture_entities()
    path = str(tmp_path / "rt.osm.pbf")
    write_osm_pbf(path, nodes, ways, rels, block_size=64)  # forces many blobs
    idx = scan_blob_index(path)
    assert sum(1 for b in idx if b["type"] == "OSMData") > 5

    got_nodes, got_ways, got_rels = [], [], []
    with open(path, "rb") as f:
        for b in idx:
            if b["type"] != "OSMData":
                continue
            ents = parse_primitive_block(read_blob(f, b["offset"], b["size"]))
            nd = ents["nodes"]
            for i in range(len(nd["id"])):
                got_nodes.append(
                    (int(nd["id"][i]), nd["lat"][i], nd["lon"][i], nd["tags"][i]))
            got_ways += [(w, t, r.tolist()) for w, t, r in ents["ways"]]
            got_rels += ents["rels"]

    assert len(got_nodes) == len(nodes)
    for (gid, glat, glon, gtags), (eid, elat, elon, etags) in zip(got_nodes, nodes):
        assert gid == eid
        assert glat == pytest.approx(elat, abs=1e-7)
        assert glon == pytest.approx(elon, abs=1e-7)
        assert gtags == etags
    assert got_ways == [(w, t, list(r)) for w, t, r in ways]
    assert got_rels == rels


def test_spark_distributed_read(spark, tmp_path):
    nodes, ways, rels = _fixture_entities()
    path = str(tmp_path / "sp.osm.pbf")
    write_osm_pbf(path, nodes, ways, rels, block_size=50)
    ents = read_osm_entities(spark, path).cache()
    assert ents.filter("etype=0").count() == len(nodes)
    assert ents.filter("etype=1").count() == len(ways)
    assert ents.filter("etype=2").count() == len(rels)
    row = ents.filter("etype=0 AND id=8").first()
    assert [(t["key"], t["value"]) for t in row["tags"]] == [("name", "n7"), ("natural", "peak")]
    wrow = ents.filter("etype=1 AND id=100001").first()
    assert wrow["refs"] == [6, 7, 8, 9, 10, 11]
    rrow = ents.filter("etype=2 AND id=900000").first()
    assert [(m["memid"], m["role"], m["mtype"]) for m in rrow["members"]] == [
        (100_000, "member", 1), (100_001, "", 1)]

    geoms = ways_with_geometry(ents)
    g = geoms.filter("id=100000").first()["geom_wkt"]
    assert g.startswith("LINESTRING (") and g.count(",") == 5
    ents.unpersist()


def test_pbf_to_documents_span_invariant(spark, tmp_path):
    from planetiler_openmaptiles_spark.spans import decode_documents, with_span_invariant
    from planetiler_openmaptiles_spark.schema.tables import all_table_matches

    nodes, ways, rels = _fixture_entities(200)
    path = str(tmp_path / "docs.osm.pbf")
    write_osm_pbf(path, nodes, ways, rels, block_size=64)
    docs = pbf_to_documents(spark, path).cache()

    n_tagged_nodes = sum(1 for *_, t in nodes if t)
    assert docs.count() == n_tagged_nodes + len(ways)

    feats = decode_documents(docs)
    flagged = with_span_invariant(docs, feats)
    assert flagged.filter("NOT span_invariant_ok").count() == 0

    # rel spans landed on member ways
    way_feat = feats.filter("elem_id = 100000 AND source = 'osm'").first()
    assert len(way_feat["rels"]) == 1
    assert way_feat["rels"][0]["rel_tags"]["network"] == "US:I"

    # schema tables actually match these entities (peaks + primary roads)
    matches = all_table_matches(feats)
    tbls = {r["table"] for r in matches.select("table").distinct().collect()}
    assert "osm_highway_linestring" in tbls or "osm_transportation_merge_linestring" in tbls or any(
        "highway" in t or "transportation" in t for t in tbls), tbls
    assert any("peak" in t or "mountain" in t for t in tbls), tbls
    docs.unpersist()


def test_e2e_cli_build_from_pbf(spark, tmp_path):
    """Full pipeline surface from a .osm.pbf extract: pbf: corpus scheme →
    decode → layers → tiles, via the CLI entrypoint."""
    from planetiler_openmaptiles_spark import pipeline as P

    nodes, ways, rels = _fixture_entities(200)
    path = str(tmp_path / "e2e.osm.pbf")
    write_osm_pbf(path, nodes, ways, rels, block_size=64)
    out = str(tmp_path / "out")
    P.main([
        "--osm-pbf", path, "--out", out, "--max-zoom", "7",
        "--check-invariant",
    ])
    import json as _json

    with open(f"{out}/build_report.json") as f:
        rep = _json.load(f)
    assert rep["tile_features"] > 0 and rep["tiles"] > 0


def test_pbf_corpus_builds_tiles(spark, tmp_path):
    """End-to-end: an .osm.pbf extract fed through the 'pbf:' corpus scheme
    must drive the full layer pipeline — node docs render as points, closed
    ways as polygons, highways as lines, and a route relation's ref reaches
    the transportation layer via the replayed rel spans (planetiler's
    OsmReader pass-2 shape: readers feed the same FeatureCollector no
    matter the source file)."""
    from planetiler_openmaptiles_spark.layers import Config
    from planetiler_openmaptiles_spark.pipeline import build_tiles, load_documents
    from planetiler_openmaptiles_spark.sources.osm_pbf import write_osm_pbf

    # A tiny Monaco-shaped extract: everything near (7.42E, 43.73N).
    lon0, lat0 = 7.42, 43.73
    nodes = [
        (1, lat0, lon0, [("place", "city"), ("name", "Monato")]),
        (2, lat0 + 0.001, lon0 + 0.001, [("natural", "peak"), ("name", "Pic"),
                                          ("ele", "812")]),
    ]
    # untagged geometry nodes for the ways
    ring = [(10 + i, lat0 + dy, lon0 + dx, [])
            for i, (dx, dy) in enumerate(
                [(0.01, 0.01), (0.05, 0.01), (0.05, 0.05), (0.01, 0.05)])]
    road = [(20 + i, lat0 - 0.001 * i, lon0 + 0.002 * i, []) for i in range(4)]
    rnd = [(30 + i, lat0 + dy, lon0 + dx, [])
           for i, (dx, dy) in enumerate(
               [(-0.001, 0.0), (0.0, 0.001), (0.001, 0.0), (0.0, -0.001)])]
    ways = [
        (100, [("natural", "water")], [10, 11, 12, 13, 10]),          # closed ring
        (200, [("highway", "primary"), ("name", "Main St")], [20, 21, 22, 23]),
        # closed ring WITHOUT area semantics (roundabout) — must stay a line
        (300, [("highway", "residential"), ("junction", "roundabout")],
         [30, 31, 32, 33, 30]),
    ]
    rels = [(900, [("type", "route"), ("route", "road"), ("ref", "R1"),
                   ("network", "int_ref")], [(200, "", 1)])]
    pbf = str(tmp_path / "tiny.osm.pbf")
    write_osm_pbf(pbf, nodes + ring + road + rnd, ways, rels, block_size=3)

    docs = load_documents(spark, "pbf:" + pbf)
    assert docs.columns == ["doc_id", "spans"]
    assert docs.count() == 5  # 2 tagged nodes + 3 ways; geometry nodes dropped

    from planetiler_openmaptiles_spark.spans import decode_documents
    kinds = {r["doc_id"]: r["geom_kind"]
             for r in decode_documents(docs).select("doc_id", "geom_kind").collect()}
    assert kinds["osm/way/100"] == "polygon"      # closed + natural → area
    assert kinds["osm/way/300"] == "linestring"   # closed ring, no area tags

    tiles = build_tiles(spark, "pbf:" + pbf, Config(max_zoom=10))
    by_layer = {r["layer"]: r["n"] for r in
                tiles.groupBy("layer").count().withColumnRenamed("count", "n").collect()}
    assert by_layer.get("water", 0) > 0            # closed natural=water way
    assert by_layer.get("transportation", 0) > 0   # highway line
    assert by_layer.get("place", 0) > 0            # city node
    assert by_layer.get("mountain_peak", 0) > 0    # peak node


def test_stitch_rings_kernel():
    """Ring assembly: closed ways pass through, open segments chain with
    direction reversal, dangling chains drop."""
    import numpy as np

    from planetiler_openmaptiles_spark.sources.osm_pbf import _stitch_rings

    closed = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], float)
    half_a = np.array([[2, 0], [3, 0], [3, 1]], float)
    half_b = np.array([[2, 0], [2, 1], [3, 1]], float)  # same endpoints, must reverse
    dangling = np.array([[9, 9], [9, 10]], float)
    rings = _stitch_rings([closed, half_a, half_b, dangling])
    assert len(rings) == 2
    assert any(len(r) == 5 and (r[0] == r[-1]).all() for r in rings)
    for r in rings:
        assert (r[0] == r[-1]).all()


def test_multipolygon_relation_assembles_with_hole(spark, tmp_path):
    """type=multipolygon relation → polygon document with a hole: outer ring
    split across two open member ways (one traversed backwards), inner ring
    a closed way; untagged geometry-carrier ways emit no documents of their
    own (OsmReader multipolygon semantics)."""
    from planetiler_openmaptiles_spark.geom.wkt import parse_wkt
    from planetiler_openmaptiles_spark.pipeline import load_documents
    from planetiler_openmaptiles_spark.sources.osm_pbf import write_osm_pbf
    from planetiler_openmaptiles_spark.spans import decode_documents

    lon0, lat0 = 7.4, 43.7
    outer = [(0.0, 0.0), (0.06, 0.0), (0.06, 0.06), (0.0, 0.06)]
    inner = [(0.02, 0.02), (0.04, 0.02), (0.04, 0.04), (0.02, 0.04)]
    nodes = [(1 + i, lat0 + dy, lon0 + dx, []) for i, (dx, dy) in enumerate(outer)]
    nodes += [(11 + i, lat0 + dy, lon0 + dx, []) for i, (dx, dy) in enumerate(inner)]
    ways = [
        (100, [], [1, 2, 3]),               # outer half A
        (101, [], [1, 4, 3]),               # outer half B (needs reversal)
        (102, [], [11, 12, 13, 14, 11]),    # closed inner ring
    ]
    rels = [(500, [("type", "multipolygon"), ("natural", "water"), ("name", "Lake")],
             [(100, "outer", 1), (101, "outer", 1), (102, "inner", 1)])]
    pbf = str(tmp_path / "mp.osm.pbf")
    write_osm_pbf(pbf, nodes, ways, rels, block_size=4)

    docs = load_documents(spark, "pbf:" + pbf)
    ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert ids == {"osm/relation/500"}  # untagged member ways drop

    row = decode_documents(docs).filter("doc_id = 'osm/relation/500'").collect()[0]
    assert row["geom_kind"] == "polygon"
    assert dict(row["tags"])["natural"] == "water"
    g = parse_wkt(row["geom_wkt"])
    assert g[0] == "Polygon" and len(g[1]) == 2  # outer + hole
    assert len(g[1][0]) == 5 and len(g[1][1]) == 5
