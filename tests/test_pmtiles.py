"""PMTiles v3 sink (second archive format, planetiler ``--output=*.pmtiles``
parity). Codec vectors from the public spec: Hilbert tile ids, varint
directories with delta ids / run-lengths / contiguous-offset encoding,
127-byte header, gzip internal+tile compression, leaf spillover past the
16 KiB root budget.
"""

import gzip
import json

import numpy as np
import pytest

from planetiler_openmaptiles_spark.tiling import mvt, pmtiles as pmt


def test_tile_id_known_values():
    # spec examples: id 0 is z0; zoom prefix sums are (4^z - 1)/3
    assert pmt.zxy_to_tile_id(0, 0, 0) == 0
    assert pmt.zxy_to_tile_id(1, 0, 0) == 1
    assert pmt.zxy_to_tile_id(2, 0, 0) == 5
    assert pmt.zxy_to_tile_id(3, 0, 0) == 21
    # a zoom level's ids exactly cover [prefix, prefix + 4^z)
    ids = sorted(
        pmt.zxy_to_tile_id(2, x, y) for x in range(4) for y in range(4)
    )
    assert ids == list(range(5, 21))


def test_tile_id_roundtrip_and_vectorized_parity():
    rng = np.random.RandomState(7)
    zs = rng.randint(0, 15, 500)
    xs = np.array([rng.randint(0, 1 << z) for z in zs])
    ys = np.array([rng.randint(0, 1 << z) for z in zs])
    vec = pmt.tile_ids_np(zs, xs, ys)
    for z, x, y, tid in zip(zs, xs, ys, vec):
        assert pmt.zxy_to_tile_id(int(z), int(x), int(y)) == tid
        assert pmt.tile_id_to_zxy(int(tid)) == (int(z), int(x), int(y))
    # Hilbert adjacency: consecutive ids at one zoom are grid neighbours
    z = 4
    order = {pmt.zxy_to_tile_id(z, x, y): (x, y)
             for x in range(16) for y in range(16)}
    ids = sorted(order)
    for a, b in zip(ids, ids[1:]):
        (x0, y0), (x1, y1) = order[a], order[b]
        assert abs(x0 - x1) + abs(y0 - y1) == 1


def test_directory_roundtrip_all_offset_forms():
    entries = [
        pmt.Entry(10, 0, 100, 1),     # absolute offset
        pmt.Entry(11, 100, 50, 3),    # contiguous -> encoded as 0
        pmt.Entry(20, 0, 100, 1),     # dedup back-reference
        pmt.Entry(21, 150, 7, 0),     # leaf pointer (run_length 0)
    ]
    got = pmt.deserialize_directory(pmt.serialize_directory(entries))
    assert got == entries


def test_find_entry_run_length_semantics():
    entries = [pmt.Entry(5, 0, 10, 4), pmt.Entry(20, 10, 5, 1)]
    assert pmt._find_entry(entries, 5).tile_id == 5
    assert pmt._find_entry(entries, 8).tile_id == 5   # inside the run
    assert pmt._find_entry(entries, 9) is None        # past the run
    assert pmt._find_entry(entries, 20).tile_id == 20
    assert pmt._find_entry(entries, 4) is None


def test_header_pack_unpack_roundtrip():
    h = pmt.Header(
        root_length=321, metadata_offset=448, metadata_length=17,
        leaf_offset=465, leaf_length=0, data_offset=465, data_length=9999,
        n_addressed=42, n_entries=40, n_contents=38, clustered=True,
        min_zoom=0, max_zoom=14,
        bounds=(7.40, 43.71, 7.45, 43.76), center_zoom=14,
        center=(7.425, 43.735),
    )
    buf = h.pack()
    assert len(buf) == pmt.HEADER_BYTES
    got = pmt.Header.unpack(buf)
    assert got.n_addressed == 42 and got.max_zoom == 14
    np.testing.assert_allclose(got.bounds, h.bounds, atol=1e-7)
    np.testing.assert_allclose(got.center, h.center, atol=1e-7)


def test_writer_reader_roundtrip_with_dedup_and_runs(tmp_path):
    path = str(tmp_path / "t.pmtiles")
    w = pmt.PmtilesWriter(path, {"name": "t"})
    blob_a, blob_b = b"tile-contents-A" * 20, b"tile-contents-B" * 20
    # ids 5..8 identical+consecutive -> one run-length-4 entry
    for tid in (5, 6, 7, 8):
        w.add_tile(tid, blob_a)
    w.add_tile(9, blob_b)
    w.add_tile(30, blob_a)  # dedup back-reference, non-consecutive
    rep = w.finish()
    assert rep["tiles"] == 6
    assert rep["entries"] == 3      # run(5..8), 9, 30
    assert rep["contents"] == 2     # two distinct blobs stored once each

    r = pmt.PmtilesReader(path)
    assert r.header.n_addressed == 6 and r.header.clustered
    assert sorted(r.tile_ids()) == [5, 6, 7, 8, 9, 30]
    for tid, want in [(5, blob_a), (7, blob_a), (8, blob_a),
                      (9, blob_b), (30, blob_a)]:
        z, x, y = pmt.tile_id_to_zxy(tid)
        assert r.get_tile(z, x, y) == want
    z, x, y = pmt.tile_id_to_zxy(10)
    assert r.get_tile(z, x, y) is None
    assert r.metadata() == {"name": "t"}
    r.close()


def test_out_of_order_add_rejected(tmp_path):
    w = pmt.PmtilesWriter(str(tmp_path / "o.pmtiles"), {})
    w.add_tile(10, b"x")
    with pytest.raises(ValueError):
        w.add_tile(10, b"y")
    with pytest.raises(ValueError):
        w.add_tile(3, b"y")
    w.finish()


def test_leaf_directory_spillover(tmp_path):
    """>16 KiB of root entries must spill to leaves and still resolve."""
    path = str(tmp_path / "big.pmtiles")
    w = pmt.PmtilesWriter(path, {"name": "big"})
    rng = np.random.RandomState(3)
    # unique random blobs + irregular id gaps defeat dedup AND the
    # directory's own gzip, so the compressed root really exceeds 16 KiB
    ids = np.cumsum(rng.randint(1, 100, 40000)).tolist()
    for tid in ids:
        w.add_tile(int(tid), rng.bytes(24))
    rep = w.finish()
    assert rep["entries"] == len(ids)
    r = pmt.PmtilesReader(path)
    assert r.header.leaf_length > 0
    # every root entry is a leaf pointer
    assert all(e.run_length == 0 for e in r._root)
    assert r.tile_ids() == ids
    for tid in (ids[0], ids[1], ids[4095], ids[4096], ids[-1]):
        z, x, y = pmt.tile_id_to_zxy(tid)
        assert r.get_tile(z, x, y) is not None
    present = set(ids)
    probe = next(i for i in range(1, 1 << 22) if i not in present)
    z, x, y = pmt.tile_id_to_zxy(probe)
    assert r.get_tile(z, x, y) is None
    r.close()


def test_pmtiles_sink_end_to_end(spark, tmp_path):
    """Build water+place tiles from the corpus, write pmtiles, read every
    tile back and byte-compare against the mbtiles sink's blobs."""
    import sqlite3
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry
    from planetiler_openmaptiles_spark.layers import Config
    from planetiler_openmaptiles_spark.pipeline import (
        build_tiles, write_mbtiles, write_pmtiles,
    )

    corpus = entry._corpus_dir("/root/testdata/sf0.001")
    tiles = build_tiles(
        spark, corpus, Config(only_layers=("water", "place"), max_zoom=6)
    )
    path = str(tmp_path / "out.pmtiles")
    rep = write_pmtiles(tiles, path, max_zoom=6)
    assert rep["tiles"] > 0

    mb_path = str(tmp_path / "out.mbtiles")
    write_mbtiles(tiles, mb_path, max_zoom=6)
    con = sqlite3.connect(mb_path)
    mb = {
        (z, x, (1 << z) - 1 - tms): bytes(b)
        for z, x, tms, b in con.execute(
            "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles"
        )
    }
    r = pmt.PmtilesReader(path)
    assert r.header.tile_type == pmt.TILETYPE_MVT
    assert r.header.min_zoom <= r.header.max_zoom == 6
    w, s, e, n = r.header.bounds
    assert -180 <= w < e <= 180 and -86 <= s < n <= 86
    meta = r.metadata()
    assert meta["format"] == "pbf"
    ids = {l["id"] for l in meta["vector_layers"]}
    assert "water" in ids and "place" in ids

    assert r.header.n_addressed == len(mb)
    for (z, x, y), blob in mb.items():
        got = r.get_tile(z, x, y)  # reader gunzips per tile_compression
        assert got is not None
        # same executor-side encoder -> payloads byte-match
        assert got == gzip.decompress(blob)
        dec = mvt.decode_tile(bytes(got))
        assert all(l["extent"] == 4096 for l in dec.values())
    r.close()


def test_pmtiles_sharded_byte_identical_to_stream(spark, tmp_path):
    """The executor-side chunked pmtiles build must be BYTE-IDENTICAL to the
    legacy driver-stream writer: global sha1 dedup, run-length coalescing,
    directory layout and header all replayed exactly (r3 verdict #3)."""
    import os
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry
    from planetiler_openmaptiles_spark.layers import Config
    from planetiler_openmaptiles_spark.pipeline import build_tiles, write_pmtiles

    corpus = entry._corpus_dir("/root/testdata/sf0.001")
    tiles = build_tiles(
        spark, corpus, Config(only_layers=("water", "place"), max_zoom=6)
    )
    p_shard = str(tmp_path / "shard.pmtiles")
    p_stream = str(tmp_path / "stream.pmtiles")
    rep_sh = write_pmtiles(tiles, p_shard, max_zoom=6, sharded=True, n_chunks=7)
    rep_st = write_pmtiles(tiles, p_stream, max_zoom=6, sharded=False)
    assert rep_sh["tiles"] == rep_st["tiles"] > 0
    assert rep_sh["entries"] == rep_st["entries"]
    assert rep_sh["contents"] == rep_st["contents"]
    assert rep_sh["bytes"] == rep_st["bytes"]
    assert not os.path.exists(p_shard + ".chunks")  # chunks cleaned up
    assert not os.path.exists(p_shard + ".data")  # spool spliced + removed
    with open(p_shard, "rb") as fa, open(p_stream, "rb") as fb:
        assert fa.read() == fb.read()


def test_chunked_gzip_matches_one_shot():
    """build_directories_spooled's root-budget probe streams the
    serialized directory through zlib.compressobj(9, DEFLATED, wbits=31);
    its byte output must equal gzip.compress(data, 9, mtime=0) (what
    _maybe_gzip produces) or the fits-budget decision could diverge."""
    import gzip
    import zlib

    rng = np.random.RandomState(7)
    data = rng.bytes(100000) + b"abc" * 50000
    co = zlib.compressobj(9, zlib.DEFLATED, 31)
    out = b"".join(
        co.compress(data[i : i + 7777]) for i in range(0, len(data), 7777)
    ) + co.flush()
    assert out == gzip.compress(data, 9, mtime=0)


def _spool_from(entries, tmp_path, name):
    sp = pmt.EntrySpool(str(tmp_path / name))
    for e in entries:
        sp.append(pmt.Entry(e.tile_id, e.offset, e.length, e.run_length))
    return sp


def test_spooled_directories_byte_identical_small(tmp_path):
    """Root-fits case: the spooled builder must load-and-delegate,
    producing bit-exact legacy root bytes and zero leaves."""
    entries = []
    off = 0
    for i in range(500):
        ln = 20 + i % 7
        entries.append(pmt.Entry(3 + 5 * i, off, ln, 1 + i % 3))
        off += ln
    root_mem, leaves_mem = pmt.build_directories(entries)
    assert leaves_mem == b""
    sp = _spool_from(entries, tmp_path, "small.entries")
    lp = str(tmp_path / "small.leaves")
    root_sp, leaf_len = pmt.build_directories_spooled(sp, lp)
    assert root_sp == root_mem
    assert leaf_len == 0
    assert open(lp, "rb").read() == b""
    sp.close()


def test_spooled_directories_byte_identical_leaf_mode(tmp_path):
    """>16 KiB root case (same fixture shape as the writer spill test):
    the spooled builder streams leaves to disk; root + leaf bytes must
    equal the in-memory builder's exactly."""
    rng = np.random.RandomState(3)
    ids = np.cumsum(rng.randint(1, 100, 40000)).tolist()
    entries = []
    off = 0
    for tid in ids:
        ln = int(rng.randint(10, 40))
        entries.append(pmt.Entry(int(tid), off, ln, 1))
        off += ln
    root_mem, leaves_mem = pmt.build_directories(entries)
    assert leaves_mem  # leaf mode engaged
    sp = _spool_from(entries, tmp_path, "big.entries")
    lp = str(tmp_path / "big.leaves")
    root_sp, leaf_len = pmt.build_directories_spooled(sp, lp)
    assert root_sp == root_mem
    assert open(lp, "rb").read() == leaves_mem
    assert leaf_len == len(leaves_mem)
    sp.close()


def test_entry_spool_serialization_matches_list(tmp_path):
    """_serialized_dir_chunks must concatenate to serialize_directory of
    the same entries, including run-length mutation of the buffered tail."""
    entries = [pmt.Entry(1, 0, 10, 1), pmt.Entry(9, 10, 4, 1)]
    sp = pmt.EntrySpool(str(tmp_path / "t.entries"))
    sp.append(pmt.Entry(1, 0, 10, 1))
    sp.append(pmt.Entry(9, 10, 4, 1))
    sp.last.run_length += 2  # the writers' run-length merge path
    entries[-1].run_length += 2
    got = b"".join(pmt._serialized_dir_chunks(sp))
    assert got == pmt.serialize_directory(entries)
    assert len(sp) == 2
    sp.close()
