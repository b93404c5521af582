"""Tile-archive source connectors + archive comparison.

Planetiler core ships ``CompareArchives`` (compare two finished tile
archives tile-by-tile) and every downstream workflow starts from an
existing ``.mbtiles``/``.pmtiles`` artifact. This module reads those
archives back into the engine's tile-frame shape, distributed:

- ``read_mbtiles`` — sqlite archive → DataFrame(z, x, y, tile_data).
  Works on both the plain schema and the compact one (``tiles`` view over
  ``tiles_shallow``+``tiles_data``; Mbtiles.java ``--compact-db``). The
  DRIVER probes only split boundaries (P ``ORDER BY pk LIMIT 1 OFFSET k``
  index walks); each EXECUTOR opens the file read-only/immutable and
  selects its contiguous primary-key range — same single-file-B-tree
  scaling argument as sources/natural_earth.py.
- ``read_pmtiles`` — single-file PMTiles v3 → same schema. The driver
  parses the varint directories (KBs even for planet archives, they are
  the archive's own index), expands run-lengths, and ships (tile_id,
  offset, length) splits; executors seek+read+gunzip their byte ranges.
- ``decode_tiles`` — gzipped MVT blobs → per-feature rows in the engine
  tile-frame shape (z, x, y, layer, seq, elem_id, kind, geom_px, attrs),
  one Arrow pass per partition (tiling/mvt.py decoder, geom/packed
  encoding at the MVT 1/16-px quantization grid).
- ``compare_archives`` — read+decode two archives and roll up the
  per-(z, layer) only_a/only_b/changed/same counts via tiling/diff.py's
  multiset fingerprints: the regression tool planetiler users run after
  a code change, here as one full-outer equi-join on the tile key.
"""

from __future__ import annotations

import os
import sqlite3


def _connect_ro(path: str) -> sqlite3.Connection:
    return sqlite3.connect(
        f"file:{os.path.abspath(path)}?mode=ro&immutable=1", uri=True
    )


def create_compact_schema(con: sqlite3.Connection) -> None:
    """The compact mbtiles DDL (Mbtiles.java --compact-db): one source of
    truth shared by the sink (pipeline.write_mbtiles), the oracle fixture
    builder and the connector bench."""
    con.execute(
        "CREATE TABLE tiles_shallow (zoom_level integer,"
        " tile_column integer, tile_row integer, tile_data_id integer,"
        " PRIMARY KEY (zoom_level, tile_column, tile_row)) WITHOUT ROWID"
    )
    con.execute(
        "CREATE TABLE tiles_data (tile_data_id integer primary key,"
        " tile_data blob)"
    )
    con.execute(
        "CREATE VIEW tiles AS SELECT zoom_level, tile_column, tile_row,"
        " tile_data FROM tiles_shallow JOIN tiles_data USING (tile_data_id)"
    )


def _mbtiles_key_bounds(path: str, n_splits: int) -> list[tuple]:
    """Driver-side split plan: ~n_splits contiguous (zoom_level,
    tile_column, tile_row) ranges covering the archive. ONE grouped
    index-only scan of the physical table (tiles_shallow when compact)
    yields per-zoom row counts and column extents; splits are then
    allocated per zoom proportional to its rows and cut arithmetically
    along tile_column — no OFFSET walks (an OFFSET probe is O(rows) per
    split, O(rows x splits) total on a planet archive)."""
    con = _connect_ro(path)
    try:
        names = {
            r[0]
            for r in con.execute(
                "SELECT name FROM sqlite_master WHERE type IN ('table','view')"
            )
        }
        probe = "tiles_shallow" if "tiles_shallow" in names else "tiles"
        zooms = con.execute(
            f"SELECT zoom_level, count(*), min(tile_column), max(tile_column)"
            f" FROM {probe} GROUP BY zoom_level ORDER BY zoom_level"
        ).fetchall()
    finally:
        con.close()
    total = sum(n for _, n, _, _ in zooms)
    if total == 0:
        return []
    out = []
    for z, n, x0, x1 in zooms:
        k = max(1, round(n_splits * n / total))
        width = x1 - x0 + 1
        k = min(k, width)
        cuts = [x0 + (width * i) // k for i in range(k + 1)]
        for a, b in zip(cuts, cuts[1:]):
            # half-open on the (z, x) prefix: (z, a-1, MAX) < key <= (z, b-1, MAX)
            out.append((z, a - 1, 1 << 30, z, b - 1, 1 << 30))
    return out


def read_mbtiles(spark, path: str, n_splits: int | None = None):
    """mbtiles → DataFrame(z int, x int, y int, tile_data binary), TMS row
    flip undone (rows come back in the engine's XYZ orientation)."""
    import pandas as pd

    from .archive import materialize

    path = os.path.abspath(materialize(path, suffix=".mbtiles"))
    if n_splits is None:
        n_splits = spark.sparkContext.defaultParallelism * 2
    splits = _mbtiles_key_bounds(path, n_splits)
    schema = "z int, x int, y int, tile_data binary"
    if not splits:
        return spark.createDataFrame([], schema)
    idx = spark.createDataFrame(
        splits, "z0 int, x0 int, y0 int, z1 int, x1 int, y1 int"
    ).repartition(min(len(splits), spark.sparkContext.defaultParallelism))

    def _fetch(batches):
        con = _connect_ro(path)
        try:
            for pdf in batches:
                for z0, x0, y0, z1, x1, y1 in pdf.itertuples(index=False):
                    cur = con.execute(
                        "SELECT zoom_level, tile_column, tile_row, tile_data"
                        " FROM tiles WHERE (zoom_level, tile_column, tile_row)"
                        " > (?,?,?) AND (zoom_level, tile_column, tile_row)"
                        " <= (?,?,?)",
                        (int(z0), int(x0), int(y0), int(z1), int(x1), int(y1)),
                    )
                    zs, xs, ys, blobs = [], [], [], []
                    for z, x, tms_row, blob in cur:
                        zs.append(int(z))
                        xs.append(int(x))
                        ys.append((1 << int(z)) - 1 - int(tms_row))
                        blobs.append(bytes(blob))
                    yield pd.DataFrame(
                        {"z": pd.Series(zs, dtype="int32"),
                         "x": pd.Series(xs, dtype="int32"),
                         "y": pd.Series(ys, dtype="int32"),
                         "tile_data": blobs}
                    )
        finally:
            con.close()

    return idx.mapInPandas(_fetch, schema)


def read_pmtiles(spark, path: str):
    """PMTiles v3 → DataFrame(z int, x int, y int, tile_data binary).
    Run-length directory entries expand to one row per addressed tile
    (identical blobs re-read per tile — the dedup is an archive-storage
    property, not a feature-table one). Blobs come back exactly as stored
    (tile compression intact), matching read_mbtiles — decode_tiles
    gunzips."""
    import pandas as pd

    from ..tiling import pmtiles as pmt
    from .archive import materialize

    path = os.path.abspath(materialize(path, suffix=".pmtiles"))
    rd = pmt.PmtilesReader(path)
    header = rd.header
    if header.tile_compression not in (0, 1, 2):  # unknown / none / gzip
        rd.close()
        raise ValueError(
            "unsupported PMTiles tile_compression "
            f"{header.tile_compression} (only none/gzip); re-encode the "
            "archive or add a codec"
        )
    # the driver ships only ROOT-level rows: direct entries as-is, leaf
    # DIRECTORY pointers unexpanded (kind=1). Executors deserialize their
    # leaves and expand run-lengths locally — a planet archive's hundreds
    # of millions of addressed tiles never materialize on the driver.
    rows = []
    for e in rd._root:
        rows.append((int(e.run_length == 0), e.tile_id, e.offset, e.length,
                     e.run_length))
    rd.close()
    schema = "z int, x int, y int, tile_data binary"
    if not rows:
        return spark.createDataFrame([], schema)
    data_offset = header.data_offset
    leaf_offset = header.leaf_offset
    internal_compression = header.internal_compression
    idx = spark.createDataFrame(
        rows, "kind int, tid long, off long, length long, run long"
    ).repartition(min(len(rows), spark.sparkContext.defaultParallelism))

    def _fetch(batches):
        with open(path, "rb") as f:

            def _emit(tid, off, length, run, out):
                f.seek(data_offset + int(off))
                blob = f.read(int(length))
                for t in range(int(tid), int(tid) + int(run)):
                    z, x, y = pmt.tile_id_to_zxy(t)
                    out["z"].append(z)
                    out["x"].append(x)
                    out["y"].append(y)
                    out["tile_data"].append(blob)

            def _frame(out):
                return pd.DataFrame(
                    {"z": pd.Series(out["z"], dtype="int32"),
                     "x": pd.Series(out["x"], dtype="int32"),
                     "y": pd.Series(out["y"], dtype="int32"),
                     "tile_data": out["tile_data"]}
                )

            # flush every ~8k tiles so a leaf-dense partition (a planet
            # archive's z14 band) never accumulates its whole expansion
            # in one python list before the first Arrow batch leaves
            flush_rows = 8192
            for pdf in batches:
                out = {"z": [], "x": [], "y": [], "tile_data": []}
                for kind, tid, off, length, run in pdf.itertuples(index=False):
                    if kind == 0:
                        _emit(tid, off, length, run, out)
                    else:  # leaf directory: deserialize + expand locally
                        f.seek(leaf_offset + int(off))
                        leaf = pmt.deserialize_directory(
                            pmt._maybe_gunzip(
                                f.read(int(length)), internal_compression
                            )
                        )
                        for e in leaf:
                            if e.run_length > 0:
                                _emit(e.tile_id, e.offset, e.length,
                                      e.run_length, out)
                    if len(out["z"]) >= flush_rows:
                        yield _frame(out)
                        out = {"z": [], "x": [], "y": [], "tile_data": []}
                if out["z"]:
                    yield _frame(out)

    return idx.mapInPandas(_fetch, schema)


def _attr_str(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def decode_tiles(blobs):
    """(z, x, y, tile_data) → engine tile-frame rows (z, x, y, layer, seq,
    elem_id, kind, geom_px, attrs). Geometry is re-packed at the MVT
    quantization grid (integer coords / 16 → px floats), so two archives
    of the same build decode to byte-identical frames."""
    import numpy as np
    import pandas as pd

    from ..geom import packed
    from ..tiling import mvt

    schema = (
        "z int, x int, y int, layer string, seq long, elem_id long,"
        " kind string, geom_px binary, attrs map<string,string>"
    )

    def _dec(batches):
        for pdf in batches:
            out = {k: [] for k in
                   ("z", "x", "y", "layer", "seq", "elem_id", "kind",
                    "geom_px", "attrs")}
            for z, x, y, blob in zip(pdf["z"], pdf["x"], pdf["y"],
                                     pdf["tile_data"]):
                # decode_tile gunzips internally, INSIDE its ValueError
                # normalization — no pre-gunzip here, so a torn gzip
                # stream surfaces as the one actionable error type
                seq = 0
                for lname, layer in mvt.decode_tile(bytes(blob)).items():
                    for f in layer["features"]:
                        ipaths = f["paths"]  # integer 1/16-px grid coords
                        paths = [np.asarray(p, dtype=np.float64) / 16.0
                                 for p in ipaths]
                        if not paths:
                            continue
                        if f["type"] == mvt.GEOM_POINT:
                            kind = "point"
                            blob_px = packed.from_points(np.vstack(paths))
                        elif f["type"] == mvt.GEOM_LINE:
                            kind = "linestring"
                            blob_px = packed.from_lines(paths)
                        else:
                            kind = "polygon"
                            # MVT spec: a positive-area ring starts a new
                            # polygon; following negative rings are holes.
                            # Area sign from the INTEGER rings — the scaled
                            # float path truncates sub-pixel rings to 0
                            polys, cur = [], None
                            for ip, p in zip(ipaths, paths):
                                if mvt._ring_area2(ip) > 0 or cur is None:
                                    cur = [p]
                                    polys.append(cur)
                                else:
                                    cur.append(p)
                            blob_px = packed.from_polys(polys)
                        out["z"].append(int(z))
                        out["x"].append(int(x))
                        out["y"].append(int(y))
                        out["layer"].append(lname)
                        out["seq"].append(seq)
                        # encode_tile omits the id field for None/negative
                        # elem_ids; map absent back to -1 (round-trip safe)
                        out["elem_id"].append(
                            int(f["id"]) if f["id"] is not None else -1
                        )
                        out["kind"].append(kind)
                        out["geom_px"].append(blob_px)
                        out["attrs"].append(
                            {k: _attr_str(v) for k, v in f["attrs"].items()}
                        )
                        seq += 1
            yield pd.DataFrame(
                {"z": pd.Series(out["z"], dtype="int32"),
                 "x": pd.Series(out["x"], dtype="int32"),
                 "y": pd.Series(out["y"], dtype="int32"),
                 "layer": out["layer"], "seq": out["seq"],
                 "elem_id": out["elem_id"], "kind": out["kind"],
                 "geom_px": out["geom_px"], "attrs": out["attrs"]}
            )

    return blobs.mapInPandas(_dec, schema)


def read_tile_archive(spark, path: str):
    """Dispatch by extension: .mbtiles | .pmtiles → (z, x, y, tile_data)."""
    if path.endswith(".pmtiles"):
        return read_pmtiles(spark, path)
    if path.endswith(".mbtiles"):
        return read_mbtiles(spark, path)
    raise ValueError(f"unknown tile-archive format: {path}")


def compare_archives(spark, path_a: str, path_b: str):
    """CompareArchives parity: per-(z, layer) n_only_a / n_only_b /
    n_changed / n_same between two finished archives (either format —
    a build's mbtiles and pmtiles compare as identical)."""
    from ..tiling.diff import tile_diff

    a = decode_tiles(read_tile_archive(spark, path_a))
    b = decode_tiles(read_tile_archive(spark, path_b))
    return tile_diff(a, b)
