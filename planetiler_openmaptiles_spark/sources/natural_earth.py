"""Natural Earth sqlite source connector (block-parallel over rowid ranges).

The reference pulls ``natural_earth_vector.sqlite`` and streams every
``ne_*`` table through the profile (OpenMapTilesMain.java:48-53). This
module reads the same container natively on Spark executors:

- the DRIVER opens the file once to list ``ne_*`` tables, find each table's
  geometry column (first BLOB column, preferring GEOMETRY-ish names) and
  max rowid — a handful of single-row probes;
- each EXECUTOR task opens the sqlite file read-only/immutable and SELECTs
  its own contiguous rowid slice, decoding geometry blobs (WKB, GeoPackage
  or SpatiaLite framing — geom/wkb.py) into lon/lat WKT.

sqlite files are single-file B-trees, so concurrent read-only connections
scale across tasks exactly like seeking into a .shp: the OS page cache is
the shared medium, no server involved. NE is a dimension source (~800 MB,
vs the 100 TB document corpus), so tens of parallel tasks saturate it.

A deterministic writer synthesizes real on-disk fixtures for tests and
the DuckDB arithmetic-replay oracle (same pattern as write_osm_pbf /
write_shapefile).
"""

from __future__ import annotations

import os
import sqlite3

_GEOM_NAMES = ("geometry", "geom", "wkb_geometry", "the_geom")


def write_natural_earth_sqlite(path: str, tables: dict, blob_format: str = "spatialite",
                               srid: int = 4326) -> str:
    """tables = {name: [(attrs dict, wkt lon/lat)]} → sqlite file whose
    geometry column carries `blob_format` blobs ('spatialite' | 'gpkg' |
    'wkb'). Attr columns are TEXT, plus ogc_fid INTEGER PRIMARY KEY."""
    from ..geom import wkb as wkbm
    from ..geom.wkt import parse_wkt

    enc = {"spatialite": wkbm.encode_spatialite,
           "gpkg": wkbm.encode_gpkg,
           "wkb": lambda g, _srid=None: wkbm.encode_wkb(g)}[blob_format]
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    try:
        for name, rows in tables.items():
            keys = sorted({k for attrs, _ in rows for k in attrs})
            cols = ", ".join(f'"{k}" TEXT' for k in keys)
            con.execute(
                f'CREATE TABLE "{name}" (ogc_fid INTEGER PRIMARY KEY'
                + (", " + cols if cols else "") + ", GEOMETRY BLOB)")
            for i, (attrs, wkt) in enumerate(rows):
                g = parse_wkt(wkt)
                blob = enc(g, srid) if g is not None else None
                con.execute(
                    f'INSERT INTO "{name}" VALUES ({",".join("?" * (len(keys) + 2))})',
                    [i + 1] + [attrs.get(k) for k in keys] + [blob])
        con.commit()
    finally:
        con.close()
    return path


def _connect_ro(path: str) -> sqlite3.Connection:
    return sqlite3.connect(f"file:{os.path.abspath(path)}?mode=ro&immutable=1", uri=True)


def scan_ne_tables(path: str) -> list[dict]:
    """Driver-side catalog probe: every ne_* table with its geometry column,
    attr columns and max rowid (split bounds)."""
    con = _connect_ro(path)
    try:
        names = [r[0] for r in con.execute(
            "SELECT name FROM sqlite_master WHERE type='table' AND name LIKE 'ne_%' ORDER BY name")]
        out = []
        for name in names:
            cols = [(r[1], (r[2] or "").upper()) for r in con.execute(f'PRAGMA table_info("{name}")')]
            geom_col = None
            for cname, ctype in cols:
                if cname.lower() in _GEOM_NAMES:
                    geom_col = cname
                    break
            if geom_col is None:
                for cname, ctype in cols:
                    if "BLOB" in ctype or "GEOM" in ctype:
                        geom_col = cname
                        break
            if geom_col is None:
                continue
            attr_cols = [c for c, _ in cols if c != geom_col and c.lower() != "ogc_fid"]
            hi = con.execute(f'SELECT coalesce(max(rowid), 0) FROM "{name}"').fetchone()[0]
            out.append({"table": name, "geom_col": geom_col,
                        "attr_cols": attr_cols, "max_rowid": int(hi)})
        return out
    finally:
        con.close()


def read_natural_earth_sqlite(spark, path: str, rows_per_split: int = 2000,
                              catalog: list[dict] | None = None):
    """NE sqlite → DataFrame(table string, elem_id long, tags
    map<string,string>, geom_wkt string), geometry in lon/lat WKT.
    `catalog` skips the driver-side table probe when the caller already
    ran scan_ne_tables (natural_earth_to_documents does)."""
    import pandas as pd

    from ..geom.wkb import decode_geometry_blob
    from ..geom.wkt import to_wkt
    from .archive import materialize

    path = os.path.abspath(materialize(path, suffix=".sqlite"))
    cat = catalog if catalog is not None else scan_ne_tables(path)
    schema = "table string, elem_id long, tags map<string,string>, geom_wkt string"
    splits = []
    meta = {t["table"]: t for t in cat}
    for t in cat:
        for lo in range(0, t["max_rowid"], rows_per_split):
            splits.append((t["table"], lo, min(lo + rows_per_split, t["max_rowid"])))
    if not splits:
        return spark.createDataFrame([], schema)
    idx_df = spark.createDataFrame(splits, "tname string, lo long, hi long") \
        .repartition(min(len(splits), spark.sparkContext.defaultParallelism))

    def _decode(batches):
        con = _connect_ro(path)
        try:
            for pdf in batches:
                for tname, lo, hi in zip(pdf["tname"], pdf["lo"], pdf["hi"]):
                    m = meta[tname]
                    acols = "".join(f', "{c}"' for c in m["attr_cols"])
                    cur = con.execute(
                        f'SELECT rowid, "{m["geom_col"]}"{acols} FROM "{tname}"'
                        " WHERE rowid > ? AND rowid <= ?", (int(lo), int(hi)))
                    ids, tags, wkts = [], [], []
                    for row in cur:
                        g = decode_geometry_blob(row[1]) if row[1] is not None else None
                        if g is None:
                            continue
                        ids.append(int(row[0]))
                        tags.append({c: str(v) for c, v in zip(m["attr_cols"], row[2:])
                                     if v is not None and str(v) != ""})
                        wkts.append(to_wkt(g))
                    yield pd.DataFrame({
                        "table": [str(tname)] * len(ids), "elem_id": ids,
                        "tags": tags, "geom_wkt": wkts})
        finally:
            con.close()

    return idx_df.mapInPandas(_decode, schema)


def natural_earth_to_documents(spark, path: str):
    """NE sqlite → canonical documents rows: source='natural_earth',
    source_layer=<table> (FIXTURES.md §1; the ctx.natural_earth dispatch
    consumes exactly this shape). rowids restart per table, but layer joins
    treat NE elem_id as a global ne_id (layers/water.py:120), so each table
    gets a 10^8 offset from its catalog position — stable because the
    catalog is name-sorted."""
    from pyspark.sql import functions as F

    from ..spans import reencode_spans

    from .archive import materialize

    path = materialize(path, suffix=".sqlite")
    cat = scan_ne_tables(path)  # one probe, shared with the reader
    df = read_natural_earth_sqlite(spark, path, catalog=cat)
    bases = {t["table"]: (i + 1) * 100_000_000
             for i, t in enumerate(cat)}
    base_map = F.create_map(
        *[F.lit(v) for kv in bases.items() for v in kv]).cast("map<string,long>")
    feat = df.select(
        (F.col("elem_id") + F.element_at(base_map, F.col("table"))).alias("elem_id"),
        F.lit("natural_earth").alias("source"),
        F.col("table").alias("source_layer"),
        F.col("tags"),
        "geom_wkt",
        F.array().cast(
            "array<struct<rel_id:long,role:string,rel_tags:map<string,string>>>"
        ).alias("rels"),
        F.array().cast("array<string>").alias("media_refs"),
    )
    return feat.select(
        F.concat_ws("/", F.lit("natural_earth"), F.col("source_layer"),
                    F.col("elem_id").cast("string")).alias("doc_id"),
        reencode_spans().alias("spans"),
    )
