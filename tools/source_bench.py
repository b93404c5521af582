"""Source-connector throughput bench.

Generates large deterministic fixtures once (cached under .gendata/) and
times each block-parallel reader end-to-end (read → count of decoded
rows) at two parallelism widths, reporting rows/s, MB/s and the width
scaling ratio. This is the I/O-path analog of scale_bench.py: the corpus
readers must not serialize on the driver at planet scale.

    python -m tools.source_bench [--rows 300000] [--cpus 8,32]

Prints one JSON line per connector plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
GEN = os.path.join(REPO, ".gendata")


def _shp_fixture(rows: int) -> str:
    from planetiler_openmaptiles_spark.sources.shapefile import write_shapefile

    base = os.path.join(GEN, f"srcbench_shp_{rows}_v1")
    if os.path.exists(base + ".shp"):
        return base + ".shp"
    os.makedirs(GEN, exist_ok=True)
    recs = []
    for i in range(rows):
        x = (i % 2000) * 0.015625 - 15.0
        y = (i // 2000) * 0.015625 - 10.0
        recs.append(({"name": f"w{i}", "cls": f"c{i % 9}"},
                     f"POLYGON (({x} {y}, {x + 0.0078125} {y}, "
                     f"{x + 0.0078125} {y + 0.0078125}, {x} {y + 0.0078125}, {x} {y}))"))
    write_shapefile(base + "_tmp", recs, epsg=3857)
    for ext in (".dbf", ".prj", ".shx", ".shp"):
        os.replace(base + "_tmp" + ext, base + ext)
    return base + ".shp"


def _geojson_fixture(rows: int) -> str:
    path = os.path.join(GEN, f"srcbench_gj_{rows}_v1.geojsonl")
    if os.path.exists(path):
        return path
    os.makedirs(GEN, exist_ok=True)
    import json as _json

    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for i in range(rows):
            x = (i % 2000) * 0.015625 - 15.0
            y = (i // 2000) * 0.015625 - 10.0
            f.write(_json.dumps({
                "type": "Feature", "id": i + 1,
                "geometry": {"type": "LineString",
                             "coordinates": [[x, y], [x + 0.01, y + 0.01],
                                             [x + 0.02, y]]},
                "properties": {"name": f"g{i}", "k": str(i % 7)},
            }, separators=(",", ":")) + "\n")
    os.replace(tmp, path)
    return path


def _ne_fixture(rows: int) -> str:
    from planetiler_openmaptiles_spark.sources.natural_earth import (
        write_natural_earth_sqlite,
    )

    path = os.path.join(GEN, f"srcbench_ne_{rows}_v1.sqlite")
    if os.path.exists(path):
        return path
    os.makedirs(GEN, exist_ok=True)
    rows_list = []
    for i in range(rows):
        x = (i % 2000) * 0.015625 - 15.0
        y = (i // 2000) * 0.015625 - 10.0
        rows_list.append(({"name": f"n{i}", "scalerank": str(i % 10)},
                          f"POLYGON (({x} {y}, {x + 0.0078125} {y}, "
                          f"{x + 0.0078125} {y + 0.0078125}, {x} {y + 0.0078125}, {x} {y}))"))
    tmp = path + ".tmp"
    write_natural_earth_sqlite(tmp, {"ne_10m_bench": rows_list})
    os.replace(tmp, path)
    return path


def _pbf_fixture(rows: int) -> str:
    from planetiler_openmaptiles_spark.sources.osm_pbf import write_osm_pbf

    path = os.path.join(GEN, f"srcbench_pbf_{rows}_v1.osm.pbf")
    if os.path.exists(path):
        return path
    os.makedirs(GEN, exist_ok=True)
    nodes = [(i + 1,
              ((i // 2000) * 0.015625 - 10.0),
              ((i % 2000) * 0.015625 - 15.0),
              ([("natural", "peak"), ("name", f"p{i}")] if i % 5 == 0 else []))
             for i in range(rows)]
    tmp = path + ".tmp"
    write_osm_pbf(tmp, nodes, [], [], block_size=8000)
    os.replace(tmp, path)
    return path


def _archive_fixtures(rows: int) -> tuple[str, str]:
    """mbtiles (compact schema) + pmtiles with `rows` addressed tiles at
    z=14, reusing 1024 distinct MVT blobs (ocean-tile-style duplication:
    storage dedups, the reader still decodes per addressed tile)."""
    import gzip
    import sqlite3

    import numpy as np

    from planetiler_openmaptiles_spark.tiling import mvt
    from planetiler_openmaptiles_spark.tiling import pmtiles as pmt

    mb = os.path.join(GEN, f"srcbench_arc_{rows}_v1.mbtiles")
    pm = os.path.join(GEN, f"srcbench_arc_{rows}_v1.pmtiles")
    if os.path.exists(mb) and os.path.exists(pm):
        return mb, pm
    os.makedirs(GEN, exist_ok=True)
    blobs = []
    for b in range(1024):
        a = 16.0 + (b % 32) * 0.5
        ring = np.array([[a, a], [a + 50.0, a], [a + 50.0, a + 50.0],
                         [a, a + 50.0], [a, a]])
        blobs.append(mvt.gzip_tile(mvt.encode_tile({"water": [
            (b, "polygon", ("Polygon", [ring]),
             {"class": "ocean", "b": str(b)})]})))
    keys = sorted(
        (pmt.zxy_to_tile_id(14, i % 4096, (i // 4096) % 4096), i)
        for i in range(rows)
    )
    tmp = mb + ".tmp"
    if os.path.exists(tmp):
        os.remove(tmp)
    from planetiler_openmaptiles_spark.sources.tile_archive import (
        create_compact_schema,
    )

    con = sqlite3.connect(tmp)
    con.execute("CREATE TABLE metadata (name text, value text)")
    create_compact_schema(con)
    con.executemany("INSERT INTO tiles_data VALUES (?, ?)",
                    list(enumerate(blobs)))
    con.executemany(
        "INSERT INTO tiles_shallow VALUES (?, ?, ?, ?)",
        [(14, i % 4096, (1 << 14) - 1 - ((i // 4096) % 4096), i % 1024)
         for _, i in keys],
    )
    con.commit()
    con.close()
    os.replace(tmp, mb)
    w = pmt.PmtilesWriter(pm + ".tmp", {"name": "srcbench"})
    for tid, i in keys:
        w.add_tile(tid, blobs[i % 1024], compressed=True)
    w.finish()
    os.replace(pm + ".tmp", pm)
    return mb, pm


def _time_read(make_df, n_repeat: int = 2) -> tuple[float, int]:
    best, n = float("inf"), 0
    for _ in range(n_repeat):
        t0 = time.time()
        n = make_df().count()
        best = min(best, time.time() - t0)
    return best, n


def _decode_archive(spark, path: str, cpus: int):
    from planetiler_openmaptiles_spark.sources.tile_archive import (
        decode_tiles, read_mbtiles, read_pmtiles,
    )

    if path.endswith(".mbtiles"):
        return decode_tiles(read_mbtiles(spark, path, n_splits=cpus * 2))
    return decode_tiles(read_pmtiles(spark, path))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=300_000)
    ap.add_argument("--cpus", default="8,32")
    args = ap.parse_args()
    widths = [int(c) for c in args.cpus.split(",")]

    shp = _shp_fixture(args.rows)
    gj = _geojson_fixture(args.rows)
    ne = _ne_fixture(max(50_000, args.rows // 3))  # dimension-scale source
    pbf = _pbf_fixture(args.rows * 2)
    mb, pm = _archive_fixtures(args.rows)

    from planetiler_openmaptiles_spark.session import get_spark

    sizes = {
        "shapefile": sum(os.path.getsize(os.path.splitext(shp)[0] + e)
                         for e in (".shp", ".dbf", ".shx")),
        "geojsonl": os.path.getsize(gj),
        "ne_sqlite": os.path.getsize(ne),
        "osm_pbf": os.path.getsize(pbf),
        "mbtiles": os.path.getsize(mb),
        "pmtiles": os.path.getsize(pm),
    }
    results: dict[str, dict] = {k: {} for k in sizes}
    for cpus in widths:
        spark = get_spark(f"srcbench{cpus}", master=f"local[{cpus}]",
                          shuffle_partitions=max(cpus, 16))

        from planetiler_openmaptiles_spark.sources.geojson import read_geojson
        from planetiler_openmaptiles_spark.sources.natural_earth import (
            read_natural_earth_sqlite,
        )
        from planetiler_openmaptiles_spark.sources.osm_pbf import (
            read_osm_entities, release_caches,
        )
        from planetiler_openmaptiles_spark.sources.shapefile import read_shapefile

        for name, make in [
            ("shapefile", lambda: read_shapefile(spark, shp, partitions=cpus * 2)),
            ("geojsonl", lambda: read_geojson(spark, gj, partitions=cpus * 2)),
            ("ne_sqlite", lambda: read_natural_earth_sqlite(
                spark, ne, rows_per_split=4000)),
            ("osm_pbf", lambda: read_osm_entities(spark, pbf)),
            ("mbtiles", lambda: _decode_archive(spark, mb, cpus)),
            ("pmtiles", lambda: _decode_archive(spark, pm, cpus)),
        ]:
            wall, n = _time_read(make)
            release_caches()
            results[name][cpus] = {
                "wall_s": round(wall, 3), "rows": n,
                "rows_per_s": round(n / wall),
                "mb_per_s": round(sizes[name] / 1e6 / wall, 1),
            }
            print(json.dumps({"connector": name, "cpus": cpus,
                              **results[name][cpus]}), flush=True)
        spark.stop()

    if len(widths) == 2:
        lo, hi = widths
        summary = {
            name: round((r[lo]["wall_s"] / r[hi]["wall_s"]) / (hi / lo), 3)
            for name, r in results.items()
        }
        print(json.dumps({"metric": "connector_scaling_efficiency",
                          "widths": widths, "efficiency": summary,
                          "file_mb": {k: round(v / 1e6, 1)
                                      for k, v in sizes.items()}}), flush=True)


if __name__ == "__main__":
    main()
