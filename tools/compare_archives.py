"""Diff two finished tile archives (planetiler core `CompareArchives`).

Usage: python tools/compare_archives.py A.mbtiles B.pmtiles [--master local[8]]

Prints one JSON line per (z, layer) with n_only_a / n_only_b / n_changed /
n_same tile counts, plus a total summary line. Formats mix freely.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("archive_a")
    ap.add_argument("archive_b")
    ap.add_argument("--master", default="local[8]")
    args = ap.parse_args()

    from planetiler_openmaptiles_spark.session import get_spark
    from planetiler_openmaptiles_spark.sources.tile_archive import (
        compare_archives,
    )

    spark = get_spark(master=args.master)
    rows = compare_archives(spark, args.archive_a, args.archive_b).orderBy(
        "z", "layer"
    ).collect()
    tot = {"n_only_a": 0, "n_only_b": 0, "n_changed": 0, "n_same": 0}
    for r in rows:
        d = r.asDict()
        for k in tot:
            tot[k] += d[k]
        print(json.dumps(d))
    print(json.dumps({"z": "total", "layer": "*", **tot}))


if __name__ == "__main__":
    main()
