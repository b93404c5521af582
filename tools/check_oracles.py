"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at a scale factor dir and the
matching oracle_sql() in DuckDB over the same parquet tables, then compares
row count, column names, and a canonical value hash (columns sorted by
name, rows sorted, floats rounded to 9 significant digits to absorb
engine-formatting noise). Use before committing changes that touch query
code so CORRECTNESS_r{N}.json holds no surprises.

The hash is TYPE-SENSITIVE (VERDICT r3 ask #4): every cell is prefixed
with a python-type tag (i:/f:/b:/s:/x:), so an oracle returning float64
where Spark returns int64 (e.g. DuckDB HUGEINT window sums arriving in
pandas as float) fails HERE even when the values agree numerically — the
exact failure mode that made `geo_tag_stats` red on the r3 driver board
while the old string-canonicalizing replica stayed green. This gate is
deliberately STRICTER than any plausible driver canonicalizer: local
green ⇒ driver green.

Usage: python tools/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df) -> tuple[int, list, str]:
    import pandas as pd

    cols = sorted(df.columns)
    df = df[cols]

    import numpy as np

    def cell(v):
        if v is None:
            return "∅"
        if isinstance(v, (bool, np.bool_)):
            return f"b:{bool(v)}"
        if isinstance(v, (float, np.floating)):
            fv = float(v)
            return "∅" if math.isnan(fv) else f"f:{fv:.9g}"
        if isinstance(v, (int, np.integer)):
            return f"i:{int(v)}"
        if isinstance(v, (bytes, bytearray)):
            return f"x:{bytes(v).hex()}"
        return f"s:{v}"

    rows = sorted(
        "|".join(cell(v) for v in rec) for rec in df.itertuples(index=False, name=None)
    )
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return len(df), cols, h


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import duckdb

    import __spark_entry__ as e
    from planetiler_openmaptiles_spark.session import get_spark

    spark = get_spark("oracle-check")
    if hasattr(e, "_ensure_conf"):
        e._ensure_conf(spark)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs = e.queries()
    oracles = e.oracle_sql()
    report = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
            n_s, c_s, h_s = canon(sdf)
        except Exception as ex:
            report[name] = {"err": f"spark: {ex}"}
            print(f"{name}: SPARK ERROR {str(ex)[:200]}", flush=True)
            continue
        if name not in oracles:
            report[name] = {"spark_rows": n_s, "oracle": "none (rows-only)"}
            print(f"{name}: rows={n_s} (no oracle) [{time.time()-t0:.1f}s]", flush=True)
            continue
        try:
            odf = con.sql(oracles[name]).df()
            n_o, c_o, h_o = canon(odf)
        except Exception as ex:
            report[name] = {"err": f"duckdb: {ex}"}
            print(f"{name}: DUCKDB ERROR {str(ex)[:200]}", flush=True)
            continue
        ok = (n_s == n_o) and (c_s == c_o) and (h_s == h_o)
        report[name] = {
            "rows_match": n_s == n_o,
            "schema_match": c_s == c_o,
            "hash_match": h_s == h_o,
            "spark_rows": n_s,
            "oracle_rows": n_o,
        }
        flag = "OK " if ok else "FAIL"
        detail = "" if ok else f"  spark={n_s}/{c_s}/{h_s} oracle={n_o}/{c_o}/{h_o}"
        print(f"{name}: {flag} rows={n_s} [{time.time()-t0:.1f}s]{detail}", flush=True)
    bad = [k for k, v in report.items() if v.get("hash_match") is False or "err" in v]
    print(json.dumps({"n": len(report), "failing": bad}))


if __name__ == "__main__":
    main()
