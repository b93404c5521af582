"""P1 (mergeLineStrings) straggler profile at scale.

The line merge is order-sensitive per (tile, layer) group — planetiler's
FeatureMerge.mergeLineStrings nodes connected segments in feature order —
so the group CANNOT be salted: one hot tile is one Python task, and the
worst-case group wall is the finalize stage's floor no matter how many
executors exist. This tool measures that floor directly so future skew
regressions are visible (round-3 verdict ask #8): it builds (or resumes)
the tile_features checkpoint for an N-doc corpus, then re-runs ONLY the
per-tile pandas dispatch for the P1 layers (boundary, transportation,
transportation_name, waterway) with a per-group timer, and prints the
top-k (z, x, y, layer, rows, wall_ms) groups plus distribution stats.

Usage:
  python -m tools.profile_p1_stragglers --docs 1024000 [--top 20]
  (reuses .gendata corpora and a persistent checkpoint under .p1ckpt/)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

P1_LAYERS = ("boundary", "transportation", "transportation_name", "waterway")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1024000)
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # skew rehearsal (round-4 verdict ask): raise --hot-frac and shrink
    # --hot-r-scale for a denser megacity (density ~ hot_frac/r_scale^2;
    # 0.875 / 0.5 ~= 10x the default 0.35 / 1.0)
    ap.add_argument("--hot-frac", type=float, default=0.35)
    ap.add_argument("--hot-r-scale", type=float, default=1.0)
    args = ap.parse_args()

    from planetiler_openmaptiles_spark.datagen import write_corpus
    from planetiler_openmaptiles_spark.layers import Config
    from planetiler_openmaptiles_spark.pipeline import build_tiles
    from planetiler_openmaptiles_spark.session import get_spark

    spark = get_spark("p1-stragglers", master=f"local[{args.cpus}]",
                      shuffle_partitions=max(int(args.cpus), 16))
    corpus = write_corpus(os.path.join(REPO, ".gendata"), n_docs=args.docs,
                          seed=42, hot_frac=args.hot_frac,
                          hot_r_scale=args.hot_r_scale)
    ckpt = os.path.join(REPO, ".p1ckpt", os.path.basename(corpus))
    os.makedirs(ckpt, exist_ok=True)
    # build through the checkpointed stages once; resume is free afterwards
    tiles = build_tiles(spark, corpus, Config(max_zoom=14),
                        checkpoint_dir=ckpt)
    del tiles  # only the tile_features checkpoint parquet is needed

    feats = spark.read.parquet(os.path.join(ckpt, "tile_features", "data"))
    p1 = feats.filter(feats.layer.isin(list(P1_LAYERS)))

    import pandas as pd

    from planetiler_openmaptiles_spark.tiling import postprocess as pp

    # capture by VALUE: a module-attribute reference would re-import an
    # EMPTY registry in the Python workers (layer modules register their
    # post-processors at driver import time; cloudpickle only ships dict
    # contents when the dict itself is a captured closure variable)
    registry = dict(pp.POST_PROCESSORS)
    assert all(l in registry for l in P1_LAYERS), sorted(registry)

    def timed_dispatch(key, pdf: pd.DataFrame) -> pd.DataFrame:
        z, x, y, layer = int(key[0]), int(key[1]), int(key[2]), key[3]
        pdf = pdf.sort_values(["sort_key", "elem_id"], kind="mergesort")
        t0 = time.perf_counter()
        fn = registry.get(layer)
        out = fn(z, pdf) if fn is not None else pdf
        wall_ms = (time.perf_counter() - t0) * 1000.0
        return pd.DataFrame(
            [(z, x, y, layer, len(pdf), len(out), round(wall_ms, 3))],
            columns=["z", "x", "y", "layer", "rows_in", "rows_out", "wall_ms"],
        )

    schema = ("z int, x int, y int, layer string, rows_in long,"
              " rows_out long, wall_ms double")
    prof = (
        p1.groupBy("z", "x", "y", "layer")
        .applyInPandas(timed_dispatch, schema)
        .toPandas()
    )
    prof = prof.sort_values("wall_ms", ascending=False).reset_index(drop=True)
    total_ms = float(prof["wall_ms"].sum())
    out = {
        "metric": "p1_line_merge_straggler_profile",
        "n_docs": args.docs,
        "n_groups": int(len(prof)),
        "kernel_total_ms": round(total_ms, 1),
        "max_group_wall_ms": round(float(prof["wall_ms"].max()), 3),
        "p99_group_wall_ms": round(float(prof["wall_ms"].quantile(0.99)), 3),
        "p50_group_wall_ms": round(float(prof["wall_ms"].quantile(0.50)), 3),
        "top": [
            {k: (v.item() if hasattr(v, "item") else v) for k, v in rec.items()}
            for rec in prof.head(args.top).to_dict("records")
        ],
    }
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
