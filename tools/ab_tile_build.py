"""Fixed-commit A/B probe for the tile-build wall.

The driver-recorded tile_build_z0_14 moved 23.2 s (r3) -> 33.0 s (r4) ->
27.9/34.7 s (r5 windows) while per-query entries held steady — the r4/r5
verdict asked for a bisection instead of more window attribution. This
probe runs ONLY the timed tile build (2 cold builds, min-of-2, identical
corpus/config to bench.py) against an arbitrary checkout, so two commits
can be interleaved A/B/A/B in one host window:

  git worktree add /tmp/ab_old <old-commit>
  for R in /tmp/ab_old /root/repo /tmp/ab_old /root/repo; do
      python tools/ab_tile_build.py $R; done

Round-5 result (r3 a5c19ab vs r5 HEAD, one window, interleaved):
  r3  : walls [62.7, 27.7] then [41.8, 24.9]   min 24.9
  HEAD: walls [50.7, 24.7] then [46.2, 27.4]   min 24.7
identical 88,432 tile features — the render path is code-neutral across
r3->r5; the slow driver records are host-window effects (first-build JIT
inflation is why bench.py reports min-of-N).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def main():
    repo = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from planetiler_openmaptiles_spark.layers import Config
    from planetiler_openmaptiles_spark.pipeline import build_tiles
    from planetiler_openmaptiles_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("ab", master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus), 16))
    corpus = os.path.join("/root/repo/.gendata", "n40000_s42_v3")
    walls, n = [], 0
    for _ in range(2):
        ckpt = tempfile.mkdtemp(prefix="ab_ckpt_")
        t0 = time.time()
        tiles = build_tiles(spark, corpus, Config(max_zoom=14),
                            checkpoint_dir=ckpt)
        n = tiles.count()
        walls.append(round(time.time() - t0, 2))
    print(json.dumps({"repo": repo, "walls": walls, "feats": n}))


if __name__ == "__main__":
    main()
