"""Host scaling-ceiling microbenchmarks (evidence for BENCH_scaling.json).

The north rule's N-vs-4N efficiency criterion has to be evidenced on one
machine (local[8] vs local[32]) because the sandbox has no real cluster.
One machine means ONE memory bus shared by all 32 cores — so before
judging the engine's scaling, measure what this host allows:

  * cache kernel   — pure compute on a cache-resident array. Anything
    below 4x speedup here would mean the cores themselves don't scale.
  * bandwidth kernel — a single streaming multiply-add over a 64 MB
    array: the lower bound of what any data engine does to every byte.
    Its 8→32-process inflation is the host's hard ceiling for
    memory-touching work (measured ~2.6x => efficiency ceiling ~0.39).
  * render kernel  — THIS ENGINE's fused tile-render kernel on real
    checkpoint data: the code we actually ship. Pass a layer-checkpoint
    glob to include it.

On a real cluster, N and 4N EXECUTORS each bring their own memory bus,
so the bandwidth ceiling does not apply — the render-kernel number is
the one that predicts multi-node scaling of the Python data plane.

Usage: python tools/membench.py [layer_ckpt_glob]
Prints one JSON line {cache_inflation_8_32, bandwidth_inflation_8_32,
render_kernel_inflation_8_32, ...}.
"""

from __future__ import annotations

import glob
import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cache_kernel(q):
    a = np.random.rand(2000)  # 16 KB — L1/L2 resident
    t0 = time.time()
    s = 0.0
    for _ in range(60000):
        s += float((a * 1.0001 + 0.5).sum())
    q.put(time.time() - t0)


def _bw_kernel(q):
    a = np.random.rand(8_000_000)  # 64 MB — streams through DRAM
    t0 = time.time()
    s = 0.0
    for _ in range(40):
        b = a * 1.0001 + 0.5
        s += float(b[0])
    q.put(time.time() - t0)


def _render_kernel(q, ckpt_glob):
    import pyarrow as pa
    import pyarrow.parquet as pq

    sys.path.insert(0, REPO)
    import planetiler_openmaptiles_spark.tiling.explode as ex

    files = sorted(glob.glob(ckpt_glob))
    tabs, rows = [], 0
    for f in files[:: max(1, len(files) // 32)]:
        t = pq.read_table(f)
        tabs.append(t)
        rows += len(t)
        if rows >= 25000:
            break
    pdf = pa.concat_tables(tabs, promote_options="permissive").to_pandas()
    cols = [
        "doc_id", "elem_id", "layer", "form", "geom_wkt", "attrs", "zattrs",
        "minzoom", "maxzoom", "buffer_px", "buffer_overrides",
        "min_pixel_size", "mps_overrides", "sort_key", "grid",
    ]
    pdf = pdf[cols]
    captured = {}

    class FakeDF:
        def select(self, *c):
            return self

        def mapInPandas(self, run, schema):
            captured["run"] = run
            return None

    ex.render_tiles_fused(FakeDF(), 14)
    t0 = time.time()
    list(captured["run"](iter([pdf])))
    q.put(time.time() - t0)


def _run(kern, n, *args):
    q = mp.Queue()
    ps = [mp.Process(target=kern, args=(q, *args)) for _ in range(n)]
    for p in ps:
        p.start()
    ts = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(ts) / len(ts)


def main():
    if "--curve" in sys.argv:
        # bandwidth ceiling vs concurrency: per-proc seconds for the same
        # per-proc work at 2..32 concurrent processes. Flat = bus has
        # headroom; rising = bus saturated. Supports choosing panel sizes
        # for the multi-JVM executor-scaling measurement (a 1x2c vs 4x2c
        # panel is only a clean executor-scaling signal if the bus is
        # unsaturated at 8 concurrent streams).
        curve = {n: round(_run(_bw_kernel, n), 2) for n in (2, 4, 8, 16, 32)}
        base = curve[2]
        print(json.dumps({
            "bandwidth_per_proc_s_by_nproc": curve,
            "inflation_vs_2p": {n: round(t / base, 2) for n, t in curve.items()},
        }))
        return
    out = {}
    for name, kern in (("cache", _cache_kernel), ("bandwidth", _bw_kernel)):
        t8, t32 = _run(kern, 8), _run(kern, 32)
        out[f"{name}_per_proc_s_8p"] = round(t8, 2)
        out[f"{name}_per_proc_s_32p"] = round(t32, 2)
        out[f"{name}_inflation_8_32"] = round(t32 / t8, 2)
    if len(sys.argv) > 1:
        g = sys.argv[1]
        t8, t32 = _run(_render_kernel, 8, g), _run(_render_kernel, 32, g)
        out["render_kernel_per_proc_s_8p"] = round(t8, 2)
        out["render_kernel_per_proc_s_32p"] = round(t32, 2)
        out["render_kernel_inflation_8_32"] = round(t32 / t8, 2)
        out["render_kernel_scaling_efficiency"] = round(t8 / t32, 2)
    out["note"] = (
        "per-process time for the same per-process work at 8 vs 32"
        " concurrent processes; inflation=1.0 means perfect 4x scaling."
        " 'bandwidth' is the host DRAM ceiling (one memory bus shared by"
        " all local[N] threads — does not exist between cluster nodes);"
        " 'render_kernel' is this engine's own data-plane code."
    )
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
