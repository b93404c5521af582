"""Scaling-efficiency evidence: same tile-build job at N and 4N cores.

The north rule's two-cluster-size criterion (throughput scaling efficiency
>= 0.8 between N and 4N executors) cannot use a real cluster in this
sandbox, so — as BASELINE.md documents — we run the identical job on the
identical input at local[8] and local[32] in separate JVMs (subprocesses)
and report throughput at both plus efficiency = (T8 / T32) / 4.

Writes BENCH_scaling.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))


def run_at(cores: int, corpus: str, out_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_SHUFFLE_PARTITIONS"] = str(max(cores, 16))
    t0 = time.time()
    subprocess.run(
        [
            sys.executable, "-m", "planetiler_openmaptiles_spark.pipeline",
            "--corpus", corpus, "--out", out_dir,
            "--checkpoints", os.path.join(out_dir, "ckpt"),
            "--master", f"local[{cores}]", "--max-zoom", "14",
        ],
        cwd=REPO, env=env, check=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    wall = time.time() - t0
    with open(os.path.join(out_dir, "build_report.json")) as f:
        report = json.load(f)
    report["subprocess_wall_s"] = round(wall, 2)
    report["cores"] = cores
    return report


def main():
    n_docs = int(os.environ.get("SCALE_BENCH_DOCS", "8000"))
    from planetiler_openmaptiles_spark.datagen import write_corpus

    corpus = write_corpus(os.path.join(REPO, ".gendata"), n_docs=n_docs, seed=42)
    results = {}
    for cores in (8, 32):
        with tempfile.TemporaryDirectory() as out:
            results[cores] = run_at(cores, corpus, out)
    t8 = results[8]["wall_s"]
    t32 = results[32]["wall_s"]
    eff = (t8 / t32) / 4.0
    out = {
        "metric": "scaling_efficiency_8_to_32_cores",
        "value": round(eff, 3),
        "unit": "ratio",
        "n_docs": n_docs,
        "local8": results[8],
        "local32": results[32],
        "tiles_per_sec_8": round(results[8]["tiles"] / t8, 2),
        "tiles_per_sec_32": round(results[32]["tiles"] / t32, 2),
        "note": "no real cluster in sandbox; same job, same input, two JVM sizes (BASELINE.md)",
    }
    with open(os.path.join(REPO, "BENCH_scaling.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
