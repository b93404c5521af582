"""Multi-JVM scaling evidence: Spark STANDALONE cluster on this host.

The north rule's two-cluster-size criterion wants throughput scaling
efficiency >= 0.8 between N and 4N EXECUTORS. local[8] vs local[32]
(scale_bench.py) conflates executor scaling with this host's shared DRAM
bus and a single JVM's GC; this tool stands up a real standalone cluster —
one master + four 8-core worker daemons, each executor its OWN JVM with its
own heap and shuffle server — and runs the identical resumed tile phase at
spark.cores.max=8 (1 executor) and =32 (4 executors), submitted via
`--master spark://...` + a --py-files zip exactly like a production
spark-submit.

What this isolates vs local mode: separate executor JVMs (independent GC,
independent Python worker pools, real netty shuffle between processes)
— everything EXCEPT the shared memory bus, which on a real cluster is
per-node and which tools/membench.py measures separately as the host
ceiling.

Usage:
  python -m tools.cluster_bench            # full: 1,024,000 docs
  SCALE_BENCH_DOCS=64000 python -m tools.cluster_bench   # smoke

Writes BENCH_scaling_multijvm.json.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import signal
import socket
import subprocess
import sys
import tempfile
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MASTER_URL = "spark://127.0.0.1:7077"


def _pyspark_jars() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "jars")


def _wait_port(port: int, timeout: float = 40.0) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout:
        with socket.socket() as s:
            s.settimeout(1.0)
            try:
                s.connect(("127.0.0.1", port))
                return
            except OSError:
                time.sleep(0.5)
    raise TimeoutError(f"port {port} never opened")


def _java(args: list[str], log: str, extra_env: dict | None = None) -> subprocess.Popen:
    java = os.path.join(os.environ.get("JAVA_HOME", "/usr"), "bin", "java")
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    # worker daemons build the executor JVM classpath from $SPARK_HOME/jars
    # (AbstractCommandBuilder) — point it at the pip-installed pyspark dir
    import pyspark

    env["SPARK_HOME"] = os.path.dirname(pyspark.__file__)
    # normally exported by bin/load-spark-env.sh; without it the executor
    # command builder falls back to probing source-build directories
    env["SPARK_SCALA_VERSION"] = "2.13"
    env.update(extra_env or {})
    cp = os.path.join(_pyspark_jars(), "*")
    return subprocess.Popen(
        [java, "-cp", cp, "-Xmx1g"] + args,
        stdout=open(log, "w"), stderr=subprocess.STDOUT, env=env,
    )


def start_cluster(work: str, n_workers: int = 4, cores_per_worker: int = 8,
                  worker_mem: str = "20g") -> list[subprocess.Popen]:
    procs = []
    os.makedirs(work, exist_ok=True)
    procs.append(_java(
        [
            # fill workers one-by-one so cores.max=8 lands on ONE worker
            # (1 executor) and 32 on four — the N vs 4N executor contrast
            "-Dspark.deploy.spreadOut=false",
            "-Dspark.master.rest.enabled=false",
            "org.apache.spark.deploy.master.Master",
            "--host", "127.0.0.1", "--port", "7077", "--webui-port", "8089",
        ],
        os.path.join(work, "master.log"),
    ))
    _wait_port(7077)
    for i in range(n_workers):
        wdir = os.path.join(work, f"worker{i}")
        os.makedirs(wdir, exist_ok=True)
        procs.append(_java(
            [
                "org.apache.spark.deploy.worker.Worker",
                MASTER_URL,
                "--host", "127.0.0.1", "--port", str(35000 + i),
                "--webui-port", str(8090 + i),
                "--cores", str(cores_per_worker), "--memory", worker_mem,
                "--work-dir", wdir,
            ],
            os.path.join(work, f"worker{i}.log"),
        ))
    # wait for all workers to register
    t0 = time.time()
    while time.time() - t0 < 60:
        try:
            with open(os.path.join(work, "master.log")) as f:
                if f.read().count("Registering worker") >= n_workers:
                    return procs
        except FileNotFoundError:
            pass
        time.sleep(1)
    raise TimeoutError("workers never registered (see master.log)")


def stop_cluster(procs: list[subprocess.Popen]) -> None:
    for p in reversed(procs):
        try:
            p.send_signal(signal.SIGTERM)
        except OSError:
            pass
    for p in procs:
        try:
            p.wait(timeout=15)
        except subprocess.TimeoutExpired:
            p.kill()


def build_zip(work: str) -> str:
    zpath = os.path.join(work, "planetiler_openmaptiles_spark.zip")
    pkg = os.path.join(REPO, "planetiler_openmaptiles_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in glob.glob(os.path.join(pkg, "**", "*.py"), recursive=True):
            zf.write(py, os.path.relpath(py, REPO))
    return zpath


def _cpu_stat():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    return sum(vals), vals[7] if len(vals) > 7 else 0


def run_pipeline(cores_max: int, corpus: str, out_dir: str, ckpt: str,
                 zpath: str, exec_cores: int = 8,
                 shuffle_parts: int = 192, mbtiles: bool = False) -> dict:
    env = dict(os.environ)
    env["SPARK_MASTER"] = MASTER_URL
    # partitions sized for the wide legs (≥3 waves at 32 cores) and held
    # IDENTICAL across both legs so the task decomposition — and therefore
    # per-task cache/GC footprint — is the same; 64 was measured to starve
    # 32 cores (2-wave straggler exposure) and fatten cached partitions
    # past the point where the fill stage blew up 5x (see BASELINE.md)
    env["SPARK_SHUFFLE_PARTITIONS"] = str(shuffle_parts)
    env["PYSPARK_PYTHON"] = sys.executable
    env["SPARK_EXTRA_CONF_JSON"] = json.dumps({
        "spark.cores.max": str(cores_max),
        "spark.executor.cores": str(exec_cores),
        "spark.executor.memory": "16g",
        "spark.submit.pyFiles": zpath,
        "spark.driver.host": "127.0.0.1",
        "spark.driver.bindAddress": "127.0.0.1",
    })
    t0 = time.time()
    tot0, st0 = _cpu_stat()
    cmd = [
        sys.executable, "-m", "planetiler_openmaptiles_spark.pipeline",
        "--corpus", corpus, "--out", out_dir,
        "--checkpoints", ckpt, "--max-zoom", "14",
    ]
    if mbtiles:
        # include the served-artifact build (executor-side shard merge) in
        # the measured e2e wall; phase_walls.mbtiles_sink_s decomposes it
        cmd += ["--mbtiles", os.path.join(out_dir, "tiles.mbtiles")]
    subprocess.run(
        cmd, cwd=REPO, env=env, check=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    tot1, st1 = _cpu_stat()
    with open(os.path.join(out_dir, "build_report.json")) as f:
        report = json.load(f)
    report["subprocess_wall_s"] = round(time.time() - t0, 2)
    report["executors"] = cores_max // exec_cores
    report["cores"] = cores_max
    report["cpu_steal_pct"] = round(100.0 * (st1 - st0) / max(tot1 - tot0, 1), 2)
    return report


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int,
                    default=int(os.environ.get("SCALE_BENCH_DOCS", "1024000")))
    ap.add_argument("--phases", default="e2e,tile",
                    help="comma subset of e2e,tile")
    ap.add_argument("--exec-cores", type=int, default=8)
    ap.add_argument("--configs", default="32,8",
                    help="spark.cores.max legs, widest first (warms page cache)")
    ap.add_argument("--shuffle-partitions", type=int, default=192)
    ap.add_argument("--warm-ckpt", default="",
                    help="reuse an existing per-layer checkpoint for tile legs")
    ap.add_argument("--mbtiles", action="store_true",
                    help="include the mbtiles archive build in every leg"
                         " (sink wall reported in phase_walls)")
    ap.add_argument("--out-json",
                    default=os.path.join(REPO, "BENCH_scaling_multijvm.json"))
    args = ap.parse_args()
    phases = set(args.phases.split(","))
    legs = [int(c) for c in args.configs.split(",")]
    hi, lo = max(legs), min(legs)
    from planetiler_openmaptiles_spark.datagen import write_corpus

    corpus = write_corpus(os.path.join(REPO, ".gendata"), n_docs=args.docs,
                          seed=42)
    work = tempfile.mkdtemp(prefix="omt_cluster_")
    procs = start_cluster(os.path.join(work, "daemons"))
    try:
        zpath = build_zip(work)
        total, tile_phase = {}, {}
        warm_ckpt = args.warm_ckpt or os.path.join(work, "warm_ckpt")
        if "e2e" in phases:
            # e2e runs at 4N first (warms OS page cache for both) then N
            for cores in legs:
                out = os.path.join(work, f"total_{cores}")
                ckpt = os.path.join(work, f"ckpt_{cores}")
                total[cores] = run_pipeline(cores, corpus, out, ckpt, zpath,
                                            args.exec_cores,
                                            args.shuffle_partitions,
                                            mbtiles=args.mbtiles)
                if not os.path.exists(warm_ckpt):
                    shutil.copytree(ckpt, warm_ckpt)
                print(json.dumps({"phase": "e2e", **total[cores]}), flush=True)
        # resumed tile phase: identical per-layer checkpoints, only the
        # executor-bound render+reduce runs
        if "tile" in phases:
            assert os.path.exists(warm_ckpt), "tile legs need --warm-ckpt or e2e"
            for cores in legs:
                ckpt = os.path.join(work, f"tile_ckpt_{cores}")
                shutil.copytree(warm_ckpt, ckpt)
                shutil.rmtree(os.path.join(ckpt, "tile_features"),
                              ignore_errors=True)
                out = os.path.join(work, f"tile_{cores}")
                tile_phase[cores] = run_pipeline(cores, corpus, out, ckpt,
                                                 zpath, args.exec_cores,
                                                 args.shuffle_partitions,
                                                 mbtiles=args.mbtiles)
                print(json.dumps({"phase": "tile", **tile_phase[cores]}),
                      flush=True)

        ratio = hi // lo

        def eff(d):
            return round((d[lo]["wall_s"] / d[hi]["wall_s"]) / ratio, 3)

        with open(os.path.join(work, "daemons", "master.log")) as f:
            n_launches = sum(1 for l in f if "Launching executor" in l)
        result = {
            "metric": f"scaling_efficiency_{lo // args.exec_cores}_to_"
                      f"{hi // args.exec_cores}_executors_multijvm",
            "executor_launches_total": n_launches,
            "unit": "ratio",
            "n_docs": args.docs,
            "shuffle_partitions": args.shuffle_partitions,
            "deployment": "standalone master + 4x 8-core worker JVMs on one host;"
                          " spark-submit-equivalent (--master spark://…,"
                          " spark.submit.pyFiles zip); executor JVMs separate"
                          " (own heap/GC/python pool/netty shuffle)",
            "caveat": "all four workers still share ONE DRAM bus on this"
                      " sandbox host (tools/membench.py measures that ceiling);"
                      " on a real cluster each node has its own bus",
        }
        if total:
            result["end_to_end"] = {"efficiency": eff(total),
                                    "executor_lo": total[lo],
                                    "executor_hi": total[hi]}
        if tile_phase:
            result["value"] = eff(tile_phase)
            result["data_plane_tile_phase"] = {"efficiency": eff(tile_phase),
                                               "executor_lo": tile_phase[lo],
                                               "executor_hi": tile_phase[hi]}
        elif total:
            result["value"] = eff(total)
        with open(args.out_json, "w") as f:
            json.dump(result, f, indent=2)
        print(json.dumps(result))
    finally:
        stop_cluster(procs)
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
