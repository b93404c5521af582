"""Decompose multi-JVM scaling: event-log-instrumented 1 vs 4 executor runs.

BENCH_scaling_multijvm.json measured an inversion (4 executors SLOWER than
1 on the resumed tile phase). This tool reruns both configs with
spark.eventLog enabled and aggregates task metrics per stage so the extra
wall-clock can be attributed: executor compute vs JVM GC vs scheduler /
locality delay vs shuffle fetch wait vs driver-side gaps between stages.

Usage:
  python -m tools.cluster_diag [--warm-ckpt DIR] [--docs N] [--configs 8,32]

Writes /tmp/cluster_diag/<cores>/ event logs + prints a per-stage table.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

import tools.cluster_bench as cb

REPO = cb.REPO


def _event_lines(path: str):
    """Yield event-json lines from a v1 file or a v2 rolling-log dir."""
    if os.path.isdir(path):
        for part in sorted(glob.glob(os.path.join(path, "events_*"))):
            with open(part) as f:
                yield from f
    else:
        with open(path) as f:
            yield from f


def parse_eventlog(path: str) -> dict:
    """Aggregate one Spark event log into per-stage + total attributions."""
    stages = {}  # (stageId, attempt) -> dict
    app_start = app_end = None
    if True:
        for line in _event_lines(path):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            et = ev.get("Event")
            if et == "SparkListenerApplicationStart":
                app_start = ev.get("Timestamp")
            elif et == "SparkListenerApplicationEnd":
                app_end = ev.get("Timestamp")
            elif et == "SparkListenerStageSubmitted":
                si = ev["Stage Info"]
                key = (si["Stage ID"], si["Stage Attempt ID"])
                # distinctive physical ops from the RDD lineage beat the
                # generic callsite ("parquet at NativeMethodAccessor...")
                scopes = []
                for rdd in si.get("RDD Info", []):
                    try:
                        nm = json.loads(rdd.get("Scope", "{}") or "{}").get("name", "")
                    except json.JSONDecodeError:
                        nm = ""
                    if nm and nm not in scopes:
                        scopes.append(nm)
                stages[key] = {
                    "ops": ",".join(scopes[:6])[:80],
                    "name": si["Stage Name"].split("\n")[0][:60],
                    "ntasks": si["Number of Tasks"],
                    "submit": ev.get("Stage Info", {}).get("Submission Time"),
                    "run": 0, "gc": 0, "deser": 0, "result_ser": 0,
                    "fetch_wait": 0, "shuffle_write_ms": 0,
                    "sched_gap": 0, "task_wall": 0,
                    "remote_bytes": 0, "local_bytes": 0,
                    "loc": {}, "first_launch": None, "last_finish": None,
                }
            elif et == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                key = (si["Stage ID"], si["Stage Attempt ID"])
                st = stages.setdefault(key, {})
                st["submit"] = si.get("Submission Time")
                st["complete"] = si.get("Completion Time")
            elif et == "SparkListenerTaskEnd":
                key = (ev["Stage ID"], ev["Stage Attempt ID"])
                st = stages.get(key)
                if st is None:
                    continue
                ti = ev.get("Task Info", {})
                tm = ev.get("Task Metrics") or {}
                launch, finish = ti.get("Launch Time"), ti.get("Finish Time")
                if launch and finish:
                    st["task_wall"] += finish - launch
                    st["first_launch"] = min(st["first_launch"] or launch, launch)
                    st["last_finish"] = max(st["last_finish"] or finish, finish)
                loc = ti.get("Locality", "?")
                st["loc"][loc] = st["loc"].get(loc, 0) + 1
                st["run"] += tm.get("Executor Run Time", 0)
                st["gc"] += tm.get("JVM GC Time", 0)
                st["deser"] += tm.get("Executor Deserialize Time", 0)
                st["result_ser"] += tm.get("Result Serialization Time", 0)
                srm = tm.get("Shuffle Read Metrics") or {}
                st["fetch_wait"] += srm.get("Fetch Wait Time", 0)
                st["remote_bytes"] += srm.get("Remote Bytes Read", 0)
                st["local_bytes"] += srm.get("Local Bytes Read", 0)
                swm = tm.get("Shuffle Write Metrics") or {}
                st["shuffle_write_ms"] += swm.get("Shuffle Write Time", 0) // 1_000_000
                if launch and finish:
                    # scheduler delay per Spark UI definition
                    other = (
                        tm.get("Executor Run Time", 0)
                        + tm.get("Executor Deserialize Time", 0)
                        + tm.get("Result Serialization Time", 0)
                    )
                    st["sched_gap"] += max(0, (finish - launch) - other)
    # stage wall + inter-stage driver gap
    done = [
        {**v, "stage": k[0]}
        for k, v in stages.items()
        if v.get("complete") and v.get("submit")
    ]
    done.sort(key=lambda s: s["submit"])
    stage_wall = sum(s["complete"] - s["submit"] for s in done)
    # union of [submit, complete] intervals = time any stage was in flight
    busy = 0
    cur_s = cur_e = None
    for s in done:
        if cur_e is None or s["submit"] > cur_e:
            if cur_e is not None:
                busy += cur_e - cur_s
            cur_s, cur_e = s["submit"], s["complete"]
        else:
            cur_e = max(cur_e, s["complete"])
    if cur_e is not None:
        busy += cur_e - cur_s
    app_wall = (app_end - app_start) if (app_start and app_end) else None
    return {
        "app_wall_ms": app_wall,
        "stage_busy_ms": busy,
        "driver_gap_ms": (app_wall - busy) if app_wall else None,
        "stage_wall_sum_ms": stage_wall,
        "stages": done,
    }


def summarize(tag: str, agg: dict, cores: int) -> dict:
    tot = {k: sum(s[k] for s in agg["stages"]) for k in
           ("run", "gc", "deser", "sched_gap", "fetch_wait", "task_wall",
            "result_ser", "remote_bytes", "local_bytes")}
    loc = {}
    for s in agg["stages"]:
        for k, v in s["loc"].items():
            loc[k] = loc.get(k, 0) + v
    out = {
        "tag": tag,
        "cores": cores,
        "app_wall_s": round((agg["app_wall_ms"] or 0) / 1000, 1),
        "stage_busy_s": round(agg["stage_busy_ms"] / 1000, 1),
        "driver_gap_s": round((agg["driver_gap_ms"] or 0) / 1000, 1),
        "task_wall_core_s": round(tot["task_wall"] / 1000, 1),
        "exec_run_core_s": round(tot["run"] / 1000, 1),
        "gc_core_s": round(tot["gc"] / 1000, 1),
        "deser_core_s": round(tot["deser"] / 1000, 1),
        "sched_delay_core_s": round(tot["sched_gap"] / 1000, 1),
        "fetch_wait_core_s": round(tot["fetch_wait"] / 1000, 1),
        "remote_shuffle_mb": round(tot["remote_bytes"] / 1e6, 1),
        "local_shuffle_mb": round(tot["local_bytes"] / 1e6, 1),
        "locality": loc,
    }
    print(json.dumps(out), flush=True)
    # top stages by wall
    top = sorted(agg["stages"], key=lambda s: s["complete"] - s["submit"],
                 reverse=True)[:8]
    for s in top:
        print(
            f"  stage {s['stage']:>4} wall={(s['complete']-s['submit'])/1000:7.1f}s"
            f" tasks={s['ntasks']:>4} run={s['run']/1000:8.1f} gc={s['gc']/1000:6.1f}"
            f" sched={s['sched_gap']/1000:7.1f} fetch={s['fetch_wait']/1000:5.1f}"
            f" loc={s['loc']} ops={s.get('ops') or s['name'][:48]}",
            flush=True,
        )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--warm-ckpt", default="/tmp/omt_loc_6lm3xurk/warm")
    ap.add_argument("--docs", type=int, default=1024000)
    ap.add_argument("--configs", default="8,32")
    ap.add_argument("--work", default="/tmp/cluster_diag")
    ap.add_argument("--extra-conf", default="{}",
                    help="json merged into SPARK_EXTRA_CONF_JSON for all runs")
    ap.add_argument("--shuffle-partitions", default="64")
    ap.add_argument("--exec-cores", type=int, default=8)
    args = ap.parse_args()

    corpus = os.path.join(REPO, ".gendata", f"n{args.docs}_s42_v3")
    assert os.path.exists(corpus), corpus
    assert os.path.exists(args.warm_ckpt), args.warm_ckpt
    shutil.rmtree(args.work, ignore_errors=True)
    os.makedirs(args.work)
    procs = cb.start_cluster(os.path.join(args.work, "daemons"))
    extra = json.loads(args.extra_conf)
    results = {}
    try:
        zpath = cb.build_zip(args.work)
        for cores in [int(c) for c in args.configs.split(",")]:
            ckpt = os.path.join(args.work, f"ckpt_{cores}")
            shutil.copytree(args.warm_ckpt, ckpt)
            shutil.rmtree(os.path.join(ckpt, "tile_features"), ignore_errors=True)
            evdir = os.path.join(args.work, f"ev_{cores}")
            os.environ["SPARK_EVENTLOG_DIR"] = evdir
            out = os.path.join(args.work, f"out_{cores}")
            t0 = time.time()
            rep = _run(cores, corpus, out, ckpt, zpath, extra,
                       args.shuffle_partitions, args.exec_cores)
            rep["subprocess_wall_s"] = round(time.time() - t0, 2)
            print(json.dumps({"phase": "tile", "cores": cores, **rep}), flush=True)
            evfiles = sorted(glob.glob(os.path.join(evdir, "*")),
                             key=os.path.getmtime)
            agg = parse_eventlog(evfiles[-1])
            results[cores] = summarize(f"tile_{cores}", agg, cores)
        os.environ.pop("SPARK_EVENTLOG_DIR", None)
    finally:
        cb.stop_cluster(procs)
    with open(os.path.join(args.work, "diag.json"), "w") as f:
        json.dump(results, f, indent=2)


def _run(cores, corpus, out_dir, ckpt, zpath, extra, shuffle_parts="64",
         exec_cores=8):
    import subprocess

    env = dict(os.environ)
    env["SPARK_MASTER"] = cb.MASTER_URL
    env["SPARK_SHUFFLE_PARTITIONS"] = str(shuffle_parts)
    env["PYSPARK_PYTHON"] = sys.executable
    conf = {
        "spark.cores.max": str(cores),
        "spark.executor.cores": str(exec_cores),
        "spark.executor.memory": "16g",
        "spark.submit.pyFiles": zpath,
        "spark.driver.host": "127.0.0.1",
        "spark.driver.bindAddress": "127.0.0.1",
    }
    conf.update(extra)
    env["SPARK_EXTRA_CONF_JSON"] = json.dumps(conf)
    subprocess.run(
        [sys.executable, "-m", "planetiler_openmaptiles_spark.pipeline",
         "--corpus", corpus, "--out", out_dir,
         "--checkpoints", ckpt, "--max-zoom", "14"],
        cwd=REPO, env=env, check=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    with open(os.path.join(out_dir, "build_report.json")) as f:
        return json.load(f)


if __name__ == "__main__":
    main()
