"""Profile the resumed tile phase at two core counts with event logging.

Produces per-stage wall / task-sum / max-task so the Amdahl-limiting
serial pieces of the tile render+reduce phase are visible, instead of
guessing from end-to-end walls.

Usage: python tools/profile_tilephase.py [n_docs]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_tile_phase(cores: int, corpus: str, ckpt: str, evdir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_SHUFFLE_PARTITIONS"] = os.environ.get("SPARK_SHUFFLE_PARTITIONS", "64")
    env["SPARK_EVENTLOG_DIR"] = evdir
    t0 = time.time()
    out = tempfile.mkdtemp(prefix=f"omt_prof_out{cores}_")
    subprocess.run(
        [
            sys.executable, "-m", "planetiler_openmaptiles_spark.pipeline",
            "--corpus", corpus, "--out", out,
            "--checkpoints", ckpt,
            "--master", f"local[{cores}]", "--max-zoom", "14",
        ],
        cwd=REPO, env=env, check=True,
    )
    with open(os.path.join(out, "build_report.json")) as f:
        report = json.load(f)
    report["subprocess_wall_s"] = round(time.time() - t0, 2)
    shutil.rmtree(out, ignore_errors=True)
    return report


def parse_eventlog(evdir: str) -> list[dict]:
    stages = {}
    job_of_stage = {}
    jobs = {}
    paths = []
    for root, _dirs, files in os.walk(evdir):
        for fn in files:
            if "appstatus" not in fn and not fn.startswith("."):
                paths.append(os.path.join(root, fn))
    for path in paths:
        if path.endswith(".zstd"):
            import io

            raw = subprocess.run(["zstd", "-dc", path], capture_output=True).stdout
            f = io.StringIO(raw.decode())
        else:
            f = open(path)
        with f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                et = ev.get("Event")
                if et == "SparkListenerJobStart":
                    jid = ev["Job ID"]
                    jobs[jid] = {
                        "desc": (ev.get("Properties") or {}).get(
                            "spark.job.description", ""
                        )[:80],
                        "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                    }
                    for s in ev.get("Stage Infos", []):
                        job_of_stage[s["Stage ID"]] = jid
                elif et == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sid = si["Stage ID"]
                    s = stages.setdefault(sid, {"stage": sid, "task_sum_s": 0.0,
                                                "max_task_s": 0.0, "cpu_sum_s": 0.0})
                    s.update({
                        "name": si.get("Stage Name", "")[:70],
                        "tasks": si.get("Number of Tasks"),
                        "wall_s": round(
                            (si.get("Completion Time", 0) - si.get("Submission Time", 0))
                            / 1000.0, 2),
                        "submit": si.get("Submission Time", 0),
                    })
                elif et == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    ti = ev.get("Task Info", {})
                    dur = (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) / 1000.0
                    cpu = 0.0
                    for acc in ti.get("Accumulables", []):
                        if acc.get("Name") == "internal.metrics.executorCpuTime":
                            cpu = acc.get("Update", 0) / 1e9
                    s = stages.setdefault(sid, {"stage": sid, "name": "?",
                                                "task_sum_s": 0.0, "max_task_s": 0.0,
                                                "cpu_sum_s": 0.0})
                    s["task_sum_s"] = round(s["task_sum_s"] + dur, 2)
                    s["cpu_sum_s"] = round(s["cpu_sum_s"] + cpu, 2)
                    s["max_task_s"] = round(max(s["max_task_s"], dur), 2)
    out = sorted(stages.values(), key=lambda s: s.get("submit", 0))
    for s in out:
        s["job"] = job_of_stage.get(s["stage"])
        s.pop("submit", None)
    return out


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 256000
    from planetiler_openmaptiles_spark.datagen import write_corpus

    corpus = write_corpus(os.path.join(REPO, ".gendata"), n_docs=n_docs, seed=42)
    work = tempfile.mkdtemp(prefix="omt_prof_")
    print(f"work={work}", flush=True)
    # warm checkpoints once at 32 cores
    warm = os.path.join(work, "warm")
    t0 = time.time()
    run_tile_phase(32, corpus, warm, os.path.join(work, "ev_warm"))
    print(f"warm build: {time.time() - t0:.1f}s", flush=True)
    results = {}
    for cores in (8, 32):
        ckpt = os.path.join(work, f"ck{cores}")
        shutil.copytree(warm, ckpt)
        shutil.rmtree(os.path.join(ckpt, "tile_features"), ignore_errors=True)
        ev = os.path.join(work, f"ev{cores}")
        os.makedirs(ev, exist_ok=True)
        rep = run_tile_phase(cores, corpus, ckpt, ev)
        results[cores] = {"report": rep, "stages": parse_eventlog(ev)}
        print(f"== cores={cores} wall={rep['wall_s']} sub={rep['subprocess_wall_s']}")
    with open(os.path.join(REPO, "tools", "profile_tilephase_out.json"), "w") as f:
        json.dump(results, f, indent=2)
    for cores in (8, 32):
        print(f"\n---- cores={cores} ----")
        for s in results[cores]["stages"]:
            if s.get("task_sum_s", 0) > 0.5 or (s.get("wall_s") or 0) > 0.5:
                print(f"  stage {s['stage']:>3} job {s.get('job')} tasks={s.get('tasks')} "
                      f"wall={s.get('wall_s')} sum={s['task_sum_s']} max={s['max_task_s']} "
                      f" {s.get('name','')}")


if __name__ == "__main__":
    main()
