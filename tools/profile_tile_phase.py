"""Profile the resumed tile phase: stage/task timing from the Spark event log.

Usage:
  python -m tools.profile_tile_phase warm   <corpus> <ckpt>          # full build to warm ckpts
  python -m tools.profile_tile_phase tile   <corpus> <warm> <cores>  # resumed tile phase, eventlog
  python -m tools.profile_tile_phase report <eventlog-dir>           # summarize stage walls
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time


def run_tile(corpus: str, warm: str, cores: int, eventlog: str):
    ckpt = f"/tmp/prof_ckpt_{cores}"
    shutil.rmtree(ckpt, ignore_errors=True)
    shutil.copytree(warm, ckpt)
    shutil.rmtree(os.path.join(ckpt, "tile_features"), ignore_errors=True)
    os.makedirs(eventlog, exist_ok=True)

    from planetiler_openmaptiles_spark.layers import Config
    from planetiler_openmaptiles_spark.pipeline import build_tiles, write_tiles
    from planetiler_openmaptiles_spark.session import get_spark

    spark = get_spark(
        f"profile-tile-{cores}", master=f"local[{cores}]",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": eventlog,
        },
    )
    marks = {}
    t0 = time.time()
    tiles = build_tiles(spark, corpus, Config(max_zoom=14), ckpt)
    marks["plan_build"] = time.time() - t0
    t1 = time.time()
    tiles = tiles.cache()
    n_feats = tiles.count()
    marks["first_action_count"] = time.time() - t1
    t2 = time.time()
    n_tiles = tiles.select("z", "x", "y").distinct().count()
    marks["distinct_count"] = time.time() - t2
    t3 = time.time()
    out = f"/tmp/prof_out_{cores}"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    write_tiles(tiles, out)
    marks["write"] = time.time() - t3
    marks["total"] = time.time() - t0
    marks.update(feats=n_feats, tiles=n_tiles, cores=cores)
    print(json.dumps({k: round(v, 2) if isinstance(v, float) else v for k, v in marks.items()}))
    spark.stop()


def report(eventlog_dir: str):
    logs = sorted(glob.glob(os.path.join(eventlog_dir, "*")), key=os.path.getmtime)
    path = logs[-1]
    if os.path.isdir(path):
        inner = [p for p in glob.glob(os.path.join(path, "events_*")) if os.path.isfile(p)]
        path = sorted(inner)[-1]
    stages = {}
    jobs = {}
    app_start = app_end = None
    if path.endswith(".zstd"):
        import io
        import subprocess

        raw = subprocess.run(["zstd", "-dc", path], capture_output=True, check=True).stdout
        f = io.StringIO(raw.decode("utf-8", "replace"))
    else:
        f = open(path)
    with f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            t = ev.get("Event")
            if t == "SparkListenerApplicationStart":
                app_start = ev["Timestamp"]
            elif t == "SparkListenerApplicationEnd":
                app_end = ev["Timestamp"]
            elif t == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = {
                    "start": ev["Submission Time"],
                    "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                }
            elif t == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
            elif t == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                rec = stages.setdefault(si["Stage ID"], {"task_times": []})
                rec.update(
                    name=si["Stage Name"].split("\n")[0][:90],
                    tasks=si["Number of Tasks"],
                    start=si.get("Submission Time"),
                    end=si.get("Completion Time"),
                )
            elif t == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                ti = ev["Task Info"]
                stages.setdefault(sid, {"task_times": [], "name": "?", "tasks": 0})[
                    "task_times"
                ].append((ti["Finish Time"] - ti["Launch Time"]) / 1000.0)
    print(f"== {os.path.basename(path)}")
    if app_start and app_end:
        print(f"app wall: {(app_end - app_start) / 1000.0:.1f}s")
    total_stage = 0.0
    rows = []
    for sid, s in sorted(stages.items()):
        if not s.get("start") or not s.get("end"):
            continue
        wall = (s["end"] - s["start"]) / 1000.0
        total_stage += wall
        tt = sorted(s["task_times"])
        rows.append(
            (
                wall,
                sid,
                s["name"],
                len(tt),
                sum(tt),
                tt[-1] if tt else 0,
                tt[len(tt) // 2] if tt else 0,
            )
        )
    rows.sort(reverse=True)
    print(f"{'wall_s':>8} {'sid':>4} {'ntask':>6} {'cpu_s':>9} {'max_t':>7} {'med_t':>7}  name")
    for wall, sid, name, n, cpu, mx, med in rows[:25]:
        print(f"{wall:8.1f} {sid:4d} {n:6d} {cpu:9.1f} {mx:7.1f} {med:7.2f}  {name}")
    print(f"sum stage walls: {total_stage:.1f}s (stages may overlap)")
    # job-level gaps: time not covered by any running job = driver-serial
    iv = sorted((j["start"], j.get("end", j["start"])) for j in jobs.values())
    covered = 0
    cur_s, cur_e = None, None
    for s, e in iv:
        if cur_s is None:
            cur_s, cur_e = s, e
        elif s <= cur_e:
            cur_e = max(cur_e, e)
        else:
            covered += cur_e - cur_s
            cur_s, cur_e = s, e
    if cur_s is not None:
        covered += cur_e - cur_s
    if app_start and app_end:
        wall = app_end - app_start
        print(
            f"job-covered: {covered/1000.0:.1f}s; driver-gap (no job running):"
            f" {(wall - covered)/1000.0:.1f}s"
        )


def main():
    mode = sys.argv[1]
    if mode == "warm":
        corpus, ckpt = sys.argv[2], sys.argv[3]
        from planetiler_openmaptiles_spark.layers import Config
        from planetiler_openmaptiles_spark.pipeline import build_tiles
        from planetiler_openmaptiles_spark.session import get_spark

        spark = get_spark("profile-warm", master="local[32]")
        t0 = time.time()
        tiles = build_tiles(spark, corpus, Config(max_zoom=14), ckpt)
        n = tiles.count()
        print(json.dumps({"feats": n, "wall": round(time.time() - t0, 2)}))
        spark.stop()
    elif mode == "tile":
        run_tile(sys.argv[2], sys.argv[3], int(sys.argv[4]), sys.argv[5])
    elif mode == "report":
        report(sys.argv[2])


if __name__ == "__main__":
    main()
