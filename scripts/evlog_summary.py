"""Summarize a Spark event log: per-stage task-time vs wall, wave/skew
and scheduler-gap attribution for scaling diagnosis.

For each completed stage: wall (submission->completion), sum of task run
times, max task time (skew floor), task count, and the stage name. Then
totals: sum of stage walls vs app wall (gap = driver/serial time between
stages), sum of task time vs cores x app wall (core utilization).

Usage: python scripts/evlog_summary.py /tmp/spark-events-8/<app-id> [--top 25]
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def main() -> None:
    path = sys.argv[1]
    top = int(sys.argv[sys.argv.index("--top") + 1]) if "--top" in sys.argv else 25
    stages: dict = {}
    task_time: dict = defaultdict(float)
    task_max: dict = defaultdict(float)
    task_cnt: dict = defaultdict(int)
    gc_time: dict = defaultdict(float)
    app_start = app_end = None
    cores = None
    with open(path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerApplicationStart":
                app_start = ev["Timestamp"]
            elif e == "SparkListenerApplicationEnd":
                app_end = ev["Timestamp"]
            elif e == "SparkListenerEnvironmentUpdate":
                m = ev.get("Spark Properties", {}).get("spark.master", "")
                if m.startswith("local["):
                    cores = int(m[6:-1])
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = (si["Stage ID"], si["Stage Attempt ID"])
                sub, comp = si.get("Submission Time"), si.get("Completion Time")
                if sub and comp:
                    stages[sid] = {
                        "name": si["Stage Name"].split("\n")[0][:70],
                        "wall": (comp - sub) / 1000.0,
                        "ntask": si.get("Number of Tasks", 0),
                    }
            elif e == "SparkListenerTaskEnd":
                sid = (ev["Stage ID"], ev["Stage Attempt ID"])
                ti = ev.get("Task Info", {})
                dur = (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) / 1000.0
                task_time[sid] += dur
                task_max[sid] = max(task_max[sid], dur)
                task_cnt[sid] += 1
                tm = ev.get("Task Metrics") or {}
                gc_time[sid] += tm.get("JVM GC Time", 0) / 1000.0

    # union of stage-active intervals -> time with NO stage running
    # (driver planning, py4j round-trips, result handling) = the serial
    # component that caps scaling
    stage_iv = []
    with open(path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sub, comp = si.get("Submission Time"), si.get("Completion Time")
                if sub and comp:
                    stage_iv.append((sub, comp))
    stage_iv.sort()
    covered, cur_s, cur_e = 0, None, None
    for s0, e0 in stage_iv:
        if cur_s is None:
            cur_s, cur_e = s0, e0
        elif s0 <= cur_e:
            cur_e = max(cur_e, e0)
        else:
            covered += cur_e - cur_s
            cur_s, cur_e = s0, e0
    if cur_s is not None:
        covered += cur_e - cur_s

    rows = []
    for sid, s in stages.items():
        rows.append(
            {
                "stage": sid[0],
                "wall": round(s["wall"], 2),
                "task_sum": round(task_time[sid], 2),
                "task_max": round(task_max[sid], 2),
                "n": task_cnt[sid] or s["ntask"],
                "gc": round(gc_time[sid], 1),
                "name": s["name"],
            }
        )
    rows.sort(key=lambda r: -r["wall"])
    wall_total = sum(r["wall"] for r in rows)
    task_total = sum(r["task_sum"] for r in rows)
    app_wall = (app_end - app_start) / 1000.0 if app_start and app_end else None
    print(f"app_wall={app_wall and round(app_wall, 1)}s cores={cores} "
          f"stage_wall_sum={round(wall_total, 1)}s (overlap possible) "
          f"task_time_sum={round(task_total, 1)}s")
    if app_wall and cores:
        print(f"core_utilization={round(task_total / (app_wall * cores) * 100, 1)}% "
              f"stage_covered={round(covered / 1000.0, 1)}s "
              f"no_stage_running={round(app_wall - covered / 1000.0, 1)}s")
    print(f"{'stage':>5} {'wall':>8} {'tasks':>8} {'max':>7} {'n':>4} {'gc':>6}  name")
    for r in rows[:top]:
        print(
            f"{r['stage']:>5} {r['wall']:>8.2f} {r['task_sum']:>8.2f} "
            f"{r['task_max']:>7.2f} {r['n']:>4} {r['gc']:>6.1f}  {r['name']}"
        )


if __name__ == "__main__":
    main()
