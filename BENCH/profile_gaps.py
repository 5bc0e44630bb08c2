"""Driver-overhead profiler: task-concurrency timeline from a Spark
event log — zero-task gaps, per-job durations, and low-concurrency
accounting. This is the tool behind the "serial orchestration floor"
numbers in BENCH/BASELINE.md (round 3/4 scaling analysis).

Usage:
    1. run any job with
         extra_conf={"spark.eventLog.enabled": "true",
                     "spark.eventLog.dir": "/tmp/evlog"}
    2. zstd -d the rolling log under /tmp/evlog/eventlog_v2_<appid>/
    3. python BENCH/profile_gaps.py <decompressed.json> [min_gap_ms]

Reading the output: a "gap" is wall-clock with ZERO running tasks —
driver-only time (planning, AQE stage transitions, parquet listing /
schema inference, py4j). Stages whose duration is large but whose
task time is ~0 are queue-wait behind a concurrent stage (FIFO slots),
NOT serial floor — check the task-time column before attributing.

Measured with this tool (1.5M pages, 8 pinned cores, r4 HEAD):
the timed bench section is one SQL execution with ~88% average task
concurrency; dead time is ~4 s of pre-action driver preamble, which
the contract-schema reads (sources/readers.py DIM_SCHEMAS) cut by
removing the per-table footer-inference jobs.
"""

from __future__ import annotations

import json
import sys


def load(path: str):
    jobs, stages, tasks = {}, {}, []
    app = [None, None]
    with open(path) as f:
        for line in f:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            ev = e.get("Event", "")
            if ev == "SparkListenerApplicationStart":
                app[0] = e["Timestamp"]
            elif ev == "SparkListenerApplicationEnd":
                app[1] = e["Timestamp"]
            elif ev == "SparkListenerJobStart":
                jobs[e["Job ID"]] = {"start": e["Submission Time"], "end": None,
                                     "stages": e.get("Stage IDs", [])}
            elif ev == "SparkListenerJobEnd":
                if e["Job ID"] in jobs:
                    jobs[e["Job ID"]]["end"] = e["Completion Time"]
            elif ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"], "n": si["Number of Tasks"],
                    "sub": si.get("Submission Time"),
                    "comp": si.get("Completion Time")}
            elif ev == "SparkListenerTaskEnd":
                ti = e["Task Info"]
                tasks.append((ti["Launch Time"], ti["Finish Time"]))
    return jobs, stages, tasks, app


def main() -> None:
    path = sys.argv[1]
    min_gap_ms = float(sys.argv[2]) if len(sys.argv) > 2 else 150.0
    jobs, stages, tasks, app = load(path)
    if not tasks:
        raise SystemExit("no tasks in log")
    t0 = app[0] or min(t[0] for t in tasks)
    t_end = app[1] or max(t[1] for t in tasks)

    pts = sorted([(a, 1) for a, _ in tasks] + [(b, -1) for _, b in tasks])
    gaps, cur, last = [], 0, t0
    task_time = sum(b - a for a, b in tasks)
    for t, d in pts:
        if cur == 0 and t > last:
            gaps.append((last, t))
        cur += d
        if cur == 0:
            last = t
    if t_end > last:
        gaps.append((last, t_end))

    wall = (t_end - t0) / 1000
    total_gap = sum(b - a for a, b in gaps) / 1000
    big = [(a, b) for a, b in gaps if b - a >= min_gap_ms]
    print(f"wall {wall:.1f}s  jobs={len(jobs)}  stages={len(stages)}  "
          f"tasks={len(tasks)}  task-time {task_time/1000:.1f}s  "
          f"avg-concurrency {task_time/1000/wall:.2f}")
    print(f"zero-task total {total_gap:.1f}s; {len(big)} gaps >= "
          f"{min_gap_ms:.0f}ms summing {sum(b-a for a, b in big)/1000:.1f}s")
    print("\ntop gaps (driver-only time):")
    for a, b in sorted(big, key=lambda g: g[0] - g[1])[:20]:
        print(f"  +{(a-t0)/1000:8.1f}s  {(b-a)/1000:6.2f}s")
    print("\nlongest jobs (check task time before calling these serial):")
    jl = [((v["end"] or v["start"]) - v["start"], j, v) for j, v in jobs.items()]
    for dur, j, v in sorted(jl, reverse=True)[:12]:
        nt = sum(stages.get(s, {}).get("n", 0) for s in v["stages"])
        print(f"  job {j:4d} {dur/1000:7.2f}s  tasks={nt}")


if __name__ == "__main__":
    main()
