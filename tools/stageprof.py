#!/usr/bin/env python3
"""Aggregate Spark event-log stage wall/CPU time by stage name + callsite.

Usage: python3 tools/stageprof.py /tmp/graft_eventlog/<app-id> [topN]

Reads an uncompressed Spark event log (one JSON object per line) and prints,
per distinct stage name, the summed task time, executor CPU time, shuffle
read/write bytes, and spill — the 90-second answer to "which stage of this
100x key is the expensive one" that a wall-clock A/B can't give.
"""
import json
import sys
from collections import defaultdict


def main() -> None:
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    agg = defaultdict(lambda: defaultdict(float))
    stage_name = {}
    with open(path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            kind = ev.get("Event")
            if kind == "SparkListenerStageSubmitted":
                info = ev["Stage Info"]
                stage_name[info["Stage ID"]] = info["Stage Name"]
            elif kind == "SparkListenerStageCompleted":
                info = ev["Stage Info"]
                sid = info["Stage ID"]
                name = stage_name.get(sid, info.get("Stage Name", "?"))
                sub = info.get("Submission Time")
                comp = info.get("Completion Time")
                if sub and comp:
                    agg[name]["wall_s"] += (comp - sub) / 1e3
                agg[name]["stages"] += 1
                agg[name]["tasks"] += info.get("Number of Tasks", 0)
            elif kind == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                name = stage_name.get(sid, "?")
                m = ev.get("Task Metrics") or {}
                agg[name]["task_s"] += m.get("Executor Run Time", 0) / 1e3
                agg[name]["cpu_s"] += m.get("Executor CPU Time", 0) / 1e9
                agg[name]["gc_s"] += m.get("JVM GC Time", 0) / 1e3
                srm = m.get("Shuffle Read Metrics") or {}
                agg[name]["shuf_read_mb"] += (
                    srm.get("Remote Bytes Read", 0) + srm.get("Local Bytes Read", 0)
                ) / 1e6
                swm = m.get("Shuffle Write Metrics") or {}
                agg[name]["shuf_write_mb"] += swm.get("Shuffle Bytes Written", 0) / 1e6
                agg[name]["spill_mb"] += (
                    m.get("Memory Bytes Spilled", 0) + m.get("Disk Bytes Spilled", 0)
                ) / 1e6
    rows = sorted(agg.items(), key=lambda kv: -kv[1]["task_s"])[:top_n]
    hdr = f"{'task_s':>8} {'cpu_s':>8} {'gc_s':>6} {'wall_s':>7} {'stg':>3} {'tasks':>6} {'shR_MB':>8} {'shW_MB':>8} {'spill':>7}  stage"
    print(hdr)
    for name, m in rows:
        print(
            f"{m['task_s']:8.1f} {m['cpu_s']:8.1f} {m['gc_s']:6.1f} "
            f"{m['wall_s']:7.1f} {int(m['stages']):3d} {int(m['tasks']):6d} "
            f"{m['shuf_read_mb']:8.0f} {m['shuf_write_mb']:8.0f} "
            f"{m['spill_mb']:7.0f}  {name[:110]}"
        )


def per_stage(path: str, top_n: int = 30) -> None:
    """Same metrics but one row per stage ID, in submission order — AQE gives
    every SQL stage the same callsite name, so phase attribution has to come
    from stage order + shuffle volume instead."""
    stages = {}
    with open(path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            kind = ev.get("Event")
            if kind == "SparkListenerStageCompleted":
                info = ev["Stage Info"]
                sid = info["Stage ID"]
                s = stages.setdefault(sid, defaultdict(float))
                sub = info.get("Submission Time")
                comp = info.get("Completion Time")
                if sub and comp:
                    s["wall_s"] = (comp - sub) / 1e3
                    s["t_sub"] = sub
                s["tasks"] = info.get("Number of Tasks", 0)
            elif kind == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                s = stages.setdefault(sid, defaultdict(float))
                m = ev.get("Task Metrics") or {}
                s["task_s"] += m.get("Executor Run Time", 0) / 1e3
                s["cpu_s"] += m.get("Executor CPU Time", 0) / 1e9
                s["gc_s"] += m.get("JVM GC Time", 0) / 1e3
                srm = m.get("Shuffle Read Metrics") or {}
                s["shR_mb"] += (
                    srm.get("Remote Bytes Read", 0) + srm.get("Local Bytes Read", 0)
                ) / 1e6
                s["rowsR"] += srm.get("Total Records Read", 0)
                swm = m.get("Shuffle Write Metrics") or {}
                s["shW_mb"] += swm.get("Shuffle Bytes Written", 0) / 1e6
                s["rowsW"] += swm.get("Shuffle Records Written", 0)
                s["spill_mb"] += (
                    m.get("Memory Bytes Spilled", 0) + m.get("Disk Bytes Spilled", 0)
                ) / 1e6
                inp = m.get("Input Metrics") or {}
                s["in_mb"] += inp.get("Bytes Read", 0) / 1e6
    rows = sorted(stages.items(), key=lambda kv: -kv[1]["task_s"])[:top_n]
    print(
        f"{'sid':>4} {'task_s':>8} {'cpu_s':>8} {'gc_s':>6} {'wall_s':>7} {'tasks':>6}"
        f" {'in_MB':>7} {'shR_MB':>8} {'rowsR_M':>8} {'shW_MB':>8} {'rowsW_M':>8} {'spill':>7}"
    )
    for sid, s in rows:
        print(
            f"{sid:4d} {s['task_s']:8.1f} {s['cpu_s']:8.1f} {s['gc_s']:6.1f} "
            f"{s['wall_s']:7.1f} {int(s['tasks']):6d} {s['in_mb']:7.0f} "
            f"{s['shR_mb']:8.0f} {s['rowsR'] / 1e6:8.1f} {s['shW_mb']:8.0f} "
            f"{s['rowsW'] / 1e6:8.1f} {s['spill_mb']:7.0f}"
        )


if __name__ == "__main__":
    if len(sys.argv) > 3 and sys.argv[3] == "stages":
        per_stage(sys.argv[1], int(sys.argv[2]))
    else:
        main()
