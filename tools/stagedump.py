#!/usr/bin/env python3
"""Per-stage wall/shuffle/spill dump of an uncompressed Spark event log.

Usage: python3 tools/stagedump.py <event-log-file> [min_wall_s]

Complement to stageprof.py (which aggregates by stage NAME — useless when
every stage shares one callsite): this prints each stage ID on its own line
with wall seconds, task count, shuffle read/write MB, and memory/disk spill
MB, skipping stages under `min_wall_s` (default 0.5) with zero spill and
under 100 MB of shuffle write.
"""
import json
import sys


def main() -> None:
    path = sys.argv[1]
    min_wall = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    stages = {}
    for line in open(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        if ev.get("Event") != "SparkListenerStageCompleted":
            continue
        info = ev["Stage Info"]
        acc = {a["Name"]: a.get("Value") for a in info.get("Accumulables", [])}

        def mb(name: str) -> float:
            return int(acc.get(name, 0) or 0) / 2**20

        stages[info["Stage ID"]] = dict(
            wall=(info.get("Completion Time", 0) - info.get("Submission Time", 0)) / 1e3,
            tasks=info.get("Number of Tasks", 0),
            # task_s is summed executor run time; wall includes scheduling
            # delay (a stage submitted early but launched late reads a huge
            # wall with near-zero task_s — a ghost, not a cost). cpu_s low
            # relative to task_s means IO/contention/host steal, not code.
            task_s=int(acc.get("internal.metrics.executorRunTime", 0) or 0) / 1e3,
            cpu_s=int(acc.get("internal.metrics.executorCpuTime", 0) or 0) / 1e9,
            spill=mb("internal.metrics.memoryBytesSpilled"),
            dspill=mb("internal.metrics.diskBytesSpilled"),
            shW=mb("internal.metrics.shuffle.write.bytesWritten"),
            shR=mb("internal.metrics.shuffle.read.remoteBytesRead")
            + mb("internal.metrics.shuffle.read.localBytesRead"),
        )
    for sid in sorted(stages):
        s = stages[sid]
        if s["wall"] > min_wall or s["spill"] > 0 or s["shW"] > 100:
            print(
                f'stage {sid:3d} wall {s["wall"]:7.1f}s task {s["task_s"]:7.1f}s '
                f'cpu {s["cpu_s"]:7.1f}s tasks {s["tasks"]:4d} '
                f'shR {s["shR"]:8.0f}MB shW {s["shW"]:8.0f}MB '
                f'memSpill {s["spill"]:8.0f}MB diskSpill {s["dspill"]:7.0f}MB'
            )


if __name__ == "__main__":
    main()
