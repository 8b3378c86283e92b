"""Summarize a Spark event log: per-job wall + gaps between jobs.

Usage: python tools/parse_eventlog.py /tmp/odd_eventlog/<app-id>
Prints one line per job (start offset, duration, first stage name) plus
driver-side gaps > 1s between consecutive jobs — the gaps are where
driver/Python time (collects, localCheckpoint setup, thread contention)
hides.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    path = sys.argv[1]
    jobs: dict[int, dict] = {}
    stage_names: dict[int, str] = {}
    stage_times: dict[int, float] = {}
    t_app0 = None
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerApplicationStart":
                t_app0 = ev["Timestamp"]
            elif e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = dict(
                    start=ev["Submission Time"],
                    stages=[s["Stage ID"] for s in ev["Stage Infos"]],
                    desc=(ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    )[:80],
                )
                for s in ev["Stage Infos"]:
                    stage_names[s["Stage ID"]] = s["Stage Name"]
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                if "Submission Time" in si and "Completion Time" in si:
                    stage_times[si["Stage ID"]] = (
                        si["Completion Time"] - si["Submission Time"]
                    ) / 1000.0

    prev_end = t_app0
    total_gap = 0.0
    for jid in sorted(jobs):
        j = jobs[jid]
        end = j.get("end", j["start"])
        dur = (end - j["start"]) / 1000.0
        gap = (j["start"] - prev_end) / 1000.0 if prev_end else 0.0
        total_gap += max(gap, 0.0)
        off = (j["start"] - t_app0) / 1000.0 if t_app0 else 0.0
        name = stage_names.get(j["stages"][-1], "?") if j["stages"] else "?"
        mark = f"  GAP {gap:7.1f}s" if gap > 1.0 else ""
        heavy = [
            f"s{sid}:{stage_times[sid]:.1f}s"
            for sid in j["stages"]
            if stage_times.get(sid, 0) > 2.0
        ]
        print(
            f"job {jid:3d} @{off:7.1f}s dur {dur:7.1f}s {name[:60]:60s}"
            f" {' '.join(heavy)}{mark}"
        )
        prev_end = max(prev_end or end, end)
    print(f"total inter-job gap: {total_gap:.1f}s")


if __name__ == "__main__":
    main()
