#!/usr/bin/env python3
"""Summarize a Spark event log: per-job wall, per-stage duration / task-time /
utilization, and driver gaps (wall time with no stage running).

usage: evlog.py <eventlog-file> [cores]
"""
import json
import sys


def main(path, cores):
    stages = {}   # (stageId, attempt) -> dict
    jobs = {}     # jobId -> dict
    app_start = app_end = None
    with open(path) as f:
        for line in f:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            ev = e.get("Event", "")
            if ev == "SparkListenerApplicationStart":
                app_start = e["Timestamp"]
            elif ev == "SparkListenerApplicationEnd":
                app_end = e["Timestamp"]
            elif ev == "SparkListenerJobStart":
                jobs[e["Job ID"]] = {"start": e["Submission Time"],
                                     "stages": [s["Stage ID"] for s in e["Stage Infos"]]}
            elif ev == "SparkListenerJobEnd":
                if e["Job ID"] in jobs:
                    jobs[e["Job ID"]]["end"] = e["Completion Time"]
            elif ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                key = (si["Stage ID"], si["Stage Attempt ID"])
                st = stages.setdefault(key, {})
                st.update({
                    "name": si["Stage Name"].split("\n")[0][:70],
                    "sub": si.get("Submission Time"),
                    "com": si.get("Completion Time"),
                    "tasks": si["Number of Tasks"],
                })
            elif ev == "SparkListenerTaskEnd":
                sid = (e["Stage ID"], e["Stage Attempt ID"])
                m = e.get("Task Metrics") or {}
                st = stages.setdefault(sid, {})
                st["task_ms"] = st.get("task_ms", 0) + (m.get("Executor Run Time", 0) or 0)
                st["gc_ms"] = st.get("gc_ms", 0) + (m.get("JVM GC Time", 0) or 0)
                st["deser_ms"] = st.get("deser_ms", 0) + (m.get("Executor Deserialize Time", 0) or 0)
                srm = (m.get("Shuffle Read Metrics") or {})
                st["fetch_ms"] = st.get("fetch_ms", 0) + (srm.get("Fetch Wait Time", 0) or 0)
                swm = (m.get("Shuffle Write Metrics") or {})
                st["swrite_ms"] = st.get("swrite_ms", 0) + (swm.get("Shuffle Write Time", 0) or 0) // 1_000_000

    done = [(k, s) for k, s in stages.items() if s.get("sub") and s.get("com")]
    done.sort(key=lambda kv: kv[1]["sub"])
    if not done:
        print("no completed stages")
        return
    t0 = done[0][1]["sub"]
    tN = max(s["com"] for _, s in done)
    wall = (tN - t0) / 1000.0

    # driver gaps: merge stage intervals, find uncovered wall time
    ivs = sorted((s["sub"], s["com"]) for _, s in done)
    covered = 0
    cur_s, cur_e = ivs[0]
    gaps = []
    for a, b in ivs[1:]:
        if a > cur_e:
            gaps.append((cur_e, a))
            covered += cur_e - cur_s
            cur_s, cur_e = a, b
        else:
            cur_e = max(cur_e, b)
    covered += cur_e - cur_s
    gap_total = (tN - t0 - covered) / 1000.0

    print(f"app wall (first stage sub → last stage com): {wall:.1f}s  "
          f"stage-covered: {covered/1000.0:.1f}s  driver-gaps: {gap_total:.1f}s")
    print(f"top driver gaps:")
    for a, b in sorted(gaps, key=lambda g: g[1] - g[0], reverse=True)[:8]:
        print(f"  {(a-t0)/1000.0:9.1f}s  +{(b-a)/1000.0:6.2f}s")

    print(f"\ntop stages by duration (cores={cores}):")
    for k, s in sorted(done, key=lambda kv: kv[1]["com"] - kv[1]["sub"], reverse=True)[:15]:
        dur = (s["com"] - s["sub"]) / 1000.0
        tms = s.get("task_ms", 0) / 1000.0
        util = tms / (dur * cores) if dur > 0 else 0
        gc = s.get("gc_ms", 0) / 1000.0
        fetch = s.get("fetch_ms", 0) / 1000.0
        print(f"  {dur:7.1f}s util={util:4.2f} tasks={s.get('tasks', 0):5d} "
              f"taskT={tms:7.1f}s gc={gc:5.1f}s fetch={fetch:5.1f}s  {k} {s.get('name','')}")

    tot_task = sum(s.get("task_ms", 0) for _, s in done) / 1000.0
    tot_gc = sum(s.get("gc_ms", 0) for _, s in done) / 1000.0
    print(f"\ntotal task time: {tot_task:.1f}s  (= {tot_task/wall:.2f} cores busy avg)  gc: {tot_gc:.1f}s")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 16)
