#!/usr/bin/env python
"""Per-stage decomposition of one registry key at one core count
(r11, guide §1/§7.1): fresh JVM, sf0.01 warmup, N timed noop-sink
runs, then dump every job/stage of the LAST timed run from the Spark
UI REST API — task count, wall (completionTime - firstTaskLaunched),
executorRunTime sum, executorCpuTime, shuffle bytes, GC — so an
8-vs-32-core inversion can be attributed to a STAGE (scheduling
overhead, state-store commit, Python boundary) instead of guessed.

Usage: python scripts/profile_stages.py KEY [cpus] [runs] [sf_dir]
Prints one JSON doc.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    key = sys.argv[1]
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)

    from streamforge_data_pipeline_spark.registry import REGISTRY
    from streamforge_data_pipeline_spark.session import get_session

    spark = get_session(f"profile-{key}-{cpus}")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    try:
        REGISTRY[key].fn(spark, "/root/testdata/sf0.01").write.format(
            "noop"
        ).mode("overwrite").save()
    except Exception as e:
        print(json.dumps({"warmup_error": f"{type(e).__name__}: {e}"}))
    spark.catalog.clearCache()

    walls = []
    mark_job = None
    for i in range(runs):
        spark.catalog.clearCache()
        tracker = sc.statusTracker()
        before_ids = set(tracker.getJobIdsForGroup() or [])
        sc.setJobDescription(f"{key} timed run {i}")
        t0 = time.time()
        REGISTRY[key].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        walls.append(round(time.time() - t0, 3))
        sc.setJobDescription(None)
        if i == runs - 1:
            mark_job = before_ids

    ui = sc.uiWebUrl
    app_id = sc.applicationId

    def get(path):
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}{path}") as r:
            return json.load(r)

    jobs = get("/jobs")
    # jobs since the final run started (ids ascend)
    min_prev = max(mark_job) if mark_job else -1
    last_jobs = [j for j in jobs if j["jobId"] > min_prev]
    job_rows = [
        {
            "job": j["jobId"],
            "name": (j.get("description") or j["name"]).split("\n")[0][:90],
            "stages": j["stageIds"],
        }
        for j in sorted(last_jobs, key=lambda j: j["jobId"])
    ]
    stage_ids = sorted({s for j in last_jobs for s in j["stageIds"]})
    stages = []
    for sid in stage_ids:
        try:
            for att in get(f"/stages/{sid}"):
                if att["status"] == "SKIPPED":
                    stages.append({"stage": sid, "skipped": True,
                                   "name": att["name"].split("\n")[0][:80]})
                    continue
                sub = att.get("submissionTime")
                first = att.get("firstTaskLaunchedTime")
                comp = att.get("completionTime")

                def ms(a, b):
                    if not a or not b:
                        return None
                    from datetime import datetime
                    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                    return round(
                        (datetime.strptime(b, fmt) - datetime.strptime(a, fmt)).total_seconds() * 1000
                    )
                stages.append({
                    "stage": sid,
                    "name": att["name"].split("\n")[0][:80],
                    "tasks": att["numCompleteTasks"],
                    "wall_ms": ms(sub, comp),
                    "sched_delay_ms": ms(sub, first),
                    "run_ms": att["executorRunTime"],
                    "cpu_ms": round(att["executorCpuTime"] / 1e6),
                    "gc_ms": att["jvmGcTime"],
                    "deser_ms": att["executorDeserializeTime"],
                    "sh_read_mb": round(att["shuffleReadBytes"] / 1e6, 2),
                    "sh_write_mb": round(att["shuffleWriteBytes"] / 1e6, 2),
                    "in_mb": round(att["inputBytes"] / 1e6, 2),
                    "desc": (att.get("description") or "")[:60],
                })
        except Exception as e:
            stages.append({"stage": sid, "error": str(e)[:80]})

    total_wall = sum(s.get("wall_ms") or 0 for s in stages)
    print(json.dumps({
        "key": key, "cpus": cpus, "walls": walls, "best": min(walls),
        "n_jobs_last_run": len(last_jobs),
        "n_stages": len([s for s in stages if not s.get("skipped")]),
        "sum_stage_wall_ms": total_wall,
        "jobs": job_rows,
        "stages": stages,
    }, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
