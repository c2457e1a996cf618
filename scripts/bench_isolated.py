#!/usr/bin/env python
"""Fresh-JVM isolated re-measure (r9 VERDICT #2): one key per PROCESS,
one SF per process, so no cell inherits another's heap pressure, GC
debt, code-cache state, or leftover block-manager storage — the
documented long-JVM inflation class (PERF_NOTES r9.12: untouched keys
measured 2.4x slower late in a shared session; `pagerank_canonical`
15.2 s shared vs 6.4 s isolated).

Each child process: builds the standard session, warms its ONE key at
sf0.01 (C2/codegen), then times `runs` passes at the target SF and
prints best + per-run walls as JSON. The parent serializes cells (never
two JVMs timing at once) and writes one artifact.

Usage:
  python scripts/bench_isolated.py OUT.json [runs] [keys] [sfs]
    keys: comma list (default: the r9 suspect rows)
    sfs:  comma list of SF names from bench_dedup_scaling.SF_DIRS
          (default "0.1,1,2")
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.bench_dedup_scaling import SF_DIRS  # noqa: E402

# the r9 unadjudicated rows (VERDICT "What's wrong #1" + r9.12 watch +
# the sf0.1 regressions on untouched code)
DEFAULT_KEYS = [
    "canonical_selection",
    "pagerank_canonical",
    "ann_ivf_indexed",
    "semantic_dedup_cells",
    "triangle_counts",
    "stream_shard_export",
    "quality_retention_curve",
]

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from streamforge_data_pipeline_spark.registry import REGISTRY
from streamforge_data_pipeline_spark.session import get_session
key, sf_dir, runs = sys.argv[1], sys.argv[2], int(sys.argv[3])
spark = get_session("isolated-" + key)
spark.sparkContext.setLogLevel("ERROR")
try:
    REGISTRY[key].fn(spark, "/root/testdata/sf0.01").write.format("noop").mode("overwrite").save()
except Exception as e:
    print(json.dumps({{"warmup_error": type(e).__name__}}))
spark.catalog.clearCache()
walls = []
for _ in range(runs):
    spark.catalog.clearCache()
    t0 = time.time()
    REGISTRY[key].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    walls.append(round(time.time() - t0, 2))
print("ISOLATED " + json.dumps({{"walls": walls}}))
spark.stop()
"""


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALING_ISOLATED.json"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    keys = (
        sys.argv[3].split(",") if len(sys.argv) > 3 and sys.argv[3] != "-"
        else DEFAULT_KEYS
    )
    sf_names = (
        set(sys.argv[4].split(",")) if len(sys.argv) > 4 else {"0.1", "1", "2"}
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child_src = _CHILD.format(repo=repo)
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

    table: dict[str, dict[str, object]] = {k: {} for k in keys}
    for sf, sf_dir in SF_DIRS:
        if sf not in sf_names or not os.path.isdir(sf_dir):
            continue
        for key in keys:
            t0 = time.time()
            p = subprocess.run(
                [sys.executable, "-c", child_src, key, sf_dir, str(runs)],
                capture_output=True, text=True, env=env, timeout=3600,
            )
            rec: dict[str, object] = {"proc_s": round(time.time() - t0, 1)}
            for line in p.stdout.splitlines():
                if line.startswith("ISOLATED "):
                    rec.update(json.loads(line[len("ISOLATED "):]))
            if "walls" not in rec:
                rec["error"] = (p.stderr or p.stdout)[-400:]
            else:
                rec["best"] = min(rec["walls"])  # type: ignore[type-var]
            table[key][f"sf{sf}"] = rec
            print(f"sf{sf} {key}: {rec}", flush=True)
    result = {
        "discipline": (
            "one (key, sf) cell per fresh JVM, serialized; warmup once "
            "at sf0.01 in-child; best of N timed runs; "
            "SPARK_GRAFT_DRIVER_MEM=32g"
        ),
        "runs_per_cell": runs,
        "cells": table,
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"wrote": out_path, "keys": len(keys)}))


if __name__ == "__main__":
    main()
