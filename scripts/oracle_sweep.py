#!/usr/bin/env python
"""Full DuckDB oracle differential over every oracle-backed registry key.

Mirrors the driver's correctness gate (row count + schema + value hash)
at an arbitrary SF dir — the per-round driver check caps ~50 keys at
sf0.01; this sweeps ALL keys and is how scale correctness (sf1) is
evidenced.

Usage: python scripts/oracle_sweep.py [SF_DIR] [MAX_KEY_SECONDS] [KEYS]
KEYS (optional): comma-separated registry keys — restrict the sweep
(e.g. targeted sf1 re-verification of a round's new keys).
Prints one line per key and a final JSON summary. With a
MAX_KEY_SECONDS budget (recommended for sf1+: 900), a key whose
Spark job or DuckDB oracle exceeds it is cancelled and reported in a
separate "over_budget" list — NOT as a mismatch — because some
oracles are themselves super-linear SQL (recursive CTEs; the tf-idf
quadratic term join) that the differential can only afford at small
SF. Over-budget keys still have their sf0.01 oracle rows and their
operator-level scale evidence (PERF_NOTES).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamforge_data_pipeline_spark.registry import REGISTRY  # noqa: E402
from streamforge_data_pipeline_spark.session import get_session  # noqa: E402
from tests.utils import compare, duckdb_connection  # noqa: E402


def main() -> None:
    import threading

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    budget = float(sys.argv[2]) if len(sys.argv) > 2 else None
    spark = get_session("oracle-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_connection(sf_dir)
    keys = [k for k in REGISTRY if REGISTRY[k].oracle]
    if len(sys.argv) > 3:
        wanted = set(sys.argv[3].split(","))
        unknown = wanted - set(keys)
        if unknown:
            raise SystemExit(f"unknown/oracle-less keys: {sorted(unknown)}")
        keys = [k for k in keys if k in wanted]
    bad: list[tuple[str, str]] = []
    over: list[str] = []
    times: dict[str, float] = {}
    for k in keys:
        spark.catalog.clearCache()
        # fresh oracle connection PER KEY: DuckDB retains buffer-pool /
        # temp allocations on a connection across queries, so a run of
        # successful heavy recursive-CTE oracles starves a later key
        # that passes cleanly in isolation (observed at sf1 twice, at
        # two different memory limits). View setup costs milliseconds.
        try:
            con.close()
        except Exception:  # noqa: BLE001 — a resource-dead connection
            pass
        con = duckdb_connection(sf_dir)
        timer = None
        fired = threading.Event()
        if budget:
            # watchdog: cancel the Spark jobs AND interrupt DuckDB so
            # a super-linear key can't stall the whole sweep
            def _cancel():
                fired.set()
                spark.sparkContext.cancelAllJobs()
                try:
                    con.interrupt()
                except Exception:
                    pass

            timer = threading.Timer(budget, _cancel)
            timer.start()
        t0 = time.time()
        oracle_died = False
        try:
            ok, msg = compare(REGISTRY[k].fn(spark, sf_dir), con, REGISTRY[k].oracle)
        except Exception as e:  # noqa: BLE001 — sweep must report, not die
            ok, msg = False, f"EXC {type(e).__name__}: {e}"
            # a DuckDB-raised resource failure (its memory allocator or
            # temp-spill disk giving out under a super-linear ORACLE
            # plan) is a property of the oracle SQL, not an engine
            # mismatch — same epistemic class as over-budget. Only
            # duckdb's own exception types qualify; Spark-side failures
            # stay hard failures. IOException is narrowed to the
            # temp-spill/disk-space shapes (r5 advice): a missing or
            # corrupt parquet behind a lazy oracle view ALSO raises
            # IOException at query time, and that is a harness/data bug
            # that must FAIL, not skip.
            import duckdb

            _spill = any(
                s in str(e).lower()
                for s in ("temp", "disk", "no space", "out of space")
            )
            oracle_died = isinstance(e, duckdb.OutOfMemoryException) or (
                isinstance(e, duckdb.IOException) and _spill
            )
        finally:
            if timer is not None:
                timer.cancel()
        times[k] = round(time.time() - t0, 1)
        # only a key the WATCHDOG actually cancelled is over-budget; a
        # slow key that failed on its own merits is a real mismatch
        # (classifying by elapsed time alone would mask it)
        if not ok and fired.is_set():
            over.append(k)
            print(f"SKIP {k:28s} {times[k]:7.1f}s over budget ({budget:.0f}s)", flush=True)
            continue
        if not ok and oracle_died:
            over.append(k)
            print(
                f"SKIP {k:28s} {times[k]:7.1f}s oracle resource death: {msg[:120]}",
                flush=True,
            )
            continue  # next key gets a fresh connection at loop top
        print(f"{'ok ' if ok else 'FAIL'} {k:28s} {times[k]:7.1f}s {'' if ok else msg[:160]}", flush=True)
        if not ok:
            bad.append((k, msg[:300]))
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "keys": len(keys),
                "mismatches": len(bad),
                "bad": bad,
                "over_budget": over,
                "total_s": round(sum(times.values()), 1),
                "slowest": sorted(times.items(), key=lambda kv: -kv[1])[:8],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
