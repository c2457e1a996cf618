#!/usr/bin/env python
"""A/B of `index_buckets="auto"` (r6 brief #5) in BOTH regimes at sf1:

- trickle regime: the sf1 documents restaged as many small files,
  drained 1 file/trigger (~500 distinct docs/batch);
- bulk regime: the stock multi-file layout drained 3 files/trigger
  (~4.7k distinct docs/batch > AUTO_BULK_K).

Each regime runs flat, forced-bucketed(4096), and auto, asserting
identical decision logs and reporting steady per-batch resolve means.
THE MEASUREMENT THAT FIXED THE POLICY: at sf1 index sizes flat wins
BOTH regimes (trickle: flat 1.05 s/batch vs bucketed ~10 s; bulk:
0.81 s vs 36.3 s) because the per-batch small-file appends dwarf the
near-free flat probe — so auto starts flat and only migrates to
bucketed once the measured on-disk index crosses AUTO_MIGRATE_BYTES.
A fourth scenario forces that migration (auto_migrate_bytes=1) and
asserts the migrated index keeps pruned probes and identical logs.

Usage: python scripts/ab_auto_index_layout.py [SF_DIR] [TRICKLE_FILES] [TRICKLE_CAP]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from streamforge_data_pipeline_spark.session import get_session  # noqa: E402
from soak_exact_dedup_sf1 import run_mode  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf1mf"
    trickle_files = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    # cap the trickle drain to its first N files so the regime evidence
    # (per-batch means + probe file counts) doesn't cost a 100-batch run
    trickle_cap = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    spark = get_session("ab-auto-layout")
    spark.sparkContext.setLogLevel("ERROR")

    src_bulk = os.path.join(sf_dir, "documents.parquet")
    stage = tempfile.mkdtemp(prefix="sfdp_ab_auto_")
    out: dict = {"sf_dir": sf_dir, "trickle_files": trickle_files,
                 "trickle_cap_files": trickle_cap}
    try:
        # --- trickle staging: same corpus, many small files, then keep
        # only the first trickle_cap files (sorted) for the drain
        full = os.path.join(stage, "docs_many")
        spark.read.parquet(src_bulk).repartition(trickle_files).write.parquet(full)
        src_trickle = os.path.join(stage, "docs_trickle")
        os.makedirs(src_trickle)
        kept = sorted(
            f for f in os.listdir(full) if f.endswith(".parquet")
        )[:trickle_cap]
        for f in kept:
            shutil.copy(os.path.join(full, f), os.path.join(src_trickle, f))

        for regime, src, fpt, modes in [
            ("trickle", src_trickle, 1, [None, 4096, "auto"]),
            ("bulk", src_bulk, 3, [None, 4096, "auto"]),
            # forced early migration: auto flips to bucketed mid-stream
            ("trickle_migrated", src_trickle, 1, [None, "auto"]),
        ]:
            logs = {}
            for mode in modes:
                label = "flat" if mode is None else str(mode)
                print(f"{regime} / {label}:", flush=True)
                batches, decided, total, rows = run_mode(
                    spark, src, mode, files_per_trigger=fpt,
                    auto_migrate_bytes=(
                        1 if regime == "trickle_migrated" and mode == "auto"
                        else None
                    ),
                )
                assert decided == total, (regime, label)
                logs[label] = rows
                steady = [b["resolve_s"] for b in batches[1:]] or [
                    b["resolve_s"] for b in batches
                ]
                out[f"{regime}_{label}_steady_mean_s"] = round(
                    sum(steady) / len(steady), 2
                )
                out[f"{regime}_{label}_probe_files_last"] = (
                    batches[-1]["idx_files_probe"],
                    batches[-1]["idx_files_total"],
                )
            vals = list(logs.values())
            assert all(v == vals[0] for v in vals), f"{regime}: logs differ"
            out[f"{regime}_logs_identical"] = True
        # at sf1 sizes auto stays FLAT in both regimes (the measured
        # winner); the forced-migration scenario must end bucketed
        # with a pruned probe
        pf, tf = out["trickle_auto_probe_files_last"]
        assert pf == tf, (pf, tf)
        pf, tf = out["trickle_migrated_auto_probe_files_last"]
        assert pf < tf, (pf, tf)
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
