#!/usr/bin/env python
"""Dedup-family scaling probe: run the batch dedup/corpus-hygiene
operators at sf0.1 (driver testdata), sf1 and sf2 (datagen_star,
10x/20x the graded scale) and print per-key wall time + the observed
scaling ratio per data octave.

The point is the scaling EXPONENT, not the absolute second count: a
shape that is scan-bound should move ~linearly in input bytes; a
pair-emitting operator moves with its OUTPUT volume (near_dedup on the
30-word-vocabulary corpus is the documented quadratic-output case).

Usage: python scripts/bench_dedup_scaling.py [runs_per_cell] [sf_list]
Prints one JSON line (plus a per-cell progress line each). Generate
the inputs first — MULTI-FILE, because stage-1 whole-stage codegen
fuses scan -> tokenize -> explode -> partial agg, so a single-file
table pins all tokenization to the scan's 1-2 tasks and the probe
measures layout, not the operator:
  python -m streamforge_data_pipeline_spark.sources.datagen_star \
      --sf 1 --out /root/repo/.localdata/sf1mf --multi-file  (and sf2)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamforge_data_pipeline_spark.registry import REGISTRY  # noqa: E402
from streamforge_data_pipeline_spark.session import get_session  # noqa: E402

KEYS = [
    "exact_dedup",
    "line_dedup",
    "dup_ngram_fraction",
    "dup_span_removal",
    "winnow_overlap",
    "minhash_lsh_dedup",
    "near_dedup",
    "canonical_selection",
    # r6: the rest of the corpus family (r5 brief #6 — every corpus
    # key gets a per-octave exponent row, not just the r5.4 eight)
    "containment_dedup",
    "ngram_novelty",
    "tfidf_cosine_pairs",
    "bm25_topk",
    "quality_threshold_prune",
    "source_overlap",
    "ngram_lm_score",
    "vocab_coverage",
    "decontaminate",
    "semantic_dedup_cells",
    "pq_adc_seeded",
    "embedding_near_dup",
    # r6 late additions
    "simhash_near_dup",
    "fuzzy_dedup",
    "fuzzy_dedup_lsh",
    "containment_dedup_lsh",
    "snapshot_diff",
    # r7 (r6 brief #8): the 2026-era keys that lacked per-octave rows
    "asof_join_tolerance",
    "interval_join_spread",
    "stream_session_window",
    # r7 additions
    "ann_lsh_seeded",
    "stream_semantic_dedup_trained_seeded",
    "stream_interval_join_spread_outer",
    "stream_heavy_hitters",
    "stream_decontaminate",
    "minhash_estimate",
    "simhash_near_dup_radius6",
    # r8: the weak-mark fix — the ranking over the BLOCKED pair stream
    "pagerank_canonical_blocked",
    # r8: new families (per-octave rows per the round discipline)
    "domain_caps",
    "domain_share",
    "stream_domain_caps",
    "stream_domain_share",
    "triangle_counts",
    "pii_scrub_multi",
    "shard_manifest",
    "stream_shard_export",
    "quality_retention_curve",
    "embedding_norm_outliers",
    "curation_funnel",
    "decayed_event_counts",
    "source_mixture_weights",
    "stream_decayed_counts",
    "column_stats",
    "eval_split",
    # r10 streaming twins
    "stream_eval_split",
    "stream_column_stats",
    # r10 sequence packing
    "sequence_pack",
    "stream_sequence_pack",
]

# sf1 MUST be the multi-file layout (sf1mf): the single-file sf1 dir
# written for the DuckDB oracle sweeps caps every scan at ONE task, so
# probing it measures a parallelism artifact, not scaling (observed:
# sf1 cells slower than sf2 across the scan-bound keys).
SF_DIRS = [
    ("0.1", "/root/testdata/sf0.1"),
    ("1", "/root/repo/.localdata/sf1mf"),
    ("2", "/root/repo/.localdata/sf2"),
]


def main() -> None:
    global KEYS
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    # optional arg 2: comma-separated SF names to probe (e.g. "1" to
    # re-run one column after a layout fix)
    sf_filter = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    sf_dirs = [x for x in SF_DIRS if sf_filter is None or x[0] in sf_filter]
    # optional arg 3: comma-separated KEY filter (targeted re-measure
    # of a round's new/changed keys without the full 30-key run)
    if len(sys.argv) > 3:
        wanted = set(sys.argv[3].split(","))
        unknown = wanted - set(KEYS)
        if unknown:
            raise SystemExit(f"keys not in the probe set: {sorted(unknown)}")
        KEYS = [k for k in KEYS if k in wanted]
    spark = get_session("dedup-scaling")
    spark.sparkContext.setLogLevel("ERROR")

    # warm codegen/JIT once per key at sf0.01 (house rule: sf0.001 is
    # too small to reach C2 thresholds); per-key isolation here too —
    # one key failing warmup must not sink the whole probe
    for key in KEYS:
        try:
            REGISTRY[key].fn(spark, "/root/testdata/sf0.01").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception as e:  # noqa: BLE001
            print(f"warmup {key} FAILED: {type(e).__name__}", flush=True)
    spark.catalog.clearCache()

    table: dict[str, dict[str, float]] = {k: {} for k in KEYS}
    for sf, sf_dir in sf_dirs:
        if not os.path.isdir(sf_dir):
            print(f"skip sf{sf}: {sf_dir} missing", file=sys.stderr)
            continue
        for key in KEYS:
            best = float("inf")
            try:
                for _ in range(runs):
                    spark.catalog.clearCache()
                    t0 = time.time()
                    REGISTRY[key].fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    best = min(best, time.time() - t0)
            except Exception as e:  # noqa: BLE001 — record, keep probing
                # one key's failure (e.g. an executor OOM at the probe's
                # largest SF) must not sink the whole run's record; a
                # finite earlier repetition is still a real measurement.
                # None, not NaN: json.dumps(NaN) emits a token strict
                # JSON consumers reject — the one-JSON-line contract.
                if best != float("inf"):
                    table[key][sf] = round(best, 2)
                    print(
                        f"cell {key} sf{sf} {table[key][sf]}s"
                        f" (later rep FAILED: {type(e).__name__})",
                        flush=True,
                    )
                else:
                    print(f"cell {key} sf{sf} FAILED: {type(e).__name__}", flush=True)
                    table[key][sf] = None
                continue
            table[key][sf] = round(best, 2)
            # per-cell progress line: a crash mid-probe leaves the
            # completed cells on record instead of losing everything
            print(f"cell {key} sf{sf} {table[key][sf]}s", flush=True)
    ratios = {
        k: {
            "r_0.1_to_1": (
                round(v["1"] / v["0.1"], 2)
                if v.get("1") and v.get("0.1")
                else None
            ),
            "r_1_to_2": (
                round(v["2"] / v["1"], 2) if v.get("2") and v.get("1") else None
            ),
        }
        for k, v in table.items()
    }
    print(json.dumps({"wall_s": table, "ratios": ratios, "runs": runs}))


if __name__ == "__main__":
    main()
