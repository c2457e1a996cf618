#!/usr/bin/env python
"""Containment-family rho routing, measured (r10): recall of each
family member on PLANTED excerpt/superset pairs as the size ratio
rho = |sup|/|sub| grows — the regime the flat containment_dedup_lsh
banding states as out-of-scope beyond rho ~ 2.

Corpus: per-doc-unique vocabulary base docs (256 tokens) + contiguous
excerpts at rho in {1.5, 3, 6, 12} (c(sub->sup) = 1.0 by construction,
so every planted pair is exact-key truth at any tau; in shingle space
J = 1/rho exactly, which puts each bucket at a known point of the
32x2 banding curve: P = 1-(1-J^2)^32 = 1.0 / .975 / .595 / .199).

Methods:
  exact   containment_pairs      (truth; quadratic floor)
  lsh     containment_lsh_pairs  (flat 32x2 banding, the rho<=2 path)
  winnow  winnow_overlap         (passage fingerprints: shared /
                                  min(|fp|) is rho-INVARIANT — the
                                  extreme-asymmetry path, E14)

Usage: python scripts/recall_containment_rho.py [n_base] [per_bucket]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamforge_data_pipeline_spark.operators.minhash import (  # noqa: E402
    containment_lsh_pairs,
    containment_pairs,
    winnow_overlap,
)
from streamforge_data_pipeline_spark.session import get_session  # noqa: E402

RHOS = (1.5, 3.0, 6.0, 12.0)
BASE_LEN = 256


def build_rows(n_base: int, per_bucket: int):
    """(doc_id, text) rows: base docs 0..n_base-1; excerpt ids encode
    their bucket (10000*(1+bucket_idx) + m) and slice base doc m."""
    rows = []
    for i in range(n_base):
        rows.append((i, " ".join(f"d{i}w{j}" for j in range(BASE_LEN))))
    planted = {}  # (sub_id, sup_id) -> rho bucket
    for bi, rho in enumerate(RHOS):
        ln = round(BASE_LEN / rho)
        for m in range(per_bucket):
            base = m % n_base
            start = (m * 7) % (BASE_LEN - ln)
            sub_id = 10_000 * (bi + 1) + m
            rows.append(
                (sub_id, " ".join(f"d{base}w{j}" for j in range(start, start + ln)))
            )
            planted[(sub_id, base)] = rho
    return rows, planted


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    per_bucket = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    spark = get_session("containment-rho")
    spark.sparkContext.setLogLevel("ERROR")
    rows, planted = build_rows(n_base, per_bucket)
    df = spark.createDataFrame(rows, "doc_id long, text string").cache()
    df.count()

    def directional(out):
        # (sub, sup) orientation: containment keys emit doc_sub/doc_sup
        return {(r["doc_sub"], r["doc_sup"]) for r in out.collect()}

    report = {"n_base": n_base, "per_bucket": per_bucket, "methods": {}}
    t0 = time.time()
    exact = directional(containment_pairs(df, tau=0.8))
    t_exact = round(time.time() - t0, 2)
    t0 = time.time()
    lsh = directional(containment_lsh_pairs(df, tau=0.8))
    t_lsh = round(time.time() - t0, 2)
    t0 = time.time()
    win = {
        (r["doc_a"], r["doc_b"])
        for r in winnow_overlap(df, min_shared=2).collect()
    } | {
        (r["doc_b"], r["doc_a"])
        for r in winnow_overlap(df, min_shared=2).collect()
    }
    t_win = round(time.time() - t0, 2)

    for name, got, wall in (
        ("exact", exact, t_exact),
        ("lsh", lsh, t_lsh),
        ("winnow", win, t_win),
    ):
        per_rho = {}
        for rho in RHOS:
            bucket = {p for p, r in planted.items() if r == rho}
            per_rho[str(rho)] = round(
                len(bucket & got) / len(bucket), 4
            )
        report["methods"][name] = {
            "wall_s": wall,
            "recall_by_rho": per_rho,
            "pairs_total": len(got),
        }
    report["exact_equals_planted"] = exact == set(planted)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
