#!/usr/bin/env python
"""Stated-recall measurement for containment_dedup_lsh (r9 VERDICT #1
"Done" criterion): run the exact key and the LSH twin on the same
corpus, report pair recall (twin ∩ exact / exact), value agreement on
the intersection, and both walls.

Usage: python scripts/recall_containment_lsh.py [sf_dir] [runs]
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
)
from streamforge_data_pipeline_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf1mf"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_session("containment-recall")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    def timed(fn):
        walls, out = [], None
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.time()
            out = {
                (r["doc_sub"], r["doc_sup"]): r["containment"]
                for r in fn(docs).collect()
            }
            walls.append(round(time.time() - t0, 2))
        return out, walls

    exact, exact_walls = timed(containment_pairs)
    twin, twin_walls = timed(containment_lsh_pairs)
    inter = set(exact) & set(twin)
    mismatched_vals = [
        k for k in inter if exact[k] != twin[k]
    ]
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "exact_pairs": len(exact),
                "twin_pairs": len(twin),
                "recall": round(len(inter) / len(exact), 6) if exact else 1.0,
                "missed": sorted(set(exact) - set(twin))[:10],
                "extra": len(set(twin) - set(exact)),
                "value_mismatches_on_intersection": len(mismatched_vals),
                "exact_walls": exact_walls,
                "twin_walls": twin_walls,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
