#!/usr/bin/env python
"""A/B: naive shared-shingle Jaccard join vs prefix-filtered AllPairs,
on a Zipf-vocabulary corpus (the realistic regime) and on the bench
corpus (30-word vocabulary, the adversarial-for-prefix regime).

Records the corpus-statistic-driven algorithm choice documented in
registry.q_near_dedup: naive wins when shingle df is uniformly high
(candidate volume is an output property), prefix filtering wins when
the df distribution has a rare tail.

Usage: python scripts/bench_allpairs_zipf.py [n_docs]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from streamforge_data_pipeline_spark.operators import minhash as M  # noqa: E402
from streamforge_data_pipeline_spark.session import get_session, load  # noqa: E402
from streamforge_data_pipeline_spark.sources.datagen_star import (  # noqa: E402
    gen_documents_zipf,
)

TAU = 0.5


def naive_pairs(docs):
    sh = M.shingles(docs).persist()
    inter = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    j = (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
    )
    return j.filter(F.col("jaccard") >= TAU).select(
        "doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard")
    )


def timed(df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    spark = get_session("bench-allpairs")
    spark.sparkContext.setLogLevel("ERROR")

    out = {"n_docs": n_docs, "tau": TAU}

    # materialize the corpus once so generation cost stays out of timings
    zipf = gen_documents_zipf(spark, n_docs).persist()
    zipf.count()
    out["zipf_naive_s"] = timed(naive_pairs(zipf))
    spark.catalog.clearCache()
    zipf = gen_documents_zipf(spark, n_docs).persist()
    zipf.count()
    out["zipf_allpairs_s"] = timed(M.allpairs_jaccard(zipf, tau=TAU))
    # equality spot check (exactness is also pytest-asserted)
    a = {tuple(r) for r in naive_pairs(zipf).collect()}
    b = {tuple(r) for r in M.allpairs_jaccard(zipf, tau=TAU).collect()}
    assert a == b, f"mismatch: {len(a)} vs {len(b)}"
    out["zipf_pairs"] = len(a)
    spark.catalog.clearCache()

    bench_docs = load(spark, "/root/testdata/sf0.1", "documents")
    out["bench_naive_s"] = timed(naive_pairs(bench_docs))
    spark.catalog.clearCache()
    out["bench_allpairs_s"] = timed(M.allpairs_jaccard(bench_docs, tau=TAU))

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
