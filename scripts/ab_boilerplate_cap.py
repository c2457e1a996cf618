#!/usr/bin/env python
"""Planted-skew A/B for the exact verifiers' candidate stage (r8
VERDICT #1/#7):

A. BOILERPLATE CAP — a corpus where every doc shares a license header
   (hot shingles with df = N) at two sizes: uncapped candidate volume
   grows ~4x per corpus doubling (the r8 weak-mark quadratic), with
   max_df="auto" the cap engages and the stage goes ~flat. This is
   the corpus class the cap targets; the DRIVER corpus measurably is
   not it (max df = 0.25% of docs at sf2 — see PERF_NOTES r9).

B. HOT-KEY SALTING — a Zipf-style shingle relation whose hottest key
   is under any df cap yet still owns a quadratic pair block: the
   plain self-join pins C(d,2) rows on one reducer (balance >> 1.5);
   _shared_counts(salt="auto") splits hot posting lists over R salt
   buckets (the salted_join recipe, self-join form) and the balance
   drops under ~1.5 with bit-identical output.

Prints one JSON line. Run on an idle host (timing discipline,
PERF_NOTES r2/r4).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from streamforge_data_pipeline_spark.operators import minhash as M  # noqa: E402
from streamforge_data_pipeline_spark.session import get_session  # noqa: E402

BOILER = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
    "eiusmod tempor incididunt ut labore"
)


def boiler_docs(spark, n):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(BOILER + " "),
            # unique payload: no cross-doc sharing outside the header
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit(f"u{j}x"), F.col("id").cast("string"))
                    for j in range(12)
                ],
            ),
        ).alias("text"),
    )


def timed(fn):
    t0 = time.monotonic()
    out = fn()
    return round(time.monotonic() - t0, 2), out


def part_balance(spark, pairs_df, n_parts=32):
    """max/mean join-output rows per shuffle partition, with AQE off
    so coalescing can't fold the skewed partition into the average."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        rows = (
            pairs_df.withColumn("__pid", F.spark_partition_id())
            .groupBy("__pid")
            .count()
            .collect()
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    counts = [r["count"] for r in rows] + [0] * (n_parts - len(rows))
    return round(max(counts) / (sum(counts) / len(counts)), 2)


def main():
    spark = get_session("ab-boilerplate-cap", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    out = {"cap_ab": {}, "salt_ab": {}}

    # --- A: the cap on a boilerplate corpus, two sizes -------------
    for n in (10000, 20000):
        docs = boiler_docs(spark, n).localCheckpoint(eager=True)
        uncapped, nu = timed(
            lambda: M.containment_pairs(
                docs, max_df=None, scheme="inverted", salt=None
            ).count()
        )
        capped, nc = timed(
            lambda: M.containment_pairs(
                docs, max_df="auto", scheme="inverted", salt=None
            ).count()
        )
        out["cap_ab"][str(n)] = {
            "uncapped_s": uncapped,
            "capped_s": capped,
            "uncapped_rows": nu,
            "capped_rows": nc,
        }
        print(f"cap_ab n={n}: uncapped {uncapped}s/{nu} rows, capped {capped}s/{nc} rows", flush=True)

    # --- B: hot-key salting on a Zipf shingle relation -------------
    # hottest key df=4000 (under a 10% cap), 60k unique-ish keys
    n_docs, hot_df = 60_000, 4_000
    sh = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("k"), F.col("id").cast("string")).alias("sh"),
        )
        .unionAll(
            spark.range(hot_df).select(
                F.col("id").alias("doc_id"), F.lit("HOT").alias("sh")
            )
        )
        .localCheckpoint(eager=True)
    )
    # pin the 100 TB regime: a corpus-scale shingle relation cannot
    # broadcast, so the self-join MUST shuffle — at this probe scale
    # Spark would otherwise broadcast the build side and hide the
    # reducer skew entirely
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    plain_s, plain = timed(lambda: M._shared_counts(sh).count())
    salted_s, salted = timed(lambda: M._shared_counts(sh, salt="auto").count())
    assert plain == salted, (plain, salted)
    # equality beyond counts: checksum of (doc_a, doc_b, inter)
    def chk(df):
        # decimal sum: 8M 64-bit hashes overflow a long under ANSI
        return df.agg(
            F.sum(F.xxhash64("doc_a", "doc_b", "inter").cast("decimal(38,0)")).alias("c")
        ).collect()[0]["c"]

    assert chk(M._shared_counts(sh)) == chk(M._shared_counts(sh, salt="auto"))

    # partition balance of the candidate join's pair stream, measured
    # on the same join shapes _shared_counts builds
    a, b = sh.alias("a"), sh.alias("b")
    plain_pairs = a.join(
        b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    # the operator's shape: ONLY hot posting lists replicated
    r = 512  # 16x the partition count — see _shared_counts' R rule
    hot_sh = sh.filter(F.col("sh") == "HOT")
    cold_sh = sh.filter(F.col("sh") != "HOT")
    cold_pairs = cold_sh.alias("a").join(
        cold_sh.alias("b"),
        (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    probe = hot_sh.withColumn("__salt", F.pmod(F.xxhash64("doc_id"), F.lit(r)))
    build = hot_sh.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(r - 1)))
    )
    salted_pairs = cold_pairs.select(
        F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
    ).unionAll(
        probe.alias("a")
        .join(
            build.alias("b"),
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.__salt") == F.col("b.__salt"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )
    out["salt_ab"] = {
        "plain_s": plain_s,
        "salted_s": salted_s,
        "pairs": plain,
        "balance_plain": part_balance(spark, plain_pairs),
        "balance_salted": part_balance(spark, salted_pairs),
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
