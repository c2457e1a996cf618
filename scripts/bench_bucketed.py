#!/usr/bin/env python
"""A/B bench: repeated lineitem⋈orders join, plain parquet vs bucketed layout.

Measures the amortization argument behind TableStore.write_bucketed
(sources/store.py): pay ONE layout shuffle at write time, then every
subsequent join on the bucket key runs with ZERO Exchange on either
side. At 100 TB the unbucketed path re-shuffles the fact table on
every query; the bucketed path never does.

Broadcast joins are disabled for the measurement because at real scale
NEITHER side of a fact⋈fact join fits in a broadcast — the shuffle
path is the one that exists at 100 TB, so it is the one we compare.

Prints one JSON line:
  {"sf_dir": ..., "iters": N, "plain_join_s": [...], "bucketed_join_s": [...],
   "bucket_write_s": ..., "plain_exchanges": N, "bucketed_exchanges": 0,
   "breakeven_joins": ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from streamforge_data_pipeline_spark.session import get_session, load  # noqa: E402
from streamforge_data_pipeline_spark.sources.store import TableStore  # noqa: E402

ITERS = 3
BUCKETS = 32


def _join_agg(a, b):
    # Revenue-per-order-priority: a real fact⋈fact rollup whose join is
    # the dominant cost (the agg output is tiny).
    return (
        a.join(b, "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(28,10)"
                )
            ).alias("revenue"),
            F.count("*").alias("n"),
        )
    )


def _run(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    # count shuffle exchanges only (broadcast is disabled anyway)
    return plan.count("Exchange hashpartitioning")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("bench-bucketed")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice", "l_discount"
    )

    # --- A: plain parquet, join shuffles both sides every time -------------
    plain = []
    for _ in range(ITERS):
        plain.append(_run(_join_agg(orders, li)))
    plain_ex = _exchanges(_join_agg(orders, li))

    # --- B: bucketed layout, one-time write then shuffle-free joins --------
    work = tempfile.mkdtemp(prefix="sfdp_bucketed_")
    store = TableStore(os.path.join(work, "store"))
    try:
        t0 = time.time()
        t1 = store.write_bucketed(
            orders, "orders_b", "o_orderkey", buckets=BUCKETS, catalog_name="bb_orders"
        )
        t2 = store.write_bucketed(
            li, "li_b", "o_orderkey", buckets=BUCKETS, catalog_name="bb_li"
        )
        write_s = round(time.time() - t0, 3)

        a, b = spark.table(t1), spark.table(t2)
        bucketed = []
        for _ in range(ITERS):
            bucketed.append(_run(_join_agg(a, b)))
        bucketed_ex = _exchanges(_join_agg(a, b))

        # sanity: identical results
        ra = {tuple(map(str, r)) for r in _join_agg(orders, li).collect()}
        rb = {tuple(map(str, r)) for r in _join_agg(a, b).collect()}
        assert ra == rb, "bucketed join changed the answer"

        saved = min(plain) - min(bucketed)
        breakeven = round(write_s / saved, 1) if saved > 0 else None
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "iters": ITERS,
                    "buckets": BUCKETS,
                    "plain_join_s": plain,
                    "bucketed_join_s": bucketed,
                    "bucket_write_s": write_s,
                    "plain_exchanges": plain_ex,
                    "bucketed_exchanges": bucketed_ex,
                    "breakeven_joins": breakeven,
                }
            )
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS bb_orders")
        spark.sql("DROP TABLE IF EXISTS bb_li")
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
