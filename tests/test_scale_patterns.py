"""Scale-pattern guarantees: salted aggregation equals plain groupBy,
and bucketed tables join without a shuffle (Exchange-free plan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamforge_data_pipeline_spark.operators.skew import salted_count, salted_sum
from streamforge_data_pipeline_spark.session import load
from streamforge_data_pipeline_spark.sources.store import TableStore

from tests.conftest import SF_MED


def test_salted_agg_equals_plain(spark):
    ev = load(spark, SF_MED, "events")
    plain = {
        (r["event_type"], r["cnt"])
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    salted = {
        (r["event_type"], r["cnt"])
        for r in salted_count(ev, "event_type", F.col("event_id")).collect()
    }
    assert plain == salted

    s1 = {
        (r["event_type"], r["sum_value"])
        for r in ev.groupBy("event_type")
        .agg(F.sum(F.col("value").cast("decimal(28,10)")).cast("double").alias("sum_value"))
        .collect()
    }
    s2 = {
        (r["event_type"], r["sum_value"])
        for r in salted_sum(ev, "event_type", F.col("value"), F.col("event_id")).collect()
    }
    assert s1 == s2  # decimal path => exact equality despite re-ordering


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # warehouse.dir is static, set in get_session; tables here are
    # path-based under tmp_path and dropped at the end.
    store = TableStore(str(tmp_path / "store"))
    orders = load(spark, SF_MED, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    li = load(spark, SF_MED, "lineitem").select("l_orderkey", "l_quantity")

    t1 = store.write_bucketed(orders, "orders_b", "o_orderkey", buckets=8,
                              catalog_name="t_orders_b")
    t2 = store.write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "li_b", "o_orderkey",
        buckets=8, catalog_name="t_li_b"
    )
    a, b = spark.table(t1), spark.table(t2)

    # force the shuffle-join path so bucketing is what saves the Exchange
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_li_b")


def test_salted_join_equals_plain_join(spark):
    from streamforge_data_pipeline_spark.operators.skew import salted_join

    li = load(spark, SF_MED, "lineitem").select(
        "l_orderkey", "l_linenumber",
        F.col("l_suppkey").alias("s_suppkey"),
    )
    sup = load(spark, SF_MED, "supplier").select("s_suppkey", "s_name")

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        salted = salted_join(li, sup, on="s_suppkey", salt_buckets=8)
        plain = li.join(sup, "s_suppkey")
        assert salted.count() == plain.count()
        assert salted.exceptAll(plain).count() == 0
        assert plain.exceptAll(salted).count() == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_salted_join_left_keeps_unmatched(spark):
    from streamforge_data_pipeline_spark.operators.skew import salted_join

    big = spark.createDataFrame([(1, "x"), (2, "y")], "k long, v string")
    dim = spark.createDataFrame([(1, "d1")], "k long, d string")
    out = salted_join(big, dim, on="k", salt_buckets=4, how="left").collect()
    got = {r["k"]: r["d"] for r in out}
    assert got == {1: "d1", 2: None}


def test_corpus_mixture_layout_independent(spark):
    """The mixture sample must be identical no matter how the corpus is
    partitioned (salted-hash prefix, not df.sample): resharding a 100 TB
    corpus cannot change what gets trained on."""
    from streamforge_data_pipeline_spark.operators.text import corpus_mixture
    from streamforge_data_pipeline_spark.session import load

    from tests.conftest import SF_SMALL

    docs = load(spark, SF_SMALL, "documents")
    budgets = {f"src{i}": 1500 if i % 2 == 0 else 700 for i in range(50)}
    base = corpus_mixture(docs, budgets)
    reshard = corpus_mixture(docs.repartition(7, "lang"), budgets)
    assert base.count() > 0
    assert base.exceptAll(reshard).count() == 0
    assert reshard.exceptAll(base).count() == 0
    # budget respected per source
    from pyspark.sql import functions as F

    over = base.groupBy("source").agg(F.max("cum_tokens").alias("m")).join(
        spark.createDataFrame(budgets.items(), "source string, b long"), "source"
    ).filter(F.col("m") > F.col("b"))
    assert over.count() == 0


def test_heavy_hitters_sketch_matches_exact(spark):
    """Two-scan Misra-Gries profile == the full-groupBy profile on the
    events table (same rows, same counts, same shares)."""
    from streamforge_data_pipeline_spark.operators.skew import heavy_hitters_sketch
    from streamforge_data_pipeline_spark.registry import REGISTRY
    from tests.conftest import SF_SMALL

    exact = REGISTRY["heavy_hitters"].fn(spark, SF_SMALL).collect()
    from streamforge_data_pipeline_spark.session import load

    sketch = heavy_hitters_sketch(load(spark, SF_SMALL, "events")).collect()
    assert [tuple(r) for r in sketch] == [tuple(r) for r in exact]


def test_heavy_hitters_sketch_survives_tiny_capacity_on_skew(spark):
    """One planted hot key among a long uniform tail: even capacity=8
    summaries must carry the hot key through and the exact second pass
    must report its true count."""
    from pyspark.sql import functions as F

    from streamforge_data_pipeline_spark.operators.skew import heavy_hitters_sketch

    n_tail, hot_repeats = 5000, 4000
    df = (
        spark.range(n_tail).select(F.col("id").alias("user_id"))
        .union(spark.range(hot_repeats).select(F.lit(999_999).alias("user_id")))
        .repartition(8)
    )
    top = heavy_hitters_sketch(df, k=1, capacity=8).collect()
    assert top[0]["user_id"] == 999_999 and top[0]["n"] == hot_repeats


def test_heavy_hitters_sketch_auto_retries_to_provable_capacity(spark):
    """Near-uniform keys defeat the initial capacity; the operator must
    double capacity until the bound proves (8 * 1024 > 4096 here) and
    then return the exact top-k (counts all 8, lowest keys win the
    tie-break) — the sf1 events shape that motivated the retry."""
    from pyspark.sql import functions as F

    from streamforge_data_pipeline_spark.operators.skew import heavy_hitters_sketch

    df = spark.range(4096).select((F.col("id") % 512).alias("user_id"))
    rows = heavy_hitters_sketch(df, k=5, capacity=4).collect()
    assert [(r["user_id"], r["n"]) for r in rows] == [(i, 8) for i in range(5)]


def test_heavy_hitters_sketch_raises_when_bound_unprovable(spark):
    """Same corpus with the retry ceiling pinned below the provable
    capacity: the operator must refuse loudly rather than return a
    possibly-incomplete profile."""
    import pytest
    from pyspark.sql import functions as F

    from streamforge_data_pipeline_spark.operators.skew import heavy_hitters_sketch

    df = spark.range(4096).select((F.col("id") % 512).alias("user_id"))
    with pytest.raises(RuntimeError, match="guarantee violated"):
        heavy_hitters_sketch(df, k=5, capacity=4, max_capacity=16)


def test_heavy_hitters_sketch_string_key(spark):
    """The summary schema must carry the key's OWN type (r5 advice:
    a `long` hardcode crashed string keys): a string-keyed profile
    returns the exact top-k."""
    from pyspark.sql import functions as F

    from streamforge_data_pipeline_spark.operators.skew import heavy_hitters_sketch

    df = spark.range(900).select(
        F.concat(F.lit("k"), (F.col("id") % 3).cast("string")).alias("kind")
    )
    rows = heavy_hitters_sketch(df, key="kind", k=3, capacity=16).collect()
    assert [(r["kind"], r["n"]) for r in rows] == [("k0", 300), ("k1", 300), ("k2", 300)]


def test_heavy_hitters_sketch_short_result_only_when_complete(spark):
    """r5 advice: a result with fewer than k rows is acceptable ONLY
    when it provably contains every distinct key. With 3 distinct keys
    and k=10 the profile returns exactly 3 exact rows."""
    from pyspark.sql import functions as F

    from streamforge_data_pipeline_spark.operators.skew import heavy_hitters_sketch

    df = spark.range(600).select((F.col("id") % 3).alias("user_id"))
    rows = heavy_hitters_sketch(df, k=10, capacity=64).collect()
    assert [(r["user_id"], r["n"]) for r in rows] == [(0, 200), (1, 200), (2, 200)]


def test_stream_heavy_hitters_multibatch_mg_bound(spark, tmp_path):
    """Streaming bounded-state profiler (r7): across time-sliced
    micro-batches with capacity far below the key cardinality, the
    persisted summary must (a) never exceed capacity rows, (b) never
    OVER-count any key, (c) under-count by at most N/capacity, and
    (d) retain every key with share > 1/capacity — the Misra-Gries
    contract carried across batch merges."""
    import os
    import time

    from streamforge_data_pipeline_spark.sources.store import TableStore
    from streamforge_data_pipeline_spark.streaming.heavy_hitters_stream import (
        start_stream_heavy_hitters,
        top_k,
    )

    src = str(tmp_path / "hh_src")
    rows = []
    # 3 slices: a hot key (40% of traffic), a warm one, a long tail
    for s in range(3):
        slice_rows = (
            [(s * 1000 + i, 7) for i in range(200)]
            + [(s * 1000 + 500 + i, 11) for i in range(80)]
            + [(s * 1000 + 700 + i, 100 + s * 100 + i) for i in range(220)]
        )
        rows.append(slice_rows)
    for s, slice_rows in enumerate(rows):
        spark.createDataFrame(
            slice_rows, "event_id long, user_id long"
        ).coalesce(1).write.mode("append").parquet(src)
        if s < 2:
            time.sleep(1.1)

    store = TableStore(str(tmp_path / "hh_store"))
    capacity = 16  # far below the ~660 distinct keys
    q = start_stream_heavy_hitters(
        spark, src, store,
        checkpoint_dir=str(tmp_path / "hh_ckpt"),
        schema="event_id long, user_id long",
        key="user_id",
        capacity=capacity,
        max_files_per_trigger=1,
    )
    q.awaitTermination()

    summary = {
        r["user_id"]: r["mg"]
        for r in store.read(spark, "hh_summary").collect()
    }
    n_total = sum(len(s) for s in rows)
    true = {}
    for s in rows:
        for _eid, u in s:
            true[u] = true.get(u, 0) + 1
    assert len(summary) <= capacity
    for u, c in summary.items():
        assert c <= true[u], (u, c, true[u])
        assert true[u] - c <= n_total / capacity, (u, c, true[u])
    for u, c in true.items():
        if c > n_total / capacity:
            assert u in summary, (u, c)
    # the profile's head is right, with exact-denominator shares
    prof = top_k(spark, store, k=2).collect()
    assert [r["user_id"] for r in prof] == [7, 11]
    assert abs(prof[0]["share"] - 600 / n_total) < 0.01
