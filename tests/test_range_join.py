"""Binned range-join semantics + plan shape.

The point of range_join is turning an interval-containment theta join
(which Spark plans as BroadcastNestedLoopJoin) into a bucket equi-join
with a residual filter — same rows, hash-joinable plan.
"""

from streamforge_data_pipeline_spark.operators.joins import range_join


def _bands(spark):
    return spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 10.0, 25.0), ("wide", 25.0, 100.0)],
        "label string, lo double, hi double",
    )


def test_boundary_semantics(spark):
    probe = spark.createDataFrame(
        [(1, 0.0),    # at lo of a -> a
         (2, 9.99),   # inside a
         (3, 10.0),   # at hi of a == lo of b -> b only
         (4, 25.0),   # -> wide (spans multiple buckets at width 10)
         (5, 99.99),  # inside wide, last bucket
         (6, 100.0),  # at hi of wide -> no match
         (7, -1.0)],  # below all bands -> no match
        "id long, v double",
    )
    out = range_join(
        probe, _bands(spark), value_col="v", lo_col="lo", hi_col="hi", bucket_width=10.0
    )
    got = {r["id"]: r["label"] for r in out.collect()}
    assert got == {1: "a", 2: "a", 3: "b", 4: "wide", 5: "wide"}


def test_band_narrower_than_bucket(spark):
    bands = spark.createDataFrame(
        [("tiny", 3.0, 4.0)], "label string, lo double, hi double"
    )
    probe = spark.createDataFrame(
        [(1, 3.5), (2, 4.5)], "id long, v double"
    )
    out = range_join(probe, bands, "v", "lo", "hi", bucket_width=100.0)
    assert {r["id"] for r in out.collect()} == {1}


def test_no_nested_loop_join(spark):
    probe = spark.createDataFrame([(1, 5.0)], "id long, v double")
    out = range_join(probe, _bands(spark), "v", "lo", "hi", 10.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan
