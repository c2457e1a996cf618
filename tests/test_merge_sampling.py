"""SCD2 merge branch semantics + deterministic sampler invariants."""

from datetime import datetime

from pyspark.sql import functions as F

from streamforge_data_pipeline_spark.operators.merge import scd2_apply
from streamforge_data_pipeline_spark.operators.sampling import stratified_sample

T0 = datetime(2020, 1, 1)
EFF = datetime(2021, 6, 1)


def _current(spark):
    return spark.createDataFrame(
        [(1, "A", 10.0, T0, None, True),
         (2, "B", 20.0, T0, None, True),
         (3, "C", 30.0, T0, None, True)],
        "k long, seg string, bal double, valid_from timestamp, "
        "valid_to timestamp, is_current boolean",
    )


def test_scd2_branches(spark):
    updates = spark.createDataFrame(
        [(1, "A", 11.0, EFF),   # changed -> close + open
         (2, "B", 20.0, EFF),   # unchanged -> passthrough
         (9, "Z", 99.0, EFF)],  # new key -> open
        "k long, seg string, bal double, eff_ts timestamp",
    )
    out = scd2_apply(_current(spark), updates, key="k", attrs=["seg", "bal"])
    rows = {(r["k"], r["is_current"]): r for r in out.collect()}
    assert len(rows) == 5
    # k=1: closed historical row + new open row
    assert rows[(1, False)]["valid_to"] == EFF
    assert rows[(1, False)]["bal"] == 10.0
    assert rows[(1, True)]["bal"] == 11.0 and rows[(1, True)]["valid_from"] == EFF
    # k=2 unchanged, k=3 untouched: original open rows survive
    assert rows[(2, True)]["valid_from"] == T0
    assert rows[(3, True)]["valid_to"] is None
    # k=9 inserted as open
    assert rows[(9, True)]["valid_from"] == EFF and rows[(9, True)]["bal"] == 99.0


def test_scd2_open_rows_unique_per_key(spark):
    updates = spark.createDataFrame(
        [(1, "A", 11.0, EFF)], "k long, seg string, bal double, eff_ts timestamp"
    )
    out = scd2_apply(_current(spark), updates, key="k", attrs=["seg", "bal"])
    open_per_key = (
        out.filter("is_current").groupBy("k").count().filter("count > 1").count()
    )
    assert open_per_key == 0


def test_stratified_sample_deterministic_and_partition_invariant(spark):
    df = spark.range(0, 5000).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("s"),
    )
    rates = {"0": 1.0, "1": 0.2}
    a = stratified_sample(df, "k", "s", rates)
    b = stratified_sample(df.repartition(17), "k", "s", rates)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0
    # stratum "0" keeps everything, unlisted stratum "2" drops everything
    got = {r["s"]: r["n"] for r in
           a.groupBy("s").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got["0"] == df.filter("s = '0'").count()
    assert "2" not in got
    # listed fraction lands near its rate (hash uniformity, wide tolerance)
    n1 = got["1"] / df.filter("s = '1'").count()
    assert 0.1 < n1 < 0.3


def test_check_rows_null_counts_as_violation(spark):
    from pyspark.sql import functions as F

    from streamforge_data_pipeline_spark.operators.expectations import check_rows

    df = spark.createDataFrame([(1,), (None,), (-2,)], "v int")
    out = {r["rule"]: r["n_violations"] for r in
           check_rows(df, {"v_positive": ~(F.col("v") > 0)}).collect()}
    # -2 violates outright; NULL can't satisfy the expectation either
    assert out == {"v_positive": 2}


def test_snapshot_diff_classifies_all_change_kinds(spark):
    from streamforge_data_pipeline_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(2, "beta"), (3, "gamma v2"), (4, "delta")], "doc_id long, text string"
    )
    got = {(r["doc_id"], r["change"]) for r in snapshot_diff(old, new).collect()}
    # doc 2 unchanged -> omitted
    assert got == {(1, "removed"), (3, "modified"), (4, "added")}


def test_snapshot_diff_identical_snapshots_empty(spark):
    from streamforge_data_pipeline_spark.operators.merge import snapshot_diff

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    assert snapshot_diff(docs, docs).count() == 0


def test_snapshot_diff_null_content_semantics(spark):
    """NULL content must not masquerade as absence: presence comes
    from per-side markers, modification from a NULL-SAFE hash compare
    (NULL -> NULL unchanged, NULL <-> text modified)."""
    from streamforge_data_pipeline_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, None), (2, "b"), (3, None), (4, "same")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "x"), (2, None), (3, None), (4, "same"), (5, None)],
        "doc_id long, text string",
    )
    got = {(r["doc_id"], r["change"]) for r in snapshot_diff(old, new).collect()}
    assert got == {(1, "modified"), (2, "modified"), (5, "added")}
