"""Bottom-k (KMV) sampling: mergeability, dedup, estimator accuracy."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from streamforge_data_pipeline_spark.operators.sampling import (
    bottomk_sample,
    kmv_distinct_estimate,
)
from streamforge_data_pipeline_spark.session import load
from streamforge_data_pipeline_spark.sources.store import TableStore
from streamforge_data_pipeline_spark.streaming.sample_stream import (
    read_sample,
    start_stream_bottomk_sample,
)

from tests.conftest import SF_SMALL


def test_stream_state_equals_batch_under_any_slicing(spark, tmp_path):
    """Bottom-k is exactly mergeable, so the 3-batch drained state must
    be BYTE-IDENTICAL to the batch operator over the union — the
    property that lets the multi-batch drain share the batch oracle."""
    docs = load(spark, SF_SMALL, "documents").select("doc_id", "text")
    src = str(tmp_path / "docs")
    # 3 separate files -> 3 micro-batches with maxFilesPerTrigger=1
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    store = TableStore(str(tmp_path / "store"))
    q = start_stream_bottomk_sample(
        spark, src, store, str(tmp_path / "ckpt"),
        schema=spark.read.parquet(src).schema, k=50,
    )
    q.awaitTermination()
    assert len([f for f in os.listdir(src) if f.endswith(".parquet")]) >= 3

    streamed = [(r["doc_id"], r["h"]) for r in read_sample(spark, store).collect()]
    batch = [
        (r["doc_id"], r["h"]) for r in bottomk_sample(docs, k=50).collect()
    ]
    assert streamed == batch and len(batch) == 50


def test_reoccurring_id_sampled_once(spark, tmp_path):
    """A key re-arriving in a later batch must not duplicate in the
    sample (union + dedup on id before the re-limit)."""
    src = str(tmp_path / "docs")
    d1 = spark.createDataFrame([(i, "a") for i in range(20)], "doc_id long, text string")
    d1.coalesce(1).write.mode("append").parquet(src)
    d1.coalesce(1).write.mode("append").parquet(src)  # same ids again
    store = TableStore(str(tmp_path / "store"))
    q = start_stream_bottomk_sample(
        spark, src, store, str(tmp_path / "ckpt"),
        schema=spark.read.parquet(src).schema, k=50,
    )
    q.awaitTermination()
    rows = read_sample(spark, store).collect()
    ids = [r["doc_id"] for r in rows]
    assert sorted(ids) == list(range(20)) and len(set(ids)) == len(ids)


def test_kmv_estimate_within_theory_bound(spark):
    """KMV relative error is ~1/sqrt(k-2); at k=256 that is ~6%, so a
    20% assertion has huge slack while still catching a broken
    estimator (off-by-2x range bugs, wrong hash width)."""
    ev = load(spark, SF_SMALL, "events")
    exact = ev.select("user_id").distinct().count()
    est = kmv_distinct_estimate(ev, k=256, id_col="user_id").collect()[0]
    if exact < 256:
        assert est["est_distinct"] == exact
    else:
        assert abs(est["est_distinct"] - exact) / exact < 0.2


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame([(i,) for i in range(37)], "user_id long")
    est = kmv_distinct_estimate(df, k=256, id_col="user_id").collect()[0]
    assert est["n_sample"] == 37 and est["est_distinct"] == 37

def test_per_stratum_bottomk_balanced_and_deterministic(spark):
    from streamforge_data_pipeline_spark.operators.sampling import (
        per_stratum_bottomk,
    )

    rows = [(i, "s%d" % (i % 3), "t") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = per_stratum_bottomk(df, stratum="source", k=5).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    assert set(by_src) == {"s0", "s1", "s2"}
    for src, rs in by_src.items():
        assert len(rs) == 5 and sorted(r["rk"] for r in rs) == [1, 2, 3, 4, 5]
        hs = [r["h"] for r in sorted(rs, key=lambda r: r["rk"])]
        assert hs == sorted(hs)  # rank follows hash order
    again = per_stratum_bottomk(df, stratum="source", k=5).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))

def test_assume_unique_identical_on_pk_input(spark):
    docs = load(spark, SF_SMALL, "documents")
    a = [tuple(r) for r in bottomk_sample(docs, k=40).collect()]
    b = [tuple(r) for r in bottomk_sample(docs, k=40, assume_unique=True).collect()]
    assert a == b


def test_shard_write_roundtrip_validates_against_manifest(spark, tmp_path):
    """Write the shards the manifest describes (partitioned by shard),
    re-derive the manifest from the WRITTEN data, and validate: counts
    and order-independent checksums match per shard; a corrupted shard
    (one doc dropped) fails its checksum."""
    from pyspark.sql import functions as F
    from streamforge_data_pipeline_spark.operators.sampling import (
        shard_assignment,
        shard_manifest,
    )
    from streamforge_data_pipeline_spark.functions import hash60
    from streamforge_data_pipeline_spark.session import load
    from streamforge_data_pipeline_spark.sources.store import TableStore
    from tests.conftest import SF_SMALL

    docs = load(spark, SF_SMALL, "documents").select("doc_id", "text")
    manifest = {r["shard"]: r for r in shard_manifest(docs, n_shards=8).collect()}
    store = TableStore(str(tmp_path / "store"))
    store.append_partitioned(shard_assignment(docs, 8), "shards", ["shard"])

    written = spark.read.parquet(store.path("shards"))
    rederived = {
        r["shard"]: r
        for r in written.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                hash60(F.col("doc_id").cast("string")).cast("decimal(38,0)")
            ).cast("decimal(38,0)").cast("string").alias("id_checksum"),
        )
        .collect()
    }
    assert set(rederived) == set(manifest)
    for s, m in manifest.items():
        assert rederived[s]["n_docs"] == m["n_docs"]
        assert rederived[s]["id_checksum"] == m["id_checksum"]

    # corruption detection: drop one doc from one shard
    some_shard = min(manifest)
    victim = written.filter(F.col("shard") == some_shard).limit(1).collect()[0]
    corrupted = written.filter(
        ~((F.col("shard") == some_shard) & (F.col("doc_id") == victim["doc_id"]))
    )
    bad = (
        corrupted.filter(F.col("shard") == some_shard)
        .agg(
            F.sum(
                hash60(F.col("doc_id").cast("string")).cast("decimal(38,0)")
            ).cast("decimal(38,0)").cast("string")
        )
        .collect()[0][0]
    )
    assert bad != manifest[some_shard]["id_checksum"]


def test_eval_split_exact_quotas_and_stability(spark):
    """Exact per-stratum quotas (never 'in expectation'), and adding
    docs to another stratum does not move an existing stratum's
    assignments — the property Bernoulli splits lack."""
    from streamforge_data_pipeline_spark.operators.sampling import (
        eval_split_assign,
    )
    from pyspark.sql import functions as F

    rows = [(i, "a" if i < 200 else "b") for i in range(350)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = eval_split_assign(df, k_val=20, k_test=30)
    counts = {(r["source"], r["split"]): r["n"] for r in
              out.groupBy("source", "split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts[("a", "val")] == 20 and counts[("a", "test")] == 30
    assert counts[("a", "train")] == 150
    assert counts[("b", "val")] == 20 and counts[("b", "test")] == 30
    # stability: add docs to stratum b only; stratum a unchanged
    more = spark.createDataFrame([(1000 + i, "b") for i in range(100)],
                                 "doc_id long, source string")
    out2 = eval_split_assign(df.unionByName(more), k_val=20, k_test=30)
    a1 = {(r["doc_id"], r["split"]) for r in out.filter("source='a'").collect()}
    a2 = {(r["doc_id"], r["split"]) for r in out2.filter("source='a'").collect()}
    assert a1 == a2
