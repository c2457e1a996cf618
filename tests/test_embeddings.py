"""Embedding-pipeline kernels: normalize / int8 quantize properties."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F, types as T

from streamforge_data_pipeline_spark.operators.embeddings import (
    normalize_embeddings,
    quantize_embeddings,
)
from streamforge_data_pipeline_spark.session import load
from tests.conftest import SF_SMALL


VEC_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def test_normalize_unit_norm(spark):
    out = normalize_embeddings(load(spark, SF_SMALL, "embeddings"))
    norms = out.select(
        F.sqrt(
            F.aggregate("normalized", F.lit(0.0), lambda a, v: a + v * v)
        ).alias("n")
    ).collect()
    assert norms and all(abs(r["n"] - 1.0) < 1e-9 for r in norms)


def test_normalize_zero_vector_passthrough(spark):
    df = spark.createDataFrame([(1, [0.0] * 4), (2, [3.0, 4.0, 0.0, 0.0])], VEC_SCHEMA)
    rows = {r["vec_id"]: r for r in normalize_embeddings(df).collect()}
    assert rows[1]["norm"] == 0.0 and rows[1]["normalized"] == [0.0] * 4
    assert rows[2]["norm"] == pytest.approx(5.0)
    assert rows[2]["normalized"][0] == pytest.approx(0.6)


def test_quantize_roundtrip_error_bound(spark):
    src = load(spark, SF_SMALL, "embeddings")
    q = quantize_embeddings(src)
    joined = src.join(q, "vec_id").select("embedding", "q", "scale").collect()
    assert joined
    for r in joined:
        x = np.array(r["embedding"], dtype=np.float64)
        qv = np.array(r["q"], dtype=np.float64)
        assert r["scale"] > 0
        # |dequantized - x| <= half a quantization step, and saturation
        # bounds hold.
        assert np.abs(qv / r["scale"] - x).max() <= 0.5 / r["scale"] + 1e-12
        assert np.abs(qv).max() <= 127


def test_quantize_zero_vector(spark):
    df = spark.createDataFrame([(7, [0.0] * 8)], VEC_SCHEMA)
    row = quantize_embeddings(df).collect()[0]
    assert row["scale"] == 0.0 and row["q"] == [0] * 8


def test_pq_seeded_recall_vs_exact(spark):
    """The seeded (untrained) codebook trades recall for oracle
    determinism — it must still land most true neighbors after the
    exact shortlist rerank (shortlist=200 over a 500-vector corpus
    re-ranks ~40% of it)."""
    from pyspark.sql import functions as F

    from streamforge_data_pipeline_spark.operators.embeddings import pq_topk_seeded
    from streamforge_data_pipeline_spark.operators.similarity import topk_cosine
    from streamforge_data_pipeline_spark.session import load
    from tests.conftest import SF_MED

    vecs = load(spark, SF_MED, "embeddings")
    queries = vecs.filter(F.col("vec_id") < 5)
    exact = {(r["q_id"], r["vec_id"])
             for r in topk_cosine(vecs, queries, k=10).collect()}
    approx = {(r["q_id"], r["vec_id"])
              for r in pq_topk_seeded(vecs, queries, k=10).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"seeded-PQ recall too low: {recall:.2f}"


def test_pq_seeded_matches_trained_contract(spark):
    """Same output schema and determinism across two invocations."""
    from pyspark.sql import functions as F

    from streamforge_data_pipeline_spark.operators.embeddings import pq_topk_seeded
    from streamforge_data_pipeline_spark.session import load
    from tests.conftest import SF_SMALL

    vecs = load(spark, SF_SMALL, "embeddings")
    q = vecs.filter(F.col("vec_id") < 3)
    a = pq_topk_seeded(vecs, q, k=5, shortlist=50).collect()
    b = pq_topk_seeded(vecs, q, k=5, shortlist=50).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert a and set(a[0].asDict()) == {"q_id", "vec_id", "sim", "rank"}


def test_norm_outliers_flag_broken_encoders(spark):
    """Planted exploded (100x) and near-zero vectors are flagged;
    well-behaved unit-norm vectors are not; MAD resists masking (the
    two planted outliers don't shift the median the way they would a
    mean/stddev rule)."""
    import numpy as np
    from streamforge_data_pipeline_spark.operators.embeddings import (
        embedding_norm_outliers,
    )

    rng = np.random.default_rng(3)
    rows = []
    for i in range(40):  # healthy: norms ~ U(0.9, 1.1)
        v = rng.normal(size=8)
        v = v / np.linalg.norm(v) * rng.uniform(0.9, 1.1)
        rows.append((i, v.tolist()))
    rows.append((100, (np.ones(8) * 40.0).tolist()))   # exploded
    rows.append((101, (np.ones(8) * 1e-6).tolist()))   # collapsed
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in embedding_norm_outliers(df).collect()}
    assert out[100]["is_outlier"] and out[101]["is_outlier"]
    flagged = {v for v, r in out.items() if r["is_outlier"]}
    assert flagged == {100, 101}
