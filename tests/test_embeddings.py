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
