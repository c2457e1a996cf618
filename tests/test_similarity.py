"""Similarity-search invariants that the SQL oracle can't express:
- the NumPy matmul kernel must agree with the exact sequential fold;
- sign-LSH ANN must hit high recall vs the exact top-k baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamforge_data_pipeline_spark.operators import similarity
from streamforge_data_pipeline_spark.session import load

from tests.conftest import SF_MED


def test_numpy_kernel_matches_exact_fold(spark):
    vecs = load(spark, SF_MED, "embeddings")
    exact = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in similarity.near_dup_pairs(vecs, tau=0.4).collect()
    }
    fast = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in similarity.near_dup_pairs_numpy(vecs, tau=0.4).collect()
    }
    assert exact.keys() == fast.keys()
    assert all(abs(exact[k] - fast[k]) < 1e-9 for k in exact)


def test_ann_lsh_recall(spark):
    vecs = load(spark, SF_MED, "embeddings")
    queries = vecs.filter(F.col("vec_id") < 20)
    exact = similarity.topk_cosine(vecs, queries, k=10)
    approx = similarity.ann_topk_lsh(vecs, queries, k=10)
    e = {(r["q_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["q_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # 16 tables x 3 planes: expected ~1-(1-p^3)^16 ≈ 0.97 at sim≈0.4
    assert recall >= 0.8, f"ANN recall too low: {recall:.2f}"
