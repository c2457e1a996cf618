"""Similarity-search invariants that the SQL oracle can't express:
- the NumPy matmul kernel must agree with the exact sequential fold;
- sign-LSH ANN must hit high recall vs the exact top-k baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamforge_data_pipeline_spark.operators import similarity
from streamforge_data_pipeline_spark.session import load

from tests.conftest import SF_MED, SF_SMALL


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


def test_ann_ivf_recall(spark):
    vecs = load(spark, SF_MED, "embeddings")
    queries = vecs.filter(F.col("vec_id") < 20)
    exact = similarity.topk_cosine(vecs, queries, k=10)
    approx = similarity.ann_topk_ivf(vecs, queries, k=10, n_cells=16, nprobe=6)
    e = {(r["q_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["q_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.6, f"IVF recall too low: {recall:.2f}"


def test_ivf_assign_deterministic(spark):
    import numpy as np

    vecs = load(spark, SF_SMALL, "embeddings")
    cents = similarity.kmeans_centroids(vecs, n_clusters=8, iters=3)
    a1 = sorted(map(tuple, similarity.ivf_assign(vecs, cents).collect()))
    a2 = sorted(map(tuple, similarity.ivf_assign(vecs, cents).collect()))
    assert a1 == a2
    cells = {c for _, c in a1}
    assert cells <= set(range(8)) and len(cells) > 1
