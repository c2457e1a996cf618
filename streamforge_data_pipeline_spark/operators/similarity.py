"""Embedding similarity search (E3 + ANN scale path).

Embeddings are ArrayType(FloatType) columns (TESTDATA embeddings.vec
dim=64). Dot products run as zip_with/aggregate higher-order functions
in double precision — JVM-side, no Python. For oracle parity every
similarity is computed in double and rounded; ranking ties break on
vec_id so top-k is deterministic.

Scale shapes:
- brute-force top-k vs a small query set: broadcast the queries,
  per-partition partial top-k via the rank window — fine as the exact
  baseline / rerank stage.
- all-pairs near-dup: random-hyperplane LSH bucketing (sign sketch)
  turns O(n^2) into per-bucket joins; brute force within buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from streamforge_data_pipeline_spark.functions import cosine, hash60


def topk_cosine(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine vs each query row (broadcast the queries)."""
    q = F.broadcast(
        query.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    )
    sims = (
        vectors.crossJoin(q)
        .filter(F.col(id_col) != F.col("q_id"))
        .select(
            "q_id",
            F.col(id_col),
            F.round(cosine(F.col(vec_col), F.col("q_vec")), 4).alias("sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.col(id_col))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", id_col, "sim", "rank")
    )


def near_dup_pairs(
    vectors: DataFrame, tau: float, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """All pairs with cosine >= tau (exact, for baseline/verification)."""
    a = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    b = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    pairs = a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
    sim = cosine(F.col("v_a"), F.col("v_b"))
    return (
        pairs.select("id_a", "id_b", sim.alias("raw_sim"))
        .filter(F.col("raw_sim") >= tau)
        .select("id_a", "id_b", F.round("raw_sim", 4).alias("sim"))
    )


# --- ANN: random-hyperplane (sign) LSH ------------------------------------

def _hyperplane(plane: int, dim: int) -> Column:
    """Deterministic pseudo-random ±1 hyperplane from hash60(plane:d)."""
    return F.array(
        *[
            F.when(hash60(F.lit(f"hp:{plane}:{d}")) % 2 == 0, F.lit(1.0)).otherwise(
                F.lit(-1.0)
            )
            for d in range(dim)
        ]
    )


def lsh_bucket(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Sign-sketch bucket id: bit p = sign(<v, h_p>)."""
    acc = F.lit(0).cast("long")
    for p in range(n_planes):
        dot = F.aggregate(
            F.zip_with(vec, _hyperplane(p, dim), lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda a, v: a + v,
        )
        acc = acc + F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return acc


def ann_topk_lsh(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates = same LSH bucket as the query
    (multi-probe: exact bucket ∪ 1-bit-flip neighbors), then exact
    cosine rerank. Recall is tested against the brute-force baseline in
    tests/test_similarity.py."""
    bucketed = vectors.withColumn("bucket", lsh_bucket(F.col(vec_col), dim, n_planes))
    qb = query.withColumn("bucket", lsh_bucket(F.col(vec_col), dim, n_planes)).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"), "bucket"
    )
    # multi-probe: query bucket plus all 1-bit flips
    probes = qb.select(
        "q_id",
        "q_vec",
        F.explode(
            F.array(
                F.col("bucket"),
                *[F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)],
            )
        ).alias("bucket"),
    )
    cands = bucketed.join(F.broadcast(probes), "bucket").filter(
        F.col(id_col) != F.col("q_id")
    )
    sims = cands.select(
        "q_id", F.col(id_col), F.round(cosine(F.col(vec_col), F.col("q_vec")), 4).alias("sim")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.col(id_col))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", id_col, "sim", "rank")
    )
