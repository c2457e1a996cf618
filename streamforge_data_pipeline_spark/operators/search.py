"""BM25 ranked retrieval — the query-side of the inverted index.

The reference's search surface stops at lookups and the inverted-index
artifact (text.inverted_index); a training-data pipeline also needs
ranked retrieval over the corpus (e.g. pulling exemplar documents per
topic probe, or auditing what a decontamination query would match).
BM25 (Robertson/Sparck Jones; the Lucene practical variant with the
+1-smoothed idf) is the public standard.

Engine-portable by the house recipes: per-term contributions are
double arithmetic in a fixed order, folded to DECIMAL(28,10) so the
cross-term sum is exact and order-free, ranked on the ROUNDED score
with a doc_id tie-break, and ln()'s ulp slack is absorbed by the
10-dp decimal cast (same argument as ngram_lm_score's 4-dp floor
recipe — a 1-ulp idf difference is ~1e-16 relative, far below the
cast's quantum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from streamforge_data_pipeline_spark.functions import fan_out, local_rows, tokens

# Fixed probe queries over the synthetic corpus vocabulary — literal,
# so the operator (and its SQL oracle) is fully deterministic.
DEFAULT_QUERIES: tuple[tuple[int, str], ...] = (
    (1, "spark hash join"),
    (2, "table scan fast"),
    (3, "sort merge batch window"),
)

K1 = 1.2
B = 0.75
# (k1 + 1) as a PARSED literal, not a Python-computed sum: 1.2 + 1.0
# rounds differently from the decimal literal 2.2 in the last ulp, and
# the SQL oracle can only write the literal.
K1P1 = 2.2
ONE_MINUS_B = 0.25


def bm25_topk(df: DataFrame, id_col: str = "doc_id", text: str = "text",
              queries: tuple[tuple[int, str], ...] = DEFAULT_QUERIES,
              k: int = 5) -> DataFrame:
    """Top-k documents per query by BM25.

    score(q, d) = sum over distinct query terms t of
        idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
    with idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1).

    Emits (query_id, rank, doc_id, score); rank is row_number() over
    (score desc, doc_id asc) on the rounded score — score ties get
    DISTINCT consecutive ranks via the doc_id tie-break, not
    dense_rank tie semantics.

    Scale notes: the query-term relation is a literal handful of rows
    — broadcast it, so the only corpus-wide work is the (doc, term)
    tf counts for MATCHING terms (the broadcast semi-filter runs
    before the groupBy, so the agg shuffles query-matched postings,
    not the whole term stream); doc length is a row-local size(), and
    N/avgdl ride along as a broadcast 1-row aggregate, never a
    collect. Per-query top-k is the PLAIN row_number window — not a
    hand-rolled shard/re-rank two-phase — because Catalyst's
    rank-limit pushdown (WindowGroupLimit, SPARK-37099) already
    inserts a PARTIAL per-map-partition top-k below the exchange: a
    query matching the whole corpus ships at most k rows per input
    partition to the single per-query reducer, which is exactly what
    the manual two-phase would buy, minus its second shuffle. The
    plan-shape test locks the Partial WindowGroupLimit in.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    qterms = (
        local_rows(spark, 
            [(qid, t) for qid, qs in queries for t in sorted(set(qs.split()))],
            "query_id int, term string",
        )
    )

    # Materialize the token array in its own projection BEFORE the
    # explode: referencing size(tokens(text)) as a sibling of
    # explode(tokens(text)) re-evaluates the regex tokenizer once per
    # OUTPUT row (per token — measured 3.4 s of a 4.2 s sf0.1 run);
    # against a named array column both size() and explode() are
    # per-input-row references.
    base = fan_out(df).select(F.col(id_col).alias("doc_id"), tokens(text).alias("__ts"))
    tok = base.select(
        "doc_id", F.size("__ts").alias("dl"), F.explode("__ts").alias("term")
    )
    # corpus scalars: N and avgdl (exact: bigint sum / bigint count)
    stats = df.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens(text))).alias("sum_dl"),
    )
    # document frequency per query term (distinct docs containing it)
    dfreq = (
        tok.join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    # term frequency per (doc, term) for matching terms only
    tf = (
        tok.join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    contrib = idf * (
        F.col("tf") * F.lit(K1P1)
        / (
            F.col("tf")
            + F.lit(K1)
            * (F.lit(ONE_MINUS_B) + F.lit(B) * F.col("dl").cast("double") / avgdl)
        )
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.sum(contrib.cast("decimal(28,10)")).alias("__s"))
        .select(
            "query_id",
            "doc_id",
            F.round(F.col("__s"), 4).cast("double").alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
