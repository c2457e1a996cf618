"""The curation pipeline end-to-end as ONE declarative plan: raw ->
exact dedup -> length gate -> repetition gate -> per-domain cap, with
funnel accounting (docs AND tokens surviving each stage) — the
headline report a corpus build publishes, and the composition proof
that the individual operators stack: each stage consumes exactly the
previous stage's survivor set inside a single Catalyst plan (no
intermediate materialization; the optimizer shares the scan and
pushes the stage-0 projection through all five aggregates).

Stage rules are the repo's established, oracle-checked components:
first-wins exact dedup (min id per content), the token-length floor,
the Gopher top-bigram repetition gate (operators.text.repetition_filter
rule), and the C4/RefinedWeb per-domain cap (operators.web.domain_caps
rank rule). The funnel emits one row per stage:
(stage, stage_name, n_docs, n_tokens).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from streamforge_data_pipeline_spark.functions import hash60, tokens
from streamforge_data_pipeline_spark.operators.text import repetition_filter
from streamforge_data_pipeline_spark.operators.web import normalized_host


def curation_funnel(
    docs: DataFrame,
    urls: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    min_toks: int = 10,
    max_bigram_frac: float = 0.18,
    k_domain: int = 20,
) -> DataFrame:
    """``urls`` is (doc_id, url); stages apply in pipeline order and
    each counts only the previous stage's survivors."""
    from pyspark.sql import Window

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text).alias("__text"),
        F.size(tokens(text)).cast("long").alias("__nt"),
    )

    # stage 1: exact content dedup, first (min id) wins
    keep1 = base.groupBy("__text").agg(F.min("doc_id").alias("doc_id"))
    s1 = base.join(keep1.select("doc_id"), "doc_id")

    # stage 2: token-length floor
    s2 = s1.filter(F.col("__nt") >= min_toks)

    # stage 3: Gopher top-bigram repetition gate over stage-2 survivors
    rep = repetition_filter(
        s2.select("doc_id", F.col("__text").alias("text")),
        max_top_bigram_frac=max_bigram_frac,
    )
    s3 = s2.join(rep.filter(~F.col("flagged")).select("doc_id"), "doc_id")

    # stage 4: per-domain cap over stage-3 survivors (domain_caps rule)
    dom = s3.join(urls, "doc_id").select(
        "doc_id",
        "__nt",
        normalized_host("url").alias("__dom"),
        hash60(F.col("doc_id").cast("string")).alias("__h"),
    )
    w = Window.partitionBy("__dom").orderBy("__h", "doc_id")
    s4 = (
        dom.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k_domain)
        .select("doc_id", "__nt")
    )

    def row(stage: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.coalesce(F.sum("__nt"), F.lit(0)).cast("long").alias("n_tokens"),
        ).select(
            F.lit(stage).cast("int").alias("stage"),
            F.lit(name).alias("stage_name"),
            "n_docs",
            "n_tokens",
        )

    return (
        row(0, "raw", base)
        .unionAll(row(1, "exact_dedup", s1))
        .unionAll(row(2, "length_gate", s2))
        .unionAll(row(3, "repetition_gate", s3))
        .unionAll(row(4, "domain_cap", s4))
    )
