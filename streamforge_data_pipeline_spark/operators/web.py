"""Domain/host-keyed curation: URL normalization, per-domain document
caps, and per-domain share reports — the RefinedWeb/C4-style controls
a web-scale training pipeline applies so no single site dominates the
corpus (Penedo et al. 2023, arXiv:2306.01116 §3; Raffel et al. 2020,
arXiv:1910.10683 §2.2).

Scale design: host extraction is a pure Column expression (one narrow
map, whole-stage codegen, no UDF); the cap is one window rank
partitioned by domain — the same single-shuffle shape as
per-stratum bottom-k sampling, so a hot domain (the exact thing the
cap exists for) skews only its own partition group, and AQE's skew
handling applies; the share report is one hash aggregation whose
output is domain-cardinality-bounded (web corpora: ~10^7 domains for
~10^10 pages — always the small side of any join that follows).

Determinism (cross-engine): the cap ranks by (md5-derived hash60, id)
— the established samplers' contract — and the share divides two
exact integers in double precision and rounds to 4 dp, the proven
oracle recipe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from streamforge_data_pipeline_spark.functions import hash60


def normalized_host(url) -> "F.Column":
    """Registrable-host normalization as one Column expression:
    extract the authority's host (drop scheme, userinfo, port, path,
    query, fragment), lowercase it, and strip a leading ``www.`` —
    the canonicalization step before any per-domain accounting, so
    ``HTTPS://user:pw@WWW.Example.COM:8080/p?q`` and
    ``http://example.com/`` count as the same domain.

    Engine-side regexp (codegen'd, no UDF); the DuckDB oracle replays
    the identical RE2-compatible pattern, so the normalization itself
    is differential-checked.
    """
    col = url if not isinstance(url, str) else F.col(url)
    host = F.regexp_extract(
        F.lower(col), r"^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)", 1
    )
    return F.regexp_replace(host, r"^www\.", "")


def domain_caps(
    df: DataFrame,
    url_col: str = "url",
    k: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain document cap: keep at most ``k`` documents from each
    normalized domain, chosen deterministically by (hash60(id), id)
    rank within the domain — the C4/RefinedWeb anti-dominance rule as
    one window over the corpus. Returns (doc_id, domain, rk) for the
    survivors; rk is the document's deterministic rank within its
    domain, so downstream tighter caps are a filter, not a re-shuffle.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("domain").orderBy("h", id_col)
    return (
        df.select(
            F.col(id_col),
            normalized_host(url_col).alias("domain"),
            hash60(F.col(id_col).cast("string")).alias("h"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(id_col, "domain", F.col("rk").cast("int").alias("rk"))
    )


def domain_share(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain share report: (domain, n_docs, share) with share =
    round(n_docs / corpus_total, 4) — the monitoring table a pipeline
    reviews before choosing cap levels. One hash agg; the corpus total
    rides along as a 1-row broadcast scalar join (no second scan: the
    window-free form keeps the agg partial/map-side combinable)."""
    counts = (
        df.select(normalized_host(url_col).alias("domain"), F.col(id_col))
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    total = df.select(F.count(F.lit(1)).alias("__t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "domain",
            "n_docs",
            F.round(F.col("n_docs") / F.col("__t"), 4).alias("share"),
        )
    )
