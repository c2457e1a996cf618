"""Deterministic sampling operators.

`df.sample()` is seed-dependent across partitionings and Spark
versions, which makes results unreproducible exactly when a 100 TB
curation run needs an audit trail. These samplers hash a stable key
instead: the same row always makes the same in/out decision, on any
cluster layout, in any engine — so the DuckDB oracle checks them
exactly and reruns are idempotent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from streamforge_data_pipeline_spark.functions import hash60, sql_hash60

BUCKETS = 10_000


def _bucket(key: Column) -> Column:
    return hash60(key.cast("string")) % BUCKETS


def stratified_sample(
    df: DataFrame, key: str, stratum: str, rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep a per-stratum fraction of rows, chosen by key-hash bucket.

    ``rates`` maps stratum value -> fraction in [0, 1]; strata not
    listed fall back to ``default_rate``. Pure narrow filter — no
    shuffle, no state, fully pushed into the scan stage; at 100 TB
    this is the only sampler shape that costs nothing beyond the scan.
    """
    thresh = F.lit(int(default_rate * BUCKETS))
    for value, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(stratum) == value, F.lit(int(rate * BUCKETS))
        ).otherwise(thresh)
    return df.filter(_bucket(F.col(key)) < thresh)


def sql_stratified_sample(
    table: str, key: str, stratum: str, rates: dict[str, float],
    default_rate: float = 0.0,
) -> str:
    """DuckDB mirror of :func:`stratified_sample` (WHERE clause text)."""
    cases = " ".join(
        f"WHEN {stratum} = '{v}' THEN {int(r * BUCKETS)}"
        for v, r in sorted(rates.items())
    )
    return (
        f"{sql_hash60(f'CAST({key} AS VARCHAR)')} % {BUCKETS} "
        f"< (CASE {cases} ELSE {int(default_rate * BUCKETS)} END)"
    )
