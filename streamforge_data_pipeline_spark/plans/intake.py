"""Derived intake relation — the oracle-checkable ingest workload.

The reference's intake is an uploaded CSV (4 positional string
columns, FIXTURES.md F1). The correctness driver can only oracle-check
queries over the driver-provided parquet tables, so we *derive* an
intake-shaped relation deterministically from ``events`` — same
4-string-column shape, with every error class represented — using only
constructs with identical semantics in Spark and DuckDB (modular
arithmetic, FLOOR, strftime/date_format under a UTC session).

Error injection (deterministic by event_id):
  id   % 101 == 0 -> externalId whitespace     -> 'externalId empty'
  id   % 103 == 0 -> name empty                -> 'name empty'
  id   % 107 == 0 -> quantity 'lots'           -> 'quantity invalid'
  id   % 109 == 0 -> expiry '2026/01/01'       -> 'expiryDate invalid...'
  external_id = event_id % 4000 -> in-file duplicates (first-wins, J2)
  existing table = customers with c_custkey % 7 == 0 (broadcast anti, J1)

The real CSV path (arbitrary files) uses the same validate() operator —
exercised in tests/test_fixtures_csv.py on FIXTURES.md F1a/F1b files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from streamforge_data_pipeline_spark.operators.validate import validate
from streamforge_data_pipeline_spark.session import load


def intake(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    eid = F.col("event_id")
    return ev.select(
        eid.alias("row_id"),
        F.when(eid % 101 == 0, F.lit("   "))
        .otherwise((eid % 4000).cast("string"))
        .alias("externalId"),
        F.when(eid % 103 == 0, F.lit("")).otherwise(F.col("event_type")).alias("name"),
        F.when(eid % 107 == 0, F.lit("lots"))
        .otherwise(F.floor(F.col("value") * 100).cast("string"))
        .alias("quantity"),
        F.when(eid % 109 == 0, F.lit("2026/01/01"))
        .otherwise(F.date_format("ts", "yyyy-MM-dd"))
        .alias("expiryDate"),
    )


def existing_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 'already in the items table' key set (ItemRepository.java:16-17)."""
    return (
        load(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 7 == 0)
        .select(F.col("c_custkey").cast("string").alias("external_id"))
    )


def validated_intake(spark: SparkSession, sf_dir: str) -> DataFrame:
    return validate(intake(spark, sf_dir), existing_ids(spark, sf_dir), "row_id")


# ---------------------------------------------------------------------------
# DuckDB oracle text for the same relations. Any oracle query over the
# validated intake is "WITH <INTAKE_CTES> SELECT ...".
# ---------------------------------------------------------------------------

INTAKE_CTES = """
intake AS (
  SELECT event_id AS row_id,
         CASE WHEN event_id % 101 = 0 THEN '   '
              ELSE CAST(event_id % 4000 AS VARCHAR) END AS externalId,
         CASE WHEN event_id % 103 = 0 THEN '' ELSE event_type END AS name,
         CASE WHEN event_id % 107 = 0 THEN 'lots'
              ELSE CAST(CAST(FLOOR(value * 100) AS BIGINT) AS VARCHAR) END AS quantity,
         CASE WHEN event_id % 109 = 0 THEN '2026/01/01'
              ELSE strftime(ts, '%Y-%m-%d') END AS expiryDate
  FROM events
),
existing AS (
  SELECT CAST(c_custkey AS VARCHAR) AS external_id
  FROM customer WHERE c_custkey % 7 = 0
),
labeled AS (
  SELECT i.*,
         (e.external_id IS NOT NULL) AS in_existing,
         SUM(CASE WHEN trim(i.externalId) <> '' AND trim(i.name) <> ''
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY trim(i.externalId) ORDER BY i.row_id
                 ROWS UNBOUNDED PRECEDING) AS cum_claims
  FROM intake i LEFT JOIN existing e ON trim(i.externalId) = e.external_id
),
validated AS (
  SELECT row_id, externalId, name, quantity, expiryDate,
    CASE
      WHEN trim(externalId) = '' THEN 'externalId empty'
      WHEN trim(name) = '' THEN 'name empty'
      WHEN in_existing OR cum_claims > 1 THEN 'duplicate externalId'
      WHEN NOT regexp_matches(trim(quantity), '^[+-]?[0-9]{1,10}$')
           OR TRY_CAST(trim(quantity) AS INTEGER) IS NULL THEN 'quantity invalid'
      WHEN NOT regexp_matches(trim(expiryDate), '^[0-9]{4}-[0-9]{2}-[0-9]{2}$')
           OR try_strptime(trim(expiryDate), '%Y-%m-%d') IS NULL
           THEN 'expiryDate invalid (expected yyyy-MM-dd)'
    END AS error
  FROM labeled
)
"""
