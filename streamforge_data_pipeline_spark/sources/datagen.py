"""Synthetic intake data generator (S8).

Reference: service/CsvGenerator.java:18-67 — sequential 10-digit ids
from 1000000000, name 'Item_<1..999>', quantity 1..9999, expiry
today+1..364d, sized by ~43 B/row to a byte target.

Spark-first: ``spark.range(n)`` + column expressions (fully
distributed, no driver loop). Randomness is replaced by deterministic
multiplicative-congruential mixing so the generator is reproducible
and oracle-checkable in any engine (the reference used
ThreadLocalRandom purely for variety, not for distributional
guarantees). Dates anchor at a fixed epoch instead of now() so reruns
are stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

ROW_BYTES = 43          # CsvGenerator.java:25
DEFAULT_ROWS = 100_000  # scaled-down default; 50 MB target -> 1_219_276
EPOCH = "2026-01-01"

# Knuth/Lehmer-style multipliers; products stay < 2^62 for any row id
# below ~3.4e9 so no bigint overflow in Spark (ANSI) or DuckDB.
_A_NAME, _A_QTY, _A_DATE = 2_654_435_761, 48_271, 69_621


def generate_intake(spark: SparkSession, n_rows: int = DEFAULT_ROWS) -> DataFrame:
    i = F.col("id")
    return spark.range(n_rows).select(
        (F.lit(1_000_000_000) + i).cast("string").alias("external_id"),
        F.concat(F.lit("Item_"), (1 + (i * _A_NAME) % 999).cast("string")).alias("name"),
        (1 + (i * _A_QTY) % 9999).cast("int").alias("quantity"),
        F.date_format(
            F.date_add(F.to_date(F.lit(EPOCH)), (1 + (i * _A_DATE) % 364).cast("int")),
            "yyyy-MM-dd",
        ).alias("expiry_date"),
    )


def rows_for_bytes(target_bytes: int) -> int:
    """CsvGenerator.java:28 — linesToWrite = target / estimated row len."""
    return target_bytes // ROW_BYTES


def write_csv(df: DataFrame, path: str, partitions: int | None = None) -> None:
    out = df.repartition(partitions) if partitions else df
    out.write.mode("overwrite").option("header", True).csv(path)
