"""CSV intake source (S1/S2/S9) — reference parity.

Reference: streaming univocity parse with header extraction
(BackgroundCsvProcessor.java:74-83,132,181) and a pre-pass line count
for the progress denominator (:44-51,64-73). Spark-first: one
declarative scan with an explicit all-string schema (schemas.py —
read-as-string, promote-on-validate), and ``df.count()`` for the
denominator (no second hand-written pass; Spark's count is a
column-pruned scan).

Row ordering: the reference's dedup is file-order dependent (SURVEY
§7). CSV splits don't guarantee order across partitions, so the intake
scan materializes a stable per-row ordinal from the file offset — this
is exactly what a 1000-executor run needs too (the ordinal is derived
from (file, offset), not from a driver-side counter).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from streamforge_data_pipeline_spark.schemas import INTAKE_SCHEMA

# PERMISSIVE-mode malformed-row capture: Spark treats a CSV row whose
# token count differs from the 4-column schema as malformed and stores
# the raw line here (parsed prefix cells are kept — partial results).
# validate() uses it to recover the reference's TRUE arity semantics
# (univocity row.length < 4 -> 'too few columns',
# BackgroundCsvProcessor.java:227): a 3-cell row must be an arity
# reject, not an 'expiryDate invalid' one.
CORRUPT_COL = "_corrupt_record"


def read_intake_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1: header-extracted CSV scan -> 4 string columns + row order.

    ``row_id`` is ``monotonically_increasing_id`` ((partition_id<<33)
    + offset). Spark packs splits by SIZE (descending), not listing
    order, so row_id alone is not file-ordered across multiple files;
    ``__src_file`` disambiguates. The dedup order key is
    :func:`intake_order` = (file name, row_id): within one file,
    equal-size splits keep offset order under Spark's stable sort and
    the smaller tail split sorts last, so the pair is offset-monotone
    per file; across files, lexicographic file name is the documented
    convention (the reference only ever ingests a single file).
    """
    df = (
        # StructType.add mutates in place — build a fresh copy.
        spark.read.schema(
            T.StructType(
                [*INTAKE_SCHEMA.fields, T.StructField(CORRUPT_COL, T.StringType())]
            )
        )
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        # univocity-default quoting parity ('"' quote, '""' escape —
        # the reference's parser settings): Spark's default escape is
        # backslash, which would mis-parse RFC-4180 '""' escapes
        .option("escape", '"')
        .csv(path)
    )
    return df.withColumn("row_id", F.monotonically_increasing_id()).withColumn(
        "__src_file", F.input_file_name()
    )


def intake_order() -> Column:
    """Stable total-order key for order-dependent dedup (SURVEY §7)."""
    return F.struct(F.col("__src_file"), F.col("row_id"))


def count_data_rows(spark: SparkSession, path: str) -> int:
    """S2: progress denominator (lines minus header)."""
    return read_intake_csv(spark, path).count()
