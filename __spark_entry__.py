"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship ingest query (derived-intake
validation -> error-category counts) at sf0.001. ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY §2 with
its DuckDB oracle — see streamforge_data_pipeline_spark/registry.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from streamforge_data_pipeline_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Exercises the full ingest dataflow in one DAG: scan -> ordered
    validation (cast/trim/regex rules) -> broadcast anti-join dedup +
    first-wins window -> split -> error-category hash agg.
    """
    return registry.q_error_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()


def rows_only() -> dict[str, str]:
    """Declared rows-only keys: each key in ``queries()`` that has no
    ``oracle_sql()`` entry BY DESIGN (approximate sketches, float
    k-means training, media decode plumbing), mapped to the registry
    key whose exact/seeded twin hash-checks the same machinery. A
    "no_oracle" correctness row for any key listed here is a declared
    classification, not a coverage gap."""
    return registry.rows_only()
