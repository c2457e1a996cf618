"""Rejected-row report sink (S7).

Reference: BackgroundCsvProcessor.java:128-130,145,177-179,195 — each
rejected row serialized as its cells (null -> '', commas stripped,
safeArray :286-293) joined by ',' with the error message appended.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def report_line(cells: list[str], error: str = "error") -> Column:
    safe = [
        F.regexp_replace(F.coalesce(F.col(c), F.lit("")), ",", "") for c in cells
    ]
    return F.concat_ws(",", *safe, F.col(error))


def error_report(rejected: DataFrame, cells: list[str]) -> DataFrame:
    return rejected.select(report_line(cells).alias("line"))


def write_error_report(rejected: DataFrame, cells: list[str], path: str) -> None:
    error_report(rejected, cells).write.mode("overwrite").text(path)
