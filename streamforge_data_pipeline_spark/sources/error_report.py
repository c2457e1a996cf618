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


def error_report(
    rejected: DataFrame, cells: list[str], raw: str | None = None
) -> DataFrame:
    """Serialize rejected rows as the reference does: the row's TRUE
    cells joined by ',' + the error. For well-formed rows that is the
    named columns; for arity-malformed rows (``raw`` column non-null,
    token count != len(cells)) the reference joins however many cells
    the parser saw (``String.join(",", safeArray(row))`` — a 2-cell
    row renders 2 cells, a 5-cell row renders 5), which we recover
    from the raw line itself. Quoted cells containing commas would
    render their commas as separators here where univocity strips
    them in-cell — the reference's own generator never quotes.
    """
    line = report_line(cells)
    if raw is not None and raw in rejected.columns:
        line = F.when(
            F.col(raw).isNotNull(),
            F.concat_ws(",", F.regexp_replace(F.col(raw), '"', ""), F.col("error")),
        ).otherwise(line)
    return rejected.select(line.alias("line"))


def write_error_report(
    rejected: DataFrame, cells: list[str], path: str, raw: str | None = None
) -> None:
    error_report(rejected, cells, raw).write.mode("overwrite").text(path)
