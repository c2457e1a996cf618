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
    from the raw line itself. Commas INSIDE quoted cells are stripped
    first (the quote-parity lookahead matches a comma with an odd
    number of '"' ahead of it, i.e. inside an open quote — '""'
    escapes pair up so they cannot flip the parity), which is exactly
    univocity-cell semantics: safeArray strips in-cell commas, field
    separators survive. Residual documented divergence: the quote
    characters themselves are then dropped wholesale, so an escaped
    quote renders as nothing where the reference would keep a literal
    '"' in the cell (and an UNTERMINATED quote defeats the parity
    lookahead entirely) — the reference's generator can produce
    neither.
    """
    line = report_line(cells)
    if raw is not None and raw in rejected.columns:
        in_cell_commas_stripped = F.regexp_replace(
            F.col(raw), r',(?=(?:[^"]*"[^"]*")*[^"]*"[^"]*$)', ""
        )
        line = F.when(
            F.col(raw).isNotNull(),
            F.concat_ws(
                ",",
                F.regexp_replace(in_cell_commas_stripped, '"', ""),
                F.col("error"),
            ),
        ).otherwise(line)
    return rejected.select(line.alias("line"))


def write_error_report(
    rejected: DataFrame, cells: list[str], path: str, raw: str | None = None
) -> None:
    error_report(rejected, cells, raw).write.mode("overwrite").text(path)
