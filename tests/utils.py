"""Differential comparison mirroring the driver's correctness gate:
row-count + schema-width + order-insensitive value hash with columns
sorted by name."""

from __future__ import annotations

import math

import duckdb


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    # Explicit resource bounds: the default memory_limit (80% of RAM)
    # assumes DuckDB owns the host, but here it shares it with a
    # local[32] Spark JVM — under that pressure heavy recursive-CTE
    # oracles at sf1 hit raw allocation failures ("bad allocation")
    # instead of spilling. A fixed limit makes them spill to the temp
    # dir, and the temp cap makes a super-linear oracle (tfidf's
    # quadratic term join) die cleanly at 40 GB instead of filling the
    # disk (observed: 60+ GB of duckdb_temp_storage before ENOSPC).
    con.sql("SET memory_limit='24GB'")
    con.sql("SET max_temp_directory_size='40GB'")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        path = f"{sf_dir}/{t}.parquet"
        # multi-file layouts store each table AS a directory of parts
        # (datagen_star --multi-file); the driver layout is one file
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # strict to ~1 ulp: catches real bugs, ignores sub-1e-9 noise
        return f"{v:.9g}"
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def compare(spark_df, con, sql: str) -> tuple[bool, str]:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    d = con.sql(sql)
    d_rows = d.fetchall()
    d_cols = d.columns
    if sorted(s_cols) != sorted(d_cols):
        return False, f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}"
    sc, dc = _canon(s_rows, s_cols), _canon(d_rows, d_cols)
    if sc != dc:
        diff = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
        return False, f"values differ, first diffs: {diff}"
    return True, "ok"
