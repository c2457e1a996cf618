"""Data-quality expectations (dbt-test / Great-Expectations shape).

Row-level rules compile into ONE conditional-aggregation pass over the
table — adding a rule costs an expression, not a scan — then unpivot
to the canonical (rule, n_violations) report. Referential rules
(orphaned foreign keys) are anti-join counts unioned in; the FK dim
side is usually broadcastable, and only the key column travels.
All-deterministic, so the whole report is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def check_rows(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """(rule, n_violations) for row-level rules in one scan.

    ``rules`` maps rule name -> violation predicate (True = row
    violates). NULL predicate results count as violations — an
    expectation that can't be evaluated is not satisfied.
    """
    wide = df.agg(
        *[
            F.sum(
                F.when(F.coalesce(pred, F.lit(True)), 1).otherwise(0)
            ).cast("long").alias(name)
            for name, pred in sorted(rules.items())
        ]
    )
    names = sorted(rules)
    stack_args = ", ".join(f"'{n}', `{n}`" for n in names)
    return wide.selectExpr(
        f"stack({len(names)}, {stack_args}) AS (rule, n_violations)"
    )


def check_fk(
    fact: DataFrame, fact_key: str, dim: DataFrame, dim_key: str, rule: str
) -> DataFrame:
    """(rule, n_violations) counting fact rows with no matching dim key."""
    orphans = fact.select(fact_key).join(
        F.broadcast(dim.select(dim_key)),
        fact[fact_key] == dim[dim_key],
        "left_anti",
    )
    return orphans.agg(
        F.lit(rule).alias("rule"),
        F.count(F.lit(1)).cast("long").alias("n_violations"),
    )


def expectations_report(parts: list[DataFrame]) -> DataFrame:
    """Union per-source reports into one (rule, n_violations) table."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
