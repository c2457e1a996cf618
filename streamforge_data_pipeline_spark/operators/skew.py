"""Skew-mitigation patterns for 100 TB workloads.

AQE's skew-join splitting handles most cases automatically
(session.py enables it); these explicit patterns cover the rest:

- salted two-phase aggregation: a hot group key (one event_type being
  90% of a 100 TB stream) funnels into one reducer under plain
  groupBy. Salting splits each group into `salt_buckets` partial
  groups (map-side spread), then a cheap second aggregation over
  `salt_buckets` rows per key merges partials. Results are exactly
  the plain-groupBy results — asserted by oracle and tests.

- salted broadcast-backed join is unnecessary here: broadcast joins
  don't skew (no shuffle of the big side); for shuffle joins AQE
  splits oversized partitions at runtime.

The salt must be deterministic for oracle parity: we derive it from a
stable column hash, not rand().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_count(df: DataFrame, key: str, salt_col: Column,
                 salt_buckets: int = 16) -> DataFrame:
    """Two-phase (salted) count per key; bit-equal to plain groupBy."""
    salted = df.withColumn("__salt", F.pmod(salt_col, F.lit(salt_buckets)))
    partial = salted.groupBy(key, "__salt").agg(F.count(F.lit(1)).alias("__c"))
    return partial.groupBy(key).agg(F.sum("__c").alias("cnt"))


def salted_sum(df: DataFrame, key: str, value: Column, salt_col: Column,
               salt_buckets: int = 16) -> DataFrame:
    """Two-phase decimal-path sum per key (order-independent, exact)."""
    salted = df.withColumn("__salt", F.pmod(salt_col, F.lit(salt_buckets))).withColumn(
        "__v", value.cast("decimal(28,10)")
    )
    partial = salted.groupBy(key, "__salt").agg(F.sum("__v").alias("__s"))
    return partial.groupBy(key).agg(F.sum("__s").cast("double").alias("sum_value"))

def salted_join(
    skewed: DataFrame,
    dim: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the skewed side, replicate the
    dim side across all salt buckets, join on (key, salt).

    A hot key that would pin one reducer is spread over
    ``salt_buckets`` tasks; the dim side grows by the same factor, so
    use this when the dim is too big to broadcast but small relative
    to the fact (the broadcast/AQE-skew gap). The salt is a
    deterministic hash of the skewed row's columns — layout- and
    retry-stable, no rand(). Result is exactly the plain join for
    ``inner`` and ``left`` (each skewed row meets each dim match
    exactly once, in exactly one bucket).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join preserves semantics for inner/left only")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt_buckets))
    big = skewed.withColumn("__salt", salt)
    rep = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return big.join(rep, [on, "__salt"], how).drop("__salt")
