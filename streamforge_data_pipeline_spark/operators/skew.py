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


def heavy_hitters_sketch(
    df: DataFrame,
    key: str = "user_id",
    k: int = 20,
    capacity: int = 4096,
    validate: bool = True,
    max_capacity: int = 1 << 20,
) -> DataFrame:
    """Two-scan heavy hitters with BOUNDED state — the scale path the
    exact profiler (registry q_heavy_hitters) names for when even the
    distinct-key count table is too hot to materialize.

    Scan 1 builds a Misra-Gries summary PER PARTITION (<= `capacity`
    keys each) with vectorized pandas ops only — per Arrow batch,
    value_counts + mergeable-summaries compaction (sum counters, then
    subtract the (capacity+1)-th largest and drop non-positive;
    Agarwal et al. 2012). The union of summaries is a candidate set of
    at most capacity x n_partitions keys — driver- and
    broadcast-bounded regardless of the key cardinality. Scan 2 counts
    the CANDIDATES exactly (broadcast semi-join + hash agg), so the
    emitted counts and shares are exact, identical to the full-groupBy
    profiler and to its SQL oracle.

    Correctness bound: a key with global count > N/capacity survives
    at least one partition summary, so the top-k is complete whenever
    the k-th heaviest key's count exceeds N/capacity. With
    ``validate`` (default) the operator CHECKS that bound on the
    result (k rows + one scalar — a bounded collect); if the bound is
    unprovable — a NEAR-UNIFORM key distribution, where heavy-hitter
    summaries fundamentally cannot certify a top-k — it retries with
    DOUBLED capacity (the remedy the bound names) up to
    ``max_capacity``, and only then raises rather than return a
    silently-incomplete profile. Each retry is two more scans with
    still-bounded state; pass ``validate=False`` only when the caller
    checks the bound itself.
    """
    import pandas as pd

    from pyspark.sql import types as T

    spark = df.sparkSession
    # the summary schema carries the key's OWN Spark type (r5 advice:
    # the previous `{key} long` hardcode crashed string keys and
    # silently truncated floats); counts stay long.
    key_field = df.schema[key]
    mg_schema = T.StructType([key_field, T.StructField("mg", T.LongType())])

    def mg_partition_at(batches, cap):
        summary = None
        for pdf in batches:
            counts = pdf[key].value_counts()
            summary = counts if summary is None else summary.add(counts, fill_value=0)
            if len(summary) > cap:
                thresh = summary.nlargest(cap + 1).iloc[-1]
                summary = summary - thresh
                summary = summary[summary > 0]
        if summary is not None and not summary.empty:
            # index keeps the key's native pandas dtype; .add() promotes
            # counts to float64, so only the counts are coerced back
            yield pd.DataFrame(
                {key: summary.index.to_numpy(),
                 "mg": summary.values.astype("int64")}
            )

    def build(cap: int) -> DataFrame:
        def mg_partition_cap(batches):
            yield from mg_partition_at(batches, cap)

        candidates = (
            df.select(key)
            .mapInPandas(mg_partition_cap, schema=mg_schema)
            .select(key)
            .distinct()
        )
        total = df.agg(F.count(F.lit(1)).alias("total"))
        return (
            df.join(F.broadcast(candidates), key)
            .groupBy(key)
            .agg(F.count(F.lit(1)).alias("n"))
            .crossJoin(F.broadcast(total))
            .select(
                key,
                "n",
                F.round(F.col("n") / F.col("total"), 4).alias("share"),
            )
            .orderBy(F.desc("n"), F.asc(key))
            .limit(k)
        )

    if not validate:
        return build(capacity)
    n_total = df.count()
    if n_total == 0:
        return build(capacity)
    cap = capacity
    n_distinct = None  # computed lazily, once, only if a short result appears
    while True:
        topk = build(cap)
        rows = topk.collect()  # bounded: k rows
        # An EMPTY/short result is the same failure, not a pass: on a
        # near-uniform distribution the compactions decrement every
        # counter away and no candidate survives — completeness is
        # exactly as unprovable as a too-small k-th count. A SHORT
        # result (r5 advice) is accepted only when it provably contains
        # EVERY distinct key (then counts are exact and top-k trivial);
        # otherwise ranks beyond the candidate count could be missing
        # even when the k-th-count bound holds.
        if len(rows) < k:
            if n_distinct is None:
                n_distinct = df.select(key).distinct().count()
            if len(rows) == n_distinct:
                return topk
        else:
            kth = rows[-1]["n"]
            if kth * cap > n_total:
                return topk
        if cap * 2 > max_capacity:
            kth = rows[-1]["n"] if rows else 0
            raise RuntimeError(
                f"heavy_hitters_sketch guarantee violated at max capacity "
                f"{cap}: k-th count {kth} <= N/capacity = {n_total}/{cap} "
                f"— the distribution has no provable top-{k} heavy hitters"
            )
        cap *= 2
