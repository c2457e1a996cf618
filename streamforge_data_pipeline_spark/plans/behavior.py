"""Behavioral analytics over the event stream.

The reference's event surface is row-level CRUD; a pipeline engine at
100 TB needs the standard product-analytics shapes on top of the same
events table: ordered funnels and cohort retention. Both are
single-shuffle window/agg plans — no self-join explosions — and both
are plain ANSI SQL, so the DuckDB oracle checks them end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from streamforge_data_pipeline_spark.session import load


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase: a user converts a
    step only with an event at-or-after their previous step's first
    completion. One shuffle on user_id: two window passes attach the
    running step timestamps, then a per-user reduce and a global
    single-row rollup.

    Scale notes: no self-joins — the naive per-step join chain is
    three shuffles of the full fact and skews on power users; windows
    over one hash partitioning reuse the same sort. 150 users here,
    10^9 users at target scale: the per-user reduce keeps the global
    agg tiny.
    """
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    fv = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    ev = ev.withColumn("first_view", fv)
    fc = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") >= F.col("first_view")),
            F.col("ts"),
        )
    ).over(w)
    ev = ev.withColumn("first_click", fc)
    per_user = ev.groupBy("user_id").agg(
        F.max("first_view").alias("fv"),
        F.max("first_click").alias("fc"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") >= F.col("first_click")),
                F.col("ts"),
            )
        ).alias("fp"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("fv").alias("n_view"),
        F.count("fc").alias("n_view_click"),
        F.count("fp").alias("n_view_click_purchase"),
        F.round(F.count("fc") / F.count("fv"), 4).alias("click_rate"),
        F.round(F.count("fp") / F.count("fv"), 4).alias("purchase_rate"),
    )


FUNNEL_SQL = """WITH ev AS (SELECT user_id, event_type, ts FROM events),
w1 AS (
  SELECT *, min(CASE WHEN event_type = 'view' THEN ts END)
              OVER (PARTITION BY user_id) AS first_view
  FROM ev),
w2 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts >= first_view THEN ts END)
              OVER (PARTITION BY user_id) AS first_click
  FROM w1),
pu AS (
  SELECT user_id, max(first_view) AS fv, max(first_click) AS fc,
         min(CASE WHEN event_type = 'purchase' AND ts >= first_click THEN ts END) AS fp
  FROM w2 GROUP BY user_id)
SELECT count(*) AS n_users,
       count(fv) AS n_view,
       count(fc) AS n_view_click,
       count(fp) AS n_view_click_purchase,
       round(count(fc) * 1.0 / count(fv), 4) AS click_rate,
       round(count(fp) * 1.0 / count(fv), 4) AS purchase_rate
FROM pu"""


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their
    first event; for each (cohort_week, weeks_since_cohort) the count
    of distinct users active that week.

    Scale notes: first-event week is a window min over the user
    partitioning (one shuffle); activity reduces to distinct
    (user, week) BEFORE the countDistinct shuffle, so the final agg
    sees at most users x weeks rows, not raw events.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    )
    w = Window.partitionBy("user_id")
    ev = ev.withColumn("cohort_week", F.min("week").over(w))
    active = ev.select("user_id", "cohort_week", "week").distinct()
    return (
        active.groupBy(
            F.col("cohort_week").cast("date").alias("cohort_week"),
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_n"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


COHORT_SQL = """WITH ev AS (
  SELECT user_id, date_trunc('week', ts) AS week FROM events),
c AS (
  SELECT *, min(week) OVER (PARTITION BY user_id) AS cohort_week FROM ev),
a AS (SELECT DISTINCT user_id, cohort_week, week FROM c)
SELECT CAST(cohort_week AS DATE) AS cohort_week,
       CAST(date_diff('day', cohort_week, week) // 7 AS BIGINT) AS week_n,
       count(DISTINCT user_id) AS active_users
FROM a GROUP BY 1, 2"""


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition counts over per-user event sequences: for
    each (from_event, to_event) pair, how often does one directly
    follow the other, and what share of the from-state's exits does
    that represent (the session-path / next-action analytics shape).

    Scale notes: ONE window shuffle on user_id builds every adjacent
    pair via lead() — no self-join on the event table (a ts-based
    self-join is O(events^2) within a user and quadratic on power
    users). The pair aggregate reuses partial aggregation; the share
    window runs over the tiny (|event_types|^2) aggregate, not the
    fact. Tie-break on event_id makes the sequence total-ordered and
    the result reproducible under any partitioning.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("from_event"),
            F.lead("event_type", 1).over(w).alias("to_event"),
        )
        .filter(F.col("to_event").isNotNull())
    )
    counts = pairs.groupBy("from_event", "to_event").agg(
        F.count(F.lit(1)).alias("n")
    )
    share_w = Window.partitionBy("from_event")
    return counts.select(
        "from_event",
        "to_event",
        "n",
        F.round(F.col("n") / F.sum("n").over(share_w), 4).alias("share"),
    )


def value_anomalies(spark: SparkSession, sf_dir: str, z_cut: float = 3.0) -> DataFrame:
    """Per-event-type z-score outliers: events whose value sits more
    than `z_cut` sample standard deviations from their type's mean
    (the monitoring/data-validation anomaly gate).

    Mean/std come from DECIMAL-exact co-moment sums (the corr_measures
    recipe) so the cut threshold is bit-identical cross-engine —
    builtin stddev() is a streaming float fold whose partition order
    Spark doesn't pin, so it can't be oracle-checked exactly.

    Scale notes: two passes over the fact (stats agg, then flag scan)
    with the per-type stats broadcast back — the stats side is
    |event_types| rows, never a shuffle of the fact itself. The flag
    pass is a pure map: at 100 TB this is scan-bound, and both passes
    prune to (event_id, event_type, value).
    """
    from streamforge_data_pipeline_spark.plans.analytics import dsum

    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    v = F.col("value")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(v).alias("sv"),
        dsum(v * v).alias("svv"),
    )
    n = F.col("n").cast("double")
    mean = F.col("sv") / n
    var = (n * F.col("svv") - F.col("sv") * F.col("sv")) / (n * (n - F.lit(1.0)))
    stats = stats.select(
        F.col("event_type").alias("__type"),
        mean.alias("__mean"),
        F.sqrt(var).alias("__std"),
    )
    z = (v - F.col("__mean")) / F.col("__std")
    return (
        ev.join(F.broadcast(stats), ev["event_type"] == F.col("__type"))
        .filter(F.abs(z) > z_cut)
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(z, 4).alias("z"),
        )
    )
