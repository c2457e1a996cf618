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
