"""Gap-fill/LOCF invariants + HLL sketch accuracy."""

from datetime import date

from pyspark.sql import functions as F

from streamforge_data_pipeline_spark.operators.timeseries import gap_fill_daily


def test_gap_fill_semantics(spark):
    obs = spark.createDataFrame(
        [("a", date(2024, 1, 1), 10.0),
         ("a", date(2024, 1, 4), 40.0),
         ("b", date(2024, 1, 3), 30.0)],
        "k string, day date, v double",
    )
    out = gap_fill_daily(obs, key="k", day_col="day", value_col="v")
    rows = {(r["k"], r["day"]): r for r in out.collect()}
    # full grid: 2 keys x 4 days (global span 01-01..01-04)
    assert len(rows) == 8
    # zero-fill + filled flag on synthesized cells
    gap = rows[("a", date(2024, 1, 2))]
    assert gap["v"] == 0.0 and gap["is_filled"] is True
    assert rows[("a", date(2024, 1, 1))]["is_filled"] is False
    # LOCF carries the last observation, stays null before the first
    assert rows[("a", date(2024, 1, 3))]["v_locf"] == 10.0
    assert rows[("a", date(2024, 1, 4))]["v_locf"] == 40.0
    assert rows[("b", date(2024, 1, 2))]["v_locf"] is None
    assert rows[("b", date(2024, 1, 4))]["v_locf"] == 30.0


def test_hll_estimate_close_to_exact(spark):
    from streamforge_data_pipeline_spark.registry import REGISTRY
    from streamforge_data_pipeline_spark.session import load

    sf_dir = "/root/testdata/sf0.01"

    est = {
        r["event_type"]: r["approx_users"]
        for r in REGISTRY["hll_user_sketches"].fn(spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["exact"]
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(est) == set(exact)
    for t, e in exact.items():
        assert abs(est[t] - e) / e < 0.05


def test_approx_percentiles_close_to_exact(spark):
    from streamforge_data_pipeline_spark.registry import REGISTRY

    sf_dir = "/root/testdata/sf0.01"
    approx = {r["event_type"]: r for r in
              REGISTRY["value_percentiles_approx"].fn(spark, sf_dir).collect()}
    exact = {r["event_type"]: r for r in
             REGISTRY["value_percentiles"].fn(spark, sf_dir).collect()}
    assert set(approx) == set(exact)
    for t in exact:
        for p in ("p50", "p90", "p99"):
            e, a = exact[t][p], approx[t][p]
            assert abs(a - e) <= max(0.02 * abs(e), 0.5), (t, p, e, a)
