"""Bloom-filter pre-pass anti join: exactness + filter effectiveness."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamforge_data_pipeline_spark.operators.joins import bloom_anti_join
from streamforge_data_pipeline_spark.session import load
from tests.conftest import SF_SMALL


def test_matches_plain_left_anti(spark):
    li = load(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_linenumber", "l_partkey")
    keys = (
        load(spark, SF_SMALL, "part")
        .where(F.col("p_partkey") % 5 == 0)
        .select(F.col("p_partkey").alias("l_partkey"))
    )
    cols = ["l_orderkey", "l_linenumber", "l_partkey"]
    got = {
        tuple(r) for r in bloom_anti_join(li, keys, "l_partkey").select(cols).collect()
    }
    want = {
        tuple(r)
        for r in li.join(keys, "l_partkey", "left_anti").select(cols).collect()
    }
    assert got == want and want


def test_all_and_none_matching(spark):
    probe = spark.range(0, 1000).withColumnRenamed("id", "k")
    empty_keys = spark.range(0, 0).withColumnRenamed("id", "k")
    assert bloom_anti_join(probe, empty_keys, "k").count() == 1000
    all_keys = spark.range(0, 1000).withColumnRenamed("id", "k")
    assert bloom_anti_join(probe, all_keys, "k").count() == 0


def test_false_positive_rate_bounded(spark):
    # Disjoint probe/key ranges: every probe row is truly new, so any
    # row routed to the exact join is a Bloom false positive.
    keys = spark.range(0, 20_000).withColumnRenamed("id", "k")
    probe = spark.range(100_000, 140_000).withColumnRenamed("id", "k")
    flagged = bloom_anti_join(probe, keys, "k", fpp=0.01)
    # Exact result regardless of fp rate:
    assert flagged.count() == 40_000


def test_bitmap_build_collects_words_not_positions(spark):
    # The build must transfer O(m/64) word rows to the driver, never
    # the O(k*n) distinct positions (the scale hazard the distributed
    # bit_or aggregation exists to avoid).
    import math

    from streamforge_data_pipeline_spark.operators.joins import _bloom_bitmap

    n, fpp = 10_000, 0.01
    m = int(-n * math.log(fpp) / (math.log(2) ** 2)) + 1
    m += (-m) % 64
    k = max(1, round(m / n * math.log(2)))
    keys = spark.range(0, n).withColumnRenamed("id", "k")
    bits, rows_collected = _bloom_bitmap(keys, "k", m, k)
    assert rows_collected <= m // 64          # word rows only
    assert rows_collected < k * n / 10        # nowhere near the position count
    # and the bitmap is actually populated with ~k*n set bits
    import numpy as np

    set_bits = int(np.unpackbits(bits).sum())
    assert 0.8 * k * n * (1 - 1 / math.e) < set_bits <= k * n


def test_asof_join_semantics(spark):
    from datetime import datetime

    from streamforge_data_pipeline_spark.operators.joins import asof_join

    t = lambda s: datetime.fromisoformat(s)
    left = spark.createDataFrame(
        [(1, 10, t("2024-01-01T10:00:00")),   # after r1, before r2
         (2, 10, t("2024-01-01T12:00:00")),   # exactly at r2 -> r2 (<=)
         (3, 10, t("2024-01-01T08:00:00")),   # before any right -> null
         (4, 99, t("2024-01-01T12:00:00"))],  # key with no right rows
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [(10, t("2024-01-01T09:00:00"), 1.5),
         (10, t("2024-01-01T12:00:00"), 2.5)],
        ["user_id", "ts", "v"],
    )
    out = {
        r["event_id"]: r["asof_v"]
        for r in asof_join(
            left, right, key="user_id", left_ts="ts", right_ts="ts",
            value_cols=["v"],
        ).collect()
    }
    assert out == {1: 1.5, 2: 2.5, 3: None, 4: None}


def test_semi_join_matches_complements_anti_join(spark):
    """J1 and its complement partition the incoming batch: every row is
    either definitely-new (anti) or already-present (semi)."""
    from streamforge_data_pipeline_spark.operators.dedup import (
        anti_join_dedup,
        semi_join_matches,
    )

    incoming = spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], "k long, v string"
    )
    existing = spark.createDataFrame([(i,) for i in range(0, 20, 3)], "k long")
    new = anti_join_dedup(incoming, existing, "k")
    dup = semi_join_matches(incoming, existing, "k")
    assert new.count() + dup.count() == 20
    assert {r["k"] for r in dup.collect()} == set(range(0, 20, 3))


def test_asof_join_tolerance_nulls_stale_matches(spark):
    """Bounded staleness: matches older than the tolerance yield NULL
    while fresh matches are identical to the unbounded join."""
    from datetime import datetime

    from streamforge_data_pipeline_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [
            (1, 7, datetime(2026, 1, 1, 12, 0, 0)),   # 30s after right
            (2, 7, datetime(2026, 1, 1, 13, 0, 0)),   # 1h+30s after right
            (3, 8, datetime(2026, 1, 1, 12, 0, 0)),   # no right at all
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(7, datetime(2026, 1, 1, 11, 59, 30), 42.0)],
        "user_id long, ts timestamp, v double",
    )
    out = {
        r["event_id"]: r["asof_v"]
        for r in asof_join(
            left, right, "user_id", "ts", "ts", ["v"], tolerance=60.0
        ).collect()
    }
    assert out == {1: 42.0, 2: None, 3: None}
    # boundary: exactly tolerance old is still fresh (<= semantics)
    out2 = {
        r["event_id"]: r["asof_v"]
        for r in asof_join(
            left, right, "user_id", "ts", "ts", ["v"], tolerance=30.0
        ).collect()
    }
    assert out2[1] == 42.0


def test_asof_join_latest_row_wins_even_with_null_value(spark):
    """Row semantics (pandas merge_asof): the LATEST right row is the
    match and its values are taken verbatim — a newer right row with a
    NULL value must yield NULL, not resurrect an older non-null value
    (and under tolerance must not pair the old value with the new
    row's timestamp)."""
    from datetime import datetime

    from streamforge_data_pipeline_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 7, datetime(2026, 1, 1, 12, 0, 10))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (7, datetime(2026, 1, 1, 11, 0, 0), 42.0),
            (7, datetime(2026, 1, 1, 12, 0, 0), None),
        ],
        "user_id long, ts timestamp, v double",
    )
    (row,) = asof_join(left, right, "user_id", "ts", "ts", ["v"]).collect()
    assert row["asof_v"] is None
    (row,) = asof_join(
        left, right, "user_id", "ts", "ts", ["v"], tolerance=60.0
    ).collect()
    assert row["asof_v"] is None
