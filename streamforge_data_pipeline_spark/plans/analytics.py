"""Analytical query plans over the star schema.

The reference's relational surface is JPA point queries; a user
switching to this engine gets a real analytics surface on the same
DataFrame foundation. These three are the bench headliners — scan-heavy
agg (pricing_summary), selective 3-way join + top-k (top_revenue), and
a 6-table star join (region_sales).

Float discipline for oracle parity: every SUM over doubles goes
through DECIMAL(28,10) — the double->decimal rounding is identical in
Spark and DuckDB for non-midpoint values (binary doubles are never
exact decimal midpoints), decimal addition is exact/order-independent,
and the final cast back to double is deterministic. This also reflects
good engineering at 100 TB: money sums in decimal, not float.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from streamforge_data_pipeline_spark.session import load

DEC = "decimal(28,10)"


def dsum(c: Column) -> Column:
    """Exact decimal sum, rounded to cents BEFORE the double cast.

    The decimal sum itself is exact in both engines; the divergence
    risk is the decimal->double conversion — at scale 10 the scaled
    integer exceeds 2^53 and DuckDB's conversion can be off by one ulp
    (measured). Rounding to scale 2 first keeps the scaled integer
    within 2^53 for sums up to ~9e13, making the cast correctly
    rounded (hence bit-identical) in both engines.
    """
    return F.round(F.sum(c.cast(DEC)), 2).cast("double")


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: one scan, partial-agg shuffle on 2 group keys."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def top_revenue(spark: SparkSession, sf_dir: str, segment: str = "BUILDING",
                k: int = 10) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> broadcast customer into
    orders, shuffle join to lineitem, top-k by revenue.

    Filters are declared on the base tables so Catalyst pushes them
    into the parquet scans (PushedFilters) and prunes columns.
    """
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == segment)
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem")
    joined = (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(li, li["l_orderkey"] == orders["o_orderkey"])
    )
    rev = joined.groupBy("o_orderkey", "o_orderdate", "o_orderpriority").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )
    w = Window.orderBy(F.desc("revenue"), F.col("o_orderkey"))
    return (
        rev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("o_orderkey", "revenue", "o_orderpriority", "rk")
    )


def small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-group average via aggregate +
    join-back (no correlated-subquery re-scan per row), then a
    selective filter against 0.2x the group mean."""
    li = load(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy("l_partkey").agg(
        (
            F.round(F.sum(F.col("l_quantity").cast(DEC)), 2).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    joined = li.join(avg_qty, "l_partkey").filter(
        F.col("l_quantity") < 0.2 * F.col("avg_qty")
    )
    return joined.agg(
        dsum(F.col("l_extendedprice")).alias("small_qty_rev"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def parts_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand/size profile over the part dim (Q16-ish grouping)."""
    part = load(spark, sf_dir, "part")
    return part.groupBy("p_brand", (F.col("p_size") % 10).alias("size_bucket")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        dsum(F.col("p_retailprice")).alias("sum_price"),
    )


def supplier_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier account balances per nation (supplier ⋈ nation, dims
    broadcast)."""
    sup = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    return (
        sup.join(F.broadcast(nation), sup["s_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            dsum(F.col("s_acctbal")).alias("total_acctbal"),
        )
    )


def region_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join — dims broadcast, facts shuffle once."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
    )
    return joined.groupBy("r_name", "n_name").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )
