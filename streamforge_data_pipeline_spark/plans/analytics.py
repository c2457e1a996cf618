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

Broadcast policy: ``F.broadcast`` is pinned ONLY on genuinely bounded
relations — nation (25 rows), region (5 rows), single-row scalar
aggregates. customer/supplier/part scale with SF; a pinned hint
bypasses the size check, so at the 100 TB design point it is a
guaranteed driver/executor OOM with no AQE fallback. Those joins are
left to statistics + AQE, which broadcasts them at small SF anyway
(observed in the plan audits) and falls back to shuffle joins at
scale.
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
    """TPC-H Q3 shape: selective dim filter on customer, join to
    orders (strategy left to stats/AQE — customer scales with SF),
    shuffle join to lineitem, top-k by revenue.

    Filters are declared on the base tables so Catalyst pushes them
    into the parquet scans (PushedFilters) and prunes columns.
    """
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == segment)
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem")
    joined = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(li, li["l_orderkey"] == orders["o_orderkey"])
    )
    rev = joined.groupBy("o_orderkey", "o_orderdate", "o_orderpriority").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )
    # orderBy+limit compiles to TakeOrderedAndProject (per-partition
    # top-k then a k-row merge on the driver) — no single-partition
    # shuffle of the full aggregate, unlike a global row_number window.
    top = rev.orderBy(F.desc("revenue"), F.col("o_orderkey")).limit(k)
    w = Window.orderBy(F.desc("revenue"), F.col("o_orderkey"))  # k rows only
    return (
        top.withColumn("rk", F.row_number().over(w))
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
    """TPC-H Q5 shape: star join — bounded dims (nation/region)
    broadcast; customer/orders join strategy left to stats/AQE."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
    )
    return joined.groupBy("r_name", "n_name").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the nation dim plays two roles (supplier side
    and customer side) — two independent broadcasts, fact shuffles on
    its join keys only. Cross-nation traffic per ship year."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    sup = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))


def order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS -> left-semi join with a non-equi
    conjunct (line shipped after the order date), counted per
    priority. The semi join shuffles both sides on orderkey only."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > orders["o_orderdate"]),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


def returned_items(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """TPC-H Q10 shape: selective fact filter (returnflag = 'R'),
    4-way join, revenue per customer, deterministic top-k."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
    )
    rev = joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )
    top = rev.orderBy(F.desc("revenue"), F.col("c_custkey")).limit(k)
    w = Window.orderBy(F.desc("revenue"), F.col("c_custkey"))  # k rows only
    return (
        top.withColumn("rk", F.row_number().over(w))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name", "rk")
    )


def customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join (customers with zero orders
    kept), per-customer order count, then distribution of counts.
    Two aggregations, second one tiny."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation ratio — share of
    revenue from PROMO parts in one ship month. Part dim broadcasts;
    single pass over the filtered fact."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = li.join(part, li["l_partkey"] == part["p_partkey"])
    agg = joined.agg(
        dsum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))).alias(
            "promo_rev"
        ),
        dsum(rev).alias("total_rev"),
    )
    return agg.select(
        "promo_rev",
        "total_rev",
        F.round(F.lit(100.0) * F.col("promo_rev") / F.col("total_rev"), 4).alias(
            "promo_share_pct"
        ),
    )


def large_orders(spark: SparkSession, sf_dir: str, min_qty: float = 300.0) -> DataFrame:
    """TPC-H Q18 shape: HAVING over the fact -> join back to the
    order/customer detail (the IN-subquery plan). The heavy agg and
    the join-back reuse the same orderkey partitioning."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > min_qty)
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        orders.join(big, orders["o_orderkey"] == big["l_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
                "total_qty")
    )


def disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-conjunctions over part x lineitem.
    Catalyst extracts the common p_partkey equi-key so this stays a
    hash join with the disjunction as a post-join filter; per-branch
    base predicates still push into the scans."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    joined = li.join(part, li["l_partkey"] == part["p_partkey"])
    cond = (
        ((F.col("p_type") == "PROMO") & F.col("l_quantity").between(1, 11))
        | ((F.col("p_type") == "ECONOMY") & F.col("l_quantity").between(10, 20))
        | ((F.col("p_size") > 40) & F.col("l_quantity").between(20, 35))
    )
    return joined.filter(cond).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery (global positive-balance
    average) + anti join (customers with no orders), grouped by
    segment. The scalar agg broadcasts as a literal-like single-row
    crossjoin; the anti join shuffles on custkey."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.round(F.sum(F.col("c_acctbal").cast(DEC)), 2).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    rich = cust.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    idle = rich.join(orders, rich["c_custkey"] == orders["o_custkey"], "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"),
        dsum(F.col("c_acctbal")).alias("totacctbal"),
    )


def market_share(spark: SparkSession, sf_dir: str, nation: str = "NATION_1",
                 region: str = "ASIA") -> DataFrame:
    """TPC-H Q8 shape: one nation's share of PROMO-part revenue sold
    into one region, per order year — a conditional-sum ratio on top
    of a 7-relation star with the nation dim in two roles (customer
    region membership vs supplier nationality)."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    sup = load(spark, sf_dir, "supplier")
    n_cust = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    n_sup = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    reg = load(spark, sf_dir, "region").filter(F.col("r_name") == region)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(reg), F.col("cn_region") == reg["r_regionkey"])
        .join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(n_sup), F.col("s_nationkey") == F.col("sn_key"))
    )
    agg = joined.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        dsum(F.when(F.col("supp_nation") == nation, rev).otherwise(F.lit(0.0))).alias(
            "nation_rev"
        ),
        dsum(rev).alias("total_rev"),
    )
    return agg.select(
        "o_year",
        "nation_rev",
        "total_rev",
        F.round(F.col("nation_rev") / F.col("total_rev"), 4).alias("mkt_share"),
    )


def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per event type (sort-based
    aggregation — a different physical shape from hash aggs). Exact
    `percentile` matches DuckDB's quantile_cont bit-for-bit after
    round(4); at 100 TB the drop-in scalable variant is
    approx_percentile with a bounded error budget."""
    ev = load(spark, sf_dir, "events")
    pcts = F.expr("percentile(value, array(0.5, 0.9, 0.99))")
    return ev.groupBy("event_type").agg(
        F.round(pcts[0], 4).alias("p50"),
        F.round(pcts[1], 4).alias("p90"),
        F.round(pcts[2], 4).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


def running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window FRAMES (the shape rank/lag don't cover): per-customer
    cumulative spend and 3-order moving average, ordered by order
    date. Decimal sums inside the frame keep cross-engine parity;
    ties broken by orderkey so frames are deterministic."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = w.rowsBetween(-2, Window.currentRow)
    orders = load(spark, sf_dir, "orders")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(F.col("o_totalprice").cast(DEC)).over(cum), 2)
        .cast("double")
        .alias("cum_spend"),
        F.round(
            F.round(F.sum(F.col("o_totalprice").cast(DEC)).over(mov), 2).cast("double")
            / F.count(F.lit(1)).over(mov),
            4,
        ).alias("mov_avg3"),
    )


def rolling_revenue_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame (the frame type rows-frames can't
    express): per-customer trailing 7-DAY spend. The frame is defined
    on the value axis — all orders within 6 days before the current
    row's date are in, however many there are — so same-day peer rows
    share one deterministic result (no tiebreak needed, unlike rows
    frames). Ordering key is integer days-since-epoch: RANGE over a
    numeric key is the portable formulation (both engines; and at
    scale an integer sort key beats per-row date arithmetic).
    """
    orders = load(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day")
        .rangeBetween(-6, Window.currentRow)
    )
    return orders.withColumn("day", day).select(
        "o_custkey",
        "o_orderkey",
        "day",
        F.round(F.sum(F.col("o_totalprice").cast(DEC)).over(w), 2)
        .cast("double")
        .alias("spend_7d"),
    )


def grouping_sets_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form of which cube_sales /
    rollup_sales are specializations: exactly the (status), (priority),
    and grand-total groupings in ONE pass (a UNION of groupBys would
    scan three times; grouping sets expand inside a single Expand +
    aggregate exchange). grouping_id disambiguates the NULL produced
    by the expansion from a genuine NULL key."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("revenue"),
        )
    )


def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated MIN — for each qualifying part, the
    supplier(s) achieving the minimum unit cost. The testdata has no
    partsupp table, so (l_partkey, l_suppkey) pairs from lineitem act
    as the supply catalog with min unit price as the cost (reference
    parity: streamforge's catalog lookup joins; plan shape is Q2's
    aggregate-then-rejoin-on-min).

    Scale notes: the (part, supp) agg shuffles once on the compound
    key; the per-part MIN is a window over the already-reduced agg
    (tiny vs the fact); dims broadcast. No correlated re-scan of the
    fact — the subquery is decorrelated into one pass, which is how
    Catalyst wants Q2 expressed.
    """
    li = load(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost")
    )
    w = Window.partitionBy("l_partkey")
    ps = ps.withColumn("min_cost", F.min("cost").over(w)).filter(
        F.col("cost") == F.col("min_cost")
    )
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "PROMO")
    )
    sup = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    return (
        ps.join(part, ps["l_partkey"] == part["p_partkey"])
        .join(sup, ps["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            F.col("n_name").alias("supp_nation"),
            # NOT F.round: engines disagree by 1 ulp when the double
            # quotient sits on a .00005 tie (observed at sf1). floor(x*1e4
            # + 0.5)/1e4 is the same IEEE op sequence in Spark and DuckDB,
            # so the rounded value is bit-identical cross-engine.
            (F.floor(F.col("cost") * 10000 + F.lit(0.5)).cast("double") / 10000).alias(
                "min_unit_cost"
            ),
        )
    )


def important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value share vs a global-scalar
    threshold (sum(extendedprice) per part HAVING > fraction * grand
    total). The grand total is a single-row agg crossjoined in as a
    broadcast — the Q11 scalar-subquery decorrelation.

    Scale notes: one shuffle on partkey for the group-by; the global
    sum reuses the same reduced data, so the fact is scanned once per
    branch and never re-shuffled; at 100 TB the two branches share the
    scan via exchange reuse.
    """
    li = load(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        dsum(F.col("l_extendedprice")).alias("part_value")
    ).persist()  # read twice: grand total + threshold filter
    total = per_part.agg(
        F.round(F.sum(F.col("part_value").cast(DEC)), 2)
        .cast("double")
        .alias("grand_total"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    # Scale-free threshold (1.2x the average per-part share) so the
    # query keeps the same selectivity at any SF — a fixed fraction
    # goes vacuous as the part count grows.
    out = (
        per_part.join(F.broadcast(total))
        .filter(
            F.col("part_value")
            > F.lit(1.2) * F.col("grand_total") / F.col("n_parts")
        )
        .select("l_partkey", "part_value")
    )
    from streamforge_data_pipeline_spark.functions import finalize_released

    return finalize_released(out, per_part)


def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: revenue per supplier over a ship-date quarter,
    returning the supplier(s) at the max — the aggregated-view +
    scalar-max pattern.

    Scale notes: the quarter filter prunes at the scan; one shuffle
    aggregates per suppkey (tiny: one row per supplier); the MAX is a
    window over that reduced relation, and the supplier dim broadcasts
    into the single-row result.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    w = Window.partitionBy()
    best = rev.withColumn("mx", F.max("total_revenue").over(w)).filter(
        F.col("total_revenue") == F.col("mx")
    )
    sup = load(spark, sf_dir, "supplier")
    return best.join(sup, best["l_suppkey"] == sup["s_suppkey"]).select(
        "s_suppkey", "s_name", "total_revenue"
    )


def supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute
    group, with a dim-side negation filter and a NOT-IN supplier
    exclusion (negative account balance stands in for Q16's complaint
    suppliers; lineitem pairs stand in for partsupp).

    Scale notes: the excluded-supplier set is tiny -> broadcast
    left_anti; distinct (part, supp) reduces before the countDistinct
    shuffle; the part dim broadcasts.
    """
    li = load(spark, sf_dir, "lineitem")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    bad_sup = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0.0).select(
        "s_suppkey"
    )
    pairs = pairs.join(
        bad_sup, pairs["l_suppkey"] == bad_sup["s_suppkey"], "left_anti"
    )
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5") & (F.col("p_type") != "PROMO")
        & (F.col("p_size") <= 25)
    )
    return (
        pairs.join(part, pairs["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def dominant_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers shipping an outsized share (>30%) of
    any 'hot'-named part's 1996 volume — agg vs a correlated per-part
    total, then a semi join up to the supplier dim (availqty > half of
    shipped qty in the original; share-of-total here, same plan).

    Scale notes: name/date filters prune before the (part, supp)
    shuffle; the per-part total is a window over the reduced agg (no
    second fact scan); the qualifying-supplier set semi-joins into the
    dim, so no fact columns travel past the agg.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part").filter(F.col("p_name").startswith("hot"))
    qty = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.round(F.sum(F.col("l_quantity").cast(DEC)), 2).cast("double").alias("supp_qty"))
    )
    w = Window.partitionBy("l_partkey")
    qualifying = (
        qty.withColumn(
            "part_qty",
            F.round(F.sum(F.col("supp_qty").cast(DEC)).over(w), 2).cast("double"),
        )
        .filter(F.col("supp_qty") > F.lit(0.3) * F.col("part_qty"))
        .select("l_suppkey")
    )
    sup = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    return (
        sup.join(qualifying, sup["s_suppkey"] == qualifying["l_suppkey"], "left_semi")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", F.col("n_name").alias("supp_nation"))
    )


def sole_returned_supplier(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """TPC-H Q21 shape: the dual correlated EXISTS / NOT-EXISTS — a
    supplier with a returned line in a multi-supplier order where NO
    other supplier's line was returned (returnflag 'R' stands in for
    the missing receipt/commit dates). numwait counts such orders per
    supplier, top-k.

    Scale notes: both correlated subqueries decorrelate into ONE
    per-order aggregate (countDistinct suppliers, countDistinct
    returned suppliers) joined back to the returned lines on
    orderkey — one fact shuffle instead of three correlated rescans;
    supplier/nation broadcast; TakeOrderedAndProject caps the result.
    """
    li = load(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret_supp"),
    )
    returned = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    waits = (
        returned.join(per_order, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_ret_supp") == 1))
        .groupBy("l_suppkey")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
    )
    sup = load(spark, sf_dir, "supplier")
    return (
        waits.join(sup, waits["l_suppkey"] == sup["s_suppkey"])
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(k)
    )


def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (reference analytics surface: scan-heavy
    filter+aggregate, cf. reference repo's aggregate pipeline): revenue
    delta from discount changes — a pure scan query with three
    pushed-down predicates and ONE global aggregate.

    Scale notes: zero joins, zero wide shuffles — partial sums per
    partition, single-row final combine. All three predicates reach
    the parquet scan (PushedFilters); only 4 of 11 lineitem columns
    are read. This is the linear-scan speed-of-light query: at 100 TB
    it is I/O bound by design, and partition pruning on a
    date-partitioned layout would cut the scan to one year.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24.0)
    )
    return li.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: per-(nation, year) profit over a 5-relation
    star. Adapted to the partsupp-less testdata: unit supply cost is
    modeled as 60% of p_retailprice (the join/agg plan shape — fact
    joined to part, supplier, nation and orders, then a two-key
    aggregate — is what Q9 exercises, not the cost constant).

    Scale notes: part filter ('widget') prunes the fact early via a
    broadcast semi-shape join; supplier/nation broadcast; orders is
    the only co-shuffled join and carries just (orderkey, year). One
    wide shuffle for the final (nation, year) aggregate.
    """
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    sup = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    joined = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
    )
    return (
        joined.groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(dsum(profit).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional priority counts per fact category.
    Adapted to the shipmode-less testdata: l_linestatus plays the
    shipmode role and a one-year l_shipdate window plays the receipt
    window (the plan shape — selective fact filter, join to orders,
    CASE-conditional counts grouped by a fact attribute — is Q12's).

    Scale notes: the date predicate is pushed to the fact scan before
    the join; the join shuffles on orderkey (or broadcasts the
    filtered fact side under AQE at small SF); conditional counts are
    partial-agg shapes — one row per (partition x linestatus) crosses
    the final shuffle.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("linestatus")
    )
