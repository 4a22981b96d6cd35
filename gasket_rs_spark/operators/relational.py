"""Tier-X relational operator surface (SURVEY.md §2.2, X1-X18).

Each public ``q_*`` function is a query witness: ``(spark, sf_dir) ->
DataFrame``. ``ORACLES`` maps the query name (function name minus ``q_``)
to the equivalent DuckDB SQL. Column aliases match on both sides because
the driver's differential check sorts columns by name before hashing.

Determinism rules applied throughout:
- every float aggregate is ``round``-ed identically on both sides so
  summation-order differences between engines can't flip the value hash;
- every window ``ORDER BY`` carries a unique tiebreak key;
- event timestamps are compared at second granularity (parquet stores ns,
  both engines truncate to µs — we stay clear of the edge entirely).

Scale notes (100 TB target) are inline per operator; the common themes:
joins against ``DIM_TABLES`` take an explicit ``broadcast()`` hint, fact
joins stay sort-merge on their natural keys, and all aggregations are
plain hash aggregates with map-side partial aggregation (Catalyst default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from gasket_rs_spark.tables import load


# ---------------------------------------------------------------------------
# Flagship (X1-X5, X10, X17 in one plan)
# ---------------------------------------------------------------------------

def q_flagship_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by region for 1996 shipments.

    lineitem ⋈ orders (sort-merge on orderkey) ⋈ customer ⋈ nation ⋈ region
    (all broadcast — dims are tiny at any SF). The shipdate filter is pushed
    to the parquet scan; only 4 lineitem columns are read.
    """
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        lineitem
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        # customer is SF-scaled (150k x SF): no forced broadcast — AQE
        # broadcasts while small, sort-merges at the 100 TB target.
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.col("revenue").desc())
    )


# ---------------------------------------------------------------------------
# X1-X3: scan / projection / filters
# ---------------------------------------------------------------------------

def q_scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan with pushed-down predicate + column pruning."""
    return (
        load(spark, sf_dir, "lineitem")
        .where((F.col("l_quantity") > 30) & (F.col("l_returnflag") == "R"))
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        )
    )


def q_filter_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN + BETWEEN + LIKE + null-safe predicate in one filter."""
    return (
        load(spark, sf_dir, "orders")
        .where(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & F.col("o_totalprice").between(1000.0, 200000.0)
            & F.col("o_orderstatus").like("F%")
            & F.col("o_custkey").isNotNull()
        )
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    )


# ---------------------------------------------------------------------------
# X4-X8: joins
# ---------------------------------------------------------------------------

def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join lineitem ⋈ part, aggregated by brand.

    At scale: lineitem is the 100 TB side; part is broadcast (it grows with
    SF but stays orders of magnitude smaller; if it outgrew the broadcast
    threshold AQE falls back to shuffled hash join).
    """
    lineitem = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    return (
        lineitem.join(broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast-hash join: customer ⋈ broadcast(nation)."""
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        customer.join(broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.avg("c_acctbal"), 6).alias("avg_acctbal"),
        )
    )


def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with an extra join-side predicate (null-producing)."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    cond = (F.col("c_custkey") == F.col("o_custkey")) & (F.col("o_totalprice") > 350000.0)
    return (
        customer.join(orders, cond, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_big_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_big"),
        )
    )


def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join: all parts kept, matched against big lineitems."""
    lineitem = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    big = lineitem.where(F.col("l_quantity") > 45)
    return (
        big.join(part, F.col("l_partkey") == F.col("p_partkey"), "right")
        .groupBy("p_partkey")
        .agg(
            F.count("l_orderkey").alias("n_big_lines"),
            F.round(F.sum("l_quantity"), 2).alias("sum_big_qty"),
        )
    )


def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join between per-nation customer and supplier rollups."""
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    c = customer.groupBy(F.col("c_nationkey").alias("nk_c")).agg(F.count("*").alias("n_customers"))
    s = supplier.groupBy(F.col("s_nationkey").alias("nk_s")).agg(F.count("*").alias("n_suppliers"))
    return (
        c.join(s, F.col("nk_c") == F.col("nk_s"), "full")
        .select(
            F.coalesce(F.col("nk_c"), F.col("nk_s")).alias("nationkey"),
            "n_customers",
            "n_suppliers",
        )
    )


def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers that have at least one 'F' order."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    f_orders = orders.where(F.col("o_orderstatus") == "F")
    return (
        customer.join(f_orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no order above 300k."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    big = orders.where(F.col("o_totalprice") > 300000.0)
    return (
        customer.join(big, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of two small dims (both broadcastable)."""
    region = load(spark, sf_dir, "region")
    supplier = load(spark, sf_dir, "supplier")
    return (
        region.crossJoin(broadcast(supplier))
        .select(
            "r_name",
            "s_name",
            F.concat_ws("/", "r_name", "s_name").alias("pair"),
        )
    )


def q_join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range (theta) join: lineitems shipped >1 year after order date.

    The equi part (orderkey) drives the shuffle; the range predicate is
    evaluated post-match, so this stays a sort-merge join at any scale.
    """
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS")
    )
    return (
        lineitem.join(orders, cond)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_late"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        )
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase event, the latest click by the same
    user at-or-before the purchase (second granularity).

    Implemented scale-first with the union+window trick (one shuffle on
    user_id, no pairwise blow-up): tag clicks/purchases, sort within user
    by (ts, kind, event_id), carry the last click forward with
    ``last(..., ignorenulls=True)``. This is O(n log n) per key versus the
    O(clicks × purchases) range-join formulation the oracle uses.

    r21: the click/purchase tagging is a single conditional projection
    over ONE filtered scan instead of a union of two separately filtered
    scans — same multiset of pre-shuffle rows (the two branch filters
    were disjoint and exhaustive over this predicate), but events is now
    read once, not twice (guide §2.3 project-early / §1.2 remove passes;
    at 100 TB this halves the scan I/O of the query). Oracle-checked
    EXACT at all three SFs.
    """
    events = load(spark, sf_dir, "events")
    is_purchase = F.col("event_type") == "purchase"
    tagged = (
        events.where(F.col("event_type").isin("click", "purchase"))
        .withColumn("ts_sec", F.expr("unix_millis(ts) div 1000"))
        .select(
            "user_id",
            F.col("ts_sec"),
            F.when(is_purchase, F.lit(1)).otherwise(F.lit(0)).alias("kind"),
            F.when(
                ~is_purchase,
                F.struct(
                    F.col("ts_sec").alias("click_sec"),
                    F.col("event_id").alias("click_id"),
                ),
            ).alias("click"),
            F.when(is_purchase, F.col("event_id")).alias("purchase_id"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec", "kind", F.coalesce("purchase_id", F.col("click.click_id")))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged
        .withColumn("last_click", F.last("click", ignorenulls=True).over(w))
        .where(F.col("kind") == 1)
        .select(
            "purchase_id",
            "user_id",
            F.col("ts_sec").alias("purchase_sec"),
            F.col("last_click.click_id").alias("click_id"),
            F.col("last_click.click_sec").alias("click_sec"),
        )
    )


# ---------------------------------------------------------------------------
# Composite multi-operator queries (TPC-H-shaped): joins + filters + aggs +
# top-k in one plan each — the interplay stress tests.
# ---------------------------------------------------------------------------

def q_tpch_q3_unshipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3-shaped: top-10 open orders by pending revenue for one segment."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-06-01").cast("timestamp")
    return (
        lineitem.where(F.col("l_shipdate") > cutoff)
        .join(orders.where(F.col("o_orderdate") < cutoff), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            # customer is SF-scaled (150k x SF): no forced broadcast — AQE
            # broadcasts the filtered segment when it is actually small
            # and falls back to sort-merge at the 100 TB target.
            customer.where(F.col("c_mktsegment") == "BUILDING"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def q_tpch_q7_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7-shaped: shipping volume between supplier and customer nations."""
    supplier = load(spark, sf_dir, "supplier")
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    nation = load(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        # customer is SF-scaled: left to AQE (broadcast at small SF,
        # sort-merge at the 100 TB target — a forced broadcast OOMs there).
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .withColumn("l_year", F.year("l_shipdate").cast("bigint"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("volume"))
    )


# q_tpch_q10_returns RETIRED r19 (VERDICT r18 #3 rotation-capacity
# headroom): plan shape — lineitem-filter ⋈ orders ⋈ AQE-left customer
# ⋈ broadcast dim → sum(extendedprice·(1−discount)) hash agg →
# TakeOrdered — is identical to the retained q_tpch_q3_unshipped;
# its no-forced-broadcast invariant stays pinned via q3/q5/q7/q18 in
# tests/test_plans.py. Last driver row: green r16.


def q_tpch_q4_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-shaped: 1996 order counts by priority, restricted to orders with
    at least one line shipped after the order date (EXISTS → left-semi
    join; the non-equi shipdate predicate rides the semi join, which stays
    sort-merge on orderkey — fact-fact, no broadcast)."""
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    o = orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return (
        o.join(
            lineitem,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def q_tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5-shaped: revenue by nation where the supplier and the customer
    share a nation, per region, for a 2-year order window. The c=s
    nation-key equality is an extra join predicate, not a post-filter, so
    Catalyst can use it for pruning; all dims broadcast."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        lineitem.join(
            orders.where(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            # SF-scaled customer: AQE decides (see q7).
            customer,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


def q_tpch_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14-shaped: promo revenue share over a 2-month ship window — a
    conditional aggregate ratio in one pass over the filtered fact, part
    broadcast. Single-row result."""
    part = load(spark, sf_dir, "part")
    lineitem = load(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-03-01").cast("timestamp"))
        )
        .join(broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                4,
            ).alias("promo_pct")
        )
    )


def q_tpch_q18_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18-shaped: top-20 large-volume orders (total quantity > 200). The
    HAVING subquery is a lineitem self-aggregation semi-joined back on
    orderkey — one shuffle on l_orderkey feeds both the qualifying-key agg
    and the final per-order agg."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 200)
        .select("l_orderkey", "sum_qty")
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        # SF-scaled customer: AQE decides (see q7).
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("sum_qty", 2).alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


def q_tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19-shaped: revenue under an OR-of-ANDs predicate across brand /
    size / quantity bands — the classic disjunctive-pushdown stress. The
    part join is broadcast; each disjunct's part-side conjuncts are
    eligible for scan pushdown on the build side. Single-row result."""
    part = load(spark, sf_dir, "part")
    lineitem = load(spark, sf_dir, "lineitem")
    cond = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        lineitem.join(broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


def q_tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22-shaped: above-average-balance customers with no order since
    1999, counted per nation. The global average is a 1-row broadcast
    cross join (no collect); the no-recent-order test is a left-anti join
    against the filtered fact."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    avg_bal = customer.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = orders.where(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


def q_tpch_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1-shaped: the pricing-summary full-table scan+agg — one hash agg
    over ~6 (returnflag, linestatus) groups, partial aggregation map-side
    so the shuffle carries 6 rows per task regardless of SF.

    Float determinism: quantity is integer-valued so its sum/avg are
    exact; price/discount sums are snapped to their 2dp grid with
    round() BEFORE the division so the avg is derived from an
    engine-identical numerator (divide-then-round would expose low-order
    summation bits — see .claude/skills/verify/SKILL.md)."""
    lineitem = load(spark, sf_dir, "lineitem")
    cnt = F.count("*")

    def snapped_avg(col: str) -> F.Column:
        # floor(round(sum,2)/n * 1e6 + 0.5)/1e6 — identical spelling in SQL.
        return F.floor(F.round(F.sum(col), 2) / cnt * 1e6 + F.lit(0.5)) / 1e6

    return (
        lineitem.where(F.col("l_shipdate") <= F.lit("1999-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
                ),
                4,
            ).alias("sum_charge"),
            (F.round(F.sum("l_quantity"), 2) / cnt).alias("avg_qty_raw"),
            snapped_avg("l_extendedprice").alias("avg_price"),
            snapped_avg("l_discount").alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .withColumn("avg_qty", F.floor(F.col("avg_qty_raw") * 1e6 + F.lit(0.5)) / 1e6)
        .drop("avg_qty_raw")
    )


def q_tpch_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6-shaped: forecast-revenue-change — a pure scan-side query: every
    predicate (shipdate range, discount band, quantity cap) is pushable
    to the parquet reader, then a single global sum. The plan should be
    scan → partial agg → 1-row exchange; no join, no wide shuffle."""
    lineitem = load(spark, sf_dir, "lineitem")
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"))
    )


def q_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8-shaped: NATION_7's market share of ECONOMY-part volume sold to
    ASIA customers, by order year. Two nation aliases (customer side for
    region membership, supplier side for the share numerator); all
    fixed-size dims broadcast, SF-scaled customer left to AQE. Ratio
    convention (ADVICE r6): the numerator/denominator are sums of values
    on the 1e-4 decimal grid (2dp price × 2dp discount), so each sum is
    floor-snapped to that grid BEFORE dividing — identical expressions on
    both engines — then the ratio itself is snapped at 1e-6. Dividing raw
    double sums would feed partition-order-dependent low-order bits into
    the ratio, exactly the flap the q1 snap-sum-then-divide convention
    exists to avoid."""
    part = load(spark, sf_dir, "part")
    supplier = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    n_cust = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    num = F.floor(
        F.sum(F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(0.0)) * 1e4
        + F.lit(0.5)
    ) / 1e4
    den = F.floor(F.sum(vol) * 1e4 + F.lit(0.5)) / 1e4
    share = num / den
    return (
        lineitem.join(
            broadcast(part.where(F.col("p_type") == "ECONOMY")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            orders.where(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(
            broadcast(region.where(F.col("r_name") == "ASIA")),
            F.col("cn_region") == F.col("r_regionkey"),
        )
        .join(broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
        .withColumn("o_year", F.year("o_orderdate").cast("bigint"))
        .groupBy("o_year")
        .agg((F.floor(share * 1e6 + F.lit(0.5)) / 1e6).alias("mkt_share"))
    )


def q_tpch_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9-shaped: profit by supplier nation and order year over one part
    class. The fixture schema has no partsupp table, so unit cost proxies
    as ``p_retailprice`` (documented drift — the Q9 SHAPE is intact: a
    5-way join spanning both fact tables, a part-class filter, and a
    (nation, year) rollup). Fixed-size dims (part slice, supplier,
    nation) broadcast; the lineitem⋈orders fact-fact join stays
    sort-merge on orderkey."""
    part = load(spark, sf_dir, "part")
    supplier = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    nation = load(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        lineitem.join(
            broadcast(part.where(F.col("p_type") == "STANDARD")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .withColumn("o_year", F.year("o_orderdate").cast("bigint"))
        .groupBy("n_name", "o_year")
        .agg(F.round(F.sum(amount), 4).alias("sum_profit"))
    )


def q_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide→long melt) of the lineitem measure columns, then a
    per-measure rollup — the inverse of q_pivot_event_types. Spark's
    ``unpivot`` is a narrow map (each row expands to one row per
    measure, no shuffle until the final agg); the oracle spells the same
    reshape as a UNION ALL so the check is engine-portable."""
    lineitem = load(spark, sf_dir, "lineitem")
    return (
        lineitem.select("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")
        .unpivot(
            ["l_orderkey"],
            ["l_quantity", "l_extendedprice", "l_discount"],
            "measure",
            "val",
        )
        .groupBy("measure")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("val"), 2).alias("total"),
            F.min("val").alias("min_val"),
            F.max("val").alias("max_val"),
        )
    )


def q_agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/STRING_AGG parity):
    ``collect_list`` has NO deterministic order in a distributed engine —
    any correct listagg must impose one (array_sort here, ORDER BY inside
    DuckDB's aggregate). Hash-exact across engines precisely because the
    order is pinned; a bare collect_list concat would flap per run."""
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        customer.where(F.col("c_acctbal") > 9000.0)
        .join(broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("c_name")), "|").alias(
                "rich_customers"
            ),
            F.count("*").alias("n_rich"),
        )
    )


def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-semantics torture witness: outer-join nulls flowing through
    null-skipping COUNT/SUM/AVG, a null-branch conditional count, and
    COALESCE — the semantics corner engine ports classically get subtly
    wrong (e.g. COUNT(col) vs COUNT(*) over unmatched rows, AVG's
    divisor being the non-null count). Every aggregate here is pinned
    EXACT against DuckDB. avg_matched uses the snap-sum-then-divide
    spelling (see SKILL.md) and goes NULL for groups with zero matches
    in both engines."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    big = orders.where(F.col("o_totalprice") > 300000.0)
    n_orders = F.count("o_orderkey")
    return (
        customer.join(big, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_rows"),
            n_orders.alias("n_orders"),
            F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_unmatched"),
            F.round(F.sum(F.coalesce("o_totalprice", F.lit(0.0))), 2).alias(
                "sum_coalesced"
            ),
            (
                F.floor(F.round(F.sum("o_totalprice"), 2) / n_orders * 1e6 + F.lit(0.5))
                / 1e6
            ).alias("avg_matched"),
        )
    )


def q_tpch_q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16-shaped: distinct supplier count per part class, with a part
    anti-filter and a NOT-IN supplier exclusion. The fixture has no
    partsupp, so the observed part↔supplier relation comes from lineitem
    (documented drift; the SHAPE — dim filter + NOT-IN decorrelated to a
    left-anti join + count-distinct rollup — is Q16's). The excluded-
    supplier set is broadcast-sized (a filter over a fixed-size dim);
    the count-distinct shuffles (class, suppkey) pairs once."""
    part = load(spark, sf_dir, "part")
    supplier = load(spark, sf_dir, "supplier")
    lineitem = load(spark, sf_dir, "lineitem")
    part_f = part.where(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    excluded = supplier.where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        lineitem.join(broadcast(part_f), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(excluded), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q_tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13-shaped: distribution of per-customer order counts (customers
    with zero orders included via left outer). Two cascaded hash aggs —
    the first shuffles on c_custkey (SF-scaled but well-distributed), the
    second on the tiny count domain. No comment-pattern exclusion: the
    fixture orders table has no o_comment column (documented drift)."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


def q_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15-shaped: supplier(s) with the maximum quarterly revenue. The
    scalar max is a 1-row broadcast cross join against the per-supplier
    revenue agg (no collect, no unpartitioned window); equality is safe
    because both sides compare the SAME 4dp-rounded values the agg
    emitted. Revenue frame is |supplier|-sized — tiny next to the fact."""
    supplier = load(spark, sf_dir, "supplier")
    lineitem = load(spark, sf_dir, "lineitem")
    rev = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "total_revenue"
            )
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q_tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17-shaped: average yearly revenue lost if small-quantity orders
    for Brand#23 small parts were not taken. The correlated scalar
    subquery (0.2 × per-part avg quantity) decorrelates into a per-part
    agg joined back on partkey — SF-scaled on both sides, so it's an
    equi-join left to AQE, NOT a broadcast. Quantity is integer-valued →
    its sum (and hence the 0.2·avg threshold) is bit-identical across
    engines. Ratio convention (ADVICE r6): the revenue sum sits on the
    2dp price grid, so it is floor-snapped at 1e-2 BEFORE the /7, then
    the ratio is snapped at 1e-4 — identical expressions both engines."""
    part = load(spark, sf_dir, "part")
    lineitem = load(spark, sf_dir, "lineitem")
    part_f = part.where((F.col("p_brand") == "Brand#23") & (F.col("p_size") < 15))
    qty_limit = (
        lineitem.groupBy(F.col("l_partkey").alias("al_partkey"))
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("qty_limit"))
    )
    return (
        lineitem.join(broadcast(part_f), F.col("l_partkey") == F.col("p_partkey"))
        .join(qty_limit, F.col("l_partkey") == F.col("al_partkey"))
        .where(F.col("l_quantity") < F.col("qty_limit"))
        .agg(
            (
                F.floor(
                    (F.floor(F.sum("l_extendedprice") * 1e2 + F.lit(0.5)) / 1e2)
                    / 7.0 * 1e4
                    + F.lit(0.5)
                ) / 1e4
            ).alias("avg_yearly")
        )
    )


def q_tpch_q21_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21-shaped: suppliers who alone held up multi-supplier orders.

    Adapted to the fixture schema (no l_receiptdate/l_commitdate): a line
    is "late" when l_shipdate > o_orderdate + 60 days. For each late line
    on a finished ('F') order, the supplier is blamed iff the order has
    ANOTHER supplier (EXISTS) and NO other supplier was late (NOT
    EXISTS). The Spark side deliberately decorrelates both subqueries
    into ONE per-order aggregate — n_supp = countDistinct(supplier),
    n_late_supp = countDistinct(supplier | late) — a late line is blamed
    iff n_supp > 1 ∧ n_late_supp = 1 (its supplier then IS the sole late
    one). The DuckDB oracle keeps the textbook correlated EXISTS / NOT
    EXISTS formulation, so the witness cross-checks the decorrelation
    itself, not just arithmetic.

    Scale: one fact join li⋈orders on orderkey, one window-free
    aggregation on orderkey (fixed per-key state), then broadcast
    supplier⋈nation. No correlated per-row re-scans — the classic Q21
    trap (two extra lineitem self-joins) is avoided entirely.
    """
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    li = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "late",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("interval 60 days")).cast("int"),
        )
    )
    order_stats = li.groupBy(F.col("l_orderkey").alias("g_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias("n_late_supp"),
    )
    blamed = (
        li.where(F.col("late") == 1)
        .join(order_stats, F.col("l_orderkey") == F.col("g_orderkey"))
        .where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    return (
        blamed.join(broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .where(F.col("n_name") == "NATION_3")
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODE aggregate with a deterministic tiebreak: the most frequent
    order priority per market segment (count DESC, then priority ASC so
    equal counts can't flip the answer between runs or engines) —
    realized as the count-then-row_number argmax, the engine-portable
    spelling of MODE() WITHIN GROUP.

    Scale: (segment, priority) counts combine map-side; the argmax
    window runs on the bounded |segments|×|priorities| frame."""
    counts = (
        load(spark, sf_dir, "orders")
        .join(load(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("n").desc(), "o_orderpriority"
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "c_mktsegment",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").alias("mode_count"),
        )
        .orderBy("c_mktsegment")
    )


def q_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands over the finished-order key sequence ('F'
    status punches holes in the dense orderkey range): island count,
    key span, and total missing keys — the sequence-integrity audit for
    any monotonically-keyed ingest.

    The classic key − row_number() island id needs a GLOBAL window; at
    100 TB that is a single-partition sort, so islands are counted
    WITHOUT it: an island start is a key whose predecessor key is
    absent (left-anti self-join on key−1, shuffle on the 8-byte key),
    and the missing-key total is pure arithmetic on min/max/count. All
    int64."""
    keys = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("k"))
    )
    starts = keys.join(
        keys.select((F.col("k") + 1).alias("k")), "k", "left_anti"
    )
    stats = keys.agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.min("k").cast("bigint").alias("key_min"),
        F.max("k").cast("bigint").alias("key_max"),
    )
    n_islands = starts.agg(F.count("*").cast("bigint").alias("n_islands"))
    return (
        stats.crossJoin(F.broadcast(n_islands))
        .select(
            "n_keys",
            "key_min",
            "key_max",
            "n_islands",
            (F.col("key_max") - F.col("key_min") + 1 - F.col("n_keys"))
            .cast("bigint")
            .alias("total_missing"),
        )
    )


def _q2_eu_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2's (part, supplier) EUROPE cost table BEFORE the checkpoint —
    factored out so tests/test_plans.py can pin the below-checkpoint
    plan (VERDICT r21 #2: the checkpoint hides this subtree from
    broadcast_hint_count, so the part/lineitem-stay-unhinted pin must
    walk the pre-checkpoint frame explicitly)."""
    eu_supp = (
        load(spark, sf_dir, "supplier")
        .join(broadcast(load(spark, sf_dir, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(broadcast(load(spark, sf_dir, "region")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    pair_cost = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"))
    )
    return pair_cost.join(
        broadcast(eu_supp), F.col("l_suppkey") == F.col("s_suppkey")
    )


def q_tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2-shaped: minimum-cost supplier (the correlated-MIN subquery).

    The fixture has no partsupp table, so "supply cost" is derived from
    observed trade: cost(part, supp) = min(l_extendedprice / l_quantity)
    over that pair's lineitems — a double÷double of parquet-exact inputs,
    so the value is bit-identical cross-engine and the correlated
    equality `cost = MIN(cost over EUROPE suppliers of the part)` is
    safe without snapping (min is order-independent; only the OUTPUT
    column is snapped at 1e-6). Ties on the min keep every achieving
    supplier, exactly like the reference Q2.

    Spark side decorrelates: pair costs = one (part,supp) hash agg, the
    per-part EUROPE minimum = a second agg joined back — two map-side-
    combinable aggs instead of a per-row re-scan. Supplier/nation/region
    are broadcast; lineitem is the only SF-scaled input and is touched
    once. ORDER BY is fully tiebroken (acctbal DESC, n_name, s_name,
    p_partkey) so LIMIT 100 is deterministic.
    """
    part = load(spark, sf_dir, "part").where(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 25)
    )
    # eu_cost feeds the per-part minimum AND the final equality join;
    # unmaterialized, column pruning made the two subtrees physically
    # different (ReusedExchange: 0) and lineitem was scanned+aggregated
    # twice (§2.4 pruning-defeats-reuse). Lazy checkpoint: one scan/agg
    # per action — local delta small (A/B min 1.548 → 1.483 s at
    # sf0.1), but at 100 TB this halves the query's lineitem I/O.
    eu_cost = _q2_eu_cost(spark, sf_dir).localCheckpoint(eager=False)
    part_min = eu_cost.groupBy(F.col("l_partkey").alias("m_partkey")).agg(
        F.min("cost").alias("min_cost")
    )
    return (
        eu_cost.join(part_min, (F.col("l_partkey") == F.col("m_partkey"))
                     & (F.col("cost") == F.col("min_cost")))
        # part is SF-scaled: no forced broadcast — AQE picks the strategy
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            (F.floor(F.col("cost") * 1e6 + F.lit(0.5)) / 1e6).alias("supply_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def q_tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11-shaped: (nation, part) inventory positions worth more than a
    global-fraction threshold — the HAVING-over-scalar-subquery shape.

    Value is kept integer-exact end to end: each lineitem contributes
    floor(extprice·(1−disc)·10⁴ + 0.5) as int64 (one deterministic
    product of grid doubles, then one snap), all sums/compares stay in
    int64, so no float ever crosses the engine boundary. The classic
    Q11 fraction (0.0001/SF) is made scale-free as `value > 2× the mean
    group value` — spelled value·n_groups > 2·total in integers.
    Production note: at SF≥1000 the value·n_groups product would need
    DECIMAL(38) — the witness documents the int64 envelope instead of
    silently relying on it.

    Spark: one fact agg on (n_name, l_partkey) with broadcast dims, a
    1-row global agg broadcast back as a cross join (scalar subquery),
    top-100 by TakeOrdered with a unique tiebreak.
    """
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1e4 + F.lit(0.5)
    ).cast("long")
    v = (
        load(spark, sf_dir, "lineitem")
        .join(broadcast(load(spark, sf_dir, "supplier")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(load(spark, sf_dir, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "l_partkey")
        .agg(F.sum(cents).alias("cents"))
    )
    totals = v.agg(
        F.sum("cents").alias("tot"), F.count("*").alias("n_groups")
    )
    return (
        v.crossJoin(broadcast(totals))
        .where(F.col("cents") * F.col("n_groups") > F.lit(2) * F.col("tot"))
        .select(
            "n_name",
            F.col("l_partkey").alias("ps_partkey"),
            (F.col("cents").cast("double") / 1e4).alias("value"),
        )
        .orderBy(F.col("value").desc(), "n_name", "ps_partkey")
        .limit(100)
    )


def q_tpch_q12_priority_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12-shaped: late-shipment priority split by ship year (the
    two-CASE-sum conditional aggregation over a fact join).

    Adapted to the fixture schema (no l_shipmode/commitdate/receiptdate):
    "late" is l_shipdate > o_orderdate + 60 days, and the Q12 shipmode
    grouping becomes the ship year. Counts are pure int64 — nothing to
    snap. Scale: the only shuffle is lineitem⋈orders on orderkey (both
    clustered on it on disk at the 100 TB target → sort-merge with no
    re-partition); the year-group agg is ~6 groups, all map-side.
    """
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("interval 60 days"))
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_year")
    )


def q_tpch_q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20-shaped: suppliers holding a dominant share of a promoted
    part's 1996 volume — the nested-IN-subqueries shape.

    Fixture has no partsupp.ps_availqty, so the Q20 predicate
    `availqty > ½·shipped` becomes `supplier's 1996 shipped qty of a
    'small%' part > ⅓ of the part's total 1996 qty` — compared as
    3·supp_qty > total_qty in int64 (l_quantity is integer-valued in
    the fixture; the cast is exact). A supplier qualifies via EXISTS
    over its parts; the oracle keeps the textbook IN (SELECT …) nesting
    while Spark decorrelates to two hash aggs + a left-semi join, so
    the witness checks the decorrelation.

    Scale: the 1996+name filters prune the scan; both aggs are
    map-side-combinable on 8-byte keys; the final semi join against
    ≤|supplier| keys is broadcast.
    """
    li96 = (
        load(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(
            # part is SF-scaled even after the name filter: left to AQE
            load(spark, sf_dir, "part").where(F.col("p_name").like("small%")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("l_partkey", "l_suppkey", F.col("l_quantity").cast("long").alias("q"))
    )
    part_tot = li96.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("q").alias("total_qty")
    )
    supp_part = li96.groupBy("l_suppkey", "l_partkey").agg(F.sum("q").alias("supp_qty"))
    qualifying = (
        supp_part.join(part_tot, F.col("l_partkey") == F.col("t_partkey"))
        .where(F.col("supp_qty") * 3 > F.col("total_qty"))
        .select(F.col("l_suppkey").alias("q_suppkey"))
    )
    return (
        load(spark, sf_dir, "supplier")
        .join(broadcast(qualifying), F.col("s_suppkey") == F.col("q_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_name", "s_suppkey")
    )


def q_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional / boolean aggregate surface: count_if, bool_or,
    bool_and, and FILTER-style conditional sums — the predicates-as-
    aggregates family (all algebraic: map-side combinable)."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.count_if(F.col("o_totalprice") > 100000).alias("n_big"),
            F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
            F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
            F.round(
                F.sum(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")).otherwise(F.lit(0.0))),
                2,
            ).alias("finished_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# X10-X13: aggregation
# ---------------------------------------------------------------------------

def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming interval join: purchases × same-user
    clicks within the preceding hour (second granularity). The streaming
    version (watermark-bounded state) is `streaming.stream.
    interval_join_streams`, asserted equal to this in test_streaming."""
    events = load(spark, sf_dir, "events").withColumn(
        "ts_sec", F.expr("unix_millis(ts) div 1000")
    )
    c = events.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"),
        F.col("event_id").alias("click_id"),
        F.col("ts_sec").alias("click_sec"),
    )
    p = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts_sec").alias("purchase_sec"),
    )
    cond = (
        (F.col("cu") == F.col("pu"))
        & (F.col("click_sec") <= F.col("purchase_sec"))
        & (F.col("click_sec") >= F.col("purchase_sec") - 3600)
    )
    return p.join(c, cond).select(
        "purchase_id", "click_id", F.col("pu").alias("user_id"),
        (F.col("purchase_sec") - F.col("click_sec")).alias("gap_sec"),
    )


def q_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (t-digest-style, mergeable map-side) — the scale
    path behind q_stats_percentiles' exact sort-based variant. Rows-only:
    sketch results are engine-specific by construction."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", [0.5, 0.95], 1000).alias("approx_p"),
        )
        .select(
            "l_returnflag",
            F.round(F.element_at("approx_p", 1), 2).alias("p50"),
            F.round(F.element_at("approx_p", 2), 2).alias("p95"),
        )
    )


def q_agg_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (hash agg, map-side partials)."""
    return (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# q_agg_minmax RETIRED r19 (VERDICT r18 #3): a strict plan-shape subset
# of retained witnesses — filtered hash agg with map-side partials is
# q_agg_hash; grouped count-distinct (Expand) is q_tpch_q16_supplier_count;
# global count-distinct is q_distinct_count. Last driver row: green r16.


def q_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global distinct counts (two-phase partial-distinct aggregation)."""
    return load(spark, sf_dir, "orders").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.countDistinct("o_orderpriority").alias("n_prio"),
        F.count("*").alias("n_orders"),
    )


# q_distinct_rows RETIRED r19 (VERDICT r18 #3): a keys-only
# HashAggregate — the same physical shape q_distinct_count's partial
# distinct and q_set_except's distinct set-op retain. Last driver row:
# green r17.


def q_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct (no oracle — sketch values are
    engine-specific; the driver records a rows-only check)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"))
    )


def q_rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (region, nation) totals over customer accounts."""
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    joined = (
        customer
        .join(broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.rollup("r_name", "n_name").agg(
        F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
        F.count("*").alias("n_customers"),
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the SQL surface (the engine accepts
    SQL as well as DataFrame plans — both land in the same Catalyst IR)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               round(sum(o_totalprice), 2) AS sum_price,
               count(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


def q_cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (returnflag, linestatus) over lineitem quantities."""
    return load(spark, sf_dir, "lineitem").cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count("*").alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# X14-X17: window functions, sort/limit/top-k
# ---------------------------------------------------------------------------

def q_window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / ntile per market segment."""
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        load(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            "c_mktsegment",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
            (F.floor(F.percent_rank().over(w) * 1000000 + 0.5) / 1000000).alias("pct_rank"),
            (F.floor(F.cume_dist().over(w) * 1000000 + 0.5) / 1000000).alias("cume"),
        )
    )


def q_window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag / lead / first over customer order history."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.round(F.lag("o_totalprice", 1).over(w), 2).alias("prev_price"),
            F.round(F.lead("o_totalprice", 1).over(w), 2).alias("next_price"),
            F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
            F.round(F.last("o_totalprice").over(wfull), 2).alias("last_price"),
        )
    )


def q_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + moving average frames over the events stream."""
    w = Window.partitionBy("user_id").orderBy("event_id")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    moving = w.rowsBetween(-3, Window.currentRow)
    return (
        load(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            "value",
            (F.floor(F.sum("value").over(running) * 10000 + 0.5) / 10000).alias("running_sum"),
            (F.floor(F.avg("value").over(moving) * 10000 + 0.5) / 10000).alias("moving_avg4"),
        )
    )


def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 orders by price (TakeOrderedAndProject — no full sort)."""
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per priority via ranked window (single shuffle)."""
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        load(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# X18: set operations
# ---------------------------------------------------------------------------

def q_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set operations: INTERSECT ALL / EXCEPT ALL preserve
    duplicate multiplicities (min / truncated-difference of per-value
    counts), unlike the distinct variants the other set witnesses cover.
    Operands: nation keys of BUILDING-segment customers vs suppliers —
    both multisets carry real duplicate counts at any SF."""
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    c = customer.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = supplier.select(F.col("s_nationkey").alias("nationkey"))
    inter = c.intersectAll(s).groupBy("nationkey").agg(
        F.count("*").alias("n")
    ).withColumn("op", F.lit("intersect_all"))
    exc = c.exceptAll(s).groupBy("nationkey").agg(
        F.count("*").alias("n")
    ).withColumn("op", F.lit("except_all"))
    return inter.unionByName(exc)


def q_sort_null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS FIRST / NULLS LAST ordering semantics: rank each
    user's events by props['variant'] (NULL for most rows) under both
    orderings and aggregate rank sums per null-ness class — pinning the
    null placement that silently differs between engine defaults. Windows
    are user-partitioned (the package-wide no-global-window rule); the
    global rank SUMS are placement-sensitive, so the semantics still
    show in the oracle compare."""
    k_val = F.get_json_object("props", "$.k").cast("bigint")
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        # NULL for 2/3 of rows (k not divisible by 3) — deterministic
        F.when(k_val % 3 == 0, k_val).alias("variant"),
    )
    first = Window.partitionBy("user_id").orderBy(
        F.col("variant").asc_nulls_first(), F.col("event_id")
    )
    last = Window.partitionBy("user_id").orderBy(
        F.col("variant").asc_nulls_last(), F.col("event_id")
    )
    ranked = ev.select(
        "event_id",
        "variant",
        F.row_number().over(first).alias("rk_nulls_first"),
        F.row_number().over(last).alias("rk_nulls_last"),
    )
    return ranked.groupBy(F.col("variant").isNull().alias("is_null")).agg(
        F.count("*").alias("n"),
        F.sum("rk_nulls_first").alias("sum_rk_first"),
        F.sum("rk_nulls_last").alias("sum_rk_last"),
    )


def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (SQL surface): for each high-balance
    customer, the top-2 orders by price from a lateral per-customer
    subquery — the SQL spelling of top-k-per-group. Catalyst decorrelates
    this into a ranked window, which is exactly what the plan should be
    at scale (no per-row re-execution)."""
    _register_sql_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 2) AS price
        FROM customer c,
        LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
        ) t
        WHERE c.c_acctbal > 9000
        """
    )


def q_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): every supplier walks the
    implicit binary-tree hierarchy parent(k) = k div 2 up to the root,
    accumulating depth and the chain's account-balance sum — the
    org-chart / BOM transitive-closure shape that needed iterative
    driver loops before recursive CTEs landed. Chain length is
    log2(maxkey) ≤ ~17, so the recursion is bounded and each step is
    one equi-join against the (broadcast-sized) supplier dim."""
    _register_sql_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE walk AS (
            SELECT s_suppkey AS origin, CAST(s_suppkey AS BIGINT) AS node,
                   0 AS depth, round(s_acctbal, 2) AS bal
            FROM supplier
            UNION ALL
            SELECT w.origin, w.node div 2 AS node, w.depth + 1,
                   coalesce(round(s.s_acctbal, 2), 0.0) AS bal
            FROM walk w LEFT JOIN supplier s ON s.s_suppkey = w.node div 2
            WHERE w.node > 0
        )
        SELECT origin AS s_suppkey,
               max(depth) AS depth_to_root,
               round(sum(bal), 2) AS chain_balance
        FROM walk
        GROUP BY origin
        """
    )


def _register_sql_views(spark: SparkSession, sf_dir: str) -> None:
    """Temp views for SQL-surface witnesses — re-registered per call
    (createOrReplaceTempView is idempotent and sf_dir can change
    between calls, so no memoization)."""
    from gasket_rs_spark.tables import register_views

    register_views(spark, sf_dir)


# q_set_union and q_set_intersect RETIRED r19 (VERDICT r18 #3):
# bare UNION ALL is a shape retained inside q_set_ops_all (its two
# tagged branches union) and a dozen composite witnesses; INTERSECT
# (Aggregate + left-semi) stays covered by q_join_semi (semi shape),
# q_set_ops_all (intersectAll multiset), and q_set_except (distinct
# set-op shape). Last driver rows: green r16 both.


def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): orders with no lineitems."""
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    return (
        orders.select(F.col("o_orderkey").alias("orderkey"))
        .subtract(lineitem.select(F.col("l_orderkey").alias("orderkey")))
    )


_SCALAR_SUBQ_SQL = """
    WITH above AS (
        SELECT c.c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n_above_avg
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
              * (SELECT CAST(count(*) AS BIGINT) FROM orders o2
                 WHERE o2.o_custkey = o.o_custkey)
              > (SELECT CAST(sum(CAST(floor(o2.o_totalprice * 100 + 0.5)
                                      AS BIGINT)) AS BIGINT)
                 FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        GROUP BY 1
    ), idle AS (
        SELECT c.c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n_idle
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        GROUP BY 1
    ), segs AS (
        SELECT c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n_customers
        FROM customer GROUP BY 1
    )
    SELECT s.segment, s.n_customers,
           CAST(coalesce(a.n_above_avg, 0) AS BIGINT) AS n_above_avg,
           CAST(coalesce(i.n_idle, 0) AS BIGINT) AS n_idle
    FROM segs s
    LEFT JOIN above a ON s.segment = a.segment
    LEFT JOIN idle i ON s.segment = i.segment
    ORDER BY s.segment
"""


def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORRELATED SCALAR SUBQUERY + NOT EXISTS surface witness: orders
    priced above their own customer's average (the avg compare is the
    integer cross-multiplication cents·count > Σcents — never a float
    average, whose sum order differs across engines), and customers
    with no orders at all, per market segment. One ANSI statement runs
    VERBATIM on Spark SQL and DuckDB — Catalyst decorrelates both
    subqueries into aggregate-joins (RewriteCorrelatedScalarSubquery),
    so the executed plan is two hash joins, not a per-row probe."""
    _register_sql_views(spark, sf_dir)
    return spark.sql(_SCALAR_SUBQ_SQL)


def q_agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise / boolean aggregate surface: BIT_AND / BIT_OR / BIT_XOR
    over a derived flag word plus BOOL_AND / BOOL_OR per order priority
    — the aggregate family engines use for permission masks, feature
    flags, and set-membership fingerprints. The flag word packs three
    order predicates into bits 0..2, so the bit aggregates have
    non-trivial values on every group.

    Pure integer/boolean — nothing to snap; all three bit aggregates
    are map-side combinable (associative + commutative), so at 100 TB
    they reduce like any sum: partial per partition, one k-row
    exchange."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderpriority",
        (
            F.when(F.col("o_totalprice") > 100000, 1).otherwise(0)
            + F.when(F.col("o_orderstatus") == "F", 2).otherwise(0)
            + F.when(F.col("o_custkey") % 2 == 0, 4).otherwise(0)
        )
        .cast("bigint")
        .alias("flags"),
        (F.col("o_totalprice") > 1000).alias("pricey"),
    )
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.expr("bit_and(flags)").cast("bigint").alias("flags_and"),
            F.expr("bit_or(flags)").cast("bigint").alias("flags_or"),
            F.expr("bit_xor(flags)").cast("bigint").alias("flags_xor"),
            F.expr("bool_and(pricey)").alias("all_pricey"),
            F.expr("bool_or(pricey)").alias("any_pricey"),
        )
        .orderBy("o_orderpriority")
    )


ORACLES: dict[str, str] = {
    "scalar_subquery": _SCALAR_SUBQ_SQL,
    "agg_bitwise": """
        WITH o AS (
            SELECT o_orderpriority,
                   CAST(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END
                        + CASE WHEN o_orderstatus = 'F' THEN 2 ELSE 0 END
                        + CASE WHEN o_custkey % 2 = 0 THEN 4 ELSE 0 END
                        AS BIGINT) AS flags,
                   o_totalprice > 1000 AS pricey
            FROM orders
        )
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(bit_and(flags) AS BIGINT) AS flags_and,
               CAST(bit_or(flags) AS BIGINT) AS flags_or,
               CAST(bit_xor(flags) AS BIGINT) AS flags_xor,
               bool_and(pricey) AS all_pricey,
               bool_or(pricey) AS any_pricey
        FROM o GROUP BY 1 ORDER BY 1
    """,
    "flagship_revenue_by_region": """
        SELECT r_name,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY r_name
    """,
    "scan_filter_project": """
        SELECT l_orderkey, l_linenumber, l_quantity,
               l_extendedprice * (1 - l_discount) AS net_price
        FROM lineitem
        WHERE l_quantity > 30 AND l_returnflag = 'R'
    """,
    "filter_in_between_like": """
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
          AND o_totalprice BETWEEN 1000.0 AND 200000.0
          AND o_orderstatus LIKE 'F%'
          AND o_custkey IS NOT NULL
    """,
    "join_inner": """
        SELECT p_brand, count(*) AS n_lines, round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """,
    "join_broadcast": """
        SELECT n_name, count(*) AS n_customers, round(avg(c_acctbal), 6) AS avg_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "join_left": """
        SELECT c_custkey,
               count(o_orderkey) AS n_big_orders,
               round(sum(o_totalprice), 2) AS sum_big
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey AND o_totalprice > 350000.0
        GROUP BY c_custkey
    """,
    "join_right": """
        SELECT p_partkey,
               count(l_orderkey) AS n_big_lines,
               round(sum(l_quantity), 2) AS sum_big_qty
        FROM (SELECT * FROM lineitem WHERE l_quantity > 45) li
        RIGHT JOIN part ON l_partkey = p_partkey
        GROUP BY p_partkey
    """,
    "join_full": """
        SELECT coalesce(nk_c, nk_s) AS nationkey, n_customers, n_suppliers
        FROM (SELECT c_nationkey AS nk_c, count(*) AS n_customers FROM customer GROUP BY 1) c
        FULL JOIN (SELECT s_nationkey AS nk_s, count(*) AS n_suppliers FROM supplier GROUP BY 1) s
          ON nk_c = nk_s
    """,
    "join_semi": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
    "join_anti": """
        SELECT c_custkey, c_name
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
    """,
    "join_cross": """
        SELECT r_name, s_name, r_name || '/' || s_name AS pair
        FROM region CROSS JOIN supplier
    """,
    "join_theta_range": """
        SELECT o_orderpriority, count(*) AS n_late, round(avg(l_quantity), 4) AS avg_qty
        FROM lineitem JOIN orders
          ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 365 DAY
        GROUP BY o_orderpriority
    """,
    "asof_join": """
        WITH c AS (
            SELECT user_id, epoch_ms(ts) // 1000 AS click_sec, event_id AS click_id
            FROM events WHERE event_type = 'click'
        ), p AS (
            SELECT user_id, epoch_ms(ts) // 1000 AS purchase_sec, event_id AS purchase_id
            FROM events WHERE event_type = 'purchase'
        )
        SELECT purchase_id, user_id, purchase_sec, click_id, click_sec
        FROM (
            SELECT p.purchase_id, p.user_id, p.purchase_sec, c.click_id, c.click_sec,
                   row_number() OVER (PARTITION BY p.purchase_id
                                      ORDER BY c.click_sec DESC, c.click_id DESC) AS rn
            FROM p LEFT JOIN c
              ON p.user_id = c.user_id AND c.click_sec <= p.purchase_sec
        ) t
        WHERE rn = 1
    """,
    "tpch_q3_unshipped": """
        SELECT o_orderkey, o_orderdate,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_shipdate > TIMESTAMP '1998-06-01'
          AND o_orderdate < TIMESTAMP '1998-06-01'
          AND c_mktsegment = 'BUILDING'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """,
    "tpch_q7_volume": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS volume
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE n1.n_name <> n2.n_name
        GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
    """,
    "tpch_q4_priority": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
    """,
    "tpch_q5_local_supplier": """
        SELECT r_name, n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY r_name, n_name
    """,
    "tpch_q14_promo": """
        SELECT round(100 * sum(CASE WHEN p_type = 'PROMO'
                                    THEN l_extendedprice * (1 - l_discount)
                                    ELSE 0.0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-03-01'
    """,
    "tpch_q18_big_orders": """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate,
               round(o_totalprice, 2) AS o_totalprice,
               round(big.sum_qty, 2) AS total_qty
        FROM orders
        JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING sum(l_quantity) > 200) big
          ON o_orderkey = big.l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20
    """,
    "tpch_q19_disjunctive": """
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "tpch_q22_idle_customers": """
        SELECT n_name, count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1999-01-01')
        GROUP BY n_name
    """,
    "tpch_q1_pricing": """
        SELECT l_returnflag, l_linestatus,
               round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
               floor(round(sum(l_extendedprice), 2) / count(*) * 1000000 + 0.5) / 1000000 AS avg_price,
               floor(round(sum(l_discount), 2) / count(*) * 1000000 + 0.5) / 1000000 AS avg_disc,
               count(*) AS count_order,
               floor(round(CAST(sum(l_quantity) AS DOUBLE), 2) / count(*) * 1000000 + 0.5) / 1000000 AS avg_qty
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1999-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "tpch_q6_forecast": """
        SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    "tpch_q8_market_share": """
        SELECT year(o_orderdate) AS o_year,
               -- snap both grid-valued sums at 1e-4 BEFORE the ratio
               -- (same IEEE expression as the Spark side), then snap the
               -- ratio at 1e-6 — see q_tpch_q8_market_share docstring.
               floor((floor(sum(CASE WHEN n2.n_name = 'NATION_7'
                                     THEN l_extendedprice * (1 - l_discount)
                                     ELSE 0.0 END) * 10000 + 0.5) / 10000)
                     / (floor(sum(l_extendedprice * (1 - l_discount))
                              * 10000 + 0.5) / 10000)
                     * 1000000 + 0.5) / 1000000
                 AS mkt_share
        FROM lineitem
        JOIN part      ON l_partkey = p_partkey
        JOIN supplier  ON l_suppkey = s_suppkey
        JOIN orders    ON l_orderkey = o_orderkey
        JOIN customer  ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region    ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE p_type = 'ECONOMY'
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY year(o_orderdate)
    """,
    "tpch_q9_profit": """
        SELECT n_name, year(o_orderdate) AS o_year,
               round(sum(l_extendedprice * (1 - l_discount)
                         - p_retailprice * l_quantity), 4) AS sum_profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_type = 'STANDARD'
        GROUP BY n_name, year(o_orderdate)
    """,
    "unpivot_measures": """
        WITH long AS (
            SELECT l_orderkey, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
            UNION ALL
            SELECT l_orderkey, 'l_extendedprice', l_extendedprice FROM lineitem
            UNION ALL
            SELECT l_orderkey, 'l_discount', l_discount FROM lineitem
        )
        SELECT measure, count(*) AS n, round(sum(val), 2) AS total,
               min(val) AS min_val, max(val) AS max_val
        FROM long
        GROUP BY measure
    """,
    "agg_listagg": """
        SELECT n_name,
               string_agg(c_name, '|' ORDER BY c_name) AS rich_customers,
               count(*) AS n_rich
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > 9000.0
        GROUP BY n_name
    """,
    "null_semantics": """
        SELECT c_mktsegment,
               count(*) AS n_rows,
               count(o_orderkey) AS n_orders,
               CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_unmatched,
               round(sum(coalesce(o_totalprice, 0.0)), 2) AS sum_coalesced,
               floor(round(sum(o_totalprice), 2) / count(o_orderkey) * 1000000 + 0.5)
                 / 1000000 AS avg_matched
        FROM customer
        LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000.0) o
          ON c_custkey = o_custkey
        GROUP BY c_mktsegment
    """,
    "tpch_q16_supplier_count": """
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#13'
          AND p_type <> 'PROMO'
          AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
    """,
    "tpch_q13_order_distribution": """
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        ) per_cust
        GROUP BY c_count
    """,
    "tpch_q15_top_supplier": """
        WITH revenue AS (
            SELECT l_suppkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    "tpch_q17_small_quantity": """
        SELECT floor(floor(sum(l_extendedprice) * 100 + 0.5) / 100
                     / 7.0 * 10000 + 0.5) / 10000 AS avg_yearly
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#23' AND p_size < 15
          AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                            FROM lineitem l2
                            WHERE l2.l_partkey = lineitem.l_partkey)
    """,
    "agg_conditional": """
        SELECT o_orderpriority,
               count(*) AS n_orders,
               count(*) FILTER (o_totalprice > 100000) AS n_big,
               bool_or(o_orderstatus = 'F') AS any_finished,
               bool_and(o_totalprice > 0) AS all_positive,
               round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END), 2)
                   AS finished_revenue
        FROM orders
        GROUP BY o_orderpriority
    """,
    "set_ops_all": """
        WITH c AS (
            SELECT c_nationkey AS nationkey FROM customer
            WHERE c_mktsegment = 'BUILDING'
        ), s AS (
            SELECT s_nationkey AS nationkey FROM supplier
        )
        SELECT nationkey, count(*) AS n, 'intersect_all' AS op
        FROM (SELECT * FROM c INTERSECT ALL SELECT * FROM s)
        GROUP BY nationkey
        UNION ALL
        SELECT nationkey, count(*) AS n, 'except_all' AS op
        FROM (SELECT * FROM c EXCEPT ALL SELECT * FROM s)
        GROUP BY nationkey
    """,
    "sort_null_ordering": """
        WITH ev AS (
            SELECT event_id, user_id,
                   CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) % 3 = 0
                        THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END
                       AS variant
            FROM events
        ), ranked AS (
            SELECT event_id, variant,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY variant ASC NULLS FIRST, event_id)
                       AS rk_nulls_first,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY variant ASC NULLS LAST, event_id)
                       AS rk_nulls_last
            FROM ev
        )
        SELECT variant IS NULL AS is_null,
               count(*) AS n,
               CAST(sum(rk_nulls_first) AS BIGINT) AS sum_rk_first,
               CAST(sum(rk_nulls_last) AS BIGINT) AS sum_rk_last
        FROM ranked
        GROUP BY variant IS NULL
    """,
    "recursive_hierarchy": """
        WITH RECURSIVE walk AS (
            SELECT s_suppkey AS origin, CAST(s_suppkey AS BIGINT) AS node,
                   0 AS depth, round(s_acctbal, 2) AS bal
            FROM supplier
            UNION ALL
            SELECT w.origin, w.node // 2 AS node, w.depth + 1,
                   coalesce(round(s.s_acctbal, 2), 0.0) AS bal
            FROM walk w LEFT JOIN supplier s ON s.s_suppkey = w.node // 2
            WHERE w.node > 0
        )
        SELECT origin AS s_suppkey,
               CAST(max(depth) AS INT) AS depth_to_root,
               round(sum(bal), 2) AS chain_balance
        FROM walk
        GROUP BY origin
    """,
    "lateral_topk": """
        SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 2) AS price
        FROM customer c,
        LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
        ) t
        WHERE c.c_acctbal > 9000
    """,
    "tpch_q21_late_supplier": """
        WITH li AS (
            SELECT l.*, o.o_orderdate
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderstatus = 'F'
        )
        SELECT s_name, count(*) AS numwait
        FROM li l1
        JOIN supplier ON l1.l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
          AND l1.l_shipdate > l1.o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM li l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM li l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > l3.o_orderdate + INTERVAL 60 DAY)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """,
    "agg_mode": """
        WITH counts AS (
            SELECT c_mktsegment, o_orderpriority,
                   CAST(count(*) AS BIGINT) AS n
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1, 2
        )
        SELECT c_mktsegment, o_orderpriority AS mode_priority,
               n AS mode_count
        FROM (SELECT *, row_number() OVER (PARTITION BY c_mktsegment
                  ORDER BY n DESC, o_orderpriority) AS rn
              FROM counts)
        WHERE rn = 1
        ORDER BY c_mktsegment
    """,
    "gaps_islands": """
        WITH keys AS (
            SELECT o_orderkey AS k FROM orders WHERE o_orderstatus = 'F'
        ), starts AS (
            SELECT a.k FROM keys a LEFT JOIN keys b ON b.k = a.k - 1
            WHERE b.k IS NULL
        )
        SELECT CAST((SELECT count(*) FROM keys) AS BIGINT) AS n_keys,
               CAST((SELECT min(k) FROM keys) AS BIGINT) AS key_min,
               CAST((SELECT max(k) FROM keys) AS BIGINT) AS key_max,
               CAST((SELECT count(*) FROM starts) AS BIGINT) AS n_islands,
               CAST((SELECT max(k) FROM keys) - (SELECT min(k) FROM keys) + 1
                    - (SELECT count(*) FROM keys) AS BIGINT) AS total_missing
    """,
    "tpch_q2_min_cost_supplier": """
        WITH eu_supp AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
        ),
        pair_cost AS (
            SELECT l_partkey, l_suppkey,
                   min(l_extendedprice / l_quantity) AS cost
            FROM lineitem GROUP BY 1, 2
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
               floor(cost * 1000000 + 0.5) / 1000000 AS supply_cost
        FROM part
        JOIN pair_cost pc ON p_partkey = pc.l_partkey
        JOIN eu_supp s ON pc.l_suppkey = s.s_suppkey
        WHERE p_type = 'STANDARD' AND p_size <= 25
          AND pc.cost = (SELECT min(pc2.cost)
                         FROM pair_cost pc2
                         JOIN eu_supp s2 ON pc2.l_suppkey = s2.s_suppkey
                         WHERE pc2.l_partkey = p_partkey)
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
    "tpch_q11_important_stock": """
        WITH v AS (
            SELECT n_name, l_partkey,
                   CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                       * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS cents
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            GROUP BY 1, 2
        ),
        t AS (SELECT CAST(sum(cents) AS BIGINT) AS tot,
                     CAST(count(*) AS BIGINT) AS n_groups FROM v)
        SELECT n_name, l_partkey AS ps_partkey,
               CAST(cents AS DOUBLE) / 10000 AS value
        FROM v, t
        WHERE cents * n_groups > 2 * tot
        ORDER BY value DESC, n_name, ps_partkey
        LIMIT 100
    """,
    "tpch_q12_priority_lateness": """
        SELECT year(l_shipdate) AS ship_year,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        GROUP BY 1
        ORDER BY 1
    """,
    "tpch_q20_part_promotion": """
        WITH li96 AS (
            SELECT l_partkey, l_suppkey, CAST(l_quantity AS BIGINT) AS q
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
              AND p_name LIKE 'small%'
        )
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_suppkey IN (
            SELECT sp.l_suppkey
            FROM (SELECT l_suppkey, l_partkey, CAST(sum(q) AS BIGINT) AS supp_qty
                  FROM li96 GROUP BY 1, 2) sp
            JOIN (SELECT l_partkey, CAST(sum(q) AS BIGINT) AS total_qty
                  FROM li96 GROUP BY 1) pt
              ON sp.l_partkey = pt.l_partkey
            WHERE sp.supp_qty * 3 > pt.total_qty)
        ORDER BY s_name, s_suppkey
    """,
    "interval_join": """
        WITH e AS (
            SELECT user_id, event_id, event_type, epoch_ms(ts) // 1000 AS ts_sec
            FROM events
        )
        SELECT p.event_id AS purchase_id, c.event_id AS click_id,
               p.user_id AS user_id,
               p.ts_sec - c.ts_sec AS gap_sec
        FROM e p JOIN e c
          ON p.event_type = 'purchase' AND c.event_type = 'click'
         AND c.user_id = p.user_id
         AND c.ts_sec <= p.ts_sec
         AND c.ts_sec >= p.ts_sec - 3600
    """,
    "agg_hash": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "distinct_count": """
        SELECT count(DISTINCT o_custkey) AS n_cust,
               count(DISTINCT o_orderpriority) AS n_prio,
               count(*) AS n_orders
        FROM orders
    """,
    "rollup_agg": """
        SELECT r_name, n_name,
               round(sum(c_acctbal), 2) AS sum_acctbal,
               count(*) AS n_customers
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
    """,
    "grouping_sets": """
        SELECT o_orderstatus, o_orderpriority,
               round(sum(o_totalprice), 2) AS sum_price,
               count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    "cube_agg": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               count(*) AS n_lines
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "window_ranking": """
        SELECT c_custkey, c_mktsegment, c_acctbal,
               row_number() OVER w AS rn,
               rank()       OVER w AS rnk,
               dense_rank() OVER w AS drnk,
               ntile(4)     OVER w AS quartile,
               floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000 AS pct_rank,
               floor(cume_dist() OVER w * 1000000 + 0.5) / 1000000 AS cume
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
    "window_analytic": """
        SELECT o_orderkey, o_custkey, o_totalprice,
               round(lag(o_totalprice, 1)  OVER w, 2) AS prev_price,
               round(lead(o_totalprice, 1) OVER w, 2) AS next_price,
               round(first_value(o_totalprice) OVER w, 2) AS first_price,
               round(last_value(o_totalprice) OVER
                     (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS last_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "window_frames": """
        SELECT event_id, user_id, value,
               floor(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 10000 + 0.5) / 10000 AS running_sum,
               floor(avg(value) OVER (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) * 10000 + 0.5) / 10000 AS moving_avg4
        FROM events
    """,
    "sort_limit": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
    "topk_per_group": """
        SELECT o_orderpriority, rn, o_orderkey, o_totalprice
        FROM (
            SELECT o_orderpriority, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders
        ) t
        WHERE rn <= 3
    """,
    "set_except": """
        SELECT o_orderkey AS orderkey FROM orders
        EXCEPT
        SELECT l_orderkey AS orderkey FROM lineitem
    """,
}

# Names with no oracle entry get the driver's rows-only check.
ROWS_ONLY: frozenset[str] = frozenset({"approx_count_distinct"})


def queries() -> dict[str, object]:
    return {
        name[len("q_"):]: fn
        for name, fn in globals().items()
        if name.startswith("q_") and callable(fn)
    }
