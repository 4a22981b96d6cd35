"""Data-profiling operators — the inspection utilities an ingestion
pipeline runs before/after every batch (null counts, cardinalities,
ranges, histograms). All single-pass aggregates; the per-column profile
is a union of narrow aggregations so the output shape is stable however
many columns are profiled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gasket_rs_spark.tables import load


def profile_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """One profile row per column: nulls, distincts, min/max as strings
    (stringly-typed so heterogeneous columns stack in one DataFrame)."""
    parts = []
    for c in columns:
        parts.append(
            df.agg(
                F.lit(c).alias("column"),
                F.count("*").alias("n_rows"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias("n_null"),
                F.countDistinct(c).alias("n_distinct"),
                F.min(c).cast("string").alias("min_val"),
                F.max(c).cast("string").alias("max_val"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile of the orders table's key columns."""
    return profile_columns(
        load(spark, sf_dir, "orders"),
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"],
    )


def q_histogram_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram of order totals (20 bins over [0, 500k)) —
    one hash aggregation over computed bin ids; out-of-range clamps to
    the edge bins."""
    orders = load(spark, sf_dir, "orders")
    width = 25000.0
    bin_id = F.least(
        F.greatest(F.floor(F.col("o_totalprice") / width), F.lit(0)), F.lit(19)
    ).cast("bigint")
    return (
        orders.groupBy(bin_id.alias("bin"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


ORACLES: dict[str, str] = {
    "profile_columns": """
        SELECT 'o_orderkey' AS column, count(*) AS n_rows,
               sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS n_null,
               count(DISTINCT o_orderkey) AS n_distinct,
               CAST(min(o_orderkey) AS VARCHAR) AS min_val,
               CAST(max(o_orderkey) AS VARCHAR) AS max_val
        FROM orders
        UNION ALL
        SELECT 'o_custkey', count(*),
               sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END),
               count(DISTINCT o_custkey),
               CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus', count(*),
               sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END),
               count(DISTINCT o_orderstatus),
               CAST(min(o_orderstatus) AS VARCHAR), CAST(max(o_orderstatus) AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_totalprice', count(*),
               sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END),
               count(DISTINCT o_totalprice),
               CAST(min(o_totalprice) AS VARCHAR), CAST(max(o_totalprice) AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', count(*),
               sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END),
               count(DISTINCT o_orderpriority),
               CAST(min(o_orderpriority) AS VARCHAR), CAST(max(o_orderpriority) AS VARCHAR)
        FROM orders
    """,
    "histogram_value": """
        SELECT CAST(least(greatest(floor(o_totalprice / 25000.0), 0), 19) AS BIGINT) AS bin,
               count(*) AS n,
               round(min(o_totalprice), 2) AS lo,
               round(max(o_totalprice), 2) AS hi
        FROM orders
        GROUP BY 1
    """,
}
