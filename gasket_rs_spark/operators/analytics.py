"""Event-sequence analytics over the events table: ordered funnel
conversion and retention cohorts — the product-analytics pair every
event warehouse runs, expressed as windows + hash aggregations (no
self-joins, no per-user driver logic).

Scale notes: both operators are one shuffle on user_id (window or
groupBy) followed by a tiny aggregation; cohort/stage cardinality is
bounded (weeks × offsets, 4 funnel stages) so the final aggregate is a
broadcast-sized result at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gasket_rs_spark.tables import load


def _events_sec(spark: SparkSession, sf_dir: str) -> DataFrame:
    # floor, not `div` (truncation toward zero): the DuckDB oracles use
    # `//` which floors, and the two diverge on pre-1970 timestamps.
    return load(spark, sf_dir, "events").withColumn(
        "ts_sec", F.floor(F.unix_millis("ts") / F.lit(1000))
    )


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered signup → click → purchase funnel.

    Per user: first signup, first click at-or-after that signup, first
    purchase at-or-after that click — three chained per-user windows
    (one shuffle; each stage's threshold is the previous window column).
    Emits the global stage counts: users entering, completing stage 1/2/3.
    """
    w = Window.partitionBy("user_id")
    ev = _events_sec(spark, sf_dir)
    staged = (
        ev.withColumn(
            "t_signup",
            F.min(F.when(F.col("event_type") == "signup", F.col("ts_sec"))).over(w),
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts_sec") >= F.col("t_signup")),
                    F.col("ts_sec"),
                )
            ).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts_sec") >= F.col("t_click")),
                    F.col("ts_sec"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.min("t_signup").alias("t_signup"),
        F.min("t_click").alias("t_click"),
        F.min("t_purchase").alias("t_purchase"),
    )
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.count("t_signup").alias("n_signed_up"),
        F.count("t_click").alias("n_clicked_after"),
        F.count("t_purchase").alias("n_purchased_after"),
    )


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-activity week,
    counted per week-offset of later activity — first-touch via one
    per-user window, then a distinct over the bounded (cohort, offset,
    user) triples and a hash count."""
    ev = _events_sec(spark, sf_dir)
    w = Window.partitionBy("user_id")
    # floor matches the oracle's integer `//` for both signs; the old
    # double-divide + cast("bigint") truncated toward zero instead.
    week = F.floor(F.col("ts_sec") / F.lit(604800)).cast("bigint")
    cohorted = ev.withColumn("week", week).withColumn(
        "cohort_week", F.min("week").over(w)
    )
    return (
        cohorted.select(
            "user_id", "cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset")
        )
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_users"))
    )


ORACLES: dict[str, str] = {
    "funnel_conversion": """
        WITH e AS (
            SELECT user_id, event_type, epoch_ms(ts) // 1000 AS ts_sec FROM events
        ), s1 AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'signup' THEN ts_sec END) AS t_signup
            FROM e GROUP BY user_id
        ), s2 AS (
            SELECT e.user_id, s1.t_signup,
                   min(CASE WHEN e.event_type = 'click'
                            AND e.ts_sec >= s1.t_signup THEN e.ts_sec END) AS t_click
            FROM e JOIN s1 USING (user_id)
            GROUP BY e.user_id, s1.t_signup
        ), s3 AS (
            SELECT e.user_id, s2.t_signup, s2.t_click,
                   min(CASE WHEN e.event_type = 'purchase'
                            AND e.ts_sec >= s2.t_click THEN e.ts_sec END) AS t_purchase
            FROM e JOIN s2 USING (user_id)
            GROUP BY e.user_id, s2.t_signup, s2.t_click
        )
        SELECT count(*) AS n_users,
               count(t_signup) AS n_signed_up,
               count(t_click) AS n_clicked_after,
               count(t_purchase) AS n_purchased_after
        FROM s3
    """,
    "retention_cohorts": """
        WITH e AS (
            SELECT user_id, (epoch_ms(ts) // 1000) // 604800 AS week FROM events
        ), c AS (
            SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id
        )
        SELECT cohort_week, week - cohort_week AS week_offset,
               count(DISTINCT e.user_id) AS n_users
        FROM e JOIN c USING (user_id)
        GROUP BY cohort_week, week - cohort_week
    """,
}
