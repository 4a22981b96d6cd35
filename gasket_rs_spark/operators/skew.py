"""Skew mitigation: salted two-stage aggregation (SCALE.md, global posture).

AQE's skew-join splitting handles skewed *joins* automatically; skewed
*aggregation* keys (one giant group swamping a reducer) are handled with
the classic salt → partial-agg → unsalt → final-agg pattern. The witness
aggregates events by event_type (5 keys over ~100k rows at sf0.1 — exactly
the low-cardinality-hot-keys shape) through the salted path and is
oracle-checked against the plain GROUP BY: same answer, but the first
shuffle spreads each hot key over SALT_BUCKETS reducers.

Only algebraic aggregates decompose this way (sum/count/min/max and
anything built from them, e.g. avg = sum/count); the witness carries all
of them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gasket_rs_spark.tables import load

SALT_BUCKETS = 16


def salted_agg(df: DataFrame, key: str, value: str, buckets: int = SALT_BUCKETS) -> DataFrame:
    """Two-stage aggregation over a skewed key.

    Salt is derived from a uniform row attribute hash (event_id) rather
    than rand() so the plan stays deterministic and retry-safe.
    """
    salted = df.withColumn("_salt", F.pmod(F.xxhash64("event_id"), F.lit(buckets)))
    partial = salted.groupBy(key, "_salt").agg(
        F.sum(value).alias("_sum"),
        F.count("*").alias("_cnt"),
        F.min(value).alias("_min"),
        F.max(value).alias("_max"),
    )
    return partial.groupBy(key).agg(
        (F.floor(F.sum("_sum") * 10000 + 0.5) / 10000).alias("sum_value"),
        F.sum("_cnt").alias("n_events"),
        F.round(F.min("_min"), 6).alias("min_value"),
        F.round(F.max("_max"), 6).alias("max_value"),
        (F.floor(F.sum("_sum") / F.sum("_cnt") * 1000000 + 0.5) / 1000000).alias("avg_value"),
    )


def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted aggregation over the hot event_type keys."""
    return salted_agg(load(spark, sf_dir, "events"), "event_type", "value")


ORACLES: dict[str, str] = {
    "skew_salted_agg": """
        SELECT event_type,
               floor(sum(value) * 10000 + 0.5) / 10000 AS sum_value,
               count(*) AS n_events,
               round(min(value), 6) AS min_value,
               round(max(value), 6) AS max_value,
               floor(sum(value) / count(*) * 1000000 + 0.5) / 1000000 AS avg_value
        FROM events
        GROUP BY event_type
    """,
}
