"""Pandas-UDF surface (SURVEY §2.2 X28) — the sanctioned Python escape
hatch: Arrow-batched, vectorized, never row-at-a-time.

Three shapes, each a query witness:
- scalar ``@pandas_udf`` (Series → Series): per-row math in numpy;
- grouped ``applyInPandas`` (DataFrame per group → DataFrame): per-group
  normalization — the UDAF-ish shape;
- both are oracle-checked: the fake workloads are plain arithmetic DuckDB
  can recompute, which pins the Arrow plumbing end-to-end (types, null
  handling, group boundaries), not just "it ran".
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from gasket_rs_spark.tables import load


@pandas_udf(DoubleType())
def _scaled_log(v: pd.Series) -> pd.Series:
    import numpy as np

    # ln(1+x) spelled exactly as the oracle does (not log1p — different
    # ulp behavior), and floor-rounding (np.round is half-to-even while
    # SQL round is half-away; floor(x*1e6+0.5) is identical IEEE math in
    # both engines).
    x = np.log(1.0 + v.abs().to_numpy()) * 100.0
    return pd.Series(np.floor(x * 1e6 + 0.5) / 1e6)


def q_pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF over events.value."""
    events = load(spark, sf_dir, "events")
    return events.select(
        "event_id",
        "value",
        _scaled_log(F.col("value")).alias("scaled_log"),
    )


_NORM_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("dev_from_min", DoubleType()),
    ]
)


def q_pandas_udf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group transform via applyInPandas: deviation from the group
    minimum per user — each group arrives as one pandas DataFrame.

    Min (not mean) keeps the statistic summation-free: v - min is exact
    IEEE subtraction, identical in every engine, so the oracle check is
    bit-exact with no rounding at all.
    """
    events = load(spark, sf_dir, "events")

    def dev(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"].to_numpy()
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "dev_from_min": v - v.min(),
            }
        )

    return events.groupBy("user_id").applyInPandas(dev, _NORM_SCHEMA)


ORACLES: dict[str, str] = {
    "pandas_udf_scalar": """
        SELECT event_id, value,
               round(ln(1 + abs(value)) * 100.0, 6) AS scaled_log
        FROM events
    """,
    "pandas_udf_grouped": """
        SELECT user_id, event_id, event_type,
               value - min(value) OVER (PARTITION BY user_id) AS dev_from_min
        FROM events
    """,
}
