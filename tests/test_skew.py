"""AQE runtime behavior on a deliberately skewed join: ~90% of the left
rows share one hot key (the right side keeps unique keys — hot-hot joins
multiply and are a modeling bug, not a skew test).

Asserted: the adaptive plan finalizes, AQE re-plans shuffle reads at
runtime (AQEShuffleRead coalesced), and the hot-key join returns exactly
the expected row count. The skew-*split* heuristic itself
(skewedPartitionThresholdInBytes) is sized for real shuffles and does not
reliably trip on KB-scale test partitions even when lowered — skewed
*aggregation* has its deterministic salting counterpart in
operators/skew.py (oracle-checked), and skewed-join splitting remains
AQE-owned at production sizes (SCALE.md, global posture).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gasket_rs_spark.tables import load


def test_hot_key_join_under_aqe(spark, sf_dir):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        lineitem = load(spark, sf_dir, "lineitem")
        orders = load(spark, sf_dir, "orders")
        skewed = lineitem.withColumn(
            "jk",
            F.when(F.col("l_orderkey") % 10 != 0, F.lit(1)).otherwise(F.col("l_orderkey")),
        )
        right = orders.select(F.col("o_orderkey").alias("jk"), "o_totalprice")
        joined = skewed.join(right, "jk").select("jk", "l_quantity", "o_totalprice")
        rows = joined.collect()
        # every lineitem matches exactly one order (unique right keys),
        # hot key included — no row amplification, none lost
        assert len(rows) == lineitem.count()
        hot = sum(1 for r in rows if r["jk"] == 1)
        assert hot > len(rows) * 0.8  # the skew actually exists
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "AQEShuffleRead" in plan  # runtime re-planned shuffle reads
        assert "SortMergeJoin" in plan  # broadcast disabled → shuffled join
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
