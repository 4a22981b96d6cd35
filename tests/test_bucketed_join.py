"""Bucketed (co-located) fact-fact join: pre-bucketing both sides on the
join key removes the per-query shuffle entirely — THE layout lever for
repeated 100 TB joins (SCALE.md, relational core)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gasket_rs_spark.plans.inspect import count_operator
from gasket_rs_spark.tables import load


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("orders_bkt")
    )
    (
        lineitem.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("lineitem_bkt")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("lineitem_bkt")
            .join(spark.table("orders_bkt"), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        # bucketed layout: the join itself needs zero Exchange nodes; the
        # only shuffle left is the (tiny) final aggregation
        n_exchange = count_operator(joined, "Exchange")
        assert n_exchange <= 1, f"expected only the agg exchange, got {n_exchange}"
        assert count_operator(joined, "SortMergeJoin") == 1
        # and it still returns the right answer
        want = (
            lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .count()
            .collect()
        )
        got = joined.collect()
        assert {(r["o_orderstatus"], r["n"]) for r in got} == {
            (r["o_orderstatus"], r["count"]) for r in want
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS orders_bkt")
        spark.sql("DROP TABLE IF EXISTS lineitem_bkt")


def test_bucketed_incremental_dedup_corpus_side_no_exchange(spark, sf_dir):
    """The per-batch ingest anti-join against the bucketed corpus hash
    index must not shuffle the corpus side, and must keep exactly the
    survivors the plain (shuffling) incremental dedup keeps."""
    from gasket_rs_spark.operators.dedup import (
        build_corpus_hash_index,
        incremental_dedup_against_index,
        q_dedup_incremental,
    )

    docs = load(spark, sf_dir, "documents")
    batch = docs.where(F.col("doc_id") % 5 == 4)
    corpus = docs.where(F.col("doc_id") % 5 != 4)
    spark.sql("DROP TABLE IF EXISTS corpus_hash_idx")
    build_corpus_hash_index(corpus, "corpus_hash_idx")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        survivors = incremental_dedup_against_index(spark, batch, "corpus_hash_idx")
        # Exchanges allowed: batch-side agg + batch-side bucket alignment.
        # The corpus scan feeds the join with no Exchange above it.
        assert count_operator(survivors, "Exchange") <= 2
        plan = survivors._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan and "LeftAnti" in plan
        got = {r["doc_id"] for r in survivors.collect()}
        want = {r["doc_id"] for r in q_dedup_incremental(spark, sf_dir).collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS corpus_hash_idx")
