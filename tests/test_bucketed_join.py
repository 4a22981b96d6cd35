"""Bucketed (co-located) fact-fact join: pre-bucketing both sides on the
join key removes the per-query shuffle entirely — THE layout lever for
repeated 100 TB joins (SCALE.md, relational core)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gasket_rs_spark.plans.inspect import count_operator
from gasket_rs_spark.tables import load


def test_incremental_neardup_index(spark, sf_dir):
    """Near-dup ingest filter against the standing MinHash index: batch
    docs that are near-duplicates of corpus docs are dropped, novel and
    too-short-to-shingle docs survive, and the filter agrees with the
    all-pairs witness run over corpus+batch."""
    from gasket_rs_spark.operators.dedup import (
        build_corpus_minhash_index,
        incremental_neardup_against_index,
    )
    from gasket_rs_spark.tables import load as load_table

    corpus = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    spark.sql("DROP TABLE IF EXISTS nd_keys")
    spark.sql("DROP TABLE IF EXISTS nd_docs")
    build_corpus_minhash_index(corpus, "nd_keys", "nd_docs", n_buckets=8)
    try:
        # batch: 5 verbatim corpus copies (certain near-dups), 3 novel
        # docs, 1 too-short doc
        sample = [r["text"] for r in corpus.limit(5).collect()]
        novel = [
            "zq%d xk%d vr%d wm%d tn%d yb%d" % (i, i + 1, i + 2, i + 3, i + 4, i + 5)
            for i in range(3)
        ]
        rows = [(10_000 + i, t) for i, t in enumerate(sample + novel)]
        rows.append((10_100, "tiny doc"))  # < 3 tokens: no signature
        batch = spark.createDataFrame(rows, "doc_id bigint, text string")

        survivors = {
            r["doc_id"]
            for r in incremental_neardup_against_index(
                spark, batch, "nd_keys", "nd_docs"
            ).collect()
        }
        assert survivors == {10_005, 10_006, 10_007, 10_100}, survivors

        # corpus-side joins stay bucket-local under the sort-merge path
        # (the 100 TB shape — broadcast disabled so AQE can't hide a
        # corpus shuffle behind a tiny test corpus): no Exchange above
        # either bucketed corpus scan
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = incremental_neardup_against_index(
                spark, batch, "nd_keys", "nd_docs", eager=False
            )._jdf.queryExecution().executedPlan().toString()
            lines = plan.splitlines()
            for i, line in enumerate(lines):
                if "nd_keys" in line or "nd_docs" in line:
                    # The BATCH side of each join legitimately shuffles
                    # (its columns are batch_*-prefixed); the invariant is
                    # that no Exchange repartitions CORPUS data — i.e. no
                    # nearby exchange hash-partitions on non-batch keys.
                    # (Proximity alone misfired once the signature frames
                    # became checkpoints: the plan text compressed and the
                    # sibling batch child's Exchange fell inside the 8-line
                    # window.)
                    above = [
                        x
                        for x in lines[max(0, i - 8) : i]
                        if "Exchange" in x and "batch_" not in x
                    ]
                    assert not above, (line, above)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS nd_keys")
        spark.sql("DROP TABLE IF EXISTS nd_docs")


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
