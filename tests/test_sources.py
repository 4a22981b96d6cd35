"""Source/sink tests: schema-explicit readers, partitioned writer with
pruning on read-back, and the retrying idempotent foreachBatch writer."""

from __future__ import annotations

import os
import tempfile

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from gasket_rs_spark.pipeline.retries import RetryPolicy
from gasket_rs_spark.plans.inspect import explain_formatted
from gasket_rs_spark.sources.io import (
    RetryingForeachBatchWriter,
    read_csv,
    read_json,
    read_parquet,
    write_partitioned_parquet,
)
from gasket_rs_spark.tables import load


def test_partitioned_write_and_partition_pruning(spark, sf_dir):
    orders = load(spark, sf_dir, "orders").withColumn("yr", F.year("o_orderdate"))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "orders_part")
        write_partitioned_parquet(orders, path, partition_by=["yr"])
        assert any(p.startswith("yr=") for p in os.listdir(path))
        back = read_parquet(spark, path).where(F.col("yr") == 1996)
        assert back.count() == orders.where(F.col("yr") == 1996).count()
        plan = explain_formatted(back)
        assert "PartitionFilters" in plan and "yr" in plan


def test_csv_json_roundtrip_with_explicit_schema(spark, sf_dir):
    region = load(spark, sf_dir, "region")
    schema = StructType(
        [StructField("r_regionkey", LongType()), StructField("r_name", StringType())]
    )
    with tempfile.TemporaryDirectory() as d:
        csv_path, json_path = os.path.join(d, "csv"), os.path.join(d, "json")
        region.selectExpr("CAST(r_regionkey AS BIGINT) r_regionkey", "r_name").write.option(
            "header", "true"
        ).csv(csv_path)
        region.selectExpr("CAST(r_regionkey AS BIGINT) r_regionkey", "r_name").write.json(json_path)
        assert sorted(r["r_name"] for r in read_csv(spark, csv_path, schema).collect()) == sorted(
            r["r_name"] for r in region.collect()
        )
        assert read_json(spark, json_path, schema).count() == 5


def test_retrying_foreachbatch_writer_retries_then_commits(spark, sf_dir):
    df = load(spark, sf_dir, "region")
    calls = {"n": 0}

    def flaky_write(batch_df, batch_id):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient sink error")
        batch_df.count()

    with tempfile.TemporaryDirectory() as d:
        w = RetryingForeachBatchWriter(
            flaky_write, marker_dir=d, policy=RetryPolicy(max_retries=5, backoff_unit=0.001)
        )
        w(df, batch_id=0)
        assert calls["n"] == 3
        assert w.metrics.collect_readings()["batches_committed"] == 1
        # replay of the same batch id is a no-op (idempotence marker)
        w(df, batch_id=0)
        assert calls["n"] == 3


def test_retrying_foreachbatch_writer_dismisses_poison_batch(spark, sf_dir):
    df = load(spark, sf_dir, "region")

    def always_fail(batch_df, batch_id):
        raise RuntimeError("poison")

    with tempfile.TemporaryDirectory() as d:
        w = RetryingForeachBatchWriter(
            always_fail,
            marker_dir=d,
            policy=RetryPolicy(max_retries=1, backoff_unit=0.001, dismissible=True),
        )
        w(df, batch_id=7)  # must not raise
        readings = w.metrics.collect_readings()
        assert readings["batches_dismissed"] == 1
        assert readings["write_attempts"] == 2  # max_retries + 1


def test_retrying_foreachbatch_writer_escalates_without_dismissible(spark, sf_dir):
    df = load(spark, sf_dir, "region")

    def always_fail(batch_df, batch_id):
        raise RuntimeError("poison")

    with tempfile.TemporaryDirectory() as d:
        w = RetryingForeachBatchWriter(
            always_fail, marker_dir=d, policy=RetryPolicy(max_retries=1, backoff_unit=0.001)
        )
        with pytest.raises(RuntimeError, match="poison"):
            w(df, batch_id=1)
