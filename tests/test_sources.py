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
    compact_parquet,
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    write_orc,
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


def test_events_day_partitioned_windowed_scan_prunes(spark, sf_dir):
    """SCALE.md read-side claim, closed: the events fact table written
    hive-partitioned by day (its natural time key) lets a day-filtered
    windowed aggregation — the stream_* scan shape — prune to that day's
    partition via PartitionFilters, with no data filter left in the scan.
    At 100 TB this is the difference between reading one day and reading
    three years. Also replays the single day as a file stream: the
    streaming twin must see exactly the partition's rows."""
    events = load(spark, sf_dir, "events").withColumn("dt", F.to_date("ts"))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "events_by_day")
        write_partitioned_parquet(events, path, partition_by=["dt"])
        days = sorted(
            p.split("=", 1)[1] for p in os.listdir(path) if p.startswith("dt=")
        )
        assert len(days) > 1, "fixture must span multiple day partitions"
        day = days[len(days) // 2]

        back = read_parquet(spark, path)
        agg = (
            back.where(F.col("dt") == day)
            .groupBy(F.window("ts", "600 seconds").alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"))
            .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
        )
        plan = explain_formatted(agg)
        part_lines = [
            ln.strip() for ln in plan.splitlines() if ln.strip().startswith("PartitionFilters:")
        ]
        assert part_lines and any("dt" in ln for ln in part_lines), plan
        # the dt predicate must be a partition filter, NOT pushed as a data filter
        assert not any(
            "dt" in ln for ln in plan.splitlines() if ln.strip().startswith("PushedFilters:")
        ), plan

        want = {
            (r["window_start"], r["event_type"]): r["n_events"]
            for r in events.where(F.col("dt") == day)
            .groupBy(F.window("ts", "600 seconds").alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"))
            .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
            .collect()
        }
        got = {
            (r["window_start"], r["event_type"]): r["n_events"] for r in agg.collect()
        }
        assert got == want and got

        # streaming replay of the pruned layout: one day's partition only
        from gasket_rs_spark.streaming.stream import run_to_memory_sink

        stream = (
            spark.readStream.schema(back.schema)
            .parquet(path)
            .where(F.col("dt") == F.lit(day))
        )
        run_to_memory_sink(stream, "events_one_day", output_mode="append")
        assert (
            spark.table("events_one_day").count()
            == events.where(F.col("dt") == day).count()
        )


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


def test_orc_roundtrip_with_explicit_schema(spark, sf_dir):
    """ORC source/sink parity with the parquet path: explicit schema on
    read (no inference), values identical after a write/read cycle."""
    orders = load(spark, sf_dir, "orders")
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "orders_orc")
        write_orc(orders, path)
        back = read_orc(spark, path, orders.schema)
        assert back.schema == orders.schema
        assert back.count() == orders.count()
        want = sorted(r["o_orderkey"] for r in orders.select("o_orderkey").collect())
        got = sorted(r["o_orderkey"] for r in back.select("o_orderkey").collect())
        assert got == want


def test_compact_parquet_reduces_file_count(spark, sf_dir):
    """Small-files compaction: a 64-file write compacts to the byte-sized
    target file count with no row loss — the post-streaming-sink
    maintenance pass a 100 TB table needs."""
    lineitem = load(spark, sf_dir, "lineitem")
    with tempfile.TemporaryDirectory() as d:
        src, dst = os.path.join(d, "src"), os.path.join(d, "dst")
        lineitem.repartition(64).write.parquet(src)
        n_src = sum(f.endswith(".parquet") for f in os.listdir(src))
        assert n_src == 64
        n_planned = compact_parquet(spark, src, dst, target_file_mb=512)
        n_dst = sum(f.endswith(".parquet") for f in os.listdir(dst))
        assert n_dst == n_planned < n_src
        back = spark.read.parquet(dst)
        assert back.count() == lineitem.count()
        assert set(back.columns) == set(lineitem.columns)


def test_python_datasource_partitioned_deterministic(spark):
    """Custom Python data source (Spark 4 DataSource API): respects the
    requested partitioning, generates deterministically (two scans are
    identical — the restartable-scan property), and its event_type
    equality pushdown returns exactly the rows a post-hoc filter keeps."""
    from gasket_rs_spark.sources.pydatasource import register

    register(spark)
    df = (
        spark.read.format("gasket_events")
        .option("rows", 500)
        .option("partitions", 8)
        .load()
    )
    assert df.count() == 500
    assert df.rdd.getNumPartitions() == 8
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, df.collect()))
    assert a == b
    pushed = {r["event_id"] for r in df.where(F.col("event_type") == "click").collect()}
    want = {r[0] for r in a if r[2] == "click"}
    assert pushed == want and pushed
    # Pushed filters are a CONJUNCTION and Spark does not re-apply handled
    # filters: two contradictory equalities must intersect to zero rows,
    # not union to rows of both types.
    contradiction = df.where(
        (F.col("event_type") == "click") & (F.col("event_type") == "view")
    )
    assert contradiction.count() == 0
    # Repeated identical equality stays a no-op intersection.
    same_twice = df.where(
        (F.col("event_type") == "click") & (F.col("event_type") == "click")
    )
    assert {r["event_id"] for r in same_twice.collect()} == want


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


def test_parquet_schema_evolution_merge(spark, sf_dir):
    """Schema evolution across parquet file generations: an old shard
    (3 columns) and a new shard (4 columns, one added) must read as one
    table under mergeSchema — missing column NULL-filled for old rows —
    and a scan WITHOUT the new column must stay readable either way.
    This is the append-only ingest reality at 100 TB: writers upgrade
    mid-stream and historical shards are never rewritten."""
    orders = load(spark, sf_dir, "orders").limit(200)
    with tempfile.TemporaryDirectory() as d:
        old = orders.select("o_orderkey", "o_custkey", "o_totalprice")
        new = orders.select(
            "o_orderkey", "o_custkey", "o_totalprice",
            F.upper(F.col("o_orderstatus")).alias("o_status_v2"),
        )
        old.write.parquet(d, mode="append")
        new.write.parquet(d, mode="append")
        merged = spark.read.option("mergeSchema", "true").parquet(d)
        assert set(merged.columns) == {
            "o_orderkey", "o_custkey", "o_totalprice", "o_status_v2"
        }
        assert merged.count() == 400
        # old-generation rows surface the evolved column as NULL
        assert merged.where(F.col("o_status_v2").isNull()).count() == 200
        # projections not touching the new column read fine without merge
        assert spark.read.parquet(d).select("o_orderkey").count() == 400


def test_dynamic_partition_pruning_on_partitioned_events(spark, sf_dir):
    """Dynamic partition pruning: joining a hive-partitioned fact on its
    partition column against a filtered (broadcastable) dim must inject a
    runtime pruning subquery into the fact scan — at 100 TB this is the
    difference between scanning 2 day-partitions and scanning all of
    them. Asserted on the plan (dynamicpruning expression) AND on the
    result (row counts match the static-filter equivalent)."""
    events = load(spark, sf_dir, "events").withColumn("dt", F.to_date("ts"))
    with tempfile.TemporaryDirectory() as tmp:
        d = os.path.join(tmp, "fact")
        events.write.partitionBy("dt").parquet(d)
        fact = spark.read.parquet(d)
        days = [r["dt"] for r in fact.select("dt").distinct().limit(2).collect()]
        dim = spark.createDataFrame(
            [(day, f"label{i}") for i, day in enumerate(days)]
            + [(None, "drop")],
            "dt date, label string",
        )
        # DPP is only injected when the dim side carries a selective
        # predicate (a bare table scan is assumed unfiltered)
        joined = fact.join(dim.where(F.col("label").startswith("label")), "dt")
        from gasket_rs_spark.plans.inspect import explain_formatted

        assert "dynamicpruning" in explain_formatted(joined).lower()
        assert joined.count() == fact.where(F.col("dt").isin(days)).count()


def test_ignore_corrupt_files_salvages_scan(spark, sf_dir):
    """Operational reality at 100 TB: a fleet-scale scan will eventually
    hit a truncated/corrupt shard. With ignoreCorruptFiles the scan
    must salvage every healthy shard (and without it, fail loudly) —
    the difference between re-running a 12-hour job and losing one
    shard's rows."""
    orders = load(spark, sf_dir, "orders").limit(300)
    with tempfile.TemporaryDirectory() as tmp:
        d = os.path.join(tmp, "shards")
        orders.repartition(3).write.parquet(d)
        # clobber one shard with garbage that has no parquet magic
        victim = next(
            os.path.join(d, f) for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        )
        with open(victim, "wb") as f:
            f.write(b"\x00garbage\x00" * 64)
        old = spark.conf.get("spark.sql.files.ignoreCorruptFiles", "false")
        try:
            spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
            salvaged = spark.read.schema(orders.schema).parquet(d).count()
            # 3 even-ish shards of 300 rows: exactly the healthy two survive
            assert 150 <= salvaged < 300
            spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")
            import pytest
            from pyspark.errors.exceptions.captured import SparkUpgradeException  # noqa: F401

            with pytest.raises(Exception):
                spark.read.schema(orders.schema).parquet(d).count()
        finally:
            spark.conf.set("spark.sql.files.ignoreCorruptFiles", old)


def test_python_streaming_source_prefix_of_batch(spark):
    """Spark 4 Python STREAMING data source: the custom connector's
    stream output must be an exact prefix of its batch scan (same
    splitmix64 generation), contiguous and duplicate-free across
    microbatches."""
    import time

    from gasket_rs_spark.sources.pydatasource import register

    register(spark)
    query = (
        spark.readStream.format("gasket_events")
        .option("batch_rows", 100)
        .load()
        .writeStream.format("memory")
        .queryName("pyds_stream")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("pyds_stream").count() >= 250:
                break
            time.sleep(1)
        streamed = spark.table("pyds_stream").orderBy("event_id").collect()
    finally:
        query.stop()
    assert len(streamed) >= 250
    ids = [r.event_id for r in streamed]
    assert ids == list(range(len(ids))), "contiguous, no dupes/gaps"
    batch = (
        spark.read.format("gasket_events")
        .option("rows", len(ids))
        .load()
        .orderBy("event_id")
        .collect()
    )
    assert [tuple(r) for r in streamed] == [tuple(r) for r in batch]


def test_manifest_write_verify_roundtrip_and_tamper(spark, sf_dir, tmp_path):
    """write_with_manifest + verify_manifest: a clean roundtrip (and a
    repartitioned copy — fingerprint is order/partitioning-insensitive)
    verifies ok; dropping a data file is detected."""
    import glob
    import os

    from gasket_rs_spark.sources.io import (
        verify_manifest,
        write_with_manifest,
    )
    from gasket_rs_spark.tables import load

    path = str(tmp_path / "with_manifest")
    df = load(spark, sf_dir, "orders").repartition(4)
    manifest = write_with_manifest(df, path)
    assert manifest["rows"] > 0

    res = verify_manifest(spark, path)
    assert res["ok"], res

    # a differently-partitioned byte-identical copy carries the same facts
    copy = str(tmp_path / "copy")
    spark.read.parquet(path).repartition(7).write.parquet(copy)
    import json, shutil

    shutil.copy(os.path.join(path, "_MANIFEST.json"), os.path.join(copy, "_MANIFEST.json"))
    assert verify_manifest(spark, copy)["ok"]

    # tamper: drop one data file -> rows and fingerprint both flip
    victim = sorted(glob.glob(os.path.join(path, "part-*.parquet")))[0]
    os.remove(victim)
    res2 = verify_manifest(spark, path)
    assert not res2["ok"]
    assert res2["actual"]["rows"] < res2["expected"]["rows"]
