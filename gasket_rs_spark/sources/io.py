"""Sources & sinks (SURVEY §2.1 R4 source pattern, R14 sink, X1 scan;
plus the reference's retry-wrapped execution applied to streaming writes —
R17/X33).

Batch: parquet/csv/json readers with explicit schemas (schema-on-read is
banned at 100 TB — a schema drift should fail analysis, not silently
rescan), and a partitioned parquet writer (hive layout → partition pruning
on read).

Streaming: ``RetryingForeachBatchWriter`` is the reference work loop
(runtime.rs:244-289) applied to microbatches: each batch is a unit,
retried with backoff, idempotent via batchId markers so a retried batch
never double-writes (SURVEY §7 risk register: "sink must be idempotent
per batchId"), and dismissible to skip a poison batch.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from gasket_rs_spark.pipeline.metrics import Registry
from gasket_rs_spark.pipeline.retries import RetryPolicy, retry_call


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(spark: SparkSession, path: str, schema: StructType, header: bool = True) -> DataFrame:
    """CSV with a mandatory explicit schema (no inference pass)."""
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """JSON-lines with a mandatory explicit schema."""
    return spark.read.schema(schema).json(path)


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned parquet layout: readers filtering on the partition
    columns prune directories before touching data — the base layout for
    any 100 TB fact table."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_with_manifest(df: DataFrame, path: str, mode: str = "overwrite") -> dict:
    """Parquet write + integrity manifest: alongside the data, a
    ``_MANIFEST.json`` records row count, schema DDL, and an
    order-insensitive content fingerprint (xor of per-row xxhash64 over
    all columns — computed distributed, one aggregate, no collect of
    data). ``verify_manifest`` re-derives all three from the files on
    disk, turning "did this copy/compact/restore preserve the data?"
    into a cheap scan — the reproducibility receipt a training-data
    pipeline stores next to every shipped corpus snapshot.

    xor-of-hashes is order- and partitioning-insensitive and
    re-aggregatable (shard manifests xor-combine), but NOT multiset-safe
    for rows duplicated an even number of times — acceptable for a
    corruption/truncation check (the row count catches those), stated
    here so nobody mistakes it for a cryptographic commitment."""
    import json

    df.write.mode(mode).parquet(path)
    spark = df.sparkSession
    written = spark.read.parquet(path)
    fp = _content_fingerprint(written)
    manifest = {
        "rows": written.count(),
        "schema": written.schema.simpleString(),
        "fingerprint": fp,
    }
    tmp = os.path.join(path, "_MANIFEST.json.tmp")
    final = os.path.join(path, "_MANIFEST.json")
    with open(tmp, "w") as f:
        json.dump(manifest, f, sort_keys=True)
    os.replace(tmp, final)
    return manifest


def verify_manifest(spark: SparkSession, path: str) -> dict:
    """Recompute the manifest facts from the files and compare; returns
    {"ok": bool, "expected": ..., "actual": ...}."""
    import json

    with open(os.path.join(path, "_MANIFEST.json")) as f:
        expected = json.load(f)
    df = spark.read.parquet(path)
    actual = {
        "rows": df.count(),
        "schema": df.schema.simpleString(),
        "fingerprint": _content_fingerprint(df),
    }
    return {"ok": actual == expected, "expected": expected, "actual": actual}


def _content_fingerprint(df: DataFrame) -> int:
    from pyspark.sql import functions as F

    row = df.select(
        F.xxhash64(*[F.col(c) for c in df.columns]).alias("h")
    ).agg(F.expr("bit_xor(h)").alias("fp")).collect()[0]
    return int(row.fp) if row.fp is not None else 0


def read_orc(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """ORC with a mandatory explicit schema (same no-inference policy as
    the CSV/JSON readers; ORC pushdown/pruning work like parquet's)."""
    return spark.read.schema(schema).orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    return df.write.mode(mode).orc(path)


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_mb: int = 512,
) -> int:
    """Compact a small-files parquet dataset into ~target_file_mb outputs.

    Streaming sinks and per-trigger micro-batch writes leave thousands of
    KB-scale files; at 100 TB the driver-side listing and per-file open
    costs dominate reads long before the bytes do. Sizing uses the
    dataset's on-disk bytes (sum of file sizes from the input listing —
    no data pass), then one round-robin ``repartition(n)`` write, which
    spreads rows evenly without a range shuffle's sampling pass. Returns
    the output file count.
    """
    df = spark.read.parquet(src_path)
    # Hadoop FS content summary: works on any Hadoop-compatible filesystem
    # (local, HDFS, object stores), not just local paths.
    jpath = spark._jvm.org.apache.hadoop.fs.Path(src_path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total_bytes = fs.getContentSummary(jpath).getLength()
    n_files = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))
    df.repartition(n_files).write.mode("overwrite").parquet(dst_path)
    return n_files


class RetryingForeachBatchWriter:
    """foreachBatch body with reference retry semantics + idempotence.

    - each microbatch = one work unit (framework.rs:114-125);
    - retried ``max_retries+1`` times with exponential backoff
      (retries.rs:74-78, runtime.rs:627-659);
    - a ``_batch_<id>.done`` marker makes re-delivery after restart a
      no-op (retry the same unit idempotently);
    - ``dismissible`` skips a poison batch instead of failing the query
      (runtime.rs:272-274).
    """

    def __init__(
        self,
        write_fn,
        marker_dir: str,
        policy: RetryPolicy | None = None,
        metrics: Registry | None = None,
    ):
        self.write_fn = write_fn
        self.marker_dir = marker_dir
        self.policy = policy or RetryPolicy()
        self.metrics = metrics or Registry()
        self.batches = self.metrics.track_counter("batches_committed")
        self.skipped = self.metrics.track_counter("batches_dismissed")
        self.attempts = self.metrics.track_counter("write_attempts")
        os.makedirs(marker_dir, exist_ok=True)

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.marker_dir, f"_batch_{batch_id}.done")

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if os.path.exists(self._marker(batch_id)):
            return  # already committed: idempotent replay

        committed = False

        def attempt():
            nonlocal committed
            self.attempts.inc()
            self.write_fn(batch_df, batch_id)
            committed = True

        def dismissed():
            self.skipped.inc()

        retry_call(attempt, self.policy, on_dismiss=dismissed)
        # Marker written for dismissed batches too: a restart must not
        # re-attempt a poison unit that was already skipped. The marker is
        # created atomically (temp + rename) so a crash never leaves a
        # partial marker; a crash between sink commit and marker rename
        # still re-runs the batch, so exactly-once additionally requires
        # the sink itself to be idempotent per batchId (transactional
        # sinks should fold the marker into the sink commit).
        marker = self._marker(batch_id)
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            f.write("done" if committed else "dismissed")
        os.replace(tmp, marker)
        if committed:
            self.batches.inc()

    def reset(self) -> None:
        shutil.rmtree(self.marker_dir, ignore_errors=True)
        os.makedirs(self.marker_dir, exist_ok=True)
