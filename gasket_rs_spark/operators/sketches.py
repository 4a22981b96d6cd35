"""Mergeable-sketch operators (Datasketches HLL / Theta via Spark 4
built-ins) — the re-aggregatable scale path for cardinality and set
algebra over a 100 TB corpus.

Why sketches are first-class at scale: an exact count-distinct shuffles
every distinct value once per query, and an incremental pipeline must
rescan history to update it. A sketch aggregates map-side into a few KB
per group, merges associatively across partitions, batches, and days
(`hll_union_agg` / `theta_union_agg`), and answers in one reduce — the
same pattern the reference's metrics registry uses for counters
(gasket/src/metrics.rs) lifted to cardinality estimation.

Correctness treatment mirrors `approx_count_distinct` (rows-only for the
driver — no ANSI-SQL twin exists for Datasketches binaries); the error
bound versus the exact answer is pinned in tests/test_sketches.py, which
turns "runs" into "measurably close".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gasket_rs_spark.tables import load


def _tokens_exploded(docs: DataFrame) -> DataFrame:
    return docs.select(
        "lang", "source", F.explode(F.split("text", " ")).alias("tok")
    )


def q_sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language distinct-token estimates from HLL sketches, plus the
    corpus-wide estimate obtained by MERGING the per-language sketches —
    never rescanning the tokens. The merge row is the point: at 100 TB
    the per-group sketches are what a rollup/ingest pipeline stores, and
    any coarser grouping (here: ALL) is a pure sketch-space union.

    lgConfigK=12 → ~2.5% relative standard error, pinned in
    tests/test_sketches.py against the exact distinct counts."""
    toks = _tokens_exploded(load(spark, sf_dir, "documents"))
    per_lang = toks.groupBy("lang").agg(
        F.hll_sketch_agg("tok", F.lit(12)).alias("sk")
    )
    merged = per_lang.agg(
        F.lit("ALL").alias("lang"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_distinct"),
    )
    return (
        per_lang.select("lang", F.hll_sketch_estimate("sk").alias("est_distinct"))
        .unionByName(merged)
    )


def q_sketch_theta_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary set algebra between two sources via Theta sketches:
    |A ∪ B|, |A ∩ B|, |A \\ B| estimated from two per-source sketches —
    the audience-overlap / corpus-contamination shape. Exact set
    intersection at scale is a shuffle of both token sets; the sketch
    version ships two KB-sized binaries to the driver-side combine.

    The two per-source sketches come from ONE grouped aggregation over
    the filtered corpus; union/intersection/difference are sketch-space
    operations on the pivoted pair. Error bound pinned in
    tests/test_sketches.py."""
    toks = _tokens_exploded(load(spark, sf_dir, "documents"))
    sketches = (
        toks.where(F.col("source").isin("src0", "src1"))
        .groupBy("source")
        .agg(F.theta_sketch_agg("tok").alias("sk"))
    )
    paired = sketches.groupBy().pivot("source", ["src0", "src1"]).agg(
        F.first("sk")
    )
    return paired.select(
        F.theta_sketch_estimate(F.theta_union("src0", "src1")).alias("est_union"),
        F.theta_sketch_estimate(F.theta_intersection("src0", "src1")).alias(
            "est_intersection"
        ),
        F.theta_sketch_estimate(F.theta_difference("src0", "src1")).alias(
            "est_only_src0"
        ),
    )
