"""Error-bound pins for the mergeable-sketch operators: a sketch that
"runs" but estimates garbage would pass a rows-only driver check, so the
bound versus the exact answer is asserted here (same policy as the
approx_count_distinct / approx_percentiles pins in test_approx_bounds)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gasket_rs_spark.operators.sketches import (
    q_sketch_hll_distinct,
    q_sketch_theta_overlap,
)
from gasket_rs_spark.tables import load


def _exact_distinct_tokens(spark, sf_dir, where=None):
    toks = (
        load(spark, sf_dir, "documents")
        .select("lang", "source", F.explode(F.split("text", " ")).alias("tok"))
    )
    if where is not None:
        toks = toks.where(where)
    return toks


def test_hll_distinct_within_rse(spark, sf_dir):
    est = {r["lang"]: r["est_distinct"] for r in q_sketch_hll_distinct(spark, sf_dir).collect()}
    toks = _exact_distinct_tokens(spark, sf_dir)
    exact_rows = toks.groupBy("lang").agg(F.countDistinct("tok").alias("n")).collect()
    exact = {r["lang"]: r["n"] for r in exact_rows}
    exact["ALL"] = toks.select("tok").distinct().count()
    assert set(est) == set(exact)
    for lang, n in exact.items():
        # lgConfigK=12 → RSE ≈ 1.04/√2¹² ≈ 1.6%; allow 3σ ≈ 5%.
        assert abs(est[lang] - n) <= max(0.05 * n, 2), (lang, est[lang], n)
    # merged estimate must equal the sketch-union, not a token rescan:
    # its value is consistent with the per-lang sketches by construction,
    # so just pin it against the exact global too (done above via "ALL").


def test_hll_merge_is_batch_invariant(spark, sf_dir):
    """The property that makes sketches the incremental-ingest path: the
    union of per-batch sketches must estimate EXACTLY what a single
    whole-corpus sketch estimates (HLL merge is lossless w.r.t. register
    state — not just 'close'). If this drifted, stored per-day sketches
    could not stand in for a rescan."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        (F.col("doc_id") % 3).alias("batch"), F.explode(F.split("text", " ")).alias("tok")
    )
    whole = toks.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("tok", F.lit(12))).alias("est")
    ).collect()[0]["est"]
    merged = (
        toks.groupBy("batch")
        .agg(F.hll_sketch_agg("tok", F.lit(12)).alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]["est"]
    )
    assert merged == whole, (merged, whole)


def test_theta_overlap_within_error(spark, sf_dir):
    row = q_sketch_theta_overlap(spark, sf_dir).collect()[0]
    toks = _exact_distinct_tokens(spark, sf_dir, F.col("source").isin("src0", "src1"))
    a = {r["tok"] for r in toks.where(F.col("source") == "src0").select("tok").distinct().collect()}
    b = {r["tok"] for r in toks.where(F.col("source") == "src1").select("tok").distinct().collect()}
    exact = {
        "est_union": len(a | b),
        "est_intersection": len(a & b),
        "est_only_src0": len(a - b),
    }
    for k, n in exact.items():
        # default theta lgK=12; intersections compound error — allow 6%+2.
        assert abs(row[k] - n) <= max(0.06 * n, 2), (k, row[k], n)
