"""Banded 64-bit SimHash: recall and candidate-volume properties (X25).

The scale claim of operators/dedup.py:_simhash_bands is that per-band
equi-joins find every pair within Hamming distance 3 (pigeonhole over
4 x 16-bit bands) while candidate volume stays O(n * bucket occupancy)
— unlike the old 16-bit identical-signature join, which degenerates to
~n²/65k pairs on any corpus.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gasket_rs_spark.operators import dedup as D


def _sig_df(spark, rows):
    return D._simhash_bands(
        spark.createDataFrame(rows, "doc_id bigint, text string")
    )


def test_near_identical_docs_pair_up(spark):
    """Docs differing by one token land within the Hamming budget and are
    emitted as a pair; unrelated docs are not."""
    base = "the quick brown fox jumps over the lazy dog near the river bank " * 4
    rows = [
        (1, base + "alpha"),
        (2, base + "omega"),
        (3, "completely different text about spark catalyst optimizer plans "
            "shuffle partitions broadcast joins and adaptive execution " * 4),
    ]
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
            d + "/documents.parquet"
        )
        pairs = {(r.doc_a, r.doc_b) for r in D.q_dedup_simhash(spark, d).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_candidate_volume_stays_subquadratic(spark):
    """On a corpus of distinct random-ish docs, banded candidate pairs stay
    near-linear in n (random 16-bit band collisions are ~4/65536 per pair),
    nowhere near the n*(n-1)/2 of an all-pairs scan."""
    n = 400
    rows = [
        (i, " ".join(f"tok{(i * 37 + j * 11) % 9973}" for j in range(30)))
        for i in range(n)
    ]
    sigs = _sig_df(spark, rows)
    bucket_arr = F.array(*[F.col(f"band{b}") for b in range(D._SIMHASH_BANDS)])
    banded = sigs.select("doc_id", F.posexplode(bucket_arr).alias("band", "bucket"))
    left = banded.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    right = banded.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    n_candidates = (
        left.join(right, ["band", "bucket"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .count()
    )
    all_pairs = n * (n - 1) // 2  # 79,800
    assert n_candidates < 0.02 * all_pairs, (
        f"{n_candidates} candidates on {n} unrelated docs — bucketing is broken"
    )


def test_band_values_fit_16_bits(spark):
    sigs = _sig_df(spark, [(1, "a b c d e f g h"), (2, "x y z w v u t s")])
    for row in sigs.collect():
        for b in range(D._SIMHASH_BANDS):
            assert 0 <= row[f"band{b}"] < (1 << 16)
