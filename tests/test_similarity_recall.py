"""Pin ANN recall against the brute-force witness (SURVEY §2.2 X26).

The module docstring in operators/similarity.py documents measured
recall@1 vs q_similarity_topk; these tests assert floors at those values
so a silent regression to recall 0 (e.g. a broken bucket expression that
still produces rows) fails CI. Everything is seeded, so the measured
values are deterministic: at sf0.001 LSH = 2/5, IVF = 4/5,
IVF-trained = 5/5 (floored at 4/5 to leave slack for plan-level
reorderings that tie-break differently).
"""

from __future__ import annotations

import pytest

from gasket_rs_spark.operators import similarity as S


@pytest.fixture(scope="module")
def brute_force_top1(spark, sf_dir):
    rows = S.q_similarity_topk(spark, sf_dir).collect()
    return {r.query_id: r.neighbor_id for r in rows if r.rk == 1}


def _recall_at_1(ann_rows, truth) -> tuple[int, int]:
    top1 = {r.query_id: r.neighbor_id for r in ann_rows if r.rk == 1}
    hits = sum(1 for q, n in truth.items() if top1.get(q) == n)
    return hits, len(truth)


@pytest.mark.parametrize(
    "fn,min_hits",
    [
        (S.q_similarity_ann_lsh, 2),
        (S.q_similarity_ann_ivf, 4),
        (S.q_similarity_ann_ivf_trained, 4),
    ],
    ids=["lsh", "ivf", "ivf_trained"],
)
def test_ann_recall_floor(spark, sf_dir, brute_force_top1, fn, min_hits):
    hits, n = _recall_at_1(fn(spark, sf_dir).collect(), brute_force_top1)
    assert n == 5  # sf0.001: every 100th of 500 vectors
    assert hits >= min_hits, f"recall@1 {hits}/{n} fell below floor {min_hits}/{n}"


def test_ann_lsh_scores_fraction_of_corpus(spark, sf_dir):
    """The LSH path must generate candidates from buckets, not all pairs:
    candidate volume stays well under queries x corpus."""
    from pyspark.sql import functions as F

    from gasket_rs_spark.tables import load

    emb = S._with_vec(load(spark, sf_dir, "embeddings")).withColumn(
        "bucket", S._bucket_expr(F.col("vec"))
    )
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.explode(
            F.array(
                F.col("bucket"),
                *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(S._N_PLANES)],
            )
        ).alias("bucket"),
    )
    n_candidates = emb.join(queries, "bucket").count()
    n_all_pairs = emb.count() * queries.select("query_id").distinct().count()
    assert n_candidates < 0.35 * n_all_pairs
