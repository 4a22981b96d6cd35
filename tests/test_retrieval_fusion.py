"""Pins for the retrieval-quality family (operators/similarity.py):
RRF fusion and nDCG@10 — properties the driver's value hash can't see
(score bounds, cross-metric invariants, the Python-side weight table).
The EXACT cross-engine value checks live in the `rrf_fusion` /
`retrieval_ndcg` oracle twins."""

from __future__ import annotations

from gasket_rs_spark.operators.similarity import (
    _RRF_K,
    _RRF_POOL,
    _RRF_TOPK,
    _ndcg_weights,
    q_retrieval_ndcg,
    q_rrf_fusion,
)


def test_ndcg_weight_table_shape():
    w, pref = _ndcg_weights()
    assert len(w) == 10 and len(pref) == 10
    assert w[0] == 1_000_000  # 1/log2(2) = 1
    assert w == sorted(w, reverse=True)  # gains decay with rank
    assert all(b > a for a, b in zip(pref, pref[1:]))  # prefix strictly up
    assert pref[0] == w[0]


def test_rrf_fusion_scores_bounded_and_ranked(spark, sf_dir):
    rows = q_rrf_fusion(spark, sf_dir).collect()
    assert rows
    # the best possible fused score: rank 1 in BOTH pools
    cap = 2 * (1_000_000_000 // (_RRF_K + 1))
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r.rk)
        assert len(rs) == _RRF_TOPK
        scores = [r.rrf9 for r in rs]
        assert scores == sorted(scores, reverse=True)
        assert all(0 < s <= cap for s in scores)
        # a fused member carries at least the worst single-pool term
        assert all(s >= 1_000_000_000 // (_RRF_K + _RRF_POOL) for s in scores)


def test_ndcg_bounded_by_ideal(spark, sf_dir):
    rows = q_retrieval_ndcg(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.dcg6 >= 0
        assert r.idcg6 >= 0
        # with binary gains and n_rel relevant docs in the corpus, no
        # ranking beats the ideal prefix — nDCG is a true [0, 1] ratio
        assert r.dcg6 <= r.idcg6
        assert 0 <= r.ndcg6 <= 1_000_000
        if r.n_rel >= 1:
            assert r.idcg6 > 0


def test_calibration_ece_bins_are_consistent(spark, sf_dir):
    from gasket_rs_spark.operators.similarity import _ECE_K, q_calibration_ece

    rows = q_calibration_ece(spark, sf_dir).collect()
    assert rows
    bins = [r.s10 for r in rows]
    assert bins == sorted(bins)
    assert len(set(bins)) == len(bins)
    for r in rows:
        assert 0 <= r.s10 <= _ECE_K
        assert 0 <= r.pos <= r.n
        assert r.conf6 == r.s10 * 100_000
        assert 0 <= r.acc6 <= 1_000_000
        assert r.gap6 == abs(r.conf6 - r.acc6)
    # every query lands in exactly one bin: bin counts sum to the sample
    n_queries = sum(r.n for r in rows)
    from gasket_rs_spark.operators.similarity import _ECE_QMOD
    from gasket_rs_spark.tables import load

    expected = load(spark, sf_dir, "embeddings").where(
        f"vec_id % {_ECE_QMOD} = 0"
    ).count()
    assert n_queries == expected


def test_mrr_weights_and_metric_invariants(spark, sf_dir):
    from gasket_rs_spark.operators.similarity import _mrr_weights, q_retrieval_mrr

    w = _mrr_weights()
    assert len(w) == 10
    assert w[0] == 1_000_000  # 1/1
    assert w[1] == 500_000 and w[9] == 100_000
    assert w == sorted(w, reverse=True)
    rows = q_retrieval_mrr(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.first_rel_rank <= 10
        assert 0 <= r.hits10 <= 10
        if r.first_rel_rank == 0:
            # no relevant doc in the top-10 => zero reciprocal AND zero hits
            assert r.rr6 == 0 and r.hits10 == 0
        else:
            assert r.rr6 == w[r.first_rel_rank - 1]
            assert r.hits10 >= 1
        assert 0 <= r.recall6 <= 1_000_000
        if r.n_rel >= 1 and r.hits10 == min(r.n_rel, 10):
            assert r.recall6 == 1_000_000
