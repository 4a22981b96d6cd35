"""Pins for the round-11 event-analytics additions (analytics.py):
windowed funnel and session trigram mining — cross-operator invariants
the per-witness value hashes can't express."""

from __future__ import annotations

from gasket_rs_spark.operators.analytics import (
    q_funnel_conversion,
    q_funnel_windowed,
    q_session_path_transitions,
    q_session_trigrams,
)


def test_windowed_funnel_monotone_and_bounded_by_unbounded(spark, sf_dir):
    win = sorted(q_funnel_windowed(spark, sf_dir).collect(), key=lambda r: r.window_sec)
    assert [r.window_sec for r in win] == [3600, 86400, 604800]
    unb = q_funnel_conversion(spark, sf_dir).collect()[0]
    # wider window => weakly more conversions at every stage
    for col in ("n_clicked_within", "n_purchased_within"):
        vals = [r[col] for r in win]
        assert vals == sorted(vals)
    for r in win:
        # every windowed completion is also an unbounded completion
        assert r.n_clicked_within <= unb.n_clicked_after
        assert r.n_purchased_within <= unb.n_purchased_after
        # funnel stages only narrow
        assert r.n_signed_up >= r.n_clicked_within >= r.n_purchased_within


def test_session_trigrams_consistent_with_transitions(spark, sf_dir):
    tris = q_session_trigrams(spark, sf_dir).collect()
    assert tris
    ns = [r.n for r in tris]
    assert ns == sorted(ns, reverse=True)
    # each trigram (a,b,c) implies transitions (a,b) and (b,c): its count
    # cannot exceed either pair count
    pairs = {
        (r.from_type, r.to_type): r.n_transitions
        for r in q_session_path_transitions(spark, sf_dir).collect()
    }
    for r in tris:
        assert r.n <= pairs[(r.t1, r.t2)]
        assert r.n <= pairs[(r.t2, r.t3)]
