"""Synthetic-row BOUNDARY pins for the session-3 interval/threshold
operators — the house rule since the round-2 session-window bug: when an
oracle boundary is in doubt, pin it with constructed rows that SIT ON
the boundary (fixture data rarely does), never by reasoning from docs."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_debounce_gap_exactly_at_threshold_suppresses(spark):
    """kept requires gap STRICTLY greater than the threshold: a repeat
    at exactly +60 s is suppressed (same spelling in witness + oracle:
    `> _DEBOUNCE_SEC`)."""
    from gasket_rs_spark.operators.analytics import _DEBOUNCE_SEC

    rows = [
        (1, "click", 1, 1000),
        (1, "click", 2, 1000 + _DEBOUNCE_SEC),      # == threshold: suppressed
        (1, "click", 3, 1000 + 2 * _DEBOUNCE_SEC + 1),  # > threshold: kept
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_type string, event_id bigint, ts_sec bigint"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy("ts_sec", "event_id")
    kept = df.select(
        "event_id",
        (
            F.lag("ts_sec").over(w).isNull()
            | (F.col("ts_sec") - F.lag("ts_sec").over(w) > _DEBOUNCE_SEC)
        ).alias("kept"),
    ).collect()
    got = {r["event_id"]: r["kept"] for r in kept}
    assert got == {1: True, 2: False, 3: True}


def test_temporal_join_boundaries_half_open(spark):
    """valid_from ≤ t < valid_to: a click AT valid_from belongs to that
    version; a click AT valid_to belongs to the NEXT one."""
    dim = spark.createDataFrame(
        [(7, 100, 200, 1), (7, 200, None, 2)],
        "user_id bigint, valid_from bigint, valid_to bigint, version bigint",
    )
    clicks = spark.createDataFrame(
        [(7, 100), (7, 199), (7, 200), (7, 99)],
        "user_id bigint, ts_sec bigint",
    )
    j = clicks.alias("c").join(
        dim.alias("d"),
        (F.col("c.user_id") == F.col("d.user_id"))
        & (F.col("c.ts_sec") >= F.col("d.valid_from"))
        & (F.col("d.valid_to").isNull() | (F.col("c.ts_sec") < F.col("d.valid_to"))),
        "left",
    ).select("c.ts_sec", F.coalesce("d.version", F.lit(0)).alias("version"))
    got = {r["ts_sec"]: r["version"] for r in j.collect()}
    assert got == {100: 1, 199: 1, 200: 2, 99: 0}


def test_peak_concurrency_touching_spans_do_not_overlap(spark):
    """Half-open spans: one span ending exactly when another starts
    must NOT read as concurrency 2 (ends sort before starts at equal
    t — delta ascending)."""
    from gasket_rs_spark.operators.analytics import _SPAN_SEC_CONC

    t0 = 5000
    rows = [(1, t0), (2, t0 + _SPAN_SEC_CONC)]  # back-to-back, touching
    ev = spark.createDataFrame(rows, "event_id bigint, t0 bigint")
    pts = ev.select(
        "event_id", F.col("t0").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        ev.select(
            "event_id", (F.col("t0") + _SPAN_SEC_CONC).alias("t"),
            F.lit(-1).alias("delta"),
        )
    )
    from pyspark.sql import Window

    # single tiny synthetic frame: the literal-partition window is
    # test-only (the source guard audits the package, not tests)
    w = Window.partitionBy(F.lit(1)).orderBy("t", "delta", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    peak = pts.select(F.sum("delta").over(w).alias("live")).agg(
        F.max("live")
    ).collect()[0][0]
    assert peak == 1


def test_dv_boundary_position_one_deletes(spark, sf_dir):
    """Deletion vectors are 1-indexed positions: deleting pos 1 of a
    file removes that file's FIRST row, not an off-by-one neighbor."""
    rows = spark.createDataFrame(
        [(10, 1, 5), (10, 2, 7), (11, 1, 9)],
        "file_id bigint, pos bigint, qty bigint",
    )
    dv = spark.createDataFrame([(10, 1)], "file_id bigint, pos bigint")
    live = rows.join(dv, ["file_id", "pos"], "left_anti")
    got = sorted((r["file_id"], r["pos"]) for r in live.collect())
    assert got == [(10, 2), (11, 1)]


def test_isotonic_boundary_single_bucket(spark):
    """PAV on a single bucket is its own (floored) mean — the j=k=b
    degenerate case of the minimax."""
    buckets = [(4, 3)]  # cnt=4, pos=3
    from tests.test_estimator_fuzz import _minimax_pav

    assert _minimax_pav(buckets) == [3 * 1_000_000 // 4]
