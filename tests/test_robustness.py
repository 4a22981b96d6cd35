"""Robustness odds-and-ends: persist/plan-reuse for broadcast/tee fan-out,
daemon signal handling, and retry-policy properties (hypothesis)."""

from __future__ import annotations

import os
import signal
import threading
import time

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from gasket_rs_spark.pipeline.dataframe_pipeline import tee
from gasket_rs_spark.pipeline.retries import RetryPolicy
from gasket_rs_spark.pipeline.runtime import Daemon, Policy, Scheduled, Stage, Worker, spawn_stage
from gasket_rs_spark.plans.inspect import executed_plan
from gasket_rs_spark.tables import load


def test_persisted_tee_reuses_in_memory_scan(spark, sf_dir):
    """R11 broadcast at execution time: persisting the shared upstream
    makes every branch read the cached relation instead of rescanning."""
    events = load(spark, sf_dir, "events").persist()
    try:
        events.count()  # materialize
        a, b = tee(
            events,
            lambda df: df.groupBy("event_type").count(),
            lambda df: df.groupBy("user_id").count(),
        )
        for branch in (a, b):
            assert "InMemoryTableScan" in executed_plan(branch)
    finally:
        events.unpersist()


def test_daemon_handles_sigterm():
    """daemon.rs:17-25: TERM flips the terminated flag; block() returns
    and tears down the (otherwise infinite) pipeline."""

    class Forever(Stage):
        def worker(self):
            class W(Worker):
                def schedule(self, stage):
                    time.sleep(0.01)
                    return Scheduled.unit_of(1)

                def execute(self, unit, stage):
                    pass

            return W()

    stage = Forever(name="forever")
    tether = spawn_stage(stage, Policy(tick_timeout=30))
    daemon = Daemon([tether], handle_signals=True)

    def fire():
        time.sleep(0.3)
        os.kill(os.getpid(), signal.SIGTERM)

    threading.Thread(target=fire, daemon=True).start()
    t0 = time.monotonic()
    daemon.block()
    assert time.monotonic() - t0 < 5
    tether.join_stage(timeout=5)


@given(
    retries=st.integers(min_value=0, max_value=30),
    unit=st.floats(min_value=1e-4, max_value=10.0, allow_nan=False),
    factor=st.floats(min_value=1.0, max_value=4.0, allow_nan=False),
    cap=st.floats(min_value=1e-3, max_value=100.0, allow_nan=False),
)
@settings(max_examples=200, deadline=None)
def test_backoff_properties(retries, unit, factor, cap):
    """retries.rs:74-78 invariants: no delay before the first attempt,
    monotone non-decreasing, never exceeds max_backoff."""
    p = RetryPolicy(max_retries=10, backoff_unit=unit, backoff_factor=factor, max_backoff=cap)
    assert p.backoff_delay(0) == 0.0
    prev = 0.0
    for n in range(1, retries + 1):
        d = p.backoff_delay(n)
        assert d <= cap + 1e-12
        assert d >= prev - 1e-12 or d == cap
        prev = d


def test_events_load_rejects_non_utc_session(spark, sf_dir):
    """ADVICE r6: the NTZ->timestamp cast in tables.load is only
    value-preserving under a UTC session tz — a mis-configured session
    must fail loudly, not silently shift every events-based result."""
    import pytest

    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with pytest.raises(RuntimeError, match="timeZone=UTC"):
            load(spark, sf_dir, "events")
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    load(spark, sf_dir, "events")  # restored session loads fine


def test_text_ops_survive_degenerate_documents(spark):
    """Empty, whitespace-only, single-token, and NULL texts must flow
    through the round-8 text operators without crashing and with sane
    accounting — the driver regenerates fixtures between rounds, so
    degenerate rows are a when, not an if."""
    from gasket_rs_spark.operators.text import span_dedup

    docs = spark.createDataFrame(
        [
            (1, ""),
            (2, "   "),
            (3, "one"),
            (4, None),
            (5, "a b c d e f g h"),  # exactly one 8-token window
            (6, "a b c d e f g h"),  # its exact duplicate
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in span_dedup(docs).collect()}
    # NULL text: split -> null array -> posexplode drops the doc entirely
    assert 4 not in out
    # empty string splits to [''] (one empty token), whitespace to ['','','',''].
    assert out[1].n_tokens == 1 and out[1].n_removed == 0
    assert out[2].n_tokens == 4 and out[2].n_removed == 0
    assert out[3].n_tokens == 1 and out[3].n_dup_windows == 0
    assert out[5].n_removed == 0, "first occurrence survives"
    assert out[6].n_removed == 8 and out[6].keep_ratio == 0.0


def test_entropy_degenerate_and_uniform(spark, sf_dir):
    """Entropy bounds: 0 for a constant doc, log2(n) for an all-distinct
    doc; norm_entropy in [0, 1] corpus-wide."""
    from pyspark.sql import functions as F

    from gasket_rs_spark.operators.text import q_text_token_entropy

    rows = q_text_token_entropy(spark, sf_dir).collect()
    for r in rows:
        assert -1e-9 <= r.norm_entropy <= 1.0 + 1e-9
        assert r.entropy >= -1e-9


def test_round9_operators_survive_degenerate_inputs(spark):
    """Degenerate-input pins for the round-9 additions: empty streams,
    single-row groups, and merge-free corpora must produce well-formed
    (possibly empty) results, never raise."""
    import pandas as pd

    from gasket_rs_spark.operators import sketches as K
    from gasket_rs_spark.operators.bpe import encode_words, train_bpe
    from gasket_rs_spark.operators.dedup import simhash_pairs

    # Misra-Gries: empty stream -> empty summary, empty candidates
    empty = spark.createDataFrame([], "item bigint")
    assert K._mg_summaries(empty, 8).count() == 0

    # MG: stream smaller than k -> lossless passthrough (counts exact)
    tiny = spark.createDataFrame([(1,), (1,), (2,)], "item bigint").coalesce(1)
    got = {(r.item, r.mg_count) for r in K._mg_summaries(tiny, 8).collect()}
    assert got == {(1, 2), (2, 1)}

    # BPE: single-char words have no pairs -> zero merges; encode of an
    # empty merge list is the identity segmentation
    docs = spark.createDataFrame([(0, "a b c a")], "doc_id long, text string")
    merges = train_bpe(spark, docs, 5)
    assert merges == []
    enc = encode_words(
        spark.createDataFrame([("ab",)], "w string"), merges
    ).collect()
    assert enc[0]["encoding"] == "a b" and enc[0]["n_subtok"] == 2

    # paragraph-grain simhash core: single doc -> no pairs, no error
    one = spark.createDataFrame([(0, "x y z w")], "doc_id long, text string")
    assert simhash_pairs(one).count() == 0


def test_winsorize_single_row_group_is_identity(spark):
    """n = 1: ceil(0.01*1) = ceil(0.99*1) = 1, so p01 = p99 = the value
    and the winsorized mean equals the raw mean."""
    from gasket_rs_spark.operators import stats as S

    import gasket_rs_spark.operators.stats as stats_mod
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    ev = spark.createDataFrame(
        [("a", 7.0), ("b", 1.0), ("b", 3.0)], "event_type string, value double"
    )
    # replicate the witness body over an in-memory frame
    w = Window.partitionBy("event_type").orderBy("value")
    ranked = ev.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(Window.partitionBy("event_type"))
    )
    cuts = (
        ranked.where(
            (F.col("rn") == F.ceil(F.lit(S._WINSOR_LO) * F.col("n")))
            | (F.col("rn") == F.ceil(F.lit(S._WINSOR_HI) * F.col("n")))
        )
        .groupBy("event_type")
        .agg(F.min("value").alias("p_lo"), F.max("value").alias("p_hi"))
    )
    got = {r.event_type: (r.p_lo, r.p_hi) for r in cuts.collect()}
    assert got["a"] == (7.0, 7.0)
    assert got["b"] == (1.0, 3.0)
