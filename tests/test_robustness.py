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
