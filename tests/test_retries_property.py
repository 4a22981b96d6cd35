"""Property-based parity tests for the retry policy (reference
retries.rs:5-78 semantics), sweeping the parameter space with hypothesis
instead of the three hand-picked cases in test_runtime:

- attempts == max_retries + 1 for an always-failing unit, for ANY policy;
- the backoff schedule is unit * factor**n capped at max_backoff, with no
  delay before the first attempt;
- dismissible policies swallow exhaustion exactly once, non-dismissible
  re-raise the final error.
"""

from __future__ import annotations

import pytest

from hypothesis import given, settings
from hypothesis import strategies as st

from gasket_rs_spark.pipeline.retries import Retry, RetryPolicy, retry_call



# Fuzz lane (VERDICT r14 #4): randomized/property spec — excluded from
# the default pytest lane (see pytest.ini); run via -m fuzz.
pytestmark = pytest.mark.fuzz

@given(
    max_retries=st.integers(min_value=0, max_value=6),
    dismissible=st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_attempt_count_and_exhaustion(max_retries, dismissible):
    policy = RetryPolicy(
        max_retries=max_retries, backoff_unit=0.0, dismissible=dismissible
    )
    attempts = []
    dismissed = []

    def fn():
        attempts.append(1)
        raise RuntimeError("always fails")

    if dismissible:
        out = retry_call(fn, policy, on_dismiss=lambda: dismissed.append(1))
        assert out is None
        assert dismissed == [1]
    else:
        try:
            retry_call(fn, policy)
            raise AssertionError("expected the final error to propagate")
        except RuntimeError:
            pass
    # reference semantics: a unit is attempted max_retries + 1 times total
    assert len(attempts) == max_retries + 1


@given(
    unit=st.floats(min_value=1e-4, max_value=10.0, allow_nan=False),
    factor=st.floats(min_value=1.0, max_value=8.0, allow_nan=False),
    cap=st.floats(min_value=1e-3, max_value=100.0, allow_nan=False),
    retry=st.integers(min_value=0, max_value=20),
)
@settings(max_examples=200, deadline=None)
def test_backoff_schedule_formula(unit, factor, cap, retry):
    policy = RetryPolicy(backoff_unit=unit, backoff_factor=factor, max_backoff=cap)
    delay = policy.backoff_delay(retry)
    if retry <= 0:
        assert delay == 0.0  # first attempt: no delay (retries.rs:29-32)
    else:
        assert delay == min(unit * factor**retry, cap)
        assert delay <= cap


@given(max_retries=st.integers(min_value=1, max_value=5))
@settings(max_examples=20, deadline=None)
def test_succeeds_midway_stops_retrying(max_retries):
    policy = RetryPolicy(max_retries=max_retries, backoff_unit=0.0)
    calls = []

    def fn():
        calls.append(1)
        if len(calls) < max_retries:  # succeed on the last allowed retry
            raise RuntimeError("transient")
        return "ok"

    assert retry_call(fn, policy) == "ok"
    assert len(calls) == max_retries


def test_recorded_sleeps_follow_schedule():
    """Deterministic end-to-end check that wait_backoff actually sleeps
    the schedule (sleep injected, no wall-clock dependence)."""
    slept = []
    policy = RetryPolicy(max_retries=3, backoff_unit=0.5, backoff_factor=2.0, max_backoff=3.0)
    r = Retry(policy, _sleep=slept.append)
    for _ in range(3):
        r.next()
        r.wait_backoff()
    # retries 1..3: 0.5*2^1=1.0, 0.5*2^2=2.0, min(0.5*2^3, 3.0)=3.0
    assert slept == [1.0, 2.0, 3.0]
