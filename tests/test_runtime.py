"""Pipeline-runner tests mirroring the reference suite
(gasket/src/runtime.rs:480-720 — happy path, max-retries, cancel-in-time)
with the mock_counter_stage fixture family (FIXTURES.md §A).
"""

from __future__ import annotations

import time

import pytest

from gasket_rs_spark.pipeline.retries import RetryPolicy
from gasket_rs_spark.pipeline.runtime import (
    Daemon,
    Policy,
    Scheduled,
    Stage,
    StagePhase,
    TetherState,
    Worker,
    WorkerError,
    spawn_stage,
)


class MockWorker(Worker):
    """Counts lifecycle calls; injects failures / delays by unit index
    (runtime.rs:486-570)."""

    def __init__(self, stage: "MockStage"):
        self.cfg = stage

    def bootstrap(self, stage):
        self.cfg.bootstrap_count += 1

    def schedule(self, stage):
        time.sleep(self.cfg.schedule_delay)
        self.cfg.schedule_count += 1
        if self.cfg.schedule_count > self.cfg.units:
            return Scheduled.done()
        return Scheduled.unit_of(self.cfg.schedule_count)

    def execute(self, unit, stage):
        time.sleep(self.cfg.execute_delay)
        self.cfg.execute_count += 1
        self.cfg.executed_units.append(unit)
        if self.cfg.failures and self.cfg.failures[unit % len(self.cfg.failures)]:
            raise RuntimeError(f"injected failure on unit {unit}")

    def teardown(self):
        self.cfg.teardown_count += 1


class MockStage(Stage):
    def __init__(self, name="mock", units=5, failures=None, schedule_delay=0.0, execute_delay=0.0):
        super().__init__(name=name)
        self.units = units
        self.failures = failures or []
        self.schedule_delay = schedule_delay
        self.execute_delay = execute_delay
        self.bootstrap_count = 0
        self.schedule_count = 0
        self.execute_count = 0
        self.teardown_count = 0
        self.executed_units = []

    def worker(self):
        return MockWorker(self)


def test_stage_machine_happy_path():
    """runtime.rs:590-615: bootstrap → 5 units → done → teardown → ended."""
    stage = MockStage(units=5)
    tether = spawn_stage(stage, Policy())
    tether.join_stage(timeout=10)
    assert tether.phase is StagePhase.ENDED
    assert stage.bootstrap_count == 1
    assert stage.execute_count == 5
    assert stage.executed_units == [1, 2, 3, 4, 5]
    assert stage.teardown_count == 1
    assert tether.read_metrics()["tick_count"] > 0


def test_honors_max_retries():
    """runtime.rs:617-662: max_retries=3 ⇒ the SAME unit executes exactly
    4 times, then the stage tears down."""
    stage = MockStage(units=5, failures=[True])  # every unit fails
    policy = Policy(work_retry=RetryPolicy(max_retries=3, backoff_unit=0.001))
    tether = spawn_stage(stage, policy)
    tether.join_stage(timeout=10)
    assert tether.phase is StagePhase.ENDED
    assert stage.execute_count == 4
    assert stage.executed_units == [1, 1, 1, 1]
    assert stage.teardown_count == 1
    assert tether.error is not None


def test_dismissible_skips_unit_and_continues():
    """retries.rs dismissible (runtime.rs:272-274): maxed unit is skipped,
    subsequent units still run."""
    stage = MockStage(units=3, failures=[False, True, False, False])  # unit 1 fails
    policy = Policy(work_retry=RetryPolicy(max_retries=2, backoff_unit=0.001, dismissible=True))
    tether = spawn_stage(stage, policy)
    tether.join_stage(timeout=10)
    assert tether.phase is StagePhase.ENDED
    # unit 1: 3 attempts (dismissed), units 2 and 3: 1 attempt each
    assert stage.executed_units == [1, 1, 1, 2, 3]


def test_honors_cancel_in_time():
    """runtime.rs:691-719: dismissing a stage with slow schedule/execute
    still shuts down promptly (fast-teardown guarantee)."""
    stage = MockStage(units=5, schedule_delay=0.5, execute_delay=0.5)
    tether = spawn_stage(stage, Policy(tick_timeout=10))
    time.sleep(0.2)
    t0 = time.monotonic()
    tether.dismiss_stage()
    tether.join_stage(timeout=5)
    elapsed = time.monotonic() - t0
    assert tether.phase is StagePhase.ENDED
    # bounded by at most one in-flight phase op (0.5 s) + epsilon
    assert elapsed < 1.5


def test_worker_restart_rebootstraps():
    """runtime.rs:268,280: WorkerError::Restart ⇒ teardown + re-bootstrap
    without ending the stage."""

    class RestartOnceWorker(MockWorker):
        def execute(self, unit, stage):
            self.cfg.execute_count += 1
            self.cfg.executed_units.append(unit)
            if unit == 2 and self.cfg.bootstrap_count == 1:
                raise WorkerError(WorkerError.RESTART)

    class RestartStage(MockStage):
        def worker(self):
            return RestartOnceWorker(self)

    stage = RestartStage(units=4)
    tether = spawn_stage(stage, Policy())
    tether.join_stage(timeout=10)
    assert tether.phase is StagePhase.ENDED
    assert stage.bootstrap_count == 2
    assert stage.teardown_count == 2  # restart teardown + final teardown


def test_daemon_stops_when_stage_ends():
    """daemon.rs:36-48: any ended stage stops the pipeline; two-phase
    teardown joins everything."""
    fast = MockStage(name="fast", units=2)
    slow = MockStage(name="slow", units=10_000, schedule_delay=0.01)
    tethers = [spawn_stage(fast), spawn_stage(slow)]
    daemon = Daemon(tethers)
    t0 = time.monotonic()
    daemon.block()
    assert time.monotonic() - t0 < 10
    assert tethers[0].phase is StagePhase.ENDED
    metrics = daemon.read_all_metrics()
    assert set(metrics) == {"fast", "slow"}


def test_tether_blocked_detection():
    """runtime.rs:383-404: no tick within tick_timeout ⇒ Blocked."""
    stage = MockStage(units=1, execute_delay=2.0)
    tether = spawn_stage(stage, Policy(tick_timeout=0.2))
    time.sleep(0.6)  # past bootstrap tick, stuck in slow execute
    assert tether.check_state() is TetherState.BLOCKED
    tether.dismiss_stage()
    tether.join_stage(timeout=5)


@pytest.mark.parametrize(
    "retry_n,expected",
    [(0, 0.0), (1, 0.002), (2, 0.004), (3, 0.008), (20, 0.05)],
)
def test_backoff_schedule(retry_n, expected):
    """retries.rs:74-78: unit × factor^n (compute_backoff_delay uses the
    1-based retry count as the exponent), capped at max_backoff."""
    p = RetryPolicy(max_retries=10, backoff_unit=0.001, backoff_factor=2.0, max_backoff=0.05)
    assert p.backoff_delay(retry_n) == pytest.approx(expected)
