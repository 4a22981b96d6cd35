"""Fuzz-lane property pins for the r20 integer kernels.

1. `_tdiv` is THE cross-engine division contract (Spark ``div`` and
   DuckDB ``//`` truncate toward zero; Python ``//`` floors) — the
   verify-skill trap that has bitten twice (silhouette_score r11, the
   PCA means). Pin it differentially against live DuckDB over random
   int64 pairs, including the negative/positive sign grid.
2. `_BroadcastRing` wrap-around: under interleaved sends and reads at
   arbitrary lags, every receiver sees exactly the suffix of the
   stream it is entitled to (drop-oldest, Lagged(skipped) accounting
   sums with deliveries to the full send count) and close() still
   terminates every subscriber — the invariant the r20 circular-buffer
   rewrite must preserve at every (cap, schedule).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

pytestmark = pytest.mark.fuzz

I64 = 2**63 - 1


@settings(max_examples=200, deadline=None)
@given(
    a=st.integers(min_value=-I64, max_value=I64),
    b=st.integers(min_value=1, max_value=I64),
    sign=st.sampled_from([1, -1]),
)
def test_tdiv_matches_duckdb_integer_division(a, b, sign):
    from gasket_rs_spark.operators.similarity import _tdiv

    b = sign * b
    got = _tdiv(a, b)
    want = duckdb.sql(f"SELECT CAST({a} AS HUGEINT) // {b}").fetchone()[0]
    assert got == int(want), (a, b, got, want)
    # and the floor-division foot-gun is real: they differ iff the
    # exact quotient is negative and non-integral
    if (a % b != 0) and ((a < 0) != (b < 0)):
        assert got == a // b + 1
    else:
        assert got == a // b


@settings(max_examples=100, deadline=None)
@given(
    cap=st.integers(min_value=1, max_value=7),
    n_msgs=st.integers(min_value=0, max_value=25),
    n_receivers=st.integers(min_value=1, max_value=3),
)
def test_broadcast_ring_wraparound_suffix_invariant(cap, n_msgs, n_receivers):
    from gasket_rs_spark.pipeline.messaging import (
        InputPort,
        Lagged,
        OutputPort,
        broadcast_port,
    )

    out = OutputPort()
    inputs = [InputPort() for _ in range(n_receivers)]
    broadcast_port(out, inputs, cap=cap, lagged=True)

    for i in range(n_msgs):
        out.send(i)
    out.close()

    for inp in inputs:
        # every subscriber wired at tee time reads only after ALL sends
        # + the close sentinel: the ring retains the stream's last
        # min(n_msgs + 1, cap) entries, the sentinel pinned as newest
        seen: list[int] = []
        skipped = 0
        while True:
            try:
                msg = inp.recv(timeout=2.0)
            except Lagged as exc:
                skipped += exc.skipped
                continue
            if msg is None:
                break
            seen.append(msg.payload)
        # suffix property: delivery is a contiguous tail of 0..n_msgs-1
        assert seen == list(range(n_msgs - len(seen), n_msgs))
        # conservation: every sent payload is either delivered or
        # accounted for in Lagged(skipped) — the sentinel is NOT
        # counted as a payload but MAY be counted as skipped only if
        # it were evicted, which the close pin forbids
        assert skipped + len(seen) == n_msgs
        # drop-oldest bound: at most cap payloads retained at any read
        assert len(seen) <= max(0, min(n_msgs, cap))
