"""Pins for bench.py's per-pass co-tenancy meter (VERDICT r12 #4).

The meter is what makes `headline_clean_min_total_sec` trustworthy: a
pass is clean iff external (non-session) CPU stayed under the threshold.
These tests pin the arithmetic and the session-attribution direction —
CPU burned by THIS session must not count as external (else every pass
would read dirty and clean-min degenerates to the plain min silently).
The flaky part (absolute external load on a shared box) is deliberately
NOT asserted.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def test_cpu_totals_monotone_and_session_scoped():
    busy0, own0 = bench._cpu_totals()
    assert busy0 > 0 and own0 > 0  # this pytest process is in the session
    # burn ~0.2s of CPU in THIS process (same session)
    t_end = time.process_time() + 0.2
    x = 0
    while time.process_time() < t_end:
        x += 1
    busy1, own1 = bench._cpu_totals()
    assert busy1 >= busy0 and own1 >= own0
    # our own burn must be attributed to the session, not to external:
    # own grew by roughly the burn (scheduler jitter tolerated)
    assert own1 - own0 >= 0.1


def test_pass_meter_fields_and_clean_rule():
    m = bench._PassMeter()
    m.start()
    time.sleep(0.05)
    out = m.stop()
    assert set(out) >= {
        "elapsed_sec", "load_avg_start", "load_avg_end",
        "external_cpu_sec", "external_cores", "clean",
    }
    assert out["external_cpu_sec"] >= 0.0
    assert out["external_cores"] >= 0.0
    # the clean flag is exactly the threshold comparison — no hidden state
    assert out["clean"] == (
        out["external_cores"] <= bench.CLEAN_PASS_EXTERNAL_CORES
    )


def test_own_session_cpu_not_external():
    """A CPU burn inside this session must not flip a pass dirty: the
    meter's whole point is separating our work from the co-tenant's."""
    m = bench._PassMeter()
    m.start()
    t_end = time.process_time() + 0.3
    x = 0
    while time.process_time() < t_end:
        x += 1
    out = m.stop()
    # elapsed ~0.3s with ~0.3s own CPU: external_cores must be far below
    # the ~1.0 it would read if own CPU were misattributed as external.
    # Allow generous headroom for real background activity on the box.
    assert out["external_cores"] < 0.9, out
