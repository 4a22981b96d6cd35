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
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def _ambient_external_cores(duration: float = 1.0) -> float:
    """Pre-measure the box's current external-core rate over an idle
    bracket (this process sleeps, so everything the meter sees is kernel
    threads + co-tenants). VERDICT r13 #1: asserting an absolute external
    threshold over a short live window failed twice under real co-tenant
    bursts — the attribution tests below must be read RELATIVE to this
    ambient rate, or skipped outright when the box is already loaded."""
    m = bench._PassMeter()
    m.start()
    time.sleep(duration)
    return m.stop()["external_cores"]


def _burn_own_cpu(seconds: float) -> None:
    t_end = time.process_time() + seconds
    x = 0
    while time.process_time() < t_end:
        x += 1


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
    meter's whole point is separating our work from the co-tenant's.

    VERDICT r13 #1 hardening: the original 0.3 s burn with an absolute
    0.9-core assert failed under any real co-tenant burst (read 1.34 and
    2.73 external cores on a loaded box). Now: pre-measure the ambient
    external rate, skip when the box is already loaded (the assert would
    test the co-tenant, not the meter), burn >= 2 s so transient kernel
    activity amortizes, and assert RELATIVE to ambient."""
    ambient = _ambient_external_cores(1.0)
    if ambient > 1.5:
        pytest.skip(f"box already loaded: ambient external {ambient} cores")
    m = bench._PassMeter()
    m.start()
    _burn_own_cpu(2.0)
    out = m.stop()
    # ~2s own CPU over ~2s elapsed would read ~1.0 external core if
    # misattributed; correctly attributed, external stays near ambient.
    assert out["external_cores"] <= ambient + 0.6, (out, ambient)


def test_sibling_session_burn_is_external_but_own_is_not():
    """The r13-mandated companion: under a DELIBERATE concurrent CPU burn
    in a sibling *session* (a co-tenant stand-in), the meter must (a)
    count the sibling's work as external — the attribution direction that
    makes dirty-pass marking work at all — while (b) still not counting
    this session's own concurrent burn as external."""
    ambient = _ambient_external_cores(1.0)
    if ambient > 1.5:
        pytest.skip(f"box already loaded: ambient external {ambient} cores")
    # ~1 core for up to 6 s, in its OWN session (start_new_session) so the
    # meter's sid match classifies it external; time-bounded so a failed
    # kill can't leak a spinning process.
    burner = subprocess.Popen(
        [sys.executable, "-c",
         "import time\nt=time.time()+6\nwhile time.time()<t: pass"],
        start_new_session=True,
    )
    try:
        time.sleep(0.3)  # let the burner reach its spin loop
        m = bench._PassMeter()
        m.start()
        _burn_own_cpu(2.0)
        out = m.stop()
    finally:
        burner.kill()
        burner.wait()
    # (a) the sibling's ~1 core IS seen as external...
    assert out["external_cores"] >= 0.5, (out, ambient)
    # (b) ...but our own ~1-core burn is NOT stacked on top of it:
    # misattribution would read ~2.0+; correct attribution reads
    # ~ambient + 1 sibling core.
    assert out["external_cores"] <= ambient + 1.7, (out, ambient)
