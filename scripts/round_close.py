"""End-of-round gate — refuse the snapshot on red (VERDICT r10 #3).

Round 10 shipped a red test suite because a 3-second check was never run
before the end-of-round commit. This script is that check: it runs the
fast, JVM-free invariants and exits non-zero if any fails, so the
snapshot commit can be gated on `python scripts/round_close.py`.

Checks (all complete in seconds — no SparkSession):
  1. scripts/check_rotation.py        — committed registry_order.py is
     reproducible from the current tree + CORRECTNESS artifacts (the
     round-10 failure mode: witnesses added after the last regen).
  2. pytest tests/test_rotation.py    — the rotation pins themselves.
  3. pytest test_plans.py::test_no_unpartitioned_window_in_source —
     the source-level anti-pattern guard (bare Window.orderBy /
     unaudited single-partition windows).
  4. pytest tests/test_registry_schemas.py — structural witness/oracle
     registry invariants (no top-level array columns in oracled
     witnesses, every oracle key has a witness, docstring discipline).
  5. LOCALVERIFY_r{N}.json freshness — the committed 3-SF sweep artifact
     for the closing round must exist and report zero failures (the
     round-9/10 gap: the sweep was claimed but never committed).

Usage: python scripts/round_close.py [round]
  round defaults to max(CORRECTNESS_r*) + 1 (the round being closed).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FAST_TESTS = [
    "tests/test_rotation.py",
    "tests/test_plans.py::test_no_unpartitioned_window_in_source",
    "tests/test_registry_schemas.py",
]


def run(label: str, cmd: list[str]) -> bool:
    print(f"--- {label}: {' '.join(cmd)}", flush=True)
    rc = subprocess.run(cmd, cwd=REPO).returncode
    print(f"--- {label}: {'OK' if rc == 0 else f'FAIL (rc={rc})'}", flush=True)
    return rc == 0


def check_localverify(rnd: int) -> bool:
    path = os.path.join(REPO, f"LOCALVERIFY_r{rnd}.json")
    if not os.path.exists(path):
        print(f"--- localverify: FAIL — {path} missing "
              f"(run scripts/local_verify_sweep.py {rnd})")
        return False
    with open(path) as f:
        art = json.load(f)
    failures = art.get("summary", {}).get("failures", ["<unreadable>"])
    n = art.get("summary", {}).get("total", 0)
    if failures:
        print(f"--- localverify: FAIL — {len(failures)} failing queries: "
              f"{failures[:5]}")
        return False
    print(f"--- localverify: OK ({n} queries, 0 failures)")
    return True


def main() -> int:
    from gen_registry_order import available_rounds

    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else max(available_rounds()) + 1
    ok = True
    ok &= run("rotation", [sys.executable, "scripts/check_rotation.py"])
    ok &= run("fast-tests", [sys.executable, "-m", "pytest", "-q", *FAST_TESTS])
    ok &= check_localverify(rnd)
    print(f"\nround_close r{rnd}: {'GREEN — safe to snapshot' if ok else 'RED — do not snapshot'}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
