"""Three-SF differential sweep → committed per-round artifact (VERDICT r9 #4).

With 207 catalog queries and a 50-entry driver window, queries in stable
modules rely on the LOCAL sweep for fresh correctness evidence between
driver checks — but until round 10 that sweep's results lived only in the
terminal. This script runs the full differential gate at sf0.001 / sf0.01 /
sf0.1 (the three-SF discipline: real flips were caught at the edge SFs that
sf0.01 missed) and writes ``LOCALVERIFY_r{N}.json`` at the repo root:

    {"round": N, "commit": sha, "spark": ver, "sfs": [...],
     "queries": {name: {"0.001": status, "0.01": status, "0.1": status}},
     "summary": {...}}

Statuses: EXACT / FLOAT-CLOSE / rows-only / FAIL (see verify_local.py).
The round number defaults to max(CORRECTNESS_r*) + 1 — the round this
evidence feeds.

Usage: python scripts/local_verify_sweep.py [round]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SFS = ("0.001", "0.01", "0.1")


def main() -> int:
    from gen_registry_order import available_rounds
    from verify_local import verify

    from gasket_rs_spark.session import get_session

    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else max(available_rounds()) + 1
    commit = subprocess.run(
        ["git", "-C", REPO, "rev-parse", "HEAD"],
        capture_output=True, text=True, check=True,
    ).stdout.strip()

    spark = get_session("local_verify_sweep", cpus=8)
    spark_version = spark.version
    per_sf: dict[str, dict[str, dict]] = {}
    for sf in SFS:
        print(f"=== sweep sf{sf} ===", flush=True)
        per_sf[sf] = verify(spark, f"/root/testdata/sf{sf}")
    spark.stop()

    names = sorted(set().union(*(per_sf[sf] for sf in SFS)))
    queries = {
        n: {sf: per_sf[sf].get(n, {}).get("status", "MISSING") for sf in SFS}
        for n in names
    }
    failures = sorted(
        n for n, sts in queries.items() if any(s == "FAIL" for s in sts.values())
    )
    float_close = sorted(
        n for n, sts in queries.items()
        if any(s == "FLOAT-CLOSE" for s in sts.values())
    )
    out = {
        "round": rnd,
        "commit": commit,
        "spark": spark_version,
        "sfs": list(SFS),
        "queries": queries,
        "summary": {
            "total": len(names),
            "failures": failures,
            "float_close": float_close,
            "all_exact_or_rows_only": not failures and not float_close,
        },
    }
    path = os.path.join(REPO, f"LOCALVERIFY_r{rnd}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"\nwrote {path}: {len(names)} queries, "
          f"{len(failures)} failures, {len(float_close)} float-close")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
