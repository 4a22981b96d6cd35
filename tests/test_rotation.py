"""CI-style pin of the catalog-rotation invariant (VERDICT r6 #2).

Fails when ``gasket_rs_spark/registry_order.py`` is out of date with the
working tree — i.e. an operator module changed after the order was last
generated, so the driver's next 50-entry correctness window would re-check
already-proven queries while changed code goes unverified. Fix by running
``python scripts/gen_registry_order.py``.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_check():
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "check_rotation.py")],
        capture_output=True,
        text=True,
    )


def test_rotation_invariant_holds():
    proc = _run_check()
    assert proc.returncode == 0, proc.stdout + proc.stderr


def test_age_cap_promotes_stale_green_evidence():
    """Round-10 age cap (VERDICT r9 #5): a green-and-unchanged query whose
    driver evidence is older than AGE_CAP rounds must be promoted ahead of
    changed-module re-checks (rank 1, before every rank-2 entry), so
    worst-case driver-evidence age is bounded instead of indefinite."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from gen_registry_order import AGE_CAP, available_rounds, compute_order

    assert AGE_CAP == 6
    rounds = available_rounds()
    order, meta = compute_order(set(rounds))
    upcoming = max(rounds) + 1

    ranks = [meta[n][0] for n in order]
    assert ranks == sorted(ranks), "order must be non-decreasing in rank"
    for n in order:
        rk, rnd = meta[n]
        if rk == 1:  # promoted = valid evidence, but over the cap
            assert upcoming - rnd > AGE_CAP, (n, rnd)
        if rk == 3:  # fresh green must be within the cap
            assert upcoming - rnd <= AGE_CAP, (n, rnd)
    # within each rank class the rotation is oldest-checked first
    for a, b in zip(order, order[1:]):
        if meta[a][0] == meta[b][0]:
            assert meta[a][1] <= meta[b][1], (a, b)


def test_driver_artifact_drop_does_not_fail_suite():
    """Self-healing rule (VERDICT r7 #2): a new CORRECTNESS_r{N}.json
    appearing at round end — rounds not in registry_order.ROUNDS — must
    not by itself fail the rotation check; it is noted and folded in at
    the next regen."""
    import json

    from gasket_rs_spark import registry_order

    fake_round = max(registry_order.ROUNDS) + 90
    path = os.path.join(REPO, f"CORRECTNESS_r{fake_round}.json")
    assert not os.path.exists(path)
    with open(path, "w") as f:
        json.dump({registry_order.ORDER[0]: {"hash_match": True}}, f)
    try:
        proc = _run_check()
    finally:
        os.remove(path)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    # Assert only that the fake round is noted as postdating — NOT the
    # exact bracket list: a real driver artifact sitting untracked in the
    # tree (exactly the situation this test exists for) would otherwise
    # fail the string match, as round 8's real CORRECTNESS_r08.json did
    # (`rounds [8, 97] postdate` vs the asserted `rounds [97]`).
    assert "postdate" in proc.stdout, proc.stdout
    import re

    m = re.search(r"rounds \[([0-9, ]+)\] postdate", proc.stdout)
    assert m, proc.stdout
    noted = [int(x) for x in m.group(1).split(",")]
    assert fake_round in noted, proc.stdout
