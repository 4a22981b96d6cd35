"""End-to-end replay of driver under-serve scenarios through the real
round-close evidence gate (VERDICT r17 #3).

The age-breach attribution (round_close.age_breach_verdict and its
capacity-displacement cascade) was pinned only on synthetic rank tables
until r18. These tests replay ACTUAL under-served window/snapshot pairs:
each scenario clones this repo at HEAD into a scratch git repo, injects
the under-serve into real driver artifacts, runs the real generator
(scripts/gen_registry_order.py) to produce every intermediate rotation
order mechanically — no hand-built ranks anywhere — and then drives
``round_close.check_evidence_debt`` exactly as the close does.

Building the multi-round scenario this way is what exposed the r17
cascade gap: over-cap witnesses whose module changed since their last
green check carry recorded rank 2, sort after every rank-1 entry by the
generator's validity-before-age policy, and are therefore the FIRST
cohort pushed beyond the 50-prefix when a driver outage builds a
backlog — the rank<=1 displacement test misattributed them as builder
faults (a red no code change could fix). The widened rank<=2 rule is
asserted here on mechanically generated orders.

Fuzz lane: each scenario costs a git clone plus 1-4 generator runs
(~10-90 s)."""

from __future__ import annotations

import glob
import io
import json
import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.fuzz


def _git(clone: str, *args: str) -> None:
    subprocess.run(
        ["git", "-C", clone, "-c", "user.email=replay@test",
         "-c", "user.name=replay"] + list(args),
        check=True, capture_output=True,
    )


def _clone_repo(dst: str) -> None:
    subprocess.run(
        ["git", "clone", "-q", REPO, dst], check=True, capture_output=True
    )


def _run_in_clone(clone: str, body: str) -> str:
    """Run a python snippet with the CLONE's scripts/ and package on
    sys.path (so round_close resolves REPO to the clone) and return its
    stdout."""
    prelude = (
        "import sys\n"
        f"sys.path.insert(0, {os.path.join(clone, 'scripts')!r})\n"
        f"sys.path.insert(0, {clone!r})\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", prelude + body],
        capture_output=True, text=True, cwd=clone,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def _last_checked(clone: str, before_round: int) -> dict[str, int]:
    last: dict[str, int] = {}
    for p in glob.glob(os.path.join(clone, "CORRECTNESS_r*.json")):
        r = int(re.search(r"r(\d+)\.json$", p).group(1))
        if r < before_round:
            with open(p) as f:
                for name in json.load(f):
                    last[name] = max(last.get(name, -1), r)
    return last


def test_single_underserve_gets_driver_grace_end_to_end(tmp_path):
    """Replay: the driver serves the real r17 window minus its oldest-
    evidence witnesses (the age-at-cap cohort). At the next close those
    witnesses breach the age cap; the attribution must read the REAL
    committed r17 snapshot, classify the breach as driver fault, WARN,
    and keep the close GREEN for the one-round grace."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from gen_registry_order import MAX_DRIVER_AGE

    clone = str(tmp_path / "clone")
    _clone_repo(clone)

    # the under-serve: drop every served witness whose PRIOR evidence
    # would put it exactly one round over the cap at the r18 close —
    # derived from artifacts, not hand-picked names
    art = os.path.join(clone, "CORRECTNESS_r17.json")
    with open(art) as f:
        served = json.load(f)
    prior = _last_checked(clone, 17)
    drop = [n for n in served if prior.get(n, -1) == 18 - (MAX_DRIVER_AGE + 1)]
    assert drop, "history no longer contains an age-at-cap r17 cohort"
    for n in drop:
        del served[n]
    with open(art, "w") as f:
        json.dump(served, f, indent=1)

    out = _run_in_clone(
        clone,
        "from round_close import check_evidence_debt\n"
        "print('RESULT:', check_evidence_debt(18))\n",
    )
    assert "RESULT: True" in out, out          # close stays green
    assert "WARN — DRIVER-fault breach" in out, out
    assert "BUILDER" not in out, out           # never a builder red
    assert "EXHAUSTED" not in out, out
    for n in drop:                             # every dropped name graced
        assert n in out, (n, out)


def test_stale_regen_reds_as_builder_fault_end_to_end(tmp_path):
    """The widened rank<=2 displacement grace must NOT lose the builder-
    fault detector. Replay: the BUILDER stops running the registry regen
    for three rounds while the driver keeps serving the (now frozen)
    window prefix. Witnesses whose evidence silently ages past the cap
    while the stale order still records them rank 3 (green-and-within-
    cap at its long-past generation) must red the close as BUILDER
    fault — rank 3 on a breacher proves the committed order predates the
    aging, which is exactly the failure a regen fixes. Module-changed
    age-mates (recorded rank 2, legitimately sorted beyond the prefix)
    stay driver-graced even in this scenario: the fault split is
    per-witness, not per-round."""
    clone = str(tmp_path / "clone")
    _clone_repo(clone)

    base = max(
        int(re.search(r"r(\d+)\.json$", p).group(1))
        for p in glob.glob(os.path.join(clone, "CORRECTNESS_r*.json"))
    )
    order_path = os.path.join(clone, "gasket_rs_spark", "registry_order.py")
    with open(order_path) as f:
        stale_text = f.read()
    window = re.findall(r"^    '(\w+)',", stale_text, re.M)[:50]

    for n_round in range(base + 1, base + 4):
        # builder never folds: every snapshot carries the SAME stale
        # order, and the driver keeps serving its frozen prefix
        _git(clone, "commit", "--allow-empty", "-q", "-m",
             f"round {n_round}: end-of-round snapshot")
        art = {
            n: {"rows_match": True, "schema_match": True,
                "hash_match": True, "spark_rows": 1, "oracle_rows": 1,
                "err": None}
            for n in window
        }
        with open(os.path.join(clone, f"CORRECTNESS_r{n_round}.json"),
                  "w") as f:
            json.dump(art, f, indent=1)
        _git(clone, "add", "-A")
        _git(clone, "commit", "-q", "-m",
             f"round {n_round}: verdict/advice/correctness/bench")

    closing = base + 4
    out = _run_in_clone(
        clone,
        "import io, json, contextlib\n"
        "import round_close as rc\n"
        "buf = io.StringIO()\n"
        "with contextlib.redirect_stdout(buf):\n"
        f"    ok = rc.check_evidence_debt({closing})\n"
        "text = buf.getvalue()\n"
        "print(text)\n"
        "import re as _re\n"
        "m = _re.search(r'BUILDER[^:]*: \\[([^\\]]*)\\]', text)\n"
        "names = _re.findall(r\"'(\\w+)'\", m.group(1)) if m else []\n"
        f"_, ranks, _ = rc.parse_registry_order_block(open({order_path!r}).read())\n"
        "print('JSON:', json.dumps({'ok': ok,\n"
        "    'builder_ranks': sorted({ranks.get(n, -9) for n in names}),\n"
        "    'n_builder': len(names)}))\n",
    )
    verdict_json = json.loads(out.split("JSON:")[1])

    # the stale regen reds the close as builder fault…
    assert verdict_json["ok"] is False
    assert "BUILDER broke rotation" in out, out
    # …and every builder-attributed breacher was recorded rank 3 in the
    # stale order (green-within-cap at its generation — the smoking gun
    # that the order predates the aging)
    assert verdict_json["n_builder"] >= 1, out
    assert verdict_json["builder_ranks"] == [3], verdict_json
    # module-changed age-mates (recorded rank 2, beyond the prefix) keep
    # the driver-side grace even while the builder is at fault
    assert "WARN — DRIVER-fault breach" in out, out


def test_multi_round_outage_cascade_attribution_end_to_end(tmp_path):
    """Replay: four consecutive rounds in which the driver serves only
    10 of the 50 asked witnesses, with the rotation order regenerated
    MECHANICALLY (the real generator, real snapshot/verdict commit
    structure) between rounds. The close after the outage must attribute
    every breach to the driver: in-window-unserved and displaced age-9
    witnesses get the grace WARN (the displaced ones via the
    capacity-displacement cascade, including recorded-rank-2
    module-changed witnesses — the r17 gap), older ones exhaust the
    grace and red the close, and NO witness is misattributed as a
    builder rotation break."""
    clone = str(tmp_path / "clone")
    _clone_repo(clone)

    base = max(
        int(re.search(r"r(\d+)\.json$", p).group(1))
        for p in glob.glob(os.path.join(clone, "CORRECTNESS_r*.json"))
    )
    order_path = os.path.join(clone, "gasket_rs_spark", "registry_order.py")

    for n_round in range(base + 1, base + 5):
        # window the driver was asked = prefix of the CURRENT order
        with open(order_path) as f:
            text = f.read()
        names = re.findall(r"^    '(\w+)',", text, re.M)
        window = names[:50]
        # end-of-round snapshot (code unchanged during the sim round)
        _git(clone, "commit", "--allow-empty", "-q", "-m",
             f"round {n_round}: end-of-round snapshot")
        # the driver hiccup: only the first 10 asked witnesses served
        art = {
            n: {"rows_match": True, "schema_match": True,
                "hash_match": True, "spark_rows": 1, "oracle_rows": 1,
                "err": None}
            for n in window[:10]
        }
        with open(os.path.join(clone, f"CORRECTNESS_r{n_round}.json"),
                  "w") as f:
            json.dump(art, f, indent=1)
        _git(clone, "add", "-A")
        _git(clone, "commit", "-q", "-m",
             f"round {n_round}: verdict/advice/correctness/bench")
        # next round starts with the mechanical fold, as the real repo does
        gen = subprocess.run(
            [sys.executable, os.path.join(clone, "scripts",
                                          "gen_registry_order.py")],
            capture_output=True, text=True, cwd=clone,
        )
        assert gen.returncode == 0, gen.stderr[-2000:]
        _git(clone, "add", "-A")
        _git(clone, "commit", "-q", "-m", f"fold r{n_round}")

    closing = base + 5
    out = _run_in_clone(
        clone,
        "import io, json, contextlib\n"
        "import round_close as rc\n"
        "buf = io.StringIO()\n"
        "with contextlib.redirect_stdout(buf):\n"
        f"    ok = rc.check_evidence_debt({closing})\n"
        "print(buf.getvalue())\n"
        f"asked, served, displaced = rc._prior_window_and_served({closing})\n"
        "import subprocess, gen_registry_order\n"
        f"snap = gen_registry_order._round_snapshot_commits()[{closing - 1}]\n"
        "show = subprocess.run(['git', 'show',\n"
        "    snap + ':gasket_rs_spark/registry_order.py'],\n"
        "    capture_output=True, text=True, cwd=rc.REPO)\n"
        "_, ranks, _ = rc.parse_registry_order_block(show.stdout)\n"
        "print('JSON:', json.dumps({'ok': ok,\n"
        "    'displaced_ranks': sorted({ranks[n] for n in displaced})}))\n",
    )
    verdict_json = json.loads(out.split("JSON:")[1])

    # a 4-round outage legitimately reds the close (grace is one round)…
    assert verdict_json["ok"] is False
    assert "grace (1 round) EXHAUSTED" in out, out
    # …but every breach is attributed to the DRIVER: the cascade grace
    # fires for the displaced age-9 cohort and nothing reads as a
    # builder rotation break
    assert "capacity-displacement cascade for" in out, out
    assert "WARN — DRIVER-fault breach" in out, out
    assert "BUILDER" not in out, out
    # the displaced set produced by the real generator contains
    # recorded-rank-2 (module-changed-while-due) witnesses — the class
    # the r17 rank<=1 rule misattributed
    assert 2 in verdict_json["displaced_ranks"], verdict_json
