"""Round-end rotation invariant (VERDICT r6 #2).

With a 134-query catalog and a 50-entry driver check window, a query's
evidence can silently age out. This check fails loudly when the committed
``gasket_rs_spark/registry_order.py`` would let that happen:

1. **Freshness**: regenerating the order from the current tree + committed
   ``CORRECTNESS_r*.json`` history must reproduce the committed ORDER
   exactly. Editing any operator module invalidates its queries' evidence
   (cohort 2 -> 1) and therefore changes the derived order; this rule
   forces ``scripts/gen_registry_order.py`` to be re-run before the
   end-of-round commit.
2. **Window coverage**: no query needing a re-check (rank 0 failed,
   rank 1 evidence-over-age-cap, or rank 2 changed-since-checked /
   never-checked) may sit outside the next window's 50-prefix while a
   fresh green-and-unchanged (rank 3) query occupies a prefix slot. When
   more than 50 queries need re-checks, the prefix must be the 50
   *highest-priority* ones, ordered by ``gen_registry_order.order_key``:
   rank, then (within rank 2) oracle-upgraded entries first — a witness
   whose last driver check was rows-only but which now registers an
   oracle fronts automatically — then oldest-checked.

Run: ``python scripts/check_rotation.py`` — exit 0 = invariant holds.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

WINDOW = 50


def check() -> list[str]:
    """Return a list of violation messages (empty = invariant holds).

    Self-healing rule (VERDICT r7 #2): the committed order is judged
    against the correctness rounds it *records* it was generated from
    (``registry_order.ROUNDS``), not against whatever artifacts happen to
    be on disk. A driver dropping a new ``CORRECTNESS_r{N}.json`` at round
    end therefore cannot fail the suite by itself — the new round is noted
    and folded in at the next regen. What still fails: editing an operator
    module after the last regen (evidence invalidated, derived order
    shifts) or hand-editing the generated file.
    """
    import gasket_rs_spark.registry_order as ro
    from gen_registry_order import available_rounds, compute_order

    ORDER = ro.ORDER
    # Orders generated before the ROUNDS stamp existed reproduce from all
    # artifacts on disk (the old behavior).
    recorded = getattr(ro, "ROUNDS", None)
    order_now, meta = compute_order(
        set(recorded) if recorded is not None else None
    )
    committed = list(ORDER)
    problems: list[str] = []

    newer = [r for r in available_rounds()
             if recorded is not None and r not in recorded]
    if newer:
        print(
            f"note: correctness artifacts for rounds {newer} postdate the "
            "committed order; they will be folded in at the next "
            "scripts/gen_registry_order.py run (not a violation)"
        )

    if committed != order_now:
        extra = [n for n in committed if n not in meta]
        missing = [n for n in order_now if n not in committed]
        moved = sum(1 for a, b in zip(committed, order_now) if a != b)
        problems.append(
            "registry_order.py is stale — rerun scripts/gen_registry_order.py "
            f"({moved} positions differ; missing from committed: {missing[:5]}; "
            f"no longer in catalog: {extra[:5]})"
        )

    # Window coverage is judged on the *current* derived order (what the
    # driver will actually walk once the regenerated file is committed).
    prefix = set(order_now[:WINDOW])
    stale = [n for n in order_now if meta[n][0] < 3]
    outside = [n for n in stale if n not in prefix]
    if outside:
        green_inside = [n for n in order_now[:WINDOW] if meta[n][0] == 3]
        if green_inside:
            problems.append(
                f"{len(outside)} stale-evidence queries sit outside the "
                f"{WINDOW}-prefix while green-unchanged queries occupy "
                f"prefix slots: {green_inside[:5]}"
            )
        else:
            # >WINDOW stale queries: prefix must be the highest-priority
            # cohort under the generator's own key (rank, oracle-upgraded
            # within rank 2, oldest-checked, name) — shared via order_key
            # so this check can never drift from the actual ordering.
            from gen_registry_order import order_key

            oldest = sorted(stale, key=lambda n: order_key(meta[n], n))
            want = set(oldest[:WINDOW])
            if prefix != want:
                problems.append(
                    f"{WINDOW}-prefix is not the oldest-checked stale cohort: "
                    f"unexpected {sorted(prefix - want)[:5]}, "
                    f"displaced {sorted(want - prefix)[:5]}"
                )
    return problems


def main() -> None:
    problems = check()
    if problems:
        for p in problems:
            print(f"ROTATION VIOLATION: {p}")
        sys.exit(1)
    print(f"rotation invariant holds (window={WINDOW})")


if __name__ == "__main__":
    main()
