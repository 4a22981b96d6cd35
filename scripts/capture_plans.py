"""Capture .explain('formatted') for the headline queries into
plans/r<N>/ where N = the upcoming round (max committed CORRECTNESS
round + 1, same derivation as bench.py's close-detail name).

Usage: python scripts/capture_plans.py before|after [--full] [query ...]

Writes plans/r<N>/<query>_<tag>.txt for each headline query (or the
named subset). Plans are captured at $SPARK_GRAFT_SF_DIR (default
sf0.1) — the same data the bench times — so Exchange counts / join
strategies / pushed filters in the files match the bench's plan shapes.

--full additionally writes <query>_<tag>_full.txt with
DataFrame.localCheckpoint bypassed (identity): a checkpoint truncates
the visible plan at a Scan ExistingRDD, hiding the whole subtree below
it from plan evidence (VERDICT r21 #4) — the _full dump shows the plan
the checkpointed children would execute, so scan counts / join
strategies BELOW a checkpoint stay auditable. Capture-script-only
monkeypatch; operators are untouched.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    args = sys.argv[2:]
    full = "--full" in args
    names = [a for a in args if a != "--full"] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from gen_registry_order import available_rounds

    rnd = max(available_rounds()) + 1
    out_dir = os.path.join(repo, "plans", f"r{rnd}")
    os.makedirs(out_dir, exist_ok=True)

    from gasket_rs_spark.registry import all_queries
    from gasket_rs_spark.session import get_session

    spark = get_session("gasket-plans")
    queries = all_queries()

    def capture(name: str, suffix: str) -> None:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{tag}{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{tag}{suffix}.txt ({len(plan)} chars)")

    for name in names:
        capture(name, "")
    if full:
        # patch the CONCRETE class (Spark 4: pyspark.sql.classic.dataframe
        # .DataFrame overrides the pyspark.sql.DataFrame base's method, so
        # patching the base is a silent no-op)
        cls = type(spark.range(1))
        orig = cls.localCheckpoint
        cls.localCheckpoint = lambda self, eager=True: self  # type: ignore[method-assign]
        try:
            for name in names:
                capture(name, "_full")
        finally:
            cls.localCheckpoint = orig  # type: ignore[method-assign]
    spark.stop()


if __name__ == "__main__":
    main()
