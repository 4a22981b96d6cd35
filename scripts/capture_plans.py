"""Capture .explain('formatted') for the headline queries into plans/r21/.

Usage: python scripts/capture_plans.py before|after [query ...]

Writes plans/r21/<query>_<tag>.txt for each headline query (or the named
subset). Plans are captured at $SPARK_GRAFT_SF_DIR (default sf0.1) — the
same data the bench times — so Exchange counts / join strategies / pushed
filters in the files match the bench's plan shapes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, "plans", "r21")
    os.makedirs(out_dir, exist_ok=True)

    from gasket_rs_spark.registry import all_queries
    from gasket_rs_spark.session import get_session

    spark = get_session("gasket-plans")
    queries = all_queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{tag}.txt ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
