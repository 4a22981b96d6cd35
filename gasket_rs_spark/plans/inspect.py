"""Physical-plan inspection helpers — the "explain and iterate" loop as
code, so scale properties (pushdown, pruning, broadcast choice, fusion)
are *asserted in tests* instead of eyeballed once and forgotten.

The reference has no optimizer to inspect (SURVEY §4.1); this module is
how we keep Catalyst honest about the properties the 100 TB design relies
on.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    qe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return qe.explainString(mode)


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def final_adaptive_plan(df: DataFrame) -> str:
    """Plan string AFTER executing under AQE — runtime join-strategy
    switches (e.g. shuffle join -> broadcast once the build side's true
    size is known) only appear in the adaptive final plan, not in the
    static explain."""
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def count_operator(df: DataFrame, operator: str) -> int:
    """Occurrences of a physical operator node (e.g. 'BroadcastHashJoin',
    'SortMergeJoin', 'Exchange') in the plan node list."""
    plan = explain_formatted(df)
    return len(re.findall(rf"\(\d+\) {re.escape(operator)}", plan))


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters pushed into the parquet scans (empty = pushdown failed)."""
    out: list[str] = []
    for line in explain_formatted(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            inner = line.split(":", 1)[1].strip().strip("[]")
            if inner:
                out.extend(p.strip() for p in inner.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema lines from every scan — for asserting column pruning."""
    return [
        line.strip().split(":", 1)[1].strip()
        for line in explain_formatted(df).splitlines()
        if line.strip().startswith("ReadSchema:")
    ]


def scan_column_counts(df: DataFrame) -> list[int]:
    """Number of columns actually read by each scan."""
    counts = []
    for schema in read_schemas(df):
        body = schema.split("struct<", 1)[-1].rstrip(">")
        counts.append(0 if not body else body.count(":"))
    return counts


def assert_broadcasts(df: DataFrame, at_least: int) -> None:
    n = count_operator(df, "BroadcastHashJoin")
    if n < at_least:
        raise AssertionError(
            f"expected >= {at_least} broadcast joins, plan has {n}:\n{explain_formatted(df)}"
        )


def broadcast_hint_count(df: DataFrame) -> int:
    """Number of explicit broadcast join hints surviving in the optimized
    logical plan. This counts what the QUERY forces, independent of what
    the size-based planner or AQE later choose — the right probe for the
    invariant "never force-broadcast an SF-scaled table" (at tiny test SF
    the physical plan auto-broadcasts everything small, so physical
    BroadcastHashJoin counts can't distinguish forced from chosen)."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return len(re.findall(r"strategy=broadcast", plan))


def assert_no_cartesian(df: DataFrame) -> None:
    plan = explain_formatted(df)
    if "CartesianProduct" in plan:
        raise AssertionError(f"plan contains a CartesianProduct:\n{plan}")
