"""Cogrouped applyInPandas as-of join must be frame-equal to the JVM
union+window formulation — same at-or-before semantics, same max-click_id
tie-break, same null for no-prior-click purchases."""

from __future__ import annotations

from gasket_rs_spark.functions.udf import q_asof_join_cogrouped
from gasket_rs_spark.operators.relational import q_asof_join


def _frame(df):
    return {
        (r["purchase_id"]): (r["user_id"], r["purchase_sec"], r["click_id"], r["click_sec"])
        for r in df.collect()
    }


def test_cogrouped_asof_matches_jvm(spark, sf_dir):
    got = _frame(q_asof_join_cogrouped(spark, sf_dir))
    want = _frame(q_asof_join(spark, sf_dir))
    assert got == want and got
