"""Cross-engine pins for the denominator guards (ADVICE r11 + the
round-12 class sweep).

The advisor's finding generalized: several estimators divide by a
data-dependent quantity that is zero on degenerate-but-legal inputs
(all-tied series, single-category table, one-document group, all-failure
A/B split). Unguarded, the division yields Inf/NaN and the subsequent
BIGINT cast DIVERGES between engines (Spark saturates / returns 0 for
NaN; DuckDB raises) — invisible at the three fixture SFs, data-dependent
in production. Every such site now carries greatest(..., 1) identically
on both engines; these tests evaluate the EXACT guarded expression
strings on both engines at the degenerate points and assert equal,
finite results — the divergence test the fixtures can't run.
"""

from __future__ import annotations

import duckdb
import pytest

# (label, engine-portable scalar SQL, expected value)
# Each expression is the operator's guarded denominator spelling
# instantiated at a degenerate point (see the operator docstrings).
CASES = [
    (
        # mann_kendall_trend: 5 days, all counts equal -> s=0 and
        # tie_num = n(n-1)(2n+5) -> variance term 0
        "mann_kendall_all_tied",
        "CAST(floor((CAST(0 AS DOUBLE) - 0.0)"
        " / sqrt(CAST(greatest(5 * (5 - 1) * (2 * 5 + 5) - 300, 1)"
        " AS DOUBLE) / 18.0) * 1e6 + 0.5) AS BIGINT)",
        0,
    ),
    (
        # kendall_tau: every pair tied on x -> (n0-tx)*(n0-ty) = 0
        "kendall_tau_all_tied_x",
        "CAST(floor(CAST(0 - 0 AS DOUBLE)"
        " / sqrt(CAST(greatest((3 - 3) * (3 - 1), 1) AS DOUBLE))"
        " * 1e6 + 0.5) AS BIGINT)",
        0,
    ),
    (
        # cramers_v: single-category row dimension -> least(r-1,c-1) = 0
        # (chi2 is necessarily 0 for a 1xC table)
        "cramers_v_single_category",
        "CAST(floor(sqrt(0.0 / (CAST(30 AS DOUBLE)"
        " * CAST(greatest(least(1 - 1, 3 - 1), 1) AS DOUBLE)))"
        " * 1e6 + 0.5) AS BIGINT)",
        0,
    ),
    (
        # two_proportion_ztest: zero successes in both arms -> pooled
        # variance 0 (numerator is also 0)
        "ztest_all_failures",
        "CAST(floor(CAST(0 * 7 - 0 * 5 AS DOUBLE)"
        " / sqrt(CAST(greatest((0 + 0) * (5 + 7 - 0 - 0), 1) AS DOUBLE)"
        " * CAST(greatest(5 * 7, 1) AS DOUBLE)"
        " / CAST(greatest(5 + 7, 1) AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)",
        0,
    ),
    (
        # spearman: a one-document group -> n^3 - n = 0 (sd2 = 0; the
        # guard makes the trivial group read rho = 1)
        "spearman_single_row_group",
        "CAST(floor((1.0 - 1.5 * CAST(0 AS DOUBLE)"
        " / greatest(CAST(1 AS DOUBLE) * CAST(1 AS DOUBLE)"
        " * CAST(1 AS DOUBLE) - CAST(1 AS DOUBLE), 1.0))"
        " * 1e6 + 0.5) AS BIGINT)",
        1_000_000,
    ),
    (
        # simpson_diversity: single-token source -> n(n-1) = 0; and the
        # all-distinct source -> simpson6 = 0 feeding the second division
        "simpson_single_token",
        "CAST(floor(CAST(0 AS DOUBLE)"
        " / CAST(greatest(1 * (1 - 1), 1) AS DOUBLE) * 1e6 + 0.5)"
        " AS BIGINT)",
        0,
    ),
    (
        "simpson_effective_vocab_all_distinct",
        "CAST(floor(1e12 / CAST(greatest(0, 1) AS DOUBLE) + 0.5) AS BIGINT)",
        1_000_000_000_000,
    ),
    (
        # chao1 (bias-corrected): singletons but no doubletons — defined
        # without any ad-hoc guard: f1(f1-1)/(2(f2+1))
        "chao1_no_doubletons",
        "CAST(floor(CAST(3 * (3 - 1) * 1000000 AS DOUBLE)"
        " / CAST(2 * (0 + 1) AS DOUBLE) + 0.5) AS BIGINT)",
        3_000_000,
    ),
]


@pytest.mark.parametrize("label,expr,expected", CASES, ids=[c[0] for c in CASES])
def test_degenerate_guard_cross_engine(spark, label, expr, expected):
    got_spark = spark.sql(f"SELECT {expr} AS out").collect()[0]["out"]
    got_duck = duckdb.sql(f"SELECT {expr} AS out").fetchone()[0]
    assert got_spark == got_duck == expected, label
