"""Error-bound pins for the two approximate aggregates.

These queries are rows-only at the driver's gate by design (sketch
values are engine-specific), which until now meant "runs" was the only
evidence. These tests turn that into "measurably close": the HLL++
estimate must sit within a multiple of its configured rsd of the exact
distinct count, and each approx percentile must fall between exact
percentiles bracketing its target rank by the sketch's rank-error
budget.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gasket_rs_spark.operators.relational import (
    q_approx_count_distinct,
    q_approx_percentiles,
)
from gasket_rs_spark.tables import load

# q_approx_count_distinct configures rsd=0.02 (2% standard error). 5-sigma
# slack keeps the pin deterministic-tight without flaking on an unlucky
# sketch: relative error must stay under 10%.
_ACD_RSD = 0.02
_ACD_SIGMAS = 5


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    got = {
        r["l_returnflag"]: r["approx_parts"]
        for r in q_approx_count_distinct(spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: r["n"]
        for r in load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for flag, n in exact.items():
        rel_err = abs(got[flag] - n) / n
        assert rel_err <= _ACD_SIGMAS * _ACD_RSD, (flag, got[flag], n, rel_err)


def test_approx_percentiles_within_rank_tolerance(spark, sf_dir):
    """percentile_approx(accuracy=1000) bounds rank error by ~n/accuracy,
    i.e. 0.001 of the distribution. Pin each approx value between the
    exact percentiles ±0.01 around its target rank (10× the sketch
    budget — deterministic headroom, still far tighter than 'runs')."""
    got = {
        r["l_returnflag"]: (r["p50"], r["p95"])
        for r in q_approx_percentiles(spark, sf_dir).collect()
    }
    brackets = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.expr(
                "percentile(l_extendedprice, array(0.49, 0.51, 0.94, 0.96))"
            ).alias("b")
        )
        .collect()
    )
    assert {r["l_returnflag"] for r in brackets} == set(got)
    for r in brackets:
        p50, p95 = got[r["l_returnflag"]]
        lo50, hi50, lo95, hi95 = r["b"]
        assert lo50 <= p50 <= hi50, (r["l_returnflag"], p50, lo50, hi50)
        assert lo95 <= p95 <= hi95, (r["l_returnflag"], p95, lo95, hi95)


def test_exact_count_distinct_plumbing_cross_engine(spark, sf_dir):
    """r15 extension of the VERDICT r14 #5 discipline to the remaining
    thin rows-only witness in this family: the HLL++ estimate stays
    rows-only, but its plumbing — scan, per-returnflag grouping,
    distinct over l_partkey — is checked bit-for-bit against DuckDB on
    the same parquet (exact countDistinct twin, CAST AS BIGINT per the
    HUGEINT canonicalization rule)."""
    import duckdb

    spark_exact = {
        r["l_returnflag"]: r["n"]
        for r in load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    con = duckdb.connect()
    duck_exact = dict(
        con.execute(
            f"""
            SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT)
            FROM read_parquet('{sf_dir}/lineitem.parquet')
            GROUP BY l_returnflag
            """
        ).fetchall()
    )
    assert spark_exact == duck_exact
    # and the rows-only witness rides exactly this grouping
    witness_groups = {
        r["l_returnflag"]
        for r in q_approx_count_distinct(spark, sf_dir).collect()
    }
    assert witness_groups == set(spark_exact)


def test_exact_percentile_plumbing_cross_engine(spark, sf_dir):
    """VERDICT r14 #5: the estimator stays rows-only (sketch values are
    engine-specific), but the PLUMBING it rides — scan, per-returnflag
    grouping, ordering of l_extendedprice, rank selection — gets a
    driver-hash-style EXACT cross-engine check without registry growth.
    Discrete order statistics are value-deterministic even under ties
    (the value at rank k doesn't depend on tie order), and the rank
    arithmetic is pure int64 (ceil(q*n) spelled as (q_num*n + q_num) DIV
    q_den — both engines truncate positive integer division
    identically), so Spark and DuckDB must agree bit-for-bit."""
    import duckdb

    from pyspark.sql import Window

    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    spark_rows = sorted(
        (
            load(spark, sf_dir, "lineitem")
            .select("l_returnflag", "l_extendedprice")
            .withColumn("rn", F.row_number().over(w))
            .withColumn(
                "n", F.count("*").over(Window.partitionBy("l_returnflag"))
            )
            .groupBy("l_returnflag")
            .agg(
                F.max(
                    F.when(
                        F.col("rn") == F.expr("(1*n + 1) DIV 2"),
                        F.col("l_extendedprice"),
                    )
                ).alias("p50_disc"),
                F.max(
                    F.when(
                        F.col("rn") == F.expr("(19*n + 19) DIV 20"),
                        F.col("l_extendedprice"),
                    )
                ).alias("p95_disc"),
            )
            .collect()
        ),
        key=lambda r: r["l_returnflag"],
    )
    con = duckdb.connect()
    duck_rows = con.execute(
        f"""
        WITH ranked AS (
          SELECT l_returnflag, l_extendedprice,
                 row_number() OVER (PARTITION BY l_returnflag
                                    ORDER BY l_extendedprice) AS rn,
                 count(*) OVER (PARTITION BY l_returnflag) AS n
          FROM read_parquet('{sf_dir}/lineitem.parquet')
        )
        SELECT l_returnflag,
               max(CASE WHEN rn = (1*n + 1) // 2 THEN l_extendedprice END)
                   AS p50_disc,
               max(CASE WHEN rn = (19*n + 19) // 20 THEN l_extendedprice END)
                   AS p95_disc
        FROM ranked GROUP BY l_returnflag ORDER BY l_returnflag
        """
    ).fetchall()
    assert [
        (r["l_returnflag"], r["p50_disc"], r["p95_disc"]) for r in spark_rows
    ] == duck_rows
    # and the rows-only witness rides exactly this grouping
    witness_groups = {
        r["l_returnflag"] for r in q_approx_percentiles(spark, sf_dir).collect()
    }
    assert witness_groups == {r["l_returnflag"] for r in spark_rows}
