"""Round-10 A/B: graph_triangles shared-frame checkpointing (VERDICT r9 #1/#8).

Variant A = round-9 shipped shape (no lineage sharing: the co-pair
groupBy re-executes for ~6 consumers).
Variant B = co localCheckpoint(eager) after the groupBy + edges
localCheckpoint(eager) after the p90 filter + n_pairs folded into a
1-row broadcast agg instead of a second full-frame window.

Interleaved A/B/A/B in one session at sf0.1 (the round-9 forensics
protocol — run at round start while load is ~0). Results land in
SCALE.md §Round-10.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from gasket_rs_spark.session import get_session
from gasket_rs_spark.tables import load

_TRI_EDGE_Q = 0.9
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _co(spark: SparkSession) -> "F.DataFrame":
    d = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_suppkey").distinct()
    a = d.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s1"))
    b = d.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s2"))
    return (
        a.join(b, "ok")
        .where(F.col("s1") < F.col("s2"))
        .groupBy(F.col("s1").alias("ea"), F.col("s2").alias("eb"))
        .agg(F.count("*").alias("co"))
    )


def _finish(co, edges):
    deg = (
        edges.select(F.col("ea").alias("node"))
        .unionByName(edges.select(F.col("eb").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    wedges = deg.agg(
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2).cast("bigint").alias("n_wedges")
    )
    e1 = edges.select(F.col("ea").alias("a"), F.col("eb").alias("b"))
    e2 = edges.select(F.col("ea").alias("b"), F.col("eb").alias("c"))
    e3 = edges.select(F.col("ea").alias("a"), F.col("eb").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"]).agg(
        F.count("*").cast("bigint").alias("n_triangles")
    )
    n_edges = edges.agg(F.count("*").cast("bigint").alias("n_edges"))
    return (
        n_edges.crossJoin(F.broadcast(wedges))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.when(
                F.col("n_wedges") > 0,
                F.floor(
                    3.0 * F.col("n_triangles") / F.col("n_wedges") * 1e6 + F.lit(0.5)
                )
                / 1e6,
            )
            .otherwise(F.lit(0.0))
            .alias("clustering_coeff"),
        )
    )


def variant_a(spark: SparkSession):
    co = _co(spark)
    hist = co.groupBy("co").agg(F.count("*").alias("cnt"))
    w = (
        Window.partitionBy(F.lit(1))
        .orderBy("co")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.select(
        "co",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(
            Window.partitionBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n_pairs"),
    )
    thr = cum.where(
        F.col("cum") >= F.ceil(F.lit(_TRI_EDGE_Q) * F.col("n_pairs"))
    ).agg(F.min("co").alias("thr"))
    edges = (
        co.crossJoin(F.broadcast(thr))
        .where(F.col("co") >= F.col("thr"))
        .select("ea", "eb")
    )
    return _finish(co, edges)


def variant_b(spark: SparkSession):
    co = _co(spark).localCheckpoint(eager=True)
    hist = co.groupBy("co").agg(F.count("*").alias("cnt"))
    n_pairs = hist.agg(F.sum("cnt").alias("n_pairs"))
    w = (
        Window.partitionBy(F.lit(1))
        .orderBy("co")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.select("co", F.sum("cnt").over(w).alias("cum")).crossJoin(
        F.broadcast(n_pairs)
    )
    thr = cum.where(
        F.col("cum") >= F.ceil(F.lit(_TRI_EDGE_Q) * F.col("n_pairs"))
    ).agg(F.min("co").alias("thr"))
    edges = (
        co.crossJoin(F.broadcast(thr))
        .where(F.col("co") >= F.col("thr"))
        .select("ea", "eb")
        .localCheckpoint(eager=True)
    )
    return _finish(co, edges)


def main() -> None:
    spark = get_session("ab-triangles-r10")
    # warm
    variant_a(spark).collect()
    rows = {}
    times = {"A": [], "B": []}
    for _ in range(3):
        for name, fn in (("A", variant_a), ("B", variant_b)):
            t0 = time.perf_counter()
            rows[name] = fn(spark).collect()
            times[name].append(round(time.perf_counter() - t0, 3))
    print("rows equal:", rows["A"] == rows["B"], rows["A"])
    print("A (r9 shipped):", times["A"], "min", min(times["A"]))
    print("B (checkpointed):", times["B"], "min", min(times["B"]))
    spark.stop()


if __name__ == "__main__":
    main()
