"""Iterative graph analytics: PageRank over the customer→supplier
purchase graph — the join-per-iteration pattern every distributed graph
algorithm (label propagation, SSSP, embedding propagation) reduces to.
Complements the connected-components operator in dedup.py (which
iterates to convergence on boolean labels) with a FLOAT-valued fixed
iteration count, dangling-mass redistribution, and an EXACT oracle.

Determinism: each iteration's ranks are snapped to a 12-decimal grid on
both engines, so cross-engine float-summation order differences (~1e-19
absolute here) can never survive an iteration boundary — the same
snap-before-compare discipline as tpch_q8/q17. Output rounds to 9dp.

Scale notes (100 TB): edge extraction is one distinct over the
fact-join (shuffle on the pair); each iteration is one equi-join
(edges ⋈ ranks on src, shuffle on node id) + a groupBy(dst) with
map-side partial sums, plus a 1-row dangling aggregate cross-joined
back (broadcast). A production run would persist each iteration's
ranks and localCheckpoint every few rounds to truncate lineage; with a
fixed 5 iterations the plan stays shallow enough without. Skewed
in-degree (celebrity nodes) is AQE skew-split territory — the groupBy
is a sum, so salting composes if needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gasket_rs_spark.tables import load

_PR_D = 0.85
_PR_ITERS = 5
_PR_SNAP = 12
_PR_TOPK = 20


def pagerank(nodes: DataFrame, edges: DataFrame, iters: int = _PR_ITERS) -> DataFrame:
    """PageRank over ``nodes(node)`` / ``edges(src, dst)``.

    Standard damped formulation with dangling-node redistribution:
    pr'(v) = (1-d)/N + d·(Σ_{u→v} pr(u)/outdeg(u) + dangling_mass/N),
    snapped to the 12dp grid each iteration. Returns (node, pr).
    """
    n_frame = nodes.agg(F.count("*").cast("double").alias("nn"))
    # deg + edges_deg are re-read every iteration and ranks is consumed by
    # TWO branches per iteration (contrib join + dangling anti-join) and
    # rebuilt — without lineage truncation the plan re-runs the edge
    # extraction O(iters) times and the rank lineage O(3^iters) times
    # (measured 25s -> ~3s at sf0.01). Same localCheckpoint(eager) pattern
    # as dedup._lsh_candidates.
    deg = (
        edges.groupBy("src")
        .agg(F.count("*").cast("double").alias("outdeg"))
        .localCheckpoint(eager=True)
    )
    edges_deg = edges.join(deg, "src").localCheckpoint(eager=True)
    ranks = nodes.crossJoin(F.broadcast(n_frame)).select(
        "node", "nn", F.round(F.lit(1.0) / F.col("nn"), _PR_SNAP).alias("pr")
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        contrib = (
            edges_deg.join(ranks.select("node", "pr"), edges_deg.src == F.col("node"))
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("outdeg")).alias("contrib"))
        )
        dangling = (
            ranks.join(deg, ranks.node == deg.src, "left_anti")
            .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dmass"))
        )
        ranks = (
            ranks.select("node", "nn")
            .join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "nn",
                F.round(
                    F.lit((1.0 - _PR_D)) / F.col("nn")
                    + F.lit(_PR_D)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("dmass") / F.col("nn")
                    ),
                    _PR_SNAP,
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", "pr")


def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 suppliers by PageRank on the purchase graph.

    Nodes: every customer (2k) and supplier (2k+1); directed edges
    customer→supplier for each distinct (o_custkey, l_suppkey) pair in
    the order history. Suppliers have no out-edges, so ~6% of the mass
    is dangling every iteration — the witness exercises the
    redistribution term, not just the sparse matvec.
    """
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    edges = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    nodes = customer.select((F.col("c_custkey") * 2).alias("node")).unionByName(
        supplier.select((F.col("s_suppkey") * 2 + 1).alias("node"))
    )
    ranks = pagerank(nodes, edges)
    return (
        ranks.where(F.col("node") % 2 == 1)
        .select(
            ((F.col("node") - 1) / 2).cast("bigint").alias("s_suppkey"),
            F.round("pr", 9).alias("pagerank"),
        )
        .orderBy(F.col("pagerank").desc(), "s_suppkey")
        .limit(_PR_TOPK)
    )


def _pr_oracle() -> str:
    body = [
        """
        WITH edges AS (
            SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        ), nodes AS (
            SELECT c_custkey * 2 AS node FROM customer
            UNION ALL
            SELECT s_suppkey * 2 + 1 AS node FROM supplier
        ), nn AS (
            SELECT CAST(count(*) AS DOUBLE) AS nn FROM nodes
        ), deg AS (
            SELECT src, CAST(count(*) AS DOUBLE) AS outdeg FROM edges GROUP BY src
        ), rk0 AS (
            SELECT n.node, round(1.0 / nn.nn, 12) AS pr FROM nodes n CROSS JOIN nn
        )"""
    ]
    for i in range(_PR_ITERS):
        body.append(
            f""", c{i} AS (
            SELECT e.dst AS node, sum(r.pr / d.outdeg) AS contrib
            FROM edges e
            JOIN deg d ON d.src = e.src
            JOIN rk{i} r ON r.node = e.src
            GROUP BY e.dst
        ), g{i} AS (
            SELECT coalesce(sum(r.pr), 0) AS dmass
            FROM rk{i} r LEFT JOIN deg d ON d.src = r.node
            WHERE d.src IS NULL
        ), rk{i + 1} AS (
            SELECT n.node,
                   round((1 - {_PR_D}) / nn.nn
                         + {_PR_D} * (coalesce(c.contrib, 0) + g{i}.dmass / nn.nn),
                         {_PR_SNAP}) AS pr
            FROM nodes n
            CROSS JOIN nn
            CROSS JOIN g{i}
            LEFT JOIN c{i} c ON c.node = n.node
        )"""
        )
    body.append(
        f"""
        SELECT CAST((node - 1) / 2 AS BIGINT) AS s_suppkey,
               round(pr, 9) AS pagerank
        FROM rk{_PR_ITERS}
        WHERE node % 2 = 1
        ORDER BY pagerank DESC, s_suppkey
        LIMIT {_PR_TOPK}"""
    )
    return "".join(body)


ORACLES: dict[str, str] = {
    "graph_pagerank": _pr_oracle(),
}
