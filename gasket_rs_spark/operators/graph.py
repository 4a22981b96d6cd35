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

from pyspark.sql import DataFrame, SparkSession, Window
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


_TRI_EDGE_Q = 0.9  # edge = co-purchase pair in the top decile of strength


def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient of the STRONG
    supplier co-purchase graph — edges are the top-decile pairs by
    shared-order count (a data-derived p90 threshold: a fixed count
    degenerates with corpus density — measured, co ≥ 2 yields a complete
    clique at sf ≤ 0.01 and coefficient ≡ 1.0). The standard
    node-iterator/ordered-adjacency formulation: edges stored once as
    (a < b), triangles counted by the two-hop join e1(a,b) ⋈ e2(b,c) ⋈
    e3(a,c) with a < b < c — each triangle generated exactly once, no
    dedup/division pass, join fan per edge bounded by node degree (at
    100 TB the degeneracy-ordered variant of this exact plan is the
    published MapReduce algorithm). Edge generation reuses the
    market-basket shape: keyed on the ORDER, linear in orders, never
    suppliers².

    The p90 threshold comes from the CO-COUNT HISTOGRAM (distinct
    shared-order counts — bounded by max basket statistics, ~hundreds of
    rows), cumulated with a single-partition window over that bounded
    frame (the Heaps-curve pattern) — never a global sort of the pairs.

    Output: one row — n_edges, n_wedges, n_triangles, clustering
    coefficient 3·triangles/wedges snapped at 6dp. EXACT oracle
    (identical SQL)."""
    d = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    a = d.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s1"))
    b = d.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s2"))
    co = (
        a.join(b, "ok")
        .where(F.col("s1") < F.col("s2"))
        .groupBy(F.col("s1").alias("ea"), F.col("s2").alias("eb"))
        .agg(F.count("*").alias("co"))
        # co feeds TWO consumers (histogram, edge filter) and its derived
        # edges frame feeds FIVE more — without lineage truncation the
        # basket self-join (the dominant shuffle) re-executed per branch.
        # Round-10 interleaved A/B (scripts/ab_triangles_r10.py, load 0.12):
        # shipped r9 shape min 4.10 s / med 5.09 s → this shape min 3.19 s /
        # med 3.43 s at sf0.1, identical output. Same storage rule as
        # pagerank/dedup: share multi-consumer frames via
        # localCheckpoint(eager=True), keep single-consumer plans lazy.
        .localCheckpoint(eager=True)
    )
    hist = co.groupBy("co").agg(F.count("*").alias("cnt"))
    # n_pairs as a 1-row broadcast agg (not a second full-frame window):
    # one window pass over the bounded histogram is all the sort we need.
    n_pairs = hist.agg(F.sum("cnt").alias("n_pairs"))
    # single-partition window over the bounded co histogram (<= distinct
    # shared-order counts) — the Heaps-curve bounded-window pattern
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
        # the small post-p90 decile, consumed by deg/e1/e2/e3/n_edges —
        # cheap to materialize, saves 5 re-filters of co.
        .localCheckpoint(eager=True)
    )
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


_TRI_ORACLE = f"""
    WITH d AS (
        SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s FROM lineitem
    ), co AS (
        SELECT a.s AS ea, b.s AS eb, count(*) AS co
        FROM d a JOIN d b ON a.ok = b.ok AND a.s < b.s
        GROUP BY 1, 2
    ), hist AS (
        SELECT co, count(*) AS cnt FROM co GROUP BY co
    ), cum AS (
        SELECT co,
               sum(cnt) OVER (ORDER BY co
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum,
               sum(cnt) OVER () AS n_pairs
        FROM hist
    ), thr AS (
        SELECT min(co) AS thr FROM cum
        WHERE cum >= ceil({_TRI_EDGE_Q} * n_pairs)
    ), edges AS (
        SELECT ea, eb FROM co, thr WHERE co.co >= thr.thr
    ), deg AS (
        SELECT node, count(*) AS deg FROM (
            SELECT ea AS node FROM edges
            UNION ALL SELECT eb FROM edges
        ) GROUP BY node
    ), w AS (
        SELECT CAST(sum(deg * (deg - 1) / 2) AS BIGINT) AS n_wedges FROM deg
    ), tri AS (
        SELECT CAST(count(*) AS BIGINT) AS n_triangles
        FROM edges e1
        JOIN edges e2 ON e2.ea = e1.eb
        JOIN edges e3 ON e3.ea = e1.ea AND e3.eb = e2.eb
    ), ne AS (
        SELECT CAST(count(*) AS BIGINT) AS n_edges FROM edges
    )
    SELECT n_edges, n_wedges, n_triangles,
           CASE WHEN n_wedges > 0
                THEN floor(3.0 * n_triangles / n_wedges * 1e6 + 0.5) / 1e6
                ELSE 0.0 END AS clustering_coeff
    FROM ne, w, tri
"""


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
    "graph_triangles": _TRI_ORACLE,
}
