"""PageRank pins (operators/graph.py): exact agreement with a pure-
Python reference on a hand-built graph (including dangling nodes), mass
conservation, and convergence direction on the witness graph. The EXACT
cross-engine value check lives in the `graph_pagerank` oracle twin.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gasket_rs_spark.operators.graph import _PR_D, _PR_SNAP, pagerank, q_graph_pagerank


def _reference_pagerank(nodes, edges, iters):
    """Pure-Python twin of operators.graph.pagerank (same snapping)."""
    n = float(len(nodes))
    outdeg: dict[int, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    pr = {v: round(1.0 / n, _PR_SNAP) for v in nodes}
    for _ in range(iters):
        contrib = {v: 0.0 for v in nodes}
        for s, d in edges:
            contrib[d] += pr[s] / outdeg[s]
        dmass = sum(pr[v] for v in nodes if v not in outdeg)
        pr = {
            v: round((1 - _PR_D) / n + _PR_D * (contrib[v] + dmass / n), _PR_SNAP)
            for v in nodes
        }
    return pr


def test_pagerank_matches_reference_with_dangling(spark):
    # 1 -> 2, 1 -> 3, 2 -> 3, 4 isolated (dangling), 3 dangling (no out)
    nodes = [1, 2, 3, 4]
    edges = [(1, 2), (1, 3), (2, 3)]
    nodes_df = spark.createDataFrame([(v,) for v in nodes], "node long")
    edges_df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.pr for r in pagerank(nodes_df, edges_df, iters=5).collect()}
    want = _reference_pagerank(nodes, edges, 5)
    assert got == want


def test_pagerank_mass_conserved(spark):
    nodes = list(range(10))
    edges = [(i, (i * 3 + 1) % 10) for i in range(7)]
    nodes_df = spark.createDataFrame([(v,) for v in nodes], "node long")
    edges_df = spark.createDataFrame(edges, "src long, dst long")
    total = pagerank(nodes_df, edges_df, iters=5).agg(F.sum("pr")).collect()[0][0]
    # damped PR with dangling redistribution conserves total mass
    # (up to the per-iteration 12dp snap: <= N * 5e-13 per iteration)
    assert abs(total - 1.0) < 1e-9


def test_pagerank_witness_orders_high_degree_suppliers_first(spark, sf_dir):
    rows = q_graph_pagerank(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    prs = [r.pagerank for r in rows]
    assert prs == sorted(prs, reverse=True)
    assert all(p > 0 for p in prs)


def test_kcore_peel_separates_clique_from_tail(spark):
    # K4 on {1,2,3,4} (each deg 3) + tail 4-5-6 (deg 1-2). With k=3 the
    # tail peels over two rounds and the clique is the stable 3-core.
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges_df = spark.createDataFrame(k4 + [(4, 5), (5, 6)], "a long, b long")
    kf = spark.createDataFrame([(3,)], "k long")
    from gasket_rs_spark.operators.graph import kcore_peel

    traj = {r.iter: (r.n_nodes, r.n_edges) for r in kcore_peel(edges_df, kf, 3).collect()}
    # round 1: node 6 (deg 1) and 5 (deg 2) drop -> K4 + nothing else
    assert traj[1] == (4, 6)
    # stable thereafter: the true 3-core
    assert traj[2] == (4, 6)
    assert traj[3] == (4, 6)


def test_kcore_witness_trajectory_monotone(spark, sf_dir):
    from gasket_rs_spark.operators.graph import q_graph_kcore

    rows = sorted(q_graph_kcore(spark, sf_dir).collect(), key=lambda r: r.iter)
    assert [r.iter for r in rows] == [1, 2, 3, 4, 5]
    nodes = [r.n_nodes for r in rows]
    edges = [r.n_edges for r in rows]
    # peeling only removes: both series weakly decreasing, never negative
    assert nodes == sorted(nodes, reverse=True) and nodes[-1] >= 0
    assert edges == sorted(edges, reverse=True) and edges[-1] >= 0


def test_link_prediction_scores_are_valid_jaccards(spark, sf_dir):
    from gasket_rs_spark.operators.graph import q_link_prediction

    rows = q_link_prediction(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    js = [r.jaccard6 for r in rows]
    assert js == sorted(js, reverse=True)
    for r in rows:
        assert r.cust_a < r.cust_b
        assert r.cn >= 1
        assert 0 < r.jaccard6 <= 1_000_000


def _py_sync_lpa(edges, iters):
    """Independent pure-Python synchronous LPA (mode label, ties to the
    smallest label) — the reference the Spark loop must reproduce."""
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    lab = {v: v for v in adj}
    for _ in range(iters):
        new = {}
        for v, nbrs in adj.items():
            cnt = defaultdict(int)
            for u in nbrs:
                cnt[lab[u]] += 1
            new[v] = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        lab = new
    return lab


def test_label_propagation_matches_python_fixpoint(spark):
    from gasket_rs_spark.operators.graph import propagate_labels

    # two triangles joined by a bridge + a pendant node
    edges = [(10, 11), (11, 12), (10, 12), (20, 21), (21, 22), (20, 22), (12, 20), (22, 30)]
    df = spark.createDataFrame(edges, "src: bigint, dst: bigint")
    for iters in (1, 2, 3):
        got = {r.node: r.label for r in propagate_labels(df, iters).collect()}
        assert got == _py_sync_lpa(edges, iters), f"iters={iters}"


def test_label_propagation_communities_shape(spark, sf_dir):
    from gasket_rs_spark.operators.graph import q_label_propagation

    rows = q_label_propagation(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    sizes = [r.n_members for r in rows]
    assert sizes == sorted(sizes, reverse=True)
    assert len({r.community for r in rows}) == len(rows)
    for r in rows:
        assert r.n_members >= 1
        # member ids are the 2k / 2k+1 node encoding: the checksum of
        # n_members ids is at least the smallest n_members ids' sum
        assert r.member_sum >= r.n_members


def test_degree_assortativity_matches_python_pearson(spark, sf_dir):
    """Independent reference: build the same symmetrized graph in
    Python and compute the Pearson correlation of endpoint degrees."""
    from collections import Counter

    from gasket_rs_spark.operators.graph import q_degree_assortativity
    from gasket_rs_spark.tables import load

    row = q_degree_assortativity(spark, sf_dir).collect()
    assert len(row) == 1
    r = row[0]
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    pairs = {
        (x.src, x.dst)
        for x in orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .selectExpr("o_custkey * 2 AS src", "l_suppkey * 2 + 1 AS dst")
        .collect()
    }
    directed = list(pairs) + [(b, a) for a, b in pairs]
    deg = Counter(a for a, _ in directed)
    m = len(directed)
    sx = sum(deg[a] for a, _ in directed)
    sxx = sum(deg[a] ** 2 for a, _ in directed)
    sxy = sum(deg[a] * deg[b] for a, b in directed)
    assert (r.m, r.sx, r.sxx, r.sxy) == (m, sx, sxx, sxy)
    import math

    expected6 = int(math.floor((m * sxy - sx * sx) / (m * sxx - sx * sx) * 1e6 + 0.5))
    assert r.assort6 == expected6
    assert -1_000_000 <= r.assort6 <= 1_000_000


def test_hits_scores_invariants_and_python_reference(spark, sf_dir):
    from collections import defaultdict

    from gasket_rs_spark.operators.graph import _HITS_ITERS, q_hits_scores
    from gasket_rs_spark.tables import load

    rows = q_hits_scores(spark, sf_dir).collect()
    hubs = [r for r in rows if r.side == "hub"]
    auths = [r for r in rows if r.side == "auth"]
    assert len(hubs) == 10 and len(auths) == 10
    for group in (hubs, auths):
        scores = [r.score6 for r in group]
        assert scores == sorted(scores, reverse=True)
        assert scores[0] == 1_000_000  # max-normalized: the top node is 1.0
        assert all(0 < s <= 1_000_000 for s in scores)
    # independent integer HITS in pure Python
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    edges = {
        (x.cust, x.supp)
        for x in orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .selectExpr("o_custkey AS cust", "l_suppkey AS supp")
        .collect()
    }
    a = {s: 1_000_000 for _, s in edges}
    h = {}
    for _ in range(_HITS_ITERS):
        hraw = defaultdict(int)
        for c, s in edges:
            hraw[c] += a[s]
        mx = max(hraw.values())
        h = {c: v * 1_000_000 // mx for c, v in hraw.items()}
        araw = defaultdict(int)
        for c, s in edges:
            araw[s] += h[c]
        mx = max(araw.values())
        a = {s: v * 1_000_000 // mx for s, v in araw.items()}
    exp_h = sorted(h.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    exp_a = sorted(a.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r.node, r.score6) for r in hubs] == exp_h
    assert [(r.node, r.score6) for r in auths] == exp_a
