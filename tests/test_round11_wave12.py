"""Property pins for the round-11 wave-12 operators (DBSCAN, correlated
scalar subquery, UCB1 bandit, inter-arrival percentiles)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq


def test_dbscan_invariants_and_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.similarity import (
        _DBSCAN_EPS6,
        _DBSCAN_MINPTS,
        q_dbscan_clusters,
    )

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    keep = [i for i, v in enumerate(t["vec_id"].to_pylist()) if v % 3 == 0]
    ids = [t["vec_id"].to_pylist()[i] for i in keep]
    vecs = [[float(x) for x in t["embedding"].to_pylist()[i]] for i in keep]

    def fold_sq(v):
        acc = 0.0
        for x in v:
            acc = acc + x * x
        return acc

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    sq = [fold_sq(v) for v in vecs]
    n = len(ids)
    adj = defaultdict(set)
    for i in range(n):
        for j in range(i + 1, n):
            d6 = math.floor((sq[i] + sq[j] - 2 * fold_dot(vecs[i], vecs[j])) * 1e6 + 0.5)
            if d6 <= _DBSCAN_EPS6:
                adj[ids[i]].add(ids[j])
                adj[ids[j]].add(ids[i])
    core = {v for v in ids if len(adj[v]) >= _DBSCAN_MINPTS}
    # min-label components over core-core edges
    label = {v: v for v in core}
    changed = True
    while changed:
        changed = False
        for v in core:
            for u in adj[v]:
                if u in core and label[u] < label[v]:
                    label[v] = label[u]
                    changed = True
    want = {}
    for v in ids:
        if v in core:
            want[v] = ("core", label[v])
        else:
            cl = [label[u] for u in adj[v] if u in core]
            want[v] = ("border", min(cl)) if cl else ("noise", None)
    got = {
        r["vec_id"]: (r["role"], r["cluster"])
        for r in q_dbscan_clusters(spark, sf_dir).collect()
    }
    assert got == want
    # structural invariants: every cluster label is a core member of itself
    clusters = {c for role, c in got.values() if role == "core"}
    assert all(got[c][0] == "core" and got[c][1] == c for c in clusters)


def test_scalar_subquery_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.relational import q_scalar_subquery

    o = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    c = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    seg = dict(zip(c["c_custkey"].to_pylist(), c["c_mktsegment"].to_pylist()))
    cents = defaultdict(list)
    for ck, tp in zip(o["o_custkey"].to_pylist(), o["o_totalprice"].to_pylist()):
        cents[ck].append(math.floor(tp * 100 + 0.5))
    above = Counter()
    for ck, cs in cents.items():
        s, k = sum(cs), len(cs)
        for v in cs:
            if v * k > s:
                above[seg[ck]] += 1
    idle = Counter(seg[ck] for ck in seg if ck not in cents)
    n_cust = Counter(seg.values())
    got = {
        r["segment"]: (r["n_customers"], r["n_above_avg"], r["n_idle"])
        for r in q_scalar_subquery(spark, sf_dir).collect()
    }
    assert got == {s: (n_cust[s], above[s], idle[s]) for s in n_cust}


def test_ucb1_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.analytics import _UCB_QUALITY_CHARS, q_ucb1_bandit

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["source", "n_chars"])
    n = Counter()
    succ = Counter()
    for s, nc in zip(t["source"].to_pylist(), t["n_chars"].to_pylist()):
        n[s] += 1
        succ[s] += 1 if nc >= _UCB_QUALITY_CHARS else 0
    big_n = sum(n.values())
    ln6 = math.floor(math.log(big_n) * 1e6 + 0.5)
    want = {}
    for s in n:
        mean6 = succ[s] * 1_000_000 // n[s]
        bonus6 = math.floor(math.sqrt(2 * ln6 / (n[s] * 1_000_000)) * 1e6 + 0.5)
        want[s] = (n[s], succ[s], mean6, bonus6, mean6 + bonus6)
    got = {
        r["source"]: (r["n"], r["successes"], r["mean6"], r["bonus6"], r["ucb6"])
        for r in q_ucb1_bandit(spark, sf_dir).collect()
    }
    assert got == want
    # exploration bonus strictly shrinks with pulls (for equal big_n)
    rows = sorted(want.values())
    assert all(b > 0 for _, _, _, b, _ in rows)


def test_interarrival_percentiles_match_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.analytics import (
        _LAT_PCTS,
        q_interarrival_percentiles,
    )

    t = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_type", "event_id", "ts"]
    )
    per = defaultdict(list)
    for et, eid, ts in zip(
        t["event_type"].to_pylist(), t["event_id"].to_pylist(), t["ts"].to_pylist()
    ):
        per[et].append((math.floor(ts.timestamp()), eid))
    want = {}
    for et, rows in per.items():
        rows.sort()
        gaps = sorted(b[0] - a[0] for a, b in zip(rows, rows[1:]))
        m = len(gaps)
        want[et] = tuple(gaps[(m * p + 99) // 100 - 1] for p in _LAT_PCTS)
        want[et] = (m,) + want[et]
    got = {
        r["event_type"]: (r["n_gaps"], r["p50_sec"], r["p95_sec"], r["p99_sec"])
        for r in q_interarrival_percentiles(spark, sf_dir).collect()
    }
    assert got == want
