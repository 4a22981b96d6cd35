"""Property pins for the round-11 wave-18 operators (silhouette score,
consistent-hash ring, two-proportion z-test)."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import pyarrow.parquet as pq


def test_silhouette_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.similarity import _SIL_MOD, q_silhouette_score

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label", "embedding"]
    )
    rows = [
        (v, l, [float(x) for x in e])
        for v, l, e in zip(
            t["vec_id"].to_pylist(), t["label"].to_pylist(), t["embedding"].to_pylist()
        )
        if v % _SIL_MOD == 0
    ]

    def fold(a, b=None):
        acc = 0.0
        if b is None:
            for x in a:
                acc = acc + x * x
        else:
            for x, y in zip(a, b):
                acc = acc + x * y
        return acc

    sq = [fold(v) for _, _, v in rows]
    per_point = []
    for i, (vi, li, v) in enumerate(rows):
        sums = defaultdict(lambda: [0, 0])
        for j, (vj, lj, u) in enumerate(rows):
            if i == j:
                continue
            d6 = math.floor((sq[i] + sq[j] - 2 * fold(v, u)) * 1e6 + 0.5)
            sums[lj][0] += d6
            sums[lj][1] += 1
        a_m = sums[li][0] / sums[li][1]
        b_m = min(s / c for lj, (s, c) in sums.items() if lj != li)
        per_point.append((li, math.floor((b_m - a_m) / max(a_m, b_m) * 1e6 + 0.5)))
    agg = defaultdict(list)
    for li, s6 in per_point:
        agg[li].append(s6)
    def tdiv(a, b):  # trunc-toward-zero, matching Spark div / DuckDB //
        return -((-a) // b) if a < 0 else a // b

    want = {
        li: (len(v), tdiv(sum(v), len(v)), min(v), max(v))
        for li, v in agg.items()
    }
    got = {
        r["label"]: (r["n_points"], r["mean_s6"], r["min_s6"], r["max_s6"])
        for r in q_silhouette_score(spark, sf_dir).collect()
    }
    assert got == want
    # silhouette is bounded in [-1, 1]
    assert all(-1_000_000 <= s <= 1_000_000 for _, s in per_point)


def test_consistent_hash_ring_disruption_contract(spark, sf_dir):
    from gasket_rs_spark.operators.skew import (
        _RING_NODES,
        _RING_VNODES,
        q_consistent_hash_ring,
    )

    rows = q_consistent_hash_ring(spark, sf_dir).collect()
    total = sum(r["n_docs"] for r in rows)
    moved = sum(r["n_docs"] for r in rows if r["node8"] != r["node9"])
    # every moved key lands ON the new node — nothing reshuffles
    assert all(
        r["node9"] == _RING_NODES for r in rows if r["node8"] != r["node9"]
    )
    # moved share concentrates near 1/(n+1); allow wide but bounded slack
    assert moved / total < 2.5 / (_RING_NODES + 1)

    # pure-Python re-route of a sample of keys (full contract, both rings)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ids = t["doc_id"].to_pylist()[:200]

    def ring(n):
        vn = []
        for i in range(n * _RING_VNODES):
            node, rep = i % n, i // n
            pos = int(
                hashlib.md5(f"{node}:{rep}:ring".encode()).hexdigest()[:12], 16
            )
            vn.append((pos, node))
        vn.sort()
        return vn

    r8, r9 = ring(_RING_NODES), ring(_RING_NODES + 1)

    def route(vn, kh):
        for pos, node in vn:
            if pos >= kh:
                return node
        return vn[0][1]

    got_pairs = {(r["node8"], r["node9"]) for r in rows}
    for did in ids:
        kh = int(hashlib.md5(str(did).encode()).hexdigest()[:12], 16)
        assert (route(r8, kh), route(r9, kh)) in got_pairs


def test_two_proportion_ztest_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.stats import _Z975_6, q_two_proportion_ztest

    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_id", "event_type"])
    n1 = x1 = n2 = x2 = 0
    for eid, et in zip(t["event_id"].to_pylist(), t["event_type"].to_pylist()):
        y = 1 if et == "purchase" else 0
        if eid % 3 == 0:
            n1 += 1
            x1 += y
        else:
            n2 += 1
            x2 += y
    # max(..., 1) guards mirror the operator's degenerate-split guard (r12)
    z = (x1 * n2 - x2 * n1) / math.sqrt(
        max((x1 + x2) * (n1 + n2 - x1 - x2), 1)
        * max(n1 * n2, 1) / max(n1 + n2, 1)
    )
    z6 = math.floor(z * 1e6 + 0.5)
    r = q_two_proportion_ztest(spark, sf_dir).collect()[0]
    assert (r["n1"], r["x1"], r["n2"], r["x2"], r["z6"]) == (n1, x1, n2, x2, z6)
    assert r["significant"] == (abs(z6) > _Z975_6)
