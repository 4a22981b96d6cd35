"""Property pins for the round-11 wave-22 operators (Apriori triples,
peak concurrency)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from itertools import combinations

import pyarrow.parquet as pq


def test_apriori_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.analytics import (
        _APRIORI_ITEMS,
        _APRIORI_MINSUP_DIV,
        _APRIORI_TOPK,
        q_apriori_triples,
    )

    t = pq.read_table(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    baskets = defaultdict(set)
    for ok, pk in zip(t["l_orderkey"].to_pylist(), t["l_partkey"].to_pylist()):
        baskets[ok].add(pk % _APRIORI_ITEMS)
    nb = len(baskets)
    minsup = max(nb // _APRIORI_MINSUP_DIV, 2)
    # brute-force triple supports (ground truth; Apriori must agree)
    tri = Counter()
    for items in baskets.values():
        for c in combinations(sorted(items), 3):
            tri[c] += 1
    frequent = {c: s for c, s in tri.items() if s >= minsup}
    ranked = sorted(frequent.items(), key=lambda kv: (-kv[1], kv[0]))[:_APRIORI_TOPK]
    want = [
        (a, b, c, s, s * 1_000_000 // nb) for (a, b, c), s in ranked
    ]
    got = [
        (r["ia"], r["ib"], r["ic"], r["support"], r["share6"])
        for r in q_apriori_triples(spark, sf_dir).collect()
    ]
    assert got == want
    # downward closure sanity: every frequent triple's sub-pairs are
    # at least as frequent
    pair = Counter()
    for items in baskets.values():
        for c in combinations(sorted(items), 2):
            pair[c] += 1
    for (a, b, c), s in frequent.items():
        assert min(pair[(a, b)], pair[(a, c)], pair[(b, c)]) >= s


def test_peak_concurrency_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.analytics import (
        _SPAN_SEC_CONC,
        q_peak_concurrency,
    )

    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])
    per = defaultdict(list)
    for et, ts in zip(t["event_type"].to_pylist(), t["ts"].to_pylist()):
        per[et].append(math.floor(ts.timestamp()))
    want = {}
    for et, starts in per.items():
        pts = [(s, 1) for s in starts] + [(s + _SPAN_SEC_CONC, -1) for s in starts]
        pts.sort()  # (t, delta): ends (-1) before starts (+1) at equal t
        live = peak = 0
        peak_t = None
        for t_, d in pts:
            live += d
            if live > peak:
                peak, peak_t = live, t_
        want[et] = (len(starts), peak, peak_t)
    got = {
        r["event_type"]: (r["n_spans"], r["peak_live"], r["peak_at_sec"])
        for r in q_peak_concurrency(spark, sf_dir).collect()
    }
    assert got == want
    # a span always overlaps itself: peak >= 1 everywhere
    assert all(p >= 1 for _, p, _ in want.values())
