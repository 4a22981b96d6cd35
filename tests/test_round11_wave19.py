"""Property pins for the round-11 wave-19 operators (Pettitt test,
Kruskal-Wallis H, Lorenz curve)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq


def test_pettitt_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.analytics import q_pettitt_changepoint

    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["ts"])
    days = Counter(
        math.floor(math.floor(ts.timestamp()) / 86400) for ts in t["ts"].to_pylist()
    )
    d0, d1 = min(days), max(days)
    cs = [days.get(d, 0) for d in range(d0, d1 + 1)]
    n = len(cs)
    best = None
    for ti in range(n - 1):  # t ranges over days with at least one j > t
        u = 0
        for i in range(ti + 1):
            for j in range(ti + 1, n):
                u += (cs[j] > cs[i]) - (cs[j] < cs[i])
        cand = (-abs(u), d0 + ti, u)
        if best is None or cand < best:
            best = cand
    r = q_pettitt_changepoint(spark, sf_dir).collect()[0]
    assert (r["n_days"], r["change_day"], r["u_at_change"], r["abs_u"]) == (
        n,
        best[1],
        best[2],
        -best[0],
    )


def test_kruskal_wallis_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.stats import q_kruskal_wallis

    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    bg = Counter()
    for et, v in zip(t["event_type"].to_pylist(), t["value"].to_pylist()):
        bg[(math.floor(v), et)] += 1
    hist = Counter()
    for (b, _), c in bg.items():
        hist[b] += c
    r2 = {}
    for b in hist:
        less = sum(c for b2, c in hist.items() if b2 < b)
        r2[b] = 2 * less + hist[b] + 1
    groups = defaultdict(lambda: [0, 0])
    for (b, et), c in bg.items():
        groups[et][0] += c
        groups[et][1] += c * r2[b]
    n = sum(hist.values())
    sum_t = sum(
        math.floor(r2s * r2s / ni + 0.5) for ni, r2s in groups.values()
    )
    tie_num = sum(c**3 - c for c in hist.values())
    h_adj6 = math.floor(
        (3.0 * sum_t / (n * (n + 1)) - 3 * (n + 1))
        / (1.0 - tie_num / (n**3 - n))
        * 1e6
        + 0.5
    )
    rows = q_kruskal_wallis(spark, sf_dir).collect()
    got = {r["event_type"]: (r["n_i"], r["r2_sum"]) for r in rows}
    assert got == {et: (ni, r2s) for et, (ni, r2s) in groups.items()}
    assert all(r["h_adj6"] == h_adj6 for r in rows)
    # H is non-negative for any data
    assert h_adj6 >= 0


def test_lorenz_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.stats import q_lorenz_curve

    o = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    c = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    seg = dict(zip(c["c_custkey"].to_pylist(), c["c_mktsegment"].to_pylist()))
    rev = Counter()
    for ck, tp in zip(o["o_custkey"].to_pylist(), o["o_totalprice"].to_pylist()):
        rev[ck] += math.floor(tp * 100 + 0.5)
    per_seg = defaultdict(list)
    for ck, r in rev.items():
        per_seg[seg[ck]].append((r, ck))
    want = {}
    for s, rows in per_seg.items():
        rows.sort()
        total = sum(r for r, _ in rows)
        n = len(rows)
        cum = 0
        cums = []
        for r, _ in rows:
            cum += r
            cums.append(cum)
        for k in range(1, 11):
            rk = (n * k + 9) // 10
            want[(s, k)] = (rk, cums[rk - 1] * 1_000_000 // total)
    got = {
        (r["c_mktsegment"], r["decile"]): (r["rank_at"], r["cum_share6"])
        for r in q_lorenz_curve(spark, sf_dir).collect()
    }
    assert got == want
    # Lorenz curve is convex-ish: cumulative shares are non-decreasing
    for s in per_seg:
        shares = [want[(s, k)][1] for k in range(1, 11)]
        assert shares == sorted(shares)
        assert shares[-1] == 1_000_000
