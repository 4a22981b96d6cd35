"""Property pins for the round-11 wave-21 operators (Chao1 richness +
Good-Turing mass, Mann-Kendall trend)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq


def test_chao1_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.text import q_chao1_richness

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    per = defaultdict(Counter)
    for s, txt in zip(t["source"].to_pylist(), t["text"].to_pylist()):
        per[s].update(txt.split(" "))
    want = {}
    for s, cnts in per.items():
        n = sum(cnts.values())
        v = len(cnts)
        f1 = sum(1 for c in cnts.values() if c == 1)
        f2 = sum(1 for c in cnts.values() if c == 2)
        # bias-corrected Chao1 (ADVICE r11): V + f1*(f1-1)/(2*(f2+1))
        chao = v * 1_000_000 + math.floor(
            (f1 * (f1 - 1) * 1_000_000) / (2 * (f2 + 1)) + 0.5
        )
        want[s] = (n, v, f1, f2, chao, f1 * 1_000_000 // n)
    got = {
        r["source"]: (
            r["n_tokens"],
            r["vocab"],
            r["f1"],
            r["f2"],
            r["chao1_6"],
            r["gt_unseen6"],
        )
        for r in q_chao1_richness(spark, sf_dir).collect()
    }
    assert got == want
    # Chao1 never estimates fewer types than observed
    assert all(chao >= v * 1_000_000 for _, v, _, _, chao, _ in want.values())


def test_mann_kendall_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.analytics import q_mann_kendall_trend

    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["ts"])
    days = Counter(
        math.floor(math.floor(ts.timestamp()) / 86400) for ts in t["ts"].to_pylist()
    )
    d0, d1 = min(days), max(days)
    cs = [days.get(d, 0) for d in range(d0, d1 + 1)]
    n = len(cs)
    s = sum(
        (cs[j] > cs[i]) - (cs[j] < cs[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    tie_num = sum(
        t_ * (t_ - 1) * (2 * t_ + 5) for t_ in Counter(cs).values()
    )
    # max(..., 1) mirrors the operator's zero-variance guard (round 12)
    var18 = max(n * (n - 1) * (2 * n + 5) - tie_num, 1) / 18.0
    z = (s - (1 if s > 0 else -1 if s < 0 else 0)) / math.sqrt(var18)
    z6 = math.floor(z * 1e6 + 0.5)
    r = q_mann_kendall_trend(spark, sf_dir).collect()[0]
    assert (r["n"], r["s"], r["tie_num"], r["z6"]) == (n, s, tie_num, z6)
    assert r["trend"] == (abs(z6) > 1_959_964)
