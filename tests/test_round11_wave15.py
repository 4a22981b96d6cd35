"""Property pins for the round-11 wave-15 operators (event debounce,
Huber IRLS location, Brier decomposition)."""

from __future__ import annotations

import math
from collections import defaultdict
from fractions import Fraction

import pyarrow.parquet as pq


def test_event_debounce_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.analytics import _DEBOUNCE_SEC, q_event_debounce

    t = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "event_id", "ts"]
    )
    per = defaultdict(list)
    for uid, et, eid, ts in zip(
        t["user_id"].to_pylist(),
        t["event_type"].to_pylist(),
        t["event_id"].to_pylist(),
        t["ts"].to_pylist(),
    ):
        per[(uid, et)].append((math.floor(ts.timestamp()), eid))
    raw = defaultdict(int)
    kept = defaultdict(int)
    for (uid, et), rows in per.items():
        rows.sort()
        prev = None
        for s, _ in rows:
            raw[et] += 1
            if prev is None or s - prev > _DEBOUNCE_SEC:
                kept[et] += 1
            prev = s
    got = {
        r["event_type"]: (r["n_raw"], r["n_kept"], r["n_suppressed"], r["suppressed6"])
        for r in q_event_debounce(spark, sf_dir).collect()
    }
    want = {
        et: (
            raw[et],
            kept[et],
            raw[et] - kept[et],
            (raw[et] - kept[et]) * 1_000_000 // raw[et],
        )
        for et in raw
    }
    assert got == want


def test_huber_location_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.stats import (
        _HUBER_K_PM,
        _HUBER_T,
        q_huber_location,
    )

    t = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_type", "event_id", "value"]
    )
    per = defaultdict(list)
    for et, eid, v in zip(
        t["event_type"].to_pylist(), t["event_id"].to_pylist(), t["value"].to_pylist()
    ):
        per[et].append((math.floor(v * 1e6 + 0.5), eid))
    want = {}
    for et, rows in per.items():
        vs = [v for v, _ in sorted(rows, key=lambda x: (x[0], x[1]))]
        med = vs[(len(vs) + 1) // 2 - 1]
        devs = sorted(abs(x - med) for x in vs)
        mad = devs[(len(devs) + 1) // 2 - 1]
        k6 = (mad * _HUBER_K_PM) // 1000
        mu = med
        for _ in range(_HUBER_T):
            num = den = 0
            for v in vs:
                r = abs(v - mu)
                w3 = 1000 if r <= k6 else (k6 * 1000) // r
                num += w3 * v
                den += w3
            mu = num // den
        want[et] = (len(vs), med, mad, k6, mu)
    got = {
        r["event_type"]: (r["n"], r["median6"], r["mad6"], r["k6"], r["huber6"])
        for r in q_huber_location(spark, sf_dir).collect()
    }
    assert got == want
    # the Huber estimate stays between median and mean direction bounds
    for et, (_, med, mad, k6, mu) in want.items():
        lo, hi = min(v for v, _ in per[et]), max(v for v, _ in per[et])
        assert lo <= mu <= hi


def test_brier_identity_exact_rationals(spark, sf_dir):
    """With bin-midpoint forecasts, Murphy's identity
    Brier = REL − RES + UNC holds EXACTLY in rational arithmetic."""
    from gasket_rs_spark.operators.stats import _BRIER_BINS, q_brier_decomposition

    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    bins = defaultdict(lambda: [0, 0])
    for et, v in zip(t["event_type"].to_pylist(), t["value"].to_pylist()):
        b = min(int(math.floor(v / 50)), _BRIER_BINS - 1)
        bins[b][0] += 1
        bins[b][1] += 1 if et == "purchase" else 0
    n = sum(c for c, _ in bins.values())
    pos = sum(p for _, p in bins.values())
    obar = Fraction(pos, n)
    brier = rel = res = Fraction(0)
    for b, (n_k, p_k) in bins.items():
        f = Fraction(2 * b + 1, 2 * _BRIER_BINS)
        o = Fraction(p_k, n_k)
        brier += p_k * (f - 1) ** 2 + (n_k - p_k) * f**2
        rel += n_k * (f - o) ** 2
        res += n_k * (o - obar) ** 2
    brier, rel, res = brier / n, rel / n, res / n
    unc = obar * (1 - obar)
    assert brier == rel - res + unc
    # and the operator's snapped components agree with the rationals
    r = q_brier_decomposition(spark, sf_dir).collect()[0]
    assert abs(r["brier12"] - float(brier * 10**12)) <= 1
    assert abs(r["reliability12"] - float(rel * 10**12)) <= _BRIER_BINS + 1
    assert abs(r["resolution12"] - float(res * 10**12)) <= _BRIER_BINS + 1
    assert abs(r["uncertainty12"] - float(unc * 10**12)) <= 1
