"""Property pins for the round-11 wave-5 operators (skyline, ROC,
l-diversity, Holt) — brute-force third opinions and curve invariants."""

from __future__ import annotations

import math
from collections import defaultdict

import pyarrow.parquet as pq


def test_skyline_matches_brute_force(spark, sf_dir):
    from gasket_rs_spark.operators.analytics import q_skyline_pareto

    t = pq.read_table(f"{sf_dir}/part.parquet",
                      columns=["p_partkey", "p_size", "p_retailprice"])
    pts = [
        (k, s, math.floor(p * 100 + 0.5))
        for k, s, p in zip(t["p_partkey"].to_pylist(), t["p_size"].to_pylist(),
                           t["p_retailprice"].to_pylist())
    ]
    def dominated(a):
        _, sa, ca = a
        return any(
            cb <= ca and sb >= sa and (cb < ca or sb > sa)
            for _, sb, cb in pts
        )
    want = sorted((k, s, c) for k, s, c in pts if not dominated((k, s, c)))
    got = sorted(
        (r["p_partkey"], r["p_size"], r["cents"])
        for r in q_skyline_pareto(spark, sf_dir).collect()
    )
    assert got == want


def test_roc_curve_monotone_with_correct_endpoints(spark, sf_dir):
    from gasket_rs_spark.operators.stats import q_roc_curve

    rows = sorted(q_roc_curve(spark, sf_dir).collect(), key=lambda r: r["i"])
    # threshold at i=0 is the min score: everything predicted positive
    assert rows[0]["tp"] == rows[0]["n_pos"] if "n_pos" in rows[0] else True
    assert rows[0]["tpr6"] == 1_000_000 and rows[0]["fpr6"] == 1_000_000
    tps = [r["tp"] for r in rows]
    fps = [r["fp"] for r in rows]
    assert tps == sorted(tps, reverse=True)  # raising thr never adds hits
    assert fps == sorted(fps, reverse=True)


def test_l_diversity_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.pii import (
        _L_DIV,
        _L_QI_BUCKET,
        q_l_diversity_audit,
    )

    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["lang", "n_chars", "source"])
    classes = defaultdict(lambda: [0, set()])
    for lang, n, src in zip(t["lang"].to_pylist(), t["n_chars"].to_pylist(),
                            t["source"].to_pylist()):
        c = classes[(lang, n // _L_QI_BUCKET)]
        c[0] += 1
        c[1].add(src)
    viol = [(n, len(s)) for n, s in classes.values() if len(s) < _L_DIV]
    r = q_l_diversity_audit(spark, sf_dir).collect()[0]
    assert r["n_classes"] == len(classes)
    assert r["n_violating_classes"] == len(viol)
    assert r["n_docs_at_risk"] == sum(n for n, _ in viol)
    assert r["min_l"] == min(len(s) for _, s in classes.values())


def test_holt_matches_pure_python_fold(spark, sf_dir):
    from gasket_rs_spark.operators.analytics import (
        _HOLT_H,
        q_holt_linear_forecast,
    )

    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
    days = [math.floor(v.timestamp()) // 86400 for v in t["ts"].to_pylist()]
    d0, d1 = min(days), max(days)
    per_type = defaultdict(lambda: defaultdict(int))
    for d, ty in zip(days, t["event_type"].to_pylist()):
        per_type[ty][d] += 1

    def trunc_div(a, b):  # both engines truncate toward zero
        q, r = divmod(a, b)
        return q if r == 0 or a >= 0 else q + 1

    want = {}
    for ty, m in per_type.items():
        xs = [m.get(d, 0) for d in range(d0, d1 + 1)]
        l = xs[1] * 1000
        b = (xs[1] - xs[0]) * 1000
        for x in xs[2:]:
            lt = trunc_div(x * 1000 + 3 * (l + b), 4)
            b = trunc_div((lt - l) + 3 * b, 4)
            l = lt
        want[ty] = (len(xs), l, b, l + _HOLT_H * b)
    got = {
        r["event_type"]: (r["n_days"], r["level_milli"], r["trend_milli"],
                          r["forecast7_milli"])
        for r in q_holt_linear_forecast(spark, sf_dir).collect()
    }
    assert got == want


def test_weighted_median_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.stats import q_weighted_median

    t = pq.read_table(f"{sf_dir}/lineitem.parquet",
                      columns=["l_returnflag", "l_extendedprice", "l_quantity"])
    per_flag = defaultdict(lambda: defaultdict(int))
    for f, p, q in zip(t["l_returnflag"].to_pylist(),
                       t["l_extendedprice"].to_pylist(),
                       t["l_quantity"].to_pylist()):
        per_flag[f][math.floor(p * 100 + 0.5)] += int(q)
    want = {}
    for f, hist in per_flag.items():
        tot = sum(hist.values())
        cum = 0
        for cents in sorted(hist):
            cum += hist[cents]
            if 2 * cum >= tot:
                want[f] = (cents, tot)
                break
    got = {r["l_returnflag"]: (r["wmedian_cents"], r["total_weight"])
           for r in q_weighted_median(spark, sf_dir).collect()}
    assert got == want


def test_wilson_ci_brackets_p_and_matches_python(spark, sf_dir):
    from gasket_rs_spark.operators.stats import (
        _WILSON_THR,
        _WILSON_Z,
        q_wilson_ci,
    )

    t = pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["event_type", "value"])
    agg = defaultdict(lambda: [0, 0])
    for ty, v in zip(t["event_type"].to_pylist(), t["value"].to_pylist()):
        agg[ty][0] += 1
        agg[ty][1] += v >= _WILSON_THR
    z2 = _WILSON_Z * _WILSON_Z
    want = {}
    for ty, (n, k) in agg.items():
        p = k / n
        center = p + z2 / (2 * n)
        rad = _WILSON_Z * math.sqrt((p * (1.0 - p) + z2 / (4 * n * float(n))) / n)
        denom = 1.0 + z2 / n
        want[ty] = (k, n, math.floor((center - rad) / denom * 1e6 + 0.5),
                    math.floor((center + rad) / denom * 1e6 + 0.5))
    got = {r["event_type"]: (r["k"], r["n"], r["lo6"], r["hi6"])
           for r in q_wilson_ci(spark, sf_dir).collect()}
    assert got == want
    for ty, (k, n, lo6, hi6) in got.items():
        assert 0 <= lo6 <= k * 1_000_000 // n <= hi6 <= 1_000_000


def test_source_vocab_overlap_is_symmetric_jaccard(spark, sf_dir):
    from gasket_rs_spark.operators.text import q_source_vocab_overlap

    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["source", "text"])
    vocab = defaultdict(set)
    for s, txt in zip(t["source"].to_pylist(), t["text"].to_pylist()):
        vocab[s].update(txt.split(" "))
    srcs = sorted(vocab)
    want = {}
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1:]:
            inter = len(vocab[sa] & vocab[sb])
            na, nb = len(vocab[sa]), len(vocab[sb])
            want[(sa, sb)] = (inter, na, nb,
                              inter * 1000000 // (na + nb - inter))
    got = {(r["sa"], r["sb"]): (r["inter"], r["na"], r["nb"], r["jaccard6"])
           for r in q_source_vocab_overlap(spark, sf_dir).collect()}
    assert got == want
