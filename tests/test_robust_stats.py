"""Engine-independent third opinions for the round-11 statistical-rigor
operators (Poisson bootstrap CI, Theil-Sen trend): plain-Python
recomputes over the same parquet must reproduce the witness rows
exactly — the BPE/unigram pin pattern."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import pyarrow.parquet as pq


def test_bootstrap_ci_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.stats import (
        _BOOT_B,
        _BOOT_HI_RANK,
        _BOOT_LO_RANK,
        _poisson1_thresholds_u16,
        q_bootstrap_ci,
    )

    t = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    keys = t["o_orderkey"].to_pylist()
    cents = [math.floor(p * 100 + 0.5) for p in t["o_totalprice"].to_pylist()]
    thr = _poisson1_thresholds_u16()

    def mult(key: int, b: int) -> int:
        u = int(hashlib.md5(f"{key}:{b}".encode()).hexdigest()[:4], 16)
        for k, cut in enumerate(thr):
            if u < cut:
                return k
        return 5

    n_orders = len(keys)
    mean4 = sum(cents) * 100 // n_orders
    means = []
    for b in range(_BOOT_B):
        nb = sb = 0
        for key, c in zip(keys, cents):
            k = mult(key, b)
            nb += k
            sb += k * c
        if nb > 0:
            means.append(sb * 100 // nb)
    means.sort()
    want = (n_orders, mean4, means[_BOOT_LO_RANK - 1], means[_BOOT_HI_RANK - 1], len(means))
    r = q_bootstrap_ci(spark, sf_dir).collect()[0]
    assert (r.n_orders, r.mean4, r.boot_lo4, r.boot_hi4, r.n_reps) == want
    assert r.boot_lo4 <= r.boot_hi4


def test_theil_sen_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.analytics import q_theil_sen_trend

    import pyarrow as pa

    t = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "event_type", "value"]
    )
    # epoch ints straight from the arrow buffer — no datetime/tz round-trip
    unit = t["ts"].type.unit
    div = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[unit]
    ts_sec = [v // div for v in t["ts"].cast(pa.int64()).to_pylist()]
    rows = list(
        zip(
            t["event_id"].to_pylist(),
            ts_sec,
            t["event_type"].to_pylist(),
            t["value"].to_pylist(),
        )
    )
    by_tw = defaultdict(list)
    for eid, sec, et, v in rows:
        week = sec // 604800
        by_tw[(et, week)].append((math.floor(v * 100 + 0.5), eid))
    weekly = defaultdict(dict)
    for (et, week), vals in by_tw.items():
        vals.sort()
        weekly[et][week] = vals[(len(vals) + 1) // 2 - 1][0]  # lower median
    want = {}
    for et, med in weekly.items():
        wk = sorted(med)
        slopes = []
        for i in range(len(wk)):
            for j in range(i + 1, len(wk)):
                num = (med[wk[j]] - med[wk[i]]) * 1000000
                den = wk[j] - wk[i]
                q = abs(num) // den
                slopes.append((-q if num < 0 else q, wk[i], wk[j]))  # trunc div
        slopes.sort()
        np_ = len(slopes)
        want[et] = (len(wk), np_, slopes[(np_ + 1) // 2 - 1][0])
    got = {
        r.event_type: (r.n_weeks, r.n_pairs, r.ts_slope6)
        for r in q_theil_sen_trend(spark, sf_dir).collect()
    }
    assert got == want


def test_adamic_adar_bounded_by_common_neighbors(spark, sf_dir):
    from gasket_rs_spark.operators.graph import _LP_CAP, _aa_weights, q_adamic_adar

    w = _aa_weights()
    assert w[0] == 1_000_000  # 1/log2(2)
    assert w == sorted(w, reverse=True)
    assert len(w) == _LP_CAP - 1
    rows = q_adamic_adar(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    scores = [r.aa6 for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        # each of the cn shared (deg>=2) neighbors contributes a weight
        # in [w(cap), w(2)]
        assert r.cn * w[-1] <= r.aa6 <= r.cn * w[0]
        assert r.cust_a < r.cust_b


def test_mutual_information_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.analytics import q_mutual_information

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["lang", "source"])
    pairs = list(zip(t["lang"].to_pylist(), t["source"].to_pylist()))
    cells = defaultdict(int)
    for p in pairs:
        cells[p] += 1
    n = len(pairs)
    r = defaultdict(int)
    s = defaultdict(int)
    for (lg, src), c in cells.items():
        r[lg] += c
        s[src] += c
    acc = 0
    for (lg, src), c in cells.items():
        acc += c * math.floor(math.log2((c * n) / (r[lg] * s[src])) * 1e6 + 0.5)
    q = abs(acc) // n
    want = (-q if acc < 0 else q, len(cells), n)  # trunc div like both engines
    row = q_mutual_information(spark, sf_dir).collect()[0]
    assert (row.mi_bits6, row.n_cells, row.n_docs) == want
    # MI is non-negative up to per-cell snap drift
    assert row.mi_bits6 >= -len(cells)


def test_benford_expected_table_telescopes_to_one():
    from gasket_rs_spark.operators.profile import _benford_exp6

    e = _benford_exp6()
    assert len(e) == 9
    assert e == sorted(e, reverse=True)  # p(1) > p(2) > ... > p(9)
    assert e[0] == 301030  # log10(2)
    # Σ log10(1+1/d) = log10(10) = 1 exactly — rounding leaves ±5 ppm
    assert abs(sum(e) - 1_000_000) <= 5


def test_benford_audit_matches_python_counts(spark, sf_dir):
    import math
    from collections import Counter

    from gasket_rs_spark.operators.profile import q_benford_digit_audit
    from gasket_rs_spark.tables import load

    rows = q_benford_digit_audit(spark, sf_dir).collect()
    assert [r.digit for r in rows] == list(range(1, 10))
    cnt = Counter(
        int(str(int(math.floor(r.l_extendedprice * 100 + 0.5)))[0])
        for r in load(spark, sf_dir, "lineitem").select("l_extendedprice").collect()
    )
    n = sum(cnt.values())
    for r in rows:
        assert r.n_obs == cnt[r.digit]
        assert r.obs6 == r.n_obs * 1_000_000 // n
        assert r.dev6 == abs(r.obs6 - r.exp6)
    assert sum(r.n_obs for r in rows) == n


def test_spearman_matches_scipy_style_reference(spark, sf_dir):
    """Independent reference: average-rank Spearman via pure Python
    (the doubled-rank trick must equal true average ranks)."""
    from collections import defaultdict

    from gasket_rs_spark.operators.stats import q_spearman_quality_corr
    from gasket_rs_spark.tables import load

    by_lang = defaultdict(list)
    for r in load(spark, sf_dir, "documents").select("lang", "text").collect():
        toks = r.text.split(" ")
        s1 = len(toks)
        s2 = len(set(toks)) * 1_000_000 // len(toks)
        by_lang[r.lang].append((s1, s2))

    def avg_ranks_doubled(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        r = [0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vals[order[j]] == vals[order[i]]:
                j += 1
            # doubled average rank of the tie block [i, j): 2*avg(i+1..j)
            dr = (i + 1) + j  # = 2 * ((i+1)+j)/2
            for k in range(i, j):
                r[order[k]] = dr
            i = j
        return r

    rows = {r.lang: r for r in q_spearman_quality_corr(spark, sf_dir).collect()}
    import math

    for lang, pairs in by_lang.items():
        r1 = avg_ranks_doubled([p[0] for p in pairs])
        r2 = avg_ranks_doubled([p[1] for p in pairs])
        n = len(pairs)
        sd2 = sum((a - b) ** 2 for a, b in zip(r1, r2))
        rho6 = int(math.floor((1.0 - 1.5 * sd2 / (n**3 - n)) * 1e6 + 0.5))
        got = rows[lang]
        assert (got.n, got.sd2, got.rho6) == (n, sd2, rho6), lang
        assert -1_000_000 <= got.rho6 <= 1_000_000
