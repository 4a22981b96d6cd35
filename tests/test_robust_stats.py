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
        # max(..., 1.0) mirrors the operator's n=1 guard (round 12)
        rho6 = int(math.floor((1.0 - 1.5 * sd2 / max(float(n) * n * n - n, 1.0))
                              * 1e6 + 0.5))
        got = rows[lang]
        assert (got.n, got.sd2, got.rho6) == (n, sd2, rho6), lang
        assert -1_000_000 <= got.rho6 <= 1_000_000


def test_mann_whitney_matches_pure_python(spark, sf_dir):
    """Third opinion: doubled-rank U recomputed row-by-row in Python."""
    from gasket_rs_spark.operators.stats import q_mann_whitney_u

    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["lang", "source", "n_chars"])
    rows = list(zip(t["lang"].to_pylist(), t["source"].to_pylist(),
                    t["n_chars"].to_pylist()))
    langs = defaultdict(list)
    for lang, src, x in rows:
        langs[lang].append((src, x))
    expect = {}
    for lang, docs in langs.items():
        src1 = min(s for s, _ in docs)
        xs = sorted(x for _, x in docs)
        # doubled average rank per value
        first = {}
        count = defaultdict(int)
        for i, x in enumerate(xs, 1):
            first.setdefault(x, i)
            count[x] += 1
        r2x = {x: 2 * first[x] + count[x] - 1 for x in count}
        n1 = sum(1 for s, _ in docs if s == src1)
        n2 = len(docs) - n1
        rsum2x = sum(r2x[x] for s, x in docs if s == src1)
        u2 = rsum2x - n1 * (n1 + 1)
        expect[lang] = (n1, n2, u2, u2 * 1000000 // (n1 * n2) - 1000000)
    got = {r["lang"]: (r["n1"], r["n2"], r["u2"], r["rb6"])
           for r in q_mann_whitney_u(spark, sf_dir).collect()}
    assert got == expect


def test_kendall_tau_matches_brute_force(spark, sf_dir):
    """Third opinion: τ-b pair loop over the SAME md5 sample in Python."""
    from gasket_rs_spark.operators.stats import _KENDALL_SAMPLE, q_kendall_tau

    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["lang", "doc_id", "text"])
    per_lang = defaultdict(list)
    for lang, did, text in zip(t["lang"].to_pylist(), t["doc_id"].to_pylist(),
                               t["text"].to_pylist()):
        toks = text.split(" ")
        s1 = len(toks)
        s2 = len(set(toks)) * 1000000 // len(toks)
        per_lang[lang].append((hashlib.md5(str(did).encode()).hexdigest(), did, s1, s2))
    expect = {}
    for lang, docs in per_lang.items():
        samp = sorted(docs)[:_KENDALL_SAMPLE]
        samp.sort(key=lambda d: d[1])  # pair on doc_id order
        conc = disc = tx = ty = n0 = 0
        for i in range(len(samp)):
            for j in range(i + 1, len(samp)):
                _, _, xa, ya = samp[i]
                _, _, xb, yb = samp[j]
                n0 += 1
                if (xa < xb and ya < yb) or (xa > xb and ya > yb):
                    conc += 1
                elif (xa < xb and ya > yb) or (xa > xb and ya < yb):
                    disc += 1
                tx += xa == xb
                ty += ya == yb
        # max(..., 1) mirrors the operator's all-ties guard (round 12)
        tau6 = math.floor((conc - disc)
                          / math.sqrt(max((n0 - tx) * (n0 - ty), 1))
                          * 1e6 + 0.5)
        expect[lang] = (n0, conc, disc, tau6)
    got = {r["lang"]: (r["n0"], r["conc"], r["disc"], r["tau6"])
           for r in q_kendall_tau(spark, sf_dir).collect()}
    assert got == expect


def test_cramers_v_perfect_association_is_one():
    """V's normalization: a diagonal (perfectly associated) table gives
    exactly V=1 under the same integer/snap spelling."""
    # 3x3 diagonal contingency, 10 per diagonal cell
    obs = {(i, j): (10 if i == j else 0) for i in range(3) for j in range(3)}
    n = 30
    chi2 = 0.0
    for (i, j), o in obs.items():
        e = 10 * 10 / n
        chi2 += (o - e) ** 2 / e
    chi2 = math.floor(chi2 * 1e6 + 0.5) / 1e6
    v6 = math.floor(math.sqrt(chi2 / (n * 2)) * 1e6 + 0.5)
    assert v6 == 1_000_000


def test_acf_and_cusum_match_pure_python(spark, sf_dir):
    """Third opinion for both time-series witnesses: integer ACF and the
    argmax-|cusum| changepoint recomputed from the raw parquet."""
    from gasket_rs_spark.operators.analytics import (
        q_acf_daily,
        q_cusum_changepoint,
    )

    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
    secs = [v.timestamp() for v in t["ts"].to_pylist()]
    days = [math.floor(s) // 86400 for s in secs]
    d0, d1 = min(days), max(days)
    # global series
    cnt = defaultdict(int)
    for d in days:
        cnt[d] += 1
    c = [cnt.get(d, 0) for d in range(d0, d1 + 1)]
    n, s = len(c), sum(c)
    y = [n * ci - s for ci in c]
    den = sum(v * v for v in y)
    expect_acf = {}
    for lag in range(1, 8):
        num = sum(y[i] * y[i + lag] for i in range(n - lag))
        q, r = divmod(num * 1000000, den)  # python // floors; emulate trunc
        trunc = q if r == 0 or num >= 0 else q + 1
        expect_acf[lag] = (num, den, trunc)
    got_acf = {r["lag"]: (r["num"], r["den_ss"], r["acf6"])
               for r in q_acf_daily(spark, sf_dir).collect()}
    assert got_acf == expect_acf

    per_type = defaultdict(lambda: defaultdict(int))
    for d, ty in zip(days, t["event_type"].to_pylist()):
        per_type[ty][d] += 1
    expect_cp = {}
    for ty, m in per_type.items():
        c = [m.get(d, 0) for d in range(d0, d1 + 1)]
        n, s = len(c), sum(c)
        cum = 0
        best = (-1, None)  # (abs, day) with earliest-day tiebreak
        for i, ci in enumerate(c):
            cum += n * ci - s
            if abs(cum) > best[0]:
                best = (abs(cum), d0 + i)
        expect_cp[ty] = (best[1], best[0], n)
    got_cp = {r["event_type"]: (r["cp_day"], r["max_abs_cum"], r["n_days"])
              for r in q_cusum_changepoint(spark, sf_dir).collect()}
    assert got_cp == expect_cp
