"""Property pins for the round-11 wave-20 operators (Simpson diversity,
log-normal fit, Tukey median polish)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq


def test_simpson_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.text import q_simpson_diversity

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    per = defaultdict(Counter)
    for s, txt in zip(t["source"].to_pylist(), t["text"].to_pylist()):
        per[s].update(txt.split(" "))
    want = {}
    for s, cnts in per.items():
        n = sum(cnts.values())
        coll = sum(c * (c - 1) for c in cnts.values())
        # denominator guards mirror the operator (ADVICE r11): n <= 1
        # and all-distinct sources must not divide by zero
        s6 = math.floor(coll / max(n * (n - 1), 1) * 1e6 + 0.5)
        want[s] = (n, len(cnts), s6, math.floor(1e12 / max(s6, 1) + 0.5))
    got = {
        r["source"]: (r["n_tokens"], r["vocab"], r["simpson6"], r["effective_vocab6"])
        for r in q_simpson_diversity(spark, sf_dir).collect()
    }
    assert got == want
    # lambda is a probability: 0 < simpson6 <= 1e6 on this corpus
    assert all(0 < s6 <= 1_000_000 for _, _, s6, _ in want.values())


def test_lognormal_fit_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.text import q_lognormal_fit

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"])
    per = defaultdict(list)
    for lang, nc in zip(t["lang"].to_pylist(), t["n_chars"].to_pylist()):
        # max(nc, 1) mirrors the operator's empty-document guard (r12)
        per[lang].append(math.floor(math.log(max(nc, 1)) * 1e6 + 0.5))
    want = {}
    for lang, v in per.items():
        n, s1, s2 = len(v), sum(v), sum(x * x for x in v)
        mu6 = s1 // n
        var6 = math.floor((s2 / n - (s1 / n) * (s1 / n)) / 1e6 + 0.5)
        med_c = math.floor(math.exp(mu6 / 1e6) * 100 + 0.5)
        want[lang] = (n, mu6, var6, med_c)
    got = {
        r["lang"]: (r["n_docs"], r["mu6"], r["var6"], r["fitted_median_c"])
        for r in q_lognormal_fit(spark, sf_dir).collect()
    }
    assert got == want
    # sanity: the fitted median sits inside the observed length range
    obs = defaultdict(list)
    for lang, nc in zip(t["lang"].to_pylist(), t["n_chars"].to_pylist()):
        obs[lang].append(nc)
    for lang, (_, _, _, med_c) in want.items():
        assert min(obs[lang]) * 100 <= med_c <= max(obs[lang]) * 100


def test_median_polish_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.analytics import _POLISH_T, q_median_polish

    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["ts"])
    days = Counter(
        math.floor(math.floor(ts.timestamp()) / 86400) for ts in t["ts"].to_pylist()
    )
    d0, d1 = min(days), max(days)
    cells = {}
    for d in range(d0, d1 + 1):
        cells[(d % 7, d // 7)] = days.get(d, 0)
    resid = dict(cells)
    roweff = Counter()
    coleff = Counter()

    def lower_median(vals):
        s = sorted(vals)
        return s[(len(s) + 1) // 2 - 1]

    for _ in range(_POLISH_T):
        for dow in {k[0] for k in resid}:
            m = lower_median([v for (r, _), v in resid.items() if r == dow])
            for k in resid:
                if k[0] == dow:
                    resid[k] -= m
            roweff[dow] += m
        for week in {k[1] for k in resid}:
            m = lower_median([v for (_, c), v in resid.items() if c == week])
            for k in resid:
                if k[1] == week:
                    resid[k] -= m
            coleff[week] += m
    got = {
        (r["dow"], r["week"]): (r["c"], r["roweff"], r["coleff"], r["resid"])
        for r in q_median_polish(spark, sf_dir).collect()
    }
    want = {
        k: (cells[k], roweff[k[0]], coleff[k[1]], resid[k]) for k in cells
    }
    assert got == want
    # decomposition identity: c == roweff + coleff + resid, every cell
    assert all(c == re + ce + rs for c, re, ce, rs in got.values())
