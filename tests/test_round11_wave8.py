"""Property pins for the round-11 wave-8 operators (Cohen's kappa, MAD
outliers, t-closeness, largest-remainder apportionment) — pure-Python
recomputations of properties the driver's value hash can't see."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq


def test_cohens_kappa_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.stats import (
        _KAPPA_CHAR_CUTS,
        _KAPPA_TOK_CUTS,
        q_cohens_kappa,
    )

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text", "n_chars"])
    cells = Counter()
    for text, nc in zip(t["text"].to_pylist(), t["n_chars"].to_pylist()):
        ra = 0 if nc < _KAPPA_CHAR_CUTS[0] else (1 if nc < _KAPPA_CHAR_CUTS[1] else 2)
        nt = len(text.split(" "))
        rb = 0 if nt < _KAPPA_TOK_CUTS[0] else (1 if nt < _KAPPA_TOK_CUTS[1] else 2)
        cells[(ra, rb)] += 1
    n = sum(cells.values())
    agree = sum(c for (a, b), c in cells.items() if a == b)
    rows = Counter()
    cols = Counter()
    for (a, b), c in cells.items():
        rows[a] += c
        cols[b] += c
    pe_num = sum(rows[c] * cols[c] for c in rows if c in cols)
    kappa6 = math.floor((n * agree - pe_num) / (n * n - pe_num) * 1e6 + 0.5)
    r = q_cohens_kappa(spark, sf_dir).collect()[0]
    assert (r["n_items"], r["observed_agree"], r["pe_num"], r["kappa6"]) == (
        n,
        agree,
        pe_num,
        kappa6,
    )
    # the two length raters correlate strongly: agreement must beat chance
    assert r["kappa6"] > 0


def _lower_median(values):
    s = sorted(values)
    return s[(len(s) + 1) // 2 - 1]


def test_mad_outliers_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.stats import _MAD_K, q_mad_outliers

    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    per = defaultdict(list)
    for et, v in zip(t["event_type"].to_pylist(), t["value"].to_pylist()):
        per[et].append(math.floor(v * 1e6 + 0.5))
    want = {}
    for et, vs in per.items():
        med = _lower_median(vs)
        devs = [abs(v - med) for v in vs]
        mad = _lower_median(devs)
        nout = sum(1 for d in devs if d > _MAD_K * mad)
        want[et] = (len(vs), med, mad, nout, nout * 1_000_000 // len(vs))
    got = {
        r["event_type"]: (
            r["n"],
            r["median6"],
            r["mad6"],
            r["n_outliers"],
            r["outlier_share6"],
        )
        for r in q_mad_outliers(spark, sf_dir).collect()
    }
    assert got == want


def test_t_closeness_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.pii import (
        _T_CLOSE6,
        _T_SENS_BUCKET,
        _T_SENS_M,
        q_t_closeness_audit,
    )

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["lang", "source", "n_chars"]
    )
    per = defaultdict(Counter)
    for lang, src, nc in zip(
        t["lang"].to_pylist(), t["source"].to_pylist(), t["n_chars"].to_pylist()
    ):
        per[(lang, src)][min(nc // _T_SENS_BUCKET, _T_SENS_M - 1)] += 1
    n_total = t.num_rows
    glob_cum = [0] * _T_SENS_M
    for cnts in per.values():
        cum = 0
        for b in range(_T_SENS_M):
            cum += cnts.get(b, 0)
            glob_cum[b] += cum
    emds = {}
    for cls, cnts in per.items():
        n_g = sum(cnts.values())
        cum, num = 0, 0
        for b in range(_T_SENS_M):
            cum += cnts.get(b, 0)
            num += abs(cum * n_total - glob_cum[b] * n_g)
        emds[cls] = (
            n_g,
            math.floor(num / (n_g * n_total * (_T_SENS_M - 1)) * 1e6 + 0.5),
        )
    r = q_t_closeness_audit(spark, sf_dir).collect()[0]
    assert r["n_classes"] == len(emds)
    assert r["max_emd6"] == max(e for _, e in emds.values())
    assert r["n_violating_classes"] == sum(
        1 for _, e in emds.values() if e > _T_CLOSE6
    )
    assert r["n_docs_at_risk"] == sum(
        n for n, e in emds.values() if e > _T_CLOSE6
    )
    # EMD is a normalized distance: every class sits in [0, 1]
    assert 0 <= r["max_emd6"] <= 1_000_000


def test_apportionment_exactly_spends_budget(spark, sf_dir):
    from gasket_rs_spark.operators.curation import (
        _APPORTION_SHARDS,
        q_mixture_apportionment,
    )

    rows = q_mixture_apportionment(spark, sf_dir).collect()
    assert sum(r["shards"] for r in rows) == _APPORTION_SHARDS
    # Hamilton: every source gets base or base+1, never more
    assert all(r["shards"] - r["base_shards"] in (0, 1) for r in rows)
    # pure-Python recomputation of the full apportionment
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["source"])
    counts = Counter(t["source"].to_pylist())
    n_total = sum(counts.values())
    quota = {
        s: (n * _APPORTION_SHARDS // n_total, (n * _APPORTION_SHARDS) % n_total)
        for s, n in counts.items()
    }
    leftover = _APPORTION_SHARDS - sum(b for b, _ in quota.values())
    bonus = {
        s
        for s, _ in sorted(quota.items(), key=lambda kv: (-kv[1][1], kv[0]))[
            :leftover
        ]
    }
    want = {s: b + (1 if s in bonus else 0) for s, (b, _) in quota.items()}
    assert {r["source"]: r["shards"] for r in rows} == want
