"""Property pins for the round-11 wave-17 operators (dispersion index,
seasonal strength, Naive Bayes lang-id, RAKE keyphrases)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq


def _daily(sf_dir):
    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])
    per = defaultdict(Counter)
    for et, ts in zip(t["event_type"].to_pylist(), t["ts"].to_pylist()):
        per[et][math.floor(math.floor(ts.timestamp()) / 86400)] += 1
    return per


def test_dispersion_index_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.analytics import q_dispersion_index

    per = _daily(sf_dir)
    d0 = min(min(c) for c in per.values())
    d1 = max(max(c) for c in per.values())
    want = {}
    for et, cnts in per.items():
        cs = [cnts.get(d, 0) for d in range(d0, d1 + 1)]
        n, s, ss = len(cs), sum(cs), sum(c * c for c in cs)
        vmr6 = (n * ss - s * s) * 1_000_000 // (n * s)
        want[et] = (n, s, vmr6, vmr6 > 1_000_000)
    got = {
        r["event_type"]: (r["n_days"], r["total"], r["vmr6"], r["overdispersed"])
        for r in q_dispersion_index(spark, sf_dir).collect()
    }
    assert got == want


def test_seasonal_strength_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.analytics import q_seasonal_strength

    per = _daily(sf_dir)
    total = Counter()
    for cnts in per.values():
        total.update(cnts)
    d0, d1 = min(total), max(total)
    cs = [(d % 7, total.get(d, 0)) for d in range(d0, d1 + 1)]
    dows = defaultdict(list)
    for dow, c in cs:
        dows[dow].append(c)
    ssr12 = 0
    want_rows = {}
    for dow, vs in dows.items():
        n_d, s_d = len(vs), sum(vs)
        ss_d = sum(v * v for v in vs)
        ssr12_d = math.floor((n_d * ss_d - s_d * s_d) / n_d * 1e6 + 0.5)
        ssr12 += ssr12_d
        want_rows[dow] = (n_d, s_d * 1_000_000 // n_d)
    n = len(cs)
    s = sum(c for _, c in cs)
    ss = sum(c * c for _, c in cs)
    sst12 = math.floor((n * ss - s * s) / n * 1e6 + 0.5)
    strength6 = max(math.floor((1.0 - ssr12 / sst12) * 1e6 + 0.5), 0)
    rows = q_seasonal_strength(spark, sf_dir).collect()
    got = {r["dow"]: (r["n_d"], r["dow_mean6"]) for r in rows}
    assert got == want_rows
    assert all(r["strength6"] == strength6 for r in rows)
    assert 0 <= strength6 <= 1_000_000


def test_naive_bayes_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.text import _NB_TEST_MOD, q_naive_bayes_langid

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )
    train_tok = defaultdict(Counter)
    d_l = Counter()
    vocab = set()
    tests = []
    for did, lang, text in zip(
        t["doc_id"].to_pylist(), t["lang"].to_pylist(), t["text"].to_pylist()
    ):
        toks = text.split(" ")
        if did % _NB_TEST_MOD == 0:
            tests.append((did, lang, toks))
        else:
            train_tok[lang].update(toks)
            d_l[lang] += 1
            vocab.update(toks)
    v = len(vocab)
    d_all = sum(d_l.values())
    langs = sorted(d_l)
    prior6 = {
        lg: math.floor(math.log(d_l[lg] / d_all) * 1e6 + 0.5) for lg in langs
    }
    t_l = {lg: sum(train_tok[lg].values()) for lg in langs}
    ll6 = {
        (lg, tok): math.floor(math.log((c + 1) / (t_l[lg] + v)) * 1e6 + 0.5)
        for lg in langs
        for tok, c in train_tok[lg].items()
    }
    unseen6 = {
        lg: math.floor(math.log(1.0 / (t_l[lg] + v)) * 1e6 + 0.5) for lg in langs
    }
    conf = Counter()
    for did, true_lang, toks in tests:
        best = None
        for lg in langs:
            score = prior6[lg] + sum(
                ll6.get((lg, tok), unseen6[lg]) for tok in toks
            )
            cand = (-score, lg)
            if best is None or cand < best:
                best = cand
        conf[(true_lang, best[1])] += 1
    got = {
        (r["true_lang"], r["pred_lang"]): r["n"]
        for r in q_naive_bayes_langid(spark, sf_dir).collect()
    }
    assert got == dict(conf)
    # the classifier must beat random on this separable fixture
    correct = sum(n for (a, b), n in conf.items() if a == b)
    total = sum(conf.values())
    assert correct * len(langs) > total


def test_rake_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.text import (
        _RAKE_TOPK,
        _TEXTRANK_MIN_LEN,
        q_rake_keyphrases,
    )

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    phrases = []
    for text in t["text"].to_pylist():
        run = []
        for tok in text.split(" ") + [""]:
            if len(tok) >= _TEXTRANK_MIN_LEN:
                run.append(tok)
            elif run:
                phrases.append(tuple(run))
                run = []
    freq = Counter()
    deg = Counter()
    for ph in phrases:
        for w in ph:
            freq[w] += 1
            deg[w] += len(ph)
    ws6 = {w: deg[w] * 1_000_000 // freq[w] for w in freq}
    scored = Counter()
    meta = {}
    for ph in phrases:
        s = " ".join(ph)
        scored[s] += 1
        meta[s] = (len(ph), sum(ws6[w] for w in ph))
    ranked = sorted(meta.items(), key=lambda kv: (-kv[1][1], kv[0]))[:_RAKE_TOPK]
    want = [
        (s, n_words, score, scored[s]) for s, (n_words, score) in ranked
    ]
    got = [
        (r["phrase"], r["n_words"], r["score6"], r["n_occurrences"])
        for r in q_rake_keyphrases(spark, sf_dir).collect()
    ]
    assert got == want
