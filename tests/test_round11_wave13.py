"""Property pins for the round-11 wave-13 operators (lead-lag xcorr,
top-k leaderboard churn, WoE/IV binning, embedding MMD)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq


def _daily_counts(sf_dir):
    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])
    days = defaultdict(Counter)
    for et, ts in zip(t["event_type"].to_pylist(), t["ts"].to_pylist()):
        days[math.floor(math.floor(ts.timestamp()) / 86400)][et] += 1
    return days


def test_lead_lag_xcorr_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.analytics import (
        _XCORR_A,
        _XCORR_B,
        _XCORR_MAX_LAG,
        q_lead_lag_xcorr,
    )

    days = _daily_counts(sf_dir)
    d0, d1 = min(days), max(days)
    grid = list(range(d0, d1 + 1))
    ca = [days[d][_XCORR_A] for d in grid]
    cb = [days[d][_XCORR_B] for d in grid]
    n, sa, sb = len(grid), sum(ca), sum(cb)
    ya = [n * c - sa for c in ca]
    yb = [n * c - sb for c in cb]
    want = {}
    for lag in range(-_XCORR_MAX_LAG, _XCORR_MAX_LAG + 1):
        num, cnt = 0, 0
        for i in range(n):
            j = i + lag
            if 0 <= j < n:
                num += ya[i] * yb[j]
                cnt += 1
        want[lag] = (cnt, num)
    got = {
        r["lag"]: (r["n_overlap"], r["xcov_num"])
        for r in q_lead_lag_xcorr(spark, sf_dir).collect()
    }
    assert got == want


def test_topk_churn_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.analytics import _CHURN_TOPK, q_topk_churn

    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    wk = defaultdict(Counter)
    for uid, ts in zip(t["user_id"].to_pylist(), t["ts"].to_pylist()):
        wk[math.floor(math.floor(ts.timestamp()) / 604800)][uid] += 1
    tops = {
        w: {u for u, _ in sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:_CHURN_TOPK]}
        for w, c in wk.items()
    }
    want = {}
    for w in sorted(tops):
        if w - 1 not in tops:
            continue
        now, prev = tops[w], tops[w - 1]
        stay = len(now & prev)
        want[w] = (
            len(now),
            len(prev),
            stay,
            len(now) - stay,
            len(prev) - stay,
            stay * 1_000_000 // (len(now) + len(prev) - stay),
        )
    got = {
        r["week"]: (
            r["k_now"],
            r["k_prev"],
            r["n_stayed"],
            r["n_new"],
            r["n_dropped"],
            r["jaccard6"],
        )
        for r in q_topk_churn(spark, sf_dir).collect()
    }
    assert got == want


def test_woe_iv_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.analytics import _PSI_B, _PSI_W, q_woe_iv_binning

    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    good = [0] * _PSI_B
    bad = [0] * _PSI_B
    for et, v in zip(t["event_type"].to_pylist(), t["value"].to_pylist()):
        b = min(int(math.floor(v / _PSI_W)), _PSI_B - 1)
        (good if et == "purchase" else bad)[b] += 1
    ng, nb = sum(good), sum(bad)
    iv12 = 0
    want = {}
    for b in range(_PSI_B):
        diff6 = math.floor(
            ((good[b] + 1) / (ng + _PSI_B) - (bad[b] + 1) / (nb + _PSI_B)) * 1e6
            + 0.5
        )
        woe6 = math.floor(
            math.log(((good[b] + 1) * (nb + _PSI_B)) / ((bad[b] + 1) * (ng + _PSI_B)))
            * 1e6
            + 0.5
        )
        want[b] = (good[b], bad[b], diff6, woe6, diff6 * woe6)
        iv12 += diff6 * woe6
    rows = q_woe_iv_binning(spark, sf_dir).collect()
    got = {
        r["b"]: (r["good_n"], r["bad_n"], r["diff6"], r["woe6"], r["iv_contrib12"])
        for r in rows
    }
    assert got == want
    assert all(r["iv12"] == iv12 for r in rows)
    # IV contributions are non-negative (diff and WoE share sign)
    assert all(c >= 0 for *_, c in want.values())


def test_embedding_mmd_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.similarity import (
        _MMD_LABEL_A,
        _MMD_LABEL_B,
        q_embedding_mmd_labels,
    )

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"])
    sa = None
    sb = None
    na = nb = 0
    for lbl, emb in zip(t["label"].to_pylist(), t["embedding"].to_pylist()):
        if lbl not in (_MMD_LABEL_A, _MMD_LABEL_B):
            continue
        v6 = [math.floor(float(x) * 1e6 + 0.5) for x in emb]
        if sa is None:
            sa = [0] * len(v6)
            sb = [0] * len(v6)
        if lbl == _MMD_LABEL_A:
            na += 1
            for i, v in enumerate(v6):
                sa[i] += v
        else:
            nb += 1
            for i, v in enumerate(v6):
                sb[i] += v
    want = {}
    mmd12 = 0
    for d in range(len(sa)):
        gap = sa[d] * nb - sb[d] * na
        q = gap / (na * nb)
        sq = math.floor(q * q + 0.5)
        want[d] = (gap, sq)
        mmd12 += sq
    rows = q_embedding_mmd_labels(spark, sf_dir).collect()
    got = {r["dim"]: (r["gap_num"], r["gap_sq12"]) for r in rows}
    assert got == want
    assert all(r["mmd12"] == mmd12 for r in rows)
