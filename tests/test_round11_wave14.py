"""Property pins for the round-11 wave-14 operators (Hodges-Lehmann,
sliding distinct users, sorted-neighborhood pairs, file-source
round-trip)."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import pyarrow.parquet as pq


def test_hodges_lehmann_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.stats import _HL_SAMPLE, q_hodges_lehmann

    t = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_type", "event_id", "value"]
    )
    per = defaultdict(list)
    for et, eid, v in zip(
        t["event_type"].to_pylist(), t["event_id"].to_pylist(), t["value"].to_pylist()
    ):
        per[et].append((hashlib.md5(str(eid).encode()).hexdigest(), eid, v))
    want = {}
    for et, rows in per.items():
        rows.sort()
        samp = [math.floor(v * 1e6 + 0.5) for _, _, v in rows[:_HL_SAMPLE]]
        sums = sorted(
            samp[i] + samp[j]
            for i in range(len(samp))
            for j in range(i, len(samp))
        )
        want[et] = (len(samp), len(sums), sums[(len(sums) + 1) // 2 - 1])
    got = {
        r["event_type"]: (r["n_sample"], r["n_pairs"], r["hl_x2_6"])
        for r in q_hodges_lehmann(spark, sf_dir).collect()
    }
    assert got == want
    # HL (doubled) lies within twice the sample range
    for et, (_, _, hl2) in want.items():
        vs = sorted(math.floor(v * 1e6 + 0.5) for _, _, v in sorted(per[et])[:_HL_SAMPLE])
        assert 2 * vs[0] <= hl2 <= 2 * vs[-1]


def test_sliding_distinct_users_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.analytics import _SLIDE_W, q_sliding_distinct_users

    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    ud = defaultdict(set)
    for uid, ts in zip(t["user_id"].to_pylist(), t["ts"].to_pylist()):
        ud[math.floor(math.floor(ts.timestamp()) / 86400)].add(uid)
    d0, d1 = min(ud), max(ud)
    want = {}
    for d in range(d0, d1 + 1):
        wau = set()
        for x in range(d - _SLIDE_W + 1, d + 1):
            wau |= ud.get(x, set())
        dau = len(ud.get(d, set()))
        want[d] = (dau, len(wau), dau * 1_000_000 // len(wau) if wau else 0)
    got = {
        r["day"]: (r["dau"], r["wau"], r["stickiness6"])
        for r in q_sliding_distinct_users(spark, sf_dir).collect()
    }
    assert got == want
    # WAU dominates DAU pointwise
    assert all(w >= d for d, w, _ in want.values())


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_sorted_neighborhood_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.dedup import (
        _ER_LEV_MAX,
        _SNM_W,
        q_sorted_neighborhood_pairs,
    )

    t = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey"],
    )
    per = defaultdict(list)
    for ck, name, nk in zip(
        t["c_custkey"].to_pylist(), t["c_name"].to_pylist(), t["c_nationkey"].to_pylist()
    ):
        per[nk].append((name, ck))
    want = {}
    for nk, rows in per.items():
        rows.sort()
        n_pairs = n_matches = 0
        min_lev = None
        for i, (name, _) in enumerate(rows):
            for k in range(1, _SNM_W + 1):
                if i + k >= len(rows):
                    break
                lev = _lev(name, rows[i + k][0])
                n_pairs += 1
                n_matches += 1 if lev <= _ER_LEV_MAX else 0
                min_lev = lev if min_lev is None else min(min_lev, lev)
        want[nk] = (len(rows), n_pairs, n_matches, min_lev)
    got = {
        r["c_nationkey"]: (r["n_customers"], r["n_pairs"], r["n_matches"], r["min_lev"])
        for r in q_sorted_neighborhood_pairs(spark, sf_dir).collect()
    }
    assert got == want
    # sorted-neighborhood candidate count is the promised O(n·w) bound
    assert all(p <= n * _SNM_W for n, p, _, _ in want.values())


def test_file_source_roundtrip_lossless(spark, sf_dir):
    from gasket_rs_spark.operators.warehouse import q_file_source_roundtrip

    rows = q_file_source_roundtrip(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert (r["n_csv"], r["chars_csv"], r["md5sum_csv"]) == (
            r["n_json"],
            r["chars_json"],
            r["md5sum_json"],
        )
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["lang"])
    from collections import Counter

    want_n = Counter(t["lang"].to_pylist())
    assert {r["lang"]: r["n_csv"] for r in rows} == dict(want_n)
