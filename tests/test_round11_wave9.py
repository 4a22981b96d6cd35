"""Property pins for the round-11 wave-9 operators (bitwise aggregates,
entity resolution, isotonic calibration, Bradley-Terry)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from fractions import Fraction

import pyarrow.parquet as pq


def test_agg_bitwise_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.relational import q_agg_bitwise

    t = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_totalprice", "o_orderstatus", "o_custkey"],
    )
    per = defaultdict(list)
    for pr, tp, st, ck in zip(
        t["o_orderpriority"].to_pylist(),
        t["o_totalprice"].to_pylist(),
        t["o_orderstatus"].to_pylist(),
        t["o_custkey"].to_pylist(),
    ):
        flags = (1 if tp > 100000 else 0) + (2 if st == "F" else 0) + (
            4 if ck % 2 == 0 else 0
        )
        per[pr].append((flags, tp > 1000))
    want = {}
    for pr, rows in per.items():
        fa, fo, fx = ~0, 0, 0
        for f, _ in rows:
            fa &= f
            fo |= f
            fx ^= f
        want[pr] = (
            len(rows),
            fa,
            fo,
            fx,
            all(p for _, p in rows),
            any(p for _, p in rows),
        )
    got = {
        r["o_orderpriority"]: (
            r["n"],
            r["flags_and"],
            r["flags_or"],
            r["flags_xor"],
            r["all_pricey"],
            r["any_pricey"],
        )
        for r in q_agg_bitwise(spark, sf_dir).collect()
    }
    assert got == want


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_entity_resolution_levenshtein_semantics(spark, sf_dir):
    """Pin that Spark's levenshtein == textbook edit distance on pairs
    shaped like the fixture names (the cross-engine agreement the EXACT
    oracle then extends to DuckDB)."""
    from pyspark.sql import functions as F

    pairs = [
        ("Customer#000000001", "Customer#000000011"),
        ("Customer#000000123", "Customer#000000321"),
        ("Customer#000000042", "Customer#000000042"),
        ("abc", "yabd"),
    ]
    df = spark.createDataFrame(pairs, ["a", "b"]).select(
        "a", "b", F.levenshtein("a", "b").alias("lev")
    )
    for r in df.collect():
        assert r["lev"] == _lev(r["a"], r["b"])


def test_entity_resolution_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.dedup import _ER_LEV_MAX, q_entity_resolution

    t = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey", "c_mktsegment"],
    )
    rows = sorted(
        zip(
            t["c_custkey"].to_pylist(),
            t["c_name"].to_pylist(),
            t["c_nationkey"].to_pylist(),
            t["c_mktsegment"].to_pylist(),
        )
    )
    blocks = defaultdict(list)
    for ck, name, nk, seg in rows:
        blocks[(nk, seg)].append(name)
    n_pairs = Counter()
    n_matches = Counter()
    for (nk, seg), names in blocks.items():
        for i in range(len(names)):
            for j in range(i + 1, len(names)):
                n_pairs[seg] += 1
                if _lev(names[i], names[j]) <= _ER_LEV_MAX:
                    n_matches[seg] += 1
    got = {r["segment"]: (r["n_pairs"], r["n_matches"]) for r in
           q_entity_resolution(spark, sf_dir).collect()}
    assert got == {s: (n_pairs[s], n_matches[s]) for s in n_pairs}


def _stack_pav(buckets):
    """Textbook stack PAV over (cnt, pos) buckets with exact Fraction
    means; returns the fitted mean per bucket."""
    stack = []  # (pos_sum, cnt_sum, width)
    for cnt, pos in buckets:
        stack.append([pos, cnt, 1])
        while len(stack) > 1 and Fraction(stack[-2][0], stack[-2][1]) >= Fraction(
            stack[-1][0], stack[-1][1]
        ):
            p, c, w = stack.pop()
            stack[-1][0] += p
            stack[-1][1] += c
            stack[-1][2] += w
        # strictly: merge while previous mean >= current mean
    out = []
    for p, c, w in stack:
        out.extend([Fraction(p, c)] * w)
    return out


def test_isotonic_equals_fraction_stack_pav(spark, sf_dir):
    from gasket_rs_spark.operators.stats import (
        _ISO_B,
        _ISO_BUCKET_W,
        q_isotonic_calibration,
    )

    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["value", "event_type"])
    agg = defaultdict(lambda: [0, 0])
    for v, et in zip(t["value"].to_pylist(), t["event_type"].to_pylist()):
        b = min(int(math.floor(v / _ISO_BUCKET_W)), _ISO_B - 1)
        agg[b][0] += 1
        agg[b][1] += 1 if et == "purchase" else 0
    order = sorted(agg)
    fit = _stack_pav([(agg[b][0], agg[b][1]) for b in order])
    want = {
        b: math.floor(f * 1_000_000) for b, f in zip(order, fit)
    }  # floor commutes with the PAV minimax
    got = {r["bucket"]: r["iso6"] for r in
           q_isotonic_calibration(spark, sf_dir).collect()}
    assert got == want
    # monotone non-decreasing in the bucket order
    vals = [got[b] for b in order]
    assert vals == sorted(vals)


def test_bradley_terry_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.stats import _BT_T, q_bradley_terry

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["lang", "source", "n_chars"]
    )
    agg = defaultdict(lambda: [0, 0])
    for lang, src, nc in zip(
        t["lang"].to_pylist(), t["source"].to_pylist(), t["n_chars"].to_pylist()
    ):
        agg[(lang, src)][0] += nc
        agg[(lang, src)][1] += 1
    m6 = {k: s * 1_000_000 // n for k, (s, n) in agg.items()}
    langs = sorted({k[0] for k in m6})
    wins = Counter()
    games = Counter()
    for lang in langs:
        srcs = sorted({k[1] for k in m6 if k[0] == lang})
        for i, a in enumerate(srcs):
            for b in srcs[i + 1:]:
                if m6[(lang, a)] == m6[(lang, b)]:
                    continue
                w, l = (a, b) if m6[(lang, a)] > m6[(lang, b)] else (b, a)
                wins[w] += 1
                games[(w, l)] += 1
                games[(l, w)] += 1
    universe = sorted({i for i, _ in games})
    k = len(universe)
    pi = {s: 1_000_000 for s in universe}
    for _ in range(_BT_T):
        s = {
            i: sum(
                n * 10**12 // (pi[i] + pi[j])
                for (gi, j), n in games.items()
                if gi == i
            )
            for i in universe
        }
        raw = {i: wins[i] * 10**12 // s[i] for i in universe}
        tot = sum(raw.values())
        pi = {i: max(raw[i] * k * 1_000_000 // tot, 1) for i in universe}
    got = {r["source"]: (r["n_wins"], r["n_games"], r["bt6"]) for r in
           q_bradley_terry(spark, sf_dir).collect()}
    want = {
        i: (wins[i], sum(n for (gi, _), n in games.items() if gi == i), pi[i])
        for i in universe
    }
    assert got == want
