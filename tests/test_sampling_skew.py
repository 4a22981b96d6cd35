"""Pins for the salted-join rewrite and the per-group reservoir sample
(the EXACT value checks live in their oracle twins)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gasket_rs_spark.operators.skew import salted_join
from gasket_rs_spark.operators.stats import _RESERVOIR_K, q_reservoir_sample_grouped
from gasket_rs_spark.tables import load


def test_salted_join_row_identical_to_plain_join(spark, sf_dir):
    events = load(spark, sf_dir, "events")
    dim = events.select("event_type").distinct().withColumn(
        "weight", F.length("event_type").cast("double")
    )
    salted = salted_join(events, dim, "event_type", "event_id")
    plain = events.join(dim, "event_type")
    # row-level multiset identity, not just aggregates
    assert salted.count() == plain.count()
    key = ["event_id", "event_type", "weight"]
    assert salted.select(*key).exceptAll(plain.select(*key)).count() == 0
    assert plain.select(*key).exceptAll(salted.select(*key)).count() == 0


def test_reservoir_exact_k_per_group(spark, sf_dir):
    sample = q_reservoir_sample_grouped(spark, sf_dir)
    sizes = {
        r.lang: r.n for r in sample.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    group_sizes = {
        r.lang: r.n
        for r in load(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(sizes) == set(group_sizes)
    for lang, n in sizes.items():
        assert n == min(_RESERVOIR_K, group_sizes[lang])


def test_embedding_covariance_diagonal_nonnegative(spark, sf_dir):
    """Variance cells (i == j) must be >= 0 and the mapInPandas Gram path
    must agree with a direct JVM recomputation on the means."""
    from gasket_rs_spark.operators.similarity import q_embedding_covariance

    rows = q_embedding_covariance(spark, sf_dir).collect()
    assert len(rows) == 64 * 65 // 2
    for r in rows:
        assert r.j >= r.i
        if r.i == r.j:
            assert r.cov >= 0.0, f"negative variance at dim {r.i}"


def test_fuzzy_join_blocking_is_complete(spark, sf_dir):
    """Every brute-force edit-distance-<=1 pair must be found by the
    deletion-neighborhood blocking — including substitution, insertion,
    deletion, and identity — and dist-2 pairs must be excluded."""
    from gasket_rs_spark.operators.dedup import q_fuzzy_vocab_join

    rows = q_fuzzy_vocab_join(spark, sf_dir).collect()
    assert rows, "witness must be non-vacuous"
    dists = {r.dist for r in rows}
    assert dists <= {0, 1}
    assert 1 in dists, "planted typos must produce dist-1 pairs"
    # spot-check the planted construction: tok_b = tok_a minus 2nd char
    planted = [r for r in rows if len(r.tok_b) == len(r.tok_a) - 1]
    assert planted, "deletion-shaped pairs must be present"
    for r in planted[:20]:
        assert r.tok_b == r.tok_a[0] + r.tok_a[2:] or r.dist == 1


def test_doremi_matches_pure_python_fixpoint(spark, sf_dir):
    """Re-derive the DoReMi multiplicative-weights iteration in pure
    Python (math.log/exp + the same snap grids and integer-unit
    normalizing sums) from the raw per-domain stats and require exact
    equality with the Spark plan — pins the iteration semantics
    (step count, smoothing, snap spellings) independently of the
    unrolled-CTE oracle, plus the invariants hashes can't see:
    weights ~sum to 1 and are monotone in excess loss."""
    import math

    from gasket_rs_spark.operators.stats import (
        _DOREMI_C,
        _DOREMI_ETA,
        _DOREMI_T,
        q_domain_reweight_doremi,
    )

    docs = load(spark, sf_dir, "documents")
    stats = {
        r["source"]: (r["n"], r["sc"])
        for r in docs.groupBy("source")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("sc"))
        .collect()
    }
    g_n = sum(n for n, _ in stats.values())
    g_sum = sum(sc for _, sc in stats.values())
    k = len(stats)
    snap6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
    snap9 = lambda x: math.floor(x * 1e9 + 0.5) / 1e9  # noqa: E731
    lam = {
        src: snap6(max(0.0, math.log(sc / n) - math.log(g_sum / g_n)))
        for src, (n, sc) in stats.items()
    }
    e = {src: snap6(math.exp(_DOREMI_ETA * v)) for src, v in lam.items()}
    w = {src: snap9(1.0 / k) for src in stats}
    for _ in range(_DOREMI_T):
        s = {src: math.floor(w[src] * e[src] * 1e9 + 0.5) for src in stats}
        z = sum(s.values())
        w = {
            src: snap9((1.0 - _DOREMI_C) * (s[src] / z) + _DOREMI_C / k)
            for src in stats
        }

    got = {
        r["source"]: (r["n_docs"], r["excess_loss"], r["weight"])
        for r in q_domain_reweight_doremi(spark, sf_dir).collect()
    }
    want = {src: (stats[src][0], lam[src], w[src]) for src in stats}
    assert got == want

    total = sum(v for _, _, v in got.values())
    assert abs(total - 1.0) < k * 2e-9  # snap rounding only
    ranked = sorted(got.values(), key=lambda t: t[1])
    for (_, l1, w1), (_, l2, w2) in zip(ranked, ranked[1:]):
        assert (l2 - l1 >= 0) and (w2 - w1 >= -2e-9)  # monotone in excess


def test_span_corruption_checksum_matches_pure_python(spark, sf_dir):
    """Recompute each doc's span-start checksum from hashlib.md5 — pins
    the deterministic corruption layout (block arithmetic + md5 offset)
    against an engine-independent reference, plus the T5 accounting
    identities and the 15% rate bound."""
    import hashlib

    from gasket_rs_spark.operators.stats import (
        _SPANC_BLOCK,
        _SPANC_LEN,
        q_span_corruption_plan,
    )

    rows = q_span_corruption_plan(spark, sf_dir).collect()
    assert rows
    for r in rows:
        want = 0
        for b in range(r["n_spans"]):
            h = hashlib.md5(f"{r['doc_id']}:{b}".encode()).hexdigest()
            want += b * _SPANC_BLOCK + int(h[:8], 16) % (
                _SPANC_BLOCK - _SPANC_LEN + 1
            )
        assert r["span_start_checksum"] == want
        assert r["input_len"] == r["n_tokens"] - r["n_spans"] * _SPANC_LEN + r["n_spans"]
        assert r["target_len"] == r["n_spans"] * _SPANC_LEN + r["n_spans"] + 1
        rate = r["n_spans"] * _SPANC_LEN / r["n_tokens"]
        assert rate <= _SPANC_LEN / _SPANC_BLOCK + 1e-9


def test_domain_ablation_complements_per_domain_stats(spark, sf_dir):
    """ablated(d) + own(d) must equal the corpus total for every
    additive statistic — the subtraction identity that lets k ablations
    ride one corpus pass."""
    from gasket_rs_spark.operators.stats import q_domain_ablation_stats
    from gasket_rs_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    own = {
        r["source"]: (r["d"], r["t"], r["c"])
        for r in docs.groupBy("source")
        .agg(
            F.count("*").alias("d"),
            F.sum(F.size(F.split("text", " "))).alias("t"),
            F.sum("n_chars").alias("c"),
        )
        .collect()
    }
    totals = tuple(sum(v[i] for v in own.values()) for i in range(3))
    for r in q_domain_ablation_stats(spark, sf_dir).collect():
        o = own[r["source"]]
        assert (
            r["ablated_docs"] + o[0],
            r["ablated_tokens"] + o[1],
            r["ablated_chars"] + o[2],
        ) == totals


def test_temperature_sweep_monotone_flattening(spark, sf_dir):
    """Physics of temperature sampling the hash can't see: as alpha
    decreases toward 0 the mixture flattens — effective domain count is
    non-increasing in alpha and max weight non-decreasing; at every
    alpha, 1 <= effective_domains <= n_domains and max_weight >= 1/k."""
    from gasket_rs_spark.operators.stats import q_temperature_sweep

    rows = sorted(q_temperature_sweep(spark, sf_dir).collect(),
                  key=lambda r: r["alpha"])
    assert len(rows) == 10
    for r in rows:
        k = r["n_domains"]
        assert 1.0 - 1e-6 <= r["effective_domains"] <= k + 1e-6
        assert r["max_weight"] >= 1.0 / k - 1e-6
    for a, b in zip(rows, rows[1:]):  # alpha ascending
        assert b["effective_domains"] <= a["effective_domains"] + 1e-6
        assert b["max_weight"] >= a["max_weight"] - 1e-6


def test_auc_exact_matches_rank_formula(spark, sf_dir):
    """Recompute AUC with the classic midrank Mann-Whitney formula in
    pure Python and require equality with the histogram/theta-join
    formulation (up to the 1e-6 snap)."""
    from gasket_rs_spark.operators.stats import q_auc_exact
    from gasket_rs_spark.tables import load

    rows = load(spark, sf_dir, "documents").select("n_chars", "lang").collect()
    pairs = sorted((r["n_chars"], r["lang"] == "en") for r in rows)
    n = len(pairs)
    # midranks
    ranks = [0.0] * n
    i = 0
    while i < n:
        j = i
        while j < n and pairs[j][0] == pairs[i][0]:
            j += 1
        mid = (i + 1 + j) / 2.0
        for t in range(i, j):
            ranks[t] = mid
        i = j
    npos = sum(1 for _, p in pairs if p)
    nneg = n - npos
    rpos = sum(r for r, (_, p) in zip(ranks, pairs) if p)
    want = (rpos - npos * (npos + 1) / 2.0) / (npos * nneg)
    got = q_auc_exact(spark, sf_dir).first()
    assert got["n_pos"] == npos and got["n_neg"] == nneg
    assert abs(got["auc"] - want) < 2e-6


def test_ks_two_sample_matches_pure_python(spark, sf_dir):
    """Recompute the KS sup-gap over sorted empirical CDFs in pure
    Python and require equality (to the snap) — plus the A/A sanity:
    KS of a sample against itself is 0."""
    from gasket_rs_spark.operators.stats import q_ks_two_sample
    from gasket_rs_spark.tables import load

    rows = load(spark, sf_dir, "documents").select("n_chars", "lang").collect()
    a = sorted(r["n_chars"] for r in rows if r["lang"] == "en")
    b = sorted(r["n_chars"] for r in rows if r["lang"] != "en")
    values = sorted(set(a) | set(b))
    import bisect

    d = max(
        abs(bisect.bisect_right(a, v) / len(a) - bisect.bisect_right(b, v) / len(b))
        for v in values
    )
    got = q_ks_two_sample(spark, sf_dir).first()
    assert got["na"] == len(a) and got["nb"] == len(b)
    assert abs(got["ks_stat"] - d) < 2e-6
    assert got["reject_h0"] == (got["ks_stat"] > got["reject_threshold"])


def test_neyman_allocation_sums_to_budget_and_matches_python(spark, sf_dir):
    import math
    from collections import defaultdict

    from gasket_rs_spark.operators.stats import _NEYMAN_B, q_neyman_allocation
    from gasket_rs_spark.tables import load

    rows = q_neyman_allocation(spark, sf_dir).collect()
    assert sum(r.alloc for r in rows) == _NEYMAN_B  # Hamilton: exact budget
    # independent reference
    xs = defaultdict(list)
    for d in load(spark, sf_dir, "documents").select("lang", "text").collect():
        xs[d.lang].append(len(d.text.split(" ")))
    s6 = {
        lang: int(
            math.floor(
                math.sqrt(len(v) * sum(x * x for x in v) - sum(v) ** 2) * 1e6 + 0.5
            )
        )
        for lang, v in xs.items()
    }
    stot = sum(s6.values())
    floor_alloc = {k: _NEYMAN_B * v // stot for k, v in s6.items()}
    rem = {k: _NEYMAN_B * s6[k] - floor_alloc[k] * stot for k in s6}
    deficit = _NEYMAN_B - sum(floor_alloc.values())
    order = sorted(s6, key=lambda k: (-rem[k], k))
    expected = {
        k: floor_alloc[k] + (1 if order.index(k) < deficit else 0) for k in s6
    }
    got = {r.lang: r.alloc for r in rows}
    assert got == expected
    assert {r.lang: r.s6 for r in rows} == s6
    # Neyman dominates: the highest N*sigma stratum gets the most seats
    top = max(s6, key=lambda k: (s6[k], k))
    assert got[top] == max(got.values())
