"""Error-bound pins for the mergeable-sketch operators: a sketch that
"runs" but estimates garbage would pass a rows-only driver check, so the
bound versus the exact answer is asserted here (same policy as the
approx_count_distinct / approx_percentiles pins in test_approx_bounds)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gasket_rs_spark.operators.sketches import (
    q_sketch_hll_distinct,
    q_sketch_theta_overlap,
)
from gasket_rs_spark.tables import load


def _exact_distinct_tokens(spark, sf_dir, where=None):
    toks = (
        load(spark, sf_dir, "documents")
        .select("lang", "source", F.explode(F.split("text", " ")).alias("tok"))
    )
    if where is not None:
        toks = toks.where(where)
    return toks


def test_hll_distinct_within_rse(spark, sf_dir):
    est = {r["lang"]: r["est_distinct"] for r in q_sketch_hll_distinct(spark, sf_dir).collect()}
    toks = _exact_distinct_tokens(spark, sf_dir)
    exact_rows = toks.groupBy("lang").agg(F.countDistinct("tok").alias("n")).collect()
    exact = {r["lang"]: r["n"] for r in exact_rows}
    exact["ALL"] = toks.select("tok").distinct().count()
    assert set(est) == set(exact)
    for lang, n in exact.items():
        # lgConfigK=12 → RSE ≈ 1.04/√2¹² ≈ 1.6%; allow 3σ ≈ 5%.
        assert abs(est[lang] - n) <= max(0.05 * n, 2), (lang, est[lang], n)
    # merged estimate must equal the sketch-union, not a token rescan:
    # its value is consistent with the per-lang sketches by construction,
    # so just pin it against the exact global too (done above via "ALL").


def test_exact_distinct_plumbing_cross_engine(spark, sf_dir):
    """VERDICT r14 #5: the HLL estimate stays rows-only, but the plumbing
    it rides — tokenization (split on ' '), per-lang grouping, the
    merged-ALL rollup — gets a driver-hash-style EXACT cross-engine
    check without registry growth: exact distinct-token counts on the
    SAME grouping must match DuckDB bit-for-bit (the split(text,' ') /
    string_split(text,' ') pairing is the one every text oracle uses)."""
    import duckdb

    toks = _exact_distinct_tokens(spark, sf_dir)
    spark_exact = {
        r["lang"]: r["n"]
        for r in toks.groupBy("lang")
        .agg(F.countDistinct("tok").alias("n"))
        .collect()
    }
    spark_exact["ALL"] = toks.select("tok").distinct().count()
    con = duckdb.connect()
    duck_rows = con.execute(
        f"""
        WITH toks AS (
          SELECT lang, unnest(string_split(text, ' ')) AS tok
          FROM read_parquet('{sf_dir}/documents.parquet')
        )
        SELECT lang, CAST(count(DISTINCT tok) AS BIGINT) AS n
        FROM toks GROUP BY lang
        UNION ALL
        SELECT 'ALL', CAST(count(DISTINCT tok) AS BIGINT) FROM toks
        """
    ).fetchall()
    assert spark_exact == dict(duck_rows)
    # and the rows-only witness rides exactly this grouping
    witness_groups = {
        r["lang"] for r in q_sketch_hll_distinct(spark, sf_dir).collect()
    }
    assert witness_groups == set(spark_exact)


def test_exact_set_algebra_plumbing_cross_engine(spark, sf_dir):
    """r15 extension of the VERDICT r14 #5 discipline: the Theta-sketch
    estimates stay rows-only, but the set algebra they approximate —
    |A ∪ B|, |A ∩ B|, |A \\ B| over the two sources' distinct token
    sets, on the witness's own filter + tokenization — is computed
    exactly on both engines (per-token membership flags folded to
    int64 counts) and must match bit-for-bit."""
    import duckdb

    toks = _exact_distinct_tokens(
        spark, sf_dir, where=F.col("source").isin("src0", "src1")
    )
    per = toks.groupBy("tok").agg(
        F.max((F.col("source") == "src0").cast("int")).alias("a"),
        F.max((F.col("source") == "src1").cast("int")).alias("b"),
    )
    got = per.agg(
        F.count("*").alias("n_union"),
        F.sum(
            F.when((F.col("a") == 1) & (F.col("b") == 1), 1).otherwise(0)
        ).alias("n_inter"),
        F.sum(
            F.when((F.col("a") == 1) & (F.col("b") == 0), 1).otherwise(0)
        ).alias("n_a_only"),
    ).collect()[0]
    con = duckdb.connect()
    want = con.execute(
        f"""
        WITH toks AS (
          SELECT source, unnest(string_split(text, ' ')) AS tok
          FROM read_parquet('{sf_dir}/documents.parquet')
          WHERE source IN ('src0', 'src1')
        ), per AS (
          SELECT tok,
                 max(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS a,
                 max(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS b
          FROM toks GROUP BY tok
        )
        SELECT CAST(count(*) AS BIGINT) AS n_union,
               CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_inter,
               CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_a_only
        FROM per
        """
    ).fetchone()
    assert (got["n_union"], got["n_inter"], got["n_a_only"]) == want
    # inclusion-exclusion consistency of the exact counts themselves
    assert got["n_union"] >= got["n_inter"] + got["n_a_only"]


def test_hll_merge_is_batch_invariant(spark, sf_dir):
    """The property that makes sketches the incremental-ingest path: the
    union of per-batch sketches must estimate EXACTLY what a single
    whole-corpus sketch estimates (HLL merge is lossless w.r.t. register
    state — not just 'close'). If this drifted, stored per-day sketches
    could not stand in for a rescan."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        (F.col("doc_id") % 3).alias("batch"), F.explode(F.split("text", " ")).alias("tok")
    )
    whole = toks.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("tok", F.lit(12))).alias("est")
    ).collect()[0]["est"]
    merged = (
        toks.groupBy("batch")
        .agg(F.hll_sketch_agg("tok", F.lit(12)).alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]["est"]
    )
    assert merged == whole, (merged, whole)


def test_theta_overlap_within_error(spark, sf_dir):
    row = q_sketch_theta_overlap(spark, sf_dir).collect()[0]
    toks = _exact_distinct_tokens(spark, sf_dir, F.col("source").isin("src0", "src1"))
    a = {r["tok"] for r in toks.where(F.col("source") == "src0").select("tok").distinct().collect()}
    b = {r["tok"] for r in toks.where(F.col("source") == "src1").select("tok").distinct().collect()}
    exact = {
        "est_union": len(a | b),
        "est_intersection": len(a & b),
        "est_only_src0": len(a - b),
    }
    for k, n in exact.items():
        # default theta lgK=12; intersections compound error — allow 6%+2.
        assert abs(row[k] - n) <= max(0.06 * n, 2), (k, row[k], n)


def test_quantile_sketch_merge_invariance(spark, sf_dir):
    """The mergeable-quantile contract: building per-shard sketches under
    DIFFERENT shardings (by day, by user bucket, single-pass) and merging
    must yield bit-identical bucket histograms and estimates — integer
    count addition is associative/commutative, unlike t-digest merges."""
    from pyspark.sql import functions as F

    from gasket_rs_spark.operators import sketches as K
    from gasket_rs_spark.tables import load

    events = load(spark, sf_dir, "events")

    def estimates(shard_col):
        df = events if shard_col is None else events.withColumn(
            "shard",
            F.to_date("ts") if shard_col == "day" else F.col("user_id") % 7,
        )
        groups = ["event_type"] if shard_col is None else ["event_type", "shard"]
        sk = K.quantile_sketch(df, "value", groups)
        merged = K.quantile_sketch_merge(sk, ["event_type"])
        return {
            tuple(r) for r in K.quantile_from_sketch(merged, ["event_type"]).collect()
        }

    direct = estimates(None)
    assert estimates("day") == direct
    assert estimates("user") == direct


def test_quantile_sketch_error_bound(spark, sf_dir):
    """Every estimate sits within one bucket width (x/÷ base=1.001, plus
    the half-bucket midpoint) of the EXACT lower quantile — the sketch's
    advertised relative-error contract."""
    import math

    from pyspark.sql import functions as F

    from gasket_rs_spark.operators import sketches as K
    from gasket_rs_spark.tables import load

    events = load(spark, sf_dir, "events")
    sk = K.quantile_sketch(events, "value", ["event_type"])
    est = {
        r.event_type: (r.est_p5, r.est_p9, r.est_p99)
        for r in K.quantile_from_sketch(sk, ["event_type"]).collect()
    }
    rows = events.select("event_type", "value").collect()
    by_type: dict[str, list[float]] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r.value)
    for et, vals in by_type.items():
        vals.sort()
        for q, got in zip((0.5, 0.9, 0.99), est[et]):
            exact = vals[math.ceil(q * len(vals)) - 1]
            # midpoint of the true bucket is within sqrt(base) of any
            # member; allow one full bucket for the floor boundary
            assert abs(math.log(got / exact)) <= 1.5 * math.log(K._Q_BASE), (
                f"{et} q={q}: est {got} vs exact {exact}"
            )


def test_count_min_overestimates_every_token(spark, sf_dir):
    """CM guarantee: est(t) >= exact(t) for EVERY token, not just the
    witness's top-10 — collisions can only inflate a counter."""
    from pyspark.sql import functions as F

    from gasket_rs_spark.operators import sketches as K
    from gasket_rs_spark.tables import load

    toks = K._tokens_exploded(load(spark, sf_dir, "documents"))
    tc = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    grid = K.count_min_build(tc)
    probes = tc.select(
        "tok",
        F.col("cnt").alias("exact_cnt"),
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("cm_row"), K._cm_pos(F.col("tok"), i).alias("cm_col"))
                for i in range(K._CM_D)
            ])
        ).alias("cell"),
    ).select("tok", "exact_cnt", "cell.cm_row", "cell.cm_col")
    est = (
        probes.join(F.broadcast(grid), ["cm_row", "cm_col"])
        .groupBy("tok", "exact_cnt")
        .agg(F.min("cm_cnt").alias("cm_est"))
    )
    bad = est.where(F.col("cm_est") < F.col("exact_cnt")).count()
    assert bad == 0


def test_count_min_merge_invariance(spark, sf_dir):
    """Cell-wise addition of per-source shard grids equals the
    single-pass grid — the mergeable-sketch contract (exact integer
    equality, any sharding)."""
    from pyspark.sql import functions as F

    from gasket_rs_spark.operators import sketches as K
    from gasket_rs_spark.tables import load

    toks = K._tokens_exploded(load(spark, sf_dir, "documents"))

    def grid_of(df):
        tc = df.groupBy("tok").agg(F.count("*").alias("cnt"))
        return {
            (r.cm_row, r.cm_col): r.cm_cnt for r in K.count_min_build(tc).collect()
        }

    full = grid_of(toks)
    merged: dict[tuple, int] = {}
    for src_rows in toks.select("source").distinct().collect():
        shard = grid_of(toks.where(F.col("source") == src_rows.source))
        for cell, cnt in shard.items():
            merged[cell] = merged.get(cell, 0) + cnt
    assert merged == full


def test_misra_gries_superset_and_eviction(spark, sf_dir):
    """The MG candidate set must (1) contain every true heavy hitter on
    ANY partitioning — the superset guarantee the EXACT oracle builds on
    — and (2) actually evict (candidates << distinct items), otherwise
    the bounded-state claim is vacuous."""
    from pyspark.sql import functions as F

    from gasket_rs_spark.operators import sketches as K

    stream = K._hh_stream(spark, sf_dir)
    n = stream.count()
    n_distinct = stream.distinct().count()
    truth = {
        r.item
        for r in stream.groupBy("item")
        .agg(F.count("*").alias("f"))
        .where(F.col("f") > n / K._MG_REPORT_FRAC)
        .collect()
    }
    assert truth, "planted skew produced no heavy hitters — fixture broken"
    for parts in (1, 8):
        cands = {
            r.item
            for r in K._mg_summaries(stream.repartition(parts), K._MG_K)
            .select("item")
            .distinct()
            .collect()
        }
        assert truth <= cands, f"MG dropped a true heavy hitter at {parts} partitions"
        # bounded state: <= k candidates per partition
        assert len(cands) <= K._MG_K * parts
        # non-vacuous: the stream carries more distinct items than a
        # single summary may hold, so eviction must have run
        assert n_distinct > K._MG_K, "fixture too small to exercise eviction"
        assert len(cands) < n_distinct, (
            f"{len(cands)} candidates vs {n_distinct} distinct — no eviction"
        )


def test_misra_gries_final_answer_partition_invariant(spark, sf_dir):
    """End to end, the reported heavy hitters are EXACT and identical on
    any layout (candidates vary with partitioning; the recount doesn't)."""
    from gasket_rs_spark.operators import sketches as K

    base = {tuple(r) for r in K.q_heavy_hitters_mg(spark, sf_dir).collect()}
    assert len(base) > 0
    # shares must all clear the report threshold
    assert all(r[2] > 1.0 / K._MG_REPORT_FRAC for r in base)


def test_join_size_estimate_one_sided(spark, sf_dir):
    """The CM inner-product estimator can only OVERcount (hash
    collisions add mass, never remove it): estimate >= exact, and the
    exact side equals a literally-executed join's row count."""
    from pyspark.sql import functions as F

    from gasket_rs_spark.operators.sketches import q_join_size_estimate
    from gasket_rs_spark.tables import load

    r = q_join_size_estimate(spark, sf_dir).first()
    assert r["cm_estimate"] >= r["exact_size"]
    assert r["overestimate_ratio"] >= 1.0

    ev = load(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("user_id")
    purchases = ev.where(F.col("event_type") == "purchase").select("user_id")
    assert clicks.join(purchases, "user_id").count() == r["exact_size"]


def test_count_sketch_estimates_close_and_signs_balanced(spark, sf_dir):
    """Count-Sketch is unbiased: the lower-median estimate of a heavy
    hitter lands within the sketch's L2 noise — and, unlike count-min,
    the error CAN be negative. Also pins the sign family balance."""
    from gasket_rs_spark.operators.sketches import (
        _CM_D,
        _cs_sign,
        q_sketch_count_sketch,
    )
    from gasket_rs_spark.tables import load

    rows = q_sketch_count_sketch(spark, sf_dir).collect()
    assert len(rows) == 10
    total = (
        load(spark, sf_dir, "documents")
        .selectExpr("sum(size(split(text, ' '))) AS n")
        .collect()[0]
        .n
    )
    for r in rows:
        assert r.err == r.cs_est - r.exact_cnt
        # L2 noise bound (loose, deterministic-data safe): |err| well
        # under the total corpus mass / sqrt(w)-ish envelope
        assert abs(r.err) < total // 8, (r.tok, r.err, total)
    # sign family is roughly balanced over the vocabulary
    import pyspark.sql.functions as F

    toks = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .distinct()
    )
    bal = toks.select(
        *[_cs_sign(F.col("tok"), i).alias(f"s{i}") for i in range(_CM_D)]
    ).groupBy().sum()
    sums = bal.collect()[0]
    n_vocab = toks.count()
    for v in sums:
        assert abs(v) < max(20, n_vocab // 2)
