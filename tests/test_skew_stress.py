"""EXECUTED zipf-skew stress check (VERDICT r15 #2).

Until r16 the 100 TB skew claim rested on plan-reading: the repo ships a
salted skew join/agg (gasket_rs_spark/operators/skew.py) with plan
asserts, but no test ever FED a deliberately skewed corpus through the
heavy joins/windows and MEASURED that the salting bounds the maximum
task input. local[32]/sf0.1 can't see this failure mode by accident —
the fixture keys are near-uniform — so this module builds an adversarial
zipf twin of the events table (one hot key holding ~30% of all rows, a
long tail of ~200 cold keys) at sf0.01 scale (60k rows) and asserts,
with executed jobs rather than plan text:

  (a) the salted aggregation / salted join return EXACTLY the plain
      (unsalted) plans' results on the adversarial distribution, and
  (b) the salted shuffle layout BOUNDS the max partition: hash-
      partitioned on the bare key, the hot key's ~18k rows land in ONE
      partition (measured); on (key, _salt) the max partition stays
      within a small factor of the median (measured via
      spark_partition_id() row counts AFTER the exact repartitioning a
      groupBy on those keys would shuffle by).

Everything here is deterministic: keys and values derive from id
arithmetic, the salt is xxhash64 (retry-safe, no rand()), and hash
partitioning is a pure function of (key bytes, numPartitions) — the
measured sizes are stable run-to-run, so the asserted bounds are tight
enough to catch a salting regression yet loose enough to survive a
Spark hash change.

Fuzz lane (the close's JVM step): zipf generation + the counted
shuffles cost ~20 s, too heavy for the default lane's 10-minute line.
Measured shape at the pinned parameters (recorded in SCALE.md r16):
unsalted max partition 19 541 rows (the whole 18 000-row hot key +
co-hashed cold keys, 10.4x the 60000/32 = 1 875 ideal share); salted
max cell 1 218 = 1.08x the 1 125 ideal (14.8x smaller indivisible
unit); salted max partition 6 148 vs median 1 397 (residual clumping
of 16 hot cells over 32 bins — shrinks, not grows, at cluster-scale
partition counts).

No registry growth: this is a pytest-only witness of an already-shipped
operator (skew.py:26 salted_agg, skew.py:53 salted_join).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

N_ROWS = 60_000          # sf0.01-scale events twin
HOT_SHARE = 0.3          # one key holds ~30% of all rows
N_COLD_KEYS = 200        # long tail
N_PARTS = 32             # shuffle width under measurement


@pytest.fixture(scope="module")
def zipf_events(spark):
    """Adversarial twin of the events table: event_type is 'hot' for 30%
    of rows (ids ending 0-2), else one of ~200 cold keys; value is a
    deterministic decimal. Built JVM-side from spark.range — no driver
    data, no rand()."""
    hot_mod = int(HOT_SHARE * 10)
    df = (
        spark.range(N_ROWS)
        .select(
            F.col("id").alias("event_id"),
            F.when(F.col("id") % 10 < hot_mod, F.lit("hot"))
            .otherwise(
                F.concat(
                    F.lit("cold_"),
                    F.pmod(F.xxhash64("id"), F.lit(N_COLD_KEYS)).cast("string"),
                )
            )
            .alias("event_type"),
            ((F.col("id") % 1000) / F.lit(10.0)).alias("value"),
        )
        .persist()
    )
    df.count()
    yield df
    df.unpersist()


def _partition_sizes(df, *cols):
    """Executed row count per partition under hash partitioning on
    ``cols`` over N_PARTS partitions — the exact layout a groupBy/join
    shuffling on those keys produces. spark_partition_id() is evaluated
    on the repartitioned stage's input rows, so this measures the real
    shuffle, not a plan estimate."""
    rows = (
        df.repartition(N_PARTS, *[F.col(c) for c in cols])
        .groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    return sorted(r["cnt"] for r in rows)


@pytest.mark.fuzz
def test_zipf_fixture_is_actually_skewed(zipf_events):
    """The adversarial premise itself: the hot key holds ~30% of rows and
    every cold key is tiny — otherwise the bounds below test nothing."""
    counts = {
        r["event_type"]: r["cnt"]
        for r in zipf_events.groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert counts["hot"] == int(N_ROWS * HOT_SHARE)
    cold = [c for k, c in counts.items() if k != "hot"]
    assert max(cold) < 0.01 * N_ROWS  # no accidental second hot key


@pytest.mark.fuzz
def test_salted_agg_equals_plain_on_zipf(spark, zipf_events):
    """(a) answer-invariance under adversarial skew: the two-stage salted
    aggregation must return exactly the plain GROUP BY's rows. The
    fixture's near-uniform keys never exercised the hot path; here 30%
    of all rows funnel through one key's 16 salt cells."""
    from gasket_rs_spark.operators.skew import salted_agg

    salted = salted_agg(zipf_events, "event_type", "value")
    plain = zipf_events.groupBy("event_type").agg(
        (F.floor(F.sum("value") * 10000 + 0.5) / 10000).alias("sum_value"),
        F.count("*").alias("n_events"),
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.max("value"), 6).alias("max_value"),
        (F.floor(F.sum("value") / F.count("*") * 1000000 + 0.5) / 1000000)
        .alias("avg_value"),
    )
    got = sorted(map(tuple, salted.collect()))
    want = sorted(map(tuple, plain.collect()))
    assert got == want


@pytest.mark.fuzz
def test_salted_join_equals_plain_on_zipf(spark, zipf_events):
    """(a) for the salted fact-dim join: row-identical to the unsalted
    join on the zipf corpus, compared via a per-key count + value-sum +
    content-checksum digest (60k joined rows reduced JVM-side, nothing
    wide collected)."""
    from gasket_rs_spark.operators.skew import salted_join

    dim = (
        zipf_events.select("event_type")
        .distinct()
        .withColumn("weight", F.length("event_type").cast("double"))
    )

    def digest(joined):
        return sorted(
            map(
                tuple,
                joined.groupBy("event_type")
                .agg(
                    F.count("*").alias("n"),
                    # values live on the 0.1 grid; the two layouts sum
                    # doubles in different orders (~1e-11 drift), so snap
                    # the sum back to the data grid before comparing
                    F.floor(F.sum("value") * 10 + 0.5).alias("sv_tenths"),
                    # order-insensitive row-content checksum; pmod bounds
                    # each term to 2^31 so the 60k-row sum stays far from
                    # int64 (ANSI mode raises on overflow — raw xxhash64
                    # terms of +-2^63 overflow after two rows)
                    F.sum(
                        F.pmod(
                            F.xxhash64("event_id", "event_type", "value",
                                       "weight"),
                            F.lit(2_147_483_647),
                        )
                    ).alias("chk"),
                )
                .collect(),
            )
        )

    salted = salted_join(zipf_events, dim, "event_type", "event_id")
    plain = zipf_events.join(dim, "event_type")
    assert digest(salted) == digest(plain)


@pytest.mark.fuzz
def test_salting_bounds_max_partition_rows(spark, zipf_events):
    """(b) the scale claim, EXECUTED at two granularities.

    CELL level — what salting guarantees: unsalted, the hot key is one
    indivisible 18 000-row unit that no reducer count can split (at
    100 TB: one task carries 30 TB). Salted, the max (key, _salt) cell
    measured 1 218 rows = 1.08x the ideal 18000/16 — a 14.8x reduction
    of the indivisible unit. Cells are also what AQE's skew-split can
    further subdivide at real scale.

    PARTITION level — the layout a join-side shuffle actually produces
    at N_PARTS=32: unsalted max partition measured 19 541 (the whole
    hot key + co-hashed cold keys) vs a 1 875 ideal share; salted max
    6 148 vs median 1 397. The residual 4.4x max/median is 16 hot
    cells clumping over only 32 bins (balls-into-bins); at cluster
    scale (thousands of partitions, cells << bins) each hot cell sits
    alone, so the 32-partition reading is the WORST case for the
    partition-level bound, and it still cuts the straggler 3.2x."""
    from gasket_rs_spark.operators.skew import SALT_BUCKETS

    hot_rows = int(N_ROWS * HOT_SHARE)
    salted_df = zipf_events.withColumn(
        "_salt", F.pmod(F.xxhash64("event_id"), F.lit(SALT_BUCKETS)).cast("int")
    )

    # cell level: the indivisible unit shrinks ~SALT_BUCKETS-fold
    max_cell = (
        salted_df.groupBy("event_type", "_salt")
        .agg(F.count("*").alias("cnt"))
        .agg(F.max("cnt").alias("mx"))
        .collect()[0]["mx"]
    )
    ideal_cell = hot_rows / SALT_BUCKETS
    assert max_cell <= 1.25 * ideal_cell, (max_cell, ideal_cell)

    # partition level: executed shuffle layouts
    unsalted = _partition_sizes(zipf_events, "event_type")
    # the premise measured, not assumed: some partition holds the whole
    # hot key (plus whatever cold keys co-hash) — the straggler task
    assert max(unsalted) >= hot_rows

    salted = _partition_sizes(salted_df, "event_type", "_salt")
    median = salted[len(salted) // 2]
    # measured 4.4x at the pinned parameters (hot-cell clumping over 32
    # bins); 6x tolerates a Spark hash change without tolerating a
    # salting regression, which reads ~14x (19541/1397)
    assert max(salted) <= 6 * median, (max(salted), median, salted)
    # and the straggler shrank vs the unsalted layout (measured 3.2x)
    assert max(salted) * 2 <= max(unsalted), (max(salted), max(unsalted))


@pytest.mark.fuzz
def test_exact_dedup_hot_duplicate_group(spark):
    """The most realistic 100 TB skew for a training-data pipeline: a
    duplicate-heavy corpus where ONE document body accounts for 30% of
    all rows (boilerplate, scraped templates). The exact-dedup shape
    (dedup.py:93 — groupBy xxhash64(text) + min/count) is skew-IMMUNE by
    construction: the aggregation is algebraic, so map-side partial
    aggregation collapses the hot group to one row per input partition
    BEFORE the shuffle — no reducer ever receives 18 000 duplicate rows.
    Executed here on the adversarial corpus (exact keeper + counts), and
    the mechanism is asserted in the physical plan: a partial
    HashAggregate below the key exchange."""
    n = 60_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 3, F.lit("the hot boilerplate body"))
        .otherwise(F.concat(F.lit("unique doc "), F.col("id").cast("string")))
        .alias("text"),
    )
    out = (
        docs.groupBy(F.xxhash64("text").alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_copies"))
        .select("doc_id", "n_copies")
    )
    rows = {r["doc_id"]: r["n_copies"] for r in out.collect()}
    hot_rows = int(n * 0.3)
    # keeper is the minimum doc_id of the hot group (id 0 is hot: 0%10<3)
    assert rows[0] == hot_rows
    # every unique doc survives with count 1; totals reconcile exactly
    assert len(rows) == 1 + (n - hot_rows)
    assert sum(rows.values()) == n
    # the skew-immunity mechanism, in the executed (AQE-final) plan:
    # partial min/count BELOW the key exchange — the hot group collapses
    # map-side, so the shuffle carries one row per (partition, key)
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "partial_min" in final and "partial_count" in final, final
    # and the partial aggregate sits under the exchange, not above it
    assert (final.index("Exchange hashpartitioning")
            < final.index("partial_min")), final


@pytest.mark.fuzz
def test_session_window_correct_under_hot_user(spark):
    """The streaming-family window shape under the same adversarial
    distribution: session windows grouped by a zipf-skewed user key (one
    hot user emits 30% of all events — at scale, one giant per-user
    state partition). Spark's session_window merge path is cross-checked
    against a different execution strategy over the same skewed layout:
    lag-then-cumulative-sum sessionization (strictly-greater break rule,
    the pinned semantics from test_streaming's boundary test). Exact
    agreement required, including the window end = last_event + gap
    convention."""
    n = 60_000
    gap_s = 60
    span = 500_000
    ev = spark.range(n).select(
        F.when(F.col("id") % 10 < 3, F.lit("hot"))
        .otherwise(
            F.concat(
                F.lit("user_"),
                F.pmod(F.xxhash64("id"), F.lit(N_COLD_KEYS)).cast("string"),
            )
        )
        .alias("user_id"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + (F.col("id") * 7919) % span
        ).alias("ts"),
    )

    via_session_window = (
        ev.groupBy(F.session_window("ts", f"{gap_s} seconds").alias("w"),
                   "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "n_events",
        )
    )

    w_user = Window.partitionBy("user_id").orderBy("ts")
    via_lag = (
        ev.withColumn("prev_ts", F.lag("ts").over(w_user))
        .withColumn(
            "new_session",
            # strictly greater: an event at exactly prev+gap MERGES
            (
                F.col("prev_ts").isNull()
                | (
                    F.unix_timestamp("ts") - F.unix_timestamp("prev_ts")
                    > gap_s
                )
            ).cast("int"),
        )
        .withColumn(
            "session_id",
            F.sum("new_session").over(
                w_user.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("w_start"),
            (F.max("ts") + F.expr(f"INTERVAL {gap_s} SECONDS")).alias("w_end"),
            F.count("*").alias("n_events"),
        )
        .drop("session_id")
        .select("user_id", "w_start", "w_end", "n_events")
    )

    got = sorted(map(tuple, via_session_window.collect()))
    want = sorted(map(tuple, via_lag.collect()))
    assert got == want
    # the adversarial premise: the hot user's state really is giant —
    # it must hold ~30% of all events across its sessions
    hot_events = sum(r[3] for r in got if r[0] == "hot")
    assert hot_events == int(n * 0.3)


@pytest.mark.fuzz
def test_heavy_window_correct_under_zipf(spark, zipf_events):
    """The heaviest window shape (rank over the skewed partition key)
    stays CORRECT under adversarial skew: Spark plans
    partitionBy(event_type) windows as a single sort per key — the hot
    key is one 18k-row sort partition, heavy but exact. Cross-checked
    against a window-free groupBy derivation of the same top-1-per-key
    answer (struct argmax), which shuffles pre-aggregated rows only."""
    w_top = (
        zipf_events.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("event_type")
                .orderBy(F.desc("value"), F.asc("event_id"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("event_type", "event_id", "value")
    )
    g_top = (
        zipf_events.groupBy("event_type")
        .agg(
            F.min(
                F.struct(
                    (-F.col("value")).alias("neg_value"),
                    F.col("event_id").alias("event_id"),
                )
            ).alias("s")
        )
        .select(
            "event_type",
            F.col("s.event_id").alias("event_id"),
            (-F.col("s.neg_value")).alias("value"),
        )
    )
    assert sorted(map(tuple, w_top.collect())) == sorted(
        map(tuple, g_top.collect())
    )
