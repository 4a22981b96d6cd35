"""Semantic pins for the warehouse-maintenance operators
(operators/warehouse.py): interval coalescing invariants, SCD2 version
chain integrity, Bloom filter soundness (zero false negatives) and
mergeability, and the Z-order locality property the layout exists for.
The EXACT value check vs DuckDB lives in the oracle twins; these tests
pin the properties a hash-compare can't express.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gasket_rs_spark.operators.warehouse import (
    _BLOOM_K,
    _SPAN_SEC,
    q_bloom_filter_probe,
    q_interval_merge,
    q_scd2_dimension,
    q_zorder_layout,
)


def test_interval_merge_islands_disjoint(spark, sf_dir):
    rows = q_interval_merge(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        assert r.span_end - r.span_start == r.span_sec
        assert r.span_sec >= _SPAN_SEC  # at least one span's width
        by_user.setdefault(r.user_id, []).append((r.span_start, r.span_end))
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 > e1, "merged intervals must be disjoint (no touching)"


def test_interval_merge_event_conservation(spark, sf_dir):
    from gasket_rs_spark.tables import load

    total = load(spark, sf_dir, "events").count()
    merged = q_interval_merge(spark, sf_dir).agg(F.sum("n_events")).collect()[0][0]
    assert merged == total


def test_scd2_version_chain(spark, sf_dir):
    rows = q_scd2_dimension(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user_rows in by_user.values():
        user_rows.sort(key=lambda r: r.version)
        assert [r.version for r in user_rows] == list(range(1, len(user_rows) + 1))
        # exactly one current row, and it's the last version
        currents = [r for r in user_rows if r.is_current == 1]
        assert len(currents) == 1 and currents[0].version == len(user_rows)
        # valid_to of version k == valid_from of version k+1 (contiguous history)
        for a, b in zip(user_rows, user_rows[1:]):
            assert a.valid_to == b.valid_from
        assert user_rows[-1].valid_to is None


def test_bloom_no_false_negatives_and_fp_bounded(spark, sf_dir):
    r = q_bloom_filter_probe(spark, sf_dir).collect()[0]
    assert r.n_false_neg == 0, "Bloom filters never produce false negatives"
    assert r.n_bloom_pass == r.n_true_members + r.n_false_pos
    # 4096 bits / k=3 over a few hundred keys at sf0.001: FP rate must be
    # far below certainty; loose sanity bound, not a statistical claim.
    assert r.n_false_pos < r.n_probed * 0.5


def test_bloom_merge_equals_full_build(spark, sf_dir):
    """Building per-shard blooms and bit_or-merging them equals the
    single-pass build — the property that makes the filter mergeable."""
    from gasket_rs_spark.operators.warehouse import _BLOOM_WORD_BITS, _bloom_pos
    from gasket_rs_spark.tables import load

    members = (
        load(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("key"))
    )

    def build(df):
        pos = df.select(
            F.explode(
                F.array(*[_bloom_pos(F.col("key"), i) for i in range(_BLOOM_K)])
            ).alias("pos")
        )
        return {
            r.word_idx: r.word
            for r in pos.groupBy(
                (F.col("pos") / _BLOOM_WORD_BITS).cast("int").alias("word_idx")
            )
            .agg(
                F.bit_or(
                    F.expr(
                        f"shiftleft(cast(1 as bigint), cast(pos % {_BLOOM_WORD_BITS} as int))"
                    )
                ).alias("word")
            )
            .collect()
        }

    full = build(members)
    shard_a = build(members.where(F.col("key") % 2 == 0))
    shard_b = build(members.where(F.col("key") % 2 == 1))
    merged: dict[int, int] = {}
    for shard in (shard_a, shard_b):
        for w, bits in shard.items():
            merged[w] = merged.get(w, 0) | bits
    assert merged == full


def test_zorder_buckets_localize_both_dims(spark, sf_dir):
    """Within one z-bucket (top 6 of 16 bits) each 8-bit dimension spans
    at most 2^5 = 32 values — the 2-D locality min/max file skipping
    relies on. The bound is structural (bits below the bucket prefix),
    not data-dependent."""
    rows = q_zorder_layout(spark, sf_dir).collect()
    assert rows, "bucket audit must be non-empty"
    for r in rows:
        assert 0 <= r.z_bucket < 64
        assert r.max_px - r.min_px <= 31
        assert r.max_sy - r.min_sy <= 31


def test_merge_into_exercises_all_actions(spark, sf_dir):
    from gasket_rs_spark.operators.warehouse import q_merge_into
    from gasket_rs_spark.tables import load

    out = q_merge_into(spark, sf_dir)
    actions = {r.action: r.cnt for r in out.groupBy("action").agg(F.count("*").alias("cnt")).collect()}
    assert set(actions) == {"keep", "update", "insert"}
    # deletes actually removed matched rows: survivors with keep/update
    # must number strictly fewer than the full target dimension
    n_target = load(spark, sf_dir, "customer").count()
    assert actions["keep"] + actions["update"] < n_target
    # inserted rows carry the offset key space — STRICTLY above the
    # dim's real keys (data-derived max(c_custkey) offset, ADVICE r8:
    # a fixed +1e6 collided with real customers at SF >= 7) — and the
    # NEW segment
    max_key = load(spark, sf_dir, "customer").agg(F.max("c_custkey")).collect()[0][0]
    news = out.where(F.col("action") == "insert")
    assert (
        news.where(
            (F.col("custkey") <= max_key) | (F.col("mktsegment") != "NEW")
        ).count()
        == 0
    )


import pytest


@pytest.mark.parametrize("seed", range(6))
def test_interval_merge_fuzz_vs_python_reference(spark, seed):
    """Randomized interval coalescing vs a pure-Python sweep — boundary-
    dense grids (touching spans, duplicate starts, nested spans,
    zero-width) that the fixture's uniform events never produce."""
    import random

    from gasket_rs_spark.operators.warehouse import merge_intervals

    rng = random.Random(1000 + seed)
    rows = []
    for _ in range(rng.randint(30, 80)):
        user = rng.randint(0, 4)
        s = rng.randint(0, 40)  # tiny domain -> dense collisions
        width = rng.choice([0, 1, 1, 2, 5, 10])
        rows.append((user, s, s + width))
    df = spark.createDataFrame(rows, "user_id long, s long, e long")
    got = {
        (r.user_id, r.span_start, r.span_end, r.n_events)
        for r in merge_intervals(df).collect()
    }

    # Python reference: sort, sweep, merge while s <= current max e
    want = set()
    by_user: dict[int, list] = {}
    for u, s, e in rows:
        by_user.setdefault(u, []).append((s, e))
    for u, spans in by_user.items():
        spans.sort()
        cur_s, cur_e, n = None, None, 0
        for s, e in spans:
            if cur_s is None or s > cur_e:
                if cur_s is not None:
                    want.add((u, cur_s, cur_e, n))
                cur_s, cur_e, n = s, e, 1
            else:
                cur_e = max(cur_e, e)
                n += 1
        want.add((u, cur_s, cur_e, n))
    assert got == want


@pytest.mark.parametrize("seed", range(4))
def test_merge_upsert_fuzz_vs_python_reference(spark, seed):
    """Randomized MERGE semantics vs a dict-based reference: overlapping
    key spaces, deltas straddling the delete threshold, integer-cent
    values so the reference needs no float care."""
    import random

    from gasket_rs_spark.operators.warehouse import (
        _MERGE_DELETE_ABOVE,
        merge_upsert,
    )

    rng = random.Random(3000 + seed)
    target_rows = [
        (k, float(rng.randint(0, 5000)), rng.choice(["A", "B"]))
        for k in rng.sample(range(20), rng.randint(5, 12))
    ]
    source_rows = [
        (k, float(rng.choice([100, 900_000, 1_500_000, 2_000_001])))
        for k in rng.sample(range(30), rng.randint(5, 12))
    ]
    t = spark.createDataFrame(
        target_rows, "c_custkey long, c_acctbal double, c_mktsegment string"
    )
    s = spark.createDataFrame(source_rows, "key long, delta double")
    got = {tuple(r) for r in merge_upsert(t, s).collect()}

    tgt = {k: (bal, seg) for k, bal, seg in target_rows}
    src = dict(source_rows)
    want = set()
    for k, (bal, seg) in tgt.items():
        if k in src:
            if src[k] > _MERGE_DELETE_ABOVE:
                continue  # deleted
            want.add((k, bal + src[k], seg, "update"))
        else:
            want.add((k, bal, seg, "keep"))
    for k, d in src.items():
        if k not in tgt:
            want.add((k, d, "NEW", "insert"))
    assert got == want


@pytest.mark.parametrize("seed", range(4))
def test_scd2_chain_fuzz_properties(spark, seed, sf_dir):
    """SCD2 chain invariants re-checked under random subsets of the
    change stream (dropping rows must never break contiguity of the
    remaining versions)."""
    import random

    from pyspark.sql import Window

    from gasket_rs_spark.tables import load

    rng = random.Random(4000 + seed)
    keep_mod = rng.randint(2, 5)
    w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    changes = (
        load(spark, sf_dir, "events")
        .where(
            (F.col("event_type") == "purchase")
            & (F.col("event_id") % keep_mod != 0)
        )
        .select(
            "user_id",
            "event_id",
            F.floor(F.unix_millis("ts") / F.lit(1000)).alias("ts_sec"),
        )
    )
    dim = changes.select(
        "user_id",
        F.col("ts_sec").alias("valid_from"),
        F.lead("ts_sec").over(w).alias("valid_to"),
        F.row_number().over(w).alias("version"),
    )
    by_user: dict[int, list] = {}
    for r in dim.collect():
        by_user.setdefault(r.user_id, []).append(r)
    for rows in by_user.values():
        rows.sort(key=lambda r: r.version)
        assert [r.version for r in rows] == list(range(1, len(rows) + 1))
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to == b.valid_from
        assert rows[-1].valid_to is None


def test_zorder_write_narrows_file_stats_on_both_dims(spark, sf_dir, tmp_path):
    """The layout payoff, measured on REAL files: writing lineitem
    range-partitioned + sorted by the Morton key must make per-file
    min/max ranges narrow on BOTH interleaved dimensions, while a
    single-dim sort leaves the other dimension's per-file range at full
    width — the reason z-order beats plain sorting for 2-D predicates."""
    from pyspark.sql import functions as F

    from gasket_rs_spark.operators.warehouse import _interleave
    from gasket_rs_spark.tables import load

    # hash-derived INDEPENDENT dims (the fixture's partkey/suppkey are
    # correlated, which would let a single-dim sort cluster both)
    li = load(spark, sf_dir, "lineitem").select(
        F.pmod(F.xxhash64("l_orderkey"), F.lit(256)).cast("int").alias("px"),
        F.pmod(F.xxhash64("l_partkey", "l_suppkey"), F.lit(256)).cast("int").alias("sy"),
    )
    zed = li.withColumn("zval", _interleave(F.col("px"), F.col("sy")))

    def avg_file_ranges(path):
        df = spark.read.parquet(path).withColumn("f", F.input_file_name())
        stats = df.groupBy("f").agg(
            (F.max("px") - F.min("px")).alias("rpx"),
            (F.max("sy") - F.min("sy")).alias("rsy"),
        ).agg(F.avg("rpx").alias("apx"), F.avg("rsy").alias("asy")).collect()[0]
        return stats.apx, stats.asy

    z_path = str(tmp_path / "zorder")
    zed.repartitionByRange(16, "zval").sortWithinPartitions("zval").write.parquet(z_path)
    s_path = str(tmp_path / "single")
    zed.repartitionByRange(16, "px").sortWithinPartitions("px").write.parquet(s_path)

    z_px, z_sy = avg_file_ranges(z_path)
    s_px, s_sy = avg_file_ranges(s_path)
    # single-dim layout: px tightly clustered, sy at ~full width
    assert s_px < 80 and s_sy > 200
    # z-order: BOTH dimensions well below full width simultaneously
    # (quantile range boundaries straddle bit prefixes, so per-file
    # ranges run up to ~2x the ideal prefix width — still far from 255)
    assert z_px < 176 and z_sy < 176
    assert z_sy < s_sy / 1.5, "z-order must beat single-dim sort on the other dim"


def test_incremental_agg_maintenance_equals_full_rebuild(spark, sf_dir):
    """The merged (base + delta) aggregate must row-for-row equal a
    direct full-table aggregate computed in Spark — the maintenance
    algebra is exact, independent of the DuckDB cross-check."""
    from pyspark.sql import functions as F

    from gasket_rs_spark.operators.warehouse import q_incremental_agg_maintenance
    from gasket_rs_spark.tables import load

    got = {
        r["o_orderpriority"]: (r["n_orders"], r["revenue_cents"])
        for r in q_incremental_agg_maintenance(spark, sf_dir).collect()
    }
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    want = {
        r["o_orderpriority"]: (r["n"], r["s"])
        for r in load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum(cents).alias("s"))
        .collect()
    }
    assert got == want


def _py_hilbert(px, sy):
    """Pure-python re-spelling of the witness recurrence (verify the
    PROPERTIES below, which are implementation-independent)."""
    x, y, d = px, sy, 0
    for s in [128, 64, 32, 16, 8, 4, 2, 1]:
        rx, ry = x // s, y // s
        d += s * s * (3 * rx + ry - 2 * rx * ry)
        xm, ym = x % s, y % s
        if ry == 0:
            x, y = (s - 1 - ym, s - 1 - xm) if rx == 1 else (ym, xm)
        else:
            x, y = xm, ym
    return d


def test_hilbert_curve_properties():
    """The defining Hilbert properties over the FULL 2^16 grid:
    bijective, unit-step adjacent (a Hamiltonian path from (0,0)), and
    every aligned 2^k x 2^k quadrant is a CONTIGUOUS index range — the
    zone-map-pruning property Z-order (Morton) provably lacks."""
    grid = {}
    for x in range(256):
        for y in range(256):
            grid[(x, y)] = _py_hilbert(x, y)
    ds = sorted(grid.values())
    assert ds == list(range(65536))  # bijection
    assert grid[(0, 0)] == 0  # corner start
    by_d = {d: xy for xy, d in grid.items()}
    for d in range(1, 65536):  # unit-step adjacency
        (x0, y0), (x1, y1) = by_d[d - 1], by_d[d]
        assert abs(x0 - x1) + abs(y0 - y1) == 1
    for k in range(1, 8):  # quadrant contiguity at every scale
        q = {}
        for (x, y), d in grid.items():
            q.setdefault((x >> k, y >> k), []).append(d)
        for ds_q in q.values():
            assert max(ds_q) - min(ds_q) == (1 << (2 * k)) - 1

    # contrast: Morton violates quadrant contiguity... in the OTHER
    # direction — contiguous quadrants but NON-unit steps (jumps of up
    # to 255+255 at quadrant boundaries kill run-length locality).
    def morton(x, y):
        z = 0
        for b in range(8):
            z += (((x >> b) & 1) << (2 * b + 1)) + (((y >> b) & 1) << (2 * b))
        return z

    mby_d = {morton(x, y): (x, y) for x in range(256) for y in range(256)}
    max_step = max(
        abs(mby_d[d - 1][0] - mby_d[d][0]) + abs(mby_d[d - 1][1] - mby_d[d][1])
        for d in range(1, 65536)
    )
    assert max_step > 1  # Morton jumps; Hilbert never does


def test_hilbert_spark_kernel_matches_python(spark):
    """The unrolled Spark recurrence equals the python one on a
    deterministic sample of the grid (all 4 corners + a diagonal band)."""
    from gasket_rs_spark.operators.warehouse import _hilbert_spark

    pts = [(x, y) for x in range(0, 256, 17) for y in range(0, 256, 23)]
    pts += [(0, 0), (255, 0), (0, 255), (255, 255)]
    df = spark.createDataFrame(pts, "px: bigint, sy: bigint").selectExpr(
        "px", "sy", "px AS hx", "sy AS hy", "CAST(0 AS BIGINT) AS hd"
    )
    got = {(r["px"], r["sy"]): r["hd"] for r in _hilbert_spark(df).collect()}
    assert got == {(x, y): _py_hilbert(x, y) for x, y in pts}


def test_compaction_bins_cover_all_files_with_bounded_overflow(spark, sf_dir):
    """Sorted-fill guarantees: every file lands in exactly one bin
    (per-partition bin_rows sum to the partition's file rows) and a bin
    overflows the target by less than its own largest file."""
    from gasket_rs_spark.operators.warehouse import (
        _COMPACT_TARGET,
        q_compaction_bin_packing,
    )
    from gasket_rs_spark.tables import load
    from pyspark.sql import functions as F

    bins = q_compaction_bin_packing(spark, sf_dir).collect()
    for r in bins:
        assert r["bin_rows"] < _COMPACT_TARGET + r["max_file_rows"]
    got_total = sum(r["bin_rows"] for r in bins)
    want_total = load(spark, sf_dir, "lineitem").count()
    assert got_total == want_total
    got_files = sum(r["n_files"] for r in bins)
    want_files = (
        load(spark, sf_dir, "lineitem")
        .select(F.expr("l_orderkey div 100").alias("f")).distinct().count()
    )
    assert got_files == want_files
