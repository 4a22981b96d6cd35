"""Interleaved A/B (r22): bitext_margin_mine pair kernel as Catalyst
HOF fold on the pair-expanded crossJoin (A, the r21 shape) vs the
blocked-bank Arrow/numpy kernel (B, shipped). Also asserts the pair
table and the final output are BIT-IDENTICAL between forms (exceptAll
both ways) before timing. Protocol: scripts/ab_triangles_r10.py —
alternating passes, min+median of clean passes."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gasket_rs_spark.session import clear_caches, get_session


def pairs_hof(spark, sf_dir):
    """The r21 expression-form pair table (A)."""
    from gasket_rs_spark.tables import load

    emb = load(spark, sf_dir, "embeddings")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(as_double, F.lit(0.0), lambda a_, x: a_ + x * x))
    v = emb.select("vec_id", as_double.alias("vec"), norm.alias("norm"))
    a = v.where(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("src_id"), F.col("vec").alias("va"),
        F.col("norm").alias("na"))
    b = v.where(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("tgt_id"), F.col("vec").alias("vb"),
        F.col("norm").alias("nb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0),
        lambda a_, x: a_ + x)
    return a.crossJoin(b).select(
        "src_id", "tgt_id",
        F.floor(dot / F.greatest(F.col("na") * F.col("nb"), F.lit(1e-12))
                * 1e6 + F.lit(0.5)).cast("bigint").alias("c6"))


def downstream(pairs):
    """deg_k + margin + best-per-source, verbatim from the operator."""
    from pyspark.sql import Window

    from gasket_rs_spark.operators.similarity import _BITEXT_K, _BITEXT_TAU

    wa = Window.partitionBy("src_id").orderBy(F.col("c6").desc(), "tgt_id")
    da = (pairs.withColumn("rn", F.row_number().over(wa))
          .where(F.col("rn") <= _BITEXT_K)
          .groupBy("src_id").agg(F.sum("c6").cast("bigint").alias("dega6")))
    wb = Window.partitionBy("tgt_id").orderBy(F.col("c6").desc(), "src_id")
    db = (pairs.withColumn("rn", F.row_number().over(wb))
          .where(F.col("rn") <= _BITEXT_K)
          .groupBy("tgt_id").agg(F.sum("c6").cast("bigint").alias("degb6")))
    m = (pairs.join(da, "src_id").join(db, "tgt_id")
         .select("src_id", "tgt_id", "c6",
                 (F.floor((F.col("c6") * 2 * _BITEXT_K)
                          / F.when(F.col("dega6") + F.col("degb6") == 0,
                                   F.lit(1))
                          .otherwise(F.col("dega6") + F.col("degb6"))
                          * 1e6 + F.lit(0.5)) / 1e6).alias("margin")))
    best = m.groupBy("src_id").agg(F.max(F.struct(
        F.col("margin").alias("m"), F.col("tgt_id").alias("t"),
        F.col("c6").alias("c"))).alias("b"))
    return best.where(F.col("b.m") >= _BITEXT_TAU).select(
        "src_id", F.col("b.t").alias("tgt_id"),
        (F.col("b.c") / 1e6).alias("cosine"), F.col("b.m").alias("margin"))


def build(spark, sf_dir, blocked):
    if blocked:
        from gasket_rs_spark.operators.similarity import q_bitext_margin_mine

        return q_bitext_margin_mine(spark, sf_dir)
    return downstream(pairs_hof(spark, sf_dir).localCheckpoint(eager=True))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session("ab_bitext_blocked")
    with open("/proc/loadavg") as f:
        print("loadavg:", f.read().strip())
    # bit-identity: the pair tables must match exactly (both directions)
    from gasket_rs_spark.operators import similarity as S

    emb = __import__("gasket_rs_spark.tables", fromlist=["load"]).load(
        spark, sf_dir, "embeddings")
    blocked_pairs = S._bitext_pairs(spark, emb)
    hof_pairs = pairs_hof(spark, sf_dir)
    d1 = blocked_pairs.exceptAll(hof_pairs).count()
    d2 = hof_pairs.exceptAll(blocked_pairs).count()
    print(f"pair-table diff: blocked\\hof={d1} hof\\blocked={d2}")
    assert d1 == 0 and d2 == 0, (d1, d2)

    build(spark, "/root/testdata/sf0.001", True).write.format("noop").mode(
        "overwrite").save()
    times = {"A": [], "B": []}
    rows = {}
    for _ in range(4):
        for tag, blocked in (("A", False), ("B", True)):
            clear_caches(spark)
            t0 = time.perf_counter()
            df = build(spark, sf_dir, blocked)
            df.write.format("noop").mode("overwrite").save()
            times[tag].append(round(time.perf_counter() - t0, 3))
            rows[tag] = sorted(
                (r["src_id"], r["tgt_id"], r["cosine"], r["margin"])
                for r in df.collect())
    assert rows["A"] == rows["B"], "final outputs differ"
    print("final outputs identical:", len(rows["A"]), "rows")
    for tag in ("A", "B"):
        ts = sorted(times[tag])
        print(tag, times[tag], "min", ts[0], "median",
              ts[len(ts) // 2])


if __name__ == "__main__":
    main()
