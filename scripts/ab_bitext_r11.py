"""Interleaved A/B: bitext_margin_mine pairs frame lazy (A, shipped)
vs localCheckpoint(eager) shared across its three consumers (B).
Protocol: scripts/ab_triangles_r10.py — alternating passes, min+median."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gasket_rs_spark.session import clear_caches, get_session


def build(spark, sf_dir, checkpoint_pairs):
    from pyspark.sql import Window

    from gasket_rs_spark.operators.similarity import _BITEXT_K, _BITEXT_TAU
    from gasket_rs_spark.tables import load

    emb = load(spark, sf_dir, "embeddings")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(as_double, F.lit(0.0), lambda a, x: a + x * x))
    v = emb.select("vec_id", as_double.alias("vec"), norm.alias("norm"))
    a = v.where(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("src_id"), F.col("vec").alias("va"), F.col("norm").alias("na"))
    b = v.where(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("tgt_id"), F.col("vec").alias("vb"), F.col("norm").alias("nb"))
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda a_, x: a_ + x)
    pairs = a.crossJoin(b).select(
        "src_id", "tgt_id",
        F.floor(dot / (F.col("na") * F.col("nb")) * 1e6 + F.lit(0.5)).cast("bigint").alias("c6"))
    if checkpoint_pairs:
        pairs = pairs.localCheckpoint(eager=True)
    wa = Window.partitionBy("src_id").orderBy(F.col("c6").desc(), "tgt_id")
    da = pairs.withColumn("rn", F.row_number().over(wa)).where(F.col("rn") <= _BITEXT_K) \
        .groupBy("src_id").agg(F.sum("c6").cast("bigint").alias("dega6"))
    wb = Window.partitionBy("tgt_id").orderBy(F.col("c6").desc(), "src_id")
    db = pairs.withColumn("rn", F.row_number().over(wb)).where(F.col("rn") <= _BITEXT_K) \
        .groupBy("tgt_id").agg(F.sum("c6").cast("bigint").alias("degb6"))
    m = pairs.join(da, "src_id").join(db, "tgt_id").select(
        "src_id", "tgt_id", "c6",
        (F.floor((F.col("c6") * 2 * _BITEXT_K) / (F.col("dega6") + F.col("degb6")) * 1e6 + F.lit(0.5)) / 1e6).alias("margin"))
    best = m.groupBy("src_id").agg(F.max(F.struct(
        F.col("margin").alias("m"), F.col("tgt_id").alias("t"), F.col("c6").alias("c"))).alias("b"))
    return best.where(F.col("b.m") >= _BITEXT_TAU).select(
        "src_id", F.col("b.t").alias("tgt_id"), (F.col("b.c") / 1e6).alias("cosine"), F.col("b.m").alias("margin"))


def main():
    sf_dir = "/root/testdata/sf0.1"
    spark = get_session("ab_bitext")
    with open("/proc/loadavg") as f:
        print("loadavg:", f.read().strip())
    build(spark, "/root/testdata/sf0.001", False).write.format("noop").mode("overwrite").save()
    times = {"A": [], "B": []}
    rows = {}
    for _ in range(3):
        for tag, ckpt in (("A", False), ("B", True)):
            clear_caches(spark)
            t0 = time.perf_counter()
            df = build(spark, sf_dir, ckpt)
            df.write.format("noop").mode("overwrite").save()
            times[tag].append(round(time.perf_counter() - t0, 3))
            rows[tag] = df.count()
    assert rows["A"] == rows["B"], rows
    for tag in ("A", "B"):
        ts = sorted(times[tag])
        print(tag, times[tag], "min", ts[0], "median", ts[1])


if __name__ == "__main__":
    main()
