"""Interleaved A/B (r22): the four remaining all-pairs vector witnesses
— dbscan_clusters, silhouette_score, calibration_ece, similarity_topk —
scored via per-pair Catalyst HOF folds on the pair-expanded join (A,
the pre-r22 shapes) vs the blocked-bank Arrow/numpy kernels (B,
shipped). dbscan/silhouette A-forms run through the SAME operator with
the pair builder monkeypatched to the HOF form, so downstream code is
shared; ece/topk A-forms are full reconstructions. Asserts identical
collected outputs per query. Protocol: scripts/ab_triangles_r10.py."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from gasket_rs_spark.operators import similarity as S
from gasket_rs_spark.session import clear_caches, get_session
from gasket_rs_spark.tables import load


def hof_dbscan_pairs(spark, emb3):
    v = emb3.select(
        "vec_id", S._as_double(F.col("embedding")).alias("vec")
    ).select(
        "vec_id", "vec",
        F.aggregate(F.col("vec"), F.lit(0.0), lambda a, x: a + x * x).alias("sq"))
    a = v.select(F.col("vec_id").alias("ida"), F.col("vec").alias("va"),
                 F.col("sq").alias("sqa"))
    b = v.select(F.col("vec_id").alias("idb"), F.col("vec").alias("vb"),
                 F.col("sq").alias("sqb"))
    return (a.join(broadcast(b), F.col("ida") < F.col("idb"))
            .select("ida", "idb",
                    F.floor((F.col("sqa") + F.col("sqb")
                             - 2 * S._dot(F.col("va"), F.col("vb")))
                            * 1e6 + F.lit(0.5)).cast("bigint").alias("d6"))
            .where(F.col("d6") <= S._DBSCAN_EPS6))


def hof_sil_pairs(spark, emb4):
    v = emb4.select(
        "vec_id", F.col("label").cast("bigint").alias("label"),
        S._as_double(F.col("embedding")).alias("vec")
    ).select(
        "vec_id", "label", "vec",
        F.aggregate(F.col("vec"), F.lit(0.0), lambda a, x: a + x * x).alias("sq"))
    a = v.select(F.col("vec_id").alias("ida"), F.col("label").alias("la"),
                 F.col("vec").alias("va"), F.col("sq").alias("sqa"))
    b = v.select(F.col("vec_id").alias("idb"), F.col("label").alias("lb"),
                 F.col("vec").alias("vb"), F.col("sq").alias("sqb"))
    return (a.join(broadcast(b), F.col("ida") != F.col("idb"))
            .select("ida", "la", "lb",
                    F.floor((F.col("sqa") + F.col("sqb")
                             - 2 * S._dot(F.col("va"), F.col("vb")))
                            * 1e6 + F.lit(0.5)).cast("bigint").alias("d6")))


def hof_topk(spark, sf_dir):
    from pyspark.sql import Window

    emb = S._with_vec(load(spark, sf_dir, "embeddings"))
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec"),
        F.col("nrm").alias("qnrm"))
    scored = emb.join(broadcast(queries),
                      F.col("vec_id") != F.col("query_id")).withColumn(
        "cosine", F.round(S._dot(F.col("qvec"), F.col("vec"))
                          / F.greatest(F.col("qnrm") * F.col("nrm"),
                                       F.lit(1e-12)), 6))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= S._TOP_K)
            .select("query_id", "rk", F.col("vec_id").alias("neighbor_id"),
                    "cosine", "label"))


def hof_ece(spark, sf_dir):
    from pyspark.sql import Window

    emb = S._with_vec(load(spark, sf_dir, "embeddings"))
    queries = emb.where(F.col("vec_id") % S._ECE_QMOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel"),
        F.col("vec").alias("qvec"), F.col("nrm").alias("qnrm"))
    scored = emb.join(broadcast(queries),
                      F.col("vec_id") != F.col("query_id")).select(
        "query_id", "qlabel", "label", "vec_id",
        F.floor(S._dot(F.col("qvec"), F.col("vec"))
                / F.greatest(F.col("qnrm") * F.col("nrm"), F.lit(1e-12))
                * 1e6 + F.lit(0.5)).cast("bigint").alias("c6"))
    w = Window.partitionBy("query_id").orderBy(F.col("c6").desc(), "vec_id")
    votes = (scored.withColumn("rk", F.row_number().over(w))
             .where(F.col("rk") <= S._ECE_K)
             .groupBy("query_id", "qlabel")
             .agg(F.sum(F.when(F.col("label") == 0, 1).otherwise(0))
                  .cast("bigint").alias("s10")))
    return (votes.groupBy("s10")
            .agg(F.count("*").cast("bigint").alias("n"),
                 F.sum(F.when(F.col("qlabel") == 0, 1).otherwise(0))
                 .cast("bigint").alias("pos"))
            .select("s10", "n", "pos",
                    (F.col("s10") * 100000).cast("bigint").alias("conf6"),
                    F.expr("pos * 1000000 div n").cast("bigint").alias("acc6"),
                    F.abs(F.col("s10") * 100000
                          - F.expr("pos * 1000000 div n"))
                    .cast("bigint").alias("gap6"))
            .orderBy("s10"))


def build(spark, sf_dir, name, old):
    if name == "dbscan_clusters":
        if not old:
            return S.q_dbscan_clusters(spark, sf_dir)
        orig = S._dbscan_pairs
        S._dbscan_pairs = hof_dbscan_pairs
        try:
            return S.q_dbscan_clusters(spark, sf_dir)
        finally:
            S._dbscan_pairs = orig
    if name == "silhouette_score":
        if not old:
            return S.q_silhouette_score(spark, sf_dir)
        orig = S._sil_pairs
        S._sil_pairs = hof_sil_pairs
        try:
            return S.q_silhouette_score(spark, sf_dir)
        finally:
            S._sil_pairs = orig
    if name == "similarity_topk":
        return hof_topk(spark, sf_dir) if old else S.q_similarity_topk(
            spark, sf_dir)
    if name == "calibration_ece":
        return hof_ece(spark, sf_dir) if old else S.q_calibration_ece(
            spark, sf_dir)
    raise KeyError(name)


NAMES = ["dbscan_clusters", "silhouette_score", "calibration_ece",
         "similarity_topk"]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session("ab_allpairs")
    with open("/proc/loadavg") as f:
        print("loadavg:", f.read().strip())
    build(spark, "/root/testdata/sf0.001", "similarity_topk", False
          ).write.format("noop").mode("overwrite").save()
    times = {n: {"A": [], "B": []} for n in NAMES}
    rows = {n: {} for n in NAMES}
    for _ in range(4):
        for tag, old in (("A", True), ("B", False)):
            clear_caches(spark)
            for name in NAMES:
                t0 = time.perf_counter()
                df = build(spark, sf_dir, name, old)
                df.write.format("noop").mode("overwrite").save()
                times[name][tag].append(
                    round(time.perf_counter() - t0, 3))
                rows[name][tag] = sorted(map(tuple, df.collect()))
    for name in NAMES:
        assert rows[name]["A"] == rows[name]["B"], f"{name} outputs differ"
        print(f"{name}: outputs identical ({len(rows[name]['A'])} rows)")
        for tag in ("A", "B"):
            ts = sorted(times[name][tag])
            print(" ", tag, times[name][tag], "min", ts[0],
                  "median", ts[len(ts) // 2])


if __name__ == "__main__":
    main()
