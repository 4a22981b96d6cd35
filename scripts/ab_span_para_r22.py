"""Interleaved A/B (r22): text_span_dedup (grams lazy-checkpointed +
n_tokens from size(split) instead of a second corpus explode) and
dedup_simhash_paragraph (paras lazy-checkpointed across its three union
branches) vs their pre-r22 shapes. Asserts identical collected outputs.
Protocol: scripts/ab_triangles_r10.py."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from gasket_rs_spark.operators import dedup as D
from gasket_rs_spark.operators.text import _SPAN_W
from gasket_rs_spark.session import clear_caches, get_session
from gasket_rs_spark.tables import load


def old_span_dedup(docs):
    """span_dedup as shipped in r21: no grams checkpoint, counts from a
    second corpus explode."""
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    gram = F.concat(
        F.col("tok"),
        *[x for i in range(1, _SPAN_W)
          for x in (F.lit(" "), F.lead("tok", i).over(w))],
    )
    grams = toks.withColumn("gram", gram).where(F.col("gram").isNotNull())
    firsts = grams.groupBy("gram").agg(
        F.min(F.struct("doc_id", "pos")).alias("first_k"))
    dup_spans = (
        grams.join(firsts, "gram")
        .where(F.struct("doc_id", "pos") > F.col("first_k"))
        .select("doc_id", F.col("pos").alias("s"),
                (F.col("pos") + _SPAN_W).alias("e")))
    w_span = Window.partitionBy("doc_id").orderBy("s", "e")
    prev_end = F.max("e").over(
        w_span.rowsBetween(Window.unboundedPreceding, -1))
    islands = dup_spans.withColumn(
        "new_island",
        F.when(prev_end.isNull() | (F.col("s") > prev_end), 1).otherwise(0),
    ).withColumn(
        "island",
        F.sum("new_island").over(
            w_span.rowsBetween(Window.unboundedPreceding, 0)),
    )
    removed = (
        islands.groupBy("doc_id", "island")
        .agg(F.min("s").alias("is_s"), F.max("e").alias("is_e"),
             F.count("*").alias("n_w"))
        .groupBy("doc_id")
        .agg(F.sum(F.col("is_e") - F.col("is_s")).alias("n_removed"),
             F.sum("n_w").alias("n_dup_windows")))
    counts = toks.groupBy("doc_id").agg(F.count("*").alias("n_tokens"))
    keep = (F.col("n_tokens") - F.col("n_removed")) / F.col("n_tokens")
    return (
        counts.join(removed, "doc_id", "left")
        .select(
            "doc_id", "n_tokens",
            F.coalesce("n_dup_windows", F.lit(0)).cast("bigint")
            .alias("n_dup_windows"),
            F.coalesce("n_removed", F.lit(0)).cast("bigint")
            .alias("n_removed"))
        .withColumn("keep_ratio", F.floor(keep * 1e6 + F.lit(0.5)) / 1e6))


_ORIG_PARA = D._paragraph_corpus


def old_paragraph_corpus(spark, sf_dir):
    """_paragraph_corpus as shipped in r21: its only checkpoint (paras)
    bypassed via a scoped identity patch."""
    cls = type(spark.range(1))
    orig = cls.localCheckpoint
    cls.localCheckpoint = lambda self, eager=True: self
    try:
        return _ORIG_PARA(spark, sf_dir)
    finally:
        cls.localCheckpoint = orig


def build(spark, sf_dir, name, old):
    if name == "text_span_dedup":
        from gasket_rs_spark.operators.text import q_text_span_dedup

        if old:
            return old_span_dedup(load(spark, sf_dir, "documents"))
        return q_text_span_dedup(spark, sf_dir)
    if name == "dedup_simhash_paragraph":
        if not old:
            return D.q_dedup_simhash_paragraph(spark, sf_dir)
        orig = D._paragraph_corpus
        D._paragraph_corpus = old_paragraph_corpus
        try:
            return D.q_dedup_simhash_paragraph(spark, sf_dir)
        finally:
            D._paragraph_corpus = orig
    raise KeyError(name)


NAMES = ["text_span_dedup", "dedup_simhash_paragraph"]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session("ab_span_para")
    with open("/proc/loadavg") as f:
        print("loadavg:", f.read().strip())
    build(spark, "/root/testdata/sf0.001", "dedup_simhash_paragraph", False
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
                times[name][tag].append(round(time.perf_counter() - t0, 3))
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
