"""Interleaved A/B (r22, guide §2): similarity_topk's scale-adaptive
repartition before the pair-expanding broadcast join.

A = shipped (repartition(defaultParallelism) on the corpus side).
B = repartition patched to identity (pre-fix form: pair scoring
    inherits the scan's split count — ONE task when the corpus is a
    single row group).

Run at sf0.1 (must be a wash — tiny corpus) and at sf1 (the win).
Outputs asserted identical.

Usage: python scripts/ab_topk_repart_r22.py [SF_DIR] [ROUNDS]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gasket_rs_spark.session import clear_caches, get_session


def build(spark, sf_dir, with_repart):
    from gasket_rs_spark.operators.similarity import q_similarity_topk

    if with_repart:
        return q_similarity_topk(spark, sf_dir)
    cls = type(spark.range(1))
    orig = cls.repartition

    def _identity(self, *a, **k):
        return self

    cls.repartition = _identity
    try:
        return q_similarity_topk(spark, sf_dir)
    finally:
        cls.repartition = orig


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_session("ab_topk_repart")
    with open("/proc/loadavg") as f:
        print("loadavg:", f.read().strip())
    build(spark, "/root/testdata/sf0.001", True).write.format("noop").mode(
        "overwrite"
    ).save()
    times = {"A": [], "B": []}
    rows = {}
    for _ in range(rounds):
        for tag, rp in (("A", True), ("B", False)):
            clear_caches(spark)
            t0 = time.perf_counter()
            df = build(spark, sf_dir, rp)
            df.write.format("noop").mode("overwrite").save()
            times[tag].append(round(time.perf_counter() - t0, 3))
            rows[tag] = sorted(map(tuple, df.collect()))
            clear_caches(spark)
    assert rows["A"] == rows["B"], "outputs differ"
    print("outputs identical:", len(rows["A"]), "rows, sf_dir:", sf_dir)
    for tag, label in (("A", "repartition"), ("B", "scan-splits")):
        ts = sorted(times[tag])
        print(f"{tag} {label:12s} {times[tag]} min {ts[0]} median {ts[len(ts) // 2]}")


if __name__ == "__main__":
    main()
