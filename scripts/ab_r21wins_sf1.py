"""sf1 A/B for r21's shared-subtree wins (VERDICT r21 #2 "Done"
criterion: the scan-halving changes should show measurable deltas at a
SF that isn't scheduler-bound).

A = shipped form (lazy/eager localCheckpoint shares the subtree).
B = localCheckpoint patched to IDENTITY (subtrees recompute — the
    pre-r21 plan shape for these queries).

Interleaved, outputs asserted identical. asof_join's r21 change (union
of two scans -> one isin scan) is not checkpoint-based and can't be
reconstructed by a patch; it is timed in bench_sf1.py only.

Usage: python scripts/ab_r21wins_sf1.py [SF_DIR] [ROUNDS]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gasket_rs_spark.session import clear_caches, get_session

QUERIES = ["tpch_q2_min_cost_supplier", "text_tfidf_top", "deletion_vector_scan"]


def build(spark, sf_dir, name, share):
    from gasket_rs_spark.registry import all_queries

    fn = all_queries()[name]
    if share:
        return fn(spark, sf_dir)
    cls = type(spark.range(1))
    orig = cls.localCheckpoint

    def _identity(self, eager=True):
        return self

    cls.localCheckpoint = _identity
    try:
        return fn(spark, sf_dir)
    finally:
        cls.localCheckpoint = orig


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata_local/sf1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_session("ab_r21wins_sf1")
    with open("/proc/loadavg") as f:
        print("loadavg:", f.read().strip())
    for name in QUERIES:
        build(spark, "/root/testdata/sf0.001", name, True).write.format(
            "noop"
        ).mode("overwrite").save()
        times = {"A": [], "B": []}
        rows = {}
        for _ in range(rounds):
            for tag, share in (("A", True), ("B", False)):
                clear_caches(spark)
                t0 = time.perf_counter()
                df = build(spark, sf_dir, name, share)
                df.write.format("noop").mode("overwrite").save()
                times[tag].append(round(time.perf_counter() - t0, 3))
                rows[tag] = sorted(map(tuple, df.collect()))
                clear_caches(spark)
        assert rows["A"] == rows["B"], f"{name}: outputs differ"
        for tag, label in (("A", "shared (shipped)"), ("B", "unshared (pre-r21)")):
            ts = sorted(times[tag])
            print(
                f"{name:28s} {label:20s} {times[tag]} min {ts[0]}"
                f" median {ts[len(ts) // 2]}"
            )


if __name__ == "__main__":
    main()
