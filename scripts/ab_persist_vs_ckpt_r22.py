"""Interleaved A/B (r22, VERDICT r21 #6): the dedup_minhash_lsh pipeline
with its localCheckpoint sites (A, shipped — lineage TRUNCATED: an
executor loss at cluster scale fails the job) vs the same sites flipped
to persist(MEMORY_AND_DISK) via a scoped class patch (B — lineage kept:
blocks recompute on executor loss). Measures what reliable storage
costs at sf0.1 so SCALE.md's guidance rests on a number, not a guess.
Outputs asserted identical. Protocol: scripts/ab_triangles_r10.py."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel

from gasket_rs_spark.session import clear_caches, get_session


def build(spark, sf_dir, persist):
    from gasket_rs_spark.operators.dedup import q_dedup_minhash_lsh

    if not persist:
        return q_dedup_minhash_lsh(spark, sf_dir)
    cls = type(spark.range(1))
    orig = cls.localCheckpoint

    def _persist(self, eager=True):
        out = self.persist(StorageLevel.MEMORY_AND_DISK)
        if eager:
            out.count()
        return out

    cls.localCheckpoint = _persist
    try:
        return q_dedup_minhash_lsh(spark, sf_dir)
    finally:
        cls.localCheckpoint = orig


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session("ab_persist_ckpt")
    with open("/proc/loadavg") as f:
        print("loadavg:", f.read().strip())
    build(spark, "/root/testdata/sf0.001", False).write.format("noop").mode(
        "overwrite").save()
    times = {"A": [], "B": []}
    rows = {}
    for _ in range(4):
        for tag, persist in (("A", False), ("B", True)):
            clear_caches(spark)
            t0 = time.perf_counter()
            df = build(spark, sf_dir, persist)
            df.write.format("noop").mode("overwrite").save()
            times[tag].append(round(time.perf_counter() - t0, 3))
            rows[tag] = sorted(map(tuple, df.collect()))
            clear_caches(spark)
    assert rows["A"] == rows["B"], "outputs differ"
    print("outputs identical:", len(rows["A"]), "rows")
    for tag in ("A", "B"):
        ts = sorted(times[tag])
        print(tag, times[tag], "min", ts[0], "median", ts[len(ts) // 2])


if __name__ == "__main__":
    main()
