"""Headline bench pass at sf1 (VERDICT r21 #2) — ADDITIVE evidence only.

bench.py (the driver contract) is untouched; this script reuses its
machinery to time the SAME headline queries with the SAME methodology
(clear_caches between passes, noop sink, per-query perf_counter,
per-pass co-tenancy meter) against the tiled sf1 fixture from
scripts/gen_sf_fixture.py, and writes BENCH_DETAIL_sf1_r{tag}.json
beside the sf0.1 details. The sf0.1 one-line JSON contract is
unaffected.

Usage:
    python scripts/bench_sf1.py [SF_DIR] [TAG] [PASSES]
    # defaults: /root/testdata_local/sf1  r22  3
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (HEADLINE lists + meter/gate helpers)
from gasket_rs_spark.registry import all_queries  # noqa: E402
from gasket_rs_spark.session import clear_caches, get_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata_local/sf1"
    tag = sys.argv[2] if len(sys.argv) > 2 else "r22"
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    load_gate = bench._load_gate()
    spark = get_session("gasket-bench-sf1")
    queries = all_queries()
    # same warm-up as bench.py (JVM codegen + Python/Arrow worker pool)
    queries["flagship_revenue_by_region"](spark, "/root/testdata/sf0.001").collect()
    queries["dedup_minhash_lsh"](spark, "/root/testdata/sf0.001").collect()

    names = list(dict.fromkeys(bench.HEADLINE + bench.HEADLINE_V1))
    samples = {n: [] for n in names}
    pass_loads = []
    meter = bench._PassMeter()
    for _ in range(passes):
        clear_caches(spark)
        meter.start()
        for name in names:
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples[name].append(time.perf_counter() - t0)
        pass_loads.append({"phase": "headline_sf1", **meter.stop()})

    timings = {n: round(sorted(ts)[len(ts) // 2], 3) for n, ts in samples.items()}
    timings_min = {n: round(min(ts), 3) for n, ts in samples.items()}
    detail = {
        "metric": "headline_queries_total_sec_sf1",
        "value": round(sum(timings[n] for n in bench.HEADLINE), 3),
        "unit": "sec",
        "sf": 1.0,
        "sf_dir": sf_dir,
        "fixture_recipe": "scripts/gen_sf_fixture.py (sf0.1 x10 tiling)",
        "queries": timings,
        "queries_min": timings_min,
        "samples": {n: [round(v, 3) for v in ts] for n, ts in samples.items()},
        "passes": passes,
        "headline_min_total_sec": round(
            sum(timings_min[n] for n in bench.HEADLINE), 3
        ),
        "headline_v1_min_total_sec": round(
            sum(timings_min[n] for n in bench.HEADLINE_V1), 3
        ),
        "pass_loads": pass_loads,
        "load_gate": load_gate,
    }
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"BENCH_DETAIL_sf1_{tag}.json",
    )
    with open(out_path, "w") as f:
        json.dump(detail, f, indent=1)
    print(json.dumps({k: detail[k] for k in ("metric", "value", "headline_min_total_sec", "passes")}))
    spark.stop()


if __name__ == "__main__":
    main()
