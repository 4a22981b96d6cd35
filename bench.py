"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

The headline set spans every operator family (relational, windows, as-of,
dedup incl. MinHash-LSH + banded SimHash + LSH-fed components, similarity,
text, multimodal pandas-UDF, event-time streaming twins) — and measures
only SCALE paths. The intentionally-quadratic correctness witnesses
(all-pairs Jaccard / cosine) are excluded from the headline metric; run
``python bench.py --witnesses`` to time those separately.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "flagship_revenue_by_region",
    "agg_hash",
    "join_theta_range",
    "asof_join",
    "rollup_agg",
    "window_frames",
    "topk_per_group",
    "json_funcs",
    "array_funcs",
    "dedup_exact",
    "dedup_incremental",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_components_lsh",
    "similarity_topk",
    "similarity_ann_lsh",
    "text_token_counts",
    "text_quality_score",
    "text_tfidf_top",
    "multimodal_features",
    "stream_tumbling",
    "stream_session",
]

# Quadratic-by-design correctness witnesses: timed only under --witnesses,
# never part of the headline metric (they measure exactly the thing the
# dedup module documents must never run at scale).
WITNESSES = [
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_components",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from gasket_rs_spark.registry import all_queries
    from gasket_rs_spark.session import get_session

    spark = get_session("gasket-bench")
    queries = all_queries()

    # Warm the JVM/codegen path outside timing (tiny SF).
    queries["flagship_revenue_by_region"](spark, "/root/testdata/sf0.001").collect()

    names = WITNESSES if "--witnesses" in sys.argv[1:] else HEADLINE
    timings: dict[str, float] = {}
    for name in names:
        fn = queries[name]
        t0 = time.perf_counter()
        # noop sink: evaluates the complete plan (count() would let
        # Catalyst prune projections and under-measure).
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "witness_queries_total_sec"
                if "--witnesses" in sys.argv[1:]
                else "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
