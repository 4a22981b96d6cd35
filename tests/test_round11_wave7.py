"""Property pins for the round-11 wave-7 operators (ranker win-rate,
mode, geometric mean, gaps/islands, zone-map audit)."""

from __future__ import annotations

import math
from collections import defaultdict

import pyarrow.parquet as pq


def test_ranker_winrate_partitions_queries(spark, sf_dir):
    from gasket_rs_spark.operators.similarity import q_ranker_winrate

    r = q_ranker_winrate(spark, sf_dir).collect()[0]
    assert r["a_wins"] + r["b_wins"] + r["ties"] == r["n_queries"]
    n_q = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id"])
    want = sum(1 for v in n_q["vec_id"].to_pylist() if v % 100 == 0)
    assert r["n_queries"] == want
    assert r["mean_delta6"] == (
        r["delta_sum6"] // r["n_queries"]
        if r["delta_sum6"] >= 0 or r["delta_sum6"] % r["n_queries"] == 0
        else r["delta_sum6"] // r["n_queries"] + 1
    )


def test_agg_mode_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.relational import q_agg_mode

    o = pq.read_table(f"{sf_dir}/orders.parquet",
                      columns=["o_custkey", "o_orderpriority"])
    c = pq.read_table(f"{sf_dir}/customer.parquet",
                      columns=["c_custkey", "c_mktsegment"])
    seg = dict(zip(c["c_custkey"].to_pylist(), c["c_mktsegment"].to_pylist()))
    counts = defaultdict(int)
    for ck, pr in zip(o["o_custkey"].to_pylist(),
                      o["o_orderpriority"].to_pylist()):
        counts[(seg[ck], pr)] += 1
    per_seg = defaultdict(list)
    for (s, pr), n in counts.items():
        per_seg[s].append((-n, pr))
    want = {s: (min(v)[1], -min(v)[0]) for s, v in per_seg.items()}
    got = {r["c_mktsegment"]: (r["mode_priority"], r["mode_count"])
           for r in q_agg_mode(spark, sf_dir).collect()}
    assert got == want


def test_gaps_islands_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.relational import q_gaps_islands

    t = pq.read_table(f"{sf_dir}/orders.parquet",
                      columns=["o_orderkey", "o_orderstatus"])
    keys = sorted(k for k, s in zip(t["o_orderkey"].to_pylist(),
                                    t["o_orderstatus"].to_pylist()) if s == "F")
    kset = set(keys)
    islands = sum(1 for k in keys if k - 1 not in kset)
    r = q_gaps_islands(spark, sf_dir).collect()[0]
    assert (r["n_keys"], r["key_min"], r["key_max"], r["n_islands"],
            r["total_missing"]) == (
        len(keys), keys[0], keys[-1], islands,
        keys[-1] - keys[0] + 1 - len(keys))


def test_geometric_mean_below_arithmetic(spark, sf_dir):
    """AM-GM: the geometric mean must sit below the arithmetic mean of
    the same group (strict here — prices are not all equal), and above
    the group minimum. Property pin, not a recompute: a python ln could
    differ from the engines' by an ulp at the snap boundary."""
    from gasket_rs_spark.operators.stats import q_agg_geometric_mean

    o = pq.read_table(f"{sf_dir}/orders.parquet",
                      columns=["o_orderpriority", "o_totalprice"])
    groups = defaultdict(list)
    for pr, p in zip(o["o_orderpriority"].to_pylist(),
                     o["o_totalprice"].to_pylist()):
        groups[pr].append(p)
    for r in q_agg_geometric_mean(spark, sf_dir).collect():
        vals = groups[r["o_orderpriority"]]
        am_cents = sum(vals) / len(vals) * 100
        assert r["n_orders"] == len(vals)
        assert min(vals) * 100 - 1 <= r["geo_mean_cents"] < am_cents
        # sanity: within 0.2% of python's float geo mean
        gm = math.exp(sum(math.log(v) for v in vals) / len(vals)) * 100
        assert abs(r["geo_mean_cents"] - gm) / gm < 0.002


def test_zonemap_prune_monotone_with_full_endpoints(spark, sf_dir):
    from gasket_rs_spark.operators.warehouse import q_zonemap_pruning_audit

    rows = sorted(q_zonemap_pruning_audit(spark, sf_dir).collect(),
                  key=lambda r: r["cut_day"])
    pruned = [r["n_pruned"] for r in rows]
    assert pruned == sorted(pruned)  # later cutoffs prune at least as much
    assert pruned[0] == 0  # 1995-01-01 precedes all data
    assert pruned[-1] == rows[-1]["n_files"]  # 2002-01-01 follows all data
    for r in rows:
        assert 0 <= r["prune6"] <= 1_000_000
