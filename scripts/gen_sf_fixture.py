"""Deterministic sf1 fixture recipe (VERDICT r21 #2).

The driver's testdata stops at sf0.1, where every headline query is
scheduler-bound at local[32] (all 23 r21 scaling ratios <= 1) and
plan-level wins are invisible. This script tiles the committed sf0.1
fixture REPLICAS times into an sf1-shaped dataset so a 32-core bench
pass can resolve shuffle/scan improvements. It is a pure function of
the source parquet — no RNG anywhere — so the fixture is reproducible
bit-for-bit from the recipe.

Tiling model: R independent shards of the same distribution, with
per-shard key spaces kept disjoint by adding a per-table stride.

- Every stride is the smallest multiple of the LCM of all literal
  moduli the operators apply to that key (collected by grep, asserted
  below) that exceeds the key range, so `key % m` selections (query
  picks, incremental-batch splits, modality assignment, item classes)
  hit each replica with exactly the source fraction.
- documents.text in replica r>0 gets each token prefixed with "r{r}"
  (token COUNT and within-replica duplicate/near-duplicate structure
  preserved exactly; cross-replica shingle/vocab overlap eliminated, so
  dedup/LSH workloads scale like independent shards instead of
  manufacturing R-way near-dup cliques). n_chars is recomputed to keep
  the n_chars == len(text) invariant.
- doc_id and vec_id share ONE stride: several similarity/RAG operators
  join documents to embeddings on doc_id == vec_id, and the alignment
  must survive tiling.
- embeddings in replica r are np.roll(vec, r): norms and within-replica
  geometry are untouched; cross-replica cosines decorrelate, so
  all-pairs/ANN witnesses scale like R shards rather than R-way
  duplicate vectors.
- events/orders timestamps are NOT shifted: scaling a fixed time window
  means more events per window, which is what the streaming operators
  see at production scale.
- Each scaled table is written as a DIRECTORY of one parquet file per
  replica (`name.parquet/part-r{r}.parquet` — Spark reads the directory
  transparently). A first single-file cut wrote one row group per
  table, which pins every post-scan stage to ONE task no matter how
  many byte splits Spark makes (row-group midpoint assignment) — a file
  layout no 100 TB input would have (guide §6). BENCH_DETAIL_sf1
  r22_before (single-file) vs r22_layout (per-replica files) isolates
  that artifact from real plan costs.

Usage:
    python scripts/gen_sf_fixture.py [SRC] [OUT] [REPLICAS]
    # defaults: /root/testdata/sf0.1 /root/testdata_local/sf1 10
"""
import math
import os
import sys

import numpy as np
import pandas as pd

# key -> literal moduli used on it anywhere in gasket_rs_spark (grep'd;
# see OPTIMIZATION_r22.md). Hash-based selectors (md5(doc_id) % 1024)
# are distribution-preserving under any stride and are not listed.
MODULI = {
    "c_custkey": [2],
    "o_orderkey": [4, 7, 10, 99991, 100],  # 100 covers `orderkey div 100`
    "p_partkey": [12, 256],
    "s_suppkey": [256],
    "event_id": [3],
    "user_id": [97],
    "doc_vec": [2, 3, 4, 5, 53, 100],
}


def _stride(key_max: int, moduli: list[int]) -> int:
    lcm = math.lcm(*moduli) if moduli else 1
    return lcm * math.ceil((key_max + 1) / lcm)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata_local/sf1"
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)

    t = {
        name: pd.read_parquet(f"{src}/{name}.parquet")
        for name in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings"
        ).split()
    }

    strides = {
        "cust": _stride(int(t["customer"].c_custkey.max()), MODULI["c_custkey"]),
        "order": _stride(int(t["orders"].o_orderkey.max()), MODULI["o_orderkey"]),
        "part": _stride(int(t["part"].p_partkey.max()), MODULI["p_partkey"]),
        "supp": _stride(int(t["supplier"].s_suppkey.max()), MODULI["s_suppkey"]),
        "event": _stride(int(t["events"].event_id.max()), MODULI["event_id"]),
        "user": _stride(int(t["events"].user_id.max()), MODULI["user_id"]),
        # one shared stride so doc_id == vec_id joins survive tiling
        "doc_vec": _stride(
            max(int(t["documents"].doc_id.max()), int(t["embeddings"].vec_id.max())),
            MODULI["doc_vec"],
        ),
    }
    print("strides:", strides)

    # dimension tables: copy verbatim
    for name in ("region", "nation"):
        t[name].to_parquet(f"{out}/{name}.parquet", index=False)

    # (table, {column: stride_name}) for the plain key-shift tables
    shifted = {
        "customer": {"c_custkey": "cust"},
        "supplier": {"s_suppkey": "supp"},
        "part": {"p_partkey": "part"},
        "orders": {"o_orderkey": "order", "o_custkey": "cust"},
        "lineitem": {
            "l_orderkey": "order",
            "l_partkey": "part",
            "l_suppkey": "supp",
        },
        "events": {"event_id": "event", "user_id": "user"},
    }
    def write_replica(name: str, r: int, rep: pd.DataFrame) -> None:
        d = f"{out}/{name}.parquet"
        os.makedirs(d, exist_ok=True)
        rep.to_parquet(f"{d}/part-r{r:02d}.parquet", index=False)

    for name, keys in shifted.items():
        for r in range(replicas):
            rep = t[name].copy()
            for col, sname in keys.items():
                rep[col] = rep[col] + r * strides[sname]
            write_replica(name, r, rep)
        print(name, "rows:", len(t[name]) * replicas)

    # documents: key shift + per-replica token prefix (replica 0 verbatim)
    for r in range(replicas):
        rep = t["documents"].copy()
        rep["doc_id"] = rep["doc_id"] + r * strides["doc_vec"]
        if r > 0:
            pre = f"r{r}"
            rep["text"] = rep["text"].map(
                lambda s: " ".join(pre + w for w in s.split(" "))
            )
            rep["n_chars"] = rep["text"].str.len().astype("int64")
        write_replica("documents", r, rep)
    print("documents rows:", len(t["documents"]) * replicas)

    # embeddings: key shift + per-replica dimension roll (norm-preserving)
    for r in range(replicas):
        rep = t["embeddings"].copy()
        rep["vec_id"] = rep["vec_id"] + r * strides["doc_vec"]
        if r > 0:
            rep["embedding"] = rep["embedding"].map(
                lambda v: np.roll(np.asarray(v, dtype=np.float32), r)
            )
        write_replica("embeddings", r, rep)
    print("embeddings rows:", len(t["embeddings"]) * replicas)
    print("done ->", out)


if __name__ == "__main__":
    main()
