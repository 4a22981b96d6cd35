"""Property pins for the round-11 wave-10 operators (TextRank keywords,
deletion-vector scan, delta-join IVM, k-center coreset)."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import pyarrow.parquet as pq


def test_textrank_structure_and_mass(spark, sf_dir):
    from gasket_rs_spark.operators.text import (
        _TEXTRANK_MIN_LEN,
        _TEXTRANK_TOPK,
        q_keyword_textrank,
    )

    rows = q_keyword_textrank(spark, sf_dir).collect()
    assert len(rows) <= _TEXTRANK_TOPK
    assert all(len(r["word"]) >= _TEXTRANK_MIN_LEN for r in rows)
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # vocabulary sanity: every keyword occurs in the corpus
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    vocab = set()
    for text in t["text"].to_pylist():
        vocab.update(text.split(" "))
    assert all(r["word"] in vocab for r in rows)


def test_textrank_pagerank_mass_conserved(spark, sf_dir):
    """The damped PageRank over the word graph must distribute unit
    probability mass (dangling redistribution included)."""
    from pyspark.sql import functions as F

    from gasket_rs_spark.operators.graph import pagerank
    from gasket_rs_spark.operators.text import _TEXTRANK_MIN_LEN
    from gasket_rs_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        F.filter(
            F.split("text", " "), lambda t: F.length(t) >= _TEXTRANK_MIN_LEN
        ).alias("ts")
    ).where(F.size("ts") >= 2)
    pairs = toks.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("ts"), 1, F.size("ts") - 1),
                F.slice(F.col("ts"), 2, F.size("ts") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    e = pairs.where(F.col("w1") != F.col("w2"))
    edges = (
        e.select(F.col("w1").alias("src"), F.col("w2").alias("dst"))
        .unionAll(e.select(F.col("w2").alias("src"), F.col("w1").alias("dst")))
        .distinct()
    )
    nodes = edges.select(F.col("src").alias("node")).distinct()
    total = pagerank(nodes, edges).agg(F.sum("pr")).collect()[0][0]
    assert abs(total - 1.0) < 1e-6


def _md5_hex(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_deletion_vector_scan_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.warehouse import (
        _DV_DELETED_FILES,
        _DV_FILES,
        _DV_U16_CUT,
        q_deletion_vector_scan,
    )

    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity"],
    )
    per_file = defaultdict(list)
    for ok, ln, q in zip(
        t["l_orderkey"].to_pylist(),
        t["l_linenumber"].to_pylist(),
        t["l_quantity"].to_pylist(),
    ):
        fid = int(_md5_hex(str(ok))[:2], 16) % _DV_FILES
        per_file[fid].append((ok, ln, math.floor(q * 100 + 0.5)))
    want = {}
    for fid, rows in per_file.items():
        rows.sort()
        deleted = 0
        live_qty = 0
        for ok, ln, qc in rows:
            dead = fid < _DV_DELETED_FILES and (
                int(_md5_hex(f"{ok}:{ln}:dv")[:4], 16) < _DV_U16_CUT
            )
            if dead:
                deleted += 1
            else:
                live_qty += qc
        want[fid] = (len(rows), deleted, len(rows) - deleted, live_qty)
    got = {
        r["file_id"]: (r["n_rows"], r["n_deleted"], r["n_live"], r["live_qty_cents"])
        for r in q_deletion_vector_scan(spark, sf_dir).collect()
    }
    assert got == want


def test_incremental_join_maintenance_consistent(spark, sf_dir):
    from gasket_rs_spark.operators.warehouse import q_incremental_join_maintenance

    rows = q_incremental_join_maintenance(spark, sf_dir).collect()
    assert rows and all(r["consistent"] for r in rows)
    # the deltas are non-trivial: the split must not be degenerate
    assert all(r["n_full"] > 0 for r in rows)


def test_kcenter_coreset_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.similarity import _KC_K, q_kcenter_coreset

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = {
        vid: [float(x) for x in emb]
        for vid, emb in zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist())
    }

    def fold_sq(v):
        acc = 0.0
        for x in v:
            acc = acc + x * x
        return acc

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    sq = {vid: fold_sq(v) for vid, v in vecs.items()}
    selected = [min(vecs)]
    mind = {0: 0}
    for step in range(1, _KC_K):
        best = None
        for vid, v in vecs.items():
            if vid in selected:
                continue
            d6 = min(
                math.floor((sq[vid] + sq[s] - 2 * fold_dot(v, vecs[s])) * 1e6 + 0.5)
                for s in selected
            )
            cand = (-d6, vid)
            if best is None or cand < best:
                best = cand
        selected.append(best[1])
        mind[step] = -best[0]
    rows = q_kcenter_coreset(spark, sf_dir).collect()
    assert [r["vec_id"] for r in sorted(rows, key=lambda r: r["step"])] == selected
    assert {r["step"]: r["mind6"] for r in rows} == mind
    # farthest-point property: the selected max-min distance shrinks
    ds = [mind[s] for s in range(1, _KC_K)]
    assert ds == sorted(ds, reverse=True)
