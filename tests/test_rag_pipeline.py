"""Pins for the round-12 RAG retrieval composite (VERDICT r11 #4):
BM25 sparse + dense cosine → RRF fusion → MaxSim re-rank, one lazy plan.

The driver oracle hash-checks the output; these pins cover what a hash
can't see: a full pure-Python recompute of all four stages (the strongest
pin — every rank, every integer score), and the structural claim that the
late-interaction stage genuinely REORDERS the fused pool on this fixture
(otherwise the re-rank stage would be dead code the hash still passes).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq

_QMOD, _TERMS, _POOL, _TOPK = 100, 8, 20, 10
_K1, _B, _RRF_K = 1.2, 0.75, 60
_SUBS = 8


def _fold_dot(a, b):
    """Sequential left-to-right fold — the exact reduction order of
    Spark's ``aggregate(zip_with(...))`` and DuckDB's list_dot_product
    (the pairing every EXACT similarity witness already relies on)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _pure_python_rag(sf_dir):
    # the retrievable index = embedded documents only (at larger SFs the
    # documents table outgrows the embeddings table)
    embedded = set(
        pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id"])[
            "vec_id"
        ].to_pylist()
    )
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    tf = {}
    for did, txt in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        if did in embedded:
            tf[did] = Counter(txt.split(" "))
    n_docs = float(len(tf))
    dl = {d: sum(c.values()) for d, c in tf.items()}
    avg_dl = sum(dl.values()) / n_docs
    df = Counter()
    for c in tf.values():
        df.update(c.keys())

    queries = sorted(d for d in tf if d % _QMOD == 0)
    sparse_pool = {}
    for q in queries:
        qts = sorted(tf[q], key=lambda t: (df[t], t))[:_TERMS]
        s6 = defaultdict(int)
        for t in qts:
            idf = math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            for d, cnts in tf.items():
                if d == q or t not in cnts:
                    continue
                tfv = cnts[t]
                c6 = math.floor(
                    idf * tfv * (_K1 + 1)
                    / (tfv + _K1 * (1 - _B + _B * dl[d] / avg_dl))
                    * 1e6 + 0.5
                )
                s6[d] += c6
        order = sorted(s6, key=lambda d: (-s6[d], d))[:_POOL]
        sparse_pool[q] = {d: r + 1 for r, d in enumerate(order)}

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = {
        i: [float(x) for x in v]
        for i, v in zip(emb["vec_id"].to_pylist(), emb["embedding"].to_pylist())
    }
    nrm = {i: math.sqrt(_fold_dot(v, v)) for i, v in vecs.items()}
    nrm8 = {
        i: [
            math.sqrt(_fold_dot(v[k * 8 : k * 8 + 8], v[k * 8 : k * 8 + 8]))
            for k in range(_SUBS)
        ]
        for i, v in vecs.items()
    }
    dense_pool = {}
    for q in queries:
        c6 = {
            d: math.floor(
                _fold_dot(vecs[q], vecs[d]) / (nrm[q] * nrm[d]) * 1e6 + 0.5
            )
            for d in vecs
            if d != q
        }
        order = sorted(c6, key=lambda d: (-c6[d], d))[:_POOL]
        dense_pool[q] = {d: r + 1 for r, d in enumerate(order)}

    want = {}
    for q in queries:
        rrf9 = defaultdict(int)
        for d, r in dense_pool[q].items():
            rrf9[d] += 1_000_000_000 // (_RRF_K + r)
        for d, r in sparse_pool[q].items():
            rrf9[d] += 1_000_000_000 // (_RRF_K + r)
        fused = sorted(rrf9, key=lambda d: (-rrf9[d], d))[:_TOPK]
        scored = []
        for fr, d in enumerate(fused, start=1):
            ms6 = 0
            for i in range(_SUBS):
                best = None
                for j in range(_SUBS):
                    dot = _fold_dot(
                        vecs[q][i * 8 : i * 8 + 8], vecs[d][j * 8 : j * 8 + 8]
                    )
                    v6 = math.floor(dot / (nrm8[q][i] * nrm8[d][j]) * 1e6 + 0.5)
                    best = v6 if best is None or v6 > best else best
                ms6 += best
            scored.append((d, fr, rrf9[d], ms6))
        order = sorted(scored, key=lambda t: (-t[3], t[0]))
        want[q] = [
            (rr + 1, d, fr, s9, m6) for rr, (d, fr, s9, m6) in enumerate(order)
        ]
    return want


def test_rag_pipeline_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.similarity import q_rag_retrieval_pipeline

    got = defaultdict(list)
    for r in q_rag_retrieval_pipeline(spark, sf_dir).collect():
        got[r["query_id"]].append(
            (r["rerank"], r["doc_id"], r["fused_rank"], r["rrf9"], r["maxsim6"])
        )
    got = {q: sorted(rows) for q, rows in got.items()}
    want = _pure_python_rag(sf_dir)
    assert got == want
    # the MaxSim re-rank must genuinely reorder the fused pool somewhere
    # on this fixture — otherwise the last stage is dead code
    assert any(
        rerank != fused_rank
        for rows in want.values()
        for rerank, _, fused_rank, _, _ in rows
    )
    # and fusion must genuinely mix rankers: some fused doc carries a
    # contribution from each side exclusively somewhere
    singles = {s9 for rows in want.values() for _, _, _, s9, _ in rows}
    assert any(s9 <= 1_000_000_000 // (_RRF_K + 1) for s9 in singles)
