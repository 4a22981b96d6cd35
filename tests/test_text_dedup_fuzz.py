"""Randomized differential fuzz for the cross-document dedup passes:
synthetic corpora from a TINY vocabulary (forcing heavy n-gram
collisions, shared boilerplate, shifted copies) are run through the
Spark operators AND the same DuckDB oracle SQL the driver uses —
exactly the driver's check, but on adversarial data the fixture never
produces.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest



# Fuzz lane (VERDICT r14 #4): randomized/property spec — excluded from
# the default pytest lane (see pytest.ini); run via -m fuzz.
pytestmark = pytest.mark.fuzz

def _random_corpus(seed: int) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(6)]  # tiny -> dense collisions
    boiler = " ".join(rng.choices(vocab, k=rng.randint(8, 12)))
    docs = []
    for doc_id in range(rng.randint(6, 12)):
        n = rng.randint(0, 30)
        toks = rng.choices(vocab, k=n)
        # inject the shared boilerplate at a random position in ~half
        if rng.random() < 0.5:
            pos = rng.randint(0, max(len(toks) - 1, 0)) if toks else 0
            toks = toks[:pos] + boiler.split(" ") + toks[pos:]
        docs.append((doc_id, " ".join(toks)))
    return docs


def _oracle(sql: str, docs: list[tuple[int, str]]):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(docs, columns=["doc_id", "text"])
    )
    rel = con.execute(sql)
    cols = [d[0] for d in rel.description]
    return {tuple(r[cols.index(c)] for c in sorted(cols)) for r in rel.fetchall()}


def _spark_rows(df):
    cols = sorted(df.columns)
    return {tuple(r[c] for c in cols) for r in df.collect()}


@pytest.mark.parametrize("seed", range(4))
def test_span_dedup_fuzz_vs_duckdb(spark, seed):
    from gasket_rs_spark.operators.text import ORACLES, span_dedup

    docs = _random_corpus(100 + seed)
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = _spark_rows(span_dedup(sdf))
    want = _oracle(ORACLES["text_span_dedup"], docs)
    assert got == want


@pytest.mark.parametrize("seed", range(4))
def test_line_dedup_fuzz_vs_duckdb(spark, seed):
    from gasket_rs_spark.operators.text import ORACLES, line_dedup

    docs = _random_corpus(200 + seed)
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = _spark_rows(line_dedup(sdf))
    want = _oracle(ORACLES["text_line_dedup"], docs)
    assert got == want


def _py_winnow(text: str):
    """Independent pure-Python winnowing reference (k=5, w=4): md5 each
    5-token gram, take the min hex digest per window of 4 consecutive
    gram hashes (full windows only), distinct."""
    import hashlib

    toks = text.split(" ")
    grams = [" ".join(toks[i : i + 5]) for i in range(len(toks) - 4)]
    hs = [hashlib.md5(g.encode()).hexdigest() for g in grams]
    return {min(hs[i : i + 4]) for i in range(len(hs) - 3)}


def test_winnowing_matches_python_reference(spark):
    from gasket_rs_spark.operators.text import winnow_fingerprints

    docs = [
        (1, "a b c d e f g h i j k l m n"),
        (2, "x y z q r s t u v w"),
        (3, "one two three four five six seven eight"),  # exactly k+w-1 tokens
        (4, "short doc"),  # no full gram window -> no fingerprints
    ]
    df = spark.createDataFrame(docs, "doc_id: bigint, text: string")
    got: dict[int, set] = {}
    for r in winnow_fingerprints(df).collect():
        got.setdefault(r.doc_id, set()).add(r.mh)
    expected = {d: _py_winnow(t) for d, t in docs if len(_py_winnow(t))}
    assert got == expected


def test_winnowing_guarantee_detects_shared_passage(spark):
    """Schleimer et al. 2003: any exact match of >= k+w-1 tokens shares
    at least one selected fingerprint."""
    from gasket_rs_spark.operators.text import winnow_pairs

    passage = "the quick brown fox jumps over the lazy dog tonight"  # 10 tokens
    docs = [
        (1, "alpha beta gamma " + passage + " delta epsilon"),
        (2, "uno dos tres cuatro " + passage + " cinco seis siete"),
        (3, "completely different filler words with no overlap at all here"),
    ]
    df = spark.createDataFrame(docs, "doc_id: bigint, text: string")
    rows = winnow_pairs(df).collect()
    pairs = {(r.doc_a, r.doc_b): r.n_shared for r in rows}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    assert all(3 not in k for k in pairs)
