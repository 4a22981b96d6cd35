"""Block-permutation 64-bit SimHash: completeness and candidate-volume
properties (X25).

The scale claim of operators/dedup.py:_simhash_candidates is Manku-style:
6 blocks, candidates joined on every C(6,3)=20 block-triple key, which is
(a) COMPLETE for Hamming <= 3 by pigeonhole (3 flipped bits touch at most
3 blocks, so some triple of blocks matches exactly) and (b) near-linear in
candidate volume, because each triple key carries ~32 signature bits —
per-key occupancy n/2^32, unlike a single-band 16-bit layout whose 65,536
key space degenerates to ~n^2/65k candidate pairs on any corpus.
"""

from __future__ import annotations

import random

from gasket_rs_spark.operators import dedup as D


def _sig_df(spark, rows):
    return D._simhash_blocks(
        spark.createDataFrame(rows, "doc_id bigint, text string")
    )


def test_near_identical_docs_pair_up(spark):
    """Docs differing by one token land within the Hamming budget and are
    emitted as a pair; unrelated docs are not."""
    base = "the quick brown fox jumps over the lazy dog near the river bank " * 4
    rows = [
        (1, base + "alpha"),
        (2, base + "omega"),
        (3, "completely different text about spark catalyst optimizer plans "
            "shuffle partitions broadcast joins and adaptive execution " * 4),
    ]
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
            d + "/documents.parquet"
        )
        pairs = {(r.doc_a, r.doc_b) for r in D.q_dedup_simhash(spark, d).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_pigeonhole_completeness_exhaustive(spark):
    """Direct pigeonhole check, no text involved: for EVERY way of flipping
    <= 3 of the 64 signature bits, the flipped signature still shares at
    least one block-triple key with the original — i.e. the candidate join
    cannot miss a pair inside the Hamming budget. Exercised on a sample of
    3-bit flip combinations plus all 1- and 2-bit flips on one block
    boundary-heavy base signature."""
    rng = random.Random(13)
    base_sig = rng.getrandbits(64)

    def blocks_of(sig):
        out, off = [], 0
        for w in D._SIMHASH_BLOCK_BITS:
            out.append((sig >> off) & ((1 << w) - 1))
            off += w
        return out

    def shares_triple(sig_a, sig_b):
        ba, bb = blocks_of(sig_a), blocks_of(sig_b)
        return any(
            all(ba[i] == bb[i] for i in triple) for triple in D._SIMHASH_TRIPLES
        )

    flip_sets = [[i] for i in range(64)]
    flip_sets += [[i, j] for i in range(64) for j in range(i + 1, 64) if (i + j) % 7 == 0]
    flip_sets += [sorted(rng.sample(range(64), 3)) for _ in range(300)]
    for flips in flip_sets:
        flipped = base_sig
        for b in flips:
            flipped ^= 1 << b
        assert shares_triple(base_sig, flipped), f"missed pair at flips {flips}"


def test_candidate_volume_stays_subquadratic(spark):
    """On a corpus of unrelated random docs, block-triple candidate pairs
    are ~zero: each triple key carries ~32 signature bits, so random
    collisions run at ~20*n^2/2^32 — an adversarial corpus for the old
    16-bit single-band layout (which produced ~n^2/65k pairs here) now
    yields fewer candidates than documents."""
    rng = random.Random(99)
    n = 400
    rows = [
        (i, " ".join(f"w{rng.randrange(10**9)}" for _ in range(30)))
        for i in range(n)
    ]
    sigs = _sig_df(spark, rows)
    n_candidates = D._simhash_candidates(sigs).count()
    assert n_candidates < n, (
        f"{n_candidates} candidates on {n} unrelated docs — bucketing is broken"
    )


def test_block_values_fit_widths(spark):
    sigs = _sig_df(spark, [(1, "a b c d e f g h"), (2, "x y z w v u t s")])
    for row in sigs.collect():
        for b, w in enumerate(D._SIMHASH_BLOCK_BITS):
            assert 0 <= row[f"block{b}"] < (1 << w)


def test_paragraph_simhash_planted_capture_floors(spark, sf_dir):
    """Planted-capture floors for the paragraph-grain witness (VERDICT
    r8 #9), mirroring the planted-embedding discipline: chunk-REVERSAL
    plants share the exact bag of tokens, so SimHash MUST capture 100%
    of them at Hamming 0-vs-source; one-token-EDIT plants straddle the
    <=3 threshold by construction — capture is measured, floor 0.25."""
    import pyspark.sql.functions as F

    corpus = D._paragraph_corpus(spark, sf_dir)
    n_planted = corpus.where(
        (F.col("doc_id") >= D._PARA_PLANT_ROT)
        & (F.col("doc_id") < D._PARA_PLANT_EDIT)
    ).count()
    assert n_planted > 0, "plant fixture is vacuous"

    rows = {
        r["family"]: r
        for r in D.q_dedup_simhash_paragraph(spark, sf_dir).collect()
    }
    reorder = rows["organic|reorder"]
    assert reorder["n_source_pairs"] == n_planted, (
        f"reorder capture {reorder['n_source_pairs']}/{n_planted} — bag-"
        "of-tokens invariance broke"
    )
    edit = rows.get("organic|edit")
    captured = edit["n_source_pairs"] if edit else 0
    assert captured >= 0.25 * n_planted, (
        f"edit capture {captured}/{n_planted} below the 0.25 floor"
    )


def test_paragraph_reorder_defeats_exact_substring_dedup(spark):
    """The reason this witness exists: reversing a paragraph's 4-token
    chunks escapes the 8-token ExactSubstr span pass ENTIRELY (every
    8-window straddles a seam whose reversed adjacency never occurs in
    the source; windows inside one chunk are only 4 tokens) but is
    Hamming-0 to bag-of-tokens SimHash. A simple ROTATION would NOT
    demonstrate this — it leaves one long contiguous run the span pass
    still catches — which is why the plant is chunk reversal."""
    import pyspark.sql.functions as F

    from gasket_rs_spark.operators.text import span_dedup

    toks = [f"tok{i}" for i in range(24)]
    chunks = [toks[i : i + 4] for i in range(0, 24, 4)]
    reordered = [t for c in reversed(chunks) for t in c]
    docs = spark.createDataFrame(
        [(0, " ".join(toks)), (1, " ".join(reordered))],
        "doc_id long, text string",
    )
    spans = span_dedup(docs)
    assert spans.agg(F.sum("n_removed")).collect()[0][0] == 0
    pairs = D.simhash_pairs(docs).collect()
    assert [(r["doc_a"], r["doc_b"], r["hamming"]) for r in pairs] == [(0, 1, 0)]

    # contrast: rotation by 11 leaves a 13-token contiguous run -> the
    # span pass DOES remove tokens there (the structural difference the
    # plant design rests on)
    rot = spark.createDataFrame(
        [(0, " ".join(toks)), (1, " ".join(toks[11:] + toks[:11]))],
        "doc_id long, text string",
    )
    assert span_dedup(rot).agg(F.sum("n_removed")).collect()[0][0] > 0
