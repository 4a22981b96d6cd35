"""Pin MinHash-LSH recall against the exact-Jaccard witness (SURVEY §2.2
X25), mirroring tests/test_similarity_recall.py for the ANN family.

With 128 permutations as 32 bands x 4 rows the s-curve midpoint sits at
(1/32)^(1/4) ~= 0.42, so pairs at the module's advertised J >= 0.5
threshold are caught with >= ~87% probability per the banding bound; the
seeded permutations make the measured value deterministic (recall 1.0 at
sf0.001: all 28 exact pairs recovered). The floor is set at 0.8 to leave
slack for data regeneration while still failing on any parameter
regression toward the old 8x4 layout (~40% recall at threshold).
"""

from __future__ import annotations

import pytest

from gasket_rs_spark.operators import dedup as D


@pytest.fixture(scope="module")
def exact_pairs(spark, sf_dir):
    return {(r.doc_a, r.doc_b) for r in D.q_dedup_ngram_jaccard(spark, sf_dir).collect()}


def test_minhash_lsh_recall_floor(spark, sf_dir, exact_pairs):
    lsh = {(r.doc_a, r.doc_b) for r in D.q_dedup_minhash_lsh(spark, sf_dir).collect()}
    assert exact_pairs, "witness produced no pairs — fixture data changed?"
    # Precision is 1.0 by construction (exact-Jaccard verify on candidates).
    assert lsh <= exact_pairs, f"LSH emitted non-pairs: {sorted(lsh - exact_pairs)[:5]}"
    recall = len(lsh & exact_pairs) / len(exact_pairs)
    assert recall >= 0.8, f"recall {recall:.2f} below floor 0.8"


def test_minhash_band_layout_midpoint():
    """The banding parameters must keep the s-curve midpoint below the
    advertised Jaccard threshold — otherwise threshold-grade pairs are
    systematically missed (the round-2 defect this test pins)."""
    midpoint = (1.0 / D._BANDS) ** (1.0 / D._ROWS_PER_BAND)
    assert D._BANDS * D._ROWS_PER_BAND == D._N_HASHES
    assert midpoint < D._JACCARD_THRESHOLD, (
        f"s-curve midpoint {midpoint:.2f} >= threshold {D._JACCARD_THRESHOLD}"
    )


def test_containment_matches_python_reference(spark, sf_dir):
    """Independent pure-Python recompute of ordered containment pairs
    (threshold 4/5) over the fixture corpus — full set equality."""
    from gasket_rs_spark.operators.dedup import q_dedup_containment
    from gasket_rs_spark.tables import load

    sh = {}
    for r in load(spark, sf_dir, "documents").select("doc_id", "text").collect():
        toks = r.text.split(" ")
        s = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        if s:
            sh[r.doc_id] = s
    expected = {}
    for a, sa in sh.items():
        for b, sb in sh.items():
            if a == b or 5 * len(sb) < 4 * len(sa):
                continue
            inter = len(sa & sb)
            if 5 * inter >= 4 * len(sa):
                expected[(a, b)] = (len(sa), inter, inter * 1_000_000 // len(sa))
    rows = q_dedup_containment(spark, sf_dir).collect()
    got = {(r.doc_a, r.doc_b): (r.n_a, r.n_common, r.containment6) for r in rows}
    assert got == expected
