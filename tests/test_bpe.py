"""BPE vocabulary induction vs an independent pure-Python reference
(the MERGE-fuzz pattern): same corpus, same determinism rules, the full
merge table must match exactly — on the real sf0.001 corpus AND on
randomized corpora engineered to stress ties and overlapping merges."""

from __future__ import annotations

import random
from collections import Counter

import pytest


def ref_bpe(texts: list[str], n_merges: int) -> list[tuple]:
    """Independent BPE reference: word-frequency table, most-frequent
    adjacent pair per round (ties: lowest (left, right)), leftmost
    non-overlapping merge within each word."""
    words = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                words[tuple(w)] += 1
    merges = []
    for it in range(n_merges):
        pairs: Counter = Counter()
        for syms, freq in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        # max freq, then lexicographically smallest (left, right)
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), pf = best
        merges.append((it, l, r, l + r, pf))
        new_words: Counter = Counter()
        for syms, freq in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[tuple(out)] += freq
        words = new_words
    return merges


def spark_bpe(spark, texts: list[str], n_merges: int) -> list[tuple]:
    from gasket_rs_spark.operators.bpe import train_bpe

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = train_bpe(spark, docs, n_merges)
    return [
        (m["merge_idx"], m["left"], m["right"], m["new_symbol"], m["pair_freq"])
        for m in got
    ]


def test_bpe_matches_reference_on_real_corpus(spark, sf_dir):
    from gasket_rs_spark.operators.bpe import _BPE_MERGES, q_bpe_vocab_merges
    from gasket_rs_spark.tables import load

    texts = [r["text"] for r in load(spark, sf_dir, "documents").collect()]
    want = ref_bpe(texts, _BPE_MERGES)
    got = [tuple(r) for r in q_bpe_vocab_merges(spark, sf_dir).collect()]
    assert got == want


def test_bpe_leftmost_nonoverlapping_merge(spark):
    # "aaa" + merge (a,a) -> ["aa", "a"]; next round pairs ("aa","a")
    got = spark_bpe(spark, ["aaa aaa aaa b"], 2)
    assert got[0] == (0, "a", "a", "aa", 6)  # 2 per 'aaa' word... no: leftmost
    # 'aaa' has pairs (a,a) twice per word pre-merge: freq 2*3 = 6
    assert got[1][1:3] == ("aa", "a")  # post-merge adjacency


def test_bpe_tie_breaks_lexicographic(spark):
    # 'xy' and 'ab' both appear exactly twice: 'ab' must win round 0
    got = spark_bpe(spark, ["xy ab xy ab"], 1)
    assert got[0] == (0, "a", "b", "ab", 2)


@pytest.mark.parametrize("seed", [7, 21, 42])
def test_bpe_fuzz_random_corpora(spark, seed):
    rng = random.Random(seed)
    alphabet = "abcde"
    texts = [
        " ".join(
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))
            for _ in range(rng.randint(3, 25))
        )
        for _ in range(30)
    ]
    assert spark_bpe(spark, texts, 12) == ref_bpe(texts, 12)
