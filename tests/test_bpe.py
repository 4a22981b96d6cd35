"""BPE vocabulary induction vs an independent pure-Python reference
(the MERGE-fuzz pattern): same corpus, same determinism rules, the full
merge table must match exactly — on the real sf0.001 corpus AND on
randomized corpora engineered to stress ties and overlapping merges."""

from __future__ import annotations

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F


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


# Fuzz lane (VERDICT r14 #4): ~75 s of randomized-corpus re-derivation;
# the deterministic BPE reference pins above stay in the default lane.
@pytest.mark.fuzz
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


def ref_encode(texts: list[str], merges: list[tuple]) -> dict:
    """Per-doc (n_words, n_bpe_tokens, n_chars) under rank-order merge
    application — independent twin of bpe.encode_words + the doc agg."""
    out = {}
    for i, t in enumerate(texts):
        words = [w for w in t.split(" ") if w]
        n_tok = 0
        for w in words:
            syms = list(w)
            for _, l, r, _, _ in merges:
                merged, j = [], 0
                while j < len(syms):
                    if j + 1 < len(syms) and syms[j] == l and syms[j + 1] == r:
                        merged.append(l + r)
                        j += 2
                    else:
                        merged.append(syms[j])
                        j += 1
                syms = merged
            n_tok += len(syms)
        out[i] = (len(words), n_tok, sum(len(w) for w in words))
    return out


def test_bpe_encode_round_trip_matches_reference(spark):
    import math

    rng = random.Random(5)
    texts = [
        " ".join(
            "".join(rng.choice("abcd") for _ in range(rng.randint(1, 7)))
            for _ in range(rng.randint(3, 20))
        )
        for _ in range(40)
    ]
    from gasket_rs_spark.operators.bpe import encode_words, train_bpe

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = train_bpe(spark, docs, 10)
    ref_m = ref_bpe(texts, 10)
    assert [
        (m["merge_idx"], m["left"], m["right"], m["new_symbol"], m["pair_freq"])
        for m in merges
    ] == ref_m

    import pyspark.sql.functions as F

    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w")).where(
        F.length("w") > 0
    )
    vocab = encode_words(toks.select("w").distinct(), merges)
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"], r["n_chars"])
        for r in toks.join(vocab, "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_subtok").alias("n_bpe_tokens"),
            F.sum(F.length("w")).alias("n_chars"),
        )
        .collect()
    }
    assert got == ref_encode(texts, ref_m)


def test_bpe_encode_reconstructs_words(spark):
    """Concatenating a word's encoding must reproduce the word — BPE
    merges never lose or reorder characters."""
    from gasket_rs_spark.operators.bpe import encode_words, train_bpe

    docs = spark.createDataFrame(
        [(0, "banana bandana cabana"), (1, "banana banana")],
        "doc_id long, text string",
    )
    merges = train_bpe(spark, docs, 6)
    import pyspark.sql.functions as F

    vocab = encode_words(
        docs.select(F.explode(F.split("text", " ")).alias("w")).distinct(), merges
    ).collect()
    assert len(vocab) == 3
    for r in vocab:
        assert r["encoding"].replace(" ", "") == r["w"]
        assert r["n_subtok"] == len(r["encoding"].split(" "))
        assert r["n_subtok"] < len(r["w"])  # merges actually applied


def test_corpus_charset_safe_for_sql_oracle(spark, sf_dir):
    """The unrolled-CTE DuckDB training twin (_bpe_train_ctes) wraps
    symbols in chr(1) delimiters and relies on ASCII collation agreeing
    between engines for the argmax tiebreak — both preconditions on the
    corpus charset, asserted here rather than assumed."""
    from gasket_rs_spark.tables import load

    bad = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", "")).alias("c"))
        .where((F.ascii("c") < 32) | (F.ascii("c") > 126))
        .limit(1)
        .collect()
    )
    assert bad == []


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_sql_replace_merge_equals_kernel_convention(seed):
    """The oracle merges via delimiter-wrapped SQL replace(); the Spark
    kernel merges via a leftmost-nonoverlapping fold. Fuzz their
    equivalence on adversarial symbol sequences (runs of identical
    symbols, multi-char symbols sharing prefixes/suffixes)."""
    import duckdb

    rng = random.Random(seed)
    con = duckdb.connect()
    D = "\x01"
    alphabet = ["a", "b", "aa", "ab", "ba", "aab"]
    for _ in range(200):
        syms = [rng.choice(alphabet) for _ in range(rng.randint(0, 12))]
        l, r = rng.choice(alphabet), rng.choice(alphabet)
        # pure-Python kernel convention
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        repr0 = D + (D + D).join(syms) + D if syms else ""
        got_repr = con.execute(
            "SELECT replace(?, ?, ?)",
            [repr0, D + l + D + D + r + D, D + l + r + D],
        ).fetchone()[0]
        got = got_repr[1:-1].split(D + D) if got_repr else []
        assert got == out, (syms, l, r, got, out)


def test_pack_shard_no_extra_corpus_scan(spark, sf_dir):
    """The composite must tokenize the corpus once like bpe_encode —
    chaining pack + shard adds only batch-count-sized work, never
    another documents scan (VERDICT r10 #6's done-criterion)."""
    from gasket_rs_spark.operators.bpe import q_bpe_encode, q_bpe_pack_shard
    from gasket_rs_spark.plans.inspect import explain_formatted

    def doc_scans(df):
        plan = explain_formatted(df)
        return sum(
            1
            for line in plan.splitlines()
            if "Scan parquet" in line and "documents" in line
        )

    assert doc_scans(q_bpe_pack_shard(spark, sf_dir)) == doc_scans(
        q_bpe_encode(spark, sf_dir)
    )


def test_unigram_lm_matches_pure_python_viterbi(spark, sf_dir):
    """Engine-independent third opinion for q_unigram_lm_tokenizer: the
    same vocab induction + snapped-log DP in plain Python over the same
    parquet must reproduce the witness rows exactly."""
    import math
    from collections import Counter

    import pyarrow.parquet as pq

    from gasket_rs_spark.operators.bpe import (
        _UNI_MAX_PIECE,
        _UNI_MAX_WORD,
        _UNI_MIN_CNT,
        _UNI_MULTI_V,
        _UNI_TOPK,
        q_unigram_lm_tokenizer,
    )

    texts = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    freq: Counter = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                freq[w] += 1
    assert max(len(w) for w in freq) <= _UNI_MAX_WORD  # DP depth assumption
    cnt: Counter = Counter()
    for w, f in freq.items():
        for j in range(1, _UNI_MAX_PIECE + 1):
            for s in range(0, len(w) - j + 1):
                cnt[w[s : s + j]] += f
    chars = {p: c for p, c in cnt.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in cnt.items() if len(p) >= 2 and c >= _UNI_MIN_CNT),
        key=lambda pc: (-pc[1], pc[0]),
    )[:_UNI_MULTI_V]
    vocab_counts = dict(chars)
    vocab_counts.update(dict(multi))
    total = sum(vocab_counts.values())
    logp6 = {
        p: math.floor(math.log2(c / total) * 1e6 + 0.5)
        for p, c in vocab_counts.items()
    }

    def best(w: str) -> int:
        b = [None] * (len(w) + 1)
        b[0] = 0
        for k in range(1, len(w) + 1):
            opts = []
            for j in range(1, min(_UNI_MAX_PIECE, k) + 1):
                piece = w[k - j : k]
                if piece in logp6 and b[k - j] is not None:
                    opts.append(b[k - j] + logp6[piece])
            b[k] = max(opts) if opts else None
        assert b[len(w)] is not None  # single chars guarantee coverage
        return b[len(w)]

    want = sorted(
        ((w, f, best(w)) for w, f in freq.items()),
        key=lambda t: (-t[1], t[0]),
    )[:_UNI_TOPK]
    got = [
        (r.word, r.freq, r.best_logp6)
        for r in q_unigram_lm_tokenizer(spark, sf_dir).collect()
    ]
    assert got == want
