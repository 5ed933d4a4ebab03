"""Unigram-LM tokenizer: Viterbi optimality, round-trip, determinism,
Spark partition invariance."""

import itertools
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _brute_best(word, logp):
    """Enumerate ALL segmentations (short words only) — the oracle for
    Viterbi optimality."""
    n = len(word)
    best_score, best = -math.inf, None
    for cuts in itertools.product([0, 1], repeat=n - 1):
        pieces, start = [], 0
        for i, c in enumerate(cuts, 1):
            if c:
                pieces.append(word[start:i])
                start = i
        pieces.append(word[start:])
        try:
            score = sum(logp[p] for p in pieces)
        except KeyError:
            continue
        if score > best_score:
            best_score, best = score, pieces
    return best_score


def test_viterbi_is_optimal_vs_enumeration():
    from contessa_spark.functions.unigram import _viterbi, train_unigram_from_counts

    counts = {"abab": 30, "aba": 20, "ab": 50, "ba": 10, "b": 5, "abc": 7}
    logp = train_unigram_from_counts(counts, vocab_size=12)
    for w in ["abab", "aba", "ababab", "abcab", "bbaa"]:
        seg = _viterbi(w, logp)
        assert "".join(seg) == w
        score = sum(logp[p] for p in seg)
        assert math.isclose(score, _brute_best(w, logp), rel_tol=1e-12), w


def test_roundtrip_and_char_fallback():
    from contessa_spark.functions.unigram import _viterbi, train_unigram_from_counts

    logp = train_unigram_from_counts({"hello": 10, "world": 8}, vocab_size=16)
    for w in ["hello", "world", "helloworld", "unseen", "ßüß", ""]:
        assert "".join(_viterbi(w, logp)) == w


def test_training_deterministic_and_compresses():
    from contessa_spark.functions.unigram import (
        _viterbi,
        train_unigram_from_counts,
    )

    counts = {"training": 40, "train": 60, "rain": 20, "gain": 10, "in": 90}
    a = train_unigram_from_counts(counts, vocab_size=20)
    b = train_unigram_from_counts(dict(reversed(list(counts.items()))), 20)
    assert a == b
    # the most frequent words must be single pieces at this vocab size
    assert _viterbi("train", a) == ["train"]
    assert _viterbi("in", a) == ["in"]


def test_spark_unigram_counts_partition_invariant(spark):
    from pyspark.sql import functions as F

    from contessa_spark.functions.unigram import (
        train_unigram,
        unigram_token_counts,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(60)
    logp = train_unigram(docs, vocab_size=256, max_words=3000)
    assert logp and any(len(p) > 1 for p in logp)

    def run(df):
        return {
            r["doc_id"]: r["unigram_tokens"]
            for r in unigram_token_counts(df, logp).collect()
        }

    a = run(docs)
    b = run(docs.repartition(7))
    assert a == b and a
    # tokenization compresses vs characters and is >= word count
    words = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id",
            F.size(F.split(F.col("text"), r"\s+")).alias("n"),
        ).collect()
    }
    chars = {
        r["doc_id"]: r["n"]
        for r in docs.select("doc_id", F.length("text").alias("n")).collect()
    }
    for d in a:
        assert words[d] <= a[d] <= chars[d]


def test_tokenizer_artifact_roundtrip(spark, tmp_path):
    """Merges and vocab persist/reload bit-identically — the artifact
    contract that pins tokenization across pipeline runs."""
    from contessa_spark.functions.bpe import (
        load_merges,
        save_merges,
        train_bpe_from_counts,
    )
    from contessa_spark.functions.unigram import (
        load_vocab,
        save_vocab,
        train_unigram_from_counts,
    )

    counts = {"hello": 10, "world": 8, "held": 4}
    merges = train_bpe_from_counts(counts, 20)
    save_merges(spark, merges, str(tmp_path / "m"))
    assert load_merges(spark, str(tmp_path / "m")) == merges

    logp = train_unigram_from_counts(counts, vocab_size=16)
    save_vocab(spark, logp, str(tmp_path / "v"))
    assert load_vocab(spark, str(tmp_path / "v")) == logp
