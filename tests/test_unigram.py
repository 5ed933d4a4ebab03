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


def test_lattice_em_likelihood_beats_hard_em():
    """Full-lattice EM maximizes the TRUE marginal likelihood; hard-EM
    only its Viterbi approximation — on the same word table and vocab
    budget the lattice-trained model must score corpus log-likelihood
    at least as high."""
    from contessa_spark.functions.unigram import (
        corpus_loglik,
        train_unigram_from_counts,
    )

    # vocab_size past the seed size → NO pruning rounds: both modes
    # train over the IDENTICAL vocabulary from the identical init, so
    # the true-likelihood comparison isolates the E-step (with pruning
    # the vocab trajectories diverge and the comparison is ill-posed).
    # Self-overlapping pieces are hard-EM's classic failure: its
    # winner-take-all Viterbi counts starve the competing
    # segmentations the marginal actually flows through.
    counts = {"aaaa": 50, "aa": 30, "aaa": 20}
    kw = dict(vocab_size=10_000, em_iters=12)
    lat = train_unigram_from_counts(counts, em_mode="lattice", **kw)
    hard = train_unigram_from_counts(counts, em_mode="hard", **kw)
    assert set(lat) == set(hard)
    ll_lat, ll_hard = corpus_loglik(counts, lat), corpus_loglik(counts, hard)
    assert ll_lat > ll_hard + 10, (ll_lat, ll_hard)  # measured: -1.7 vs -58.9

    # and the EM guarantee holds: every lattice iteration ascends the
    # corpus log-likelihood (up to the 1e-9 M-step smoothing)
    words = {
        "training": 40, "train": 60, "rain": 20, "gain": 10, "in": 90,
        "raining": 15, "gaining": 5, "rating": 12, "ratio": 9,
    }
    lls = [
        corpus_loglik(
            words,
            train_unigram_from_counts(words, vocab_size=10_000, em_iters=k),
        )
        for k in range(0, 5)
    ]
    assert all(b >= a - 1e-6 for a, b in zip(lls, lls[1:])), lls


def test_expected_counts_match_enumeration():
    """Forward-backward expected piece counts ≡ brute-force
    enumeration over all segmentations of a word."""
    import itertools
    import math

    from contessa_spark.functions.unigram import (
        _expected_counts,
        _vocab_floor,
    )

    logp = {"a": math.log(0.3), "b": math.log(0.2), "ab": math.log(0.35),
            "ba": math.log(0.1), "aba": math.log(0.05)}
    word = "ababa"
    floor = _vocab_floor(logp)
    got = {}
    _expected_counts(word, 2, logp, floor, got)

    # enumerate all segmentations with their probabilities
    def segs(w):
        if not w:
            yield []
            return
        for k in range(1, len(w) + 1):
            p = w[:k]
            if p in logp or k == 1:
                for rest in segs(w[k:]):
                    yield [p] + rest

    want = {}
    z = 0.0
    weighted = []
    for s in segs(word):
        pr = math.exp(sum(logp.get(p, floor) for p in s))
        z += pr
        weighted.append((s, pr))
    for s, pr in weighted:
        for p in s:
            want[p] = want.get(p, 0.0) + 2 * pr / z
    assert set(got) == set(want)
    for p in want:
        assert math.isclose(got[p], want[p], rel_tol=1e-9), p


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
