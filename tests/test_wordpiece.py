"""WordPiece tokenizer: likelihood-gain merge objective (vs BPE's raw
pair frequency), BERT greedy longest-match encoding, determinism,
Spark partition invariance, artifact round-trip."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_training_deterministic_and_structured():
    from contessa_spark.functions.wordpiece import (
        UNK,
        train_wordpiece_from_counts,
    )

    counts = {"training": 40, "train": 60, "rain": 20, "gain": 10, "in": 90}
    a = train_wordpiece_from_counts(counts, vocab_size=40)
    b = train_wordpiece_from_counts(
        dict(reversed(list(counts.items()))), vocab_size=40
    )
    assert a == b
    assert a[0] == UNK
    # alphabet block: bare + ## forms, lexicographic, before any merges
    alpha = sorted(
        {c for w in counts for c in w[:1]}
        | {"##" + c for w in counts for c in w[1:]}
    )
    assert a[1 : 1 + len(alpha)] == alpha
    # merged pieces follow, each longer than one bare/## unit
    merged = a[1 + len(alpha):]
    assert merged and all(len(m.lstrip("#")) > 1 for m in merged)


def test_score_objective_differs_from_bpe_frequency():
    """WordPiece maximizes count(ab)/(count(a)*count(b)); BPE maximizes
    count(ab). Construct counts where they disagree on the FIRST merge:
    (a,##b) is the most frequent pair but its symbols are common, while
    (x,##y) always co-occur — likelihood gain picks xy first."""
    from contessa_spark.functions.bpe import train_bpe_from_counts
    from contessa_spark.functions.wordpiece import (
        train_wordpiece_from_counts,
        word_symbols,
    )

    counts = {"ab": 100, "a": 50, "b": 50, "xy": 10}
    # sanity on the score arithmetic the test depends on
    assert word_symbols("xy") == ("x", "##y")
    # (a,##b): 100 / (150 * 100); (x,##y): 10 / (10 * 10) — xy wins
    wp = train_wordpiece_from_counts(counts, vocab_size=8)
    first_merge = [t for t in wp[1:] if len(t.lstrip("#")) > 1][0]
    assert first_merge == "xy"
    # BPE's frequency objective does NOT pick the rare xy pair first
    bpe = train_bpe_from_counts(counts, n_merges=1)
    assert bpe and bpe[0] != ("x", "y")


def test_encode_greedy_longest_match_unk_and_roundtrip():
    from contessa_spark.functions.wordpiece import (
        MAX_WORD_CHARS,
        UNK,
        decode_tokens,
        encode_word,
    )

    # BERT's canonical example
    vocab = {UNK, "un", "##aff", "##able", "a", "##a", "##b", "##l", "##e"}
    assert encode_word("unaffable", vocab) == ["un", "##aff", "##able"]
    assert decode_tokens(["un", "##aff", "##able"]) == "unaffable"
    # greedy longest-first: prefers "##able" over "##a ##b ##l ##e"
    assert encode_word("unable", vocab) == ["un", "##able"]
    # uncovered span → single [UNK] for the whole word
    assert encode_word("zebra", vocab) == [UNK]
    # over-long word guard
    assert encode_word("a" * (MAX_WORD_CHARS + 1), vocab) == [UNK]
    assert encode_word("", vocab) == []


def test_trained_vocab_roundtrips_training_words():
    from contessa_spark.functions.wordpiece import (
        UNK,
        decode_tokens,
        encode_word,
        train_wordpiece_from_counts,
    )

    counts = {"hello": 10, "world": 8, "held": 4, "word": 6}
    vocab = set(train_wordpiece_from_counts(counts, vocab_size=64))
    for w in counts:
        toks = encode_word(w, vocab)
        assert UNK not in toks, w
        assert decode_tokens(toks) == w


def test_spark_wordpiece_counts_partition_invariant(spark):
    from pyspark.sql import functions as F

    from contessa_spark.functions.wordpiece import (
        train_wordpiece,
        wordpiece_token_counts,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(60)
    vocab = train_wordpiece(docs, vocab_size=256, max_words=3000)
    assert any(len(t.lstrip("#")) > 1 for t in vocab)

    def run(df):
        return {
            r["doc_id"]: r["wordpiece_tokens"]
            for r in wordpiece_token_counts(df, vocab).collect()
        }

    a = run(docs)
    b = run(docs.repartition(7))
    assert a == b and a
    # ≥1 token per whitespace word (UNK collapses a word to one token),
    # ≤1 token per character
    bounds = {
        r["doc_id"]: (r["w"], r["c"])
        for r in docs.select(
            "doc_id",
            F.size(F.split(F.col("text"), r"\s+")).alias("w"),
            F.length("text").alias("c"),
        ).collect()
    }
    for d, n in a.items():
        w, c = bounds[d]
        assert n <= c, d


def test_vocab_artifact_roundtrip(spark, tmp_path):
    from contessa_spark.functions.wordpiece import (
        load_vocab,
        save_vocab,
        train_wordpiece_from_counts,
    )

    vocab = train_wordpiece_from_counts({"hello": 10, "world": 8}, 32)
    save_vocab(spark, vocab, str(tmp_path / "wp"))
    assert load_vocab(spark, str(tmp_path / "wp")) == vocab
