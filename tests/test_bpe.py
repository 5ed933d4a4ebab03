"""BPE tokenizer: hand-computed merge golden (Sennrich-style corpus),
determinism across dict order and physical partitioning, round-trip,
and the pack_documents budget integration."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from contessa_spark.functions.bpe import (
    EOW,
    bpe_token_counts,
    decode_tokens,
    encode_word,
    train_bpe,
    train_bpe_from_counts,
)

CORPUS = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_train_merges_golden():
    """Hand-derived first five merges, including the lexicographic
    tie-breaks at count 9 ((e,s) < (s,t) < (t,</w>)) and count 7
    ((l,o) < (o,w))."""
    merges = train_bpe_from_counts(CORPUS, 5)
    assert merges == [
        ("e", "s"),
        ("es", "t"),
        ("est", EOW),
        ("l", "o"),
        ("lo", "w"),
    ]


def test_train_deterministic_across_dict_order():
    a = train_bpe_from_counts(CORPUS, 50)
    b = train_bpe_from_counts(dict(reversed(list(CORPUS.items()))), 50)
    assert a == b


def test_train_stops_below_count_two():
    # every pair unique -> nothing worth merging beyond singletons
    merges = train_bpe_from_counts({"abc": 1, "xyz": 1}, 10)
    assert merges == []


def test_encode_golden_and_roundtrip():
    merges = train_bpe_from_counts(CORPUS, 5)
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("lowest", ranks) == ["low", "est" + EOW]
    assert encode_word("newest", ranks) == ["n", "e", "w", "est" + EOW]
    # unseen word: falls back to chars + whatever merges apply
    assert decode_tokens(encode_word("slowest", ranks)) == "slowest"
    for w in ["low", "lower", "newest", "widest", "zzz", "", "low" * 20]:
        assert decode_tokens(encode_word(w, ranks)) == w


def test_spark_training_partition_invariant(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    m1 = train_bpe(docs, n_merges=64, max_words=5000)
    m2 = train_bpe(docs.repartition(7), n_merges=64, max_words=5000)
    assert m1 == m2 and len(m1) == 64


def test_bpe_token_counts_and_pack_budget(spark):
    from pyspark.sql import functions as F

    from contessa_spark.functions.bpe import bpe_token_count_udf
    from contessa_spark.operators.text_analysis import pack_documents

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    merges = train_bpe(docs, n_merges=128, max_words=5000)
    counts = bpe_token_counts(docs, merges).collect()
    assert len(counts) == 500
    for r in counts:
        # every ws word yields >= 1 bpe token; fully-merged words yield
        # exactly one, so ws <= bpe <= chars+1 per word
        assert r["bpe_tokens"] >= r["ws_tokens"]

    packed = pack_documents(
        docs,
        budget_tokens=4096,
        n_buckets=8,
        n_tokens_col=bpe_token_count_udf(merges)(F.col("text")),
    )
    rows = packed.collect()
    assert len(rows) == 500
    # pack ids are dense per bucket and n_tokens is the BPE count
    by_doc = {r["doc_id"]: r for r in rows}
    cnt_by_doc = {r["doc_id"]: r["bpe_tokens"] for r in counts}
    assert all(by_doc[d]["n_tokens"] == cnt_by_doc[d] for d in by_doc)
