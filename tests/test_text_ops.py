"""Unit semantics for corpus/text operators whose oracle runs on data
that doesn't exercise them (testdata documents are single-line)."""

from pyspark.sql import functions as F

from contessa_spark.operators.text_analysis import line_stats, token_topk_per_lang


def test_line_stats_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "- item a\n* item b\nplain line\nteaser text...\nmore…"),
            (2, "no lists here"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in line_stats(docs).collect()}
    assert got[1]["n_lines"] == 5
    assert got[1]["bullet_frac"] == 0.4  # 2 of 5
    assert got[1]["ellipsis_frac"] == 0.4  # '...' and '…'
    assert got[2] == got[2].__class__(doc_id=2, n_lines=1, bullet_frac=0.0, ellipsis_frac=0.0)


def test_dup_ngram_char_frac_semantics(spark):
    from contessa_spark.operators.text_analysis import (
        dup_ngram_char_frac,
        py_dup_ngram_char_frac,
    )

    # "a b a b a": 2-grams = (a b)×2, (b a)×2 — every gram duplicated
    assert py_dup_ngram_char_frac("a b a b a") == 1.0
    # all-distinct grams → 0
    assert py_dup_ngram_char_frac("one two three four") == 0.0
    assert py_dup_ngram_char_frac("") == 0.0
    assert py_dup_ngram_char_frac("single") == 0.0
    # "x x x y": grams (x x)×2 dup weight 2·2=4, (x y)×1 weight 2 → 4/6
    assert py_dup_ngram_char_frac("x x x y") == 4 / 6

    docs = spark.createDataFrame(
        [(1, "a b a b a"), (2, "one two three four"), (3, "x x x y")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["dup_ngram_frac"] for r in dup_ngram_char_frac(docs).collect()}
    assert got == {1: 1.0, 2: 0.0, 3: round(4 / 6, 6)}


def test_token_topk_per_lang_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "en", "the cat The DOG the"),
            (2, "en", "dog dog runs"),
            (3, "fr", "le chat le"),
        ],
        "doc_id long, lang string, text string",
    )
    out = token_topk_per_lang(docs, k=2)
    rows = {(r["lang"], r["rank"]): (r["token"], r["n"]) for r in out.collect()}
    assert rows[("en", 1)] == ("dog", 3)  # lowercased: DOG+dog+dog
    assert rows[("en", 2)] == ("the", 3) or rows[("en", 1)] == ("the", 3)
    # 'dog' and 'the' both have 3; tie breaks alphabetically: dog first
    assert rows[("en", 1)] == ("dog", 3) and rows[("en", 2)] == ("the", 3)
    assert rows[("fr", 1)] == ("le", 2)
