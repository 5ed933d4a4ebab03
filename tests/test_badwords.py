"""Blocklist matching: AC automaton vs naive oracle, JVM word path."""

import os
import sys

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _naive_count(text, patterns):
    t = text.lower()
    total = 0
    for p in sorted({q.lower() for q in patterns if q}):
        total += sum(1 for i in range(len(t)) if t.startswith(p, i))
    return total


@given(
    st.lists(st.text(alphabet="abc ", min_size=1, max_size=5),
             min_size=1, max_size=8),
    st.text(alphabet="abcABC ", max_size=60),
)
@settings(max_examples=300, deadline=None)
def test_ac_count_matches_naive(patterns, text):
    from contessa_spark.functions.badwords import (
        ac_count,
        ac_count_batch,
        build_ac,
        build_ac_dense,
    )

    want = _naive_count(text, patterns)
    assert ac_count(text, build_ac(patterns)) == want
    # the vectorized dense-DFA kernel is held to the same oracle,
    # with a tiny segment length so cross-window matches are exercised
    dense = build_ac_dense(patterns)
    got = ac_count_batch([text, "", text], dense, seg_len=4)
    assert list(got) == [want, 0, want]


def test_ac_batch_unicode_and_window_boundaries():
    """Multi-byte UTF-8 patterns and matches spanning segment
    boundaries: byte-level windows must count each end position
    exactly once (overlap = max pattern bytes − 1)."""
    from contessa_spark.functions.badwords import (
        ac_count,
        ac_count_batch,
        build_ac,
        build_ac_dense,
    )

    patterns = ["naïve", "é", "日本語", "aé日"]
    texts = [
        "a naïve café in 日本語 texts — naïveté",
        "ÉÉÉ",                      # lowercases to ééé
        "aé日aé日aé日",
        "no hits at all",
        "",
    ]
    ac, dense = build_ac(patterns), build_ac_dense(patterns)
    want = [ac_count(t, ac) for t in texts]
    assert want == [_naive_count(t, patterns) for t in texts]
    for seg in (2, 3, 7, 2048):  # force windows mid-codepoint too
        assert list(ac_count_batch(texts, dense, seg_len=seg)) == want


def test_ac_batch_long_text_blocks():
    """A long document crosses many windows AND block boundaries; the
    count must equal the scalar reference exactly."""
    from contessa_spark.functions.badwords import (
        ac_count,
        ac_count_batch,
        build_ac,
        build_ac_dense,
    )

    patterns = ["ab", "bc ab", "xyz"]
    long_text = ("ab bc " * 5000) + "xyz"
    texts = [long_text, "bc ab", long_text[::-1]]
    want = [ac_count(t, build_ac(patterns)) for t in texts]
    dense = build_ac_dense(patterns)
    got = ac_count_batch(texts, dense, seg_len=64, block_rows=16)
    assert list(got) == want and want[0] > 9000


def test_ac_overlapping_and_nested_patterns():
    from contessa_spark.functions.badwords import ac_count, build_ac

    ac = build_ac(["aba", "ba", "a"])
    #  "ababa": a×3, ba×2, aba×2 = 7
    assert ac_count("ababa", ac) == 7
    assert ac_count("ABABA", ac) == 7  # case-insensitive
    assert ac_count("", ac) == 0
    assert ac_count("zzz", ac) == 0


def test_ac_batch_deep_suffix_chain_int32_fallback():
    """300 nested suffix patterns push per-position end counts past
    255 — exercising the int32 (non-uint8) count path."""
    from contessa_spark.functions.badwords import (
        ac_count,
        ac_count_batch,
        build_ac,
        build_ac_dense,
    )

    patterns = ["a" * k for k in range(1, 301)]
    texts = ["a" * 400, "b" + "a" * 350 + "b", ""]
    want = [ac_count(t, build_ac(patterns)) for t in texts]
    assert want == [_naive_count(t, patterns) for t in texts]
    dense = build_ac_dense(patterns)
    assert int(dense[1].max()) > 255
    assert list(ac_count_batch(texts, dense, seg_len=128)) == want


def test_ac_batch_buffer_reuse_across_sizes():
    """The per-worker buffer cache must never leak state between
    calls of different batch shapes sharing a cache key."""
    from contessa_spark.functions.badwords import (
        ac_count,
        ac_count_batch,
        build_ac,
        build_ac_dense,
    )

    patterns = ["ab", "ba c"]
    ac, dense = build_ac(patterns), build_ac_dense(patterns)
    batches = [
        ["ab" * 4000, "ba c"],          # big first: buffers sized up
        ["ab"],                          # then small: sliced views
        [""] * 5,
        ["c ba c ab" * 10] * 300,        # many short: scatter path
    ]
    for ds in batches:
        assert list(ac_count_batch(ds, dense)) == [ac_count(t, ac) for t in ds]


def test_badword_stats_spark(spark):
    from contessa_spark.functions.badwords import badword_stats

    df = spark.createDataFrame(
        [
            (1, "a perfectly Fine sentence"),
            (2, "contains the BADWORD here"),
            (3, "multi word phrase lives here"),
            (4, "badwords as substring do not trip the WORD path"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in badword_stats(
            df, words=["badword"], phrases=["word phrase"]
        ).collect()
    }
    assert not out[1]["blocked"]
    assert out[2]["has_blocked_word"] and out[2]["blocked"]
    assert out[3]["phrase_hits"] == 1 and out[3]["blocked"]
    # word path = whole words only; but the phrase path is substring,
    # and "word phrase" is absent — doc 4 stays clean
    assert not out[4]["has_blocked_word"] and not out[4]["blocked"]
    assert not out[5]["blocked"]

    # words-only call: no UDF stage at all
    plan = (
        badword_stats(df, words=["badword"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "Python" not in plan
