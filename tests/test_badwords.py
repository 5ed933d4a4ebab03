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
    from contessa_spark.functions.badwords import ac_count, build_ac

    assert ac_count(text, build_ac(patterns)) == _naive_count(text, patterns)


def test_ac_overlapping_and_nested_patterns():
    from contessa_spark.functions.badwords import ac_count, build_ac

    ac = build_ac(["aba", "ba", "a"])
    #  "ababa": a×3, ba×2, aba×2 = 7
    assert ac_count("ababa", ac) == 7
    assert ac_count("ABABA", ac) == 7  # case-insensitive
    assert ac_count("", ac) == 0
    assert ac_count("zzz", ac) == 0


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
