"""Unicode-whitespace contract (ADVICE r1): the JVM Column forms, the
pure-Python cores, and the DuckDB oracle SQL must agree on text
containing NBSP / U+2028 / U+3000 — Java regex \\s is ASCII-only
without (?U), Python \\s is not, and RE2 needs an explicit class; a
divergence here silently skews symbol_ratio/stopword_frac/... on real
web text."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from contessa_spark.functions import textstats
from contessa_spark.operators.text_analysis import quality_scores, token_counts

UNICODE_DOCS = [
    "plain ascii words only",
    "nbsp\u00a0separated\u00a0words and more here",
    "line\u2028separator and\u2029paragraph tokens",
    "ideographic\u3000space\u3000between\u3000words",
    "mixed \u00a0\u3000\u202f runs\t\tand tabs plus narrow",
    "symbols \u00a9\u00ae\u2122 with\u00a0nbsp and \u00fcn\u00efc\u00f6d\u00e9 w\u00f6rds",
    "",
    "\u00a0 \u3000",  # whitespace-only
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(UNICODE_DOCS)], "doc_id long, text string"
    )


def test_jvm_stats_match_python_cores_on_unicode_ws(spark, docs_df):
    got = {r["doc_id"]: r for r in quality_scores(docs_df).collect()}
    for i, t in enumerate(UNICODE_DOCS):
        r = got[i]
        assert r["n_chars"] == textstats.py_n_chars(t), (i, "n_chars")
        assert r["symbol_ratio"] == round(textstats.py_symbol_ratio(t), 6), (i, t)
        assert r["repetition"] == round(textstats.py_repetition(t), 6), (i, t)
        assert r["stopword_frac"] == round(textstats.py_stopword_frac(t), 6), (i, t)
        assert r["mean_word_len"] == round(textstats.py_mean_word_len(t), 6), (i, t)


def test_jvm_tokens_match_python_split_on_unicode_ws(spark, docs_df):
    got = {r["doc_id"]: r["ws_tokens"] for r in token_counts(docs_df).collect()}
    for i, t in enumerate(UNICODE_DOCS):
        assert got[i] == len(textstats.py_tokens(t)), (i, t)


def test_duckdb_oracle_agrees_on_unicode_ws(spark, docs_df):
    """The oracle textstats SQL must produce the same stats as the
    Spark query on the unicode corpus (same comparison the driver
    runs, but on adversarial whitespace)."""
    con = duckdb.connect()
    pdf = pd.DataFrame({"doc_id": range(len(UNICODE_DOCS)), "text": UNICODE_DOCS})
    con.register("documents", pdf)
    oracle = con.sql(entry_mod.oracle_sql()["doc_quality_scores"])
    cols = [c[0] for c in oracle.description]
    o_rows = {r[cols.index("doc_id")]: dict(zip(cols, r)) for r in oracle.fetchall()}
    s_rows = {r["doc_id"]: r for r in quality_scores(docs_df).collect()}
    assert set(o_rows) == set(s_rows)
    for i in o_rows:
        for c in ("n_chars", "symbol_ratio", "repetition", "stopword_frac",
                  "mean_word_len", "quality_score"):
            sv, ov = s_rows[i][c], o_rows[i][c]
            assert (round(sv, 9) if isinstance(sv, float) else sv) == (
                round(ov, 9) if isinstance(ov, float) else ov
            ), (i, c, sv, ov)
