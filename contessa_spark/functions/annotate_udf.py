"""Fused per-row annotation UDF.

langid + perplexity + scrub + ALL heuristic text stats in ONE Arrow
pandas UDF returning a struct:

* the document text crosses the JVM↔Python boundary exactly once;
* the per-word stats (stopword fraction, repetition, mean word length)
  use python set/dict lookups — O(1) per word — where the codegen'd
  Column equivalents degrade to LINEAR scans (array_contains over a
  150-word literal costs ~360µs/doc/core at 2M docs; the python set
  does the same in ~15µs). The Column versions in
  functions/textstats.py remain the SQL-comparable reference forms;
  this module reuses the same pure ``py_*`` cores, so values are
  identical bit-for-bit.

The pure cores are the same shared functions the test oracle uses, so
fusing changes nothing semantically.
"""

from __future__ import annotations

from contessa_spark.functions.langid import detect
from contessa_spark.functions.perplexity import perplexity
from contessa_spark.functions.scrub import scrub_text
from contessa_spark.functions.textstats import (
    py_mean_word_len,
    py_n_chars,
    py_repetition,
    py_stopword_frac,
    py_symbol_ratio,
)

FIELDS = [
    ("lang_pred", "string"),
    ("lang_conf", "double"),
    ("ppl", "double"),
    ("scrubbed_text", "string"),
    ("pii_changed", "boolean"),
    ("n_chars", "long"),
    ("symbol_ratio", "double"),
    ("repetition", "double"),
    ("stopword_frac", "double"),
    ("mean_word_len", "double"),
]


def annotate_rows(texts):
    """Pure batch core: dict of column-name → list for an iterable of
    (possibly None) strings.

    Tokenizes each document ONCE and computes the word stats inline —
    equivalent by construction to the one-signal-at-a-time ``py_*``
    forms (whitespace-run split; lowering a token never changes split
    boundaries), which the test oracle still calls independently.
    """
    from contessa_spark.functions.perplexity import perplexity_tokens
    from contessa_spark.functions.textstats import _STOPSET

    cols = {name: [] for name, _ in FIELDS}
    for t in texts:
        t = t if isinstance(t, str) else ""
        l, c = detect(t)
        cols["lang_pred"].append(l)
        cols["lang_conf"].append(c)
        s = scrub_text(t)
        # NULL when unchanged: ~95% of docs need no scrubbing, so this
        # drops most of the UDF's Arrow return payload; the Spark side
        # coalesces back to the original text (annotate()).
        changed = s != t
        cols["scrubbed_text"].append(s if changed else None)
        cols["pii_changed"].append(changed)
        cols["n_chars"].append(len(t))
        cols["symbol_ratio"].append(py_symbol_ratio(t))

        toks = t.split()
        toks_lower = [w.lower() for w in toks]
        cols["ppl"].append(perplexity_tokens(toks_lower))
        n = len(toks)
        if n == 0:
            cols["repetition"].append(1.0)
            cols["stopword_frac"].append(0.0)
            cols["mean_word_len"].append(0.0)
        else:
            cols["repetition"].append(1.0 - len(set(toks)) / n)
            cols["stopword_frac"].append(
                sum(1 for w in toks_lower if w in _STOPSET) / n
            )
            cols["mean_word_len"].append(sum(map(len, toks)) / n)
    return cols


def annotate_texts(texts):
    """Back-compat slice: (lang_pred, lang_conf, ppl, scrubbed, changed).
    Scrubbed text is materialized (None-coalesced) here."""
    cols = annotate_rows(texts)
    scrubbed = [
        s if s is not None else (t if isinstance(t, str) else "")
        for s, t in zip(cols["scrubbed_text"], texts)
    ]
    return (
        cols["lang_pred"],
        cols["lang_conf"],
        cols["ppl"],
        scrubbed,
        cols["pii_changed"],
    )


def spark_udf():
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    out_type = T.StructType(
        [
            T.StructField(name, getattr(T, {
                "string": "StringType",
                "double": "DoubleType",
                "boolean": "BooleanType",
                "long": "LongType",
            }[typ])())
            for name, typ in FIELDS
        ]
    )

    def _annotate(texts):
        return pd.DataFrame(annotate_rows(texts))

    _annotate.__annotations__ = {"texts": pd.Series, "return": pd.DataFrame}
    return F.pandas_udf(_annotate, out_type)
