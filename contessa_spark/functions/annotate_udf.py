"""Fused per-row annotation UDF.

langid + perplexity + scrub in ONE Arrow pandas UDF returning a
struct — the document text crosses the JVM↔Python boundary once
instead of three times (serialization of the text column dominates
the cost of three separate UDFs). The pure cores are the same shared
functions the test oracle uses, so fusing changes nothing semantically.
"""

from __future__ import annotations

from contessa_spark.functions.langid import detect
from contessa_spark.functions.perplexity import perplexity
from contessa_spark.functions.scrub import scrub_text


def annotate_texts(texts):
    """Pure batch core: lists (lang_pred, lang_conf, ppl, scrubbed,
    changed) for an iterable of (possibly None) strings."""
    langs, confs, ppls, scrubbed, changed = [], [], [], [], []
    for t in texts:
        t = t if isinstance(t, str) else ""
        l, c = detect(t)
        langs.append(l)
        confs.append(c)
        ppls.append(perplexity(t))
        s = scrub_text(t)
        scrubbed.append(s)
        changed.append(s != t)
    return langs, confs, ppls, scrubbed, changed


def spark_udf():
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    out_type = T.StructType(
        [
            T.StructField("lang_pred", T.StringType()),
            T.StructField("lang_conf", T.DoubleType()),
            T.StructField("ppl", T.DoubleType()),
            T.StructField("scrubbed_text", T.StringType()),
            T.StructField("pii_changed", T.BooleanType()),
        ]
    )

    def _annotate(texts):
        langs, confs, ppls, scrubbed, changed = annotate_texts(texts)
        return pd.DataFrame(
            {
                "lang_pred": langs,
                "lang_conf": confs,
                "ppl": ppls,
                "scrubbed_text": scrubbed,
                "pii_changed": changed,
            }
        )

    _annotate.__annotations__ = {"texts": pd.Series, "return": pd.DataFrame}
    return F.pandas_udf(_annotate, out_type)
