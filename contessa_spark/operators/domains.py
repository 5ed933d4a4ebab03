"""Per-domain corpus operators: rollup statistics and blocklist
filtering, keyed on the registrable domain
(``functions.domain.registrable_domain_col``).

Scale shape:

* ``domain_stats`` is one map-side-combined hash aggregate — counts
  and sums partial-aggregate per partition, so a hot domain (the
  wikipedia.org of a crawl holds ~1% of all pages) collapses to ONE
  row per partition before the shuffle. No collect_list, no window —
  nothing a hot key can concentrate. (Contrast the salted top-k in
  ``token_topk_per_lang``, which exists because collect-style
  aggregates DON'T partial-combine.)
* ``domain_blocklist_filter`` compiles a small blocklist to a pure-JVM
  NOT-IN predicate evaluated in the scan projection
  (pushdown-friendly, zero shuffle); past ``max_inline`` entries it
  switches to a broadcast LEFT ANTI join (the C4 badlist has ~400
  entries — inline; a Common-Crawl-scale blocklist of millions of
  domains — broadcast).
"""

from __future__ import annotations

from typing import Iterable, List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from contessa_spark.functions.domain import registrable_domain_col


def domain_stats(
    df: DataFrame,
    url_col: str = "url",
    lang_col: str = "lang",
    chars_col: str = "n_chars",
) -> DataFrame:
    """(domain, n_docs, total_chars, n_langs) per registrable domain.
    NULL domains (non-URL rows) aggregate under NULL, so corpus
    accounting stays total. All three aggregates partial-combine."""
    return (
        df.withColumn("domain", registrable_domain_col(F.col(url_col)))
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col(chars_col)).cast("long").alias("total_chars"),
            F.countDistinct(F.col(lang_col)).alias("n_langs"),
        )
    )


def domain_blocklist_filter(
    df: DataFrame,
    blocked_domains: Iterable[str],
    url_col: str = "url",
    max_inline: int = 1024,
) -> DataFrame:
    """Drop rows whose registrable domain is blocklisted. Rows with a
    NULL domain (non-URL strings) are KEPT — a blocklist names domains,
    and an un-parseable URL is a different rule's problem."""
    blocked: List[str] = sorted(set(blocked_domains))
    dom = registrable_domain_col(F.col(url_col))
    if len(blocked) <= max_inline:
        # single reference to the domain tree (isin is NULL for NULL
        # domains → coalesce false → kept): Column expressions can't
        # share subtrees, so `dom.isNull() | ~dom.isin(...)` would
        # double the generated code for no reason
        return df.where(~F.coalesce(dom.isin(blocked), F.lit(False)))
    spark = df.sparkSession
    bl = spark.createDataFrame([(b,) for b in blocked], "_blocked_domain string")
    return (
        df.withColumn("_dom", dom)
        .join(
            F.broadcast(bl),
            F.col("_dom") == F.col("_blocked_domain"),
            "left_anti",
        )
        .drop("_dom")
    )
