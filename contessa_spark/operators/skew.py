"""Skew-handling operators: salted two-phase aggregation.

Hot web domains make per-domain aggregates skew badly (one reducer
gets site00's millions of pages). The standard fix is salting: spread
each hot key over ``n_salt`` sub-keys, partial-aggregate, then
re-aggregate by the true key — two small shuffles instead of one
skewed one. AQE's skew-join splitting handles JOIN skew automatically
(enabled in session.py); GROUP BY skew needs this explicit pattern.

The salt must be deterministic for resumability: we derive it from a
uniformly-distributed column (e.g. url) rather than rand().
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_counts(
    df: DataFrame,
    key_cols: List[str],
    salt_source_col: str,
    n_salt: int = 16,
) -> DataFrame:
    """count(*) per key via salt → partial agg → final agg.

    ``salt_source_col`` should be high-cardinality (url, id); the salt
    is ``pmod(xxhash64(col), n_salt)`` — deterministic, so a resumed
    run partial-aggregates identically.
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_source_col)), F.lit(n_salt))
    )
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.count(F.lit(1)).alias("_partial")
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_partial").cast("long").alias("n_rows")
    )


def salted_agg(
    df: DataFrame,
    key_cols: List[str],
    salt_source_col: str,
    sum_cols: Optional[List[str]] = None,
    n_salt: int = 16,
) -> DataFrame:
    """General decomposable aggregate (count + sums) with salting."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_source_col)), F.lit(n_salt))
    )
    partial_aggs = [F.count(F.lit(1)).alias("_cnt")]
    for c in sum_cols or []:
        partial_aggs.append(F.sum(c).alias(f"_sum_{c}"))
    partial = salted.groupBy(*key_cols, "_salt").agg(*partial_aggs)
    final_aggs = [F.sum("_cnt").cast("long").alias("n_rows")]
    for c in sum_cols or []:
        final_aggs.append(F.round(F.sum(f"_sum_{c}"), 4).alias(f"sum_{c}"))
    return partial.groupBy(*key_cols).agg(*final_aggs)


def domain_col(url_col: str = "url") -> "F.Column":
    """Extract the domain from a url column (JVM regex)."""
    return F.regexp_extract(F.col(url_col), r"^[a-z]+://([^/]+)/", 1)
