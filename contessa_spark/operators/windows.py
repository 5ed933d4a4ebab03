"""Window / analytic operators over the events stream table.

Contessa has no window functions (SURVEY §2.4 — its lone analytic is
the 30-day median); these are the standard analytic complements a
quality/metrics engine needs, all pure Spark SQL windows (no UDF):

* ``sessionize`` — gap-based session ids per user (lag + cumulative
  sum — the classic pattern; at scale this is one shuffle on user_id);
* ``top_k_per_group`` — rank within group, broadcast-free;
* ``rollup_counts`` — hierarchical GROUP BY ROLLUP aggregation.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap to the
    previous event of the same user exceeds ``gap_minutes``.

    One shuffle (partitionBy user) + two window passes, fully
    codegen'd. Output adds ``session_id`` (per-user ordinal, 1-based)
    and a global ``session_key``.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    prev_ts = F.lag(ts_col).over(w)
    # unix_timestamp: TIMESTAMP_NTZ cannot cast straight to long in Spark 4
    gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)
    new_session = F.when(
        prev_ts.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    out = df.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long"),
    )
    return out.withColumn(
        "session_key", F.concat_ws("#", F.col(user_col).cast("string"), F.col("session_id"))
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session aggregates: event count, duration seconds, first/last."""
    s = sessionize(df, user_col, ts_col, gap_minutes)
    return (
        s.groupBy(user_col, "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.unix_timestamp(F.max(F.col(ts_col)))
                - F.unix_timestamp(F.min(F.col(ts_col)))
            ).alias("duration_sec"),
            F.min(ts_col).alias("session_start"),
        )
    )


def top_k_per_group(
    df: DataFrame,
    group_cols: List[str],
    order_col: str,
    k: int = 3,
    tiebreak_cols: Optional[List[str]] = None,
    descending: bool = True,
) -> DataFrame:
    """Rank rows within each group and keep the top k (deterministic:
    explicit tiebreak columns)."""
    order = [F.col(order_col).desc() if descending else F.col(order_col).asc()]
    for c in tiebreak_cols or []:
        order.append(F.col(c).asc())
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def rollup_counts(
    df: DataFrame, dims: List[str], value_col: Optional[str] = None
) -> DataFrame:
    """GROUP BY ROLLUP over ``dims``: counts (+ optional sum) at every
    hierarchy level; NULL dims mark subtotal rows (standard SQL)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if value_col:
        aggs.append(F.round(F.sum(value_col), 4).alias(f"sum_{value_col}"))
    return df.rollup(*dims).agg(*aggs)
