"""As-of (temporal) join — each left row matched to the most recent
right row at or before its timestamp.

The classic operator Spark's join zoo lacks (pandas has
``merge_asof``; DuckDB/kdb ship it natively): join events to the
latest prior dimension snapshot — a click to the user's profile as
of click time, a document to the domain-authority score as of crawl
time, a rule failure to the config that was live when it fired.
The naive SQL (``right.ts <= left.ts`` range join + per-left-row
max) is quadratic per key; the scalable form is the union-window
trick below.

Spark-first shape: tag and UNION the two inputs (no join node at
all), ONE shuffle on the key, then a per-key ordered window carries
the latest right-row payload forward with ``last(..., ignorenulls)``
over an unbounded-preceding frame — running-state semantics the
window evaluator computes in one pass, never a per-row scan-back.
Left rows then just keep their carried payload.  Cost = one shuffle
+ one sort of |L|+|R| rows, the same shape as sessionization
(``operators/windows.py``); hot keys skew the sort exactly like any
per-key window — salt upstream if a key is degenerate.

DETERMINISM: within equal timestamps right rows sort BEFORE left
rows (inclusive "at or before" semantics, ``merge_asof``'s
``allow_exact_matches=True`` and DuckDB ASOF's ``>=``); callers must
make (key, ts) unique on the right side (e.g. pre-aggregate
snapshots) — the driver query does, and the operator has no hidden
tie-break to diverge on.

Reference parity: no counterpart in contessa (SURVEY.md §2 extension
— temporal-join family).
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: List[str],
    ts_col: str = "ts",
    right_ts_col: str = "ts",
    value_cols: List[str] = None,
) -> DataFrame:
    """Left as-of join → every ``left`` row plus, for each of
    ``value_cols``, the value from the latest ``right`` row of the
    same key with ``right.ts <= left.ts`` (NULL when none exists),
    and ``asof_ts`` — that matched right timestamp.

    ``right`` must be unique per (key, ts); pre-aggregate snapshots
    if it is not (equal-key-and-ts right rows would make "the latest"
    ill-defined on any engine)."""
    if not on:
        raise ValueError("asof_join: need at least one key column")
    if not value_cols:
        raise ValueError("asof_join: need at least one value column")
    clash = set(value_cols + ["asof_ts"]) & set(left.columns)
    if clash:
        raise ValueError(f"asof_join: value columns clash with left: {clash}")

    left_cols = left.columns
    l_tagged = left.select(
        *[F.col(c) for c in left_cols],
        F.lit(0).alias("__is_right"),
        F.lit(None).cast("timestamp").alias("__r_ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        *[F.col(c) for c in on],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
            if c not in on
        ],
        F.lit(1).alias("__is_right"),
        F.col(right_ts_col).cast("timestamp").alias("__r_ts"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    ).withColumn(ts_col, F.col("__r_ts"))
    unioned = l_tagged.unionByName(r_tagged)

    # right rows first at equal ts → inclusive at-or-before semantics
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("__is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[F.col(c) for c in left_cols],
        F.col("__is_right"),
        F.last("__r_ts", ignorenulls=True).over(w).alias("asof_ts"),
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
    )
    return carried.where(F.col("__is_right") == 0).select(
        *left_cols, "asof_ts", *value_cols
    )
