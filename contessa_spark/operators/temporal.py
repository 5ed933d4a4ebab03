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

    from pyspark.sql import types as T

    left_cols = left.columns
    # ONE struct carries the right ts plus every value column, and is
    # non-null exactly when the row IS a right row: a single
    # last(ignorenulls) then carries the whole snapshot atomically. The
    # earlier per-column last(__r_<col>, ignorenulls) skipped right
    # rows whose value was NULL — returning an OLDER row's value while
    # asof_ts pointed at the newer row (diverging from pandas
    # merge_asof / DuckDB ASOF semantics whenever right values contain
    # NULLs).
    r_struct_type = T.StructType(
        [T.StructField("__ts", T.TimestampType())]
        + [T.StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    l_tagged = left.select(
        *[F.col(c) for c in left_cols],
        F.lit(0).alias("__is_right"),
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    r_tagged = right.select(
        *[F.col(c) for c in on],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
            if c not in on
        ],
        F.lit(1).alias("__is_right"),
        F.struct(
            F.col(right_ts_col).cast("timestamp").alias("__ts"),
            *[F.col(c).alias(c) for c in value_cols],
        ).alias("__r"),
    ).withColumn(ts_col, F.col("__r.__ts"))
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
        F.last("__r", ignorenulls=True).over(w).alias("__r"),
    )
    return carried.where(F.col("__is_right") == 0).select(
        *left_cols,
        F.col("__r.__ts").alias("asof_ts"),
        *[F.col(f"__r.{c}").alias(c) for c in value_cols],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: List[str],
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_seconds: int = 3600,
    max_interval_buckets: int = 10_000,
) -> DataFrame:
    """Inner join of point rows to every interval row of the same key
    containing them (``start <= ts < end``, the half-open convention)
    → all point columns + all interval columns (minus the key).

    Spark's own planner turns a range predicate into a
    BroadcastNestedLoopJoin (small side) or falls over entirely (big
    × big) — the classic scale trap.  This is the standard bucketized
    (blocking) form instead: each interval explodes into the
    ``bucket_seconds``-sized time buckets it overlaps (``sequence``
    — pure JVM), points map to their single bucket, and the join is a
    plain EQUI-join on (key, bucket) that shuffles and AQE-plans like
    any other; the exact range predicate filters after the match.
    Each point meets each matching interval in exactly ONE bucket
    (the point's own), so no dedup pass is needed.  Cost scales with
    interval length / bucket_seconds — ``max_interval_buckets``
    raises (with the remedy in the message) rather than silently
    exploding a year-long interval into 10⁶ rows at a 1-second
    bucket.

    Reference parity: no counterpart in contessa (SURVEY.md §2
    extension — temporal-join family, with ``asof_join``).
    """
    if not on:
        raise ValueError("interval_join: need at least one key column")
    if bucket_seconds <= 0:
        raise ValueError("interval_join: bucket_seconds must be positive")
    b = int(bucket_seconds)

    def _epoch(c):
        # parquet TIMESTAMP_NTZ refuses a direct double cast; routing
        # through "timestamp" handles both flavors identically
        return F.col(c).cast("timestamp").cast("double")

    start_bucket = F.floor(_epoch(start_col) / b).cast("long")
    end_bucket = F.floor(_epoch(end_col) / b).cast("long")
    # the guard lives INSIDE the consumed sequence bound — a separate
    # guard column would be pruned away by the optimizer and never fire
    guarded_end = F.when(
        end_bucket - start_bucket + 1 <= int(max_interval_buckets),
        end_bucket,
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "interval_join: an interval spans more than "
                    f"{int(max_interval_buckets)} buckets of "
                    f"{b}s — raise bucket_seconds or "
                    "max_interval_buckets (interval start "
                ),
                F.col(start_col).cast("string"),
                F.lit(")"),
            )
        ).cast("long")
    )
    i_exploded = intervals.select(
        *intervals.columns,
        F.explode(F.sequence(start_bucket, guarded_end)).alias("__bucket"),
    )
    p_bucketed = points.withColumn(
        "__bucket",
        F.floor(F.col(ts_col).cast("timestamp").cast("double") / b).cast(
            "long"
        ),
    )
    joined = p_bucketed.join(i_exploded, on + ["__bucket"]).where(
        (F.col(start_col) <= F.col(ts_col)) & (F.col(ts_col) < F.col(end_col))
    )
    out_cols = points.columns + [
        c for c in intervals.columns if c not in on
    ]
    return joined.select(*out_cols)
